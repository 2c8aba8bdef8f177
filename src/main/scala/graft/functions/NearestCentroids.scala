package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Top-`probes` nearest centroids (by cosine) of an embedding column —
  * the assignment/probe step of IVF-style ANN (SURVEY §8 extensions).
  *
  * The centroid matrix is query-time data (sampled/trained from the
  * corpus), so it rides in the expression instance and reaches generated
  * code via `ctx.addReferenceObj` — the codegen'd projection calls back
  * into this object's `topCentroids`, keeping the per-row loop in plain
  * JVM code (no expression-tree blowup for k centroids × d dims; see the
  * SignLsh32 lesson in CLAUDE.md).
  */
case class NearestCentroids(child: Expression,
    centroids: Array[Array[Float]], probes: Int)
    extends UnaryExpression {

  override def prettyName: String = "nearest_centroids"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private lazy val norms: Array[Double] = centroids.map { c =>
    math.sqrt(c.foldLeft(0.0)((a, x) => a + x.toDouble * x))
  }

  /** Indices of the `probes` centroids with highest cosine, best first. */
  def topCentroids(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val scores = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var dot = 0.0
      var i = 0
      val lim = math.min(n, cent.length)
      while (i < lim) { dot += arr.getFloat(i) * cent(i); i += 1 }
      scores(c) = if (norms(c) == 0) Double.MinValue else dot / norms(c)
      c += 1
    }
    val top = new Array[Int](math.min(probes, centroids.length))
    val taken = new Array[Boolean](centroids.length)
    var p = 0
    while (p < top.length) {
      var best = -1
      var bestScore = Double.MinValue
      var j = 0
      while (j < scores.length) {
        if (!taken(j) && (scores(j) > bestScore ||
          (scores(j) == bestScore && best == -1))) {
          best = j; bestScore = scores(j)
        }
        j += 1
      }
      taken(best) = true
      top(p) = best
      p += 1
    }
    new GenericArrayData(top)
  }

  override protected def nullSafeEval(input: Any): Any =
    topCentroids(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCentroids", this,
      classOf[NearestCentroids].getName)
    defineCodeGen(ctx, ev, c => s"$ref.topCentroids($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
