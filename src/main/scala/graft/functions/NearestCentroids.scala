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

/** Exact nearest neighbor of an embedding against an in-memory corpus
  * "index" (ids ASC + vectors + norms as reference objects) — the
  * broadcast-index formulation of the 1-NN graph (ss06): one tight JVM
  * loop per row instead of materializing |corpus|² join rows (measured
  * 3.4 s → sub-second at sf0.1; the declarative cross-join spent its
  * time copying pair rows, not computing dots).
  *
  * Oracle-parity details: dot and norm accumulate double-cast float
  * products in index order — bit-identical to FloatDot and DuckDB's
  * list_reduce — and ties break to the LOWEST id (ids scanned ascending,
  * strict >). Self is excluded by id, not position.
  *
  * Scale caveat (documented in docs/SCALING.md): the corpus rides the
  * closure, so this holds while the index fits executor memory — the
  * 100 TB path is LSH/IVF bucketing (ss02/ss03) with the same kernel
  * run per bucket.
  */
case class NearestNeighborAll(left: Expression, right: Expression,
    ids: Array[Long], vecs: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "nearest_neighbor_all"
  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("nb_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cos",
        org.apache.spark.sql.types.DoubleType, nullable = false)))

  private lazy val norms: Array[Double] = vecs.map { v =>
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  def nearest(arr: ArrayData, selfId: Long): Any = {
    val n = arr.numElements()
    var selfNorm = 0.0
    var i = 0
    while (i < n) {
      val x = arr.getFloat(i).toDouble; selfNorm += x * x; i += 1
    }
    selfNorm = math.sqrt(selfNorm)
    var bestId = -1L
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < ids.length) {
      if (ids(c) != selfId) {
        val v = vecs(c)
        var dot = 0.0
        var j = 0
        val lim = math.min(n, v.length)
        while (j < lim) { dot += arr.getFloat(j).toDouble * v(j).toDouble; j += 1 }
        // Zero-norm guard: a degenerate vector would make cos NaN, and
        // NaN never fires `>` while the DuckDB oracle sorts NaN greatest —
        // skip the candidate instead so both engines agree (none exist in
        // current data; this pins the semantics).
        val denom = selfNorm * norms(c)
        val cos = if (denom == 0) Double.NegativeInfinity else dot / denom
        if (cos > bestCos) { bestCos = cos; bestId = ids(c) } // ids ASC: ties keep lowest
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestId, bestCos))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    nearest(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestNeighborAll", this,
      classOf[NearestNeighborAll].getName)
    defineCodeGen(ctx, ev, (a, b) =>
      s"(org.apache.spark.sql.catalyst.InternalRow) $ref.nearest($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Nearest neighbor of an embedding within ONE corpus block — the
  * per-block kernel of the distributed exact 1-NN graph (ss06). The
  * block arrives as an ordinary COLUMN (`array<struct<vec_id, embedding,
  * norm>>`, vec_id ASC), not a driver-collected reference object, so the
  * corpus never rides the driver or a broadcast: blocks are packed by a
  * hash-partitioned aggregation and meet rows through a shuffle join.
  *
  * Oracle-parity details (must match NearestNeighborAll and DuckDB):
  * dot accumulates double-cast float products in index order (the
  * FloatDot / list_reduce fold); the block's norm field is l2norm() =
  * sqrt(FloatDot(v,v)) computed at pack time with the identical fold;
  * ties break to the LOWEST id (entries scanned vec_id-ASC, strict `>`).
  * Self is excluded by id. Zero-norm candidates are skipped (cos would
  * be NaN, which `>` and the oracle's ORDER BY treat differently).
  *
  * Returns struct(nb_id, cos); an empty/self-only block yields
  * (-1, -Infinity), which loses every cross-block argmax.
  */
case class NearestInBlock(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def prettyName: String = "nearest_in_block"
  override def dataType: DataType = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("nb_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cos",
        org.apache.spark.sql.types.DoubleType, nullable = false)))

  def nearest(arr: ArrayData, selfId: Long, block: ArrayData): Any = {
    val n = arr.numElements()
    var selfNorm = 0.0
    var i = 0
    while (i < n) {
      val x = arr.getFloat(i).toDouble; selfNorm += x * x; i += 1
    }
    selfNorm = math.sqrt(selfNorm)
    var bestId = -1L
    var bestCos = Double.NegativeInfinity
    var c = 0
    val m = block.numElements()
    while (c < m) {
      val entry = block.getStruct(c, 3)
      val id = entry.getLong(0)
      if (id != selfId) {
        val v = entry.getArray(1)
        var dot = 0.0
        var j = 0
        val lim = math.min(n, v.numElements())
        while (j < lim) {
          dot += arr.getFloat(j).toDouble * v.getFloat(j).toDouble; j += 1
        }
        val denom = selfNorm * entry.getDouble(2)
        if (denom != 0) {
          val cos = dot / denom
          if (cos > bestCos) { bestCos = cos; bestId = id }
        }
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestId, bestCos))
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    nearest(a.asInstanceOf[ArrayData], b.asInstanceOf[Long],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestInBlock", this,
      classOf[NearestInBlock].getName)
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"(org.apache.spark.sql.catalyst.InternalRow) $ref.nearest($a, $b, $c)")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
