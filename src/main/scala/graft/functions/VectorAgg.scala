package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.graftshim.GraftShim.AbstractType
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Per-dimension MEAN of a float-vector column as a single fixed-width
  * aggregate — the 100 TB formulation of centroid refinement (ss08's
  * oracle-facing posexplode → groupBy(cluster, dim) multiplies row count
  * by the embedding dimension before the shuffle; this buffer keeps one
  * dim+1-double row per group per partition and merges partials exactly
  * like any hash aggregate).
  *
  * Buffer layout: slot 0 = row count, slots 1..dim = per-dimension sums
  * (accumulated in double). The buffer dimension is fixed by the first
  * row seen; mismatched vector lengths raise rather than silently
  * truncate. Null/empty inputs are skipped (SQL aggregate semantics);
  * a group with no non-null vectors evaluates to NULL.
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorAvg =
    copy(child = newChildren.head)

  override def createAggregationBuffer(): Array[Double] = null

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return buffer
    val buf =
      if (buffer == null) new Array[Double](n + 1)
      else {
        require(buffer.length == n + 1,
          s"vector_avg: dimension mismatch (${buffer.length - 1} vs $n)")
        buffer
      }
    buf(0) += 1.0
    var i = 0
    while (i < n) {
      buf(i + 1) += arr.getFloat(i).toDouble
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1 == null) return b2
    if (b2 == null) return b1
    require(b1.length == b2.length,
      s"vector_avg: partial dimension mismatch (${b1.length - 1} vs ${b2.length - 1})")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any = {
    if (buffer == null || buffer(0) == 0.0) return null
    val n = buffer.length - 1
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = buffer(i + 1) / buffer(0); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    if (buffer == null) return Array.empty
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    if (bytes.isEmpty) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "vector_avg"
}

object VectorAgg {
  /** Per-dimension mean of an array<float> column (fixed-width buffer —
    * no posexplode row blowup; see [[VectorAvg]]).
    */
  def vector_avg(c: Column): Column =
    GraftShim.column(VectorAvg(GraftShim.expression(c)).toAggregateExpression())
}
