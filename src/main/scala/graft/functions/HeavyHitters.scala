package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

import scala.collection.mutable

/** MISRA-GRIES heavy-hitters summary (Misra & Gries '82) of a string key
  * column with k counters, as a MERGEABLE TypedImperativeAggregate — the
  * frequent-items member of the sketch family (q38's HLL counts distinct,
  * approx percentiles rank; this finds WHO dominates). The q64 lesson
  * applies: at 100 TB an exact per-key count of a high-cardinality column
  * is a corpus-sized shuffle, while this buffer is k counters per
  * partition — partial/final merge exactly like any hash aggregate.
  *
  * Update is the classic decrement step: known key +1; room → insert;
  * else decrement every counter (no insert), dropping zeros. Merge is
  * the Agarwal et al. "Mergeable Summaries" (PODS '12) reduction:
  * pointwise sum, then subtract the (k+1)-th largest value and keep
  * positives — which preserves the MG error bound across ANY merge
  * tree. The resulting guarantees are deterministic even though the
  * surviving counter VALUES depend on partitioning:
  *   (1) est(key) ≤ true(key)                  — never overestimates
  *   (2) true(key) − est(key) ≤ n/(k+1)        — bounded undercount
  *   (3) every key with true > n/(k+1) is present in the summary
  * Consumers (q77) verify the guarantees against exact counts and emit
  * only guarantee booleans + exact values, keeping the oracle row
  * deterministic (the q38/q64 error-envelope pattern).
  *
  * Output: array<struct<key, est>> sorted (est desc, key asc).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"misra_gries: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType), StructField("est", LongType))))
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.toString
    buf.get(key) match {
      case Some(c) => buf(key) = c + 1L
      case None if buf.size < k => buf(key) = 1L
      case None =>
        // decrement-all: k+1 distinct keys each lose one unit of mass
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace { (_, c) => c - 1L }
        buf.foreach { case (kk, c) => if (c <= 0L) dead += kk }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (kk, c) => b1(kk) = b1.getOrElse(kk, 0L) + c }
    if (b1.size > k) {
      // subtract the (k+1)-th largest counter from all, keep positives
      val d = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace { (_, c) => c - d }
      b1.foreach { case (kk, c) => if (c <= 0L) dead += kk }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (kk, c) => (-c, kk) }
      .map { case (kk, c) =>
        InternalRow(UTF8String.fromString(kk), c)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, c) => out.writeUTF(kk); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf(in.readUTF()) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "misra_gries"
}

object HeavyHitters {
  /** Misra-Gries frequent-items summary with k counters (mergeable;
    * guarantees deterministic even though counter values are not — see
    * [[MisraGries]]).
    */
  def misra_gries(c: Column, k: Int): Column =
    GraftShim.column(
      MisraGries(GraftShim.expression(c), k).toAggregateExpression())
}
