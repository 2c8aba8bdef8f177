package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Mergeable quantile summary state: per-level buffers (level l items
  * each stand for 2^l originals), the true count, and the ACCUMULATED
  * worst-case rank-error bound (one compaction at level l adds ≤ 2^l
  * to the rank error of any query — the standard MRL/KLL accounting).
  */
final class QuantileState(
    var n: Long,
    var err: Long,
    val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]])

/** DETERMINISTIC MERGEABLE QUANTILE SKETCH (Manku-Rajagopalan-Lindsay
  * '98 lineage; KLL's compaction ladder with a FIXED even-index
  * selector instead of a coin flip) — the quantile member of the
  * custom sketch family (q85 KMV answers how many distincts, q77
  * Misra-Gries who dominates, tx32 CMS how often; this answers WHERE
  * the distribution sits, from O(k·log(n/k)) state).
  *
  * Level l holds up to k values, each standing for 2^l originals. A
  * full level sorts and promotes its EVEN-index half one level up
  * (weights double); each such compaction adds at most 2^l to the
  * worst-case rank error of ANY query, and the state tracks that
  * bound exactly (`err`). Merging concatenates level-wise and
  * re-compacts — the classic mergeable-summary property, so partial
  * aggregates compose across executors/batches at any scale.
  *
  * Determinism contract (the q77 pattern): given the same BUFFER
  * CONTENTS every step is deterministic (sort + fixed selector — no
  * RNG), but contents depend on arrival order, so the state — and
  * therefore the estimated values and the accumulated `err` — are
  * partitioning-dependent. Consumers must emit only exact values plus
  * the sketch's GUARANTEES evaluated as booleans (q94). The guarantee
  * is a RANK INTERVAL, not a point rank: for rank target t the
  * estimate v̂ satisfies count(x < v̂) ≤ t + 2·err AND
  * count(x ≤ v̂) ≥ t − 2·err under ANY merge tree. (With duplicates
  * v̂ occupies the whole rank range (count(<v̂), count(≤v̂)]; a point
  * audit on count(≤v̂) alone overshoots by the duplicate mass of v̂
  * even on an exact never-compacted sketch. The interval follows from
  * the walk: the weighted rank just before including v̂ is < t, the
  * weighted rank through v̂ is ≥ t, and each weighted rank is within
  * the compaction budget of its true counterpart.)
  *
  * eval() returns (n, err, quantile values at the requested φ/100
  * targets) — n is exact and partitioning-independent; err and the
  * estimates feed gate arithmetic, never output bytes.
  */
case class QuantileSketch(
    child: Expression,
    k: Int,
    phis: Seq[Int],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileState] {

  require(k >= 8, s"quantile_sketch: k must be >= 8, got $k")
  require(phis.nonEmpty && phis.forall(p => p >= 1 && p <= 100),
    s"quantile_sketch: phis must be in [1,100], got $phis")

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("err", LongType, nullable = false),
    StructField("qs", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(child = newChildren.head)

  override def createAggregationBuffer(): QuantileState =
    new QuantileState(0L, 0L,
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long]))

  /** Promote the even-index half of every full level (≥ k) upward;
    * each compaction at level l charges 2^l to the error bound. */
  private def compact(st: QuantileState): Unit = {
    var l = 0
    while (l < st.levels.length) {
      val buf = st.levels(l)
      if (buf.length >= k) {
        val sorted = buf.sortInPlace()
        val promoted = mutable.ArrayBuffer.empty[Long]
        var i = 0
        while (i < sorted.length) { promoted += sorted(i); i += 2 }
        if (l + 1 >= st.levels.length)
          st.levels += mutable.ArrayBuffer.empty[Long]
        st.levels(l + 1) ++= promoted
        buf.clear()
        st.err += (1L << l)
      }
      l += 1
    }
  }

  override def update(st: QuantileState, input: InternalRow)
      : QuantileState = {
    val v = child.eval(input)
    if (v == null) return st
    st.levels(0) += v.asInstanceOf[Number].longValue()
    st.n += 1L
    if (st.levels(0).length >= k) compact(st)
    st
  }

  override def merge(a: QuantileState, b: QuantileState): QuantileState = {
    while (a.levels.length < b.levels.length)
      a.levels += mutable.ArrayBuffer.empty[Long]
    var l = 0
    while (l < b.levels.length) { a.levels(l) ++= b.levels(l); l += 1 }
    a.n += b.n
    a.err += b.err
    compact(a)
    a
  }

  override def eval(st: QuantileState): Any = {
    if (st.n == 0L) return null
    // (value, weight) pairs across the ladder, sorted by value
    val items = mutable.ArrayBuffer.empty[(Long, Long)]
    var l = 0
    while (l < st.levels.length) {
      val w = 1L << l
      st.levels(l).foreach(v => items += ((v, w)))
      l += 1
    }
    val sorted = items.sortInPlace()(Ordering.by(t => (t._1, t._2)))
    val qs = phis.map { p =>
      val target = math.max(1L, st.n * p / 100L)
      var cum = 0L
      var i = 0
      var res = sorted.last._1
      var found = false
      while (i < sorted.length && !found) {
        cum += sorted(i)._2
        if (cum >= target) { res = sorted(i)._1; found = true }
        i += 1
      }
      res
    }
    InternalRow(st.n, st.err,
      new GenericArrayData(qs.toArray))
  }

  override def serialize(st: QuantileState): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(st.n)
    out.writeLong(st.err)
    out.writeInt(st.levels.length)
    st.levels.foreach { buf =>
      out.writeInt(buf.length)
      buf.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantileState = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong()
    val err = in.readLong()
    val nl = in.readInt()
    val levels = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Long]]
    var l = 0
    while (l < nl) {
      val len = in.readInt()
      val buf = new mutable.ArrayBuffer[Long](len)
      var i = 0
      while (i < len) { buf += in.readLong(); i += 1 }
      levels += buf
      l += 1
    }
    if (levels.isEmpty) levels += mutable.ArrayBuffer.empty[Long]
    new QuantileState(n, err, levels)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : QuantileSketch = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : QuantileSketch = copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "quantile_sketch"
}

object QuantileSketch {
  /** Mergeable deterministic quantile sketch over an integral column;
    * returns (n, err, estimates at phis/100) — see [[QuantileSketch]].
    */
  def quantile_sketch(c: Column, k: Int, phis: Seq[Int]): Column =
    GraftShim.column(
      QuantileSketch(GraftShim.expression(c), k, phis)
        .toAggregateExpression())
}
