package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.graftshim.GraftShim.AbstractType
import org.apache.spark.sql.types.{BinaryType, DataType, BooleanType, LongType}

/** Blocked Bloom filter over 64-bit keys: k bit positions per key via
  * double hashing (Kirsch-Mitzenmacher — two mixes of the key generate
  * all k probe positions). NO FALSE NEGATIVES by construction; the false
  * positive rate is (1 - e^(-k·n/m))^k, sized by the caller.
  *
  * The mixers are splitmix64 finalizers — the same public-domain
  * avalanche constants used by GraftHashes — so the filter is
  * deterministic across runs/partitions/engines.
  */
object GraftBloom {
  private def mix1(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def add(bits: Array[Long], numHashes: Int, value: Long): Unit = {
    val numBits = bits.length * 64
    val h1 = mix1(value)
    val h2 = mix1(h1) | 1L // odd step → full-period probing
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      bits(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  def contains(bits: Array[Long], numHashes: Int, value: Long): Boolean = {
    val numBits = bits.length * 64
    val h1 = mix1(value)
    val h2 = mix1(h1) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits).toInt
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }
}

/** Aggregate a LongType column into a Bloom filter (BinaryType output).
  * Fixed-size buffer (numBits/64 longs) regardless of group size; merge
  * is a word-wise OR — the textbook mergeable-sketch shape, so the
  * partial/final plan is identical to any hash aggregate and the shuffle
  * carries numBits/8 bytes per partition, not per row.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes {

  require(numBits % 64 == 0 && numBits > 0, "numBits must be a positive multiple of 64")

  override def inputTypes: Seq[AbstractType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) GraftBloom.add(buffer, numHashes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = GraftBloom.toBytes(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] =
    GraftBloom.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    GraftBloom.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bloom_agg"
}

/** Probe a (small, query-time) Bloom filter with a LongType column. The
  * filter rides in the expression as a reference object — same pattern
  * as NearestCentroids: the words array is collected ONCE (it is KBs —
  * the whole point of a Bloom filter) and the codegen'd projection calls
  * a plain JVM method per row. Passing the filter as a per-row Binary
  * column instead would copy the byte buffer out of the UnsafeRow on
  * every probe — measured pattern to avoid.
  */
case class BloomProbe(child: Expression, words: Array[Long], numHashes: Int)
    extends UnaryExpression {

  override def prettyName: String = "bloom_probe"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  def probe(value: Long): Boolean =
    GraftBloom.contains(words, numHashes, value)

  override def nullSafeEval(input: Any): Any = probe(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomProbe].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object Bloom {
  /** Bloom-filter aggregate of a BIGINT column → binary filter bytes. */
  def bloom_agg(c: Column, numBits: Int, numHashes: Int): Column =
    GraftShim.column(
      BloomAgg(GraftShim.expression(c), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe against collected filter bytes. */
  def bloom_probe(filterBytes: Array[Byte], numHashes: Int)(c: Column): Column =
    GraftShim.column(BloomProbe(GraftShim.expression(c),
      GraftBloom.fromBytes(filterBytes), numHashes))
}
