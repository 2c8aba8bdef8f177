package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{GraftFunctions, GraftHashes}

/** Custom codegen expressions: determinism, codegen/interpreted parity,
  * and the SimHash near-dup property (small Hamming distance for small
  * edits).
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash64 codegen output matches the JVM kernel") {
    val texts = Seq("hello world", "", "a", "the quick brown fox")
    val got = texts.toDF("t")
      .select(GraftFunctions.rolling_hash64(col("t"))).as[Long].collect()
    val want = texts.map(t => GraftHashes.rollingHash64(
      UTF8String.fromString(t)))
    assert(got.toSeq == want)
  }

  test("simhash64 codegen output matches the JVM kernel") {
    val texts = Seq("a b c d e", "one token", "")
    val got = texts.toDF("t")
      .select(GraftFunctions.simhash64(col("t"))).as[Long].collect()
    val want = texts.map(t => GraftHashes.simhash64(UTF8String.fromString(t)))
    assert(got.toSeq == want)
  }

  test("simhash: near-duplicate texts land within small hamming distance") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val nearDup = base + " ok" // one extra token
    val different = "completely unrelated words about spark catalyst plans"
    def h(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val s = (t: String) => GraftHashes.simhash64(UTF8String.fromString(t))
    assert(h(s(base), s(nearDup)) <= 12)
    assert(h(s(base), s(different)) > 12)
  }

  test("functions registered for SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql("select simhash64('a b c'), rolling_hash64('abc')")
      .collect()(0)
    assert(r.getLong(0) == GraftHashes.simhash64(UTF8String.fromString("a b c")))
    assert(r.getLong(1) == GraftHashes.rollingHash64(UTF8String.fromString("abc")))
  }

  test("minhash_sig: identical texts share all lanes; near-dups share most") {
    def sig(t: String) = GraftHashes.minhashSig(UTF8String.fromString(t), 16, 0L).toSeq
    val base = "a b c d e f g h i j k l m n o p q r s t u v w x y z"
    assert(sig(base) == sig(base))
    val nearDup = base.split(" ").drop(1).mkString(" ")
    val shared = sig(base).zip(sig(nearDup)).count { case (x, y) => x == y }
    assert(shared >= 12, s"near-dup shared only $shared/16 lanes")
    val other = "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15"
    assert(sig(base).zip(sig(other)).count { case (x, y) => x == y } <= 4)
  }

  test("shingle_hashes64: n-2 shingles, short text collapses to one") {
    def sh(t: String) = GraftHashes.shingleHashes64(UTF8String.fromString(t))
    assert(sh("a b c d e").length == 3)
    assert(sh("a b").length == 1)
    // codegen path matches kernel
    import org.apache.spark.sql.functions.col
    val got = Seq("a b c d e").toDF("t")
      .select(GraftFunctions.shingle_hashes64(col("t"))).as[Seq[Long]]
      .collect()(0)
    assert(got == sh("a b c d e").toSeq)
  }
}
