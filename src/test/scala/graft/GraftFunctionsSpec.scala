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

  test("GraftExtensions injects functions session-wide (no register call)") {
    // SparkSpec builds the shared session .withExtensions(GraftExtensions)
    val r = spark.sql(
      "select poly_hash_mod('abc'), float_dot(array(1.0f, 2.0f), array(3.0f, 4.0f))")
      .collect()(0)
    assert(r.getLong(0) == GraftHashes.polyHashMod(UTF8String.fromString("abc")))
    assert(r.getDouble(1) == 11.0)
  }

  test("misra_gries is SQL-addressable and finds the dominant key") {
    val rows = spark.sql(
      """SELECT e.key, e.est FROM (
        |  SELECT misra_gries(CASE WHEN id % 2 = 0 THEN 'HOT'
        |      ELSE CAST(id AS STRING) END, 4) AS mg
        |  FROM range(1000)) LATERAL VIEW explode(mg) AS e
        |ORDER BY e.est DESC, e.key""".stripMargin).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    assert(rows(0).getString(0) == "HOT")
    assert(rows(0).getLong(1) <= 500L) // never overestimates
    assert(rows(0).getLong(1) >= 500L - 1000L / 5)
    val err = intercept[Exception](
      spark.sql("SELECT misra_gries('x') FROM range(1)"))
    assert(err.getMessage.contains("2 argument"))
  }

  test("kmv_sketch is SQL-addressable with deterministic exact-below-k state") {
    val rows = spark.sql(
      """SELECT s.kv.n_kept, s.kv.kth_hash FROM (
        |  SELECT kmv_sketch(CAST(id % 10 AS STRING), 64) AS kv
        |  FROM range(1000)) s""".stripMargin).collect()
    // 10 distincts < k → the sketch IS the exact count, kth hash null
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 10L)
    assert(rows(0).isNullAt(1))
    val full = spark.sql(
      """SELECT s.kv.n_kept, s.kv.kth_hash FROM (
        |  SELECT kmv_sketch(CAST(id AS STRING), 64) AS kv
        |  FROM range(1000)) s""".stripMargin).collect()
    assert(full(0).getLong(0) == 64L)
    assert(full(0).getString(1).matches("[0-9a-f]{32}"))
  }

  test("functions registered for SQL text") {
    GraftFunctions.register(spark)
    val r = spark.sql("select simhash64('a b c'), rolling_hash64('abc')")
      .collect()(0)
    assert(r.getLong(0) == GraftHashes.simhash64(UTF8String.fromString("a b c")))
    assert(r.getLong(1) == GraftHashes.rollingHash64(UTF8String.fromString("abc")))
    // the tokenizer kernel from plain SQL: spec as a string literal
    val b = spark.sql(
      "select bpe_subword_count('ab ab cd', 'a b')").collect()(0)
    // merge (a,b): 'ab' -> 1 token, 'ab' -> 1, 'cd' -> 2
    assert(b.getLong(0) == 4L)
    // a NULL or non-foldable spec is an error, never the empty spec
    // (silent zero-merge degradation = per-char counts, ADVICE r10)
    val eNull = intercept[Exception] {
      spark.sql("select bpe_subword_count('ab', NULL)").collect()
    }
    assert(eNull.getMessage.contains("NULL"), eNull.getMessage)
    val eNonFold = intercept[Exception] {
      spark.sql(
        "select bpe_subword_count(t, t) from (select 'a b' AS t)").collect()
    }
    assert(eNonFold.getMessage.contains("foldable"), eNonFold.getMessage)
    // the empty spec stays legal, but only when EXPLICIT
    val e0 = spark.sql("select bpe_subword_count('ab cd', '')").collect()(0)
    assert(e0.getLong(0) == 4L)
  }

  test("Bpe.train tie-break uses UTF-8 byte order (cross-engine collation)") {
    // U+FFFD (UTF-8: EF BF BD) vs U+10000 (UTF-16: surrogate pair
    // D800 DC00; UTF-8: F0 90 80 80) ORDER SWAPS between collations:
    // UTF-16 code units say U+D800 < U+FFFD, UTF-8 bytes say EF < F0.
    // Merge 1 fuses the surrogate halves into the supplementary symbol
    // (rhs DC00 encodes '?' < 'y', deterministic under both orders);
    // merge 2 then ties (supp,"y") against ("�","x") at count 2 —
    // the trainer must pick the UTF-8 winner U+FFFD.
    val supp = new String(Character.toChars(0x10000))
    val wt = Seq(supp + "y" -> 2L, "�x" -> 2L)
    val merges = graft.functions.Bpe.train(wt, 2)
    assert(merges(0)._1 == "\uD800".toString && merges(0)._2 == "\uDC00",
      s"merge 1 should fuse the surrogate halves, got ${merges(0)}")
    assert(merges(1)._1 == "�",
      s"expected U+FFFD merge (UTF-8 order), got U+${merges(1)._1.codePointAt(0).toHexString}")
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

  test("float_dot: codegen result equals the HOF fold bit-for-bit") {
    val a = Array(0.1f, -2.5f, 3.25f, 0.0f)
    val b = Array(1.5f, 0.5f, -0.25f, 9.0f)
    val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
    val kernel = df.select(GraftFunctions.float_dot(col("a"), col("b")))
      .as[Double].collect()(0)
    val hof = df.select(aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0),
        (acc, x) => acc + x)).as[Double].collect()(0)
    assert(java.lang.Double.doubleToLongBits(kernel) ==
      java.lang.Double.doubleToLongBits(hof))
  }

  test("sorted_intersect_card equals array_intersect size on sorted sets") {
    val xs = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),  // partial overlap
      (Seq(1L, 2L), Seq(1L, 2L)),                    // identical
      (Seq(1L, 2L), Seq(3L, 4L)),                    // disjoint
      (Seq[Long](), Seq(1L)))                        // empty side
    val df = xs.toDF("a", "b")
    val got = df.select(GraftFunctions.sorted_intersect_card(
      col("a"), col("b"))).as[Long].collect().toSeq
    val want = df.select(size(array_intersect(col("a"), col("b")))
      .cast("bigint")).as[Long].collect().toSeq
    assert(got == want)
  }

  test("poly_hash_mod: codegen matches kernel and a reference fold") {
    val texts = Seq("abc", "", "hello world", "z")
    val got = texts.toDF("t")
      .select(GraftFunctions.poly_hash_mod(col("t"))).as[Long].collect()
    val want = texts.map(t =>
      t.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % 1000000007L))
    assert(got.toSeq == want)
  }

  test("shingle_strings/md5_min_lanes match the HOF expression pipeline") {
    // incl. double/trailing spaces: split(' ') keeps empty tokens
    val texts = Seq("a b c d e", "one two", "x", "a  b c ", "lone")
    val df = texts.toDF("text")
    val hofShingles =
      """transform(array(split(text, ' ')), tk ->
        |  CASE WHEN size(tk) < 3 THEN array(text)
        |       ELSE transform(sequence(0, size(tk) - 3),
        |              i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2]))
        |  END)[0]""".stripMargin
    val gotSh = df.select(GraftFunctions.shingle_strings(col("text")))
      .as[Seq[String]].collect().toSeq
    val wantSh = df.select(expr(hofShingles)).as[Seq[String]].collect().toSeq
    assert(gotSh == wantSh)

    val gotSig = df.select(GraftFunctions.md5_min_lanes(
      GraftFunctions.shingle_strings(col("text")), 4))
      .as[Seq[String]].collect().toSeq
    val wantSig = df.select(array((0 until 4).map(k => expr(
      s"array_min(transform($hofShingles, x -> md5(concat(x, '#$k'))))")): _*))
      .as[Seq[String]].collect().toSeq
    assert(gotSig == wantSig)
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
