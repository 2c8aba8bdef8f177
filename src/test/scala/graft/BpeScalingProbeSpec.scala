package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Bpe

/** Realistic-vocab BPE scaling probe (r10 verdict stretch item): tx34
  * trains 24 merges over a 4096-word cap — right-sized for the oracle
  * unroll, far from a ~32k production vocab. This probe trains 2,000
  * merges at sf0.1 and evidences the two bounded-cost claims the
  * tokenizer family rides on:
  *
  *   1. the DRIVER merge loop is vocab-bounded, not corpus-bounded —
  *      its input is the capped (≤4096-row) word-frequency table, so
  *      2000 merges cost O(merges × vocab × wordlen) on the driver
  *      regardless of corpus size (measured seconds recorded in
  *      SCALING.md §r11);
  *   2. the ENCODE kernel's per-word memo makes spec size amortize:
  *      a word is walked through the 2000-merge chain once, every
  *      repeat is a map hit — the hit rate is determined by
  *      vocabulary vs instance count (misses = distinct words while
  *      the vocab fits the 65536 memo cap), which this probe checks
  *      against the real corpus numbers.
  */
class BpeScalingProbeSpec extends SparkSpec {

  private val sf1 = "/root/testdata/sf0.1"

  test("2k-merge training is driver-bounded and the corpus vocab " +
      "fits the encode memo at sf0.1") {
    assume(new java.io.File(sf1).isDirectory, s"$sf1 missing")
    // the distributed half: ONE word-count aggregate (the tx34 shape)
    val wfDf = Tables.t(spark, sf1, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
    val stats = wfDf.agg(count(lit(1)).as("v"),
      sum("f").cast("long").as("t")).head()
    val (vocabN, totalWords) = (stats.getLong(0), stats.getLong(1))
    val wf = wfDf.orderBy(col("f").desc, col("w")).limit(4096)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // The synthetic corpus draws from a small word pool (~90 distinct
    // words — training exhausts at ~89 merges), so the 2k-merge TIMING
    // half runs on a realistic 4096-word vocabulary derived
    // deterministically from it: pairwise compounds of the real words
    // (production-shaped byte lengths, Zipf-ish counts from the real
    // frequencies). The memo-arithmetic half below stays on the REAL
    // corpus numbers.
    val vocab4k = (for ((a, fa) <- wf; (b, fb) <- wf; (c, fc) <- wf)
      yield (a + b + c, fa + fb + fc))
      .sortBy { case (w, f) => (-f, w) }.take(4096)
    assert(vocab4k.size == 4096, s"compound vocab only ${vocab4k.size}")
    val t0 = System.nanoTime()
    val merges = Bpe.train(vocab4k, 2000)
    val trainSec = (System.nanoTime() - t0) / 1e9
    // generous (host-noise-proof) ceiling; the measured number goes to
    // SCALING.md — the assert guards the CLAIM (driver-tractable), the
    // doc records the magnitude
    assert(trainSec < 120.0,
      f"driver merge loop took $trainSec%.1f s for ${merges.length} merges")
    assert(merges.length == 2000,
      s"vocab exhausted at ${merges.length} merges — probe under-sized")
    // memo arithmetic on the real corpus: misses = first sight of each
    // distinct word (vocab fits the cap), every repeat is a hit
    assert(vocabN <= 65536,
      s"corpus vocab $vocabN exceeds the 65536 memo cap — hit-rate " +
        "claim needs re-derivation")
    val hitRate = 1.0 - vocabN.toDouble / totalWords
    assert(hitRate > 0.9,
      f"memo hit rate $hitRate%.4f — per-word memoization claim void")
    // and the kernel ENCODES the corpus under the 2000-merge spec in
    // one distributed pass (spec size must not break the hot path)
    val specStr = Bpe.spec(merges)
    val t1 = System.nanoTime()
    val total = Tables.t(spark, sf1, "documents")
      .select(sum(graft.functions.GraftFunctions
        .bpe_subword_count(col("text"), specStr)).as("n"))
      .head().getLong(0)
    val encodeSec = (System.nanoTime() - t1) / 1e9
    assert(total > 0L && total <= totalWords * 32,
      s"implausible subword total $total")
    info(f"train(2000) = $trainSec%.2f s over ${vocab4k.size} words; " +
      f"vocab=$vocabN instances=$totalWords memo hit rate=$hitRate%.4f; " +
      f"corpus encode pass $encodeSec%.2f s, $total subwords")
    // a deeper vocab must never INFLATE a word's token count (merges
    // only fuse): sanity on a known word through the full spec
    val w = wf.head._1
    assert(Bpe.subwordCount(UTF8String.fromString(w), specStr)
      <= w.length)
  }
}
