package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Recall/correctness specs for the rows-only dedup operators: every
  * planted near-duplicate (the re-crawl mutation) must be recovered.
  */
class DedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val OFFSET = 10000000L

  /** True set-Jaccard of each planted pair, computed in plain JVM from
    * the same shingle-hash kernel the operator uses (3-gram sets can
    * contain repeats — a closed-form (n-3)/(n-2) over-estimates).
    */
  private lazy val plantedJaccard: Map[(Long, Long), Double] = {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.GraftHashes
    Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map { r =>
        val text = r.getString(1)
        val mutated =
          if (text.contains(' ')) text.substring(text.indexOf(' ') + 1)
          else text
        val a = GraftHashes.shingleHashes64(
          UTF8String.fromString(text)).toSet
        val b = GraftHashes.shingleHashes64(
          UTF8String.fromString(mutated)).toSet
        (r.getLong(0), r.getLong(0) + OFFSET) ->
          a.intersect(b).size.toDouble / a.union(b).size
      }.toMap
  }

  private def plantedAbove(threshold: Double): Set[(Long, Long)] =
    plantedJaccard.filter(_._2 >= threshold).keySet

  test("dd04 MinHash-LSH recovers every planted pair well above threshold") {
    val got = Dedup.queries("dd04_minhash_lsh_pairs")(spark, sf)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // j ≥ 0.9 with 16 bands × 4 rows: per-pair miss probability ≈ 5e-8 —
    // recovery is effectively deterministic (near the 0.5 S-curve center
    // LSH recall is inherently probabilistic, so don't assert there)
    val expected = plantedAbove(0.9)
    assert(expected.nonEmpty)
    val missed = expected -- got
    assert(missed.isEmpty, s"missed ${missed.size} pairs, e.g. ${missed.take(3)}")
  }

  test("dd15 portable-LSH recall is 1.0 for deciles well above threshold") {
    val rows = Dedup.queries("dd15_lsh_recall")(spark, sf).collect()
    assert(rows.nonEmpty)
    // deciles ≥ 0.7 (jac ≥ 0.7, 4 bands × 2 rows: miss prob ≤ (1-0.49)^4
    // ≈ 0.07 per pair — planted pairs here sit at 0.8+ where it's ~0)
    rows.filter(_.getLong(0) >= 8).foreach { r =>
      assert(r.getDouble(3) == 1.0,
        s"decile ${r.getLong(0)} recall ${r.getDouble(3)}")
    }
  }

  test("dd06 ngram-Jaccard recovers every planted pair above threshold") {
    val got = Dedup.queries("dd06_ngram_jaccard_pairs")(spark, sf)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = plantedAbove(0.6)
    assert(expected.nonEmpty)
    val missed = expected -- got
    assert(missed.isEmpty, s"missed ${missed.size} pairs, e.g. ${missed.take(3)}")
  }

  test("dd04 reported jaccard values are exact for planted pairs") {
    val rows = Dedup.queries("dd04_minhash_lsh_pairs")(spark, sf)
      .filter(col("doc_b") === col("doc_a") + OFFSET)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, j) =>
      val expect = BigDecimal(plantedJaccard((id, id + OFFSET)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(j - expect) <= 1e-9, s"doc $id got $j want $expect")
    }
  }

  test("connectedComponents converges on chains, cycles, isolated nodes") {
    import spark.implicits._
    // component A: chain 1-2-3-4-5 (diameter 4 — more rounds than dd10's
    // dup chains need); B: cycle 10-11-12-10; C: isolated 20; D: pair 30-31
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L, 30L, 31L)
      .toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (31L, 30L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 30L -> 30L, 31L -> 30L)
    assert(got == want)
  }

  test("connectedComponents: diameter-20 chain converges with bounded plan depth") {
    import spark.implicits._
    // one chain 0-1-...-20 — needs ~20 propagation rounds, which crosses
    // the every-8-rounds localCheckpoint boundary twice: the final plan
    // must NOT carry all 20 join+agg levels (lineage truncation works)
    val n = 21
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.connectedComponents(nodes, edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until n).map(_ -> 0L).toMap)
    // checkpointed lineage surfaces as an RDD scan (LogicalRDD in the
    // logical plan, Scan ExistingRDD inside the cached physical plan),
    // and the tree above it holds < 8 rounds' worth of joins — not the
    // full 20-round stack
    val plan = labels.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
      plan.take(800))
    val joins = "(?i)\\bjoin\\b".r.findAllIn(plan).size
    assert(joins < 8, s"$joins joins in post-checkpoint plan")
  }

  test("connectedComponents: round cap without fixpoint fails loudly") {
    import spark.implicits._
    // diameter-60 chain exceeds the 50-round cap → must raise, not
    // silently return half-propagated labels
    val n = 61
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[RuntimeException](
      Dedup.connectedComponents(nodes, edges).collect())
    assert(e.getMessage.contains("no fixpoint"))
  }

  test("connectedComponentsStar labels chains, cycles, isolated nodes") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L, 30L, 31L)
      .toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (31L, 30L)).toDF("a", "b")
    val got = Dedup.connectedComponentsStar(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 30L -> 30L, 31L -> 30L)
    assert(got == want)
  }

  test("star contraction resolves a diameter-200 chain (propagation can't)") {
    import spark.implicits._
    // a 201-node path needs ~200 propagation rounds — far past the
    // propagation loop's 50-round cap — but star contraction collapses
    // it in O(log n) rounds: the general-graph-diameter story.
    val n = 201
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponentsStar(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until n).map(_ -> 0L).toMap)
  }

  test("star contraction equals in-JVM union-find on seeded random graphs") {
    import spark.implicits._
    // five deterministic sparse/dense shapes; ground truth from a plain
    // union-find with min-representative relabeling
    for (seedBase <- Seq(7L, 19L, 101L, 4242L, 99991L)) {
      var seed = seedBase
      def next(): Long = {
        seed = seed * 6364136223846793005L + 1442695040888963407L; seed
      }
      val n = 40L + math.floorMod(seedBase, 41) // 40-80 nodes
      val nEdges = (n / 2 + math.floorMod(seedBase, n)).toInt
      val es = (1 to nEdges).map { _ =>
        (math.floorMod(next(), n), math.floorMod(next(), n))
      }.filter { case (a, b) => a != b }
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val p = parent(c); parent(c) = r; c = p }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n.toInt)
        .map(i => i.toLong -> find(i).toLong).toMap
      val got = Dedup.connectedComponentsStar(
          (0L until n).toDF("id"), es.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed $seedBase")
    }
  }

  test("star contraction agrees with min-label propagation on a random graph") {
    import spark.implicits._
    // deterministic pseudo-random sparse graph: 120 nodes, 90 edges from
    // an LCG stream → mixed component sizes incl. singletons
    val n = 120L
    var seed = 42L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    val es = (1 to 90).map { _ =>
      val a = math.floorMod(next(), n); val b = math.floorMod(next(), n)
      (a, b)
    }.filter { case (a, b) => a != b }
    val nodes = (0L until n).toDF("id")
    val edges = es.toDF("a", "b")
    val star = Dedup.connectedComponentsStar(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("dd13 star-contraction dup groups equal dd10's propagation groups") {
    val a = Dedup.queries("dd13_dedup_groups_star")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = Dedup.queries("dd10_dedup_groups")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("dd02 exact-hash dedup counts single-token docs as exact copies") {
    val df = Dedup.queries("dd02_dedup_exact_hash")(spark, sf)
    val withCopies = df.filter(col("n_copies") >= 2).count()
    val total = df.count()
    // corpus has 500 docs + 500 mutated copies; docs whose mutation is
    // identical (single-token texts) merge, everything else stays distinct
    assert(total + withCopies == 1000)
  }

  test("dd18 simhash hamming separates planted twins from control pairs") {
    val rows = Dedup.queries("dd18_simhash_oracle")(spark, sf)
      .collect().map(r => (r.getString(2), r.getLong(3), r.getBoolean(4)))
    val (twins, ctrls) = rows.partition(_._1 == "twin")
    assert(twins.length == 500 && ctrls.length == 499)
    // dropping one token barely moves 64 majority votes → twins flagged
    val twinRecall = twins.count(_._3).toDouble / twins.length
    assert(twinRecall >= 0.95, f"twin recall $twinRecall%.3f")
    // unrelated docs share template vocabulary (synthetic corpus), so
    // their mean sits at ~20 bits rather than the 32-bit random center —
    // still 8× the twins' distance, and a 12-bit threshold rejects them
    val ctrlFp = ctrls.count(_._3).toDouble / ctrls.length
    assert(ctrlFp <= 0.05, f"control false-positive rate $ctrlFp%.3f")
    val meanTwin = twins.map(_._2).sum.toDouble / twins.length
    val meanCtrl = ctrls.map(_._2).sum.toDouble / ctrls.length
    assert(meanTwin < 8 && meanCtrl > 16,
      f"mean hamming twin $meanTwin%.1f ctrl $meanCtrl%.1f")
  }

  test("dd20 operating-point sweep traces the LSH S-curve") {
    val rows = Dedup.queries("dd20_lsh_tuning")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(5),
        r.getDouble(7))) // (bands, n_cand, recall, precision)
      .sortBy(-_._1)
    assert(rows.map(_._1).toSeq == Seq(8L, 4L, 2L, 1L))
    // OR-amplification monotonicity: fewer, wider bands → fewer
    // candidates, recall can only fall, precision can only rise
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi._2 >= lo._2, s"candidates not monotone: $hi vs $lo")
      assert(hi._3 >= lo._3, s"recall not monotone: $hi vs $lo")
      assert(hi._4 <= lo._4, s"precision not monotone: $hi vs $lo")
    }
    // the production 4×2 config sits at the knee: near-total recall AND
    // high precision
    val knee = rows.find(_._1 == 4L).get
    assert(knee._3 >= 0.95 && knee._4 >= 0.9, knee.toString)
  }

  test("dd25 b-bit minhash error grows as bits shrink (Li-König trade)") {
    val rows = Dedup.queries("dd25_bbit_minhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))) // (bits, decile, n_pairs, sum_abs_err)
    val byBits = rows.groupBy(_._1).view
      .mapValues(g => g.map(_._4).sum).toMap
    assert(byBits.keySet == Set(128L, 4L, 1L), byBits.toString)
    // fewer stored bits per lane → strictly more absolute error at the
    // same lane count — the accuracy half of the b-bit storage trade
    assert(byBits(128L) < byBits(4L) && byBits(4L) < byBits(1L),
      byBits.toString)
    // chance collisions hit hardest where J ≈ 0: in the background
    // decile the 1-bit estimator's error is many times the full lanes'
    val d0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._4).toMap
    assert(d0(1L) > 10L * d0(128L), d0.toString)
    // every (bits, decile) cell is pair-complete: the three estimator
    // tables partition the same pair set
    val counts = rows.groupBy(_._1).view
      .mapValues(g => g.map(_._3).sum).toMap
    assert(counts.values.toSet.size == 1, counts.toString)
  }

  test("dd26 band planner exposes the FP/FN trade across configs") {
    val rows = Dedup.queries("dd26_band_planner")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // one row per 16-lane config, ordered 16×1 → 2×8
    assert(rows.map(x => (x._1, x._2)).toSeq ==
      Seq((16, 1), (8, 2), (4, 4), (2, 8)))
    // the sampled pair set is constant-size and split lo/hi identically
    // for every config (the histogram is config-independent)
    assert(rows.map(x => x._4 + x._5).toSet == Set(8128L))
    assert(rows.forall(_._5 > 0L), "twin mass missing from the sample")
    // more rows per band → later crossover, fewer expected FPs, more
    // expected misses: the S-curve steepens and shifts right
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted)
    assert(rows.map(_._6).toSeq == rows.map(_._6).toSeq.sorted.reverse)
    assert(rows.map(_._7).toSeq == rows.map(_._7).toSeq.sorted)
    // the production 4×4 config is the planner's knee: both expected
    // error masses under one pair
    val knee = rows.find(x => x._1 == 4 && x._2 == 4).get
    assert(knee._6 < 1.0 && knee._7 < 1.0, knee.toString)
  }

  test("dd27 shingle sweep separates twins from background for k >= 2") {
    val rows = Dedup.queries("dd27_shingle_sweep")(spark, sf)
      .collect().map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val ks = Seq(1L, 2L, 3L, 5L)
    // twins stay near 1 at every granularity (single-token edit)
    ks.foreach(k => assert(rows((k, "twin"))._2 > 9000L, s"k=$k"))
    // separation at every k, and the background mean falls sharply
    // with k — shared vocabulary stops counting as shared text
    ks.foreach(k =>
      assert(rows((k, "twin"))._2 > rows((k, "background"))._2))
    val bg = ks.map(k => rows((k, "background"))._2)
    assert(bg == bg.sorted.reverse && bg.head > 10L * bg(1),
      s"background means $bg")
    // the unigram blur is real: background pairs cross 0.5 at k=1 and
    // stop doing so once shingles carry order
    assert(rows((1L, "background"))._3 > 0L)
    assert(rows((2L, "background"))._3 < rows((1L, "background"))._3)
    // pair sets are complete and identical across k
    assert(rows.keys.map(_._1).toSet == ks.toSet)
    assert(rows.toSeq.groupBy(_._1._1).values
      .map(_.map(_._2._1).sum).toSet.size == 1)
  }

  test("dd28 chain audit measures 2-hop drift inside dd10's clusters") {
    val rows = Dedup.queries("dd28_chain_audit")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, mn, mean, chained) =>
      assert(n >= 2L && mn <= mean && mean <= 10000L)
      assert(chained == (mn < 5000L))
    }
    // 3-member chains (base -> drop-1 -> drop-2) must show measurable
    // 2-hop drift: the min member-to-rep similarity sits strictly
    // below the mean somewhere
    assert(rows.filter(_._2 == 3L).exists(x => x._3 < x._4))
    // on THIS corpus the chains are mild (long docs, 2 tokens dropped):
    // the audit's value is certifying that — components safe to ship
    assert(rows.forall(x => x._3 > 5000L),
      "unexpected sub-threshold chaining on the dd10 corpus")
  }

  test("dd19 banded near-dup recall finds planted twins, not controls") {
    val rows = Dedup.queries("dd19_neardup_recall")(spark, sf)
      .collect().map(r => (r.getString(2), r.getDouble(3), r.getLong(4)))
    val (twins, ctrls) = rows.partition(_._1 == "twin")
    assert(twins.length == 500 && ctrls.length == 499)
    // ~0.1%/dim noise keeps cosine ≈ 1; natural pairs sit far below
    assert(twins.forall(_._2 >= 0.999))
    assert(ctrls.forall(_._2 <= 0.9))
    val recall = twins.count(_._3 == 1L).toDouble / twins.length
    assert(recall >= 0.9, f"banded twin recall $recall%.3f")
    val fp = ctrls.count(_._3 == 1L).toDouble / ctrls.length
    assert(fp <= 0.2, f"control band-collision rate $fp%.3f")
  }

  test("dd24 semantic dedup drops every planted twin and no genuine vector") {
    val rows = Dedup.queries("dd24_semantic_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // corpus conservation: every vector (base + twin) is in one cluster
    assert(rows.map(_._2).sum == 1000L, s"total ${rows.map(_._2).sum}")
    assert(rows.map(_._3).sum == 500L)
    rows.foreach { case (cluster, nTotal, nTwin, nDropped, nTwinDropped,
        dropX10k) =>
      assert(nTwinDropped <= nDropped)
      // one loser per co-clustered twin pair, never both members
      assert(nDropped <= nTwin, s"cluster $cluster: $nDropped > $nTwin")
      assert(dropX10k == nDropped * 10000L / nTotal)
    }
    // exactly one of each twin pair loses the diversity contest; a pair
    // only escapes when noise pushes the twin across a cluster boundary
    // from its base — the known SemDeDup blind spot; ≤ 2% here
    val recall = rows.map(_._4).sum.toDouble / 500.0
    assert(recall >= 0.98, f"pair drop recall $recall%.3f")
    // the farthest-from-centroid keep rule genuinely cuts both ways:
    // the noisy copy is closer to the centroid about half the time
    val twinLossRate = rows.map(_._5).sum.toDouble / rows.map(_._4).sum
    assert(twinLossRate > 0.1 && twinLossRate < 0.9,
      f"twin loss rate $twinLossRate%.3f is degenerate")
    // the quantizer actually spreads the corpus (no degenerate 1-cluster
    // assignment silently making the within-cluster pairing all-pairs);
    // 500 base ids % 97 yield only 6 centroid candidates at this SF
    assert(rows.length >= 4, s"only ${rows.length} non-empty clusters")
  }

  test("dd23 fuzzy decontamination catches paraphrases exact-shingle misses") {
    val rows = Dedup.queries("dd23_fuzzy_decontaminate")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getLong(3), r.getLong(4)))
    val planted = rows.filter(_._1 >= 1000000L)
    // all 5 planted paraphrased bench leaks are in train
    assert(planted.length == 5, s"planted rows: ${planted.length}")
    planted.foreach { case (id, exact, fuzzy, nPairs, jac) =>
      // every 3rd token rewritten kills EVERY 3-gram: exact must be blind
      assert(!exact, s"planted $id flagged by exact shingles")
      // ...while ~1/3 of bigrams survive: fuzzy must catch it
      assert(fuzzy, s"planted $id missed by fuzzy decontamination")
      assert(nPairs >= 1L && jac >= 1500L, s"planted $id weak pair/$jac")
    }
    // flagged sets are genuinely different signals on this corpus:
    // exact-only rows exist (single shared shingle, weak signal)
    assert(rows.exists(r => r._2 && !r._3), "no exact-only rows")
    // a NATURAL doc above the bigram bar is a verbatim near-copy and
    // must also be exact-caught — fuzzy-ONLY flags are precisely the
    // planted paraphrases this operator exists for
    val fuzzyOnly = rows.filter(r => r._3 && !r._2)
    assert(fuzzyOnly.nonEmpty && fuzzyOnly.forall(_._1 >= 1000000L),
      s"unexpected fuzzy-only naturals: ${fuzzyOnly.map(_._1).toSeq}")
  }

  test("dd35: the persisted-index admission equals dd29 byte for byte") {
    // the whole contract: moving the band postings + shingle store into
    // bucketed storage must not change a single verdict
    val inPlan = SparkEntry.queries("dd29_incremental_admission")(spark, sf)
      .collect().toSeq
    val persisted = SparkEntry.queries("dd35_persisted_bands")(spark, sf)
      .collect().toSeq
    assert(persisted == inPlan,
      s"persisted-index verdicts diverge: ${persisted.diff(inPlan).take(3)}")
  }

  test("dd36: delta matches exist, attribute to their day-1 origin, " +
      "and segments never cross") {
    val rows = SparkEntry.queries("dd36_delta_band_index")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3),
        r.getString(4)))
    // the append mattered: day-2 re-encodes of day-1 novel docs are
    // caught BY THE DELTA — a frozen-only index would re-admit them
    val delta = rows.filter(_._4 == "delta")
    assert(delta.nonEmpty, "no delta-segment match")
    delta.foreach { case (id, base, adm, _) =>
      assert(!adm, s"$id delta-matched yet admitted")
      assert(base == id - 10000000L,
        s"$id delta match $base is not its day-1 origin")
    }
    // base re-encodes resolve against the base segment
    rows.filter(_._1 < 30000000L).foreach { case (id, base, _, seg) =>
      assert(seg != "delta", s"base re-encode $id matched delta ($base)")
    }
    assert(rows.exists(r => r._4 == "base"), "no base-segment match")
    // segment tag is consistent with the matched id range
    rows.foreach { case (id, base, _, seg) =>
      val expect = if (base < 0) "none"
        else if (base >= 30000000L) "delta" else "base"
      assert(seg == expect, s"$id: seg $seg vs base $base")
    }
  }

  test("dd37: compacting base + delta into one segment changes no " +
      "verdict byte") {
    // band keys are content hashes, so a union-of-postings table yields
    // exactly the union of per-segment candidates; the verify is
    // pair-local — compaction is provably verdict-neutral
    val segmented = SparkEntry.queries("dd36_delta_band_index")(spark, sf)
      .collect().toSeq
    val compacted = SparkEntry.queries("dd37_compacted_bands")(spark, sf)
      .collect().toSeq
    assert(compacted == segmented,
      s"compaction changed verdicts: ${compacted.diff(segmented).take(3)}")
  }

  test("dd38: erasure purge — zero erased ids in the written tables, " +
      "old verdicts reconstruct dd36 on survivors, flips are " +
      "admit-only and erasure-caused") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("dd38_erasure_purge")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3),
        r.getString(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7)))
    // GDPR is a STORAGE property: the physically written postings and
    // shingle store contain no erased id (ownership = id % 1000)
    val erased = graft.streaming.EventsStreaming.erasureCorpus(spark, sf)
      .filter(col("event_id") % 97 === 0)
      .select(col("user_id").as("owner")).distinct()
    for (tbl <- Seq("graft_band_purged", "graft_sh_purged")) {
      // resolve through the publication manifest (the serving path)
      val hits = graft.operators.Bucketing.published(spark, "dd38", tbl)
        .withColumn("owner", pmod(col("base_id"), lit(1000L)))
        .join(erased, Seq("owner")).count()
      assert(hits == 0L, s"$tbl still holds $hits erased-doc rows")
    }
    // purging removes pairs, it cannot create them: every flip is a
    // re-admission whose pre-purge best match belonged to an erased
    // user (the silent-readmission risk the ledger exists to surface)
    val flips = rows.filter(_._7)
    assert(flips.nonEmpty, "no flipped verdict — the purge was vacuous")
    flips.foreach { case (id, mb, adm, seg, _, wasErased, _) =>
      assert(adm && mb == -1L && seg == "none" && wasErased,
        s"$id: flip is not an erasure-caused re-admission")
    }
    // survivors are byte-stable: when the old match was live, the
    // purged verdict is identical to dd36's
    val dd36 = SparkEntry.queries("dd36_delta_band_index")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    rows.filterNot(_._6).foreach { case (id, mb, adm, _, omb, _, fl) =>
      assert(!fl && mb == omb, s"$id: live-match verdict moved")
      val (b36, _, a36) = dd36(id)
      assert(mb == b36 && adm == a36,
        s"$id: purged verdict diverges from dd36 on a survivor")
    }
    // the comparison column itself matches dd36's attribution
    rows.foreach { case (id, _, _, _, omb, _, _) =>
      assert(omb == dd36(id)._1, s"$id: old_matched_base != dd36")
    }
  }
}
