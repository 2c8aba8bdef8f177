package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Semantic-intent checks for the curation tier (the oracle already pins
  * cross-engine values; these pin what the numbers MEAN).
  */
class CurationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("dd12: only planted twins are found, recall >= 0.99") {
    val pairs = Curation.dd12SemanticDedup(spark, sf)
      .select("dup_id", "dup_of", "cosine").collect()
    val n = Tables.t(spark, sf, "embeddings").count()
    // SemDeDup's inherent (documented) miss: a twin whose base sits on a
    // cluster Voronoi boundary can land in the adjacent cluster and is
    // never compared — recall is high, not perfect. Precision IS perfect:
    // nothing but planted twins clears cosine 0.99 at dim 64.
    assert(pairs.length >= 0.99 * n,
      s"expected >= ${0.99 * n} twin pairs, got ${pairs.length}")
    assert(pairs.length <= n)
    pairs.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) + 10000000L,
        s"pair (${r.getLong(0)}, ${r.getLong(1)}) is not a planted twin")
      assert(r.getDouble(2) >= 0.99)
    }
  }

  test("pp05: flags agree with a direct recomputation") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    Curation.pp05QualityFilter(spark, sf).collect().foreach { r =>
      val (text, nChars) = docs(r.getLong(0))
      val tk = text.split(" ", -1)
      assert(r.getLong(1) == tk.length)
      val meanLen = (nChars - (tk.length - 1)).toDouble / tk.length
      assert(r.getBoolean(5) == (tk.length >= 10 && tk.length <= 1000))
      assert(r.getBoolean(6) == (meanLen >= 2.0 && meanLen <= 12.0))
      val dupFrac = 1.0 - tk.distinct.length.toDouble / tk.length
      assert(r.getBoolean(7) == (dupFrac <= 0.6))
      assert(r.getBoolean(9) == (r.getBoolean(5) && r.getBoolean(6) &&
        r.getBoolean(7) && r.getBoolean(8)))
    }
  }

  test("tx14: top bigram count matches a direct frequency count") {
    val texts = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Curation.tx14Repetition(spark, sf).collect().take(200).foreach { r =>
      val tk = texts(r.getLong(0)).split(" ", -1)
      val bgs = tk.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val want = if (bgs.isEmpty) 0L
        else bgs.groupBy(identity).values.map(_.size).max.toLong
      assert(r.getLong(3) == want, s"doc ${r.getLong(0)}")
    }
  }

  test("tx15: redaction removes every planted PII occurrence") {
    val n = Tables.t(spark, sf, "documents").count()
    val rows = Curation.tx15PiiRedact(spark, sf).collect()
    assert(rows.length == n)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, "email planted but not counted")
      assert(r.getLong(2) >= 1, "ip planted but not counted")
      assert(r.getLong(3) >= 1, "phone planted but not counted")
    }
    // independent end-to-end: rebuild one planted text in Scala, apply the
    // same redaction, md5 must match the operator's fingerprint
    val doc0 = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") === 0).select("text").collect()(0).getString(0)
    val planted = s"$doc0 contact user0@mail.example.com from 10.0.0.7 call 555-1000"
    val red = planted
      .replaceAll("[a-z0-9]+@[a-z0-9.]+[a-z0-9]", "<EMAIL>")
      .replaceAll("[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+", "<IP>")
      .replaceAll("555-[0-9]+", "<PHONE>")
    assert(!red.contains("@mail") && !red.contains("10.0.0.7"))
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(red.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.find(_.getLong(0) == 0L).get.getString(4) == fp)
  }

  test("tx16: five ranked terms per source, scores descending") {
    val rows = Curation.tx16TfidfTopTerms(spark, sf).collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 5L), src)
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, src)
    }
  }

  test("vector_avg: matches the posexplode formulation across partial merges") {
    import graft.functions.VectorAgg.vector_avg
    val emb = Tables.t(spark, sf, "embeddings")
      .repartition(13) // force many partial buffers + merges
      .withColumn("g", col("vec_id") % 7)
    val viaAgg = emb.groupBy("g")
      .agg(vector_avg(col("embedding")).as("avg"))
      .select(col("g"), posexplode(col("avg")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val viaExplode = emb.select(col("g"), posexplode(col("embedding")))
      .groupBy("g", "pos").agg(avg(col("col").cast("double")).as("a"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(viaAgg.keySet == viaExplode.keySet)
    viaAgg.foreach { case (k, v) =>
      assert(math.abs(v - viaExplode(k)) < 1e-9, s"$k: $v vs ${viaExplode(k)}")
    }
  }

  test("vector_avg: null inputs skipped, all-null group is NULL, SQL surface works") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(1.0f, 3.0f))),
      (1L, None: Option[Seq[Float]]),
      (1L, Some(Seq(3.0f, 5.0f))),
      (2L, None: Option[Seq[Float]])).toDF("g", "v")
    df.createOrReplaceTempView("va_in")
    // via the injected SQL function (GraftExtensions path)
    val rows = spark.sql(
      "SELECT g, vector_avg(v) AS a FROM va_in GROUP BY g ORDER BY g")
      .collect()
    assert(rows(0).getSeq[Double](1) == Seq(2.0, 4.0))
    assert(rows(1).isNullAt(1))
    // dimension mismatch fails loudly instead of truncating
    val bad = Seq((1L, Seq(1.0f)), (1L, Seq(1.0f, 2.0f))).toDF("g", "v")
    val e = intercept[Exception] {
      bad.groupBy("g")
        .agg(graft.functions.VectorAgg.vector_avg(col("v"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("ss09: converged centroids stay finite; members conserved; uses no explode before the agg") {
    val n = Tables.t(spark, sf, "embeddings").count()
    val df = Curation.ss09KmeansConverged(spark, sf)
    val rows = df.collect()
    val byDim = rows.groupBy(_.getLong(2))
    assert(byDim.size == 64)
    byDim.foreach { case (dim, rs) =>
      assert(rs.map(_.getLong(1)).sum == n, s"dim $dim") }
    rows.foreach(r => assert(!r.getDouble(3).isNaN))
    // the refinement path aggregates fixed-width buffers (vector_avg),
    // not exploded rows: the plan's only Generate is the final output
    // posexplode of 16 centroid rows
    val gens = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.size == 1, s"expected 1 Generate (output explode), got ${gens.size}")
    assert(df.queryExecution.optimizedPlan.toString.contains("vector_avg"))
  }

  test("ss08: cluster member counts conserve the corpus per dimension") {
    val n = Tables.t(spark, sf, "embeddings").count()
    val rows = Curation.ss08KmeansIter(spark, sf).collect()
    val byDim = rows.groupBy(_.getLong(1))
    assert(byDim.size == 64)
    byDim.foreach { case (dim, rs) =>
      assert(rs.map(_.getLong(2)).sum == n, s"dim $dim")
    }
    // refined centroids are finite numbers
    rows.foreach(r => assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
  }

  test("pp26: counters and clean fingerprint agree with a direct replay") {
    val texts = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val rows = Curation.pp26LineClean(spark, sf).collect()
    assert(rows.length == texts.size)
    var removedAny = Array(0, 0, 0)
    rows.foreach { r =>
      val lines = texts(r.getLong(0)).split(" ", -1).grouped(8).toSeq
      val short = lines.count(_.length < 4)
      val stop = lines.count(l =>
        4 * l.count(t => t == "a" || t == "the") >= l.length)
      val lowdiv = lines.count(l => 4 * l.distinct.length < 3 * l.length)
      val kept = lines.filter(l => l.length >= 4 &&
        4 * l.count(t => t == "a" || t == "the") < l.length &&
        4 * l.distinct.length >= 3 * l.length)
      assert(r.getLong(1) == lines.length, s"n_lines doc ${r.getLong(0)}")
      assert(r.getLong(2) == short && r.getLong(3) == stop &&
        r.getLong(4) == lowdiv, s"rule counters doc ${r.getLong(0)}")
      assert(r.getLong(5) == kept.length, s"n_kept doc ${r.getLong(0)}")
      assert(r.getString(6) == md5Hex(kept.map(_.mkString(" ")).mkString(" ")),
        s"clean_fp doc ${r.getLong(0)}")
      removedAny = Array(removedAny(0) + short, removedAny(1) + stop,
        removedAny(2) + lowdiv)
    }
    // every rule must actually discriminate on this corpus — a dead rule
    // is untested code riding a green gate
    assert(removedAny.forall(_ > 0), removedAny.mkString(","))
  }

  test("ss39: RRF arithmetic exact per row, ordering and provenance " +
      "classes all live") {
    val rows = Curation.ss39HybridRrf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // 10 queries x fused top-5
    assert(rows.length == 50, s"rows: ${rows.length}")
    def contrib(rank: Long): Long =
      if (rank > 0) 100000000L / (60L + rank) else 0L
    rows.foreach { case (q, rk, cand, lr, vr, rrf) =>
      assert(rk >= 1 && rk <= 5)
      assert(lr >= 0 && lr <= 20 && vr >= 0 && vr <= 20, s"($q,$cand)")
      assert(lr > 0 || vr > 0, s"($q,$cand) in neither list")
      // the fusion arithmetic is exactly the published formula
      assert(rrf == contrib(lr) + contrib(vr),
        s"($q,$cand): rrf $rrf != ${contrib(lr) + contrib(vr)}")
    }
    // rrf non-increasing within each query, ties broken by cand id asc
    rows.groupBy(_._1).values.foreach { g =>
      g.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 > b._6 || (a._6 == b._6 && a._3 < b._3),
            s"ordering violated: $a then $b")
        case _ =>
      }
    }
    // all three provenance classes are live on this corpus: items both
    // lists agree on, lexical-only picks, vector-only picks — the
    // fusion genuinely mixes modalities instead of mirroring one
    assert(rows.exists(r => r._4 > 0 && r._5 > 0), "no dual-list row")
    assert(rows.exists(r => r._4 > 0 && r._5 == 0), "no lexical-only row")
    assert(rows.exists(r => r._5 > 0 && r._4 == 0), "no vector-only row")
  }

  test("ss41: discount sweep well-formed; consensus regime visible at " +
      "the large-k end") {
    val rows = Curation.ss41RrfKSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(10L, 60L, 240L))
    rows.foreach { case (k, v, l, dual) =>
      assert(v >= 0 && v <= 10 && l >= 0 && l <= 10, s"k=$k: $v/$l")
      assert(dual >= 0 && dual <= 50, s"k=$k: dual $dual")
    }
    val byK = rows.map(r => r._1 -> r._4).toMap
    // larger discount favors dual-list consensus items — the regime
    // shift the sweep exists to show (live on this corpus: 6 -> 9)
    assert(byK(240L) >= byK(10L), s"no consensus shift: $byK")
    assert(rows.exists(_._4 > 0), "no dual-membership item anywhere")
  }

  test("ss43: the fusion layer is rank-invariant (same code path as " +
      "ss39, RRF arithmetic exact per row); the vector arm IS ss33; " +
      "both modalities live") {
    val rows = SparkEntry.queries("ss43_served_hybrid")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // per-row RRF arithmetic recheck: rrf_x is a pure function of the
    // two ranks — the rank contract that lets any list source plug in
    rows.foreach { case (q, _, c, lr, vr, x) =>
      def contrib(r: Long) = if (r > 0) 100000000L / (60L + r) else 0L
      assert(x == contrib(lr) + contrib(vr),
        s"($q,$c): rrf_x $x != f($lr, $vr)")
    }
    // the vector arm is ss33's persisted-index answer verbatim
    val ss33 = SparkEntry.queries("ss33_persisted_index")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1))
      .toMap
    rows.filter(_._5 > 0).foreach { case (q, _, c, _, vr, _) =>
      assert(ss33.get((q, c)).contains(vr),
        s"($q,$c): vec_rank $vr != ss33's ${ss33.get((q, c))}")
    }
    // both list sources surface in the fused top-5
    assert(rows.exists(r => r._4 > 0 && r._5 == 0), "no lexical-only row")
    assert(rows.exists(r => r._5 > 0 && r._4 == 0), "no vector-only row")
    // rank-layer invariance, pinned on a synthetic pool: the SAME
    // rrfFuse both operators call, fed hand-built ranks, reproduces
    // the hand-computed fusion — the layer never looks at scores
    import spark.implicits._
    val pool = Seq((1L, 100L, 1L, 0L), (1L, 101L, 0L, 1L),
        (1L, 102L, 2L, 2L), (1L, 103L, 20L, 3L))
      .toDF("query_id", "cand_id", "lex_rank", "vec_rank")
    val fused = Curation.rrfFuse(pool).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(5)))
    // 102: 1e8/62*2 = 3225806; 100/101: 1e8/61 = 1639344 (id tiebreak);
    // 103: 1e8/80 + 1e8/63 = 1250000 + 1587301 = 2837301
    assert(fused.toSeq == Seq((1L, 102L, 3225806L), (2L, 103L, 2837301L),
      (3L, 100L, 1639344L), (4L, 101L, 1639344L)),
      s"fusion layer moved: ${fused.toSeq}")
  }

  test("pp41: the curation funnel is monotone, every stage is live, " +
      "and the retrieval slots partition by provenance") {
    val m = SparkEntry.queries("pp41_rag_flagship")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val nDocs = m(("0_raw", "n_docs"))
    val kept = m(("1_fuzzy_dedup", "n_kept"))
    val qDocs = m(("2_quality", "n_docs"))
    // funnel monotonicity: each stage only removes
    assert(kept + m(("1_fuzzy_dedup", "n_dropped")) == nDocs)
    assert(qDocs <= kept, s"quality grew the corpus: $qDocs > $kept")
    assert(m(("2_quality", "n_tokens")) <= m(("0_raw", "n_tokens")))
    assert(m(("4_embeddings", "n_vecs")) <= qDocs)
    // every stage is live on the fixture (a dead stage means the
    // composition silently skipped work)
    assert(m(("1_fuzzy_dedup", "n_dropped")) > 0, "dedup dropped nothing")
    assert(qDocs < kept, "quality gated nothing")
    assert(m(("3_chunks", "n_chunks")) >= qDocs,
      "every surviving doc chunks at least once")
    assert(m(("4_embeddings", "n_vecs")) > 0 &&
      m(("4_embeddings", "var_share_max_x10k")) >= 10000L / 64,
      "max variance share below the uniform floor")
    // retrieval slots partition exactly by provenance
    assert(m(("5_retrieval", "n_slots")) ==
      m(("5_retrieval", "n_dual")) + m(("5_retrieval", "n_lex_only")) +
        m(("5_retrieval", "n_vec_only")))
    assert(m(("5_retrieval", "n_slots")) == 50L,
      "expected 10 surviving queries x fused top-5")
  }

  test("tx39: compacting base + delta text segments changes no score " +
      "byte (BM25 stats merges are exact)") {
    val segmented = SparkEntry.queries("tx38_delta_text_index")(spark, sf)
      .collect().toSeq
    val compacted = SparkEntry.queries("tx39_compacted_text_index")(
      spark, sf).collect().toSeq
    assert(compacted == segmented,
      s"text compaction moved scores: ${compacted.diff(segmented).take(3)}")
  }

  test("tx40: text purge — zero erased ids in the written postings, " +
      "purged serve equals a from-scratch live index, evictions live") {
    import org.apache.spark.sql.functions._
    // sf0.01, not the suite default: the eviction-liveness asserts are
    // corpus-dependent (at sf0.001 only 10 users are erased and none
    // of their docs reaches an unpurged top-5; at sf0.01 six do)
    val sf = "/root/testdata/sf0.01"
    assume(new java.io.File(sf).isDirectory,
      s"cross-SF fixture $sf not present on this machine")
    val rows = SparkEntry.queries("tx40_text_purge")(spark, sf)
      .collect()
    // GDPR is a storage property (the dd38 rule): the written postings
    // hold no erased id
    val erased = graft.streaming.EventsStreaming.erasureCorpus(spark, sf)
      .filter(col("event_id") % 97 === 0)
      .select(col("user_id").as("owner")).distinct()
    val hits = graft.operators.Bucketing.published(spark, "tx40",
        "graft_tpost_live")
      .withColumn("owner", pmod(col("doc_id"), lit(1000L)))
      .join(erased, Seq("owner")).count()
    assert(hits == 0L, s"graft_tpost_live holds $hits erased-doc rows")
    // no erased doc surfaces in any purged top-5
    val erasedSet = erased.collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(!erasedSet(r.getLong(2) % 1000L),
        s"erased doc ${r.getLong(2)} served from the purged index")
    }
    // from-scratch equivalence: the purged serve is byte-identical to
    // an index built directly over the live corpus (BM25 purge is NOT
    // score-neutral — df/n/avgdl shift — so THIS is the contract)
    val docs = graft.Tables.t(spark, sf, "documents")
    val dropTok = expr(
      """CASE WHEN instr(text, ' ') > 0
        |     THEN substring(text, instr(text, ' ') + 1)
        |     ELSE text END""".stripMargin)
    val union = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          dropTok.as("text")))
    val live = union.withColumn("owner", pmod(col("doc_id"), lit(1000L)))
      .join(erased, Seq("owner"), "left_anti").drop("owner")
    val truth = Curation.bm25InPlan(live).collect().toSeq
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq ==
      truth.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))),
      "purged serve diverges from the from-scratch live index")
    // the purge visibly changed the ranking on this corpus
    assert(rows.exists(_.getLong(7) > 0L),
      "no erased doc sat in any unpurged top-5 — the purge was vacuous")
    assert(rows.exists(_.getLong(6) == 0L),
      "no promotion from below — eviction slots did not refill")
  }

  test("tx37: BM25 served from the persisted index equals tx19 byte " +
      "for byte") {
    // the whole contract: moving the inverted index + corpus stats
    // into storage must not change a single score bit (the dd35 rule)
    val inPlan = SparkEntry.queries("tx19_bm25")(spark, sf)
      .collect().toSeq
    val served = SparkEntry.queries("tx37_persisted_text_index")(spark, sf)
      .collect().toSeq
    assert(served == inPlan,
      s"persisted-index BM25 diverges: ${served.diff(inPlan).take(3)}")
  }

  test("tx38: segment-merged BM25 equals one index over the union " +
      "corpus; the delta segment is live in the ranking") {
    val served = SparkEntry.queries("tx38_delta_text_index")(spark, sf)
      .collect().toSeq
    // in-plan union-corpus truth (tx19's own machinery over base ∪
    // delta): per-segment probing + merged (df, n_docs, Σdl) must be
    // byte-identical — stats merging is exact integer arithmetic
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, sf, "documents")
    val dropTok = expr(
      """CASE WHEN instr(text, ' ') > 0
        |     THEN substring(text, instr(text, ' ') + 1)
        |     ELSE text END""".stripMargin)
    val union = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          dropTok.as("text")))
    val truth = Curation.bm25InPlan(union).collect().toSeq
    assert(served == truth,
      s"segment-merged BM25 diverges: ${served.diff(truth).take(3)}")
    // delta postings are live: a delta doc ranks (the re-encode of a
    // term-heavy base doc carries the same tf at shorter dl)
    assert(served.exists(_.getLong(2) >= 20000000L),
      "no delta doc in any top-5 — the delta segment is dead")
  }
}
