package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Pipeline, Similarity, TextAnalysis}
import graft.streaming.EventsStreaming

/** In-JVM invariants for the rows-only multimodal/text operators. */
class OperatorInvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("tx17 term commonness matches a direct in-JVM recompute") {
    val texts = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val tf = texts.values.toSeq.flatMap(_.split(" ", -1))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val got = TextAnalysis.queries("tx17_term_commonness")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got.map(_._1).toSet == texts.keySet)
    got.foreach { case (id, n, meanX100, rarest) =>
      val toks = texts(id).split(" ", -1).toSeq
      assert(n == toks.length, s"doc $id token count")
      val tfs = toks.map(tf)
      assert(rarest == tfs.min, s"doc $id rarest")
      val want = tfs.sum * 100 / tfs.length // exact integer centi-mean
      assert(meanX100 == want, s"doc $id mean_x100 $meanX100 != $want")
    }
  }

  test("dd21: prefix-filtered containment equals the all-pairs brute force") {
    // in-JVM mirror of the shingling: word 3-grams, whole text if < 3
    // tokens, set semantics
    def shingles(text: String): Set[String] = {
      val tk = text.split(" ", -1)
      if (tk.length < 3) Set(text)
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> shingles(r.getString(1)))
    val want = (for {
      (a, sa) <- docs; (b, sb) <- docs if a != b
      inter = (sa & sb).size
      if 5L * inter >= 4L * sa.size
    } yield (a, b, inter.toLong, sa.size.toLong, sb.size.toLong)).toSet
    val got = Dedup.queries("dd21_containment_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "corpus should contain qualifying pairs")
  }

  test("ss16: nprobe operating curve is monotone and hits 1.0 at full probe") {
    val rows = graft.operators.Similarity.ivfNprobeSweep(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    // nested probes: candidates and hits both non-decreasing in nprobe
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._3 <= b._3 })
    // the sweep must show a real trade: narrowest probe misses neighbors,
    // and recall strictly improves somewhere along the curve
    assert(rows.head._4 < rows.last._4)
  }

  test("dd22: planted near-dup chains collapse; exactly one keeper per cluster") {
    def shingles(text: String): Set[String] = {
      val tk = text.split(" ", -1)
      if (tk.length < 3) Set(text)
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    def dropTok(t: String): String = {
      val i = t.indexOf(' '); if (i < 0) t else t.substring(i + 1)
    }
    val base = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Dedup.queries("dd22_fuzzy_keepset")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val label = rows.map(r => r._1 -> r._2).toMap
    // exactly one kept doc per cluster, and it is the min id
    rows.groupBy(_._2).foreach { case (rep, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1 && kept.head._1 == rep &&
        rep == members.map(_._1).min, s"cluster $rep keepers")
      members.foreach(m => assert(m._3 == members.length))
    }
    // recall on the strong planted pairs: a (doc, 1-token-dropped copy)
    // pair with true Jaccard ≥ 0.7 sits in dd15's top deciles, where
    // the 4×2 banding recall is ~1.0 — all must land in one cluster
    val strong = base.collect { case (id, t)
      if { val (a, b) = (shingles(t), shingles(dropTok(t)))
           val i = (a & b).size
           i.toDouble / (a.size + b.size - i) >= 0.7 } => id }
    assert(strong.nonEmpty)
    val joined = strong.count(id => label(id) == label(id + 10000000L))
    assert(joined == strong.size,
      s"only $joined of ${strong.size} strong planted pairs collapsed")
    // the keep-set is a real reduction: fewer keepers than corpus docs
    assert(rows.count(_._4) < rows.length / 2)
  }

  test("ss17: one-bit multiprobe nests home candidates and lifts recall") {
    val rows = graft.operators.Similarity.multiprobeSweep(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L))
    val Array(home, multi) = rows
    // home candidates ⊆ multiprobe candidates; same for exact-top-5 hits
    assert(home._2 <= multi._2 && home._3 <= multi._3)
    // probing Hamming-1 buckets must buy REAL recall (the op's reason to
    // exist): strictly more exact neighbors surfaced at no index growth
    assert(home._4 < multi._4,
      s"multiprobe recall ${multi._4} did not improve on home ${home._4}")
    // ×9 probes bound the candidate fan-out (1 home + 8 flipped buckets)
    assert(multi._2 <= 9 * home._2)
  }

  test("pp21: z-order bounds BOTH dimensions per bucket; linear only one") {
    val rows = Pipeline.pp21ZorderLayout(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val (zo, li) = rows.partition(_._1 == "zorder")
    assert(zo.nonEmpty && li.nonEmpty)
    // both layouts partition the same rows
    assert(zo.map(_._3).sum == li.map(_._3).sum)
    val full = Tables.t(spark, sf, "lineitem")
      .agg(max("l_partkey") - min("l_partkey"),
        max("l_suppkey") - min("l_suppkey")).first()
    val (fullPk, fullSk) = (full.getLong(0), full.getLong(1))
    // z-bucket = top-5 Morton bits = 2 high bits of EACH dimension (plus
    // a 3rd suppkey bit): every bucket confines partkey to ~1/4 of its
    // domain and suppkey to ~1/8 — both dimensions prune
    zo.foreach { case (_, b, _, pk, sk) =>
      assert(pk <= fullPk / 2, s"zorder bucket $b pk_span $pk vs $fullPk")
      assert(sk <= fullSk / 2 + 1, s"zorder bucket $b sk_span $sk vs $fullSk")
    }
    // the single-key sort bounds partkey tightly but leaves suppkey
    // unconstrained — some linear bucket spans ~the whole suppkey domain
    assert(li.map(_._5).max >= fullSk * 9 / 10,
      s"linear layout unexpectedly bounds suppkey: ${li.map(_._5).max}")
    assert(li.map(_._4).max < zo.map(_._4).max,
      "linear should bound its own sort key tighter than z-order does")
  }

  test("pp22: z-order skips files on BOTH dims; linear reads all on suppkey") {
    val rows = Pipeline.pp22FileSkipping(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(5)))
    val (zo, li) = rows.partition(_._1 == "zorder")
    assert(zo.size == 16 && li.size == 16)
    // linear: a partkey point predicate reads ≤2 of 32 files (probe on a
    // boundary can straddle two), a suppkey predicate reads every file
    li.foreach { case (_, i, pk, sk) =>
      assert(pk <= 2, s"linear probe $i reads $pk files on pk")
      assert(sk == 32, s"linear probe $i reads $sk files on sk")
    }
    // z-order: both dimensions skip a real fraction on every probe
    zo.foreach { case (_, i, pk, sk) =>
      assert(pk <= 16, s"zorder probe $i reads $pk files on pk")
      assert(sk <= 16, s"zorder probe $i reads $sk files on sk")
      assert(pk >= 1 && sk >= 1)
    }
  }

  test("GraftBloom: zero false negatives; FP rate within the sizing bound") {
    import graft.functions.GraftBloom
    val bits = new Array[Long](8192 / 64)
    val members = (0L until 1000L).map(i => i * 0x9e3779b97f4a7c15L + 17)
    members.foreach(GraftBloom.add(bits, 3, _))
    assert(members.forall(GraftBloom.contains(bits, 3, _)), "false negative!")
    val probes = (1L to 20000L).map(i => i * 0x517cc1b727220a95L + 3)
      .filterNot(members.contains)
    val fp = probes.count(GraftBloom.contains(bits, 3, _)).toDouble / probes.size
    // sizing: (1 - e^(-3*1000/8192))^3 ≈ 2.9%; allow slack to 6%
    assert(fp < 0.06, s"fp rate $fp")
  }

  test("pp10 bloom-gated decontamination equals pp03; the gate prunes hard") {
    val viaBloom = Pipeline.pp10BloomDecontaminate(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaBroadcast = Pipeline.pp03Decontaminate(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaBloom == viaBroadcast)
    // the gate's whole value: only a sliver of corpus shingles may reach
    // the exact confirm join (bench shingles + Bloom false positives)
    import graft.functions.{Bloom, GraftFunctions}
    val sh = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), explode(array_distinct(
        GraftFunctions.shingle_strings(col("text")))).as("shingle"))
      .withColumn("h", xxhash64(col("shingle")))
    val filterBytes = sh.filter(col("doc_id") < 5)
      .agg(Bloom.bloom_agg(col("h"), 8192, 3)).head().getAs[Array[Byte]](0)
    val total = sh.count().toDouble
    val survivors = sh.filter(Bloom.bloom_probe(filterBytes, 3)(col("h"))).count()
    assert(survivors / total < 0.2, s"gate passed $survivors of $total")
  }

  test("pp07 join decontamination answers exactly like pp03's broadcast") {
    val viaJoin = Pipeline.pp07DecontaminateJoin(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaBroadcast = Pipeline.pp03Decontaminate(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaJoin == viaBroadcast)
    // the bench docs themselves must be flagged, and not everything is
    assert((0L until 5L).forall(viaJoin(_)))
    assert(viaJoin.valuesIterator.contains(false))
  }

  test("pp08 chunks tile each document: stride 180, width 200, full cover") {
    val lens = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).length).toMap
    val chunks = Pipeline.pp08Chunk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == lens.keySet)
    byDoc.foreach { case (doc, cs) =>
      val n = cs.length
      val len = lens(doc)
      assert(n == (len - 1) / 180 + 1, s"doc $doc: $n chunks for $len chars")
      assert(cs.map(_._2).sorted.toSeq == (0 until n), s"doc $doc indices")
      cs.foreach { case (_, idx, chars) =>
        val expected = math.min(200, len - idx * 180)
        assert(chars == expected, s"doc $doc chunk $idx: $chars != $expected")
      }
      // coverage: last chunk reaches the end; consecutive chunks overlap 20
      assert(cs.map(_._2).max * 180 + cs.filter(c => c._2 == n - 1).head._3
        == len)
    }
  }

  test("pp11: packs respect the budget and an in-JVM greedy fold") {
    val rows = Pipeline.pp11SequencePack(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._1)
      // replay the greedy next-fit fold and compare pack ids
      var pack = 0L; var fill = 0L
      sorted.foreach { case (id, _, n, gotPack) =>
        if (fill > 0 && fill + n > 256) { pack += 1; fill = n }
        else fill += n
        assert(gotPack == pack, s"doc $id: pack $gotPack != $pack")
      }
      // every multi-doc pack fits the budget
      sorted.groupBy(_._4).foreach { case (p, ds) =>
        if (ds.length > 1)
          assert(ds.map(_._3).sum <= 256, s"pack $p overflows")
      }
    }
  }

  test("pp12: sample keys are the 20 global minima of u/weight") {
    val got = Pipeline.pp12WeightedSample(spark, sf)
      .collect().map(_.getLong(0))
    assert(got.length == 20 && got.distinct.length == 20)
  }

  test("mm01: content is a real PNG and the decode round-trips the pixels") {
    // the binary column must hold genuine encoder output, not a fake
    val pngs = Multimodal.pngTable(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    pngs.values.foreach(b => assert(b.take(8).sameElements(magic)))
    // independent in-JVM decode: pixels == truncated source bytes
    val src = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8"))
      .toMap
    val fps = Multimodal.queries("mm01_media_ingest")(spark, sf)
      .select("media_id", "width", "height", "decoded_fp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(fps.length == src.size)
    fps.foreach { case (id, w, h, fp) =>
      val bytes = src(id)
      assert(w == 16 && h == bytes.length / 16, s"doc $id")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(pngs(id)))
      val px = Array.tabulate(16 * h.toInt) { i =>
        img.getRaster.getSample(i % 16, i / 16, 0).toByte
      }
      assert(px.sameElements(bytes.take(16 * h.toInt)), s"doc $id pixels")
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(px).map(b => f"$b%02x").mkString
      assert(fp == want, s"doc $id fp")
    }
  }

  test("mm07: dHash separates perturbed re-encodes from other images") {
    val rows = Multimodal.queries("mm07_perceptual_dedup")(spark, sf)
      .collect().map(r => (r.getString(2), r.getLong(3), r.getBoolean(4)))
    val (twins, ctrls) = rows.partition(_._1 == "twin")
    assert(twins.length == 500 && ctrls.length == 499)
    // +1 on every 7th pixel barely moves 9×8 block means → twins hash-near
    assert(twins.forall(_._2 <= 6), s"max twin hamming ${twins.map(_._2).max}")
    assert(twins.forall(_._3))
    // different images differ in most adjacent-block relations
    assert(ctrls.forall(_._2 > 6), s"min ctrl hamming ${ctrls.map(_._2).min}")
    assert(!ctrls.exists(_._3))
  }

  test("mm13: banded Hamming discovery recovers every mm07 twin pair") {
    val found = graft.operators.Multimodal
      .queries("mm13_hamming_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    // verify threshold holds on every discovered pair, pairs canonical
    assert(found.forall(x => x._3 <= 6L && x._1 < x._2))
    // EXACT recall of the known truth: every twin pair mm07 scores as a
    // dup (hamming <= 6 < 8 bands => pigeonhole guarantees a shared
    // band) must be discovered without knowing the offset
    val truth = graft.operators.Multimodal
      .queries("mm07_perceptual_dedup")(spark, sf)
      .collect().filter(_.getBoolean(4))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = found.map(x => (x._1, x._2)).toSet
    assert(truth.subsetOf(got),
      s"missed ${(truth -- got).take(3)} of ${truth.size}")
    assert(found.count(_._4) == truth.size)
  }

  test("mm14: keep-set picks one canonical per component, pairs co-group") {
    val rows = graft.operators.Multimodal
      .queries("mm14_neardup_keepset")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val byGroup = rows.groupBy(_._2)
    byGroup.foreach { case (rep, ms) =>
      // exactly one keeper: the min-id member, which IS the rep
      assert(ms.count(_._4) == 1 && ms.minBy(_._1)._1 == rep)
      assert(ms.forall(_._3 == ms.length.toLong))
    }
    // every discovered near-dup pair landed in the same group
    val label = rows.map(x => x._1 -> x._2).toMap
    graft.operators.Multimodal.queries("mm13_hamming_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .foreach { case (a, b) =>
        assert(label(a) == label(b), s"pair ($a,$b) split across groups")
      }
    // dedup bites: strictly fewer keepers than media
    assert(rows.count(_._4) < rows.length)
  }

  test("pp20: media curation funnel is monotone and the dedup bites") {
    val rows = Multimodal.queries("pp20_media_curation")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, raw, gated, adm) =>
      assert(raw >= gated && gated >= adm, s"$src: $raw/$gated/$adm")
      assert(raw == 50, src) // 25 docs/source × (original + re-encode)
    }
    val (raw, gated, adm) = (rows.map(_._2).sum, rows.map(_._3).sum,
      rows.map(_._4).sum)
    // the gate drops some but not all; perceptual dedup then removes
    // ~half of the gated set (most perturbed re-encodes hash identically)
    assert(gated < raw && gated > raw / 2, s"gated $gated of $raw")
    assert(adm <= gated * 6 / 10, s"admitted $adm of $gated")
  }

  test("mm10: quarantine catches exactly the planted corruption classes") {
    val rows = Multimodal.queries("mm10_media_quarantine")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, status, reason, w, h, fp) =>
      id % 7 match {
        case 1 => assert(status == "quarantined" && reason == "bad_magic", id)
        case 2 | 3 =>
          assert(status == "quarantined" && reason == "decode_error", id)
        case _ =>
          assert(status == "ok" && reason == "" && w == 16 && h >= 1 &&
            fp.length == 32, id)
      }
      if (status == "quarantined") assert(w == -1L && h == -1L && fp == "")
    }
    // all three failure classes must actually occur on this corpus
    assert(rows.count(_._3 == "bad_magic") > 0)
    assert(rows.exists(r => r._1 % 7 == 2 && r._3 == "decode_error"))
    assert(rows.exists(r => r._1 % 7 == 3 && r._3 == "decode_error"))
  }

  test("q78: retention triangle is well-formed and non-degenerate") {
    val rows = SparkEntry.queries("q78_cohort_retention")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    assert(byCohort.size >= 2, "cohorts must actually spread")
    byCohort.foreach { case (cw, rs) =>
      val p0 = rs.find(_._2 == 0L).get
      assert(p0._3 == p0._4 && p0._5 == 10000L,
        s"$cw period 0 must be full retention")
      rs.foreach { case (_, _, act, size, rx) =>
        assert(act <= size && rx == act * 10000 / size, s"$cw")
      }
    }
    // retention decays somewhere (a flat triangle means the qualifying
    // filter did nothing)
    assert(rows.exists(r => r._2 > 0 && r._5 < 10000L))
  }

  test("pp28: split parity conserves the corpus; bigger split sits closer") {
    val rows = SparkEntry.queries("pp28_split_parity")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(rows.values.map(_._1).sum == nDocs, "splits must cover the corpus")
    // an 80% fingerprint sample tracks the corpus distribution far more
    // tightly than a 10% one — the sampling-noise scaling the audit reads
    assert(rows("train")._3 < rows("val")._3, rows.toString)
    assert(rows("train")._3 < rows("test")._3, rows.toString)
    rows.values.foreach { case (_, _, tv) => assert(tv >= 0 && tv <= 10000) }
  }

  test("pp27: sketch overlap gates hold against the exact pp18 matrix") {
    val rows = SparkEntry.queries("pp27_sketch_overlap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    val nSrc = Tables.t(spark, sf, "documents")
      .select("source").distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2, "all pairs present")
    rows.foreach { case (a, b, na, nb, shared, sizesOk, interOk) =>
      assert(na > 0 && nb > 0 && shared >= 0 && shared <= math.min(na, nb),
        s"$a/$b")
      assert(sizesOk, s"$a/$b size estimate outside 5%")
      assert(interOk, s"$a/$b intersection estimate outside envelope")
    }
    // the matrix must be non-degenerate: some real overlap exists
    assert(rows.exists(_._5 > 0))
  }

  test("q76: ingest guard admits exactly the unplanted rows, values intact") {
    val ev = Tables.t(spark, sf, "events")
      .selectExpr("event_id",
        "CAST(get_json_object(props, '$.k') AS BIGINT) AS k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = SparkEntry.queries("q76_json_ingest_guard")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (planted0, planted1) =
      (ev.count(_._1 % 11 == 0), ev.count(_._1 % 11 == 1))
    val clean = ev.filter(e => e._1 % 11 != 0 && e._1 % 11 != 1)
    assert(rows("malformed")._1 == planted0)
    assert(rows("type_drift")._1 == planted1)
    assert(rows("ok") == ((clean.length.toLong, clean.map(_._2).sum,
      clean.map(_._1).min)))
    assert(rows("malformed")._2 == 0L && rows("type_drift")._2 == 0L)
    assert(!rows.contains("missing_field")) // every props carries k
  }

  test("mm01: nbytes equals UTF-8 byte length of the source text") {
    val got = Multimodal.queries("mm01_media_ingest")(spark, sf)
      .select("media_id", "nbytes")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        r.getString(1).getBytes("UTF-8").length.toLong).toMap
    assert(got == want)
  }

  test("mm02: frame count and sizes follow from nbytes") {
    val frames = Multimodal.queries("mm02_frame_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nbytes = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length)
      .toMap
    val byDoc = frames.groupBy(_._1)
    byDoc.foreach { case (id, fs) =>
      val n = nbytes(id)
      val totalFrames = math.ceil(n / 32.0).toInt
      val sampled = (0 until totalFrames by 4).toSeq
      assert(fs.map(_._2).sorted.toSeq == sampled, s"doc $id")
      fs.foreach { case (_, idx, len) =>
        val expect = math.min(32, n - idx * 32)
        assert(len == expect, s"doc $id frame $idx")
      }
    }
    assert(byDoc.size == nbytes.size)
  }

  test("mm03: batched decode feature sum equals byte-sum of the payload") {
    val got = Multimodal.queries("mm03_batch_decode")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        r.getLong(0) -> bytes.map(b => (b & 0xff).toDouble).sum
      }.toMap
    got.foreach { case (id, s) =>
      assert(math.abs(s - want(id)) < 1e-6, s"doc $id")
    }
  }

  test("asof joins carry ALL right columns from the SAME matched row") {
    import spark.implicits._
    import graft.operators.JoinOps
    // user 1: the matched click (ts=5) has a NULL value — per-column
    // carry would take click_id from ts=5 but click_value from ts=2
    // (backward) / ts=9 (forward): row-inconsistent. Struct carry must
    // report the matched row's null.
    val purchases = Seq((1L, 6L, 100L)).toDF("user_id", "ts", "event_id")
    val clicks = Seq(
      (1L, 2L, 201L, Some(2.0)),
      (1L, 5L, 205L, None: Option[Double]),
      (1L, 9L, 209L, Some(9.0))).toDF("user_id", "ts", "click_id", "click_value")
    val back = JoinOps.asofJoin(purchases, clicks, "user_id", "ts",
      Seq("click_id", "click_value")).collect()(0)
    assert(back.getAs[Long]("asof_click_id") == 205L)
    assert(back.isNullAt(back.fieldIndex("asof_click_value")))
    val fwd = JoinOps.asofJoinForward(purchases, clicks, "user_id", "ts",
      Seq("click_id", "click_value"))
    // forward: earliest click with ts >= 6 is ts=9 → consistent (209, 9.0);
    // but move the null to ts=9 and it must stay the matched row
    val fr = fwd.collect()(0)
    assert(fr.getAs[Long]("asof_click_id") == 209L)
    assert(fr.getAs[Double]("asof_click_value") == 9.0)
    val clicks2 = Seq(
      (1L, 9L, 209L, None: Option[Double]),
      (1L, 12L, 212L, Some(12.0))).toDF("user_id", "ts", "click_id", "click_value")
    val fr2 = JoinOps.asofJoinForward(purchases, clicks2, "user_id", "ts",
      Seq("click_id", "click_value")).collect()(0)
    assert(fr2.getAs[Long]("asof_click_id") == 209L)
    assert(fr2.isNullAt(fr2.fieldIndex("asof_click_value")))
  }

  test("q65 nearest-asof picks the minimal |dt| with backward tie-break") {
    import graft.operators.JoinOps
    val got = JoinOps.queries("q65_asof_nearest")(spark, sf).collect()
    assert(got.nonEmpty)
    val ev = Tables.t(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._1)
    got.foreach { r =>
      val (eid, uid) = (r.getLong(0), r.getLong(1))
      val pts = ev.find(e => e._3 == eid).get._2
      clicksByUser.get(uid) match {
        case None => assert(r.isNullAt(2), s"purchase $eid")
        case Some(cs) =>
          val best = cs.map(c => math.abs(pts - c._2)).min
          assert(math.abs(r.getLong(3)) == best,
            s"purchase $eid dt ${r.getLong(3)} best $best")
      }
    }
  }

  test("dd16 repeated-span fractions match an in-JVM sliding-window count") {
    import graft.operators.Dedup
    val texts = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val spans = texts.toSeq.flatMap { case (id, toks) =>
      if (toks.length < 8) Seq.empty
      else (0 to toks.length - 8).map(i =>
        (id, toks.slice(i, i + 8).mkString(" ")))
    }
    val cnt = spans.groupBy(_._2).view.mapValues(_.size).toMap
    val want = spans.groupBy(_._1).map { case (id, ss) =>
      id -> (ss.size.toLong, ss.count(s => cnt(s._2) > 1).toLong)
    }
    val got = Dedup.queries("dd16_substring_dedup")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == want)
  }

  test("pp14 curriculum: 4 balanced stages, scores non-increasing by stage") {
    import graft.operators.Curation
    val rows = Curation.queries("pp14_curriculum")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).toSet == Set(1L, 2L, 3L, 4L))
    val minByStage = rows.groupBy(_._3).view.mapValues(_.map(_._2).min)
    val maxByStage = rows.groupBy(_._3).view.mapValues(_.map(_._2).max)
    (1L to 3L).foreach { st =>
      assert(minByStage(st) >= maxByStage(st + 1),
        s"stage $st floor < stage ${st + 1} ceiling")
    }
  }

  test("st07 replay dedup: every replica dropped, admitted = original") {
    val rows = graft.streaming.EventsStreaming
      .queries("st07_dedup_replay")(spark, sf).collect()
    assert(rows.nonEmpty)
    val want = Tables.t(spark, sf, "events")
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == want(r.getString(0)), s"${r.getString(0)}")
      assert(r.getLong(2) == r.getLong(1), "one replica per admitted event")
    }
  }

  test("tx03: predicted language has the maximal marker count") {
    val profiles = Map(
      "en" -> Set("the", "a", "of", "and"),
      "es" -> Set("el", "la", "de", "y"),
      "de" -> Set("der", "die", "und", "ein"),
      "fr" -> Set("le", "la", "et", "un"))
    val texts = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    TextAnalysis.queries("tx03_lang_id")(spark, sf)
      .collect().foreach { r =>
        val (id, pred, score) = (r.getLong(0), r.getString(1), r.getLong(2))
        val toks = texts(id).split(" ")
        val scores = profiles.map { case (l, m) =>
          l -> toks.count(m.contains)
        }
        assert(score == scores.values.max, s"doc $id")
        assert(scores(pred) == scores.values.max, s"doc $id pred=$pred")
      }
  }

  test("tx06: subword estimate matches the per-token formula") {
    val got = TextAnalysis.queries("tx06_token_estimate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().foreach { r =>
        val want = r.getString(1).split(" ")
          .map(t => math.ceil(t.length / 4.0).toLong).sum
        assert(got(r.getLong(0)) == want, s"doc ${r.getLong(0)}")
      }
  }

  test("tx07: source signatures equal lane-wise min of per-doc signatures") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.GraftHashes
    val docs = Tables.t(spark, sf, "documents").select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val wantSig: Map[String, Seq[Long]] = docs.groupBy(_._1).map {
      case (src, rows) =>
        val sigs = rows.map(r =>
          GraftHashes.minhashSig(UTF8String.fromString(r._2), 16, 0L))
        src -> (0 until 16).map(i => sigs.map(_(i)).min)
    }
    val rows = TextAnalysis.queries("tx07_source_signature")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, est) =>
      val agree = wantSig(a).zip(wantSig(b)).count { case (x, y) => x == y }
      val want = BigDecimal(agree.toDouble / 16)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(est - want) <= 1e-9, s"pair ($a,$b)")
    }
  }

  test("pp25: cluster split leaks nothing, naive split leaks; conservation") {
    val rows = Pipeline.pp25ClusterSplit(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq.sorted == Seq("test", "train", "val"))
    // the pinned invariant: cluster-aware assignment cannot straddle a
    // verified near-dup edge; the id-hash baseline demonstrably does
    assert(rows.forall(_._5 == 0L), s"cluster leak pairs must be 0: $rows")
    assert(rows.map(_._6).sum > 0L, "naive split should leak on this corpus")
    // conservation: corpus = documents + two mutated copies of each doc
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(rows.map(_._2).sum == 3 * nDocs, "splits must partition the corpus")
    // every cluster lives in exactly one split: per-split cluster counts
    // sum to the global count from dd10's grouping
    val nGroups = Dedup.queries("dd10_dedup_groups")(spark, sf)
      .select("group_rep").distinct().count()
    assert(rows.map(_._3).sum == nGroups,
      s"per-split cluster counts ${rows.map(_._3).sum} != global $nGroups")
  }

  test("pp30: importance selection equals an exact in-JVM recompute") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def bucket(bg: String): Long =
      java.lang.Long.parseLong(md5hex(bg).substring(0, 8), 16) % 128
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val target = Set("src0", "src1", "src2")
    // one (doc, source, bucket) row per bigram instance — so the doc
    // score Σ_f c(f)·w(f) is just Σ over instances of w(bucket)
    val feats = docs.flatMap { case (id, src, text) =>
      val tk = text.split(" ", -1)
      if (tk.length < 2) Seq.empty
      else tk.sliding(2).map(p => (id, src, bucket(p(0) + " " + p(1)))).toSeq
    }
    val (tf, rf) = feats.partition(x => target(x._2))
    val tc = tf.groupBy(_._3).map { case (f, xs) => f -> xs.size.toLong }
    val rc = rf.groupBy(_._3).map { case (f, xs) => f -> xs.size.toLong }
    val (tt, rt) = (tf.length.toLong, rf.length.toLong)
    val w = (tc.keySet ++ rc.keySet).map(f => f ->
      (tc.getOrElse(f, 0L) * 1000000L / tt -
        rc.getOrElse(f, 0L) * 1000000L / rt)).toMap
    val wantScore = rf.groupBy(_._1)
      .map { case (id, xs) => id -> xs.map(x => w(x._3)).sum }
    val rawDocs = docs.filter(x => !target(x._2))
    val wantSel = rawDocs.map(x => (x._1, x._2, wantScore.getOrElse(x._1, 0L)))
      .groupBy(_._2).toSeq.flatMap { case (_, xs) =>
        val k = math.max(1, xs.length / 5)
        val sorted = xs.sortBy(x => (-x._3, x._1))
        sorted.take(k).map(_._1 -> true) ++ sorted.drop(k).map(_._1 -> false)
      }.toMap
    val got = Pipeline.queries("pp30_importance_select")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(got.map(_._1).toSet == rawDocs.map(_._1).toSet)
    got.foreach { case (id, _, _, score, sel) =>
      assert(score == wantScore.getOrElse(id, 0L), s"doc $id score")
      assert(sel == wantSel(id), s"doc $id selected")
    }
    assert(got.exists(_._5) && got.exists(!_._5), "selection must split")
    assert(got.map(_._4).distinct.length > 1, "scores must discriminate")
  }

  test("pp31: epoch cap binds and the water-fill redistributes (planted)") {
    import spark.implicits._
    // tiny source: high quality-pass weight, few tokens → desired ≫ cap;
    // big source: plenty of capacity → receives the spillover
    val rows = (0 until 30).map { i =>
      val toks = (0 until 12).map(j => s"t${i}_$j")
      (i.toLong, toks.mkString(" "), "en", "tiny",
        toks.mkString(" ").length.toLong)
    } ++ (0 until 30).map { i =>
      val toks = (0 until 100).map(j => s"b${i}_$j")
      (100L + i, toks.mkString(" "), "en", "big",
        toks.mkString(" ").length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("pp31").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val got = Pipeline.queries("pp31_epoch_plan")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    val (uT, uB) = (30L * 12, 30L * 100)
    val budget = (uT + uB) * 3
    val (_, _, desT, allocT, epochsT, cappedT) = got("tiny")
    val (_, _, desB, allocB, _, cappedB) = got("big")
    assert(cappedT && allocT == 4 * uT && epochsT == 400,
      s"tiny must cap at 4 epochs: $got")
    assert(!cappedB && allocB > desB,
      s"big must receive the tiny spillover: $got")
    assert(allocT + allocB <= budget, "allocation cannot exceed budget")
    assert(desT == desB, "equal weights ask equal shares")
  }

  test("mm12: frame-run collapse equals an exact in-JVM recompute") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, text) =>
      val nf = math.ceil(text.length / 32.0).toInt
      val fps = (0 until nf).map { fi =>
        val src = if (id % 5 == 0) (fi / 3) * 3 else fi
        val off = src * 32
        text.substring(off, math.min(off + 32, text.length))
      }
      val runLens = fps.foldLeft(List.empty[(String, Long)]) {
        case ((h, n) :: t, fp) if h == fp => (h, n + 1) :: t
        case (acc, fp) => (fp, 1L) :: acc
      }.map(_._2)
      id -> ((nf.toLong, runLens.length.toLong, runLens.max,
        (nf - runLens.length) * 10000L / nf))
    }.toMap
    val got = graft.operators.Multimodal.queries("mm12_frame_runs")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(got(k) == v, s"media $k") }
    // planted frozen scenes must collapse; unplanted media must not be
    // all-static
    assert(got.filter { case (k, v) => k % 5 == 0 && v._1 >= 3 }
      .values.forall(_._3 >= 3),
      "planted media with >=3 frames must show a >=3-frame run")
    assert(got.filterKeys(_ % 5 != 0).values.exists(_._4 == 0L),
      "some unplanted media must be run-free")
  }

  test("pp32: fertility audit equals an exact in-JVM recompute") {
    import graft.functions.Bpe
    val docs = Tables.t(spark, sf, "documents")
      .select("lang", "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    // r10: real subword counts — replay the tx34 training in-JVM
    val wf = docs.flatMap(_._3.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) }
      .toSeq.sortBy { case (w, f) => (-f, w) }.take(4096)
    val pairs = Bpe.train(wf, math.min(24, math.max(8, wf.length / 2)))
      .map { case (l, r, _) => (l, r) }.toArray
    val want = docs.groupBy(x => (x._1, x._2)).map { case (k, xs) =>
      val w = xs.map(x => x._3.count(_ == ' ').toLong + 1).sum
      val sw = xs.map(_._3.split(" ", -1).filter(_.nonEmpty).map(t =>
        Bpe.encodeCount(t, pairs).toLong).sum).sum
      val nsp = xs.map(_._3.count(_ != ' ').toLong).sum
      k -> ((xs.length.toLong, w, sw, sw * 10000L / w, nsp * 100L / sw))
    }
    val got = graft.operators.Pipeline
      .queries("pp32_tokenizer_fertility")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(got(k) == v, s"group $k") }
    // subword estimate must actually exceed the word count somewhere
    // (long tokens split) or the metric is degenerate
    assert(got.values.exists(v => v._3 > v._2), "fertility degenerate")
  }

  test("gr16: rich-club curve is well-formed on the sparsified support") {
    val rows = graft.operators.Graph.queries("gr16_rich_club")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty, "no club thresholds — support degenerate")
    // thresholds ascend, clubs strictly shrink, density in [0, 1]
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted.reverse)
    rows.foreach { case (_, n, e, phi) =>
      assert(n >= 2L && 2L * e <= n * (n - 1L))
      assert(phi == 2L * e * 10000L / (n * (n - 1L)))
    }
  }

  test("gr15: trade balance conserves world flow and nets sum to zero") {
    val rows = graft.operators.Graph.queries("gr15_trade_balance")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 25)
    // every exported cent is someone's import: nets sum to zero and
    // world exports equal world imports exactly
    assert(rows.map(_._4).sum == 0L, "net positions do not cancel")
    assert(rows.map(_._2).sum == rows.map(_._3).sum)
    // balance share consistent with the integer definition
    rows.foreach { case (_, ex, im, _, bal) =>
      assert(bal == ex * 10000L / math.max(1L, ex + im))
    }
    // positions must actually differ (surplus and deficit nations exist)
    assert(rows.exists(_._4 > 0L) && rows.exists(_._4 < 0L))
  }

  test("gr14: personalized PageRank concentrates mass near the seeds") {
    val rows = graft.operators.Graph.queries("gr14_ppr_seeded")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getBoolean(2),
        r.getLong(3)))
    assert(rows.count(_._3) == 5, "region 0 must contribute 5 seed nations")
    assert(rows.forall(_._4 >= 0L), "negative mass")
    // teleport returns only to seeds, so any non-seed mass arrived over
    // trade paths — it must exist (the graph is strongly connected-ish)
    assert(rows.filter(!_._3).exists(_._4 > 0L), "no propagated mass")
    // personalization must actually bite: average seed mass strictly
    // above average non-seed mass
    val (seeds, rest) = rows.partition(_._3)
    assert(seeds.map(_._4).sum * rest.length >
      rest.map(_._4).sum * seeds.length,
      "seed nations not favored by the restart")
    // and the ranking must differ from global PageRank's
    val global = graft.operators.Graph.queries("gr01_pagerank")(spark, sf)
      .collect().map(_.getInt(0)).toSeq
    assert(rows.map(_._1).toSeq != global,
      "personalized ranking identical to global PageRank")
  }

  test("q93: skew profile summaries are internally consistent") {
    val rows = graft.operators.Skew.queries("q93_skew_profile")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length == 5)
    rows.foreach { case (k, nk, nr, mx, skew, salt) =>
      // max is a real key's count: at least the uniform share, at most all
      assert(mx * nk >= nr && mx <= nr, k)
      assert(skew == mx * nk * 100 / nr && skew >= 100L, k)
      assert(salt == (mx + 999L) / 1000L, k)
    }
  }

  test("q92: lifecycle states conserve the active population") {
    val rows = graft.operators.RelationalQueries
      .queries("q92_lifecycle")(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val quarters = rows.keys.map(_._1).toList.distinct.sorted
    assert(quarters.length >= 3)
    def n(q: String, s: String) = rows.getOrElse((q, s), 0L)
    def activeNow(q: String) =
      n(q, "new") + n(q, "active") + n(q, "reactivated")
    // every customer active in q-1 is, at q, either still active or
    // freshly lapsed — the state machine loses nobody
    quarters.sliding(2).foreach { case List(p, q) =>
      assert(n(q, "active") + n(q, "lapsed") == activeNow(p),
        s"$p -> $q: ${n(q, "active")} + ${n(q, "lapsed")} != ${activeNow(p)}")
    }
    // all four states occur somewhere
    assert(Set("new", "active", "reactivated", "lapsed")
      .forall(s => rows.keys.exists(_._2 == s)))
  }

  test("q91: Gini stays in [0, (n-1)/n] and is zero only under equality") {
    val rows = graft.operators.RelationalQueries
      .queries("q91_supplier_gini")(spark, sf)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, tot, g) =>
      assert(tot > 0L)
      // hard bounds of the finite-population Gini
      assert(g >= 0L && g * n <= (n - 1L) * 10000L, s"g=$g n=$n")
    }
    // a single supplier is perfectly equal by definition
    rows.filter(_._1 == 1L).foreach(x => assert(x._3 == 0L))
    // where a nation has several suppliers, cent-valued revenues make
    // exact equality vanishingly unlikely — inequality must register
    // (at sf0.001 every nation has one supplier and the claim is moot)
    if (rows.exists(_._1 >= 2L)) assert(rows.exists(_._3 > 0L))
  }

  test("q90: HHI respects share bounds and class thresholds") {
    val rows = graft.operators.RelationalQueries
      .queries("q90_supplier_hhi")(spark, sf)
      .collect().map(r => (r.getLong(2), r.getLong(4), r.getLong(5),
        r.getString(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, hhi, top, cls) =>
      assert(n >= 1L && top <= 1000000L)
      // top share alone bounds below; perfect monopoly bounds above
      assert(hhi >= top * top && hhi <= 1000000000000L)
      // pigeonhole with quantization slack: sum of shares >= 1e6 - n
      assert(hhi * n >= (1000000L - n) * (1000000L - n),
        s"hhi $hhi too small for $n suppliers")
      val expect = if (hhi < 150000000000L) "competitive"
        else if (hhi < 250000000000L) "moderate" else "concentrated"
      assert(cls == expect)
    }
  }

  test("pp35: manifest root is the fold of the shard digests") {
    val rows = graft.operators.Pipeline.queries("pp35_manifest")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    val (roots, shards) = rows.partition(_._1 == "root")
    assert(roots.length == 1 && shards.nonEmpty)
    val root = roots.head
    // totals conserve
    assert(root._4 == shards.map(_._4).sum && root._5 == shards.map(_._5).sum)
    // the root digest is exactly md5 over shard digests in shard order —
    // re-derived here, so a digest change anywhere must surface at the root
    val concat = shards.sortBy(x => (x._2, x._3)).map(_._6).mkString
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(concat.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(md == root._6, s"root ${root._6} != derived $md")
    // shard digests are non-degenerate: all distinct
    assert(shards.map(_._6).distinct.length == shards.length)
  }

  test("q89: seasonal anomalies all exceed 2x their hour-of-day mean") {
    val rows = graft.operators.RelationalQueries
      .queries("q89_seasonal_anomaly")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty, "no anomalies on the test corpus")
    // the flag condition itself, re-checked row by row
    assert(rows.forall(x => x._3 * x._5 > 2L * x._4))
    // intensity is the cross-multiplied ratio, so always > 200%
    assert(rows.forall(_._6 >= 201L))
    assert(rows.forall(x => x._2 >= 0L && x._2 <= 23L))
    // flagged cells are a strict minority of the POPULATED grid (at
    // sparse SFs the Poisson mean per cell is <1, so 2x exceedances
    // are common — the bound is against cells, not a fixed rate)
    val cells = graft.Tables.t(spark, sf, "events")
      .selectExpr("event_type",
        "date_format(ts, 'yyyy-MM-dd') AS day", "hour(ts) AS hr")
      .distinct().count()
    assert(rows.length < cells / 2, s"${rows.length} of $cells cells")
  }

  test("q88: ABC classes partition parts and concentrate revenue") {
    val got = graft.operators.RelationalQueries
      .queries("q88_abc_pareto")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.map(_._1).toSeq == Seq("A", "B", "C"))
    // classes partition the rank line contiguously
    assert(got(0)._6 == got(0)._2 && got(1)._6 == got(0)._2 + got(1)._2 &&
      got(2)._6 == got.map(_._2).sum, "class rank boundaries not contiguous")
    // floor-division shares sum to 10^4 minus < n_classes
    Seq(got.map(_._4).sum, got.map(_._5).sum).foreach { s =>
      assert(s <= 10000L && s > 10000L - 3, s"share sum $s")
    }
    // Pareto concentration: A's revenue share strictly exceeds its part
    // share; C's is strictly below
    assert(got(0)._4 > got(0)._5, "A class not revenue-concentrated")
    assert(got(2)._4 < got(2)._5, "C tail not revenue-light")
  }

  test("q87: every attribution model conserves total purchase cents") {
    val rows = graft.operators.RelationalQueries
      .queries("q87_attribution")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val totalCents = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .selectExpr("CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) " +
        "AS BIGINT)").collect()(0).getLong(0)
    rows.groupBy(_._1).foreach { case (model, rs) =>
      assert(rs.map(_._3).sum == totalCents,
        s"$model must conserve purchase cents exactly")
      // shares are floor-division; they sum to 10^4 minus < n_types
      val shareSum = rs.map(_._5).sum
      assert(shareSum <= 10000 && shareSum > 10000 - rs.length,
        s"$model share sum $shareSum")
    }
    // all three models and at least view/click/direct types must be live
    assert(rows.map(_._1).distinct.sorted.toSeq ==
      Seq("first_touch", "last_touch", "linear"))
    assert(Set("view", "click", "direct")
      .subsetOf(rows.map(_._2).toSet), "touch types degenerate")
    // first/last must actually differ somewhere or journey endpoints
    // are degenerate
    val ft = rows.filter(_._1 == "first_touch").map(r => r._2 -> r._3).toMap
    val lt = rows.filter(_._1 == "last_touch").map(r => r._2 -> r._3).toMap
    assert(ft != lt, "first-touch and last-touch credit identical")
  }

  test("pp34: soft weights conserve one effective doc per cluster") {
    val groups = graft.operators.Dedup.queries("dd10_dedup_groups")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    groups.groupBy(_._2).foreach { case (rep, ms) =>
      val k = ms.length.toLong
      assert(ms.forall(_._3 == k), s"cluster $rep size column inconsistent")
      val sum = k * (10000L / k)
      assert(sum <= 10000L && sum > 10000L - k,
        s"cluster $rep weight sum $sum outside (10^4 - k, 10^4]")
    }
    val got = graft.operators.Pipeline.queries("pp34_soft_weights")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.map(_._2).sum == groups.length,
      "per-source members must cover the dd10 corpus")
    assert(got.map(_._3).sum == groups.map(_._2).distinct.length,
      "per-source clusters must cover all dd10 components")
    val wantEff = groups.groupBy(_._2)
      .map { case (_, ms) => ms.length * (10000L / ms.length) }.sum
    assert(got.map(_._4).sum == wantEff,
      "effective-doc mass must equal the per-cluster floor weights")
    got.foreach(r => assert(r._5 >= 10000L, s"inflation below 1x: $r"))
    assert(got.exists(_._5 > 10000L), "no duplication measured at all")
  }

  test("pp33: l-diversity audit equals an exact in-JVM recompute") {
    val docs = Tables.t(spark, sf, "documents")
      .select("lang", "text", "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val want = docs
      .groupBy(x => (x._1, (x._2.count(_ == ' ').toLong + 1) / 50))
      .map { case (k, xs) =>
        val bySrc = xs.groupBy(_._3).map(_._2.length.toLong)
        k -> ((xs.length.toLong, bySrc.size.toLong, bySrc.size >= 3,
          bySrc.max * 10000L / xs.length))
      }
    val got = graft.operators.Pipeline.queries("pp33_l_diversity")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getLong(5)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(got(k) == v, s"group $k") }
    // the audit is only meaningful if both verdicts occur — at least
    // one diverse group and the modal share never below uniform-over-
    // sources
    assert(got.values.exists(_._3), "no l-diverse group at all")
    got.values.foreach { v =>
      assert(v._4 >= 10000L / math.max(v._2, 1L), s"modal below uniform: $v")
    }
  }

  test("tx29: canary audit counts exactly the planted exposures") {
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val planted = docs.filter(_._1 % 23 == 3).flatMap { case (id, src) =>
      val cid = (id / 23) % 8
      val twice = id % 46 == 3
      Seq.fill(if (twice) 2 else 1)((cid, id, src))
    }
    val want = planted.groupBy(_._1).map { case (cid, xs) =>
      cid -> ((xs.length.toLong, xs.map(_._2).distinct.length.toLong,
        xs.map(_._3).distinct.length.toLong))
    }
    val got = graft.operators.TextAnalysis
      .queries("tx29_canary_audit")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got.keySet == want.keySet, "detected canary set != planted set")
    want.foreach { case (cid, (occ, nd, ns)) =>
      val g = got(cid)
      assert((g._1, g._2, g._3) == ((occ, nd, ns)), s"canary $cid: $g")
      val cls = if (occ >= 5) "high" else if (occ >= 2) "repeated"
        else "single"
      assert(g._4 == cls, s"canary $cid class ${g._4} != $cls")
    }
    // double-planting must actually create occ > docs somewhere, and
    // cross-source spread must occur
    assert(got.values.exists(g => g._1 > g._2), "no double exposures")
    assert(got.values.exists(_._3 > 1L), "no cross-source canary")
  }

  test("tx28: encoding audit catches exactly the planted damage") {
    import graft.operators.TextAnalysis
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def clazz(id: Long): String = (id % 17) match {
      case 0 => "replacement"; case 5 => "control"; case 11 => "mojibake"
      case _ => "clean"
    }
    val want = docs.groupBy(x => (x._2, clazz(x._1))).map { case (k, xs) =>
      k -> xs.length.toLong
    }
    val got = TextAnalysis.queries("tx28_encoding_audit")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.map(x => (x._1, x._2) -> x._3).toMap == want,
      "per-class doc counts must equal the planting rule")
    got.foreach { case (src, cl, n, dmg, _) =>
      // every planting injects exactly 3 damage chars of its class
      assert(dmg == (if (cl == "clean") 0L else 3L * n),
        s"$src/$cl damage chars $dmg for $n docs")
    }
    assert(got.map(_._2).distinct.sorted.toSeq ==
      Seq("clean", "control", "mojibake", "replacement"),
      "all four classes must be live")
    // per-source rates sum to 10^4 minus at most one truncation unit
    // per class present
    got.groupBy(_._1).foreach { case (src, rows) =>
      val rs = rows.map(_._5).sum
      assert(rs <= 10000L && rs > 10000L - rows.length, s"$src rates $rs")
    }
  }

  test("tx25: bigram surprisal equals an exact in-JVM recompute") {
    import graft.operators.Curation
    val texts = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val insts = texts.toSeq.flatMap { case (id, t) =>
      val tk = t.split(" ", -1)
      tk.sliding(2).filter(_.length == 2)
        .map(p => (id, p(0), p(0) + " " + p(1))).toSeq
    }
    val c2 = insts.groupBy(_._3).map { case (bg, xs) => bg -> xs.size.toLong }
    val c1 = insts.groupBy(_._2).map { case (w1, xs) => w1 -> xs.size.toLong }
    val want = insts.groupBy(_._1).map { case (id, xs) =>
      val invps = xs.map(x => c1(x._2) * 10000L / c2(x._3))
      id -> (xs.size.toLong, invps.sum, invps.sum / xs.size)
    }
    val got = Curation.queries("tx25_bigram_surprisal")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"doc $id: got ${got(id)}, want $w")
    }
  }

  test("pp36: bins partition the corpus under the greedy capacity rule") {
    val rows = Pipeline.queries("pp36_seq_packing")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val nDocs = Tables.t(spark, sf, "documents").count()
    // every document lands in exactly one bin
    assert(rows.map(_._3).sum == nDocs, s"docs packed ${rows.map(_._3).sum}")
    rows.foreach { case (src, bin, n, toks, fillX10k) =>
      // a bin only exceeds capacity when a single oversized doc owns it
      assert(toks <= 256L || n == 1L, s"$src/$bin: $n docs, $toks tokens")
      assert(fillX10k == toks * 10000 / 256, s"$src/$bin fill")
      assert(n >= 1L && toks >= 1L)
    }
    // bin ids are contiguous from 0 within each source (the greedy scan
    // never skips a bin)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val bins = rs.map(_._2).sorted.toSeq
      assert(bins == (0L until bins.length.toLong).toSeq,
        s"$src bins $bins")
    }
    // greedy is locally tight: merging two ADJACENT bins would always
    // overflow capacity (otherwise the scan would not have split them)
    rows.groupBy(_._1).foreach { case (src, rs) =>
      rs.sortBy(_._2).toSeq.sliding(2).foreach {
        case Seq((_, _, _, t1, _), (_, _, n2, t2, _)) =>
          // the first doc of the next bin did not fit: t1 + (its ntok)
          // > 256; since ntok <= t2 this is implied by t1 + t2 > 256
          // only when bin2 is a single doc — check that tight case
          if (n2 == 1L) assert(t1 + t2 > 256L, s"$src mergeable bins")
        case _ => ()
      }
    }
  }

  test("tx31: vocabulary growth is monotone and prefix-consistent") {
    val rows = TextAnalysis.queries("tx31_vocab_growth")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1) sameElements
      Array(100L, 200L, 500L, 1000L, 2000L, 5000L))
    rows.toSeq.sliding(2).foreach { case Seq((_, g1, v1), (_, g2, v2)) =>
      assert(g2 >= g1 && v2 >= v1, "growth must be monotone")
    }
    // the widest prefix covers the whole corpus: totals must equal a
    // direct recompute
    val texts = Tables.t(spark, sf, "documents").select("text")
      .collect().map(_.getString(0)).filter(_.split(" ", -1).length >= 3)
    val grams = texts.flatMap(_.split(" ", -1).sliding(3).map(_.mkString(" ")))
    assert(rows.last._2 == grams.length.toLong, "total gram volume")
    assert(rows.last._3 == grams.distinct.length.toLong, "full vocab")
  }

  test("dd29: admission splits exactly on the planted batch structure") {
    val rows = Dedup.queries("dd29_incremental_admission")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.nonEmpty)
    // Exact-split assertions only hold where the operator GUARANTEES
    // them (ADVICE r7): a source with ≥5 tokens keeps trigram Jaccard
    // ≥ 0.5 under the 1-token drop (re-encode must match) and flips
    // every trigram under reversal (novel must admit). Short docs are
    // the documented honest boundary and are exempt. The best-match
    // identity also tolerates a corpus duplicate of the source text
    // winning the (j desc, base_id asc) tie-break.
    val srcText = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, base, j, admitted) =>
      // structural invariants hold for EVERY row, short docs included
      assert(admitted == (base == -1L), s"$id: base=$base admitted=$admitted")
      if (admitted) assert(j == 0L) else assert(j >= 5000L)
      val srcId = if (id >= 30000000L) id - 30000000L else id - 20000000L
      val longSrc = srcText(srcId).split(" ", -1).length >= 5
      if (id >= 20000000L && id < 30000000L) {
        if (longSrc) {
          // a long-enough re-encode matches its own source doc — or an
          // exact-duplicate of it with a smaller id
          assert(!admitted, s"re-encode $id admitted")
          assert(base == srcId || srcText(base) == srcText(srcId),
            s"$id matched $base (not source $srcId or a duplicate)")
        }
      } else if (longSrc) {
        // token-reversed long docs are novel: every trigram changed
        assert(admitted, s"novel $id matched $base at j=$j")
      }
    }
    // the fixture must actually exercise both outcomes
    assert(rows.exists(_._4) && rows.exists(!_._4))
  }

  test("pp37: derived shards partition the corpus; digest = in-JVM fold") {
    val run1 = Pipeline.queries("pp37_shuffle_shards")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(run1.map(_._2).sum == docs.length.toLong,
      "shards must partition the corpus")
    // shard count is DERIVED: ⌈corpus_tokens / 4000⌉, never a fixed mod
    def ntok(t: String): Long = t.count(_ == ' ').toLong + 1L
    val totalTokens = docs.map(d => ntok(d._2)).sum
    val nShards = math.max(1L, (totalTokens + 3999L) / 4000L)
    assert(nShards > 1L, "fixture must exercise multi-shard derivation")
    assert(run1.forall(r => r._1 >= 0L && r._1 < nShards),
      s"shard ids must sit under the derived count $nShards")
    // the order digest is pinned to an independent in-JVM reference
    // fold: md5 over doc_ids joined by ',' in (h, id-string) order —
    // any buffer/ordering change in the distributed aggregate breaks
    // byte-equality here
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = docs
      .map { case (id, _) => (id, md5hex(s"seed42#$id")) }
      .groupBy { case (_, h) =>
        java.lang.Long.parseLong(h.substring(0, 8), 16) % nShards }
      .map { case (shard, members) =>
        val ordered = members.sortBy { case (id, h) => (h, id.toString) }
        shard -> md5hex(ordered.map(_._1.toString).mkString(","))
      }
    assert(run1.length == expected.size)
    run1.foreach { case (shard, _, _, digest) =>
      assert(expected(shard) == digest, s"shard $shard digest mismatch")
    }
    // determinism: a second evaluation reproduces every digest
    val run2 = Pipeline.queries("pp37_shuffle_shards")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(run2.toSeq == run1.map(r => (r._1, r._4)).toSeq)
  }

  test("tx32: CMS never undercounts; overshoot sits under the CMS bound") {
    val rows = TextAnalysis.queries("tx32_countmin_ngrams")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (g, t, e, over) =>
      // the structural CMS guarantee: min over d cells >= the true count
      assert(over == e - t, s"$g: overshoot column inconsistent")
      assert(over >= 0L, s"$g: CMS undercounted ($e < $t)")
    }
    // total stream length N: every gram increments one cell per seed row,
    // so overshoot per probe is bounded by the load the OTHER grams put
    // on its cells; 2N/w is the Markov envelope per row, taken to the
    // min over 4 independent rows — a deterministic violation here means
    // the cell hash is broken, not bad luck. The width is re-derived
    // here from an independent in-JVM gram census (the same rule the
    // operator applies at plan-build), and the derivation itself is
    // pinned: w ≥ 64 and distinct-grams-per-cell ≤ 9 (the density
    // target the rule exists to hold as the corpus grows).
    val gramList = Tables.t(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .map(_.getString(0).split(" ", -1)).filter(_.length >= 3)
      .flatMap(_.sliding(3).map(_.mkString(" ")))
    val n = gramList.length.toLong
    val v = gramList.distinct.length.toLong
    val width = TextAnalysis.cmsWidth(v)
    assert(width >= 64L, s"width floor violated: $width")
    assert(v <= 9L * width, s"density ${v.toDouble / width} exceeds 9")
    val bound = math.max(1L, 2L * n / width)
    assert(rows.forall(_._4 <= bound),
      s"overshoot exceeds 2N/w = $bound: ${rows.filter(_._4 > bound).take(3)}")
    // non-degenerate in both directions. At the derived ~8-grams-per-
    // cell density an all-4-cells-clean probe is structurally gone
    // (P ≈ e^-32 per probe — the r8 w=4096 fixture's exact hits were
    // an artifact of its over-provisioned width), so the useful floor
    // check is that the min-over-4-rows trick BEATS the mean single-row
    // load N/w for at least one probe; and collisions must exist or
    // the bound assert above is vacuous
    assert(rows.map(_._4).min <= n / width,
      s"best overshoot ${rows.map(_._4).min} never beats the mean " +
      s"row load ${n / width} — cell hash degenerate?")
    assert(rows.exists(_._4 > 0L), "no collision — fixture too small")
  }

  test("pp38: both packing folds match an in-JVM sequential replay " +
      "and sit on or above the token lower bound") {
    val binCap = 256L
    val docs = Tables.t(spark, sf, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ", -1).length.toLong))
    // the operator's fold, replayed verbatim on a driver-side seq:
    // first doc opens bin 0 unconditionally, then next-fit
    def replay(ds: Seq[Long]): (Long, Long) = {
      var bin = 0L; var fill = 0L; var first = true
      val tot = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      ds.foreach { nt =>
        if (first) { first = false; fill = nt }
        else if (fill + nt <= binCap) fill += nt
        else { bin += 1L; fill = nt }
        tot(bin) += nt
      }
      (bin + 1L, tot.values.map(t => math.max(0L, binCap - t)).sum)
    }
    val bySrc = docs.groupBy(_._1)
    val got = Pipeline.queries("pp38_nfd_packing")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    assert(got.keySet == bySrc.keySet)
    got.foreach { case (src, (nDocs, totTok, lb, binsA, padA, binsN, padN)) =>
      val ds = bySrc(src)
      assert(nDocs == ds.length.toLong, s"$src: n_docs")
      assert(totTok == ds.map(_._3).sum, s"$src: total_tokens")
      assert(lb == (totTok + binCap - 1L) / binCap, s"$src: lb_bins")
      val (ba, pa) = replay(ds.sortBy(_._2).map(_._3))
      val (bn, pn) = replay(ds.sortBy(d => (-d._3, d._2)).map(_._3))
      assert((binsA, padA) == ((ba, pa)), s"$src: arrival fold diverged")
      assert((binsN, padN) == ((bn, pn)), s"$src: NFD fold diverged")
      assert(binsA >= lb && binsN >= lb, s"$src: below the lower bound")
    }
    // the report's headline call, pinned at corpus level: under a
    // one-pass sequential fold the descending sort never WINS overall
    // (it trades away the size diversity next-fit feeds on)
    val sumA = got.values.map(_._4).sum
    val sumN = got.values.map(_._6).sum
    assert(sumN >= sumA, s"NFD beat arrival overall ($sumN < $sumA) — " +
      "the pp38 scaladoc's measured verdict no longer holds")
  }

  test("dd30: policy removal ordering, accounting identities, and all " +
      "three policies re-derived from an in-JVM corpus rebuild") {
    val got = Dedup.queries("dd30_policy_impact")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == Set("exact", "jaccard_50", "jaccard_80"))
    val base = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // rebuild the planted corpus exactly as the operator does
    val off = 10000000L // Dedup.COPY_OFFSET
    def dropTok(t: String) =
      if (t.contains(' ')) t.substring(t.indexOf(' ') + 1) else t
    def m2txt(t: String) = {
      val ts = t.split(" ", -1); ts.drop(ts.length / 3).mkString(" ")
    }
    val corpus: Seq[(Long, String)] =
      base.toSeq.map { case (id, t) => id -> t } ++
      base.toSeq.map { case (id, t) =>
        (id + off) -> (if (id % 5 == 0) t else dropTok(t)) } ++
      base.toSeq.map { case (id, t) => (id + 2 * off) -> m2txt(t) }
    val ntok = corpus.map { case (id, t) =>
      id -> t.split(" ", -1).length.toLong }.toMap
    val din = corpus.length.toLong
    // exact policy: group by text identity
    def rollup(labels: Map[Long, Long]): (Long, Long, Long, Long) = {
      val kept = labels.values.toSet.size.toLong
      val tokRem = labels.collect {
        case (id, l) if id != l => ntok(id) }.sum
      (din, kept, din - kept, tokRem)
    }
    val exactLabels = corpus.groupBy(_._2).values.flatMap { g =>
      val m = g.map(_._1).min; g.map(_._1 -> m) }.toMap
    assert(got("exact") == rollup(exactLabels), "exact policy diverged")
    // jaccard policies: DISTINCT token-3-gram string shingles (equals
    // the operator's 64-bit hashed shingles up to hash collisions — the
    // dd10 rule), planted candidate pairs, union-find CC
    def shingles(t: String): Set[String] = {
      val ts = t.split(" ", -1)
      if (ts.length < 3) Set(t)
      else ts.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = corpus.map { case (id, t) => id -> shingles(t) }.toMap
    val cand = base.map(_._1).flatMap(i =>
      Seq((i, i + off), (i, i + 2 * off), (i + off, i + 2 * off)))
    def cc(thr: Double): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long](
        corpus.map(c => c._1 -> c._1): _*)
      def find(x: Long): Long = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      cand.foreach { case (a, b) =>
        val (sa, sb) = (sh(a), sh(b))
        val inter = (sa & sb).size.toDouble
        val j = inter / (sa.size + sb.size - inter)
        if (j >= thr) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
      corpus.map(c => c._1 -> find(c._1)).toMap
    }
    assert(got("jaccard_50") == rollup(cc(0.5)), "jaccard_50 diverged")
    assert(got("jaccard_80") == rollup(cc(0.8)), "jaccard_80 diverged")
    // the separating-plant ordering the operator exists to report
    assert(got("exact")._3 <= got("jaccard_80")._3)
    assert(got("jaccard_80")._3 < got("jaccard_50")._3,
      "loose threshold no longer separates from strict — plant broken")
    got.values.foreach { case (d, k, r, _) => assert(k + r == d) }
  }

  test("dd31: every reported span equals an in-JVM dynamic-programming " +
      "LCS on the raw token arrays; chimera halves are recovered") {
    val rows = Dedup.queries("dd31_longest_span")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val base = Tables.t(spark, sf, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val n = base.length
    val texts = scala.collection.mutable.Map[Long, Array[String]]()
    base.foreach { case (_, id, t) => texts(id) = t.split(" ", -1) }
    // chimera partner = id-successor WITHIN the source, wrapping
    base.groupBy(_._1).values.foreach { g =>
      val srt = g.sortBy(_._2)
      for (k <- srt.indices) {
        val (_, id, t) = srt(k)
        val (_, _, pt) = srt((k + 1) % srt.length)
        val ts = t.split(" ", -1)
        val ps = pt.split(" ", -1)
        texts(id + 30000000L) =
          ts.take((ts.length + 1) / 2) ++ ps.drop(ps.length / 2)
      }
    }
    // classic O(|x|·|y|) longest-common-substring DP — the quadratic
    // truth the operator's diagonal-islands formulation must equal
    def lcs(x: Array[String], y: Array[String]): Int = {
      var best = 0
      var prev = new Array[Int](y.length + 1)
      var cur = new Array[Int](y.length + 1)
      for (i <- 1 to x.length) {
        java.util.Arrays.fill(cur, 0)
        for (j <- 1 to y.length) if (x(i - 1) == y(j - 1)) {
          cur(j) = prev(j - 1) + 1
          if (cur(j) > best) best = cur(j)
        }
        val tmp = prev; prev = cur; cur = tmp
      }
      best
    }
    assert(rows.length >= n, "pair list smaller than the plant")
    rows.foreach { case (a, b, na, nb, span, share) =>
      val truth = lcs(texts(a), texts(b))
      val expected = if (truth >= 4) truth.toLong else 0L
      assert(span == expected, s"pair ($a,$b): span $span != DP $truth")
      assert(na == texts(a).length.toLong, s"n_a at ($a,$b)")
      assert(nb == texts(b).length.toLong, s"n_b at ($a,$b)")
      assert(share == span * 10000L / math.min(na, nb))
    }
    // the chimera guarantee: (i, chim_i) recovers at least i's prefix
    // half (longer if the suffix happens to extend the run)
    val prefixPairs = rows.filter(r => r._2 == r._1 + 30000000L)
    assert(prefixPairs.nonEmpty)
    prefixPairs.filter(_._3 >= 8).foreach { case (a, _, na, _, span, _) =>
      assert(span >= (na + 1) / 2, s"chimera $a: prefix half lost")
    }
  }

  test("ss32: exact twin rank is 1 for every query and the projected " +
      "top-10 keeps a majority of twins") {
    val rows = Similarity.queries("ss32_jl_recall")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.length == 50, s"expected 50 queries, got ${rows.length}")
    rows.foreach { case (q, rx, rp, f10) =>
      // the twin regime's premise: at cos ≈ 0.9999 the exact ranking
      // MUST put the twin first — anything else means the exact branch
      // (not the projection) is broken
      assert(rx == 1L, s"query $q: exact twin rank $rx != 1")
      assert(rp >= 1L)
      assert(f10 == (rp <= 10L), s"query $q: found_at_10 inconsistent")
    }
    val kept = rows.count(_._4)
    assert(2 * kept > rows.length,
      s"projection keeps only $kept/${rows.length} twins in top-10 — " +
      "below the majority the scaladoc promises")
  }

  test("mm15: crop plan re-derived byte-for-byte from the source text " +
      "(planted 3+3 bars, unplanted zero-trim, fingerprints included)") {
    val got = Multimodal.queries("mm15_letterbox_crop")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6))).toMap
    val texts = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(b).map(x => f"$x%02x").mkString
    var sawPlantedExact = false
    var sawUnplantedZero = false
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val h0 = bytes.length / 16
      if (h0 == 0) assert(!got.contains(id))
      else {
        val raster = bytes.take(16 * h0)
        val pad = Array.fill(48)(' '.toByte)
        val px = if (id % 4 == 0) pad ++ raster ++ pad else raster
        val h = px.length / 16
        def flat(y: Int): Boolean =
          (1 until 16).forall(x => px(y * 16 + x) == px(y * 16))
        var top = 0
        while (top < h && flat(top)) top += 1
        var bottom = 0
        if (top < h)
          while (bottom < h - top && flat(h - 1 - bottom)) bottom += 1
        val ch = h - top - bottom
        // r12: crop_fp lives in the hex domain (md5 over the uppercase
        // hex of the cropped bytes — the byte-true cross-engine form)
        val fp = md5hex(java.util.Arrays.copyOfRange(
            px, top * 16, (top + ch) * 16)
          .map(x => f"${x & 0xff}%02X").mkString.getBytes("UTF-8"))
        assert(got(id) == ((h.toLong, top.toLong, bottom.toLong,
          ch.toLong, ch.toLong * 10000L / h, fp)),
          s"media $id: plan diverged from the byte replay")
        if (id % 4 == 0 && top == 3 && bottom == 3) sawPlantedExact = true
        if (id % 4 != 0 && top == 0 && bottom == 0) sawUnplantedZero = true
        if (id % 4 == 0)
          assert(top >= 3 && bottom >= 3,
            s"media $id: planted bars not trimmed ($top/$bottom)")
      }
    }
    assert(sawPlantedExact, "no planted media trimmed exactly 3+3")
    assert(sawUnplantedZero, "no unplanted media kept full height")
  }

  test("st22: derived CMS width holds the ≤9-users-per-cell density " +
      "bound and scales with the user population") {
    val u = Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    val w = EventsStreaming.cmsWidth(u)
    assert(w >= 16, s"width floor violated: $w")
    assert(u <= 9L * w, s"density ${u.toDouble / w} exceeds 9")
    // the rule has teeth past the floor: width tracks the population
    // linearly (this is what a hardcoded 64 could never do)
    assert(EventsStreaming.cmsWidth(1500L) == 187)
    assert(EventsStreaming.cmsWidth(150L) == 18)
    assert(EventsStreaming.cmsWidth(10L) == 16, "floor must hold")
  }

  test("tx34/tx35: merge table and per-doc subword counts match an " +
      "in-JVM word-count + train + encode replay") {
    import graft.functions.Bpe
    val texts = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent word-frequency table (cap + ordering replayed)
    val wf = texts.values.toSeq.flatMap(_.split(" ", -1))
      .filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) }
      .toSeq.sortBy { case (w, f) => (-f, w) }.take(4096)
    val m = math.min(24, math.max(8, wf.length / 2))
    val merges = Bpe.train(wf, m)
    val gotMerges = TextAnalysis.queries("tx34_bpe_merges")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(gotMerges.toSeq == merges.zipWithIndex.map {
      case ((l, r, c), i) => ((i + 1).toLong, l, r, c) },
      "merge table differs from the in-JVM training replay")
    // per-doc subword counts: encode every word with the merge ranks
    val pairs = merges.map { case (l, r, _) => (l, r) }.toArray
    val got = TextAnalysis.queries("tx35_subword_tokens")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      val nSub = toks.filter(_.nonEmpty)
        .map(w => Bpe.encodeCount(w, pairs).toLong).sum
      val (nw, ns, est, fert) = got(id)
      assert(nw == toks.length, s"doc $id n_words")
      assert(ns == nSub, s"doc $id n_subwords $ns != $nSub")
      assert(est == (text.length + 3) / 4, s"doc $id est_tokens")
      assert(fert == ns * 100 / nw, s"doc $id fertility")
    }
    // the tokenizer is non-degenerate on this corpus: real compression
    // (fewer subwords than chars) and real splitting (more than words)
    val totSub = got.values.map(_._2).sum
    val totW = got.values.map(_._1).sum
    assert(totSub > totW, "every word merged to one token - merges too strong")
    assert(totSub < texts.values.map(_.length).sum, "no merging happened")
  }

  test("dd32: span removal matches an in-JVM canonical-rank replay; " +
      "token conservation holds and real cuts happen") {
    val texts = Tables.t(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq.sortBy(_._1)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // span table in (doc_id, pos) order; canonical = first occurrence
    val spans = texts.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      if (t.length < 8) Seq.empty
      else (0 to t.length - 8).map(p =>
        (md5hex(t.slice(p, p + 8).mkString(" ")), id, p))
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val removed = scala.collection.mutable.Map.empty[Long,
      scala.collection.mutable.Set[Int]]
    spans.sortBy { case (_, id, p) => (id, p) }.foreach { case (fp, id, p) =>
      if (!seen.add(fp)) {
        val s0 = removed.getOrElseUpdate(id,
          scala.collection.mutable.Set.empty)
        s0 ++= (p until p + 8)
      }
    }
    val got = Dedup.queries("dd32_span_removal")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5)))).toMap
    assert(got.keySet == texts.map(_._1).toSet)
    texts.foreach { case (id, text) =>
      val t = text.split(" ", -1)
      val rem = removed.getOrElse(id, scala.collection.mutable.Set.empty)
      val cleaned = t.zipWithIndex.collect {
        case (tok, i) if !rem(i) => tok }.mkString(" ")
      val (nt, nr, nk, fp) = got(id)
      assert(nt == t.length, s"doc $id n_tokens")
      assert(nr == rem.size, s"doc $id n_removed $nr != ${rem.size}")
      assert(nk + nr == nt, s"doc $id conservation")
      assert(fp == md5hex(cleaned), s"doc $id cleaned fingerprint")
    }
    // the corpus has natural recurrence — the operator must CUT
    assert(got.values.exists(_._2 > 0L), "no spans removed - degenerate")
    // and keep most of the corpus (removal is surgical, not wholesale)
    val totR = got.values.map(_._2).sum
    val totT = got.values.map(_._1).sum
    assert(totR * 10 < totT, s"removed $totR of $totT tokens")
  }

  test("dd34: fixpoint iterates past pass 1 on a planted boundary " +
      "chimera; positions monotone decreasing; final census zero") {
    // Docs 3 and 4 share NO 8-gram originally (their middles differ),
    // but pass 1 cuts both middles (each recurs against its 8-token
    // donor doc) and the SPLICED texts u1..u7 v1..v7 become identical
    // — the spliced 8-grams exist only after the cut, so pass 1
    // provably leaves boundary-formed recurrence and the loop MUST
    // take a second cut (the Lee et al. fixpoint argument in vivo).
    val s8 = (1 to 8).map(i => s"s$i").mkString(" ")
    val p8 = (1 to 8).map(i => s"p$i").mkString(" ")
    val u7 = (1 to 7).map(i => s"u$i").mkString(" ")
    val v7 = (1 to 7).map(i => s"v$i").mkString(" ")
    import spark.implicits._
    val toks0 = Seq(
      1L -> s8, 2L -> p8,
      3L -> s"$u7 $s8 $v7", 4L -> s"$u7 $p8 $v7")
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val got = Dedup.exactSubstrFixpoint(spark, toks0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // round 0: 1+1+15+15 = 32 positions, the two donated middles
    // redundant; round 1: 16 positions, doc 4's 7 spliced windows all
    // redundant behind doc 3's; round 2: doc 4 fully cut, clean.
    assert(got.toSeq == Seq(
      (0L, 32L, 2L, 625L, 30L, 2L),
      (1L, 16L, 7L, 4375L, 9L, 7L),
      (2L, 9L, 0L, 0L, 9L, 0L)), got.toSeq.toString)
    // the structural contracts the operator promises on ANY corpus
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.reverse.toSeq
      && got.map(_._2).distinct.length == got.length,
      "n_positions must strictly decrease across cut rounds")
    assert(got.last._3 == 0L, "final census must be zero")
    assert(got.init.forall(_._3 > 0L),
      "non-final rounds must still be recurring")
  }

  test("png-family ASCII boundary: the fixture corpus is pure ASCII " +
      "(gate for the remaining char-replay family), and mm05 is " +
      "byte-true on a planted multibyte doc") {
    // r12: mm05/mm08/mm15/mm16's oracles moved to hex byte slices and
    // hold on ANY corpus (verified Spark-vs-DuckDB on a planted
    // multibyte corpus this round). The REMAINING mm oracles
    // (mm01/mm04/mm06/mm10/mm12…) still replay with character
    // semantics, so the ASCII gate on the fixture stays — defense in
    // depth, per the verdict.
    val nonAscii = Tables.t(spark, sf, "documents")
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii == 0L, "fixture corpus is no longer pure ASCII — " +
      "the remaining char-based mm oracles must move to hex slices " +
      "(the mm05/mm08/mm15 r12 form)")
    // planted: 32 chars of 'é' = 64 UTF-8 bytes → byte sizing gives
    // h = 4 → one 4x4 patch row (a char replay would give h = 2 →
    // none). Pin mm05's output on BOTH docs against an in-JVM byte
    // replay with the hex-domain fingerprint (md5 over the uppercase
    // hex of the 16 gathered bytes — the cross-engine fp domain, since
    // DuckDB lacks BLOB md5/substring).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mb").toFile
    dir.deleteOnExit()
    Seq((1L, "ab" * 32, "web"), (2L, "é" * 32, "web"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.queries("mm05_patch_grid")(spark, dir.toString)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(b).map("%02x".format(_)).mkString
    def hexUp(b: Seq[Byte]): String =
      b.map(x => f"${x & 0xff}%02X").mkString
    def patches(bytes: Array[Byte]): Seq[(Long, Long, String)] = {
      val h = bytes.length / 16
      for (pr <- 0 until h / 4; pc <- 0 until 4) yield {
        val p = for (ry <- 0 until 4; rx <- 0 until 4)
          yield bytes((pr * 4 + ry) * 16 + pc * 4 + rx)
        (pr.toLong, pc.toLong, md5hex(hexUp(p).getBytes("UTF-8")))
      }
    }
    // ASCII doc: byte grid, hex-domain fps
    val asciiWant = patches("ab".repeat(32).getBytes("UTF-8"))
    assert(got.filter(_._1 == 1L).map(x => (x._2, x._3, x._4)).toSeq
      == asciiWant)
    // multibyte doc: the BYTE-sized grid with C3/A9 UTF-8 bytes in the
    // gather — the case the old char-based oracle could not replay
    val byteWant = patches("é".repeat(32).getBytes("UTF-8"))
    assert(byteWant.size == 4)
    assert(got.filter(_._1 == 2L).map(x => (x._2, x._3, x._4)).toSeq
      == byteWant)
  }

  test("ss37: the frozen phase IS ss23's growth report, and the " +
      "compacted phase resets growth on the full-rewrite cost") {
    import graft.operators.Similarity
    val ss23 = Similarity.queries("ss23_ivf_maintain")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    val ss37 = Similarity.queries("ss37_compaction_report")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    val frozen = ss37.filter(_._1 == "frozen").sortBy(_._2)
    // the compact-or-wait decision must be priced off the SAME numbers
    // the maintenance report alarms on — cluster by cluster
    assert(frozen.map(x => (x._2, x._3, x._4, x._5, x._6, x._7)).toSeq
      == ss23, "ss37 frozen phase drifted from ss23's report")
    val compacted = ss37.filter(_._1 == "compacted")
    assert(compacted.nonEmpty)
    compacted.foreach { x =>
      assert(x._4 == 0L && x._6 == 0L,
        s"compacted list ${x._2}: growth must reset, got $x")
    }
    val corpusN = frozen.map(_._5).sum
    assert(frozen.head._8 == frozen.map(_._4).sum,
      "frozen rows_written must equal the delta size")
    assert(compacted.head._8 == corpusN,
      "compacted rows_written must equal the full corpus")
    assert(compacted.map(_._5).sum == corpusN,
      "compaction must conserve the corpus")
  }

  test("ss38: the purged segment physically contains ZERO tombstoned " +
      "ids, conserves the live corpus, and its results align with ss24") {
    import graft.operators.Similarity
    val rows = Similarity.queries("ss38_purge_compaction")(spark, sf)
      .collect() // executes the rebuild + bucketed write
    // GDPR reclamation is a STORAGE property: the written index table
    // must not contain a single dead id (ss24 merely filters them)
    val tbl = graft.operators.Bucketing.published(spark, "ss38",
      "graft_ivf_purged")
    assert(tbl.filter(col("vec_id") % 10 === 3).count() == 0L,
      "tombstoned vectors survived the purge rewrite")
    val liveN = Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") % 10 =!= 3).count()
    assert(tbl.count() == liveN, "purge must conserve the live corpus")
    // every live query gets a full top-3, never a dead neighbor
    val qids = rows.map(_.getLong(0)).distinct.sorted
    assert(qids.toSeq == (0L until 10L).filter(_ % 10 != 3).toSeq)
    rows.foreach { r =>
      assert(r.getLong(2) % 10 != 3, s"dead neighbor surfaced: $r")
      assert(r.getLong(4) % 10 != 3, s"ss24 leaked a dead id: $r")
    }
    assert(rows.length == qids.length * 3)
  }

  test("mm17/pp40/tx36: in-JVM replays — VLM fold, twin-token chunking, " +
      "and the drift diff all reproduce from raw text") {
    import graft.functions.Bpe
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(x => (x._2, x._1))
    def trainOn(ds: Seq[String]): Array[(String, String)] = {
      val wf = ds.flatMap(_.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) }
        .toSeq.sortBy { case (w, f) => (-f, w) }.take(4096)
      Bpe.train(wf, math.min(24, math.max(8, wf.length / 2)))
        .map { case (l, r, _) => (l, r) }.toArray
    }
    val pairs = trainOn(docs.map(_._3))
    def nsub(text: String): Long = text.split(" ", -1)
      .filter(_.nonEmpty).map(w => Bpe.encodeCount(w, pairs).toLong).sum
    // mm17: patches from the ASCII byte raster + next-fit fold per source
    def patches(text: String): Long = {
      val h = text.getBytes("UTF-8").length / 16
      if (h == 0) 0L else ((h + 7) / 8).toLong * 2L
    }
    val mmWant = docs.groupBy(_._2).map { case (srcK, xs) =>
      val costs = xs.sortBy(_._1).map(x => patches(x._3) + nsub(x._3))
      var batches = 1L; var fill = 0L; var waste = 0L
      costs.zipWithIndex.foreach { case (c, i) =>
        if (i == 0) fill = c
        else if (fill + c <= 512L) fill += c
        else { batches += 1L; waste += math.max(0L, 512L - fill); fill = c }
      }
      waste += math.max(0L, 512L - fill)
      srcK -> ((xs.length.toLong, xs.map(x => patches(x._3)).sum,
        xs.map(x => nsub(x._3)).sum, batches, waste))
    }
    val mmGot = graft.operators.Multimodal.queries("mm17_vlm_batches")(
        spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(6), r.getLong(7)))).toMap
    assert(mmGot.keySet == mmWant.keySet)
    mmWant.foreach { case (k, v) => assert(mmGot(k) == v, s"mm17 $k") }
    // pp40: both chunkings from running sums per source
    val ppWant = docs.groupBy(_._2).map { case (srcK, xs) =>
      val ws = xs.sortBy(_._1).map(_._3.split(" ", -1).length.toLong)
      val sw = xs.sortBy(_._1).map(x => nsub(x._3))
      def chunks(ts: Seq[Long]): (Long, Long) = { // (n_chunks, n_split)
        var cum = 0L; var split = 0L; var last = 0L
        ts.foreach { t =>
          val f = cum / 512L; val l = (cum + t - 1) / 512L
          if (f != l) split += 1L
          last = l; cum += t
        }
        (last + 1L, split)
      }
      srcK -> ((chunks(ws), chunks(sw)))
    }
    val ppGot = graft.operators.Pipeline.queries("pp40_concat_chunks_bpe")(
        spark, sf).collect()
      .map(r => r.getString(0) -> (((r.getLong(4), r.getLong(7)),
        (r.getLong(5), r.getLong(8))))).toMap
    assert(ppGot.keySet == ppWant.keySet)
    ppWant.foreach { case (k, v) => assert(ppGot(k) == v, s"pp40 $k") }
    // tx36: the drift diff equals diffing two in-JVM trainings
    val half = trainOn(docs.filter(_._1 % 2 == 0).map(_._3))
    val gotDrift = TextAnalysis.queries("tx36_tokenizer_drift")(spark, sf)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(3)), r.getBoolean(5)))
    assert(gotDrift.length == math.max(half.length, pairs.length))
    gotDrift.foreach { case (rank, lh, lf, agree) =>
      val i = rank.toInt - 1
      assert(lh == half.lift(i).map(_._1), s"tx36 rank $rank half")
      assert(lf == pairs.lift(i).map(_._1), s"tx36 rank $rank full")
      assert(agree == (half.lift(i).nonEmpty &&
        half.lift(i) == pairs.lift(i).map(p => (p._1, p._2))),
        s"tx36 rank $rank agree")
    }
  }
}
