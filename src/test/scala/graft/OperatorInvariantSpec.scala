package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextAnalysis}

/** In-JVM invariants for the rows-only multimodal/text operators. */
class OperatorInvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

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
}
