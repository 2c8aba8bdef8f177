package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal-column plumbing (builder mandate; no reference counterpart).
  *
  * Images/audio/video are opaque `binary` columns plus a typed metadata
  * struct. The actual media decode is STUBBED — this container has no
  * image/audio codecs — with a deterministic fake (hash-derived features),
  * clearly marked below. Everything Spark-side is real: schema, batch
  * shape, partitioning, frame sampling, and feature extraction all run as
  * codegen'd expressions over binary, exactly as a real decoder UDF would
  * slot in.
  *
  * Scale notes: binary payloads ride in the row; at 100 TB the pattern is
  * unchanged — per-row decode is shuffle-free, and frame explosion
  * multiplies rows BEFORE any aggregation, so downstream ops see a
  * well-partitioned frame table without repartitioning.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Synthetic media ingest: the documents' UTF-8 bytes stand in for an
    * encoded media payload (deterministic, no codec needed).
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col("text")).cast("bigint").as("nbytes"),
        col("source").as("origin")).as(("meta")))

  /** mm01: ingest + metadata projection + STUB feature extraction.
    * REAL: binary column, metadata struct, byte-length accounting.
    * STUB: `feature_fp` — a real pipeline calls an image/audio decoder
    * here; we substitute md5(content) as the deterministic fake (md5
    * rather than xxhash64 so the DuckDB oracle can replay the whole
    * query over the same payload bytes).
    */
  private val mm01IngestMeta: Q = (s, d) =>
    mediaTable(s, d).select(
      col("media_id"),
      col("meta.mime").as("mime"),
      col("meta.nbytes").as("nbytes"),
      md5(col("content")).as("feature_fp") // STUB decode (see scaladoc)
    ).orderBy("media_id")

  /** mm02: frame sampling — split the payload into fixed 32-byte "frames",
    * keep every 4th (the video-keyframe pattern); per-frame STUB feature.
    * posexplode keeps frame index; substring on binary is codegen'd.
    */
  private val mm02FrameSample: Q = (s, d) =>
    mediaTable(s, d)
      .withColumn("n_frames",
        ceil(col("meta.nbytes").cast("double") / 32.0).cast("int"))
      .select(col("media_id"), col("content"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(4)))
          .as("fi"))
      .select(
        col("media_id"), col("fi").cast("bigint").as("frame_idx"),
        octet_length(substring(col("content"), col("fi") * 32 + 1,
          lit(32))).cast("bigint").as("frame_bytes"),
        md5(substring(col("content"), col("fi") * 32 + 1,
          lit(32))).as("frame_fp") // STUB decode
      )
      .orderBy("media_id", "frame_idx")

  /** mm03: batched "decode-resize" shape — the mapInPandas/mapInArrow
    * analogue in Scala: mapPartitions over typed rows, emitting fixed-size
    * feature vectors. The decode body is the STUB (deterministic bytes →
    * fake 8-dim feature); the partition-batch shape is the real contract.
    */
  private val mm03BatchDecode: Q = (s, d) => {
    import s.implicits._
    val rows = mediaTable(s, d)
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
    rows.mapPartitions { it =>
      it.map { case (id, bytes) =>
        // STUB decode: real impl would decode media and pool pixels;
        // the fake derives 8 deterministic doubles from byte sums.
        val feat = Array.tabulate(8) { i =>
          var acc = 0L
          var j = i
          while (j < bytes.length) { acc += (bytes(j) & 0xff); j += 8 }
          acc.toDouble
        }
        (id, feat)
      }
    }.toDF("media_id", "feature")
      .select(col("media_id"),
        round(aggregate(col("feature"), lit(0.0), (a, x) => a + x), 2)
          .as("feature_sum"))
      .orderBy("media_id")
  }

  /** mm04: A/V SYNC — align each audio chunk to the latest video
    * keyframe at-or-before it per media stream: the timestamp-alignment
    * join a multimodal training pipeline runs before fusing modalities.
    * Video keyframes = mm02's every-4th 32-byte frame at 25 fps
    * (ts = frame_idx × 40 ms); audio = 24-byte chunks at chunk_idx ×
    * 30 ms. Composed on [[JoinOps.asofJoin]] (marker-union, ONE shuffle
    * keyed by media_id, no per-row lookups — the scale shape). The fused
    * feature is STUB md5(audio_fp ‖ frame_fp) where a real pipeline
    * concatenates embeddings; chunk 0 and frame 0 share ts 0, so every
    * chunk has a match and the join is total. Oracle: DuckDB native
    * ASOF JOIN over the same deterministic chunk/frame tables.
    */
  private val mm04AvSync: Q = (s, d) => {
    val media = mediaTable(s, d)
    val video = media
      .withColumn("n_frames",
        ceil(col("meta.nbytes").cast("double") / 32.0).cast("int"))
      .select(col("media_id"), col("content"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("fi"))
      .select(col("media_id"),
        (col("fi").cast("bigint") * 40).as("ts"),
        col("fi").cast("bigint").as("frame_idx"),
        md5(substring(col("content"), col("fi") * 32 + 1, lit(32)))
          .as("frame_fp")) // STUB decode (see mm01)
    val audio = media
      .withColumn("n_chunks",
        ceil(col("meta.nbytes").cast("double") / 24.0).cast("int"))
      .select(col("media_id"), col("content"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("ci"))
      .select(col("media_id"),
        (col("ci").cast("bigint") * 30).as("ts"),
        col("ci").cast("bigint").as("chunk_idx"),
        md5(substring(col("content"), col("ci") * 24 + 1, lit(24)))
          .as("audio_fp")) // STUB decode (see mm01)
    JoinOps.asofJoin(audio, video, "media_id", "ts",
        Seq("frame_idx", "frame_fp"))
      .select(col("media_id"), col("chunk_idx"), col("ts").as("ts_audio"),
        col("asof_frame_idx").as("frame_idx"),
        (col("asof_frame_idx") * 40).as("ts_video"),
        (col("ts") - col("asof_frame_idx") * 40).as("sync_lag_ms"),
        md5(concat(col("audio_fp"), col("asof_frame_fp"))).as("fused_fp"))
      .orderBy("media_id", "chunk_idx")
  }

  val queries: Map[String, Q] = Map(
    "mm01_media_ingest" -> mm01IngestMeta,
    "mm02_frame_sample" -> mm02FrameSample,
    "mm03_batch_decode" -> mm03BatchDecode,
    "mm04_av_sync" -> mm04AvSync,
    "mm05_patch_grid" -> mm05PatchGrid,
    "mm06_energy_segments" -> mm06EnergySegments,
  )

  /** mm05: ViT-style PATCH GRID — the payload viewed as a 2D byte image
    * (row width 16), cut into 4×4 patches: patch (pr, pc) gathers four
    * strided 4-byte row slices and fingerprints them. This is the
    * tokenization step of a vision transformer pipeline expressed as
    * per-row generate + codegen'd substring/concat — no shuffle, and the
    * emitted patch table is partitioned like the scan (the mm02 frame
    * rule). Ragged tail patches keep whatever bytes exist (real
    * pipelines pad; the fingerprint pins the exact gather either way).
    * STUB boundary as mm01-03: a real ViT embeds the patch; md5 is the
    * deterministic fake the oracle can replay.
    */
  private def mm05PatchGrid: Q = (s, d) =>
    mediaTable(s, d)
      // zero-byte payloads: Spark's sequence(0, -1) auto-steps BACKWARD
      // to [0, -1] while DuckDB's generate_series(0, -1) is empty — drop
      // them before the explode so equivalence is structural, not an
      // accident of the downstream patch-bytes filter (ADVICE r4)
      .filter(col("meta.nbytes") > 0)
      .withColumn("n_rows",
        ceil(col("meta.nbytes").cast("double") / 16.0).cast("int"))
      .select(col("media_id"), col("content"),
        explode(sequence(lit(0), ceil(col("n_rows").cast("double") / 4.0)
          .cast("int") - 1)).as("pr"))
      .select(col("media_id"), col("content"), col("pr"),
        explode(sequence(lit(0), lit(3))).as("pc"))
      .withColumn("patch", expr(
        """concat(substring(content, (pr * 4 + 0) * 16 + pc * 4 + 1, 4),
          |       substring(content, (pr * 4 + 1) * 16 + pc * 4 + 1, 4),
          |       substring(content, (pr * 4 + 2) * 16 + pc * 4 + 1, 4),
          |       substring(content, (pr * 4 + 3) * 16 + pc * 4 + 1, 4))"""
          .stripMargin))
      .filter(octet_length(col("patch")) > 0)
      .select(col("media_id"),
        col("pr").cast("bigint").as("patch_row"),
        col("pc").cast("bigint").as("patch_col"),
        octet_length(col("patch")).cast("bigint").as("patch_bytes"),
        md5(col("patch")).as("patch_fp")) // STUB embed (see scaladoc)
      .orderBy("media_id", "patch_row", "patch_col")

  /** mm06: ENERGY-BASED SEGMENTATION — the voice-activity-detection
    * shape: per-frame "energy" (byte sum over a 32-byte frame — the STUB
    * for a real RMS over PCM samples), threshold into active frames,
    * merge CONSECUTIVE active frames into segments via the
    * islands-and-gaps trick (frame_idx − dense run index is constant
    * within a run — the same window pattern st01 sessionization uses,
    * reapplied to media). Per-doc windows partition by media_id, so the
    * pass scales with frames per document, not corpus size.
    */
  private def mm06EnergySegments: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val frames = mediaTable(s, d)
      // same zero-byte sequence(0,-1) guard as mm05 (ADVICE r4)
      .filter(col("meta.nbytes") > 0)
      .withColumn("n_frames",
        ceil(col("meta.nbytes").cast("double") / 32.0).cast("int"))
      .select(col("media_id"), col("content"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("fi"))
      .withColumn("frame",
        substring(col("content"), col("fi") * 32 + 1, lit(32)))
      // STUB decode: byte-sum stands in for frame RMS energy (ASCII
      // payload — char ords ARE the bytes; empty split artifacts dropped)
      .withColumn("energy", expr(
        """aggregate(transform(
          |  filter(split(CAST(frame AS STRING), ''), c -> c <> ''),
          |  c -> CAST(ascii(c) AS BIGINT)), 0L, (a, x) -> a + x)""".stripMargin))
      .select(col("media_id"), col("fi").cast("bigint").as("fi"),
        col("energy"))
    val active = frames.filter(col("energy") >= 2400) // ~ASCII avg * 32 * 0.8
    val wRun = Window.partitionBy("media_id").orderBy("fi")
    active
      .withColumn("grp", col("fi") - row_number().over(wRun))
      .groupBy("media_id", "grp")
      .agg(min("fi").as("seg_start"), max("fi").as("seg_end"),
        count(lit(1)).as("n_frames"),
        sum("energy").as("seg_energy"))
      .select(col("media_id"), col("seg_start"), col("seg_end"),
        col("n_frames"), col("seg_energy"))
      .orderBy("media_id", "seg_start")
  }

  // All three queries oracle-check: the payload is the documents' ASCII
  // bytes (verified pure-ASCII in the driver corpus), so DuckDB's
  // character-level substr/md5/ord replay Spark's byte-level binary ops
  // exactly. The STUB boundary is unchanged — only the fake decoder's
  // hash function had to be portable.
  val oracleSql: Map[String, String] = Map(
    "mm06_energy_segments" ->
      """WITH f AS (SELECT doc_id AS media_id, text,
        |    unnest(generate_series(0,
        |      CAST(ceil(length(text) / 32.0) AS BIGINT) - 1)) AS fi
        |  FROM documents),
        |e AS (SELECT media_id, fi,
        |    CAST(list_sum(list_transform(
        |      string_split(substring(text, CAST(fi * 32 + 1 AS INT), 32), ''),
        |      c -> ord(c))) AS BIGINT) AS energy
        |  FROM f),
        |a AS (SELECT media_id, fi, energy,
        |    fi - row_number() OVER (PARTITION BY media_id ORDER BY fi)
        |      AS grp
        |  FROM e WHERE energy >= 2400)
        |SELECT media_id, min(fi) AS seg_start, max(fi) AS seg_end,
        |  count(*) AS n_frames, CAST(sum(energy) AS BIGINT) AS seg_energy
        |FROM a GROUP BY media_id, grp ORDER BY media_id, seg_start""".stripMargin,
    "mm05_patch_grid" ->
      """WITH g AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(ceil(length(text) / 16.0) AS BIGINT) AS n_rows
        |  FROM documents),
        |pr AS (SELECT media_id, text,
        |    unnest(generate_series(0,
        |      CAST(ceil(n_rows / 4.0) AS BIGINT) - 1)) AS pr
        |  FROM g),
        |pp AS (SELECT media_id, text, pr,
        |    unnest(generate_series(0, 3)) AS pc FROM pr),
        |p AS (SELECT media_id, pr, pc,
        |    substring(text, CAST((pr * 4 + 0) * 16 + pc * 4 + 1 AS INT), 4)
        |    || substring(text, CAST((pr * 4 + 1) * 16 + pc * 4 + 1 AS INT), 4)
        |    || substring(text, CAST((pr * 4 + 2) * 16 + pc * 4 + 1 AS INT), 4)
        |    || substring(text, CAST((pr * 4 + 3) * 16 + pc * 4 + 1 AS INT), 4)
        |      AS patch
        |  FROM pp)
        |SELECT media_id, pr AS patch_row, pc AS patch_col,
        |  CAST(length(patch) AS BIGINT) AS patch_bytes, md5(patch) AS patch_fp
        |FROM p WHERE length(patch) > 0
        |ORDER BY media_id, patch_row, patch_col""".stripMargin,
    "mm04_av_sync" ->
      """WITH video AS (
        |  SELECT doc_id AS media_id, fi * 40 AS ts,
        |    CAST(fi AS BIGINT) AS frame_idx,
        |    md5(substring(text, CAST(fi * 32 + 1 AS INT), 32)) AS frame_fp
        |  FROM (SELECT doc_id, text,
        |      unnest(generate_series(0,
        |        CAST(ceil(length(text) / 32.0) AS BIGINT) - 1, 4)) AS fi
        |    FROM documents)),
        |audio AS (
        |  SELECT doc_id AS media_id, ci * 30 AS ts,
        |    CAST(ci AS BIGINT) AS chunk_idx,
        |    md5(substring(text, CAST(ci * 24 + 1 AS INT), 24)) AS audio_fp
        |  FROM (SELECT doc_id, text,
        |      unnest(generate_series(0,
        |        CAST(ceil(length(text) / 24.0) AS BIGINT) - 1)) AS ci
        |    FROM documents))
        |SELECT a.media_id, a.chunk_idx, CAST(a.ts AS BIGINT) AS ts_audio,
        |  v.frame_idx,
        |  CAST(v.frame_idx * 40 AS BIGINT) AS ts_video,
        |  CAST(a.ts - v.frame_idx * 40 AS BIGINT) AS sync_lag_ms,
        |  md5(a.audio_fp || v.frame_fp) AS fused_fp
        |FROM audio a
        |ASOF LEFT JOIN video v
        |  ON a.media_id = v.media_id AND a.ts >= v.ts
        |ORDER BY a.media_id, a.chunk_idx""".stripMargin,
    "mm01_media_ingest" ->
      """SELECT doc_id AS media_id,
        |  'application/octet-stream' AS mime,
        |  CAST(length(text) AS BIGINT) AS nbytes,
        |  md5(text) AS feature_fp
        |FROM documents ORDER BY media_id""".stripMargin,
    "mm02_frame_sample" ->
      """WITH f AS (SELECT doc_id AS media_id, text,
        |    unnest(generate_series(0,
        |      CAST(ceil(length(text) / 32.0) AS BIGINT) - 1, 4)) AS frame_idx
        |  FROM documents)
        |SELECT media_id, frame_idx,
        |  CAST(length(substring(text, CAST(frame_idx * 32 + 1 AS INT), 32))
        |    AS BIGINT) AS frame_bytes,
        |  md5(substring(text, CAST(frame_idx * 32 + 1 AS INT), 32)) AS frame_fp
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    "mm03_batch_decode" ->
      """SELECT doc_id AS media_id,
        |  round(CAST(list_sum(list_transform(string_split(text, ''),
        |    c -> CAST(ord(c) AS BIGINT))) AS DOUBLE), 2) AS feature_sum
        |FROM documents ORDER BY media_id""".stripMargin,
  )
}
