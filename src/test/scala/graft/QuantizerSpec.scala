package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Pins the two properties that make the shared coarse quantizer
  * (Similarity.coarseSeeds / coarseCentroids) honest at scale:
  *
  *  1. k is a REAL knob — doubling it (with seedStep scaled to keep the
  *     sample corpus-spanning) shrinks inverted lists proportionally.
  *     This is what bounds every within-list stage (ss20's adjacency,
  *     dd12/dd24's pair stage) under the k ∝ n rule.
  *  2. The Lloyd training path actually trains — 2 rounds strictly
  *     raise the total assignment cosine over the raw seed sample
  *     (the ss15 trained-beats-untrained discipline, applied to the
  *     coarse quantizer).
  */
class QuantizerSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Inverted-list sizes (cid -> members) under a (k, seedStep) config. */
  private def listSizes(k: Int, step: Long): Map[Long, Long] = {
    import org.apache.spark.sql.expressions.Window
    def dd(a: String, b: String) =
      graft.functions.GraftFunctions.double_dot(col(a), col(b))
    val corpus = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.coarseCentroids(corpus, k = k, seedStep = step)
    val base = corpus.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .withColumn("nrm", sqrt(dd("e", "e")))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("ccos").desc, col("cid"))
    base.crossJoin(broadcast(cents))
      .withColumn("ccos", dd("e", "c_emb") / (col("nrm") * col("c_norm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy("cid").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("doubling k (seedStep scaled) shrinks inverted lists proportionally") {
    val s16 = listSizes(16, 31L)
    val s32 = listSizes(32, 13L)
    val n = s16.values.sum
    assert(s32.values.sum == n) // every corpus vector assigned, both configs
    // no empty cells: each seed is a corpus vector that assigns to itself
    assert(s16.size == 16, s"cells@16 = ${s16.size}")
    assert(s32.size == 32, s"cells@32 = ${s32.size}")
    val mean16 = n.toDouble / s16.size
    val mean32 = n.toDouble / s32.size
    assert(mean32 <= 0.6 * mean16, s"mean list $mean32 vs $mean16")
    assert(s32.values.max <= s16.values.max,
      s"max list grew: ${s32.values.max} > ${s16.values.max}")
  }

  test("2 Lloyd rounds strictly raise total assignment cosine (ss28)") {
    val r = Similarity.coarseTrainAudit(spark, sf)
      .agg(sum("cos_seed_x1e6").as("s"), sum("cos_trained_x1e6").as("t"))
      .collect()(0)
    assert(r.getLong(1) > r.getLong(0),
      s"trained ${r.getLong(1)} !> seed ${r.getLong(0)}")
  }

  test("centroid-eval confusion partitions the held-out set (ss30)") {
    val rows = Similarity.centroidEval(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // every held-out vector classified exactly once
    val heldOut = graft.Tables.t(spark, sf, "embeddings")
      .filter(org.apache.spark.sql.functions.expr("vec_id % 5 = 0"))
      .count()
    assert(rows.map(_._3).sum == heldOut)
    // predictions only ever name trained labels
    val labels = rows.map(_._1).toSet
    assert(rows.map(_._2).toSet.subsetOf(labels))
    assert(rows.forall(_._3 >= 1L))
  }

  test("derived-k path: k = floor(sqrt(n)), every vector assigned (ss31)") {
    val r = Similarity.derivedKIvf(spark, sf).collect()(0)
    val n = r.getAs[Long]("n_vecs")
    val k = r.getAs[Long]("k_derived")
    val nCells = r.getAs[Long]("n_cells")
    val sumSq = r.getAs[Long]("sum_sq_lists")
    val maxList = r.getAs[Long]("max_list")
    // the sizing rule itself
    assert(k * k <= n && n < (k + 1) * (k + 1), s"k=$k n=$n")
    assert(r.getAs[Long]("seed_step") == math.max(1L, n / k))
    // the census is a partition of the corpus
    assert(nCells >= 1 && nCells <= k, s"n_cells=$nCells k=$k")
    assert(maxList >= (n + nCells - 1) / nCells) // max >= ceil(mean)
    // Cauchy–Schwarz floor on the quadratic-stage bound
    assert(sumSq * nCells >= n * n, s"sumSq=$sumSq nCells=$nCells n=$n")
    // the retrieval point is live, not degenerate
    assert(r.getAs[Long]("n_queries") == 50L)
    assert(r.getAs[Long]("n_hit5") > 0L)
    assert(r.getAs[Long]("n_candidates") >= r.getAs[Long]("n_hit5"))
  }

  test("training buys end-to-end 5-NN recall at equal probe budget (ss29)") {
    val rows = Similarity.trainedBenefit(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val (qS, candS, hitS) = rows("seed")
    val (qT, candT, hitT) = rows("trained")
    assert(qS == 50L && qT == 50L)
    // same nprobe=1 discipline => budgets within 25% of each other
    assert(candT * 100 < candS * 125 && candS * 100 < candT * 125,
      s"budgets diverged: $candS vs $candT")
    // the payoff: strictly more true 5-NN mass captured after training
    assert(hitT > hitS, s"trained $hitT !> seed $hitS")
    assert(hitS > 0L, "seed variant captured nothing — degenerate corpus")
  }
}
