package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join must be row-identical to the plain join; sketch aggregates
  * must be within their documented error bounds of exact values.
  */
class SkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("salted join result is identical to the plain join") {
    val fact = Tables.t(spark, sf, "orders")
    val dim = Tables.t(spark, sf, "customer")
    val salted = Skew.saltedJoin(fact, dim, "o_custkey", "c_custkey", 8)
      .select("o_orderkey", "c_custkey", "c_nationkey")
      .collect().map(_.toSeq).toSet
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey", "c_nationkey")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("sketches land within error bounds of exact answers") {
    val got = Skew.queries("q38_sketches")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("parts"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r).toMap
    exact.foreach { case (flag, e) =>
      val g = got(flag)
      val relErr = math.abs(g.getLong(1).toDouble - e.getLong(1)) /
        e.getLong(1)
      assert(relErr < 0.1, s"$flag approx_count_distinct off by $relErr")
      val p50Err = math.abs(g.getDouble(3) - e.getDouble(2)) /
        e.getDouble(2)
      assert(p50Err < 0.05, s"$flag p50 off by $p50Err")
    }
  }

  test("q72 sort-based percentiles equal the buffer-based percentile()") {
    val sorted = Skew.queries("q72_percentile_sorted")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    val buffered = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      // same floor-quantizer as the query (round(_, 2) splits from it
      // at half-cent boundaries — the r13 q64/q72 rule)
      .agg(expr("floor(percentile(l_extendedprice, 0.5) * 100 + 0.5)" +
          " / 100").as("p50"),
        expr("floor(percentile(l_extendedprice, 0.99) * 100 + 0.5)" +
          " / 100").as("p99"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(sorted == buffered, s"$sorted vs $buffered")
  }

  test("q64 sketch-bounds gates are all green") {
    val rows = Skew.queries("q64_sketch_bounds")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (5 to 8).foreach { i =>
        assert(r.getBoolean(i), s"${r.getString(0)} gate $i failed")
      }
    }
  }

  test("q77 heavy-hitter gates hold and the planted hot key is found") {
    val r = SparkEntry.queries("q77_heavy_hitters")(spark, sf).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(1) >= 1L, "the planted HOT key must be true-heavy")
    (2 to 6).foreach(i => assert(row.getBoolean(i), s"gate $i failed"))
  }

  test("misra-gries guarantees hold under adversarial partitionings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.HeavyHitters.misra_gries
    // skewed stream: key i appears ~n/(i+1) times (Zipf-ish), n = 4096
    val data = (0 until 4096).map(i => s"z${Integer.numberOfTrailingZeros(i | 4096)}")
    val truth = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = data.size.toLong
    val k = 4
    for (parts <- Seq(1, 3, 7, 32)) {
      val df = data.toDF("key").repartition(parts)
      val mg = df.agg(misra_gries(col("key"), k).as("mg"))
        .select(explode(col("mg")).as("e"))
        .select(col("e.key"), col("e.est"))
        .collect().map(r2 => r2.getString(0) -> r2.getLong(1)).toMap
      assert(mg.size <= k, s"parts=$parts size")
      mg.foreach { case (key, est) =>
        assert(est <= truth(key), s"parts=$parts overestimate on $key")
        assert(truth(key) - est <= n / (k + 1),
          s"parts=$parts undercount bound on $key")
      }
      truth.filter(_._2 > n / (k + 1)).keys.foreach { key =>
        assert(mg.contains(key), s"parts=$parts missed heavy key $key")
      }
    }
  }

  test("AQE skew-join splits a planted hot partition (skew=true in the " +
      "final SMJ) and results match the non-adaptive join") {
    // salting (above) is the MANUAL skew remedy; this pins the AUTOMATIC
    // one the 100 TB mandate names: AQE detecting an oversized shuffle
    // partition at runtime and splitting it. Thresholds are lowered to
    // fixture scale in a child session (runtime AQE confs are
    // session-scoped; the shared session is untouched).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    import s2.implicits._
    // hot key 0 carries 200x the rows of every other key
    val fact = (0 until 21000).map(i =>
      (if (i < 20000) 0L else (i % 100).toLong, s"payload-$i"))
      .toDF("k", "v").repartition(8)
    val dim = (0L until 100L).map(k => (k, s"dim-$k")).toDF("k", "name")
    val joined = fact.join(dim, Seq("k"))
    // collect on the df itself: count() would execute a DIFFERENT
    // QueryExecution and leave this one's adaptive plan unfinalized
    // (the PlanAuditSpec rule)
    val n = joined.collect().length
    assert(n == 21000, s"join lost rows: $n")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("skew=true"),
      s"AQE did not flag the hot partition:\n$plan")
  }
}
