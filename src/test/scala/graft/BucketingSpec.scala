package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed co-located join: identical results to the plain join and —
  * the point — no Exchange on either side of the physical plan.
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("same-bucketed join plans with zero Exchange and identical results") {
    val orders = Tables.t(spark, sf, "orders")
    val customer = Tables.t(spark, sf, "customer")
    Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "customer_b", "c_custkey", 8)

    val joined = Bucketing.bucketedJoin(spark, "orders_b", "customer_b",
      "o_custkey", "c_custkey")
    // disable auto-broadcast so the test exercises the sort-merge path
    // (a broadcast join would also have no shuffle, trivially)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")

      val got = joined.select("o_orderkey", "c_nationkey")
        .collect().map(_.toSeq).toSet
      val want = orders.join(customer,
        col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
        .collect().map(_.toSeq).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  // ---------------- atomic versioned publication ----------------------

  private def whDir(name: String): java.io.File = new java.io.File(
    new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
    name.toLowerCase)

  /** A df whose WRITE fails at runtime (data-dependent raise_error —
    * not constant-foldable, so the crash happens mid-publish, after
    * table writes have begun and before the pointer swap). */
  private def crashingDf = spark.range(10).select(col("id"),
    when(col("id") >= 0, expr("raise_error('synthetic publish crash')"))
      .otherwise(lit("x")).as("boom"))

  test("publish: multi-part roundtrip — one generation, all parts " +
      "resolve together through the manifest") {
    val a = spark.range(100).select(col("id"), (col("id") * 3).as("v"))
    val b = spark.range(5).select(col("id").as("k"))
    // manifests persist across suite runs in the same warehouse —
    // assert the generation ADVANCE, not an absolute number
    val before = Bucketing.currentGen(spark, "t_round").getOrElse(0L)
    val names = Bucketing.publish(spark, "t_round", Seq(
      Bucketing.Part("pa", a, Some("id")), Bucketing.Part("pb", b)))
    assert(Bucketing.currentGen(spark, "t_round").contains(before + 1))
    val served = Bucketing.publishedTables(spark, "t_round")
    assert(served == names)
    assert(Bucketing.published(spark, "t_round", "pa").count() == 100L)
    assert(Bucketing.published(spark, "t_round", "pb").count() == 5L)
  }

  test("publish: a crash mid-write leaves the prior generation " +
      "serving byte-true (the ss33 family as the gate), and the next " +
      "good publish recovers") {
    // the REAL vector-index family: run ss33, snapshot what it serves
    SparkEntry.queries("ss33_persisted_index")(spark, sf).collect()
    val gen0 = Bucketing.servingGen(spark, "ss33")
    val snap = Bucketing.publishedTables(spark, "ss33").map {
      case (p, t) => p -> spark.table(t).collect().map(_.toSeq).toSet
    }
    // kill a republish mid-write: the crash fires while writing part
    // tables, BEFORE the pointer swap
    intercept[Exception] {
      Bucketing.publish(spark, "ss33", Seq(
        Bucketing.Part("graft_ivf_lists", crashingDf, Some("id"))))
    }
    assert(Bucketing.servingGen(spark, "ss33") == gen0,
      "crashed publish moved the pointer")
    val after = Bucketing.publishedTables(spark, "ss33").map {
      case (p, t) => p -> spark.table(t).collect().map(_.toSeq).toSet
    }
    assert(after == snap,
      "prior generation no longer serves its exact bytes after a crash")
    // recovery: the next successful publish of the family serves anew
    // (the orphaned generation's directories are simply overwritten)
    SparkEntry.queries("ss33_persisted_index")(spark, sf).collect()
    assert(Bucketing.servingGen(spark, "ss33") == gen0 + 1)
  }

  test("publish: append carries base forward un-rewritten, a full " +
      "publish flips the set, and GC honors the grace window") {
    val seg = (n: Int) => spark.range(n).select(col("id"))
    val g1 = Bucketing.publish(spark, "t_lsm", Seq(
      Bucketing.Part("base", seg(50), Some("id"))))
    val baseDir = whDir(g1("base"))
    val baseMod = baseDir.lastModified()
    // APPEND: delta joins the manifest; base's physical table is the
    // SAME table, untouched
    val g2 = Bucketing.publish(spark, "t_lsm", Seq(
      Bucketing.Part("delta", seg(7), Some("id"))), carryForward = true)
    assert(g2("base") == g1("base"), "append rewrote the base name")
    assert(baseDir.lastModified() == baseMod, "append touched base bytes")
    assert(Bucketing.publishedTables(spark, "t_lsm").keySet ==
      Set("base", "delta"))
    // FULL publish (compaction): the manifest flips to the new set;
    // the old segments survive ONE generation (in-flight readers)...
    val g3 = Bucketing.publish(spark, "t_lsm", Seq(
      Bucketing.Part("compact", seg(57), Some("id"))))
    assert(Bucketing.publishedTables(spark, "t_lsm").keySet ==
      Set("compact"))
    assert(baseDir.exists(), "grace window violated: previous " +
      "generation's base dropped at the flip")
    // ...and die when their generation leaves the grace window
    Bucketing.publish(spark, "t_lsm", Seq(
      Bucketing.Part("compact", seg(57), Some("id"))))
    assert(!baseDir.exists(), "generation-1 base survived past grace")
    assert(!whDir(g2("delta")).exists(),
      "generation-2 delta survived past grace")
    assert(whDir(g3("compact")).exists(),
      "grace window must keep the PREVIOUS generation's tables")
  }

  test("restore: a cold catalog re-serves a published family from the " +
      "manifest alone — same bytes AND the bucket layout survives " +
      "(zero-Exchange self-join after restore)") {
    val df = spark.range(500).select(col("id"),
      pmod(xxhash64(col("id")), lit(37L)).as("k"))
    val names = Bucketing.publish(spark, "t_cold", Seq(
      Bucketing.Part("p", df, Some("id"), buckets = 4)))
    val want = Bucketing.published(spark, "t_cold", "p")
      .collect().map(_.toSeq).toSet
    // catalog-only amnesia: generation tables are EXTERNAL, so DROP
    // forgets the metadata but keeps every byte (the fresh-JVM shape,
    // simulated in-process)
    spark.sql(s"DROP TABLE ${names("p")}")
    assert(!spark.catalog.tableExists(names("p")))
    assert(whDir(names("p")).isDirectory, "DROP purged external bytes")
    val restored = Bucketing.restore(spark, "t_cold")
    assert(restored == names)
    assert(Bucketing.published(spark, "t_cold", "p")
      .collect().map(_.toSeq).toSet == want)
    // the restored table still carries the bucket spec: a same-key
    // self-join must plan with ZERO Exchange (the whole point of
    // recording the layout in the manifest)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = spark.table(restored("p"))
      val joined = t.join(t.withColumnRenamed("k", "k2"), Seq("id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"restored table lost its bucket layout:\n$plan")
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("publish: namespaced sessions are fully disjoint — own " +
      "manifests, own physical tables, no cross-talk") {
    val s1 = spark.newSession(); val s2 = spark.newSession()
    s1.conf.set("spark.graft.indexNamespace", "_nsa")
    s2.conf.set("spark.graft.indexNamespace", "_nsb")
    val n1 = Bucketing.publish(s1, "t_ns", Seq(Bucketing.Part("p",
      s1.range(11).select(col("id")), Some("id"))))
    val n2 = Bucketing.publish(s2, "t_ns", Seq(Bucketing.Part("p",
      s2.range(22).select(col("id")), Some("id"))))
    assert(n1("p") != n2("p"), "namespaces share a physical table")
    assert(Bucketing.published(s1, "t_ns", "p").count() == 11L)
    assert(Bucketing.published(s2, "t_ns", "p").count() == 22L)
    // the un-namespaced view of the family is untouched
    assert(Bucketing.currentGen(spark, "t_ns").isEmpty)
  }
}
