package graft

import org.apache.spark.sql.functions._
import graft.sources.K8sSnapshot

/** DataSource V2 connector spec: same rows as the view-based loader,
  * column pruning reaches the reader, short name registered.
  */
class K8sDsv2Spec extends SparkSpec {

  private def dsv2(kind: String) =
    spark.read.format("k8s-snapshot").option("kind", kind)
      .load(s"$fixtureDir/$kind.json")

  test("pods via DSv2 match the view-based loader") {
    val v2 = dsv2("pods")
      .select("uid", "node", "metadata.name", "status.phase")
      .collect().map(_.toSeq).toSet
    val v1 = K8sSnapshot.pods(spark, s"$fixtureDir/pods.json")
      .select("uid", "node", "metadata.name", "status.phase")
      .collect().map(_.toSeq).toSet
    assert(v2 == v1)
    assert(v2.size == 4)
  }

  test("nested struct/map/array fields convert correctly") {
    val r = dsv2("pods").filter(col("uid") === "pod-uid-1")
      .select(col("metadata.annotations")("email"),
        col("spec.containers")(0)("image"),
        col("status.containerStatuses")(0)("restartCount"))
      .collect()(0)
    assert(r.getString(0) == "dba@example.com")
    assert(r.getString(1) == "mysql:5.5")
    assert(r.getInt(2) == 2)
  }

  test("nodes and services kinds load with stamped keys") {
    assert(dsv2("nodes").select("name").collect().map(_.getString(0)).sorted
      .toSeq == Seq("node-a", "node-b", "node-c"))
    assert(dsv2("services").filter(col("spec.type") === "LoadBalancer")
      .select("name").collect().map(_.getString(0)).toSeq == Seq("web"))
  }

  test("column pruning is pushed to the reader") {
    val df = dsv2("pods").select("uid")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=uid"), plan)
    assert(!plan.contains("cols=uid,node,metadata"), plan)
  }

  test("filters on stamped columns are pushed and skip conversion") {
    val df = dsv2("pods").filter(col("node") === "node-a").select("uid")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("filters=") && plan.contains("EqualTo(node,node-a)"),
      plan)
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      K8sSnapshot.pods(spark, s"$fixtureDir/pods.json")
        .filter(col("node") === "node-a")
        .collect().map(_.getString(0)).sorted.toSeq)

    // the reader itself converts only matching items — the pushdown
    // saves the JSON→row work, not just the downstream filter
    import org.apache.spark.sql.sources.EqualTo
    val schema = dsv2("pods").schema
    val reader = new graft.sources.v2.K8sPartitionReader(
      "pods", s"$fixtureDir/pods.json", schema,
      Array(EqualTo("node", "node-a")))
    var n = 0
    while (reader.next()) n += 1
    assert(reader.converted == n && n < 4 && n > 0)

    // unsupported predicates (non-stamped column) are NOT pushed
    val resid = dsv2("pods").filter(col("status.phase") === "Running")
    val rplan = resid.queryExecution.executedPlan.toString
    assert(!rplan.contains("EqualTo(status"), rplan)
  }

  test("k8s catalog: SQL addresses snapshot tables, read-only, pushdown rides along") {
    spark.conf.set("spark.sql.catalog.k8s",
      classOf[graft.sources.v2.K8sCatalog].getName)
    spark.conf.set("spark.sql.catalog.k8s.path", fixtureDir)
    val got = spark.sql(
      "SELECT uid FROM k8s.snapshot.pods WHERE node = 'node-a' ORDER BY uid")
      .collect().map(_.getString(0)).toSeq
    val want = K8sSnapshot.pods(spark, s"$fixtureDir/pods.json")
      .filter(col("node") === "node-a")
      .select("uid").collect().map(_.getString(0)).sorted.toSeq
    assert(got == want && got.nonEmpty)
    // bare-namespace alias also resolves
    assert(spark.sql("SELECT count(*) FROM k8s.pods").collect()(0).getLong(0) == 4)
    // catalog surface: SHOW exposes the three scans
    assert(spark.sql("SHOW TABLES IN k8s.snapshot")
      .collect().map(_.getString(1)).sorted.toSeq ==
      Seq("nodes", "pods", "services"))
    // stamped-key filters still reach the reader through the catalog path
    val df = spark.sql("SELECT uid FROM k8s.snapshot.pods WHERE node = 'node-a'")
    assert(df.queryExecution.executedPlan.toString
      .contains("EqualTo(node,node-a)"))
    // read-only: DDL raises
    intercept[UnsupportedOperationException](
      spark.sql("DROP TABLE k8s.snapshot.pods"))
    // unknown table is a clean analysis error
    intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT * FROM k8s.snapshot.deployments").collect())
  }

  test("_raw escape hatch carries the full item") {
    val raw = dsv2("pods").filter(col("uid") === "pod-uid-3")
      .select("_raw").collect()(0).getString(0)
    assert(raw.contains("\"sidecar-logger\""))
  }

  test("micro-batch stream: each snapshot generation arrives exactly once") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("k8s-stream").toFile
    val ckpt = Files.createTempDirectory("k8s-ckpt").toFile
    try {
      // generation 0: the fixture snapshot
      Files.copy(Paths.get(s"$fixtureDir/pods.json"),
        Paths.get(dir.getAbsolutePath, "pods-000.json"),
        StandardCopyOption.REPLACE_EXISTING)
      val stream = spark.readStream.format("k8s-snapshot")
        .option("kind", "pods").load(dir.getAbsolutePath)
        .select("uid", "node")
      val q = stream.writeStream.format("memory")
        .queryName("k8s_stream_test")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .start()
      try {
        q.processAllAvailable()
        val gen0 = spark.sql("SELECT uid FROM k8s_stream_test")
          .collect().map(_.getString(0)).sorted.toSeq
        assert(gen0.size == 4 && gen0.contains("pod-uid-1"), gen0)
        // generation 1: a refreshed snapshot with a new pod uid
        val refreshed = new String(Files.readAllBytes(
          Paths.get(s"$fixtureDir/pods.json")), "UTF-8")
          .replace("pod-uid-1", "pod-uid-1b")
        Files.write(Paths.get(dir.getAbsolutePath, "pods-001.json"),
          refreshed.getBytes("UTF-8"))
        q.processAllAvailable()
        val all = spark.sql("SELECT uid FROM k8s_stream_test")
          .collect().map(_.getString(0)).toSeq
        assert(all.size == 8, s"expected 2 generations x 4 pods: $all")
        assert(all.count(_ == "pod-uid-1") == 1)
        assert(all.count(_ == "pod-uid-1b") == 1)
      } finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(ckpt)
    }
  }

  test("micro-batch stream: unpadded generation numbers stay exactly-once") {
    // 'pods-10.json' sorts lexically BEFORE 'pods-2.json'; an index-based
    // offset would replay one generation and skip another. Gen-parsed
    // offsets must deliver each exactly once, in generation order.
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("k8s-stream-unpad").toFile
    val ckpt = Files.createTempDirectory("k8s-ckpt-unpad").toFile
    try {
      val base = new String(Files.readAllBytes(
        Paths.get(s"$fixtureDir/pods.json")), "UTF-8")
      def gen(n: Int, tag: String): Unit =
        Files.write(Paths.get(dir.getAbsolutePath, s"pods-$n.json"),
          base.replace("pod-uid-1", s"pod-uid-$tag").getBytes("UTF-8"))
      gen(2, "g2")
      val stream = spark.readStream.format("k8s-snapshot")
        .option("kind", "pods").load(dir.getAbsolutePath)
        .select("uid")
      val q = stream.writeStream.format("memory")
        .queryName("k8s_stream_unpad")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .start()
      try {
        q.processAllAvailable()
        // gen 10 arrives after gen 2 was committed at offset 2
        gen(10, "g10")
        q.processAllAvailable()
        val all = spark.sql("SELECT uid FROM k8s_stream_unpad")
          .collect().map(_.getString(0)).toSeq
        assert(all.size == 8, s"expected 2 generations x 4 pods: $all")
        assert(all.count(_ == "pod-uid-g2") == 1, all)
        assert(all.count(_ == "pod-uid-g10") == 1, all)
      } finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir); rm(ckpt)
    }
  }
}
