ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ksqlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
run / connectInput := true // REPL (graft.server.Ksql) reads stdin
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---- parallel forked test groups (r14) -------------------------------
// The suite grew to ~37 min run serially in one JVM — past the driver's
// test-step budget (VERIFY_r13 tests_ok:false with a clean tail). Suites
// are independent (shared lazy local[4] session per JVM, per-test temp
// dirs), so LPT-pack them into 5 forked JVMs by measured duration and
// run the groups concurrently: wall-clock ≈ the largest suite (~8 min)
// instead of the sum. Each group gets its OWN spark.sql.warehouse.dir so
// publish-family suites in different JVMs never race on a table path.
// Weights = measured seconds from a serial run (r14); unknown suites
// default small. This changes WHERE tests run, never what they assert.
val testWeights: Map[String, Int] = Map(
  "LocalClusterParitySpec" -> 480, "PlanAuditSpec" -> 425,
  "ContractSpec" -> 320, "StreamingSpec" -> 230, "DedupSpec" -> 226,
  "OperatorInvariantSpec" -> 120, "GraphSpec" -> 104,
  "ScalingProbeSpec" -> 77, "SimilaritySpec" -> 50,
  "BucketingSpec" -> 33, "RanksSpec" -> 24, "FormatsSpec" -> 23)

Test / testGrouping := {
  val tests = (Test / definedTests).value
  val fo = (Test / forkOptions).value
  val base = baseDirectory.value
  def w(name: String): Int =
    testWeights.getOrElse(name.split('.').last, 10)
  val n = 5
  val bins =
    Array.fill(n)(scala.collection.mutable.Buffer.empty[TestDefinition])
  val load = Array.fill(n)(0)
  tests.sortBy(t => -w(t.name)).foreach { t =>
    val i = load.indexOf(load.min)
    bins(i) += t
    load(i) += w(t.name)
  }
  bins.toSeq.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
    val wh = new java.io.File(base, s"target/test-wh-$i").getAbsolutePath
    Tests.Group(s"g$i", ts.toVector, Tests.SubProcess(
      fo.withRunJVMOptions(fo.runJVMOptions ++
        Vector(s"-Dspark.sql.warehouse.dir=file:$wh"))))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 5),
  Tags.limitAll(16),
)
