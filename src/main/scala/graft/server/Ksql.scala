package graft.server

import org.apache.spark.sql.SparkSession
import graft.dialect.KsqlDialect
import graft.sinks.Render
import graft.sources.K8sSnapshot

/** Main entry point — the Spark-native equivalent of `node ksql.js [www]`
  * (SURVEY §3): load the snapshot, register the four tables, then serve a
  * REPL on stdin and (with `www`) the HTTP API + web terminal on 8090.
  *
  * Usage: runMain graft.server.Ksql <fixtureDir> [www] [port]
  *   fixtureDir must contain pods.json / nodes.json / services.json
  *   (K8s list-response shape — see FIXTURES.md §A). A live-cluster
  *   loader would slot in at K8sSnapshot.load without touching anything
  *   downstream.
  */
object Ksql {
  def main(args: Array[String]): Unit = {
    // a directory → fixture snapshot; a kubeconfig file → live API fetch
    val dir = graft.sources.K8sApi.resolveSnapshotDir(args.headOption
      .getOrElse(sys.error("usage: Ksql <fixtureDir|kubeconfig> [www] [port]")))
    val www = args.contains("www")
    val port = args.drop(1).filter(_.forall(_.isDigit))
      .headOption.map(_.toInt).getOrElse(8090)

    val spark = graft.Tables.configure(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-ksql")
      // custom kernels (simhash64, poly_hash_mod, float_dot, ...) are
      // part of the user-facing SQL surface, REPL and HTTP alike
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4") // snapshot-sized data
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    K8sSnapshot.load(spark, dir)

    if (www) {
      val srv = new KsqlServer(spark, port)
      srv.start()
      println(s"listening on $port")
    }

    repl(spark)
  }

  /** REPL loop (ksql.js:156-188): print ASCII table, `[]` on empty,
    * errors to stdout, prompt `> `, history capped at 100 lines in
    * /tmp/graft-ksql-history (ksql.js:269-272 parity).
    */
  def repl(spark: SparkSession): Unit = {
    val histFile = java.nio.file.Paths.get("/tmp/graft-ksql-history")
    var history: List[String] =
      if (java.nio.file.Files.exists(histFile))
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(histFile)).asScala.toList
      else Nil
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(System.in))
    print("> "); Console.flush()
    var line = in.readLine()
    while (line != null) {
      handleLine(spark, line)
      if (line.trim.nonEmpty) {
        history = (history :+ line).takeRight(100)
        try java.nio.file.Files.write(histFile,
          scala.jdk.CollectionConverters.SeqHasAsJava(history).asJava)
        catch { case _: java.io.IOException => () }
      }
      print("> "); Console.flush()
      line = in.readLine()
    }
    println("shutting down.")
  }

  def handleLine(spark: SparkSession, line: String): Unit =
    if (line != null && line.trim.nonEmpty) {
      try println(Render.toAscii(Render.process(KsqlDialect.sql(spark, line))))
      catch { case e: Exception => println(e) }
    }
}
