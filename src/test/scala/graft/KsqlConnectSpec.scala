package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths, StandardCopyOption}
import com.sun.net.httpserver.HttpServer
import graft.server.Ksql
import graft.sources.K8sSnapshot

/** Reference connect()-order parity (S3, `ksql.js:58-94`): with no
  * source argument, `$HOME/.kube/config` is tried first; absent that the
  * user is prompted `Server URL: ` and an unauthenticated http client is
  * built from the answer. Plus the one-shot TTY refresh (`ksql.js:280`).
  */
class KsqlConnectSpec extends SparkSpec {

  private def fixtureServer(): (HttpServer, Int) = {
    val fixtures = new java.io.File(fixtureDir)
    val srv = HttpServer.create(new InetSocketAddress(0), 0)
    srv.createContext("/api/v1/", { ex =>
      val kind = ex.getRequestURI.getPath.stripPrefix("/api/v1/")
      val body = Files.readAllBytes(
        new java.io.File(fixtures, s"$kind.json").toPath)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    srv.start()
    (srv, srv.getAddress.getPort)
  }

  test("no kubeconfig → 'Server URL: ' prompt builds an http source") {
    val (srv, port) = fixtureServer()
    try {
      val emptyHome = Files.createTempDirectory("home-no-kube")
      val out = new ByteArrayOutputStream()
      val src = Ksql.resolveSource(None,
        new BufferedReader(new StringReader(s"http://localhost:$port\n")),
        new PrintStream(out), home = emptyHome.toString)
      assert(out.toString.contains("Server URL: "))
      assert(Files.exists(Paths.get(src.dir, "pods.json")))
      val tables = K8sSnapshot.load(spark, src.dir)
      assert(tables("pods").count() == 4)
    } finally srv.stop(0)
  }

  test("a kubeconfig under $HOME/.kube/config wins over the prompt") {
    val (srv, port) = fixtureServer()
    try {
      val home = Files.createTempDirectory("home-with-kube")
      Files.createDirectories(home.resolve(".kube"))
      Files.writeString(home.resolve(".kube/config"),
        s"""apiVersion: v1
           |kind: Config
           |current-context: c
           |contexts: [{name: c, context: {cluster: k, user: u}}]
           |clusters: [{name: k, cluster: {server: "http://localhost:$port"}}]
           |users: [{name: u, user: {}}]
           |""".stripMargin)
      val out = new ByteArrayOutputStream()
      val src = Ksql.resolveSource(None,
        new BufferedReader(new StringReader("")), new PrintStream(out),
        home = home.toString)
      assert(!out.toString.contains("Server URL: ")) // never prompted
      assert(Files.exists(Paths.get(src.dir, "nodes.json")))
    } finally srv.stop(0)
  }

  test("one-shot refresh re-registers views with the new snapshot") {
    // first load from the fixture dir; the refetch points at a MUTATED
    // copy (one pod dropped) — after refreshOnce the registered view
    // must serve the new content
    val mutated = Files.createTempDirectory("snapshot-v2")
    Seq("pods", "nodes", "services").foreach { k =>
      Files.copy(Paths.get(fixtureDir, s"$k.json"),
        mutated.resolve(s"$k.json"), StandardCopyOption.REPLACE_EXISTING)
    }
    val pods = ujsonFree(Files.readString(mutated.resolve("pods.json")))
    Files.writeString(mutated.resolve("pods.json"), pods)

    K8sSnapshot.load(spark, fixtureDir)
    val before = spark.table("pods").count()
    assert(before == 4)
    Ksql.refreshOnce(spark,
      Ksql.Source(fixtureDir, () => mutated.toString))
    assert(spark.table("pods").count() == 3) // the dropped pod is gone
    // and the refresh is repeatable (idempotent re-registration)
    Ksql.refreshOnce(spark,
      Ksql.Source(mutated.toString, () => fixtureDir))
    assert(spark.table("pods").count() == 4)
  }

  /** Drop the first item from a K8s list JSON without a JSON library:
    * items is an array of objects — cut from the first `{` after
    * `"items"` to its balanced closing brace (+ trailing comma).
    */
  private def ujsonFree(listJson: String): String = {
    val start = listJson.indexOf('{', listJson.indexOf("\"items\""))
    var depth = 0; var i = start
    while ({ // walk to the balanced close of the first item object
      val c = listJson.charAt(i)
      if (c == '{') depth += 1 else if (c == '}') depth -= 1
      i += 1
      depth > 0
    }) ()
    val after = if (listJson.charAt(i) == ',') i + 1 else i
    listJson.substring(0, start) + listJson.substring(after)
  }
}
