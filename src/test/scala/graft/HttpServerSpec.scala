package graft

import java.net.{HttpURLConnection, URI}
import scala.io.Source
import graft.server.KsqlServer
import graft.sources.K8sSnapshot

/** HTTP contract tests (SURVEY §5 item 5): /api happy path, 400 on
  * missing query, 500 on bad SQL, static serving + `..` rejection
  * (`/root/reference/ksql.js:285-353` semantics).
  */
class HttpServerSpec extends SparkSpec {

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = if (stream == null) ""
      else Source.fromInputStream(stream, "UTF-8").mkString
    (code, body)
  }

  lazy val port: Int = {
    K8sSnapshot.load(spark, fixtureDir)
    // port 0 → ephemeral, avoids clashing with anything on 8090
    val srv = new KsqlServer(spark, 0)
    srv.start()
  }

  test("GET /api?query= happy path returns {headers, data}") {
    val (code, body) = get(s"http://localhost:$port/api?query=" +
      java.net.URLEncoder.encode(
        "select count(*) from containers where containers.image like 'mysql%'",
        "UTF-8"))
    assert(code == 200)
    assert(body.contains("\"headers\""))
    assert(body.contains("3"))
  }

  test("missing query → 400 (ksql.js:310-313)") {
    assert(get(s"http://localhost:$port/api")._1 == 400)
  }

  test("bad SQL → 500 with error: prefix (ksql.js:306-309)") {
    val (code, body) = get(s"http://localhost:$port/api?query=definitely+not+sql")
    assert(code == 500)
    assert(body.startsWith("error: "))
  }

  test("static index.html served with content-type") {
    val (code, body) = get(s"http://localhost:$port/")
    assert(code == 200)
    assert(body.contains("<html"))
  }

  test("path traversal rejected with 400 (ksql.js:321-325)") {
    assert(get(s"http://localhost:$port/..%2fbuild.sbt")._1 == 400)
  }

  test("unknown asset → 404 (ksql.js:341-344)") {
    assert(get(s"http://localhost:$port/nope.js")._1 == 404)
  }
}
