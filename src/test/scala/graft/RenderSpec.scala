package graft

import graft.sinks.Render

/** Sink semantics (SURVEY §2.3): `[]` on empty, {headers,data} JSON
  * wire shape, null rendering.
  */
class RenderSpec extends SparkSpec {
  import spark.implicits._

  test("empty result renders [] (ksql.js:160-161)") {
    val df = Seq.empty[(Int, String)].toDF("a", "b")
    assert(Render.toAscii(Render.process(df)) == "[]")
  }

  test("ascii table has headers and rows") {
    val df = Seq((1, "x"), (2, null.asInstanceOf[String])).toDF("a", "b")
    val out = Render.toAscii(Render.process(df.orderBy("a")))
    assert(out.contains("| a | b |"))
    assert(out.contains("| 1 | x |"))
    assert(out.startsWith("+---+---+"))
  }

  test("json wire shape {headers, data} (ksql.js:150-153)") {
    val df = Seq((1, "x")).toDF("a", "b")
    val json = Render.toJson(Render.process(df))
    assert(json.contains("\"headers\": [\"a\", \"b\"]"))
    assert(json.contains("[1, \"x\"]"))
  }

  test("json renders nulls, nested maps and arrays") {
    val df = Seq((Map("k" -> "v"), Seq(1, 2), null.asInstanceOf[String]))
      .toDF("m", "arr", "s")
    val json = Render.toJson(Render.process(df))
    assert(json.contains("{\"k\":\"v\"}"))
    assert(json.contains("[1,2]"))
    assert(json.contains("null"))
  }
}
