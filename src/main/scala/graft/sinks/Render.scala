package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** Result sinks (SURVEY §2.3): the `{headers, data}` wire shape
  * (`/root/reference/ksql.js:137-154`), the ASCII table with `[]` on
  * empty (`ksql.js:160-170`), and JSON rendering for the HTTP API
  * (`ksql.js:299-305`). Spark gives every row a uniform schema, so the
  * reference's first-row-only header quirk disappears (documented
  * superset behavior, SURVEY §2.3 K1).
  *
  * These sinks `collect()` by design — they are terminal REPL/HTTP
  * renderers for human-sized results, not operators; large results
  * belong in `df.write` paths.
  */
object Render {

  case class Result(headers: Seq[String], data: Seq[Seq[Any]])

  /** K1: result → headers + row matrix. */
  def process(df: DataFrame): Result =
    Result(df.columns.toSeq, df.collect().toSeq.map(_.toSeq))

  /** JSON value rendering for rows — handles nested structs, maps,
    * arrays, null, numerics, booleans; everything else as a string.
    */
  def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => jsonString(s)
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double => if (d.isNaN || d.isInfinite) jsonString(d.toString)
      else d.toString
    case f: Float => jsonValue(f.toDouble)
    case d: java.math.BigDecimal => d.toPlainString
    case r: Row => r.schema match {
      case null => r.toSeq.map(jsonValue).mkString("[", ",", "]")
      case sch => sch.fieldNames.zip(r.toSeq)
        .map { case (k, x) => jsonString(k) + ":" + jsonValue(x) }
        .mkString("{", ",", "}")
    }
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => jsonString(String.valueOf(k)) + ":" + jsonValue(x) }
        .mkString("{", ",", "}")
    case a: scala.collection.Seq[_] =>
      a.map(jsonValue).mkString("[", ",", "]")
    case a: Array[_] => a.toSeq.map(jsonValue).mkString("[", ",", "]")
    case b: Array[Byte] => jsonString(java.util.Base64.getEncoder.encodeToString(b))
    case other => jsonString(other.toString)
  }

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** K3: the `{headers, data}` JSON wire shape, 2-space pretty like the
    * reference (`JSON.stringify(..., null, 2)`-compatible consumers only
    * need the field names, but we keep it readable).
    */
  def toJson(r: Result): String = {
    val headers = r.headers.map(jsonString).mkString("[", ", ", "]")
    val rows = r.data.map(row =>
      row.map(jsonValue).mkString("[", ", ", "]"))
      .mkString("[\n    ", ",\n    ", "\n  ]")
    s"""{\n  "headers": $headers,\n  "data": ${if (r.data.isEmpty) "[]" else rows}\n}"""
  }

  /** Scalar cell display (ASCII table): null → empty, like cli-table2. */
  private def cell(v: Any): String = v match {
    case null => ""
    case r: Row => jsonValue(r)
    case m: scala.collection.Map[_, _] => jsonValue(m)
    case a: scala.collection.Seq[_] => jsonValue(a)
    case x => x.toString
  }

  /** K2: ASCII table; empty result renders as `[]` (ksql.js:160-161). */
  def toAscii(r: Result): String = {
    if (r.data.isEmpty) return "[]"
    val rows = r.data.map(_.map(cell))
    val widths = r.headers.indices.map { i =>
      (r.headers(i).length +: rows.map(_(i).length)).max
    }
    def line(l: String, m: String, rt: String): String =
      widths.map("-" * (_: Int)).mkString(l + "-", "-" + m + "-", "-" + rt)
    def fmt(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    (Seq(line("+", "+", "+"), fmt(r.headers), line("+", "+", "+")) ++
      rows.map(fmt) :+ line("+", "+", "+")).mkString("\n")
  }
}
