package graft.dialect

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ksql dialect shim (SURVEY §1.4, §2.4 Q6/Q9): a tiny, token-aware
  * pre-parse rewrite from AlaSQL-isms to Spark SQL, after which the entire
  * dialect is Spark SQL (the reference delegates all SQL to AlaSQL at
  * `/root/reference/ksql.js:159,298`; we delegate to Catalyst).
  *
  * Rewrites:
  *   1. `a->b` nested access (README.md:30,34) → `a.b`; Catalyst's
  *      ExtractValue resolves `.` against both structs (GetStructField)
  *      and maps (GetMapValue), so one rewrite covers
  *      `metadata->name` and `metadata->annotations->email`.
  *      `a->0` integer index → `a[0]`.
  *   2. `NOT <path>` bare-truthiness predicate (README.md:34) →
  *      `(coalesce(cast(<path> as string), '') = '')` — the decided
  *      translation of JS falsiness (SURVEY §7.4 risk 1). `NOT IN/LIKE/
  *      BETWEEN/EXISTS` and `IS NOT NULL` are left untouched.
  *
  * Both rewrites operate on a masked string where quoted literals
  * ('...', "...", `...`) are replaced by placeholders, so arrows or
  * keywords inside strings are never touched (adversarial cases in
  * KsqlDialectSpec).
  */
object KsqlDialect {

  /** Placeholder sentinel for masked literals; \u0001 cannot appear
    * in legal SQL text.
    */
  private def ph(i: Int): String = "\u0001" + i + "\u0001"

  /** Mask quoted regions; returns (masked, literals). */
  private def mask(sql: String): (String, Vector[String]) = {
    val out = new StringBuilder
    val lits = Vector.newBuilder[String]
    var i = 0
    var n = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        val start = i
        i += 1
        var closed = false
        while (i < sql.length && !closed) {
          if (sql.charAt(i) == c) {
            // '' escape inside single quotes
            if (c == '\'' && i + 1 < sql.length && sql.charAt(i + 1) == '\'')
              i += 2
            else { closed = true; i += 1 }
          } else i += 1
        }
        lits += sql.substring(start, i)
        out.append(ph(n))
        n += 1
      } else { out.append(c); i += 1 }
    }
    (out.toString, lits.result())
  }

  private def unmask(masked: String, lits: Vector[String]): String = {
    var s = masked
    lits.zipWithIndex.foreach { case (lit, i) =>
      s = s.replace(ph(i), lit)
    }
    s
  }

  // keywords that must NOT be treated as a truthiness path head
  private val NotKeywords = Set("in", "like", "between", "exists", "null",
    "true", "false", "not", "rlike", "ilike", "regexp")

  private val ArrowIdx = "->\\s*(\\d+)".r
  private val Arrow = "\\s*->\\s*".r
  private val UsingBare =
    "(?i)\\busing\\s+(?!\\()([A-Za-z_]\\w*(?:\\s*,\\s*[A-Za-z_]\\w*)*)".r
  // `SELECT TOP n cols...` (AlaSQL/T-SQL form, SURVEY §2.5) — captured
  // per SELECT keyword; rewritten to a trailing LIMIT on that statement.
  private val SelectTop = "(?i)\\bselect\\s+top\\s+(\\d+)\\s".r

  def rewrite(query: String): String = {
    val (masked0, lits) = mask(query)
    // 1. arrow access
    var m = ArrowIdx.replaceAllIn(masked0, g => s"[${g.group(1)}]")
    m = Arrow.replaceAllIn(m, ".")
    // 2. bare `USING uid` (AlaSQL form, README.md:30) → `USING (uid)`
    //    (Spark's parser requires the parenthesized column list)
    m = UsingBare.replaceAllIn(m, g => s"USING (${g.group(1)})")
    // 3. SELECT TOP n → SELECT ... LIMIT n (simple statements: one TOP,
    //    no pre-existing LIMIT)
    SelectTop.findFirstMatchIn(m).foreach { mt =>
      if (!m.toLowerCase.contains(" limit ")) {
        m = m.substring(0, mt.start) + "select " +
          m.substring(mt.end) + s" LIMIT ${mt.group(1)}"
      }
    }
    // 4. truthiness NOT — scan token-wise
    m = rewriteTruthinessNot(m)
    unmask(m, lits)
  }

  /** Replace `not <ident-path>` with the falsiness test unless the path
    * head is a SQL keyword (NOT IN/LIKE/...), the previous word is `is`
    * (IS NOT NULL), or the path is followed by a comparison/call.
    */
  private def rewriteTruthinessNot(s: String): String = {
    val pat = ("(?i)\\bnot\\s+([A-Za-z_][\\w]*(?:\\.[A-Za-z_][\\w]*)*" +
      "(?:\\[\\d+\\])?)").r
    val sb = new StringBuilder
    var last = 0
    for (mt <- pat.findAllMatchIn(s)) {
      val path = mt.group(1)
      val head = path.split("[.\\[]")(0).toLowerCase
      val before = s.substring(0, mt.start).reverse.dropWhile(_.isWhitespace)
      val prevWord = before.takeWhile(ch => ch.isLetterOrDigit || ch == '_')
        .reverse.toLowerCase
      val after = s.substring(mt.end).dropWhile(_.isWhitespace)
      val followedByOp = after.headOption.exists("=<>!([".contains(_)) ||
        NotKeywords.exists(k => after.toLowerCase.startsWith(k + " ") ||
          after.toLowerCase == k)
      if (NotKeywords.contains(head) || prevWord == "is" || followedByOp) {
        sb.append(s.substring(last, mt.end))
      } else {
        sb.append(s.substring(last, mt.start))
        sb.append(s"(coalesce(cast($path as string), '') = '')")
      }
      last = mt.end
    }
    sb.append(s.substring(last))
    sb.toString
  }

  /** The single execution entry point — rewrite, then Catalyst does the
    * rest (parse → analyze → optimize → execute).
    */
  def sql(spark: SparkSession, query: String): DataFrame =
    spark.sql(rewrite(query))
}
