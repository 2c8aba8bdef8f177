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
    // 5. QUALIFY (DuckDB/Snowflake/BigQuery post-window filter)
    m = rewriteQualify(m)
    unmask(m, lits)
  }

  private val QualifyKw = "(?i)\\bqualify\\b".r

  /** QUALIFY → wrapped subquery. Spark has no QUALIFY clause; the
    * rewrite turns `SELECT ... QUALIFY <pred> [ORDER BY/LIMIT tail]`
    * into `SELECT * FROM (SELECT ...) __qualify_src WHERE <pred> tail`.
    * When the predicate contains a window call (`... OVER (...)`), it is
    * hoisted into the inner projection as a boolean `__qualify` column
    * (window expressions and lateral alias references are both legal
    * there) and the outer filter tests that column; [[sql]] drops the
    * helper. One top-level QUALIFY per statement — nested/multiple
    * QUALIFY is outside the dialect surface.
    */
  private def rewriteQualify(s: String): String =
    QualifyKw.findFirstMatchIn(s) match {
      case None => s
      case Some(mt) =>
        val head = s.substring(0, mt.start).trim
        val after = s.substring(mt.end)
        val lower = after.toLowerCase
        // predicate extends to the first depth-0 ORDER/LIMIT or the end
        var depth = 0; var cut = after.length; var i = 0
        while (i < after.length && cut == after.length) {
          val c = after.charAt(i)
          if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          else if (depth == 0 &&
            (lower.startsWith("order ", i) || lower.startsWith("limit ", i)) &&
            (i == 0 || !Character.isLetterOrDigit(after.charAt(i - 1))))
            cut = i
          i += 1
        }
        val pred = after.substring(0, cut).trim
        val tail = after.substring(cut)
        if ("(?i)\\bover\\b".r.findFirstIn(pred).isDefined) {
          // hoist the windowed predicate into the inner projection,
          // right before the main select's top-level FROM
          var d = 0; var fromAt = -1; var j = 0
          val hl = head.toLowerCase
          while (j < head.length && fromAt < 0) {
            val c = head.charAt(j)
            if (c == '(') d += 1
            else if (c == ')') d -= 1
            else if (d == 0 && hl.startsWith("from", j) &&
              (j == 0 || !Character.isLetterOrDigit(head.charAt(j - 1))) &&
              (j + 4 >= head.length || !Character.isLetterOrDigit(head.charAt(j + 4))))
              fromAt = j
            j += 1
          }
          require(fromAt > 0, "QUALIFY rewrite: no top-level FROM found")
          val inner = head.substring(0, fromAt) +
            s", ($pred) AS __qualify " + head.substring(fromAt)
          s"SELECT * FROM ($inner) __qualify_src WHERE __qualify $tail"
        } else
          s"SELECT * FROM ($head) __qualify_src WHERE ($pred) $tail"
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
  def sql(spark: SparkSession, query: String): DataFrame = {
    val df = spark.sql(rewrite(query))
    // QUALIFY hoist helper (see rewriteQualify) is internal — drop it
    if (df.columns.contains("__qualify")) df.drop("__qualify") else df
  }
}
