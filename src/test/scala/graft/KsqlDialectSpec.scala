package graft

import graft.dialect.KsqlDialect.rewrite

/** Unit tests for the dialect shim (SURVEY §5 item 2: `->` rewrite and
  * truthiness-NOT translation, adversarial cases included).
  */
class KsqlDialectSpec extends SparkSpec {

  test("arrow becomes dot access") {
    assert(rewrite("select pods.metadata->name from pods") ==
      "select pods.metadata.name from pods")
  }

  test("chained arrows (README.md:30)") {
    assert(rewrite("select pods.metadata->annotations->email from pods") ==
      "select pods.metadata.annotations.email from pods")
  }

  test("integer index arrow becomes bracket access") {
    assert(rewrite("select spec->containers->0 from pods") ==
      "select spec.containers[0] from pods")
  }

  test("arrow inside a string literal is untouched") {
    assert(rewrite("select 'a->b', metadata->name from pods") ==
      "select 'a->b', metadata.name from pods")
  }

  test("bare USING gets parenthesized") {
    assert(rewrite("select * from pods join containers using uid") ==
      "select * from pods join containers USING (uid)")
  }

  test("USING with existing parens untouched") {
    assert(rewrite("select * from a join b using (uid)") ==
      "select * from a join b using (uid)")
  }

  test("truthiness NOT on a path (README.md:34)") {
    assert(rewrite("where not pods.metadata->annotations->email") ==
      "where (coalesce(cast(pods.metadata.annotations.email as string), '') = '')")
  }

  test("NOT IN / NOT LIKE / NOT EXISTS / IS NOT NULL are untouched") {
    for (q <- Seq(
      "where x not in (1,2)",
      "where x is not null",
      "where not exists (select 1)",
      "where x not like 'a%'",
      "where not x = 3",
      "where not x like 'a%'")) {
      assert(rewrite(q) == q, s"should be untouched: $q")
    }
  }

  test("keyword not inside string literal untouched") {
    val q = "select 'do not touch' from pods"
    assert(rewrite(q) == q)
  }

  test("full README.md:34 query") {
    val in = "select pods.metadata->name,image from pods left join " +
      "containers using uid where image like 'mysql%' and " +
      "not pods.metadata->annotations->email"
    val out = rewrite(in)
    assert(out.contains("pods.metadata.name"))
    assert(out.contains("USING (uid)"))
    assert(out.contains(
      "(coalesce(cast(pods.metadata.annotations.email as string), '') = '')"))
    assert(out.contains("like 'mysql%'"))
  }

  test("SELECT TOP n becomes LIMIT n") {
    assert(rewrite("select top 5 name from pods order by name") ==
      "select name from pods order by name LIMIT 5")
  }

  test("TOP with existing LIMIT untouched; 'top' as identifier untouched") {
    assert(rewrite("select top 5 x from t limit 3") ==
      "select top 5 x from t limit 3")
    assert(rewrite("select top_n, top from t") == "select top_n, top from t")
  }

  test("QUALIFY on a select alias becomes an outer WHERE") {
    val in = "SELECT x, row_number() OVER (ORDER BY x) AS rn FROM t " +
      "QUALIFY rn <= 2 ORDER BY x"
    assert(rewrite(in) ==
      "SELECT * FROM (SELECT x, row_number() OVER (ORDER BY x) AS rn " +
        "FROM t) __qualify_src WHERE (rn <= 2) ORDER BY x")
  }

  test("QUALIFY with a window call in the predicate hoists into the projection") {
    val in = "SELECT x FROM t QUALIFY row_number() OVER (ORDER BY x) = 1"
    val out = rewrite(in)
    assert(out.contains(", (row_number() OVER (ORDER BY x) = 1) AS __qualify"))
    assert(out.contains("WHERE __qualify"))
  }

  test("QUALIFY keyword inside a string literal is untouched") {
    val q = "select 'qualify me' from t"
    assert(rewrite(q) == q)
  }

  test("QUALIFY predicate with parenthesized ORDER inside window stays intact") {
    val in = "SELECT a, b FROM t QUALIFY rank() OVER (PARTITION BY a " +
      "ORDER BY b) <= 3 LIMIT 7"
    val out = rewrite(in)
    assert(out.contains("(rank() OVER (PARTITION BY a ORDER BY b) <= 3) AS __qualify"))
    assert(out.endsWith("WHERE __qualify LIMIT 7"))
  }
}
