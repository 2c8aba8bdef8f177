package graft

import org.apache.spark.sql.Row
import graft.dialect.KsqlDialect
import graft.sources.K8sSnapshot

/** Golden parity tests (SURVEY §5 items 1-2): the four README queries
  * verbatim (`/root/reference/README.md:20-35`) over the fixture
  * snapshot, plus loader-stamping and flatten (T1) semantics.
  */
class K8sParitySpec extends SparkSpec {

  lazy val tables = K8sSnapshot.load(spark, fixtureDir)

  test("loader stamps uid/node on pods (ksql.js:200-201)") {
    val rows = tables("pods").select("uid", "node")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(
      ("pod-uid-1", "node-a"), ("pod-uid-2", "node-b"),
      ("pod-uid-3", "node-a"), ("pod-uid-4", "node-c")))
  }

  test("loader stamps uid/name on nodes and services (ksql.js:230-234)") {
    assert(tables("nodes").select("name").collect().map(_.getString(0)).sorted
      .toSeq == Seq("node-a", "node-b", "node-c"))
    assert(tables("services").select("name").collect().map(_.getString(0))
      .sorted.toSeq == Seq("mysql", "web"))
  }

  test("flatten T1: index-zip, missing restartCount → null, Pending pod kept") {
    val rows = tables("containers").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) null else Int.box(r.getInt(2)))).toSet
    assert(rows == Set(
      ("mysql:5.5", "pod-uid-1", Int.box(2)),
      ("mysql:5.7", "pod-uid-2", Int.box(0)),
      ("nginx:1.9", "pod-uid-3", Int.box(1)),
      // sidecar has a status entry with no restartCount → null (ksql.js:211)
      ("busybox:1.24", "pod-uid-3", null),
      // Pending pod: reference crashes (ksql.js:205); we emit null —
      // documented divergence (SURVEY §2.2)
      ("mysql-tools:1.0", "pod-uid-4", null)))
  }

  test("flatten invariant: container count = sum of spec.containers sizes") {
    import org.apache.spark.sql.functions._
    val expected = tables("pods")
      .agg(sum(size(col("spec.containers")))).collect()(0).getLong(0)
    assert(tables("containers").count() == expected)
  }

  test("README query 1: COUNT + LIKE") {
    val df = KsqlDialect.sql(spark,
      "select count(*) from containers where containers.image like 'mysql%'")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("README query 2: GROUP BY image") {
    val df = KsqlDialect.sql(spark,
      "select count(*),image from containers where containers.image like 'mysql%' group by image")
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "mysql:5.5"), (1L, "mysql:5.7"),
      (1L, "mysql-tools:1.0")))
  }

  test("README query 3: JOIN USING + chained arrow") {
    val df = KsqlDialect.sql(spark,
      "select pods.metadata->name,pods.metadata->annotations->email,image " +
        "from pods join containers using uid where image like 'mysql:5.5%'")
    assert(df.collect().toSeq ==
      Seq(Row("mysql-master-0", "dba@example.com", "mysql:5.5")))
  }

  test("README query 4: LEFT JOIN + truthiness NOT") {
    val df = KsqlDialect.sql(spark,
      "select pods.metadata->name,image from pods left join containers " +
        "using uid where image like 'mysql%' and not pods.metadata->annotations->email")
    val got = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("mysql-replica-0", "mysql:5.7"),
      ("batch-pending", "mysql-tools:1.0")))
  }

  test("unmodeled fields stay queryable via the _raw escape hatch") {
    val df = KsqlDialect.sql(spark,
      "select get_json_object(_raw, '$.metadata.labels.role') as role " +
        "from pods where uid = 'pod-uid-1'")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("master"))
  }
}
