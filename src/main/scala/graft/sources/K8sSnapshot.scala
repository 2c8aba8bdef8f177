package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Snapshot loader: K8s list responses → the four reference tables
  * (`pods`, `nodes`, `services`, derived `containers`), registered as
  * temp views — the Spark equivalent of the reference's load path
  * (`/root/reference/ksql.js:190-247,257-265`).
  *
  * Source of the snapshot is pluggable: `JsonFileSource` reads fixture
  * files shaped like K8s list responses (`{"items": [...]}`), which is the
  * zero-egress testable path; a live API loader would produce identical
  * DataFrames from `/api/v1/{pods,nodes,services}` (the kubeconfig /
  * client-auth plumbing of ksql.js:34-126 is connection code, out of the
  * SQL engine's scope — SURVEY §2.1).
  */
object K8sSnapshot {

  /** Read one K8s list file into rows of its `items` array, with the full
    * item JSON kept in `_raw` (SURVEY §1.6 escape hatch). multiLine: list
    * responses are single pretty-printed JSON docs, not JSONL.
    */
  private def readItems(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    import org.apache.spark.sql.types._
    val listSchema = StructType(Seq(
      StructField("items", ArrayType(StringType))))
    // Two-phase read: first pull each item out as raw JSON text (escape
    // hatch column), then parse the modeled subset with the explicit
    // schema. Keeps unmodeled fields queryable via get_json_object(_raw).
    spark.read.option("multiLine", "true")
      .schema(listSchema).json(path)
      .select(explode(col("items")).as("_raw"))
      .withColumn("parsed", from_json(col("_raw"), schema))
      .select(col("parsed.*"), col("_raw"))
  }

  /** Stamp T2 keys (ksql.js:200-201): pods get uid + node. */
  def pods(spark: SparkSession, path: String): DataFrame =
    readItems(spark, path, K8sSchemas.pod)
      .withColumn("uid", col("metadata.uid"))
      .withColumn("node", col("spec.nodeName"))
      .select("uid", "node", "metadata", "spec", "status", "_raw")

  /** Stamp T2 keys (ksql.js:230-234): nodes/services get uid + name. */
  private def named(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    readItems(spark, path, schema)
      .withColumn("uid", col("metadata.uid"))
      .withColumn("name", col("metadata.name"))
      .select("name", "uid", "metadata", "spec", "status", "_raw")

  def nodes(spark: SparkSession, path: String): DataFrame =
    named(spark, path, K8sSchemas.node)

  def services(spark: SparkSession, path: String): DataFrame =
    named(spark, path, K8sSchemas.service)

  /** T1: pod → containers flatten (ksql.js:197-214). Index alignment —
    * `spec.containers[j]` pairs with `status.containerStatuses[j]` — is
    * exactly `arrays_zip` + `posexplode`. Where the status array is short
    * or absent, `restarts` is null: this matches the reference's output
    * for a missing `restartCount` (the raw value is pushed at ksql.js:211;
    * the computed default is ignored) and deliberately diverges from its
    * crash on Pending pods (throw at ksql.js:205) — documented divergence,
    * SURVEY §2.2.
    */
  def containers(podsDf: DataFrame): DataFrame =
    podsDf.select(
      col("metadata.uid").as("uid"),
      posexplode(arrays_zip(
        col("spec.containers").as("c"),
        coalesce(col("status.containerStatuses"),
          expr("array()").cast("array<struct<name:string,restartCount:int,ready:boolean>>"))
          .as("s"))))
      .filter(col("col.c").isNotNull) // pad rows beyond spec.containers
      .select(
        col("col.c.image").as("image"),
        col("uid"),
        col("col.s.restartCount").as("restarts"))

  /** Load all four tables and register temp views — the equivalent of
    * create_tables + load + .data assignment (ksql.js:249-265). Returns
    * the table map for direct DataFrame use.
    *
    * Default path goes through the DataSource V2 connector
    * (graft.sources.v2.K8sSnapshotSource) so column pruning reaches the
    * JSON→row conversion; the `from_json`-based readers above remain as
    * the independent implementation the DSv2 spec cross-checks against.
    */
  def load(spark: SparkSession, dir: String,
      useV2: Boolean = true): Map[String, DataFrame] = {
    def read(kind: String): DataFrame =
      if (useV2) spark.read.format("k8s-snapshot").option("kind", kind)
        .load(s"$dir/$kind.json")
      else kind match {
        case "pods" => pods(spark, s"$dir/pods.json")
        case "nodes" => nodes(spark, s"$dir/nodes.json")
        case "services" => services(spark, s"$dir/services.json")
      }
    val p = read("pods")
    val all = Map(
      "pods" -> p,
      "nodes" -> read("nodes"),
      "services" -> read("services"),
      "containers" -> containers(p))
    all.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    all
  }
}
