package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-format sources/sinks (SURVEY §2.6: the reference has none — only
  * the K8s API source and stdout/HTTP sinks; this engine adds the
  * standard columnar/row formats through Spark's readers/writers).
  *
  * Format guidance at 100 TB: parquet (columnar, predicate pushdown,
  * page-level stats) for analytics storage; ORC as the columnar
  * alternative; JSON/CSV only as ingest/egress edges — they are
  * row-oriented, schema-on-read, and 5-20× larger on disk. `write`
  * partitions output by the given columns so downstream scans prune
  * whole directories.
  */
object Formats {

  val supported: Set[String] = Set("parquet", "orc", "json", "csv")

  def write(df: DataFrame, format: String, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    require(supported.contains(format), s"unsupported format: $format")
    val w = df.write.mode("overwrite").format(format)
      .option("header", "true") // csv only; ignored elsewhere
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .save(path)
  }

  /** Read with an explicit schema — schema inference on JSON/CSV costs a
    * full extra pass over the data (prohibitive at scale) and guesses
    * types; production reads always pin the schema.
    */
  def read(spark: SparkSession, format: String, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    require(supported.contains(format), s"unsupported format: $format")
    val r = spark.read.format(format).option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).load(path)
  }
}
