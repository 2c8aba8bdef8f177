package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Formats

/** Format round-trips preserve rows; partitioned writes prune at the
  * directory level.
  */
class FormatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("parquet/orc/json/csv round-trip preserves the nation table") {
    val nation = Tables.t(spark, sf, "nation")
    val want = nation.collect().map(_.toSeq).toSet
    val dir = Files.createTempDirectory("formats").toString
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      Formats.write(nation, fmt, s"$dir/$fmt")
      val back = Formats.read(spark, fmt, s"$dir/$fmt",
        Some(nation.schema))
      assert(back.collect().map(_.toSeq).toSet == want, fmt)
    }
  }

  test("partitioned write prunes directories for a partition filter") {
    val dir = Files.createTempDirectory("formats-part").toString
    Formats.write(Tables.t(spark, sf, "customer"), "parquet",
      s"$dir/cust", partitionBy = Seq("c_mktsegment"))
    val df = Formats.read(spark, "parquet", s"$dir/cust")
      .filter(col("c_mktsegment") === "BUILDING")
    val got = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the segment predicate became a partition filter (directory pruning),
    // not a data filter — nothing but the BUILDING directory is scanned
    assert(plan.contains("PartitionFilters: [isnotnull(c_mktsegment"), plan)
    assert(plan.contains("(c_mktsegment") && plan.contains("= BUILDING)"), plan)
    val want = Tables.t(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING").count()
    assert(got.length.toLong == want && want > 0)
  }
}
