package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed co-located join: identical results to the plain join and —
  * the point — no Exchange on either side of the physical plan.
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("same-bucketed join plans with zero Exchange and identical results") {
    val orders = Tables.t(spark, sf, "orders")
    val customer = Tables.t(spark, sf, "customer")
    Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "customer_b", "c_custkey", 8)

    val joined = Bucketing.bucketedJoin(spark, "orders_b", "customer_b",
      "o_custkey", "c_custkey")
    // disable auto-broadcast so the test exercises the sort-merge path
    // (a broadcast join would also have no shuffle, trivially)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")

      val got = joined.select("o_orderkey", "c_nationkey")
        .collect().map(_.toSeq).toSet
      val want = orders.join(customer,
        col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_nationkey")
        .collect().map(_.toSeq).toSet
      assert(got == want)
      assert(got.nonEmpty)
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
