package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Skew- and sketch-oriented operators (no reference counterpart — the
  * reference is single-process in-memory, SURVEY §4; these exist for the
  * 100 TB target where hot keys and exact-distinct blowups are the
  * classic failure modes).
  */
object Skew {
  type Q = (SparkSession, String) => DataFrame

  /** Salted equi-join for skewed fact keys: the fact side gets a random-
    * but-deterministic salt in [0, buckets); the dim side is replicated
    * once per salt value (explode of a literal range — dim×buckets rows,
    * fine for dim tables); the join key becomes (key, salt) so one hot
    * key spreads over `buckets` reducers instead of melting one.
    * Result is row-identical to the unsalted join — verified by the
    * DuckDB oracle on the query below and by SkewSpec.
    *
    * (AQE's skew-join handling covers sort-merge cases automatically;
    * explicit salting remains the tool for aggregate-under-join shapes
    * and for engines/paths AQE can't rewrite.)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, buckets: Int): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets))
        .cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
      salted(factKey) === replicated(dimKey) &&
        salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** q37: the q07 join computed through the salted path — the oracle is
    * the plain SQL join, asserting salting changes nothing but the
    * shuffle layout.
    */
  private val q37SaltedJoin: Q = (s, d) =>
    saltedJoin(t(s, d, "orders"), t(s, d, "customer"),
      "o_custkey", "c_custkey", buckets = 8)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("c_nationkey")

  /** q38: sketch aggregates — HyperLogLog++ approximate distinct and
    * approximate percentiles. At 100 TB these replace exact distinct
    * counts (whose hash tables spill) with fixed-size mergeable state.
    * Sketch internals differ across engines, so this is a rows-only
    * check; SkewSpec bounds the approximation error against exact values.
    */
  private val q38Sketches: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("p50_price"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000))
          .as("p99_price"))
      .orderBy("l_returnflag")

  val queries: Map[String, Q] = Map(
    "q37_salted_join" -> q37SaltedJoin,
    "q38_sketches" -> q38Sketches,
  )

  val oracleSql: Map[String, String] = Map(
    "q37_salted_join" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    // q38: sketch state is engine-specific → rows-only; error bounds
    // asserted in SkewSpec instead.
  )
}
