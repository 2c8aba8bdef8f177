package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers (no reference counterpart; pure scale tooling).
  *
  * At 100 TB the dominant cost of a fact⋈fact equi-join is shuffling both
  * sides. Writing the tables bucketed by the join key (same bucket count
  * both sides) lets Spark plan a sort-merge join with ZERO Exchange — the
  * co-location is established once at write time and reused by every
  * subsequent join/aggregation on that key. `BucketingSpec` proves the
  * Exchange disappears from the physical plan.
  *
  * SINGLE-WRITER CONTRACT (ADVICE r10): `writeBucketed` drops and
  * recursively deletes the table's warehouse directory before
  * rewriting, and the ss33/ss34/ss36 index operators write under fixed
  * global names (graft_ivf_lists, graft_pq_codes, graft_ivf_base, …).
  * Two concurrent sessions sharing a warehouse (e.g. parallel
  * REPL/HTTP `graft_op` calls, which execute at plan-build time) can
  * clobber each other mid-probe. The sequential Verify/Bench drivers
  * satisfy this by construction; a multi-tenant deployment must
  * namespace the table names per run (suffix a session/run id) or
  * serialize writers externally.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwriting). Bucketed
    * layout requires the table catalog — a path-only parquet write
    * cannot carry bucket metadata.
    */
  /** Write `df` as a plain (UNbucketed) managed table — the sidecar
    * form for 1-row stats frames. Never bucket these: a single-bucket
    * scan claims HashPartitioning(key, 1), and a UNION of such scans
    * feeding a global aggregate satisfied the planner's distribution
    * requirement per-child — the final agg ran per-partition with NO
    * exchange and returned one row PER SEGMENT (observed on tx38's
    * stats merge; plain tables plan the normal partial+final shape).
    */
  def writeTable(df: DataFrame, table: String): Unit = {
    dropWithLocation(df.sparkSession, table)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  private def dropWithLocation(spark: SparkSession, table: String)
      : Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      table.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(loc)
    }
  }

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sorted: Boolean = true): Unit = {
    val spark = df.sparkSession
    // An in-memory catalog forgets tables across sessions while their
    // warehouse directories persist — clear both so re-creation never
    // hits LOCATION_ALREADY_EXISTS.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      table.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(loc)
    }
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planner emits
    * no shuffle on either side.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }
}
