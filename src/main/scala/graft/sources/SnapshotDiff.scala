package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot DIFF — the operational query the reference's one-shot refresh
  * (`/root/reference/ksql.js:280`) begs for: what changed between two
  * loads of the same table. Works on any loaded K8s table (they all
  * carry the `_raw` escape-hatch column holding the full item JSON).
  *
  * Scale shape: both sides reduce to (key, md5 fingerprint) before the
  * full-outer join — the exchange carries 16-byte digests, never the
  * object payloads, so diffing a 10⁸-row fleet snapshot is one light
  * shuffle.
  */
object SnapshotDiff {

  /** Per-key change classification between two snapshots of one table:
    * `added` | `removed` | `changed` | `unchanged`.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
      key: String = "uid"): DataFrame = {
    val o = oldDf.select(col(key).as(key), md5(col("_raw")).as("old_fp"))
    val n = newDf.select(col(key).as(key), md5(col("_raw")).as("new_fp"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("change",
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed")
          .otherwise("unchanged"))
      .select(col(key), col("change"))
  }

  /** Summary counts by change kind (the one-glance refresh report). */
  def summary(oldDf: DataFrame, newDf: DataFrame,
      key: String = "uid"): DataFrame =
    diff(oldDf, newDf, key)
      .groupBy("change").agg(count(lit(1)).as("n"))
      .orderBy("change")
}
