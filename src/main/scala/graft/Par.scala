package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Machine-width partition count for explicit spreads.
  *
  * The operator surface pins CPU-bound, few-byte stages to full machine
  * width with an explicit user repartition (the dd20 rule: AQE's
  * byte-based advisory coalesces them to 2-3 tasks otherwise). Those
  * pins were the literal 32 — a constant tuned to the local[32] bench
  * box (guide §2: partitioning must be scale-adaptive, not a constant
  * tuned for either local mode or the cluster). `width` derives the
  * same number from the session: `defaultParallelism` is the total
  * core count of the master the session actually runs on (local[N] →
  * N, local-cluster/standalone/YARN → sum of executor cores), so the
  * bench at SPARK_GRAFT_CPUS=32 plans the identical 32-way exchange
  * while SPARK_GRAFT_CPUS=8 (the driver's scaling run) and a real
  * cluster get THEIR width instead of an 8-core box juggling 32 tasks.
  */
object Par {
  def width(s: SparkSession): Int = s.sparkContext.defaultParallelism
  def width(df: Dataset[_]): Int = width(df.sparkSession)

  /** Round-robin spread to machine width — `.transform(Par.spread)`
    * replaces the literal `.repartition(32)`. */
  def spread[T](df: Dataset[T]): Dataset[T] = df.repartition(width(df))

  /** Keyed machine-width pin (the non-coalescible exchange the next
    * equi-join/window reuses) — `.transform(Par.spreadBy(col(...)))`
    * replaces the literal `.repartition(32, cols...)`. */
  def spreadBy(cols: org.apache.spark.sql.Column*)
      : org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
    df => df.repartition(width(df), cols: _*)
}
