package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Join operators Spark has no single built-in for (builder preference
  * order (a): compose existing ops — SURVEY §7.3): as-of join and range
  * join. Both oracle-checked (DuckDB has native ASOF JOIN; the range
  * join is plain theta-join SQL).
  */
object JoinOps {
  type Q = (SparkSession, String) => DataFrame

  /** As-of join, composed the scalable way: union the two sides with a
    * marker, ONE shuffle on (user_id), sort by event time within the
    * partition, carry the most recent right-side row forward with
    * last(ignoreNulls) over an unbounded-preceding frame, keep left rows.
    * No per-row lookups, no broadcast of the big side, no O(n²) —
    * exactly the plan an ASOF JOIN physical operator would produce
    * (sort-merge on key+time), expressed with stock operators.
    *
    * Semantics: each left row pairs with the latest right row whose
    * ts <= left.ts (inclusive), per user — DuckDB `ASOF LEFT JOIN` with
    * `ON left.user_id = right.user_id AND left.ts >= right.ts`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      time: String, rightCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_side", lit(1))
    val r = right.withColumn("_side", lit(0))
    val unioned = l.select((key +: time +: "_side" +:
        left.columns.filterNot(c => c == key || c == time).toSeq)
        .map(col): _*)
      .unionByName(
        r.select((key +: time +: "_side" +: rightCols).map(col): _*),
        allowMissingColumns = true)
    // right rows sort before left rows at equal ts so `>=` is inclusive
    val w = Window.partitionBy(key).orderBy(col(time), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // One struct carried by ONE last(ignoreNulls) — all asof_ columns come
    // from the SAME matched right row even when some of its fields are
    // null (per-column carry would take each column from the latest row
    // where THAT column was non-null: row-inconsistent). The struct is
    // nulled on left rows — struct(null,null) is itself non-null, so the
    // guard, not ignoreNulls alone, is what restricts the carry to right
    // rows.
    val carried = unioned.withColumn("_r", last(
        when(col("_side") === 0, struct(rightCols.map(col): _*)),
        ignoreNulls = true).over(w))
    rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", col("_r").getField(c))
    }.filter(col("_side") === 1)
      .drop("_side" +: "_r" +: rightCols: _*)
  }

  /** q39: each purchase event joined to the user's most recent preceding
    * click (inclusive). Oracle = DuckDB's native ASOF LEFT JOIN.
    */
  private val q39Asof: Q = (s, d) => {
    val events = t(s, d, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    asofJoin(purchases, clicks, "user_id", "ts",
      Seq("click_id", "click_value"))
      .select(col("event_id"), col("user_id"),
        col("asof_click_id").as("click_id"),
        round(col("asof_click_value"), 2).as("click_value"))
      .orderBy("event_id")
  }

  /** FORWARD as-of join — each left row pairs with the EARLIEST right row
    * whose ts >= left.ts (inclusive), per key: the mirror of asofJoin
    * (same one-shuffle marker-union composition, frame flipped to
    * [current, unbounded following] with first/ignoreNulls). Left rows
    * sort before right rows at equal ts so >= stays inclusive; the
    * right-side id column is the tie-break among equal-ts right rows.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      time: String, rightCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_side", lit(0))
    val r = right.withColumn("_side", lit(1))
    val unioned = l.select((key +: time +: "_side" +:
        left.columns.filterNot(c => c == key || c == time).toSeq)
        .map(col): _*)
      .unionByName(
        r.select((key +: time +: "_side" +: rightCols).map(col): _*),
        allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("_side").asc,
        col(rightCols.head).asc_nulls_first)
      .rowsBetween(0, Window.unboundedFollowing)
    // Same single-struct carry as asofJoin (see there) — here the right
    // side is _side=1 and the frame looks forward.
    val carried = unioned.withColumn("_r", first(
        when(col("_side") === 1, struct(rightCols.map(col): _*)),
        ignoreNulls = true).over(w))
    rightCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"asof_$c", col("_r").getField(c))
    }.filter(col("_side") === 0)
      .drop("_side" +: "_r" +: rightCols: _*)
  }

  /** q48: each purchase joined to the user's NEXT click at-or-after it
    * (attribution's forward direction). Oracle: correlated LATERAL
    * top-1 in DuckDB — same semantics spelled declaratively.
    */
  private val q48AsofForward: Q = (s, d) => {
    val events = t(s, d, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    asofJoinForward(purchases, clicks, "user_id", "ts",
      Seq("click_id", "click_value"))
      .select(col("event_id"), col("user_id"),
        col("asof_click_id").as("click_id"),
        round(col("asof_click_value"), 2).as("click_value"))
      .orderBy("event_id")
  }

  /** q40: range join — parts bucketed into price bands via an interval
    * predicate against a tiny literal band table. Spark plans a
    * broadcast-nested-loop with the band side broadcast: at 100 TB the
    * fact side streams once, no shuffle.
    */
  private val q40Range: Q = (s, d) => {
    val bands = s.createDataFrame(Seq(
      ("budget", 0.0, 500.0), ("mid", 500.0, 1200.0),
      ("premium", 1200.0, 2000.0), ("luxury", 2000.0, 1e9)))
      .toDF("band", "lo", "hi")
    t(s, d, "part")
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("cnt"),
        round(avg("p_retailprice"), 2).as("avg_price"))
      .orderBy("band")
  }

  /** q65: NEAREST as-of join — each purchase pairs with the temporally
    * CLOSEST click either side (tie → the preceding one). Still ONE
    * shuffle + ONE sort: both directional carries are window functions
    * over the SAME (key, time, side, id) ordering — backward via
    * last(ignoreNulls) over [unbounded, 0], forward via
    * first(ignoreNulls) over [0, unbounded] — then a projection picks
    * the closer struct. An equal-ts click sorts before the purchase, so
    * the backward carry sees it at distance 0 and wins — the forward
    * frame missing it is unobservable.
    *
    * Tie-break fine print (pinned by the oracle's ORDER BY): among
    * equal-distance clicks on the SAME side, backward resolves to the
    * largest click_id (last in ascending order), forward to the
    * smallest (first).
    */
  private val q65AsofNearest: Q = (s, d) => {
    val events = t(s, d, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("_side", lit(1))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"))
      .withColumn("_side", lit(0))
    val unioned = purchases.unionByName(clicks, allowMissingColumns = true)
    val ord = Seq(col("ts"), col("_side"), col("click_id").asc_nulls_first)
    val wb = Window.partitionBy("user_id").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wf = Window.partitionBy("user_id").orderBy(ord: _*)
      .rowsBetween(0, Window.unboundedFollowing)
    val rstruct = when(col("_side") === 0,
      struct(col("ts").as("t"), col("click_id").as("id")))
    val picked = unioned
      .withColumn("_b", last(rstruct, ignoreNulls = true).over(wb))
      .withColumn("_f", first(rstruct, ignoreNulls = true).over(wf))
      .filter(col("_side") === 1)
      .withColumn("dtb", unix_micros(col("ts")) - unix_micros(col("_b.t")))
      .withColumn("dtf", unix_micros(col("_f.t")) - unix_micros(col("ts")))
      .withColumn("_n",
        when(col("_b").isNull, col("_f"))
          .when(col("_f").isNull, col("_b"))
          .when(col("dtb") <= col("dtf"), col("_b"))
          .otherwise(col("_f")))
    picked.select(col("event_id"), col("user_id"),
        col("_n.id").as("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("_n.t"))).as("dt_us"))
      .orderBy("event_id")
  }

  /** q68: SCD2 DIMENSION MERGE — the warehouse upsert-with-history
    * primitive (MERGE INTO with type-2 semantics, composed from stock
    * operators since the engine owns no table format): a full outer join
    * of the current dimension against an update batch classifies every
    * key as unchanged / changed / new, then ONE generator emits the
    * closed-out old version and/or the new current version per key — no
    * second pass, no per-branch re-scan. The update batch here is
    * deterministic (every 7th customer gets +100 balance; 5 brand-new
    * keys) so both engines build it identically.
    *
    * Scale: one key-equi full outer join (dim bucketed by key in a real
    * deployment → co-located, zero dim re-shuffle per batch, exactly the
    * dd11 admission shape) + a per-row generate. History grows by the
    * changed sliver only.
    */
  private val q68Scd2Merge: Q = (s, d) => {
    val dim = t(s, d, "customer")
      .select(col("c_custkey").as("key"),
        round(col("c_acctbal"), 2).as("bal"))
    val updates = dim.filter(col("key") % 7 === 0)
      .select(col("key"), round(col("bal") + 100.0, 2).as("new_bal"))
      .unionAll(dim.filter(col("key") < 5)
        .select((col("key") + 1000000L).as("key"),
          round(col("bal"), 2).as("new_bal")))
    dim.join(updates, Seq("key"), "full_outer")
      .select(col("key"), explode(expr(
        """CASE
          |  WHEN new_bal IS NULL THEN
          |    array(named_struct('version', 1L, 'bal', bal,
          |                       'is_current', true))
          |  WHEN bal IS NULL THEN
          |    array(named_struct('version', 1L, 'bal', new_bal,
          |                       'is_current', true))
          |  ELSE array(
          |    named_struct('version', 1L, 'bal', bal,
          |                 'is_current', false),
          |    named_struct('version', 2L, 'bal', new_bal,
          |                 'is_current', true))
          |END""".stripMargin)).as("r"))
      .select(col("key"), col("r.version").as("version"),
        col("r.bal").as("bal"), col("r.is_current").as("is_current"))
      .orderBy("key", "version")
  }

  /** q75: POINT-IN-TIME (AS OF) LOOKUP over SCD2 history — the query
    * q68's history exists to answer ("what did the dimension look like
    * on day D"): the merge's versions get validity windows (v1 from day
    * 0; a change closes it at day 100 and opens v2; brand-new keys open
    * at day 100), and two probe days (50 = before the batch, 150 =
    * after) each reconstruct the dimension state with one
    * validity-window filter. Balances aggregate as integer CENTS —
    * summing thousands of doubles would drift across engines; a BIGINT
    * sum cannot.
    *
    * Scale: the probe is a filter + partial/final aggregate per date —
    * no join at all once the history exists; with the history bucketed
    * by key (q68's note), per-key AS OF lookups are partition-pruned
    * point reads.
    */
  private val q75AsofDimension: Q = (s, d) => {
    val dim = t(s, d, "customer")
      .select(col("c_custkey").as("key"),
        round(col("c_acctbal"), 2).as("bal"))
    val updates = dim.filter(col("key") % 7 === 0)
      .select(col("key"), round(col("bal") + 100.0, 2).as("new_bal"))
      .unionAll(dim.filter(col("key") < 5)
        .select((col("key") + 1000000L).as("key"),
          round(col("bal"), 2).as("new_bal")))
    val hist = dim.join(updates, Seq("key"), "full_outer")
      .select(col("key"), explode(expr(
        """CASE
          |  WHEN new_bal IS NULL THEN
          |    array(named_struct('bal', bal, 'vf', 0L, 'vt', CAST(NULL AS BIGINT)))
          |  WHEN bal IS NULL THEN
          |    array(named_struct('bal', new_bal, 'vf', 100L, 'vt', CAST(NULL AS BIGINT)))
          |  ELSE array(
          |    named_struct('bal', bal, 'vf', 0L, 'vt', 100L),
          |    named_struct('bal', new_bal, 'vf', 100L, 'vt', CAST(NULL AS BIGINT)))
          |END""".stripMargin)).as("r"))
      .select(col("key"), col("r.bal").as("bal"), col("r.vf").as("vf"),
        col("r.vt").as("vt"))
    val probes = s.range(2).select(
      (col("id") * 100L + 50L).as("probe_day"))
    hist.crossJoin(broadcast(probes))
      .filter(col("vf") <= col("probe_day") &&
        (col("vt").isNull || col("probe_day") < col("vt")))
      .groupBy("probe_day")
      .agg(count(lit(1)).as("n_keys"),
        sum(expr("CAST(round(bal * 100) AS BIGINT)"))
          .as("total_bal_cents"))
      .orderBy("probe_day")
  }

  val queries: Map[String, Q] = Map(
    "q75_asof_dimension" -> q75AsofDimension,
    "q39_asof_join" -> q39Asof,
    "q40_range_join" -> q40Range,
    "q48_asof_forward" -> q48AsofForward,
    "q65_asof_nearest" -> q65AsofNearest,
    "q68_scd2_merge" -> q68Scd2Merge,
  )

  val oracleSql: Map[String, String] = Map(
    "q75_asof_dimension" ->
      """WITH dim AS (SELECT c_custkey AS key, round(c_acctbal, 2) AS bal
        |  FROM customer),
        |upd AS (SELECT key, round(bal + 100.0, 2) AS new_bal FROM dim
        |  WHERE key % 7 = 0
        |  UNION ALL
        |  SELECT key + 1000000, round(bal, 2) FROM dim WHERE key < 5),
        |j AS (SELECT coalesce(d.key, u.key) AS key, d.bal, u.new_bal
        |  FROM dim d FULL OUTER JOIN upd u ON d.key = u.key),
        |hist AS (
        |  SELECT key, bal, CAST(0 AS BIGINT) AS vf,
        |    CASE WHEN new_bal IS NULL THEN CAST(NULL AS BIGINT)
        |         ELSE CAST(100 AS BIGINT) END AS vt
        |  FROM j WHERE bal IS NOT NULL
        |  UNION ALL
        |  SELECT key, new_bal, 100, NULL
        |  FROM j WHERE new_bal IS NOT NULL),
        |probes AS (SELECT unnest([CAST(50 AS BIGINT),
        |    CAST(150 AS BIGINT)]) AS probe_day)
        |SELECT probe_day, count(*) AS n_keys,
        |  CAST(sum(CAST(round(bal * 100) AS BIGINT)) AS BIGINT)
        |    AS total_bal_cents
        |FROM hist CROSS JOIN probes
        |WHERE vf <= probe_day AND (vt IS NULL OR probe_day < vt)
        |GROUP BY probe_day ORDER BY probe_day""".stripMargin,
    "q39_asof_join" ->
      """SELECT p.event_id, p.user_id, c.click_id, round(c.click_value, 2) AS click_value
        |FROM (SELECT user_id, ts, event_id, value FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id,
        |                       value AS click_value FROM events
        |                WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q48_asof_forward" ->
      """SELECT p.event_id, p.user_id, c.click_id, c.click_value
        |FROM (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'purchase') p
        |LEFT JOIN LATERAL (
        |  SELECT event_id AS click_id, round(value, 2) AS click_value
        |  FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |    AND c.ts >= p.ts
        |  ORDER BY c.ts, c.event_id LIMIT 1) c ON true
        |ORDER BY p.event_id""".stripMargin,
    "q65_asof_nearest" ->
      """SELECT p.event_id, p.user_id, c.click_id, c.dt_us
        |FROM (SELECT user_id, ts, event_id FROM events
        |      WHERE event_type = 'purchase') p
        |LEFT JOIN LATERAL (
        |  SELECT event_id AS click_id,
        |    epoch_us(p.ts) - epoch_us(c.ts) AS dt_us
        |  FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |  ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)),
        |    (c.ts <= p.ts) DESC,
        |    CASE WHEN c.ts <= p.ts THEN -c.event_id ELSE c.event_id END
        |  LIMIT 1) c ON true
        |ORDER BY p.event_id""".stripMargin,
    "q68_scd2_merge" ->
      """WITH dim AS (SELECT c_custkey AS key, round(c_acctbal, 2) AS bal
        |  FROM customer),
        |upd AS (SELECT key, round(bal + 100.0, 2) AS new_bal FROM dim
        |  WHERE key % 7 = 0
        |  UNION ALL
        |  SELECT key + 1000000, round(bal, 2) FROM dim WHERE key < 5),
        |j AS (SELECT coalesce(d.key, u.key) AS key, d.bal, u.new_bal
        |  FROM dim d FULL OUTER JOIN upd u ON d.key = u.key)
        |SELECT key, version, bal, is_current FROM (
        |  SELECT key, CAST(1 AS BIGINT) AS version, bal,
        |    (new_bal IS NULL) AS is_current
        |  FROM j WHERE bal IS NOT NULL
        |  UNION ALL
        |  SELECT key, CAST(1 AS BIGINT), new_bal, TRUE
        |  FROM j WHERE bal IS NULL
        |  UNION ALL
        |  SELECT key, CAST(2 AS BIGINT), new_bal, TRUE
        |  FROM j WHERE bal IS NOT NULL AND new_bal IS NOT NULL)
        |ORDER BY key, version""".stripMargin,
    "q40_range_join" ->
      """SELECT band, count(*) AS cnt, round(avg(p_retailprice), 2) AS avg_price
        |FROM part
        |JOIN (VALUES ('budget', 0.0, 500.0), ('mid', 500.0, 1200.0),
        |             ('premium', 1200.0, 2000.0), ('luxury', 2000.0, 1e9))
        |     AS bands(band, lo, hi)
        |  ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
  )
}
