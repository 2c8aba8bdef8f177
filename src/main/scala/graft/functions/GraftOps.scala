package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.Row

/** SQL-addressable pipeline operators (round-4 verdict item 9): the
  * reference's whole UX is "type SQL, get a table" (`ksql.js:159`
  * delegates any SQL string to its engine), so the dedup / similarity /
  * text / pipeline operator families must be reachable from the REPL and
  * HTTP API without writing Scala. Two table-valued functions close the
  * gap:
  *
  *   - `graft_op('dd02_dedup_exact_hash', '/data/sf')` — run any
  *     operator from [[graft.SparkEntry.queries]] as a relation; compose
  *     it with ordinary SQL (`WHERE`, joins, CTEs). The second argument
  *     can be omitted when `spark.graft.dataDir` is set on the session.
  *   - `graft_ops()` — list the available operator names.
  *
  * Why a TVF and not eager temp views: several operators (connected
  * components, k-means) EXECUTE Spark jobs while their plan is built
  * (iterative driver loops with localCheckpoint), so registering all
  * ~160 as views at startup would run real work for operators nobody
  * asked for. The TVF builds the invoked operator's plan at analysis
  * time only — zero cost until named, and Catalyst then optimizes the
  * caller's filters/projections INTO the inlined plan exactly as with a
  * SQL view.
  *
  * Registered both ways (the GraftExtensions pattern): via
  * `injectTableFunction` for extension-built sessions, and via
  * [[GraftFunctions.register]] for plain sessions.
  */
object GraftOps {

  /** All operator names, sorted — the `graft_ops()` listing. */
  def availableOps: Seq[String] = graft.SparkEntry.queries.keys.toSeq.sorted

  /** Operators that PUBLISH persisted index generations at plan-build
    * time (Bucketing.publish call sites). Under the TVF surface these
    * run on a cloned session with a per-invocation
    * `spark.graft.indexNamespace`, so interleaved/concurrent graft_op
    * calls never share a manifest or table: invocation A's pinned
    * generation cannot be aged out by invocation B publishing twice
    * before A's deferred collection runs (the r12 ADVICE clobber
    * hazard). Verify/Bench call SparkEntry.queries directly and keep
    * the fixed un-namespaced names.
    */
  private[graft] val indexWritingOps: Set[String] = Set(
    "ss33_persisted_index", "ss34_delta_index", "ss36_compacted_recall",
    "ss38_purge_compaction", "dd35_persisted_bands",
    "dd36_delta_band_index", "dd37_compacted_bands", "dd38_erasure_purge",
    "tx37_persisted_text_index", "tx38_delta_text_index",
    "tx39_compacted_text_index", "tx40_text_purge", "ss43_served_hybrid",
    "st26_index_handoff", "pp42_publish_lifecycle")

  private val opInvocations = new java.util.concurrent.atomic.AtomicLong

  /** A JVM-unique, invocation-unique namespace suffix (pid guards two
    * REPL processes sharing one warehouse). */
  private def freshNamespace(): String =
    s"_op${ProcessHandle.current().pid()}x${opInvocations.incrementAndGet()}"

  private def stringArg(e: Expression, fn: String, what: String): String = {
    if (!e.foldable || e.dataType != StringType)
      throw new IllegalArgumentException(
        s"$fn: $what must be a string literal, got ${e.sql}")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(
      s"$fn: $what must not be null")
    v.toString
  }

  /** `graft_op(name[, dir])` builder: resolves the named operator and
    * inlines its analyzed plan (the temp-view mechanic, built on
    * demand).
    */
  def opPlan(es: Seq[Expression]): LogicalPlan = {
    if (es.isEmpty || es.length > 2) throw new IllegalArgumentException(
      "graft_op expects (name) or (name, dataDir)")
    val name = stringArg(es.head, "graft_op", "operator name")
    val s = SparkSession.active
    val dir =
      if (es.length == 2) stringArg(es(1), "graft_op", "dataDir")
      else s.conf.getOption("spark.graft.dataDir").getOrElse(
        throw new IllegalArgumentException(
          "graft_op(name) needs spark.graft.dataDir set on the session; " +
            "or pass it explicitly: graft_op(name, dataDir)"))
    val q = graft.SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown graft operator '$name' — run graft_ops() to list " +
          s"the ${availableOps.length} available operators"))
    // index-publishing ops build on a cloned session with a private
    // namespace (same SparkContext — the plan inlines into the caller
    // fine; the clone only isolates conf + catalog entries)
    val buildSession =
      if (indexWritingOps(name)) {
        val s2 = s.newSession()
        s2.conf.set("spark.graft.indexNamespace", freshNamespace())
        s2
      } else s
    q(buildSession, dir).queryExecution.analyzed
  }

  /** `graft_ops()` builder: a one-column relation of operator names. */
  def opsPlan(es: Seq[Expression]): LogicalPlan = {
    if (es.nonEmpty) throw new IllegalArgumentException(
      "graft_ops takes no arguments")
    LocalRelation.fromExternalRows(
      Seq(AttributeReference("op", StringType, nullable = false)()),
      availableOps.map(Row(_)))
  }
}
