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
    "tx07_source_signature")

  test("oracle map covers exactly the non-rows-only queries") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle entries without a query: ${o -- q}")
    assert(q -- o == rowsOnly,
      s"unexpected rows-only set: ${(q -- o).toSeq.sorted}")
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
}
