package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit path for the drift watch's decision logic (r10 verdict item 1:
  * the single-latest recent baseline degenerated when the latest sweep
  * WAS the all-history best — best==last is one baseline in disguise).
  * No Spark session: the helpers are pure.
  */
class BenchDriftSpec extends AnyFunSuite {

  private def sweeps(vs: Double*): Seq[Map[String, Double]] =
    vs.map(v => Map("q" -> v))

  test("best==last no longer auto-fires: the median of the last 3 " +
      "absorbs a one-off fast sweep") {
    // the ss25 shape: steady ~2.0 s history, one 1.3 s outlier as the
    // LATEST sweep, current run 2.3 s. Old rule (best + single-latest):
    // both baselines were the same 1.3 → fired. New rule: med3 of
    // (2.0, 2.0, 1.3) = 2.0 → 2.3 s is inside 1.5x → no flag.
    val h = sweeps(2.1, 2.0, 2.0, 1.3)
    val best = Some(1.3)
    val med3 = Bench.recentMedian(h, "q")
    assert(med3.contains(2.0))
    assert(Bench.breaches(2.3, 1.3)) // best alone WOULD fire
    assert(!Bench.driftFires(2.3, best, med3))
  }

  test("a real regression still fires through both baselines") {
    val h = sweeps(1.3, 1.4, 1.3, 1.35)
    assert(Bench.driftFires(3.0, Some(1.3), Bench.recentMedian(h, "q")))
  }

  test("no recent history degrades to best-only, not silence") {
    // ADVICE r10: unparseable/missing recent sweeps must not suppress
    assert(Bench.recentMedian(Seq.empty, "q").isEmpty)
    assert(Bench.driftFires(3.0, Some(1.3), None))
    assert(!Bench.driftFires(1.4, Some(1.3), None))
    assert(!Bench.driftFires(3.0, None, None)) // brand-new query
  }

  test("median uses only sweeps that contain the query") {
    val h = Seq(Map("q" -> 2.0), Map("other" -> 9.0), Map("q" -> 1.0),
      Map("q" -> 3.0))
    // last 3 sweeps contain q twice: median of (1.0, 3.0) = 2.0
    assert(Bench.recentMedian(h, "q").contains(2.0))
  }

  private def stamped(vs: (String, Double)*): Seq[(String, Map[String, Double])] =
    vs.map { case (st, v) => st -> Map("q" -> v) }

  test("accepted-rewrite cutoff truncates BOTH baselines by rule, not " +
      "by history rollover (r12 finding 1)") {
    // pre-rewrite history at ~0.4 s, rewrite accepted at stamp _15,
    // post-rewrite sweeps at ~1.3 s; current run 1.4 s
    val h = stamped("20260816_10" -> 0.40, "20260816_11" -> 0.41,
      "20260816_12" -> 0.42, "20260816_16" -> 1.30, "20260816_17" -> 1.28)
    val cut = Map("q" -> "20260816_15")
    // un-truncated, the all-history best would breach (1.4 vs 0.40)
    assert(Bench.breaches(1.4, 0.40))
    val vals = Bench.eligibleValues(h, cut, "q")
    assert(vals == Seq(1.30, 1.28), vals)
    assert(!Bench.driftFires(1.4, vals.minOption,
      Bench.medianOfLast3(vals)))
    // a REAL regression on top of the accepted rewrite still fires
    assert(Bench.driftFires(3.0, vals.minOption,
      Bench.medianOfLast3(vals)))
  }

  test("no cutoff → full history; cutoff with no post-rewrite sweeps " +
      "yet → no baseline, no flag (new-query semantics)") {
    val h = stamped("20260816_10" -> 0.40, "20260816_11" -> 0.45)
    assert(Bench.eligibleValues(h, Map.empty, "q") == Seq(0.40, 0.45))
    val vals = Bench.eligibleValues(h, Map("q" -> "20260816_20"), "q")
    assert(vals.isEmpty)
    assert(!Bench.driftFires(9.9, vals.minOption,
      Bench.medianOfLast3(vals)))
  }

  test("cutoffs are per-query: other queries keep their full history") {
    val h = Seq(
      "20260816_10" -> Map("q" -> 0.40, "p" -> 1.0),
      "20260816_16" -> Map("q" -> 1.30, "p" -> 1.1))
    val cut = Map("q" -> "20260816_15")
    assert(Bench.eligibleValues(h, cut, "p") == Seq(1.0, 1.1))
    assert(Bench.eligibleValues(h, cut, "q") == Seq(1.30))
  }
}
