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
}
