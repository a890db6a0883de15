package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench load-guard verdict on the round-9 contamination
  * shape: a record taken at host load 8 with per-rep spreads to 190×
  * must flag itself, a quiet clean run must not, and sub-second
  * jitter (even at huge ratios) must never trip the spread bar. */
class BenchGuardSpec extends AnyFunSuite {

  test("the round-9 contamination shape flags itself") {
    // q_json_extract's actual recorded reps: [1.8, 19.3, 344.5]
    val (skewed, names) = Bench.skewVerdict(
      Seq("q_json_extract" -> Seq(1.8, 19.3, 344.5),
          "q_dedup_exact" -> Seq(0.3, 0.31, 0.29)),
      load1Start = 8.01, maxLoad = 4.0, maxSpread = 5.0)
    assert(skewed)
    assert(names == Seq("q_json_extract"))
  }

  test("high start load alone flags, even with clean spreads") {
    val (skewed, names) = Bench.skewVerdict(
      Seq("q1" -> Seq(1.0, 1.1, 1.05)),
      load1Start = 7.5, maxLoad = 4.0, maxSpread = 5.0)
    assert(skewed && names.isEmpty)
  }

  test("a quiet clean run does not flag") {
    val (skewed, names) = Bench.skewVerdict(
      Seq("q1" -> Seq(1.0, 1.4, 1.2), "q2" -> Seq(4.0, 4.9, 4.2)),
      load1Start = 1.2, maxLoad = 4.0, maxSpread = 5.0)
    assert(!skewed && names.isEmpty)
  }

  test("sub-second jitter never trips the spread bar") {
    // 0.02 -> 0.4 is a 20x ratio but trivial absolute time
    val (skewed, names) = Bench.skewVerdict(
      Seq("q_tiny" -> Seq(0.02, 0.4, 0.03)),
      load1Start = 0.5, maxLoad = 4.0, maxSpread = 5.0)
    assert(!skewed && names.isEmpty)
  }

  test("first-rep JIT warmup alone does not trip the spread bar") {
    // q_c4_clean's actual shape: one-time codegen compile on rep 1,
    // tight post-warmup reps; the reported timing (runs.min) never
    // contains rep 1, so neither should the verdict
    val (skewed, names) = Bench.skewVerdict(
      Seq("q_c4_clean" -> Seq(1.96, 0.36, 0.28),
          "q_big_warm" -> Seq(7.0, 1.2, 1.1)),
      load1Start = 0.9, maxLoad = 4.0, maxSpread = 5.0)
    assert(!skewed && names.isEmpty)
  }

  test("a contention window in the post-warmup reps still flags") {
    val (skewed, names) = Bench.skewVerdict(
      Seq("q1" -> Seq(1.0, 1.1, 9.0)),
      load1Start = 0.9, maxLoad = 4.0, maxSpread = 5.0)
    assert(skewed && names == Seq("q1"))
  }

  test("single-rep runs cannot produce a spread verdict") {
    val (skewed, names) = Bench.skewVerdict(
      Seq("q1" -> Seq(300.0)), load1Start = 0.5,
      maxLoad = 4.0, maxSpread = 5.0)
    assert(!skewed && names.isEmpty)
  }

  test("host-speed calibration returns a sane, repeatable per-core timing") {
    // the r17 epoch-drift lesson: loadavg cannot see a host that is
    // simply slower this week — calib_sec is the cross-epoch
    // normalizer, so it must be stable on a given host (min-of-3
    // absorbs scheduler jitter) and in a plausible band
    val a = Bench.calibrate()
    val b = Bench.calibrate()
    assert(a > 0.01 && a < 30.0, s"calibration out of band: $a")
    assert(math.max(a, b) / math.min(a, b) < 3.0,
      s"calibration unstable on one host: $a vs $b")
  }
}
