package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's measurement protocol — pure logic, no Spark.
  * The drift gate (median-vs-warmup inversion) is what keeps recorded
  * numbers honest, so its thresholds are pinned here, including the
  * exact round-6 contamination cases it was built to catch (re-shaped
  * to the round-16 run counts: warmup + 2 measured for batch/stream,
  * warmup + 1 for the v/sl lifecycle parts — the wall-clock budget
  * that keeps the driver's ~3600 s window survivable on a 1.4×
  * degraded host).
  */
class BenchProtocolSpec extends AnyFunSuite {

  test("medianOf takes the median of the post-warm-up runs only") {
    // warm-up 9.0 is dropped; median-of-2 = mean of (3.0, 1.0) = 2.0
    assert(Bench.medianOf(Seq(9.0, 3.0, 1.0)) == 2.0)
    // lifecycle shape: warm-up dropped, the single measured run IS the figure
    assert(Bench.medianOf(Seq(5.0, 4.0)) == 4.0)
  }

  test("medianOf rejects run lists of the wrong length instead of mis-reporting") {
    // a 1-element list would silently report the warm-up as the median;
    // an empty list would throw obscurely; a 4-run list is the OLD
    // protocol leaking through — all must fail loudly
    for (bad <- Seq(Seq.empty[Double], Seq(1.0), Seq(9.0, 3.0, 1.0, 2.0)))
      assertThrows[IllegalArgumentException](Bench.medianOf(bad))
  }

  test("a healthy profile (warm-up slowest) is not inverted") {
    assert(!Bench.inverted(Seq(3.0, 1.0, 1.1))) // typical: cold 3x steady
    assert(!Bench.inverted(Seq(0.5, 0.45, 0.5))) // flat profile
  }

  test("the round-6 contamination profiles ARE inverted") {
    // BENCH_r06 detail (first three runs of each): q33 [2.89, 7.37,
    // 5.30] median 2.2x warm-up, dbt_impact [3.25, 4.27, 4.07]
    // monotonic degradation
    assert(Bench.inverted(Seq(2.89, 7.37, 5.30)))
    assert(Bench.inverted(Seq(3.25, 4.27, 4.07)))
  }

  test("sub-second noise does not trip the gate (0.3s absolute floor)") {
    // median 0.245 vs warm-up 0.15: 1.6x but under the absolute floor —
    // scheduler noise on a tiny query, not contamination
    assert(!Bench.inverted(Seq(0.15, 0.25, 0.24)))
    // but a genuine multi-second inversion on a small warm-up trips
    assert(Bench.inverted(Seq(0.5, 2.0, 2.1)))
  }

  test("a median within 15% of a multi-second warm-up is tolerated") {
    // warm-up 3.0, median 3.15: +5% — plausible run-to-run variance
    // on a shuffle-heavy query, not the contamination signature
    assert(!Bench.inverted(Seq(3.0, 3.2, 3.1)))
  }

  test("part assignment is a pinned stable hash — new registrations move nobody") {
    // literal expected values: a change to the hash or modulus shows up
    // here BEFORE it silently re-packs every part and breaks
    // round-over-round median comparability (the r12 q29 cluster)
    assert(Bench.stablePart("q29_median", 18) == 16)
    assert(Bench.stablePart("q194_triangles", 18) == 1)
    assert(Bench.stablePart("q01_pricing_summary", 18) == 7)
    // assignment depends only on the name — not on what else exists
    assert(Bench.stablePart("q29_median", 18) == Bench.stablePart("q29_median", 18))
  }

  test("host-contention spread (>3x across runs) triggers best-of-2 escalation") {
    // the r7 driver-machine profiles the escalation was built for
    // (first three runs of each):
    assert(Bench.spreadOver3x(Seq(7.9, 1.8, 16.1)))
    assert(Bench.spreadOver3x(Seq(4.8, 24.9, 3.6)))
    // a healthy cold-warm profile (3x warm-up exactly) does not
    assert(!Bench.spreadOver3x(Seq(3.0, 1.0, 1.1)))
    // sub-100ms jitter never trips the 0.05s floor
    assert(!Bench.spreadOver3x(Seq(0.04, 0.01, 0.012)))
  }
}
