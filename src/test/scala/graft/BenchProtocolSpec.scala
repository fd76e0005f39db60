package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's measurement protocol — pure logic, no Spark.
  * The drift gate (median-vs-warmup inversion) is what keeps recorded
  * numbers honest, so its thresholds are pinned here, including the
  * exact round-6 contamination cases it was built to catch.
  */
class BenchProtocolSpec extends AnyFunSuite {

  test("medianOf takes the median of the post-warm-up runs only") {
    // warm-up 9.0 is dropped; median of (1.0, 2.0, 3.0) = 2.0
    assert(Bench.medianOf(Seq(9.0, 3.0, 1.0, 2.0)) == 2.0)
  }

  test("medianOf rejects run lists of the wrong length instead of mis-reporting") {
    // a 1-element list would silently report the warm-up as the median;
    // an empty list would throw obscurely — both must fail loudly
    for (bad <- Seq(Seq.empty[Double], Seq(1.0), Seq(1.0, 2.0, 3.0)))
      assertThrows[IllegalArgumentException](Bench.medianOf(bad))
  }

  test("a healthy profile (warm-up slowest) is not inverted") {
    assert(!Bench.inverted(Seq(3.0, 1.0, 1.1, 0.9))) // typical: cold 3x steady
    assert(!Bench.inverted(Seq(0.5, 0.45, 0.5, 0.48))) // flat profile
  }

  test("the round-6 contamination profiles ARE inverted") {
    // BENCH_r06 detail: q33 [2.89, 7.37, 5.30, 7.36], q110 [15.83,
    // 4.30, 4.45, 11.37] median 4.45 vs warm-up 15.83 (NOT inverted —
    // huge warm-up), dbt_impact [3.25, 4.27, 4.07, 4.33]
    assert(Bench.inverted(Seq(2.89, 7.37, 5.30, 7.36))) // q33: median 2.5x warm-up
    assert(Bench.inverted(Seq(3.25, 4.27, 4.07, 4.33))) // dbt_impact: monotonic degradation
  }

  test("sub-second noise does not trip the gate (0.3s absolute floor)") {
    // median 0.25 vs warm-up 0.15: 1.67x but only +0.1s — scheduler
    // noise on a tiny query, not contamination
    assert(!Bench.inverted(Seq(0.15, 0.25, 0.24, 0.26)))
    // but a genuine multi-second inversion on a small warm-up trips
    assert(Bench.inverted(Seq(0.5, 2.0, 2.1, 1.9)))
  }

  test("a median within 15% of a multi-second warm-up is tolerated") {
    // warm-up 3.0, median 3.2: +6.7% — plausible run-to-run variance
    // on a shuffle-heavy query, not the contamination signature
    assert(!Bench.inverted(Seq(3.0, 3.2, 3.1, 3.3)))
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
    // the r7 driver-machine profiles the escalation was built for:
    // q33 [7.9, 1.8, 16.1, 3.4] and q110 [4.8, 24.9, 3.6, 2.5]
    assert(Bench.spreadOver3x(Seq(7.9, 1.8, 16.1, 3.4)))
    assert(Bench.spreadOver3x(Seq(4.8, 24.9, 3.6, 2.5)))
    // a healthy cold-warm profile (3x warm-up exactly) does not
    assert(!Bench.spreadOver3x(Seq(3.0, 1.0, 1.1, 1.05)))
    // sub-100ms jitter never trips the 0.05s floor
    assert(!Bench.spreadOver3x(Seq(0.04, 0.01, 0.012, 0.011)))
  }
}
