package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's window-noise verdict (VERDICT r16 #2): the canary-drift
  * refusal the manual sweep protocol applied by hand is now part of the
  * recorded `noisy` flag, and these cases keep its thresholds from
  * drifting. No SparkSession needed — the verdict is pure arithmetic.
  */
class BenchSpec extends AnyFunSuite {

  test("quiet window: stable canary is not noisy") {
    assert(!Bench.noisyVerdict(0.110, 0.112))
    assert(!Bench.noisyVerdict(0.50, 0.55))
  }

  test("symmetric rule: >1.5x divergence in either direction is noisy") {
    // Post-sweep spike (also caught by the drift rule).
    assert(Bench.noisyVerdict(0.10, 0.16))
    // Pre-sweep elevated, post-sweep settled: only the symmetric rule
    // sees this direction (the host was loud when the sweep STARTED).
    assert(Bench.noisyVerdict(0.30, 0.10))
  }

  test("drift rule: the r16 driver window (0.110 -> 0.162, +47%) is refused") {
    // This exact pair passed noisy=false under the r16 rule while the
    // manual protocol refused sweeps with comparable drift (r15 sweep 6:
    // 0.11 -> 0.21). The flag must now adjudicate it the same way.
    assert(Bench.noisyVerdict(0.110, 0.162))
  }

  test("drift rule boundary: +30% drift passes, just above refuses") {
    assert(!Bench.noisyVerdict(0.20, 0.26)) // exactly 1.3x: not above
    assert(Bench.noisyVerdict(0.20, 0.2601))
  }

  test("sub-jitter canary: hundredths-of-a-second readings never trip") {
    // Both rules floor the denominator at 0.05 s so timer jitter on a
    // near-zero canary cannot manufacture a refusal.
    assert(!Bench.noisyVerdict(0.010, 0.060))
    assert(!Bench.noisyVerdict(0.030, 0.020))
  }

  test("r15 sweep-6 style doubling is refused") {
    assert(Bench.noisyVerdict(0.11, 0.21))
  }

  test("retime burst witness: the s3-sweep2 upward re-reads all fire") {
    // Live pairs from the r17 window that passed the canary bracket
    // (0.15/0.11) while carrying a mid-sweep burst: an immediate retime
    // of the same compiled plan reading >1.5x ABOVE its original can
    // only be host state.
    assert(Bench.retimeBurst(1.92, 4.12)) // q_semdedup_delete
    assert(Bench.retimeBurst(2.85, 5.35)) // q_lpa_incremental
    assert(Bench.retimeBurst(2.52, 4.10)) // q_dedup_span_stats
    assert(Bench.retimeBurst(2.59, 3.92)) // s_watermark_late
  }

  test("retime burst witness: clean-window upward jitter does not fire") {
    // The largest upward pair in the same binary's clean sweep.
    assert(!Bench.retimeBurst(1.78, 2.03)) // q_minhash_rebuild, 1.14x
    // DOWNWARD retimes (the normal noise-strip direction) never fire.
    assert(!Bench.retimeBurst(16.21, 2.13)) // q_math_funcs
    // Sub-jitter floor: pairs under the 0.3 s floor are timer noise.
    assert(!Bench.retimeBurst(0.10, 0.40))
    assert(Bench.retimeBurst(0.10, 0.46)) // above 1.5x of the floor
  }

  test("window verdict: three distinct burst witnesses refuse, two do not") {
    assert(!Bench.burstNoisyVerdict(0))
    assert(!Bench.burstNoisyVerdict(2))
    assert(Bench.burstNoisyVerdict(3))
    assert(Bench.burstNoisyVerdict(4)) // the refused s3-sweep2 count
  }
}
