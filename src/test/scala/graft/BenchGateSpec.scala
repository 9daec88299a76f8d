package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bytes-aware regression gate (VERDICT r15 #2): the decision
  * that splits a wall-time flag into "the plan did more work" (Regressed)
  * vs "same plan, drifting clock" (DriftSuspect) must be a pure function
  * with its thresholds spec-locked, so a deliberate plan change and a
  * synthetic noisy rerun land in different categories. */
class BenchGateSpec extends AnyFunSuite {
  import Bench.{Flag, classify}

  private val MiB = 1L << 20

  test("deliberate plan change — wall AND bytes up — classifies Regressed") {
    // e.g. a probe width bump: 1.5x wall, 2x shuffle bytes
    assert(classify(3.0, Some(2.0), Some(200 * MiB), Some(100 * MiB)) == Flag.Regressed)
  }

  test("noisy rerun — wall up, bytes flat — classifies DriftSuspect") {
    // the r10/r13/r15 closing-run pattern: wall doubles, plan unchanged
    assert(classify(4.0, Some(2.0), Some(100 * MiB), Some(100 * MiB)) == Flag.DriftSuspect)
    // bytes within the 10% AQE jitter band still count as flat
    assert(classify(4.0, Some(2.0), Some(109 * MiB), Some(100 * MiB)) == Flag.DriftSuspect)
  }

  test("wall inside the gate is Clean regardless of bytes") {
    assert(classify(2.5, Some(2.0), Some(300 * MiB), Some(100 * MiB)) == Flag.Clean)
    // >1.3x ratio but <=0.5 s absolute: micro-query jitter stays Clean
    assert(classify(0.30, Some(0.10), Some(300 * MiB), Some(100 * MiB)) == Flag.Clean)
  }

  test("new query (no wall baseline) is Clean") {
    assert(classify(10.0, None, Some(300 * MiB), None) == Flag.Clean)
  }

  test("missing bytes on either side cannot exonerate — Regressed") {
    assert(classify(4.0, Some(2.0), None, Some(100 * MiB)) == Flag.Regressed)
    assert(classify(4.0, Some(2.0), Some(100 * MiB), None) == Flag.Regressed)
    assert(classify(4.0, Some(2.0), None, None) == Flag.Regressed)
  }

  test("bytes gate needs BOTH >10% deviation and >1 MiB absolute") {
    // broadcast-only micro-query: bytes near zero, 3x ratio but <1 MiB
    assert(!Bench.bytesMoved(300 * 1024, 100 * 1024))
    // large absolute move under 10% ratio: flat (AQE jitter band)
    assert(!Bench.bytesMoved(105 * MiB, 100 * MiB))
    assert(Bench.bytesMoved(120 * MiB, 100 * MiB))
  }

  test("documented AQE bimodality: wall flag on the alternate plan mode is DriftSuspect") {
    // DEDUPSCALE5_r16 / VERDICT r16 #3: dedup_ngram flips between a
    // 8.48 MB and a 16.57 MB plan; the committed baseline is the large
    // mode. A wall flag landing on the SMALL plan reads bytes ~49% below
    // baseline — without the bimodality note that is a Regressed page on
    // pure AQE noise; with it, DriftSuspect (rerun).
    val alt = Bench.bimodalShuffle("dedup_ngram")
    assert(classify(6.0, Some(3.268), Some(8475842L), Some(16570504L), alt)
      == Flag.DriftSuspect)
    // within the 10% band of the alternate mode still counts
    assert(classify(6.0, Some(3.268), Some(9000000L), Some(16570504L), alt)
      == Flag.DriftSuspect)
    // bytes matching NEITHER mode remain Regressed — the note never
    // blankets the query
    assert(classify(6.0, Some(3.268), Some(33000000L), Some(16570504L), alt)
      == Flag.Regressed)
    assert(classify(6.0, Some(3.268), Some(2000000L), Some(16570504L), alt)
      == Flag.Regressed)
    // and a query with no note behaves exactly as before (default arg)
    assert(classify(6.0, Some(3.268), Some(8475842L), Some(16570504L))
      == Flag.Regressed)
    // r17: the pair-leg sharers flip the SAME plan (DEDUPSCALE5_r17 §4
    // caught dedup_cc_keepers at 9.22 MB and dedup_cc_star at 9.24 MB) —
    // a wall flag on their small-plan mode must also rerun, not page
    assert(classify(8.0, Some(3.821), Some(9219897L), Some(16697842L),
      Bench.bimodalShuffle("dedup_cc_keepers")) == Flag.DriftSuspect)
    assert(classify(8.0, Some(4.093), Some(9240477L), Some(16723109L),
      Bench.bimodalShuffle("dedup_cc_star")) == Flag.DriftSuspect)
  }

  test("a shuffle-for-recompute trade (bytes DROP, wall up) classifies Regressed") {
    // e.g. a join flipped to broadcast nested loop: wall 0.9 -> 4.5 s,
    // shuffle 50 MB -> ~0 — a bytes drop is a plan change, not drift
    assert(Bench.bytesMoved(0, 50 * MiB))
    assert(classify(4.5, Some(0.9), Some(0L), Some(50 * MiB)) == Flag.Regressed)
    // within the band in the downward direction stays flat
    assert(!Bench.bytesMoved(95 * MiB, 100 * MiB))
  }
}
