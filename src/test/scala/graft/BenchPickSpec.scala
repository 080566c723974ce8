package graft

import org.scalatest.funsuite.AnyFunSuite

/** Retry-pass sample pick policy (Bench.pickSampleIndex) — the r14 fix
  * for the r13 headline distortion: when every sample of an entry
  * tripped the exec-inflation gate, the old (inflated, contended,
  * foreign, wall) key let a 64.3 s wall beat a 14.1 s one on a
  * marginally-lower foreign load. The policy under test: health class
  * (inflated, then contended) ranks first, WALL ranks within an equal
  * class, foreign load last. Tuples are
  * (inflated, contended, wall, foreign). */
class BenchPickSpec extends AnyFunSuite {

  test("all-inflated sample set picks the minimum wall, not the " +
      "minimum foreign load (the r13 q37 driver-window shape)") {
    // exec 13.7/34.3/54.0 s all > 3x quiet 3.3 s — walls 14.15, 34.9,
    // 64.26; foreign loads 3.67, 2.9, 2.32 (decreasing — the old key's
    // trap: min foreign = WORST wall)
    val samples = Seq(
      (true, false, 14.15, 3.67),
      (true, false, 34.90, 2.90),
      (true, false, 64.26, 2.32))
    assert(Bench.pickSampleIndex(samples) === 0)
  }

  test("a healthy sample beats any inflated one regardless of wall") {
    val samples = Seq(
      (true, false, 1.0, 0.0),
      (false, false, 5.0, 0.5))
    assert(Bench.pickSampleIndex(samples) === 1)
  }

  test("inflated ranks worse than contended (closer to a true " +
      "engine-time signal loss)") {
    val samples = Seq(
      (true, false, 2.0, 0.0),
      (false, true, 9.0, 11.0))
    assert(Bench.pickSampleIndex(samples) === 1)
  }

  test("within an equal healthy class, wall decides; foreign is only " +
      "the final tiebreak") {
    val byWall = Seq(
      (false, false, 3.2, 0.1),
      (false, false, 2.9, 2.0))
    assert(Bench.pickSampleIndex(byWall) === 1)
    val byForeign = Seq(
      (false, false, 3.0, 2.0),
      (false, false, 3.0, 0.1))
    assert(Bench.pickSampleIndex(byForeign) === 1)
  }

  test("all-contended set picks minimum wall too") {
    val samples = Seq(
      (false, true, 20.7, 22.3),
      (false, true, 35.1, 9.0))
    assert(Bench.pickSampleIndex(samples) === 0)
  }

  test("single sample is index 0") {
    assert(Bench.pickSampleIndex(Seq((true, true, 9.9, 9.9))) === 0)
  }

  // --- anomaly attribution tiers (Bench.attributionTier) -----------------
  // args: (inflation, env = steal+iowait, jit, foreignSec)

  test("attribution: each single cover fully explaining the inflation " +
      "wins its own tier, in env > jit > env+foreign order") {
    assert(Bench.attributionTier(2.0, 2.5, 0.0, 0.0)
      === "steal_attributed")
    assert(Bench.attributionTier(2.0, 0.0, 2.5, 0.0) === "jit_attributed")
    assert(Bench.attributionTier(2.0, 1.2, 0.0, 1.0)
      === "foreign_load_attributed")
  }

  test("attribution tiers are monotone: inflation fully covered only by " +
      "env+jit+foreign COMBINED reads combined_attributed, never a " +
      "partial tier (the r16 ADVICE #2 gap)") {
    // each pair sums below 3.0; all three sum to 3.3 >= 3.0
    assert(Bench.attributionTier(3.0, 1.2, 1.1, 1.0)
      === "combined_attributed")
    // and there IS a full-coverage tier for env+jit with zero foreign
    // (the combination the old chain lacked entirely)
    assert(Bench.attributionTier(3.0, 1.6, 1.6, 0.0)
      === "combined_attributed")
  }

  test("attribution: half-coverage partial tiers, then unexplained") {
    assert(Bench.attributionTier(4.0, 2.1, 0.0, 0.0) === "steal_partial")
    assert(Bench.attributionTier(4.0, 0.5, 1.0, 0.8)
      === "jit_foreign_partial")
    assert(Bench.attributionTier(4.0, 0.3, 0.5, 0.5) === "unexplained")
  }

  // --- soft-anomaly gate with the sub-second baseline floor ---------------
  // args: (sampleExec, profileExec)

  test("softAnomalyGate: sub-second profile entries use the 1 s floor — " +
      "q164-class jitter (0.5 s quiet, 1.5 s sample) no longer flags; " +
      "a genuine >2 s signal on the same entry still does") {
    assert(!Bench.softAnomalyGate(1.5, 0.5)) // old gate fired here
    assert(!Bench.softAnomalyGate(2.0, 0.5)) // exactly 2x floor: no
    assert(Bench.softAnomalyGate(2.3, 0.5))  // past both floor margins
  }

  test("softAnomalyGate: entries with a >=1 s profile keep the original " +
      "2x semantics (the >1 s-inflation arm is implied once the base " +
      "is >= 1: s > 2*base means s - base > base >= 1)") {
    assert(Bench.softAnomalyGate(8.1, 3.5))
    assert(!Bench.softAnomalyGate(6.9, 3.5)) // under 2x
    assert(Bench.softAnomalyGate(2.9, 1.4))  // 2.07x of a 1.4 s base
  }

  // --- window quality (Bench.windowQuality) -------------------------------
  // args: (loadStart, stealTotalSec, foreignMean)

  test("windowQuality: the r16 driver window (load 7.06, material steal) " +
      "reads degraded; the same-day quiet quartet reads quiet") {
    assert(Bench.windowQuality(7.06, 35.0, 1.2) === "degraded")
    assert(Bench.windowQuality(1.4, 0.0, 0.1) === "quiet")
  }

  test("windowQuality: each input alone can degrade or noisy the window") {
    assert(Bench.windowQuality(6.0, 0.0, 0.0) === "degraded")
    assert(Bench.windowQuality(0.5, 31.0, 0.0) === "degraded")
    assert(Bench.windowQuality(0.5, 0.0, 2.0) === "degraded")
    assert(Bench.windowQuality(4.5, 0.0, 0.0) === "noisy")
    assert(Bench.windowQuality(0.5, 6.0, 0.0) === "noisy")
    assert(Bench.windowQuality(0.5, 0.0, 1.5) === "noisy")
  }

  test("windowQualityReason names the predicate(s) that fired at the " +
      "tier that fired, 'none' for quiet (r18 verdict #3: anchor " +
      "selection and lockstep corroboration key on evidence, not the " +
      "label)") {
    assert(Bench.windowQualityReason(1.4, 0.0, 0.1) === "none")
    assert(Bench.windowQualityReason(4.5, 0.0, 0.0) === "load_start>=4")
    assert(Bench.windowQualityReason(0.5, 6.0, 0.0) === "steal>5")
    assert(Bench.windowQualityReason(0.5, 0.0, 1.5) === "foreign>=1")
    assert(Bench.windowQualityReason(6.0, 0.0, 0.0) === "load_start>=6")
    assert(Bench.windowQualityReason(0.5, 31.0, 0.0) === "steal>30")
    assert(Bench.windowQualityReason(0.5, 0.0, 2.0) === "foreign>=2")
    // degraded tier reports only degraded-tier predicates, joined
    assert(Bench.windowQualityReason(7.06, 35.0, 1.2) ===
      "load_start>=6+steal>30")
    // noisy tier: multiple noisy predicates join too
    assert(Bench.windowQualityReason(4.5, 6.0, 0.0) ===
      "load_start>=4+steal>5")
  }
}
