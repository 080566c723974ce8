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
}
