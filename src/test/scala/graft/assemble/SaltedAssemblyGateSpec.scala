package graft.assemble

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.UmlsQueries

/** CI gate for the q25t skew answer (VERDICT r5 #8): the salted skewed
  * assembly must stay within 1.5× of the UNIFORM assembly's wall time on
  * the same volume — the bench observation (q25t ≈ 1.2× q25s at sf0.1)
  * promoted to a hard gate. A RATIO is the load-robust form: both runs
  * execute back-to-back on the same host, so background contention
  * (which inflated two rounds of driver benches 4–8×) cancels instead of
  * flipping the gate. Data is the q25s/q25t construction at sf0.01 — the
  * skew share (~10% of atoms on one code) is scale-free, so the ratio
  * evidence transfers to the sf0.1 bench and the 100 TB design point.
  * Three attempts absorb one-off JIT/GC spikes; a salted path that
  * REGRESSED (e.g. lost its two-stage shape) fails all three.
  */
class SaltedAssemblyGateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  private def timeSec(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  test("skewed+salted assembly wall time stays within 1.5x of uniform",
      graft.PerfGate) {
    // A timing gate is only evidence on a sane host: cancel (don't fail)
    // when the fixture is absent (environment-bound path) or the machine
    // is already saturated — two driver rounds measured 4-8x wall-clock
    // inflation under contention, which would flip ANY timing assertion.
    assume(new java.io.File(sfDir).isDirectory,
      s"perf fixture $sfDir absent — skipping timing gate")
    val cores = Runtime.getRuntime.availableProcessors()
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    assume(load < 0 || load <= cores * 1.5,
      f"host load $load%.1f over ${cores} cores — timing evidence " +
        "meaningless, skipping (ratio gates survive moderate contention, " +
        "not saturation)")
    def runUniform(): Unit =
      new ConceptAssembler(spark,
        UmlsQueries.scaleSource(spark, sfDir), "BIG")
        .conceptsColumns().queryExecution.toRdd.count()
    def runSalted(): Unit =
      new ConceptAssembler(spark,
        UmlsQueries.scaleSource(spark, sfDir, hotEvery = 10), "BIG",
        saltBuckets = 8)
        .conceptsColumns().queryExecution.toRdd.count()
    runUniform() // warm codegen/parquet-reader paths off the clock
    var ratio = Double.MaxValue
    var attempts = 0
    val measured = Seq.newBuilder[(Double, Double)]
    while (ratio > 1.5 && attempts < 3) {
      val tu = timeSec(runUniform())
      val ts = timeSec(runSalted())
      measured += ((tu, ts))
      ratio = ts / tu
      attempts += 1
    }
    assert(ratio <= 1.5,
      s"salted skewed assembly no longer tracks uniform: attempts " +
        measured.result().map { case (u, s2) =>
          f"uniform $u%.2fs vs salted $s2%.2fs"
        }.mkString("; "))
  }
}
