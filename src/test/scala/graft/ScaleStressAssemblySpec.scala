package graft

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Drives the full [[ScaleStressAssembly]] plane at its minimum factor
  * (100 → 30k/300k-atom rounds) so the planted-gate algebra — exact
  * class counts, hot-class cardinalities, planted prefLabels, the
  * salted-twin multiset equality, byte-identical sample renders, the
  * linearity guard — is proven in `sbt test` before a factor-1000 run
  * spends minutes on it (the [[ScaleStressGraphSpec]] discipline). */
class ScaleStressAssemblySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("assembly scale plane: all planted gates hold at factor 100") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_asm_spec").toString
    val steps = ArrayBuffer[(String, Double)]()
    val facts = ArrayBuffer[(String, Long)]()
    val violations = ArrayBuffer[String]()
    ScaleStressAssembly.run(spark, 100, work, steps, facts, violations)
    assert(violations.isEmpty, violations.mkString("; "))
    val fm = facts.toMap
    assert(fm("assembly_classes_x100") == 29701L)
    assert(fm("assembly_atoms_x100") == 300000L)
    assert(fm("assembly_hot_atoms_x100") == 3000L)
    assert(fm("assembly_salted_diff_x10") == 0L)
    assert(fm("assembly_salted_diff_x100") == 0L)
    assert(fm("assembly_render_bytes_x100") > 0L)
    val names = steps.map(_._1).toSet
    for (s <- Seq("assembly_build_x100", "assembly_unsalted_x100",
        "assembly_gates_x100", "assembly_salted_x100",
        "assembly_equality_x100", "assembly_render_x100"))
      assert(names.contains(s), s"step $s missing")
    // reclaim the planted corpus
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(work))
  }
}
