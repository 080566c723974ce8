package graft

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Drives the full [[ScaleStressJdbc]] plane at its minimum factor
  * (100 → 30k/300k-row rounds) so the planted-gate algebra — exact
  * stride per-partition counts, the F1 pushdown proof (PushedFilters +
  * scan numOutputRows == planted), rangeSplit complete-and-disjoint,
  * per-SAB aggregate counts, the linearity guard — is proven in
  * `sbt test` before a factor-1000 run spends minutes on it (the
  * [[ScaleStressAssemblySpec]] discipline). Builds a real file-backed
  * Derby and reads it back through the jar subprotocol, exactly as the
  * factor-1000 and multi-JVM runs do. */
class ScaleStressJdbcSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("jdbc scale plane: all planted gates hold at factor 100") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_jdbc_spec").toString
    val steps = ArrayBuffer[(String, Double)]()
    val facts = ArrayBuffer[(String, Long)]()
    val violations = ArrayBuffer[String]()
    ScaleStressJdbc.run(spark, 100, work, steps, facts, violations)
    assert(violations.isEmpty, violations.mkString("; "))
    val fm = facts.toMap
    assert(fm("jdbc_rows_x100") == 300000L)
    assert(fm("jdbc_stride_partitions_x100") ==
      ScaleStressJdbc.NumStridePartitions.toLong)
    assert(fm("jdbc_stride_rows_per_partition_x100") == 18750L)
    // 8 of every 30 rows survive F1 by construction, and the SCAN
    // itself returned exactly that many (DB-side filtering)
    assert(fm("jdbc_f1_rows_x100") == 80000L)
    assert(fm("jdbc_f1_scan_rows_x100") == 80000L)
    assert(fm("jdbc_f1_rows_x10") == 8000L)
    assert(fm("jdbc_f1_scan_rows_x10") == 8000L)
    val names = steps.map(_._1).toSet
    for (s <- Seq("jdbc_build_x100", "jdbc_stride_scan_x100",
        "jdbc_f1_filtered_x100", "jdbc_rangesplit_scan_x100",
        "jdbc_agg_by_sab_x100"))
      assert(names.contains(s), s"step $s missing")
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(work))
  }
}
