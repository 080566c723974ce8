package graft.streaming

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.assemble.PropertyDocs
import graft.model.OntologyJob
import graft.render.SemanticTypes
import graft.sink.UmlsExportConfig
import graft.sources.UmlsSource

/** Delta stream in, per-SAB refreshed Turtle out. */
class IncrementalExportSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("a delta batch re-exports exactly the affected manifest SABs") {
    val source = UmlsSource.parquet(spark, "fixtures/umls")
    val outDir = Files.createTempDirectory("graft-inc").toString
    val jobs = Seq(OntologyJob("FIX", None, "fix.ttl", loadOnCuis = false))
    val conf = UmlsExportConfig(umlsVersion = "2025AA")
    val docs = PropertyDocs.collectMap(source.table("MRDOC"))
    val sems = SemanticTypes.generate(source.table("MRSTY"),
      conf.baseUri + "STY/", withRoots = false)

    val input = MemoryStream[String](spark)
    val batches = mutable.Buffer.empty[IncrementalExport.BatchResult]
    val q = IncrementalExport.start(spark, input.toDF().withColumnRenamed(
        "value", "SAB"),
      source, jobs, conf, outDir, docs, sems,
      onBatch = r => { batches += r; () })
    try {
      // batch 1: an unrelated SAB — nothing written
      input.addData("OTHER")
      q.processAllAvailable()
      assert(!Files.exists(Paths.get(s"$outDir/fix.ttl")))
      assert(batches.last.reports.isEmpty)

      // batch 2: FIX deltas — fix.ttl regenerated, matching the golden file
      input.addData("FIX", "FIX", "OTHER")
      q.processAllAvailable()
      assert(batches.last.reports.map(_.sab) === Seq("FIX"))
      assert(batches.last.reports.head.terms === 4)
      val got = new String(Files.readAllBytes(Paths.get(s"$outDir/fix.ttl")),
        java.nio.charset.StandardCharsets.UTF_8)
      val golden = {
        val in = getClass.getResourceAsStream("/golden/fix.ttl")
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      }
      assert(got === golden)
    } finally q.stop()
  }
}
