package graft.tools

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

import scala.util.{Failure, Success, Try}

/** Dump `.explain("formatted")` of the q25e distributed-export WRITE
  * frame — the dataflow `OntologyWriter.writeDistributed` executes.
  * The catalog-level PlanDump only sees q25e's one-row REPORT frame
  * (the export runs eagerly inside the entry), so the writer's real
  * plan needs its own dump for the plans/r20 evidence pair.
  *
  * Mirrors the HEAD writer composition: columnar finishing
  * (conceptsColumnsTry — prefLabel selection inside whole-stage
  * codegen, per-term errors as a column) → render map → Materialize
  * .cut (the one materialization of the rendered terms) → global
  * orderBy over the checkpoint → error filter → trailing-newline
  * strip. Because the cut is EAGER, this dump shows the write frame
  * scanning a LogicalRDD/ExistingRDD instead of the live
  * assemble+render subtree — the sort's range sampler therefore
  * re-scans blocks, not the pipeline. A scratch twin at the
  * pre-change commit (per the documented worktree workflow) dumps the
  * r19 composition: the render map LIVE below the orderBy.
  *
  *   sbt 'runMain graft.tools.ExportPlanDump <outFile>'
  */
object ExportPlanDump {

  /** Local mirror of the sink's private RenderResult row shape. */
  final case class RR(code: String, text: String, dupLiteral: Long,
      dupObject: Long, dupSubclass: Long,
      properties: Seq[graft.model.TermProperty], error: String)

  /** Local mirror of the sink's private FinishedRow shape. */
  final case class FR(code: String, prefLabel: String,
      altLabels: Seq[String], defs: Seq[String], cuis: Seq[String],
      tuis: Seq[String], atts: Seq[graft.model.AttOut],
      rels: Seq[graft.model.RelOut], isRoot: Boolean,
      treeParents: Seq[String], __finish_err: String)

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: ExportPlanDump <outFile>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions
      .withMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val asm = graft.catalog.UmlsQueries.scaleAssembler(spark, d)()
    val cfg = graft.render.RenderConfig(ns = "http://x/", lang = "en",
      hierarchy = true, hasTree = false, dedupe = true,
      styUrl = "http://x/STY/")
    val renderOne: FR => RR = { f =>
      if (f.__finish_err != null)
        RR(f.code, null, 0, 0, 0, Nil,
          s"IllegalStateException: ${f.__finish_err}")
      else Try(graft.render.ConceptRenderer.render(
          graft.model.UmlsConceptRow(f.code, f.prefLabel, f.altLabels,
            f.defs, f.cuis, f.tuis, f.atts, f.rels, f.isRoot,
            f.treeParents), cfg)) match {
        case Success(t) => RR(t.code, t.text, t.dupLiteral, t.dupObject,
          t.dupSubclass, t.properties, null)
        case Failure(e) => RR(f.code, null, 0, 0, 0, Nil,
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    // HEAD composition: columnar finish → render → eager cut → sort.
    val frame = graft.operators.Materialize.cut(
        asm.conceptsColumnsTry()
          .as(Encoders.product[FR])
          .map(renderOne)(Encoders.product[RR]).toDF())
      .as(Encoders.product[RR])
      .orderBy("code")
      .filter(col("error").isNull)
      .select(expr("substring(text, 1, length(text) - 1)").as("value"))
    val plan = frame.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      plan.getBytes("UTF-8"))
    asm.unpersistShared()
    spark.stop()
  }
}
