package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan audit as a library surface — the programmatic form of
  * the `.explain("formatted")` review this engine's development loop
  * runs on every operator. At 100 TB the difference between "the filter
  * reached the parquet scan" and "the filter runs after a full read" is
  * the job; this makes that checkable in code (CI, preflight gates)
  * instead of by eyeball.
  *
  * All inspection happens on the driver over the plan tree — nothing
  * here touches data.
  */
object PlanAudit {

  /** What one file scan will actually do. */
  final case class ScanAudit(
      location: String,
      readColumns: Seq[String],
      pushedFilters: Seq[String],
      partitionFilterCount: Int)

  /** Counts of the plan nodes that dominate cost at scale. */
  final case class PlanSummary(
      fileScans: Int,
      scansWithPushdown: Int,
      shuffles: Int,
      broadcasts: Int,
      sorts: Int,
      windows: Int,
      globalWindows: Int,
      cartesianProducts: Int,
      codegenSpans: Int)

  /** The final physical plan, descending through AQE's wrapper (whose
    * `collect` would otherwise stop at the adaptive root). */
  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  /** One [[ScanAudit]] per parquet/file scan in the plan: the columns
    * the scan will READ (pruning check) and the filters PUSHED into it
    * (pushdown check). An empty `pushedFilters` on a filtered query
    * means the filter runs post-scan — the classic full-read bug. */
  def scans(df: DataFrame): Seq[ScanAudit] =
    physical(df).collect { case s: FileSourceScanExec =>
      ScanAudit(
        s.metadata.getOrElse("Location", "?"),
        s.output.map(_.name),
        s.metadata.get("PushedFilters").toSeq
          .flatMap(_.stripPrefix("[").stripSuffix("]").split(",\\s*"))
          .filter(f => f.nonEmpty && f != "[]"),
        s.partitionFilters.size)
    }

  /** Node-count summary of the cost drivers. `globalWindows` counts
    * Window execs with NO partition spec — the single-task collapse this
    * repo's PlanShapeSpec bans from every operator. */
  def summary(df: DataFrame): PlanSummary = {
    val p = physical(df)
    val scansL = p.collect { case s: FileSourceScanExec => s }
    val windows = p.collect { case w: WindowExec => w }
    PlanSummary(
      fileScans = scansL.size,
      scansWithPushdown = scans(df).count(_.pushedFilters.nonEmpty),
      shuffles = p.collect { case e: ShuffleExchangeExec => e }.size,
      broadcasts = p.collect { case e: BroadcastExchangeExec => e }.size,
      sorts = p.collect { case s: SortExec => s }.size,
      windows = windows.size,
      globalWindows = windows.count(_.partitionSpec.isEmpty),
      cartesianProducts =
        p.collect { case c: CartesianProductExec => c }.size,
      codegenSpans = p.collect { case w: WholeStageCodegenExec => w }.size)
  }

  /** The audit as a 1-row DataFrame, for logging next to job metrics. */
  def summaryDf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Seq(summary(df)).toDF()
  }
}
