package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
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

  /** Every node of the final physical plan, descending through AQE's
    * wrapper AND through materialized query stages — after a query has
    * RUN under AQE, its exchanges live inside Shuffle/BroadcastQueryStage
    * leaves, where a plain `collect` never looks (an executed plan would
    * otherwise audit as shuffle-free). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val below: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: below.flatMap(flatten)
  }

  private def nodes(df: DataFrame): Seq[SparkPlan] =
    flatten(df.queryExecution.executedPlan)

  /** One [[ScanAudit]] per parquet/file scan in the plan: the columns
    * the scan will READ (pruning check) and the filters PUSHED into it
    * (pushdown check). An empty `pushedFilters` on a filtered query
    * means the filter runs post-scan — the classic full-read bug. */
  def scans(df: DataFrame): Seq[ScanAudit] =
    nodes(df).collect { case s: FileSourceScanExec =>
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
    val all = nodes(df)
    val windows = all.collect { case w: WindowExec => w }
    PlanSummary(
      fileScans = all.count(_.isInstanceOf[FileSourceScanExec]),
      scansWithPushdown = scans(df).count(_.pushedFilters.nonEmpty),
      shuffles = all.count(_.isInstanceOf[ShuffleExchangeExec]),
      broadcasts = all.count(_.isInstanceOf[BroadcastExchangeExec]),
      sorts = all.count(_.isInstanceOf[SortExec]),
      windows = windows.size,
      globalWindows = windows.count(_.partitionSpec.isEmpty),
      cartesianProducts = all.count(_.isInstanceOf[CartesianProductExec]),
      codegenSpans = all.count(_.isInstanceOf[WholeStageCodegenExec]))
  }

  /** The audit as a 1-row DataFrame, for logging next to job metrics. */
  def summaryDf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Seq(summary(df)).toDF()
  }
}
