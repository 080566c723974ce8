package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of the at-rest dedup-index BUILD frame
  * (`Dedup.dedupIndex`, portable) — the q53-family plans themselves are
  * lineage-cut scans, so the fps⋈bands join this frame contains is not
  * visible in the catalog-level PlanDump output. Evidence artifact for
  * the r20 join-pre-explode change (plans/r20/dedup_index_*).
  *
  *   sbt 'runMain graft.tools.DedupIndexPlanDump <outFile>'
  */
object DedupIndexPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: DedupIndexPlanDump <outFile>")
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
    val docs = graft.catalog.Tables.documents(spark, d)
    val frame = graft.operators.Dedup.dedupIndex(docs, portable = true)
    val plan = frame.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      plan.getBytes("UTF-8"))
    spark.stop()
  }
}
