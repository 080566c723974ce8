package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PlanAudit must see through AQE and report the facts the 100 TB
  * checklist cares about: pushdown reached the scan, columns pruned,
  * shuffles counted, global windows flagged.
  */
class PlanAuditSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_audit").toString
    (1 to 100).map(i => (i.toLong, s"n$i", i * 2.0))
      .toDF("id", "name", "score")
      .write.mode("overwrite").parquet(s"$d/t")
    s"$d/t"
  }

  test("scans reports pushed filters and pruned read columns") {
    val q = spark.read.parquet(dir)
      .filter(col("id") > 50).select("id", "score")
    val s = PlanAudit.scans(q)
    assert(s.size === 1)
    assert(s.head.readColumns.toSet === Set("id", "score")) // name pruned
    assert(s.head.pushedFilters.exists(_.contains("GreaterThan")),
      s.head.pushedFilters.mkString("; "))
  }

  test("summary counts shuffles/broadcasts through the AQE wrapper and " +
    "flags global windows") {
    val t = spark.read.parquet(dir)
    val agg = t.groupBy("name").count()
    val sAgg = PlanAudit.summary(agg)
    assert(sAgg.shuffles >= 1)
    assert(sAgg.globalWindows === 0)

    import org.apache.spark.sql.expressions.Window
    val bad = t.withColumn("rn",
      row_number().over(Window.orderBy("id"))) // deliberate global window
    val sBad = PlanAudit.summary(bad)
    assert(sBad.windows === 1 && sBad.globalWindows === 1)

    val keyed = t.withColumn("rn",
      row_number().over(Window.partitionBy("name").orderBy("id")))
    val sKeyed = PlanAudit.summary(keyed)
    assert(sKeyed.windows === 1 && sKeyed.globalWindows === 0)
  }

  test("an unfiltered full-column scan reports no pushdown and no " +
    "pruning — the audit doesn't invent good news") {
    val q = spark.read.parquet(dir)
    val s = PlanAudit.scans(q)
    assert(s.head.readColumns.toSet === Set("id", "name", "score"))
    assert(s.head.pushedFilters.isEmpty)
  }

  test("summary still sees exchanges AFTER the query has executed " +
    "(AQE folds them into query stages)") {
    val q = spark.read.parquet(dir).groupBy("name").count()
    q.collect() // materialize: exchanges become ShuffleQueryStageExec
    val s = PlanAudit.summary(q)
    assert(s.shuffles >= 1,
      s"executed plan lost its shuffles: $s")
  }

  test("summaryDf renders the audit as one row") {
    val q = spark.read.parquet(dir).groupBy("name").count()
    val row = PlanAudit.summaryDf(q).collect()(0)
    assert(row.getAs[Int]("fileScans") === 1)
  }
}
