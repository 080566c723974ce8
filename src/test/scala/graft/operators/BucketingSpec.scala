package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Bucketing

/** The point of bucketing is the PLAN: a fact⋈fact join over two tables
  * bucketed on their join keys must run with zero shuffle exchanges (and
  * zero sorts, since the buckets are sorted on write). These tests pin
  * that property — the value-correctness of q132 is the oracle's job.
  * (BucketedJoinSpec pins the same contract on the UMLS fixture tables.)
  */
class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def withSmj[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("cojoin of two bucketed tables plans with zero shuffle exchanges " +
    "and zero sorts") {
    withSmj {
      val left = (1 to 100).map(i => (i.toLong % 10, s"l$i"))
        .toDF("k", "lv")
      val right = (1 to 40).map(i => (i.toLong % 10, s"r$i"))
        .toDF("j", "rv")
      val joined = Bucketing.cojoin(left, "k", right, "j", nBuckets = 4,
        dir = "/tmp/graft_bucketed_spec")
      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      val sorts = plan.collect { case s: SortExec => s }
      assert(shuffles.isEmpty,
        s"expected exchange-free bucketed join, got:\n$plan")
      assert(sorts.isEmpty,
        s"expected sort-free bucketed join (sorted buckets), got:\n$plan")
      // and the join is still correct: 10 keys × (10 left × 4 right) each
      assert(joined.count() === 400L)
    }
  }

  test("cojoin registers its tables and reclaimStale drops them + " +
    "deletes the bucketed copies (no per-cycle accumulation)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bkt_reclaim").toString
    val left = Seq((1L, "a"), (2L, "b")).toDF("k", "lv")
    val right = Seq((1L, "x"), (2L, "y")).toDF("j", "rv")
    val before = spark.catalog.listTables().collect().map(_.name).toSet
    val joined = Bucketing.cojoin(left, "k", right, "j", nBuckets = 2,
      dir = dir)
    assert(joined.count() === 2L) // drain the lazy consumer first
    val tables = spark.catalog.listTables().collect()
      .map(_.name).filter(t => t.startsWith("graft_bkt_") && !before(t))
    assert(tables.length === 2,
      s"cojoin should have registered two catalog tables: ${tables.toSeq}")
    // scoped sweep: reclaim only THIS test's tables so parallel suites'
    // in-flight cojoins keep their backing data
    val reclaimed = Bucketing.reclaimStale(spark, graceMs = 0L,
      only = Some(tables.toSet))
    assert(reclaimed === 2, s"expected 2 reclaimed, got $reclaimed")
    val after = spark.catalog.listTables().collect()
      .map(_.name).filter(t => tables.contains(t))
    assert(after.isEmpty, s"tables survived reclaim: ${after.toSeq}")
    val leftovers = new java.io.File(dir).listFiles()
    assert(leftovers == null || leftovers.isEmpty,
      s"bucketed copies survived reclaim: ${leftovers.toSeq}")
  }

  test("writeBucketedAt round-trips values and is re-entrant (overwrite)") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Bucketing.writeBucketedAt(df, "graft_bkt_t", "/tmp/graft_bkt_t", "k", 2)
    Bucketing.writeBucketedAt(df, "graft_bkt_t", "/tmp/graft_bkt_t", "k", 2)
    val back = spark.table("graft_bkt_t").orderBy("k")
      .as[(Long, String)].collect().toSeq
    assert(back === Seq((1L, "a"), (2L, "b")))
  }
}
