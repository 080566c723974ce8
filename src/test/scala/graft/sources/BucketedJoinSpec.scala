package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tools.UmlsFixtureGen

/** The co-located-join contract: two tables bucketed by their join keys
  * join WITHOUT any Exchange in the physical plan.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("bucketed MRCONSO ⋈ MRREL on CUI plans with zero shuffles") {
    val conso = spark.createDataFrame(
      spark.sparkContext.parallelize(UmlsFixtureGen.mrconso, 3),
      UmlsSource.schemaOf("MRCONSO"))
    val rel = spark.createDataFrame(
      spark.sparkContext.parallelize(UmlsFixtureGen.mrrel, 3),
      UmlsSource.schemaOf("MRREL"))

    Bucketing.writeBucketed(conso, "b_conso", "CUI", buckets = 4)
    Bucketing.writeBucketed(rel.withColumnRenamed("CUI2", "CUI"),
      "b_rel", "CUI", buckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // Disable broadcast so the plan exercises the sort-merge path a big
    // table would take — that's where bucketing removes the shuffles.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_conso")
        .join(spark.table("b_rel"), "CUI")
        .select("CUI", "AUI", "REL")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning") &&
        !plan.contains("ShuffleExchange"),
        s"bucketed join should not shuffle:\n${plan.take(1500)}")

      // and the result matches the unbucketed join
      val expected = conso.join(
        rel.withColumnRenamed("CUI2", "CUI"), "CUI")
        .select("CUI", "AUI", "REL")
        .collect().map(_.toSeq).sortBy(_.toString)
      val got = joined.collect().map(_.toSeq).sortBy(_.toString)
      assert(got.toSeq === expected.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_conso")
      spark.sql("DROP TABLE IF EXISTS b_rel")
    }
  }
}
