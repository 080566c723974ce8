package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bloomSemiJoin equals the plain semi-join (false positives " +
    "verified away, duplicates on the right don't multiply)") {
    val left = (0L until 1000L).map(i => (i, s"row$i")).toDF("k", "payload")
    // right keys: every 7th, each listed twice (dup keys must not
    // duplicate left rows — semi-join semantics)
    val right = (0L until 1000L by 7).flatMap(k => Seq(k, k))
      .toDF("rk")
    val got = SkewJoin.bloomSemiJoin(left, right, "k", "rk")
      .select("k", "payload").collect().map(r => r.getLong(0)).sorted
    val expected = left.join(right.distinct(), col("k") === col("rk"),
      "left_semi").collect().map(r => r.getLong(0)).sorted
    assert(got.toSeq === expected.toSeq)
    assert(got.length === 143) // ceil(1000/7)
  }

  test("bloomSemiJoin plans the sketch probe as a filter on the left " +
    "scan, before the verify join") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold the
    // probe filter into the LocalTableScan and hide it from the plan
    val left = spark.range(500).select(col("id").as("k"))
    val right = spark.range(100).select((col("id") * 5).as("rk"))
    val p = SkewJoin.bloomSemiJoin(left, right, "k", "rk")
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(800))
    // the probe must sit under the join, on the left branch
    val joinIdx = p.indexOf("Join")
    val probeIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"probe not under the join: join@$joinIdx probe@$probeIdx")
    assert(SkewJoin.bloomSemiJoin(left, right, "k", "rk").count() === 100L)
    intercept[IllegalArgumentException] {
      SkewJoin.bloomSemiJoin(left, right, "k", "rk", fpp = 1.5)
    }
  }
}
