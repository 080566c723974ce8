package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The lineage-cut strategy switch: localCheckpoint by default, reliable
  * checkpoint() under `spark.graft.checkpoint.reliable=true` — the
  * elastic-cluster path where executor loss must cost a re-read, not the
  * job. */
class MaterializeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("default cut localCheckpoints: values preserved, lineage truncated") {
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .filter($"id" % 2 === 0)
    val cut = Materialize.cut(df)
    assert(cut.count() === 50)
    assert(cut.collect().map(_.getLong(0)).toSet ===
      (2 to 100 by 2).map(_.toLong).toSet)
    // lineage is cut: the materialized plan scans an RDD, not the source
    assert(cut.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
  }

  test("reliable=true without a checkpoint dir fails fast with the " +
    "config hint") {
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      val e = intercept[IllegalArgumentException] {
        Materialize.cut(Seq((1L, "a")).toDF("id", "v"))
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    } finally spark.conf.unset("spark.graft.checkpoint.reliable")
  }

  test("a non-boolean reliable value fails with a message NAMING the " +
    "config key, not a bare NumberFormat-style error") {
    spark.conf.set("spark.graft.checkpoint.reliable", "1")
    try {
      val e = intercept[IllegalArgumentException] {
        Materialize.cut(Seq((1L, "a")).toDF("id", "v"))
      }
      assert(e.getMessage.contains("spark.graft.checkpoint.reliable"))
      assert(e.getMessage.contains("'1'"))
    } finally spark.conf.unset("spark.graft.checkpoint.reliable")
  }

  test("localCheckpoint under dynamic allocation warns once (r19 " +
    "verdict #7: scale-in loses unrecomputable blocks); static " +
    "clusters stay silent") {
    // spark.dynamicAllocation.enabled is a launch-time core conf Spark
    // refuses to set on a running session, so the warning path is
    // driven directly with the boolean cut() reads from the launch conf.
    try {
      Materialize.resetElasticWarning()
      val err = new java.io.ByteArrayOutputStream()
      val old = System.err
      System.setErr(new java.io.PrintStream(err))
      try {
        Materialize.maybeWarnElastic(dynamicAllocation = false)
        assert(err.toString.isEmpty, "static cluster must stay silent")
        Materialize.maybeWarnElastic(dynamicAllocation = true)
        Materialize.maybeWarnElastic(dynamicAllocation = true) // once only
      } finally System.setErr(old)
      val msgs = err.toString
      assert(msgs.contains("graft.Materialize"), msgs)
      assert(msgs.contains("spark.graft.checkpoint.reliable"), msgs)
      assert(msgs.split("graft\\.Materialize").length == 2,
        s"warning must fire exactly once:\n$msgs")
      // the production cut() on this (static) test cluster is silent
      Materialize.resetElasticWarning()
      val err2 = new java.io.ByteArrayOutputStream()
      System.setErr(new java.io.PrintStream(err2))
      try Materialize.cut(Seq((1L, "a")).toDF("id", "v")).count()
      finally System.setErr(old)
      assert(!err2.toString.contains("graft.Materialize"), err2.toString)
    } finally Materialize.resetElasticWarning()
  }

  test("reliable=true with a checkpoint dir uses reliable checkpoint(): " +
    "values preserved, lineage truncated") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      val df = (1 to 40).map(i => (i.toLong, i * 2.0)).toDF("id", "d")
        .filter($"id" > 10)
      val cut = Materialize.cut(df)
      assert(cut.count() === 30)
      assert(cut.queryExecution.optimizedPlan.toString
        .contains("LogicalRDD"))
      // the reliable path actually wrote checkpoint data to the dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally {
      spark.conf.unset("spark.graft.checkpoint.reliable")
    }
  }
}
