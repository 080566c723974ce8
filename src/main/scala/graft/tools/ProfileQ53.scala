package graft.tools

import org.apache.spark.sql.SparkSession
import graft.catalog.Queries

/** Throwaway profiling harness: time individual catalog queries by name
  * with a warm JVM. Not part of the catalog. */
object ProfileQ53 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$d/documents.parquet").count()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q53_dedup_incremental", "q53b_dedup_incremental_fast")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = Queries.byName(name)(spark, d).queryExecution.toRdd.count()
      System.err.println(
        f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($n rows)")
    }
    spark.stop()
  }
}
