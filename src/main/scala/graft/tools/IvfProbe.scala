package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-mode probe of the IVF assignment projection — the diagnosis
  * main behind the r17 ArgMinCentroid rewrite (same role ProfileQ62
  * played for the writeIndex regression). Replays exactly the streaming
  * ivf_assign leg's per-batch work (250k rows, dim-64 synthesized
  * embedding, 64 centroids) as a plain batch projection, three passes so
  * the warm JIT cost separates from the steady cost:
  *
  *   sbt 'runMain graft.tools.IvfProbe'
  *
  * History: the `aggregate(array(k structs))` fold measured 6.1 s warm
  * per 250k rows THREAD-INDEPENDENT (local[8] ≈ local[16] ≈ local[32])
  * and heap-invariant — the interpreted-HOF + allocation wall, with the
  * embedding child re-evaluated once per centroid. The codegen'd
  * [[graft.functions.ArgMinCentroid]] runs the same batch in 0.43 s
  * warm (14x) and lifted the streaming leg 43k → 583k ev/s. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions
      .withMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(0, 250000, 1, 32)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), " +
          "j -> cast(sin(id * 7 + j) as float))").as("embedding"))
    val assigned = graft.operators.IvfIndex.withCluster(df,
      graft.operators.IvfIndex.portableCentroids(64, 64))
      .select("vec_id", "cluster")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      assigned.queryExecution.toRdd.count()
      println(f"batch pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
