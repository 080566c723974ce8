package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-mode probe of the per-row SimHash projection
  * ([[graft.operators.Dedup.rowSimhash64]]) — the streaming near-dup
  * ingest path's signature cost (every arriving doc is hashed before
  * `dropDuplicatesWithinWatermark`), and the same diagnosis-main role
  * [[IvfProbe]]/[[PqProbe]] played for the IVF/PQ folds. Replays the
  * projection over 250k synthesized ~40-word docs, three passes so warm
  * JIT separates from steady cost:
  *
  *   sbt 'runMain graft.tools.SimHashProbe'
  *
  * History (this host, local[32]): the 64-interpreted-folds-per-row
  * Column form measured 2.60-3.09 s warm per 250k docs; the codegen'd
  * [[graft.functions.SimHash64]] expression runs the same pass in
  * 0.62-0.75 s (4.2x) — the vote fold, not the shingle feature build,
  * was the dominant cost.
  */
object SimHashProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions
      .withMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(0, 250000, 1, 32)
      .select(col("id").as("doc_id"),
        expr("array_join(transform(sequence(0, 39), " +
          "j -> concat('w', pmod(id * 31 + j * 7, 997))), ' ')").as("text"))
    val hashed = df.select(col("doc_id"),
      graft.operators.Dedup.rowSimhash64(col("text")).as("simhash"))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      hashed.queryExecution.toRdd.count()
      println(f"simhash pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
