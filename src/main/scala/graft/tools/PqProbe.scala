package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-mode probe of the PQ planes the r17 verdict named as the last
  * interpreted-HOF walls (`PqIndex.scala` encode fold + ADC
  * aggregate/zip_with pair) — the same diagnosis-main role [[IvfProbe]]
  * played for the ArgMinCentroid rewrite. Replays the q70-family work
  * shape at streaming-batch scale (250k rows, dim-64 synthesized
  * embedding, m=8 blocks, k=16 codes — the q70 configuration) as plain
  * batch projections, three passes per leg so warm-JIT cost separates
  * from steady cost:
  *
  *   sbt 'runMain graft.tools.PqProbe'
  *
  * Legs:
  *   - encode: the per-block argmin-code projection (m interpreted
  *     `aggregate(array(k structs))` folds per row before the rewrite);
  *   - adc_topk: full query path — encode + m LUT reads/row scored
  *     (`aggregate(zip_with(...))` twice before the rewrite) + candidate
  *     cut + exact re-rank.
  *
  * History (this host, local[32], two consistent quiet runs each): the
  * HOF forms measured 0.75-0.79 s warm per 250k-row encode and
  * 1.08-1.10 s per adc_topk; the codegen'd
  * [[graft.functions.PqEncode]] / [[graft.functions.AdcScore]]
  * expressions run the same legs in 0.19 s / 0.45 s warm (4.0x / 2.4x —
  * smaller than ArgMinCentroid's 14x because this config's fold is
  * m=8·k=16·sub=8 = 1/4 the flops of the IVF k=64·dim=64 leg, and the
  * adc_topk leg carries a fixed rerank/broadcast floor).
  */
object PqProbe {
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
    val books = graft.operators.PqIndex.portableCodebooks(m = 8, k = 16,
      sub = 8)
    val qVec = Array.tabulate(64)(j => math.sin(j * 3.0))

    val encoded = graft.operators.PqIndex.encode(df, books)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      encoded.queryExecution.toRdd.count()
      println(f"encode pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // fresh DataFrame per pass: BroadcastExchangeExec caches its built
    // relation (relationFuture is lazy), so re-collecting one plan
    // instance would skip the whole candidate subtree after pass 1
    for (i <- 1 to 3) {
      val topk = graft.operators.PqIndex.adcTopK(df, books, qVec,
        k = 10, refine = 20)
      val t0 = System.nanoTime()
      topk.collect()
      println(f"adc_topk pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
