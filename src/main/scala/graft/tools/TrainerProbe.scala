package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-attribution probe for the BPE trainer entries (r19): q185/q188
  * (local route) and q211 (batched-distributed route) carry walls of
  * 5-8 s against 2-5 s of executor-scheduled time — the gap is driver
  * work, and this probe splits it into the phases the wall could hide
  * in:
  *
  *   - `wordTable` — the one distributed corpus pass (count action);
  *   - `collect`   — pulling the vocabulary-bounded (w, freq) table;
  *   - `trainLocal`— the driver-local incremental merge loop;
  *   - `emit`      — merge list → DataFrame → orderBy → toRdd.count
  *     (what the bench times beyond training);
  *   - `distributed` — the full q211-config batched-distributed route,
  *     end to end, for comparison.
  *
  * Two passes per phase so JIT warmup separates from steady cost.
  *
  *   sbt 'runMain graft.tools.TrainerProbe'
  */
object TrainerProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions
      .withMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.catalog.Tables.documents(spark, d)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    docs.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    for (pass <- 1 to 2) {
      System.err.println(s"[probe] ---- pass $pass ----")
      val words = time("wordTable+checkpoint")(
        graft.operators.Tokenizer
          .wordTable(docs, "text", 3).localCheckpoint())
      time("count")(words.count())
      val wf = time("collect")(words.select("w", "freq").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq)
      System.err.println(s"[probe] words: ${wf.size}")
      val merges1200 = time("trainLocal(1200)")(
        graft.operators.Tokenizer.bpeTrainLocal(wf, 1200))
      time("trainLocal(12000)")(
        graft.operators.Tokenizer.bpeTrainLocal(wf, 12000))
      time("emit(1200)") {
        import spark.implicits._
        merges1200.zipWithIndex
          .map { case ((a, b), i) => (i, a, b, a + b) }
          .toDF("step", "left", "right", "merged")
          .orderBy("step").queryExecution.toRdd.count()
      }
      // (no unpersist: localCheckpoint blocks are not released by
      // unpersist — they free when the frame is GC'd; r19 ADVICE)
      time("distributed(q211 config)")(
        graft.operators.Tokenizer
          .bpeMergeTableDistributed(docs, numMerges = 1200,
            wordsPerUnit = 3, topPairs = 8000, maxActivePairs = 8000,
            activeWordCap = 30000)
          .orderBy("step").queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
