package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for q183b's bimodal scheduled-exec (r17 verdict
  * #6): across full catalog runs the entry's WALL is stable at
  * 1.2–1.3 s while executor-scheduled time flips between ~14 s and
  * ~31 s with IDENTICAL task count (67) and plan fingerprint — so it is
  * NOT an AQE partition flip (the ProfileQ62 hypothesis); the CPU
  * itself doubles.
  *
  * This main replays the exact q183b dataflow (fanned-out documents →
  * 2-merge BPE chain fold) N times in ONE JVM, fresh DataFrame each
  * pass, recording wall + summed task run/CPU time per pass. The
  * merge-chain fold is a nested interpreted higher-order expression, so
  * the hypothesis is JIT-warmth: whether C2 has finished compiling the
  * HOF interpreter paths before the entry's tasks run is an async race
  * against everything the catalog ran before it. If that is right, the
  * FIRST pass lands in the slow mode (~2x CPU) and later passes
  * converge to the fast mode — within one JVM, same plan, same tasks —
  * and the bimodality is benign measurement variance of interpreted
  * code under tiered compilation, not a plan or engine property.
  *
  *   sbt 'runMain graft.tools.ProfileQ183b'
  *
  * Measured PRE-r19 (this host, local[32], 3 JVM launches): pass 1
  * scheduled exec 90.2/103.9/125.4 s (CPU 24.3/27.8/24.7 s — threads
  * mostly WAITING on compilation, not computing), passes 2-6 converge
  * to 12.3-25.2 s exec / 7.6-14.2 s CPU; tasks 67 and wall 1.2-1.8 s
  * in every warm pass. The catalog's bimodal 14.5/31 s sits exactly on
  * this decay curve: q183b runs once per catalog sweep at whatever
  * warmth the preceding entries left, so its scheduled-exec lands
  * anywhere on the warm tail while wall, tasks, and fingerprint stay
  * fixed. Attribution: JIT warmth of the nested fold's interpreter/
  * generated code — benign measurement variance, not a plan or engine
  * property.
  *
  * POST-r19 (`BpeTokenizeWords` — zero HOFs in the apply plan, the
  * fold one compiled call): pass 1 64.4 s exec / 12.6 s CPU (generic
  * first-Spark-job warmup — parquet reader, WSCG compile, task
  * machinery — this probe's pass 1 is the JVM's first job; no longer
  * merge-chain-specific), passes 2-6 converge to 4.7-7.3 s exec /
  * 2.5-4.4 s CPU, wall 0.93-1.01 s. The interpreted-HOF C2 target
  * this probe attributed is structurally gone (BpeChainSpec pins the
  * plan HOF-free); the r17-r18 4-14x interpreted-HOF campaign is
  * complete.
  */
object ProfileQ183b {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions
      .withMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")

    @volatile var runMs = 0L
    @volatile var cpuNs = 0L
    @volatile var nTasks = 0
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          runMs += m.executorRunTime
          cpuNs += m.executorCpuTime
          nTasks += 1
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (i <- 1 to 6) {
      runMs = 0L; cpuNs = 0L; nTasks = 0
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      // the q183b body (TextQueries fanOut + merge chain), inlined so
      // the probe has no dependency on the private catalog helpers
      val fanned = docs.repartition(32)
      val df = graft.operators.Tokenizer
        .bpeApply(fanned, Seq(("e", "s"), ("es", "t")))
        .select(col("doc_id"), size(col("tokens")).as("n_tokens"))
        .orderBy("doc_id")
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      // task-end events deliver asynchronously; give the bus a beat
      Thread.sleep(500)
      println(f"pass $i: wall ${(System.nanoTime() - t0) / 1e9}%5.2f s  " +
        f"exec_run ${runMs / 1e3}%6.2f s  exec_cpu ${cpuNs / 1e9}%6.2f s" +
        f"  tasks $nTasks%4d")
    }
    spark.stop()
  }
}
