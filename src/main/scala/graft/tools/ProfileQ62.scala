package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnosis main for the q62 exec-time inflation that appeared with the
  * r15 review change of writeIndex's lineage cut (localCheckpoint →
  * persist): wall roughly doubled (2.0 → 4.3/4.9 s) and executor-
  * scheduled time went 1.6 → ~100 s across three samples. Times each
  * writeIndex phase under both cut strategies with an executor-time
  * listener, several reps each, same JVM. */
object ProfileQ62 {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val execMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            execMs.addAndGet(te.taskMetrics.executorRunTime)
      })
    def timed[T](name: String)(body: => T): T = {
      Thread.sleep(300) // let listener drain
      val e0 = execMs.get
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      System.err.println(f"[q62] $name%-28s wall $wall%6.2f s  exec " +
        f"${(execMs.get - e0) / 1e3}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")

    import graft.operators.TextSearch
    def freshDir() = java.nio.file.Files
      .createTempDirectory("graft-q62-prof").toString

    // Variant A: writeIndex as shipped (post-fix: Materialize.cut)
    def runCurrent(tag: String): Unit = {
      val dir = freshDir()
      timed(s"writeIndex shipped $tag") {
        TextSearch.writeIndex(docs, dir, nBuckets = 64)
      }
      timed(s"searchIndex        $tag") {
        TextSearch.searchIndex(spark, dir, "the quick data", k = 20,
          nBuckets = 64).collect()
      }
    }

    // Variant B: the pre-r15-review cut (localCheckpoint), inlined
    def runLocalCkpt(tag: String): Unit = {
      val dir = freshDir()
      timed(s"writeIndex lckpt   $tag") {
        val tf = TextSearch.termFreqs(docs).localCheckpoint()
        tf.withColumn("bucket", pmod(xxhash64(col("token")), lit(64)))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$dir/postings")
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
        dl.write.mode("overwrite").parquet(s"$dir/doclen")
        dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"),
            lit(64).as("n_buckets"))
          .write.mode("overwrite").parquet(s"$dir/stats")
      }
    }

    // Diagnosis result (r16): phase-level timing localized the cost to
    // the postings write — 52 s exec over the cache even PRE-FILLED
    // (eager count first), because the cached plan keeps the pre-AQE
    // 32-partition layout and the dynamic-partition write then runs
    // 32×64 parquet writers and leaves 2,048 tiny files. The partition
    // probe below shows the mechanism in two lines.
    locally {
      val p = TextSearch.termFreqs(docs).persist()
      p.count()
      System.err.println(s"[q62] persist partitions: ${p.rdd.getNumPartitions}")
      p.unpersist()
      val c = TextSearch.termFreqs(docs).localCheckpoint()
      System.err.println(s"[q62] lckpt   partitions: ${c.rdd.getNumPartitions}")
    }
    runCurrent("warm")
    runLocalCkpt("warm")
    for (i <- 1 to 2) { runCurrent(s"#$i"); runLocalCkpt(s"#$i") }
    spark.stop()
  }
}
