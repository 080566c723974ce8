package graft.tools

import org.apache.spark.sql.SparkSession

/** State-partition sweep for the stateful streaming legs (r17 verdict
  * #7): the r17 oversubscription finding — sessionize/windowed_dedup
  * run ~1.7x faster at local[16] than local[32], heap-invariant, while
  * the stateless tokenize leg scales the opposite way — implied a
  * "~cores/2 state partitions per host" sizing rule, but rested on two
  * cold-JVM subset probes. This main sweeps
  * `spark.sql.shuffle.partitions` (which fixes the state-store
  * partition count at each query's fresh checkpoint) over 32 → 16 → 8
  * → 16 → 32 AT A FIXED local[32] master, measuring only the two
  * stateful legs each point. The palindromic order gives a same-JVM
  * repeatability anchor at both ends, separating a partition-count
  * effect from within-JVM warmup drift.
  *
  *   sbt 'runMain graft.tools.StreamStateSweep'
  *
  * Together with the r17 local[16]-vs-local[32] probes this separates
  * the two variables the oversubscription datum conflated: task
  * THREADS (the master) vs concurrent STATE PARTITIONS (shuffle
  * partitions). The curve lands in BENCH_NOTES as the committed
  * evidence behind the 100-TB executor-sizing rule.
  */
object StreamStateSweep {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val seconds = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECONDS", "12").toInt
    val spark = graft.Sessions
      .withMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Default palindrome (32 → … → 32) exposes within-JVM drift via the
    // repeated anchors; SPARK_GRAFT_SWEEP_POINTS="8" runs one point per
    // JVM for the cold-JVM protocol (a first palindromic run measured
    // the p=32 anchors at 603k vs 441k sessionize / 276k vs 1033k dedup
    // — warmup drift swamps the partition effect inside one JVM, so the
    // committed curve comes from cold JVMs with decay gaps).
    val points = sys.env.get("SPARK_GRAFT_SWEEP_POINTS")
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(32, 16, 8, 16, 32))
    val rows = points.map { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p.toString)
      System.err.println(s"[sweep] shuffle.partitions = $p")
      val r = graft.streaming.StreamBench.run(spark, seconds = seconds,
        legs = Seq("sessionize", "windowed_dedup")).toMap
      (p, r.getOrElse("sessionize_events_per_sec", 0.0),
        r.getOrElse("windowed_dedup_events_per_sec", 0.0))
    }
    println("{\"metric\":\"streaming_state_partition_sweep\"," +
      s""""master":"local[$cpus]","seconds":$seconds,"points":[""" +
      rows.map { case (p, s, d) =>
        s"""{"partitions":$p,"sessionize":${math.round(s)},""" +
          s""""windowed_dedup":${math.round(d)}}"""
      }.mkString(",") + "]}")
    spark.stop()
  }
}
