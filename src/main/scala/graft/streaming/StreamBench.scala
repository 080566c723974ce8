package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming throughput micro-bench: rate-source events driven
  * through the two stateful operators that gate any streaming deployment —
  * keyed sessionization (`flatMapGroupsWithState`) and watermarked exact
  * dedup (`dropDuplicatesWithinWatermark`) — for a fixed wall-clock
  * window, reporting sustained events/sec actually processed.
  *
  * The rate source is deliberately over-provisioned (rowsPerSecond far
  * above single-box capacity) so every micro-batch drains a backlog and
  * the measured rate is the ENGINE'S ceiling, not the generator's. The
  * sink is Spark's `noop` writer — the number excludes sink I/O by
  * design (state-store update cost dominates both pipelines).
  */
object StreamBench {

  /** Run both pipelines sequentially, `seconds` each.
    *
    * Logging is dropped to OFF for the duration: stopping a backlogged
    * stream kills its in-flight micro-batch, and the state store +
    * scheduler log dozens of loud-but-expected CANNOT_COMMIT /
    * TaskKilled lines (asynchronously, from task threads) that would
    * swamp the driver's captured output tail. The throughput lines
    * print via System.err directly, unaffected.
    *
    * @return (pipeline name, sustained events/sec) pairs. */
  def run(spark: SparkSession, seconds: Int = 15,
      rowsPerSec: Long = 2000000L): Seq[(String, Double)] = {
    import spark.implicits._
    val rootLogger = org.apache.logging.log4j.LogManager.getRootLogger
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    val priorLevel = rootLogger.getLevel
    spark.sparkContext.setLogLevel("OFF")

    def measure(name: String)(build: DataFrame => DataFrame)
        : (String, Double) = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_stream_bench_").toString
      // Row counting rides a listener, not q.recentProgress — the
      // progress ring buffer is capped at
      // spark.sql.streaming.numRecentProgressUpdates (default 100), so a
      // fast pipeline completing >100 micro-batches in the window would
      // silently undercount through recentProgress.
      val rowsSeen = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          rowsSeen.addAndGet(e.progress.numInputRows)
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      val src = spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSec)
        .option("numPartitions", 32)
        .load()
      val q = build(src).writeStream
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
      val t0 = System.nanoTime()
      // The measurement window ends BEFORE stop(): stopping a backlogged
      // stream waits for the in-flight batch to cancel, and rows only
      // counts COMPLETED batches — including stop latency in the
      // denominator would bias the rate low by the stop-cost fraction.
      val wall =
        try { Thread.sleep(seconds * 1000L); (System.nanoTime() - t0) / 1e9 }
        finally q.stop()
      // listener events are delivered asynchronously; give the last
      // completed batch's event a beat to land before reading
      Thread.sleep(1000)
      spark.streams.removeListener(listener)
      val rows = rowsSeen.get
      val rate = rows / wall
      System.err.println(
        f"[bench] streaming:$name%-20s ${rate / 1e3}%8.1f k events/s " +
          f"($rows rows in $wall%.1f s)")
      (name, rate)
    }

    try {
    val sessionize = measure("sessionize") { src =>
      src.select(
          col("value").as("event_id"), col("timestamp").as("ts"),
          (col("value") % 50000).as("user_id"),
          concat(lit("t"), col("value") % 5).as("event_type"),
          (col("value") % 100).cast("double").as("value"))
        .as[EventStreams.Event]
        // 5 s gap + 10 s watermark: sessions actually close during the
        // run, so the state path (open → timeout-emit → reclaim) is the
        // thing measured, not just state accretion.
        .transform(ds =>
          EventStreams.sessionize(ds, gapSeconds = 5,
            watermarkDelay = "10 seconds"))
        .toDF()
    }
    val dedup = measure("windowed_dedup") { src =>
      // ~10% distinct keys: the dedup actually drops rows, exercising
      // both the lookup-hit and state-insert paths.
      EventStreams.streamingExactDedup(
        src.select(col("timestamp").as("ts"),
          concat(lit("doc "), col("value") % 200000).as("text")),
        watermarkDelay = "10 seconds")
    }
    // Give the killed batches' async task-failure logging a beat to
    // drain while the level is still OFF.
    Thread.sleep(2000)
    Seq(sessionize, dedup)
    } finally {
      // Restore the CALLER'S level even when a pipeline throws —
      // leaving the shared context at OFF would suppress exactly the
      // error context needed to diagnose the failure.
      org.apache.logging.log4j.core.config.Configurator
        .setRootLevel(priorLevel)
    }
  }
}
