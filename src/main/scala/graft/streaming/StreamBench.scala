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
    * The offered rate is reported alongside the measured rates
    * (`offered` pair) so a run is self-adjudicating: measured ≪ offered
    * proves the source over-provisioned and the numbers engine-bound.
    * At 2M offered, both pipelines once reported the IDENTICAL
    * 1,733,320 ev/s — the measurement had become the source/batching
    * ceiling, honest as a lower bound but no longer diagnostic; 8M
    * keeps the ~1.8M-class engines saturated with 4× headroom.
    *
    * @return (pipeline name, sustained events/sec) pairs, plus
    *         ("offered", rowsPerSec). */
  def run(spark: SparkSession, seconds: Int = 15,
      rowsPerSec: Long = 8000000L): Seq[(String, Double)] = {
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
      // The listener is session-global: filter by the benched query's
      // id, or anything else streaming in the session (caller state,
      // a concurrent bench) would inflate the count.
      val qid = new java.util.concurrent.atomic.AtomicReference[
        java.util.UUID](null)
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          if (e.progress.id == qid.get)
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
      qid.set(q.id) // set before the first batch can complete — progress
      // events need a finished micro-batch, which takes ≫ this gap
      val t0 = System.nanoTime()
      // The measurement window ends BEFORE stop(): stopping a backlogged
      // stream waits for the in-flight batch to cancel, and rows only
      // counts COMPLETED batches — including stop latency in the
      // denominator would bias the rate low by the stop-cost fraction.
      val wall =
        try { Thread.sleep(seconds * 1000L); (System.nanoTime() - t0) / 1e9 }
        finally q.stop()
      // listener events deliver asynchronously and a fixed sleep can
      // still miss the final batch's event: wait until the count is
      // stable across a 200 ms quiet period (bounded at 5 s)
      locally {
        var last = -1L
        var spins = 0
        while (rowsSeen.get != last && spins < 25) {
          last = rowsSeen.get
          Thread.sleep(200)
          spins += 1
        }
      }
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
    Seq(sessionize, dedup, ("offered", rowsPerSec.toDouble))
    } finally {
      // Restore the CALLER'S level even when a pipeline throws —
      // leaving the shared context at OFF would suppress exactly the
      // error context needed to diagnose the failure.
      org.apache.logging.log4j.core.config.Configurator
        .setRootLevel(priorLevel)
    }
  }
}
