package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming throughput micro-bench: generated events driven
  * through the two stateful operators that gate any streaming deployment —
  * keyed sessionization (`flatMapGroupsWithState`) and watermarked exact
  * dedup (`dropDuplicatesWithinWatermark`) — for a fixed wall-clock
  * window, reporting sustained events/sec actually processed.
  *
  * The source is `rate-micro-batch`: every micro-batch is a FIXED
  * `rowsPerBatch` rows, available instantly, with event time advancing
  * 1 s per batch — so the engine runs batches back-to-back and the
  * measurement is STRUCTURALLY engine-bound (no generator ceiling, no
  * backlog dynamics producing 2-4 giant variable batches per window,
  * which is what the plain over-provisioned `rate` source degenerated
  * to). The sink is Spark's `noop` writer — the number excludes sink
  * I/O by design (state-store update cost dominates both pipelines).
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
    * The reported rate is STEADY-STATE: batches completing in the first
    * third of the window (JIT/codegen warmup, state-store bootstrap)
    * are excluded, and both endpoints sit on batch boundaries. The
    * whole-window rate swung >2x between cold and warm JVMs; the
    * steady-state form is what a cross-round comparison can trust. The
    * per-batch row count and the steady batch count are reported
    * alongside so a run is self-adjudicating.
    *
    * @param statePartitions override the state-store partition count
    *        for every leg via [[StateSizing.withStatePartitions]]
    *        (None = session default, the committed bench
    *        configuration; `Some(StateSizing.recommended(cores))`
    *        applies the measured ~cores/2 rule — r18 verdict #7).
    * @return fully-named (key, value) pairs ready for the bench JSON:
    *         `<pipeline>_events_per_sec` (steady),
    *         `<pipeline>_steady_batches`, and `rows_per_batch`. */
  def run(spark: SparkSession, seconds: Int = 15,
      rowsPerBatch: Long = 2000000L,
      legs: Seq[String] = Seq("sessionize", "windowed_dedup",
        "tokenize_wordpiece", "ivf_assign"),
      statePartitions: Option[Int] = None): Seq[(String, Double)] =
    StateSizing.withStatePartitions(spark, statePartitions) {
      runLegs(spark, seconds, rowsPerBatch, legs)
    }

  private def runLegs(spark: SparkSession, seconds: Int,
      rowsPerBatch: Long, legs: Seq[String]): Seq[(String, Double)] = {
    import spark.implicits._
    val rootLogger = org.apache.logging.log4j.LogManager.getRootLogger
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    val priorLevel = rootLogger.getLevel
    spark.sparkContext.setLogLevel("OFF")

    def measure(name: String, batchRows: Long = rowsPerBatch)(
        build: DataFrame => DataFrame): Seq[(String, Double)] = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_stream_bench_").toString
      // Row counting rides a listener, not q.recentProgress — the
      // progress ring buffer is capped at
      // spark.sql.streaming.numRecentProgressUpdates (default 100), so a
      // fast pipeline completing >100 micro-batches in the window would
      // silently undercount through recentProgress.
      val rowsSeen = new java.util.concurrent.atomic.AtomicLong(0L)
      // (completion nanoTime, rows in that batch) per completed batch —
      // the steady-state rate below needs batch-aligned timestamps.
      val batches =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      // The listener is session-global: filter by the benched query's
      // id, or anything else streaming in the session (caller state,
      // a concurrent bench) would inflate the count.
      val qid = new java.util.concurrent.atomic.AtomicReference[
        java.util.UUID](null)
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          if (e.progress.id == qid.get) {
            rowsSeen.addAndGet(e.progress.numInputRows)
            batches.add((System.nanoTime(), e.progress.numInputRows))
            ()
          }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      // fixed-size instantly-available batches; event time advances 1 s
      // per batch (the default), so watermarks progress and session/
      // dedup state actually closes and reclaims during the run
      val src = spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", batchRows)
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
      //
      // r14 verdict #2: a fixed wall window fails silently for slow
      // entries under driver load — ivf_assign completed only 2 batches
      // in the r14 driver window, so the steady-state slice never
      // engaged and the headline understated the quiet rate 12×. The
      // window now EXTENDS past `seconds` until a minimum completed-
      // batch count lands (so the batch-aligned slice has material),
      // bounded at 4× the nominal window so a stalled pipeline cannot
      // hang the bench. If even the extended window is short, the
      // explicit insufficient flag below marks the artifact.
      val minBatches = 6
      val hardCapNs = t0 + seconds * 4 * 1000000000L
      // The steady slice below needs >= 3 batches completing AFTER the
      // warmup cutoff — extending on the TOTAL count alone could stop
      // with 6 batches of which only 2 are post-cutoff (exactly the r14
      // failure mode the extension exists to fix), so the wait gates on
      // the post-cutoff count too (4 gives the slice span margin).
      val cutoff = t0 + (seconds * 1e9 / 3).toLong
      def postCutoffBatches(): Int = {
        val it = batches.iterator()
        var c = 0
        while (it.hasNext) if (it.next()._1 >= cutoff) c += 1
        c
      }
      val wall =
        try {
          Thread.sleep(seconds * 1000L)
          while ((batches.size < minBatches || postCutoffBatches() < 4) &&
              System.nanoTime() < hardCapNs)
            Thread.sleep(500L)
          (System.nanoTime() - t0) / 1e9
        } finally q.stop()
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
      val wholeRate = rows / wall
      // Per-batch duration curve (r15 verdict #1): the windowed_dedup
      // rate collapsed 7.5× between two driver windows and the artifact
      // could not say whether batches were uniformly slow (environment)
      // or GROWING (state-store accretion the old fixed window hid).
      // Batch i's duration = completion-gap to batch i-1 (batch 0 is
      // anchored at stream start, so it carries query-startup cost and
      // is excluded from the early/late aggregates). The full curve
      // prints to stderr; the early/late means land in the bench JSON
      // so a growth trend is diffable from artifacts alone.
      val completions = {
        val it = batches.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        while (it.hasNext) buf += it.next()
        buf.sortBy(_._1)
      }
      val durations = completions.zip((t0, 0L) +: completions.dropRight(1))
        .map { case ((tc, _), (tp, _)) => (tc - tp) / 1e9 }
      // The 'early' mean starts at the first batch completing AFTER the
      // warmup cutoff — the same cutoff the steady rate uses. Batches
      // 1-3 sit inside the JIT/state-bootstrap window, so averaging them
      // inflated 'early' and desensitized the late>2x-early growth gate
      // to exactly the state-accretion signature it exists to expose
      // (r16 ADVICE #1). Batch 0 stays excluded regardless (anchored at
      // stream start, it carries query-startup cost).
      val firstPostIdx = completions.indexWhere(_._1 >= cutoff)
      val steadyDur =
        if (firstPostIdx >= 0) durations.drop(math.max(firstPostIdx, 1))
        else durations.drop(1)
      def meanOf(xs: Iterable[Double]): Double =
        if (xs.isEmpty) 0.0 else xs.sum / xs.size
      val batchEarly = meanOf(steadyDur.take(3))
      val batchLate = meanOf(steadyDur.takeRight(3))
      if (durations.nonEmpty)
        System.err.println(s"[bench] streaming:$name batch curve (s): " +
          durations.map(d => f"$d%.2f").mkString(" "))
      // STEADY-STATE rate: the whole-window rate carries the first
      // batches' JIT/codegen warmup and state-store bootstrap, which
      // made the committed number swing >2x between cold and warm JVMs.
      // Measure batch-aligned instead — rows completed strictly after
      // the first post-cutoff batch, over the span from that batch's
      // completion to the last batch's completion — so both endpoints
      // sit on batch boundaries and warmup is excluded. Falls back to
      // the whole-window rate when fewer than 3 batches land after the
      // cutoff (a stalled pipeline should not report a flattering
      // cherry-picked slice).
      val post = {
        val it = batches.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        while (it.hasNext) { val b = it.next(); if (b._1 >= cutoff) buf += b }
        buf.sortBy(_._1)
      }
      // steadyN reports the PROVENANCE of the published number: the
      // batch count behind the steady-state slice, or 0 when the rate
      // fell back to the whole-window measurement — an adjudicator must
      // never read a fallback value as batch-aligned.
      val (rate, steadyN) =
        if (post.length >= 3) {
          val span = (post.last._1 - post.head._1) / 1e9
          if (span > 1.0) (post.drop(1).map(_._2).sum / span, post.length - 1)
          else (wholeRate, 0)
        } else (wholeRate, 0)
      // Self-adjudication flag (r14 verdict #2): a fallback value must
      // never read as batch-aligned. 1.0 = the steady slice could not
      // engage even after the extended window — the published rate is
      // the whole-window measurement.
      val insufficient = if (steadyN == 0) 1.0 else 0.0
      System.err.println(
        f"[bench] streaming:$name%-20s ${rate / 1e3}%8.1f k events/s " +
          f"steady over $steadyN%d batches (${wholeRate / 1e3}%8.1f k " +
          f"whole-window; $rows rows in $wall%.1f s, " +
          f"${batches.size}%d batches" +
          (if (insufficient > 0) "; INSUFFICIENT BATCHES" else "") + ")")
      Seq(s"${name}_events_per_sec" -> rate,
        s"${name}_steady_batches" -> steadyN.toDouble,
        s"${name}_insufficient_batches" -> insufficient,
        s"${name}_batch_sec_early" -> batchEarly,
        s"${name}_batch_sec_late" -> batchLate)
    }

    try {
    // `legs` subsets the measured pipelines (the state-partition sweep
    // probes only the stateful pair); the default runs all four, so
    // the committed bench path is unchanged.
    def leg(name: String)(body: => Seq[(String, Double)])
        : Seq[(String, Double)] =
      if (legs.contains(name)) body else Seq.empty
    val sessionize = leg("sessionize") { measure("sessionize") { src =>
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
    } }
    val dedup = leg("windowed_dedup") { measure("windowed_dedup") { src =>
      // ~10% distinct keys: the dedup actually drops rows, exercising
      // both the lookup-hit and state-insert paths.
      EventStreams.streamingExactDedup(
        src.select(col("timestamp").as("ts"),
          concat(lit("doc "), col("value") % 200000).as("text")),
        watermarkDelay = "10 seconds")
    } }
    val tokenize = leg("tokenize_wordpiece") {
      measure("tokenize_wordpiece") { src =>
      // Tokenize-at-ingest rate under the committed WordPiece artifact:
      // ~7 words/row, one varying tail word per row so the per-executor
      // distinct-word memo sees both hits (the fixed words) and a
      // bounded miss stream (~997 suffixed words) — the steady-state
      // mix a landing crawl shard produces. Stateless mapPartitions,
      // so the rate is pure tokenizer throughput, no state store.
      val vocab = graft.operators.TokenizerStore.loadWordPiece(spark,
        "/root/repo/fixtures/tokenizer/wordpiece_vocab.parquet")
      graft.operators.WordPiece.wordPieceApply(
        src.select(col("value").as("doc_id"),
          concat(lit("the scan fast table value row w"),
            col("value") % 997).as("text")),
        vocab)
    } }
    // ~250k rows/batch: at 64 dot products per vector this leg does
    // ~4k flops/row — 2M-row batches complete only twice per window,
    // which defeats the steady-state slice. Same events/s semantics.
    val ivfAssignRows = 250000L
    val ivfAssign = leg("ivf_assign") {
      measure("ivf_assign", batchRows = ivfAssignRows) { src =>
      // Streaming ANN-index maintenance rate (VecStreams' hot path):
      // a deterministic dim-64 embedding synthesized per row, assigned
      // to one of 64 portable centroids — the codegen'd argmin fold is
      // 64 dot products per vector, the honest production IVF ingest
      // cost. Stateless projection: no shuffle, no state store.
      graft.operators.IvfIndex.withCluster(
        src.select(col("value").as("vec_id"),
          expr("transform(sequence(0, 63), " +
            "j -> cast(sin(value * 7 + j) as float))").as("embedding")),
        graft.operators.IvfIndex.portableCentroids(64, 64))
        .select("vec_id", "cluster")
    } }
    // Give the killed batches' async task-failure logging a beat to
    // drain while the level is still OFF.
    Thread.sleep(2000)
    sessionize ++ dedup ++ tokenize ++ ivfAssign ++
      Seq("rows_per_batch" -> rowsPerBatch.toDouble,
        "ivf_assign_rows_per_batch" -> ivfAssignRows.toDouble)
    } finally {
      // Restore the CALLER'S level even when a pipeline throws —
      // leaving the shared context at OFF would suppress exactly the
      // error context needed to diagnose the failure.
      org.apache.logging.log4j.core.config.Configurator
        .setRootLevel(priorLevel)
    }
  }
}
