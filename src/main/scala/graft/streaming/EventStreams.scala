package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.10 — greenfield: the
  * reference is a run-once batch exporter, so nothing constrains these
  * semantics; they mirror the harness `events` schema and the batch
  * q18/q19 catalog entries so batch and streaming answers are comparable).
  *
  * Design: all transforms are `DataFrame → DataFrame` / typed `Dataset`
  * functions with no source/sink baked in — the caller attaches
  * `readStream` (Kafka, files, rate) and `writeStream`; specs drive them
  * with MemoryStream. State is bounded: watermarks bound the window state,
  * and sessions time out via `EventTimeTimeout`, so state size tracks the
  * live-key working set, not the stream history — the property that keeps
  * this runnable forever on a real cluster.
  */
object EventStreams {

  /** The harness `events` row (TESTDATA.md). */
  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
      value: Double)

  /** One closed user session (epoch-second bounds, matching batch q19). */
  final case class SessionOut(
      user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, total_value: Double)

  /** Open-session accumulator; `start`/`last` in epoch MICROseconds — the
    * gap decision must match batch q19, which compares exact integer
    * microseconds (a seconds floor would merge sessions the batch query
    * splits when timestamps carry sub-second parts). */
  private[streaming] final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  /** Epoch micros of a Timestamp (positive epochs; same value Spark's
    * internal TimestampType carries). */
  private[streaming] def epochMicros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  /** Watermarked tumbling-window aggregation — the streaming twin of the
    * batch q18 time-window query. Late events beyond `watermarkDelay` are
    * dropped and their window state reclaimed. */
  def windowedCounts(events: DataFrame, watermarkDelay: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Watermarked windowed distinct-user counts on the sketch path:
    * `approx_count_distinct` (HyperLogLog++) keeps per-window state at a
    * constant sketch size instead of one entry per distinct user — the
    * only way a distinct count stays bounded on an unbounded stream.
    * Exact distinct per window is available in batch (q20's shape); the
    * stream carries the sketch, same split as
    * [[graft.operators.TextAnalysis.corpusStats]]. */
  def windowedDistinctUsers(events: DataFrame,
      watermarkDelay: String = "10 minutes",
      windowLen: String = "5 minutes", rsd: Double = 0.02): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("n_users"), col("n_events"))

  /** Gap-based sessionization with explicit keyed state — the streaming
    * twin of batch q19 (same 1800 s default gap, same epoch-second session
    * bounds). A session closes when a same-user event arrives more than
    * `gapSeconds` later (emitted immediately) or when event time passes
    * `last + gap` (timeout emission). Append-mode safe: only CLOSED
    * sessions are emitted. */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
      watermarkDelay: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(updateSessions(gapSeconds))
  }

  /** Streaming exact dedup — the training-data dedup operator's streaming
    * twin: the first document with a given content fingerprint passes;
    * later duplicates inside the watermark horizon are dropped, and the
    * fingerprint state is reclaimed once the watermark passes (bounded
    * state — the property that lets this run on an unbounded feed). */
  def streamingExactDedup(docs: DataFrame, watermarkDelay: String,
      textCol: String = "text", tsCol: String = "ts"): DataFrame =
    docs
      .withColumn("fp",
        graft.operators.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Streaming NEAR-dup dedup: the first document with a given 64-bit
    * SimHash passes; later documents whose shingle votes collapse to the
    * SAME signature (boilerplate re-posts, small templated edits) are
    * dropped inside the watermark horizon. The signature is
    * [[graft.operators.Dedup.rowSimhash64]] — pure per-row array algebra,
    * so the only stateful operator is the signature dedup itself
    * (bounded, watermark-reclaimed). Hamming-radius matching (dist ≤ 3)
    * needs cross-key coordination no single streaming stage can express
    * with bounded state — that decision belongs to the batch/ingest path
    * ([[graft.operators.Dedup.dedupIncremental]]); this operator is the
    * streaming point on the dedup spectrum between exact bytes
    * ([[streamingExactDedup]]) and batch hamming. */
  def streamingNearDupDedup(docs: DataFrame, watermarkDelay: String,
      textCol: String = "text", tsCol: String = "ts"): DataFrame =
    docs
      .withColumn("simhash",
        graft.operators.Dedup.rowSimhash64(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("simhash")
      .drop("simhash")

  /** Streaming ingestion dedup against a STATIC at-rest corpus index
    * ([[graft.operators.Dedup.dedupIndex]] output, read from the lake):
    * documents whose content fingerprint already exists in the corpus are
    * dropped. A stream-static LEFT ANTI join — stateless on the stream
    * side (the corpus index IS the state, at rest), so it composes with
    * [[streamingNearDupDedup]]/[[streamingExactDedup]] downstream. */
  def streamingIndexDedup(docs: DataFrame, index: DataFrame,
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp",
        graft.operators.TextAnalysis.fingerprint(col(textCol)))
      .join(index.select("fp").distinct(), Seq("fp"), "left_anti")
      .drop("fp")

  /** SELF-MAINTAINING streaming ingestion dedup — the complete production
    * loop: every micro-batch is deduped against the AT-REST corpus index
    * ([[graft.operators.Dedup.dedupIndex]] rows: exact fingerprint + LSH
    * band keys, ~50 bytes/doc) via
    * [[graft.operators.Dedup.dedupIncremental]], surviving documents are
    * appended to `outPath`, and THEIR index rows are appended to
    * `indexPath` — so later batches dedup against everything already
    * ingested. State lives at rest (the index), not in the stream: no
    * watermark horizon limits how far back a duplicate can match, and a
    * restart resumes from the checkpoint with the index intact.
    * `foreachBatch` is the Spark idiom for this paired-sink shape.
    *
    * The paired writes are IDEMPOTENT under checkpoint replay: each batch
    * owns a deterministic `batch=<id>` partition directory in BOTH sinks
    * and OVERWRITES it (never appends to the shared root), and the index
    * read excludes the current batch's own partition — so a batch that
    * died between the two writes re-runs to the identical result and
    * overwrites its own directories, never duplicating documents in the
    * output or self-shadowing in the index. Index existence is probed via
    * the Hadoop `FileSystem` of the index URI (a `java.io.File` check only
    * sees the driver's local disk — on HDFS/S3 it would be always-false
    * and cross-batch dedup silently disabled), guarding the
    * existing-but-empty case where schema inference would fail.
    *
    * OUTPUT SCHEMA NOTE: because each batch owns a `batch=<id>` partition
    * directory, readers of `outPath` (and `indexPath`) see an extra
    * `batch` long partition column alongside the document (resp. index)
    * columns; drop it if undesired. LEGACY LAYOUTS: earlier revisions
    * appended flat files directly under both roots. Resuming over such a
    * directory is REFUSED with a clear error (see [[ingestBatch]]) —
    * mixing root-level files with `batch=` partition directories breaks
    * Spark partition discovery, and the legacy index has no `batch`
    * column to exclude on replay. Migrate by moving the legacy files into
    * a synthetic `batch=-1/` subdirectory (they then read as one
    * committed partition) or by recreating both directories.
    *
    * Returns the started query; caller stops it. */
  def selfMaintainingIngest(docs: DataFrame, indexPath: String,
      outPath: String, checkpoint: String, numHashes: Int = 16,
      bands: Int = 4, portable: Boolean = false, textCol: String = "text",
      idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestBatch(batch.toDF(), batchId, indexPath, outPath, numHashes,
          bands, portable, textCol, idCol)
      }
      .start()

  /** One micro-batch of [[selfMaintainingIngest]], factored out so the
    * replay-idempotency contract is directly testable: calling this twice
    * with the same `batchId` (what checkpoint recovery does after a crash
    * between the paired writes) leaves both sinks exactly as a single
    * call would. */
  private[streaming] def ingestBatch(bdf: DataFrame, batchId: Long,
      indexPath: String, outPath: String, numHashes: Int, bands: Int,
      portable: Boolean, textCol: String, idCol: String): Unit = {
        val spark = bdf.sparkSession
        val conf = spark.sessionState.newHadoopConf()
        // Refuse to write `batch=<id>` partition directories over a
        // LEGACY flat-file layout (pre-partitioned revisions appended
        // files directly under the roots): the mix breaks partition
        // discovery for every later read, and the legacy index rows have
        // no `batch` column to exclude on replay. Failing the first
        // micro-batch with a migration hint beats silently corrupting
        // both sinks.
        for (root <- Seq(indexPath, outPath)) {
          val p = new org.apache.hadoop.fs.Path(root)
          val pfs = p.getFileSystem(conf)
          val legacy = pfs.exists(p) && pfs.listStatus(p).exists { s =>
            val n = s.getPath.getName
            s.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
          require(!legacy,
            s"$root holds a legacy flat-file layout (data files at the " +
              "directory root). selfMaintainingIngest writes batch=<id> " +
              "partition directories; move the existing files into a " +
              "batch=-1/ subdirectory or recreate the directory.")
        }
        val hPath = new org.apache.hadoop.fs.Path(indexPath)
        val fs = hPath.getFileSystem(conf)
        // At least one partition with a VISIBLE DATA FILE — a directory
        // name alone is not an index (r14 review): a crash during the
        // FIRST batch's index write leaves `batch=0/` holding only
        // `_temporary/`, and treating that as an index made the replay's
        // schema inference fail before the idempotent overwrite could
        // repair it. (A partial partition that does hold committed task
        // files is safe: it can only be THIS batch's own, which the
        // batch-exclusion filter below removes.) An existing-but-empty
        // directory likewise takes the empty-index branch.
        def visible(n: String) = !n.startsWith("_") && !n.startsWith(".")
        val hasIndex = fs.exists(hPath) && fs.listStatus(hPath).exists { s =>
          visible(s.getPath.getName) && (s.isFile ||
            fs.listStatus(s.getPath).exists(c =>
              c.isFile && visible(c.getPath.getName)))
        }
        val index =
          if (hasIndex) {
            // Exclude this batch's own partition: present only on replay
            // after a crash between the paired writes, where including it
            // would mark every document a duplicate of itself and drop
            // the whole batch from the output. A `batch=-1` migration
            // partition (or any layout lacking the column — defensive;
            // the legacy guard above should have fired) is used as-is.
            val raw = spark.read.parquet(indexPath)
            if (raw.columns.contains("batch"))
              raw.filter(col("batch") =!= lit(batchId)).drop("batch")
            else raw
          } else
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField(idCol,
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("fp",
                  org.apache.spark.sql.types.StringType),
                org.apache.spark.sql.types.StructField("band",
                  org.apache.spark.sql.types.IntegerType),
                org.apache.spark.sql.types.StructField("key",
                  org.apache.spark.sql.types.StringType))))
        val kept = graft.operators.Dedup.dedupIncremental(bdf, index,
          numHashes, bands, portable, textCol, idCol)
        val survivors = bdf.join(kept, Seq(idCol), "left_semi")
          .transform(graft.operators.Materialize.cut)
        survivors.write.mode("overwrite")
          .parquet(s"$outPath/batch=$batchId")
        graft.operators.Dedup.dedupIndex(survivors, numHashes, bands,
            portable, textCol, idCol)
          .write.mode("overwrite").parquet(s"$indexPath/batch=$batchId")
        ()
  }

  /** Streaming NOVELTY gate: pass only streamed documents whose n-gram
    * novelty against an AT-REST reference corpus (the already-ingested
    * data, a benchmark set, yesterday's snapshot) is at least
    * `minNovelty` — the streaming form of
    * [[graft.operators.TextAnalysis.noveltyScore]], for admitting only
    * documents that actually add new text.
    *
    * STATELESS by construction, so it is append-mode safe with no
    * watermark or state store: the reference's gram set is folded
    * batch-side into a Bloom filter (≤ 8 MB regardless of corpus size)
    * embedded as a plan literal, and each streamed row scores itself
    * with IN-ROW array algebra — `filter(grams, g → might_contain(h(g)))`
    * — no explode, no per-gram shuffle, no aggregation on the stream.
    * Bloom false positives can only UNDER-count novelty (rate `fpp`), so
    * the gate errs toward dropping near-reference docs — the right
    * direction for a contamination/redundancy guard; gramless documents
    * score novelty 0 and are dropped.
    *
    * @return the stream with a `novelty` column, filtered to
    *   novelty ≥ minNovelty */
  def streamingNoveltyGate(stream: DataFrame, ref: DataFrame,
      minNovelty: Double, n: Int = 3, fpp: Double = 0.01,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.GraftSqlShims
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    import graft.operators.TextAnalysis
    require(minNovelty >= 0.0 && minNovelty <= 1.0,
      "minNovelty must be in [0, 1]")
    // the gram set feeds TWO actions (count for sizing, then the Bloom
    // aggregate) — checkpoint it so the reference's explode + distinct
    // shuffle runs once, not twice (r14 review), and release the blocks
    // once the bloom bytes are on the driver
    val refGrams = ref.select(
        explode(TextAnalysis.shingles(col(textCol), n)).as("g"))
      .filter(length(col("g")) > 0)
      .select(xxhash64(col("g")).as("gh")).distinct()
      .localCheckpoint()
    val bloomBytes =
      try {
        val nItems = math.max(1L, refGrams.count())
        val numBits = math.min(67108864L, math.max(64L,
          math.ceil(-nItems * math.log(fpp) /
            (math.log(2) * math.log(2))).toLong))
        refGrams.agg(GraftSqlShims.columnOf(
            new BloomFilterAggregate(GraftSqlShims.expressionOf(col("gh")),
              Literal(nItems), Literal(numBits)).toAggregateExpression())
            .as("bf"))
          .head().getAs[Array[Byte]]("bf")
      } finally refGrams.unpersist()
    def seen(g: org.apache.spark.sql.Column) =
      GraftSqlShims.columnOf(BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        GraftSqlShims.expressionOf(xxhash64(g))))
    val grams = array_distinct(
      filter(TextAnalysis.shingles(col(textCol), n), g => length(g) > 0))
    val nG = size(grams)
    val nSeen = size(filter(grams, g => seen(g)))
    stream
      .withColumn("novelty",
        when(nG > 0, round(lit(1.0) - nSeen.cast("double") / nG, 6))
          .otherwise(lit(0.0)))
      .filter(col("novelty") >= minNovelty)
  }

  /** Streaming as-of enrichment: each streamed event picks the latest
    * at-or-before row of a STATIC dimension series (prices, configs,
    * model versions) for its key. Delegates to
    * [[graft.operators.TemporalJoin.asofJoinBroadcast]] — whose broadcast
    * + in-row-probe shape is exactly what a streaming plan can run
    * STATELESSLY: a stream-static broadcast equi-join plus per-row array
    * algebra, no watermark, no state store, append-mode safe. (The
    * union-and-window batch form is NOT streamable — a window over an
    * unbounded stream needs stateful ordering.) */
  def streamingAsofEnrich(stream: DataFrame, dim: DataFrame, key: String,
      streamTime: String, dimTime: String,
      payload: Seq[String]): DataFrame =
    graft.operators.TemporalJoin.asofJoinBroadcast(stream, dim, key,
      streamTime, dimTime, payload)

  /** Stream-STREAM interval join: all (left, right) pairs with equal
    * `key` and `rightTime` in `[leftTime, leftTime + widthSec)` — the
    * streaming twin of [[graft.operators.TemporalJoin.rangeJoin]]
    * (attribution between two live feeds: impressions ⋈ clicks, errors ⋈
    * follow-up actions). Spark's stream-stream inner join with an
    * event-time range condition keeps BOTH sides' state bounded: each
    * side buffers only rows newer than its watermark minus the interval,
    * so state tracks the live window, not stream history. Same output
    * contract as the batch operator: left columns unchanged, right
    * columns `r_`-prefixed.
    *
    * The batch twin buckets time to turn the inequality into an
    * equi-join; the streaming runtime instead bounds the symmetric hash
    * join with the watermark — same semantics, each engine's native
    * bounding mechanism (spec-pinned equal to the batch operator). */
  def streamStreamIntervalJoin(left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String, widthSec: Long,
      watermarkDelay: String = "1 hour"): DataFrame = {
    require(widthSec > 0, "window width must be positive")
    val rCols = right.columns.toSeq
    // Rename BEFORE attaching the watermark so the watermark rides the
    // surviving column; "__rk"/"__rt" keep the join unambiguous when both
    // feeds share column names (two event streams both carrying "ts").
    val r = right
      .select(col(key).as("__rk") +: col(rightTime).as("__rt") +:
        rCols.map(c => col(c).as(s"r_$c")): _*)
      .withWatermark("__rt", watermarkDelay)
    val l = left.withWatermark(leftTime, watermarkDelay)
    l.join(r,
        col(key) === col("__rk") &&
          col("__rt") >= col(leftTime) &&
          col("__rt") < col(leftTime) +
            expr(s"INTERVAL $widthSec SECOND"))
      .drop("__rk", "__rt")
  }

  /** One funnel progression report (current deepest stage: 0 = nothing,
    * 1 = viewed, 2 = clicked after first view, 3 = purchased after first
    * qualifying click — matching batch q94's strict-order decision). */
  final case class FunnelOut(user_id: Long, stage: Int)

  /** Per-user funnel accumulator: the first view ts, and every
    * click/purchase ts seen (epoch micros). Clicks and purchases must be
    * RETAINED, not min-folded: a later-arriving EARLIER view can newly
    * qualify a click that was previously below t1, so the decision is
    * replayed from the full set on every update. */
  private[streaming] final case class FunnelState(
      minView: Option[Long], clicks: Seq[Long], purchases: Seq[Long])

  /** Streaming strict-order funnel (batch q94's streaming twin): per-user
    * state via `mapGroupsWithState`, one (user, stage) row re-emitted on
    * every update (Update output mode — downstream keeps the latest row
    * per user). The stage decision is recomputed from the accumulated
    * state each time, so out-of-order arrival ACROSS micro-batches gives
    * the same final answer as the batch operator on the same events
    * (spec-pinned). State is bounded by the user's own click/purchase
    * counts — funnel analyses run on bounded campaign windows; for an
    * unbounded feed, bound the state with a session-style event-time
    * timeout like [[sessionize]]'s. */
  def streamingFunnel(events: Dataset[Event]): Dataset[FunnelOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateFunnel _)
  }

  private[streaming] def updateFunnel(userId: Long, evs: Iterator[Event],
      state: GroupState[FunnelState]): FunnelOut = {
    val prev = state.getOption.getOrElse(FunnelState(None, Nil, Nil))
    var minView = prev.minView
    var clicks = prev.clicks
    var purchases = prev.purchases
    evs.foreach { e =>
      val t = epochMicros(e.ts)
      e.event_type match {
        case "view"     => if (minView.forall(t < _)) minView = Some(t)
        case "click"    => clicks = clicks :+ t
        case "purchase" => purchases = purchases :+ t
        case _          => ()
      }
    }
    state.update(FunnelState(minView, clicks, purchases))
    val t2 = minView.flatMap(v => clicks.filter(_ > v).minOption)
    val t3 = t2.flatMap(c => purchases.filter(_ > c).minOption)
    val stage =
      if (t3.isDefined) 3
      else if (t2.isDefined) 2
      else if (minView.isDefined) 1
      else 0
    FunnelOut(userId, stage)
  }

  /** Per-key state transition: fold this batch's events (event-time order)
    * into the open session; emit sessions closed by a gap; park the open
    * session in state with a timeout at `last + gap`. */
  private[streaming] def updateSessions(gapSeconds: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    val gapUs = gapSeconds * 1000000L
    val out = scala.collection.mutable.Buffer.empty[SessionOut]
    // Emitted bounds floor to epoch seconds; the GAP compares micros.
    def close(s: SessionState): Unit =
      out += SessionOut(userId, s.start / 1000000L, s.last / 1000000L,
        s.n, s.total)

    if (state.hasTimedOut) {
      state.getOption.foreach(close)
      state.remove()
    } else {
      var cur = state.getOption
      events.toSeq.sortBy(e => (epochMicros(e.ts), e.event_id)).foreach { e =>
        val t = epochMicros(e.ts)
        cur match {
          // LATE cross-batch arrival older than the open session by more
          // than the gap: batch q19 would place it in an EARLIER session
          // — emit it as its own closed session. (r14 review: it
          // previously merged into the open session unconditionally,
          // since t - s.last <= gap is trivially true for any t <=
          // s.last.) Residual documented divergence: two such stragglers
          // more than a gap before the open session but within a gap of
          // EACH OTHER emit as two singletons where batch would merge
          // them — re-merging needs full event buffering, which the
          // bounded-state contract forbids; the window is capped by the
          // watermark delay.
          case Some(s) if t < s.start - gapUs =>
            out += SessionOut(userId, t / 1000000L, t / 1000000L, 1,
              e.value)
          case Some(s) if t - s.last <= gapUs =>
            // min(start, t): an in-gap late arrival EXTENDS the session
            // backwards exactly as the batch sort would
            cur = Some(SessionState(math.min(s.start, t),
              math.max(s.last, t), s.n + 1, s.total + e.value))
          case Some(s) =>
            close(s)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp((s.last + gapUs) / 1000)
      }
    }
    out.iterator
  }
}
