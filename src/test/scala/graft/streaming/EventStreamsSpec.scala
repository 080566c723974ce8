package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.EventStreams.Event

/** Drives the streaming transforms with MemoryStream — micro-batches with
  * controlled event time, so watermark and timeout behavior is
  * deterministic.
  */
class EventStreamsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, sec: Long, user: Long, kind: String,
      value: Double): Event =
    Event(id, new Timestamp(sec * 1000), user, kind, value)

  test("windowedCounts aggregates tumbling windows under a watermark") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.windowedCounts(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        ev(1, 10, 1, "click", 1.0), ev(2, 200, 2, "click", 2.0),
        ev(3, 400, 1, "buy", 10.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("event_type", "n", "total_value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows === Set(("click", 2L, 3.0), ("buy", 1L, 10.0)))
    } finally q.stop()
  }

  test("sessionize emits a session closed by a gap and one by timeout") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionize(input.toDS(), gapSeconds = 1800,
      watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1 -> two events 100 s apart (one open session)
      input.addData(ev(1, 1000, 1, "click", 1.0), ev(2, 1100, 1, "click", 2.0))
      q.processAllAvailable()
      // batch 2: a same-user event past the gap closes session 1 directly
      input.addData(ev(3, 10000, 1, "buy", 5.0))
      q.processAllAvailable()
      val afterGap = spark.table("sess_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(afterGap === Set((1L, 1000L, 1100L, 2L, 3.0)))

      // batch 3: another user far in the future advances the watermark past
      // 10000 + 1800 -> user 1's open session times out and is emitted
      input.addData(ev(4, 50000, 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(ev(5, 90000, 2, "click", 1.0))
      q.processAllAvailable()
      val afterTimeout = spark.table("sess_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterTimeout.contains((1L, 10000L)),
        s"expected user 1's second session to time out; got $afterTimeout")
    } finally q.stop()
  }

  test("sessionize late cross-batch arrivals match batch q19 semantics: " +
    "an in-gap straggler extends the session START; an older-than-gap " +
    "straggler becomes its own closed session, never a silent merge") {
    val input = MemoryStream[Event](spark)
    // generous watermark so the late events are NOT dropped as late rows
    val q = EventStreams.sessionize(input.toDS(), gapSeconds = 1800,
      watermarkDelay = "2 days")
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1 opens session [5000, 5001]
      input.addData(ev(1, 5000, 1, "c", 1.0), ev(2, 5001, 1, "c", 1.0))
      q.processAllAvailable()
      // batch 2: t=4000 is within gap of start (1000 <= 1800) — batch
      // q19's sort places it in the SAME session, extending its start;
      // t=2000 is older than start - gap — a SEPARATE earlier session
      input.addData(ev(3, 4000, 1, "c", 1.0), ev(4, 2000, 1, "c", 1.0))
      q.processAllAvailable()
      // batch 3: far-future same-user event closes the open session
      input.addData(ev(5, 100000, 1, "c", 1.0))
      q.processAllAvailable()
      val got = spark.table("sess_late")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // pre-fix: ONE session (5000, 5001, 4) — both stragglers merged in
      // and the start never moved
      assert(got === Set((2000L, 2000L, 1L), (4000L, 5001L, 3L)), got)
    } finally q.stop()
  }

  test("streamingExactDedup drops in-horizon duplicate content") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val q = EventStreams.streamingExactDedup(
      input.toDF().toDF("doc_id", "ts", "text"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, new Timestamp(1000 * 1000), "alpha beta"),
        (2L, new Timestamp(1010 * 1000), "gamma delta"))
      q.processAllAvailable()
      // batch 2: same content as doc 1 (different id) inside the horizon
      input.addData((3L, new Timestamp(1020 * 1000), "alpha beta"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L))
    } finally q.stop()
  }

  test("streamingNoveltyGate passes novel docs, drops reference-built " +
    "ones, stateless append mode; decisions match the batch noveltyScore") {
    val ref = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val novel = "qq ww ee rr tt yy uu ii"
    val fromRef = "alpha beta gamma delta epsilon"      // all grams in ref
    val mixed = "alpha beta gamma qq ww ee rr tt yy uu" // mostly new
    // batch ground truth on the same fixture
    val batchNov = graft.operators.TextAnalysis.noveltyScore(
        Seq((1L, novel), (2L, fromRef), (3L, mixed)).toDF("doc_id", "text"),
        ref)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(batchNov(1L) === 1.0 && batchNov(2L) === 0.0)

    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val q = EventStreams.streamingNoveltyGate(
      input.toDF().toDF("doc_id", "ts", "text"), ref, minNovelty = 0.5)
      .writeStream.format("memory").queryName("novelty_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, new Timestamp(1000 * 1000), novel),
        (2L, new Timestamp(1010 * 1000), fromRef),
        (3L, new Timestamp(1020 * 1000), mixed),
        (4L, new Timestamp(1030 * 1000), ""))   // gramless -> novelty 0
      q.processAllAvailable()
      val out = spark.table("novelty_out")
        .select("doc_id", "novelty").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // the gate keeps exactly the docs whose exact batch novelty >= 0.5
      // (Bloom FPs could only lower a score; margins here are wide)
      assert(out.keySet === batchNov.filter(_._2 >= 0.5).keys.toSet)
      assert(out(1L) === 1.0)
      assert(math.abs(out(3L) - batchNov(3L)) < 0.15)
    } finally q.stop()
  }

  test("streamingNearDupDedup drops same-signature content; " +
    "rowSimhash64 is value-identical to the batch simhash64") {
    // value equivalence first (the streaming signature must equal the
    // batch one, or stream-then-batch pipelines would disagree)
    val docs = (0 until 50).map(i =>
      (i.toLong, s"alpha bravo token$i charlie delta echo fox golf"))
      .toDF("doc_id", "text")
    val batch = graft.operators.Dedup.simhash64(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val row = docs.select(col("doc_id"),
        graft.operators.Dedup.rowSimhash64(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(row === batch)

    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val q = EventStreams.streamingNearDupDedup(
      input.toDF().toDF("doc_id", "ts", "text"), "10 minutes")
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, new Timestamp(1000 * 1000), "alpha beta gamma delta"),
        (2L, new Timestamp(1010 * 1000), "entirely different words here"))
      q.processAllAvailable()
      // identical shingle votes (same text) inside the horizon -> dropped
      input.addData((3L, new Timestamp(1020 * 1000), "alpha beta gamma delta"))
      q.processAllAvailable()
      val ids = spark.table("neardup_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 2L))
    } finally q.stop()
  }

  test("streamingAsofEnrich matches the batch broadcast as-of join " +
    "and runs stateless in append mode") {
    val quotes = Seq(
      (1L, new Timestamp(10 * 1000), 100.0),
      (1L, new Timestamp(20 * 1000), 200.0),
      (2L, new Timestamp(15 * 1000), 150.0))
      .toDF("user_id", "ts", "price")
    val batchRows = Seq(
      (101L, 1L, new Timestamp(5 * 1000)),   // before any quote -> null
      (102L, 1L, new Timestamp(25 * 1000)),  // latest = 200
      (103L, 2L, new Timestamp(16 * 1000)),  // 150
      (104L, 3L, new Timestamp(30 * 1000)))  // keyless -> null
    val expected = graft.operators.TemporalJoin.asofJoinBroadcast(
      batchRows.toDF("trade_id", "user_id", "ts"), quotes,
      "user_id", "ts", "ts", Seq("price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

    val input = MemoryStream[(Long, Long, Timestamp)](spark)
    val q = EventStreams.streamingAsofEnrich(
      input.toDF().toDF("trade_id", "user_id", "ts"), quotes,
      "user_id", "ts", "ts", Seq("price"))
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(batchRows: _*)
      q.processAllAvailable()
      val got = spark.table("asof_out").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(got === expected)
      assert(got === Map(101L -> None, 102L -> Some(200.0),
        103L -> Some(150.0), 104L -> None))
      // Stateless claim: no state store operator in the streaming plan.
      assert(!q.lastProgress.toString.contains("stateOperators\" : [ {"),
        q.lastProgress.toString.take(500))
    } finally q.stop()
  }

  test("streamingIndexDedup drops stream docs whose fingerprint is in " +
    "the static corpus index") {
    val corpus = Seq(
      (100L, "alpha beta gamma delta"),
      (101L, "known corpus content here"))
      .toDF("doc_id", "text")
    val index = graft.operators.Dedup.dedupIndex(corpus, portable = true)
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val q = EventStreams.streamingIndexDedup(
      input.toDF().toDF("doc_id", "ts", "text"), index)
      .writeStream.format("memory").queryName("ixdedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, new Timestamp(1000 * 1000), "alpha beta gamma delta"), // in corpus
        (2L, new Timestamp(1010 * 1000), "fresh novel document text"))
      q.processAllAvailable()
      val ids = spark.table("ixdedup_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids === Set(2L))
    } finally q.stop()
  }

  test("streaming sessionize matches batch q19 on the harness events") {
    // The two surfaces share gap semantics (1800 s compared in exact
    // microseconds) but nothing else — different engines (window+lag vs
    // keyed state), different orderings. Pin them against each other on
    // real data: per-user session counts and event totals must be equal.
    import org.apache.spark.sql.functions.col
    val sfDir = "/root/testdata/sf0.001"
    val evs = graft.catalog.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event].collect().toSeq
    val maxSec = evs.map(_.ts.getTime / 1000).max

    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionize(input.toDS(), gapSeconds = 1800,
      watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("sess_eq")
      .outputMode(OutputMode.Append).start()
    try {
      // All real data in ONE batch (watermark only advances after it, so
      // nothing is late-dropped), then two sentinel batches from a user id
      // outside the data: the first advances the watermark past every
      // open session's timeout, the next batch fires the timeouts.
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData(ev(-1, maxSec + 3600 + 1800 + 10, -1L, "x", 0.0))
      q.processAllAvailable()
      input.addData(ev(-2, maxSec + 2 * (3600 + 1800), -1L, "x", 0.0))
      q.processAllAvailable()

      val streamed = spark.table("sess_eq")
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.count(col("user_id"))
          .as("n_sessions"),
          org.apache.spark.sql.functions.sum("n_events").as("n_events"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

      val batch = graft.catalog.Queries.byName("q19_sessionize")(spark, sfDir)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

      assert(streamed === batch)
    } finally q.stop()
  }

  test("sessionize state transition folds batches in event-time order") {
    // Direct unit test of the state function (no streaming query needed).
    val out = scala.collection.mutable.Buffer.empty[EventStreams.SessionOut]
    // simulate: unordered events, one gap inside the batch
    val events = Iterator(
      ev(2, 5000, 7, "b", 2.0), ev(1, 1000, 7, "a", 1.0), ev(3, 1100, 7, "c", 3.0))
    val state = new TestGroupState
    out ++= EventStreams.updateSessions(1800)(7L, events, state)
    assert(out.map(s => (s.session_start, s.session_end, s.n_events)).toList ===
      List((1000L, 1100L, 2L))) // first session closed by the 5000s event
    assert(state.updated.map(_.toString).nonEmpty) // 5000s session parked
  }

  test("selfMaintainingIngest dedups each batch against the growing " +
    "at-rest index and appends survivors + index rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest")
    val idx = s"$dir/index"; val out = s"$dir/docs"; val ck = s"$dir/ck"
    val in = MemoryStream[(Long, String)](spark)
    val q = EventStreams.selfMaintainingIngest(
      in.toDF().toDF("doc_id", "text"), idx, out, ck, portable = true)
    try {
      // batch 1: two novel docs + one in-batch exact dup
      in.addData(
        (1L, "alpha bravo charlie delta echo"),
        (2L, "foxtrot golf hotel india juliet"),
        (3L, "alpha bravo charlie delta echo")) // dup of 1 in-batch
      q.processAllAvailable()
      // batch 2: dup of an ALREADY-INGESTED doc + one novel doc
      in.addData(
        (10L, "alpha bravo charlie delta echo"), // exact dup of doc 1
        (11L, "kilo lima mike november oscar"))
      q.processAllAvailable()
      val ingested = spark.read.parquet(out)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ingested === Set(1L, 2L, 11L))
      // the index holds exactly the survivors' rows (1 fp row + bands
      // per doc via the (fp, band, key) projection)
      val indexIds = spark.read.parquet(idx)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(indexIds === Set(1L, 2L, 11L))
    } finally q.stop()
  }

  test("ingestBatch replay (same batchId re-run after a crash between " +
    "the paired writes) is idempotent: no duplicate docs, no self-shadow") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-replay")
    val idx = s"$dir/index"; val out = s"$dir/docs"
    val b1 = Seq((1L, "alpha bravo charlie delta echo"),
      (2L, "foxtrot golf hotel india juliet")).toDF("doc_id", "text")
    EventStreams.ingestBatch(b1, 0L, idx, out, 16, 4, portable = true,
      textCol = "text", idCol = "doc_id")
    // Crash-replay of batch 0: checkpoint recovery re-delivers the same
    // data with the same batchId. The index now already holds batch 0's
    // own rows — they must be excluded, or every doc is a "duplicate" of
    // itself and the batch vanishes from the output.
    EventStreams.ingestBatch(b1, 0L, idx, out, 16, 4, portable = true,
      textCol = "text", idCol = "doc_id")
    val docs = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(docs === Seq(1L, 2L)) // each doc exactly once, not zero, not 2x
    // a later batch still dedups against batch 0's index rows
    val b2 = Seq((10L, "alpha bravo charlie delta echo"),
      (11L, "kilo lima mike november oscar")).toDF("doc_id", "text")
    EventStreams.ingestBatch(b2, 1L, idx, out, 16, 4, portable = true,
      textCol = "text", idCol = "doc_id")
    val all = spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(all === Set(1L, 2L, 11L))
  }

  test("windowedDistinctUsers counts distinct users per window via the " +
    "HLL sketch (exact at test cardinalities)") {
    val input = MemoryStream[Event](spark)
    val q = EventStreams.windowedDistinctUsers(input.toDF(),
        "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("wdu_out")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(
        ev(1, 10, 1, "click", 1.0), ev(2, 20, 2, "click", 1.0),
        ev(3, 30, 1, "buy", 1.0),   // same user again, same window
        ev(4, 400, 3, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wdu_out")
        .select("n_users", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((2L, 3L), (1L, 1L)))
    } finally q.stop()
  }

  test("the Column-algebra text operators compose unchanged on a stream " +
    "(scrub -> quality -> langId as one stateless projection)") {
    import graft.operators.TextAnalysis
    val rows = Seq(
      (1L, "the quick brown fox and the lazy dog run through the field"),
      (2L, "mail a.b@example.com 999 12 3456"),
      (3L, "der hund und die katze ist ein tier heute"))
    val batch = rows.toDF("doc_id", "text")
    def clean(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        TextAnalysis.scrubPii(col("text")).as("text"))
        .withColumn("q",
          org.apache.spark.sql.functions.round(
            TextAnalysis.qualityScore(col("text")), 3))
        .withColumn("lang", TextAnalysis.langId(col("text")).getField("lang"))
    val expected = clean(batch).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3))).toSet

    val in = MemoryStream[(Long, String)](spark)
    val q = clean(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("clean_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("clean_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getString(3))).toSet
      assert(got === expected)
      // stateless: no state store operator in the streaming plan
      assert(!q.lastProgress.stateOperators.iterator.hasNext ||
        q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }

  test("streamStreamIntervalJoin matches the batch rangeJoin pair set") {
    // batch 2 (user 2) sits AFTER batch 1's max event time: with a 0 s
    // watermark delay, older rows in a later batch would be legitimately
    // dropped as late — the equivalence holds for in-watermark arrivals.
    val errors = Seq(
      ev(1, 1000, 1, "error", 0.0), ev(2, 9000, 1, "error", 0.0),
      ev(3, 12000, 2, "error", 0.0))
    val clicks = Seq(
      ev(10, 1500, 1, "click", 5.0),   // in window of error 1
      ev(11, 4500, 1, "click", 6.0),   // outside (width 3000 s)
      ev(12, 9100, 1, "click", 7.0),   // in window of error 2
      ev(13, 12000, 2, "click", 8.0),  // boundary: rightTime == leftTime, in
      ev(14, 11999, 2, "click", 9.0))  // before the error, out
    val expected = graft.operators.TemporalJoin.rangeJoin(
        errors.toDF(), clicks.toDF(), "user_id", "ts", "ts",
        widthSec = 3000L)
      .select("event_id", "r_event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected === Set((1L, 10L), (2L, 12L), (3L, 13L)))

    val lIn = MemoryStream[Event](spark)
    val rIn = MemoryStream[Event](spark)
    val q = EventStreams.streamStreamIntervalJoin(
        lIn.toDF(), rIn.toDF(), "user_id", "ts", "ts", widthSec = 3000L,
        watermarkDelay = "0 seconds")
      .select(col("event_id"), col("r_event_id"))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append).start()
    try {
      lIn.addData(errors.take(2): _*)
      rIn.addData(clicks.take(3): _*)
      q.processAllAvailable()
      lIn.addData(errors.drop(2): _*)
      rIn.addData(clicks.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("streamingFunnel matches the batch strict-order decision under " +
    "cross-batch out-of-order arrival") {
    val input = MemoryStream[EventStreams.Event](spark)
    val q = EventStreams.streamingFunnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Update).start()
    // the memory sink APPENDS each batch's update rows: snapshot per
    // batch and compare the cumulative emission sets
    def emitted() = spark.table("funnel_out").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toSeq
    try {
      // batch 1: user 1's click+purchase arrive BEFORE its view
      input.addData(
        ev(1, 100, 1, "click", 0), ev(2, 200, 1, "purchase", 0),
        ev(3, 50, 2, "view", 0), ev(4, 60, 2, "purchase", 0))
      q.processAllAvailable()
      assert(emitted().toSet === Set(1L -> 0, 2L -> 1))
      // batch 2: user 1's view lands EARLIER than the batch-1 click —
      // the retained clicks/purchases must now complete the funnel.
      // User 2 gets a click AFTER its purchase: stays at stage 2 (the
      // purchase at 60 does not follow the click at 70).
      input.addData(ev(5, 10, 1, "view", 0), ev(6, 70, 2, "click", 0))
      q.processAllAvailable()
      assert(emitted().toSet ===
        Set(1L -> 0, 2L -> 1, 1L -> 3, 2L -> 2))
    } finally q.stop()
  }
}

/** Minimal GroupState stub for direct state-function tests. */
private class TestGroupState
    extends org.apache.spark.sql.streaming.GroupState[EventStreams.SessionState] {
  var updated: Option[EventStreams.SessionState] = None
  private var timeout: Long = -1
  def exists: Boolean = updated.isDefined
  def get: EventStreams.SessionState = updated.get
  def getOption: Option[EventStreams.SessionState] = updated
  def update(s: EventStreams.SessionState): Unit = updated = Some(s)
  def remove(): Unit = updated = None
  def hasTimedOut: Boolean = false
  def setTimeoutDuration(d: Long): Unit = timeout = d
  def setTimeoutDuration(d: String): Unit = ()
  def setTimeoutTimestamp(t: Long): Unit = timeout = t
  def setTimeoutTimestamp(t: Long, add: String): Unit = timeout = t
  def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
  def getCurrentWatermarkMs(): Long = 0L
  def getCurrentProcessingTimeMs(): Long = 0L
}
