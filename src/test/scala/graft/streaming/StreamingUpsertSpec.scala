package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Change row for the upsert specs (top-level: Spark can't synthesize an
  * encoder for a class nested inside the suite). */
case class Chg(k: Long, op: String, v: String, seq: Long)

/** Streaming MERGE INTO maintenance: correctness of the merge chain,
  * last-writer-wins collapse, and the replay-idempotency contract
  * (versioned snapshots + predecessor-only reads).
  */
class StreamingUpsertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_upsert").toString

  private def snap(path: String): Map[Long, String] =
    StreamingUpsert.latestSnapshot(spark, path, "k", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("streamingUpsert maintains the snapshot across micro-batches " +
    "(insert, update, delete)") {
    val dir = freshDir()
    val input = MemoryStream[Chg](spark)
    val q = StreamingUpsert.streamingUpsert(input.toDF(), s"$dir/snap",
      s"$dir/ckpt", "k", Seq("v"), "seq")
    try {
      input.addData(Chg(1, "I", "a", 1), Chg(2, "I", "b", 2))
      q.processAllAvailable()
      assert(snap(s"$dir/snap") === Map(1L -> "a", 2L -> "b"))
      input.addData(Chg(1, "U", "a2", 3), Chg(2, "D", "b", 4),
        Chg(3, "I", "c", 5))
      q.processAllAvailable()
      assert(snap(s"$dir/snap") === Map(1L -> "a2", 3L -> "c"))
    } finally q.stop()
  }

  test("multiple changes to one key in a batch collapse last-writer-wins " +
    "by seq") {
    val dir = freshDir()
    val batch = Seq(Chg(1, "I", "first", 1), Chg(1, "U", "last", 9),
      Chg(1, "U", "middle", 5)).toDF()
    StreamingUpsert.upsertBatch(batch, 0L, s"$dir/snap", "k", Seq("v"),
      "seq")
    assert(snap(s"$dir/snap") === Map(1L -> "last"))
  }

  test("seqCol listed in payloadCols (persisting the version in the " +
    "snapshot) works — the collapse struct dedups the field instead of " +
    "throwing an ambiguous-reference error") {
    val dir = freshDir()
    val batch = Seq(Chg(1, "I", "first", 1), Chg(1, "U", "last", 9)).toDF()
    StreamingUpsert.upsertBatch(batch, 0L, s"$dir/snap", "k",
      Seq("v", "seq"), "seq")
    val row = spark.read.parquet(s"$dir/snap/snap_v0")
      .select("k", "v", "seq").collect()(0)
    assert(row.getLong(0) === 1L && row.getString(1) === "last" &&
      row.getLong(2) === 9L)
  }

  test("replaying a batch after its own (committed or partial) write " +
    "leaves the chain as a single run would") {
    val dir = freshDir()
    StreamingUpsert.upsertBatch(Seq(Chg(1, "I", "a", 1)).toDF(), 0L,
      s"$dir/snap", "k", Seq("v"), "seq")
    val b1 = Seq(Chg(1, "U", "a2", 2), Chg(2, "I", "b", 3)).toDF()
    StreamingUpsert.upsertBatch(b1, 1L, s"$dir/snap", "k", Seq("v"), "seq")
    val once = snap(s"$dir/snap")
    // crash-replay: batch 1 runs again with its own v1 output present —
    // it must read v0 (not its own output) and rewrite identically
    StreamingUpsert.upsertBatch(b1, 1L, s"$dir/snap", "k", Seq("v"), "seq")
    assert(snap(s"$dir/snap") === once)
    assert(once === Map(1L -> "a2", 2L -> "b"))
  }

  test("snapshotAt time-travels to the latest committed version at or " +
    "before the asked id") {
    val dir = freshDir()
    StreamingUpsert.upsertBatch(Seq(Chg(1, "I", "a", 1)).toDF(), 0L,
      s"$dir/snap", "k", Seq("v"), "seq")
    StreamingUpsert.upsertBatch(Seq(Chg(1, "U", "a2", 2)).toDF(), 3L,
      s"$dir/snap", "k", Seq("v"), "seq")
    def at(v: Long) = StreamingUpsert.snapshotAt(spark, s"$dir/snap", v,
      "k", Seq("v")).collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(at(0L) === Map(1L -> "a"))
    assert(at(2L) === Map(1L -> "a")) // gap: falls back to v0
    assert(at(3L) === Map(1L -> "a2"))
    assert(at(99L) === Map(1L -> "a2"))
  }

  test("StreamingDrift.psiMonitor: an in-distribution batch scores low, " +
    "a shifted batch scores high, one row per batch") {
    val dir = freshDir()
    val ref = spark.range(1, 101).selectExpr("id / 10.0 AS s")
    val input = MemoryStream[Double](spark)
    val q = StreamingDrift.psiMonitor(input.toDF().toDF("s"), ref, "s",
      s"$dir/psi", s"$dir/ckpt")
    try {
      input.addData((1 to 100).map(_ / 10.0): _*) // same distribution
      q.processAllAvailable()
      input.addData((1 to 100).map(_ / 10.0 + 50): _*) // shifted
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$dir/psi")
        .orderBy("batch_id").collect()
        .map(r => r.getAs[Long]("batch_id") -> r.getAs[Double]("psi"))
      assert(rows.length === 2)
      assert(math.abs(rows(0)._2) < 1e-9)
      assert(rows(1)._2 > 0.25)
    } finally q.stop()
  }

  test("an uncommitted snapshot directory (no _SUCCESS) is invisible to " +
    "version listing") {
    val dir = freshDir()
    StreamingUpsert.upsertBatch(Seq(Chg(1, "I", "a", 1)).toDF(), 0L,
      s"$dir/snap", "k", Seq("v"), "seq")
    // simulate a crash mid-write of v1: directory exists, no _SUCCESS
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/snap/snap_v1"))
    assert(StreamingUpsert.versions(spark, s"$dir/snap") === Seq(0L))
    assert(snap(s"$dir/snap") === Map(1L -> "a"))
  }
}
