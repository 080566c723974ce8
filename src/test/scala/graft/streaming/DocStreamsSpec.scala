package graft.streaming

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming JSONL ingest: directory tailing, corrupt-line quarantine,
  * incremental file pickup, and replay idempotency.
  */
class DocStreamsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def writeShard(dir: Path, name: String, lines: String*): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))

  test("jsonlIngest tails a directory: valid rows land batch-partitioned, " +
    "corrupt lines quarantine, new shards arrive incrementally") {
    val root = Files.createTempDirectory("graft-docstream")
    val in = Files.createDirectory(root.resolve("in"))
    val out = root.resolve("out").toString
    val quarantine = root.resolve("bad").toString
    val cp = root.resolve("cp").toString
    writeShard(in, "shard0.jsonl",
      """{"doc_id": 1, "text": "one", "lang": "en", "source": "web"}""",
      """{"doc_id": 2, "text": "two", "lang": "en", "source": "web"}""")
    writeShard(in, "shard1.jsonl",
      """{"doc_id": 3, "text": "three", "lang": "de", "source": "wiki"}""",
      """{broken json line""")
    val reports = scala.collection.mutable.ArrayBuffer[DocStreams.IngestReport]()
    val q = DocStreams.jsonlIngest(
      DocStreams.jsonlTail(spark, in.toString),
      out, quarantine, cp, r => reports.synchronized { reports += r })
    try {
      q.processAllAvailable()
      val got = spark.read.parquet(out)
      assert(got.select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(1L, 2L, 3L))
      assert(got.columns.contains("batch")) // partition column visible
      assert(spark.read.parquet(quarantine).count() === 1L)
      assert(reports.map(_.nValid).sum === 3L)
      assert(reports.map(_.nCorrupt).sum === 1L)

      // a shard that lands AFTER the first drain is picked up alone —
      // the checkpoint prevents any re-read of shard0/shard1
      writeShard(in, "shard2.jsonl",
        """{"doc_id": 4, "text": "four", "lang": "es", "source": "web"}""")
      q.processAllAvailable()
      assert(spark.read.parquet(out)
        .select("doc_id").collect().map(_.getLong(0)).toSet ===
        Set(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("cleanly-parsed rows WITHOUT a doc_id (schema drift) are " +
    "quarantined and counted — pre-r14 they vanished from both sinks " +
    "while the checkpoint marked the shard consumed") {
    val root = Files.createTempDirectory("graft-docstream-nullid")
    val in = Files.createDirectory(root.resolve("in"))
    val out = root.resolve("out").toString
    val quarantine = root.resolve("bad").toString
    val cp = root.resolve("cp").toString
    writeShard(in, "shard0.jsonl",
      """{"doc_id": 1, "text": "one", "lang": "en", "source": "web"}""",
      """{"id": 2, "text": "renamed id field", "lang": "en", "source": "web"}""",
      """{"doc_id": null, "text": "null id", "lang": "en", "source": "web"}""")
    val reports = scala.collection.mutable.ArrayBuffer[DocStreams.IngestReport]()
    val q = DocStreams.jsonlIngest(
      DocStreams.jsonlTail(spark, in.toString),
      out, quarantine, cp, r => reports.synchronized { reports += r })
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out)
        .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L))
      val quarantined = spark.read.parquet(quarantine)
        .select("raw_line").collect().map(_.getString(0))
      assert(quarantined.length === 2)
      assert(quarantined.exists(_.contains("renamed id field")))
      assert(quarantined.exists(_.contains("null id")))
      assert(reports.map(_.nValid).sum === 1L)
      assert(reports.map(_.nCorrupt).sum === 2L)
    } finally q.stop()
  }

  test("ingestBatch replay with the same batchId is idempotent for both " +
    "sinks (crash between the paired writes)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-docstream-replay")
    val out = root.resolve("out").toString
    val quarantine = root.resolve("bad").toString
    val b = Seq(
      (Some(1L), Some("alpha"), Some("en"), Some("web"), None: Option[String]),
      (None, None, None, None, Some("{junk")))
      .toDF("doc_id", "text", "lang", "source", "_corrupt")
    DocStreams.ingestBatch(b, 0L, out, quarantine, _ => ())
    DocStreams.ingestBatch(b, 0L, out, quarantine, _ => ()) // replay
    assert(spark.read.parquet(out).count() === 1L)
    assert(spark.read.parquet(quarantine).count() === 1L)
  }

  test("csvTail drains RFC-4180 shards through the same ingest loop: " +
    "quoted commas survive, malformed rows quarantine") {
    val root = Files.createTempDirectory("graft-csvstream")
    val in = Files.createDirectory(root.resolve("in"))
    val out = root.resolve("out").toString
    val quarantine = root.resolve("bad").toString
    val cp = root.resolve("cp").toString
    writeShard(in, "shard0.csv",
      "doc_id,text,lang,source",
      "1,\"hello, comma\",en,web",
      "2,\"say \"\"hi\"\"\",de,wiki",
      "9,\"unclosed quote,en,web") // corrupt: unterminated quote
    val q = DocStreams.jsonlIngest(
      DocStreams.csvTail(spark, in.toString), out, quarantine, cp)
    try {
      q.processAllAvailable()
      val got = spark.read.parquet(out)
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(1L -> "hello, comma", 2L -> "say \"hi\""))
      assert(spark.read.parquet(quarantine).count() === 1L)
    } finally q.stop()
  }

  test("tokenizedIngest tokenizes landing shards under a loaded vocab, " +
    "matches the batch apply exactly, and picks up late shards " +
    "incrementally") {
    import org.apache.spark.sql.functions.col
    val vocab = graft.operators.TokenizerStore.loadWordPiece(spark,
      "/root/repo/fixtures/tokenizer/wordpiece_vocab.parquet")
    val root = Files.createTempDirectory("graft-tokstream")
    val in = Files.createDirectory(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString
    writeShard(in, "shard0.jsonl",
      """{"doc_id": 1, "text": "the scan", "lang": "en", "source": "web"}""",
      """{"doc_id": 2, "text": "zzz 9", "lang": "en", "source": "web"}""",
      """{broken json line""")
    val reports =
      scala.collection.mutable.ArrayBuffer[DocStreams.TokenizeReport]()
    val q = DocStreams.tokenizedIngest(
      DocStreams.jsonlTail(spark, in.toString), vocab, out, cp,
      r => reports.synchronized { reports += r })
    try {
      q.processAllAvailable()
      writeShard(in, "shard1.jsonl",
        """{"doc_id": 3, "text": "fast table", "lang": "de", "source": "w"}""")
      q.processAllAvailable()
      val got = spark.read.parquet(out)
        .select("doc_id", "tokens", "n_tokens", "has_unk").collect()
        .map(r => r.getLong(0) ->
          ((r.getSeq[String](1), r.getInt(2), r.getBoolean(3)))).toMap
      // golden: the BATCH apply of the same rows — parity by construction
      import spark.implicits._
      val batchDocs = Seq((1L, "the scan"), (2L, "zzz 9"), (3L, "fast table"))
        .toDF("doc_id", "text")
      val expect = graft.operators.WordPiece
        .wordPieceApply(batchDocs, vocab).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(got.keySet === Set(1L, 2L, 3L))
      got.foreach { case (id, (toks, n, unk)) =>
        assert(toks === expect(id), s"doc $id")
        assert(n === toks.size)
        assert(unk === toks.contains(graft.operators.WordPiece.UnkToken))
      }
      // the corrupt line was skipped, not tokenized
      assert(reports.map(_.nDocs).sum === 3L)
      assert(reports.map(_.nUnkDocs).sum >= 1L) // "zzz"/"9" can't segment
      // replay idempotence: re-running a batchId leaves the sink as-is
      val before = spark.read.parquet(out).count()
      DocStreams.tokenizeBatch(
        batchDocs.filter(col("doc_id") === 3L), 1L, vocab, out, _ => ())
      assert(spark.read.parquet(out).count() === before)
    } finally q.stop()
  }
}
