package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tools.WarcFixtureGen

/** WARC source contract: Content-Length frames BYTES (multibyte UTF-8
  * payloads slice correctly), corrupt records surface without sinking
  * the file, and the record-delimiter scan is genuinely splittable —
  * forcing sub-record input splits must not change the parse.
  */
class WarcSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val warcPath: String = {
    val dir = Files.createTempDirectory("graft_warc_spec")
    val f = dir.resolve("sample.warc")
    Files.write(f, WarcFixtureGen.warcBytes)
    f.toString
  }

  test("parses all valid records; the Content-Length-less record is " +
    "_corrupt, not fatal") {
    val df = DocSource.warc(spark, warcPath)
    assert(df.filter(col("_corrupt").isNotNull).count() === 1)
    val valid = df.filter(col("_corrupt").isNull)
    assert(valid.count() ===
      WarcFixtureGen.records.count(!_.corrupt).toLong)
    val types = valid.select("warc_type").as[String](
      org.apache.spark.sql.Encoders.STRING).collect().sorted
    assert(types === WarcFixtureGen.records.filterNot(_.corrupt)
      .map(_.warcType).sorted)
  }

  test("Content-Length frames bytes: the multibyte HTML payload " +
    "round-trips exactly") {
    val expect = WarcFixtureGen.records
      .find(r => r.recordId == "<urn:uuid:0003>").get
    val got = DocSource.warcRecords(spark, warcPath)
      .filter(col("record_id") === "<urn:uuid:0003>")
      .select("payload", "content_length").head()
    assert(got.getString(0) === expect.payload)
    assert(got.getLong(1) ===
      expect.payload.getBytes(StandardCharsets.UTF_8).length.toLong)
    // byte length != char length for this payload — the thing a char
    // slice would get wrong
    assert(got.getLong(1) > expect.payload.length.toLong)
  }

  test("forcing sub-record input splits does not change the parse " +
    "(block-splittable scan)") {
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val hc = spark.sparkContext.hadoopConfiguration
    val before = Option(hc.get(key))
    val whole = DocSource.warcRecords(spark, warcPath)
      .orderBy("record_id").collect().map(_.toString)
    try {
      hc.set(key, "200") // 1.5 KB file → ~8 splits, all mid-record
      val split = DocSource.warcRecords(spark, warcPath)
        .orderBy("record_id").collect().map(_.toString)
      assert(split === whole)
    } finally before match {
      case Some(v) => hc.set(key, v)
      case None => hc.unset(key)
    }
  }

  test("WARC/1.1 files parse all records — the version-agnostic " +
    "delimiter does not silently swallow post-first records") {
    val dir = Files.createTempDirectory("graft_warc11")
    val f = dir.resolve("v11.warc")
    Files.write(f, WarcFixtureGen.serialize(
      WarcFixtureGen.records.filterNot(_.corrupt), version = "1.1"))
    val got = DocSource.warcRecords(spark, f.toString)
    assert(got.count() ===
      WarcFixtureGen.records.count(!_.corrupt).toLong)
    val p = got.filter(col("record_id") === "<urn:uuid:0003>")
      .select("payload").head().getString(0)
    assert(p === WarcFixtureGen.records
      .find(_.recordId == "<urn:uuid:0003>").get.payload)
  }

  test(".warc.gz parses identically through Hadoop codec auto-detection " +
    "(one task per gz file — CommonCrawl's sharding model)") {
    val dir = Files.createTempDirectory("graft_warc_gz")
    val gz = dir.resolve("s.warc.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write(WarcFixtureGen.warcBytes); out.close()
    val fromGz = DocSource.warcRecords(spark, gz.toString)
      .orderBy("record_id").collect().map(_.toString)
    val fromPlain = DocSource.warcRecords(spark, warcPath)
      .orderBy("record_id").collect().map(_.toString)
    assert(fromGz === fromPlain)
  }

  test("a directory of WARC files reads as one corpus") {
    val dir = Files.createTempDirectory("graft_warc_multi")
    val recs = WarcFixtureGen.records.filterNot(_.corrupt)
    Files.write(dir.resolve("a.warc"),
      WarcFixtureGen.serialize(recs.take(2)))
    Files.write(dir.resolve("b.warc"),
      WarcFixtureGen.serialize(recs.drop(2), version = "1.1"))
    val got = DocSource.warcRecords(spark, dir.toString)
    assert(got.count() === recs.size.toLong)
    assert(got.select("record_id").distinct().count() === recs.size.toLong)
  }

  test("warcDocs de-envelopes HTTP responses and strips markup") {
    val docs = DocSource.warcDocs(spark, warcPath).orderBy("url").collect()
    assert(docs.length === 4)
    val a = docs(0)
    assert(a.getAs[String]("url") === "http://example.org/a")
    assert(a.getAs[Int]("http_status") === 200)
    val text = a.getAs[String]("text")
    assert(text.contains("Café 日本") && text.contains("naïve résumé"))
    assert(!text.contains("<") && !text.contains("var x"),
      s"markup or script leaked: $text")
    assert(docs(1).getAs[Int]("http_status") === 404)
    assert(docs(1).getAs[String]("text") === "not here")
  }

  test("a payload CONTAINING the record-delimiter bytes does not split " +
    "the record — whole-file and sub-record-split parses both exact") {
    val rec = WarcFixtureGen.records
      .find(_.recordId == "<urn:uuid:0007>").get
    assert(rec.payload.contains("\r\n\r\nWARC/"), "fixture precondition")
    def payloadOf(): String = DocSource.warcRecords(spark, warcPath)
      .filter(col("record_id") === "<urn:uuid:0007>")
      .select("payload").head().getString(0)
    assert(payloadOf() === rec.payload)
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val hc = spark.sparkContext.hadoopConfiguration
    val before = Option(hc.get(key))
    try {
      hc.set(key, "150") // force many mid-record and mid-payload splits
      assert(payloadOf() === rec.payload)
      assert(DocSource.warcRecords(spark, warcPath).count() ===
        WarcFixtureGen.records.count(!_.corrupt).toLong)
    } finally before match {
      case Some(v) => hc.set(key, v)
      case None => hc.unset(key)
    }
  }

  test("warcRaw round-trips BINARY payloads byte-exactly (invalid-UTF-8 " +
    "PNG bytes survive; text decode would corrupt them), under whole " +
    "and sub-record splits") {
    val dir = Files.createTempDirectory("graft_warc_bin")
    val f = dir.resolve("b.warc")
    Files.write(f, WarcFixtureGen.serialize(WarcFixtureGen.binRecords))
    val png = WarcFixtureGen.binRecords.head
    assert(new String(png.payloadBytes, StandardCharsets.UTF_8)
      .getBytes(StandardCharsets.UTF_8) !== png.payloadBytes,
      "fixture precondition: payload must not survive a UTF-8 round-trip")
    def read() = DocSource.warcRaw(spark, f.toString)
    val valid = read().filter(col("_corrupt").isNull)
    assert(valid.count() === 2L)
    assert(read().filter(col("_corrupt").isNotNull).count() === 1L)
    val got = valid.filter(col("record_id") === png.recordId)
      .select("payload", "content_type", "content_length").head()
    assert(got.getAs[Array[Byte]](0).toSeq === png.payloadBytes.toSeq)
    assert(got.getString(1) === "image/png")
    assert(got.getLong(2) === png.payloadBytes.length.toLong)
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val hc = spark.sparkContext.hadoopConfiguration
    val before = Option(hc.get(key))
    try {
      hc.set(key, "64")
      val split = read().filter(col("record_id") === png.recordId)
        .select("payload").head().getAs[Array[Byte]](0)
      assert(split.toSeq === png.payloadBytes.toSeq)
    } finally before match {
      case Some(v) => hc.set(key, v)
      case None => hc.unset(key)
    }
  }

  test("warcMedia routes binary payloads into the media plane and " +
    "composes with Multimodal's metadata operators") {
    val dir = Files.createTempDirectory("graft_warc_media")
    val f = dir.resolve("m.warc")
    Files.write(f, WarcFixtureGen.serialize(WarcFixtureGen.binRecords))
    val media = DocSource.warcMedia(spark, f.toString)
    val rows = media.collect()
    assert(rows.length === 1) // only the image/png record routes
    val r = rows.head
    assert(r.getAs[String]("kind") === "image")
    assert(r.getAs[String]("content_type") === "image/png")
    assert(r.getAs[Array[Byte]]("bytes").toSeq ===
      WarcFixtureGen.binRecords.head.payloadBytes.toSeq)
    // the bridged frame feeds Multimodal's metadata plane directly
    val fp = media.select(
      graft.operators.Multimodal.byteFingerprint(col("bytes")).as("fp"))
      .head().getString(0)
    assert(fp != null && fp.nonEmpty)
  }

  test("a corrupt record whose start falls after a split's end is " +
    "recovered, not lost — valid AND corrupt counts match whole-file " +
    "at every split size") {
    // Clean payloads (no embedded WARC-ish text), one Content-Length-
    // less record mid-file. Sweeping split.maxsize moves the corrupt
    // record's start across every ownership position relative to split
    // edges; the '_corrupt surfaces, never lost' contract demands
    // (12 valid, 1 corrupt) regardless of layout.
    val recs = (1 to 12).map { i =>
      WarcFixtureGen.Rec("response", f"<urn:uuid:c$i%03d>",
        "2026-01-02T00:00:00Z", s"http://example.org/c$i", "text/plain",
        s"payload body number $i with some filler text to vary offsets")
    }
    val all = (recs.take(6) :+
      WarcFixtureGen.Rec("response", "<urn:uuid:cbad>",
        "2026-01-02T00:00:06Z", "http://example.org/bad", "text/plain",
        "damaged record: headers present, Content-Length missing",
        corrupt = true)) ++ recs.drop(6)
    val dir = Files.createTempDirectory("graft_warc_lossless")
    val f = dir.resolve("c.warc")
    Files.write(f, WarcFixtureGen.serialize(all))
    def counts(): (Seq[String], Long) = {
      val df = DocSource.warc(spark, f.toString)
      (df.filter(col("_corrupt").isNull).select("record_id")
        .collect().map(_.getString(0)).sorted.toSeq,
        df.filter(col("_corrupt").isNotNull).count())
    }
    val (wholeIds, wholeCorrupt) = counts()
    assert(wholeIds.size === 12 && wholeCorrupt === 1L)
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val hc = spark.sparkContext.hadoopConfiguration
    val before = Option(hc.get(key))
    try {
      for (ms <- Seq(40, 80, 150, 200, 300, 500)) {
        hc.set(key, ms.toString)
        val (ids, corrupt) = counts()
        assert(ids === wholeIds, s"valid records diverged at maxsize=$ms")
        assert(corrupt === 1L, s"corrupt count $corrupt at maxsize=$ms")
      }
    } finally before match {
      case Some(v) => hc.set(key, v)
      case None => hc.unset(key)
    }
  }

  test("a payload embedding a PARTIAL WARC header (version + " +
    "Content-Length, no WARC-Type) neither fools the split sync nor " +
    "spawns phantom records") {
    // The real-world false-sync shape: crawled WARC tutorials / mirrored
    // WARC files carry version lines and Content-Length in payload
    // bytes. WARC-Type is the sync-trust discriminator (ISO 28500
    // mandatory), so these embeds must be invisible at every layout.
    val embed = "see: a record head looks like\r\n\r\nWARC/1.0\r\n" +
      "Content-Length: 4\r\n\r\nGOTC and framing follows it"
    val recs = Seq(
      WarcFixtureGen.Rec("response", "<urn:uuid:e001>",
        "2026-01-03T00:00:00Z", "http://example.org/e1", "text/plain",
        "plain first record"),
      WarcFixtureGen.Rec("response", "<urn:uuid:e002>",
        "2026-01-03T00:00:01Z", "http://example.org/e2", "text/plain",
        embed),
      WarcFixtureGen.Rec("response", "<urn:uuid:e003>",
        "2026-01-03T00:00:02Z", "http://example.org/e3", "text/plain",
        "plain last record"))
    val dir = Files.createTempDirectory("graft_warc_embed")
    val f = dir.resolve("e.warc")
    Files.write(f, WarcFixtureGen.serialize(recs))
    def parse(): (Seq[(String, String)], Long) = {
      val df = DocSource.warc(spark, f.toString)
      (df.filter(col("_corrupt").isNull)
        .select("record_id", "payload").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq,
        df.filter(col("_corrupt").isNotNull).count())
    }
    val (wholeRows, wholeCorrupt) = parse()
    assert(wholeRows.map(_._1) ===
      Seq("<urn:uuid:e001>", "<urn:uuid:e002>", "<urn:uuid:e003>"))
    assert(wholeRows(1)._2 === embed)
    assert(wholeCorrupt === 0L)
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val hc = spark.sparkContext.hadoopConfiguration
    val before = Option(hc.get(key))
    try {
      for (ms <- Seq(40, 64, 100, 150, 250)) {
        hc.set(key, ms.toString)
        val (rows, corrupt) = parse()
        assert(rows === wholeRows, s"parse diverged at maxsize=$ms")
        assert(corrupt === 0L, s"phantom corrupt rows at maxsize=$ms")
      }
    } finally before match {
      case Some(v) => hc.set(key, v)
      case None => hc.unset(key)
    }
  }

  test("a payload embedding an untyped WARC head with a HOSTILE " +
    "Content-Length (Long-overflowing or near-2GB) is refuted during " +
    "split sync — no fatal parse error, no giant allocation") {
    // Two hostile shapes the chain-proof must refuse without throwing:
    // a 20-digit CL (Long.parseLong throws raw) and a CL just under
    // Int.MaxValue (the old chain-proof allocated the full claimed
    // buffer before noticing the short read). Both heads are framed
    // (version + CL + terminator) and untyped, the exact
    // verifyFramedChain trigger.
    val overflowCl = "tutorial text\r\n\r\nWARC/1.0\r\n" +
      "Content-Length: 99999999999999999999\r\n\r\nand trailing bytes"
    val giantCl = "mirror text\r\n\r\nWARC/1.0\r\n" +
      "Content-Length: 2147483000\r\n\r\nand more trailing bytes"
    val recs = Seq(
      WarcFixtureGen.Rec("response", "<urn:uuid:h001>",
        "2026-01-04T00:00:00Z", "http://example.org/h1", "text/plain",
        "plain first record"),
      WarcFixtureGen.Rec("response", "<urn:uuid:h002>",
        "2026-01-04T00:00:01Z", "http://example.org/h2", "text/plain",
        overflowCl),
      WarcFixtureGen.Rec("response", "<urn:uuid:h003>",
        "2026-01-04T00:00:02Z", "http://example.org/h3", "text/plain",
        giantCl),
      WarcFixtureGen.Rec("response", "<urn:uuid:h004>",
        "2026-01-04T00:00:03Z", "http://example.org/h4", "text/plain",
        "plain last record"))
    val dir = Files.createTempDirectory("graft_warc_hostile")
    val f = dir.resolve("h.warc")
    Files.write(f, WarcFixtureGen.serialize(recs))
    def parse(): (Seq[(String, String)], Long) = {
      val df = DocSource.warc(spark, f.toString)
      (df.filter(col("_corrupt").isNull)
        .select("record_id", "payload").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq,
        df.filter(col("_corrupt").isNotNull).count())
    }
    val (wholeRows, wholeCorrupt) = parse()
    assert(wholeRows.map(_._1) === Seq("<urn:uuid:h001>",
      "<urn:uuid:h002>", "<urn:uuid:h003>", "<urn:uuid:h004>"))
    assert(wholeRows(1)._2 === overflowCl)
    assert(wholeRows(2)._2 === giantCl)
    assert(wholeCorrupt === 0L)
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val hc = spark.sparkContext.hadoopConfiguration
    val before = Option(hc.get(key))
    try {
      for (ms <- Seq(40, 64, 100, 150, 250)) {
        hc.set(key, ms.toString)
        val (rows, corrupt) = parse()
        assert(rows === wholeRows, s"parse diverged at maxsize=$ms")
        assert(corrupt === 0L, s"phantom corrupt rows at maxsize=$ms")
      }
    } finally before match {
      case Some(v) => hc.set(key, v)
      case None => hc.unset(key)
    }
  }

  test("a headerless HTTP response yields NULL text from warcDocs, " +
    "not header garbage") {
    val row = DocSource.warcDocs(spark, warcPath)
      .filter(col("url") === "http://example.org/f").head()
    assert(row.getAs[Int]("http_status") === 204)
    assert(row.getAs[String]("text") === null)
  }
}
