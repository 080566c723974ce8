package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes the committed WARC fixture (`fixtures/warc/`): the raw
  * `sample.warc` bytes AND the expected parse (`expected.parquet`) are
  * both emitted from the same literal record list below, so the
  * expectation is independent of the parser under test — the q-entry
  * oracle compares `DocSource.warc` output against this golden exactly
  * like the media fixtures (q50-q52) do.
  *
  * The records deliberately exercise: a warcinfo preamble, an HTTP
  * response with multibyte UTF-8 (Content-Length counts BYTES — the
  * reader must slice bytes, not chars), a text/plain conversion record,
  * a request record, and one corrupt record (no Content-Length) that
  * must surface as `_corrupt`, not sink the file.
  */
object WarcFixtureGen {

  final case class Rec(
      warcType: String, recordId: String, date: String, targetUri: String,
      contentType: String, payload: String, corrupt: Boolean = false,
      payloadBin: Option[Array[Byte]] = None,
      /** Omit the (ISO-mandatory) WARC-Type header: a spec-violating
        * but still Content-Length-framed record — the sequential reader
        * frames it, so split sync must recover it by chain proof. */
      untyped: Boolean = false) {
    /** The on-wire payload bytes: explicit binary if set, else UTF-8 of
      * the string payload. */
    def payloadBytes: Array[Byte] =
      payloadBin.getOrElse(payload.getBytes(StandardCharsets.UTF_8))
  }

  val records: Seq[Rec] = Seq(
    Rec("warcinfo", "<urn:uuid:0001>", "2026-01-01T00:00:00Z", "",
      "application/warc-fields",
      "software: graft-fixture/1.0\r\nformat: WARC File Format 1.0\r\n"),
    Rec("request", "<urn:uuid:0002>", "2026-01-01T00:00:01Z",
      "http://example.org/a", "application/http;msgtype=request",
      "GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n"),
    Rec("response", "<urn:uuid:0003>", "2026-01-01T00:00:02Z",
      "http://example.org/a", "application/http;msgtype=response",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" +
        "<html><head><title>Café 日本</title></head>" +
        "<body><p>naïve résumé — 中文</p>" +
        "<script>var x=1;</script></body></html>"),
    Rec("conversion", "<urn:uuid:0004>", "2026-01-01T00:00:03Z",
      "http://example.org/b", "text/plain",
      "plain text conversion record\nsecond line\n"),
    Rec("response", "<urn:uuid:0005>", "2026-01-01T00:00:04Z",
      "http://example.org/c", "application/http;msgtype=response",
      "HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\n" +
        "not here"),
    // Corrupt: Content-Length header missing entirely. Mid-file, so the
    // reader's recovery scan must hand off cleanly to the next record.
    Rec("response", "<urn:uuid:0006>", "2026-01-01T00:00:05Z",
      "http://example.org/d", "text/plain", "orphan payload",
      corrupt = true),
    // Strict-framing proof: the payload CONTAINS the record-delimiter
    // byte sequence (`\r\n\r\nWARC/`) — the r9 record-delimiter scan
    // split this record early; Content-Length framing reads straight
    // through it. The embedded fragment deliberately has no
    // Content-Length, so a split-sync candidate landing on it is
    // rejected by head validation.
    Rec("response", "<urn:uuid:0007>", "2026-01-01T00:00:06Z",
      "http://example.org/e", "application/http;msgtype=response",
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" +
        "tutorial: a WARC record begins\r\n\r\nWARC/1.0\r\n" +
        "WARC-Type: response\r\nlike that, and ends after its payload"),
    // Headerless HTTP response: no \r\n\r\n terminator anywhere in the
    // payload — warcDocs must surface NULL text, not header garbage.
    Rec("response", "<urn:uuid:0008>", "2026-01-01T00:00:07Z",
      "http://example.org/f", "application/http;msgtype=response",
      "HTTP/1.1 204 No Content\r\nServer: fixture"))

  /** Binary-payload fixture (`fixtures/warc_bin/`): a PNG-magic payload
    * whose bytes are NOT valid UTF-8 (a text decode would corrupt them —
    * the case `DocSource.warcRaw` exists for; note the payload also
    * contains a bare `\r\n` run), a plain-text record sharing the binary
    * plane, and a corrupt record. */
  val binRecords: Seq[Rec] = Seq(
    Rec("resource", "<urn:uuid:0101>", "2026-01-02T00:00:00Z",
      "http://example.org/logo.png", "image/png", "",
      payloadBin = Some(Array[Byte](0x89.toByte, 'P', 'N', 'G',
        '\r', '\n', 0x1A, '\n', 0xFF.toByte, 0xFE.toByte, 0x00, 0x01,
        0xC0.toByte, 0x80.toByte, 'e', 'n', 'd'))),
    Rec("response", "<urn:uuid:0102>", "2026-01-02T00:00:01Z",
      "http://example.org/t", "text/plain", "plain text in a binary plane"),
    Rec("response", "<urn:uuid:0103>", "2026-01-02T00:00:02Z",
      "http://example.org/u", "text/plain", "orphan", corrupt = true))

  /** The one WARC record serializer — the fixture bytes AND the property
    * test's generated files both come from here, so a framing change
    * cannot silently diverge between them. */
  def serialize(recs: Seq[Rec], version: String = "1.0"): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val payloadBytes = r.payloadBytes
      val headers = new StringBuilder()
      headers.append(s"WARC/$version\r\n")
      if (!r.untyped)
        headers.append(s"WARC-Type: ${r.warcType}\r\n")
      headers.append(s"WARC-Record-ID: ${r.recordId}\r\n")
      headers.append(s"WARC-Date: ${r.date}\r\n")
      if (r.targetUri.nonEmpty)
        headers.append(s"WARC-Target-URI: ${r.targetUri}\r\n")
      headers.append(s"Content-Type: ${r.contentType}\r\n")
      if (!r.corrupt)
        headers.append(s"Content-Length: ${payloadBytes.length}\r\n")
      headers.append("\r\n")
      out.write(headers.toString.getBytes(StandardCharsets.UTF_8))
      out.write(payloadBytes)
      out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
    }
    out.toByteArray
  }

  def warcBytes: Array[Byte] = serialize(records)

  def main(args: Array[String]): Unit = {
    val dir = Paths.get("fixtures/warc")
    Files.createDirectories(dir)
    Files.write(dir.resolve("sample.warc"), warcBytes)

    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    // The EXPECTED parse, from the literal records (not the parser):
    // valid records only — record_id is the stable compare key; the
    // corrupt record's tolerance (surfaces in _corrupt, doesn't sink the
    // file) is pinned by WarcSourceSpec, whose framing is
    // parser-specific. Payloads are the exact Content-Length byte slices
    // (= the full literal payload here).
    records.filterNot(_.corrupt).map { r =>
      (r.warcType, r.recordId, r.date,
        if (r.targetUri.isEmpty) null else r.targetUri,
        r.payload,
        r.payload.getBytes(StandardCharsets.UTF_8).length.toLong)
    }.toDF("warc_type", "record_id", "warc_date", "target_uri",
        "payload", "content_length")
      .coalesce(1)
      .write.mode("overwrite").parquet("fixtures/warc/expected.parquet")

    // Binary fixture: same discipline, payload as raw BYTES (BinaryType
    // in the golden so the comparison is byte-exact, never a decode).
    val binDir = Paths.get("fixtures/warc_bin")
    Files.createDirectories(binDir)
    Files.write(binDir.resolve("sample.warc"), serialize(binRecords))
    binRecords.filterNot(_.corrupt).map { r =>
      (r.warcType, r.recordId, r.date,
        if (r.targetUri.isEmpty) null else r.targetUri,
        if (r.contentType.isEmpty) null else r.contentType,
        r.payloadBytes,
        r.payloadBytes.length.toLong)
    }.toDF("warc_type", "record_id", "warc_date", "target_uri",
        "content_type", "payload", "content_length")
      .coalesce(1)
      .write.mode("overwrite").parquet("fixtures/warc_bin/expected.parquet")
    spark.stop()
    println(s"wrote fixtures/warc/sample.warc (${warcBytes.length} bytes) " +
      s"+ expected.parquet (${records.size} records) " +
      s"+ warc_bin (${binRecords.size} records)")
  }
}
