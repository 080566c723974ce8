package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property round-trip for the WARC reader: arbitrary record lists
  * (unicode payloads, CR/LF content, empty payloads, mixed types) are
  * serialized to WARC bytes and must parse back EXACTLY — ids, types,
  * uris, and byte-framed payloads. Payloads exclude the record
  * delimiter byte sequence, which is the reader's one documented
  * framing limit (DocSource.warc scaladoc).
  */
class WarcPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private case class R(id: Int, warcType: String, uri: String,
      payload: String)

  private val genPayload: Gen[String] = Gen.oneOf(
    // prose with newlines and CRLF
    Gen.listOf(Gen.oneOf("word", "línea", "日本語", "a&b<c>", "\r\n", "\n",
      " ", "é")).map(_.mkString),
    // HTTP-ish envelope
    Gen.alphaNumStr.map(b =>
      s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n$b"),
    Gen.const(""))

  private val genRec: Gen[R] = for {
    t <- Gen.oneOf("response", "request", "conversion", "metadata")
    u <- Gen.oneOf("", "http://ex.org/p?q=1", "https://ex.org/ü")
    p <- genPayload
  } yield R(0, t, u, p)

  private def serialize(recs: Seq[R]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val pb = r.payload.getBytes(StandardCharsets.UTF_8)
      val h = new StringBuilder()
      h.append("WARC/1.0\r\n")
      h.append(s"WARC-Type: ${r.warcType}\r\n")
      h.append(s"WARC-Record-ID: <urn:uuid:${r.id}>\r\n")
      h.append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      if (r.uri.nonEmpty) h.append(s"WARC-Target-URI: ${r.uri}\r\n")
      h.append("Content-Type: application/octet-stream\r\n")
      h.append(s"Content-Length: ${pb.length}\r\n\r\n")
      out.write(h.toString.getBytes(StandardCharsets.UTF_8))
      out.write(pb)
      out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
    }
    out.toByteArray
  }

  test("serialize → parse round-trips arbitrary record lists exactly") {
    val prop = Prop.forAll(Gen.choose(1, 8).flatMap(n =>
        Gen.listOfN(n, genRec))) { recs0 =>
      val recs = recs0.zipWithIndex.map { case (r, i) => r.copy(id = i) }
        // documented limit: payload must not embed the record delimiter
        .filterNot(_.payload.contains("\r\n\r\nWARC/1.0\r\n"))
      if (recs.isEmpty) Prop.passed else Prop.secure {
        val dir = Files.createTempDirectory("graft_warc_prop")
        val f = dir.resolve("t.warc")
        Files.write(f, serialize(recs))
        val got = DocSource.warcRecords(spark, f.toString)
          .collect()
          .map(r => (r.getAs[String]("record_id"),
            r.getAs[String]("warc_type"),
            Option(r.getAs[String]("target_uri")).getOrElse(""),
            r.getAs[String]("payload")))
          .sortBy(_._1)
        val want = recs
          .map(r => (s"<urn:uuid:${r.id}>", r.warcType, r.uri, r.payload))
          .sortBy(_._1)
        got.toSeq == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
