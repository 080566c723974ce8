package graft.sources

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tools.WarcFixtureGen
import graft.tools.WarcFixtureGen.Rec

/** Property round-trip for the WARC reader: arbitrary record lists
  * (unicode payloads, CR/LF content, empty payloads, mixed types) are
  * serialized — by the SAME serializer that writes the committed
  * fixture, so the framing under test cannot diverge from the golden's
  * — and must parse back EXACTLY, for both WARC/1.0 and WARC/1.1
  * version lines. Since the strict Content-Length InputFormat, payloads
  * may freely CONTAIN the record-delimiter byte sequence — the
  * generator deliberately includes that fragment.
  */
class WarcPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val genPayload: Gen[String] = Gen.oneOf(
    // prose with newlines and CRLF
    Gen.listOf(Gen.oneOf("word", "línea", "日本語", "a&b<c>", "\r\n", "\n",
      " ", "é", "\r\n\r\nWARC/1.0\r\n",
      // partial embedded WARC heads (version + Content-Length, even a
      // terminated block) — the false-sync shapes the WARC-Type trust
      // requirement exists for
      "\r\n\r\nWARC/1.0\r\nContent-Length: 4\r\n\r\nGOTC",
      "WARC/1.1\r\nContent-Length: 0\r\n")).map(_.mkString),
    // HTTP-ish envelope
    Gen.alphaNumStr.map(b =>
      s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n$b"),
    Gen.const(""))

  private val genRec: Gen[Rec] = for {
    t <- Gen.oneOf("response", "request", "conversion", "metadata")
    u <- Gen.oneOf("", "http://ex.org/p?q=1", "https://ex.org/ü")
    p <- genPayload
  } yield Rec(t, "<urn:uuid:0>", "2026-01-01T00:00:00Z", u,
    "application/octet-stream", p)

  test("corrupt-record recovery is split-layout-independent: random " +
    "corrupt positions (first/last/consecutive) x random split sizes " +
    "give the whole-file parse — valid rows AND corrupt chunks") {
    val spark2 = spark
    val genCase = for {
      n <- Gen.choose(3, 8)
      k <- Gen.choose(1, 2)
      badIdx <- Gen.pick(k, 0 until n)
      maxsize <- Gen.oneOf(40, 97, 150, 211, 400)
      payloads <- Gen.listOfN(n,
        Gen.listOfN(6, Gen.alphaNumStr.map(_.take(8))).map(_.mkString(" ")))
    } yield (n, badIdx.toSet, maxsize, payloads)
    val prop = Prop.forAll(genCase) { case (n, bad, maxsize, payloads) =>
      Prop.secure {
        val recs = (0 until n).map { i =>
          Rec("response", s"<urn:uuid:p$i>", "2026-01-04T00:00:00Z",
            s"http://ex.org/$i", "text/plain", payloads(i),
            corrupt = bad.contains(i))
        }
        val dir = Files.createTempDirectory("graft_warc_corrupt_prop")
        val f = dir.resolve("c.warc")
        Files.write(f, WarcFixtureGen.serialize(recs))
        val key = "mapreduce.input.fileinputformat.split.maxsize"
        val hc = spark2.sparkContext.hadoopConfiguration
        def parse(): (Seq[(String, String)], Seq[String]) = {
          val df = DocSource.warc(spark2, f.toString)
          val valid = df
            .filter(org.apache.spark.sql.functions.col("_corrupt").isNull)
            .select("record_id", "payload").collect()
            .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
          val chunks = df
            .filter(org.apache.spark.sql.functions.col("_corrupt")
              .isNotNull)
            .select("_corrupt").collect().map(_.getString(0)).sorted.toSeq
          (valid, chunks)
        }
        val before = Option(hc.get(key))
        try {
          hc.unset(key)
          val (wholeValid, wholeChunks) = parse()
          // every damaged record is its own chunk, even consecutive ones
          val sameCount = wholeChunks.size == bad.size
          hc.set(key, maxsize.toString)
          val (splitValid, splitChunks) = parse()
          val same = wholeValid == splitValid && wholeChunks == splitChunks
          if (!same || !sameCount)
            println(s"MISMATCH maxsize=$maxsize bad=$bad " +
              s"whole=(${wholeValid.map(_._1)}, ${wholeChunks.size}) " +
              s"split=(${splitValid.map(_._1)}, ${splitChunks.size})")
          same && sameCount
        } finally before match {
          case Some(v) => hc.set(key, v)
          case None => hc.unset(key)
        }
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("nonstandard version line (WARC/1.1.1) is split-layout-" +
    "independent: both the sequential reader and split sync route it " +
    "through recovery (the lenient SQL parser then re-frames the chunk) " +
    "— pre-r14, sequential reads framed it directly while split sync " +
    "could not anchor it, so the record VANISHED under some layouts") {
    val a = Rec("response", "<urn:uuid:va>", "2026-01-06T00:00:00Z",
      "http://ex.org/a", "text/plain", "alpha payload one two three")
    val nrec = Rec("response", "<urn:uuid:vn>", "2026-01-06T00:00:01Z",
      "http://ex.org/n", "text/plain", "nonstandard version payload")
    val b = Rec("response", "<urn:uuid:vb>", "2026-01-06T00:00:02Z",
      "http://ex.org/b", "text/plain", "bravo payload four five six")
    val bytes = WarcFixtureGen.serialize(Seq(a)) ++
      WarcFixtureGen.serialize(Seq(nrec), version = "1.1.1") ++
      WarcFixtureGen.serialize(Seq(b))
    val dir = Files.createTempDirectory("graft_warc_version")
    val f = dir.resolve("v.warc")
    Files.write(f, bytes)
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val hc = spark.sparkContext.hadoopConfiguration
    def parse(): (Seq[String], Seq[String]) = {
      val df = DocSource.warc(spark, f.toString)
      val valid = df
        .filter(org.apache.spark.sql.functions.col("_corrupt").isNull)
        .select("record_id").collect().map(_.getString(0)).sorted.toSeq
      val chunks = df
        .filter(org.apache.spark.sql.functions.col("_corrupt").isNotNull)
        .select("_corrupt").collect().map(_.getString(0)).sorted.toSeq
      (valid, chunks)
    }
    val before = Option(hc.get(key))
    try {
      hc.unset(key)
      val whole = parse()
      // the recovered chunk's bytes are a full header block + CL, so
      // the SQL parser re-frames it — nothing is lost, and CRITICALLY
      // nothing depends on where the splits land
      assert(whole._1 ===
        Seq("<urn:uuid:va>", "<urn:uuid:vb>", "<urn:uuid:vn>"))
      assert(whole._2.isEmpty)
      for (maxsize <- Seq(40, 97, 150, 260)) {
        hc.set(key, maxsize.toString)
        assert(parse() === whole, s"split maxsize=$maxsize diverged")
      }
    } finally before match {
      case Some(v) => hc.set(key, v)
      case None => hc.unset(key)
    }
  }

  test("framed-but-untyped records (no WARC-Type, spec-violating but " +
    "Content-Length-framed) survive every split layout: whole-file and " +
    "split reads emit the same rows, with misaligned embedded heads " +
    "rejected by the chain proof") {
    val spark2 = spark
    val genCase = for {
      n <- Gen.choose(3, 8)
      k <- Gen.choose(1, 3)
      untypedIdx <- Gen.pick(k, 0 until n)
      maxsize <- Gen.oneOf(40, 97, 150, 211, 400)
      payloads <- Gen.listOfN(n, Gen.oneOf(
        // plain prose
        Gen.listOfN(6, Gen.alphaNumStr.map(_.take(8))).map(_.mkString(" ")),
        // a MISALIGNED embedded head (Content-Length overruns): the
        // false-sync shape the chain proof must reject
        Gen.alphaNumStr.map(s =>
          s"x$s\r\n\r\nWARC/1.0\r\nContent-Length: 9999\r\n\r\ntail$s")))
    } yield (n, untypedIdx.toSet, maxsize, payloads)
    val prop = Prop.forAll(genCase) { case (n, untyped, maxsize, payloads) =>
      Prop.secure {
        val recs = (0 until n).map { i =>
          Rec("response", s"<urn:uuid:u$i>", "2026-01-05T00:00:00Z",
            s"http://ex.org/$i", "text/plain", payloads(i),
            untyped = untyped.contains(i))
        }
        val dir = Files.createTempDirectory("graft_warc_untyped_prop")
        val f = dir.resolve("u.warc")
        Files.write(f, WarcFixtureGen.serialize(recs))
        val key = "mapreduce.input.fileinputformat.split.maxsize"
        val hc = spark2.sparkContext.hadoopConfiguration
        def parse(): Seq[(String, String)] =
          DocSource.warc(spark2, f.toString)
            .filter(org.apache.spark.sql.functions.col("_corrupt").isNull)
            .select("record_id", "payload").collect()
            .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
        val before = Option(hc.get(key))
        try {
          hc.unset(key)
          val whole = parse()
          // every record (typed or not) must be framed by the whole read
          val allThere = whole.map(_._1).toSet ==
            (0 until n).map(i => s"<urn:uuid:u$i>").toSet
          hc.set(key, maxsize.toString)
          val split = parse()
          val same = whole == split
          if (!same || !allThere)
            println(s"MISMATCH maxsize=$maxsize untyped=$untyped " +
              s"whole=${whole.map(_._1)} split=${split.map(_._1)}")
          same && allThere
        } finally before match {
          case Some(v) => hc.set(key, v)
          case None => hc.unset(key)
        }
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("serialize → parse round-trips arbitrary record lists exactly, " +
    "for both WARC/1.0 and WARC/1.1 files") {
    val gen = for {
      n <- Gen.choose(1, 8)
      rs <- Gen.listOfN(n, genRec)
      v <- Gen.oneOf("1.0", "1.1")
    } yield (rs, v)
    val prop = Prop.forAll(gen) { case (recs0, version) =>
      val recs = recs0.zipWithIndex.map { case (r, i) =>
        r.copy(recordId = s"<urn:uuid:$i>")
      }
      if (recs.isEmpty) Prop.passed else Prop.secure {
        val dir = Files.createTempDirectory("graft_warc_prop")
        val f = dir.resolve("t.warc")
        Files.write(f, WarcFixtureGen.serialize(recs, version))
        val got = DocSource.warcRecords(spark, f.toString)
          .collect()
          .map(r => (r.getAs[String]("record_id"),
            r.getAs[String]("warc_type"),
            Option(r.getAs[String]("target_uri")).getOrElse(""),
            r.getAs[String]("payload")))
          .sortBy(_._1)
        val want = recs
          .map(r => (r.recordId, r.warcType, r.targetUri, r.payload))
          .sortBy(_._1)
        got.toSeq == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
