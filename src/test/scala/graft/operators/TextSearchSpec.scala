package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BM25 search, vocabulary stats, pair-Jaccard verification, and the
  * cross-doc span/boilerplate operators. */
class TextSearchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark shuffle join spark"),
    (1L, "spark join"),
    (2L, "window sort filter"),
    (3L, "join join join window"))
    .toDF("doc_id", "text")

  test("vocab counts doc and total frequencies") {
    val got = TextSearch.vocab(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("spark") === ((2L, 3L)))   // docs 0,1; 2+1 occurrences
    assert(got("join") === ((3L, 5L)))    // docs 0,1,3; 1+1+3
    assert(got("window") === ((2L, 2L)))
    assert(got("filter") === ((1L, 1L)))
  }

  test("topVocab orders by total count, token tiebreak, limit") {
    val top = TextSearch.topVocab(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(top.toSeq === Seq(("join", 5L), ("spark", 3L)))
  }

  test("bm25 matches the hand-computed Robertson/Lucene formula") {
    // Query "spark window": N=4, avgdl = (4+2+3+4)/4 = 3.25
    // df(spark)=2, df(window)=2 -> idf = ln(1 + 2.5/2.5) = ln 2
    def idf = math.log(2.0)
    def tfn(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.25))
    val expected = Map(
      0L -> idf * tfn(2, 4),               // spark tf=2, dl=4
      1L -> idf * tfn(1, 2),               // spark tf=1, dl=2
      2L -> idf * tfn(1, 3),               // window tf=1, dl=3
      3L -> idf * tfn(1, 4))               // window tf=1, dl=4
    val got = TextSearch.bm25(docs, "spark window").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, s) =>
      assert(math.abs(got(id) - s) < 1e-12, s"doc $id") }
  }

  test("bm25TopK ranks the heaviest-match doc first, id tiebreak") {
    val top = TextSearch.bm25TopK(docs, "join", 2).collect()
      .map(_.getLong(0))
    // doc 3 has tf=3 (dl 4); docs 0,1 have tf=1 — doc 1 shorter dl wins.
    assert(top.toSeq === Seq(3L, 1L))
  }

  test("pairJaccard computes exact shingle Jaccard per pair " +
    "on both hash paths") {
    val d = Seq(
      (1L, "a b c d e"),        // 3-shingles: {abc, bcd, cde}
      (2L, "a b c d x"),        // {abc, bcd, cdx} -> inter 2, union 4
      (3L, "p q r s t"))        // disjoint from 1
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    for (portable <- Seq(true, false)) {
      val got = Dedup.pairJaccard(pairs, d, portable = portable).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(math.abs(got((1L, 2L)) - 0.5) < 1e-12, s"portable=$portable")
      assert(got((1L, 3L)) === 0.0, s"portable=$portable")
    }
  }

  test("verifiedNearDupPairs keeps only candidates above the exact " +
    "Jaccard threshold") {
    // 1/2 near-identical; 5/6 identical; 9 alone. LSH(16,4) will emit
    // 1-2 and 5-6 as candidates; the 0.9 gate must kill 1-2 (J=0.5).
    val d = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d x"),
      (5L, "m n o p q"),
      (6L, "m n o p q"),
      (9L, "z y x w v"))
      .toDF("doc_id", "text")
    for (portable <- Seq(true, false)) {
      // Identical docs share every band key, so (5,6) is ALWAYS a
      // candidate; whether a J=0.5 pair collides on some band is a
      // deterministic-but-hash-dependent fact, so the loose gate asserts
      // only that nothing below threshold leaks through.
      val loose = Dedup.verifiedNearDupPairs(d, threshold = 0.4,
          portable = portable)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(loose.contains((5L, 6L)), s"portable=$portable")
      assert(!loose.contains((1L, 3L)) && !loose.contains((1L, 9L)),
        s"portable=$portable")
      val strict = Dedup.verifiedNearDupPairs(d, threshold = 0.9,
          portable = portable)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(strict === Set((5L, 6L)), s"portable=$portable")
    }
  }

  test("dupSpanStats measures cross-doc duplicated n-gram fraction") {
    val d = Seq(
      (1L, "a b c d e"),   // 3 trigram positions; "a b c","b c d" shared w/2
      (2L, "a b c d x"),   // shares "a b c","b c d"
      (3L, "p q r s t"))   // nothing shared
      .toDF("doc_id", "text")
    for (portable <- Seq(true, false)) {
      val got = TextAnalysis.dupSpanStats(d, n = 3, portable = portable)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got(1L) === ((3L, 2L)), s"portable=$portable")
      assert(got(2L) === ((3L, 2L)), s"portable=$portable")
      assert(got(3L) === ((3L, 0L)), s"portable=$portable")
    }
  }

  test("dupSpanStats counts within-doc repeats of a shared gram at " +
    "every position") {
    val d = Seq(
      (1L, "a b c a b c"),   // grams: abc,bca,cab,abc -> "a b c" twice
      (2L, "a b c z z z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.dupSpanStats(d, n = 3, portable = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: 4 positions, "a b c" at 2 of them is the only cross-doc gram
    assert(got(1L) === ((4L, 2L)))
  }

  test("dedupCorpus jaccardThreshold: 0.0 is the identity gate, a high " +
    "threshold can only keep more docs") {
    val corpus = Seq.tabulate(30) { i =>
      val base = s"alpha bravo charlie d$i echo foxtrot golf hotel"
      (i.toLong, if (i % 5 == 0) base + " extra" else base)
    }.toDF("doc_id", "text")
    def kept(threshold: Option[Double]) =
      Dedup.dedupCorpus(corpus, minQuality = 0.0, portable = true,
        jaccardThreshold = threshold)
        .collect().map(_.getLong(0)).toSet
    val unverified = kept(None)
    assert(kept(Some(0.0)) === unverified)
    val strict = kept(Some(0.99))
    assert(unverified.subsetOf(strict))
  }

  test("removeDuplicateSpans cuts all-but-first occurrences across docs") {
    val d = Seq(
      (1L, "a b c d e"),
      (2L, "x x a b c y"))   // "a b c" first occurs in doc 1
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(d, n = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "a b c d e")
    assert(got(2L) === "x x y")
  }

  test("removeDuplicateSpans collapses within-doc repetition to one copy") {
    val d = Seq((1L, "p q r p q r p q r"), (2L, "u v w"))
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(d, n = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "p q r")
    assert(got(2L) === "u v w")
  }

  test("removeDuplicateSpans keeps clean docs byte-identical and empties " +
    "a fully-duplicated doc") {
    val d = Seq(
      (1L, "m n o p q r"),
      (2L, "m n o p q r"),    // exact copy -> fully cut
      (3L, "entirely different tokens here"))
      .toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(d, n = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "m n o p q r")
    assert(got(2L) === "")
    assert(got(3L) === "entirely different tokens here")
  }

  test("removeBoilerplateLines strips recurring lines, keeps order, " +
    "preserves all-boilerplate docs as empty") {
    val d = Seq(
      (1L, "COOKIE NOTICE\nreal content one\nfooter inc"),
      (2L, "COOKIE NOTICE\nsomething else\nfooter inc"),
      (3L, "COOKIE NOTICE\nfooter inc"),
      (4L, "unique only"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplateLines(d, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "real content one")
    assert(got(2L) === "something else")
    assert(got(3L) === "")
    assert(got(4L) === "unique only")
  }

  test("searchIndex prunes partitions and matches in-memory bm25TopK") {
    val corpus = Seq.tabulate(40) { i =>
      (i.toLong, s"tok$i spark shared t${i % 7} join t${i % 3} filler")
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx")
      .toString
    TextSearch.writeIndex(corpus, dir, nBuckets = 16)

    val df = TextSearch.searchIndex(spark, dir, "spark t4 join", k = 10,
      nBuckets = 16)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      plan.take(2000))

    val expected = TextSearch.bm25TopK(corpus, "spark t4 join", k = 10)
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9)))
    val got = df.collect()
      .map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9)))
    assert(got.toSeq === expected.toSeq)

    // the layout's own n_buckets wins over a mismatched caller value —
    // pruning with the wrong modulus used to silently drop postings
    val gotWrongParam = TextSearch.searchIndex(spark, dir,
        "spark t4 join", k = 10, nBuckets = 5)
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9)))
    assert(gotWrongParam.toSeq === expected.toSeq)
  }

  test("snippets rejects an empty term (instr('', ...) would mark every " +
    "doc a hit at pos 1)") {
    val d = Seq((1L, "some text")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextSearch.snippets(d, "  ")
    }
  }

  test("corpusStats exact matches hand counts; sketch path stays within " +
    "HLL/quantile error of exact") {
    val corpus = Seq.tabulate(200) { i =>
      (i.toLong, (0 to i % 13).map(j => s"w${(i + j) % 37}").mkString(" "))
    }.toDF("doc_id", "text")
    val exact = TextAnalysis.corpusStats(corpus).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // Sanity: splits partition the 200 docs, vocabulary is bounded by 37.
    assert(exact.values.map(_._1).sum === 200L)
    exact.values.foreach { case (_, total, distinct) =>
      assert(distinct <= 37L && total >= distinct)
    }
    val approx = TextAnalysis.corpusStats(corpus, approximate = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    exact.foreach { case (split, (nDocs, total, distinct)) =>
      val a = approx(split)
      assert(a._1 === nDocs && a._2 === total, split)
      assert(math.abs(a._3 - distinct).toDouble /
        distinct.max(1L) <= 0.05, s"$split hll ${a._3} vs $distinct")
    }
  }

  test("removeBoilerplateLines keeps multi-line remainders in original " +
    "order and preserves blank lines as document structure") {
    val d = Seq(
      (1L, "keep one\nBOILER\n\nkeep two\nkeep three"),
      (2L, "BOILER\nother"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplateLines(d, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // blank lines are never boilerplate candidates AND are kept in the
    // reassembly — paragraph boundaries survive the scrub
    assert(got(1L) === "keep one\n\nkeep two\nkeep three")
    assert(got(2L) === "other")
  }
}
