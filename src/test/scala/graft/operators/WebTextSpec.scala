package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge-case behavior of the round-8 web-text / paragraph / LM / script
  * operators (the oracle entries q111–q116 cover the happy path on
  * harness data; these pin the corners).
  */
class WebTextSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Expected-value rounding matching Spark SQL's `round()` (HALF_UP).
    * `math.rint` is HALF_EVEN: it agrees on most vectors but falsely
    * fails on .5-boundary values (r16 ADVICE #5) — the exact mode
    * mismatch the old ScaleStressGraph gate comment documented. */
  private def roundHalfUp(v: Double, digits: Int): Double =
    BigDecimal(v).setScale(digits, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  // --- stripMarkup --------------------------------------------------------

  test("stripMarkup removes script/style CONTENT, strips tags, decodes " +
    "entities amp-last, squeezes whitespace") {
    val d = Seq((1L,
      "<html><!-- hidden --><style>p{}</style><body>" +
        "<p>A &amp;&nbsp;B</p>\n<script>var x = '<p>not text</p>';</script>" +
        "<p>C &amp;lt;escaped&amp;gt;</p></body></html>"))
      .toDF("doc_id", "html")
    val got = WebText.markupStats(d).collect()(0)
    // script body (including its fake tags) must vanish; &amp;lt; must
    // decode to the literal "&lt;" (ONE decode pass), not to "<".
    assert(got.getAs[String]("text_clean") === "A & B C &lt;escaped&gt;")
  }

  test("stripMarkup survives two script blocks without swallowing the " +
    "text between them (non-greedy block match)") {
    val d = Seq((1L,
      "<script>a</script><p>keep me</p><script>b</script>"))
      .toDF("doc_id", "html")
    val got = WebText.markupStats(d).collect()(0)
    assert(got.getAs[String]("text_clean") === "keep me")
  }

  test("markupStats counts tags and entities; markup_frac is 0 for " +
    "markup-free text") {
    val d = Seq(
      (1L, "<a href=x>y</a> &quot;z&quot; &#39;w&#39;"),
      (2L, "plain text")).toDF("doc_id", "html")
    val got = WebText.markupStats(d).orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_tags") === 2L)
    assert(got(0).getAs[Long]("n_entities") === 4L)
    assert(got(1).getAs[Long]("n_tags") === 0L)
    assert(got(1).getAs[Double]("markup_frac") === 0.0)
  }

  // --- canonicalizeUrl ----------------------------------------------------

  private def canon(url: String): String =
    Seq(Tuple1(url)).toDF("url")
      .select(WebText.canonicalizeUrl(col("url")).as("c"))
      .collect()(0).getString(0)

  test("canonicalizeUrl collapses case/www/port/param-order/tracking/" +
    "fragment variants of the same URL to one form") {
    val expected = "https://ex.com/Docs/3?a=1&b=2"
    assert(canon("HTTPS://WWW.Ex.COM:443/Docs/3/?b=2&utm_source=x&a=1#f")
      === expected)
    assert(canon("https://ex.com/Docs/3?a=1&b=2") === expected)
  }

  test("canonicalizeUrl preserves path case, root slash, and non-default " +
    "ports") {
    assert(canon("http://Ex.com:8080/A/b") === "http://ex.com:8080/A/b")
    assert(canon("https://ex.com/") === "https://ex.com/")
    // all-tracking query drops entirely (no dangling '?')
    assert(canon("http://www.ex.com:80/p?gclid=1&fbclid=2&ref=r")
      === "http://ex.com/p")
  }

  test("hostStats counts URL-level duplicates per host") {
    val d = Seq(
      (1L, "https://a.com/x?b=2&a=1", 1.0),
      (2L, "https://WWW.A.com/x?a=1&b=2", 0.0), // same canonical URL
      (3L, "https://a.com/y", 1.0),
      (4L, "https://b.com/z", 0.5)).toDF("doc_id", "url", "quality")
    val got = WebText.hostStats(d).orderBy("host").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getAs[Double]("dup_factor")))
    assert(got(0) === (("a.com", 3L, 2L, 1.5)))
    assert(got(1) === (("b.com", 1L, 1L, 1.0)))
  }

  // --- paragraphDedupKeepFirst -------------------------------------------

  test("paragraphDedupKeepFirst keeps the first (doc_id, pos) occurrence " +
    "corpus-wide and rebuilds docs in order") {
    val d = Seq(
      (1L, "shared\nunique one"),
      (2L, "shared\nunique two\nshared"), // 2nd+3rd copies of 'shared' drop
      (3L, "unique three")).toDF("doc_id", "text")
    for (portable <- Seq(true, false)) {
      val got = TextAnalysis
        .paragraphDedupKeepFirst(d, portable = portable)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      assert(got(0) === ((1L, "shared\nunique one", 2L, 0L)))
      assert(got(1) === ((2L, "unique two", 3L, 2L)))
      assert(got(2) === ((3L, "unique three", 1L, 0L)))
    }
  }

  test("paragraphDedupKeepFirst: a doc whose every paragraph is a " +
    "duplicate survives with empty text, not a dropped row") {
    val d = Seq(
      (1L, "only para"),
      (2L, "only para")).toDF("doc_id", "text")
    val got = TextAnalysis.paragraphDedupKeepFirst(d, portable = true)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(got(0) === ((1L, "only para", 0L)))
    assert(got(1) === ((2L, "", 1L)))
  }

  test("paragraphDedupKeepFirst ignores blank/whitespace paragraphs") {
    val d = Seq((1L, "a\n\n  \nb")).toDF("doc_id", "text")
    val got = TextAnalysis.paragraphDedupKeepFirst(d, portable = true)
      .collect()(0)
    assert(got.getAs[String]("text_kept") === "a\nb")
    assert(got.getAs[Long]("n_paras") === 2L)
  }

  // --- bigramLogprob ------------------------------------------------------

  test("bigramLogprob scores a doc made of the corpus's dominant bigram " +
    "above one of unique bigrams; a single-token doc stays in the row " +
    "set with 0 bigrams and a NULL score") {
    val common = (0 until 20).map(i => (i.toLong, "to be to be to be"))
    val d = (common :+ ((90L, "zz qq ww")) :+ ((99L, "solo")))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.bigramLogprob(d).collect()
    val got = rows.filterNot(_.isNullAt(2))
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(0L) > got(90L))
    // no bigram positions → row kept, zero count, NULL score
    val solo = rows.find(_.getLong(0) == 99L).get
    assert(solo.getLong(1) === 0L && solo.isNullAt(2))
  }

  test("bigramLogprob: deterministic value on a hand-computable corpus") {
    // corpus: one doc "a b" → c(a,b)=1, c(a)=1, V=2 (tokens a,b)
    // P(b|a) = (1+0.5)/(1+0.5*2) = 0.75 → avg ln = ln(0.75)
    val d = Seq((1L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogprob(d).collect()(0)
    assert(got.getLong(1) === 1L)
    assert(got.getDouble(2) === roundHalfUp(math.log(0.75), 4))
  }

  // --- lengthOutlierTrim --------------------------------------------------

  test("lengthOutlierTrim flags the length outlier within its group and " +
    "keeps the body of the distribution") {
    // src A: lengths 3,4,5,4,3 + one 400-token monster; src B untouched
    val a = Seq("a b c", "a b c d", "a b c d e", "a b c d", "a b c")
      .zipWithIndex.map { case (t, i) => (i.toLong, "A", t) }
    val monster = (50L, "A", (0 until 400).map(i => s"t$i").mkString(" "))
    val b = Seq((60L, "B", "x y"), (61L, "B", "x y z"))
    val d = (a :+ monster) ++ b
    val got = TextAnalysis
      .lengthOutlierTrim(d.toDF("doc_id", "source", "text"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got(50L) === false)
    assert((a.map(_._1) ++ b.map(_._1)).forall(id => got(id)))
  }

  test("lengthOutlierTrim: a zero-MAD group keeps everything with z = 0") {
    val d = Seq((1L, "A", "x y"), (2L, "A", "p q"), (3L, "A", "r s"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.lengthOutlierTrim(d)
      .collect().map(r => (r.getDouble(3), r.getBoolean(4)))
    assert(got.forall(_ === ((0.0, true))))
  }

  // --- ipfMixWeights ------------------------------------------------------

  test("ipfMixWeights drives BOTH marginals toward uniform on a skewed " +
    "(source x lang) table") {
    // heavily skewed: srcA/en dominates
    val d = (
      (0 until 80).map(i => (i.toLong, "A", "en")) ++
      (0 until 10).map(i => (100L + i, "A", "de")) ++
      (0 until 5).map(i => (200L + i, "B", "en")) ++
      (0 until 5).map(i => (300L + i, "B", "de")))
      .toDF("doc_id", "source", "lang")
    val w = TextAnalysis.ipfMixWeights(d, iters = 8)
    val eff = w.select(col("source"), col("lang"), col("eff_docs"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val bySrc = eff.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val byLang = eff.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    // 100 docs, 2 sources, 2 langs → each marginal should be ~50
    assert(math.abs(bySrc("A") - 50.0) < 0.5, bySrc.toString)
    assert(math.abs(bySrc("B") - 50.0) < 0.5, bySrc.toString)
    assert(math.abs(byLang("en") - 50.0) < 0.5, byLang.toString)
    assert(math.abs(byLang("de") - 50.0) < 0.5, byLang.toString)
    // the over-represented cell is down-weighted, the rare cells up
    val weights = w.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(weights(("A", "en")) < 1.0)
    assert(weights(("B", "de")) > 1.0)
  }

  test("ipfMixWeights on an already-balanced table is a no-op (all " +
    "weights 1)") {
    val d = (for (s <- Seq("A", "B"); l <- Seq("en", "de"); i <- 0 until 5)
      yield (s"$s$l$i".hashCode.toLong, s, l)).toDF("doc_id", "source", "lang")
    val got = TextAnalysis.ipfMixWeights(d, iters = 3)
      .collect().map(_.getDouble(3))
    assert(got.forall(_ === 1.0))
  }

  // --- pageRank -----------------------------------------------------------

  test("pageRank: a symmetric cycle keeps uniform ranks at every " +
    "iteration") {
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "A")).toDF("src", "dst")
    val got = WebGraph.pageRank(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val third = roundHalfUp(1.0 / 3, 6)
    assert(got === Map("A" -> third, "B" -> third, "C" -> third))
  }

  test("pageRank: one damped iteration matches the hand computation, " +
    "dangling mass leaks") {
    // A→B, A→C, B→C; N=3, d=0.85, r0=1/3 each
    // c(B)=1/6, c(C)=1/6+1/3=1/2; r1(A)=0.05, r1(B)=0.05+0.85/6,
    // r1(C)=0.05+0.85/2 (C dangling: its mass goes nowhere)
    val edges = Seq(("A", "B"), ("A", "C"), ("B", "C")).toDF("src", "dst")
    val got = WebGraph.pageRank(edges, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("A") === 0.05)
    assert(got("B") === roundHalfUp(0.05 + 0.85 / 6, 6))
    assert(got("C") === 0.475)
  }

  test("pageRank/hits/PPR: roundTo = None returns raw doubles (the " +
    "scale gates' form); default output is the raw value rounded to 6") {
    // On a ring the raw fixpoint is exactly 1/N, a value round-6 cannot
    // represent once N is large — ScaleStressGraph gates on the raw
    // form (r15 ADVICE #2); here we pin raw vs rounded consistency.
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "A")).toDF("src", "dst")
    val raw = WebGraph.pageRank(edges, iters = 3, roundTo = None)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    raw.values.foreach(v => assert(v === 1.0 / 3)) // exact, unrounded
    val rounded = WebGraph.pageRank(edges, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    raw.foreach { case (n, v) =>
      assert(rounded(n) === roundHalfUp(v, 6))
    }
    val hRaw = WebGraph.hits(edges, iters = 2, roundTo = None)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    hRaw.foreach { case (hub, auth) =>
      assert(hub === 1.0 / 3 && auth === 1.0 / 3)
    }
    val pprRaw = WebGraph.personalizedPageRank(edges,
        Seq("A").toDF("node"), iters = 2, damping = 0.85, roundTo = None)
      .collect().map(r => r.getDouble(1))
    // mass telescopes to exactly 1 with no rounding dust
    assert(math.abs(pprRaw.sum - 1.0) < 1e-12)
  }

  test("pageRank: parallel edges carry weight") {
    val edges = Seq(("A", "B"), ("A", "B"), ("A", "C")).toDF("src", "dst")
    val got = WebGraph.pageRank(edges, iters = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // outdeg(A)=3: B gets 2/3 of A's rank, C gets 1/3
    assert(got("B") === roundHalfUp(0.05 + 0.85 * (2.0 / 9), 6))
    assert(got("C") === roundHalfUp(0.05 + 0.85 * (1.0 / 9), 6))
  }

  // --- hits ---------------------------------------------------------------

  test("hits: two hubs pointing at one authority converge to the hand " +
    "solution in one iteration") {
    // A→B, C→B: B is the only authority (1.0), A and C split hubness
    val edges = Seq(("A", "B"), ("C", "B")).toDF("src", "dst")
    val got = WebGraph.hits(edges, iters = 1)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(got("B") === ((0.0, 1.0)))
    assert(got("A") === ((0.5, 0.0)))
    assert(got("C") === ((0.5, 0.0)))
  }

  test("hits separates the hub role from the authority role in a " +
    "directory-like graph") {
    // hub H links to authorities X,Y,Z; X also links to Y (weak hub)
    val edges = Seq(("H", "X"), ("H", "Y"), ("H", "Z"), ("X", "Y"))
      .toDF("src", "dst")
    val got = WebGraph.hits(edges, iters = 5)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(got("H")._1 > got("X")._1) // H is the stronger hub
    assert(got("Y")._2 > got("Z")._2) // Y has two in-links, stronger authority
    assert(got("H")._2 === 0.0) // nothing links to H
  }

  // --- scriptMix ----------------------------------------------------------

  test("scriptMix partitions characters into Latin/Han/Cyrillic/digit/" +
    "other with whitespace excluded") {
    val d = Seq(
      (1L, "abc 中文 дом 12 !"),   // 3 latin, 2 han, 3 cyr, 2 digit, 1 other
      (2L, "only latin words")).toDF("doc_id", "text")
    val got = TextAnalysis.scriptMix(d).orderBy("doc_id").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("n_chars") === 11L)
    assert(r1.getAs[Double]("latin_frac") === roundHalfUp(3.0 / 11, 4))
    assert(r1.getAs[Double]("han_frac") === roundHalfUp(2.0 / 11, 4))
    assert(r1.getAs[Double]("cyrillic_frac") === roundHalfUp(3.0 / 11, 4))
    assert(r1.getAs[Double]("digit_frac") === roundHalfUp(2.0 / 11, 4))
    assert(r1.getAs[Double]("other_frac") === roundHalfUp(1.0 / 11, 4))
    assert(got(1).getAs[Double]("latin_frac") === 1.0)
    assert(got(1).getAs[Double]("other_frac") === 0.0)
  }
}
