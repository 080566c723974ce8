package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge-case behavior of the round-4 text operators (the oracle entries
  * cover the happy path on harness data; these pin the corners).
  */
class TextOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("tokensToIds codes in-vocab tokens by rank and OOV as -1, " +
    "preserving position order") {
    val d = Seq(
      (1L, "b a a c"),
      (2L, "a zz b")).toDF("doc_id", "text")
    // counts: a=3, b=2, c=1, zz=1 → vocab(2): a=0, b=1; c/zz OOV
    val got = TextAnalysis.tokensToIds(d, vocabSize = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getLong(2), r.getLong(3)))
    assert(got(0) === ((1L, Seq(1, 0, 0, -1), 4L, 1L)))
    assert(got(1) === ((2L, Seq(0, -1, 1), 3L, 1L)))
  }

  test("unigramLogprob scores a doc of corpus-common tokens above one " +
    "of rare tokens") {
    val d = (0 until 50).map(i => (i.toLong, "the the the common words"))
      .toDF("doc_id", "text")
      .unionByName(Seq((99L, "zyx qwv jkl")).toDF("doc_id", "text"))
    val scores = TextAnalysis.unigramLogprob(d)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(0L) > scores(99L))
  }

  test("tokenEntropy: single repeated token = 0; uniform tokens = ln k") {
    val d = Seq(
      (1L, "x x x x x x"),
      (2L, "a b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(d).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got(0) === ((1L, 6L, 0.0)))
    assert(got(1)._3 === math.rint(math.log(4) * 10000) / 10000)
  }

  test("corpusDiff classifies disjoint, edited, and identical snapshots") {
    val v1 = Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"))
      .toDF("doc_id", "text")
    val v2 = Seq((2L, "bravo"), (3L, "charlie EDITED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.corpusDiff(v1, v2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("corpusDiff treats normalization-equal texts as unchanged " +
    "(fingerprint semantics, not byte equality)") {
    val v1 = Seq((1L, "Alpha  Bravo")).toDF("doc_id", "text")
    val v2 = Seq((1L, "alpha bravo!")).toDF("doc_id", "text")
    val got = TextAnalysis.corpusDiff(v1, v2).collect()
    assert(got.head.getString(1) === "unchanged")
  }

  test("validateCorpus counts dup ids, null and empty text, and bounds") {
    val d = Seq(
      (1L, "one two three"),
      (1L, "dup id"),
      (2L, null.asInstanceOf[String]),
      (3L, "   "),
      (4L, "a")).toDF("doc_id", "text")
    val r = TextAnalysis.validateCorpus(d).collect().head
    assert(r.getLong(0) === 5L)       // n_rows
    assert(r.getLong(1) === 4L)       // n_distinct_ids
    assert(r.getLong(2) === 1L)       // n_dup_ids
    assert(r.getLong(3) === 1L)       // n_null_text
    assert(r.getLong(4) === 1L)       // n_empty_text
    assert(r.getLong(6) === 3L)       // max_tokens
  }

  test("qualityTopFraction exact keeps ceil(frac*n) rows per group") {
    val d = (0 until 30).map(i =>
      (i.toLong, "clean text words here always " + ("9 " * (i % 10)),
        if (i % 2 == 0) "en" else "de")).toDF("doc_id", "text", "lang")
    val kept = TextAnalysis.qualityTopFraction(d, "lang", 0.4)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept === Map("en" -> 6L, "de" -> 6L)) // ceil(15 * 0.4) = 6
  }

  test("tokenBudgetSelect keeps exactly the greedy (quality desc, id) " +
    "prefix, cutting INSIDE the boundary quality level") {
    // three quality tiers; the mid tier has several equal-quality docs so
    // the budget boundary lands inside one level and must cut by doc_id
    val d = ((0 until 4).map(i =>
        (i.toLong, "alpha beta gamma delta epsilon zeta")) ++ // high q
      (10 until 16).map(i =>
        (i.toLong, "alpha beta 9 gamma delta 8 epsilon")) ++  // mid q
      (20 until 24).map(i =>
        (i.toLong, "7 8 9 10 11 12")))                        // low q
      .toDF("doc_id", "text")
    val scored = d.select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 3).as("q"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // brute-force spec: walk (q desc, id) keeping while the sum fits
    def expected(budget: Long): Set[Long] = {
      var cum = 0L
      scored.sortBy(t => (-t._2, t._1)).takeWhile { case (_, _, n) =>
        cum += n; cum <= budget
      }.map(_._1).toSet
    }
    for (budget <- Seq(10L, 40L, 55L, 1000L)) {
      val got = TextAnalysis.tokenBudgetSelect(d, budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === expected(budget), s"budget $budget")
    }
    // scale shape: every window in the plan is keyed (a global window
    // prints `Window [exprs], [orderSpec]` with no partition bracket)
    assertNoGlobalWindow(TextAnalysis.tokenBudgetSelect(d, 40L)
      .queryExecution.executedPlan.toString)
  }

  /** Fails on any `Window` exec node without a partition bracket — the
    * keyed form prints `Window [exprs], [partSpec], [orderSpec]`, the
    * global form only `Window [exprs], [orderSpec]`. */
  private def assertNoGlobalWindow(plan: String): Unit =
    plan.linesIterator.filter(_.contains("Window [")).foreach { n =>
      val keyed = "\\], \\[[^\\]]+\\], \\[[^\\]]*\\]\\s*$".r
        .findFirstIn(n).isDefined
      assert(keyed, s"unpartitioned (global) Window: $n")
    }

  test("tokenBudgetSelect handles NON-NUMERIC document ids: the boundary " +
    "level is cut by a level-local window instead of NPEing on the cast") {
    // string ids; two quality tiers; budget lands inside the low tier
    val d = ((0 until 4).map(i =>
        (f"doc$i%03d", "alpha beta gamma delta epsilon zeta")) ++
      (10 until 18).map(i =>
        (f"doc$i%03d", "alpha beta 9 gamma delta 8 epsilon")))
      .toDF("doc_id", "text")
    val scored = d.select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 3).as("q"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def expected(budget: Long): Set[String] = {
      var cum = 0L
      scored.sortBy(t => (-t._2, t._1)).takeWhile { case (_, _, n) =>
        cum += n; cum <= budget
      }.map(_._1).toSet
    }
    for (budget <- Seq(15L, 40L, 60L, 1000L)) {
      val got = TextAnalysis.tokenBudgetSelect(d, budget)
        .select("doc_id").collect().map(_.getString(0)).toSet
      assert(got === expected(budget), s"budget $budget")
    }
  }

  test("tokenBudgetSelect id-range bucketing stays INTEGRAL for id " +
    "spreads beyond 2^53 (double division would misassign buckets)") {
    // one quality level, ids spanning nearly the full long range — the
    // old floating-point bucket arithmetic loses low bits at this spread
    val ids = Seq(0L, 1L, 2L, (1L << 53) + 7L, (1L << 60) + 5L,
      Long.MaxValue - 2L)
    val d = ids.map(i => (i, "alpha beta gamma 9 ok")).toDF("doc_id", "text")
    val n = d.sparkSession.range(1)
      .select(TextAnalysis.tokenCount(lit("alpha beta gamma 9 ok"))
        .cast("long")).head().getLong(0)
    // budget for exactly 3 docs plus part of the 4th: id-order greedy
    val got = TextAnalysis.tokenBudgetSelect(d, n * 3 + n / 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(0L, 1L, 2L))
  }

  test("tokenBudgetSelect survives a CONSTANT-quality corpus: the " +
    "boundary level is cut by id-range buckets, not one global window") {
    // every doc identical text => one quality level = the whole corpus;
    // sparse ids exercise the id-range bucketing
    val d = (0 until 200).map(i => (i.toLong * 37, "alpha beta gamma 9 ok"))
      .toDF("doc_id", "text")
    val perDoc = TextAnalysis.tokenCount(lit("alpha beta gamma 9 ok"))
    val n = d.sparkSession.range(1).select(perDoc.cast("long")).head().getLong(0)
    // budget for exactly 37 docs plus part of the 38th: greedy id-order
    // walk must keep ids 0*37 .. 36*37
    val budget = n * 37 + n / 2
    val got = TextAnalysis.tokenBudgetSelect(d, budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === (0 until 37).map(_.toLong * 37).toSet)
    // the plan's running-sum window partitions by the id bucket column
    val plan = TextAnalysis.tokenBudgetSelect(d, budget)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__b"), plan.take(800))
    assertNoGlobalWindow(plan)
  }

  test("importanceSelect scores pool docs by the smoothed target/source " +
    "log-ratio and cuts at k (weight desc, id)") {
    val pool = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "der hund ist nicht da heute"),
      (3L, "the dog ran to the park"),
      (4L, "el gato y el perro aqui"))
      .toDF("doc_id", "text")
    val target = Seq(
      (100L, "the cat and the dog"),
      (101L, "the mat and the park"))
      .toDF("doc_id", "text")
    // independent reference: plain Scala maps over the same formula
    def toks(s: String) = s.trim.toLowerCase.split("\\s+").toSeq
    val poolDocs = Map(1L -> "the cat sat on the mat",
      2L -> "der hund ist nicht da heute", 3L -> "the dog ran to the park",
      4L -> "el gato y el perro aqui")
    val cs = poolDocs.values.flatMap(toks).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val ct = Seq("the cat and the dog", "the mat and the park")
      .flatMap(toks).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocabV = (cs.keySet ++ ct.keySet).size.toDouble
    val (ts, tt) = (cs.values.sum.toDouble, ct.values.sum.toDouble)
    val expected = poolDocs.map { case (id, text) =>
      val ws = toks(text).map(w =>
        math.log((ct.getOrElse(w, 0L) + 1) / (tt + vocabV)) -
        math.log((cs.getOrElse(w, 0L) + 1) / (ts + vocabV)))
      id -> BigDecimal(ws.sum / ws.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = TextAnalysis.importanceSelect(pool, target, k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === expected)
    // the English-like docs dominate the k=2 cut
    val top2 = TextAnalysis.importanceSelect(pool, target, k = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(top2 === Set(1L, 3L))
    // Gumbel resampling: deterministic under a fixed salt (two runs
    // identical), size-k, and a different salt may pick differently but
    // still deterministically
    def gumbel(salt: String) =
      TextAnalysis.importanceSelect(pool, target, k = 2,
        temperature = 0.5, salt = salt)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gumbel("dsir") === gumbel("dsir"))
    assert(gumbel("dsir").size === 2)
    assert(gumbel("other-salt") === gumbel("other-salt"))
  }

  test("temperatureSample thins each group at (n_g/n_min)^(alpha-1) with " +
    "hash-exact keep decisions") {
    val docs = ((1L to 8L).map(i => (i, "big")) ++
      Seq((9L, "small"), (10L, "small"))).toDF("doc_id", "lang")
    // independent replay of the keep rule: md5-uniform(temp|id) < rate
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"temp|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
    }
    // alpha=0.5: r_big = (8/2)^(-0.5) = 0.5 (rounded 6), r_small = 1.0
    val rBig = BigDecimal(math.pow(4.0, -0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (1L to 8L).filter(u(_) < rBig).toSet ++ Set(9L, 10L)
    val got = TextAnalysis.temperatureSample(docs, "lang", alpha = 0.5)
      .select("doc_id", "keep_rate").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === expected)
    assert(got.filterKeys(_ <= 8L).values.toSet === Set(rBig))
    assert(got(9L) === 1.0 && got(10L) === 1.0)
    // alpha=1 is a no-op: every group keeps rate 1
    assert(TextAnalysis.temperatureSample(docs, "lang", alpha = 1.0)
      .count() === 10L)
  }

  test("perplexityBuckets tiers each language by its own unigram LM, " +
    "head = lowest perplexity, ties to the lower id") {
    val docs = Seq(
      (1L, "the the the", "en"),      // all common    -> head
      (2L, "the the rare1", "en"),    // mixed         -> middle
      (3L, "rare2 rare3 zzz", "en"),  // all singleton -> tail
      (4L, "der der", "de"),
      (5L, "der der", "de"))          // tie with 4 -> later tier
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.perplexityBuckets(docs, nBuckets = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3), r.getInt(4))).toMap
    // en LM: the=5, rare1/rare2/rare3/zzz=1 each, total=9
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((3L, r6(math.log(5.0 / 9)), 1)))
    assert(got(2L) ===
      ((3L, r6((2 * math.log(5.0 / 9) + math.log(1.0 / 9)) / 3), 2)))
    assert(got(3L) === ((3L, r6(math.log(1.0 / 9)), 3)))
    // de: two identical docs, scored under de's own LM (der=4/4), the
    // doc_id tie-break puts 4 in the earlier tier
    assert(got(4L) === ((2L, 0.0, 1)))
    assert(got(5L) === ((2L, 0.0, 2)))
  }

  test("capPerGroup keeps each group's k best docs, ties to the lower id") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon", "a"),  // clean -> best in a
      (2L, "alpha beta 9 gamma 8 delta", "a"),
      (3L, "alpha beta 9 gamma 8 delta", "a"),      // tie with 2 -> loses
      (4L, "9 8 7 6 5 4", "b"),
      (5L, "alpha beta gamma delta epsilon", "b"))
      .toDF("doc_id", "text", "source")
    val top1 = TextAnalysis.capPerGroup(d, "source", k = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(top1 === Set(1L, 5L))
    val top2 = TextAnalysis.capPerGroup(d, "source", k = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(top2 === Set(1L, 2L, 4L, 5L)) // tie 2-vs-3 resolves to id 2
  }

  test("stopwordHits matches words with NON-WORD edge characters: " +
    "\\b anchors can never fire before a space after '+', so such " +
    "words need whitespace lookarounds (r14 ADVICE)") {
    import org.apache.spark.sql.functions.{col, lit}
    val d = Seq((1L, "c++ is fast"), (2L, "i know cpp not c"),
      (3L, "c++c++ c++")).toDF("id", "t")
    val got = d.select(col("id"),
      TextAnalysis.stopwordHits(col("t"), Seq("c++")).as("n"))
      .orderBy("id").collect().map(_.getInt(1)).toList
    // doc 3: "c++c++" is ONE whitespace token, not two hits — only the
    // standalone trailing "c++" counts
    assert(got === List(1, 0, 1))
    // word-char stopwords keep \b semantics: punctuation still bounds
    val got2 = d.select(
      TextAnalysis.stopwordHits(lit("is, is; isnt"), Seq("is")))
      .head().getInt(0)
    assert(got2 === 2)
  }

  test("tokenBudgetSelect with STRING-TYPED all-numeric ids walks the " +
    "boundary bucket in NUMERIC id order — '10' sorts after '2' " +
    "(r14 review: the raw-string window contradicted the bucket walk)") {
    // same quality everywhere -> ONE boundary level; the id spread
    // (2..16002) makes the bucket width 9, so ids '2' and '10' land in
    // the SAME bucket — the within-bucket cut must walk 2 before 10,
    // though the raw strings sort '10' < '2'
    val docs = Seq("2", "10", "16002").map { id =>
      (id, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    }.toDF("doc_id", "text")
    val kept = TextAnalysis.tokenBudgetSelect(docs, tokenBudget = 10L,
      idCol = "doc_id")
      .select("doc_id").collect().map(_.getString(0)).toSet
    // the 10-token budget cuts inside bucket 0: numeric order keeps id
    // 2; the pre-r15 raw-string order kept id 10 instead
    assert(kept === Set("2"))
  }
}
