package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dedup decision layer: connected components over candidate pairs. */
class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("nearDupComponents labels chains and separate clusters") {
    // components: {1,2,3,4} (a chain — needs propagation rounds), {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 9L))
      .toDF("id_a", "id_b")
    val got = Dedup.nearDupComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L))
  }

  test("nearDupDuplicates drops everything but the component keeper") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
    val drops = Dedup.nearDupDuplicates(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(drops === Set(11L -> 10L, 12L -> 10L, 21L -> 20L))
  }

  test("fuzzyJoin matches near-identical docs across two tables and " +
    "keeps colliding id spaces separate") {
    // id 1 appears on BOTH sides with different text — a fuzzy join that
    // mixed the two shingle relations would corrupt both rows' sizes
    val left = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "completely unrelated content on the left side here"))
      .toDF("doc_id", "text")
    val right = Seq(
      (1L, "one two three four five six seven eight nine ten"), // = L2
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),    // = L1
      (9L, "nothing shared with anything at all whatsoever"))
      .toDF("doc_id", "text")
    for (portable <- Seq(true, false)) {
      val got = Dedup.fuzzyJoin(left, right, threshold = 0.9,
        portable = portable)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.map(t => (t._1, t._2)).toSet === Set(1L -> 2L, 2L -> 1L),
        s"portable=$portable: ${got.mkString(",")}")
      assert(got.forall(_._3 === 1.0), got.mkString(","))
    }
    // sub-identical match passes a lower gate: replace one word
    val right2 = Seq(
      (5L, "alpha beta gamma delta epsilon zeta eta IOTA"))
      .toDF("doc_id", "text")
    val fuzzy = Dedup.fuzzyJoin(left, right2, threshold = 0.3,
      portable = true).collect()
    assert(fuzzy.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set(1L -> 5L))
    val strict = Dedup.fuzzyJoin(left, right2, threshold = 0.99,
      portable = true)
    assert(strict.count() === 0L)
  }

  test("decontaminate drops exactly the docs sharing a 3-gram with the " +
    "held-out set, on both hash paths") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),      // shares "quick brown fox"
      (2L, "entirely different words here"),  // clean
      (3L, "slow brown fox runs away"),       // no shared 3-gram
      (4L, "a b the quick brown fox"))        // shares via suffix
      .toDF("doc_id", "text")
    val heldOut = Seq((100L, "watch the quick brown fox leap"))
      .toDF("doc_id", "text")
    for (portable <- Seq(true, false)) {
      val kept = Dedup.decontaminate(train, heldOut, n = 3,
          portable = portable)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(2L, 3L), s"portable=$portable")
    }
  }

  test("decontaminateBloom equals the exact broadcast path, even when an " +
    "undersized filter forces false positives through verification") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "entirely different words here"),
      (3L, "slow brown fox runs away"),
      (4L, "a b the quick brown fox"))
      .toDF("doc_id", "text")
    val heldOut = Seq((100L, "watch the quick brown fox leap"))
      .toDF("doc_id", "text")
    // fpp = 0.5 sizes the filter near its floor, so bloom false positives
    // are likely — the exact verification stage must absorb them.
    for (fpp <- Seq(0.01, 0.5)) {
      val kept = Dedup.decontaminateBloom(train, heldOut, n = 3, fpp = fpp)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(2L, 3L), s"fpp=$fpp")
    }
  }

  test("decontaminateBloom with an empty held-out set keeps everything") {
    val train = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val heldOut = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val kept = Dedup.decontaminateBloom(train, heldOut, n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
  }

  test("repetitionStats flags duplicated sentences and n-grams") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "same thing. same thing. same thing."),
      (2L, "one clause. two clause. red clause."),
      (3L, "go go go go go go"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // doc 1: 3 identical sentences -> 2/3 duplicated
    assert(got(1L)._1 === 0.6667)
    // doc 2: all sentences distinct
    assert(got(2L)._1 === 0.0)
    // doc 3: "go go" x5 -> 4/5 dup 2-grams; "go go go" x4 -> 3/4 dup
    assert(got(3L)._2 === 0.8 && got(3L)._3 === 0.75)
    // ordering plumbing: same values via the catalog shape
    assert(TextAnalysis.repetitionStats(docs).orderBy(col("doc_id"))
      .count() === 3)
  }

  test("stratifiedSample keeps at most perGroup per group, " +
    "deterministically") {
    val docs = (0 until 300)
      .map(i => (i.toLong, s"text $i", if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val a = TextAnalysis.stratifiedSample(docs, "lang", perGroup = 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = TextAnalysis.stratifiedSample(docs.repartition(17), "lang", 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.size === 50)
    assert(a.count(_ % 3 == 0) === 25)
  }

  test("dedupIncremental: exact corpus dups, near corpus dups, in-batch " +
    "exact and near dups all drop; novel docs survive") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (102L, "one two three four five six seven eight nine ten"), // near dup of 2
      (103L, "completely novel content with distinct shingle words"),
      (104L, "completely novel content with distinct shingle words"), // in-batch exact dup
      (105L, "totally different payload nothing shared anywhere honest"))
      .toDF("doc_id", "text")
    for (portable <- Seq(true, false)) {
      val index = Dedup.dedupIndex(corpus, portable = portable)
      val kept = Dedup.dedupIncremental(batch, index, portable = portable)
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(103L, 105L), s"portable=$portable")
    }
  }

  test("hammingNearDupPairs finds all pairs within the distance bound " +
    "and rejects maxDist > 3") {
    val sigs = Seq(
      (1L, 0x00000000000000FFL),
      (2L, 0x00000000000000FDL), // dist 2 from 1
      (3L, 0x00000000000000FFL), // dist 0 from 1
      (4L, 0x7F000000000000FFL)) // dist 7 from 1
      .toDF("doc_id", "simhash")
    val pairs = Dedup.hammingNearDupPairs(sigs, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    intercept[IllegalArgumentException] {
      Dedup.hammingNearDupPairs(sigs, maxDist = 4)
    }
  }

  test("sampleByWeights keeps ~weight fraction per group, " +
    "deterministically, and rejects bad weights") {
    val docs = (0 until 1000)
      .map(i => (i.toLong, s"t $i", if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val kept = TextAnalysis.sampleByWeights(docs, "lang",
      Map("en" -> 0.5, "de" -> 0.1))
      .select("doc_id", "lang").collect()
    val en = kept.count(_.getString(1) == "en")
    val de = kept.count(_.getString(1) == "de")
    assert(en > 200 && en < 300, s"en=$en expected ~250")
    assert(de > 20 && de < 80, s"de=$de expected ~50")
    // pure function of the id: same kept set under repartition
    val again = TextAnalysis.sampleByWeights(docs.repartition(9), "lang",
      Map("en" -> 0.5, "de" -> 0.1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === kept.map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException] {
      TextAnalysis.sampleByWeights(docs, "lang", Map("en" -> 1.5))
    }
  }

  test("chunkDocs: strided overlapping chunks reconstruct the token " +
    "stream; tail chunk is short; single chunk for short docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "just three tokens"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(docs, maxTokens = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3),
        r.getInt(4)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,3,6 -> 3 chunks: the window at 6 reaches the end, so a
    // start at 9 would be a strict SUFFIX of it (the r14 duplicate-tail
    // fix) — coverage is complete without it
    assert(d1.map(_._3).toSeq === Seq(0, 3, 6))
    assert(d1.head._4 === "w1 w2 w3 w4")
    assert(d1.last._4 === "w7 w8 w9 w10" && d1.last._5 === 4)
    assert(d1.forall(c => c._4.split(" ").length == c._5))
    // stride-prefix concatenation reconstructs the original stream
    val rebuilt = d1.init.flatMap(_._4.split(" ").take(3)) ++
      d1.last._4.split(" ")
    assert(rebuilt.toSeq === (1 to 10).map(i => s"w$i"))
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length === 1 && d2.head._4 === "just three tokens" &&
      d2.head._5 === 3)
  }

  test("scrubPii redacts emails, phones, and long digit runs in order") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "contact bob.smith+x@example.co.uk today"),
      (2L, "call +1 (555) 123-4567 or 555.123.4567"),
      (3L, "acct 123456789012 is overdue"),
      (4L, "no pii here")).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
      TextAnalysis.scrubPii(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "contact <EMAIL> today")
    assert(got(2L) === "call <PHONE> or <PHONE>")
    assert(got(3L) === "acct <ID> is overdue")
    assert(got(4L) === "no pii here")
  }

  test("components are partition-invariant") {
    val pairs = Seq((1L, 5L), (5L, 3L), (3L, 8L), (2L, 9L), (9L, 4L))
      .toDF("id_a", "id_b")
    val one = Dedup.nearDupComponents(pairs.repartition(1)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Dedup.nearDupComponents(pairs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === many)
    assert(one.values.toSet === Set(1L, 2L))
  }

  test("canonicalKeepers picks each component's (quality desc, id) argmax") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val quality = Seq(
      (1L, 0.1), (2L, 0.9), (3L, 0.9),   // tie 2-vs-3 -> lower id 2
      (10L, 0.5), (11L, 0.5))            // tie -> 10
      .toDF("id", "q")
    val got = Dedup.canonicalKeepers(pairs, quality).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 2L, 3L, 0.9),    // component 1 = {1,2,3}: keeper 2, best 0.9
      (10L, 10L, 2L, 0.5))) // component 10 = {10,11}: keeper 10
  }

  test("canonicalKeepers tiebreak holds for STRING ids (quality desc, id asc)") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val quality = Seq(
      ("a", 0.1), ("b", 0.9), ("c", 0.9),  // tie b-vs-c -> lexic. lower "b"
      ("x", 0.5), ("y", 0.5))              // tie -> "x"
      .toDF("id", "q")
    val got = Dedup.canonicalKeepers(pairs, quality).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      ("a", "b", 3L, 0.9),
      ("x", "x", 2L, 0.5)))
  }
}
