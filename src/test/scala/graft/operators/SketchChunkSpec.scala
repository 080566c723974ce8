package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

private object TextAnalysisSpecHelpers {
  def collectDrift(df: org.apache.spark.sql.DataFrame): Map[Int, Double] =
    df.collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
}

/** Round-6 operators: count-min sketch, PMI collocations,
  * content-defined chunking, tf-idf near-dup pairs, containment,
  * embedding drift. */
class SketchChunkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the mat"),
    (3L, "a completely different sentence here"),
    (4L, "the cat sat on the mat"), // exact dup of 1
    (5L, "the cat sat on the red mat"))
    .toDF("doc_id", "text")

  // --- count-min sketch ----------------------------------------------------

  test("cmsEstimate never undercounts, and is exact when the sketch is " +
    "wide enough to be collision-free") {
    val truth = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    // narrow sketch: collisions expected, but est >= true always
    val narrow = TextAnalysis.cmsSketch(docs, width = 4, depth = 2)
    val estN = TextAnalysis.cmsEstimate(narrow, truth.select("token"),
      width = 4, depth = 2)
    val joinedN = truth.join(estN, "token").collect()
    assert(joinedN.nonEmpty)
    joinedN.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n"),
        s"undercount for ${r.getAs[String]("token")}")
    }
    // wide sketch over a tiny vocabulary: no collisions -> exact
    val wide = TextAnalysis.cmsSketch(docs, width = 4096, depth = 4)
    val estW = TextAnalysis.cmsEstimate(wide, truth.select("token"),
      width = 4096, depth = 4)
    truth.join(estW, "token").collect().foreach { r =>
      assert(r.getAs[Long]("est") === r.getAs[Long]("n"),
        s"collision in 4096-wide sketch for ${r.getAs[String]("token")}")
    }
  }

  test("cms sketches MERGE additively: sketch(a union b) = cellwise sum") {
    val a = docs.filter($"doc_id" <= 2)
    val b = docs.filter($"doc_id" > 2)
    val whole = TextAnalysis.cmsSketch(docs, width = 64, depth = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = TextAnalysis.cmsSketch(a, width = 64, depth = 2)
      .unionByName(TextAnalysis.cmsSketch(b, width = 64, depth = 2))
      .groupBy("j", "bucket").agg(sum("c").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole === merged)
  }

  // --- PMI ------------------------------------------------------------------

  test("pmiBigrams matches a hand-computed reference") {
    val d = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // bigrams: doc1 = (a,b),(b,a),(a,b); doc2 = (a,b),(b,c)
    // counts: (a,b)=3, (b,a)=1, (b,c)=1; T=5
    // unigrams: a=3, b=3, c=1; U=7
    val got = TextAnalysis.pmiBigrams(d, minCount = 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    def pmi(nab: Long, na: Long, nb: Long): Double =
      BigDecimal(math.log((nab / 5.0) / ((na / 7.0) * (nb / 7.0))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("a", "b")) === ((3L, pmi(3, 3, 3))))
    assert(got(("b", "a")) === ((1L, pmi(1, 3, 3))))
    assert(got(("b", "c")) === ((1L, pmi(1, 3, 1))))
    // minCount gates low-frequency pairs
    val gated = TextAnalysis.pmiBigrams(d, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(gated.toSeq === Seq(("a", "b")))
  }

  // --- content-defined chunking --------------------------------------------

  private val longDoc = (1 to 120).map(i => s"w${i % 37}").mkString(" ")

  test("cdcChunks partitions the token stream: chunk sizes sum to the " +
    "token count and every non-initial chunk starts at a boundary token") {
    val d = Seq((1L, longDoc)).toDF("doc_id", "text")
    val chunks = TextAnalysis.cdcChunks(d, modulus = 4)
      .orderBy("chunk_id").collect()
    assert(chunks.map(_.getAs[Long]("n_tokens")).sum === 120L)
    assert(chunks.length > 1, "modulus 4 over 120 tokens must cut chunks")
    // chunk ids are the cumulative boundary count: consecutive from the
    // first id with no gaps
    val ids = chunks.map(_.getAs[Long]("chunk_id"))
    assert(ids.toSeq === (ids.head to ids.last))
  }

  test("cdc chunking is shift-resistant: a head insertion changes O(1) " +
    "chunks, fixed-size chunking would shift them all") {
    val d1 = Seq((1L, longDoc)).toDF("doc_id", "text")
    val d2 = Seq((1L, "zzz " + longDoc)).toDF("doc_id", "text")
    def fps(d: org.apache.spark.sql.DataFrame): Set[String] =
      TextAnalysis.cdcChunks(d, modulus = 4).collect()
        .map(_.getAs[String]("chunk_fp")).toSet
    val (f1, f2) = (fps(d1), fps(d2))
    // all chunks after the first boundary are byte-identical
    assert((f1 intersect f2).size >= f1.size - 2,
      s"only ${(f1 intersect f2).size} of ${f1.size} chunks survived a " +
        "head insertion")
  }

  test("sharedChunks surfaces a passage planted in two documents") {
    val shared = (1 to 40).map(i => s"s${i % 13}").mkString(" ")
    val d = Seq(
      (1L, "intro one two three " + shared),
      (2L, shared + " outro four five"),
      (3L, "completely unrelated text stream"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.sharedChunks(
      TextAnalysis.cdcChunks(d, modulus = 4)).collect()
    assert(got.nonEmpty, "planted shared passage produced no shared chunk")
    got.foreach(r => assert(r.getAs[Long]("n_docs") >= 2L))
  }

  // --- minhash estimator error ---------------------------------------------

  test("minhashEstimateVsExact: identical docs estimate 1.0 with zero " +
    "error; estimates stay in [0,1] and pair with the exact Jaccard") {
    val d = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "one two three four five six seven yes no maybe"))
      .toDF("doc_id", "text")
    val rows = Dedup.minhashEstimateVsExact(d, numHashes = 16, bands = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (est12, jac12, err12) = rows((1L, 2L))
    assert(est12 === 1.0 && jac12 === 1.0 && err12 === 0.0)
    rows.values.foreach { case (e, j, err) =>
      assert(e >= 0.0 && e <= 1.0 && j >= 0.0 && j <= 1.0)
      assert(math.abs(err - math.abs(e - j)) < 1e-6)
    }
  }

  // --- source overlap matrix -----------------------------------------------

  test("sourceOverlapMatrix counts shared fingerprints per source pair, " +
    "diagonal = per-source distinct fingerprints") {
    val d = Seq(
      (1L, "shared doc text", "a"),
      (2L, "shared doc text", "b"),   // a-b overlap
      (3L, "only in a", "a"),
      (4L, "only in b", "b"),
      (5L, "Shared DOC text!", "c"))  // normalizes to the shared fp
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlapMatrix(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("a", "b")) === 1L)
    assert(got(("a", "c")) === 1L)
    assert(got(("b", "c")) === 1L)
    assert(got(("a", "a")) === 2L) // shared + only-in-a
    assert(got(("b", "b")) === 2L)
    assert(got(("c", "c")) === 1L)
  }

  // --- novelty --------------------------------------------------------------

  test("noveltyScore: a doc built from reference n-grams scores 0, a " +
    "fully new doc scores 1, a half-overlapping doc lands between") {
    val ref = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val pool = Seq(
      (1L, "alpha beta gamma delta"),          // all 3-grams in ref
      (2L, "qq ww ee rr tt yy"),               // none in ref
      (3L, "alpha beta gamma qq ww ee"))       // mixed
      .toDF("doc_id", "text")
    val got = TextAnalysis.noveltyScore(pool, ref).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got(1L)._3 === 0.0)
    assert(got(2L)._3 === 1.0)
    val (n3, s3, nov3) = got(3L)
    assert(s3 > 0 && s3 < n3 && nov3 > 0.0 && nov3 < 1.0)
    // portable and fast paths agree on the decisions
    val p = TextAnalysis.noveltyScore(pool, ref, portable = true).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(p === got.map { case (k, v) => k -> v._3 })
  }

  // --- quantile-normalized quality -----------------------------------------

  test("qualityQuantileNormalize ranks within each group: worst doc 0, " +
    "best doc 1, groups independent") {
    val d = Seq(
      (1L, "good clean readable text here always fine", "a"),
      (2L, "9 8 7 6 5", "a"),
      (3L, "also good clean readable text content here", "a"),
      (4L, "good clean readable text here always fine", "b"),
      (5L, "1 2 3", "b"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.qualityQuantileNormalize(d, "source")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(3))).toMap
    // per group: min rank 0.0, max rank 1.0
    for (g <- Seq("a", "b")) {
      val ranks = got.collect { case (_, (`g`, rk)) => rk }.toSeq.sorted
      assert(ranks.head === 0.0 && ranks.last === 1.0, s"group $g: $ranks")
    }
    assert(got(2L)._2 === 0.0) // digit junk ranks worst in group a
    assert(got(5L)._2 === 0.0)
  }

  // --- containment ----------------------------------------------------------

  test("containmentPairs finds asymmetric inclusion: a strict-prefix doc " +
    "has containment 1.0 while Jaccard stays below 1") {
    val full = (1 to 30).map(i => s"tok$i").mkString(" ")
    val prefix = (1 to 29).map(i => s"tok$i").mkString(" ")
    val d = Seq((1L, prefix), (2L, full),
      (3L, "entirely unrelated content stream here"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(d, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (ca, cb, jac) = got((1L, 2L))
    assert(ca === 1.0, "prefix doc fully contained")
    assert(cb < 1.0 && jac < 1.0)
    assert(!got.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  // --- corpus resemblance ----------------------------------------------------

  test("corpusResemblance: identical corpora score exact and estimated " +
    "Jaccard 1 with zero error; disjoint corpora score 0") {
    val a = Seq((1L, "one two three four five six"),
      (2L, "seven eight nine ten eleven")).toDF("doc_id", "text")
    val b = Seq((3L, "alpha beta gamma delta epsilon"),
      (4L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
    def row(x: org.apache.spark.sql.DataFrame) = {
      val r = x.head()
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))
    }
    val same = row(Dedup.corpusResemblance(a, a))
    assert(same._3 === 1.0 && same._4 === 1.0 && same._5 === 0.0)
    val disj = row(Dedup.corpusResemblance(a, b))
    assert(disj._3 === 0.0 && disj._4 === 0.0 && disj._5 === 0.0)
    // portable and fast paths agree on the EXACT side (estimates use
    // different hash families and may differ within sketch error)
    val p = row(Dedup.corpusResemblance(a, b, portable = true))
    assert(p._1 === disj._1 && p._2 === disj._2 && p._3 === disj._3)
  }

  // --- embedding drift -------------------------------------------------------

  test("embeddingDrift: identical snapshots drift 0; a shifted dimension " +
    "surfaces exactly there") {
    val rnd = new scala.util.Random(11L)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Seq.fill(4)(rnd.nextGaussian().toFloat)))
    val a = vecs.toDF("vec_id", "embedding")
    val same = TextAnalysisSpecHelpers.collectDrift(
      Similarity.embeddingDrift(a, a))
    same.values.foreach(dr => assert(dr === 0.0))
    val shifted = vecs.map { case (id, v) =>
      (id, v.updated(2, v(2) + 0.5f)) }.toDF("vec_id", "embedding")
    val moved = TextAnalysisSpecHelpers.collectDrift(
      Similarity.embeddingDrift(a, shifted))
    assert(math.abs(moved(2) - 0.5) < 1e-4)
    for (j <- Seq(0, 1, 3)) assert(moved(j) < 1e-4)
  }

  // --- tf-idf near-dup ------------------------------------------------------

  test("tfidfNearDupPairs: exact dups score 1, unrelated docs never pair, " +
    "and maxDf removes stopword-only overlap") {
    val pairs = TextSearch.tfidfNearDupPairs(docs, threshold = 0.5,
      maxDf = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(pairs((1L, 4L)) - 1.0) < 1e-9) // exact dup pair
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L },
      "unrelated doc paired")
    // with maxDf = 1 every token in more than one doc is cut: doc 1 and
    // its exact dup 4 share no surviving token -> no pairs at all
    val cut = TextSearch.tfidfNearDupPairs(docs, threshold = 0.1,
      maxDf = 1).collect()
    assert(cut.isEmpty)
  }

  test("tfidfNearDupPairs: zero-norm documents (idf-0 boilerplate only) " +
    "never pair — NaN cosines must not pass the threshold") {
    import spark.implicits._
    // 'the' appears in every doc → ln(N/df) = ln(1) = 0, so doc 30
    // ('the the') has norm 0; pre-fix its pairs scored 0/0 = NaN and
    // NaN >= threshold is TRUE under Spark's NaN-greatest ordering
    val d = Seq((10L, "the alpha beta"), (20L, "the gamma delta"),
      (30L, "the the")).toDF("doc_id", "text")
    val got = TextSearch.tfidfNearDupPairs(d, threshold = 0.1,
      maxDf = 100).collect()
    assert(!got.exists(r => r.getLong(0) == 30L || r.getLong(1) == 30L),
      "zero-norm doc paired")
    assert(got.forall(r => !r.getDouble(2).isNaN))
  }
}
