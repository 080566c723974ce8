package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Empty-input behavior of the round-8 operator families: every operator
  * must either return an empty/NULL-shaped relation or raise its
  * DOCUMENTED requirement — never a confusing runtime crash deep in a
  * plan. (An empty partition, a filtered-to-nothing batch, and a
  * cold-start feed are all normal states at 100 TB.)
  */
class DegenerateInputsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def emptyEvents: DataFrame =
    Seq.empty[(Long, Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("event-series operators return EMPTY relations on an empty " +
    "stream (no crash, no phantom rows)") {
    for (df <- Seq(
        TimeSeries.spikeDetect(emptyEvents),
        TimeSeries.eventTransitions(emptyEvents),
        TimeSeries.lastTouchAttribution(emptyEvents),
        TimeSeries.lagFeatures(emptyEvents),
        TimeSeries.intervalCoverage(emptyEvents),
        TimeSeries.burstiness(emptyEvents),
        TimeSeries.sessionPaths(emptyEvents),
        TimeSeries.eventTrigrams(emptyEvents),
        TimeSeries.decayWeights(emptyEvents, "ts", 30.0),
        TimeSeries.rfmScores(emptyEvents)))
      assert(df.collect().isEmpty, df.columns.mkString(","))
  }

  test("1-row summary operators survive empty input with a NULL-shaped " +
    "or empty row, never a divide-by-zero") {
    val lag = TimeSeries.conversionLag(emptyEvents).collect()
    assert(lag.length === 1 && lag(0).getLong(0) === 0L)
    val kappa = Evaluation.cohenKappa(
      Seq.empty[(String, String)].toDF("y", "p"), "y", "p").collect()
    assert(kappa.length === 1) // n NULL/0, kappa NULL — but one row
    val auc = Evaluation.bucketedAuc(
      Seq.empty[(Double, Boolean)].toDF("s", "y"), "s", "y").collect()
    assert(auc.length === 1 && auc(0).isNullAt(2))
  }

  test("text/warehouse operators return empty on empty corpora") {
    for (df <- Seq(
        TextAnalysis.sentenceDedup(emptyDocs),
        TextAnalysis.readability(emptyDocs),
        TextAnalysis.otsuThreshold(emptyDocs, "n_chars"),
        TextSearch.phraseSearch(emptyDocs, Seq("a", "b")),
        TextSearch.snippets(emptyDocs, "term"),
        Warehouse.kanonSuppress(emptyDocs, Seq("source", "lang"), 5),
        Warehouse.imputeMode(emptyDocs, "source", "lang"),
        Warehouse.benfordDigits(emptyDocs, "n_chars"),
        Warehouse.trimmedMean(emptyDocs, "source", "n_chars"),
        Warehouse.iqrOutliers(emptyDocs, "source", "n_chars"),
        Dedup.goldenRecords(emptyDocs,
          Seq.empty[(Long, Long)].toDF("id", "component")),
        Dedup.thresholdSweep(
          Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "jaccard"))))
      assert(df.collect().isEmpty, df.columns.mkString(","))
  }

  test("cdcMerge with an empty change set is the identity; with an " +
    "empty base it applies only inserts/updates") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val noChanges = Seq.empty[(Long, String, String)]
      .toDF("k", "op", "v")
    assert(Warehouse.cdcMerge(base, noChanges, "k", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a")))
    val emptyBase = Seq.empty[(Long, String)].toDF("k", "v")
    val ins = Seq((2L, "I", "b"), (3L, "D", "c")).toDF("k", "op", "v")
    assert(Warehouse.cdcMerge(emptyBase, ins, "k", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((2L, "b")))
  }

  test("graph operators document their empty-edge behavior: pageRank " +
    "and ppr REQUIRE nodes/seeds loudly, the rest return empty") {
    val noEdges = Seq.empty[(String, String)].toDF("src", "dst")
    intercept[IllegalArgumentException] {
      WebGraph.pageRank(noEdges)
    }
    intercept[IllegalArgumentException] {
      WebGraph.personalizedPageRank(noEdges,
        Seq.empty[String].toDF("node"))
    }
    assert(WebGraph.labelPropagation(noEdges).collect().isEmpty)
    assert(WebGraph.triangleStats(noEdges).collect().isEmpty)
    assert(WebGraph.covisitation(
      Seq.empty[(Long, Int)].toDF("user_id", "item")).collect().isEmpty)
  }

  test("semanticDecontaminate with an EMPTY eval set keeps every doc " +
    "(NULL max cosine, contaminated=false) — docs must not vanish") {
    val corpus = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val noEval = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .semanticDecontaminate(corpus, noEval, tau = 0.5)
      .orderBy("vec_id").collect()
    assert(got.length === 2)
    assert(got.forall(r => r.isNullAt(r.fieldIndex("max_eval_cos"))))
    assert(got.forall(!_.getAs[Boolean]("contaminated")))
    // and an empty corpus yields an empty report, not a crash
    assert(graft.operators.Similarity
      .semanticDecontaminate(noEval, corpus, tau = 0.5)
      .collect().isEmpty)
  }

  test("malformed embeddings FAIL LOUDLY instead of silently " +
    "corrupting ANN structures (r14 guards): NaN/short vectors in IVF " +
    "assignment, PQ encode, and a non-clean decontamination verdict") {
    val nan = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(Float.NaN, 1.0f)))
      .toDF("vec_id", "embedding")
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val e1 = intercept[Exception] {
      graft.operators.IvfIndex.assignments(nan, centroids).collect()
    }
    assert(e1.getMessage.contains("unassignable"))
    val short = Seq((1L, Array(1.0f))).toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      graft.operators.PqIndex.encode(short,
        graft.operators.PqIndex.portableCodebooks(1, 2, 2)).collect()
    }
    assert(e2.getMessage.contains("unencodable"))
    // a corpus doc with NULL embedding vs a NON-empty eval set must not
    // pass the decontamination gate as clean
    val corpus = Seq((1L, Some(Array(1.0f, 0.0f))),
      (2L, Option.empty[Array[Float]])).toDF("vec_id", "embedding")
    val eval = Seq((9L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e3 = intercept[Exception] {
      graft.operators.Similarity
        .semanticDecontaminate(corpus, eval, tau = 0.5).collect()
    }
    assert(e3.getMessage.contains("no comparable embedding"))
    // driver-side probe twins reject a dimension-mismatched query
    val e4 = intercept[IllegalArgumentException] {
      graft.operators.IvfIndex.probeClusters(Array(1.0), centroids, 1)
    }
    assert(e4.getMessage.contains("dim"))
  }

  test("BPE training degenerate inputs: empty corpus, zero merges, " +
    "single-char vocabulary — empty merge lists, never a crash") {
    assert(Tokenizer.bpeTrain(emptyDocs, numMerges = 5) === Seq.empty)
    assert(Tokenizer.bpeTrainLocal(Seq.empty, numMerges = 5) === Seq.empty)
    assert(Tokenizer.bpeTrainLocal(Seq(("word", 3L)), 0) === Seq.empty)
    // single-char words have no adjacent pairs: training exhausts at 0
    assert(Tokenizer.bpeTrainLocal(
      Seq(("a", 5L), ("b", 2L)), numMerges = 10) === Seq.empty)
    // applying an empty merge list tokenizes to single chars
    val docs = Seq((1L, "ab")).toDF("doc_id", "text")
    assert(Tokenizer.bpeApplyLarge(docs, Seq.empty)
      .head().getSeq[String](1).toList === List("a", "b"))
  }

  test("WARC readers on an EMPTY file and an empty directory: zero " +
    "rows, never a crash") {
    val dir = java.nio.file.Files.createTempDirectory("graft_degen_warc")
    val empty = dir.resolve("empty.warc")
    java.nio.file.Files.write(empty, Array.emptyByteArray)
    assert(graft.sources.DocSource.warc(spark, empty.toString)
      .collect().isEmpty)
    assert(graft.sources.DocSource.warcRaw(spark, empty.toString)
      .collect().isEmpty)
    assert(graft.sources.DocSource.warcMedia(spark, empty.toString)
      .collect().isEmpty)
  }

  test("tokens/tokenCount on degenerate text: empty and whitespace-only " +
    "docs have ZERO tokens, trailing non-space whitespace adds none " +
    "(r15 — split's phantom empty token is removed)") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "\t"), (4L, "a\t"),
      (5L, "a  b")).toDF("id", "t")
    val got = df.select(col("id"),
      TextAnalysis.tokens(col("t")).as("toks"),
      TextAnalysis.tokenCount(col("t")).as("n"))
      .orderBy("id").collect()
    assert(got(0).getSeq[String](1).isEmpty && got(0).getInt(2) === 0)
    assert(got(1).getSeq[String](1).isEmpty && got(1).getInt(2) === 0)
    assert(got(2).getSeq[String](1).isEmpty && got(2).getInt(2) === 0)
    assert(got(3).getSeq[String](1).toList === List("a"))
    assert(got(4).getSeq[String](1).toList === List("a", "b"))
  }

  test("degenerate docs stay IN the row set: sentenceDedup, tokensToIds " +
    "and bigramLogprob emit zero-count rows instead of dropping them " +
    "(r15 — row-count stability under empty/short text)") {
    val docs = Seq((1L, "alpha beta. alpha beta. gamma delta"),
      (2L, ""), (3L, "solo"), (4L, "   ")).toDF("doc_id", "text")
    val sd = TextAnalysis.sentenceDedup(docs).orderBy("doc_id").collect()
    assert(sd.length === 4)
    assert(sd(1).getString(1) === "" && sd(1).getLong(2) === 0L &&
      sd(1).getLong(3) === 0L)
    assert(sd(3).getLong(3) === 0L)
    val ti = TextAnalysis.tokensToIds(docs, vocabSize = 10)
      .orderBy("doc_id").collect()
    assert(ti.length === 4)
    assert(ti(1).getSeq[Int](1).isEmpty && ti(1).getLong(2) === 0L &&
      ti(1).getLong(3) === 0L)
    val bg = TextAnalysis.bigramLogprob(docs).orderBy("doc_id").collect()
    assert(bg.length === 4)
    // doc 3 has ONE token: zero bigrams, NULL score — but the row exists
    assert(bg(2).getLong(1) === 0L && bg(2).isNullAt(2))
    assert(bg(1).getLong(1) === 0L && bg(1).isNullAt(2))
    assert(bg(0).getLong(1) > 0L && !bg(0).isNullAt(2))
  }

  test("removeBoilerplateLines keeps BLANK lines: paragraph structure " +
    "is not boilerplate (r15 — blank lines previously vanished " +
    "corpus-wide even when nothing recurred)") {
    val docs = Seq(
      (1L, "header\n\npara one\n\npara two"),
      (2L, "header\n\nother text")).toDF("doc_id", "text")
    val got = TextAnalysis.removeBoilerplateLines(docs, minDocs = 2)
      .orderBy("doc_id").collect()
    // 'header' recurs in both docs -> removed; blank lines survive
    assert(got(0).getString(1) === "\npara one\n\npara two")
    assert(got(1).getString(1) === "\nother text")
  }

  test("qualityTopFraction treats NULL-quality docs identically on the " +
    "exact and approximate paths: excluded from selection AND from the " +
    "group-size basis (r15 — the twins previously diverged)") {
    val docs = Seq(
      (1L, "good text with several plain words here", "en"),
      (2L, "more quality text with enough words too", "en"),
      (3L, null.asInstanceOf[String], "en"))
      .toDF("doc_id", "text", "lang")
    val exact = TextAnalysis
      .qualityTopFraction(docs, "lang", frac = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val approx = TextAnalysis
      .qualityTopFraction(docs, "lang", frac = 1.0, approximate = true)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // frac = 1.0 keeps every SCORED doc; the NULL-text doc is excluded
    // by contract on BOTH paths (before r15 the exact path kept it)
    assert(exact.toList === List(1L, 2L))
    assert(approx.toList === List(1L, 2L))
  }

  test("normalize/fingerprint on NULL and empty text: NULL in, NULL " +
    "out; empty in, empty out") {
    val df = Seq((1L, null: String), (2L, ""), (3L, "  \t ")).toDF("id", "t")
    val got = df.select(col("id"),
      TextAnalysis.normalize(col("t")).as("n"),
      TextAnalysis.fingerprint(col("t")).as("fp"))
      .orderBy("id").collect()
    assert(got(0).isNullAt(1) && got(0).isNullAt(2))
    assert(got(1).getString(1) === "" && got(1).getString(2) != null)
    assert(got(2).getString(1) === "") // whitespace-only collapses away
  }
}
