package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Enforced plan shapes: every scale claim an operator's doc makes about
  * its physical plan is asserted here, so a regression that silently
  * reintroduces a global window, loses a broadcast, or un-prunes a scan
  * fails CI instead of surviving until a 100 TB run finds it.
  */
class PlanShapeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map { i =>
      (i.toLong, s"alpha bravo charlie token$i delta echo",
        if (i % 3 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Every `Window` exec node in the plan must partition by `key`. A
    * keyed node prints `Window [exprs], [partSpec], [orderSpec]`; a
    * GLOBAL window omits the partition bracket entirely (`Window
    * [exprs], [orderSpec]`) — so a node without the three-bracket tail,
    * or whose partition bracket misses the key, fails. Asserts at least
    * one Window exists so the check can never pass vacuously. */
  private def assertWindowsKeyedBy(p: String, key: String): Unit = {
    val nodes = p.linesIterator.filter(_.contains("Window [")).toList
    assert(nodes.nonEmpty, s"no Window node found — window-shape " +
      s"assertion would be vacuous:\n${p.take(800)}")
    val tail = "\\], \\[([^\\]]+)\\], \\[[^\\]]*\\]\\s*$".r
    nodes.foreach { n =>
      val part = tail.findFirstMatchIn(n).map(_.group(1))
      assert(part.exists(_.contains(key)),
        s"Window node not partitioned by $key (global or wrong key): $n")
    }
  }

  test("stratifiedSample plans as WindowGroupLimit (map-side top-N per " +
    "group, not a full-group sort)") {
    val p = plan(TextAnalysis.stratifiedSample(docs(100), "lang", 5))
    assert(p.contains("WindowGroupLimit"), p.take(600))
  }

  test("packing and sampling plans contain no UNPARTITIONED window " +
    "(a global orderBy window collapses the corpus into one task)") {
    for (df <- Seq(
        Packing.packChunked(docs(100), 64, 8),
        TextAnalysis.stratifiedSample(docs(100), "lang", 5))) {
      val p = plan(df)
      // every Window node must carry a partition bracket — a global
      // window prints only `Window [exprs], [orderSpec]` (no partition
      // list), the shape that collapses the corpus into one task
      p.linesIterator.filter(_.contains("Window [")).foreach { n =>
        val keyed = "\\], \\[[^\\]]+\\], \\[[^\\]]*\\]\\s*$".r
          .findFirstIn(n).isDefined
        val orderOnlyTail = "\\], \\[[^\\]]*(ASC|DESC)[^\\]]*\\]\\s*$".r
        assert(keyed || orderOnlyTail.findFirstIn(n).isEmpty,
          s"unpartitioned (global) Window: $n")
      }
      assert(!"Sort \\[[^\\]]*\\], true".r.findAllIn(p).exists(_ =>
          p.contains("SinglePartition")), p.take(600))
    }
  }

  test("decontaminate broadcasts the held-out gram set") {
    val held = docs(10)
    val p = plan(Dedup.decontaminate(docs(200), held, n = 3))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("jaccardToQuery broadcasts the query token set") {
    val p = plan(Dedup.jaccardToQuery(docs(200), queryId = 1L))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("exact dedup is a single hash aggregation over the digest " +
    "(no join, no window)") {
    val p = plan(Dedup.exactGroups(docs(200)))
    assert(p.contains("HashAggregate"), p.take(600))
    assert(!p.contains("Join"), p.take(600))
    assert(!p.contains("Window"), p.take(600))
  }

  test("bm25 broadcasts the per-term dfs and the 1-row corpus stats; " +
    "top-k is TakeOrdered, never a global sort") {
    val p = plan(TextSearch.bm25TopK(docs(200), "alpha delta", k = 5))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("topVocab plans as TakeOrdered over one aggregation chain " +
    "(no global sort, no join)") {
    val p = plan(TextSearch.topVocab(docs(200), 50))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("Join"), p.take(800))
  }

  test("pairJaccard restricts the shingle relation to candidate ids " +
    "with a semi-join before the per-pair intersection") {
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val p = plan(Dedup.pairJaccard(pairs, docs(200)))
    assert(p.contains("LeftSemi"), p.take(1200))
  }

  test("dupSpanStats marks duplicated positions via a semi-join " +
    "(never a per-pair or windowed comparison)") {
    val p = plan(TextAnalysis.dupSpanStats(docs(100), n = 3))
    assert(p.contains("LeftSemi"), p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
    assert(!p.contains("Cartesian"), p.take(1200))
  }

  test("removeBoilerplateLines reassembles per doc with in-row array " +
    "sort — no window, no cartesian") {
    val d = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("doc_id", "text")
    val p = plan(TextAnalysis.removeBoilerplateLines(d, minDocs = 2))
    assert(!p.contains("Window"), p.take(1200))
    assert(!p.contains("Cartesian"), p.take(1200))
  }

  test("sampleByWeights and hashSplit plan as pure filters/projections " +
    "over the scan (no shuffle at all)") {
    for (df <- Seq(
        TextAnalysis.sampleByWeights(docs(100), "lang", Map("en" -> 0.5)),
        docs(100).select(col("doc_id"),
          TextAnalysis.hashSplit(col("doc_id"), 0.9).as("split")))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), p.take(600))
    }
  }

  test("temperatureSample joins the per-group rates by broadcast — the " +
    "corpus side is a map-side filter, never a shuffle") {
    val p = plan(TextAnalysis.temperatureSample(docs(100), "lang", 0.5))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("perplexityBuckets broadcasts the per-lang totals and its only " +
    "window is partitioned by language (never global)") {
    val p = plan(TextAnalysis.perplexityBuckets(docs(100)))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(800))
    assert(!p.contains("windowspecdefinition()"), p.take(800))
  }

  test("profile: exact mode runs deterministic per-column aggregations " +
    "(no multi-distinct rewrite); nulls, distincts and ranges are " +
    "exact; approx mode is one pass with no Expand") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (3L, "b"), (null, "c"), (5L, null))
      .toDF("k", "s")
    val got = Layout.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    assert(got("k") === ((1L, 4L, "1", "5")))
    assert(got("s") === ((1L, 3L, "a", "c")))
    // exact multi-column distinct costs an Expand; the approximate (HLL)
    // form must not
    val pApprox = plan(Layout.profile(df, Seq("k", "s"),
      approximate = true))
    assert(!pApprox.contains("Expand"), pApprox.take(600))
    val approx = Layout.profile(df, Seq("k", "s"), approximate = true)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(approx("k") === 4L && approx("s") === 3L) // HLL exact when tiny
  }

  test("driftScore: identical mixes give ~zero KL, a group missing from " +
    "the reference stays finite, and terms match a hand computation") {
    val cur = Seq.fill(30)("en").map(Tuple1(_))
      .++(Seq.fill(10)("de").map(Tuple1(_))).toDF("lang")
    val ref = Seq.fill(60)("en").map(Tuple1(_))
      .++(Seq.fill(20)("de").map(Tuple1(_))).toDF("lang")
    // identical CORPORA (not merely proportional mixes: smoothing shifts
    // different-sized corpora differently) give exactly-zero terms
    val same = Layout.driftScore(ref, ref, "lang").collect()
      .map(r => math.abs(r.getDouble(5))).sum
    assert(same === 0.0, s"identical corpora drifted: $same")
    // 'fr' exists only in current: smoothing keeps q > 0, term finite
    val cur2 = cur.union(Seq.fill(5)("fr").map(Tuple1(_)).toDF("lang"))
    val got = Layout.driftScore(cur2, ref, "lang").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(5))).toMap
    assert(got("fr")._1 === 5L && got("fr")._2 === 0L)
    val pFr = (5 + 0.5) / (45 + 3 * 0.5)
    val qFr = 0.5 / (80 + 3 * 0.5)
    val expected = BigDecimal(pFr * math.log(pFr / qFr))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("fr")._3 === expected)
  }

  test("randomProject is a pure projection over the scan — no shuffle, " +
    "the JL matrix is a codegen literal") {
    val emb = (0 until 50).map(i =>
      (i.toLong, Array.fill(16)(i * 0.01f).toSeq)).toDF("vec_id", "embedding")
    val p = plan(Similarity.randomProject(emb, outDim = 4, dim = 16))
    assert(!p.contains("Exchange"), p.take(600))
  }

  test("reducedRerankTopK touches the full-width table only through a " +
    "broadcast candidate join and cuts with TakeOrdered") {
    val emb = (0 until 50).map(i =>
      (i.toLong, Array.fill(16)(i * 0.01f).toSeq)).toDF("vec_id", "embedding")
    val p = plan(Similarity.reducedRerankTopK(emb, queryId = 1L, k = 3,
      candK = 10, outDim = 4, dim = 16))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(p.contains("TakeOrdered"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("topTokensByGroup plans as WindowGroupLimit over partial-aggregated " +
    "counts (per-task top-k per group, no full-group sort)") {
    val p = plan(TextAnalysis.topTokensByGroup(docs(100), "lang", 10))
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(p.contains("HashAggregate"), p.take(800))
  }

  test("approximate qualityTopFraction broadcasts the per-group sketch " +
    "thresholds and contains no window") {
    val p = plan(TextAnalysis.qualityTopFraction(docs(100), "lang", 0.5,
      approximate = true))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"), p.take(1000))
    assert(!p.contains("Window"), p.take(1000))
  }

  test("approximate qualityTopFraction keeps approximately the target " +
    "fraction and overlaps the exact twin's kept set") {
    // a graded quality continuum per language (digit ratio rises with i):
    // the sketch threshold may differ from the exact rank cut only at the
    // boundary score level
    val d = (0 until 200).map { i =>
      val text = "lorem ipsum dolor sit amet elit " + ("9 " * (i % 40))
      (i.toLong, text.trim, if (i % 3 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val exact = TextAnalysis.qualityTopFraction(d, "lang", 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = TextAnalysis.qualityTopFraction(d, "lang", 0.4,
        approximate = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val inter = (exact intersect approx).size
    assert(inter >= (exact.size * 0.9).toInt,
      s"overlap $inter of ${exact.size}")
    assert(math.abs(approx.size - exact.size) <=
      math.max(2, (exact.size * 0.15).toInt),
      s"kept ${approx.size} vs exact ${exact.size}")
  }

  test("Z-order layout localizes a box query to fewer files than an " +
    "id-ordered layout") {
    import org.apache.spark.sql.DataFrame
    val rnd = new scala.util.Random(5L)
    val d = (0 until 4000).map { i =>
      (i.toLong, rnd.nextDouble() * 1000.0, rnd.nextInt(1000).toLong)
    }.toDF("id", "price", "cust")
    val base = java.nio.file.Files.createTempDirectory("graft-z")
    val zDir = s"$base/zorder"; val idDir = s"$base/byid"
    Layout.writeZOrdered(d, zDir, "price", "cust", numFiles = 16)
    d.repartitionByRange(16, col("id")).sortWithinPartitions("id")
      .write.parquet(idDir)
    // box query: a narrow range on BOTH dimensions
    def filesTouched(dir: String): Int =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .count { f =>
          spark.read.parquet(f.getAbsolutePath)
            .filter(col("price").between(100.0, 200.0) &&
              col("cust").between(100L, 200L))
            .limit(1).count() > 0
        }
    val zTouched = filesTouched(zDir)
    val idTouched = filesTouched(idDir)
    // id order scatters the box across ~every file; z-order confines it
    assert(zTouched < idTouched,
      s"zorder touched $zTouched vs id-order $idTouched")
    assert(zTouched <= 6, s"zorder touched $zTouched of 16 files")
    // and the layout loses no rows
    assert(spark.read.parquet(zDir).count() === 4000L)
  }

  test("withZValue tolerates input columns that collide with its working " +
    "names and rejects a pre-existing z column loudly") {
    // columns named like the old working names must NOT become ambiguous
    val tricky = Seq((1.0, 2L, 99.0), (3.0, 4L, 98.0))
      .toDF("price", "cust", "min_a")
    val z = Layout.withZValue(tricky, "price", "cust")
    assert(z.columns.toSeq === Seq("price", "cust", "min_a", "z"))
    assert(z.count() === 2L)
    // a user 'z' column would be silently overwritten then dropped by
    // writeZOrdered — reject instead
    val withZ = Seq((1.0, 2L, 7L)).toDF("price", "cust", "z")
    val err = intercept[IllegalArgumentException] {
      Layout.withZValue(withZ, "price", "cust")
    }
    assert(err.getMessage.contains("'z' column"))
    // histogram shares the broadcast-bounds pattern: same tolerance
    val h = Layout.histogram(
      Seq((1.0, 5.0), (2.0, 6.0)).toDF("v", "min_v"), "v", 2)
    assert(h.select("bucket", "n").collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSet === Set((0L, 1L), (1L, 1L)))
  }

  test("PQ ADC candidate selection is TakeOrdered over the code scan " +
    "and the re-rank joins a broadcast candidate set") {
    val rnd = new scala.util.Random(3L)
    val emb = (0 until 80).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val books = PqIndex.train(emb, m = 2, k = 4, iters = 2)
    val p = plan(PqIndex.adcTopK(emb, books,
      Array.fill(8)(0.5), k = 5, refine = 2))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("cmsSketch is one aggregation over (depth x width) cells — no " +
    "join, no window; shuffle volume is the cell count") {
    val p = plan(TextAnalysis.cmsSketch(docs(200), width = 64, depth = 4))
    assert(!p.contains("Join"), p.take(800))
    assert(!p.contains("Window"), p.take(800))
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      p.take(800))
  }

  test("cmsEstimate broadcasts the sketch into the probe join") {
    val sk = TextAnalysis.cmsSketch(docs(200), width = 64, depth = 4)
    val p = plan(TextAnalysis.cmsEstimate(sk,
      Seq("alpha", "echo").toDF("token"), width = 64, depth = 4))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("pmiBigrams' only window is keyed by the document id (never " +
    "global) and the totals join in by broadcast") {
    val p = plan(TextAnalysis.pmiBigrams(docs(100), minCount = 2))
    assertWindowsKeyedBy(p, "doc_id")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("cdcChunks' only window is keyed by the document id") {
    val p = plan(TextAnalysis.cdcChunks(docs(100), modulus = 4))
    assertWindowsKeyedBy(p, "doc_id")
  }

  test("streamingNoveltyGate is STATELESS row algebra: the gated plan " +
    "has no exchange, no aggregate, no state store requirement") {
    val ref = docs(20)
    val p = plan(graft.streaming.EventStreams.streamingNoveltyGate(
      docs(50), ref, minNovelty = 0.5))
    assert(!p.contains("Exchange"), p.take(800))
    assert(!p.contains("Aggregate"), p.take(800))
    assert(!p.contains("StateStore"), p.take(800))
  }

  test("tfidfNearDupPairs broadcasts the 1-row corpus count and meets " +
    "pairs only through the token join") {
    val p = plan(TextSearch.tfidfNearDupPairs(docs(100), threshold = 0.5,
      maxDf = 50))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(1000))
    assert(!p.contains("CartesianProduct"), p.take(1000))
  }

  test("markupStats, canonicalizeUrl, and scriptMix are shuffle-free " +
    "scalar passes (no Exchange, no Aggregate, no Window)") {
    val urls = (0 until 50).map(i => (i.toLong, s"https://www.h$i.com/p?a=1"))
      .toDF("doc_id", "url")
    for (df <- Seq(
        WebText.markupStats(docs(50).withColumnRenamed("text", "html")),
        urls.select(WebText.canonicalizeUrl(col("url")).as("c")),
        TextAnalysis.scriptMix(docs(50)))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), p.take(800))
      assert(!p.contains("Aggregate"), p.take(800))
      assert(!p.contains("Window"), p.take(800))
    }
  }

  test("paragraphDedupKeepFirst elects winners through hash aggregation " +
    "on the fingerprint — no window over paragraphs, no cartesian") {
    val multi = docs(100).select(col("doc_id"),
      concat_ws("\n", lit("shared"), col("text")).as("text"))
    val p = plan(TextAnalysis.paragraphDedupKeepFirst(multi))
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("HashAggregate"), p.take(800))
  }

  test("bigramLogprob's only window is keyed by the document id and the " +
    "vocab scalar joins in by broadcast") {
    val p = plan(TextAnalysis.bigramLogprob(docs(100)))
    assertWindowsKeyedBy(p, "doc_id")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(1000))
    assert(!p.contains("CartesianProduct"), p.take(1000))
  }

  // --- round-8 pipeline-plane operators -----------------------------------

  private def events(n: Int) =
    (0 until n).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 60000L),
        (i % 7).toLong, Seq("click", "view", "purchase")(i % 3),
        (i % 10).toDouble)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("event time-series windows (lagFeatures, intervalCoverage, " +
    "eventTransitions) are all USER-partitioned, never global") {
    for (df <- Seq(
        TimeSeries.lagFeatures(events(100)),
        TimeSeries.intervalCoverage(events(100)),
        TimeSeries.eventTransitions(events(100)))) {
      val p = plan(df)
      p.linesIterator.filter(_.contains("Window [")).foreach { n =>
        assert(n.contains("user_id") || n.contains("from_type"),
          s"Window not keyed by user/state: $n")
      }
      assert(p.contains("Window ["), p.take(400))
    }
  }

  test("spikeDetect windows partition by the series key over the DAILY " +
    "aggregate (one combinable groupBy absorbs the raw stream first)") {
    val p = plan(TimeSeries.spikeDetect(events(200)))
    assertWindowsKeyedBy(p, "key")
    assert(p.contains("HashAggregate"), p.take(600))
  }

  test("covisitation pairs through equi-joins only (the capped item set " +
    "is checkpointed, so the final plan is join+agg — no cartesian, no " +
    "window)") {
    val inter = events(200).select(col("user_id"),
      (col("event_id") % 11).cast("int").as("item"))
    val p = plan(WebGraph.covisitation(inter))
    // the per-user cap window runs INSIDE the localCheckpoint of the
    // capped set; the downstream pair plan must be pure equi-join+agg
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("HashAggregate"), p.take(800))
  }

  test("zoneMapSkipStats runs with NO window at all (broadcast bounds + " +
    "codegen shard projection) and no cartesian") {
    val d = (0 until 200).map(i => (i.toLong, (i % 13) * 10L))
      .toDF("id", "v")
    val p = plan(Layout.zoneMapSkipStats(d, "v", "id", 10,
      Seq((0.0, 50.0))))
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("sentenceDedup elects first occurrences through hash aggregation " +
    "— no window over the (skew-prone) sentence key") {
    val p = plan(TextAnalysis.sentenceDedup(docs(100)))
    assert(!p.contains("Window"), p.take(800))
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      p.take(800))
  }

  test("lastTouchAttribution is a user-keyed equi-join plus aggregation " +
    "— no window over raw events, no cartesian") {
    val p = plan(TimeSeries.lastTouchAttribution(events(200)))
    assert(!p.contains("Window"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("the broadcast-threshold metric family (rfm, psi, lift, benford) " +
    "plans with NO window and no cartesian — thresholds ride broadcasts") {
    val scored = (0 until 200).map(i => (i / 200.0, i % 3 == 0))
      .toDF("s", "y")
    val ref = (0 until 100).map(i => Tuple1(i / 100.0)).toDF("s")
    for (df <- Seq(
        TimeSeries.rfmScores(events(200)),
        Layout.psiScore(ref, ref, "s"),
        Evaluation.liftTable(scored, "s", "y"),
        Warehouse.benfordDigits(scored, "s"))) {
      val p = plan(df)
      assert(!p.contains("Window ["), p.take(800))
      assert(!p.contains("CartesianProduct"), p.take(800))
    }
  }

  test("burstiness and sessionPaths windows are user-partitioned") {
    for (df <- Seq(
        TimeSeries.burstiness(events(300)),
        TimeSeries.sessionPaths(events(300), minCount = 1))) {
      assertWindowsKeyedBy(plan(df), "user_id")
    }
  }
}
