package graft.operators

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge cases for the round-8 pipeline-plane operators (the oracle
  * entries q123–q131 cover the happy path on harness data).
  */
class PipelineOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // --- labelPropagation ---------------------------------------------------

  test("labelPropagation converges two cliques joined by one bridge to " +
    "two communities with min-label tie-break") {
    // clique {a,b,c}, clique {x,y,z}, bridge c-x
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")).toDF("src", "dst")
    val got = WebGraph.labelPropagation(edges, iters = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a") === got("b"))
    assert(got("x") === got("y") && got("y") === got("z"))
  }

  test("labelPropagation is deterministic under input shuffling " +
    "(synchronous rounds + min-label tie-break)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("b", "d")).toDF("src", "dst")
    val l1 = WebGraph.labelPropagation(edges, iters = 3)
      .orderBy("node").collect().toSeq
    val l2 = WebGraph.labelPropagation(edges.repartition(5), iters = 3)
      .orderBy("node").collect().toSeq
    assert(l1 === l2)
  }

  // --- triangleStats ------------------------------------------------------

  test("triangleStats: triangle + pendant — counts, degrees, clustering") {
    // triangle a-b-c, pendant d hanging off a
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"))
      .toDF("src", "dst")
    val got = WebGraph.triangleStats(edges).orderBy("node").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("a", 3L, 1L, 0.3333), // deg 3, 1 triangle → 2·1/(3·2) round 4
      ("b", 2L, 1L, 1.0),
      ("c", 2L, 1L, 1.0),
      ("d", 1L, 0L, 0.0)))
  }

  test("triangleStats counts each triangle once regardless of edge " +
    "direction and parallel duplicates") {
    val edges = Seq(("a", "b"), ("b", "a"), ("c", "b"), ("a", "c"),
      ("a", "c")).toDF("src", "dst")
    val got = WebGraph.triangleStats(edges)
      .agg(sum("triangles")).collect()(0).getLong(0)
    assert(got === 3L) // one triangle → 3 node-contributions
  }

  // --- khopDistances ------------------------------------------------------

  test("khopDistances: min distance wins, hop bound respected, " +
    "unreached nodes absent") {
    // a→b→c→d→e chain plus shortcut a→c
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("a", "c")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val got = WebGraph.khopDistances(edges, seeds, maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2))
  }

  test("khopDistances: a seed absent from the graph stays at dist 0 and " +
    "reaches nothing") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val got = WebGraph.khopDistances(edges, Seq("q").toDF("node"), 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === Map("q" -> 0))
  }

  // --- covisitation -------------------------------------------------------

  test("covisitation: cosine over capped sets; minCo filters singletons") {
    // users 1,2 both hit items 10,20; user 3 hits 10,30 (pair 10-30 has
    // co=1 → dropped at minCo=2)
    val inter = Seq((1L, 10), (1L, 20), (2L, 10), (2L, 20), (3L, 10),
      (3L, 30)).toDF("user_id", "item")
    val got = WebGraph.covisitation(inter, maxItemsPerUser = 20, minCo = 2)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // co(10,20)=2, n10=3, n20=2 → 2/√6 = 0.8165
    assert(got === Map((10, 20) -> ((2L, 0.8165))))
  }

  test("covisitation cap keeps the most frequent items (item-id " +
    "tie-break) and bounds the pair fan-out") {
    // user 1: item 5 twice, items 6,7 once — cap 2 keeps {5,6}
    val inter = Seq((1L, 5), (1L, 5), (1L, 6), (1L, 7),
      (2L, 5), (2L, 6), (2L, 7)).toDF("user_id", "item")
    val got = WebGraph.covisitation(inter, maxItemsPerUser = 2, minCo = 2)
      .select("item_a", "item_b").as[(Int, Int)].collect().toSet
    assert(got === Set((5, 6))) // 7 capped away for both users
  }

  // --- spikeDetect --------------------------------------------------------

  private def ev(rows: Seq[(String, String)]) =
    rows.zipWithIndex.map { case ((k, day), i) =>
      (i.toLong, Timestamp.valueOf(s"$day 12:00:00"), k)
    }.toDF("event_id", "ts", "event_type")

  test("spikeDetect: cold start (<3 prior days) and constant series are " +
    "never spikes; a genuine burst is") {
    val rows =
      (1 to 7).map(d => "a" -> f"2024-01-0$d") ++ // 1/day baseline
        Seq.fill(50)("a" -> "2024-01-08") // burst day
    val got = TimeSeries.spikeDetect(ev(rows), keyCol = "event_type")
      .orderBy("day").collect()
    val byDay = got.map(r => r.getDate(1).toString ->
      (Option(r.get(4)), r.getBoolean(5))).toMap
    assert(byDay("2024-01-01") === ((None, false))) // no prior days
    assert(byDay("2024-01-03") === ((None, false))) // only 2 prior
    // days 4-7: constant baseline → sd=0 → z NULL, no spike
    assert(byDay("2024-01-05") === ((None, false)))
    assert(byDay("2024-01-08")._2 === false) // sd still 0 from constants
  }

  test("spikeDetect flags a burst against a noisy baseline and judges " +
    "it on the unrounded z") {
    val counts = Seq(10, 12, 11, 13, 10, 12, 11, 60) // day 8 bursts
    val rows = counts.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)("a" -> f"2024-01-0${i + 1}")
    }
    val got = TimeSeries.spikeDetect(ev(rows), keyCol = "event_type")
      .filter(col("day") === lit(Date.valueOf("2024-01-08")))
      .collect()(0)
    assert(got.getBoolean(5) === true)
    assert(got.getDouble(4) > 3.0)
  }

  test("spikeDetect's baseline is a CALENDAR range, not trailing rows: " +
    "a feed resuming after a long gap is a cold start, not judged " +
    "against month-old rows") {
    // 7 noisy days, a 3-week outage, then one huge day: under a ROWS
    // frame the return day would be judged against the January rows
    // (z >> 3, spurious spike); under the calendar RANGE frame the
    // trailing 7 days are empty -> z NULL, no spike
    val counts = Seq(10, 12, 11, 13, 10, 12, 11)
    val rows = counts.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)("a" -> f"2024-01-0${i + 1}")
    } ++ Seq.fill(500)("a" -> "2024-02-01")
    val got = TimeSeries.spikeDetect(ev(rows), keyCol = "event_type")
      .filter(col("day") === lit(Date.valueOf("2024-02-01")))
      .collect()(0)
    assert(got.isNullAt(4) && !got.getBoolean(5))
  }

  test("benfordDigits survives NaN and Infinity in the column (dirty " +
    "data is what the forgery test exists to examine)") {
    val d = Seq(200.0, 42.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 0.57).toDF("v")
    val got = Warehouse.benfordDigits(d, "v").orderBy("digit").collect()
    assert(got.length === 9)
    // the 3 non-finite rows contribute nothing; total n = 3 finite rows
    assert(got.map(_.getLong(1)).sum === 3L)
  }

  test("imputeMode treats a NULL group key as a group: its rows get " +
    "the NULL group's own mode (null-safe join)") {
    val d = Seq((1L, null: String, "x"), (2L, null: String, "x"),
      (3L, null: String, null: String), (4L, "g1", "y"))
      .toDF("id", "g0", "v")
    val got = Warehouse.imputeMode(d, "g0", "v").orderBy("id").collect()
      .map(r => (r.getLong(1), Option(r.getString(2)), r.getBoolean(3)))
    assert(got(2) === ((3L, Some("x"), true)))
    assert(got(0) === ((1L, Some("x"), false)))
  }

  // --- eventTransitions ---------------------------------------------------

  test("eventTransitions: per-from-state probabilities sum to 1; " +
    "equal-ts rows are ordered by event_id") {
    val d = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "a"),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "b"), // tie on ts
      (3L, Timestamp.valueOf("2024-01-01 00:00:01"), 7L, "a"),
      (4L, Timestamp.valueOf("2024-01-01 00:00:00"), 8L, "a"),
      (5L, Timestamp.valueOf("2024-01-01 00:00:01"), 8L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.eventTransitions(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSet === Set(("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5),
      ("b", "a", 1L, 1.0)))
  }

  // --- scd2Intervals ------------------------------------------------------

  test("scd2Intervals collapses runs, chains half-open intervals, and " +
    "marks the last island current") {
    val d = Seq(
      (1L, "O", Timestamp.valueOf("2024-01-01 00:00:00"), 10L),
      (1L, "O", Timestamp.valueOf("2024-01-02 00:00:00"), 11L),
      (1L, "F", Timestamp.valueOf("2024-01-03 00:00:00"), 12L),
      (1L, "O", Timestamp.valueOf("2024-01-04 00:00:00"), 13L))
      .toDF("k", "v", "ts", "id")
    val got = Warehouse.scd2Intervals(d, "k", "v", "ts", "id")
      .orderBy("valid_from").collect()
      .map(r => (r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4), r.getBoolean(5)))
    assert(got.length === 3)
    assert(got(0) === (("O", Timestamp.valueOf("2024-01-01 00:00:00"),
      Some(Timestamp.valueOf("2024-01-03 00:00:00")), 2L, false)))
    assert(got(1) === (("F", Timestamp.valueOf("2024-01-03 00:00:00"),
      Some(Timestamp.valueOf("2024-01-04 00:00:00")), 1L, false)))
    assert(got(2) === (("O", Timestamp.valueOf("2024-01-04 00:00:00"),
      None, 1L, true)))
  }

  test("scd2Intervals: same-instant status flip is ordered by the " +
    "tie-break column, so islands stay deterministic") {
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    val d = Seq((1L, "A", t, 2L), (1L, "B", t, 1L)).toDF("k", "v", "ts", "id")
    val got = Warehouse.scd2Intervals(d, "k", "v", "ts", "id")
      .orderBy("is_current").collect().map(_.getString(1)).toSeq
    assert(got === Seq("B", "A")) // id 1 first → B is the closed island
  }

  test("scd2Intervals: NULL tracked values form real islands — a " +
    "non-null→NULL transition closes the previous interval, and a NULL " +
    "run is ONE island, not one per row") {
    val d = Seq(
      (1L, Some("A"), Timestamp.valueOf("2024-01-01 00:00:00"), 10L),
      (1L, None, Timestamp.valueOf("2024-01-02 00:00:00"), 11L),
      (1L, None, Timestamp.valueOf("2024-01-03 00:00:00"), 12L),
      (1L, Some("A"), Timestamp.valueOf("2024-01-04 00:00:00"), 13L))
      .toDF("k", "v", "ts", "id")
    val got = Warehouse.scd2Intervals(d, "k", "v", "ts", "id")
      .orderBy("valid_from").collect()
      .map(r => (Option(r.getString(1)), r.getLong(4), r.getBoolean(5)))
      .toSeq
    // pre-fix: the NULL rows were absorbed into the first A island
    // (history showed A uninterrupted) — now: A | NULL(2 rows) | A
    assert(got === Seq((Some("A"), 1L, false), (None, 2L, false),
      (Some("A"), 1L, true)))
  }

  // --- cdcMerge -----------------------------------------------------------

  test("cdcMerge applies I/U/D and leaves untouched keys alone") {
    val base = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("k", "s", "p")
    val changes = Seq((2L, "U", "y2", 21.0), (3L, "D", "z", 0.0),
      (4L, "I", "w", 40.0)).toDF("k", "op", "s", "p")
    val got = Warehouse.cdcMerge(base, changes, "k", Seq("s", "p"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, "x", 10.0), (2L, "y2", 21.0), (4L, "w", 40.0)))
  }

  test("cdcMerge: delete of an absent key is a no-op") {
    val base = Seq((1L, "x")).toDF("k", "s")
    val changes = Seq((9L, "D", "q")).toDF("k", "op", "s")
    val got = Warehouse.cdcMerge(base, changes, "k", Seq("s")).collect()
    assert(got.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "x")))
  }

  // --- kanonSuppress ------------------------------------------------------

  test("kanonSuppress: cells at or above k survive, the rest merge into " +
    "one starred remainder") {
    val d = (Seq.fill(5)(("s1", "en")) ++ Seq.fill(2)(("s2", "de")) ++
      Seq.fill(1)(("s3", "fr"))).toDF("source", "lang")
    val got = Warehouse.kanonSuppress(d, Seq("source", "lang"), k = 5)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got === Seq(("*", "*", 3L, true), ("s1", "en", 5L, false)))
  }

  test("kanonSuppress: a NULL QI value in a surviving cell keeps " +
    "suppressed=false (not NULL), and a large cell whose REAL value is " +
    "'*' stays distinct from the suppressed remainder") {
    val d = (Seq.fill(6)((null: String, "en")) ++  // large cell, NULL QI
      Seq.fill(6)(("*", "de")) ++                  // large cell, real '*'
      Seq.fill(2)(("s2", "fr")))                   // small → suppressed
      .toDF("source", "lang")
    val got = Warehouse.kanonSuppress(d, Seq("source", "lang"), k = 5)
      .collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSet
    // pre-fix: the NULL-QI cell had suppressed = NULL (invisible to
    // both filter polarities) and the real '*' cell merged into the
    // remainder. Now all three are honest:
    assert(got === Set(
      (None, "en", 6L, false),
      (Some("*"), "de", 6L, false),
      (Some("*"), "*", 2L, true)))
  }

  test("finalizeStats: avg over a value column with NULLs equals " +
    "Spark's avg (non-null denominator), while n stays the row count") {
    val d = Seq(("g1", Some(10.0)), ("g1", None), ("g1", Some(30.0)))
      .toDF("g0", "v")
    val got = Warehouse.finalizeStats(Warehouse.partialStats(d, "g0", "v"))
      .collect().map(r => (r.getLong(1), r.getDouble(3))).head
    assert(got === ((3L, 20.0))) // pre-fix avg was 40/3 = 13.3333
  }

  test("trimmedMean and iqrOutliers keep the NULL group (null-safe " +
    "fence join), matching partialStats/imputeMode semantics") {
    val d = Seq((Some("a"), 1.0), (Some("a"), 2.0), (None, 5.0),
      (None, 7.0)).toDF("g0", "v")
    assert(Warehouse.trimmedMean(d, "g0", "v").count() === 2L)
    assert(Warehouse.iqrOutliers(d, "g0", "v").count() === 2L)
  }

  test("benfordDigits always emits all 9 digits — an absent digit gets " +
    "its zero row and the dominant chi-square term, not silence") {
    // values whose first significant digit is never 1
    val d = Seq(200.0, 300.0, 42.0, 0.57, 900.0).toDF("v")
    val got = Warehouse.benfordDigits(d, "v").orderBy("digit").collect()
    assert(got.length === 9)
    val d1 = got.head
    assert(d1.getInt(0) === 1 && d1.getLong(1) === 0L)
    // chi2 term for the missing digit is t * p_exp ≈ 5 * 0.301
    assert(math.abs(d1.getDouble(4) - 5 * 0.301) < 0.01)
  }

  // --- sentenceDedup ------------------------------------------------------

  test("sentenceDedup keeps the first (doc_id, pos) occurrence globally " +
    "and reassembles docs in position order") {
    val d = Seq(
      (1L, "alpha beta. gamma delta. alpha beta"),
      (2L, "gamma delta. unique here"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.sentenceDedup(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // doc 1: 'alpha beta' repeats WITHIN the doc → second copy dropped
    // doc 2: 'gamma delta' already claimed by doc 1 → dropped
    assert(got === Seq(
      (1L, "alpha beta. gamma delta", 2L, 3L),
      (2L, "unique here", 1L, 2L)))
  }

  test("sentenceDedup: a doc whose every sentence is claimed elsewhere " +
    "survives with empty text and n_kept 0") {
    val d = Seq((1L, "same thing"), (2L, "same thing"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.sentenceDedup(d).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, "same thing", 1L), (2L, "", 0L)))
  }

  // --- zoneMapSkipStats ---------------------------------------------------

  test("zoneMapSkipStats: value-clustered layout skips range predicates " +
    "the natural layout cannot") {
    // value anti-correlated with insertion order → natural shards all
    // straddle every range, clustered shards are tight
    val d = (0 until 100).map(i => (i.toLong, (i % 10) * 100L))
      .toDF("id", "v")
    val got = Layout.zoneMapSkipStats(d, "v", "id", nShards = 10,
        preds = Seq((0.0, 50.0)))
      .collect().map(r => r.getString(0) -> r.getLong(6 - 1)).toMap
    // clustered: only the shard holding v=0 overlaps [0,50] → 9 skipped
    assert(got("clustered") === 9L)
    // natural: every shard contains all 10 values → nothing skipped
    assert(got("natural") === 0L)
  }

  test("zoneMapSkipStats: constant column degenerates to one shard, " +
    "never divides by zero") {
    val d = (0 until 10).map(i => (i.toLong, 7L)).toDF("id", "v")
    val got = Layout.zoneMapSkipStats(d, "v", "id", nShards = 4,
        preds = Seq((100.0, 200.0)))
      .filter(col("layout") === "clustered").collect()(0)
    assert(got.getAs[Long]("n_shards") === 1L)
    assert(got.getAs[Long]("n_skipped") === 1L)
    assert(got.getAs[Double]("skip_frac") === 1.0)
  }

  // --- groupAwareSplit ----------------------------------------------------

  test("groupAwareSplit: every member of a component gets the SAME " +
    "split; singletons fall back to their own id") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val comps = Seq((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L))
      .toDF("id", "component")
    val got = Dedup.groupAwareSplit(docs, comps, trainFrac = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(got(1L)._2 === got(2L)._2) // component 1 never straddles
    assert(got(4L)._2 === got(5L)._2) // component 4 never straddles
    assert(got(3L)._1 === 3L) // singleton groups by its own id
    assert(got(1L)._1 === 1L && got(5L)._1 === 4L)
  }

  test("groupAwareSplit matches hashSplit of the group id (the split " +
    "function itself is unchanged)") {
    val docs = Seq(7L).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("id", "component")
    val viaGroup = Dedup.groupAwareSplit(docs, none, 0.9)
      .collect()(0).getString(2)
    val direct = docs.select(
      TextAnalysis.hashSplit(col("doc_id"), 0.9)).collect()(0).getString(0)
    assert(viaGroup === direct)
  }

  // --- partialStats / mergeStats / finalizeStats --------------------------

  test("stats state merged across disjoint batches equals the " +
    "whole-table aggregate (associativity)") {
    val full = (1 to 100).map(i => (s"s${i % 3}", i.toLong)).toDF("g0", "v")
    val b1 = Warehouse.partialStats(full.filter(col("v") <= 40), "g0", "v")
    val b2 = Warehouse.partialStats(full.filter(col("v") > 40), "g0", "v")
    val merged = Warehouse.finalizeStats(Warehouse.mergeStats(b1, b2))
      .orderBy("g").collect().toSeq
    val direct = Warehouse.finalizeStats(
        Warehouse.partialStats(full, "g0", "v"))
      .orderBy("g").collect().toSeq
    assert(merged === direct)
  }

  test("a pre-r13 at-rest state (no nn column) still merges and " +
    "finalizes — nn is reconstructed as n on read") {
    val full = (1 to 100).map(i => (s"s${i % 3}", i.toLong)).toDF("g0", "v")
    val oldState = Warehouse.partialStats(full.filter(col("v") <= 40),
      "g0", "v").drop("nn") // the schema partialStats wrote before r13
    val newState = Warehouse.partialStats(full.filter(col("v") > 40),
      "g0", "v")
    val merged = Warehouse.finalizeStats(
        Warehouse.mergeStats(oldState, newState))
      .orderBy("g").collect().toSeq
    // the old batches here are null-free, where nn := n is exact
    val direct = Warehouse.finalizeStats(
        Warehouse.partialStats(full, "g0", "v"))
      .orderBy("g").collect().toSeq
    assert(merged === direct)
    // finalize alone also accepts the old schema
    assert(Warehouse.finalizeStats(oldState).columns.toSeq ===
      Seq("g", "n", "s", "avg", "mn", "mx"))
  }

  test("mergeStats passes through groups present on only one side") {
    val a = Warehouse.partialStats(Seq(("x", 1L)).toDF("g0", "v"), "g0", "v")
    val b = Warehouse.partialStats(Seq(("y", 5L)).toDF("g0", "v"), "g0", "v")
    val got = Warehouse.finalizeStats(Warehouse.mergeStats(a, b))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toSeq
    assert(got === Seq(("x", 1L, 1L), ("y", 1L, 5L)))
  }

  // --- skewReport ---------------------------------------------------------

  test("skewReport: one hot key dominates → skew ratio and salt count " +
    "reflect max/avg") {
    // 10 keys: key 0 has 91 rows, keys 1-9 have 1 → avg 10, max 91
    val d = (Seq.fill(91)(0L) ++ (1L to 9L)).toDF("k")
    val got = SkewJoin.skewReport(d, "k").collect()(0)
    assert(got.getAs[Long]("n_keys") === 10L)
    assert(got.getAs[Long]("n_rows") === 100L)
    assert(got.getAs[Long]("max_rows") === 91L)
    assert(got.getAs[Double]("skew_ratio") === 9.1)
    assert(got.getAs[Long]("suggested_salts") === 10L) // ceil(9.1)
  }

  // --- lastTouchAttribution -----------------------------------------------

  private def evRow(id: Long, ts: String, u: Long, t: String) =
    (id, Timestamp.valueOf(ts), u, t)

  test("lastTouchAttribution credits the latest in-window touch and " +
    "surfaces out-of-window conversions with a NULL touch") {
    val d = Seq(
      evRow(1L, "2024-01-01 10:00:00", 7L, "click"),
      evRow(2L, "2024-01-01 11:00:00", 7L, "view"),
      evRow(3L, "2024-01-01 12:00:00", 7L, "purchase"), // → view (id 2)
      evRow(4L, "2024-01-05 12:00:00", 7L, "purchase"), // all stale → NULL
      evRow(5L, "2024-01-01 09:00:00", 8L, "purchase")) // no touches ever
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.lastTouchAttribution(d)
      .orderBy("conv_id").collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.toString),
        Option(r.getString(3)))).toSeq
    assert(got === Seq(
      (3L, Some("2"), Some("view")),
      (4L, None, None),
      (5L, None, None)))
  }

  test("lastTouchAttribution breaks same-instant touch ties by the " +
    "larger event id") {
    val t = "2024-01-01 10:00:00"
    val d = Seq(
      evRow(1L, t, 7L, "click"), evRow(2L, t, 7L, "view"),
      evRow(9L, "2024-01-01 10:01:00", 7L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.lastTouchAttribution(d).collect()(0)
    assert(got.getLong(2) === 2L)
  }

  // --- conversionLag ------------------------------------------------------

  test("conversionLag: purchases BEFORE signup do not convert a user, " +
    "and non-converters stay in the denominator") {
    val d = Seq(
      evRow(1L, "2024-01-01 10:00:00", 1L, "purchase"), // pre-signup
      evRow(2L, "2024-01-01 11:00:00", 1L, "signup"),
      evRow(3L, "2024-01-01 12:00:00", 2L, "signup"),
      evRow(4L, "2024-01-01 12:30:00", 2L, "purchase")) // +30 min
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.conversionLag(d).collect()(0)
    assert(got.getLong(0) === 2L) // both signed-up users counted
    assert(got.getLong(1) === 1L) // only user 2 converted
    assert(got.getDouble(2) === 0.5)
    assert(got.getDouble(3) === 30.0) // p50 over converters only
  }

  // --- lagFeatures --------------------------------------------------------

  test("lagFeatures: first row has NULL prev/delta/roll3; trailing mean " +
    "excludes the current row") {
    val d = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "a", 10.0),
      (2L, Timestamp.valueOf("2024-01-01 10:01:00"), 7L, "a", 20.0),
      (3L, Timestamp.valueOf("2024-01-01 10:02:00"), 7L, "a", 60.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = TimeSeries.lagFeatures(d).orderBy("event_id").collect()
    assert(got(0).isNullAt(3) && got(0).isNullAt(4) && got(0).isNullAt(5))
    assert(got(2).getDouble(3) === 20.0) // prev
    assert(got(2).getDouble(4) === 40.0) // delta
    assert(got(2).getDouble(5) === 15.0) // mean(10, 20)
  }

  // --- intervalCoverage ---------------------------------------------------

  test("intervalCoverage merges overlapping padded intervals and sums " +
    "the union, not the raw durations") {
    val d = Seq(
      // user 7: 10:00 and 10:10 overlap (30-min pad) → one island
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L),
      (2L, Timestamp.valueOf("2024-01-01 10:10:00"), 7L),
      // 12:00 is disjoint → second island
      (3L, Timestamp.valueOf("2024-01-01 12:00:00"), 7L))
      .toDF("event_id", "ts", "user_id")
    val got = TimeSeries.intervalCoverage(d).collect()(0)
    assert(got.getLong(1) === 2L)
    assert(got.getDouble(2) === 70.0) // [10:00,10:40] ∪ [12:00,12:30]
  }

  test("intervalCoverage: an interval starting exactly at the previous " +
    "end merges (touching counts as overlap)") {
    val d = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 7L),
      (2L, Timestamp.valueOf("2024-01-01 10:30:00"), 7L))
      .toDF("event_id", "ts", "user_id")
    val got = TimeSeries.intervalCoverage(d).collect()(0)
    assert(got.getLong(1) === 1L)
    assert(got.getDouble(2) === 60.0)
  }

  // --- goldenRecords ------------------------------------------------------

  test("goldenRecords merges each component into one survivor record " +
    "with unioned attributes; singletons pass through") {
    val docs = Seq(
      (1L, "en", "s1", 100L), (2L, "de", "s2", 250L), // one component
      (3L, "fr", "s3", 50L)) // singleton
      .toDF("doc_id", "lang", "source", "n_chars")
    val comps = Seq((1L, 1L), (2L, 1L)).toDF("id", "component")
    val got = Dedup.goldenRecords(docs, comps).orderBy("group_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getLong(5))).toSeq
    assert(got === Seq(
      (1L, 1L, 2L, "de,en", "s1,s2", 250L),
      (3L, 3L, 1L, "fr", "s3", 50L)))
  }

  // --- personalizedPageRank -----------------------------------------------

  test("personalizedPageRank concentrates mass near the seeds; nodes " +
    "unreachable from them score zero") {
    // a → b → c, and isolated pair x → y; seed = {a}
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("src", "dst")
    val got = WebGraph.personalizedPageRank(edges,
        Seq("a").toDF("node"), iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") === 0.15) // restart mass only (nothing links to a)
    assert(got("b") > got("c")) // closer to the seed
    assert(got("x") === 0.0 && got("y") === 0.0)
  }

  test("personalizedPageRank rejects damping = 1.0 at plan time (the " +
    "init's 0/0 would otherwise yield silent all-zero ranks)") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      WebGraph.personalizedPageRank(edges, Seq("a").toDF("node"),
        damping = 1.0)
    }
    assert(e.getMessage.contains("damping"))
  }

  test("personalizedPageRank with ALL nodes as seeds matches global " +
    "pageRank's restart structure") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val ppr = WebGraph.personalizedPageRank(edges,
        Seq("a", "b").toDF("node"), iters = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val pr = WebGraph.pageRank(edges, iters = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ppr === pr) // uniform restart over all nodes = global PR
  }

  // --- cohortConversion ---------------------------------------------------

  test("cohortConversion groups the conversion decision by first-signup " +
    "week; pre-signup purchases still don't convert") {
    val d = Seq(
      evRow(1L, "2024-01-01 10:00:00", 1L, "signup"), // week 1, converts
      evRow(2L, "2024-01-02 10:00:00", 1L, "purchase"),
      evRow(3L, "2024-01-03 10:00:00", 2L, "purchase"), // pre-signup
      evRow(4L, "2024-01-04 10:00:00", 2L, "signup"), // week 1, no conv
      evRow(5L, "2024-01-08 10:00:00", 3L, "signup")) // week 2, no conv
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.cohortConversion(d).orderBy("cohort_week")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3))).toSeq
    assert(got === Seq(
      ("2024-01-01", 2L, 1L, 0.5),
      ("2024-01-08", 1L, 0L, 0.0)))
  }

  // --- weeklyComposition --------------------------------------------------

  test("weeklyComposition: shares sum to 1 within each week and weeks " +
    "cut on Monday") {
    val d = Seq(
      evRow(1L, "2024-01-01 10:00:00", 1L, "a"), // Monday
      evRow(2L, "2024-01-03 10:00:00", 1L, "b"), // same ISO week
      evRow(3L, "2024-01-08 10:00:00", 1L, "a")) // next Monday
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.weeklyComposition(d).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getDouble(3)))
    assert(got.count(_._1 == "2024-01-01") === 2)
    assert(got.filter(_._1 == "2024-01-01").map(_._3).sum === 1.0)
    assert(got.filter(_._1 == "2024-01-08") ===
      Seq(("2024-01-08", "a", 1.0)))
  }

  // --- associationRules ---------------------------------------------------

  test("associationRules: support/confidence/lift hand-checked on a " +
    "3-session basket set; duplicate events in a session count once") {
    val d = Seq(
      // session 1 (user 1): {a, b} — b appears twice, counted once
      evRow(1L, "2024-01-01 10:00:00", 1L, "a"),
      evRow(2L, "2024-01-01 10:01:00", 1L, "b"),
      evRow(3L, "2024-01-01 10:02:00", 1L, "b"),
      // session 2 (user 2): {a, b}
      evRow(4L, "2024-01-01 10:00:00", 2L, "a"),
      evRow(5L, "2024-01-01 10:01:00", 2L, "b"),
      // session 3 (user 3): {a}
      evRow(6L, "2024-01-01 10:00:00", 3L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.associationRules(d, minSupport = 0.0)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // a→b: both in 2 of 3 sessions; conf = 2/3 (a in all 3); b in 2/3
    assert(got(("a", "b")) === ((2L, 0.6667, 0.6667, 1.0)))
    // b→a: conf = 2/2 = 1; lift = 1 / (3/3) = 1
    assert(got(("b", "a")) === ((2L, 0.6667, 1.0, 1.0)))
  }

  // --- trimmedMean / iqrOutliers ------------------------------------------

  test("trimmedMean discards the tails the raw mean is dragged by") {
    // 9 values of 10 plus one 1000 → mean 109, trimmed mean 10
    val d = (Seq.fill(9)(10.0) :+ 1000.0).map(("g", _)).toDF("g0", "v")
    val got = Warehouse.trimmedMean(d, "g0", "v", trim = 0.1)
      .collect()(0)
    assert(got.getAs[Double]("mean") === 109.0)
    assert(got.getAs[Double]("trimmed_mean") === 10.0)
    assert(got.getAs[Long]("n_trimmed") === 1L)
  }

  test("iqrOutliers flags exactly the beyond-fence values") {
    val d = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0)).map(("g", _))
      .toDF("g0", "v")
    val got = Warehouse.iqrOutliers(d, "g0", "v").collect()(0)
    assert(got.getAs[Long]("n_outliers") === 1L) // only the 100
    assert(got.getAs[Double]("q1") < got.getAs[Double]("q3"))
  }

  // --- percolate ----------------------------------------------------------

  test("percolate routes docs to every matching stored query, counts " +
    "multiplicity, and requires adjacency") {
    val docs = Seq(
      (1L, "big data and big data again"), // q1 ×2
      (2L, "data big"), // wrong order → no match
      (3L, "fast lane here")) // q2 ×1
      .toDF("doc_id", "text")
    val qs = Seq(("q1", "big", "data"), ("q2", "fast", "lane"))
      .toDF("query_id", "t1", "t2")
    val got = TextSearch.percolate(docs, qs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(("q1", 1L) -> 2L, ("q2", 3L) -> 1L))
  }

  // --- reshardCost --------------------------------------------------------

  test("reshardCost: consistent ring moves far fewer docs than " +
    "mod-hashing on the same growth, and neither moves more than all") {
    val d = (1L to 400L).toDF("doc_id")
    val got = Layout.reshardCost(d, "doc_id", nOld = 16, nNew = 20)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val (modMoved, modFrac) = got("mod")
    val (ringMoved, ringFrac) = got("ring")
    assert(modFrac > 0.7) // theoretical 1 − 16/lcm(16,20) = 0.8
    assert(ringFrac < 0.5 && ringMoved < modMoved)
    assert(ringFrac > 0.0) // the new nodes do claim some segments
  }

  // --- rrfFuse / thresholdSweep -------------------------------------------

  test("rrfFuse: a doc ranked first in both lists beats a doc that " +
    "tops only one; missing docs contribute nothing") {
    val r1 = Seq((1L, 10.0), (2L, 5.0), (3L, 1.0)).toDF("doc_id", "score")
    val r2 = Seq((1L, 9.0), (3L, 8.0)).toDF("doc_id", "score") // no doc 2
    val got = TextSearch.rrfFuse(Seq(r1, r2), kConst = 60)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1),
        r.getLong(2))).toMap
    assert(got(1L)._1 > got(3L)._1 && got(3L)._1 > got(2L)._1)
    assert(got(1L)._2 === 2L && got(2L)._2 === 1L)
    // exact: doc 1 = 1/61 + 1/61
    assert(got(1L)._1 === BigDecimal(2.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("thresholdSweep bands pair similarities and accumulates " +
    "survivors from the top down") {
    val pairs = Seq(0.95, 0.91, 0.55, 0.12)
      .map(j => (1L, 2L, j)).toDF("id_a", "id_b", "jaccard")
    val got = Dedup.thresholdSweep(pairs).orderBy("band_lo").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0.1, 1L, 4L), (0.5, 1L, 3L), (0.9, 2L, 2L)))
  }

  // --- snippets / lshTuningTable ------------------------------------------

  test("snippets clamps the window at text start, matches " +
    "case-insensitively, and skips non-matching docs") {
    val d = Seq(
      (1L, "Merge sort is stable"), // match at pos 1 → clamped start
      (2L, "the big merge happened late in the day yesterday evening ok"),
      (3L, "no hit here")).toDF("doc_id", "text")
    val got = TextSearch.snippets(d, "merge", radius = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got.map(_._1) === Seq(1L, 2L))
    assert(got(0)._2 === 1 && got(0)._3.startsWith("Merge sort"))
    assert(got(1)._3.contains("merge"))
    assert(got(1)._3.length <= 25) // 2·radius + term length
  }

  test("lshTuningTable: more rows per band ⇒ higher threshold; the " +
    "S-curve hits ~0.5 candidate probability near the threshold") {
    val spark2 = spark
    val t = Dedup.lshTuningTable(spark2).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getDouble(2)),
        (r.getDouble(3), r.getDouble(4)))).toMap
    val th44 = t((4, 4, 0.5))._1 // (1/4)^(1/4) ≈ 0.7071
    val th82 = t((8, 2, 0.5))._1 // (1/8)^(1/2) ≈ 0.3536
    assert(th44 > th82)
    assert(math.abs(th44 - 0.7071) < 1e-4)
    // at s = its own threshold, p ≈ 1 − (1−1/b)^b ∈ (0.63, 0.69)
    val p = t((4, 4, 0.7))._2
    assert(p > 0.4 && p < 0.8, s"p=$p")
  }

  // --- benfordDigits ------------------------------------------------------

  test("benfordDigits: digit extraction survives decimals, negatives, " +
    "sub-1 values, and zero exclusion; shares sum to 1") {
    val d = Seq(123.4, -950.0, 0.0071, 10.0, 0.0, 2e8)
      .map(Tuple1(_)).toDF("v")
    val got = Warehouse.benfordDigits(d, "v").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // digits: 1 (123.4), 9 (950), 7 (0.0071), 1 (10), 2 (2e8); 0 excluded;
    // absent digits present with zero counts (the 9-row spine)
    assert(got === Map(1 -> 2L, 2 -> 1L, 3 -> 0L, 4 -> 0L, 5 -> 0L,
      6 -> 0L, 7 -> 1L, 8 -> 0L, 9 -> 1L))
    val shares = Warehouse.benfordDigits(d, "v")
      .agg(sum("p_obs")).collect()(0).getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-6)
  }

  test("benfordDigits: a perfectly Benford-ish sample has near-zero " +
    "chi-square terms") {
    // counts proportional to log10(1+1/d) over 10000 rows
    val rows = (1 to 9).flatMap { dgt =>
      val n = math.round(10000 * math.log10(1.0 + 1.0 / dgt)).toInt
      Seq.fill(n)(Tuple1(dgt * 100.0))
    }
    val chi2 = Warehouse.benfordDigits(rows.toDF("v"), "v")
      .agg(sum("chi2_term")).collect()(0).getDouble(0)
    assert(chi2 < 1.0, s"chi2=$chi2") // χ²₈ at p=0.05 is 15.5
  }

  // --- burstiness / readability -------------------------------------------

  test("burstiness: a metronome user scores CV 0, a bursty user " +
    "scores high; sparse users are dropped") {
    val rows =
      (0 until 10).map(i => // user 1: exactly 60 s apart
        (i.toLong, new Timestamp(1700000000000L + i * 60000L), 1L, "a")) ++
      Seq(0L, 1L, 2L, 3L, 7200L).zipWithIndex.map { case (s, i) => // bursty
        (100L + i, new Timestamp(1700000000000L + s * 1000), 2L, "a") } ++
      (0 until 2).map(i => // user 3: too few events
        (200L + i, new Timestamp(1700000000000L + i * 1000), 3L, "a"))
    val d = rows.toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.burstiness(d, minEvents = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === 0.0)
    assert(got(2L) > 1.0)
  }

  test("readability: hand-computed Flesch on a two-sentence doc; " +
    "empty doc yields NULL score") {
    val d = Seq((1L, "the cat sat. the dog ran."), (2L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(d).orderBy("doc_id").collect()
    // 6 words, 2 sentences, syllable groups: e,a,a,e,o,a = 6
    assert(got(0).getLong(1) === 6L)
    assert(got(0).getLong(2) === 2L)
    assert(got(0).getLong(3) === 6L)
    // 206.835 − 1.015·3 − 84.6·1 = 119.19 (unrounded score; FP sum is
    // within an ulp of the exact rational)
    assert(math.abs(got(0).getDouble(4) - 119.19) < 1e-9)
    assert(got(1).isNullAt(4))
  }

  // --- psiScore / giniConcentration ---------------------------------------

  test("psiScore: identical samples score ~0; a shifted sample scores " +
    "high; current values below the reference min clamp into bucket 0") {
    val ref = (1 to 100).map(i => Tuple1(i / 10.0)).toDF("s")
    val psi0 = Layout.psiScore(ref, ref, "s").collect()(0).getDouble(2)
    assert(math.abs(psi0) < 1e-9)
    val shifted = (1 to 100).map(i => Tuple1(i / 10.0 + 50))
      .toDF("s") // all mass clamps into the TOP bucket
    val psiHi = Layout.psiScore(shifted, ref, "s").collect()(0)
      .getDouble(2)
    assert(psiHi > 0.25, s"psi=$psiHi")
    val below = (1 to 100).map(i => Tuple1(i / 10.0 - 50)).toDF("s")
    val psiLo = Layout.psiScore(below, ref, "s").collect()(0).getDouble(2)
    assert(psiLo > 0.25) // bottom-clamped, not negative buckets
  }

  test("NULL values have no bucket: histogram and psiScore are " +
    "unchanged by NULL rows (pre-r14 they counted as phantom TOP-" +
    "bucket mass, because Spark's least() skips null arguments)") {
    val clean = (1 to 100).map(i => Tuple1(Option(i / 10.0))).toDF("s")
    val dirty = ((1 to 100).map(i => Option(i / 10.0)) ++
      Seq.fill(50)(Option.empty[Double])).map(Tuple1(_)).toDF("s")
    val hClean = Layout.histogram(clean, "s", 10)
      .orderBy("bucket").collect().map(r =>
        (r.getLong(0), r.getLong(3))).toSeq
    val hDirty = Layout.histogram(dirty, "s", 10)
      .orderBy("bucket").collect().map(r =>
        (r.getLong(0), r.getLong(3))).toSeq
    assert(hDirty === hClean) // pre-fix: bucket 9 had +50 phantom rows
    val psiClean = Layout.psiScore(clean, clean, "s").collect()(0)
    val psiDirty = Layout.psiScore(dirty, clean, "s").collect()(0)
    assert(psiDirty.getLong(0) === psiClean.getLong(0)) // n_cur: nulls out
    assert(psiDirty.getDouble(2) === psiClean.getDouble(2))
  }

  test("driftScore: a NULL group present on BOTH sides is ONE group " +
    "(null-safe join), not a current-only plus reference-only split") {
    val cur = (Seq.fill(10)(Option("en")) ++ Seq.fill(5)(Option.empty[String]))
      .map(Tuple1(_)).toDF("lang")
    val ref = (Seq.fill(20)(Option("en")) ++ Seq.fill(8)(Option.empty[String]))
      .map(Tuple1(_)).toDF("lang")
    val rows = Layout.driftScore(cur, ref, "lang").collect()
    assert(rows.length === 2) // pre-fix: 3 rows (NULL split in two)
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) === 5L && nullRow.getLong(2) === 8L)
  }

  test("reshardCost assignment is a narrow expression: no join and no " +
    "per-doc shuffle in the plan") {
    val d = (1L to 50L).toDF("doc_id")
    val plan = Layout.reshardCost(d, "doc_id", 4, 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("giniConcentration: equal groups → 0; extreme concentration → " +
    "near 1") {
    val equal = (1 to 100).map(i => Tuple1(s"s${i % 4}")).toDF("g0")
    assert(Layout.giniConcentration(equal, "g0").collect()(0)
      .getDouble(2) === 0.0)
    val skewed = (Seq.fill(97)("big") ++ Seq("a", "b", "c"))
      .map(Tuple1(_)).toDF("g0")
    val g = Layout.giniConcentration(skewed, "g0").collect()(0)
      .getDouble(2)
    assert(g > 0.7, s"gini=$g")
  }

  // --- groupAwareFolds / liftTable / decayWeights -------------------------

  test("groupAwareFolds: one fold per component, folds in [0, k)") {
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val comps = Seq((1L, 1L), (2L, 1L)).toDF("id", "component")
    val got = Dedup.groupAwareFolds(docs, comps, k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got(1L) === got(2L)) // same component → same fold
    assert(got.values.forall(f => f >= 0 && f < 3))
  }

  test("liftTable: a separating score lifts the top bucket above 1 and " +
    "the bottom to 0; base rate recovered from cells") {
    val d = ((1 to 50).map(i => (i / 100.0, false)) ++
      (51 to 100).map(i => (i / 100.0, true))).toDF("s", "y")
    val got = Evaluation.liftTable(d, "s", "y", nBuckets = 2)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === Seq((0L, 0.0, 0.0), (1L, 1.0, 2.0))) // base rate 0.5
  }

  test("decayWeights: weight 1 at the corpus max date, e^-1 at tau days " +
    "before it") {
    val d = Seq(
      (1L, Timestamp.valueOf("2024-01-31 00:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00"))) // 30 days older
      .toDF("id", "ts")
    val got = TimeSeries.decayWeights(d, "ts", tauDays = 30.0)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("age_days"), r.getAs[Double]("decay_weight")))
      .toMap
    assert(got(1L) === ((0L, 1.0)))
    assert(got(2L) === ((30L, BigDecimal(math.exp(-1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  // --- imputeMode ---------------------------------------------------------

  test("imputeMode fills NULLs with the group mode (min tie-break), " +
    "flags them, and leaves signal-less groups NULL") {
    val d = Seq(
      (1L, "s1", "en"), (2L, "s1", "en"), (3L, "s1", "de"),
      (4L, "s1", null), // → en (2 > 1)
      (5L, "s2", "fr"), (6L, "s2", "zh"),
      (7L, "s2", null), // tie fr/zh → fr (min)
      (8L, "s3", null)) // no signal → stays NULL
      .toDF("id", "g0", "v")
    val got = Warehouse.imputeMode(d, "g0", "v").orderBy("id").collect()
      .map(r => (r.getLong(1), Option(r.getString(2)),
        r.getBoolean(3))).toSeq
    assert(got(3) === ((4L, Some("en"), true)))
    assert(got(6) === ((7L, Some("fr"), true)))
    assert(got(7) === ((8L, None, false)))
    assert(got(0) === ((1L, Some("en"), false))) // non-null untouched
  }

  // --- sessionPaths -------------------------------------------------------

  test("sessionPaths cuts at the gap, renders ordered paths, and counts " +
    "recurrences across users") {
    val d = Seq(
      // user 1, session 1: a>b ; session 2 (2h later): c
      evRow(1L, "2024-01-01 10:00:00", 1L, "a"),
      evRow(2L, "2024-01-01 10:10:00", 1L, "b"),
      evRow(3L, "2024-01-01 13:00:00", 1L, "c"),
      // user 2: a>b again
      evRow(4L, "2024-01-02 09:00:00", 2L, "a"),
      evRow(5L, "2024-01-02 09:05:00", 2L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.sessionPaths(d, minCount = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a>b" -> 2L)) // "c" session appears once → cut
  }

  // --- eventTrigrams ------------------------------------------------------

  test("eventTrigrams mines per-user consecutive triples and cuts the " +
    "tail at minCount") {
    val d = Seq(
      evRow(1L, "2024-01-01 10:00:00", 1L, "a"),
      evRow(2L, "2024-01-01 10:01:00", 1L, "b"),
      evRow(3L, "2024-01-01 10:02:00", 1L, "c"),
      evRow(4L, "2024-01-01 10:00:00", 2L, "a"),
      evRow(5L, "2024-01-01 10:01:00", 2L, "b"),
      evRow(6L, "2024-01-01 10:02:00", 2L, "c"),
      evRow(7L, "2024-01-01 10:03:00", 2L, "d")) // (b,c,d) only once
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = TimeSeries.eventTrigrams(d, minCount = 2).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3))).toMap
    assert(got === Map(("a", "b", "c") -> 2L))
  }

  // --- rfmScores ----------------------------------------------------------

  test("rfmScores: quintile scores from broadcast thresholds — the most " +
    "recent, frequent, highest-spending user maxes all three") {
    val rows = (1L to 5L).flatMap { u =>
      // user u has u events, last one u days before the corpus max,
      // and spends 10·u on one purchase
      (1L to u).map { i =>
        (u * 10 + i,
          Timestamp.valueOf(s"2024-01-${21 - u.toInt} 10:0$i:00"), u,
          if (i == 1) "purchase" else "click", if (i == 1) 10.0 * u else 0.0)
      }
    }
    val d = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = TimeSeries.rfmScores(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(7))).toMap
    // user 5: most events (5), most spend (50), most recent (day 16 →
    // smallest gap? no: user 5 is at 2024-01-16, user 1 at 2024-01-20)
    assert(got(1L)._1 === 0L) // user 1 most recent
    assert(got(5L)._2 === 5L && got(5L)._3 === 50.0)
    assert(got(1L)._4.startsWith("5")) // top recency quintile
    assert(got(5L)._4.endsWith("55")) // top frequency+monetary
  }

  // --- phraseSearch -------------------------------------------------------

  test("phraseSearch matches exact consecutive positions only, counts " +
    "multiple occurrences, and handles 3-word phrases") {
    val docs = Seq(
      (1L, "big data engine big data engine"), // phrase ×2
      (2L, "big red data engine"), // words present, not adjacent
      (3L, "data big engine"), // wrong order
      (4L, "Big Data engine")) // case-insensitive ×1
      .toDF("doc_id", "text")
    val two = TextSearch.phraseSearch(docs, Seq("big", "data"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two === Map(1L -> 2L, 4L -> 1L))
    val three = TextSearch.phraseSearch(docs, Seq("big", "data", "engine"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(three === Map(1L -> 2L, 4L -> 1L))
  }

  // --- dedupCorpusAudit ---------------------------------------------------

  test("dedupCorpusAudit stages chain (rows_in = previous rows_out) and " +
    "the final stage matches dedupCorpus itself") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"), // exact dup
      (3L, "a completely different sentence about spark engines here"),
      (4L, "1234567890 9999 888 777")) // numeric junk → quality gate
      .toDF("doc_id", "text")
    val audit = Dedup.dedupCorpusAudit(docs, minQuality = 0.3)
      .orderBy("stage_id").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(audit(0) === (("input", 4L, 4L, 0L)))
    assert(audit(1)._1 === "quality_gate" && audit(1)._3 === 3L)
    assert(audit(2) === (("exact_dedup", 3L, 2L, 1L))) // dup collapsed
    // chain property + final equality with the production operator
    audit.sliding(2).foreach { case Array(a, b) => assert(b._2 === a._3) }
    val finalN = Dedup.dedupCorpus(docs, minQuality = 0.3).count()
    assert(audit(3)._3 === finalN)
  }

  // --- otsuThreshold ------------------------------------------------------

  test("otsuThreshold cuts a clean bimodal distribution between the " +
    "modes") {
    // 50 values near 0, 50 near 100 → threshold must land between them
    val d = (Seq.fill(50)(5.0) ++ Seq.fill(50)(95.0)).toDF("q")
    val got = TextAnalysis.otsuThreshold(d, "q", nBuckets = 10)
      .collect()(0)
    val cut = got.getAs[Double]("threshold_value")
    assert(cut > 5.0 && cut < 95.0, s"cut=$cut")
    assert(got.getAs[Long]("n_below") === 50L)
    assert(got.getAs[Long]("n_above") === 50L)
  }

  test("otsuThreshold on a constant column yields no valid cut (empty " +
    "result, not a crash)") {
    val d = Seq.fill(10)(7.0).toDF("q")
    // all mass in bucket 0 → no (w0>0, w1>0) split exists → ZERO rows
    // (the oracle's WHERE varb IS NOT NULL ... LIMIT 1 shape)
    val got = TextAnalysis.otsuThreshold(d, "q", nBuckets = 10).collect()
    assert(got.isEmpty)
  }

  // --- joinCardinalityReport ----------------------------------------------

  test("joinCardinalityReport predicts the exact inner-join size from " +
    "per-key histograms, without joining the data") {
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("lk") // counts: 1→3, 2→1, 3→1
    val r = Seq(1L, 1L, 2L, 9L).toDF("rk") // counts: 1→2, 2→1, 9→1
    val got = SkewJoin.joinCardinalityReport(l, "lk", r, "rk").collect()(0)
    assert(got.getLong(0) === 2L) // shared keys {1, 2}
    assert(got.getLong(1) === 7L) // 3·2 + 1·1
    assert(got.getLong(2) === 6L) // key 1 dominates
    val actual = l.join(r, col("lk") === col("rk")).count()
    assert(actual === 7L)
  }

  // --- readEvolved --------------------------------------------------------

  test("readEvolved unions generations with differing schemas, NULLing " +
    "columns absent from older files") {
    Seq((1L, 10L)).toDF("id", "a")
      .write.mode("overwrite").parquet("/tmp/graft_evo_spec/g1")
    Seq((2L, 20L, "new")).toDF("id", "a", "b")
      .write.mode("overwrite").parquet("/tmp/graft_evo_spec/g2")
    val got = graft.sources.DocSource.readEvolved(spark,
        "/tmp/graft_evo_spec/g1", "/tmp/graft_evo_spec/g2")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
      .toSeq
    assert(got === Seq((1L, 10L, None), (2L, 20L, Some("new"))))
  }
}
