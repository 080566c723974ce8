package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** As-of and bounded range joins: hand-computed semantics plus the
  * no-nested-loop plan guarantee. */
class TemporalJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // quotes: user 1 at t=10, 20; user 2 at t=15
  private val quotes = Seq(
    (1L, ts(10), 100.0),
    (1L, ts(20), 200.0),
    (2L, ts(15), 150.0))
    .toDF("user_id", "ts", "price")

  // trades: user 1 at t=5 (before any quote), t=10 (equal), t=25 (after
  // both); user 2 at t=16; user 3 (no quotes at all)
  private val trades = Seq(
    (101L, 1L, ts(5)),
    (102L, 1L, ts(10)),
    (103L, 1L, ts(25)),
    (104L, 2L, ts(16)),
    (105L, 3L, ts(30)))
    .toDF("trade_id", "user_id", "ts")

  test("asofJoin picks the latest right row at-or-before each left row, " +
    "null when none") {
    val got = TemporalJoin.asofJoin(trades, quotes, "user_id",
      "ts", "ts", Seq("price"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got === Map(
      101L -> None,          // before any quote
      102L -> Some(100.0),   // equal timestamp visible
      103L -> Some(200.0),   // latest of the two
      104L -> Some(150.0),
      105L -> None))         // keyless user
  }

  test("asofJoin and asofJoinBroadcast agree on NULL keys and NULL " +
    "right times (SQL join semantics): a NULL-key right row never " +
    "serves a payload and a NULL-time right row is invisible") {
    val l = Seq((1L, Option(1L), ts(10)),
        (2L, Option.empty[Long], ts(10)))
      .toDF("trade_id", "user_id", "ts")
    val r = Seq(
      (Option(1L), Option(ts(5)), 100.0),
      (Option.empty[Long], Option(ts(5)), 666.0), // NULL key
      (Option(1L), Option.empty[java.sql.Timestamp], 777.0)) // NULL time
      .toDF("user_id", "ts", "price")
    def out(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(3)) None else Some(x.getDouble(3)))).toMap
    val win = out(TemporalJoin.asofJoin(l, r, "user_id", "ts", "ts",
      Seq("price")))
    val bc = out(TemporalJoin.asofJoinBroadcast(l, r, "user_id", "ts",
      "ts", Seq("price")))
    // pre-fix: the window form partitioned NULL keys together (trade 2
    // got 666.0) and the NULL-time row sorted FIRST, shadowing real
    // predecessors
    assert(win === Map(1L -> Some(100.0), 2L -> None))
    assert(bc === win)
  }

  test("asofJoin allowEqual=false hides the equal-timestamp right row") {
    val got = TemporalJoin.asofJoin(trades, quotes, "user_id",
      "ts", "ts", Seq("price"), allowEqual = false)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(102L) === None) // t=10 quote no longer visible at t=10
    assert(got(103L) === Some(200.0))
  }

  test("asofJoin keeps every left column and prefixes payload columns") {
    val out = TemporalJoin.asofJoin(trades, quotes, "user_id",
      "ts", "ts", Seq("price", "ts"))
    assert(out.columns.toSeq ===
      Seq("trade_id", "user_id", "ts", "asof_price", "asof_ts"))
    assert(out.count() === trades.count())
  }

  test("asofJoin plans as one keyed window — no join node, no nested loop") {
    val p = TemporalJoin.asofJoin(trades, quotes, "user_id",
      "ts", "ts", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p.take(800))
    assert(p.contains("Window"), p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      p.take(800))
  }

  test("asofJoinBroadcast matches asofJoin on both boundary modes") {
    for (allowEqual <- Seq(true, false)) {
      val expected = TemporalJoin.asofJoin(trades, quotes, "user_id",
        "ts", "ts", Seq("price", "ts"), allowEqual)
        .collect().map(_.toSeq).toSet
      val got = TemporalJoin.asofJoinBroadcast(trades, quotes, "user_id",
        "ts", "ts", Seq("price", "ts"), allowEqual)
        .collect().map(_.toSeq).toSet
      assert(got === expected, s"allowEqual=$allowEqual")
    }
  }

  test("asofJoinBroadcast never shuffles the left side (broadcast join, " +
    "no left exchange, no window)") {
    val p = TemporalJoin.asofJoinBroadcast(trades, quotes, "user_id",
      "ts", "ts", Seq("price"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1000))
    assert(!p.contains("Window"), p.take(1000))
    // The only exchange allowed is the broadcast itself (and the right
    // side's tiny pre-aggregation) — never a hash partitioning of left.
    assert(!p.contains("SortMergeJoin"), p.take(1000))
  }

  test("rangeJoin emits exactly the pairs inside [t, t+width), " +
    "bucket-blocked equi-join plan") {
    // width 10s: trade 101 (t=5) sees quotes at 10 (user 1) — [5, 15);
    // trade 102 (t=10) sees quote 10 only; 103 (t=25) none; 104 (t=16)
    // none (quote 15 is BEFORE it); 105 none.
    val df = TemporalJoin.rangeJoin(trades, quotes, "user_id",
      "ts", "ts", widthSec = 10L)
    val got = df.collect()
      .map(r => (r.getAs[Long]("trade_id"), r.getAs[Double]("r_price")))
      .toSet
    assert(got === Set((101L, 100.0), (102L, 100.0)))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p.take(800))
  }

  test("rangeJoin catches right rows in the spill-over bucket") {
    // left t=9, right t=11: different buckets of width 10 — only the
    // probe of bucket+1 finds it.
    val l = Seq((1L, 1L, ts(9))).toDF("id", "k", "ts")
    val r = Seq((1L, ts(11), 7.0)).toDF("k", "ts", "v")
    val got = TemporalJoin.rangeJoin(l, r, "k", "ts", "ts", 10L)
      .select("id", "r_v").as[(Long, Double)].collect()
    assert(got.toSeq === Seq((1L, 7.0)))
  }
}
