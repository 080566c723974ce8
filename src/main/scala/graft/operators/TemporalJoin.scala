package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: as-of join (latest right
  * row at-or-before each left row) and bounded range join (right rows
  * inside a fixed window after each left row) — the event-stream
  * enrichment shapes (attribution, feature lookup, session context) that
  * naive SQL plans as an inequality join, i.e. a broadcast nested loop or
  * cartesian product.
  *
  * Scale design (100 TB event logs):
  *   - [[asofJoin]] is the union-and-window form: tag both sides, one
  *     shuffle keyed by the join key, and a running `last(payload)` over
  *     the per-key time order. No join node at all — cost is one exchange
  *     plus a per-key sort, the same shape as sessionization. The window
  *     is always keyed (never global); hot keys are a sort-skew concern,
  *     not a cross-product one.
  *   - [[rangeJoin]] buckets time by the window width, so the inequality
  *     becomes an equi-join on (key, bucket): each left row probes exactly
  *     two buckets (its own and the next), each right row lands in one —
  *     candidate pairs are bucket-local, never all-pairs, and the exact
  *     bound filters the candidates.
  */
object TemporalJoin {

  /** As-of join: for every left row, the payload of the LATEST right row
    * with the same key and `rightTime <= leftTime` (or strictly `<` when
    * `allowEqual = false`); left rows with no prior right row keep a null
    * payload (left-join semantics).
    *
    * `payload` columns are emitted with an `asof_` prefix so they never
    * collide with left columns. Right rows must be unique per
    * (key, time) — with duplicates "the latest right row" is ill-defined;
    * pre-aggregate the right side to make the pick explicit.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      allowEqual: Boolean = true): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    // Sort order at equal timestamps decides <= vs <: the right row sorts
    // before the left row iff equal times are visible to it.
    val rightSide = if (allowEqual) 0 else 2
    val leftCols = left.columns.toSeq
    // Each branch nulls the OTHER side's struct with the exact type taken
    // from that side's schema, keeping the union schema-compatible without
    // hand-written DDL.
    val payloadStruct = struct(payload.map(col): _*)
    // SQL join null semantics, matching asofJoinBroadcast exactly (r14
    // review): a right row with a NULL key or NULL time can never serve
    // a payload — the window partition would otherwise group NULL keys
    // together (unlike any equi-join) and a NULL time would sort FIRST,
    // serving its payload to every left row with no real predecessor.
    val r = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(
      col(key).as("__k"), col(rightTime).as("__t"),
      lit(rightSide).as("__side"),
      lit(null).cast(left.select(
        struct(leftCols.map(col): _*)).schema.head.dataType).as("__row"),
      payloadStruct.as("__payload"))
    val lTyped = left.select(
      col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__row"),
      lit(null).cast(right.select(payloadStruct).schema.head.dataType)
        .as("__payload"))
    val unioned = lTyped.unionByName(r)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__asof", last("__payload", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val outCols = leftCols.map(c => col(s"__row.$c").as(c)) ++
      payload.map(c => col(s"__asof.$c").as(s"asof_$c"))
    matched.select(outCols: _*)
  }

  /** As-of join for a SMALL right side (a dimension series: prices,
    * configs, model versions): the right side is collapsed to one row per
    * key holding its time-sorted (t, payload) array, broadcast, and each
    * left row picks its match with an in-row array probe
    * (`element_at(filter(...), -1)`). ZERO shuffle of the left side —
    * against [[asofJoin]]'s one keyed exchange — so a 100 TB event scan
    * stays a narrow map. Right side must fit the broadcast budget
    * (per-key history arrays are part of the row size).
    *
    * Same output contract as [[asofJoin]]: left columns unchanged,
    * payload columns `asof_`-prefixed, null payload when no right row is
    * at-or-before (or strictly before with `allowEqual = false`). */
  def asofJoinBroadcast(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      allowEqual: Boolean = true): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val hist = right
      .groupBy(col(key).as("__k"))
      .agg(array_sort(collect_list(struct(col(rightTime).as("__t"),
        struct(payload.map(col): _*).as("__p")))).as("__hist"))
    val lt = col(leftTime)
    val visible = filter(col("__hist"),
      x => if (allowEqual) x.getField("__t") <= lt
           else x.getField("__t") < lt)
    // Guarded: element_at on an empty array throws under ANSI mode; the
    // `when` evaluates the probe only for rows with a visible match.
    val probe = when(size(visible) > 0,
      element_at(visible, -1).getField("__p"))
    val leftCols = left.columns.toSeq
    left
      .join(broadcast(hist), col(key) === col("__k"), "left")
      .withColumn("__asof", probe)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Bounded range join: all (left, right) pairs with equal `key` and
    * `rightTime` in `[leftTime, leftTime + widthSec)`. The window width
    * doubles as the time-bucket size, so each left row probes its own and
    * the following bucket and every candidate pair shares a bucket —
    * the inequality never becomes a nested-loop join.
    *
    * Right columns are emitted with an `r_` prefix.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, widthSec: Long): DataFrame = {
    require(widthSec > 0, "window width must be positive")
    val widthUs = widthSec * 1000000L
    def bucketOf(t: Column): Column = floor(unix_micros(t) / widthUs)
    val l = left
      .withColumn("__bucket",
        explode(array(bucketOf(col(leftTime)),
          bucketOf(col(leftTime)) + 1)))
    val rCols = right.columns.toSeq
    // Prefixing every right column (and probing on a private "__rt")
    // avoids collisions when both sides share column names (e.g. two
    // event streams both carrying "ts").
    val r = right
      .select(col(key) +: col(rightTime).as("__rt") +:
        rCols.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("__bucket", bucketOf(col("__rt")))
    l.join(r, Seq(key, "__bucket"))
      .filter(col("__rt") >= col(leftTime) &&
        unix_micros(col("__rt")) < unix_micros(col(leftTime)) + widthUs)
      .drop("__bucket", "__rt")
  }
}
