package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream time-series operators: ingest-volume anomaly detection
  * and behavioral transition modeling. A 100 TB training-data pipeline
  * watches its feeds — a source whose daily volume spikes 5σ is usually
  * a crawler loop or a spam flood, and the drop decision wants the spike
  * flagged BEFORE dedup spends a shuffle on the junk.
  *
  * Scale design: everything here aggregates the raw events down to
  * (key × day)- or (state × state)-scale relations FIRST (one map-side
  * combinable groupBy over the big table), then runs windows on the tiny
  * aggregate — never a window over the raw event stream.
  */
object TimeSeries {

  /** Daily-volume spike detection per series key: a day is a spike when
    * its count sits more than `zThresh` sample standard deviations above
    * the trailing `window`-day mean (trailing EXCLUDES the current day —
    * a spike must not shift the baseline it is judged against).
    *
    * The z-score is NULL (and the day not a spike) until 3 prior days
    * exist and the trailing deviation is positive — cold starts and
    * constant series are not anomalies.
    *
    * @return (key, day, n, mu round 4, z round 4, spike) */
  def spikeDetect(events: DataFrame, keyCol: String = "event_type",
      tsCol: String = "ts", window: Int = 7,
      zThresh: Double = 3.0): DataFrame = {
    val daily = events
      .groupBy(col(keyCol).as("key"),
        to_date(date_trunc("DAY", col(tsCol))).as("day"))
      .agg(count(lit(1)).as("n"))
    val trail = Window.partitionBy("key").orderBy("day")
      .rowsBetween(-window, -1)
    daily
      .withColumn("mu", avg("n").over(trail))
      .withColumn("sd", stddev_samp(col("n")).over(trail))
      .withColumn("prior", count(lit(1)).over(trail))
      // spike is judged on the UNROUNDED z (rounding first would flip
      // borderline days differently than an oracle that rounds late)
      .withColumn("zraw", when(col("prior") >= 3 && col("sd") > 0,
        (col("n") - col("mu")) / col("sd")))
      .select(col("key"), col("day"), col("n"), round(col("mu"), 4).as("mu"),
        round(col("zraw"), 4).as("z"),
        coalesce(col("zraw") > zThresh, lit(false)).as("spike"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next = b | current = a), the behavioral fingerprint (bot traffic
    * has near-deterministic rows; organic traffic doesn't). Sequence
    * order is (ts, event_id) — a total order, so ties in ts cannot make
    * the lead() nondeterministic.
    *
    * One window pass partitioned BY USER (millions of small partitions —
    * the scalable direction; never a global sort), then a groupBy on the
    * (|states|²)-scale transition table.
    *
    * @return (from_type, to_type, n, p round 4) */
  def eventTransitions(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val seqW = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    val trans = events
      .withColumn("to_type", lead(col(typeCol), 1).over(seqW))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy("from_type")
    trans.select(col("from_type"), col("to_type"), col("n"),
      round(col("n") / sum("n").over(tot), 4).as("p"))
  }
}
