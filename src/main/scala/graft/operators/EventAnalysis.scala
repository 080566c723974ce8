package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over event streams at rest — the monitoring/QA side of
  * a training-data platform: anomaly detection on pipeline telemetry,
  * freshness-weighted engagement, cohort retention for data-collection
  * campaigns, and behavioral path mining.
  *
  * Every operator is keyed Column algebra: aggregations are
  * partial-aggregated on their natural keys, windows always partition by
  * a bounded key (user, session), and corpus-wide scalars travel as
  * broadcast 1-row frames — no global windows, no driver-side loops over
  * data.
  */
object EventAnalysis {

  /** Robust (median/MAD) outlier detection per key — the standard
    * anomaly gate on pipeline telemetry, where mean/stddev z-scores are
    * themselves dragged by the outliers they should flag. Returns rows
    * whose modified z-score `0.6745·(v−median)/MAD` exceeds `z`
    * (|z|>3.5 is the Iglewicz–Hoban convention).
    *
    * Scale: two exact-percentile aggregations keyed by `keyCol` (event
    * type / source — bounded dimensions), each joined back by broadcast.
    * Exact `percentile` sorts per group; for high-cardinality keys swap
    * in `approx_percentile` (the q63b discipline) — the gate's shape is
    * unchanged.
    */
  def robustOutliers(events: DataFrame, z: Double = 3.5,
      keyCol: String = "event_type", valCol: String = "value")
      : DataFrame = {
    val med = events.groupBy(keyCol)
      .agg(expr(s"percentile($valCol, 0.5D)").as("med"))
    val dev = events.join(broadcast(med), keyCol)
      .withColumn("absdev", abs(col(valCol) - col("med")))
    val mad = dev.groupBy(keyCol)
      .agg(expr("percentile(absdev, 0.5D)").as("mad"))
    dev.join(broadcast(mad), keyCol)
      .filter(col("mad") > 0)
      .withColumn("rz", lit(0.6745) * (col(valCol) - col("med")) / col("mad"))
      .filter(abs(col("rz")) > z)
      .drop("absdev")
  }

  /** Exponentially time-decayed aggregates per key: each event's value is
    * weighted by `2^(−age/halfLife)` relative to the NEWEST event in the
    * table — freshness-weighted engagement/volume, the batch form of a
    * decaying counter. Returns per-key decayed value sum, decayed count
    * (= sum of weights), and the raw count.
    *
    * The reference instant and the decay constant are computed once: the
    * max-timestamp travels as a broadcast 1-row frame, and λ = ln2/halfLife
    * is a driver-side double literal (callers that need a cross-engine
    * replay interpolate the SAME literal into their SQL — see q117).
    * Age arithmetic stays on integer microseconds until the final double
    * division, so nanosecond-epoch magnitudes never round.
    */
  def decayedAggregate(events: DataFrame, halfLifeDays: Double,
      keyCol: String = "event_type", valCol: String = "value")
      : DataFrame = {
    require(halfLifeDays > 0, "halfLifeDays must be positive")
    val lambda = math.log(2.0) / halfLifeDays
    val ref = events.agg(max(unix_micros(col("ts"))).as("ref_us"))
    events.crossJoin(broadcast(ref))
      .withColumn("age_days",
        (col("ref_us") - unix_micros(col("ts"))) / lit(86400e6))
      .withColumn("w", exp(lit(-lambda) * col("age_days")))
      .groupBy(keyCol)
      .agg(sum(col(valCol) * col("w")).as("decayed_value"),
        sum("w").as("decayed_count"),
        count(lit(1)).as("n"))
  }

  /** Cohort retention matrix: users are cohorted by the bucket (default
    * week) of their FIRST event; each cell counts the cohort's users
    * active `buckets_since` buckets later — the collection-campaign
    * retention report. Bucket indexes are integral microsecond division
    * from the corpus-min origin, so every engine derives identical
    * buckets.
    *
    * Scale: one distinct over (user, bucket) — the only shuffle carrying
    * per-user rows — then a min-aggregation and an equi-join, both keyed
    * by user. The output is at most cohorts × buckets rows.
    */
  def cohortRetention(events: DataFrame, bucketDays: Int = 7,
      userCol: String = "user_id"): DataFrame = {
    require(bucketDays > 0, "bucketDays must be positive")
    val bucketUs = bucketDays * 86400L * 1000000L
    val origin = events.agg(min(unix_micros(col("ts"))).as("origin_us"))
    val bucketed = events.crossJoin(broadcast(origin))
      .withColumn("bucket",
        expr(s"(unix_micros(ts) - origin_us) div ${bucketUs}L"))
      .select(col(userCol).as("user"), col("bucket"))
      .distinct()
    val cohorts = bucketed.groupBy("user")
      .agg(min("bucket").as("cohort_bucket"))
    bucketed.join(cohorts, "user")
      .withColumn("buckets_since", col("bucket") - col("cohort_bucket"))
      .groupBy("cohort_bucket", "buckets_since")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Top-k session path n-grams: sessionize each user's stream on an
    * inactivity gap, then count length-`n` event-type sequences within
    * sessions — the dominant behavioral paths. Deterministic: events
    * order by (ts, event_id) — a total order — and the top-k breaks
    * count ties on the path string.
    *
    * Scale: both windows partition by user (sessionization) or
    * (user, session) (path assembly) — never global; the path count is a
    * partial-aggregated groupBy, and the final top-k plans as
    * TakeOrderedAndProject, so no global sort materializes.
    */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30, n: Int = 3,
      k: Int = 10, userCol: String = "user_id"): DataFrame = {
    require(n >= 2 && n <= 5, "path length n must be in [2, 5]")
    require(k > 0, "k must be positive")
    val gapUs = gapMinutes * 60L * 1000000L
    val wUser = Window.partitionBy(userCol).orderBy("ts", "event_id")
    val sess = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("us", 1).over(wUser))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs,
          1L).otherwise(0L))
      .withColumn("session_id", sum("new_s").over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wSess = Window.partitionBy(userCol, "session_id")
      .orderBy("ts", "event_id")
    val steps = (1 until n).map(i =>
      lead("event_type", i).over(wSess).as(s"e$i"))
    val withPath = sess.select(
      (col("event_type") +: steps).toIndexedSeq: _*)
    val full = withPath.filter(
      (1 until n).map(i => col(s"e$i").isNotNull).reduce(_ && _))
    full
      .select(concat_ws(">",
        (col("event_type") +: (1 until n).map(i => col(s"e$i")))
          .toIndexedSeq: _*).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }
}
