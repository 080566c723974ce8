package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * the mean of OBSERVED days inside the trailing `window`-day calendar
    * range (trailing EXCLUDES the current day — a spike must not shift
    * the baseline it is judged against). The frame is a calendar RANGE,
    * not a row count: a feed that resumes after a multi-week gap is
    * judged against the empty recent window (cold start), never against
    * month-old rows (r15 review). Days with zero events produce no row
    * and so contribute no baseline sample — an all-zero feed is a
    * liveness problem upstream of this gate.
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
      // range frames need a numeric sort key; epoch-day is exact
      .withColumn("__ord", datediff(col("day"), lit("1970-01-01")))
    val trail = Window.partitionBy("key").orderBy(col("__ord"))
      .rangeBetween(-window, -1)
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

  /** Last-touch attribution: each conversion event is credited to the
    * LATEST qualifying touch event by the same user inside a lookback
    * window (ties broken by event id — a total order, so credit never
    * flips). Conversions with no touch in the window surface with a NULL
    * touch (they're the "dark" conversions a marketing report must not
    * silently drop).
    *
    * Scale shape: one USER-keyed equi-join (events per user are bounded;
    * the time predicate rides along as a join residual) + one
    * max_by per conversion — no window over the raw stream, no range
    * explosion.
    *
    * @return (conv_id, conv_ts, touch_id, touch_type, mins_before
    *          round 2) */
  def lastTouchAttribution(events: DataFrame, convType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view"),
      lookbackMinutes: Long = 24 * 60): DataFrame = {
    val conv = events.filter(col("event_type") === convType)
      .select(col("user_id").as("u"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"))
    val touch = events.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id").as("u"), col("event_id").as("touch_id"),
        col("event_type").as("touch_type"), col("ts").as("touch_ts"))
    val lookbackUs = lookbackMinutes * 60L * 1000000L
    // the window predicate must live IN the left-join condition: filtered
    // afterwards, a conversion whose touches are all out-of-window would
    // vanish instead of surfacing with a NULL touch
    val cand = conv.join(touch,
      conv("u") === touch("u") &&
        unix_micros(col("touch_ts")) <= unix_micros(col("conv_ts")) &&
        unix_micros(col("touch_ts")) >
          unix_micros(col("conv_ts")) - lookbackUs,
      "left")
    cand
      .groupBy("conv_id", "conv_ts")
      .agg(max_by(
        struct(col("touch_id"), col("touch_type"), col("touch_ts")),
        // NULL-touch rows lose to any real touch: order by a nullable
        // struct — Spark max skips nulls, so make the whole key null
        when(col("touch_id").isNotNull,
          struct(unix_micros(col("touch_ts")).as("t"),
            col("touch_id").as("i"))))
        .as("best"))
      .select(col("conv_id"), col("conv_ts"),
        col("best.touch_id").as("touch_id"),
        col("best.touch_type").as("touch_type"),
        round((unix_micros(col("conv_ts")) -
          unix_micros(col("best.touch_ts"))) / lit(60000000.0), 2)
          .as("mins_before"))
  }

  /** Conversion-lag summary: of the users who did `fromType`, how many
    * later did `toType`, and how long it took (exact p50/p90 minutes over
    * first-from → first-to-after-it). One row.
    *
    * Two user-keyed min-aggregations + one percentile over the
    * (user-count-scale) lag table. */
  def conversionLag(events: DataFrame, fromType: String = "signup",
      toType: String = "purchase"): DataFrame = {
    val firstFrom = events.filter(col("event_type") === fromType)
      .groupBy(col("user_id").as("u")).agg(min("ts").as("from_ts"))
    val tos = events.filter(col("event_type") === toType)
      .select(col("user_id"), col("ts").as("to_ts"))
    // after-signup predicate in the JOIN condition (not a post-filter):
    // a user whose purchases all predate signup must stay, unconverted
    val lags = firstFrom.join(tos,
        firstFrom("u") === tos("user_id") &&
          unix_micros(col("to_ts")) >= unix_micros(col("from_ts")),
        "left")
      .groupBy("u", "from_ts")
      .agg(min("to_ts").as("first_to"))
      .withColumn("lag_mins",
        (unix_micros(col("first_to")) - unix_micros(col("from_ts"))) /
          lit(60000000.0))
    lags.agg(count(lit(1)).as("n_users"),
        count(col("first_to")).as("n_converted"),
        // null-safe: an empty feed is cvr NULL, not an ANSI 0/0 crash
        round(count(col("first_to")) /
          when(count(lit(1)) > 0, count(lit(1))), 4).as("cvr"),
        round(percentile(col("lag_mins"), lit(0.5)), 2).as("p50_mins"),
        round(percentile(col("lag_mins"), lit(0.9)), 2).as("p90_mins"))
  }

  /** Per-event lag/rolling features — the feature-store shape for
    * sequence models: previous value, delta, and trailing 3-row mean of
    * `value` per user in (ts, event_id) order. All windows are
    * USER-partitioned (small, parallel); nothing global.
    *
    * @return (event_id, user_id, value, prev_value, delta round 4,
    *          roll3 round 4) */
  def lagFeatures(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val trail3 = w.rowsBetween(-3, -1)
    events.select(col("event_id"), col("user_id"), col("value"),
        lag("value", 1).over(w).as("prev_value"),
        round(col("value") - lag("value", 1).over(w), 4).as("delta"),
        round(avg("value").over(trail3), 4).as("roll3"))
  }

  /** Frequent event 3-grams: the sequential-pattern miner's first rung —
    * which (a → b → c) behavior paths recur across users. Two leads over
    * the per-user (ts, event_id) total order, then one combinable count;
    * `minCount` drops the long tail pre-output.
    *
    * @return (e1, e2, e3, n) for trigrams with n ≥ minCount */
  def eventTrigrams(events: DataFrame, minCount: Long = 2,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    events
      .select(col(typeCol).as("e1"),
        lead(col(typeCol), 1).over(w).as("e2"),
        lead(col(typeCol), 2).over(w).as("e3"))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** RFM (recency / frequency / monetary) scoring — the user-value
    * segmentation every event warehouse ships. Quintile scores come from
    * exact 20/40/60/80th-percentile THRESHOLDS broadcast from one 1-row
    * aggregate (score = 1 + #thresholds strictly exceeded) — never a
    * global ntile window over the user table, which would single-task a
    * billion users.
    *
    * Recency counts days from the corpus max ts (so the report is
    * reproducible, not wall-clock-dependent); monetary sums `value` over
    * `monetaryType` events only.
    *
    * @return (user_id, recency_days, frequency, monetary round 2,
    *          r_score, f_score, m_score, rfm) — r_score high = recent */
  def rfmScores(events: DataFrame, monetaryType: String = "purchase",
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    // ONE pass over the event stream; the user-scale result is cut
    // because three consumers read it (corpus max, thresholds, final
    // scoring) and each would otherwise replay the full-stream
    // aggregation. Materialize.cut, not a bare localCheckpoint: the
    // returned frame stays lazy over these blocks, so the documented
    // released-on-GC semantics (and the reliable-checkpoint upgrade
    // for elastic clusters) are the contract here (r15 review).
    val perUser = Materialize.cut(events.groupBy(col(userCol))
      .agg(max(unix_micros(col(tsCol))).as("last_us"),
        count(lit(1)).as("frequency"),
        coalesce(sum(when(col("event_type") === monetaryType,
          col(valueCol))), lit(0.0)).as("monetary")))
    // corpus max ts = max of per-user maxes — no second events scan
    val corpusMax = perUser.agg(max("last_us").as("max_us"))
    val base = perUser.crossJoin(broadcast(corpusMax))
      .withColumn("recency_days",
        floor((col("max_us") - col("last_us")) / lit(86400000000L))
          .cast("long"))
    // all 12 quintile thresholds in ONE aggregate over the user table
    // (the oracle computes them the same way)
    val thresholds = base.agg(
      percentile(col("recency_days"), lit(0.2)).as("r1"),
      percentile(col("recency_days"), lit(0.4)).as("r2"),
      percentile(col("recency_days"), lit(0.6)).as("r3"),
      percentile(col("recency_days"), lit(0.8)).as("r4"),
      percentile(col("frequency"), lit(0.2)).as("f1"),
      percentile(col("frequency"), lit(0.4)).as("f2"),
      percentile(col("frequency"), lit(0.6)).as("f3"),
      percentile(col("frequency"), lit(0.8)).as("f4"),
      percentile(col("monetary"), lit(0.2)).as("m1"),
      percentile(col("monetary"), lit(0.4)).as("m2"),
      percentile(col("monetary"), lit(0.6)).as("m3"),
      percentile(col("monetary"), lit(0.8)).as("m4"))
    def score(v: Column, ts: Seq[Column]): Column =
      ts.map(t => when(v > t, 1).otherwise(0)).reduce(_ + _) + lit(1)
    base
      .crossJoin(broadcast(thresholds))
      // recency: LOWER days = better, so invert the exceedance score
      .withColumn("r_score", lit(6) - score(col("recency_days"),
        Seq(col("r1"), col("r2"), col("r3"), col("r4"))))
      .withColumn("f_score", score(col("frequency"),
        Seq(col("f1"), col("f2"), col("f3"), col("f4"))))
      .withColumn("m_score", score(col("monetary"),
        Seq(col("m1"), col("m2"), col("m3"), col("m4"))))
      .select(col(userCol), col("recency_days"), col("frequency"),
        round(col("monetary"), 2).as("monetary"), col("r_score"),
        col("f_score"), col("m_score"),
        concat(col("r_score"), col("f_score"), col("m_score")).as("rfm"))
  }

  /** Conversion by signup-week cohort: [[conversionLag]]'s decision
    * grouped by each user's first-signup ISO week — does conversion
    * quality drift across acquisition cohorts? Two user-keyed min
    * aggregations + one cohort-scale rollup.
    *
    * @return (cohort_week, n_users, n_converted, cvr round 4) */
  def cohortConversion(events: DataFrame, fromType: String = "signup",
      toType: String = "purchase"): DataFrame = {
    val firstFrom = events.filter(col("event_type") === fromType)
      .groupBy(col("user_id").as("u")).agg(min("ts").as("from_ts"))
    val tos = events.filter(col("event_type") === toType)
      .select(col("user_id"), col("ts").as("to_ts"))
    firstFrom.join(tos,
        firstFrom("u") === tos("user_id") &&
          unix_micros(col("to_ts")) >= unix_micros(col("from_ts")),
        "left")
      .groupBy("u", "from_ts")
      .agg(min("to_ts").as("first_to"))
      .groupBy(to_date(date_trunc("WEEK", col("from_ts")))
        .as("cohort_week"))
      .agg(count(lit(1)).as("n_users"),
        count(col("first_to")).as("n_converted"),
        round(count(col("first_to")) /
          when(count(lit(1)) > 0, count(lit(1))), 4).as("cvr"))
  }

  /** Weekly composition: each event type's share of traffic per ISO
    * week — the time axis q77's static composition report and q97's
    * endpoint drift score both lack: WHEN the mix shifted, not just
    * that it did. One combinable (week × type) count + a broadcast-back
    * weekly total.
    *
    * @return (week_start date, event_type, n, share round 4) */
  def weeklyComposition(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    val wk = to_date(date_trunc("WEEK", col(tsCol)))
    val cells = events.groupBy(wk.as("week_start"),
        col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("week_start").agg(sum("n").as("__wt"))
    cells.join(broadcast(totals), "week_start")
      .select(col("week_start"), col("event_type"), col("n"),
        round(col("n") / col("__wt"), 4).as("share"))
  }

  /** Session-basket association rules: for ordered pairs of event types
    * (a → b as "sessions containing both", not sequence order),
    * support = P(a ∧ b), confidence = P(b | a), lift = conf / P(b) —
    * the classic market-basket trio over gap-cut sessions. Sessions are
    * [[sessionPaths]]'s islands; baskets are DISTINCT types per session,
    * so the pair fan-out is bounded by |event types|² per session.
    *
    * @return (ante, cons, n_sessions, support round 4,
    *          confidence round 4, lift round 4) for pairs with
    *          support ≥ minSupport */
  def associationRules(events: DataFrame, gapSeconds: Long = 1800,
      minSupport: Double = 0.01, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    val run = byUser.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val baskets = events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__new",
        when(lag(col("__us"), 1).over(byUser).isNotNull &&
          col("__us") - lag(col("__us"), 1).over(byUser) >
            gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("__sess", sum("__new").over(run))
      .select(col(userCol).as("u"), col("__sess"),
        col(typeCol).as("item"))
      .distinct()
      // Materialize.cut (released-on-GC / reliable-upgradable), not a
      // bare localCheckpoint: the returned rules frame stays lazy over
      // the basket blocks (r15 review)
      .transform(Materialize.cut)
    val nSessions = baskets.select("u", "__sess").distinct().count()
    // Empty feed → empty rules frame (same hardening as conversionLag's
    // NULL cvr), not a crash: an empty events slice is a normal state for
    // an incremental pipeline. max(1) only guards the ÷0 — with zero
    // sessions the pair join below is empty anyway.
    val sessDenom = math.max(nSessions, 1L)
    val itemN = baskets.groupBy("item").agg(count(lit(1)).as("ni"))
    val pairs = baskets.as("l")
      .join(baskets.as("r"),
        col("l.u") === col("r.u") && col("l.__sess") === col("r.__sess")
          && col("l.item") =!= col("r.item"))
      .groupBy(col("l.item").as("ante"), col("r.item").as("cons"))
      .agg(count(lit(1)).as("n_sessions"))
    pairs
      .join(itemN.select(col("item").as("ante"), col("ni").as("na")),
        "ante")
      .join(itemN.select(col("item").as("cons"), col("ni").as("nb")),
        "cons")
      .withColumn("support", col("n_sessions") / lit(sessDenom.toDouble))
      .filter(col("support") >= minSupport)
      .select(col("ante"), col("cons"), col("n_sessions"),
        round(col("support"), 4).as("support"),
        round(col("n_sessions") / col("na"), 4).as("confidence"),
        round((col("n_sessions") / col("na")) /
          (col("nb") / lit(sessDenom.toDouble)), 4).as("lift"))
  }

  /** Inter-event burstiness per user: coefficient of variation and Fano
    * factor of inter-arrival gaps — the bot fingerprint ([[spikeDetect]]
    * sees volume anomalies; this sees RHYTHM: a scripted client's gaps
    * are near-constant → CV ≈ 0, organic traffic is bursty → CV ≥ 1).
    * One lag per user, then user-keyed moment aggregates.
    *
    * Users with fewer than `minEvents` events are dropped (their
    * variance is noise, and a sample stddev needs n ≥ 2 gaps).
    *
    * @return (user_id, n_gaps, mean_gap_s round 2, sd_gap_s round 2,
    *          cv round 4 — NULL when the mean gap is 0) */
  def burstiness(events: DataFrame, minEvents: Int = 5,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    val gaps = events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("gap_s",
        (col("__us") - lag("__us", 1).over(w)) / lit(1000000.0))
      .filter(col("gap_s").isNotNull)
    gaps.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"),
        avg("gap_s").as("__mean"),
        stddev_samp(col("gap_s")).as("__sd"))
      .filter(col("n_gaps") >= minEvents - 1)
      .select(col(userCol), col("n_gaps"),
        round(col("__mean"), 2).as("mean_gap_s"),
        round(col("__sd"), 2).as("sd_gap_s"),
        round(col("__sd") / when(col("__mean") > 0, col("__mean")), 4)
          .as("cv"))
  }

  /** Exponential recency-decay weights: weight = exp(−age_days/τ)
    * relative to the CORPUS max timestamp (reproducible — never
    * wall-clock), the freshness weighting a training mix applies so last
    * year's crawl doesn't dominate this month's. Pure column algebra;
    * age in exact whole days (floor), so the weight is a deterministic
    * function of the data.
    *
    * @return input columns + (age_days, decay_weight round 6) */
  def decayWeights(df: DataFrame, tsCol: String,
      tauDays: Double): DataFrame = {
    require(tauDays > 0, "decayWeights: tauDays must be positive")
    // .cast("timestamp"): harness dates ship as TIMESTAMP_NTZ in some
    // generations (Tables.events note); session TZ is pinned UTC so the
    // cast is value-preserving
    val ts = col(tsCol).cast("timestamp")
    val mx = df.agg(max(unix_micros(ts)).as("__graft_max_us"))
    df.crossJoin(broadcast(mx))
      .withColumn("age_days",
        floor((col("__graft_max_us") - unix_micros(ts)) /
          lit(86400000000L)).cast("long"))
      .withColumn("decay_weight",
        round(exp(-col("age_days") / lit(tauDays)), 6))
      .drop("__graft_max_us")
  }

  /** Top recurring session paths: sessionize per user (gap cut), render
    * each session as its ordered event-type path, count identical paths
    * across sessions. The behavioral report a funnel can't give — it
    * finds the paths you didn't think to define. All windows are
    * user-partitioned; the path table is session-scale.
    *
    * @return (path, n_sessions) for paths seen ≥ minCount times */
  def sessionPaths(events: DataFrame, gapSeconds: Long = 1800,
      minCount: Long = 2, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    val run = byUser.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__new",
        when(lag(col("__us"), 1).over(byUser).isNotNull &&
          col("__us") - lag(col("__us"), 1).over(byUser) >
            gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("__sess", sum("__new").over(run))
      .groupBy(col(userCol), col("__sess"))
      .agg(concat_ws(">",
        transform(sort_array(collect_list(struct(col("__us"),
          col(idCol).as("__id"), col(typeCol).as("__t")))),
          x => x("__t"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .filter(col("n_sessions") >= minCount)
  }

  /** Per-user activity coverage: pad each event to a fixed-length
    * interval, merge overlaps (gaps-and-islands via trailing cummax of
    * interval end), and report islands + total covered minutes per user.
    * The session-coverage metric computed EXACTLY, with all windows
    * user-partitioned.
    *
    * @return (user_id, n_intervals, covered_mins round 2) */
  def intervalCoverage(events: DataFrame,
      padMinutes: Long = 30): DataFrame = {
    val padUs = padMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("s", "event_id")
    val prevMax = max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    val runSum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + padUs).as("e"))
      .withColumn("new_island",
        when(col("s") > coalesce(prevMax, lit(Long.MinValue)), 1)
          .otherwise(0))
      .withColumn("island", sum("new_island").over(runSum))
      .groupBy("user_id", "island")
      .agg(min("s").as("is_s"), max("e").as("is_e"))
    islands.groupBy("user_id")
      .agg(count(lit(1)).as("n_intervals"),
        round(sum(col("is_e") - col("is_s")) / lit(60000000.0), 2)
          .as("covered_mins"))
  }
}
