package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators for the corpus metadata plane: SCD2
  * history build, batch CDC merge, and k-anonymity cell suppression.
  * A training-data pipeline tracks document/source state over time
  * (license status, quality tier, takedown flags); these are the standard
  * shapes that maintenance runs on at 100 TB.
  */
object Warehouse {

  /** Gaps-and-islands SCD2 build: collapse an ordered per-key change log
    * into [valid_from, valid_to) intervals, one row per consecutive run
    * of the same tracked value. `valid_to` is the NEXT interval's start
    * (half-open convention); NULL marks the current interval.
    *
    * Two window passes, both partitioned BY KEY (never global): the
    * island id is a running count of change points; the interval close is
    * a lead over the (much smaller) collapsed islands.
    *
    * Ordering must be total — pass a tie-breaker (e.g. the event id) or
    * same-instant changes make the islands nondeterministic.
    *
    * @return (key, value, valid_from, valid_to, n_rows, is_current) */
  def scd2Intervals(log: DataFrame, keyCol: String, valueCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val ord = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
    val islands = log
      // NULL-SAFE change detection: `lag(v).isNull || lag(v) =!= v`
      // read a NULL tracked value as "no previous row", silently
      // absorbing non-null→NULL transitions into the previous island
      // (the history then showed the old value uninterrupted) and
      // fragmenting NULL runs into one island per row. First row is
      // detected by row_number, value comparison by null-safe <=>.
      .withColumn("__chg",
        when(row_number().over(ord) === 1 ||
          !(lag(col(valueCol), 1).over(ord) <=> col(valueCol)), 1)
          .otherwise(0))
      .withColumn("__grp", sum("__chg").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol).as("key"), col("__grp"))
      // value is constant within an island; min() is the deterministic
      // way to say so (first() is order-dependent)
      .agg(min(col(valueCol)).as("value"),
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_rows"))
    // sequence islands by the island id, not valid_from — two islands of
    // one key can share a start date (same-day status flip) and the id is
    // the total order both engines agree on
    val seq = Window.partitionBy("key").orderBy("__grp")
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(seq))
      .select(col("key"), col("value"), col("valid_from"), col("valid_to"),
        col("n_rows"), col("valid_to").isNull.as("is_current"))
  }

  /** Batch CDC merge: apply an (op ∈ I/U/D) change set to a base snapshot
    * by key. Exactly the MERGE INTO semantics a table format runs —
    * expressed as one full-outer equi-join on the key (the shape AQE can
    * convert to a broadcast when the change batch is small, which it
    * almost always is relative to the snapshot).
    *
    * Contract: at most one change row per key (enforce upstream with a
    * last-writer-wins compaction); D drops, U/I replace, absent keeps.
    *
    * @param payloadCols the non-key columns (same names in both inputs)
    * @return merged snapshot (key ++ payloadCols) */
  def cdcMerge(base: DataFrame, changes: DataFrame, keyCol: String,
      payloadCols: Seq[String], opCol: String = "op"): DataFrame = {
    val b = base.select((keyCol +: payloadCols).map(col): _*)
    val c = changes.select(
      col(keyCol) +: col(opCol) +:
        payloadCols.map(p => col(p).as(s"__c_$p")): _*)
    val merged = b.join(c, Seq(keyCol), "full_outer")
      .filter(coalesce(col(opCol) =!= "D", lit(true)))
    val out: Seq[Column] = col(keyCol) +: payloadCols.map(p =>
      when(col(opCol).isin("U", "I"), col(s"__c_$p"))
        .otherwise(col(p)).as(p))
    merged.select(out: _*)
  }

  /** k-anonymity small-cell suppression over quasi-identifier columns:
    * cells (distinct QI combinations) with fewer than k members have
    * every QI generalized to `'*'` and are re-aggregated into the
    * suppressed remainder — the release form privacy review expects for
    * corpus composition stats.
    *
    * Two aggregations (cell count, then regroup after generalization);
    * both map-side combinable, both on QI-cardinality relations.
    *
    * @return (qiCols..., n, suppressed) */
  def kanonSuppress(df: DataFrame, qiCols: Seq[String],
      k: Int): DataFrame = {
    val cells = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    // `suppressed` is carried as its OWN boolean from the cell-size
    // decision, never re-derived from the '*' sentinel: deriving it
    // from `col === "*"` made a NULL QI value in a surviving cell
    // yield suppressed = NULL (dropped by BOTH filter polarities), and
    // merged large cells whose REAL value is the string "*" into the
    // suppressed remainder.
    val small = col("n") < k
    val generalized = qiCols.map(q =>
      when(!small, col(q).cast("string")).otherwise(lit("*")).as(q))
    cells
      .select(generalized ++ Seq(col("n"), small.as("suppressed")): _*)
      .groupBy(qiCols.map(col) :+ col("suppressed"): _*)
      .agg(sum("n").as("n"))
      .select(qiCols.map(col) ++ Seq(col("n"), col("suppressed")): _*)
  }

  /** Mergeable per-group summary state: (n, sum, min, max) — the
    * ALGEBRAIC form whose merge is associative+commutative, which is
    * what makes stats maintainable incrementally: aggregate each new
    * batch alone, merge states, never rescan history. (avg is derived
    * at read time — sum/n merges, avg doesn't.) */
  def partialStats(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), count(col(valueCol)).as("nn"),
        sum(col(valueCol)).as("s"),
        min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))

  /** State-schema upgrade for at-rest partial stats written BEFORE r13
    * added the `nn` (non-null count) column: a persisted state is the
    * whole point of a mergeable aggregate, so an old state must stay
    * mergeable/finalizable (r13 ADVICE). The old schema recorded only
    * `n`, so the best reconstruction treats every counted row as
    * non-null (`nn := n`) — exact whenever the old batches were
    * null-free (the pre-r13 `s/n` avg was only correct under that same
    * assumption, so no information is lost that the old state ever
    * had). States already carrying `nn` pass through untouched. */
  private def withNn(state: DataFrame): DataFrame =
    if (state.columns.contains("nn")) state
    else state.withColumn("nn", col("n"))

  /** Merge two partial-stats states (same schema as [[partialStats]];
    * pre-r13 states without `nn` are upgraded via [[withNn]]).
    * Groups present in only one side pass through. */
  def mergeStats(a: DataFrame, b: DataFrame): DataFrame =
    withNn(a).unionByName(withNn(b))
      .groupBy("g")
      .agg(sum("n").as("n"), sum("nn").as("nn"), sum("s").as("s"),
        min("mn").as("mn"), max("mx").as("mx"))

  /** Finalize a stats state for reading: derive avg over the NON-NULL
    * count (`nn`) — `s` skips NULLs while `n` counts every row, so
    * `s/n` diverged from Spark's `avg(valueCol)` whenever the value
    * column had NULLs. `n` stays exposed as the row count. Pre-r13
    * states without `nn` are upgraded via [[withNn]]. */
  def finalizeStats(state: DataFrame): DataFrame = {
    val st = withNn(state)
    st.select(col("g"), col("n"), col("s"),
      round(col("s") / col("nn"), 4).as("avg"), col("mn"), col("mx"))
  }

  /** Per-group trimmed mean: the robust location estimate — the mean of
    * values strictly inside the [p, 1−p] exact percentile fence, next
    * to the raw mean so the gap itself is the outlier signal. Two
    * passes over the group aggregate (percentiles, then conditional
    * mean with the fences broadcast back via join).
    *
    * @return (group, n, mean round 4, trimmed_mean round 4, n_trimmed) */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
      trim: Double = 0.1): DataFrame = {
    require(trim > 0 && trim < 0.5, "trimmedMean: trim in (0, 0.5)")
    val fences = df.groupBy(col(groupCol).as("__g"))
      .agg(percentile(col(valueCol), lit(trim)).as("__lo"),
        percentile(col(valueCol), lit(1 - trim)).as("__hi"))
    // null-safe join: a NULL group key must keep its group row (as
    // partialStats/imputeMode do), not vanish through `=== NULL`
    df.join(broadcast(fences), col(groupCol) <=> col("__g"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(avg(col(valueCol)), 4).as("mean"),
        round(avg(when(col(valueCol) >= col("__lo") &&
          col(valueCol) <= col("__hi"), col(valueCol))), 4)
          .as("trimmed_mean"),
        sum(when(col(valueCol) < col("__lo") ||
          col(valueCol) > col("__hi"), 1L).otherwise(0L)).as("n_trimmed"))
  }

  /** Tukey-fence outlier report per group: values beyond
    * [q1 − k·IQR, q3 + k·IQR] counted (k = 1.5, the boxplot rule).
    * The distribution-free cousin of the z-score gate — one exact
    * quartile pass, fences broadcast back.
    *
    * @return (group, n, q1 round 4, q3 round 4, lo_fence round 4,
    *          hi_fence round 4, n_outliers) */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 1.5): DataFrame = {
    val q = df.groupBy(col(groupCol).as("__g"))
      .agg(percentile(col(valueCol), lit(0.25)).as("__q1"),
        percentile(col(valueCol), lit(0.75)).as("__q3"))
      .withColumn("__lo",
        col("__q1") - lit(k) * (col("__q3") - col("__q1")))
      .withColumn("__hi",
        col("__q3") + lit(k) * (col("__q3") - col("__q1")))
    // null-safe join, same reason as trimmedMean
    df.join(broadcast(q), col(groupCol) <=> col("__g"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        round(max("__q1"), 4).as("q1"), round(max("__q3"), 4).as("q3"),
        round(max("__lo"), 4).as("lo_fence"),
        round(max("__hi"), 4).as("hi_fence"),
        sum(when(col(valueCol) < col("__lo") ||
          col(valueCol) > col("__hi"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Benford first-digit conformance — the numeric-column forgery/
    * garbage test: natural multi-scale quantities (prices, populations,
    * counts) follow P(d) = log10(1 + 1/d); fabricated or truncated data
    * doesn't. Per digit: observed vs expected share and the χ² term
    * n·(p_obs − p_exp)²/p_exp (sum them against the χ²₈ table).
    * One combinable digit count over positive values; digit extraction
    * is pure column algebra.
    *
    * @return 9 rows: (digit, n, p_obs round 4, p_exp round 4, chi2_term
    *          round 4) */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    // first SIGNIFICANT digit = first [1-9] of the string form — robust
    // to scientific notation (the mantissa digit leads either way) and
    // free of the log10/pow boundary bug (log10(1000) floors to 2 in
    // IEEE, making the arithmetic form emit digit 10). NaN/Infinity
    // stringify with no [1-9] ("NaN", "Infinity") → empty extract; the
    // guard keeps ANSI mode from throwing on cast('') and routes such
    // rows to NULL → dropped by the 1..9 filter instead of crashing
    // the forgery report on exactly the dirty data it exists to examine
    // (r15 review).
    val digitStr = regexp_extract(abs(col(valueCol)).cast("string"),
      "[1-9]", 0)
    val firstDigit = when(digitStr =!= "", digitStr.cast("int"))
    val observed = df.filter(abs(col(valueCol)) >= 1e-10)
      .select(firstDigit.as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    // ALWAYS emit all 9 digits: a digit with zero occurrences is the
    // strongest forgery signal — its χ² term n·p_exp is typically the
    // dominant one, and grouping only observed digits silently dropped
    // it (and broke the documented 9-row contract).
    val spark = df.sparkSession
    val counts = spark.range(1, 10)
      .select(col("id").cast("int").as("digit"))
      .join(observed, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
    val tot = counts.agg(sum("n").cast("double").as("__t"))
    counts.crossJoin(broadcast(tot))
      // an EMPTY corpus stays empty (no 9 phantom NULL rows): sum over
      // the zero-filled spine is NULL only when no value ever counted
      .filter(col("__t").isNotNull && col("__t") > 0)
      .withColumn("p_obs_raw", col("n") / col("__t"))
      .withColumn("p_exp_raw", log10(lit(1.0) + lit(1.0) / col("digit")))
      .select(col("digit"), col("n"),
        round(col("p_obs_raw"), 4).as("p_obs"),
        round(col("p_exp_raw"), 4).as("p_exp"),
        round(col("__t") * pow(col("p_obs_raw") - col("p_exp_raw"), 2) /
          col("p_exp_raw"), 4).as("chi2_term"))
  }

  /** Modal imputation: fill NULLs in `valueCol` with the most frequent
    * NON-null value of the row's `groupCol` (ties → smallest value, the
    * deterministic argmax this repo uses everywhere). The standard
    * data-repair move for categorical columns — per-group modes are one
    * combinable count + one `min_by` aggregate, broadcast back in.
    *
    * Rows in a group with NO non-null values keep their NULL (flagged,
    * not invented).
    *
    * @return input columns with `valueCol` filled + `was_imputed` */
  def imputeMode(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val modes = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("cnt"))
      .groupBy(col(groupCol))
      .agg(min_by(col(valueCol), struct((-col("cnt")).as("nc"),
        col(valueCol))).as("__graft_mode"))
      .withColumnRenamed(groupCol, "__graft_g")
    // null-safe group join: a NULL group key is a group like any other
    // (its mode is computed above) — a plain equi-join silently left
    // every NULL-group row unimputed (r15 review)
    df.join(modes, col(groupCol) <=> col("__graft_g"), "left")
      .drop("__graft_g")
      .withColumn("was_imputed",
        col(valueCol).isNull && col("__graft_mode").isNotNull)
      .withColumn(valueCol,
        coalesce(col(valueCol), col("__graft_mode")))
      .drop("__graft_mode")
      // keep the pre-r15 output shape (the USING join put the group
      // key first; the null-safe condition join preserves input order)
      .select((col(groupCol) +:
        df.columns.filterNot(_ == groupCol).map(col).toIndexedSeq) :+
        col("was_imputed"): _*)
  }
}
