package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classifier-evaluation relations — the measurement half of the quality
  * plane: once a gate (language ID, quality tier, spam flag) decides
  * what enters the corpus, these quantify how well it decides. All pure
  * aggregations: the corpus collapses to class-pair counts in one
  * combinable pass, everything downstream is class-cardinality-scale.
  */
object Evaluation {

  /** The corpus-collapsing groupBy behind every matrix metric here:
    * class-pair cell counts, computed in ONE distributed pass and
    * rebuilt as a DRIVER-LOCAL relation. r13 `localCheckpoint`ed this
    * frame instead, but the returned DataFrames stay lazy over it, so
    * the pinned cached blocks could never be unpersisted — repeated
    * metric calls in a long session accumulated storage until the RDD
    * was GC'd (r13 ADVICE). The matrix is class-pair-cardinality (the
    * module contract above), so the collect is bounded by design, the
    * downstream fan-out (row totals, diagonal, joins) runs over a
    * LocalTableScan, and nothing stays cached on executors. */
  /** Hard ceiling on distinct (actual, predicted) cells. Evaluation
    * metrics are defined over CLASS labels (languages, tiers, flags);
    * a continuous column passed by mistake would otherwise collect an
    * unbounded matrix to the driver and OOM far from the bad call
    * (r14 ADVICE). 10k cells ≈ a 100-class problem — far above any
    * real label space here, far below driver-memory scale. */
  private val MaxMatrixCells = 10000

  private def cellCounts(df: DataFrame, actualCol: String,
      predCol: String, aName: String, pName: String): DataFrame = {
    val cm = df.groupBy(col(actualCol).as(aName), col(predCol).as(pName))
      .agg(count(lit(1)).as("n"))
    // bounded pull: fetch cap+1 so overflow is detected, never collected
    val cells = cm.limit(MaxMatrixCells + 1).collect()
    require(cells.length <= MaxMatrixCells,
      s"cellCounts: more than $MaxMatrixCells distinct ($actualCol, " +
        s"$predCol) pairs — evaluation metrics expect class-label " +
        "columns, not continuous values")
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(cells: _*), cm.schema)
  }

  /** Confusion matrix: (actual, predicted, n) cell counts plus each
    * cell's share of its actual-class row (the per-class recall
    * diagonal). Eager: the corpus pass runs at call time (the
    * [[cellCounts]] rationale). */
  def confusionMatrix(df: DataFrame, actualCol: String,
      predCol: String): DataFrame = {
    val cm = cellCounts(df, actualCol, predCol, "actual", "predicted")
    // null-safe (<=>) row-total join: unlabeled rows (NULL actual) form
    // a real matrix row — an equi-join would silently drop their cells
    // and the matrix total would stop matching the input count
    val rows = cm.groupBy("actual")
      .agg(sum("n").as("__rt"))
      .withColumnRenamed("actual", "__a")
    cm.join(rows, cm("actual") <=> col("__a"))
      .select(col("actual"), col("predicted"), col("n"),
        round(col("n") / col("__rt"), 4).as("row_frac"))
  }

  /** Per-class precision / recall / F1 with support — the per-language
    * report card behind [[cohenKappa]]'s single number. Classes are the
    * UNION of actual and predicted labels (a class the model never
    * predicts still gets its recall row, with NULL precision).
    *
    * @return (label, support, precision, recall, f1 — all round 4;
    *          NULL where the denominator is empty) */
  def perClassPrf(df: DataFrame, actualCol: String,
      predCol: String): DataFrame = {
    val cm = cellCounts(df, actualCol, predCol, "a", "p")
    val labels = cm.select(col("a").as("label"))
      .unionByName(cm.select(col("p").as("label"))).distinct()
    val diag = cm.filter(col("a") === col("p"))
      .select(col("a").as("label"), col("n").as("tp"))
    val rows = cm.groupBy(col("a").as("label")).agg(sum("n").as("support"))
    val cols = cm.groupBy(col("p").as("label")).agg(sum("n").as("predn"))
    val j = labels
      .join(diag, Seq("label"), "left")
      .join(rows, Seq("label"), "left")
      .join(cols, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        (coalesce(col("tp"), lit(0L)) /
          when(col("predn") > 0, col("predn"))).as("pr"),
        (coalesce(col("tp"), lit(0L)) /
          when(col("support") > 0, col("support"))).as("rc"))
    j.select(col("label"), col("support"),
      round(col("pr"), 4).as("precision"),
      round(col("rc"), 4).as("recall"),
      round(when(col("pr") + col("rc") > 0,
        lit(2.0) * col("pr") * col("rc") / (col("pr") + col("rc"))), 4)
        .as("f1"))
  }

  /** Bucketed ROC-AUC — the monitoring-grade form: scores discretized
    * into equal-width buckets (broadcast min/max bounds, like
    * [[Layout.histogram]]), per-bucket positive/negative counts, then
    * the trapezoidal area over the ≤ nBuckets-row cumulative TPR/FPR
    * curve (descending score = descending threshold). Never a global
    * rank over the corpus — the classic exact-AUC scale trap.
    *
    * @return 1 row: (n_pos, n_neg, auc round 4; NULL auc when either
    *          class is empty) */
  /** The shared scaffold behind [[bucketedAuc]] and [[liftTable]]:
    * per-bucket (n, pos) counts over equal-width score buckets from
    * broadcast bounds — one definition so the two metrics can never
    * drift on bounds/label handling (the equalWidthBucket rationale,
    * one level up). */
  /** Rows with a NULL score or NULL label are EXCLUDED here (and so
    * from both metrics): a NULL label is not a negative — counting it
    * as one inflated n_neg and biased AUC/lift — and a NULL score has
    * no bucket (it previously formed a phantom lowest segment on the
    * ROC curve, NULLS LAST in the descending walk). The null-safe
    * [[confusionMatrix]] is the surface that reports unlabeled rows. */
  private def bucketedLabelCells(df: DataFrame, scoreCol: String,
      labelCol: String, nBuckets: Int): DataFrame = {
    // bounds and cells derive from the SAME filtered frame (r13
    // ADVICE): deriving bounds from the raw df let an EXCLUDED
    // unlabeled row holding the global score extreme shift every
    // bucket boundary — inconsistent with the exclusion contract above
    val labeled = df.filter(col(scoreCol).isNotNull &&
      col(labelCol).cast("boolean").isNotNull)
    val bounds = labeled.agg(
      min(col(scoreCol)).cast("double").as("__graft_min_s"),
      max(col(scoreCol)).cast("double").as("__graft_max_s"))
    val bucket = Layout.equalWidthBucket(col(scoreCol),
      col("__graft_min_s"), col("__graft_max_s"), nBuckets)
    labeled
      .crossJoin(broadcast(bounds))
      .select(bucket.as("bucket"), col(labelCol).cast("boolean").as("y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
  }

  def bucketedAuc(df: DataFrame, scoreCol: String, labelCol: String,
      nBuckets: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = bucketedLabelCells(df, scoreCol, labelCol, nBuckets)
      .withColumn("neg", col("n") - col("pos"))
    val tot = cells.agg(sum("pos").as("tp"), sum("neg").as("tn"))
    // bounded window: ≤ nBuckets rows, descending score
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe denominators: a single-class input must yield NULL auc,
    // not an ANSI divide-by-zero
    val curve = cells.crossJoin(broadcast(tot))
      .withColumn("ctpr",
        sum("pos").over(w) / when(col("tp") > 0, col("tp")))
      .withColumn("cfpr",
        sum("neg").over(w) / when(col("tn") > 0, col("tn")))
      .withColumn("ptpr", coalesce(lag("ctpr", 1).over(
        Window.orderBy(col("bucket").desc)), lit(0.0)))
      .withColumn("pfpr", coalesce(lag("cfpr", 1).over(
        Window.orderBy(col("bucket").desc)), lit(0.0)))
    curve.agg(
      max("tp").as("n_pos"), max("tn").as("n_neg"),
      round(when(max("tp") > 0 && max("tn") > 0,
        sum((col("cfpr") - col("pfpr")) *
          (col("ctpr") + col("ptpr")) / 2.0)), 4).as("auc"))
  }

  /** Decile-style lift table — the calibration view behind
    * [[bucketedAuc]]'s single number: per equal-width score bucket, the
    * positive rate and its lift over the base rate. A well-calibrated
    * score shows monotone lift; a useless one shows lift ≈ 1 everywhere.
    * Same bucketed shape as the AUC — no global rank.
    *
    * @return (bucket, n, n_pos, pos_rate round 4, lift round 4 — NULL
    *          when the base rate is 0) */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
      nBuckets: Int = 10): DataFrame = {
    val cells = bucketedLabelCells(df, scoreCol, labelCol, nBuckets)
      .withColumnRenamed("pos", "n_pos")
    val base = cells.agg(
      (sum("n_pos").cast("double") / sum("n")).as("__base"))
    cells.crossJoin(broadcast(base))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(col("n_pos") / col("n"), 4).as("pos_rate"),
        round(col("n_pos") / col("n") /
          when(col("__base") > 0, col("__base")), 4).as("lift"))
  }

  /** Cohen's kappa: agreement beyond chance between a prediction column
    * and labels — the one-number gate health check that raw accuracy
    * overstates on skewed class mixes. po = observed agreement,
    * pe = Σ rowShareᵢ·colShareᵢ; kappa = (po−pe)/(1−pe), NULL when
    * pe = 1 (degenerate single-class case).
    *
    * @return 1 row: (n, po round 4, pe round 4, kappa round 4) */
  def cohenKappa(df: DataFrame, actualCol: String,
      predCol: String): DataFrame = {
    // four consumers (tot, rows, cols, po) derive from cm — one bounded
    // driver-local matrix so the corpus-scale groupBy runs once, not
    // once per branch, and nothing stays pinned (the cellCounts
    // rationale)
    val cm = cellCounts(df, actualCol, predCol, "a", "p")
    val tot = cm.agg(sum("n").cast("double").as("nn"))
    val rows = cm.groupBy("a").agg(sum("n").as("rn"))
    val cols = cm.groupBy("p").agg(sum("n").as("cn"))
    val po = cm.filter(col("a") === col("p"))
      .agg(coalesce(sum("n"), lit(0L)).cast("double").as("agree"))
    val pe = rows.join(cols, rows("a") === cols("p"))
      .agg(coalesce(sum(col("rn") * col("cn")), lit(0L)).cast("double")
        .as("rc"))
    broadcast(tot).crossJoin(broadcast(po)).crossJoin(broadcast(pe))
      .select(col("nn").cast("long").as("n"),
        round(col("agree") / col("nn"), 4).as("po"),
        round(col("rc") / (col("nn") * col("nn")), 4).as("pe"),
        round(when(col("rc") / (col("nn") * col("nn")) < 1.0,
          (col("agree") / col("nn") - col("rc") / (col("nn") * col("nn"))) /
            (lit(1.0) - col("rc") / (col("nn") * col("nn")))), 4)
          .as("kappa"))
  }
}
