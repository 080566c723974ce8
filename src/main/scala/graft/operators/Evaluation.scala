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

  /** Confusion matrix: (actual, predicted, n) cell counts plus each
    * cell's share of its actual-class row (the per-class recall
    * diagonal). */
  def confusionMatrix(df: DataFrame, actualCol: String,
      predCol: String): DataFrame = {
    val cm = df.groupBy(col(actualCol).as("actual"),
        col(predCol).as("predicted"))
      .agg(count(lit(1)).as("n"))
    val rows = cm.groupBy("actual").agg(sum("n").as("__rt"))
    cm.join(rows, "actual")
      .select(col("actual"), col("predicted"), col("n"),
        round(col("n") / col("__rt"), 4).as("row_frac"))
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
    val cm = df.groupBy(col(actualCol).as("a"), col(predCol).as("p"))
      .agg(count(lit(1)).as("n"))
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
