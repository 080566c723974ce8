package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed references for the classifier-evaluation relations. */
class EvaluationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 10 rows: a-class 6 (4 right), b-class 4 (3 right)
  private def labeled = Seq(
    ("a", "a"), ("a", "a"), ("a", "a"), ("a", "a"), ("a", "b"), ("a", "b"),
    ("b", "b"), ("b", "b"), ("b", "b"), ("b", "a"))
    .toDF("y", "yhat")

  test("confusionMatrix cells and per-row recall fractions") {
    val got = Evaluation.confusionMatrix(labeled, "y", "yhat")
      .orderBy("actual", "predicted").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === Seq(
      ("a", "a", 4L, 0.6667), ("a", "b", 2L, 0.3333),
      ("b", "a", 1L, 0.25), ("b", "b", 3L, 0.75)))
  }

  test("confusionMatrix keeps NULL-actual (unlabeled) cells — the " +
    "matrix total equals the input row count") {
    val d = Seq((Some("a"), "a"), (None, "a"), (None, "b"))
      .map { case (y, p) => (y.orNull, p) }.toDF("y", "yhat")
    val got = Evaluation.confusionMatrix(d, "y", "yhat")
    assert(got.agg(org.apache.spark.sql.functions.sum("n"))
      .collect()(0).getLong(0) === 3L)
    val nullRows = got.filter(got("actual").isNull)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(nullRows === Map("a" -> 1L, "b" -> 1L))
  }

  test("cohenKappa matches the hand computation") {
    val got = Evaluation.cohenKappa(labeled, "y", "yhat").collect()(0)
    assert(got.getLong(0) === 10L)
    assert(got.getDouble(1) === 0.7) // po = 7/10
    // pe = (6·5 + 4·5)/100 = 0.5 ; kappa = (0.7−0.5)/0.5 = 0.4
    assert(got.getDouble(2) === 0.5)
    assert(got.getDouble(3) === 0.4)
  }

  test("cohenKappa: single-class degenerate case yields pe=1 and NULL " +
    "kappa, not a division blow-up") {
    val d = Seq(("a", "a"), ("a", "a")).toDF("y", "yhat")
    val got = Evaluation.cohenKappa(d, "y", "yhat").collect()(0)
    assert(got.getDouble(2) === 1.0)
    assert(got.isNullAt(3))
  }

  // --- perClassPrf --------------------------------------------------------

  test("perClassPrf: hand-computed precision/recall/F1; a never-" +
    "predicted class keeps NULL precision") {
    val d = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("c", "b")).toDF("y", "yhat") // c never predicted
    val got = Evaluation.perClassPrf(d, "y", "yhat").orderBy("label")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(got(0) === (("a", 3L, Some(1.0), Some(0.6667))))
    assert(got(1) === (("b", 1L, Some(0.3333), Some(1.0))))
    assert(got(2) === (("c", 1L, None, Some(0.0))))
  }

  // --- bucketedAuc --------------------------------------------------------

  test("bucketedAuc: perfectly separating score gives 1.0, " +
    "anti-separating gives 0.0, random-ish is between") {
    val sep = ((1 to 50).map(i => (i / 100.0, false)) ++
      (51 to 100).map(i => (i / 100.0, true))).toDF("s", "y")
    assert(Evaluation.bucketedAuc(sep, "s", "y").collect()(0)
      .getDouble(2) === 1.0)
    val anti = sep.selectExpr("s", "NOT y AS y")
    assert(Evaluation.bucketedAuc(anti, "s", "y").collect()(0)
      .getDouble(2) === 0.0)
  }

  test("bucketedAuc: single-class input yields NULL auc, not a crash") {
    val d = (1 to 10).map(i => (i.toDouble, true)).toDF("s", "y")
    val got = Evaluation.bucketedAuc(d, "s", "y").collect()(0)
    assert(got.isNullAt(2))
  }

  test("bucketedAuc excludes NULL labels and NULL scores instead of " +
    "counting unlabeled rows as negatives") {
    val clean = ((1 to 50).map(i => (Some(i / 100.0), Some(false))) ++
      (51 to 100).map(i => (Some(i / 100.0), Some(true))))
    val dirty = clean ++
      (1 to 30).map(i => (Some(i / 100.0), None: Option[Boolean])) ++
      Seq((None: Option[Double], Some(true)))
    val got = Evaluation.bucketedAuc(dirty.toDF("s", "y"), "s", "y")
      .collect()(0)
    // pre-fix: 30 unlabeled rows became negatives (n_neg 80, auc
    // biased) and the NULL score formed a phantom curve segment
    assert(got.getLong(0) === 50L && got.getLong(1) === 50L)
    assert(got.getDouble(2) === 1.0)
  }

  test("bucket bounds come from the LABELED rows only — an excluded " +
    "unlabeled row at the global score extreme shifts no boundary") {
    // labeled scores span [0.01, 1.0]; the unlabeled outlier at 1000.0
    // previously stretched the bucket width 1000x, collapsing every
    // labeled row into bucket 0 and degrading the curve
    val clean = ((1 to 50).map(i => (Some(i / 100.0), Some(false))) ++
      (51 to 100).map(i => (Some(i / 100.0), Some(true))))
    val dirty = clean :+ (Some(1000.0), None: Option[Boolean])
    val want = Evaluation.bucketedAuc(clean.toDF("s", "y"), "s", "y")
      .collect()(0)
    val got = Evaluation.bucketedAuc(dirty.toDF("s", "y"), "s", "y")
      .collect()(0)
    assert(got.getLong(0) === want.getLong(0))
    assert(got.getLong(1) === want.getLong(1))
    assert(got.getDouble(2) === want.getDouble(2))
    assert(got.getDouble(2) === 1.0)
  }

  test("matrix metrics pin no cached blocks: repeated calls leave the " +
    "persistent-RDD registry empty (r13 pinned localCheckpoints)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach { _ =>
      Evaluation.confusionMatrix(labeled, "y", "yhat").collect()
      Evaluation.cohenKappa(labeled, "y", "yhat").collect()
      Evaluation.perClassPrf(labeled, "y", "yhat").collect()
    }
    assert(spark.sparkContext.getPersistentRDDs.size === before)
  }

  test("matrix metrics REFUSE a continuous column loudly: > 10k " +
    "distinct class pairs fails with the contract message instead of " +
    "collecting an unbounded matrix to the driver (r14 ADVICE)") {
    import org.apache.spark.sql.functions.col
    val continuous = spark.range(10001)
      .select(col("id").cast("string").as("y"),
        col("id").cast("string").as("yhat"))
    val e = intercept[IllegalArgumentException] {
      Evaluation.confusionMatrix(continuous, "y", "yhat").collect()
    }
    assert(e.getMessage.contains("class-label"))
  }

  test("cohenKappa with zero agreement on balanced classes is negative") {
    val d = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "a"))
      .toDF("y", "yhat")
    val got = Evaluation.cohenKappa(d, "y", "yhat").collect()(0)
    assert(got.getDouble(1) === 0.0)
    assert(got.getDouble(3) === -1.0)
  }
}
