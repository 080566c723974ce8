package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bit-parity pins for the r18 PQ expression rewrite: [[PqEncode]] and
  * [[AdcScore]] must match the interpreted HOF Column algebra they
  * replaced — replayed here verbatim from the pre-r18 `PqIndex` — on
  * scores, ties, and every sentinel, under BOTH whole-stage codegen and
  * interpreted `eval`. Same discipline as `CodegenSpec`'s ArgMinCentroid
  * pin.
  */
class PqCodegenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def wscgCovers(df: org.apache.spark.sql.DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    plan.collect { case w: WholeStageCodegenExec => w }.nonEmpty &&
      !plan.toString.contains("InterpretedProjection")
  }

  // the pre-r18 `PqIndex.blockCode` fold, verbatim: per block, argmin
  // over `aggregate(array(k structs))` of -2·dot(slice, c) + |c|²
  private def oldBlockCode(vec: Column, b: Int, sub: Int,
      codebook: Array[Array[Double]]): Column =
    element_at(
      transform(array(slice(vec, b * sub + 1, sub)), s => {
        val scored = codebook.zipWithIndex.map { case (c, i) =>
          struct(
            (graft.operators.Similarity.dot(s, typedLit(c.toSeq)) *
              lit(-2.0) + lit(c.map(x => x * x).sum)).as("d"),
            lit(i).as("code"))
        }
        aggregate(
          array(scored.toIndexedSeq: _*),
          struct(lit(Double.MaxValue).as("d"), lit(-1).as("code")),
          (acc, x) =>
            when(x.getField("d") < acc.getField("d"), x).otherwise(acc))
          .getField("code")
      }),
      1)

  private def oldEncode(vec: Column,
      books: Array[Array[Array[Double]]]): Column = {
    val sub = books.head.head.length
    array(books.indices.map(b => oldBlockCode(vec, b, sub, books(b))): _*)
  }

  // the pre-r18 `PqIndex.adcScore` pair of aggregate(zip_with(...)) folds
  private def oldAdcScore(codes: Column, lutDot: Seq[Seq[Double]],
      lutN2: Seq[Seq[Double]], qNorm: Double): Column = {
    val approxDot = aggregate(
      zip_with(codes, typedLit(lutDot).cast("array<array<double>>"),
        (c, row) => element_at(row, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    val approxN2 = aggregate(
      zip_with(codes, typedLit(lutN2).cast("array<array<double>>"),
        (c, row) => element_at(row, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    approxDot / (sqrt(approxN2) * lit(qNorm))
  }

  // m=2 blocks, k=3 codes, sub=2 — block 0 carries a DUPLICATE centroid
  // so the first-minimal tie-break is actually exercised
  private val books: Array[Array[Array[Double]]] = Array(
    Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0)),
    Array(Array(0.5, 0.5), Array(-1.0, 2.0), Array(0.25, -0.75)))

  private def synth(n: Int): org.apache.spark.sql.DataFrame =
    spark.range(n).select(col("id"),
      expr("transform(sequence(0, 3), " +
        "j -> cast(sin(id * 7 + j) as double))").as("v"))

  test("PqEncode runs under whole-stage codegen and matches the HOF " +
      "fold it replaced bit-for-bit, ties included") {
    val df = synth(64)
      .select(col("id"),
        VectorFunctions.vecPqEncode(col("v"), books).as("codes"))
    assert(wscgCovers(df), df.queryExecution.executedPlan.toString.take(800))
    val neu = df.orderBy("id").collect().map(_.getSeq[Int](1).toSeq)
    val old = synth(64)
      .select(col("id"), oldEncode(col("v"), books).as("codes"))
      .orderBy("id").collect().map(_.getSeq[Int](1).toSeq)
    assert(neu.toSeq === old.toSeq)
    // the tie vector (exactly on the duplicated centroid) picks code 0,
    // never the duplicate at index 2
    val tie = spark.range(1)
      .select(array(lit(1.0), lit(0.0), lit(0.5), lit(0.5)).as("v"))
      .select(VectorFunctions.vecPqEncode(col("v"), books).as("codes"))
      .collect()(0).getSeq[Int](0)
    assert(tie === Seq(0, 0))
  }

  test("PqEncode sentinels: NaN poisons ITS block only, a short vector " +
      "-1s the truncated blocks, NULL vector -1s all (codegen + eval)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val at = ArrayType(DoubleType)
    val booksSeq = books.map(_.map(_.toSeq).toSeq).toSeq
    def evalOf(v: Any): Seq[Int] =
      PqEncode(Literal.create(v, at), booksSeq).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
    assert(evalOf(Seq(Double.NaN, 0.0, 0.5, 0.5)) === Seq(-1, 0))
    assert(evalOf(Seq(1.0, 0.0, 0.5)) === Seq(0, -1)) // block 1 short
    assert(evalOf(Seq(1.0)) === Seq(-1, -1))
    assert(evalOf(null) === Seq(-1, -1))
    // codegen path agrees, and so does the replayed HOF algebra on the
    // non-NULL shapes (slice-short → null dot → -1 seed survives)
    val df = spark.range(3).select(
      when(col("id") === 0, array(lit(Double.NaN), lit(0.0), lit(0.5),
        lit(0.5)))
        .when(col("id") === 1, array(lit(1.0), lit(0.0), lit(0.5)))
        .otherwise(array(lit(1.0))).as("v"))
    val neu = df.select(VectorFunctions.vecPqEncode(col("v"), books)
      .as("codes")).collect().map(_.getSeq[Int](0).toSeq)
    val old = df.select(oldEncode(col("v"), books).as("codes"))
      .collect().map(_.getSeq[Int](0).toSeq)
    assert(neu.toSeq === Seq(Seq(-1, 0), Seq(0, -1), Seq(-1, -1)))
    assert(old.toSeq === neu.toSeq)
  }

  test("AdcScore runs under whole-stage codegen and matches the " +
      "aggregate(zip_with) pair it replaced bit-for-bit") {
    val lutDot = Seq(Seq(0.25, -1.5, 3.0), Seq(2.0, 0.0, -0.125))
    val lutN2 = Seq(Seq(1.0, 1.0, 1.0), Seq(0.5, 5.0, 0.625))
    val qNorm = math.sqrt(7.3)
    val codesDf = spark.range(32).select(
      array((col("id") % 3).cast("int"), ((col("id") + 1) % 3).cast("int"))
        .as("codes"))
    val df = codesDf.select(
      VectorFunctions.vecAdcScore(col("codes"), lutDot, lutN2, qNorm)
        .as("s"))
    assert(wscgCovers(df), df.queryExecution.executedPlan.toString.take(800))
    val neu = df.collect().map(_.getDouble(0))
    val old = codesDf
      .select(oldAdcScore(col("codes"), lutDot, lutN2, qNorm).as("s"))
      .collect().map(_.getDouble(0))
    // bit-for-bit: compare raw long bits, not ==, so a -0.0/0.0 or ULP
    // drift would fail
    assert(neu.map(java.lang.Double.doubleToLongBits).toSeq ===
      old.map(java.lang.Double.doubleToLongBits).toSeq)
  }

  test("AdcScore null semantics: NULL codes, wrong length, NULL element, " +
      "out-of-range code all yield NULL (codegen + eval)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    val lutDot = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))
    val lutN2 = Seq(Seq(1.0, 1.0), Seq(1.0, 1.0))
    val at = ArrayType(IntegerType)
    def evalOf(v: Any): Any =
      AdcScore(Literal.create(v, at), lutDot, lutN2, 1.0).eval(null)
    assert(evalOf(null) === null)
    assert(evalOf(Seq(0)) === null)           // wrong length
    assert(evalOf(Seq(0, null)) === null)     // null element
    assert(evalOf(Seq(0, 2)) === null)        // out of range
    assert(evalOf(Seq(0, -1)) === null)       // encode sentinel leaked
    assert(evalOf(Seq(1, 0)) ===
      (2.0 + 3.0) / (math.sqrt(2.0) * 1.0))
    // codegen path: wrong-length and valid rows through a projection
    val df = spark.range(2).select(
      when(col("id") === 0, array(lit(1), lit(0)))
        .otherwise(array(lit(1))).as("codes"))
      .select(VectorFunctions.vecAdcScore(col("codes"), lutDot, lutN2,
        1.0).as("s"))
    val rows = df.collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(rows.toSet ===
      Set(Some((2.0 + 3.0) / math.sqrt(2.0)), None))
  }
}
