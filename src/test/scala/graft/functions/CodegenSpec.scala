package graft.functions

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The custom Catalyst expressions must stay INSIDE whole-stage codegen —
  * a silent fallback to interpreted projection would forfeit exactly the
  * hot-path win they exist for (the brief's "widen WholeStageCodegen
  * spans" requirement, checked, not assumed). Inputs come from
  * `spark.range` because LocalTableScan relations skip codegen entirely.
  */
class CodegenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def wscgCovers(df: org.apache.spark.sql.DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    plan.collect { case w: WholeStageCodegenExec => w }.nonEmpty &&
      !plan.toString.contains("InterpretedProjection")
  }

  test("PercentEncode (py_quote) runs under whole-stage codegen") {
    val df = spark.range(2)
      .select(concat(lit("a b/"), col("id")).as("s"))
      .select(UriFunctions.pyQuote(col("s")).as("q"))
    assert(wscgCovers(df), df.queryExecution.executedPlan.toString.take(800))
    assert(df.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("a%20b/0", "a%20b/1"))
  }

  test("DotProduct (vec_dot) runs under whole-stage codegen") {
    val df = spark.range(3)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double")).as("b"))
      .select(VectorFunctions.vecDot(col("a"), col("b")).as("d"))
    assert(wscgCovers(df), df.queryExecution.executedPlan.toString.take(800))
    // id·3 + 2·id per row: 0, 5, 10
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq === Seq(0.0, 5.0, 10.0))
  }

  test("DotProduct returns NULL on length mismatch (codegen and interpreted)") {
    // Matches the zip_with+aggregate form it replaced: padding the
    // shorter array with nulls nulls the whole sum, so a malformed
    // embedding fails loudly rather than yielding a partial product.
    val df = spark.range(2)
      .select(
        array(col("id").cast("double"), lit(2.0)).as("a"),
        when(col("id") === 0, array(lit(3.0), lit(4.0)))
          .otherwise(array(lit(3.0))).as("b"))
      .select(VectorFunctions.vecDot(col("a"), col("b")).as("d"))
    val rows = df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(rows.toSet === Set(Some(8.0), None))
    // interpreted path (eval) agrees — built from resolved Literals,
    // since Column-derived trees are unresolved until analysis.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val at = ArrayType(DoubleType)
    val expr = DotProduct(
      Literal.create(Seq(1.0, 2.0), at), Literal.create(Seq(5.0), at))
    assert(expr.eval(null) === null)
    val ok = DotProduct(
      Literal.create(Seq(1.0, 2.0), at), Literal.create(Seq(5.0, 6.0), at))
    assert(ok.eval(null) === 17.0)
  }

  test("ArgMinCentroid runs under whole-stage codegen and matches the " +
      "HOF fold it replaced bit-for-bit, ties and sentinels included") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    val df = spark.range(4)
      .select(array((col("id") % 2).cast("float"),
        lit(1.0f) - (col("id") % 2).cast("float")).as("v"))
      .select(VectorFunctions.vecArgMinCentroid(col("v"), cents).as("c"))
    assert(wscgCovers(df), df.queryExecution.executedPlan.toString.take(800))
    // even ids → (0,1) → centroid 1; odd ids → (1,0) → centroid 0, and
    // the DUPLICATE centroid 2 must never win a tie (first minimal)
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(1, 0, 1, 0))
    // the replaced aggregate(array(struct...)) fold, replayed via the
    // public HOF Column algebra — same data, same scores, same winner
    val hof = spark.range(4)
      .select(array((col("id") % 2).cast("float"),
        lit(1.0f) - (col("id") % 2).cast("float")).as("v"))
      .select(aggregate(
        array(cents.zipWithIndex.map { case (c, i) =>
          struct((graft.operators.Similarity.dot(col("v"),
            typedLit(c.toSeq)) * lit(-2.0) +
            lit(c.map(x => x * x).sum)).as("d"), lit(i).as("cluster"))
        }.toIndexedSeq: _*),
        struct(lit(Double.MaxValue).as("d"), lit(-1).as("cluster")),
        (acc, x) => when(x.getField("d") < acc.getField("d"), x)
          .otherwise(acc)).getField("cluster").as("c"))
    assert(hof.collect().map(_.getInt(0)).toSeq ===
      df.collect().map(_.getInt(0)).toSeq)
  }

  test("ArgMinCentroid sentinels: NaN component, dimension mismatch, and " +
      "NULL embedding all yield -1 (codegen and interpreted eval agree)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val at = ArrayType(DoubleType)
    def evalOf(v: Any): Any =
      ArgMinCentroid(Literal.create(v, at), cents).eval(null)
    assert(evalOf(Seq(Double.NaN, 1.0)) === -1)
    assert(evalOf(Seq(1.0)) === -1)           // dim mismatch
    assert(evalOf(null) === -1)               // NULL embedding, NOT null
    assert(evalOf(Seq(0.9, 0.1)) === 0)
    // codegen path on the same vectors
    val df = spark.range(3).select(
      when(col("id") === 0, array(lit(Double.NaN), lit(1.0)))
        .when(col("id") === 1, array(lit(1.0)))
        .otherwise(array(lit(0.9), lit(0.1))).as("v"))
      .select(VectorFunctions.vecArgMinCentroid(col("v"),
        cents.map(_.toArray).toArray).as("c"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(-1, -1, 0))
  }

  test("SimHash64 runs under whole-stage codegen and matches the 64 " +
      "per-bit HOF folds it replaced bit-for-bit, sentinels included") {
    // synthesized feature arrays: mixed-sign longs, varying lengths
    val feats = expr("transform(sequence(0, cast(id % 5 AS INT)), " +
      "j -> xxhash64(concat(cast(id as string), ':', cast(j as string))))")
    val df = spark.range(64).select(feats.as("fs"))
      .select(VectorFunctions.vecSimHash64(col("fs")).as("h"))
    assert(wscgCovers(df), df.queryExecution.executedPlan.toString.take(800))
    // the replaced fold, replayed via the public HOF Column algebra
    val hof = spark.range(64).select(feats.as("fs"))
      .select(element_at(
        transform(array(col("fs")), fs => {
          val bits = (0 until 64).map { j =>
            val votes = aggregate(fs, lit(0),
              (acc, f) => acc +
                when(shiftright(f, j).bitwiseAND(1) === 1, 1).otherwise(-1))
            when(votes > 0, lit(1L << j)).otherwise(lit(0L))
          }
          bits.reduce((a, b) => a.bitwiseOR(b))
        }), 1).as("h"))
    assert(df.collect().map(_.getLong(0)).toSeq ===
      hof.collect().map(_.getLong(0)).toSeq)
    // sentinels: NULL array and empty array both yield 0L, NOT NULL;
    // a NULL element votes -1 on every bit — all three match the fold
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val at = ArrayType(LongType)
    def evalOf(v: Any): Any =
      SimHash64(Literal.create(v, at)).eval(null)
    assert(evalOf(null) === 0L)
    assert(evalOf(Seq.empty[Long]) === 0L)
    assert(evalOf(Seq[Any](null, -1L)) === 0L)   // +1 -1 tie -> bit clear
    assert(evalOf(Seq[Any](-1L)) === -1L)        // every bit set
    assert(evalOf(Seq[Any](5L)) === 5L)          // bits 0,2
  }

  test("TurtleEscape and StnParent run under whole-stage codegen") {
    import org.apache.spark.sql.GraftSqlShims.{columnOf, expressionOf}
    val df = spark.range(1)
      .select(concat(lit("a\\b\"c"), col("id")).as("s"),
        concat(lit("A1.2."), col("id")).as("stn"))
      .select(columnOf(TurtleEscape(expressionOf(col("s")))).as("e"),
        columnOf(StnParent(expressionOf(col("stn")))).as("p"))
    assert(wscgCovers(df), df.queryExecution.executedPlan.toString.take(800))
    val r = df.collect()(0)
    assert(r.getString(0) === "a\\\\b\\\"c0")
    assert(r.getString(1) === "A1.2")
  }
}
