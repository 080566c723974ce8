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
