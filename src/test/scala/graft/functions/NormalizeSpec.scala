package graft.functions

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** The codegen'd single-pass normalize ([[NormalizeCollapse]]) must be
  * VALUE-IDENTICAL to the portable two-regex form the DuckDB oracles
  * replay — every fingerprint/dedup oracle stays green only if the two
  * never diverge on any input. Property-pinned over unicode-heavy
  * random strings plus the known hostile shapes.
  */
class NormalizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def bothForms(inputs: Seq[String]): Seq[(String, String)] =
    inputs.toDF("t")
      .select(
        TextAnalysis.normalize(col("t")).as("fast"),
        TextAnalysis.normalizeRegex(col("t")).as("slow"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("fast normalize equals the regex form on hostile fixed cases") {
    val cases = Seq(
      "", " ", "\t\n\r", "hello world", "  Hello,  WORLD!  ",
      "a-b_c.d", "tabs\tand\nnewlines\r\nmix", "123 abc 456",
      "Café 日本 naïve — résumé", " nbsp runs ",
      "ÀÉÎÕÜ çğış İı", "emoji 🙂 pair 𝔘𝔫𝔦", "--- ___ !!!",
      "a", "Z", "0", "ab", " a ", "ß sharp", "x".repeat(1000) + " \t y")
    bothForms(cases).zip(cases).foreach { case ((fast, slow), in) =>
      assert(fast === slow, s"diverged on input: ${in.take(80)}")
    }
  }

  test("property: fast normalize equals the regex form on random " +
    "unicode strings") {
    val genChar = Gen.frequency(
      6 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '\t', '\n', '\r', ',', '.', '-', '_', '!'),
      2 -> Gen.oneOf('é', 'Ü', 'ß', '中', '日', 'İ', 'ı', ' '),
      1 -> Gen.choose(Char.MinValue, Char.MaxValue))
    val genStr = Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, genChar).map(_.mkString))
    val prop = Prop.forAll(Gen.listOfN(20, genStr)) { inputs =>
      bothForms(inputs).forall { case (fast, slow) => fast == slow }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("NormalizeCollapse runs under whole-stage codegen") {
    val df = spark.range(3)
      .select(concat(lit("A, b!\t"), col("id")).as("s"))
      .select(TextAnalysis.normalize(col("s")).as("n"))
    val plan = df.queryExecution.executedPlan
    assert(plan.collect { case w: WholeStageCodegenExec => w }.nonEmpty &&
      !plan.toString.contains("InterpretedProjection"),
      plan.toString.take(800))
    assert(df.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("a b 0", "a b 1", "a b 2"))
  }
}
