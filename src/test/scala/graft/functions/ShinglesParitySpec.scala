package graft.functions

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** Value-parity pins for the r19 shingle/char-count expression rewrites:
  * [[WordShingles]], [[CountCharRange]] and [[WsTokenCount]] must match
  * the Column algebra they replaced — replayed here verbatim from the
  * pre-r19 `TextAnalysis` (kept as `shinglesHof` / `alphaRatioRegex` /
  * `digitRatioRegex` / `tokenCountHof`) — under BOTH whole-stage codegen
  * and interpreted `eval`. Same discipline as `PqCodegenSpec`.
  */
class ShinglesParitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def wscgCovers(df: org.apache.spark.sql.DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    plan.collect { case w: WholeStageCodegenExec => w }.nonEmpty &&
      !plan.toString.contains("InterpretedProjection")
  }

  // the edge atlas: whitespace classes, unicode lowercase (Kelvin sign
  // K lowercases to ASCII k; İ expands to two chars), multi-byte UTF-8,
  // empties, single tokens, exact-n and under-n token counts
  private val docs: Seq[String] = Seq(
    "", " ", "\t\n\f\r ", "one", "one two", "one two three",
    "a b c d e f", "  lead and trail  ", "tab\tsep\nlines\rhere",
    "double  space   runs", "ÜBER Straße GROẞ", "K elvin k",
    "İstanbul city", "中文 分词 测试 文本", "mix3d 4lpha num3ric",
    "punct, here! (kept) as-is", "x", "x y", "x y z w",
    "ab\fc", "ß sharp s", "emoji 😀 token here")

  private val df = docs.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("WordShingles matches the HOF algebra on the edge atlas, n = 1/2/3/5") {
    for (n <- Seq(1, 2, 3, 5)) {
      val neu = df.select(col("doc_id"),
        TextAnalysis.shingles(col("text"), n).as("s"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1).toList)
      val old = df.select(col("doc_id"),
        TextAnalysis.shinglesHof(col("text"), n).as("s"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1).toList)
      assert(neu.toSeq === old.toSeq, s"n=$n")
    }
  }

  test("WordShingles randomized property: 300 random strings over a " +
      "whitespace-heavy alphabet match the HOF algebra") {
    val rng = new scala.util.Random(19)
    val alphabet = "ab c\t\nd\f\re ü中KKß0."
    val rand = (0 until 300).map { i =>
      val len = rng.nextInt(40)
      (i.toLong, (0 until len)
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    for (n <- Seq(2, 3)) {
      val neu = rand.select(col("doc_id"),
        TextAnalysis.shingles(col("text"), n).as("s"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1).toList)
      val old = rand.select(col("doc_id"),
        TextAnalysis.shinglesHof(col("text"), n).as("s"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1).toList)
      assert(neu.toSeq === old.toSeq, s"n=$n")
    }
  }

  test("WordShingles null propagates, runs under whole-stage codegen, " +
      "and the interpreted eval agrees") {
    val withNull = spark.sql(
      "SELECT CAST(NULL AS STRING) AS text UNION ALL SELECT 'a b c d'")
    val out = withNull
      .select(TextAnalysis.shingles(col("text"), 3).as("s"))
    assert(wscgCovers(out), out.queryExecution.executedPlan.toString.take(800))
    val rows = out.collect()
    assert(rows.count(_.isNullAt(0)) === 1)
    assert(rows.filterNot(_.isNullAt(0))
      .map(_.getSeq[String](0).toList).toSet === Set(List("a b c", "b c d")))
    // interpreted eval path (no codegen): direct Expression.eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = WordShingles(Literal("a b c d"), 3)
    val got = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toList
    assert(got === List("a b c", "b c d"))
    assert(WordShingles(Literal.create(null,
      org.apache.spark.sql.types.StringType), 3).eval(null) === null)
  }

  test("CountCharRange and WsTokenCount match the regex/array algebra " +
      "(edge atlas + randomized), nulls propagate") {
    val neu = df.select(col("doc_id"),
        TextAnalysis.alphaRatio(col("text")).as("a"),
        TextAnalysis.digitRatio(col("text")).as("d"),
        TextAnalysis.tokenCount(col("text")).as("n"))
      .orderBy("doc_id").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getInt(3)))
    val old = df.select(col("doc_id"),
        TextAnalysis.alphaRatioRegex(col("text")).as("a"),
        TextAnalysis.digitRatioRegex(col("text")).as("d"),
        TextAnalysis.tokenCountHof(col("text")).as("n"))
      .orderBy("doc_id").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getInt(3)))
    assert(neu.toSeq === old.toSeq)
    val rng = new scala.util.Random(7)
    val alphabet = "abz019 \t\nü中KK.!"
    val rand = (0 until 300).map { i =>
      val len = rng.nextInt(60)
      (i.toLong, (0 until len)
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    val rn = rand.select(col("doc_id"),
        TextAnalysis.alphaRatio(col("text")).as("a"),
        TextAnalysis.digitRatio(col("text")).as("d"),
        TextAnalysis.tokenCount(col("text")).as("n"))
      .orderBy("doc_id").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getInt(3)))
    val ro = rand.select(col("doc_id"),
        TextAnalysis.alphaRatioRegex(col("text")).as("a"),
        TextAnalysis.digitRatioRegex(col("text")).as("d"),
        TextAnalysis.tokenCountHof(col("text")).as("n"))
      .orderBy("doc_id").collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getInt(3)))
    assert(rn.toSeq === ro.toSeq)
    val nulls = spark.sql("SELECT CAST(NULL AS STRING) AS text")
      .select(TextAnalysis.alphaRatio(col("text")).as("a"),
        TextAnalysis.tokenCount(col("text")).as("n")).collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("WsTokens (tokens()) matches the regex split algebra on the atlas " +
      "+ randomized, nulls propagate, empty input yields an EMPTY array") {
    def check(frame: org.apache.spark.sql.DataFrame): Unit = {
      val neu = frame.select(col("doc_id"),
          TextAnalysis.tokens(col("text")).as("t"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1).toList)
      val old = frame.select(col("doc_id"),
          TextAnalysis.tokensRegex(col("text")).as("t"))
        .orderBy("doc_id").collect().map(_.getSeq[String](1).toList)
      assert(neu.toSeq === old.toSeq)
    }
    check(df)
    val rng = new scala.util.Random(23)
    val alphabet = "ab c\t\nd\f\re ü中KKß0."
    check((0 until 300).map { i =>
      val len = rng.nextInt(50)
      (i.toLong, (0 until len)
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text"))
    val edge = spark.sql(
      "SELECT CAST(NULL AS STRING) AS text UNION ALL SELECT ' \t ' " +
        "UNION ALL SELECT ''")
      .select(TextAnalysis.tokens(col("text")).as("t")).collect()
    assert(edge.count(_.isNullAt(0)) === 1)
    assert(edge.filterNot(_.isNullAt(0))
      .forall(_.getSeq[String](0).isEmpty))
  }

  test("qualityScore (the composite consumer) is value-identical to the " +
      "regex composition on the atlas") {
    def qsOld(text: org.apache.spark.sql.Column) = {
      val alpha = TextAnalysis.alphaRatioRegex(text)
      val digit = TextAnalysis.digitRatioRegex(text)
      val ntok = TextAnalysis.tokenCountHof(text).cast("double")
      val lenOk = when(ntok >= 5 && ntok <= 5000, lit(1.0))
        .otherwise(lit(0.5))
      alpha * lenOk - digit
    }
    val neu = df.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .orderBy("doc_id").collect().map(_.getDouble(1))
    val old = df.select(col("doc_id"), qsOld(col("text")).as("q"))
      .orderBy("doc_id").collect().map(_.getDouble(1))
    assert(neu.map(java.lang.Double.doubleToLongBits).toSeq ===
      old.map(java.lang.Double.doubleToLongBits).toSeq)
  }
}
