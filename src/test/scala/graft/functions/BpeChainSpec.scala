package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Tokenizer

/** Bit-parity pins for the r19 BPE merge-chain rewrite:
  * [[BpeMergeChain]] must match the interpreted per-merge `aggregate`
  * HOF chain it replaced — `Tokenizer.mergeOnce` pre-r19, replayed here
  * VERBATIM — word by word, under BOTH whole-stage codegen (top-level
  * projection) and interpreted `eval`, across randomized trained merge
  * lists, greedy-left re-fuse chains ("aaa" under (a,a)), supplementary-
  * plane code points, and the empty/NULL contracts. Same discipline as
  * `PqCodegenSpec`'s PqEncode/AdcScore pins (r18) and `CodegenSpec`'s
  * ArgMinCentroid pin (r17).
  */
class BpeChainSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // ---- the retired algebra, verbatim (Tokenizer.scala pre-r19) ------
  private def oldMergeOnce(sym: Column, a: String, b: String,
      merged: String): Column =
    aggregate(sym,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(x))))

  private def oldFold(w: Column, merges: Seq[(String, String)]): Column = {
    val sym0 = filter(split(w, ""), s => length(s) > 0)
    merges.foldLeft(sym0) { case (s, (a, b)) =>
      oldMergeOnce(s, a, b, a + b)
    }
  }

  private def oldApply(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val words = split(trim(lower(col("text"))), "\\s+")
    val tokensPerWord = transform(words, w => oldFold(w, merges))
    docs.select(col("doc_id"),
      flatten(filter(tokensPerWord, a => size(a) > 0)).as("tokens"))
  }

  private def wscgCovers(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    plan.collect { case w: WholeStageCodegenExec => w }.nonEmpty &&
      !plan.toString.contains("InterpretedProjection")
  }

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaa aaaa abab ababab baab",
    "es est test testes estes ses",
    "lowering lowered lower lowest low",
    "naïve café 😀a😀 a😀b",
    "  padded   words  ", "", "x", "repeat repeat repeat repeat")

  private def docs(texts: Seq[String]): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("BpeMergeChain runs under whole-stage codegen at top level and " +
      "matches the replayed per-merge aggregate chain on a trained " +
      "merge list") {
    val merges = Tokenizer.bpeTrain(docs(corpus), numMerges = 12)
    assert(merges.nonEmpty)
    val words = docs(corpus)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val neu = words.select(col("w"),
      SubwordFunctions.bpeMergeChain(col("w"), merges).as("t"))
    assert(wscgCovers(neu),
      neu.queryExecution.executedPlan.toString.take(800))
    val old = words.select(col("w"), oldFold(col("w"), merges).as("t"))
    val nRows = neu.orderBy("w").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList)
    val oRows = old.orderBy("w").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList)
    assert(nRows.toSeq === oRows.toSeq)
  }

  test("greedy-left re-fuse: 'aaa' under (a,a) is [aa, a] in the " +
      "expression, the replayed chain, and interpreted eval") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val merges = Seq(("a", "a"))
    val viaEval = BpeMergeChain(Literal("aaa"), merges).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(viaEval === Seq("aa", "a"))
    val viaOld = spark.range(1).select(oldFold(lit("aaa"), merges).as("t"))
      .head().getSeq[String](0)
    assert(viaOld === Seq("aa", "a"))
    // and the fused symbol keeps fusing forward under a chained rule
    val chain = Seq(("a", "a"), ("aa", "a"))
    val viaEval2 = BpeMergeChain(Literal("aaaa"), chain).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    val viaOld2 = spark.range(1)
      .select(oldFold(lit("aaaa"), chain).as("t")).head().getSeq[String](0)
    assert(viaEval2 === viaOld2)
  }

  test("bpeApply (now expression-routed) equals the full replayed old " +
      "plan on the corpus, including supplementary-plane code points " +
      "and the NULL-text row") {
    val merges = Tokenizer.bpeTrain(docs(corpus), numMerges = 8)
    val withNull = docs(corpus)
      .union(Seq((99L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val neu = Tokenizer.bpeApply(withNull, merges).orderBy("doc_id")
      .collect().map(r => (r.getLong(0),
        Option(r.getSeq[String](1)).map(_.toList)))
    val old = oldApply(withNull, merges).orderBy("doc_id")
      .collect().map(r => (r.getLong(0),
        Option(r.getSeq[String](1)).map(_.toList)))
    assert(neu.toSeq === old.toSeq)
    // NULL text → NULL tokens in both (the Column null chain)
    assert(neu.last._1 === 99L && neu.last._2.isEmpty)
  }

  test("randomized property: expression ≡ replayed chain over fuzzed " +
      "corpora and trained merges (25 rounds)") {
    val rnd = new scala.util.Random(20260816)
    for (round <- 1 to 25) {
      val alpha = "abcde".take(2 + rnd.nextInt(3))
      val texts = Seq.fill(12)(
        Seq.fill(1 + rnd.nextInt(6))(
          Seq.fill(1 + rnd.nextInt(7))(
            alpha(rnd.nextInt(alpha.length))).mkString)
          .mkString(" "))
      val merges = Tokenizer.bpeTrain(docs(texts),
        numMerges = 1 + rnd.nextInt(10))
      val words = docs(texts)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
      val neu = words
        .select(col("w"),
          SubwordFunctions.bpeMergeChain(col("w"), merges).as("t"))
        .orderBy("w").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList)
      val old = words.select(col("w"), oldFold(col("w"), merges).as("t"))
        .orderBy("w").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList)
      assert(neu.toSeq === old.toSeq, s"round $round merges=$merges")
    }
  }

  test("the bpeApply plan contains NO higher-order function and stays " +
      "inside whole-stage codegen — the ProfileQ183b cold-JIT source " +
      "(interpreted lambda dispatch) is structurally gone") {
    val merges = Seq(("e", "s"), ("es", "t"))
    // RDD-backed input: a LocalRelation would let ConvertToLocalRelation
    // evaluate the whole projection driver-side and leave no physical
    // plan to assert on
    val rdd = spark.sparkContext.parallelize(
      corpus.zipWithIndex.map { case (t, i) =>
        org.apache.spark.sql.Row(i.toLong, t)
      }, 2)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val df = Tokenizer.bpeApply(spark.createDataFrame(rdd, schema), merges)
    assert(wscgCovers(df),
      df.queryExecution.executedPlan.toString.take(800))
    val analyzed = df.queryExecution.analyzed.toString
    for (hof <- Seq("transform(", "filter(lambda", "aggregate("))
      assert(!analyzed.contains(hof),
        s"plan still carries HOF '$hof':\n${analyzed.take(800)}")
    assert(analyzed.contains("bpe_tokenize_words"), analyzed.take(400))
  }

  test("empty word → empty array, empty rule list → code-point split, " +
      "NULL word → NULL (eval + codegen)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    def evalOf(w: Any, rules: Seq[(String, String)]): Any =
      BpeMergeChain(Literal.create(w, StringType), rules).eval(null)
    assert(evalOf("", Seq(("a", "b")))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() === 0)
    assert(evalOf(null, Seq(("a", "b"))) === null)
    assert(evalOf("ab😀", Seq.empty)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](StringType)
      .map(_.toString).toSeq === Seq("a", "b", "😀"))
    val viaDf = spark.range(1)
      .select(SubwordFunctions.bpeMergeChain(lit("abab"),
        Seq(("a", "b"), ("ab", "ab"))).as("t")).head().getSeq[String](0)
    assert(viaDf === Seq("abab"))
  }
}
