package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface: registered names evaluate with the same
  * semantics as the Scala plane, inside codegen (whole rows, not UDFs).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  GraftExtensions.install(spark)

  private def one(sql: String): String =
    spark.sql(sql).collect()(0).getString(0)

  test("py_quote matches urllib.parse.quote semantics in SQL") {
    assert(one("SELECT py_quote('a b/c%')") === "a%20b/c%25")
    assert(one("SELECT py_quote('héllo')") === "h%C3%A9llo")
  }

  test("turtle_escape escapes backslashes before quotes") {
    assert(one("""SELECT turtle_escape('a\\b"c')""") === """a\\b\"c""")
  }

  test("stn_parent derives dotted and single-segment parents") {
    assert(one("SELECT stn_parent('A1.2.3')") === "A1.2")
    assert(one("SELECT stn_parent('A1')") === "A")
  }

  test("rel_fragment applies Python falsiness to RELA") {
    assert(one("SELECT rel_fragment('', 'CHD')") === "CHD")
    assert(one("SELECT rel_fragment('part_of', 'RO')") === "part_of")
    assert(one("SELECT rel_fragment(NULL, 'RB')") === "RB")
  }

  test("functions run over columns (codegen path), not just literals") {
    import spark.implicits._
    val got = Seq("A1.2", "B3").toDF("stn")
      .selectExpr("stn_parent(stn) AS p")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("A1", "B"))
  }

  test("text-pipeline SQL functions equal their DataFrame-plane twins") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (1L, "the quick brown fox and the lazy dog"),
      (2L, "mail me at a.b@example.com or 555-123-4567 now please"),
      (3L, "der hund und die katze ist ein tier")).toDF("doc_id", "text")
    d.createOrReplaceTempView("sqlfn_docs")
    val viaSql = spark.sql("""
      SELECT doc_id, quality_score(text) AS q, lang_id(text) AS lang,
             doc_fingerprint(text) AS fp, scrub_pii(text) AS clean,
             simhash64(text) AS sh, hash_split(doc_id, 0.9) AS split
      FROM sqlfn_docs ORDER BY doc_id""").collect()
    val viaDf = d.select(col("doc_id"),
        graft.operators.TextAnalysis.qualityScore(col("text")).as("q"),
        graft.operators.TextAnalysis.langId(col("text")).getField("lang")
          .as("lang"),
        graft.operators.TextAnalysis.fingerprint(col("text")).as("fp"),
        graft.operators.TextAnalysis.scrubPii(col("text")).as("clean"),
        graft.operators.Dedup.rowSimhash64(col("text")).as("sh"),
        graft.operators.TextAnalysis.hashSplit(col("doc_id"), 0.9)
          .as("split"))
      .orderBy("doc_id").collect()
    assert(viaSql.map(_.toSeq).toSeq === viaDf.map(_.toSeq).toSeq)
    // sanity on the semantics themselves
    assert(viaSql(1).getString(4).contains("<EMAIL>"))
    assert(viaSql(1).getString(4).contains("<PHONE>"))
    assert(viaSql(2).getString(2) === "de")
  }

  test("hash_split rejects a non-literal frac") {
    val e = intercept[Exception] {
      spark.sql("SELECT hash_split(doc_id, doc_id * 0.1) FROM sqlfn_docs")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
      e.getCause != null)
  }
}
