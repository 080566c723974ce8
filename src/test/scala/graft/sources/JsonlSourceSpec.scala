package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** JSONL source behavior over the committed fixture
  * (`fixtures/jsonl/documents.jsonl`): schema'd parallel reads, corrupt
  * line tolerance, missing/extra field handling.
  */
class JsonlSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val fixture = "/root/repo/fixtures/jsonl/documents.jsonl"

  test("jsonlDocs parses valid lines, nulls missing fields, ignores " +
    "extra fields, and drops the corrupt line") {
    val rows = DocSource.jsonlDocs(spark, fixture)
      .orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 10L)) // 9 = corrupt, dropped
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getString(1) === "sautéed \"greens\" & rice")
    assert(byId(4L).getString(1) === "line one\nline two") // JSON \n decoded
    assert(byId(5L).getString(1) === "中文样本文本")
    assert(byId(6L).isNullAt(2)) // missing lang → NULL
    assert(byId(7L).getString(2) === "de") // crawl_ts ignored, row intact
  }

  test("jsonlReadReport counts valid vs corrupt lines") {
    val r = DocSource.jsonlReadReport(spark, fixture).collect()(0)
    assert(r.getLong(0) === 9L)
    assert(r.getLong(1) === 1L)
  }

  test("jsonl read is line-splittable (multiLine=false) — the plan is a " +
    "plain FileScan, no whole-file collapse") {
    val p = DocSource.jsonlDocs(spark, fixture)
      .queryExecution.executedPlan.toString
    assert(p.contains("FileScan json"), p.take(500))
  }

  test("csvDocs parses RFC-4180: quoted commas, doubled-quote escapes, " +
    "unicode, empty-as-null, preserved trailing spaces") {
    val rows = DocSource.csvDocs(spark,
        "/root/repo/fixtures/jsonl/documents.csv")
      .orderBy("doc_id").collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(rows.length === 7)
    assert(byId(1L).getString(1) === "the quick, brown fox")
    assert(byId(3L).getString(1) === "she said \"hi\" twice")
    assert(byId(4L).getString(1) === "中文样本文本")
    assert(byId(5L).isNullAt(1)) // empty unquoted field → NULL
    assert(byId(7L).getString(1) === "trailing spaces  ")
  }
}
