package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Dedup decision layer: connected components over candidate pairs. */
class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("nearDupComponents labels chains and separate clusters") {
    // components: {1,2,3,4} (a chain — needs propagation rounds), {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 9L))
      .toDF("id_a", "id_b")
    val got = Dedup.nearDupComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 9L -> 7L))
  }

  test("nearDupDuplicates drops everything but the component keeper") {
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
    val drops = Dedup.nearDupDuplicates(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(drops === Set(11L -> 10L, 12L -> 10L, 21L -> 20L))
  }

  test("scrubPii redacts emails, phones, and long digit runs in order") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "contact bob.smith+x@example.co.uk today"),
      (2L, "call +1 (555) 123-4567 or 555.123.4567"),
      (3L, "acct 123456789012 is overdue"),
      (4L, "no pii here")).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
      TextAnalysis.scrubPii(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "contact <EMAIL> today")
    assert(got(2L) === "call <PHONE> or <PHONE>")
    assert(got(3L) === "acct <ID> is overdue")
    assert(got(4L) === "no pii here")
  }

  test("components are partition-invariant") {
    val pairs = Seq((1L, 5L), (5L, 3L), (3L, 8L), (2L, 9L), (9L, 4L))
      .toDF("id_a", "id_b")
    val one = Dedup.nearDupComponents(pairs.repartition(1)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Dedup.nearDupComponents(pairs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === many)
    assert(one.values.toSet === Set(1L, 2L))
  }
}
