package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Sequence packing: chunked offsets are a per-shard running sum, greedy
  * bins respect capacity, shard hashing is wide and deterministic, and
  * the id-type contract fails fast.
  */
class PackingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** docs with doc_id i having exactly (i % 7) + 1 tokens */
  private def docs(n: Int) =
    (0 until n).map { i =>
      (i.toLong, Seq.fill(i % 7 + 1)("tok").mkString(" "))
    }.toDF("doc_id", "text")

  test("packChunked: tok_start is the per-shard running sum in id order " +
    "and seq_id cuts it at capacity") {
    val out = Packing.packChunked(docs(200), capacity = 10, numShards = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.length === 200)
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (id, _, seqId, tokStart) =>
        assert(tokStart === cum, s"doc $id tok_start")
        assert(seqId === (tokStart / 10).toInt, s"doc $id seq_id")
        cum += (id % 7) + 1
      }
    }
  }

  test("packChunked is deterministic and partition-invariant") {
    val a = Packing.packChunked(docs(150), 16, 8).collect().toSet
    val b = Packing.packChunked(docs(150).repartition(13), 16, 8)
      .collect().toSet
    assert(a === b)
  }

  test("packGreedy: next-fit fill never exceeds capacity except for a " +
    "solo oversize doc, bins are contiguous from 0 in id order") {
    val capacity = 9
    val out = Packing.packGreedy(docs(200), capacity, numShards = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.length === 200)
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      // replay the fold
      var bin = 0; var fill = 0; var first = true
      sorted.foreach { case (id, _, gotBin) =>
        val n = (id % 7 + 1).toInt
        if (first) { fill = n; first = false }
        else if (fill + n <= capacity) fill += n
        else { bin += 1; fill = n }
        assert(gotBin === bin, s"doc $id bin")
      }
      // bins are 0..max with no gaps
      val bins = sorted.map(_._3)
      assert(bins.distinct.sorted === (0 to bins.max).toSeq)
    }
    // a bin's total never exceeds capacity unless it is a single
    // oversize doc ((i%7)+1 <= 7 < 9 here, so never)
    out.groupBy(r => (r._2, r._3)).foreach { case ((_, _), rows) =>
      assert(rows.map(r => (r._1 % 7 + 1).toInt).sum <= capacity)
    }
  }

  test("packGreedy rejects a non-integral id column at plan time") {
    val bad = Seq(("a", "x y z")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Packing.packGreedy(bad, 10, 4)
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("hashShard covers shard ids beyond 65,536 (60-bit hash, not 16)") {
    val ids = spark.range(0, 2000).select(col("id").cast("string").as("id"))
    val shards = ids.select(Packing.hashShard(col("id"), 1000000).as("s"))
      .agg(min("s"), max("s")).head()
    assert(shards.getInt(0) >= 0)
    // with a 16-bit hash every value would be < 65,536
    assert(shards.getInt(1) > 65535)
  }

  test("hashShard is a pure function of the id (stable across runs)") {
    val a = Packing.hashShard(lit(12345L), 97)
    val one = spark.range(1).select(a.as("s")).head().getInt(0)
    val two = spark.range(1).select(a.as("s")).head().getInt(0)
    assert(one === two)
    assert(one >= 0 && one < 97)
  }

  test("writeShards lays out one directory per shard and a shard scan " +
    "is partition-pruned to that directory's assignments") {
    import spark.implicits._
    val docs = (0 until 60)
      .map(i => (i.toLong, s"alpha bravo tok$i charlie"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Packing.writeShards(docs, dir, capacity = 16, numShards = 4)
    val back = spark.read.parquet(dir)
    // every doc present exactly once, with its packChunked assignment
    val expected = Packing.packChunked(docs, 16, 4)
      .select("doc_id", "shard", "seq_id").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val got = back.select("doc_id", "shard", "seq_id").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(got === expected)
    // shard filter prunes partitions at the scan
    val one = back.filter(col("shard") === 1)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      plan.take(1200))
  }
}
