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

  test("packBestFit follows the hand-computed BFD trajectory") {
    // capacity 10, one shard; lengths placed longest-first:
    //   9 -> bin0; 8 -> bin1; 5 -> bin2; 4 -> bin2 (fullest fitting, 5+4);
    //   3 -> bin3 (nothing fits); 2 -> bin1 (8+2); 2 -> bin3 (3+2);
    //   1 -> bin0 (ties 9=9 -> lowest bin id)
    val lens = Seq(9, 8, 5, 4, 3, 2, 2, 1)
    val df = lens.zipWithIndex
      .map { case (n, i) => ((i + 1).toLong, Seq.fill(n)("t").mkString(" ")) }
      .toDF("doc_id", "text")
    val out = Packing.packBestFit(df, capacity = 10, numShards = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(3), r.getInt(4)))
    assert(out.toSeq === Seq(
      (1L, 0, 0, 9), (2L, 0, 1, 8), (3L, 0, 2, 5), (4L, 0, 2, 4),
      (5L, 0, 3, 3), (6L, 0, 1, 2), (7L, 0, 3, 2), (8L, 0, 0, 1)))
  }

  test("packBestFit splits oversize docs into capacity-sized pieces, " +
    "never truncates, never overfills, and uses no more bins than " +
    "packGreedy") {
    val mixed = (0 until 120).map { i =>
      val n = i % 23 + 1 // lengths 1..23 with capacity 9: some oversize
      (i.toLong, Seq.fill(n)("tok").mkString(" "))
    }.toDF("doc_id", "text")
    val capacity = 9
    val out = Packing.packBestFit(mixed, capacity, numShards = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
    // every doc's pieces reassemble its full token count, pieces <= cap
    out.groupBy(_._1).foreach { case (id, pieces) =>
      val n = (id % 23 + 1).toInt
      assert(pieces.map(_._5).sum === n, s"doc $id total")
      assert(pieces.forall(_._5 <= capacity))
      assert(pieces.map(_._2).sorted.toSeq ===
        (0 until (n + capacity - 1) / capacity).toSeq, s"doc $id pieces")
    }
    // no bin over capacity; bins contiguous from 0 per shard
    out.groupBy(r => (r._3, r._4)).foreach { case (_, rows) =>
      assert(rows.map(_._5).sum <= capacity)
    }
    out.groupBy(_._3).foreach { case (_, rows) =>
      val bins = rows.map(_._4)
      assert(bins.distinct.sorted.toSeq === (0 to bins.max).toSeq)
    }
    // BFD bin count per shard <= next-fit bin count per shard (docs <=
    // capacity only, so the strategies pack the same piece multiset)
    val small = mixed.filter(col("doc_id") % 23 < 9)
    val bfdBins = Packing.packBestFit(small, capacity, 4).collect()
      .map(r => (r.getInt(2), r.getInt(3))).groupBy(_._1)
      .view.mapValues(_.map(_._2).max + 1).toMap
    val nfBins = Packing.packGreedy(small, capacity, 4).collect()
      .map(r => (r.getInt(1), r.getInt(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).max + 1).toMap
    bfdBins.foreach { case (shard, b) =>
      assert(b <= nfBins(shard), s"shard $shard: bfd $b vs nf ${nfBins(shard)}")
    }
  }

  test("packBestFit is deterministic and partition-invariant") {
    val a = Packing.packBestFit(docs(150), 16, 8).collect().toSet
    val b = Packing.packBestFit(docs(150).repartition(13), 16, 8)
      .collect().toSet
    assert(a === b)
  }

  test("packingStats: BFD never pads more than next-fit and both pack " +
    "the same token total") {
    val rows = Packing.packingStats(docs(200), capacity = 16, numShards = 4)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (nfBins, nfToks, nfPad, nfFrac) = rows("next_fit")
    val (bfBins, bfToks, bfPad, bfFrac) = rows("best_fit_decreasing")
    assert(nfToks === bfToks)
    assert(bfBins <= nfBins)
    assert(bfPad <= nfPad)
    assert(bfFrac <= nfFrac)
    assert(math.abs(nfFrac - nfPad.toDouble / (nfBins * 16)) < 1e-12)
  }

  test("writePackedShards stores piece-sliced docs: pieces reassemble " +
    "each doc's normalized token stream, bins stay within capacity, " +
    "and a shard scan is partition-pruned") {
    val mixed = (0 until 80).map { i =>
      val n = i % 23 + 1
      (i.toLong, Seq.tabulate(n)(j => s"w${i}x$j").mkString(" "))
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-packed").toString
    Packing.writePackedShards(mixed, dir, capacity = 9, numShards = 4)
    val back = spark.read.parquet(dir)
    val rows = back.select("doc_id", "piece", "piece_text", "n_tokens")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    rows.groupBy(_._1).foreach { case (id, ps) =>
      val full = ps.sortBy(_._2).map(_._3).mkString(" ")
      val n = (id % 23 + 1).toInt
      val expect = Seq.tabulate(n)(j => s"w${id}x$j").mkString(" ")
      assert(full === expect, s"doc $id")
      ps.foreach(p => assert(p._4 === p._3.split(" ").length))
    }
    back.groupBy("shard", "bin")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("f"))
      .collect().foreach(r => assert(r.getLong(2) <= 9L))
    val plan = spark.read.parquet(dir).filter(col("shard") === 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
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
