package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.IvfIndex

/** Streaming IVF ingestion: the incrementally-maintained clustered
  * layout must be indistinguishable — assignments AND query answers —
  * from the batch [[IvfIndex.writeClustered]] over the same vectors,
  * and micro-batch replay must be idempotent.
  */
class VecStreamsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val dim = 8
  private val centroids = IvfIndex.portableCentroids(4, dim)

  /** Deterministic test vector: unit-ish floats from (id, j). */
  private def vecJson(id: Long): String = {
    val xs = (0 until dim).map(j =>
      math.rint(math.sin(id * 7.0 + j) * 1000) / 1000)
    s"""{"vec_id": $id, "embedding": [${xs.mkString(", ")}]}"""
  }

  private def writeShard(dir: Path, name: String, lines: String*): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))

  test("clusteredIngest tails deliveries into the writeClustered layout: " +
    "assignments match the batch path, corrupt lines are dropped and " +
    "counted, new shards arrive incrementally") {
    val root = Files.createTempDirectory("graft-vecstream")
    val in = Files.createDirectory(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString
    writeShard(in, "shard0.jsonl",
      (1L to 20L).map(vecJson) :+ "{broken json": _*)
    writeShard(in, "shard1.jsonl", (21L to 40L).map(vecJson): _*)
    val reports =
      scala.collection.mutable.ArrayBuffer[VecStreams.ClusterReport]()
    val q = VecStreams.clusteredIngest(
      VecStreams.jsonlTail(spark, in.toString), centroids, out, cp,
      r => reports.synchronized { reports += r })
    try {
      q.processAllAvailable()
      assert(reports.map(_.nVectors).sum === 40L)
      assert(reports.map(_.nCorrupt).sum === 1L)

      // late-arriving shard drains alone (checkpointed file source)
      writeShard(in, "shard2.jsonl", (41L to 50L).map(vecJson): _*)
      q.processAllAvailable()

      val streamed = spark.read.parquet(out)
        .select(col("vec_id"), col("cluster").cast("int"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed.keySet === (1L to 50L).toSet)

      // assignment parity with the batch path, row for row
      val batchDf = spark.read.parquet(out)
        .select("vec_id", "embedding")
      val expected = IvfIndex.assignments(batchDf, centroids)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed === expected)
    } finally q.stop()
  }

  test("clusteredTopK over the streamed layout answers exactly like " +
    "IvfIndex.topK over the batch corpus") {
    val root = Files.createTempDirectory("graft-vecstream-q")
    val in = Files.createDirectory(root.resolve("in"))
    val out = root.resolve("out").toString
    val cp = root.resolve("cp").toString
    writeShard(in, "shard0.jsonl", (1L to 30L).map(vecJson): _*)
    writeShard(in, "shard1.jsonl", (31L to 60L).map(vecJson): _*)
    val q = VecStreams.clusteredIngest(
      VecStreams.jsonlTail(spark, in.toString), centroids, out, cp)
    try q.processAllAvailable() finally q.stop()

    val corpus = spark.read.parquet(out).select("vec_id", "embedding")
    val queryVec = corpus.filter(col("vec_id") === 7L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray
    // clusteredTopK does not exclude the query id itself; topK does —
    // over-fetch one, drop the self row, compare the top 5 in order
    val got = IvfIndex.clusteredTopK(spark, out, queryVec, centroids,
        k = 6, nProbe = 2)
      .filter(col("vec_id") =!= 7L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).take(5)
    val want = IvfIndex.topK(corpus, centroids, queryId = 7L, k = 5,
        nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === want.toSeq)
  }

  test("clusterBatch replay with the same batchId is idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-vecstream-replay")
    val out = root.resolve("out").toString
    val rows: Seq[(Option[Long], Option[Seq[Float]], Option[String])] =
      (1L to 10L).map { id =>
        (Option(id), Option((0 until dim).map(j =>
          (math.rint(math.sin(id * 7.0 + j) * 1000) / 1000).toFloat)
          .toSeq), None)
      } :+ ((None, None, Option("{junk")))
    val b = rows.toDF("vec_id", "embedding", "_corrupt")
    VecStreams.clusterBatch(b, 0L, centroids, out, _ => ())
    VecStreams.clusterBatch(b, 0L, centroids, out, _ => ()) // replay
    assert(spark.read.parquet(out).count() === 10L)
    assert(spark.read.parquet(out).select("vec_id").distinct().count()
      === 10L)
  }
}
