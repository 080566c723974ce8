package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** IVF quantizer + probe: training converges on clustered data, the
  * inverted lists respect the cluster structure, and probed top-k recalls
  * the brute-force answer.
  */
class IvfIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val Dim = 12

  private def clustered(nClusters: Int, per: Int, seed: Long = 11L) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters, Dim)(rnd.nextGaussian() * 3)
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until per
    } yield Row((c * per + i).toLong,
      centers(c).map(x => (x + 0.1 * rnd.nextGaussian()).toFloat).toSeq, c)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  test("train + assignments put same-label vectors in the same list") {
    val emb = clustered(4, 25)
    val centroids = IvfIndex.train(emb, k = 4, iters = 5)
    assert(centroids.length === 4)
    assert(centroids.forall(_.length === Dim))
    val a = IvfIndex.assignments(emb, centroids).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every true cluster maps to exactly one inverted list
    (0 until 4).foreach { label =>
      val lists = (0 until 25).map(i => a((label * 25 + i).toLong)).distinct
      assert(lists.size === 1, s"label $label split across lists $lists")
    }
  }

  test("topK with nProbe=1 recalls brute force on well-separated clusters") {
    val emb = clustered(4, 25)
    val centroids = IvfIndex.train(emb, k = 4, iters = 5)
    val exact = Similarity.bruteForceTopK(emb, queryId = 7L, k = 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = IvfIndex.topK(emb, centroids, queryId = 7L, k = 5, nProbe = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((exact intersect ivf).size >= 4)
  }

  test("training is deterministic") {
    val emb = clustered(3, 20)
    val a = IvfIndex.train(emb, k = 3, iters = 3).map(_.toSeq).toSeq
    val b = IvfIndex.train(emb.repartition(7), k = 3, iters = 3)
      .map(_.toSeq).toSeq
    assert(a === b)
  }

  test("clusteredTopK prunes to the probed inverted-list partitions and " +
    "matches the in-memory probe") {
    val emb = clustered(4, 25)
    val centroids = IvfIndex.train(emb, k = 4, iters = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.writeClustered(emb, dir, centroids)

    val qVec = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 7L)
      .select("embedding").collect()(0).getSeq[Float](0).map(_.toDouble).toArray

    val df = IvfIndex.clusteredTopK(spark, dir, qVec, centroids,
      k = 5, nProbe = 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      plan.take(2000))

    val atRest = df.collect().map(_.getLong(0)).toSeq
    val inMem = IvfIndex.topK(emb, centroids, queryId = 7L, k = 5, nProbe = 1)
      .collect().map(_.getLong(0)).toSeq
    // the at-rest probe sees the query vector itself; drop it to compare
    assert(atRest.head === 7L)
    assert(atRest.tail.toSet subsetOf (inMem.toSet + 7L))
  }

  test("seeding never duplicates centroids when distinct vectors < k") {
    // 60 rows but only 3 distinct vectors; k = 8 used to pad the seed set
    // with copies of seed 0 (argmax over all-zero minD), creating empty
    // clusters. Now seeding stops at the distinct count.
    val base = Array(
      Array.fill(Dim)(1.0), Array.fill(Dim)(-1.0),
      Array.tabulate(Dim)(i => if (i % 2 == 0) 2.0 else -2.0))
    val rows = (0 until 60).map { i =>
      Row(i.toLong, base(i % 3).map(_.toFloat).toSeq, i % 3)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val centroids = IvfIndex.train(emb, k = 8, iters = 2)
    assert(centroids.length === 3)
    assert(centroids.map(_.toSeq).distinct.length === 3)
    // every vector still lands in a non-empty, correct list
    val a = IvfIndex.assignments(emb, centroids).select("cluster")
      .distinct().collect().map(_.getInt(0)).toSet
    assert(a === Set(0, 1, 2))
  }

  test("semanticDedup drops the higher id of every within-cluster pair " +
    "at cosine >= tau and keeps everything else") {
    // hand-built 2-dim geometry: centroids on the axes, cosines chosen to
    // straddle tau = 0.9 on both sides
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),    // cluster 0
      (1L, Seq(0.99f, 0.141f)), // cluster 0, cos(0,1)=0.99 -> dropped by 0
      (2L, Seq(0.6f, 0.8f)),    // cluster 1
      (3L, Seq(0.0f, 1.0f)),    // cluster 1, cos(2,3)=0.8 -> both survive
      (4L, Seq(0.05f, 1.0f)))   // cluster 1, cos(3,4)=0.9988 -> dropped
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(vecs.map(v => Row(v._1, v._2)), 2),
      schema)
    val got = IvfIndex.semanticDedup(emb, centroids, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 2L -> 1, 3L -> 1))
  }
}
