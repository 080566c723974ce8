package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Product quantization: training is deterministic, codes stay in range
  * and compress the representation, and ADC search recalls the brute-force
  * answer on clustered data (where ANN is actually used).
  */
class PqIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val Dim = 16

  private def clustered(nClusters: Int, per: Int, seed: Long = 7L) = {
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

  test("codes are in range and the representation is m ints per vector") {
    val emb = clustered(4, 25)
    val books = PqIndex.train(emb, m = 4, k = 8, iters = 3)
    assert(books.length === 4)
    assert(books.forall(_.forall(_.length === Dim / 4)))
    val codes = PqIndex.encode(emb, books).collect()
    assert(codes.length === 100)
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length === 4)
      assert(cs.forall(c => c >= 0 && c < 8), cs)
    }
  }

  test("training and encoding are deterministic under repartition") {
    val emb = clustered(3, 20)
    val a = PqIndex.train(emb, m = 4, k = 4, iters = 3)
    val b = PqIndex.train(emb.repartition(7), m = 4, k = 4, iters = 3)
    assert(a.map(_.map(_.toSeq).toSeq).toSeq === b.map(_.map(_.toSeq).toSeq).toSeq)
    val ca = PqIndex.encode(emb, a).orderBy("vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toSeq
    val cb = PqIndex.encode(emb.repartition(5), a).orderBy("vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toSeq
    assert(ca === cb)
  }

  test("same-cluster vectors share codes on well-separated data") {
    // k = #clusters: per block, k-means converges on the cluster centers,
    // so each tight cluster quantizes to exactly one code word (k > #
    // clusters may legitimately split a cluster across two centroids).
    val emb = clustered(4, 25)
    val books = PqIndex.train(emb, m = 4, k = 4, iters = 5)
    val codes = PqIndex.encode(emb, books).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    (0 until 4).foreach { label =>
      val perCluster = (0 until 25).map(i => codes((label * 25 + i).toLong))
      assert(perCluster.distinct.size === 1,
        s"label $label spread over ${perCluster.distinct.size} code words")
    }
  }

  test("ADC topK recalls brute force on clustered vectors") {
    val emb = clustered(4, 25)
    val books = PqIndex.train(emb, m = 4, k = 8, iters = 5)
    val exact = Similarity.bruteForceTopK(emb, queryId = 7L, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val pq = PqIndex.topK(emb, books, queryId = 7L, k = 10, refine = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((exact intersect pq).size >= 9,
      s"recall ${(exact intersect pq).size}/10")
  }

  test("at-rest encoded search matches the in-memory ADC answer and " +
    "never reads the embedding column in the candidate pass") {
    val emb = clustered(4, 25)
    val books = PqIndex.train(emb, m = 4, k = 8, iters = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    PqIndex.writeEncoded(emb, dir, books)
    val qVec = emb
      .filter(org.apache.spark.sql.functions.col("vec_id") === 7L)
      .select("embedding").collect()(0)
      .getSeq[Float](0).map(_.toDouble).toArray
    val atRest = PqIndex.encodedTopK(spark, dir, emb, books, qVec,
      k = 5, refine = 3)
    // the candidate scan is the parquet codes table: (vec_id, codes) only
    val plan = atRest.queryExecution.executedPlan.toString
    assert(plan.contains("codes"), plan.take(1500))
    val inMem = PqIndex.adcTopK(emb, books, qVec, k = 5, refine = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(atRest.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      === inMem)
  }

  test("adcRecall measures >= 0.9 on clustered vectors and reports the " +
    "candidate fraction") {
    val emb = clustered(4, 25)
    val books = PqIndex.train(emb, m = 4, k = 8, iters = 5)
    val r = PqIndex.adcRecall(emb, books, queryIds = Seq(3L, 30L, 60L, 90L),
      k = 5, refine = 3).collect().head
    assert(r.getInt(0) === 4)
    assert(r.getDouble(3) >= 0.9, s"recall ${r.getDouble(3)}")
    assert(r.getDouble(4) === 0.15) // 5*3 / 100 rows
  }

  test("IVF-PQ composition recalls brute force while scanning only the " +
    "probed lists' codes") {
    val emb = clustered(4, 25)
    val centroids = IvfIndex.train(emb, k = 4, iters = 5)
    val books = PqIndex.train(emb, m = 4, k = 8, iters = 5)
    val qVec = emb
      .filter(org.apache.spark.sql.functions.col("vec_id") === 7L)
      .select("embedding").collect()(0)
      .getSeq[Float](0).map(_.toDouble).toArray
    val exact = Similarity.bruteForceTopK(emb, queryId = 7L, k = 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val got = PqIndex.ivfAdcTopK(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") =!= 7L),
        centroids, books, qVec, k = 5, nProbe = 1, refine = 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((exact intersect got).size >= 4, s"overlap ${exact intersect got}")
  }

  test("refine=1 still returns k exact-scored rows ordered by score") {
    val emb = clustered(2, 30)
    val books = PqIndex.train(emb, m = 4, k = 4, iters = 3)
    val rows = PqIndex.topK(emb, books, queryId = 0L, k = 5, refine = 1)
      .collect()
    assert(rows.length === 5)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted.reverse)
    assert(!rows.map(_.getLong(0)).contains(0L))
  }
}
