package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Scale-path checks for the similarity operators: bucket sizing math,
  * measured ANN recall (the approximation's honesty check), and partition
  * pruning over the physically-bucketed layout.
  */
class SimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val Dim = 16

  /** Deterministic clustered vectors: `nClusters` gaussian centers, `per`
    * members each with small jitter — a corpus where near neighbors are
    * real, so recall is a meaningful number. */
  private def clustered(nClusters: Int, per: Int, seed: Long = 7L) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters, Dim)(rnd.nextGaussian())
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until per
    } yield {
      val v = centers(c).map(x => (x + 0.05 * rnd.nextGaussian()).toFloat)
      Row((c * per + i).toLong, v.toSeq, c)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  test("nBitsFor keeps expected bucket population bounded") {
    assert(Similarity.nBitsFor(1000, 64) === 4)
    assert(Similarity.nBitsFor(100000, 64) === 11)
    assert(Similarity.nBitsFor(1000000000L, 64) === 24) // clamp high
    assert(Similarity.nBitsFor(10, 64) === 4) // clamp low
    // doubling the corpus adds ~1 bit: buckets stay ~constant size
    val a = Similarity.nBitsFor(1L << 20, 64)
    val b = Similarity.nBitsFor(1L << 21, 64)
    assert(b === a + 1)
  }

  test("annRecall >= 0.9 on clustered corpus with multi-probe") {
    val emb = clustered(nClusters = 8, per = 40) // n = 320
    val nBits = Similarity.nBitsFor(320, 64) // = 4 -> 16 buckets
    val recall = Similarity.annRecall(emb, queryIds = 0L until 10L,
      k = 5, nBits = nBits, dim = Dim, probeRadius = 2)
      .collect()(0)
    assert(recall.getAs[Long]("hits") >= 45,
      s"recall row: $recall") // 10 queries x 5 -> >= 0.9
    assert(recall.getAs[Double]("recall") >= 0.9)
  }

  test("lshTopK agrees with brute force on an easy clustered corpus") {
    val emb = clustered(nClusters = 4, per = 30)
    val exact = Similarity.bruteForceTopK(emb, queryId = 3L, k = 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(emb, queryId = 3L, k = 5,
      nBits = 4, dim = Dim, probeRadius = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((exact intersect approx).size >= 4)
  }

  test("LSH blocking recalls >= 90% of exact near-dup pairs on clustered data") {
    val emb = clustered(nClusters = 6, per = 30, seed = 21L)
    val exact = Similarity.cosineNearDupPairsExact(emb, threshold = 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.cosineNearDupPairs(emb, threshold = 0.9,
      nBits = Similarity.nBitsFor(180, 64), dim = Dim)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain true near-dups")
    assert(blocked.subsetOf(exact))
    val recall = blocked.size.toDouble / exact.size
    assert(recall >= 0.9, s"blocking recall $recall (${blocked.size}/${exact.size})")
  }

  test("bucketedTopK prunes partitions and matches the in-memory probe") {
    val emb = clustered(nClusters = 4, per = 25)
    val dir = Files.createTempDirectory("graft-bucketed").toString
    Similarity.writeBucketed(emb, dir, nBits = 4, dim = Dim)

    val qvec = emb.filter(col("vec_id") === 0L)
      .select("embedding").collect()(0)
      .getSeq[Float](0).map(_.toDouble)

    val df = Similarity.bucketedTopK(spark, dir, qvec, k = 5,
      nBits = 4, dim = Dim, probeRadius = 1)
    // Partition pruning: the bucket filter must reach the scan as a
    // partition filter, not a post-scan predicate.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("bucket"), plan.take(2000))

    val got = df.collect().map(_.getLong(0))
    assert(got.contains(0L)) // the query vector itself is its own best match
    assert(got.length === 5)
  }

  test("knnJoin recovers each left row's true nearest right neighbor on " +
    "clustered vectors, k-bounded per left id") {
    val emb = clustered(4, 25)
    val left = emb.filter(col("vec_id") % 5 === 0)
    val right = emb.filter(col("vec_id") % 5 =!= 0)
    val knn = Similarity.knnJoin(left, right, k = 3,
      nBits = Similarity.nBitsFor(100, targetBucketSize = 32), dim = Dim)
      .collect()
    val byLeft = knn.groupBy(_.getLong(0))
    assert(byLeft.values.forall(_.length <= 3))
    // exact nearest right neighbor per left row (small test cross join)
    val l = left.select(col("vec_id").as("lid"),
      col("embedding").as("lv"))
    val r = right.select(col("vec_id").as("rid"),
      col("embedding").as("rv"))
    val exact1 = l.crossJoin(r)
      .select(col("lid"), col("rid"),
        (Similarity.dot(col("lv"), col("rv")) /
          (Similarity.norm(col("lv")) * Similarity.norm(col("rv"))))
          .as("score"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lid")
          .orderBy(col("score").desc, col("rid"))))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recovered = exact1.count { case (lid, rid) =>
      byLeft.get(lid).exists(_.exists(_.getLong(1) == rid))
    }
    assert(recovered >= (exact1.size * 0.9).toInt,
      s"$recovered of ${exact1.size} nearest neighbors recovered")
  }

  test("randomProject matches an independent replay of the portable " +
    "sign projection") {
    val emb = clustered(nClusters = 2, per = 5)
    val md = java.security.MessageDigest.getInstance("MD5")
    val s = 1.0 / math.sqrt(4.0)
    def sign(j: Int, i: Int): Double = {
      md.reset()
      if ((md.digest(s"jl|$j|$i".getBytes("UTF-8"))(0) & 0xff) % 2 == 0) s
      else -s
    }
    val expected = emb.collect().map { r =>
      val v = r.getSeq[Float](1)
      r.getLong(0) -> (0 until 4).map { j =>
        val d = (0 until Dim).map(i => v(i).toDouble * sign(j, i)).sum
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    val got = Similarity.randomProject(emb, outDim = 4, dim = Dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toMap
    assert(got === expected)
  }

  test("reducedRerankTopK equals brute force when the candidate pool " +
    "covers the corpus; near-complete recall at candK << n") {
    val emb = clustered(nClusters = 4, per = 30) // n = 120
    // independent exact reference at the operator's own 6-decimal
    // rounding (bruteForceTopK rounds to 4, which flips id ties at the
    // top-k boundary)
    val all = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val q = all.find(_._1 == 3L).get._2
    def dotd(a: Seq[Double], b: Seq[Double]) =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val exact = all.filter(_._1 != 3L).map { case (id, v) =>
      val c = BigDecimal(dotd(v, q) /
          (math.sqrt(dotd(v, v)) * math.sqrt(dotd(q, q))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, c)
    }.sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
    val covered = Similarity.reducedRerankTopK(emb, queryId = 3L, k = 5,
      candK = 119, outDim = 8, dim = Dim)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(covered === exact)
    // 8 reduced dims over a 4-cluster geometry: the true top-5 live in
    // the query's cluster and survive a 20-candidate cut
    val reduced = Similarity.reducedRerankTopK(emb, queryId = 3L, k = 5,
      candK = 20, outDim = 8, dim = Dim)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((exact intersect reduced).size >= 4,
      s"only ${(exact intersect reduced).size} of $exact in $reduced")
  }
}
