package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - brute-force cosine top-k: one narrow map + TakeOrdered — the exact
  *     baseline, linear in corpus size, no shuffle of the vectors;
  *   - LSH-bucketed (random hyperplane signs): probe only the query's
  *     bucket — the 100 TB path where scanning every vector is off-limits.
  *
  * All arithmetic is `zip_with`/`aggregate` Column algebra in double
  * precision — codegen'd, no UDFs, deterministic summation order.
  */
object Similarity {

  /** Dot product of two array<numeric> columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k against the embedding of `queryId`.
    * The 1-row query side is broadcast; ordering is (rounded score desc, id)
    * so results are stable across partitionings. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(cosine(col(vecCol), col("qvec")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  // --- LSH (random hyperplane) -------------------------------------------

  /** Deterministic pseudo-random hyperplanes: `nBits` planes × `dim`,
    * values from a fixed-seed generator. Returned as a literal column so
    * the signature computation is pure expression algebra. */
  private[operators] def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L)
      : Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** Sign-bit signature of a vector under the fixed hyperplanes → int
    * bucket id in [0, 2^nBits). */
  def lshBucket(vec: Column, nBits: Int, dim: Int): Column = {
    val planes = hyperplanes(nBits, dim)
    (0 until nBits).map { i =>
      val plane = typedLit(planes(i).toSeq)
      when(dot(vec, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** All XOR masks over `nBits` bits with at most `r` bits set — the
    * multi-probe neighborhood of a bucket. */
  private[operators] def probeMasks(nBits: Int, r: Int): Seq[Long] =
    (0L until (1L << nBits)).filter(java.lang.Long.bitCount(_) <= r)

  /** Approximate top-k with multi-probe LSH: hash all vectors to hyperplane
    * buckets, probe every bucket within Hamming distance `probeRadius` of
    * the query's bucket. Multi-probe trades a small constant fan-out
    * (Σ C(nBits,i), i≤r buckets) for recall, instead of lowering nBits and
    * inflating every bucket. At scale `bucket` is a partition/bucketing key,
    * so the probe touches a handful of partitions, not the corpus. */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, nBits: Int, dim: Int,
      probeRadius: Int = 2, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val bucketed = emb.withColumn("bucket",
      lshBucket(col(vecCol), nBits, dim))
    val masks = probeMasks(nBits, probeRadius)
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"),
        explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*))
          .as("bucket"))
    bucketed.join(broadcast(q), "bucket")
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        round(cosine(col(vecCol), col("qvec")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, bucketed by
    * LSH so the pair join is per-bucket (not all-pairs). */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double, nBits: Int,
      dim: Int, vecCol: String = "embedding", idCol: String = "vec_id")
      : DataFrame = {
    val bucketed = emb.withColumn("bucket",
      lshBucket(col(vecCol), nBits, dim))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("vec_a"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("vec_a"), col("vec_b")), 4).as("score"))
      .filter(col("score") >= threshold)
      .distinct()
  }
}
