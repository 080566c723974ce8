package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path beside hyperplane LSH: a k-means coarse quantizer assigns every
  * vector to its nearest centroid; a query probes only the `nProbe`
  * nearest inverted lists and re-ranks those candidates exactly.
  *
  * Everything distributed is Column algebra over the native
  * [[graft.functions.DotProduct]]:
  *   - assignment folds an array of (distance, cluster) structs with a
  *     lambda-bound `aggregate` (each centroid distance computed once);
  *   - Lloyd recentering is posexplode → mean per (cluster, dimension) →
  *     re-collect — one shuffle per iteration, keyed by (cluster, dim);
  *   - centroids themselves live on the driver (k × dim doubles — tiny)
  *     and enter the plan as literals, like the reference's broadcast
  *     side tables.
  * Initialization is a deterministic hash-ordered sample (no RNG in the
  * engine, no global window). At rest, `assignments` is the partition/bucket key
  * the corpus is laid out by (same story as `Similarity.writeBucketed`).
  */
object IvfIndex {

  /** Argmin-centroid assignment column: the cluster index minimizing
    * dist² = |v|² - 2 v·c + |c|² (|v|² constant per row, so the compare
    * key is -2 v·c + |c|²). One native codegen'd expression
    * ([[graft.functions.ArgMinCentroid]]) — the earlier
    * `aggregate(array(k structs))` fold was an interpreted higher-order
    * function that also re-evaluated `vec` once per centroid (no CSE
    * outside whole-stage codegen): the streaming ingest leg measured
    * ~42k rows/s THREAD-INDEPENDENT at k=64/dim=64, the signature of an
    * interpreter/allocation wall, not flops. Same scores bit-for-bit,
    * same first-minimal tie-break, same -1 sentinel on NaN/mismatch/
    * NULL. */
  private def assignCol(vec: Column, centroids: Array[Array[Double]])
      : Column =
    graft.functions.VectorFunctions.vecArgMinCentroid(vec, centroids)

  /** Cluster id of `vec`, FAILING LOUDLY on an unassignable embedding
    * (r14 review): a NaN component — Spark orders NaN above everything,
    * so no centroid ever wins the argmin — or a dimension mismatch
    * (NULL dot) left the fold's -1 sentinel, which crashed [[train]]
    * with a bare index error, was baked silently into the at-rest
    * clustered layout, and made the row vanish from every probe path. */
  private def clusterCol(vec: Column, centroids: Array[Array[Double]])
      : Column = {
    val c = assignCol(vec, centroids)
    when(c === -1, raise_error(lit(
      "IvfIndex: unassignable embedding (NaN component or dimension != " +
        s"${centroids.head.length})")).cast("int"))
      .otherwise(c)
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    require(a.length == b.length,
      s"vector dimension mismatch: ${a.length} vs ${b.length}")
    var s = 0.0; var i = 0
    while (i < a.length) {
      val d = a(i) - b(i); s += d * d; i += 1
    }
    s
  }

  /** Lloyd's algorithm; returns k × dim centroids (driver-side).
    *
    * Deterministic, scale-safe init (replaces round-2's `row_number()`
    * over an unpartitioned Window, which collapsed the corpus into one
    * task): take the 8k vectors with the SMALLEST `xxhash64(id)` — a
    * seedless pseudo-random sample, reshuffle-proof because it is a pure
    * function of the id (same trick as `TextAnalysis.hashSplit`), planned
    * as TakeOrdered (per-partition top-N, driver merges 8k rows — no
    * global window, no extra count pass) — then farthest-point (k-center)
    * seeding over that sample on the driver, so seeds cannot collapse
    * into one dense region the way a plain k-sample can. Driver cost is
    * O(k · 8k · dim) flops on a bounded sample; training is a one-off. */
  def train(emb: DataFrame, k: Int, iters: Int = 5,
      vecCol: String = "embedding", idCol: String = "vec_id")
      : Array[Array[Double]] = {
    val sample: Array[Array[Double]] = emb
      .withColumn("h", xxhash64(col(idCol)))
      .orderBy(col("h"), col(idCol))
      .limit(math.max(k * 8, k))
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train IVF on an empty corpus")
    val seeds = scala.collection.mutable.ArrayBuffer(sample.head)
    val minD = sample.map(v => sqDist(v, sample.head))
    var exhausted = false
    while (seeds.size < k && seeds.size < sample.length && !exhausted) {
      // Farthest point from the chosen seeds; ties break on sample
      // (hash, id) order via the strict `>`, keeping init deterministic.
      var best = 0; var i = 1
      while (i < sample.length) {
        if (minD(i) > minD(best)) best = i
        i += 1
      }
      if (minD(best) == 0.0) {
        // Every remaining sample point coincides with a chosen seed:
        // appending more would duplicate centroids (and leave empty
        // clusters in Lloyd). Return the fewer distinct centroids.
        exhausted = true
      } else {
        seeds += sample(best)
        i = 0
        while (i < sample.length) {
          val d = sqDist(sample(i), sample(best))
          if (d < minD(i)) minD(i) = d
          i += 1
        }
      }
    }
    var centroids: Array[Array[Double]] = seeds.toArray
    var it = 0
    while (it < iters) {
      val assigned = emb.select(
        col(vecCol),
        clusterCol(col(vecCol), centroids).as("cluster"))
      val means = assigned
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(avg("x").as("m"))
        .groupBy("cluster")
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("dims"))
        .select(col("cluster"),
          expr("transform(dims, d -> d.m)").as("centroid"))
        .collect()
      val next = centroids.clone()
      means.foreach { r =>
        next(r.getInt(0)) = r.getSeq[Double](1).toArray
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** PORTABLE fixed centroids — component (c, j) = the md5-derived unit
    * value of "ivf|c|j" ([[Similarity.portableHyperplanes]] with an "ivf|"
    * salt), reproducible in any engine with md5. These skip k-means
    * entirely: they exist so the ENTIRE IVF query path — argmin cluster
    * assignment, nProbe centroid selection, pruned-candidate re-rank —
    * can be replayed value-for-value by an external oracle (q45b), the
    * q42b discipline applied to the coarse quantizer. Training quality is
    * orthogonal and spec'd separately ([[train]] determinism +
    * IvfIndexSpec recall). */
  def portableCentroids(k: Int, dim: Int): Array[Array[Double]] =
    Similarity.portableHyperplanes(k, dim, "ivf|")

  /** The inverted file: (id, cluster) assignments under `centroids`. */
  def assignments(emb: DataFrame, centroids: Array[Array[Double]],
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    emb.select(col(idCol),
      clusterCol(col(vecCol), centroids).as("cluster"))

  /** SemDedup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): drop all-but-one of any embedding pair whose
    * cosine ≥ `tau`, with candidate pairs generated ONLY within a coarse
    * k-means cluster — the clusters bound the quadratic term, the same
    * role LSH bands play for MinHash. Keeper is the lower id (a total
    * order; deterministic and portable).
    *
    * Scale: one assignment pass (codegen'd argmin over broadcast-literal
    * centroids), then a cluster-keyed self-join — per-cluster work is
    * |cluster|², never |corpus|²; k grows with the corpus (the
    * [[Similarity.nBitsFor]] sizing story) to hold cluster sizes flat.
    * With [[portableCentroids]] the whole decision — assignment, pair
    * cosines, drop set — replays in an external oracle (q85).
    *
    * @return surviving (idCol, cluster) rows */
  def semanticDedup(emb: DataFrame, centroids: Array[Array[Double]],
      tau: Double, vecCol: String = "embedding", idCol: String = "vec_id")
      : DataFrame = {
    // cut: assigned feeds BOTH self-join sides and the final left_anti
    // with different projections, so without it the k-dot-products
    // argmin fold ran three full corpus passes per call (r14 review) —
    // the doc's "one assignment pass" made true
    val assigned = Materialize.cut(emb.select(col(idCol), col(vecCol))
      .withColumn("cluster",
        clusterCol(col(vecCol), centroids))
      .withColumn("nrm", Similarity.norm(col(vecCol))))
    val a = assigned.select(col("cluster"), col(idCol).as("id_a"),
      col(vecCol).as("va"), col("nrm").as("na"))
    val b = assigned.select(col("cluster"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("nrm").as("nb"))
    val drops = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .filter(Similarity.dot(col("va"), col("vb")) /
        (col("na") * col("nb")) >= tau)
      .select(col("id_b").as(idCol)).distinct()
    assigned.join(drops, Seq(idCol), "left_anti")
      .select(col(idCol), col("cluster"))
  }

  /** nProbe nearest centroid ids to a query vector (driver-side; k is
    * small by construction). */
  def probeClusters(queryVec: Array[Double],
      centroids: Array[Array[Double]], nProbe: Int): Seq[Int] = {
    // the zip would silently TRUNCATE a mismatched query and probe the
    // wrong lists (the distributed side fails loudly on mismatch; the
    // driver twin must too — r14 review)
    require(queryVec.length == centroids.head.length,
      s"query dim ${queryVec.length} != centroid dim " +
        s"${centroids.head.length}")
    centroids.zipWithIndex.map { case (c, i) =>
      val d = c.iterator.zip(queryVec.iterator)
        .map { case (a, b) => (a - b) * (a - b) }.sum
      (d, i)
    }.sortBy(_._1).take(nProbe).map(_._2).toSeq
  }

  /** `emb` plus its `cluster` assignment column — the reusable
    * projection behind [[writeClustered]] and the streaming ingest
    * ([[graft.streaming.VecStreams]]). Pure map under broadcast-literal
    * centroids: no shuffle, codegen'd argmin fold. */
  def withCluster(emb: DataFrame, centroids: Array[Array[Double]],
      vecCol: String = "embedding"): DataFrame =
    emb.withColumn("cluster",
      clusterCol(col(vecCol), centroids))

  /** Materialize the corpus partitioned BY CLUSTER — the IVF inverted
    * lists as an at-rest layout (the k-means analog of
    * [[Similarity.writeBucketed]]). A probe then reads only the `nProbe`
    * probed clusters' directories: partition pruning at the scan, no full
    * pass, no assignment recompute at query time. */
  def writeClustered(emb: DataFrame, path: String,
      centroids: Array[Array[Double]], vecCol: String = "embedding",
      idCol: String = "vec_id"): Unit =
    withCluster(emb, centroids, vecCol)
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** IVF top-k over a [[writeClustered]] layout: the probe list is a
    * literal IN filter on the partition column, so Catalyst prunes to the
    * probed inverted lists before any I/O; candidates are exact-cosine
    * re-ranked. */
  def clusteredTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      queryVec: Array[Double], centroids: Array[Array[Double]], k: Int,
      nProbe: Int, vecCol: String = "embedding", idCol: String = "vec_id")
      : DataFrame = {
    val probes = probeClusters(queryVec, centroids, nProbe)
    val qLit = typedLit(queryVec.toSeq)
    val qNorm = math.sqrt(queryVec.map(x => x * x).sum)
    spark.read.parquet(path)
      .filter(col("cluster").isin(probes.map(Integer.valueOf): _*))
      .select(col(idCol),
        round(Similarity.dot(col(vecCol), qLit) /
          (Similarity.norm(col(vecCol)) * lit(qNorm)), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** IVF top-k: probe the query's `nProbe` inverted lists, exact-cosine
    * re-rank inside them. Scan cost ≈ nProbe/k of the corpus. */
  def topK(emb: DataFrame, centroids: Array[Array[Double]], queryId: Long,
      k: Int, nProbe: Int, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val qRows = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).collect()
    require(qRows.nonEmpty, s"IvfIndex.topK: query id $queryId not found")
    val qVec = qRows(0).getSeq[Double](0).toArray
    val probes = probeClusters(qVec, centroids, nProbe)
    val assigned = assignments(emb, centroids, vecCol, idCol)
    val qLit = typedLit(qVec.toSeq)
    val qNorm = math.sqrt(qVec.map(x => x * x).sum)
    emb.join(assigned.filter(col("cluster")
        .isin(probes.map(Integer.valueOf): _*)), idCol)
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        round(Similarity.dot(col(vecCol), qLit) /
          (Similarity.norm(col(vecCol)) * lit(qNorm)), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
