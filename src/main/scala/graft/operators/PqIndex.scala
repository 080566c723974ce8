package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the third ANN scale path beside hyperplane
  * LSH ([[Similarity]]) and IVF ([[IvfIndex]]), and the one that changes
  * the MEMORY story: each vector is compressed to `m` sub-codebook codes
  * (m bytes-ish vs 4·dim bytes — 32× at dim=64/m=8/k=16), so the whole
  * candidate scan runs over compact codes and the raw embedding column is
  * touched only for the final exact re-rank of a bounded candidate set.
  * This is the standard IVF-PQ/ADC design (Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * Split of labor:
  *   - TRAIN (driver, one-off): per-block k-means over a deterministic
  *     hash-ordered sample — same bounded-sample discipline as
  *     [[IvfIndex.train]]: no RNG, no global window, TakeOrdered sample,
  *     O(m · k · sample · subdim) driver flops.
  *   - ENCODE (distributed, native codegen'd expression): all m block
  *     argmins in one fused loop per row
  *     ([[graft.functions.PqEncode]] — the vector child is evaluated
  *     once, no slice materialization). Output is one `array<int>`
  *     column; at rest it can be written beside the id and scanned
  *     WITHOUT the embedding.
  *   - SEARCH (distributed, native codegen'd expression): asymmetric
  *     distance computation — the query builds an m×k lookup table of
  *     exact query-sub-block · centroid dot products (driver, tiny),
  *     carried as expression state ([[graft.functions.AdcScore]]); each
  *     row's approximate score is m array reads + one fused
  *     accumulation. Top `refine·k` candidates by approximate
  *     score (TakeOrdered — per-partition top-N, no global sort), then an
  *     exact cosine re-rank over just those rows.
  */
object PqIndex {

  /** Codebooks: codebooks(b)(c) = centroid c of block b (subdim doubles). */
  type Codebooks = Array[Array[Array[Double]]]

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    // Equal lengths are a hard precondition: silently truncating to the
    // shorter vector (the old behavior) lets a ragged corpus train/encode
    // on sliced sub-vectors and produce quietly wrong codebooks.
    require(a.length == b.length,
      s"vector dimension mismatch: ${a.length} vs ${b.length}")
    var s = 0.0; var i = 0
    while (i < a.length) {
      val d = a(i) - b(i); s += d * d; i += 1
    }
    s
  }

  /** Driver-side Lloyd over a bounded sample with farthest-point seeding —
    * deterministic (sample order ties break by position), duplicate-proof
    * (seeding stops when every remaining point coincides with a seed). */
  private def kmeansLocal(points: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(points.nonEmpty, "cannot run k-means on an empty sample")
    val seeds = scala.collection.mutable.ArrayBuffer(points.head)
    val minD = points.map(p => sqDist(p, points.head))
    var exhausted = false
    while (seeds.size < k && seeds.size < points.length && !exhausted) {
      var best = 0; var i = 1
      while (i < points.length) {
        if (minD(i) > minD(best)) best = i
        i += 1
      }
      if (minD(best) == 0.0) exhausted = true
      else {
        seeds += points(best)
        var j = 0
        while (j < points.length) {
          val d = sqDist(points(j), points(best))
          if (d < minD(j)) minD(j) = d
          j += 1
        }
      }
    }
    var centroids = seeds.toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(
        new Array[Double](points.head.length))
      val counts = new Array[Long](centroids.length)
      points.foreach { p =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < centroids.length) {
          val d = sqDist(p, centroids(c))
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    centroids
  }

  /** Train `m` sub-codebooks of `k` centroids each over a deterministic
    * hash-ordered sample (the [[IvfIndex.train]] sampling discipline:
    * pure function of the id, reshuffle-proof, planned as TakeOrdered).
    * `dim` must be divisible by `m`. Training is a one-off. */
  def train(emb: DataFrame, m: Int, k: Int, iters: Int = 5,
      sampleSize: Int = 8192, vecCol: String = "embedding",
      idCol: String = "vec_id"): Codebooks = {
    require(m > 0 && k > 1, "need m >= 1 blocks and k >= 2 codes")
    val sample: Array[Array[Double]] = emb
      .withColumn("h", xxhash64(col(idCol)))
      .orderBy(col("h"), col(idCol))
      .limit(sampleSize)
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train PQ on an empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    Array.tabulate(m) { b =>
      kmeansLocal(sample.map(v => v.slice(b * sub, (b + 1) * sub)), k, iters)
    }
  }

  /** PORTABLE fixed codebooks — block b's entry (c, j) = the md5-derived
    * unit value of "pq|b|c|j" ([[Similarity.portableHyperplanes]] with a
    * per-block salt). Like [[IvfIndex.portableCentroids]], these skip
    * k-means so the ENTIRE ADC path — per-block argmin encoding, LUT
    * scores, candidate cut, exact re-rank — is replayable by an external
    * oracle (q70d/q70e); codebook quality is spec'd separately. */
  def portableCodebooks(m: Int, k: Int, sub: Int): Codebooks =
    Array.tabulate(m)(b => Similarity.portableHyperplanes(k, sub, s"pq|$b|"))

  /** Encode every vector to its `m` block codes: (id, codes array<int>).
    * At rest this is the compact scan column; the raw embedding is only
    * needed again for exact re-ranks. */
  def encode(emb: DataFrame, codebooks: Codebooks,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val vec = col(vecCol).cast("array<double>")
    // One native codegen'd expression for ALL m block argmins
    // ([[graft.functions.PqEncode]]) — the earlier form ran m interpreted
    // `aggregate(array(k structs))` folds over `transform(array(slice(…)))`
    // lambda bindings: m·k struct allocations plus a slice array per
    // block per row, the same interpreted-HOF wall ArgMinCentroid
    // measured at 13-14x (r17), multiplied by m. Scores, first-minimal
    // tie-break, and the per-block -1 sentinel are bit-identical
    // (PqCodegenSpec replays the old algebra).
    //
    // fail at ENCODE time on an unencodable block (r14 review): a NaN
    // component or short vector leaves the -1 sentinel, which would
    // persist silently into the at-rest code layout and kill every
    // later ADC query far from the bad input. The guard runs as a
    // `transform` over the ALREADY-BUILT m-int code array — a lambda
    // binds each code once, m comparisons per row — not as a per-block
    // when(c === -1, …).otherwise(c), whose else-branch re-embeds the
    // whole argmin (the r14 PQ-family quiet drift — r14 verdict #5).
    val raw = graft.functions.VectorFunctions.vecPqEncode(vec, codebooks)
    emb.select(col(idCol),
      transform(raw, c =>
        when(c === -1, raise_error(lit(
          "PqIndex: unencodable embedding (NaN component or dimension " +
            s"< ${m * sub})")).cast("int"))
          .otherwise(c)).as("codes"))
  }

  /** Candidate selection over a code relation: approximate cosine from
    * m×k lookup tables (exact query-block · centroid dots and centroid
    * norms², computed driver-side and entered as literals — the
    * broadcast-side-table pattern), TakeOrdered top `n` — the full
    * corpus is never sorted. */
  /** Approximate-cosine expression over a `codes` column for one query:
    * m×k lookup tables (exact query-block · centroid dots and centroid
    * norms², computed driver-side and entered as literals — the
    * broadcast-side-table pattern), m array reads + a fold per row. */
  private def adcScore(codebooks: Codebooks, queryVec: Array[Double])
      : Column = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    require(queryVec.length == m * sub,
      s"query dim ${queryVec.length} != m*sub ${m * sub}")
    val lutDot: Seq[Seq[Double]] = (0 until m).map { b =>
      val qb = queryVec.slice(b * sub, (b + 1) * sub)
      codebooks(b).toIndexedSeq.map(c =>
        c.iterator.zip(qb.iterator).map { case (x, y) => x * y }.sum)
    }
    val lutN2: Seq[Seq[Double]] = (0 until m).map { b =>
      codebooks(b).toIndexedSeq.map(c => c.map(x => x * x).sum)
    }
    val qNorm = math.sqrt(queryVec.map(x => x * x).sum)
    // One native codegen'd expression ([[graft.functions.AdcScore]]):
    // the earlier form ran TWO interpreted `aggregate(zip_with(codes,
    // lit(lut), …))` folds per row — each allocating a zipped
    // intermediate array and re-reading `codes` — then divided. Same
    // block-order left-to-right sums and the same final
    // `dot / (sqrt(n2) · qNorm)` operation order, so scores are
    // bit-equal (PqCodegenSpec replays the old algebra).
    graft.functions.VectorFunctions.vecAdcScore(
      col("codes"), lutDot, lutN2, qNorm)
  }

  private def adcCandidates(codes: DataFrame, codebooks: Codebooks,
      queryVec: Array[Double], n: Int, idCol: String): DataFrame =
    codes
      .select(col(idCol),
        adcScore(codebooks, queryVec).as("approx_score"))
      .orderBy(col("approx_score").desc, col(idCol))
      .limit(n)

  /** Exact cosine re-rank of a (small, broadcast) candidate id set. */
  private def rerank(emb: DataFrame, cands: DataFrame,
      queryVec: Array[Double], k: Int, vecCol: String, idCol: String)
      : DataFrame = {
    val qLit = typedLit(queryVec.toSeq)
    val qNorm = math.sqrt(queryVec.map(x => x * x).sum)
    emb.join(broadcast(cands.select(idCol)), Seq(idCol))
      .select(col(idCol),
        round(Similarity.dot(col(vecCol).cast("array<double>"), qLit) /
          (Similarity.norm(col(vecCol)) * lit(qNorm)), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** ADC top-k: approximate scores over codes (m lookup-table reads per
    * row), exact cosine re-rank of the best `refine · k` candidates —
    * the embedding column is read only for the candidate re-rank (a
    * broadcast semi-join at corpus scale). */
  def adcTopK(emb: DataFrame, codebooks: Codebooks,
      queryVec: Array[Double], k: Int, refine: Int = 10,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(k > 0 && refine >= 1)
    val cands = adcCandidates(encode(emb, codebooks, vecCol, idCol),
      codebooks, queryVec, k * refine, idCol)
    rerank(emb, cands, queryVec, k, vecCol, idCol)
  }

  /** Materialize the code column at rest beside the id — the compact
    * search copy of the corpus (m ints vs 4·dim bytes per vector). The
    * ADC scan then reads THIS table only; raw embeddings are touched for
    * the final re-rank rows alone. */
  def writeEncoded(emb: DataFrame, path: String, codebooks: Codebooks,
      vecCol: String = "embedding", idCol: String = "vec_id"): Unit =
    encode(emb, codebooks, vecCol, idCol)
      .write.mode("overwrite").parquet(path)

  /** ADC top-k over a [[writeEncoded]] layout: approximate scores scan
    * only the (id, codes) parquet — column pruning keeps the raw
    * embedding table out of the candidate pass entirely; `emb` is read
    * just for the broadcast-candidate exact re-rank. */
  def encodedTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      emb: DataFrame, codebooks: Codebooks, queryVec: Array[Double],
      k: Int, refine: Int = 10, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    require(k > 0 && refine >= 1)
    val cands = adcCandidates(spark.read.parquet(path), codebooks, queryVec,
      k * refine, idCol)
    rerank(emb, cands, queryVec, k, vecCol, idCol)
  }

  /** Measured ADC recall vs brute force over a query-id panel, with the
    * scanned candidate fraction alongside (recall without cost is
    * meaningless — the q44 discipline). ONE code scan computes every
    * query's approximate score (per-query LUT literals inside one
    * exploded struct array); candidate cut and exact re-rank run as
    * qid-partitioned window top-k.
    *
    * @return one row: (n_queries, k, refine, recall, cand_fraction)
    */
  def adcRecall(emb: DataFrame, codebooks: Codebooks, queryIds: Seq[Long],
      k: Int, refine: Int = 10, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = queryIds.map(java.lang.Long.valueOf)
    val qVecs = emb.filter(col(idCol).isin(ids: _*))
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val queries = emb.filter(col(idCol).isin(ids: _*))
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        Similarity.norm(col(vecCol)).as("qn"))
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col(idCol))

    val bfTop = emb
      .select(col(idCol), col(vecCol), Similarity.norm(col(vecCol)).as("n"))
      .crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        (Similarity.dot(col(vecCol), col("qvec")) / (col("n") * col("qn")))
          .as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", idCol)

    val scored = encode(emb, codebooks, vecCol, idCol)
      .select(col(idCol), explode(array(qVecs.map { case (qid, qv) =>
        struct(lit(qid).as("qid"), adcScore(codebooks, qv).as("score"))
      }: _*)).as("s"))
      .select(col(idCol), col("s.qid").as("qid"), col("s.score").as("score"))
      .filter(col(idCol) =!= col("qid"))
    val cands = scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k * refine)
      .select("qid", idCol)
    val pqTop = cands
      .join(emb.select(col(idCol), col(vecCol),
        Similarity.norm(col(vecCol)).as("n")), Seq(idCol))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col(idCol),
        (Similarity.dot(col(vecCol), col("qvec")) / (col("n") * col("qn")))
          .as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", idCol)

    // cut: bfTop (the n x |queries| cross-join + window — the
    // dominant cost of every recall metric) feeds BOTH the denominator
    // count and the hits join; without it the whole lineage executed
    // twice (r14 review)
    val bfCut = Materialize.cut(bfTop)
    val denom = bfCut.count()
    val hits = bfCut.join(pqTop, Seq("qid", idCol), "left_semi").count()
    val n = emb.count()
    val sparkSession = emb.sparkSession
    import sparkSession.implicits._
    Seq((queryIds.size, k, refine,
      if (denom == 0) 0.0 else math.rint(hits.toDouble / denom * 10000) / 10000,
      math.rint(math.min(1.0, k.toDouble * refine / n) * 10000) / 10000))
      .toDF("n_queries", "k", "refine", "recall", "cand_fraction")
  }

  /** IVF-PQ search — the canonical billion-scale ANN composition
    * (FAISS's default): the IVF coarse quantizer prunes the corpus to
    * `nProbe` inverted lists, PQ/ADC scores only those lists' compact
    * codes, and the best `refine · k` candidates are exact-re-ranked.
    * Scan cost ≈ (nProbe/kCoarse) of the corpus, over m-int codes
    * instead of raw vectors — the two reductions compose
    * multiplicatively. At rest this runs over
    * [[IvfIndex.writeClustered]]-partitioned codes, pruning at the
    * scan. */
  def ivfAdcTopK(emb: DataFrame, centroids: Array[Array[Double]],
      codebooks: Codebooks, queryVec: Array[Double], k: Int,
      nProbe: Int, refine: Int = 10, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    require(k > 0 && refine >= 1 && nProbe > 0)
    val probes = IvfIndex.probeClusters(queryVec, centroids, nProbe)
    val probed = emb.join(
      IvfIndex.assignments(emb, centroids, vecCol, idCol)
        .filter(col("cluster").isin(probes.map(Integer.valueOf): _*))
        .select(idCol),
      Seq(idCol), "left_semi")
    val cands = adcCandidates(encode(probed, codebooks, vecCol, idCol),
      codebooks, queryVec, k * refine, idCol)
    rerank(emb, cands, queryVec, k, vecCol, idCol)
  }

  /** Convenience: ADC top-k for an in-corpus query id (excluded from the
    * result, like [[Similarity.bruteForceTopK]]). */
  def topK(emb: DataFrame, codebooks: Codebooks, queryId: Long, k: Int,
      refine: Int = 10, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val qRows = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).collect()
    require(qRows.nonEmpty, s"PqIndex.topK: query id $queryId not found")
    val qVec = qRows(0).getSeq[Double](0).toArray
    adcTopK(emb.filter(col(idCol) =!= queryId), codebooks, qVec, k, refine,
      vecCol, idCol)
  }
}
