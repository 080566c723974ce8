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

  /** Dot product of two array<float|double> columns in double precision —
    * a native codegen'd expression ([[graft.functions.DotProduct]]); the
    * `zip_with`+`aggregate` HOF form is interpreted and allocates an
    * intermediate array per row, which dominates in per-pair loops. Same
    * sequential accumulation order, so scores are bit-equal. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k against the embedding of `queryId`.
    * The 1-row query side is broadcast; ordering is (rounded score desc, id)
    * so results are stable across partitionings. Norms are computed once
    * per side, not per pair — cosine(a,b) inline would redo both norms for
    * every candidate. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"), norm(col(vecCol)).as("qn"))
    emb.filter(col(idCol) =!= queryId)
      .select(col(idCol), col(vecCol), norm(col(vecCol)).as("n"))
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(dot(col(vecCol), col("qvec")) / (col("n") * col("qn")), 4)
          .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  // --- LSH (random hyperplane) -------------------------------------------

  /** Bucket-count sizing: nBits so the EXPECTED bucket population stays
    * near `targetBucketSize` as the corpus grows — nBits ≈ log₂(n/target).
    * A fixed nBits is a scale bug: with 2^8 buckets, per-bucket work is
    * O(n/256) and the bucketed pair join O((n/256)²) — quadratic death at
    * 10⁹ vectors. Clamped to [4, 24] (16 buckets … 16M buckets). */
  def nBitsFor(n: Long, targetBucketSize: Int = 64): Int = {
    val ratio = math.max(1.0, n.toDouble / targetBucketSize)
    math.min(24, math.max(4, math.ceil(math.log(ratio) / math.log(2)).toInt))
  }

  /** Deterministic pseudo-random hyperplanes: `nBits` planes × `dim`,
    * values from a fixed-seed generator. Returned as a literal column so
    * the signature computation is pure expression algebra. */
  private[operators] def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L)
      : Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rnd.nextGaussian())
  }

  /** PORTABLE hyperplanes: component (i, j) = first 8 md5 hex digits of
    * "i|j" scaled to [-1, 1) — uniform instead of Gaussian (any
    * 0-symmetric component distribution gives unbiased sign hashing),
    * and reproducible in any engine with md5 (`('0x' ||
    * substr(md5(i || '|' || j), 1, 8))::BIGINT / 2^31 - 1` in DuckDB),
    * which is what lets an external oracle replay the exact bucket
    * assignment — see q42b. Both engines evaluate the dot sequentially
    * in double (native DotProduct here, `list_dot_product` there), so
    * the sign decisions match bit-for-bit. */
  private[operators] def portableHyperplanes(nBits: Int, dim: Int,
      salt: String = ""): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nBits, dim) { (i, j) =>
      md.reset()
      val hex = md.digest(s"$salt$i|$j".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 2147483648.0 - 1.0
    }
  }

  /** Sign-bit signature of a vector under the fixed hyperplanes → int
    * bucket id in [0, 2^nBits). Distinct `seed`s give independent LSH
    * functions (bands); `portable = true` swaps in the md5-derived
    * planes (seed ignored; independent bands come from `portableSalt`,
    * e.g. "1|" per band) so the assignment is oracle-reproducible. */
  def lshBucket(vec: Column, nBits: Int, dim: Int, seed: Long = 42L,
      portable: Boolean = false, portableSalt: String = ""): Column = {
    val planes =
      if (portable) portableHyperplanes(nBits, dim, portableSalt)
      else hyperplanes(nBits, dim, seed)
    (0 until nBits).map { i =>
      val plane = typedLit(planes(i).toSeq)
      when(dot(vec, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** All XOR masks over `nBits` bits with at most `r` bits set — the
    * multi-probe neighborhood of a bucket. Generated combinatorially
    * (Σ C(nBits,i), i ≤ r masks): enumerating-and-filtering all 2^nBits
    * values would spin the driver through 16.7M candidates at the
    * nBits=24 clamp to find ~300 masks. */
  private[operators] def probeMasks(nBits: Int, r: Int): Seq[Long] = {
    def combos(from: Int, k: Int): Seq[Long] =
      if (k == 0) Seq(0L)
      else (from until nBits).flatMap { b =>
        combos(b + 1, k - 1).map(_ | (1L << b))
      }
    (0 to math.min(r, nBits)).flatMap(k => combos(0, k))
  }

  /** Approximate top-k with multi-probe LSH: hash all vectors to hyperplane
    * buckets, probe every bucket within Hamming distance `probeRadius` of
    * the query's bucket. Multi-probe trades a small constant fan-out
    * (Σ C(nBits,i), i≤r buckets) for recall, instead of lowering nBits and
    * inflating every bucket. At scale `bucket` is a partition/bucketing key,
    * so the probe touches a handful of partitions, not the corpus. */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, nBits: Int, dim: Int,
      probeRadius: Int = 2, vecCol: String = "embedding",
      idCol: String = "vec_id", portable: Boolean = false): DataFrame = {
    val bucketed = emb.withColumn("bucket",
      lshBucket(col(vecCol), nBits, dim, portable = portable))
    val masks = probeMasks(nBits, probeRadius)
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"), norm(col(vecCol)).as("qn"),
        explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*))
          .as("bucket"))
    bucketed.join(broadcast(q), "bucket")
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        round(dot(col(vecCol), col("qvec")) /
          (norm(col(vecCol)) * col("qn")), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Measured ANN recall vs the exact answer, computed in-engine: for each
    * query id, |LSH top-k ∩ brute-force top-k| / k, averaged. One output
    * row (n_queries, k, hits, recall). This is the check that keeps the
    * approximate path honest without a cross-engine oracle (the
    * hyperplanes are engine-internal). Cost is bounded by the sample:
    * |queries| × n cosines on the exact side. */
  def annRecall(emb: DataFrame, queryIds: Seq[Long], k: Int, nBits: Int,
      dim: Int, probeRadius: Int = 2, vecCol: String = "embedding",
      idCol: String = "vec_id", portable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = queryIds.map(java.lang.Long.valueOf)
    val queries = emb.filter(col(idCol).isin(ids: _*))
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        norm(col(vecCol)).as("qn"))
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col(idCol))

    val bfTop = emb
      .select(col(idCol), col(vecCol), norm(col(vecCol)).as("n"))
      .crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        (dot(col(vecCol), col("qvec")) / (col("n") * col("qn"))).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", idCol)

    val bucketed = emb
      .withColumn("bucket",
        lshBucket(col(vecCol), nBits, dim, portable = portable))
      .withColumn("nrm", norm(col(vecCol)))
    val masks = probeMasks(nBits, probeRadius)
    val qProbes = bucketed.filter(col(idCol).isin(ids: _*))
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        col("nrm").as("qn"),
        explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*))
          .as("bucket"))
    val lshTop = bucketed.join(broadcast(qProbes), "bucket")
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        (dot(col(vecCol), col("qvec")) / (col("nrm") * col("qn"))).as("score"))
      // NO distinct: each corpus row has exactly one bucket and the
      // probe set {qbucket XOR m} is pairwise distinct (XOR with a
      // fixed bucket is a bijection over the distinct masks), so
      // multi-probe CANNOT reach a candidate twice — the old distinct
      // (with a comment claiming otherwise) shuffled the corpus-scale
      // candidate set for nothing; lshTopK never had one
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", idCol)

    // cut: bfTop (the n x |queries| cross-join + window — the
    // dominant cost of every recall metric) feeds BOTH the denominator
    // count and the hits join; without it the whole lineage executed
    // twice (r14 review)
    val bfCut = Materialize.cut(bfTop)
    val denom = bfCut.count()
    // Cost transparency: recall means nothing without the probed fraction
    // (probing every bucket is brute force with extra steps).
    val probedFrac = masks.size.toDouble / (1L << nBits)
    bfCut.join(lshTop, Seq("qid", idCol))
      .agg(count(lit(1)).as("hits"))
      .select(lit(queryIds.size).as("n_queries"), lit(k).as("k"),
        col("hits"),
        round(col("hits") / lit(math.max(denom, 1L).toDouble), 4).as("recall"),
        round(lit(probedFrac), 4).as("probed_frac"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, bucketed by
    * LSH so the pair join is per-bucket (not all-pairs).
    *
    * `bands` independent hyperplane sets fix single-block recall: a
    * 0.9-cosine pair collides in ONE nBits-bit block with probability
    * p = (1-θ/π)^nBits, but in at least one of b bands with 1-(1-p)^b —
    * the same band construction MinHash-LSH uses. Candidates are unioned
    * and deduped BEFORE scoring, so each surviving pair pays one dot
    * product regardless of how many bands found it. */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double, nBits: Int,
      dim: Int, bands: Int = 4, vecCol: String = "embedding",
      idCol: String = "vec_id", portable: Boolean = false): DataFrame = {
    val candidates = (0 until bands).map { band =>
      val bucketed = emb.select(col(idCol),
        lshBucket(col(vecCol), nBits, dim, seed = 42L + band,
          portable = portable, portableSalt = s"$band|").as("bucket"))
      val a = bucketed.select(col("bucket"), col(idCol).as("id_a"))
      val b = bucketed.select(col("bucket"), col(idCol).as("id_b"))
      a.join(b, Seq("bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
    }.reduce(_ union _).distinct()
    // Norms once per ROW; each candidate pair pays exactly one dot.
    val withNorm = emb.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("nrm"))
    candidates
      .join(withNorm.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
        col("nrm").as("n_a")), "id_a")
      .join(withNorm.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
        col("nrm").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(dot(col("vec_a"), col("vec_b")) / (col("n_a") * col("n_b")), 4)
          .as("score"))
      .filter(col("score") >= threshold)
  }

  /** EXACT near-duplicate pairs — the all-pairs baseline the LSH-blocked
    * [[cosineNearDupPairs]] approximates. O(n²) pairs: correct tool for
    * small candidate sets (a bucket, a cluster, a sample), the oracle
    * anchor for the blocked form, and never the corpus-scale path. */
  /** Set-to-set k-NN JOIN: for every left row, its top-`k` right rows by
    * exact cosine among LSH-banded candidates — the retrieval join
    * (query-batch → corpus alignment, dedup-against-reference-set) at
    * corpus scale. Candidate pairs are bucket-local per band (cost
    * Σ |bucketL|·|bucketR|, never |L|·|R|), every candidate is scored
    * exactly once (norms precomputed per row), and the cut is a
    * per-left-id window top-k (WindowGroupLimit — map-side top-k before
    * the shuffle). Left rows sharing no bucket with any right row emit
    * nothing; blocking recall is the measured tradeoff, spec-asserted on
    * clustered vectors.
    */
  def knnJoin(left: DataFrame, right: DataFrame, k: Int, nBits: Int,
      dim: Int, bands: Int = 4, vecCol: String = "embedding",
      idCol: String = "vec_id", portable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && bands > 0)
    val candidates = (0 until bands).map { band =>
      val lb = left.select(col(idCol).as("left_id"),
        lshBucket(col(vecCol), nBits, dim, seed = 42L + band,
          portable = portable, portableSalt = s"$band|").as("bucket"))
      val rb = right.select(col(idCol).as("right_id"),
        lshBucket(col(vecCol), nBits, dim, seed = 42L + band,
          portable = portable, portableSalt = s"$band|").as("bucket"))
      lb.join(rb, Seq("bucket")).select("left_id", "right_id")
    }.reduce(_ union _).distinct()
    val l = left.select(col(idCol).as("left_id"), col(vecCol).as("lvec"),
      norm(col(vecCol)).as("ln"))
    val r = right.select(col(idCol).as("right_id"), col(vecCol).as("rvec"),
      norm(col(vecCol)).as("rn"))
    val w = Window.partitionBy("left_id")
      .orderBy(col("score").desc, col("right_id"))
    candidates.join(l, "left_id").join(r, "right_id")
      .select(col("left_id"), col("right_id"),
        round(dot(col("lvec"), col("rvec")) / (col("ln") * col("rn")), 4)
          .as("score"))
      .withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
  }

  def cosineNearDupPairsExact(emb: DataFrame, threshold: Double,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    // O(n²) dot products against an O(n)-row input: the stream side of
    // the broadcast nested-loop join bounds parallelism, and a few-split
    // source caps it at its row groups. Fan the stream side out to the
    // cluster's cores — the row shuffle is noise against the pairwise
    // compute it spreads.
    val withNorm = emb.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("nrm"))
    val a = Materialize.fanOut(withNorm)
      .select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
        col("nrm").as("n_a"))
    val b = withNorm.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      col("nrm").as("n_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("vec_a"), col("vec_b")) / (col("n_a") * col("n_b")), 4)
          .as("score"))
      .filter(col("score") >= threshold)
  }

  /** Semantic decontamination: flag every corpus document whose embedding
    * is too close (cosine ≥ `tau`) to ANY held-out/eval embedding — the
    * embedding-space sibling of the n-gram decontamination (q49/q91):
    * n-grams catch verbatim leakage, cosine catches paraphrased leakage.
    *
    * Scale shape: the eval set is SMALL by definition (thousands of
    * items against a billions-row corpus), so the right plan is a
    * broadcast nested-loop over the eval side — cost is linear in the
    * corpus with a bounded constant, never corpus×corpus. The per-doc
    * reduction is a `max` aggregate keyed by the corpus id (map-side
    * combined). For an eval set too big to broadcast, compose
    * [[knnJoin]] instead (LSH-bucketed) — documented trade, not needed
    * at sane eval sizes.
    *
    * @return one row per corpus doc: (idCol, max_eval_cos round 4,
    *         contaminated) */
  def semanticDecontaminate(corpus: DataFrame, evalSet: DataFrame,
      tau: Double, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val e = evalSet.select(col(vecCol).as("ev"), norm(col(vecCol)).as("en"))
    // LEFT join against the broadcast eval side: an EMPTY eval set means
    // "nothing to leak" — every doc must surface with a NULL max cosine
    // and contaminated=false, not silently vanish (a crossJoin would
    // empty the whole report and read as an all-clean corpus).
    // bounded by contract (it is broadcast below); the count
    // distinguishes "empty eval set" (documented all-clean) from "this
    // doc has no comparable embedding" (which must FAIL, not pass)
    val nEval = e.count()
    c.join(broadcast(e), lit(true), "left")
      .groupBy(col(idCol))
      .agg(round(max(dot(col("cv"), col("ev")) / (col("cn") * col("en"))), 4)
        .as("max_eval_cos"))
      .withColumn("contaminated",
        if (nEval == 0) lit(false)
        else when(col("max_eval_cos").isNotNull,
            col("max_eval_cos") >= tau)
          // r14 review: a NULL max cosine with a NON-empty eval set
          // means the doc's embedding is NULL or dimension-mismatched —
          // the old coalesce(false) stamped a verbatim eval copy with a
          // malformed embedding CLEAN. A safety gate fails loudly.
          .otherwise(raise_error(concat(
            lit("semanticDecontaminate: doc "), col(idCol).cast("string"),
            lit(" has no comparable embedding (NULL or dimension " +
              "mismatch vs the eval set)"))).cast("boolean")))
  }

  // --- Random projection (JL) ---------------------------------------------

  /** PORTABLE ±1/√outDim sign matrix for Johnson–Lindenstrauss projection:
    * the sign of entry (j, i) is the parity of the first md5 byte of
    * "salt|j|i" — reproducible in any engine with md5 (`('0x' ||
    * substr(md5(...), 1, 2))::INT % 2` in DuckDB). ±1 entries suffice for
    * the JL guarantee (Achlioptas 2003, "Database-friendly random
    * projections"); the 1/√outDim scale makes the projection an unbiased
    * inner-product estimator. */
  private[operators] def portableSigns(outDim: Int, dim: Int,
      salt: String = "jl"): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val s = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim, dim) { (j, i) =>
      md.reset()
      val b = md.digest(s"$salt|$j|$i".getBytes("UTF-8"))(0) & 0xff
      if (b % 2 == 0) s else -s
    }
  }

  /** Johnson–Lindenstrauss projection of the embedding column to `outDim`
    * doubles: component j = ⟨vec, R_j⟩ with the portable sign matrix
    * [[portableSigns]], each component rounded to 6 so downstream
    * reduced-space scores are engine-portable (q90). Pairwise inner
    * products are preserved within ±ε for outDim = O(ln n / ε²).
    *
    * Shape at 100 TB: the matrix is a driver literal baked into codegen —
    * one narrow map pass over the corpus, no shuffle, and the projected
    * table is dim/outDim× smaller than the source (64 floats → 8 doubles
    * here), which is the point: candidate scans read the skinny table. */
  def randomProject(emb: DataFrame, outDim: Int, dim: Int,
      salt: String = "jl", vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val m = portableSigns(outDim, dim, salt)
    emb.select(col(idCol), array((0 until outDim).map { j =>
      round(dot(col(vecCol), typedLit(m(j).toSeq)), 6)
    }: _*).as("proj"))
  }

  /** Reduced-dimension ANN: project the corpus with [[randomProject]],
    * take the `candK` best candidates by reduced-space inner product
    * (a TakeOrdered over the skinny table), then re-rank ONLY those
    * candidates with the exact full-dimension cosine and cut at `k`.
    * Candidate and final orderings are total ((score desc, id) on
    * 6-rounded scores), and the projection is portable, so the whole
    * composition — projection, candidate cut, exact re-rank — replays
    * value-for-value in an external engine (q90b).
    *
    * Shape at 100 TB: the full-width table is touched only by the final
    * `candK`-row broadcast semi-join; everything corpus-sized runs over
    * the projected table. */
  def reducedRerankTopK(emb: DataFrame, queryId: Long, k: Int, candK: Int,
      outDim: Int, dim: Int, salt: String = "jl",
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(candK >= k, "candK must be >= k")
    val proj = randomProject(emb, outDim, dim, salt, vecCol, idCol)
    val qp = proj.filter(col(idCol) === queryId)
      .select(col("proj").as("qproj"))
    val cands = proj.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(qp))
      .select(col(idCol), round(dot(col("proj"), col("qproj")), 6)
        .as("rscore"))
      .orderBy(col("rscore").desc, col(idCol)).limit(candK)
      .select(col(idCol))
    val qv = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"))
    emb.join(broadcast(cands), Seq(idCol))
      .crossJoin(broadcast(qv))
      .select(col(idCol),
        round(cosine(col(vecCol), col("qvec")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol)).limit(k)
  }

  /** Measured recall of [[reducedRerankTopK]] over a query panel: for
    * each query, the reduced-space candidate cut + exact re-rank top-k is
    * intersected with the true brute-force top-k. With the portable sign
    * matrix the ENTIRE measurement — projection, candidate ranks, both
    * re-ranks, the hit count — replays in an external engine (q90c), the
    * same discipline as the LSH (q44b) and PQ (q70e) recall metrics.
    * Brute force is the documented exact baseline; at corpus scale the
    * panel runs over a sample, never all queries.
    *
    * @return 1 row: (n_queries, k, cand_k, recall, cand_fraction) */
  def reducedRerankRecall(emb: DataFrame, queryIds: Seq[Long], k: Int,
      candK: Int, outDim: Int, dim: Int, salt: String = "jl",
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = queryIds.map(java.lang.Long.valueOf)
    val proj = randomProject(emb, outDim, dim, salt, vecCol, idCol)
      .transform(Materialize.cut) // feeds both the query and the corpus side
    val queries = emb.filter(col(idCol).isin(ids: _*))
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"),
        norm(col(vecCol)).as("qn"))
    val qProj = proj.filter(col(idCol).isin(ids: _*))
      .select(col(idCol).as("qid"), col("proj").as("qproj"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col(idCol))
    val withNorm = emb.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("n"))
    def exactTo(cands: DataFrame) = cands
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col(idCol),
        (dot(col(vecCol), col("qvec")) / (col("n") * col("qn")))
          .as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("qid", idCol)
    val bfTop = exactTo(withNorm
      .crossJoin(broadcast(queries.select("qid")))
      .filter(col(idCol) =!= col("qid")))
    val cands = proj.crossJoin(broadcast(qProj))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol),
        round(dot(col("proj"), col("qproj")), 6).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= candK)
      .select("qid", idCol)
    val rrTop = exactTo(cands.join(withNorm, Seq(idCol)))
    // cut: bfTop (the n x |queries| cross-join + window — the
    // dominant cost of every recall metric) feeds BOTH the denominator
    // count and the hits join; without it the whole lineage executed
    // twice (r14 review)
    val bfCut = Materialize.cut(bfTop)
    val denom = bfCut.count()
    val hits = bfCut.join(rrTop, Seq("qid", idCol), "left_semi").count()
    val n = emb.count()
    val sparkSession = emb.sparkSession
    import sparkSession.implicits._
    Seq((queryIds.size, k, candK,
      if (denom == 0) 0.0
      else math.rint(hits.toDouble / denom * 10000) / 10000,
      math.rint(math.min(1.0, candK.toDouble / n) * 10000) / 10000))
      .toDF("n_queries", "k", "cand_k", "recall", "cand_fraction")
  }

  // --- Physical bucketing (the at-rest layout for the 100 TB path) --------

  /** Materialize the corpus partitioned BY LSH bucket. A probe then reads
    * only the probed buckets' directories (partition pruning — the scan's
    * PartitionFilters, not a full pass). This is the layout `lshTopK`'s
    * doc promises: at rest, a query touches Σ C(nBits,i) partitions out of
    * 2^nBits. */
  def writeBucketed(emb: DataFrame, path: String, nBits: Int, dim: Int,
      vecCol: String = "embedding"): Unit =
    emb.withColumn("bucket", lshBucket(col(vecCol), nBits, dim))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Multi-probe top-k over a [[writeBucketed]] layout. `queryVec` comes
    * from the app (or a 1-row lookup); the probe bucket list is a literal
    * IN filter, so Catalyst prunes to those partitions before any I/O. */
  def bucketedTopK(spark: org.apache.spark.sql.SparkSession, path: String,
      queryVec: Seq[Double], k: Int, nBits: Int, dim: Int,
      probeRadius: Int = 2, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    // the zip would silently TRUNCATE a mismatched query and probe the
    // wrong buckets — confidently wrong top-k (r14 review); the
    // distributed side fails loudly on mismatch, the driver twin must too
    require(queryVec.length == dim,
      s"query dim ${queryVec.length} != layout dim $dim")
    val planes = hyperplanes(nBits, dim)
    val qBucket = (0 until nBits).map { i =>
      val d = planes(i).iterator.zip(queryVec.iterator).map { case (p, x) => p * x }.sum
      if (d >= 0) 1L << i else 0L
    }.reduce(_ | _)
    val probes = probeMasks(nBits, probeRadius).map(m => qBucket ^ m)
    val qvec = typedLit(queryVec)
    spark.read.parquet(path)
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol),
        round(cosine(col(vecCol), qvec), 4).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Per-dimension CENTROID DRIFT between two embedding snapshots — the
    * embedding-space analog of [[graft.operators.Layout.driftScore]]:
    * when the embedding model (or the corpus under it) shifts, the
    * per-dimension means move first. Monitors re-embedding jobs and
    * ingest distribution shift without touching pairwise distances.
    *
    * Shape at 100 TB: one posexplode + one groupBy(dimension) per side —
    * `dim` groups total, partial-aggregated map-side; the snapshots
    * never join row-to-row.
    *
    * @return (j, mean_a, mean_b, drift) per dimension, rounded 6 —
    *   drift = |mean_a − mean_b| */
  def embeddingDrift(a: DataFrame, b: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    def means(df: DataFrame, tag: String) =
      df.select(posexplode(col(vecCol)).as(Seq("j", "v")))
        .groupBy("j").agg(avg(col("v").cast("double")).as(s"__m$tag"))
    // Both sides are dim-sized (one row per dimension); without a hint
    // AQE picks the build side from runtime stats and flips
    // BuildLeft/BuildRight between environments (the q107 bistable
    // fingerprint, BENCH_NOTES r12). Pinning the broadcast on the b
    // snapshot makes the physical plan deterministic.
    means(a, "a").join(broadcast(means(b, "b")), Seq("j"))
      .select(col("j"),
        round(col("__ma"), 6).as("mean_a"),
        round(col("__mb"), 6).as("mean_b"),
        round(abs(col("__ma") - col("__mb")), 6).as("drift"))
  }
}
