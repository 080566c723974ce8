package graft.catalog

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, PqIndex, Similarity}

/** Oracle-checked catalog entries for embedding similarity search
  * (graft.operators.Similarity) over `embeddings` (64-dim float vectors).
  *
  * Both engines compute cosine in double precision over identical float
  * inputs with sequential summation, so scores agree bit-for-bit well past
  * the round(…, 4) used for comparison.
  */
object SimilarityQueries {
  import Tables._

  private val DIM = 64

  def all: Seq[Q] = Seq(

    // ----- brute-force exact cosine top-k vs vec_id=0 — the correctness
    // baseline for ANN.
    Q("q40_cosine_topk",
      (s, d) =>
        Similarity.bruteForceTopK(embeddings(s, d), queryId = 0L, k = 20),
      Some("""
        WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(embedding::DOUBLE[], qvec), 4) AS score
        FROM embeddings, q
        WHERE vec_id != 0
        ORDER BY score DESC, vec_id
        LIMIT 20""")),

    // ----- per-label embedding stats (norms) — exercises the double-
    // precision dot/norm algebra under aggregation.
    Q("q41_embed_stats",
      (s, d) =>
        embeddings(s, d)
          .select(col("label"), Similarity.norm(col("embedding")).as("nrm"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            round(avg("nrm"), 4).as("avg_norm"),
            round(min("nrm"), 4).as("min_norm"),
            round(max("nrm"), 4).as("max_norm"))
          .orderBy("label"),
      Some("""
        WITH n AS (
          SELECT label,
                 sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
          FROM embeddings)
        SELECT label, count(*) AS n,
               round(avg(nrm), 4) AS avg_norm,
               round(min(nrm), 4) AS min_norm,
               round(max(nrm), 4) AS max_norm
        FROM n
        GROUP BY label
        ORDER BY label""")),

    // ----- LSH-bucketed ANN (multi-probe) — the 100 TB scale path. nBits
    // is sized from the corpus so expected bucket population stays bounded
    // (Similarity.nBitsFor); hyperplanes are engine-internal, so the
    // driver records a rows-only check — q44 carries the recall metric.
    Q("q42_ann_lsh",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.lshTopK(emb, queryId = 0L, k = 10,
          nBits = Similarity.nBitsFor(emb.count(), targetBucketSize = 128), dim = DIM)
      },
      None),

    // ----- q42b: the SAME multi-probe ANN shape with PORTABLE md5-derived
    // hyperplanes — the bucket assignment itself is value-checked: DuckDB
    // re-derives the planes from md5 arithmetic, replays every sign
    // decision with an order-identical sequential dot (list_dot_product ≡
    // native DotProduct), probes the radius-1 neighborhood, and re-ranks
    // exactly. The one family that was rows-only-by-necessity now has a
    // cross-engine oracle at production shape (q42 keeps the seeded
    // Gaussian planes as the default engine path).
    Q("q42b_ann_lsh_portable",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.lshTopK(emb, queryId = 0L, k = 10,
          nBits = Similarity.nBitsFor(emb.count(), targetBucketSize = 128),
          dim = DIM, probeRadius = 1, portable = true)
      },
      Some(s"""
        WITH n AS (SELECT count(*) AS cnt FROM embeddings),
        bits AS (
          SELECT least(24, greatest(4,
            ceil(log2(greatest(1.0, cnt / 128.0)))))::INT AS nb
          FROM n),
        dims AS (
          -- generate_series cannot take the lateral nb; enumerate the
          -- 0..23 clamp superset and filter.
          SELECT i.i AS i, j.j AS j,
                 (('0x' || substr(md5(i.i::VARCHAR || '|' || j.j::VARCHAR),
                    1, 8))::BIGINT / 2147483648.0) - 1.0 AS h
          FROM bits, generate_series(0, 23) AS i(i),
               generate_series(0, ${DIM - 1}) AS j(j)
          WHERE i.i < nb),
        planes AS (SELECT i, list(h ORDER BY j) AS hv FROM dims GROUP BY i),
        vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        sig AS (
          SELECT vec_id,
                 sum(CASE WHEN list_dot_product(v, hv) >= 0
                     THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS bucket
          FROM vecs, planes GROUP BY vec_id),
        q AS (SELECT s.bucket AS qb, v.v AS qv
              FROM sig s JOIN vecs v USING (vec_id) WHERE s.vec_id = 0),
        probes AS (
          SELECT qb AS b FROM q
          UNION
          SELECT xor(qb, 1::BIGINT << g.i)
          FROM q, bits, generate_series(0, 23) AS g(i)
          WHERE g.i < nb),
        cand AS (
          SELECT s.vec_id FROM sig s
          WHERE s.bucket IN (SELECT b FROM probes) AND s.vec_id != 0)
        SELECT c.vec_id,
               round(list_cosine_similarity(v.v, q.qv), 4) AS score
        FROM cand c JOIN vecs v USING (vec_id), q
        ORDER BY score DESC, vec_id
        LIMIT 10""")),

    // ----- embedding-cosine near-duplicate pairs via LSH blocking —
    // rows-only (bucket assignment is engine-internal). Auto-sized nBits
    // keeps the per-bucket self-join sum-of-bucket², not corpus². NOTE:
    // vs the exact q43b at this deliberately LOW threshold (0.2) on
    // random vectors, blocking recalls only same-bucket pairs — sign-LSH
    // collision probability targets near-DUPLICATES (cosine ≳ 0.9), where
    // blocking recall is high (asserted on clustered data in
    // SimilaritySpec).
    Q("q43_cosine_neardup",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.cosineNearDupPairs(emb, threshold = 0.2,
          nBits = Similarity.nBitsFor(emb.count(), targetBucketSize = 128), dim = DIM)
          .orderBy("id_a", "id_b")
      },
      None),

    // ----- q43c: the SAME banded blocking with portable per-band
    // hyperplanes (md5('band|i|j') components) — DuckDB replays all four
    // bands' bucket assignments and the exact score gate, so the
    // blocked-pair MULTISET is value-checked, not just anchored by the
    // exact q43b.
    Q("q43c_neardup_portable",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.cosineNearDupPairs(emb, threshold = 0.2,
          nBits = Similarity.nBitsFor(emb.count(), targetBucketSize = 128),
          dim = DIM, portable = true)
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH n AS (SELECT count(*) AS cnt FROM embeddings),
        bits AS (
          SELECT least(24, greatest(4,
            ceil(log2(greatest(1.0, cnt / 128.0)))))::INT AS nb
          FROM n),
        dims AS (
          SELECT b.b AS band, i.i AS i, j.j AS j,
                 (('0x' || substr(md5(b.b::VARCHAR || '|' || i.i::VARCHAR
                    || '|' || j.j::VARCHAR), 1, 8))::BIGINT
                    / 2147483648.0) - 1.0 AS h
          FROM bits, generate_series(0, 3) AS b(b),
               generate_series(0, 23) AS i(i),
               generate_series(0, ${DIM - 1}) AS j(j)
          WHERE i.i < nb),
        planes AS (
          SELECT band, i, list(h ORDER BY j) AS hv
          FROM dims GROUP BY band, i),
        vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        sig AS (
          SELECT vec_id, band,
                 sum(CASE WHEN list_dot_product(v, hv) >= 0
                     THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS bucket
          FROM vecs, planes GROUP BY vec_id, band),
        pairs AS (
          SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
          FROM sig a JOIN sig b
            ON a.band = b.band AND a.bucket = b.bucket
           AND a.vec_id < b.vec_id)
        SELECT p.id_a, p.id_b,
               round(list_cosine_similarity(va.v, vb.v), 4) AS score
        FROM pairs p
        JOIN vecs va ON va.vec_id = p.id_a
        JOIN vecs vb ON vb.vec_id = p.id_b
        WHERE round(list_cosine_similarity(va.v, vb.v), 4) >= 0.2
        ORDER BY id_a, id_b""")),

    // ----- exact all-pairs near-dup baseline — the oracle anchor for the
    // LSH-blocked q43 (whose bucket assignment is engine-internal).
    Q("q43b_neardup_exact",
      (s, d) =>
        Similarity.cosineNearDupPairsExact(embeddings(s, d), threshold = 0.2)
          .orderBy("id_a", "id_b"),
      Some("""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 4) AS score
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.2
        ORDER BY id_a, id_b""")),

    // ----- measured ANN recall vs brute force over 20 sample queries —
    // the in-engine check that keeps q42's approximation honest, with the
    // probed bucket fraction alongside (recall without cost is
    // meaningless). On the harness's RANDOM embeddings top-k neighbors are
    // near-orthogonal (cosine ~0.3), the hard case for sign-LSH; the
    // >= 0.9 recall target is asserted on clustered vectors — where ANN is
    // actually used — in SimilaritySpec.
    Q("q44_ann_recall",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.annRecall(emb, queryIds = 0L until 20L, k = 10,
          nBits = Similarity.nBitsFor(emb.count(), targetBucketSize = 128), dim = DIM)
      },
      None),

    // ----- q44b: the SAME recall measurement with portable planes — the
    // recall COMPUTATION itself (brute-force panel, bucket assignment,
    // radius-2 probe set, per-query top-k intersection, probed fraction)
    // is value-checked in DuckDB, closing the "recall metrics are
    // rows-only" gap.
    Q("q44b_ann_recall_portable",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.annRecall(emb, queryIds = 0L until 20L, k = 10,
          nBits = Similarity.nBitsFor(emb.count(), targetBucketSize = 128),
          dim = DIM, portable = true)
      },
      Some(s"""
        WITH n AS (SELECT count(*) AS cnt FROM embeddings),
        bits AS (
          SELECT least(24, greatest(4,
            ceil(log2(greatest(1.0, cnt / 128.0)))))::INT AS nb
          FROM n),
        dims AS (
          SELECT i.i AS i, j.j AS j,
                 (('0x' || substr(md5(i.i::VARCHAR || '|' || j.j::VARCHAR),
                    1, 8))::BIGINT / 2147483648.0) - 1.0 AS h
          FROM bits, generate_series(0, 23) AS i(i),
               generate_series(0, ${DIM - 1}) AS j(j)
          WHERE i.i < nb),
        planes AS (SELECT i, list(h ORDER BY j) AS hv FROM dims GROUP BY i),
        vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        sig AS (
          SELECT vec_id,
                 sum(CASE WHEN list_dot_product(v, hv) >= 0
                     THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS bucket
          FROM vecs, planes GROUP BY vec_id),
        qids AS (SELECT vec_id AS qid, v AS qv FROM vecs WHERE vec_id < 20),
        bf AS (
          SELECT qid, vec_id FROM (
            SELECT q.qid, e.vec_id,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY list_cosine_similarity(e.v, q.qv) DESC,
                              e.vec_id) AS rn
            FROM vecs e, qids q WHERE e.vec_id != q.qid) WHERE rn <= 10),
        masks AS (
          SELECT 0::BIGINT AS m FROM bits
          UNION ALL
          SELECT (1::BIGINT << i.i)
          FROM bits, generate_series(0, 23) AS i(i) WHERE i.i < nb
          UNION ALL
          SELECT ((1::BIGINT << i.i) | (1::BIGINT << j.j))
          FROM bits, generate_series(0, 23) AS i(i),
               generate_series(0, 23) AS j(j)
          WHERE i.i < j.j AND j.j < nb),
        probes AS (
          SELECT DISTINCT s.vec_id AS qid, xor(s.bucket, m.m) AS bucket
          FROM sig s, masks m WHERE s.vec_id < 20),
        cand AS (
          SELECT DISTINCT p.qid, s.vec_id
          FROM probes p JOIN sig s ON s.bucket = p.bucket
          WHERE s.vec_id != p.qid),
        lsh AS (
          SELECT qid, vec_id FROM (
            SELECT c.qid, c.vec_id,
                   row_number() OVER (PARTITION BY c.qid
                     ORDER BY list_cosine_similarity(e.v, q.qv) DESC,
                              c.vec_id) AS rn
            FROM cand c JOIN vecs e ON e.vec_id = c.vec_id
            JOIN qids q ON q.qid = c.qid) WHERE rn <= 10),
        agg AS (SELECT
          (SELECT count(*) FROM bf JOIN lsh USING (qid, vec_id)) AS hits,
          (SELECT count(*) FROM bf) AS denom,
          (SELECT count(*) FROM masks) AS nmasks,
          (SELECT nb FROM bits) AS nb)
        SELECT 20 AS n_queries, 10 AS k, hits,
               round(hits / greatest(denom, 1)::DOUBLE, 4) AS recall,
               round(nmasks::DOUBLE / (1::BIGINT << nb), 4) AS probed_frac
        FROM agg""")),

    // ----- IVF ANN — the second scale path (k-means coarse quantizer +
    // nProbe inverted-list probe; ~nProbe/k of the corpus scanned).
    // Centroids/assignments are engine-internal → rows-only; recall vs
    // brute force is asserted in IvfIndexSpec.
    Q("q45_ann_ivf",
      (s, d) => {
        val emb = embeddings(s, d)
        val centroids = IvfIndex.train(emb, k = 16, iters = 3)
        IvfIndex.topK(emb, centroids, queryId = 0L, k = 10, nProbe = 4)
      },
      None),

    // ----- q45b: the SAME IVF query path under FIXED portable centroids
    // (md5-derived literals — no k-means, which is spec'd separately):
    // DuckDB re-derives the 16 centroids, replays the argmin cluster
    // assignment (identical -2·v·c + |c|² algebra, ties to the lower
    // cluster), picks the query's 4 nearest lists, and exact-re-ranks the
    // pruned candidates — the whole coarse-quantizer path value-checked.
    Q("q45b_ann_ivf_portable",
      (s, d) => {
        val emb = embeddings(s, d)
        val centroids = IvfIndex.portableCentroids(k = 16, dim = DIM)
        IvfIndex.topK(emb, centroids, queryId = 0L, k = 10, nProbe = 4)
      },
      Some(s"""
        WITH cdims AS (
          SELECT c.c AS c, j.j AS j,
                 (('0x' || substr(md5('ivf|' || c.c::VARCHAR || '|' ||
                    j.j::VARCHAR), 1, 8))::BIGINT / 2147483648.0) - 1.0 AS h
          FROM generate_series(0, 15) AS c(c),
               generate_series(0, ${DIM - 1}) AS j(j)),
        cent AS (SELECT c, list(h ORDER BY j) AS cv FROM cdims GROUP BY c),
        vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        dists AS (
          SELECT vec_id, c,
                 -2.0 * list_dot_product(v, cv) + list_dot_product(cv, cv)
                   AS d
          FROM vecs, cent),
        assign AS (
          SELECT vec_id, c AS cluster FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d, c) AS rn
            FROM dists) WHERE rn = 1),
        q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
        probes AS (
          SELECT c FROM (
            SELECT c, row_number() OVER (ORDER BY d, c) AS rn
            FROM dists WHERE vec_id = 0) WHERE rn <= 4),
        cand AS (
          SELECT a.vec_id FROM assign a
          WHERE a.cluster IN (SELECT c FROM probes) AND a.vec_id != 0)
        SELECT c.vec_id,
               round(list_cosine_similarity(v.v, q.qv), 4) AS score
        FROM cand c JOIN vecs v USING (vec_id), q
        ORDER BY score DESC, vec_id
        LIMIT 10""")),

    // ----- q85: SemDedup (cluster-blocked semantic dedup, arXiv:
    // 2303.09540) under the SAME portable centroids — DuckDB replays the
    // coarse assignment, every within-cluster pair cosine, the ≥ tau drop
    // decision, and the surviving set. tau=0.35 drops 73 of 500 at
    // sf0.01 (calibrated: max pairwise cosine in the synthetic embeddings
    // is ~0.51; the nearest pair to the boundary sits 2.4e-4 away, so
    // both engines agree bit-for-bit on every decision).
    Q("q85_semantic_dedup",
      (s, d) => {
        val centroids = IvfIndex.portableCentroids(k = 16, dim = DIM)
        IvfIndex.semanticDedup(embeddings(s, d), centroids, tau = 0.35)
          .orderBy("vec_id")
      },
      Some(s"""
        WITH cdims AS (
          SELECT c.c AS c, j.j AS j,
                 (('0x' || substr(md5('ivf|' || c.c::VARCHAR || '|' ||
                    j.j::VARCHAR), 1, 8))::BIGINT / 2147483648.0) - 1.0 AS h
          FROM generate_series(0, 15) AS c(c),
               generate_series(0, ${DIM - 1}) AS j(j)),
        cent AS (SELECT c, list(h ORDER BY j) AS cv FROM cdims GROUP BY c),
        vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        dists AS (
          SELECT vec_id, c,
                 -2.0 * list_dot_product(v, cv) + list_dot_product(cv, cv)
                   AS d
          FROM vecs, cent),
        assign AS (
          SELECT vec_id, c AS cluster FROM (
            SELECT vec_id, c,
                   row_number() OVER (PARTITION BY vec_id
                     ORDER BY d, c) AS rn
            FROM dists) WHERE rn = 1),
        av AS (SELECT a.vec_id, a.cluster, v.v
               FROM assign a JOIN vecs v USING (vec_id)),
        drops AS (
          SELECT DISTINCT b.vec_id
          FROM av a JOIN av b
            ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.v, b.v) >= 0.35)
        SELECT vec_id, cluster FROM assign
        WHERE vec_id NOT IN (SELECT vec_id FROM drops)
        ORDER BY vec_id""")),

    // ----- PQ/ADC ANN — the third scale path, and the one that compresses
    // the scan: 8 sub-codebook codes per vector (32× smaller than the
    // raw 64-dim floats), approximate scores via an m×k lookup table,
    // exact re-rank of the top refine·k candidates only. Codebooks are
    // engine-internal (trained) → rows-only; recall vs brute force is
    // asserted in PqIndexSpec.
    Q("q70_pq_ann",
      (s, d) => {
        val emb = embeddings(s, d)
        val books = PqIndex.train(emb, m = 8, k = 16, iters = 3)
        PqIndex.topK(emb, books, queryId = 0L, k = 10, refine = 20)
      },
      None),

    // ----- measured PQ recall vs brute force over 20 queries with the
    // scanned candidate fraction alongside — the q44 discipline for the
    // third ANN path. Random harness embeddings are the hard case for a
    // coarse quantizer; the >= 0.9 target on clustered vectors (where
    // ANN is used) is asserted in PqIndexSpec.
    Q("q70b_pq_recall",
      (s, d) => {
        val emb = embeddings(s, d)
        val books = PqIndex.train(emb, m = 8, k = 16, iters = 3)
        PqIndex.adcRecall(emb, books, queryIds = 0L until 20L,
          k = 10, refine = 20)
      },
      None),

    // ----- IVF-PQ: the canonical billion-scale composition — coarse
    // quantizer prunes to nProbe lists, ADC scores only their compact
    // codes, exact re-rank last. Rows-only (both trained structures are
    // engine-internal); recall is asserted in PqIndexSpec.
    Q("q70c_ivf_pq",
      (s, d) => {
        val emb = embeddings(s, d)
        val centroids = IvfIndex.train(emb, k = 16, iters = 3)
        val books = PqIndex.train(emb, m = 8, k = 16, iters = 3)
        val qVec = emb.filter(col("vec_id") === 0L)
          .select(col("embedding").cast("array<double>"))
          .collect()(0).getSeq[Double](0).toArray
        PqIndex.ivfAdcTopK(emb.filter(col("vec_id") =!= 0L), centroids,
          books, qVec, k = 10, nProbe = 4, refine = 20)
      },
      None),

    // ----- q70d: the SAME ADC query path under FIXED portable codebooks
    // (md5-derived per-block literals — no k-means): DuckDB re-derives all
    // 8×16 codebook entries, replays the per-block argmin encoding of
    // every vector, builds the query's LUTs, cuts the top refine·k by
    // approximate score, and exact-re-ranks — the whole
    // product-quantization path value-checked.
    Q("q70d_pq_adc_portable",
      (s, d) => {
        val emb = embeddings(s, d)
        val books = PqIndex.portableCodebooks(m = 8, k = 16, sub = DIM / 8)
        PqIndex.topK(emb, books, queryId = 0L, k = 10, refine = 20)
      },
      Some(s"""
        WITH bdims AS (
          SELECT b.b AS b, c.c AS c, j.j AS j,
                 (('0x' || substr(md5('pq|' || b.b::VARCHAR || '|' ||
                    c.c::VARCHAR || '|' || j.j::VARCHAR), 1, 8))::BIGINT
                    / 2147483648.0) - 1.0 AS h
          FROM generate_series(0, 7) AS b(b), generate_series(0, 15) AS c(c),
               generate_series(0, ${DIM / 8 - 1}) AS j(j)),
        books AS (SELECT b, c, list(h ORDER BY j) AS cb
                  FROM bdims GROUP BY b, c),
        vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        subs AS (
          SELECT vec_id, b.b AS b,
                 v[b.b * ${DIM / 8} + 1 : b.b * ${DIM / 8} + ${DIM / 8}]
                   AS sv
          FROM vecs, generate_series(0, 7) AS b(b)),
        codes AS (
          SELECT vec_id, b, c AS code FROM (
            SELECT s.vec_id, s.b, k.c,
                   row_number() OVER (PARTITION BY s.vec_id, s.b
                     ORDER BY -2.0 * list_dot_product(s.sv, k.cb)
                              + list_dot_product(k.cb, k.cb), k.c) AS rn
            FROM subs s JOIN books k ON k.b = s.b) WHERE rn = 1),
        q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
        qsubs AS (
          SELECT b.b AS b,
                 qv[b.b * ${DIM / 8} + 1 : b.b * ${DIM / 8} + ${DIM / 8}]
                   AS qs
          FROM q, generate_series(0, 7) AS b(b)),
        lut AS (
          SELECT k.b, k.c,
                 list_dot_product(q2.qs, k.cb) AS ld,
                 list_dot_product(k.cb, k.cb) AS ln2
          FROM books k JOIN qsubs q2 ON q2.b = k.b),
        scored AS (
          SELECT cd.vec_id, sum(l.ld) AS adot, sum(l.ln2) AS an2
          FROM codes cd JOIN lut l ON l.b = cd.b AND l.c = cd.code
          WHERE cd.vec_id != 0
          GROUP BY cd.vec_id),
        qn AS (SELECT sqrt(list_dot_product(qv, qv)) AS qnorm FROM q),
        cands AS (
          SELECT vec_id FROM (
            SELECT s.vec_id,
                   row_number() OVER (ORDER BY
                     s.adot / (sqrt(s.an2) * qn.qnorm) DESC, s.vec_id) AS rn
            FROM scored s, qn) WHERE rn <= 200)
        SELECT c.vec_id,
               round(list_cosine_similarity(v.v, q.qv), 4) AS score
        FROM cands c JOIN vecs v USING (vec_id), q
        ORDER BY score DESC, vec_id
        LIMIT 10""")),

    // ----- q70e: the PQ recall measurement under portable codebooks —
    // brute-force panel, per-query ADC scores off ONE code relation,
    // refine·k candidate cut, exact re-rank, hit intersection and the
    // scanned-candidate fraction, all value-checked in DuckDB (the q44b
    // discipline for the third ANN path).
    Q("q70e_pq_recall_portable",
      (s, d) => {
        val emb = embeddings(s, d)
        val books = PqIndex.portableCodebooks(m = 8, k = 16, sub = DIM / 8)
        PqIndex.adcRecall(emb, books, queryIds = 0L until 20L,
          k = 10, refine = 20)
      },
      Some(s"""
        WITH bdims AS (
          SELECT b.b AS b, c.c AS c, j.j AS j,
                 (('0x' || substr(md5('pq|' || b.b::VARCHAR || '|' ||
                    c.c::VARCHAR || '|' || j.j::VARCHAR), 1, 8))::BIGINT
                    / 2147483648.0) - 1.0 AS h
          FROM generate_series(0, 7) AS b(b), generate_series(0, 15) AS c(c),
               generate_series(0, ${DIM / 8 - 1}) AS j(j)),
        books AS (SELECT b, c, list(h ORDER BY j) AS cb
                  FROM bdims GROUP BY b, c),
        vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        subs AS (
          SELECT vec_id, b.b AS b,
                 v[b.b * ${DIM / 8} + 1 : b.b * ${DIM / 8} + ${DIM / 8}]
                   AS sv
          FROM vecs, generate_series(0, 7) AS b(b)),
        codes AS (
          SELECT vec_id, b, c AS code FROM (
            SELECT s.vec_id, s.b, k.c,
                   row_number() OVER (PARTITION BY s.vec_id, s.b
                     ORDER BY -2.0 * list_dot_product(s.sv, k.cb)
                              + list_dot_product(k.cb, k.cb), k.c) AS rn
            FROM subs s JOIN books k ON k.b = s.b) WHERE rn = 1),
        qids AS (SELECT vec_id AS qid, v AS qv FROM vecs WHERE vec_id < 20),
        qsubs AS (
          SELECT qid, b.b AS b,
                 qv[b.b * ${DIM / 8} + 1 : b.b * ${DIM / 8} + ${DIM / 8}]
                   AS qs
          FROM qids, generate_series(0, 7) AS b(b)),
        lut AS (
          SELECT q2.qid, k.b, k.c,
                 list_dot_product(q2.qs, k.cb) AS ld,
                 list_dot_product(k.cb, k.cb) AS ln2
          FROM books k JOIN qsubs q2 ON q2.b = k.b),
        scored AS (
          SELECT l.qid, cd.vec_id, sum(l.ld) AS adot, sum(l.ln2) AS an2
          FROM codes cd JOIN lut l ON l.b = cd.b AND l.c = cd.code
          WHERE cd.vec_id != l.qid
          GROUP BY l.qid, cd.vec_id),
        qnorms AS (SELECT qid, sqrt(list_dot_product(qv, qv)) AS qn
                   FROM qids),
        cands AS (
          SELECT qid, vec_id FROM (
            SELECT s.qid, s.vec_id,
                   row_number() OVER (PARTITION BY s.qid ORDER BY
                     s.adot / (sqrt(s.an2) * n.qn) DESC, s.vec_id) AS rn
            FROM scored s JOIN qnorms n USING (qid)) WHERE rn <= 200),
        pq AS (
          SELECT qid, vec_id FROM (
            SELECT c.qid, c.vec_id,
                   row_number() OVER (PARTITION BY c.qid
                     ORDER BY list_cosine_similarity(e.v, q.qv) DESC,
                              c.vec_id) AS rn
            FROM cands c JOIN vecs e ON e.vec_id = c.vec_id
            JOIN qids q USING (qid)) WHERE rn <= 10),
        bf AS (
          SELECT qid, vec_id FROM (
            SELECT q.qid, e.vec_id,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY list_cosine_similarity(e.v, q.qv) DESC,
                              e.vec_id) AS rn
            FROM vecs e, qids q WHERE e.vec_id != q.qid) WHERE rn <= 10),
        agg AS (SELECT
          (SELECT count(*) FROM bf JOIN pq USING (qid, vec_id)) AS hits,
          (SELECT count(*) FROM bf) AS denom,
          (SELECT count(*) FROM vecs) AS n)
        SELECT 20 AS n_queries, 10 AS k, 20 AS refine,
               round(hits / greatest(denom, 1)::DOUBLE, 4) AS recall,
               round(least(1.0, 200.0 / n), 4) AS cand_fraction
        FROM agg""")),

    // ----- set-to-set k-NN join (Similarity.knnJoin): every 50th vector
    // as the query batch against the rest — the retrieval join shape,
    // LSH-banded candidates, exact scores, per-left window top-k.
    // Rows-only (bucket assignment engine-internal); nearest-neighbor
    // recovery is spec-asserted on clustered vectors.
    Q("q79_knn_join",
      (s, d) => {
        val emb = embeddings(s, d)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        val corpus = emb.filter(col("vec_id") % 50 =!= 0)
        Similarity.knnJoin(queries, corpus, k = 5,
          nBits = Similarity.nBitsFor(emb.count(), targetBucketSize = 128),
          dim = DIM)
          .orderBy("left_id", "knn_rank")
      },
      None),

    // ----- q79b: the SAME k-NN join with portable per-band planes —
    // DuckDB replays both sides' bucket assignments, the banded
    // candidate union, exact scores, and the per-left window top-k.
    Q("q79b_knn_join_portable",
      (s, d) => {
        val emb = embeddings(s, d)
        val queries = emb.filter(col("vec_id") % 50 === 0)
        val corpus = emb.filter(col("vec_id") % 50 =!= 0)
        Similarity.knnJoin(queries, corpus, k = 5,
          nBits = Similarity.nBitsFor(emb.count(), targetBucketSize = 128),
          dim = DIM, portable = true)
          .orderBy("left_id", "knn_rank")
      },
      Some(s"""
        WITH n AS (SELECT count(*) AS cnt FROM embeddings),
        bits AS (
          SELECT least(24, greatest(4,
            ceil(log2(greatest(1.0, cnt / 128.0)))))::INT AS nb
          FROM n),
        dims AS (
          SELECT b.b AS band, i.i AS i, j.j AS j,
                 (('0x' || substr(md5(b.b::VARCHAR || '|' || i.i::VARCHAR
                    || '|' || j.j::VARCHAR), 1, 8))::BIGINT
                    / 2147483648.0) - 1.0 AS h
          FROM bits, generate_series(0, 3) AS b(b),
               generate_series(0, 23) AS i(i),
               generate_series(0, ${DIM - 1}) AS j(j)
          WHERE i.i < nb),
        planes AS (
          SELECT band, i, list(h ORDER BY j) AS hv
          FROM dims GROUP BY band, i),
        vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        sig AS (
          SELECT vec_id, band,
                 sum(CASE WHEN list_dot_product(v, hv) >= 0
                     THEN (1::BIGINT << i) ELSE 0 END)::BIGINT AS bucket
          FROM vecs, planes GROUP BY vec_id, band),
        cand AS (
          SELECT DISTINCT l.vec_id AS left_id, r.vec_id AS right_id
          FROM sig l JOIN sig r
            ON l.band = r.band AND l.bucket = r.bucket
          WHERE l.vec_id % 50 = 0 AND r.vec_id % 50 != 0),
        scored AS (
          SELECT c.left_id, c.right_id,
                 round(list_cosine_similarity(vl.v, vr.v), 4) AS score
          FROM cand c
          JOIN vecs vl ON vl.vec_id = c.left_id
          JOIN vecs vr ON vr.vec_id = c.right_id)
        SELECT left_id, right_id, score, knn_rank FROM (
          SELECT left_id, right_id, score,
                 row_number() OVER (PARTITION BY left_id
                   ORDER BY score DESC, right_id) AS knn_rank
          FROM scored)
        WHERE knn_rank <= 5
        ORDER BY left_id, knn_rank""")),

    // ----- q90: Johnson–Lindenstrauss random projection
    // (Similarity.randomProject, Achlioptas 2003) — 64 floats → 8 doubles
    // under the portable ±1/√8 sign matrix (sign = parity of the first
    // md5 byte of "jl|j|i"). Every projected component is value-checked:
    // DuckDB re-derives the matrix from md5 arithmetic and replays each
    // sequential dot. Emitted as exploded scalar rows (vec_id, j, proj_j)
    // — one row per projected component — because the harness checker
    // hashes scalar columns, not arrays.
    Q("q90_random_projection",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.randomProject(emb, outDim = 8, dim = DIM)
          .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "proj_j")))
          .orderBy("vec_id", "j")
      },
      Some(s"""
        WITH m AS (
          SELECT j.j AS j, i.i AS i,
                 (CASE WHEN ('0x' || substr(md5('jl|' || j.j::VARCHAR ||
                    '|' || i.i::VARCHAR), 1, 2))::INT % 2 = 0
                  THEN 1.0 ELSE -1.0 END) / sqrt(8.0) AS s
          FROM generate_series(0, 7) AS j(j),
               generate_series(0, ${DIM - 1}) AS i(i)),
        mrows AS (SELECT j, list(s ORDER BY i) AS sv FROM m GROUP BY j),
        vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (
          SELECT vec_id, j, round(list_dot_product(v, sv), 6) AS pj
          FROM vecs, mrows)
        SELECT vec_id, j::INT AS j, pj AS proj_j
        FROM p ORDER BY vec_id, j""")),

    // ----- q90b: reduced-dimension ANN over the q90 projection
    // (Similarity.reducedRerankTopK) — candidates by reduced-space inner
    // product (50 of 500), exact full-dim cosine re-rank to top-10. The
    // whole composition (projection, candidate cut, re-rank) replays
    // value-for-value.
    Q("q90b_ann_reduced_rerank",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.reducedRerankTopK(emb, queryId = 7L, k = 10,
          candK = 50, outDim = 8, dim = DIM)
      },
      Some(s"""
        WITH m AS (
          SELECT j.j AS j, i.i AS i,
                 (CASE WHEN ('0x' || substr(md5('jl|' || j.j::VARCHAR ||
                    '|' || i.i::VARCHAR), 1, 2))::INT % 2 = 0
                  THEN 1.0 ELSE -1.0 END) / sqrt(8.0) AS s
          FROM generate_series(0, 7) AS j(j),
               generate_series(0, ${DIM - 1}) AS i(i)),
        mrows AS (SELECT j, list(s ORDER BY i) AS sv FROM m GROUP BY j),
        vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (
          SELECT vec_id, j, round(list_dot_product(v, sv), 6) AS pj
          FROM vecs, mrows),
        proj AS (SELECT vec_id, list(pj ORDER BY j) AS pv
                 FROM p GROUP BY vec_id),
        q AS (SELECT pv AS qp FROM proj WHERE vec_id = 7),
        cand AS (
          SELECT vec_id FROM (
            SELECT pr.vec_id,
                   round(list_dot_product(pr.pv, q.qp), 6) AS rscore
            FROM proj pr, q WHERE pr.vec_id != 7
            ORDER BY rscore DESC, vec_id LIMIT 50)),
        qv AS (SELECT v AS qvec FROM vecs WHERE vec_id = 7)
        SELECT vec_id, cos FROM (
          SELECT e.vec_id,
                 round(list_dot_product(e.v, qv.qvec) /
                   (sqrt(list_dot_product(e.v, e.v)) *
                    sqrt(list_dot_product(qv.qvec, qv.qvec))), 6) AS cos
          FROM vecs e JOIN cand USING (vec_id), qv
          ORDER BY cos DESC, vec_id LIMIT 10)""")),

    // ----- q90c: measured recall of the reduced-dimension re-rank over a
    // 20-query panel — projection, candidate ranks, exact re-rank, brute
    // force and the hit count all replay in DuckDB (the q44b/q70e
    // discipline for the fourth ANN path).
    Q("q90c_reduced_recall",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.reducedRerankRecall(emb, queryIds = 0L until 20L,
          k = 10, candK = 50, outDim = 8, dim = DIM)
      },
      Some(s"""
        WITH m AS (
          SELECT j.j AS j, i.i AS i,
                 (CASE WHEN ('0x' || substr(md5('jl|' || j.j::VARCHAR ||
                    '|' || i.i::VARCHAR), 1, 2))::INT % 2 = 0
                  THEN 1.0 ELSE -1.0 END) / sqrt(8.0) AS s
          FROM generate_series(0, 7) AS j(j),
               generate_series(0, ${DIM - 1}) AS i(i)),
        mrows AS (SELECT j, list(s ORDER BY i) AS sv FROM m GROUP BY j),
        vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (
          SELECT vec_id, j, round(list_dot_product(v, sv), 6) AS pj
          FROM vecs, mrows),
        proj AS (SELECT vec_id, list(pj ORDER BY j) AS pv
                 FROM p GROUP BY vec_id),
        qids AS (SELECT vec_id AS qid, v AS qv FROM vecs WHERE vec_id < 20),
        qproj AS (SELECT vec_id AS qid, pv AS qp FROM proj
                  WHERE vec_id < 20),
        cands AS (
          SELECT qid, vec_id FROM (
            SELECT qp.qid, pr.vec_id,
                   row_number() OVER (PARTITION BY qp.qid
                     ORDER BY round(list_dot_product(pr.pv, qp.qp), 6) DESC,
                              pr.vec_id) AS rn
            FROM proj pr, qproj qp WHERE pr.vec_id != qp.qid)
          WHERE rn <= 50),
        rr AS (
          SELECT qid, vec_id FROM (
            SELECT c.qid, c.vec_id,
                   row_number() OVER (PARTITION BY c.qid
                     ORDER BY list_dot_product(e.v, q.qv) /
                       (sqrt(list_dot_product(e.v, e.v)) *
                        sqrt(list_dot_product(q.qv, q.qv))) DESC,
                       c.vec_id) AS rn
            FROM cands c JOIN vecs e ON e.vec_id = c.vec_id
            JOIN qids q USING (qid)) WHERE rn <= 10),
        bf AS (
          SELECT qid, vec_id FROM (
            SELECT q.qid, e.vec_id,
                   row_number() OVER (PARTITION BY q.qid
                     ORDER BY list_dot_product(e.v, q.qv) /
                       (sqrt(list_dot_product(e.v, e.v)) *
                        sqrt(list_dot_product(q.qv, q.qv))) DESC,
                       e.vec_id) AS rn
            FROM vecs e, qids q WHERE e.vec_id != q.qid) WHERE rn <= 10),
        agg AS (SELECT
          (SELECT count(*) FROM bf JOIN rr USING (qid, vec_id)) AS hits,
          (SELECT count(*) FROM bf) AS denom,
          (SELECT count(*) FROM vecs) AS n)
        SELECT 20 AS n_queries, 10 AS k, 50 AS cand_k,
               round(hits / greatest(denom, 1)::DOUBLE, 4) AS recall,
               round(least(1.0, 50.0 / n), 4) AS cand_fraction
        FROM agg""")),

    // ----- q107: embedding centroid drift between two snapshots
    // (Similarity.embeddingDrift) — the embedding-space analog of the
    // q97 categorical drift monitor: per-dimension means of the
    // even-id vs odd-id snapshot and their |difference|. One
    // posexplode + dim-keyed aggregate per side; snapshots never join
    // row-to-row. round(6) of a ~250-value mean is engine-stable
    // (accumulation error ~1e-14 << 5e-7).
    Q("q107_embedding_drift",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.embeddingDrift(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1))
          .orderBy("j")
      },
      Some("""
        WITH ex AS (
          SELECT vec_id, unnest(embedding::DOUBLE[]) AS v,
                 unnest(generate_series(0, 63)) AS j
          FROM embeddings),
        ma AS (SELECT j, avg(v) AS m FROM ex WHERE vec_id % 2 = 0 GROUP BY j),
        mb AS (SELECT j, avg(v) AS m FROM ex WHERE vec_id % 2 = 1 GROUP BY j)
        SELECT ma.j AS j, round(ma.m, 6) AS mean_a,
               round(mb.m, 6) AS mean_b,
               round(abs(ma.m - mb.m), 6) AS drift
        FROM ma JOIN mb ON ma.j = mb.j
        ORDER BY ma.j""")),

    // ----- q181: semantic decontamination (Similarity
    // .semanticDecontaminate) — the embedding-space sibling of the
    // n-gram decontamination q49/q91: n-grams catch verbatim eval
    // leakage, cosine catches PARAPHRASED leakage. Eval set = every
    // 25th vector (small by definition — that is what makes the
    // broadcast nested-loop the right 100 TB plan: linear in the
    // corpus, bounded constant per row); per-doc max cosine vs the
    // whole eval set, thresholded at 0.35.
    Q("q181_semantic_decontaminate",
      (s, d) => {
        val emb = embeddings(s, d)
        Similarity.semanticDecontaminate(
            emb.filter(col("vec_id") % 25 =!= 0),
            emb.filter(col("vec_id") % 25 === 0), tau = 0.35)
          .orderBy("vec_id")
      },
      Some("""
        WITH ev AS (
          SELECT embedding::DOUBLE[] AS ev FROM embeddings
          WHERE vec_id % 25 = 0),
        corpus AS (
          SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings
          WHERE vec_id % 25 != 0)
        SELECT vec_id,
               round(max(list_cosine_similarity(cv, ev)), 4)
                 AS max_eval_cos,
               round(max(list_cosine_similarity(cv, ev)), 4) >= 0.35
                 AS contaminated
        FROM corpus, ev
        GROUP BY vec_id
        ORDER BY vec_id"""))
  )
}
