package graft.catalog

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Oracle-checked catalog entries for the multimodal (binary media)
  * operators over the committed fixture (`fixtures/multimodal/`, written
  * by [[graft.tools.MediaFixtureGen]]). The metadata-plane ops are fully
  * SQL-expressible so DuckDB checks them value-for-value; the decode
  * boundary (engine-internal stub) is rows-only.
  */
object MultimodalQueries {

  val FixtureDir = "/root/repo/fixtures/multimodal"

  private def media = s"'$FixtureDir/media.parquet/*.parquet'"

  private[graft] def multimodal: Seq[Q] = Seq(

    // ----- q50: exact byte-level dedup groups over the binary column —
    // the payload never shuffles, only its 128-bit digest.
    Q("q50_media_dedup",
      (s, _) =>
        Multimodal.byteDedupGroups(
          s.read.parquet(s"$FixtureDir/media.parquet"))
          .orderBy("fp"),
      Some(s"""
        SELECT md5(hex(bytes)) AS fp, min(media_id) AS keeper,
               count(*) AS group_size
        FROM $media
        GROUP BY 1
        ORDER BY fp""")),

    // ----- q51: joint text+embedding filter — caption token gate, then
    // near-dup CLUSTERS (connected components over cosine ≥ 0.98 pairs)
    // collapse to their min-id keeper. Exact pair source here so the
    // whole decision is DuckDB-reproducible (recursive CTE, the q37
    // technique); the LSH-blocked scale composition is q51s.
    Q("q51_media_joint_filter",
      (s, _) =>
        Multimodal.jointFilter(
          s.read.parquet(s"$FixtureDir/media.parquet"),
          minCaptionTokens = 3, dupThreshold = 0.98,
          pairSource = Multimodal.exactPairs)
          .select(col("media_id"), col("caption"))
          .orderBy("media_id"),
      Some(s"""
        WITH RECURSIVE pass AS (
          SELECT media_id, caption, embedding::DOUBLE[] AS v
          FROM $media
          WHERE len(list_filter(regexp_split_to_array(trim(lower(caption)), '\\s+'), xw -> xw <> '')) >= 3
        ),
        pairs AS (
          SELECT a.media_id AS id_a, b.media_id AS id_b
          FROM pass a JOIN pass b ON a.media_id < b.media_id
          WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.98),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        r(id, root) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id),
        drops AS (
          SELECT id FROM (SELECT id, min(root) AS component FROM r GROUP BY id)
          WHERE id <> component)
        SELECT media_id, caption FROM pass
        WHERE media_id NOT IN (SELECT id FROM drops)
        ORDER BY media_id""")),

    // ----- q51s: the SAME jointFilter composition on its default
    // LSH-blocked pair source at harness-SF volume (documents as captions,
    // embeddings joined on id) — the 100 TB wiring. The harness embeddings
    // are random (max pairwise cosine ≈ 0.51 at sf0.01), so near-dups are
    // PLANTED: every 7th row re-enters with a shifted id and a scaled
    // embedding. cosine(v, 1.5v) = 1 exactly and sign-LSH is
    // scale-invariant (identical sign pattern → same bucket in every
    // band), so blocking recall on the planted pairs is provably 1.0 —
    // which is what makes this LSH-blocked composition value-checkable in
    // DuckDB (exact pairs + the q37 recursive-CTE component collapse)
    // rather than rows-only.
    Q("q51s_joint_filter_scale",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id").as("media_id"), col("text").as("caption"))
          .join(Tables.embeddings(s, d)
            .select(col("vec_id").as("media_id"),
              col("embedding").cast("array<double>").as("embedding")),
            Seq("media_id"))
        // Planted ids live at the first power of 10 ABOVE max(doc_id) —
        // derived, not hard-coded, so a larger scale factor cannot collide
        // planted ids with real ones (which would silently corrupt the
        // embeddings join AND the oracle, since it replicated the same
        // constant). Digit-count arithmetic, not log10: exact on both
        // engines. One 1-row planning action.
        val maxId = Tables.documents(s, d).agg(max("doc_id")).head().getLong(0)
        val offset = math.pow(10, maxId.toString.length.toDouble).toLong
        val planted = base.filter(col("media_id") % 7 === 0)
          .select((col("media_id") + lit(offset)).as("media_id"),
            col("caption"),
            transform(col("embedding"), x => x * lit(1.5d)).as("embedding"))
        Multimodal.jointFilter(base.unionByName(planted),
          minCaptionTokens = 3, dupThreshold = 0.9)
          .select(col("media_id"))
          .orderBy("media_id")
      },
      Some(s"""
        WITH RECURSIVE base AS (
          SELECT d.doc_id AS media_id, d.text AS caption,
                 e.embedding::DOUBLE[] AS v
          FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        off AS (
          SELECT power(10, len(max(doc_id)::VARCHAR))::BIGINT AS o
          FROM documents),
        all_media AS (
          SELECT media_id, caption, v FROM base
          UNION ALL
          SELECT media_id + (SELECT o FROM off), caption,
                 list_transform(v, x -> x * 1.5)
          FROM base WHERE media_id % 7 = 0),
        pass AS (
          SELECT media_id, caption, v FROM all_media
          WHERE len(list_filter(regexp_split_to_array(trim(lower(caption)), '\\s+'), xw -> xw <> '')) >= 3),
        pairs AS (
          SELECT a.media_id AS id_a, b.media_id AS id_b
          FROM pass a JOIN pass b ON a.media_id < b.media_id
          WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.9),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION
          SELECT id_b, id_a FROM pairs),
        r(id, root) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id),
        drops AS (
          SELECT id FROM (SELECT id, min(root) AS component FROM r GROUP BY id)
          WHERE id <> component)
        SELECT media_id FROM pass
        WHERE media_id NOT IN (SELECT id FROM drops)
        ORDER BY media_id""")),

    // ----- q52: the decode boundary — per-partition feature extraction.
    // The decode/phash STUBS are pure deterministic byte arithmetic
    // (mean byte value; 64 block means thresholded on their average), so
    // DuckDB replays them value-for-value by unnesting hex(bytes) into
    // per-byte rows (the q36b discipline, applied to binary payloads).
    // The byte-unnest series bound (4095) covers payloads ≤ 4 KiB —
    // fixture payloads are 768 B; DuckDB's generate_series cannot take a
    // correlated/subquery bound. Bit 63 is mapped through two's
    // complement so the 64-bit phash lands in a signed BIGINT exactly as
    // Spark's LongType does.
    Q("q52_media_decode",
      (s, _) =>
        Multimodal.decodeFeatures(
          s.read.parquet(s"$FixtureDir/media.parquet"))
          .toDF()
          .select(col("media_id"), col("kind"), col("n_bytes"),
            round(col("mean_luma"), 4).as("mean_luma"), col("phash"))
          .orderBy("media_id"),
      Some(s"""
        $phashCtes
        SELECT m.media_id, m.kind, m.n AS n_bytes, luma.mean_luma, ph.phash
        FROM m JOIN luma USING (media_id) JOIN ph USING (media_id)
        ORDER BY media_id""")),

    // ----- q55: perceptual near-dup pairs — decode-once phash, then the
    // generic 16-bit-chunk pigeonhole blocking (Dedup.hammingNearDupPairs)
    // over 8-byte signatures. The oracle re-derives every phash from the
    // payload bytes (q52's CTEs) and takes hamming ≤ 2 pairs all-pairs —
    // exact on the 12-row fixture; the Spark side is the blocked
    // production shape, which at maxDist ≤ 3 has guaranteed recall, so
    // the two must agree row-for-row.
    Q("q55_phash_neardup",
      (s, _) =>
        Multimodal.phashNearDupPairs(
          s.read.parquet(s"$FixtureDir/media.parquet"), maxDist = 2)
          .orderBy("id_a", "id_b"),
      Some(s"""
        $phashCtes
        SELECT a.media_id AS id_a, b.media_id AS id_b
        FROM ph a JOIN ph b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 2
        ORDER BY id_a, id_b""")))

  /** Shared oracle CTEs replaying [[Multimodal.decodeStub]] /
    * [[Multimodal.phashStub]] in DuckDB: hex(bytes) → per-byte values →
    * mean luma + 64 block means → thresholded 64-bit hash (signed via
    * two's complement on bit 63). */
  private def phashCtes: String = s"""
        WITH m AS (
          SELECT media_id, kind, hex(bytes) AS hx,
                 octet_length(bytes)::BIGINT AS n
          FROM $media),
        b AS (
          SELECT media_id, i.i AS i,
                 ('0x' || substr(hx, (2*i.i + 1)::INT, 2))::INT AS v
          FROM m, generate_series(0, 4095) AS i(i)
          WHERE i.i < m.n),
        luma AS (
          SELECT media_id, round(sum(v)::DOUBLE / count(*), 4) AS mean_luma
          FROM b GROUP BY media_id),
        blk AS (SELECT media_id, greatest(n // 64, 1) AS block FROM m),
        bsum AS (
          SELECT b.media_id, (b.i // k.block)::INT AS bi,
                 sum(v)::DOUBLE / count(*) AS mean
          FROM b JOIN blk k USING (media_id)
          WHERE b.i // k.block < 64
          GROUP BY b.media_id, b.i // k.block),
        gridkeys AS (
          SELECT m.media_id, g.i::INT AS bi
          FROM m, generate_series(0, 63) AS g(i)),
        grid AS (
          SELECT gk.media_id, gk.bi, coalesce(bs.mean, 0.0) AS mean
          FROM gridkeys gk
          LEFT JOIN bsum bs
            ON bs.media_id = gk.media_id AND bs.bi = gk.bi),
        avgs AS (SELECT media_id, sum(mean) / 64 AS avg
                 FROM grid GROUP BY media_id),
        ph AS (
          SELECT grid.media_id,
                 (sum(CASE WHEN bi < 63 AND mean > avg
                      THEN (1::BIGINT << bi) ELSE 0 END)
                  + sum(CASE WHEN bi = 63 AND mean > avg
                        THEN (-9223372036854775807 - 1) ELSE 0 END))::BIGINT
                   AS phash
          FROM grid JOIN avgs USING (media_id) GROUP BY grid.media_id)"""
}
