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

    // ----- q51: joint text+embedding filter — caption token gate AND
    // embedding-cosine near-dup exclusion vs lower-id survivors.
    Q("q51_media_joint_filter",
      (s, _) =>
        Multimodal.jointFilter(
          s.read.parquet(s"$FixtureDir/media.parquet"),
          minCaptionTokens = 3, dupThreshold = 0.98)
          .select(col("media_id"), col("caption"))
          .orderBy("media_id"),
      Some(s"""
        WITH pass AS (
          SELECT media_id, caption, embedding
          FROM $media
          WHERE len(regexp_split_to_array(trim(lower(caption)), '\\s+')) >= 3
        ),
        dup AS (
          SELECT DISTINCT a.media_id
          FROM pass a JOIN pass b ON a.media_id > b.media_id
          WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]) >= 0.98
        )
        SELECT media_id, caption FROM pass
        WHERE media_id NOT IN (SELECT media_id FROM dup)
        ORDER BY media_id""")),

    // ----- q52: the decode boundary — per-partition feature extraction
    // (n_bytes is checkable; mean_luma/phash come from the engine-internal
    // decode stub, so the driver records a rows-only check; determinism is
    // pinned by MultimodalSpec).
    Q("q52_media_decode",
      (s, _) =>
        Multimodal.decodeFeatures(
          s.read.parquet(s"$FixtureDir/media.parquet"))
          .toDF()
          .select(col("media_id"), col("kind"), col("n_bytes"),
            round(col("mean_luma"), 4).as("mean_luma"), col("phash"))
          .orderBy("media_id"),
      None))
}
