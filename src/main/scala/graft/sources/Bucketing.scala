package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed at-rest layout for shuffle-free co-located joins.
  *
  * The engine's fat-table joins (MRCONSO ⋈ MRREL on CUI/AUI, atoms ⋈
  * fingerprints, …) shuffle both sides by the join key on every run. At
  * lake scale the standing fix is to WRITE the tables bucketed by that
  * key: when both sides' bucket spec matches the join keys, Catalyst
  * plans the join with no Exchange at all — each task reads matching
  * bucket files from both sides (BucketedJoinSpec pins the plan shape).
  *
  * `sortBy` inside each bucket additionally lets sort-merge join skip its
  * per-task sort.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted table (`saveAsTable` — bucket
    * metadata lives in the session catalog; plain `.parquet()` paths
    * cannot carry it). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}
