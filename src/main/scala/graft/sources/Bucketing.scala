package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed at-rest layout for shuffle-free co-located joins.
  *
  * The engine's fat-table joins (MRCONSO ⋈ MRREL on CUI/AUI, atoms ⋈
  * fingerprints, …) shuffle both sides by the join key on every run. At
  * lake scale the standing fix is to WRITE the tables bucketed by that
  * key: when both sides' bucket spec matches the join keys, Catalyst
  * plans the join with no Exchange at all — each task reads matching
  * bucket files from both sides (BucketedJoinSpec and BucketingSpec pin
  * the plan shape; q132 oracle-checks that bucketing never changes
  * values).
  *
  * `sortBy` inside each bucket additionally lets sort-merge join skip its
  * per-task sort.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted MANAGED table (`saveAsTable` —
    * bucket metadata lives in the session catalog; plain `.parquet()`
    * paths cannot carry it). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** [[writeBucketed]] with an EXPLICIT external path (catalog queries
    * must not write into the default warehouse under the repo cwd) and
    * re-entrant registration. */
  def writeBucketedAt(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Bucket both sides on their join keys (same bucket count), read back
    * through the catalog, and inner-join — the exchange-free, sort-free
    * plan a recurring fact⋈fact join should pay layout once for. */
  def cojoin(left: DataFrame, leftKey: String, right: DataFrame,
      rightKey: String, nBuckets: Int, dir: String): DataFrame = {
    val spark = left.sparkSession
    writeBucketedAt(left, "graft_bkt_l", s"$dir/graft_bkt_l", leftKey,
      nBuckets)
    writeBucketedAt(right, "graft_bkt_r", s"$dir/graft_bkt_r", rightKey,
      nBuckets)
    spark.table("graft_bkt_l").join(spark.table("graft_bkt_r"),
      spark.table("graft_bkt_l")(leftKey) ===
        spark.table("graft_bkt_r")(rightKey))
  }
}
