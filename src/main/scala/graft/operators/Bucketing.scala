package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed at-rest layout: the co-located join. When both sides of a
  * recurring join are written bucketed (and sorted) on the join key with
  * the same bucket count, Spark's scan reports the hash distribution the
  * join needs and the sort-merge join runs with ZERO exchanges and zero
  * sorts — the single biggest shuffle eliminator for a 100 TB fact⋈fact
  * join that runs every pipeline pass (pay the layout once at write
  * time, skip the shuffle on every read).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table at `path`,
    * registering it as `tableName` (bucketing metadata lives in the
    * session catalog — that's how the scan learns the distribution). */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      bucketCol: String, nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .option("path", path)
      .saveAsTable(tableName)
  }

  /** Bucket both sides on their join keys (same bucket count), read
    * back through the catalog, and inner-join — the exchange-free plan.
    * `BucketingSpec` pins the zero-exchange property. */
  def cojoin(left: DataFrame, leftKey: String, right: DataFrame,
      rightKey: String, nBuckets: Int, dir: String): DataFrame = {
    val spark = left.sparkSession
    writeBucketed(left, "graft_bkt_l", s"$dir/graft_bkt_l", leftKey,
      nBuckets)
    writeBucketed(right, "graft_bkt_r", s"$dir/graft_bkt_r", rightKey,
      nBuckets)
    spark.table("graft_bkt_l").join(spark.table("graft_bkt_r"),
      spark.table("graft_bkt_l")(leftKey) ===
        spark.table("graft_bkt_r")(rightKey))
  }
}
