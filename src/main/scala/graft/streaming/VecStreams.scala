package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType,
  StringType, StructField, StructType}

import graft.operators.IvfIndex

/** Streaming embedding ingestion into a serving-ready IVF layout: tail
  * a growing directory of embedding deliveries (a .jsonl shard per
  * upstream embedding job) and maintain the
  * [[graft.operators.IvfIndex.writeClustered]] at-rest layout
  * incrementally — each arriving vector is assigned to its inverted
  * list as it lands, so [[graft.operators.IvfIndex.clusteredTopK]]
  * serves queries over the union of everything ingested so far with
  * partition pruning intact.
  *
  * This is the production IVF ingestion shape: the coarse quantizer is
  * TRAINED offline (a batch job, retrained on drift — the stream never
  * moves centroids, so earlier partitions stay valid), and the stream
  * only ASSIGNS — a stateless per-batch projection under
  * broadcast-literal centroids. No shuffle, no streaming state store,
  * nothing driver-bound; at 100 TB the cost is one codegen'd argmin
  * fold per vector.
  *
  * Exactly-once, same contract as [[DocStreams]]: the file source
  * checkpoints which shards are consumed; each micro-batch writes
  * `batch=<id>/cluster=<c>` partitions with writer-scoped DYNAMIC
  * overwrite, so checkpoint replay after a crash overwrites the
  * half-written batch partitions instead of duplicating them
  * (idempotent by construction, directly testable via
  * [[clusterBatch]]). `cluster` stays a partition column, so probe
  * pruning works across every batch directory.
  */
object VecStreams {

  val vectorSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  final case class ClusterReport(batchId: Long, nVectors: Long,
    nCorrupt: Long, nClusters: Long)

  /** The streaming read: explicit schema (vec_id, embedding),
    * PERMISSIVE corrupt capture, bounded files per trigger. */
  def jsonlTail(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(vectorSchema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("multiLine", "false")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Start the ingest: vectors → `outPath` as the incremental
    * clustered layout under FIXED `centroids`. Caller stops the
    * returned query. */
  def clusteredIngest(vecs: DataFrame, centroids: Array[Array[Double]],
      outPath: String, checkpoint: String,
      onBatch: ClusterReport => Unit = _ => ()): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          clusterBatch(batch.toDF(), batchId, centroids, outPath, onBatch)
      }
      .start()

  /** One micro-batch, factored out so the replay contract is directly
    * testable: running the same `batchId` twice leaves the sink exactly
    * as a single run would. Malformed or incomplete rows are dropped
    * and counted (an embedding delivery with a truncated line must not
    * kill the index). */
  private[streaming] def clusterBatch(bdf: DataFrame, batchId: Long,
      centroids: Array[Array[Double]], outPath: String,
      onBatch: ClusterReport => Unit): Unit = {
    val cached = bdf.cache()
    try {
      val valid = cached
        .filter(col("_corrupt").isNull && col("vec_id").isNotNull &&
          col("embedding").isNotNull &&
          size(col("embedding")) === centroids.head.length &&
          // a NaN component makes the vector unassignable (the argmin
          // guard now fails loudly, r14) — for a STREAM that must mean
          // counted-and-dropped, not a dead query
          !exists(col("embedding"), x => isnan(x)))
        .drop("_corrupt")
      val clustered = IvfIndex.withCluster(valid, centroids)
        .withColumn("batch", lit(batchId))
        .cache()
      try {
        clustered
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch", "cluster").parquet(outPath)
        val agg = clustered.agg(count(lit(1)),
          countDistinct(col("cluster"))).head()
        onBatch(ClusterReport(batchId, agg.getLong(0),
          cached.count() - agg.getLong(0), agg.getLong(1)))
      } finally clustered.unpersist()
    } finally cached.unpersist()
  }
}
