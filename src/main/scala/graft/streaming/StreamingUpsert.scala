package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Warehouse

/** Continuous distribution monitoring: per micro-batch PSI of a score
  * column against a STATIC reference sample — drift surfaces within one
  * trigger of the feed going bad, not at the next nightly report. Each
  * batch appends one (batch_id, n_cur, n_ref, psi) row; the PSI itself
  * is [[graft.operators.Layout.psiScore]], so batch and streaming
  * monitoring share one definition.
  */
object StreamingDrift {
  def psiMonitor(stream: DataFrame, reference: DataFrame,
      scoreCol: String, outPath: String, checkpoint: String,
      nBuckets: Int = 10): org.apache.spark.sql.streaming.StreamingQuery = {
    // freeze the static reference ONCE: psiScore aggregates it twice
    // per call (bounds + bucket counts), so a lake-backed reference was
    // re-scanned twice on EVERY trigger (r14 review). The eager
    // checkpoint's blocks live until the session ends — the monitor's
    // reference is a bounded sample by contract.
    val ref = reference.localCheckpoint()
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          if (!batch.isEmpty) {
            // per-batch partition dir + overwrite = replay-idempotent
            // (an append sink would double-count a replayed batch)
            graft.operators.Layout
              .psiScore(batch.toDF(), ref, scoreCol, nBuckets)
              .write.mode("overwrite")
              .parquet(s"$outPath/batch_id=$batchId")
          }
      }
      .start()
  }
}

/** Streaming MERGE INTO: maintain a keyed snapshot at rest from a stream
  * of change rows (op ∈ I/U/D) — the materialized-view maintenance loop
  * a metadata plane runs continuously (license flags, takedown state,
  * quality tiers), built from [[Warehouse.cdcMerge]] per micro-batch.
  *
  * Idempotency contract (exactly-once effect under at-least-once
  * foreachBatch): snapshots are IMMUTABLE VERSIONED directories
  * `snap_v<batchId>`. A batch reads the latest version with id < its own
  * batchId — never its own (possibly partial) output — merges, and
  * overwrites `snap_v<batchId>`. Replaying a batch after a crash
  * re-reads the same predecessor and rewrites the same directory: the
  * final state is byte-identical to a single run. Old versions double as
  * time travel; vacuum them by retention like any table format.
  *
  * In-batch ordering: multiple changes to one key within a micro-batch
  * are collapsed last-writer-wins by `seqCol` (a total order the SOURCE
  * provides — relying on micro-batch row order would be
  * nondeterministic).
  */
object StreamingUpsert {

  def streamingUpsert(changes: DataFrame, snapshotPath: String,
      checkpoint: String, keyCol: String, payloadCols: Seq[String],
      seqCol: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         batchId: Long) =>
          // an empty batch changes nothing: skipping it avoids rewriting
          // the whole snapshot per quiet trigger (r14 review) — readers
          // take "latest committed < batchId", so version-chain gaps are
          // already tolerated
          if (!batch.isEmpty)
            upsertBatch(batch.toDF(), batchId, snapshotPath, keyCol,
              payloadCols, seqCol)
      }
      .start()

  /** Committed snapshot versions under `snapshotPath`, ascending. */
  private[streaming] def versions(spark: SparkSession,
      snapshotPath: String): Seq[Long] = {
    val p = new Path(snapshotPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("snap_v"))
      // only versions whose write COMMITTED (parquet _SUCCESS marker):
      // a crash mid-write leaves a directory without it, which the next
      // read must not trust
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("snap_v").toLong)
      .sorted
  }

  /** Latest committed snapshot. Throws if no version has committed yet —
    * cold start is [[upsertBatch]]'s job (it merges into an empty base),
    * not a read-path concern; a reader asking before the first commit is
    * a wiring bug better surfaced loudly. */
  def latestSnapshot(spark: SparkSession, snapshotPath: String,
      keyCol: String, payloadCols: Seq[String]): DataFrame =
    versions(spark, snapshotPath).lastOption match {
      case Some(v) => spark.read.parquet(s"$snapshotPath/snap_v$v")
        .select((keyCol +: payloadCols).map(col): _*)
      case None => throw new IllegalStateException(
        s"no committed snapshot under $snapshotPath")
    }

  /** Time-travel read: the snapshot as of `version` — the latest
    * committed version with id ≤ `version` (immutable version dirs make
    * this free; vacuum old versions by retention to bound storage). */
  def snapshotAt(spark: SparkSession, snapshotPath: String, version: Long,
      keyCol: String, payloadCols: Seq[String]): DataFrame =
    versions(spark, snapshotPath).filter(_ <= version).lastOption match {
      case Some(v) => spark.read.parquet(s"$snapshotPath/snap_v$v")
        .select((keyCol +: payloadCols).map(col): _*)
      case None => throw new IllegalStateException(
        s"no committed snapshot at or before v$version under $snapshotPath")
    }

  /** One micro-batch, factored out so replay idempotency is directly
    * testable: calling twice with the same batchId (checkpoint recovery)
    * leaves the snapshot chain exactly as one call would. */
  private[streaming] def upsertBatch(bdf: DataFrame, batchId: Long,
      snapshotPath: String, keyCol: String, payloadCols: Seq[String],
      seqCol: String): Unit = {
    val spark = bdf.sparkSession
    val prev = versions(spark, snapshotPath).filter(_ < batchId)
      .lastOption
    val base = prev match {
      case Some(v) =>
        spark.read.parquet(s"$snapshotPath/snap_v$v")
          .select((keyCol +: payloadCols).map(col): _*)
      case None =>
        bdf.select((keyCol +: payloadCols).map(col): _*).limit(0)
    }
    // last writer (max seqCol) wins per key within the batch; ties on
    // seq broken by op so the collapse is total-order deterministic.
    // distinct: seqCol listed in payloadCols (persisting the version in
    // the snapshot is natural wiring) would otherwise duplicate the
    // struct field and make `__last.<seqCol>` ambiguous (r14 review)
    val collapsed = bdf
      .groupBy(col(keyCol))
      .agg(max_by(
        struct((Seq("op", seqCol) ++ payloadCols).distinct.map(col): _*),
        struct(col(seqCol), col("op"))).as("__last"))
      .select(col(keyCol) +: (Seq("op") ++ payloadCols).distinct
        .map(c => col(s"__last.$c").as(c)): _*)
    Warehouse.cdcMerge(base, collapsed, keyCol, payloadCols)
      .write.mode("overwrite").parquet(s"$snapshotPath/snap_v$batchId")
  }
}
