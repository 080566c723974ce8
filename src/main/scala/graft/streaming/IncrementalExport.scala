package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.assemble.PropertyDoc
import graft.model.OntologyJob
import graft.sink.{OntologyWriter, UmlsExportConfig, WriteReport}
import graft.sources.UmlsSource

/** Incremental TTL regeneration (SURVEY.md §2.10's north-star extension —
  * the reference is run-once batch; nothing constrains these semantics):
  * a stream of MRCONSO delta rows (file drops, CDC feed, Kafka) drives
  * per-SAB re-export.
  *
  * Shape: deltas carry WHICH vocabularies changed; each micro-batch
  * projects the distinct SABs, intersects with the job manifest, and
  * re-runs the (deterministic, idempotent) ontology writer for exactly
  * those SABs against the authoritative store. Unchanged ontologies are
  * never touched — the 35-SAB full export becomes an O(changed) refresh.
  * `foreachBatch` keeps the writer's batch semantics (ordered single-file
  * contract) inside the streaming runtime.
  */
object IncrementalExport {

  final case class BatchResult(batchId: Long, reports: Seq[WriteReport])

  /** Start the refresh stream.
    *
    * @param deltas   streaming DataFrame with at least a `SAB` column
    *                 (e.g. `spark.readStream.schema(MRCONSO).parquet(dir)`)
    * @param source   the authoritative UMLS table store to re-read
    * @param onBatch  callback per micro-batch (metrics/tests)
    */
  def start(
      spark: SparkSession,
      deltas: DataFrame,
      source: UmlsSource,
      jobs: Seq[OntologyJob],
      conf: UmlsExportConfig,
      outDir: String,
      propertyDocs: Map[String, PropertyDoc],
      semanticTypes: String,
      checkpointDir: Option[String] = None,
      onBatch: BatchResult => Unit = _ => ()): StreamingQuery = {
    val writer = deltas.select("SAB").writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sabs = batch.distinct().collect().map(_.getString(0)).toSet
        val affected = jobs.filter(j => sabs.contains(j.sab))
        val reports = affected.map { job =>
          OntologyWriter.write(spark, source, job, conf,
            s"$outDir/${job.outFile}", propertyDocs, semanticTypes)
        }
        onBatch(BatchResult(batchId, reports))
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }
}
