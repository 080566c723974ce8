package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) document source — the interchange
  * format of LLM training corpora (one JSON object per line; the RRF
  * reader in [[UmlsSource]] plays the same role for UMLS releases).
  *
  * Design points for the 100 TB case:
  *   - the schema is EXPLICIT, never inferred — inference is a full
  *     extra pass over the data before the first real query;
  *   - reads are line-splittable (`multiLine = false`), so a large file
  *     parallelizes across executors on block boundaries;
  *   - corrupt lines go to a `_corrupt` column (PERMISSIVE mode) instead
  *     of failing the job — a crawl shard with one bad line must not
  *     kill a pipeline; callers drop or count them explicitly.
  */
object DocSource {

  /** The document-corpus schema ([[graft.catalog.Tables.documents]]'
    * shape minus the derived n_chars). */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** Read JSONL with an explicit schema; malformed lines surface as rows
    * whose data columns are NULL and whose `_corrupt` column holds the
    * raw line. Fields missing from a line are NULL; fields not in the
    * schema are ignored. */
  def jsonl(spark: SparkSession, path: String,
      schema: StructType = documentSchema): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("multiLine", "false")
      .json(path)

  /** The valid rows of a JSONL read (corrupt lines dropped), in the
    * document-corpus shape. */
  def jsonlDocs(spark: SparkSession, path: String): DataFrame =
    jsonl(spark, path)
      .filter(col("_corrupt").isNull && col("doc_id").isNotNull)
      .drop("_corrupt")

  /** Read CSV in RFC-4180 form (header, quoted fields, doubled-quote
    * escapes) with an explicit schema. `escape = "` makes Spark's parser
    * treat `""` inside a quoted field as a literal quote — the RFC form
    * DuckDB and every spreadsheet writer emit (Spark's default escape is
    * backslash, a convention CSV corpora do not follow). Line-splittable
    * (`multiLine` stays false): embedded newlines inside quotes are NOT
    * supported — that trade keeps a 100 TB read parallel on block
    * boundaries instead of one task per file. Malformed lines surface in
    * `_corrupt` like [[jsonl]]. */
  def csv(spark: SparkSession, path: String,
      schema: StructType = documentSchema): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", StringType))
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** The valid rows of a CSV read, in the document-corpus shape. */
  def csvDocs(spark: SparkSession, path: String): DataFrame =
    csv(spark, path)
      .filter(col("_corrupt").isNull && col("doc_id").isNotNull)
      .drop("_corrupt")

  /** One-row read report: valid/corrupt line counts — the load-time
    * health probe (S3 spirit: umls2rdf.py's row-count validation).
    *
    * Spark refuses a raw-file query whose only referenced column is the
    * internal corrupt-record column (after pruning, that is exactly this
    * aggregation), so the parsed frame is cached first — the documented
    * workaround, and the report is a bounded two-column probe, not a
    * corpus materialization. The cache is released eagerly after the
    * 1-row aggregate is computed. */
  def jsonlReadReport(spark: SparkSession, path: String): DataFrame = {
    val parsed = jsonl(spark, path).select(col("doc_id"), col("_corrupt"))
      .cache()
    val report = parsed.agg(
      sum(when(col("_corrupt").isNull, 1).otherwise(0)).as("n_valid"),
      sum(when(col("_corrupt").isNotNull, 1).otherwise(0)).as("n_corrupt"))
    val materialized = report.collect()
    parsed.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(materialized.toSeq), report.schema)
  }

  /** Schema-evolution read: union parquet snapshot generations whose
    * schemas DIFFER (columns added over time) into one frame — missing
    * columns become NULL. This is Spark's `mergeSchema` footer
    * reconciliation, the lakehouse contract for reading a table across
    * an ADD COLUMN: old files stay valid, no rewrite.
    *
    * Cost note: mergeSchema reads every file footer at planning time —
    * fine for generation roots like these; at a million files you pin
    * the merged schema in a table format instead. */
  def readEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
}
