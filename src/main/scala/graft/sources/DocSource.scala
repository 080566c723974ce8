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

  /** WARC (Web ARChive, ISO 28500) source — the container format of web
    * crawls (CommonCrawl ships ~100 TB/month of it), and therefore the
    * front door of most LLM training pipelines.
    *
    * Scale design: records are split with Hadoop's record-delimiter
    * text input (`textinputformat.record.delimiter` =
    * `\r\n\r\nWARC/1.0\r\n`), which is BLOCK-SPLITTABLE — a multi-GB
    * .warc parallelizes across executors on block boundaries with no
    * per-file driver work, the same property the JSONL/CSV readers
    * guarantee. Everything after the split is one codegen'd projection:
    * header fields by anchored regex, payload framed by slicing exactly
    * `Content-Length` BYTES (slice on the UTF-8 `encode` of the tail —
    * a char slice would mis-frame every multibyte payload).
    *
    * Records whose mandatory framing is missing (no parseable
    * Content-Length) surface with NULL data columns and the raw record
    * in `_corrupt` — the JSONL PERMISSIVE discipline; a crawl shard with
    * one mangled record must not kill the pipeline.
    *
    * Honest limits, documented as such: payloads are treated as UTF-8
    * text (binary payloads — gzip members, images — belong to the
    * binaryFile/multimodal path, [[graft.operators.Multimodal]]); a
    * payload CONTAINING the delimiter byte sequence (`\r\n\r\nWARC/`)
    * would split early (never observed in practice; strict
    * Content-Length framing needs a custom InputFormat, the upgrade
    * path if it ever matters).
    *
    * The delimiter is VERSION-AGNOSTIC (`WARC/` without the number):
    * pinning `WARC/1.0` would make every record after the first in a
    * WARC/1.1 file (wget ≥1.19, modern IIPC tooling) vanish silently
    * into the first record's discarded tail — well-formed input, total
    * data loss. The version remnant left by the split is stripped per
    * record.
    *
    * `.warc.gz` works through Hadoop's codec auto-detection (spec'd),
    * with the standard gzip trade: a gzipped file decompresses in ONE
    * task (not block-splittable) — crawl corpora parallelize across
    * their many files, which is exactly how CommonCrawl shards. The
    * `path` may be a file, directory, or glob.
    */
  def warc(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\r\n\r\nWARC/")
    val raw = spark.sparkContext
      .newAPIHadoopFile(path, classOf[TextInputFormat],
        classOf[LongWritable], classOf[Text], conf)
      .map(_._2.toString) // copy out of Hadoop's reused Text buffer
    val df = spark.createDataFrame(
      raw.map(org.apache.spark.sql.Row(_)),
      StructType(Seq(StructField("rec", StringType))))
    // After the split, every record but the file-leading one starts with
    // the version remnant ("1.0\r\n" / "1.1\r\n"); the leading one keeps
    // its full "WARC/x.y\r\n" line. Strip either form, then split
    // headers from payload at the first blank line.
    def hdr(name: String) =
      regexp_extract(col("headers"), "(?mi)^" + name + ":\\s*(.+?)\\r?$", 1)
    val parsed = df
      .filter(length(trim(col("rec"))) > 0)
      .withColumn("body",
        regexp_replace(col("rec"), "^(WARC/)?[0-9]+\\.[0-9]+\r\n", ""))
      .withColumn("headers", substring_index(col("body"), "\r\n\r\n", 1))
      .withColumn("tail_bytes",
        encode(expr("substring(body, length(headers) + 5)"), "UTF-8"))
      .withColumn("content_length",
        nullif(regexp_extract(col("headers"),
          "(?mi)^Content-Length:\\s*(\\d+)\\r?$", 1), lit("")).cast("long"))
    parsed.select(
      when(col("content_length").isNotNull, hdr("WARC-Type"))
        .as("warc_type"),
      when(col("content_length").isNotNull, hdr("WARC-Record-ID"))
        .as("record_id"),
      when(col("content_length").isNotNull, hdr("WARC-Date"))
        .as("warc_date"),
      when(col("content_length").isNotNull,
        nullif(hdr("WARC-Target-URI"), lit(""))).as("target_uri"),
      when(col("content_length").isNotNull,
        decode(expr("substring(tail_bytes, 1, content_length)"), "UTF-8"))
        .as("payload"),
      col("content_length"),
      when(col("content_length").isNull, col("rec")).as("_corrupt"))
  }

  /** The valid records of a WARC read (corrupt records dropped). */
  def warcRecords(spark: SparkSession, path: String): DataFrame =
    warc(spark, path).filter(col("_corrupt").isNull).drop("_corrupt")

  /** Crawl → corpus ingestion: HTTP response records reduced to
    * (url, fetched_at, http_status, text) with markup stripped — the
    * composition a crawl pipeline runs first ([[warcRecords]] ∘ HTTP
    * de-enveloping ∘ [[graft.operators.WebText.stripMarkup]]). */
  def warcDocs(spark: SparkSession, path: String): DataFrame = {
    val resp = warcRecords(spark, path)
      .filter(col("warc_type") === "response" &&
        col("payload").startsWith("HTTP/"))
      .withColumn("http_status",
        regexp_extract(col("payload"), "^HTTP/[0-9.]+\\s+(\\d{3})", 1)
          .cast("int"))
      .withColumn("http_body",
        expr("substring(payload, instr(payload, '\r\n\r\n') + 4)"))
    resp.select(
      col("target_uri").as("url"),
      col("warc_date").as("fetched_at"),
      col("http_status"),
      graft.operators.WebText.stripMarkup(col("http_body")).as("text"))
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
