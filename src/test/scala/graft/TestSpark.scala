package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.sources.UmlsSource

/** One shared local SparkSession for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1048576")
    .getOrCreate()

  /** Build a fixture UMLS table: missing columns become "" (the RRF/MySQL
    * absent value — empty string, not NULL; SURVEY.md §7.3 hard-part #2). */
  def mkTable(name: String, rows: Seq[Map[String, String]]): DataFrame = {
    val schema = UmlsSource.schemaOf(name)
    val data = rows.map(m =>
      Row.fromSeq(schema.fieldNames.toSeq.map(f => m.getOrElse(f, ""))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1, data.size min 2)),
      schema)
  }

  /** Fixture source where unspecified tables are empty. */
  def fixedSource(tables: Map[String, DataFrame]): UmlsSource =
    new UmlsSource {
      def table(name: String): DataFrame =
        tables.getOrElse(name, UmlsSource.empty(spark, name))
    }
}
