package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Integration test for the JDBC source (S1/S2, `umls2rdf.py:149-151` and
  * the `:228-259` pagination it replaces) against an embedded Derby — the
  * one in-container database (it ships with Spark for the Hive metastore).
  * Loads the committed UMLS fixture parquet into Derby VARCHAR tables,
  * then asserts the partitioned JDBC read is value-identical to the
  * parquet path, genuinely split, and filter-pushed.
  */
class JdbcSourceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val fixtureDir = "/root/repo/fixtures/umls"
  private val url = "jdbc:derby:memory:graftumls;create=true"
  private lazy val props = {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft-derby").toString)
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  /** Explicit VARCHAR DDL: Spark's Derby dialect maps StringType to CLOB,
    * which Derby won't compare with string literals — range predicates
    * and SAB pushdown need real VARCHARs. */
  private def load(name: String): DataFrame = {
    val df = spark.read.parquet(s"$fixtureDir/$name.parquet")
    val conn = DriverManager.getConnection(url)
    try {
      val ddl = df.columns
        .map(c => s""""$c" VARCHAR(4000)""").mkString(", ")
      conn.createStatement().execute(s"CREATE TABLE $name ($ddl)")
    } finally conn.close()
    df.write.mode("append").jdbc(url, name, props)
    df
  }

  private lazy val consoParquet = load("MRCONSO")
  private lazy val relParquet = load("MRREL")

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] = {
    val ordered = df.select(df.columns.sorted.map(col).toIndexedSeq: _*)
    ordered.collect().map(_.toSeq).toSeq
      .sortBy(_.map(String.valueOf).mkString("\u0000"))
  }

  test("partitioned JDBC read is value-identical to the parquet path, " +
    "complete and disjoint across 3 genuinely non-empty partitions") {
    val cuis = consoParquet.select("CUI").distinct()
      .orderBy("CUI").collect().map(_.getString(0))
    // cut points at the CUI distribution's thirds — the documented
    // production recipe (UMLS CUIs are dense C<7 digits>)
    val cuts = Seq(cuis(cuis.length / 3), cuis(2 * cuis.length / 3))
    val src = UmlsSource.jdbc(spark, url, props, numPartitions = 3,
      split = UmlsSource.rangeSplit(cuts))
    val viaJdbc = src.table("MRCONSO")
    assert(viaJdbc.rdd.getNumPartitions === 3)
    // every row exactly once (completeness AND disjointness), values equal
    assert(sortedRows(viaJdbc) === sortedRows(consoParquet))
    val perPart = viaJdbc.rdd
      .mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) >= 2, perPart.mkString(","))
  }

  test("MRREL splits on CUI2 and stays value-identical") {
    val expected = sortedRows(relParquet) // loads the Derby table first
    val src = UmlsSource.jdbc(spark, url, props, numPartitions = 3,
      split = UmlsSource.rangeSplit(Seq("C1", "C2")))
    val viaJdbc = src.table("MRREL")
    assert(viaJdbc.rdd.getNumPartitions === 3)
    assert(sortedRows(viaJdbc) === expected)
  }

  test("SAB filter is pushed into the JDBC scan, not applied in Spark") {
    val src = UmlsSource.jdbc(spark, url, props, numPartitions = 1)
    val filtered = src.table("MRCONSO").filter(col("SAB") === "FIX")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("SAB"),
      plan.take(800))
    assert(filtered.count() ===
      consoParquet.filter(col("SAB") === "FIX").count())
  }

  test("q189 (the benched JDBC assembly) pushes its SAB filters into " +
    "the JDBC scans — pushdown holds on the timed path, not just the " +
    "toy plan above") {
    val q = graft.catalog.Queries.all
      .find(_.name == "q189_jdbc_assembly").get
    val df = q.run(spark, "")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation"), plan.take(500))
    val scanLines = plan.split('\n').filter(_.contains("JDBCRelation"))
    assert(scanLines.nonEmpty)
    assert(scanLines.exists(l =>
      l.contains("PushedFilters") && l.contains("SAB")),
      scanLines.mkString("\n"))
    // and the entry stays value-identical to the parquet-path q25
    val q25 = graft.catalog.Queries.all
      .find(_.name == "q25_concept_assemble").get
    assert(sortedRows(df) === sortedRows(q25.run(spark, "")))
  }

  test("crc32Split and rangeSplit emit complete, disjoint predicate sets") {
    assert(UmlsSource.crc32Split("CUI", 4, 2) === "crc32(CUI) % 4 = 2")
    val split = UmlsSource.rangeSplit(Seq("C0002", "C0005"))
    assert(split("CUI", 3, 0) === "CUI < 'C0002'")
    assert(split("CUI", 3, 1) === "CUI >= 'C0002' AND CUI < 'C0005'")
    assert(split("CUI", 3, 2) === "CUI >= 'C0005'")
    intercept[IllegalArgumentException](split("CUI", 4, 0))
  }
}
