package graft.catalog

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The q189 Derby fixture loader after the multi-JVM fix (r16 verdict
  * #1's one serialization casualty): `jdbc:derby:memory:` is per-JVM
  * state, so the old `write.jdbc` load split-brained under a
  * local-cluster master — CREATE ran on the driver, INSERTs on
  * executors, and the partitioned read found no tables. The loader is
  * now a plain-JDBC JVM-local routine fed by collected fixture rows
  * (driver directly; executors through a barrier stage). This pins the
  * JVM-local half: full row counts, NULL preservation (MRSAT.CODE is
  * NULL by design — F5's filter subject, `umls2rdf.py:380-383`),
  * VARCHAR comparability for the range predicates, and idempotence
  * (replace, not append). The cross-JVM half is proven by the
  * local-cluster axis run (tools/run_local_cluster_axis.sh: 253 equal /
  * 0 differ, q189 included).
  */
class DerbyFixtureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("loader fills every fixture table with the parquet row counts, " +
      "preserves NULLs, keeps VARCHAR comparability, and a second " +
      "load replaces instead of appending") {
    UmlsQueries.DerbyUmls.ensure(spark)
    UmlsQueries.DerbyUmls.ensure(spark) // idempotent re-entry
    val conn = DriverManager.getConnection(UmlsQueries.DerbyUmls.url)
    try {
      def count(sql: String): Long = {
        val rs = conn.createStatement().executeQuery(sql)
        rs.next(); rs.getLong(1)
      }
      for (t <- Seq("MRCONSO", "MRREL", "MRDEF", "MRSAT", "MRRANK",
          "MRSAB", "MRSTY", "MRDOC")) {
        val parquetRows = spark.read
          .parquet(s"${UmlsQueries.FixtureDir}/$t.parquet").count()
        assert(count(s"SELECT COUNT(*) FROM $t") === parquetRows,
          s"table $t row count after double load")
      }
      // NULL CODE rows survive the typed setNull path
      val nullCodes = spark.read
        .parquet(s"${UmlsQueries.FixtureDir}/MRSAT.parquet")
        .filter("CODE IS NULL").count()
      assert(count("SELECT COUNT(*) FROM MRSAT WHERE CODE IS NULL")
        === nullCodes)
      // VARCHAR (not CLOB) columns: a string-literal range predicate —
      // the exact shape UmlsSource.rangeSplit pushes — must execute
      assert(count("SELECT COUNT(*) FROM MRCONSO WHERE CUI >= 'C0'") > 0L)
    } finally conn.close()
  }
}
