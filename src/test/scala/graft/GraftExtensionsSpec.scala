package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface: registered names evaluate with the same
  * semantics as the Scala plane, inside codegen (whole rows, not UDFs).
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  GraftExtensions.install(spark)

  private def one(sql: String): String =
    spark.sql(sql).collect()(0).getString(0)

  test("py_quote matches urllib.parse.quote semantics in SQL") {
    assert(one("SELECT py_quote('a b/c%')") === "a%20b/c%25")
    assert(one("SELECT py_quote('héllo')") === "h%C3%A9llo")
  }

  test("turtle_escape escapes backslashes before quotes") {
    assert(one("""SELECT turtle_escape('a\\b"c')""") === """a\\b\"c""")
  }

  test("stn_parent derives dotted and single-segment parents") {
    assert(one("SELECT stn_parent('A1.2.3')") === "A1.2")
    assert(one("SELECT stn_parent('A1')") === "A")
  }

  test("rel_fragment applies Python falsiness to RELA") {
    assert(one("SELECT rel_fragment('', 'CHD')") === "CHD")
    assert(one("SELECT rel_fragment('part_of', 'RO')") === "part_of")
    assert(one("SELECT rel_fragment(NULL, 'RB')") === "RB")
  }

  test("functions run over columns (codegen path), not just literals") {
    import spark.implicits._
    val got = Seq("A1.2", "B3").toDF("stn")
      .selectExpr("stn_parent(stn) AS p")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("A1", "B"))
  }
}
