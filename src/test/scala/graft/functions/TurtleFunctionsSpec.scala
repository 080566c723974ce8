package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Scalar render-helper behavior; the load-bearing case is the language
  * map's two modes (the reference indexes the dict directly and KeyErrors
  * on an unmapped LAT, `umls2rdf.py:92,766`).
  */
class TurtleFunctionsSpec extends AnyFunSuite {
  import TurtleFunctions._

  test("mapLang maps known LATs case-insensitively") {
    assert(mapLang("ENG") === "en")
    assert(mapLang("fre") === "fr")
    assert(mapLang("BAQ") === "eu")
  }

  test("mapLang lenient default passes an unmapped LAT through lowercased") {
    assert(mapLang("XXX") === "xxx")
    assert(mapLang("xxx", strict = false) === "xxx")
    assert(mapLang(null) === "")
  }

  test("mapLang strict mode reproduces the reference's KeyError") {
    val ex = intercept[IllegalStateException](mapLang("XXX", strict = true))
    assert(ex.getMessage.contains("xxx"))
    // known LATs still map fine under strict
    assert(mapLang("ENG", strict = true) === "en")
  }
}
