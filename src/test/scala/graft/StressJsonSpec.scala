package graft

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** The stress harness's JSON emitter must stay parseable exactly when
  * it matters — on a failing run whose violation strings interpolate
  * arbitrary operator messages (r15 ADVICE #1). */
class StressJsonSpec extends AnyFunSuite {

  test("esc escapes quotes, backslashes, and control characters") {
    assert(StressJson.esc("""plain""") == "plain")
    assert(StressJson.esc("""a"b""") == """a\"b""")
    assert(StressJson.esc("""a\b""") == """a\\b""")
    assert(StressJson.esc("a\nb\tc\rd") == """a\nb\tc\rd""")
    // the \ u0001 below is pre-lexed by Scala into a REAL control
    // char; expected text is assembled to keep a literal backslash-u
    assert(StressJson.esc("x\u0001y") == "x\\" + "u0001y")
  }

  test("fragment with hostile violation strings parses as JSON") {
    val steps = ArrayBuffer("step \"one\"" -> 1.25)
    val facts = ArrayBuffer("n_docs" -> 42L)
    val violations = ArrayBuffer(
      """pair ("a","b") diverged at tok '\x' — got "c\d"""",
      "line\nbreak")
    val json = "{" + StressJson.fragment(steps, facts, violations) + "}"
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(json) // throws on malformed output
    val vs = (root \ "violations").asInstanceOf[JArray].arr
      .collect { case JString(s) => s }
    assert(vs == violations.toList) // escape round-trips the originals
    assert((root \ "facts" \ "n_docs") == JInt(42))
  }

  test("f3 is locale-stable") {
    val prior = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(StressJson.f3(1.5) == "1.500") // not "1,500"
    } finally java.util.Locale.setDefault(prior)
  }
}
