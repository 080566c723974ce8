package graft.functions

import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Vectors + properties for the Python-`urllib.parse.quote`-compatible
  * percent encoder (C3, `umls2rdf.py:124-129`) — the one correctness-
  * critical scalar: term-URI equality with the reference depends on it.
  * Expected vectors were produced with CPython's `urllib.parse.quote`
  * (default `safe='/'`).
  */
class PyQuoteSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val vectors = Seq(
    "abc" -> "abc",
    "a b" -> "a%20b",            // space -> %20, never '+'
    "a/b" -> "a/b",              // '/' is safe by default
    "50%" -> "50%25",
    "a_b.c-d~e" -> "a_b.c-d~e",  // unreserved kept
    "café" -> "caf%C3%A9",       // non-ASCII -> UTF-8 bytes
    "日本" -> "%E6%97%A5%E6%9C%AC",
    "<>" -> "%3C%3E",
    "a+b" -> "a%2Bb",            // '+' is NOT safe (URLEncoder would differ)
    "V-HL7V3.0" -> "V-HL7V3.0",
    "C12 34(x)" -> "C12%2034%28x%29",
    "" -> "")

  test("matches urllib.parse.quote on reference vectors") {
    vectors.foreach { case (in, out) =>
      assert(PyQuote.quote(in) == out, s"quote($in)")
    }
  }

  test("output only contains unreserved chars, '/', or %XX uppercase hex") {
    check(Prop.forAll { (s: String) =>
      val q = PyQuote.quote(s)
      var ok = true
      var i = 0
      while (i < q.length && ok) {
        val c = q.charAt(i)
        if (c == '%') {
          ok = i + 2 < q.length &&
            "0123456789ABCDEF".indexOf(q.charAt(i + 1)) >= 0 &&
            "0123456789ABCDEF".indexOf(q.charAt(i + 2)) >= 0
          i += 3
        } else {
          ok = (c < 128 && c.isLetterOrDigit) || "_.-~/".indexOf(c.toInt) >= 0
          i += 1
        }
      }
      ok
    })
  }

  test("percent-decoding round-trips to the original UTF-8 string") {
    check(Prop.forAll { (s: String) =>
      val q = PyQuote.quote(s)
      val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var i = 0
      while (i < q.length) {
        if (q.charAt(i) == '%') {
          bytes += Integer.parseInt(q.substring(i + 1, i + 3), 16).toByte
          i += 3
        } else { bytes += q.charAt(i).toByte; i += 1 }
      }
      new String(bytes.toArray, "UTF-8") == s
    })
  }

  test("urlTerm appends exactly one slash") {
    assert(UriFunctions.urlTerm("http://x.org/ns", "a b") == "http://x.org/ns/a%20b")
    assert(UriFunctions.urlTerm("http://x.org/ns/", "a b") == "http://x.org/ns/a%20b")
  }
}
