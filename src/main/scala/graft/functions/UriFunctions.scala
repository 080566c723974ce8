package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC-3986 percent-encoding with EXACTLY the semantics of Python's
  * `urllib.parse.quote(s)` (default `safe='/'`), which the reference uses
  * to build term URIs (`umls2rdf.py:124-129`).
  *
  * Unreserved (kept verbatim): ALPHA / DIGIT / `_.-~` plus safe `/`.
  * Everything else → UTF-8 bytes → `%XX` uppercase hex. Note this is NOT
  * `java.net.URLEncoder` (which emits `+` for space and encodes `/`) —
  * URI equality with the reference depends on this distinction.
  */
object PyQuote {
  private val hex = "0123456789ABCDEF"

  @inline private def unreservedChar(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') ||
      c == '_' || c == '.' || c == '-' || c == '~' || c == '/'

  def quote(s: String): String = {
    // Fast path (r20, guide §1.2): codes/fragments are overwhelmingly
    // all-unreserved ASCII, where quote(s) == s — skip the UTF-8
    // byte-array + builder allocation entirely. Chars > 0x7F never
    // satisfy unreservedChar, so the scan is exact.
    var k = 0
    while (k < s.length && unreservedChar(s.charAt(k))) k += 1
    if (k == s.length) return s
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length + 8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      val c = b.toChar
      val unreserved =
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') ||
          c == '_' || c == '.' || c == '-' || c == '~' || c == '/'
      if (unreserved) sb.append(c)
      else {
        sb.append('%').append(hex(b >>> 4)).append(hex(b & 0xF))
      }
      i += 1
    }
    sb.toString
  }

  /** Entry point used by generated code. */
  def quoteUTF8(s: UTF8String): UTF8String =
    UTF8String.fromString(quote(s.toString))
}

/** Catalyst expression wrapper for [[PyQuote]]: codegen emits a direct
  * static call (no UDF serialization / row boxing), so the encode stays
  * inside whole-stage codegen in the render pipeline's hot path. */
case class PercentEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "py_quote"

  override protected def nullSafeEval(input: Any): Any =
    PyQuote.quoteUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PyQuote.quoteUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UriFunctions {
  /** Column form of the Python-`quote`-compatible percent encode. */
  def pyQuote(c: Column): Column =
    GraftSqlShims.columnOf(PercentEncode(GraftSqlShims.expressionOf(c)))

  /** `get_url_term` (`umls2rdf.py:124-129`): ns + '/'? + quote(code). */
  def urlTerm(ns: String, code: String): String =
    if (ns.nonEmpty && ns.last == '/') ns + PyQuote.quote(code)
    else ns + "/" + PyQuote.quote(code)
}
