package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text normalization: extract the runs of `[a-z0-9]` and
  * join them with single spaces — exactly the value of
  * `trim(regexp_replace(regexp_replace(s, "[^a-z0-9\\s]", " "), "\\s+",
  * " "))` for any input (both forms reduce to "keep alnum runs, one
  * space between"; every non-alnum char is a separator either directly
  * (regex 1 → space) or as `\s` (regex 2 collapses) — there is no third
  * case). The input is expected to be ALREADY lowercased (callers wrap
  * `lower(text)`), mirroring the regex composition it replaces.
  *
  * Why it exists: the round-10 streaming-dedup sweep measured the two
  * NFA `regexp_replace` passes at ~10× the cost of everything else in
  * the pipeline COMBINED (167k events/s with the regexes vs 1.5-1.67M
  * without; md5 and the state store were both nearly free). A codegen'd
  * char loop removes that wall from every fingerprint/dedup path while
  * keeping values bit-identical — the DuckDB oracles still replay the
  * regex form and must keep matching.
  */
object AlnumCollapse {
  def collapse(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Catalyst expression wrapper for [[AlnumCollapse]]: codegen emits a
  * direct static call (no UDF serialization / row boxing), so
  * normalization stays inside whole-stage codegen in the dedup and
  * streaming hot paths — the [[PercentEncode]] pattern. */
case class NormalizeCollapse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "alnum_collapse"

  override protected def nullSafeEval(input: Any): Any =
    AlnumCollapse.collapse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AlnumCollapse.collapse($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
