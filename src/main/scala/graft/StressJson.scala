package graft

import scala.collection.mutable.ArrayBuffer

/** Shared JSON serialization for the ScaleStress family's
  * steps/facts/violations emitters ([[ScaleStress]], [[ScaleStressAnn]],
  * [[ScaleStressGraph]], [[ScaleStressSubword]], [[ScaleStressStreaming]]).
  *
  * Violation strings interpolate observed values and operator messages;
  * before r16 each emitter embedded them raw, so a message containing a
  * quote or backslash (e.g. a quoted token in a subword violation)
  * would emit malformed JSON exactly when the artifact matters most —
  * on a failing run (r15 ADVICE #1).
  */
private[graft] object StressJson {

  def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Minimal JSON string escape: backslash, quote, and control chars. */
  def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** The `"steps":{...},"facts":{...},"violations":[...]` fragment every
    * stress emitter prints (embedded in ScaleStress's full record and in
    * each leg's isolated-run main). */
  def fragment(steps: ArrayBuffer[(String, Double)],
      facts: ArrayBuffer[(String, Long)],
      violations: ArrayBuffer[String]): String =
    s""""steps":${steps.map { case (k, v) => s""""${esc(k)}":${f3(v)}""" }
      .mkString("{", ",", "}")},""" +
      s""""facts":${facts.map { case (k, v) => s""""${esc(k)}":$v""" }
        .mkString("{", ",", "}")},""" +
      s""""violations":${violations.map(v => "\"" + esc(v) + "\"")
        .mkString("[", ",", "]")}"""
}
