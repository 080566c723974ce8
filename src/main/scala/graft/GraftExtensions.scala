package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.GraftSqlShims.{columnOf, eagerExpressionOf => expressionOf}

import graft.functions.{PercentEncode, RelFragmentExpr, StnParent, TurtleEscape}
import graft.operators.{Dedup, TextAnalysis}

/** SQL surface for the engine's scalar functions — so `spark.sql` users
  * get the same correctness-critical semantics the DataFrame plane uses:
  *
  *   - `py_quote(s)`      — Python-`urllib.parse.quote`-exact URI encoding
  *   - `turtle_escape(s)` — backslash-then-quote Turtle escaping
  *   - `stn_parent(s)`    — semantic-type tree-number parent
  *   - `rel_fragment(rela, rel)` — RELA-if-truthy-else-REL coalescing
  *
  * plus the text-pipeline scalar plane (each a pure Column composition —
  * codegen'd, streaming-safe, no UDFs):
  *
  *   - `quality_score(text)`   — composite quality signal
  *   - `lang_id(text)`         — stopword-argmax language code
  *   - `doc_fingerprint(text)` — portable md5 content fingerprint
  *   - `scrub_pii(text)`       — email/ID/phone redaction chain
  *   - `simhash64(text)`       — per-row 64-bit SimHash signature
  *   - `hash_split(id, frac)`  — deterministic train/valid assignment
  *
  * Configure with `spark.sql.extensions=graft.GraftExtensions`, or call
  * [[GraftExtensions.install]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("py_quote"),
      info("py_quote", classOf[PercentEncode]),
      (args: Seq[Expression]) => PercentEncode(args.head)),
    (new FunctionIdentifier("turtle_escape"),
      info("turtle_escape", classOf[TurtleEscape]),
      (args: Seq[Expression]) => TurtleEscape(args.head)),
    (new FunctionIdentifier("stn_parent"),
      info("stn_parent", classOf[StnParent]),
      (args: Seq[Expression]) => StnParent(args.head)),
    (new FunctionIdentifier("rel_fragment"),
      info("rel_fragment", RelFragmentExpr.getClass),
      (args: Seq[Expression]) => RelFragmentExpr(args(0), args(1))),
    (new FunctionIdentifier("quality_score"),
      info("quality_score", TextAnalysis.getClass),
      (args: Seq[Expression]) =>
        expressionOf(TextAnalysis.qualityScore(columnOf(args.head)))),
    (new FunctionIdentifier("lang_id"),
      info("lang_id", TextAnalysis.getClass),
      (args: Seq[Expression]) =>
        expressionOf(TextAnalysis.langId(columnOf(args.head))
          .getField("lang"))),
    (new FunctionIdentifier("doc_fingerprint"),
      info("doc_fingerprint", TextAnalysis.getClass),
      (args: Seq[Expression]) =>
        expressionOf(TextAnalysis.fingerprint(columnOf(args.head)))),
    (new FunctionIdentifier("scrub_pii"),
      info("scrub_pii", TextAnalysis.getClass),
      (args: Seq[Expression]) =>
        expressionOf(TextAnalysis.scrubPii(columnOf(args.head)))),
    (new FunctionIdentifier("simhash64"),
      info("simhash64", Dedup.getClass),
      (args: Seq[Expression]) =>
        expressionOf(Dedup.rowSimhash64(columnOf(args.head)))),
    (new FunctionIdentifier("hash_split"),
      info("hash_split", TextAnalysis.getClass),
      (args: Seq[Expression]) => {
        // frac must be a literal: the cut is folded into the plan.
        val frac = args(1) match {
          case e if e.foldable => e.eval() match {
            // SQL decimal literals (0.9) eval to Spark's Decimal, which
            // is not a java.lang.Number.
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case d: java.lang.Number => d.doubleValue()
            case other => throw new IllegalArgumentException(
              s"hash_split frac must be numeric, got $other")
          }
          case _ => throw new IllegalArgumentException(
            "hash_split frac must be a literal")
        }
        expressionOf(TextAnalysis.hashSplit(columnOf(args.head), frac))
      }))

  /** Register on an already-built session (tests, shells). */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
