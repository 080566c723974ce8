package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{PercentEncode, RelFragmentExpr, StnParent, TurtleEscape}

/** SQL surface for the engine's scalar functions — so `spark.sql` users
  * get the same correctness-critical semantics the DataFrame plane uses:
  *
  *   - `py_quote(s)`      — Python-`urllib.parse.quote`-exact URI encoding
  *   - `turtle_escape(s)` — backslash-then-quote Turtle escaping
  *   - `stn_parent(s)`    — semantic-type tree-number parent
  *   - `rel_fragment(rela, rel)` — RELA-if-truthy-else-REL coalescing
  *
  * Configure with `spark.sql.extensions=graft.GraftExtensions`, or call
  * [[GraftExtensions.install]] on a live session. All four are native
  * codegen'd Catalyst expressions, not UDFs.
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
      (args: Seq[Expression]) => RelFragmentExpr(args(0), args(1))))

  /** Register on an already-built session (tests, shells). */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
