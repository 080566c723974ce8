package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared MD5 runtime for the digest expressions below.
  *
  * Why it exists (r19 measurement, guide §1/§4): the portable-MinHash
  * kernel evaluates `min(md5(concat(lit(i), lit("|"), th)))` SIXTEEN
  * times per distinct (doc, shingle) row — the dominant executor cost of
  * every portable-LSH entry (q156/q158/q170 measured 43-61 s of
  * executor-scheduled time each at sf0.1; see OPTIMIZATION_r19.md).
  * Spark's built-in `Md5` goes through
  * `org.apache.commons.codec.digest.DigestUtils.md5Hex(String)`: a NEW
  * MessageDigest instance per call (provider lookup + allocation), a
  * char[]-hex + String + UTF8String re-encode per call, and — through the
  * `concat` child — a fresh seed+payload concatenation per call. This
  * runtime keeps ONE MessageDigest per thread (reset between calls is a
  * cheap state wipe), hex-encodes straight into the output byte[], and
  * streams seed and payload into the digest without materializing the
  * concatenation. Values are bit-identical — MD5 is MD5 — which the
  * DuckDB oracles and `DigestParitySpec` (replaying the Column algebra
  * verbatim) both pin.
  */
object Md5Hex {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  private def finishHex(md: java.security.MessageDigest): UTF8String = {
    val raw = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      val b = raw(i) & 0xff
      out(2 * i) = HEX(b >>> 4)
      out(2 * i + 1) = HEX(b & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** md5 hex of `prefix ++ s` — the value of `md5(concat(lit(prefix), s))`
    * (and of plain `md5(s)` when `prefix` is empty). */
  def seeded(prefix: Array[Byte], s: UTF8String): UTF8String = {
    val md = tl.get()
    md.reset()
    if (prefix.length > 0) md.update(prefix)
    md.update(s.getBytes)
    finishHex(md)
  }

  /** One md5 hex per prefix over the SAME payload — the n seeded rehashes
    * of the portable MinHash signature in one evaluation: the payload
    * bytes are fetched once and the expression tree is walked once
    * instead of n times. */
  def seededAll(prefixes: Array[Array[Byte]], s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = new Array[AnyRef](prefixes.length)
    val md = tl.get()
    var i = 0
    while (i < prefixes.length) {
      md.reset()
      md.update(prefixes(i))
      md.update(bytes)
      out(i) = finishHex(md)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** md5 hex of the concat_ws join of `parts` (null parts skipped, no
    * separator for skipped parts — exactly `md5(concat_ws(sep, ...))`),
    * digested without materializing the joined string. */
  def concatWs(sep: Array[Byte], parts: Array[UTF8String]): UTF8String = {
    val md = tl.get()
    md.reset()
    var first = true
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p != null) {
        if (!first) md.update(sep)
        md.update(p.getBytes)
        first = false
      }
      i += 1
    }
    finishHex(md)
  }
}

/** `md5(concat(lit(prefix), child))` as one codegen'd call — see
  * [[Md5Hex]]. With an empty prefix this is exactly `md5(child)`. */
case class Md5Seeded(prefix: String, child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "md5_seeded"

  @transient private lazy val prefixBytes = prefix.getBytes("UTF-8")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_seeded expects a string payload, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5Hex.seeded(prefixBytes, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val pref = ctx.addReferenceObj("md5SeedPrefix", prefixBytes, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hex.seeded($pref, $c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** The n seeded MinHash rehashes in one pass: element i is exactly
  * `md5(concat(lit(i.toString), lit("|"), child))` — the verbatim
  * portable-signature algebra — but the payload is fetched once, one
  * thread-shared digest serves all n, and the expression tree is walked
  * once per row instead of n times. */
case class Md5SeededArray(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "md5_seeded_array"

  @transient private lazy val prefixes: Array[Array[Byte]] =
    (0 until numHashes).map(i => s"$i|".getBytes("UTF-8")).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_seeded_array expects a string payload, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5Hex.seededAll(prefixes, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val pref = ctx.addReferenceObj("md5SeedPrefixes", prefixes, "byte[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Hex.seededAll($pref, $c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** `md5(concat_ws(sep, children...))` without materializing the joined
  * string: children are streamed into one thread-shared digest, null
  * children skipped exactly as concat_ws skips them. Never null (the
  * all-null join is the empty string, whose md5 is defined). */
case class Md5ConcatWs(sep: String, children: Seq[Expression])
    extends Expression {
  require(children.nonEmpty, "md5_concat_ws needs at least one child")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "md5_concat_ws"

  @transient private lazy val sepBytes = sep.getBytes("UTF-8")

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != StringType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"md5_concat_ws expects string children, got ${c.dataType}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val parts = new Array[UTF8String](children.length)
    var i = 0
    while (i < children.length) {
      parts(i) = children(i).eval(input).asInstanceOf[UTF8String]
      i += 1
    }
    Md5Hex.concatWs(sepBytes, parts)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("md5CwsSep", sepBytes, "byte[]")
    val parts = ctx.freshName("parts")
    val utf8 = "org.apache.spark.unsafe.types.UTF8String"
    val evals = children.zipWithIndex.map { case (c, i) =>
      val e = c.genCode(ctx)
      code"""
        ${e.code}
        $parts[$i] = ${e.isNull} ? null : ${e.value};"""
    }
    val body =
      code"""
        $utf8[] $parts = new $utf8[${children.length}];
        ${evals.reduce(_ + _)}
        $utf8 ${ev.value} = graft.functions.Md5Hex.concatWs($sepRef, $parts);
      """
    ev.copy(code = body, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object DigestFunctions {
  /** Column form of [[Md5Seeded]] — `md5(concat(lit(prefix), payload))`.
    * `md5Hex(c)` (empty prefix) is exactly `md5(c)`. */
  def md5Seeded(prefix: String, payload: Column): Column =
    GraftSqlShims.columnOf(
      Md5Seeded(prefix, GraftSqlShims.expressionOf(payload)))

  def md5Hex(payload: Column): Column = md5Seeded("", payload)

  /** Column form of [[Md5SeededArray]] — element i is
    * `md5(concat(lit(i.toString), lit("|"), payload))`. */
  def md5SeededArray(payload: Column, numHashes: Int): Column =
    GraftSqlShims.columnOf(
      Md5SeededArray(GraftSqlShims.expressionOf(payload), numHashes))

  /** Column form of [[Md5ConcatWs]] — `md5(concat_ws(sep, parts...))`. */
  def md5ConcatWs(sep: String, parts: Column*): Column =
    GraftSqlShims.columnOf(
      Md5ConcatWs(sep, parts.map(GraftSqlShims.expressionOf)))
}
