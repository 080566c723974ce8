package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two array<float|double> columns.
  *
  * The `zip_with` + `aggregate` Column form is a higher-order function —
  * interpreted (no whole-stage codegen) and allocating an intermediate
  * array per row. In the similarity pair joins that expression runs once
  * per CANDIDATE PAIR, so the interpreter overhead dominates the actual
  * flops. This expression generates a tight primitive loop instead —
  * the "custom Catalyst Expression beats UDF beats interpreted HOF"
  * preference applied where it actually pays.
  *
  * Semantics: sequential left-to-right double accumulation (identical
  * order to the HOF form, so scores are bit-equal); NULL array → NULL;
  * mismatched lengths → NULL, matching the `zip_with` form (which pads
  * the shorter side with nulls and so nulls the whole sum) — a
  * malformed embedding column fails loudly instead of yielding a
  * plausible partial dot product. NULL elements read as 0.0 (embedding
  * vectors do not contain null elements).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"vec_dot expects array<float|double>, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float|double> arguments, " +
        s"got ${left.dataType} and ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lt = elemType(left); val rt = elemType(right)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0
        else if (lt == FloatType) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0
        else if (rt == FloatType) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    def get(v: String, t: DataType, i: String): String = t match {
      case FloatType => s"(double) $v.getFloat($i)"
      case DoubleType => s"$v.getDouble($i)"
      case _ => throw new IllegalStateException("unreachable")
    }
    val lt = elemType(left); val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double lv = $a.isNullAt($i) ? 0.0 : ${get(a, lt, i)};
            double rv = $b.isNullAt($i) ? 0.0 : ${get(b, rt, i)};
            $acc += lv * rv;
          }
          ${ev.value} = $acc;
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native argmin-centroid assignment: the cluster index minimizing
  * dist²(v, cᵢ) over a plan-literal centroid matrix, computed as
  * `-2·(v·cᵢ) + |cᵢ|²` (|v|² is constant per row).
  *
  * The previous Column form built `aggregate(array(k structs), ...)` —
  * a higher-order function, so (a) the fold ran INTERPRETED with k
  * struct allocations per row, and (b) the k [[DotProduct]] children
  * each re-evaluated the `vec` child (no common-subexpression
  * elimination outside whole-stage codegen), turning a synthesized or
  * computed embedding column into k× its cost. Measured on the
  * streaming IVF-ingest leg (250k rows/batch, k = 64, dim = 64): the
  * HOF form sustained ~42k rows/s THREAD-INDEPENDENT from local[8] to
  * local[32] — the classic interpreted-HOF + allocation wall — while
  * this expression is one tight primitive loop per row inside
  * whole-stage codegen, evaluating `vec` exactly once.
  *
  * Semantics are bit-identical to the fold it replaces:
  *   - per-centroid score = dot(v,cᵢ)·(−2.0) + |cᵢ|² with [[DotProduct]]
  *     accumulation order, |cᵢ|² pre-summed left-to-right on the driver
  *     exactly as `c.map(x*x).sum` was;
  *   - strict `<` fold keeps the FIRST minimal centroid (ties);
  *   - a NaN component poisons every score and no candidate wins;
  *   - NULL embedding or dimension mismatch nulls every dot — no winner;
  *   - "no winner" returns the −1 sentinel (NOT SQL NULL), which
  *     [[graft.operators.IvfIndex]] turns into its loud raise_error,
  *     same as the fold's seed struct did.
  */
case class ArgMinCentroid(child: Expression,
    centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.nonEmpty, "ArgMinCentroid: empty centroid set")
  require(centroids.forall(_.length == centroids.head.length),
    "ArgMinCentroid: ragged centroid matrix")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "vec_argmin_centroid"

  private val dim = centroids.head.length
  private val k = centroids.length
  // flat row-major matrix + the EXACT |c|² the Column form used
  // (driver-side left-to-right sum of squares)
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var i = 0
    while (i < k) {
      var j = 0
      while (j < dim) { a(i * dim + j) = centroids(i)(j); j += 1 }
      i += 1
    }
    a
  }
  @transient private lazy val norms: Array[Double] =
    centroids.map(_.map(x => x * x).sum).toArray

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_argmin_centroid expects array<float|double>, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_argmin_centroid expects array<float|double>, got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return -1
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return -1
    val isF = elemIsFloat
    var best = Double.MaxValue
    var idx = -1
    var i = 0
    while (i < k) {
      var dot = 0.0
      var j = 0
      while (j < dim) {
        val xv = if (arr.isNullAt(j)) 0.0
          else if (isF) arr.getFloat(j).toDouble else arr.getDouble(j)
        dot += xv * flat(i * dim + j)
        j += 1
      }
      val score = dot * -2.0 + norms(i)
      if (score < best) { best = score; idx = i }
      i += 1
    }
    idx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val childGen = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("centroidFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    val arr = ctx.freshName("arr")
    val best = ctx.freshName("best")
    val idx = ctx.freshName("idx")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val dot = ctx.freshName("dot")
    val score = ctx.freshName("score")
    val getElem =
      if (elemIsFloat) s"(double) $arr.getFloat($j)" else s"$arr.getDouble($j)"
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val body =
      code"""
        ${childGen.code}
        int ${ev.value} = -1;
        if (!${childGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $arr =
            ${childGen.value};
          if ($arr.numElements() == $dim) {
            double $best = Double.MAX_VALUE;
            int $idx = -1;
            for (int $i = 0; $i < $k; $i++) {
              double $dot = 0.0;
              for (int $j = 0; $j < $dim; $j++) {
                double xv = $arr.isNullAt($j) ? 0.0 : $getElem;
                $dot += xv * $flatRef[$i * $dim + $j];
              }
              double $score = $dot * -2.0 + $normRef[$i];
              if ($score < $best) { $best = $score; $idx = $i; }
            }
            ${ev.value} = $idx;
          }
        }
      """
    ev.copy(code = body,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native PQ encoder: the full `m`-block code array in one expression —
  * per block, the argmin-centroid over that block's slice of the vector
  * (same `-2·(v_b·c) + |c|²` compare key as [[ArgMinCentroid]], first
  * minimal wins ties).
  *
  * The Column form it replaces ran `m` interpreted
  * `aggregate(array(k structs))` folds per row, each over a `transform(
  * array(slice(vec, …)))` lambda binding — `m·k` struct allocations plus
  * an intermediate slice array per block, with the whole projection
  * bouncing through the HOF interpreter (the [[ArgMinCentroid]] wall,
  * ×m). This expression is one fused primitive loop: the vector child is
  * evaluated once, every block's argmin reads it in place (no slice
  * materialization), and the output is a primitive `int[]` array.
  *
  * Semantics are bit-identical to the fold it replaces
  * (`PqIndex.blockCode` pre-r18, replayed in `PqCodegenSpec`):
  *   - block `b` reads elements `[b·sub, (b+1)·sub)`; per-centroid score
  *     = dot(v_b, cᵢ)·(−2.0) + |cᵢ|² with [[DotProduct]] accumulation
  *     order, |cᵢ|² pre-summed left-to-right on the driver exactly as
  *     `c.map(x*x).sum` was;
  *   - strict `<` keeps the FIRST minimal code;
  *   - NULL elements read as 0.0 ([[DotProduct]] semantics);
  *   - a NaN component poisons every score in ITS block only → that
  *     block yields the −1 sentinel;
  *   - a vector too short for block `b` (numElements < (b+1)·sub — the
  *     old form's `slice` returned a short array and the dot nulled) →
  *     −1 for that block; later blocks likewise;
  *   - NULL vector → every block −1.
  * The −1 sentinel (never SQL NULL) feeds `PqIndex.encode`'s loud
  * raise_error guard, exactly as before.
  */
case class PqEncode(child: Expression,
    codebooks: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(codebooks.nonEmpty, "PqEncode: empty codebook set")
  require(codebooks.forall(_.nonEmpty), "PqEncode: empty block codebook")
  require(codebooks.flatten.forall(_.length ==
      codebooks.head.head.length),
    "PqEncode: ragged centroid matrix")
  require(codebooks.forall(_.length == codebooks.head.length),
    "PqEncode: blocks must share k")

  private val m = codebooks.length
  private val k = codebooks.head.length
  private val sub = codebooks.head.head.length

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_pq_encode"

  // flat block-major matrix: flat[((b·k)+c)·sub + j] = codebooks(b)(c)(j),
  // norms[b·k+c] = the EXACT |c|² the Column form used (driver-side
  // left-to-right sum of squares)
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * k * sub)
    var b = 0
    while (b < m) {
      var c = 0
      while (c < k) {
        var j = 0
        while (j < sub) {
          a(((b * k) + c) * sub + j) = codebooks(b)(c)(j); j += 1
        }
        c += 1
      }
      b += 1
    }
    a
  }
  @transient private lazy val norms: Array[Double] = {
    val a = new Array[Double](m * k)
    var b = 0
    while (b < m) {
      var c = 0
      while (c < k) { a(b * k + c) = codebooks(b)(c).map(x => x * x).sum; c += 1 }
      b += 1
    }
    a
  }

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_pq_encode expects array<float|double>, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_pq_encode expects array<float|double>, got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val codes = new Array[Int](m)
    java.util.Arrays.fill(codes, -1)
    val v = child.eval(input)
    if (v == null)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isF = elemIsFloat
    var b = 0
    while (b < m) {
      if (n >= (b + 1) * sub) {
        var best = Double.MaxValue
        var idx = -1
        var c = 0
        while (c < k) {
          var dot = 0.0
          val base = ((b * k) + c) * sub
          var j = 0
          while (j < sub) {
            val p = b * sub + j
            val xv = if (arr.isNullAt(p)) 0.0
              else if (isF) arr.getFloat(p).toDouble else arr.getDouble(p)
            dot += xv * flat(base + j)
            j += 1
          }
          val score = dot * -2.0 + norms(b * k + c)
          if (score < best) { best = score; idx = c }
          c += 1
        }
        codes(b) = idx
      }
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val childGen = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
    val tmp = ctx.freshName("codes")
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val b = ctx.freshName("b")
    val c = ctx.freshName("c")
    val j = ctx.freshName("j")
    val p = ctx.freshName("p")
    val base = ctx.freshName("base")
    val best = ctx.freshName("best")
    val idx = ctx.freshName("idx")
    val dot = ctx.freshName("dot")
    val score = ctx.freshName("score")
    val getElem =
      if (elemIsFloat) s"(double) $arr.getFloat($p)" else s"$arr.getDouble($p)"
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val body =
      code"""
        ${childGen.code}
        int[] $tmp = new int[$m];
        java.util.Arrays.fill($tmp, -1);
        if (!${childGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $arr =
            ${childGen.value};
          int $n = $arr.numElements();
          for (int $b = 0; $b < $m; $b++) {
            if ($n >= ($b + 1) * $sub) {
              double $best = Double.MAX_VALUE;
              int $idx = -1;
              for (int $c = 0; $c < $k; $c++) {
                double $dot = 0.0;
                int $base = (($b * $k) + $c) * $sub;
                for (int $j = 0; $j < $sub; $j++) {
                  int $p = $b * $sub + $j;
                  double xv = $arr.isNullAt($p) ? 0.0 : $getElem;
                  $dot += xv * $flatRef[$base + $j];
                }
                double $score = $dot * -2.0 + $normRef[$b * $k + $c];
                if ($score < $best) { $best = $score; $idx = $c; }
              }
              $tmp[$b] = $idx;
            }
          }
        }
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp);
      """
    ev.copy(code = body,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native ADC (asymmetric-distance) score: the approximate cosine of a
  * PQ-coded row against ONE query, from the query's per-block lookup
  * tables — `m` array reads and one fused accumulation per row.
  *
  * The Column form it replaces ran TWO interpreted
  * `aggregate(zip_with(codes, lit(lut), …))` folds per row (dot table,
  * then norm² table) — each allocating a zipped intermediate array and
  * re-reading `codes` — then divided. This expression evaluates `codes`
  * once and accumulates both sums in one primitive loop inside
  * whole-stage codegen.
  *
  * Semantics are bit-identical to the replaced algebra (replayed in
  * `PqCodegenSpec`): each sum is a left-to-right fold from 0.0 in block
  * order, and the result is `dotSum / (sqrt(n2Sum) · qNorm)` with the
  * same operation order. NULL codes array → NULL; a codes array whose
  * length ≠ m → NULL (the zip_with null-pad); a NULL code element →
  * NULL. An out-of-range code (possible only on a corpus encoded with a
  * DIFFERENT codebook size — `PqIndex.encode`'s guard forbids −1 from
  * its own output) → NULL, where the old form's `element_at` would have
  * errored under ANSI; both paths are unreachable through the public
  * API.
  */
case class AdcScore(child: Expression,
    lutDot: Seq[Seq[Double]], lutN2: Seq[Seq[Double]], qNorm: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(lutDot.nonEmpty && lutDot.forall(_.nonEmpty),
    "AdcScore: empty lookup table")
  require(lutDot.length == lutN2.length &&
      lutDot.zip(lutN2).forall { case (a, b) => a.length == b.length },
    "AdcScore: dot/norm tables must be congruent")
  require(lutDot.forall(_.length == lutDot.head.length),
    "AdcScore: blocks must share k")

  private val m = lutDot.length
  private val k = lutDot.head.length

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_adc_score"

  @transient private lazy val flatDot: Array[Double] =
    lutDot.flatten.toArray
  @transient private lazy val flatN2: Array[Double] =
    lutN2.flatten.toArray

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_adc_score expects array<int> codes, got $other")
    }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != m) return null
    var dot = 0.0
    var n2 = 0.0
    var b = 0
    while (b < m) {
      if (arr.isNullAt(b)) return null
      val c = arr.getInt(b)
      if (c < 0 || c >= k) return null
      dot += flatDot(b * k + c)
      n2 += flatN2(b * k + c)
      b += 1
    }
    dot / (math.sqrt(n2) * qNorm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val dotRef = ctx.addReferenceObj("adcFlatDot", flatDot, "double[]")
    val n2Ref = ctx.addReferenceObj("adcFlatN2", flatN2, "double[]")
    // bit-exact double embedding — a decimal rendering of qNorm could
    // round-trip to a different value
    val qNormJ = "java.lang.Double.longBitsToDouble(" +
      s"${java.lang.Double.doubleToLongBits(qNorm)}L)"
    nullSafeCodeGen(ctx, ev, a => {
      val arr = ctx.freshName("arr")
      val dot = ctx.freshName("dot")
      val n2 = ctx.freshName("n2")
      val b = ctx.freshName("b")
      val cd = ctx.freshName("cd")
      val bad = ctx.freshName("bad")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $arr = $a;
        if ($arr.numElements() != $m) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0;
          double $n2 = 0.0;
          boolean $bad = false;
          for (int $b = 0; $b < $m; $b++) {
            if ($arr.isNullAt($b)) { $bad = true; break; }
            int $cd = $arr.getInt($b);
            if ($cd < 0 || $cd >= $k) { $bad = true; break; }
            $dot += $dotRef[$b * $k + $cd];
            $n2 += $n2Ref[$b * $k + $cd];
          }
          if ($bad) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = $dot / (java.lang.Math.sqrt($n2) * $qNormJ);
          }
        }
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Native 64-bit SimHash over a pre-hashed feature array: per bit j,
  * every feature votes +1 if its bit j is set else −1; the output sets
  * bit j iff the vote sum is positive.
  *
  * The Column form it replaces ran 64 interpreted `aggregate` folds per
  * row (one per bit, each re-iterating the feature array inside the HOF
  * interpreter) on the STREAMING near-dup ingest path — every arriving
  * document pays it before `dropDuplicatesWithinWatermark`. This
  * expression reads each feature once and updates all 64 vote counters
  * in one fused primitive loop inside whole-stage codegen.
  *
  * Semantics are bit-identical to the replaced fold (replayed in
  * `PqCodegenSpec`):
  *   - vote = `((f >> j) & 1) == 1 ? +1 : -1` per feature per bit
  *     (arithmetic shift, exactly Spark's `shiftright`);
  *   - a NULL feature element votes −1 on EVERY bit (the old form's
  *     `shiftright(null)` nulled the comparison and fell to the
  *     otherwise(−1) branch);
  *   - bit j set iff votes > 0 (strict — a tie at 0 leaves the bit
  *     clear);
  *   - NULL or empty feature array → 0L, NOT SQL NULL (each per-bit
  *     `when` fell through to otherwise(0) and the OR-reduce of zeros
  *     is 0).
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false
  override def prettyName: String = "vec_simhash64"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_simhash64 expects array<long> features, got $other")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < 64) { votes(j) -= 1; j += 1 }
      } else {
        val f = arr.getLong(i)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((f >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val childGen = child.genCode(ctx)
    val arr = ctx.freshName("arr")
    val votes = ctx.freshName("votes")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val f = ctx.freshName("f")
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val body =
      code"""
        ${childGen.code}
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $arr =
            ${childGen.value};
          int $n = $arr.numElements();
          int[] $votes = new int[64];
          for (int $i = 0; $i < $n; $i++) {
            if ($arr.isNullAt($i)) {
              for (int $j = 0; $j < 64; $j++) $votes[$j] -= 1;
            } else {
              long $f = $arr.getLong($i);
              for (int $j = 0; $j < 64; $j++) {
                $votes[$j] += ((($f >> $j) & 1L) == 1L) ? 1 : -1;
              }
            }
          }
          for (int $j = 0; $j < 64; $j++) {
            if ($votes[$j] > 0) ${ev.value} |= (1L << $j);
          }
        }
      """
    ev.copy(code = body,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen
        .FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object VectorFunctions {
  /** Column form of [[DotProduct]]. */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlShims.columnOf(DotProduct(
      GraftSqlShims.expressionOf(a), GraftSqlShims.expressionOf(b)))

  /** Column form of [[ArgMinCentroid]]. */
  def vecArgMinCentroid(vec: Column,
      centroids: Array[Array[Double]]): Column =
    GraftSqlShims.columnOf(ArgMinCentroid(
      GraftSqlShims.expressionOf(vec),
      centroids.map(_.toSeq).toSeq))

  /** Column form of [[PqEncode]]. */
  def vecPqEncode(vec: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlShims.columnOf(PqEncode(
      GraftSqlShims.expressionOf(vec),
      codebooks.map(_.map(_.toSeq).toSeq).toSeq))

  /** Column form of [[AdcScore]]. */
  def vecAdcScore(codes: Column, lutDot: Seq[Seq[Double]],
      lutN2: Seq[Seq[Double]], qNorm: Double): Column =
    GraftSqlShims.columnOf(AdcScore(
      GraftSqlShims.expressionOf(codes), lutDot, lutN2, qNorm))

  /** Column form of [[SimHash64]]. */
  def vecSimHash64(features: Column): Column =
    GraftSqlShims.columnOf(SimHash64(
      GraftSqlShims.expressionOf(features)))
}
