package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Fused EXACT-DECIMAL dot products of one vector against a literal matrix —
  * the hot loop of every candidate-set oracle query (q_ann_lsh_cand,
  * q_ann_ivf_cand, q_embedding_neardup).
  *
  * Semantics are BIT-IDENTICAL to the compositional Catalyst chain
  * `aggregate(zip_with(v, w, (x, y) -> cast(x*y as decimal(28,18))), 0, +)`
  * ([[graft.operators.Ann.dotExactDec]]), which is what the DuckDB twins
  * mirror: per element, the float is widened exactly, the double product is
  * one IEEE rounding, and Spark's double→decimal cast goes through the
  * SHORTEST decimal repr (`BigDecimal.valueOf`) then HALF_UP at scale 18;
  * accumulation at fixed scale 18 is exact integer addition. This expression
  * replays exactly that per-element pipeline in a JVM loop and accumulates
  * the scaled unscaled-values as BigInteger — the per-element Catalyst
  * interpreter walk (the compositional form is interpreted: higher-order
  * builtins never compile) is what it removes, not any arithmetic. Parity is
  * pinned by spec (AnnCandidatesSpec) and by the hash-exact oracles.
  */
object DecimalDotsExact {

  /** Σ_d round18(x_d · w_d) as a scale-18 unscaled BigInteger. */
  private[functions] def dotUnscaled(x: Array[Double],
      w: Array[Double]): BigInteger = {
    var acc = BigInteger.ZERO
    var i = 0
    val n = math.min(x.length, w.length)
    while (i < n) {
      val prod = x(i) * w(i)
      // Spark Cast(double -> decimal(28,18)): shortest-repr BigDecimal,
      // then HALF_UP to scale 18 (no-op scale-up for short reprs)
      acc = acc.add(JBigDecimal.valueOf(prod)
        .setScale(18, RoundingMode.HALF_UP).unscaledValue())
      i += 1
    }
    acc
  }

  /** Margin under which the fast-double dot cannot be trusted to decide a
    * sign or an ordering and the exact-decimal path must run. Bound: the
    * decimal dot differs from the double fold by at most n·(half-ulp of
    * the scale-18 rounding) ≤ n·5e-19 plus the fold rounding, which scales
    * with the MAGNITUDE of the partial sums — up to ~n·ulp(Σ|xᵢwᵢ|)
    * (Σ|xᵢwᵢ| upper-bounds every partial sum). So the margin is computed
    * per call from an upper bound on the |product| mass (callers pass the
    * Cauchy–Schwarz bound ‖x‖·‖w‖ from norms precomputed OUTSIDE the dot
    * loop — see [[norm2]]), with a 16× safety factor, and floored at
    * 1e-9 — the unit-scale bound (~2e-13) × ~5000,
    * preserving the documented behavior for unit embeddings. A larger
    * margin only sends MORE decisions to the exact-decimal path, so it can
    * never change a result relative to the all-decimal semantics — only
    * guard it for large-magnitude (non-unit-norm) vectors, where a fixed
    * absolute 1e-9 could silently trust a wrong fast sign/ordering. */
  private[functions] def fastMargin(n: Int, sumAbsBound: Double): Double =
    math.max(1e-9, 16.0 * n * math.ulp(sumAbsBound) + n * 1e-18)

  /** ‖x‖₂ — feeds [[fastMargin]] through the Cauchy–Schwarz bound
    * Σ|xᵢwᵢ| ≤ ‖x‖·‖w‖, so callers precompute one norm per vector and one
    * per (fixed) plane/centroid instead of accumulating |products| inside
    * every dot loop (measured: the extra in-loop accumulation cost ~60% on
    * the LSH sig path; the bound is looser than the exact Σ|xᵢwᵢ|, which
    * only sends MORE borderline decisions to the exact path — never
    * changes a result). */
  private[functions] def norm2(x: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    math.sqrt(s)
  }

  private[functions] def dotDouble(x: Array[Double], w: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(x.length, w.length)
    while (i < n) { s += x(i) * w(i); i += 1 }
    s
  }

  private[functions] def decideSign(x: Array[Double], w: Array[Double],
      margin: Double): Boolean = {
    val fast = dotDouble(x, w)
    if (fast > margin) true
    else if (fast < -margin) false
    else dotUnscaled(x, w).signum > 0
  }

  private[functions] def readVec(input: Any, isFloat: Boolean): Array[Double] = {
    val v = input.asInstanceOf[ArrayData]
    val x = new Array[Double](v.numElements())
    var d = 0
    while (d < x.length) {
      x(d) = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
      d += 1
    }
    x
  }

  private[functions] def isFloatArray(e: Expression): Boolean =
    e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  def dots(vec: Column, matrix: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(DecimalDotsAll(
      ExpressionUtils.expression(vec), matrix.map(_.toArray).toArray))

  def sigs(vec: Column, tables: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(DecimalSigsAll(
      ExpressionUtils.expression(vec),
      tables.map(_.map(_.toArray).toArray).toArray))

  def argTopK(vec: Column, matrix: Seq[Seq[Double]], k: Int): Column =
    ExpressionUtils.column(DecimalArgTopK(
      ExpressionUtils.expression(vec), matrix.map(_.toArray).toArray, k))
}

/** array<decimal(28,18)>: one exact dot per matrix row. */
case class DecimalDotsAll(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  import DecimalDotsExact._

  override def dataType: DataType =
    ArrayType(DecimalType(28, 18), containsNull = false)
  override def prettyName: String = "decimal_dots"

  private lazy val childIsFloat = isFloatArray(child)

  override protected def nullSafeEval(input: Any): Any = {
    val x = readVec(input, childIsFloat)
    val out = new Array[Decimal](matrix.length)
    var r = 0
    while (r < matrix.length) {
      out(r) = Decimal(new JBigDecimal(dotUnscaled(x, matrix(r)), 18), 28, 18)
      r += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** array<long>: one packed sign-bit signature per table — bit p of table t
  * set iff the exact-decimal projection on plane p is > 0. The single-pass
  * twin of per-plane `dotExactDec(vec, plane) > 0`. */
case class DecimalSigsAll(child: Expression,
    tables: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  import DecimalDotsExact._
  require(tables.forall(_.length <= 63), "pack into one long")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "decimal_sigs"

  private lazy val childIsFloat = isFloatArray(child)
  // plane norms are fixed per plan — computed once, reused for every row's
  // Cauchy–Schwarz margin bound
  private lazy val planeNorms: Array[Array[Double]] = tables.map(_.map(norm2))

  override protected def nullSafeEval(input: Any): Any = {
    val x = readVec(input, childIsFloat)
    val xn = norm2(x)
    val out = new Array[Long](tables.length)
    var t = 0
    while (t < tables.length) {
      var sig = 0L
      var p = 0
      while (p < tables(t).length) {
        // fast-double sign with exact-decimal fallback inside the margin —
        // bit-identical to the all-decimal form (see fastMargin)
        val m = fastMargin(x.length, xn * planeNorms(t)(p))
        if (decideSign(x, tables(t)(p), m)) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** array<int>: indices of the k matrix rows with the largest exact-decimal
  * dot, ordered (dot DESC, index ASC) — IVF bucket assignment (k=1) and
  * probe lists (k=nProbe) in one pass. */
case class DecimalArgTopK(child: Expression, matrix: Array[Array[Double]],
    k: Int) extends UnaryExpression with CodegenFallback {
  import DecimalDotsExact._
  require(k >= 1 && k <= matrix.length)

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "decimal_arg_topk"

  private lazy val childIsFloat = isFloatArray(child)
  private lazy val maxRowNorm: Double = matrix.map(norm2).max

  override protected def nullSafeEval(input: Any): Any = {
    val x = readVec(input, childIsFloat)
    // fast path: double dots; trust the ordering only where consecutive
    // gaps clear the margin. The ranks that matter are 1..k and the k/k+1
    // boundary — if any adjacent pair among them is closer than the margin,
    // recompute EVERYTHING in exact decimal (rare: decision-boundary rows).
    val fast = new Array[Double](matrix.length)
    var r = 0
    while (r < matrix.length) { fast(r) = dotDouble(x, matrix(r)); r += 1 }
    val fastOrder = (0 until matrix.length).sortWith { (a, b) =>
      if (fast(a) != fast(b)) fast(a) > fast(b) else a < b
    }
    val boundary = math.min(k, matrix.length - 1)
    // comparing two rows compounds both rows' fold errors → 2× the
    // single-dot margin at the worst row magnitude (Cauchy–Schwarz bound
    // from the precomputed norms)
    val gapMargin = 2.0 * fastMargin(x.length, norm2(x) * maxRowNorm)
    var safe = true
    var i = 0
    while (i < boundary && safe) {
      if (fast(fastOrder(i)) - fast(fastOrder(i + 1)) < gapMargin) safe = false
      i += 1
    }
    val order =
      if (safe) fastOrder
      else {
        val dots = new Array[BigInteger](matrix.length)
        var j = 0
        while (j < matrix.length) { dots(j) = dotUnscaled(x, matrix(j)); j += 1 }
        (0 until matrix.length).sortWith { (a, b) =>
          val c = dots(a).compareTo(dots(b))
          if (c != 0) c > 0 else a < b // dot DESC, index ASC
        }
      }
    ArrayData.toArrayData(order.take(k).toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
