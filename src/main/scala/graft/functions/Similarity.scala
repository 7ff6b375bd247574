package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Gestalt pattern matching (Ratcliff–Obershelp), semantically equivalent to
  * Python's `difflib.SequenceMatcher(None, a, b).ratio()` as used by the
  * reference's fuzzy strategy (enhanced_mapping.py:579). Inputs here are
  * short normalized names (< 200 chars) so difflib's autojunk heuristic never
  * activates and plain Ratcliff–Obershelp with difflib's tie-breaking is the
  * exact semantics.
  *
  * ratio = 2·M / (|a| + |b|), M = total length of matching blocks found by
  * recursively taking the longest matching substring (earliest in `a`, then
  * earliest in `b` on ties) and recursing on both sides.
  */
object RatcliffObershelp {

  def ratio(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la + lb == 0) return 1.0
    // positions of each char in b (ascending) — difflib's b2j
    val b2j = new java.util.HashMap[Char, java.util.ArrayList[Int]]()
    var j = 0
    while (j < lb) {
      val c = b.charAt(j)
      var l = b2j.get(c)
      if (l == null) { l = new java.util.ArrayList[Int](); b2j.put(c, l) }
      l.add(j)
      j += 1
    }
    var matches = 0
    // explicit work stack instead of recursion (deep chains on long inputs)
    val stack = scala.collection.mutable.Stack[(Int, Int, Int, Int)]((0, la, 0, lb))
    // j2len maps j -> length of match ending at (i, j); rebuilt per row of i
    var j2len = new java.util.HashMap[Int, Int]()
    var newJ2len = new java.util.HashMap[Int, Int]()
    while (stack.nonEmpty) {
      val (alo, ahi, blo, bhi) = stack.pop()
      var besti = alo
      var bestj = blo
      var bestsize = 0
      j2len.clear()
      var i = alo
      while (i < ahi) {
        newJ2len.clear()
        val positions = b2j.get(a.charAt(i))
        if (positions != null) {
          var p = 0
          val n = positions.size()
          while (p < n) {
            val jj = positions.get(p)
            if (jj >= blo && jj < bhi) {
              val k = j2len.getOrDefault(jj - 1, 0) + 1
              newJ2len.put(jj, k)
              if (k > bestsize) { besti = i - k + 1; bestj = jj - k + 1; bestsize = k }
            }
            p += 1
          }
        }
        val tmp = j2len; j2len = newJ2len; newJ2len = tmp
        i += 1
      }
      if (bestsize > 0) {
        matches += bestsize
        if (alo < besti && blo < bestj) stack.push((alo, besti, blo, bestj))
        if (besti + bestsize < ahi && bestj + bestsize < bhi)
          stack.push((besti + bestsize, ahi, bestj + bestsize, bhi))
      }
    }
    2.0 * matches / (la + lb)
  }
}

/** Native Catalyst expression for [[RatcliffObershelp.ratio]]. Deterministic,
  * null-safe (null in → null out via BinaryExpression's default eval).
  * CodegenFallback: the surrounding operators stay in whole-stage codegen;
  * only this leaf call is interpreted — acceptable because the fuzzy strategy
  * runs on the candidate-pair space AFTER the cheap strategies and a length
  * prefilter have pruned it (SURVEY.md §4). */
case class RatcliffObershelpSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ro_similarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    RatcliffObershelp.ratio(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Similarity {
  /** `ro_similarity(a, b)` as a Column. */
  def roSimilarity(a: Column, b: Column): Column =
    ExpressionUtils.column(RatcliffObershelpSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Length-difference prefilter for `ro_similarity(a,b) >= tau` joins:
    * ratio ≤ 2·min/(min+max), so requiring ratio ≥ τ implies
    * |len(a)−len(b)| ≤ (2/τ − 2)·min(len). Applying this BEFORE the expensive
    * similarity keeps the candidate space linear-ish at scale. */
  def lengthPrefilter(a: Column, b: Column, tau: Double): Column = {
    import org.apache.spark.sql.functions._
    val mn = least(length(a), length(b)).cast("double")
    val mx = greatest(length(a), length(b)).cast("double")
    (lit(2.0) * mn / (mn + mx)) >= lit(tau)
  }
}
