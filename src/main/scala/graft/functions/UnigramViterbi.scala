package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Best unigram-LM segmentation of a word under an INTEGER cost table —
  * the Viterbi step of [[graft.operators.Unigram]] training, as a single
  * fused JVM pass (the [[WinnowFingerprints]] selection argument: per-word
  * DP is imperative by nature; a DataFrame formulation would explode
  * |word|×maxLen candidate pieces per word through interpreted lambdas).
  *
  * The cost table arrives as a PLAN LITERAL (the bounded-model-artifact
  * posture of IVF codebooks / BPE merge literals: the vocabulary is
  * bounded regardless of corpus size, so it broadcasts with the
  * serialized expression).
  *
  * Determinism contract (mirrored exactly by tools/gen_unigram_golden.py):
  * dp over char positions, candidate splits scanned j ASCENDING with
  * STRICT tuple comparison on (total cost, piece count, j) — so ties
  * prefer cheaper, then fewer pieces, then the longest final piece. All
  * arithmetic is integer; no float ever enters the segmentation. A word
  * containing a character absent from the table (impossible when the
  * table was seeded from the same corpus) falls back to per-char pieces. */
case class UnigramViterbi(child: Expression, costs: Map[String, Int],
    maxLen: Int) extends UnaryExpression with CodegenFallback {
  require(maxLen >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_viterbi"

  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](costs.size * 2)
    costs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val m = s.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val INF = Int.MaxValue / 2
    val cost = new Array[Int](m + 1)
    val np = new Array[Int](m + 1)
    val back = new Array[Int](m + 1)
    var i = 1
    while (i <= m) {
      cost(i) = INF; np(i) = INF; back(i) = -1
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (cost(j) < INF) {
          val c = table.get(s.substring(j, i))
          if (c != null) {
            val cc = cost(j) + c.intValue()
            val nn = np(j) + 1
            // strict tuple < on (cost, pieces, j): j ascending keeps the
            // SMALLEST j (longest last piece) among full ties
            if (cc < cost(i) || (cc == cost(i) &&
                (nn < np(i) /* j tie needs no check: earlier j won */ ))) {
              cost(i) = cc; np(i) = nn; back(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    if (cost(m) >= INF) {
      // fallback: per-char pieces (unreachable when the table covers the
      // corpus alphabet — kept for totality)
      val out = new Array[Any](m)
      var p = 0
      while (p < m) { out(p) = UTF8String.fromString(s.substring(p, p + 1)); p += 1 }
      return new GenericArrayData(out)
    }
    var cur = m
    var n = 0
    while (cur > 0) { n += 1; cur = back(cur) }
    val out = new Array[Any](n)
    cur = m
    var idx = n - 1
    while (cur > 0) {
      val j = back(cur)
      out(idx) = UTF8String.fromString(s.substring(j, cur))
      idx -= 1; cur = j
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnigramViterbi {
  def segment(word: Column, costs: Map[String, Int], maxLen: Int): Column =
    ExpressionUtils.column(UnigramViterbi(
      ExpressionUtils.expression(word), costs, maxLen))
}
