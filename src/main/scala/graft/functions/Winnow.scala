package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken) of a single-spaced
  * normalized text in ONE pass: word `k`-gram hashes → min per `w`-gram
  * window → distinct. The compositional form
  * (sequence+transform+slice+concat_ws+xxhash64, then a second
  * sequence+transform+array_min+slice layer) walks the interpreter tree per
  * gram and dominated q_containment_dedup (~5 s at sf0.1); this is the same
  * selection as straight JVM loops.
  *
  * The hash family is engine-internal (FNV-1a over the gram's chars —
  * a k-gram of single-spaced text IS a substring, so no strings are
  * materialized): fingerprint VALUES never leave the engine, only the
  * blocking behavior matters, and the recall-1.0 containment argument needs
  * nothing beyond same-gram → same-hash. Docs with fewer than k+w-1 tokens
  * yield an empty array (no full window — the operator's eligibility floor).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // token boundaries of the single-spaced text
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    val len = s.length
    while (i < len) {
      val sp = s.indexOf(' ', i)
      val e = if (sp < 0) len else sp
      starts.add(i); ends.add(e)
      i = e + 1
    }
    val nTok = starts.size()
    val nGrams = nTok - k + 1
    val nWin = nGrams - w + 1
    if (nWin <= 0) return new GenericArrayData(Array.emptyLongArray)
    val gh = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      // FNV-1a over the chars of tokens g..g+k-1 incl. separating spaces —
      // identical char range for identical k-grams wherever they occur
      var h = 0xcbf29ce484222325L
      var c = starts.get(g).intValue()
      val end = ends.get(g + k - 1).intValue()
      while (c < end) {
        val ch = s.charAt(c)
        h ^= (ch & 0xffL); h *= 0x100000001b3L
        h ^= ((ch >> 8) & 0xffL); h *= 0x100000001b3L
        c += 1
      }
      gh(g) = h
      g += 1
    }
    val out = new java.util.HashSet[java.lang.Long]()
    var j = 0
    while (j < nWin) {
      var m = gh(j)
      var t = j + 1
      while (t < j + w) { if (gh(t) < m) m = gh(t); t += 1 }
      out.add(m)
      j += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next().longValue(); p += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WinnowFingerprints {
  def fps(normText: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFingerprints(
      ExpressionUtils.expression(normText), k, w))
}
