package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of every `runLen`-character window of a text, in
  * ONE JVM pass (the ExactSubstr-family char-run signature —
  * [[graft.operators.Dedup.exactSubstrPairs]]).
  *
  * The compositional form (`sequence` + `transform(substring)` +
  * `xxhash64` + `array_distinct`) walks the interpreter tree per window and
  * materializes every 30-char substring; measured ~1.8 s at sf0.1 for
  * 1.3 M windows where this fused pass is ~100 ms — the same selection
  * argument as [[WinnowFingerprints]], one level down (chars, not words).
  *
  * Hash family is engine-internal (FNV-1a over each window's chars, both
  * UTF-16 bytes — matching [[WinnowFingerprints]]): run-hash VALUES never
  * leave the engine, only equal-window → equal-hash matters, and the exact
  * verify stage re-reads texts by key. Texts shorter than `runLen` yield an
  * empty array (no full window).
  */
case class CharRunHashes(child: Expression, runLen: Int)
    extends UnaryExpression with CodegenFallback {
  require(runLen >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_run_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length - runLen + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new java.util.HashSet[java.lang.Long](Math.min(n * 2, 1 << 20))
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      var c = i
      val end = i + runLen
      while (c < end) {
        val ch = s.charAt(c)
        h ^= (ch & 0xffL); h *= 0x100000001b3L
        h ^= ((ch >> 8) & 0xffL); h *= 0x100000001b3L
        c += 1
      }
      out.add(h)
      i += 1
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

object CharRunHashes {
  /** Distinct sorted window hashes of `text`. */
  def runs(text: Column, runLen: Int): Column =
    ExpressionUtils.column(CharRunHashes(
      ExpressionUtils.expression(text), runLen))

  /** Hash of ONE exact-`runLen` string (1-element array → its head); used
    * by the verify stage to re-hash candidate runs inside a lambda. */
  def hashOf(run: Column, runLen: Int): Column =
    org.apache.spark.sql.functions.element_at(runs(run, runLen), 1)
}
