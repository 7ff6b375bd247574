package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** CROSS-ENGINE-EXACT MinHash over a prime field p < 2^31.
  *
  * The FNV/SplitMix family ([[MinHashTextSignature]]) needs 64-bit
  * wraparound arithmetic, which a strict-overflow SQL engine (DuckDB)
  * cannot express without 32-bit-limb emulation — so its gates pin
  * "LSH recall = 1 at this SF" against a BRUTE-FORCE twin, and the
  * blocking itself is untestable cross-engine. This family keeps every
  * intermediate below 2^62 so the ORACLE CAN REPLAY THE EXACT BLOCKING:
  *
  *   window hash  h  = fold(h * BASE + codepoint mod P) over the chars
  *                     of each rolling `shingleSize`-char window
  *   family       g_i = (A_i * h + B_i) mod P,  A_i in [1,P), B_i in [0,P)
  *   signature    sig[i] = min over windows of g_i
  *
  * with P = 2147483629 (largest prime < 2^31) and BASE = 131: h < 2^31
  * and A_i < 2^31, so A_i*h + B_i < 2^62 — plain BIGINT in DuckDB, plain
  * Long here, no overflow on either side. A_i/B_i derive from SplitMix64
  * at plan time; [[ModPMinHash.sqlParamList]] renders the same literals
  * into the twin's SQL, and the whole pipeline (normalize → window →
  * hash → min → band) is replayed by nested `list_transform` lambdas
  * (see the q_linkage_scalable twin in queries/EntityQueries.scala).
  *
  * The caller must filter empty normalized text on BOTH sides (here: 0
  * windows => all-MaxValue signature; DuckDB: `list_reduce` on an empty
  * list is an error) — an empty doc has no shingles to block on.
  *
  * Reference semantics (probabilistic record linkage over blocked
  * candidates): /root/reference/enhanced_mapping.py:200-320 scores
  * candidate name pairs from a blocked stream; this family provides the
  * scale-correct (S-curve) blocking stage with an oracle-replayable
  * candidate set.
  */
object ModPMinHash {
  val P: Long = 2147483629L
  val Base: Long = 131L

  /** Affine family params, fixed at plan time from SplitMix64 — shared
    * VERBATIM with the SQL twin via [[sqlParamList]]. */
  def params(numHashes: Int): (Array[Long], Array[Long]) = {
    val a = Array.tabulate(numHashes)(i =>
      java.lang.Math.floorMod(MinHashSignature.splitmix64(1000L + i), P - 1) + 1L)
    val b = Array.tabulate(numHashes)(i =>
      java.lang.Math.floorMod(MinHashSignature.splitmix64(2000L + i), P))
    (a, b)
  }

  /** DuckDB list literal of the A (or B) param array, e.g.
    * `[CAST(123 AS BIGINT), 456, ...]` — first element cast promotes the
    * whole list to BIGINT so the lambda arithmetic never runs in INT32. */
  def sqlParamList(xs: Array[Long]): String =
    xs.zipWithIndex.map { case (x, i) =>
      if (i == 0) s"CAST($x AS BIGINT)" else x.toString
    }.mkString("[", ", ", "]")

  def signature(text: Column, shingleSize: Int, numHashes: Int): Column =
    ExpressionUtils.column(ModPMinHashSignature(
      ExpressionUtils.expression(text), shingleSize, numHashes))

  def shingleSet(text: Column, shingleSize: Int): Column =
    ExpressionUtils.column(ModPShingleSet(
      ExpressionUtils.expression(text), shingleSize))

  /** One rolling window's field hash — shared by both expressions. */
  private[functions] def windowHash(s: String, from: Int, shingleSize: Int): Long = {
    val end = math.min(from + shingleSize, s.length)
    var h = 0L
    var j = from
    while (j < end) {
      h = (h * Base + s.charAt(j)) % P
      j += 1
    }
    h
  }
}

/** Fused text → rolling windows → mod-p hash → k affine minima, one
  * tight loop (the [[MinHashTextSignature]] shape on the prime field).
  * Empty text yields an all-Long.MaxValue signature — filter it out
  * upstream (the SQL twin cannot reduce an empty window list). */
case class ModPMinHashSignature(child: Expression, shingleSize: Int,
    numHashes: Int) extends UnaryExpression with CodegenFallback {
  import ModPMinHash.{P, params}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "modp_minhash_signature"

  private lazy val (pa, pb) = params(numHashes)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val len = s.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nWindows = math.max(len - shingleSize + 1, if (len == 0) 0 else 1)
    var i = 0
    while (i < nWindows) {
      val h = ModPMinHash.windowHash(s, i, shingleSize)
      var k = 0
      while (k < numHashes) {
        val g = (pa(k) * h + pb(k)) % P
        if (g < mins(k)) mins(k) = g
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted DISTINCT mod-p window hashes — the exact-Jaccard verify set
  * for the mod-p family (pair with [[JaccardSortedLongArrays]]). The
  * twin's `list_distinct` over the same window-hash list yields the
  * same set, so |∩|/|∪| is the same double on both engines. */
case class ModPShingleSet(child: Expression, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "modp_shingle_set"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val len = s.length
    val nWindows = math.max(len - shingleSize + 1, if (len == 0) 0 else 1)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < nWindows) {
      set.add(ModPMinHash.windowHash(s, i, shingleSize))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
