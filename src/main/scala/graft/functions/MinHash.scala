package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ExprBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** MinHash signature in ONE pass over the shingle array.
  *
  * The compositional formulation (k × `array_min(transform(shingles,
  * xxhash64(_, i)))`) re-materializes the shingle array and re-hashes every
  * shingle k times — measured 200+ s on 500 docs at k=64. This expression
  * hashes each shingle once (FNV-1a 64) and derives the k hash-family members
  * by SplitMix64-mixed affine transforms, tracking all k minima in a single
  * loop: O(|shingles| · k) cheap word ops, no per-hash string re-reads.
  *
  * Deterministic across JVMs (no Object.hashCode, no Random).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // affine family params a_i (odd), b_i — fixed at plan time, deterministic
  private lazy val params: Array[(Long, Long)] =
    Array.tabulate(numHashes) { i =>
      (MinHashSignature.splitmix64(2L * i + 1) | 1L,
        MinHashSignature.splitmix64(2L * i + 2))
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        val h = SimHash64.fnv1a64(arr.getUTF8String(e))
        var i = 0
        while (i < numHashes) {
          val (a, b) = params(i)
          val g = MinHashSignature.mix(a * h + b)
          if (g < mins(i)) mins(i) = g
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused shingle+MinHash: computes the k min-hashes over the rolling
  * character n-gram windows of `text` in ONE tight loop — no shingle array
  * is ever materialized. This matters doubly under CodegenFallback: a
  * fallback expression evaluates its CHILD subtree interpreted, so feeding
  * it a Catalyst `shingles(text)` array re-runs the whole array pipeline in
  * interpreted mode per row (measured 16 s / 5000 docs; this expression:
  * sub-second). Duplicate shingles need no dedup — min() is idempotent
  * under multiplicity, so multiset minhash == set minhash. */
case class MinHashTextSignature(child: Expression, shingleSize: Int,
    numHashes: Int) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_text_signature"

  private lazy val params: Array[(Long, Long)] =
    Array.tabulate(numHashes) { i =>
      (MinHashSignature.splitmix64(2L * i + 1) | 1L,
        MinHashSignature.splitmix64(2L * i + 2))
    }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val len = s.length
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nWindows = math.max(len - shingleSize + 1, if (len == 0) 0 else 1)
    var i = 0
    while (i < nWindows) {
      // FNV-1a over the UTF-16 chars of the window (self-consistent family)
      var h = 0xcbf29ce484222325L
      val end = math.min(i + shingleSize, len)
      var j = i
      while (j < end) {
        val c = s.charAt(j)
        h ^= (c & 0xffL); h *= 0x100000001b3L
        h ^= ((c >> 8) & 0xffL); h *= 0x100000001b3L
        j += 1
      }
      var k = 0
      while (k < numHashes) {
        val (a, b) = params(k)
        val g = MinHashSignature.mix(a * h + b)
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

object MinHashTextSignature {
  def minhashText(text: Column, shingleSize: Int, numHashes: Int): Column =
    ExpressionUtils.column(MinHashTextSignature(
      ExpressionUtils.expression(text), shingleSize, numHashes))
}

/** Count of positions where two equal-length long arrays agree — the
  * MinHash Jaccard estimator (agreements / k). A 64-step primitive loop;
  * the zip_with+aggregate formulation is interpreter-evaluated per element
  * and measured ~100× slower on wide candidate sets. */
case class SignatureAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "signature_agreement"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var c = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    java.lang.Integer.valueOf(c)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object SignatureAgreement {
  def agreement(a: Column, b: Column): Column =
    ExpressionUtils.column(SignatureAgreement(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** 0-based index of the FIRST LSH band whose `rowsPerBand`-element slices
  * of the two signatures agree entirely, or -1 when no band agrees.
  *
  * Purpose (round-12 optimization): in the banded candidate self-join a
  * pair sharing m bands is emitted m times, and the classic fix —
  * `dropDuplicates(id_a, id_b)` — is a full exchange of the MULTIPLIED
  * candidate stream (measured ~136M rows at sf0.1's background
  * similarity for the r=1 linkage family vs 12.5M distinct pairs).
  * Filtering the join output on `band == first_agreeing_band(sig_a,
  * sig_b)` instead keeps exactly one row per candidate pair in the same
  * pipelined stage as the join — no exchange, no hash-dedup build.
  *
  * Exactness: slice equality implies band-bucket equality (the bucket is
  * a hash of the slice), so the kept row is always among the join's
  * output rows, and each pair with >= 1 agreeing slice survives exactly
  * once. A pair whose buckets collide while NO slice agrees (P ~ 2^-64
  * per band) is dropped here but was a candidate in the dedup
  * formulation; such a pair must also pass the estimate prefilter AND
  * exact-Jaccard verification to reach any output, and every gate using
  * this path is oracle-verified against brute force. Early exit: the
  * expected scan length is 1/P(band-agreement) bands, independent of k. */
case class FirstAgreeingBand(left: Expression, right: Expression,
    rowsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "first_agreeing_band"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val bands = n / rowsPerBand
    var band = 0
    while (band < bands) {
      var i = band * rowsPerBand
      val end = i + rowsPerBand
      var ok = true
      while (ok && i < end) {
        if (x.getLong(i) != y.getLong(i)) ok = false
        i += 1
      }
      if (ok) return java.lang.Integer.valueOf(band)
      band += 1
    }
    java.lang.Integer.valueOf(-1)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object FirstAgreeingBand {
  def firstBand(a: Column, b: Column, rowsPerBand: Int): Column =
    ExpressionUtils.column(FirstAgreeingBand(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      rowsPerBand))
}

/** Exact Jaccard of two SORTED, DISTINCT string arrays via a single merge
  * pass — no per-element hashing, no set allocation. The caller guarantees
  * sortedness (sort_array(array_distinct(...))); order is Spark's UTF8String
  * binary order. array_intersect/array_union per pair allocate and hash
  * every element and dominate verify cost on dense candidate sets. */
case class JaccardSortedArrays(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaccard_sorted"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    java.lang.Double.valueOf(
      if (union == 0) 0.0 else inter.toDouble / union)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object JaccardSortedArrays {
  def jaccardSorted(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardSortedArrays(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Distinct hashed shingle set of `text` as a SORTED array<long>: the
  * rolling character n-gram windows, each FNV-1a-64 hashed (the same
  * per-window hash [[MinHashTextSignature]] uses), deduped and sorted in
  * one pass — no string array is ever materialized.
  *
  * Purpose: the exact-Jaccard verify stage. Jaccard over hashed sets
  * equals Jaccard over string sets absent 64-bit collisions (P ≈ n²/2^65
  * per doc — the same accepted trade as fingerprint-based exact dedup),
  * while the rows that cross the verify joins shrink from ~13 B+overhead
  * per shingle STRING to a flat 8 B/element long array, and the per-pair
  * merge compares words instead of memcmp. Window semantics mirror
  * TextFeatures.shingles: text shorter than the window yields one
  * whole-text shingle (an empty text hashes the empty window), so the
  * two formulations agree on every input. */
case class HashedShingleSet(child: Expression, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingle_set"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val len = s.length
    val nWindows = math.max(len - shingleSize + 1, 1)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < nWindows) {
      var h = 0xcbf29ce484222325L
      val end = math.min(i + shingleSize, len)
      var j = i
      while (j < end) {
        val c = s.charAt(j)
        h ^= (c & 0xffL); h *= 0x100000001b3L
        h ^= ((c >> 8) & 0xffL); h *= 0x100000001b3L
        j += 1
      }
      set.add(h)
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

object HashedShingleSet {
  def hashedShingles(text: Column, shingleSize: Int): Column =
    ExpressionUtils.column(HashedShingleSet(
      ExpressionUtils.expression(text), shingleSize))
}

/** Exact Jaccard of two SORTED, DISTINCT long arrays — the word-compare
  * twin of [[JaccardSortedArrays]] for hashed shingle sets. */
case class JaccardSortedLongArrays(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted_long"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xa = x.getLong(i); val yb = y.getLong(j)
      if (xa == yb) { inter += 1; i += 1; j += 1 }
      else if (xa < yb) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    java.lang.Double.valueOf(
      if (union == 0) 0.0 else inter.toDouble / union)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object JaccardSortedLongArrays {
  def jaccardSortedLong(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardSortedLongArrays(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

object MinHashSignature {
  /** SplitMix64 (public-domain PRNG step; Steele et al., "Fast Splittable
    * Pseudorandom Number Generators", OOPSLA 2014). */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Final avalanche mix so affine-related family members decorrelate. */
  def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  /** minhash_signature(shingles, k) as a Column. */
  def minhash(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinHashSignature(ExpressionUtils.expression(shingles), numHashes))
}
