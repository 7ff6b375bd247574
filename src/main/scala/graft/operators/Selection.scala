package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT order statistics without a global sort: the k-th
  * smallest of a long column via iterative histogram refinement.
  *
  * A global `ORDER BY` of 100 TB to read one element is the classic
  * anti-pattern; the selection here does it with a bounded number of
  * counting passes:
  *
  *   1. one agg computes (min, max, count);
  *   2. each round buckets the remaining candidate RANGE into ≤ 2¹⁶
  *      buckets (`(v - lo) >> shift`), counts per bucket [map-side
  *      partial agg, ≤ 65 536 rows collected], and walks the cumulative
  *      histogram to find the bucket holding the k-th element —
  *      narrowing the range 65 536× per round, so a full 64-bit domain
  *      needs ≤ 4 rounds;
  *   3. when the range fits one bucket granularity (shift 0), the walk
  *      lands on the exact value.
  *
  * Driver state is one 65 536-entry histogram per round — never the
  * data. Every step is integer arithmetic on the quantized column, so
  * the result is the exact element, bit-identical to the oracle's
  * `ORDER BY ... OFFSET k-1`. Multi-quantile calls share the bounds agg
  * and the full-range first histogram — the expensive full-table passes
  * are paid ONCE for any number of quantiles; only the narrowed (and
  * selectively range-filtered) rounds run per quantile.
  */
object Selection {

  /** One counting pass: per-bucket counts of `(v−lo) >> shift` over
    * rows with v ∈ [lo, hi], sorted by bucket. */
  private def histogram(df: DataFrame, v: Column, lo: Long, hi: Long,
      shift: Int): Array[(Long, Long)] =
    df.filter(v.between(lo, hi))
      .groupBy(shiftright(v - lit(lo), shift).as("b"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** Walk a histogram for the k-th element: returns (bucket, k within
    * bucket). */
  private def walk(hist: Array[(Long, Long)], k: Long): (Long, Long) = {
    var acc = 0L
    hist.foreach { case (b, c) =>
      if (acc + c >= k) return (b, k - acc)
      acc += c
    }
    throw new IllegalStateException(s"k=$k beyond histogram total $acc")
  }

  private def shiftFor(span: Long): Int =
    math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(span) - 16)

  /** Narrowed bounds after selecting `bucket` at `shift` in [lo, hi] —
    * overflow-safe (never forms a sum that can wrap). */
  private def narrow(lo: Long, hi: Long, bucket: Long, shift: Int)
      : (Long, Long) = {
    val newLo = lo + (bucket << shift)
    val newHi = if (hi - newLo < (1L << shift)) hi
      else newLo + ((1L << shift) - 1)
    (newLo, newHi)
  }

  /** Refine [lo, hi] down to the exact kRem-th element in range. */
  private def refine(df: DataFrame, v: Column, lo0: Long, hi0: Long,
      k0: Long): Long = {
    var (lo, hi, kRem) = (lo0, hi0, k0)
    while (lo < hi) {
      val shift = shiftFor(hi - lo)
      val (b, k2) = walk(histogram(df, v, lo, hi, shift), kRem)
      val (nl, nh) = narrow(lo, hi, b, shift)
      if (shift == 0) return nl
      lo = nl; hi = nh; kRem = k2
    }
    lo
  }

  /** Exact k-th smallest (1-based) of `vCol` (a LONG column). */
  def exactKth(df: DataFrame, vCol: String, k: Long): Long = {
    val v = col(vCol).cast("long")
    val r0 = df.agg(min(v).as("lo"), max(v).as("hi"),
      count(v).as("n")).collect()(0)
    require(k >= 1 && k <= r0.getLong(2), s"k=$k out of range")
    refine(df, v, r0.getLong(0), r0.getLong(1), k)
  }

  /** Named exact quantiles of a long column by the lower-element rule
    * (`k = ⌈p·n⌉`, matching `ORDER BY v LIMIT 1 OFFSET k-1`): returns a
    * local (stat, value) list for the caller to union or join. The
    * bounds agg and the full-range first histogram are computed once
    * and shared by every quantile. */
  def exactQuantiles(df: DataFrame, vCol: String,
      ps: Seq[(String, Double)]): Seq[(String, Long)] = {
    val v = col(vCol).cast("long")
    val r0 = df.agg(min(v).as("lo"), max(v).as("hi"),
      count(v).as("n")).collect()(0)
    val (lo, hi, n) = (r0.getLong(0), r0.getLong(1), r0.getLong(2))
    if (lo == hi) return ps.map { case (name, _) => name -> lo }
    val shift = shiftFor(hi - lo)
    val hist = histogram(df, v, lo, hi, shift)
    ps.map { case (name, p) =>
      val k = math.max(1L, math.ceil(p * n).toLong)
      val (b, k2) = walk(hist, k)
      val (nl, nh) = narrow(lo, hi, b, shift)
      name -> (if (shift == 0) nl else refine(df, v, nl, nh, k2))
    }
  }
}
