package graft.operators

import org.apache.spark.sql.{DataFrame}
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
  * `ORDER BY ... OFFSET k-1`.
  */
object Selection {

  /** Exact k-th smallest (1-based) of `vCol` (a LONG column). */
  def exactKth(df: DataFrame, vCol: String, k: Long): Long = {
    val v = col(vCol).cast("long")
    val Row0 = df.agg(min(v).as("lo"), max(v).as("hi"),
      count(v).as("n")).collect()(0)
    var (lo, hi) = (Row0.getLong(0), Row0.getLong(1))
    require(k >= 1 && k <= Row0.getLong(2), s"k=$k out of range")
    var kRem = k
    while (lo < hi) {
      // shift so that (hi-lo) >> shift < 2^16; range arithmetic stays
      // exact because values are already bounded by [lo, hi]
      val span = hi - lo
      val shift = math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(span) - 16)
      val hist = df.filter(v.between(lo, hi))
        .groupBy(shiftright(v - lit(lo), shift).as("b"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      var acc = 0L
      var found = -1L
      hist.foreach { case (b, c) =>
        if (found < 0) {
          if (acc + c >= kRem) { found = b; kRem -= acc }
          else acc += c
        }
      }
      val newLo = lo + (found << shift)
      // overflow-safe upper bound: newLo + (2^shift - 1), clamped to hi
      // without ever forming a sum that can wrap
      val newHi = if (hi - newLo < (1L << shift)) hi
        else newLo + ((1L << shift) - 1)
      if (shift == 0) return newLo
      lo = newLo; hi = newHi
    }
    lo
  }

  /** Named exact quantiles of a long column by the lower-element rule
    * (`k = ⌈p·n⌉`, matching `ORDER BY v LIMIT 1 OFFSET k-1`): returns a
    * local (stat, value) frame for the caller to union or join. */
  def exactQuantiles(df: DataFrame, vCol: String,
      ps: Seq[(String, Double)]): Seq[(String, Long)] = {
    val n = df.agg(count(col(vCol))).collect()(0).getLong(0)
    ps.map { case (name, p) =>
      val k = math.max(1L, math.ceil(p * n).toLong)
      name -> exactKth(df, vCol, k)
    }
  }
}
