package graft.functions

import java.math.{BigDecimal => JBD, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass exact Gram accumulator result: `n` vectors, the upper
  * triangle of Σxᵢxⱼ floored to 1e-12 units (row-major by (i, j≥i)),
  * and per-dim Σxᵢ floored to 1e-6 units. */
case class GramStats(n: Long, g12: Seq[Long], s6: Seq[Long])

/** EXACT one-pass Gram/moment aggregation over `array<float>` vectors —
  * the scalable replacement for the explode-2080-structs-per-vector
  * formulation (which evaluated an INTERPRETED nested lambda per struct:
  * ~10M interpreted rows at sf0.1, measured ~5 s; this pass is a tight
  * JVM loop with one ~60 KB partial per partition).
  *
  * Arithmetic contract (must stay bit-identical to the Catalyst
  * formulation the DuckDB twin mirrors):
  *  - per-element products are float→double (exact: 24-bit mantissas),
  *  - each product/value is rounded EXACTLY like Spark's
  *    `cast(double AS decimal(_,18))`: via the double's SHORTEST decimal
  *    string (`BigDecimal.valueOf`), then setScale(18, HALF_UP),
  *  - accumulation is exact BigInt on the 1e-18-unscaled values
  *    (order-independent), with FLOOR division to the output units.
  */
class GramAgg(dim: Int)
    extends Aggregator[Seq[Float], GramAgg.Buf, GramStats] {
  private val nPairs = dim * (dim + 1) / 2

  override def zero: GramAgg.Buf = new GramAgg.Buf(0L,
    Array.fill(nPairs)(BigInt(0)), Array.fill(dim)(BigInt(0)))

  override def reduce(b: GramAgg.Buf, v: Seq[Float]): GramAgg.Buf = {
    val xs = new Array[Double](dim)
    var i = 0
    while (i < dim) { xs(i) = v(i).toDouble; i += 1 }
    var idx = 0
    i = 0
    while (i < dim) {
      b.s(i) = b.s(i) + GramAgg.unscaled18(xs(i))
      var j = i
      while (j < dim) {
        b.g(idx) = b.g(idx) + GramAgg.unscaled18(xs(i) * xs(j))
        idx += 1; j += 1
      }
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(a: GramAgg.Buf, b: GramAgg.Buf): GramAgg.Buf = {
    var k = 0
    while (k < nPairs) { a.g(k) = a.g(k) + b.g(k); k += 1 }
    k = 0
    while (k < dim) { a.s(k) = a.s(k) + b.s(k); k += 1 }
    a.n += b.n
    a
  }

  override def finish(b: GramAgg.Buf): GramStats = GramStats(b.n,
    b.g.map(GramAgg.floorDiv(_, GramAgg.Div12)).map(_.toLong).toSeq,
    b.s.map(GramAgg.floorDiv(_, GramAgg.Div6)).map(_.toLong).toSeq)

  override def bufferEncoder: Encoder[GramAgg.Buf] =
    Encoders.kryo[GramAgg.Buf]
  override def outputEncoder: Encoder[GramStats] =
    Encoders.product[GramStats]
}

object GramAgg {
  final class Buf(var n: Long, val g: Array[BigInt], val s: Array[BigInt])
    extends Serializable

  // sums carry 18 frac digits; outputs are 1e-12 (Gram) and 1e-6 (dims)
  private[functions] val Div12 = BigInt(1000000L)        // 18 → 12
  private[functions] val Div6 = BigInt(1000000000000L)   // 18 → 6

  /** `cast(d AS decimal(_,18))` the way Spark does it — shortest decimal
    * string, then HALF_UP to 18 — returned as the 1e-18-unscaled int. */
  private[functions] def unscaled18(d: Double): BigInt =
    BigInt(JBD.valueOf(d).setScale(18, RoundingMode.HALF_UP)
      .unscaledValue())

  /** Floor division (BigInt `/` truncates toward zero). */
  private[functions] def floorDiv(x: BigInt, y: BigInt): BigInt = {
    val q = x / y
    if (x.sign < 0 && q * y != x) q - 1 else q
  }
}
