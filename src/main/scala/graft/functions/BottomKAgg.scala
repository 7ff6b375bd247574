package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: the k rows with the SMALLEST hash per group — a
  * deterministic mergeable uniform sample (bottom-k sketch). The classic
  * distributed-quantile primitive: because "keep the k md5-smallest"
  * commutes with union, map-side partials bound state to k rows per group
  * per input partition and the shuffle carries at most k·#groups rows, at
  * any corpus size. Unlike a reservoir, the result is INDEPENDENT of
  * partitioning and row order (the md5 order is a property of the data),
  * so the same sample — and hence the same quantile estimates — falls out
  * on any cluster layout, the portability argument of the md5 sampling
  * family ([[graft.operators.Sampling]]).
  *
  * Input (hashHex, value); buffer kept (hash, value)-sorted; `finish`
  * re-sorts the survivors by (value, hash) so `element_at(sample, idx)`
  * reads order statistics directly. Steady state rejects in O(1) (new
  * (hash, value) ≥ current max ⇒ untouched buffer).
  *
  * The buffer order is the full (hash, VALUE) pair, not the hash alone:
  * with duplicate hash keys a hash-only order leaves the k-boundary tie
  * arrival/merge-order dependent (which row survives would depend on
  * partitioning — breaking the layout-independence contract above). The
  * pair makes the order total up to fully-identical entries, which are
  * interchangeable in the sample. Callers passing a unique keyCol (all
  * registered ones: event_id, deduped KMV keys) see bit-identical
  * behavior either way. */
class BottomKAgg(k: Int) extends Aggregator[
    (String, Double), Seq[(String, Double)], Seq[Double]] {
  require(k >= 1)

  override def zero: Seq[(String, Double)] = Seq.empty

  override def reduce(b: Seq[(String, Double)],
      x: (String, Double)): Seq[(String, Double)] =
    if (b.size >= k && (x._1 > b.last._1 ||
        (x._1 == b.last._1 && x._2 >= b.last._2))) b
    else ((b :+ x).sortBy(t => (t._1, t._2))).take(k)

  override def merge(a: Seq[(String, Double)],
      b: Seq[(String, Double)]): Seq[(String, Double)] =
    (a ++ b).sortBy(t => (t._1, t._2)).take(k)

  override def finish(b: Seq[(String, Double)]): Seq[Double] =
    b.sortBy { case (h, v) => (v, h) }.map(_._2)

  override def bufferEncoder: Encoder[Seq[(String, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
      Seq[(String, Double)]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
