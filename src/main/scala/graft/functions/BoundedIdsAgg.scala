package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: collect a group's ids up to a hard `cap`, then stop
  * (sticky-full buffer). The [[PostingsAgg]] discipline applied to the
  * document-frequency gate of [[graft.operators.Dedup.exactSubstrPairs]]:
  * a boilerplate run's group at corpus scale holds ~every document, and an
  * unbounded `collect_set` would buffer (and ship) all of it before the
  * size filter could drop the group. With the cap, map-side partial
  * aggregation ships at most `cap` ids per run hash per input partition,
  * so the run shuffle is ∝ #hashes·cap regardless of df skew — and a group
  * that arrives at the cap is BY CONSTRUCTION over the df gate (callers
  * set cap = maxDf+1 and filter `size ≤ maxDf`), so truncation never loses
  * an answer, only boilerplate.
  *
  * Callers must feed per-group-distinct ids (CharRunHashes emits each
  * (doc, run) once); the buffer then needs no dedup. `finish` sorts for
  * deterministic downstream pairing order.
  */
class BoundedIdsAgg(cap: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(cap >= 1)

  override def zero: Seq[Long] = Seq.empty

  override def reduce(b: Seq[Long], x: Long): Seq[Long] =
    if (b.size >= cap) b else b :+ x

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    if (a.size >= cap) a else (a ++ b).take(cap)

  override def finish(b: Seq[Long]): Seq[Long] = b.sorted

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
