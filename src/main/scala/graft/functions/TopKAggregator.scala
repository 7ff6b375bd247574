package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY.md §2.11): per-group top-k (score, item)
  * pairs with a bounded buffer — the mapping cascade's "best match +
  * alternatives" accumulation as a first-class aggregate. Unlike the
  * window row_number formulation, the buffer never exceeds k entries, so
  * map-side partial aggregation ships at most k rows per group per
  * partition — the right shape when groups are huge and k is tiny.
  *
  * Ordering: score desc, then item asc (stable, deterministic).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, String), Seq[(Double, String)], Seq[String]] {

  private def insert(buf: Seq[(Double, String)],
      x: (Double, String)): Seq[(Double, String)] = {
    val merged = (buf :+ x).sortBy { case (s, item) => (-s, item) }
    merged.take(k)
  }

  override def zero: Seq[(Double, String)] = Seq.empty

  override def reduce(buf: Seq[(Double, String)],
      x: (Double, String)): Seq[(Double, String)] = insert(buf, x)

  override def merge(a: Seq[(Double, String)],
      b: Seq[(Double, String)]): Seq[(Double, String)] =
    (a ++ b).sortBy { case (s, item) => (-s, item) }.take(k)

  override def finish(buf: Seq[(Double, String)]): Seq[String] =
    buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, String)]]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
