package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: per-term head-of-posting-list sample — the `k`
  * smallest (doc_id, tf) pairs by doc_id, rendered `"doc:tf,..."`.
  *
  * The whole point is the BOUNDED buffer: a stopword's term group at
  * corpus scale holds ~every document, and a window-rank cap would route
  * all of it through one partition (the classic skewed-straggler). Here
  * map-side partial aggregation ships at most k entries per term per
  * input partition, so the term shuffle is ∝ vocab·k regardless of df
  * skew. Buffer kept sorted ascending by doc_id; inserts past a full
  * buffer whose max is already ≤ the candidate are O(1) rejected.
  */
class PostingsAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], String] {

  private def insert(buf: Seq[(Long, Long)],
      x: (Long, Long)): Seq[(Long, Long)] =
    if (buf.size >= k && buf.last._1 <= x._1) buf
    else ((buf :+ x).sortBy(_._1)).take(k)

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)],
      x: (Long, Long)): Seq[(Long, Long)] = insert(buf, x)

  override def merge(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sortBy(_._1).take(k)

  override def finish(buf: Seq[(Long, Long)]): String =
    buf.map { case (d, tf) => s"$d:$tf" }.mkString(",")

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
