package graft

import graft.operators.Denoise
import org.apache.spark.sql.functions._

/** The property that makes a denoising pair builder CORRECT is
  * losslessness: the (input, target) pair must reconstruct the source
  * document exactly — otherwise the objective trains on silently
  * corrupted text. Both specs reconstruct and compare byte-for-byte. */
class DenoiseSpec extends SparkSpec {
  import spark.implicits._

  // varied lengths incl. shorter-than-stride and span-truncated tails
  lazy val docs = (0L until 40L).map { i =>
    val n = 1 + (i * 7 % 23).toInt
    (i, (0 until n).map(j => s"w${i}_$j").mkString(" "))
  }.toDF("doc_id", "text")

  test("spanCorrupt: lossless — substituting target spans into input " +
      "sentinels reconstructs every document") {
    val out = Denoise.spanCorrupt(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String, String)].collect()
    assert(out.length === 40)
    val byId = docs.as[(Long, String)].collect().toMap
    val sent = "<X(\\d+)>".r
    out.foreach { case (id, nTok, nMask, nSpans, input, target) =>
      assert(nMask <= 3 * nSpans && nSpans <= (nTok + 7) / 8)
      // parse target into span_ordinal -> tokens
      val spans = scala.collection.mutable.Map[Int, Vector[String]]()
      var cur = -1
      target.split(" ").filter(_.nonEmpty).foreach {
        case sent(k) => cur = k.toInt; spans(cur) = Vector.empty
        case t => spans(cur) = spans(cur) :+ t
      }
      assert(spans.size === nSpans)
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap {
        case sent(k) => spans(k.toInt)
        case t => Vector(t)
      }.mkString(" ")
      assert(rebuilt === byId(id), s"doc $id reconstruct")
    }
    // masked rate sanity on the aggregate: coin is 4/16 at stride 8
    // over span 3 ⇒ E[masked] ≈ 9%; assert a wide band on the corpus
    val (m, t) = (out.map(_._3).sum.toDouble, out.map(_._2).sum.toDouble)
    assert(m / t > 0.02 && m / t < 0.25, s"mask rate ${m / t}")
  }

  test("fimTransform: lossless — PRE/SUF/MID fields reassemble the " +
      "document; cuts in range") {
    val longDocs = docs.filter(length(col("text")) >= 8)
    val out = Denoise.fimTransform(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out.length === longDocs.count())
    val byId = longDocs.as[(Long, String)].collect().toMap
    val re = "(?s)<PRE>(.*)<SUF>(.*)<MID>(.*)".r
    out.foreach { case (id, len, p1, p2, fim) =>
      assert(p1 >= 1 && p1 <= p2 && p2 <= len - 0)
      val re(pre, suf, mid) = fim
      assert(pre.length === p1 && pre + mid + suf === byId(id),
        s"doc $id reassemble")
    }
    // layout independence
    val out13 = Denoise.fimTransform(docs.repartition(13), "doc_id", "text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out13.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }
}
