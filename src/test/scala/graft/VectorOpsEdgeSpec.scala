package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._

/** Edge-input contracts of the vector-ops family (round-4 ADVICE): an
  * all-zero vector must quantize / normalize to zeros — not NaN/Infinity
  * from a 0/0 — and [[Ann.groupCentroids]]'s dyadic-exactness precondition
  * (|v| ≥ 2^-26, the range where v·2^49 is an exact integer) is ENFORCED
  * in-plan by flush-to-zero rather than assumed of the corpus. */
class VectorOpsEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("quantizeInt8: all-zero vector yields zero codes and zero scale, not NaN") {
    val df = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(0.5f, -1f, 0.25f)))
      .toDF("id", "vec")
    val out = Ann.quantizeInt8(df, "id", "vec")
      .orderBy("id", "dim").as[(Long, Int, Int, Double)].collect()
    assert(out.filter(_._1 == 1L).forall(r => r._3 == 0 && r._4 == 0.0))
    // nonzero vectors keep the plain floor codes
    assert(out.filter(_._1 == 2L).map(_._3).toSeq === Seq(63, -127, 31))
  }

  test("quantizedTopK: zero vectors on either side score 0, never NaN") {
    val corpus = Seq((1L, Array(0f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(0f, 1f))).toDF("id", "vec")
    val qs = Seq((10L, Array(0f, 0f)), (11L, Array(1f, 1f)))
      .toDF("qid", "qvec")
    val out = Ann.quantizedTopK(corpus, "id", "vec", qs, "qid", "qvec", k = 3)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.length === 6)
    assert(out.forall(r => !r._5.isNaN && !r._5.isInfinity))
    // the zero query scores 0 against everything; ids break the tie
    assert(out.filter(_._1 == 10L).forall(_._5 == 0.0))
  }

  test("l2NormalizeLong: zero vector maps to zero components, not NaN") {
    val df = Seq((1L, Array(0f, 0f)), (2L, Array(3f, 4f))).toDF("id", "vec")
    val out = Ann.l2NormalizeLong(df, "id", "vec")
      .orderBy("id", "dim").as[(Long, Int, Double)].collect()
    assert(out.filter(_._1 == 1L).forall(_._3 == 0.0))
    assert(out.filter(_._1 == 2L).map(_._3).toSeq === Seq(0.6, 0.8))
  }

  test("groupCentroids: components below 2^-26 flush to zero; at/above survive exactly") {
    val tiny = 1e-9f                    // < 2^-26: must flush
    val small = math.pow(2, -25).toFloat // ≥ 2^-26: must survive exactly
    val df = Seq(("g", Array(tiny, small, 0.5f)), ("g", Array(tiny, small, 0.5f)))
      .toDF("label", "vec")
    val out = Ann.groupCentroids(df, "label", "vec")
      .orderBy("dim").select("centroid").as[Double].collect()
    assert(out(0) === 0.0)              // flushed — NOT ~1e-9
    assert(out(1) === math.pow(2, -25)) // exact dyadic survivor
    assert(out(2) === 0.5)
  }
}
