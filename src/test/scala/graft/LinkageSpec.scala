package graft

import graft.operators.EntityResolution
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Properties of the Fellegi–Sunter weight helper and the personalized
  * PageRank operator (their end-to-end values are oracle-gated by
  * q_record_linkage / q_linkage_em / q_ppr_seeds; these pin the
  * algebraic invariants that make those gates trustworthy). */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val ppm = Gen.chooseNum(1L, 999999L)

  private def sample(g: Gen[Long], seed: Long): Long =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("fsWeights: discriminative field (m > u) has wA >= 0 >= wD; " +
      "uninformative field scores zero") {
    (1L to 300L).foreach { s =>
      val a = sample(ppm, s); val b = sample(ppm, s * 7919)
      if (a != b) {
        val (m, u) = (math.max(a, b), math.min(a, b))
        val (wa, wd) = EntityResolution.fsWeights(m, u)
        assert(wa >= 0, s"agreement weight for m=$m u=$u")
        assert(wd <= 0, s"disagreement weight for m=$m u=$u")
      }
      val (za, zd) = EntityResolution.fsWeights(a, a)
      assert(za === 0L && zd === 0L, s"m=u=$a must be uninformative")
    }
  }

  test("fsWeights: agreement weight is monotone in m for fixed u") {
    val u = 100000L
    val ws = (1 to 9).map(i => EntityResolution.fsWeights(i * 100000L, u)._1)
    assert(ws === ws.sorted, s"not monotone: $ws")
  }

  test("personalizedPageRank: mass stays on the seed side of a path") {
    // path a-b-c-d with unit weights, seeds = {1}; after 3 rounds the
    // rank must be non-negative, decrease with distance from the seed,
    // and total mass never exceeds Scale
    val e = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L),
      (3L, 4L, 1L), (4L, 3L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val r = graft.operators.Graph.personalizedPageRank(
      e, "src", "dst", "w", seeds, "node", iterations = 3)
      .select(col("node"), col("rank_fp")).as[(Long, Long)]
      .collect().toMap
    assert(r.keySet === Set(1L, 2L, 3L, 4L))
    assert(r.values.forall(_ >= 0L))
    assert(r(1L) > r(3L), s"seed below 2-hop: $r")
    assert(r(2L) > r(4L), s"1-hop below 3-hop: $r")
    assert(r.values.sum <= 1000000000000L, s"mass exceeds Scale: $r")
  }
}
