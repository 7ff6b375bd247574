package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankFixedPoint: hand-computed 2-node cycle") {
    // a ⇄ b, unit weights, n=2: ranks stay at the uniform fixpoint
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("s", "t", "w")
    val out = Graph.pageRankFixedPoint(edges, "s", "t", "w", iterations = 3)
      .as[(String, Long, Double)].collect()
      .map { case (n, fp, r) => n -> ((fp, r)) }.toMap
    // r0 = 10^12/2 = 5e11 each; contrib = 5e11; next =
    // 150e12 div 2000 + 850*5e11 div 1000 = 75e9 + 425e9 = 5e11 — fixpoint
    assert(out("a")._1 === 500000000000L)
    assert(out("b")._1 === 500000000000L)
    assert(out("a")._2 === 0.5)
  }

  test("pageRankFixedPoint: star graph concentrates rank on the sink") {
    // a→d, b→d, c→d, d→a : d collects 3 shares, a gets d's mass back
    val edges = Seq(("a", "d", 1L), ("b", "d", 1L), ("c", "d", 1L),
      ("d", "a", 1L)).toDF("s", "t", "w")
    val out = Graph.pageRankFixedPoint(edges, "s", "t", "w", iterations = 3)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(out("d") > out("a"))          // sink beats its satellite
    assert(out("a") > out("b"))          // a is fed by d; b only teleports
    assert(out("b") === out("c"))        // symmetric leaves identical (exact)
    // total mass bounded by SCALE (dangling decay can only lose mass)
    assert(out.values.sum <= 1000000000000L)
  }

  test("triangles: known graph — one triangle plus a pendant edge") {
    // a-b-c triangle, plus d hanging off a. Directions/dups must not matter.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("b", "a"),
      ("a", "d")).toDF("s", "t")
    val out = Graph.triangles(edges, "s", "t")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("a") === ((3L, 1L, 2.0 / 6.0))) // deg 3: b, c, d
    assert(out("b") === ((2L, 1L, 1.0)))
    assert(out("c") === ((2L, 1L, 1.0)))
    assert(out("d") === ((1L, 0L, 0.0)))       // degree < 2 → 0
  }

  test("triangles: triangle-free graph reports all zeros") {
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("s", "t")
    val out = Graph.triangles(path, "s", "t")
      .as[(String, Long, Long, Double)].collect()
    assert(out.forall(_._3 === 0L))
    assert(out.forall(_._4 === 0.0))
  }

  test("pageRankFixedPoint: deterministic across repartitioning") {
    val edges = Seq(("a", "b", 3L), ("b", "c", 2L), ("c", "a", 5L),
      ("a", "c", 1L)).toDF("s", "t", "w")
    val r1 = Graph.pageRankFixedPoint(edges, "s", "t", "w")
      .as[(String, Long, Double)].collect().toSeq
    val r2 = Graph.pageRankFixedPoint(edges.repartition(7), "s", "t", "w")
      .as[(String, Long, Double)].collect().toSeq
    assert(r1 === r2)
  }

  test("labelPropagation: two cliques with a weak bridge split in two") {
    // clique {1,2,3} and clique {11,12,13} (weight 5 inside), one
    // weight-1 bridge 3-11: heavy intra-clique weights must win
    val clique = (ns: Seq[Long]) => for {
      a <- ns; b <- ns if a < b
    } yield (a, b, 5L)
    val edges = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(11L, 12L, 13L)) ++
      Seq((3L, 11L, 1L))).toDF("s", "t", "w")
    val out = Graph.labelPropagation(edges, "s", "t", "w", iters = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L, 1L), (11L, 3L, 11L)))
  }

  test("labelPropagation: deterministic across repartitioning") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L),
      (4L, 1L, 2L), (2L, 4L, 3L)).toDF("s", "t", "w")
    val r1 = Graph.labelPropagation(edges, "s", "t", "w", iters = 4)
      .as[(Long, Long, Long)].collect().toSeq
    val r2 = Graph.labelPropagation(edges.repartition(5), "s", "t", "w",
      iters = 4).as[(Long, Long, Long)].collect().toSeq
    assert(r1 === r2)
  }
}
