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

  test("kCore: triangle survives k=2, pendant chain peels away") {
    // triangle a-b-c (2-core) with chain c-d-e hanging off: one round
    // drops e (deg 1), the next drops d — rounds=3 converges
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("d", "e")).toDF("s", "t")
    val out = Graph.kCore(edges, "s", "t", k = 2, rounds = 3)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("a", 2L), ("b", 2L), ("c", 2L)))
  }

  test("kCore: k above max degree empties the graph") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("s", "t")
    assert(Graph.kCore(edges, "s", "t", k = 3, rounds = 2).count() === 0L)
  }

  test("kCore: unconverged round count is still well-defined and monotone") {
    // long chain: every round peels both current endpoints (deg 1)
    val chain = (1L to 8L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("s", "t")
    val r1 = Graph.kCore(chain, "s", "t", k = 2, rounds = 1).count()
    val r3 = Graph.kCore(chain, "s", "t", k = 2, rounds = 3).count()
    assert(r1 >= r3) // peeling only shrinks
    assert(Graph.kCore(chain, "s", "t", k = 2, rounds = 8).count() === 0L)
  }

  test("bfsDistances: path graph distances from one seed, truncated") {
    import spark.implicits._
    // path 1-2-3-4-5, seed {1}: rounds=2 reaches dist 0,1,2; 4,5 absent
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "t")
    val seeds = Seq(1L).toDF("seed")
    val out = Graph.bfsDistances(edges, "s", "t", seeds, "seed", rounds = 2)
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L), (2L, 1L), (3L, 2L)))
    // rounds=4 covers the whole path
    val full = Graph.bfsDistances(edges, "s", "t", seeds, "seed", rounds = 4)
      .as[(Long, Long)].collect().toSeq
    assert(full === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L)))
  }

  test("bfsDistances: multi-source takes the nearest seed; isolated seed ignored") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "t")
    val seeds = Seq(1L, 4L, 99L).toDF("seed") // 99 not in the graph
    val out = Graph.bfsDistances(edges, "s", "t", seeds, "seed", rounds = 3)
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 0L)))
  }

  test("weightedSssp: cheap 2-hop beats expensive direct edge; parallel edges collapse to min") {
    import spark.implicits._
    // 1-3 direct costs 10; 1-2-3 costs 2+3=5 → dist(3)=5. A duplicate
    // (1,2) edge at cost 9 must NOT shadow the cheaper 2.
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 2L), (1L, 2L, 9L),
      (2L, 3L, 3L)).toDF("s", "t", "w")
    val seeds = Seq(1L).toDF("seed")
    val out = Graph.weightedSssp(edges, "s", "t", "w", seeds, "seed",
        rounds = 3)
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L), (2L, 2L), (3L, 5L)))
    // rounds=1 is the ≤1-edge prefix: dist(3) is the direct edge's 10
    val one = Graph.weightedSssp(edges, "s", "t", "w", seeds, "seed",
        rounds = 1)
      .as[(Long, Long)].collect().toSeq
    assert(one === Seq((1L, 0L), (2L, 2L), (3L, 10L)))
  }

  test("randomWalks: derived hops are partition-independent and edge-valid") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("s", "t")
    val seeds = Seq(1L, 3L).toDF("seed")
    val r1 = Graph.randomWalks(edges, "s", "t", seeds, "seed", steps = 3)
      .as[(Long, Long, Long)].collect().toSeq
    val r2 = Graph.randomWalks(edges.repartition(7), "s", "t", seeds,
        "seed", steps = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r1 === r2)                       // md5-derived, not sampled
    assert(r1.count(_._2 == 0L) === 2)      // both seeds start a walk
    // every consecutive hop is a real edge
    val adj = Set((1L,2L),(2L,3L),(3L,4L),(1L,4L),(1L,3L))
      .flatMap { case (a,b) => Seq((a,b),(b,a)) }
    r1.groupBy(_._1).values.foreach { w =>
      w.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Seq(a, b) => assert(adj.contains((a, b)), s"hop $a->$b")
        case _ => ()
      }
    }
  }

  test("adamicAdar: square predicts its two diagonals, hand-scored") {
    // cycle 1-2-3-4-1: non-adjacent pairs (1,3) and (2,4) each share
    // two degree-2 neighbors → aa = 2 · (64000000 div 64) = 2000000
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "t")
    val out = Graph.adamicAdar(edges, "s", "t")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L, 2L, 2000000L), (2L, 4L, 2L, 2000000L)))
  }

  test("adamicAdar: adjacent pairs are excluded, hubs are capped") {
    // star center h connected to 1..5 plus edge 1-2: with maxDeg=3 the
    // hub h (deg 5) cannot intermediate; only (1,2)'s non-adjacent...
    // 1-2 are adjacent so nothing qualifies through capped paths
    val edges = ((1L to 5L).map(i => (100L, i)) ++ Seq((1L, 2L)))
      .toDF("s", "t")
    val capped = Graph.adamicAdar(edges, "s", "t", maxDeg = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(capped.isEmpty)
    // uncapped: all C(5,2) satellite pairs except the adjacent (1,2)
    val full = Graph.adamicAdar(edges, "s", "t", maxDeg = 64)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(full.size === 9)
    assert(!full.exists(r => r._1 === 1L && r._2 === 2L))
    // all scores via the deg-5 hub: 64000000 div lg64(5) — equal, >0
    assert(full.map(_._4).distinct.size === 1 && full.head._4 > 0)
  }

  test("adamicAdar: deterministic across repartitioning") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 5L),
      (5L, 3L)).toDF("s", "t")
    val r1 = Graph.adamicAdar(edges, "s", "t")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val r2 = Graph.adamicAdar(edges.repartition(5), "s", "t")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r1 === r2)
  }


  test("modularity: two cliques beat the random-mix expectation") {
    import spark.implicits._
    // two triangles joined by one bridge; LPA labels split them
    val edges = (Seq((1L,2L),(2L,3L),(1L,3L),(11L,12L),(12L,13L),
      (11L,13L),(3L,11L))).map{case (a,b)=>(a,b,1L)}.toDF("s","t","w")
    val labels = Seq((1L,1L),(2L,1L),(3L,1L),(11L,11L),(12L,11L),
      (13L,11L)).toDF("node","label")
    val out = Graph.modularity(edges, "s", "t", "w", labels)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // m=7; community 1: intra=3, d_c=7 -> (4*7*3-49)*1000 // 196 = 178
    assert(out === Seq((1L, 3L, 3L, 7L, 178L), (11L, 3L, 3L, 7L, 178L)))
  }

  test("modularity: all-in-one community scores exactly 0") {
    import spark.implicits._
    val edges = Seq((1L,2L,1L),(2L,3L,1L)).toDF("s","t","w")
    val labels = Seq((1L,1L),(2L,1L),(3L,1L)).toDF("node","label")
    val out = Graph.modularity(edges, "s", "t", "w", labels)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // m=2, intra=2, d_c=4: (4*2*2-16)*1000 // 16 = 0
    assert(out === Seq((1L, 3L, 2L, 4L, 0L)))
  }

  test("modularity: negative contribution floors like the twin") {
    import spark.implicits._
    // singleton community 3 with no intra edges: num = -d^2*1000 < 0
    val edges = Seq((1L,2L,1L),(2L,3L,1L)).toDF("s","t","w")
    val labels = Seq((1L,1L),(2L,1L),(3L,3L)).toDF("node","label")
    val out = Graph.modularity(edges, "s", "t", "w", labels)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    // community 3: (0 - 1)*1000 // 16 = floor(-62.5) = -63 (not -62)
    assert(out(3L) === -63L)
  }


  test("assortativity: star is perfectly disassortative, cycle is degenerate") {
    import spark.implicits._
    // star: every edge joins the deg-4 hub to a deg-1 leaf -> r = -1
    val star = (1L to 4L).map(i => (0L, i)).toDF("s", "t")
    val rs = Graph.assortativity(star, "s", "t")
      .as[(Long, Long, Double)].head()
    assert(rs === ((8L, 4L, -1.0)))
    // cycle: all degrees equal -> den = 0 -> r reported as 0
    val cyc = Seq((1L,2L),(2L,3L),(3L,1L)).toDF("s", "t")
    val rc = Graph.assortativity(cyc, "s", "t")
      .as[(Long, Long, Double)].head()
    assert(rc === ((6L, 3L, 0.0)))
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
