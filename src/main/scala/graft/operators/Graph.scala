package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists (the near-dup component finder lives
  * in [[Dedup.nearDupGroups]]; this file holds the value-propagation
  * family). */
object Graph {

  /** FIXED-POINT PAGERANK, bit-exact by construction: a fixed number of
    * damped propagation rounds over a weighted edge list, computed
    * entirely in SCALED-INTEGER (fixed-point, 10^12) arithmetic —
    * integer sums are associative, so the result is independent of
    * partitioning, shuffle order, and engine: no IEEE-summation
    * nondeterminism to paper over, which is what makes the query
    * hash-exact against a SQL twin with zero floating-point caveats.
    *
    * Semantics per round (damping d = dampingPermille/1000, n nodes):
    *   share_u   = rank_u div out_u              (integer floor div)
    *   contrib_v = Σ_{u→v} share_u · w_uv        (exact: ≤ rank_u each)
    *   rank'_v   = (1000−d')·SCALE div (1000·n) + d'·contrib_v div 1000
    * Dangling-node mass decays (the standard simplification); ranks are
    * reported both as the exact fixed-point integer and as rank_fp/10^12
    * in double (one exactly-rounded IEEE divide).
    *
    * Overflow-safe at ANY scale: share_u·w_uv ≤ rank_u (because
    * w_uv ≤ out_u), so every per-node sum is bounded by the total mass
    * SCALE = 10^12 ≪ 2^63.
    *
    * Plan: out-degrees are one map-side-combined agg; each round is one
    * join of the rank table (|nodes| rows) to the edge list on src + one
    * groupBy dst — both shuffle on the node key and AQE broadcasts the
    * rank side when it measures small (event-type graphs: tens of
    * nodes; web graphs: co-partitioned shuffle joins, the canonical
    * Pregel shape). `iterations` is a FIXED unrolled count — the plan
    * depth is known at submit time, no driver-side convergence loop. */
  /** TRIANGLE COUNT + LOCAL CLUSTERING COEFFICIENT per node. Edges are
    * first CANONICALIZED (undirected, deduped, self-loops dropped,
    * src < dst) — the standard orientation trick: each triangle
    * {a<b<c} is found exactly once as (a,b)⋈(b,c)⋈(a,c), so the join
    * volume is bounded by Σ deg²(ordered), not deg³. Per-node triangle
    * membership re-projects each found triangle to its three corners
    * (a union, map-side); the coefficient 2·t/(d·(d−1)) is one IEEE
    * divide of exact integers. Plan: two self-joins + one agg, all on
    * node keys — the canonical distributed triangle shape; nodes with
    * degree < 2 report coefficient 0 (no possible triangle).
    * Output: (node, degree, n_tri, clustering). */
  def triangles(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val raw = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
    val e = raw.select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(true) // reused by 3 joins + the degree agg
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.v") === col("bc.u"))
      .join(e.as("ac"),
        col("ac.u") === col("ab.u") && col("ac.v") === col("bc.v"))
      .select(col("ab.u").as("a"), col("ab.v").as("b"), col("bc.v").as("c"))
    val perNode = tri.select(col("a").as("node"))
      .union(tri.select(col("b").as("node")))
      .union(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("degree") < 2, lit(0.0)).otherwise(
          (lit(2) * coalesce(col("n_tri"), lit(0L))).cast("double")
            / (col("degree") * (col("degree") - 1)).cast("double"))
          .as("clustering"))
      .orderBy(col("node"))
  }

  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int = 3,
      dampingPermille: Int = 850): DataFrame = {
    require(iterations >= 1 && iterations <= 8, "iterations in [1,8]")
    val Scale = 1000000000000L // 10^12
    // Spark does not share common subplans: the multi-referenced frames
    // (edge list, node list) would be re-derived per round without
    // materialization, growing the plan tree ×iterations. localCheckpoint
    // (the nearDupGroups discipline, Dedup.scala) truncates them ONCE,
    // up front — the rank chain itself stays lazy (see the loop note).
    // pre-partitioned on src — the per-round contribution join's key —
    // so each round shuffles only the node-sized rank table, never the
    // edge stream (the checkpoint preserves the hash partitioning)
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("long").as("w"))
      .repartition(col("src")).localCheckpoint(true)
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    // n as a 1-row broadcast literal table, never a driver collect
    val nRow = nodes.agg(count(lit(1)).as("__n"))
    // out-degree FOLDED into the checkpointed edge list (one window over
    // the already-src-partitioned rows, no extra shuffle): each round is
    // then ONE join instead of two
    val e = e0.withColumn("out_w",
        sum(col("w")).over(Window.partitionBy(col("src"))))
      .localCheckpoint(true)
    // the rank loop is LINEAR (each round reads the previous rank table
    // exactly once, and the post-loop projection reads it once), so no
    // per-round materialization is needed: the only multi-referenced
    // frames are nodes/e, which checkpoint above. Dropping the per-round
    // barrier turns iterations+1 blocking jobs into one final action.
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), expr(s"${Scale}L div __n").as("rank_fp"))
    for (_ <- 1 to iterations) {
      // join by OUTPUT name, not dataset-tagged refs: round 2+ ranks'
      // lineage contains e, so ranks("node")/e("src") would lean on
      // self-join attribute disambiguation; the output names are unique
      // across the two sides (node/rank_fp vs src/dst/w/out_w)
      val contribs = ranks.join(e, col("node") === col("src"))
        .select(col("dst").as("node"),
          (expr("rank_fp div out_w") * col("w")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      ranks = nodes.crossJoin(broadcast(nRow))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (expr(s"(${1000 - dampingPermille}L * ${Scale}L) div (1000L * __n)")
            + expr(s"(${dampingPermille}L * coalesce(contrib, 0L)) div 1000L"))
            .as("rank_fp"))
    }
    ranks
      .select(col("node"), col("rank_fp"),
        (col("rank_fp").cast("double") / lit(Scale.toDouble)).as("rank"))
      .orderBy(col("node"))
  }

  /** PERSONALIZED PAGERANK (random walk with restart to a SEED set —
    * the recommendation / relevance-propagation variant): identical
    * fixed-point integer scheme to [[pageRankFixedPoint]], except the
    * teleport mass goes uniformly to the seeds only (zero elsewhere)
    * and the walk starts there:
    *   r₀(v)   = Scale div |S| · [v ∈ S]
    *   r'(v)   = [v ∈ S]·(1000−d)·Scale div (1000·|S|)
    *             + d·Σ_contribs div 1000.
    * All arithmetic is non-negative scaled-int div — associative sums,
    * no IEEE nondeterminism, replayable as chained SQL. Dangling mass
    * leaks (as in the base variant) — rankings, not probabilities.
    *
    * Scale shape: seeds resolve via one semi-join; the flagged node
    * table and pre-partitioned edge list checkpoint ONCE; each round
    * shuffles only the node-sized rank table. */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, seeds: DataFrame,
      seedCol: String, iterations: Int = 3,
      dampingPermille: Int = 850): DataFrame = {
    require(iterations >= 1 && iterations <= 8, "iterations in [1,8]")
    val Scale = 1000000000000L // 10^12
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("long").as("w"))
      .repartition(col("src")).localCheckpoint(true)
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
    val flagged = nodes
      .join(seeds.select(col(seedCol).as("node")).distinct()
        .withColumn("__seed", lit(1L)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(0L)).as("__seed"))
      .localCheckpoint(true)
    val sRow = flagged.agg(sum(col("__seed")).as("__s"))
    // out-degree folded into the checkpointed edge list (window over the
    // already-src-partitioned rows): one join per round instead of two
    val e = e0.withColumn("out_w",
        sum(col("w")).over(Window.partitionBy(col("src"))))
      .localCheckpoint(true)
    // LINEAR rank chain (the pageRankFixedPoint argument): flagged/e
    // are the multi-referenced frames and checkpoint above; the rank
    // table itself is read once per round and once after, so the loop
    // carries no per-round barrier.
    var ranks = flagged.crossJoin(broadcast(sRow))
      .select(col("node"),
        when(col("__seed") === 1L, expr(s"${Scale}L div __s"))
          .otherwise(0L).as("rank_fp"))
    for (_ <- 1 to iterations) {
      // name-based join condition — same rationale as the base variant
      val contribs = ranks.join(e, col("node") === col("src"))
        .select(col("dst").as("node"),
          (expr("rank_fp div out_w") * col("w")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      ranks = flagged.crossJoin(broadcast(sRow))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (when(col("__seed") === 1L,
            expr(s"(${1000 - dampingPermille}L * ${Scale}L)" +
              " div (1000L * __s)")).otherwise(0L)
            + expr(s"(${dampingPermille}L * coalesce(contrib, 0L))" +
              " div 1000L"))
            .as("rank_fp"))
    }
    ranks
      .select(col("node"), col("rank_fp"),
        (col("rank_fp").cast("double") / lit(Scale.toDouble)).as("rank"))
      .orderBy(col("node"))
  }

  /** SYNCHRONOUS LABEL PROPAGATION community detection (Raghavan et al.
    * 2007) over a weighted undirected edge list, fully deterministic:
    * labels start as node ids; each of the FIXED `iters` rounds every
    * node adopts the label with the greatest incident edge weight among
    * its neighbors' current labels, ties to the SMALLEST label — no RNG,
    * no asynchronous order-dependence, so the trajectory is replayable
    * as chained SQL. (Synchronous LPA can oscillate on bipartite-ish
    * structures; a fixed round count makes even that deterministic —
    * the connected-components family in [[Dedup]] is the convergence-
    * guaranteed alternative when labels must be transitive closures.)
    *
    * Plan per round: one join of the |nodes|-row label table to the
    * symmetrized neighbor list on the neighbor key + one (node, label)
    * weight agg + one per-node argmax — all node-keyed shuffles, AQE
    * broadcasts the label side when small. localCheckpoint truncates
    * the unrolled lineage (the [[pageRankFixedPoint]] discipline).
    * Output: (community, n_nodes, min_node), community-ascending. */
  /** K-CORE PEELING (fixed rounds): repeatedly drop nodes of degree < k
    * from the canonicalized undirected graph, then report the surviving
    * nodes with their within-core degree. Peeling is MONOTONE (the edge
    * set only shrinks), so a fixed `rounds` count is deterministic and
    * replayable as chained SQL — once converged, further rounds are
    * no-ops; unconverged output is still well-defined as "the degree-≥k
    * nodes of the round-R edge set", identical in both engines.
    *
    * Plan per round: one degree agg over the surviving edges (map-side
    * combined) + two semi-joins of the edge list against the ≥k node
    * set (AQE broadcasts it — the survivor table is |nodes|-bounded and
    * shrinks every round). localCheckpoint truncates the unrolled
    * lineage (the [[pageRankFixedPoint]] discipline). At 100 TB the
    * edge list shuffles once per round on the node key — the canonical
    * distributed peeling shape; no driver-side convergence loop.
    * Output: (node, degree) of the round-R k-core, node-ascending. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int = 3): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 8, "k>=1, rounds in [1,8]")
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    def degrees(ed: DataFrame): DataFrame =
      ed.select(col("u").as("node"))
        .union(ed.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("degree") >= k)
        .select(col("node"))
      e = e.join(keep.withColumnRenamed("node", "u"), Seq("u"), "semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
    }
    degrees(e).filter(col("degree") >= k)
      .select(col("node"), col("degree"))
      .orderBy(col("node"))
  }

  /** MULTI-SOURCE BFS over the canonicalized undirected graph: hop
    * distance from the nearest seed, as `rounds` synchronous frontier
    * relaxations — dist'(v) = min(dist(v), min_{u∈N(v)} dist(u)+1).
    * Min-relaxation is MONOTONE (distances only decrease), so a fixed
    * round count is deterministic and prefix-exact: every reported
    * distance ≤ rounds is the true BFS distance; nodes further than
    * `rounds` hops are simply absent (the twin replays the same
    * truncation). Per round: one node-keyed join of the |reached|-row
    * distance table to the symmetrized adjacency + one min agg —
    * the Pregel shape, lineage checkpoint-truncated. Output:
    * (node, dist), node-ascending, seeds at dist 0. */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 8, "rounds in [1,8]")
    // NO edge dedup: min-relaxation is idempotent over duplicate edges,
    // so paying a full-edge-stream shuffle to distinct them buys nothing
    // — duplicates only ride the (map-side-combined) relax aggs
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
    // pre-partitioned on the relax join key (see labelPropagationAssign):
    // each round shuffles only the distance table, not the edge stream
    val nbr = e.select(col("u").as("node"), col("v").as("nbr"))
      .union(e.select(col("v").as("node"), col("u").as("nbr")))
      .repartition(col("node"))
      .localCheckpoint(true)
    // seed set ∩ graph nodes (an isolated seed has no edges to relax)
    var dist = nbr.select(col("node")).distinct()
      .join(seeds.select(col(seedCol).as("node")).distinct(), Seq("node"),
        "semi")
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(nbr, Seq("node"))
        .select(col("nbr").as("node"), (col("dist") + 1L).as("dist"))
      dist = dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist.orderBy(col("node"))
  }

  /** DETERMINISTIC RANDOM-WALK CORPUS (the DeepWalk/node2vec front end):
    * one `steps`-step walk per seed over the canonicalized undirected
    * graph, with the next hop DERIVED rather than sampled — at walk `w`,
    * step `t`, the neighbor `v` minimizing `md5("w_t_v")` wins (ties by
    * `v`; md5 of the same UTF-8 digits is byte-identical in any engine,
    * the [[Dsir.bucketOf]] portability argument). Derived randomness
    * makes the walk corpus REPRODUCIBLE and shard-independent — the
    * property a training pipeline needs when walks feed an embedding
    * trainer and must be regenerable bit-exact (same reason the sampling
    * family derives from md5 thresholds, not RNG state).
    *
    * Plan per step: one join of the |walks|-row frontier to the
    * pre-partitioned adjacency (the [[bfsDistances]] discipline: rounds
    * shuffle only the frontier, never the edge stream) + one per-walk
    * argmin window over the frontier×degree candidate rows. Walks may
    * revisit nodes (standard DeepWalk semantics — no visited-set state).
    * Output: (walk_id, step, node), steps 0..`steps`, walk/step asc. */
  def randomWalks(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, steps: Int = 3): DataFrame = {
    require(steps >= 1 && steps <= 8, "steps in [1,8]")
    import org.apache.spark.sql.expressions.Window
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val nbr = e.select(col("u").as("node"), col("v").as("nbr"))
      .union(e.select(col("v").as("node"), col("u").as("nbr")))
      .repartition(col("node"))
      .localCheckpoint(true)
    // seeds ∩ graph nodes: an isolated seed has nowhere to walk
    var cur = nbr.select(col("node")).distinct()
      .join(seeds.select(col(seedCol).as("node")).distinct(), Seq("node"),
        "semi")
      .select(col("node").as("walk_id"), col("node"))
      .localCheckpoint(true)
    var out = cur.select(col("walk_id"), lit(0L).as("step"), col("node"))
    for (t <- 1 to steps) {
      val w = Window.partitionBy(col("walk_id"))
        .orderBy(col("h"), col("nbr"))
      cur = cur.join(nbr, Seq("node"))
        .withColumn("h", md5(concat(col("walk_id").cast("string"),
          lit("_"), lit(t.toLong).cast("string"), lit("_"),
          col("nbr").cast("string"))))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("walk_id"), col("nbr").as("node"))
        .localCheckpoint(true)
      out = out.union(
        cur.select(col("walk_id"), lit(t.toLong).as("step"), col("node")))
    }
    out.orderBy(col("walk_id"), col("step"))
  }

  /** WEIGHTED MULTI-SOURCE SHORTEST PATHS (synchronous Bellman–Ford)
    * over the canonicalized undirected weighted graph: cheapest-path
    * cost from the nearest seed under INTEGER edge weights, as `rounds`
    * frontier relaxations — dist'(v) = min(dist(v),
    * min_{(u,v)} dist(u) + w(u,v)). Min-relaxation is MONOTONE, so the
    * fixed round count is deterministic and the output is the exact
    * ≤`rounds`-EDGE cheapest cost (Bellman–Ford's standard prefix
    * guarantee: round k finishes every path of ≤ k edges; the twin
    * replays the same truncation). Unlike [[bfsDistances]], parallel
    * edges are NOT free to keep: they're collapsed to the per-pair MIN
    * weight up front (one edge-keyed agg) so each round relaxes one
    * candidate per neighbor, not one per duplicate.
    *
    * Plan: the [[bfsDistances]] Pregel shape — weighted adjacency
    * pre-partitioned on the relax key behind a checkpoint (rounds
    * shuffle only the |reached|-row distance table), one join + one
    * min agg per round. Output: (node, dist), node-ascending, seeds at
    * dist 0. */
  def weightedSssp(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, seeds: DataFrame, seedCol: String,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 8, "rounds in [1,8]")
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"),
        col(wCol).cast("long").as("w"))
      .filter(col("u") =!= col("v"))
      .groupBy(col("u"), col("v")).agg(min(col("w")).as("w"))
    val nbr = e.select(col("u").as("node"), col("v").as("nbr"), col("w"))
      .union(e.select(col("v").as("node"), col("u").as("nbr"), col("w")))
      .repartition(col("node"))
      .localCheckpoint(true)
    var dist = nbr.select(col("node")).distinct()
      .join(seeds.select(col(seedCol).as("node")).distinct(), Seq("node"),
        "semi")
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(nbr, Seq("node"))
        .select(col("nbr").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist.orderBy(col("node"))
  }

  /** ADAMIC–ADAR LINK PREDICTION over the canonicalized undirected
    * graph: for each NON-ADJACENT pair (u < v) sharing at least one
    * neighbor, score = Σ_{w ∈ N(u)∩N(v)} 1/log₂ deg(w) — computed in
    * exact fixed point as `64_000_000 div lg64(deg_w)` (deg_w ≥ 2
    * always: w has both u and v as neighbors, so lg64 ≥ 64 and the
    * divide is safe), making the ranking hash-exact cross-engine with
    * zero libm involvement ([[NaiveBayes.lg64]]).
    *
    * `maxDeg` drops HUB intermediaries (deg(w) > maxDeg) before pair
    * generation — the standard practical bound: candidate volume is
    * Σ deg(w)², so one celebrity node would dominate both cost and
    * (vanishing, 1/log deg) signal; capping bounds the fan-out per
    * intermediary at maxDeg² independent of corpus size.
    *
    * Plan: adjacency self-join keyed on the intermediary w (one
    * shuffle), degree table joined broadcast-small, candidate agg on
    * (u,v), then one anti-join against the edge list to keep predicted
    * (absent) links only. Top-n bounded output via
    * TakeOrderedAndProject. Output: (u, v, n_common, aa_x1e6). */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
      maxDeg: Int = 64, topN: Int = 50): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true) // adjacency, degrees, and the anti-join reuse it
    val adj = e.select(col("u").as("node"), col("v").as("nbr"))
      .union(e.select(col("v").as("node"), col("u").as("nbr")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val mid = adj.join(deg, Seq("node"))
      .filter(col("degree") >= 2 && col("degree") <= maxDeg)
      .withColumn("lg", NaiveBayes.lg64(col("degree")))
      .withColumn("w_fp", expr("64000000L div lg")) // exact integer div
    val cand = mid.as("a")
      .join(mid.as("b"),
        col("a.node") === col("b.node") && col("a.nbr") < col("b.nbr"))
      .select(col("a.nbr").as("u"), col("b.nbr").as("v"),
        col("a.w_fp").as("w_fp"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"), sum(col("w_fp")).as("aa_x1e6"))
    cand.join(e, Seq("u", "v"), "anti")
      .orderBy(col("aa_x1e6").desc, col("u"), col("v"))
      .limit(topN)
  }

  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int = 3): DataFrame =
    labelPropagationAssign(edges, srcCol, dstCol, weightCol, iters)
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"), min(col("node")).as("min_node"))
      .orderBy(col("community"))

  /** (u < v, w) weighted canonical edge view. `assumeCanonical` skips
    * the re-aggregation shuffle when the caller already built the edge
    * list canonical (src < dst, one row per pair, summed weight) — the
    * co-purchase query family does; a general caller pays the groupBy
    * once for safety. */
  private def canonicalWeighted(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String,
      assumeCanonical: Boolean): DataFrame =
    if (assumeCanonical)
      edges.select(col(srcCol).as("u"), col(dstCol).as("v"),
        col(weightCol).cast("long").as("w"))
    else edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"),
        col(weightCol).cast("long").as("w"))
      .filter(col("u") =!= col("v"))
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))

  /** Per-node label assignment after `iters` synchronous LPA rounds —
    * the raw (node, label) view [[labelPropagation]] summarizes and
    * [[modularity]] evaluates. */
  def labelPropagationAssign(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, iters: Int = 3,
      assumeCanonical: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 8, "iters in [1,8]")
    val e = canonicalWeighted(edges, srcCol, dstCol, weightCol,
      assumeCanonical)
    // pre-partition on the per-round join key: the checkpoint preserves
    // the hash partitioning, so each LPA round shuffles only the small
    // label table, never the full symmetrized edge stream (iters x full
    // edge shuffle saved — the dominant cost of the round loop)
    val nbr = e.select(col("u").as("node"), col("v").as("nbr"), col("w"))
      .union(e.select(col("v").as("node"), col("u").as("nbr"), col("w")))
      .repartition(col("nbr"))
      .localCheckpoint(true)
    var labels = nbr.select(col("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    // the label chain is linear, so the per-round checkpoint is not a
    // dedup necessity (unlike the bfs/sssp diamonds) — but it is a
    // measured WIN here, unlike the pageRank family: the per-round
    // (node,label) weight agg is the expensive stage, and feeding it a
    // materialized, size-known label table keeps every round's join
    // broadcast-planned (measured at sf0.1: 6.3 s with per-round
    // checkpoints vs 9.1 s without; pageRank's contribution join keys
    // on the PRE-PARTITIONED edge side instead and measured the
    // opposite, so it dropped its per-round barrier).
    for (_ <- 1 to iters) {
      val scores = nbr
        .join(labels.withColumnRenamed("node", "nbr"), Seq("nbr"))
        .groupBy(col("node"), col("label")).agg(sum(col("w")).as("s"))
      labels = scores.groupBy(col("node"))
        .agg(min_by(col("label"),
          struct((-col("s")).as("a"), col("label").as("b"))).as("label"))
        .localCheckpoint(true)
    }
    labels
  }

  /** DEGREE ASSORTATIVITY (Newman 2002): Pearson correlation of the
    * degrees at the two ends of every edge — positive: hubs attach to
    * hubs (social-ish), negative: hubs attach to leaves (hub-and-spoke).
    * Each undirected edge contributes both orientations, so with
    * S1 = Σ(dᵤ+dᵥ), S2 = Σ(dᵤ²+dᵥ²), Sxy = 2·Σ dᵤdᵥ over edges and
    * n = 2m points:  r = (n·Sxy − S1²) / (n·S2 − S1²) — the symmetry
    * collapses the two √ terms into one denominator, leaving ONE IEEE
    * divide of exact integers. Sums ride DECIMAL(38,0) (n·Sxy
    * overflows int64 on million-edge graphs); the twin mirrors with
    * HUGEINT. den = 0 (regular graph) reports r = 0.
    *
    * Plan: degree agg + two degree lookups on the edge list (bounded
    * |nodes|-row side, AQE-broadcast) + one scalar agg. Output 1 row:
    * (n_points, m_edges, r). */
  def assortativity(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val j = e
      .join(deg.select(col("node").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("d").as("dv")), Seq("v"))
      .select(col("du").cast(dec).as("du"), col("dv").cast(dec).as("dv"))
    j.agg(count(lit(1)).cast(dec).as("m"),
        sum(col("du") + col("dv")).as("s1"),
        sum(col("du") * col("du") + col("dv") * col("dv")).as("s2"),
        sum(col("du") * col("dv")).as("sxy_half"))
      .select(
        (lit(2L).cast(dec) * col("m")).as("n"),
        col("m"), col("s1"), col("s2"),
        (lit(2L).cast(dec) * col("sxy_half")).as("sxy"))
      .select(
        col("n").cast("long").as("n_points"),
        col("m").cast("long").as("m_edges"),
        ((col("n") * col("sxy") - col("s1") * col("s1")).cast("double") /
          when((col("n") * col("s2") - col("s1") * col("s1")) === 0,
            lit(null)).otherwise(
            (col("n") * col("s2") - col("s1") * col("s1"))
              .cast("double"))).as("r0"))
      .select(col("n_points"), col("m_edges"),
        coalesce(col("r0"), lit(0.0)).as("r"))
  }

  /** NEWMAN MODULARITY of a node→community assignment over the weighted
    * undirected graph, per community and in exact per-mille fixed
    * point:  contrib_c = (4m·intra_c − d_c²)·1000 div (4m²), where m =
    * total edge weight, intra_c = weight with both endpoints in c, d_c
    * = Σ weighted degree in c — Q = Σ_c contrib_c/1000 is the standard
    * Σ_c [intra_c/m − (d_c/2m)²]. ×1000 (not ×10⁶) keeps 4m·intra
    * under int64 for m up to ~10⁹ weight units. The clustering-quality
    * gate for LPA the way silhouette gates k-means.
    *
    * Plan: canonical edge agg, two broadcast-joined label lookups on
    * the edge list (label table is |nodes| rows — AQE broadcasts when
    * small, co-partitioned shuffle joins otherwise), one community agg,
    * plus the 1-row total m riding a broadcast cross join. Output:
    * (community, n_nodes, intra_w, d_c, contrib_x1000). */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, labels: DataFrame,
      assumeCanonical: Boolean = false): DataFrame = {
    val e = canonicalWeighted(edges, srcCol, dstCol, weightCol,
      assumeCanonical)
      .localCheckpoint(true) // total m, intra, and degrees reuse it
    val lab = labels.select(col("node"), col("label"))
    val mTot = e.agg(sum(col("w")).as("m"))
    val lbl = e
      .join(lab.select(col("node").as("u"), col("label").as("lu")), Seq("u"))
      .join(lab.select(col("node").as("v"), col("label").as("lv")), Seq("v"))
    val intra = lbl.filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("community")).agg(sum(col("w")).as("intra_w"))
    val deg = e.select(col("u").as("node"), col("w"))
      .union(e.select(col("v").as("node"), col("w")))
      .groupBy(col("node")).agg(sum(col("w")).as("d"))
    val dc = deg.join(lab, Seq("node"))
      .groupBy(col("label").as("community"))
      .agg(sum(col("d")).as("d_c"), count(lit(1)).as("n_nodes"))
    dc.join(intra, Seq("community"), "left")
      .withColumn("intra_w", coalesce(col("intra_w"), lit(0L)))
      .crossJoin(broadcast(mTot))
      // contrib is NEGATIVE for hub-heavy communities — truncating
      // `div` would round toward zero while DuckDB's `//` floors, so
      // use the sign-safe floor division (the kMeans centroid idiom)
      .withColumn("num", (lit(4L) * col("m") * col("intra_w")
        - col("d_c") * col("d_c")) * 1000L)
      .withColumn("den", lit(4L) * col("m") * col("m"))
      .select(col("community"), col("n_nodes"), col("intra_w"), col("d_c"),
        expr("(num - ((num % den) + den) % den) div den")
          .as("contrib_x1000"))
      .orderBy(col("community"))
  }
}
