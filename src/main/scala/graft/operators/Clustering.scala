package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed LLOYD'S k-MEANS over an embedding column, integer-exact —
  * the corpus-clustering substrate of training-data curation (SemDeDup /
  * cluster-balanced sampling lineage), generalizing the reference's
  * "group similar entities" intent (the fuzzy mapping cascade clusters
  * team-name variants; here the same engine clusters vector columns).
  *
  * Determinism (the [[Coreset]] discipline): coordinates quantize ONCE
  * to integer micros (⌊x·10⁶⌋); every distance is an INTEGER squared
  * L2; assignment ties break on the smallest cluster label; centroid
  * updates are exact integer floor-means (`Math.floorDiv` of an exact
  * long sum — mirrored in SQL as `(s - ((s%n)+n)%n)/n`, the sign-safe
  * floor division both engines evaluate identically). The whole
  * trajectory — seeding at the k smallest ids, `iters` update rounds,
  * final assignment — is therefore bit-replayable by the unrolled
  * DuckDB twin ([[sqlKMeans]]). A cluster that loses all members drops
  * out (no re-seeding — both engines agree by construction).
  *
  * Scale shape: per round, assignment is a MAP over the corpus against
  * k·dim plan-literal longs (no join, no shuffle of vectors), and the
  * update is one posexplode → groupBy(cluster, dim) whose map-side
  * partials bound the exchange at partitions × k·dim rows; the k·dim
  * collect per round is the bounded-model-artifact posture (IVF/BPE).
  * The corpus itself is never shuffled and never collected. At 100 TB:
  * iters corpus scans, each a codegen'd map + tiny agg — the minimal
  * plan for exact Lloyd iterations.
  */
object Clustering {

  private[operators] def quantize(vecCol: Column): Column =
    transform(vecCol, x => floor(x.cast(DoubleType) * lit(1000000))
      .cast(LongType))

  private def sqDist(qv: Column, center: Seq[Long]): Column =
    aggregate(
      zip_with(qv, typedLit(center), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Argmin over labeled centers as one codegen'd expression:
    * `array_min` of (dist, label) structs — lexicographic struct order
    * gives min-distance with smallest-label ties. */
  private def assignStruct(qv: Column, centers: Seq[(Int, Seq[Long])])
      : Column =
    array_min(array(centers.map { case (lbl, v) =>
      struct(sqDist(qv, v).as("d"), lit(lbl).as("cl"))
    }: _*))

  /** TRAIN: `iters` exact Lloyd rounds from the k smallest-id seeds.
    * Returns surviving (label, centroid) pairs, label-ascending.
    * Driver state: k·dim longs — never the corpus. */
  def train(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): Seq[(Int, Seq[Long])] = {
    val q = df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .cache()
    try {
      val dim = q.head().getSeq[Long](1).size
      var centers: Seq[(Int, Seq[Long])] = q.orderBy(col("id")).limit(k)
        .collect().zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Long](1)) }
      for (_ <- 1 to iters) {
        val sums = q
          .withColumn("cl", assignStruct(col("qv"), centers)("cl"))
          .select(col("cl"), posexplode(col("qv")).as(Seq("pos", "v")))
          .groupBy(col("cl"), col("pos"))
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .collect()
        centers = sums.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
          .map { case (lbl, rows) =>
            val byPos = rows.map(r =>
              (r.getInt(1), Math.floorDiv(r.getLong(2), r.getLong(3))))
              .sortBy(_._1).map(_._2).toSeq
            require(byPos.size == dim, s"cluster $lbl lost dimensions")
            (lbl, byPos)
          }
      }
      centers
    } finally q.unpersist()
  }

  /** Final per-cluster summary after [[train]]: (cluster, n, inertia,
    * c_sum) where inertia = Σ integer sqdist to the final centroid and
    * c_sum = Σ centroid components (a replayable centroid checksum). */
  def kMeansSummary(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): DataFrame = {
    val centers = train(df, idCol, vecCol, k, iters)
    val spark = df.sparkSession
    import spark.implicits._
    val csums = centers.map { case (lbl, v) => (lbl, v.sum) }
      .toDF("cluster", "c_sum")
    df.select(quantize(col(vecCol)).as("qv"))
      .withColumn("a", assignStruct(col("qv"), centers))
      .select(col("a")("cl").as("cluster"), col("a")("d").as("dist"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("dist")).as("inertia"))
      .join(broadcast(csums), Seq("cluster"))
      .select(col("cluster").cast(LongType), col("n"), col("inertia"),
        col("c_sum"))
      .orderBy(col("cluster"))
  }

  /** SIMPLIFIED (centroid-based) SILHOUETTE per cluster after [[train]]:
    * for each point, a = sqdist to its own (nearest) centroid, b =
    * sqdist to the runner-up centroid; s = (b−a)/max(a,b) ∈ [0,1] here
    * (b ≥ a by construction of the argmin), reported in integer
    * per-mille — `((b−a)·1000) div max(a,b)` — so the gate is
    * hash-exact with zero IEEE involvement. ×1000 (not ×10⁶) keeps the
    * product under int64: dists are ≤ dim·(2·10⁶)² ≈ 2.6·10¹⁴ for
    * unit-range 64-dim embeddings, ×10³ ≈ 2.6·10¹⁷ < 2⁶³.
    *
    * The centroid-based simplification (Hruschka et al.) is the one
    * that SCALES: full silhouette is all-pairs within+across clusters
    * (corpus²); this is one corpus MAP against k·dim plan literals —
    * both distances come from the same sorted (dist, label) array, no
    * second pass, no join, no shuffle of vectors. Output per cluster:
    * (cluster, n, mean_s_x1000, min_s_x1000, max_s_x1000). */
  def silhouetteSummary(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val centers = train(df, idCol, vecCol, k, iters)
    require(centers.size >= 2, "silhouette needs >= 2 surviving clusters")
    val sorted = array_sort(array(centers.map { case (lbl, v) =>
      struct(sqDist(col("qv"), v).as("d"), lit(lbl).as("cl")) }: _*))
    df.select(quantize(col(vecCol)).as("qv"))
      .withColumn("arr", sorted)
      .select(element_at(col("arr"), 1)("cl").as("cluster"),
        element_at(col("arr"), 1)("d").as("da"),
        element_at(col("arr"), 2)("d").as("db"))
      .withColumn("s", when(greatest(col("da"), col("db")) === 0, lit(0L))
        .otherwise(expr("((db - da) * 1000L) div greatest(da, db)")))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("sum_s"),
        min(col("s")).as("min_s_x1000"), max(col("s")).as("max_s_x1000"))
      .withColumn("mean_s_x1000", expr("sum_s div n"))
      .select(col("cluster").cast(LongType), col("n"),
        col("mean_s_x1000"), col("min_s_x1000"), col("max_s_x1000"))
      .orderBy(col("cluster"))
  }

  /** SEMDEDUP: centroid-blocked embedding near-dup pairs (Abbas et al.
    * 2023's semantic-dedup shape): cluster the corpus with [[train]],
    * then compare ONLY within-cluster pairs with the engine's exact
    * decimal cosine — the cluster structure bounds the pairwise stage
    * at Σ|cluster|², the method's premise. Complements the LSH-blocked
    * [[Ann]] near-dup (q_embedding_neardup): k-means blocking recalls
    * pairs that straddle hyperplane buckets.
    *
    * Plan: assignment is a map (k·dim literals), the pair join shuffles
    * ids+vectors once on the cluster key, and the double-precision
    * prescreen (margin ≫ fold error) gates the exact decimal cosine.
    * The emitted similarity witness is the INTEGER dot of the
    * micro-quantized vectors (a raw double cosine is filter-safe but
    * not output-safe: decimal rounding of per-element products can
    * differ at the 18th digit cross-engine).
    * Output: (cluster, id_a, id_b, qdot). */
  def semDedup(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, tau: Double, prescreenMargin: Double = 0.001)
      : DataFrame = {
    val centers = train(df, idCol, vecCol, k, iters)
    val assigned = df
      .withColumn("qv", quantize(col(vecCol)))
      .withColumn("cluster", assignStruct(col("qv"), centers)("cl"))
      .select(col("cluster"), col(idCol).as("id"), col(vecCol).as("v"),
        col("qv"))
    val a = assigned.select(col("cluster"), col("id").as("id_a"),
      col("v").as("v_a"), col("qv").as("q_a"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"),
      col("v").as("v_b"), col("qv").as("q_b"))
    a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
      .filter(Ann.cosineFast(col("v_a"), col("v_b")) >
        tau - prescreenMargin)
      .filter(Ann.cosine(col("v_a"), col("v_b")) > tau)
      .withColumn("qdot", aggregate(
        zip_with(col("q_a"), col("q_b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x))
      .select(col("cluster").cast(LongType), col("id_a"), col("id_b"),
        col("qdot"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** CLUSTER TOPIC TERMS (c-TF-IDF, BERTopic's labeling shape): after
    * clustering the embedding space with [[train]], label each cluster
    * with its top-`topN` terms by `ct · K / cdf` — term count within
    * the cluster, discounted by how many of the K clusters carry the
    * term (the class-based idf; the log around it is monotone for a
    * fixed corpus, so ranking by the rational is ranking by c-TF-IDF,
    * and the score is ONE IEEE divide of exact integers — the
    * collocations discipline). This is how a curation pipeline makes
    * k-means clusters HUMAN-READABLE (inspect/drop topics).
    *
    * Plan: assignment is the k·dim-literal map; one token explode
    * joined to the |docs|-row assignment; (cluster, term) counts with
    * map-side combine; cdf derived FROM the count table (never a
    * second corpus pass); per-cluster top-N via window. */
  def clusterTerms(emb: DataFrame, embId: String, vecCol: String,
      docs: DataFrame, docId: String, textCol: String, k: Int,
      iters: Int, topN: Int): DataFrame = {
    val centers = train(emb, embId, vecCol, k, iters)
    val assigned = emb
      .withColumn("cluster",
        assignStruct(quantize(col(vecCol)), centers)("cl"))
      .select(col(embId).as("doc_id"), col("cluster"))
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => t =!= lit(""))
    val inst = docs.select(col(docId).as("doc_id"),
        explode(toks).as("term"))
      .join(assigned, Seq("doc_id"))
    val ct = inst.groupBy(col("cluster"), col("term"))
      .agg(count(lit(1)).as("ct"))
    val cdf = ct.groupBy(col("term")).agg(count(lit(1)).as("cdf"))
    val scored = ct.join(cdf, Seq("term"))
      .withColumn("score",
        (col("ct") * lit(centers.size.toLong)).cast("double") /
          col("cdf").cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(desc("score"), asc("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .select(col("cluster").cast(LongType), col("rank"), col("term"),
        col("ct"), col("cdf"), col("score"))
      .orderBy(col("cluster"), col("rank"))
  }

  private def sqlDist(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), " +
      s"p -> (p[1]-p[2])*(p[1]-p[2])))"

  /** DuckDB twin of the engine's exact decimal cosine ([[Ann.cosine]]):
    * order-independent decimal dot, then IEEE sqrt/divide — identical
    * bits cross-engine for identical inputs. */
  def sqlCosine(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"""CAST(list_sum(list_transform(list_zip($x, $y),
         p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)
           AS DECIMAL(28,18)))) AS DOUBLE)"""
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** Shared CTE chain replaying [[train]]'s trajectory over `srcSql`
    * (a SELECT yielding (id, embedding)). Emits CTEs `src`, `q`,
    * `c0..c$iters`, `a1..a$iters` and a FINAL assignment `af` against
    * `c$iters`. Caller appends the consuming stages (join `src` back
    * for raw float embeddings). */
  def sqlKMeansChain(srcSql: String, k: Int, iters: Int, dim: Int)
      : String = {
    val sb = new StringBuilder
    sb.append(s"""WITH src AS MATERIALIZED ($srcSql),
    q AS MATERIALIZED (
      SELECT id, list_transform(embedding,
        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
      FROM src),
    c0 AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INT) AS cl, qv
      FROM (SELECT id, qv FROM q ORDER BY id LIMIT $k))""")
    for (t <- 1 to iters) {
      sb.append(s""",
    a$t AS MATERIALIZED (
      SELECT id, qv, cl FROM (
        SELECT q.id, q.qv, c.cl,
          ${sqlDist("q.qv", "c.qv")} AS dd
        FROM q CROSS JOIN c${t - 1} c)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY dd, cl) = 1),
    c$t AS MATERIALIZED (
      SELECT cl, list(v ORDER BY pos) AS qv FROM (
        SELECT cl, pos,
          CAST((s - (((s % n) + n) % n)) / n AS BIGINT) AS v
        FROM (
          SELECT a.cl AS cl, r.pos AS pos, SUM(a.qv[r.pos]) AS s,
            COUNT(*) AS n
          FROM a$t a, range(1, ${dim + 1}) r(pos)
          GROUP BY 1, 2))
      GROUP BY cl)""")
    }
    sb.append(s""",
    af AS MATERIALIZED (
      SELECT id, qv, cl, dd FROM (
        SELECT q.id, q.qv, c.cl,
          ${sqlDist("q.qv", "c.qv")} AS dd
        FROM q CROSS JOIN c$iters c)
      QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY dd, cl) = 1)""")
    sb.toString
  }

  /** DuckDB twin of [[kMeansSummary]] on the `embeddings` table. */
  def sqlKMeans(k: Int, iters: Int, dim: Int): String =
    sqlKMeansChain("SELECT vec_id AS id, embedding FROM embeddings",
      k, iters, dim) + s"""
    SELECT CAST(af.cl AS BIGINT) AS cluster,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(af.dd) AS BIGINT) AS inertia,
      CAST(MAX(cs.c_sum) AS BIGINT) AS c_sum
    FROM af JOIN (SELECT cl, list_sum(qv) AS c_sum FROM c$iters)
      cs ON af.cl = cs.cl
    GROUP BY af.cl ORDER BY cluster"""

  /** DuckDB twin of [[silhouetteSummary]] on the `embeddings` table. */
  def sqlSilhouette(k: Int, iters: Int, dim: Int): String =
    sqlKMeansChain("SELECT vec_id AS id, embedding FROM embeddings",
      k, iters, dim) + s""",
    alld AS (
      SELECT q.id, c.cl, ${sqlDist("q.qv", "c.qv")} AS dd
      FROM q CROSS JOIN c$iters c),
    rk AS (SELECT id, cl, dd,
        ROW_NUMBER() OVER (PARTITION BY id ORDER BY dd, cl) AS rn
      FROM alld),
    ab AS (SELECT a.id, a.cl AS cluster, a.dd AS da, b.dd AS db
      FROM rk a JOIN rk b ON a.id = b.id
      WHERE a.rn = 1 AND b.rn = 2),
    sv AS (SELECT cluster, CASE WHEN greatest(da, db) = 0 THEN 0
        ELSE ((db - da) * 1000) // greatest(da, db) END AS s
      FROM ab)
    SELECT CAST(cluster AS BIGINT) AS cluster,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(s) // COUNT(*) AS BIGINT) AS mean_s_x1000,
      CAST(MIN(s) AS BIGINT) AS min_s_x1000,
      CAST(MAX(s) AS BIGINT) AS max_s_x1000
    FROM sv GROUP BY 1 ORDER BY cluster"""

  /** DuckDB twin of [[semDedup]] over `srcSql` (id, embedding). */
  def sqlSemDedup(srcSql: String, k: Int, iters: Int, dim: Int,
      tau: Double): String =
    sqlKMeansChain(srcSql, k, iters, dim) + s""",
    pr AS (
      SELECT a.cl AS cluster, a.id AS id_a, a.qv AS q_a,
        b.id AS id_b, b.qv AS q_b
      FROM af a JOIN af b ON a.cl = b.cl AND a.id < b.id),
    sc AS (
      SELECT pr.cluster, pr.id_a, pr.id_b,
        ${sqlCosine("ea.embedding", "eb.embedding")} AS cos,
        list_sum(list_transform(list_zip(pr.q_a, pr.q_b),
          p -> p[1]*p[2])) AS qdot
      FROM pr JOIN src ea ON pr.id_a = ea.id
        JOIN src eb ON pr.id_b = eb.id)
    SELECT CAST(cluster AS BIGINT) AS cluster, id_a, id_b,
      CAST(qdot AS BIGINT) AS qdot
    FROM sc WHERE cos > $tau ORDER BY id_a, id_b"""

  /** DuckDB twin of [[clusterTerms]] on embeddings + documents. */
  def sqlClusterTerms(k: Int, iters: Int, dim: Int, topN: Int): String =
    sqlKMeansChain("SELECT vec_id AS id, embedding FROM embeddings",
      k, iters, dim) + s""",
    asg AS (SELECT id AS doc_id, cl AS cluster FROM af),
    inst AS (
      SELECT d.doc_id,
        unnest(list_filter(string_split_regex(lower(trim(d.text)),
          '\\s+'), w -> len(w) > 0)) AS term
      FROM documents d),
    ji AS (SELECT inst.term, asg.cluster
      FROM inst JOIN asg ON inst.doc_id = asg.doc_id),
    ct AS (SELECT cluster, term, COUNT(*) AS ct FROM ji GROUP BY 1, 2),
    cdf AS (SELECT term, COUNT(*) AS cdf FROM ct GROUP BY 1),
    nc AS (SELECT COUNT(*) AS k FROM c$iters),
    sc AS (SELECT ct.cluster, ct.term, ct.ct, cdf.cdf,
        CAST(ct.ct * nc.k AS DOUBLE) / CAST(cdf.cdf AS DOUBLE) AS score
      FROM ct JOIN cdf ON ct.term = cdf.term, nc)
    SELECT CAST(cluster AS BIGINT) AS cluster,
      CAST(ROW_NUMBER() OVER (PARTITION BY cluster
        ORDER BY score DESC, term) AS BIGINT) AS rank,
      term, CAST(ct AS BIGINT) AS ct, CAST(cdf AS BIGINT) AS cdf, score
    FROM sc
    QUALIFY rank <= $topN
    ORDER BY cluster, rank"""

  /** GRID-DBSCAN — density-based clustering, the family k-means can't
    * express (arbitrary-shape clusters + an explicit noise class), in
    * its grid formulation (the GriDBSCAN/GriT lineage): quantize the
    * first two embedding dimensions to cells of side 1/scale
    * (`floor(x·scale)` — scale a power of two, so the multiply is IEEE-
    * exact and identical cross-engine), call a cell CORE when it holds
    * ≥ minPts points, and define clusters as connected components of
    * 8-ADJACENT core cells. Points in core cells are members; all other
    * points are noise. (Point-level DBSCAN's border rule is deliberately
    * dropped — the cell-level definition is exact, deterministic, and
    * what the grid variants actually compute at scale.)
    *
    * Output: one row per cluster (cluster = min packed cell id of the
    * component, n_cells, n_points) ordered by size, plus a final
    * cluster = −1 noise row aggregating every sub-core cell.
    *
    * Scale shape: the corpus contributes ONE cell-keyed aggregate; every
    * later step (adjacency join, [[Dedup.nearDupGroupsStar]] components,
    * membership join) runs on the CELL table, bounded by min(#points,
    * grid area) regardless of corpus size. Adjacency is realized as a
    * 9-way neighbor-key equi-join (bounded fan-out), never a theta
    * join. */
  def gridDbscan(df: DataFrame, idCol: String, vecCol: String,
      scale: Int, minPts: Long): DataFrame = {
    val off = 1048576L
    def packed(cx: Column, cy: Column): Column =
      (cx + off) * lit(2097152L) + (cy + off)
    // cell-id packing is only injective for |cx|,|cy| < 2^20 — outside
    // that range (|coord|·scale ≥ 1048576) distant cells would silently
    // collide or go negative in BOTH engines. Enforce the precondition
    // per row: assert_true returns null on success (the isNull filter
    // keeps every valid row and forces evaluation) and raises on the
    // first out-of-range point instead of corrupting the clustering.
    val pts = df.select(col(idCol).as("id"),
      floor(col(vecCol).getItem(0).cast(DoubleType) * scale)
        .cast(LongType).as("cx"),
      floor(col(vecCol).getItem(1).cast(DoubleType) * scale)
        .cast(LongType).as("cy"))
      .withColumn("_ck", assert_true(
        abs(col("cx")) < off && abs(col("cy")) < off,
        lit(s"gridDbscan: |coord|*$scale >= 2^20 breaks cell-id packing")))
      .filter(col("_ck").isNull).drop("_ck")
    val cells = pts.groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cell", packed(col("cx"), col("cy")))
      .localCheckpoint(true)
    val core = cells.filter(col("n") >= minPts)
    // 9 neighbor keys per core cell (incl. self, so singleton core
    // cells survive as nodes); inner join back to core = adjacency
    val pairs = core
      .select(col("cell").as("id_a"), col("cx"), col("cy"))
      .withColumn("dx", explode(typedLit(Seq(-1L, 0L, 1L))))
      .withColumn("dy", explode(typedLit(Seq(-1L, 0L, 1L))))
      .select(col("id_a"),
        packed(col("cx") + col("dx"), col("cy") + col("dy")).as("id_b"))
      .join(core.select(col("cell").as("id_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"))
    val labels = Dedup.nearDupGroupsStar(pairs)
      .select(col("id").as("cell"), col("label"))
    val clusters = core.join(labels, Seq("cell"))
      .groupBy(col("label").as("cluster"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_points"))
    val noise = cells.filter(col("n") < minPts)
      .agg(coalesce(count(lit(1)), lit(0L)).as("n_cells"),
        coalesce(sum(col("n")), lit(0L)).as("n_points"))
      .select(lit(-1L).as("cluster"), col("n_cells"), col("n_points"))
    clusters.unionByName(noise)
      .orderBy(desc("n_points"), asc("cluster"))
  }

  /** DuckDB twin of [[gridDbscan]] over `embeddings` (1-based list
    * indexing; recursive-CTE min-label components). */
  def sqlGridDbscan(scale: Int, minPts: Long): String =
    s"""WITH RECURSIVE pts AS (
        SELECT vec_id AS id,
          CAST(floor(CAST(embedding[1] AS DOUBLE) * $scale) AS BIGINT)
            AS cx,
          CAST(floor(CAST(embedding[2] AS DOUBLE) * $scale) AS BIGINT)
            AS cy
        FROM embeddings),
      cells AS (SELECT cx, cy,
          (cx + 1048576) * 2097152 + (cy + 1048576) AS cell,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM pts GROUP BY 1, 2),
      core AS (SELECT * FROM cells WHERE n >= $minPts),
      edges AS (
        SELECT a.cell AS src, b.cell AS dst
        FROM core a JOIN core b
          ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
      reach AS (
        SELECT cell AS id, cell AS label FROM core
        UNION
        SELECT e.src AS id, r.label FROM edges e JOIN reach r
          ON e.dst = r.id),
      comp AS (SELECT id AS cell, MIN(label) AS label FROM reach
        GROUP BY id),
      clusters AS (
        SELECT c.label AS cluster,
          CAST(COUNT(*) AS BIGINT) AS n_cells,
          CAST(SUM(k.n) AS BIGINT) AS n_points
        FROM comp c JOIN core k USING (cell) GROUP BY 1)
      SELECT cluster, n_cells, n_points FROM clusters
      UNION ALL
      SELECT -1 AS cluster,
        CAST(COUNT(*) AS BIGINT) AS n_cells,
        CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_points
      FROM cells WHERE n < $minPts
      ORDER BY n_points DESC, cluster"""
}
