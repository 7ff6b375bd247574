package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Greedy k-CENTER CORESET selection (farthest-point traversal) over an
  * embedding column — the data-pruning / diverse-subset-selection step
  * of training-data curation (coreset literature: pick k points whose
  * min-distance cover of the corpus is maximal; the 2-approximation of
  * the k-center objective).
  *
  * Determinism: coordinates are quantized to exact integer micros
  * (⌊x·10⁶⌋, the embed-quantize discipline) and every distance is an
  * INTEGER squared L2, so the argmax trajectory is bit-replayable in
  * any engine; ties break on the smallest id, and the traversal seeds
  * at the smallest id (no RNG anywhere).
  *
  * Scale shape (the BPE/IVF bounded-model posture): the corpus is
  * quantized ONCE and cached; each of the k rounds is one map over the
  * corpus (min-distance against ≤k plan-literal center vectors — k·dim
  * longs, broadcast with the closure) plus a TakeOrderedAndProject
  * argmax — a 1-ROW collect per round, never the corpus. No shuffle of
  * the corpus at any point; total driver state is k·dim longs. At
  * 100 TB this runs k corpus scans; [[Coreset.kCenterBatched]] is the
  * lazy-greedy variant that cuts the barrier count ~m× while producing
  * the BIT-IDENTICAL trajectory (outsider-threshold guard).
  */
object Coreset {

  private[operators] def quantize(vecCol: Column): Column =
    transform(vecCol, x => floor(x.cast(DoubleType) * lit(1000000))
      .cast(LongType))

  private def sqDist(qv: Column, center: Seq[Long]): Column =
    aggregate(
      zip_with(qv, typedLit(center), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Returns (rank, id, dist): the k selected ids in traversal order,
    * each with its integer squared distance to the previously selected
    * set at selection time (rank 1 = seed, dist 0). */
  def kCenter(df: DataFrame, idCol: String, vecCol: String, k: Int)
      : DataFrame = {
    val spark = df.sparkSession
    val q = df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .cache()
    try {
      val seedRow = q.orderBy(col("id")).limit(1).collect()(0)
      var centers = Vector[(Long, Seq[Long], Long)](
        (seedRow.getLong(0), seedRow.getSeq[Long](1), 0L))
      while (centers.size < k) {
        val minDist = centers.map(c => sqDist(col("qv"), c._2))
          .reduce(least(_, _))
        val next = q
          .filter(!col("id").isInCollection(centers.map(_._1)))
          .select(col("id"), col("qv"), minDist.as("md"))
          .orderBy(col("md").desc, col("id").asc)
          .limit(1).collect()(0)
        centers = centers :+ ((next.getLong(0), next.getSeq[Long](1),
          next.getLong(2)))
      }
      import spark.implicits._
      centers.zipWithIndex
        .map { case ((id, _, dist), i) => (i + 1L, id, dist) }
        .toDF("rank", "id", "dist")
    } finally q.unpersist()
  }

  /** BATCHED greedy k-center — identical trajectory, ~m× fewer barriers.
    *
    * [[kCenter]] pays one corpus scan + one 1-row collect PER CENTER; at
    * k=1000 that is 1000 sequential job barriers of pure latency. This
    * variant is the LAZY-GREEDY form: each round collects the top-(m+1)
    * candidates by current min-distance, then consumes up to m of them
    * driver-side with exact local distance updates, guarded by the
    * (m+1)-th candidate's distance as the OUTSIDER THRESHOLD — any point
    * outside the batch has md ≤ that threshold at round start and
    * distances only shrink as centers are added, so while the local
    * argmax stays STRICTLY above the threshold it is provably the global
    * argmax (including the smallest-id tie-break, since no outsider can
    * even tie). When the guard trips, the round ends and the next scan
    * re-ranks. Result: BIT-IDENTICAL output to [[kCenter]] (gated by
    * q_coreset_batched against the same unrolled twin, and by equality in
    * CoresetSpec), at ceil(k/m)-ish barriers on dispersed data,
    * degrading gracefully toward k barriers only when selection
    * distances are tightly clustered (where every pick reshuffles the
    * frontier — the cases where sequential greedy is genuinely needed).
    * Driver state: m candidate vectors + k·dim center longs. */
  def kCenterBatched(df: DataFrame, idCol: String, vecCol: String,
      k: Int, m: Int = 8): DataFrame =
    kCenterBatchedTrajectory(df, idCol, vecCol, k, m)._1

  private[graft] def kCenterBatchedTrajectory(df: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int): (DataFrame, Int) = {
    require(m >= 1, "batch size must be >= 1")
    val spark = df.sparkSession
    val q = df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .cache()
    try {
      val seedRow = q.orderBy(col("id")).limit(1).collect()(0)
      var centers = Vector[(Long, Seq[Long], Long)](
        (seedRow.getLong(0), seedRow.getSeq[Long](1), 0L))
      var rounds = 0
      def d2Local(a: Seq[Long], b: Seq[Long]): Long = {
        var i = 0; var acc = 0L
        while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
        acc
      }
      while (centers.size < k) {
        rounds += 1
        val minDist = centers.map(c => sqDist(col("qv"), c._2))
          .reduce(least(_, _))
        val cand = q
          .filter(!col("id").isInCollection(centers.map(_._1)))
          .select(col("id"), col("qv"), minDist.as("md"))
          .orderBy(col("md").desc, col("id").asc)
          .limit(m + 1).collect()
        require(cand.nonEmpty, s"corpus has fewer than $k points")
        // best possible md of ANY point outside the batch, for the rest
        // of this round (outsider distances only shrink)
        val threshold = if (cand.length > m) cand(m).getLong(2) else -1L
        var local = cand.take(m).toVector.map(r =>
          (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
        var taken = 0
        var open = true
        while (open && local.nonEmpty && centers.size < k) {
          val best = local.minBy(t => (-t._3, t._1))
          // the round's FIRST pick is the global argmax by construction
          // (the scan ranked against all current centers); later picks
          // are exact only while strictly above the outsider threshold
          if (taken > 0 && threshold >= 0 && best._3 <= threshold)
            open = false
          else {
            centers = centers :+ best
            taken += 1
            local = local.filterNot(_._1 == best._1).map { t =>
              (t._1, t._2, math.min(t._3, d2Local(t._2, best._2)))
            }
          }
        }
      }
      import spark.implicits._
      (centers.zipWithIndex
        .map { case ((id, _, dist), i) => (i + 1L, id, dist) }
        .toDF("rank", "id", "dist"), rounds)
    } finally q.unpersist()
  }

  private def dot(qv: Column, center: Seq[Long]): Column =
    aggregate(
      zip_with(qv, typedLit(center), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)

  /** MAXIMAL MARGINAL RELEVANCE (MMR) diversified top-k: rerank the
    * `n` most query-relevant vectors so each pick maximizes
    * `wRel·rel(p) − wDiv·max_{s∈selected} sim(p, s)` — the
    * diversity-aware retrieval step (dedupe-at-serving / diverse
    * few-shot selection). Similarities are integer dot products over
    * micro-quantized coordinates, weights are integers, ties break on
    * the smallest id — the greedy trajectory is bit-replayable.
    *
    * Scale shape: ONE corpus map scores relevance against the
    * plan-literal query vector, a TakeOrderedAndProject keeps the top-n
    * rerank pool (the serve-path posture: greedy reranking runs on a
    * bounded candidate set, never the corpus), then k rounds of
    * map + 1-row-collect argmax over the cached pool. */
  def mmr(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Double], n: Int, k: Int,
      wRel: Long = 7L, wDiv: Long = 3L): DataFrame = {
    val spark = df.sparkSession
    val qq = queryVec.map(x => math.floor(x * 1000000).toLong)
    val cands = df
      .select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("rel", dot(col("qv"), qq))
      .orderBy(col("rel").desc, col("id").asc)
      .limit(n)
      .cache()
    try {
      val first = cands.orderBy(col("rel").desc, col("id").asc)
        .limit(1).collect()(0)
      var sel = Vector[(Long, Seq[Long], Long, Long)](
        (first.getLong(0), first.getSeq[Long](1), first.getLong(2),
          wRel * first.getLong(2)))
      while (sel.size < k) {
        val maxSim = sel.map(s => dot(col("qv"), s._2))
          .reduce(greatest(_, _))
        val next = cands
          .filter(!col("id").isInCollection(sel.map(_._1)))
          .select(col("id"), col("qv"), col("rel"),
            (lit(wRel) * col("rel") - lit(wDiv) * maxSim).as("score"))
          .orderBy(col("score").desc, col("id").asc)
          .limit(1).collect()(0)
        sel = sel :+ ((next.getLong(0), next.getSeq[Long](1),
          next.getLong(2), next.getLong(3)))
      }
      import spark.implicits._
      sel.zipWithIndex
        .map { case ((id, _, rel, score), i) => (i + 1L, id, rel, score) }
        .toDF("rank", "id", "rel", "score")
    } finally cands.unpersist()
  }

  /** DuckDB twin of [[mmr]] as an unrolled CTE chain. */
  def sqlMmr(queryIdExpr: String, n: Int, k: Int,
      wRel: Long = 7L, wDiv: Long = 3L): String = {
    val dotS = (a: String, b: String) =>
      s"list_sum(list_transform(list_zip($a, $b), p -> p[1]*p[2]))"
    val sb = new StringBuilder
    sb.append(s"""WITH qz AS (
      SELECT list_transform(embedding,
        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
      FROM embeddings WHERE vec_id = $queryIdExpr),
    pool AS MATERIALIZED (
      SELECT e.vec_id AS id,
        list_transform(e.embedding,
          x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv,
        (SELECT ${dotS("list_transform(e.embedding, x -> CAST(FLOOR(" +
          "CAST(x AS DOUBLE) * 1000000) AS BIGINT))", "qz.qv")}
         FROM qz) AS rel
      FROM embeddings e
      ORDER BY rel DESC, id LIMIT $n),
    m0 AS MATERIALIZED (SELECT id, qv, rel, $wRel * rel AS score FROM pool
      ORDER BY rel DESC, id LIMIT 1)""")
    for (i <- 1 until k) {
      val prevSel = (0 until i).map(j => s"SELECT id FROM m$j")
        .mkString(" UNION ALL ")
      val sims = (0 until i)
        .map(j => s"(SELECT ${dotS("p.qv", s"m$j.qv")} FROM m$j)")
      val maxSim =
        if (sims.size == 1) sims.head
        else s"GREATEST(${sims.mkString(", ")})"
      sb.append(s""",
    m$i AS MATERIALIZED (SELECT id, qv, rel,
        $wRel * rel - $wDiv * ($maxSim) AS score
      FROM pool p WHERE id NOT IN ($prevSel)
      ORDER BY score DESC, id LIMIT 1)""")
    }
    val sel = (0 until k)
      .map(j => s"SELECT ${j + 1} AS rank, id, rel, score FROM m$j")
      .mkString(" UNION ALL ")
    sb.append(s"""
    SELECT CAST(rank AS BIGINT) AS rank, id AS vec_id,
      CAST(rel AS BIGINT) AS rel, CAST(score AS BIGINT) AS score
    FROM ($sel) ORDER BY rank""")
    sb.toString
  }

  /** DuckDB twin of [[kCenter]] as an unrolled CTE chain (the oracle
    * replays the identical argmax trajectory in SQL; a recursive CTE
    * cannot aggregate over its own working table, so the k rounds are
    * generated as k CTE stages). */
  def sqlKCenter(k: Int): String = {
    val dist = (a: String, b: String) =>
      s"list_sum(list_transform(list_zip($a, $b), " +
        s"p -> (p[1]-p[2])*(p[1]-p[2])))"
    val sb = new StringBuilder
    sb.append("""WITH q AS MATERIALIZED (
      SELECT vec_id AS id, list_transform(embedding,
        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
      FROM embeddings),
    c0 AS MATERIALIZED (SELECT id, qv, CAST(0 AS BIGINT) AS dist FROM q
      WHERE id = (SELECT MIN(id) FROM q)),
    d0 AS MATERIALIZED (SELECT q.id, q.qv,
      (SELECT """ + dist("q.qv", "c0.qv") + """ FROM c0) AS md FROM q)""")
    for (i <- 1 until k) {
      val prevSel = (0 until i).map(j => s"SELECT id FROM c$j")
        .mkString(" UNION ALL ")
      sb.append(s""",
    c$i AS MATERIALIZED (SELECT id, qv, md AS dist FROM d${i - 1}
      WHERE id NOT IN ($prevSel)
      ORDER BY md DESC, id LIMIT 1)""")
      if (i < k - 1)
        sb.append(s""",
    d$i AS MATERIALIZED (SELECT d.id, d.qv,
      LEAST(d.md, (SELECT ${dist("d.qv", s"c$i.qv")} FROM c$i)) AS md
      FROM d${i - 1} d)""")
    }
    val sel = (0 until k)
      .map(j => s"SELECT ${j + 1} AS rank, id, dist FROM c$j")
      .mkString(" UNION ALL ")
    sb.append(s"""
    SELECT CAST(rank AS BIGINT) AS rank, id AS vec_id,
      CAST(dist AS BIGINT) AS dist
    FROM ($sel) ORDER BY rank""")
    sb.toString
  }
}
