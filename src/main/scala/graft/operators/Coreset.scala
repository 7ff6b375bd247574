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
  * 100 TB this runs k corpus scans; callers wanting fewer scans batch
  * rounds with the over-sampling variant of greedy k-center — the
  * per-round plan here is already the minimal one.
  */
object Coreset {

  private def quantize(vecCol: Column): Column =
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

  /** DuckDB twin of [[kCenter]] as an unrolled CTE chain (the oracle
    * replays the identical argmax trajectory in SQL; a recursive CTE
    * cannot aggregate over its own working table, so the k rounds are
    * generated as k CTE stages). */
  def sqlKCenter(k: Int): String = {
    val dist = (a: String, b: String) =>
      s"list_sum(list_transform(list_zip($a, $b), " +
        s"p -> (p[1]-p[2])*(p[1]-p[2])))"
    val sb = new StringBuilder
    sb.append("""WITH q AS (
      SELECT vec_id AS id, list_transform(embedding,
        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
      FROM embeddings),
    c0 AS (SELECT id, qv, CAST(0 AS BIGINT) AS dist FROM q
      WHERE id = (SELECT MIN(id) FROM q)),
    d0 AS (SELECT q.id, q.qv,
      (SELECT """ + dist("q.qv", "c0.qv") + """ FROM c0) AS md FROM q)""")
    for (i <- 1 until k) {
      val prevSel = (0 until i).map(j => s"SELECT id FROM c$j")
        .mkString(" UNION ALL ")
      sb.append(s""",
    c$i AS (SELECT id, qv, md AS dist FROM d${i - 1}
      WHERE id NOT IN ($prevSel)
      ORDER BY md DESC, id LIMIT 1)""")
      if (i < k - 1)
        sb.append(s""",
    d$i AS (SELECT d.id, d.qv,
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
