package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BATCH PERCEPTRON over hashed bag-of-words features, integer-exact —
  * the discriminative sibling of [[NaiveBayes]] (the quality-filter
  * pair every LLM curation stack carries: a generative scorer and a
  * trained linear separator). All arithmetic is integer:
  *
  *   w ← w + Σ_{i : yᵢ·(w·xᵢ) ≤ 0} yᵢ·xᵢ        (T full-batch rounds)
  *
  * where xᵢ = md5-bucket token counts ([[Dsir.bucketOf]]) plus a bias
  * pseudo-bucket (−1, count 1) and yᵢ = ±1 from a target predicate.
  * No learning-rate float, no RNG, no libm: the weight trajectory is
  * exactly reproducible and the DuckDB twin replays all T rounds as a
  * chained-CTE relational program.
  *
  * Scale shape: features are ONE corpus explode + (doc, bucket)
  * groupBy, cached; each round is a broadcast join against the
  * (nBuckets+1)-row weight table, a per-doc score agg, and a
  * misclassified-set gradient agg whose output is bucket-bounded —
  * the weight table never leaves the cluster (pure DataFrame
  * iteration, localCheckpoint-truncated lineage), and the corpus is
  * scanned T times with no driver state at all.
  */
object Perceptron {

  private def toks(t: Column): Column =
    filter(split(lower(trim(t)), "\\s+"), x => x =!= lit(""))

  /** (doc_id, y, b, cnt) hashed features incl. the bias row. */
  private[operators] def features(df: DataFrame, idCol: String,
      textCol: String, isTarget: Column, nBuckets: Int): DataFrame = {
    val y = when(isTarget, 1L).otherwise(-1L)
    df.select(col(idCol).as("doc_id"), y.as("y"),
        explode(toks(col(textCol))).as("w"))
      .withColumn("b", Dsir.bucketOf(col("w"), nBuckets))
      .groupBy(col("doc_id"), col("y"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .unionByName(df.select(col(idCol).as("doc_id"), y.as("y"),
        lit(-1L).as("b"), lit(1L).as("cnt")))
  }

  /** T rounds over an already-cached feature frame. */
  private def trainOnFeats(feats: DataFrame, nBuckets: Int, iters: Int)
      : DataFrame = {
    val spark = feats.sparkSession
    var w = spark.range(-1L, nBuckets.toLong).toDF("b")
      .withColumn("wt", lit(0L))
    for (_ <- 1 to iters) {
      val s = feats.join(broadcast(w), Seq("b"))
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("cnt") * col("wt")).as("sc"))
      val mis = s.filter(col("y") * col("sc") <= 0).select(col("doc_id"))
      val g = feats.join(mis, Seq("doc_id"))
        .groupBy(col("b")).agg(sum(col("y") * col("cnt")).as("g"))
      w = w.join(g, Seq("b"), "left_outer")
        .select(col("b"), (col("wt") + coalesce(col("g"), lit(0L)))
          .as("wt"))
        .localCheckpoint()
    }
    w
  }

  /** Train T rounds; returns the (b, wt) weight table, bias at b=−1. */
  def train(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int = 32, iters: Int = 3): DataFrame = {
    val feats = features(df, idCol, textCol, isTarget, nBuckets).cache()
    try trainOnFeats(feats, nBuckets, iters).orderBy(col("b"))
    finally feats.unpersist()
  }

  /** Score every document under a trained weight table: Σ cnt·wt over
    * the doc's hashed features (bias included via the b=−1 row). One
    * broadcast join + per-doc agg — the filter-time serving path. */
  def score(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, weights: DataFrame, nBuckets: Int): DataFrame =
    features(df, idCol, textCol, isTarget, nBuckets)
      .join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(col("cnt") * col("wt")).as("score"))

  /** MARGIN MINING: the k documents the trained separator is LEAST
    * sure about (smallest |score|, ties to smallest id) — the
    * active-learning / route-to-review step: ambiguous examples are
    * where labeling budget buys the most. Train + score + one
    * distributed bottom-k. */
  def marginMining(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int = 32, iters: Int = 3,
      k: Int = 20): DataFrame = {
    // one cached feature frame serves BOTH training and final scoring —
    // the corpus is exploded once, not iters+2 times
    val feats = features(df, idCol, textCol, isTarget, nBuckets).cache()
    try {
      val w = trainOnFeats(feats, nBuckets, iters)
      val scored = feats.join(broadcast(w), Seq("b"))
        .groupBy(col("doc_id"), col("y"))
        .agg(sum(col("cnt") * col("wt")).as("score"))
        .withColumn("abs_score", abs(col("score")))
      val top = scored.orderBy(col("abs_score"), col("doc_id")).limit(k)
        .localCheckpoint()
      val win = org.apache.spark.sql.expressions.Window
        .orderBy(col("abs_score"), col("doc_id"))
      top.withColumn("rank", row_number().over(win).cast("long"))
        .select(col("rank"), col("doc_id"), col("y"), col("score"))
    } finally feats.unpersist()
  }

  /** Shared CTE chain of [[sqlTrain]]: emits `inst`, `f`, `w0..w$iters`.
    * Callers append consuming stages. */
  def sqlTrainChain(tgtSql: String, nBuckets: Int, iters: Int)
      : String = {
    def hv(i: Int) =
      s"""(CASE WHEN ascii(substr(md5(w), $i, 1)) >= 97
         THEN ascii(substr(md5(w), $i, 1)) - 87
         ELSE ascii(substr(md5(w), $i, 1)) - 48 END)"""
    val sb = new StringBuilder
    sb.append(s"""WITH inst AS (
      SELECT doc_id, CASE WHEN ($tgtSql) THEN 1 ELSE -1 END AS y,
        unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
          w -> len(w) > 0)) AS w
      FROM documents),
    f AS MATERIALIZED (
      SELECT doc_id, y, ((${hv(1)} * 16 + ${hv(2)}) % $nBuckets) AS b,
        COUNT(*) AS cnt
      FROM inst GROUP BY 1, 2, 3
      UNION ALL
      SELECT doc_id, CASE WHEN ($tgtSql) THEN 1 ELSE -1 END AS y,
        -1 AS b, 1 AS cnt
      FROM documents),
    w0 AS (SELECT range AS b, CAST(0 AS BIGINT) AS wt
      FROM range(-1, $nBuckets))""")
    for (t <- 1 to iters) {
      sb.append(s""",
    s$t AS (SELECT f.doc_id, f.y, SUM(f.cnt * w${t - 1}.wt) AS sc
      FROM f JOIN w${t - 1} ON f.b = w${t - 1}.b GROUP BY 1, 2),
    g$t AS (SELECT f.b, SUM(f.y * f.cnt) AS g
      FROM f JOIN s$t ON f.doc_id = s$t.doc_id
      WHERE s$t.y * s$t.sc <= 0 GROUP BY f.b),
    w$t AS (SELECT w${t - 1}.b,
        w${t - 1}.wt + COALESCE(g$t.g, 0) AS wt
      FROM w${t - 1} LEFT JOIN g$t ON w${t - 1}.b = g$t.b)""")
    }
    sb.toString
  }

  /** DuckDB twin of [[train]] on `documents` with target `tgtSql`. */
  def sqlTrain(tgtSql: String, nBuckets: Int = 32, iters: Int = 3)
      : String =
    sqlTrainChain(tgtSql, nBuckets, iters) + s"""
    SELECT b, CAST(wt AS BIGINT) AS wt FROM w$iters ORDER BY b"""

  /** DuckDB twin of [[marginMining]]. */
  def sqlMarginMining(tgtSql: String, nBuckets: Int = 32,
      iters: Int = 3, k: Int = 20): String =
    sqlTrainChain(tgtSql, nBuckets, iters) + s""",
    sc AS (SELECT f.doc_id, f.y, SUM(f.cnt * w$iters.wt) AS score
      FROM f JOIN w$iters ON f.b = w$iters.b GROUP BY 1, 2)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY abs(score), doc_id)
        AS BIGINT) AS rank,
      doc_id, CAST(y AS BIGINT) AS y, CAST(score AS BIGINT) AS score
    FROM sc ORDER BY abs(score), doc_id LIMIT $k"""
}
