package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) shard routing — the deterministic
  * key→shard assignment an ingestion tier uses to route documents to
  * writers/stores (reference routes per-league collection jobs to fixed
  * workers; /root/reference/automated_data_collection.py league loops).
  *
  * Why HRW and not `hash(key) % n`: when the shard count changes n→n+1,
  * modulo reassigns ~n/(n+1) of ALL keys; HRW moves ONLY the keys won by
  * the new shard (~1/(n+1)) — the property that makes resharding a 100 TB
  * store an incremental copy instead of a full rewrite. That minimal-
  * movement property is spec-pinned (ShardingSpec).
  *
  * Scale shape: routing is a pure per-row projection — `numShards` md5
  * candidates folded with `array_max` (struct ordering: weight first),
  * entirely codegen'd, ZERO shuffle (spec-pinned). The downstream
  * `groupBy(shard)` any caller adds is a bounded `numShards`-row
  * aggregate with map-side combine.
  */
object Sharding {

  /** Adds a `shard` column (0-based LONG) routing each row by
    * `md5(key:shard:salt)` highest-random-weight over `numShards`. */
  def rendezvousRoute(df: DataFrame, keyCol: String, numShards: Int,
      salt: String = "graft"): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val candidates = array((0 until numShards).map { s =>
      struct(
        md5(concat_ws(":", col(keyCol).cast("string"), lit(s.toString),
          lit(salt))).as("w"),
        lit(s.toLong).as("shard"))
    }: _*)
    df.withColumn("shard", array_max(candidates).getField("shard"))
  }

  /** KEY-SKEW PROFILER: the diagnostic a pipeline runs BEFORE keying a
    * 100 TB shuffle on a column — per heavy key its share of the table
    * and the salt factor that would level it. For the top-`k` keys by
    * count (smallest-key ties):
    *
    *   skew_x1000  = ⌊cnt·D·1000 / N⌋   (1000 = perfectly uniform)
    *   salt_factor = ⌈cnt·D / N⌉        (sub-splits to restore balance)
    *
    * where N = rows, D = distinct keys — all exact integer arithmetic
    * (counts < 2³¹ keep every product < 2⁶²). This is the planning
    * input for [[graft.operators.Joins]]' salted-join path and AQE's
    * skew thresholds. Plan: one key-count groupBy (map-side combined),
    * a D-row stats agg broadcast back onto the ≤k-row top slice —
    * the corpus is scanned once and never collected. */
  def skewProfile(df: DataFrame, keyCol: String, k: Int = 5)
      : DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(sum(col("cnt")).as("n"),
      count(lit(1)).as("d"), max(col("cnt")).as("max_cnt"))
    val top = counts.orderBy(desc("cnt"), asc("key")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cnt"), asc("key"))
    top.crossJoin(broadcast(stats))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("skew_x1000", expr("(cnt * d * 1000) div n"))
      .withColumn("salt_factor", expr("(cnt * d + n - 1) div n"))
      .select(col("rank"), col("key"), col("cnt"), col("n"), col("d"),
        col("skew_x1000"), col("salt_factor"))
  }

  /** EXACT JOIN-SIZE PROFILE: the output cardinality an equi-join of
    * the two inputs would produce — `Σ_k cntA(k)·cntB(k)` — plus the
    * matched-key count, the single worst key's contribution, and its
    * per-mille share. The pre-flight check before committing a 100 TB
    * shuffle join: a contribution share near 1000 means ONE key
    * produces the whole output (salt it or rethink the join); est_rows
    * ≫ max(|A|,|B|) flags a fan-out join. Exact integer arithmetic
    * throughout (row counts < 2³¹ keep every product < 2⁶²).
    *
    * Plan: one key-count groupBy per side (map-side combined, output
    * |keys|-bounded), one join of the two COUNT tables (never the raw
    * rows), one 1-row agg — strictly cheaper than the join it predicts,
    * which is the tool's point. */
  def joinSizeProfile(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val ca = left.groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("ca"))
    val cb = right.groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("cb"))
    ca.join(cb, Seq("key"))
      .select(col("key"), (col("ca") * col("cb")).as("contrib"))
      .agg(sum(col("contrib")).as("est_rows"),
        count(lit(1)).as("matched_keys"),
        max(col("contrib")).as("max_contrib"),
        min_by(col("key"), struct((-col("contrib")).as("a"),
          col("key").as("b"))).as("max_key"))
      .withColumn("max_share_x1000",
        expr("(max_contrib * 1000) div est_rows"))
  }
}
