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
}
