package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Baseline: brute-force cosine top-k (broadcast queries —
  * one scan of the corpus, no shuffle until the final per-query top-k).
  * Scale path: random-hyperplane LSH bucketing so each query only scores
  * its bucket-mates.
  */
object Ann {

  /** Fast double dot product (sequential IEEE fold — deterministic for a
    * fixed array order, but engine-arithmetic dependent; use for filters
    * and ranking, not for oracle-compared values). Custom expression: the
    * zip_with+aggregate formulation walks the interpreter tree per element
    * (~64 nodes per pair) and dominated the pairwise prefilter. */
  def dotFast(a: Column, b: Column): Column =
    graft.functions.DotProductFloat.dotFloat(a, b)

  /** Fast cosine for prefilters. */
  def cosineFast(a: Column, b: Column): Column =
    dotFast(a, b) / (sqrt(dotFast(a, a)) * sqrt(dotFast(b, b)))

  /** Dot product of two array<float/double> columns — exact decimal
    * accumulation so the result is summation-order independent (needed for
    * hash-exact verification; the per-element products are IEEE-exact). */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double"))
        .cast("decimal(28,18)")),
      lit(0).cast("decimal(28,18)"),
      // add expands precision to (29,18); the re-cast keeps the accumulator
      // type stable and is exact (scale unchanged, magnitude << 10^10)
      (acc, v) => (acc + v).cast("decimal(28,18)")).cast("double")

  /** Cosine similarity (double). */
  def cosine(a: Column, b: Column): Column =
    dotExact(a, b) / (sqrt(dotExact(a, a)) * sqrt(dotExact(b, b)))

  /** Brute-force cosine top-k: for each query vector (small set, broadcast),
    * score the whole corpus and keep the k best. Plan: broadcast NL join
    * (corpus never shuffles at full width) → fast-double prescreen with a
    * map-side-pruned window (WindowGroupLimit keeps ≤ k+32 rows per query
    * per partition BEFORE the exchange) → exact-decimal cosine only on the
    * survivors → exact re-rank. The deterministic decimal score does ~100×
    * less work this way, and the one array-carrying exchange is group-limit
    * pruned, so the shape survives corpus scale-up.
    *
    * The k+32 margin makes the prescreen lossless in practice: the double
    * dot's rounding error (~1e-13 relative) would need >32 candidates within
    * that distance of the rank-k boundary to change the output.
    * Output: (query_id, rank, id, cos). */
  def cosineTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int): DataFrame = {
    val joined = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__q"))))
      .withColumn("__fastcos", cosineFast(col("__v"), col("__q")))
    val w0 = Window.partitionBy(col("query_id"))
      .orderBy(desc("__fastcos"), asc("id"))
    val pruned = joined.withColumn("__r0", row_number().over(w0))
      .filter(col("__r0") <= k + 32)
    val scored = pruned
      .withColumn("cos", cosine(col("__v"), col("__q")))
      // arrays projected out before the final exact-rank exchange
      .select(col("query_id"), col("id"), col("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cos")
  }

  /** Random-hyperplane signature: `nPlanes` sign bits packed into a long.
    * The ±1 hyperplane matrix is derived ONCE at plan time from SplitMix64
    * (deterministic, reproducible cluster-wide, no stored model) and shipped
    * as a literal — per-row work is nPlanes fused multiply-adds, no per-row
    * hashing. */
  def hyperplaneSig(vec: Column, dim: Int, nPlanes: Int,
      tableSeed: Long = 0L): Column = {
    require(nPlanes <= 63, "pack into one long")
    import graft.functions.MinHashSignature.splitmix64
    val planes: Seq[Seq[Double]] = (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        if ((splitmix64(tableSeed * 7368787L + p.toLong * 1048573 + d)
          & 1L) == 0L) 1.0 else -1.0
      }
    }
    val bits = (0 until nPlanes).map { p =>
      val s = aggregate(
        zip_with(vec, typedLit(planes(p)), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(s > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: corpus and queries signed with `nTables` independent
    * hyperplane sets; candidates share (table, bucket) in ANY table
    * (multi-probe additionally flips each of the first `multiProbeBits`
    * signature bits); exact cosine re-ranks candidates. Recall < 1 by
    * construction — this is the 100 TB path where brute force is off the
    * table. Tuning: `nPlanes` sets bucket size (≈|corpus|/2^nPlanes),
    * `nTables` × probes buys recall with extra candidate volume. */
  def lshCosineTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      dim: Int, nPlanes: Int, k: Int, multiProbeBits: Int = 8,
      nTables: Int = 4): DataFrame = {
    val sigCorpus = corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .withColumn("tsig", explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"),
          hyperplaneSig(col("__v"), dim, nPlanes, t).as("sig"))): _*)))
      .select(col("id"), col("__v"), col("tsig.t").as("t"),
        col("tsig.sig").as("sig"))
    val qSig = queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__q"))
      .withColumn("tsig0", explode(array((0 until nTables).map(t =>
        struct(lit(t).as("t"),
          hyperplaneSig(col("__q"), dim, nPlanes, t).as("sig0"))): _*)))
      .select(col("query_id"), col("__q"), col("tsig0.t").as("t"),
        col("tsig0.sig0").as("sig0"))
    // probes drop the query vector: a candidate occurs once per (table,
    // probe) hit, so the dedup shuffle should carry only (query_id, id, __v)
    // — __q re-attaches after dedup via the broadcast query table, and the
    // exact cosine runs once per DISTINCT pair instead of per occurrence
    val probes = qSig.drop("__q").withColumn("sig",
      explode(array((col("sig0") +: (0 until multiProbeBits).map(b =>
        col("sig0").bitwiseXOR(lit(1L << b)))): _*)))
    val cands = sigCorpus.join(probes, Seq("t", "sig"))
      .select(col("query_id"), col("id"), col("__v"))
      .dropDuplicates("query_id", "id")
    val qVecs = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__q")))
    val scored = cands.join(qVecs, Seq("query_id"))
      .withColumn("cos", cosine(col("__v"), col("__q")))
      // arrays projected out before the per-query top-k exchange
      .select(col("query_id"), col("id"), col("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cos")
  }
}
