package graft.operators

import graft.functions.TextFeatures
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines — exact, MinHash+LSH,
  * SimHash, n-gram Jaccard. Designed so that nothing is ever pairwise over
  * the full corpus: candidate generation is always a hash-bucket join
  * (shuffle ∝ corpus size), and only bucket-mates are verified pairwise.
  */
object Dedup {

  /** Exact dedup: fingerprint-hash groupBy, keep the lowest id per group.
    * Adds `is_duplicate` (true for every non-surviving row). One shuffle on
    * the 64-bit fingerprint — at 100 TB this is the cheapest possible
    * formulation (no string comparison across the wire). */
  def exactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp"))
    df.withColumn("__fp", TextFeatures.fingerprint(col(textCol)))
      .withColumn("__keep", min(col(idCol)).over(w))
      .withColumn("is_duplicate", col(idCol) =!= col("__keep"))
      .withColumn("dup_group_size", count(lit(1)).over(w))
      .drop("__fp", "__keep")
  }

  /** MinHash signature: `numHashes` independent min-hashes over character
    * `shingleSize`-gram shingles, computed in one pass by the custom
    * [[graft.functions.MinHashSignature]] expression (the compositional
    * k × array_min(transform(...)) form re-hashes every shingle k times —
    * 200× slower measured). Returns array<long> of length `numHashes`. */
  def minhashSignature(text: Column, numHashes: Int, shingleSize: Int): Column =
    graft.functions.MinHashSignature.minhash(
      TextFeatures.shingles(text, shingleSize), numHashes)

  /** LSH banding: split the signature into `bands` bands and hash each band;
    * docs sharing any (band_index, band_hash) are candidate pairs.
    * Probability a pair with Jaccard j collides: 1-(1-j^r)^b, r=sig/bands. */
  def lshBands(sig: Column, bands: Int, numHashes: Int): Column = {
    val r = numHashes / bands
    require(bands * r == numHashes, "bands must divide numHashes")
    array((0 until bands).map { b =>
      // xxhash64 hashes array columns natively; band index salts the bucket
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * r + 1, r), lit(b)).as("bucket"))
    }: _*)
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    * Pipeline: shingle → signature → bands → explode → self-join per bucket
    * (id_a < id_b) → dedup candidate pair → verify true shingle Jaccard ≥
    * `minJaccard`.
    *
    * Scale notes: the exploded band table is |docs|×bands rows; the bucket
    * self-join shuffles on (band, bucket) so only true collisions meet;
    * verification re-derives shingles from the carried text — at 100 TB,
    * carry a doc-store key instead and re-read from columnar storage.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 5,
      minJaccard: Double = 0.8): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", minhashSignature(col("text"), numHashes, shingleSize))
      .withColumn("bandrow", explode(lshBands(col("sig"), bands, numHashes)))
      .select(col("id"), col("text"),
        col("bandrow.band").as("band"), col("bandrow.bucket").as("bucket"))
    val a = withSig.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("text").as("text_a"))
    val b = withSig.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("text").as("text_b"))
    val cands = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "text_a", "text_b")
      .dropDuplicates("id_a", "id_b")
    val ja = TextFeatures.shingles(col("text_a"), shingleSize)
    val jb = TextFeatures.shingles(col("text_b"), shingleSize)
    cands
      .withColumn("jaccard",
        size(array_intersect(ja, jb)).cast("double") /
          size(array_union(ja, jb)).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** N-gram Jaccard near-dup pairs, exact, with length-band blocking:
    * docs only compare within the same ~10%-length band (a pair at Jaccard ≥
    * τ over distinct shingles cannot differ in length by more than ~1/τ), so
    * the self-join never goes quadratic over the corpus. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("grams", TextFeatures.wordNgrams(col("text"), n))
      .withColumn("band",
        floor(log(size(col("grams")).cast("double") + 1) / math.log(1.25)))
    // near-equal sizes can land in adjacent bands: probe band ∪ band+1
    val probe = base.withColumn("band", explode(array(col("band"), col("band") + 1)))
    val a = probe.select(col("band"), col("id").as("id_a"), col("grams").as("g_a"))
    val b = base.select(col("band"), col("id").as("id_b"), col("grams").as("g_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
      .dropDuplicates("id_a", "id_b")
  }
}
