package graft

import graft.functions.{JaccardSortedArrays, TextFeatures}
import graft.operators.{Ann, Dedup}
import org.apache.spark.sql.functions._

/** Recall of the approximate operators against brute-force ground truth at
  * sf0.001 (500 docs / 500 vectors — exact O(n²) is feasible here).
  * Precision is 1.0 by construction (both pipelines exact-verify); recall is
  * the only approximation, so it's the number worth pinning. */
class LshRecallSpec extends SparkSpec {
  import spark.implicits._

  test("MinHash-LSH recall = 1.0 on true Jaccard>=0.5 pairs (sf0.001)") {
    val docs = Tables.documents(spark, sfDir)
    val grams = docs.select(col("doc_id"), sort_array(
      TextFeatures.shingles(col("text"), 5)).as("g"))
    val truth = grams.as("a").join(grams.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", JaccardSortedArrays.jaccardSorted(
        col("a.g"), col("b.g")))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(truth), "precision must be exact (verified pairs)")
    val recall = if (truth.isEmpty) 1.0
      else lsh.intersect(truth).size.toDouble / truth.size
    info(s"truth pairs: ${truth.size}, lsh pairs: ${lsh.size}, recall: $recall")
    assert(recall >= 0.95, s"recall $recall below bound")
  }

  test("hyperplane-LSH ANN recall >= 0.5 vs brute force top-10 (sf0.001)") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Ann.cosineTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val approx = Ann.lshCosineTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding",
        dim = 64, nPlanes = 6, k = 10, multiProbeBits = 6)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    info(s"ANN recall@10: $recall (bucketed candidates: ${approx.size})")
    assert(recall >= 0.5, s"ANN recall $recall below bound")
    // the query vector itself must always be found (identical signature)
    (0L until 5L).foreach { q => assert(approx.contains((q, q))) }
  }
}
