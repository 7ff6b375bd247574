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

  test("auto-derived LSH config: recall >= 0.9 at <= 15% candidates on clustered data") {
    // corpus WITH locality: 40 clusters of 10 members (base + small noise →
    // within-cluster cos ≈ 0.95). This is the regime ANN is for; the tuner
    // must hit the 0.9-recall / 15%-candidates target here.
    val rnd = new scala.util.Random(42)
    val dim = 64
    def noisy(base: Array[Float]): Seq[Float] =
      base.map(x => x + 0.03f * rnd.nextGaussian().toFloat).toSeq
    val vecs = (0 until 40).flatMap { c =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val norm = math.sqrt(base.map(x => x * x).sum).toFloat
      val unit = base.map(_ / norm)
      (0 until 10).map(m => (c * 10L + m, noisy(unit)))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 50)
    val exactDf = Ann.cosineTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .select("query_id", "id", "cos")
      .as[(Long, Long, Double)].collect()
    val exact = exactDf.map(r => (r._1, r._2)).toSet
    // corpus stat driving the tuner: the weakest neighbor that must be found
    val neighborCos = exactDf.map(_._3).min
    val cfg = Ann.deriveLshConfig(neighborCos,
      targetRecall = 0.9, maxCandidateFraction = 0.15)
    info(s"neighborCos=$neighborCos derived=$cfg")
    assert(cfg.predictedRecall >= 0.9)
    assert(cfg.predictedCandidateFraction <= 0.15)
    val cands = Ann.lshCandidates(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", dim, cfg.nPlanes,
        cfg.multiProbeBits, cfg.nTables)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val frac = cands.size.toDouble / (vecs.size * 5)
    val recall = cands.intersect(exact).size.toDouble / exact.size
    info(s"clustered recall@5: $recall, candidate fraction: $frac")
    assert(recall >= 0.9, s"recall $recall below 0.9")
    assert(frac <= 0.15, s"candidate fraction $frac above 0.15")
  }

  test("IVF ANN: recall >= 0.9 at <= 15% candidates on clustered data") {
    // same clustered corpus construction as the LSH test: IVF's coarse
    // quantizer should recover the clusters and route queries to them
    val rnd = new scala.util.Random(7)
    val dim = 64
    val vecs = (0 until 40).flatMap { c =>
      val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(base.map(x => x * x).sum).toFloat
      val unit = base.map(_ / n)
      (0 until 10).map(m => (c * 10L + m,
        unit.map(x => x + 0.03f * rnd.nextGaussian().toFloat).toSeq))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 10 === 0 && col("vec_id") < 50)
    val exact = Ann.cosineTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val centroids = Ann.trainIvfCentroids(emb, "vec_id", "embedding",
      k = 40, sampleMod = 2, iters = 8)
    val approx = Ann.ivfCosineTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", centroids, nProbe = 4, k = 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    // candidate fraction ≈ nProbe/k = 10% on balanced clusters
    info(s"IVF clustered recall@5: $recall")
    assert(recall >= 0.9, s"IVF recall $recall below 0.9")
    // each query's own vector must be found (it sits in its home bucket)
    (0 until 5).foreach { q => assert(approx.contains((q * 10L, q * 10L))) }
  }

  test("hyperplane-LSH ANN on sf0.001 embeddings (weak-locality corpus)") {
    // The synthetic embeddings have nearly NO neighbor structure: true
    // top-10 sits at cos ≈ 0.25–0.39 vs median 0 (per-plane agreement
    // ≈ 0.6), so 0.9 recall within a 15% candidate budget is geometrically
    // impossible for any hyperplane-LSH config — the tuner then maximizes
    // recall inside a relaxed budget. Pin the achieved operating point.
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    val exactDf = Ann.cosineTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
      .select("query_id", "id", "cos")
      .as[(Long, Long, Double)].collect()
    val exact = exactDf.map(r => (r._1, r._2)).toSet
    val neighborCos = exactDf.map(_._3).min
    val cfg = Ann.deriveLshConfig(neighborCos,
      targetRecall = 0.9, maxCandidateFraction = 0.6)
    info(s"neighborCos=$neighborCos derived=$cfg")
    val n = emb.count()
    val cands = Ann.lshCandidates(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", 64, cfg.nPlanes,
        cfg.multiProbeBits, cfg.nTables)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val frac = cands.size.toDouble / (n * 5)
    val recall = cands.intersect(exact).size.toDouble / exact.size
    info(s"sf0.001 recall@10: $recall, candidate fraction: $frac")
    assert(recall >= 0.9, s"recall $recall below 0.9")
    assert(frac <= 0.7, s"candidate fraction $frac above 0.7")
    // the query vector itself must always be found (identical signature)
    val approx = Ann.lshCosineTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding",
        dim = 64, nPlanes = cfg.nPlanes, k = 10,
        multiProbeBits = cfg.multiProbeBits, nTables = cfg.nTables)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { q => assert(approx.contains((q, q))) }
  }
}
