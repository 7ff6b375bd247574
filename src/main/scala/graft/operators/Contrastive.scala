package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CONTRASTIVE TRAINING-PAIR generation: (anchor, positive, hard
  * negative) triples for embedding-model training — positives are
  * near-duplicate document pairs (the MinHash family), the negative is
  * the corpus vector most similar to the anchor that is NOT the
  * positive (the hard-negative mining rule, here with the pair itself
  * excluded instead of a label).
  *
  * Scale shape: the positive-pair set is the near-dup yield — orders of
  * magnitude smaller than the corpus — so anchors broadcast and the
  * negative search is ONE corpus scan scored against the broadcast
  * anchor vectors (the cosine-topk posture; the non-equi exclusion join
  * is a broadcast nested loop over the BOUNDED anchor side, the
  * whitelisted cross-scoring shape). Similarity is an integer dot over
  * micro-quantized coordinates with smallest-id ties, so the triple set
  * is hash-exact. */
object Contrastive {

  def pairs(docs: DataFrame, docIdCol: String, textCol: String,
      emb: DataFrame, vecIdCol: String, vecCol: String,
      numHashes: Int, bands: Int, shingleSize: Int, minJaccard: Double)
      : DataFrame = {
    val pos = Dedup.minhashNearDupPairsKeyed(docs, docIdCol, textCol,
        numHashes, bands, shingleSize, minJaccard)
      .select(col("id_a").as("anchor"), col("id_b").as("positive"))
    val qv = emb.select(col(vecIdCol).as("vid"),
      Coreset.quantize(col(vecCol)).as("qv"))
    val anchors = pos
      .join(qv, pos("anchor") === qv("vid"))
      .select(col("anchor"), col("positive"), col("qv").as("aqv"))
    val scored = qv.join(broadcast(anchors),
        col("vid") =!= col("anchor") && col("vid") =!= col("positive"))
      .select(col("anchor"), col("positive"), col("vid"),
        aggregate(zip_with(col("qv"), col("aqv"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("dot"))
    val w = Window.partitionBy(col("anchor"), col("positive"))
      .orderBy(col("dot").desc, col("vid").asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("anchor"), col("positive"), col("vid").as("negative"),
        col("dot").as("neg_dot"))
  }
}
