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

  /** WORD2VEC-STYLE NEGATIVE SAMPLING (Mikolov et al. 2013): for every
    * (doc, position, center-word) instance, draw `k` negatives from the
    * unigram distribution raised to the 3/4 power — the smoothing that
    * up-weights rare words just enough to make their embeddings train.
    * Every draw is md5-DETERMINISTIC (fold of md5(doc:pos:i) mod total
    * weight → inverse-CDF range lookup), so the negative table — like
    * the corpus itself — is bit-reproducible on any layout or retry.
    *
    * Exactness note: c^{3/4} is realized as floor(sqrt(c)·sqrt(sqrt(c)))
    * — both sqrts and the product are correctly-rounded IEEE in Spark
    * and DuckDB, so the weight table is cross-engine identical without
    * libm pow. A draw may equal the center word (classic samplers
    * resample; this one keeps it — a fixed, documented contract).
    *
    * Scale shape: the vocabulary (Heaps-bounded) builds once from one
    * explode+agg; cumulative ranges come from one bounded-vocab window;
    * the inverse-CDF lookup is a BROADCAST range join of draws against
    * that bounded table (the whitelisted non-equi shape). Corpus cost
    * is one tokenize pass emitting k draws per token. Output:
    * (doc_id, pos, center, i, neg). */
  def negativeSamples(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, salt: String = "neg",
      docFilter: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    require(k >= 1 && k <= 16)
    def hexVal(c: org.apache.spark.sql.Column) =
      when(c >= 97, c - 87).otherwise(c - 48)
    val toks = filter(split(trim(col(textCol)), "\\s+"),
      t => length(t) > 0)
    val inst = docs.select(col(idCol).as("doc_id"),
      posexplode(toks).as(Seq("pos", "center")))
    val vocabW = Window.orderBy(col("w_tok"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val vocab = inst.groupBy(col("center").as("w_tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("w",
        floor(sqrt(col("c")) * sqrt(sqrt(col("c")))).cast("long"))
      .withColumn("lo", coalesce(sum(col("w")).over(vocabW), lit(0L)))
      .withColumn("hi", col("lo") + col("w"))
      .localCheckpoint(true) // bounded; total + lookup reuse it
    val total = vocab.agg(sum(col("w")).as("tw"))
    // vocabulary/weights come from the FULL corpus; the filter (a gate
    // or sampling policy) restricts only which instances draw negatives
    val draws = inst.filter(docFilter)
      .select(col("doc_id"), col("pos"), col("center"),
        explode(sequence(lit(1), lit(k))).as("i"))
      .withColumn("hh", md5(concat(lit(salt), lit(":"),
        col("doc_id").cast("string"), lit(":"),
        col("pos").cast("string"), lit(":"), col("i").cast("string"))))
      .withColumn("v", (1 to 12).map { j =>
        hexVal(ascii(substring(col("hh"), j, 1))).cast("long") *
          lit(BigInt(16).pow(12 - j).toLong)
      }.reduce(_ + _))
      .crossJoin(broadcast(total))
      .withColumn("r", expr("v % tw"))
    draws.join(broadcast(vocab),
        col("r") >= col("lo") && col("r") < col("hi"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("center"), col("i").cast("long").as("i"),
        col("w_tok").as("neg"))
      .orderBy(col("doc_id"), col("pos"), col("i"))
  }
}
