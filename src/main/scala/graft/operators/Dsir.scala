package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): score every raw
  * document by how target-like its hashed bag-of-words is under two
  * unigram bucket models, then keep the top-k — the
  * domain-targeted-selection step of LLM data curation (select
  * web-scale raw text that looks like the curated target corpus).
  *
  *   weight(doc) = Σ_{tokens t} [ log p_target(bucket(t))
  *                              − log p_raw(bucket(t)) ]
  *
  * realized integer-exact: buckets come from two md5 hex digits
  * (identical bytes in any engine), counts get add-one smoothing, and
  * the log-ratio is the engine's 1/64-bit fixed-point log₂
  * ([[NaiveBayes.lg64]]) of the cross-product form
  * `lg64(ct·Nr) − lg64(cr·Nt)` — no libm, no doubles, so ranking AND
  * weights sit under the hash-exact oracle gate.
  *
  * Scale shape: two corpus scans — one explode into the bucket-model
  * aggregation (output `nBuckets`-bounded), one explode into the
  * per-doc scoring join (the λ table broadcast — it IS the model,
  * bounded by construction; recomputing the explode beats caching a
  * corpus-sized token frame). Re-aggregation per doc is the only
  * corpus-keyed shuffle. Top-k is a TakeOrderedAndProject. At 100 TB
  * the target side is typically a separate small curated corpus — the
  * same plan with the model trained on it and ONE raw scan total; here
  * target membership is a column predicate so the whole computation is
  * self-contained and twin-able.
  */
object Dsir {

  private def toks(t: Column): Column =
    filter(split(lower(trim(t)), "\\s+"), x => x =!= lit(""))

  private def hexVal(c: Column): Column =
    when(c >= 97, c - 87).otherwise(c - 48)

  /** Bucket = (first md5 hex digit × 16 + second) mod nBuckets —
    * byte-identical in DuckDB (`md5` of the same UTF-8, `ascii` of the
    * same lowercase hex chars). */
  private[graft] def bucketOf(word: Column, nBuckets: Int): Column = {
    val m = md5(word)
    val v1 = hexVal(ascii(substring(m, 1, 1)))
    val v2 = hexVal(ascii(substring(m, 2, 1)))
    ((v1 * 16 + v2) % nBuckets).cast("long")
  }

  /** Top-k raw documents by fixed-point importance weight toward the
    * rows where `isTarget` holds. Output: (rank, doc_id, n_tokens,
    * weight64). */
  def topKByImportance(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int = 128, k: Int = 50): DataFrame = {
    val inst = df
      .select(col(idCol).as("doc_id"), isTarget.as("tgt"),
        explode(toks(col(textCol))).as("w"))
      .withColumn("b", bucketOf(col("w"), nBuckets))
    val bucketCounts = inst.groupBy(col("b"))
      .agg((sum(when(col("tgt"), 1L).otherwise(0L)) + 1L).as("ct"),
        (count(lit(1)) + 1L).as("cr"))
    val totals = bucketCounts
      .agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val lam = bucketCounts.crossJoin(broadcast(totals))
      .withColumn("lam",
        NaiveBayes.lg64(col("ct") * col("nr")) -
          NaiveBayes.lg64(col("cr") * col("nt")))
      .select(col("b"), col("lam"))
    val weights = inst.join(broadcast(lam), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("lam")).as("weight64"),
        count(lit(1)).as("n_tokens"))
    val top = weights.orderBy(desc("weight64"), asc("doc_id")).limit(k)
    val w = Window.orderBy(desc("weight64"), asc("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_tokens"),
        col("weight64"))
  }

  /** DuckDB twin of [[topKByImportance]] on the `documents` table with
    * target predicate `tgtSql` (over `documents` columns). */
  def sqlTopKByImportance(tgtSql: String, nBuckets: Int = 128,
      k: Int = 50): String = {
    def hv(i: Int) =
      s"""(CASE WHEN ascii(substr(md5(w), $i, 1)) >= 97
         THEN ascii(substr(md5(w), $i, 1)) - 87
         ELSE ascii(substr(md5(w), $i, 1)) - 48 END)"""
    val chain1 = NaiveBayes.sqlLg64Chain(
      "j", "pn", Seq("b", "ct", "cr", "pn", "qn"), "lpc", "lp")
    val chain2 = NaiveBayes.sqlLg64Chain(
      "lpc", "qn", Seq("b", "ct", "cr", "pn", "qn", "lp"), "lqc", "lq")
    s"""WITH inst AS (
      SELECT doc_id, ($tgtSql) AS tgt,
        unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
          w -> len(w) > 0)) AS w
      FROM documents),
    bi AS (
      SELECT doc_id, tgt,
        ((${hv(1)} * 16 + ${hv(2)}) % $nBuckets) AS b
      FROM inst),
    bc AS (
      SELECT b, SUM(CASE WHEN tgt THEN 1 ELSE 0 END) + 1 AS ct,
        COUNT(*) + 1 AS cr
      FROM bi GROUP BY b),
    tt AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM bc),
    j AS (SELECT b, ct, cr, ct * nr AS pn, cr * nt AS qn FROM bc, tt),
    $chain1,
    $chain2,
    lam AS (SELECT b, lp - lq AS lam FROM lqc),
    wts AS (
      SELECT bi.doc_id, SUM(lam.lam) AS weight64, COUNT(*) AS n_tokens
      FROM bi JOIN lam ON bi.b = lam.b GROUP BY 1)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY weight64 DESC, doc_id)
        AS BIGINT) AS rank,
      doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
      CAST(weight64 AS BIGINT) AS weight64
    FROM wts ORDER BY weight64 DESC, doc_id LIMIT $k"""
  }

  /** FEATURE HASHING (the "hashing trick", Weinberger et al. 2009):
    * each document becomes a FIXED-width signed bag-of-words vector —
    * bucket = two md5 nibbles mod `nBuckets`, sign = third-nibble
    * parity — so the feature space is independent of vocabulary size
    * (no vocab table to build, broadcast, or keep consistent across
    * training runs; new words at 100 TB never change the schema). The
    * random sign makes collision noise zero-mean (E[⟨φ(x),φ(y)⟩] =
    * ⟨x,y⟩), which is why hashed features train linear models almost
    * as well as exact ones. md5-derived bucket AND sign are properties
    * of the token bytes, so the vectors are bit-identical on any
    * engine or layout. One explode + one map-side-combined agg
    * (`nBuckets` longs of state per doc); no join, no vocab state. */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 12): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 64)
    val tok = df.select(col(idCol).as("doc_id"),
      explode(toks(col(textCol))).as("w"))
    val m = md5(col("w"))
    val signed = tok
      .withColumn("b", bucketOf(col("w"), nBuckets))
      .withColumn("sgn",
        when(hexVal(ascii(substring(m, 3, 1))) % 2 === 0, 1L)
          .otherwise(-1L))
    signed.groupBy(col("doc_id"))
      .agg(sum(when(col("b") === 0, col("sgn")).otherwise(0L)).as("f0"),
        (1 until nBuckets).map(i =>
          sum(when(col("b") === i, col("sgn")).otherwise(0L))
            .as(s"f$i")): _*)
      .orderBy(col("doc_id"))
  }
}
