package graft.queries

import graft.Tables
import graft.functions.TextFeatures
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch ASSEMBLY operators — the last hop between a curated
  * corpus and a trainer's data loader: concat-and-chunk sequence packing
  * into fixed context windows, length-bucketed batching with
  * padding-waste accounting, and temperature-scaled source mixing
  * (unigram^0.75-style allocation across sources). The reference
  * pipeline's analogue is its per-fixture collection batching
  * (`.github/workflows/football-data-pipeline.yml:190-210` groups
  * collection jobs into offset buckets); here the semantics are the
  * LLM-pipeline ones.
  *
  * Determinism: document order inside every packing/batching stream is
  * md5(doc_id) (layout-independent, reproducible on any cluster), all
  * arithmetic is non-negative integer (div ≡ // cross-engine), and the
  * ^0.75 temperature uses the proven floor(sqrt·sqrt∘sqrt) composition
  * (correctly-rounded IEEE in both engines, no libm pow).
  *
  * Scale shape: packing/bucketing are one window pass over a
  * source-partitioned (resp. bucket-partitioned) exchange plus bounded
  * re-aggregation — no joins, no corpus-sized state; mixing aggregates
  * to one row per source before anything global happens. */
object PackingQueries {

  private val ChunkTokens = 512L   // context-window budget (ws tokens)
  private val BucketWidth = 32L    // length-bucket width
  private val BatchDocs = 16L      // docs per padded batch

  /** SEQUENCE PACKING (concat-and-chunk): per source, documents are
    * concatenated in md5 order and the token stream is cut into
    * fixed-size chunks; the manifest reports, per chunk, the documents
    * STARTING there, their token mass, and how many straddle the chunk
    * boundary (the cross-document-attention accounting). */
  val qSeqPack = GQuery("q_seq_pack",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextFeatures.tokenCount(col("text")).cast("long").as("tok"))
        .filter(col("tok") > 0)
        .withColumn("ord",
          md5(concat(lit("pack:"), col("doc_id").cast("string"))))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("ord"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks.withColumn("cum", sum(col("tok")).over(w))
        .withColumn("chunk", expr(s"(cum - tok) div $ChunkTokens"))
        .withColumn("crosses",
          (expr(s"(cum - 1) div $ChunkTokens") > col("chunk"))
            .cast("long"))
        .groupBy(col("source"), col("chunk"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).cast("long").as("n_tokens"),
          sum(col("crosses")).cast("long").as("n_crossing"))
        .orderBy(col("source"), col("chunk"))
    },
    Some(s"""WITH tk AS (
        SELECT doc_id, source,
          len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> len(t) > 0)) AS tok,
          md5('pack:' || CAST(doc_id AS VARCHAR)) AS ord
        FROM documents),
      c AS (
        SELECT source, doc_id, tok,
          CAST(SUM(tok) OVER (PARTITION BY source ORDER BY ord, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum
        FROM tk WHERE tok > 0)
      SELECT source, (cum - tok) // $ChunkTokens AS chunk,
        COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS n_tokens,
        CAST(SUM(CASE WHEN (cum - 1) // $ChunkTokens
            > (cum - tok) // $ChunkTokens THEN 1 ELSE 0 END)
          AS BIGINT) AS n_crossing
      FROM c GROUP BY 1, 2 ORDER BY source, chunk"""),
    notes = s"concat-and-chunk packing at $ChunkTokens ws-tokens; " +
      "md5 stream order; one source-keyed window pass + bounded reagg")

  /** LENGTH-BUCKETED BATCHING: docs grouped into width-$BucketWidth
    * token-length buckets, batched $BatchDocs at a time in md5 order;
    * every batch pads to its own max length. Reports per bucket the
    * padded-token overhead — the quantity length bucketing exists to
    * minimize. */
  val qLenBucket = GQuery("q_len_bucket",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          TextFeatures.tokenCount(col("text")).cast("long").as("tok"))
        .filter(col("tok") > 0)
        .withColumn("bucket", expr(s"tok div $BucketWidth"))
        .withColumn("ord",
          md5(concat(lit("lb:"), col("doc_id").cast("string"))))
      val w = Window.partitionBy(col("bucket"))
        .orderBy(col("ord"), col("doc_id"))
      val batches = toks
        .withColumn("batch",
          expr(s"(cast(row_number() over (partition by bucket " +
            s"order by ord, doc_id) as bigint) - 1) div $BatchDocs"))
        .groupBy(col("bucket"), col("batch"))
        .agg(count(lit(1)).as("bn"), max(col("tok")).as("maxlen"),
          sum(col("tok")).cast("long").as("btoks"))
      batches.groupBy(col("bucket"))
        .agg(sum(col("bn")).cast("long").as("n_docs"),
          count(lit(1)).as("n_batches"),
          sum(col("btoks")).cast("long").as("n_tokens"),
          sum(col("maxlen") * col("bn")).cast("long").as("n_padded"))
        .withColumn("waste_x1000",
          expr("((n_padded - n_tokens) * 1000) div n_padded"))
        .orderBy(col("bucket"))
    },
    Some(s"""WITH tk AS (
        SELECT doc_id,
          len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> len(t) > 0)) AS tok,
          md5('lb:' || CAST(doc_id AS VARCHAR)) AS ord
        FROM documents),
      b AS (
        SELECT doc_id, tok, tok // $BucketWidth AS bucket, ord
        FROM tk WHERE tok > 0),
      rn AS (
        SELECT bucket, tok,
          (CAST(ROW_NUMBER() OVER (PARTITION BY bucket
            ORDER BY ord, doc_id) AS BIGINT) - 1) // $BatchDocs AS batch
        FROM b),
      bt AS (
        SELECT bucket, batch, COUNT(*) AS bn,
          MAX(tok) AS maxlen, CAST(SUM(tok) AS BIGINT) AS btoks
        FROM rn GROUP BY 1, 2),
      agg AS (
        SELECT bucket, CAST(SUM(bn) AS BIGINT) AS n_docs,
          COUNT(*) AS n_batches, CAST(SUM(btoks) AS BIGINT) AS n_tokens,
          CAST(SUM(maxlen * bn) AS BIGINT) AS n_padded
        FROM bt GROUP BY 1)
      SELECT bucket, n_docs, n_batches, n_tokens, n_padded,
        ((n_padded - n_tokens) * 1000) // n_padded AS waste_x1000
      FROM agg ORDER BY bucket"""),
    notes = s"width-$BucketWidth length buckets, $BatchDocs-doc batches " +
      "padded to batch max; waste ratio in exact integer permille")

  /** TEMPERATURE-SCALED SOURCE MIXING: per-source token masses are
    * raised to the 0.75 power (the word2vec/multilingual-sampling
    * temperature, exact via floor(sqrt(t)·sqrt(sqrt(t)))) and
    * normalized to a parts-per-million allocation — the sampling table
    * a mixture loader consumes. Upweights tail sources, provably
    * identically in both engines. */
  val qMixAlloc = GQuery("q_mix_alloc",
    (s, d) => {
      val bySrc = Tables.documents(s, d)
        .select(col("source"),
          TextFeatures.tokenCount(col("text")).cast("long").as("tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).cast("long").as("n_tokens"))
        .withColumn("w",
          floor(sqrt(col("n_tokens")) * sqrt(sqrt(col("n_tokens"))))
            .cast("long"))
      bySrc
        .withColumn("tw", sum(col("w")).over(
          Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("alloc_ppm", expr("(w * 1000000) div tw"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("w"), col("alloc_ppm"))
        .orderBy(col("source"))
    },
    Some("""WITH tk AS (
        SELECT source,
          len(list_filter(string_split_regex(trim(text), '\s+'),
            t -> len(t) > 0)) AS tok
        FROM documents),
      src AS (
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(tok) AS BIGINT) AS n_tokens
        FROM tk GROUP BY 1),
      w AS (
        SELECT source, n_docs, n_tokens,
          CAST(floor(sqrt(n_tokens) * sqrt(sqrt(n_tokens)))
            AS BIGINT) AS w
        FROM src),
      t AS (
        SELECT source, n_docs, n_tokens, w,
          CAST(SUM(w) OVER () AS BIGINT) AS tw
        FROM w)
      SELECT source, n_docs, n_tokens, w,
        (w * 1000000) // tw AS alloc_ppm
      FROM t ORDER BY source"""),
    notes = "t^0.75 temperature mixing over sources; " +
      "floor(sqrt*sqrt(sqrt)) exact IEEE composition; ppm allocation")

  /** BUDGET-CONSTRAINED CORPUS SELECTION: threshold data selection
    * under a token budget — docs are scored by English-stopword density
    * (the integer-permille naturalness proxy the curation family
    * already uses) and the engine picks the highest score THRESHOLD
    * whose kept classes fit a budget of 60% of corpus tokens. The
    * report is the per-source selection profile (what the budget kept
    * vs dropped) — the corpus-design view a data-mixing decision reads.
    *
    * Scale shape: one fused text-stats corpus pass → a ≤1001-row score
    * class table (all windows run THERE, never over the corpus) → a
    * 1-row threshold broadcast back onto the doc stream → bounded
    * per-source reagg. Thresholds — not per-doc greedy cuts — are how
    * selection actually ships at 100 TB (no global sort anywhere), and
    * the integer class arithmetic makes the cut bit-reproducible. */
  val qBudgetSelect = GQuery("q_budget_select",
    (s, d) => {
      val st = graft.functions.TextStatsExpr.textStats(col("text"))
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          st.getField("n_tokens").cast("long").as("tok"),
          st.getField("stop_en").cast("long").as("stp"))
        .filter(col("tok") > 0)
        .withColumn("ratio_x1000", expr("(stp * 1000) div tok"))
      val classes = toks.groupBy(col("ratio_x1000"))
        .agg(sum(col("tok")).cast("long").as("ctok"))
      // windows over the BOUNDED class table only (<= 1001 rows)
      val wDesc = Window.orderBy(col("ratio_x1000").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val cut = classes
        .withColumn("cum", sum(col("ctok")).over(wDesc))
        .withColumn("total", sum(col("ctok")).over(wAll))
        .filter(col("cum") <= expr("(total * 6) div 10"))
        .agg(coalesce(min(col("ratio_x1000")), lit(1001L)).as("rcut"))
      toks.crossJoin(broadcast(cut))
        .withColumn("sel",
          (col("ratio_x1000") >= col("rcut")).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("sel")).cast("long").as("n_selected"),
          sum(col("tok")).cast("long").as("tokens_total"),
          sum(col("sel") * col("tok")).cast("long")
            .as("tokens_selected"))
        .orderBy(col("source"))
    },
    Some {
      val stop = TextFeatures.enStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH tk AS (
        SELECT doc_id, source,
          len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> len(t) > 0)) AS tok,
          len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> len(t) > 0 AND lower(t) IN ($stop))) AS stp
        FROM documents),
      r AS (
        SELECT doc_id, source, tok, (stp * 1000) // tok AS ratio_x1000
        FROM tk WHERE tok > 0),
      cls AS (
        SELECT ratio_x1000, CAST(SUM(tok) AS BIGINT) AS ctok
        FROM r GROUP BY 1),
      cw AS (
        SELECT ratio_x1000,
          CAST(SUM(ctok) OVER (ORDER BY ratio_x1000 DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum,
          CAST(SUM(ctok) OVER () AS BIGINT) AS total
        FROM cls),
      cut AS (
        SELECT COALESCE(MIN(ratio_x1000), 1001) AS rcut
        FROM cw WHERE cum <= (total * 6) // 10),
      s AS (
        SELECT source, tok,
          CASE WHEN ratio_x1000 >= cut.rcut THEN 1 ELSE 0 END AS sel
        FROM r, cut)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(sel) AS BIGINT) AS n_selected,
        CAST(SUM(tok) AS BIGINT) AS tokens_total,
        CAST(SUM(sel * tok) AS BIGINT) AS tokens_selected
      FROM s GROUP BY 1 ORDER BY source""" },
    notes = "60%-token-budget threshold selection by integer stopword " +
      "permille class; all windows on the <=1001-row class table, " +
      "1-row threshold broadcast; per-source selection profile")

  val all: Seq[GQuery] =
    Seq(qSeqPack, qLenBucket, qMixAlloc, qBudgetSelect)
}
