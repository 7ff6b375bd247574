package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction — the retrieval-side primitive of a text
  * pipeline (BM25-style search, contamination lookup, citation tracing all
  * start from term → postings). The reference keeps per-team/bookmaker
  * lookup dicts in memory (`/root/reference/enhanced_mapping.py:109-192`);
  * this is the corpus-scale generalization: term statistics plus a bounded
  * posting sample per term.
  */
object Index {

  /** Build an inverted index over whitespace tokens: per term, the
    * document frequency `df`, collection frequency `cf`, and the first
    * `maxPostings` postings in doc-id order rendered `"doc:tf,..."`.
    * Terms with `df < minDf` are pruned (hapax noise).
    *
    * Scale shape: ONE corpus explode → (doc, term) tf groupBy (map-side
    * partial combine eats per-doc duplicates), then ONE term groupBy that
    * computes df, cf, AND the capped posting sample together — the sample
    * via [[graft.functions.PostingsAgg]], a bounded typed Aggregator whose
    * map-side partials ship ≤ maxPostings entries per term per partition.
    * That bound is the load-bearing choice: a window-rank cap would route
    * a stopword's ENTIRE corpus-scale posting set through one partition
    * (skewed straggler), while here the term shuffle is ∝ vocab·k no
    * matter how skewed df is. At production scale the full (uncapped)
    * posting file would be written as doc-id-sorted shards instead —
    * this operator is the stats + head-sample view of it. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 2L, maxPostings: Int = 20): DataFrame = {
    val tf = df.select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    val postAgg = udaf(new graft.functions.PostingsAgg(maxPostings))
    tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        postAgg(col("doc_id"), col("tf")).as("postings"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"), col("cf"), col("postings"))
  }

  /** Multi-term keyword retrieval: documents ranked by
    * `Σ_terms tf · ((N·10⁶) div df)` — TF-IDF with a RATIONAL idf under
    * integer floor division, so each per-term weight, each contribution,
    * and the summed score are exact integers, bit-identical in any engine
    * (BM25's log-idf ranks the same way but libm's log is not
    * cross-engine reproducible). The 10⁶ scale keeps idf resolution when
    * df ≈ N. Scores accumulate in DECIMAL(38,0) — tf·w can exceed int64 at
    * corpus scale (N=10¹⁰ → w≈10¹⁶, tf≈10³) — but the RESULT column is
    * BIGINT: a top-k score that genuinely overflowed int64 would mean
    * N·10⁶·tf > 9·10¹⁸, i.e. beyond any real corpus, and a bigint output
    * hashes identically across engines where decimal128 representations
    * do not (pyarrow Decimal vs DuckDB float64 — the one round-5 gate
    * failure was exactly this).
    *
    * Scale shape: the term filter lands BEFORE the tf groupBy, so the
    * shuffle carries only query-term postings (∝ Σ df of the query terms,
    * not the corpus); term weights derive from that same tiny table and
    * BROADCAST back onto it; corpus size N rides in as a 1-row broadcast.
    * Top-k is a distributed TakeOrderedAndProject. */
  def keywordSearch(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 50): DataFrame = {
    val tf = df.select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf")).cache()
    val n = df.agg(count(lit(1)).as("n"))
    val weights = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("term"), expr("(n * 1000000) div df").as("w"))
    val scored = tf.join(broadcast(weights), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf").cast("decimal(38,0)") *
        col("w").cast("decimal(38,0)")).cast("long").as("score"))
    val top = scored.orderBy(desc("score"), asc("doc_id")).limit(k)
    val w = Window.orderBy(desc("score"), asc("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("score"))
  }

  /** BM25 retrieval (k1 = 1.2, b = 0.75) in EXACT INTEGER arithmetic.
    * The real BM25 term score
    * `idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))`, with avgdl = T/N
    * (T = corpus token count, N = docs), clears to the single fraction
    * `idf · 44·tf·T / (20·tf·T + 6·T + 18·dl·N)` at these k1/b — every
    * quantity an integer. The contribution is materialized as
    * `idf · ((44·tf·T·10³) div D)`: one integer floor division per
    * (doc, term), so tf SATURATION and LENGTH NORMALIZATION — the two
    * things that separate BM25 from TF-IDF — are both present, and the
    * summed score is an exact int64, bit-identical in any engine (libm's
    * log-idf is not; the 10³ scale bounds the per-term quantization at
    * one part in ~44·tf·10³). idf is [[keywordSearch]]'s rational
    * `(N·10⁶) div df`.
    *
    * Int64 headroom at bench scale: 44·tf·T·10³ ≤ 2²⁶·T and
    * idf·contrib ≤ N·10⁶·44·10³ — both far under 2⁶³ for T ≤ 10¹⁰.
    * At true 100 TB corpus sizes (T ≈ 10¹⁴) the two products move to
    * DECIMAL(38,0) unchanged; the div and the final int64 score survive.
    *
    * Scale shape: identical to [[keywordSearch]] — the term filter lands
    * before the tf shuffle (per-doc length rides the SAME aggregation:
    * dl is functionally dependent on doc_id, so grouping by both adds no
    * rows); the per-term weight table and the 1-row (N, T) corpus stats
    * broadcast back onto it; top-k is a distributed
    * TakeOrderedAndProject. */
  def bm25Search(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 50): DataFrame = {
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= lit(""))
    val docs = df.select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
    val tf = docs.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf")).cache()
    val stats = df.select(toks.as("__toks"))
      .agg(count(lit(1)).as("n"), sum(size(col("__toks"))).as("t"))
    val weights = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"), col("n"), col("t"),
        expr("(n * 1000000) div df").as("idf"))
    val scored = tf.join(broadcast(weights), Seq("term"))
      .withColumn("__d", lit(20L) * col("tf") * col("t")
        + lit(6L) * col("t") + lit(18L) * col("dl") * col("n"))
      .withColumn("__contrib", col("idf") *
        expr("(44 * tf * t * 1000) div __d"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__contrib")).as("score"))
    val top = scored.orderBy(desc("score"), asc("doc_id")).limit(k)
    val w = Window.orderBy(desc("score"), asc("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("score"))
  }

  /** Collocation mining: adjacent token pairs ranked by the PMI-monotone
    * lift `c_ab / (c_a · c_b)`. Full PMI is `log(c_ab·N²/(Np·c_a·c_b))`,
    * but for a FIXED corpus the `N²/Np` factor and the log are both
    * strictly monotone, so ranking by `c_ab/(c_a·c_b)` ranks identically —
    * and that score is one IEEE double multiply + one divide of exact
    * integers (counts < 2⁵³), correctly rounded and bit-identical in every
    * engine, where libm's log would not be. Pairs below `minCount` are
    * dropped (PMI is noise on rare pairs), top `k` kept.
    *
    * Scale shape: pairs from ONE map-side tail-zip of each doc's token
    * array (never a token self-join, same as [[Salience.pairCounts]]);
    * unigram counts from one explode+groupBy. Both joins BROADCAST the
    * unigram table — a vocabulary is bounded regardless of corpus size.
    * Top-k is a distributed TakeOrderedAndProject; rank is numbered on
    * the ≤k survivors only. */
  def collocations(df: DataFrame, textCol: String,
      minCount: Long = 5L, k: Int = 100): DataFrame = {
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= lit(""))
    val pairs = df
      .select(explode(zip_with(slice(toks, 1, Int.MaxValue - 1),
        slice(toks, 2, Int.MaxValue - 1),
        (a, b) => struct(a.as("t1"), b.as("t2")))).as("p"))
      .filter(col("p.t2").isNotNull)
      .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val uni = df.select(explode(toks).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val scored = pairs
      .join(broadcast(uni.select(col("term").as("t1"), col("c").as("c_a"))),
        Seq("t1"))
      .join(broadcast(uni.select(col("term").as("t2"), col("c").as("c_b"))),
        Seq("t2"))
      .withColumn("lift", col("c_ab").cast("double") /
        (col("c_a").cast("double") * col("c_b").cast("double")))
    val top = scored
      .orderBy(desc("lift"), asc("t1"), asc("t2")).limit(k)
    val w = Window.orderBy(desc("lift"), asc("t1"), asc("t2"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("t1"), col("t2"), col("c_ab"),
        col("c_a"), col("c_b"), col("lift"))
  }

  /** TYPO-PAIR MINING (SymSpell's deletion-neighborhood blocking):
    * find all vocabulary term pairs within edit distance 1 WITHOUT an
    * all-pairs scan — each term emits itself plus its |t| one-deletion
    * variants; any two terms at distance ≤ 1 must share a variant
    * (substitution: both delete the differing position; indel: the
    * shorter term IS a deletion of the longer), so candidates come
    * from one equi-join on the variant string with FULL recall at
    * distance 1. `levenshtein` (identical semantics cross-engine)
    * verifies candidates exactly. The normalize-noisy-vocabulary step
    * of text curation (OCR/typo collapse, spell-correction tables).
    *
    * Scale shape: the vocabulary is corpus-bounded (one explode +
    * groupBy); the variant fan-out is Σ|t|+1 over the vocab — still
    * vocabulary-scale, never corpus-scale; the variant join is the
    * only candidate-generation shuffle. minCount prunes hapax noise
    * BEFORE the fan-out. Output: (term_a, term_b, freq_a, freq_b),
    * term-ordered. */
  def typoPairs(df: DataFrame, textCol: String, minCount: Long,
      minLen: Int): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => t =!= lit(""))
    val vocab = df.select(explode(toks).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount && length(col("term")) >= minLen)
    val variants = vocab.select(col("term"), col("freq"),
      explode(concat(array(col("term")),
        expr("transform(sequence(0, length(term) - 1)," +
          " i -> concat(substr(term, 1, i), substr(term, i + 2)))")))
        .as("v"))
    val a = variants.select(col("v"), col("term").as("term_a"),
      col("freq").as("freq_a"))
    val b = variants.select(col("v"), col("term").as("term_b"),
      col("freq").as("freq_b"))
    a.join(b, Seq("v")).filter(col("term_a") < col("term_b"))
      .select(col("term_a"), col("term_b"), col("freq_a"), col("freq_b"))
      .distinct()
      .filter(levenshtein(col("term_a"), col("term_b")) <= 1)
      .orderBy(col("term_a"), col("term_b"))
  }

  /** RECIPROCAL-RANK FUSION of a lexical and a semantic ranking — the
    * hybrid-retrieval combiner (Cormack et al. 2009; the standard
    * BM25 + dense-vector serving shape). Takes two (rank, doc) top-n
    * frames and emits the fused top-k where
    * `rrf = Σ ⌊scale / (kConst + rank)⌋` over the rankings that
    * contain the doc — pure integer arithmetic (the canonical 1/(60+r)
    * at ×10⁶ fixed point), so fused scores AND order are hash-exact.
    *
    * Scale shape: both inputs are top-n bounded by construction (the
    * heavy retrieval work is inside BM25 / ANN, each separately
    * scale-audited); the fusion is a broadcast full-outer join of two
    * ≤n-row frames, then a ≤2n-row sort — driver-free, corpus-free. */
  /** SPARSE TF-IDF COSINE self-join (all-pairs document similarity over
    * the LEXICAL space — the token-level complement of the embedding
    * near-dup family): weights w = tf · (lg64(N) − lg64(df)) in exact
    * fixed point, pairs generated ONLY through the inverted index
    * (token-keyed join of postings), partial dot products summed per
    * pair. The df cap is the load-bearing scale bound: a token kept in
    * the index fans out ≤ maxDf² pairs, so stopwords (the corpus-scale
    * posting lists) never enter the join — the classic SSJ pruning. The
    * cosine itself is 3 IEEE ops on exact integers (cast, ×, sqrt,
    * divide — identical order both engines), so even the double column
    * hash-matches. Output: top-`k` pairs (id_a, id_b, n_shared, dot,
    * cos), cos-descending. */
  def sparseCosineTopK(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long, k: Int): DataFrame = {
    import graft.operators.NaiveBayes.lg64
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(filter(split(lower(trim(col(textCol))), "\\s+"),
          t => length(t) > 0)).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    // idf on the bounded vocab table; the 1-row total rides a broadcast
    // cross join (the q_tfidf_topk shape)
    // scale-aware df cap: the literal floor keeps the gate scale
    // non-vacuous, the n_docs/10 arm keeps the cap meaningful as the
    // corpus grows (a fixed 50 finds nothing at 10x the docs)
    // lg64's unrolled mantissa chain duplicates subtrees (Catalyst has no
    // let-binding), so evaluating TWO chains inside the stage fused with
    // dfc's hashAgg output pushed the generated method past Janino's 64KB
    // limit — the whole stage silently fell back to interpreted eval.
    // Evaluate the chains over the DISTINCT df values instead (≤ cap
    // values, its own tiny stage — the same shape the DuckDB twin uses)
    // and hash-join the bounded idf table back onto the vocab.
    val ddf = dfc.select(col("df")).distinct()
      .crossJoin(broadcast(nd))
      .filter(col("df") <= greatest(lit(maxDf),
        expr("n_docs div 10")))
      .withColumn("idf64", lg64(col("n_docs")) - lg64(col("df")))
      .filter(col("idf64") > 0)
      .select(col("df"), col("idf64"))
    val idf = dfc.join(broadcast(ddf), Seq("df"))
      .select(col("token"), col("idf64"))
    val kept = tf.join(broadcast(idf), Seq("token"))
      .withColumn("w", col("tf") * col("idf64"))
      .localCheckpoint(true) // norms + both join sides reuse it
    val norms = kept.groupBy(col("doc_id"))
      .agg(sum(col("w") * col("w")).as("n2"))
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.token") === col("b.token") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (col("a.w") * col("b.w")).as("pp"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"), sum(col("pp")).as("dot"))
    pairs
      .join(norms.select(col("doc_id").as("id_a"), col("n2").as("na2")),
        Seq("id_a"))
      .join(norms.select(col("doc_id").as("id_b"), col("n2").as("nb2")),
        Seq("id_b"))
      .withColumn("cos", col("dot").cast("double") /
        sqrt(col("na2").cast("double") * col("nb2").cast("double")))
      .select(col("id_a"), col("id_b"), col("n_shared"), col("dot"),
        col("cos"))
      .orderBy(desc("cos"), col("id_a"), col("id_b"))
      .limit(k)
  }

  def rrfFusion(lex: DataFrame, sem: DataFrame, kConst: Long = 60L,
      scale: Long = 1000000L, k: Int = 20): DataFrame = {
    val l = lex.select(col("doc_id"), col("rank").as("lex_rank"))
    val s = sem.select(col("doc_id"), col("rank").as("sem_rank"))
    val fused = l.join(s, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).as("sem_rank"))
      .withColumn("rrf",
        when(col("lex_rank") > 0,
          expr(s"$scale div ($kConst + lex_rank)")).otherwise(0L) +
        when(col("sem_rank") > 0,
          expr(s"$scale div ($kConst + sem_rank)")).otherwise(0L))
    val top = fused.orderBy(desc("rrf"), asc("doc_id")).limit(k)
    val w = Window.orderBy(desc("rrf"), asc("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("rrf"), col("lex_rank"),
        col("sem_rank"))
  }
}
