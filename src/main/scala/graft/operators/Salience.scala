package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-salience operators: per-document salient-term extraction (the
  * keyword/topic-hint stage of a text-analysis pipeline, and the feature
  * input of cheap quality classifiers).
  */
object Salience {

  /** RAKE KEYPHRASE EXTRACTION (Rose et al. 2010): candidate phrases
    * are maximal runs of non-stopword tokens (after lowercasing and
    * punctuation→space), capped at `maxPhraseLen` words; word score =
    * degree/freq where freq(w) counts w's occurrences across kept
    * phrases and degree(w) sums the LENGTHS of the phrases those
    * occurrences sit in (the RAKE co-occurrence degree, self included);
    * phrase score = Σ word scores. All scoring in integer per-mille —
    * `deg·1000 div freq` — so the gate is hash-exact with no libm.
    *
    * Phrase segmentation is pure window arithmetic: phrase_id = running
    * count of stopwords up to the token (default window frame, current
    * row included — identical in SQL), then drop the stopword rows;
    * consecutive non-stopwords share an id. Deterministic phrase text
    * via a (pos, token)-sorted array join, never a bare collect_list.
    *
    * Scale: the window partitions BY DOCUMENT (no global sort); word
    * stats live on the bounded vocabulary and broadcast back; identical
    * phrase texts merge in a final phrase-keyed agg. Output: top-`k`
    * (phrase, n_words, n, score_x1000) by score desc, phrase asc. */
  def rakePhrases(df: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String], maxPhraseLen: Int = 4, k: Int = 50)
      : DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        posexplode(filter(split(
          regexp_replace(lower(col(textCol)), "[^a-z0-9\\s]", " "),
          "\\s+"), t => length(t) > 0)).as(Seq("pos", "token")))
      .withColumn("is_stop", col("token").isInCollection(stopwords))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val pw = toks
      .withColumn("phrase_id",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(w))
      .filter(!col("is_stop"))
      .localCheckpoint(true) // phrases, word stats, and scoring reuse it
    val phr = pw.groupBy(col("doc_id"), col("phrase_id"))
      .agg(count(lit(1)).as("plen"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("token")))),
          x => x("token")), " ").as("phrase"))
      .filter(col("plen") <= maxPhraseLen)
    val keyed = pw.join(phr, Seq("doc_id", "phrase_id"))
    val ws = keyed.groupBy(col("token"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .withColumn("score", expr("deg * 1000 div freq"))
    keyed.join(broadcast(ws.select(col("token"), col("score"))),
        Seq("token"))
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(max(col("phrase")).as("phrase"), max(col("plen")).as("plen"),
        sum(col("score")).as("s"))
      .groupBy(col("phrase"))
      .agg(max(col("plen")).as("n_words"), count(lit(1)).as("n"),
        max(col("s")).as("score_x1000"))
      .orderBy(desc("score_x1000"), col("phrase"))
      .limit(k)
  }

  /** DuckDB twin of [[rakePhrases]] over the `documents` table. */
  def sqlRake(stopwords: Seq[String], maxPhraseLen: Int, k: Int): String = {
    val stop = stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH toks0 AS (
        SELECT doc_id, list_filter(string_split_regex(
          regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
          '\\s+'), t -> len(t) > 0) AS l
        FROM documents),
      toks AS (SELECT doc_id, unnest(l) AS token,
        generate_subscripts(l, 1) AS pos FROM toks0),
      fl AS (SELECT doc_id, pos, token, token IN ($stop) AS is_stop
        FROM toks),
      ph AS (SELECT doc_id, pos, token, is_stop,
          SUM(CASE WHEN is_stop THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
        FROM fl),
      pw AS (SELECT doc_id, pos, token, phrase_id FROM ph
        WHERE NOT is_stop),
      phr AS (SELECT doc_id, phrase_id, COUNT(*) AS plen,
          string_agg(token, ' ' ORDER BY pos) AS phrase
        FROM pw GROUP BY 1, 2 HAVING COUNT(*) <= $maxPhraseLen),
      keyed AS (SELECT pw.doc_id, pw.phrase_id, pw.token, phr.plen,
          phr.phrase
        FROM pw JOIN phr USING (doc_id, phrase_id)),
      ws AS (SELECT token, SUM(plen) * 1000 // COUNT(*) AS score
        FROM keyed GROUP BY 1),
      psc AS (SELECT keyed.doc_id, keyed.phrase_id,
          MAX(keyed.phrase) AS phrase, MAX(keyed.plen) AS plen,
          SUM(ws.score) AS s
        FROM keyed JOIN ws USING (token) GROUP BY 1, 2)
      SELECT phrase, CAST(MAX(plen) AS BIGINT) AS n_words,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(MAX(s) AS BIGINT) AS score_x1000
      FROM psc GROUP BY 1
      ORDER BY score_x1000 DESC, phrase LIMIT $k"""
  }

  /** Top-`k` salient terms per document by tf·(N/df) — TF-IDF with a
    * RATIONAL idf. `log(N/df)` is the textbook form, but log is a
    * transcendental whose libm rounding differs across engines; since log
    * is strictly monotone, ranking by `N/df` ranks identically, and
    * `(tf·N)/df` is ONE correctly-rounded IEEE division of exact integers
    * — bit-identical in every engine, so the whole result (score included)
    * sits under the hash-exact oracle gate.
    *
    * Scale shape: one explode+groupBy on (doc, term) for tf (map-side
    * partial combine eats the per-doc duplicate mass), one groupBy on term
    * for df (vocab-sized, derived from tf — never a second corpus pass),
    * one shuffle join tf⋈df on term, one per-doc window for the top-k.
    * The corpus count rides in as a 1-row broadcast cross join (stays in
    * the plan — no driver action). tf is cached: it feeds both df and the
    * join, and re-deriving it would re-explode the corpus. */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf")).cache()
    // (doc, term) is unique in tf, so df = per-term row count of tf
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("__n")).cast("double") / col("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("score"), col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        col("df"), col("score"))
  }

  /** Corpus vocabulary: the top-`k` terms by document frequency (ties:
    * total term count desc, then term asc — a total order). The
    * tokenizer-training / stopword-mining primitive of a text pipeline.
    *
    * Scale shape: explode+groupBy(doc, term) with map-side combine for tf,
    * vocab-sized groupBy(term) for (df, tf_total), then a DISTRIBUTED
    * top-k — orderBy+limit plans as TakeOrderedAndProject (per-partition
    * heap + driver merge of k·partitions rows), NEVER a global sort or a
    * single-partition window over the full vocabulary. The rank column is
    * numbered AFTER the limit, over k rows. */
  def vocabTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
    val top = vocab
      .orderBy(desc("df"), desc("tf_total"), asc("term"))
      .limit(k)
    val w = Window.orderBy(desc("df"), desc("tf_total"), asc("term"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("term"), col("df"), col("tf_total"))
  }

  /** Adjacent-token pair counts — the pair-frequency step a BPE-style
    * tokenizer trainer iterates (count pairs → merge the best → repeat)
    * and the bigram table of an n-gram LM. Top-`k` pairs by count (ties:
    * pair lexicographic — total order).
    *
    * Scale shape: pairs come from ONE posexplode of each doc's token
    * array zipped with its tail (map-side; no self-join of a token
    * table), then a single partial-aggregated groupBy and a distributed
    * top-k (TakeOrderedAndProject). */
  def pairCounts(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= lit(""))
    val pairs = df
      .select(explode(zip_with(slice(toks, 1, Int.MaxValue - 1),
        slice(toks, 2, Int.MaxValue - 1),
        (a, b) => struct(a.as("t1"), b.as("t2")))).as("p"))
      .filter(col("p.t2").isNotNull)
    val counted = pairs.groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .agg(count(lit(1)).as("cnt"))
    val top = counted.orderBy(desc("cnt"), asc("t1"), asc("t2")).limit(k)
    val w = Window.orderBy(desc("cnt"), asc("t1"), asc("t2"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("t1"), col("t2"), col("cnt"))
  }

  /** Sequence encoding: map each document's first `maxLen` whitespace
    * tokens to integer ids from a vocabulary table `(term, token_id)` —
    * the corpus → token-id-sequence step a training exporter runs after
    * vocabulary construction. Out-of-vocabulary tokens encode as 0 (the
    * UNK convention). Long-form output (doc_id, pos, token_id) so every
    * id is oracle-comparable.
    *
    * Scale shape: the token positions come from ONE posexplode of the
    * empty-filtered token array (positions are final before the explode —
    * no window needed), and the vocab join BROADCASTS: a vocabulary is
    * bounded (10^4-10^6 terms) regardless of corpus size. Map-side only;
    * the single shuffle is the output ordering. */
  def encodeTokens(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxLen: Int): DataFrame = {
    val toks = filter(split(trim(col(textCol)), "\\s+"),
      t => t =!= lit(""))
    df.select(col(idCol).as("doc_id"),
        posexplode(slice(toks, 1, maxLen)).as(Seq("pos", "term")))
      .join(broadcast(vocab), Seq("term"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(0L)).as("token_id"))
  }

  /** FLESCH READING-EASE SCORE per document — the classic readability
    * heuristic a curation pipeline uses as a cheap quality feature:
    * 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with
    * sentences = [.!?] runs (min 1) and syllables = vowel-group count
    * per document (the standard approximation). Every input is an
    * integer regex count and the score is a FIXED IEEE op order, so the
    * double is bit-identical cross-engine. One scan, map-side only —
    * embarrassingly parallel at any corpus size. */
  def readability(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val words = size(filter(split(trim(col(textCol)), "\\s+"),
      t => t =!= lit(""))).cast("long")
    val sentences = greatest(lit(1L),
      regexp_count(col(textCol), lit("[.!?]+")).cast("long"))
    val syllables = regexp_count(lower(col(textCol)), lit("[aeiouy]+"))
      .cast("long")
    df.select(col(idCol).as("doc_id"), words.as("words"),
        sentences.as("sentences"), syllables.as("syllables"))
      .filter(col("words") > 0)
      .withColumn("flesch",
        lit(206.835)
          - lit(1.015) * (col("words").cast("double")
            / col("sentences").cast("double"))
          - lit(84.6) * (col("syllables").cast("double")
            / col("words").cast("double")))
      .orderBy(col("doc_id"))
  }

  /** BIGRAM-LM SURPRISAL quality signal (the CCNet/Dolma "LM filter"
    * family, integer-exact): train a bigram model ON the corpus itself
    * (MLE counts), then score every document by its total integer
    * surprisal  Σ [⌊log₂ c(prev)⌋ − ⌊log₂ c(prev,cur)⌋]  over bigram
    * INSTANCES, where ⌊log₂ n⌋ is computed EXACTLY from the binary
    * string length — the [[tfidfTopK]] discipline: no transcendental log
    * crosses an engine boundary, so the score itself sits under the
    * hash-exact oracle gate (no golden). High surprisal = improbable
    * word transitions (gibberish, OCR noise, word salad); zero = the
    * document only walks the corpus's dominant transitions. The per-
    * bigram normalization is exact fixed-point (×1000, integer div).
    *
    * Scale shape: bigram instances come from ONE map-side zip of each
    * doc's token array with its own tail (never a token-table
    * self-join); the bigram COUNT table aggregates once [corpus
    * shuffle 1]; the context count c(prev) derives from the count table
    * itself (vocabulary²-bounded — never a second corpus pass); the
    * instance table joins the merged count table once on (prev, cur)
    * [corpus shuffle 2] and re-aggregates per doc [3]; top-k is a
    * distributed TakeOrderedAndProject. At 100 TB the join keys ride as
    * xxhash64(word) pairs (the decontaminate wire discipline) — strings
    * here for oracle exactness; the count side is vocabulary-bounded
    * either way. */
  def lmSurprisal(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    def ilog2(c: org.apache.spark.sql.Column) =
      (length(bin(c)) - 1).cast("long")
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => t =!= lit(""))
    val grams = df.select(col(idCol).as("doc_id"),
        explode(zip_with(slice(toks, 1, Int.MaxValue - 1),
          slice(toks, 2, Int.MaxValue - 1),
          (a, b) => struct(a.as("prev"), b.as("cur")))).as("g"))
      .filter(col("g.cur").isNotNull)
      .select(col("doc_id"), col("g.prev").as("prev"), col("g.cur").as("cur"))
    val big = grams.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c_pc"))
    val ctx = big.groupBy(col("prev")).agg(sum(col("c_pc")).as("c_p"))
    val surp = big.join(ctx, Seq("prev"))
      .select(col("prev"), col("cur"),
        (ilog2(col("c_p")) - ilog2(col("c_pc"))).as("s"))
    grams.join(surp, Seq("prev", "cur"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("surprisal"))
      .withColumn("surprisal_milli",
        expr("surprisal * 1000 div n_bigrams"))
      .orderBy(desc("surprisal_milli"), asc("doc_id"))
      .limit(k)
  }

  /** INTERPOLATED KNESER–NEY surprisal — the smoothed counterpart of
    * [[lmSurprisal]]'s MLE model, the actual n-gram-LM scoring every
    * perplexity-filter paper uses (Chen & Goodman 1999). Absolute
    * discount d = 3/4 (all quantities ×4 to stay integer):
    *
    *   p(cur|prev) = (c_pc − d)/c_p + (d·N1+(prev,•)/c_p)·N1+(•,cur)/T
    *
    * with N1+(prev,•) = distinct followers of prev, N1+(•,cur) =
    * distinct predecessors of cur (the continuation count — how many
    * contexts a word completes, the KN signature), T = total bigram
    * types. Realized exactly over a common denominator 4·c_p·T in
    * DECIMAL(38,0)/HUGEINT (int64 would wrap at 100 TB: c_pc·T can
    * pass 10¹⁸ once either factor passes ~10⁹):
    *
    *   p9 = max( ((4·c_pc − 3)·T + 3·N1p_prev·N1p_cur) · 10⁹
    *               div (4·c_p·T),  1 )
    *
    * (self-training means every scored bigram is seen, so 4·c_pc−3 ≥ 1;
    * the max(…,1) floors sub-nano probabilities for the log). Per-gram
    * surprisal s = lg64(10⁹) − lg64(p9) in 1/64-bit units via the
    * shared codegen'd fixed-point log — deterministic cross-engine, no
    * libm. Doc score = Σ s; per-gram normalization ×1000 integer div.
    *
    * Scale shape identical to [[lmSurprisal]]: the model (big/ctx/cont
    * tables) is vocabulary-bounded and derives from ONE corpus
    * explode+groupBy; T is a 1-row broadcast; scoring joins the
    * instance table once on (prev, cur) and re-aggregates per doc. */
  def knSurprisal(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => t =!= lit(""))
    val grams = df.select(col(idCol).as("doc_id"),
        explode(zip_with(slice(toks, 1, Int.MaxValue - 1),
          slice(toks, 2, Int.MaxValue - 1),
          (a, b) => struct(a.as("prev"), b.as("cur")))).as("g"))
      .filter(col("g.cur").isNotNull)
      .select(col("doc_id"), col("g.prev").as("prev"),
        col("g.cur").as("cur"))
    val big = grams.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("c_pc"))
    val ctx = big.groupBy(col("prev"))
      .agg(sum(col("c_pc")).as("c_p"), count(lit(1)).as("n1p_prev"))
    val cont = big.groupBy(col("cur"))
      .agg(count(lit(1)).as("n1p_w"))
    val tt = big.agg(count(lit(1)).cast("decimal(38,0)").as("t"))
    val l9 = NaiveBayes.lg64Long(1000000000L)
    val prob = big.join(ctx, Seq("prev")).join(cont, Seq("cur"))
      .crossJoin(broadcast(tt))
      .select(col("prev"), col("cur"),
        expr("""greatest(
            ((4 * cast(c_pc as decimal(38,0)) - 3) * t
              + 3 * cast(n1p_prev as decimal(38,0)) * n1p_w)
              * 1000000000 div (4 * cast(c_p as decimal(38,0)) * t),
            1L)""").as("p9"))
      .select(col("prev"), col("cur"),
        (lit(l9) - NaiveBayes.lg64(col("p9"))).as("s"))
    grams.join(prob, Seq("prev", "cur"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("kn_x64"))
      .withColumn("kn_milli", expr("kn_x64 * 1000 div n_bigrams"))
      .orderBy(desc("kn_milli"), asc("doc_id"))
      .limit(k)
  }
}
