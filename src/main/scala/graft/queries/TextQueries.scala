package graft.queries

import graft.Tables
import graft.functions.{SimHash64, TextFeatures}
import graft.operators.{Ann, Dedup, IvfModel}
import org.apache.spark.sql.functions._

/** North-star training-data-pipeline queries over documents/embeddings:
  * dedup (exact, MinHash-LSH, SimHash, n-gram), text analysis, ANN search.
  */
object TextQueries {

  /** Exact dedup groups keyed on the whitespace-normalized text (md5 in both
    * engines so the group key itself is verifiable).
    *
    * The synthetic corpus has no exact duplicates, so the gate PLANTS them:
    * every 10th doc gains a case/whitespace-perturbed copy (offset id) that
    * normalizes to the same key — mirrored verbatim in the DuckDB twin, so
    * the compared result is non-empty (≈50 groups at sf0.01). */
  val qDedupExact = GQuery("q_dedup_exact",
    (s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val planted = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(lit("  "), upper(col("text")), lit(" ")).as("text"))
      base.unionByName(planted)
        .groupBy(md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
          .as("text_md5"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .orderBy(col("keep_id"))
    },
    Some("""WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, '  ' || upper(text) || ' '
        FROM documents WHERE doc_id % 10 = 0)
      SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS text_md5,
      MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM docs
      GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY keep_id"""))

  /** Exact-dedup row flags via the window formulation (is_duplicate per
    * row — the filterable form a pipeline actually applies). Same planted
    * duplicates as [[qDedupExact]] so the flags are exercised non-vacuously. */
  val qDedupFlags = GQuery("q_dedup_flags",
    (s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val planted = base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(lit("  "), upper(col("text")), lit(" ")).as("text"))
      Dedup.exactDuplicates(base.unionByName(planted), "text", "doc_id")
        .filter(col("is_duplicate"))
        .select(col("doc_id"), col("dup_group_size"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000, '  ' || upper(text) || ' '
        FROM documents WHERE doc_id % 10 = 0),
      g AS (
        SELECT doc_id,
          MIN(doc_id) OVER (PARTITION BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS keep_id,
          COUNT(*) OVER (PARTITION BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS dup_group_size
        FROM docs)
      SELECT doc_id, dup_group_size FROM g WHERE doc_id <> keep_id
      ORDER BY doc_id"""))

  /** Token counting: whitespace + BPE-ish boundary-split estimates. */
  val qTokenCount = GQuery("q_token_count",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        TextFeatures.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
        length(col("text")).cast("long").as("n_chars_m")) // recomputed, vs stored n_chars
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      len(list_filter(string_split_regex(trim(text), '\s+'), t -> len(t) > 0))
        AS n_ws_tokens,
      len(text) AS n_chars_m
      FROM documents ORDER BY doc_id"""))

  /** Quality scoring: length band, punctuation ratio, stopword ratio,
    * mean word length → composite in [0,1] (C4/Gopher-style filters). */
  val qTextQuality = GQuery("q_text_quality",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        TextFeatures.punctRatioFast(col("text")).as("punct_ratio"),
        TextFeatures.stopwordRatioEnFast(col("text")).as("stopword_ratio"),
        TextFeatures.qualityScoreFast(col("text")).as("quality"))
      .orderBy(col("doc_id")),
    Some {
      val stop = TextFeatures.enStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH f AS (
        SELECT doc_id,
          CAST(len(text) AS DOUBLE) AS n_chars,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> len(t) > 0)) AS DOUBLE) AS n_toks,
          CAST(len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g'))
            AS DOUBLE) AS n_punct,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> len(t) > 0 AND lower(t) IN ($stop))) AS DOUBLE) AS n_stop
        FROM documents)
      SELECT doc_id,
        CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
        CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END AS stopword_ratio,
        ((CASE WHEN n_chars >= 100 AND n_chars <= 20000 THEN 1.0 ELSE 0.0 END)
         + (CASE WHEN (CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) < 0.2 THEN 1.0 ELSE 0.0 END)
         + (CASE WHEN (CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END) > 0.05 THEN 1.0 ELSE 0.0 END)
         + (CASE WHEN n_toks > 0 AND n_chars / n_toks >= 3 AND n_chars / n_toks <= 12 THEN 1.0 ELSE 0.0 END)
        ) / 4.0 AS quality
      FROM f ORDER BY doc_id"""
    })

  /** ADAPTIVE quality curation: keep the docs whose English-stopword
    * ratio clears their own LANGUAGE'S 0.6-quantile — per-group
    * percentile cutoffs instead of a global constant. The discrete
    * quantile is an actual data value (no interpolation), the cutoff
    * table broadcasts, and the filter is map-side; the twin recomputes
    * the cutoff from the SQL-standard CUME_DIST ≥ p definition. */
  val qAdaptiveQuality = GQuery("q_adaptive_quality",
    (s, d) => graft.operators.Sampling.adaptiveQualityFilter(
        Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text")),
        "lang", TextFeatures.stopwordRatioEnFast(col("text")), p = 0.6)
      .select(col("doc_id"), col("lang"), col("score"), col("cutoff"))
      .orderBy(col("doc_id")),
    Some {
      val stop = TextFeatures.enStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH f AS (
        SELECT doc_id, lang,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> len(t) > 0)) AS DOUBLE) AS n_toks,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> len(t) > 0 AND lower(t) IN ($stop))) AS DOUBLE) AS n_stop
        FROM documents),
      scored AS (
        SELECT doc_id, lang,
          CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END AS score
        FROM f),
      cd AS (
        SELECT doc_id, lang, score,
          CUME_DIST() OVER (PARTITION BY lang ORDER BY score) AS c
        FROM scored),
      cuts AS (
        SELECT lang, MIN(score) FILTER (WHERE c >= 0.6) AS cutoff
        FROM cd GROUP BY lang)
      SELECT s.doc_id, s.lang, s.score, cuts.cutoff
      FROM scored s JOIN cuts USING (lang)
      WHERE s.score >= cuts.cutoff
      ORDER BY s.doc_id"""
    },
    notes = "per-language discrete-quantile cutoff; twin derives it from CUME_DIST")

  /** Intra-doc REPETITION ratio (the Gopher-family quality signal this
    * corpus-level dedup can't see: a doc that repeats ITSELF): fraction of
    * word 3-grams that are repeats, n_distinct via the fused
    * [[graft.functions.WinnowFingerprints]] expression at w=1. Every 11th
    * doc gets a sentence appended TWICE (mirrored in the twin) so the
    * signal is exercised; the division is a single exactly-rounded IEEE op
    * on both engines. */
  val qRepetition = GQuery("q_repetition",
    (s, d) => {
      val planted = Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0,
            concat(col("text"),
              lit(" the cat sat on the mat the cat sat on the mat")))
            .otherwise(col("text")).as("text"))
      val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
      val nGrams = greatest(
        TextFeatures.tokenCount(col("text")).cast("long") - 2L, lit(0L))
      val nDistinct =
        size(graft.functions.WinnowFingerprints.fps(norm, 3, 1)).cast("long")
      planted
        .select(col("doc_id"), nGrams.as("n_grams"), nDistinct.as("n_distinct"))
        .withColumn("rep_ratio",
          when(col("n_grams") > 0,
            (col("n_grams") - col("n_distinct")).cast("double") /
              col("n_grams").cast("double"))
            .otherwise(lit(0.0)))
        .orderBy(col("doc_id"))
    },
    Some("""WITH docs AS (
        SELECT doc_id,
          CASE WHEN doc_id % 11 = 0
            THEN text || ' the cat sat on the mat the cat sat on the mat'
            ELSE text END AS text
        FROM documents),
      t AS (
        SELECT doc_id,
          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS tk
        FROM docs),
      g AS (SELECT doc_id, greatest(len(tk) - 2, 0) AS n_grams FROM t),
      dist AS (
        SELECT doc_id, COUNT(DISTINCT gram) AS n_distinct FROM (
          SELECT doc_id,
            array_to_string(tk[CAST(i AS INTEGER):CAST(i AS INTEGER) + 2], ' ') AS gram
          FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
                FROM t WHERE len(tk) >= 3))
        GROUP BY doc_id)
      SELECT g.doc_id,
        CAST(n_grams AS BIGINT) AS n_grams,
        CAST(COALESCE(n_distinct, 0) AS BIGINT) AS n_distinct,
        CASE WHEN n_grams > 0
          THEN CAST(n_grams - COALESCE(n_distinct, 0) AS DOUBLE) /
            CAST(n_grams AS DOUBLE)
          ELSE 0.0 END AS rep_ratio
      FROM g LEFT JOIN dist USING (doc_id)
      ORDER BY doc_id"""),
    notes = "planted self-repetition; twin recomputes distinct-gram counts and the exact IEEE ratio")

  /** CONSISTENT PSEUDONYMIZATION ([[graft.functions.Redact
    * .pseudonymize]]): user ids replaced by salted SHA-256 surrogates —
    * the keep-joins-drop-identity primitive. The gate proves the two
    * contracts at once: per event type the DISTINCT-token count equals
    * the distinct-user count (stability + injectivity on this corpus),
    * and the lexicographically-first token pins the byte-exact hex so
    * an engine emitting different case/length would hash-fail. */
  val qPseudonymize = GQuery("q_pseudonymize",
    (s, d) => {
      import graft.functions.Redact
      Tables.events(s, d)
        .select(col("event_type"), col("user_id"),
          Redact.pseudonymize(col("user_id")).as("token"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("token")).as("n_tokens"),
          min(col("token")).as("first_token"))
        .orderBy(col("event_type"))
    },
    Some("""WITH t AS (
        SELECT event_type, user_id,
          substr(sha256('graft:' || CAST(user_id AS VARCHAR)), 1, 16)
            AS token
        FROM events)
      SELECT event_type, COUNT(*) AS n_events,
        COUNT(DISTINCT user_id) AS n_users,
        COUNT(DISTINCT token) AS n_tokens,
        MIN(token) AS first_token
      FROM t GROUP BY 1 ORDER BY event_type"""),
    notes = "salted sha-256 surrogate ids; distinct-count preservation " +
      "and byte-exact hex pinned together")

  /** PII SCRUB ([[graft.functions.Redact]]): email/phone redaction with
    * per-doc counts and the md5 of the scrubbed text. The corpus carries no
    * PII, so the gate PLANTS it: every 17th doc gains a doc-unique email
    * and a phone number (mirrored in the twin); emails replace first so a
    * digit run inside a local part never leaks as a phone match. */
  val qPiiScrub = GQuery("q_pii_scrub",
    (s, d) => {
      import graft.functions.Redact
      val planted = Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("doc_id") % 17 === 0,
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"), lit("@example.com or 415-555-0117")))
            .otherwise(col("text")).as("text"))
      planted.select(col("doc_id"),
          Redact.emailCount(col("text")).cast("long").as("n_emails"),
          Redact.phoneCount(col("text")).cast("long").as("n_phones"),
          md5(Redact.scrub(col("text"))).as("clean_md5"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH docs AS (
        SELECT doc_id,
          CASE WHEN doc_id % 17 = 0
            THEN text || ' contact user' || CAST(doc_id AS VARCHAR) ||
              '@example.com or 415-555-0117'
            ELSE text END AS text
        FROM documents),
      scrubbed AS (
        SELECT doc_id, text,
          regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
            'g') AS no_email
        FROM docs)
      SELECT doc_id,
        CAST(len(regexp_extract_all(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
          AS n_emails,
        CAST(len(regexp_extract_all(no_email,
          '[0-9]{3}-[0-9]{3}-[0-9]{4}|[0-9]{3}-[0-9]{4}')) AS BIGINT)
          AS n_phones,
        md5(regexp_replace(no_email,
          '[0-9]{3}-[0-9]{3}-[0-9]{4}|[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'))
          AS clean_md5
      FROM scrubbed ORDER BY doc_id"""),
    notes = "planted doc-unique PII; twin reproduces the scrub byte-for-byte")

  /** Language ID (stopword-ratio heuristic) cross-checked against the stored
    * lang column. HASH-EXACT oracle: the DuckDB twin is GENERATED from the
    * same stopword lists the fused expression uses (cannot drift), scoring
    * hits/tokens per language and picking the first max in (en,de,fr,es)
    * order — the exact argmax [[TextFeatures.langIdFast]] computes. */
  val qLangId = GQuery("q_lang_id",
    (s, d) => Tables.documents(s, d)
      .groupBy(col("lang"),
        TextFeatures.langIdFast(col("text")).as("detected"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("detected")),
    Some {
      def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
      val langs = Seq(
        "en" -> inList(TextFeatures.enStopwords),
        "de" -> inList(TextFeatures.deStopwords),
        "fr" -> inList(TextFeatures.frStopwords),
        "es" -> inList(TextFeatures.esStopwords))
      val hitCols = langs.map { case (l, list) =>
        s"CAST(len(list_filter(toks, w -> w IN ($list))) AS DOUBLE) AS h_$l"
      }.mkString(",\n          ")
      val scoreCols = langs.map { case (l, _) =>
        s"CASE WHEN n > 0 THEN h_$l / n ELSE 0.0 END AS s_$l"
      }.mkString(",\n          ")
      val bestExpr = "GREATEST(s_en, s_de, s_fr, s_es)"
      val pick = langs.map { case (l, _) =>
        s"WHEN s_$l = $bestExpr THEN '$l'"
      }.mkString("\n               ")
      s"""WITH t AS (
        SELECT lang,
          list_transform(
            list_filter(string_split_regex(text, '\\s+'), w -> len(w) > 0),
            w -> lower(w)) AS toks
        FROM documents),
      h AS (
        SELECT lang, CAST(len(toks) AS DOUBLE) AS n,
          $hitCols
        FROM t),
      sc AS (
        SELECT lang,
          $scoreCols
        FROM h),
      d AS (
        SELECT lang,
          CASE WHEN $bestExpr > 0 THEN
            CASE $pick
            END
          ELSE 'und' END AS detected
        FROM sc)
      SELECT lang, detected, COUNT(*) AS n FROM d
      GROUP BY lang, detected ORDER BY lang, detected"""
    })

  /** Document fingerprints (md5 flavor for cross-engine verification; the
    * engine-internal fast path is xxhash64 — see TextFeatures.fingerprint). */
  val qFingerprint = GQuery("q_fingerprint",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
          .as("fingerprint"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
      FROM documents ORDER BY doc_id"""))

  /** MinHash + LSH near-duplicate pairs, exact-Jaccard verified ≥ 0.5.
    *
    * HASH-EXACT oracle: the DuckDB twin computes brute-force all-pairs exact
    * char-5-gram Jaccard (unnest + shingle equi-join — feasible at oracle
    * SF). The engine output equals brute force iff LSH candidate recall is 1
    * at this SF — hashing is deterministic, so the equality is stable, and
    * the exact-verify filter makes precision exact by construction. At scale
    * recall stays the only (tunable) approximation. */
  val qMinhashPairs = GQuery("q_minhash_pairs",
    (s, d) => Dedup.minhashNearDupPairsKeyed(Tables.documents(s, d),
        "doc_id", "text", numHashes = 64, bands = 16, shingleSize = 5,
        minJaccard = 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH docs AS (
        SELECT doc_id,
          list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), i + 1, 5))) AS sh
        FROM documents),
      s AS (SELECT doc_id, unnest(sh) AS g FROM docs),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(sh) AS n FROM docs)
      SELECT id_a, id_b,
        CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) AS jaccard
      FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
      WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b"""))

  /** N-GRAM NOVELTY per document: the share of a doc's distinct 5-gram
    * shingles whose FIRST occurrence (min doc_id) is this doc — the
    * redundancy-ordering signal (a doc that introduces nothing new is a
    * rephrase even when no single pair crosses the near-dup threshold;
    * complements pairwise dedup with a corpus-cumulative view). Exact
    * integer per-mille. Plan: one shingle explode, then two map-side-
    * combined aggs over it (per-doc gram count; gram → min doc, itself
    * re-grouped for per-doc novel counts) — NO gram-keyed join back,
    * and the gram crosses the exchange as xxhash64, never text (the
    * exact-substring discipline). */
  val qGramNovelty = GQuery("q_gram_novelty",
    (s, d) => {
      // NO join-back: n_novel(doc) is just the first-occurrence table
      // re-grouped by its min-doc — the gram stream is touched twice
      // (per-doc count + first-occurrence agg), never joined to itself.
      // The gram rides the shuffle as xxhash64 (collision-equivalent to
      // the string, the documented exactDuplicates trade; the twin
      // keeps strings) — 5-char text never crosses an exchange.
      // normalize ONCE per row into a projected column BEFORE the
      // shingle lambda: Catalyst does no common-subexpression
      // elimination inside lambda bodies, so shingles(text) re-runs the
      // regexp_replace normalization PER ARRAY ELEMENT — ~2000 regex
      // passes per doc (measured 13.7 s at sf0.1; this shape: ~1 s)
      val grams = Tables.documents(s, d)
        .select(col("doc_id"),
          lower(trim(regexp_replace(col("text"), "\\s+", " ")))
            .as("norm"))
        .select(col("doc_id"), explode(array_distinct(transform(
          sequence(lit(0), greatest(length(col("norm")) - 5, lit(0))),
          i => col("norm").substr(lit(1) + i, lit(5))))).as("gs"))
        .select(col("doc_id"), xxhash64(col("gs")).as("g"))
        .localCheckpoint(true) // per-doc count + first-occurrence reuse it
      val counts = grams.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"))
      val novel = grams.groupBy(col("g"))
        .agg(min(col("doc_id")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
      counts.join(novel, Seq("doc_id"), "left")
        .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
        .withColumn("novelty_x1000", expr("n_novel * 1000 div n_grams"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH docs AS (
        SELECT doc_id,
          list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), i + 1, 5))) AS sh
        FROM documents),
      s AS (SELECT doc_id, unnest(sh) AS g FROM docs),
      counts AS (SELECT doc_id, COUNT(*) AS n_grams FROM s GROUP BY 1),
      novel AS (SELECT fd AS doc_id, COUNT(*) AS n_novel FROM
        (SELECT g, MIN(doc_id) AS fd FROM s GROUP BY 1) GROUP BY 1)
      SELECT counts.doc_id, CAST(counts.n_grams AS BIGINT) AS n_grams,
        CAST(COALESCE(novel.n_novel, 0) AS BIGINT) AS n_novel,
        CAST(COALESCE(novel.n_novel, 0) * 1000 // counts.n_grams
          AS BIGINT) AS novelty_x1000
      FROM counts LEFT JOIN novel USING (doc_id)
      ORDER BY counts.doc_id"""),
    notes = "corpus-cumulative redundancy signal; gram-keyed first-" +
      "occurrence join, doc_id order as the arrival order")

  /** CROSS-SOURCE DUPLICATION MATRIX: the near-dup pair stream of
    * [[qMinhashPairs]] aggregated by (source, source) — "which feeds
    * copy from each other", the provenance view a curation run uses to
    * decide source-level dedup order and crawl priorities. Same LSH +
    * exact-verify machinery (recall 1.0 pinned at this threshold by
    * LshRecallSpec); the pair stream is tiny, so the source lookups
    * broadcast it. */
  val qDupMatrix = GQuery("q_dup_matrix",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDupPairsKeyed(docs, "doc_id", "text",
          numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5)
        .select(col("id_a"), col("id_b"))
      val srcs = docs.select(col("doc_id"), col("source"))
      pairs
        .join(srcs.select(col("doc_id").as("id_a"),
          col("source").as("sa")), Seq("id_a"))
        .join(srcs.select(col("doc_id").as("id_b"),
          col("source").as("sb")), Seq("id_b"))
        .select(least(col("sa"), col("sb")).as("src_a"),
          greatest(col("sa"), col("sb")).as("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("src_a"), col("src_b"))
    },
    Some("""WITH docs AS (
        SELECT doc_id,
          list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), i + 1, 5))) AS sh
        FROM documents),
      s AS (SELECT doc_id, unnest(sh) AS g FROM docs),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(sh) AS n FROM docs),
      pairs AS (
        SELECT id_a, id_b FROM inter
          JOIN cnt ca ON id_a = ca.doc_id
          JOIN cnt cb ON id_b = cb.doc_id
        WHERE CAST(ninter AS DOUBLE)
          / CAST(ca.n + cb.n - ninter AS DOUBLE) >= 0.5),
      m AS (SELECT least(da.source, db.source) AS src_a,
          greatest(da.source, db.source) AS src_b
        FROM pairs JOIN documents da ON id_a = da.doc_id
          JOIN documents db ON id_b = db.doc_id)
      SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM m GROUP BY 1, 2 ORDER BY src_a, src_b"""),
    notes = "provenance rollup of the verified near-dup pairs; " +
      "brute-force twin shares the q_minhash_pairs ground truth")

  /** INCREMENTAL exact dedup ([[Dedup.incrementalExact]]): an ingest batch
    * (every 4th doc, plus planted copies of corpus docs at +300000) flagged
    * against the existing corpus — `is_known` (fingerprint already in the
    * corpus) and `is_duplicate` (within-batch). This is the production
    * shape of exact dedup: corpus-side reduces to distinct 64-bit
    * fingerprints, never a corpus self-join. Twin groups on the normalized
    * text itself (collision-equivalent to the engine's xxhash64 — the
    * documented [[Dedup.exactDuplicates]] trade). */
  val qDedupIncremental = GQuery("q_dedup_incremental",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") % 4 =!= 0)
      val incoming = docs.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), col("text"))
        .unionByName(corpus.filter(col("doc_id") % 20 === 1)
          .select((col("doc_id") + 300000L).as("doc_id"), col("text")))
      Dedup.incrementalExact(incoming, corpus, "doc_id", "text")
        .select(col("doc_id"), col("is_known"), col("is_duplicate"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH inc AS (
        SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS n
        FROM documents WHERE doc_id % 4 = 0
        UNION ALL
        SELECT doc_id + 300000 AS doc_id,
          lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
        FROM documents WHERE doc_id % 4 <> 0 AND doc_id % 20 = 1),
      corp AS (
        SELECT DISTINCT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS n
        FROM documents WHERE doc_id % 4 <> 0)
      SELECT i.doc_id, (c.n IS NOT NULL) AS is_known,
        i.doc_id <> MIN(i.doc_id) OVER (PARTITION BY i.n) AS is_duplicate
      FROM inc i LEFT JOIN corp c ON i.n = c.n
      ORDER BY i.doc_id"""),
    notes = "incremental ingest dedup: batch vs corpus fingerprints + within-batch; planted known copies")

  /** CROSS-CORPUS MinHash near-dup pairs ([[Dedup.minhashCrossPairs]]):
    * the ingest batch LSH-paired against the existing corpus only — never
    * corpus×corpus (the incremental posture at 100 TB: corpus signatures
    * are precomputed state, pair volume ∝ batch-similar mass). Planted
    * exact copies guarantee jaccard-1.0 pairs at any SF; the twin
    * brute-forces cross-side 5-gram Jaccard like [[qMinhashPairs]]. */
  val qMinhashCross = GQuery("q_minhash_cross",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") % 4 =!= 0)
      val incoming = docs.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), col("text"))
        .unionByName(corpus.filter(col("doc_id") % 20 === 1)
          .select((col("doc_id") + 300000L).as("doc_id"), col("text")))
      Dedup.minhashCrossPairs(incoming, corpus, "doc_id", "text",
          numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5)
        .orderBy(col("id_new"), col("id_corpus"))
    },
    Some("""WITH inc AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
        UNION ALL
        SELECT doc_id + 300000 AS doc_id, text FROM documents
        WHERE doc_id % 4 <> 0 AND doc_id % 20 = 1),
      corp AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0),
      di AS (
        SELECT doc_id,
          list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), i + 1, 5))) AS sh
        FROM inc),
      dc AS (
        SELECT doc_id,
          list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), i + 1, 5))) AS sh
        FROM corp),
      si AS (SELECT doc_id, unnest(sh) AS g FROM di),
      sc AS (SELECT doc_id, unnest(sh) AS g FROM dc),
      inter AS (
        SELECT a.doc_id AS id_new, b.doc_id AS id_corpus, COUNT(*) AS ninter
        FROM si a JOIN sc b ON a.g = b.g
        GROUP BY 1, 2),
      cni AS (SELECT doc_id, len(sh) AS n FROM di),
      cnc AS (SELECT doc_id, len(sh) AS n FROM dc)
      SELECT id_new, id_corpus,
        CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) AS jaccard
      FROM inter
      JOIN cni ca ON id_new = ca.doc_id
      JOIN cnc cb ON id_corpus = cb.doc_id
      WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) >= 0.5
      ORDER BY id_new, id_corpus"""),
    notes = "batch-vs-corpus LSH pairs; twin brute-forces cross-side Jaccard; planted exact copies")

  /** Near-dup CLUSTERS: MinHash pairs → connected components → canonical
    * doc per cluster. HASH-EXACT oracle: DuckDB recomputes the pairs brute
    * force and closes them with a recursive CTE (transitive closure, min
    * label per component) — verifying both the pair set and the iterative
    * label propagation against an independent formulation. */
  val qNearDupGroups = GQuery("q_neardup_groups",
    (s, d) => {
      val pairs = Dedup.minhashNearDupPairsKeyed(Tables.documents(s, d),
        "doc_id", "text", numHashes = 64, bands = 16, shingleSize = 5,
        minJaccard = 0.5)
      val g = Dedup.nearDupGroups(pairs.select(col("id_a"), col("id_b")))
      val sizes = g.groupBy(col("label"))
        .agg(count(lit(1)).as("cluster_size"))
      g.join(sizes, Seq("label"))
        .select(col("id").as("doc_id"), col("label").as("canonical_id"),
          col("cluster_size"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE docs AS (
        SELECT doc_id,
          list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), i + 1, 5))) AS sh
        FROM documents),
      s AS (SELECT doc_id, unnest(sh) AS g FROM docs),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(sh) AS n FROM docs),
      pairs AS (
        SELECT id_a, id_b
        FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
        WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) >= 0.5),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      reach AS (
        SELECT id, id AS label FROM nodes
        UNION
        SELECT e.src AS id, r.label FROM edges e JOIN reach r ON e.dst = r.id),
      comp AS (SELECT id, MIN(label) AS label FROM reach GROUP BY id),
      sizes AS (SELECT label, COUNT(*) AS cluster_size FROM comp GROUP BY label)
      SELECT c.id AS doc_id, c.label AS canonical_id, z.cluster_size
      FROM comp c JOIN sizes z USING (label) ORDER BY doc_id"""))

  /** CLUSTER REPRESENTATIVE SELECTION ([[Dedup.clusterRepresentatives]]):
    * the step that turns near-dup clusters into a deduplicated corpus —
    * keep exactly one doc per connected component (max n_chars, ties to
    * the smallest id) and every singleton. The twin re-derives the
    * components with the same recursive-CTE min-label construction as
    * q_neardup_groups, then replays the argmax. */
  val qClusterRep = GQuery("q_cluster_rep",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDupPairsKeyed(docs,
        "doc_id", "text", numHashes = 64, bands = 16, shingleSize = 5,
        minJaccard = 0.5)
      Dedup.clusterRepresentatives(docs,
        pairs.select(col("id_a"), col("id_b")), "doc_id", "n_chars")
    },
    Some("""WITH RECURSIVE docs AS (
        SELECT doc_id,
          list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), i + 1, 5))) AS sh
        FROM documents),
      s AS (SELECT doc_id, unnest(sh) AS g FROM docs),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(sh) AS n FROM docs),
      pairs AS (
        SELECT id_a, id_b
        FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
        WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) >= 0.5),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      reach AS (
        SELECT id, id AS label FROM nodes
        UNION
        SELECT e.src AS id, r.label FROM edges e JOIN reach r ON e.dst = r.id),
      comp AS (SELECT id, MIN(label) AS label FROM reach GROUP BY id),
      labeled AS (
        SELECT d.doc_id, COALESCE(c.label, d.doc_id) AS cluster_id, d.n_chars
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
      sized AS (
        SELECT doc_id, cluster_id,
          COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
          ROW_NUMBER() OVER (PARTITION BY cluster_id
            ORDER BY n_chars DESC, doc_id) AS rn
        FROM labeled)
      SELECT doc_id, cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
        rn = 1 AS kept
      FROM sized ORDER BY doc_id"""),
    notes = "dedup keep-best: component argmax + singletons; ids-only joins")

  /** LEAKAGE-SAFE SPLIT ([[graft.operators.Sampling.leakageSafeSplit]]):
    * train/val/test assignment hashed on the NEAR-DUP CLUSTER canonical
    * id, so a paraphrase of a training document can never land in test.
    * The twin re-derives the components with the q_neardup_groups
    * recursive CTE, coalesces singletons to their own id, and replays
    * the md5-threshold CASE on the canonical key. */
  val qLeakageSafeSplit = GQuery("q_leakage_safe_split",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashNearDupPairsKeyed(docs,
        "doc_id", "text", numHashes = 64, bands = 16, shingleSize = 5,
        minJaccard = 0.5)
      graft.operators.Sampling.leakageSafeSplit(docs,
          pairs.select(col("id_a"), col("id_b")), "doc_id",
          Seq("train" -> 800, "val" -> 100, "test" -> 100), salt = "leak")
        .select(col("doc_id"), col("canonical_id"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH RECURSIVE docs AS (
        SELECT doc_id,
          list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), i + 1, 5))) AS sh
        FROM documents),
      s AS (SELECT doc_id, unnest(sh) AS g FROM docs),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(sh) AS n FROM docs),
      pairs AS (
        SELECT id_a, id_b
        FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
        WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) >= 0.5),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      reach AS (
        SELECT id, id AS label FROM nodes
        UNION
        SELECT e.src AS id, r.label FROM edges e JOIN reach r ON e.dst = r.id),
      comp AS (SELECT id, MIN(label) AS label FROM reach GROUP BY id),
      canon AS (
        SELECT d.doc_id, COALESCE(c.label, d.doc_id) AS canonical_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
      SELECT doc_id, canonical_id,
        CASE WHEN substr(md5('leak:' || CAST(canonical_id AS VARCHAR)), 1, 4)
               < 'cccc' THEN 'train'
             WHEN substr(md5('leak:' || CAST(canonical_id AS VARCHAR)), 1, 4)
               < 'e666' THEN 'val'
             ELSE 'test' END AS split
      FROM canon ORDER BY doc_id"""),
    notes = "cluster-atomic train/val/test: no near-dup pair ever straddles a split")

  /** IPF RAKING ([[graft.operators.Sampling.ipfWeights]]): fit per-
    * (source, lang) sampling weights so BOTH marginals approach uniform
    * simultaneously (3 alternating scalings) — the 2-D mixture
    * balancer above [[qMixturePlan]]'s 1-D allocator, needed when the
    * dimensions are correlated (this corpus is 43% English, unevenly
    * across sources). Integer fixed point: 10⁶-scaled weights,
    * DECIMAL(38,0)/HUGEINT products, truncating division — the weight
    * TRAJECTORY is bit-exact cross-engine; the twin unrolls the three
    * scalings as chained window-sum CTEs. */
  val qIpfRaking = GQuery("q_ipf_raking",
    (s, d) => graft.operators.Sampling.ipfWeights(
      Tables.documents(s, d), "source", "lang", scalings = 3),
    Some("""WITH cells AS (
        SELECT source AS rowv, lang AS colv, COUNT(*) AS n
        FROM documents GROUP BY 1, 2),
      t AS (SELECT CAST(SUM(n) AS HUGEINT) * 1000000 AS t0,
          CAST(COUNT(DISTINCT rowv) AS HUGEINT) AS nr,
          CAST(COUNT(DISTINCT colv) AS HUGEINT) AS nc
        FROM cells),
      w0 AS (SELECT rowv, colv, n, CAST(n AS HUGEINT) * 1000000 AS w
        FROM cells),
      w1 AS (SELECT rowv, colv, n,
          (w * (t.t0 // t.nr)) // (SUM(w) OVER (PARTITION BY rowv)) AS w
        FROM w0, t),
      w2 AS (SELECT rowv, colv, n,
          (w * (t.t0 // t.nc)) // (SUM(w) OVER (PARTITION BY colv)) AS w
        FROM w1, t),
      w3 AS (SELECT rowv, colv, n,
          (w * (t.t0 // t.nr)) // (SUM(w) OVER (PARTITION BY rowv)) AS w
        FROM w2, t)
      SELECT rowv, colv, CAST(n AS BIGINT) AS n, CAST(w AS BIGINT) AS w
      FROM w3 ORDER BY rowv, colv"""),
    notes = "2-D marginal raking, fixed uniform targets from the " +
      "initial total; one corpus shuffle, rounds on the bounded cell " +
      "table")

  /** MIXTURE PLAN ([[graft.operators.Sampling.mixturePlan]]): the
    * data-mix allocator — double-weight sources src0..src9, cap every
    * source at 4 epochs, and report the largest feasible training set
    * with per-source allocations. Exact integer cuts; the twin replays
    * the same min/div arithmetic from a window over the per-source
    * aggregate. */
  val qMixturePlan = GQuery("q_mixture_plan",
    (s, d) => graft.operators.Sampling.mixturePlan(
      Tables.documents(s, d), "source", "text",
      when(col("source").isin((0 until 10).map("src" + _): _*), lit(2L))
        .otherwise(lit(1L)),
      maxEpochs = 4L),
    Some("""WITH t AS (
        SELECT source,
          CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
            w -> len(w) > 0)) AS BIGINT) AS ntok
        FROM documents),
      g AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(ntok) AS BIGINT) AS n_tokens,
          CASE WHEN source IN ('src0','src1','src2','src3','src4',
            'src5','src6','src7','src8','src9') THEN 2 ELSE 1 END AS weight
        FROM t GROUP BY source),
      w AS (
        SELECT *, SUM(weight) OVER () AS sumw,
          (4 * n_tokens * SUM(weight) OVER ()) // weight AS cap
        FROM g),
      m AS (SELECT *, MIN(cap) OVER () AS s FROM w)
      SELECT source, n_docs, n_tokens, CAST(weight AS BIGINT) AS weight,
        CAST((s * weight) // sumw AS BIGINT) AS alloc_tokens,
        CAST((s * weight) // sumw AS DOUBLE) / CAST(n_tokens AS DOUBLE)
          AS epochs,
        cap = s AS binding
      FROM m ORDER BY source"""),
    notes = "max feasible mix size under a 4-epoch cap; integer cuts, one tiny window")

  /** PER-SOURCE QUOTA CAP ([[graft.operators.Sampling.capPerGroup]]):
    * at most N docs per source by deterministic md5 rank — the
    * anti-domination cap on crawl sources. Stable across engines and
    * partitionings; md5 is the cross-engine rank. */
  val qDomainCap = GQuery("q_domain_cap",
    (s, d) => graft.operators.Sampling.capPerGroup(
        Tables.documents(s, d), "source", "doc_id", maxPerGroup = 15)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id")),
    Some("""WITH ranked AS (
        SELECT doc_id, source, n_chars,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
      SELECT doc_id, source, n_chars FROM ranked
      WHERE rn <= 15 ORDER BY doc_id"""),
    notes = "per-domain cap; one group-key shuffle, md5 rank engine-stable")

  /** HARD-NEGATIVE MINING ([[Ann.hardNegatives]]): top-10 most-similar
    * DIFFERENT-label corpus vectors per query — the contrastive-training
    * negatives. Exact-decimal cosine ranking, label filter before any
    * scoring; twin replays the filtered brute force. */
  val qHardNegatives = GQuery("q_hard_negatives",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.hardNegatives(emb, "vec_id", "embedding", "label",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", "label",
          k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("id"), col("neg_label"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (
        SELECT vec_id AS query_id, label AS ql, embedding AS qv
        FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, e.vec_id AS id, e.label AS neg_label,
          CAST(list_sum(list_transform(
              list_zip(e.embedding, q.qv),
              p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18))))
            AS DOUBLE)
          / (sqrt(CAST(list_sum(list_transform(e.embedding,
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE))
           * sqrt(CAST(list_sum(list_transform(q.qv,
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE)))
          AS cos
        FROM embeddings e, q WHERE e.label <> q.ql),
      ranked AS (
        SELECT query_id, id, neg_label,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS rank
        FROM scored)
      SELECT query_id, rank, id, neg_label FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank"""),
    notes = "contrastive negatives: wrong-label filter precedes scoring, queries broadcast")

  /** MATRYOSHKA TWO-STAGE RETRIEVAL ([[Ann.matryoshkaTopK]]): 16-dim
    * prefix cosine selects 50 candidates, full 64-dim cosine rescores to
    * top-10 — deterministic-replay contract (both stage boundaries
    * exact-decimal ranked); the twin re-derives candidate set AND final
    * ranking; recall vs full-dim search spec-pinned (AnnCandidatesSpec). */
  val qMatryoshka = GQuery("q_matryoshka",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.matryoshkaTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          prefixDim = 16, kCand = 50, k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("id"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < 5),
      pre AS (
        SELECT q.query_id, e.vec_id AS id, e.embedding AS ev, q.qv,
          CAST(list_sum(list_transform(
              list_zip(e.embedding[1:16], q.qv[1:16]),
              p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18))))
            AS DOUBLE)
          / (sqrt(CAST(list_sum(list_transform(e.embedding[1:16],
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE))
           * sqrt(CAST(list_sum(list_transform(q.qv[1:16],
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE)))
          AS pcos
        FROM embeddings e, q),
      cand AS (
        SELECT query_id, id, ev, qv FROM (
          SELECT query_id, id, ev, qv,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY pcos DESC, id) AS r1
          FROM pre) WHERE r1 <= 50),
      resc AS (
        SELECT query_id, id,
          CAST(list_sum(list_transform(
              list_zip(ev, qv),
              p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18))))
            AS DOUBLE)
          / (sqrt(CAST(list_sum(list_transform(ev,
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE))
           * sqrt(CAST(list_sum(list_transform(qv,
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE)))
          AS cos
        FROM cand),
      ranked AS (
        SELECT query_id, id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS rank
        FROM resc)
      SELECT query_id, rank, id FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank"""),
    notes = "truncated-prefix prescreen + full rescore; deterministic replay both stages")

  /** FLESCH READABILITY ([[graft.operators.Salience.readability]]):
    * integer regex counts + one fixed IEEE op order — map-side only. */
  val qReadability = GQuery("q_readability",
    (s, d) => graft.operators.Salience.readability(
      Tables.documents(s, d), "doc_id", "text"),
    Some("""WITH counts AS (
        SELECT doc_id,
          CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
            t -> len(t) > 0)) AS BIGINT) AS words,
          CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
            AS BIGINT) AS sentences,
          CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
            AS BIGINT) AS syllables
        FROM documents)
      SELECT doc_id, words, sentences, syllables,
        206.835
          - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
          - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
          AS flesch
      FROM counts WHERE words > 0 ORDER BY doc_id"""),
    notes = "readability quality feature; counts are regex-integer, score fixed IEEE order")

  /** SimHash near-dup pairs: 64-bit signature, Hamming ≤ 3, candidate
    * generation by 16-bit block bucketing — the classic 64-bit/4-block/k=3
    * design (Manku et al., WWW'07): k ≤ 3 differing bits cannot touch all 4
    * blocks, so every qualifying pair shares at least one exact block.
    * (The round-2 version claimed k=6 with 4 blocks — WRONG: 6 differences
    * can spread 2+2+1+1 and miss every block. k=3 is the pigeonhole bound;
    * the brute-force golden below would have caught the gap.)
    *
    * HASH-EXACT golden oracle: signatures are deterministic (FNV-1a is a
    * public algorithm), so the twin is a committed pair set generated by an
    * INDEPENDENT brute-force all-pairs reimplementation in pure Python
    * (tools/gen_simhash_golden.py) — different language, no blocking —
    * which pins both the hash and the completeness of block bucketing.
    * Exact-duplicate docs are planted (every 20th at doc_id + 100000) so
    * the gate stays non-vacuous under data drift. */
  val qSimhashPairs = GQuery("q_simhash_pairs",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      val base = docs.unionByName(planted)
        .select(col("doc_id"),
          SimHash64.simhash64(TextFeatures.wsTokens(lower(col("text"))))
            .as("sh"))
      val blocks = base.withColumn("block", explode(array(
        (0 until 4).map(b => struct(lit(b).as("b"),
          shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xffffL))
            .as("v"))): _*)))
      val a = blocks.select(col("block"), col("doc_id").as("id_a"),
        col("sh").as("sh_a"))
      val b = blocks.select(col("block"), col("doc_id").as("id_b"),
        col("sh").as("sh_b"))
      a.join(b, Seq("block")).filter(col("id_a") < col("id_b"))
        .dropDuplicates("id_a", "id_b")
        .withColumn("hamming", SimHash64.hamming64(col("sh_a"), col("sh_b")))
        .filter(col("hamming") <= 3)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(s"""WITH golden(id_a, id_b, hamming, tl) AS (VALUES
        ${SimhashGolden.rows}),
      cur AS (SELECT SUM(len(text)) AS tl FROM documents)
      SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
        CAST(hamming AS INTEGER) AS hamming
      FROM golden, cur WHERE golden.tl = cur.tl
      ORDER BY id_a, id_b"""),
    notes = "golden twin: independent Python brute-force, per-SF sets keyed " +
      "by the corpus text-length discriminator (gen_simhash_golden.py)")

  /** Character-level EXACT-SUBSTRING pairs ([[graft.operators.Dedup
    * .exactSubstrPairs]]): docs sharing ≥3 distinct verbatim 30-char runs,
    * with a 2..50 document-frequency gate keeping boilerplate runs out of
    * the pairing join. Pure string equality — the twin recomputes the
    * identical runs in DuckDB, hash-exact with no golden. */
  val qExactSubstr = GQuery("q_exact_substr",
    (s, d) => Dedup.exactSubstrPairs(Tables.documents(s, d),
        "doc_id", "text", runLen = 30, maxDf = 50, minShared = 3)
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH grams AS (
        SELECT DISTINCT doc_id AS id,
          unnest(list_transform(range(1, len(text) - 30 + 2),
            i -> substr(text, i, 30))) AS g
        FROM documents WHERE len(text) >= 30),
      shared AS (SELECT g FROM grams GROUP BY g
        HAVING COUNT(*) BETWEEN 2 AND 50),
      g2 AS (SELECT grams.id, grams.g FROM grams JOIN shared USING (g))
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_shared
      FROM g2 a JOIN g2 b ON a.g = b.g AND a.id < b.id
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
      ORDER BY id_a, id_b"""),
    notes = "ExactSubstr-family char-run dedup; df-gated before pairing " +
      "so boilerplate runs never enter the self-join")

  /** N-gram (word 3-gram) Jaccard near-dup pairs, LSH candidates + exact
    * verify. Same brute-force oracle construction as [[qMinhashPairs]],
    * over word 3-grams mirroring TextFeatures.wordNgrams (including the
    * <n-token fallback to one whole-text gram). */
  val qNgramJaccard = GQuery("q_ngram_jaccard",
    (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d),
        "doc_id", "text", n = 3, minJaccard = 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH toks AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(lower(text)), '\s+'),
            t -> len(t) > 0) AS tk
        FROM documents),
      g AS (
        SELECT doc_id,
          CASE WHEN len(tk) >= 3
            THEN list_distinct(list_transform(range(0, len(tk) - 3 + 1),
              i -> array_to_string(tk[i + 1 : i + 3], ' ')))
            ELSE [array_to_string(tk, ' ')] END AS grams
        FROM toks),
      s AS (SELECT doc_id, unnest(grams) AS gr FROM g),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM s a JOIN s b ON a.gr = b.gr AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(grams) AS n FROM g)
      SELECT id_a, id_b,
        CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) AS jaccard
      FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
      WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b"""))

  /** PREFIX-FILTER set-similarity join ([[graft.operators.Dedup
    * .prefixJaccardPairs]], the AllPairs/PPJoin family): word-4-GRAM
    * Jaccard ≥ 0.5 pairs with candidates from the rarest-first gram
    * prefix (global-df ordering + pigeonhole prefix bound) instead of
    * MinHash banding — deterministic recall 1.0 by construction. The
    * brute-force twin is the same construction as [[qNgramJaccard]]'s
    * at n = 4, so the gate pins candidate completeness AND the exact
    * verify arithmetic together.
    *
    * Gram length is the COST knob, measured in-round at sf0.1: with
    * word bigrams this corpus has only 931 distinct grams at median
    * df 285, so Σ(prefix-posting)² — the AllPairs candidate bound —
    * explodes and the join ran 29 s; at n = 4 the inventory is 210k
    * grams at median df 1 (Σdf² ÷ ~200) and the same 256 pairs
    * survive. Prefix filtering needs a discriminative token
    * distribution; on a low-vocabulary corpus, lengthen the gram. */
  val qPrefixJoin = GQuery("q_prefix_join",
    (s, d) => Dedup.prefixJaccardPairs(Tables.documents(s, d),
        "doc_id", "text", n = 4, num = 1L, den = 2L)
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH toks AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(lower(text)), '\s+'),
            t -> len(t) > 0) AS tk
        FROM documents),
      g AS (
        SELECT doc_id,
          CASE WHEN len(tk) >= 4
            THEN list_distinct(list_transform(range(0, len(tk) - 4 + 1),
              i -> array_to_string(tk[i + 1 : i + 4], ' ')))
            ELSE [array_to_string(tk, ' ')] END AS grams
        FROM toks),
      s AS (SELECT doc_id, unnest(grams) AS gr FROM g),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM s a JOIN s b ON a.gr = b.gr AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(grams) AS n FROM g)
      SELECT id_a, id_b,
        CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE)
          AS jaccard
      FROM inter JOIN cnt ca ON id_a = ca.doc_id
        JOIN cnt cb ON id_b = cb.doc_id
      WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE)
        >= 0.5
      ORDER BY id_a, id_b"""),
    notes = "AllPairs/PPJoin prefix filtering: df-ordered prefixes, " +
      "hash-only candidate exchange, exact merge-pass verify")

  /** SORTED-NEIGHBORHOOD near-dup pairs ([[graft.operators.Dedup
    * .sortedNeighborPairs]]): the THIRD blocking strategy gated on the
    * same ≥0.5 word-4-gram contract as [[qPrefixJoin]] and the LSH
    * path — sort by text, compare within a 10-row window. On this
    * prefix-preserving corpus the window catches every natural pair
    * (equivalence spec pins pair-set equality with the prefix join),
    * with candidates = 9n independent of gram statistics. Global rank
    * via prefix-sharded window + broadcast offsets — no global sort;
    * only (rank, id) ints cross the pairing exchanges. */
  val qSnmPairs = GQuery("q_snm_pairs",
    (s, d) => Dedup.sortedNeighborPairs(Tables.documents(s, d),
        "doc_id", "text", window = 10, n = 4, num = 1L, den = 2L)
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH toks AS (
        SELECT doc_id, text,
          list_filter(string_split_regex(trim(lower(text)), '\s+'),
            t -> len(t) > 0) AS tk
        FROM documents),
      g AS (
        SELECT doc_id, text,
          CASE WHEN len(tk) >= 4
            THEN list_distinct(list_transform(range(0, len(tk) - 4 + 1),
              i -> array_to_string(tk[i + 1 : i + 4], ' ')))
            ELSE [array_to_string(tk, ' ')] END AS grams
        FROM toks),
      p AS (
        SELECT doc_id, grams,
          ROW_NUMBER() OVER (ORDER BY text, doc_id) AS r
        FROM g),
      pr AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(b.r - a.r AS BIGINT) AS dist,
          len(list_intersect(a.grams, b.grams)) AS ninter,
          len(a.grams) + len(b.grams)
            - len(list_intersect(a.grams, b.grams)) AS nunion
        FROM p a JOIN p b ON b.r > a.r AND b.r <= a.r + 9)
      SELECT id_a, id_b, dist,
        CAST(ninter AS DOUBLE) / CAST(nunion AS DOUBLE) AS jaccard
      FROM pr
      WHERE CAST(ninter AS DOUBLE) / CAST(nunion AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b"""),
    notes = "window-10 sorted-neighborhood blocking; candidates 9n " +
      "regardless of gram statistics; sharded rank, no global sort")

  /** Brute-force cosine top-k: 5 query vectors against the corpus.
    * Output ranks only — rank is stable under float noise; raw cosines are
    * engine-arithmetic-order dependent. */
  val qCosineTopK = GQuery("q_cosine_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 5)
      Ann.cosineTopK(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("id"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, e.vec_id AS id,
          CAST(list_sum(list_transform(
              list_zip(e.embedding, q.qv),
              p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18))))
            AS DOUBLE)
          / (sqrt(CAST(list_sum(list_transform(e.embedding,
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE))
           * sqrt(CAST(list_sum(list_transform(q.qv,
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE)))
          AS cos
        FROM embeddings e, q),
      ranked AS (
        SELECT query_id, id,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS rank
        FROM scored)
      SELECT query_id, rank, id FROM ranked WHERE rank <= 10
      ORDER BY query_id, rank"""))

  /** k-NN LABEL CLASSIFICATION ([[graft.operators.Ann.knnClassify]]):
    * every 25th vector classified by its 10 nearest labeled
    * neighbors — the embedding-space label-consistency check (and the
    * weak-labeling primitive). Majority vote, smallest-label ties,
    * exact-decimal cosine ranking. */
  val qKnnClassify = GQuery("q_knn_classify",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") % 25 === 0)
      Ann.knnClassify(emb, "vec_id", "embedding", "label",
          queries, "vec_id", "embedding", "label", k = 10)
        .select(col("query_id"), col("true_label").cast("long")
          .as("true_label"), col("pred_label").cast("long")
          .as("pred_label"), col("n_votes"), col("correct"))
    },
    Some("""WITH q AS (
        SELECT vec_id AS query_id, label AS true_label, embedding AS qv
        FROM embeddings WHERE vec_id % 25 = 0),
      scored AS (
        SELECT q.query_id, q.true_label, e.vec_id AS id,
          e.label AS nlabel,
          CAST(list_sum(list_transform(
              list_zip(e.embedding, q.qv),
              p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18))))
            AS DOUBLE)
          / (sqrt(CAST(list_sum(list_transform(e.embedding,
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE))
           * sqrt(CAST(list_sum(list_transform(q.qv,
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE)))
          AS cos
        FROM embeddings e, q WHERE e.vec_id <> q.query_id),
      nn AS (
        SELECT query_id, true_label, nlabel FROM (
          SELECT query_id, true_label, nlabel,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, id) AS rank
          FROM scored)
        WHERE rank <= 10),
      votes AS (SELECT query_id, true_label, nlabel,
          COUNT(*) AS votes
        FROM nn GROUP BY 1, 2, 3),
      win AS (SELECT query_id, true_label, nlabel AS pred_label,
          votes AS n_votes
        FROM votes
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY votes DESC, nlabel) = 1)
      SELECT query_id, CAST(true_label AS BIGINT) AS true_label,
        CAST(pred_label AS BIGINT) AS pred_label,
        CAST(n_votes AS BIGINT) AS n_votes,
        pred_label = true_label AS correct
      FROM win ORDER BY query_id"""),
    notes = "majority-vote kNN with smallest-label ties; broadcast " +
      "queries, prescreen + exact-decimal rescore")

  /** Top-k retrieval over int8-quantized vectors — the serving path after
    * quantization. Integer dot products: every score is exact integer
    * arithmetic, so ranking AND scores are hash-gated with no decimal
    * machinery. */
  val qAnnQuantized = GQuery("q_ann_quantized",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.quantizedTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""WITH qv AS (
        SELECT vec_id,
          list_transform(embedding, v -> CASE
            WHEN CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) = 0
              THEN 0
            ELSE CAST(FLOOR(CAST(v AS DOUBLE)
              / CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
              * 127.0) AS BIGINT) END) AS q,
          CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS s
        FROM embeddings),
      scored AS (
        SELECT b.vec_id AS query_id, a.vec_id AS id,
          list_sum(list_transform(list_zip(a.q, b.q),
            p -> p[1] * p[2])) AS dot,
          CAST(list_sum(list_transform(list_zip(a.q, b.q),
            p -> p[1] * p[2])) AS DOUBLE) * a.s * b.s / 16129.0 AS score
        FROM qv a, qv b WHERE b.vec_id < 5),
      ranked AS (
        SELECT query_id, id, dot, score,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score DESC, id) AS rnk
        FROM scored)
      SELECT query_id, CAST(rnk AS BIGINT) AS rank, id,
        CAST(dot AS BIGINT) AS dot, score
      FROM ranked WHERE rnk <= 10
      ORDER BY query_id, rank"""),
    notes = "dequantized-dot top-k over int8 codes; exact integer dot + 3-op rescale")

  /** PQ encode: every vector's 8 codebook codes — the 4-byte compressed
    * representation a PQ index stores per vector (64 floats → 8 nibbles).
    * Codes are exact-decimal argmins over the COMMITTED codebooks
    * ([[graft.operators.PqModel]]); the twin inlines the same augmented
    * matrices and replays every argmin bit-for-bit. */
  val qPqEncode = GQuery("q_pq_encode",
    (s, d) => Ann.pqEncode(Tables.embeddings(s, d), "vec_id", "embedding",
        graft.operators.PqModel.codebooks)
      .select(col("id").as("vec_id"), col("m"), col("code"))
      .orderBy(col("vec_id"), col("m")),
    Some {
      import graft.operators.PqModel
      val sub = PqModel.subDim
      val branches = PqModel.codebooks.zipWithIndex.flatMap { case (cb, m) =>
        Ann.augmentCodebook(cb).zipWithIndex.map { case (row, j) =>
          val lst = row.map(java.lang.Double.toString).mkString(", ")
          val a = m * sub + 1
          val b = m * sub + sub
          s"""SELECT vec_id, $m AS m, $j AS j,
            list_sum(list_transform(
              list_zip(list_concat(embedding[$a:$b], [CAST(1.0 AS FLOAT)]), [$lst]),
              p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18)))) AS d
          FROM embeddings"""
        }
      }.mkString("\n        UNION ALL\n        ")
      s"""WITH dots AS (
        $branches)
      SELECT vec_id, CAST(m AS BIGINT) AS m, CAST(j AS BIGINT) AS code FROM (
        SELECT vec_id, m, j,
          ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d DESC, j) AS r
        FROM dots) WHERE r = 1
      ORDER BY vec_id, m"""
    },
    notes = "PQ codes vs committed codebooks; twin replays every exact argmin")

  /** PQ asymmetric-distance top-k: queries score the COMPRESSED corpus
    * through 16-entry lookup tables (classic ADC). Scores accumulate and
    * rank entirely in exact decimal — ranks-only output like
    * [[qCosineTopK]]. */
  val qPqTopk = GQuery("q_pq_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.pqTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          graft.operators.PqModel.codebooks, k = 10)
        .orderBy(col("query_id"), col("rank"))
    },
    Some {
      import graft.operators.PqModel
      val sub = PqModel.subDim
      val enc = PqModel.codebooks.zipWithIndex.flatMap { case (cb, m) =>
        Ann.augmentCodebook(cb).zipWithIndex.map { case (row, j) =>
          val lst = row.map(java.lang.Double.toString).mkString(", ")
          val a = m * sub + 1
          val b = m * sub + sub
          s"""SELECT vec_id, $m AS m, $j AS j,
            list_sum(list_transform(
              list_zip(list_concat(embedding[$a:$b], [CAST(1.0 AS FLOAT)]), [$lst]),
              p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18)))) AS d
          FROM embeddings"""
        }
      }.mkString("\n        UNION ALL\n        ")
      val tbl = PqModel.codebooks.zipWithIndex.flatMap { case (cb, m) =>
        cb.zipWithIndex.map { case (row, j) =>
          val lst = row.map(java.lang.Double.toString).mkString(", ")
          val a = m * sub + 1
          val b = m * sub + sub
          s"""SELECT vec_id AS query_id, $m AS m, $j AS j,
            list_sum(list_transform(list_zip(embedding[$a:$b], [$lst]),
              p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18)))) AS contrib
          FROM embeddings WHERE vec_id < 5"""
        }
      }.mkString("\n        UNION ALL\n        ")
      s"""WITH encdots AS (
        $enc),
      codes AS (
        SELECT vec_id AS id, m, j AS code FROM (
          SELECT vec_id, m, j,
            ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d DESC, j) AS r
          FROM encdots) WHERE r = 1),
      tables AS (
        $tbl),
      scored AS (
        SELECT t.query_id, c.id, SUM(t.contrib) AS score
        FROM codes c JOIN tables t ON c.m = t.m AND c.code = t.j
        GROUP BY 1, 2),
      ranked AS (
        SELECT query_id, id,
          ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score DESC, id) AS rnk
        FROM scored)
      SELECT query_id, CAST(rnk AS BIGINT) AS rank, id
      FROM ranked WHERE rnk <= 10
      ORDER BY query_id, rank"""
    },
    notes = "ADC ranks over committed codebooks; decimal-ranked, ranks-only output")

  /** Per-label exact embedding centroid — the vector-aggregate primitive
    * under IVF training, cluster profiling, and dataset condensation.
    * Long-form (label, dim) rows so the decimal-exact mean hash-compares
    * against the DuckDB twin; see [[Ann.groupCentroids]] for the
    * shuffle-invariant shape. */
  val qEmbedCentroid = GQuery("q_embed_centroid",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.groupCentroids(emb, "label", "embedding")
        .select(col("grp").as("label"), col("dim").cast("long").as("dim"),
          col("centroid"), col("n"))
        .orderBy(col("label"), col("dim"))
    },
    Some("""SELECT label, ord - 1 AS dim,
        CAST(SUM(CAST((CASE WHEN abs(CAST(v AS DOUBLE)) < 1.4901161193847656e-8
              THEN 0.0 ELSE CAST(v AS DOUBLE) END) * 562949953421312.0
            AS DECIMAL(38,0))) AS DOUBLE)
          / (CAST(COUNT(*) AS DOUBLE) * 562949953421312.0) AS centroid,
        COUNT(*) AS n
      FROM (SELECT label, unnest(embedding) AS v,
              generate_subscripts(embedding, 1) AS ord
            FROM embeddings)
      GROUP BY 1, 2
      ORDER BY 1, 2"""))

  /** L2 normalization of the embedding corpus — the standard prep step
    * before cosine ANN / dot-product retrieval. Long-form components so
    * every unit value is hash-compared; see [[Ann.normExact]] for why the
    * norm is bit-portable across engines. */
  val qEmbedNormalize = GQuery("q_embed_normalize",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.l2NormalizeLong(emb, "vec_id", "embedding")
        .select(col("id").as("vec_id"), col("dim").cast("long").as("dim"),
          col("u"))
        .orderBy(col("vec_id"), col("dim"))
    },
    Some("""SELECT vec_id, ord - 1 AS dim,
        CASE WHEN nrm = 0 THEN 0.0 ELSE CAST(v AS DOUBLE) / nrm END AS u
      FROM (SELECT vec_id,
              sqrt(CAST(list_sum(list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,10))))
                AS DOUBLE)) AS nrm,
              unnest(embedding) AS v,
              generate_subscripts(embedding, 1) AS ord
            FROM embeddings)
      ORDER BY vec_id, dim"""))

  /** Symmetric int8 quantization of the embedding corpus (4× compression
    * before ANN serving / index shipping). Codes and per-vector scale both
    * hash-compared; floor-based bucketing makes the codes engine-exact. */
  val qEmbedQuantize = GQuery("q_embed_quantize",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.quantizeInt8(emb, "vec_id", "embedding")
        .select(col("id").as("vec_id"), col("dim").cast("long").as("dim"),
          col("q"), col("qscale"))
        .orderBy(col("vec_id"), col("dim"))
    },
    Some("""SELECT vec_id, ord - 1 AS dim,
        CASE WHEN qscale = 0 THEN 0
          ELSE CAST(FLOOR(CAST(v AS DOUBLE) / qscale * 127.0) AS INTEGER)
        END AS q,
        qscale
      FROM (SELECT vec_id,
              CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS qscale,
              unnest(embedding) AS v,
              generate_subscripts(embedding, 1) AS ord
            FROM embeddings)
      ORDER BY vec_id, dim"""))

  /** Per-cluster outliers: the 3 vectors farthest from their label's
    * exact centroid — hard-example / mislabel mining over embeddings.
    * Every distance bit is oracle-compared; the twin recomputes the
    * dyadic-exact centroids and the decimal-accumulated distances. */
  val qCentroidOutliers = GQuery("q_centroid_outliers",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.centroidOutliers(emb, "vec_id", "label", "embedding", k = 3)
        .select(col("grp").as("label"), col("rank"), col("id"), col("dist2"))
        .orderBy(col("label"), col("rank"))
    },
    Some("""WITH comp AS (
        SELECT vec_id, label,
          generate_subscripts(embedding, 1) - 1 AS dim,
          unnest(embedding) AS v
        FROM embeddings),
      cent AS (
        SELECT label, dim,
          CAST(SUM(CAST((CASE WHEN abs(CAST(v AS DOUBLE)) < 1.4901161193847656e-8
                THEN 0.0 ELSE CAST(v AS DOUBLE) END) * 562949953421312.0
              AS DECIMAL(38,0))) AS DOUBLE)
            / (CAST(COUNT(*) AS DOUBLE) * 562949953421312.0) AS c
        FROM comp GROUP BY 1, 2),
      dist AS (
        SELECT comp.label, vec_id,
          CAST(SUM(CAST((CAST(v AS DOUBLE) - c) * (CAST(v AS DOUBLE) - c)
            AS DECIMAL(28,12))) AS DOUBLE) AS dist2
        FROM comp JOIN cent ON comp.label = cent.label AND comp.dim = cent.dim
        GROUP BY 1, 2),
      ranked AS (
        SELECT label, vec_id, dist2,
          ROW_NUMBER() OVER (PARTITION BY label
            ORDER BY dist2 DESC, vec_id) AS rnk
        FROM dist)
      SELECT label, CAST(rnk AS BIGINT) AS rank, vec_id AS id, dist2
      FROM ranked WHERE rnk <= 3
      ORDER BY label, rank"""),
    notes = "top-3 farthest-from-centroid per label; exact centroid + decimal distance")

  /** Cluster compactness: per-(label, dim) variance around the exact
    * centroid — which clusters are tight and which dimensions spread.
    * Centroid, variance, and count all hash-compared. */
  val qClusterVariance = GQuery("q_cluster_variance",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.clusterVariance(emb, "label", "embedding")
        .select(col("grp").as("label"), col("dim").cast("long").as("dim"),
          col("centroid"), col("variance"), col("n"))
        .orderBy(col("label"), col("dim"))
    },
    Some("""WITH comp AS (
        SELECT label,
          generate_subscripts(embedding, 1) - 1 AS dim,
          unnest(embedding) AS v
        FROM embeddings),
      cent AS (
        SELECT label, dim,
          CAST(SUM(CAST((CASE WHEN abs(CAST(v AS DOUBLE)) < 1.4901161193847656e-8
                THEN 0.0 ELSE CAST(v AS DOUBLE) END) * 562949953421312.0
              AS DECIMAL(38,0))) AS DOUBLE)
            / (CAST(COUNT(*) AS DOUBLE) * 562949953421312.0) AS c
        FROM comp GROUP BY 1, 2)
      SELECT comp.label, comp.dim AS dim, ANY_VALUE(c) AS centroid,
        CAST(SUM(CAST((CAST(v AS DOUBLE) - c) * (CAST(v AS DOUBLE) - c)
            AS DECIMAL(28,12))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS variance,
        COUNT(*) AS n
      FROM comp JOIN cent ON comp.label = cent.label AND comp.dim = cent.dim
      GROUP BY 1, 2
      ORDER BY 1, 2"""),
    notes = "per-(label,dim) variance around the dyadic-exact centroid")

  /** LSH-bucketed ANN (the 100 TB path): hyperplane signatures +
    * query-adaptive multiprobe, configured by [[Ann.deriveLshConfig]] from
    * the corpus's measured neighbor cosine (≈0.25 on this synthetic corpus —
    * weak locality, so the tuner maximizes recall inside a relaxed candidate
    * budget; see LshRecallSpec for the measurement and the clustered-data
    * case where 0.9 recall @ ≤15% candidates holds). Approximate by
    * construction but fully deterministic — gated hash-exact against the
    * committed [[AnnGolden]] top-k (determinism + regression pin). */
  val qAnnLsh = GQuery("q_ann_lsh",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 5)
      val cfg = Ann.deriveLshConfig(neighborCos = 0.25,
        targetRecall = 0.9, maxCandidateFraction = 0.6)
      Ann.lshCosineTopK(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding",
          dim = 64, nPlanes = cfg.nPlanes, k = 10,
          multiProbeBits = cfg.multiProbeBits, nTables = cfg.nTables)
        .select(col("query_id"), col("rank"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(AnnGolden.oracle(AnnGolden.lshRows)),
    notes = "approximate ANN (auto-tuned LSH); hash-exact vs committed " +
      "deterministic golden (AnnGolden), recall pinned in LshRecallSpec")

  /** IVF ANN (the clustered-corpus scale path, complementing hyperplane
    * LSH): spherical k-means coarse quantizer trained on a deterministic
    * sample, one-bucket assignment per corpus vector, nProbe probing, exact
    * re-rank. Approximate by construction but deterministic — gated
    * hash-exact against the committed [[AnnGolden]] top-k; recall pinned in
    * LshRecallSpec (≥0.9 at ~10% candidates on clustered data). */
  val qAnnIvf = GQuery("q_ann_ivf",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 5)
      val centroids = Ann.trainIvfCentroids(emb, "vec_id", "embedding",
        k = 16, sampleMod = 7, iters = 8)
      Ann.ivfCosineTopK(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", centroids, nProbe = 4, k = 10)
        .select(col("query_id"), col("rank"), col("id"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(AnnGolden.oracle(AnnGolden.ivfRows)),
    notes = "approximate ANN (IVF); hash-exact vs committed deterministic " +
      "golden (AnnGolden), recall pinned in LshRecallSpec")

  // ---- ANN candidate-set oracles ------------------------------------
  // The ANN top-k output is approximate by construction (rows-only), but
  // the BLOCKING sets are deterministic: planes and centroids are plan
  // literals, and the exact-decimal projections are order-independent, so
  // the twin recomputes set membership bit-for-bit. Recall stays pinned in
  // LshRecallSpec; membership goes under the hash-exact gate here.
  private val AnnCandDim = 64
  private val AnnCandPlanes = 8
  private val AnnCandTables = 4
  private val AnnCandProbes = 4
  private val IvfCandProbes = 4

  /** The exact-decimal per-element product sum — DuckDB mirror of
    * [[Ann.dotExactDec]] (same products, any summation order). */
  private def dotDecSql(bList: String): String =
    s"""list_sum(list_transform(list_zip(embedding, [$bList]),
       p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18))))"""

  /** LSH candidate set (the q_ann_lsh blocking geometry — per-table
    * signatures + query-adaptive multiprobe) under exact arithmetic: the
    * twin inlines all ${AnnCandTables}×${AnnCandPlanes} ±1 plane rows and
    * recomputes signatures, flip order, and probes in SQL. */
  val qAnnLshCand = GQuery("q_ann_lsh_cand",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 5)
      Ann.lshCandidatesExact(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding",
          dim = AnnCandDim, nPlanes = AnnCandPlanes,
          multiProbeBits = AnnCandProbes, nTables = AnnCandTables)
        .orderBy(col("query_id"), col("id"))
    },
    Some {
      def proj(pl: Seq[Double]): String =
        dotDecSql(pl.map(w => if (w > 0) "1.0" else "-1.0").mkString(", "))
      val csig = (0 until AnnCandTables).map { t =>
        val sig = Ann.hyperplanes(AnnCandDim, AnnCandPlanes, t).zipWithIndex
          .map { case (pl, i) =>
            s"(CASE WHEN ${proj(pl)} > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
          }.mkString("\n          + ")
        s"SELECT vec_id AS id, $t AS t, ($sig) AS sig FROM embeddings"
      }.mkString("\n        UNION ALL\n        ")
      val qproj = (for {
        t <- 0 until AnnCandTables
        (pl, p) <- Ann.hyperplanes(AnnCandDim, AnnCandPlanes, t).zipWithIndex
      } yield s"SELECT vec_id AS query_id, $t AS t, $p AS p, ${proj(pl)} AS proj" +
        " FROM embeddings WHERE vec_id < 5")
        .mkString("\n        UNION ALL\n        ")
      s"""WITH csig AS (
        $csig),
      qproj AS (
        $qproj),
      qsig AS (
        SELECT query_id, t,
          CAST(SUM(CASE WHEN proj > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS sig0
        FROM qproj GROUP BY query_id, t),
      flips AS (
        SELECT query_id, t, p,
          ROW_NUMBER() OVER (PARTITION BY query_id, t ORDER BY abs(proj), p) AS r
        FROM qproj),
      probes AS (
        SELECT query_id, t, sig0 AS sig FROM qsig
        UNION ALL
        SELECT f.query_id, f.t, xor(s.sig0, CAST(1 << f.p AS BIGINT)) AS sig
        FROM flips f JOIN qsig s ON f.query_id = s.query_id AND f.t = s.t
        WHERE f.r <= $AnnCandProbes),
      cand AS (
        SELECT DISTINCT p.query_id, c.id
        FROM csig c JOIN probes p ON c.t = p.t AND c.sig = p.sig)
      SELECT query_id, id FROM cand ORDER BY query_id, id"""
    },
    notes = "LSH blocking set under exact arithmetic; planes inlined in twin")

  /** IVF assignment/probe candidate set with the COMMITTED centroid model
    * ([[IvfModel]]): the twin inlines the 16 centroid vectors and
    * recomputes every argmax assignment and probe list. */
  val qAnnIvfCand = GQuery("q_ann_ivf_cand",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 5)
      Ann.ivfCandidatesExact(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding",
          IvfModel.centroids, nProbe = IvfCandProbes)
        .orderBy(col("query_id"), col("id"))
    },
    Some {
      val cd = IvfModel.centroids.zipWithIndex.map { case (cv, c) =>
        s"SELECT vec_id, $c AS c, " +
          dotDecSql(cv.map(java.lang.Double.toString).mkString(", ")) +
          " AS d FROM embeddings"
      }.mkString("\n        UNION ALL\n        ")
      s"""WITH dots AS (
        $cd),
      bucket AS (
        SELECT vec_id AS id, c AS bucket FROM (
          SELECT vec_id, c,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, c) AS r
          FROM dots) WHERE r = 1),
      probes AS (
        SELECT vec_id AS query_id, c AS bucket FROM (
          SELECT vec_id, c,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, c) AS r
          FROM dots WHERE vec_id < 5) WHERE r <= $IvfCandProbes),
      cand AS (
        SELECT DISTINCT p.query_id, b.id
        FROM bucket b JOIN probes p ON b.bucket = p.bucket)
      SELECT query_id, id FROM cand ORDER BY query_id, id"""
    },
    notes = "IVF blocking set; committed centroids inlined in twin")

  /** Embedding-cosine near-duplicate pairs, blocked on a random-hyperplane
    * LSH bucket — the 100 TB blocking key: within-bucket pair volume is
    * ≈ n²/2^nPlanes instead of quadratic-within-a-label, and nPlanes scales
    * the bucket count with the corpus. The planes are plan literals (seeded
    * SplitMix64 ±1 matrix, [[Ann.hyperplanes]]) and the signature bits come
    * from ORDER-INDEPENDENT exact-decimal projections, so the DuckDB twin
    * inlines the identical matrix and recomputes every bucket bit-for-bit —
    * the blocked pair set itself is under the hash-exact gate, not just the
    * cosine arithmetic.
    *
    * The synthetic embeddings have no near-dup pairs above 0.99, so the gate
    * PLANTS them: every 20th vector gains an identical copy at an offset id
    * (cos = 1 exactly → identical signature → same bucket, guaranteed found)
    * — mirrored in the twin; non-empty result. */
  private val NeardupDim = 64
  private val NeardupPlanes = 10
  val qEmbeddingNearDup = GQuery("q_embedding_neardup",
    (s, d) => {
      val base = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val planted = base.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      val e = base.unionByName(planted)
        .withColumn("bucket", Ann.hyperplaneSigExact(col("embedding"),
          NeardupDim, NeardupPlanes))
      val a = e.select(col("bucket"), col("vec_id").as("id_a"),
        col("embedding").as("v_a"))
      val b = e.select(col("bucket"), col("vec_id").as("id_b"),
        col("embedding").as("v_b"))
      a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
        // two-phase: cheap double-precision prefilter with margin (decimal
        // arithmetic on every pair measured 22 s at sf0.1), then the exact
        // decimal cosine only on survivors — result identical, the margin
        // (1e-3 ≫ double summation error ~1e-12) guarantees no false drops
        .filter(Ann.cosineFast(col("v_a"), col("v_b")) > 0.989)
        .withColumn("cos", Ann.cosine(col("v_a"), col("v_b")))
        .filter(col("cos") > 0.99)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      // the twin recomputes the LSH bucket from the SAME inlined ±1 matrix
      // with the same exact-decimal per-element products (order-independent
      // accumulation → identical sign bits in any engine)
      val planes = Ann.hyperplanes(NeardupDim, NeardupPlanes)
      def proj(plane: Seq[Double]): String = {
        val lst = plane.map(w => if (w > 0) "1.0" else "-1.0").mkString(", ")
        s"""list_sum(list_transform(list_zip(embedding, [$lst]),
           p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18))))"""
      }
      val bucket = planes.zipWithIndex.map { case (pl, i) =>
        s"(CASE WHEN ${proj(pl)} > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
      }.mkString("\n        + ")
      s"""WITH emb AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000, embedding
        FROM embeddings WHERE vec_id % 20 = 0),
      sig AS (
        SELECT vec_id, embedding,
          ($bucket) AS bucket
        FROM emb)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sig a JOIN sig b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
            p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE)
        / (sqrt(CAST(list_sum(list_transform(a.embedding,
            x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE))
         * sqrt(CAST(list_sum(list_transform(b.embedding,
            x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE)))
        > 0.99
      ORDER BY id_a, id_b"""
    })

  /** PARAPHRASE mining — the hybrid text+embedding curation diagnostic:
    * pairs that are EMBEDDING-near (cosine > 0.99 within an exact-decimal
    * LSH bucket) but LEXICALLY far (shingle Jaccard < 0.3) — semantically
    * duplicate content that string dedup can never see. Planted pairs
    * reuse a doc's embedding with its NEIGHBOR's text (same semantics by
    * construction, different surface), mirrored in the twin. Blocking and
    * two-phase cosine are [[qEmbeddingNearDup]]'s; the lexical check runs
    * on hashed shingle sets over the candidate pairs only. */
  val qParaphraseMining = GQuery("q_paraphrase_mining",
    (s, d) => {
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val joined = emb.join(docs, col("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("embedding"), col("text"))
      val donor = docs.select((col("doc_id") + 1).as("vec_id"),
        col("text").as("t2"))
      val planted = joined.filter(col("vec_id") % 20 === 0)
        .join(donor, Seq("vec_id"))
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"),
          col("t2").as("text"))
      val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
      val e = joined.unionByName(planted)
        .withColumn("bucket", Ann.hyperplaneSigExact(col("embedding"),
          NeardupDim, NeardupPlanes))
        .withColumn("grams",
          graft.functions.HashedShingleSet.hashedShingles(norm, 5))
      val a = e.select(col("bucket"), col("vec_id").as("id_a"),
        col("embedding").as("v_a"), col("grams").as("g_a"))
      val b = e.select(col("bucket"), col("vec_id").as("id_b"),
        col("embedding").as("v_b"), col("grams").as("g_b"))
      a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
        .filter(Ann.cosineFast(col("v_a"), col("v_b")) > 0.989)
        .filter(Ann.cosine(col("v_a"), col("v_b")) > 0.99)
        .withColumn("jaccard", graft.functions.JaccardSortedLongArrays
          .jaccardSortedLong(col("g_a"), col("g_b")))
        .filter(col("jaccard") < 0.3)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val planes = Ann.hyperplanes(NeardupDim, NeardupPlanes)
      def proj(plane: Seq[Double]): String = {
        val lst = plane.map(w => if (w > 0) "1.0" else "-1.0").mkString(", ")
        s"""list_sum(list_transform(list_zip(embedding, [$lst]),
           p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18))))"""
      }
      val bucket = planes.zipWithIndex.map { case (pl, i) =>
        s"(CASE WHEN ${proj(pl)} > 0 THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)"
      }.mkString("\n        + ")
      val sh = """list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), i + 1, 5)))"""
      s"""WITH src AS (
        SELECT e.vec_id, e.embedding, d.text
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
      corpus AS (
        SELECT vec_id, embedding, text FROM src
        UNION ALL
        SELECT s.vec_id + 100000, s.embedding, d2.text
        FROM src s JOIN documents d2 ON d2.doc_id = s.vec_id - 1
        WHERE s.vec_id % 20 = 0),
      sig AS (
        SELECT vec_id, embedding, $sh AS sh,
          ($bucket) AS bucket
        FROM corpus),
      cand AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.sh AS sh_a, b.sh AS sh_b
        FROM sig a JOIN sig b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        WHERE CAST(list_sum(list_transform(list_zip(a.embedding, b.embedding),
              p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE)
          / (sqrt(CAST(list_sum(list_transform(a.embedding,
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE))
           * sqrt(CAST(list_sum(list_transform(b.embedding,
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE)))
          > 0.99),
      scored AS (
        SELECT id_a, id_b,
          CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
            / CAST(len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)) AS DOUBLE)
            AS jaccard
        FROM cand)
      SELECT id_a, id_b, jaccard FROM scored
      WHERE jaccard < 0.3
      ORDER BY id_a, id_b"""
    },
    notes = "embedding-near, lexically-far pairs; planted same-embedding/neighbor-text copies")

  /** Multimodal plumbing: binary media table synthesized from documents,
    * features via per-partition stub codec (mapPartitions — the mapInPandas
    * batch shape). The PLUMBING outputs (id routing, modality assignment,
    * binary payload length through encode + mapPartitions + Dataset
    * round-trip) are hash-exact against the oracle; the float feature
    * vector itself stays untested by the twin — it is the stub kernel. */
  val qMediaFeatures = GQuery("q_media_features",
    (s, d) => {
      import graft.operators.Multimodal
      Multimodal.extractFeatures(s,
          Multimodal.mediaFromDocuments(s, Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("modality"), col("n_bytes"))
        .orderBy(col("media_id"))
    },
    Some("""SELECT doc_id AS media_id,
        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
          ELSE 'video' END AS modality,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents ORDER BY media_id"""))

  /** Containment dedup (the "doc B is a truncated copy of doc A" case):
    * winnowing fingerprints block, exact delimiter-padded substring verify
    * ([[Dedup.containmentPairs]] — selection is content-local, so blocking
    * recall is 1.0 for token-aligned containment and the pair set is
    * EXACT). The twin brute-forces containment over all pairs. The corpus
    * has no natural slices, so the gate PLANTS them: every 25th doc gains a
    * 60%-prefix copy at an offset id — mirrored in the twin. */
  val qContainmentDedup = GQuery("q_containment_dedup",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val withNorm = docs.withColumn("__norm",
          lower(trim(regexp_replace(col("text"), "\\s+", " "))))
        .withColumn("__toks", split(col("__norm"), " "))
        .withColumn("__ntok", size(col("__toks")))
      val planted = withNorm.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"),
          concat_ws(" ", slice(col("__toks"), lit(1),
            greatest(lit(1), expr("(__ntok * 3) div 5")).cast("int")))
            .as("text"))
      Dedup.containmentPairs(docs.unionByName(planted), "doc_id", "text",
          k = 8, w = 4)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH norm0 AS (
        SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
        FROM documents),
      planted AS (
        SELECT doc_id + 200000 AS doc_id,
          array_to_string(
            (string_split(norm, ' '))[1:greatest(1,
              (3 * len(string_split(norm, ' '))) // 5)], ' ') AS norm
        FROM norm0 WHERE doc_id % 25 = 0),
      tok AS (
        SELECT doc_id, norm, len(string_split(norm, ' ')) AS ntok
        FROM (SELECT * FROM norm0 UNION ALL SELECT * FROM planted))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM tok a JOIN tok b
        ON a.doc_id <> b.doc_id AND b.ntok >= 11 AND a.ntok >= b.ntok
      WHERE contains(' ' || a.norm || ' ', ' ' || b.norm || ' ')
      ORDER BY id_a, id_b"""),
    notes = "winnowing-blocked containment; twin brute-forces all pairs")

  /** Boilerplate removal (the training-data cleaning step similarity dedup
    * can't do: a repeated FOOTER inside otherwise-distinct docs). Lines
    * shared by ≥ 25 distinct docs are stripped; output is per-doc removed
    * count + cleaned-text md5. The corpus has no line structure, so the
    * gate PLANTS it: every 3rd doc gains one of two rotating footer lines
    * (high df → removed) and every 50th doc a doc-unique note line (df = 1
    * → kept) — both mirrored in the twin, which independently recomputes
    * line frequencies, the strip, and the md5 of the rebuilt text. */
  val qBoilerplate = GQuery("q_boilerplate",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val planted = docs
        .withColumn("text",
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit("\n"),
              when(col("doc_id") % 2 === 0,
                lit("subscribe to our newsletter today"))
                .otherwise(lit("all rights reserved worldwide"))))
            .otherwise(col("text")))
        .withColumn("text",
          when(col("doc_id") % 50 === 0,
            concat(col("text"), lit("\ndocument note "),
              col("doc_id").cast("string")))
            .otherwise(col("text")))
      Dedup.boilerplateRemoval(planted, "doc_id", "text", minDocs = 25L)
        .withColumnRenamed("id", "doc_id")
    },
    Some("""WITH docs AS (
        SELECT doc_id,
          CASE WHEN doc_id % 50 = 0 THEN base2 || chr(10) || 'document note ' || CAST(doc_id AS VARCHAR)
               ELSE base2 END AS text
        FROM (
          SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN text || chr(10) ||
              (CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter today'
                    ELSE 'all rights reserved worldwide' END)
                 ELSE text END AS base2
          FROM documents)),
      split_docs AS (
        SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
      idx AS (
        SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS line_no
        FROM split_docs),
      lines AS (
        SELECT doc_id, CAST(line_no AS INTEGER) AS line_no,
          ls[CAST(line_no AS INTEGER)] AS line
        FROM idx),
      boiler AS (
        SELECT line FROM lines GROUP BY line
        HAVING COUNT(DISTINCT doc_id) >= 25),
      flagged AS (
        SELECT l.doc_id, l.line_no, l.line,
          (b.line IS NOT NULL) AS is_boiler
        FROM lines l LEFT JOIN boiler b ON l.line = b.line)
      SELECT doc_id,
        CAST(COUNT(*) FILTER (WHERE is_boiler) AS BIGINT) AS n_removed,
        md5(COALESCE(string_agg(line, chr(10) ORDER BY line_no)
          FILTER (WHERE NOT is_boiler), '')) AS clean_md5
      FROM flagged GROUP BY doc_id ORDER BY doc_id"""),
    notes = "planted footers; twin recomputes line df, strip, and rebuilt-text md5")

  /** Cross-doc PARAGRAPH dedup, first-occurrence-wins ([[Dedup
    * .paragraphDedup]]): the sub-document pass between whole-doc dedup and
    * boilerplate removal — a passage shared by just TWO docs survives the
    * df-threshold boilerplate strip but exactly one copy survives here.
    * The corpus has no paragraph structure, so the gate PLANTS it: every
    * 5th doc gains a shared paragraph (and docs ≡3 mod 5 a case-variant of
    * it — exercising the lower+trim normalization), every 13th doc the same
    * tail paragraph TWICE (intra-doc dup). The twin independently recomputes
    * winner election (rank-1 over (doc_id, pos) per normalized paragraph)
    * and the md5 of the rebuilt text. */
  /** Within-doc repeated-line removal ([[graft.operators.Dedup
    * .lineDedup]]): every 7th document gets a planted duplicated line
    * (scraper echo); per doc the first occurrence survives and the clean
    * text's md5 is compared. Decision is per-doc array algebra — zero
    * data shuffles; the twin replays the identical list semantics. */
  val qLineDedup = GQuery("q_line_dedup",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val planted = docs.withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit("\necho line beta\nmiddle\necho line beta")))
          .otherwise(col("text")))
      Dedup.lineDedup(planted, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    },
    Some("""WITH docs AS (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN text || chr(10) || 'echo line beta'
            || chr(10) || 'middle' || chr(10) || 'echo line beta'
          ELSE text END AS text
        FROM documents),
      ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM docs),
      kept AS (SELECT doc_id, l,
          list_filter(list_transform(l, (x, i) -> {'x': x, 'i': i}),
            s -> list_position(l, s.x) = s.i) AS k
        FROM ls)
      SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines,
        CAST(len(l) - len(k) AS BIGINT) AS n_removed,
        md5(array_to_string(list_transform(k, s -> s.x), chr(10))) AS clean_md5
      FROM kept ORDER BY doc_id"""),
    notes = "per-doc first-occurrence line dedup; zero-shuffle array " +
      "algebra, md5-verified clean text")

  val qParagraphDedup = GQuery("q_paragraph_dedup",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val planted = docs
        .withColumn("text",
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit("\ncommon paragraph alpha")))
            .when(col("doc_id") % 5 === 3,
              concat(col("text"), lit("\nCommon Paragraph Alpha")))
            .otherwise(col("text")))
        .withColumn("text",
          when(col("doc_id") % 13 === 0,
            concat(col("text"),
              lit("\nrepeated tail paragraph\nrepeated tail paragraph")))
            .otherwise(col("text")))
      Dedup.paragraphDedup(planted, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    },
    Some("""WITH docs AS (
        SELECT doc_id,
          CASE WHEN doc_id % 13 = 0 THEN base2 || chr(10) || 'repeated tail paragraph' || chr(10) || 'repeated tail paragraph'
               ELSE base2 END AS text
        FROM (
          SELECT doc_id,
            CASE WHEN doc_id % 5 = 0 THEN text || chr(10) || 'common paragraph alpha'
                 WHEN doc_id % 5 = 3 THEN text || chr(10) || 'Common Paragraph Alpha'
                 ELSE text END AS base2
          FROM documents)),
      split_docs AS (
        SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs),
      idx AS (
        SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS line_no
        FROM split_docs),
      paras AS (
        SELECT doc_id, CAST(line_no AS INTEGER) AS pos,
          ls[CAST(line_no AS INTEGER)] AS para
        FROM idx),
      flagged AS (
        SELECT doc_id, pos, para,
          (lower(trim(para)) <> '' AND
           ROW_NUMBER() OVER (PARTITION BY lower(trim(para))
             ORDER BY doc_id, pos) > 1) AS is_dup
        FROM paras)
      SELECT doc_id,
        CAST(COUNT(*) FILTER (WHERE is_dup) AS BIGINT) AS n_removed,
        md5(COALESCE(string_agg(para, chr(10) ORDER BY pos)
          FILTER (WHERE NOT is_dup), '')) AS clean_md5
      FROM flagged GROUP BY doc_id ORDER BY doc_id"""),
    notes = "planted shared/case-variant/intra-doc paragraphs; twin recomputes winner election and rebuilt-text md5")

  /** Benchmark DECONTAMINATION ([[Dedup.contaminationPairs]]): the 13-gram
    * overlap rule between the training corpus and an eval set. The harness
    * derives the "benchmark" from the corpus itself — every 97th doc
    * contributes its tokens 3..32 as an eval item — so each bench item
    * contaminates at least its own source doc (plus any doc sharing the
    * 13-token run: exact/near dups), making the gate non-vacuous with zero
    * synthetic text. The twin brute-forces the distinct shared-gram count
    * per (doc, bench item) from raw token arrays. */
  val qDecontaminate = GQuery("q_decontaminate",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val toks = TextFeatures.wsTokens(lower(col("text")))
      val bench = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("bench_id"),
          concat_ws(" ", slice(toks, 3, 30)).as("btext"))
      Dedup.contaminationPairs(docs, "doc_id", "text",
          bench, "bench_id", "btext", n = 13)
        .orderBy(col("doc_id"), col("bench_id"))
    },
    Some("""WITH toks AS (
        SELECT doc_id,
          string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
        FROM documents),
      bench AS (
        SELECT doc_id AS bench_id, t[3:32] AS bt
        FROM toks WHERE doc_id % 97 = 0),
      bgram AS (
        SELECT DISTINCT bench_id,
          array_to_string(bt[CAST(i AS INTEGER):CAST(i AS INTEGER) + 12], ' ') AS gram
        FROM (SELECT bench_id, bt, unnest(range(1, len(bt) - 11)) AS i
              FROM bench WHERE len(bt) >= 13)),
      dgram AS (
        SELECT DISTINCT doc_id,
          array_to_string(t[CAST(i AS INTEGER):CAST(i AS INTEGER) + 12], ' ') AS gram
        FROM (SELECT doc_id, t, unnest(range(1, len(t) - 11)) AS i
              FROM toks WHERE len(t) >= 13))
      SELECT doc_id, bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM dgram JOIN bgram USING (gram)
      GROUP BY doc_id, bench_id
      ORDER BY doc_id, bench_id"""),
    notes = "13-gram decontamination; bench derived from the corpus; twin brute-forces shared-gram counts")

  /** Deterministic ~20% corpus sample ([[graft.operators.Sampling
    * .deterministicSample]]): the keep decision is a pure function of the
    * row key (md5 hex prefix vs threshold), so the twin reproduces the
    * EXACT row set — what RAND() < p can never gate. Map-side only, no
    * shuffle. */
  val qSampleDet = GQuery("q_sample_det",
    (s, d) => graft.operators.Sampling.deterministicSample(
        Tables.documents(s, d), "doc_id", permille = 200, salt = "graft")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, lang FROM documents
      WHERE substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 4) < '3333'
      ORDER BY doc_id"""),
    notes = "md5-threshold deterministic sampling; twin reproduces the exact row set")

  /** SOURCE MIXING: per-language deterministic rates (en 80%, de 30%,
    * fr 10%, others 50%) — the data-mix recipe as ONE map-side CASE filter
    * ([[graft.operators.Sampling.mixSample]]); the twin reproduces the
    * exact mixed sample from the same hex thresholds. */
  val qMixSample = GQuery("q_mix_sample",
    (s, d) => graft.operators.Sampling.mixSample(
        Tables.documents(s, d), "doc_id", "lang",
        rates = Map("en" -> 800, "de" -> 300, "fr" -> 100),
        defaultPermille = 500, salt = "mix")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, lang FROM documents
      WHERE substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) <
        CASE lang WHEN 'en' THEN 'cccc' WHEN 'de' THEN '4ccc'
          WHEN 'fr' THEN '1999' ELSE '8000' END
      ORDER BY doc_id"""),
    notes = "per-stratum md5-threshold mixing; twin reproduces the exact sample")

  /** QUALITY-STRATIFIED sampling (soft quality pruning): docs ranked into
    * quartiles per language by the oracle-proven quality score (total order
    * via the doc_id tiebreak), then sampled at per-quartile rates — keep
    * all of the best quartile, 50% of the next, down to 5% of the worst.
    * The ntile window sorts WITHIN the language partition only (the
    * partition key bounds the sort at scale); the keep decision is the same
    * md5-threshold primitive, so the twin reproduces the exact row set. */
  val qStratifiedSample = GQuery("q_stratified_sample",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("__q"), col("doc_id"))
      val tiled = Tables.documents(s, d)
        .withColumn("__q", TextFeatures.qualityScoreFast(col("text")))
        .withColumn("tile", ntile(4).over(w).cast("string"))
      graft.operators.Sampling.mixSample(tiled, "doc_id", "tile",
          rates = Map("4" -> 1000, "3" -> 500, "2" -> 200),
          defaultPermille = 50, salt = "strat")
        .select(col("doc_id"), col("lang"), col("tile").cast("long").as("tile"))
        .orderBy(col("doc_id"))
    },
    Some {
      val stop = TextFeatures.enStopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH f AS (
        SELECT doc_id, lang,
          CAST(len(text) AS DOUBLE) AS n_chars,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> len(t) > 0)) AS DOUBLE) AS n_toks,
          CAST(len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g'))
            AS DOUBLE) AS n_punct,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> len(t) > 0 AND lower(t) IN ($stop))) AS DOUBLE) AS n_stop
        FROM documents),
      q AS (
        SELECT doc_id, lang,
          ((CASE WHEN n_chars >= 100 AND n_chars <= 20000 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN (CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) < 0.2 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN (CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END) > 0.05 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN n_toks > 0 AND n_chars / n_toks >= 3 AND n_chars / n_toks <= 12 THEN 1.0 ELSE 0.0 END)
          ) / 4.0 AS quality
        FROM f),
      tiled AS (
        SELECT doc_id, lang,
          ntile(4) OVER (PARTITION BY lang ORDER BY quality, doc_id) AS tile
        FROM q)
      SELECT doc_id, lang, CAST(tile AS BIGINT) AS tile FROM tiled
      WHERE tile = 4 OR
        substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE tile WHEN 3 THEN '8000' WHEN 2 THEN '3333' ELSE '0ccc' END
      ORDER BY doc_id"""
    },
    notes = "per-lang quality quartiles + per-stratum md5 sampling; twin reproduces the exact row set")

  /** TEMPERATURE RESAMPLING ([[graft.operators.Sampling.temperatureSample]]):
    * per-language keep rate √(n_min/n_lang) — α=0.5 multilingual
    * balancing. sqrt and the ×65536 threshold scaling are both exact /
    * correctly-rounded in every engine, so the twin recomputes the EXACT
    * keep-set from raw counts. */
  val qTemperatureSample = GQuery("q_temperature_sample",
    (s, d) => graft.operators.Sampling.temperatureSample(
        Tables.documents(s, d), "doc_id", "lang", salt = "temp")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")),
    Some("""WITH c AS (
        SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY 1),
      m AS (SELECT MIN(cnt) AS mn FROM c),
      r AS (SELECT lang,
              sqrt(CAST(mn AS DOUBLE) / CAST(cnt AS DOUBLE)) AS rate
            FROM c, m)
      SELECT d.doc_id, d.lang
      FROM documents d JOIN r USING (lang)
      WHERE rate >= 1.0
         OR substr(md5('temp:' || CAST(doc_id AS VARCHAR)), 1, 4) <
            printf('%04x', CAST(FLOOR(rate * 65536.0) AS BIGINT))
      ORDER BY doc_id"""),
    notes = "alpha=0.5 temperature balancing; twin reproduces the exact keep-set")

  /** SLIDING-WINDOW CHUNKING ([[graft.operators.Sampling.slidingChunks]]):
    * 64-token windows every 32 tokens over each document — the
    * tokenize-and-chunk step before training export; every chunk's text
    * hash-compared. Map-side only. */
  val qChunkSliding = GQuery("q_chunk_sliding",
    (s, d) => graft.operators.Sampling.slidingChunks(
        Tables.documents(s, d), "doc_id", "text", window = 64, stride = 32)
      .orderBy(col("doc_id"), col("chunk_id")),
    Some("""WITH t AS (
        SELECT doc_id,
          list_filter(string_split_regex(text, '\s+'),
            w -> len(w) > 0) AS toks
        FROM documents),
      s AS (
        SELECT doc_id, toks,
          unnest(generate_series(0, greatest(len(toks) - 1, 0), 32)) AS start
        FROM t),
      c AS (
        SELECT doc_id, start,
          list_slice(toks, start + 1, start + 64) AS chunk
        FROM s)
      SELECT doc_id, CAST(start / 32 AS BIGINT) AS chunk_id,
        CAST(start AS BIGINT) AS start,
        CAST(len(chunk) AS BIGINT) AS n_tokens,
        array_to_string(chunk, ' ') AS chunk_text
      FROM c WHERE len(chunk) > 0
      ORDER BY doc_id, chunk_id"""),
    notes = "sliding token windows with overlap; chunk text hash-exact")

  /** TOKEN-BUDGET PACKING ([[graft.operators.Sampling.packChunks]]):
    * documents packed into ~2000-token training chunks per language, in
    * doc_id order — deterministic window cumsum, so the twin recomputes the
    * exact chunk assignment and totals. */
  val qPackChunks = GQuery("q_pack_chunks",
    (s, d) => graft.operators.Sampling.packChunks(
        Tables.documents(s, d), "lang", "doc_id", "text", budget = 2000L)
      .orderBy(col("lang"), col("chunk_id")),
    Some("""WITH t AS (
        SELECT lang, doc_id,
          CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
            t -> len(t) > 0)) AS BIGINT) AS ntok
        FROM documents),
      c AS (
        SELECT lang, ntok,
          SUM(ntok) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t)
      SELECT lang, chunk_id,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(ntok) AS BIGINT) AS n_tokens
      FROM (SELECT lang, ntok,
        CAST((greatest(cum, 1) - 1) // 2000 AS BIGINT) AS chunk_id FROM c)
      GROUP BY lang, chunk_id
      ORDER BY lang, chunk_id"""),
    notes = "per-language sequence packing; twin recomputes chunk assignment exactly")

  /** DETERMINISTIC TRAIN/VAL/TEST SPLIT ([[graft.operators.Sampling
    * .splitAssign]]): md5-bucket ranges partition the corpus 80/10/10 —
    * a doc can never migrate between splits across runs (eval
    * contamination), and the twin replays the exact assignment from the
    * same hex thresholds. Verified by per-(split, lang) counts + char
    * mass over the whole corpus. */
  val qSplitDet = GQuery("q_split_det",
    (s, d) => graft.operators.Sampling.splitAssign(
        Tables.documents(s, d), "doc_id",
        Seq("train" -> 800, "val" -> 100, "test" -> 100), salt = "split")
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"), col("lang")),
    Some("""SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM (SELECT lang, n_chars,
        CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
               < 'cccc' THEN 'train'
             WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
               < 'e666' THEN 'val'
             ELSE 'test' END AS split
        FROM documents)
      GROUP BY split, lang ORDER BY split, lang"""),
    notes = "md5-range train/val/test partition; twin replays the exact assignment")

  /** GLOBAL DETERMINISTIC SHUFFLE ([[graft.operators.Sampling
    * .deterministicShuffle]]): dense global training-order rank in
    * md5-of-key order WITHOUT a global sort — the hex prefix shards the
    * keyspace into ranges whose lexicographic order IS the global order,
    * so ranking is a bounded per-shard window plus a broadcast offset
    * join. The twin computes the same rank with a plain ROW_NUMBER. */
  val qShuffleDet = GQuery("q_shuffle_det",
    (s, d) => graft.operators.Sampling.deterministicShuffle(
        Tables.documents(s, d), "doc_id", salt = "shuf")
      .select(col("doc_id"), col("shuffle_rank"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
        CAST(ROW_NUMBER() OVER (
          ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
          AS shuffle_rank
      FROM documents ORDER BY doc_id"""),
    notes = "sharded global rank == single-partition ROW_NUMBER, proven by the twin")

  /** PER-SOURCE TOKEN BUDGET ([[graft.operators.Sampling
    * .tokenBudgetFilter]]): keep the longest documents of each source
    * until its 5000-token budget is spent — the per-stratum selection step
    * of a data-mix recipe. Window cumsum within the stratum only; the twin
    * recomputes the exact kept set and running totals. */
  val qTokenBudget = GQuery("q_token_budget",
    (s, d) => graft.operators.Sampling.tokenBudgetFilter(
        Tables.documents(s, d), "source", "doc_id", "text", "n_chars",
        budget = 5000L)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"))
      .orderBy(col("doc_id")),
    Some("""WITH t AS (
        SELECT doc_id, source, n_chars,
          CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
            t -> len(t) > 0)) AS BIGINT) AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, source, n_tokens,
          SUM(n_tokens) OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        FROM t)
      SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
      FROM c WHERE cum_tokens <= 5000 ORDER BY doc_id"""),
    notes = "per-stratum token-budget selection; twin recomputes the kept set exactly")

  /** TF-IDF SALIENT TERMS ([[graft.operators.Salience.tfidfTopK]]): top-3
    * terms per doc by tf·(N/df) with a RATIONAL idf — log(N/df) is a
    * transcendental whose libm rounding differs across engines, but log is
    * monotone so N/df ranks identically, and (tf·N)/df is one correctly-
    * rounded IEEE division of exact integers: the score itself sits under
    * the hash-exact gate. */
  val qTfidfTopk = GQuery("q_tfidf_topk",
    (s, d) => graft.operators.Salience.tfidfTopK(
        Tables.documents(s, d), "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("rank")),
    Some("""WITH toks AS (
        SELECT doc_id,
          unnest(list_filter(string_split_regex(trim(text), '\s+'),
            t -> len(t) > 0)) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term),
      dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf GROUP BY term),
      n AS (SELECT COUNT(*) AS n FROM documents),
      scored AS (
        SELECT doc_id, term, tf, df,
          CAST(tf * n AS DOUBLE) / df AS score,
          ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY CAST(tf * n AS DOUBLE) / df DESC, term) AS rnk
        FROM tf JOIN dfreq USING (term) CROSS JOIN n)
      SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term, tf, df, score
      FROM scored WHERE rnk <= 3 ORDER BY doc_id, rank"""),
    notes = "rational-idf TF-IDF: monotone-equivalent ranking, hash-exact score")

  /** Corpus vocabulary: top-50 terms by document frequency with total
    * occurrence counts — the tokenizer-training / stopword-mining
    * primitive. Distributed top-k (TakeOrderedAndProject), no global
    * sort; see [[graft.operators.Salience.vocabTopK]]. */
  val qVocabTopk = GQuery("q_vocab_topk",
    (s, d) => graft.operators.Salience.vocabTopK(
        Tables.documents(s, d), "doc_id", "text", k = 50)
      .orderBy(col("rank")),
    Some("""WITH toks AS (
        SELECT doc_id,
          unnest(list_filter(string_split_regex(trim(text), '\s+'),
            t -> len(t) > 0)) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      vocab AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
          CAST(SUM(tf) AS BIGINT) AS tf_total
        FROM tf GROUP BY term),
      ranked AS (SELECT term, df, tf_total,
          ROW_NUMBER() OVER (ORDER BY df DESC, tf_total DESC, term) AS rnk
        FROM vocab)
      SELECT CAST(rnk AS BIGINT) AS rank, term, df, tf_total
      FROM ranked WHERE rnk <= 50 ORDER BY rank"""),
    notes = "corpus top-50 vocabulary by doc frequency; total-order tie-break")

  /** Sequence encoding: first 32 tokens of every doc mapped to ids from
    * the in-query top-50 vocabulary (OOV → 0) — the corpus →
    * token-id-sequence step after vocabulary construction. The vocab
    * BROADCASTS (bounded regardless of corpus size); encoding is
    * map-side. */
  val qTokenIds = GQuery("q_token_ids",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val vocab = graft.operators.Salience.vocabTopK(docs, "doc_id", "text", k = 50)
        .select(col("term"), col("rank").as("token_id"))
      graft.operators.Salience.encodeTokens(docs, "doc_id", "text", vocab,
          maxLen = 32)
        .orderBy(col("doc_id"), col("pos"))
    },
    Some("""WITH toks AS (
        SELECT doc_id,
          unnest(list_filter(string_split_regex(trim(text), '\s+'),
            t -> len(t) > 0)) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      vocab AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
          CAST(SUM(tf) AS BIGINT) AS tf_total
        FROM tf GROUP BY term),
      ranked AS (SELECT term,
          ROW_NUMBER() OVER (ORDER BY df DESC, tf_total DESC, term) AS token_id
        FROM vocab),
      lists AS (SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\s+'),
            t -> len(t) > 0)[1:32] AS l
        FROM documents),
      seq AS (SELECT doc_id, generate_subscripts(l, 1) - 1 AS pos,
          unnest(l) AS term
        FROM lists)
      SELECT s.doc_id, CAST(s.pos AS BIGINT) AS pos,
        COALESCE(r.token_id, 0) AS token_id
      FROM seq s LEFT JOIN (SELECT * FROM ranked WHERE token_id <= 50) r
        USING (term)
      ORDER BY s.doc_id, s.pos"""),
    notes = "token-id sequences from the in-query top-50 vocab; OOV encodes as 0")

  /** Adjacent-token pair counts (top 50): the pair-frequency step of
    * BPE-style tokenizer training and the bigram table of an n-gram LM.
    * Pairs come from one map-side zip of each doc's token array with its
    * own tail — never a token-table self-join. */
  val qPairCounts = GQuery("q_pair_counts",
    (s, d) => graft.operators.Salience.pairCounts(
        Tables.documents(s, d), "doc_id", "text", k = 50)
      .orderBy(col("rank")),
    Some("""WITH lists AS (
        SELECT list_filter(string_split_regex(trim(text), '\s+'),
          t -> len(t) > 0) AS l
        FROM documents),
      pairs AS (
        SELECT unnest(l[1:len(l)-1]) AS t1, unnest(l[2:len(l)]) AS t2
        FROM lists),
      counted AS (
        SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pairs GROUP BY 1, 2),
      ranked AS (
        SELECT t1, t2, cnt,
          ROW_NUMBER() OVER (ORDER BY cnt DESC, t1, t2) AS rnk
        FROM counted)
      SELECT CAST(rnk AS BIGINT) AS rank, t1, t2, cnt
      FROM ranked WHERE rnk <= 50 ORDER BY rank"""),
    notes = "top-50 adjacent-token pairs; BPE pair-count / bigram-LM step")

  /** Bigram-LM surprisal scoring ([[graft.operators.Salience
    * .lmSurprisal]]): the corpus-self-trained bigram model scores every
    * document's word transitions with an INTEGER ⌊log₂⌋ surprisal (binary
    * string length — no transcendental log crosses the engine boundary),
    * so the CCNet-style LM quality filter is hash-exact with no golden.
    * Top 50 most-surprising (lowest-quality) documents. */
  val qLmSurprisal = GQuery("q_lm_surprisal",
    (s, d) => graft.operators.Salience.lmSurprisal(
      Tables.documents(s, d), "doc_id", "text", k = 50),
    Some("""WITH words AS (
        SELECT doc_id, list_filter(string_split_regex(trim(lower(text)),
          '\s+'), t -> len(t) > 0) AS l
        FROM documents),
      grams AS (
        SELECT doc_id, unnest(l[1:len(l)-1]) AS prev,
          unnest(l[2:len(l)]) AS cur
        FROM words),
      big AS (SELECT prev, cur, COUNT(*) AS c_pc FROM grams GROUP BY 1, 2),
      ctx AS (SELECT prev, CAST(SUM(c_pc) AS BIGINT) AS c_p
        FROM big GROUP BY 1),
      surp AS (SELECT big.prev, big.cur,
          (length(format('{:b}', c_p)) - 1)
            - (length(format('{:b}', c_pc)) - 1) AS s
        FROM big JOIN ctx USING (prev)),
      scored AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          CAST(SUM(s) AS BIGINT) AS surprisal
        FROM grams JOIN surp USING (prev, cur) GROUP BY 1)
      SELECT doc_id, n_bigrams, surprisal,
        surprisal * 1000 // n_bigrams AS surprisal_milli
      FROM scored
      ORDER BY surprisal_milli DESC, doc_id LIMIT 50"""),
    notes = "integer-log2 bigram surprisal; score is exact cross-engine " +
      "(binary-string-length floor-log2, fixed-point per-gram normalization)")

  /** INTERPOLATED KNESER–NEY surprisal ([[graft.operators.Salience
    * .knSurprisal]]) — the smoothed counterpart of [[qLmSurprisal]]'s
    * MLE model and the scoring rule actual perplexity filters use:
    * absolute discount d = 3/4 with the freed mass interpolated against
    * the CONTINUATION probability N1+(•,cur)/T (how many distinct
    * contexts a word completes — the KN signature, which demotes
    * words frequent only inside one collocation). Probabilities exact
    * over the common denominator 4·c_p·T in DECIMAL(38,0)/HUGEINT;
    * per-gram surprisal lg64(10⁹) − lg64(p_x1e9) in shared fixed-point
    * log units. Top 50 most-surprising documents. */
  val qKnSurprisal = GQuery("q_kn_surprisal",
    (s, d) => graft.operators.Salience.knSurprisal(
      Tables.documents(s, d), "doc_id", "text", k = 50),
    Some(s"""WITH words AS (
        SELECT doc_id, list_filter(string_split_regex(trim(lower(text)),
          '\\s+'), t -> len(t) > 0) AS l
        FROM documents),
      grams AS (
        SELECT doc_id, unnest(l[1:len(l)-1]) AS prev,
          unnest(l[2:len(l)]) AS cur
        FROM words),
      big AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS c_pc
        FROM grams GROUP BY 1, 2),
      ctx AS (SELECT prev, CAST(SUM(c_pc) AS BIGINT) AS c_p,
          CAST(COUNT(*) AS BIGINT) AS n1p_prev
        FROM big GROUP BY 1),
      cont AS (SELECT cur, CAST(COUNT(*) AS BIGINT) AS n1p_w
        FROM big GROUP BY 1),
      tt AS (SELECT CAST(COUNT(*) AS HUGEINT) AS t FROM big),
      prob AS (SELECT big.prev AS prev, big.cur AS cur,
          CAST(greatest(
            ((4 * CAST(c_pc AS HUGEINT) - 3) * t
              + 3 * CAST(n1p_prev AS HUGEINT) * n1p_w)
              * 1000000000 // (4 * CAST(c_p AS HUGEINT) * t),
            1) AS BIGINT) AS p9
        FROM big JOIN ctx USING (prev) JOIN cont USING (cur), tt),
      ${graft.operators.NaiveBayes.sqlLg64Chain(
        "prob", "p9", Seq("prev", "cur"), "lg", "lgp")},
      scored AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          CAST(SUM(${graft.operators.NaiveBayes
            .lg64Long(1000000000L)} - lgp) AS BIGINT) AS kn_x64
        FROM grams JOIN lg USING (prev, cur) GROUP BY 1)
      SELECT doc_id, n_bigrams, kn_x64,
        kn_x64 * 1000 // n_bigrams AS kn_milli
      FROM scored ORDER BY kn_milli DESC, doc_id LIMIT 50"""),
    notes = "Kneser-Ney d=3/4 interpolated bigram surprisal; exact " +
      "common-denominator probabilities, lg64 fixed-point log, " +
      "continuation counts from the bounded bigram-type table")

  /** ROUGE-1/2 RECALL against a per-stratum reference — the n-gram
    * overlap metric summarization/distillation pipelines score
    * generated text with (Lin 2004): clipped gram recall
    * Σ_g min(c_cand(g), c_ref(g)) / Σ_g c_ref(g). Reference = the
    * longest document of each (lang, source) stratum (token count,
    * doc_id tie-break); every other stratum member is scored against
    * it, top 100 by ROUGE-2 reported in exact ppm (all counts integer;
    * grams never leave int64-safe arithmetic).
    *
    * Scale shape: the reference gram table is bounded by
    * strata × max-doc-length regardless of corpus size, so both clip
    * joins BROADCAST it; the corpus contributes the same per-(doc,gram)
    * count shuffle as TF-IDF. Distinct from [[qNgramJaccard]] (set
    * overlap between pair candidates) — ROUGE is multiset-clipped,
    * asymmetric, and recall-normalized by the reference. */
  val qRouge = GQuery("q_rouge",
    (s, d) => {
      val words = filter(split(lower(trim(col("text"))), "\\s+"),
        t => t =!= lit(""))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), words.as("w"))
        .filter(size(col("w")) > 0)
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"), col("source"))
        .orderBy(size(col("w")).desc, col("doc_id"))
      val ranked = docs.withColumn("rn", row_number().over(wr))
      val refs = ranked.filter(col("rn") === 1)
        .select(col("lang"), col("source"), col("doc_id").as("ref_id"),
          col("w").as("rw"))
      val cands = ranked.filter(col("rn") > 1)
        .select(col("doc_id"), col("lang"), col("source"), col("w"))
      def bigrams(c: org.apache.spark.sql.Column) =
        filter(zip_with(slice(c, 1, Int.MaxValue - 1),
          slice(c, 2, Int.MaxValue - 1),
          (a, b) => concat(a, lit(" "), b)), g => g.isNotNull)
      def gramCounts(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
          grams: org.apache.spark.sql.Column, cnt: String) =
        df.select(keys.map(col) :+ explode(grams).as("gram"): _*)
          .groupBy((keys :+ "gram").map(col): _*)
          .agg(count(lit(1)).as(cnt))
      val refKeys = Seq("lang", "source")
      val candKeys = Seq("doc_id", "lang", "source")
      val rc1 = gramCounts(refs, refKeys, col("rw"), "rc")
      val rc2 = gramCounts(refs, refKeys, bigrams(col("rw")), "rc")
      def clipped(cg: org.apache.spark.sql.DataFrame,
          rc: org.apache.spark.sql.DataFrame, out: String) =
        cg.join(broadcast(rc), Seq("lang", "source", "gram"))
          .groupBy(col("doc_id"))
          .agg(sum(least(col("cc"), col("rc"))).as(out))
      val c1 = clipped(gramCounts(cands, candKeys, col("w"), "cc"),
        rc1, "c1")
      val c2 = clipped(gramCounts(cands, candKeys, bigrams(col("w")), "cc"),
        rc2, "c2")
      val rt = refs.select(col("lang"), col("source"), col("ref_id"),
        size(col("rw")).cast("long").as("rt1"),
        greatest(size(col("rw")) - 1, lit(0)).cast("long").as("rt2"))
      cands.drop("w")
        .join(broadcast(rt), Seq("lang", "source"))
        .join(c1, Seq("doc_id"), "left")
        .join(c2, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"), col("source"), col("ref_id"),
          expr("cast(coalesce(c1, 0L) * 1000000 div rt1 as bigint)")
            .as("r1_ppm"),
          expr("""cast(coalesce(
              coalesce(c2, 0L) * 1000000 div nullif(rt2, 0), 0L)
            as bigint)""").as("r2_ppm"))
        .orderBy(desc("r2_ppm"), desc("r1_ppm"), col("doc_id"))
        .limit(100)
    },
    Some("""WITH words AS (
        SELECT doc_id, lang, source,
          list_filter(string_split_regex(trim(lower(text)), '\s+'),
            t -> len(t) > 0) AS w
        FROM documents),
      wnz AS (SELECT * FROM words WHERE len(w) > 0),
      ranked AS (SELECT doc_id, lang, source, w,
          ROW_NUMBER() OVER (PARTITION BY lang, source
            ORDER BY len(w) DESC, doc_id) AS rn
        FROM wnz),
      refs AS (SELECT lang, source, doc_id AS ref_id, w AS rw
        FROM ranked WHERE rn = 1),
      cands AS (SELECT doc_id, lang, source, w FROM ranked WHERE rn > 1),
      rc1 AS (SELECT lang, source, gram, CAST(COUNT(*) AS BIGINT) AS rc
        FROM (SELECT lang, source, unnest(rw) AS gram FROM refs)
        GROUP BY 1, 2, 3),
      rc2 AS (SELECT lang, source, a || ' ' || b AS gram,
          CAST(COUNT(*) AS BIGINT) AS rc
        FROM (SELECT lang, source, unnest(rw[1:len(rw)-1]) AS a,
            unnest(rw[2:len(rw)]) AS b FROM refs)
        GROUP BY 1, 2, 3),
      cg1 AS (SELECT doc_id, lang, source, gram,
          CAST(COUNT(*) AS BIGINT) AS cc
        FROM (SELECT doc_id, lang, source, unnest(w) AS gram FROM cands)
        GROUP BY 1, 2, 3, 4),
      cg2 AS (SELECT doc_id, lang, source, a || ' ' || b AS gram,
          CAST(COUNT(*) AS BIGINT) AS cc
        FROM (SELECT doc_id, lang, source, unnest(w[1:len(w)-1]) AS a,
            unnest(w[2:len(w)]) AS b FROM cands)
        GROUP BY 1, 2, 3, 4),
      c1 AS (SELECT doc_id, SUM(least(cc, rc)) AS c1
        FROM cg1 JOIN rc1 USING (lang, source, gram) GROUP BY 1),
      c2 AS (SELECT doc_id, SUM(least(cc, rc)) AS c2
        FROM cg2 JOIN rc2 USING (lang, source, gram) GROUP BY 1),
      rt AS (SELECT lang, source, ref_id, CAST(len(rw) AS BIGINT) AS rt1,
          CAST(greatest(len(rw) - 1, 0) AS BIGINT) AS rt2 FROM refs)
      SELECT doc_id, lang, source, ref_id,
        CAST(coalesce(c1, 0) * 1000000 // rt1 AS BIGINT) AS r1_ppm,
        CAST(coalesce(coalesce(c2, 0) * 1000000 // nullif(rt2, 0), 0)
          AS BIGINT) AS r2_ppm
      FROM cands JOIN rt USING (lang, source)
        LEFT JOIN c1 USING (doc_id) LEFT JOIN c2 USING (doc_id)
      ORDER BY r2_ppm DESC, r1_ppm DESC, doc_id LIMIT 100"""),
    notes = "clipped multiset n-gram recall vs the per-stratum longest " +
      "doc; reference gram tables bounded and broadcast, exact ppm")

  /** HELD-OUT PERPLEXITY with STUPID BACKOFF — the eval configuration
    * the self-scoring surprisal gates ([[qLmSurprisal]] MLE,
    * [[qKnSurprisal]] smoothed) deliberately avoid: the bigram model is
    * trained on an md5 80% document split and scores the UNSEEN 20%,
    * so out-of-model events actually occur and the backoff path runs.
    * Scoring is Brants et al. 2007 stupid backoff: seen bigram →
    * c(p,w)/c(p); unseen → 0.4·c(w)/N (the 2/5 rational); OOV word →
    * 1/(10·N). Costs in lg64 fixed-point SPLIT form (every log argument
    * an int64 count at any scale); per-doc bits/bigram in milli-bits =
    * nll·1000 div (64·n). Top 50 most-perplexing held-out docs.
    *
    * Scale shape: the model tables are bigram-type/vocab-bounded
    * (Heaps); the held-out corpus joins them once (LEFT, so the backoff
    * tier is a coalesce, not a second pass); totals are 1-row
    * broadcasts. */
  val qHeldoutPpl = GQuery("q_heldout_ppl",
    (s, d) => {
      import graft.operators.NaiveBayes.{lg64, lg64Long}
      val words = filter(split(lower(trim(col("text"))), "\\s+"),
        t => t =!= lit(""))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.operators.Dsir.bucketOf(
            concat(lit("ppl:"), col("doc_id").cast("string")), 10)
            .as("b"),
          words.as("w"))
      def grams(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), explode(zip_with(
          slice(col("w"), 1, Int.MaxValue - 1),
          slice(col("w"), 2, Int.MaxValue - 1),
          (a, bb) => struct(a.as("p"), bb.as("cur")))).as("g"))
        .filter(col("g.cur").isNotNull)
        .select(col("doc_id"), col("g.p").as("p"),
          col("g.cur").as("cur"))
      val train = docs.filter(col("b") < 8)
      val test = docs.filter(col("b") >= 8)
      val big = grams(train).groupBy(col("p"), col("cur"))
        .agg(count(lit(1)).as("c_pw"))
      val ctx = big.groupBy(col("p")).agg(sum(col("c_pw")).as("c_p"))
      val uni = train.select(explode(col("w")).as("cur"))
        .groupBy(col("cur")).agg(count(lit(1)).as("c1"))
      val tot = uni.agg(sum(col("c1")).as("nt"))
      val seen = big.join(ctx, Seq("p"))
        .select(col("p"), col("cur"),
          (lg64(col("c_p")) - lg64(col("c_pw"))).as("seen_cost"))
      val bo = uni.crossJoin(broadcast(tot))
        .select(col("cur"),
          (lit(lg64Long(5L) - lg64Long(2L)) + lg64(col("nt"))
            - lg64(col("c1"))).as("bo_cost"),
          (lit(lg64Long(10L)) + lg64(col("nt"))).as("oov_cost"))
      grams(test)
        .join(seen, Seq("p", "cur"), "left")
        .join(broadcast(bo), Seq("cur"), "left")
        .crossJoin(broadcast(tot.select(
          (lit(lg64Long(10L)) + lg64(col("nt"))).as("oov_c"))))
        .select(col("doc_id"),
          coalesce(col("seen_cost"), col("bo_cost"), col("oov_c"))
            .as("cost"),
          when(col("seen_cost").isNotNull, 1L).otherwise(0L).as("sn"),
          when(col("seen_cost").isNull && col("bo_cost").isNotNull, 1L)
            .otherwise(0L).as("bn"),
          when(col("seen_cost").isNull && col("bo_cost").isNull, 1L)
            .otherwise(0L).as("on"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("sn")).as("seen_n"),
          sum(col("bn")).as("backoff_n"), sum(col("on")).as("oov_n"),
          sum(col("cost")).as("nll_x64"))
        .withColumn("bits_milli",
          expr("nll_x64 * 1000 div (64 * n_bigrams)"))
        .orderBy(desc("bits_milli"), asc("doc_id"))
        .limit(50)
    },
    Some {
      def hv(i: Int) =
        s"""(CASE WHEN ascii(substr(hh, $i, 1)) >= 97
           THEN ascii(substr(hh, $i, 1)) - 87
           ELSE ascii(substr(hh, $i, 1)) - 48 END)"""
      val l52 = graft.operators.NaiveBayes.lg64Long(5L) -
        graft.operators.NaiveBayes.lg64Long(2L)
      val l10 = graft.operators.NaiveBayes.lg64Long(10L)
      s"""WITH docs AS (
        SELECT doc_id,
          ((${hv(1)} * 16 + ${hv(2)}) % 10) AS b,
          list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            t -> len(t) > 0) AS w
        FROM (SELECT *,
            md5('ppl:' || CAST(doc_id AS VARCHAR)) AS hh
          FROM documents)),
      trg AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS p,
          unnest(w[2:len(w)]) AS cur
        FROM docs WHERE b < 8),
      teg AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS p,
          unnest(w[2:len(w)]) AS cur
        FROM docs WHERE b >= 8),
      big AS (SELECT p, cur, CAST(COUNT(*) AS BIGINT) AS c_pw
        FROM trg GROUP BY 1, 2),
      ctx AS (SELECT p, CAST(SUM(c_pw) AS BIGINT) AS c_p
        FROM big GROUP BY 1),
      uni AS (SELECT cur, CAST(COUNT(*) AS BIGINT) AS c1
        FROM (SELECT unnest(w) AS cur FROM docs WHERE b < 8)
        GROUP BY 1),
      tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS nt FROM uni),
      sj AS (SELECT p, cur, c_pw, c_p FROM big JOIN ctx USING (p)),
      ${graft.operators.NaiveBayes.sqlLg64Chain("sj", "c_p",
        Seq("p", "cur", "c_pw", "c_p"), "sl1", "lgcp")},
      ${graft.operators.NaiveBayes.sqlLg64Chain("sl1", "c_pw",
        Seq("p", "cur", "c_pw", "c_p", "lgcp"), "sl2", "lgcpw")},
      seen AS (SELECT p, cur, lgcp - lgcpw AS seen_cost FROM sl2),
      uj AS (SELECT cur, c1, nt FROM uni, tot),
      ${graft.operators.NaiveBayes.sqlLg64Chain("uj", "nt",
        Seq("cur", "c1", "nt"), "ul1", "lgnt")},
      ${graft.operators.NaiveBayes.sqlLg64Chain("ul1", "c1",
        Seq("cur", "c1", "nt", "lgnt"), "ul2", "lgc1")},
      bo AS (SELECT cur, $l52 + lgnt - lgc1 AS bo_cost,
          $l10 + lgnt AS oov_cost FROM ul2),
      ov AS (SELECT $l10 + MAX(lgnt) AS oov_c FROM ul2),
      scored AS (
        SELECT t.doc_id,
          COALESCE(s.seen_cost, b2.bo_cost, (SELECT oov_c FROM ov))
            AS cost,
          CASE WHEN s.seen_cost IS NOT NULL THEN 1 ELSE 0 END AS sn,
          CASE WHEN s.seen_cost IS NULL AND b2.bo_cost IS NOT NULL
            THEN 1 ELSE 0 END AS bn,
          CASE WHEN s.seen_cost IS NULL AND b2.bo_cost IS NULL
            THEN 1 ELSE 0 END AS onn
        FROM teg t LEFT JOIN seen s ON t.p = s.p AND t.cur = s.cur
          LEFT JOIN bo b2 ON t.cur = b2.cur)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        CAST(SUM(sn) AS BIGINT) AS seen_n,
        CAST(SUM(bn) AS BIGINT) AS backoff_n,
        CAST(SUM(onn) AS BIGINT) AS oov_n,
        CAST(SUM(cost) AS BIGINT) AS nll_x64,
        CAST(SUM(cost) * 1000 // (64 * COUNT(*)) AS BIGINT)
          AS bits_milli
      FROM scored GROUP BY doc_id
      ORDER BY bits_milli DESC, doc_id LIMIT 50"""
    },
    notes = "stupid-backoff bigram perplexity on a held-out md5 20% " +
      "split: seen/backoff/OOV tiers as one coalesce over left joins, " +
      "lg64 split-form costs, model tables Heaps-bounded")

  /** DATA-MIXTURE DIVERGENCE: KL(source ‖ corpus) over unigram word
    * distributions, per source — the domain-shift diagnostic a mixture-
    * weighted pretraining pipeline monitors (which sources are
    * distributionally redundant vs distinct). Complements [[graft.queries
    * .PipelineQueries.qPsiDrift]] (PSI over numeric bins, time axis) with
    * the vocabulary axis.
    *
    * Exact fixed point: KL·n_s carried as
    * Σ_w c_sw·(lg64(c_sw) + lg64(n) − lg64(c_w) − lg64(n_s)) — the
    * SPLIT lg64 form, which keeps every log argument an int64 count at
    * any corpus size (the product forms c_sw·n overflow first);
    * deterministic because both engines evaluate the same floored-log
    * sum. Contributions accumulate in DECIMAL(38,0); the per-token
    * normalization uses the sign-split division (floored logs can push
    * individual sums a hair negative).
    *
    * Scale shape: one corpus gram shuffle (the TF-IDF shape); c_w is
    * vocabulary-bounded and n_s source-bounded — both broadcast; the
    * total is a 1-row broadcast. */
  val qKlSource = GQuery("q_kl_source",
    (s, d) => {
      val words = filter(split(lower(trim(col("text"))), "\\s+"),
        t => t =!= lit(""))
      val csw = Tables.documents(s, d)
        .select(col("source"), explode(words).as("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("c_sw"))
      val cw = csw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
      val ns = csw.groupBy(col("source"))
        .agg(sum(col("c_sw")).as("n_s"))
      val tot = cw.agg(sum(col("c_w")).as("n"))
      import graft.operators.NaiveBayes.lg64
      csw.join(broadcast(cw), Seq("w"))
        .join(broadcast(ns), Seq("source"))
        .crossJoin(broadcast(tot))
        .select(col("source"), col("n_s"),
          (col("c_sw").cast("decimal(38,0)") *
            (lg64(col("c_sw")) + lg64(col("n"))
              - lg64(col("c_w")) - lg64(col("n_s")))).as("contrib"))
        .groupBy(col("source"))
        .agg(max(col("n_s")).as("n_tokens"),
          sum(col("contrib")).as("kl"))
        .select(col("source"), col("n_tokens"),
          col("kl").cast("bigint").as("kl_x64_scaled"),
          expr("""cast(case when kl < 0 then -1 else 1 end
              * ((abs(kl) * 1000) div (64 * n_tokens)) as bigint)""")
            .as("kl_milli"))
        .orderBy(col("source"))
    },
    Some(s"""WITH inst AS (
        SELECT source,
          unnest(list_filter(string_split_regex(trim(lower(text)),
            '\\s+'), t -> len(t) > 0)) AS w
        FROM documents),
      csw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c_sw
        FROM inst GROUP BY 1, 2),
      cw AS (SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w
        FROM csw GROUP BY 1),
      ns AS (SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_s
        FROM csw GROUP BY 1),
      tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS nt FROM cw),
      j AS (SELECT source, w, c_sw, c_w, n_s, nt
        FROM csw JOIN cw USING (w) JOIN ns USING (source), tot),
      ${graft.operators.NaiveBayes.sqlLg64Chain("j", "c_sw",
        Seq("source", "w", "c_sw", "c_w", "n_s", "nt"), "l1", "lcsw")},
      ${graft.operators.NaiveBayes.sqlLg64Chain("l1", "nt",
        Seq("source", "w", "c_sw", "c_w", "n_s", "nt", "lcsw"),
        "l2", "ln")},
      ${graft.operators.NaiveBayes.sqlLg64Chain("l2", "c_w",
        Seq("source", "w", "c_sw", "c_w", "n_s", "nt", "lcsw", "ln"),
        "l3", "lcw")},
      ${graft.operators.NaiveBayes.sqlLg64Chain("l3", "n_s",
        Seq("source", "w", "c_sw", "c_w", "n_s", "nt", "lcsw", "ln",
          "lcw"), "l4", "lns")},
      agg AS (SELECT source, MAX(n_s) AS n_tokens,
          SUM(CAST(c_sw AS HUGEINT) * (lcsw + ln - lcw - lns)) AS kl
        FROM l4 GROUP BY 1)
      SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(kl AS BIGINT) AS kl_x64_scaled,
        CAST(CASE WHEN kl < 0 THEN -1 ELSE 1 END
          * ((abs(kl) * 1000) // (64 * n_tokens)) AS BIGINT) AS kl_milli
      FROM agg ORDER BY source"""),
    notes = "per-source unigram KL vs corpus in lg64 fixed point " +
      "(split-log form, int64-safe at any scale); vocab-bounded " +
      "broadcasts, one gram shuffle, sign-split normalization")

  /** Unigram-LM tokenizer TRAINING ([[graft.operators.Unigram]]) — the
    * SentencePiece-family counterpart of [[qBpeMerges]]: substring-seeded
    * vocabulary refined by 3 integer-exact EM rounds (Viterbi
    * re-segmentation + best-path re-scoring), reported as the top-60
    * pieces. Same golden posture as BPE: an INDEPENDENT pure-Python
    * trainer (gen_unigram_golden.py) pins the result per scale factor. */
  val qUnigramVocab = GQuery("q_unigram_vocab",
    (s, d) => graft.operators.Unigram.trainVocab(
        Tables.documents(s, d), "text")
      .orderBy(col("rank")),
    Some(s"""WITH golden(tl, rank, piece, score) AS (VALUES
        ${UnigramGolden.rows}),
      cur AS (SELECT SUM(len(text)) AS tl FROM documents)
      SELECT CAST(rank AS BIGINT) AS rank, piece,
        CAST(score AS BIGINT) AS score
      FROM golden, cur WHERE golden.tl = cur.tl
      ORDER BY rank"""),
    notes = "golden twin: independent Python unigram-EM trainer, per-SF " +
      "vocab tables keyed by the corpus text-length discriminator")

  /** Tokenizer APPLY after [[qUnigramVocab]]'s training: the corpus
    * segmented with the full final piece table, reduced to its top-50
    * subword units — the unigram counterpart of [[qBpeEncode]]. The
    * count runs on the bounded word table (no second corpus pass). */
  val qUnigramEncode = GQuery("q_unigram_encode",
    (s, d) => graft.operators.Unigram.encodeTopK(
        Tables.documents(s, d), "text")
      .orderBy(col("rank")),
    Some(s"""WITH golden(tl, rank, piece, cnt) AS (VALUES
        ${UnigramGolden.encodeRows}),
      cur AS (SELECT SUM(len(text)) AS tl FROM documents)
      SELECT CAST(rank AS BIGINT) AS rank, piece,
        CAST(cnt AS BIGINT) AS cnt
      FROM golden, cur WHERE golden.tl = cur.tl
      ORDER BY rank"""),
    notes = "golden twin: same independent trainer's encode pass")

  /** BPE merge LEARNING (20 rounds) over the document corpus — the
    * tokenizer-training op that produces the merge table [[qPairCounts]]
    * counts for and [[qTokenIds]] consumes. The corpus contributes one
    * explode+groupBy (word frequencies); every merge round runs on the
    * bounded word table ([[graft.operators.Bpe.learnMerges]]).
    *
    * HASH-EXACT golden oracle: training is deterministic (total-order
    * tie-break: count DESC, lhs ASC, rhs ASC), so the twin is a committed
    * merge table generated by an INDEPENDENT pure-Python BPE trainer
    * (tools/gen_bpe_golden.py), keyed per scale factor by the corpus
    * text-length discriminator. */
  val qBpeMerges = GQuery("q_bpe_merges",
    (s, d) => graft.operators.Bpe.learnMerges(
        Tables.documents(s, d), "text", numMerges = 20)
      .orderBy(col("rank")),
    Some(s"""WITH golden(tl, rank, lhs, rhs, pair_count, merged) AS (VALUES
        ${BpeGolden.rows}),
      cur AS (SELECT SUM(len(text)) AS tl FROM documents)
      SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs,
        CAST(pair_count AS BIGINT) AS pair_count, merged
      FROM golden, cur WHERE golden.tl = cur.tl
      ORDER BY rank"""),
    notes = "golden twin: independent Python BPE trainer, per-SF merge " +
      "tables keyed by the corpus text-length discriminator (gen_bpe_golden.py)")

  /** Tokenizer APPLY after [[qBpeMerges]]' learning: the corpus encoded
    * with the 20 learned merges, reduced to its top-50 subword units.
    * After training, the word-frequency table IS the encoded corpus
    * ([[graft.operators.Bpe.encodeTopK]]) — no second corpus pass, and
    * the count runs on the bounded word table. Same golden posture as
    * q_bpe_merges (independent Python trainer + encoder). */
  val qBpeEncode = GQuery("q_bpe_encode",
    (s, d) => graft.operators.Bpe.encodeTopK(
        Tables.documents(s, d), "text", numMerges = 20, k = 50)
      .orderBy(col("rank")),
    Some(s"""WITH golden(tl, rank, subword, cnt) AS (VALUES
        ${BpeGolden.encodeRows}),
      cur AS (SELECT SUM(len(text)) AS tl FROM documents)
      SELECT CAST(rank AS BIGINT) AS rank, subword,
        CAST(cnt AS BIGINT) AS cnt
      FROM golden, cur WHERE golden.tl = cur.tl
      ORDER BY rank"""),
    notes = "golden twin: top-50 subwords of the BPE-encoded corpus, " +
      "per-SF sets keyed by the text-length discriminator (gen_bpe_golden.py)")

  /** WORDPIECE merge LEARNING (20 rounds) — the likelihood-scored third
    * tokenizer trainer next to BPE ([[qBpeMerges]]) and unigram-LM
    * ([[qUnigramVocab]]): winner = argmax count(l,r)/(count(l)·count(r))
    * under EXACT BigInt cross-multiplication, `##` continuation
    * composition ([[graft.operators.WordPiece.learnVocab]]). Same golden
    * posture as q_bpe_merges: committed table from an independent
    * pure-Python trainer (tools/gen_wordpiece_golden.py), keyed per SF
    * by the corpus text-length discriminator. */
  val qWordpieceMerges = GQuery("q_wordpiece_merges",
    (s, d) => graft.operators.WordPiece.learnVocab(
        Tables.documents(s, d), "text", numMerges = 20)
      .orderBy(col("rank")),
    Some(s"""WITH golden(tl, rank, lhs, rhs, pair_count, merged) AS (VALUES
        ${WordpieceGolden.rows}),
      cur AS (SELECT SUM(len(text)) AS tl FROM documents)
      SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs,
        CAST(pair_count AS BIGINT) AS pair_count, merged
      FROM golden, cur WHERE golden.tl = cur.tl
      ORDER BY rank"""),
    notes = "golden twin: independent Python WordPiece trainer, " +
      "likelihood argmax via exact integer cross-multiplication")

  /** WordPiece ENCODE after [[qWordpieceMerges]]: top-50 pieces of the
    * trained word-frequency table (which IS the encoded corpus — the
    * [[qBpeEncode]] no-second-pass posture), `##` pieces included. */
  val qWordpieceEncode = GQuery("q_wordpiece_encode",
    (s, d) => graft.operators.WordPiece.encodeTopK(
        Tables.documents(s, d), "text", numMerges = 20, k = 50)
      .orderBy(col("rank")),
    Some(s"""WITH golden(tl, rank, piece, cnt) AS (VALUES
        ${WordpieceGolden.encodeRows}),
      cur AS (SELECT SUM(len(text)) AS tl FROM documents)
      SELECT CAST(rank AS BIGINT) AS rank, piece,
        CAST(cnt AS BIGINT) AS cnt
      FROM golden, cur WHERE golden.tl = cur.tl
      ORDER BY rank"""),
    notes = "golden twin: same independent trainer's encode pass")

  /** WordPiece INFERENCE ([[graft.functions.WordPieceTokenize]]):
    * greedy longest-match-first against the trained vocabulary
    * (alphabet ∪ merges as a plan literal) — max-munch, NOT merge-order
    * replay, the property separating WordPiece inference from BPE's.
    * Top-50 weighted piece counts over the bounded word table. */
  val qWordpieceTokenize = GQuery("q_wordpiece_tokenize",
    (s, d) => graft.operators.WordPiece.tokenizeTopK(
        Tables.documents(s, d), "text", numMerges = 20, k = 50)
      .orderBy(col("rank")),
    Some(s"""WITH golden(tl, rank, piece, cnt) AS (VALUES
        ${WordpieceGolden.tokenizeRows}),
      cur AS (SELECT SUM(len(text)) AS tl FROM documents)
      SELECT CAST(rank AS BIGINT) AS rank, piece,
        CAST(cnt AS BIGINT) AS cnt
      FROM golden, cur WHERE golden.tl = cur.tl
      ORDER BY rank"""),
    notes = "golden twin: same independent trainer's max-munch pass " +
      "(whole-word [UNK] contract)")

  /** Compression-ratio quality signal ([[graft.operators.TextCompress]]):
    * deflate(6) size per doc, aggregated per source — within-doc
    * redundancy (templated/spammy text compresses hard) as a corpus
    * quality gate. Golden twin from CPython zlib (byte-identical to
    * Java's Deflater — both are zlib); the per-source comp_bytes SUM
    * pins every document's compressed length. */
  val qCompressRatio = GQuery("q_compress_ratio",
    (s, d) => graft.operators.TextCompress.docCompression(
        Tables.documents(s, d), "doc_id", "source", "text")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("raw_bytes")).as("raw_bytes"),
        sum(col("comp_bytes")).as("comp_bytes"))
      .orderBy(col("source")),
    Some(s"""WITH golden(tl, source, n_docs, raw_bytes, comp_bytes) AS (VALUES
        ${CompressGolden.rows}),
      cur AS (SELECT SUM(len(text)) AS tl FROM documents)
      SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        CAST(raw_bytes AS BIGINT) AS raw_bytes,
        CAST(comp_bytes AS BIGINT) AS comp_bytes
      FROM golden, cur WHERE golden.tl = cur.tl
      ORDER BY source"""),
    notes = "golden twin: CPython zlib per-source deflate sums keyed by " +
      "the text-length discriminator (gen_compress_golden.py)")

  /** Corpus length histogram: doc counts per 100-char band — the length
    * distribution a corpus profile reports next to Reports.profile's
    * min/max. floor-banded (exact integer arithmetic), one
    * partial-aggregated shuffle. */
  val qLengthHistogram = GQuery("q_length_histogram",
    (s, d) => Tables.documents(s, d)
      .select(floor(length(col("text")) / 100).cast("long").as("band"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("band")),
    Some("""SELECT CAST(FLOOR(len(text) / 100) AS BIGINT) AS band,
        COUNT(*) AS n_docs
      FROM documents GROUP BY 1 ORDER BY band"""),
    notes = "doc-length distribution in 100-char bands")

  /** REAL image decode end-to-end: image-modality rows carry actual PNG
    * payloads rendered from a pure integer pixel formula of (media_id, x, y)
    * ([[graft.operators.ImageCodec.synthPng]]); the engine decodes them with
    * `javax.imageio` and reduces to exact channel sums. PNG is lossless, so
    * the DuckDB twin recomputes the expected sums ANALYTICALLY from the same
    * formula over a generated (x, y) grid — the whole encode → bytes →
    * decode → feature path sits under the hash-exact gate. */
  val qImageDecode = GQuery("q_image_decode",
    (s, d) => {
      import graft.operators.Multimodal
      Multimodal.decodeImages(s,
          Multimodal.mediaWithRealImages(s, Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy(col("media_id"))
    },
    Some("""WITH imgs AS (
        SELECT doc_id AS media_id,
          CAST(doc_id % 16 + 8 AS INTEGER) AS width,
          CAST(doc_id % 12 + 8 AS INTEGER) AS height
        FROM documents WHERE doc_id % 3 = 0),
      gx AS (SELECT media_id, width, height,
        unnest(range(0, width)) AS x FROM imgs),
      gxy AS (SELECT media_id, width, height, x,
        unnest(range(0, height)) AS y FROM gx)
      SELECT media_id, width, height,
        CAST(SUM((media_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
        CAST(SUM((media_id * 17 + x * 5 + y * 11) % 256) AS BIGINT) AS sum_g,
        CAST(SUM((media_id * 23 + x * 3 + y * 19) % 256) AS BIGINT) AS sum_b
      FROM gxy GROUP BY media_id, width, height
      ORDER BY media_id"""),
    notes = "real javax.imageio decode; twin recomputes pixel sums analytically")

  /** REAL audio decode end-to-end: audio-modality rows carry actual WAV
    * payloads rendered from a pure integer 16-bit PCM formula of
    * (media_id, i) ([[graft.operators.AudioCodec.synthWav]]); the engine
    * decodes them with `javax.sound.sampled` and reduces to exact amplitude
    * statistics. PCM-in-WAV is lossless, so the DuckDB twin recomputes the
    * expected sums ANALYTICALLY from the same formula over a generated
    * sample range — the whole encode → RIFF bytes → decode → feature path
    * sits under the hash-exact gate. */
  val qAudioDecode = GQuery("q_audio_decode",
    (s, d) => {
      import graft.operators.Multimodal
      Multimodal.decodeAudio(s,
          Multimodal.mediaWithRealAudio(s, Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("n_samples"), col("sample_rate"),
          col("sum_amp"), col("sum_abs"), col("peak"))
        .orderBy(col("media_id"))
    },
    Some("""WITH clips AS (
        SELECT doc_id AS media_id, doc_id % 400 + 100 AS n
        FROM documents WHERE doc_id % 3 = 1),
      gi AS (SELECT media_id, n, unnest(range(0, n)) AS i FROM clips),
      samples AS (
        SELECT media_id, n,
          (media_id * 31 + i * 7919) % 65536 - 32768 AS s
        FROM gi)
      SELECT media_id, CAST(n AS BIGINT) AS n_samples,
        16000 AS sample_rate,
        CAST(SUM(s) AS BIGINT) AS sum_amp,
        CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
        CAST(MAX(ABS(s)) AS BIGINT) AS peak
      FROM samples GROUP BY media_id, n
      ORDER BY media_id"""),
    notes = "real javax.sound.sampled decode; twin recomputes PCM sums analytically")

  /** Per-frame audio features after the REAL WAV decode ([[graft.operators
    * .Multimodal.audioFrames]]): 160-sample (10 ms @ 16 kHz) windows
    * reduced to energy (sum|s|), zero-crossing count, and peak — the VAD /
    * silence-trim front-end of a speech pipeline. Exact integers; the twin
    * regenerates the PCM analytically (the [[qAudioDecode]] posture) and
    * windows it in SQL. */
  val qAudioFrames = GQuery("q_audio_frames",
    (s, d) => {
      import graft.operators.Multimodal
      Multimodal.audioFrames(s,
          Multimodal.mediaWithRealAudio(s, Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("frame_id"), col("n"),
          col("sum_abs"), col("zcr"), col("peak"))
        .orderBy(col("media_id"), col("frame_id"))
    },
    Some("""WITH clips AS (
        SELECT doc_id AS media_id, doc_id % 400 + 100 AS n
        FROM documents WHERE doc_id % 3 = 1),
      gi AS (SELECT media_id, unnest(range(0, n)) AS i FROM clips),
      s AS (SELECT media_id, i, i // 160 AS frame_id,
          (media_id * 31 + i * 7919) % 65536 - 32768 AS v
        FROM gi),
      x AS (SELECT media_id, frame_id, v,
          CASE WHEN lag(v) OVER w IS NOT NULL
            AND ((v < 0) <> (lag(v) OVER w < 0)) THEN 1 ELSE 0 END AS c
        FROM s WINDOW w AS (PARTITION BY media_id, frame_id ORDER BY i))
      SELECT media_id, CAST(frame_id AS BIGINT) AS frame_id,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
        CAST(SUM(c) AS BIGINT) AS zcr,
        CAST(MAX(ABS(v)) AS BIGINT) AS peak
      FROM x GROUP BY 1, 2
      ORDER BY media_id, frame_id"""),
    notes = "10ms frame energy/ZCR/peak through the real WAV round-trip; " +
      "analytic SQL twin windows the same PCM formula")

  /** Active-segment extraction over the decoded frames ([[graft.operators
    * .Multimodal.vadSegments]]): frames clearing a 16384-per-sample energy
    * threshold, grouped into maximal consecutive runs (gaps-and-islands) —
    * the speech pipeline's VAD/segment-selection step, end-to-end through
    * the REAL WAV decode. Integer-exact; the twin replays the analytic
    * PCM, the same frame reduction, and the same island grouping in SQL. */
  val qVadSegments = GQuery("q_vad_segments",
    (s, d) => {
      import graft.operators.Multimodal
      Multimodal.vadSegments(
          Multimodal.audioFrames(s,
            Multimodal.mediaWithRealAudio(s, Tables.documents(s, d))).toDF(),
          thrPerSample = 16384L)
        .orderBy(col("media_id"), col("seg_id"))
    },
    Some("""WITH clips AS (
        SELECT doc_id AS media_id, doc_id % 400 + 100 AS n
        FROM documents WHERE doc_id % 3 = 1),
      gi AS (SELECT media_id, unnest(range(0, n)) AS i FROM clips),
      s AS (SELECT media_id, i // 160 AS frame_id,
          (media_id * 31 + i * 7919) % 65536 - 32768 AS v
        FROM gi),
      f AS (SELECT media_id, frame_id, COUNT(*) AS n,
          SUM(ABS(v)) AS sum_abs
        FROM s GROUP BY 1, 2),
      act AS (SELECT media_id, frame_id, n, sum_abs,
          frame_id - ROW_NUMBER() OVER (PARTITION BY media_id
            ORDER BY frame_id) AS grp
        FROM f WHERE sum_abs >= 16384 * n),
      seg AS (SELECT media_id, MIN(frame_id) AS start_frame,
          MAX(frame_id) AS end_frame, COUNT(*) AS n_frames,
          SUM(sum_abs) AS energy
        FROM act GROUP BY media_id, grp)
      SELECT media_id,
        ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY start_frame)
          AS seg_id,
        CAST(start_frame AS BIGINT) AS start_frame,
        CAST(end_frame AS BIGINT) AS end_frame,
        CAST(n_frames AS BIGINT) AS n_frames,
        CAST(energy AS BIGINT) AS energy
      FROM seg ORDER BY media_id, seg_id"""),
    notes = "energy-gated gaps-and-islands segmentation over real-decode " +
      "frames; per-clip windows only, no global sort")

  /** REAL video decode end-to-end — the LAST modality off the stub list:
    * video rows carry actual multi-frame animated GIFs rendered from a pure
    * integer formula over an identity grayscale palette
    * ([[graft.operators.VideoCodec.synthGif]]); the engine decodes them
    * frame by frame with `javax.imageio`. Indexed GIF is lossless (the
    * source image lives in the palette, so no quantization can occur), so
    * the DuckDB twin recomputes the expected per-frame gray sums
    * ANALYTICALLY over a generated (frame, x, y) grid. */
  val qVideoDecode = GQuery("q_video_decode",
    (s, d) => {
      import graft.operators.Multimodal
      Multimodal.decodeVideo(s,
          Multimodal.mediaWithRealVideo(s, Tables.documents(s, d)))
        .toDF()
        .select(col("media_id"), col("frame_index"), col("width"),
          col("height"), col("sum_gray"))
        .orderBy(col("media_id"), col("frame_index"))
    },
    Some("""WITH vids AS (
        SELECT doc_id AS media_id,
          CAST(doc_id % 5 + 2 AS INTEGER) AS nf,
          CAST(doc_id % 12 + 6 AS INTEGER) AS width,
          CAST(doc_id % 10 + 6 AS INTEGER) AS height
        FROM documents WHERE doc_id % 3 = 2),
      gf AS (SELECT media_id, width, height,
        CAST(unnest(range(0, nf)) AS INTEGER) AS frame_index FROM vids),
      gx AS (SELECT media_id, width, height, frame_index,
        unnest(range(0, width)) AS x FROM gf),
      gxy AS (SELECT media_id, width, height, frame_index, x,
        unnest(range(0, height)) AS y FROM gx)
      SELECT media_id, frame_index, width, height,
        CAST(SUM((media_id * 31 + frame_index * 47 + x * 7 + y * 13) % 256)
          AS BIGINT) AS sum_gray
      FROM gxy GROUP BY media_id, frame_index, width, height
      ORDER BY media_id, frame_index"""),
    notes = "real javax.imageio animated-GIF decode; twin recomputes frame sums analytically")

  /** REAL frame sampling end-to-end: every 2nd frame of each real video is
    * re-encoded as a STANDALONE single-frame GIF
    * ([[graft.operators.Multimodal.sampleFramesReal]]), then those emitted
    * payloads are DECODED AGAIN and reduced to gray sums — proving the
    * sampling stage outputs valid, lossless, correctly-selected media. The
    * twin recomputes the expected sums analytically for exactly the
    * stride-selected frames. */
  val qFrameSample = GQuery("q_frame_sample",
    (s, d) => {
      import s.implicits._
      import graft.operators.{Multimodal, VideoCodec}
      Multimodal.sampleFramesReal(s,
          Multimodal.mediaWithRealVideo(s, Tables.documents(s, d)),
          stride = 2)
        .map { fr =>
          val st = VideoCodec.decodeStats(fr.content)
          require(st.length == 1, s"sampled payload has ${st.length} frames")
          (fr.media_id, fr.frame_index, fr.frame_ms, st.head.sum_gray)
        }
        .toDF("media_id", "frame_index", "frame_ms", "sum_gray")
        .orderBy(col("media_id"), col("frame_index"))
    },
    Some("""WITH vids AS (
        SELECT doc_id AS media_id,
          CAST(doc_id % 5 + 2 AS INTEGER) AS nf,
          CAST(doc_id % 12 + 6 AS INTEGER) AS width,
          CAST(doc_id % 10 + 6 AS INTEGER) AS height
        FROM documents WHERE doc_id % 3 = 2),
      gf AS (SELECT media_id, width, height,
        CAST(unnest(range(0, nf)) AS INTEGER) AS frame_index FROM vids),
      kept AS (SELECT * FROM gf WHERE frame_index % 2 = 0),
      gx AS (SELECT media_id, width, height, frame_index,
        unnest(range(0, width)) AS x FROM kept),
      gxy AS (SELECT media_id, width, height, frame_index, x,
        unnest(range(0, height)) AS y FROM gx)
      SELECT media_id, frame_index,
        CAST(frame_index AS BIGINT) * 100 AS frame_ms,
        CAST(SUM((media_id * 31 + frame_index * 47 + x * 7 + y * 13) % 256)
          AS BIGINT) AS sum_gray
      FROM gxy GROUP BY media_id, frame_index
      ORDER BY media_id, frame_index"""),
    notes = "stride-sampled frames re-encoded standalone, re-decoded, sums vs analytic twin")

  /** REAL image resize end-to-end: real PNGs are decoded, nearest-neighbor
    * resampled under an aspect-preserving integer cap
    * ([[graft.operators.Multimodal.resizeImagesReal]]), re-encoded, then
    * DECODED AGAIN and reduced to channel sums. Nearest-neighbor's pure
    * integer index arithmetic (sx = x·sw div dw) lets the twin recompute
    * the expected sums over the sampled source grid — the whole decode →
    * resample → encode → decode chain sits under the hash-exact gate.
    * Source dims straddle the cap, so both the resample and the
    * pass-through branch are exercised. */
  val qImageResize = GQuery("q_image_resize",
    (s, d) => {
      import graft.operators.Multimodal
      Multimodal.decodeImages(s,
          Multimodal.resizeImagesReal(s,
            Multimodal.mediaWithRealImages(s, Tables.documents(s, d)),
            maxSide = 12))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy(col("media_id"))
    },
    Some("""WITH imgs AS (
        SELECT doc_id AS media_id,
          CAST(doc_id % 16 + 8 AS INTEGER) AS sw,
          CAST(doc_id % 12 + 8 AS INTEGER) AS sh
        FROM documents WHERE doc_id % 3 = 0),
      dims AS (
        SELECT media_id, sw, sh,
          CASE WHEN greatest(sw, sh) <= 12 THEN sw
            ELSE greatest(1, sw * 12 // greatest(sw, sh)) END AS dw,
          CASE WHEN greatest(sw, sh) <= 12 THEN sh
            ELSE greatest(1, sh * 12 // greatest(sw, sh)) END AS dh
        FROM imgs),
      gx AS (SELECT media_id, sw, sh, dw, dh,
        unnest(range(0, dw)) AS x FROM dims),
      gxy AS (SELECT media_id, sw, sh, dw, dh, x,
        unnest(range(0, dh)) AS y FROM gx),
      px AS (SELECT media_id, dw, dh,
        x * sw // dw AS sx, y * sh // dh AS sy FROM gxy)
      SELECT media_id, CAST(dw AS INTEGER) AS width,
        CAST(dh AS INTEGER) AS height,
        CAST(SUM((media_id * 31 + sx * 7 + sy * 13) % 256) AS BIGINT) AS sum_r,
        CAST(SUM((media_id * 17 + sx * 5 + sy * 11) % 256) AS BIGINT) AS sum_g,
        CAST(SUM((media_id * 23 + sx * 3 + sy * 19) % 256) AS BIGINT) AS sum_b
      FROM px GROUP BY media_id, dw, dh
      ORDER BY media_id"""),
    notes = "nearest-neighbor resample re-decoded; twin recomputes sums over the sampled source grid")

  /** The EXPORT half of the training-data pipeline, composed end-to-end:
    * quality gate → language-consistency gate → exact dedup → PII scrub →
    * per-language mix sampling → token-budget packing. Complements
    * [[qCurationPipeline]] (which proves the near-dup half); together the
    * two composites cover the full curate-and-ship path. HASH-EXACT: the
    * twin independently recomputes every stage — gates from the stopword
    * lists, dedup winner election, the byte-exact scrub, the md5-threshold
    * mix, and the packing cumsum. */
  val qTrainingExport = GQuery("q_training_export",
    (s, d) => {
      import graft.functions.Redact
      import graft.operators.Sampling
      val docs = Tables.documents(s, d)
      val gated = docs
        .filter(TextFeatures.qualityScoreFast(col("text")) >= 0.75)
        .filter(TextFeatures.langIdFast(col("text")) === col("lang"))
        .select(col("doc_id"), col("lang"), col("text"))
      val exactKept = Dedup.exactDuplicates(gated, "text", "doc_id")
        .filter(!col("is_duplicate"))
        .select(col("doc_id"), col("lang"),
          Redact.scrub(col("text")).as("text"))
      val mixed = Sampling.mixSample(exactKept, "doc_id", "lang",
        rates = Map("en" -> 800, "de" -> 500), defaultPermille = 300,
        salt = "export")
      Sampling.packChunks(mixed, "lang", "doc_id", "text", budget = 1500L)
        .orderBy(col("lang"), col("chunk_id"))
    },
    Some {
      val stop = TextFeatures.enStopwords.map(w => s"'$w'").mkString(", ")
      def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
      val langs = Seq(
        "en" -> inList(TextFeatures.enStopwords),
        "de" -> inList(TextFeatures.deStopwords),
        "fr" -> inList(TextFeatures.frStopwords),
        "es" -> inList(TextFeatures.esStopwords))
      val hitCols = langs.map { case (l, list) =>
        s"CAST(len(list_filter(toks, w -> w IN ($list))) AS DOUBLE) AS h_$l"
      }.mkString(",\n          ")
      val scoreCols = langs.map { case (l, _) =>
        s"CASE WHEN n_toks > 0 THEN h_$l / n_toks ELSE 0.0 END AS s_$l"
      }.mkString(",\n          ")
      val bestExpr = "GREATEST(s_en, s_de, s_fr, s_es)"
      val pick = langs.map { case (l, _) =>
        s"WHEN s_$l = $bestExpr THEN '$l'"
      }.mkString("\n               ")
      s"""WITH t0 AS (
        SELECT doc_id, text, lang,
          CAST(len(text) AS DOUBLE) AS n_chars,
          CAST(len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g'))
            AS DOUBLE) AS n_punct,
          list_transform(
            list_filter(string_split_regex(text, '\\s+'), w -> len(w) > 0),
            w -> lower(w)) AS toks
        FROM documents),
      t1 AS (
        SELECT *, CAST(len(toks) AS DOUBLE) AS n_toks,
          CAST(len(list_filter(toks, w -> w IN ($stop))) AS DOUBLE) AS n_stop,
          $hitCols
        FROM t0),
      t2 AS (
        SELECT *,
          ((CASE WHEN n_chars >= 100 AND n_chars <= 20000 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN (CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) < 0.2 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN (CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END) > 0.05 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN n_toks > 0 AND n_chars / n_toks >= 3 AND n_chars / n_toks <= 12 THEN 1.0 ELSE 0.0 END)
          ) / 4.0 AS quality,
          $scoreCols
        FROM t1),
      gated AS (
        SELECT doc_id, lang, text FROM t2
        WHERE quality >= 0.75
          AND (CASE WHEN $bestExpr > 0 THEN
                 CASE $pick
                 END
               ELSE 'und' END) = lang),
      e AS (
        SELECT doc_id, lang, text FROM (
          SELECT doc_id, lang, text,
            MIN(doc_id) OVER (PARTITION BY
              lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS keep
          FROM gated) WHERE doc_id = keep),
      scr AS (
        SELECT doc_id, lang,
          regexp_replace(
            regexp_replace(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>',
              'g'),
            '[0-9]{3}-[0-9]{3}-[0-9]{4}|[0-9]{3}-[0-9]{4}', '<PHONE>',
            'g') AS text
        FROM e),
      mixed AS (
        SELECT doc_id, lang, text FROM scr
        WHERE substr(md5('export:' || CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE lang WHEN 'en' THEN 'cccc' WHEN 'de' THEN '8000'
            ELSE '4ccc' END),
      tok AS (
        SELECT lang, doc_id,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> len(t) > 0)) AS BIGINT) AS ntok
        FROM mixed),
      c AS (
        SELECT lang, ntok,
          SUM(ntok) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM tok)
      SELECT lang, chunk_id,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(ntok) AS BIGINT) AS n_tokens
      FROM (SELECT lang, ntok,
        CAST((greatest(cum, 1) - 1) // 1500 AS BIGINT) AS chunk_id FROM c)
      GROUP BY lang, chunk_id
      ORDER BY lang, chunk_id"""
    },
    notes = "export composite: gates + dedup + scrub + mix + pack, every stage recomputed by the twin")

  /** The composite curation pipeline a training-data user actually runs:
    * quality gate → language-consistency gate → exact dedup (keep min id
    * per normalized text) → near-dup clustering (keep the canonical doc per
    * component). HASH-EXACT oracle: the DuckDB twin recomputes every stage
    * independently, including the brute-force pair set and a recursive-CTE
    * closure — this is the strongest end-to-end evidence the operators
    * compose correctly. */
  val qCurationPipeline = GQuery("q_curation_pipeline",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val gated = docs
        .filter(TextFeatures.qualityScoreFast(col("text")) >= 0.75)
        .filter(TextFeatures.langIdFast(col("text")) === col("lang"))
        .select(col("doc_id"), col("text"))
      // cache = the pipeline's materialization point (at scale this is the
      // WRITE of the curated store): the keyed near-dup stage re-reads text
      // by key, and without it every downstream branch re-runs the
      // gate+window pipeline
      val exactKept = Dedup.exactDuplicates(gated, "text", "doc_id")
        .filter(!col("is_duplicate"))
        .select(col("doc_id"), col("text"))
        .cache()
      val pairs = Dedup.minhashNearDupPairsKeyed(exactKept, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5)
      val nonCanonical = Dedup.nearDupGroups(pairs.select(col("id_a"), col("id_b")))
        .filter(col("id") =!= col("label"))
        .select(col("id").as("doc_id"))
      // the one SortMergeJoin in this plan (PLANS.md), and deliberately so:
      // nonCanonical is the non-canonical slice of every near-dup
      // component — proportional to the corpus's duplicate RATE (easily
      // 20-40% of a web corpus), not bounded by any dimension table, so a
      // static broadcast here is the same 100×-killer class the minhash
      // size gate exists for. Shuffled anti-join on the 8-byte key is the
      // scale-right default; AQE demotes it to broadcast at runtime when
      // the measured build side is actually small.
      exactKept.join(nonCanonical, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some {
      val stop = TextFeatures.enStopwords.map(w => s"'$w'").mkString(", ")
      def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
      val langs = Seq(
        "en" -> inList(TextFeatures.enStopwords),
        "de" -> inList(TextFeatures.deStopwords),
        "fr" -> inList(TextFeatures.frStopwords),
        "es" -> inList(TextFeatures.esStopwords))
      val hitCols = langs.map { case (l, list) =>
        s"CAST(len(list_filter(toks, w -> w IN ($list))) AS DOUBLE) AS h_$l"
      }.mkString(",\n          ")
      val scoreCols = langs.map { case (l, _) =>
        s"CASE WHEN n_toks > 0 THEN h_$l / n_toks ELSE 0.0 END AS s_$l"
      }.mkString(",\n          ")
      val bestExpr = "GREATEST(s_en, s_de, s_fr, s_es)"
      val pick = langs.map { case (l, _) =>
        s"WHEN s_$l = $bestExpr THEN '$l'"
      }.mkString("\n               ")
      s"""WITH RECURSIVE t0 AS (
        SELECT doc_id, text, lang,
          CAST(len(text) AS DOUBLE) AS n_chars,
          CAST(len(text) - len(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g'))
            AS DOUBLE) AS n_punct,
          list_transform(
            list_filter(string_split_regex(text, '\\s+'), w -> len(w) > 0),
            w -> lower(w)) AS toks
        FROM documents),
      t1 AS (
        SELECT *, CAST(len(toks) AS DOUBLE) AS n_toks,
          CAST(len(list_filter(toks, w -> w IN ($stop))) AS DOUBLE) AS n_stop,
          $hitCols
        FROM t0),
      t2 AS (
        SELECT *,
          ((CASE WHEN n_chars >= 100 AND n_chars <= 20000 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN (CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) < 0.2 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN (CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END) > 0.05 THEN 1.0 ELSE 0.0 END)
           + (CASE WHEN n_toks > 0 AND n_chars / n_toks >= 3 AND n_chars / n_toks <= 12 THEN 1.0 ELSE 0.0 END)
          ) / 4.0 AS quality,
          $scoreCols
        FROM t1),
      gated AS (
        SELECT doc_id, text FROM t2
        WHERE quality >= 0.75
          AND (CASE WHEN $bestExpr > 0 THEN
                 CASE $pick
                 END
               ELSE 'und' END) = lang),
      e AS (
        SELECT doc_id, text FROM (
          SELECT doc_id, text,
            MIN(doc_id) OVER (PARTITION BY
              lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS keep
          FROM gated) WHERE doc_id = keep),
      docs2 AS (
        SELECT doc_id,
          list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), i + 1, 5))) AS sh
        FROM e),
      sgl AS (SELECT doc_id, unnest(sh) AS g FROM docs2),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM sgl a JOIN sgl b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(sh) AS n FROM docs2),
      prs AS (
        SELECT id_a, id_b
        FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
        WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) >= 0.5),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM prs
        UNION
        SELECT id_b, id_a FROM prs),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      reach AS (
        SELECT id, id AS label FROM nodes
        UNION
        SELECT x.src AS id, r.label FROM edges x JOIN reach r ON x.dst = r.id),
      comp AS (SELECT id, MIN(label) AS label FROM reach GROUP BY id)
      SELECT e.doc_id, len(e.text) AS n_chars FROM e
      WHERE e.doc_id NOT IN (SELECT id FROM comp WHERE id <> label)
      ORDER BY e.doc_id"""
    })

  /** INVERTED INDEX ([[graft.operators.Index.invertedIndex]]): per-term
    * df/cf plus the first-20-postings sample in doc-id order — the
    * retrieval primitive. Posting lists are capped BEFORE the list agg so
    * no group is unbounded; the twin replays the identical cap. */
  val qInvertedIndex = GQuery("q_inverted_index",
    (s, d) => graft.operators.Index.invertedIndex(
        Tables.documents(s, d), "doc_id", "text", minDf = 2L,
        maxPostings = 20)
      .orderBy(col("term")),
    Some("""WITH tf AS (
        SELECT term, doc_id, COUNT(*) AS tf FROM (
          SELECT doc_id,
            unnest(list_filter(string_split_regex(trim(text), '\s+'),
              w -> len(w) > 0)) AS term
          FROM documents)
        GROUP BY term, doc_id),
      stats AS (
        SELECT term, COUNT(*) AS df, SUM(tf) AS cf
        FROM tf GROUP BY term HAVING COUNT(*) >= 2),
      p AS (
        SELECT term, array_to_string(list_slice(
          list(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR)
            ORDER BY doc_id), 1, 20), ',') AS postings
        FROM tf GROUP BY term)
      SELECT term, CAST(df AS BIGINT) AS df, CAST(cf AS BIGINT) AS cf,
        postings
      FROM stats JOIN p USING (term)
      ORDER BY term"""),
    notes = "term stats + bounded posting sample; postings string hash-exact")

  /** KEYWORD SEARCH ([[graft.operators.Index.keywordSearch]]): multi-term
    * TF-IDF retrieval with a rational idf under integer floor division —
    * every score an exact integer, hash-comparable. Term filter pushed
    * before the tf shuffle; weights broadcast. */
  val qKeywordSearch = GQuery("q_keyword_search",
    (s, d) => graft.operators.Index.keywordSearch(
      Tables.documents(s, d), "doc_id", "text",
      Seq("join", "filter", "scan"), k = 50),
    Some("""WITH t AS (
        SELECT doc_id,
          unnest(list_filter(string_split_regex(trim(text), '\s+'),
            w -> len(w) > 0)) AS term
        FROM documents),
      q AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM t
        WHERE term IN ('join', 'filter', 'scan') GROUP BY 1, 2),
      n AS (SELECT COUNT(*) AS n FROM documents),
      w AS (
        SELECT term, (n.n * 1000000) // COUNT(*) AS w
        FROM q, n GROUP BY term, n.n),
      sc AS (
        SELECT doc_id,
          SUM(CAST(tf AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0))) AS s
        FROM q JOIN w USING (term) GROUP BY doc_id)
      SELECT CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS BIGINT)
          AS rank,
        doc_id, CAST(s AS BIGINT) AS score
      FROM sc ORDER BY s DESC, doc_id LIMIT 50"""),
    notes = "rational-idf retrieval; integer scores hash-exact")

  /** BM25 ([[graft.operators.Index.bm25Search]]): the full Okapi shape —
    * tf saturation AND document-length normalization at k1=1.2, b=0.75 —
    * with every score an exact int64 (the cleared-fraction form
    * `idf·44·tf·T/(20·tf·T+6·T+18·dl·N)` under one integer floor
    * division per term; no libm log anywhere). The twin replays the
    * identical integer arithmetic in DuckDB. */
  val qBm25 = GQuery("q_bm25",
    (s, d) => graft.operators.Index.bm25Search(
      Tables.documents(s, d), "doc_id", "text",
      Seq("join", "filter", "scan"), k = 50),
    Some("""WITH tk AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\s+'),
            w -> len(w) > 0) AS toks
        FROM documents),
      d AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
        FROM tk),
      q AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf FROM d
        WHERE term IN ('join', 'filter', 'scan') GROUP BY 1, 2, 3),
      s AS (
        SELECT COUNT(*) AS n, CAST(SUM(len(toks)) AS BIGINT) AS tt FROM tk),
      w AS (
        SELECT term, (s.n * 1000000) // COUNT(*) AS idf, s.n AS n,
          s.tt AS tt
        FROM q, s GROUP BY term, s.n, s.tt),
      sc AS (
        SELECT doc_id,
          SUM(idf * ((44 * tf * tt * 1000)
            // (20 * tf * tt + 6 * tt + 18 * dl * n))) AS sco
        FROM q JOIN w USING (term) GROUP BY doc_id)
      SELECT CAST(row_number() OVER (ORDER BY sco DESC, doc_id) AS BIGINT)
          AS rank,
        doc_id, CAST(sco AS BIGINT) AS score
      FROM sc ORDER BY sco DESC, doc_id LIMIT 50"""),
    notes = "exact-integer Okapi BM25: tf saturation + length norm, zero libm")

  /** MEAN RECIPROCAL RANK — the first-hit retrieval metric next to
    * [[qNdcg]] (graded) and [[qLiftAtK]] (set): for each query term,
    * rank the docs containing it by (tf desc, doc_id) and find the rank
    * of the first RELEVANT one (relevance = lang='en', the same
    * independent label qNdcg uses); RR = 1/first_rank in exact integer
    * per-million (10⁶ div rank), MRR the mean over the fixed 5-term
    * query set with missing-relevant terms contributing 0 — the
    * convention that keeps the metric defined on degenerate corpora
    * (the qNdcg zero-positive incident class). One tokenize pass with
    * the term filter pushed below the explode; everything after the
    * (term, doc) tf agg is bounded by hits. */
  val qMrr = GQuery("q_mrr",
    (s, d) => {
      val terms = Seq("join", "filter", "scan", "shuffle", "window")
      val tf = Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          explode(filter(split(trim(col("text")), "\\s+"),
            t => length(t) > 0)).as("term"))
        .filter(col("term").isInCollection(terms))
        .groupBy(col("term"), col("doc_id"), col("pos"))
        .agg(count(lit(1)).as("tf"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("term")).orderBy(desc("tf"), col("doc_id"))
      val perTerm = tf.withColumn("rank", row_number().over(w))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("n_ranked"),
          min(when(col("pos") === 1L, col("rank"))).cast("long")
            .as("first_rank"))
        .withColumn("rr_x1e6", expr("1000000 div first_rank"))
      perTerm
        .withColumn("mrr_x1e6",
          expr(s"sum(coalesce(rr_x1e6, 0)) over () div ${terms.size}"))
        .select(col("term"), col("n_ranked"), col("first_rank"),
          col("rr_x1e6"), col("mrr_x1e6"))
        .orderBy(col("term"))
    },
    Some("""WITH tk AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
          unnest(list_filter(string_split_regex(trim(text), '\s+'),
            w -> len(w) > 0)) AS term
        FROM documents),
      tf AS (
        SELECT term, doc_id, pos, COUNT(*) AS tf FROM tk
        WHERE term IN ('join', 'filter', 'scan', 'shuffle', 'window')
        GROUP BY 1, 2, 3),
      rk AS (
        SELECT term, pos,
          ROW_NUMBER() OVER (PARTITION BY term
            ORDER BY tf DESC, doc_id) AS rank
        FROM tf),
      pt AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS n_ranked,
          CAST(MIN(CASE WHEN pos = 1 THEN rank END) AS BIGINT)
            AS first_rank
        FROM rk GROUP BY term)
      SELECT term, n_ranked, first_rank,
        CAST(1000000 // first_rank AS BIGINT) AS rr_x1e6,
        CAST(SUM(COALESCE(1000000 // first_rank, 0)) OVER () // 5
          AS BIGINT) AS mrr_x1e6
      FROM pt ORDER BY term"""),
    notes = "reciprocal rank in exact per-million; fixed 5-term query " +
      "set, absent-relevant terms count 0 in the mean")

  /** RANK-BIASED OVERLAP — the top-weighted ranking-agreement metric
    * (Webber et al. 2010) between two retrieval systems answering the
    * same query: truncated RBO@10 = (1−p)·Σ_{d≤10} p^(d−1)·X_d/d with
    * p=9/10, X_d the overlap of the depth-d prefixes of the BM25 and
    * raw-tf rankings. Where [[qRrfFusion]] MERGES rankings, RBO
    * measures how much they AGREE — the monitoring number for "did the
    * scorer change reorder what users see". All-integer: every
    * p^(d−1)/d is the exact rational 9^(d−1)/(10^(d−1)·d), cleared by
    * the common denominator 2520·10⁹ (lcm(1..10)=2520), so the per-
    * depth weights are int64 literals derived in Scala and the twin
    * carries the SAME literals in a VALUES table; identical lists score
    * 1−p¹⁰ = 0.6513 (truncated-sum convention — no extrapolation).
    * Both prefix sets are ≤10 rows, so the overlap join is trivially
    * bounded; the corpus is touched twice (once per scorer), each a
    * single tokenize+agg pass. */
  val qRbo = GQuery("q_rbo",
    (s, d) => {
      val terms = Seq("join", "filter", "scan")
      val k = 10
      // exact integer weights: w_d = 9^(d-1) · (2520/d) · 10^(10-d)
      val ws: Seq[Long] = (1 to k).map(dd =>
        BigInt(9).pow(dd - 1).toLong * (2520L / dd)
          * math.pow(10, k - dd).toLong)
      val docs = Tables.documents(s, d)
      val a = graft.operators.Index
        .bm25Search(docs, "doc_id", "text", terms, k = k)
        .select(col("doc_id"), col("rank").as("ra"))
      val tfRank = docs
        .select(col("doc_id"),
          explode(filter(split(trim(col("text")), "\\s+"),
            t => length(t) > 0)).as("term"))
        .filter(col("term").isInCollection(terms))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
        .orderBy(desc("tf"), col("doc_id")).limit(k)
      val wb = org.apache.spark.sql.expressions.Window
        .orderBy(desc("tf"), col("doc_id"))
      val b = tfRank.withColumn("rb", row_number().over(wb).cast("long"))
        .select(col("doc_id"), col("rb"))
      val pairs = a.join(b, Seq("doc_id"))
        .select(greatest(col("ra"), col("rb")).as("dmax"))
      val ds = s.range(1, k + 1).toDF("d")
      ds.join(pairs, col("dmax") <= col("d"), "left")
        .groupBy(col("d"))
        .agg(count(col("dmax")).as("x_d"))
        .withColumn("w", element_at(typedLit(ws), col("d").cast("int")))
        .withColumn("rbo_x1e4",
          expr("sum(x_d * w) over () div 2520000000"))
        .select(col("d"), col("x_d"), col("w"), col("rbo_x1e4"))
        .orderBy(col("d"))
    },
    Some {
      val k = 10
      val ws = (1 to k).map(dd =>
        BigInt(9).pow(dd - 1).toLong * (2520L / dd)
          * math.pow(10, k - dd).toLong)
      val wt = ws.zipWithIndex
        .map { case (v, i) => s"(${i + 1}, ${v}::BIGINT)" }.mkString(", ")
      s"""WITH tk AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\\s+'),
            w -> len(w) > 0) AS toks
        FROM documents),
      dd AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
        FROM tk),
      q AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf FROM dd
        WHERE term IN ('join', 'filter', 'scan') GROUP BY 1, 2, 3),
      s AS (
        SELECT COUNT(*) AS n, CAST(SUM(len(toks)) AS BIGINT) AS tt FROM tk),
      w AS (
        SELECT term, (s.n * 1000000) // COUNT(*) AS idf, s.n AS n,
          s.tt AS tt
        FROM q, s GROUP BY term, s.n, s.tt),
      sc AS (
        SELECT doc_id,
          SUM(idf * ((44 * tf * tt * 1000)
            // (20 * tf * tt + 6 * tt + 18 * dl * n))) AS sco
        FROM q JOIN w USING (term) GROUP BY doc_id),
      a AS (
        SELECT doc_id,
          ROW_NUMBER() OVER (ORDER BY sco DESC, doc_id) AS ra
        FROM sc ORDER BY sco DESC, doc_id LIMIT $k),
      btf AS (
        SELECT doc_id, COUNT(*) AS tf FROM dd
        WHERE term IN ('join', 'filter', 'scan') GROUP BY doc_id),
      b AS (
        SELECT doc_id,
          ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id) AS rb
        FROM btf ORDER BY tf DESC, doc_id LIMIT $k),
      pairs AS (
        SELECT GREATEST(a.ra, b.rb) AS dmax
        FROM a JOIN b USING (doc_id)),
      wt(d, w) AS (VALUES $wt),
      xd AS (
        SELECT wt.d, CAST(COUNT(pairs.dmax) AS BIGINT) AS x_d, wt.w
        FROM wt LEFT JOIN pairs ON pairs.dmax <= wt.d
        GROUP BY wt.d, wt.w)
      SELECT CAST(d AS BIGINT) AS d, x_d, w,
        CAST(SUM(x_d * w) OVER () // 2520000000 AS BIGINT) AS rbo_x1e4
      FROM xd ORDER BY d"""
    },
    notes = "truncated RBO@10 (p=0.9) between BM25 and raw-tf " +
      "rankings; lcm-cleared integer weights shared as literals")

  /** FEATURE HASHING ([[graft.operators.Dsir.hashedFeatures]]): fixed
    * 12-bucket signed bag-of-words per doc — the vocab-free featurizer
    * (bucket and sign both md5-derived, so vectors are layout- and
    * engine-independent). Complements [[qTokenIds]] (exact vocab
    * lookup) with the shape that needs NO vocabulary state at all.
    * Twin regenerates bucket and sign from the same md5 nibbles. */
  val qFeatureHash = GQuery("q_feature_hash",
    (s, d) => graft.operators.Dsir.hashedFeatures(
      Tables.documents(s, d), "doc_id", "text", nBuckets = 12),
    Some {
      def hv(i: Int) =
        s"""(CASE WHEN ascii(substr(md5(w), $i, 1)) >= 97
           THEN ascii(substr(md5(w), $i, 1)) - 87
           ELSE ascii(substr(md5(w), $i, 1)) - 48 END)"""
      val fs = (0 until 12).map(i =>
        s"CAST(SUM(CASE WHEN b = $i THEN sgn ELSE 0 END) AS BIGINT) AS f$i")
        .mkString(",\n        ")
      s"""WITH tok AS (
        SELECT doc_id,
          unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
            w -> len(w) > 0)) AS w
        FROM documents),
      h AS (
        SELECT doc_id, ((${hv(1)} * 16 + ${hv(2)}) % 12) AS b,
          CASE WHEN ${hv(3)} % 2 = 0 THEN 1 ELSE -1 END AS sgn
        FROM tok)
      SELECT doc_id, $fs
      FROM h GROUP BY doc_id ORDER BY doc_id"""
    },
    notes = "hashing-trick featurizer: md5 bucket + parity sign, " +
      "zero vocabulary state, zero-mean collision noise")

  /** FILL-IN-THE-MIDDLE TRANSFORM (Bavarian et al. 2022): rewrite each
    * document as ⟨PRE⟩prefix⟨SUF⟩suffix⟨MID⟩middle — the training-data
    * reordering that teaches a causal LM to infill. The two character
    * cut points are md5-DERIVED (4-nibble fold mod len−1, the
    * [[graft.operators.Sampling]] portability argument: a property of
    * the bytes, not of partitioning or RNG state), so the corpus
    * transform is bit-reproducible anywhere; p1=p2 degenerates to an
    * empty middle, which stays a valid example. Pure per-row project —
    * zero shuffles except the presentation sort; the gate pins the cut
    * arithmetic AND the reassembled string bytes via md5. */
  val qFimTransform = GQuery("q_fim_transform",
    (s, d) => graft.operators.Denoise.fimTransform(
        Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("len"), col("p1"), col("p2"),
        md5(col("fim")).as("fim_md5"))
      .orderBy(col("doc_id")),
    Some {
      def hv(salt: String, i: Int) =
        s"""(CASE WHEN ascii(substr(md5('$salt' || CAST(doc_id AS VARCHAR)), $i, 1)) >= 97
           THEN ascii(substr(md5('$salt' || CAST(doc_id AS VARCHAR)), $i, 1)) - 87
           ELSE ascii(substr(md5('$salt' || CAST(doc_id AS VARCHAR)), $i, 1)) - 48 END)"""
      def fold4(salt: String) = (1 to 4)
        .map(i => s"${hv(salt, i)} * ${math.pow(16, 4 - i).toLong}")
        .mkString(" + ")
      s"""WITH c AS (
        SELECT doc_id, text, CAST(len(text) AS BIGINT) AS len,
          (${fold4("fim1:")}) % (len(text) - 1) + 1 AS a,
          (${fold4("fim2:")}) % (len(text) - 1) + 1 AS b
        FROM documents WHERE len(text) >= 8),
      p AS (
        SELECT doc_id, len, LEAST(a, b) AS p1, GREATEST(a, b) AS p2, text
        FROM c)
      SELECT doc_id, len, CAST(p1 AS BIGINT) AS p1, CAST(p2 AS BIGINT) AS p2,
        md5('<PRE>' || substr(text, 1, CAST(p1 AS INT))
          || '<SUF>' || substr(text, CAST(p2 + 1 AS INT))
          || '<MID>' || substr(text, CAST(p1 + 1 AS INT), CAST(p2 - p1 AS INT)))
          AS fim_md5
      FROM p ORDER BY doc_id"""
    },
    notes = "md5-derived character cut points; reassembled " +
      "PRE/SUF/MID bytes pinned by md5; zero-shuffle per-row transform")

  /** SPAN CORRUPTION (T5, Raffel et al. 2020): mask ~9% of tokens in
    * length-3 spans, emitting the sentinel-bearing INPUT and the
    * sentinel→tokens TARGET — the denoising-objective pair builder.
    * Span starts are md5-coin decisions at every 8th position (stride
    * 8 > span 3 ⇒ spans can never overlap, so no greedy scan is
    * needed and the decision is embarrassingly per-position); sentinel
    * ordinals come from a cumulative count of starts, the only
    * non-per-row step. Deterministic: the coin is a property of
    * (doc_id, position) bytes. One explode + one doc-keyed
    * reassembly agg; both output strings pinned by md5. */
  val qSpanMask = GQuery("q_span_mask",
    (s, d) => graft.operators.Denoise.spanCorrupt(
        Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("n_masked"),
        col("n_spans"), md5(col("input")).as("input_md5"),
        md5(col("target")).as("target_md5"))
      .orderBy(col("doc_id")),
    Some {
      val hv = """(CASE WHEN ascii(substr(md5('span:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i - (i % 8) AS VARCHAR)), 1, 1)) >= 97
        THEN ascii(substr(md5('span:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i - (i % 8) AS VARCHAR)), 1, 1)) - 87
        ELSE ascii(substr(md5('span:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i - (i % 8) AS VARCHAR)), 1, 1)) - 48 END)"""
      s"""WITH tk AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\\s+'),
            w -> len(w) > 0) AS toks
        FROM documents),
      tok AS (
        SELECT doc_id, unnest(toks) AS tok,
          generate_subscripts(toks, 1) - 1 AS i
        FROM tk),
      c AS (
        SELECT doc_id, i, tok,
          ($hv < 4) AND (i % 8) < 3 AS masked,
          ($hv < 4) AND (i % 8) = 0 AS is_start
        FROM tok),
      k AS (
        SELECT *, SUM(CASE WHEN is_start THEN 1 ELSE 0 END)
            OVER (PARTITION BY doc_id ORDER BY i) AS span_idx
        FROM c),
      p AS (
        SELECT doc_id, i, masked, is_start,
          CASE WHEN is_start THEN '<X' || CAST(span_idx - 1 AS VARCHAR) || '>'
            WHEN masked THEN NULL ELSE tok END AS pin,
          CASE WHEN is_start THEN '<X' || CAST(span_idx - 1 AS VARCHAR) || '>' || ' ' || tok
            WHEN masked THEN tok ELSE NULL END AS ptg
        FROM k)
      SELECT doc_id, COUNT(*) AS n_tokens,
        CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
        CAST(SUM(CASE WHEN is_start THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
        md5(COALESCE(string_agg(pin, ' ' ORDER BY i), '')) AS input_md5,
        md5(COALESCE(string_agg(ptg, ' ' ORDER BY i), '')) AS target_md5
      FROM p GROUP BY doc_id ORDER BY doc_id"""
    },
    notes = "stride-8 md5-coin span starts (never overlapping), " +
      "sentinel ordinals from one cumulative count; input/target " +
      "strings pinned by md5")

  /** NEGATIVE SAMPLING TABLE ([[graft.operators.Contrastive
    * .negativeSamples]]): 3 word2vec negatives per (doc, position)
    * from the unigram^(3/4) distribution — weights from the FULL
    * corpus, draws md5-derived (reproducible on any layout/retry),
    * the c^(3/4) smoothing realized as floor(sqrt·sqrt∘sqrt) so both
    * engines share correctly-rounded IEEE with no libm pow. The gate
    * draws for every 50th doc (the vocabulary still builds from all
    * docs); the twin replays weights, cumulative ranges, fold, and
    * the inverse-CDF range lookup. */
  val qNegSampling = GQuery("q_neg_sampling",
    (s, d) => graft.operators.Contrastive.negativeSamples(
      Tables.documents(s, d), "doc_id", "text", k = 3,
      docFilter = col("doc_id") % 50 === 0),
    Some {
      def hv(i: Int) =
        s"""(CASE WHEN ascii(substr(hh, $i, 1)) >= 97
           THEN ascii(substr(hh, $i, 1)) - 87
           ELSE ascii(substr(hh, $i, 1)) - 48 END)"""
      val fold = (1 to 12)
        .map(i => s"CAST(${hv(i)} AS BIGINT) * ${BigInt(16).pow(12 - i).toLong}")
        .mkString(" + ")
      s"""WITH tk AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\\s+'),
            w -> len(w) > 0) AS toks
        FROM documents),
      inst AS (
        SELECT doc_id, unnest(toks) AS center,
          generate_subscripts(toks, 1) - 1 AS pos
        FROM tk),
      vc AS (SELECT center AS w_tok, COUNT(*) AS c FROM inst GROUP BY 1),
      vw AS (SELECT w_tok,
          CAST(floor(sqrt(c) * sqrt(sqrt(c))) AS BIGINT) AS w
        FROM vc),
      rng AS (SELECT w_tok, w,
          COALESCE(SUM(w) OVER (ORDER BY w_tok
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
        FROM vw),
      rng2 AS (SELECT w_tok, lo, lo + w AS hi FROM rng),
      tw AS (SELECT SUM(w) AS tw FROM vw),
      dr AS (
        SELECT doc_id, pos, center, t.i,
          md5('neg:' || CAST(doc_id AS VARCHAR) || ':'
            || CAST(pos AS VARCHAR) || ':' || CAST(t.i AS VARCHAR)) AS hh
        FROM inst CROSS JOIN range(1, 4) t(i)
        WHERE doc_id % 50 = 0),
      fv AS (SELECT doc_id, pos, center, i, ($fold) % tw.tw AS r
        FROM dr, tw)
      SELECT doc_id, CAST(pos AS BIGINT) AS pos, center,
        CAST(i AS BIGINT) AS i, rng2.w_tok AS neg
      FROM fv JOIN rng2 ON fv.r >= rng2.lo AND fv.r < rng2.hi
      ORDER BY doc_id, pos, i"""
    },
    notes = "unigram^0.75 inverse-CDF draws, md5-deterministic; " +
      "bounded-vocab broadcast range lookup; full-corpus weights, " +
      "sampled draw set")

  /** COLLOCATIONS ([[graft.operators.Index.collocations]]): adjacent-pair
    * lift `c_ab/(c_a·c_b)` — PMI-monotone for a fixed corpus but computed
    * with one multiply + one divide of exact integer counts, so the score
    * itself sits under the hash gate (libm log would not). */
  val qCollocations = GQuery("q_collocations",
    (s, d) => graft.operators.Index.collocations(
        Tables.documents(s, d), "text", minCount = 5L, k = 100),
    Some("""WITH t AS (
        SELECT list_filter(string_split_regex(trim(text), '\s+'),
          w -> len(w) > 0) AS toks
        FROM documents),
      ix AS (
        SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 2),
      pc AS (
        SELECT toks[i] AS t1, toks[i + 1] AS t2, COUNT(*) AS c_ab
        FROM ix GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      uni AS (
        SELECT u AS term, COUNT(*) AS c
        FROM (SELECT unnest(toks) AS u FROM t) GROUP BY u),
      sc AS (
        SELECT t1, t2, c_ab, a.c AS c_a, b.c AS c_b,
          CAST(c_ab AS DOUBLE) / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE))
            AS lift
        FROM pc JOIN uni a ON pc.t1 = a.term JOIN uni b ON pc.t2 = b.term)
      SELECT CAST(row_number() OVER (ORDER BY lift DESC, t1, t2) AS BIGINT)
          AS rank,
        t1, t2, CAST(c_ab AS BIGINT) AS c_ab, CAST(c_a AS BIGINT) AS c_a,
        CAST(c_b AS BIGINT) AS c_b, lift
      FROM sc ORDER BY lift DESC, t1, t2 LIMIT 100"""),
    notes = "PMI-monotone lift from exact integer counts; score hash-exact")

  /** EQUI-DEPTH LENGTH BINS: NTILE(8) over (n_chars, doc_id) per language —
    * the curriculum-bucketing / length-balanced-batch shape. NTILE's
    * remainder-to-early-buckets rule is engine-standard, and the (n_chars,
    * doc_id) total order makes bucket edges deterministic on ties. One key
    * exchange for the window, then a map-side-combined (lang, bin) agg.
    * At 100 TB the same shape runs off approx percentile edges; this is
    * the exact oracle-able form. */
  val qNtileBins = GQuery("q_ntile_bins",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, d).select(col("lang"), col("doc_id"), col("n_chars"))
        .withColumn("bin", ntile(8).over(w).cast("long"))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang"), col("bin"))
    },
    Some("""WITH b AS (
        SELECT lang, n_chars, CAST(NTILE(8) OVER (PARTITION BY lang
          ORDER BY n_chars, doc_id) AS BIGINT) AS bin
        FROM documents)
      SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      FROM b GROUP BY lang, bin ORDER BY lang, bin"""),
    notes = "equi-depth curriculum bins; deterministic NTILE edges, one exchange")

  /** Naive-Bayes TRAINING summary ([[graft.operators.NaiveBayes
    * .modelSummary]]): per-class doc counts, token totals, vocabulary
    * size and modal token of the multinomial model — one corpus
    * explode + (class, token) groupBy, output vocabulary-bounded. */
  val qNbModel = GQuery("q_nb_model",
    (s, d) => graft.operators.NaiveBayes.modelSummary(
        Tables.documents(s, d), "doc_id", "text", "lang")
      .orderBy(col("cls")),
    Some("""WITH inst AS (
        SELECT doc_id, lang AS cls, unnest(list_filter(
          string_split_regex(trim(lower(text)), '\s+'),
          t -> len(t) > 0)) AS token
        FROM documents),
      model AS (SELECT cls, token, COUNT(*) AS cnt FROM inst GROUP BY 1, 2),
      docs AS (SELECT lang AS cls, COUNT(*) AS n_docs
        FROM documents GROUP BY 1),
      tops AS (
        SELECT cls, token AS top_token FROM model
        QUALIFY row_number() OVER (PARTITION BY cls
          ORDER BY cnt DESC, token) = 1),
      summ AS (
        SELECT cls, CAST(SUM(cnt) AS BIGINT) AS tot_tokens,
          COUNT(*) AS vocab_c
        FROM model GROUP BY 1)
      SELECT s.cls, d.n_docs, s.tot_tokens, s.vocab_c, t.top_token
      FROM summ s JOIN docs d USING (cls) JOIN tops t USING (cls)
      ORDER BY cls"""),
    notes = "multinomial NB training pass; modal token tie-broken " +
      "lexicographically")

  /** Naive-Bayes CLASSIFICATION ([[graft.operators.NaiveBayes
    * .classify]]): the fastText-style language/quality-filter step,
    * integer-exact — add-one-smoothed multinomial NB scored in 1/64-bit
    * fixed-point log₂ units ([[graft.operators.NaiveBayes.lg64]]:
    * mantissa-tracked repeated 4th powers, pure int64, identical
    * cross-engine by construction), argmax tie-broken on the smallest
    * class. Training AND scoring under one hash-exact oracle; no
    * golden. At this resolution the integer classifier reproduces
    * float NB's accuracy exactly (whole-bit flooring inverted it). */
  val qNbClassify = GQuery("q_nb_classify",
    (s, d) => graft.operators.NaiveBayes.classify(
        Tables.documents(s, d), "doc_id", "text", "lang")
      .orderBy(col("doc_id")),
    Some(s"""WITH inst AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(trim(lower(text)), '\\s+'),
          t -> len(t) > 0)) AS token
        FROM documents),
      model AS (
        SELECT d.lang AS cls, i.token, COUNT(*) AS cnt
        FROM inst i JOIN documents d USING (doc_id) GROUP BY 1, 2),
      vocab AS (SELECT COUNT(DISTINCT token) AS v FROM model),
      ${graft.operators.NaiveBayes.sqlLg64Chain(
        "model", "cnt + 1", Seq("cls", "token"), "mclg", "lgc")},
      tot0 AS (
        SELECT m.cls,
          CAST(SUM(m.cnt) AS BIGINT) + ANY_VALUE(vocab.v) AS nd
        FROM model m, vocab GROUP BY m.cls),
      ${graft.operators.NaiveBayes.sqlLg64Chain(
        "tot0", "nd", Seq("cls"), "dlg", "denom")},
      doc0 AS (SELECT lang AS cls, COUNT(*) AS n_docs
        FROM documents GROUP BY 1),
      ${graft.operators.NaiveBayes.sqlLg64Chain(
        "doc0", "n_docs", Seq("cls"), "plg", "prior")},
      totals AS (SELECT dlg.cls, plg.prior, dlg.denom
        FROM dlg JOIN plg USING (cls)),
      scored AS (
        SELECT i.doc_id, t.cls,
          MAX(t.prior) + SUM(COALESCE(m.lgc, 0) - t.denom) AS score
        FROM inst i
        CROSS JOIN totals t
        LEFT JOIN mclg m ON m.token = i.token AND m.cls = t.cls
        GROUP BY 1, 2),
      pred AS (
        SELECT doc_id, cls AS pred, score
        FROM scored QUALIFY row_number() OVER (PARTITION BY doc_id
          ORDER BY score DESC, cls) = 1)
      SELECT p.doc_id, p.pred, d.lang AS actual,
        CAST(p.pred = d.lang AS INT) AS correct,
        CAST(p.score AS BIGINT) AS score
      FROM pred p JOIN documents d USING (doc_id) ORDER BY doc_id"""),
    notes = "1/64-bit fixed-point log2 multinomial NB; two corpus " +
      "shuffles (train counts, score join), model side vocabulary-" +
      "bounded, fixed-point logs computed once per MODEL row; " +
      "near-chance accuracy is a property of the shared-vocab corpus")

  /** Greedy k-center CORESET ([[graft.operators.Coreset.kCenter]]):
    * farthest-point traversal over the embeddings — the data-pruning /
    * diverse-subset-selection step. Integer-quantized squared L2, seed
    * at min id, ties to smallest id; the oracle replays the identical
    * argmax trajectory as an unrolled CTE chain. k corpus scans, one
    * 1-row collect each, zero corpus shuffles. */
  val qCoreset = GQuery("q_coreset",
    (s, d) => graft.operators.Coreset.kCenter(
        Tables.embeddings(s, d), "vec_id", "embedding", k = 8)
      .select(col("rank"), col("id").as("vec_id"), col("dist"))
      .orderBy(col("rank")),
    Some(graft.operators.Coreset.sqlKCenter(8)),
    notes = "farthest-point k-center; argmax trajectory bit-replayed " +
      "by the unrolled SQL twin")

  /** Batched lazy-greedy k-center ([[graft.operators.Coreset
    * .kCenterBatched]], m=4): the SAME trajectory as q_coreset in ~k/m
    * barriers — each round collects the top-(m+1) frontier and consumes
    * picks driver-side while they stay strictly above the outsider
    * threshold. Gated against the SAME unrolled sequential twin, so the
    * oracle proves the batching is exact, not approximate. */
  val qCoresetBatched = GQuery("q_coreset_batched",
    (s, d) => graft.operators.Coreset.kCenterBatched(
        Tables.embeddings(s, d), "vec_id", "embedding", k = 8, m = 4)
      .select(col("rank"), col("id").as("vec_id"), col("dist"))
      .orderBy(col("rank")),
    Some(graft.operators.Coreset.sqlKCenter(8)),
    notes = "lazy-greedy batched k-center; exactness vs the sequential " +
      "trajectory enforced by sharing q_coreset's twin")

  /** MMR diversified retrieval ([[graft.operators.Coreset.mmr]]):
    * rerank the top-100 query-relevant vectors so each of the 8 picks
    * maximizes 7·rel − 3·max-sim-to-selected (integer dots over
    * micro-quantized coordinates) — the diversity-aware serving /
    * few-shot-selection step. One corpus scoring map + bounded-pool
    * greedy rounds; trajectory bit-replayed by the unrolled twin. */
  val qMmr = GQuery("q_mmr",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding"))
        .collect()(0).getSeq[Float](0).map(_.toDouble)
      graft.operators.Coreset.mmr(emb, "vec_id", "embedding", qv,
          n = 100, k = 8)
        .select(col("rank"), col("id").as("vec_id"), col("rel"),
          col("score"))
        .orderBy(col("rank"))
    },
    Some(graft.operators.Coreset.sqlMmr("0", 100, 8)),
    notes = "greedy MMR rerank over a bounded top-n pool; integer " +
      "relevance/similarity, argmax trajectory replayed by the twin")

  /** Contrastive training triples ([[graft.operators.Contrastive
    * .pairs]]): near-dup pairs as (anchor, positive), plus the corpus
    * vector most similar to the anchor (excluding the pair) as the
    * hard negative — the embedding-training data-prep step. Positives
    * replay the brute-force Jaccard oracle; the negative argmax is an
    * integer-dot ranking with smallest-id ties. */
  val qContrastivePairs = GQuery("q_contrastive_pairs",
    (s, d) => graft.operators.Contrastive.pairs(
        Tables.documents(s, d), "doc_id", "text",
        Tables.embeddings(s, d), "vec_id", "embedding",
        numHashes = 64, bands = 16, shingleSize = 5, minJaccard = 0.5)
      .orderBy(col("anchor"), col("positive")),
    Some("""WITH docs AS (
        SELECT doc_id,
          list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), i + 1, 5))) AS sh
        FROM documents),
      sg AS (SELECT doc_id, unnest(sh) AS g FROM docs),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM sg a JOIN sg b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(sh) AS n FROM docs),
      pos AS (
        SELECT id_a AS anchor, id_b AS positive
        FROM inter JOIN cnt ca ON id_a = ca.doc_id
          JOIN cnt cb ON id_b = cb.doc_id
        WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE)
          >= 0.5),
      qv AS (SELECT vec_id AS vid, list_transform(embedding,
          x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        FROM embeddings),
      av AS (SELECT p.anchor, p.positive, q.qv AS aqv
        FROM pos p JOIN qv q ON p.anchor = q.vid),
      scored AS (
        SELECT av.anchor, av.positive, q.vid,
          list_sum(list_transform(list_zip(q.qv, av.aqv),
            p -> p[1]*p[2])) AS dot
        FROM qv q JOIN av ON q.vid <> av.anchor AND q.vid <> av.positive)
      SELECT anchor, positive, vid AS negative, CAST(dot AS BIGINT)
        AS neg_dot
      FROM scored
      QUALIFY row_number() OVER (PARTITION BY anchor, positive
        ORDER BY dot DESC, vid) = 1
      ORDER BY anchor, positive"""),
    notes = "near-dup positives + integer-dot hard negative per anchor; " +
      "bounded anchor broadcast, one corpus scoring scan")

  /** Distributed integer-exact LLOYD k-MEANS ([[graft.operators
    * .Clustering.kMeansSummary]]): 3 exact update rounds from the 8
    * smallest-id seeds, then final per-cluster size / integer inertia /
    * centroid checksum. Every distance is an integer squared L2 and
    * every centroid update an exact integer floor-mean, so the whole
    * trajectory is bit-replayed by the unrolled SQL twin. Per round:
    * one corpus map (k·dim plan literals) + one k·dim-bounded agg —
    * the corpus never shuffles. */
  val qKmeans = GQuery("q_kmeans",
    (s, d) => graft.operators.Clustering.kMeansSummary(
      Tables.embeddings(s, d), "vec_id", "embedding", k = 8, iters = 3),
    Some(graft.operators.Clustering.sqlKMeans(k = 8, iters = 3, dim = 64)),
    notes = "exact Lloyd rounds; integer floor-mean centroids, " +
      "trajectory replayed by the unrolled twin")

  /** GRID-DBSCAN ([[graft.operators.Clustering.gridDbscan]]) — the
    * density-based member of the clustering family (arbitrary-shape
    * clusters + an explicit noise class, which k-means cannot express):
    * 1/32-side cells over the first two embedding dims, core at
    * ≥ 3 points, clusters = components of 8-adjacent core cells via
    * the large-star/small-star operator. Cell side 1/32 is a power of
    * two, so the quantizing multiply is IEEE-exact cross-engine. The
    * corpus contributes one cell-keyed agg; everything downstream runs
    * on the bounded cell table. */
  val qDbscanGrid = GQuery("q_dbscan_grid",
    (s, d) => graft.operators.Clustering.gridDbscan(
      Tables.embeddings(s, d), "vec_id", "embedding",
      scale = 32, minPts = 3L),
    Some(graft.operators.Clustering.sqlGridDbscan(scale = 32,
      minPts = 3L)),
    notes = "grid-DBSCAN: core cells + 8-adjacency components " +
      "(recursive-CTE twin), explicit noise row; cell-bounded " +
      "post-aggregation work")

  /** CLUSTERING QUALITY gate ([[graft.operators.Clustering
    * .silhouetteSummary]]): simplified (centroid-based) silhouette per
    * k-means cluster in integer per-mille — the "is this clustering
    * worth curating against?" number a SemDeDup/cluster-sampling
    * pipeline checks before trusting cluster structure. Same k=8/3-round
    * trajectory as q_kmeans; one corpus map, no vector shuffle. */
  val qSilhouette = GQuery("q_silhouette",
    (s, d) => graft.operators.Clustering.silhouetteSummary(
      Tables.embeddings(s, d), "vec_id", "embedding", k = 8, iters = 3),
    Some(graft.operators.Clustering.sqlSilhouette(k = 8, iters = 3,
      dim = 64)),
    notes = "centroid-based silhouette (the scalable simplification); " +
      "per-mille fixed point, both dists from one sorted array")

  /** SEMDEDUP ([[graft.operators.Clustering.semDedup]]): k-means-blocked
    * semantic near-dup pairs — cluster with 2 exact Lloyd rounds, then
    * exact-decimal cosine only WITHIN clusters (the Abbas et al. 2023
    * shape; complements the LSH-blocked q_embedding_neardup). Planted
    * duplicates (every 20th vector re-appended) guarantee a non-vacuous
    * gate; the twin replays clustering AND pairing. */
  val qSemDedup = GQuery("q_semdedup",
    (s, d) => {
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      val planted = base.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      graft.operators.Clustering.semDedup(
        base.unionByName(planted), "vec_id", "embedding",
        k = 8, iters = 2, tau = 0.99)
        .select(col("cluster"), col("id_a"), col("id_b"), col("qdot"))
    },
    Some(graft.operators.Clustering.sqlSemDedup(
      """SELECT vec_id AS id, embedding FROM embeddings
         UNION ALL
         SELECT vec_id + 100000 AS id, embedding
         FROM embeddings WHERE vec_id % 20 = 0""",
      k = 8, iters = 2, dim = 64, tau = 0.99)),
    notes = "centroid-blocked semantic dedup; pairwise stage bounded " +
      "by cluster sizes, assignment is a map against plan literals")

  /** RECIPROCAL-RANK FUSION ([[graft.operators.Index.rrfFusion]]):
    * hybrid retrieval — the integer-exact BM25 top-50 fused with the
    * dense cosine top-50 for query vector 0 by
    * `Σ ⌊10⁶/(60+rank)⌋` (Cormack et al. 2009). Pure integer fusion
    * of two bounded rankings; the twin recomputes both rankings and
    * the fused order. */
  val qRrfFusion = GQuery("q_rrf_fusion",
    (s, d) => {
      val lex = graft.operators.Index.bm25Search(
        Tables.documents(s, d), "doc_id", "text",
        Seq("join", "filter", "scan"), k = 50)
        .select(col("doc_id"), col("rank"))
      val emb = Tables.embeddings(s, d)
      val sem = Ann.cosineTopK(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 50)
        .select(col("id").as("doc_id"),
          col("rank").cast("long").as("rank"))
      graft.operators.Index.rrfFusion(lex, sem, k = 20)
    },
    Some("""WITH tk AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(text), '\s+'),
            w -> len(w) > 0) AS toks
        FROM documents),
      d AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
        FROM tk),
      q AS (
        SELECT doc_id, dl, term, COUNT(*) AS tf FROM d
        WHERE term IN ('join', 'filter', 'scan') GROUP BY 1, 2, 3),
      s AS (
        SELECT COUNT(*) AS n, CAST(SUM(len(toks)) AS BIGINT) AS tt FROM tk),
      w AS (
        SELECT term, (s.n * 1000000) // COUNT(*) AS idf, s.n AS n,
          s.tt AS tt
        FROM q, s GROUP BY term, s.n, s.tt),
      sc AS (
        SELECT doc_id,
          SUM(idf * ((44 * tf * tt * 1000)
            // (20 * tf * tt + 6 * tt + 18 * dl * n))) AS sco
        FROM q JOIN w USING (term) GROUP BY doc_id),
      lex AS (
        SELECT row_number() OVER (ORDER BY sco DESC, doc_id) AS rank,
          doc_id
        FROM sc ORDER BY sco DESC, doc_id LIMIT 50),
      qv0 AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT e.vec_id AS doc_id,
          CAST(list_sum(list_transform(
              list_zip(e.embedding, qv0.qv),
              p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) AS DECIMAL(28,18))))
            AS DOUBLE)
          / (sqrt(CAST(list_sum(list_transform(e.embedding,
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE))
           * sqrt(CAST(list_sum(list_transform(qv0.qv,
              x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,18)))) AS DOUBLE)))
          AS cos
        FROM embeddings e, qv0),
      sem AS (
        SELECT doc_id,
          ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rank
        FROM scored QUALIFY rank <= 50),
      f AS (
        SELECT COALESCE(l.doc_id, m.doc_id) AS doc_id,
          COALESCE(l.rank, 0) AS lex_rank,
          COALESCE(m.rank, 0) AS sem_rank
        FROM lex l FULL OUTER JOIN sem m ON l.doc_id = m.doc_id),
      g AS (
        SELECT doc_id, lex_rank, sem_rank,
          (CASE WHEN lex_rank > 0 THEN 1000000 // (60 + lex_rank)
            ELSE 0 END)
          + (CASE WHEN sem_rank > 0 THEN 1000000 // (60 + sem_rank)
            ELSE 0 END) AS rrf
        FROM f)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
          AS rank,
        doc_id, CAST(rrf AS BIGINT) AS rrf,
        CAST(lex_rank AS BIGINT) AS lex_rank,
        CAST(sem_rank AS BIGINT) AS sem_rank
      FROM g ORDER BY rrf DESC, doc_id LIMIT 20"""),
    notes = "hybrid BM25+dense fusion; integer 1/(60+r) at 1e6 fixed " +
      "point over two bounded rankings")

  /** DSIR importance resampling ([[graft.operators.Dsir
    * .topKByImportance]]): rank raw documents by how English-like
    * their hashed bag-of-words is (target = lang 'en' docs) under two
    * 128-bucket unigram models — the domain-targeted selection step
    * (Xie et al. 2023), integer-exact: md5-digit buckets, add-one
    * smoothing, 1/64-bit fixed-point log-ratios. One corpus explode
    * feeds the bounded bucket model and the broadcast scoring join. */
  val qDsirSelect = GQuery("q_dsir_select",
    (s, d) => graft.operators.Dsir.topKByImportance(
      Tables.documents(s, d), "doc_id", "text",
      col("lang") === "en", nBuckets = 128, k = 50),
    Some(graft.operators.Dsir.sqlTopKByImportance(
      "lang = 'en'", nBuckets = 128, k = 50)),
    notes = "hashed-ngram importance weights toward a target slice; " +
      "model bucket-bounded, weights lg64-exact")

  /** BATCH PERCEPTRON training ([[graft.operators.Perceptron.train]]):
    * 3 full-batch integer rounds of the linear lang='en' separator
    * over 32 md5-bucket features + bias — the discriminative
    * quality-filter sibling of q_nb_model. The weight trajectory is
    * integer-exact; the twin replays all rounds as chained CTEs. */
  /** TYPO-PAIR MINING ([[graft.operators.Index.typoPairs]]): all
    * vocabulary pairs within edit distance 1 via SymSpell deletion-
    * neighborhood blocking (full recall at distance 1, no all-pairs
    * scan), levenshtein-verified — the noisy-vocabulary collapse step.
    * minCount 2, minLen 4 over the documents corpus. */
  val qTypoPairs = GQuery("q_typo_pairs",
    (s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // the synthetic vocabulary is typo-free — plant single-char
      // corruptions (e→3) of every 25th doc so the gate is non-vacuous
      val planted = base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 500000L).as("doc_id"),
          translate(col("text"), "e", "3").as("text"))
      graft.operators.Index.typoPairs(
        base.unionByName(planted), "text", minCount = 2L, minLen = 4)
    },
    Some("""WITH docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 500000, translate(text, 'e', '3')
        FROM documents WHERE doc_id % 25 = 0),
      v0 AS (
        SELECT term, COUNT(*) AS freq FROM (
          SELECT unnest(list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            w -> len(w) > 0)) AS term
          FROM docs)
        GROUP BY term HAVING COUNT(*) >= 2 AND len(term) >= 4),
      vr AS (
        SELECT term, freq, unnest(list_append(
          list_transform(range(0, len(term)),
            i -> substr(term, 1, i) || substr(term, i + 2)),
          term)) AS v
        FROM v0),
      cand AS (
        SELECT DISTINCT a.term AS term_a, b.term AS term_b,
          a.freq AS freq_a, b.freq AS freq_b
        FROM vr a JOIN vr b ON a.v = b.v AND a.term < b.term)
      SELECT term_a, term_b, CAST(freq_a AS BIGINT) AS freq_a,
        CAST(freq_b AS BIGINT) AS freq_b
      FROM cand WHERE levenshtein(term_a, term_b) <= 1
      ORDER BY term_a, term_b"""),
    notes = "deletion-neighborhood blocking, vocabulary-bounded " +
      "fan-out, exact levenshtein verify")

  /** CLUSTER TOPIC TERMS ([[graft.operators.Clustering.clusterTerms]]):
    * c-TF-IDF labels for the k-means clusters — top-5 terms per
    * cluster by ct·K/cdf (BERTopic's class-based tf-idf; the rational
    * ranks identically to the logged form and is one IEEE divide of
    * exact integers). Makes the embedding clusters human-readable for
    * topic inspect/drop decisions; the twin replays clustering,
    * assignment, and scoring. */
  val qClusterTerms = GQuery("q_cluster_terms",
    (s, d) => graft.operators.Clustering.clusterTerms(
      Tables.embeddings(s, d), "vec_id", "embedding",
      Tables.documents(s, d), "doc_id", "text",
      k = 8, iters = 2, topN = 5),
    Some(graft.operators.Clustering.sqlClusterTerms(
      k = 8, iters = 2, dim = 64, topN = 5)),
    notes = "c-TF-IDF cluster labeling; assignment map + one token " +
      "explode, cdf derived from the count table")

  /** AUDIO FINGERPRINT DEDUP ([[graft.operators.Multimodal
    * .audioFingerprints]] + [[graft.operators.Multimodal
    * .phashDupPairs]]): energy-delta hashes over the REAL WAV decode
    * (64 louder-than-previous bits across 4-sample frames, two 32-bit
    * halves), paired by the same 16-bit-block pigeonhole as
    * q_image_phash — audio near-dup detection through the identical
    * blocking machinery. Every 5th clip is re-appended under a
    * shifted id; the twin recomputes fingerprints from the PCM
    * formula. */
  val qAudioPhash = GQuery("q_audio_phash",
    (s, d) => {
      import graft.operators.Multimodal
      val media = Multimodal.mediaWithRealAudio(s, Tables.documents(s, d))
      val planted = media
        .filter(col("modality") === "audio" && col("media_id") % 5 === 1)
        .withColumn("media_id", col("media_id") + 100000L)
      val hashes = Multimodal
        .audioFingerprints(s, media.unionByName(planted), frameLen = 4)
      Multimodal.phashDupPairs(hashes, maxDist = 3)
    },
    Some("""WITH clips AS (
        SELECT doc_id AS media_id, doc_id AS bid,
          doc_id % 400 + 100 AS n
        FROM documents WHERE doc_id % 3 = 1
        UNION ALL
        SELECT doc_id + 100000, doc_id, doc_id % 400 + 100
        FROM documents WHERE doc_id % 3 = 1 AND doc_id % 5 = 1),
      gi AS (SELECT media_id, bid, unnest(range(0, n)) AS i FROM clips),
      sm AS (SELECT media_id, i // 4 AS frame_id,
          (bid * 31 + i * 7919) % 65536 - 32768 AS v
        FROM gi WHERE i // 4 <= 64),
      en AS (SELECT media_id, frame_id, SUM(ABS(v)) AS e
        FROM sm GROUP BY 1, 2),
      ok AS (SELECT media_id FROM en GROUP BY 1 HAVING COUNT(*) = 65),
      bits AS (
        SELECT a.media_id, a.frame_id AS i,
          CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
        FROM en a JOIN en b ON a.media_id = b.media_id
          AND b.frame_id = a.frame_id + 1
        JOIN ok ON a.media_id = ok.media_id
        WHERE a.frame_id < 64),
      h AS (SELECT media_id,
          SUM(CASE WHEN i < 32
            THEN bit * (CAST(1 AS BIGINT) << i) ELSE 0 END) AS h1,
          SUM(CASE WHEN i >= 32
            THEN bit * (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS h2
        FROM bits GROUP BY media_id),
      blk AS (
        SELECT media_id, h1, h2, 0 AS bi, h1 % 65536 AS bv FROM h
        UNION ALL SELECT media_id, h1, h2, 1, h1 // 65536 FROM h
        UNION ALL SELECT media_id, h1, h2, 2, h2 % 65536 FROM h
        UNION ALL SELECT media_id, h1, h2, 3, h2 // 65536 FROM h),
      cand AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
          a.h1 AS h1a, a.h2 AS h2a, b.h1 AS h1b, b.h2 AS h2b
        FROM blk a JOIN blk b ON a.bi = b.bi AND a.bv = b.bv
          AND a.media_id < b.media_id)
      SELECT id_a, id_b,
        CAST(bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b))
          AS BIGINT) AS hamming
      FROM cand
      WHERE bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b)) <= 3
      ORDER BY id_a, id_b"""),
    notes = "real-decode energy-delta fingerprint; shared pigeonhole " +
      "pairing with the image path, twin from the PCM formula")

  /** MARGIN MINING ([[graft.operators.Perceptron.marginMining]]): the
    * 20 documents the trained lang='en' separator is least sure about
    * (smallest |score|) — the active-learning route-to-review step
    * completing the train → score → mine loop. The twin replays
    * training AND scoring as one chained-CTE program. */
  val qMarginMining = GQuery("q_margin_mining",
    (s, d) => graft.operators.Perceptron.marginMining(
      Tables.documents(s, d), "doc_id", "text",
      col("lang") === "en", nBuckets = 32, iters = 3, k = 20),
    Some(graft.operators.Perceptron.sqlMarginMining(
      "lang = 'en'", nBuckets = 32, iters = 3, k = 20)),
    notes = "ambiguity bottom-k under the integer perceptron; " +
      "broadcast weight scoring, distributed bottom-k")

  /** IMAGE PERCEPTUAL-HASH DEDUP ([[graft.operators.Multimodal
    * .imageDHashes]] + [[graft.operators.Multimodal.phashDupPairs]]):
    * dHash every REAL-decoded PNG (9×8 nearest-sampled grayscale,
    * right-neighbor brightness bits in two 32-bit halves), then find
    * pairs within Hamming distance 3 via the 4×16-bit-block pigeonhole
    * — the visual near-dup step of multimodal curation. Every 5th
    * image is re-appended under a shifted id, so identical-pixel pairs
    * exist by construction; the twin recomputes the hashes from the
    * synthetic pixel formula and replays the blocking. */
  val qImagePhash = GQuery("q_image_phash",
    (s, d) => {
      import graft.operators.Multimodal
      val media = Multimodal.mediaWithRealImages(s, Tables.documents(s, d))
      val planted = media
        .filter(col("modality") === "image" && col("media_id") % 5 === 0)
        .withColumn("media_id", col("media_id") + 100000L)
      val hashes = Multimodal
        .imageDHashes(s, media.unionByName(planted)).toDF()
      Multimodal.phashDupPairs(hashes, maxDist = 3)
    },
    Some("""WITH base AS (
        SELECT doc_id AS media_id, doc_id AS bid FROM documents
        WHERE doc_id % 3 = 0
        UNION ALL
        SELECT doc_id + 100000, doc_id FROM documents
        WHERE doc_id % 3 = 0 AND doc_id % 5 = 0),
      dims AS (SELECT media_id, bid, bid % 16 + 8 AS sw,
          bid % 12 + 8 AS sh
        FROM base),
      gx AS (SELECT media_id, bid, sw, sh, unnest(range(0, 9)) AS x
        FROM dims),
      gxy AS (SELECT media_id, bid, sw, sh, x, unnest(range(0, 8)) AS y
        FROM gx),
      g AS (SELECT media_id, x, y,
          ((bid*31 + (x*sw//9)*7 + (y*sh//8)*13) % 256)
        + ((bid*17 + (x*sw//9)*5 + (y*sh//8)*11) % 256)
        + ((bid*23 + (x*sw//9)*3 + (y*sh//8)*19) % 256) AS gray
        FROM gxy),
      bits AS (
        SELECT a.media_id, a.y, a.x,
          CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
        FROM g a JOIN g b ON a.media_id = b.media_id AND a.y = b.y
          AND b.x = a.x + 1
        WHERE a.x < 8),
      h AS (SELECT media_id,
          SUM(CASE WHEN y < 4
            THEN bit * (CAST(1 AS BIGINT) << (y*8 + x)) ELSE 0 END) AS h1,
          SUM(CASE WHEN y >= 4
            THEN bit * (CAST(1 AS BIGINT) << ((y-4)*8 + x)) ELSE 0 END)
            AS h2
        FROM bits GROUP BY media_id),
      blk AS (
        SELECT media_id, h1, h2, 0 AS bi, h1 % 65536 AS bv FROM h
        UNION ALL SELECT media_id, h1, h2, 1, h1 // 65536 FROM h
        UNION ALL SELECT media_id, h1, h2, 2, h2 % 65536 FROM h
        UNION ALL SELECT media_id, h1, h2, 3, h2 // 65536 FROM h),
      cand AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
          a.h1 AS h1a, a.h2 AS h2a, b.h1 AS h1b, b.h2 AS h2b
        FROM blk a JOIN blk b ON a.bi = b.bi AND a.bv = b.bv
          AND a.media_id < b.media_id)
      SELECT id_a, id_b,
        CAST(bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b))
          AS BIGINT) AS hamming
      FROM cand
      WHERE bit_count(xor(h1a, h1b)) + bit_count(xor(h2a, h2b)) <= 3
      ORDER BY id_a, id_b"""),
    notes = "real-decode dHash + 16-bit-block pigeonhole; twin " +
      "recomputes hashes from the analytic pixel formula")

  /** WEIGHTED SAMPLING WITHOUT REPLACEMENT ([[graft.operators.Sampling
    * .weightedSample]]): Efraimidis–Spirakis A-Res in fixed point —
    * md5-derived uniforms, lg64 log, integer priority
    * ⌊(2048−lg64(u))·2²⁰/w⌋ minimized — the quality-weighted corpus
    * selection step (w = n_chars here). Top-50, no RNG, no global
    * sort; the twin replays the exact priorities. */
  val qWeightedSample = GQuery("q_weighted_sample",
    (s, d) => graft.operators.Sampling.weightedSample(
      Tables.documents(s, d), "doc_id", "n_chars", k = 50),
    Some {
      def hv(i: Int) =
        s"""CAST(CASE WHEN ascii(substr(h, $i, 1)) >= 97
           THEN ascii(substr(h, $i, 1)) - 87
           ELSE ascii(substr(h, $i, 1)) - 48 END AS BIGINT)"""
      val mults = Seq(268435456L, 16777216L, 1048576L, 65536L,
        4096L, 256L, 16L, 1L)
      val u = (1 to 8).map(i => s"${hv(i)} * ${mults(i - 1)}")
        .mkString(" + ")
      val chain = graft.operators.NaiveBayes.sqlLg64Chain(
        "uu", "u", Seq("doc_id", "n_chars"), "lc", "l64")
      s"""WITH b AS (
        SELECT doc_id, n_chars,
          md5('graft:' || CAST(doc_id AS VARCHAR)) AS h
        FROM documents WHERE n_chars >= 1),
      uu AS (SELECT doc_id, n_chars, ($u) + 1 AS u FROM b),
      $chain,
      pr AS (SELECT doc_id, n_chars,
          ((2048 - l64) * 1048576) // n_chars AS priority
        FROM lc)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY priority, doc_id)
          AS BIGINT) AS rank,
        doc_id, n_chars, CAST(priority AS BIGINT) AS priority
      FROM pr ORDER BY priority, doc_id LIMIT 50"""
    },
    notes = "E-S weighted reservoir in fixed point; map-side priority, " +
      "distributed top-k, reproducible by construction")

  val qPerceptron = GQuery("q_perceptron",
    (s, d) => graft.operators.Perceptron.train(
      Tables.documents(s, d), "doc_id", "text",
      col("lang") === "en", nBuckets = 32, iters = 3),
    Some(graft.operators.Perceptron.sqlTrain(
      "lang = 'en'", nBuckets = 32, iters = 3)),
    notes = "integer full-batch perceptron; per-round broadcast weight " +
      "join + bucket-bounded gradient agg, zero driver state")

  /** TOKEN-DISTRIBUTION ENTROPY per document — the unigram-diversity
    * quality signal (low entropy ⇒ repetitive/templated text; the
    * complement of [[qRepetition]]'s n-gram view). Shannon entropy over
    * the doc's whitespace-token histogram, EXACT fixed point via
    * [[graft.operators.NaiveBayes.lg64]]:
    *
    *   ent_x64 = (n·lg64(n) − Σ_t c_t·lg64(c_t)) div n   (≈ 64·H bits)
    *
    * — pure int64 in both engines, so ranking and values hash-match
    * with zero libm. Plan: one corpus-token shuffle (doc,token counts,
    * map-side combined) + one doc-keyed re-agg; lg64 rides as a codegen
    * expression, no joins. At 100 TB this is the same two-exchange
    * shape as every token query here. Docs with no tokens drop out in
    * both engines (explode/unnest of an empty list). */
  val qTokenEntropy = GQuery("q_token_entropy",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(filter(
          split(lower(trim(col("text"))), "\\s+"),
          t => length(t) > 0)).as("token"))
      val cts = toks.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("c"))
        .withColumn("clg",
          col("c") * graft.operators.NaiveBayes.lg64(col("c")))
      cts.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(col("clg")).as("sum_clg"))
        .withColumn("lgn", graft.operators.NaiveBayes.lg64(col("n_tokens")))
        .withColumn("ent_x64",
          expr("(n_tokens * lgn - sum_clg) div n_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("ent_x64"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(lower(trim(text)), '\s+'),
          t -> len(t) > 0)) AS token
        FROM documents),
      cts AS (SELECT doc_id, token, COUNT(*) AS c FROM toks GROUP BY 1, 2),
      dc AS (SELECT DISTINCT c FROM cts),
      """ + graft.operators.NaiveBayes.sqlLg64Chain(
        "dc", "c", Seq("c"), "lgc", "lg") + """,
      tot AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
          SUM(c * lgc.lg) AS sum_clg
        FROM cts JOIN lgc USING (c) GROUP BY 1),
      dn AS (SELECT DISTINCT n_tokens FROM tot),
      """ + graft.operators.NaiveBayes.sqlLg64Chain(
        "dn", "n_tokens", Seq("n_tokens"), "lgn", "lgnv") + """
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(n_distinct AS BIGINT) AS n_distinct,
        CAST((n_tokens * lgn.lgnv - sum_clg) // n_tokens AS BIGINT)
          AS ent_x64
      FROM tot JOIN lgn USING (n_tokens)
      ORDER BY doc_id"""),
    notes = "unigram entropy in lg64 fixed point; two exchanges, " +
      "lg64 codegen'd Spark-side, value-joined twin-side")

  /** EXACT ROC-AUC ([[graft.operators.Analytics.rocAuc]]) of the
    * English-stopword-count score predicting lang='en' — the eval
    * metric a filtering pipeline reports for every quality classifier,
    * computed exactly (tie-correct Mann–Whitney, integer fixed point)
    * instead of by threshold sweeping. */
  val qAuc = GQuery("q_auc",
    (s, d) => {
      val stop = graft.functions.TextFeatures.enStopwords
      val scored = Tables.documents(s, d)
        .select(size(filter(
          split(lower(trim(col("text"))), "\\s+"),
          t => t.isInCollection(stop))).cast("long").as("score"),
          (col("lang") === "en").as("is_en"))
      graft.operators.Analytics.rocAuc(scored, "score", "is_en")
    },
    Some {
      val stop = graft.functions.TextFeatures.enStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH per AS (
        SELECT CAST(len(list_filter(
            string_split_regex(lower(trim(text)), '\\s+'),
            t -> t IN ($stop))) AS BIGINT) AS s,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
        FROM documents),
      g AS (SELECT s, SUM(p) AS pc, SUM(1 - p) AS nc FROM per
        GROUP BY 1),
      c AS (SELECT s, pc, nc, COALESCE(SUM(nc) OVER (ORDER BY s
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        FROM g)
      SELECT CAST(SUM(pc) AS BIGINT) AS n_pos,
        CAST(SUM(nc) AS BIGINT) AS n_neg,
        CAST(SUM(pc * (2 * nb + nc)) AS BIGINT) AS u2,
        CAST(SUM(pc * (2 * nb + nc)) * 1000000
          // (2 * SUM(pc) * SUM(nc)) AS BIGINT) AS auc_x1e6
      FROM c"""
    },
    notes = "tie-correct Mann-Whitney AUC on the bounded distinct-" +
      "score table; one corpus agg, one bounded window")

  /** CALIBRATION CURVE for the same score/label pair as [[qAuc]]:
    * decile the score (NTILE with doc_id tie-break — positional fill,
    * deterministic both engines), report per-decile positive rate in
    * per-mille next to the score band. AUC says "ranks well";
    * calibration says "the score VALUE means what it claims" — the
    * second eval primitive a filtering pipeline reports. The global
    * NTILE sorts the |docs|-row scored table; eval runs on bounded
    * samples by construction. */
  /** ISOTONIC CALIBRATION — the monotone regression every production
    * calibrator (sklearn's `IsotonicRegression`, ad-ranking stacks)
    * fits over score bins, realized through the MINIMAX identity
    * iso(b) = max_{i≤b} min_{j≥b} rate(i..j) — mathematically EQUAL to
    * the PAVA pool-adjacent-violators fit (Robertson et al., Ch.1) but
    * expressible as bounded joins both engines evaluate identically,
    * where PAVA's data-dependent merge order is not. Floor-quantizing
    * segment rates to ppm commutes with max/min (they SELECT elements,
    * never average), so the output is exactly ⌊PAVA·10⁶⌋ — pinned in
    * spec against a real exact-rational PAVA implementation.
    *
    * Score = type-token ratio in 50‰ bins; outcome = mean word length
    * ≥ 4.5 (the [[graft.queries.InferenceQueries.qCohenKappa]]
    * annotator pair, whose raw rates are genuinely non-monotone here,
    * so blocks actually pool). Scale shape: ONE corpus scan to the
    * ≤20-bin table; prefix sums, the i≤j segment join, and the
    * b∈[i,j] cover join all run on bounded state (≤20³ rows). */
  val qIsotonic = GQuery("q_isotonic",
    (s, d) => {
      val words = filter(split(lower(trim(col("text"))), "\\s+"),
        t => t =!= lit(""))
      val bins = Tables.documents(s, d)
        .select(words.as("w")).filter(size(col("w")) > 0)
        .select(
          least(expr("size(array_distinct(w)) * 1000L div size(w) div 50L"),
            lit(19L)).as("bin"),
          when(expr("aggregate(w, 0L, (acc, t) -> acc + length(t))" +
            " * 10L div size(w)") >= 45L, 1L).otherwise(0L).as("pos"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
      val cumW = org.apache.spark.sql.expressions.Window
        .orderBy(col("bin"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val cums = bins
        .withColumn("cn", sum(col("n")).over(cumW))
        .withColumn("cp", sum(col("p")).over(cumW))
        .localCheckpoint(true)
      val lo = cums.select(col("bin").as("i"),
        (col("cn") - col("n")).as("cn0"), (col("cp") - col("p")).as("cp0"))
      val hi = cums.select(col("bin").as("j"), col("cn").as("cnj"),
        col("cp").as("cpj"))
      val segs = lo.join(hi, col("i") <= col("j"))
        .select(col("i"), col("j"),
          expr("(cpj - cp0) * 1000000 div (cnj - cn0)").as("rate"))
      val cover = segs.join(
        cums.select(col("bin"), col("n"), col("p")),
        col("bin") >= col("i") && col("bin") <= col("j"))
      cover.groupBy(col("bin"), col("n"), col("p"), col("i"))
        .agg(min(col("rate")).as("minr"))
        .groupBy(col("bin"), col("n"), col("p"))
        .agg(max(col("minr")).as("iso_ppm"))
        .select(col("bin"), col("n"), col("p"),
          expr("p * 1000000 div n").as("raw_ppm"), col("iso_ppm"))
        .orderBy(col("bin"))
    },
    Some("""WITH w AS (
        SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'),
          t -> len(t) > 0) AS l
        FROM documents),
      s AS (SELECT
          least((len(list_distinct(l)) * 1000 // len(l)) // 50, 19)
            AS bin,
          CASE WHEN list_sum(list_transform(l, t -> len(t))) * 10
            // len(l) >= 45 THEN 1 ELSE 0 END AS pos
        FROM w WHERE len(l) > 0),
      bins AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(pos) AS BIGINT) AS p
        FROM s GROUP BY 1),
      cums AS (SELECT bin, n, p,
          SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cn,
          SUM(p) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cp
        FROM bins),
      segs AS (SELECT a.bin AS i, b.bin AS j,
          (b.cp - (a.cp - a.p)) * 1000000 // (b.cn - (a.cn - a.n))
            AS rate
        FROM cums a JOIN cums b ON a.bin <= b.bin),
      cover AS (SELECT c.bin, c.n, c.p, g.i, g.rate
        FROM segs g JOIN cums c ON c.bin BETWEEN g.i AND g.j),
      inner_min AS (SELECT bin, n, p, i, MIN(rate) AS minr
        FROM cover GROUP BY 1, 2, 3, 4)
      SELECT bin, n, p, CAST(p * 1000000 // n AS BIGINT) AS raw_ppm,
        CAST(MAX(minr) AS BIGINT) AS iso_ppm
      FROM inner_min GROUP BY bin, n, p
      ORDER BY bin"""),
    notes = "minimax isotonic fit (= PAVA exactly; floor commutes with " +
      "the max-min selections); one corpus scan to <=20 bins, bounded " +
      "segment/cover joins")

  val qCalibration = GQuery("q_calibration",
    (s, d) => {
      val stop = graft.functions.TextFeatures.enStopwords
      val scored = Tables.documents(s, d)
        .select(col("doc_id"),
          size(filter(split(lower(trim(col("text"))), "\\s+"),
            t => t.isInCollection(stop))).cast("long").as("score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score"), col("doc_id"))
      scored.withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
        .withColumn("rate_x1000", expr("n_pos * 1000 div n"))
        .select(col("decile"), col("n"), col("n_pos"), col("min_score"),
          col("max_score"), col("rate_x1000"))
        .orderBy(col("decile"))
    },
    Some {
      val stop = graft.functions.TextFeatures.enStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH scored AS (
        SELECT doc_id,
          CAST(len(list_filter(
            string_split_regex(lower(trim(text)), '\\s+'),
            t -> t IN ($stop))) AS BIGINT) AS score,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents),
      dec AS (SELECT score, pos,
          NTILE(10) OVER (ORDER BY score, doc_id) AS decile
        FROM scored)
      SELECT CAST(decile AS BIGINT) AS decile,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(pos) AS BIGINT) AS n_pos,
        CAST(MIN(score) AS BIGINT) AS min_score,
        CAST(MAX(score) AS BIGINT) AS max_score,
        CAST(SUM(pos) * 1000 // COUNT(*) AS BIGINT) AS rate_x1000
      FROM dec GROUP BY 1 ORDER BY decile"""
    },
    notes = "NTILE deciles with positional tie-break; per-decile " +
      "positive rate in per-mille")

  /** NDCG@50 of the stopword-count ranking against the lang='en' label
    * — the position-discounted retrieval metric next to [[qAuc]] (rank
    * quality anywhere) and [[qLiftAtK]] (head precision). Binary gains;
    * discount 1/log₂(i+1) carried as the PLAN-TIME literal
    * w_i = 64·10⁶ div lg64(i+1): positions are CONSTANTS, so one
    * Scala-computed table ([[graft.operators.NaiveBayes.lg64Long]],
    * spec-pinned ≡ the Column lg64) is inlined into BOTH engines —
    * zero cross-engine log risk by construction. IDCG is the prefix
    * sum at min(P, k) from the same table. One TakeOrdered slice + a
    * 1-row totals cross join. Output: (k, hits, dcg_x, idcg_x,
    * ndcg_x1e6). */
  val qNdcg = GQuery("q_ndcg",
    (s, d) => {
      val k = 50
      val wts: Seq[Long] = (1 to k).map(i =>
        64000000L / graft.operators.NaiveBayes.lg64Long(i + 1L))
      val prefix: Seq[Long] = wts.scanLeft(0L)(_ + _).tail
      val stop = graft.functions.TextFeatures.enStopwords
      val scored = Tables.documents(s, d)
        .select(col("doc_id"),
          size(filter(split(lower(trim(col("text"))), "\\s+"),
            t => t.isInCollection(stop))).cast("long").as("score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
        .localCheckpoint(true) // totals + top slice reuse it
      val tot = scored.agg(sum(col("pos")).as("p"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc("score"), col("doc_id"))
      scored.orderBy(desc("score"), col("doc_id")).limit(k)
        .withColumn("i", row_number().over(w))
        .agg(sum(col("pos")).as("hits"),
          sum(col("pos") * element_at(typedLit(wts), col("i")))
            .as("dcg_x"))
        .crossJoin(broadcast(tot))
        .select(lit(k.toLong).as("k"), col("hits"), col("dcg_x"),
          // zero-positive guard: element_at(lit, 0) throws in Spark
          // ("SQL array indices start at 1") while the twin's pf join
          // just yields NULLs — clamp the index and null out idcg (and
          // via NULL-propagating div, ndcg) when p = 0
          when(col("p") > 0, element_at(typedLit(prefix),
            greatest(least(col("p"), lit(k.toLong)), lit(1L))
              .cast("int"))).as("idcg_x"))
        .withColumn("ndcg_x1e6", expr("dcg_x * 1000000 div idcg_x"))
    },
    Some {
      val k = 50
      val wts = (1 to k).map(i =>
        64000000L / graft.operators.NaiveBayes.lg64Long(i + 1L))
      val prefix = wts.scanLeft(0L)(_ + _).tail
      val stop = graft.functions.TextFeatures.enStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH scored AS (
        SELECT doc_id,
          CAST(len(list_filter(
            string_split_regex(lower(trim(text)), '\\s+'),
            t -> t IN ($stop))) AS BIGINT) AS score,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents),
      tot AS (SELECT SUM(pos) AS p FROM scored),
      top AS (SELECT pos,
          ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS i
        FROM scored ORDER BY score DESC, doc_id LIMIT $k),
      wt(i, w) AS (VALUES ${wts.zipWithIndex
        .map { case (v, i) => s"(${i + 1}, ${v})" }.mkString(", ")}),
      pf(j, s) AS (VALUES ${prefix.zipWithIndex
        .map { case (v, i) => s"(${i + 1}, ${v})" }.mkString(", ")})
      SELECT CAST($k AS BIGINT) AS k,
        CAST(SUM(top.pos) AS BIGINT) AS hits,
        CAST(SUM(top.pos * wt.w) AS BIGINT) AS dcg_x,
        CAST(MAX(pf.s) AS BIGINT) AS idcg_x,
        CAST(SUM(top.pos * wt.w) * 1000000 // MAX(pf.s) AS BIGINT)
          AS ndcg_x1e6
      FROM top JOIN wt USING (i)
        CROSS JOIN tot JOIN pf ON pf.j = least(tot.p, $k)"""
    },
    notes = "position discounts as one Scala-derived literal table in " +
      "both engines; TakeOrdered slice, 1-row totals")

  /** LIFT AT K — the targeting-efficiency curve point: precision among
    * the top-k docs by score (desc, doc_id tie-break) vs the base
    * positive rate, in integer per-mille; lift_x1000 = prec·1000 div
    * base = (hits·n·1000) div (k·P). The "how much better than random
    * is acting on the top decile" number. One corpus agg for totals, a
    * TakeOrderedAndProject for the top slice — no global sort. */
  val qLiftAtK = GQuery("q_lift_at_k",
    (s, d) => {
      val k = 50
      val stop = graft.functions.TextFeatures.enStopwords
      val scored = Tables.documents(s, d)
        .select(col("doc_id"),
          size(filter(split(lower(trim(col("text"))), "\\s+"),
            t => t.isInCollection(stop))).cast("long").as("score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
        .localCheckpoint(true) // totals + top slice reuse it
      val tot = scored.agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
      scored.orderBy(desc("score"), col("doc_id")).limit(k)
        .agg(sum(col("pos")).as("hits"))
        .crossJoin(broadcast(tot))
        .select(lit(k.toLong).as("k"), col("hits"), col("n"), col("p"),
          expr(s"hits * 1000 div $k").as("prec_x1000"),
          expr(s"(hits * n * 1000) div (${k}L * p)").as("lift_x1000"))
    },
    Some {
      val stop = graft.functions.TextFeatures.enStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH scored AS (
        SELECT doc_id,
          CAST(len(list_filter(
            string_split_regex(lower(trim(text)), '\\s+'),
            t -> t IN ($stop))) AS BIGINT) AS score,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents),
      tot AS (SELECT COUNT(*) AS n, SUM(pos) AS p FROM scored),
      top AS (SELECT pos FROM scored
        ORDER BY score DESC, doc_id LIMIT 50)
      SELECT CAST(50 AS BIGINT) AS k,
        CAST(SUM(top.pos) AS BIGINT) AS hits,
        CAST(MAX(tot.n) AS BIGINT) AS n, CAST(MAX(tot.p) AS BIGINT) AS p,
        CAST(SUM(top.pos) * 1000 // 50 AS BIGINT) AS prec_x1000,
        CAST((SUM(top.pos) * MAX(tot.n) * 1000) // (50 * MAX(tot.p))
          AS BIGINT) AS lift_x1000
      FROM top CROSS JOIN tot"""
    },
    notes = "top-k targeting lift in per-mille; TakeOrdered slice + " +
      "1-row totals, never a global sort")

  /** INFORMATION VALUE / WEIGHT OF EVIDENCE per score decile — the
    * credit-scoring-lineage predictiveness audit for the same
    * score/label pair as [[qAuc]]: WoE_d = ln(g_d/G ÷ b_d/B) carried in
    * lg64 fixed point as lg64((g_d+1)·B⁺) − lg64((b_d+1)·G⁺) (add-one
    * smoothing, the [[graft.streaming.Streams.psiDriftStream]]
    * discipline) and the IV summand as the PSI-form product
    * ((g_d+1)·B⁺ − (b_d+1)·G⁺)·woe64 — non-negative by construction,
    * all int64. Deciles are positional NTILE (the [[qCalibration]]
    * axis). Output per decile: (decile, n_good, n_bad, woe_x64,
    * iv_contrib). */
  val qIvWoe = GQuery("q_iv_woe",
    (s, d) => {
      import graft.operators.NaiveBayes.lg64
      val stop = graft.functions.TextFeatures.enStopwords
      val scored = Tables.documents(s, d)
        .select(col("doc_id"),
          size(filter(split(lower(trim(col("text"))), "\\s+"),
            t => t.isInCollection(stop))).cast("long").as("score"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score"), col("doc_id"))
      val dec = scored.withColumn("decile", ntile(10).over(w).cast("long"))
        .groupBy(col("decile"))
        .agg(sum(col("pos")).as("g"),
          sum(lit(1L) - col("pos")).as("b"))
      val tot = dec.agg((sum(col("g")) + lit(10L)).as("gp"),
        (sum(col("b")) + lit(10L)).as("bp"))
      dec.crossJoin(broadcast(tot))
        .withColumn("woe_x64",
          lg64((col("g") + 1L) * col("bp")) -
            lg64((col("b") + 1L) * col("gp")))
        .select(col("decile"), col("g").as("n_good"), col("b").as("n_bad"),
          col("woe_x64"),
          (((col("g") + 1L) * col("bp") - (col("b") + 1L) * col("gp"))
            * col("woe_x64")).as("iv_contrib"))
        .orderBy(col("decile"))
    },
    Some {
      val stop = graft.functions.TextFeatures.enStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH scored AS (
        SELECT doc_id,
          CAST(len(list_filter(
            string_split_regex(lower(trim(text)), '\\s+'),
            t -> t IN ($stop))) AS BIGINT) AS score,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents),
      dec AS (SELECT decile, SUM(pos) AS g, SUM(1 - pos) AS b FROM
          (SELECT pos, NTILE(10) OVER (ORDER BY score, doc_id) AS decile
           FROM scored)
        GROUP BY 1),
      tot AS (SELECT SUM(g) + 10 AS gp, SUM(b) + 10 AS bp FROM dec),
      base AS (SELECT dec.decile, dec.g, dec.b,
          (dec.g + 1) * tot.bp AS pa, (dec.b + 1) * tot.gp AS pb
        FROM dec CROSS JOIN tot),
      dpa AS (SELECT DISTINCT pa AS x FROM base),
      """ + graft.operators.NaiveBayes.sqlLg64Chain(
        "dpa", "x", Seq("x"), "la", "lga") + """,
      dpb AS (SELECT DISTINCT pb AS x FROM base),
      """ + graft.operators.NaiveBayes.sqlLg64Chain(
        "dpb", "x", Seq("x"), "lb", "lgb") + """
      SELECT base.decile, CAST(base.g AS BIGINT) AS n_good,
        CAST(base.b AS BIGINT) AS n_bad,
        CAST(la.lga - lb.lgb AS BIGINT) AS woe_x64,
        CAST((base.pa - base.pb) * (la.lga - lb.lgb) AS BIGINT)
          AS iv_contrib
      FROM base JOIN la ON base.pa = la.x JOIN lb ON base.pb = lb.x
      ORDER BY base.decile"""
    },
    notes = "WoE/IV in lg64 fixed point with add-one smoothing; the " +
      "PSI-form product keeps every summand non-negative")

  /** DECISION-STUMP LEARNING (best Gini split) on the q_auc score/label
    * pair: the exact threshold a one-rule quality filter would pick,
    * found on the BOUNDED distinct-score table — per candidate
    * threshold t (split: score ≤ t), weighted Gini impurity in exact
    * fixed point:
    *   g_x1e6 = ((nL²−posL²−negL²)·nR + (nR²−posR²−negR²)·nL)·10⁶
    *             div (nL·nR·n)
    * (the 1/nL,1/nR denominators cleared through one common fraction —
    * pure int64 at any tested SF). Cumulative pos/neg via one window
    * over the distinct scores; argmin by (g, t). Output 1 row:
    * (threshold, n_left, n_right, gini_x1e6). */
  val qBestSplit = GQuery("q_best_split",
    (s, d) => {
      val stop = graft.functions.TextFeatures.enStopwords
      val g = Tables.documents(s, d)
        .select(size(filter(split(lower(trim(col("text"))), "\\s+"),
          t => t.isInCollection(stop))).cast("long").as("t"),
          when(col("lang") === "en", 1L).otherwise(0L).as("p"))
        .groupBy(col("t"))
        .agg(sum(col("p")).as("pc"), sum(lit(1L) - col("p")).as("nc"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val tot = g.agg(sum(col("pc")).as("tp"), sum(col("nc")).as("tn"))
      g.withColumn("cp", sum(col("pc")).over(w))
        .withColumn("cn", sum(col("nc")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("nl", col("cp") + col("cn"))
        .withColumn("nr", col("tp") + col("tn") - col("nl"))
        .filter(col("nr") > 0) // the top threshold splits nothing off
        .withColumn("rp", col("tp") - col("cp"))
        .withColumn("rn", col("tn") - col("cn"))
        .withColumn("g_x1e6", expr(
          "((nl * nl - cp * cp - cn * cn) * nr" +
            " + (nr * nr - rp * rp - rn * rn) * nl) * 1000000" +
            " div (nl * nr * (nl + nr))"))
        .orderBy(col("g_x1e6"), col("t"))
        .limit(1)
        .select(col("t").as("threshold"), col("nl").as("n_left"),
          col("nr").as("n_right"), col("g_x1e6").as("gini_x1e6"))
    },
    Some {
      val stop = graft.functions.TextFeatures.enStopwords
        .map(w => s"'$w'").mkString(", ")
      s"""WITH per AS (
        SELECT CAST(len(list_filter(
            string_split_regex(lower(trim(text)), '\\s+'),
            t -> t IN ($stop))) AS BIGINT) AS t,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
        FROM documents),
      g AS (SELECT t, SUM(p) AS pc, SUM(1 - p) AS nc FROM per
        GROUP BY 1),
      tot AS (SELECT SUM(pc) AS tp, SUM(nc) AS tn FROM g),
      c AS (SELECT t,
          SUM(pc) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS cp,
          SUM(nc) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS cn
        FROM g),
      sc AS (SELECT c.t, c.cp + c.cn AS nl,
          tot.tp + tot.tn - c.cp - c.cn AS nr,
          tot.tp - c.cp AS rp, tot.tn - c.cn AS rn
        FROM c, tot),
      scored AS (SELECT t, nl, nr,
          ((nl * nl - cp2 - cn2) * nr + (nr * nr - rp * rp - rn * rn)
            * nl) * 1000000 // (nl * nr * (nl + nr)) AS g_x1e6
        FROM (SELECT sc.t, sc.nl, sc.nr, sc.rp, sc.rn,
            c.cp * c.cp AS cp2, c.cn * c.cn AS cn2
          FROM sc JOIN c USING (t))
        WHERE nr > 0)
      SELECT t AS threshold, CAST(nl AS BIGINT) AS n_left,
        CAST(nr AS BIGINT) AS n_right,
        CAST(g_x1e6 AS BIGINT) AS gini_x1e6
      FROM scored ORDER BY g_x1e6, t LIMIT 1"""
    },
    notes = "exact weighted-Gini stump on the bounded distinct-score " +
      "table; denominators cleared to one integer fraction")

  /** HEAPS'-LAW VOCABULARY GROWTH: cumulative (tokens seen, distinct
    * tokens seen) at every 50th doc_id — the sublinearity check that
    * tells a curation run whether a corpus keeps contributing new
    * vocabulary or has gone repetitive (flat curve ⇒ diminishing
    * returns; also the drift smell when a refresh bends it). Exact and
    * order-canonical (doc_id order). NO global window: per-doc counts
    * and token first-occurrences each join the tiny broadcast
    * checkpoint list with a ≤ predicate (bounded |checkpoints|·|rows|
    * fan-out — the intended BNLJ shape, whitelisted), then aggregate
    * per checkpoint. Output: (cp, n_docs, cum_tokens, cum_vocab). */
  val qHeapsLaw = GQuery("q_heaps_law",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(filter(
          split(lower(trim(col("text"))), "\\s+"),
          t => length(t) > 0)).as("token"))
      val perDoc = toks.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("nt"))
        .localCheckpoint(true) // checkpoint list + token-mass agg reuse it
      val firsts = toks.groupBy(col("token"))
        .agg(min(col("doc_id")).as("fd"))
      val cps = perDoc.select(col("doc_id").as("cp"))
        .filter(col("cp") % 50 === 0)
      val tokMass = perDoc.join(broadcast(cps), col("doc_id") <= col("cp"))
        .groupBy(col("cp"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("cum_tokens"))
      val vocab = firsts.join(broadcast(cps), col("fd") <= col("cp"))
        .groupBy(col("cp")).agg(count(lit(1)).as("cum_vocab"))
      tokMass.join(vocab, Seq("cp")).orderBy(col("cp"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, unnest(list_filter(
          string_split_regex(lower(trim(text)), '\s+'),
          t -> len(t) > 0)) AS token
        FROM documents),
      per_doc AS (SELECT doc_id, COUNT(*) AS nt FROM toks GROUP BY 1),
      firsts AS (SELECT token, MIN(doc_id) AS fd FROM toks GROUP BY 1),
      cps AS (SELECT doc_id AS cp FROM per_doc WHERE doc_id % 50 = 0),
      tok_mass AS (SELECT cps.cp, COUNT(*) AS n_docs,
          SUM(per_doc.nt) AS cum_tokens
        FROM per_doc JOIN cps ON per_doc.doc_id <= cps.cp GROUP BY 1),
      vocab AS (SELECT cps.cp, COUNT(*) AS cum_vocab
        FROM firsts JOIN cps ON firsts.fd <= cps.cp GROUP BY 1)
      SELECT t.cp, CAST(t.n_docs AS BIGINT) AS n_docs,
        CAST(t.cum_tokens AS BIGINT) AS cum_tokens,
        CAST(v.cum_vocab AS BIGINT) AS cum_vocab
      FROM tok_mass t JOIN vocab v USING (cp) ORDER BY t.cp"""),
    notes = "vocabulary-growth curve; broadcast checkpoint inequality " +
      "joins, no global window")

  /** RAKE KEYPHRASES ([[graft.operators.Salience.rakePhrases]]):
    * corpus-wide top-50 multi-word keyphrases by the degree/freq RAKE
    * score in integer per-mille — the human-readable "what is this
    * corpus about" view a curation run puts next to its cluster terms. */
  val qRakePhrases = GQuery("q_rake_phrases",
    (s, d) => graft.operators.Salience.rakePhrases(
      Tables.documents(s, d).select(col("doc_id"), col("text")),
      "doc_id", "text",
      graft.functions.TextFeatures.enStopwords, maxPhraseLen = 4, k = 50),
    Some(graft.operators.Salience.sqlRake(
      graft.functions.TextFeatures.enStopwords, maxPhraseLen = 4, k = 50)),
    notes = "stopword-run phrase segmentation as window arithmetic; " +
      "integer RAKE scores, vocab-bounded stats broadcast")

  /** FRONT-CODING (incremental/prefix encoding) yield per source — the
    * dictionary-layout diagnostic: a sorted vocabulary stores each term
    * as (shared-prefix length, suffix), so the saving is exactly
    * Σ lcp(term, predecessor). High yield ⇒ morphologically clustered
    * vocab (worth delta-encoding the term dictionary / posting keys at
    * the storage layer); computed EXACTLY — lcp as the count of
    * matching prefixes over 1..min-length (prefix equality is monotone,
    * so the count IS the lcp), a codegen'd lambda in Spark mirrored by
    * DuckDB list ops. Window + agg run over the bounded vocab table
    * only. Output: (source, n_vocab, raw_bytes, saved_bytes,
    * savings_x1000). */
  val qFrontCoding = GQuery("q_front_coding",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("token"))
      Tables.documents(s, d)
        .select(col("source"), explode(filter(
          split(lower(trim(col("text"))), "\\s+"),
          t => length(t) > 0)).as("token"))
        .distinct()
        .withColumn("prev", lag(col("token"), 1).over(w))
        .withColumn("lcp", when(col("prev").isNull, lit(0))
          .otherwise(expr(
            "size(filter(sequence(1, least(length(token), length(prev)))," +
              " i -> substring(token, 1, i) = substring(prev, 1, i)))")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_vocab"),
          sum(length(col("token"))).cast("long").as("raw_bytes"),
          sum(col("lcp")).cast("long").as("saved_bytes"))
        .withColumn("savings_x1000",
          expr("saved_bytes * 1000 div raw_bytes"))
        .orderBy(col("source"))
    },
    Some("""WITH vocab AS (
        SELECT DISTINCT source, unnest(list_filter(
          string_split_regex(lower(trim(text)), '\s+'),
          t -> len(t) > 0)) AS token
        FROM documents),
      lagged AS (SELECT source, token,
          LAG(token) OVER (PARTITION BY source ORDER BY token) AS prev
        FROM vocab),
      scored AS (SELECT source, token,
          CASE WHEN prev IS NULL THEN 0
            ELSE len(list_filter(range(1,
              least(len(token), len(prev)) + 1),
              i -> substr(token, 1, i) = substr(prev, 1, i)))
          END AS lcp
        FROM lagged)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_vocab,
        CAST(SUM(len(token)) AS BIGINT) AS raw_bytes,
        CAST(SUM(lcp) AS BIGINT) AS saved_bytes,
        CAST(SUM(lcp) * 1000 // SUM(len(token)) AS BIGINT)
          AS savings_x1000
      FROM scored GROUP BY 1 ORDER BY source"""),
    notes = "exact Σ lcp over the sorted per-source vocab; monotone " +
      "prefix-equality count as the lcp")

  /** SPARSE TF-IDF COSINE pairs ([[graft.operators.Index
    * .sparseCosineTopK]]): top-50 lexically-similar doc pairs through
    * the inverted index — the token-space complement of
    * q_embedding_neardup / q_semdedup (catches near-dups whose
    * embeddings drifted and vice versa). df ≤ max(50, N/10) caps the per-token
    * fan-out (SSJ pruning); weights in lg64 fixed point; the cosine is
    * 3 mirrored IEEE ops on exact integers, so the double itself
    * hash-matches. */
  val qSparseCosine = GQuery("q_sparse_cosine",
    (s, d) => graft.operators.Index.sparseCosineTopK(
      Tables.documents(s, d).select(col("doc_id"), col("text")),
      "doc_id", "text", maxDf = 50L, k = 50),
    Some("""WITH tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM (
          SELECT doc_id, unnest(list_filter(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> len(t) > 0)) AS token
          FROM documents)
        GROUP BY 1, 2),
      dfc AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      ddf AS (SELECT DISTINCT df FROM dfc, nd
        WHERE df <= greatest(50, n_docs // 10)),
      """ + graft.operators.NaiveBayes.sqlLg64Chain(
        "ddf", "df", Seq("df"), "ldf", "lgdf") + """,
      """ + graft.operators.NaiveBayes.sqlLg64Chain(
        "nd", "n_docs", Seq("n_docs"), "lnd", "lgnd") + """,
      idf AS (SELECT dfc.token, lnd.lgnd - ldf.lgdf AS idf64
        FROM dfc JOIN ldf ON dfc.df = ldf.df, lnd
        WHERE dfc.df <= greatest(50, lnd.n_docs // 10)
          AND lnd.lgnd - ldf.lgdf > 0),
      kept AS (SELECT tf.doc_id, tf.token, tf.tf * idf.idf64 AS w
        FROM tf JOIN idf USING (token)),
      norms AS (SELECT doc_id, SUM(w * w) AS n2 FROM kept GROUP BY 1),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          COUNT(*) AS n_shared, SUM(a.w * b.w) AS dot
        FROM kept a JOIN kept b
          ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT p.id_a, p.id_b, CAST(p.n_shared AS BIGINT) AS n_shared,
        CAST(p.dot AS BIGINT) AS dot,
        CAST(p.dot AS DOUBLE)
          / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cos
      FROM pairs p JOIN norms na ON p.id_a = na.doc_id
        JOIN norms nb ON p.id_b = nb.doc_id
      ORDER BY cos DESC, id_a, id_b LIMIT 50"""),
    notes = "inverted-index SSJ with df-cap pruning; lg64 weights, " +
      "mirrored-IEEE cosine")

  /** VOCABULARY GINI per source — token-frequency concentration (a
    * high-Gini source is dominated by few tokens: boilerplate or
    * template smell; the corpus-level complement of [[qTokenEntropy]]'s
    * per-doc view). Exact integer Gini over the frequency-ascending
    * vocabulary: g_x1000 = ((2·Σ i·x_i − (n+1)·Σx)·1000) div (n·Σx),
    * where i ranks by (cnt, token) — ties permute EQUAL values only,
    * so the sum (and hence the gate) is order-independent, and the
    * numerator is ≥ 0 by the Chebyshev sum inequality. Plan: one
    * corpus-token shuffle to the (source, token) count table, then a
    * window + agg over the BOUNDED vocabulary — the corpus never sorts. */
  val qVocabGini = GQuery("q_vocab_gini",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("cnt"), col("token"))
      Tables.documents(s, d)
        .select(col("source"), explode(filter(
          split(lower(trim(col("text"))), "\\s+"),
          t => length(t) > 0)).as("token"))
        .groupBy(col("source"), col("token"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_vocab"), sum(col("cnt")).as("tot_tokens"),
          sum(col("i") * col("cnt")).as("s1"))
        .withColumn("g_x1000", expr(
          "((2 * s1 - (n_vocab + 1) * tot_tokens) * 1000) div " +
            "(n_vocab * tot_tokens)"))
        .select(col("source"), col("n_vocab"), col("tot_tokens"),
          col("g_x1000"))
        .orderBy(col("source"))
    },
    Some("""WITH toks AS (
        SELECT source, unnest(list_filter(
          string_split_regex(lower(trim(text)), '\s+'),
          t -> len(t) > 0)) AS token
        FROM documents),
      vocab AS (SELECT source, token, COUNT(*) AS cnt FROM toks
        GROUP BY 1, 2),
      rk AS (SELECT source, cnt,
          ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY cnt, token) AS i
        FROM vocab),
      t AS (SELECT source, COUNT(*) AS n_vocab, SUM(cnt) AS tot_tokens,
          SUM(i * cnt) AS s1
        FROM rk GROUP BY 1)
      SELECT source, CAST(n_vocab AS BIGINT) AS n_vocab,
        CAST(tot_tokens AS BIGINT) AS tot_tokens,
        CAST(((2 * s1 - (n_vocab + 1) * tot_tokens) * 1000)
          // (n_vocab * tot_tokens) AS BIGINT) AS g_x1000
      FROM t ORDER BY source"""),
    notes = "exact integer Gini over the bounded vocab table; " +
      "tie-rank permutes equal values only, order-independent")

  /** EXACT EMBEDDING COVARIANCE (whitening / PCA prep): the upper
    * triangle of the 64×64 Gram + covariance-numerator matrices over
    * the embedding corpus, deterministic cross-engine:
    *
    *  - per-vector products x_i·x_j are float×float in DOUBLE — exact
    *    (24-bit mantissas, product ≤ 48 bits), then cast to
    *    DECIMAL(28,18) (the [[Ann.dotExactDec]] convention) so the
    *    corpus SUM is order-independent;
    *  - sums are floored to fixed point (Gram at 1e-12 units via
    *    floor(Σ·10¹²), per-dim sums at 1e-6), and the centered
    *    numerator n·ΣXᵢXⱼ − ΣXᵢ·ΣXⱼ is DECIMAL(38,0)/HUGEINT integer
    *    arithmetic in matched 1e-12 units, surfaced as double (exact
    *    integers; IEEE rounding is the same function both engines).
    *
    * Plan: the pair stream is generated IN-ARRAY per vector (nested
    * transform over the upper triangle — 2080 structs/vector, no
    * self-join) and map-side combines into 2080 groups: ONE shuffle of
    * O(dim²) rows regardless of corpus size — the covariance shape
    * that survives 100 TB. Dim sums ride the same scan; a 1-row count
    * broadcasts on. */
  /** Upper-triangle (i, j, g12, covnum) over the embedding corpus —
    * covnum = n·Gram − Sᵢ·Sⱼ in DECIMAL(38,0), 1e-12 units. Shared by
    * [[qEmbedCov]] and [[qPowerIter]]. */
  private def embedCovNum(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val dim = 64
    // ONE tight-loop pass over the corpus (graft.functions.GramAgg):
    // per-partition exact BigInt partials, one ~60 KB merge — replaces
    // the explode-2080-structs-per-vector formulation whose interpreted
    // nested lambda cost ~5 s at sf0.1 (GramAgg's scaladoc pins the
    // bit-identical arithmetic contract; the oracle gates prove it)
    val one = Tables.embeddings(s, d).select(col("embedding"))
      .as[Seq[Float]]
      .select(new graft.functions.GramAgg(dim).toColumn)
      .select(col("n"), col("g12").as("gs"), col("s6").as("ss"))
      .localCheckpoint(true) // corpus touched once; reused per consumer
    one.select(col("n"), col("gs"), col("ss"), explode(expr(
        s"""flatten(transform(sequence(0, ${dim - 1}), i ->
            transform(sequence(i, ${dim - 1}), j ->
              struct(i, j))))""")).as("p"))
      .select(col("n"), col("gs"), col("ss"),
        col("p.i").cast("long").as("i"), col("p.j").cast("long").as("j"))
      // row-major upper-triangle index: Σ_{k<i}(dim−k) + (j−i)
      .withColumn("g12", expr(
        s"gs[cast(i * $dim - (i * (i - 1)) div 2 + (j - i) as int)]"))
      .withColumn("si6", expr("ss[cast(i as int)]"))
      .withColumn("sj6", expr("ss[cast(j as int)]"))
      .withColumn("covnum", col("g12").cast("decimal(38,0)") * col("n")
        - col("si6").cast("decimal(38,0)") * col("sj6"))
      .select(col("i"), col("j"), col("g12"), col("covnum"))
  }

  /** DuckDB CTE chain producing `cov(i, j, g12, covnum)` (upper
    * triangle, covnum HUGEINT) — the twin of [[embedCovNum]]. */
  private val EmbedCovSql: String =
    """px AS (
        SELECT i, j,
          CAST(CAST(embedding[i + 1] AS DOUBLE)
            * CAST(embedding[j + 1] AS DOUBLE) AS DECIMAL(28,18)) AS p
        FROM embeddings, range(0, 64) t1(i), range(0, 64) t2(j)
        WHERE j >= i),
      prs AS (
        SELECT i, j,
          CAST(floor(SUM(p) * CAST(1000000000000 AS HUGEINT)) AS BIGINT)
            AS g12
        FROM px GROUP BY 1, 2),
      dx AS (
        SELECT i, CAST(CAST(embedding[i + 1] AS DOUBLE)
          AS DECIMAL(28,18)) AS x
        FROM embeddings, range(0, 64) t1(i)),
      dms AS (
        SELECT i, CAST(floor(SUM(x) * 1000000) AS BIGINT) AS s6
        FROM dx GROUP BY 1),
      nn AS (SELECT COUNT(*) AS n FROM embeddings),
      cov AS (
        SELECT p.i, p.j, p.g12,
          CAST(p.g12 AS HUGEINT) * nn.n
            - CAST(da.s6 AS HUGEINT) * db.s6 AS covnum
        FROM prs p JOIN dms da ON p.i = da.i
          JOIN dms db ON p.j = db.i
          CROSS JOIN nn)"""

  val qEmbedCov = GQuery("q_embed_cov",
    (s, d) => embedCovNum(s, d)
      .withColumn("cov12", col("covnum").cast("double"))
      .select(col("i"), col("j"), col("g12"), col("cov12"))
      .orderBy(col("i"), col("j")),
    Some(s"""WITH $EmbedCovSql
      SELECT i, j, g12, CAST(covnum AS DOUBLE) AS cov12
      FROM cov ORDER BY i, j"""),
    notes = "in-array upper-triangle pair stream, one O(dim^2) " +
      "shuffle; dotExactDec decimal sums floored to matched fixed " +
      "point; centered numerator in decimal(38,0)/HUGEINT")

  /** POWER ITERATION on the exact covariance matrix — the distributed
    * PCA top component as an ALL-INTEGER trajectory. Each round applies
    * the mirrored covariance matrix to the current vector (exact
    * DECIMAL(38,0)/HUGEINT dot products over the bounded 64×64 table)
    * and renormalizes by the ∞-norm with sign-preserving truncating
    * division — `sign(x)·((|x|·10⁶) div max|x|)` is identical in both
    * engines (non-negative operands), so every round's 64-long vector
    * is bit-exact and the 5-round trajectory is the gate. ∞-norm
    * normalization (not L2) keeps the iteration sqrt-free; it changes
    * only the scaling, not the direction, so the iterate still
    * converges to the dominant eigenvector.
    *
    * Scale shape: the corpus is touched ONCE (inside [[embedCovNum]]);
    * rounds run on the 64×64 matrix with the current vector as 64 plan
    * literals, one bounded 64-row collect per round (the EM/kMeans
    * bounded-model posture). The twin unrolls rounds as CTE stages. */
  /** Shared power-iteration loop ([[qPowerIter]], [[qRayleigh]]):
    * returns the mirrored matrix, the per-round trajectory rows, and
    * the final ∞-normalized vector (1e6 units) after `rounds`. */
  private def powerIterRun(s: org.apache.spark.sql.SparkSession,
      d: String, rounds: Int): (org.apache.spark.sql.DataFrame,
        Seq[(Long, Long, Long)], Seq[Long]) = {
    import s.implicits._
    val upper = embedCovNum(s, d).select(col("i"), col("j"),
      col("covnum"))
    val mat = upper.union(upper.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("covnum")))
      .localCheckpoint(true)
    var v: Seq[Long] = Seq.fill(64)(1000000L)
    val traj = (1 to rounds).flatMap { r =>
      val vArr = s"array(${v.mkString("L,")}L)"
      val cv = mat
        .withColumn("cvterm",
          col("covnum") * expr(s"$vArr[cast(j as int)]"))
        .groupBy(col("i"))
        .agg(sum(col("cvterm")).as("cv"))
        .orderBy(col("i"))
        .as[(Long, java.math.BigDecimal)].collect()
      val cvB = cv.map { case (_, x) => BigInt(x.toBigInteger) }
      val mx = cvB.map(_.abs).max.max(BigInt(1))
      v = cvB.map { x =>
        val q = (x.abs * 1000000) / mx
        (if (x < 0) -q else q).toLong
      }
      v.zipWithIndex.map { case (x, i) => (r.toLong, i.toLong, x) }
    }
    (mat, traj, v)
  }

  /** DuckDB CTE prefix shared by the power-iteration twins: the
    * mirrored matrix + v0..v`rounds` stages. */
  private def powerIterSqlPrefix(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"WITH $EmbedCovSql,\n"
    sb ++= """mat AS (
          SELECT i, j, covnum FROM cov
          UNION ALL
          SELECT j AS i, i AS j, covnum FROM cov WHERE i <> j),
        v0 AS (SELECT i, CAST(1000000 AS HUGEINT) AS v
          FROM range(0, 64) t(i))"""
    (1 to rounds).foreach { r =>
      sb ++= s""",
          cv$r AS (SELECT m.i, SUM(m.covnum * v.v) AS cv
            FROM mat m JOIN v${r - 1} v ON m.j = v.i GROUP BY 1),
          mx$r AS (SELECT greatest(MAX(abs(cv)), 1) AS mx FROM cv$r),
          v$r AS (SELECT i,
            CASE WHEN cv < 0 THEN -((-cv * 1000000) // mx)
              ELSE (cv * 1000000) // mx END AS v
            FROM cv$r CROSS JOIN mx$r)"""
    }
    sb.toString
  }

  val qPowerIter = {
    val rounds = 5
    GQuery("q_power_iter",
      (s, d) => {
        import s.implicits._
        val (_, traj, _) = powerIterRun(s, d, rounds)
        traj.toDF("round", "i", "v_x1e6")
          .orderBy(col("round"), col("i"))
      },
      Some {
        powerIterSqlPrefix(rounds) ++ (1 to rounds).map { r =>
          s"""
          SELECT CAST($r AS BIGINT) AS round, CAST(i AS BIGINT) AS i,
            CAST(v AS BIGINT) AS v_x1e6 FROM v$r"""
        }.mkString("", " UNION ALL", "\nORDER BY round, i")
      },
      notes = "integer power iteration, infinity-norm sign-preserving " +
        "renormalization; 5-round 64-vector trajectory bit-exact vs " +
        "the unrolled-CTE twin; one corpus touch, bounded rounds")
  }

  /** RAYLEIGH QUOTIENT of the power-iteration output — the dominant
    * EIGENVALUE estimate λ̂ = vᵀCv / vᵀv completing the eigenpair:
    * vᵀCv as one exact decimal/HUGEINT aggregate over the mirrored
    * 64×64 matrix with the final vector's entries as plan literals,
    * vᵀv as a plan-time literal (the driver holds v — bounded-model
    * posture), and the quotient as a sign-split truncating division
    * (both operands handled non-negative, so Spark `div` ≡ DuckDB
    * `//`). Output: 1 row (vtv, vtcv_d, lambda_q12 — λ̂ in the
    * matrix's 1e-12·n² units). */
  val qRayleigh = {
    val rounds = 5
    GQuery("q_rayleigh",
      (s, d) => {
        val (mat, _, v) = powerIterRun(s, d, rounds)
        val vArr = s"array(${v.mkString("L,")}L)"
        val vtv = v.map(x => x * x).sum
        mat
          .withColumn("t", col("covnum")
            * expr(s"$vArr[cast(i as int)]")
            * expr(s"$vArr[cast(j as int)]"))
          .agg(sum(col("t")).as("vtcv"))
          .select(lit(vtv).as("vtv"),
            col("vtcv").cast("double").as("vtcv_d"),
            expr(s"""cast(case when vtcv < 0
              then -((-vtcv) div ${vtv}L)
              else vtcv div ${vtv}L end as bigint)""").as("lambda_q12"))
      },
      Some {
        powerIterSqlPrefix(rounds) ++ s""",
          ray AS (SELECT SUM(m.covnum * a.v * b.v) AS vtcv
            FROM mat m JOIN v$rounds a ON a.i = m.i
              JOIN v$rounds b ON b.i = m.j),
          vt AS (SELECT SUM(v * v) AS vtv FROM v$rounds)
          SELECT CAST(vt.vtv AS BIGINT) AS vtv,
            CAST(ray.vtcv AS DOUBLE) AS vtcv_d,
            CAST(CASE WHEN ray.vtcv < 0
              THEN -((-ray.vtcv) // vt.vtv)
              ELSE ray.vtcv // vt.vtv END AS BIGINT) AS lambda_q12
          FROM ray CROSS JOIN vt"""
      },
      notes = "dominant-eigenvalue estimate; exact quadratic form over " +
        "the bounded matrix, sign-split truncating division")
  }

  // ===================================================================
  // RICH-VOCABULARY LSH gates (round-11 verdict ask #4). The driver's
  // documents corpus is a 31-word salad with background char-5-gram
  // Jaccard ≈ 0.17 — adversarial for every LSH family (SCALE.md proved
  // the measured superlinearity is candidate volume from that
  // background, with a rich-vocab control at 1.2–1.6× per 10×). These
  // gates make the realistic-background behavior a PERMANENT regression
  // guard: a ~3k-type corpus derived IN-QUERY from doc_id by integer
  // arithmetic both engines replay exactly (no committed data, scales
  // with the table — at GenScale m10 the same query IS the 10× rich
  // corpus). Construction: doc 10k+1 rewrites doc 10k's word sequence
  // with 1/32 of positions perturbed (planted pairs: char-5 J ≈ 0.88,
  // word-3 J ≈ 0.83, word-4 J ≈ 0.79 — all far from the 0.5 gates, so
  // LSH recall margins are astronomical); everyone else draws from a
  // 2971-word vocab with a QUADRATIC position term — alignment of two
  // groups' sequences requires 14d ≡ 0 (mod 2971), i.e. never, so no
  // accidental cross-group near-dups, only realistic low-j background.
  // TWO anti-wrap defenses, both found by the sf0.1 oracle run (5000
  // docs) before pinning: (a) a SEPARABLE index f(g)+h(i) lets any
  // f-collision (groups g and g+2971: 131·Δg ≡ 0 mod 2971) align WHOLE
  // sequences — ~1800 unintended J≈0.5-0.72 pairs, one of which missed
  // the 16×4 banding — so the quadratic/linear coefficients are
  // g-dependent (7+g%13, 29+g%19): full-sequence alignment now needs
  // g ≡ g' mod lcm(13,19,2971) = 733,837 docs, beyond the m100 corpus;
  // (b) every third position draws a GROUP-UNIQUE word ('u<g>x<i%11>'),
  // Heaps-ish vocabulary growth that caps any residual alignment at
  // word-share 2/3. Measured at sf0.1 after the fix: EXACTLY the 500
  // planted pairs at J ≥ 0.845, background max J = 0.163, nothing in
  // [0.35, 0.5) — the gates sit in a similarity gap on both sides.
  // ===================================================================

  /** In-query rich corpus: (doc_id, text) both engines derive from
    * integer arithmetic on doc_id alone. */
  private def richDocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val doc = col("doc_id")
    val g = when(doc % 10 === 1, doc - 1).otherwise(doc)
    val n = lit(40L) + (g % 17L)
    val text = array_join(
      transform(sequence(lit(0L), n - 1L), i => {
        val pert = (doc % 10 === 1) && ((i * 13L + doc) % 32L === 0L)
        when(pert, concat(lit("z"), doc.cast("string"),
            lit("x"), i.cast("string")))
          .when(i % 3L === 0L, concat(lit("u"), g.cast("string"),
            lit("x"), (i % 11L).cast("string")))
          .otherwise(concat(lit("w"),
            ((g * 131L + (lit(7L) + g % 13L) * i * i +
              (lit(29L) + g % 19L) * i) % 2971L).cast("string")))
      }), " ")
    Tables.documents(s, d).select(doc, text.as("text"))
  }

  /** DuckDB twin of [[richDocs]] — `rich(doc_id, text)`. */
  private val RichDocsSql: String =
    """richg AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 1 THEN doc_id - 1 ELSE doc_id END AS g
        FROM documents),
      rich AS (
        SELECT doc_id,
          array_to_string(list_transform(range(0, 40 + g % 17), i ->
            CASE WHEN doc_id % 10 = 1 AND (i*13 + doc_id) % 32 = 0
              THEN 'z' || doc_id || 'x' || i
              WHEN i % 3 = 0 THEN 'u' || g || 'x' || (i % 11)
              ELSE 'w' || ((g * 131 + (7 + g % 13)*i*i
                + (29 + g % 19)*i) % 2971) END),
            ' ') AS text
        FROM richg)"""

  /** [[qMinhashPairs]] over the rich corpus — same operator, same
    * 16×4 banding, same τ=0.5; the brute-force twin re-derives the
    * corpus and pins recall 1 at realistic background similarity. */
  val qMinhashPairsRich = GQuery("q_minhash_pairs_rich",
    (s, d) => Dedup.minhashNearDupPairsKeyed(richDocs(s, d),
        "doc_id", "text", numHashes = 64, bands = 16, shingleSize = 5,
        minJaccard = 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b")),
    Some(s"""WITH $RichDocsSql,
      docs AS (
        SELECT doc_id,
          list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), i + 1, 5))) AS sh
        FROM rich),
      s AS (SELECT doc_id, unnest(sh) AS g FROM docs),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(sh) AS n FROM docs)
      SELECT id_a, id_b,
        CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) AS jaccard
      FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
      WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b"""),
    notes = "rich-vocab twin of q_minhash_pairs: LSH candidates on " +
      "realistic background j, brute-force oracle")

  /** [[qNearDupGroups]] over the rich corpus — clusters are the planted
    * (10k, 10k+1) pairs; the recursive twin re-derives and closes them. */
  val qNearDupGroupsRich = GQuery("q_neardup_groups_rich",
    (s, d) => {
      val pairs = Dedup.minhashNearDupPairsKeyed(richDocs(s, d),
        "doc_id", "text", numHashes = 64, bands = 16, shingleSize = 5,
        minJaccard = 0.5)
      val g = Dedup.nearDupGroups(pairs.select(col("id_a"), col("id_b")))
      val sizes = g.groupBy(col("label"))
        .agg(count(lit(1)).as("cluster_size"))
      g.join(sizes, Seq("label"))
        .select(col("id").as("doc_id"), col("label").as("canonical_id"),
          col("cluster_size"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE $RichDocsSql,
      docs AS (
        SELECT doc_id,
          list_distinct(list_transform(
            range(0, greatest(len(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) - 5, 0) + 1),
            i -> substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), i + 1, 5))) AS sh
        FROM rich),
      s AS (SELECT doc_id, unnest(sh) AS g FROM docs),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(sh) AS n FROM docs),
      pairs AS (
        SELECT id_a, id_b
        FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
        WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) >= 0.5),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      reach AS (
        SELECT id, id AS label FROM nodes
        UNION
        SELECT e.src AS id, r.label FROM edges e JOIN reach r ON e.dst = r.id),
      comp AS (SELECT id, MIN(label) AS label FROM reach GROUP BY id),
      sizes AS (SELECT label, COUNT(*) AS cluster_size FROM comp GROUP BY label)
      SELECT c.id AS doc_id, c.label AS canonical_id, z.cluster_size
      FROM comp c JOIN sizes z USING (label) ORDER BY doc_id"""),
    notes = "rich-vocab twin of q_neardup_groups")

  /** [[qNgramJaccard]] over the rich corpus. Banding widened to 32×2:
    * planted word-3-gram J ≈ 0.83 misses with prob (1−0.83²)^32 ≈ 4e-10,
    * and the rich background word-gram overlap is ~zero, so r=2's looser
    * admission costs nothing — the knob the word-salad corpus couldn't
    * afford. */
  val qNgramJaccardRich = GQuery("q_ngram_jaccard_rich",
    (s, d) => Dedup.ngramJaccardPairs(richDocs(s, d),
        "doc_id", "text", n = 3, minJaccard = 0.5,
        numHashes = 64, bands = 32)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b")),
    Some(s"""WITH $RichDocsSql,
      toks AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            t -> len(t) > 0) AS tk
        FROM rich),
      g AS (
        SELECT doc_id,
          CASE WHEN len(tk) >= 3
            THEN list_distinct(list_transform(range(0, len(tk) - 3 + 1),
              i -> array_to_string(tk[i + 1 : i + 3], ' ')))
            ELSE [array_to_string(tk, ' ')] END AS grams
        FROM toks),
      s AS (SELECT doc_id, unnest(grams) AS gr FROM g),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM s a JOIN s b ON a.gr = b.gr AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(grams) AS n FROM g)
      SELECT id_a, id_b,
        CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) AS jaccard
      FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
      WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE) >= 0.5
      ORDER BY id_a, id_b"""),
    notes = "rich-vocab twin of q_ngram_jaccard at 32x2 banding")

  /** [[qPrefixJoin]] over the rich corpus — prefix filtering is recall-1
    * by construction; what this pins is the COST structure it was built
    * for (rarest-first prefixes over a discriminative df distribution,
    * which the 31-word corpus never exercised). */
  val qPrefixJoinRich = GQuery("q_prefix_join_rich",
    (s, d) => Dedup.prefixJaccardPairs(richDocs(s, d),
        "doc_id", "text", n = 4, num = 1L, den = 2L)
      .orderBy(col("id_a"), col("id_b")),
    Some(s"""WITH $RichDocsSql,
      toks AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(lower(text)), '\\s+'),
            t -> len(t) > 0) AS tk
        FROM rich),
      g AS (
        SELECT doc_id,
          CASE WHEN len(tk) >= 4
            THEN list_distinct(list_transform(range(0, len(tk) - 4 + 1),
              i -> array_to_string(tk[i + 1 : i + 4], ' ')))
            ELSE [array_to_string(tk, ' ')] END AS grams
        FROM toks),
      s AS (SELECT doc_id, unnest(grams) AS gr FROM g),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS ninter
        FROM s a JOIN s b ON a.gr = b.gr AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      cnt AS (SELECT doc_id, len(grams) AS n FROM g)
      SELECT id_a, id_b,
        CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE)
          AS jaccard
      FROM inter JOIN cnt ca ON id_a = ca.doc_id
        JOIN cnt cb ON id_b = cb.doc_id
      WHERE CAST(ninter AS DOUBLE) / CAST(ca.n + cb.n - ninter AS DOUBLE)
        >= 0.5
      ORDER BY id_a, id_b"""),
    notes = "rich-vocab twin of q_prefix_join (discriminative df " +
      "distribution, the corpus shape prefix filtering is FOR)")

  val all: Seq[GQuery] = Seq(qDedupExact, qDedupFlags, qContainmentDedup,
    qEmbedCov, qPowerIter, qRayleigh,
    qTokenEntropy, qVocabGini, qSparseCosine, qRakePhrases, qHeapsLaw,
    qAuc, qCalibration, qIsotonic, qFrontCoding, qBestSplit, qIvWoe,
    qLiftAtK,
    qNdcg,
    qTokenCount,
    qTextQuality, qAdaptiveQuality, qRepetition, qPiiScrub, qPseudonymize,
    qLangId, qFingerprint,
    qKnnClassify,
    qMinhashPairs, qDupMatrix, qGramNovelty, qNearDupGroups,
    qDedupIncremental,
    qMinhashCross,
    qSimhashPairs, qExactSubstr, qNgramJaccard, qPrefixJoin, qSnmPairs,
    qMinhashPairsRich, qNearDupGroupsRich, qNgramJaccardRich,
    qPrefixJoinRich,
    qCosineTopK, qAnnQuantized,
    qPqEncode, qPqTopk, qEmbedCentroid,
    qEmbedNormalize, qEmbedQuantize, qCentroidOutliers, qClusterVariance,
    qAnnLsh, qAnnIvf,
    qAnnLshCand, qAnnIvfCand,
    qEmbeddingNearDup, qParaphraseMining, qMediaFeatures, qImageDecode,
    qAudioDecode, qAudioFrames, qVadSegments,
    qVideoDecode, qFrameSample, qImageResize,
    qBoilerplate, qParagraphDedup, qLineDedup, qDecontaminate,
    qSampleDet, qMixSample, qStratifiedSample, qTemperatureSample,
    qChunkSliding, qPackChunks, qTrainingExport,
    qCurationPipeline, qSplitDet, qShuffleDet, qTokenBudget, qTfidfTopk,
    qVocabTopk, qTokenIds, qPairCounts, qLmSurprisal, qKnSurprisal, qRouge,
    qKlSource, qHeldoutPpl,
    qBpeMerges, qBpeEncode,
    qWordpieceMerges, qWordpieceEncode, qWordpieceTokenize,
    qUnigramVocab, qUnigramEncode,
    qCompressRatio, qLengthHistogram,
    qInvertedIndex, qCollocations, qKeywordSearch, qBm25, qMrr, qRbo,
    qFeatureHash, qFimTransform, qSpanMask, qNtileBins,
    qClusterRep, qLeakageSafeSplit, qMixturePlan, qIpfRaking, qDomainCap,
    qHardNegatives,
    qMatryoshka, qReadability, qNbModel, qNbClassify, qCoreset,
    qCoresetBatched, qMmr,
    qContrastivePairs, qNegSampling, qKmeans, qDbscanGrid, qSilhouette,
    qSemDedup,
    qRrfFusion,
    qDsirSelect,
    qPerceptron, qImagePhash, qWeightedSample, qMarginMining,
    qClusterTerms, qTypoPairs, qAudioPhash)
}
