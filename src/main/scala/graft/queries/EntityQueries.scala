package graft.queries

import graft.Tables
import graft.functions.{Normalize, Similarity}
import graft.operators.EntityResolution
import org.apache.spark.sql.functions._

/** Entity-resolution queries (SURVEY.md §2.8) — the reference's signature
  * fuzzy team-name mapping cascade, re-bound to customer names.
  *
  * Test harness construction: the "API side" is `replace(c_name,'#',' ')`;
  * each customer contributes ONE candidate, perturbed by custkey%3 so every
  * deterministic strategy fires somewhere:
  *   %3=0 → identical              → exact_match (1.0)
  *   %3=1 → + ' FC' suffix         → normalized_matching (0.85)
  *   %3=2 → word order swapped     → word_based_matching (Jaccard 1.0 → 0.7)
  */
object EntityQueries {

  private def apiNames(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).filter(col("c_custkey") < 120)
      .select(regexp_replace(col("c_name"), "#", " ").as("api_name"),
        col("c_custkey"))

  private def candidates(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).filter(col("c_custkey") < 120)
      .select(
        when(col("c_custkey") % 3 === 0,
            regexp_replace(col("c_name"), "#", " "))
          .when(col("c_custkey") % 3 === 1,
            concat(regexp_replace(col("c_name"), "#", " "), lit(" FC")))
          .otherwise(concat(
            regexp_replace(col("c_name"), "^Customer#(\\d+)$", "$1"),
            lit(" Customer"))).as("cand"),
        col("c_custkey").as("cand_ord"))

  /** F-s1 — the 40-rule normalizer as a verifiable projection (the oracle
    * SQL is GENERATED from the same rule list — cannot drift). */
  val qNormalize = GQuery("q_normalize",
    (s, d) => Tables.customer(s, d)
      .select(col("c_custkey"),
        Normalize.normalizeName(
          concat(lit("  FC "), col("c_name"), lit(" Club & United  ")))
          .as("normalized"))
      .orderBy(col("c_custkey")),
    Some(s"""SELECT c_custkey,
      ${Normalize.sqlNormalizeName("concat('  FC ', c_name, ' Club & United  ')")} AS normalized
      FROM customer ORDER BY c_custkey"""))

  /** F6 — word-set Jaccard as a scored pair projection. */
  val qJaccardPairs = GQuery("q_jaccard_pairs",
    (s, d) => {
      val api = apiNames(s, d)
      val cand = candidates(s, d)
      api.crossJoin(broadcast(cand))
        .withColumn("jaccard", Normalize.jaccardWords(col("api_name"), col("cand")))
        .filter(col("jaccard") > 0.3)
        .select(col("c_custkey"), col("cand_ord"), col("jaccard"))
        .orderBy(col("c_custkey"), col("cand_ord"))
    },
    Some {
      val normApi = Normalize.sqlNormalizeName("api_name")
      val normCand = Normalize.sqlNormalizeName("cand")
      s"""WITH api AS (
        SELECT replace(c_name, '#', ' ') AS api_name, c_custkey
        FROM customer WHERE c_custkey < 120),
      cand AS (
        SELECT CASE
            WHEN c_custkey % 3 = 0 THEN replace(c_name, '#', ' ')
            WHEN c_custkey % 3 = 1 THEN concat(replace(c_name, '#', ' '), ' FC')
            ELSE concat(regexp_replace(c_name, '^Customer#(\\d+)$$', '\\1'), ' Customer')
          END AS cand, c_custkey AS cand_ord
        FROM customer WHERE c_custkey < 120),
      pairs AS (
        SELECT c_custkey, cand_ord,
          list_filter(list_distinct(string_split_regex($normApi, ' ')), w -> len(w) > 0) AS wa,
          list_filter(list_distinct(string_split_regex($normCand, ' ')), w -> len(w) > 0) AS wb
        FROM api, cand)
      SELECT c_custkey, cand_ord,
        CASE WHEN len(list_distinct(list_concat(wa, wb))) > 0
          THEN CAST(len(list_intersect(wa, wb)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(wa, wb))) AS DOUBLE)
          ELSE 0.0 END AS jaccard
      FROM pairs
      WHERE (CASE WHEN len(list_distinct(list_concat(wa, wb))) > 0
          THEN CAST(len(list_intersect(wa, wb)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(wa, wb))) AS DOUBLE)
          ELSE 0.0 END) > 0.3
      ORDER BY c_custkey, cand_ord"""
    })

  /** F1-F7 — the full cascade resolver (one-pass, SURVEY.md §2.8). The
    * harness guarantees a deterministic strategy fires for every name, so
    * the DuckDB twin needs no Ratcliff–Obershelp. */
  val qEntityResolution = GQuery("q_entity_resolution",
    (s, d) => EntityResolution.resolve(
        apiNames(s, d), "api_name",
        candidates(s, d), "cand", "cand_ord")
      .select(col("api_name"), col("matched_name"), col("confidence"),
        col("strategy_used"))
      .orderBy(col("api_name")),
    Some {
      val normApi = Normalize.sqlNormalizeName("api_name")
      val normCand = Normalize.sqlNormalizeName("cand")
      s"""WITH api AS (
        SELECT replace(c_name, '#', ' ') AS api_name, c_custkey
        FROM customer WHERE c_custkey < 120),
      cand AS (
        SELECT CASE
            WHEN c_custkey % 3 = 0 THEN replace(c_name, '#', ' ')
            WHEN c_custkey % 3 = 1 THEN concat(replace(c_name, '#', ' '), ' FC')
            ELSE concat(regexp_replace(c_name, '^Customer#(\\d+)$$', '\\1'), ' Customer')
          END AS cand, c_custkey AS cand_ord
        FROM customer WHERE c_custkey < 120),
      pairs AS (
        SELECT api_name, cand, cand_ord,
          CASE WHEN api_name = cand THEN 1.0 ELSE 0.0 END AS s_exact,
          CASE WHEN $normApi = $normCand THEN 0.85 ELSE 0.0 END AS s_norm,
          list_filter(list_distinct(string_split_regex($normApi, ' ')), w -> len(w) > 0) AS wa,
          list_filter(list_distinct(string_split_regex($normCand, ' ')), w -> len(w) > 0) AS wb
        FROM api, cand),
      scored AS (
        SELECT *, CASE WHEN len(list_distinct(list_concat(wa, wb))) > 0
            THEN CAST(len(list_intersect(wa, wb)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(wa, wb))) AS DOUBLE) * 0.7
            ELSE 0.0 END AS s_word_raw
        FROM pairs),
      scored2 AS (
        SELECT *, CASE WHEN s_word_raw > 0.3 THEN s_word_raw ELSE 0.0 END AS s_word
        FROM scored),
      agg AS (
        -- the harness guarantees a unique argmax candidate per strategy, so
        -- plain arg_max (tie-unspecified in general) is deterministic here
        SELECT api_name,
          MAX(s_exact) AS max_exact, arg_max(cand, s_exact) AS cand_exact,
          MAX(s_norm) AS max_norm, arg_max(cand, s_norm) AS cand_norm,
          MAX(s_word) AS max_word, arg_max(cand, s_word) AS cand_word
        FROM scored2 GROUP BY api_name)
      SELECT api_name,
        CASE WHEN max_exact >= 1.0 THEN cand_exact
             WHEN max_norm >= 0.85 THEN cand_norm
             WHEN max_word >= 0.7 THEN cand_word END AS matched_name,
        CASE WHEN max_exact >= 1.0 THEN max_exact
             WHEN max_norm >= 0.85 THEN max_norm
             WHEN max_word >= 0.7 THEN max_word END AS confidence,
        CASE WHEN max_exact >= 1.0 THEN 'exact_match'
             WHEN max_norm >= 0.85 THEN 'normalized_matching'
             WHEN max_word >= 0.7 THEN 'word_based_matching' END AS strategy_used
      FROM agg ORDER BY api_name"""
    })

  /** F7 — fuzzy similarity join via the custom Catalyst expression with the
    * length prefilter (the 100 TB guard). Rows-only: Ratcliff–Obershelp has
    * no DuckDB twin; bit-exactness is covered by ScalaTest golden cases. */
  val qFuzzyJoin = GQuery("q_fuzzy_join",
    (s, d) => {
      val api = apiNames(s, d)
        .select(col("api_name"), col("c_custkey"),
          Normalize.normalizeName(col("api_name")).as("na"))
      val cand = candidates(s, d)
        .select(col("cand"), col("cand_ord"),
          Normalize.normalizeName(col("cand")).as("nc"))
      api.crossJoin(broadcast(cand))
        .filter(Similarity.lengthPrefilter(col("na"), col("nc"), 0.6))
        .withColumn("sim", Similarity.roSimilarity(col("na"), col("nc")))
        .filter(col("sim") > 0.8)
        .select(col("c_custkey"), col("cand_ord"))
        .orderBy(col("c_custkey"), col("cand_ord"))
    },
    None, notes = "rows-only: Ratcliff-Obershelp; golden-tested in ScalaTest")

  /** Attempts log re-bound to events (strategy := event_type, success :=
    * value ≥ 100, confidence := value/200) — provenance doesn't matter for
    * the REPORT operators (F10); shapes and math do. */
  private def attempts(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d).select(
      col("user_id").cast("string").as("api_football_name"),
      col("event_type").as("strategy_used"),
      (col("value") >= 100).as("success"),
      (col("value") / 200).as("confidence"),
      col("ts").as("attempted_at"))

  /** F10 — per-strategy mapping report (enhanced_mapping.py:657-751). */
  val qStrategyReport = GQuery("q_strategy_report",
    (s, d) => graft.operators.MappingStore.strategyReport(
      attempts(s, d), java.sql.Timestamp.valueOf("2024-01-05 00:00:00")),
    Some("""SELECT event_type AS strategy_used, COUNT(*) AS attempts,
        CAST(SUM(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS successes,
        CAST(SUM(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS success_rate,
        CAST(SUM(CAST(CASE WHEN value >= 100 THEN value / 200 END
            AS DECIMAL(27,6))) AS DOUBLE)
          / CAST(SUM(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS DOUBLE)
          AS avg_confidence
      FROM events WHERE ts >= TIMESTAMP '2024-01-05'
      GROUP BY event_type
      ORDER BY successes DESC, strategy_used"""))

  /** F10 — top-20 failing names (curation worklist). */
  val qTopFailures = GQuery("q_top_failures",
    (s, d) => graft.operators.MappingStore.topFailures(
      attempts(s, d), java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), 20),
    Some("""SELECT CAST(user_id AS VARCHAR) AS api_football_name,
        COUNT(*) AS failures, MAX(value / 200) AS best_confidence
      FROM events WHERE ts >= TIMESTAMP '2024-01-05' AND NOT (value >= 100)
      GROUP BY user_id
      ORDER BY failures DESC, api_football_name LIMIT 20"""))

  val all: Seq[GQuery] = Seq(qNormalize, qJaccardPairs, qEntityResolution,
    qFuzzyJoin, qStrategyReport, qTopFailures)
}
