package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Instruction / chat training-data assembly — the conversation-shaped
  * slice of an LLM data pipeline (cf. the reference's per-fixture event
  * ordering, `database_schema.sql` fixtures/odds timestamps): render
  * per-user event streams
  * as role-tagged chat transcripts, pack them into a context window by
  * keeping the newest turns, audit role alternation, and mine DPO-style
  * preference pairs from a scored corpus.
  *
  * Determinism contract: turns are totally ordered by (ts, event_id)
  * (event_id unique — no tie ambiguity); numeric payloads ride as
  * floored cents (one IEEE double·100 multiply, identical cross-engine);
  * rendered text is pure concatenation of those deterministic pieces.
  *
  * Scale shape: every query is ONE user-keyed exchange (groupBy or
  * window); per-user state is one conversation — bounded by the
  * per-entity event count, the same assumption any chat-data pipeline
  * makes (a conversation fits in memory). Preference mining groups by
  * (lang, source) — a dimension-bounded key — and picks extrema via two
  * rank windows over one exchange.
  */
object ChatQueries {

  /** role tag: interaction events speak as "user", system responses
    * ("purchase" confirmation, "error") as "assistant". */
  private def roleCol = when(
    col("event_type").isin("click", "view", "signup"), lit("user"))
    .otherwise(lit("assistant"))

  /** `<|role|>type@cents` — the rendered turn. */
  private def turnedEvents(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.events(s, d).select(
      col("user_id"), col("ts"), col("event_id"), roleCol.as("role"),
      col("event_type"),
      floor(col("value") * 100).cast("long").as("cents"))
      .withColumn("turn", concat(lit("<|"), col("role"), lit("|>"),
        col("event_type"), lit("@"), col("cents").cast("string")))

  private val turnSql =
    """'<|' || CASE WHEN event_type IN ('click','view','signup')
         THEN 'user' ELSE 'assistant' END || '|>' || event_type
       || '@' || CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR)"""

  /** Chat-transcript rendering: each user's events in (ts, event_id)
    * order concatenated into one role-tagged training string. The
    * transcript itself is the gated output — a full-text pin of
    * ordering, role mapping, and the cents rendering at once. One
    * user-keyed exchange; the in-array sort keeps per-group work
    * memory-local (a conversation is bounded by construction). */
  val qChatRender = GQuery("q_chat_render",
    (s, d) => turnedEvents(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_turns"),
        array_join(expr("""transform(
            array_sort(collect_list(struct(ts, event_id, turn))),
            x -> x.turn)"""), "").as("convo"))
      .select(col("user_id"), col("n_turns"), col("convo"),
        length(col("convo")).cast("long").as("n_chars"))
      .orderBy(col("user_id")),
    Some(s"""WITH t AS (
        SELECT user_id, ts, event_id, $turnSql AS turn FROM events)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
        string_agg(turn, '' ORDER BY ts, event_id) AS convo,
        CAST(length(string_agg(turn, '' ORDER BY ts, event_id))
          AS BIGINT) AS n_chars
      FROM t GROUP BY user_id ORDER BY user_id"""),
    notes = "full-transcript pin of turn ordering + role mapping; one " +
      "user-keyed exchange, conversation-bounded state")

  /** Context-window packing: keep the LONGEST SUFFIX of turns whose
    * total rendered length fits a 512-char budget — the newest-first
    * truncation every chat fine-tune applies before tokenization.
    * Reverse cumulative char count via one window (ts DESC,
    * event_id DESC, rows unbounded-preceding); a turn is kept iff its
    * reverse-cumsum ≤ budget. Single exchange, no second pass. */
  val qChatWindow = GQuery("q_chat_window",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      turnedEvents(s, d)
        .withColumn("rc", sum(length(col("turn"))).over(w))
        .withColumn("kept", (col("rc") <= 512).cast("long"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_turns"),
          sum(col("kept")).as("kept_turns"),
          (count(lit(1)) - sum(col("kept"))).as("dropped_turns"),
          sum(when(col("kept") === 1L, length(col("turn")))
            .otherwise(lit(0L))).cast("long").as("kept_chars"),
          min(when(col("kept") === 1L, col("event_id")))
            .as("first_kept_event"))
        .orderBy(col("user_id"))
    },
    Some(s"""WITH t AS (
        SELECT user_id, ts, event_id, $turnSql AS turn FROM events),
      rc AS (
        SELECT user_id, event_id, length(turn) AS tl,
          SUM(length(turn)) OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC
            ROWS UNBOUNDED PRECEDING) AS rc
        FROM t)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
        CAST(SUM(CASE WHEN rc <= 512 THEN 1 ELSE 0 END) AS BIGINT)
          AS kept_turns,
        CAST(COUNT(*) - SUM(CASE WHEN rc <= 512 THEN 1 ELSE 0 END)
          AS BIGINT) AS dropped_turns,
        CAST(SUM(CASE WHEN rc <= 512 THEN tl ELSE 0 END) AS BIGINT)
          AS kept_chars,
        CAST(MIN(CASE WHEN rc <= 512 THEN event_id END) AS BIGINT)
          AS first_kept_event
      FROM rc GROUP BY user_id ORDER BY user_id"""),
    notes = "longest-suffix-within-budget via one reverse-cumsum " +
      "window; newest-turns-first context packing")

  /** Role-alternation audit: count consecutive same-role turn pairs
    * per conversation (LAG over the turn order) and flag strictly
    * alternating transcripts — the validity gate chat-format training
    * data passes before templating. */
  val qRoleAlt = GQuery("q_role_alt",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      turnedEvents(s, d)
        .withColumn("prev_role", lag(col("role"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_turns"),
          sum(when(col("role") === col("prev_role"), 1L)
            .otherwise(0L)).as("violations"))
        .withColumn("strict_flag",
          (col("violations") === 0L).cast("long"))
        .orderBy(col("user_id"))
    },
    Some("""WITH t AS (
        SELECT user_id, ts, event_id,
          CASE WHEN event_type IN ('click','view','signup')
            THEN 'user' ELSE 'assistant' END AS role
        FROM events),
      lagged AS (
        SELECT user_id, role,
          LAG(role) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev_role
        FROM t)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
        CAST(SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END)
          AS BIGINT) AS violations,
        CAST(CASE WHEN SUM(CASE WHEN role = prev_role THEN 1 ELSE 0
          END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS strict_flag
      FROM lagged GROUP BY user_id ORDER BY user_id"""),
    notes = "LAG same-role violation count per conversation; " +
      "chat-format validity gate")

  /** DPO-style preference-pair mining: within each (lang, source)
    * stratum, pair the highest-scoring document (chosen) against the
    * lowest (rejected), demanding a ≥ 50-per-mille margin. Reward =
    * type-token ratio in per-mille (distinct words ×1000 div words) —
    * deterministic integer, no model in the loop. Extrema via two rank
    * windows over ONE (lang, source) exchange; strata are
    * dimension-bounded, so the pair table is tiny at any corpus size. */
  val qPrefPairs = GQuery("q_pref_pairs",
    (s, d) => {
      val words = expr(
        "filter(split(trim(lower(text)), '\\\\s+'), t -> length(t) > 0)")
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          words.as("w"))
        .filter(size(col("w")) > 0)
        .select(col("doc_id"), col("lang"), col("source"),
          expr("size(array_distinct(w)) * 1000L div size(w)")
            .as("score"))
      val hi = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("score").desc, col("doc_id"))
      val lo = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("score"), col("doc_id"))
      scored
        .withColumn("rh", row_number().over(hi))
        .withColumn("rl", row_number().over(lo))
        .groupBy(col("lang"), col("source"))
        .agg(
          max(when(col("rh") === 1, col("doc_id"))).as("chosen_id"),
          max(when(col("rh") === 1, col("score"))).as("chosen_score"),
          max(when(col("rl") === 1, col("doc_id"))).as("rejected_id"),
          max(when(col("rl") === 1, col("score"))).as("rejected_score"))
        .withColumn("margin", col("chosen_score") - col("rejected_score"))
        .filter(col("margin") >= 50L)
        .orderBy(col("lang"), col("source"))
    },
    Some("""WITH scored AS (
        SELECT doc_id, lang, source,
          CAST(len(list_distinct(list_filter(
              string_split_regex(trim(lower(text)), '\s+'),
              t -> len(t) > 0))) * 1000 AS BIGINT)
            // CAST(len(list_filter(
              string_split_regex(trim(lower(text)), '\s+'),
              t -> len(t) > 0)) AS BIGINT) AS score
        FROM documents
        WHERE len(list_filter(string_split_regex(trim(lower(text)),
          '\s+'), t -> len(t) > 0)) > 0),
      ranked AS (
        SELECT lang, source, doc_id, score,
          ROW_NUMBER() OVER (PARTITION BY lang, source
            ORDER BY score DESC, doc_id) AS rh,
          ROW_NUMBER() OVER (PARTITION BY lang, source
            ORDER BY score, doc_id) AS rl
        FROM scored),
      pairs AS (
        SELECT lang, source,
          MAX(CASE WHEN rh = 1 THEN doc_id END) AS chosen_id,
          MAX(CASE WHEN rh = 1 THEN score END) AS chosen_score,
          MAX(CASE WHEN rl = 1 THEN doc_id END) AS rejected_id,
          MAX(CASE WHEN rl = 1 THEN score END) AS rejected_score
        FROM ranked GROUP BY lang, source)
      SELECT lang, source, CAST(chosen_id AS BIGINT) AS chosen_id,
        CAST(chosen_score AS BIGINT) AS chosen_score,
        CAST(rejected_id AS BIGINT) AS rejected_id,
        CAST(rejected_score AS BIGINT) AS rejected_score,
        CAST(chosen_score - rejected_score AS BIGINT) AS margin
      FROM pairs WHERE chosen_score - rejected_score >= 50
      ORDER BY lang, source"""),
    notes = "per-(lang,source) max-vs-min reward pairing with margin " +
      "gate; integer type-token-ratio reward, one exchange")

  val all: Seq[GQuery] =
    Seq(qChatRender, qChatWindow, qRoleAlt, qPrefPairs)
}
