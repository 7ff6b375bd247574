package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mapping attempts / learned-mappings store (SURVEY.md §2.8 F8-F10).
  *
  * The reference keeps these in SQLite with `INSERT OR REPLACE`
  * (enhanced_mapping.py:612-655, 753-785). On an append-only columnar
  * warehouse, upsert = window-dedup-keep-latest rewrite (batch) — the same
  * dedup primitive as latest-per-group; in streaming it becomes
  * `flatMapGroupsWithState` (see graft.streaming.Streams.movementDetector's
  * state pattern). All functions are pure DataFrame transforms.
  */
object MappingStore {

  /** F8 — derive attempt rows from resolution results (append-only log).
    * attempted_at is caller-supplied (processing time is a parameter, not
    * a hidden clock — required for deterministic verification). */
  def toAttempts(results: DataFrame, leagueContext: String,
      attemptedAt: java.sql.Timestamp): DataFrame =
    results.select(
      col("api_name").as("api_football_name"),
      col("matched_name").as("odds_api_name"),
      col("confidence"),
      col("strategy_used"),
      col("match_found").as("success"),
      lit(leagueContext).as("league_context"),
      lit(attemptedAt).as("attempted_at"))

  /** F8 — learning rule: successful attempts with confidence ≥ 0.8 become
    * learned mappings (enhanced_mapping.py:632-649). */
  def learnFrom(attempts: DataFrame): DataFrame =
    attempts.filter(col("success") && col("confidence") >= 0.8)
      .select(col("api_football_name"), col("odds_api_name"),
        col("confidence"), col("strategy_used"), col("league_context"),
        col("attempted_at").as("created_at"),
        lit(false).as("verified"))

  /** INSERT OR REPLACE on (api_football_name, league_context): newest
    * created_at wins; existing rows lose to updates on ties (the update
    * batch is authoritative, matching REPLACE semantics). */
  def upsertLearned(existing: DataFrame, updates: DataFrame): DataFrame = {
    val tagged = existing.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("api_football_name"), col("league_context"))
      .orderBy(desc("created_at"), desc("__src"))
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__src")
  }

  /** F9 — human feedback: correct pair → upsert as verified (confidence
    * 1.0); wrong pair → delete (anti-join on the full key). */
  def applyFeedback(learned: DataFrame, feedback: DataFrame,
      now: java.sql.Timestamp): DataFrame = {
    val confirms = feedback.filter(col("is_correct"))
      .select(col("api_football_name"), col("odds_api_name"),
        lit(1.0).as("confidence"), lit("verified").as("strategy_used"),
        col("league_context"), lit(now).as("created_at"),
        lit(true).as("verified"))
    val rejects = feedback.filter(!col("is_correct"))
      .select(col("api_football_name"), col("odds_api_name"),
        col("league_context"))
    val afterDelete = learned.join(rejects,
      Seq("api_football_name", "odds_api_name", "league_context"),
      "left_anti")
    upsertLearned(afterDelete, confirms)
  }

  /** Loadable learned map for the resolver (F3): `verified OR confidence >
    * 0.9` (enhanced_mapping.py:194-214). */
  def loadForResolver(learned: DataFrame): DataFrame =
    learned.filter(col("verified") || col("confidence") > 0.9)
      .select(col("api_football_name").as("api_name"),
        col("odds_api_name").as("target"))

  /** F10 — per-strategy report over a time window (enhanced_mapping.py:
    * 657-751): attempts, successes, success rate, mean confidence of
    * successes, ordered by successes desc. */
  def strategyReport(attempts: DataFrame,
      since: java.sql.Timestamp): DataFrame =
    attempts.filter(col("attempted_at") >= lit(since))
      .groupBy(col("strategy_used"))
      .agg(
        count(lit(1)).as("attempts"),
        sum(when(col("success"), 1).otherwise(0)).as("successes"),
        (sum(when(col("success"), 1).otherwise(0)).cast("double") /
          count(lit(1)).cast("double")).as("success_rate"),
        (sum(when(col("success"), col("confidence"))
          .cast("decimal(27,6)")).cast("double") /
          sum(when(col("success"), 1).otherwise(0)).cast("double"))
          .as("avg_confidence"))
      .orderBy(desc("successes"), col("strategy_used"))

  /** F10 — top-k failing names (the curation worklist). */
  def topFailures(attempts: DataFrame, since: java.sql.Timestamp,
      k: Int): DataFrame =
    attempts.filter(col("attempted_at") >= lit(since) && !col("success"))
      .groupBy(col("api_football_name"))
      .agg(count(lit(1)).as("failures"),
        max(col("confidence")).as("best_confidence"))
      .orderBy(desc("failures"), col("api_football_name"))
      .limit(k)
}
