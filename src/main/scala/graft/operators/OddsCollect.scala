package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F11 — `collect_odds_data_enhanced` (enhanced_mapping.py:787-909): the
  * reference's flagship integration. For each collected payload, map the
  * fixture's API-side team names (game_info) against the odds event's team
  * names through the full cascade, and stamp the result back onto the
  * payload as a `_mapping_metadata` struct (visible in the live sample
  * `data/early_odds_1390826_20250818_190818.json`).
  *
  * Distributed shape: explode (side × candidate) per payload — 4 scored
  * rows per fixture — then ONE grouped cascade decision
  * ([[EntityResolution.pickBest]] keyed by (fixture, side)) and two
  * broadcast-friendly joins to re-attach home/away metadata. No per-row
  * Python loop, no driver round-trips; 100 TB of payloads stream through
  * the same plan.
  *
  * @param payloads columns: fixture_id, game_info struct (home_team,
  *                 away_team), event struct ([[OddsPipeline.oddsEventSchema]])
  */
object OddsCollect {

  def enhanceWithMapping(payloads: DataFrame): DataFrame = {
    val sides = payloads
      .select(col("fixture_id"), col("game_info"), col("event"))
      .withColumn("side", explode(array(lit("home"), lit("away"))))
      .withColumn("api_name",
        when(col("side") === "home", col("game_info.home_team"))
          .otherwise(col("game_info.away_team")))
    val pairs = sides
      .withColumn("c", explode(array(
        struct(col("event.home_team").as("cand"), lit(0L).as("cand_ord")),
        struct(col("event.away_team").as("cand"), lit(1L).as("cand_ord")))))
      .select(col("fixture_id"), col("side"), col("api_name"),
        col("c.cand").as("cand"), col("c.cand_ord").as("cand_ord"),
        lit(null).cast("string").as("__manual"),
        lit(null).cast("string").as("__learned"))
    val scored = EntityResolution.pairScores(col("api_name"), col("cand"),
        col("__manual"), col("__learned"))
      .foldLeft(pairs) { case (df, (s, c)) => df.withColumn(s"s_$s", c) }
    val best = EntityResolution.pickBest(scored,
      Seq("fixture_id", "side", "api_name"))

    // Re-attach on (fixture_id, api_name) — not fixture_id alone: the same
    // fixture can appear across payloads with differing game_info names
    // (pickBest keys include api_name), and a fixture-only join would fan
    // payload rows out across the other payloads' mappings.
    def sideMeta(side: String) = best.filter(col("side") === side)
      .select(col("fixture_id"), col("api_name").as(s"__${side}_api"),
        struct(
          col("api_name").as("api_football_name"),
          col("matched_name").as("odds_api_name"),
          col("confidence"), col("strategy_used"), col("match_found"))
          .as(s"${side}_mapping"))

    payloads
      .withColumn("__home_api", col("game_info.home_team"))
      .withColumn("__away_api", col("game_info.away_team"))
      .join(sideMeta("home"), Seq("fixture_id", "__home_api"), "left")
      .join(sideMeta("away"), Seq("fixture_id", "__away_api"), "left")
      .drop("__home_api", "__away_api")
      .withColumn("_mapping_metadata",
        struct(col("home_mapping"), col("away_mapping"),
          (col("home_mapping.match_found") && col("away_mapping.match_found"))
            .as("game_matched")))
      .drop("home_mapping", "away_mapping")
  }

  /** N6 — team-event detection from lineups: documented stub in the
    * reference too (database_integration.py:334-356 is a placeholder that
    * never fires). The engine ships the schema and a no-op transform so the
    * downstream contract (team_events table, J5 event-impact join) is real. */
  def detectTeamEvents(lineupRows: DataFrame): DataFrame =
    lineupRows.select(
      col("team_id"),
      col("player_id"),
      lit("lineup_change").as("event_type"),
      lit(null).cast("string").as("event_description"),
      lit("minor").as("severity"),
      col("collected_at").as("detected_at"))
      .limit(0) // no detection heuristic defined by the reference either
}
