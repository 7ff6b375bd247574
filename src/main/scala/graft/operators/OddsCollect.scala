package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** N6 — team-event detection from lineups. The reference's own detector
    * is an empty placeholder (database_integration.py:334-356: "Could
    * implement logic to detect when expected players are missing ...
    * Comparison with previous lineups"); this implements exactly that
    * MINIMAL documented intent: for each team's consecutive fixtures
    * (ordered by fixture time), a player who STARTED the previous fixture
    * but is absent from the current lineup raises a `missing_starter`
    * event (the injury/suspension signal the placeholder describes).
    *
    * Input: (team_id, fixture_id, fixture_ts, player_id) lineup rows.
    * Output: (team_id, fixture_id, player_id, event_type,
    *          event_description, severity, detected_at).
    *
    * Scale shape: the fixture sequence comes from dense_rank directly
    * over lineup rows (identical to numbering distinct fixtures, without
    * a separate distinct+join); the sequenced relation is CACHED — the
    * operator's materialization point, same posture as the curation
    * pipeline's curated store: three downstream branches (prev roster,
    * current roster, fixture list) read it, and without the cache each
    * re-runs the upstream lineup build + team shuffle + window (measured
    * 3× recompute; AQE does not collapse the identical subtrees, and
    * since Spark 3.3 joins re-shuffle on the full key set regardless of
    * the team_id partitioning). A lineup table is fixtures×squad-size —
    * bounded far below corpus scale, safe to pin. Downstream: one
    * left-anti roster set-diff keyed (team, seq, player), linear in
    * lineup rows, no per-team cross product. */
  def detectTeamEvents(lineups: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("team_id"))
      .orderBy(col("fixture_ts"), col("fixture_id"))
    val seqd = lineups.withColumn("seq", dense_rank().over(w)).cache()
    // materialize BEFORE the multi-branch action: concurrent stages race
    // an un-populated cache and each recompute the window pipeline (same
    // hazard minhashCrossPairs documents)
    seqd.count()
    // previous fixture's roster, re-keyed to the fixture that FOLLOWS it
    val prevRoster = seqd
      .select(col("team_id"), (col("seq") + 1).as("seq"),
        col("player_id"), col("fixture_id").as("prev_fixture"))
    val curFx = seqd.select(col("team_id"), col("seq"),
      col("fixture_id"), col("fixture_ts")).distinct()
    val curRoster = seqd.select(col("team_id"), col("seq"), col("player_id"))
    prevRoster.join(curFx, Seq("team_id", "seq"))
      .join(curRoster, Seq("team_id", "seq", "player_id"), "left_anti")
      .select(col("team_id"), col("fixture_id"), col("player_id"),
        lit("missing_starter").as("event_type"),
        concat(lit("started fixture "), col("prev_fixture"),
          lit(", absent from fixture "), col("fixture_id"))
          .as("event_description"),
        lit("minor").as("severity"),
        col("fixture_ts").as("detected_at"))
  }
}
