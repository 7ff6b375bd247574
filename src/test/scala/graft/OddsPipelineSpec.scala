package graft

import graft.operators.OddsPipeline
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Golden-path E2E: the reference demo payload (demo_enhanced_pipeline.py:
  * 79-114 — Man Utd vs Liverpool, Bet365 h2h 2.1/3.4/3.2) must flatten to
  * exactly one odds_history row (FIXTURES.md §4). */
class OddsPipelineSpec extends SparkSpec {
  import spark.implicits._

  val demoJson: String =
    """{"fixture_id": 9001, "collection_type": "early_odds",
        "collected_at": "2025-08-20T10:00:00+00:00",
        "game_info": {"fixture_id": 9001, "kickoff_utc": "2025-08-22T15:00:00+00:00",
          "home_team": "Manchester United", "away_team": "Liverpool",
          "home_team_id": 33, "away_team_id": 40,
          "league": "Premier League", "league_id": 39, "country": "England",
          "venue": "Old Trafford", "priority": "highest"},
        "data": {"odds_early": {
          "id": "abc123", "sport_key": "soccer_epl", "sport_title": "EPL",
          "commence_time": "2025-08-22T15:00:00Z",
          "home_team": "Manchester Utd", "away_team": "Liverpool",
          "bookmakers": [{"key": "bet365", "title": "Bet365",
            "last_update": "2025-08-20T09:55:00Z",
            "markets": [{"key": "h2h", "last_update": "2025-08-20T09:55:00Z",
              "outcomes": [
                {"name": "Manchester Utd", "price": 2.1},
                {"name": "Draw", "price": 3.4},
                {"name": "Liverpool", "price": 3.2}]}]}]}}}"""

  def flattenPayloads(raw: Seq[String]) = {
    val payloads = spark.read.schema(Sources.payloadSchema)
      .json(raw.toDS())
    OddsPipeline.flattenOdds(payloads.select(
      col("fixture_id"),
      to_timestamp(col("collected_at")).as("collected_at"),
      col("collection_type").as("collection_phase"),
      col("data.odds_early").as("event")))
  }

  test("demo payload → exactly one h2h odds row 2.1/3.4/3.2") {
    val rows = flattenPayloads(Seq(demoJson)).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("fixture_id") === 9001L)
    assert(r.getAs[String]("bookmaker") === "Bet365")
    assert(r.getAs[String]("market_type") === "h2h")
    assert(r.getAs[Double]("home_odds") === 2.1)
    assert(r.getAs[Double]("draw_odds") === 3.4)
    assert(r.getAs[Double]("away_odds") === 3.2)
    assert(r.getAs[String]("collection_phase") === "early_odds")
    assert(r.isNullAt(r.fieldIndex("over_odds")))
  }

  test("spreads and totals markets pivot point columns; duplicate names keep last") {
    val json =
      """{"fixture_id": 9002, "collection_type": "final_data",
          "collected_at": "2025-08-20T10:00:00+00:00",
          "data": {"odds_early": {
            "home_team": "A", "away_team": "B",
            "bookmakers": [{"key": "bk", "title": "BK",
              "markets": [
                {"key": "spreads", "outcomes": [
                  {"name": "A", "price": 1.9, "point": -1.5},
                  {"name": "B", "price": 1.95, "point": 1.5},
                  {"name": "A", "price": 1.8, "point": -2.0}]},
                {"key": "totals", "outcomes": [
                  {"name": "Over", "price": 1.85, "point": 2.5},
                  {"name": "Under", "price": 1.95, "point": 2.5}]}]}]}}}"""
    val rows = flattenPayloads(Seq(json)).orderBy("market_type").collect()
    assert(rows.length === 2)
    val spreads = rows(0)
    assert(spreads.getAs[String]("market_type") === "spreads")
    assert(spreads.getAs[Double]("home_odds") === 1.8)   // last duplicate wins
    assert(spreads.getAs[Double]("handicap") === -2.0)
    assert(spreads.getAs[Double]("away_odds") === 1.95)
    val totals = rows(1)
    assert(totals.getAs[Double]("over_odds") === 1.85)
    assert(totals.getAs[Double]("under_odds") === 1.95)
    assert(totals.getAs[Double]("total_points") === 2.5)
  }

  test("lineups: two-array flatten + player dim dedup") {
    val lineupJson =
      """{"fixture_id": 1, "collected_at": "2025-08-20T10:00:00+00:00",
          "lineup": {"team": {"id": 33, "name": "MU"}, "formation": "4-3-3",
            "startXI": [{"player": {"id": 101, "name": "P1", "number": 1, "pos": "G", "grid": "1:1"}}],
            "substitutes": [{"player": {"id": 102, "name": "P2", "number": 12, "pos": "M", "grid": null}}]}}"""
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("fixture_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("collected_at",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("lineup",
        OddsPipeline.lineupSchema)))
    val df = spark.read.schema(schema).json(Seq(lineupJson).toDS())
    val rows = OddsPipeline.flattenLineups(df).collect()
    assert(rows.length === 2)
    assert(rows.count(_.getAs[Boolean]("is_starter")) === 1)
    val dim = OddsPipeline.playerDim(OddsPipeline.flattenLineups(df))
    assert(dim.count() === 2)
  }

  test("team stats extraction with missing-field defaults") {
    val statsJson =
      """{"team_id": 33, "league_id": 39, "season": 2025,
          "collection_date": "2025-08-20",
          "stats": {"fixtures": {"played": {"total": 10}, "wins": {"total": 6}},
                    "goals": {"for": {"total": {"total": 18}}}}}"""
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("team_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("league_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("season",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("collection_date",
        org.apache.spark.sql.types.DateType),
      org.apache.spark.sql.types.StructField("stats",
        OddsPipeline.teamStatsSchema)))
    val df = spark.read.schema(schema).json(Seq(statsJson).toDS())
    val r = OddsPipeline.extractTeamStats(df).head
    assert(r.getAs[Int]("matches_played") === 10)
    assert(r.getAs[Int]("draws") === 0)          // missing → default 0
    assert(r.getAs[Int]("goals_against") === 0)  // missing → default 0
    assert(r.getAs[Double]("win_percentage") === 60.0)
  }

  test("jobs.json round trip through the JSON source") {
    val tmp = java.nio.file.Files.createTempDirectory("jobs").toString
    val jobsJson =
      """[{"id": "1_early_odds", "fixture_id": 1,
           "scheduled_for": "2025-08-22T13:00:00+00:00", "status": "pending",
           "type": "early_odds", "priority": "highest",
           "created_at": "2025-08-20T10:00:00+00:00"},
          {"id": "1_final_data", "fixture_id": 1,
           "scheduled_for": "2025-08-22T14:00:00+00:00", "status": "pending",
           "type": "final_data", "priority": "highest",
           "created_at": "2025-08-20T10:00:00+00:00"}]"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/jobs.json"), jobsJson)
    val jobs = Sources.readJobs(spark, s"$tmp/jobs.json")
    assert(jobs.count() === 2)
    assert(jobs.filter(col("scheduled_for").isNotNull).count() === 2)
  }
}
