package graft

import graft.operators.OddsCollect
import graft.sources.Sources
import org.apache.spark.sql.functions._

class OddsCollectSpec extends SparkSpec {
  import spark.implicits._

  test("N6 detectTeamEvents: starter absent from the NEXT fixture raises missing_starter") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")
    // team 1: fixtures 10 (players 100,101) → 11 (101,102) → 12 (102)
    //   ⇒ 100 missing at 11; 101 missing at 12
    // team 2: single fixture ⇒ nothing (no previous lineup to diff)
    val lineups = Seq(
      (1L, 10L, ts(1), 100L), (1L, 10L, ts(1), 101L),
      (1L, 11L, ts(8), 101L), (1L, 11L, ts(8), 102L),
      (1L, 12L, ts(15), 102L),
      (2L, 20L, ts(1), 900L))
      .toDF("team_id", "fixture_id", "fixture_ts", "player_id")
    val out = graft.operators.OddsCollect.detectTeamEvents(lineups)
      .select("team_id", "fixture_id", "player_id", "event_type", "severity")
      .as[(Long, Long, Long, String, String)].collect().toSet
    assert(out === Set(
      (1L, 11L, 100L, "missing_starter", "minor"),
      (1L, 12L, 101L, "missing_starter", "minor")))
  }

  test("F11: payload gains _mapping_metadata; Man Utd maps via normalization") {
    val payloadJson =
      """{"fixture_id": 9001,
          "game_info": {"home_team": "Manchester United", "away_team": "Liverpool"},
          "data": {"odds_early": {
            "home_team": "Manchester Utd", "away_team": "Liverpool",
            "bookmakers": []}}}"""
    val payloads = spark.read.schema(Sources.payloadSchema)
      .json(Seq(payloadJson).toDS())
      .select(col("fixture_id"), col("game_info"),
        col("data.odds_early").as("event"))
    val out = OddsCollect.enhanceWithMapping(payloads).head
    val meta = out.getAs[org.apache.spark.sql.Row]("_mapping_metadata")
    val home = meta.getAs[org.apache.spark.sql.Row]("home_mapping")
    val away = meta.getAs[org.apache.spark.sql.Row]("away_mapping")
    assert(home.getAs[String]("odds_api_name") === "Manchester Utd")
    assert(home.getAs[String]("strategy_used") === "normalized_matching")
    assert(away.getAs[String]("odds_api_name") === "Liverpool")
    assert(away.getAs[String]("strategy_used") === "exact_match")
    assert(meta.getAs[Boolean]("game_matched"))
  }

  test("unmatchable names produce match_found=false and game_matched=false") {
    val payloadJson =
      """{"fixture_id": 9002,
          "game_info": {"home_team": "Zzz Qqq Xxx", "away_team": "Liverpool"},
          "data": {"odds_early": {
            "home_team": "Aaa Bbb", "away_team": "Liverpool",
            "bookmakers": []}}}"""
    val payloads = spark.read.schema(Sources.payloadSchema)
      .json(Seq(payloadJson).toDS())
      .select(col("fixture_id"), col("game_info"),
        col("data.odds_early").as("event"))
    val meta = OddsCollect.enhanceWithMapping(payloads).head
      .getAs[org.apache.spark.sql.Row]("_mapping_metadata")
    assert(!meta.getAs[Row]("home_mapping").getAs[Boolean]("match_found"))
    assert(!meta.getAs[Boolean]("game_matched"))
  }
  type Row = org.apache.spark.sql.Row
}

class RestFixtureSourceSpec extends SparkSpec {

  test("DSv2 source plans one partition per (league, date) and reads pages") {
    val df = spark.read.format("graft.sources.RestFixtureSource")
      .option("leagues", "39,140,78").option("days", "3")
      .option("startDate", "2024-08-01").load()
    assert(df.rdd.getNumPartitions === 9) // 3 leagues × 3 days
    assert(df.count() === 9 * 10)         // fixturesPerPage = 10
    // deterministic: same options → identical data
    val again = spark.read.format("graft.sources.RestFixtureSource")
      .option("leagues", "39,140,78").option("days", "3")
      .option("startDate", "2024-08-01").load()
    assert(df.exceptAll(again).count() === 0)
    // league pruning = fewer partitions (the scan-avoidance analogue)
    val pruned = spark.read.format("graft.sources.RestFixtureSource")
      .option("leagues", "39").option("days", "1")
      .option("startDate", "2024-08-01").load()
    assert(pruned.rdd.getNumPartitions === 1)
    import org.apache.spark.sql.functions._
    assert(pruned.select(countDistinct(col("league_id"))).head.getLong(0) === 1)
  }

  test("429 handling: retry within budget recovers, exhaustion skips the page") {
    import graft.sources.RestFixtureSource.Metrics
    import spark.implicits._
    // league 140's page 429s twice then succeeds (within maxRetries=3);
    // league 78's page 429s forever → skipped after 3 retries
    Metrics.reset()
    val df = spark.read.format("rest-fixtures")
      .option("leagues", "39,140,78").option("days", "1")
      .option("startDate", "2024-08-01")
      .option("maxRetries", "3")
      .option("inject429", "140@2024-08-01:2,78@2024-08-01:99")
      .load()
    val byLeague = df.groupBy("league_id").count()
      .as[(Int, Long)].collect().toMap
    // 39 clean, 140 recovered after retries, 78 skipped — job COMPLETED
    assert(byLeague === Map(39 -> 10L, 140 -> 10L))
    assert(Metrics.retries.get() === 2 + 3)  // 140: two 429s; 78: full budget
    assert(Metrics.skippedPages.get() === 1)
    // the skipped page is gone for this run, not erroring the scan
    assert(df.count() === 20)
  }
}
