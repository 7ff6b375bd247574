package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nested-JSON normalization operators (SURVEY.md §2.9) — the odds-event
  * payload (FIXTURES.md §2) flattened into the relational `odds_history`
  * shape exactly as the reference does it (database_integration.py:176-226):
  * 3-level explode bookmakers[]→markets[]→outcomes[], then a per-market
  * outcome-name pivot into wide columns.
  *
  * The pivot is `map_from_entries` + `element_at`-style lookup — per-row
  * array work inside whole-stage codegen, NO groupBy/shuffle (a real
  * `.pivot()` would shuffle the full fact table a second time).
  * Duplicate outcome names keep the last entry (session sets
  * `spark.sql.mapKeyDedupPolicy=LAST_WIN` = Python dict semantics).
  */
object OddsPipeline {

  val outcomeSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("price", DoubleType),
    StructField("point", DoubleType)))

  val marketSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("last_update", StringType),
    StructField("outcomes", ArrayType(outcomeSchema))))

  val bookmakerSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("title", StringType),
    StructField("last_update", StringType),
    StructField("markets", ArrayType(marketSchema))))

  /** Odds-API event document (FIXTURES.md §2 `data.odds_*`). */
  val oddsEventSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("sport_key", StringType),
    StructField("sport_title", StringType),
    StructField("commence_time", StringType),
    StructField("home_team", StringType),
    StructField("away_team", StringType),
    StructField("bookmakers", ArrayType(bookmakerSchema))))

  /** N2 — flatten one odds-event column into odds_history rows.
    *
    * @param df frame with columns: fixture_id, collected_at,
    *           collection_phase, and `event` (struct of [[oddsEventSchema]])
    */
  def flattenOdds(df: DataFrame): DataFrame = {
    val exploded = df
      .select(col("fixture_id"), col("collected_at"), col("collection_phase"),
        col("event.home_team").as("home_team"),
        col("event.away_team").as("away_team"),
        explode(col("event.bookmakers")).as("bm"))
      .select(col("fixture_id"), col("collected_at"), col("collection_phase"),
        col("home_team"), col("away_team"),
        col("bm.title").as("bookmaker"),
        explode(col("bm.markets")).as("mkt"))
    val outcomes = col("mkt.outcomes")
    // name → price map (LAST_WIN on dup names, matching the reference's
    // dict comprehension); `get` is OOB-null-safe under ANSI mode
    val priceMap = map_from_entries(
      transform(outcomes, o => struct(o("name"), o("price"))))
    def lastWhere(name: Column): Column = {
      val f = filter(outcomes, o => o("name") === name)
      get(f, size(f) - 1)
    }
    val homeSpread = lastWhere(col("home_team"))
    val awaySpread = lastWhere(col("away_team"))
    val over = lastWhere(lit("Over"))
    val under = lastWhere(lit("Under"))
    exploded
      .withColumn("market_type", col("mkt.key"))
      .withColumn("home_odds",
        when(col("market_type") === "h2h",
          element_at(priceMap, col("home_team")))
        .when(col("market_type") === "spreads", homeSpread("price")))
      .withColumn("draw_odds",
        when(col("market_type") === "h2h", element_at(priceMap, lit("Draw"))))
      .withColumn("away_odds",
        when(col("market_type") === "h2h",
          element_at(priceMap, col("away_team")))
        .when(col("market_type") === "spreads", awaySpread("price")))
      .withColumn("over_odds",
        when(col("market_type") === "totals", over("price")))
      .withColumn("under_odds",
        when(col("market_type") === "totals", under("price")))
      .withColumn("handicap",
        when(col("market_type") === "spreads", homeSpread("point")))
      .withColumn("total_points",
        when(col("market_type") === "totals", over("point")))
      .select("fixture_id", "bookmaker", "market_type", "home_odds",
        "draw_odds", "away_odds", "over_odds", "under_odds", "handicap",
        "total_points", "collected_at", "collection_phase")
  }

  /** Lineup document (FIXTURES.md §2 `data.lineups` response rows). */
  val lineupPlayerSchema: StructType = StructType(Seq(
    StructField("player", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("number", IntegerType), StructField("pos", StringType),
      StructField("grid", StringType))))))

  val lineupSchema: StructType = StructType(Seq(
    StructField("team", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))),
    StructField("formation", StringType),
    StructField("startXI", ArrayType(lineupPlayerSchema)),
    StructField("substitutes", ArrayType(lineupPlayerSchema))))

  /** N4 — two-array flatten: startXI[] + substitutes[] → player rows with
    * is_starter flag (database_integration.py:282-332). */
  def flattenLineups(df: DataFrame): DataFrame = {
    def side(arr: String, starter: Boolean) = df
      .select(col("fixture_id"), col("lineup.team.id").as("team_id"),
        col("lineup.formation").as("formation"),
        explode(col(s"lineup.$arr")).as("p"), col("collected_at"))
      .select(col("fixture_id"), col("team_id"), col("formation"),
        col("p.player.id").as("player_id"),
        col("p.player.name").as("player_name"),
        col("p.player.pos").as("position"),
        lit(starter).as("is_starter"), col("collected_at"))
    side("startXI", starter = true)
      .unionByName(side("substitutes", starter = false))
  }

  /** Player dim upsert from lineups: one row per player, latest sighting
    * wins (window dedup — the reference's INSERT OR REPLACE). */
  def playerDim(lineupRows: DataFrame): DataFrame =
    Windows.latestPerGroup(
      lineupRows.select(col("player_id"), col("player_name"),
        col("position"), col("team_id"), col("collected_at")),
      Seq("player_id"), "collected_at", "team_id")

  /** Team-stats document (`data.home_team_stats.response`). */
  val teamStatsSchema: StructType = StructType(Seq(
    StructField("fixtures", StructType(Seq(
      StructField("played", StructType(Seq(StructField("total", IntegerType)))),
      StructField("wins", StructType(Seq(StructField("total", IntegerType)))),
      StructField("draws", StructType(Seq(StructField("total", IntegerType)))),
      StructField("loses", StructType(Seq(StructField("total", IntegerType))))))),
    StructField("goals", StructType(Seq(
      StructField("for", StructType(Seq(
        StructField("total", StructType(Seq(StructField("total", IntegerType))))))),
      StructField("against", StructType(Seq(
        StructField("total", StructType(Seq(StructField("total", IntegerType))))))))))))

  /** A8/N — stat extraction with optimistic `.get(...,0)` defaults
    * (database_integration.py:228-254): nested projection + coalesce,
    * win_percentage guarded by max(played,1). */
  def extractTeamStats(df: DataFrame): DataFrame = {
    val played = coalesce(col("stats.fixtures.played.total"), lit(0))
    val wins = coalesce(col("stats.fixtures.wins.total"), lit(0))
    df.select(col("team_id"), col("league_id"), col("season"),
        col("collection_date"),
        played.as("matches_played"), wins.as("wins"),
        coalesce(col("stats.fixtures.draws.total"), lit(0)).as("draws"),
        coalesce(col("stats.fixtures.loses.total"), lit(0)).as("losses"),
        coalesce(col("stats.goals.for.total.total"), lit(0)).as("goals_for"),
        coalesce(col("stats.goals.against.total.total"), lit(0))
          .as("goals_against"))
      .withColumn("win_percentage",
        round(col("wins").cast("double") /
          greatest(col("matches_played"), lit(1)).cast("double") * 100, 2))
  }

  /** Head-to-head flatten (N3, database_integration.py:256-280). */
  val h2hRowSchema: StructType = StructType(Seq(
    StructField("fixture", StructType(Seq(
      StructField("id", LongType), StructField("date", StringType)))),
    StructField("teams", StructType(Seq(
      StructField("home", StructType(Seq(StructField("id", LongType)))),
      StructField("away", StructType(Seq(StructField("id", LongType))))))),
    StructField("goals", StructType(Seq(
      StructField("home", IntegerType), StructField("away", IntegerType)))),
    StructField("league", StructType(Seq(StructField("id", LongType))))))

  def flattenH2h(df: DataFrame): DataFrame = df
    .select(col("home_team_id"), col("away_team_id"),
      explode(col("response")).as("r"))
    .select(col("home_team_id"), col("away_team_id"),
      col("r.fixture.id").as("fixture_id"),
      col("r.goals.home").as("home_score"),
      col("r.goals.away").as("away_score"),
      to_date(col("r.fixture.date")).as("match_date"),
      col("r.league.id").as("league_id"))

  /** N5 — fixture-envelope → game_info projection with venue null-guard
    * (workflows yml:158-172). */
  def gameInfo(df: DataFrame): DataFrame = df.select(
    col("resp.fixture.id").as("fixture_id"),
    col("resp.fixture.date").as("kickoff_utc"),
    col("resp.teams.home.name").as("home_team"),
    col("resp.teams.away.name").as("away_team"),
    col("resp.teams.home.id").as("home_team_id"),
    col("resp.teams.away.id").as("away_team_id"),
    col("resp.league.name").as("league"),
    col("resp.league.id").as("league_id"),
    col("resp.league.country").as("country"),
    coalesce(col("resp.fixture.venue.name"), lit("TBD")).as("venue"))
}
