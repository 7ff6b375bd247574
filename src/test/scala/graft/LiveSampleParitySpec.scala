package graft

import graft.operators.{OddsCollect, OddsPipeline}
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Parity against the reference's OWN recorded output: the live collection
  * sample `data/early_odds_1390826_20250818_190818.json` ships the raw
  * Odds-API payload AND the `_mapping_metadata` the reference's cascade
  * produced for it. Running the engine over the same file must reproduce
  * those numbers bit-for-bit — the strongest end-to-end evidence available
  * that this engine matches the reference on real data, not just on
  * synthetic harnesses. */
class LiveSampleParitySpec extends SparkSpec {
  import spark.implicits._

  val sample =
    "/root/reference/data/early_odds_1390826_20250818_190818.json"

  test("S1/S3: the live payload reads through the declared schema") {
    val p = Sources.readPayloads(spark, sample)
    val row = p.head
    assert(row.getAs[Long]("fixture_id") === 1390826L)
    val gi = row.getStruct(row.fieldIndex("game_info"))
    assert(gi.getAs[String]("home_team") === "Real Madrid")
    assert(gi.getAs[String]("away_team") === "Osasuna")
    assert(gi.getAs[String]("league") === "La Liga")
  }

  test("N2: flattenOdds reproduces the sample's h2h prices per bookmaker") {
    val p = Sources.readPayloads(spark, sample)
    val parsed = p.select(col("fixture_id"),
      lit(null).cast("timestamp").as("collected_at"),
      col("collection_type").as("collection_phase"),
      col("data.odds_early").as("event"))
    val flat = OddsPipeline.flattenOdds(parsed)
      .filter(col("market_type") === "h2h")
    val rows = flat.select("bookmaker", "home_odds", "draw_odds", "away_odds")
      .as[(String, Double, Double, Double)].collect()
    // 36 bookmakers, but Nordic Bet carries only a totals market → 35 h2h
    assert(rows.length === 35)
    val sportsbet = rows.find(_._1 == "SportsBet").get
    // outcome names in the file: home 'Real Madrid' 1.18, 'Draw' 6.5,
    // away 'CA Osasuna' 12.0 — away resolves via the event's away_team name
    assert(sportsbet._2 === 1.18)
    assert(sportsbet._3 === 6.5)
    assert(sportsbet._4 === 12.0)
  }

  test("S3/ST2: deriveJobs reproduces the reference's live 56-job queue") {
    import graft.operators.{Fixture, JobQueue}
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val path = "/root/reference/jobs.json"
    // S3: the declared schema reads the live file
    val jobs = Sources.readJobs(spark, path)
    assert(jobs.count() === 56) // 14 fixtures x 4 phases (BASELINE.md)
    assert(jobs.filter(col("scheduled_for").isNull).count() === 0)
    // ST2: re-derive the queue from the file's own game_info fixtures —
    // id, schedule, phase, and priority must all reproduce
    val giSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("game_info",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("fixture_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("kickoff_utc",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("priority",
            org.apache.spark.sql.types.StringType))))))
    val fixtures = spark.read.schema(giSchema)
      .option("multiLine", true).json(path)
      .select(col("game_info.fixture_id").as("fixture_id"),
        to_timestamp(col("game_info.kickoff_utc")).as("kickoff_utc"),
        col("game_info.priority").as("priority"))
      .distinct()
      .as[Fixture]
    assert(fixtures.count() === 14)
    val now = java.sql.Timestamp.valueOf("2025-08-20 08:34:42")
    val derived = JobQueue.deriveJobs(fixtures, now)
      .map(j => (j.id, j.scheduled_for.toString.stripSuffix(".0"),
        j.job_type, j.priority))
      .collect().toSet
    val recorded = jobs
      .select(col("id"), col("scheduled_for").cast("string"),
        col("type"), col("priority"))
      .as[(String, String, String, String)].collect().toSet
    assert(derived === recorded)
  }

  test("F11: enhanceWithMapping reproduces the reference's recorded cascade output") {
    val p = Sources.readPayloads(spark, sample)
      .select(col("fixture_id"), col("game_info"),
        col("data.odds_early").as("event"))
    val out = OddsCollect.enhanceWithMapping(p).head
    val meta = out.getStruct(out.fieldIndex("_mapping_metadata"))
    val home = meta.getStruct(meta.fieldIndex("home_mapping"))
    val away = meta.getStruct(meta.fieldIndex("away_mapping"))
    // recorded by the reference in the file itself:
    //   home: exact_match, 1.0, 'Real Madrid'
    //   away: fuzzy_matching, 0.4941176470588235, 'CA Osasuna', found
    assert(home.getAs[String]("strategy_used") === "exact_match")
    assert(home.getAs[Double]("confidence") === 1.0)
    assert(home.getAs[String]("odds_api_name") === "Real Madrid")
    assert(away.getAs[String]("strategy_used") === "fuzzy_matching")
    assert(away.getAs[Double]("confidence") === 0.4941176470588235)
    assert(away.getAs[String]("odds_api_name") === "CA Osasuna")
    assert(away.getAs[Boolean]("match_found"))
    assert(meta.getAs[Boolean]("game_matched"))
  }
}
