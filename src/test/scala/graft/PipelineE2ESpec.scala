package graft

import java.sql.Timestamp
import graft.operators._
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Whole-pipeline integration: the reference's cron loop (scan fixtures →
  * derive jobs → collect payloads → resolve names → flatten → warehouse →
  * analytics → reports) executed end-to-end through the engine's own
  * operators, nothing mocked except the two marked seams (HTTP fetch in the
  * DSv2 source; payload synthesis standing in for the odds API response).
  */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  test("scan → jobs → collect → resolve → flatten → warehouse → report") {
    val now = Timestamp.valueOf("2024-08-01 00:00:00")

    // 1. fixture scan via the DSv2 source (S1)
    val fixtures = spark.read.format("rest-fixtures")
      .option("leagues", "39,140").option("days", "2")
      .option("startDate", "2024-08-01").load()
      .filter(col("status") === "NS") // P7: upcoming only
    assert(fixtures.count() > 0)

    // 2. derive the phased job queue (ST2) and check merge semantics (J8)
    val fx = fixtures.select(col("fixture_id"),
        col("kickoff_utc"), lit("highest").as("priority"))
      .as[Fixture]
    val jobs = JobQueue.deriveJobs(fx, now)(spark)
    assert(jobs.count() > 0)
    val queue = JobQueue.merge(
      jobs.toDF().limit(0), jobs.toDF(), now) // empty existing queue
    assert(queue.count() === jobs.count())

    // 3. synthesize collected payloads for the due fixtures (the odds-API
    //    seam) — names intentionally perturbed so resolution has work to do
    val payloads = fixtures.limit(5).select(
      col("fixture_id"),
      struct(
        concat(lit("Team FC "), col("home_team_id")).as("home_team"),
        concat(lit("Team "), col("away_team_id")).as("away_team"))
        .as("game_info"),
      struct(
        lit(null).cast("string").as("id"),
        lit(null).cast("string").as("sport_key"),
        lit(null).cast("string").as("sport_title"),
        lit(null).cast("string").as("commence_time"),
        concat(lit("Team "), col("home_team_id")).as("home_team"),
        concat(lit("Team "), col("away_team_id")).as("away_team"),
        array(struct(lit("bk").as("key"), lit("BK").as("title"),
          lit(null).cast("string").as("last_update"),
          array(struct(lit("h2h").as("key"),
            lit(null).cast("string").as("last_update"),
            array(
              struct(concat(lit("Team "), col("home_team_id")).as("name"),
                lit(2.1).as("price"), lit(null).cast("double").as("point")),
              struct(lit("Draw").as("name"), lit(3.4).as("price"),
                lit(null).cast("double").as("point")),
              struct(concat(lit("Team "), col("away_team_id")).as("name"),
                lit(3.2).as("price"), lit(null).cast("double").as("point")))
              .as("outcomes"))).as("markets"))).as("bookmakers"))
        .as("event"))

    // 4. entity resolution stamps _mapping_metadata (F11); "Team FC 7" must
    //    map to "Team 7" via the FC-stripping normalizer
    val enhanced = OddsCollect.enhanceWithMapping(payloads)
    val metas = enhanced.select(col("_mapping_metadata")).collect()
    assert(metas.nonEmpty)
    metas.foreach { r =>
      val m = r.getStruct(0)
      assert(m.getAs[Boolean]("game_matched"), s"unmatched: $m")
      assert(m.getStruct(m.fieldIndex("home_mapping"))
        .getAs[String]("strategy_used") === "normalized_matching")
    }

    // 5. flatten to odds_history rows (N2) and write the warehouse (S5)
    val odds = OddsPipeline.flattenOdds(enhanced
      .withColumn("collected_at", lit(now))
      .withColumn("collection_phase", lit("early_odds")))
    assert(odds.count() === payloads.count()) // 1 bookmaker × 1 market each
    assert(odds.filter(col("home_odds") === 2.1).count() === odds.count())
    val wh = java.nio.file.Files.createTempDirectory("e2e_wh").toString
    Sources.writeWarehouse(odds, wh, "collected_at", Seq("fixture_id"))

    // 6. analytics over the warehouse: latest odds per fixture (W1) and a
    //    health report over the queue (A9)
    val stored = spark.read.parquet(wh)
    val latest = Windows.latestPerGroup(stored,
      Seq("fixture_id", "bookmaker", "market_type"),
      "collected_at", "collection_phase")
    assert(latest.count() === odds.count())
    val health = Reports.healthStatus(
      JobQueue.markDue(queue, now).select(col("status")), now).head
    // a just-created queue has all jobs pending — with >50 of them the
    // backlog threshold correctly reports "issues" (yml:508-518 semantics)
    assert(health.getAs[Long]("pending") === queue.count())
    assert(health.getAs[String]("status") ===
      (if (queue.count() > 50) "issues" else "healthy"))
  }
}
