package graft

import java.sql.Timestamp
import graft.operators.MappingStore
import org.apache.spark.sql.functions._

class MappingStoreSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  val learnedCols = Seq("api_football_name", "odds_api_name", "confidence",
    "strategy_used", "league_context", "created_at", "verified")

  test("learnFrom keeps only successful high-confidence attempts") {
    val attempts = Seq(
      ("A", "A'", 0.95, "manual_mapping", true, "epl", ts("2024-01-01 00:00:00")),
      ("B", "B'", 0.70, "word_based_matching", true, "epl", ts("2024-01-01 00:00:00")),
      ("C", null.asInstanceOf[String], 0.2, "fuzzy_matching", false, "epl",
        ts("2024-01-01 00:00:00")))
      .toDF("api_football_name", "odds_api_name", "confidence",
        "strategy_used", "success", "league_context", "attempted_at")
    val learned = MappingStore.learnFrom(attempts).collect()
    assert(learned.map(_.getAs[String]("api_football_name")).toSeq === Seq("A"))
  }

  test("upsertLearned: newest wins; updates beat existing on created_at tie") {
    val existing = Seq(
      ("A", "old", 0.9, "manual_mapping", "epl", ts("2024-01-01 00:00:00"), false),
      ("B", "keep", 0.9, "manual_mapping", "epl", ts("2024-01-02 00:00:00"), false))
      .toDF(learnedCols: _*)
    val updates = Seq(
      ("A", "new", 0.95, "manual_mapping", "epl", ts("2024-01-01 00:00:00"), false))
      .toDF(learnedCols: _*)
    val out = MappingStore.upsertLearned(existing, updates)
      .select("api_football_name", "odds_api_name").as[(String, String)]
      .collect().toMap
    assert(out === Map("A" -> "new", "B" -> "keep"))
  }

  test("applyFeedback verifies correct pairs and deletes wrong ones") {
    val learned = Seq(
      ("A", "A'", 0.9, "learned_mapping", "epl", ts("2024-01-01 00:00:00"), false),
      ("B", "WRONG", 0.9, "learned_mapping", "epl", ts("2024-01-01 00:00:00"), false))
      .toDF(learnedCols: _*)
    val feedback = Seq(
      ("A", "A'", "epl", true),
      ("B", "WRONG", "epl", false))
      .toDF("api_football_name", "odds_api_name", "league_context", "is_correct")
    val out = MappingStore.applyFeedback(learned, feedback,
      ts("2024-02-01 00:00:00")).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("api_football_name") === "A")
    assert(out.head.getAs[Boolean]("verified"))
    assert(out.head.getAs[Double]("confidence") === 1.0)
  }

  test("loadForResolver filter: verified OR confidence > 0.9") {
    val learned = Seq(
      ("A", "A'", 0.95, "x", "epl", ts("2024-01-01 00:00:00"), false),
      ("B", "B'", 0.85, "x", "epl", ts("2024-01-01 00:00:00"), true),
      ("C", "C'", 0.85, "x", "epl", ts("2024-01-01 00:00:00"), false))
      .toDF(learnedCols: _*)
    val out = MappingStore.loadForResolver(learned)
      .select("api_name").as[String].collect().sorted
    assert(out.toSeq === Seq("A", "B"))
  }

  test("strategyReport and topFailures shapes") {
    val attempts = Seq(
      ("A", "A'", 0.95, "manual_mapping", true, "epl", ts("2024-01-10 00:00:00")),
      ("B", "B'", 0.85, "manual_mapping", true, "epl", ts("2024-01-11 00:00:00")),
      ("C", null.asInstanceOf[String], 0.2, "fuzzy_matching", false, "epl",
        ts("2024-01-12 00:00:00")),
      ("C", null.asInstanceOf[String], 0.25, "fuzzy_matching", false, "epl",
        ts("2024-01-13 00:00:00")),
      ("old", "O'", 0.99, "manual_mapping", true, "epl", ts("2023-01-01 00:00:00")))
      .toDF("api_football_name", "odds_api_name", "confidence",
        "strategy_used", "success", "league_context", "attempted_at")
    val rep = MappingStore.strategyReport(attempts, ts("2024-01-01 00:00:00"))
      .collect()
    assert(rep.head.getAs[String]("strategy_used") === "manual_mapping")
    assert(rep.head.getAs[Long]("successes") === 2L)
    assert(rep.head.getAs[Double]("avg_confidence") === 0.9)
    val fails = MappingStore.topFailures(attempts, ts("2024-01-01 00:00:00"), 5)
      .collect()
    assert(fails.length === 1)
    assert(fails.head.getAs[String]("api_football_name") === "C")
    assert(fails.head.getAs[Long]("failures") === 2L)
  }
}
