package graft

import graft.operators.EntityResolution
import org.apache.spark.sql.functions._

/** The six golden mapping cases from the reference's demo
  * (demo_enhanced_pipeline.py:37-44, FIXTURES.md §4). */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  val manual = Seq(
    ("Manchester United", "Manchester Utd"),
    ("FC Barcelona", "Barcelona"),
    ("Paris Saint Germain", "PSG"),
    ("Borussia Monchengladbach", "B. Monchengladbach"))
    .toDF("api_name", "target")

  def resolve(name: String, cands: Seq[String]) = {
    val names = Seq(name).toDF("api_name")
    val candDf = cands.zipWithIndex.toDF("cand", "cand_ord")
    EntityResolution.resolve(names, "api_name", candDf, "cand", "cand_ord",
      manual = Some(manual)).head
  }

  test("Manchester United → Manchester Utd (manual, 0.95)") {
    val r = resolve("Manchester United",
      Seq("Manchester Utd", "Manchester City", "Liverpool"))
    assert(r.getAs[String]("matched_name") === "Manchester Utd")
    assert(r.getAs[String]("strategy_used") === "manual_mapping")
    assert(r.getAs[Double]("confidence") === 0.95)
    assert(r.getAs[Boolean]("match_found"))
  }

  test("Bayern Munich → exact match 1.0") {
    val r = resolve("Bayern Munich", Seq("Bayern Munich", "Dortmund", "RB Leipzig"))
    assert(r.getAs[String]("matched_name") === "Bayern Munich")
    assert(r.getAs[String]("strategy_used") === "exact_match")
    assert(r.getAs[Double]("confidence") === 1.0)
  }

  test("FC Barcelona → Barcelona (manual beats normalized)") {
    val r = resolve("FC Barcelona", Seq("Barcelona", "Real Madrid", "Atletico Madrid"))
    assert(r.getAs[String]("matched_name") === "Barcelona")
    assert(r.getAs[String]("strategy_used") === "manual_mapping")
  }

  test("Paris Saint Germain → PSG (manual)") {
    val r = resolve("Paris Saint Germain", Seq("PSG", "Marseille", "Lyon"))
    assert(r.getAs[String]("matched_name") === "PSG")
    assert(r.getAs[String]("strategy_used") === "manual_mapping")
  }

  test("Borussia Monchengladbach → B. Monchengladbach (manual)") {
    val r = resolve("Borussia Monchengladbach",
      Seq("B. Monchengladbach", "Dortmund", "Schalke"))
    assert(r.getAs[String]("matched_name") === "B. Monchengladbach")
    assert(r.getAs[String]("strategy_used") === "manual_mapping")
  }

  test("Unknown Team FC → no match (fuzzy fallback below floor)") {
    val r = resolve("Unknown Team FC", Seq("Team A", "Team B", "Team C"))
    assert(!r.getAs[Boolean]("match_found"))
    assert(r.getAs[String]("strategy_used") === "fuzzy_matching")
    assert(r.getAs[Double]("confidence") < 0.3)
  }

  test("normalized strategy without manual entry") {
    val names = Seq("Manchester United").toDF("api_name")
    val candDf = Seq(("Manchester Utd", 0)).toDF("cand", "cand_ord")
    val r = EntityResolution.resolve(names, "api_name", candDf, "cand",
      "cand_ord").head
    // United→Utd normalization rule makes the two names equal
    assert(r.getAs[String]("strategy_used") === "normalized_matching")
    assert(r.getAs[Double]("confidence") === 0.85)
  }

  test("alternatives: fuzzy runner-ups in (score desc, order asc) order") {
    val names = Seq("Unknown Team FC").toDF("api_name")
    val candDf = Seq(("Team A", 0), ("Team B", 1), ("Team C", 2))
      .toDF("cand", "cand_ord")
    val r = EntityResolution.resolve(names, "api_name", candDf, "cand",
      "cand_ord", withAlternatives = true).head
    assert(r.getAs[String]("strategy_used") === "fuzzy_matching")
    // all three candidates tie on similarity; best = Team A (order), so
    // alternatives are the remaining two in candidate order
    assert(r.getSeq[String](r.fieldIndex("alternatives")) ===
      Seq("Team B", "Team C"))
  }

  test("alternatives empty for deterministic strategies") {
    val names = Seq("Bayern Munich").toDF("api_name")
    val candDf = Seq(("Bayern Munich", 0), ("Dortmund", 1))
      .toDF("cand", "cand_ord")
    val r = EntityResolution.resolve(names, "api_name", candDf, "cand",
      "cand_ord", withAlternatives = true).head
    assert(r.getAs[String]("strategy_used") === "exact_match")
    assert(r.getSeq[String](r.fieldIndex("alternatives")).isEmpty)
  }

  test("tie-break: earliest candidate wins on equal score") {
    val names = Seq("Alpha Beta").toDF("api_name")
    // both candidates normalize-match; candidate order decides
    val candDf = Seq(("alpha beta", 7), ("ALPHA BETA", 3)).toDF("cand", "cand_ord")
    val r = EntityResolution.resolve(names, "api_name", candDf, "cand",
      "cand_ord").head
    assert(r.getAs[String]("matched_name") === "ALPHA BETA")
  }
}
