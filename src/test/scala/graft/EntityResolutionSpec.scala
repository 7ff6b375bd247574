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

  test("alternatives order: documented deviation from reference iteration order") {
    // The reference collects word/substring alternatives in LOOP order,
    // appending a displaced best at its displacement time
    // (enhanced_mapping.py:545-553); this engine documents a deliberate
    // deviation (EntityResolution.alternativesFloor scaladoc): runner-ups
    // sorted by (score desc, cand_ord asc). This golden pins BOTH orders on
    // a case where they differ, so any drift in either contract is caught.
    val api = "alpha beta gamma"
    val cands = Seq(
      "alpha beta gamma delta",        // jac 3/4 → 0.525  (first best)
      "alpha beta",                    // jac 2/3 → 0.467  (alt)
      "alpha beta gamma epsilon zeta", // jac 3/5 → 0.42   (alt)
      "beta gamma alpha")              // jac 1   → 0.7    (displaces best)

    // golden of the REFERENCE loop (word-based strategy collection order)
    def refWordAlternatives(apiName: String, odds: Seq[String]): Seq[String] = {
      val aw = apiName.split("\\s+").toSet
      var best = ""; var bestConf = 0.0
      val alts = scala.collection.mutable.ArrayBuffer[String]()
      odds.foreach { o =>
        val ow = o.split("\\s+").toSet
        val conf =
          if (aw.nonEmpty && ow.nonEmpty && aw.union(ow).nonEmpty)
            aw.intersect(ow).size.toDouble / aw.union(ow).size * 0.7
          else 0.0
        if (conf > bestConf && conf > 0.3) {
          if (best.nonEmpty) alts += best
          best = o; bestConf = conf
        } else if (conf > 0.3) alts += o
      }
      alts.take(3).toSeq
    }
    assert(refWordAlternatives(api, cands) === Seq(
      "alpha beta", "alpha beta gamma epsilon zeta", "alpha beta gamma delta"))

    // this engine: same alternatives SET, (score desc, ord asc) ORDER
    val names = Seq(api).toDF("api_name")
    val candDf = cands.zipWithIndex.map { case (c, i) => (c, i.toLong) }
      .toDF("cand", "cand_ord")
    val r = EntityResolution.resolve(names, "api_name", candDf, "cand",
      "cand_ord", withAlternatives = true).head
    assert(r.getAs[String]("strategy_used") === "word_based_matching")
    assert(r.getAs[String]("matched_name") === "beta gamma alpha")
    assert(r.getSeq[String](r.fieldIndex("alternatives")) === Seq(
      "alpha beta gamma delta", "alpha beta", "alpha beta gamma epsilon zeta"))
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
