package graft

import graft.functions.Normalize
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  def norm(s: String): String =
    Seq(s).toDF("x").select(Normalize.normalizeName(col("x"))).head.getString(0)

  test("golden normalizations (reference rule semantics)") {
    assert(norm("FC Barcelona") === "barcelona")
    assert(norm("Manchester United") === "manchester utd")
    assert(norm("  Borussia   Mönchengladbach ") === "borussia monchengladbach")
    assert(norm("Tottenham Hotspur") === "tottenham")
    assert(norm("Brighton & Hove Albion") === "brighton and hove albion")
    assert(norm("Atlético Madrid") === "atletico madrid")
    assert(norm("fc BARCELONA cf") === "barcelona") // case-insensitive rules
    assert(norm("") === "")
  }

  test("idempotence: normalize(normalize(x)) == normalize(x)") {
    val names = Seq("FC Barcelona", "São Paulo FC", "Club Atlético",
      "A&B United  SC", "Olympique Lyonnais")
    names.foreach { n => assert(norm(norm(n)) === norm(n)) }
  }

  test("jaccard words: bounds, symmetry cases") {
    def jac(a: String, b: String): Double =
      Seq((a, b)).toDF("a", "b")
        .select(Normalize.jaccardWords(col("a"), col("b"))).head.getDouble(0)
    assert(jac("real madrid", "madrid real") === 1.0)
    assert(jac("a b c", "a b d") === 0.5)
    assert(jac("abc", "xyz") === 0.0)
    assert(jac("", "abc") === 0.0)
  }

  test("season derivation: Aug 1 boundary") {
    val df = Seq("2024-07-31", "2024-08-01").toDF("d")
      .select(Normalize.seasonOf(to_date(col("d"))))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(2023, 2024))
  }
}
