package graft

import graft.functions.Normalize
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated property coverage promised in SURVEY.md §5:
  * normalizer idempotence + case invariance, Jaccard symmetry + bounds —
  * over seeded random name-like strings (rule words, accents, noisy
  * whitespace), evaluated through the REAL Catalyst expressions in one
  * DataFrame pass. */
class NormalizePropertySpec extends SparkSpec {
  import spark.implicits._

  private val token: Gen[String] = Gen.oneOf(
    Gen.oneOf("FC", "CF", "AC", "SC", "Club", "United", "Olympique",
      "Hotspur", "Sporting", "&"),
    Gen.oneOf("Real", "Madrid", "Atlético", "München", "São", "Köln",
      "Saint-Étienne", "Alavés", "Nîmes"),
    Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString))

  private val name: Gen[String] = for {
    n <- Gen.choose(1, 6)
    toks <- Gen.listOfN(n, token)
    seps <- Gen.listOfN(n + 1, Gen.oneOf(" ", "  ", "   ", ""))
  } yield seps.zipAll(toks, "", "").map { case (s, t) => s + t }.mkString

  private def samples(count: Int, seed: Long): Seq[String] =
    Gen.listOfN(count, name)(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  test("normalizer: idempotent and case-invariant on 300 random names") {
    val rows = samples(300, 42L)
      .map(s => (s, s.toUpperCase(java.util.Locale.ROOT)))
    val df = rows.toDF("x", "xu")
      .select(
        Normalize.normalizeName(col("x")).as("n1"),
        Normalize.normalizeName(Normalize.normalizeName(col("x"))).as("n2"),
        Normalize.normalizeName(col("xu")).as("nu"))
    df.collect().foreach { r =>
      assert(r.getString(0) === r.getString(1), "not idempotent")
      assert(r.getString(0) === r.getString(2), "not case-invariant")
    }
  }

  test("word Jaccard: symmetric and bounded on 300 random pairs") {
    val xs = samples(300, 7L)
    val ys = samples(300, 8L)
    val df = xs.zip(ys).toDF("a", "b")
      .select(
        Normalize.jaccardWords(col("a"), col("b")).as("jab"),
        Normalize.jaccardWords(col("b"), col("a")).as("jba"),
        Normalize.jaccardWords(col("a"), col("a")).as("jaa"),
        Normalize.normalizeName(col("a")).as("na"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1), "not symmetric")
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0, "out of bounds")
      // self-similarity is 1 whenever any word survives normalization
      if (r.getString(3).trim.nonEmpty) assert(r.getDouble(2) === 1.0)
    }
  }
}
