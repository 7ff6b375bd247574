package graft

import graft.functions.Similarity
import org.apache.spark.sql.functions._

class SimilarityPrefilterRuleSpec extends SparkSpec {
  import spark.implicits._

  test("optimizer injects the length-ratio guard before ro_similarity") {
    val a = Seq("abcdefgh", "ab").toDF("a")
    val b = Seq("abcdefgx", "abcdefghijklmnopqrstuvwxyz").toDF("b")
    val q = a.crossJoin(b)
      .filter(Similarity.roSimilarity(col("a"), col("b")) >= 0.8)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("least"),
      s"expected injected length guard in:\n$optimized")
    // semantics preserved: only the near pair survives
    val rows = q.select("a", "b").as[(String, String)].collect().toSet
    assert(rows === Set(("abcdefgh", "abcdefgx")))
  }

  test("guard can never drop a pair the similarity would accept") {
    // bound: ratio <= 2*min/(min+max); equal pair at the boundary
    val df = Seq(("abcd", "abcd")).toDF("a", "b")
      .filter(Similarity.roSimilarity(col("a"), col("b")) >= 1.0)
    assert(df.count() === 1)
  }

  test("an unrelated least() in the condition does not disable the guard") {
    val a = Seq("abcdefgh", "ab").toDF("a")
    val b = Seq("abcdefgx", "abcdefghijklmnopqrstuvwxyz").toDF("b")
    val q = a.crossJoin(b)
      .filter(least(length(col("a")), lit(100)) > 0 &&
        Similarity.roSimilarity(col("a"), col("b")) >= 0.8)
    val optimized = q.queryExecution.optimizedPlan.toString
    // the injected guard divides 2*least(len,len) by (len+len) — the
    // unrelated least() above has no Divide, so this distinguishes them
    assert(optimized.contains("/"),
      s"guard missing despite unrelated least():\n$optimized")
    val rows = q.select("a", "b").as[(String, String)].collect().toSet
    assert(rows === Set(("abcdefgh", "abcdefgx")))
  }

  test("mirrored literal <= sim form also gains the guard") {
    val a = Seq("abcdefgh", "ab").toDF("a")
    val b = Seq("abcdefgx", "abcdefghijklmnopqrstuvwxyz").toDF("b")
    val q = a.crossJoin(b)
      .filter(lit(0.8) <= Similarity.roSimilarity(col("a"), col("b")))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("least"),
      s"expected injected length guard in:\n$optimized")
    val rows = q.select("a", "b").as[(String, String)].collect().toSet
    assert(rows === Set(("abcdefgh", "abcdefgx")))
  }

  test("manually conjoined lengthPrefilter keeps its own guard (idempotent, no dupes)") {
    val a = Seq("abcdefgh", "ab").toDF("a")
    val b = Seq("abcdefgx", "abcdefghijklmnopqrstuvwxyz").toDF("b")
    val q = a.crossJoin(b)
      .filter(Similarity.lengthPrefilter(col("a"), col("b"), 0.8) &&
        Similarity.roSimilarity(col("a"), col("b")) >= 0.8)
    val rows = q.select("a", "b").as[(String, String)].collect().toSet
    assert(rows === Set(("abcdefgh", "abcdefgx")))
  }
}
