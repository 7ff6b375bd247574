package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityAudit: class sizes, diversity, and both flags on a " +
      "hand corpus") {
    // class (a,x): 5 rows but all sensitive 's1' — k-anon, NOT l-diverse
    // class (a,y): 3 rows, 2 sensitive values — l-diverse, NOT k-anon
    // class (b,x): 6 rows, 3 values — passes both
    val rows =
      Seq.fill(5)(("a", "x", "s1")) ++
      Seq(("a", "y", "s1"), ("a", "y", "s2"), ("a", "y", "s2")) ++
      (0 until 6).map(i => ("b", "x", s"s${i % 3}"))
    val df = rows.toDF("q1", "q2", "s")
    val out = Privacy.kAnonymityAudit(df,
        Seq(col("q1"), col("q2")), col("s"), k = 5, l = 2)
      .as[(String, String, Long, Long, Boolean, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out(("a", "x")) === (("a", "x", 5L, 1L, true, false)))
    assert(out(("a", "y")) === (("a", "y", 3L, 2L, false, true)))
    assert(out(("b", "x")) === (("b", "x", 6L, 3L, true, true)))
  }
}
