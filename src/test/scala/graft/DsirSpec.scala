package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("target-vocabulary docs outrank off-target docs") {
    // target docs speak 'alpha beta', raw-only docs speak 'gamma delta';
    // a fresh doc in target vocab must score above one in raw-only vocab
    val docs = (
      (0L until 10L).map(i => (i, "alpha beta alpha beta", "en")) ++
      (10L until 20L).map(i => (i, "gamma delta gamma delta", "fr")) ++
      Seq((100L, "alpha beta", "fr"), (101L, "gamma delta", "fr")))
      .toDF("doc_id", "text", "lang")
    val out = Dsir.topKByImportance(docs, "doc_id", "text",
      col("lang") === "en", nBuckets = 128, k = 30)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(100L) > out(101L))
    // every pure-target doc outranks every pure-raw doc
    assert((0L until 10L).map(out).min > (10L until 20L).map(out).max)
  }

  test("bucketOf lands in range and is deterministic") {
    val words = Seq("alpha", "beta", "gamma", "Straße", "东京").toDF("w")
    val b1 = words.select(Dsir.bucketOf(col("w"), 128).as("b"))
      .collect().map(_.getLong(0))
    val b2 = words.select(Dsir.bucketOf(col("w"), 128).as("b"))
      .collect().map(_.getLong(0))
    assert(b1.toSeq === b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 128))
  }
}
