package graft

import graft.operators.{Dsir, Perceptron}
import org.apache.spark.sql.functions._

class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  test("separable vocabularies are separated after a few rounds") {
    val docs = (
      (0L until 8L).map(i => (i, "alpha beta alpha", "en")) ++
      (8L until 16L).map(i => (i, "gamma delta gamma", "fr")))
      .toDF("doc_id", "text", "lang")
    val w = Perceptron.train(docs, "doc_id", "text",
      col("lang") === "en", nBuckets = 32, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // score each doc with the learned weights, in-JVM
    val bucket = (word: String) => Seq(word).toDF("w")
      .select(Dsir.bucketOf(col("w"), 32)).head().getLong(0)
    def score(words: Seq[String]): Long =
      words.map(t => w(bucket(t))).sum + w(-1L)
    assert(score(Seq("alpha", "beta", "alpha")) > 0)
    assert(score(Seq("gamma", "delta", "gamma")) < 0)
  }

  test("zero rounds leave zero weights; update is y-signed") {
    val docs = Seq((0L, "alpha", "en"), (1L, "beta", "fr"))
      .toDF("doc_id", "text", "lang")
    val w0 = Perceptron.train(docs, "doc_id", "text",
      col("lang") === "en", nBuckets = 8, iters = 0)
      .collect().map(_.getLong(1))
    assert(w0.forall(_ === 0L))
    // one round from zero weights: every doc has score 0 ≤ 0 →
    // misclassified; gradient = y·x for both docs
    val w1 = Perceptron.train(docs, "doc_id", "text",
      col("lang") === "en", nBuckets = 8, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ba = Seq("alpha").toDF("w")
      .select(Dsir.bucketOf(col("w"), 8)).head().getLong(0)
    val bb = Seq("beta").toDF("w")
      .select(Dsir.bucketOf(col("w"), 8)).head().getLong(0)
    assert(w1(ba) === 1L)
    assert(w1(bb) === -1L)
    assert(w1(-1L) === 0L) // bias: +1 from doc 0, −1 from doc 1
  }
}
