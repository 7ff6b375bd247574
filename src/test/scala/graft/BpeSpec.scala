package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: weighted counts, lexicographic ties, greedy rewrite") {
    // words: low x3, lower x2, newest x1
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val out = Bpe.learnMerges(docs, "text", numMerges = 3)
      .as[(Long, String, String, Long, String)].collect().toSeq
    // r1: (l,o) and (o,w) both 5 — tie breaks to the lex-smaller left
    // r2: (lo,w) 5; r3: (low,e) and (e,r) both 2 — "e" < "low"
    assert(out === Seq(
      (1L, "l", "o", 5L, "lo"),
      (2L, "lo", "w", 5L, "low"),
      (3L, "e", "r", 2L, "er")))
  }

  test("learnMerges: overlapping pairs count fully, greedy merge is non-overlapping") {
    val docs = Seq("aaaa").toDF("text")
    val out = Bpe.learnMerges(docs, "text", numMerges = 5)
      .as[(Long, String, String, Long, String)].collect().toSeq
    // "aaaa" has three (a,a) occurrences but merges to [aa, aa] (greedy
    // left-to-right), so round 2 sees ONE (aa,aa); round 3 has no pairs
    // left and training stops early
    assert(out === Seq(
      (1L, "a", "a", 3L, "aa"),
      (2L, "aa", "aa", 1L, "aaaa")))
  }

  test("encodeTopK: counts subwords of the merged word table") {
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val out = Bpe.encodeTopK(docs, "text", numMerges = 3, k = 10)
      .as[(Long, String, Long)].collect().toSeq
    // merges: lo, low, er → words are [low]x3, [low,er]x2,
    // [n,e,w,e,s,t]x1; counts: low 5, er 2, e 2, n/w/s/t 1
    assert(out === Seq(
      (1L, "low", 5L),
      (2L, "e", 2L),
      (3L, "er", 2L),
      (4L, "n", 1L),
      (5L, "s", 1L),
      (6L, "t", 1L),
      (7L, "w", 1L)))
  }

  test("learnMerges: deterministic across repartitionings") {
    val docs = (0 until 200).map(i => s"tok${i % 7} tok${i % 3} shared")
      .toDF("text")
    val a = Bpe.learnMerges(docs, "text", 8).collect().toSeq
    val b = Bpe.learnMerges(docs.repartition(13), "text", 8).collect().toSeq
    assert(a === b)
  }
}
