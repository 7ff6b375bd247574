package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  lazy val keys = (0L until 10000L).toDF("id")

  test("deterministicSample: rate accurate, reproducible, monotone in rate") {
    val n20 = Sampling.deterministicSample(keys, "id", 200).count()
    assert(math.abs(n20 - 2000.0) / 2000.0 < 0.1) // md5 is uniform
    // exact reproducibility: same rows both times
    val a = Sampling.deterministicSample(keys, "id", 200)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(keys, "id", 200)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    // nested samples: raising the rate only ADDS rows (same salt) — the
    // property that makes ablation subsets comparable
    val big = Sampling.deterministicSample(keys, "id", 500)
      .collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(big))
    // edges
    assert(Sampling.deterministicSample(keys, "id", 1000).count() === 10000L)
    assert(Sampling.deterministicSample(keys, "id", 0).count() === 0L)
    // independent salts decorrelate
    val other = Sampling.deterministicSample(keys, "id", 200, salt = "other")
      .collect().map(_.getLong(0)).toSet
    assert(a !== other)
  }

  test("mixSample applies per-stratum rates, matching keepHash per stratum") {
    val rows = (0L until 3000L).map(i =>
      (i, Seq("en", "de", "xx")(i.toInt % 3))).toDF("id", "stratum")
    val out = Sampling.mixSample(rows, "id", "stratum",
      rates = Map("en" -> 1000, "de" -> 0), defaultPermille = 300,
      salt = "s")
    val byStratum = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("en") === 1000L)            // all kept
    assert(!byStratum.contains("de"))            // none kept
    val xx = byStratum("xx")
    assert(math.abs(xx - 300.0) / 300.0 < 0.25)
    // per-stratum decision identical to the single-rate primitive
    val expected = rows.filter(col("stratum") === "xx")
      .filter(Sampling.keepHash(col("id"), 300, "s"))
      .collect().map(_.getLong(0)).toSet
    val got = out.filter(col("stratum") === "xx")
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("packChunks: budget boundaries, oversized docs, per-partition packing") {
    val docs = Seq(
      // lang a: 30+30+30 end inside block 0 (budget 100); 50 ends at 140
      (0L, "a", Seq.fill(30)("w").mkString(" ")),
      (1L, "a", Seq.fill(30)("w").mkString(" ")),
      (2L, "a", Seq.fill(30)("w").mkString(" ")),
      (3L, "a", Seq.fill(50)("w").mkString(" ")),
      // lang b: an oversized doc lands in the block where it ENDS (cum 250
      // -> chunk 2), and the next doc (cum 260) shares that block
      (4L, "b", Seq.fill(250)("w").mkString(" ")),
      (5L, "b", Seq.fill(10)("w").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val out = Sampling.packChunks(docs, "lang", "doc_id", "text", budget = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(
      ("a", 0L) -> ((3L, 90L)),
      ("a", 1L) -> ((1L, 50L)),
      ("b", 2L) -> ((2L, 260L))))
  }
}
