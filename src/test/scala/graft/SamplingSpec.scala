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

  test("splitAssign: exact partition of the corpus, stable, rates accurate") {
    val splits = Seq("train" -> 800, "val" -> 100, "test" -> 100)
    val out = Sampling.splitAssign(keys, "id", splits, salt = "split")
      .select(col("id"), col("split")).as[(Long, String)].collect()
    // a partition: every row exactly once, only the named splits
    assert(out.length === 10000)
    assert(out.map(_._1).distinct.length === 10000)
    val byName = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byName.keySet === Set("train", "val", "test"))
    assert(math.abs(byName("train") - 8000.0) / 8000.0 < 0.05)
    assert(math.abs(byName("val") - 1000.0) / 1000.0 < 0.15)
    // stability: re-run assigns identically
    val again = Sampling.splitAssign(keys, "id", splits, salt = "split")
      .select(col("id"), col("split")).as[(Long, String)].collect()
    assert(again.toMap === out.toMap)
    // permilles that don't sum to 1000 are rejected (not silently skewed)
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(keys, "id", Seq("a" -> 500, "b" -> 100))
    }
  }

  test("deterministicShuffle: dense global rank in md5 order, no global sort") {
    val df = Sampling.deterministicShuffle(keys, "id", salt = "shuf")
    val got = df.select(col("id"), col("shuffle_rank"))
      .as[(Long, Long)].collect()
    // dense permutation 1..N
    assert(got.map(_._2).sorted.toSeq === (1L to 10000L))
    // order equals the driver-computed global md5 order
    def m(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(s"shuf:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0L until 10000L).sortBy(id => (m(id), id))
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got.toMap === expected)
    // scale pin: every window sort is partitioned by the shard — the only
    // unpartitioned window runs over the ≤256-row shard-offset table
    val winSpecs = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec
    }
    assert(winSpecs.exists(_.nonEmpty), "per-shard ranking window missing")
  }

  test("tokenBudgetFilter: keeps best-first within budget, per stratum") {
    val docs = Seq(
      // stratum a: lengths 5,4,3,2 tokens (order col = ntok proxy)
      (1L, "a", "t t t t t", 5L),
      (2L, "a", "t t t t", 4L),
      (3L, "a", "t t t", 3L),
      (4L, "a", "t t", 2L),
      // stratum b: one doc over budget alone
      (5L, "b", "t t t t t t t t t t t t", 12L))
      .toDF("doc_id", "src", "text", "quality")
    val out = Sampling.tokenBudgetFilter(docs, "src", "doc_id", "text",
        "quality", budget = 10L)
      .select(col("doc_id"), col("cum_tokens")).as[(Long, Long)]
      .collect().toMap
    // a: 5 + 4 = 9 ≤ 10; adding the 3-token doc would blow the budget
    assert(out === Map(1L -> 5L, 2L -> 9L))
  }

  test("temperatureSample: min stratum kept whole, 4x stratum near sqrt-rate, reproducible") {
    val df = ((0L until 500L).map(i => (i, "small")) ++
      (1000L until 3000L).map(i => (i, "big"))).toDF("id", "grp")
    val kept = Sampling.temperatureSample(df, "id", "grp")
      .select("id", "grp").as[(Long, String)].collect()
    val small = kept.count(_._2 == "small")
    val big = kept.count(_._2 == "big")
    assert(small === 500) // rate 1.0: the smallest stratum keeps everything
    // big stratum rate = sqrt(500/2000) = 0.5; md5 threshold is uniform
    assert(math.abs(big / 2000.0 - 0.5) < 0.05, s"big kept $big of 2000")
    // deterministic: the exact same row set on re-run
    val again = Sampling.temperatureSample(df, "id", "grp")
      .select("id", "grp").as[(Long, String)].collect()
    assert(kept.toSet === again.toSet)
  }

  test("temperatureSample: equal strata all keep rate 1.0") {
    val df = ((0L until 100L).map(i => (i, "a")) ++
      (100L until 200L).map(i => (i, "b"))).toDF("id", "grp")
    assert(Sampling.temperatureSample(df, "id", "grp").count() === 200)
  }

  test("slidingChunks: window/stride offsets, short tails, empty docs skipped") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "   "), (3L, "solo")).toDF("doc_id", "text")
    val out = Sampling.slidingChunks(docs, "doc_id", "text",
        window = 4, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, Long, String)].collect()
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq ===
      Seq((0L, 0L, 4L), (1L, 2L, 4L), (2L, 4L, 4L), (3L, 6L, 4L), (4L, 8L, 2L)))
    assert(d1.head._5 === "t0 t1 t2 t3")
    assert(d1.last._5 === "t8 t9")     // short tail kept
    assert(!out.exists(_._1 == 2L))    // whitespace-only doc: no chunks
    assert(out.filter(_._1 == 3L).map(_._5).toSeq === Seq("solo"))
  }

  test("capPerGroup: caps each group, keeps small groups whole, stable") {
    val df = ((1L to 100L).map(i => (i, "big")) ++
      Seq((200L, "small"), (201L, "small"))).toDF("id", "grp")
    val out = Sampling.capPerGroup(df, "grp", "id", maxPerGroup = 10)
    val byGrp = out.groupBy("grp").count().as[(String, Long)]
      .collect().toMap
    assert(byGrp("big") === 10L)
    assert(byGrp("small") === 2L)
    // determinism: same subset on re-run (pure function of salt+key)
    val again = Sampling.capPerGroup(df, "grp", "id", maxPerGroup = 10)
      .select("id").as[Long].collect().toSet
    assert(out.select("id").as[Long].collect().toSet === again)
    // the kept subset is md5-ranked, not just the lowest ids
    assert(again.filter(_ <= 100L) !== (1L to 10L).toSet)
  }

  test("mixturePlan: binding source caps the mix, allocations hit target shares") {
    // src a: 100 tokens, weight 3; src b: 1000 tokens, weight 1 (Σw=4).
    // caps: a = (4·100·4) div 3 = 533; b = (4·1000·4) div 1 = 16000
    // S = 533 → alloc a = (533·3) div 4 = 399, b = 533 div 4 = 133
    val docs = Seq(
      ("a", Seq.fill(100)("t").mkString(" ")),
      ("b", Seq.fill(1000)("t").mkString(" ")))
      .toDF("source", "text")
    val out = Sampling.mixturePlan(docs, "source", "text",
        when(col("source") === "a", lit(3L)).otherwise(lit(1L)),
        maxEpochs = 4L)
      .as[(String, Long, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 1L, 100L, 3L, 399L, 3.99, true)))
    assert(out("b") === (("b", 1L, 1000L, 1L, 133L, 0.133, false)))
    // the binding source runs at just under maxEpochs; nothing exceeds it
    assert(out.values.forall(_._6 <= 4.0))
  }

  test("leakageSafeSplit: clusters are split-atomic; singletons keep per-doc split") {
    val docs = (0L until 2000L).toDF("doc_id")
    // chain 0-1-4 crosses a naive split boundary (0,1 → train, 4 → test
    // under salt "leak"); transitive closure must hold all three together
    // even though (0,4) is never a pair
    val pairs = Seq((0L, 1L), (1L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val splits = Seq("train" -> 800, "val" -> 100, "test" -> 100)
    val out = Sampling.leakageSafeSplit(docs, pairs, "doc_id", splits,
        salt = "leak")
      .select("doc_id", "canonical_id", "split")
      .as[(Long, Long, String)].collect()
    val byDoc = out.map(r => r._1 -> r).toMap
    assert(out.length === 2000)
    // cluster atomicity: one split for {0,1,2}, one for {10,11}
    assert(Seq(0L, 1L, 4L).map(byDoc(_)._3).distinct.size === 1)
    assert(byDoc(0L)._2 === 0L && byDoc(4L)._2 === 0L) // min-id canonical
    assert(Seq(10L, 11L).map(byDoc(_)._3).distinct.size === 1)
    // the naive per-doc split DOES separate at least one of these
    // clusters — i.e. this operator changed an assignment, not a no-op
    val naive = Sampling.splitAssign(docs, "doc_id", splits, salt = "leak")
      .as[(Long, String)].collect().toMap
    assert(Seq(0L, 1L, 4L).map(naive).distinct.size > 1)
    // singletons: identical to the per-doc assignment (canonical = own id)
    val clustered = Set(0L, 1L, 4L, 10L, 11L)
    out.filterNot(r => clustered(r._1)).foreach { r =>
      assert(r._2 === r._1 && r._3 === naive(r._1))
    }
    // partition: split sizes near 80/10/10
    val sizes = out.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.values.sum === 2000)
    assert(math.abs(sizes("train") - 1600) < 100)
  }

  test("weightedSample: reproducible, weight-monotone in expectation") {
    import graft.operators.Sampling
    val df = (0L until 400L).map(i => (i, if (i < 200) 1L else 50L))
      .toDF("id", "w")
    val s1 = Sampling.weightedSample(df, "id", "w", k = 100)
      .select("id").as[Long].collect().toSeq
    val s2 = Sampling.weightedSample(df.repartition(7), "id", "w", k = 100)
      .select("id").as[Long].collect().toSeq
    assert(s1 === s2) // deterministic across partitionings
    // the 50x-weighted half must dominate the sample
    val heavy = s1.count(_ >= 200L)
    assert(heavy > 80, s"heavy picks: $heavy of 100")
    // equal weights: sample is exactly the k smallest priorities of the
    // pure hash order — i.e., a plain deterministic hash sample
    val eq = (0L until 400L).map(i => (i, 7L)).toDF("id", "w")
    val e1 = Sampling.weightedSample(eq, "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    val e2 = Sampling.weightedSample(eq, "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    assert(e1.subsetOf(e2)) // prefix property of without-replacement
  }

  test("ipfWeights: marginals converge to uniform targets, shard-stable") {
    // correlated 2x2 grid: row A is 90% of mass and col x is 85% —
    // 1-D capping can't fix both; IPF must
    val rows = Seq.fill(80)(("A", "x")) ++ Seq.fill(10)(("A", "y")) ++
      Seq.fill(5)(("B", "x")) ++ Seq.fill(5)(("B", "y"))
    val df = rows.toDF("src", "lang")
    val out = Sampling.ipfWeights(df, "src", "lang", scalings = 3)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out.map(_._3).sum === 100L)
    val t0 = 100L * 1000000L
    // last scaling was a ROW scaling: row marginals hit t0/2 exactly up
    // to per-cell truncation (<1 unit each, 2 cells per row)
    val byRow = out.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    byRow.foreach { case (r, s) =>
      assert(math.abs(s - t0 / 2) <= 2, s"row $r marginal $s") }
    // column marginals: raked from 70% relative error (85/15 split) to
    // under 10% after 3 scalings, and geometric convergence — 5 scalings
    // (last = col) pins the COL marginal to truncation exactness
    def colErr(o: Seq[(String, String, Long, Long)]): Double =
      o.groupBy(_._2).values
        .map(g => math.abs(g.map(_._4).sum - t0 / 2).toDouble / (t0 / 2))
        .max
    assert(colErr(out) < 0.10, s"col err ${colErr(out)}")
    val out5 = Sampling.ipfWeights(df, "src", "lang", scalings = 4)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(colErr(out5) <= 4.0 / t0, s"col err after col-scaling round")
    // deterministic across partitionings (exact integer trajectory)
    val out7 = Sampling.ipfWeights(df.repartition(7), "src", "lang", 3)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out === out7)
  }
}
