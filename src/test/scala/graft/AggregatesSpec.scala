package graft

import graft.operators.Aggregates
import org.apache.spark.sql.functions._

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("twoPhaseDistinct equals the built-in countDistinct") {
    val ev = Tables.events(spark, sfDir)
    val two = Aggregates.twoPhaseDistinct(ev, "event_type", "user_id")
      .as[(String, Long)].collect().toMap
    val ref = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(two === ref)
  }

  test("twoPhaseDistinct ignores NULL values like COUNT(DISTINCT)") {
    val df = Seq(("a", Some(1L)), ("a", Some(1L)), ("a", None),
      ("b", None), ("b", None), ("c", Some(2L)), ("c", Some(3L)))
      .toDF("k", "v")
    val two = Aggregates.twoPhaseDistinct(df, "k", "v")
      .as[(String, Long)].collect().toMap
    // SQL semantics: NULL never counts; an all-NULL key reports 0, not 1
    assert(two === Map("a" -> 1L, "b" -> 0L, "c" -> 2L))
  }

  test("weekly rollup from daily partials equals direct weekly, bit-for-bit") {
    val ev = Tables.events(spark, sfDir)
    val merged = Aggregates.weeklyFromDaily(
        Aggregates.dailyPartials(ev, "event_type", "ts", "value"),
        "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    val direct = ev.groupBy(col("event_type"),
        Det.fmtDate(date_trunc("week", to_date(col("ts")))).as("week"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_val"))
      .orderBy(col("event_type"), col("week"))
      .as[(String, String, Long, Double)].collect().toSeq
    assert(merged === direct) // doubles compared exactly: decimal sums merge exactly
  }

  test("coOccurrence: in-array pair generation equals the self-join, ordered") {
    val df = Seq((1L, "x"), (1L, "y"), (1L, "z"), (1L, "y"), // dup ignored
      (2L, "x"), (2L, "y"), (3L, "x"), (3L, "y"))
      .toDF("basket", "item")
    val out = Aggregates.coOccurrence(df, "basket", "item", k = 10)
      .as[(Long, String, String, Long)].collect().toSeq
    // (x,y) in 3 baskets; (x,z), (y,z) in 1
    assert(out.head === ((1L, "x", "y", 3L)))
    assert(out.map(r => (r._2, r._3, r._4)).toSet ===
      Set(("x", "y", 3L), ("x", "z", 1L), ("y", "z", 1L)))
    // pairs are always lexicographically ordered a < b
    assert(out.forall(r => r._2 < r._3))
  }

  test("ratioToReport: shares sum to 1 exactly on decimal totals") {
    val ev = Tables.events(spark, sfDir)
    val out = Aggregates.ratioToReport(ev, "event_type", "value")
      .as[(String, Long, Double, Double)].collect().toSeq
    val totalN = ev.count()
    assert(out.map(_._2).sum === totalN)
    // exact decimal numerators over an exact decimal total: shares sum
    // to 1 within one ulp per group
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-12)
  }

  test("quantileNormalize: reference group maps onto itself, others onto it") {
    // group a (reference, 6 rows ascending), group b shifted by +1000
    val df = ((1 to 6).map(v => (v.toLong, "a", v.toDouble)) ++
      (1 to 3).map(v => ((10 + v).toLong, "b", 1000.0 + v)))
      .toDF("id", "grp", "v")
    val out = Aggregates.quantileNormalize(df, "grp", "id", "v")
      .as[(Long, String, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._5))).toMap
    // every normalized value is drawn from the reference group's values
    assert(out.values.forall { case (_, _, nv) => (1 to 6).map(_.toDouble).contains(nv) })
    // group b's shifted values land on reference order stats by rank:
    // rank 1/3 → p=1/6 → bucket 16 → target ceil(16·6/100)=1 → 1.0
    // rank 2/3 → p=3/6 → bucket 50 → target 3 → 3.0
    // rank 3/3 → p=5/6 → bucket 83 → target ceil(83·6/100)=5 → 5.0
    assert(out(11L)._3 === 1.0)
    assert(out(12L)._3 === 3.0)
    assert(out(13L)._3 === 5.0)
    // the mapping is monotone in rank within every group
    val byGrp = out.toSeq.sortBy(_._1).groupBy(_._2._1)
    byGrp.values.foreach { rs =>
      val nvs = rs.map(_._2._3)
      assert(nvs === nvs.sorted)
    }
  }

  test("associationRules: hand-computed conf/lift on three baskets") {
    import spark.implicits._
    // baskets: {x,y}, {x,y}, {x,z} — N=3, n_x=3, n_y=2, n_z=1, n_xy=2
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z")).toDF("basket", "item")
    val out = Aggregates.associationRules(df, "basket", "item",
      minSup = 2L, k = 10)
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // x→y: conf = 2·1000 div 3 = 666; lift = 2·3·1000 div (3·2) = 1000
    assert(out(("x", "y")) === (("x", "y", 2L, 3L, 2L, 666L, 1000L)))
    // y→x: conf = 2·1000 div 2 = 1000; same lift
    assert(out(("y", "x")) === (("y", "x", 2L, 2L, 3L, 1000L, 1000L)))
    // {x,z} has support 1 < minSup — no rule
    assert(!out.contains(("x", "z")) && !out.contains(("z", "x")))
  }

  test("bottomKQuantiles: layout-independent, small groups exact, " +
      "estimates within sampling error") {
    import spark.implicits._
    // group "small" has 10 rows < k ⇒ the sample IS the group and the
    // estimate is the exact order statistic; group "big" has 5000
    val rows = (0L until 10L).map(i => ("small", i, i.toDouble)) ++
      (0L until 5000L).map(i => ("big", 100L + i, i.toDouble))
    val df = rows.toDF("g", "key", "v")
    val out = Aggregates.bottomKQuantiles(df, "g", "key", "v", k = 64)
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val (_, nS, kS, p50S, p90S, p99S) = out("small")
    assert(nS === 10L && kS === 10L)
    // idx = (9·q) div 100 + 1 → p50 = 5th smallest = 4.0, p90 = 9th,
    // p99 = 9th (floor order statistic)
    assert((p50S, p90S, p99S) === ((4.0, 8.0, 8.0)))
    val (_, nB, kB, p50B, p90B, p99B) = out("big")
    assert(nB === 5000L && kB === 64L)
    // uniform 0..4999: sampling s.e. ≈ sqrt(q(1-q)/64)·5000 ≈ 310 at
    // the median — assert a generous 4-s.e. band (deterministic: the
    // md5 sample is fixed, this pins today's draw stays sane)
    assert(math.abs(p50B - 2500.0) < 1250, s"p50 $p50B")
    assert(p90B > 3500 && p99B > p90B - 1e-9, s"p90 $p90B p99 $p99B")
    // layout independence: same result on any partitioning
    val out7 = Aggregates.bottomKQuantiles(
        df.repartition(13), "g", "key", "v", k = 64)
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out7 === out)
  }

  test("kmvSetCardinality: small sets exact, estimates and " +
      "inclusion-exclusion within sampling error, layout-stable") {
    import spark.implicits._
    // small disjoint sets (< k): sketch holds everything ⇒ ALL exact
    val small = ((0L until 50L).map(i => ("a", i)) ++
      (100L until 130L).map(i => ("b", i))).toDF("g", "key")
    val s = Aggregates.kmvSetCardinality(small, "g", "key", "a", "b",
        k = 128)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(s === ((128L, 50L, 30L, 80L, 50L, 30L, 80L, 0L)))
    // overlapping large sets: A = 0..3999, B = 2000..5999, |∩| = 2000
    val big = ((0L until 4000L).map(i => ("a", i)) ++
      (2000L until 6000L).map(i => ("b", i))).toDF("g", "key")
    val e = Aggregates.kmvSetCardinality(big, "g", "key", "a", "b",
        k = 128)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(e._2 === 4000L && e._3 === 4000L && e._4 === 6000L)
    // s.e. ≈ n/sqrt(k) ≈ 354; assert generous 4-s.e. bands
    assert(math.abs(e._5 - 4000) < 1400 && math.abs(e._6 - 4000) < 1400)
    assert(math.abs(e._7 - 6000) < 2100, s"est_union ${e._7}")
    assert(math.abs(e._8 - 2000) < 2000, s"est_inter ${e._8}")
    // duplicates in the input collapse (sketch of a SET), and the
    // result is partitioning-independent
    val dup = big.union(big).repartition(17)
    val e2 = Aggregates.kmvSetCardinality(dup, "g", "key", "a", "b",
        k = 128)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(e2 === e)
  }

  test("kmvSetCardinality: an absent group yields an explicit zero row, " +
      "never a silently-empty result") {
    import spark.implicits._
    val onlyA = (0L until 40L).map(i => ("a", i)).toDF("g", "key")
    val rows = Aggregates.kmvSetCardinality(onlyA, "g", "key", "a", "b",
        k = 128)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 1, "missing group must still produce a row")
    // (k, n_a, n_b, n_union, est_a, est_b, est_union, est_inter)
    assert(rows.head === ((128L, 40L, 0L, 40L, 40L, 0L, 40L, 0L)))
    // both groups absent: all-zero row, not zero rows
    val neither = Seq(("c", 1L)).toDF("g", "key")
    val z = Aggregates.kmvSetCardinality(neither, "g", "key", "a", "b",
        k = 128)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(z.toSeq === Seq((128L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("BottomKAgg: duplicate hash keys at the k boundary resolve by " +
      "(hash, value) — partitioning/arrival-order independent") {
    import spark.implicits._
    // 6 rows, 3 sharing one hash with distinct values; k=4 cuts through
    // the tie, so a hash-only order would keep an arrival-dependent row
    val rows = Seq(
      ("aa", 10.0), ("bb", 20.0),
      ("cc", 31.0), ("cc", 33.0), ("cc", 32.0),
      ("dd", 40.0))
    val bk = udaf(new graft.functions.BottomKAgg(4))
    def sample(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.agg(bk(col("h"), col("v")).as("s"))
        .as[Seq[Double]].head()
    val expected = Seq(10.0, 20.0, 31.0, 32.0) // (hash,value) bottom-4
    for (parts <- Seq(1, 3, 7); ordered <- Seq(true, false)) {
      val base = if (ordered) rows else rows.reverse
      val got = sample(base.toDF("h", "v").repartition(parts))
      assert(got === expected, s"parts=$parts ordered=$ordered")
    }
  }
}
