package graft

import java.sql.Timestamp
import graft.operators.Reports
import graft.sources.Sources
import org.apache.spark.sql.functions._

class ReportsSpec extends SparkSpec {
  import spark.implicits._

  val now: Timestamp = Timestamp.valueOf("2024-01-31 00:00:00")

  test("testdataDrift: healthy data silent; unit-corrupted frame trips ONE message") {
    // healthy: the real driver testdata passes all three layers
    assert(Tables.testdataDrift(spark, "/root/testdata/sf0.001") === Seq.empty)
    // reproduce the round-6 incident in a sandbox copy: store events.ts as
    // raw INT64 micros — the loader's nanos branch divides by 1000 and
    // every value collapses near the 1970 epoch → range probe must fire
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", unix_micros(col("ts")))
      .write.parquet(s"$dir/events.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings"))
      Tables.load(spark, "/root/testdata/sf0.001", t)
        .write.parquet(s"$dir/$t.parquet")
    val issues = Tables.testdataDrift(spark, dir)
    assert(issues.size === 1)
    assert(issues.head.contains("events.ts"))
    assert(issues.head.contains("timestamp unit"))
    val boom = intercept[IllegalArgumentException](
      Tables.assertTestdataSane(spark, dir))
    assert(boom.getMessage.contains("testdata drift"))
  }

  test("profile: one row per column with nulls/distinct/min/max, one scan") {
    val df = Seq(
      (Some(3L), Some("b")),
      (Some(1L), None),
      (None, Some("a")),
      (Some(3L), Some("a"))).toDF("k", "s")
    val out = Reports.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(out("k") === ((4L, 1L, 2L, "1", "3")))
    assert(out("s") === ((4L, 1L, 2L, "a", "b")))
    // single scan: exactly one relation in the plan
    val scans = Reports.profile(df, Seq("k", "s")).queryExecution.optimizedPlan
      .collect { case l: org.apache.spark.sql.catalyst.plans.logical.LeafNode => l }
    assert(scans.length === 1)
  }

  test("volumeCheck verdicts per entity range") {
    val a = (1 to 25).toDF("x")
    val b = (1 to 5).toDF("x")
    val out = Reports.volumeCheck(Seq(
        ("a", a, 10L, 30L), ("b", b, 10L, 30L)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(4))).toMap
    assert(out === Map("a" -> ((25L, true)), "b" -> ((5L, false))))
  }

  test("weeklyReport aggregates the 7-day window into one document row") {
    val r = Reports.weeklyReport(Tables.events(spark, sfDir), now)
    assert(r.count() === 1)
    val row = r.head
    assert(row.getAs[Long]("total_events") > 0)
    assert(row.getAs[String]("window_start") >= "2024-01-24")
    val daily = Reports.weeklyDaily(Tables.events(spark, sfDir), now)
    assert(daily.count() <= 8)
    // daily breakdown must sum to the headline count
    assert(daily.agg(sum("n_events")).head.getLong(0) ===
      row.getAs[Long]("total_events"))
  }

  test("healthStatus thresholds") {
    def jobs(failed: Int, pending: Int, completed: Int) =
      (Seq.fill(failed)("failed") ++ Seq.fill(pending)("pending") ++
        Seq.fill(completed)("completed")).toDF("status")
    assert(Reports.healthStatus(jobs(3, 1, 6), now).head
      .getAs[String]("status") === "degraded") // 30% failures
    assert(Reports.healthStatus(jobs(0, 60, 40), now).head
      .getAs[String]("status") === "issues")   // backlog > 50
    assert(Reports.healthStatus(jobs(1, 5, 94), now).head
      .getAs[String]("status") === "healthy")
  }

  test("apiUsage weights phases and clamps remaining at zero") {
    val jobs = Seq(
      ("1_e", Timestamp.valueOf("2024-01-30 10:00:00"), "early_odds"),
      ("1_f", Timestamp.valueOf("2024-01-30 11:00:00"), "final_data"),
      ("2_f", Timestamp.valueOf("2024-01-30 12:00:00"), "final_data"))
      .toDF("id", "scheduled_for", "job_type")
    val r = Reports.apiUsage(jobs, now, dailyBudget = 5).head
    assert(r.getAs[Long]("estimated_calls") === 9) // 1 + 4 + 4
    assert(r.getAs[Long]("remaining") === 0)       // clamped
    assert(r.getAs[Boolean]("over_budget"))
  }

  test("dashboardData composes movements + enrichment; report sink writes JSON") {
    val dash = Reports.dashboardData(Tables.events(spark, sfDir),
      Tables.customer(spark, sfDir), threshold = 0.5)
    assert(dash.count() <= 10)
    val tmp = java.nio.file.Files.createTempDirectory("rep").toString
    Sources.writeReportDoc(dash, s"$tmp/dashboard_data.json")
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$tmp/dashboard_data.json"))
    assert(txt.startsWith("[") && txt.endsWith("]"))
    assert(txt.contains("rel_change"))
  }

  test("zscoreAnomalies: known distribution, one clear outlier flagged") {
    // group g: values 1..9 plus one 100 outlier. With population std the
    // max attainable z for n=10 is sqrt(n-1) = 3, so k=3 can never flag
    // anything at this n; the outlier's z is 85.5/28.6 ≈ 2.99 > 2.5 while
    // every other point is ≤ 0.48.
    val vals = (1 to 9).map(_.toDouble) :+ 100.0
    val df = vals.map(("g", _)).toDF("grp", "v")
    val out = Reports.zscoreAnomalies(df, "grp", "v", k = 2.5).collect().head
    val n = vals.length
    val mean = vals.sum / n
    val variance = vals.map(x => (x - mean) * (x - mean)).sum / n
    assert(out.getAs[Long]("n") === n.toLong)
    assert(math.abs(out.getAs[Double]("mean") - mean) < 1e-9)
    assert(math.abs(out.getAs[Double]("std") - math.sqrt(variance)) < 1e-9)
    assert(out.getAs[Long]("n_anomalies") === 1L) // only the 100
  }

  test("zscoreAnomalies: constant group has std 0 and no anomalies") {
    val df = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0)).toDF("grp", "v")
    val out = Reports.zscoreAnomalies(df, "grp", "v", k = 3.0).collect().head
    assert(out.getAs[Double]("std") === 0.0)
    assert(out.getAs[Long]("n_anomalies") === 0L)
  }

  test("temporalDrift: counts and means split at the instant (>= goes after)") {
    val df = Seq(
      ("a", Timestamp.valueOf("2024-01-10 00:00:00"), 2.0),
      ("a", Timestamp.valueOf("2024-01-16 00:00:00"), 4.0), // boundary → after
      ("a", Timestamp.valueOf("2024-01-20 00:00:00"), 8.0))
      .toDF("grp", "ts", "v")
    val out = Reports.temporalDrift(df, "grp", "ts", "v",
      Timestamp.valueOf("2024-01-16 00:00:00")).collect().head
    assert(out.getAs[Long]("n_before") === 1L)
    assert(out.getAs[Long]("n_after") === 2L)
    assert(out.getAs[Double]("mean_before") === 2.0)
    assert(out.getAs[Double]("mean_after") === 6.0)
    assert(out.getAs[Double]("volume_ratio") === 2.0)
  }

  test("groupMad: robust to the outlier that wrecks the std") {
    // 1..9 with a 1000 outlier: median 5.5, deviations |x-5.5| =
    // 4.5,3.5,...,0.5,0.5,...,4.5,994.5 → MAD = 2.5 (std would be ~298)
    val vals = (1 to 9).map(_.toDouble) :+ 1000.0
    val out = Reports.groupMad(vals.map(("g", _)).toDF("grp", "v"),
      "grp", "v").collect().head
    assert(out.getAs[Double]("median") === 5.5)
    assert(out.getAs[Double]("mad") === 2.5)
    assert(out.getAs[Long]("n") === 10L)
  }

  test("ewmaDaily: dyadic weights reproduce the closed-form average") {
    // one group, three days with daily sums 8, 4, 2
    val df = Seq(
      ("g", Timestamp.valueOf("2024-01-01 01:00:00"), 3.0),
      ("g", Timestamp.valueOf("2024-01-01 02:00:00"), 5.0),
      ("g", Timestamp.valueOf("2024-01-02 01:00:00"), 4.0),
      ("g", Timestamp.valueOf("2024-01-03 01:00:00"), 2.0))
      .toDF("grp", "ts", "v")
    val out = Reports.ewmaDaily(df, "grp", "ts", "v", lookback = 16)
      .as[(String, String, Double, Double)].collect().toSeq
    assert(out.map(_._2) === Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    assert(out.map(_._3) === Seq(8.0, 4.0, 2.0))
    // day1: only itself → 8; day2: (4·2^15 + 8·2^14)/(2^15+2^14) = 16/3
    // day3: (2·2^15 + 4·2^14 + 8·2^13)/(2^15+2^14+2^13) = 24/7
    assert(out(0)._4 === 8.0)
    assert(out(1)._4 === (4.0 * 32768 + 8.0 * 16384) / (32768 + 16384))
    assert(out(2)._4 ===
      (2.0 * 32768 + 4.0 * 16384 + 8.0 * 8192) / (32768 + 16384 + 8192))
  }

  test("rollingActiveUsers: each event supports the next windowDays days") {
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-02 10:00:00")),
      (1L, Timestamp.valueOf("2024-01-02 11:00:00")))
      .toDF("user_id", "ts")
    val out = Reports.rollingActiveUsers(df, "user_id", "ts", windowDays = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("n_events")))).toMap
    // day 01: only user 1; days 02-03: both users (3 events); day 04: the
    // two 01-02 events have aged out of nothing yet — window covers 02-04
    assert(out("2024-01-01") === ((1L, 1L)))
    assert(out("2024-01-02") === ((2L, 3L)))
    assert(out("2024-01-03") === ((2L, 3L)))
    assert(out("2024-01-04") === ((2L, 2L))) // only the two day-02 events
    assert(!out.contains("2024-01-05"))
  }

  test("ksDrift: exact statistic on a hand-checkable shift") {
    val split = Timestamp.valueOf("2024-01-16 00:00:00")
    val before = Timestamp.valueOf("2024-01-10 00:00:00")
    val after = Timestamp.valueOf("2024-01-20 00:00:00")
    // before: {1,2,3}; after: {3,4,5} — CDF gap peaks at v=2:
    // |2·3 − 0·3| = 6 (D = 6/9 = 2/3), first reached at v=1? at v=1:
    // |1·3 − 0| = 3; v=2: 6; v=3: |3·3−1·3|=6 too → ks_at = 2 (smallest)
    val df = (Seq(1.0, 2.0, 3.0).map(v => ("x", before, v)) ++
      Seq(3.0, 4.0, 5.0).map(v => ("x", after, v)))
      .toDF("g", "ts", "v")
    val r = Reports.ksDrift(df, "g", "ts", "v", split).collect()(0)
    assert(r.getAs[Long]("n_before") === 3L)
    assert(r.getAs[Long]("n_after") === 3L)
    assert(r.getAs[Long]("ks_num") === 6L)
    assert(r.getAs[Double]("ks_at") === 2.0)
    assert(r.getAs[Double]("ks") === 6.0 / 9.0)
  }

  test("ksDrift: identical sides give zero statistic") {
    val split = Timestamp.valueOf("2024-01-16 00:00:00")
    val before = Timestamp.valueOf("2024-01-10 00:00:00")
    val after = Timestamp.valueOf("2024-01-20 00:00:00")
    val df = (Seq(1.0, 2.0).map(v => ("x", before, v)) ++
      Seq(1.0, 2.0).map(v => ("x", after, v))).toDF("g", "ts", "v")
    val r = Reports.ksDrift(df, "g", "ts", "v", split).collect()(0)
    assert(r.getAs[Long]("ks_num") === 0L)
  }

  test("holtDaily: hand-checked level+trend recursion incl. negatives") {
    // one key, days 1-4 with x(micros) = 8, 4, 2, 1 (halving series):
    //   d1: S=8e6 B=0
    //   d2: S=⌊(4e6+8e6+0)/2⌋=6e6, B=⌊(6e6−8e6+0)/2⌋=−1e6 (negative floor)
    //   d3: S=⌊(2e6+6e6−1e6)/2⌋=35e5, B=⌊(35e5−6e6−1e6)/2⌋=−175e4
    //   d4: S=⌊(1e6+35e5−175e4)/2⌋=1375e3,
    //       B=⌊(1375e3−35e5−175e4)/2⌋=⌊−3875e3/2⌋=−19375e2
    val df = Seq(
      ("a", Timestamp.valueOf("2024-01-01 01:00:00"), 8.0),
      ("a", Timestamp.valueOf("2024-01-02 01:00:00"), 4.0),
      ("a", Timestamp.valueOf("2024-01-03 01:00:00"), 2.0),
      ("a", Timestamp.valueOf("2024-01-04 01:00:00"), 1.0))
      .toDF("g", "ts", "v")
    val out = Reports.holtDaily(df, "g", "ts", "v")
      .select("day", "s_micro", "b_micro").as[(String, Long, Long)]
      .collect().toSeq
    assert(out === Seq(
      ("2024-01-01", 8000000L, 0L),
      ("2024-01-02", 6000000L, -1000000L),
      ("2024-01-03", 3500000L, -1750000L),
      ("2024-01-04", 1375000L, -1937500L)))
  }

  test("trending: dyadic decay weights are exact and recency wins") {
    val asOf = Timestamp.valueOf("2024-02-01 00:00:00")
    // user 1: one event yesterday (age 1, weight 2^20 >> 0 = 1048576)
    // user 2: three events 10 days old (age 10 ⇒ shift 5 ⇒ 32768 each)
    val df = Seq(
      (1L, Timestamp.valueOf("2024-01-31 12:00:00")),
      (2L, Timestamp.valueOf("2024-01-22 09:00:00")),
      (2L, Timestamp.valueOf("2024-01-22 10:00:00")),
      (2L, Timestamp.valueOf("2024-01-22 11:00:00")))
      .toDF("user_id", "ts")
    val out = Reports.trending(df, "user_id", "ts", asOf,
      halfLifeDays = 2, k = 5)
      .select("rank", "key", "score", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 1L, 1048576L, 1L),
      (2L, 2L, 3L * 32768L, 3L)))
  }

  test("abTest: zero t on identical sides, positive when before wins") {
    val split = Timestamp.valueOf("2024-01-16 00:00:00")
    val b = Timestamp.valueOf("2024-01-10 00:00:00")
    val a = Timestamp.valueOf("2024-01-20 00:00:00")
    val same = (Seq(1.0, 2.0, 3.0).map(v => ("x", b, v)) ++
      Seq(1.0, 2.0, 3.0).map(v => ("x", a, v))).toDF("g", "ts", "v")
    val r0 = Reports.abTest(same, "g", "ts", "v", split).collect()(0)
    assert(r0.getAs[Double]("t_stat") === 0.0)
    val shifted = (Seq(5.0, 6.0, 7.0).map(v => ("x", b, v)) ++
      Seq(1.0, 2.0, 3.0).map(v => ("x", a, v))).toDF("g", "ts", "v")
    val r1 = Reports.abTest(shifted, "g", "ts", "v", split).collect()(0)
    assert(r1.getAs[Double]("mean_before") === 6.0)
    assert(r1.getAs[Double]("mean_after") === 2.0)
    // v = 1 each side, t = 4 / sqrt(1/3 + 1/3)
    assert(math.abs(r1.getAs[Double]("t_stat") -
      4.0 / math.sqrt(2.0 / 3.0)) < 1e-12)
  }

  test("weekOverWeek: compares same weekday, skips rows without one") {
    val df = Seq(
      ("x", Timestamp.valueOf("2024-01-01 10:00:00"), 10.0),
      ("x", Timestamp.valueOf("2024-01-08 09:00:00"), 15.0), // +50%
      ("x", Timestamp.valueOf("2024-01-09 09:00:00"), 7.0))  // no wk ago
      .toDF("g", "ts", "v")
    val out = Reports.weekOverWeek(df, "g", "ts", "v")
      .select("day", "total", "prev_total", "delta_pct")
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(out === Seq(("2024-01-08", 15.0, 10.0, 50.0)))
  }

  test("propTest: hand-checked pooled z and degenerate-rate guard") {
    val split = Timestamp.valueOf("2024-01-16 00:00:00")
    val b = Timestamp.valueOf("2024-01-10 00:00:00")
    val a = Timestamp.valueOf("2024-01-20 00:00:00")
    // before: 3/4 hit; after: 1/4 hit
    val df = (Seq(9.0, 9.0, 9.0, 1.0).map(v => ("x", b, v)) ++
      Seq(9.0, 1.0, 1.0, 1.0).map(v => ("x", a, v)))
      .toDF("g", "ts", "v")
    val r = Reports.propTest(df, "g", "ts", "v", 5.0, split).collect()(0)
    val pp = 0.5
    val want = (0.75 - 0.25) / math.sqrt(pp * (1 - pp) * (0.25 + 0.25))
    assert(math.abs(r.getAs[Double]("z_stat") - want) < 1e-12)
    // all-miss data: z defined as 0, not 0/0
    val none = (Seq(1.0, 1.0).map(v => ("x", b, v)) ++
      Seq(1.0, 1.0).map(v => ("x", a, v))).toDF("g", "ts", "v")
    val r0 = Reports.propTest(none, "g", "ts", "v", 5.0, split)
      .collect()(0)
    assert(r0.getAs[Double]("z_stat") === 0.0)
  }

  test("psiDrift: zero on identical distributions, positive on shift") {
    val split = Timestamp.valueOf("2024-01-16 00:00:00")
    val before = Timestamp.valueOf("2024-01-10 00:00:00")
    val after = Timestamp.valueOf("2024-01-20 00:00:00")
    val same = (Seq("a", "a", "b").map(b => (b, before)) ++
      Seq("a", "a", "b").map(b => (b, after))).toDF("bucket", "ts")
    assert(Reports.psiDrift(same, "bucket", "ts", split)
      .agg(sum("psi64")).head().getLong(0) === 0L)
    val shifted = (Seq("a", "a", "a", "b").map(b => (b, before)) ++
      Seq("a", "b", "b", "b").map(b => (b, after))).toDF("bucket", "ts")
    val rows = Reports.psiDrift(shifted, "bucket", "ts", split).collect()
    assert(rows.forall(_.getAs[Long]("psi64") >= 0L))
    assert(rows.map(_.getAs[Long]("psi64")).sum > 0L)
  }

  test("datasetManifest: set-property fingerprints — layout-independent, " +
      "row-sensitive, stage counts exact") {
    import spark.implicits._
    val ids = (0L until 1000L).toDF("id")
    val half = ids.filter(col("id") % 2 === 0)
    val m = Reports.datasetManifest(
        Seq(("all", ids), ("half", half)), "id")
      .as[(Long, String, Long, BigDecimal)].collect()
    assert(m.map(r => (r._2, r._3)).toSeq === Seq(("all", 1000L), ("half", 500L)))
    // fingerprint is a property of the SET: any partitioning, any order
    val m17 = Reports.datasetManifest(
        Seq(("all", ids.repartition(17)), ("half", half.orderBy(desc("id")))),
        "id")
      .as[(Long, String, Long, BigDecimal)].collect()
    assert(m17.map(r => (r._2, r._4)).toMap === m.map(r => (r._2, r._4)).toMap)
    // and sensitive to membership: drop one row ⇒ different fp
    val m999 = Reports.datasetManifest(
        Seq(("all", ids.filter(col("id") =!= 123L))), "id")
      .as[(Long, String, Long, BigDecimal)].head()
    assert(m999._3 === 999L && m999._4 != m.head._4)
    // mergeable: fp(all) = fp(half) + fp(odd half) — shard-wise manifests
    // sum to the release manifest
    val mOdd = Reports.datasetManifest(
        Seq(("odd", ids.filter(col("id") % 2 === 1))), "id")
      .as[(Long, String, Long, BigDecimal)].head()
    assert(m.head._4 === m.last._4 + mOdd._4)
  }
}
