package graft

import java.sql.Timestamp
import graft.operators.Reports
import graft.sources.Sources
import org.apache.spark.sql.functions._

class ReportsSpec extends SparkSpec {
  import spark.implicits._

  val now: Timestamp = Timestamp.valueOf("2024-01-31 00:00:00")

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
}
