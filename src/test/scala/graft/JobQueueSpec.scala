package graft

import java.sql.Timestamp
import graft.operators.{Fixture, JobQueue}
import org.apache.spark.sql.functions._

class JobQueueSpec extends SparkSpec {
  import spark.implicits._
  implicit def sp: org.apache.spark.sql.SparkSession = spark

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  val now: Timestamp = ts("2024-01-01 00:00:00")

  test("deriveJobs: 4 phases, priority-dependent early_odds offset") {
    val fx = Seq(Fixture(1L, ts("2024-01-05 15:00:00"), "highest"),
      Fixture(2L, ts("2024-01-05 15:00:00"), "high")).toDS()
    val jobs = JobQueue.deriveJobs(fx, now).collect().sortBy(_.id)
    assert(jobs.length === 8)
    val j1 = jobs.filter(_.fixture_id == 1L).map(j => j.job_type -> j.scheduled_for).toMap
    assert(j1("early_odds") === ts("2024-01-03 15:00:00")) // -48h
    assert(j1("pre_match") === ts("2024-01-05 03:00:00"))  // -12h
    assert(j1("team_news") === ts("2024-01-05 12:00:00"))  // -3h
    assert(j1("final_data") === ts("2024-01-05 14:00:00")) // -1h
    val j2 = jobs.filter(_.fixture_id == 2L).map(j => j.job_type -> j.scheduled_for).toMap
    assert(j2("early_odds") === ts("2024-01-04 15:00:00")) // -24h for 'high'
  }

  test("deriveJobs drops jobs scheduled in the past") {
    val fx = Seq(Fixture(1L, ts("2024-01-01 10:00:00"), "highest")).toDS()
    val jobs = JobQueue.deriveJobs(fx, now).collect()
    // kickoff+offsets: -48h/-12h are past, -3h (07:00) and -1h (09:00) future
    assert(jobs.map(_.job_type).sorted.toSeq === Seq("final_data", "team_news"))
  }

  test("retain: pending 2h grace, completed/failed 3d") {
    val jobs = Seq(
      ("a", ts("2023-12-31 23:00:00"), "pending"),   // 1h past → keep
      ("b", ts("2023-12-31 21:00:00"), "pending"),   // 3h past → drop
      ("c", ts("2023-12-30 00:00:00"), "completed"), // 2d past → keep
      ("d", ts("2023-12-28 00:00:00"), "failed"),    // 4d past → drop
      ("e", ts("2023-12-30 00:00:00"), "expired"))   // expired → drop
      .toDF("id", "scheduled_for", "status")
    val kept = JobQueue.retain(jobs, now).select("id").as[String].collect().sorted
    assert(kept.toSeq === Seq("a", "c"))
  }

  test("markDue transitions (45-minute expiry is strict)") {
    val jobs = Seq(
      ("a", ts("2023-12-31 23:15:00"), "pending"),
      ("b", ts("2023-12-31 23:14:59"), "pending"),
      ("c", ts("2024-01-01 01:00:00"), "pending"),
      ("d", ts("2023-12-31 23:50:00"), "completed"))
      .toDF("id", "scheduled_for", "status")
    val out = JobQueue.markDue(jobs, now)
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[String]("status"), r.getAs[Boolean]("due"))).toMap
    assert(out("a") === ("pending", true))  // exactly 45m past, still pending+due
    assert(out("b") === ("expired", false)) // expired jobs are NEVER due
    assert(out("c") === ("pending", false))
    assert(out("d") === ("completed", false))
  }

  test("merge: existing retained jobs win over fresh duplicates") {
    val existing = Seq(("1_early_odds", ts("2023-12-31 10:00:00"), "completed"))
      .toDF("id", "scheduled_for", "status")
    val fresh = Seq(
      ("1_early_odds", ts("2023-12-31 10:00:00"), "pending"),
      ("2_early_odds", ts("2024-01-02 10:00:00"), "pending"))
      .toDF("id", "scheduled_for", "status")
    val merged = JobQueue.merge(existing, fresh, now)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[String]("status")).toMap
    assert(merged === Map("1_early_odds" -> "completed",
      "2_early_odds" -> "pending"))
  }
}
