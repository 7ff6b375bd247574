package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed job record — the reference's `jobs.json` entries (FIXTURES.md §3;
  * created at .github/workflows/football-data-pipeline.yml:217-227). */
case class Job(
    id: String,
    fixture_id: Long,
    scheduled_for: Timestamp,
    status: String,   // pending | completed | failed | expired
    job_type: String, // early_odds | pre_match | team_news | final_data
    priority: String, // highest | high | medium
    created_at: Timestamp)

/** Fixture input to job derivation. */
case class Fixture(fixture_id: Long, kickoff_utc: Timestamp, priority: String)

/** Job-queue semantics (SURVEY.md §2.10 ST2-ST4) as PURE functions over
  * `Dataset[Job]` — unit-testable, reused identically by the batch path and
  * (later) the Structured Streaming path, where ST3 becomes
  * `flatMapGroupsWithState` keyed by job id.
  */
object JobQueue {

  /** Phase offsets (hours before kickoff) by fixture priority
    * (.github/workflows/football-data-pipeline.yml:190-210). */
  def schedulesFor(priority: String): Seq[(Int, String)] = {
    val early = if (priority == "highest") 48 else 24
    Seq(early -> "early_odds", 12 -> "pre_match",
      3 -> "team_news", 1 -> "final_data")
  }

  /** ST2 — derive up to 4 phase jobs per fixture; only jobs scheduled in the
    * future (collection_time > now) are emitted. Pure flatMap. */
  def deriveJobs(fixtures: Dataset[Fixture], now: Timestamp)(
      implicit spark: SparkSession): Dataset[Job] = {
    import spark.implicits._
    fixtures.flatMap { f =>
      schedulesFor(f.priority).flatMap { case (offsetH, jobType) =>
        val schedAt = new Timestamp(f.kickoff_utc.getTime - offsetH * 3600_000L)
        if (schedAt.after(now))
          Some(Job(s"${f.fixture_id}_$jobType", f.fixture_id, schedAt,
            "pending", jobType, f.priority, now))
        else None
      }
    }
  }

  /** P9 — retention: keep pending jobs < 2 h past schedule; completed/failed
    * < 3 d past schedule (expired jobs are dropped). */
  def retain(jobs: DataFrame, now: Timestamp): DataFrame =
    jobs.filter(
      (col("status") === "pending" &&
        col("scheduled_for") > lit(now) - expr("INTERVAL 2 HOURS")) ||
      (col("status").isin("completed", "failed") &&
        col("scheduled_for") > lit(now) - expr("INTERVAL 3 DAYS")))

  /** J8 + O6 + O4 — merge: retained existing jobs win over new jobs with the
    * same id (left_anti dedup), union, sort by schedule. */
  def merge(existing: DataFrame, newJobs: DataFrame, now: Timestamp): DataFrame = {
    val active = retain(existing, now)
    val fresh = newJobs.join(active.select("id"), Seq("id"), "left_anti")
    active.unionByName(fresh).orderBy(asc("scheduled_for"), asc("id"))
  }

  /** P8 / ST4 — status transition at processing time `now`:
    * pending + >45 min past schedule → expired; pending + due → processable.
    * `due` derives from the POST-transition status, so an expired job is
    * never due (the reference never processes expired jobs).
    * (Success/failure of processing is the caller's side effect.) */
  def markDue(jobs: DataFrame, now: Timestamp): DataFrame =
    jobs.withColumn("status",
        when(col("status") === "pending" &&
          lit(now) > col("scheduled_for") + expr("INTERVAL 45 MINUTES"),
          "expired").otherwise(col("status")))
      .withColumn("due",
        col("status") === "pending" && col("scheduled_for") <= lit(now))
}
