package graft.operators

import graft.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived report documents (SURVEY.md §1.1 last row) — the reference's
  * batch report generators (dashboard_data.json, weekly_report.json,
  * api_usage.json, health_status.json; football-data-pipeline.yml:702-1156)
  * as DataFrame pipelines ending in small single-document frames for
  * [[graft.sources.Sources.writeReportDoc]].
  *
  * Shapes only — each report is a handful of aggregations the engine
  * already proves through the oracle gate (A1-A9, O2, W-family); what this
  * module adds is the document assembly: aggregate → struct → one-row frame.
  * All report windows anchor on a caller-supplied `now`.
  */
object Reports {

  /** COLUMN PROFILE: per-column null count, distinct count, min/max — the
    * data-quality scan a pipeline runs on every new ingest batch
    * (reference: validate_data.py's table checks, generalized per-column).
    * ONE scan over the data: all columns' aggregates ride in a single
    * `agg()` (countDistinct over several columns plans as one Expand job —
    * rows × |cols|, still one shuffle round, never one job per column);
    * the one-row result is exploded into the long (col_name, stats) shape
    * driver-side-free. min/max are cast to string AFTER aggregation, so
    * the scan runs on the native (comparable, codegen'd) column types. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).as(s"__min_$c"),
        max(col(c)).as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").cast("string").as("min_s"),
        col(s"__max_$c").cast("string").as("max_s"))
    }
    row.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /** VOLUME VALIDATION (validate_data.py:20-76): per-entity row counts
    * checked against expected [lo, hi] ranges — the "Fixtures 10-30, Odds
    * 30-100" sanity oracle as one plan (union of single-row aggregates;
    * each count is a metadata-cheap scan, no joins). */
  def volumeCheck(tables: Seq[(String, DataFrame, Long, Long)]): DataFrame =
    tables.map { case (name, df, lo, hi) =>
      df.agg(count(lit(1)).as("n"))
        .select(lit(name).as("entity"), col("n"),
          lit(lo).as("lo"), lit(hi).as("hi"),
          (col("n") >= lo && col("n") <= hi).as("ok"))
    }.reduce(_ unionByName _).orderBy(col("entity"))

  /** weekly_report shape (yml:829-935): 7-day activity rollup. */
  def weeklyReport(events: DataFrame, now: java.sql.Timestamp): DataFrame = {
    val weekAgo = new java.sql.Timestamp(now.getTime - 7L * 86400_000L)
    val window7 = events.filter(col("ts") >= lit(weekAgo) && col("ts") <= lit(now))
    window7.agg(
      count(lit(1)).as("total_events"),
      countDistinct(col("user_id")).as("active_users"),
      Det.dsum(col("value")).as("total_value"),
      Det.fmtTs(min(col("ts"))).as("window_start"),
      Det.fmtTs(max(col("ts"))).as("window_end"))
      .withColumn("report_generated_at", Det.fmtTs(lit(now)))
  }

  /** daily breakdown inside the weekly report (A4 daily tumbling shape). */
  def weeklyDaily(events: DataFrame, now: java.sql.Timestamp): DataFrame = {
    val weekAgo = new java.sql.Timestamp(now.getTime - 7L * 86400_000L)
    events.filter(col("ts") >= lit(weekAgo) && col("ts") <= lit(now))
      .groupBy(Det.fmtDate(to_date(col("ts"))).as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        Det.dsum(col("value")).as("value"))
      .orderBy(col("day"))
  }

  /** api_usage shape (yml:937-1034): weighted call estimate per day against
    * a budget (A9 weighted-map aggregation + clamp guard F-m3). */
  def apiUsage(jobs: DataFrame, now: java.sql.Timestamp,
      dailyBudget: Int): DataFrame = {
    val weights = typedLit(Map(
      "early_odds" -> 1, "pre_match" -> 2, "team_news" -> 3,
      "final_data" -> 4))
    jobs
      .groupBy(Det.fmtDate(to_date(col("scheduled_for"))).as("day"))
      .agg(sum(coalesce(element_at(weights, col("job_type")), lit(1)))
        .as("estimated_calls"))
      .withColumn("remaining",
        greatest(lit(dailyBudget) - col("estimated_calls"), lit(0)))
      .withColumn("over_budget", col("estimated_calls") > dailyBudget)
      .orderBy(col("day"))
  }

  /** health_status shape (yml:474-611): queue failure rate + backlog
    * thresholds (>20% failures degraded; >50 pending backlog). */
  def healthStatus(jobs: DataFrame, now: java.sql.Timestamp): DataFrame = {
    val agg = jobs.agg(
      count(lit(1)).as("total_jobs"),
      sum(when(col("status") === "failed", 1).otherwise(0)).as("failed"),
      sum(when(col("status") === "pending", 1).otherwise(0)).as("pending"),
      sum(when(col("status") === "expired", 1).otherwise(0)).as("expired"),
      sum(when(col("status") === "completed", 1).otherwise(0)).as("completed"))
    agg
      .withColumn("failure_rate",
        when(col("total_jobs") > 0,
          col("failed").cast("double") / col("total_jobs").cast("double"))
          .otherwise(0.0))
      .withColumn("status",
        when(col("failure_rate") > 0.2, "degraded")
          .when(col("pending") > 50 || col("expired") > 10, "issues")
          .otherwise("healthy"))
      .withColumn("checked_at", Det.fmtTs(lit(now)))
  }

  /** dashboard_data shape (yml:702-825): league table + latest movements —
    * composition of the enrichment join (J1) and LAG movement (W2). */
  def dashboardData(events: DataFrame, customers: DataFrame,
      threshold: Double): DataFrame = {
    val moves = Windows.withLagMovement(events,
        Seq("user_id", "event_type"), "ts", "event_id", "value")
      .filter(abs(col("rel_change")) > threshold)
    moves.join(broadcast(customers),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_name"),
        col("event_type"), col("value"), col("prev_value"),
        col("rel_change"), Det.fmtTs(col("ts")).as("ts_s"))
      .orderBy(desc("ts_s"), col("event_id")).limit(10)
  }
}
