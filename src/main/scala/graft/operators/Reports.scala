package graft.operators

import graft.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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

  /** Z-SCORE ANOMALY SUMMARY: per-group mean, population std, and the
    * count of rows beyond `k` standard deviations — the distribution
    * monitor a pipeline runs per ingest batch.
    *
    * Determinism: the sums are exact decimals (values are 2-dp, squares
    * 4-dp — both exact in DECIMAL), and the variance is assembled from
    * their DOUBLE casts with a FIXED IEEE op order
    * `(n·A − B²)/n²` then `sqrt` — every step exactly rounded, so both
    * engines produce bit-identical std and make identical |x−mean| > k·std
    * decisions. NOT mathematically exact — engine-identical, which is
    * what the hash gate needs.
    *
    * Plan: one map-side-combined groupBy for the moments, the #groups-row
    * stats table BROADCAST back, one final agg. Two scans; at 100 TB the
    * first-pass moment table is cached or the two aggs fuse into one scan
    * with windowed moments if the group count is bounded. */
  def zscoreAnomalies(df: DataFrame, groupCol: String, valCol: String,
      k: Double): DataFrame = {
    val d2 = col(valCol).cast(DecimalType(13, 2))
    val stats = df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(d2 * d2).cast("double").as("a2"),
        Det.dsum(col(valCol)).as("b1"))
      .withColumn("mean", col("b1") / col("n").cast("double"))
      .withColumn("std", sqrt(
        (col("n").cast("double") * col("a2") - col("b1") * col("b1"))
          / (col("n").cast("double") * col("n").cast("double"))))
      .select(col(groupCol), col("n"), col("mean"), col("std"))
    df.join(broadcast(stats), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        max(col("n")).as("n"),
        max(col("mean")).as("mean"),
        max(col("std")).as("std"),
        sum(when(abs(col(valCol) - col("mean")) > lit(k) * col("std"), 1L)
          .otherwise(0L)).as("n_anomalies"))
      .orderBy(col(groupCol))
  }

  /** TEMPORAL DRIFT: per-group row count and deterministic mean on each
    * side of a split instant, plus the after/before volume ratio — the
    * train/serve distribution-shift check. ONE scan, one map-side-combined
    * agg; the ratio is a single IEEE divide of exact counts. */
  def temporalDrift(df: DataFrame, groupCol: String, tsCol: String,
      valCol: String, splitAt: java.sql.Timestamp): DataFrame = {
    val before = col(tsCol) < lit(splitAt)
    df.groupBy(col(groupCol))
      .agg(
        sum(when(before, 1L).otherwise(0L)).as("n_before"),
        sum(when(!before, 1L).otherwise(0L)).as("n_after"),
        (sum(when(before, col(valCol).cast(DecimalType(27, 6))))
          .cast("double") /
          sum(when(before, 1L).otherwise(0L)).cast("double"))
          .as("mean_before"),
        (sum(when(!before, col(valCol).cast(DecimalType(27, 6))))
          .cast("double") /
          sum(when(!before, 1L).otherwise(0L)).cast("double"))
          .as("mean_after"))
      .withColumn("volume_ratio",
        col("n_after").cast("double") / col("n_before").cast("double"))
      .orderBy(col(groupCol))
  }

  /** MEDIAN ABSOLUTE DEVIATION per group — the robust scale estimator
    * (unlike std, one wild outlier moves MAD by at most one rank step):
    * mad = median(|x − median(x)|). Two exact-percentile aggregations:
    * the per-group medians (a #groups-row table) come back BROADCAST and
    * the deviations re-aggregate in a second pass — the same two-scan
    * shape as zscoreAnomalies, and like it the interpolation arithmetic
    * is plain IEEE on exactly-representable inputs, bit-identical
    * cross-engine (pinned by q_percentiles). At 100 TB the exact
    * percentile is the documented approx_percentile swap. */
  def groupMad(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(valCol), lit(0.5)).as("med"))
    df.join(broadcast(med), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        max(col("med")).as("median"),
        percentile(abs(col(valCol) - col("med")), lit(0.5)).as("mad"),
        count(lit(1)).as("n"))
      .orderBy(col(groupCol))
  }

  /** EWMA (α = 1/2) OVER THE DAILY SERIES: per-group exponentially
    * weighted moving average of the daily value sum, the smoothed
    * monitoring curve. α = 1/2 makes every weight a POWER OF TWO, so
    * the whole average is computed in EXACT integer-weighted decimal
    * arithmetic over a bounded `lookback`-day window:
    * S = Σ_k x_{t-k}·2^(L-1-k) and N = Σ_k 2^(L-1-k) (missing lags drop
    * out of both), with ewma = S/N — the 2^-(L-1) normalizations cancel,
    * leaving ONE IEEE divide of two exactly-representable magnitudes.
    * Bit-identical cross-engine; the truncation error vs the unbounded
    * EWMA is ≤ 2^-(L-1) of the value scale (2^-15 ≈ 3e-5 relative at
    * the default).
    *
    * Plan: daily rollup is one map-side-combined agg; the L lags ride
    * ONE per-group window exchange (codegen'd — no self-join, no
    * explode); wire cost ∝ groups × days. */
  def ewmaDaily(df: DataFrame, groupCol: String, tsCol: String,
      valCol: String, lookback: Int = 16): DataFrame = {
    require(lookback >= 1 && lookback <= 20, "lookback in [1,20]")
    val daily = df.groupBy(col(groupCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valCol).cast(DecimalType(18, 6))).as("x"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("day"))
    val terms = (0 until lookback).map { k =>
      val weight = 1L << (lookback - 1 - k)
      val xk = lag(col("x"), k).over(w)
      (when(xk.isNotNull, xk * lit(weight)).otherwise(lit(0L)),
        when(xk.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    val s = terms.map(_._1).reduce(_ + _)
    val n = terms.map(_._2).reduce(_ + _)
    daily
      .withColumn("ewma", s.cast("double") / n.cast("double"))
      .select(col(groupCol), Det.fmtDate(col("day")).as("day"),
        col("x").cast("double").as("daily_sum"), col("ewma"))
      .orderBy(col(groupCol), col("day"))
  }

  /** ROLLING 7-DAY ACTIVE USERS: for every day d, the distinct users and
    * event count in [d−6, d] — the WAU curve. A RANGE window cannot hold a
    * COUNT DISTINCT, so each event FANS OUT to the ≤7 days it supports
    * (`sequence` + `explode` — expansion factor = window length, bounded
    * and map-side) and a day-keyed distinct agg does the rest: Spark plans
    * count_distinct as the two-level Expand aggregate, partials map-side.
    * Days with no trailing-window events simply don't appear; the last 6
    * emitted days trail past the final event by construction. */
  def rollingActiveUsers(events: DataFrame, userCol: String,
      tsCol: String, windowDays: Int): DataFrame =
    events
      .select(col(userCol).as("user_id"), explode(sequence(
        to_date(col(tsCol)),
        date_add(to_date(col(tsCol)), windowDays - 1))).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("n_active"),
        count(lit(1)).as("n_events"))
      .select(Det.fmtDate(col("day")).as("day"), col("n_active"),
        col("n_events"))
      .orderBy(col("day"))

  /** HOLT double-exponential smoothing (level + trend) of the daily
    * series per group, integer fixed-point — [[ewmaDaily]]'s
    * trend-aware sibling (EWMA lags a trending series; Holt's trend
    * term closes the lag; forecast = S + B). With α = β = ½ every
    * update is one add + one arithmetic halving:
    *
    *   S_t = ⌊(x_t + S_{t−1} + B_{t−1}) / 2⌋
    *   B_t = ⌊(S_t − S_{t−1} + B_{t−1}) / 2⌋      (S_1 = x_1, B_1 = 0)
    *
    * on micro-scaled integers (x = exact decimal day-sum × 10⁶), where
    * ⌊/2⌋ is `shiftright(·,1)` (arithmetic shift = floor for negatives
    * too) — the whole recursion is integer-exact and the DuckDB twin
    * replays it as a recursive CTE with the sign-safe floor-div.
    *
    * Scale shape: the sequential recursion rides a PER-KEY ordered
    * array fold (one groupBy exchange; keys parallel, state bounded by
    * days-per-key — time-bounded by definition); no driver loop, no
    * per-row UDF. This is the engine's pattern for order-dependent
    * per-key state in batch (the streaming twin is mapGroupsWithState). */
  def holtDaily(df: DataFrame, groupCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val daily = df
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("day"))
      .agg((sum(col(valCol).cast(DecimalType(18, 6))) * lit(1000000))
        .cast("long").as("x"))
    val series = daily.groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("day"), col("x"))))
        .as("ser"))
    val stT = "array<struct<day:date,x:bigint,s:bigint,b:bigint>>"
    val folded = series.withColumn("states",
      aggregate(col("ser"), expr(s"cast(array() as $stT)"),
        (acc, e) => {
          val prev = element_at(acc, -1)
          val sNew = shiftright(e("x") + prev("s") + prev("b"), 1)
          val bNew = shiftright(sNew - prev("s") + prev("b"), 1)
          when(size(acc) === 0,
            array(struct(e("day").as("day"), e("x").as("x"),
              e("x").as("s"), lit(0L).as("b"))))
          .otherwise(concat(acc, array(struct(e("day").as("day"),
            e("x").as("x"), sNew.as("s"), bNew.as("b")))))
        }))
    folded.select(col("g").as(groupCol), explode(col("states")).as("st"))
      .select(col(groupCol), Det.fmtDate(col("st.day")).as("day"),
        col("st.x").as("x_micro"), col("st.s").as("s_micro"),
        col("st.b").as("b_micro"))
      .withColumn("forecast_micro", col("s_micro") + col("b_micro"))
      .orderBy(col(groupCol), col("day"))
  }

  /** WEEK-OVER-WEEK DELTAS, calendar-correct: each day's exact total
    * joined to the SAME WEEKDAY one week earlier — a self-join on
    * `day − 7`, not a `lag(7)` row offset, so a missing day can never
    * silently shift the comparison onto the wrong weekday (the classic
    * row-lag bug in period-over-period reports). Totals are exact
    * decimal day sums; the pct delta is one IEEE divide. Days without
    * a week-ago counterpart are omitted (every output cell non-null).
    * Plan: one daily pre-agg [corpus shuffle], then a self-join of the
    * small daily table on (group, day−7). */
  def weekOverWeek(df: DataFrame, groupCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val daily = df
      .groupBy(col(groupCol).as("g"), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valCol).cast(DecimalType(27, 6))).cast("double")
        .as("total"))
    val prev = daily.select(col("g").as("_pg"), col("day").as("_pday"),
      col("total").as("prev_total"))
    daily
      .join(prev, daily("g") === prev("_pg") &&
        prev("_pday") === date_sub(daily("day"), 7))
      .select(col("g").as(groupCol), Det.fmtDate(col("day")).as("day"),
        col("total"), col("prev_total"),
        ((col("total") - col("prev_total")) * lit(100.0) /
          col("prev_total")).as("delta_pct"))
      .orderBy(col(groupCol), col("day"))
  }

  /** TWO-PROPORTION z-TEST per group across a split instant — the
    * rate-metric member of the drift family (Welch [[abTest]] covers
    * means; this covers conversion-style proportions, here
    * P(value > threshold)). Pooled-variance z from exact integer
    * counts through ONE pinned IEEE sequence:
    *
    *   z = (k_b/n_b − k_a/n_a) / sqrt(p̂(1−p̂)(1/n_b + 1/n_a)),
    *   p̂ = (k_b + k_a)/(n_b + n_a)
    *
    * One conditional-agg scan. */
  def propTest(df: DataFrame, groupCol: String, tsCol: String,
      valCol: String, threshold: Double,
      splitAt: java.sql.Timestamp): DataFrame = {
    val before = col(tsCol) < lit(splitAt)
    val hit = col(valCol) > lit(threshold)
    df.groupBy(col(groupCol))
      .agg(
        sum(when(before, 1L).otherwise(0L)).as("n_before"),
        sum(when(!before, 1L).otherwise(0L)).as("n_after"),
        sum(when(before && hit, 1L).otherwise(0L)).as("k_before"),
        sum(when(!before && hit, 1L).otherwise(0L)).as("k_after"))
      .withColumn("_pb",
        col("k_before").cast("double") / col("n_before").cast("double"))
      .withColumn("_pa",
        col("k_after").cast("double") / col("n_after").cast("double"))
      .withColumn("_pp",
        (col("k_before") + col("k_after")).cast("double") /
          (col("n_before") + col("n_after")).cast("double"))
      // degenerate pooled rates (no hits or all hits) carry no
      // evidence of a rate DIFFERENCE — define z = 0 there instead of
      // 0/0 (mirrored in the twin); groups missing a side are dropped
      .filter(col("n_before") > 0 && col("n_after") > 0)
      .withColumn("z_stat",
        when(col("_pp") === 0.0 || col("_pp") === 1.0, lit(0.0))
          .otherwise((col("_pb") - col("_pa")) /
            sqrt(col("_pp") * (lit(1.0) - col("_pp")) *
              (lit(1.0) / col("n_before").cast("double") +
                lit(1.0) / col("n_after").cast("double")))))
      .select(col(groupCol), col("n_before"), col("n_after"),
        col("k_before"), col("k_after"), col("z_stat"))
      .orderBy(col(groupCol))
  }

  /** TRENDING ENTITIES by exponentially decayed activity: each event
    * contributes weight `2²⁰ >> (age_days div h)` toward its key (a
    * half-life of `h` days in POWER-OF-TWO decay — the EWMA/Holt
    * dyadic discipline applied to counting), so recent activity
    * dominates without dropping history at a hard cutoff. All integer:
    * the variable shift is exact in any engine, sums are longs, and
    * the top-k ranking needs no floating point at all. Events older
    * than 62·h days clamp to weight 0 (shift bound).
    *
    * Plan: weight is a map-side projection; one key groupBy with
    * map-side combine; distributed top-k. */
  def trending(df: DataFrame, keyCol: String, tsCol: String,
      asOf: java.sql.Timestamp, halfLifeDays: Int, k: Int): DataFrame = {
    val age = datediff(lit(asOf).cast("date"), to_date(col(tsCol)))
    val scored = df
      .select(col(keyCol).as("key"), age.as("_age"))
      .filter(col("_age") >= 0)
      .withColumn("w", expr(
        s"shiftright(1048576L, cast(least(_age div $halfLifeDays, 62)" +
          " as int))"))
      .groupBy(col("key"))
      .agg(sum(col("w")).as("score"), count(lit(1)).as("n_events"))
    val top = scored.orderBy(desc("score"), asc("key")).limit(k)
    val w = Window.orderBy(desc("score"), asc("key"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("key"), col("score"), col("n_events"))
  }

  /** WELCH'S t A/B TEST per group across a split instant — the
    * parametric member of the drift family ([[ksDrift]] = shape,
    * [[psiDrift]] = mix, this = mean difference scaled by pooled
    * uncertainty). Every ingredient is an exact decimal sum cast to
    * double, assembled in ONE pinned IEEE op sequence (the
    * [[zscoreAnomalies]] discipline), so the t statistic is
    * bit-identical cross-engine:
    *
    *   v = (n·Σx² − (Σx)²) / (n·(n−1))       per side (sample var)
    *   t = (m_b − m_a) / sqrt(v_b/n_b + v_a/n_a)
    *
    * One scan: all eight aggregates ride a single conditional agg. */
  def abTest(df: DataFrame, groupCol: String, tsCol: String,
      valCol: String, splitAt: java.sql.Timestamp): DataFrame = {
    val before = col(tsCol) < lit(splitAt)
    val v = col(valCol)
    val agg = df.groupBy(col(groupCol))
      .agg(
        sum(when(before, 1L).otherwise(0L)).as("n_before"),
        sum(when(!before, 1L).otherwise(0L)).as("n_after"),
        sum(when(before, v.cast(DecimalType(27, 6)))).cast("double")
          .as("_sb"),
        sum(when(!before, v.cast(DecimalType(27, 6)))).cast("double")
          .as("_sa"),
        sum(when(before, v.cast(DecimalType(13, 2)) *
          v.cast(DecimalType(13, 2)))).cast("double").as("_qb"),
        sum(when(!before, v.cast(DecimalType(13, 2)) *
          v.cast(DecimalType(13, 2)))).cast("double").as("_qa"))
    agg
      .withColumn("mean_before", col("_sb") / col("n_before").cast("double"))
      .withColumn("mean_after", col("_sa") / col("n_after").cast("double"))
      .withColumn("_vb",
        (col("n_before").cast("double") * col("_qb") - col("_sb") * col("_sb"))
          / (col("n_before").cast("double") *
            (col("n_before") - 1).cast("double")))
      .withColumn("_va",
        (col("n_after").cast("double") * col("_qa") - col("_sa") * col("_sa"))
          / (col("n_after").cast("double") *
            (col("n_after") - 1).cast("double")))
      .withColumn("t_stat",
        (col("mean_before") - col("mean_after")) /
          sqrt(col("_vb") / col("n_before").cast("double") +
            col("_va") / col("n_after").cast("double")))
      .select(col(groupCol), col("n_before"), col("n_after"),
        col("mean_before"), col("mean_after"), col("t_stat"))
      .orderBy(col(groupCol))
  }

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV drift statistic per group, exact:
    * D = max_x |F_before(x) − F_after(x)| between the value
    * distributions on each side of a split instant — the
    * full-distribution train/serve shift test ([[temporalDrift]] sees
    * only mean/volume shifts; KS sees shape). The statistic is kept as
    * the INTEGER numerator `ks_num = max_x |c_b(x)·n_a − c_a(x)·n_b|`
    * over the common denominator n_b·n_a (counts < 2³¹ ⇒ products
    * < 2⁶² — exact), so max AND argmax (`ks_at`, smallest value on
    * ties) are hash-exact; the double `ks` is ONE IEEE divide of exact
    * integers. Plan: one (group, value) pre-aggregation, one group-keyed
    * window for the two cumulative counts (the same single exchange both
    * CDFs ride), one final agg. No driver state, no collect. */
  def ksDrift(df: DataFrame, groupCol: String, tsCol: String,
      valCol: String, splitAt: java.sql.Timestamp): DataFrame = {
    val before = col(tsCol) < lit(splitAt)
    val perValue = df
      .select(col(groupCol).as("g"), col(valCol).as("v"), before.as("b"))
      .groupBy(col("g"), col("v"))
      .agg(sum(when(col("b"), 1L).otherwise(0L)).as("db"),
        sum(when(!col("b"), 1L).otherwise(0L)).as("da"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("g"))
    val cdf = perValue
      .withColumn("cb", sum(col("db")).over(wCum))
      .withColumn("ca", sum(col("da")).over(wCum))
      .withColumn("nb", sum(col("db")).over(wTot))
      .withColumn("na", sum(col("da")).over(wTot))
      .withColumn("diff", abs(col("cb") * col("na") - col("ca") * col("nb")))
    cdf.groupBy(col("g").as(groupCol))
      .agg(max(col("nb")).as("n_before"), max(col("na")).as("n_after"),
        max(col("diff")).as("ks_num"),
        min_by(col("v"), struct((-col("diff")).as("a"), col("v").as("b")))
          .as("ks_at"))
      .withColumn("ks", col("ks_num").cast("double") /
        (col("n_before") * col("n_after")).cast("double"))
      .orderBy(col(groupCol))
  }

  /** POPULATION STABILITY INDEX over a categorical bucket column,
    * before/after a split instant, in the engine's 1/64-bit fixed-point
    * log₂ ([[NaiveBayes.lg64]]) so the score is integer-exact:
    *
    *   psi64 = Σ_buckets (c_b·n_a − c_a·n_b) · (lg64(c_b·n_a) − lg64(c_a·n_b))
    *
    * i.e. Σ (p−q)·log₂(p/q) scaled by 64·n_b·n_a, with add-one
    * smoothing on the bucket counts (PSI is undefined on empty cells).
    * Both factors are ≥-0-signed together, so psi64 ≥ 0 like true PSI.
    * One scan: bucket counts are a groupBy whose output is
    * |buckets|-bounded; totals broadcast back. Output one row per
    * bucket plus the contribution, so the monitor shows WHERE the
    * shift lives (the reference's health-check style). */
  def psiDrift(df: DataFrame, bucketCol: String, tsCol: String,
      splitAt: java.sql.Timestamp): DataFrame = {
    val before = col(tsCol) < lit(splitAt)
    val counts = df
      .select(col(bucketCol).as("bucket"), before.as("b"))
      .groupBy(col("bucket"))
      .agg((sum(when(col("b"), 1L).otherwise(0L)) + 1L).as("cb"),
        (sum(when(!col("b"), 1L).otherwise(0L)) + 1L).as("ca"))
    val totals = counts.agg(sum(col("cb")).as("nb"), sum(col("ca")).as("na"))
    counts.crossJoin(broadcast(totals))
      .withColumn("pn", col("cb") * col("na"))
      .withColumn("qn", col("ca") * col("nb"))
      .withColumn("psi64",
        (col("pn") - col("qn")) *
          (NaiveBayes.lg64(col("pn")) - NaiveBayes.lg64(col("qn"))))
      .select(col("bucket"), col("cb"), col("ca"), col("psi64"))
      .orderBy(col("bucket"))
  }

  /** DATASET RELEASE MANIFEST — the reproducibility audit a curated
    * training set ships with: per pipeline stage, the surviving row
    * count AND an ORDER-INDEPENDENT content fingerprint (sum of 48-bit
    * md5 folds of the ids, as DECIMAL(38,0) — overflow-free past 10²³
    * rows and commutative, so the fingerprint is a property of the SET,
    * computable under any partitioning and mergeable across shards).
    * Re-running the pipeline anywhere must reproduce every (n, fp)
    * pair exactly, or the release differs — the cheap equality witness
    * that replaces shipping full id lists. Each stage is one map-side
    * agg; stages evaluate independently (no barrier). */
  def datasetManifest(stages: Seq[(String, DataFrame)],
      idCol: String): DataFrame = {
    def hexVal(c: org.apache.spark.sql.Column) =
      when(c >= 97, c - 87).otherwise(c - 48)
    stages.zipWithIndex.map { case ((name, df), i) =>
      val hh = md5(concat(lit("mf:"), col(idCol).cast("string")))
      val v = (1 to 12).map { j =>
        hexVal(ascii(substring(hh, j, 1))).cast("long") *
          lit(BigInt(16).pow(12 - j).toLong)
      }.reduce(_ + _)
      df.select(v.cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("__v"))
        .agg(count(lit(1)).as("n_rows"), sum(col("__v")).as("fp"))
        .select(lit(i.toLong).as("stage_no"), lit(name).as("stage"),
          col("n_rows"), col("fp").cast("decimal(38,0)").as("fp"))
    }.reduce(_ unionByName _).orderBy(col("stage_no"))
  }
}
