package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-family operators (SURVEY.md §2.5).
  *
  * All take explicit tiebreaker columns: at 100 TB there WILL be equal
  * event-times within a key, and a nondeterministic `orderBy(desc(ts))` makes
  * results run-order dependent — every ordering here is total.
  */
object Windows {

  /** NATIVE session-window sessionization: the same gap semantics
    * expressed through Spark's built-in `session_window` aggregation —
    * the formulation that runs UNCHANGED as a watermarked streaming query
    * (this is its batch/oracle twin; [[sessionize]] is the lag+running-sum
    * classic). One semantic difference, pinned deliberately: built-in
    * session windows MERGE only while the next event starts strictly
    * inside `last_ts + gap`, so an exactly-gap-sized silence BREAKS the
    * session here (≥) where [[sessionize]]'s lag formulation keeps it
    * (>). The twin mirrors ≥. `session_end` is the window's exclusive
    * end (`max(ts) + gap`) — the streaming emission timestamp — not the
    * last event time. One shuffle: the session_window groupBy partial-
    * aggregates map-side like any hash aggregation. */
  def sessionizeNative(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, gapMinutes: Int): DataFrame =
    events
      .groupBy(session_window(col(tsCol), s"$gapMinutes minutes"),
        col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        graft.Det.dsum(col(valueCol)).as("total_value"))
      .select(col(keyCol),
        graft.Det.fmtTs(col("session_window.start")).as("session_start"),
        graft.Det.fmtTs(col("session_window.end")).as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy(col(keyCol), col("session_start"))

  /** W-ext — gap-based SESSIONIZATION: events of one key separated by more
    * than `gapMinutes` of event-time start a new session; per-session
    * aggregates come out of the same two shuffles every windowed query pays
    * (one hash partition on the key for lag + running sum, one for the
    * session groupBy — and with the partial aggregate map-side combined).
    * Boundary flags compare epoch-microsecond BIGINTs (exact cross-engine);
    * the (ts, tiebreak) total order makes tied timestamps deterministic —
    * ties can never split a session (gap 0), but the RUNNING sum that
    * numbers sessions needs a total order to be reproducible.
    * Output: (key, session_id 1..n, session_start, session_end, n_events,
    * total_value). Streaming twin: `session_window` (StreamsSpec). */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, valueCol: String, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val gapUs = gapMinutes * 60L * 1000000L
    val lagTs = lag(col(tsCol), 1).over(w)
    val isNew = when(lagTs.isNull ||
      unix_micros(col(tsCol)) - unix_micros(lagTs) > gapUs, 1L).otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_id", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        graft.Det.fmtTs(min(col(tsCol))).as("session_start"),
        graft.Det.fmtTs(max(col(tsCol))).as("session_end"),
        count(lit(1)).as("n_events"),
        graft.Det.dsum(col(valueCol)).as("total_value"))
      .orderBy(col(keyCol), col("session_id"))
  }

  /** W-ext — sessionization with a PER-KEY gap: each entity carries its own
    * inactivity threshold from a config dimension (the reference's
    * per-priority collection offsets — highest/high/medium entities have
    * different cadences, so one global gap mis-splits). Same two shuffles as
    * [[sessionize]]; the gap dim rides in on a BROADCAST join (config tables
    * are small by nature — never let a config lookup add a shuffle).
    * Unconfigured keys fall back to `defaultGapMinutes`. */
  def sessionizeKeyedGap(events: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, valueCol: String, gaps: DataFrame,
      gapMinutesCol: String, defaultGapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val gapUs = coalesce(col(gapMinutesCol),
      lit(defaultGapMinutes)).cast("long") * 60L * 1000000L
    val lagTs = lag(col(tsCol), 1).over(w)
    val isNew = when(lagTs.isNull ||
      unix_micros(col(tsCol)) - unix_micros(lagTs) > gapUs, 1L).otherwise(0L)
    events
      .join(broadcast(gaps), Seq(keyCol), "left")
      .withColumn("__new", isNew)
      .withColumn("session_id", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        graft.Det.fmtTs(min(col(tsCol))).as("session_start"),
        graft.Det.fmtTs(max(col(tsCol))).as("session_end"),
        count(lit(1)).as("n_events"),
        graft.Det.dsum(col(valueCol)).as("total_value"))
      .orderBy(col(keyCol), col("session_id"))
  }

  /** W1 — latest row per group (reference `upcoming_games_with_odds` view,
    * database_schema.sql:161-166): `ROW_NUMBER() OVER (PARTITION BY keys
    * ORDER BY ts DESC) = 1`. One shuffle on the partition keys. */
  def latestPerGroup(df: DataFrame, keys: Seq[String], ts: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(desc(ts), desc(tiebreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** W2 — LAG movement detection (discord_integration.py:477-498): previous
    * value per key ordered by event time, plus relative change; caller
    * filters on `abs(rel_change) > threshold`. */
  def withLagMovement(df: DataFrame, keys: Seq[String], ts: String,
      tiebreak: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(asc(ts), asc(tiebreak))
    df.withColumn("prev_value", lag(col(valueCol), 1).over(w))
      .withColumn("rel_change",
        when(col("prev_value").isNotNull && col("prev_value") =!= 0,
          (col(valueCol) - col("prev_value")) / col("prev_value")))
  }

  /** W3 — first-vs-last per partition (streamlit_dashboard.py:369-394:
    * opening vs current odds pct-change). Implemented as a plain aggregation
    * with `min_by`/`max_by` instead of an UNBOUNDED..UNBOUNDED window frame:
    * one shuffle, partial aggregation map-side, no per-partition sort. */
  def firstLastPctChange(df: DataFrame, keys: Seq[String], ts: String,
      tiebreak: String, valueCol: String): DataFrame = {
    // min_by/max_by need a total order too: pack (ts, tiebreak) in a struct —
    // struct ordering is lexicographic, so ties on ts fall to the tiebreaker.
    val ord = struct(col(ts), col(tiebreak))
    df.groupBy(keys.map(col): _*)
      .agg(
        min_by(col(valueCol), ord).as("first_value"),
        max_by(col(valueCol), ord).as("last_value"),
        count(lit(1)).as("n_obs"))
      .withColumn("pct_change",
        when(col("first_value") =!= 0,
          (col("last_value") - col("first_value")) / col("first_value") * 100))
  }

  /** W4 — per-group tail(1) (streamlit_dashboard.py:359) is latestPerGroup
    * with a different key set; exposed for name parity. */
  def perGroupTail1(df: DataFrame, keys: Seq[String], ts: String,
      tiebreak: String): DataFrame = latestPerGroup(df, keys, ts, tiebreak)

  /** J9 — as-of lookup: latest `right` row with rightTs <= leftTs per key.
    *
    * Scale design: this is the union-merge formulation — tag both sides,
    * union, ONE shuffle on the key, ONE sort by (ts, side), then
    * `last(value, ignoreNulls)` over the running frame picks the most recent
    * right-side attributes for every left row. No per-row subquery, no range
    * join explosion; cost is a single sort-merge pass even at 100 TB.
    *
    * @param left      probe side (keeps all rows)
    * @param right     quote side (supplies `attrCols` as-of leftTs)
    * @param key       equi-key column name present in both
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param attrCols  columns of `right` carried to the output (prefixed asof_)
    */
  /** Cohort retention matrix: users bucketed by first-seen week, then for
    * each (cohort_week, week_offset) the count of cohort members active
    * that week — the canonical retention triangle. Weeks are Monday-start
    * `date_trunc('week', …)` in both engines; the offset is an exact
    * integer day-diff div 7.
    *
    * Scale shape: the cohort week is a per-user window min over ONE user
    * shuffle; the (user, cohort, week) de-dup groupBy reuses that same
    * user-hashed exchange prefix, and the final (cohort, offset) count is
    * map-side-combined — bytes on the wire ∝ users·active-weeks, then
    * ∝ cohort·offset cells. No join back of a per-user aggregate. */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val wUser = Window.partitionBy(col(userCol))
    val cells = events.select(col(userCol).as("user_id"),
        date_trunc("week", col(tsCol)).as("week"))
      .withColumn("cohort_week", min(col("week")).over(wUser))
      .select(col("user_id"), col("cohort_week"), col("week")).distinct()
      .withColumn("week_offset",
        expr("datediff(week, cohort_week) div 7").cast("long"))
    cells.groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(graft.Det.fmtDate(col("cohort_week")).as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  /** Time-range rolling aggregate: per key, count and deterministic sum
    * of `valCol` over the trailing `windowUs` microseconds at every event
    * — a RANGE window over the epoch-µs axis (a ROWS frame counts rows,
    * not time; this is the 7-day-moving-average shape). Sum is exact
    * decimal then one double cast ([[graft.Det.dsum]] discipline), so the
    * result hash-matches any engine. One shuffle on the key; both frame
    * aggregates share one window spec and one sort. */
  def rollingRange(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, windowUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowUs, 0)
    events.select(col(keyCol), col(tsCol), col(idCol), col(valCol))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win",
        sum(col(valCol).cast(org.apache.spark.sql.types.DecimalType(27, 6)))
          .over(w).cast("double"))
      .select(col(keyCol), col(idCol), graft.Det.fmtTs(col(tsCol)).as("ts"),
        col("n_win"), col("sum_win"))
  }

  /** Variable-duration INTERVAL MERGE (gaps-and-islands): each row opens an
    * interval [start, start + duration) and per key all transitively
    * overlapping intervals collapse into one island. Unlike gap-based
    * [[sessionize]] (fixed horizon from the PREVIOUS event), a long interval
    * can swallow many later-starting shorter ones — so the island test is
    * start ≥ running-max-of-END over all PRIOR rows (half-open: touching
    * at the boundary does not merge), not a lag gap. Both the
    * running max and the island-numbering running sum share one key exchange
    * and one sort; the island groupBy is map-side combined. All boundary
    * math is epoch-µs BIGINT (exact cross-engine).
    *
    * @param durUsCol expression yielding the interval length in µs (must be
    *                 exact integer arithmetic for cross-engine hashing)
    */
  def intervalMerge(events: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, durUsCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__start_us"), col(tiebreakCol))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__start_us", unix_micros(col(tsCol)))
      .withColumn("__end_us", col("__start_us") + durUsCol)
      .withColumn("__prev_max_end", max(col("__end_us")).over(prior))
      .withColumn("__new", when(col("__prev_max_end").isNull ||
        col("__start_us") >= col("__prev_max_end"), 1L).otherwise(0L))
      .withColumn("island_id", sum(col("__new")).over(run))
      .groupBy(col(keyCol), col("island_id"))
      .agg(
        min(col("__start_us")).as("island_start_us"),
        max(col("__end_us")).as("island_end_us"),
        count(lit(1)).as("n_intervals"))
      .orderBy(col(keyCol), col("island_id"))
  }

  /** LAST-TOUCH ATTRIBUTION: each conversion event is credited to the most
    * recent non-conversion event of the same key within `horizonUs`, else
    * 'none'. The carry is a `last(..., ignoreNulls)` over ROWS UNBOUNDED
    * PRECEDING..1 PRECEDING — one key exchange, one sort, no self-join
    * (the naive formulation is an as-of self-join; the window form reuses
    * the exchange every other per-key query pays). Totally ordered on
    * (epoch-µs, tiebreak) so same-µs rows attribute identically everywhere.
    * Output: conversions per attributed channel. */
  def lastTouchAttribution(events: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, typeCol: String, conversionType: String,
      horizonUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us"), col(tiebreakCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col(typeCol) =!= conversionType, col(typeCol))
    val touchUs = when(col(typeCol) =!= conversionType, col("__us"))
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__touch", last(touch, ignoreNulls = true).over(w))
      .withColumn("__touch_us", last(touchUs, ignoreNulls = true).over(w))
      .where(col(typeCol) === conversionType)
      .withColumn("channel",
        when(col("__touch_us").isNotNull &&
          col("__us") - col("__touch_us") <= horizonUs, col("__touch"))
          .otherwise(lit("none")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"))
      .orderBy(col("channel"))
  }

  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, attrCols: Seq[String],
      rightTiebreak: String): DataFrame =
    asOfJoinKeys(left, right, Seq(key -> key), leftTs, rightTs, attrCols,
      rightTiebreak)

  /** J9-ext — MULTI-KEY as-of join: latest `right` row with rightTs <=
    * leftTs per COMPOSITE key (e.g. per (team, league) instead of per
    * team). Same union-merge formulation as [[asOfJoin]] — tag both sides,
    * union, ONE shuffle on the key tuple, one sort pass — the shuffle key
    * is just wider, so widening the key costs nothing at any scale (it
    * only makes partitions more numerous and smaller).
    *
    * @param keys (left column, right column) pairs forming the equi-key;
    *             the sides may name the key differently
    */
  def asOfJoinKeys(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)], leftTs: String, rightTs: String,
      attrCols: Seq[String], rightTiebreak: String): DataFrame = {
    val leftCols = left.columns
    val kcols = keys.indices.map(i => s"__k$i")
    // side 0 = quote (right), side 1 = probe (left): on equal timestamps the
    // quote sorts first so it IS visible to the probe (<= semantics).
    // All attrCols ride in ONE struct so last(ignoreNulls) is all-or-nothing:
    // a quote row with a legitimately-NULL attribute still supplies that null
    // (never an older quote's value) — attributes always come from the SAME
    // as-of row.
    val taggedRight = right.select(
      (keys.zip(kcols).map { case ((_, rk), k) => col(rk).as(k) } ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
          col(rightTiebreak).as("__tb"),
          struct(attrCols.map(col): _*).as("__a"))): _*)
    val taggedLeft = left.select(
      (keys.zip(kcols).map { case ((lk, _), k) => col(lk).as(k) } ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.toIndexedSeq.map(col)): _*)
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    // quotes with equal __ts are totally ordered by __tb (latest wins);
    // probe rows carry __tb = null and sort last within their (ts, side) slot
    // — irrelevant for ordering since probes contribute no __a.
    val w = Window.partitionBy(kcols.map(col): _*)
      .orderBy(asc("__ts"), asc("__side"), asc_nulls_last("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = unioned.withColumn("__asof",
      last(col("__a"), ignoreNulls = true).over(w))
    withAsof.filter(col("__side") === 1)
      .select((leftCols.toIndexedSeq.map(col) ++
        attrCols.map(c => col("__asof").getField(c).as(s"asof_$c"))): _*)
  }
}
