package graft.queries

import graft.{Det, Tables}
import graft.operators.Windows
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-family queries (SURVEY.md §2.5) + the as-of join (J9). */
object WindowQueries {

  /** Flagship (M1 slice): latest event per user (W1) enriched through the
    * canonical broadcast dim chain (J1), time-filtered (P2), ordered (O1) —
    * the reference's `upcoming_games_with_odds` view shape
    * (database_schema.sql:144-169) on testdata. */
  val qFlagship = GQuery("q_flagship",
    (s, d) => {
      val latest = Windows.latestPerGroup(
        Tables.events(s, d), Seq("user_id"), "ts", "event_id")
      latest
        .join(broadcast(Tables.customer(s, d)),
          col("user_id") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("ts") >= lit("2024-01-05").cast("timestamp"))
        .select(col("user_id"), col("event_id"),
          Det.fmtTs(col("ts")).as("ts_s"), col("event_type"), col("value"),
          col("c_name"), col("n_name"), col("r_name"))
        .orderBy(col("user_id"))
    },
    Some(s"""WITH latest AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      SELECT user_id, event_id, ${Det.sqlFmtTs("ts")} AS ts_s, event_type,
        value, c_name, n_name, r_name
      FROM latest
      JOIN customer ON user_id = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE rn = 1 AND ts >= TIMESTAMP '2024-01-05'
      ORDER BY user_id"""))

  /** W1/J3 — latest-per-group then join back (attach latest h2h odds per
    * fixture, database_schema.sql:161-166): latest event per user
    * right-joined to all customers (customers without events keep nulls). */
  val qLatestPerGroup = GQuery("q_latest_per_group",
    (s, d) => {
      val latest = Windows.latestPerGroup(
        Tables.events(s, d), Seq("user_id"), "ts", "event_id")
      Tables.customer(s, d)
        .join(latest, col("c_custkey") === col("user_id"), "left_outer")
        .select(col("c_custkey"), col("event_id"), col("event_type"),
          col("value"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH latest AS (
        SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1)
      SELECT c_custkey, event_id, event_type, value
      FROM customer LEFT JOIN latest ON c_custkey = user_id
      ORDER BY c_custkey"""))

  /** W2 — LAG movement detection (odds-movement alert,
    * discord_integration.py:477-498): >50% value moves per (user, type). */
  val qLagMovement = GQuery("q_lag_movement",
    (s, d) => Windows.withLagMovement(Tables.events(s, d),
        Seq("user_id", "event_type"), "ts", "event_id", "value")
      .filter(abs(col("rel_change")) > 0.5)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("prev_value"), col("rel_change"))
      .orderBy(col("event_id")),
    Some("""WITH w AS (
        SELECT event_id, user_id, event_type, value,
          LAG(value) OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS prev_value
        FROM events)
      SELECT event_id, user_id, event_type, value, prev_value,
        (value - prev_value) / prev_value AS rel_change
      FROM w
      WHERE prev_value IS NOT NULL AND prev_value <> 0
        AND ABS((value - prev_value) / prev_value) > 0.5
      ORDER BY event_id"""))

  /** W3 — first-vs-last pct change per group (opening vs current odds,
    * streamlit_dashboard.py:369-394) via min_by/max_by — no window sort. */
  val qFirstLast = GQuery("q_first_last",
    (s, d) => Windows.firstLastPctChange(Tables.events(s, d),
        Seq("user_id"), "ts", "event_id", "value")
      .select(col("user_id"), col("first_value"), col("last_value"),
        col("n_obs"), col("pct_change"))
      .orderBy(col("user_id")),
    Some("""WITH ranked AS (
        SELECT user_id, value,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ra,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rd,
          COUNT(*) OVER (PARTITION BY user_id) AS n_obs
        FROM events)
      SELECT f.user_id, f.value AS first_value, l.value AS last_value,
        f.n_obs,
        CASE WHEN f.value <> 0
          THEN (l.value - f.value) / f.value * 100 END AS pct_change
      FROM (SELECT * FROM ranked WHERE ra = 1) f
      JOIN (SELECT * FROM ranked WHERE rd = 1) l ON f.user_id = l.user_id
      ORDER BY f.user_id"""))

  /** W4 — per-group tail(1) on a different key set (latest odds per
    * bookmaker, streamlit_dashboard.py:359). */
  val qGroupTail = GQuery("q_group_tail",
    (s, d) => Windows.perGroupTail1(Tables.events(s, d),
        Seq("user_id", "event_type"), "ts", "event_id")
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"))
      .orderBy(col("user_id"), col("event_type")),
    Some("""SELECT user_id, event_type, event_id, value FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
          ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** W5 — per-group rank top-N (top teams per league — the per-group
    * variant the reference plans, SURVEY.md §2.5): top-3 users by spend per
    * event_type. */
  val qRankInGroup = GQuery("q_rank_in_group",
    (s, d) => {
      val totals = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(Det.dsum(col("value")).as("total_value"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(desc("total_value"), col("user_id"))
      totals.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy(col("event_type"), col("rnk"))
    },
    Some(s"""SELECT event_type, user_id, total_value, rnk FROM (
        SELECT event_type, user_id, total_value,
          ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY total_value DESC, user_id) AS rnk
        FROM (SELECT event_type, user_id,
            ${Det.sqlDsum("value")} AS total_value
          FROM events GROUP BY event_type, user_id))
      WHERE rnk <= 3 ORDER BY event_type, rnk"""))

  /** W2 variant — running sum frame (ROWS UNBOUNDED PRECEDING..CURRENT):
    * cumulative value per user over time. */
  val qRunningSum = GQuery("q_running_sum",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("running_value",
          sum(col("value").cast("decimal(27,6)")).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("running_value"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id,
      CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER (PARTITION BY user_id
        ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_value
      FROM events ORDER BY event_id"""))

  /** J9 — as-of join: latest event value at/before each order's date for the
    * ordering user (stats-as-of-kickoff shape, SURVEY.md §2.3 J9), via the
    * single-shuffle union-merge formulation in [[Windows.asOfJoin]]. */
  val qAsOfJoin = GQuery("q_asof_join",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val ev = Tables.events(s, d).withColumnRenamed("user_id", "o_custkey")
      Windows.asOfJoin(o, ev,
        "o_custkey", "o_orderdate", "ts", Seq("value", "event_id"), "event_id")
        .select(col("o_orderkey"), col("asof_event_id").as("event_id"),
          col("asof_value").as("value"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, e.event_id AS event_id, e.value AS value
      FROM orders o ASOF LEFT JOIN events e
        ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate
      ORDER BY o_orderkey"""))

  /** J9-ext — as-of join with a STALENESS TOLERANCE: the matched quote must
    * be within 7 days of the probe or the attributes null out ("stats as of
    * kickoff, but only if fresh") — the guard that stops a year-old quote
    * from silently enriching today's row. Same single-shuffle union-merge;
    * the tolerance is a post-projection on the carried as-of timestamp,
    * mirrored by the twin as a CASE over DuckDB's ASOF join. */
  val qAsOfTolerance = GQuery("q_asof_tolerance",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val ev = Tables.events(s, d).withColumnRenamed("user_id", "o_custkey")
      val j = Windows.asOfJoin(o, ev,
        "o_custkey", "o_orderdate", "ts", Seq("value", "event_id", "ts"),
        "event_id")
      val within = unix_micros(col("o_orderdate")) -
        unix_micros(col("asof_ts")) <= lit(604800000000L) // 7 days in µs
      j.select(col("o_orderkey"),
          when(within, col("asof_event_id")).as("event_id"),
          when(within, col("asof_value")).as("value"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
        CASE WHEN epoch_us(o.o_orderdate) - epoch_us(e.ts) <= 604800000000
          THEN e.event_id END AS event_id,
        CASE WHEN epoch_us(o.o_orderdate) - epoch_us(e.ts) <= 604800000000
          THEN e.value END AS value
      FROM orders o ASOF LEFT JOIN events e
        ON o.o_custkey = e.user_id AND e.ts <= o.o_orderdate
      ORDER BY o_orderkey"""))

  /** J9-ext — MULTI-KEY as-of join with PER-KEY tolerance: the probe key is
    * (customer, event family) — the reference's per-team latest
    * (streamlit_dashboard.py:222-227) generalized to per-(team, league) —
    * and each event family carries its OWN staleness contract (clicks go
    * stale in 2 days, signups stay fresh for 90). One shuffle on the wider
    * key tuple ([[Windows.asOfJoinKeys]]); the tolerance is a family-keyed
    * post-projection on the carried as-of timestamp, mirrored by the twin
    * as a CASE over DuckDB's multi-equality ASOF join. */
  val qAsOfMultikey = GQuery("q_asof_multikey",
    (s, d) => {
      val etype = when(col("o_orderkey") % 5 === 0, "click")
        .when(col("o_orderkey") % 5 === 1, "error")
        .when(col("o_orderkey") % 5 === 2, "purchase")
        .when(col("o_orderkey") % 5 === 3, "signup")
        .otherwise("view")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          etype.as("etype"))
      val ev = Tables.events(s, d)
      val j = Windows.asOfJoinKeys(o, ev,
        Seq("o_custkey" -> "user_id", "etype" -> "event_type"),
        "o_orderdate", "ts", Seq("value", "event_id", "ts"), "event_id")
      val tolDays = when(col("etype") === "click", 2L)
        .when(col("etype") === "error", 30L)
        .when(col("etype") === "purchase", 7L)
        .when(col("etype") === "signup", 90L)
        .otherwise(1L)
      val within = unix_micros(col("o_orderdate")) -
        unix_micros(col("asof_ts")) <= tolDays * lit(86400000000L)
      j.select(col("o_orderkey"), col("etype"),
          when(within, col("asof_event_id")).as("event_id"),
          when(within, col("asof_value")).as("value"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH probe AS (
        SELECT o_orderkey, o_custkey, o_orderdate,
          CASE o_orderkey % 5 WHEN 0 THEN 'click' WHEN 1 THEN 'error'
            WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup'
            ELSE 'view' END AS etype
        FROM orders),
      tol AS (
        SELECT *, (CASE etype WHEN 'click' THEN 2 WHEN 'error' THEN 30
            WHEN 'purchase' THEN 7 WHEN 'signup' THEN 90 ELSE 1 END)
            * CAST(86400000000 AS BIGINT) AS tol_us
        FROM probe)
      SELECT o_orderkey, etype,
        CASE WHEN epoch_us(o.o_orderdate) - epoch_us(e.ts) <= o.tol_us
          THEN e.event_id END AS event_id,
        CASE WHEN epoch_us(o.o_orderdate) - epoch_us(e.ts) <= o.tol_us
          THEN e.value END AS value
      FROM tol o ASOF LEFT JOIN events e
        ON o.o_custkey = e.user_id AND o.etype = e.event_type
          AND e.ts <= o.o_orderdate
      ORDER BY o_orderkey"""))

  /** W-ext — gap-based sessionization (30-min event-time gap, the
    * reference's collection cadence): lag + running sum + session groupBy,
    * all epoch-microsecond-exact. [[Windows.sessionize]]; the streaming
    * formulation (`session_window`) is pinned equivalent in StreamsSpec. */
  val qSessionize = GQuery("q_sessionize",
    (s, d) => Windows.sessionize(Tables.events(s, d),
      "user_id", "ts", "event_id", "value", gapMinutes = 30),
    Some(s"""WITH lagd AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
            THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, event_id, ts, value,
          SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM lagd)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        ${Det.sqlFmtTs("MIN(ts)")} AS session_start,
        ${Det.sqlFmtTs("MAX(ts)")} AS session_end,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        ${Det.sqlDsum("value")} AS total_value
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  /** W-ext — NATIVE `session_window` sessionization ([[Windows
    * .sessionizeNative]]): the identical code path a watermarked
    * streaming query runs, oracle-gated in batch. Boundary semantics are
    * the built-in's (an exactly-gap silence BREAKS — ≥, vs the lag
    * formulation's >), and `session_end` is the exclusive window end
    * (`max(ts) + gap`), both mirrored in the twin. */
  val qSessionizeNative = GQuery("q_sessionize_native",
    (s, d) => Windows.sessionizeNative(Tables.events(s, d),
      "user_id", "ts", "value", gapMinutes = 30),
    Some(s"""WITH lagd AS (
        SELECT user_id, event_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
            THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts, value,
          SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM lagd)
      SELECT user_id,
        ${Det.sqlFmtTs("MIN(ts)")} AS session_start,
        ${Det.sqlFmtTs("MAX(ts) + INTERVAL 30 MINUTE")} AS session_end,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        ${Det.sqlDsum("value")} AS total_value
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, session_start"""),
    notes = "built-in session_window in batch — the streaming-native " +
      "formulation oracle-gated; >= boundary and exclusive end pinned")

  /** W-ext — per-key-gap sessionization: the gap comes from a broadcast
    * config dim (user_id % 3 → 5 / 30 / 120 min, mirrored in the twin), so
    * aggressive-gap keys split into many short sessions and lazy-gap keys
    * merge — a result a single global gap cannot produce. Every boundary
    * decision is still an epoch-µs BIGINT compare (exact cross-engine). */
  val qSessionizeKeyed = GQuery("q_sessionize_keyed",
    (s, d) => {
      val events = Tables.events(s, d)
      val gaps = events.select(col("user_id")).distinct()
        .withColumn("gap_minutes",
          when(col("user_id") % 3 === 0, 5)
            .when(col("user_id") % 3 === 1, 30)
            .otherwise(120))
      Windows.sessionizeKeyedGap(events, "user_id", "ts", "event_id",
        "value", gaps, "gap_minutes", defaultGapMinutes = 30)
    },
    Some(s"""WITH lagd AS (
        SELECT user_id, event_id, ts, value,
          (CASE user_id % 3 WHEN 0 THEN 5 WHEN 1 THEN 30
            ELSE 120 END) * CAST(60000000 AS BIGINT) AS gap_us,
          CASE WHEN lag(ts) OVER w IS NULL
            OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >
              (CASE user_id % 3 WHEN 0 THEN 5 WHEN 1 THEN 30
                ELSE 120 END) * CAST(60000000 AS BIGINT)
            THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, event_id, ts, value,
          SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM lagd)
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        ${Det.sqlFmtTs("MIN(ts)")} AS session_start,
        ${Det.sqlFmtTs("MAX(ts)")} AS session_end,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        ${Det.sqlDsum("value")} AS total_value
      FROM sess GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""))

  /** ORDERED FUNNEL ([[graft.operators.Funnel.funnelSteps]]): users who
    * did signup, then view, then purchase, in (ts, event_id) order — the
    * user-journey generalization of the reference's phase pipeline. One
    * shuffle on the user key; chained running-min windows share one
    * exchange + sort. The twin replays the identical window chain. */
  val qFunnel = GQuery("q_funnel",
    (s, d) => graft.operators.Funnel.funnelSteps(
      Tables.events(s, d), "user_id", "ts", "event_type", "event_id",
      Seq("signup", "view", "purchase")),
    Some("""WITH e AS (
        SELECT user_id, ts, event_type, event_id FROM events),
      s0 AS (
        SELECT *, CASE WHEN event_type = 'signup' THEN ts END AS hit0
        FROM e),
      r0 AS (
        SELECT *, MIN(hit0) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r0
        FROM s0),
      s1 AS (
        SELECT *, CASE WHEN event_type = 'view' AND r0 IS NOT NULL
          THEN ts END AS hit1
        FROM r0),
      r1 AS (
        SELECT *, MIN(hit1) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1
        FROM s1),
      s2 AS (
        SELECT *, CASE WHEN event_type = 'purchase' AND r1 IS NOT NULL
          THEN ts END AS hit2
        FROM r1),
      per AS (
        SELECT user_id, MIN(hit0) AS u0, MIN(hit1) AS u1, MIN(hit2) AS u2
        FROM s2 GROUP BY user_id),
      tot AS (
        SELECT COUNT(u0) AS c0, COUNT(u1) AS c1, COUNT(u2) AS c2 FROM per)
      SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name,
        CAST(c0 AS BIGINT) AS users FROM tot
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'view', CAST(c1 AS BIGINT) FROM tot
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'purchase', CAST(c2 AS BIGINT) FROM tot
      ORDER BY step"""),
    notes = "ordered 3-step funnel; chained running-min windows, one shuffle")

  /** Time-bounded funnel: step i must land within 12 h of the step-(i−1)
    * reach — every gap test an epoch-µs BIGINT compare, exact
    * cross-engine. Same one-exchange window chain as q_funnel. */
  val qFunnelWindowed = GQuery("q_funnel_windowed",
    (s, d) => graft.operators.Funnel.funnelSteps(
      Tables.events(s, d), "user_id", "ts", "event_type", "event_id",
      Seq("signup", "view", "purchase"), maxGapUs = Some(43200000000L)),
    Some("""WITH e AS (
        SELECT user_id, ts, event_type, event_id FROM events),
      s0 AS (
        SELECT *, CASE WHEN event_type = 'signup' THEN ts END AS hit0
        FROM e),
      r0 AS (
        SELECT *, MIN(hit0) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r0
        FROM s0),
      s1 AS (
        SELECT *, CASE WHEN event_type = 'view' AND r0 IS NOT NULL
          AND epoch_us(ts) - epoch_us(r0) <= 43200000000
          THEN ts END AS hit1
        FROM r0),
      r1 AS (
        SELECT *, MIN(hit1) OVER (PARTITION BY user_id
          ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r1
        FROM s1),
      s2 AS (
        SELECT *, CASE WHEN event_type = 'purchase' AND r1 IS NOT NULL
          AND epoch_us(ts) - epoch_us(r1) <= 43200000000
          THEN ts END AS hit2
        FROM r1),
      per AS (
        SELECT user_id, MIN(hit0) AS u0, MIN(hit1) AS u1, MIN(hit2) AS u2
        FROM s2 GROUP BY user_id),
      tot AS (
        SELECT COUNT(u0) AS c0, COUNT(u1) AS c1, COUNT(u2) AS c2 FROM per)
      SELECT CAST(1 AS BIGINT) AS step, 'signup' AS step_name,
        CAST(c0 AS BIGINT) AS users FROM tot
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'view', CAST(c1 AS BIGINT) FROM tot
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'purchase', CAST(c2 AS BIGINT) FROM tot
      ORDER BY step"""),
    notes = "12h-gap funnel; epoch-us integer gap tests, one user-key exchange")

  /** COHORT RETENTION ([[Windows.cohortRetention]]): the canonical
    * retention triangle — first-seen week × week offset × active users.
    * Monday-start week truncation and integer day-diff div 7 are exact
    * in both engines. */
  val qCohortRetention = GQuery("q_cohort_retention",
    (s, d) => Windows.cohortRetention(Tables.events(s, d), "user_id", "ts")
      .orderBy(col("cohort_week"), col("week_offset")),
    Some("""WITH c AS (
        SELECT user_id, date_trunc('week', ts) AS week,
          MIN(date_trunc('week', ts)) OVER (PARTITION BY user_id)
            AS cohort_week
        FROM events),
      cells AS (SELECT DISTINCT user_id, cohort_week, week FROM c)
      SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
        CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT)
          AS week_offset,
        CAST(COUNT(*) AS BIGINT) AS n_users
      FROM cells GROUP BY cells.cohort_week, week_offset
      ORDER BY cohort_week, week_offset"""),
    notes = "retention triangle; user-window min + de-dup reuse one exchange")

  /** TIME-RANGE ROLLING WINDOW ([[Windows.rollingRange]]): trailing-7-day
    * count + exact-decimal sum per user at every event — a RANGE frame
    * over epoch-µs (peers-inclusive, so deterministic even on timestamp
    * ties, unlike a ROWS frame). */
  val qRollingWindow = GQuery("q_rolling_window",
    (s, d) => Windows.rollingRange(Tables.events(s, d), "user_id", "ts",
        "event_id", "value", windowUs = 604800000000L)
      .orderBy(col("user_id"), col("event_id")),
    Some(s"""SELECT user_id, event_id,
        ${Det.sqlFmtTs("ts")} AS ts,
        CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
        CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER w AS DOUBLE) AS sum_win
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id"""),
    notes = "7-day trailing RANGE window; decimal-exact sum, peer-safe frame")

  /** VARIABLE-DURATION INTERVAL MERGE ([[Windows.intervalMerge]]): each
    * event opens a [ts, ts + value minutes) interval; transitively
    * overlapping intervals per user collapse to islands via a
    * running-max-of-end test (a long interval swallows later shorter ones —
    * a lag-gap CANNOT express this). value is 2-dp exact, so the duration
    * decimal multiply is an exact integer µs in both engines. */
  val qIntervalMerge = GQuery("q_interval_merge",
    (s, d) => Windows.intervalMerge(Tables.events(s, d), "user_id", "ts",
        "event_id",
        (col("value").cast(org.apache.spark.sql.types.DecimalType(27, 6))
          * lit(60000000L)).cast("long"))
      .orderBy(col("user_id"), col("island_id")),
    Some("""WITH iv AS (
        SELECT user_id, event_id, epoch_us(ts) AS start_us,
          epoch_us(ts)
            + CAST(CAST(value AS DECIMAL(27,6)) * 60000000 AS BIGINT)
            AS end_us
        FROM events),
      flags AS (
        SELECT user_id, event_id, start_us, end_us,
          CASE WHEN MAX(end_us) OVER wp IS NULL
                 OR start_us >= MAX(end_us) OVER wp THEN 1 ELSE 0 END
            AS is_new
        FROM iv
        WINDOW wp AS (PARTITION BY user_id ORDER BY start_us, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      isl AS (
        SELECT user_id, start_us, end_us,
          CAST(SUM(is_new) OVER (PARTITION BY user_id
            ORDER BY start_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS island_id
        FROM flags)
      SELECT user_id, island_id,
        MIN(start_us) AS island_start_us, MAX(end_us) AS island_end_us,
        CAST(COUNT(*) AS BIGINT) AS n_intervals
      FROM isl GROUP BY user_id, island_id
      ORDER BY user_id, island_id"""),
    notes = "variable-duration gaps-and-islands; running-max-of-end, one exchange")

  /** LAST-TOUCH ATTRIBUTION ([[Windows.lastTouchAttribution]]): purchases
    * credited to the most recent non-purchase event within 7 days, else
    * 'none' — ignoreNulls last() over a PRECEDING-only ROWS frame, no
    * as-of self-join. */
  val qAttribution = GQuery("q_attribution",
    (s, d) => Windows.lastTouchAttribution(Tables.events(s, d), "user_id",
      "ts", "event_id", "event_type", "purchase", 604800000000L),
    Some("""WITH t AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
          LAST_VALUE(CASE WHEN event_type <> 'purchase'
              THEN event_type END IGNORE NULLS) OVER w AS touch,
          LAST_VALUE(CASE WHEN event_type <> 'purchase'
              THEN epoch_us(ts) END IGNORE NULLS) OVER w AS touch_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      SELECT CASE WHEN touch_us IS NOT NULL AND us - touch_us <= 604800000000
          THEN touch ELSE 'none' END AS channel,
        CAST(COUNT(*) AS BIGINT) AS n_conversions
      FROM t WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY channel"""),
    notes = "7d last-touch; ignoreNulls carry over one user exchange, no self-join")

  /** W/ST-ext — time-bounded event correlation: every (view, purchase)
    * pair of the same user with the purchase strictly after the view and
    * within 30 minutes. This is the BATCH TWIN of the watermarked
    * stream-stream join [[graft.streaming.Streams.eventPairsStream]] —
    * the identical function body runs on the stream (equivalence pinned
    * in StreamsSpec), so this oracle gates both. One user_id shuffle;
    * the time range is a post-join filter over per-user pairs. */
  val qEventPairs = GQuery("q_event_pairs",
    (s, d) => graft.streaming.Streams.eventPairsStream(
        Tables.events(s, d), "view", "purchase", horizonMinutes = 30)
      .orderBy(col("user_id"), col("l_id"), col("r_id")),
    Some("""SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
        epoch_us(r.ts) - epoch_us(l.ts) AS gap_us
      FROM events l JOIN events r
        ON l.user_id = r.user_id
        AND l.event_type = 'view' AND r.event_type = 'purchase'
        AND epoch_us(r.ts) > epoch_us(l.ts)
        AND epoch_us(r.ts) <= epoch_us(l.ts) + 1800000000
      ORDER BY l.user_id, l_id, r_id"""),
    notes = "batch twin of the watermarked stream-stream join; epoch-us " +
      "exact window bounds")

  /** LEFT-OUTER twin of [[qEventPairs]] — every view, with its conversion
    * pairs where they exist and ONE null-r_id row where none do ("views
    * that never converted"). Gates the `joinType = "left_outer"` path of
    * the watermarked stream-stream join, whose incremental null emission
    * (on watermark close) StreamsSpec pins against this same batch body.
    * Null sort position is pinned NULLS LAST on both engines — Spark's
    * ASC default is nulls-first, DuckDB's is nulls-last. */
  /** STL-LITE ([[graft.operators.Analytics.stlLite]]): per-event-type
    * daily series decomposed into centered-7-day trend + day-of-week
    * seasonal + residual, all exact integer micro — the "is the spike
    * weekday rhythm or a real anomaly" separation that q_dow_profile
    * (index view) and q_holt (forecast view) bracket. */
  val qStlLite = GQuery("q_stl_lite",
    (s, d) => graft.operators.Analytics.stlLite(
        Tables.events(s, d), "event_type", "ts", "value")
      .withColumnRenamed("k", "event_type"),
    Some("""WITH daily AS (
        SELECT event_type AS k, CAST(ts AS DATE) AS day,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT)
            AS x
        FROM events GROUP BY 1, 2),
      t AS (SELECT k, day, x,
          SUM(x) OVER (PARTITION BY k ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tsum,
          COUNT(*) OVER (PARTITION BY k ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS tcnt,
          CAST(day - DATE '1970-01-05' AS BIGINT) % 7 AS dow
        FROM daily),
      t2 AS (SELECT *,
          (tsum - ((tsum % tcnt) + tcnt) % tcnt) // tcnt AS trend
        FROM t),
      t3 AS (SELECT *, x - trend AS det FROM t2),
      seas AS (SELECT k, dow,
          (SUM(det) - ((SUM(det) % COUNT(*)) + COUNT(*)) % COUNT(*))
            // COUNT(*) AS seasonal
        FROM t3 GROUP BY 1, 2)
      SELECT t3.k AS event_type, strftime(t3.day, '%Y-%m-%d') AS day,
        CAST(t3.x AS BIGINT) AS x_micro,
        CAST(t3.trend AS BIGINT) AS trend_micro,
        CAST(seas.seasonal AS BIGINT) AS seasonal_micro,
        CAST(t3.det - seas.seasonal AS BIGINT) AS resid_micro
      FROM t3 JOIN seas ON t3.k = seas.k AND t3.dow = seas.dow
      ORDER BY event_type, day"""),
    notes = "additive integer decomposition; windows and DOW agg over " +
      "the daily table only, sign-safe floor means")

  /** RFM SEGMENTATION — the classic customer-scoring pipeline op:
    * recency (days from last order to the 1998-08-02 anchor), frequency
    * (#orders), monetary (Σ totalprice in exact cents) per customer,
    * each quintiled by NTILE (ties broken by c_custkey so the bin edges
    * are deterministic in both engines — NTILE's fill order is
    * positional), composed into the 3-digit RFM code. Output: per-code
    * segment sizes. Plan: one orders groupBy (map-side combined), three
    * windows over the |customers|-row aggregate — never the fact table
    * — then a 125-row code agg. */
  val qRfm = GQuery("q_rfm",
    (s, d) => {
      val w = (c: org.apache.spark.sql.Column) =>
        org.apache.spark.sql.expressions.Window.orderBy(c, col("cust"))
      val per = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("cust"))
        .agg(datediff(lit("1998-08-02").cast("date"),
            max(col("o_orderdate"))).cast("long").as("rec_days"),
          count(lit(1)).as("freq"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("mon_cents"))
      per
        .withColumn("r", ntile(5).over(w(col("rec_days"))).cast("long"))
        .withColumn("f", ntile(5).over(w(desc_nulls_last("freq")))
          .cast("long"))
        .withColumn("m", ntile(5).over(w(desc_nulls_last("mon_cents")))
          .cast("long"))
        .withColumn("rfm_code", col("r") * 100 + col("f") * 10 + col("m"))
        .groupBy(col("rfm_code"))
        .agg(count(lit(1)).as("n_customers"), min(col("cust")).as("min_cust"))
        .orderBy(col("rfm_code"))
    },
    Some("""WITH per AS (
        SELECT o_custkey AS cust,
          CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
            DATE '1998-08-02') AS BIGINT) AS rec_days,
          COUNT(*) AS freq,
          SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS mon_cents
        FROM orders GROUP BY 1),
      scored AS (SELECT cust,
          NTILE(5) OVER (ORDER BY rec_days, cust) AS r,
          NTILE(5) OVER (ORDER BY freq DESC, cust) AS f,
          NTILE(5) OVER (ORDER BY mon_cents DESC, cust) AS m
        FROM per)
      SELECT CAST(r * 100 + f * 10 + m AS BIGINT) AS rfm_code,
        CAST(COUNT(*) AS BIGINT) AS n_customers,
        MIN(cust) AS min_cust
      FROM scored GROUP BY 1 ORDER BY rfm_code"""),
    notes = "NTILE quintiles with positional tie-breaks; windows over " +
      "the per-customer aggregate, not the fact table")

  val qEventPairsOuter = GQuery("q_event_pairs_outer",
    (s, d) => graft.streaming.Streams.eventPairsStream(
        Tables.events(s, d), "view", "purchase", horizonMinutes = 30,
        joinType = "left_outer")
      .orderBy(col("user_id"), col("l_id"), col("r_id").asc_nulls_last),
    Some("""SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
        epoch_us(r.ts) - epoch_us(l.ts) AS gap_us
      FROM events l LEFT JOIN events r
        ON l.user_id = r.user_id
        AND r.event_type = 'purchase'
        AND epoch_us(r.ts) > epoch_us(l.ts)
        AND epoch_us(r.ts) <= epoch_us(l.ts) + 1800000000
      WHERE l.event_type = 'view'
      ORDER BY l.user_id, l_id, r_id NULLS LAST"""),
    notes = "left-outer batch twin of the stream-stream join; unconverted " +
      "views surface as null r_id/gap_us")

  /** CUSUM changepoint statistic ([[graft.operators.Analytics.cusum]])
    * over each event type's daily-volume series: the high-side Page
    * test `S_i = max(0, S_{i-1} + (x_i - mu))`, computed non-recursively
    * via the prefix identity `S_i = P_i - min(P_1..P_i, 0)` (two stacked
    * windows, partition-parallel per series). Daily volumes quantized to
    * exact integer micros and mu by integer division, so the statistic
    * is hash-exact cross-engine. The oracle twin computes the SAME
    * prefix identity in DuckDB SQL; the spec re-derives the recursion
    * directly in Scala, pinning identity ≡ recursion. */
  val qChangepoint = GQuery("q_changepoint",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(sum(col("value").cast(org.apache.spark.sql.types
          .DecimalType(27, 6))).as("v"))
      graft.operators.Analytics.cusum(daily, "event_type", "d", "v")
        .select(col("k").as("event_type"), Det.fmtDate(col("t")).as("day"),
          col("x"), col("s"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
          CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
      ref AS (SELECT event_type, CAST(SUM(x) // COUNT(*) AS BIGINT) AS mu
        FROM daily GROUP BY 1),
      pre AS (
        SELECT daily.event_type, daily.d, daily.x,
          CAST(SUM(daily.x - ref.mu) OVER (PARTITION BY daily.event_type
            ORDER BY daily.d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS p
        FROM daily JOIN ref USING (event_type))
      SELECT event_type, strftime(d, '%Y-%m-%d') AS day, x,
        CAST(p - LEAST(MIN(p) OVER (PARTITION BY event_type ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
          AS BIGINT) AS s
      FROM pre ORDER BY event_type, day"""),
    notes = "Page CUSUM via prefix-sum/running-min identity; integer-" +
      "exact, spec pins identity against the textbook recursion")

  /** Lag-1 AUTOCORRELATION ([[graft.operators.Analytics.lagAutocorr]])
    * of each event type's daily-volume series: Pearson r over
    * (x_t, x_{t+1}) pairs with all Σ-terms in exact decimal and the
    * final r assembled in a pinned IEEE sequence
    * (num / (sqrt(d1) * sqrt(d2)), every operand cast from exact
    * integers) — hash-exact double with no golden. Seasonality /
    * burstiness probe for pipeline monitoring. */
  val qAutocorr = GQuery("q_autocorr",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg((sum(col("value").cast(org.apache.spark.sql.types
            .DecimalType(27, 6))) * lit(1000000))
          .cast("long").as("x"))
      graft.operators.Analytics.lagAutocorr(daily, "event_type", "d", "x")
        .orderBy(col("event_type"))
    },
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
          CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
      pairs AS (
        SELECT event_type, CAST(x AS HUGEINT) AS x,
          CAST(LEAD(x) OVER (PARTITION BY event_type ORDER BY d)
            AS HUGEINT) AS y
        FROM daily QUALIFY y IS NOT NULL),
      sums AS (
        SELECT event_type, COUNT(*) AS n_pairs,
          SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
          SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM pairs GROUP BY 1)
      SELECT event_type, n_pairs,
        CAST(CAST(n_pairs * sxy - sx * sy AS VARCHAR) AS DOUBLE) /
          (sqrt(CAST(CAST(n_pairs * sxx - sx * sx AS VARCHAR) AS DOUBLE)) *
           sqrt(CAST(CAST(n_pairs * syy - sy * sy AS VARCHAR) AS DOUBLE)))
          AS r
      FROM sums ORDER BY event_type"""),
    notes = "five exact sums -> pinned IEEE assembly; hash-exact r. " +
      "Oracle routes hugeint->double through VARCHAR: DuckDB's direct " +
      "hugeint->double cast is not correctly rounded (1-ulp off on this " +
      "data); strtod is, matching Spark's BigDecimal.doubleValue")

  /** THEIL-SEN robust slope ([[graft.operators.Analytics.theilSen]])
    * of each event type's daily-volume series: the median pairwise
    * slope — robust trend monitoring an outlier day cannot move (the
    * robust counterpart of q_linreg's OLS). Integer slope keys with a
    * positivity shift so truncating and flooring division agree. */
  val qTheilSen = GQuery("q_theilsen",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg((sum(col("value").cast(org.apache.spark.sql.types
            .DecimalType(27, 6))) * lit(1000000))
          .cast("long").as("x"))
      graft.operators.Analytics.theilSen(daily, "event_type", "d", "x")
        .select(col("k").as("event_type"), col("n_pairs"),
          col("slope_micro"))
        .orderBy(col("event_type"))
    },
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
          CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
      pairs AS (
        SELECT a.event_type, a.d AS ta, b.d AS tb,
          CAST(b.d - a.d AS BIGINT) AS dx, b.x - a.x AS dy
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d),
      keyed AS (SELECT event_type, ta, tb,
          (dy * 1000000 + 1000000000 * dx) // dx AS key FROM pairs),
      ranked AS (SELECT event_type, key,
          ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY key, ta, tb) AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
        FROM keyed)
      SELECT event_type, n_pairs,
        CAST(key - 1000000000 AS BIGINT) AS slope_micro
      FROM ranked WHERE rn = (n_pairs + 1) // 2
      ORDER BY event_type"""),
    notes = "median-of-pairwise-slopes; positivity-shifted integer keys " +
      "make trunc-div == floor-div cross-engine")

  /** Trailing-7 lower-median smoother ([[graft.operators.Analytics
    * .rollingMedian]]) over each event type's daily volumes — the
    * robust rolling baseline (a spike day shifts a rolling MEAN but
    * not this). Lower median keeps every value an exact integer. */
  val qRollingMedian = GQuery("q_rolling_median",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg((sum(col("value").cast(org.apache.spark.sql.types
            .DecimalType(27, 6))) * lit(1000000))
          .cast("long").as("x"))
      graft.operators.Analytics.rollingMedian(daily, "event_type", "d",
          "x", win = 7)
        .select(col("event_type"), Det.fmtDate(col("d")).as("day"),
          col("v"), col("med"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
          CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
      w AS (SELECT event_type, d, x,
          list_sort(list(x) OVER (PARTITION BY event_type ORDER BY d
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS lw
        FROM daily)
      SELECT event_type, strftime(d, '%Y-%m-%d') AS day, x AS v,
        lw[(len(lw) + 1) // 2] AS med
      FROM w ORDER BY event_type, day"""),
    notes = "exact windowed lower median; bounded per-row state")

  /** HAMPEL robust outlier flags ([[graft.operators.Analytics
    * .hampel]]) over each event type's daily volumes: trailing-7
    * lower-median center, lower-MAD spread, flag at 3×MAD — the
    * median-based detector a spike cannot poison (vs q_anomaly_zscore,
    * whose mean/stddev an outlier inflates). Exact integers end to
    * end. */
  val qHampel = GQuery("q_hampel",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg((sum(col("value").cast(org.apache.spark.sql.types
            .DecimalType(27, 6))) * lit(1000000))
          .cast("long").as("x"))
      graft.operators.Analytics.hampel(daily, "event_type", "d", "x",
          win = 7, k = 3L)
        .select(col("event_type"), Det.fmtDate(col("d")).as("day"),
          col("v"), col("med"), col("mad"), col("is_outlier"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
          CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
      w AS (SELECT event_type, d, x,
          list_sort(list(x) OVER (PARTITION BY event_type ORDER BY d
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS lw
        FROM daily),
      m AS (SELECT event_type, d, x, lw,
          lw[(len(lw) + 1) // 2] AS med
        FROM w),
      md AS (SELECT event_type, d, x, med,
          list_sort(list_transform(lw, v -> abs(v - med)))
            [(len(lw) + 1) // 2] AS mad
        FROM m)
      SELECT event_type, strftime(d, '%Y-%m-%d') AS day, x AS v, med, mad,
        CAST(abs(x - med) > mad * 3 AS INT) AS is_outlier
      FROM md ORDER BY event_type, day"""),
    notes = "median/MAD Hampel identifier; exact integers, lower-median " +
      "rule both engines")

  /** Day-of-week seasonality index ([[graft.operators.Analytics
    * .dowSeasonality]]): weekday volume over overall mean as exact
    * integer per-mille; weekday numbering is epoch-anchored so no
    * engine DOW convention crosses the boundary. */
  val qDowProfile = GQuery("q_dow_profile",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg((sum(col("value").cast(org.apache.spark.sql.types
            .DecimalType(27, 6))) * lit(1000000))
          .cast("long").as("x"))
      graft.operators.Analytics.dowSeasonality(daily, "event_type", "d",
          "x")
        .select(col("k").as("event_type"), col("dow"), col("n_days"),
          col("index_milli"))
        .orderBy(col("event_type"), col("dow"))
    },
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
          CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
      dw AS (SELECT event_type,
          CAST(d - DATE '1970-01-05' AS BIGINT) % 7 AS dow, x FROM daily),
      bd AS (SELECT event_type, dow, SUM(x) AS s, COUNT(*) AS c
        FROM dw GROUP BY 1, 2),
      o AS (SELECT event_type, SUM(x) AS s_all, COUNT(*) AS c_all
        FROM dw GROUP BY 1)
      SELECT bd.event_type, bd.dow, bd.c AS n_days,
        CAST((1000 * bd.s * o.c_all) // (bd.c * o.s_all) AS BIGINT)
          AS index_milli
      FROM bd JOIN o USING (event_type)
      ORDER BY event_type, dow"""),
    notes = "weekday/overall per-mille on positive integers; " +
      "epoch-anchored weekday")

  /** W-ext — PERCENT_RANK / CUME_DIST distribution positions per
    * segment: the two relative-rank window functions not otherwise
    * gated (rank/dense_rank/ntile each have their own gate). Balance
    * in exact cents; both functions are rank-arithmetic over exact
    * integers — `(rank-1)/(n-1)` and `peers≤/n` — so the doubles are
    * one mirrored IEEE divide per row and hash-exact. Deterministic
    * keyed sample (custkey % 25) keeps the output bounded at any SF;
    * the windows still compute over the FULL segment partition. */
  val qRankDist = GQuery("q_rank_dist",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("bal_cents"))
      Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"),
          floor(col("c_acctbal").cast("decimal(18,2)") * 100)
            .cast("long").as("bal_cents"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .filter(col("c_custkey") % 25 === 0)
        .select(col("c_mktsegment"), col("c_custkey"), col("bal_cents"),
          col("pr"), col("cd"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },
    Some("""WITH b AS (SELECT c_mktsegment, c_custkey,
        CAST(floor(CAST(c_acctbal AS DECIMAL(18,2)) * 100) AS BIGINT)
          AS bal_cents
      FROM customer),
      r AS (SELECT c_mktsegment, c_custkey, bal_cents,
        percent_rank() OVER (PARTITION BY c_mktsegment
          ORDER BY bal_cents) AS pr,
        cume_dist() OVER (PARTITION BY c_mktsegment
          ORDER BY bal_cents) AS cd
      FROM b)
      SELECT c_mktsegment, c_custkey, bal_cents, pr, cd
      FROM r WHERE c_custkey % 25 = 0
      ORDER BY c_mktsegment, c_custkey"""),
    notes = "relative-rank windows; rank arithmetic exact, one " +
      "mirrored IEEE divide; sample filter after the window")

  /** FORECAST BACKTEST with integer MASE: per event type, the daily
    * value series is forecast by SEASONAL-NAIVE (7 observations back)
    * and NAIVE-1 (previous observation), the last 7 observations with
    * both forecasts defined form the test window, and each method is
    * scored by MASE — mean test |error| scaled by ITS OWN mean train
    * |error| — in exact per-mille:
    * `(Σ_test|e| · n_train · 1000) div (Σ_train|e| · n_test)`.
    * All errors are exact cents; lags are OBSERVATION lags over the
    * day-ordered series (calendar gaps collapse — the stated
    * semantics), so the whole gate is integer arithmetic. The plan is
    * the standard monitor shape: one corpus shuffle to the daily
    * table, windows + agg over ≤|days| rows per type. */
  val qForecastMase = GQuery("q_forecast_mase",
    (s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wd = Window.partitionBy(col("event_type"))
        .orderBy(col("day").desc)
      Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(floor(sum(col("value").cast("decimal(18,2)")) * 100)
          .cast("long").as("y"))
        .withColumn("sn", lag(col("y"), 7).over(w))
        .withColumn("n1", lag(col("y"), 1).over(w))
        .withColumn("rnd", row_number().over(wd))
        .filter(col("sn").isNotNull && col("n1").isNotNull)
        .withColumn("is_test", (col("rnd") <= 7).cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(lit(1L) - col("is_test")).as("n_train"),
          sum(col("is_test")).as("n_test"),
          sum((lit(1L) - col("is_test")) * abs(col("y") - col("sn")))
            .as("tr_sn"),
          sum(col("is_test") * abs(col("y") - col("sn"))).as("te_sn"),
          sum((lit(1L) - col("is_test")) * abs(col("y") - col("n1")))
            .as("tr_n1"),
          sum(col("is_test") * abs(col("y") - col("n1"))).as("te_n1"))
        .withColumn("mase_sn_x1000", expr(
          "(te_sn * n_train * 1000) div greatest(tr_sn * n_test, 1)"))
        .withColumn("mase_n1_x1000", expr(
          "(te_n1 * n_train * 1000) div greatest(tr_n1 * n_test, 1)"))
        .select(col("event_type"), col("n_train"), col("n_test"),
          col("mase_sn_x1000"), col("mase_n1_x1000"))
        .orderBy(col("event_type"))
    },
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          CAST(floor(SUM(CAST(value AS DECIMAL(18,2))) * 100) AS BIGINT)
            AS y
        FROM events GROUP BY 1, 2),
      lagged AS (
        SELECT event_type, y,
          LAG(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS sn,
          LAG(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS n1,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day DESC)
            AS rnd
        FROM daily),
      flagged AS (
        SELECT event_type, y, sn, n1,
          CAST(rnd <= 7 AS BIGINT) AS is_test
        FROM lagged WHERE sn IS NOT NULL AND n1 IS NOT NULL),
      agg AS (
        SELECT event_type,
          SUM(1 - is_test) AS n_train, SUM(is_test) AS n_test,
          SUM((1 - is_test) * abs(y - sn)) AS tr_sn,
          SUM(is_test * abs(y - sn)) AS te_sn,
          SUM((1 - is_test) * abs(y - n1)) AS tr_n1,
          SUM(is_test * abs(y - n1)) AS te_n1
        FROM flagged GROUP BY 1)
      SELECT event_type, CAST(n_train AS BIGINT) AS n_train,
        CAST(n_test AS BIGINT) AS n_test,
        CAST((te_sn * n_train * 1000)
          // greatest(tr_sn * n_test, 1) AS BIGINT) AS mase_sn_x1000,
        CAST((te_n1 * n_train * 1000)
          // greatest(tr_n1 * n_test, 1) AS BIGINT) AS mase_n1_x1000
      FROM agg ORDER BY event_type"""),
    notes = "seasonal-naive vs naive-1 backtest; per-method MASE in " +
      "exact per-mille over cents; observation lags, last-7 test split")

  val all: Seq[GQuery] = Seq(qFlagship, qLatestPerGroup, qLagMovement,
    qFirstLast, qGroupTail, qRankInGroup, qRunningSum, qAsOfJoin,
    qAsOfTolerance, qAsOfMultikey, qSessionize, qSessionizeNative,
    qSessionizeKeyed, qFunnel,
    qFunnelWindowed, qCohortRetention, qRollingWindow, qIntervalMerge,
    qAttribution, qEventPairs, qEventPairsOuter, qChangepoint, qAutocorr,
    qTheilSen, qRollingMedian, qDowProfile, qHampel, qRfm, qStlLite,
    qRankDist, qForecastMase)
}
