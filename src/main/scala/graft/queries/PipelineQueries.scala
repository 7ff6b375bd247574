package graft.queries

import graft.{Det, Tables}
import graft.operators.{Fixture, JobQueue}
import org.apache.spark.sql.functions._

/** Job-queue / scheduling semantics (SURVEY.md §2.10) and nested-data
  * operators (§2.9) re-bound to testdata. All "now" anchors are fixed
  * literals — the engine takes processing time as a parameter, which is also
  * what makes these verifiable. */
object PipelineQueries {

  private val T0 = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")

  /** ST2 — job derivation: orders as fixtures (kickoff = o_orderdate,
    * priority from o_orderpriority), 4 phase jobs each, future-only. */
  val qJobDerivation = GQuery("q_job_derivation",
    (s, d) => {
      implicit val sp = s
      import s.implicits._
      val fixtures = Tables.orders(s, d)
        .filter(col("o_orderkey") < 3000)
        .select(col("o_orderkey").as("fixture_id"),
          col("o_orderdate").as("kickoff_utc"),
          when(col("o_orderpriority") === "1-URGENT", "highest")
            .when(col("o_orderpriority") === "2-HIGH", "high")
            .otherwise("medium").as("priority"))
        .as[Fixture]
      JobQueue.deriveJobs(fixtures, T0)
        .toDF()
        .select(col("id"), col("fixture_id"),
          Det.fmtTs(col("scheduled_for")).as("scheduled_s"),
          col("status"), col("job_type"), col("priority"))
        .orderBy(col("fixture_id"), col("job_type"))
    },
    Some(s"""WITH fixtures AS (
        SELECT o_orderkey AS fixture_id, o_orderdate AS kickoff_utc,
          CASE WHEN o_orderpriority = '1-URGENT' THEN 'highest'
               WHEN o_orderpriority = '2-HIGH' THEN 'high'
               ELSE 'medium' END AS priority
        FROM orders WHERE o_orderkey < 3000),
      phases AS (
        SELECT * FROM (VALUES ('early_odds'), ('pre_match'), ('team_news'),
          ('final_data')) p(job_type)),
      jobs AS (
        SELECT fixture_id || '_' || job_type AS id, fixture_id,
          kickoff_utc - to_hours(CASE job_type
            WHEN 'early_odds' THEN CASE WHEN priority = 'highest' THEN 48 ELSE 24 END
            WHEN 'pre_match' THEN 12 WHEN 'team_news' THEN 3
            ELSE 1 END) AS scheduled_for,
          'pending' AS status, job_type, priority
        FROM fixtures, phases)
      SELECT id, fixture_id, ${Det.sqlFmtTs("scheduled_for")} AS scheduled_s,
        status, job_type, priority
      FROM jobs WHERE scheduled_for > TIMESTAMP '1996-01-01'
      ORDER BY fixture_id, job_type"""))

  /** ST3/P8/P9 — lifecycle: retention + due/expired transitions at a fixed
    * processing time. Jobs synthesized from orders with varied statuses. */
  val qJobLifecycle = GQuery("q_job_lifecycle",
    (s, d) => {
      val now = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
      val jobs = Tables.orders(s, d)
        .select(
          concat(col("o_orderkey"), lit("_early_odds")).as("id"),
          col("o_orderdate").as("scheduled_for"),
          when(col("o_orderkey") % 4 === 0, "pending")
            .when(col("o_orderkey") % 4 === 1, "completed")
            .when(col("o_orderkey") % 4 === 2, "failed")
            .otherwise("pending").as("status"))
      JobQueue.markDue(JobQueue.retain(jobs, now), now)
        .groupBy(col("status"), col("due"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("status"), col("due"))
    },
    Some("""WITH jobs AS (
        SELECT o_orderkey || '_early_odds' AS id, o_orderdate AS scheduled_for,
          CASE WHEN o_orderkey % 4 = 0 THEN 'pending'
               WHEN o_orderkey % 4 = 1 THEN 'completed'
               WHEN o_orderkey % 4 = 2 THEN 'failed'
               ELSE 'pending' END AS status
        FROM orders),
      retained AS (
        SELECT * FROM jobs
        WHERE (status = 'pending'
            AND scheduled_for > TIMESTAMP '1997-01-01' - INTERVAL 2 HOUR)
          OR (status IN ('completed', 'failed')
            AND scheduled_for > TIMESTAMP '1997-01-01' - INTERVAL 3 DAY)),
      transitioned AS (
        SELECT
          CASE WHEN status = 'pending' AND TIMESTAMP '1997-01-01'
              > scheduled_for + INTERVAL 45 MINUTE THEN 'expired'
            ELSE status END AS status,
          scheduled_for
        FROM retained),
      marked AS (
        -- due derives from the POST-transition status: expired is never due
        SELECT status,
          (status = 'pending' AND scheduled_for <= TIMESTAMP '1997-01-01')
            AS due
        FROM transitioned)
      SELECT status, due, COUNT(*) AS n FROM marked
      GROUP BY status, due ORDER BY status, due"""))

  /** J8+O6 — queue merge: existing jobs win over new on id collision. */
  val qJobMerge = GQuery("q_job_merge",
    (s, d) => {
      val now = java.sql.Timestamp.valueOf("1997-01-01 00:00:00")
      val existing = Tables.orders(s, d).filter(col("o_orderkey") % 2 === 0)
        .select(concat(col("o_orderkey"), lit("_early_odds")).as("id"),
          col("o_orderdate").as("scheduled_for"),
          lit("completed").as("status"))
      val fresh = Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
        .select(concat(col("o_orderkey"), lit("_early_odds")).as("id"),
          col("o_orderdate").as("scheduled_for"),
          lit("pending").as("status"))
      JobQueue.merge(existing, fresh, now)
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
        .orderBy(col("status"))
    },
    Some("""WITH existing AS (
        SELECT o_orderkey || '_early_odds' AS id, o_orderdate AS scheduled_for,
          'completed' AS status FROM orders WHERE o_orderkey % 2 = 0),
      fresh AS (
        SELECT o_orderkey || '_early_odds' AS id, o_orderdate AS scheduled_for,
          'pending' AS status FROM orders WHERE o_orderkey % 3 = 0),
      active AS (
        SELECT * FROM existing
        WHERE status IN ('completed', 'failed')
          AND scheduled_for > TIMESTAMP '1997-01-01' - INTERVAL 3 DAY),
      merged AS (
        SELECT * FROM active
        UNION ALL
        SELECT * FROM fresh WHERE id NOT IN (SELECT id FROM active))
      SELECT status, COUNT(*) AS n FROM merged GROUP BY status
      ORDER BY status"""))

  /** N1/N3 — nested build + flatten round-trip: lineitems nested per order
    * (collect_list of structs — the payload shape), exploded back, measures
    * recomputed. Oracle = the flat equivalent; equality proves the nest/
    * explode is lossless. */
  val qNestedRoundtrip = GQuery("q_nested_roundtrip",
    (s, d) => {
      val nested = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          struct(col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_returnflag")).as("line"))
        .groupBy(col("l_orderkey"))
        .agg(collect_list(col("line")).as("lines"))
      nested
        .select(col("l_orderkey"), explode(col("lines")).as("line"))
        .select(col("l_orderkey"), col("line.l_returnflag").as("flag"),
          col("line.l_quantity").as("qty"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n_lines"), Det.dsum(col("qty")).as("sum_qty"))
        .orderBy(col("flag"))
    },
    Some(s"""SELECT l_returnflag AS flag, COUNT(*) AS n_lines,
      ${Det.sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY flag"""))

  /** N2 — outcome-name pivot to wide columns (odds h2h/home-draw-away pivot,
    * database_integration.py:176-226) as conditional aggregation — no
    * groupBy().pivot() second pass, single shuffle. */
  val qPivotWide = GQuery("q_pivot_wide",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        Det.dsum(when(col("event_type") === "view", col("value"))).as("view_v"),
        Det.dsum(when(col("event_type") === "click", col("value"))).as("click_v"),
        Det.dsum(when(col("event_type") === "purchase", col("value"))).as("purchase_v"),
        Det.dsum(when(col("event_type") === "signup", col("value"))).as("signup_v"),
        Det.dsum(when(col("event_type") === "error", col("value"))).as("error_v"))
      .orderBy(col("user_id")),
    Some(s"""SELECT user_id,
      ${Det.sqlDsum("CASE WHEN event_type = 'view' THEN value END")} AS view_v,
      ${Det.sqlDsum("CASE WHEN event_type = 'click' THEN value END")} AS click_v,
      ${Det.sqlDsum("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase_v,
      ${Det.sqlDsum("CASE WHEN event_type = 'signup' THEN value END")} AS signup_v,
      ${Det.sqlDsum("CASE WHEN event_type = 'error' THEN value END")} AS error_v
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** N4 — two-array flatten + union with a flag (startXI + substitutes →
    * player rows, database_integration.py:282-332): order lines split into
    * "starter" (linenumber 1) vs "bench" (rest), unioned with the flag,
    * deduped into a dim. */
  val qTwoArrayFlatten = GQuery("q_two_array_flatten",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val starters = li.filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_partkey"), lit(true).as("is_starter"))
      val bench = li.filter(col("l_linenumber") =!= 1)
        .select(col("l_orderkey"), col("l_partkey"), lit(false).as("is_starter"))
      starters.unionByName(bench)
        .groupBy(col("l_partkey"))
        .agg(sum(when(col("is_starter"), 1).otherwise(0)).as("n_starter"),
          count(lit(1)).as("n_total"))
        .orderBy(col("l_partkey"))
    },
    Some("""SELECT l_partkey,
      CAST(SUM(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starter,
      COUNT(*) AS n_total
      FROM lineitem GROUP BY l_partkey ORDER BY l_partkey"""))

  /** N2 + F-j1 — full JSON round trip: nest lineitems into the odds-event
    * payload shape (bookmakers[]→markets[]→outcomes[]), serialize with
    * to_json, parse back with from_json against the declared schema, and run
    * the real 3-level [[graft.operators.OddsPipeline.flattenOdds]]. The
    * oracle is the flat relational equivalent — equality proves serialize →
    * parse → explode → pivot is lossless. */
  val qOddsFlatten = GQuery("q_odds_flatten",
    (s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 2000)
      // one bookmaker per line: h2h outcomes Home/Draw/Away priced from
      // the line's measures
      val nested = li.select(col("l_orderkey"),
        struct(
          lit("bk").as("key"),
          format_string("BM%03d", col("l_linenumber")).as("title"),
          lit(null).cast("string").as("last_update"),
          array(struct(
            lit("h2h").as("key"),
            lit(null).cast("string").as("last_update"),
            array(
              struct(lit("Home").as("name"), col("l_extendedprice").as("price"),
                lit(null).cast("double").as("point")),
              struct(lit("Draw").as("name"), col("l_quantity").as("price"),
                lit(null).cast("double").as("point")),
              struct(lit("Away").as("name"), col("l_discount").as("price"),
                lit(null).cast("double").as("point"))).as("outcomes")))
            .as("markets")).as("bm"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("bm"))).as("bookmakers"))
      val payload = nested.select(col("l_orderkey"),
        to_json(struct(
          lit("Home").as("home_team"), lit("Away").as("away_team"),
          col("bookmakers"))).as("doc"))
      val parsed = payload.select(col("l_orderkey").as("fixture_id"),
        lit(null).cast("timestamp").as("collected_at"),
        lit("early_odds").as("collection_phase"),
        from_json(col("doc"), graft.operators.OddsPipeline.oddsEventSchema)
          .as("event"))
      graft.operators.OddsPipeline.flattenOdds(parsed)
        .select(col("fixture_id"), col("bookmaker"), col("home_odds"),
          col("draw_odds"), col("away_odds"))
        // (fixture, bookmaker) is NOT unique (synthetic lineitem repeats
        // line numbers) — order on the measures too so ties are identical rows
        .orderBy(col("fixture_id"), col("bookmaker"), col("home_odds"),
          col("draw_odds"), col("away_odds"))
    },
    Some("""SELECT l_orderkey AS fixture_id,
        printf('BM%03d', l_linenumber) AS bookmaker,
        l_extendedprice AS home_odds, l_quantity AS draw_odds,
        l_discount AS away_odds
      FROM lineitem WHERE l_orderkey < 2000
      ORDER BY fixture_id, bookmaker, home_odds, draw_odds, away_odds"""))

  /** A5 scale path — approx_count_distinct (HLL++): the 100 TB variant of
    * COUNT(DISTINCT). Approximate by design but DETERMINISTIC (hash-based
    * sketch, order-independent merge) — gated hash-exact against the
    * committed [[SketchGolden]]; the ±5% error contract vs the exact
    * count (q_count_distinct) stays pinned in ApproxDistinctSpec. */
  val qApproxDistinct = GQuery("q_approx_distinct",
    (s, d) => Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy(col("event_type")),
    Some(SketchGolden.oracle(SketchGolden.approxRows, "approx_users")),
    notes = "approximate HLL sketch; hash-exact vs committed deterministic " +
      "golden, error bound spec-pinned")

  /** Sketch-family heavy hitters — keys with frequency ≥ 5% of the table,
    * WITHOUT an exact groupBy over the full key domain: Misra–Gries
    * candidates (`df.stat.freqItems`, one distributed pass, candidate set
    * bounded by 1/support = 20 regardless of key cardinality or corpus
    * size) + count-min-sketch estimates (one more distributed pass; the
    * sketch is KB-sized and mergeable). The CMS filter prunes MG's false
    * positives; NO FALSE NEGATIVES by construction — an item with true
    * frequency ≥ support survives MG, and CMS never under-counts, so it
    * passes the ≥ support·N cut. Both driver-side values are bounded by
    * the support constant, not the data (the q_approx_distinct posture).
    * Approximate counts, but deterministic (CMS cells are exact sums;
    * MG has no evictions at this cardinality) — gated hash-exact against
    * the committed [[SketchGolden]]; the one-sided error contract
    * (no-under-count, over ≤ eps·N, candidate completeness) is pinned in
    * ApproxDistinctSpec. Exact twin of the top-k form: q_topk. */
  val qHeavyHitters = GQuery("q_heavy_hitters",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val support = 0.05
      val n = ev.count()
      val cms = ev.stat.countMinSketch(col("event_type"),
        eps = 1e-4, confidence = 0.99, seed = 42)
      val cands = ev.stat.freqItems(Seq("event_type"), support)
        .head.getSeq[String](0)
      cands.map(k => (k, cms.estimateCount(k)))
        .filter(_._2 >= (support * n).toLong)
        .toDF("event_type", "est_count")
        .orderBy(col("event_type"))
    },
    Some(SketchGolden.oracle(SketchGolden.hhRows, "est_count")),
    notes = "CMS+Misra-Gries heavy hitters; hash-exact vs committed " +
      "deterministic golden, one-sided error pinned in ApproxDistinctSpec")

  /** N6 — team-event detection over synthetic "lineups": orders are a
    * team's (customer's) fixtures in date order, a fixture's lineup is its
    * lineitem part keys; a part that appears in the previous order but
    * not the current one is a `missing_starter` event. Exercises
    * [[graft.operators.OddsCollect.detectTeamEvents]] end-to-end under
    * the hash gate (sequence window + roster set-diff). */
  val qTeamEvents = GQuery("q_team_events",
    (s, d) => {
      val lu = Tables.orders(s, d).join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("team_id"),
          col("o_orderkey").as("fixture_id"),
          col("o_orderdate").as("fixture_ts"),
          col("l_partkey").as("player_id"))
        .distinct()
      graft.operators.OddsCollect.detectTeamEvents(lu)
        .orderBy(col("team_id"), col("detected_at"), col("fixture_id"),
          col("player_id"))
    },
    Some("""WITH lu AS (
        SELECT DISTINCT o_custkey AS team_id, o_orderkey AS fixture_id,
          o_orderdate AS fixture_ts, l_partkey AS player_id
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      fx AS (
        SELECT team_id, fixture_id, fixture_ts,
          ROW_NUMBER() OVER (PARTITION BY team_id
            ORDER BY fixture_ts, fixture_id) AS seq
        FROM (SELECT DISTINCT team_id, fixture_id, fixture_ts FROM lu))
      SELECT p.team_id, cur.fixture_id, p.player_id,
        'missing_starter' AS event_type,
        'started fixture ' || pf.fixture_id ||
          ', absent from fixture ' || cur.fixture_id AS event_description,
        'minor' AS severity,
        cur.fixture_ts AS detected_at
      FROM fx pf
      JOIN fx cur ON cur.team_id = pf.team_id AND cur.seq = pf.seq + 1
      JOIN lu p ON p.team_id = pf.team_id AND p.fixture_id = pf.fixture_id
      WHERE NOT EXISTS (SELECT 1 FROM lu c WHERE c.team_id = cur.team_id
        AND c.fixture_id = cur.fixture_id AND c.player_id = p.player_id)
      ORDER BY p.team_id, cur.fixture_ts, cur.fixture_id, p.player_id"""))

  /** Report slice (SURVEY.md §1.1 derived documents): weekly daily
    * breakdown — the weekly_report.json inner table. */
  val qWeeklyDaily = GQuery("q_weekly_daily",
    (s, d) => graft.operators.Reports.weeklyDaily(
      Tables.events(s, d), java.sql.Timestamp.valueOf("2024-01-31 00:00:00")),
    Some(s"""SELECT ${Det.sqlFmtDate("CAST(ts AS DATE)")} AS day,
        COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
        ${Det.sqlDsum("value")} AS value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-31' - INTERVAL 7 DAY
        AND ts <= TIMESTAMP '2024-01-31'
      GROUP BY 1 ORDER BY day"""))

  /** health_status.json document (A9 + thresholds) over jobs synthesized
    * from order keys. */
  val qHealthStatus = GQuery("q_health_status",
    (s, d) => {
      val jobs = Tables.orders(s, d).select(
        when(col("o_orderkey") % 20 === 0, "failed")
          .when(col("o_orderkey") % 5 === 0, "pending")
          .when(col("o_orderkey") % 7 === 0, "expired")
          .otherwise("completed").as("status"))
      graft.operators.Reports.healthStatus(jobs,
        java.sql.Timestamp.valueOf("2024-01-31 00:00:00"))
    },
    Some(s"""WITH jobs AS (
        SELECT CASE WHEN o_orderkey % 20 = 0 THEN 'failed'
            WHEN o_orderkey % 5 = 0 THEN 'pending'
            WHEN o_orderkey % 7 = 0 THEN 'expired'
            ELSE 'completed' END AS status
        FROM orders),
      agg AS (
        SELECT COUNT(*) AS total_jobs,
          CAST(SUM(CASE WHEN status = 'failed' THEN 1 ELSE 0 END) AS BIGINT) AS failed,
          CAST(SUM(CASE WHEN status = 'pending' THEN 1 ELSE 0 END) AS BIGINT) AS pending,
          CAST(SUM(CASE WHEN status = 'expired' THEN 1 ELSE 0 END) AS BIGINT) AS expired,
          CAST(SUM(CASE WHEN status = 'completed' THEN 1 ELSE 0 END) AS BIGINT) AS completed
        FROM jobs)
      SELECT *,
        CASE WHEN total_jobs > 0
          THEN CAST(failed AS DOUBLE) / CAST(total_jobs AS DOUBLE)
          ELSE 0.0 END AS failure_rate,
        CASE WHEN (CASE WHEN total_jobs > 0
            THEN CAST(failed AS DOUBLE) / CAST(total_jobs AS DOUBLE)
            ELSE 0.0 END) > 0.2 THEN 'degraded'
          WHEN pending > 50 OR expired > 10 THEN 'issues'
          ELSE 'healthy' END AS status,
        ${Det.sqlFmtTs("TIMESTAMP '2024-01-31'")} AS checked_at
      FROM agg"""))

  /** api_usage.json document ([[graft.operators.Reports.apiUsage]],
    * reference yml:937-1034): per-day weighted API-call estimate from the
    * job queue — phase weights early_odds=1 / pre_match=2 / team_news=3 /
    * final_data=4, unknown phases default-weighted 1 (the coalesce path,
    * exercised by the 'adhoc' bucket) — with the budget clamp
    * remaining = max(0, budget − calls) and the over-budget flag. Budget
    * 15 (the operator's parameter; the reference's production constant is
    * 100) so BOTH branches of the clamp and flag appear at sf0.01. One
    * map-side-combined groupBy on the day — scale-trivial. */
  val qApiUsage = GQuery("q_api_usage",
    (s, d) => {
      val k = col("o_orderkey") % 5
      val jobs = Tables.orders(s, d).select(
        col("o_orderdate").as("scheduled_for"),
        when(k === 0, "early_odds").when(k === 1, "pre_match")
          .when(k === 2, "team_news").when(k === 3, "final_data")
          .otherwise("adhoc").as("job_type"))
      graft.operators.Reports.apiUsage(jobs,
        java.sql.Timestamp.valueOf("2024-01-31 00:00:00"), 15)
    },
    Some(s"""WITH jobs AS (
        SELECT o_orderdate AS sday,
          CASE CAST(o_orderkey % 5 AS INT)
            WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 3 WHEN 3 THEN 4
            ELSE 1 END AS w
        FROM orders),
      agg AS (SELECT ${Det.sqlFmtDate("sday")} AS day,
          CAST(SUM(w) AS BIGINT) AS estimated_calls
        FROM jobs GROUP BY 1)
      SELECT day, estimated_calls,
        CAST(GREATEST(15 - estimated_calls, 0) AS BIGINT) AS remaining,
        estimated_calls > 15 AS over_budget
      FROM agg ORDER BY day"""),
    notes = "weighted per-day call estimate + budget clamp; one groupBy")

  /** dashboard_data.json document ([[graft.operators.Reports
    * .dashboardData]], reference yml:702-825): the latest-movements panel
    * — LAG movement per (user, event_type) filtered to |rel_change| > 0.5,
    * enriched with the customer dim (broadcast), newest 10 by formatted
    * timestamp with event_id tie-break (TakeOrderedAndProject — no global
    * sort). Composes W2 + J1 under one gate, as the reference's dashboard
    * generator does. */
  val qDashboard = GQuery("q_dashboard",
    (s, d) => graft.operators.Reports.dashboardData(
      Tables.events(s, d), Tables.customer(s, d), 0.5),
    Some(s"""WITH w AS (
        SELECT event_id, user_id, event_type, value, ts,
          LAG(value) OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS prev_value
        FROM events),
      m AS (
        SELECT event_id, user_id, event_type, value, prev_value,
          (value - prev_value) / prev_value AS rel_change, ts
        FROM w
        WHERE prev_value IS NOT NULL AND prev_value <> 0
          AND ABS((value - prev_value) / prev_value) > 0.5)
      SELECT event_id, user_id, c_name, event_type, value, prev_value,
        rel_change, ${Det.sqlFmtTs("ts")} AS ts_s
      FROM m JOIN customer ON user_id = c_custkey
      ORDER BY ts_s DESC, event_id LIMIT 10"""),
    notes = "movement panel: W2 LAG + broadcast dim + top-10 slice")

  /** Per-column data-quality profile ([[graft.operators.Reports.profile]])
    * over events — null/distinct/min/max per column in ONE scan, the
    * generalized form of validate_data.py's table checks. Profiled columns
    * are long/string only (their string casts are byte-identical across
    * engines; double/timestamp formatting is not). */
  val qProfile = GQuery("q_profile",
    (s, d) => graft.operators.Reports.profile(
      Tables.events(s, d), Seq("user_id", "event_type")),
    Some("""SELECT col_name, n_rows, n_nulls, n_distinct, min_s, max_s
      FROM (
        SELECT 'user_id' AS col_name, COUNT(*) AS n_rows,
          COUNT(*) - COUNT(user_id) AS n_nulls,
          COUNT(DISTINCT user_id) AS n_distinct,
          CAST(MIN(user_id) AS VARCHAR) AS min_s,
          CAST(MAX(user_id) AS VARCHAR) AS max_s
        FROM events
        UNION ALL
        SELECT 'event_type', COUNT(*),
          COUNT(*) - COUNT(event_type),
          COUNT(DISTINCT event_type),
          MIN(event_type), MAX(event_type)
        FROM events)
      ORDER BY col_name"""),
    notes = "one-scan per-column profile; long/string columns only (cast parity)")

  /** Volume validation ([[graft.operators.Reports.volumeCheck]]) — the
    * reference's expected-range oracle (validate_data.py:69-73 'Fixtures
    * 10-30, Odds 30-100...') over the testdata entities; ranges picked so
    * both verdicts appear at sf0.01. */
  val qValidate = GQuery("q_validate",
    (s, d) => graft.operators.Reports.volumeCheck(Seq(
      ("customer", Tables.customer(s, d), 100L, 10000000L),
      ("events", Tables.events(s, d), 1000L, 100000000L),
      ("nation", Tables.nation(s, d), 20L, 30L),
      ("orders_tight", Tables.orders(s, d), 10L, 20L))),
    Some("""SELECT entity, n, lo, hi, n BETWEEN lo AND hi AS ok FROM (
        SELECT 'customer' AS entity, COUNT(*) AS n, CAST(100 AS BIGINT) AS lo,
          CAST(10000000 AS BIGINT) AS hi FROM customer
        UNION ALL
        SELECT 'events', COUNT(*), 1000, 100000000 FROM events
        UNION ALL
        SELECT 'nation', COUNT(*), 20, 30 FROM nation
        UNION ALL
        SELECT 'orders_tight', COUNT(*), 10, 20 FROM orders)
      ORDER BY entity"""),
    notes = "expected-range volume validation; orders_tight range fails by design")

  /** DATASET RELEASE MANIFEST ([[graft.operators.Reports
    * .datasetManifest]]): per curation stage, row count + an
    * order-independent content fingerprint (DECIMAL(38,0) sum of
    * 48-bit md5 folds of the surviving ids) — the cheap equality
    * witness a training-data release ships instead of full id lists:
    * re-running the pipeline anywhere must reproduce every (n, fp)
    * pair or the release differs. Stages here are deliberately simple
    * transparent filters (length gate → declared-language gate →
    * exact text dedup); the heavyweight gates have their own oracle
    * queries — this gate pins the MANIFEST algebra. fp travels as a
    * string (decimal-to-pandas dtype drift is engine-dependent; digits
    * are not). */
  val qManifest = GQuery("q_manifest",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val s1 = docs.filter(length(col("text")) >= 200)
      val s2 = s1.filter(col("lang") === "en")
      val s3 = s2.groupBy(md5(col("text")).as("__k"))
        .agg(min(col("doc_id")).as("doc_id"))
      graft.operators.Reports.datasetManifest(Seq(
          ("raw", docs), ("len_gate", s1), ("lang_en", s2),
          ("exact_dedup", s3)), "doc_id")
        .select(col("stage_no"), col("stage"), col("n_rows"),
          col("fp").cast("string").as("fp"))
    },
    Some {
      def hv(i: Int) =
        s"""(CASE WHEN ascii(substr(hh, $i, 1)) >= 97
           THEN ascii(substr(hh, $i, 1)) - 87
           ELSE ascii(substr(hh, $i, 1)) - 48 END)"""
      val fold = (1 to 12)
        .map(i => s"CAST(${hv(i)} AS HUGEINT) * ${BigInt(16).pow(12 - i).toLong}")
        .mkString(" + ")
      def fp(src: String) =
        s"""(SELECT CAST(CAST(SUM($fold) AS DECIMAL(38,0)) AS VARCHAR)
           FROM (SELECT md5('mf:' || CAST(doc_id AS VARCHAR)) AS hh
                 FROM $src))"""
      s"""WITH s1 AS (SELECT doc_id FROM documents WHERE len(text) >= 200),
      s2 AS (SELECT doc_id FROM documents
        WHERE len(text) >= 200 AND lang = 'en'),
      s3 AS (SELECT MIN(doc_id) AS doc_id FROM documents
        WHERE len(text) >= 200 AND lang = 'en' GROUP BY md5(text))
      SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS stage_no, 'raw' AS stage,
          (SELECT COUNT(*) FROM documents) AS n_rows,
          ${fp("documents")} AS fp
        UNION ALL
        SELECT 1, 'len_gate', (SELECT COUNT(*) FROM s1), ${fp("s1")}
        UNION ALL
        SELECT 2, 'lang_en', (SELECT COUNT(*) FROM s2), ${fp("s2")}
        UNION ALL
        SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM s3), ${fp("s3")})
      ORDER BY stage_no"""
    },
    notes = "order-independent mergeable id fingerprints per stage; " +
      "fp as digit string to dodge decimal dtype drift")

  /** FIRST-ORDER TRANSITION MATRIX ([[graft.operators.Funnel
    * .transitionMatrix]]): per-user consecutive (prev → next) event-type
    * counts + row-conditional probability — the Markov view of the event
    * stream. p is one IEEE divide of exact integers. */
  val qTransitionMatrix = GQuery("q_transition_matrix",
    (s, d) => graft.operators.Funnel.transitionMatrix(
      Tables.events(s, d), "user_id", "ts", "event_id", "event_type"),
    Some("""WITH pairs AS (
        SELECT LAG(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS from_type,
          event_type AS to_type
        FROM events),
      m AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT from_type, SUM(n) AS n_from FROM m GROUP BY 1)
      SELECT m.from_type, m.to_type, CAST(m.n AS BIGINT) AS n,
        CAST(m.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
      FROM m JOIN t USING (from_type)
      ORDER BY m.from_type, m.to_type"""),
    notes = "Markov counts; lag reuses the user exchange, totals broadcast back")

  /** Z-SCORE ANOMALY SUMMARY ([[graft.operators.Reports.zscoreAnomalies]]):
    * per-type mean/std from exact decimal moments assembled in a FIXED
    * IEEE op order, so the std and every |x−mean| > 3σ decision are
    * bit-identical cross-engine. */
  val qAnomalyZscore = GQuery("q_anomaly_zscore",
    (s, d) => graft.operators.Reports.zscoreAnomalies(
      Tables.events(s, d), "event_type", "value", k = 3.0),
    Some("""WITH stats AS (
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(13,2))
            * CAST(value AS DECIMAL(13,2))) AS DOUBLE) AS a2,
          CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS b1
        FROM events GROUP BY event_type),
      st AS (
        SELECT event_type, n, b1 / CAST(n AS DOUBLE) AS mean,
          sqrt((CAST(n AS DOUBLE) * a2 - b1 * b1)
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS std
        FROM stats)
      SELECT e.event_type, CAST(MAX(st.n) AS BIGINT) AS n,
        MAX(st.mean) AS mean, MAX(st.std) AS std,
        CAST(SUM(CASE WHEN abs(e.value - st.mean) > 3.0 * st.std
          THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      FROM events e JOIN st USING (event_type)
      GROUP BY e.event_type ORDER BY e.event_type"""),
    notes = "3-sigma monitor; moments map-side, stats broadcast back, 2 scans")

  /** TEMPORAL DRIFT ([[graft.operators.Reports.temporalDrift]]): volume
    * and mean on each side of a split instant in ONE scan — the
    * train/serve distribution-shift check. */
  val qDrift = GQuery("q_drift",
    (s, d) => graft.operators.Reports.temporalDrift(
      Tables.events(s, d), "event_type", "ts", "value",
      java.sql.Timestamp.valueOf("2024-01-16 00:00:00")),
    Some("""SELECT event_type,
        CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_before,
        CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_after,
        (CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
            THEN CAST(value AS DECIMAL(27,6)) END) AS DOUBLE)
          / CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            AS DOUBLE)) AS mean_before,
        (CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
            THEN CAST(value AS DECIMAL(27,6)) END) AS DOUBLE)
          / CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            AS DOUBLE)) AS mean_after,
        (CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            AS DOUBLE)
          / CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            AS DOUBLE)) AS volume_ratio
      FROM events GROUP BY event_type ORDER BY event_type"""),
    notes = "one-scan before/after split; ratio one IEEE divide of exact counts")

  /** ROLLING 7-DAY ACTIVES ([[graft.operators.Reports.rollingActiveUsers]]):
    * WAU per day via bounded day fan-out (a RANGE window cannot hold a
    * COUNT DISTINCT) — expansion factor = window length, map-side. */
  val qRollingActive = GQuery("q_rolling_active",
    (s, d) => graft.operators.Reports.rollingActiveUsers(
      Tables.events(s, d), "user_id", "ts", windowDays = 7),
    Some("""WITH fan AS (
        SELECT user_id, unnest(generate_series(CAST(ts AS DATE),
          CAST(ts AS DATE) + 6, INTERVAL 1 DAY)) AS day
        FROM events)
      SELECT strftime(CAST(day AS DATE), '%Y-%m-%d') AS day,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
        CAST(COUNT(*) AS BIGINT) AS n_events
      FROM fan GROUP BY 1 ORDER BY day"""),
    notes = "WAU curve; 7x day fan-out then day-keyed distinct, partials map-side")

  /** FREQUENT SEQUENCE MINING ([[graft.operators.Funnel
    * .frequentSequences]]): top-25 consecutive event-type trigrams across
    * all user streams — distributed top-k (TakeOrderedAndProject), rank
    * numbered after the limit. */
  val qSeqMining = GQuery("q_seq_mining",
    (s, d) => graft.operators.Funnel.frequentSequences(
      Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
      k = 25),
    Some("""WITH lagged AS (
        SELECT
          LAG(event_type, 2) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS s1,
          LAG(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS s2,
          event_type AS s3
        FROM events),
      cnt AS (SELECT s1, s2, s3, COUNT(*) AS n FROM lagged
        WHERE s1 IS NOT NULL GROUP BY 1, 2, 3),
      top AS (SELECT * FROM cnt ORDER BY n DESC, s1, s2, s3 LIMIT 25)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, s1, s2, s3) AS BIGINT)
          AS rank,
        s1, s2, s3, CAST(n AS BIGINT) AS n
      FROM top ORDER BY rank"""),
    notes = "trigram paths; two lags on one user exchange, top-k without global sort")

  /** EWMA α=1/2 ([[graft.operators.Reports.ewmaDaily]]): exponentially
    * weighted daily smoothing where every weight is a POWER OF TWO, so
    * S and N are exact decimals/integers and the average is ONE IEEE
    * divide — hash-exact with no floating-point caveats. The twin
    * re-derives the same bounded window via a rank self-join (a SUM
    * aggregate, immune to DuckDB's chained-addition width cap). */
  val qEwma = GQuery("q_ewma",
    (s, d) => graft.operators.Reports.ewmaDaily(
      Tables.events(s, d), "event_type", "ts", "value", lookback = 16),
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
          SUM(CAST(value AS DECIMAL(18,6))) AS x
        FROM events GROUP BY 1, 2),
      rn AS (SELECT event_type, day, x,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS r
        FROM daily),
      acc AS (
        SELECT a.event_type, a.day, a.x,
          SUM(b.x * CAST(power(2, 15 - (a.r - b.r)) AS BIGINT)) AS s,
          SUM(CAST(power(2, 15 - (a.r - b.r)) AS BIGINT)) AS n
        FROM rn a JOIN rn b
          ON a.event_type = b.event_type AND b.r BETWEEN a.r - 15 AND a.r
        GROUP BY 1, 2, 3)
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        CAST(x AS DOUBLE) AS daily_sum,
        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS ewma
      FROM acc ORDER BY event_type, day"""),
    notes = "dyadic-weight EWMA; 16 lags ride one window exchange, zero FP summation")

  /** FIXED-POINT PAGERANK ([[graft.operators.Graph.pageRankFixedPoint]]):
    * 3 damped rounds over the event-type transition graph in
    * scaled-integer arithmetic — integer sums are associative, so the
    * result is partitioning- and engine-independent by construction.
    * The twin unrolls the same three rounds with DuckDB's `//`. */
  val qPagerank = GQuery("q_pagerank",
    (s, d) => {
      val edges = graft.operators.Funnel.transitionMatrix(
          Tables.events(s, d), "user_id", "ts", "event_id", "event_type")
        .select(col("from_type"), col("to_type"), col("n"))
      graft.operators.Graph.pageRankFixedPoint(edges,
        "from_type", "to_type", "n", iterations = 3)
    },
    Some("""WITH pairs AS (
        SELECT LAG(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS from_type,
          event_type AS to_type
        FROM events),
      e AS (
        SELECT from_type AS src, to_type AS dst, COUNT(*) AS w
        FROM pairs WHERE from_type IS NOT NULL GROUP BY 1, 2),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      nn AS (SELECT COUNT(*) AS n FROM nodes),
      outd AS (SELECT src, SUM(w) AS out_w FROM e GROUP BY 1),
      r0 AS (SELECT node, 1000000000000 // nn.n AS rank_fp
        FROM nodes CROSS JOIN nn),
      c1 AS (SELECT e.dst AS node, SUM((r.rank_fp // o.out_w) * e.w) AS ct
        FROM r0 r JOIN e ON r.node = e.src JOIN outd o ON e.src = o.src
        GROUP BY 1),
      r1 AS (SELECT nodes.node,
          150000000000000 // (1000 * nn.n)
            + (850 * COALESCE(c1.ct, 0)) // 1000 AS rank_fp
        FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.node = c1.node),
      c2 AS (SELECT e.dst AS node, SUM((r.rank_fp // o.out_w) * e.w) AS ct
        FROM r1 r JOIN e ON r.node = e.src JOIN outd o ON e.src = o.src
        GROUP BY 1),
      r2 AS (SELECT nodes.node,
          150000000000000 // (1000 * nn.n)
            + (850 * COALESCE(c2.ct, 0)) // 1000 AS rank_fp
        FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.node = c2.node),
      c3 AS (SELECT e.dst AS node, SUM((r.rank_fp // o.out_w) * e.w) AS ct
        FROM r2 r JOIN e ON r.node = e.src JOIN outd o ON e.src = o.src
        GROUP BY 1),
      r3 AS (SELECT nodes.node,
          150000000000000 // (1000 * nn.n)
            + (850 * COALESCE(c3.ct, 0)) // 1000 AS rank_fp
        FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.node = c3.node)
      SELECT node, CAST(rank_fp AS BIGINT) AS rank_fp,
        CAST(rank_fp AS DOUBLE) / 1000000000000.0 AS rank
      FROM r3 ORDER BY node"""),
    notes = "scaled-int PageRank: associative sums, no IEEE nondeterminism; oracle unrolls 3 rounds")

  /** LINEAR FIT + CORRELATION ([[graft.operators.Aggregates.linearFit]]):
    * value ~ hour-of-day OLS per event type from exact decimal moments
    * assembled in a fixed IEEE op order — the regr_slope/corr family,
    * portable bit-for-bit (built-in corr aggs average incrementally and
    * are not). */
  val qLinreg = GQuery("q_linreg",
    (s, d) => graft.operators.Aggregates.linearFit(
      Tables.events(s, d).withColumn("hour_x", hour(col("ts"))),
      "event_type", "hour_x", "value"),
    Some("""WITH m AS (
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(hour(ts) AS DECIMAL(13,2))) AS DOUBLE) AS sx,
          CAST(SUM(CAST(value AS DECIMAL(13,2))) AS DOUBLE) AS sy,
          CAST(SUM(CAST(hour(ts) AS DECIMAL(13,2))
            * CAST(value AS DECIMAL(13,2))) AS DOUBLE) AS sxy,
          CAST(SUM(CAST(hour(ts) AS DECIMAL(13,2))
            * CAST(hour(ts) AS DECIMAL(13,2))) AS DOUBLE) AS sx2,
          CAST(SUM(CAST(value AS DECIMAL(13,2))
            * CAST(value AS DECIMAL(13,2))) AS DOUBLE) AS sy2
        FROM events GROUP BY 1),
      k AS (
        SELECT event_type, n, sx, sy,
          CAST(n AS DOUBLE) * sxy - sx * sy AS num,
          CAST(n AS DOUBLE) * sx2 - sx * sx AS vx,
          CAST(n AS DOUBLE) * sy2 - sy * sy AS vy
        FROM m),
      s AS (
        SELECT *, CASE WHEN vx = 0 THEN 0.0 ELSE num / vx END AS slope
        FROM k)
      SELECT event_type, CAST(n AS BIGINT) AS n, slope,
        (sy - slope * sx) / CAST(n AS DOUBLE) AS intercept,
        CASE WHEN vx = 0 OR vy = 0 THEN 0.0
          ELSE num / (sqrt(vx) * sqrt(vy)) END AS corr
      FROM s ORDER BY event_type"""),
    notes = "regression as one agg; exact moments, fixed-order IEEE assembly")

  /** TRIANGLES + CLUSTERING COEFFICIENT ([[graft.operators.Graph
    * .triangles]]) over the undirected event-type transition graph —
    * canonical a<b<c orientation finds each triangle once; coefficient
    * is one IEEE divide of exact integers. */
  val qTriangles = GQuery("q_triangles",
    (s, d) => {
      val edges = graft.operators.Funnel.transitionMatrix(
          Tables.events(s, d), "user_id", "ts", "event_id", "event_type")
        .select(col("from_type"), col("to_type"))
      graft.operators.Graph.triangles(edges, "from_type", "to_type")
    },
    Some("""WITH pairs AS (
        SELECT LAG(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS src,
          event_type AS dst
        FROM events),
      m AS (SELECT DISTINCT src, dst FROM pairs
        WHERE src IS NOT NULL AND src <> dst),
      e AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM m),
      deg AS (SELECT node, COUNT(*) AS degree FROM (
          SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY 1),
      tri AS (
        SELECT ab.u AS a, ab.v AS b, bc.v AS c
        FROM e ab JOIN e bc ON ab.v = bc.u
        JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
      pn AS (SELECT node, COUNT(*) AS n_tri FROM (
          SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
        GROUP BY 1)
      SELECT deg.node, CAST(deg.degree AS BIGINT) AS degree,
        CAST(COALESCE(pn.n_tri, 0) AS BIGINT) AS n_tri,
        CASE WHEN deg.degree < 2 THEN 0.0
          ELSE CAST(2 * COALESCE(pn.n_tri, 0) AS DOUBLE)
            / CAST(deg.degree * (deg.degree - 1) AS DOUBLE) END AS clustering
      FROM deg LEFT JOIN pn USING (node) ORDER BY node"""),
    notes = "orientation-bounded triangle join; per-node corners via union, one agg")

  /** Rendezvous-hash shard routing ([[graft.operators.Sharding]]): every
    * document deterministically assigned to one of 16 shards by
    * highest-md5-weight, reduced to per-shard occupancy. Routing is a
    * pure map-side projection (zero shuffle, ShardingSpec); the oracle
    * recomputes the same md5 argmax in DuckDB — both engines hash the
    * identical `key:shard:salt` string, so the gate is hash-exact with
    * no golden needed. */
  val qShardRoute = GQuery("q_shard_route",
    (s, d) => graft.operators.Sharding.rendezvousRoute(
        Tables.documents(s, d).select(col("doc_id")), "doc_id", 16)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard")),
    Some("""WITH g AS (
        SELECT doc_id, unnest(range(0, 16)) AS s FROM documents),
      w AS (SELECT doc_id, s,
          md5(doc_id::VARCHAR || ':' || s::VARCHAR || ':graft') AS w
        FROM g),
      best AS (SELECT doc_id, arg_max(s, w) AS shard FROM w GROUP BY doc_id)
      SELECT shard, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc,
        MAX(doc_id) AS max_doc
      FROM best GROUP BY shard ORDER BY shard"""),
    notes = "HRW routing: md5 argmax recomputed independently in DuckDB; " +
      "minimal-movement property spec-pinned (ShardingSpec)")

  /** Z-order layout audit ([[graft.operators.Layout]]): documents mapped
    * onto a 2-D (doc_id, n_chars) grid, Morton-interleaved, and assigned
    * to 16 Z-range files; output is each file's row count and per-dim
    * bounding box — the min/max footer stats that make two-dimensional
    * file skipping work. All exact integer bit arithmetic; the twin
    * recomputes the interleave in DuckDB. The projection is shuffle-free
    * (LayoutSpec); the one exchange is the bounded 16-row audit agg. */
  val qZorder = GQuery("q_zorder",
    (s, d) => {
      val pts = Tables.documents(s, d).select(
        (col("doc_id") % 256).as("x"), (col("n_chars") % 256).as("y"))
      graft.operators.Layout.zOrderFiles(pts, "x", "y", bits = 8,
          fileBits = 4)
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy(col("file_id"))
    },
    Some("""WITH pts AS (
        SELECT doc_id % 256 AS x, n_chars % 256 AS y FROM documents),
      z AS (SELECT x, y,
          CAST(list_sum(list_transform(range(0, 8), i ->
            ((x >> i) & 1) * (1 << (2 * i))
              + ((y >> i) & 1) * (1 << (2 * i + 1)))) AS BIGINT) AS zv
        FROM pts)
      SELECT zv >> 12 AS file_id, COUNT(*) AS n_docs,
        MIN(x) AS min_x, MAX(x) AS max_x,
        MIN(y) AS min_y, MAX(y) AS max_y
      FROM z GROUP BY 1 ORDER BY file_id"""),
    notes = "Morton interleave recomputed independently in DuckDB; " +
      "bounding-box tightness spec-pinned (LayoutSpec)")

  /** Exact distinct users per event type via mergeable bitmaps
    * ([[graft.operators.Bitmaps.bitmapDistinct]]): the two-level
    * (group, bucket) bitmap aggregation — bounded state, map-side
    * partials, associative merge. Oracle is the plain COUNT(DISTINCT),
    * gating that the bitmap path is EXACT. */
  val qBitmapDistinct = GQuery("q_bitmap_distinct",
    (s, d) => graft.operators.Bitmaps.bitmapDistinct(
        Tables.events(s, d), Seq("event_type"), "user_id", "n_users")
      .orderBy(col("event_type")),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1 ORDER BY event_type"""),
    notes = "two-level bitmap exact distinct; 4KB/bucket state, no id " +
      "set materialized")

  /** Trailing-7-day distinct users per event type from OR-merged DAILY
    * bitmaps ([[graft.operators.Bitmaps.rollingBitmapDistinct]]): the
    * corpus builds daily bitmaps once; every window is answered from
    * the tiny bitmap table — re-aggregation without re-scanning, which
    * HLL can also do but only approximately. */
  val qBitmapRolling = GQuery("q_bitmap_rolling",
    (s, d) => graft.operators.Bitmaps.rollingBitmapDistinct(
        Tables.events(s, d), "event_type", "ts", "user_id", 7,
        "n_users_7d")
      .select(col("event_type"), Det.fmtDate(col("day")).as("day"),
        col("n_users_7d"))
      .orderBy(col("event_type"), col("day")),
    Some("""WITH days AS (
        SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events)
      SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
        COUNT(DISTINCT e.user_id) AS n_users_7d
      FROM days d JOIN events e ON e.event_type = d.event_type
        AND CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
      GROUP BY 1, d.day ORDER BY d.event_type, day"""),
    notes = "daily bitmaps OR-merge per trailing window; corpus touched " +
      "once, window math on the bounded bitmap table")

  /** Exact SEGMENT-OVERLAP matrix ([[graft.operators.Bitmaps
    * .bitmapOverlap]]): pairwise audience intersection across event
    * types via inclusion–exclusion on OR-merged bitmaps (Spark ships no
    * bitmap AND) — |A∩B| = |A|+|B|−|A∪B|, with Jaccard per-mille. The
    * corpus contributes ONE shuffle (the per-(segment, bucket) bitmap
    * build); all 10 pair statistics re-aggregate that bounded mergeable
    * state. Oracle recomputes every intersection from raw distinct id
    * sets, gating exactness end to end. */
  val qBitmapIntersect = GQuery("q_bitmap_intersect",
    (s, d) => graft.operators.Bitmaps.bitmapOverlap(
      Tables.events(s, d), "event_type", "user_id"),
    Some("""WITH s AS (SELECT DISTINCT event_type AS seg, user_id AS id
          FROM events),
      cnt AS (SELECT seg, COUNT(*) AS n FROM s GROUP BY 1),
      segs AS (SELECT DISTINCT seg FROM s),
      pairs AS (SELECT a.seg AS seg_a, b.seg AS seg_b
        FROM segs a JOIN segs b ON a.seg < b.seg),
      ix AS (SELECT p.seg_a, p.seg_b, COUNT(*) AS ni
        FROM pairs p
          JOIN s x ON x.seg = p.seg_a
          JOIN s y ON y.seg = p.seg_b AND y.id = x.id
        GROUP BY 1, 2)
      SELECT p.seg_a, p.seg_b,
        ca.n AS n_a, cb.n AS n_b,
        COALESCE(ix.ni, 0) AS n_inter,
        ca.n + cb.n - COALESCE(ix.ni, 0) AS n_union,
        COALESCE(ix.ni, 0) * 1000
          // (ca.n + cb.n - COALESCE(ix.ni, 0)) AS jaccard_x1000
      FROM pairs p
        JOIN cnt ca ON ca.seg = p.seg_a
        JOIN cnt cb ON cb.seg = p.seg_b
        LEFT JOIN ix ON ix.seg_a = p.seg_a AND ix.seg_b = p.seg_b
      ORDER BY p.seg_a, p.seg_b"""),
    notes = "inclusion-exclusion over mergeable bitmaps; corpus " +
      "touched once, pair matrix from bounded state")

  /** JOHNSON–LINDENSTRAUSS ±1 projection ([[graft.operators.Ann
    * .randomProjection]]): 64-dim embeddings → 8 integer coordinates
    * under the md5-parity sign matrix (Achlioptas construction — the
    * dimensionality-reduction front end for sketched distance and
    * cheap pre-filtering before exact reranking). Quantization
    * ⌊1000·v⌋ then pure integer folds ⇒ hash-exact; the twin
    * REGENERATES the sign matrix from md5 in SQL, pinning matrix
    * derivation and projection arithmetic together. */
  val qRandProj = GQuery("q_rand_proj",
    (s, d) => graft.operators.Ann.randomProjection(
        Tables.embeddings(s, d), "vec_id", "embedding",
        inDim = 64, outDim = 8)
      .select(col("id").as("vec_id"), col("j"), col("p"))
      .orderBy(col("vec_id"), col("j")),
    Some {
      def hv(arg: String, i: Int) =
        s"""(CASE WHEN ascii(substr(md5($arg), $i, 1)) >= 97
           THEN ascii(substr(md5($arg), $i, 1)) - 87
           ELSE ascii(substr(md5($arg), $i, 1)) - 48 END)"""
      val arg = "concat(CAST(i AS VARCHAR), '_', CAST(j AS VARCHAR))"
      s"""WITH q AS (
        SELECT vec_id,
          generate_subscripts(embedding, 1) - 1 AS i,
          CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT)
            AS qv
        FROM embeddings),
      m AS (
        SELECT ti.i, tj.j,
          CASE WHEN (${hv(arg, 1)} * 16 + ${hv(arg, 2)}) % 2 = 0
            THEN 1 ELSE -1 END AS sgn
        FROM range(0, 64) ti(i), range(0, 8) tj(j))
      SELECT vec_id, CAST(j AS BIGINT) AS j,
        CAST(SUM(qv * sgn) AS BIGINT) AS p
      FROM q JOIN m USING (i)
      GROUP BY 1, 2 ORDER BY vec_id, j"""
    },
    notes = "derived sign matrix (md5 parity, no stored randomness); " +
      "integer-exact projection, one corpus pass, zero shuffles")

  /** Zone-map pruned scan ([[graft.operators.Layout.zoneMapPrune]]):
    * the READ path of the Z-order layout — a 2D range query consults
    * per-file min/max stats and scans only intersecting files. The
    * audit row pins that pruning loses no rows (rows_matched/sum equal
    * the plain predicate recomputed from scratch by the twin) and how
    * many files the stats skipped (files_scanned < files_total —
    * asserted in LayoutSpec). */
  val qZonemapPrune = GQuery("q_zonemap_prune",
    (s, d) => {
      val pts = Tables.documents(s, d).select(col("doc_id"),
        (col("doc_id") % 256).as("x"), (col("n_chars") % 256).as("y"))
      graft.operators.Layout.zoneMapPrune(pts, "x", "y", "doc_id",
        bits = 8, fileBits = 4, xLo = 32, xHi = 63, yLo = 100, yHi = 140)
    },
    Some("""WITH pts AS (
        SELECT doc_id, doc_id % 256 AS x, n_chars % 256 AS y
        FROM documents),
      z AS (SELECT doc_id, x, y,
          CAST(list_sum(list_transform(range(0, 8), i ->
            ((x >> i) & 1) * (1 << (2 * i))
              + ((y >> i) & 1) * (1 << (2 * i + 1)))) AS BIGINT) >> 12
            AS file_id
        FROM pts),
      stats AS (
        SELECT file_id, MIN(x) AS min_x, MAX(x) AS max_x,
          MIN(y) AS min_y, MAX(y) AS max_y, COUNT(*) AS n_rows
        FROM z GROUP BY 1),
      cand AS (
        SELECT * FROM stats
        WHERE max_x >= 32 AND min_x <= 63 AND max_y >= 100 AND min_y <= 140),
      matched AS (
        SELECT z.doc_id FROM z JOIN cand USING (file_id)
        WHERE z.x BETWEEN 32 AND 63 AND z.y BETWEEN 100 AND 140)
      SELECT (SELECT COUNT(*) FROM stats) AS files_total,
        (SELECT COUNT(*) FROM cand) AS files_scanned,
        (SELECT CAST(SUM(n_rows) AS BIGINT) FROM cand) AS rows_scanned,
        (SELECT COUNT(*) FROM matched) AS rows_matched,
        (SELECT CAST(SUM(doc_id) AS BIGINT) FROM matched) AS sum_metric"""),
    notes = "file-skipping read path of the Z-order layout; audit row " +
      "gates zero-loss pruning + skip counts")

  /** Bucketed co-located join ([[graft.sources.Sources.writeBucketedTable]]):
    * events and customer are each written ONCE as 8-bucket hash tables on
    * the join key, then the per-user enrichment join reads both bucketed
    * scans with no join-side Exchange (the write-once-shuffle-never-again
    * posture for a recurring 100 TB pipeline; the zero-Exchange plan is
    * pinned in BucketedTableSpec — this registry entry oracle-gates the
    * RESULT through the bucketed path). Tables are created on first use
    * per sf dir (idempotent within a session) under a temp warehouse. */
  val qBucketedJoin = GQuery("q_bucketed_join",
    (s, d) => {
      import graft.sources.Sources
      val suffix = java.lang.Long.toHexString(d.hashCode.toLong & 0xffffffffL)
      val (evT, custT) = (s"ev_bucketed_$suffix", s"cust_bucketed_$suffix")
      if (!s.catalog.tableExists(evT)) {
        val root = java.nio.file.Files
          .createTempDirectory("graft_bucketed").toString
        Sources.writeBucketedTable(
          Tables.events(s, d).select(col("user_id"), col("value")),
          evT, s"$root/$evT", 8, Seq("user_id"))
        Sources.writeBucketedTable(
          Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
          custT, s"$root/$custT", 8, Seq("c_custkey"))
      }
      s.table(evT)
        .join(s.table(custT), col("user_id") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("user_id"), col("value"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          graft.Det.dsum(col("value")).as("total_value"))
        .orderBy(col("segment"))
    },
    Some(s"""SELECT c.c_mktsegment AS segment, COUNT(*) AS n_events,
        COUNT(DISTINCT e.user_id) AS n_users,
        ${graft.Det.sqlDsum("e.value")} AS total_value
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1 ORDER BY segment"""),
    notes = "co-located bucketed join; plan co-location pinned in " +
      "BucketedTableSpec, result oracle-gated here")

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV drift ([[graft.operators.Reports
    * .ksDrift]]): exact D = max|F_before − F_after| per event_type
    * across the 2024-01-16 split, kept as the integer numerator over
    * the common n_b·n_a denominator (q_drift sees mean shifts; this
    * sees full-distribution shape shifts). One (group, value) pre-agg,
    * one group-keyed window exchange carrying both CDFs. */
  val qKsDrift = GQuery("q_ks_drift",
    (s, d) => graft.operators.Reports.ksDrift(
      Tables.events(s, d), "event_type", "ts", "value",
      java.sql.Timestamp.valueOf("2024-01-16 00:00:00")),
    Some("""WITH pv AS (
        SELECT event_type AS g, value AS v,
          SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS db,
          SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS da
        FROM events GROUP BY 1, 2),
      cdf AS (
        SELECT g, v,
          SUM(db) OVER (PARTITION BY g ORDER BY v
            ROWS UNBOUNDED PRECEDING) AS cb,
          SUM(da) OVER (PARTITION BY g ORDER BY v
            ROWS UNBOUNDED PRECEDING) AS ca,
          SUM(db) OVER (PARTITION BY g) AS nb,
          SUM(da) OVER (PARTITION BY g) AS na
        FROM pv),
      dd AS (SELECT g, v, nb, na, abs(cb*na - ca*nb) AS diff FROM cdf),
      ag AS (SELECT g, MAX(nb) AS nb, MAX(na) AS na, MAX(diff) AS ksn
        FROM dd GROUP BY g),
      at AS (SELECT dd.g, MIN(dd.v) AS ks_at
        FROM dd JOIN ag ON dd.g = ag.g AND dd.diff = ag.ksn GROUP BY dd.g)
      SELECT a.g AS event_type, CAST(a.nb AS BIGINT) AS n_before,
        CAST(a.na AS BIGINT) AS n_after, CAST(a.ksn AS BIGINT) AS ks_num,
        t.ks_at,
        CAST(a.ksn AS DOUBLE) / CAST(a.nb * a.na AS DOUBLE) AS ks
      FROM ag a JOIN at t ON a.g = t.g ORDER BY event_type"""),
    notes = "exact KS numerator + argmax location; one window exchange " +
      "carries both CDFs")

  /** POPULATION STABILITY INDEX ([[graft.operators.Reports.psiDrift]]):
    * per-bucket (p−q)·log₂(p/q) in 1/64-bit fixed point over the
    * event_type distribution across the 2024-01-16 split — the
    * categorical drift monitor, integer-exact via the lg64 chain
    * (no libm log crosses the engine boundary). Bucket counts are one
    * |buckets|-bounded groupBy; totals broadcast back. */
  val qPsiDrift = GQuery("q_psi_drift",
    (s, d) => graft.operators.Reports.psiDrift(
      Tables.events(s, d), "event_type", "ts",
      java.sql.Timestamp.valueOf("2024-01-16 00:00:00")),
    Some {
      val chain1 = graft.operators.NaiveBayes.sqlLg64Chain(
        "j", "pn", Seq("bucket", "cb", "ca", "pn", "qn"), "lpc", "lp")
      val chain2 = graft.operators.NaiveBayes.sqlLg64Chain(
        "lpc", "qn", Seq("bucket", "cb", "ca", "pn", "qn", "lp"),
        "lqc", "lq")
      s"""WITH c0 AS (
        SELECT event_type AS bucket,
          SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            + 1 AS cb,
          SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            + 1 AS ca
        FROM events GROUP BY 1),
      t AS (SELECT SUM(cb) AS nb, SUM(ca) AS na FROM c0),
      j AS (SELECT bucket, cb, ca, cb * na AS pn, ca * nb AS qn
        FROM c0, t),
      $chain1,
      $chain2
      SELECT bucket, CAST(cb AS BIGINT) AS cb, CAST(ca AS BIGINT) AS ca,
        CAST((pn - qn) * (lp - lq) AS BIGINT) AS psi64
      FROM lqc ORDER BY bucket"""
    },
    notes = "fixed-point PSI; bucket-bounded agg, broadcast totals, " +
      "lg64 twin chain")

  /** HOLT level+trend smoothing ([[graft.operators.Reports.holtDaily]]):
    * α=β=½ double-exponential smoothing of the per-type daily value
    * series on micro-scaled integers — every update one add + one
    * arithmetic halving, so the whole recursion is integer-exact and
    * the twin replays it as a recursive CTE with sign-safe floor-div.
    * The sequential state rides a per-key ordered array fold (keys
    * parallel; state bounded by days-per-key). */
  val qHolt = GQuery("q_holt",
    (s, d) => graft.operators.Reports.holtDaily(
      Tables.events(s, d), "event_type", "ts", "value"),
    Some("""WITH RECURSIVE daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS day,
          CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
      rn AS (SELECT g, day, x,
          ROW_NUMBER() OVER (PARTITION BY g ORDER BY day) AS r
        FROM daily),
      rec AS (
        SELECT g, day, r, x, x AS s, CAST(0 AS BIGINT) AS b
        FROM rn WHERE r = 1
        UNION ALL
        SELECT n.g, n.day, n.r, n.x,
          ((n.x + rec.s + rec.b)
            - ((((n.x + rec.s + rec.b) % 2) + 2) % 2)) // 2 AS s,
          ((((n.x + rec.s + rec.b)
              - ((((n.x + rec.s + rec.b) % 2) + 2) % 2)) // 2
             - rec.s + rec.b)
            - ((((((n.x + rec.s + rec.b)
              - ((((n.x + rec.s + rec.b) % 2) + 2) % 2)) // 2
             - rec.s + rec.b) % 2) + 2) % 2)) // 2 AS b
        FROM rec JOIN rn n ON n.g = rec.g AND n.r = rec.r + 1)
      SELECT g AS event_type, strftime(day, '%Y-%m-%d') AS day,
        x AS x_micro, s AS s_micro, b AS b_micro,
        s + b AS forecast_micro
      FROM rec ORDER BY event_type, day"""),
    notes = "trend-aware EWMA sibling; integer halving recursion, " +
      "per-key array fold vs recursive-CTE twin")

  /** KEY-SKEW PROFILER ([[graft.operators.Sharding.skewProfile]]): the
    * pre-shuffle diagnostic — top-5 heavy keys of events.user_id with
    * exact per-mille skew vs uniform and the ceil salt factor that
    * would level each. One key-count groupBy + broadcast stats. */
  val qSkewProfile = GQuery("q_skew_profile",
    (s, d) => graft.operators.Sharding.skewProfile(
      Tables.events(s, d), "user_id", k = 5),
    Some("""WITH c AS (
        SELECT user_id AS key, COUNT(*) AS cnt FROM events GROUP BY 1),
      st AS (SELECT SUM(cnt) AS n, COUNT(*) AS d, MAX(cnt) AS max_cnt
        FROM c),
      top AS (SELECT key, cnt FROM c ORDER BY cnt DESC, key LIMIT 5)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS BIGINT)
          AS rank,
        key, CAST(cnt AS BIGINT) AS cnt, CAST(st.n AS BIGINT) AS n,
        CAST(st.d AS BIGINT) AS d,
        CAST((cnt * st.d * 1000) // st.n AS BIGINT) AS skew_x1000,
        CAST((cnt * st.d + st.n - 1) // st.n AS BIGINT) AS salt_factor
      FROM top, st ORDER BY rank"""),
    notes = "salting planner input; exact integer skew ratios, corpus " +
      "scanned once")

  /** LABEL PROPAGATION communities ([[graft.operators.Graph
    * .labelPropagation]]): 3 deterministic synchronous rounds over the
    * co-purchase part graph (parts co-ordered in one order, weight =
    * co-order count) — max-weight neighbor label, smallest-label ties.
    * The twin replays every round as chained CTEs with QUALIFY argmax. */
  val qLabelProp = GQuery("q_label_prop",
    (s, d) => {
      val pairs = coPurchaseEdges(s, d, distinctItems = false)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      graft.operators.Graph.labelPropagation(pairs, "src", "dst", "w",
        iters = 3)
    },
    Some("""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
      e AS (
        SELECT a.p AS u, b.p AS v, COUNT(*) AS w
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2),
      nbr AS (SELECT u AS node, v AS nbr, w FROM e
        UNION ALL SELECT v, u, w FROM e),
      l0 AS (SELECT DISTINCT node, node AS label FROM nbr),
      s1 AS (SELECT nbr.node, l.label, SUM(nbr.w) AS s
        FROM nbr JOIN l0 l ON nbr.nbr = l.node GROUP BY 1, 2),
      l1 AS (SELECT node, label FROM s1
        QUALIFY ROW_NUMBER() OVER (PARTITION BY node
          ORDER BY s DESC, label) = 1),
      s2 AS (SELECT nbr.node, l.label, SUM(nbr.w) AS s
        FROM nbr JOIN l1 l ON nbr.nbr = l.node GROUP BY 1, 2),
      l2 AS (SELECT node, label FROM s2
        QUALIFY ROW_NUMBER() OVER (PARTITION BY node
          ORDER BY s DESC, label) = 1),
      s3 AS (SELECT nbr.node, l.label, SUM(nbr.w) AS s
        FROM nbr JOIN l2 l ON nbr.nbr = l.node GROUP BY 1, 2),
      l3 AS (SELECT node, label FROM s3
        QUALIFY ROW_NUMBER() OVER (PARTITION BY node
          ORDER BY s DESC, label) = 1)
      SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        MIN(node) AS min_node
      FROM l3 GROUP BY 1 ORDER BY community"""),
    notes = "deterministic synchronous LPA; per-round node-keyed " +
      "join + argmax, lineage checkpoint-truncated")

  /** BENFORD FIRST-DIGIT AUDIT on o_totalprice — the classic
    * fabricated-data / unit-drift smell test (a price column that got
    * multiplied by 1000 shifts its leading-digit mix visibly; cf. the
    * round-6 timestamp-unit incident this guard family exists for).
    * First significant digit via floor→int64→string head (no log10 —
    * libm-free, so the digit is exact in both engines); observed share
    * and deviation from Benford's log₁₀(1+1/d) in integer per-mille
    * (the expectation table is 9 CONSTANTS, not computed). Plan: one
    * map-side-combined 9-group agg + a 9-row window total — nothing
    * leaves the executor until the 9-row result. */
  val qBenford = GQuery("q_benford",
    (s, d) => {
      val expXm = Map(1 -> 301, 2 -> 176, 3 -> 125, 4 -> 97, 5 -> 79,
        6 -> 67, 7 -> 58, 8 -> 51, 9 -> 46)
      val expCol = expXm.foldLeft(lit(0)) { case (acc, (dig, e)) =>
        when(col("digit") === dig, lit(e)).otherwise(acc) }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
      Tables.orders(s, d)
        .select(substring(floor(col("o_totalprice")).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .filter(col("digit").between(1, 9))
        .groupBy(col("digit")).agg(count(lit(1)).as("cnt"))
        .withColumn("total", sum(col("cnt")).over(w))
        .withColumn("obs_x1000", expr("cnt * 1000 div total"))
        .withColumn("exp_x1000", expCol.cast("long"))
        .select(col("digit"), col("cnt"), col("obs_x1000"),
          col("exp_x1000"),
          abs(col("obs_x1000") - col("exp_x1000")).as("dev_x1000"))
        .orderBy(col("digit"))
    },
    Some("""WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
            AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders),
      cts AS (SELECT digit, COUNT(*) AS cnt FROM digits
        WHERE digit BETWEEN 1 AND 9 GROUP BY 1),
      ex(digit, exp_x1000) AS (VALUES (1, 301), (2, 176), (3, 125),
        (4, 97), (5, 79), (6, 67), (7, 58), (8, 51), (9, 46)),
      t AS (SELECT digit, cnt, SUM(cnt) OVER () AS total FROM cts)
      SELECT t.digit, CAST(t.cnt AS BIGINT) AS cnt,
        CAST(t.cnt * 1000 // t.total AS BIGINT) AS obs_x1000,
        CAST(ex.exp_x1000 AS BIGINT) AS exp_x1000,
        CAST(abs(t.cnt * 1000 // t.total - ex.exp_x1000) AS BIGINT)
          AS dev_x1000
      FROM t JOIN ex USING (digit) ORDER BY t.digit"""),
    notes = "leading-digit audit, integer per-mille vs constant " +
      "Benford table; libm-free digit extraction")

  /** Co-purchase edge stream (src < dst, one row per per-order pair):
    * the in-array pair generation of [[graft.operators.Aggregates
    * .coOccurrence]] — one basket groupBy + a bounded in-array fan-out
    * — instead of the lineitem self-join, which shuffles the fact table
    * twice and pays a join for pairs the basket array can emit locally.
    * TPC-H-ish orders carry ≤ 7 lines, so the 64-item cap never binds
    * and the generated edge multiset is IDENTICAL to the self-join
    * formulation the DuckDB twins state (twins keep the relational
    * form: DuckDB has no cheaper array path and clarity wins there).
    * Shared by the graph-query family (k-core, Adamic-Adar, BFS, LPA).
    */
  private def coPurchaseEdges(s: org.apache.spark.sql.SparkSession,
      d: String, distinctItems: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
    val items =
      if (distinctItems) collect_set(col("l_partkey"))
      else collect_list(col("l_partkey"))
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(slice(sort_array(items), 1, 64).as("__items"))
      .select(explode(flatten(
        expr("""transform(__items, (x, i) ->
                  transform(slice(__items, i + 2, size(__items)),
                    y -> struct(x AS src, y AS dst)))"""))).as("__p"))
      // distinct=false keeps per-line multiplicity: the sorted-list pair
      // fan-out yields cnt_x*cnt_y rows for x<y (the self-join count)
      // plus C(cnt_x,2) self-pairs the relational a.p<b.p form never
      // emits -- dropped here
      .select(col("__p.src").as("src"), col("__p.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** K-CORE of the co-purchase part graph ([[graft.operators.Graph
    * .kCore]]): 3 peeling rounds at k=80 — the dense-substructure filter
    * (curation analogue: keep entities with enough corroborating
    * co-occurrence). Monotone peeling ⇒ the fixed round count is
    * deterministic and the chained-CTE twin replays it stage by stage. */
  val qKcore = GQuery("q_kcore",
    (s, d) => {
      val pairs = coPurchaseEdges(s, d)
      graft.operators.Graph.kCore(pairs, "src", "dst", k = 80, rounds = 3)
    },
    Some("""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
      e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
      d1 AS (SELECT node, COUNT(*) AS degree FROM
        (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
      s1 AS (SELECT node FROM d1 WHERE degree >= 80),
      e1 AS (SELECT u, v FROM e0
        WHERE u IN (SELECT node FROM s1) AND v IN (SELECT node FROM s1)),
      d2 AS (SELECT node, COUNT(*) AS degree FROM
        (SELECT u AS node FROM e1 UNION ALL SELECT v FROM e1) GROUP BY 1),
      s2 AS (SELECT node FROM d2 WHERE degree >= 80),
      e2 AS (SELECT u, v FROM e1
        WHERE u IN (SELECT node FROM s2) AND v IN (SELECT node FROM s2)),
      d3 AS (SELECT node, COUNT(*) AS degree FROM
        (SELECT u AS node FROM e2 UNION ALL SELECT v FROM e2) GROUP BY 1),
      s3 AS (SELECT node FROM d3 WHERE degree >= 80),
      e3 AS (SELECT u, v FROM e2
        WHERE u IN (SELECT node FROM s3) AND v IN (SELECT node FROM s3))
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM
        (SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
      GROUP BY 1 HAVING COUNT(*) >= 80 ORDER BY node"""),
    notes = "k-core peeling, 3 rounds at k=80; per-round degree agg + " +
      "two semi-joins, checkpoint-truncated")

  /** PERSONALIZED PAGERANK ([[graft.operators.Graph
    * .personalizedPageRank]]) on the weighted symmetrized co-purchase
    * graph: random walk with restart to the seed parts (partkey < 20) —
    * the "related items" relevance propagation a recommender or
    * curation dedup-by-affinity pass runs. Same scaled-int fixed point
    * as q_pagerank; the twin unrolls the 3 rounds with the seed-flag
    * teleport. */
  val qPprSeeds = GQuery("q_ppr_seeds",
    (s, d) => {
      val pairs = coPurchaseEdges(s, d, distinctItems = false)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      val sym = pairs.union(pairs.select(col("dst").as("src"),
        col("src").as("dst"), col("w")))
      graft.operators.Graph.personalizedPageRank(sym, "src", "dst", "w",
        Tables.part(s, d).filter(col("p_partkey") < 20)
          .select(col("p_partkey")), "p_partkey", iterations = 3)
    },
    Some("""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
      e0 AS (
        SELECT a.p AS u, b.p AS v, COUNT(*) AS w
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2),
      e AS (SELECT u AS src, v AS dst, w FROM e0
        UNION ALL SELECT v, u, w FROM e0),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      flag AS (SELECT node,
          CASE WHEN node < 20 THEN 1 ELSE 0 END AS seed
        FROM nodes),
      ss AS (SELECT SUM(seed) AS s FROM flag),
      outd AS (SELECT src, SUM(w) AS out_w FROM e GROUP BY 1),
      r0 AS (SELECT node, CASE WHEN seed = 1
          THEN 1000000000000 // ss.s ELSE 0 END AS rank_fp
        FROM flag CROSS JOIN ss),
      c1 AS (SELECT e.dst AS node,
          SUM((r.rank_fp // o.out_w) * e.w) AS ct
        FROM r0 r JOIN e ON r.node = e.src JOIN outd o ON e.src = o.src
        GROUP BY 1),
      r1 AS (SELECT flag.node,
          CASE WHEN flag.seed = 1
            THEN 150000000000000 // (1000 * ss.s) ELSE 0 END
          + (850 * COALESCE(c1.ct, 0)) // 1000 AS rank_fp
        FROM flag CROSS JOIN ss LEFT JOIN c1 ON flag.node = c1.node),
      c2 AS (SELECT e.dst AS node,
          SUM((r.rank_fp // o.out_w) * e.w) AS ct
        FROM r1 r JOIN e ON r.node = e.src JOIN outd o ON e.src = o.src
        GROUP BY 1),
      r2 AS (SELECT flag.node,
          CASE WHEN flag.seed = 1
            THEN 150000000000000 // (1000 * ss.s) ELSE 0 END
          + (850 * COALESCE(c2.ct, 0)) // 1000 AS rank_fp
        FROM flag CROSS JOIN ss LEFT JOIN c2 ON flag.node = c2.node),
      c3 AS (SELECT e.dst AS node,
          SUM((r.rank_fp // o.out_w) * e.w) AS ct
        FROM r2 r JOIN e ON r.node = e.src JOIN outd o ON e.src = o.src
        GROUP BY 1),
      r3 AS (SELECT flag.node,
          CASE WHEN flag.seed = 1
            THEN 150000000000000 // (1000 * ss.s) ELSE 0 END
          + (850 * COALESCE(c3.ct, 0)) // 1000 AS rank_fp
        FROM flag CROSS JOIN ss LEFT JOIN c3 ON flag.node = c3.node)
      SELECT node, CAST(rank_fp AS BIGINT) AS rank_fp,
        CAST(rank_fp AS DOUBLE) / 1000000000000.0 AS rank
      FROM r3 ORDER BY node"""),
    notes = "random walk with restart; seed-flag teleport, scaled-int " +
      "div rounds; edge list pre-partitioned, node-sized round shuffles")

  /** ADAMIC–ADAR link prediction on the co-purchase graph
    * ([[graft.operators.Graph.adamicAdar]]): top-50 absent edges by
    * Σ 1/log₂ deg(w) over common neighbors, in 64_000_000/lg64 fixed
    * point — hub intermediaries (deg > 64) excluded, which is also the
    * 100 TB cost bound (candidate fan-out ≤ maxDeg² per node). */
  val qAdamicAdar = GQuery("q_adamic_adar",
    (s, d) => {
      val pairs = coPurchaseEdges(s, d)
      graft.operators.Graph.adamicAdar(pairs, "src", "dst",
        maxDeg = 64, topN = 50)
    },
    Some("""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
      e AS (SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
      adj AS (SELECT u AS node, v AS nbr FROM e
        UNION ALL SELECT v, u FROM e),
      d AS (SELECT node, COUNT(*) AS degree FROM adj GROUP BY 1),
      dd AS (SELECT DISTINCT degree FROM d
        WHERE degree BETWEEN 2 AND 64),
      """ + graft.operators.NaiveBayes.sqlLg64Chain(
        "dd", "degree", Seq("degree"), "lgt", "lg") + """,
      wt AS (SELECT degree, 64000000 // lg AS w_fp FROM lgt),
      mid AS (SELECT adj.node, adj.nbr, wt.w_fp
        FROM adj JOIN d USING (node) JOIN wt USING (degree)),
      cand AS (SELECT a.nbr AS u, b.nbr AS v, COUNT(*) AS n_common,
          SUM(a.w_fp) AS aa
        FROM mid a JOIN mid b ON a.node = b.node AND a.nbr < b.nbr
        GROUP BY 1, 2),
      pred AS (SELECT * FROM cand c WHERE NOT EXISTS
        (SELECT 1 FROM e WHERE e.u = c.u AND e.v = c.v))
      SELECT u, v, CAST(n_common AS BIGINT) AS n_common,
        CAST(aa AS BIGINT) AS aa_x1e6
      FROM pred ORDER BY aa_x1e6 DESC, u, v LIMIT 50"""),
    notes = "AA over common neighbors, lg64 fixed point; one shuffle " +
      "on the intermediary key, hub cap, top-n bounded")

  /** CHI-SQUARE INDEPENDENCE TEST + CRAMÉR'S V² on the same
    * segment×priority contingency as [[qMutualInfo]] — the significance
    * companion (MI says how MUCH information, χ² says whether the
    * association clears chance). Exact fixed point end to end:
    * χ²·10³ = Σ_ij ((n_ij·N − r_i·c_j)²·10³) div (N·r_i·c_j) on
    * DECIMAL(38,0) (the squared term passes int64 at sf0.1), and
    * V²·10⁶ = χ²·10³·10³ div (N·(min(R,C)−1)) — no square root, so no
    * libm. Same plan as q_mutual_info: one broadcast-dim join, margins
    * from the 25-row cell table, 1-row totals on the whitelisted
    * broadcast cross join. Output 1 row: (n, chi2_x1000, v2_x1e6). */
  val qChi2 = GQuery("q_chi2",
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val j = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("o_orderpriority").as("priority"))
      val cell = j.groupBy(col("segment"), col("priority"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val rm = cell.groupBy(col("segment")).agg(sum(col("n")).as("r"))
      val cm = cell.groupBy(col("priority")).agg(sum(col("n")).as("c"))
      val nt = cell.agg(sum(col("n")).as("nn"),
        countDistinct(col("segment")).as("nr"),
        countDistinct(col("priority")).as("nc"))
      cell.join(broadcast(rm), Seq("segment"))
        .join(broadcast(cm), Seq("priority"))
        .crossJoin(broadcast(nt))
        .withColumn("dev", (col("n").cast(dec) * col("nn").cast(dec)
          - col("r").cast(dec) * col("c").cast(dec)))
        .withColumn("term", expr(
          // denominator in DECIMAL(38,0) too — nn·r·c is N³-scale and
          // passes int64 only to ~sf1; the twin runs it in HUGEINT
          "(dev * dev * 1000) div (cast(nn as decimal(38,0)) * r * c)")
          .cast(dec))
        .agg(max(col("nn")).as("n"),
          sum(col("term")).cast("long").as("chi2_x1000"),
          max(col("nn") * (least(col("nr"), col("nc")) - 1)).as("vden"))
        .select(col("n"),
          col("chi2_x1000"),
          expr("(cast(chi2_x1000 as decimal(38,0)) * 1000) div vden")
            .as("v2_x1e6"))
    },
    Some("""WITH j AS (
        SELECT c_mktsegment AS segment, o_orderpriority AS priority
        FROM orders JOIN customer ON o_custkey = c_custkey),
      cell AS (SELECT segment, priority, COUNT(*) AS n FROM j
        GROUP BY 1, 2),
      rm AS (SELECT segment, SUM(n) AS r FROM cell GROUP BY 1),
      cm AS (SELECT priority, SUM(n) AS c FROM cell GROUP BY 1),
      nt AS (SELECT SUM(n) AS nn, COUNT(DISTINCT segment) AS nr,
          COUNT(DISTINCT priority) AS nc
        FROM cell),
      terms AS (SELECT
          (CAST(cell.n AS HUGEINT) * nt.nn - CAST(rm.r AS HUGEINT) * cm.c)
            AS dev,
          CAST(nt.nn AS HUGEINT) * rm.r * cm.c AS den, nt.nn, nt.nr, nt.nc
        FROM cell JOIN rm USING (segment) JOIN cm USING (priority), nt)
      SELECT CAST(MAX(nn) AS BIGINT) AS n,
        CAST(SUM((dev * dev * 1000) // den) AS BIGINT) AS chi2_x1000,
        CAST((SUM((dev * dev * 1000) // den) * 1000)
          // (MAX(nn) * (least(MAX(nr), MAX(nc)) - 1)) AS BIGINT)
          AS v2_x1e6
      FROM terms"""),
    notes = "exact fixed-point chi-square + Cramér V² (no sqrt); " +
      "decimal/HUGEINT squared terms, margins from the cell table")

  /** SPEARMAN RANK CORRELATION between customer account balance and
    * realized spend — the monotone-association check (Pearson on RANKS,
    * so outliers and nonlinearity don't distort it). Ranks are
    * row_number with the c_custkey tie-break (deterministic positional
    * ranks, both engines; documented deviation from average-rank ties —
    * at most 1/n per tie run and exactly mirrored). Both rank sets are
    * then exactly 1..n, so Σx, Σx² are closed forms and
    * ρ = (n·Σxy − Sx²) / (n·Sxx − Sx²) needs ONE mirrored IEEE divide
    * of DECIMAL(38,0)/HUGEINT exact sums. Windows run over the
    * |customers|-row aggregate. Output: (n, sxy, rho). */
  val qSpearman = GQuery("q_spearman",
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("ck"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long"))
          .as("cents"))
      val base = Tables.customer(s, d)
        .join(spend, col("c_custkey") === col("ck"))
        .select(col("ck"), col("c_acctbal"), col("cents"))
      val wx = org.apache.spark.sql.expressions.Window
        .orderBy(col("c_acctbal"), col("ck"))
      val wy = org.apache.spark.sql.expressions.Window
        .orderBy(col("cents"), col("ck"))
      base
        .withColumn("rx", row_number().over(wx).cast(dec))
        .withColumn("ry", row_number().over(wy).cast(dec))
        .agg(count(lit(1)).cast(dec).as("n"),
          sum(col("rx") * col("ry")).as("sxy"))
        .select(col("n").cast("long").as("n"),
          col("sxy").cast("long").as("sxy"), {
            // Spark `div` yields BIGINT, so the closed-form rank
            // moments are cast back to DECIMAL(38,0) before any
            // product (Sx² ≈ n⁴/4 passes int64 at only ~78k rows) —
            // mirroring the twin, where `//` on HUGEINT stays HUGEINT.
            val sx = expr("cast((n * (n + 1)) div 2 as decimal(38,0))")
            val sxx = expr(
              "cast((n * (n + 1) * (2 * n + 1)) div 6 as decimal(38,0))")
            ((col("n") * col("sxy") - sx * sx).cast("double") /
              (col("n") * sxx - sx * sx).cast("double")).as("rho")
          })
    },
    Some("""WITH spend AS (
        SELECT o_custkey AS ck,
          SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1),
      base AS (SELECT ck, c_acctbal, cents
        FROM customer JOIN spend ON c_custkey = ck),
      ranked AS (SELECT
          CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, ck) AS HUGEINT)
            AS rx,
          CAST(ROW_NUMBER() OVER (ORDER BY cents, ck) AS HUGEINT) AS ry
        FROM base),
      st AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(rx * ry) AS sxy
        FROM ranked)
      SELECT CAST(n AS BIGINT) AS n, CAST(sxy AS BIGINT) AS sxy,
        CAST(n * sxy - ((n * (n + 1)) // 2) * ((n * (n + 1)) // 2)
          AS DOUBLE)
        / CAST(n * ((n * (n + 1) * (2 * n + 1)) // 6)
          - ((n * (n + 1)) // 2) * ((n * (n + 1)) // 2) AS DOUBLE)
          AS rho
      FROM st"""),
    notes = "Pearson on positional ranks; closed-form rank moments, " +
      "one mirrored IEEE divide of exact int128 sums")

  /** DELETE-A-GROUP JACKKNIFE variance of the mean event value — the
    * uncertainty primitive a metrics pipeline attaches to every point
    * estimate, made fully deterministic: 10 md5-bucket groups (the
    * engine's standard hash-split), values micro-quantized to int64, so
    * replicate means m_i = (S − s_i) div (N − n_i), the replicate-mean
    * average, and the (g−1)/g-scaled squared-deviation sum are ALL
    * exact integers — no IEEE summation-order nondeterminism anywhere.
    * Output: (n_events, mean_micro, jk_var_micro2 = (g−1)·Σd² div g).
    * Plan: one map-side-combined 10-row bucket agg; everything after
    * runs on 10 rows (the 1-row totals ride the whitelisted broadcast
    * cross join). */
  val qJackknife = GQuery("q_jackknife",
    (s, d) => {
      val b = Tables.events(s, d)
        .select(graft.operators.Dsir.bucketOf(
            concat(lit("jk:"), col("event_id").cast("string")), 10).as("g"),
          floor(col("value") * 1000000).cast("long").as("v"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg"))
      val tot = b.agg(sum(col("ng")).as("n"), sum(col("sg")).as("st"))
      val reps = b.crossJoin(broadcast(tot))
        .withColumn("mi", expr("(st - sg) div (n - ng)"))
      val mbar = reps.agg(count(lit(1)).as("gcnt"), sum(col("mi")).as("sm"))
      reps.crossJoin(broadcast(mbar.select(
          expr("sm div gcnt").as("mb"), col("gcnt"))))
        .withColumn("d", col("mi") - col("mb"))
        .groupBy(col("gcnt"), col("n"), col("st"))
        .agg(sum(col("d") * col("d")).as("ssd"))
        .select(col("n").as("n_events"),
          expr("st div n").as("mean_micro"),
          expr("(gcnt - 1) * ssd div gcnt").as("jk_var_micro2"))
    },
    Some {
      def hx(i: Int) =
        s"ascii(substr(md5('jk:' || CAST(event_id AS VARCHAR)), $i, 1))"
      def hv(i: Int) =
        s"(CASE WHEN ${hx(i)} >= 97 THEN ${hx(i)} - 87 ELSE ${hx(i)} - 48 END)"
      s"""WITH b AS (
        SELECT (${hv(1)} * 16 + ${hv(2)}) % 10 AS g,
          CAST(floor(value * 1000000) AS BIGINT) AS v
        FROM events),
      bg AS (SELECT g, COUNT(*) AS ng, SUM(v) AS sg FROM b GROUP BY 1),
      tot AS (SELECT SUM(ng) AS n, SUM(sg) AS st FROM bg),
      reps AS (SELECT bg.g, (tot.st - bg.sg) // (tot.n - bg.ng) AS mi,
          tot.n, tot.st
        FROM bg, tot),
      mb AS (SELECT COUNT(*) AS gcnt, SUM(mi) AS sm,
          MAX(n) AS n, MAX(st) AS st FROM reps),
      dd AS (SELECT reps.mi - (mb.sm // mb.gcnt) AS dv,
          mb.gcnt, mb.n, mb.st
        FROM reps, mb)
      SELECT CAST(MAX(n) AS BIGINT) AS n_events,
        CAST(MAX(st) // MAX(n) AS BIGINT) AS mean_micro,
        CAST((MAX(gcnt) - 1) * SUM(dv * dv) // MAX(gcnt) AS BIGINT)
          AS jk_var_micro2
      FROM dd"""
    },
    notes = "delete-a-group jackknife, all-integer replicate algebra; " +
      "md5-bucket groups shared with the sampling family")

  /** MUTUAL INFORMATION / PMI audit between customer segment and order
    * priority — the feature-selection primitive (is this column
    * informative about that label?) run as a relational program: the
    * 5×5 contingency table, margins, and per-cell pointwise MI in lg64
    * fixed point — pmi_x64 = lg64(n_ij·N) − lg64(r_i·c_j) (sign carries
    * over/under-representation), contrib = n_ij·pmi_x64 (≈ 64·N·MI
    * summand). All int64; products stay ≤ N² < 2⁴⁹ at any tested SF.
    * Plan: one broadcast-dim join + one cell agg; margins re-agg the
    * 25-row cell table (never the fact table); the 1-row total rides a
    * broadcast cross join (the q_tfidf_topk shape, whitelisted). */
  val qMutualInfo = GQuery("q_mutual_info",
    (s, d) => {
      import graft.operators.NaiveBayes.lg64
      val j = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("o_orderpriority").as("priority"))
      val cell = j.groupBy(col("segment"), col("priority"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // margins + total re-agg the 25-row table
      val rm = cell.groupBy(col("segment")).agg(sum(col("n")).as("r"))
      val cm = cell.groupBy(col("priority")).agg(sum(col("n")).as("c"))
      val nt = cell.agg(sum(col("n")).as("nn"))
      cell.join(broadcast(rm), Seq("segment"))
        .join(broadcast(cm), Seq("priority"))
        .crossJoin(broadcast(nt))
        .withColumn("pmi_x64",
          lg64(col("n") * col("nn")) - lg64(col("r") * col("c")))
        .select(col("segment"), col("priority"), col("n"),
          col("pmi_x64"), (col("n") * col("pmi_x64")).as("contrib"))
        .orderBy(col("segment"), col("priority"))
    },
    Some("""WITH j AS (
        SELECT c_mktsegment AS segment, o_orderpriority AS priority
        FROM orders JOIN customer ON o_custkey = c_custkey),
      cell AS (SELECT segment, priority, COUNT(*) AS n FROM j
        GROUP BY 1, 2),
      rm AS (SELECT segment, SUM(n) AS r FROM cell GROUP BY 1),
      cm AS (SELECT priority, SUM(n) AS c FROM cell GROUP BY 1),
      nt AS (SELECT SUM(n) AS nn FROM cell),
      base AS (SELECT cell.segment, cell.priority, cell.n,
          cell.n * nt.nn AS pa, rm.r * cm.c AS pb
        FROM cell JOIN rm USING (segment) JOIN cm USING (priority), nt),
      dpa AS (SELECT DISTINCT pa AS x FROM base),
      """ + graft.operators.NaiveBayes.sqlLg64Chain(
        "dpa", "x", Seq("x"), "la", "lga") + """,
      dpb AS (SELECT DISTINCT pb AS x FROM base),
      """ + graft.operators.NaiveBayes.sqlLg64Chain(
        "dpb", "x", Seq("x"), "lb", "lgb") + """
      SELECT base.segment, base.priority, CAST(base.n AS BIGINT) AS n,
        CAST(la.lga - lb.lgb AS BIGINT) AS pmi_x64,
        CAST(base.n * (la.lga - lb.lgb) AS BIGINT) AS contrib
      FROM base JOIN la ON base.pa = la.x JOIN lb ON base.pb = lb.x
      ORDER BY base.segment, base.priority"""),
    notes = "contingency + margins + lg64 PMI, all integer; margins " +
      "from the cell table, never a second fact scan")

  /** POWER-LAW TAIL (Hill estimator) of the co-purchase degree
    * distribution: α = k / Σᵢ ln(dᵢ/d_min) over the top-k degrees with
    * d_min the (k+1)-th — "is this graph scale-free, and how heavy is
    * the hub tail" (drives the salting / hub-cap decisions the engine's
    * skew tooling acts on). The log sum rides lg64 fixed point, so the
    * only IEEE ops are one constant multiply (ln 2, same literal both
    * engines) and one divide: α = (k·64) / (ln2 · Σ(lg64 dᵢ −
    * lg64 d_min)). Window + sum over the BOUNDED degree table. Output:
    * (k, d_min, s_lg64, alpha). */
  val qPowerlaw = GQuery("q_powerlaw",
    (s, d) => {
      import graft.operators.NaiveBayes.lg64
      val k = 100
      val e = coPurchaseEdges(s, d).distinct()
      val deg = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(desc("deg"), col("node"))
      val ranked = deg.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k + 1)
        .withColumn("lg", lg64(col("deg")))
        .localCheckpoint(true) // the k+1 cut and the top-k sum reuse it
      val dmin = ranked.filter(col("rk") === k + 1)
        .select(col("deg").as("d_min"), col("lg").as("lg_min"))
      // groupBy d_min (not a global agg) so an empty k+1 cut — a graph
      // with <= k distinct-ranked nodes — yields ZERO rows, exactly as
      // the twin's GROUP BY mn.d_min does, instead of one null row
      ranked.filter(col("rk") <= k)
        .crossJoin(broadcast(dmin))
        .groupBy(col("d_min"))
        .agg(sum(col("lg") - col("lg_min")).as("s_lg64"))
        .select(lit(k.toLong).as("k"), col("d_min"), col("s_lg64"),
          (lit(k * 64.0) / (lit(0.6931471805599453) *
            col("s_lg64").cast("double"))).as("alpha"))
    },
    Some("""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
      e AS (SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
      deg AS (SELECT node, COUNT(*) AS deg FROM
        (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
      ranked AS (SELECT node, deg,
          ROW_NUMBER() OVER (ORDER BY deg DESC, node) AS rk
        FROM deg QUALIFY rk <= 101),
      dd AS (SELECT DISTINCT deg FROM ranked),
      """ + graft.operators.NaiveBayes.sqlLg64Chain(
        "dd", "deg", Seq("deg"), "lgt", "lg") + """,
      rl AS (SELECT ranked.rk, ranked.deg, lgt.lg
        FROM ranked JOIN lgt USING (deg)),
      mn AS (SELECT deg AS d_min, lg AS lg_min FROM rl WHERE rk = 101)
      SELECT CAST(100 AS BIGINT) AS k, CAST(mn.d_min AS BIGINT) AS d_min,
        CAST(SUM(rl.lg - mn.lg_min) AS BIGINT) AS s_lg64,
        CAST(100 * 64.0 AS DOUBLE)
          / (0.6931471805599453 * CAST(SUM(rl.lg - mn.lg_min) AS DOUBLE))
          AS alpha
      FROM rl, mn WHERE rl.rk <= 100
      GROUP BY mn.d_min"""),
    notes = "Hill tail estimator in lg64; bounded degree-table window, " +
      "mirrored constant-ln2 IEEE finish")

  /** DEGREE ASSORTATIVITY ([[graft.operators.Graph.assortativity]]) of
    * the co-purchase graph — one exact-integer Pearson over edge-end
    * degrees (DECIMAL(38,0) sums, HUGEINT twin), one mirrored IEEE
    * divide. Negative r = hub-and-spoke catalog; positive = assortative
    * clusters. */
  val qAssortativity = GQuery("q_assortativity",
    (s, d) => graft.operators.Graph.assortativity(
      coPurchaseEdges(s, d), "src", "dst"),
    Some("""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
      e AS (SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
      deg AS (SELECT node, COUNT(*) AS d FROM
        (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
      j AS (SELECT CAST(du.d AS HUGEINT) AS du,
          CAST(dv.d AS HUGEINT) AS dv
        FROM e JOIN deg du ON e.u = du.node
          JOIN deg dv ON e.v = dv.node),
      st AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m,
          SUM(du + dv) AS s1, SUM(du * du + dv * dv) AS s2,
          SUM(du * dv) AS sxy_half
        FROM j)
      SELECT CAST(2 * m AS BIGINT) AS n_points,
        CAST(m AS BIGINT) AS m_edges,
        CASE WHEN (2 * m * s2 - s1 * s1) = 0 THEN 0.0
          ELSE CAST(2 * m * (2 * sxy_half) - s1 * s1 AS DOUBLE)
            / CAST(2 * m * s2 - s1 * s1 AS DOUBLE) END AS r
      FROM st"""),
    notes = "edge-end degree Pearson; symmetry collapses the sqrt " +
      "terms, one mirrored IEEE divide of exact int128 sums")

  /** MULTI-SOURCE BFS ([[graft.operators.Graph.bfsDistances]]): hop
    * distance from the size-50 parts over the co-purchase graph — the
    * "blast radius" / affinity-expansion primitive (seed a curated set,
    * expand to everything within k association hops). 3 relaxation
    * rounds; monotone min-relaxation ⇒ reported distances are exact. */
  val qBfsDist = GQuery("q_bfs_dist",
    (s, d) => {
      val pairs = coPurchaseEdges(s, d)
      val seeds = Tables.part(s, d).filter(col("p_size") === 50)
        .select(col("p_partkey"))
      graft.operators.Graph.bfsDistances(pairs, "src", "dst",
        seeds, "p_partkey", rounds = 3)
    },
    Some("""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
      e AS (SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
      nbr AS (SELECT u AS node, v AS nbr FROM e
        UNION ALL SELECT v, u FROM e),
      sd AS (SELECT DISTINCT p_partkey AS node FROM part
        WHERE p_size = 50),
      d0 AS (SELECT n.node, 0 AS dist
        FROM (SELECT DISTINCT node FROM nbr) n JOIN sd USING (node)),
      r1 AS (SELECT nbr.nbr AS node, d0.dist + 1 AS dist
        FROM d0 JOIN nbr ON d0.node = nbr.node),
      d1 AS (SELECT node, MIN(dist) AS dist FROM
        (SELECT * FROM d0 UNION ALL SELECT * FROM r1) GROUP BY 1),
      r2 AS (SELECT nbr.nbr AS node, d1.dist + 1 AS dist
        FROM d1 JOIN nbr ON d1.node = nbr.node),
      d2 AS (SELECT node, MIN(dist) AS dist FROM
        (SELECT * FROM d1 UNION ALL SELECT * FROM r2) GROUP BY 1),
      r3 AS (SELECT nbr.nbr AS node, d2.dist + 1 AS dist
        FROM d2 JOIN nbr ON d2.node = nbr.node),
      d3 AS (SELECT node, MIN(dist) AS dist FROM
        (SELECT * FROM d2 UNION ALL SELECT * FROM r3) GROUP BY 1)
      SELECT node, CAST(dist AS BIGINT) AS dist FROM d3
      ORDER BY node"""),
    notes = "synchronous frontier min-relaxation, 3 rounds; " +
      "node-keyed joins, checkpoint-truncated")

  /** WEIGHTED SSSP ([[graft.operators.Graph.weightedSssp]]): cheapest
    * association cost from the size-50 parts over the weighted
    * co-purchase graph — edge cost `1000 div support` (strong ties are
    * short), 3 Bellman–Ford rounds. The affinity-expansion primitive
    * with STRENGTH-aware distance: a frequent co-purchase chain beats a
    * one-off hop, so the result ranking differs structurally from
    * [[qBfsDist]]'s hop counts. Exact ≤3-edge cheapest cost (monotone
    * min-relaxation; the twin replays the same truncation). */
  val qSssp = GQuery("q_sssp",
    (s, d) => {
      val weighted = coPurchaseEdges(s, d, distinctItems = false)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
        .select(col("src"), col("dst"),
          expr("1000 div cnt").as("w"))
      val seeds = Tables.part(s, d).filter(col("p_size") === 50)
        .select(col("p_partkey"))
      graft.operators.Graph.weightedSssp(weighted, "src", "dst", "w",
        seeds, "p_partkey", rounds = 3)
    },
    Some("""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
      e AS (SELECT a.p AS u, b.p AS v, 1000 // COUNT(*) AS w
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p),
      nbr AS (SELECT u AS node, v AS nbr, w FROM e
        UNION ALL SELECT v, u, w FROM e),
      sd AS (SELECT DISTINCT p_partkey AS node FROM part
        WHERE p_size = 50),
      d0 AS (SELECT n.node, 0 AS dist
        FROM (SELECT DISTINCT node FROM nbr) n JOIN sd USING (node)),
      r1 AS (SELECT nbr.nbr AS node, d0.dist + nbr.w AS dist
        FROM d0 JOIN nbr ON d0.node = nbr.node),
      d1 AS (SELECT node, MIN(dist) AS dist FROM
        (SELECT * FROM d0 UNION ALL SELECT * FROM r1) GROUP BY 1),
      r2 AS (SELECT nbr.nbr AS node, d1.dist + nbr.w AS dist
        FROM d1 JOIN nbr ON d1.node = nbr.node),
      d2 AS (SELECT node, MIN(dist) AS dist FROM
        (SELECT * FROM d1 UNION ALL SELECT * FROM r2) GROUP BY 1),
      r3 AS (SELECT nbr.nbr AS node, d2.dist + nbr.w AS dist
        FROM d2 JOIN nbr ON d2.node = nbr.node),
      d3 AS (SELECT node, MIN(dist) AS dist FROM
        (SELECT * FROM d2 UNION ALL SELECT * FROM r3) GROUP BY 1)
      SELECT node, CAST(dist AS BIGINT) AS dist FROM d3
      ORDER BY node"""),
    notes = "Bellman-Ford prefix-exact rounds; per-pair min-collapsed " +
      "integer weights, pre-partitioned adjacency, node-sized round " +
      "shuffles")

  /** DETERMINISTIC RANDOM WALKS ([[graft.operators.Graph.randomWalks]]):
    * one 3-step walk per size-50 seed part over the co-purchase graph —
    * the DeepWalk corpus generator with md5-DERIVED next hops, so the
    * walk corpus is reproducible bit-exact in both engines (the twin
    * replays every hop from the same md5 argmin). Frontier-only round
    * shuffles; standard may-revisit semantics. */
  val qRandomWalk = GQuery("q_random_walk",
    (s, d) => {
      val pairs = coPurchaseEdges(s, d)
      val seeds = Tables.part(s, d).filter(col("p_size") === 50)
        .select(col("p_partkey"))
      graft.operators.Graph.randomWalks(pairs, "src", "dst",
        seeds, "p_partkey", steps = 3)
    },
    Some("""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
      e AS (SELECT DISTINCT a.p AS u, b.p AS v
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
      nbr AS (SELECT u AS node, v AS nbr FROM e
        UNION ALL SELECT v, u FROM e),
      sd AS (SELECT DISTINCT p_partkey AS node FROM part
        WHERE p_size = 50),
      w0 AS (SELECT n.node AS walk_id, n.node
        FROM (SELECT DISTINCT node FROM nbr) n JOIN sd USING (node)),
      w1 AS (SELECT walk_id, nbr.nbr AS node
        FROM w0 JOIN nbr ON w0.node = nbr.node
        QUALIFY ROW_NUMBER() OVER (PARTITION BY walk_id
          ORDER BY md5(concat(CAST(walk_id AS VARCHAR), '_1_',
            CAST(nbr.nbr AS VARCHAR))), nbr.nbr) = 1),
      w2 AS (SELECT walk_id, nbr.nbr AS node
        FROM w1 JOIN nbr ON w1.node = nbr.node
        QUALIFY ROW_NUMBER() OVER (PARTITION BY walk_id
          ORDER BY md5(concat(CAST(walk_id AS VARCHAR), '_2_',
            CAST(nbr.nbr AS VARCHAR))), nbr.nbr) = 1),
      w3 AS (SELECT walk_id, nbr.nbr AS node
        FROM w2 JOIN nbr ON w2.node = nbr.node
        QUALIFY ROW_NUMBER() OVER (PARTITION BY walk_id
          ORDER BY md5(concat(CAST(walk_id AS VARCHAR), '_3_',
            CAST(nbr.nbr AS VARCHAR))), nbr.nbr) = 1)
      SELECT walk_id, CAST(step AS BIGINT) AS step, node FROM (
        SELECT walk_id, 0 AS step, node FROM w0
        UNION ALL SELECT walk_id, 1, node FROM w1
        UNION ALL SELECT walk_id, 2, node FROM w2
        UNION ALL SELECT walk_id, 3, node FROM w3)
      ORDER BY walk_id, step"""),
    notes = "derived-randomness walks (md5 argmin next hop); " +
      "reproducible corpus, frontier-sized round shuffles")

  /** NEWMAN MODULARITY ([[graft.operators.Graph.modularity]]) of the
    * 3-round LPA communities on the weighted co-purchase graph — the
    * graph-clustering quality gate, per community in exact per-mille
    * (the [[qLabelProp]] trajectory replayed, then scored; twin chains
    * the same rounds and the same sign-safe floor division). */
  val qModularity = GQuery("q_modularity",
    (s, d) => {
      val pairs = coPurchaseEdges(s, d, distinctItems = false)
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
        .localCheckpoint(true) // LPA rounds and the scoring both scan it
      val labels = graft.operators.Graph.labelPropagationAssign(
        pairs, "src", "dst", "w", iters = 3, assumeCanonical = true)
      graft.operators.Graph.modularity(pairs, "src", "dst", "w", labels,
        assumeCanonical = true)
    },
    Some("""WITH li AS (SELECT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
      e AS (
        SELECT a.p AS u, b.p AS v, COUNT(*) AS w
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2),
      nbr AS (SELECT u AS node, v AS nbr, w FROM e
        UNION ALL SELECT v, u, w FROM e),
      l0 AS (SELECT DISTINCT node, node AS label FROM nbr),
      s1 AS (SELECT nbr.node, l.label, SUM(nbr.w) AS s
        FROM nbr JOIN l0 l ON nbr.nbr = l.node GROUP BY 1, 2),
      l1 AS (SELECT node, label FROM s1
        QUALIFY ROW_NUMBER() OVER (PARTITION BY node
          ORDER BY s DESC, label) = 1),
      s2 AS (SELECT nbr.node, l.label, SUM(nbr.w) AS s
        FROM nbr JOIN l1 l ON nbr.nbr = l.node GROUP BY 1, 2),
      l2 AS (SELECT node, label FROM s2
        QUALIFY ROW_NUMBER() OVER (PARTITION BY node
          ORDER BY s DESC, label) = 1),
      s3 AS (SELECT nbr.node, l.label, SUM(nbr.w) AS s
        FROM nbr JOIN l2 l ON nbr.nbr = l.node GROUP BY 1, 2),
      l3 AS (SELECT node, label FROM s3
        QUALIFY ROW_NUMBER() OVER (PARTITION BY node
          ORDER BY s DESC, label) = 1),
      mt AS (SELECT SUM(w) AS m FROM e),
      lbl AS (SELECT e.w, lu.label AS lu, lv.label AS lv
        FROM e JOIN l3 lu ON e.u = lu.node JOIN l3 lv ON e.v = lv.node),
      intra AS (SELECT lu AS community, SUM(w) AS intra_w FROM lbl
        WHERE lu = lv GROUP BY 1),
      deg AS (SELECT node, SUM(w) AS d FROM
        (SELECT u AS node, w FROM e UNION ALL SELECT v, w FROM e)
        GROUP BY 1),
      dc AS (SELECT l3.label AS community, SUM(deg.d) AS d_c,
          COUNT(*) AS n_nodes
        FROM deg JOIN l3 ON deg.node = l3.node GROUP BY 1),
      fin AS (SELECT dc.community, dc.n_nodes,
          COALESCE(intra.intra_w, 0) AS intra_w, dc.d_c,
          (4 * mt.m * COALESCE(intra.intra_w, 0)
            - dc.d_c * dc.d_c) * 1000 AS num,
          4 * mt.m * mt.m AS den
        FROM dc LEFT JOIN intra USING (community), mt)
      SELECT community, CAST(n_nodes AS BIGINT) AS n_nodes,
        CAST(intra_w AS BIGINT) AS intra_w, CAST(d_c AS BIGINT) AS d_c,
        CAST((num - ((num % den) + den) % den) // den AS BIGINT)
          AS contrib_x1000
      FROM fin ORDER BY community"""),
    notes = "per-community Newman modularity in per-mille; sign-safe " +
      "floor division both engines")

  /** EXACT JOIN-SIZE PROFILE ([[graft.operators.Sharding
    * .joinSizeProfile]]): predicted lineitem⋈events-on-key cardinality
    * `Σ cntA·cntB` with worst-key contribution — the pre-flight check
    * before a big shuffle join, computed on the two COUNT tables only
    * (strictly cheaper than the join it predicts). Keyed on
    * lineitem.l_orderkey vs events.user_id so both sides carry
    * multiplicity in the overlapping key range. */
  val qJoinSize = GQuery("q_join_size",
    (s, d) => graft.operators.Sharding.joinSizeProfile(
      Tables.lineitem(s, d), "l_orderkey",
      Tables.events(s, d), "user_id"),
    Some("""WITH ca AS (
        SELECT l_orderkey AS key, COUNT(*) AS ca FROM lineitem
        GROUP BY 1),
      cb AS (SELECT user_id AS key, COUNT(*) AS cb FROM events
        GROUP BY 1),
      j AS (SELECT ca.key, ca.ca * cb.cb AS contrib
        FROM ca JOIN cb USING (key)),
      ag AS (SELECT SUM(contrib) AS est_rows,
          COUNT(*) AS matched_keys, MAX(contrib) AS max_contrib
        FROM j),
      mk AS (SELECT MIN(key) AS max_key FROM j, ag
        WHERE j.contrib = ag.max_contrib)
      SELECT CAST(ag.est_rows AS BIGINT) AS est_rows,
        CAST(ag.matched_keys AS BIGINT) AS matched_keys,
        CAST(ag.max_contrib AS BIGINT) AS max_contrib,
        mk.max_key,
        CAST((ag.max_contrib * 1000) // ag.est_rows AS BIGINT)
          AS max_share_x1000
      FROM ag, mk"""),
    notes = "join-size pre-flight from count tables; exact integers, " +
      "one groupBy per side")

  /** SNAPSHOT DIFF ([[graft.operators.Joins.snapshotDiff]]): keyed
    * added/removed/changed/unchanged audit between the events table
    * and a deterministically perturbed "next export" (every 97th id
    * dropped, every 101st value bumped, every 103rd re-added under a
    * shifted id) — one full-outer key join + a 4-row status agg.
    * Null-safe column compares; no row-hash stringification. */
  val qSnapshotDiff = GQuery("q_snapshot_diff",
    (s, d) => {
      val a = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val b = a.filter(col("event_id") % 97 =!= 0)
        .withColumn("value", when(col("event_id") % 101 === 0,
          col("value") + 1.0).otherwise(col("value")))
        .unionByName(a.filter(col("event_id") % 103 === 0)
          .withColumn("event_id", col("event_id") + 10000000L))
      graft.operators.Joins.snapshotDiff(a, b, "event_id",
        Seq("user_id", "event_type", "value"))
    },
    Some("""WITH a AS (
        SELECT event_id, user_id, event_type, value FROM events),
      b AS (
        SELECT event_id, user_id, event_type,
          CASE WHEN event_id % 101 = 0 THEN value + 1.0 ELSE value END
            AS value
        FROM a WHERE event_id % 97 <> 0
        UNION ALL
        SELECT event_id + 10000000, user_id, event_type, value
        FROM a WHERE event_id % 103 = 0),
      j AS (
        SELECT COALESCE(a.event_id, b.event_id) AS key,
          CASE
            WHEN b.event_id IS NULL THEN 'removed'
            WHEN a.event_id IS NULL THEN 'added'
            WHEN (a.user_id IS DISTINCT FROM b.user_id)
              OR (a.event_type IS DISTINCT FROM b.event_type)
              OR (a.value IS DISTINCT FROM b.value) THEN 'changed'
            ELSE 'unchanged' END AS status
        FROM a FULL OUTER JOIN b ON a.event_id = b.event_id)
      SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
        MIN(key) AS min_key, MAX(key) AS max_key
      FROM j GROUP BY status ORDER BY status"""),
    notes = "dataset-versioning audit; one key join (bucketed-table " +
      "co-location at scale) + 4-row status agg")

  /** TRENDING USERS ([[graft.operators.Reports.trending]]): top-10 by
    * exponentially decayed activity (half-life 2 days, power-of-two
    * weights `2²⁰ >> (age div 2)`, anchored 2024-02-01) — the
    * recency-weighted leaderboard, fully integer. */
  val qTrending = GQuery("q_trending",
    (s, d) => graft.operators.Reports.trending(
      Tables.events(s, d), "user_id", "ts",
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
      halfLifeDays = 2, k = 10),
    Some("""WITH w AS (
        SELECT user_id AS key,
          1048576 >> LEAST(datediff('day', CAST(ts AS DATE),
            DATE '2024-02-01') // 2, 62) AS w
        FROM events
        WHERE datediff('day', CAST(ts AS DATE), DATE '2024-02-01') >= 0),
      sc AS (SELECT key, SUM(w) AS score, COUNT(*) AS n_events
        FROM w GROUP BY key),
      top AS (SELECT key, score, n_events FROM sc
        ORDER BY score DESC, key LIMIT 10)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, key) AS BIGINT)
          AS rank,
        key, CAST(score AS BIGINT) AS score,
        CAST(n_events AS BIGINT) AS n_events
      FROM top ORDER BY rank"""),
    notes = "dyadic recency decay; map-side weights, one key agg, " +
      "distributed top-k")

  /** WELCH t A/B TEST ([[graft.operators.Reports.abTest]]): per-type
    * mean-difference significance across the 2024-01-16 split — the
    * parametric drift member. Exact decimal moments, one pinned IEEE
    * assembly sequence, one scan. */
  val qAbTest = GQuery("q_ab_test",
    (s, d) => graft.operators.Reports.abTest(
      Tables.events(s, d), "event_type", "ts", "value",
      java.sql.Timestamp.valueOf("2024-01-16 00:00:00")),
    Some("""WITH m AS (
        SELECT event_type,
          SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            AS n_before,
          SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            AS n_after,
          CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
            THEN CAST(value AS DECIMAL(27,6)) END) AS DOUBLE) AS sb,
          CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
            THEN CAST(value AS DECIMAL(27,6)) END) AS DOUBLE) AS sa,
          CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
            THEN CAST(value AS DECIMAL(13,2)) * CAST(value AS DECIMAL(13,2))
            END) AS DOUBLE) AS qb,
          CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
            THEN CAST(value AS DECIMAL(13,2)) * CAST(value AS DECIMAL(13,2))
            END) AS DOUBLE) AS qa
        FROM events GROUP BY event_type),
      t AS (
        SELECT event_type, n_before, n_after,
          sb / CAST(n_before AS DOUBLE) AS mean_before,
          sa / CAST(n_after AS DOUBLE) AS mean_after,
          (CAST(n_before AS DOUBLE) * qb - sb * sb)
            / (CAST(n_before AS DOUBLE) * CAST(n_before - 1 AS DOUBLE))
            AS vb,
          (CAST(n_after AS DOUBLE) * qa - sa * sa)
            / (CAST(n_after AS DOUBLE) * CAST(n_after - 1 AS DOUBLE))
            AS va
        FROM m)
      SELECT event_type, CAST(n_before AS BIGINT) AS n_before,
        CAST(n_after AS BIGINT) AS n_after, mean_before, mean_after,
        (mean_before - mean_after)
          / sqrt(vb / CAST(n_before AS DOUBLE)
            + va / CAST(n_after AS DOUBLE)) AS t_stat
      FROM t ORDER BY event_type"""),
    notes = "parametric drift member; exact moments, pinned IEEE " +
      "assembly, one conditional-agg scan")

  /** WEEK-OVER-WEEK ([[graft.operators.Reports.weekOverWeek]]):
    * calendar-correct same-weekday deltas of the per-type daily value
    * totals — a day−7 self-join, never a row-offset lag. */
  val qWowDelta = GQuery("q_wow_delta",
    (s, d) => graft.operators.Reports.weekOverWeek(
      Tables.events(s, d), "event_type", "ts", "value"),
    Some("""WITH daily AS (
        SELECT event_type AS g, CAST(ts AS DATE) AS day,
          CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2)
      SELECT a.g AS event_type, strftime(a.day, '%Y-%m-%d') AS day,
        a.total, b.total AS prev_total,
        (a.total - b.total) * 100.0 / b.total AS delta_pct
      FROM daily a JOIN daily b
        ON a.g = b.g AND b.day = a.day - 7
      ORDER BY event_type, day"""),
    notes = "period-over-period; daily pre-agg then small-table " +
      "day-7 self-join")

  /** TWO-PROPORTION z-TEST ([[graft.operators.Reports.propTest]]):
    * P(value > 500) before vs after 2024-01-16 per type — the
    * rate-metric drift member; pooled z from exact counts in one
    * pinned IEEE sequence, one scan. */
  val qPropTest = GQuery("q_prop_test",
    (s, d) => graft.operators.Reports.propTest(
      Tables.events(s, d), "event_type", "ts", "value",
      threshold = 500.0,
      java.sql.Timestamp.valueOf("2024-01-16 00:00:00")),
    Some("""WITH m AS (
        SELECT event_type,
          SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            AS n_before,
          SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            AS n_after,
          SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' AND value > 500.0
            THEN 1 ELSE 0 END) AS k_before,
          SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' AND value > 500.0
            THEN 1 ELSE 0 END) AS k_after
        FROM events GROUP BY event_type),
      t AS (
        SELECT event_type, n_before, n_after, k_before, k_after,
          CAST(k_before AS DOUBLE) / CAST(n_before AS DOUBLE) AS pb,
          CAST(k_after AS DOUBLE) / CAST(n_after AS DOUBLE) AS pa,
          CAST(k_before + k_after AS DOUBLE)
            / CAST(n_before + n_after AS DOUBLE) AS pp
        FROM m)
      SELECT event_type, CAST(n_before AS BIGINT) AS n_before,
        CAST(n_after AS BIGINT) AS n_after,
        CAST(k_before AS BIGINT) AS k_before,
        CAST(k_after AS BIGINT) AS k_after,
        CASE WHEN pp = 0.0 OR pp = 1.0 THEN 0.0
          ELSE (pb - pa) / sqrt(pp * (1.0 - pp)
            * (1.0 / CAST(n_before AS DOUBLE)
              + 1.0 / CAST(n_after AS DOUBLE))) END AS z_stat
      FROM t WHERE n_before > 0 AND n_after > 0
      ORDER BY event_type"""),
    notes = "pooled two-proportion z; exact counts, one " +
      "conditional-agg scan")

  val all: Seq[GQuery] = Seq(qJobDerivation, qJobLifecycle, qJobMerge,
    qNestedRoundtrip, qPivotWide, qTwoArrayFlatten, qOddsFlatten,
    qApproxDistinct, qHeavyHitters, qTeamEvents, qWeeklyDaily,
    qHealthStatus, qApiUsage, qDashboard, qProfile, qValidate, qManifest,
    qTransitionMatrix, qAnomalyZscore, qDrift, qRollingActive,
    qSeqMining, qEwma, qPagerank, qTriangles, qLinreg, qShardRoute,
    qZorder, qZonemapPrune, qBucketedJoin, qBitmapDistinct, qBitmapRolling,
    qBitmapIntersect, qRandProj,
    qKsDrift, qPsiDrift, qHolt, qSkewProfile, qLabelProp, qJoinSize,
    qSnapshotDiff, qTrending, qAbTest, qWowDelta, qPropTest,
    qKcore, qAdamicAdar, qBenford, qBfsDist, qSssp, qRandomWalk,
    qMutualInfo, qJackknife,
    qPprSeeds,
    qModularity, qAssortativity, qPowerlaw, qChi2, qSpearman)
}
