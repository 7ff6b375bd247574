package graft.queries

import graft.{Det, Tables}
import graft.operators.Joins
import org.apache.spark.sql.functions._

/** Relational breadth: aggregations (SURVEY.md §2.4 A1-A9), predicates
  * (§2.2 P1-P9), joins (§2.3), sorts/limits/set ops (§2.6).
  *
  * Each query re-binds a reference operator shape to the driver testdata
  * (SURVEY.md §7 substrate decision); the Scaladoc on each names the shape.
  */
object Relational {

  /** A3/A4 — the TPC-H Q1 shape: multi-key groupBy with derived measures
    * (reference: phase/bookmaker distributions, workflows yml:745-763). */
  val q1Agg = GQuery("q1_agg",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${Det.sqlDsum("l_quantity")} AS sum_qty,
      ${Det.sqlDsum("l_extendedprice")} AS sum_base_price,
      ${Det.sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      ${Det.sqlDavg("l_quantity")} AS avg_qty,
      COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  /** A-ext — EXACT continuous percentiles per group. The percentile
    * positions (0.25/0.5/0.75) are exact binary fractions and l_quantity is
    * integer-valued, so every interpolation step (pos = p·(n−1), lower +
    * frac·(higher−lower)) is exact IEEE arithmetic → bit-identical
    * cross-engine. At 100 TB the same query runs as approx_percentile
    * (t-digest, one pass, mergeable) — that path is approximate by nature;
    * this is its exact oracle-able twin for the sizes where sort-based
    * percentile is affordable. */
  val qPercentiles = GQuery("q_percentiles",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
        quantile_cont(l_quantity, 0.25) AS p25,
        quantile_cont(l_quantity, 0.5) AS p50,
        quantile_cont(l_quantity, 0.75) AS p75,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** A-ext — ROLLUP grouping sets (the reference's report hierarchy —
    * per-league plus all-leagues totals in one pass, weekly_report.json
    * shape) as ONE aggregation: Spark expands the grouping sets map-side,
    * still one shuffle. grouping_id() disambiguates subtotal levels and
    * makes the sort keys non-null (NULLS FIRST/LAST trap). */
  val qRollup = GQuery("q_rollup",
    (s, d) => Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        Det.dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(col("gid"),
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"), col("n"))
      .orderBy(col("gid"), col("flag"), col("status")),
    Some(s"""SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        COALESCE(l_returnflag, 'ALL') AS flag,
        COALESCE(l_linestatus, 'ALL') AS status,
        ${Det.sqlDsum("l_quantity")} AS sum_qty,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY gid, flag, status"""))

  /** A-ext — CUBE grouping sets (all 2^k subtotal combinations in ONE
    * aggregation — the cross-dimensional report matrix the reference builds
    * by re-querying per dimension). Same single-shuffle expansion as ROLLUP
    * but 4 grouping sets; grouping_id() keeps the sort keys non-null. */
  val qCube = GQuery("q_cube",
    (s, d) => Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"),
        Det.dsum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .select(col("gid"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("sum_price"), col("n"))
      .orderBy(col("gid"), col("status"), col("priority")),
    Some(s"""SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        ${Det.sqlDsum("o_totalprice")} AS sum_price,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY gid, status, priority"""))

  /** A-ext — ARBITRARY grouping sets (the combinations a report actually
    * wants, skipping the ones it doesn't — here (status), (priority), and
    * grand total, but NOT (status, priority)): same one-shuffle Expand as
    * ROLLUP/CUBE. The DataFrame API only exposes rollup/cube, so this goes
    * through `spark.sql` GROUPING SETS over a temp view — SQL is a
    * first-class way in, not a fallback. */
  val qGroupingSets = GQuery("q_grouping_sets",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(s"""SELECT CAST(grouping_id() AS BIGINT) AS gid,
          COALESCE(o_orderstatus, 'ALL') AS status,
          COALESCE(o_orderpriority, 'ALL') AS priority,
          ${Det.sqlDsum("o_totalprice")} AS sum_price,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, status, priority""")
    },
    Some(s"""SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        COALESCE(o_orderstatus, 'ALL') AS status,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        ${Det.sqlDsum("o_totalprice")} AS sum_price,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY gid, status, priority"""))

  /** J-ext — CDC MERGE ([[graft.operators.Joins.applyChanges]]): apply an
    * update/delete/insert change set to the orders table in one full-outer
    * join. The change set is synthesized deterministically (every key ≡0
    * mod 10 updated +100, ≡3 deleted, ≡7 re-inserted under key+10^8) and
    * the twin recomputes the merge with the same three-way UNION. */
  /** J-ext SCD2 ([[graft.operators.Joins.scd2History]]): value-change
    * validity intervals per (user, event_type) — the full-history
    * companion of q_upsert's latest-wins merge. One shuffle; open
    * intervals carry the 9999-12-31 sentinel so every output cell is
    * non-null and hash-comparable. */
  val qScd2 = GQuery("q_scd2",
    (s, d) => Joins.scd2History(Tables.events(s, d),
        Seq("user_id", "event_type"), "ts", "event_id", "value")
      .orderBy(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("value")),
    Some(s"""WITH lagd AS (
        SELECT user_id, event_type, ts, event_id, value,
          LAG(value) OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS pv,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS rn
        FROM events),
      ch AS (SELECT * FROM lagd
        WHERE rn = 1 OR value IS DISTINCT FROM pv),
      iv AS (
        SELECT user_id, event_type, value, ts,
          LEAD(ts) OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS vt
        FROM ch)
      SELECT user_id, event_type, value,
        ${Det.sqlFmtTs("ts")} AS valid_from,
        COALESCE(${Det.sqlFmtTs("vt")}, '9999-12-31 00:00:00.000000')
          AS valid_to,
        (vt IS NULL) AS is_current
      FROM iv
      ORDER BY user_id, event_type, valid_from, valid_to, value"""),
    notes = "SCD2 validity intervals; change-collapse + interval close in one shuffle")

  /** J-ext INTERVAL OVERLAP JOIN ([[graft.operators.Joins.overlapJoin]]):
    * per-user activity spans (consecutive same-type events) self-joined
    * across event types where the spans intersect — the concurrent-
    * validity / bitemporal shape. One key shuffle; overlap math in exact
    * epoch-µs int64. The second scan gives the self-join fresh attribute
    * ids (no ambiguous-reference resolution). */
  val qOverlapJoin = GQuery("q_overlap_join",
    (s, d) => {
      def spans(df: org.apache.spark.sql.DataFrame) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        df.select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("s_us"), col("ts"), col("event_id"))
          .withColumn("e_us", lead(col("s_us"), 1).over(w))
          .filter(col("e_us").isNotNull && col("s_us") < col("e_us"))
      }
      val a = spans(Tables.events(s, d))
        .select(col("user_id"), col("event_type").as("type_a"),
          col("s_us").as("sa"), col("e_us").as("ea"))
      val b = spans(Tables.events(s, d))
        .select(col("user_id"), col("event_type").as("type_b"),
          col("s_us").as("sb"), col("e_us").as("eb"))
      graft.operators.Joins.overlapJoin(a, b, Seq("user_id"),
          "sa", "ea", "sb", "eb")
        .filter(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_overlaps"),
          sum(least(col("ea"), col("eb"))
            - greatest(col("sa"), col("sb"))).as("overlap_us"))
        .orderBy(col("type_a"), col("type_b"))
    },
    Some("""WITH sp AS (
        SELECT user_id, event_type, epoch_us(ts) AS s_us,
          LEAD(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS e_us
        FROM events),
      iv AS (SELECT * FROM sp WHERE e_us IS NOT NULL AND s_us < e_us),
      p AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
          least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS ov
        FROM iv a JOIN iv b ON a.user_id = b.user_id
          AND a.event_type < b.event_type
          AND a.s_us < b.e_us AND b.s_us < a.e_us)
      SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_overlaps,
        CAST(SUM(ov) AS BIGINT) AS overlap_us
      FROM p GROUP BY 1, 2 ORDER BY type_a, type_b"""),
    notes = "keyed interval×interval overlap; epoch-µs exact intersection mass")

  val qUpsert = GQuery("q_upsert",
    (s, d) => {
      val base = Tables.orders(s, d)
      val updates = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 100.0)
        .withColumn("is_delete", lit(false))
      val deletes = base.filter(col("o_orderkey") % 10 === 3)
        .withColumn("is_delete", lit(true))
      val inserts = base.filter(col("o_orderkey") % 10 === 7)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
        .withColumn("is_delete", lit(false))
      val changes = updates.unionByName(deletes).unionByName(inserts)
      graft.operators.Joins.applyChanges(base, changes, "o_orderkey",
          "is_delete")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), Det.fmtTs(col("o_orderdate")).as("odate"),
          col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""WITH merged AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          o_totalprice + 100.0 AS o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT * FROM orders
        WHERE o_orderkey % 10 <> 0 AND o_orderkey % 10 <> 3
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
          o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 10 = 7)
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        ${Det.sqlFmtTs("o_orderdate")} AS odate, o_orderpriority
      FROM merged ORDER BY o_orderkey"""))

  /** A1 — global scalar aggregates (streamlit_dashboard.py:128-144 table
    * stats: COUNT(*), MAX(collected_at)). */
  val qGlobalAgg = GQuery("q_global_agg",
    (s, d) => Tables.events(s, d).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("user_id")).as("n_users"),
      Det.fmtTs(min(col("ts"))).as("min_ts"),
      Det.fmtTs(max(col("ts"))).as("max_ts")),
    Some(s"""SELECT COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS n_users,
      ${Det.sqlFmtTs("MIN(ts)")} AS min_ts, ${Det.sqlFmtTs("MAX(ts)")} AS max_ts
      FROM events"""))

  /** A2 — conditional aggregation in one pass (mapping stats,
    * enhanced_mapping.py:267-274: SUM(CASE WHEN success...)). */
  val qCondAgg = GQuery("q_cond_agg",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("n_purchase"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
        (sum(when(col("event_type") === "purchase", col("value"))
          .cast("decimal(27,6)")).cast("double") /
          sum(when(col("event_type") === "purchase", 1).otherwise(0))
            .cast("double")).as("avg_purchase_value"))
      .orderBy(col("user_id")),
    Some(s"""SELECT user_id, COUNT(*) AS n_events,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END AS DECIMAL(27,6))) AS DOUBLE)
        / CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE) AS avg_purchase_value
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** A4 — multi-key groupBy with a date-truncated key (daily tumbling
    * window shape, streamlit_dashboard.py:154-162). */
  val qMultikeyAgg = GQuery("q_multikey_agg",
    (s, d) => Tables.events(s, d)
      .groupBy(Det.fmtDate(to_date(col("ts"))).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("total_value"))
      .orderBy(col("day"), col("event_type")),
    Some(s"""SELECT ${Det.sqlFmtDate("CAST(ts AS DATE)")} AS day, event_type,
      COUNT(*) AS n, ${Det.sqlDsum("value")} AS total_value
      FROM events GROUP BY 1, 2 ORDER BY day, event_type"""))

  /** A5 — COUNT(DISTINCT) alongside plain counts
    * (streamlit_dashboard.py:49,132). */
  val qCountDistinct = GQuery("q_count_distinct",
    (s, d) => Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
      COUNT(*) AS n_events FROM events GROUP BY event_type ORDER BY event_type"""))

  /** A6 — derived metric post-agg with div-by-zero guard
    * (win_percentage, database_integration.py:253 uses max(played,1)). */
  val qDerivedMetric = GQuery("q_derived_metric",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("n_purchase"))
      .withColumn("purchase_rate",
        col("n_purchase").cast("double") /
          greatest(col("n_events"), lit(1)).cast("double"))
      .orderBy(col("user_id")),
    Some("""SELECT user_id, COUNT(*) AS n_events,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(GREATEST(COUNT(*), 1) AS DOUBLE) AS purchase_rate
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** A7 — before/after slice means (event-impact windows,
    * streamlit_dashboard.py:599-614). */
  val qBeforeAfter = GQuery("q_before_after",
    (s, d) => Tables.events(s, d)
      .groupBy(col("event_type"),
        when(col("ts") < lit("2024-01-15").cast("timestamp"), "before")
          .otherwise("after").as("phase"))
      .agg(Det.davg(col("value")).as("avg_value"), count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("phase")),
    Some(s"""SELECT event_type,
      CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 'before' ELSE 'after' END AS phase,
      ${Det.sqlDavg("value")} AS avg_value, COUNT(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY event_type, phase"""))

  /** A9 — weighted sum against a literal map (API-call weights,
    * workflows yml:962-968) via typedLit + element_at. */
  val qWeightedSum = GQuery("q_weighted_sum",
    (s, d) => {
      val weights = typedLit(Map(
        "view" -> 1, "click" -> 2, "signup" -> 5, "purchase" -> 10,
        "error" -> 0))
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(sum(coalesce(element_at(weights, col("event_type")), lit(0)))
          .as("weighted_calls"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, CAST(SUM(CASE event_type
        WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'signup' THEN 5
        WHEN 'purchase' THEN 10 ELSE 0 END) AS BIGINT) AS weighted_calls
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** P2/P3 — time-range + equality/null predicates, projection (the
    * dashboard's upcoming-fixtures filter, streamlit_dashboard.py:208-210). */
  val qTimeRange = GQuery("q_time_range",
    (s, d) => Tables.events(s, d)
      .filter(col("ts").between(
        lit("2024-01-10").cast("timestamp"),
        lit("2024-01-12").cast("timestamp"))
        && col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("event_id"), Det.fmtTs(col("ts")).as("ts_s"),
        col("user_id"), col("value"))
      .orderBy(col("event_id")),
    Some(s"""SELECT event_id, ${Det.sqlFmtTs("ts")} AS ts_s, user_id, value
      FROM events
      WHERE ts BETWEEN TIMESTAMP '2024-01-10' AND TIMESTAMP '2024-01-12'
        AND event_type = 'purchase' AND value IS NOT NULL
      ORDER BY event_id"""))

  /** P4 — pattern predicates (team search `LIKE '%x%'`,
    * discord_integration.py:147-151). */
  val qPattern = GQuery("q_pattern_filter",
    (s, d) => Tables.customer(s, d)
      .filter(col("c_name").like("%19%") || col("c_name").contains("001"))
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE c_name LIKE '%19%' OR contains(c_name, '001')
      ORDER BY c_custkey"""))

  /** P6 — CASE expression buckets (home/away derivation,
    * streamlit_dashboard.py:501). */
  val qCaseExpr = GQuery("q_case_expr",
    (s, d) => Tables.orders(s, d)
      .withColumn("bucket",
        when(col("o_totalprice") > 300000, "large")
          .when(col("o_totalprice") > 100000, "medium")
          .otherwise("small"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("total"))
      .orderBy(col("bucket")),
    Some(s"""SELECT CASE WHEN o_totalprice > 300000 THEN 'large'
        WHEN o_totalprice > 100000 THEN 'medium' ELSE 'small' END AS bucket,
      COUNT(*) AS n, ${Det.sqlDsum("o_totalprice")} AS total
      FROM orders GROUP BY 1 ORDER BY bucket"""))

  /** P5 — EXISTS → left-semi join (fixtures-that-have-odds,
    * streamlit_dashboard.py:302). */
  val qSemiJoin = GQuery("q_semi_join",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers_with_orders"))
      .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment, COUNT(*) AS n_customers_with_orders
      FROM customer c WHERE EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** J8 — anti-join (job dedup shape, workflows yml:248-249).
    *
    * Every sf0.01 customer has orders, which made this gate vacuous — so
    * the query PLANTS order-less customers (offset ids outside the orders
    * key domain, mirrored in the DuckDB twin) that the anti-join must keep. */
  val qAntiJoin = GQuery("q_anti_join",
    (s, d) => {
      val base = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      val planted = base.filter(col("c_custkey") % 10 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          concat(lit("ghost_"), col("c_name")).as("c_name"))
      base.unionByName(planted)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH cust AS (
        SELECT c_custkey, c_name FROM customer
        UNION ALL
        SELECT c_custkey + 1000000, 'ghost_' || c_name
        FROM customer WHERE c_custkey % 10 = 0)
      SELECT c_custkey, c_name FROM cust c WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey"""))

  /** J1 — the canonical dim-enrichment join chain (fixtures ⋈ teams×2 ⋈
    * leagues, repeated ≥8× in the reference): orders ⋈ customer ⋈ nation ⋈
    * region with every dim broadcast — zero shuffle for the dims, one
    * partial-agg shuffle for the rollup. */
  val qJoinEnrich = GQuery("q_join_enrich",
    (s, d) => Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("r_name"), col("n_name")),
    Some(s"""SELECT r_name, n_name, COUNT(*) AS n_orders,
      ${Det.sqlDsum("o_totalprice")} AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  /** J2 — left outer join keeping empty groups (league list with 0-game
    * leagues, streamlit_dashboard.py:47-54). */
  val qLeftJoin = GQuery("q_left_join",
    (s, d) => Tables.nation(s, d)
      .join(Tables.customer(s, d),
        col("n_nationkey") === col("c_nationkey"), "left_outer")
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"))
      .orderBy(col("n_nationkey")),
    Some("""SELECT n_nationkey, n_name, COUNT(c_custkey) AS n_customers
      FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
      GROUP BY n_nationkey, n_name ORDER BY n_nationkey"""))

  /** J4 — OR-disjunct join rewritten as union-of-equi-joins (hash joins
    * survive; raw OR would plan a BNLJ — SURVEY.md §2.3). Pairs suppliers
    * with customers in the same or the "next" nation. */
  val qDisjunctJoin = GQuery("q_disjunct_join",
    (s, d) => {
      val sup = Tables.supplier(s, d)
      val cust = Tables.customer(s, d)
      Joins.disjunctJoin(sup, cust,
        (l, r) => l("s_nationkey") === r("c_nationkey"),
        (l, r) => l("s_nationkey") === r("c_nationkey") + 1,
        Seq("s_suppkey"), Seq("c_custkey"))
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("s_nationkey"))
    },
    Some("""SELECT s_nationkey, COUNT(*) AS n_pairs
      FROM supplier JOIN customer
        ON s_nationkey = c_nationkey OR s_nationkey = c_nationkey + 1
      GROUP BY s_nationkey ORDER BY s_nationkey"""))

  /** J5 — range join with an equi-key (odds within event-impact window,
    * streamlit_dashboard.py:584-594): events within 7 days after the
    * user's order date.
    *
    * The raw tables' time ranges are disjoint (events 2024, orders 1990s),
    * which made this gate vacuous — so the query PLANTS events inside the
    * order windows (one synthetic event a day after every 50th order,
    * mirrored in the DuckDB twin) that the range join must pick up. */
  val qRangeJoin = GQuery("q_range_join",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"), col("value"))
      // separate load for the planted branch: distinct attribute ids keep the
      // probe-side lineage disjoint from the anchor in the self-referential join
      val planted = Tables.orders(s, d).filter(col("o_orderkey") % 50 === 0)
        .select(col("o_custkey").as("user_id"),
          (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("ts"),
          (col("o_orderkey") % 100).cast("double").as("value"))
      val o = Tables.orders(s, d)
      Joins.rangeJoin(ev.unionByName(planted), o,
        col("user_id") === col("o_custkey"),
        col("ts"), col("o_orderdate"),
        col("o_orderdate") + expr("INTERVAL 7 DAYS"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_events"),
          Det.dsum(col("value")).as("sum_value"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""WITH ev AS (
        SELECT user_id, ts, value FROM events
        UNION ALL
        SELECT o_custkey, o_orderdate + INTERVAL 1 DAY,
          CAST(o_orderkey % 100 AS DOUBLE)
        FROM orders WHERE o_orderkey % 50 = 0)
      SELECT o_orderkey, COUNT(*) AS n_events,
      ${Det.sqlDsum("value")} AS sum_value
      FROM ev JOIN orders ON user_id = o_custkey
        AND ts BETWEEN o_orderdate AND o_orderdate + INTERVAL 7 DAY
      GROUP BY o_orderkey ORDER BY o_orderkey"""))

  /** O2 — top-k (TakeOrderedAndProject, not a full sort): top 20 users by
    * spend (top-leagues/teams reports, workflows yml:732-741). */
  val qTopK = GQuery("q_topk",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(Det.dsum(col("value")).as("total_value"))
      .orderBy(desc("total_value"), col("user_id"))
      .limit(20),
    Some(s"""SELECT user_id, ${Det.sqlDsum("value")} AS total_value
      FROM events GROUP BY user_id
      ORDER BY total_value DESC, user_id LIMIT 20"""))

  /** O6 — union of compatible slices (job-list merge shape). */
  val qUnion = GQuery("q_union",
    (s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), lit("c").as("src"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), lit("e").as("src"))
      clicks.unionByName(errors)
        .groupBy(col("src")).agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("src"))
    },
    Some("""SELECT src, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      FROM (
        SELECT event_id, user_id, 'c' AS src FROM events WHERE event_type='click'
        UNION ALL
        SELECT event_id, user_id, 'e' AS src FROM events WHERE event_type='error')
      GROUP BY src ORDER BY src"""))

  /** O7 — distinct pairs. */
  val qDistinct = GQuery("q_distinct",
    (s, d) => Tables.events(s, d)
      .select(col("user_id"), col("event_type")).distinct()
      .orderBy(col("user_id"), col("event_type")),
    Some("""SELECT DISTINCT user_id, event_type FROM events
      ORDER BY user_id, event_type"""))

  /** Set ops the reference lacks but the engine exposes (SURVEY.md §2.6):
    * INTERSECT/EXCEPT of user sets. */
  val qSetOps = GQuery("q_set_ops",
    (s, d) => {
      val ev = Tables.events(s, d)
      val buyers = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"))
      val erroring = ev.filter(col("event_type") === "error")
        .select(col("user_id"))
      buyers.intersect(erroring)
        .withColumn("set_kind", lit("both"))
        .unionByName(buyers.except(erroring)
          .withColumn("set_kind", lit("buy_only")))
        .orderBy(col("set_kind"), col("user_id"))
    },
    Some("""SELECT user_id, set_kind FROM (
        SELECT user_id, 'both' AS set_kind FROM
          (SELECT user_id FROM events WHERE event_type='purchase'
           INTERSECT
           SELECT user_id FROM events WHERE event_type='error')
        UNION ALL
        SELECT user_id, 'buy_only' AS set_kind FROM
          (SELECT user_id FROM events WHERE event_type='purchase'
           EXCEPT
           SELECT user_id FROM events WHERE event_type='error'))
      ORDER BY set_kind, user_id"""))

  /** F-j1 — JSON field extraction from a string column (alternatives
    * round-trip, enhanced_mapping.py:628,713). */
  val qJsonExtract = GQuery("q_json_extract",
    (s, d) => Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k") >= 50)
      .orderBy(col("event_id")),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
      ORDER BY event_id"""))

  /** F-d1/F-d3 — timestamp arithmetic: hours-until (julianday shape,
    * streamlit_dashboard.py:203) + season derivation (SURVEY.md F-d5). */
  val qDateArith = GQuery("q_date_arith",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"),
        ((unix_timestamp(col("o_orderdate")) -
          unix_timestamp(lit("1997-01-01").cast("timestamp"))) / 3600.0)
          .as("hours_since_97"),
        graft.functions.Normalize.seasonOf(col("o_orderdate")).cast("long")
          .as("season"))
      .filter(col("season") >= 1998)
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
      CAST(date_diff('second', TIMESTAMP '1997-01-01', o_orderdate) AS DOUBLE)
        / 3600.0 AS hours_since_97,
      CASE WHEN month(o_orderdate) >= 8 THEN year(o_orderdate)
        ELSE year(o_orderdate) - 1 END AS season
      FROM orders
      WHERE (CASE WHEN month(o_orderdate) >= 8 THEN year(o_orderdate)
        ELSE year(o_orderdate) - 1 END) >= 1998
      ORDER BY o_orderkey"""))

  /** ST8 — retention filter (delete odds >180d, workflows yml:661-680):
    * keep events within 15 days of a fixed "now". */
  val qRetention = GQuery("q_retention",
    (s, d) => Tables.events(s, d)
      .filter(col("ts") >=
        lit("2024-01-31").cast("timestamp") - expr("INTERVAL 15 DAYS"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type, COUNT(*) AS n_kept FROM events
      WHERE ts >= TIMESTAMP '2024-01-31' - INTERVAL 15 DAY
      GROUP BY event_type ORDER BY event_type"""))

  /** A-ext — MODE per group with a deterministic tie-break: the most
    * frequent order priority per month, ties broken lexicographically.
    * Spark's `mode()` agg is tie-nondeterministic — a count + row_number
    * formulation makes the answer total: one groupBy shuffle (map-side
    * combined) then a window over the tiny (month, priority) count table.
    * At 100 TB the second shuffle moves #groups rows, not #rows. */
  val qModePriority = GQuery("q_mode_priority",
    (s, d) => {
      val counts = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).as("month"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("month"))
        .orderBy(col("n").desc, col("o_orderpriority"))
      counts.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(Det.fmtDate(col("month")).as("month"),
          col("o_orderpriority").as("mode_priority"), col("n").as("n_orders"))
        .orderBy(col("month"))
    },
    Some("""WITH c AS (
        SELECT date_trunc('month', o_orderdate) AS month, o_orderpriority,
          COUNT(*) AS n
        FROM orders GROUP BY 1, 2),
      r AS (
        SELECT month, o_orderpriority, n, ROW_NUMBER() OVER (
            PARTITION BY month ORDER BY n DESC, o_orderpriority) AS rk
        FROM c)
      SELECT strftime(month, '%Y-%m-%d') AS month,
        o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n_orders
      FROM r WHERE rk = 1 ORDER BY month"""),
    notes = "deterministic mode; count shuffle then window over #groups rows")

  /** A-ext — WINSORIZED MEAN: per-group robust mean with tails clipped at
    * explicit rank-based p10/p90 cut points. The cuts are the element at
    * row ceil(p·n) of the (value, orderkey, linenumber) total order — a
    * discrete percentile both engines compute identically (quantile_disc
    * definitions differ across engines; an explicit rank does not). Clipped
    * values stay integers so the decimal mean is exact. Plan: one key
    * exchange for rank+count (two window fns, one sort), a #groups-row cut
    * table BROADCAST back, one final map-side-combined agg. At 100 TB the
    * cuts swap to approx_percentile; this is the exact oracle-able form. */
  val qWinsorize = GQuery("q_winsorize",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"))
      val ranked = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"),
          col("l_linenumber"))
        .withColumn("r", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
      val cuts = ranked.groupBy(col("l_returnflag"))
        .agg(
          max(when(col("r") === ceil(lit(0.1) * col("n")).cast("long"),
            col("l_quantity"))).as("p_lo"),
          max(when(col("r") === ceil(lit(0.9) * col("n")).cast("long"),
            col("l_quantity"))).as("p_hi"))
      Tables.lineitem(s, d)
        .join(broadcast(cuts), Seq("l_returnflag"))
        .withColumn("clipped",
          least(greatest(col("l_quantity"), col("p_lo")), col("p_hi")))
        .groupBy(col("l_returnflag"))
        .agg(
          max(col("p_lo")).cast("long").as("p_lo"),
          max(col("p_hi")).cast("long").as("p_hi"),
          Det.davg(col("clipped")).as("win_mean"),
          sum(when(col("l_quantity") < col("p_lo"), 1L)
            .when(col("l_quantity") > col("p_hi"), 1L)
            .otherwise(0L)).as("n_clipped"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""WITH rk AS (
        SELECT l_returnflag, l_quantity,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag
            ORDER BY l_quantity, l_orderkey, l_linenumber) AS r,
          COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem),
      cuts AS (
        SELECT l_returnflag,
          MAX(CASE WHEN r = CAST(ceil(0.1 * n) AS BIGINT)
            THEN l_quantity END) AS p_lo,
          MAX(CASE WHEN r = CAST(ceil(0.9 * n) AS BIGINT)
            THEN l_quantity END) AS p_hi
        FROM rk GROUP BY l_returnflag)
      SELECT li.l_returnflag,
        CAST(c.p_lo AS BIGINT) AS p_lo, CAST(c.p_hi AS BIGINT) AS p_hi,
        (CAST(SUM(CAST(LEAST(GREATEST(li.l_quantity, c.p_lo), c.p_hi)
            AS DECIMAL(27,6))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE)) AS win_mean,
        CAST(SUM(CASE WHEN li.l_quantity < c.p_lo THEN 1
          WHEN li.l_quantity > c.p_hi THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clipped
      FROM lineitem li JOIN cuts c USING (l_returnflag)
      GROUP BY li.l_returnflag, c.p_lo, c.p_hi
      ORDER BY li.l_returnflag"""),
    notes = "rank-based p10/p90 clip; cuts broadcast back, exact decimal mean")

  /** J-ext — SALTED SKEW JOIN ([[Joins.saltedJoin]]) oracle-gated: the
    * fact side salted into 8 sub-keys, the build side replicated ×8, so a
    * single hot key spreads over 8 reducers — semantically IDENTICAL to
    * the plain equi-join, which is exactly what the DuckDB twin runs.
    * AQE splits skewed partitions; salting is the in-plan fix for one
    * pathological KEY, and this gate pins that it never changes results. */
  val qSaltedJoin = GQuery("q_salted_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("k"), col("l_extendedprice"))
      val os = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_orderstatus"))
      Joins.saltedJoin(li, os, "k", saltFactor = 8)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    },
    Some(s"""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_items,
        ${Det.sqlDsum("l_extendedprice")} AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    notes = "salt x8 spreads hot keys; oracle is the plain join - equivalence gate")

  /** J-ext — PLANTED-SKEW salted join (round-10 verdict ask #6): the fact
    * side's key is REMAPPED so every even l_partkey collapses onto key 7 —
    * a single pathological hot key carrying ~50% of all rows (>= the 30%
    * "hot key" bar), far beyond anything AQE's partition splitting can fix
    * alone (one KEY cannot be split by partition — only salting spreads
    * it). [[Joins.saltedJoin]] x16 spreads the hot key over 16 reducers;
    * the oracle is the PLAIN equi-join on the same remapped key, so the
    * gate pins semantic equivalence under deliberate pathology. The plan
    * pin (PlanRegressionSpec) asserts the join really runs on (k, __salt).
    * Scale: at 100 TB the hot key is the difference between one straggler
    * reducer holding 50% of the fact table and 16 even shards. */
  val qSkewPlanted = GQuery("q_skew_planted",
    (s, d) => {
      val hot = Tables.lineitem(s, d)
        .select(when(col("l_partkey") % 2 === 0, lit(7L))
          .otherwise(col("l_partkey")).as("k"),
          col("l_extendedprice"), col("l_quantity"))
      val dim = Tables.part(s, d)
        .select(col("p_partkey").as("k"), col("p_brand"))
      Joins.saltedJoin(hot, dim, "k", saltFactor = 16)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("p_brand"))
    },
    Some(s"""WITH f AS (
        SELECT CASE WHEN l_partkey % 2 = 0 THEN 7 ELSE l_partkey END AS k,
          l_extendedprice, l_quantity
        FROM lineitem)
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        ${Det.sqlDsum("l_extendedprice")} AS sum_price
      FROM f JOIN part ON k = p_partkey
      GROUP BY p_brand ORDER BY p_brand"""),
    notes = "planted ~50%-hot key; salted x16 == plain join equivalence gate")

  /** TWO-PHASE DISTINCT ([[graft.operators.Aggregates.twoPhaseDistinct]]):
    * the skew-safe COUNT(DISTINCT) shape — composite-key dedup spreads a
    * hot group across the value dimension; oracle is the plain
    * COUNT(DISTINCT): equivalence IS the contract. */
  val qTwophaseDistinct = GQuery("q_twophase_distinct",
    (s, d) => graft.operators.Aggregates.twoPhaseDistinct(
      Tables.events(s, d), "event_type", "user_id"),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
      FROM events GROUP BY event_type ORDER BY event_type"""),
    notes = "explicit composite-key dedup then count; skew-safe distinct shape")

  /** PARTIAL-AGGREGATE MAINTENANCE ([[graft.operators.Aggregates
    * .dailyPartials]] → [[graft.operators.Aggregates.weeklyFromDaily]]):
    * weekly rollup computed FROM the daily partial table — decimal sums
    * are associative, so the merge path is bit-identical to aggregating
    * raw, which the oracle (direct weekly over raw events) pins. */
  val qReaggregate = GQuery("q_reaggregate",
    (s, d) => graft.operators.Aggregates.weeklyFromDaily(
      graft.operators.Aggregates.dailyPartials(
        Tables.events(s, d), "event_type", "ts", "value"), "event_type"),
    Some("""SELECT event_type,
        strftime(date_trunc('week', CAST(ts AS DATE)), '%Y-%m-%d') AS week,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_val
      FROM events GROUP BY 1, 2 ORDER BY event_type, week"""),
    notes = "incremental rollup: weekly from daily partials == weekly from raw, exactly")

  /** QUANTILE NORMALIZATION ([[graft.operators.Aggregates
    * .quantileNormalize]]): map each group's values onto the LARGEST
    * group's distribution via exact integer rank cuts — no engine
    * interpolation anywhere (the winsorize convention). */
  val qQuantileNorm = GQuery("q_quantile_norm",
    (s, d) => graft.operators.Aggregates.quantileNormalize(
      Tables.events(s, d), "event_type", "event_id", "value"),
    Some("""WITH ranked AS (
        SELECT event_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY value, event_id) AS r,
          COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events),
      ref AS (SELECT event_type AS refg FROM (
          SELECT event_type,
            ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type) AS rk
          FROM events GROUP BY event_type) WHERE rk = 1),
      refranked AS (
        SELECT rr.r, rr.n, rr.value FROM ranked rr
        JOIN ref ON rr.event_type = ref.refg),
      targets AS (
        SELECT k.bucket,
          greatest(1, (k.bucket * m.nref + 99) // 100) AS target
        FROM (SELECT unnest(range(0, 101)) AS bucket) k
        CROSS JOIN (SELECT DISTINCT n AS nref FROM refranked) m),
      grid AS (
        SELECT t.bucket, rr.value AS norm_val
        FROM targets t JOIN refranked rr ON rr.r = t.target),
      pos AS (
        SELECT event_id, event_type, value,
          CAST(2 * r - 1 AS DOUBLE) / CAST(2 * n AS DOUBLE) AS p,
          ((2 * r - 1) * 100) // (2 * n) AS bucket
        FROM ranked)
      SELECT pos.event_id, pos.event_type, pos.value, pos.p, grid.norm_val
      FROM pos JOIN grid USING (bucket)
      ORDER BY pos.event_id"""),
    notes = "normalize to the largest group's distribution; integer rank cuts only")

  /** CO-OCCURRENCE MINING ([[graft.operators.Aggregates.coOccurrence]]):
    * top-25 part pairs by order co-occurrence — baskets collapse to
    * sorted arrays, pairs generated map-side (never an item self-join),
    * distributed top-k. */
  val qCopurchase = GQuery("q_copurchase",
    (s, d) => graft.operators.Aggregates.coOccurrence(
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", k = 25),
    Some("""WITH baskets AS (
        SELECT l_orderkey, list_slice(list_sort(list(DISTINCT l_partkey)),
          1, 64) AS items
        FROM lineitem GROUP BY l_orderkey),
      items AS (
        SELECT l_orderkey, unnest(items) AS l_partkey FROM baskets),
      pairs AS (
        SELECT a.l_partkey AS a, b.l_partkey AS b
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      cnt AS (SELECT a, b, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
      top AS (SELECT * FROM cnt ORDER BY n DESC, a, b LIMIT 25)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, a, b) AS BIGINT)
          AS rank,
        a, b, CAST(n AS BIGINT) AS n
      FROM top ORDER BY rank"""),
    notes = "market-basket pairs; in-array generation bounds expansion by basket size")

  /** LEAVE-ONE-OUT TARGET ENCODING — the feature-engineering primitive
    * that turns a categorical column into its target mean WITHOUT
    * leaking each row's own label: enc(i) = (S_c − x_i) div (n_c − 1)
    * for row i in category c (exact integer cents; singleton categories
    * fall back to the global LOO mean, the standard smoothing floor).
    * Plan: one map-side-combined category agg (+1-row global), encoded
    * by a BROADCAST join back over the fact scan — zero fact shuffles
    * beyond the output sort. */
  val qTargetEncode = GQuery("q_target_encode",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority").as("cat"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val byCat = o.groupBy(col("cat"))
        .agg(sum(col("cents")).as("sc"), count(lit(1)).as("nc"))
      val glob = o.agg(sum(col("cents")).as("sg"), count(lit(1)).as("ng"))
      o.join(broadcast(byCat), Seq("cat"))
        .crossJoin(broadcast(glob))
        .select(col("o_orderkey"), col("cat"),
          when(col("nc") > 1,
            expr("(sc - cents) div (nc - 1)"))
            .otherwise(expr("(sg - cents) div (ng - 1)"))
            .as("loo_cents"))
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH o AS (
        SELECT o_orderkey, o_orderpriority AS cat,
          CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      by_cat AS (SELECT cat, SUM(cents) AS sc, COUNT(*) AS nc FROM o
        GROUP BY 1),
      gtot AS (SELECT SUM(cents) AS sg, COUNT(*) AS ng FROM o)
      SELECT o.o_orderkey, o.cat,
        CAST(CASE WHEN by_cat.nc > 1
          THEN (by_cat.sc - o.cents) // (by_cat.nc - 1)
          ELSE (gtot.sg - o.cents) // (gtot.ng - 1) END AS BIGINT)
          AS loo_cents
      FROM o JOIN by_cat USING (cat) CROSS JOIN gtot
      ORDER BY o.o_orderkey"""),
    notes = "leakage-safe categorical encoding; category stats " +
      "broadcast back over one fact scan")

  /** SHIPPING-PRIORITY analytics (the TPC-H Q3 shape): segment-filtered
    * customers ⋈ open orders ⋈ late-shipping lineitems, revenue
    * Σ extprice·(1−disc) per order, top-10 — the canonical
    * selective-dim → fact → fact chain. The segment filter prunes
    * customers BEFORE the join (pushed to the scan), the pruned
    * customer side broadcasts, and orders⋈lineitem shuffles on the
    * order key — the plan every OLAP engine must get right. Revenue in
    * exact decimal, surfaced as cents. */
  val qShippingPriority = GQuery("q_shipping_priority",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)")
              - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(floor(sum(col("rev")) * 100).cast("long").as("revenue_cents"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          col("o_orderpriority"), col("revenue_cents"))
        .orderBy(desc("revenue_cents"), col("o_orderkey"))
        .limit(10)
    },
    Some("""SELECT o_orderkey,
        strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
        o_orderpriority,
        CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          * (CAST(1 AS DECIMAL(18,2))
             - CAST(l_discount AS DECIMAL(18,2)))) * 100) AS BIGINT)
          AS revenue_cents
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY 1, 2, 3
      ORDER BY revenue_cents DESC, o_orderkey LIMIT 10"""),
    notes = "TPC-H Q3 shape; pruned-dim broadcast, fact-fact shuffle " +
      "on the order key, exact decimal revenue")

  /** REGIONAL-VOLUME analytics (the TPC-H Q5 shape): the full 6-table
    * snowflake — region → nation → customer → orders → lineitem ⋈
    * supplier — with the customer-nation = supplier-nation co-location
    * predicate. Dims broadcast in a chain; the single big shuffle is
    * orders⋈lineitem; supplier broadcasts onto the result. Per-nation
    * revenue, descending. */
  val qRegionalVolume = GQuery("q_regional_volume",
    (s, d) => {
      val nat = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(s, d)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)")
              - col("l_discount").cast("decimal(18,2)"))).as("rev"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey")
          && col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(floor(sum(col("rev")) * 100).cast("long").as("revenue_cents"))
        .orderBy(desc("revenue_cents"), col("n_name"))
    },
    Some("""SELECT n_name,
        CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          * (CAST(1 AS DECIMAL(18,2))
             - CAST(l_discount AS DECIMAL(18,2)))) * 100) AS BIGINT)
          AS revenue_cents
      FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
          AND s_nationkey = c_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1 ORDER BY revenue_cents DESC, n_name"""),
    notes = "TPC-H Q5 shape; snowflake dim broadcasts, one fact-fact " +
      "shuffle, nation co-location predicate")

  /** ASSOCIATION RULES ([[graft.operators.Aggregates
    * .associationRules]]): directional market-basket rules a→b with
    * exact per-mille confidence and lift over the same capped baskets
    * as [[qCopurchase]] — support ≥ 2, top-50 by lift. The recommender/
    * curation primitive one level above raw pair counts. */
  val qAssocRules = GQuery("q_assoc_rules",
    (s, d) => graft.operators.Aggregates.associationRules(
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", minSup = 2L, k = 50),
    Some("""WITH baskets AS (
        SELECT l_orderkey, list_slice(list_sort(list(DISTINCT l_partkey)),
          1, 64) AS items
        FROM lineitem GROUP BY l_orderkey),
      items AS (
        SELECT l_orderkey, unnest(items) AS item FROM baskets),
      ic AS (SELECT item, COUNT(*) AS ni FROM items GROUP BY 1),
      nb AS (SELECT COUNT(*) AS n_baskets FROM baskets),
      pairs AS (
        SELECT a.item AS a, b.item AS b
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.item < b.item),
      und AS (SELECT a, b, COUNT(*) AS n_ab FROM pairs GROUP BY 1, 2
        HAVING COUNT(*) >= 2),
      rules AS (
        SELECT a AS antecedent, b AS consequent, n_ab FROM und
        UNION ALL SELECT b, a, n_ab FROM und),
      scored AS (
        SELECT r.antecedent, r.consequent, r.n_ab,
          ia.ni AS n_a, ib.ni AS n_b,
          r.n_ab * 1000 // ia.ni AS conf_x1000,
          r.n_ab * nb.n_baskets * 1000 // (ia.ni * ib.ni) AS lift_x1000
        FROM rules r
          JOIN ic ia ON r.antecedent = ia.item
          JOIN ic ib ON r.consequent = ib.item, nb)
      SELECT antecedent, consequent, CAST(n_ab AS BIGINT) AS n_ab,
        CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        CAST(conf_x1000 AS BIGINT) AS conf_x1000,
        CAST(lift_x1000 AS BIGINT) AS lift_x1000
      FROM scored
      ORDER BY lift_x1000 DESC, conf_x1000 DESC, antecedent, consequent
      LIMIT 50"""),
    notes = "directional rules, integer per-mille conf/lift; capped " +
      "baskets, bounded broadcasts, top-k output")

  /** RATIO-TO-REPORT ([[graft.operators.Aggregates.ratioToReport]]):
    * per-priority revenue share of the grand total — the window total
    * runs over the #groups-row aggregate, not the corpus. */
  val qContribution = GQuery("q_contribution",
    (s, d) => graft.operators.Aggregates.ratioToReport(
      Tables.orders(s, d), "o_orderpriority", "o_totalprice"),
    Some("""WITH g AS (
        SELECT o_orderpriority, COUNT(*) AS n,
          SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS dec
        FROM orders GROUP BY 1),
      t AS (SELECT SUM(dec) AS tot FROM g)
      SELECT g.o_orderpriority, CAST(g.n AS BIGINT) AS n,
        CAST(g.dec AS DOUBLE) AS sum_val,
        CAST(g.dec AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
      FROM g, t ORDER BY g.o_orderpriority"""),
    notes = "contribution analysis; grand total windowed over the aggregate only")

  /** MEDIAN ABSOLUTE DEVIATION ([[graft.operators.Reports.groupMad]]):
    * the robust scale estimator — two exact-percentile passes, medians
    * broadcast back. Interpolation arithmetic pinned by q_percentiles. */
  val qMad = GQuery("q_mad",
    (s, d) => graft.operators.Reports.groupMad(
      Tables.lineitem(s, d), "l_returnflag", "l_quantity"),
    Some("""WITH med AS (
        SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
        FROM lineitem GROUP BY 1)
      SELECT l.l_returnflag, MAX(m.med) AS median,
        quantile_cont(abs(l.l_quantity - m.med), 0.5) AS mad,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem l JOIN med m USING (l_returnflag)
      GROUP BY l.l_returnflag ORDER BY l.l_returnflag"""),
    notes = "robust scale: median + MAD, two scans, #groups-row broadcast")

  /** BLOOM-PRUNED SEMI-JOIN ([[Joins.bloomSemiJoin]]): the runtime-filter
    * pattern as an explicit operator — a fixed-width bitmap built from the
    * selective build side prunes the probe BEFORE the semi-join shuffle.
    * Like q_salted_join, the oracle is the PLAIN semi-join: Bloom false
    * positives are removed by the exact join, false negatives are
    * impossible, so the equivalence IS the contract. */
  val qBloomJoin = GQuery("q_bloom_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_returnflag"),
          col("l_extendedprice"))
      val os = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"))
      Joins.bloomSemiJoin(li, os, "l_orderkey", "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
        ${Det.sqlDsum("l_extendedprice")} AS sum_price
      FROM lineitem
      WHERE l_orderkey IN
        (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
    notes = "bloom bitmap broadcast prunes probe pre-shuffle; oracle is the plain semi-join")

  /** 2D Pareto SKYLINE ([[graft.operators.Analytics.skyline2d]]): parts
    * not dominated on (maximize p_size, minimize p_retailprice) — the
    * best-frontier reporting shape (reference's best-odds-per-outcome
    * tables, `reports.py` price frontiers). The engine runs the
    * sort-filter skyline (one bounded groupBy + running-min window +
    * broadcast verdict join — never O(n²)); the oracle is the
    * INDEPENDENT quadratic NOT-EXISTS dominance definition, so the
    * linear rewrite is gated against the textbook semantics. */
  val qSkyline = GQuery("q_skyline",
    (s, d) => graft.operators.Analytics.skyline2d(
        Tables.part(s, d)
          .select(col("p_partkey"), col("p_size"), col("p_retailprice")),
        "p_size", "p_retailprice")
      .orderBy(desc("p_size"), asc("p_retailprice"), asc("p_partkey")),
    Some("""SELECT p_partkey, p_size, p_retailprice FROM part p
      WHERE NOT EXISTS (SELECT 1 FROM part q
        WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
          AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice))
      ORDER BY p_size DESC, p_retailprice, p_partkey"""),
    notes = "linear sort-filter skyline gated against the quadratic " +
      "NOT-EXISTS dominance oracle")

  /** Distributed EXACT quantiles without a global sort
    * ([[graft.operators.Selection.exactKth]]): iterative ≤2¹⁶-bucket
    * histogram refinement — each round one map-side-combined count
    * pass + a bounded collect, narrowing the candidate range 65 536×;
    * a 64-bit domain needs ≤4 rounds. The oracle reads the same
    * elements off a full ORDER BY — the plan this operator exists to
    * avoid at 100 TB. */
  val qExactQuantiles = GQuery("q_exact_quantiles",
    (s, d) => {
      val v = Tables.events(s, d).select(
        (col("value").cast(org.apache.spark.sql.types.DecimalType(27, 6))
          * lit(1000000)).cast("long").as("x"))
      val stats = graft.operators.Selection.exactQuantiles(v, "x",
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
      import s.implicits._
      stats.toDF("stat", "value_micro").orderBy(col("stat"))
    },
    Some("""WITH v AS (
        SELECT CAST(CAST(value AS DECIMAL(27,6)) * 1000000 AS BIGINT) AS x
        FROM events),
      n AS (SELECT COUNT(*) AS n FROM v),
      s AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn FROM v)
      SELECT q.stat, s.x AS value_micro
      FROM (VALUES ('p50', 0.5), ('p90', 0.9), ('p99', 0.99)) q(stat, p)
      JOIN n ON true
      JOIN s ON s.rn = GREATEST(1, CAST(ceil(q.p * n.n) AS BIGINT))
      ORDER BY stat"""),
    notes = "histogram-refinement selection (no global sort) vs the " +
      "oracle's ORDER BY offset read; exact lower-element quantiles")

  /** MERGEABLE QUANTILE SKETCH ([[graft.operators.Aggregates
    * .bottomKQuantiles]]): per event type, p50/p90/p99 ESTIMATES from
    * the 64 md5-smallest rows — the bounded-state shape that replaces
    * [[qExactQuantiles]]'s full pass when the group no longer fits a
    * sort: map-side partials cap state at k rows/group, the shuffle
    * carries ≤ k·groups rows at any corpus size, and the md5 order
    * makes the sample (hence the estimate) bit-reproducible on any
    * cluster layout — the property `percentile_approx` gives up.
    * Values flow as exact micro-longs (the [[qExactQuantiles]]
    * DECIMAL(27,6) conversion, proven cross-engine); the twin replays
    * the same bottom-64 selection with window ranks. */
  val qQuantileSketch = GQuery("q_quantile_sketch",
    (s, d) => {
      val v = Tables.events(s, d).select(col("event_type"), col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(27, 6))
          * lit(1000000)).cast("long").as("x"))
      graft.operators.Aggregates
        .bottomKQuantiles(v, "event_type", "event_id", "x", k = 64)
        .select(col("event_type"), col("n"), col("k_eff"),
          col("p50_est").cast("long").as("p50_est"),
          col("p90_est").cast("long").as("p90_est"),
          col("p99_est").cast("long").as("p99_est"))
    },
    Some("""WITH v AS (
        SELECT event_type,
          md5('qsk:' || CAST(event_id AS VARCHAR)) AS hh,
          CAST(CAST(value AS DECIMAL(27,6)) * 1000000 AS BIGINT) AS x
        FROM events),
      r AS (SELECT event_type, x, hh,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hh) AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM v),
      o AS (SELECT event_type, n, x,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, hh) AS i,
          COUNT(*) OVER (PARTITION BY event_type) AS k_eff
        FROM r WHERE rn <= 64)
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        CAST(MAX(k_eff) AS BIGINT) AS k_eff,
        CAST(MAX(CASE WHEN i = ((k_eff - 1) * 50) // 100 + 1 THEN x END)
          AS BIGINT) AS p50_est,
        CAST(MAX(CASE WHEN i = ((k_eff - 1) * 90) // 100 + 1 THEN x END)
          AS BIGINT) AS p90_est,
        CAST(MAX(CASE WHEN i = ((k_eff - 1) * 99) // 100 + 1 THEN x END)
          AS BIGINT) AS p99_est
      FROM o GROUP BY event_type ORDER BY event_type"""),
    notes = "bottom-k-by-md5 mergeable sample; k rows/group state " +
      "bound, layout-independent estimates read as order statistics")

  /** K-ANONYMITY / L-DIVERSITY AUDIT ([[graft.operators.Privacy
    * .kAnonymityAudit]]) — the release gate after
    * [[graft.functions.Redact.pseudonymize]] drops direct identifiers:
    * every (nation, segment, balance-band) equivalence class must hold
    * ≥5 rows (else the combination re-identifies) AND ≥2 distinct
    * sensitive values (else a k-large class still leaks the attribute
    * — the homogeneity hole). Banding uses floor-before-cast (negative
    * balances land in band −1 identically in both engines); the
    * sensitive proxy is the customer-name last digit. One map-side
    * agg; class count bounded by the generalized domain. */
  val qKAnonymity = GQuery("q_k_anonymity",
    (s, d) => graft.operators.Privacy.kAnonymityAudit(
        Tables.customer(s, d),
        Seq(col("c_nationkey").cast("long"), col("c_mktsegment"),
          floor(col("c_acctbal") / lit(2000.0)).cast("long")),
        substring(col("c_name"), -1, 1), k = 5, l = 2)
      .withColumnRenamed("q0", "nation")
      .withColumnRenamed("q1", "segment")
      .withColumnRenamed("q2", "bal_band"),
    Some("""SELECT CAST(c_nationkey AS BIGINT) AS nation,
        c_mktsegment AS segment,
        CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_band,
        COUNT(*) AS n,
        COUNT(DISTINCT substr(c_name, -1, 1)) AS l_div,
        COUNT(*) >= 5 AS k_anon,
        COUNT(DISTINCT substr(c_name, -1, 1)) >= 2 AS l_diverse
      FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),
    notes = "per-equivalence-class size + sensitive diversity with " +
      "pass flags; generalization (banding) is a caller policy input")

  /** KMV SET-ALGEBRA SKETCH ([[graft.operators.Aggregates
    * .kmvSetCardinality]]): distinct customers of the URGENT vs HIGH
    * order books, their union and intersection, all estimated from
    * two 128-row k-minimum-value samples — the sketch whose set
    * algebra is CLOSED (union sketch = k smallest of the samples'
    * union; intersection by inclusion–exclusion), so cross-segment
    * audience arithmetic needs no second corpus pass. Exact distinct
    * counts ride along, putting the estimator error on the record.
    * The twin replays the same bottom-128-by-md5 selection, 48-bit
    * fold, and integer estimator. */
  val qKmvDistinct = GQuery("q_kmv_distinct",
    (s, d) => graft.operators.Aggregates.kmvSetCardinality(
      Tables.orders(s, d), "o_orderpriority", "o_custkey",
      "1-URGENT", "2-HIGH", k = 128),
    Some {
      def hv(i: Int) =
        s"""(CASE WHEN ascii(substr(hh, $i, 1)) >= 97
           THEN ascii(substr(hh, $i, 1)) - 87
           ELSE ascii(substr(hh, $i, 1)) - 48 END)"""
      val fold = (1 to 12)
        .map(i =>
          s"CAST(${hv(i)} AS BIGINT) * ${BigInt(16).pow(12 - i).toLong}")
        .mkString(" + ")
      val kH = 127L * (1L << 48)
      s"""WITH pairs AS (
        SELECT DISTINCT o_orderpriority AS g, o_custkey AS key
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
      h AS (
        SELECT g, key, md5('kmv:' || CAST(key AS VARCHAR)) AS hh
        FROM pairs),
      hvt AS (SELECT g, key, hh, $fold AS v FROM h),
      r AS (SELECT g, hh, v,
          ROW_NUMBER() OVER (PARTITION BY g ORDER BY hh, key) AS rn,
          COUNT(*) OVER (PARTITION BY g) AS n
        FROM hvt),
      s AS (SELECT g, v, n FROM r WHERE rn <= 128),
      ga AS (SELECT MAX(n) AS n_a, COUNT(*) AS ka, MAX(v) AS vka
        FROM s WHERE g = '1-URGENT'),
      gb AS (SELECT MAX(n) AS n_b, COUNT(*) AS kb, MAX(v) AS vkb
        FROM s WHERE g = '2-HIGH'),
      u AS (SELECT DISTINCT v FROM s),
      ur AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM u),
      gu AS (SELECT COUNT(*) AS ku, MAX(v) AS vku FROM ur
        WHERE rn <= 128),
      nu AS (SELECT COUNT(DISTINCT key) AS n_union FROM pairs),
      e AS (SELECT
          CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
          CAST(n_union AS BIGINT) AS n_union,
          CAST(CASE WHEN ka < 128 THEN ka
            ELSE $kH // CAST(vka AS BIGINT) END AS BIGINT) AS est_a,
          CAST(CASE WHEN kb < 128 THEN kb
            ELSE $kH // CAST(vkb AS BIGINT) END AS BIGINT) AS est_b,
          CAST(CASE WHEN ku < 128 THEN ku
            ELSE $kH // CAST(vku AS BIGINT) END AS BIGINT) AS est_union
        FROM ga, gb, gu, nu)
      SELECT CAST(128 AS BIGINT) AS k, n_a, n_b, n_union,
        est_a, est_b, est_union,
        est_a + est_b - est_union AS est_inter
      FROM e"""
    },
    notes = "k-minimum-values sketch: closed union algebra from two " +
      "bounded samples, exact counts alongside for the error record")

  /** SMALL-QUANTITY REVENUE (the TPC-H Q17 shape): lineitems whose
    * quantity is below HALF the part's average quantity, for one brand
    * family — the canonical CORRELATED-SCALAR-SUBQUERY decorrelation:
    * Spark computes the per-part (Σqty, count) table once and joins it
    * back, and the "qty < 0.5·avg" test is cross-multiplied to the
    * exact integer form `2·qty·cnt < Σqty` (l_quantity is
    * integer-valued), so no division and no doubles. The brand filter
    * is pushed BELOW the stats agg — per-part averages only involve
    * that part's own rows, so pre-filtering is semantics-preserving
    * and prunes ~2/3 of the corpus before any shuffle. */
  val qSmallQtyRev = GQuery("q_small_qty_rev",
    (s, d) => {
      val brandParts = Tables.part(s, d)
        .filter(col("p_brand").like("Brand#1%"))
        .select(col("p_partkey"))
      val li = Tables.lineitem(s, d)
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          col("l_quantity").cast("long").as("qty"),
          col("l_extendedprice").cast("decimal(18,2)").as("price"))
      val pa = li.groupBy(col("l_partkey"))
        .agg(sum(col("qty")).as("sq"), count(lit(1)).as("c"))
      li.join(pa, Seq("l_partkey"))
        .filter(col("qty") * lit(2L) * col("c") < col("sq"))
        .agg(count(lit(1)).as("n_small"),
          floor(sum(col("price")) * 100).cast("long").as("rev_cents"))
    },
    Some("""WITH li AS (
        SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
          CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand LIKE 'Brand#1%'),
      pa AS (SELECT l_partkey, SUM(qty) AS sq, COUNT(*) AS c
        FROM li GROUP BY 1)
      SELECT COUNT(*) AS n_small,
        CAST(floor(SUM(price) * 100) AS BIGINT) AS rev_cents
      FROM li JOIN pa USING (l_partkey)
      WHERE qty * 2 * c < sq"""),
    notes = "TPC-H Q17 shape; correlated scalar decorrelated to a " +
      "stats join-back, cross-multiplied exact integer threshold")

  /** LARGE-ORDER CUSTOMERS (the TPC-H Q18 shape): orders whose total
    * quantity clears a HAVING threshold, joined back to customer — the
    * group-filter → semi-enrich pipeline. The qualifying-order set is
    * tiny after the HAVING (≲0.5% of orders), so it broadcasts onto
    * orders and then onto customer; the only corpus shuffle is the
    * orderkey aggregation. */
  val qBigOrders = GQuery("q_big_orders",
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 300L)
      val ord = Tables.orders(s, d)
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
          floor(col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").as("total_cents"),
          col("sum_qty"))
      Tables.customer(s, d)
        .join(broadcast(ord), col("c_custkey") === col("o_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_date"), col("total_cents"), col("sum_qty"))
        .orderBy(desc("total_cents"), col("o_orderkey"))
        .limit(100)
    },
    Some("""SELECT c_name, c_custkey, o_orderkey,
        strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
        CAST(floor(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
          AS total_cents,
        big.sum_qty
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN (SELECT l_orderkey,
                CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
              FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
          big ON o_orderkey = big.l_orderkey
      ORDER BY total_cents DESC, o_orderkey LIMIT 100"""),
    notes = "TPC-H Q18 shape; HAVING-filtered key set broadcast back " +
      "through orders and customer")

  /** IDLE HIGH-BALANCE CUSTOMERS (the TPC-H Q22 shape): customers whose
    * balance exceeds the positive-balance average (uncorrelated scalar
    * subquery — a 1-row broadcast, exact via cross-multiplied decimal:
    * `bal·cnt > Σbal`) with NO order in the trailing window (anti-join
    * against the recent-customer key set), grouped per nation. */
  val qIdleCustomers = GQuery("q_idle_customers",
    (s, d) => {
      val pos = Tables.customer(s, d)
        .filter(col("c_acctbal") > 0)
        .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("sbal"),
          count(lit(1)).as("cpos"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1998-07-01").cast("timestamp"))
        .select(col("o_custkey")).distinct()
      Tables.customer(s, d)
        .crossJoin(broadcast(pos))
        .filter(col("c_acctbal").cast("decimal(18,2)") * col("cpos")
          > col("sbal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          floor(sum(col("c_acctbal").cast("decimal(18,2)")) * 100)
            .cast("long").as("tot_cents"))
        .orderBy(col("c_nationkey"))
    },
    Some("""WITH pos AS (
        SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS sbal,
          COUNT(*) AS cpos
        FROM customer WHERE c_acctbal > 0),
      recent AS (SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-07-01')
      SELECT c_nationkey, COUNT(*) AS n_cust,
        CAST(floor(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100) AS BIGINT)
          AS tot_cents
      FROM customer CROSS JOIN pos
      WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cpos > sbal
        AND NOT EXISTS (SELECT 1 FROM recent WHERE o_custkey = c_custkey)
      GROUP BY 1 ORDER BY c_nationkey"""),
    notes = "TPC-H Q22 shape; scalar-average broadcast + anti-join, " +
      "cross-multiplied decimal threshold")

  /** SOLE-LATE SUPPLIER (the TPC-H Q21 shape, re-keyed to available
    * columns: late := shipped >60 days after the order date): for
    * finished multi-supplier orders, count per supplier the orders
    * where THAT supplier was the only late one. The reference shape is
    * a double-correlated EXISTS / NOT-EXISTS self-join on lineitem;
    * Spark-first this decorrelates to ONE pass — per-(order, supplier)
    * late flags, then per-order totals as WINDOW functions over the
    * same orderkey partitioning (no self-join, no second shuffle of
    * the fact table), then the filter `late ∧ ns>1 ∧ nl=1`. The DuckDB
    * twin keeps the textbook EXISTS form, so the gate ALSO proves the
    * decorrelation equivalent. */
  val qOnlyLateSupplier = GQuery("q_only_late_supplier",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
      val lo = Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
          .otherwise(0L)).as("late"))
      lo.withColumn("ns", count(lit(1)).over(w))
        .withColumn("nl", sum(col("late")).over(w))
        .filter(col("late") === 1L && col("ns") > 1L && col("nl") === 1L)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(20)
    },
    Some("""WITH lo AS (
        SELECT l_orderkey, l_suppkey,
          MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
            THEN 1 ELSE 0 END) AS late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY 1, 2)
      SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM lo l1 JOIN supplier ON s_suppkey = l1.l_suppkey
      WHERE l1.late = 1
        AND EXISTS (SELECT 1 FROM lo l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lo l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
      GROUP BY 1, 2 ORDER BY numwait DESC, s_name LIMIT 20"""),
    notes = "TPC-H Q21 shape; EXISTS pair decorrelated to window " +
      "counts over one orderkey partitioning — twin keeps the EXISTS " +
      "form as the equivalence witness")

  /** TOP SUPPLIER BY QUARTER REVENUE (the TPC-H Q15 shape): per-supplier
    * revenue over one quarter, keep the supplier(s) hitting the MAX —
    * the view + scalar-max-subquery pattern. The max rides a 1-row
    * broadcast cross join onto the bounded per-supplier revenue table
    * (the q_tfidf_topk shape); ties all surface, keyed order. */
  val qTopSupplier = GQuery("q_top_supplier",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(floor(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)")
              - col("l_discount").cast("decimal(18,2)"))) * 100)
          .cast("long").as("rev_cents"))
      val mx = rev.agg(max(col("rev_cents")).as("mxr"))
      rev.crossJoin(broadcast(mx))
        .filter(col("rev_cents") === col("mxr"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("rev_cents"))
        .orderBy(col("s_suppkey"))
    },
    Some("""WITH rev AS (
        SELECT l_suppkey,
          CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2))
               - CAST(l_discount AS DECIMAL(18,2)))) * 100) AS BIGINT)
            AS rev_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1)
      SELECT s_suppkey, s_name, rev_cents
      FROM rev JOIN supplier ON s_suppkey = l_suppkey
      WHERE rev_cents = (SELECT MAX(rev_cents) FROM rev)
      ORDER BY s_suppkey"""),
    notes = "TPC-H Q15 shape; scalar max as a 1-row broadcast onto the " +
      "bounded per-supplier table")

  /** HIGH-SHARE PARTS (the TPC-H Q11 shape): parts whose revenue exceeds
    * 1.5× the mean per-part revenue — HAVING against a global-total
    * scalar. Cross-multiplied in DECIMAL(38,0)/HUGEINT
    * (`2·v·np > 3·Σv`) so the share test survives any corpus scale
    * without int64 overflow (the ADVICE r7 discipline). */
  val qImportantParts = GQuery("q_important_parts",
    (s, d) => {
      val pr = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(floor(sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
          .cast("long").as("value_cents"))
      val t = pr.agg(sum(col("value_cents")).as("tv"),
        count(lit(1)).as("np"))
      pr.crossJoin(broadcast(t))
        .filter(col("value_cents").cast("decimal(38,0)") * col("np") * 2
          > col("tv").cast("decimal(38,0)") * 3)
        .select(col("l_partkey"), col("value_cents"))
        .orderBy(desc("value_cents"), col("l_partkey"))
    },
    Some("""WITH pr AS (
        SELECT l_partkey,
          CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100)
            AS BIGINT) AS value_cents
        FROM lineitem GROUP BY 1),
      t AS (SELECT SUM(value_cents) AS tv, COUNT(*) AS np FROM pr)
      SELECT l_partkey, value_cents
      FROM pr CROSS JOIN t
      WHERE CAST(value_cents AS HUGEINT) * np * 2
        > CAST(tv AS HUGEINT) * 3
      ORDER BY value_cents DESC, l_partkey"""),
    notes = "TPC-H Q11 shape; global-share HAVING via 1-row broadcast, " +
      "decimal(38,0)/HUGEINT cross-multiplication")

  /** O-ext — UNPIVOT (melt): wide per-group measures → long
    * (group, measure, value) rows via the native `Dataset.unpivot`
    * operator (plans as a 3-way Expand, one pass, no shuffle beyond
    * the feeding agg — the inverse of q_pivot_wide). Twin uses the
    * portable UNION ALL form. All measures pre-cast to one long type
    * (unpivot requires a common value type; cents/counts are exact). */
  val qMelt = GQuery("q_melt",
    (s, d) => {
      val wide = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          floor(sum(col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("long").as("base_cents"),
          count(lit(1)).as("n_rows"))
      wide.unpivot(
        Array(col("l_returnflag"), col("l_linestatus")),
        Array(col("sum_qty"), col("base_cents"), col("n_rows")),
        "measure", "value")
        .orderBy(col("l_returnflag"), col("l_linestatus"), col("measure"))
    },
    Some("""WITH wide AS (
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          CAST(floor(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100)
            AS BIGINT) AS base_cents,
          COUNT(*) AS n_rows
        FROM lineitem GROUP BY 1, 2)
      SELECT l_returnflag, l_linestatus, measure, value FROM (
        SELECT l_returnflag, l_linestatus, 'sum_qty' AS measure,
          sum_qty AS value FROM wide
        UNION ALL
        SELECT l_returnflag, l_linestatus, 'base_cents', base_cents
          FROM wide
        UNION ALL
        SELECT l_returnflag, l_linestatus, 'n_rows', n_rows FROM wide)
      ORDER BY l_returnflag, l_linestatus, measure"""),
    notes = "native unpivot (Expand, single pass); inverse of " +
      "q_pivot_wide; common long value type")

  val all: Seq[GQuery] = Seq(q1Agg, qPercentiles, qRollup, qCube, qGroupingSets,
    qUpsert, qScd2, qOverlapJoin,
    qGlobalAgg, qCondAgg, qMultikeyAgg,
    qCountDistinct, qDerivedMetric, qBeforeAfter, qWeightedSum, qTimeRange,
    qPattern, qCaseExpr, qSemiJoin, qAntiJoin, qJoinEnrich, qLeftJoin,
    qDisjunctJoin, qRangeJoin, qTopK, qUnion, qDistinct, qSetOps,
    qJsonExtract, qDateArith, qRetention,
    qModePriority, qWinsorize, qSaltedJoin, qSkewPlanted, qBloomJoin, qMad,
    qTwophaseDistinct, qReaggregate, qQuantileNorm, qCopurchase, qContribution,
    qSkyline, qExactQuantiles, qQuantileSketch, qKAnonymity,
    qKmvDistinct, qAssocRules, qShippingPriority,
    qRegionalVolume, qTargetEncode,
    qSmallQtyRev, qBigOrders, qIdleCustomers, qOnlyLateSupplier,
    qTopSupplier, qImportantParts, qMelt)
}
