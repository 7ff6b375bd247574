package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TPC-H completion wave (round 8): the classic decision-support shapes
  * not yet covered by Relational.scala's wave — Q2, Q4, Q7, Q8, Q9, Q10,
  * Q12, Q13, Q14, Q16, Q19, Q20 — each re-keyed to the driver testdata's
  * columns (no partsupp / commitdate / shipmode / comment in the star
  * schema, so proxies are chosen per-query and documented).
  *
  * Together with the earlier wave (Q1/Q3/Q5/Q11/Q15/Q17/Q18/Q21/Q22)
  * this closes the full 22-shape TPC-H family: every correlated-subquery
  * decorrelation, disjunct-predicate, left-join-distribution and
  * share-of-total pattern a warehouse engine must execute well.
  *
  * Determinism: all money in exact DECIMAL(18,2) summed then floored to
  * integer cents; ratios surfaced as integer per-mille via truncating
  * div (both sides non-negative → Spark `div` ≡ DuckDB `//`); orders on
  * non-nullable keys only.
  */
object TpchQueries {

  /** Σ extprice·(1−disc) as exact decimal. */
  private def rev: Column =
    col("l_extendedprice").cast("decimal(18,2)") *
      (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)")
        - col("l_discount").cast("decimal(18,2)"))

  private val revSql =
    """CAST(l_extendedprice AS DECIMAL(18,2))
       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"""

  /** MIN-COST SUPPLIER (the TPC-H Q2 shape): for each LARGE small-size
    * part, the EUROPE supplier offering the minimum observed unit price
    * — the correlated MIN-subquery pattern. Without a partsupp table
    * the (part, supplier) cost is the minimum per-row unit price in
    * cents (`cents div qty`, both non-negative integers so truncating
    * div is engine-identical). The correlated `cost = (SELECT MIN ...)`
    * decorrelates to a window MIN over the part key on the bounded
    * (part, supplier) aggregate — no second corpus scan, no join-back
    * shuffle (the aggregate is already partitioned by part). Dims
    * broadcast; ties all surface. */
  val qMinCostSupplier = GQuery("q_min_cost_supplier",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_partkey"))
      val eurSupp = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val parts = Tables.part(s, d)
        .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
        .select(col("p_partkey"), col("p_brand"))
      val cost = Tables.lineitem(s, d)
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"), col("p_brand"), col("l_suppkey"),
          col("s_name"), col("s_acctbal"), col("n_name"),
          expr("cast(floor(cast(l_extendedprice as decimal(18,2)) * 100) " +
            "as bigint) div cast(l_quantity as bigint)").as("unit_cents"))
        .groupBy(col("l_partkey"), col("p_brand"), col("l_suppkey"),
          col("s_name"), col("s_acctbal"), col("n_name"))
        .agg(min(col("unit_cents")).as("cost_cents"))
      cost.withColumn("min_cost", min(col("cost_cents")).over(w))
        .filter(col("cost_cents") === col("min_cost"))
        .select(
          floor(col("s_acctbal").cast("decimal(18,2)") * 100)
            .cast("long").as("bal_cents"),
          col("s_name"), col("n_name"), col("l_partkey"), col("p_brand"),
          col("cost_cents"))
        .orderBy(desc("bal_cents"), col("s_name"), col("l_partkey"))
        .limit(100)
    },
    Some("""WITH eur AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
      cost AS (
        SELECT l_partkey, p_brand, l_suppkey, s_name, s_acctbal, n_name,
          MIN(CAST(floor(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
                AS BIGINT) // CAST(l_quantity AS BIGINT)) AS cost_cents
        FROM lineitem
          JOIN part ON p_partkey = l_partkey
          JOIN eur ON s_suppkey = l_suppkey
        WHERE p_type = 'LARGE' AND p_size <= 10
        GROUP BY 1, 2, 3, 4, 5, 6)
      SELECT CAST(floor(CAST(s_acctbal AS DECIMAL(18,2)) * 100) AS BIGINT)
          AS bal_cents,
        s_name, n_name, l_partkey, p_brand, cost_cents
      FROM cost c1
      WHERE cost_cents = (SELECT MIN(cost_cents) FROM cost c2
        WHERE c2.l_partkey = c1.l_partkey)
      ORDER BY bal_cents DESC, s_name, l_partkey LIMIT 100"""),
    notes = "TPC-H Q2 shape; correlated MIN decorrelated to a window " +
      "over the part-partitioned aggregate — twin keeps the correlated " +
      "subquery as the equivalence witness")

  /** ORDER-PRIORITY CHECK (the TPC-H Q4 shape): per-priority count of
    * one quarter's orders that have at least one late lineitem
    * (shipped >30 days after the order date — the commitdate proxy).
    * The EXISTS is a LEFT SEMI join whose condition spans both tables,
    * so the quarter filter prunes orders before the shuffle and the
    * semi-join deduplicates multi-late orders for free. */
  val qOrderPriorityCheck = GQuery("q_order_priority_check",
    (s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
      ord.join(Tables.lineitem(s, d).select(col("l_orderkey"),
          col("l_shipdate")),
          col("o_orderkey") === col("l_orderkey")
            && col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        AND o_orderdate < TIMESTAMP '1997-10-01'
        AND EXISTS (SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      GROUP BY 1 ORDER BY o_orderpriority"""),
    notes = "TPC-H Q4 shape; EXISTS as a cross-table-predicate " +
      "LEFT SEMI join, quarter filter pushed below the shuffle")

  /** NATION TRADE VOLUME (the TPC-H Q7 shape): shipping revenue between
    * the (NATION_1, NATION_2) pair in both directions, per supplier
    * nation × customer nation × ship year. Two independent broadcast
    * chains (supplier→nation, customer→nation via orders) meet on the
    * lineitem scan; the disjunct pair predicate is a residual filter
    * after both broadcasts, and the only corpus shuffle is
    * lineitem⋈orders. */
  val qNationTrade = GQuery("q_nation_trade",
    (s, d) => {
      val suppN = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name").isin("NATION_1", "NATION_2"))
          .select(col("n_nationkey"),
            col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val custN = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name").isin("NATION_1", "NATION_2"))
          .select(col("n_nationkey").as("cnk"),
            col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cnk"))
        .select(col("c_custkey"), col("cust_nation"))
      val ordC = Tables.orders(s, d)
        .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_shipdate"), rev.as("r"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .join(ordC, col("l_orderkey") === col("o_orderkey"))
        .filter((col("supp_nation") === "NATION_1"
            && col("cust_nation") === "NATION_2")
          || (col("supp_nation") === "NATION_2"
            && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(floor(sum(col("r")) * 100).cast("long").as("rev_cents"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some(s"""SELECT supp_nation, cust_nation, l_year,
        CAST(floor(SUM(r) * 100) AS BIGINT) AS rev_cents
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS BIGINT) AS l_year,
          $revSql AS r
        FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year"""),
    notes = "TPC-H Q7 shape; dual aliased nation broadcasts, residual " +
      "disjunct pair predicate, one fact-fact shuffle")

  /** NATIONAL MARKET SHARE (the TPC-H Q8 shape): within ASIA-customer
    * ECONOMY-part revenue, NATION_5-supplied share per order year, as
    * exact integer per-mille (`promo·1000 div total` on floored cents —
    * both non-negative). The share is a conditional aggregate over one
    * joined scan: no second pass, no self-join. */
  val qMarketShare = GQuery("q_market_share",
    (s, d) => {
      val asiaCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val ordA = Tables.orders(s, d)
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"))
      val suppN5 = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"),
          (col("n_name") === "NATION_5").as("is_n5"))
      val ecoParts = Tables.part(s, d)
        .filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          rev.as("r"))
        .join(broadcast(ecoParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppN5), col("l_suppkey") === col("s_suppkey"))
        .join(ordA, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          floor(sum(when(col("is_n5"), col("r"))
            .otherwise(lit(java.math.BigDecimal.ZERO)
              .cast("decimal(18,2)"))) * 100).cast("long")
            .as("n5_cents"),
          floor(sum(col("r")) * 100).cast("long").as("tot_cents"))
        .select(col("o_year"), col("n5_cents"), col("tot_cents"),
          expr("n5_cents * 1000 div tot_cents").as("share_x1000"))
        .orderBy(col("o_year"))
    },
    Some(s"""WITH j AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
          n1.n_name = 'NATION_5' AS is_n5, $revSql AS r
        FROM lineitem
          JOIN part ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n1 ON n1.n_nationkey = s_nationkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n2 ON n2.n_nationkey = c_nationkey
          JOIN region ON r_regionkey = n2.n_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'),
      g AS (
        SELECT o_year,
          CAST(floor(SUM(CASE WHEN is_n5 THEN r
            ELSE CAST(0 AS DECIMAL(18,2)) END) * 100) AS BIGINT)
            AS n5_cents,
          CAST(floor(SUM(r) * 100) AS BIGINT) AS tot_cents
        FROM j GROUP BY 1)
      SELECT o_year, n5_cents, tot_cents,
        n5_cents * 1000 // tot_cents AS share_x1000
      FROM g ORDER BY o_year"""),
    notes = "TPC-H Q8 shape; share-of-total as one conditional agg, " +
      "exact per-mille on floored cents")

  /** PRODUCT-TYPE PROFIT (the TPC-H Q9 shape): for parts named
    * '%red%', profit per supplier-nation × ship year where profit =
    * revenue − 10% of retail-price × quantity (the supplycost proxy:
    * p_retailprice·qty div 10, exact integer cents). Profit can be
    * negative, so the floor() on the decimal sum (floor in BOTH
    * engines, unlike cast) keeps cents engine-identical. */
  val qProductProfit = GQuery("q_product_profit",
    (s, d) => {
      val redParts = Tables.part(s, d)
        .filter(col("p_name").like("%red%"))
        .select(col("p_partkey"),
          col("p_retailprice").cast("decimal(18,2)").as("retail"))
      val suppN = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      Tables.lineitem(s, d)
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .select(col("n_name"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          (floor(rev * 100).cast("long")
            - expr("cast(floor(retail * cast(l_quantity as bigint) * 100)" +
              " as bigint) div 10")).as("profit_cents"))
        .groupBy(col("n_name"), col("l_year"))
        .agg(sum(col("profit_cents")).as("profit_cents"))
        .orderBy(col("n_name"), desc("l_year"))
    },
    Some(s"""SELECT n_name, l_year,
        CAST(SUM(profit_cents) AS BIGINT) AS profit_cents
      FROM (
        SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS l_year,
          CAST(floor(($revSql) * 100) AS BIGINT)
            - CAST(floor(CAST(p_retailprice AS DECIMAL(18,2))
                * CAST(l_quantity AS BIGINT) * 100) AS BIGINT) // 10
            AS profit_cents
        FROM lineitem
          JOIN part ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%red%')
      GROUP BY 1, 2 ORDER BY n_name, l_year DESC"""),
    notes = "TPC-H Q9 shape; cost proxy from retailprice, exact " +
      "(possibly negative) integer cents per row before the sum")

  /** RETURNED-ITEM CUSTOMERS (the TPC-H Q10 shape): top-20 customers by
    * revenue lost to returned ('R') lineitems of one quarter's orders,
    * with nation enrichment. Quarter + returnflag filters prune both
    * fact scans before the orderkey shuffle; customer/nation broadcast
    * onto the bounded per-customer aggregate. */
  val qReturnedCustomers = GQuery("q_returned_customers",
    (s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val ret = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), rev.as("r"))
      val perCust = ret
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(floor(sum(col("r")) * 100).cast("long").as("rev_cents"))
      perCust
        .join(broadcast(Tables.customer(s, d)
            .join(broadcast(Tables.nation(s, d)
              .select(col("n_nationkey"), col("n_name"))),
              col("c_nationkey") === col("n_nationkey"))
            .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
              col("n_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("rev_cents"),
          floor(col("c_acctbal").cast("decimal(18,2)") * 100)
            .cast("long").as("bal_cents"),
          col("n_name"))
        .orderBy(desc("rev_cents"), col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name,
        CAST(floor(SUM($revSql) * 100) AS BIGINT) AS rev_cents,
        CAST(floor(CAST(c_acctbal AS DECIMAL(18,2)) * 100) AS BIGINT)
          AS bal_cents,
        n_name
      FROM customer
        JOIN nation ON n_nationkey = c_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2, 4, 5
      ORDER BY rev_cents DESC, c_custkey LIMIT 20"""),
    notes = "TPC-H Q10 shape; both fact scans pruned pre-shuffle, dims " +
      "broadcast onto the bounded aggregate")

  /** PRIORITY-BY-LINESTATUS (the TPC-H Q12 shape, l_linestatus as the
    * shipmode proxy): for lineitems shipped in 1997, per linestatus the
    * count of critical-priority (URGENT/HIGH) vs other orders — the
    * join + dual conditional count. The year filter prunes lineitem to
    * ~1/7 before the only shuffle. */
  val qPriorityLinecount = GQuery("q_priority_linecount",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linestatus"))
      li.join(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT"
            || col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
            .as("high_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT"
            && col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
            .as("low_count"))
        .orderBy(col("l_linestatus"))
    },
    Some("""SELECT l_linestatus,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS low_count
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1 ORDER BY l_linestatus"""),
    notes = "TPC-H Q12 shape; dual conditional counts over one joined " +
      "scan, year filter pushed to the lineitem scan")

  /** CUSTOMER ORDER-COUNT DISTRIBUTION (the TPC-H Q13 shape): how many
    * customers placed exactly k non-default-priority orders, INCLUDING
    * the zero bucket — the left-outer + double-aggregation pattern.
    * The priority exclusion lives in the join (not a WHERE), so
    * order-less customers survive to the zero bucket; the second
    * aggregation runs over the bounded per-customer table. */
  val qOrderCountDist = GQuery("q_order_count_dist",
    (s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },
    Some("""SELECT c_count, COUNT(*) AS custdist
      FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
            AND o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY 1)
      GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""),
    notes = "TPC-H Q13 shape; filter inside the left join preserves " +
      "the zero bucket, re-aggregation over the bounded table")

  /** PROMO REVENUE SHARE (the TPC-H Q14 shape): per 1997 month, the
    * per-mille of revenue from PROMO-type parts (`p_type` is literal in
    * this schema — no LIKE needed). Part flags broadcast onto the
    * month-pruned lineitem scan; numerator and denominator are floored
    * cents from the SAME group, so the ratio is exact integer
    * arithmetic. */
  val qPromoShare = GQuery("q_promo_share",
    (s, d) => {
      val pt = Tables.part(s, d)
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("promo"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_shipdate"), rev.as("r"))
        .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .groupBy(month(col("l_shipdate")).cast("long").as("l_month"))
        .agg(
          floor(sum(when(col("promo"), col("r"))
            .otherwise(lit(java.math.BigDecimal.ZERO)
              .cast("decimal(18,2)"))) * 100).cast("long")
            .as("promo_cents"),
          floor(sum(col("r")) * 100).cast("long").as("tot_cents"))
        .select(col("l_month"), col("promo_cents"), col("tot_cents"),
          expr("promo_cents * 1000 div tot_cents").as("promo_x1000"))
        .orderBy(col("l_month"))
    },
    Some(s"""WITH g AS (
        SELECT CAST(month(l_shipdate) AS BIGINT) AS l_month,
          CAST(floor(SUM(CASE WHEN p_type = 'PROMO' THEN $revSql
            ELSE CAST(0 AS DECIMAL(18,2)) END) * 100) AS BIGINT)
            AS promo_cents,
          CAST(floor(SUM($revSql) * 100) AS BIGINT) AS tot_cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1)
      SELECT l_month, promo_cents, tot_cents,
        promo_cents * 1000 // tot_cents AS promo_x1000
      FROM g ORDER BY l_month"""),
    notes = "TPC-H Q14 shape; conditional/total cents from one group, " +
      "exact per-mille share")

  /** SUPPLIER COUNTS BY PART ATTRIBUTES (the TPC-H Q16 shape): distinct
    * suppliers per (brand, type, size) for selected sizes, excluding
    * one brand, one type, and negative-balance suppliers (the
    * customer-complaints NOT-IN proxy as an anti-join). The
    * part-supplier relation is distilled from lineitem (no partsupp
    * table): distinct (partkey, suppkey) — one corpus shuffle — then
    * everything downstream is bounded. */
  val qSupplierPartCounts = GQuery("q_supplier_part_counts",
    (s, d) => {
      val badSupp = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      val parts = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO"
          && col("p_size").isin(1, 5, 9, 13))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
        COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        AND p_size IN (1, 5, 9, 13)
        AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""),
    notes = "TPC-H Q16 shape; partsupp distilled by distinct, NOT-IN " +
      "as broadcast anti-join, count-distinct over the bounded relation")

  /** BRACKET PRICING (the TPC-H Q19 shape): revenue over three
    * OR-of-AND brackets — (brand, size range, quantity range) triples.
    * Spark-first this stays ONE equi-join on the part key with the
    * disjunction as a residual filter (never a nested-loop join); the
    * per-bracket size/qty bounds can't prune the scan individually but
    * their union (size ≤ 15 ∧ qty ≤ 30) is pushed below the join. */
  val qBracketPricing = GQuery("q_bracket_pricing",
    (s, d) => {
      val pt = Tables.part(s, d)
        .filter(col("p_size") <= 15)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"),
          col("l_quantity").cast("long").as("qty"), rev.as("r"))
        .filter(col("qty") <= 30L)
      li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
            && col("qty").between(1L, 11L))
          || (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
            && col("qty").between(10L, 20L))
          || (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
            && col("qty").between(20L, 30L)))
        .agg(count(lit(1)).as("n_items"),
          floor(sum(col("r")) * 100).cast("long").as("rev_cents"))
    },
    Some(s"""SELECT COUNT(*) AS n_items,
        CAST(floor(SUM($revSql) * 100) AS BIGINT) AS rev_cents
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
          AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
          AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
          AND l_quantity BETWEEN 20 AND 30)"""),
    notes = "TPC-H Q19 shape; one equi-join + residual disjunction, " +
      "bracket-union bounds pushed to both scans")

  /** DOMINANT-SHARE SUPPLIERS (the TPC-H Q20 shape): EUROPE suppliers
    * who shipped, for some 'small %' part in 1997, more than half that
    * part's 1997 total quantity — the nested IN-subquery chain
    * (supplier ∈ {suppliers of qualifying (part, qty)}). Decorrelates
    * to: per-(part, supplier) quantity agg, per-part total via a
    * window over the SAME part partitioning (no join-back), the
    * cross-multiplied `2·sq > tot` filter, then a semi-join to
    * EUROPE suppliers. Quantities are exact integers. */
  val qExcessSuppliers = GQuery("q_excess_suppliers",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_partkey"))
      val smallParts = Tables.part(s, d)
        .filter(col("p_name").like("small %"))
        .select(col("p_partkey"))
      val ps = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sq"))
      val dominant = ps
        .withColumn("tot", sum(col("sq")).over(w))
        .filter(col("sq") * 2L > col("tot"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(dominant, col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },
    Some("""WITH ps AS (
        SELECT l_partkey, l_suppkey,
          SUM(CAST(l_quantity AS BIGINT)) AS sq
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small %'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2),
      tot AS (SELECT l_partkey, SUM(sq) AS tot FROM ps GROUP BY 1)
      SELECT s_suppkey, s_name
      FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
        AND s_suppkey IN (
          SELECT l_suppkey FROM ps JOIN tot USING (l_partkey)
          WHERE ps.sq * 2 > tot.tot)
      ORDER BY s_suppkey"""),
    notes = "TPC-H Q20 shape; nested IN decorrelated to window-total " +
      "share filter + semi-join, exact integer quantities")

  val all: Seq[GQuery] = Seq(qMinCostSupplier, qOrderPriorityCheck,
    qNationTrade, qMarketShare, qProductProfit, qReturnedCustomers,
    qPriorityLinecount, qOrderCountDist, qPromoShare,
    qSupplierPartCounts, qBracketPricing, qExcessSuppliers)
}
