package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Time-series / rank-association completions: the multi-lag
  * correlogram and binned Kendall τ-b — completing the monitoring /
  * rank-association family next to the existing Holt / STL /
  * changepoint / Spearman / q_theilsen / lag-1 q_autocorr gates.
  *
  * Both follow the engine's integer-fixed-point contract: counts
  * and cents only, products in DECIMAL(38,0) where int64 could wrap at
  * 100 TB, negative numerators through the sign-split division
  * `sign(x)·((abs(x)·scale) div den)` (Spark `div` truncates, DuckDB
  * `//` floors — identical on non-negatives only).
  *
  * Scale shape: each reduces the corpus with ONE keyed agg to a
  * BOUNDED table (days, day-pairs, band cells) and finishes with
  * broadcast-sized arithmetic — the same daily-table posture as
  * q_wow_delta / q_holt.
  */
object SeriesQueries {

  /** Multi-lag CORRELOGRAM of the daily event count (lags 1..7) —
    * generalizing q_autocorr's lag-1 per-key Pearson to the standard
    * ACF diagnostic: one global-mean centering, one shared variance
    * denominator across all lags (the quantity an ACF plot draws,
    * distinct from per-pair Pearson):
    * acf(k) = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)², computed exactly on
    * n-scaled centered integers c_t = n·x_t − S (multiplying through
    * by n² cancels — no rational mean crosses an engine). Output in
    * signed parts-per-million. The corpus contributes one day-keyed
    * agg; lags join the bounded daily table to itself. */
  val qAcf = GQuery("q_acf",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val stats = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      val cent = daily.crossJoin(broadcast(stats))
        .select(col("day"),
          (col("n") * col("x") - col("s")).cast("decimal(38,0)")
            .as("c"))
      val den = cent.agg(sum(col("c") * col("c")).as("den"))
      val lags = s.range(1, 8).select(col("id").cast("int").as("lag"))
      cent.as("a")
        .crossJoin(broadcast(lags))
        .join(cent.as("b"),
          expr("b.day = date_add(a.day, lag)"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("a.c") * col("b.c")).as("num"))
        .crossJoin(broadcast(den))
        .select(col("lag").cast("long").as("lag"), col("n_pairs"),
          expr("""cast(case when num < 0 then -1 else 1 end
              * ((abs(num) * 1000000) div nullif(den, 0))
              as bigint)""").as("acf_x1e6"))
        .orderBy(col("lag"))
    },
    Some("""WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS s FROM daily),
      cent AS (SELECT day,
          CAST(n * x - s AS HUGEINT) AS c FROM daily, st),
      den AS (SELECT SUM(c * c) AS den FROM cent),
      lags AS (SELECT CAST(r AS INTEGER) AS lag
        FROM range(1, 8) t(r))
      SELECT CAST(lag AS BIGINT) AS lag,
        CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(CASE WHEN SUM(a.c * b.c) < 0 THEN -1 ELSE 1 END
          * ((abs(SUM(a.c * b.c)) * 1000000)
            // nullif((SELECT den FROM den), 0)) AS BIGINT)
          AS acf_x1e6
      FROM cent a JOIN lags ON true
        JOIN cent b ON b.day = a.day + lag
      GROUP BY lag ORDER BY lag"""),
    notes = "exact n-scaled centered ACF, lags 1..7, ppm; bounded " +
      "daily table, sign-split division")

  /** Kendall τ-b between customer account balance and total spend,
    * computed EXACTLY on a banded 2-D contingency table (acctbal in
    * 1000-currency bands, spend in floor-log₂-cent bands): concordant/
    * discordant counts from cell-pair products, ties from the
    * marginals — the standard τ-b-on-grouped-data estimator, and the
    * only scale-safe Kendall: cells are bounded (≤ ~11×40) no matter
    * the corpus size, where raw Kendall needs all-pairs. Output keeps
    * the exact integer components (C, D, ties, n) alongside a
    * bounded-precision tau² in 1e-4 steps (the square dodges the
    * cross-engine sqrt; sign rides separately). */
  val qKendallBinned = GQuery("q_kendall_binned",
    (s, d) => {
      val spend = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long"))
          .as("spend_cents"))
      val binned = Tables.customer(s, d)
        .join(spend, col("c_custkey") === col("o_custkey"))
        .select(
          expr("""(cast(floor(c_acctbal * 100) as bigint) + 100000)
              div 100000""").as("xb"),
          (length(bin(col("spend_cents"))) - 1).cast("long").as("yb"))
      val cells = binned.groupBy(col("xb"), col("yb"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("cnt"))
      val cd = cells.as("a").crossJoin(broadcast(cells.as("b")))
        .agg(
          sum(when(col("a.xb") < col("b.xb") &&
              col("a.yb") < col("b.yb"),
            col("a.cnt") * col("b.cnt")).otherwise(lit(0)))
            .as("c_cnt"),
          sum(when(col("a.xb") < col("b.xb") &&
              col("a.yb") > col("b.yb"),
            col("a.cnt") * col("b.cnt")).otherwise(lit(0)))
            .as("d_cnt"))
      val ties = cells
        .groupBy(col("xb")).agg(sum(col("cnt")).as("r"))
        .agg(sum(expr("r * (r - 1) div 2")).cast("decimal(38,0)")
          .as("tie_x"))
        .crossJoin(cells
          .groupBy(col("yb")).agg(sum(col("cnt")).as("cc"))
          .agg(sum(expr("cc * (cc - 1) div 2")).cast("decimal(38,0)")
            .as("tie_y")))
        .crossJoin(cells.agg(sum(col("cnt")).cast("decimal(38,0)")
          .as("n")))
      cd.crossJoin(ties)
        .select(
          col("n").cast("long").as("n"),
          col("c_cnt").cast("long").as("c_cnt"),
          col("d_cnt").cast("long").as("d_cnt"),
          col("tie_x").cast("long").as("tie_x"),
          col("tie_y").cast("long").as("tie_y"),
          expr("""cast(case when c_cnt < d_cnt then -1
              when c_cnt > d_cnt then 1 else 0 end as bigint)""")
            .as("tau_sign"),
          expr("""cast(((c_cnt - d_cnt) * (c_cnt - d_cnt) * 10000)
              div nullif(
                (n * (n - 1) div 2 - tie_x)
                  * (n * (n - 1) div 2 - tie_y), 0)
              as bigint)""").as("tau_sq_x1e4"))
    },
    Some("""WITH spend AS (
        SELECT o_custkey,
          SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS spend_cents
        FROM orders GROUP BY 1),
      binned AS (
        SELECT (CAST(floor(c_acctbal * 100) AS BIGINT) + 100000)
            // 100000 AS xb,
          length(format('{:b}', CAST(spend_cents AS BIGINT))) - 1 AS yb
        FROM customer JOIN spend ON c_custkey = o_custkey),
      cells AS (
        SELECT xb, yb, CAST(COUNT(*) AS HUGEINT) AS cnt
        FROM binned GROUP BY 1, 2),
      cd AS (
        SELECT
          SUM(CASE WHEN a.xb < b.xb AND a.yb < b.yb
            THEN a.cnt * b.cnt ELSE 0 END) AS c_cnt,
          SUM(CASE WHEN a.xb < b.xb AND a.yb > b.yb
            THEN a.cnt * b.cnt ELSE 0 END) AS d_cnt
        FROM cells a, cells b),
      tx AS (SELECT SUM(r * (r - 1) // 2) AS tie_x FROM (
        SELECT SUM(cnt) AS r FROM cells GROUP BY xb)),
      ty AS (SELECT SUM(cc * (cc - 1) // 2) AS tie_y FROM (
        SELECT SUM(cnt) AS cc FROM cells GROUP BY yb)),
      nn AS (SELECT SUM(cnt) AS n FROM cells)
      SELECT CAST(n AS BIGINT) AS n, CAST(c_cnt AS BIGINT) AS c_cnt,
        CAST(d_cnt AS BIGINT) AS d_cnt,
        CAST(tie_x AS BIGINT) AS tie_x, CAST(tie_y AS BIGINT) AS tie_y,
        CAST(CASE WHEN c_cnt < d_cnt THEN -1
          WHEN c_cnt > d_cnt THEN 1 ELSE 0 END AS BIGINT) AS tau_sign,
        CAST(((c_cnt - d_cnt) * (c_cnt - d_cnt) * 10000)
          // nullif((n * (n - 1) // 2 - tie_x)
            * (n * (n - 1) // 2 - tie_y), 0) AS BIGINT) AS tau_sq_x1e4
      FROM cd, tx, ty, nn"""),
    notes = "exact tau-b on a bounded 2-D band grid: concordance from " +
      "cell pairs, ties from marginals; tau^2 in 1e-4 steps, raw " +
      "integer components alongside")

  val all: Seq[GQuery] = Seq(qAcf, qKendallBinned)
}
