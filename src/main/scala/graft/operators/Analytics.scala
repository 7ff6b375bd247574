package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Series / frontier analytics: Pareto skyline, CUSUM changepoint
  * detection, lag-k autocorrelation.
  *
  * All three are window-family operators chosen for their SCALE shape:
  * none needs an all-pairs self-join or driver-side iteration.
  *
  *  - [[skyline2d]] rewrites the quadratic NOT-EXISTS dominance test as
  *    a per-x-value aggregate plus one running-min window over the
  *    (bounded) distinct-x table — the classic sort-filter skyline,
  *    O(n) after one groupBy shuffle.
  *  - [[cusumTop]] uses the prefix-sum identity
  *    `S_i = P_i - min(P_0..P_i)` to turn the recursive CUSUM
  *    `S_i = max(0, S_{i-1} + (x_i - k))` into two window passes —
  *    no iterative state, partition-parallel per series.
  *  - [[lagAutocorr]] reduces each series to five exact-decimal sums
  *    (Σx, Σy, Σxy, Σx², Σy²) with map-side partial aggregation and
  *    computes Pearson r from them in a fixed IEEE op sequence.
  */
object Analytics {

  /** 2D Pareto SKYLINE (maximize `xCol`, minimize `yCol`): the set of
    * rows not dominated by any other row, where p dominates q iff
    * p.x >= q.x, p.y <= q.y and at least one is strict.
    *
    * Plan shape (scale posture): the quadratic dominance test never
    * runs. One groupBy on x [shuffle 1, bounded by distinct-x
    * cardinality] computes the min y per x; a running min over that
    * tiny table ordered by x desc (excluding the current x) gives the
    * best y among all strictly-larger x; the base table then joins the
    * per-x verdict (broadcast — the per-x table is bounded) and keeps
    * rows that (a) achieve the min y at their own x and (b) beat every
    * larger x's min y. At 100 TB with a bounded x domain this is one
    * shuffle + one broadcast, vs the O(n²) NOT EXISTS the oracle runs.
    *
    * Mirrors the reference's best-odds frontier reporting shape
    * (reports over best-price-per-outcome tables); generalized here to
    * any (maximize, minimize) pair.
    */
  /** EXACT ROC-AUC via the Mann–Whitney rank-sum, tie-correct and
    * libm-free: with `scoreCol` an INTEGER score and `labelCol` a
    * boolean label, AUC = (Σ_{pos i, neg j} [s_i > s_j] + ½[s_i = s_j])
    * / (P·N). Computed on the bounded DISTINCT-SCORE table: per score,
    * positive/negative counts; a cumulative negatives-below window
    * (exclusive frame); then u2 = Σ pc·(2·nb + nc) = 2·U — the ½-tie
    * credit carried as an integer. auc_x1e6 = u2·10⁶ div (2·P·N).
    *
    * Plan: one corpus agg to the score table, ONE window over that
    * bounded table (never the corpus), one final 1-row agg. The final
    * ratio is computed in DECIMAL(38,0) (mirroring the twin's HUGEINT
    * sums), so the real bound is 2·P·N·10⁶ < 10³⁸ — effectively
    * unbounded for any evaluation corpus. Output: (n_pos, n_neg, u2,
    * auc_x1e6). */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String)
      : DataFrame = {
    val g = df.select(col(scoreCol).cast("long").as("s"),
        when(col(labelCol), 1L).otherwise(0L).as("p"))
      .groupBy(col("s"))
      .agg(sum(col("p")).as("pc"), sum(lit(1L) - col("p")).as("nc"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("nb", coalesce(sum(col("nc")).over(w), lit(0L)))
      .agg(sum(col("pc")).as("n_pos"), sum(col("nc")).as("n_neg"),
        sum(col("pc") * (lit(2L) * col("nb") + col("nc"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        expr("cast(u2 as decimal(38,0)) * 1000000 div " +
          "(2 * cast(n_pos as decimal(38,0)) * n_neg)").as("auc_x1e6"))
  }

  def skyline2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.groupBy(col(xCol)).agg(min(col(yCol)).as("_min_y"))
    // one row per distinct x; rows preceding in x-desc order are exactly
    // the strictly-larger x values
    val w = Window.orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val verdict = perX.withColumn("_best_larger", min(col("_min_y")).over(w))
    df.join(broadcast(verdict), Seq(xCol))
      .filter(col(yCol) === col("_min_y") &&
        (col("_best_larger").isNull || col(yCol) < col("_best_larger")))
      .drop("_min_y", "_best_larger")
  }

  /** CUSUM changepoint statistic per series (high-side Page test): for
    * each key's time-ordered values x_1..x_n with reference value k
    * (the series' integer mean), the CUSUM is the recursion
    * `S_i = max(0, S_{i-1} + (x_i - k))`. Computed HERE via the exact
    * prefix identity `S_i = P_i - min(P_1..P_i, 0)` with
    * `P_i = Σ_{j<=i}(x_j - k)` — two stacked windows, zero recursion,
    * so the operator stays partition-parallel per key (the watermark
    * discipline's batch twin: state is a running min, not a loop).
    *
    * All arithmetic is INTEGER (values quantized to micros via exact
    * decimal, reference value by integer division), so the statistic is
    * hash-exact cross-engine with no golden. Returns every (key, t)
    * with its CUSUM value; callers threshold or top-k downstream.
    */
  def cusum(df: DataFrame, keyCol: String, tCol: String, vCol: String)
      : DataFrame = {
    // exact integer micros per point
    val pts = df.select(col(keyCol).as("k"), col(tCol).as("t"),
      (col(vCol).cast(DecimalType(27, 6)) * lit(1000000))
        .cast(LongType).as("x"))
    // per-series integer reference value k = Σx div n (exact integer
    // division — no double crosses the engine boundary)
    val ref = pts.groupBy(col("k"))
      .agg(expr("sum(x) div count(1)").as("mu"))
    val wAll = Window.partitionBy(col("k")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // no broadcast hint: the ref side is one row per series key, which is
    // bounded for dashboard series but NOT for per-user keys — AQE
    // promotes to broadcast at runtime when it is actually small
    pts.join(ref, Seq("k"))
      .withColumn("p", sum(col("x") - col("mu")).over(wAll))
      .withColumn("s",
        col("p") - least(min(col("p")).over(wAll), lit(0L)))
      .select(col("k"), col("t"), col("x"), col("s"))
  }

  /** THEIL-SEN robust slope per series: the median of all pairwise
    * slopes (dy/dx over day pairs) — the robust trend estimator that a
    * single outlier day cannot move (vs OLS [[graft.operators
    * .Reports]]' q_linreg). Exactness discipline: slopes are compared
    * via the integer key `(dy·10⁶ + B·dx) div dx` with B = 10⁹ — the
    * +B·dx shift keeps the numerator positive so truncating division
    * IS floor division in both engines (Spark `div` truncates toward
    * zero, DuckDB `//` floors; they agree only on non-negatives) —
    * and the reported micro-slope is key − B. Lower median, ties by
    * pair index. O(d²) pairs per series where d = #days — bounded by
    * the observation window, shuffled once on the series key. */
  def theilSen(series: DataFrame, keyCol: String, tCol: String,
      vCol: String): DataFrame = {
    val a = series.select(col(keyCol).as("k"), col(tCol).as("ta"),
      col(vCol).cast(LongType).as("xa"))
    val b = series.select(col(keyCol).as("k"), col(tCol).as("tb"),
      col(vCol).cast(LongType).as("xb"))
    val pairs = a.join(b, Seq("k"))
      .filter(col("ta") < col("tb"))
      .select(col("k"), col("ta"), col("tb"),
        datediff(col("tb"), col("ta")).cast(LongType).as("dx"),
        (col("xb") - col("xa")).as("dy"))
      .withColumn("key",
        expr("(dy * 1000000 + 1000000000 * dx) div dx"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("key"), col("ta"), col("tb"))
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(
        Window.partitionBy(col("k"))))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("k"), col("n_pairs"),
        (col("key") - lit(1000000000L)).as("slope_micro"))
  }

  /** Trailing lower-median per series point: exact windowed median of
    * the last `win` values (collect → sort → lower-middle element; no
    * interpolated even-count median, so the result stays an exact
    * integer in both engines). State per row is `win` values — bounded
    * by construction. */
  def rollingMedian(series: DataFrame, keyCol: String, tCol: String,
      vCol: String, win: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
      .rowsBetween(-(win - 1), Window.currentRow)
    series.select(col(keyCol), col(tCol),
        col(vCol).cast(LongType).as("v"),
        collect_list(col(vCol).cast(LongType)).over(w).as("_w"))
      .select(col(keyCol), col(tCol), col("v"),
        element_at(array_sort(col("_w")),
          expr("cast((size(_w) + 1) div 2 as int)")).as("med"))
  }

  /** HAMPEL FILTER per series point: flag values deviating from the
    * trailing window's lower-median by more than `k` × the window's
    * MAD (lower-median absolute deviation) — the robust outlier
    * detector that a spike cannot poison, since both the center and
    * the spread estimate are medians. All integer: lower medians keep
    * exact values, and the flag compares `|x−med| > k·mad` in int64.
    * When the window is constant (mad = 0) any deviation flags — the
    * textbook filter's degenerate case, kept deliberately. Returns
    * every point with (med, mad, is_outlier). */
  def hampel(series: DataFrame, keyCol: String, tCol: String,
      vCol: String, win: Int, k: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
      .rowsBetween(-(win - 1), Window.currentRow)
    series.select(col(keyCol), col(tCol),
        col(vCol).cast(LongType).as("v"),
        collect_list(col(vCol).cast(LongType)).over(w).as("_w"))
      .withColumn("med", element_at(array_sort(col("_w")),
        expr("cast((size(_w) + 1) div 2 as int)")))
      .withColumn("mad", element_at(
        array_sort(transform(col("_w"), x => abs(x - col("med")))),
        expr("cast((size(_w) + 1) div 2 as int)")))
      .select(col(keyCol), col(tCol), col("v"), col("med"), col("mad"),
        (abs(col("v") - col("med")) > col("mad") * lit(k))
          .cast("int").as("is_outlier"))
  }

  /** Day-of-week SEASONALITY index per series: mean daily volume on
    * each weekday over the overall mean, as an exact integer
    * per-mille — `(1000·sum_dow·cnt_all) div (cnt_dow·sum_all)` on
    * positive micro-quantized sums, so both engines floor identically.
    * Weekday 0 = Monday via epoch-anchored arithmetic (`datediff` from
    * 1970-01-05 mod 7) — no engine-specific DOW numbering crosses the
    * boundary. */
  def dowSeasonality(daily: DataFrame, keyCol: String, dayCol: String,
      vCol: String): DataFrame = {
    val d = daily.select(col(keyCol).as("k"),
      (datediff(col(dayCol), to_date(lit("1970-01-05"))) % 7)
        .cast(LongType).as("dow"),
      col(vCol).cast(LongType).as("x"))
    val byDow = d.groupBy(col("k"), col("dow"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("c"))
    val overall = d.groupBy(col("k"))
      .agg(sum(col("x")).as("s_all"), count(lit(1)).as("c_all"))
    byDow.join(overall, Seq("k"))
      .select(col("k"), col("dow"), col("c").as("n_days"),
        expr("(1000 * s * c_all) div (c * s_all)").as("index_milli"))
  }

  /** STL-LITE DECOMPOSITION of a per-key daily series into trend +
    * day-of-week seasonal + residual, exact-integer throughout: daily
    * sums in micro fixed point (decimal-exact, then scaled), trend as
    * the centered 7-day window mean (shrinking frames at the series
    * edges — the window's own row count is the divisor, identical SQL
    * semantics), seasonal as the per-DOW floor-mean of the detrended
    * values (SIGN-SAFE floor division — detrended values go negative),
    * residual as the exact remainder. The additive decomposition
    * x = trend + seasonal + resid holds by construction.
    *
    * Plan: one corpus agg to the |key·days| daily table; one window and
    * one 7-row-per-key agg over THAT (never the corpus); one join back.
    * Output: (k, day, x_micro, trend_micro, seasonal_micro,
    * resid_micro). */
  def stlLite(events: DataFrame, keyCol: String, tsCol: String,
      vCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol).as("k"), to_date(col(tsCol)).as("day"))
      .agg((sum(col(vCol).cast(DecimalType(18, 6))) * 1000000)
        .cast(LongType).as("x"))
    val wT = Window.partitionBy(col("k")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val t = daily
      .withColumn("tsum", sum(col("x")).over(wT))
      .withColumn("tcnt", count(lit(1)).over(wT))
      .withColumn("trend",
        expr("(tsum - ((tsum % tcnt) + tcnt) % tcnt) div tcnt"))
      .withColumn("det", col("x") - col("trend"))
      .withColumn("dow",
        (datediff(col("day"), to_date(lit("1970-01-05"))) % 7)
          .cast(LongType))
    val seas = t.groupBy(col("k"), col("dow"))
      .agg(sum(col("det")).as("ds"), count(lit(1)).as("dc"))
      .withColumn("seasonal",
        expr("(ds - ((ds % dc) + dc) % dc) div dc"))
      .select(col("k"), col("dow"), col("seasonal"))
    t.join(seas, Seq("k", "dow"))
      .select(col("k"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("x").as("x_micro"), col("trend").as("trend_micro"),
        col("seasonal").as("seasonal_micro"),
        (col("det") - col("seasonal")).as("resid_micro"))
      .orderBy(col("k"), col("day"))
  }

  /** Lag-1 autocorrelation of a per-key series: Pearson r between
    * (x_t, x_{t+1}) pairs, with Σ-terms in exact decimal (map-side
    * partial agg) and the final r assembled in a pinned IEEE sequence:
    * `r = num / (sqrt(d1) * sqrt(d2))` where every operand converts
    * from exact decimal. Returns (key, n_pairs, r).
    */
  def lagAutocorr(series: DataFrame, keyCol: String, tCol: String,
      vCol: String): DataFrame = {
    val wLag = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
    val d38 = DecimalType(38, 0)
    val pairs = series
      .withColumn("_y", lead(col(vCol), 1).over(wLag))
      .filter(col("_y").isNotNull)
      .select(col(keyCol),
        col(vCol).cast(d38).as("x"), col("_y").cast(d38).as("y"))
    pairs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).cast(d38).as("sxy"),
        sum(col("x") * col("x")).cast(d38).as("sxx"),
        sum(col("y") * col("y")).cast(d38).as("syy"))
      .select(col(keyCol), col("n_pairs"),
        ((col("n_pairs").cast(d38) * col("sxy") - col("sx") * col("sy"))
          .cast(DoubleType) /
          (sqrt((col("n_pairs").cast(d38) * col("sxx") -
            col("sx") * col("sx")).cast(DoubleType)) *
           sqrt((col("n_pairs").cast(d38) * col("syy") -
             col("sy") * col("sy")).cast(DoubleType)))).as("r"))
  }
}
