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
