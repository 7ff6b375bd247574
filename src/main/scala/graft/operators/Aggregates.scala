package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation-strategy operators: explicit plan shapes for the
  * aggregations where the DEFAULT shape stops working at scale —
  * skewed distinct counts, incremental rollup maintenance, and
  * distribution normalization. */
object Aggregates {

  /** TWO-PHASE DISTINCT COUNT — the skew-safe shape for
    * COUNT(DISTINCT v) GROUP BY k when one key dominates: phase 1
    * dedups on the COMPOSITE (k, v) key, so the heavy shuffle spreads a
    * hot k across the v dimension instead of funneling it to one
    * partition; phase 2 is a plain count over the already-thin distinct
    * set. Phase 2 counts `count(valCol)`, not `count(*)`: SQL's
    * COUNT(DISTINCT v) ignores NULLs, and distinct() keeps one
    * (k, NULL) row per key — counting the COLUMN skips that row while
    * still emitting every key (an all-NULL key reports 0, exactly as
    * GROUP BY would), so the countDistinct equivalence holds for
    * nullable valCol too (the oracle IS the plain COUNT(DISTINCT) —
    * equivalence contract, like saltedJoin). The value is the
    * explicit, composable plan: phase 1 can take a salt, a
    * pre-filter, or feed several downstream aggregations. */
  def twoPhaseDistinct(df: DataFrame, keyCol: String,
      valCol: String): DataFrame =
    df.select(col(keyCol), col(valCol)).distinct()
      .groupBy(col(keyCol))
      .agg(count(col(valCol)).as("n_distinct"))
      .orderBy(col(keyCol))

  /** PARTIAL-AGGREGATE MAINTENANCE (incremental rollup): the daily
    * partial table a 100 TB pipeline maintains incrementally — exact
    * DECIMAL sums and counts per (group, day). Decimal addition is
    * associative, so re-aggregating partials to any coarser grain is
    * EXACTLY equal to aggregating the raw stream — the equivalence
    * [[weeklyFromDaily]]'s oracle pins. One map-side-combined agg. */
  def dailyPartials(df: DataFrame, groupCol: String, tsCol: String,
      valCol: String): DataFrame =
    df.groupBy(col(groupCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast(DecimalType(27, 6))).as("sum_dec"))

  /** Weekly rollup FROM THE DAILY PARTIALS — the incremental-view
    * read path (merge partials, never re-scan raw): counts add, decimal
    * sums add exactly; the double cast happens once at the edge, so the
    * result is bit-identical to a direct weekly aggregation of the raw
    * table. Week key = Monday-start date_trunc, formatted for the hash
    * gate. */
  def weeklyFromDaily(daily: DataFrame, groupCol: String): DataFrame =
    daily
      .groupBy(col(groupCol),
        graft.Det.fmtDate(date_trunc("week", col("day"))).as("week"))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_dec")).cast("double").as("sum_val"))
      .orderBy(col(groupCol), col("week"))

  /** LINEAR FIT + PEARSON CORRELATION per group (the SQL `regr_slope`/
    * `regr_intercept`/`corr` family) from EXACT DECIMAL MOMENTS: x is
    * cast to DECIMAL(13,2) and y to DECIMAL(13,2), so Σx, Σy, Σxy, Σx²,
    * Σy² are exact (4-dp products) and order-independent; the closed
    * forms are then assembled in a FIXED IEEE op order —
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
    *   intercept = (Σy − slope·Σx) / n
    *   corr = (n·Σxy − Σx·Σy) / (√(n·Σx²−Σx·Σx) · √(n·Σy²−Σy·Σy))
    * — every step exactly rounded on identical inputs, so the doubles
    * are bit-identical cross-engine (the zscoreAnomalies discipline).
    * Degenerate variance (constant x or y) reports slope/corr 0 rather
    * than NaN, mirrored in the twin. ONE map-side-combined aggregation;
    * the built-in `corr`/`regr_slope` aggs average incrementally and
    * are NOT portable bit-for-bit — that is why the moments are
    * explicit. */
  def linearFit(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dx = col(xCol).cast(DecimalType(13, 2))
    val dy = col(yCol).cast(DecimalType(13, 2))
    val agged = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(dx).cast("double").as("sx"),
        sum(dy).cast("double").as("sy"),
        sum(dx * dy).cast("double").as("sxy"),
        sum(dx * dx).cast("double").as("sx2"),
        sum(dy * dy).cast("double").as("sy2"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy") - col("sx") * col("sy")
    val vx = nD * col("sx2") - col("sx") * col("sx")
    val vy = nD * col("sy2") - col("sy") * col("sy")
    agged
      .withColumn("slope", when(vx === 0.0, lit(0.0)).otherwise(num / vx))
      .withColumn("intercept",
        (col("sy") - col("slope") * col("sx")) / nD)
      .withColumn("corr", when(vx === 0.0 || vy === 0.0, lit(0.0))
        .otherwise(num / (sqrt(vx) * sqrt(vy))))
      .select(col(groupCol), col("n"), col("slope"), col("intercept"),
        col("corr"))
      .orderBy(col(groupCol))
  }

  /** CO-OCCURRENCE (market-basket) PAIR MINING: the top-k item pairs
    * that appear together in the most baskets. Baskets collapse to a
    * SORTED DISTINCT item array first (one shuffle on the basket key),
    * then pairs are generated MAP-SIDE inside the array (ordered i<j —
    * each unordered pair once, never an item-table self-join, the
    * pairCounts discipline): the expansion is Σ b²/2 over basket SIZES,
    * bounded by `maxItems` per basket, not corpus². Top-k is a
    * TakeOrderedAndProject under a total (n DESC, a, b) order, rank
    * numbered after the limit. */
  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String,
      k: Int, maxItems: Int = 64): DataFrame = {
    val baskets = df.groupBy(col(basketCol))
      .agg(slice(sort_array(collect_set(col(itemCol))), 1, maxItems)
        .as("__items"))
    val pairs = baskets.select(explode(flatten(
      expr("""transform(__items, (x, i) ->
                transform(slice(__items, i + 2, size(__items)),
                  y -> struct(x AS a, y AS b)))"""))).as("__p"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"))
    val top = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("a"), col("b"))
      .limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(desc("n"), col("a"), col("b"))).cast("long"))
      .select(col("rank"), col("a"), col("b"), col("n"))
      .orderBy(col("rank"))
  }

  /** ASSOCIATION RULES a→b over capped baskets (the [[coOccurrence]]
    * discipline: per-basket DISTINCT items, sorted, capped at
    * `maxItems` so one mega-basket can't explode the pair stage).
    * Directional rules with exact integer metrics:
    *   conf_x1000 = n_ab·1000 div n_a
    *   lift_x1000 = n_ab·n_baskets·1000 div (n_a·n_b)
    * — no IEEE ops, so ranking and values are hash-exact. Item counts
    * come from the SAME capped item stream the pairs do (self-
    * consistent supports). Plan: one basket agg (corpus shuffle), pair
    * fan-out in-array (≤ maxItems² per basket), counts map-side
    * combined; the bounded item-count table broadcasts onto the rule
    * table and the 1-row basket total rides a broadcast cross join
    * (the q_tfidf_topk shape). Top-k by (lift, conf, rule) — bounded
    * output. */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minSup: Long, k: Int, maxItems: Int = 64): DataFrame = {
    val baskets = df.groupBy(col(basketCol))
      .agg(slice(sort_array(collect_set(col(itemCol))), 1, maxItems)
        .as("__items"))
      .localCheckpoint(true) // item counts, pair counts, and N reuse it
    val items = baskets.select(explode(col("__items")).as("item"))
    val itemCnt = items.groupBy(col("item")).agg(count(lit(1)).as("ni"))
    val nb = baskets.agg(count(lit(1)).as("n_baskets"))
    val und = baskets.select(explode(flatten(
      expr("""transform(__items, (x, i) ->
                transform(slice(__items, i + 2, size(__items)),
                  y -> struct(x AS a, y AS b)))"""))).as("__p"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSup)
    val rules = und.select(col("a").as("antecedent"),
        col("b").as("consequent"), col("n_ab"))
      .unionByName(und.select(col("b").as("antecedent"),
        col("a").as("consequent"), col("n_ab")))
    rules
      .join(broadcast(itemCnt.withColumnRenamed("item", "antecedent")
        .withColumnRenamed("ni", "n_a")), Seq("antecedent"))
      .join(broadcast(itemCnt.withColumnRenamed("item", "consequent")
        .withColumnRenamed("ni", "n_b")), Seq("consequent"))
      .crossJoin(broadcast(nb))
      .withColumn("conf_x1000", expr("n_ab * 1000 div n_a"))
      .withColumn("lift_x1000",
        expr("n_ab * n_baskets * 1000 div (n_a * n_b)"))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("n_a"), col("n_b"), col("conf_x1000"), col("lift_x1000"))
      .orderBy(desc("lift_x1000"), desc("conf_x1000"),
        col("antecedent"), col("consequent"))
      .limit(k)
  }

  /** RATIO-TO-REPORT (contribution analysis): per-group totals plus
    * each group's share of the grand total. The grand total is a window
    * sum over the ALREADY-AGGREGATED #groups-row table (the
    * single-partition window touches #groups rows, not the corpus);
    * decimal sums keep both numerator and denominator exact, the share
    * is one IEEE divide. */
  def ratioToReport(df: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val agged = df.groupBy(col(groupCol))
      .agg(sum(col(valCol).cast(DecimalType(27, 6))).as("__dec"),
        count(lit(1)).as("n"))
    agged
      .withColumn("__tot", sum(col("__dec")).over(
        Window.partitionBy()))
      .select(col(groupCol), col("n"),
        col("__dec").cast("double").as("sum_val"),
        (col("__dec").cast("double") / col("__tot").cast("double"))
          .as("share"))
      .orderBy(col(groupCol))
  }

  /** QUANTILE NORMALIZATION to a REFERENCE distribution (batch-effect
    * correction: after it, every group's values follow the reference
    * group's distribution regardless of the group's own location/
    * scale). The reference is the LARGEST group (ties to the smaller
    * name — total order); the mapping sends a row at group rank r of n
    * to the reference's order statistic at bucket b = ⌊(2r−1)·B/(2n)⌋,
    * i.e. the reference value at rank ⌈b·n_ref/B⌉ — ALL cut arithmetic
    * is INTEGER (ceil(a/b) = (a+b−1) div b), the one double produced
    * (the percent position p) is a single IEEE divide: nothing here
    * depends on engine interpolation rules (the winsorize convention —
    * percentile_cont/quantile_cont interpolate in different op orders
    * across engines and diverge in the last ulp).
    *
    * Plan: per-group rank+count ride one group-key window exchange
    * (group-bounded sorts, no global sort of the data); the reference
    * pick is a #groups-row aggregate; the B+1-row grid is extracted by
    * a broadcast rank join against the reference group's ranked rows
    * and broadcast back onto every row. At 100 TB the grid swaps to
    * approx_percentile over the reference group — same B+1-row
    * broadcast, approximate cuts. */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
      valCol: String, buckets: Int = 100): DataFrame = {
    val wg = Window.partitionBy(col(groupCol))
    val ranked = df.select(col(idCol), col(groupCol), col(valCol))
      .withColumn("__r", row_number().over(
        wg.orderBy(col(valCol), col(idCol))))
      .withColumn("__n", count(lit(1)).over(wg))
    // reference group: most rows, deterministic tie-break on the name
    val ref = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
      .withColumn("__rk", row_number().over(
        Window.orderBy(desc("__cnt"), col(groupCol))))
      .filter(col("__rk") === 1)
      .select(col(groupCol).as("__refg"))
    val refRanked = ranked
      .join(broadcast(ref), ranked(groupCol) === col("__refg"))
    // grid: the reference's value at integer rank ceil(b·n_ref/B),
    // b = 0..B (b=0 clamps to rank 1)
    val ks = refRanked.filter(col("__r") === 1)
      .select(explode(sequence(lit(0L), lit(buckets.toLong))).as("bucket"),
        col("__n").as("__nref"))
      .withColumn("__target", greatest(lit(1L),
        expr(s"(bucket * __nref + ${buckets - 1}) div $buckets")))
    val grid = broadcast(ks)
      .join(refRanked, col("__target") === refRanked("__r"))
      .select(col("bucket"), col(valCol).as("norm_val"))
    ranked
      .withColumn("p",
        (lit(2) * col("__r") - 1).cast("double")
          / (lit(2) * col("__n")).cast("double"))
      .withColumn("bucket", expr(s"((2 * __r - 1) * $buckets) div (2 * __n)"))
      .join(broadcast(grid), Seq("bucket"))
      .select(col(idCol), col(groupCol), col(valCol), col("p"),
        col("norm_val"))
      .orderBy(col(idCol))
  }

  /** MERGEABLE QUANTILE SKETCH — bottom-k-by-md5 sampling
    * ([[graft.functions.BottomKAgg]]): per group, keep the k rows whose
    * md5(salt:key) is smallest (a deterministic uniform sample —
    * md5 order is a property of the data, not the partitioning), then
    * read quantile estimates as order statistics of the sample. The
    * scale story exact quantiles can't tell: state is k rows per group
    * bounded BEFORE the exchange (map-side partials), merge is
    * associative/commutative union-take-k, so a 100 TB group costs the
    * same shuffle bytes as a 100-row one — and unlike
    * `percentile_approx`'s reservoir the result is bit-reproducible on
    * any cluster layout. Standard error ~ sqrt(q(1-q)/k) quantile mass.
    *
    * Estimate index is the floor order statistic idx = (k_eff-1)·q/100
    * + 1 (1-based); ties in the sample sort break by hash, so the
    * element chosen is total-order deterministic. Output per group:
    * n (exact), k_eff, and one `p<q>_est` column per requested
    * percentile — raw data values, byte-exact across engines. */
  def bottomKQuantiles(df: DataFrame, groupCol: String, keyCol: String,
      valCol: String, k: Int = 64, qs: Seq[Int] = Seq(50, 90, 99),
      salt: String = "qsk"): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 100))
    val bk = udaf(new graft.functions.BottomKAgg(k))
    val hashed = df.select(col(groupCol),
      md5(concat(lit(salt), lit(":"), col(keyCol).cast("string")))
        .as("__h"),
      col(valCol).cast("double").as("__v"))
    val est = qs.map { q =>
      element_at(col("__smp"),
        (expr(s"((__k - 1) * $q) div 100") + lit(1L)).cast("int"))
        .as(s"p${q}_est")
    }
    hashed.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), bk(col("__h"), col("__v")).as("__smp"))
      .withColumn("__k", size(col("__smp")).cast("long"))
      .select(col(groupCol) +: col("n") +: col("__k").as("k_eff") +:
        est: _*)
      .orderBy(col(groupCol))
  }

  /** KMV DISTINCT SKETCH WITH SET ALGEBRA (Beyer et al. 2007) — the
    * third cardinality sketch next to HLL (q_approx_distinct,
    * fixed-register approximate) and the exact two-level bitmap
    * (q_bitmap_distinct): k minimum hash VALUES per set. What KMV adds
    * is closed set algebra — the union sketch of two sets is just the
    * k smallest of their samples' union, so |A∪B| and (by
    * inclusion–exclusion) |A∩B| come from the two k-row samples with
    * NO second corpus pass. Estimator n̂ = (k−1)·H / v_k with v_k the
    * kth smallest hash and H the hash-space size; a sample that never
    * filled (k_eff < k) holds the whole set, so n̂ = k_eff exactly.
    *
    * Determinism: the hash is a 48-bit fold of the md5 hex (exact in
    * both long and double), the sample is bottom-k by full hex (which
    * refines fold order), and the estimate is integer division —
    * bit-reproducible anywhere. Input is deduped on (group, key)
    * first (KMV is a sketch of a SET); state is k rows per group
    * before any exchange. Output: one row —
    * (k, n_a, n_b, n_union, est_a, est_b, est_union, est_inter). */
  def kmvSetCardinality(df: DataFrame, groupCol: String, keyCol: String,
      grpA: String, grpB: String, k: Int = 128,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2)
    val H = 1L << 48
    def hexVal(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(c >= 97, c - 87).otherwise(c - 48)
    val pairs = df.filter(col(groupCol).isInCollection(Seq(grpA, grpB)))
      .select(col(groupCol).as("g"), col(keyCol).as("key"))
      .distinct()
      .withColumn("hh",
        md5(concat(lit(salt), lit(":"), col("key").cast("string"))))
    val v = (1 to 12).map { i =>
      hexVal(ascii(substring(col("hh"), i, 1))).cast("long") *
        lit(BigInt(16).pow(12 - i).toLong)
    }.reduce(_ + _)
    val bk = udaf(new graft.functions.BottomKAgg(k))
    val sk = pairs.withColumn("v", v.cast("double"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), bk(col("hh"), col("v")).as("smp"))
    val kH = (k - 1).toLong * H // (k−1)·2⁴⁸, the estimator numerator
    def est(kEff: String, vk: String): org.apache.spark.sql.Column =
      when(col(kEff) < k, col(kEff))
        .otherwise(expr(s"${kH}L div cast($vk as bigint)")).cast("long")
    // Anchor on the union aggregate (a global agg — ALWAYS one row, even
    // over zero input) and LEFT-join each group's sketch onto it: an
    // absent grpA/grpB then surfaces as an explicit n=0 / est=0 row
    // instead of the inner-crossJoin chain silently emptying (which a
    // caller could misread as "no overlap" rather than "missing group").
    val a = sk.filter(col("g") === grpA)
      .select(lit(1).as("_j"), col("n").as("n_a"), col("smp").as("smp_a"))
    val b = sk.filter(col("g") === grpB)
      .select(lit(1).as("_j"), col("n").as("n_b"), col("smp").as("smp_b"))
    val nu = pairs.select(col("key")).distinct()
      .agg(count(lit(1)).as("n_union")).withColumn("_j", lit(1))
    val emptySmp = array().cast("array<double>")
    nu.join(broadcast(a), Seq("_j"), "left")
      .join(broadcast(b), Seq("_j"), "left")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
      .withColumn("smp_a", coalesce(col("smp_a"), emptySmp))
      .withColumn("smp_b", coalesce(col("smp_b"), emptySmp))
      .withColumn("ka", size(col("smp_a")).cast("long"))
      .withColumn("kb", size(col("smp_b")).cast("long"))
      .withColumn("us", slice(array_sort(array_distinct(
        concat(col("smp_a"), col("smp_b")))), 1, k))
      .withColumn("ku", size(col("us")).cast("long"))
      .withColumn("vka",
        try_element_at(col("smp_a"), col("ka").cast("int")))
      .withColumn("vkb",
        try_element_at(col("smp_b"), col("kb").cast("int")))
      .withColumn("vku",
        try_element_at(col("us"), col("ku").cast("int")))
      .withColumn("est_a", est("ka", "vka"))
      .withColumn("est_b", est("kb", "vkb"))
      .withColumn("est_union", est("ku", "vku"))
      .select(lit(k.toLong).as("k"), col("n_a"), col("n_b"),
        col("n_union"), col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_inter"))
  }
}
