package graft.queries

import graft.Tables
import graft.operators.{Dsir, NaiveBayes, Selection}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Large-scale statistical inference: multiple-testing control and
  * distribution-free prediction intervals — the two procedures an
  * experimentation / model-evaluation platform runs over thousands of
  * simultaneous hypotheses or held-out predictions.
  *
  * Both are realized under the engine's integer-exact cross-engine
  * contract: p-value bounds live in lg64 fixed-point log₂ space (no
  * libm), conformal residuals stay RATIONAL (one shared integer
  * denominator, so quantile and coverage checks are pure integer
  * comparisons — no division ever rounds).
  */
object InferenceQueries {

  private val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")

  /** BENJAMINI–HOCHBERG FDR control over per-user two-proportion tests
    * ("did this user's high-value-event rate change after the cut?") —
    * the step-up procedure every large A/B platform applies instead of
    * naive per-test thresholds. m = one hypothesis per user with
    * traffic on both sides.
    *
    * Exact arithmetic end to end: the pooled two-proportion z² is the
    * closed-form integer rational
    *   z² = (kb·na − ka·nb)²·n / (nb·na·k·(n−k)),  k=kb+ka, n=nb+na
    * (DECIMAL(38,0)/HUGEINT products — int64 wraps once per-group
    * counts pass ~10⁵; certified for per-user n ≤ 10⁶). P-values are
    * the sub-Gaussian tail bound p = 2·exp(−z²/2), carried ONLY in
    * −log₂ form: nl2p = z²/(2·ln2) − 1 with ln2 fixed at the shared
    * integer constant 693147/10⁶ — both engines use the same constant,
    * so the procedure (not a float approximation of it) is what's
    * pinned. BH runs entirely in log space: reject p_k ≤ k·q/m  ⟺
    * nl2p_k ≥ lg64(m) − lg64(k) + lg64(5)  (q = 0.2), and the step-up
    * ADJUSTED p is the suffix max of nl2p − lg64(m) + lg64(rank)
    * (min of m·p_j/j over j ≥ rank), floored at 0 (p ≤ 1). On this
    * null corpus BH rejects nothing — exactly the behavior that
    * separates it from the naive rule; the gate pins the adjusted
    * p-value trajectory, not just the flags.
    *
    * Scale shape: the corpus contributes ONE conditional-agg scan; the
    * hypothesis table is entity-bounded (one row per user), so the
    * global rank window and suffix max run over bounded state. */
  val qBhFdr = GQuery("q_bh_fdr",
    (s, d) => {
      val hi = col("value") > 35.0
      val m0 = Tables.events(s, d).groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") < lit(cut), 1L).otherwise(0L)).as("nb"),
          sum(when(col("ts") >= lit(cut), 1L).otherwise(0L)).as("na"),
          sum(when(col("ts") < lit(cut) && hi, 1L).otherwise(0L))
            .as("kb"),
          sum(when(col("ts") >= lit(cut) && hi, 1L).otherwise(0L))
            .as("ka"))
        .filter(col("nb") > 0L && col("na") > 0L &&
          col("kb") + col("ka") > 0L &&
          col("kb") + col("ka") < col("nb") + col("na"))
      val z = m0.select(col("user_id"), col("nb"), col("na"),
        col("kb"), col("ka"),
        expr("""cast(
            cast(kb*na - ka*nb as decimal(38,0))
              * cast(kb*na - ka*nb as decimal(38,0))
              * (nb + na) * 1000000
            div (cast(nb as decimal(38,0)) * na
              * (kb + ka) * (nb + na - kb - ka))
          as bigint)""").as("z2_ppm"))
        .withColumn("nl2p_x64",
          greatest(lit(0L), expr("z2_ppm * 64 div 1386294 - 64")))
      val rkW = Window.orderBy(desc("nl2p_x64"), asc("user_id"))
      val allW = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val sufW = Window.orderBy(col("rk"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      z.withColumn("rk", row_number().over(rkW).cast("long"))
        .withColumn("m", count(lit(1)).over(allW))
        .withColumn("c_x64", col("nl2p_x64") -
          NaiveBayes.lg64(col("m")) + NaiveBayes.lg64(col("rk")))
        .withColumn("nl2padj_x64",
          greatest(lit(0L), max(col("c_x64")).over(sufW)))
        .withColumn("reject",
          (col("nl2padj_x64") >= lit(NaiveBayes.lg64Long(5L)))
            .cast("long"))
        .filter(col("rk") <= 50L)
        .select(col("rk"), col("user_id"), col("nb"), col("na"),
          col("kb"), col("ka"), col("z2_ppm"), col("nl2p_x64"),
          col("nl2padj_x64"), col("reject"))
        .orderBy(col("rk"))
    },
    Some(s"""WITH m0 AS (
        SELECT user_id,
          SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            AS nb,
          SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
            AS na,
          SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' AND value > 35
            THEN 1 ELSE 0 END) AS kb,
          SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' AND value > 35
            THEN 1 ELSE 0 END) AS ka
        FROM events GROUP BY user_id),
      t AS (SELECT * FROM m0
        WHERE nb > 0 AND na > 0 AND kb + ka > 0 AND kb + ka < nb + na),
      z AS (SELECT user_id, nb, na, kb, ka,
          CAST(CAST(kb*na - ka*nb AS HUGEINT)
              * CAST(kb*na - ka*nb AS HUGEINT)
              * (nb + na) * 1000000
            // (CAST(nb AS HUGEINT) * na
              * (kb + ka) * (nb + na - kb - ka)) AS BIGINT) AS z2_ppm
        FROM t),
      p AS (SELECT *, greatest(0, z2_ppm * 64 // 1386294 - 64)
          AS nl2p_x64 FROM z),
      ranked AS (SELECT *,
          ROW_NUMBER() OVER (ORDER BY nl2p_x64 DESC, user_id) AS rk,
          COUNT(*) OVER () AS m
        FROM p),
      ${NaiveBayes.sqlLg64Chain("ranked", "rk",
        Seq("user_id", "nb", "na", "kb", "ka", "z2_ppm", "nl2p_x64",
          "rk", "m"), "lgr", "lgrk")},
      ${NaiveBayes.sqlLg64Chain("lgr", "m",
        Seq("user_id", "nb", "na", "kb", "ka", "z2_ppm", "nl2p_x64",
          "rk", "m", "lgrk"), "lgm", "lgmv")},
      c AS (SELECT *, nl2p_x64 - lgmv + lgrk AS c_x64 FROM lgm),
      adj AS (SELECT *, greatest(0, MAX(c_x64) OVER (ORDER BY rk
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
          AS nl2padj_x64
        FROM c)
      SELECT CAST(rk AS BIGINT) AS rk, user_id,
        CAST(nb AS BIGINT) AS nb, CAST(na AS BIGINT) AS na,
        CAST(kb AS BIGINT) AS kb, CAST(ka AS BIGINT) AS ka,
        z2_ppm, CAST(nl2p_x64 AS BIGINT) AS nl2p_x64,
        CAST(nl2padj_x64 AS BIGINT) AS nl2padj_x64,
        CAST(CASE WHEN nl2padj_x64 >= ${NaiveBayes.lg64Long(5L)}
          THEN 1 ELSE 0 END AS BIGINT) AS reject
      FROM adj WHERE rk <= 50 ORDER BY rk"""),
    notes = "BH step-up in lg64 log space over exact rational z^2; " +
      "sub-Gaussian tail p-bounds, suffix-max adjusted p, q=0.2; " +
      "entity-bounded hypothesis table after one corpus scan")

  /** SPLIT-CONFORMAL PREDICTION INTERVAL for customer spend predicted
    * from account balance — the distribution-free coverage guarantee
    * (Vovk; Lei et al.) model-evaluation pipelines attach to ANY point
    * predictor: fit on a train split, take q̂ = the
    * ⌈(n_cal+1)(1−α)⌉-th smallest absolute calibration residual, and
    * |y−ŷ| ≤ q̂ then covers ≥ 1−α of exchangeable test points.
    *
    * Exactness: the OLS fit stays RATIONAL — slope Ns/Ds with
    * Ns = nΣxy−ΣxΣy, Ds = nΣx²−(Σx)² ≥ 0 — so the residual is
    * |A·y − B·x + C| / A with A = n·Ds, B = n·Ns, C = Ns·Σx − Ds·Σy:
    * ONE shared positive denominator. Residuals compare by numerator
    * alone; the engine carries r = |num| div A in cents (exact floor,
    * identical in both engines), so the calibration quantile and the
    * test coverage check are integer comparisons — no float ever
    * enters. DECIMAL(38,0)/HUGEINT products certified to ~sf10
    * (A·y < 10³⁸). α = 0.1; md5 60/20/20 split on custkey (the
    * [[Dsir.bucketOf]] convention).
    *
    * Scale shape: train moments are one agg folded to plan literals
    * (bounded-model posture); the calibration order statistic uses
    * [[Selection.exactKth]] — histogram-refinement selection, never a
    * global sort; coverage is one conditional agg. */
  val qConformal = GQuery("q_conformal",
    (s, d) => {
      val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("y"))
      val base = Tables.customer(s, d)
        .join(spend, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey").as("id"),
          floor(col("c_acctbal") * 100).cast("long").as("x"), col("y"))
        .withColumn("b", Dsir.bucketOf(
          concat(lit("conf:"), col("id").cast("string")), 10))
      val st = base.filter(col("b") < 6).agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(col("x").cast("decimal(19,0)") * col("y"))
          .cast("decimal(38,0)").as("sxy"),
        sum(col("x").cast("decimal(19,0)") * col("x"))
          .cast("decimal(38,0)").as("sx2")).collect()(0)
      def big(i: Int): BigInt = st.getDecimal(i).toBigInteger
      val (n, sx, sy, sxy, sx2) = (big(0), big(1), big(2), big(3), big(4))
      val ns = n * sxy - sx * sy
      val ds = n * sx2 - sx * sx
      val (a, bb, cc) = (n * ds, n * ns, ns * sx - ds * sy)
      val res = base.withColumn("r", expr(
        s"""cast(abs(cast('$a' as decimal(38,0)) * y
             - cast('$bb' as decimal(38,0)) * x
             + cast('$cc' as decimal(38,0)))
           div cast('$a' as decimal(38,0)) as bigint)"""))
      val cal = res.filter(col("b").isin(6L, 7L))
      val nCal = cal.count()
      val k = (9L * (nCal + 1L) + 9L) / 10L
      val qhat = Selection.exactKth(cal, "r", k)
      val nTrain = n.toLong
      res.filter(col("b") >= 8L)
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("r") <= qhat, 1L).otherwise(0L)).as("covered"))
        .select(lit(nTrain).as("n_train"), lit(nCal).as("n_cal"),
          lit(k).as("k_rank"), lit(qhat).as("qhat_cents"),
          col("n_test"), col("covered"),
          expr("covered * 1000000 div n_test").as("coverage_ppm"))
    },
    Some("""WITH spend AS (
        SELECT o_custkey,
          SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS y
        FROM orders GROUP BY 1),
      base AS (
        SELECT c_custkey AS id,
          CAST(floor(c_acctbal * 100) AS BIGINT) AS x, y,
          ((CASE WHEN ascii(substr(md5('conf:' ||
              CAST(c_custkey AS VARCHAR)), 1, 1)) >= 97
            THEN ascii(substr(md5('conf:' ||
              CAST(c_custkey AS VARCHAR)), 1, 1)) - 87
            ELSE ascii(substr(md5('conf:' ||
              CAST(c_custkey AS VARCHAR)), 1, 1)) - 48 END) * 16
          + (CASE WHEN ascii(substr(md5('conf:' ||
              CAST(c_custkey AS VARCHAR)), 2, 1)) >= 97
            THEN ascii(substr(md5('conf:' ||
              CAST(c_custkey AS VARCHAR)), 2, 1)) - 87
            ELSE ascii(substr(md5('conf:' ||
              CAST(c_custkey AS VARCHAR)), 2, 1)) - 48 END)) % 10 AS b
        FROM customer JOIN spend ON c_custkey = o_custkey),
      st AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
          CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
          SUM(CAST(x AS HUGEINT) * y) AS sxy,
          SUM(CAST(x AS HUGEINT) * x) AS sx2
        FROM base WHERE b < 6),
      co AS (SELECT n, n * (n*sx2 - sx*sx) AS a,
          n * (n*sxy - sx*sy) AS bb,
          (n*sxy - sx*sy) * sx - (n*sx2 - sx*sx) * sy AS cc
        FROM st),
      res AS (SELECT id, b,
          CAST(abs(a*y - bb*x + cc) // a AS BIGINT) AS r
        FROM base, co),
      cal AS (SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn,
          COUNT(*) OVER () AS ncal
        FROM res WHERE b IN (6, 7)),
      kq AS (SELECT ncal, rn, r FROM cal
        WHERE rn = (9 * (ncal + 1) + 9) // 10),
      cov AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
          CAST(SUM(CASE WHEN r <= (SELECT r FROM kq) THEN 1 ELSE 0 END)
            AS BIGINT) AS covered
        FROM res WHERE b >= 8)
      SELECT (SELECT CAST(n AS BIGINT) FROM co) AS n_train,
        (SELECT CAST(MAX(ncal) AS BIGINT) FROM cal) AS n_cal,
        (SELECT CAST(rn AS BIGINT) FROM kq) AS k_rank,
        (SELECT CAST(r AS BIGINT) FROM kq) AS qhat_cents,
        n_test, covered,
        covered * 1000000 // n_test AS coverage_ppm
      FROM cov"""),
    notes = "split conformal with rational residuals over one shared " +
      "integer denominator; exactKth histogram selection for the " +
      "calibration quantile, integer coverage check, alpha=0.1")

  /** COHEN'S KAPPA — chance-corrected inter-annotator agreement, the
    * number every labeling/RLHF pipeline reports before trusting its
    * annotations. Here the two "annotators" are deterministic quality
    * heuristics over the same documents (type-token ratio ≥ 500‰ vs
    * mean word length ≥ 4.5 chars), so the gate is self-contained and
    * the 2×2 confusion is exactly reproducible.
    *
    * κ = (p_o − p_e)/(1 − p_e) cleared to one integer rational:
    * κ·10⁶ = (N·(n00+n11) − r0·c0 − r1·c1)·10⁶ / (N² − r0·c0 − r1·c1),
    * computed in DECIMAL(38,0)/HUGEINT with the sign-split division
    * (κ can be negative). One corpus scan to the 2×2; everything after
    * is constant-size arithmetic. */
  val qCohenKappa = GQuery("q_cohen_kappa",
    (s, d) => {
      val words = filter(split(lower(trim(col("text"))), "\\s+"),
        t => t =!= lit(""))
      val cell = Tables.documents(s, d)
        .select(words.as("w")).filter(size(col("w")) > 0)
        .select(
          (expr("size(array_distinct(w)) * 1000L div size(w)") >= 500L)
            .as("a"),
          (expr("aggregate(w, 0L, (acc, t) -> acc + length(t)) * 10L" +
            " div size(w)") >= 45L).as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      cell.agg(
          sum(col("c")).as("n"),
          sum(when(col("a") && col("b"), col("c")).otherwise(0L))
            .as("n11"),
          sum(when(col("a") && !col("b"), col("c")).otherwise(0L))
            .as("n10"),
          sum(when(!col("a") && col("b"), col("c")).otherwise(0L))
            .as("n01"),
          sum(when(!col("a") && !col("b"), col("c")).otherwise(0L))
            .as("n00"))
        .select(col("n"), col("n00"), col("n01"), col("n10"), col("n11"),
          expr("""cast((n11 + n10) * 1000000 div n as bigint)""")
            .as("p_a_ppm"),
          expr("""cast((n11 + n01) * 1000000 div n as bigint)""")
            .as("p_b_ppm"),
          expr("""cast(
            (case when cast(n as decimal(38,0)) * (n00 + n11)
                - (n10 + n11) * cast(n01 + n11 as decimal(38,0))
                - (n00 + n01) * cast(n00 + n10 as decimal(38,0)) < 0
              then -1 else 1 end)
            * ((abs(cast(n as decimal(38,0)) * (n00 + n11)
                - (n10 + n11) * cast(n01 + n11 as decimal(38,0))
                - (n00 + n01) * cast(n00 + n10 as decimal(38,0)))
                * 1000000)
              div (cast(n as decimal(38,0)) * n
                - (n10 + n11) * cast(n01 + n11 as decimal(38,0))
                - (n00 + n01) * cast(n00 + n10 as decimal(38,0))))
            as bigint)""").as("kappa_ppm"))
    },
    Some("""WITH w AS (
        SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'),
          t -> len(t) > 0) AS l
        FROM documents),
      s AS (SELECT
          (len(list_distinct(l)) * 1000 // len(l) >= 500) AS a,
          (list_sum(list_transform(l, t -> len(t))) * 10 // len(l)
            >= 45) AS b
        FROM w WHERE len(l) > 0),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
            AS n11,
          CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
            AS n10,
          CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
            AS n01,
          CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
            AS BIGINT) AS n00
        FROM s),
      k AS (SELECT *,
          CAST(n AS HUGEINT) * (n00 + n11)
            - (n10 + n11) * CAST(n01 + n11 AS HUGEINT)
            - (n00 + n01) * CAST(n00 + n10 AS HUGEINT) AS num,
          CAST(n AS HUGEINT) * n
            - (n10 + n11) * CAST(n01 + n11 AS HUGEINT)
            - (n00 + n01) * CAST(n00 + n10 AS HUGEINT) AS den
        FROM m)
      SELECT n, n00, n01, n10, n11,
        CAST((n11 + n10) * 1000000 // n AS BIGINT) AS p_a_ppm,
        CAST((n11 + n01) * 1000000 // n AS BIGINT) AS p_b_ppm,
        CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
          * ((abs(num) * 1000000) // den) AS BIGINT) AS kappa_ppm
      FROM k"""),
    notes = "chance-corrected 2x2 agreement as one integer rational; " +
      "sign-split division, one corpus scan to the confusion table")

  /** POISSON BOOTSTRAP — the distributed bootstrap (Chamandy et al.,
    * Google 2012): instead of resampling n rows with replacement
    * (impossible without a global pass), each (row, replicate) draws an
    * INDEPENDENT Poisson(1) weight, which converges to multinomial
    * resampling at corpus scale and needs only a map over the data.
    * Here the draw is md5-deterministic: u = 48-bit fold of
    * md5("pb:" + b + ":" + event_id), weight = #{k : u ≥ T_k} with
    * T_k = ⌊cdf_Poisson(1)(k)·2⁴⁸⌋ embedded as shared integer literals
    * (both engines walk the SAME inverse-CDF table, so every draw is
    * reproducible bit-for-bit on any layout — the property RNG-state
    * bootstraps lose the moment partitioning changes).
    *
    * Gate: B = 64 replicate estimates of the mean event value in cents
    * (exact integer Σw·cents div Σw per replicate) — the full replicate
    * table IS the output, pinning every draw; CI quantiles are order
    * statistics the caller reads off it. Scale: the ×B row fan-out is
    * the method's true cost; per-replicate map-side partials collapse
    * the shuffle to B·partitions rows. */
  val qBootstrap = GQuery("q_bootstrap",
    (s, d) => {
      // floor(cdf * 2^48) for Poisson(1), k = 0..7 (authoring-time
      // constants; P(w > 8) ~ 1e-6 truncated identically in both engines)
      val thresholds = Seq(103548857136060L, 207097714272121L,
        258872142840152L, 276130285696162L, 280444821410164L,
        281307728552965L, 281451546410098L, 281472091818260L)
      def hexVal(c: org.apache.spark.sql.Column) =
        when(c >= 97, c - 87).otherwise(c - 48)
      val hh = md5(concat(lit("pb:"), col("b").cast("string"),
        lit(":"), col("event_id").cast("string")))
      val u = (1 to 12).map { j =>
        hexVal(ascii(substring(hh, j, 1))).cast("long") *
          lit(BigInt(16).pow(12 - j).toLong)
      }.reduce(_ + _)
      // CASE chain, not a filter() HOF: higher-order functions drop the
      // whole projection to interpreted eval, re-running the 12-nibble
      // md5 fold per array element (measured minutes vs seconds at sf0.1)
      val w = thresholds.zipWithIndex.tail
        .foldLeft(when(col("u") < lit(thresholds.head), 0L)) {
          case (acc, (t, k)) => acc.when(col("u") < lit(t), k.toLong)
        }.otherwise(thresholds.size.toLong)
      Tables.events(s, d)
        .select(col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
        .withColumn("b", explode(typedLit((0 until 64).map(_.toLong))))
        .withColumn("u", u)
        .withColumn("w", w)
        .groupBy(col("b"))
        .agg(sum(col("w")).as("n_eff"),
          sum(col("w") * col("cents")).as("wsum"))
        .select(col("b"), col("n_eff"),
          expr("cast(wsum div n_eff as bigint)").as("est_cents"))
        .orderBy(col("b"))
    },
    Some {
      def hv(i: Int) =
        s"""(CASE WHEN ascii(substr(hh, $i, 1)) >= 97
           THEN ascii(substr(hh, $i, 1)) - 87
           ELSE ascii(substr(hh, $i, 1)) - 48 END)"""
      val fold = (1 to 12)
        .map(i => s"CAST(${hv(i)} AS BIGINT) * ${BigInt(16).pow(12 - i).toLong}")
        .mkString(" + ")
      val ts = Seq(103548857136060L, 207097714272121L, 258872142840152L,
        276130285696162L, 280444821410164L, 281307728552965L,
        281451546410098L, 281472091818260L)
      val caseW = ts.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN $k" }
        .mkString(" ") + s" ELSE ${ts.size}"
      s"""WITH reps AS (
        SELECT e.event_id,
          CAST(floor(e.value * 100) AS BIGINT) AS cents,
          CAST(t.r AS BIGINT) AS b,
          md5('pb:' || CAST(t.r AS VARCHAR) || ':'
            || CAST(e.event_id AS VARCHAR)) AS hh
        FROM events e CROSS JOIN range(0, 64) t(r)),
      us AS (SELECT b, cents, ($fold) AS u FROM reps),
      wts AS (SELECT b, cents, CASE $caseW END AS w FROM us)
      SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff,
        CAST(CAST(SUM(w * cents) AS HUGEINT) // SUM(w) AS BIGINT)
          AS est_cents
      FROM wts GROUP BY b ORDER BY b"""
    },
    notes = "md5-deterministic Poisson(1) bootstrap over a shared " +
      "integer inverse-CDF table; 64 replicate means pinned exactly, " +
      "bit-reproducible on any partitioning")

  val all: Seq[GQuery] = Seq(qBhFdr, qConformal, qCohenKappa, qBootstrap)
}
