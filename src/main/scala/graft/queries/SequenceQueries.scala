package graft.queries

import graft.Tables
import graft.operators.NaiveBayes
import org.apache.spark.sql.functions._

/** Event-sequence analytics beyond windows: CEP-style pattern counting
  * over rendered per-entity sequences, and the conditional entropy rate
  * of the event-type Markov chain — the "how structured is this stream"
  * pair a behavioral pipeline reports next to funnels and transition
  * matrices.
  *
  * Determinism contract: sequences render under the (ts, event_id)
  * total order (event_id unique); the pattern stays inside the regex
  * subset where Java's engine (Spark) and RE2 (DuckDB) agree — literal
  * classes and greedy `*`/`+` with non-overlapping leftmost scan;
  * entropies ride the shared lg64 fixed-point log.
  */
object SequenceQueries {

  /** CEP PATTERN COUNT — MATCH_RECOGNIZE-lite: per user, render the
    * ordered event-type initials (c v s p e) into one sequence string
    * and count non-overlapping `cv*p` episodes — "click, any views,
    * purchase", the browse-then-buy pattern a funnel can't express
    * (funnels fix a step list; the regex quantifier admits variable-
    * length middles). One user-keyed exchange; the in-array sort is
    * conversation-bounded, the regex runs map-side on the bounded
    * rendered string. */
  val qCepPattern = GQuery("q_cep_pattern",
    (s, d) => Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ch"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(expr("""transform(
            array_sort(collect_list(struct(ts, event_id, ch))),
            x -> x.ch)"""), "").as("seq"))
      .select(col("user_id"), col("n_events"),
        regexp_count(col("seq"), lit("cv*p")).cast("long")
          .as("n_episodes"),
        (regexp_count(col("seq"), lit("cv*p")) > 0).cast("long")
          .as("converted"))
      .orderBy(col("user_id")),
    Some("""WITH t AS (
        SELECT user_id, ts, event_id,
          substr(event_type, 1, 1) AS ch
        FROM events),
      seqs AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
          string_agg(ch, '' ORDER BY ts, event_id) AS seq
        FROM t GROUP BY user_id)
      SELECT user_id, n_events,
        CAST(len(regexp_extract_all(seq, 'cv*p')) AS BIGINT)
          AS n_episodes,
        CAST(CASE WHEN len(regexp_extract_all(seq, 'cv*p')) > 0
          THEN 1 ELSE 0 END AS BIGINT) AS converted
      FROM seqs ORDER BY user_id"""),
    notes = "regex episode counting over (ts, event_id)-ordered " +
      "initials; non-overlapping leftmost scan agrees across engines " +
      "on the class+quantifier subset")

  /** CONDITIONAL ENTROPY RATE H(next|prev) of the event-type chain,
    * with the zeroth-order H(next) and the information gain
    * H(next) − H(next|prev) — how much the previous event type tells
    * you about the next one (0 gain = memoryless stream; the Markov
    * structure monitor next to q_transition_matrix's raw
    * probabilities). Exact fixed point:
    *   H(next|prev)·C·64 = Σ_ij c_ij·(lg64(c_i) − lg64(c_ij))
    *   H(next)·C·64      = Σ_j  c_j ·(lg64(C)   − lg64(c_j))
    * over transition counts c_ij (LAG pairs per user), in milli-bits
    * via ·1000 div (64·C). Transition table is type²-bounded; one
    * corpus window pass. */
  val qEntropyRate = GQuery("q_entropy_rate",
    (s, d) => {
      import NaiveBayes.lg64
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("nxt"))
        .withColumn("prv", lag(col("nxt"), 1).over(w))
        .filter(col("prv").isNotNull)
      // type^2-bounded; checkpoint so ci/cj/tot derive from ONE corpus
      // window pass instead of re-running it per branch
      val cij = pairs.groupBy(col("prv"), col("nxt"))
        .agg(count(lit(1)).as("c_ij"))
        .localCheckpoint(true)
      val ci = cij.groupBy(col("prv")).agg(sum(col("c_ij")).as("c_i"))
      val cj = cij.groupBy(col("nxt")).agg(sum(col("c_ij")).as("c_j"))
      val tot = cij.agg(sum(col("c_ij")).as("c"))
      val hCond = cij.join(broadcast(ci), Seq("prv"))
        .select((col("c_ij") * (lg64(col("c_i")) - lg64(col("c_ij"))))
          .as("t"))
        .agg(sum(col("t")).as("hc"))
      val hMarg = cj.crossJoin(broadcast(tot))
        .select((col("c_j") * (lg64(col("c")) - lg64(col("c_j"))))
          .as("t"), col("c"))
        .groupBy(col("c")).agg(sum(col("t")).as("hm"))
      hMarg.crossJoin(broadcast(hCond))
        .select(col("c").as("n_transitions"),
          expr("cast(hm * 1000 div (64 * c) as bigint)")
            .as("h_next_milli"),
          expr("cast(hc * 1000 div (64 * c) as bigint)")
            .as("h_cond_milli"),
          expr("""cast(hm * 1000 div (64 * c)
            - hc * 1000 div (64 * c) as bigint)""").as("gain_milli"))
    },
    Some(s"""WITH pairs AS (
        SELECT LAG(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prv,
          event_type AS nxt
        FROM events),
      cij AS (SELECT prv, nxt, CAST(COUNT(*) AS BIGINT) AS c_ij
        FROM pairs WHERE prv IS NOT NULL GROUP BY 1, 2),
      ci AS (SELECT prv, CAST(SUM(c_ij) AS BIGINT) AS c_i
        FROM cij GROUP BY 1),
      cj AS (SELECT nxt, CAST(SUM(c_ij) AS BIGINT) AS c_j
        FROM cij GROUP BY 1),
      tot AS (SELECT CAST(SUM(c_ij) AS BIGINT) AS c FROM cij),
      jc AS (SELECT prv, nxt, c_ij, c_i FROM cij JOIN ci USING (prv)),
      ${NaiveBayes.sqlLg64Chain("jc", "c_i",
        Seq("prv", "nxt", "c_ij", "c_i"), "hc1", "lgci")},
      ${NaiveBayes.sqlLg64Chain("hc1", "c_ij",
        Seq("prv", "nxt", "c_ij", "c_i", "lgci"), "hc2", "lgcij")},
      hcond AS (SELECT SUM(c_ij * (lgci - lgcij)) AS hc FROM hc2),
      ju AS (SELECT nxt, c_j, c FROM cj, tot),
      ${NaiveBayes.sqlLg64Chain("ju", "c",
        Seq("nxt", "c_j", "c"), "hm1", "lgc")},
      ${NaiveBayes.sqlLg64Chain("hm1", "c_j",
        Seq("nxt", "c_j", "c", "lgc"), "hm2", "lgcj")},
      hmarg AS (SELECT MAX(c) AS c, SUM(c_j * (lgc - lgcj)) AS hm
        FROM hm2)
      SELECT CAST(c AS BIGINT) AS n_transitions,
        CAST(hm * 1000 // (64 * c) AS BIGINT) AS h_next_milli,
        CAST(hc * 1000 // (64 * c) AS BIGINT) AS h_cond_milli,
        CAST(hm * 1000 // (64 * c) - hc * 1000 // (64 * c) AS BIGINT)
          AS gain_milli
      FROM hmarg, hcond"""),
    notes = "H(next), H(next|prev), and the information gain in exact " +
      "lg64 milli-bits; type^2-bounded transition table, one window pass")

  /** KAPLAN–MEIER SURVIVAL with right censoring — the product-limit
    * estimator churn/conversion analytics runs when outcomes are only
    * PARTIALLY observed (the thing a plain conversion rate gets wrong:
    * users who haven't converted YET are censored evidence, not
    * failures). Duration = full elapsed hours from a user's first
    * event to their first purchase; administratively censored at 48 h
    * (no purchase, or purchase later, counts as alive-at-48).
    *
    * Exact arithmetic: at-risk n_t = reverse-cumulative (d+c) over the
    * bounded event-time table; the survival curve lives in lg64 LOG
    * space — lgS(t) = Σ_{s≤t, d>0} (lg64(n_s−d_s) − lg64(n_s)), the
    * product-limit as an exact integer sum (each row also carries n, d,
    * c, so the exact rational Π(n−d)/n is reconstructible). If ever
    * n_s = d_s the curve hits 0: the term takes the −10⁷ sentinel
    * (documented; censoring keeps it unreachable here).
    *
    * Scale shape: one corpus scan to per-user (first event, first
    * purchase) — entity-bounded; everything after runs on the ≤49-row
    * event-time table (windows + 1-row totals). */
  val qKaplanMeier = GQuery("q_kaplan_meier",
    (s, d) => {
      import NaiveBayes.lg64
      val ev = Tables.events(s, d)
      val firsts = ev.groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("f"),
          min(when(col("event_type") === "purchase",
            unix_micros(col("ts")))).as("p"))
        .select(col("user_id"),
          expr("(p - f) div 3600000000").as("h"))
      val obs = firsts.select(
        when(col("h").isNotNull && col("h") <= 48L, col("h"))
          .otherwise(lit(48L)).as("t"),
        when(col("h").isNotNull && col("h") <= 48L, 1L).otherwise(0L)
          .as("died"))
      val byT = obs.groupBy(col("t"))
        .agg(sum(col("died")).as("d"),
          sum(lit(1L) - col("died")).as("c"))
      val rev = org.apache.spark.sql.expressions.Window
        .orderBy(col("t"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      val fwd = org.apache.spark.sql.expressions.Window
        .orderBy(col("t"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      byT
        .withColumn("n_risk", sum(col("d") + col("c")).over(rev))
        .withColumn("term",
          when(col("d") === 0L, 0L)
            .when(col("n_risk") === col("d"), lit(-10000000L))
            .otherwise(lg64(greatest(col("n_risk") - col("d"), lit(1L)))
              - lg64(col("n_risk"))))
        .withColumn("lgs_x64", sum(col("term")).over(fwd))
        .select(col("t").as("t_hours"), col("n_risk"), col("d"),
          col("c"), col("lgs_x64"))
        .orderBy(col("t_hours"))
    },
    Some(s"""WITH firsts AS (
        SELECT user_id,
          (min(CASE WHEN event_type = 'purchase'
              THEN epoch_us(ts) END)
            - min(epoch_us(ts))) // 3600000000 AS h
        FROM events GROUP BY user_id),
      obs AS (SELECT
          CASE WHEN h IS NOT NULL AND h <= 48 THEN h ELSE 48 END AS t,
          CASE WHEN h IS NOT NULL AND h <= 48 THEN 1 ELSE 0 END AS died
        FROM firsts),
      byt AS (SELECT t, CAST(SUM(died) AS BIGINT) AS d,
          CAST(SUM(1 - died) AS BIGINT) AS c
        FROM obs GROUP BY 1),
      risk AS (SELECT t, d, c,
          CAST(SUM(d + c) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
            AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        FROM byt),
      g AS (SELECT t, d, c, n_risk,
          greatest(n_risk - d, 1) AS nd FROM risk),
      ${NaiveBayes.sqlLg64Chain("g", "nd",
        Seq("t", "d", "c", "n_risk"), "k1", "lgnd")},
      ${NaiveBayes.sqlLg64Chain("k1", "n_risk",
        Seq("t", "d", "c", "n_risk", "lgnd"), "k2", "lgn")},
      terms AS (SELECT t, d, c, n_risk,
          CASE WHEN d = 0 THEN 0
            WHEN n_risk = d THEN -10000000
            ELSE lgnd - lgn END AS term
        FROM k2)
      SELECT t AS t_hours, n_risk, d, c,
        CAST(SUM(term) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
          PRECEDING AND CURRENT ROW) AS BIGINT) AS lgs_x64
      FROM terms ORDER BY t_hours"""),
    notes = "product-limit survival in exact lg64 log space; " +
      "right-censored at 48 h, reverse-cumsum at-risk counts, " +
      "entity-bounded then <=49-row curve table")

  val all: Seq[GQuery] = Seq(qCepPattern, qEntropyRate, qKaplanMeier)
}
