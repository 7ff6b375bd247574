package graft.operators

import graft.functions.{Normalize, Similarity}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity-resolution cascade (enhanced_mapping.py:325-392) — 7 strategies,
  * first-above-threshold wins:
  *
  *   exact 1.0 → manual 0.95 → learned 0.9 → normalized 0.85 →
  *   substring ≥0.75 → word-Jaccard ≥0.7 (floor 0.3) → fuzzy ≥0.6
  *   (floor: similarity>0.4, match if conf≥0.3), else best fuzzy attempt.
  *
  * The reference's sequential early-exit loop becomes ONE distributed pass
  * (SURVEY.md §2.8): score every (name, candidate) pair on all strategies in
  * a single projection, take the per-strategy argmax per name with `max_by`
  * (one partial-aggregated shuffle on the name — no window sort), then pick
  * the first strategy whose max clears its threshold via a priority
  * `coalesce(when …)`. Same result as the loop; no iteration; candidate list
  * broadcast when small, with [[Similarity.lengthPrefilter]] available for
  * large-vs-large fuzzy joins.
  *
  * Tie-breaking matches the loop's "first strictly greater wins": the
  * candidate with the LOWEST `candOrder` among score ties.
  */
object EntityResolution {

  /** Strategy names in cascade priority order. */
  val strategies: Seq[String] = Seq("exact_match", "manual_mapping",
    "learned_mapping", "normalized_matching", "substring_matching",
    "word_based_matching", "fuzzy_matching")

  /** Score all strategies for one (name, cand) pair — shared by the batch
    * resolver and tests. `manualTarget`/`learnedTarget` are the mapped
    * candidate name for this left name (null when absent).
    *
    * This overload normalizes inside the pair expressions — fine for
    * per-row scoring (F11). Inside a cross join use the precomputed-column
    * overload so the 12-regexp normalizer runs per ROW, not per PAIR. */
  def pairScores(name: Column, cand: Column,
      manualTarget: Column, learnedTarget: Column): Seq[(String, Column)] =
    pairScores(name, cand, manualTarget, learnedTarget,
      Normalize.normalizeName(name), Normalize.normalizeName(cand),
      Normalize.wordSet(name), Normalize.wordSet(cand))

  /** [[pairScores]] over precomputed per-side columns: `nameNorm`/`candNorm`
    * are normalized names, `nameWords`/`candWords` their word sets —
    * computed once per row below the join. */
  def pairScores(name: Column, cand: Column,
      manualTarget: Column, learnedTarget: Column,
      nameNorm: Column, candNorm: Column,
      nameWords: Column, candWords: Column): Seq[(String, Column)] = {
    val fuzzySim = Similarity.roSimilarity(nameNorm, candNorm)
    Seq(
      "exact_match" -> when(name === cand, 1.0).otherwise(0.0),
      "manual_mapping" -> when(cand === manualTarget, 0.95).otherwise(0.0),
      "learned_mapping" -> when(cand === learnedTarget, 0.9).otherwise(0.0),
      "normalized_matching" ->
        when(nameNorm === candNorm, 0.85).otherwise(0.0),
      "substring_matching" ->
        Normalize.substringConfidenceNorm(nameNorm, candNorm),
      "word_based_matching" -> {
        val j = Normalize.jaccardOfWordSets(nameWords, candWords) * lit(0.7)
        when(j > 0.3, j).otherwise(0.0)
      },
      "fuzzy_matching" ->
        when(fuzzySim > 0.4, fuzzySim * lit(0.6)).otherwise(0.0))
  }

  /** Acceptance threshold per strategy (cascade early-exit levels). */
  val thresholds: Map[String, Double] = Map(
    "exact_match" -> 1.0, "manual_mapping" -> 0.95, "learned_mapping" -> 0.9,
    "normalized_matching" -> 0.85, "substring_matching" -> 0.75,
    "word_based_matching" -> 0.7, "fuzzy_matching" -> 0.6)

  /** Resolve each `names.nameCol` against the candidate set.
    *
    * @param names     left side; must contain `nameCol`
    * @param cands     candidate side: (`candCol`, `candOrderCol`) — order
    *                  reproduces the reference's list-iteration tie-break
    * @param manual    optional curated mapping (nameCol -> target) — F2
    * @param learned   optional learned mapping (nameCol -> target) — F3
    * @return one row per distinct name: matched_name, confidence,
    *         strategy_used, match_found
    */
  def resolve(names: DataFrame, nameCol: String,
      cands: DataFrame, candCol: String, candOrderCol: String,
      manual: Option[DataFrame] = None,
      learned: Option[DataFrame] = None,
      withAlternatives: Boolean = false): DataFrame = {
    val left = names.select(col(nameCol).as("api_name")).distinct()
    val withManual = manual match {
      case Some(m) => left.join(
        broadcast(m.select(col(nameCol).as("api_name"),
          col("target").as("__manual"))), Seq("api_name"), "left")
      case None => left.withColumn("__manual", lit(null).cast("string"))
    }
    val withLearned = learned match {
      case Some(m) => withManual.join(
        broadcast(m.select(col(nameCol).as("api_name"),
          col("target").as("__learned"))), Seq("api_name"), "left")
      case None => withManual.withColumn("__learned", lit(null).cast("string"))
    }
    // normalize + word-set ONCE PER ROW on each side, below the cross join —
    // the pair projection then reads attributes instead of re-running the
    // 12-regexp normalizer |names|×|cands| times
    val leftPrep = withLearned
      .withColumn("__na", Normalize.normalizeName(col("api_name")))
      .withColumn("__wa", Normalize.wordSetOfNorm(col("__na")))
    val candsPrep = cands.select(col(candCol).as("cand"),
        col(candOrderCol).as("cand_ord"))
      .withColumn("__nc", Normalize.normalizeName(col("cand")))
      .withColumn("__wc", Normalize.wordSetOfNorm(col("__nc")))
    val pairs = leftPrep.crossJoin(broadcast(candsPrep))

    val scored = pairScores(col("api_name"), col("cand"),
      col("__manual"), col("__learned"),
      col("__na"), col("__nc"), col("__wa"), col("__wc"))
      .foldLeft(pairs) { case (df, (s, c)) => df.withColumn(s"s_$s", c) }

    val outCols = Seq("api_name", "matched_name", "confidence",
      "strategy_used", "match_found") ++
      (if (withAlternatives) Seq("alternatives") else Nil)
    pickBest(scored, Seq("api_name"), withAlternatives)
      .select(outCols.map(col): _*)
  }

  /** Per-strategy floor above which non-best candidates are collected as
    * `alternatives` (reference semantics: substring >0.5, word >0.3, fuzzy
    * similarity>0.4 ⇒ score>0.24; the deterministic strategies collect
    * none). 2.0 = never.
    *
    * ORDER deviation (deliberate, golden-pinned in EntityResolutionSpec):
    * this engine emits runner-ups by (score desc, cand_ord asc) — a total,
    * distribution-friendly order. The reference's substring/word loops
    * (enhanced_mapping.py:514-518,545-553) emit LOOP order with a displaced
    * best appended at displacement time, which is inherently sequential;
    * its fuzzy strategy (enhanced_mapping.py:585-590) sorts by similarity
    * desc with stable ties = identical to this engine's order. */
  val alternativesFloor: Map[String, Double] = Map(
    "exact_match" -> 2.0, "manual_mapping" -> 2.0, "learned_mapping" -> 2.0,
    "normalized_matching" -> 2.0, "substring_matching" -> 0.5,
    "word_based_matching" -> 0.3, "fuzzy_matching" -> 0.24)

  /** Cascade decision over a scored pair frame: per `keyCols` group, take
    * each strategy's argmax candidate (max_by over (score, -order) — highest
    * score, earliest candidate; partial-aggregated, single shuffle), then
    * pick the first strategy clearing its threshold. Exposed separately so
    * per-fixture resolution (F11) reuses the same decision logic with
    * different grouping keys. Input needs columns: cand, cand_ord, s_<strategy>.
    *
    * @param withAlternatives also emit `alternatives`: up to 3 runner-up
    *        candidates of the chosen strategy by (score desc, order asc),
    *        above the strategy's floor. Collects candidate lists per group —
    *        use only when the candidate side is small (it is: it's the
    *        broadcast side of the resolution join). */
  def pickBest(scored: DataFrame, keyCols: Seq[String],
      withAlternatives: Boolean = false): DataFrame = {
    val baseAggs = strategies.flatMap { s =>
      Seq(
        max(col(s"s_$s")).as(s"max_$s"),
        max_by(col("cand"), struct(col(s"s_$s"), -col("cand_ord")))
          .as(s"cand_$s"))
    }
    val altAggs = if (withAlternatives) strategies.map { s =>
      // struct(-score, ord, cand): ascending struct sort = score desc, ord asc
      collect_list(struct((-col(s"s_$s")).as("nscore"),
        col("cand_ord").as("ord"), col("cand").as("cand"))).as(s"all_$s")
    } else Nil
    val aggs = baseAggs ++ altAggs
    val perKey = scored.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

    val strategyPick = coalesce(
      (strategies.map { s =>
        when(col(s"max_$s") >= thresholds(s), lit(s))
      } :+ lit("fuzzy_matching")): _*)

    val decided = perKey
      .withColumn("strategy_used", strategyPick)
      .withColumn("confidence",
        coalesce(strategies.map(s =>
          when(col("strategy_used") === s, col(s"max_$s"))): _*))
      .withColumn("matched_name",
        when(col("confidence") > 0,
          coalesce(strategies.map(s =>
            when(col("strategy_used") === s, col(s"cand_$s"))): _*)))
      // fuzzy fallback: match only when confidence >= 0.3
      .withColumn("match_found",
        when(col("strategy_used") === "fuzzy_matching",
          col("confidence") >= 0.3).otherwise(col("confidence") > 0))

    val withAlts = if (!withAlternatives) decided else decided
      .withColumn("alternatives",
        coalesce(strategies.map { s =>
          val floor = alternativesFloor(s)
          when(col("strategy_used") === s,
            slice(
              transform(
                filter(array_sort(col(s"all_$s")),
                  x => x("cand") =!= col("matched_name") &&
                    -x("nscore") > lit(floor)),
                x => x("cand")),
              1, 3))
        }: _*))

    withAlts.drop(
      (strategies.flatMap(s => Seq(s"max_$s", s"cand_$s")) ++
        (if (withAlternatives) strategies.map(s => s"all_$s") else Nil)): _*)
  }

  /** FELLEGI–SUNTER field weight pair (Fellegi & Sunter 1969; the
    * Splink-style probabilistic record-linkage scoring): for a
    * comparison field with match probability `m` and chance-agreement
    * probability `u` (both in parts-per-million), the log-likelihood
    * contribution is log(m/u) on agreement and log((1−m)/(1−u)) on
    * disagreement. Computed in lg64 fixed point (1 unit = 1/64 bit) via
    * [[NaiveBayes.lg64Long]] at PLAN TIME — the weights enter both the
    * Spark plan and the DuckDB twin as the SAME literal longs, so the
    * score column is integer-exact cross-engine. */
  def fsWeights(mPpm: Long, uPpm: Long): (Long, Long) = {
    require(mPpm > 0 && mPpm < 1000000L && uPpm > 0 && uPpm < 1000000L)
    (NaiveBayes.lg64Long(mPpm) - NaiveBayes.lg64Long(uPpm),
      NaiveBayes.lg64Long(1000000L - mPpm) -
        NaiveBayes.lg64Long(1000000L - uPpm))
  }
}
