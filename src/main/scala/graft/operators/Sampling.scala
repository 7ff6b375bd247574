package graft.operators

import graft.functions.TextFeatures
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling and batch-packing operators for training-data pipelines:
  * the steps between curation and the trainer — draw a reproducible sample,
  * mix sources at chosen rates, pack documents into token-budget chunks.
  */
object Sampling {

  /** Deterministic keep-decision for ~`permille`/1000 of rows, stable across
    * engines, runs, partitionings, and cluster sizes: the decision is a pure
    * function of the row KEY (md5 hex prefix compared against a hex
    * threshold — lowercase-hex string comparison is identical in every
    * engine, so a DuckDB twin reproduces the exact sample). `salt` decorates
    * the key so independent samples of the same corpus don't correlate.
    *
    * This is what `RAND() < p` can never give a pipeline: re-runs select THE
    * SAME rows (resumable jobs, reproducible ablations), and adding
    * executors doesn't change the sample. 4 hex digits → rate granularity
    * 1/65536 ≈ 0.0015%%. */
  def keepHash(key: Column, permille: Int, salt: String): Column = {
    require(permille >= 0 && permille <= 1000, "permille in [0, 1000]")
    if (permille == 1000) lit(true) // 0x10000 overflows the 4-digit compare
    else {
      val threshold = (65536L * permille / 1000).toInt
      val hex = f"$threshold%04x"
      substring(md5(concat(lit(salt), lit(":"), key.cast("string"))), 1, 4) <
        lit(hex)
    }
  }

  /** Reproducible ~`permille`/1000 sample of `df` keyed on `idCol`. Pure
    * map-side filter — no shuffle, pushdown-compatible. */
  def deterministicSample(df: DataFrame, idCol: String, permille: Int,
      salt: String = "graft"): DataFrame =
    df.filter(keepHash(col(idCol), permille, salt))

  /** SOURCE MIXING: per-stratum deterministic sampling rates — the
    * "20% of web, 100% of books, 50% of code" recipe every LLM data mix
    * encodes. `rates` maps stratum value → permille; strata absent from the
    * map keep `defaultPermille`. Still a pure map-side filter: the rate
    * lookup folds into a CASE expression (no config join, no shuffle). */
  def mixSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], defaultPermille: Int,
      salt: String = "graft"): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, permille)) =>
        when(col(stratumCol) === stratum, lit(permille)).otherwise(acc)
    }
    // threshold hex computed per-row from the rate CASE: 4-digit zero-padded
    // (floor-div via floor(): Spark's `/` is double division; these
    // magnitudes are exact in double). permille=1000 keeps ALL rows — its
    // 0x10000 threshold has 5 digits and would break the 4-char compare.
    val threshold =
      lower(lpad(hex(floor(rateCol.cast("long") * 65536L / 1000L)), 4, "0"))
    df.filter(rateCol >= 1000 ||
      substring(md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))),
        1, 4) < threshold)
  }

  /** DETERMINISTIC TRAIN/VAL/TEST SPLIT: every row is assigned a named
    * split from md5-bucket ranges over its key. Permilles must sum to 1000,
    * so the assignment is a PARTITION of the corpus — no row lost or
    * doubled — and, like [[keepHash]], it is stable across engines, runs,
    * partitionings, and cluster sizes (what `RAND()` splits can never give:
    * a doc can NEVER migrate from test into train on a re-run, which is
    * eval contamination). Pure map-side CASE over hex-string thresholds —
    * no shuffle, twin-replayable. */
  def splitAssign(df: DataFrame, idCol: String, splits: Seq[(String, Int)],
      salt: String = "graft"): DataFrame = {
    require(splits.size >= 2 && splits.map(_._2).sum == 1000,
      "split permilles must sum to 1000")
    val hexKey = substring(
      md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))), 1, 4)
    val thresholds = splits.scanLeft(0)(_ + _._2).tail.init
      .map(p => f"${(65536L * p / 1000).toInt}%04x")
    val assign = splits.init.zip(thresholds)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), th), acc) =>
          when(hexKey < lit(th), lit(name)).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** MIXTURE PLAN (the data-mix allocator): given per-source token
    * masses T_d and RELATIVE target weights w_d, compute the largest
    * training-set size S whose composition hits the target shares
    * w_d/Σw without reading any source more than `maxEpochs` times —
    * the constraint every LLM data recipe solves before sampling
    * ("books are 5% of the mix but tiny: how big can the run be before
    * books must repeat more than E times?"). The binding source is the
    * one whose cap is hit: S = min_d (E·T_d·Σw) div w_d, then
    * alloc_d = (S·w_d) div Σw and epochs_d = alloc_d / T_d.
    *
    * All cut arithmetic is INTEGER (int64 headroom: E·T_d·Σw ≤ 2⁶³ for
    * corpora to ~10¹⁵ tokens at Σw ≤ 10³); the one double per source
    * (epochs) is a single IEEE divide — hash-exact cross-engine. The
    * downstream sampler realizes alloc_d with [[mixSample]] /
    * [[tokenBudgetFilter]]; this operator is the plan those execute.
    *
    * Scale shape: ONE map-side-combined corpus aggregation to the
    * #sources-row table; the min and Σw ride a window over that tiny
    * aggregate (the deliberately-small global window, like
    * [[ratioToReport]]'s grand total). Wire cost ∝ sources, not corpus.
    *
    * @param weightExpr integer weight column expression (evaluated
    *        against the aggregated per-source row; may reference
    *        `stratumCol`)
    */
  def mixturePlan(df: DataFrame, stratumCol: String, textCol: String,
      weightExpr: Column, maxEpochs: Long = 4L): DataFrame = {
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= lit(""))
    val perSource = df
      .select(col(stratumCol), size(toks).cast("long").as("__ntok"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__ntok")).as("n_tokens"))
      .withColumn("weight", weightExpr.cast("long"))
    val wAll = Window.partitionBy()
    perSource
      .withColumn("__sumw", sum(col("weight")).over(wAll))
      .withColumn("__cap",
        expr(s"($maxEpochs * n_tokens * __sumw) div weight"))
      .withColumn("__s", min(col("__cap")).over(wAll))
      .select(col(stratumCol), col("n_docs"), col("n_tokens"),
        col("weight"),
        expr("(__s * weight) div __sumw").as("alloc_tokens"),
        (expr("(__s * weight) div __sumw").cast("double") /
          col("n_tokens").cast("double")).as("epochs"),
        (col("__cap") === col("__s")).as("binding"))
      .orderBy(col(stratumCol))
  }

  /** LEAKAGE-SAFE SPLIT: [[splitAssign]] keyed on the NEAR-DUP CLUSTER
    * instead of the document — the split-time half of decontamination.
    * A per-doc hash split puts two near-identical documents in train and
    * test with probability 2·p·(1−p) each; evaluating on a paraphrase of
    * a training doc is silent leakage no post-hoc eval can see. Here
    * every document hashes on its component's canonical id (its own id
    * for singletons), so a whole near-dup cluster moves between splits
    * as ONE unit, by construction.
    *
    * Scale shape: component labels from [[Dedup.nearDupGroups]]
    * (shuffle ∝ PAIRS, iterations = component diameter); the label table
    * is ∝ docs-that-have-a-dup (usually a small fraction of the corpus)
    * and joins back on the id key; the split itself stays a pure
    * map-side CASE. Split sizes stay within ±(largest cluster) of the
    * target permilles — the price of atomicity, not a bug.
    *
    * @param pairs near-dup pair frame with columns (id_a, id_b)
    * @return input rows + (canonical_id, split)
    */
  def leakageSafeSplit(df: DataFrame, pairs: DataFrame, idCol: String,
      splits: Seq[(String, Int)], salt: String = "graft"): DataFrame = {
    val comp = Dedup.nearDupGroups(pairs)
      .select(col("id").as(idCol), col("label").as("__canon"))
    val canon = df.join(comp, Seq(idCol), "left")
      .withColumn("canonical_id", coalesce(col("__canon"), col(idCol)))
      .drop("__canon")
    splitAssign(canon, "canonical_id", splits, salt)
  }

  /** GLOBAL DETERMINISTIC SHUFFLE (training order): every row gets a dense
    * global rank 1..N in md5-of-key order — the reproducible "shuffle the
    * corpus before training" step. A naive `ROW_NUMBER() OVER (ORDER BY
    * md5)` sorts the world in ONE partition; instead the md5 hex prefix
    * shards the keyspace into 16^`shardHexDigits` ranges whose
    * lexicographic order IS the global order: rank within each shard
    * (bounded window), then add the shard's row offset (a ≤ 16^digits-row
    * counts table — the one deliberately-tiny global window — broadcast
    * back). Cost: one bounded-window shuffle + one broadcast join; no
    * global sort at any scale. */
  def deterministicShuffle(df: DataFrame, idCol: String,
      salt: String = "graft", shardHexDigits: Int = 2): DataFrame = {
    val keyed = df
      .withColumn("__skey",
        md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
      .withColumn("__shard", substring(col("__skey"), 1, shardHexDigits))
    val counts = keyed.groupBy(col("__shard")).agg(count(lit(1)).as("__n"))
    val wOff = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__shard"), col("__off"))
    val wIn = Window.partitionBy(col("__shard"))
      .orderBy(col("__skey"), col(idCol))
    keyed.withColumn("__r", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), Seq("__shard"))
      .withColumn("shuffle_rank", col("__off") + col("__r"))
      .drop("__skey", "__shard", "__r", "__off")
  }

  /** PER-STRATUM TOKEN BUDGET: keep the best documents of each stratum
    * until that stratum's token budget is spent — the "N tokens of code,
    * M tokens of web" selection step of a data-mix recipe. Docs are taken
    * in (`orderCol` DESC, id) order within the stratum; a doc survives iff
    * its cumulative token count stays within the budget. Window sorts
    * WITHIN the stratum partition only (the stratum is the budget unit, so
    * no global sort); adds `n_tokens` and `cum_tokens`. */
  def tokenBudgetFilter(df: DataFrame, stratumCol: String, idCol: String,
      textCol: String, orderCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(desc(orderCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", TextFeatures.tokenCount(col(textCol)).cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** TOKEN-BUDGET PACKING: assign documents to training chunks of ~`budget`
    * tokens, packing in (partition, id) order — the sequence-packing step
    * that turns a curated corpus into trainer batches. A doc belongs to the
    * chunk where its token run ENDS (`(cumsum - 1) div budget`), so chunk
    * boundaries are deterministic and every chunk holds ≥1 doc even when a
    * single doc exceeds the budget.
    *
    * Scale shape: packing is PER `partCol` (language, source, shard key) —
    * the window sorts within each partition only, never globally; at 100 TB
    * the partition key IS the batch-assembly unit (monolingual/per-source
    * batches), so no single-partition global sort ever appears. Output: one
    * row per chunk with doc count and token total. */
  def packChunks(df: DataFrame, partCol: String, idCol: String,
      textCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(partCol), col(idCol),
        TextFeatures.tokenCount(col(textCol)).cast("long").as("__ntok"))
      .withColumn("__cum", sum(col("__ntok")).over(w))
      // greatest(cum,1): a leading zero-token doc must not open chunk -1;
      // after the guard the numerator is ≥ 0, so double-div + cast == floor
      .withColumn("chunk_id",
        ((greatest(col("__cum"), lit(1L)) - 1L) / budget).cast("long"))
      .groupBy(col(partCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__ntok")).as("n_tokens"))
  }

  /** ADAPTIVE quality thresholding: keep each group's rows whose score
    * clears that GROUP'S OWN `p`-quantile — per-language/per-source
    * percentile cutoffs instead of one global constant, so a strict
    * filter on a high-resource language doesn't annihilate a low-resource
    * one. The cutoff is percentile_disc (SQL standard: the least score
    * whose cumulative distribution ≥ p) — an actual data value, no
    * interpolation arithmetic, hence engine-exact.
    *
    * Scale shape: ONE sort-based aggregate per group computes the cutoffs
    * (group-local, never a global sort), the cutoff table is broadcast
    * (bounded by |groups|), and the filter itself is map-side. At 100 TB
    * the same plan runs with approx_percentile(score, p, eps) when an
    * epsilon on the threshold is acceptable. */
  def adaptiveQualityFilter(df: DataFrame, groupCol: String,
      scoreCol: Column, p: Double): DataFrame = {
    val scored = df.withColumn("score", scoreCol)
    val cuts = scored.groupBy(col(groupCol)).agg(
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY score)").as("cutoff"))
    scored.join(broadcast(cuts), Seq(groupCol))
      .filter(col("score") >= col("cutoff"))
  }

  /** TEMPERATURE RESAMPLING (multilingual / multi-source balancing): keep
    * each stratum at rate √(n_min / n_g) — the α = 0.5 temperature recipe
    * that up-weights low-resource strata (the smallest stratum keeps
    * everything, a 100× larger one keeps 10%) without a hand-written rate
    * map. α is FIXED at 0.5 on purpose: the rate is computed with sqrt,
    * which is IEEE-correctly-rounded in every engine, where a generic
    * pow(p, α) is not — so the keep-set replays bit-exactly cross-engine.
    * The per-row decision is the same md5-threshold primitive as
    * [[keepHash]]; the rate→threshold conversion multiplies by 65536
    * (a power of two — EXACT scaling, no rounding) and floors.
    *
    * Scale shape: one partial-aggregated count per stratum (bounded
    * table), rates broadcast back, decision map-side — the corpus itself
    * never shuffles. */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
      salt: String = "temp"): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__cnt"))
    // min over an UNPARTITIONED window: the counts table is bounded by
    // |strata|, so the single-partition frame is fine and avoids the
    // 1-row cross join a scalar-aggregate join would plan (the registry
    // locks cartesians/BNLJ out)
    val rates = counts
      .withColumn("__min", min(col("__cnt")).over(Window.partitionBy()))
      .withColumn("__rate",
        sqrt(col("__min").cast("double") / col("__cnt").cast("double")))
      .select(col(stratumCol), col("__rate"))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(col("__rate") >= 1.0 ||
        substring(md5(concat(lit(salt), lit(":"),
          col(idCol).cast("string"))), 1, 4) <
          lower(lpad(hex(floor(col("__rate") * 65536.0)), 4, "0")))
      .drop("__rate")
  }

  /** SLIDING-WINDOW CHUNKING: split each document's whitespace tokens
    * into fixed-size windows with overlap (`window` tokens every `stride`
    * tokens, stride ≤ window) — the tokenize-and-chunk step that turns
    * curated documents into training sequences, with the overlap
    * preserving cross-boundary context. Output long form:
    * (doc_id, chunk_id, start, n_tokens, chunk_text); tail chunks may be
    * short (every stride offset below the token count emits), empty docs
    * emit nothing.
    *
    * Scale shape: pure map-side — tokenize, explode the stride sequence,
    * slice; no shuffle anywhere, output rows ∝ tokens/stride. */
  /** PER-SOURCE QUOTA CAP: keep at most `maxPerGroup` rows per group,
    * chosen by DETERMINISTIC md5 rank over the row key (not arrival
    * order, not RAND()) — the per-domain cap every web-scale corpus
    * applies so that no single crawl source dominates the training mix.
    * The kept subset is a pure function of (salt, key), stable across
    * engines, runs and partitionings, and UNIFORM within each group.
    *
    * Plan: one shuffle on the group key for the per-group row_number.
    * At 100 TB a pathological mega-domain makes that partition hot; the
    * mitigation is the [[keepHash]] composition — pre-thin the known
    * heavy groups with an estimated permille ≥ the cap before the exact
    * rank (false-keeps are re-cut by the rank; nothing under-counts the
    * cap) — or AQE skew-split, since the window is per-group
    * independent. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      maxPerGroup: Int, salt: String = "cap"): DataFrame = {
    val rank = row_number().over(Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))),
        col(idCol)))
    df.withColumn("__r", rank).filter(col("__r") <= maxPerGroup)
      .drop("__r")
  }

  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window")
    val toks = filter(split(col(textCol), "\\s+"),
      w => length(w) > 0)
    df.select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0),
          greatest(size(col("__toks")) - 1, lit(0)), lit(stride)))
          .as("start"))
      .withColumn("__chunk",
        slice(col("__toks"), col("start") + 1, lit(window)))
      .filter(size(col("__chunk")) > 0)
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        col("start").cast("long").as("start"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk_text"))
  }

  /** DETERMINISTIC WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis–
    * Spirakis A-Res, fixed-point): each row draws a reproducible
    * "uniform" u from the first 8 md5 hex digits of (salt, id) and is
    * ranked by the E-S key u^(1/w) — realized integer-exact as
    * MINIMIZING `priority = ⌊(2048 − lg64(u)) · 2²⁰ / w⌋` (monotone in
    * −log u / w, the log of the E-S key; [[NaiveBayes.lg64]] supplies
    * the 1/64-bit log₂). Higher weight ⇒ stochastically earlier pick,
    * heavier rows can still lose — the quality-weighted corpus
    * selection semantics plain thresholding can't give. No RNG: the
    * sample is a pure function of (salt, id, w), reproducible across
    * runs, partitionings, and engines.
    *
    * Plan: priority is a map-side projection; selection is a
    * distributed top-k (TakeOrderedAndProject) — no global sort, no
    * shuffle beyond the final ≤k rows. Weights must be ≥ 1. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "graft"): DataFrame = {
    val hex = md5(concat(lit(salt), lit(":"), col(idCol).cast("string")))
    def hv(i: Int): Column = {
      val c = ascii(substring(hex, i, 1))
      when(c >= 97, c - 87).otherwise(c - 48).cast("long")
    }
    val u = (1 to 8).map(i => hv(i) * lit(1L << (4 * (8 - i))))
      .reduce(_ + _) + lit(1L)
    // lg64 via the compact codegen'd Expression (graft.functions.Lg64Expr)
    // — this call site used to hand-stage the mantissa chain as
    // materialized columns to dodge the inlined-subtree blowup
    // (measured 11 s on 5k rows); the Expression computes the identical
    // value in one static call per row
    val staged = df
      .filter(col(weightCol) >= 1)
      .withColumn("_u", u)
      .withColumn("_l64", NaiveBayes.lg64(col("_u")))
    val ranked = staged
      .withColumn("priority",
        expr(s"((2048 - _l64) * 1048576) div $weightCol"))
      .orderBy(col("priority"), col(idCol)).limit(k)
    val w = Window.orderBy(col("priority"), col(idCol))
    ranked.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col(idCol), col(weightCol), col("priority"))
  }

  /** ITERATIVE PROPORTIONAL FITTING (raking) of 2-D sampling weights —
    * the mixture-balancing step ABOVE [[mixturePlan]]'s 1-D allocator:
    * fit per-cell weights so BOTH marginals (e.g. source share AND
    * language share) approach uniform targets simultaneously, the
    * standard survey/curation technique when the two dimensions are
    * correlated and per-dimension capping can't fix both at once.
    *
    * Algorithm (classic alternating scaling, integer fixed point):
    * w⁰_ij = n_ij · 10⁶; each scaling multiplies a row (then a column)
    * by `target·/current·` via DECIMAL(38,0) cross-multiplication with
    * truncating division (both operands non-negative ⇒ Spark `div` ≡
    * DuckDB `//`; int64 would overflow at w·target ≈ D²·10¹²). Targets
    * are the uniform marginals total/|rows| and total/|cols| of the
    * FIXED initial total. A fixed `scalings` count (row, col, row, …)
    * is deterministic and replayable as an unrolled-CTE twin; IPF
    * converges geometrically, so small fixed counts are the production
    * shape too.
    *
    * Scale posture: ONE corpus shuffle (the (row, col) count agg);
    * every scaling is a window sum over the |rows|·|cols|-bounded cell
    * table. Output: (rowv, colv, n, w) — `w` the fitted 10⁶-scaled
    * weight, keyed ascending. */
  def ipfWeights(df: DataFrame, rowCol: String, colCol: String,
      scalings: Int = 3): DataFrame = {
    require(scalings >= 1 && scalings <= 8, "scalings in [1,8]")
    val cells = df.groupBy(col(rowCol).as("rowv"), col(colCol).as("colv"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // bounded; targets and every round reuse it
    val wAll = Window.partitionBy(lit(1))
    val wr = Window.partitionBy(col("rowv"))
    val wc = Window.partitionBy(col("colv"))
    // fixed targets from the INITIAL total (classic IPF: target marginals
    // are constants; only the current marginals move between scalings)
    var w = cells
      .withColumn("_t0",
        (sum(col("n")).over(wAll) * lit(1000000L)).cast("decimal(38,0)"))
      .withColumn("_nr",
        size(collect_set(col("rowv")).over(wAll)).cast("long"))
      .withColumn("_nc",
        size(collect_set(col("colv")).over(wAll)).cast("long"))
      .withColumn("w", (col("n") * lit(1000000L)).cast("decimal(38,0)"))
    for (k <- 1 to scalings) {
      val (part, tgt) =
        if (k % 2 == 1) (wr, "_t0 div _nr") else (wc, "_t0 div _nc")
      w = w
        .withColumn("_cur", sum(col("w")).over(part))
        .withColumn("w",
          expr(s"cast((w * ($tgt)) div _cur as decimal(38,0))"))
        .drop("_cur")
    }
    w.select(col("rowv"), col("colv"), col("n"),
        col("w").cast("long").as("w"))
      .orderBy(col("rowv"), col("colv"))
  }
}
