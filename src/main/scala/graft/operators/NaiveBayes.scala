package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial NAIVE BAYES text classifier, integer-exact — the
  * classifier-based quality/language-filter step of LLM data pipelines
  * (fastText-style filters in CCNet / RefinedWeb / FineWeb lineage),
  * realized with the engine's floor-log2 discipline so training AND
  * scoring sit under the hash-exact oracle gate with no golden.
  *
  * Log-probabilities are quantized to 1/64-BIT integers with the
  * engine's fixed-point log₂ ([[lg64]]): no transcendental log crosses
  * an engine boundary (the [[graft.operators.Salience.lmSurprisal]]
  * floor-log₂ discipline, refined to 64× the resolution). Resolution
  * matters here: per-token class differences on real corpora are
  * ~0.1-0.5 bits, so whole-bit flooring (and even quarter-bit) lets the
  * floor ARTIFACT on the per-token denominator outvote the data — on
  * the test corpus it flipped the majority prediction to the
  * smallest-denominator class; at 1/64 bit (max quantization error
  * ~0.016 bits, measured exhaustively for n ≤ 5000) the integer
  * classifier reproduces float NB's accuracy exactly and agrees with
  * it on 97% of predictions.
  *
  *   score(d, c) = lg64(docs_c)
  *       + Σ_{t ∈ tokens(d)} [ lg64(cnt(t,c)+1) − lg64(tot_c + V) ]
  *
  * i.e. add-one-smoothed multinomial NB in 1/64-bit units. The argmax
  * is tie-broken on the lexicographically smallest class, so prediction
  * is fully deterministic. (On the synthetic corpus all classes share
  * one 31-token unigram pool, so NB accuracy is ~47% BY CONSTRUCTION —
  * the gate pins the exactness of the training/scoring pipeline, not
  * separability the data doesn't have.)
  *
  * Scale shape: training is ONE explode + groupBy over (class, token)
  * [corpus shuffle 1] whose OUTPUT is vocabulary×classes-bounded; class
  * totals/priors derive from the count table and the (tiny) per-class
  * doc counts — never a second corpus pass. Scoring re-explodes the
  * corpus and joins the per-token class-count MAP once on token
  * [corpus shuffle 2] (the map side is vocabulary-bounded; at 100 TB
  * the join key rides as xxhash64(token) — strings here for oracle
  * exactness), cross-joins the bounded class list, and re-aggregates
  * per (doc, class) [3]. No driver-side loops, no per-row UDF: the
  * whole score is codegen'd built-ins.
  */
object NaiveBayes {

  /** FIXED-POINT ⌊~64·log₂ n⌋ for 1 ≤ n ≤ ~2⁴⁹: integer part from the
    * binary string length, then three base-4 fraction digits by
    * tracking a 14-bit mantissa m ∈ [2¹³, 2¹⁴) and raising it to the
    * 4th power per step (m⁴ < 2⁵⁶ — never leaves int64; shifts via
    * `shiftright` so no double division touches values above 2⁵³).
    * Every operation is exact integer arithmetic with identical
    * semantics in DuckDB (`**`-free, `>>`/format-binary twin), so the
    * result is deterministic cross-engine BY CONSTRUCTION; the mantissa
    * truncation makes it an approximation of 64·log₂ n with measured
    * max error ~1 unit (0.016 bits) — the same deterministic value on
    * both engines, which is what the hash gate needs. */
  private[graft] def lg64(c: Column): Column =
    graft.functions.Lg64Expr.lg64(c)

  /** The original built-in composition of [[lg64]], kept ONLY as the
    * equivalence witness NaiveBayesSpec pins [[graft.functions.Lg64Expr]]
    * against: each mantissa step re-inlines every sub-tree (no Catalyst
    * let-binding), so two of these inside one fused stage overflow
    * Janino's 64 KB method limit — production code routes through the
    * compact Expression instead. */
  private[graft] def lg64Chain(c: Column): Column = {
    val n = c.cast("long")
    val e0 = length(bin(n)) - 1 // int: shiftright needs an int shift
    val m0 = call_function("shiftright", n * lit(8192L), e0)
    def step(m: Column): (Column, Column) = {
      val raw = m * m * m * m
      val f = length(bin(raw)) - 53
      (f, call_function("shiftright", raw, f + lit(39)))
    }
    val (f1, m1) = step(m0)
    val (f2, m2) = step(m1)
    val (f3, _) = step(m2)
    (e0 * 64 + f1 * 16 + f2 * 4 + f3).cast("long")
  }

  /** Scala twin of [[lg64]] — IDENTICAL mantissa algorithm on plain
    * longs, for generating PLAN-TIME literal weight tables (e.g. the
    * NDCG position discounts: positions are known constants, so both
    * engines can share one literal array instead of each re-deriving
    * the chain). NaiveBayesSpec pins lg64Long ≡ the Column lg64. */
  private[graft] def lg64Long(n0: Long): Long = {
    require(n0 >= 1, "lg64 domain")
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val e0 = bitlen(n0) - 1
    var m = (n0 * 8192L) >> e0
    var fs = List.empty[Long]
    for (_ <- 1 to 3) {
      val raw = m * m * m * m
      val f = bitlen(raw) - 53
      fs = fs :+ f.toLong
      m = raw >> (bitlen(raw) - 14)
    }
    e0 * 64L + fs(0) * 16L + fs(1) * 4L + fs(2)
  }

  /** DuckDB twin of [[lg64]] as a chain of CTE stages over `inCte`,
    * carrying `keep` columns and emitting `outCol` = lg64(`nExpr`).
    * The final stage is named `outCte`. Chained CTEs (not one nested
    * expression) because each stage's mantissa feeds the next stage's
    * 4th power — inlining would blow up the SQL text 6× per stage.
    *
    * Every internal column is `outCte`-prefixed: an unprefixed alias
    * (the original code used bare `n`) is silently SHADOWED by any
    * same-named `keep` column — q_kl_source's corpus total `n` made
    * all four of its chained lg64s collapse to the same value (KL ≡ 0
    * in DuckDB while Spark was right). Prefixing makes collision with
    * caller columns impossible by construction. */
  def sqlLg64Chain(inCte: String, nExpr: String, keep: Seq[String],
      outCte: String, outCol: String): String = {
    val ks = keep.mkString(", ")
    val pfx = outCte
    val (n, e0, m0, f1, m1, f2, m2) = (s"${pfx}_n", s"${pfx}_e0",
      s"${pfx}_m0", s"${pfx}_f1", s"${pfx}_m1", s"${pfx}_f2",
      s"${pfx}_m2")
    s"""${pfx}_a AS (SELECT $ks, CAST(($nExpr) AS BIGINT) AS $n
        FROM $inCte),
      ${pfx}_b AS (SELECT $ks, $n,
        length(format('{:b}', $n)) - 1 AS $e0 FROM ${pfx}_a),
      ${pfx}_c AS (SELECT $ks, $e0, ($n * 8192) >> $e0 AS $m0
        FROM ${pfx}_b),
      ${pfx}_d AS (SELECT $ks, $e0,
        length(format('{:b}', $m0*$m0*$m0*$m0)) - 53 AS $f1,
        ($m0*$m0*$m0*$m0) >> (length(format('{:b}', $m0*$m0*$m0*$m0)) - 14)
          AS $m1 FROM ${pfx}_c),
      ${pfx}_e AS (SELECT $ks, $e0, $f1,
        length(format('{:b}', $m1*$m1*$m1*$m1)) - 53 AS $f2,
        ($m1*$m1*$m1*$m1) >> (length(format('{:b}', $m1*$m1*$m1*$m1)) - 14)
          AS $m2 FROM ${pfx}_d),
      $outCte AS (SELECT $ks, $e0*64 + $f1*16 + $f2*4 +
        (length(format('{:b}', $m2*$m2*$m2*$m2)) - 53) AS $outCol
        FROM ${pfx}_e)"""
  }

  private def toks(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "\\s+"), t => t =!= lit(""))

  /** Token instances: one row per token OCCURRENCE (multinomial NB
    * counts instances, not distinct terms). */
  private def instances(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(toks(col(textCol))).as("token"))

  /** TRAIN: per-(class, token) occurrence counts — the model table.
    * One corpus shuffle; output bounded by |vocab| × |classes|. */
  def train(df: DataFrame, idCol: String, textCol: String,
      classCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(classCol).as("cls"),
        explode(toks(col(textCol))).as("token"))
      .groupBy(col("cls"), col("token"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-class summary of a trained model joined with doc counts:
    * (cls, n_docs, tot_tokens, vocab_c, top_token). `top_token` is the
    * class's most frequent token (ties → smallest token). */
  def modelSummary(df: DataFrame, idCol: String, textCol: String,
      classCol: String): DataFrame = {
    val model = train(df, idCol, textCol, classCol)
    val docs = df.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("n_docs"))
    model.groupBy(col("cls"))
      .agg(sum(col("cnt")).as("tot_tokens"),
        count(lit(1)).as("vocab_c"),
        min_by(col("token"), struct((-col("cnt")).as("a"),
          col("token").as("b"))).as("top_token"))
      .join(docs, Seq("cls"))
      .select(col("cls"), col("n_docs"), col("tot_tokens"),
        col("vocab_c"), col("top_token"))
  }

  /** CLASSIFY every document with the model trained on `df` itself
    * (training-set scoring — the pipeline's self-labeling shape).
    * Returns (doc_id, pred, actual, correct, score). */
  def classify(df: DataFrame, idCol: String, textCol: String,
      classCol: String): DataFrame = {
    val model = train(df, idCol, textCol, classCol)
    // global vocab size V (add-one smoothing denominator)
    val vocab = model.select(col("token")).distinct()
      .agg(count(lit(1)).as("v"))
    // per-class totals + priors; joined with V this is a |classes|-row
    // frame — broadcast by construction
    val totals = model.groupBy(col("cls"))
      .agg(sum(col("cnt")).as("tot"))
      .join(df.groupBy(col(classCol).as("cls"))
        .agg(count(lit(1)).as("n_docs")), Seq("cls"))
      .crossJoin(vocab)
      .select(col("cls"), lg64(col("n_docs")).as("prior"),
        lg64(col("tot") + col("v")).as("denom"))
    // token → map(class → lg64(cnt+1)): the fixed-point log is computed
    // ONCE per model row (vocabulary-bounded), never per instance
    val byToken = model
      .withColumn("lgc", lg64(col("cnt") + 1))
      .groupBy(col("token"))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("cls"), col("lgc"))))).as("cm"))
    val inst = instances(df, idCol, textCol)
    val scored = inst.join(byToken, Seq("token"))
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"), col("cls"))
      .agg((first(col("prior")) +
        sum(coalesce(col("cm")(col("cls")), lit(0L)) - col("denom")))
        .as("score"))
    val wBest = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cls").asc)
    val pred = scored
      .withColumn("_rn", row_number().over(wBest))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("cls").as("pred"), col("score"))
    pred.join(df.select(col(idCol).as("doc_id"),
        col(classCol).as("actual")), Seq("doc_id"))
      .select(col("doc_id"), col("pred"), col("actual"),
        (col("pred") === col("actual")).cast("int").as("correct"),
        col("score"))
  }
}
