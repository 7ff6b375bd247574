package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE LEARNING — tokenizer training as a data
  * pipeline op. The reference ships token-side ops (vocab top-k, token-id
  * encode, BPE pair counts — [[Salience]]); this closes the loop and
  * LEARNS the merge table those ops consume.
  *
  * Scale design — the part that matters at 100 TB: BPE training never
  * iterates over the corpus. The corpus contributes exactly ONE
  * explode + map-side-combined groupBy (word → count, the same shuffle
  * as [[Salience.vocabTopK]]); every merge round then runs on the
  * WORD-FREQUENCY table, whose size is the vocabulary — bounded
  * regardless of corpus size (Heaps' law, and capped anyway in any real
  * tokenizer run). That is also how production BPE trainers are built
  * (word-count preprocessing, then in-memory merges); here the rounds
  * stay DataFrame ops so a 100 M-type vocab still distributes.
  */
object Bpe {

  /** Learn `numMerges` BPE merges over whitespace words of `textCol`.
    *
    * Algorithm (classic Sennrich-style, self-contained semantics):
    * words split to CHARACTER symbol arrays (no end-of-word marker);
    * each round counts ADJACENT symbol pairs weighted by word frequency
    * (overlapping occurrences all count: "aaa" has (a,a) twice), picks
    * the max under the TOTAL order (count DESC, left ASC, right ASC —
    * ties never depend on partitioning), and rewrites every word by the
    * standard GREEDY left-to-right non-overlapping replace ("aaa" with
    * merge (a,a) → ["aa","a"]). Stops early when no pair remains.
    *
    * The winning pair is collected per round (ONE ≤1-row action, the
    * bounded-model-artifact posture of IVF/PQ training) and re-enters
    * the plan as string LITERALS, so the rewrite is a codegen'd
    * higher-order `aggregate` fold — state (acc, pend) where `pend`
    * holds a just-seen left symbol awaiting its right partner. Lineage
    * is truncated per round (localCheckpoint — the [[Dedup
    * .nearDupGroups]] discipline; without it round i re-plans i nested
    * copies of the whole pipeline).
    *
    * @return one row per learned merge:
    *         (rank, lhs, rhs, pair_count, merged)
    */
  def learnMerges(df: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, numMerges)._1
  }

  /** Top-`k` subword units (by total weighted count, ties broken by
    * subword ASC) after encoding the corpus with `numMerges` learned
    * merges — the vocabulary the trained tokenizer actually produces.
    *
    * No second corpus pass: after training, the word-frequency table IS
    * the encoded corpus (each word's symbol array has had every merge
    * applied in rank order), so the count is one explode + map-side
    * combined groupBy over the BOUNDED word table, then a distributed
    * top-k (TakeOrderedAndProject — rank numbered after the limit, the
    * [[Salience.vocabTopK]] pattern). */
  def encodeTopK(df: DataFrame, textCol: String, numMerges: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = train(df, textCol, numMerges)._2
    val top = words
      .select(explode(col("syms")).as("subword"), col("n"))
      .groupBy(col("subword")).agg(sum(col("n")).as("cnt"))
      .orderBy(desc("cnt"), asc("subword"))
      .limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(desc("cnt"), asc("subword")))
          .cast("long"))
      .select(col("rank"), col("subword"), col("cnt"))
  }

  /** Shared trainer: returns (merge table, final encoded word-frequency
    * table). See [[learnMerges]] for the algorithm contract. */
  private def train(df: DataFrame, textCol: String,
      numMerges: Int): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= lit(""))
    var words = df.select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(split(col("word"), "").as("syms"), col("n"))
      .localCheckpoint(true)

    def flush(s: Column): Column =
      when(s.getField("pend").isNotNull,
        concat(s.getField("acc"), array(s.getField("pend"))))
        .otherwise(s.getField("acc"))

    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val top = words
        .select(explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("n"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1)
        .as[(String, String, Long)].collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = top.head
        merges += ((round + 1L, a, b, cnt, a + b))
        val mergeStep = (s: Column, x: Column) =>
          when(s.getField("pend") === lit(a) && x === lit(b),
            struct(concat(s.getField("acc"), array(lit(a + b))).as("acc"),
              lit(null).cast("string").as("pend")))
          .when(x === lit(a),
            struct(flush(s).as("acc"), x.as("pend")))
          .otherwise(
            struct(concat(flush(s), array(x)).as("acc"),
              lit(null).cast("string").as("pend")))
        words = words.select(
            aggregate(col("syms"),
              struct(array().cast("array<string>").as("acc"),
                lit(null).cast("string").as("pend")),
              mergeStep, flush).as("syms"),
            col("n"))
          .localCheckpoint(true)
        round += 1
      }
    }
    (merges.toSeq.toDF("rank", "lhs", "rhs", "pair_count", "merged"), words)
  }
}
