package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WORDPIECE tokenizer training + inference — the likelihood-scored
  * sibling of [[Bpe]] (third trainer family next to BPE and
  * [[Unigram]]). Where BPE merges the most FREQUENT adjacent pair,
  * WordPiece merges the pair maximizing `count(l,r) / (count(l)·count(r))`
  * — the pair whose merge most increases corpus likelihood under a
  * unigram factorization. Subsequent-position pieces carry the standard
  * `##` continuation prefix, and inference is greedy longest-match-first
  * (max-munch) against the trained vocabulary — NOT merge-order replay,
  * the property that distinguishes WordPiece inference from BPE's.
  *
  * Scale design (the [[Bpe]] posture): the corpus contributes exactly one
  * explode + map-side-combined groupBy (word → count); every training
  * round runs on the word-frequency table, bounded by vocabulary (Heaps'
  * law) regardless of corpus size. The per-round pair/symbol statistics
  * collected to pick the winner are bounded by the SYMBOL-PAIR inventory
  * of that bounded table (31-word vocab ⇒ dozens of rows here), and the
  * winner re-enters the plan as string literals.
  *
  * Determinism: the score comparison is EXACT — cross-multiplied BigInt
  * (`cntₐ·cl_b·cr_b > cnt_b·clₐ·crₐ`), never a floating ratio — with
  * (l ASC, r ASC) tie-break, so training is independent of partitioning
  * and reproducible by the independent Python golden trainer
  * (tools/gen_wordpiece_golden.py).
  */
object WordPiece {

  /** Initial WordPiece symbols of a word: first char bare, rest
    * `##`-prefixed. */
  private def initSyms(word: Column): Column = {
    val chars = split(word, "")
    when(size(chars) > 1,
      concat(slice(chars, 1, 1),
        transform(slice(chars, lit(2), size(chars) - 1),
          c => concat(lit("##"), c))))
      .otherwise(chars)
  }

  /** Learn `numMerges` WordPiece merges over whitespace words of
    * `textCol`. Returns (rank, lhs, rhs, pair_count, merged) — `merged`
    * is `lhs + rhs` with rhs's `##` stripped (continuation composition).
    */
  def learnVocab(df: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, numMerges)._1
  }

  /** Top-`k` pieces (by total weighted count, ties by piece ASC) of the
    * corpus encoded with `numMerges` learned merges — as with
    * [[Bpe.encodeTopK]], the trained word-frequency table IS the encoded
    * corpus, so no second corpus pass. */
  def encodeTopK(df: DataFrame, textCol: String, numMerges: Int,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = train(df, textCol, numMerges)._2
    words
      .select(explode(col("syms")).as("piece"), col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
      .orderBy(desc("cnt"), asc("piece"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("cnt"), asc("piece")))
          .cast("long"))
      .select(col("rank"), col("piece"), col("cnt"))
  }

  /** Greedy longest-match-first (max-munch) tokenization of the corpus
    * against the vocabulary learned by `numMerges` rounds: per word,
    * repeatedly take the LONGEST vocab piece matching a prefix of the
    * remainder (`##`-prefixed after the first); a word with any
    * unmatchable position becomes one `[UNK]` (whole-word UNK — the
    * standard inference contract). Returns top-`k` (rank, piece, cnt).
    *
    * The vocabulary (alphabet ∪ merged pieces, a bounded model artifact)
    * enters the plan as a literal for [[graft.functions.WordPieceTokenize]];
    * tokenization itself is one pass over the bounded word table — the
    * corpus was already reduced to word frequencies. */
  def tokenizeTopK(df: DataFrame, textCol: String, numMerges: Int,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= lit(""))
    val wordFreq = df.select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    // vocab = every initial symbol + every merged piece (bounded)
    val alphabet = wordFreq
      .select(explode(initSyms(col("word"))).as("p"))
      .distinct().as[String].collect()
    val merged = train(df, textCol, numMerges)._1
      .select(col("merged")).as[String].collect()
    val vocab = (alphabet ++ merged).distinct.sorted
    wordFreq
      .select(explode(graft.functions.WordPieceTokenize
        .tokenize(col("word"), vocab)).as("piece"), col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
      .orderBy(desc("cnt"), asc("piece"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("cnt"), asc("piece")))
          .cast("long"))
      .select(col("rank"), col("piece"), col("cnt"))
  }

  /** Shared trainer: (merge table, final encoded word-frequency table).
    * Round mechanics mirror [[Bpe.train]] (greedy left-to-right
    * non-overlapping rewrite via an aggregate fold with the winner as
    * plan literals, localCheckpoint lineage truncation per round); only
    * the WINNER RULE differs (likelihood score, not raw count). */
  private def train(df: DataFrame, textCol: String,
      numMerges: Int): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= lit(""))
    var words = df.select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(initSyms(col("word")).as("syms"), col("n"))
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
      // bounded statistics: adjacent-pair counts + per-symbol totals over
      // the word-frequency table (inventory-bounded, corpus-independent)
      val pairStats = words
        .select(explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("n"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .as[(String, String, Long)].collect()
      if (pairStats.isEmpty) exhausted = true
      else {
        val symCnt = words
          .select(explode(col("syms")).as("s"), col("n"))
          .groupBy(col("s")).agg(sum(col("n")).as("c"))
          .as[(String, Long)].collect().toMap
        // exact likelihood-score argmax: cnt/(cl·cr) compared by BigInt
        // cross-multiplication; ties (l ASC, r ASC)
        val best = pairStats.reduceLeft { (x, y) =>
          val lhs = BigInt(x._3) * BigInt(symCnt(y._1)) * BigInt(symCnt(y._2))
          val rhs = BigInt(y._3) * BigInt(symCnt(x._1)) * BigInt(symCnt(x._2))
          if (lhs > rhs) x
          else if (lhs < rhs) y
          else if (x._1 < y._1 || (x._1 == y._1 && x._2 <= y._2)) x else y
        }
        val (a, b, cnt) = best
        val m = a + b.stripPrefix("##")
        merges += ((round + 1L, a, b, cnt, m))
        val mergeStep = (s: Column, x: Column) =>
          when(s.getField("pend") === lit(a) && x === lit(b),
            struct(concat(s.getField("acc"), array(lit(m))).as("acc"),
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
