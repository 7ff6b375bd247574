package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UNIGRAM-LM TOKENIZER TRAINING (SentencePiece-style, deterministic
  * integer variant) — the second tokenizer-training family next to
  * [[Bpe]]: instead of greedy pair merges, a piece VOCABULARY is seeded
  * from frequent substrings and refined by EM — each round re-segments
  * every word with Viterbi under the current piece scores and re-scores
  * pieces by their best-path counts, pruning the tail.
  *
  * Deterministic integer semantics (no float, no log — mirrored exactly
  * by tools/gen_unigram_golden.py, the [[Bpe]] golden posture):
  *  - words: whitespace tokens of trim(text), weighted by frequency;
  *  - seed: every substring of length 1..maxPieceLen scored by total
  *    weighted occurrence count (overlapping counted); vocabulary =
  *    ALL single chars ∪ top `seedSize` multi-char pieces by
  *    (score DESC, piece ASC);
  *  - per round: piece cost = ⌊log₂ Σscores⌋ − ⌊log₂ score⌋ (integer —
  *    the q_lm_surprisal discipline), Viterbi per word
  *    ([[graft.functions.UnigramViterbi]]'s documented tie-breaks), new
  *    score = best-path piece count weighted by word frequency; singles
  *    always survive (floor score 1), multi-char pieces keep the top
  *    `seedSize` with score ≥ 1;
  *  - report: top `vocabSize` of the final table by (score DESC, piece
  *    ASC), ranked. The APPLY ([[encodeTopK]]) segments with the FULL
  *    final table (singles guarantee total coverage — no fallback path
  *    is reachable), so `vocabSize` is only the report cut.
  *
  * Scale design (the [[Bpe]] argument, unchanged): the corpus is touched
  * ONCE (word-frequency groupBy); seeding, every EM round, and the final
  * ranking all run on the BOUNDED word/piece tables. The per-round piece
  * table (≤ seedSize + alphabet) is collected as the plan literal the
  * Viterbi expression broadcasts — the bounded-model-artifact posture of
  * IVF/PQ codebooks — and word-table lineage is localCheckpoint-anchored.
  */
object Unigram {

  private def ilog2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)

  private def costsOf(vocab: Map[String, Long]): Map[String, Int] = {
    val total = vocab.valuesIterator.sum
    vocab.map { case (p, s) => p -> (ilog2(total) - ilog2(s)) }
  }

  /** Shared trainer: (final piece table, bounded word-frequency frame). */
  private def train(df: DataFrame, textCol: String, maxPieceLen: Int,
      seedSize: Int, emRounds: Int): (Map[String, Long], DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= lit(""))
    val words = df.select(explode(toks).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)

    // seed scores: weighted overlapping substring counts, one pass over
    // the bounded word table
    val subs = words.select(col("n"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)),
            i -> transform(sequence(1, least($maxPieceLen, length(word) - i + 1)),
              l -> substring(word, i, l))))""")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("score"))
      .localCheckpoint(true)
    val singles0 = subs.filter(length(col("piece")) === 1)
    val multi0 = subs.filter(length(col("piece")) > 1)
      .orderBy(desc("score"), asc("piece")).limit(seedSize)

    var vocab: Map[String, Long] =
      singles0.unionByName(multi0).as[(String, Long)].collect().toMap
    val singlesSet = vocab.keySet.filter(_.length == 1)

    var round = 0
    while (round < emRounds) {
      val costs = costsOf(vocab)
      val counts = words.select(explode(
          graft.functions.UnigramViterbi.segment(col("word"), costs,
            maxPieceLen)).as("piece"), col("n"))
        .groupBy(col("piece")).agg(sum(col("n")).as("score"))
        .as[(String, Long)].collect().toMap
      val multi = counts.filter { case (p, s) => p.length > 1 && s >= 1L }
        .toSeq.sortBy { case (p, s) => (-s, p) }.take(seedSize)
      val singles = singlesSet.toSeq
        .map(c => c -> counts.getOrElse(c, 1L).max(1L))
      vocab = (singles ++ multi).toMap
      round += 1
    }
    (vocab, words)
  }

  /** Learned vocabulary report: (rank, piece, score), top `vocabSize`. */
  def trainVocab(df: DataFrame, textCol: String, maxPieceLen: Int = 6,
      seedSize: Int = 300, emRounds: Int = 3,
      vocabSize: Int = 60): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (vocab, _) = train(df, textCol, maxPieceLen, seedSize, emRounds)
    val out = vocab.toSeq.sortBy { case (p, s) => (-s, p) }.take(vocabSize)
      .zipWithIndex.map { case ((p, s), i) => (i + 1L, p, s) }
    spark.createDataset(out).toDF("rank", "piece", "score")
  }

  /** APPLY: segment every word with the full trained table and count
    * subword usage over the corpus (weighted by word frequency) — top
    * `k`. One extra pass over the bounded word table. */
  def encodeTopK(df: DataFrame, textCol: String, maxPieceLen: Int = 6,
      seedSize: Int = 300, emRounds: Int = 3, k: Int = 50): DataFrame = {
    val (vocab, words) = train(df, textCol, maxPieceLen, seedSize, emRounds)
    val top = words.select(explode(
        graft.functions.UnigramViterbi.segment(col("word"), costsOf(vocab),
          maxPieceLen)).as("piece"), col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
      .orderBy(desc("cnt"), asc("piece")).limit(k)
    import org.apache.spark.sql.expressions.Window
    top.withColumn("rank",
        row_number().over(Window.orderBy(desc("cnt"), asc("piece")))
          .cast("long"))
      .select(col("rank"), col("piece"), col("cnt"))
  }
}
