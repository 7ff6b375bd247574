package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  * All pure Catalyst built-ins → codegen'd, pushdown-safe, no UDFs.
  */
object TextFeatures {

  /** Whitespace tokens (Python `s.split()` semantics: leading/trailing
    * whitespace ignored, empty string → empty array). */
  def wsTokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(wsTokens(c))

  /** BPE-ish token estimate: split on word/number/punctuation boundaries the
    * way byte-pair pretokenizers do (letters runs, digit runs, single
    * punctuation marks each count). */
  def bpeishTokenCount(c: Column): Column =
    size(filter(
      split(c, "(?<=[\\p{L}\\p{N}])(?![\\p{L}\\p{N}])|(?<![\\p{L}\\p{N}])(?=[\\p{L}\\p{N}])|(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})|(?<=[\\p{P}\\p{S}])(?=[\\p{P}\\p{S}])"),
      t => length(trim(t)) > 0))

  /** Punctuation character ratio. */
  def punctRatio(c: Column): Column = {
    val n = length(c).cast("double")
    when(n > 0,
      (n - length(regexp_replace(c, "[\\p{Punct}]", ""))) / n).otherwise(0.0)
  }

  /** English stopword list (small, for heuristics). */
  val enStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it", "that", "for", "on", "with", "as", "was", "at",
    "by", "be", "this", "are", "from", "but", "not", "have", "had")

  val deStopwords: Seq[String] = Seq("der", "die", "das", "und", "oder",
    "von", "zu", "in", "ist", "es", "für", "auf", "mit", "als", "war", "bei",
    "sein", "nicht", "ein", "eine", "den", "dem", "ich", "sie", "wir")

  val frStopwords: Seq[String] = Seq("le", "la", "les", "et", "ou", "de",
    "à", "dans", "est", "il", "que", "pour", "sur", "avec", "comme", "était",
    "par", "être", "ce", "ne", "pas", "un", "une", "des", "je")

  val esStopwords: Seq[String] = Seq("el", "la", "los", "las", "y", "o",
    "de", "a", "en", "es", "que", "para", "sobre", "con", "como", "era",
    "por", "ser", "este", "no", "un", "una", "del", "yo", "se")

  /** Stopword-hit ratio against a given list (fraction of tokens that are
    * stopwords, lowercased). */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val toks = transform(wsTokens(c), t => lower(t))
    val hits = size(filter(toks, t => t.isInCollection(stopwords)))
    when(size(toks) > 0,
      hits.cast("double") / size(toks).cast("double")).otherwise(0.0)
  }

  /** Language ID by stopword-ratio argmax over {en, de, fr, es}; 'und' when
    * nothing scores > 0. N-gram-free heuristic — cheap, codegen'd, and good
    * enough to route documents at pipeline scale. */
  def langId(c: Column): Column = {
    val scores = Seq(
      "en" -> stopwordRatio(c, enStopwords),
      "de" -> stopwordRatio(c, deStopwords),
      "fr" -> stopwordRatio(c, frStopwords),
      "es" -> stopwordRatio(c, esStopwords))
    val best = greatest(scores.map(_._2): _*)
    // priority order breaks ties deterministically (en first)
    when(best > 0, coalesce(scores.map { case (l, s) =>
      when(s === best, lit(l)) }: _*)).otherwise(lit("und"))
  }

  /** Fast language ID: same decision rule as [[langId]] but over the fused
    * single-pass [[TextStatsExpr]] counters (the compositional form
    * re-tokenizes the document once per language, interpreted). */
  def langIdFast(c: Column): Column = {
    val st = TextStatsExpr.textStats(c)
    val toks = st("n_tokens").cast("double")
    val scores = Seq(
      "en" -> st("stop_en"), "de" -> st("stop_de"),
      "fr" -> st("stop_fr"), "es" -> st("stop_es"))
      .map { case (l, hits) =>
        l -> when(toks > 0, hits.cast("double") / toks).otherwise(0.0)
      }
    val best = greatest(scores.map(_._2): _*)
    when(best > 0, coalesce(scores.map { case (l, s) =>
      when(s === best, lit(l)) }: _*)).otherwise(lit("und"))
  }

  /** [[punctRatio]] / [[stopwordRatio]](en) / [[qualityScore]] computed from
    * ONE fused [[TextStatsExpr]] pass. Same values as the compositional
    * reference forms (q_text_quality's oracle pins the equality); the
    * compositional forms re-split the text ~4× interpreted and run a
    * full-text regex — measured ~4× slower on the curation gates. */
  def punctRatioFast(c: Column): Column = {
    val st = TextStatsExpr.textStats(c)
    val n = st("n_chars").cast("double")
    when(n > 0, st("n_punct").cast("double") / n).otherwise(0.0)
  }

  def stopwordRatioEnFast(c: Column): Column = {
    val st = TextStatsExpr.textStats(c)
    val toks = st("n_tokens").cast("double")
    when(toks > 0, st("stop_en").cast("double") / toks).otherwise(0.0)
  }

  def qualityScoreFast(c: Column): Column = {
    val st = TextStatsExpr.textStats(c)
    val nChars = st("n_chars").cast("double")
    val nToks = st("n_tokens").cast("double")
    val punctR = when(nChars > 0, st("n_punct").cast("double") / nChars)
      .otherwise(0.0)
    val stopR = when(nToks > 0, st("stop_en").cast("double") / nToks)
      .otherwise(0.0)
    val meanWordLen = when(nToks > 0, nChars / nToks).otherwise(0.0)
    val lengthOk = when(nChars >= 100 && nChars <= 20000, 1.0).otherwise(0.0)
    val punctOk = when(punctR < 0.2, 1.0).otherwise(0.0)
    val stopOk = when(stopR > 0.05, 1.0).otherwise(0.0)
    val wordLenOk = when(meanWordLen >= 3 && meanWordLen <= 12, 1.0)
      .otherwise(0.0)
    (lengthOk + punctOk + stopOk + wordLenOk) / lit(4.0)
  }

  /** Composite quality score in [0,1]: length band + punctuation sanity +
    * stopword presence + mean-word-length band — the standard cheap filters
    * applied before LLM training (C4/Gopher-style heuristics, simplified). */
  def qualityScore(c: Column): Column = {
    val nChars = length(c).cast("double")
    val nToks = tokenCount(c).cast("double")
    val meanWordLen = when(nToks > 0, nChars / nToks).otherwise(0.0)
    val lengthOk = when(nChars >= 100 && nChars <= 20000, 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(c) < 0.2, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(c, enStopwords) > 0.05, 1.0).otherwise(0.0)
    val wordLenOk = when(meanWordLen >= 3 && meanWordLen <= 12, 1.0)
      .otherwise(0.0)
    (lengthOk + punctOk + stopOk + wordLenOk) / lit(4.0)
  }

  /** Document fingerprint: 64-bit hash of the whitespace-normalized,
    * lowercased text. Collision-checked exact-dedup key that is robust to
    * formatting noise. */
  def fingerprint(c: Column): Column =
    xxhash64(lower(trim(regexp_replace(c, "\\s+", " "))))

  /** Character n-gram shingles of the normalized text (for MinHash/Jaccard
    * dedup). Produces distinct shingles. */
  def shingles(c: Column, n: Int): Column = {
    val norm = lower(trim(regexp_replace(c, "\\s+", " ")))
    array_distinct(transform(
      sequence(lit(0), greatest(length(norm) - n, lit(0))),
      i => norm.substr(lit(1) + i, lit(n))))
  }

  /** Word n-grams (for n-gram Jaccard dedup). */
  def wordNgrams(c: Column, n: Int): Column = {
    val toks = wsTokens(lower(c))
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }
}
