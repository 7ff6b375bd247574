package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Name normalization — the reference's 40-rule pipeline
  * (enhanced_mapping.py:216-261 rules, :309-323 application) re-expressed as a
  * single pure-Catalyst column expression: chained `regexp_replace` (word
  * rules, case-insensitive) + `translate` (accent folding) + whitespace
  * collapse + trim + lowercase.
  *
  * Deliberately NOT a UDF: every step is a codegen'd built-in, so predicate
  * pushdown / whole-stage codegen survive and the normalizer can sit in a
  * 100 TB join key derivation without breaking the plan.
  */
object Normalize {

  /** Word-level rules, applied in order, case-insensitively. Identity rules
    * from the reference (e.g. Real→Real) are dropped — they are no-ops. */
  val wordRules: Seq[(String, String)] = Seq(
    "\\bFC\\b" -> "",
    "\\bCF\\b" -> "",
    "\\bAC\\b" -> "",
    "\\bSC\\b" -> "",
    "\\bASC\\b" -> "",
    "\\bClub\\b" -> "",
    "\\bOlympique\\b" -> "",
    "\\bSporting\\b" -> "",
    "\\bUnited\\b" -> "Utd",
    "\\bHotspur\\b" -> "",
    "&" -> "and")

  /** Accent fold (both cases — the reference applies rules IGNORECASE). */
  val accentFrom = "éèêëáàâãäíìîïóòôõöúùûüçñÉÈÊËÁÀÂÃÄÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑ"
  val accentTo   = "eeeeaaaaaiiiiooooouuuucneeeeaaaaaiiiiooooouuuucn"

  /** `normalize_name(s)`: the full pipeline as one Column. */
  def normalizeName(c: Column): Column = {
    val afterWords = wordRules.foldLeft(c) { case (acc, (pat, repl)) =>
      regexp_replace(acc, "(?i)" + pat, repl)
    }
    val folded = translate(afterWords, accentFrom, accentTo)
    lower(trim(regexp_replace(folded, "\\s+", " ")))
  }

  /** DuckDB twin of [[normalizeName]] for the oracle compare — generated from
    * the same rule list so the two can never drift apart. */
  def sqlNormalizeName(e: String): String = {
    val afterWords = wordRules.foldLeft(e) { case (acc, (pat, repl)) =>
      // DuckDB regex is RE2 (\b works); SQL single-quoted strings are raw —
      // no backslash doubling. 'gi' = global + case-insensitive.
      val p = pat.replace("'", "''")
      s"regexp_replace($acc, '$p', '${repl}', 'gi')"
    }
    val folded =
      s"translate($afterWords, '$accentFrom', '$accentTo')"
    s"lower(trim(regexp_replace($folded, '\\s+', ' ', 'g')))"
  }

  /** Word set of an ALREADY-normalized name. Use this (with the normalized
    * column precomputed per ROW, below the join) inside pair-scoring joins —
    * the raw-name forms re-run the 12-step normalizer per PAIR. */
  def wordSetOfNorm(norm: Column): Column =
    array_distinct(filter(split(norm, " "), w => length(w) > 0))

  /** Word set of a normalized name (Python `set(s.split())` semantics:
    * split on runs of whitespace, empty string → empty set). */
  def wordSet(c: Column): Column = wordSetOfNorm(normalizeName(c))

  /** Jaccard of two precomputed word-set arrays. */
  def jaccardOfWordSets(wa: Column, wb: Column): Column = {
    val inter = size(array_intersect(wa, wb)).cast("double")
    val union = size(array_union(wa, wb)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Jaccard similarity of the word sets of two raw names
    * (enhanced_mapping.py:531-567). Pure Catalyst. */
  def jaccardWords(a: Column, b: Column): Column =
    jaccardOfWordSets(wordSet(a), wordSet(b))

  /** Substring-containment confidence over ALREADY-normalized names. */
  def substringConfidenceNorm(na: Column, nb: Column): Column = {
    val contained = na.contains(nb) || nb.contains(na)
    val la = length(na).cast("double")
    val lb = length(nb).cast("double")
    when(contained && la > 0,
      least(la, lb) / greatest(la, lb) * lit(0.75)).otherwise(lit(0.0))
  }

  /** Substring-containment confidence (enhanced_mapping.py:494-529):
    * if normalize(a) ⊆ normalize(b) or vice versa →
    * min(len)/max(len) * 0.75, else 0. */
  def substringConfidence(a: Column, b: Column): Column =
    substringConfidenceNorm(normalizeName(a), normalizeName(b))

  /** Season derivation (database_integration.py:138): football season starts
    * Aug 1 — `year if month >= 8 else year - 1`. */
  def seasonOf(d: Column): Column =
    when(month(d) >= 8, year(d)).otherwise(year(d) - 1)
}
