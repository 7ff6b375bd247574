package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: emails and phone numbers replaced by
  * typed placeholder tokens before anything ships to a trainer — the scrub
  * every public-web pipeline runs between curation and export.
  *
  * Pure `regexp_replace`/`regexp_count` composition (codegen'd, map-side,
  * pushdown-compatible — no custom expression needed here). The patterns
  * are deliberately conservative ASCII classes that mean the same thing in
  * Java regex and RE2, so a DuckDB twin reproduces the scrub byte-for-byte.
  * Emails are replaced FIRST: a digit run inside an email local part must
  * not surface as a phone match after the email is tokenized — the twin
  * mirrors the order. */
object Redact {
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}|[0-9]{3}-[0-9]{4}"

  def emailCount(text: Column): Column = regexp_count(text, lit(emailRe))

  /** Phone matches counted AFTER the email scrub (see order note above). */
  def phoneCount(text: Column): Column =
    regexp_count(regexp_replace(text, emailRe, "<EMAIL>"), lit(phoneRe))

  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailRe, "<EMAIL>"),
      phoneRe, "<PHONE>")

  /** CONSISTENT PSEUDONYMIZATION: stable salted-hash surrogate for an
    * identifier — the GDPR-pipeline primitive that keeps per-user joins
    * and distinct counts working after the raw id is dropped. SHA-256
    * over `salt:id` (Spark `sha2` and DuckDB `sha256` emit the same
    * lowercase hex), truncated to 16 hex chars (64 bits — collision
    * odds n²/2⁶⁵, the accepted fingerprint trade). Same id ⇒ same
    * token everywhere; codegen'd, no UDF. */
  def pseudonymize(id: Column, salt: String = "graft"): Column =
    substring(sha2(concat(lit(salt), lit(":"), id.cast("string")), 256),
      1, 16)
}
