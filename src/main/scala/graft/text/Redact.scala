package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: regex redaction of emails, IPv4
  * addresses, and phone-shaped numbers, plus per-type match counts (the
  * audit signal a pipeline thresholds or samples on before dropping).
  *
  * Pure `regexp_replace`/`regexp_extract_all` expression trees — fully
  * codegen'd, no UDF, no shuffle; the regexes use only RE2-safe syntax
  * (character classes, bounded repetition, `\b`) so the DuckDB oracle
  * runs them verbatim. Counts are measured on the ORIGINAL text per
  * pattern independently; redaction applies sequentially
  * email → IP → phone (the email pattern can consume digit runs that
  * would otherwise also match the phone pattern — counting on the
  * original keeps each count well-defined regardless of overlap).
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Sequentially redacted text: emails → `<EMAIL>`, IPv4 → `<IP>`,
    * phone-shaped `ddd[-.]ddd[-.]dddd` → `<PHONE>`. Null text → null. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Match count of `pattern` in the original text; null text → null
    * (explicit guard — non-ANSI `size(null)` is -1, not null). */
  def matchCount(text: Column, pattern: String): Column =
    when(text.isNull, lit(null).cast("int"))
      .otherwise(size(regexp_extract_all(text, lit(pattern), lit(0))))

  /** The audit bundle: (n_emails, n_ips, n_phones) as named columns. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> matchCount(text, EmailRe),
    "n_ips" -> matchCount(text, Ipv4Re),
    "n_phones" -> matchCount(text, PhoneRe))
}
