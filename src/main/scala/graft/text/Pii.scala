package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII scrubbing for training-data pipelines: detect/redact emails,
  * IPv4 addresses, and phone-shaped digit runs in a text column. Pure
  * codegen column work (regexp_replace / regexp_count chains) — no UDF,
  * no shuffle; at 100 TB this is a single map-side pass over the corpus.
  *
  * Patterns are deliberately RE2-safe (no lookaround, no backrefs) so
  * the DuckDB oracle can apply the identical expressions — and because
  * RE2-compatible patterns also keep the door open to native engines.
  * Replacement order matters and is fixed: IPs first (an IPv4 is also a
  * phone-shaped digit run), then emails (their local parts contain
  * digits), then phones over what remains.
  */
object Pii {

  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  /** Digit-led run of ≥9 phone chars (digits, dots absent — those are
    * IPs — parens, dashes): +1(555)010-0042, 555-0100-42, … The leading
    * `+` alternates with `\b` because a space→`+` position is not a
    * word boundary (`\b\+?` would strand the plus sign). */
  val PhoneRe: String = "(?:\\+|\\b)\\d[\\d().-]{7,}\\d\\b"

  /** Redacted text: `<IP>` / `<EMAIL>` / `<PHONE>` placeholders. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, Ipv4Re, "<IP>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Match counts per kind — the audit signal a pipeline logs before
    * dropping or scrubbing documents. Counted in the same order
    * redaction applies (emails counted after IP removal, phones after
    * both), so counts always agree with what redact() replaced. */
  def counts(text: Column): (Column, Column, Column) = {
    val noIp = regexp_replace(text, Ipv4Re, "<IP>")
    val noEmail = regexp_replace(noIp, EmailRe, "<EMAIL>")
    (regexp_count(text, lit(Ipv4Re)).cast(LongType),
     regexp_count(noIp, lit(EmailRe)).cast(LongType),
     regexp_count(noEmail, lit(PhoneRe)).cast(LongType))
  }
}
