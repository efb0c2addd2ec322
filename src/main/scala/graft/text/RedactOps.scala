package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training-data pipelines: redact / count / extract
  * emails, URLs, IPv4 addresses, and phone-shaped digit runs.
  *
  * All patterns are pure codegen'd `regexp_replace` /
  * `regexp_extract_all` column expressions — one whole-stage-codegen
  * pass over the corpus, no UDFs, trivially parallel at 100 TB.
  *
  * Pattern notes: RE2-compatible (no lookarounds, no backrefs), so the
  * same pattern strings run identically under Spark's Java regex and
  * RE2-based engines (DuckDB, Go) — which is what makes the driver's
  * cross-engine oracle on redaction output possible, and keeps scrub
  * definitions portable across a mixed-engine data platform. */
object RedactOps {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** Phone-shaped: optional +country code, optional 3-4 digit area
    * group, 3-4 digits, separator, 4 digits — covers 555-0142,
    * 020 7946 0958, +44 20 7946 0958 shapes while requiring the
    * sep+4-digit tail so bare integers never match. (No `\b` before
    * the `+` — word boundaries need a word char on one side.) */
  val PhoneRe =
    "(?:\\+[0-9]{1,3}[-. ])?\\b(?:[0-9]{2,4}[-. ])?[0-9]{3,4}[-. ][0-9]{4}\\b"

  def redactEmails(c: Column, repl: String = "[EMAIL]"): Column =
    regexp_replace(c, EmailRe, repl)
  def redactUrls(c: Column, repl: String = "[URL]"): Column =
    regexp_replace(c, UrlRe, repl)
  def redactIpv4(c: Column, repl: String = "[IP]"): Column =
    regexp_replace(c, Ipv4Re, repl)
  def redactPhones(c: Column, repl: String = "[PHONE]"): Column =
    regexp_replace(c, PhoneRe, repl)

  /** Full scrub, applied email → URL → IP → phone (emails first so the
    * phone pattern can't eat digit runs inside addresses; URLs before
    * IPs so a host IP redacts as part of its URL). */
  def redactPii(c: Column): Column =
    redactPhones(redactIpv4(redactUrls(redactEmails(c))))

  def countMatches(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  def extractEmails(c: Column): Column =
    regexp_extract_all(c, lit(EmailRe), lit(0))
  def extractUrls(c: Column): Column =
    regexp_extract_all(c, lit(UrlRe), lit(0))

  /** Per-document PII profile: counts per category, as a struct. */
  def piiProfile(c: Column): Column = struct(
    countMatches(c, EmailRe).as("n_emails"),
    countMatches(c, UrlRe).as("n_urls"),
    countMatches(c, Ipv4Re).as("n_ips"),
    countMatches(c, PhoneRe).as("n_phones"))

  /** Payment-card-shaped candidate: 13–19 digits, optionally
    * space/dash-grouped, delimited by non-digits. RE2-portable. */
  val CardRe = "\\b[0-9](?:[-. ]?[0-9]){12,18}\\b"

  /** Luhn checksum over a digit string (ISO/IEC 7812): from the
    * RIGHT, double every second digit, subtract 9 when > 9, sum;
    * valid iff sum % 10 == 0. Pure Column algebra over the digit
    * positions — replayable by any SQL engine, so card redaction is
    * cross-engine checkable. Non-digit chars must be stripped first. */
  def luhnValid(digits: Column): Column = {
    val rev = reverse(digits)
    val terms = transform(sequence(lit(1), length(rev)), i => {
      val d = ascii(rev.substr(i, lit(1))) - 48
      when(i % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    aggregate(terms, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** Card numbers in `c` that pass the Luhn check (original
    * formatting preserved). Unlike the regex-only categories, card
    * detection VALIDATES the checksum, so 16-digit order ids and
    * timestamps don't redact (a 10% false-positive rate on random
    * digit runs is the residual, inherent to Luhn). */
  def extractCards(c: Column): Column =
    filter(regexp_extract_all(c, lit(CardRe), lit(0)),
      m => luhnValid(regexp_replace(m, "[^0-9]", "")))

  /** Redact Luhn-valid card numbers. Candidates that fail the
    * checksum are left untouched. Literal (non-regex) replacement of
    * each validated match via an aggregate fold. */
  def redactCards(c: Column, repl: String = "[CARD]"): Column =
    aggregate(extractCards(c), c,
      (acc, m) => replace(acc, m, lit(repl)))
}
