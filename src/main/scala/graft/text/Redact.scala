package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora (SURVEY.md §2 T12): emails, IPv4
  * addresses and phone-shaped digit runs are replaced with category
  * tags before anything reaches a tokenizer — the standard redaction
  * pass every LLM data pipeline runs between ingest and packing.
  *
  * Pure `regexp_replace` / `regexp_count` column algebra: shuffle-free,
  * embarrassingly parallel, inside whole-stage codegen. Patterns are
  * kept to the portable regex subset both java.util.regex (Spark) and
  * RE2 (DuckDB oracle, and most scrubbing services) accept — no
  * lookaround, no backreferences — so the exact same masks replay
  * bit-for-bit in the oracle and any downstream re-implementation.
  *
  * Order matters and is fixed: emails first (their local part would
  * otherwise be chewed by the phone pattern), then IPv4 (dotted digit
  * runs would match the phone pattern), then phones.
  */
object Redact {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** International (+CC…) or dashed US-style numbers; deliberately
    * conservative — a plain integer is NOT treated as a phone.
    */
  val PhonePattern = "\\+[0-9]{7,15}|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  def redactText(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, "[EMAIL]")
    val i = regexp_replace(e, Ipv4Pattern, "[IP]")
    regexp_replace(i, PhonePattern, "[PHONE]")
  }

  /** Adds `text_redacted` plus per-category match counts (the audit
    * columns a privacy review wants). Each count is evaluated at the
    * SAME pipeline stage as its replacement, so n_<cat> always equals
    * the number of [<CAT>] tags in `text_redacted` — an IPv4-looking
    * substring inside an email (bob@10.0.0.1.example.com) is one email,
    * zero IPs, and a dotted digit run is never double-counted as a
    * phone.
    */
  def withRedaction(df: DataFrame, textCol: String): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), EmailPattern, "[EMAIL]")
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, "[IP]")
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)))
      .withColumn("n_ips", regexp_count(afterEmail, lit(Ipv4Pattern)))
      .withColumn("n_phones", regexp_count(afterIp, lit(PhonePattern)))
      .withColumn("text_redacted", redactText(col(textCol)))
  }

  // ---- Luhn-validated payment-card redaction -------------------------
  // A bare digit-run pattern redacts order ids, timestamps and ISBNs as
  // "cards"; the Luhn mod-10 checksum (public, ISO/IEC 7812) rejects
  // ~90% of random digit runs, so validation belongs IN the scrubber.
  // Pure column algebra in the portable regex/HOF subset — the checksum
  // replays exactly in the DuckDB oracle.

  /** 13–19 digits with optional single space/dash separators. */
  val CardCandidatePattern = "\\b(?:[0-9][ -]?){12,18}[0-9]\\b"

  /** Luhn weighted digit sum of a pure digit string: from the RIGHT,
    * double every second digit, subtract 9 when the double exceeds 9.
    */
  def luhnSum(digits: Column): Column =
    aggregate(
      sequence(lit(1), length(digits)),
      lit(0),
      (acc, i) => {
        val d = digits.substr(i, lit(1)).cast("int")
        val dd = when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        acc + when(((length(digits) - i) % 2) === 1, dd).otherwise(d)
      })

  /** Candidate (possibly separator-bearing) passes iff its digit count
    * is 13–19 and the Luhn sum is ≡ 0 (mod 10).
    */
  def luhnValid(cand: Column): Column = {
    val digits = replace(replace(cand, lit(" "), lit("")), lit("-"), lit(""))
    length(digits).between(13, 19) && luhnSum(digits) % 10 === 0
  }

  /** Adds `n_card_candidates`, `n_cards` (Luhn-valid, redacted),
    * `n_luhn_rejected` (the false positives validation saved) and
    * `text_cards_redacted` (valid candidates replaced with [CARD] in
    * document order).
    */
  def withCardRedaction(df: DataFrame, textCol: String): DataFrame = {
    val cands = regexp_extract_all(col(textCol), lit(CardCandidatePattern), lit(0))
    val valid = filter(cands, c => luhnValid(c))
    df.withColumn("n_card_candidates", size(cands).cast("long"))
      .withColumn("n_cards", size(valid).cast("long"))
      .withColumn("n_luhn_rejected", (size(cands) - size(valid)).cast("long"))
      .withColumn(
        "text_cards_redacted",
        aggregate(valid, col(textCol), (acc, c) => replace(acc, c, lit("[CARD]"))))
  }
}
