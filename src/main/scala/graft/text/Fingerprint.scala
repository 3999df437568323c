package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic document fingerprinting (SURVEY.md §2 T4): a rolling
  * polynomial hash over the token stream, h ← (h·B + hash(token)) mod P
  * with P = 2^31−1 so every intermediate stays < 2^62 — exact under
  * Spark 4's ANSI arithmetic (wrapping overflow would throw). Equal
  * texts ⇒ equal fingerprints; near-equal texts differ — this is the
  * cheap exact-dup key used before any fuzzy dedup pass. Expressed as a
  * codegen'd `aggregate` fold over the token array — no UDF.
  */
object Fingerprint {
  val Base = 1000003L
  val Prime = 2147483647L // 2^31 - 1

  def fingerprint(text: Column): Column = fingerprintWith(text, xxhash64(_))

  /** [[fingerprint]] with a caller-chosen token-hash function — the
    * driver's DuckDB-checked query uses [[graft.functions.SharedHash]]
    * (DuckDB has no xxhash64); xxhash64 stays the production default.
    */
  def fingerprintWith(text: Column, tokenHash: Column => Column): Column =
    aggregate(
      TextStats.tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * Base + pmod(tokenHash(t), lit(Prime)), lit(Prime))
    )

  def withFingerprint(df: DataFrame, textCol: String, out: String = "fingerprint"): DataFrame =
    df.withColumn(out, fingerprint(col(textCol)))

  def withFingerprintWith(
      df: DataFrame,
      textCol: String,
      tokenHash: Column => Column,
      out: String = "fingerprint"
  ): DataFrame =
    df.withColumn(out, fingerprintWith(col(textCol), tokenHash))
}
