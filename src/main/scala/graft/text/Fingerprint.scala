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

  def fingerprint(text: Column): Column =
    aggregate(
      TextStats.tokens(text),
      lit(0L),
      (acc, t) => pmod(acc * Base + pmod(xxhash64(t), lit(Prime)), lit(Prime))
    )

  def withFingerprint(df: DataFrame, textCol: String, out: String = "fingerprint"): DataFrame =
    df.withColumn(out, fingerprint(col(textCol)))
}
