package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Canonicalization-keyed exact dedup — SURVEY.md §2 P19.
  *
  * Exact dedup (P1, `dedup/Exact`) misses trivially-reformatted copies:
  * case changes, punctuation edits, whitespace churn. The standard fix
  * (the first normalization stage of every production dedup stack,
  * e.g. the text-normalization pass CCNet and Dolma apply before
  * hashing) is to hash a CANONICAL form instead of the raw bytes:
  * lowercase, strip non-alphanumerics, collapse whitespace runs, trim.
  *
  * Scale shape is identical to P1 — one row-local canonicalization in
  * whole-stage codegen, one hash-aggregate on the canonical hash. The
  * regex subset is portable (character classes only) so java.util.regex
  * and RE2 agree byte for byte; the DuckDB oracle replays the whole
  * chain.
  */
object Canonical {

  /** Canonical form: lowercase → drop every char outside [a-z0-9 ] →
    * collapse space runs → trim.
    */
  def canonicalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Per-canonical-group stats: md5 of the canonical form, the elected
    * keeper (min id), copy count, and how many DISTINCT raw variants
    * the group merged (n_variants > 1 ⇒ the canonicalization did work
    * raw exact dedup could not).
    */
  def dedupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), col(textCol), md5(canonicalize(col(textCol))).as("canon_hash"))
      .groupBy("canon_hash")
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col(textCol)).as("n_variants")
      )
}
