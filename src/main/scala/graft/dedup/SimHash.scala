package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting (SURVEY.md §2 P3).
  *
  * 64-bit Charikar simhash over word tokens: each token votes ±1 on each
  * bit of its xxhash64; the sign of each bit-sum forms the fingerprint.
  * Documents within small Hamming distance are near-duplicates.
  *
  * Scale shape: explode tokens once, ONE groupBy(doc) with 64 codegen'd
  * conditional sums. Candidate generation splits the fingerprint into
  * 4 × 16-bit bands (pigeonhole: Hamming ≤ 3 ⇒ at least one band equal)
  * and self-joins on band equality — never all pairs.
  */
object SimHash {

  /** (id, simhash long) — one custom aggregate per doc (64 separate
    * conditional sums would be a Janino codegen bomb; see
    * [[graft.functions.SimHashAgg]]).
    */
  def fingerprints(df: DataFrame, textCol: String, idCol: String): DataFrame =
    fingerprintsWith(df, textCol, idCol, xxhash64(_))

  /** [[fingerprints]] with a caller-chosen token-hash function — the
    * driver's DuckDB-checked query uses [[graft.functions.SharedHash]]
    * so both engines hash tokens identically; xxhash64 stays the
    * production default.
    */
  def fingerprintsWith(
      df: DataFrame,
      textCol: String,
      idCol: String,
      tokenHash: Column => Column
  ): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
      .groupBy(col(idCol))
      .agg(graft.functions.SimHashAgg.simhash(col("h")).as("simhash"))

  /** Hamming distance between two simhash columns (bit_count of xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Candidate pairs with Hamming distance ≤ maxDist, via 16-bit band
    * self-join (guaranteed complete for maxDist ≤ 3 by pigeonhole).
    */
  def nearDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDist: Int = 3
  ): DataFrame = {
    val fps = fingerprints(df, textCol, idCol)
    val banded = fps.select(
      col(idCol),
      col("simhash"),
      explode(
        array((0 until 4).map { b =>
          struct(lit(b).as("band"), shiftright(col("simhash"), b * 16).bitwiseAND(0xffffL).as("key"))
        }: _*)
      ).as("bb")
    ).select(col(idCol), col("simhash"), col("bb.band"), col("bb.key"))
    val l = banded.select(col("band"), col("key"), col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val r = banded.select(col("band"), col("key"), col(idCol).as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("band", "key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }
}
