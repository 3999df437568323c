package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-verified near-duplicate pairs — the character-level
  * complement of [[MinHashLsh.nearDuplicates]]'s token-set Jaccard
  * verify. Token-set similarity is blind to WHERE edits happen; for
  * short, high-churn text (titles, queries, code lines, template
  * variants) a handful of character edits can swamp a 3-gram shingle
  * set while the strings are plainly the same document — bounded
  * Levenshtein is the standard verify for that regime, and the pair
  * (jaccard | edit-ratio) covers both failure modes.
  *
  * Scale shape (100 TB): candidates come from the SAME MinHash LSH
  * banding as every other fuzzy regime (never all-pairs — a pair is
  * only scored when some band bucket collides); the O(|a|·|b|)
  * Levenshtein DP runs only on those candidates and behind two guards:
  *
  *  1. a LENGTH filter: edit distance ≥ |len(a) − len(b)|, so a pair
  *     whose length gap exceeds the budget is rejected by a row-local
  *     predicate before any character is touched;
  *  2. the DP itself is THRESHOLDED (Spark's banded `levenshtein` with
  *     a per-row budget: O(budget · min(|a|, |b|)) and early exit,
  *     returning −1 past the budget) so a far candidate costs its
  *     budget, not its length product.
  *
  * A pair qualifies when lev(a, b) ≤ floor(maxDistRatio · max(len(a),
  * len(b))) — the ratio form keeps one parameter meaningful across
  * mixed document lengths.
  */
object EditDedup {

  /** (id_a, id_b, edit_dist, edit_ratio) near-duplicate pairs, id_a <
    * id_b, edit_ratio = dist / max(len) rounded to 4dp. `gramHash`
    * follows the [[MinHashLsh]] convention (xxhash64 in production; the
    * oracle query passes the shared md5 hash so DuckDB replays the
    * banding exactly).
    */
  def pairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDistRatio: Double = 0.2,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      numBands: Int = 16,
      seed: Long = 42L,
      gramHash: Column => Column = xxhash64(_)
  ): DataFrame = {
    require(maxDistRatio > 0.0 && maxDistRatio < 1.0,
      s"maxDistRatio must be in (0, 1), got $maxDistRatio")
    // one source of banding truth: the shared candidate generator owns
    // the shingle→signature→bands pipeline and its cache lifecycle
    val cands =
      MinHashLsh.candidatePairs(df, textCol, idCol, numHashes, shingleSize, numBands, seed,
        gramHash)

    val texts = df.select(col(idCol), col(textCol))
    val verified = cands
      .join(texts.select(col(idCol).as("id_a"), col(textCol).as("__ta")), Seq("id_a"))
      .join(texts.select(col(idCol).as("id_b"), col(textCol).as("__tb")), Seq("id_b"))
      .withColumn("__la", length(col("__ta")))
      .withColumn("__lb", length(col("__tb")))
      .withColumn(
        "__budget",
        floor(lit(maxDistRatio) * greatest(col("__la"), col("__lb"))).cast("int"))
      // guard 1: reject on length gap alone (dist >= |la - lb|)
      .where(abs(col("__la") - col("__lb")) <= col("__budget"))
      // guard 2: banded DP with per-row budget; -1 = budget exceeded
      .withColumn("__d", expr("levenshtein(__ta, __tb, __budget)"))
      .where(col("__d") >= 0 && col("__d") <= col("__budget"))
      .select(
        col("id_a"),
        col("id_b"),
        col("__d").cast("long").as("edit_dist"),
        round(col("__d") / greatest(col("__la"), col("__lb")), 4).as("edit_ratio"))
    // small by construction (verified near-dups); the candidate frame is
    // already an eagerly-materialized localCheckpoint, so the verify
    // plan roots in a leaf and the banding caches are long released
    verified.localCheckpoint()
  }
}
