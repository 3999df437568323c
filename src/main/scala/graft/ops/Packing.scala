package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing: assign documents to fixed-budget
  * token bins in one reproducible pseudo-random order — how LLM
  * training concatenates a corpus into `budget`-token sequences.
  *
  * Rule: order the corpus by the salted shuffle key ([[Sampling
  * .shuffleKey]]; pure function of (salt, id), stable across runs,
  * cluster sizes and engines), take the running token total, and place
  * each document in the bin where it STARTS: `bin = cumBefore / budget`,
  * `bin_pos = cumBefore % budget`. Every bin's fill is within one
  * document length of `budget`; a document longer than the budget
  * simply spans bins starting at its `bin_pos`. The assignment is a
  * pure function of (salt, ids, sizes) — the DuckDB oracle replays it
  * bit-for-bit with one window cumsum.
  *
  * Scale shape — a global running sum WITHOUT a global sort: the key
  * space [0, 2^60) is cut into `parts` fixed equal ranges, so a row's
  * partition is known from its key alone (no sampled range bounds, no
  * extra pass). One shuffle on that range id; per-range token totals
  * (`parts` numbers, the only thing the driver ever sees) are collected
  * and prefix-summed; each range then windows over its own rows with
  * its offset added. 100 TB packs with one shuffle + one `parts`-row
  * driver reduce, and the output is IDENTICAL for any `parts`.
  */
object Packing {

  def packBins(
      df: DataFrame,
      idCol: String,
      sizeCol: String,
      budget: Long,
      salt: String = "pack",
      parts: Int = 256
  ): DataFrame = {
    val (out, keyed) = packBinsPlan(df, idCol, sizeCol, budget, salt, parts)
    // eager: materialize before releasing the keyed frame both the
    // totals pass and the output read (the MinHashLsh pattern)
    val result = out.localCheckpoint()
    keyed.unpersist(false)
    result
  }

  /** The lazy plan + its persisted keyed intermediate — split out so
    * plan-shape specs can assert on the REAL plan (the public method
    * returns a checkpointed scan).
    */
  private[graft] def packBinsPlan(
      df: DataFrame,
      idCol: String,
      sizeCol: String,
      budget: Long,
      salt: String,
      parts: Int
  ): (DataFrame, DataFrame) = {
    require(budget > 0, "budget must be positive")
    require(parts > 0, "parts must be positive")
    val key = Sampling.shuffleKey(col(idCol), salt)
    // fixed-width range of the 60-bit key: partition known per-row
    val rangeWidth = (1L << 60) / parts + 1
    val keyed = df
      .select(col(idCol), col(sizeCol).cast("long").as("__sz"))
      .withColumn("__k", key)
      .withColumn("__part", (col("__k") / rangeWidth).cast("int"))
      .persist()
    // per-range totals -> driver prefix offsets (parts longs, bounded)
    val totals = keyed
      .groupBy(col("__part"))
      .agg(sum(col("__sz")).as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val offsets = (0 until parts)
      .scanLeft(0L)((acc, p) => acc + totals.getOrElse(p, 0L))
      .toArray // offsets(p) = tokens in all ranges before p
    val offCol = element_at(lit(offsets), col("__part") + 1)
    val w = Window
      .partitionBy(col("__part"))
      .orderBy(col("__k"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = keyed
      .withColumn("__cumBefore", offCol + sum(col("__sz")).over(w) - col("__sz"))
      .select(
        col(idCol),
        col("__sz").as("n_tokens"),
        expr(s"__cumBefore DIV ${budget}L").as("bin"),
        (col("__cumBefore") % budget).as("bin_pos"))
    (out, keyed)
  }
}
