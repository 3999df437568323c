package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted equi-join (SURVEY.md §5): when a fact table's join key is
  * heavily skewed (one user/document/session holds a large share of the
  * rows), a plain shuffle join sends the whole hot key to ONE task. AQE
  * skew-join splits oversized partitions at runtime, but only for
  * sort-merge joins it can see; this helper is the explicit form for
  * when the skew is known ahead of time (or AQE is unavailable, e.g.
  * inside streaming micro-batches).
  *
  * Mechanics: the fact side gets a per-row salt in [0, factor); the dim
  * side is exploded into `factor` copies, one per salt value; the join
  * key becomes (key, salt), so a hot key spreads over `factor` tasks.
  * Correctness does not depend on WHICH salt a row receives — every
  * (key, salt) pair exists on the dim side — so the salt can be any
  * cheap expression; the default hashes a nondeterministic row id.
  */
object Salt {

  /** Default salt: deterministic mix of a unique row id. Which salt a
    * row gets is irrelevant for correctness (see object docs).
    */
  def rowSalt(factor: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(factor.toLong))

  private val SafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "semi", "left_anti", "leftanti", "anti")

  /** `facts ⋈ dim` on `key`, with the hot-key load spread over `factor`
    * tasks. `dim` is replicated `factor` times — keep it the SMALL side.
    *
    * Only fact-preserving join types are accepted: under right/full outer
    * an unmatched dim key would emit `factor` null-padded duplicates (the
    * dim side is exploded into `factor` copies), so those are rejected.
    */
  def saltedJoin(
      facts: DataFrame,
      dim: DataFrame,
      key: String,
      factor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    require(
      SafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti; '$joinType' would " +
        "duplicate unmatched dim keys factor times (dim side is exploded)")
    val saltedFacts = facts.withColumn("__salt", rowSalt(factor))
    val saltedDim = dim.withColumn("__salt", explode(sequence(lit(0L), lit(factor - 1L))))
    saltedFacts.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
