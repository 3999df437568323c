package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mix budget allocation — "we want a 30/30/20/20 source mix
  * in a T-token budget, no source repeated more than maxEpochs times":
  * the planning step every pretraining data pipeline runs before
  * sharding ([[TrainingShards]] consumes the result). Single-pass
  * contract: each source gets min(targetShare·T, tokens·maxEpochs);
  * the CAP SHORTFALL IS REPORTED, NOT silently redistributed
  * (`leftover_tokens` on every row) — redistribution policy is the
  * caller's call (rerun with adjusted shares, or accept the smaller
  * realized budget). One source-sized aggregate; closed forms only.
  */
object Mixing {

  /** `targets`: (source, share) frame, shares summing to ~1 (not
    * enforced — shares are the caller's contract; `realized_share`
    * shows what the allocation actually delivers). Sources missing a
    * target row drop via the inner join; `tokensCol` is the available
    * raw token mass per source. Returns one row per source: tokens,
    * share, alloc_tokens (6dp), epochs (6dp), capped (bool),
    * realized_share (6dp), leftover_tokens (6dp, same on every row).
    */
  def budgetAllocation(
      perSource: DataFrame,
      sourceCol: String,
      tokensCol: String,
      targets: DataFrame,
      budget: Double,
      maxEpochs: Double): DataFrame = {
    require(budget > 0 && maxEpochs > 0, "Mixing: budget and maxEpochs must be positive")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val t = targets.select(col(sourceCol).as("__s"), col("share").cast("double").as("__sh"))
    val base = perSource
      .select(col(sourceCol).as("__s"), col(tokensCol).cast("double").as("__n"))
      .join(t, Seq("__s"))
      .withColumn("__want", col("__sh") * lit(budget))
      .withColumn("__cap", col("__n") * lit(maxEpochs))
      .withColumn("__alloc", least(col("__want"), col("__cap")))
    val tot = base.agg(
      sum("__alloc").as("__ta"),
      sum(col("__want") - least(col("__want"), col("__cap"))).as("__left"))
    base.crossJoin(broadcast(tot))
      .select(
        col("__s").as(sourceCol),
        col("__n").cast("long").as("tokens"),
        q6(col("__sh")).as("share"),
        q6(col("__alloc")).as("alloc_tokens"),
        when(col("__n") > 0, q6(col("__alloc") / col("__n"))).as("epochs"),
        (col("__cap") < col("__want")).as("capped"),
        when(col("__ta") > 0, q6(col("__alloc") / col("__ta"))).as("realized_share"),
        q6(col("__left")).as("leftover_tokens"))
  }
}
