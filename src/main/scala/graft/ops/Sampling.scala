package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SharedHash

/** Deterministic sampling and splitting for training-data pipelines.
  * At 100 TB, `rand()`-based splits are a reproducibility hazard: they
  * change with partitioning, retries, and Spark versions. These
  * assignments are pure functions of (salt, id) via the shared 60-bit
  * md5 hash — stable across runs, cluster sizes, AND engines (the
  * DuckDB oracle recomputes them exactly).
  */
object Sampling {

  /** Hash bucket in [0, buckets) for (salt, id) — the primitive under
    * splits and shuffle keys.
    */
  def bucket(idCol: Column, salt: String, buckets: Int): Column =
    pmod(SharedHash.md5Long60(concat(lit(salt), lit(":"), idCol.cast("string"))), lit(buckets.toLong))

  /** Add a `split` column: train/val/test by basis points (defaults
    * 90/5/5). A document's assignment never changes when the corpus
    * around it grows or shrinks.
    */
  def deterministicSplit(
      df: DataFrame,
      idCol: String,
      trainBp: Int = 9000,
      valBp: Int = 500,
      salt: String = "graft"
  ): DataFrame = {
    require(trainBp + valBp <= 10000, "train + val basis points must be <= 10000")
    val b = bucket(col(idCol), salt, 10000)
    df.withColumn(
      "split",
      when(b < trainBp, "train").when(b < trainBp + valBp, "val").otherwise("test"))
  }

  /** Stratified k-fold assignment — the cross-validation companion to
    * [[deterministicSplit]]: within each stratum, rows are ordered by
    * the shared md5-60 hash of (salt, id) and dealt round-robin into k
    * folds, so every fold holds ⌈n_s/k⌉ or ⌊n_s/k⌋ rows of EVERY
    * stratum (a plain hash-mod split only hits the per-stratum balance
    * in expectation — a 20-row stratum can easily land 8/2 across two
    * folds). Deterministic on any cluster size; one stratum-keyed
    * window. Fold ids are 0..k−1.
    */
  def stratifiedKFold(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      k: Int,
      salt: String = "cv"
  ): DataFrame = {
    require(k >= 2, "k-fold needs k >= 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(shuffleKey(col(idCol), salt), col(idCol))
    df.withColumn("fold", ((row_number().over(w) - 1) % k).cast("int"))
  }

  /** Deterministic pseudo-random ORDER for training: sort by this key
    * to get a reproducible corpus shuffle; change the salt to reshuffle.
    */
  def shuffleKey(idCol: Column, salt: String = "epoch0"): Column =
    SharedHash.md5Long60(concat(lit(salt), lit(":"), idCol.cast("string")))

  /** Materialize the corpus in reproducible pseudo-random GLOBAL order:
    * range-partition + sort on [[shuffleKey]], so reading the output
    * files in name order replays one deterministic shuffle of the
    * corpus — what a training run needs for restartable, seedable data
    * order. Changing the salt re-shuffles; same salt, same order, on
    * any cluster size. One range-exchange + per-partition sort; no
    * global single-node sort ever happens (Spark samples range bounds).
    */
  def writeShuffled(
      df: DataFrame,
      idCol: String,
      path: String,
      numFiles: Int,
      salt: String = "epoch0"
  ): Unit =
    df.withColumn("__shuffle_key", shuffleKey(col(idCol), salt))
      .repartitionByRange(numFiles, col("__shuffle_key"))
      .sortWithinPartitions(col("__shuffle_key"))
      .drop("__shuffle_key")
      .write
      .mode("overwrite")
      .parquet(path)

  /** Exactly `n` rows per stratum, chosen deterministically: rank rows
    * within each stratum by the salted id hash and keep the first n.
    * "K docs per language/source" with a result that is a pure function
    * of (salt, ids) — reproducible on any cluster, any partitioning,
    * any engine (the DuckDB oracle replays it bit-for-bit). One shuffle
    * on the stratum key.
    */
  def takePerStratum(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      n: Int,
      salt: String = "graft"
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(shuffleKey(col(idCol), salt), col(idCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= n).drop("__rn")
  }

  /** Temperature-based mixture sampling (the multilingual/multi-source
    * rebalancing step of an LLM data pipeline): stratum `s` with `n_s`
    * documents gets mixture weight `w_s = n_s^alpha / Σ_t n_t^alpha`,
    * and each of its documents survives with probability
    * `p_s = min(1, w_s · targetN / n_s)` — `alpha < 1` flattens the
    * distribution toward low-resource strata (upsampling is capped at
    * keeping everything; [[temperatureSampleReplicated]] lifts the cap
    * by emitting >1 copy). The
    * keep decision is `saltedHash(id) / 2^60 < p_s`: a pure function of
    * (salt, id, stratum counts), reproducible on any cluster size and
    * replayed bit-for-bit by the DuckDB oracle.
    *
    * Shape: one count aggregate (tiny — one row per stratum), weights
    * derived on that frame with a constant-partition window, broadcast
    * back, and one codegen'd filter over the corpus. The corpus is
    * scanned once and never shuffled.
    */
  def temperatureSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      alpha: Double,
      targetN: Long,
      salt: String = "graft"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0, "alpha must be positive")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(lit(1))
    val probs = counts
      .withColumn("__w", pow(col("__n").cast("double"), alpha))
      .withColumn("__p",
        least(lit(1.0), col("__w") / sum(col("__w")).over(w) * targetN / col("__n")))
      .select(col(strataCol), col("__p"))
    df.join(broadcast(probs), Seq(strataCol))
      .where(
        shuffleKey(col(idCol), salt).cast("double") / lit(1152921504606846976.0 /* 2^60 */) <
          col("__p"))
      .drop("__p")
  }

  /** [[temperatureSample]] with UPSAMPLING: real data-mixing recipes give
    * low-resource strata expected rates `p_s > 1` (more than one epoch),
    * which the keep/drop form must cap. Here a document with rate `p`
    * emits `floor(p)` guaranteed copies plus one extra copy when
    * `saltedHash(id)/2^60 < p − floor(p)` — still a pure function of
    * (salt, id, stratum counts), so the expected output size is exactly
    * `targetN` and the realized output is deterministic, reproducible on
    * any cluster size, and replayed bit-for-bit by the DuckDB oracle
    * (`generate_series` over the same copy count). For `p ≤ 1` the copy
    * count reduces to the Bernoulli keep of [[temperatureSample]], so
    * this is a strict generalization.
    *
    * `copyCol` (0-based) distinguishes the replicas — downstream packing
    * and shuffling treat each copy as its own row.
    *
    * Shape: identical to [[temperatureSample]] (tiny count agg +
    * broadcast prob join + codegen'd filter) plus a row-local
    * `explode(sequence(...))` — the corpus is still scanned once and
    * never shuffled; output rows are generated where their source row
    * lives.
    */
  def temperatureSampleReplicated(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      alpha: Double,
      targetN: Long,
      salt: String = "graft",
      copyCol: String = "copy"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0, "alpha must be positive")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(lit(1))
    val probs = counts
      .withColumn("__w", pow(col("__n").cast("double"), alpha))
      .withColumn("__p", col("__w") / sum(col("__w")).over(w) * targetN / col("__n"))
      .select(col(strataCol), col("__p"))
    val bern =
      shuffleKey(col(idCol), salt).cast("double") / lit(1152921504606846976.0 /* 2^60 */) <
        col("__p") - floor(col("__p"))
    df.join(broadcast(probs), Seq(strataCol))
      .withColumn(
        "__ncopies",
        floor(col("__p")).cast("long") + when(bern, 1L).otherwise(0L))
      // sequence(0, -1) would generate a DESCENDING range in Spark, so
      // zero-copy rows must be dropped before the explode
      .where(col("__ncopies") > 0)
      .withColumn(copyCol, explode(sequence(lit(0L), col("__ncopies") - 1)))
      .drop("__p", "__ncopies")
  }

  /** Stratified sample: per-stratum fractions (exact-fraction variant of
    * `df.stat.sampleBy`, which is itself hash-seeded and deterministic
    * for a fixed seed + partitioning; prefer [[deterministicSplit]]
    * when assignments must survive repartitioning).
    */
  def stratified(
      df: DataFrame,
      strataCol: String,
      fractions: Map[Any, Double],
      seed: Long
  ): DataFrame =
    df.stat.sampleBy(col(strataCol), fractions, seed)

  /** Exact-size weighted sampling WITHOUT replacement (Efraimidis &
    * Spirakis 2006, the exponential-clocks form): row i gets key
    * −ln(u_i)/w_i with u_i the deterministic salted-hash uniform; the n
    * SMALLEST keys are a weighted sample without replacement with
    * inclusion probabilities ∝ w (the A-ES result). Quality-weighted
    * corpus subsetting in one expression: reproducible across runs,
    * cluster sizes and engines (u is the [[shuffleKey]] uniform), and
    * the top-n plans as TakeOrderedAndProject — per-partition bounded
    * heaps, no global sort shuffle.
    *
    * Zero/negative weights are excluded loudly (a weight of 0 must not
    * win on hash luck). Ties break on id.
    */
  def weightedTake(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      n: Int,
      salt: String = "graft"
  ): DataFrame = {
    val u =
      (shuffleKey(col(idCol), salt).cast("double") + lit(1.0)) /
        lit(1152921504606846976.0 /* 2^60 */) // +1 keeps u in (0, 1]
    val guarded = df.withColumn(
      "__w",
      when(
        col(weightCol).isNull || col(weightCol) <= 0,
        raise_error(concat(
          lit(s"weightedTake: non-positive weight for id="),
          col(idCol).cast("string"))))
        .otherwise(col(weightCol).cast("double")))
    guarded
      .withColumn("__key", -log(u) / col("__w"))
      .orderBy(col("__key"), col(idCol))
      .limit(n)
      .drop("__w")
  }
}
