package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test assignment — the split step every eval
  * pipeline gets wrong first: splitting ROWS at random leaks near-
  * duplicates across train and test (the contamination
  * [[graft.sim.Cosine.decontaminate]] and [[graft.dedup.SpanDedup]]
  * audit for, created at split time). The fix is to split by GROUP —
  * the near-dup cluster id from [[graft.dedup.MinHashLsh]] +
  * [[graft.dedup.ConnectedComponents]], a domain, or any correlation
  * key — so an entire cluster lands in ONE split.
  *
  * Assignment is pure hash arithmetic (the [[graft.functions.SharedHash]]
  * 60-bit md5, seeded): bucket = hash(key ++ seed) mod 10⁶, split by
  * cumulative weight thresholds — deterministic across engines, runs,
  * and cluster sizes; no shuffle beyond whatever produced the key (the
  * assignment itself is one row-local projection). Weights are
  * validated to sum to 1 within 1e-9; thresholds use exact integer
  * boundaries ⌊cum·10⁶⌋ so both engines cut identically.
  */
object Splits {

  val Buckets = 1000000L

  /** Adds `split` (the label whose cumulative-weight interval contains
    * the group's hash bucket) and `split_bucket` (the bucket, for
    * audit). Rows sharing `groupCol` ALWAYS share a split.
    */
  def byGroup(
      df: DataFrame,
      groupCol: String,
      weights: Seq[(String, Double)],
      seed: String = "graft-split"): DataFrame = {
    require(weights.nonEmpty, "Splits.byGroup: need at least one split")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${weights.map(_._2).sum}")
    val bucket = pmod(
      graft.functions.SharedHash.md5Long60(
        concat(col(groupCol).cast("string"), lit("|"), lit(seed))),
      lit(Buckets))
    // cumulative integer thresholds: [0, t1) -> w1, [t1, t2) -> w2, ...
    val cums = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val bounds = cums.map(c => math.min(Buckets, math.floor(c * Buckets).toLong))
    val labeled = weights.map(_._1).zip(bounds)
    val splitCol = labeled.init.foldRight(lit(labeled.last._1): Column) {
      case ((name, bound), rest) => when(col("split_bucket") < bound, lit(name)).otherwise(rest)
    }
    df.withColumn("split_bucket", bucket).withColumn("split", splitCol)
  }

  /** The q54 composition made split-aware: near-dup cluster the corpus
    * (banded MinHash LSH candidates, Jaccard-verified, connected
    * components), then split by cluster so near-duplicates never
    * straddle train/test. Returns the input plus `cluster_id` (the
    * component's minimum doc id; singletons cluster as themselves),
    * `split`, `split_bucket`.
    */
  def leakageSafe(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      weights: Seq[(String, Double)],
      threshold: Double = 0.5,
      numHashes: Int = 64,
      numBands: Int = 16,
      shingleSize: Int = 3,
      seed: String = "graft-split",
      gramHash: Column => Column = xxhash64(_)): DataFrame = {
    val pairs = graft.dedup.MinHashLsh.nearDuplicates(
      docs, textCol, idCol, threshold, numHashes, shingleSize, numBands, gramHash = gramHash)
    val comps = graft.dedup.ConnectedComponents.components(pairs, "id_a", "id_b")
    val withCluster = docs
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("comp"), col(idCol).cast("long")))
      .drop("comp")
    byGroup(withCluster, "cluster_id", weights, seed)
  }
}
