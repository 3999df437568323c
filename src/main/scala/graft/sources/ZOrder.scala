package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered parquet layout — the multi-column
  * data-skipping half of the 100 TB storage strategy, complementing
  * [[Bucketed]] (which serves ONE equi-join key). A linear sort layout
  * skips brilliantly on its leading column and not at all on any other;
  * interleaving the bits of several columns' quantile-bucket ranks
  * gives every participating column locality, so parquet min/max
  * statistics prune row groups for selective predicates on ANY of them
  * (the layout move behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * Scale shape: one `approxQuantile` pass computes 2^bits − 1 boundary
  * values per column (driver state: bits·columns doubles); the z-key is
  * then a pure codegen'd row expression (boundary-fold bucketing + bit
  * interleave — no UDF, no shuffle beyond the ONE range partition that
  * any clustered rewrite needs); files come out range-partitioned and
  * sorted by the z-key. Quantile buckets (not uniform ranges) keep the
  * curve balanced under skew — every bucket holds ≈ the same row mass,
  * so no z-prefix becomes a hot file. The write is layout-only: schema
  * and row set are untouched (read-back equality is spec-pinned, as is
  * the row-group pruning win vs a single-column sort).
  */
object ZOrder {

  /** Quantile-bucket rank of `c` given ascending boundaries: the number
    * of boundaries ≤ value, a codegen'd fold over a literal array —
    * rows with NULL sort to bucket 0 (the curve origin).
    */
  private def bucketOf(c: Column, boundaries: Array[Double]): Column =
    aggregate(
      typedlit(boundaries),
      lit(0),
      (acc, b) => acc + when(c.isNotNull && c.cast("double") >= b, 1).otherwise(0))

  /** The interleaved Morton key: bit i of column j's bucket rank lands
    * at position i·ncols + j. With `bits` ≤ 20 and ≤ 3 columns the key
    * fits comfortably in a long.
    */
  private def morton(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.length
    val terms = for {
      (b, j) <- buckets.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), i * n + j)
    terms.reduce(_ + _)
  }

  /** The z-key column for `cols` on `df`'s data distribution: per-column
    * quantile boundaries (one stat pass, `relErr` accuracy is plenty —
    * boundary wobble only shifts rows between ADJACENT buckets) feeding
    * the Morton interleave. Exposed for tests and for callers composing
    * their own rewrite.
    */
  def zKey(df: DataFrame, cols: Seq[String], bits: Int = 8, relErr: Double = 0.001): Column =
    zKeyOf(cols, fitBoundaries(df, cols, bits, relErr), bits)

  /** The boundary half of [[zKey]]: one `approxQuantile` pass, distinct
    * ascending boundaries per column. Split out so the boundaries can be
    * PERSISTED — an append to a z-ordered table must bucket by the SAME
    * boundaries as the original write, or the interleaved ranks (and so
    * the row-group clustering the reader's skipping relies on) silently
    * shift between the old and new files.
    */
  private def validate(cols: Seq[String], bits: Int): Unit = {
    require(cols.size >= 2, "z-ordering one column is a plain sort — use sortWithinPartitions")
    require(bits >= 1 && bits * cols.size <= 62, s"z-key would overflow a long")
  }

  def fitBoundaries(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 8,
      relErr: Double = 0.001
  ): Seq[Array[Double]] = {
    validate(cols, bits)
    val nB = (1 << bits) - 1
    val probs = (1 to nB).map(_.toDouble / (nB + 1)).toArray
    df.stat.approxQuantile(cols.toArray, probs, relErr).map(_.distinct.sorted).toSeq
  }

  /** The pure-expression half of [[zKey]]: bucket folds + Morton
    * interleave over GIVEN boundaries (no data pass). Validates the
    * same overflow/arity rules as the fitting half — direct callers
    * (append writers) get the same fail-fast as [[zKey]].
    */
  def zKeyOf(cols: Seq[String], bounds: Seq[Array[Double]], bits: Int): Column = {
    validate(cols, bits)
    require(cols.size == bounds.size, "one boundary set per column")
    morton(cols.zip(bounds).map { case (c, b) => bucketOf(col(c), b) }, bits)
  }

  /** Persist fitted boundaries as an [[IndexCatalog]] entry (kind
    * `zorder`): props carry the column list and bit width, the
    * `boundaries` part holds (col, pos, bound) rows. Broadcast-sized by
    * construction (≤ cols × 2^bits doubles).
    */
  def saveBoundaries(
      spark: SparkSession,
      indexPath: String,
      cols: Seq[String],
      bits: Int,
      bounds: Seq[Array[Double]]
  ): Unit = {
    import spark.implicits._
    validate(cols, bits)
    require(cols.size == bounds.size, "one boundary set per column")
    require(!cols.exists(_.contains(",")), "column names must not contain ','")
    val rows = cols.zip(bounds).flatMap { case (c, b) =>
      b.zipWithIndex.map { case (v, i) => (c, i, v) }
    }
    IndexCatalog.write(
      spark,
      indexPath,
      "zorder",
      Map("cols" -> cols.mkString(","), "bits" -> bits.toString),
      Seq("boundaries" -> rows.toDF("col", "pos", "bound")))
  }

  /** Load a persisted boundary entry: (cols, bits, boundaries). */
  def loadBoundaries(
      spark: SparkSession,
      indexPath: String
  ): (Seq[String], Int, Seq[Array[Double]]) = {
    val meta = IndexCatalog.open(spark, indexPath, "zorder")
    val cols = meta.prop("cols").split(",").toSeq
    val bits = meta.propInt("bits")
    val byCol = IndexCatalog
      .part(spark, indexPath, "boundaries")
      .collect()
      .groupBy(_.getString(0))
      .map { case (c, rows) =>
        c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
    // a column whose fit produced no boundaries (all-null/NaN input —
    // approxQuantile's contract) has no rows in the part; reconstruct
    // it as the empty set, which buckets every row to 0 exactly like
    // the in-session zKey did
    (cols, bits, cols.map(c => byCol.getOrElse(c, Array.empty[Double])))
  }

  /** The z-key expression a persisted entry defines — what an APPEND
    * writer (or a reader reproducing the clustering) uses instead of
    * re-sketching quantiles on its own slice of data.
    */
  def zKeyIndexed(spark: SparkSession, indexPath: String): Column = {
    val (cols, bits, bounds) = loadBoundaries(spark, indexPath)
    zKeyOf(cols, bounds, bits)
  }

  /** Rewrite `df` at `path` clustered on the z-curve of `cols`:
    * range-partition into `files` output files by z-key, sort within
    * each, drop the key (it is layout, not data). Row-group size then
    * bounds the skipping granularity — at the target scale pair this
    * with `parquet.block.size` ≈ 128 MB so one row group ≈ one task.
    */
  def write(df: DataFrame, path: String, cols: Seq[String], files: Int, bits: Int = 8): Unit =
    df.withColumn("__z", zKey(df, cols, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
