package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{FloatVec, VecSumAgg}

/** Embedding-column utilities: per-group centroids (mean pooling) and
  * unit normalization — the aggregation side of the similarity stack
  * (cluster centroids, per-domain embedding profiles, pooled chunk
  * vectors).
  */
object Embed {

  /** One row per group: member count and the mean vector, computed in a
    * single map-side-combined pass ([[VecSumAgg]]) — the shuffle carries
    * one dims×8-byte partial per (partition, group), never the members.
    */
  def centroids(df: DataFrame, vecCol: String, groupCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), VecSumAgg.vecSum(col(vecCol)).as("__vsum"))
      .withColumn("centroid", transform(col("__vsum"), x => x / col("n")))
      .drop("__vsum")

  /** Unit-normalized copy of a float vector (array<double>), one
    * codegen pass ([[graft.functions.FloatNormalize]] — the HOF form
    * would re-evaluate the norm per element, SURVEY §3).
    */
  def normalized(vec: Column): Column = FloatVec.normalize(vec)

  /** Matryoshka truncation (Kusupati 2022 MRL): the leading `d`
    * dimensions of an MRL-trained embedding are themselves a valid
    * lower-capacity embedding — the cheap serving tier (d=16 of 64 is
    * 4× less memory AND 4× less dot-product work per candidate) under
    * the same ids, with the full vector kept for re-ranking. Pure
    * row-local `slice` — no shuffle, codegen'd. Cosine over truncated
    * vectors needs NO renormalization (the norms divide out), so the
    * truncated tier composes with [[Cosine.topK]]/ANN unchanged.
    */
  def matryoshka(vec: Column, d: Int): Column = {
    require(d >= 1, "Embed.matryoshka: d must be >= 1")
    slice(vec, 1, d)
  }

  /** Truncated-tier brute-force top-k: [[Cosine.topK]] over the
    * leading `d` dims (the MRL shortlist stage; re-rank on the full
    * vectors downstream if the tier's recall needs it).
    */
  def matryoshkaTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      d: Int,
      k: Int): DataFrame = {
    def trunc(df: DataFrame) =
      df.withColumn("__mrl", matryoshka(col(vecCol), d))
        .drop(vecCol).withColumnRenamed("__mrl", vecCol)
    Cosine.topK(trunc(queries), trunc(corpus), idCol, vecCol, k)
  }

  /** Per-dimension standardization (z-scoring) of an embedding column —
    * the feature-scaling step in front of distance-based anything
    * (k-means, LSH bands, PCA whitening's cheap cousin). Fit is ONE
    * [[graft.functions.VecOuterAgg]] pass (only n, Σv and the diagonal
    * of Σvvᵀ are consumed; σ² uses the n−1 convention); the transform
    * is a row-local codegen array expression — no UDF, no shuffle.
    * Returns (means, stds, transformColumn-builder); dims with σ <
    * `eps` pass through centered-only (z = v − μ) rather than dividing
    * by ~0.
    */
  def standardizer(
      df: DataFrame,
      vecCol: String,
      eps: Double = 1e-12
  ): (Array[Double], Array[Double], Column => Column) = {
    val flat = df.agg(graft.functions.VecOuterAgg.vecOuter(col(vecCol)))
      .head().getSeq[Double](0).toArray
    require(flat.nonEmpty, "standardizer over an empty frame")
    val d = ((math.sqrt(9.0 + 8.0 * (flat.length - 1)) - 3.0) / 2.0).round.toInt
    val n = math.round(flat(0))
    require(n > 1, s"standardizer needs at least 2 rows, got $n")
    val mean = Array.tabulate(d)(i => flat(1 + i) / n)
    // q_ii sits at offset 1 + d + (i-th diagonal of the packed upper
    // triangle): rows of length d, d-1, ... before it
    val std = Array.tabulate(d) { i =>
      val qii = flat(1 + d + (0 until i).map(r => d - r).sum)
      math.sqrt(math.max(0.0, (qii - n * mean(i) * mean(i)) / (n - 1.0)))
    }
    val tf: Column => Column = v =>
      array((0 until d).map { i =>
        val centered = element_at(v, i + 1).cast("double") - lit(mean(i))
        if (std(i) < eps) centered else centered / lit(std(i))
      }: _*)
    (mean, std, tf)
  }

  /** Persist a fitted standardizer (one [[graft.sources.IndexCatalog]]
    * entry, kind `standardizer`) — fit once on the full corpus, z-score
    * any session's frames with the SAME μ/σ (refitting on a subset
    * would shift every z-score).
    */
  def saveStandardizer(
      spark: org.apache.spark.sql.SparkSession,
      mean: Array[Double],
      std: Array[Double],
      path: String
  ): Unit = {
    import spark.implicits._
    graft.sources.IndexCatalog.write(
      spark, path, "standardizer",
      Map("dim" -> mean.length.toString),
      Seq("dims" -> mean.indices.map(i => (i, mean(i), std(i))).toDF("dim", "mean", "std")))
  }

  /** Load a standardizer: the exact stored μ/σ plus the same row-local
    * transform builder [[standardizer]] returns.
    */
  def loadStandardizer(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      eps: Double = 1e-12
  ): (Array[Double], Array[Double], Column => Column) = {
    graft.sources.IndexCatalog.open(spark, path, "standardizer")
    val rows = graft.sources.IndexCatalog.part(spark, path, "dims")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val mean = rows.map(_._2)
    val std = rows.map(_._3)
    val d = mean.length
    val tf: Column => Column = v =>
      array((0 until d).map { i =>
        val centered = element_at(v, i + 1).cast("double") - lit(mean(i))
        if (std(i) < eps) centered else centered / lit(std(i))
      }: _*)
    (mean, std, tf)
  }

  /** Assign each vector to its nearest centroid (cosine): broadcast the
    * (tiny) centroid table, score with the codegen'd dot product. The
    * corpus is scanned once and never shuffled on vectors — same shape
    * as the brute-force scorer in [[Cosine.topK]].
    *
    * The argmax is a `min(struct(-cos, label))` aggregate, NOT a
    * `row_number` window: a window would shuffle all #vectors × #centroids
    * scored rows with zero map-side reduction, while the algebraic
    * aggregate's combiner collapses each vector's k candidates to one
    * partial row before the exchange (~10¹² → ~10⁹ rows at 1B docs × 1k
    * centroids). Struct ordering is lexicographic, so (-cos asc, label
    * asc) ≡ (cos desc, label asc) — ties keep the smallest label, same as
    * the window form. Pinned by a PlanSpec assertion (partial aggregate,
    * no Window exchange).
    */
  /** Simplified (centroid-based) silhouette per label (Vendramin 2010)
    * — the clustering-quality gauge for any labeled embedding set
    * ([[assign]]'s output, a k-means run, a source/topic partition):
    * per point, a = distance to its OWN centroid, b = the nearest
    * OTHER centroid, s = (b−a)/max(a,b) ∈ [−1, 1]; s ≈ 1 means tight
    * well-separated clusters, s < 0 means the point sits closer to a
    * foreign centroid. The classic all-pairs silhouette is O(n²); the
    * centroid form is the standard corpus-scale substitute — one
    * centroid pass + one row-local scoring pass against k broadcast
    * centroid literals (k·dims doubles folded into the plan, exact
    * double arithmetic throughout — no float round-trip).
    */
  def silhouette(df: DataFrame, vecCol: String, labelCol: String): DataFrame = {
    val cents = centroids(df, vecCol, labelCol)
      .select(col(labelCol), col("centroid"))
      .collect()
      .map(r => r.get(0) -> r.getSeq[Double](1))
    require(cents.length >= 2, "silhouette needs at least two labels")
    val v = col(vecCol).cast("array<double>")
    val dists = cents.map { case (lbl, c) =>
      val arr = array(c.map(lit): _*)
      lbl -> sqrt(greatest(
        lit(0.0),
        aggregate(
          zip_with(v, arr, (x, y) => (x - y) * (x - y)),
          lit(0.0),
          (acc, t) => acc + t)))
    }
    val a = coalesce(dists.map { case (l, d) => when(col(labelCol) === lit(l), d) }: _*)
    val b = least(dists.map { case (l, d) => when(col(labelCol) =!= lit(l), d) }: _*)
    df
      .withColumn("__a", a)
      .withColumn("__b", b)
      .withColumn(
        "__s",
        when(greatest(col("__a"), col("__b")) > 0,
          (col("__b") - col("__a")) / greatest(col("__a"), col("__b")))
          .otherwise(lit(0.0)))
      .groupBy(col(labelCol))
      .agg(
        count(lit(1)).as("n"),
        round(avg("__s"), 4).as("mean_sil"),
        round(avg("__a"), 4).as("mean_own_dist"),
        round(avg("__b"), 4).as("mean_other_dist"))
  }

  def assign(
      df: DataFrame,
      cents: DataFrame,
      vecCol: String,
      idCol: String,
      centIdCol: String = "label"
  ): DataFrame = {
    // Norms are hoisted OUT of the scored pair: the per-vector norm is a
    // projection below the broadcast join (evaluated once per row, not
    // once per (row, centroid) pair), and centroid norms are precomputed
    // in the tiny broadcast frame (the AnnGraph.withNorm convention).
    // Inside the join only the O(dims) dot product remains — at 1B docs
    // × 1k centroids this is 3× fewer flops in the hottest stage.
    val c = broadcast(
      cents
        .select(
          col(centIdCol).as("cent_label"),
          col("centroid").cast("array<float>").as("cvec"))
        .withColumn("cnorm", FloatVec.norm(col("cvec"))))
    df.select(col(idCol), col(vecCol))
      .withColumn("__vnorm", FloatVec.norm(col(vecCol)))
      .join(c)
      .withColumn(
        "cos",
        FloatVec.dot(col(vecCol), col("cvec")) / (col("__vnorm") * col("cnorm")))
      .groupBy(col(idCol))
      .agg(min(struct((-col("cos")).as("neg"), col("cent_label").as("lbl"))).as("__b"))
      .select(
        col(idCol),
        col("__b.lbl").as("assigned"),
        round(-col("__b.neg"), 4).as("cos"))
  }

  /** Embedding-population drift between two vector sets via MOMENT-BASED
    * MMD (Gretton 2012 with kernels whose MMD closes over first/second
    * moments — the 100 TB trick: no pairwise pass, ever): the linear
    * kernel gives MMD² = |μ_A − μ_B|² (pure mean shift), the degree-2
    * polynomial kernel (xᵀy + 1)² adds second-moment sensitivity via
    * E[k(x,y)] = ⟨M_A, M_B⟩_F + 2μ_Aᵀμ_B + 1 with M = E[xxᵀ] — drift in
    * covariance structure that a mean check misses (the embedding-space
    * complement of [[graft.ops]]' distributional drift monitors). Biased
    * V-statistic convention (population moments, no diagonal removal) —
    * documented; the monitor wants a stable scalar, not an unbiased test.
    *
    * Scale shape: ONE [[graft.functions.VecOuterAgg]] pass per side
    * ((1 + d + d(d+1)/2)-double partials, never a row) and closed forms
    * on the driver.
    */
  def mmdDrift(a: DataFrame, b: DataFrame, vecCol: String): DataFrame = {
    import graft.functions.VecOuterAgg
    def moments(df: DataFrame): (Long, Array[Double], Array[Array[Double]]) = {
      val flat = df.agg(VecOuterAgg.vecOuter(col(vecCol))).head().getSeq[Double](0).toArray
      require(flat.nonEmpty, "Embed.mmdDrift: empty side")
      val d = ((math.sqrt(9.0 + 8.0 * (flat.length - 1)) - 3.0) / 2.0).round.toInt
      val n = math.round(flat(0))
      require(n > 0, "Embed.mmdDrift: empty side")
      val mu = Array.tabulate(d)(i => flat(1 + i) / n)
      val m = Array.ofDim[Double](d, d)
      var p = 1 + d
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) { val v = flat(p) / n; m(i)(j) = v; m(j)(i) = v; p += 1; j += 1 }
        i += 1
      }
      (n, mu, m)
    }
    val (na, muA, ma) = moments(a)
    val (nb, muB, mb) = moments(b)
    require(muA.length == muB.length, "Embed.mmdDrift: dimension mismatch")
    val d = muA.length
    var lin = 0.0
    var i = 0
    while (i < d) { val t = muA(i) - muB(i); lin += t * t; i += 1 }
    def frob(x: Array[Array[Double]], y: Array[Array[Double]]): Double = {
      var acc = 0.0
      var r = 0
      while (r < d) { var c = 0; while (c < d) { acc += x(r)(c) * y(r)(c); c += 1 }; r += 1 }
      acc
    }
    def dot(x: Array[Double], y: Array[Double]): Double = {
      var acc = 0.0; var t = 0
      while (t < d) { acc += x(t) * y(t); t += 1 }
      acc
    }
    def kxy(mx: Array[Array[Double]], my: Array[Array[Double]],
        ux: Array[Double], uy: Array[Double]): Double =
      frob(mx, my) + 2.0 * dot(ux, uy) + 1.0
    val quad = kxy(ma, ma, muA, muA) + kxy(mb, mb, muB, muB) - 2.0 * kxy(ma, mb, muA, muB)
    val spark = a.sparkSession
    import spark.implicits._
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    Seq((na, nb, q6(lin), q6(math.sqrt(lin)), q6(quad)))
      .toDF("n_a", "n_b", "mmd2_lin", "mean_shift_l2", "mmd2_quad")
  }
}
