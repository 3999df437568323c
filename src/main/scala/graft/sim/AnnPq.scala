package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{FloatVec, PqOps, TopK}

/** Product-quantization ANN (Jégou et al. 2011): compress each corpus
  * vector to `m` code bytes against per-subspace codebooks, score
  * queries with asymmetric distance (LUT lookups), optionally re-rank
  * the top shortlist with exact cosine.
  *
  * Why this is the 100 TB memory-bound scan fixed: a d=256 float corpus
  * is 1 KB/vector; PQ at m=16 is 16 B/vector — a 64× smaller scan, and
  * each candidate costs m table adds instead of d multiplies. Training
  * state is m·k·dsub floats (e.g. 16·256·16 = 64 K) — driver-tiny by
  * definition, same justification as [[AnnIvf]]'s centroid collect.
  * Compose with IVF cells ([[AnnIvf.writePartitionedByCell]]) for the
  * full IVF-PQ layout: prune cells, then ADC-scan only probed cells.
  *
  * Determinism: codebooks are trained on the `sampleN` lowest-id
  * vectors with k-means seeded by the first k subvectors and a fixed
  * iteration count — the same inputs always produce the same index.
  */
object AnnPq {

  /** Flattened codebook [m·k·dsub floats] + squared-norm table [m·k]. */
  final case class Codebook(m: Int, k: Int, dsub: Int, flat: Array[Float]) {
    def norm2Table: Array[Double] = {
      val out = new Array[Double](m * k)
      var i = 0
      while (i < m * k) {
        var s = 0.0; var d = 0
        while (d < dsub) { s += flat(i * dsub + d).toDouble * flat(i * dsub + d); d += 1 }
        out(i) = s; i += 1
      }
      out
    }
  }

  /** Driver-side per-subspace Lloyd on a bounded, deterministic sample.
    * The sample is `sampleN` rows of `dsub` floats × m subspaces — small
    * by construction; training never touches the full corpus.
    */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      k: Int,
      sampleN: Int = 2048,
      iters: Int = 4
  ): Codebook = {
    val sample = corpus
      .orderBy(col(idCol))
      .limit(sampleN)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    trainLocal(sample, m, k, iters)
  }

  /** The per-subspace Lloyd loop on an in-memory sample — shared by the
    * global trainer above and [[AnnIvfPq.buildPerCell]]'s per-cell
    * trainers. Deterministic for a fixed sample order.
    */
  def trainLocal(sample: Array[Array[Float]], m: Int, k: Int, iters: Int = 4): Codebook = {
    require(sample.nonEmpty, "empty training sample")
    val dims = sample.head.length
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val dsub = dims / m
    val flat = new Array[Float](m * k * dsub)

    var sub = 0
    while (sub < m) {
      // k-means on the sub-vectors of this subspace, seeded with the
      // first k DISTINCT subvectors (duplicate seeds would strand a
      // centroid: ties argmin to the lowest index, so the clone never
      // receives a point and never moves)
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub))
      val seeds = scala.collection.mutable.ArrayBuffer[Array[Float]]()
      val seen = scala.collection.mutable.HashSet[Seq[Float]]()
      pts.iterator.takeWhile(_ => seeds.length < k).foreach { p =>
        if (seen.add(p.toSeq)) seeds += p.clone()
      }
      val cents = if (seeds.nonEmpty) seeds.toArray else Array(pts.head.clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cents.length)(new Array[Double](dsub))
        val cnt = new Array[Int](cents.length)
        pts.foreach { p =>
          var best = Double.MaxValue; var bi = 0; var c = 0
          while (c < cents.length) {
            var s = 0.0; var d = 0
            while (d < dsub) { val df = p(d) - cents(c)(d); s += df * df; d += 1 }
            if (s < best) { best = s; bi = c }
            c += 1
          }
          cnt(bi) += 1
          var d = 0
          while (d < dsub) { sums(bi)(d) += p(d); d += 1 }
        }
        var c = 0
        while (c < cents.length) {
          if (cnt(c) > 0) {
            var d = 0
            while (d < dsub) { cents(c)(d) = (sums(c)(d) / cnt(c)).toFloat; d += 1 }
          } // empty cluster: keep the old centroid (deterministic)
          c += 1
        }
        it += 1
      }
      var c = 0
      while (c < k) {
        val src = cents(math.min(c, cents.length - 1))
        System.arraycopy(src, 0, flat, (sub * k + c) * dsub, dsub)
        c += 1
      }
      sub += 1
    }
    Codebook(m, k, dsub, flat)
  }

  private def cbLit(cb: Codebook): Column = typedLit(cb.flat.toSeq)

  /** (idCol, code binary) — m bytes per vector. */
  def encode(df: DataFrame, idCol: String, vecCol: String, cb: Codebook): DataFrame =
    df.select(col(idCol), PqOps.encode(col(vecCol), cbLit(cb), cb.dsub).as("code"))

  /** Approximate top-k by ADC cosine; `rerank > k` fetches that many
    * candidates per query by ADC score and re-scores them with exact
    * cosine against the full vectors (only queries×rerank rows ever
    * rejoin the fat corpus).
    */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 8,
      kCent: Int = 16,
      rerank: Int = 0,
      sampleN: Int = 2048
  ): DataFrame =
    topKWith(queries, corpus, idCol, vecCol, train(corpus, idCol, vecCol, m, kCent, sampleN), k, rerank)

  /** [[topK]] under a prebuilt codebook — the serve path for persisted
    * index state ([[graft.sim.Opq.loadIndex]]): no training pass.
    */
  def topKWith(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebook,
      k: Int,
      rerank: Int = 0
  ): DataFrame = {
    val codes = encode(corpus, idCol, vecCol, cb)
      .withColumnRenamed(idCol, "nid")
    // query side: LUT once per query; corpus codes are scanned once and
    // never shuffled (queries broadcast, same shape as Cosine.topK)
    val qs = queries.select(
      col(idCol).as("qid"),
      col(vecCol).as("qv"),
      PqOps.lut(col(vecCol), cbLit(cb), cb.dsub).as("lut"),
      FloatVec.norm(col(vecCol)).as("qnorm"))
    val norm2 = typedLit(cb.norm2Table.toSeq)

    val short = math.max(k, rerank)
    // bounded-heap shortlist (TopK aggregate): the code-sized ADC scan
    // reduces map-side to `short` rows per query per partition instead of
    // exchanging every scored code through a window sort
    val scored = codes
      .crossJoin(broadcast(qs))
      .where(col("qid") =!= col("nid"))
      .withColumn(
        "adc_cos",
        PqOps.adc(col("code"), col("lut")) /
          (col("qnorm") * sqrt(PqOps.adc(col("code"), norm2))))
    val shortlist = TopK.perKey(scored, Seq("qid"), "adc_cos", "nid", short, carry = Seq("qv"))

    if (rerank <= 0)
      shortlist.select(col("qid"), col("nid"), round(col("adc_cos"), 4).as("cos_sim"))
    else {
      val exact = shortlist
        .select(col("qid"), col("qv"), col("nid"))
        .join(corpus.select(col(idCol).as("nid"), col(vecCol).as("nv")), Seq("nid"))
        .withColumn(
          "cos_sim",
          FloatVec.dot(col("qv"), col("nv")) / (FloatVec.norm(col("qv")) * FloatVec.norm(col("nv"))))
      TopK.perKey(exact, Seq("qid"), "cos_sim", "nid", k)
        .select(col("qid"), col("nid"), round(col("cos_sim"), 4).as("cos_sim"))
    }
  }
}
