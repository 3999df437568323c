package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{FloatVec, PqOps, TopK}

/** IVF-PQ — the composed 100 TB ANN layout (Jégou et al. 2011, "IVFADC"):
  * the corpus is partitioned into IVF cells ([[AnnIvf]]) and each vector
  * is PQ-encoded ([[AnnPq]]) as the RESIDUAL against its cell centroid,
  * so a query (a) prunes to `nProbe` cells at PLANNING time (partition-
  * pruned scan) and (b) scans only m-byte codes inside them — the two
  * scale levers multiply: a 1000-cell / nProbe=10 / m=8 index reads
  * ~1/100 of the partitions at ~1/32 the bytes-per-row of the raw
  * float corpus.
  *
  * Residual encoding is what makes the composition more accurate than
  * PQ alone: within a cell, vectors share the centroid's direction, so
  * `v − c` occupies a far smaller ball than `v` and the same codebook
  * budget quantizes it with much less error. One GLOBAL residual
  * codebook is trained over a deterministic sample (FAISS's default
  * IVFPQ layout); per-cell codebooks would multiply training state by
  * #cells for marginal gain at these code sizes.
  *
  * Cosine scoring with residual codes, all from LUT sums:
  *   q·v̂      = q·c + Σ_sub lut_q[sub, code_sub]        (lut_q from the FULL query)
  *   ‖v̂‖²    = ‖c‖² + 2·Σ_sub cdot_c[sub, code_sub] + Σ_sub norm2[sub, code_sub]
  * where `cdot_c` (per-cell ⟨c_sub, codeword⟩ tables) and `norm2`
  * (codeword squared norms) are index-time constants — ‖v̂‖² is stored
  * per code row (8 bytes) at encode time, so the probe scan reads
  * (id, m-byte code, n2) and does m adds per candidate.
  *
  * Scale shape: index state is #cells×dims floats + m·k·dsub codebook
  * floats (driver-tiny by IVF/PQ definition); the probe scan is
  * partition-pruned AND code-sized (pinned by `SimSpec`); only
  * queries×rerank rows ever rejoin the fat vectors.
  */
object AnnIvfPq {

  /** Collected index state: cell centroids + global residual codebook —
    * k×dims + m·k·dsub floats, tiny by definition (same justification as
    * [[AnnIvf.literalCentroids]] / [[AnnPq.train]]).
    */
  final case class Index(cents: Array[(Long, Array[Float])], cb: AnnPq.Codebook) {

    def centsDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      cents.toSeq.map { case (cid, c) => (cid, c.toSeq) }.toDF("cid", "centroid")
        .select(col("cid"), col("centroid").cast("array<float>").as("centroid"))
    }

    /** Per-cell tables for the ‖v̂‖² reconstruction: ‖c‖² and the m·k
      * ⟨c_sub, codeword⟩ dots (PqAdc layout: entry (sub, cent) at
      * sub·k + cent).
      */
    def cellTablesDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      val m = cb.m; val k = cb.k; val dsub = cb.dsub
      cents.toSeq.map { case (cid, c) =>
        val cdot = new Array[Double](m * k)
        var i = 0
        while (i < m * k) {
          val sub = i / k
          var s = 0.0; var d = 0
          while (d < dsub) {
            s += c(sub * dsub + d).toDouble * cb.flat(i * dsub + d).toDouble
            d += 1
          }
          cdot(i) = s; i += 1
        }
        val cn2 = c.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
        (cid, cn2, cdot.toSeq)
      }.toDF("cid", "cnorm2", "cdot")
    }
  }

  /** Train the index: IVF centroids (deterministic Lloyd, [[AnnIvf]]) +
    * one residual codebook over the `sampleN` lowest-id residuals.
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int = 16,
      m: Int = 8,
      kCent: Int = 16,
      sampleN: Int = 2048,
      lloydIters: Int = 2
  ): Index = {
    val centsDf = AnnIvf.centroids(corpus, idCol, vecCol, numCentroids, lloydIters)
    val cents = centsDf.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val res = residuals(corpus, centsDf, idCol, vecCol)
    val cb = AnnPq.train(res, idCol, "residual", m, kCent, sampleN)
    Index(cents, cb)
  }

  /** Persist the index STATE (centroids + codebook) next to the code
    * layout — the piece that makes [[writePartitioned]] a real on-disk
    * index: without it a fresh session would have to re-train, and a
    * re-trained codebook scores the stored codes as garbage. Same
    * train-once-serve-anywhere convention as the tokenizer vocabs
    * ([[graft.text.Bpe.saveVocab]]); driver-bounded by construction
    * (the index IS broadcast state). One [[graft.sources.IndexCatalog]]
    * entry: `centroids` + `codebook` parts.
    */
  def saveIndex(spark: SparkSession, index: Index, path: String): Unit = {
    import spark.implicits._
    graft.sources.IndexCatalog.write(
      spark, path, "ivfpq",
      Map("m" -> index.cb.m.toString, "k" -> index.cb.k.toString),
      Seq(
        "centroids" -> index.centsDf(spark),
        "codebook" -> Seq((index.cb.m, index.cb.k, index.cb.dsub, index.cb.flat.toSeq))
          .toDF("m", "k", "dsub", "flat")))
  }

  def loadIndex(spark: SparkSession, path: String): Index = {
    graft.sources.IndexCatalog.open(spark, path, "ivfpq")
    val cents = graft.sources.IndexCatalog.part(spark, path, "centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val cb = graft.sources.IndexCatalog.part(spark, path, "codebook").head()
    Index(cents, AnnPq.Codebook(
      cb.getInt(0), cb.getInt(1), cb.getInt(2), cb.getSeq[Float](3).toArray))
  }

  /** [[saveIndex]] for the per-cell-codebook variant: catalog kind
    * `ivfpq_percell`, `centroids` + `codebooks` (one row per cell).
    */
  def saveIndexPerCell(spark: SparkSession, index: IndexPerCell, path: String): Unit = {
    import spark.implicits._
    graft.sources.IndexCatalog.write(
      spark, path, "ivfpq_percell",
      Map("cells" -> index.cbs.length.toString),
      Seq(
        "centroids" -> index.centsDf(spark),
        "codebooks" -> index.cbs.toSeq
          .map { case (cid, cb) => (cid, cb.m, cb.k, cb.dsub, cb.flat.toSeq) }
          .toDF("cid", "m", "k", "dsub", "flat")))
  }

  def loadIndexPerCell(spark: SparkSession, path: String): IndexPerCell = {
    graft.sources.IndexCatalog.open(spark, path, "ivfpq_percell")
    val cents = graft.sources.IndexCatalog.part(spark, path, "centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    val cbs = graft.sources.IndexCatalog.part(spark, path, "codebooks")
      .collect()
      .map(r => (r.getLong(0), AnnPq.Codebook(
        r.getInt(1), r.getInt(2), r.getInt(3), r.getSeq[Float](4).toArray)))
      .sortBy(_._1)
    IndexPerCell(cents, cbs)
  }

  /** (id, cid, residual = v − centroid_cid) — one broadcast argmax +
    * one broadcast centroid join; the corpus is never shuffled.
    */
  def residuals(
      corpus: DataFrame,
      cents: DataFrame,
      idCol: String,
      vecCol: String
  ): DataFrame =
    corpus
      .select(col(idCol), col(vecCol))
      .join(AnnIvf.assign(corpus, cents, idCol, vecCol), Seq(idCol))
      .join(broadcast(cents), Seq("cid"))
      .select(
        col(idCol),
        col("cid"),
        zip_with(col(vecCol), col("centroid"), (a, b) => (a - b).cast("float"))
          .as("residual"))

  /** (id, cid, code binary[m], n2 = ‖ĉ+r̂‖²) — the full code table. The
    * stored n2 is the RECONSTRUCTION's norm (what ADC actually scores
    * against), assembled from index-time LUT sums, never from re-decoded
    * vectors.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, index: Index): DataFrame = {
    val spark = corpus.sparkSession
    val cbL = typedLit(index.cb.flat.toSeq)
    val norm2 = typedLit(index.cb.norm2Table.toSeq)
    residuals(corpus, index.centsDf(spark), idCol, vecCol)
      .withColumn("code", PqOps.encode(col("residual"), cbL, index.cb.dsub))
      .join(broadcast(index.cellTablesDf(spark)), Seq("cid"))
      .withColumn(
        "n2",
        col("cnorm2") + lit(2.0) * PqOps.adc(col("code"), col("cdot")) +
          PqOps.adc(col("code"), norm2))
      .select(col(idCol), col("cid"), col("code"), col("n2"))
  }

  /** Materialize the code table PARTITIONED BY CELL — the layout
    * [[topKPartitioned]] prunes against.
    */
  def writePartitioned(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      index: Index,
      path: String
  ): Unit =
    encode(corpus, idCol, vecCol, index)
      .write
      .mode("overwrite")
      .partitionBy("cid")
      .parquet(path)

  /** Incrementally add documents to an existing partitioned layout:
    * encode the batch with the EXISTING index (same centroids, same
    * residual codebook — so old and new codes score identically) and
    * append into the cell partitions. This is the 100 TB maintenance
    * path: a daily crawl lands as one encode + append, no index rebuild;
    * re-train only when the embedding distribution drifts.
    */
  def appendPartitioned(
      newDocs: DataFrame,
      idCol: String,
      vecCol: String,
      index: Index,
      path: String
  ): Unit =
    encode(newDocs, idCol, vecCol, index)
      .write
      .mode("append")
      .partitionBy("cid")
      .parquet(path)

  /** PER-CELL residual codebooks — the skewed-corpus variant. One global
    * codebook (the [[Index]] default) assumes residual distributions are
    * comparable across cells; on a skewed corpus (cells of very
    * different size, spread, or local structure — the usual shape of a
    * web crawl clustered by domain) the global sample is dominated by
    * the big cells and the small cells' residuals quantize poorly.
    * Training one codebook per cell on THAT cell's own residuals fixes
    * it at the cost of ×#cells index state: #cells × (dims + m·k·dsub)
    * floats — still driver-bounded by construction (#cells and the
    * codebook dims are index parameters, not data-sized).
    *
    * Scoring is unchanged m-adds ADC; the only difference is that the
    * LUT is built per (query, probed cell) from that cell's codebook —
    * nProbe LUTs per query instead of one, all from the same broadcast
    * cell table.
    */
  final case class IndexPerCell(
      cents: Array[(Long, Array[Float])],
      cbs: Array[(Long, AnnPq.Codebook)]
  ) {
    def dsub: Int = cbs.head._2.dsub

    def centsDf(spark: SparkSession): DataFrame = Index(cents, cbs.head._2).centsDf(spark)

    /** One broadcast row per cell: flat codebook + everything the n2
      * reconstruction needs (codeword norm2 table, ⟨c_sub, codeword⟩
      * table, ‖c‖²).
      */
    def cellDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      val byCid = cents.toMap
      cbs.toSeq.map { case (cid, cb) =>
        val c = byCid(cid)
        val cdot = new Array[Double](cb.m * cb.k)
        var i = 0
        while (i < cb.m * cb.k) {
          val sub = i / cb.k
          var s = 0.0; var d = 0
          while (d < cb.dsub) {
            s += c(sub * cb.dsub + d).toDouble * cb.flat(i * cb.dsub + d).toDouble
            d += 1
          }
          cdot(i) = s; i += 1
        }
        val cn2 = c.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
        (cid, cb.flat.toSeq, cb.norm2Table.toSeq, cdot.toSeq, cn2)
      }.toDF("cid", "cbflat", "norm2", "cdot", "cnorm2")
        .select(
          col("cid"), col("cbflat").cast("array<float>").as("cbflat"),
          col("norm2"), col("cdot"), col("cnorm2"))
    }
  }

  /** Train per-cell codebooks: same IVF centroids, then each cell's
    * codebook trains on the `samplePerCell` lowest-id residuals OF THAT
    * CELL (bounded-heap per-key sample — one distributed pass, driver
    * sees ≤ #cells × samplePerCell rows).
    */
  def buildPerCell(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int = 16,
      m: Int = 8,
      kCent: Int = 16,
      samplePerCell: Int = 1024,
      lloydIters: Int = 2
  ): IndexPerCell = {
    val centsDf = AnnIvf.centroids(corpus, idCol, vecCol, numCentroids, lloydIters)
    val cents = centsDf.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val res = residuals(corpus, centsDf, idCol, vecCol)
      .withColumn("__g", -col(idCol).cast("double"))
    val sampled = TopK
      .perKey(res, Seq("cid"), "__g", "residual", samplePerCell)
      .select(col("cid"), col("__g"), col("residual"))
      .collect()
      // deterministic training order: ascending id within each cell
      .map(r => (r.getLong(0), -r.getDouble(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1)
    val cbs = cents.map { case (cid, _) =>
      val cellSample = sampled.get(cid) match {
        case Some(rows) => rows.sortBy(_._2).map(_._3)
        case None => Array(cents.find(_._1 == cid).get._2.map(_ => 0f)) // empty cell
      }
      (cid, AnnPq.trainLocal(cellSample, m, kCent))
    }
    IndexPerCell(cents, cbs)
  }

  /** Code table against per-cell codebooks: same output schema as
    * [[encode]] — (id, cid, code, n2) — so the partitioned write/probe
    * machinery applies unchanged.
    */
  def encodePerCell(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      index: IndexPerCell
  ): DataFrame = {
    val spark = corpus.sparkSession
    residuals(corpus, index.centsDf(spark), idCol, vecCol)
      .join(broadcast(index.cellDf(spark)), Seq("cid"))
      .withColumn("code", PqOps.encode(col("residual"), col("cbflat"), index.dsub))
      .withColumn(
        "n2",
        col("cnorm2") + lit(2.0) * PqOps.adc(col("code"), col("cdot")) +
          PqOps.adc(col("code"), col("norm2")))
      .select(col(idCol), col("cid"), col("code"), col("n2"))
  }

  /** [[topK]] with per-cell codebooks: identical probe shape, but each
    * (query, probed cell) row builds its LUT from that cell's codebook.
    */
  def topKPerCell(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      m: Int = 8,
      kCent: Int = 16,
      nProbe: Int = 4,
      rerank: Int = 0,
      samplePerCell: Int = 1024,
      lloydIters: Int = 2
  ): DataFrame = {
    val index = buildPerCell(corpus, idCol, vecCol, numCentroids, m, kCent,
      samplePerCell, lloydIters)
    val spark = queries.sparkSession
    val codes = encodePerCell(corpus, idCol, vecCol, index)
      .withColumnRenamed(idCol, "nid")
    val cents = index.centsDf(spark)
    val scored = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("qc", FloatVec.dot(col("qv"), col("centroid")))
      .withColumn(
        "cscore",
        col("qc") / (FloatVec.norm(col("qv")) * FloatVec.norm(col("centroid"))))
    val probes = scored
      .groupBy(col("qid"))
      .agg(
        TopK.agg(col("cscore"), struct(col("cid"), col("qc")), nProbe).as("__cells"),
        first(col("qv")).as("qv"))
      .select(col("qid"), col("qv"), explode(col("__cells")).as("__kv"))
      .select(
        col("qid"), col("qv"),
        FloatVec.norm(col("qv")).as("qnorm"),
        col("__kv.payload.cid").as("cid"),
        col("__kv.payload.qc").as("qc"))
      .join(broadcast(index.cellDf(spark).select(col("cid"), col("cbflat"))), Seq("cid"))
      .withColumn("lut", PqOps.lut(col("qv"), col("cbflat"), index.dsub))
      .drop("cbflat")
    adcTopK(codes, probes, corpus, idCol, vecCol, k, rerank)
  }

  /** Per-query probe rows: the nProbe best cells by centroid cosine,
    * with everything ADC scoring needs precomputed once per query —
    * lut (from the FULL query vector), qnorm, q·c per probed cell.
    */
  private def probeFrame(
      queries: DataFrame,
      index: Index,
      idCol: String,
      vecCol: String,
      nProbe: Int
  ): DataFrame = {
    val spark = queries.sparkSession
    val cents = index.centsDf(spark)
    val cbL = typedLit(index.cb.flat.toSeq)
    // nProbe best cells via the bounded-heap TopK aggregate; q·c rides
    // in the payload struct (cid leads, so the tie-break is unchanged)
    val scored = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("qc", FloatVec.dot(col("qv"), col("centroid")))
      .withColumn("cscore", col("qc") / (FloatVec.norm(col("qv")) * FloatVec.norm(col("centroid"))))
    scored
      .groupBy(col("qid"))
      .agg(
        TopK.agg(col("cscore"), struct(col("cid"), col("qc")), nProbe).as("__cells"),
        first(col("qv")).as("qv"))
      .select(col("qid"), col("qv"), explode(col("__cells")).as("__kv"))
      .select(
        col("qid"),
        col("qv"),
        FloatVec.norm(col("qv")).as("qnorm"),
        PqOps.lut(col("qv"), cbL, index.cb.dsub).as("lut"),
        col("__kv.payload.cid").as("cid"),
        col("__kv.payload.qc").as("qc"))
  }

  /** ADC top-k over a code table (broadcast probes ⋈ codes on cid), with
    * optional exact re-rank against the fat corpus.
    */
  private def adcTopK(
      codes: DataFrame,
      probes: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rerank: Int
  ): DataFrame = {
    val short = math.max(k, rerank)
    // bounded-heap ADC shortlist: the partition-pruned code scan reduces
    // map-side to `short` rows per query per partition — no window
    // exchange of the scored candidate frame
    val scored = codes
      .join(broadcast(probes), Seq("cid"))
      .where(col("qid") =!= col("nid"))
      .withColumn(
        "adc_cos",
        (col("qc") + PqOps.adc(col("code"), col("lut"))) /
          (col("qnorm") * sqrt(col("n2"))))
    val shortlist = TopK.perKey(scored, Seq("qid"), "adc_cos", "nid", short, carry = Seq("qv"))
    if (rerank <= 0)
      shortlist.select(col("qid"), col("nid"), round(col("adc_cos"), 4).as("cos_sim"))
    else {
      val exact = shortlist
        .select(col("qid"), col("qv"), col("nid"))
        .join(corpus.select(col(idCol).as("nid"), col(vecCol).as("nv")), Seq("nid"))
        .withColumn(
          "cos_sim",
          FloatVec.dot(col("qv"), col("nv")) /
            (FloatVec.norm(col("qv")) * FloatVec.norm(col("nv"))))
      TopK.perKey(exact, Seq("qid"), "cos_sim", "nid", k)
        .select(col("qid"), col("nid"), round(col("cos_sim"), 4).as("cos_sim"))
    }
  }

  /** In-memory composition (build + encode + probe in one call): cells
    * are pruned logically by the cid join. Use [[writePartitioned]] +
    * [[topKPartitioned]] for the materialized layout where pruning
    * happens at the scan.
    */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      m: Int = 8,
      kCent: Int = 16,
      nProbe: Int = 4,
      rerank: Int = 0,
      sampleN: Int = 2048,
      lloydIters: Int = 2
  ): DataFrame = {
    val index = build(corpus, idCol, vecCol, numCentroids, m, kCent, sampleN, lloydIters)
    val codes = encode(corpus, idCol, vecCol, index)
      .withColumnRenamed(idCol, "nid")
    adcTopK(codes, probeFrame(queries, index, idCol, vecCol, nProbe), corpus,
      idCol, vecCol, k, rerank)
  }

  /** Probe a cell-partitioned code table: the probed-cell set (bounded
    * by #queries × nProbe longs) prunes the scan at planning time —
    * `PartitionFilters` on cid, ReadSchema = (id, code, n2), never the
    * vectors. Only the re-rank shortlist touches `corpus`.
    */
  def topKPartitioned(
      queries: DataFrame,
      index: Index,
      path: String,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4,
      rerank: Int = 0
  ): DataFrame = {
    val spark = queries.sparkSession
    val probes = probeFrame(queries, index, idCol, vecCol, nProbe)
    val probedCells = probes.select("cid").distinct().collect().map(_.getLong(0).toInt)
    val codes = spark.read
      .parquet(path)
      .where(col("cid").isin(probedCells: _*)) // partition-pruned scan
      .select(
        col(idCol).as("nid"), col("code"), col("n2"), col("cid").cast("long").as("cid"))
    adcTopK(codes, probes, corpus, idCol, vecCol, k, rerank)
  }
}
