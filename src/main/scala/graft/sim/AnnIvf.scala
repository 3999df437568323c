package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{FloatVec, TopK}

/** IVF (inverted-file) approximate nearest neighbors — the clustered
  * alternative to [[AnnLsh]] (SURVEY.md §2 P7).
  *
  * Build: deterministic seeding (lowest-id vectors) + a fixed number of
  * Lloyd rounds, all as DataFrame ops: assignment is a broadcast
  * cross-join argmax (`max_by`), centroid update is a posexplode +
  * groupBy(cid, dim) average. Probe: rank centroids per query, search
  * only the `nProbe` best cells — at 100 TB the corpus is partitioned by
  * cell, so a query touches nProbe partitions instead of everything.
  */
object AnnIvf {

  private def cosScore(vec: Column, cent: Column): Column =
    FloatVec.dot(vec, cent) / (FloatVec.norm(vec) * FloatVec.norm(cent))

  /** (cid, centroid array<float>) — deterministic k centroids. */
  def centroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      lloydIters: Int = 2
  ): DataFrame = {
    var cents = literalCentroids(
      corpus.sparkSession,
      corpus
        .orderBy(col(idCol))
        .limit(k)
        .select(col(idCol).cast("long").as("cid"), col(vecCol).as("centroid"))
    )
    for (_ <- 0 until lloydIters) {
      val assigned = assign(corpus, cents, idCol, vecCol)
      val updated = assigned
        .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cid"))
        .agg(
          transform(
            array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m").cast("float")
          ).as("centroid")
        )
      // centroids are k×dims floats — tiny BY DEFINITION of IVF. Collect
      // and rebuild as literals each round: otherwise the Lloyd lineage
      // (broadcast within broadcast per round) re-evaluates downstream
      // and the plan grows with every iteration.
      cents = literalCentroids(corpus.sparkSession, updated)
    }
    cents
  }

  /** Converged-centroid fit: the centroid frame plus how it got there
    * (Lloyd iterations actually run; the final max centroid movement,
    * measured as 1 − cos(old, new) per centroid — 1.0 for a cell that
    * emptied).
    */
  final case class CentroidFit(cents: DataFrame, iters: Int, lastShift: Double)

  /** Lloyd iterations run to TOLERANCE, with k-means|| seeding as the
    * default — the hardened build for skewed corpora, where the fixed
    * lowest-id seeding of [[centroids]] can plant every seed inside one
    * dominant cluster and a fixed two rounds never escape it.
    *
    * Seeding (Bahmani et al. 2012, made deterministic): starting from
    * the lowest-id vector, each round scores every point by its cosine
    * distance d to the current candidate set and draws `oversample·k`
    * points WITHOUT replacement with probability ∝ d² via exponential
    * races (Efraimidis–Spirakis keys d²/−ln u) — u is a hash-uniform of
    * (id, round), so the draw is reproducible on any cluster. The
    * ≤ 1+rounds·oversample·k candidates are weighted by one assignment
    * pass and greedily thinned to k on the driver (weight × squared
    * distance to the chosen set — the kmeans++ criterion, argmax form).
    * Each round is one broadcast cross-join + a distributed top-l; the
    * corpus never shuffles.
    */
  def centroidsConverged(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxIters: Int = 20,
      tol: Double = 1e-4,
      kmeansParInit: Boolean = true,
      initRounds: Int = 3,
      oversample: Int = 2
  ): CentroidFit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def localCos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length && i < b.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else d / math.sqrt(na * nb)
    }
    var local: Array[(Long, Array[Float])] =
      if (kmeansParInit)
        kmeansParSeeds(corpus, idCol, vecCol, k, initRounds, oversample)
          .zipWithIndex.map { case (v, i) => (i.toLong, v) }
      else
        corpus.orderBy(col(idCol)).limit(k)
          .select(col(idCol).cast("long"), col(vecCol)).as[(Long, Seq[Float])]
          .collect().map { case (id, v) => (id, v.toArray) }
    var cents = local.map { case (c, v) => (c, v.toSeq) }.toSeq.toDF("cid", "centroid")
      .select(col("cid"), col("centroid").cast("array<float>").as("centroid"))
    var iters = 0
    var shift = Double.MaxValue
    while (iters < maxIters && shift >= tol) {
      iters += 1
      val assigned = assign(corpus, cents, idCol, vecCol)
      val updated = assigned
        .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cid"))
        .agg(
          transform(
            array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m").cast("float")
          ).as("centroid"))
        .as[(Long, Seq[Float])].collect().map { case (c, v) => (c, v.toArray) }
      val prev = local.toMap
      shift = updated.map { case (c, v) =>
        prev.get(c).map(o => 1.0 - localCos(o, v)).getOrElse(1.0)
      }.foldLeft(if (updated.length < local.length) 1.0 else 0.0)(math.max)
      local = updated
      cents = local.map { case (c, v) => (c, v.toSeq) }.toSeq.toDF("cid", "centroid")
        .select(col("cid"), col("centroid").cast("array<float>").as("centroid"))
    }
    CentroidFit(cents, iters, shift)
  }

  /** See [[centroidsConverged]] — returns the oversampled-and-thinned k
    * seed vectors.
    */
  private def kmeansParSeeds(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rounds: Int,
      oversample: Int
  ): Array[Array[Float]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val l = math.max(1, oversample * k)
    var cands: Array[Array[Float]] = corpus.orderBy(col(idCol)).limit(1)
      .select(col(vecCol)).as[Seq[Float]].collect().map(_.toArray)
    for (r <- 1 to rounds) {
      val cDf = cands.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
        .toDF("cid", "centroid")
        .select(col("cid"), col("centroid").cast("array<float>").as("centroid"))
      val prime = 1000000007L
      val picked = corpus.select(col(idCol), col(vecCol))
        .crossJoin(broadcast(cDf))
        .groupBy(col(idCol))
        .agg(max(cosScore(col(vecCol), col("centroid"))).as("best"),
          first(col(vecCol)).as("v"))
        .withColumn("d", greatest(lit(0.0), lit(1.0) - col("best")))
        .withColumn("u",
          (pmod(xxhash64(col(idCol), lit(r)), lit(prime)).cast("double") + lit(0.5)) / lit(prime.toDouble + 1.0))
        .withColumn("race", col("d") * col("d") / -log(col("u")))
        .orderBy(desc("race"), col(idCol))
        .limit(l)
        .select(col("v")).as[Seq[Float]].collect().map(_.toArray)
      cands = cands ++ picked
    }
    // weight by corpus mass, then greedy weighted kmeans++ thinning
    val cDf = cands.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("cid", "centroid")
      .select(col("cid"), col("centroid").cast("array<float>").as("centroid"))
    val w = assign(corpus, cDf, idCol, vecCol)
      .groupBy(col("cid")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    def localCos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length && i < b.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else d / math.sqrt(na * nb)
    }
    val weights = cands.indices.map(i => w.getOrElse(i.toLong, 0L).toDouble).toArray
    val chosen = scala.collection.mutable.ArrayBuffer(weights.indices.maxBy(weights))
    while (chosen.length < math.min(k, cands.length)) {
      val next = cands.indices
        .filterNot(chosen.contains)
        .maxBy { i =>
          val d = 1.0 - chosen.map(c => localCos(cands(i), cands(c))).max
          weights(i) * d * d
        }
      chosen += next
    }
    chosen.map(cands).toArray
  }

  private def literalCentroids(
      spark: org.apache.spark.sql.SparkSession,
      cents: DataFrame
  ): DataFrame = {
    import spark.implicits._
    cents
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .toSeq
      .toDF("cid", "centroid")
  }

  /** (id, cid) — nearest centroid per vector (broadcast argmax). */
  def assign(df: DataFrame, cents: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cents))
      .groupBy(col(idCol))
      .agg(max_by(col("cid"), struct(cosScore(col(vecCol), col("centroid")), -col("cid"))).as("cid"))

  /** Approximate top-k: search only the nProbe best cells per query. */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      nProbe: Int = 4,
      lloydIters: Int = 2
  ): DataFrame = {
    // the centroid frame is a collected LOCAL relation (literalCentroids)
    // — no persist: there is no distributed lineage to re-run, and a
    // cached copy would linger in the block manager (round-1 review)
    val cents = centroids(corpus, idCol, vecCol, numCentroids, lloydIters)
    val cellOf = assign(corpus, cents, idCol, vecCol)
    val corpusCells = corpus
      .select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .join(cellOf.withColumnRenamed(idCol, "nid"), Seq("nid"))

    val probes = TopK.perKey(
      queries
        .select(col(idCol).as("qid"), col(vecCol).as("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("cscore", cosScore(col("qv"), col("centroid"))),
      Seq("qid"), "cscore", "cid", nProbe, carry = Seq("qv"))
      .select(col("qid"), col("qv"), col("cid"))

    // bounded-heap top-k (map-side combined) — the probed cells' scored
    // rows reduce to k per query per map partition before the exchange
    TopK.perKey(
      corpusCells
        .join(broadcast(probes), Seq("cid"))
        .where(col("qid") =!= col("nid"))
        .withColumn("cos_sim", cosScore2(col("qv"), col("nv"))),
      Seq("qid"), "cos_sim", "nid", k)
      .select(col("qid"), col("nid"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** [[topK]] restricted to corpus rows satisfying `predicate` —
    * filtered ANN. The index (centroids + cell assignment) is built on
    * the FULL corpus once; the metadata predicate is applied at search
    * time inside the probed cells, so ONE index serves every predicate
    * instead of one index per filter value. With nProbe = numCentroids
    * this is EXACT filtered search (every cell probed — the
    * oracle-checked mode, q100); at small nProbe the usual IVF
    * recall/cost trade applies, with the caveat that a highly selective
    * predicate thins the probed cells and may need a larger nProbe to
    * fill k (SimSpec pins recall at both settings).
    */
  def topKFiltered(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      predicate: Column,
      k: Int,
      numCentroids: Int = 16,
      nProbe: Int = 4,
      lloydIters: Int = 2
  ): DataFrame = {
    val cents = centroids(corpus, idCol, vecCol, numCentroids, lloydIters)
    val cellOf = assign(corpus, cents, idCol, vecCol)
    val corpusCells = corpus
      .where(predicate)
      .select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .join(cellOf.withColumnRenamed(idCol, "nid"), Seq("nid"))

    val probes = TopK.perKey(
      queries
        .select(col(idCol).as("qid"), col(vecCol).as("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("cscore", cosScore(col("qv"), col("centroid"))),
      Seq("qid"), "cscore", "cid", nProbe, carry = Seq("qv"))
      .select(col("qid"), col("qv"), col("cid"))

    TopK.perKey(
      corpusCells
        .join(broadcast(probes), Seq("cid"))
        .where(col("qid") =!= col("nid"))
        .withColumn("cos_sim", cosScore2(col("qv"), col("nv"))),
      Seq("qid"), "cos_sim", "nid", k)
      .select(col("qid"), col("nid"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** [[topKPartitioned]] with a search-time metadata predicate. The
    * predicate rides the partition-pruned scan as a parquet
    * `PushedFilters` entry (pinned by SimSpec): at 100 TB the probe
    * reads nProbe cell DIRECTORIES and row-group-skips on the metadata
    * column inside them — the filter never materializes unfiltered
    * cells.
    */
  def topKPartitionedFiltered(
      queries: DataFrame,
      cents: DataFrame,
      path: String,
      idCol: String,
      vecCol: String,
      predicate: Column,
      k: Int,
      nProbe: Int = 4
  ): DataFrame = {
    val spark = queries.sparkSession
    val probes = TopK.perKey(
      queries
        .select(col(idCol).as("qid"), col(vecCol).as("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("cscore", cosScore(col("qv"), col("centroid"))),
      Seq("qid"), "cscore", "cid", nProbe, carry = Seq("qv"))
      .select(col("qid"), col("qv"), col("cid"))

    val probedCells = probes.select("cid").distinct().collect().map(_.getLong(0).toInt)
    val corpusCells = spark.read
      .parquet(path)
      .where(col("cid").isin(probedCells: _*)) // partition-pruned scan
      .where(predicate) // parquet PushedFilters, not a post-scan filter
      .select(col(idCol).as("nid"), col(vecCol).as("nv"), col("cid").cast("long").as("cid"))

    TopK.perKey(
      corpusCells
        .join(broadcast(probes), Seq("cid"))
        .where(col("qid") =!= col("nid"))
        .withColumn("cos_sim", cosScore2(col("qv"), col("nv"))),
      Seq("qid"), "cos_sim", "nid", k)
      .select(col("qid"), col("nid"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  private def cosScore2(a: Column, b: Column): Column =
    FloatVec.dot(a, b) / (FloatVec.norm(a) * FloatVec.norm(b))

  /** Materialize the corpus PARTITIONED BY CELL — the 100 TB layout the
    * probe path assumes: a query touching nProbe cells reads nProbe
    * directories and Spark prunes the rest at planning time
    * (`PartitionFilters` on the scan; pinned by `SimSpec`). Returns the
    * centroids used, for probing the same layout later.
    */
  def writePartitionedByCell(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      numCentroids: Int = 16,
      lloydIters: Int = 2
  ): DataFrame = {
    val cents = centroids(corpus, idCol, vecCol, numCentroids, lloydIters)
    corpus
      .join(assign(corpus, cents, idCol, vecCol), Seq(idCol))
      .write
      .mode("overwrite")
      .partitionBy("cid")
      .parquet(path)
    cents
  }

  /** Probe a cell-partitioned corpus: rank centroids per query, read
    * ONLY the union of probed cells (a partition-pruned scan), then
    * score within cells. The collected probe-cell set is bounded by
    * #queries × nProbe longs — driver-safe by construction.
    */
  /** Persist the cell layout's serving state — centroids plus the data
    * path and build params — as ONE [[graft.sources.IndexCatalog]]
    * entry. Before this, [[writePartitionedByCell]]'s returned centroid
    * frame lived only in the building session: a fresh serving session
    * had to re-run the k-means build (or be handed the centroids out of
    * band) to probe a layout that was already on disk. The catalog
    * entry closes that gap with the same open/validate story as IVF-PQ,
    * OPQ, and the graph index.
    */
  def saveCellIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      cents: DataFrame,
      dataPath: String,
      numCentroids: Int,
      lloydIters: Int
  ): Unit =
    graft.sources.IndexCatalog.write(
      spark,
      indexPath,
      "ivf-cells",
      Map(
        "data_path" -> dataPath,
        "num_centroids" -> numCentroids.toString,
        "lloyd_iters" -> lloydIters.toString),
      Seq("centroids" -> cents))

  /** Open a persisted cell index: (centroids, corpus data path). */
  def openCellIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String
  ): (DataFrame, String) = {
    val meta = graft.sources.IndexCatalog.open(spark, indexPath, "ivf-cells")
    (graft.sources.IndexCatalog.part(spark, indexPath, "centroids"), meta.prop("data_path"))
  }

  /** [[writePartitionedByCell]] + [[saveCellIndex]] in one call. */
  def writePartitionedByCellIndexed(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dataPath: String,
      indexPath: String,
      numCentroids: Int = 16,
      lloydIters: Int = 2
  ): DataFrame = {
    val cents =
      writePartitionedByCell(corpus, idCol, vecCol, dataPath, numCentroids, lloydIters)
    saveCellIndex(corpus.sparkSession, indexPath, cents, dataPath, numCentroids, lloydIters)
    cents
  }

  /** [[topKPartitioned]] served entirely from a persisted cell index —
    * the fresh-session probe path (no rebuild, no out-of-band state).
    */
  def topKIndexed(
      queries: DataFrame,
      indexPath: String,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4
  ): DataFrame = {
    val (cents, dataPath) = openCellIndex(queries.sparkSession, indexPath)
    topKPartitioned(queries, cents, dataPath, idCol, vecCol, k, nProbe)
  }

  def topKPartitioned(
      queries: DataFrame,
      cents: DataFrame,
      path: String,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4
  ): DataFrame = {
    val spark = queries.sparkSession
    val probes = TopK.perKey(
      queries
        .select(col(idCol).as("qid"), col(vecCol).as("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("cscore", cosScore(col("qv"), col("centroid"))),
      Seq("qid"), "cscore", "cid", nProbe, carry = Seq("qv"))
      .select(col("qid"), col("qv"), col("cid"))

    // int literals: the read-back partition column infers as int, and a
    // cast-free predicate is what partition pruning needs
    val probedCells = probes.select("cid").distinct().collect().map(_.getLong(0).toInt)
    val corpusCells = spark.read
      .parquet(path)
      .where(col("cid").isin(probedCells: _*)) // partition-pruned scan
      .select(col(idCol).as("nid"), col(vecCol).as("nv"), col("cid").cast("long").as("cid"))

    TopK.perKey(
      corpusCells
        .join(broadcast(probes), Seq("cid"))
        .where(col("qid") =!= col("nid"))
        .withColumn("cos_sim", cosScore2(col("qv"), col("nv"))),
      Seq("qid"), "cos_sim", "nid", k)
      .select(col("qid"), col("nid"), round(col("cos_sim"), 4).as("cos_sim"))
  }
}
