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
