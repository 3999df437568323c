package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{KmvAgg, SharedHash}
import graft.sources.IndexCatalog

/** Cross-corpus vocabulary overlap via KMV / bottom-k theta sketches
  * ([[graft.functions.KmvAgg]]) — answers "how many distinct tokens
  * per source" and "how much does corpus B's vocabulary overlap
  * corpus A's" from per-corpus state of k longs, so comparing a new
  * crawl against a 100 TB holding is one pass over the NEW data plus
  * arithmetic on sketches. The exact alternative (count(distinct) and
  * a distinct-token join per pair) shuffles the full vocabulary once
  * per question; the sketch shuffles #corpora × k longs, once.
  *
  * Estimator conventions (Bar-Yossef 2002 / theta-sketch form):
  *   - a sketch with fewer than k values IS the corpus's distinct hash
  *     set — estimates degrade to exact counts;
  *   - a full sketch's theta is the kth minimum; the k−1 values
  *     STRICTLY below theta are a uniform sample of the hash space
  *     below it, so distinct ≈ (k−1)·M/theta with M = 2^60 (the
  *     [[SharedHash.md5Long60]] range);
  *   - pairwise, theta = min(theta_a, theta_b); both sketches
  *     restricted strictly below theta are uniform samples of the SAME
  *     region, so |A∩B| ≈ n_inter·M/theta and jaccard ≈ n_inter/n_union
  *     over the restricted sets.
  *
  * Every number is a deterministic function of the kept hash values,
  * so a DuckDB oracle replays sketches AND estimates exactly.
  */
object CorpusOverlap {

  /** Hash-space size for [[SharedHash.md5Long60]]: 2^60. */
  val M: Long = 1L << 60

  /** One row per corpus: (corpus, kmv array<long> asc, n_kept, theta,
    * distinct_est). One scan of the text, one k-long-per-corpus
    * shuffle; the sketch aggregate combines map-side.
    */
  def sketches(
      df: DataFrame,
      textCol: String,
      corpusCol: String,
      k: Int,
      tokenHash: Column => Column = SharedHash.md5Long60): DataFrame = {
    val hashed = df.select(
      col(corpusCol).as("corpus"),
      transform(split(col(textCol), " "), tokenHash).as("hs"))
    withEstimates(
      hashed.groupBy("corpus").agg(KmvAgg.kmv(col("hs"), k).as("kmv")),
      k)
  }

  /** Derive (n_kept, theta, distinct_est) from a raw (corpus, kmv)
    * frame. Shared by the fresh-build and the append path so both
    * produce identical columns from identical kept values.
    */
  private def withEstimates(raw: DataFrame, k: Int): DataFrame =
    raw
      .withColumn("n_kept", size(col("kmv")).cast("long"))
      .withColumn(
        "theta",
        when(col("n_kept") >= k, element_at(col("kmv"), k)).otherwise(lit(M)))
      .withColumn(
        "distinct_est",
        when(
          col("n_kept") >= k,
          round(lit((k - 1).toDouble) * (lit(M.toDouble) / col("theta").cast("double")), 4))
          .otherwise(col("n_kept").cast("double")))

  /** All corpus pairs (src_a < src_b) with exact-from-sketch overlap
    * numbers. The sketch frame is #corpora rows — the self-join is
    * broadcast-sized by construction.
    */
  def pairOverlap(sk: DataFrame): DataFrame = {
    val a = sk.select(
      col("corpus").as("src_a"), col("kmv").as("kmv_a"), col("theta").as("theta_a"))
    val b = sk.select(
      col("corpus").as("src_b"), col("kmv").as("kmv_b"), col("theta").as("theta_b"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .withColumn("theta", least(col("theta_a"), col("theta_b")))
      .withColumn("fa", filter(col("kmv_a"), h => h < col("theta")))
      .withColumn("fb", filter(col("kmv_b"), h => h < col("theta")))
      .withColumn("n_inter", size(array_intersect(col("fa"), col("fb"))).cast("long"))
      .withColumn("n_union", size(array_union(col("fa"), col("fb"))).cast("long"))
      .withColumn("jaccard_kmv", round(col("n_inter") / col("n_union"), 4))
      .withColumn(
        "inter_est",
        round(col("n_inter").cast("double") * (lit(M.toDouble) / col("theta").cast("double")), 4))
      .select("src_a", "src_b", "theta", "n_inter", "n_union", "jaccard_kmv", "inter_est")
  }

  // ---- persisted lifecycle ([[graft.sources.IndexCatalog]]) ----------

  private val Kind = "kmv_sketch"

  /** Persist per-corpus sketches. k travels with the entry: values
    * sketched under a different k (or a different token hash) are not
    * comparable, so the append path reads parameters from the entry
    * instead of trusting the caller.
    */
  def saveSketches(spark: SparkSession, sk: DataFrame, path: String, k: Int): Unit =
    IndexCatalog.write(
      spark, path, Kind,
      Map("k" -> k.toString, "token_hash" -> "md5_60"),
      Seq("sketches" -> sk.select("corpus", "kmv")))

  def loadSketches(spark: SparkSession, path: String): DataFrame = {
    val meta = IndexCatalog.open(spark, path, Kind)
    withEstimates(IndexCatalog.part(spark, path, "sketches"), meta.propInt("k"))
  }

  /** Merge new documents into a saved sketch set and return the merged
    * frame (also the daily-crawl shape: one pass over the NEW text
    * only). KMV merge is just "k smallest of the union", so replaying
    * kept values through the same aggregate — old kept hashes unioned
    * with the new corpus's token hashes — is exact, not approximate.
    */
  def appendSketches(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      textCol: String,
      corpusCol: String,
      tokenHash: Column => Column = SharedHash.md5Long60): DataFrame = {
    val meta = IndexCatalog.open(spark, path, Kind)
    val k = meta.propInt("k")
    val old = IndexCatalog.part(spark, path, "sketches").select("corpus", "kmv")
    val fresh = df.select(
      col(corpusCol).as("corpus"),
      transform(split(col(textCol), " "), tokenHash).as("kmv"))
    withEstimates(
      old.unionByName(fresh)
        .groupBy("corpus").agg(KmvAgg.kmv(col("kmv"), k).as("kmv")),
      k)
  }
}
