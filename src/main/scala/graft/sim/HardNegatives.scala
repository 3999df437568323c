package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.{ConnectedComponents, MinHashLsh}
import graft.functions.{SharedHash, TopK}

/** Hard-negative mining for contrastive/embedding-model training: for
  * each query document, the top-k most-similar corpus documents that
  * are NOT near-duplicates of it — high-similarity non-duplicates are
  * exactly the "hard" negatives that make a retrieval model learn
  * (easy random negatives teach nothing; accidental positives —
  * near-dups mislabeled as negatives — poison training; cf. the
  * in-batch/ANCE-style mining literature, Xiong 2021).
  *
  * Composition of proven parts, nothing new to trust: fuzzy-dedup
  * clusters ([[graft.dedup.MinHashLsh.nearDuplicates]] →
  * [[ConnectedComponents]]) define "same document" (singleton docs are
  * their own cluster), [[HashEmbed]] supplies model-free embeddings,
  * and the negative set is cosine top-k with the same-cluster pairs
  * excluded. At scale the brute-force scorer swaps for any ANN serve
  * path (P7 family) — the exclusion join is unchanged.
  */
object HardNegatives {

  /** (qid, nid, cos_sim, rank): top-k hard negatives per query doc.
    *
    * @param queryIds one-column frame of `idCol` values to mine for
    *                 (broadcast; the corpus side is scanned once)
    */
  def mine(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queryIds: DataFrame,
      dims: Int = 64,
      k: Int = 3,
      dedupThreshold: Double = 0.5,
      tokenHash: Column => Column = SharedHash.md5Long60): DataFrame = {
    val pairs = MinHashLsh.nearDuplicates(
      docs, textCol, idCol, threshold = dedupThreshold, gramHash = tokenHash)
    val comps = ConnectedComponents.components(pairs, "id_a", "id_b")
    val labels = docs
      .select(col(idCol))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("cluster"))

    // consumed twice (probe branch + corpus scan); without this
    // materialization the embed shuffle AND the LSH/connected-components
    // cluster-label join both execute twice. freshLeaf drops carried
    // origin stats so the downstream broadcast join plans constant-cost.
    val emb = org.apache.spark.sql.graftbridge.Bridge.freshLeaf(
      HashEmbed.embed(docs, textCol, idCol, dims, tokenHash = tokenHash)
        .join(labels, Seq(idCol))
        .localCheckpoint(true))

    val probes = emb
      .join(broadcast(queryIds.select(col(idCol))), Seq(idCol))
      .select(
        col(idCol).as("qid"),
        col("embedding").as("qv"),
        col("cluster").as("qcluster"))

    val scored = emb
      .select(col(idCol).as("nid"), col("embedding").as("nv"), col("cluster").as("ncluster"))
      .crossJoin(broadcast(probes))
      .where(col("qid") =!= col("nid") && col("qcluster") =!= col("ncluster"))
      // embeddings are unit-norm doubles: dot IS cosine (the q112
      // zip_with form — double arithmetic the oracle replays exactly)
      .withColumn(
        "cos_sim",
        round(
          aggregate(zip_with(col("qv"), col("nv"), (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x),
          4))

    TopK.perKey(scored, Seq("qid"), "cos_sim", "nid", k)
      .withColumn(
        "rank",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))))
      .select("qid", "nid", "cos_sim", "rank")
  }
}
