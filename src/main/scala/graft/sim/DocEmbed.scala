package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{SharedHash, VecSumAgg}
import graft.text.Chunker

/** Long-document embeddings by chunk pooling — the standard answer to
  * "the encoder's context is shorter than the document": embed each
  * fixed-window chunk ([[graft.text.Chunker]], the T9 operator),
  * mean-pool element-wise, L2-normalize (mean-pool + normalize ≡
  * sum-pool + normalize, so the chunk count never needs to divide).
  * With [[HashEmbed]] as the chunk encoder this is model-free and
  * fully oracle-replayable; a real encoder drops into the same
  * pipeline at the `chunkVecs` seam (its UDF batch shape is the
  * [[graft.media.Multimodal]] plumbing).
  *
  * Scale shape: chunking is embarrassingly parallel (no shuffle —
  * PlanSpec pins it), the chunk embed is one groupBy(chunk), and the
  * pool is ONE [[VecSumAgg]] aggregate per doc — map-side combined,
  * dims×8 bytes per partial, never a posexplode shuffle of
  * chunks×dims rows.
  */
object DocEmbed {

  /** (idCol, embedding array<double> unit-norm, n_chunks). */
  def pooled(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      dims: Int = 64,
      chunkSize: Int = 20,
      overlap: Int = 5,
      tokenHash: Column => Column = SharedHash.md5Long60): DataFrame = {
    val chunks = Chunker
      .chunk(docs, textCol, idCol, chunkSize, overlap)
      .withColumn("__cid", concat(col(idCol).cast("string"), lit(":"), col("chunk_id")))
    val chunkVecs = HashEmbed
      .embed(chunks, "chunk_text", "__cid", dims, tokenHash = tokenHash)
      .join(chunks.select(col("__cid"), col(idCol)), Seq("__cid"))
    val sums = chunkVecs
      .groupBy(col(idCol))
      .agg(
        VecSumAgg.vecSum(col("embedding")).as("__sum"),
        count(lit(1)).as("n_chunks"))
    val nrm = sqrt(aggregate(col("__sum"), lit(0.0), (acc, x) => acc + x * x))
    sums.select(
      col(idCol),
      when(nrm > 0, transform(col("__sum"), x => x / nrm))
        .otherwise(col("__sum")).as("embedding"),
      col("n_chunks"))
  }

  /** Top-k similar documents under pooled embeddings: probes broadcast,
    * cosine = dot (unit vectors), the q112 serving shape.
    */
  def topK(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queryIds: DataFrame,
      k: Int,
      dims: Int = 64,
      chunkSize: Int = 20,
      overlap: Int = 5,
      tokenHash: Column => Column = SharedHash.md5Long60): DataFrame = {
    // the pooled frame feeds BOTH the probe branch and the corpus scan:
    // without a materialization Spark re-executes the whole chunk →
    // hash-embed → VecSumAgg pipeline once per consumer. One
    // localCheckpoint makes the fan-out read a computed RDD instead
    // (freshLeaf drops origin stats so downstream joins stay cheap to plan).
    val emb = org.apache.spark.sql.graftbridge.Bridge.freshLeaf(
      pooled(docs, textCol, idCol, dims, chunkSize, overlap, tokenHash)
        .localCheckpoint(true))
    val probes = emb
      .join(broadcast(queryIds.select(col(idCol))), Seq(idCol))
      .select(col(idCol).as("qid"), col("embedding").as("qv"))
    val scored = emb
      .select(col(idCol).as("nid"), col("embedding").as("nv"))
      .crossJoin(broadcast(probes))
      .where(col("qid") =!= col("nid"))
      .withColumn(
        "cos_sim",
        round(
          aggregate(zip_with(col("qv"), col("nv"), (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x),
          4))
    graft.functions.TopK.perKey(scored, Seq("qid"), "cos_sim", "nid", k)
      .select(col("qid"), col("nid"), col("cos_sim"))
  }
}
