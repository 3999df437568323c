package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.Bpe

/** The end-cap of the training-data pipeline: turn a cleaned corpus
  * into on-disk training shards — REAL BPE tokens, fixed-size chunks,
  * packed into budget-sized bins in one reproducible pseudo-random
  * order, one shard directory per bin.
  *
  *   documents → [[Bpe.chunk]] (tokenize + window, shuffle-free)
  *             → [[Packing.packBins]] on the REAL token counts
  *               (one shuffle + a `parts`-row driver reduce)
  *             → `write.partitionBy(bin)` parquet
  *
  * Everything upstream of the pack is embarrassingly parallel; the pack
  * is the library's no-global-sort running sum; the write is the only
  * sink. Deterministic end to end: same corpus + vocab + salt → byte-
  * identical shard assignment, on any cluster size (the packBins
  * parts-invariance).
  */
object TrainingShards {

  /** The shard frame: (bin, bin_pos, doc_id, chunk_id, n_tokens,
    * tokens). `bin` is the training-sequence bucket a chunk STARTS in;
    * `bin_pos` its token offset there.
    */
  /** The lazy shard plan plus its persisted chunk intermediate: BPE
    * tokenization is the dominant cost and feeds BOTH the pack (which
    * materializes eagerly inside packBins) and the join back — without
    * the persist the whole tokenize+chunk lineage would run twice.
    */
  private[ops] def shardsPlan(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      vocab: Bpe.Vocab,
      chunkSize: Int,
      overlap: Int,
      budget: Long,
      salt: String
  ): (DataFrame, DataFrame) = {
    // one scalar key per chunk for the pack: id·2²⁰ + chunk_id. The
    // packing is row-local and codegen'd, so the range guard is too: a
    // document beyond 2^20 chunks (≈ a billion-token doc at default
    // stride) or a doc id outside [0, 2^43) would silently collide keys
    // and corrupt bin assignment — fail the job instead of mis-packing.
    // A NULL id (a non-numeric string id survives the cast as null, and
    // null makes every range predicate null too) must trip the guard
    // explicitly, or every such document's chunks collapse onto one
    // null packing key.
    val maxChunks = 1L << 20
    val maxId = Long.MaxValue / maxChunks
    val id = col(idCol).cast("long")
    val chunks = Bpe.chunk(docs, textCol, idCol, vocab, chunkSize, overlap)
      .withColumn(
        "__ck",
        when(
          id.isNull || col("chunk_id").isNull ||
            col("chunk_id") >= maxChunks || id < 0 || id >= maxId,
          raise_error(concat(
            lit(s"TrainingShards: key out of packable range (need 0 <= id < $maxId, "
              + s"chunk_id < $maxChunks): id="),
            id.cast("string"), lit(" chunk_id="), col("chunk_id").cast("string"))))
          .otherwise(id * maxChunks + col("chunk_id")))
      .persist()
    val packed = Packing.packBins(chunks, "__ck", "n_tokens", budget, salt)
      .select(col("__ck"), col("bin"), col("bin_pos"))
    val out = chunks
      .join(packed, Seq("__ck"))
      .select(
        col("bin"), col("bin_pos"), col(idCol), col("chunk_id"),
        col("n_tokens"), col("tokens"))
    (out, chunks)
  }

  /** The shard frame: (bin, bin_pos, doc_id, chunk_id, n_tokens,
    * tokens). The chunk intermediate stays persisted until the caller's
    * action (the session cache sweep releases it); [[write]] manages
    * the lifecycle itself.
    */
  def shards(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      vocab: Bpe.Vocab,
      chunkSize: Int,
      overlap: Int,
      budget: Long,
      salt: String = "shards"
  ): DataFrame =
    shardsPlan(docs, textCol, idCol, vocab, chunkSize, overlap, budget, salt)._1

  /** Materialize the shards, one directory per bin. */
  def write(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      vocab: Bpe.Vocab,
      chunkSize: Int,
      overlap: Int,
      budget: Long,
      path: String,
      salt: String = "shards"
  ): Unit = {
    val (out, chunks) =
      shardsPlan(docs, textCol, idCol, vocab, chunkSize, overlap, budget, salt)
    out.write.mode("overwrite").partitionBy("bin").parquet(path)
    chunks.unpersist(false)
  }
}
