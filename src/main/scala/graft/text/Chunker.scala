package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window document chunking with overlap — the pre-tokenization
  * step of a training/RAG pipeline: long documents become chunks of
  * `chunkSize` tokens, consecutive chunks sharing `overlap` tokens so
  * no span of fewer than `chunkSize - overlap` tokens is ever split
  * across a chunk boundary without also appearing whole in one chunk.
  *
  * Chunk `i` covers tokens `[i*stride, min(i*stride + chunkSize, n))`
  * with `stride = chunkSize - overlap`; a document shorter than
  * `chunkSize` yields exactly one chunk. The chunk count uses integer
  * arithmetic (`ceil((n - chunkSize) / stride) + 1`) so the Spark plan
  * and the SQL oracle agree bit-for-bit.
  *
  * Shape: split once per document, `posexplode(sequence(...))` over the
  * chunk index, `slice` + `concat_ws` per chunk — pure per-row column
  * algebra, fully codegen'd, NO shuffle and NO window: chunking 100 TB
  * is embarrassingly parallel and this plan keeps it that way.
  */
object Chunker {

  def chunk(
      df: DataFrame,
      textCol: String,
      idCol: String,
      chunkSize: Int,
      overlap: Int
  ): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // exact integer ceil-division: values stay far below 2^52, so the
    // double round-trip inside floor() is lossless
    val nChunks =
      when(n <= chunkSize, lit(1L))
        .otherwise(floor((n - lit(chunkSize) + lit(stride - 1)).cast("long") / lit(stride)) + 1L)
    df.select(col(idCol), toks.as("__toks"), n.as("__n"), nChunks.as("__nc"))
      .select(
        col(idCol),
        col("__toks"),
        col("__n"),
        posexplode(sequence(lit(0L), col("__nc") - 1L)).as(Seq("__pos", "chunk_id")))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn(
        "n_tokens",
        least(col("start_tok") + lit(chunkSize), col("__n").cast("long")) - col("start_tok"))
      .withColumn(
        "chunk_text",
        concat_ws(" ", slice(col("__toks"), (col("start_tok") + 1L).cast("int"), col("n_tokens").cast("int"))))
      .select(col(idCol), col("chunk_id"), col("start_tok"), col("n_tokens"), col("chunk_text"))
  }
}
