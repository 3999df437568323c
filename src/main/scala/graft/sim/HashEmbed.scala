package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-hashing document embeddings (the hashing trick, Weinberger
  * et al. 2009) — SURVEY.md §2 P20.
  *
  * Deterministic, model-free embeddings: each token hashes to a
  * dimension index and a ±1 sign; the document vector is the signed
  * term-frequency histogram, L2-normalized. Inner products then
  * estimate token-multiset similarity unbiasedly — no trained encoder,
  * no vocabulary table, reproducible on any engine from the hash alone.
  * This closes the semantic stack over plain text: hash-embed →
  * [[Cosine]]/[[AnnSq8]]/[[AnnIvf]]/[[SemanticDedup]] without a model
  * dependency (and it is the standard cheap baseline those model
  * embeddings must beat).
  *
  * Scale shape: one explode + ONE groupBy(doc) carrying `dims`
  * conditional-sum aggregates (the minhash-signature pattern — map-side
  * combined, codegen'd, the shuffle moves one dims-vector per doc per
  * partition). Values are INTEGER sign-counts until the final
  * normalization, so the vector content is exact and
  * partition-invariant; the normalization is one double division per
  * dimension.
  */
object HashEmbed {

  /** (idCol, embedding array<double>): signed tf histogram over
    * `dims` hashed dimensions, L2-normalized (all-zero stays zero).
    * `tokenHash` is xxhash64 for production, the shared md5-60 when a
    * DuckDB oracle replays the construction (q21's trade). Index =
    * h mod dims (low bits); sign = ±1 from bit 30 — far above any
    * practical dims, so index and sign are independent, and a plain
    * shift/mask both engines compute identically on BIGINT.
    */
  def embed(
      df: DataFrame,
      textCol: String,
      idCol: String,
      dims: Int = 64,
      tokenHash: Column => Column = xxhash64(_)
  ): DataFrame = {
    require(dims >= 2, "dims must be >= 2")
    val h = abs(tokenHash(col("__tok")))
    val toks = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("__tok"))
      .select(
        col(idCol),
        pmod(h, lit(dims)).cast("int").as("__idx"),
        (lit(1L) - lit(2L) * pmod(shiftright(h, 30), lit(2L))).as("__sign"))
    val sums = (0 until dims).map(d =>
      sum(when(col("__idx") === d, col("__sign")).otherwise(0L)).as(s"__d$d"))
    val counted = toks.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val vec = array((0 until dims).map(d => col(s"__d$d").cast("double")): _*)
    val nrm = sqrt(aggregate(vec, lit(0.0), (acc, x) => acc + x * x))
    counted.select(
      col(idCol),
      when(nrm > 0, transform(vec, x => x / nrm)).otherwise(vec).as("embedding"))
  }

  /** [[embed]] cast to `array<float>` — the input type of the ANN index
    * families ([[AnnSq8]], [[AnnIvf]], [[AnnPq]], [[AnnGraph]]).
    */
  def embedF(
      df: DataFrame,
      textCol: String,
      idCol: String,
      dims: Int = 64,
      tokenHash: Column => Column = xxhash64(_)
  ): DataFrame =
    embed(df, textCol, idCol, dims, tokenHash)
      .select(col(idCol), col("embedding").cast("array<float>").as("embedding"))

  /** [[embed]] with tokens weighted by smoothed idf (the [[graft.text.TfIdf]]
    * convention, ln((1+N)/(1+df)) + 1) instead of raw counts — the
    * common-token washout fix: under raw counts two documents cosine-
    * match on shared stopwords; under idf weights the rare terms carry
    * the vector. One extra vocab-sized aggregate (distinct-doc counts
    * per token, keyed on the 64-bit token HASH — gram strings never
    * shuffle, the novelty lesson) broadcast onto the token stream; the
    * cell sums become doubles, so unlike [[embed]]'s integer cells the
    * vector content is exact only up to summation order (outputs are
    * rounded at the query layer like every float surface).
    */
  def embedIdf(
      df: DataFrame,
      textCol: String,
      idCol: String,
      dims: Int = 64,
      tokenHash: Column => Column = xxhash64(_)
  ): DataFrame = {
    require(dims >= 2, "dims must be >= 2")
    val h = abs(tokenHash(col("__tok")))
    val toks = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("__tok"))
      .select(
        col(idCol),
        h.as("__h"),
        pmod(h, lit(dims)).cast("int").as("__idx"),
        (lit(1L) - lit(2L) * pmod(shiftright(h, 30), lit(2L))).cast("double").as("__sign"))
    val dfreq = toks.select(col(idCol), col("__h")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__df"))
    val n = df.select(col(idCol)).distinct().count().toDouble
    val weighted = toks
      .join(broadcast(dfreq), Seq("__h"))
      .withColumn(
        "__w",
        col("__sign") *
          (log((lit(1.0) + n) / (col("__df").cast("double") + lit(1.0))) + lit(1.0)))
    val sums = (0 until dims).map(d =>
      sum(when(col("__idx") === d, col("__w")).otherwise(0.0)).as(s"__d$d"))
    val counted = weighted.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val vec = array((0 until dims).map(d => col(s"__d$d")): _*)
    val nrm = sqrt(aggregate(vec, lit(0.0), (acc, x) => acc + x * x))
    counted.select(
      col(idCol),
      when(nrm > 0, transform(vec, x => x / nrm)).otherwise(vec).as("embedding"))
  }
}
