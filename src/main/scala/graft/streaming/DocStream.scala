package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.MinHashLsh

/** Streaming document-pipeline operators: the batch decontamination /
  * span-audit semantics ([[graft.dedup.SpanDedup]]) compiled for a
  * continuous ingest stream.
  *
  * The batch span pipeline shingles via posexplode + window `lead`
  * (split once, codegen) — but window functions over arbitrary keys are
  * not allowed on unbounded streams, and a span-level stream-static
  * join would need a stateful per-doc re-aggregation. Instead each
  * STREAMED row computes its own distinct sorted span-hash array
  * (per-row column algebra, stateless, append-mode), and the probe side
  * — small BY DEFINITION: it is the eval/benchmark set — is reduced to
  * ONE row carrying its sorted span-hash array and broadcast, so
  * contamination is a codegen'd sorted-merge intersect
  * ([[graft.functions.SetOps.sortedIntersectSize]]) per document. The
  * corpus stream is never shuffled and never keyed: 100 TB of backlog
  * drains at scan speed with zero state store.
  */
object DocStream {

  /** Distinct sorted xxhash64 span hashes of `textCol`, as one array
    * column — hash-identical to [[MinHashLsh.shingleHashes]] (including
    * the whole-text hash for docs shorter than `n` tokens), but built
    * row-locally: the interpreted higher-order `transform` costs more
    * CPU per token than the batch window form, the price of statelessness.
    */
  def spanArray(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    val nt = size(toks)
    val spans = transform(
      sequence(lit(0), greatest(nt - n, lit(0))),
      i => xxhash64(concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
    array_sort(array_distinct(when(nt < n, array(xxhash64(textCol))).otherwise(spans)))
  }

  /** Per streamed document: `n_spans` distinct n-token spans and
    * `n_hits` of them appearing anywhere in the static `probe` set —
    * the streaming form of [[graft.dedup.SpanDedup.contamination]]
    * (identical output on identical rows; pinned by `StreamingSpec`).
    * Filter `n_hits = 0` downstream to keep only clean documents.
    */
  def contaminationStream(
      stream: DataFrame,
      probe: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8
  ): DataFrame = {
    val probeSpans = broadcast(
      MinHashLsh
        .shingleHashes(probe, textCol, idCol, n)
        .agg(sort_array(collect_set(col("sh"))).as("__probe"))
        .withColumn("__j", lit(1)))
    stream
      .withColumn("__spans", spanArray(col(textCol), n))
      .withColumn("__j", lit(1))
      .join(probeSpans, Seq("__j"))
      .select(
        col(idCol),
        size(col("__spans")).cast("long").as("n_spans"),
        graft.functions.SetOps
          .sortedIntersectSize(col("__spans"), col("__probe"))
          .cast("long")
          .as("n_hits"))
  }
}
