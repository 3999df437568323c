package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FloatVec

/** Streaming nearest-centroid assignment — the embedding-router /
  * cluster-gate stage of a continuous ingest pipeline (route fresh docs
  * to their semantic cell; drop docs that land in junk clusters).
  *
  * The batch form ([[graft.sim.Embed.assign]]) is a broadcast join + a
  * groupBy argmax — an aggregation, which an APPEND-mode unbounded
  * stream cannot run without watermark state it doesn't need. Against
  * STATIC centroids the argmax is row-local: the centroid table is
  * index state (driver-tiny by definition), so it folds into the plan
  * as literals and each row computes `min(struct(-cos, label))` over a
  * #centroids-element array — the SAME lexicographic-struct ordering as
  * the batch aggregate (ties → smallest label), now a pure projection.
  * Stateless, append-safe, embarrassingly parallel; per-row cost is the
  * same k dot products the batch join pays, with the per-vector norm
  * hoisted out of the per-centroid terms exactly like the batch plan.
  */
object EmbedStream {

  /** APPEND the row-local nearest-centroid columns `assigned` and `cos`,
    * keeping every input column — a gate must let the surviving row's
    * payload (text, embedding, metadata) flow downstream; recovering it
    * later would take a stream-stream join, i.e. exactly the state this
    * operator exists to avoid. Works on both streaming and batch frames
    * (StreamingSpec pins batch parity). `cents`: (label, centroid)
    * rows, collected — the same driver-bounded state every ANN index in
    * the library holds.
    */
  def assignRowLocal(
      df: DataFrame,
      cents: Array[(Long, Array[Float])],
      vecCol: String,
      idCol: String
  ): DataFrame = {
    require(cents.nonEmpty, "no centroids")
    val scored = array(cents.sortBy(_._1).map { case (label, c) =>
      val cn = math.sqrt(c.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
      struct(
        (-(FloatVec.dot(col(vecCol), typedLit(c.toSeq).cast("array<float>")) /
          (col("__vn") * lit(cn)))).as("neg"),
        lit(label).as("lbl"))
    }: _*)
    df.withColumn("__vn", FloatVec.norm(col(vecCol)))
      .withColumn("__b", array_min(scored))
      .withColumn("assigned", col("__b.lbl"))
      .withColumn("cos", round(-col("__b.neg"), 4))
      .drop("__vn", "__b")
  }

  /** [[assignRowLocal]] taking the centroid FRAME (the
    * [[graft.sim.Embed.centroids]] output): collects the tiny table once
    * at plan-build time, then every micro-batch routes against it.
    */
  def assignStream(
      stream: DataFrame,
      cents: DataFrame,
      vecCol: String,
      idCol: String,
      centIdCol: String = "label"
  ): DataFrame = {
    val collected = cents
      .select(col(centIdCol).cast("long"), col("centroid").cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assignRowLocal(stream, collected, vecCol, idCol)
  }

  /** The gate: keep only rows routed to `keepLabels` with similarity ≥
    * `minCos` — the "belongs to a wanted cluster, confidently" filter.
    */
  def centroidGate(
      stream: DataFrame,
      cents: DataFrame,
      vecCol: String,
      idCol: String,
      keepLabels: Set[Long],
      minCos: Double,
      centIdCol: String = "label"
  ): DataFrame =
    assignStream(stream, cents, vecCol, idCol, centIdCol)
      .where(col("assigned").isin(keepLabels.toSeq: _*) && col("cos") >= minCos)
}
