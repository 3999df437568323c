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

  /** Streaming embedding-DRIFT monitor (S16): per stratum, running
    * first/second moments (n, Σv, Σv² per dim — the same sufficient
    * statistics as `VecOuterAgg`'s diagonal) carried as
    * `mapGroupsWithState` state; each micro-batch emits the z-distance
    * of the batch's mean vector from the RUNNING mean under the
    * standard error of a batch mean,
    * drift = √(Σ_d ((μ̂_d − μ_d)/(σ_d/√m))² / dims), m = batch rows —
    * ≈ 1 when the new batch is exchangeable with history, rising
    * sharply when the embedding distribution moves (upstream encoder
    * swap, corpus contamination, pipeline bug: the things a 100 TB
    * continuous ingest must catch BEFORE retraining). The state is
    * 2·dims + 1 doubles per stratum forever; the score is emitted
    * BEFORE folding the batch in, so drift is measured against history
    * (first batch per stratum → NaN-free score 0, no history to
    * contradict). Scoring mirrors the [[graft.sim.Embed.standardizer]]
    * moment identities row-for-row (StreamingSpec pins parity).
    */
  def driftMonitor(
      stream: DataFrame,
      vecCol: String,
      strataCol: String,
      minHistory: Long = 20L,
      eps: Double = 1e-12
  ): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(strataCol).cast("string"), col(vecCol))
      .as[(String, Seq[Float])]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Array[Double], Array[Double]),
        (String, Long, Long, Double)](GroupStateTimeout.NoTimeout) { (stratum, rows, state) =>
        val batch = rows.map(_._2).toArray
        val m = batch.length
        // with NoTimeout the function only fires for groups with rows
        require(m > 0, s"empty batch for stratum $stratum")
        val d = batch.head.length
        val (n0, s0, q0) = state.getOption.getOrElse(
          (0L, new Array[Double](d), new Array[Double](d)))
        // score the batch against HISTORY (before folding it in)
        val score =
          if (n0 < minHistory || m == 0) 0.0
          else {
            val bMean = new Array[Double](d)
            batch.foreach { v => var i = 0; while (i < d) { bMean(i) += v(i); i += 1 } }
            var acc = 0.0
            var i = 0
            while (i < d) {
              bMean(i) /= m
              val mu = s0(i) / n0
              val va = math.max(0.0, (q0(i) - n0 * mu * mu) / (n0 - 1.0))
              val se = math.sqrt(math.max(va, eps) / m)
              val z = (bMean(i) - mu) / se
              acc += z * z
              i += 1
            }
            math.sqrt(acc / d)
          }
        batch.foreach { v =>
          var i = 0
          while (i < d) { s0(i) += v(i); q0(i) += v(i).toDouble * v(i); i += 1 }
        }
        state.update((n0 + m, s0, q0))
        (stratum, n0 + m, m.toLong, score)
      }
      .toDF(strataCol, "n_seen", "batch_rows", "drift_score")
  }
}
