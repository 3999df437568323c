package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FloatVec

/** Semantic (embedding-space) deduplication — the SemDeDup-family
  * recipe: documents whose embeddings nearly coincide are redundant
  * even when their token sets differ (paraphrases, boilerplate
  * rewrites, translations), so cluster the space, compare only WITHIN
  * cells, and keep one representative per duplicate component.
  *
  * Composition of existing scale-shaped pieces, nothing novel to audit:
  * [[Embed.centroids]] (one-pass vector-sum aggregate) →
  * [[Embed.assign]] (broadcast centroids, map-side-combined argmax) →
  * within-cell cosine pairs (equi-join on the cell id — the cell is the
  * blocking key, so candidate pairs shuffle, never the n² cross
  * product) → [[graft.dedup.ConnectedComponents]] (min-label + pointer
  * jumping) → min-id survivors.
  *
  * Cell granularity is the recall/cost dial: more cells = fewer
  * in-cell pairs but near-dups straddling a cell boundary are missed —
  * the standard SemDeDup trade, made explicit by the `cents` parameter.
  */
object SemanticDedup {

  /** (idCol, component) for EVERY input row — duplicate clusters by
    * within-cell cosine ≥ `threshold`; isolated documents are their own
    * component. Component label = min member id (canonical).
    */
  def components(
      emb: DataFrame,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      centIdCol: String = "label"
  ): DataFrame = {
    val assigned = Embed.assign(emb, cents, vecCol, idCol, centIdCol)
    // hoist the per-row norm BEFORE the self-join: a doc in a cell with
    // P candidate partners must not recompute its O(dims) norm P times
    // (the Cosine.nearDupPairs convention)
    val v = emb
      .select(col(idCol), col(vecCol), FloatVec.norm(col(vecCol)).as("__nrm"))
      .join(assigned.select(col(idCol), col("assigned").as("__cell")), Seq(idCol))
      .persist()
    val l = v.select(
      col("__cell"), col(idCol).as("id_a"), col(vecCol).as("v_a"), col("__nrm").as("n_a"))
    val r = v.select(
      col("__cell"), col(idCol).as("id_b"), col(vecCol).as("v_b"), col("__nrm").as("n_b"))
    val pairs = l
      .join(r, Seq("__cell"))
      .where(col("id_a") < col("id_b"))
      .where(FloatVec.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    v.unpersist(false)
    val comp = graft.dedup.ConnectedComponents.components(pairs, "id_a", "id_b")
    emb
      .select(col(idCol).cast("long").as("__id"))
      .join(comp.withColumnRenamed("id", "__id"), Seq("__id"), "left")
      .select(
        col("__id").as(idCol),
        coalesce(col("comp"), col("__id")).as("component"))
  }

  /** One surviving row per component (the min-id member). */
  def survivors(
      emb: DataFrame,
      cents: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      centIdCol: String = "label"
  ): DataFrame =
    components(emb, cents, idCol, vecCol, threshold, centIdCol)
      .where(col(idCol) === col("component"))
      .select(col(idCol))
}
