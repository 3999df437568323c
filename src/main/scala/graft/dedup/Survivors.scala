package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** Quality-aware survivor selection for duplicate clusters.
  *
  * The library's dedup pipelines resolve clusters to min-id survivors
  * (a pure id convention). Real training pipelines keep the BEST copy
  * instead — the longest / highest-quality member — because near-dup
  * clusters usually mix a clean original with truncated or boilerplate-
  * wrapped variants, and min-id keeps an arbitrary one.
  *
  * One bounded-heap aggregate on the component key ([[TopK]] k=1):
  * map-side combining reduces each cluster to one row per map partition
  * before the exchange — no window sort of the full membership, and hot
  * mega-clusters (the dedup skew case) combine before they move.
  */
object Survivors {

  /** One row per component: the member with the highest `scoreCol`,
    * ties broken by lowest id (the TopK (score desc, payload asc)
    * order). `components`: (idCol, componentCol) membership;
    * `scored`: (idCol, scoreCol) per-document quality.
    */
  def keepBest(
      components: DataFrame,
      scored: DataFrame,
      idCol: String,
      componentCol: String,
      scoreCol: String
  ): DataFrame =
    TopK.perKey(
      components.join(scored.select(col(idCol), col(scoreCol)), Seq(idCol)),
      Seq(componentCol), scoreCol, idCol, 1)
      .select(col(componentCol), col(idCol), col(scoreCol))
}
