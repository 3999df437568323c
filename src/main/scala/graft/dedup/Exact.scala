package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact deduplication by content hash (SURVEY.md §2 P1).
  *
  * Scale shape: one md5 projection (codegen) + one groupBy on the hash —
  * a single shuffle whose payload is (hash, id), not the documents.
  * The canonical keeper is min(id) per hash; `dedup` then semi-joins the
  * keeper ids back (broadcast when small, shuffle-hash otherwise) so
  * full rows are only moved for survivors.
  */
object Exact {

  def contentHash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("content_hash", md5(col(textCol).cast("binary")))

  /** One row per distinct content: hash, surviving id, duplicate count. */
  def dedupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    contentHash(df, textCol)
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** The deduplicated frame: only the surviving row per distinct text. */
  def dedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = dedupGroups(df, textCol, idCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
