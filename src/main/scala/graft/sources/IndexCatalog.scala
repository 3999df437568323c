package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unified on-disk layout for every persisted index/model artifact the
  * library trains: IVF-PQ state (both variants), OPQ rotations, graph
  * ANN layer metadata, tokenizer vocabs. One catalog entry is a
  * directory of named parquet PARTS plus a `_graft_meta` parquet:
  *
  * {{{
  *   <path>/_graft_meta     (kind, version, props map, part list)
  *   <path>/<part>/...      one parquet dataset per named part
  * }}}
  *
  * Why one layout instead of the four ad-hoc schemes it replaces:
  *   - `kind` is VALIDATED on open — loading an OPQ rotation where an
  *     IVF-PQ index is expected fails with a message, not a cast error
  *     three calls later (the exact failure mode ad-hoc paths invite);
  *   - the meta file is written LAST, so its presence marks the entry
  *     complete: a writer that died mid-part leaves an unopenable
  *     directory, never a silently half-readable index;
  *   - `props` carries the build parameters the SEARCH side must agree
  *     on (e.g. the graph index's `coarse_every`) so serving sessions
  *     read them instead of having to re-pass them correctly;
  *   - `version` gates forward-compat: a future layout bump fails old
  *     readers loudly.
  *
  * Parts hold driver-bounded model state (centroids, codebooks,
  * rotation rows, vocab merges — broadcast-sized by construction), so
  * each is written as a single file; corpus-sized payloads (PQ code
  * tables, graph edge lists) stay in their partitioned/bucketed layouts
  * and are REFERENCED from `props`, not copied into the entry.
  */
object IndexCatalog {

  val FormatVersion = 1
  private val MetaPart = "_graft_meta"

  final case class Meta(
      kind: String,
      version: Int,
      props: Map[String, String],
      parts: Seq[String]
  ) {
    def prop(name: String): String =
      props.getOrElse(name, sys.error(s"IndexCatalog: missing prop '$name' (have ${props.keys.mkString(",")})"))
    def propInt(name: String): Int = prop(name).toInt
  }

  /** Write a complete entry: every part, then the meta marker. */
  def write(
      spark: SparkSession,
      path: String,
      kind: String,
      props: Map[String, String],
      parts: Seq[(String, DataFrame)]
  ): Unit = {
    import spark.implicits._
    require(parts.map(_._1).distinct.size == parts.size, "duplicate part names")
    require(!parts.exists(_._1 == MetaPart), s"part name $MetaPart is reserved")
    parts.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$path/$name")
    }
    Seq((kind, FormatVersion, props, parts.map(_._1)))
      .toDF("kind", "version", "props", "parts")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/$MetaPart")
  }

  /** Open an entry, validating it is complete and of the expected kind. */
  def open(spark: SparkSession, path: String, expectedKind: String): Meta = {
    val row =
      try spark.read.parquet(s"$path/$MetaPart").head()
      catch {
        case e: Exception =>
          throw new IllegalStateException(
            s"IndexCatalog: no complete entry at $path (missing/unreadable $MetaPart — " +
              "interrupted write or not a catalog path)", e)
      }
    val meta = Meta(
      row.getString(0), row.getInt(1),
      row.getMap[String, String](2).toMap, row.getSeq[String](3))
    require(
      meta.kind == expectedKind,
      s"IndexCatalog: entry at $path is kind '${meta.kind}', expected '$expectedKind'")
    require(
      meta.version <= FormatVersion,
      s"IndexCatalog: entry at $path has format version ${meta.version}; " +
        s"this build reads <= $FormatVersion")
    meta
  }

  /** Read one named part of an opened entry. */
  def part(spark: SparkSession, path: String, name: String): DataFrame =
    spark.read.parquet(s"$path/$name")
}
