package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned snapshot tables over plain parquet — manifest-based time
  * travel (the core of the Delta/Iceberg reader contract, expressed
  * with the [[IndexCatalog]] meta-written-LAST atomicity rule):
  *
  * {{{
  *   <root>/data/v<n>/            immutable parquet dir per commit
  *   <root>/_manifests/v<n>/      catalog entry listing the dirs that
  *                                ARE version n (written last = commit)
  * }}}
  *
  * `append` writes ONE new data dir and a manifest referencing the
  * parent's dirs plus it — old files are never rewritten, so commit
  * cost is proportional to the new data, not the table.  `overwrite`
  * starts a fresh dir list.  A reader resolves a version by opening
  * its manifest and unioning the listed dirs; `readLatest` takes the
  * highest version with a COMPLETE manifest, so a writer that died
  * mid-commit (data dir present, manifest absent) is invisible — the
  * same guarantee every serious table format builds on.  Single
  * writer per table is the caller's contract (as in the rest of the
  * catalog); data dirs are full parquet datasets, so every Spark
  * pushdown/pruning behavior is unchanged.
  */
object Snapshots {

  private val Kind = "snapshot"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Complete (manifest-committed) versions at `root`, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val dir = new Path(s"$root/_manifests")
    val f = fs(spark, root)
    if (!f.exists(dir)) Seq.empty
    else
      f.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .filter(_.startsWith("v"))
        .flatMap(n => scala.util.Try(n.drop(1).toInt).toOption)
        .filter { v =>
          scala.util.Try(IndexCatalog.open(spark, s"$root/_manifests/v$v", Kind)).isSuccess
        }
        .sorted
  }

  private def commit(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      parentDirs: Seq[String],
      op: String): Int = {
    val next = versions(spark, root).lastOption.getOrElse(0) + 1
    // the dir name carries a deterministic uniquifier (count of existing
    // data dirs), so an orphaned dir from a torn commit never collides
    // with — or blocks — the next commit
    val dataRoot = new Path(s"$root/data")
    val f = fs(spark, root)
    val seq = if (f.exists(dataRoot)) f.listStatus(dataRoot).length else 0
    val dataDir = s"data/v$next-$seq"
    df.write.mode("errorifexists").parquet(s"$root/$dataDir")
    val dirs = parentDirs :+ dataDir
    IndexCatalog.write(
      spark, s"$root/_manifests/v$next", Kind,
      Map("table_version" -> next.toString, "op" -> op, "dirs" -> dirs.mkString(";")),
      parts = Seq.empty)
    next
  }

  /** Append `df` as a new version; returns the committed version. */
  def append(spark: SparkSession, root: String, df: DataFrame): Int = {
    val parent = versions(spark, root).lastOption
      .map(v => dirsOf(spark, root, v)).getOrElse(Seq.empty)
    commit(spark, root, df, parent, "append")
  }

  /** Replace the table contents with `df` as a new version. */
  def overwrite(spark: SparkSession, root: String, df: DataFrame): Int =
    commit(spark, root, df, Seq.empty, "overwrite")

  private def dirsOf(spark: SparkSession, root: String, version: Int): Seq[String] = {
    val meta = IndexCatalog.open(spark, s"$root/_manifests/v$version", Kind)
    meta.prop("dirs").split(";").toSeq.filter(_.nonEmpty)
  }

  /** Read the table AS OF `version`. */
  def readVersion(spark: SparkSession, root: String, version: Int): DataFrame = {
    val dirs = dirsOf(spark, root, version)
    require(dirs.nonEmpty, s"Snapshots: version $version of $root lists no data")
    spark.read.parquet(dirs.map(d => s"$root/$d"): _*)
  }

  /** Read the latest committed version. */
  def readLatest(spark: SparkSession, root: String): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"Snapshots: no committed versions at $root")
    readVersion(spark, root, vs.last)
  }

  /** Expire history: drop manifests older than the newest `keepVersions`
    * and delete every data dir no surviving manifest references — the
    * VACUUM/expire-snapshots half of the table-format contract. Deletion
    * order is crash-safe in the same spirit as commits: manifests go
    * FIRST (a version stops being readable before its files vanish), so
    * a crash mid-vacuum leaves either a still-consistent older table or
    * a fully-vacuumed one — never a manifest pointing at deleted data.
    * Orphaned data dirs from torn commits (no manifest at all) are
    * swept too. Returns (versions dropped, data dirs deleted).
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 1): (Int, Int) = {
    require(keepVersions >= 1, "must keep at least one version")
    val f = fs(spark, root)
    val vs = versions(spark, root)
    val drop = vs.dropRight(keepVersions)
    val keep = vs.takeRight(keepVersions)
    val keptDirs = keep.flatMap(v => dirsOf(spark, root, v)).toSet
    // 1. manifests of dropped versions first
    drop.foreach(v => f.delete(new Path(s"$root/_manifests/v$v"), true))
    // 2. any data dir not referenced by a surviving manifest (covers
    //    dropped-version dirs AND torn-commit orphans)
    val dataRoot = new Path(s"$root/data")
    var removed = 0
    if (f.exists(dataRoot)) {
      f.listStatus(dataRoot).foreach { st =>
        val rel = s"data/${st.getPath.getName}"
        if (!keptDirs.contains(rel)) { f.delete(st.getPath, true); removed += 1 }
      }
    }
    (drop.size, removed)
  }
}
