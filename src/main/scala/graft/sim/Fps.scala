package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Farthest-point (greedy k-center) sampling over an embedding column
  * — diversity-first data selection (the Gonzalez 1985 2-approximation
  * of the k-center objective; the core-set shape of Sener & Savarese
  * 2018): pick the most SPREAD-OUT k exemplars instead of k random
  * ones — the subset-selection complement of the similarity family
  * (dedup removes redundancy; FPS picks the coverage skeleton for
  * labeling budgets, eval-set curation, prompt-pool seeding).
  *
  * Deterministic convention: the seed is the smallest id; each step
  * adds the point maximizing the min squared-euclidean distance to the
  * chosen set, ties broken by smallest id. Distances are DOUBLE
  * row-local fold expressions (`zip_with` + `aggregate` — codegen, no
  * UDF), so the whole chain replays in SQL.
  *
  * Scale shape: the chosen centers ride as BROADCAST LITERAL vectors
  * (k-bounded — the [[AnnIvf]] centroid contract); each of the k−1
  * steps is ONE aggregate over the persisted (id, vec) projection —
  * min-distance is a `least()` over ≤k codegen'd folds, the argmax a
  * single `max(struct(dist, −id))`. k scans total, nothing corpus²,
  * nothing corpus-sized on the driver.
  */
object Fps {

  private def dist2To(vec: Column, center: Array[Double]): Column = {
    val c = typedLit(center.toSeq)
    aggregate(
      zip_with(vec, c, (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
      lit(0.0), (acc, x) => acc + x)
  }

  /** (sel_order, id, min_dist) — the k selected exemplars in selection
    * order; `min_dist` is the squared distance to the previously
    * chosen set at selection time (4dp; 0 for the seed) — the k-center
    * radius trajectory, a coverage diagnostic in itself.
    */
  def sample(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "Fps.sample: k must be >= 1")
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .localCheckpoint(true) // scanned k times
    val n = base.count()
    require(n >= k, s"Fps.sample: need at least $k rows, got $n")
    val seedRow = base.agg(min(col("id"))).head()
    val seedId = seedRow.getLong(0)
    def vecOf(id: Long): Array[Double] =
      base.where(col("id") === id).head().getSeq[Float](1).map(_.toDouble).toArray
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Double)]((seedId, 0.0))
    var centers = Vector(vecOf(seedId))
    while (chosen.length < k) {
      val dists = centers.map(c => dist2To(col("v"), c))
      val minD = if (dists.length == 1) dists.head else least(dists: _*)
      // max distance, ties -> smallest id (struct compare is
      // lexicographic; the winner's VECTOR rides behind the unique id,
      // never reaching the comparison — saves a lookup scan per step)
      val r = base
        .where(!col("id").isInCollection(chosen.map(_._1)))
        .agg(max(struct(minD.as("d"), (-col("id")).as("nid"), col("v").as("v"))))
        .head().getStruct(0)
      val id = -r.getLong(1)
      chosen += ((id, r.getDouble(0)))
      centers :+= r.getSeq[Float](2).map(_.toDouble).toArray
    }
    val spark = df.sparkSession
    import spark.implicits._
    chosen.toSeq.zipWithIndex.map { case ((id, d), i) =>
      (i + 1, id, math.floor(d * 1e4 + 0.5) / 1e4)
    }.toDF("sel_order", "id", "min_dist")
  }
}
