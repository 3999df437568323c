package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest neighbors via random-hyperplane LSH
  * (SURVEY.md §2 P7) — the scale path next to [[Cosine.topK]]'s exact
  * baseline.
  *
  * `numPlanes` deterministic pseudo-random hyperplanes hash each vector
  * to a bucket (sign pattern of the projections). Neighbor search only
  * compares query vectors with same-bucket corpus vectors; with
  * `numTables` independent tables OR-ed together, recall rises while
  * each table's bucket join stays tiny. 100 TB shape: the corpus is
  * bucketed once (narrow scan + small shuffle on bucket), and lookups
  * are hash joins on (table, bucket) — never a cross product.
  *
  * Hyperplane components are derived from a hash of (table, plane, dim)
  * — deterministic across runs and executors, no collected state.
  */
object AnnLsh {

  /** Deterministic pseudo-random hyperplane component in [-1, 1). */
  private def planeComponent(table: Int, plane: Int, dim: Int): Double = {
    var h = table.toLong * 1000003L + plane.toLong * 8191L + dim.toLong + 0x9e3779b97f4a7c15L
    // splitmix64 finalizer — public-domain mixing constants
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h = h ^ (h >>> 31)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Bucket id of `vec` for one table: sign pattern of projections
    * (codegen'd [[graft.functions.FloatVec.dot]] against literal planes).
    */
  def bucket(vec: Column, dims: Int, numPlanes: Int, table: Int): Column =
    (0 until numPlanes).foldLeft(lit(0L)) { (acc, p) =>
      val planeArr = typedlit((0 until dims).map(d => planeComponent(table, p, d).toFloat).toArray)
      val proj = graft.functions.FloatVec.dot(vec, planeArr)
      acc.bitwiseOR(shiftleft(when(proj > 0, 1L).otherwise(0L), p))
    }

  /** (id, table, bucket) for every table. */
  def bucketize(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      numPlanes: Int = 12,
      numTables: Int = 4
  ): DataFrame = {
    val tcols = (0 until numTables).map { t =>
      struct(lit(t).as("table"), bucket(col(vecCol), dims, numPlanes, t).as("bucket"))
    }
    df.select(col(idCol), col(vecCol), explode(array(tcols: _*)).as("tb"))
      .select(col(idCol), col(vecCol), col("tb.table"), col("tb.bucket"))
  }

  /** Approximate top-k for each query over same-bucket corpus rows. */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      k: Int,
      numPlanes: Int = 12,
      numTables: Int = 4
  ): DataFrame = {
    // norms computed once per vector, BEFORE the bucket join — inside the
    // join they would be re-evaluated per candidate pair
    val qb = bucketize(queries, idCol, vecCol, dims, numPlanes, numTables)
      .select(col("table"), col("bucket"), col(idCol).as("qid"), col(vecCol).as("qv"),
        Cosine.norm(col(vecCol)).as("qn"))
    val cb = bucketize(corpus, idCol, vecCol, dims, numPlanes, numTables)
      .select(col("table"), col("bucket"), col(idCol).as("nid"), col(vecCol).as("nv"),
        Cosine.norm(col(vecCol)).as("nn"))
    // score FIRST, then OR across tables with a distinct on the three
    // narrow output columns: a pair colliding in t tables costs t cheap
    // dot products instead of shuffling t copies of both float vectors
    // through the distinct (round-1 review: the vector-payload distinct
    // grew with dims × numTables). Scores are deterministic per pair, so
    // (qid, nid, cos_sim) dedups exactly like (qid, nid).
    val cand = cb
      .join(broadcast(qb), Seq("table", "bucket"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos_sim", Cosine.cosine(col("qv"), col("nv"), col("qn"), col("nn")))
      .select(col("qid"), col("nid"), col("cos_sim"))
      .distinct() // OR across tables
    // bounded-heap top-k aggregate (map-side combined), not a window
    graft.functions.TopK.perKey(cand, Seq("qid"), "cos_sim", "nid", k)
      .select(col("qid"), col("nid"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  // ---- multi-probe (Lv et al. 2007) ----------------------------------

  /** Probe buckets for one table: the base bucket plus single-bit flips
    * of the `numProbes − 1` planes whose projections sit CLOSEST to the
    * hyperplane — the near-boundary planes are exactly where a true
    * neighbor most likely landed on the other side. Returns an
    * array<long> of `numProbes` buckets, base first.
    */
  def probeBuckets(
      vec: Column,
      dims: Int,
      numPlanes: Int,
      table: Int,
      numProbes: Int): Column = {
    require(numProbes >= 1 && numProbes <= numPlanes + 1,
      s"numProbes must be in [1, numPlanes + 1]")
    val projs = array((0 until numPlanes).map { p =>
      val planeArr =
        typedlit((0 until dims).map(d => planeComponent(table, p, d).toFloat).toArray)
      graft.functions.FloatVec.dot(vec, planeArr)
    }: _*)
    val base = aggregate(
      zip_with(projs, sequence(lit(0), lit(numPlanes - 1)),
        (pr, i) => struct(pr.as("pr"), i.as("i"))),
      lit(0L),
      (acc, s) =>
        acc.bitwiseOR(
          when(s.getField("pr") > 0,
            pow(lit(2.0), s.getField("i")).cast("long")).otherwise(lit(0L))))
    // rank planes by |projection| asc (ties by index — array_sort on
    // (abs, idx) structs is lexicographic), flip the closest ones
    val ranked = slice(
      array_sort(
        zip_with(transform(projs, abs(_)), sequence(lit(0), lit(numPlanes - 1)),
          (a, i) => struct(a.as("a"), i.as("i")))),
      1, numProbes - 1)
    concat(
      array(base),
      transform(ranked, s =>
        base.bitwiseXOR(pow(lit(2.0), s.getField("i")).cast("long"))))
  }

  /** [[topK]] with multi-probe queries: the corpus is bucketed ONCE
    * (same tables, same cost) while each query probes `numProbes`
    * buckets per table — recall comparable to many more tables at a
    * fraction of the corpus-side build/storage, the standard
    * memory/recall trade (Lv 2007). Probing expands only the
    * broadcast-sized QUERY frame.
    */
  def topKMultiProbe(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      k: Int,
      numPlanes: Int = 12,
      numTables: Int = 4,
      numProbes: Int = 4
  ): DataFrame = {
    val qprobe = {
      val tcols = (0 until numTables).map { t =>
        struct(
          lit(t).as("table"),
          probeBuckets(col(vecCol), dims, numPlanes, t, numProbes).as("buckets"))
      }
      queries
        .select(col(idCol).as("qid"), col(vecCol).as("qv"),
          Cosine.norm(col(vecCol)).as("qn"), explode(array(tcols: _*)).as("tb"))
        .select(col("qid"), col("qv"), col("qn"), col("tb.table"),
          explode(col("tb.buckets")).as("bucket"))
    }
    val cb = bucketize(corpus, idCol, vecCol, dims, numPlanes, numTables)
      .select(col("table"), col("bucket"), col(idCol).as("nid"), col(vecCol).as("nv"),
        Cosine.norm(col(vecCol)).as("nn"))
    val cand = cb
      .join(broadcast(qprobe), Seq("table", "bucket"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos_sim", Cosine.cosine(col("qv"), col("nv"), col("qn"), col("nn")))
      .select(col("qid"), col("nid"), col("cos_sim"))
      .distinct() // OR across tables AND probes
    graft.functions.TopK.perKey(cand, Seq("qid"), "cos_sim", "nid", k)
      .select(col("qid"), col("nid"), round(col("cos_sim"), 4).as("cos_sim"))
  }
}
