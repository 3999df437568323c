package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity join (SURVEY.md §2 P4).
  *
  * The all-pairs exact baseline for fuzzy dedup: word n-gram sets per
  * document, pairwise |∩|/|∪|. The pair space must be bounded by a
  * blocking key (here: any partition column such as source) — the
  * unblocked full cross product is what [[MinHashLsh]] exists to avoid.
  */
object NGramJaccard {

  /** Pairwise Jaccard over documents sharing `blockCol` (id_a < id_b).
    * EAGER: the pair result is materialized before returning so the
    * cached set frame — read by both sides of the block self-join — is
    * released instead of lingering in the block manager.
    */
  def similarityJoin(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      n: Int = 2,
      minJaccard: Double = 0.0
  ): DataFrame = {
    // n-grams hashed to longs: set intersection on long arrays, and
    // |A∪B| = |A|+|B|−|A∩B| so the union array is never materialized
    val sets = MinHashLsh
      .shingleSets(df, textCol, idCol, n)
      .join(df.select(col(idCol), col(blockCol).as("block")), Seq(idCol))
      .select(col("block"), col(idCol), col("sh_set").as("ngrams"))
      .persist() // both sides of the block self-join read this frame
    val l = sets.select(col("block"), col(idCol).as("id_a"), col("ngrams").as("ng_a"))
    val r = sets.select(col("block"), col(idCol).as("id_b"), col("ngrams").as("ng_b"))
    val out = l.join(r, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .withColumn(
        "inter",
        graft.functions.SetOps.sortedIntersectSize(col("ng_a"), col("ng_b")).cast("double"))
      .withColumn(
        "jaccard",
        round(col("inter") / (size(col("ng_a")) + size(col("ng_b")) - col("inter")), 4)
      )
      .where(col("jaccard") >= minJaccard)
      .select(col("block"), col("id_a"), col("id_b"), col("jaccard"))
      .localCheckpoint()
    sets.unpersist(false)
    out
  }

  /** Directional n-gram CONTAINMENT join — |A∩B|/|A| and |A∩B|/|B| per
    * blocked pair: the asymmetric score Jaccard hides. A short quote
    * inside a long article has containment(short→long) ≈ 1 while
    * Jaccard ≈ |short|/|long| ≈ 0 — exactly the doc-in-doc /
    * quote-inclusion / boilerplate-wrapper case dedup-by-Jaccard
    * misses (Broder's original resemblance-vs-containment split).
    * Same block self-join + sorted-intersection machinery as
    * [[similarityJoin]]; pairs kept when EITHER direction ≥
    * `minContainment`.
    */
  def containmentJoin(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      n: Int = 2,
      minContainment: Double = 0.5
  ): DataFrame = {
    val sets = MinHashLsh
      .shingleSets(df, textCol, idCol, n)
      .join(df.select(col(idCol), col(blockCol).as("block")), Seq(idCol))
      .select(col("block"), col(idCol), col("sh_set").as("ngrams"))
      .persist()
    val l = sets.select(col("block"), col(idCol).as("id_a"), col("ngrams").as("ng_a"))
    val r = sets.select(col("block"), col(idCol).as("id_b"), col("ngrams").as("ng_b"))
    val out = l.join(r, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .withColumn(
        "inter",
        graft.functions.SetOps.sortedIntersectSize(col("ng_a"), col("ng_b")).cast("double"))
      .withColumn("cont_a_in_b", round(col("inter") / size(col("ng_a")), 4))
      .withColumn("cont_b_in_a", round(col("inter") / size(col("ng_b")), 4))
      .where(col("cont_a_in_b") >= minContainment || col("cont_b_in_a") >= minContainment)
      .select(col("block"), col("id_a"), col("id_b"), col("cont_a_in_b"), col("cont_b_in_a"))
      .localCheckpoint()
    sets.unpersist(false)
    out
  }
}
