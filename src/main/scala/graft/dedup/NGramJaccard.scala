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

  /** Pairwise Jaccard over documents sharing `blockCol` (id_a < id_b). */
  def similarityJoin(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockCol: String,
      n: Int = 2,
      minJaccard: Double = 0.0
  ): DataFrame = {
    val sets = MinHashLsh
      .shingled(df, textCol, n)
      .select(col(blockCol).as("block"), col(idCol), col("__shingles").as("ngrams"))
    val l = sets.select(col("block"), col(idCol).as("id_a"), col("ngrams").as("ng_a"))
    val r = sets.select(col("block"), col(idCol).as("id_b"), col("ngrams").as("ng_b"))
    l.join(r, Seq("block"))
      .where(col("id_a") < col("id_b"))
      .withColumn(
        "jaccard",
        round(
          size(array_intersect(col("ng_a"), col("ng_b"))).cast("double") /
            size(array_union(col("ng_a"), col("ng_b"))),
          4
        )
      )
      .where(col("jaccard") >= minJaccard)
      .select(col("block"), col("id_a"), col("id_b"), col("jaccard"))
  }
}
