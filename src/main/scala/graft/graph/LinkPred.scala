package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction over a bipartite graph — the
  * candidate-generation member of the graph family (reference-adjacent:
  * "which two suppliers serve the same customers", "which two documents
  * share sources" — co-engagement similarity without embeddings).
  *
  * Projects the bipartite edge set (left, right) onto right-side pairs
  * through shared left neighbors, scoring each pair with the three
  * classical predictors (Liben-Nowell & Kleinberg 2003):
  * common neighbors |Γ(u)∩Γ(v)|, Adamic–Adar Σ_w 1/ln(deg w), and
  * Jaccard |Γ∩|/|Γ∪|. Everything is one wedge join + one pair
  * aggregate — the same Σ deg² shape as [[Triangles]], shuffling on
  * node keys only; nothing iterative, nothing collected.
  *
  * Scale contract: the wedge join emits Σ_left deg(w)² candidate rows.
  * On power-law lefts, cap the projection with `maxLeftDegree` — a
  * left node connected to half the graph contributes (n/2)² wedges and
  * ~zero signal (its AA weight 1/ln(deg) → 0); dropping hubs above the
  * cap is the standard sparsifier and keeps the join linear-ish. The
  * cap is OFF (0) by default so small graphs score exactly.
  */
object LinkPred {

  /** Right-side pair scores: one row per unordered pair (a < b) of
    * right nodes sharing ≥ `minCommon` left neighbors, with
    * `cn` (common neighbors), `aa` (Adamic–Adar, 6dp), `jaccard`
    * (6dp). Input edges are deduplicated; left nodes of degree 1
    * generate no pairs and hubs above `maxLeftDegree` (when > 0) are
    * excluded from the projection.
    */
  def bipartiteScores(
      edges: DataFrame,
      leftCol: String,
      rightCol: String,
      minCommon: Long = 1L,
      maxLeftDegree: Long = 0L): DataFrame = {
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val e = edges.select(col(leftCol).as("l"), col(rightCol).as("r")).distinct()
    val leftDeg = e.groupBy("l").agg(count(lit(1)).as("dl"))
    val rightDeg = e.groupBy("r").agg(count(lit(1)).as("dr"))
    val kept =
      if (maxLeftDegree > 0) leftDeg.where(col("dl") <= maxLeftDegree) else leftDeg
    val ew = e.join(kept, Seq("l"))
    val a = ew.as("a"); val b = ew.as("b")
    val wedges = a.join(b, col("a.l") === col("b.l") && col("a.r") < col("b.r"))
      .select(col("a.r").as("ra"), col("b.r").as("rb"), col("a.dl").as("dl"))
    val pairs = wedges.groupBy("ra", "rb")
      .agg(
        count(lit(1)).as("cn"),
        sum(when(col("dl") > 1, lit(1.0) / log(col("dl").cast("double")))
          .otherwise(0.0)).as("aa_raw"))
      .where(col("cn") >= minCommon)
    pairs
      .join(rightDeg.withColumnRenamed("r", "ra").withColumnRenamed("dr", "da"), Seq("ra"))
      .join(rightDeg.withColumnRenamed("r", "rb").withColumnRenamed("dr", "db"), Seq("rb"))
      .select(
        col("ra").as("node_a"), col("rb").as("node_b"),
        col("cn"), col("da").as("deg_a"), col("db").as("deg_b"),
        q6(col("aa_raw")).as("aa"),
        q6(col("cn").cast("double") / (col("da") + col("db") - col("cn"))).as("jaccard"))
  }
}
