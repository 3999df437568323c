package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token dispersion / burstiness across documents (Church–Gale 1995):
  * for each token, the variance-to-mean ratio (VMR) of its PER-DOCUMENT
  * count, zeros included. A Poisson-scattered token has VMR ≈ 1;
  * content words are BURSTY (VMR ≫ 1: absent almost everywhere, heavy
  * where topical) while function words sit near 1 — so VMR separates
  * topical vocabulary from glue without any stopword list, and a
  * boilerplate template shows up as a block of high-VMR tokens sharing
  * identical counts. Complements [[TfIdf]] (df-based) with a
  * within-doc-frequency signal df can't see.
  *
  * Scale shape: one row-local tokenize + (doc, token) count aggregate,
  * one (token) groupBy over it; the zero-doc mass enters in CLOSED FORM
  * (Σ over missing docs contributes only through N), so the dense
  * doc×vocab frame is never built. Integer sums end-to-end until the
  * final divisions.
  */
object Dispersion {

  /** Top-`k` tokens by corpus count with their dispersion stats:
    * (token, doc_freq, term_freq, vmr), deterministically ordered by
    * (term_freq DESC, token).
    */
  def tokenDispersion(df: DataFrame, textCol: String, idCol: String, k: Int = 30): DataFrame = {
    val n = df.count().toDouble
    val perDoc = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).cast("double").as("c"))
    perDoc
      .groupBy("token")
      .agg(
        count(lit(1)).cast("long").as("doc_freq"),
        sum("c").as("tf"),
        sum(col("c") * col("c")).as("sq"))
      .select(
        col("token"),
        col("doc_freq"),
        col("tf").cast("long").as("term_freq"),
        round(
          ((col("sq") - col("tf") * col("tf") / lit(n)) / lit(n - 1.0)) /
            (col("tf") / lit(n)),
          4).as("vmr"))
      .orderBy(col("term_freq").desc, col("token"))
      .limit(k)
  }
}
