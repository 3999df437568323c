package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram novelty / information-density scoring — SURVEY.md §2 T27.
  *
  * For each document: what fraction of its distinct token n-grams occur
  * NOWHERE else in the corpus (document frequency 1), and the mean
  * inverse document frequency of its n-grams. Low novelty ⇒ the
  * document is assembled from corpus-common material (boilerplate,
  * templates, near-copies below the dedup thresholds); high novelty ⇒
  * unique content worth keeping under a token budget. This is the
  * document-level aggregate of the same df signal TF-IDF (T7) uses per
  * term, and a cheap complement to perplexity-based selection (T24):
  * no model to train, one corpus statistic.
  *
  * Scale shape: one row-local shingling pass (distinct within document),
  * then df via count() OVER (PARTITION BY gram) and one groupBy(doc) —
  * ONE corpus scan and two shuffles. The groupBy(gram)+join formulation
  * costs a third shuffle and a second scan: the join side must move
  * every (doc, gram) row anyway, so the window loses nothing to
  * map-side combining and saves the count-table round trip. Grams
  * travel as 64-bit HASHES, not strings — 8-byte exchange keys instead
  * of multi-token text. `gramHash` is xxhash64 for production, the
  * shared md5-60 when a DuckDB oracle must replay the exact df values
  * (q21's trade).
  */
object Novelty {

  /** Per-document novelty stats over distinct `n`-token shingles.
    * Documents shorter than `n` tokens contribute their whole text as
    * a single gram (q21's convention). Output: id, n_grams, n_novel,
    * novel_frac, info_density = round(avg(1/df), 4).
    */
  def score(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      gramHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column = xxhash64(_)
  ): DataFrame = {
    val toks = split(col(textCol), " ")
    val grams = df
      .select(
        col(idCol),
        explode(
          array_distinct(
            when(
              size(toks) >= n,
              transform(
                sequence(lit(0), size(toks) - n),
                i => gramHash(concat_ws(" ", slice(toks, i + 1, lit(n))))
              )
            ).otherwise(array(gramHash(col(textCol))))
          )
        ).as("gram")
      )
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    grams
      .withColumn("df", count(lit(1)).over(w))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"),
        round(avg(lit(1.0) / col("df")), 4).as("info_density")
      )
      .withColumn(
        "novel_frac",
        round(col("n_novel").cast("double") / col("n_grams"), 4)
      )
  }
}
