package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repetition-based quality filters in the Gopher / C4 family: a
  * document whose mass concentrates in one token or one bigram is
  * boilerplate or degenerate generation, and gets filtered before
  * training. Per document:
  *
  *   - `n_tokens`        total tokens
  *   - `frac_top_token`  occurrences of the most frequent token / n
  *   - `frac_unique`     distinct tokens / n
  *   - `frac_top_bigram` occurrences of the most frequent bigram /
  *                       (n − 1), 0.0 for single-token docs
  *
  * Shape: ONE posexplode, bigrams by window `lead` over (doc, pos)
  * (split once, codegen — the HOF-lambda version re-splits per element,
  * see SURVEY §8), then two groupBy passes whose shuffles carry
  * (doc, token[, token2]) count rows — never raw text. All ratios are
  * exact integer quotients, so the DuckDB oracle matches bit-for-bit
  * after 4-dp rounding.
  */
object Repetition {

  def stats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val bi = toks.withColumn("tok2", lead(col("tok"), 1).over(w))

    val tokStats = toks
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_tokens"), max("c").as("top_tok"), count(lit(1)).as("n_unique"))

    val biStats = bi
      .where(col("tok2").isNotNull)
      .groupBy(col(idCol), col("tok"), col("tok2"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum("c").as("n_bigrams"), max("c").as("top_bi"))

    tokStats
      .join(biStats, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_tokens"),
        (col("top_tok") / col("n_tokens")).as("frac_top_token"),
        (col("n_unique") / col("n_tokens")).as("frac_unique"),
        coalesce(col("top_bi") / col("n_bigrams"), lit(0.0)).as("frac_top_bigram"))
  }
}
