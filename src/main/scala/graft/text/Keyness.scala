package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-comparison statistics for source-level curation: which
  * tokens make a source DIFFERENT (G² log-likelihood keyness, Dunning
  * 1993; the corpus-linguistics form per Rayson & Garside 2000) and
  * how far a source's whole token distribution has drifted from the
  * corpus (Jensen–Shannon divergence) — the two dashboard numbers
  * behind "this crawl slice looks templated / off-domain / spammy".
  *
  * Scale shape: ONE (corpus, token) count aggregate is the only
  * corpus-sized stage; per-corpus and global totals are tiny aggregates
  * broadcast back onto it. G² is a per-row closed form on that table
  * (no summation, so cross-engine replay is exact double arithmetic);
  * JS sums vocab-sized terms per corpus. The dense corpus×vocab frame
  * JS needs is the honest cost of comparing full distributions — it is
  * vocab × #corpora rows, not corpus-sized.
  */
object Keyness {

  /** (corpus, token, cnt) — the one corpus-sized pass. */
  def tokenCounts(df: DataFrame, textCol: String, corpusCol: String): DataFrame =
    df.select(
        col(corpusCol).as("corpus"),
        explode(split(col(textCol), " ")).as("token"))
      .groupBy("corpus", "token")
      .agg(count(lit(1)).as("cnt"))

  /** x·ln(x/e) with the 0·ln0 = 0 convention (x = 0 ⇒ term 0). */
  private def xlx(x: Column, e: Column): Column =
    when(x > 0, x * log(x / e)).otherwise(lit(0.0))

  /** Per (corpus, token): observed self/rest counts and the G²
    * signed-by-nothing statistic vs the rest of the corpus. Output
    * `(corpus, token, n_self, n_rest, g2)`; `over` marks
    * overrepresentation via the EXACT integer cross-product test
    * n_self·total_rest > n_rest·total_self.
    */
  def g2(df: DataFrame, textCol: String, corpusCol: String): DataFrame = {
    val counts = tokenCounts(df, textCol, corpusCol)
    val corpTotals = counts.groupBy("corpus").agg(sum("cnt").as("n1"))
    val tokTotals = counts.groupBy("token").agg(sum("cnt").as("tok_total"))
    val grand = counts.agg(sum("cnt").as("n")).select(col("n"))

    val a = col("cnt").cast("double")
    val b = (col("tok_total") - col("cnt")).cast("double")
    val n1 = col("n1").cast("double")
    val n2 = (col("n") - col("n1")).cast("double")
    val e1 = n1 * (a + b) / (n1 + n2)
    val e2 = n2 * (a + b) / (n1 + n2)

    counts
      .join(broadcast(corpTotals), Seq("corpus"))
      .join(broadcast(tokTotals), Seq("token"))
      .crossJoin(broadcast(grand))
      .withColumn("g2", lit(2.0) * (xlx(a, e1) + xlx(b, e2)))
      .withColumn(
        "over",
        col("cnt") * (col("n") - col("n1")) > (col("tok_total") - col("cnt")) * col("n1"))
      .select(
        col("corpus"), col("token"),
        col("cnt").as("n_self"),
        (col("tok_total") - col("cnt")).as("n_rest"),
        col("g2"), col("over"))
  }

  /** Top-k OVERREPRESENTED tokens per corpus by (g2 desc, token asc) —
    * the per-source keyword list. Ranking uses the 4dp-rounded g2 so
    * the cut is replayable (the q96/q112 rank-binding convention).
    */
  def topKeyness(df: DataFrame, textCol: String, corpusCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    g2(df, textCol, corpusCol)
      .where(col("over"))
      .withColumn("g2_r", round(col("g2"), 4))
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy("corpus").orderBy(col("g2_r").desc, col("token"))))
      .where(col("rk") <= k)
      .select(col("corpus"), col("token"), col("n_self"), col("n_rest"),
        col("g2_r").as("g2"), col("rk"))
  }

  /** Per-corpus Jensen–Shannon divergence (natural log) between the
    * corpus's token distribution P and the GLOBAL distribution Q:
    * 0.5·KL(P‖M) + 0.5·KL(Q‖M), M = (P+Q)/2, summed over the global
    * vocabulary (absent tokens contribute only the Q side). Output
    * `(corpus, js_div)`.
    */
  def jsDivergence(df: DataFrame, textCol: String, corpusCol: String): DataFrame = {
    val counts = tokenCounts(df, textCol, corpusCol)
    val corpTotals = counts.groupBy("corpus").agg(sum("cnt").as("n1"))
    val tokTotals = counts.groupBy("token").agg(sum("cnt").as("tok_total"))
    val grand = counts.agg(sum("cnt").as("n"))

    // dense corpus × vocab: every corpus scores every global token
    val dense = corpTotals
      .crossJoin(broadcast(tokTotals))
      .join(counts, Seq("corpus", "token"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(grand))

    val p = col("cnt").cast("double") / col("n1").cast("double")
    val q = col("tok_total").cast("double") / col("n").cast("double")
    val m = (p + q) / lit(2.0)
    val term = when(p > 0, lit(0.5) * p * log(p / m)).otherwise(lit(0.0)) +
      when(q > 0, lit(0.5) * q * log(q / m)).otherwise(lit(0.0))

    dense
      .groupBy("corpus")
      .agg(sum(term).as("js_raw"))
      .select(col("corpus"), round(col("js_raw"), 4).as("js_div"))
  }
}
