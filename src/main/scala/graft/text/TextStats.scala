package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (SURVEY.md §2
  * T1–T2). Pure `functions._` column algebra — everything stays inside
  * whole-stage codegen; no UDFs, no collect.
  */
object TextStats {

  /** Whitespace tokens (single-space convention of the synthetic corpus;
    * use a regex splitter for real text).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish lexer pattern: letter runs, digit runs, or single
    * non-alphanumeric marks — the word/number/punct segmentation a
    * byte-pair encoder refines. Kept to a portable regex subset so the
    * DuckDB oracle (RE2) and Spark (java.util.regex) agree.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** Token statistics: counts, unique counts, char counts, average token
    * length, and two subword estimates — chars/4 (the standard
    * rule-of-thumb compression ratio for byte-pair encodings) and a
    * [[BpeishPattern]] regex lexer count.
    */
  def withTokenStats(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    df.withColumn("n_tokens", size(t))
      .withColumn("n_uniq_tokens", size(array_distinct(t)))
      .withColumn("n_chars_obs", length(col(textCol)))
      .withColumn(
        "avg_token_len",
        round(length(regexp_replace(col(textCol), " ", "")).cast("double") / size(t), 4)
      )
      .withColumn("est_bpe_tokens", ceil(length(col(textCol)).cast("double") / 4.0).cast("long"))
      .withColumn("n_bpe_regex", regexp_count(col(textCol), lit(BpeishPattern)))
  }

  /** English stopwords present in the synthetic corpus vocabulary. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "is", "to", "in")

  /** Quality score in [0,1]: length saturation, stopword balance and
    * lexical diversity — the usual cheap heuristics used to pre-filter
    * LLM training corpora.
    */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t).cast("double")
    val stopFrac =
      size(filter(t, tk => tk.isin(stopwords: _*))).cast("double") / nTok
    val uniqFrac = size(array_distinct(t)).cast("double") / nTok
    // punctuation share of NON-SPACE characters (length/punct/stopword
    // are the standard cheap corpus pre-filters)
    val nonSpace = length(regexp_replace(col(textCol), " ", "")).cast("double")
    val punctFrac =
      length(regexp_replace(col(textCol), "[A-Za-z0-9 ]", "")).cast("double") / nonSpace
    val lenScore = least(nTok / 100.0, lit(1.0))
    df.withColumn("stop_frac", round(stopFrac, 4))
      .withColumn("uniq_frac", round(uniqFrac, 4))
      .withColumn("punct_frac", round(punctFrac, 4))
      .withColumn(
        "quality",
        round(lenScore * 0.4 + (lit(1.0) - stopFrac) * 0.3 + uniqFrac * 0.3, 4)
      )
  }
}
