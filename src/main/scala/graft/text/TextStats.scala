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

  /** Character-class / script profile (T31): per-document counts of
    * letters, digits, spaces and other marks, token-level all-alpha /
    * all-digit counts, and the dominant class — the cheap signal behind
    * charset-quality gates (code vs prose vs tables vs garbage) and
    * per-source ingest dashboards. Deliberately INTEGER-ONLY outputs:
    * counts are exact on every engine; callers derive ratios where a
    * rounding convention is their own problem (the q105 lesson). The
    * dominant-class CASE compares integers in a fixed order, so ties
    * resolve identically everywhere. One codegen map pass, no shuffle.
    */
  def withScriptProfile(df: DataFrame, textCol: String): DataFrame = {
    val t = tokens(col(textCol))
    val nChars = length(col(textCol)).cast("long")
    val nLetters = length(regexp_replace(col(textCol), "[^A-Za-z]", "")).cast("long")
    val nDigits = length(regexp_replace(col(textCol), "[^0-9]", "")).cast("long")
    val nSpaces = (nChars - length(regexp_replace(col(textCol), " ", ""))).cast("long")
    val nPunct = nChars - nLetters - nDigits - nSpaces
    df.withColumn("n_chars_p", nChars)
      .withColumn("n_letters", nLetters)
      .withColumn("n_digits", nDigits)
      .withColumn("n_spaces", nSpaces)
      .withColumn("n_punct", nPunct)
      .withColumn("n_tokens_p", size(t).cast("long"))
      .withColumn(
        "n_alpha_tokens",
        size(filter(t, tk => tk.rlike("^[A-Za-z]+$"))).cast("long"))
      .withColumn(
        "n_digit_tokens",
        size(filter(t, tk => tk.rlike("^[0-9]+$"))).cast("long"))
      .withColumn(
        "dominant",
        when(nLetters >= nDigits && nLetters >= nPunct, lit("alpha"))
          .when(nDigits >= nPunct, lit("digit"))
          .otherwise(lit("punct")))
  }

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
