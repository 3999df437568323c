package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style composite rule filter — SURVEY.md §2 T26.
  *
  * The rule battery of Rae et al. 2021 ("Scaling Language Models:
  * Gopher", Appendix A1.1), adapted to this corpus's whitespace
  * convention: each heuristic becomes a named boolean column so the
  * decision is AUDITABLE — a curation pipeline needs to know WHY a
  * document fell, not just that it fell (the per-rule columns feed the
  * attrition funnel, `ops/Attrition`). Complements T2's scalar quality
  * score (q28): that ranks, this gates.
  *
  * Every rule is row-local `functions._` column algebra — one
  * whole-stage-codegen pass, no shuffle, no UDF; at 100 TB this is a
  * pure map over the corpus scan.
  */
object RuleFilter {

  val MinWords = 15
  val MaxWords = 100000
  val MinMeanWordLen = 2.0
  val MaxMeanWordLen = 10.0
  val MinAlphaFrac = 0.8
  val MinDistinctStopwords = 2
  val MaxDupTokenFrac = 0.6
  val MaxSymbolRatio = 0.1

  /** Append the per-rule booleans and the composite `keep` flag.
    *
    * Rules (names match the output columns):
    *   - r_word_count: MinWords ≤ #tokens ≤ MaxWords
    *   - r_mean_word_len: mean token length in [2, 10]
    *   - r_alpha: ≥ 80% of tokens contain an alphabetic character
    *   - r_stopwords: ≥ 2 distinct stopwords present (gibberish gate)
    *   - r_dup_tokens: duplicate-token fraction ≤ 0.6 (repetition gate)
    *   - r_symbols: (# + ellipsis) to word ratio ≤ 0.1
    *
    * Every ratio rule is evaluated in EXACT INTEGER arithmetic
    * (cross-multiplied: chars ≥ 2·n instead of chars/n ≥ 2.0) — a
    * boundary document (duplicate fraction exactly 0.6 exists at
    * sf0.01) must gate identically on every engine and partitioning,
    * and float division would leave that to last-ulp luck.
    */
  def withRules(df: DataFrame, textCol: String): DataFrame = {
    val t = TextStats.tokens(col(textCol))
    val nTok = size(t).cast("long")
    val nChars = length(regexp_replace(col(textCol), " ", "")).cast("long")
    val nAlpha = size(filter(t, tk => tk.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(array_intersect(t, typedlit(TextStats.stopwords)))
    val nDistinct = size(array_distinct(t)).cast("long")
    val nSym =
      (regexp_count(col(textCol), lit("#")) + regexp_count(col(textCol), lit("\\.\\.\\.")))
        .cast("long")

    val rules: Seq[(String, Column)] = Seq(
      "r_word_count" -> (nTok >= MinWords && nTok <= MaxWords),
      // mean len in [2, 10]  ⇔  2n ≤ chars ∧ chars ≤ 10n
      "r_mean_word_len" -> (nChars >= lit(2L) * nTok && nChars <= lit(10L) * nTok),
      // alpha frac ≥ 0.8  ⇔  5·alpha ≥ 4·n
      "r_alpha" -> (lit(5L) * nAlpha >= lit(4L) * nTok),
      "r_stopwords" -> (nStop >= MinDistinctStopwords),
      // dup frac ≤ 0.6  ⇔  n − distinct ≤ 0.6n  ⇔  5·distinct ≥ 2·n
      "r_dup_tokens" -> (lit(5L) * nDistinct >= lit(2L) * nTok),
      // symbol ratio ≤ 0.1  ⇔  10·sym ≤ n
      "r_symbols" -> (lit(10L) * nSym <= nTok)
    )
    val withFlags = rules.foldLeft(df) { case (acc, (name, c)) => acc.withColumn(name, c) }
    withFlags.withColumn("keep", rules.map(_._2).reduce(_ && _))
  }
}
