package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classic readability indices — Flesch Reading Ease, Flesch–Kincaid
  * grade, Coleman–Liau, ARI (Flesch 1948; Kincaid et al. 1975; Coleman &
  * Liau 1975; Smith & Senter 1967) — the staple feature block of a text
  * quality model beside [[TextStats.quality]]: cheap fluency/complexity
  * proxies that separate prose from tables, logs, and keyword stuffing.
  *
  * Entirely row-local column algebra in the portable Java∩RE2 regex
  * subset (codegen'd, SQL-replayable; the [[Extract]] convention):
  * syllables are the standard vowel-group heuristic — runs of
  * `[aeiouy]+` per lowercased word, minus one for a silent final 'e'
  * (ends in 'e', not 'le', ≥ 2 vowel groups), floored at one — summed
  * per document with one HOF `aggregate`, no explode, no shuffle.
  * Counts are exact integers; the four scores are fixed-literal
  * arithmetic over small-integer ratios, floor-quantized 6dp.
  */
object Readability {

  /** Per-word syllable estimate (column over a single word). */
  private def syllables(w: Column): Column = {
    val lw = lower(w)
    val runs = regexp_count(lw, lit("[aeiouy]+"))
    val silentE = lw.rlike("[a-z]e$") && !lw.rlike("le$")
    greatest(lit(1), runs - when(silentE && runs >= 2, 1).otherwise(0))
  }

  /** Adds n_words, n_sentences, n_syllables, n_letters (exact longs)
    * and flesch_ease, fk_grade, coleman_liau, ari (6dp). Sentences are
    * `[.!?]+` runs floored at one; words are whitespace tokens (the
    * corpus convention); letters are `[A-Za-z0-9]`.
    */
  def scores(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = split(col(textCol), " ")
    val words = size(t).cast("long")
    val sentences = greatest(lit(1L), regexp_count(col(textCol), lit("[.!?]+")).cast("long"))
    val syls = aggregate(t, lit(0L), (acc, w) => acc + syllables(w).cast("long"))
    val letters = length(regexp_replace(col(textCol), "[^A-Za-z0-9]", "")).cast("long")

    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val wps = col("n_words").cast("double") / col("n_sentences").cast("double")
    val spw = col("n_syllables").cast("double") / col("n_words").cast("double")
    val lpw = col("n_letters").cast("double") / col("n_words").cast("double")

    df.select(
      col(idCol),
      words.as("n_words"),
      sentences.as("n_sentences"),
      syls.as("n_syllables"),
      letters.as("n_letters"))
      .where(col("n_words") > 0)
      .withColumn("flesch_ease",
        q6(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw))
      .withColumn("fk_grade",
        q6(lit(0.39) * wps + lit(11.8) * spw - lit(15.59)))
      .withColumn("coleman_liau",
        q6(lit(0.0588) * (lpw * lit(100.0)) -
          lit(0.296) * (col("n_sentences").cast("double") / col("n_words").cast("double") *
            lit(100.0)) - lit(15.8)))
      .withColumn("ari",
        q6(lit(4.71) * lpw + lit(0.5) * wps - lit(21.43)))
  }
}
