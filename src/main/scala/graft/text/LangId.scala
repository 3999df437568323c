package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Language identification by stopword-profile voting (SURVEY.md §2 T3).
  * A deterministic n-gram/stopword heuristic: count marker-word hits per
  * language, predict the argmax (ties break in fixed language order,
  * zero hits → "und"). Column-only algebra, codegen-friendly, trivially
  * data-parallel — no shuffle at all.
  */
object LangId {

  /** Marker stopwords per language, in tie-break priority order. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "une", "et", "est"),
    "zh" -> Seq("的", "是", "在", "了", "我")
  )

  def hits(text: Column, words: Seq[String]): Column =
    size(filter(TextStats.tokens(text), t => t.isin(words: _*)))

  /** Adds `pred_lang` (and per-language `hits_<lang>` diagnostic cols). */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val withHits = markers.foldLeft(df) { case (acc, (lang, words)) =>
      acc.withColumn(s"hits_$lang", hits(col(textCol), words))
    }
    // argmax with fixed priority order: first language whose hits equal
    // the row max and are > 0
    val maxHits = greatest(markers.map { case (l, _) => col(s"hits_$l") }: _*)
    val pred = markers.foldRight(lit("und"): Column) { case ((lang, _), els) =>
      when(col(s"hits_$lang") === maxHits && maxHits > 0, lit(lang)).otherwise(els)
    }
    // foldRight gives priority to the FIRST language in `markers`
    withHits.withColumn("pred_lang", pred)
  }

  /** Confusion matrix of declared label vs predicted language:
    * (label, pred_lang, n, label_total, share) — share of the label
    * routed to that prediction (the diagonal share IS per-label recall)
    * — the calibration check a pipeline runs before trusting either the classifier OR
    * the upstream metadata (the two disagree on exactly the documents
    * worth auditing). One classify pass + a cells×labels aggregate.
    */
  def confusion(df: DataFrame, textCol: String, labelCol: String): DataFrame = {
    val pred = withLangId(df, textCol)
    val cells = pred
      .groupBy(col(labelCol).as("label"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy("label").agg(sum("n").as("label_total"))
    cells
      .join(broadcast(totals), Seq("label"))
      .withColumn(
        "share",
        round(col("n").cast("double") / col("label_total").cast("double"), 4))
  }
}
