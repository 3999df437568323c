package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.{Glm, GlmModel}

/** MODEL-BASED quality filtering — the classifier analogue of the
  * heuristic [[TextStats.quality]] gate: train a logistic regression on
  * cheap row-local text features against a supervision signal (curated
  * positives vs crawl negatives — the fastText/wiki-ref recipe used for
  * GPT-3/LLaMA-style corpus filtering, re-expressed on the engine's own
  * pieces), then score and gate the corpus with the fitted model.
  *
  * Composition, not new machinery: features are [[TextStats]]' codegen'd
  * ratio columns (no UDF, no shuffle), the fit is [[Glm.logistic]] (one
  * aggregate pass per IRLS step over the persisted feature projection),
  * scoring is the model's closed-form η as a row expression. At 100 TB
  * the labeled training frame is tiny (curated positives are by
  * definition scarce) while scoring is a pure map — exactly the right
  * split. Inference SEs, robust variants, everything [[Glm]] exposes
  * applies to the quality model too.
  */
object QualityModel {

  val featureCols: Seq[String] =
    Seq("stop_frac", "uniq_frac", "punct_frac", "len_score")

  /** Row-local feature columns (a [[TextStats.withQuality]] superset
    * shape: same ratios, plus the saturating length score as its own
    * column).
    */
  def withFeatures(df: DataFrame, textCol: String): DataFrame =
    TextStats.withQuality(df, textCol)
      .withColumn(
        "len_score",
        least(size(split(col(textCol), " ")).cast("double") / 100.0, lit(1.0)))

  /** Fit the logistic quality model on a LABELED frame (`labelCol` ∈
    * {0, 1}; 1 = curated/positive). Zero-variance features (a corpus
    * with no punctuation makes punct_frac ≡ 0, which would make the
    * normal equations singular) are dropped before the fit — the model
    * records its surviving features in `xNames`, so [[score]] adapts
    * automatically.
    */
  def train(labeled: DataFrame, textCol: String, labelCol: String): GlmModel = {
    val feats = withFeatures(labeled, textCol)
    val sds = feats
      .agg(stddev_samp(col(featureCols.head)),
        featureCols.tail.map(c => stddev_samp(col(c))): _*)
      .head()
    val kept = featureCols.zipWithIndex
      .filter { case (_, i) => !sds.isNullAt(i) && sds.getDouble(i) > 1e-12 }
      .map(_._1)
    require(kept.nonEmpty, "every quality feature is constant on this corpus")
    Glm.logistic(feats, labelCol, kept)
  }

  /** Score a corpus: adds the feature columns and `q_score` = P(label=1 |
    * features) under the fitted model — a pure row-local expression.
    */
  def score(df: DataFrame, textCol: String, model: GlmModel): DataFrame =
    withFeatures(df, textCol)
      .withColumn("q_score", Glm.Binomial.mu(model.etaCol))

  /** The gate: rows scoring ≥ threshold. */
  def filter(df: DataFrame, textCol: String, model: GlmModel, threshold: Double): DataFrame =
    score(df, textCol, model).where(col("q_score") >= threshold)
}
