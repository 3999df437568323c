package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial naive Bayes over tokens — the classic TRAINED text
  * classifier (labels from any column: language, source, quality
  * tier), complementing [[LangId]]'s fixed marker heuristic and
  * [[QualityModel]]'s logistic gate. Laplace-smoothed (α = 1):
  * score(d, l) = ln P(l) + Σ_tok ln((c_{l,tok} + 1)/(n_l + V)),
  * prediction = argmax, ties to the lexicographically first label.
  *
  * Scale shape: training is ONE (label, token) count aggregate — the
  * model STAYS a DataFrame (vocab × labels rows), never collected, so
  * a million-type vocabulary trains and serves without driver state.
  * Scoring explodes each doc's tokens against the broadcast label
  * list, left-joins the likelihood table on (token, label) — unseen
  * tokens fall back to the per-label smoothing floor — and reduces
  * with one (doc, label) sum + one max_by argmax.
  *
  * Every training count is an integer and every score a closed-form
  * double over them, so train AND predict replay exactly in SQL.
  */
object NaiveBayes {

  /** Model frames: `lik` (label, token, ll), `labelStats` (label,
    * log_prior, unseen_ll). Pure data — persist/serve like any table.
    */
  final case class Model(lik: DataFrame, labelStats: DataFrame)

  def train(df: DataFrame, textCol: String, labelCol: String): Model = {
    val toks = df.select(
      col(labelCol).as("label"),
      explode(split(col(textCol), " ")).as("token"))
    val counts = toks.groupBy("label", "token").agg(count(lit(1)).as("c"))
    val labelTotals = counts.groupBy("label").agg(sum("c").as("n_l"))
    val vocab = counts.select("token").distinct().count().toDouble
    val docs = df.groupBy(col(labelCol).as("label")).agg(count(lit(1)).as("d_l"))
    val nDocs = df.count().toDouble
    val lik = counts
      .join(labelTotals, Seq("label"))
      .withColumn(
        "ll",
        log((col("c").cast("double") + lit(1.0)) / (col("n_l").cast("double") + lit(vocab))))
      .select("label", "token", "ll")
    val stats = docs
      .join(labelTotals, Seq("label"))
      .withColumn("log_prior", log(col("d_l").cast("double") / lit(nDocs)))
      .withColumn(
        "unseen_ll",
        log(lit(1.0) / (col("n_l").cast("double") + lit(vocab))))
      .select("label", "log_prior", "unseen_ll")
    Model(lik, stats)
  }

  /** (idCol, nb_label, margin): argmax label and the 4dp gap to the
    * runner-up (a confidence proxy; the replayable part of one).
    */
  def predict(df: DataFrame, textCol: String, idCol: String, model: Model): DataFrame = {
    val toks = df.select(
      col(idCol),
      explode(split(col(textCol), " ")).as("token"))
    val scored = toks
      .crossJoin(broadcast(model.labelStats.select("label", "unseen_ll")))
      .join(model.lik, Seq("label", "token"), "left")
      .withColumn("t_ll", coalesce(col("ll"), col("unseen_ll")))
      .groupBy(col(idCol), col("label"))
      .agg(sum("t_ll").as("sum_ll"))
      .join(broadcast(model.labelStats.select("label", "log_prior")), Seq("label"))
      .withColumn("score", col("log_prior") + col("sum_ll"))
    // deterministic argmax: sort label scores by (−score, label) so the
    // head is the best score with ties going to the FIRST label — the
    // comparator the oracle's row_number(ORDER BY score DESC, label)
    // replays exactly
    scored
      .groupBy(col(idCol))
      .agg(sort_array(
        collect_list(struct((-col("score")).as("ns"), col("label"), col("score")))).as("__all"))
      .select(
        col(idCol),
        element_at(col("__all"), 1).getField("label").as("nb_label"),
        round(
          element_at(col("__all"), 1).getField("score") -
            element_at(col("__all"), 2).getField("score"),
          4).as("margin"))
  }
}
