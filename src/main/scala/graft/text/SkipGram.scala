package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SharedHash

/** Skip-gram training-pair generation (word2vec, Mikolov et al. 2013)
  * — the (center, context) co-occurrence stream embedding trainers
  * consume, with the original frequency subsampling: token occurrence
  * kept with p = (√(f/t) + 1)·t/f (f = corpus frequency, t the
  * subsample threshold), which discards most instances of very common
  * tokens BEFORE pairing so surviving neighbors move closer — the
  * detail naive "window over raw positions" implementations miss.
  * Deterministic: the keep draw is the salted-hash uniform of
  * (doc, position), so the pair stream is reproducible across runs,
  * cluster sizes and engines.
  *
  * Scale shape: one token-stream pass; the frequency table is a
  * vocab-sized broadcast; re-positioning after subsampling is a
  * per-doc window (keyed shuffle on doc); pairing is offsets exploded
  * (≤ 2·window per kept token) equi-joined back on (doc, position) —
  * never a positional range join, never all-pairs.
  */
object SkipGram {

  /** Kept token stream with post-subsample positions:
    * (idCol, __np, token).
    */
  def keptStream(
      df: DataFrame,
      textCol: String,
      idCol: String,
      t: Double,
      salt: String): DataFrame = {
    val toks = df.select(
      col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("__pos", "token")))
    val freq = toks.groupBy("token").agg(count(lit(1)).as("__c"))
    val total = toks.agg(count(lit(1)).as("__n"))
    val withP = toks
      .join(broadcast(freq), Seq("token"))
      .crossJoin(broadcast(total))
      .withColumn("__f", col("__c").cast("double") / col("__n").cast("double"))
      .withColumn(
        "__p",
        least(lit(1.0), (sqrt(col("__f") / t) + lit(1.0)) * lit(t) / col("__f")))
    val u = SharedHash
      .md5Long60(concat(lit(salt), lit(":"), col(idCol).cast("string"),
        lit(":"), col("__pos").cast("string")))
      .cast("double") / lit(1152921504606846976.0)
    withP
      .where(u < col("__p"))
      .withColumn(
        "__np",
        row_number().over(Window.partitionBy(col(idCol)).orderBy(col("__pos"))))
      .select(col(idCol), col("__np"), col("token"))
  }

  /** (center, context, cnt): aggregated skip-gram pairs within
    * `window` post-subsample positions, both directions, center ≠
    * position only (same token type CAN pair with itself at different
    * positions — that is real co-occurrence).
    */
  def pairCounts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 2,
      t: Double = 1e-3,
      salt: String = "sg"): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val kept = keptStream(df, textCol, idCol, t, salt)
    val offsets = (-window to window).filter(_ != 0)
    val centers = kept
      .select(col(idCol), col("__np"), col("token").as("center"))
      .withColumn("__off", explode(typedLit(offsets)))
      .withColumn("__tp", col("__np") + col("__off"))
    centers
      .join(
        kept.select(col(idCol), col("__np").as("__tp"), col("token").as("context")),
        Seq(idCol, "__tp"))
      .groupBy("center", "context")
      .agg(count(lit(1)).as("cnt"))
  }
}
