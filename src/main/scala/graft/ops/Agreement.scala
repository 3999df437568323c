package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — Cohen's kappa (Cohen 1960): chance-
  * corrected agreement between two labelers over the same items, the
  * standard QA gate for preference/label data BEFORE it trains anything
  * (beside [[graft.ml.BradleyTerry]], which consumes the pairs such
  * labelers produce). κ = (p_o − p_e)/(1 − p_e), p_e from the label
  * marginals. One (a, b) count aggregate — label-space-sized, never
  * item-scaled — then margin frames joined per LABEL (a diagonal-cell
  * shortcut would silently drop labels the raters never agree on,
  * which still carry chance mass).
  */
object Agreement {

  /** One row: n, p_o, p_e, kappa (floor-quantized 6dp). Works for any
    * label cardinality (multi-category kappa).
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .groupBy(col(aCol).cast("string").as("a"), col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val ma = cells.groupBy(col("a").as("lbl")).agg(sum("c").cast("double").as("na"))
    val mb = cells.groupBy(col("b").as("lbl")).agg(sum("c").cast("double").as("nb"))
    val pe = ma.join(mb, Seq("lbl"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0.0)).as("pesum"))
    val agg = cells.agg(
      sum(col("c")).cast("double").as("nn"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L)).cast("double").as("agree"))
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    agg.crossJoin(pe)
      .select(
        col("nn").cast("long").as("n"),
        q6(col("agree") / col("nn")).as("p_o"),
        q6(col("pesum") / (col("nn") * col("nn"))).as("p_e"),
        q6((col("agree") / col("nn") - col("pesum") / (col("nn") * col("nn"))) /
          (lit(1.0) - col("pesum") / (col("nn") * col("nn")))).as("kappa"))
  }

  /** Partial correlation r_xy·z — the association between x and y with
    * z held fixed (Yule 1907): r_xy·z = (r_xy − r_xz·r_yz) /
    * √((1−r_xz²)(1−r_yz²)). One nine-moment aggregate pass; the three
    * pairwise Pearson correlations and the combination are driver-free
    * closed forms a replaying engine computes in the same IEEE order.
    */
  def partialCorr(df: DataFrame, xCol: String, yCol: String, zCol: String): DataFrame = {
    val x = col(xCol).cast("double"); val y = col(yCol).cast("double")
    val z = col(zCol).cast("double")
    val m = df.agg(
      count(lit(1)).cast("double").as("n"),
      sum(x).as("sx"), sum(y).as("sy"), sum(z).as("sz"),
      sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(z * z).as("szz"),
      sum(x * y).as("sxy"), sum(x * z).as("sxz"), sum(y * z).as("syz"))
    def corr(sab: Column, sa: Column, sb: Column, saa: Column, sbb: Column) =
      (col("n") * sab - sa * sb) /
        sqrt((col("n") * saa - sa * sa) * (col("n") * sbb - sb * sb))
    val rxy = corr(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
    val rxz = corr(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
    val ryz = corr(col("syz"), col("sy"), col("sz"), col("syy"), col("szz"))
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    m.select(
      col("n").cast("long").as("n"),
      q6(rxy).as("r_xy"),
      q6(rxz).as("r_xz"),
      q6(ryz).as("r_yz"),
      q6((rxy - rxz * ryz) /
        sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))).as("r_xy_given_z"))
  }
}
