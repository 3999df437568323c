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

  /** Cronbach's alpha — internal-consistency reliability of a k-item
    * battery: α = k/(k−1)·(1 − Σ var_item / var_total). Input is ONE
    * row per (unit, item) with a numeric value; only COMPLETE units
    * (all k items, k = the observed item universe) enter, and the
    * completeness filter is reported (`n_complete` vs `n_units`).
    * Variances are sample (n−1) across complete units. Two keyed
    * aggregates (unit-sized and item-sized frames) + one reduce;
    * integer-valued items replay exactly in DuckDB.
    */
  def cronbachAlpha(
      df: DataFrame,
      unitCol: String,
      itemCol: String,
      valueCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(
      col(unitCol).as("u"), col(itemCol).as("it"), col(valueCol).cast("double").as("v"))
    val kItems = base.agg(countDistinct(col("it")).as("k"))
    // complete units: exactly one row per item, all k items present
    val perUnit = base
      .groupBy("u")
      .agg(count(lit(1)).as("rows_u"), countDistinct(col("it")).as("items_u"),
        sum("v").as("tot"))
      .crossJoin(broadcast(kItems))
      .localCheckpoint(true)
    val complete = perUnit.where(col("items_u") === col("k") && col("rows_u") === col("k"))
    val totStats = complete.agg(
      count(lit(1)).as("nc"), sum("tot").as("st"), sum(col("tot") * col("tot")).as("stt"))
    val itemStats = base
      .join(complete.select(col("u")), Seq("u"), "left_semi")
      .groupBy("it")
      .agg(count(lit(1)).as("ni"), sum("v").as("si"), sum(col("v") * col("v")).as("sii"))
      .agg(sum(when(col("ni") > 1,
        (col("sii") - col("si") * col("si") / col("ni").cast("double")) /
          (col("ni") - lit(1)).cast("double"))).as("sum_var_items"))
    val nUnits = perUnit.agg(count(lit(1)).as("n_units"))

    totStats.crossJoin(broadcast(itemStats))
      .crossJoin(broadcast(kItems)).crossJoin(broadcast(nUnits))
      .select(
        col("k").cast("long").as("k_items"),
        col("n_units").cast("long").as("n_units"),
        col("nc").cast("long").as("n_complete"),
        q6(col("sum_var_items")).as("sum_var_items"),
        when(col("nc") > 1,
          q6((col("stt") - col("st") * col("st") / col("nc").cast("double")) /
            (col("nc") - lit(1)).cast("double"))).as("var_total"),
        when(col("k") > 1 && col("nc") > 1 &&
          col("stt") - col("st") * col("st") / col("nc").cast("double") > 0,
          q6((col("k").cast("double") / (col("k") - lit(1)).cast("double")) *
            (lit(1.0) - col("sum_var_items") /
              ((col("stt") - col("st") * col("st") / col("nc").cast("double")) /
                (col("nc") - lit(1)).cast("double"))))).as("alpha"))
  }

  /** Fleiss' kappa — chance-corrected agreement for n raters per item
    * over categorical labels. Input is one row per RATING (item,
    * category); only items with exactly `raters` ratings enter (the
    * fixed-n requirement of the statistic — the filter is the caller's
    * review signal via `n_items` vs items seen). P_i = (Σ_j n_ij² − n)
    * / (n(n−1)), κ = (P̄ − P_e)/(1 − P_e) with P_e = Σ p_j². Two keyed
    * count aggregates — (item × category)-sized, never rating-sized.
    */
  def fleissKappa(df: DataFrame, itemCol: String, catCol: String, raters: Int): DataFrame = {
    require(raters >= 2, "fleissKappa: need at least 2 raters per item")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(col(itemCol).as("i"), col(catCol).cast("string").as("c"))
    val eligible = base.groupBy("i").agg(count(lit(1)).as("nr"))
      .where(col("nr") === raters).select("i")
    val cells = base
      .join(eligible, Seq("i"), "left_semi")
      .groupBy("i", "c").agg(count(lit(1)).as("nij"))
      .localCheckpoint(true)
    val perItem = cells.groupBy("i")
      .agg(((sum(col("nij") * col("nij")) - lit(raters)).cast("double") /
        lit(raters.toDouble * (raters - 1))).as("pi"))
    val pBar = perItem.agg(count(lit(1)).as("n_items"), sum("pi").as("spi"))
    val pe = cells.groupBy("c").agg(sum("nij").as("nj"))
      .crossJoin(broadcast(pBar.select(col("n_items").as("ni2"))))
      .agg(sum(
        (col("nj").cast("double") / (col("ni2") * lit(raters)).cast("double")) *
          (col("nj").cast("double") / (col("ni2") * lit(raters)).cast("double")))
        .as("p_e"))
    pBar.crossJoin(broadcast(pe))
      .select(
        col("n_items").cast("long").as("n_items"),
        lit(raters.toLong).as("raters"),
        q6(col("spi") / col("n_items").cast("double")).as("p_bar"),
        q6(col("p_e")).as("p_e"),
        when(col("p_e") < 1.0,
          q6((col("spi") / col("n_items").cast("double") - col("p_e")) /
            (lit(1.0) - col("p_e")))).as("kappa"))
  }

  /** Bland–Altman method agreement — paired difference d = a − b:
    * mean bias, sample SD, limits of agreement at ±1.96·SD, and the
    * share of pairs OUTSIDE the limits (the honest "95%" check —
    * second pass against the broadcast one-row stats). All closed
    * forms over one moment aggregate + one recount.
    */
  def blandAltman(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val d = col(aCol).cast("double") - col(bCol).cast("double")
    val m = df.agg(
      count(lit(1)).as("n"), sum(d).as("sd1"), sum(d * d).as("sdd")).localCheckpoint(true)
    val mean = col("sd1") / col("n").cast("double")
    val varS = when(col("n") > 1,
      (col("sdd") - col("sd1") * col("sd1") / col("n").cast("double")) /
        (col("n") - lit(1)).cast("double"))
    val stats = m.select(
      col("n").cast("long").as("n"),
      mean.as("__mean"),
      when(varS >= 0, sqrt(varS)).as("__sd"))
    val outCount = df
      .crossJoin(broadcast(stats))
      .agg(sum(when(
        d < col("__mean") - lit(1.96) * col("__sd") ||
          d > col("__mean") + lit(1.96) * col("__sd"), 1).otherwise(0)).as("n_outside"))
    stats.crossJoin(broadcast(outCount))
      .select(
        col("n"),
        q6(col("__mean")).as("bias"),
        q6(col("__sd")).as("sd_diff"),
        q6(col("__mean") - lit(1.96) * col("__sd")).as("loa_lo"),
        q6(col("__mean") + lit(1.96) * col("__sd")).as("loa_hi"),
        col("n_outside").cast("long").as("n_outside"),
        when(col("n") > 0,
          q6(col("n_outside").cast("double") / col("n").cast("double")))
          .as("share_outside"))
  }

  /** ICC(1,1) — one-way random-effects intraclass correlation for
    * unbalanced groups: how much of the value's variance is BETWEEN
    * groups. SSB/SSW fold algebraically from (n, Σx, Σx²) per group
    * (SSW = Σx² − Σnᵢm̄ᵢ², SSB = Σnᵢm̄ᵢ² − Nm̄²), MSB = SSB/(g−1),
    * MSW = SSW/(N−g), n̄₀ = (N − Σnᵢ²/N)/(g−1) (the unbalanced-design
    * correction), ICC = (MSB − MSW)/(MSB + (n̄₀−1)·MSW). One group-
    * sized aggregate then closed forms.
    */
  def icc(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val per = df
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("ni"), sum(col(valueCol).cast("double")).as("si"),
        sum(col(valueCol).cast("double") * col(valueCol).cast("double")).as("sii"))
    val a = per.agg(
      count(lit(1)).as("g"), sum("ni").as("n"), sum("si").as("sx"), sum("sii").as("sxx"),
      sum(col("si") * col("si") / col("ni").cast("double")).as("snm2"),
      sum(col("ni") * col("ni")).as("sn2"))
    val msb = (col("snm2") - col("sx") * col("sx") / col("n").cast("double")) /
      (col("g") - lit(1)).cast("double")
    val msw = (col("sxx") - col("snm2")) / (col("n") - col("g")).cast("double")
    val n0 = (col("n").cast("double") - col("sn2").cast("double") / col("n").cast("double")) /
      (col("g") - lit(1)).cast("double")
    a.select(
      col("n").cast("long").as("n"),
      col("g").cast("long").as("groups"),
      when(col("g") > 1, q6(msb)).as("msb"),
      when(col("n") > col("g"), q6(msw)).as("msw"),
      when(col("g") > 1, q6(n0)).as("n0"),
      when(col("g") > 1 && col("n") > col("g") &&
        msb + (n0 - lit(1.0)) * msw > 0,
        q6((msb - msw) / (msb + (n0 - lit(1.0)) * msw))).as("icc"))
  }

  /** Krippendorff's alpha — THE general-purpose chance-corrected
    * agreement coefficient (Krippendorff 2004): any number of raters,
    * missing ratings allowed (units need ≥ 2), nominal or interval
    * distance. The standard annotation-QA readout for labeling /
    * preference / rubric-scoring pipelines, generalizing
    * [[cohenKappa]] (2 raters) and [[fleissKappa]] (fixed panel).
    *
    * α = 1 − D_o/D_e over the coincidence matrix — but BOTH
    * disagreements collapse to MOMENTS, so no pair join and no
    * category matrix ever materializes:
    *   nominal:  D_o = (1/n)·Σ_u Σ_c n_uc(m_u − n_uc)/(m_u−1),
    *             D_e = (n² − Σ_c n_c²)/(n(n−1));
    *   interval: D_o = (1/n)·Σ_u 2(m_u·S2_u − S1_u²)/(m_u−1),
    *             D_e = 2(n·S2 − S1²)/(n(n−1)),
    * with S1/S2 the value sums/squares. One unit-level aggregate
    * (+ one (unit, category) aggregate for nominal), one global
    * reduce — corpus-scale units stream through map-side combines.
    * Returns one row: (metric, n_units_used, n_ratings, alpha 6dp);
    * alpha null when D_e = 0 (no variation — agreement is undefined,
    * not perfect).
    */
  def krippendorffAlpha(
      df: DataFrame,
      unitCol: String,
      valueCol: String,
      metric: String = "nominal"): DataFrame = {
    require(metric == "nominal" || metric == "interval",
      s"krippendorffAlpha: metric must be nominal or interval, got $metric")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    if (metric == "interval") {
      val per = df
        .select(col(unitCol).as("u"), col(valueCol).cast("double").as("v"))
        .groupBy("u")
        .agg(count(lit(1)).as("m"), sum(col("v")).as("s1"), sum(col("v") * col("v")).as("s2"))
        .where(col("m") >= 2)
      val a = per.agg(
        count(lit(1)).as("units"),
        sum(col("m")).as("n"),
        sum(col("s1")).as("gs1"),
        sum(col("s2")).as("gs2"),
        sum(lit(2.0) * (col("m").cast("double") * col("s2") - col("s1") * col("s1")) /
          (col("m") - 1).cast("double")).as("do_sum"))
      val n = col("n").cast("double")
      val dObs = col("do_sum") / n
      val dExp = lit(2.0) * (n * col("gs2") - col("gs1") * col("gs1")) /
        (n * (n - lit(1.0)))
      a.select(
        lit("interval").as("metric"),
        col("units").cast("long").as("n_units_used"),
        col("n").cast("long").as("n_ratings"),
        when(dExp > 0, q6(lit(1.0) - dObs / dExp)).as("alpha"))
    } else {
      val base = df.select(col(unitCol).as("u"), col(valueCol).cast("string").as("c"))
      val perUC = base.groupBy("u", "c").agg(count(lit(1)).as("nuc"))
      val perU = perUC.groupBy("u").agg(sum(col("nuc")).as("m"))
        .where(col("m") >= 2)
      val uStats = perUC
        .join(perU, Seq("u"))
        .groupBy("u")
        .agg(
          first(col("m")).as("m"),
          sum(col("nuc").cast("double") * (col("m") - col("nuc")).cast("double") /
            (col("m") - 1).cast("double")).as("dou"))
      val cTot = perUC.join(perU.select("u"), Seq("u"))
        .groupBy("c").agg(sum(col("nuc")).as("nc"))
        .agg(sum(col("nc")).as("n"), sum(col("nc") * col("nc")).as("snc2"))
      val uAgg = uStats.agg(
        count(lit(1)).as("units"), sum(col("dou")).as("do_sum"))
      val j = uAgg.crossJoin(cTot)
      val n = col("n").cast("double")
      val dObs = col("do_sum") / n
      val dExp = (n * n - col("snc2").cast("double")) / (n * (n - lit(1.0)))
      j.select(
        lit("nominal").as("metric"),
        col("units").cast("long").as("n_units_used"),
        col("n").cast("long").as("n_ratings"),
        when(dExp > 0, q6(lit(1.0) - dObs / dExp)).as("alpha"))
    }
  }
}
