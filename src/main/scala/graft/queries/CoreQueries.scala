package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{Collinearity, FixedEffects, GroupedOls, Ols}
import graft.ops.{Dummies, Grouped, Lags}
import graft.util.Tables

/** Core operator coverage (SURVEY.md §2 C1–C17): each query exercises a
  * reference capability through the graft operator and is checked against
  * a DuckDB oracle where SQL can express it.
  */
object CoreQueries {

  /** Single-row DataFrame from named doubles/longs (for scalar results
    * like coefficients — keeps the driver's parquet/oracle compare shape).
    */
  private def scalarRow(s: SparkSession, doubles: Seq[(String, Double)], longs: Seq[(String, Long)] = Nil): DataFrame = {
    val base = s.range(1)
    val withD = doubles.foldLeft(base.toDF()) { case (d, (n, v)) => d.withColumn(n, lit(v)) }
    val withL = longs.foldLeft(withD) { case (d, (n, v)) => d.withColumn(n, lit(v)) }
    withL.drop("id")
  }

  /** Several queries exercise different outputs of the SAME fitted model
    * (coefficients / effects / residuals / variances). Memoize fits per
    * sf directory so Verify/Bench don't redo identical distributed
    * passes query after query.
    *
    * Each entry also records the persistent-RDD ids its fit created
    * (cached cell frames, localCheckpoint'ed effect/residual frames in
    * the distributed regime) so harness-level cache hygiene (Bench /
    * Verify unpersisting a query's dead blocks after its action) can
    * EXCLUDE blocks a memoized model still references — the blanket
    * unpersist was only safe while reused models stayed driver-local.
    */
  private val memo = new scala.collection.concurrent.TrieMap[String, Any]
  private val memoRdds = new scala.collection.concurrent.TrieMap[String, Set[Int]]
  private def cached[T](key: String)(f: => T): T =
    memo.get(key) match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        val sc = org.apache.spark.sql.SparkSession.active.sparkContext
        val before = sc.getPersistentRDDs.keySet
        val v = memo.getOrElseUpdate(key, f)
        memoRdds.putIfAbsent(key, (sc.getPersistentRDDs.keySet -- before).toSet)
        v.asInstanceOf[T]
    }

  /** RDD ids still referenced by memoized models — must survive
    * harness-level unpersist sweeps.
    */
  def protectedRddIds: Set[Int] = memoRdds.values.flatten.toSet

  /** Memo keys present right now (Bench uses before/after snapshots to
    * find the entries a query created).
    */
  def memoKeys: Set[String] = memo.keySet.toSet

  /** Drop memo entries and release their persisted RDDs — Bench evicts a
    * query's fresh fits before a retry so the second sample re-runs the
    * real distributed work instead of returning the memoized model in ~0s.
    */
  def evictMemo(keys: Set[String]): Unit = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    keys.foreach { k =>
      memo.remove(k)
      memoRdds.remove(k).foreach { ids =>
        val live = sc.getPersistentRDDs
        ids.foreach(id => live.get(id).foreach(_.unpersist(false)))
      }
    }
  }

  private def olsSimple(s: SparkSession, dir: String): graft.ml.OlsModel =
    cached(s"ols_simple:$dir")(Ols.fit(Tables.lineitem(s, dir), "l_extendedprice", Seq("l_quantity")))

  private def feSupp(s: SparkSession, dir: String): graft.ml.FeModel =
    cached(s"fe_supp:$dir")(
      FixedEffects.fit(
        Tables.lineitem(s, dir), "l_extendedprice", Seq("l_quantity"), Seq("l_suppkey"),
        keep = Seq("l_orderkey", "l_linenumber"))
    )

  // ---- C1/C3: groupby-apply (broadcast=False) --------------------------

  val q01 = Q(
    "q01_groupby_agg",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      Grouped.aggregate(
        li,
        Seq("l_returnflag", "l_linestatus"),
        Seq(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          count(lit(1)).as("n")
        )
      )
    },
    Some(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
    )
  )

  val q03 = Q(
    "q03_groupby_stats",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      Grouped.aggregate(
        o,
        Seq("o_orderpriority"),
        Seq(
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 4).as("sum_price"),
          round(avg(col("o_totalprice")), 6).as("avg_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          round(stddev_samp(col("o_totalprice")), 6).as("sd_price")
        )
      )
    },
    Some(
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 4) AS sum_price,
        |  round(avg(o_totalprice), 6) AS avg_price,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  round(stddev_samp(o_totalprice), 6) AS sd_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin
    )
  )

  // ---- C2: groupby-transform (broadcast=True) --------------------------

  val q02 = Q(
    "q02_groupby_transform",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      Grouped
        .transform(
          li,
          Seq("l_returnflag", "l_linestatus"),
          Seq(avg(col("l_quantity")).as("__grp_avg"))
        )
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(col("l_quantity") - col("__grp_avg"), 6).as("centered")
        )
    },
    Some(
      """SELECT l_orderkey, l_linenumber,
        |  round(l_quantity - avg(l_quantity) OVER (PARTITION BY l_returnflag, l_linestatus), 6) AS centered
        |FROM lineitem""".stripMargin
    )
  )

  // ---- C4: plain OLS ---------------------------------------------------

  val q04 = Q(
    "q04_ols_simple",
    (s, dir) => {
      val m = olsSimple(s, dir)
      scalarRow(
        s,
        Seq(
          "slope" -> rnd(m.coef(1), 6),
          "intercept" -> rnd(m.coef(0), 6)
        ),
        Seq("n" -> m.n)
      )
    },
    Some(
      """SELECT round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
        |  count(*) AS n
        |FROM lineitem""".stripMargin
    )
  )

  // ---- C5: multi-regressor OLS (oracle via Cramer's rule) --------------

  val q05 = Q(
    "q05_ols_multi",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = Ols.fit(li, "l_extendedprice", Seq("l_quantity", "l_discount"))
      scalarRow(
        s,
        Seq(
          "b_intercept" -> rnd(m.coef(0), 4),
          "b_quantity" -> rnd(m.coef(1), 4),
          "b_discount" -> rnd(m.coef(2), 4)
        )
      )
    },
    Some(
      """WITH s AS (
        |  SELECT count(*)::DOUBLE AS n, sum(l_quantity) AS sx, sum(l_discount) AS sz,
        |    sum(l_extendedprice) AS sy, sum(l_quantity*l_quantity) AS sxx,
        |    sum(l_quantity*l_discount) AS sxz, sum(l_discount*l_discount) AS szz,
        |    sum(l_quantity*l_extendedprice) AS sxy, sum(l_discount*l_extendedprice) AS szy
        |  FROM lineitem)
        |SELECT
        |  round((sy*(sxx*szz-sxz*sxz) - sx*(sxy*szz-sxz*szy) + sz*(sxy*sxz-sxx*szy))
        |    / (n*(sxx*szz-sxz*sxz) - sx*(sx*szz-sxz*sz) + sz*(sx*sxz-sxx*sz)), 4) AS b_intercept,
        |  round((n*(sxy*szz-sxz*szy) - sy*(sx*szz-sxz*sz) + sz*(sx*szy-sxy*sz))
        |    / (n*(sxx*szz-sxz*sxz) - sx*(sx*szz-sxz*sz) + sz*(sx*sxz-sxx*sz)), 4) AS b_quantity,
        |  round((n*(sxx*szy-sxy*sxz) - sx*(sx*szy-sxy*sz) + sy*(sx*sxz-sxx*sz))
        |    / (n*(sxx*szz-sxz*sxz) - sx*(sx*szz-sxz*sz) + sz*(sx*sxz-sxx*sz)), 4) AS b_discount
        |FROM s""".stripMargin
    )
  )

  // ---- C6: within estimator (1 FE) -------------------------------------

  val q06 = Q(
    "q06_fe_within",
    (s, dir) => {
      val m = feSupp(s, dir)
      scalarRow(s, Seq("slope" -> rnd(m.coef(0), 6)), Seq("n" -> m.n))
    },
    Some(
      """WITH d AS (
        |  SELECT l_extendedprice - avg(l_extendedprice) OVER (PARTITION BY l_suppkey) AS yd,
        |         l_quantity - avg(l_quantity) OVER (PARTITION BY l_suppkey) AS xd
        |  FROM lineitem)
        |SELECT round(sum(xd*yd)/sum(xd*xd), 6) AS slope, count(*) AS n FROM d""".stripMargin
    )
  )

  // ---- C7: fixed-effect recovery ---------------------------------------

  val q07 = Q(
    "q07_fixed_effects",
    (s, dir) => {
      val m = feSupp(s, dir)
      m.effects.select(col("l_suppkey"), round(col("effect"), 4).as("effect"))
    },
    Some(
      """WITH d AS (
        |  SELECT l_suppkey, l_quantity, l_extendedprice,
        |    l_extendedprice - avg(l_extendedprice) OVER (PARTITION BY l_suppkey) AS yd,
        |    l_quantity - avg(l_quantity) OVER (PARTITION BY l_suppkey) AS xd
        |  FROM lineitem),
        |b AS (SELECT sum(xd*yd)/sum(xd*xd) AS slope FROM d)
        |SELECT l_suppkey, round(avg(l_extendedprice - slope*l_quantity), 4) AS effect
        |FROM d, b GROUP BY l_suppkey""".stripMargin
    )
  )

  // ---- C8: two-way FE via alternating projections (rows+spec) ----------

  val q08 = Q(
    "q08_fe_two_way",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = cached(s"fe_two_way:$dir")(
        FixedEffects.fit(li, "l_extendedprice", Seq("l_quantity"), Seq("l_suppkey", "l_partkey")))
      scalarRow(s, Seq("slope" -> rnd(m.coef(0), 6)), Seq("n" -> m.n, "sweeps" -> m.sweeps.toLong))
    },
    None
  )

  // ---- C8b: two-way FE, DISTRIBUTED cell regime (rows+spec) --------------
  // Same estimate as q08, but collectCellLimit = 0 forces the sweeps to
  // run over the persisted distributed cell frame — the regime a 100 TB
  // panel (cells ≫ driver memory) uses. Regime parity is pinned by
  // RegressionSpec; this row makes the scale path's wall-time visible
  // in every bench round.
  val q59 = Q(
    "q59_fe_two_way_distributed",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = cached(s"fe_two_way_dist:$dir")(
        FixedEffects.fit(
          li,
          "l_extendedprice",
          Seq("l_quantity"),
          Seq("l_suppkey", "l_partkey"),
          collectCellLimit = 0L))
      scalarRow(s, Seq("slope" -> rnd(m.coef(0), 6)), Seq("n" -> m.n, "sweeps" -> m.sweeps.toLong))
    },
    None
  )

  // ---- C9: residuals ----------------------------------------------------

  val q09 = Q(
    "q09_fe_residuals",
    (s, dir) => {
      val m = feSupp(s, dir)
      m.withResiduals("resid")
        .select(col("l_orderkey"), col("l_linenumber"), round(col("resid"), 4).as("resid"))
    },
    Some(
      """WITH d AS (
        |  SELECT l_orderkey, l_linenumber,
        |    l_extendedprice - avg(l_extendedprice) OVER (PARTITION BY l_suppkey) AS yd,
        |    l_quantity - avg(l_quantity) OVER (PARTITION BY l_suppkey) AS xd
        |  FROM lineitem),
        |b AS (SELECT sum(xd*yd)/sum(xd*xd) AS slope FROM d)
        |SELECT l_orderkey, l_linenumber, round(yd - slope*xd, 4) AS resid FROM d, b""".stripMargin
    )
  )

  // ---- C10: homoskedastic variance --------------------------------------

  val q10 = Q(
    "q10_ols_se",
    (s, dir) => {
      val se = olsSimple(s, dir).seHomoskedastic
      scalarRow(s, Seq("se_intercept" -> rnd(se(0), 6), "se_slope" -> rnd(se(1), 6)))
    },
    Some(
      """WITH s AS (
        |  SELECT count(*)::DOUBLE AS n, sum(l_quantity) AS sx, sum(l_quantity*l_quantity) AS sxx,
        |    regr_slope(l_extendedprice, l_quantity) AS b,
        |    regr_intercept(l_extendedprice, l_quantity) AS a
        |  FROM lineitem),
        |r AS (
        |  SELECT sum((l_extendedprice - s.a - s.b*l_quantity)*(l_extendedprice - s.a - s.b*l_quantity)) AS ssr
        |  FROM lineitem, s)
        |SELECT
        |  round(sqrt(ssr/(n-2) * (1.0/n + (sx/n)*(sx/n)/(sxx - sx*sx/n))), 6) AS se_intercept,
        |  round(sqrt(ssr/(n-2) / (sxx - sx*sx/n)), 6) AS se_slope
        |FROM r, s""".stripMargin
    )
  )

  // ---- C11: cluster-robust variance -------------------------------------

  val q11 = Q(
    "q11_cluster_se",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val se = Ols.seClustered(li, olsSimple(s, dir), "l_extendedprice", "l_suppkey")
      scalarRow(s, Seq("se_intercept" -> rnd(se(0), 6), "se_slope" -> rnd(se(1), 6)))
    },
    Some(
      """WITH s AS (
        |  SELECT count(*)::DOUBLE AS n, sum(l_quantity) AS sx, sum(l_quantity*l_quantity) AS sxx,
        |    regr_slope(l_extendedprice, l_quantity) AS b,
        |    regr_intercept(l_extendedprice, l_quantity) AS a
        |  FROM lineitem),
        |u AS (
        |  SELECT l_suppkey,
        |    sum(l_extendedprice - s.a - s.b*l_quantity) AS su,
        |    sum((l_extendedprice - s.a - s.b*l_quantity)*l_quantity) AS sux
        |  FROM lineitem, s GROUP BY l_suppkey),
        |m AS (SELECT sum(su*su) AS m11, sum(su*sux) AS m12, sum(sux*sux) AS m22 FROM u)
        |SELECT
        |  round(sqrt(sxx*sxx*m11 - 2*sxx*sx*m12 + sx*sx*m22)/(n*sxx - sx*sx), 6) AS se_intercept,
        |  round(sqrt(sx*sx*m11 - 2*n*sx*m12 + n*n*m22)/(n*sxx - sx*sx), 6) AS se_slope
        |FROM m, s""".stripMargin
    )
  )

  // ---- C12: collinearity detection (rows+spec) ---------------------------

  val q12 = Q(
    "q12_collinear",
    (s, dir) => {
      import s.implicits._
      val li = Tables.lineitem(s, dir)
        .withColumn("x1", col("l_quantity"))
        .withColumn("x2", col("l_discount"))
        .withColumn("x3", col("l_quantity") + lit(2.0) * col("l_discount"))
        .withColumn("x4", col("l_tax"))
      val (dropped, kept) = Collinearity.findCollinear(li, Seq("x1", "x2", "x3", "x4"))
      (dropped.map(n => (n, "collinear")) ++ kept.map(n => (n, "kept")))
        .toDF("col_name", "status")
    },
    // FULL oracle (r12): the sequential Gram-only QR (collinearFromGram)
    // unrolled for k = 4 — normalized Gram entries gn_ij, the SAME
    // forward-substitution chain (z, R columns, resid² = 1 − Σz²) in
    // the same IEEE order, drop when resid² < tol² = 1e-14. Branching
    // on earlier statuses is encoded where a TPC-H column could
    // plausibly flip (x3's drop changes x4's basis); the exotic paths
    // (zero-variance x1/x2, x2 collinear with x1) intentionally yield
    // NULL so a regime change mismatches LOUDLY instead of replaying
    // the wrong basis.
    Some(
      """WITH d AS (SELECT l_quantity::DOUBLE AS x1, l_discount::DOUBLE AS x2,
        |    l_quantity + 2.0*l_discount AS x3, l_tax::DOUBLE AS x4
        |  FROM lineitem),
        |g AS (SELECT sum(x1*x1) AS g11, sum(x1*x2) AS g12, sum(x1*x3) AS g13,
        |    sum(x1*x4) AS g14, sum(x2*x2) AS g22, sum(x2*x3) AS g23,
        |    sum(x2*x4) AS g24, sum(x3*x3) AS g33, sum(x3*x4) AS g34,
        |    sum(x4*x4) AS g44 FROM d),
        |nrm AS (SELECT sqrt(greatest(g11, 0.0)) AS d1,
        |    sqrt(greatest(g22, 0.0)) AS d2, sqrt(greatest(g33, 0.0)) AS d3,
        |    sqrt(greatest(g44, 0.0)) AS d4, g.* FROM g),
        |gn AS (SELECT nrm.*,
        |    g12/(d1*d2) AS n12, g13/(d1*d3) AS n13, g14/(d1*d4) AS n14,
        |    g23/(d2*d3) AS n23, g24/(d2*d4) AS n24, g34/(d3*d4) AS n34
        |  FROM nrm WHERE d1 > 0 AND d2 > 0 AND d3 > 0 AND d4 > 0),
        |-- x1: first nonzero column always kept (resid² = 1)
        |-- x2 on {x1}: resid² = 1 − n12²
        |s2 AS (SELECT gn.*, 1.0 - n12*n12 AS r2_2 FROM gn),
        |-- x3 on the kept basis: {x1, x2} when x2 kept, else NULL (exotic)
        |s3 AS (SELECT s2.*,
        |    CASE WHEN r2_2 >= 1e-14 THEN
        |      1.0 - n13*n13
        |          - ((n23 - n12*n13)/sqrt(1.0 - n12*n12))
        |            *((n23 - n12*n13)/sqrt(1.0 - n12*n12))
        |    END AS r2_3
        |  FROM s2),
        |-- x4 on {x1, x2, x3} when all kept; {x1, x2} when x3 dropped
        |s4 AS (SELECT s3.*,
        |    CASE
        |      WHEN r2_2 >= 1e-14 AND r2_3 >= 1e-14 THEN
        |        1.0 - n14*n14
        |            - ((n24 - n12*n14)/sqrt(1.0 - n12*n12))
        |              *((n24 - n12*n14)/sqrt(1.0 - n12*n12))
        |            - ((n34 - n13*n14
        |                 - ((n23 - n12*n13)/sqrt(1.0 - n12*n12))
        |                   *((n24 - n12*n14)/sqrt(1.0 - n12*n12)))
        |               /sqrt(r2_3))
        |              *((n34 - n13*n14
        |                 - ((n23 - n12*n13)/sqrt(1.0 - n12*n12))
        |                   *((n24 - n12*n14)/sqrt(1.0 - n12*n12)))
        |               /sqrt(r2_3))
        |      WHEN r2_2 >= 1e-14 THEN
        |        1.0 - n14*n14
        |            - ((n24 - n12*n14)/sqrt(1.0 - n12*n12))
        |              *((n24 - n12*n14)/sqrt(1.0 - n12*n12))
        |    END AS r2_4
        |  FROM s3),
        |st AS (SELECT
        |    'x1' AS col_name, 'kept' AS status FROM s4
        |  UNION ALL SELECT 'x2',
        |    CASE WHEN r2_2 < 1e-14 THEN 'collinear' ELSE 'kept' END FROM s4
        |  UNION ALL SELECT 'x3',
        |    CASE WHEN r2_3 < 1e-14 THEN 'collinear' ELSE 'kept' END FROM s4
        |  UNION ALL SELECT 'x4',
        |    CASE WHEN r2_4 < 1e-14 THEN 'collinear' ELSE 'kept' END FROM s4)
        |SELECT col_name, status FROM st""".stripMargin
    )
  )

  // ---- C14: one-hot dummies ----------------------------------------------

  val q13 = Q(
    "q13_dummies",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      Dummies
        .oneHot(li, "l_returnflag")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_returnflag_A"),
          col("l_returnflag_N"),
          col("l_returnflag_R")
        )
    },
    Some(
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS l_returnflag_A,
        |  CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS l_returnflag_N,
        |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS l_returnflag_R
        |FROM lineitem""".stripMargin
    )
  )

  // ---- C16: within-group lags --------------------------------------------

  val q14 = Q(
    "q14_lags",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      Lags
        .makeLags(
          o,
          group = Seq("o_custkey"),
          order = Seq("o_orderdate", "o_orderkey"),
          outcomes = Seq("o_totalprice"),
          nLagsBack = 2,
          nLagsForward = 1,
          fillZeros = false
        )
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          col("o_totalprice_lag_1"),
          col("o_totalprice_lag_2"),
          col("o_totalprice_lag_-1")
        )
    },
    Some(
      """SELECT o_orderkey, o_custkey,
        |  lag(o_totalprice, 1) OVER w AS o_totalprice_lag_1,
        |  lag(o_totalprice, 2) OVER w AS o_totalprice_lag_2,
        |  lead(o_totalprice, 1) OVER w AS "o_totalprice_lag_-1"
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin
    )
  )

  // ---- C17: lags with zero-fill + missing indicators ----------------------

  val q15 = Q(
    "q15_lags_filled",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      Lags
        .makeLags(
          o,
          group = Seq("o_custkey"),
          order = Seq("o_orderdate", "o_orderkey"),
          outcomes = Seq("o_totalprice"),
          nLagsBack = 1,
          nLagsForward = 0,
          fillZeros = true
        )
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          col("o_totalprice_lag_1"),
          col("o_totalprice_lag_1_mi")
        )
    },
    Some(
      """SELECT o_orderkey, o_custkey,
        |  coalesce(lag(o_totalprice, 1) OVER w, 0.0) AS o_totalprice_lag_1,
        |  (CASE WHEN lag(o_totalprice, 1) OVER w IS NULL THEN 1.0 ELSE 0.0 END)::DOUBLE AS o_totalprice_lag_1_mi
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin
    )
  )

  // ---- C1 (arbitrary-function flavor): typed Aggregator -------------------

  val q16 = Q(
    "q16_groupby_custom_agg",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val wavg = udaf(graft.functions.WeightedMean)
      li.groupBy(col("l_returnflag"))
        .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 6).as("wavg_price"))
    },
    Some(
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
    )
  )

  val q17 = Q(
    "q17_groupby_median",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      Grouped.aggregate(
        o,
        Seq("o_orderpriority"),
        Seq(round(percentile(col("o_totalprice"), lit(0.5)), 4).as("median_price"))
      )
    },
    Some(
      """SELECT o_orderpriority, round(median(o_totalprice), 4) AS median_price
        |FROM orders GROUP BY o_orderpriority""".stripMargin
    )
  )

  // ---- C20: multi-outcome OLS (reference's 2-D y) -------------------------

  val q18 = Q(
    "q18_ols_multi_y",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val models = Ols.fitMulti(li, Seq("l_extendedprice", "l_tax"), Seq("l_quantity"))
      val mp = models("l_extendedprice"); val mt = models("l_tax")
      scalarRow(
        s,
        Seq(
          "slope_price" -> rnd(mp.coef(1), 6),
          "intercept_price" -> rnd(mp.coef(0), 6),
          "slope_tax" -> rnd(mt.coef(1), 6),
          "intercept_tax" -> rnd(mt.coef(0), 6)
        )
      )
    },
    Some(
      """SELECT
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope_price,
        |  round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept_price,
        |  round(regr_slope(l_tax, l_quantity), 6) AS slope_tax,
        |  round(regr_intercept(l_tax, l_quantity), 6) AS intercept_tax
        |FROM lineitem""".stripMargin
    )
  )

  // ---- C20 through the FE path: multi-outcome within estimator -----------
  // (reference: hdfe.py:103-116 — 2-D y in the within regime; one demean
  // + one shared Gram pass serve every outcome)

  val q19 = Q(
    "q19_fe_multi_y",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ms = FixedEffects.fitMulti(
        li, Seq("l_extendedprice", "l_tax"), Seq("l_quantity"), Seq("l_suppkey"))
      scalarRow(
        s,
        Seq(
          "slope_price" -> rnd(ms("l_extendedprice").coef(0), 6),
          "slope_tax" -> rnd(ms("l_tax").coef(0), 6)
        ),
        Seq("n" -> ms("l_extendedprice").n)
      )
    },
    Some(
      """WITH d AS (
        |  SELECT
        |    l_extendedprice - avg(l_extendedprice) OVER w AS y1d,
        |    l_tax - avg(l_tax) OVER w AS y2d,
        |    l_quantity - avg(l_quantity) OVER w AS xd
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey))
        |SELECT round(sum(xd*y1d)/sum(xd*xd), 6) AS slope_price,
        |  round(sum(xd*y2d)/sum(xd*xd), 6) AS slope_tax,
        |  count(*) AS n FROM d""".stripMargin
    )
  )

  // ---- C10 through the FE path: homoskedastic SE with absorbed dof --------
  // (reference: hdfe.py:176-179 — sigma² = SSR / (n − cols(full dummy
  // design)); closed form for the 1-FE, 1-regressor case is SQL-able)

  val q36 = Q(
    "q36_fe_se",
    (s, dir) => {
      val m = feSupp(s, dir)
      scalarRow(s, Seq("se_slope" -> rnd(m.seHomoskedastic(0), 6)))
    },
    Some(
      """WITH d AS (
        |  SELECT l_suppkey,
        |    l_extendedprice - avg(l_extendedprice) OVER w AS yd,
        |    l_quantity - avg(l_quantity) OVER w AS xd
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey)),
        |b AS (SELECT sum(xd*yd)/sum(xd*xd) AS slope, sum(xd*xd) AS sxx,
        |        count(*)::DOUBLE AS n FROM d),
        |g AS (SELECT count(DISTINCT l_suppkey)::DOUBLE AS ng FROM lineitem),
        |r AS (SELECT sum((yd - slope*xd)*(yd - slope*xd)) AS ssr FROM d, b)
        |SELECT round(sqrt(ssr/(n - 1.0 - ng)/sxx), 6) AS se_slope FROM r, b, g""".stripMargin
    )
  )

  // ---- C7 for multi-FE: per-FE effect recovery (rows+spec) ----------------
  // The per-FE split of a ≥2-FE decomposition is not ANSI-SQL-expressible
  // (iterative); deterministic values are pinned rows-only + by
  // RegressionSpec's reconstruction test.

  val q37 = Q(
    "q37_fe_effects_two_way",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = cached(s"fe_two_way:$dir")(
        FixedEffects.fit(li, "l_extendedprice", Seq("l_quantity"), Seq("l_suppkey", "l_partkey")))
      m.modelEffects("l_suppkey")
        .select(col("l_suppkey"), round(col("effect"), 4).as("effect"))
    },
    None
  )

  // ---- C9 generalized: FWL partial-out of several columns (oracle) --------

  val q38 = Q(
    "q38_partial_out",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      FixedEffects
        .partialOut(
          li,
          cols = Seq("l_extendedprice", "l_tax"),
          controls = Seq("l_quantity"),
          fes = Seq("l_suppkey"),
          keep = Seq("l_orderkey", "l_linenumber"))
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(col("l_extendedprice__resid"), 4).as("resid_price"),
          round(col("l_tax__resid"), 6).as("resid_tax"))
    },
    Some(
      """WITH d AS (
        |  SELECT l_orderkey, l_linenumber,
        |    l_extendedprice - avg(l_extendedprice) OVER w AS pd,
        |    l_tax - avg(l_tax) OVER w AS td,
        |    l_quantity - avg(l_quantity) OVER w AS xd
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey)),
        |b AS (SELECT sum(xd*pd)/sum(xd*xd) AS bp, sum(xd*td)/sum(xd*xd) AS bt FROM d)
        |SELECT l_orderkey, l_linenumber,
        |  round(pd - bp*xd, 4) AS resid_price,
        |  round(td - bt*xd, 6) AS resid_tax
        |FROM d, b""".stripMargin
    )
  )

  // ---- C25: frequency-weighted OLS (oracle via closed-form 2×2) ----------

  val q41 = Q(
    "q41_ols_weighted",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = Ols.fitWeighted(li, "l_extendedprice", Seq("l_discount"), weight = "l_quantity")
      scalarRow(
        s,
        Seq("slope" -> rnd(m.coef(1), 4), "intercept" -> rnd(m.coef(0), 4)),
        Seq("n" -> m.n))
    },
    Some(
      """WITH s AS (
        |  SELECT sum(l_quantity) AS sw, sum(l_quantity*l_discount) AS swx,
        |    sum(l_quantity*l_extendedprice) AS swy,
        |    sum(l_quantity*l_discount*l_discount) AS swxx,
        |    sum(l_quantity*l_discount*l_extendedprice) AS swxy
        |  FROM lineitem)
        |SELECT
        |  round((sw*swxy - swx*swy) / (sw*swxx - swx*swx), 4) AS slope,
        |  round((swy - (sw*swxy - swx*swy)/(sw*swxx - swx*swx)*swx) / sw, 4) AS intercept,
        |  round(sw)::BIGINT AS n
        |FROM s""".stripMargin
    )
  )

  // ---- C26: per-group OLS — independent fit inside every group (oracle) ---

  val q42 = Q(
    "q42_ols_per_group",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      GroupedOls
        .fitPerGroup(li, "l_extendedprice", Seq("l_quantity"), Seq("l_returnflag"))
        .select(
          col("l_returnflag"),
          col("n"),
          round(col("b_intercept"), 4).as("b_intercept"),
          round(col("b_l_quantity"), 4).as("b_quantity"))
    },
    Some(
      """SELECT l_returnflag, count(*) AS n,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS b_intercept,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS b_quantity
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
    )
  )

  // ---- C27: weighted within estimator (oracle via weighted demean SQL) ----

  val q43 = Q(
    "q43_fe_weighted",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = FixedEffects.fitWeighted(
        li, "l_extendedprice", Seq("l_discount"), Seq("l_suppkey"), weight = "l_quantity")
      scalarRow(s, Seq("slope" -> rnd(m.coef(0), 6)), Seq("n" -> m.n))
    },
    Some(
      """WITH g AS (
        |  SELECT l_suppkey, sum(l_quantity) AS sw,
        |    sum(l_quantity*l_extendedprice) AS swy,
        |    sum(l_quantity*l_discount) AS swx
        |  FROM lineitem GROUP BY l_suppkey),
        |d AS (
        |  SELECT l.l_extendedprice - g.swy/g.sw AS yd,
        |    l.l_discount - g.swx/g.sw AS xd,
        |    l.l_quantity AS w
        |  FROM lineitem l JOIN g USING (l_suppkey))
        |SELECT round(sum(w*xd*yd)/sum(w*xd*xd), 6) AS slope,
        |  round(sum(w))::BIGINT AS n FROM d""".stripMargin
    )
  )

  // ---- C28: per-group rolling statistics (oracle) ------------------------
  // pandas groupby().rolling(5) — trailing-window mean/max per customer in
  // order-key order; the unique order key makes the frame deterministic
  // and the oracle replays it with the identical ROWS BETWEEN frame.
  val q68 = Q(
    "q68_rolling",
    (s, dir) =>
      Grouped
        .rolling(
          Tables.orders(s, dir), Seq("o_custkey"), "o_orderkey", window = 5,
          aggs = Seq(c => avg(c), c => max(c), c => count(c)),
          valueCol = "o_totalprice",
          names = Seq("roll_avg", "roll_max", "roll_n"))
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(col("roll_avg"), 4).as("roll_avg"),
          round(col("roll_max"), 4).as("roll_max"),
          col("roll_n")),
    Some(
      """SELECT o_custkey, o_orderkey,
        |  round(avg(o_totalprice) OVER w, 4) AS roll_avg,
        |  round(max(o_totalprice) OVER w, 4) AS roll_max,
        |  count(o_totalprice) OVER w AS roll_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin
    )
  )

  // ---- C29: heteroskedasticity-robust (HC1) standard errors (oracle) ----
  // White/Eicker–Huber sandwich with the n/(n−k) correction; the oracle
  // replays the single-regressor closed form: Var(b) = n/(n−2) ·
  // Σ x̃²u² / (Σ x̃²)².
  val q70 = Q(
    "q70_ols_hc1",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = olsSimple(s, dir)
      val se = Ols.seHC1(li, m, "l_extendedprice")
      scalarRow(s, Seq("slope" -> rnd(m.coef(1), 6), "se_hc1" -> rnd(se(1), 6)))
    },
    Some(
      """WITH m AS (
        |  SELECT regr_slope(l_extendedprice, l_quantity) AS b,
        |         regr_intercept(l_extendedprice, l_quantity) AS a,
        |         avg(l_quantity) AS mx, count(*) AS n
        |  FROM lineitem)
        |SELECT round(m.b, 6) AS slope,
        |  round(sqrt(
        |    m.n / (m.n - 2.0) *
        |    sum(pow(l.l_quantity - m.mx, 2) * pow(l.l_extendedprice - m.a - m.b * l.l_quantity, 2)) /
        |      pow(sum(pow(l.l_quantity - m.mx, 2)), 2)), 6) AS se_hc1
        |FROM lineitem l CROSS JOIN m
        |GROUP BY m.b, m.n""".stripMargin
    )
  )

  // ---- C30: instrumental variables / 2SLS. Just-identified single-
  // endogenous-regressor case has the closed Wald form — beta =
  // cov(z,y)/cov(z,x) — so the oracle replays coefficient, intercept
  // AND the homoskedastic SE (sigma² · Szz/Szx²) in plain SQL. The
  // instrument is constructed from table columns (z = quantity +
  // linenumber: correlated with x by construction, not collinear) —
  // this pins the ESTIMATOR's arithmetic; the endogeneity-recovery
  // semantics are pinned by RegressionSpec's planted construction.
  val q74 = Q(
    "q74_iv_2sls",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("z", col("l_quantity") + col("l_linenumber"))
      val m = graft.ml.Iv.fit(li, "l_extendedprice", Seq("l_quantity"), Seq("z"))
      scalarRow(
        s,
        Seq(
          "beta_x" -> rnd(m.coef(1), 4),
          "intercept" -> rnd(m.coef(0), 4),
          "se_x" -> rnd(m.se(1), 4)
        ),
        Seq("n" -> m.n)
      )
    },
    Some(
      """WITH d AS (
        |  SELECT l_extendedprice AS y, l_quantity AS x,
        |    l_quantity + l_linenumber AS z
        |  FROM lineitem),
        |m AS (SELECT avg(y) AS my, avg(x) AS mx, count(*) AS n,
        |        covar_pop(z, y) AS szy, covar_pop(z, x) AS szx,
        |        var_pop(z) AS szz
        |      FROM d),
        |b AS (SELECT szy/szx AS beta, my - (szy/szx)*mx AS alpha,
        |        n, szx, szz FROM m),
        |r AS (SELECT b.beta, b.alpha, b.n, b.szx, b.szz,
        |        sum(pow(d.y - b.alpha - b.beta * d.x, 2)) AS ssr
        |      FROM d CROSS JOIN b GROUP BY 1, 2, 3, 4, 5)
        |SELECT round(beta, 4) AS beta_x, round(alpha, 4) AS intercept,
        |  round(sqrt(ssr / (n - 2) * szz / (n * szx * szx)), 4) AS se_x,
        |  n
        |FROM r""".stripMargin
    )
  )

  // ---- C32: Poisson GLM + PPML with absorbed FEs (FULL oracle, r12:
  // the plain half is OracleSql.poissonIrls3 — the logisticIrls4 shape
  // with the log link; the PPML half replays Glm.fitFE's IRLS-over-
  // fitWeighted loop as a recursive CTE whose rows are the FE CELLS
  // (rf, ls): each step re-aggregates the weighted cell stats at the
  // current η, solves the TWO-FE weighted demeaning fixpoint in CLOSED
  // FORM (gauge b_ls(min)=0; the second dimension has exactly two
  // groups, so the reduced system is one scalar δ per column — the
  // alternating-projection limit's cell totals are gauge-invariant and
  // unique on a connected FE graph, so replaying the fixpoint instead
  // of Spark's 1e-9-tol sweep trajectory is exact up to that
  // tolerance; 4dp outputs, margins probed), assembles the demeaned
  // Gram from cell stats (the olsFromCellGram identity), 2×2
  // pivot-solves for β, and evaluates the deviance at the new η via a
  // second row pass. Robust SEs: the carried final Gram as bread, HC0
  // score meat at the converged μ — both halves exactly as Glm) --------

  val q79 = Q(
    "q79_poisson",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("lp", log(col("l_extendedprice")))
      val m = graft.ml.Glm.poisson(li, "l_quantity", Seq("lp", "l_discount"))
      val seR = graft.ml.Glm.seRobust(li, m, "l_quantity")
      val fe = graft.ml.Glm.poissonFE(
        li, "l_quantity", Seq("lp", "l_discount"),
        Seq("l_returnflag", "l_linestatus"))
      scalarRow(
        s,
        Seq(
          "glm_beta_lp" -> rnd(m.coef(1), 4),
          "glm_beta_disc" -> rnd(m.coef(2), 4),
          "glm_se_rob_lp" -> rnd(seR(1), 4),
          "ppml_beta_lp" -> rnd(fe.coef(0), 4),
          "ppml_beta_disc" -> rnd(fe.coef(1), 4),
          "ppml_se_rob_lp" -> rnd(fe.seRobust(0), 4)
        ),
        Seq("n" -> m.n, "glm_iters" -> m.iters.toLong,
          "ppml_iters" -> fe.iters.toLong,
          "converged" -> (if (m.converged && fe.converged) 1L else 0L))
      )
    },
    Some {
      s"""WITH RECURSIVE src AS (
         |  SELECT l_quantity::DOUBLE AS y, ln(l_extendedprice) AS x1,
         |         l_discount::DOUBLE AS x2,
         |         l_returnflag AS rf, l_linestatus AS ls
         |  FROM lineitem),
         |${OracleSql.poissonIrls3("src")},
         |${OracleSql.feGlm2x2("pp", "src", "(SELECT yb FROM psyb)",
            wOf = (mu, _) => mu,
            devOf = (y, mu, _) =>
              s"2.0*((CASE WHEN $y > 0.0 THEN $y*ln($y/($mu)) ELSE 0.0 END) - ($y - ($mu)))",
            tol = 1e-8, maxIter = 25, alpha = false)},
         |${OracleSql.feGlm2x2Se("pp", "src", (y, mu, _) => s"$y - ($mu)")},
         |pinv AS (SELECT psfin.*,
         |    s11*(s22*s33 - s23*s23) - s12*(s12*s33 - s13*s23)
         |      + s13*(s12*s23 - s13*s22) AS det3
         |  FROM psfin),
         |pinv2 AS (SELECT pinv.*,
         |    -(s12*s33 - s13*s23)/det3 AS i10,
         |    (s11*s33 - s13*s13)/det3 AS i11,
         |    -(s11*s23 - s12*s13)/det3 AS i12
         |  FROM pinv),
         |glmse AS (
         |  SELECT DISTINCT b0, b1, b2, i AS glmiters, done AS glmdone,
         |    sum(u*u*(i10 + i11*x1 + i12*x2)*(i10 + i11*x1 + i12*x2))
         |      OVER () AS v11
         |  FROM (
         |    SELECT p.*, d.x1, d.x2,
         |      d.y - exp(least(greatest(p.b0 + d.x1*p.b1 + d.x2*p.b2,
         |        -30.0), 30.0)) AS u
         |    FROM pinv2 p, src d))
         |SELECT round(g.b1, 4) AS glm_beta_lp, round(g.b2, 4) AS glm_beta_disc,
         |  round(sqrt(g.v11), 4) AS glm_se_rob_lp,
         |  round(p.b1, 4) AS ppml_beta_lp, round(p.b2, 4) AS ppml_beta_disc,
         |  round(sqrt(
         |    (p.g22*p.g22*p.m11 - 2.0*p.g22*p.g12*p.m12 + p.g12*p.g12*p.m22)
         |    /((p.g11*p.g22 - p.g12*p.g12)*(p.g11*p.g22 - p.g12*p.g12))), 4)
         |    AS ppml_se_rob_lp,
         |  (SELECT count(*) FROM src) AS n,
         |  g.glmiters::BIGINT AS glm_iters, p.iters::BIGINT AS ppml_iters,
         |  (CASE WHEN g.glmdone AND p.done THEN 1 ELSE 0 END)::BIGINT
         |    AS converged
         |FROM glmse g, ppse p""".stripMargin
    }
  )

  // ---- C33: logistic regression (same IRLS engine, logit link) -------

  val q80 = Q(
    "q80_logit",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("lp", log(col("l_extendedprice")))
        .withColumn("ret", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
      val m = graft.ml.Glm.logistic(li, "ret", Seq("lp", "l_discount", "l_quantity"))
      val seC = graft.ml.Glm.seClustered(li, m, "ret", "l_orderkey")
      scalarRow(
        s,
        Seq(
          "beta_lp" -> rnd(m.coef(1), 4),
          "beta_disc" -> rnd(m.coef(2), 4),
          "beta_qty" -> rnd(m.coef(3), 4),
          "se_info_lp" -> rnd(m.seInformation(1), 4),
          "se_cl_lp" -> rnd(seC(1), 4),
          "deviance" -> rnd(m.deviance, 2)
        ),
        Seq("n" -> m.n, "iters" -> m.iters.toLong,
          "converged" -> (if (m.converged) 1L else 0L))
      )
    },
    // FULL oracle (r11): 4-parameter logistic via
    // OracleSql.logisticIrls4 (Cramer solves from the symbolic
    // determinant builder — well-conditioned design, margins probed);
    // information SE from the carried final Gram's inverse row,
    // cluster-robust SE as the per-order score sums + the same
    // inverse-row quadratic form
    Some {
      s"""WITH RECURSIVE src AS (
         |  SELECT ln(l_extendedprice) AS x1, l_discount::DOUBLE AS x2,
         |         l_quantity::DOUBLE AS x3,
         |         CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
         |         l_orderkey AS cl
         |  FROM lineitem),
         |${OracleSql.logisticIrls4("src")},
         |inv AS (SELECT
         |    ${OracleSql.inv4Row1()}
         |  FROM (SELECT f.*, ${OracleSql.det4Sym} AS det FROM lg4fin f)),
         |sc AS (SELECT cl, x1, x2, x3,
         |    y - 1.0/(1.0 + exp(-least(greatest(
         |      f.b0 + x1*f.b1 + x2*f.b2 + x3*f.b3, -30.0), 30.0))) AS u
         |  FROM src, lg4fin f),
         |per AS (SELECT cl, sum(u) AS t0, sum(u*x1) AS t1,
         |    sum(u*x2) AS t2, sum(u*x3) AS t3
         |  FROM sc GROUP BY cl),
         |meat AS (SELECT sum(t0*t0) AS m00, sum(t0*t1) AS m01,
         |    sum(t0*t2) AS m02, sum(t0*t3) AS m03, sum(t1*t1) AS m11,
         |    sum(t1*t2) AS m12, sum(t1*t3) AS m13, sum(t2*t2) AS m22,
         |    sum(t2*t3) AS m23, sum(t3*t3) AS m33
         |  FROM per),
         |cnt AS (SELECT count(*)::BIGINT AS n FROM src)
         |SELECT round(f.b1, 4) AS beta_lp,
         |  round(f.b2, 4) AS beta_disc,
         |  round(f.b3, 4) AS beta_qty,
         |  round(sqrt(i2.r1), 4) AS se_info_lp,
         |  round(sqrt(
         |    r0*r0*m00 + r1*r1*m11 + r2*r2*m22 + r3*r3*m33
         |      + 2.0*(r0*r1*m01 + r0*r2*m02 + r0*r3*m03
         |             + r1*r2*m12 + r1*r3*m13 + r2*r3*m23)), 4) AS se_cl_lp,
         |  round(f.dev, 2) AS deviance,
         |  cnt.n, f.i::BIGINT AS iters,
         |  (CASE WHEN f.done THEN 1 ELSE 0 END)::BIGINT AS converged
         |FROM lg4fin f, inv i2, meat, cnt""".stripMargin
    }
  )

  // ---- C35: NB2 negative binomial — overdispersed counts (rows-only:
  // the joint β/α fixpoint is not ANSI-SQL-expressible; GlmSpec pins it
  // against an independent dense IRLS with the interleaved
  // Cameron–Trivedi moment update, incl. both sandwiches) ---------------

  val q90 = Q(
    "q90_negbin",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("lp", log(col("l_extendedprice")))
      val m = graft.ml.Glm.negBinomial(li, "l_quantity", Seq("lp", "l_discount"))
      val seR = graft.ml.Glm.seRobust(li, m, "l_quantity")
      // the NB2-vs-Poisson information-SE ratio pin (NB2 must not fall
      // below Poisson beyond numerical noise on this under-dispersed
      // outcome) lives in GlmSpec, which already fits both models — a
      // second full Poisson IRLS here doubled the query's cost for one
      // telemetry scalar
      scalarRow(
        s,
        Seq(
          "beta_lp" -> rnd(m.coef(1), 4),
          "beta_disc" -> rnd(m.coef(2), 4),
          "alpha" -> rnd(m.dispersion.get, 4),
          "se_info_lp" -> rnd(m.seInformation(1), 4),
          "se_rob_lp" -> rnd(seR(1), 4)
        ),
        Seq("n" -> m.n, "iters" -> m.iters.toLong,
          "converged" -> (if (m.converged) 1L else 0L))
      )
    },
    // FULL oracle (r11): the NB2 loop with the per-pass Cameron–Trivedi
    // α moment update replays via OracleSql.negbinIrls3 (pivot-mirrored
    // solves, α carried in the recursion, the exact α=0 Poisson-limit
    // branch); information SE from the carried final Gram's closed-form
    // inverse diagonal, robust SE via the same sandwich as q156
    Some {
      s"""WITH RECURSIVE src AS (
         |  SELECT ln(l_extendedprice) AS x1, l_discount::DOUBLE AS x2,
         |         l_quantity::DOUBLE AS y
         |  FROM lineitem),
         |${OracleSql.negbinIrls3("src")},
         |sc AS (SELECT x1, x2, y,
         |    ((y - mu)*mu)/(CASE WHEN a = 0.0 THEN mu
         |                   ELSE mu*(1.0 + a*mu) END) AS u
         |  FROM (
         |    SELECT src.*, f.a AS a,
         |      exp(least(greatest(f.b0 + src.x1*f.b1 + src.x2*f.b2, -30.0), 30.0))
         |        AS mu
         |    FROM src, nbfin f)),
         |meat AS (SELECT sum(u*u) AS m00, sum(u*u*x1) AS m01, sum(u*u*x2) AS m02,
         |    sum(u*u*x1*x1) AS m11, sum(u*u*x1*x2) AS m12, sum(u*u*x2*x2) AS m22,
         |    count(*)::BIGINT AS n
         |  FROM sc),
         |inv AS (SELECT
         |    (-(s12*s33 - s23*s13))/det AS r0,
         |    (s11*s33 - s13*s13)/det AS r1,
         |    (-(s11*s23 - s12*s13))/det AS r2
         |  FROM (SELECT f.*,
         |          s11*(s22*s33 - s23*s23) - s12*(s12*s33 - s23*s13)
         |            + s13*(s12*s23 - s22*s13) AS det
         |        FROM nbfin f))
         |SELECT round(f.b1, 4) AS beta_lp,
         |  round(f.b2, 4) AS beta_disc,
         |  round(f.a, 4) AS alpha,
         |  round(sqrt(r1), 4) AS se_info_lp,
         |  round(sqrt(
         |    r0*r0*m00 + r1*r1*m11 + r2*r2*m22
         |      + 2.0*(r0*r1*m01 + r0*r2*m02 + r1*r2*m12)), 4) AS se_rob_lp,
         |  meat.n, f.i::BIGINT AS iters,
         |  (CASE WHEN f.done THEN 1 ELSE 0 END)::BIGINT AS converged
         |FROM nbfin f, meat, inv""".stripMargin
    }
  )

  // ---- C36: Gamma/gaussian FE absorption (rows-only: iterative; the
  // GlmSpec dummy-parity + identity-anchor specs pin it) ----------------

  val q91 = Q(
    "q91_gamma_fe",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("lp", log(col("l_extendedprice")))
      // strictly positive right-skewed outcome: extended price itself
      val fe = graft.ml.Glm.gammaFE(
        li, "l_extendedprice", Seq("l_discount", "l_quantity"),
        Seq("l_returnflag", "l_linestatus"))
      val lin = graft.ml.Glm.gaussianFE(
        li, "lp", Seq("l_discount", "l_quantity"),
        Seq("l_returnflag", "l_linestatus"))
      scalarRow(
        s,
        Seq(
          "gamma_beta_disc" -> rnd(fe.coef(0), 4),
          "gamma_beta_qty" -> rnd(fe.coef(1), 4),
          "gamma_se_rob_disc" -> rnd(fe.seRobust(0), 4),
          "loglin_beta_disc" -> rnd(lin.coef(0), 4),
          "loglin_beta_qty" -> rnd(lin.coef(1), 4)
        ),
        Seq("n" -> fe.n, "gamma_iters" -> fe.iters.toLong,
          "loglin_iters" -> lin.iters.toLong,
          "converged" -> (if (fe.converged && lin.converged) 1L else 0L))
      )
    },
    Some {
      s"""WITH RECURSIVE src AS (
         |  SELECT l_extendedprice::DOUBLE AS y, l_discount::DOUBLE AS x1,
         |         l_quantity::DOUBLE AS x2,
         |         l_returnflag AS rf, l_linestatus AS ls
         |  FROM lineitem),
         |gyb AS (SELECT sum(1.0*y)/sum(1.0) AS yb FROM src),
         |${OracleSql.feGlm2x2("gm", "src", "(SELECT yb FROM gyb)",
            wOf = (_, _) => "1.0",
            devOf = (y, mu, _) => s"2.0*(-ln($y/($mu)) + ($y - ($mu))/($mu))",
            tol = 1e-8, maxIter = 25, alpha = false)},
         |${OracleSql.feGlm2x2Se("gm", "src", (y, mu, _) => s"($y - ($mu))/($mu)")},
         |lsrc AS (
         |  SELECT ln(l_extendedprice) AS z, l_discount::DOUBLE AS x1,
         |         l_quantity::DOUBLE AS x2,
         |         l_returnflag AS rf, l_linestatus AS ls
         |  FROM lineitem),
         |lc AS (SELECT DISTINCT rf, ls,
         |    count(*) OVER (PARTITION BY rf, ls)::DOUBLE AS cn,
         |    sum(z) OVER (PARTITION BY rf, ls) AS sz,
         |    sum(x1) OVER (PARTITION BY rf, ls) AS s1,
         |    sum(x2) OVER (PARTITION BY rf, ls) AS s2,
         |    sum(x1*x1) OVER () AS q11, sum(x1*x2) OVER () AS q12,
         |    sum(x2*x2) OVER () AS q22,
         |    sum(x1*z) OVER () AS qz1, sum(x2*z) OVER () AS qz2
         |  FROM lsrc),
         |l4 AS (SELECT lc.*,
         |    sum(cn) OVER (PARTITION BY rf) AS ng,
         |    sum(sz) OVER (PARTITION BY rf) AS sgz,
         |    sum(s1) OVER (PARTITION BY rf) AS sg1,
         |    sum(s2) OVER (PARTITION BY rf) AS sg2,
         |    ls = max(ls) OVER () AS ish1
         |  FROM lc),
         |l5 AS (SELECT l4.*,
         |    sum(CASE WHEN ish1 THEN cn ELSE 0.0 END)
         |      OVER (PARTITION BY rf) AS ngh1,
         |    (sum(CASE WHEN ish1 THEN sz ELSE 0.0 END) OVER ()
         |     - sum(CASE WHEN ish1 THEN cn*sgz/ng ELSE 0.0 END) OVER ())
         |    /(sum(CASE WHEN ish1 THEN cn ELSE 0.0 END) OVER ()
         |      - sum(CASE WHEN ish1 THEN cn*cn/ng ELSE 0.0 END) OVER ()) AS dz,
         |    (sum(CASE WHEN ish1 THEN s1 ELSE 0.0 END) OVER ()
         |     - sum(CASE WHEN ish1 THEN cn*sg1/ng ELSE 0.0 END) OVER ())
         |    /(sum(CASE WHEN ish1 THEN cn ELSE 0.0 END) OVER ()
         |      - sum(CASE WHEN ish1 THEN cn*cn/ng ELSE 0.0 END) OVER ()) AS d1,
         |    (sum(CASE WHEN ish1 THEN s2 ELSE 0.0 END) OVER ()
         |     - sum(CASE WHEN ish1 THEN cn*sg2/ng ELSE 0.0 END) OVER ())
         |    /(sum(CASE WHEN ish1 THEN cn ELSE 0.0 END) OVER ()
         |      - sum(CASE WHEN ish1 THEN cn*cn/ng ELSE 0.0 END) OVER ()) AS d2
         |  FROM l4),
         |l6 AS (SELECT l5.*,
         |    (sgz - ngh1*dz)/ng + (CASE WHEN ish1 THEN dz ELSE 0.0 END) AS ez,
         |    (sg1 - ngh1*d1)/ng + (CASE WHEN ish1 THEN d1 ELSE 0.0 END) AS e1,
         |    (sg2 - ngh1*d2)/ng + (CASE WHEN ish1 THEN d2 ELSE 0.0 END) AS e2
         |  FROM l5),
         |l7 AS (SELECT DISTINCT
         |    q11 - sum(2.0*s1*e1 - cn*e1*e1) OVER () AS g11,
         |    q12 - sum(s1*e2 + s2*e1 - cn*e1*e2) OVER () AS g12,
         |    q22 - sum(2.0*s2*e2 - cn*e2*e2) OVER () AS g22,
         |    qz1 - sum(s1*ez + sz*e1 - cn*e1*ez) OVER () AS c1g,
         |    qz2 - sum(s2*ez + sz*e2 - cn*e2*ez) OVER () AS c2g
         |  FROM l6),
         |l8 AS (SELECT l7.*,
         |    CASE WHEN abs(g12) > abs(g11) THEN g12 ELSE g11 END AS m00,
         |    CASE WHEN abs(g12) > abs(g11) THEN g22 ELSE g12 END AS m01,
         |    CASE WHEN abs(g12) > abs(g11) THEN c2g ELSE c1g END AS v0,
         |    CASE WHEN abs(g12) > abs(g11) THEN g11 ELSE g12 END AS m10,
         |    CASE WHEN abs(g12) > abs(g11) THEN g12 ELSE g22 END AS m11,
         |    CASE WHEN abs(g12) > abs(g11) THEN c1g ELSE c2g END AS v1
         |  FROM l7),
         |lfin AS (SELECT lb2, (v0 - m01*lb2)/m00 AS lb1
         |  FROM (SELECT l8.*,
         |          (v1 - (m10/m00)*v0)/(m11 - (m10/m00)*m01) AS lb2 FROM l8))
         |SELECT round(p.b1, 4) AS gamma_beta_disc,
         |  round(p.b2, 4) AS gamma_beta_qty,
         |  round(sqrt(
         |    (p.g22*p.g22*p.m11 - 2.0*p.g22*p.g12*p.m12 + p.g12*p.g12*p.m22)
         |    /((p.g11*p.g22 - p.g12*p.g12)*(p.g11*p.g22 - p.g12*p.g12))), 4)
         |    AS gamma_se_rob_disc,
         |  round(l.lb1, 4) AS loglin_beta_disc, round(l.lb2, 4) AS loglin_beta_qty,
         |  (SELECT count(*) FROM src) AS n,
         |  p.iters::BIGINT AS gamma_iters, 2::BIGINT AS loglin_iters,
         |  (CASE WHEN p.done THEN 1 ELSE 0 END)::BIGINT AS converged
         |FROM gmse p, lfin l""".stripMargin
    }
  )

  // ---- C37: NB2-FE absorption (rows-only: joint (β, α) fixpoint with
  // absorbed FEs; GlmSpec pins dummy parity for 1/2 FEs incl. α and the
  // robust SE, and fixed-α=0 ≡ poissonFE exactly) -----------------------

  val q94 = Q(
    "q94_negbin_fe",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("lp", log(col("l_extendedprice")))
      val fe = graft.ml.Glm.negBinomialFE(
        li, "l_quantity", Seq("lp", "l_discount"),
        Seq("l_returnflag", "l_linestatus"))
      scalarRow(
        s,
        Seq(
          "beta_lp" -> rnd(fe.coef(0), 4),
          "beta_disc" -> rnd(fe.coef(1), 4),
          "alpha" -> rnd(fe.dispersion.get, 4),
          "se_rob_lp" -> rnd(fe.seRobust(0), 4)
        ),
        Seq("n" -> fe.n, "iters" -> fe.iters.toLong,
          "converged" -> (if (fe.converged) 1L else 0L))
      )
    },
    Some {
      s"""WITH RECURSIVE src AS (
         |  SELECT l_quantity::DOUBLE AS y, ln(l_extendedprice) AS x1,
         |         l_discount::DOUBLE AS x2,
         |         l_returnflag AS rf, l_linestatus AS ls
         |  FROM lineitem),
         |nyb AS (SELECT sum(1.0*y)/sum(1.0) AS yb FROM src),
         |${OracleSql.feGlm2x2("nb", "src", "(SELECT yb FROM nyb)",
            wOf = (mu, a) =>
              s"CASE WHEN $a = 0.0 THEN $mu ELSE ($mu)/(1.0 + $a*($mu)) END",
            devOf = (y, mu, a) =>
              s"""CASE WHEN $a = 0.0
                 |  THEN 2.0*((CASE WHEN $y > 0.0 THEN $y*ln($y/($mu)) ELSE 0.0 END)
                 |            - ($y - ($mu)))
                 |  ELSE 2.0*((CASE WHEN $y > 0.0 THEN $y*ln($y/($mu)) ELSE 0.0 END)
                 |            - ($y + 1.0/$a)
                 |              *ln((1.0 + $a*$y)/(1.0 + $a*($mu)))) END""".stripMargin,
            tol = 1e-8, maxIter = 40, alpha = true)},
         |${OracleSql.feGlm2x2Se("nb", "src",
            (y, mu, a) => s"($y - ($mu))/(1.0 + $a*($mu))")}
         |SELECT round(p.b1, 4) AS beta_lp, round(p.b2, 4) AS beta_disc,
         |  round(p.a, 4) AS alpha,
         |  round(sqrt(
         |    (p.g22*p.g22*p.m11 - 2.0*p.g22*p.g12*p.m12 + p.g12*p.g12*p.m22)
         |    /((p.g11*p.g22 - p.g12*p.g12)*(p.g11*p.g22 - p.g12*p.g12))), 4)
         |    AS se_rob_lp,
         |  (SELECT count(*) FROM src) AS n,
         |  p.iters::BIGINT AS iters,
         |  (CASE WHEN p.done THEN 1 ELSE 0 END)::BIGINT AS converged
         |FROM nbse p""".stripMargin
    }
  )

  // ---- C39: between estimator (FULL oracle — group-mean collapse +
  // 2×2 Cramer slope over the collapsed frame) -------------------------

  val q144 = Q(
    "q144_between",
    (s, dir) => {
      val m = graft.ml.Panel.between(
        Tables.lineitem(s, dir), "l_extendedprice", Seq("l_quantity"), "l_suppkey")
      scalarRow(
        s,
        // rounding scales leave ≥100× headroom over the ~1e-9 RELATIVE
        // QR-vs-Cramer solver difference (the q146 lesson: margins must
        // be probed against |value|·1e-9, not summation noise)
        Seq("slope" -> rnd(m.coef(1), 4), "intercept" -> rnd(m.coef(0), 2)),
        Seq("n_groups" -> m.n))
    },
    Some(
      """WITH m AS (SELECT avg(l_extendedprice) AS y, avg(l_quantity) AS x
        |           FROM lineitem GROUP BY l_suppkey),
        |s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        |        sum(x*y) AS sxy, sum(x*x) AS sxx FROM m)
        |SELECT round((n*sxy - sx*sy)/(n*sxx - sx*sx), 4) AS slope,
        |  round((sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n, 2) AS intercept,
        |  n::BIGINT AS n_groups FROM s""".stripMargin
    )
  )

  // ---- C40: first-difference estimator (FULL oracle — lag window on a
  // total order, no-intercept slope on the differences) ----------------

  val q145 = Q(
    "q145_first_difference",
    (s, dir) => {
      val m = graft.ml.Panel.firstDifference(
        Tables.lineitem(s, dir), "l_extendedprice", Seq("l_quantity"),
        "l_suppkey", Seq("l_shipdate", "l_orderkey", "l_linenumber"))
      scalarRow(s, Seq("slope" -> rnd(m.coef(0), 6)), Seq("n" -> m.n))
    },
    Some(
      """WITH d AS (
        |  SELECT l_extendedprice - lag(l_extendedprice) OVER w AS dy,
        |         l_quantity - lag(l_quantity) OVER w AS dx
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey
        |               ORDER BY l_shipdate, l_orderkey, l_linenumber))
        |SELECT round(sum(dx*dy)/sum(dx*dx), 6) AS slope, count(*)::BIGINT AS n
        |FROM d WHERE dy IS NOT NULL""".stripMargin
    )
  )

  // ---- C41: Mundlak correlated-random-effects device (FULL oracle —
  // 3×3 Cramer on [1, x, group-mean(x)]; the x coefficient equals the
  // within estimator, cross-pinned in RegressionSpec) ------------------

  val q146 = Q(
    "q146_mundlak",
    (s, dir) => {
      val m = graft.ml.Panel.mundlak(
        Tables.lineitem(s, dir), "l_extendedprice", Seq("l_quantity"), "l_suppkey")
      scalarRow(
        s,
        Seq("beta_within" -> rnd(m.coef(1), 6), "beta_gmean" -> rnd(m.coef(2), 4)),
        Seq("n" -> m.n))
    },
    Some(
      """WITH a AS (SELECT l_extendedprice AS y, l_quantity AS x,
        |             avg(l_quantity) OVER (PARTITION BY l_suppkey) AS z
        |           FROM lineitem),
        |s AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(z) AS sz, sum(y) AS sy,
        |        sum(x*x) AS sxx, sum(x*z) AS sxz, sum(z*z) AS szz,
        |        sum(x*y) AS sxy, sum(z*y) AS szy FROM a)
        |SELECT
        |  round((n*(sxy*szz-sxz*szy) - sy*(sx*szz-sxz*sz) + sz*(sx*szy-sxy*sz))
        |    / (n*(sxx*szz-sxz*sxz) - sx*(sx*szz-sxz*sz) + sz*(sx*sxz-sxx*sz)), 6) AS beta_within,
        |  round((n*(sxx*szy-sxy*sxz) - sx*(sx*szy-sxy*sz) + sy*(sx*sxz-sxx*sz))
        |    / (n*(sxx*szz-sxz*sxz) - sx*(sx*szz-sxz*sz) + sz*(sx*sxz-sxx*sz)), 4) AS beta_gmean,
        |  n::BIGINT AS n
        |FROM s""".stripMargin
    )
  )

  // ---- C42: 2×2 difference-in-differences (FULL oracle — four cell
  // means/variances and the closed-form estimate + unequal-variance SE) -

  val q147 = Q(
    "q147_did",
    (s, dir) => {
      val o = Tables.normalizeTs(Tables.orders(s, dir), "o_orderdate")
      val did = graft.ml.Panel.didTwoByTwo(
        o, "o_totalprice",
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      scalarRow(
        s,
        Seq("did_estimate" -> rnd(did.estimate, 4), "did_se" -> rnd(did.se, 4)),
        Seq("n" -> did.n))
    },
    Some(
      """WITH c AS (
        |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS t,
        |         CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS p,
        |         count(*)::BIGINT AS n, avg(o_totalprice) AS m, var_samp(o_totalprice) AS v
        |  FROM orders GROUP BY 1, 2)
        |SELECT
        |  round(((SELECT m FROM c WHERE t=1 AND p=1) - (SELECT m FROM c WHERE t=1 AND p=0))
        |      - ((SELECT m FROM c WHERE t=0 AND p=1) - (SELECT m FROM c WHERE t=0 AND p=0)), 4)
        |    AS did_estimate,
        |  round(sqrt((SELECT sum(v/n::DOUBLE) FROM c)), 4) AS did_se,
        |  (SELECT sum(n)::BIGINT FROM c) AS n""".stripMargin
    )
  )

  // ---- C43: ridge regression (FULL oracle — 3×3 Cramer on the
  // diagonal-penalized Gram; intercept unpenalized) --------------------

  val q148 = Q(
    "q148_ridge",
    (s, dir) => {
      val m = graft.ml.Ols.fitRidge(
        Tables.lineitem(s, dir), "l_extendedprice",
        Seq("l_quantity", "l_discount"), lambda = 1e6)
      scalarRow(
        s,
        Seq(
          "b_qty" -> rnd(m.coef(1), 4),
          "b_disc" -> rnd(m.coef(2), 6),
          "intercept" -> rnd(m.coef(0), 2)),
        Seq("n" -> m.n))
    },
    Some(
      """WITH s AS (
        |  SELECT count(*)::DOUBLE AS n, sum(l_quantity) AS sx, sum(l_discount) AS sz,
        |    sum(l_extendedprice) AS sy, sum(l_quantity*l_quantity) + 1000000.0 AS sxx,
        |    sum(l_quantity*l_discount) AS sxz,
        |    sum(l_discount*l_discount) + 1000000.0 AS szz,
        |    sum(l_quantity*l_extendedprice) AS sxy, sum(l_discount*l_extendedprice) AS szy
        |  FROM lineitem)
        |SELECT
        |  round((n*(sxy*szz-sxz*szy) - sy*(sx*szz-sxz*sz) + sz*(sx*szy-sxy*sz))
        |    / (n*(sxx*szz-sxz*sxz) - sx*(sx*szz-sxz*sz) + sz*(sx*sxz-sxx*sz)), 4) AS b_qty,
        |  round((n*(sxx*szy-sxy*sxz) - sx*(sx*szy-sxy*sz) + sy*(sx*sxz-sxx*sz))
        |    / (n*(sxx*szz-sxz*sxz) - sx*(sx*szz-sxz*sz) + sz*(sx*sxz-sxx*sz)), 6) AS b_disc,
        |  round((sy*(sxx*szz-sxz*sxz) - sx*(sxy*szz-sxz*szy) + sz*(sxy*sxz-sxx*szy))
        |    / (n*(sxx*szz-sxz*sxz) - sx*(sx*szz-sxz*sz) + sz*(sx*sxz-sxx*sz)), 2) AS intercept,
        |  n::BIGINT AS n FROM s""".stripMargin
    )
  )

  // ---- C44: one-pass Poisson bootstrap SE (FULL oracle — every
  // Poisson(1) draw replayed from the shared md5-60 hash) --------------

  val q149 = Q(
    "q149_boot_se",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      graft.ops.Bootstrap
        .groupedMeanSE(
          li, "l_quantity", "l_returnflag",
          concat(col("l_orderkey").cast("string"), lit("-"), col("l_linenumber").cast("string")),
          b = 32)
        .orderBy(col("l_returnflag"))
    },
    Some {
      val id = "l_orderkey::VARCHAR || '-' || l_linenumber::VARCHAR"
      val w = graft.ops.Bootstrap.weightSqlRep(id, "rep")
      s"""WITH r AS (SELECT unnest(range(32)) AS rep),
         |w AS (SELECT l_returnflag AS g, l_quantity::DOUBLE AS y, rep, $w::DOUBLE AS w
         |      FROM lineitem CROSS JOIN r),
         |m AS (SELECT g, rep, sum(w*y)/sum(w) AS mr FROM w GROUP BY 1, 2),
         |se AS (SELECT g, sqrt((sum(mr*mr) - 32.0*avg(mr)*avg(mr))/31.0) AS s FROM m GROUP BY 1),
         |base AS (SELECT l_returnflag, count(*)::BIGINT AS n, round(avg(l_quantity), 4) AS mean
         |         FROM lineitem GROUP BY 1)
         |SELECT base.l_returnflag, base.n, base.mean, round(se.s, 4) AS boot_se
         |FROM base JOIN se ON se.g = base.l_returnflag
         |ORDER BY base.l_returnflag""".stripMargin
    }
  )

  // ---- C45: winsorized group means (FULL oracle — percentile ≡
  // quantile_cont, the q17 interpolation bridge) -----------------------

  val q150 = Q(
    "q150_winsorized",
    (s, dir) =>
      graft.ops.Stats
        .winsorizedMean(Tables.lineitem(s, dir), "l_extendedprice", "l_returnflag")
        .orderBy(col("l_returnflag")),
    Some(
      """WITH c AS (SELECT l_returnflag AS g, quantile_cont(l_extendedprice, 0.05) AS lo,
        |             quantile_cont(l_extendedprice, 0.95) AS hi
        |           FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, count(*)::BIGINT AS n,
        |  round(min(lo), 4) AS p_lo, round(min(hi), 4) AS p_hi,
        |  round(avg(least(greatest(l_extendedprice, lo), hi)), 4) AS mean_winsorized,
        |  round(avg(l_extendedprice), 4) AS mean_raw
        |FROM lineitem JOIN c ON c.g = l_returnflag
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    )
  )

  // ---- C46: cloglog GLM (rows-only: IRLS not ANSI-SQL-expressible;
  // GlmSpec pins iteration-for-iteration dense parity, both sandwiches
  // and planted-hazard recovery) ---------------------------------------

  val q156 = Q(
    "q156_cloglog",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("is_return", (col("l_returnflag") === "R").cast("double"))
      val m = graft.ml.Glm.cloglog(li, "is_return", Seq("l_discount", "l_quantity"))
      val se = graft.ml.Glm.seRobust(
        Tables.lineitem(s, dir)
          .withColumn("is_return", (col("l_returnflag") === "R").cast("double")),
        m, "is_return")
      scalarRow(
        s,
        Seq(
          "b_disc" -> rnd(m.coef(1), 4),
          "b_qty" -> rnd(m.coef(2), 4),
          "se_rob_disc" -> rnd(se(1), 4)),
        Seq("n" -> m.n, "iters" -> m.iters.toLong,
          "converged" -> (if (m.converged) 1L else 0L)))
    },
    // FULL oracle (r11): the 3-parameter cloglog IRLS replays through
    // OracleSql.cloglogIrls3 (pivot-mirrored solves); the HC0 robust
    // sandwich uses the CARRIED final-pass Gram as bread (exactly
    // Spark's model.gramW — not a recompute), a one-pass u²xx' meat at
    // the final β, and the closed-form symmetric 3×3 inverse row
    // (adjugate — ulp-off from LinAlg.inverse's pivoted chain; the 4dp
    // output quantizer absorbs it, margin probed)
    Some {
      s"""WITH RECURSIVE src AS (
         |  SELECT l_discount::DOUBLE AS x1, l_quantity::DOUBLE AS x2,
         |         CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
         |  FROM lineitem),
         |${OracleSql.cloglogIrls3("src")},
         |sc AS (SELECT x1, x2, y,
         |    (y - mu)*((-(1.0 - mu))*ln(1.0 - mu))/(mu*(1.0 - mu)) AS u
         |  FROM (
         |    SELECT src.*,
         |      least(greatest(1.0 - exp(-exp(least(greatest(
         |        f.b0 + src.x1*f.b1 + src.x2*f.b2, -30.0), 3.4))), 1e-12),
         |        1.0 - 1e-12) AS mu
         |    FROM src, cfin f)),
         |meat AS (SELECT sum(u*u) AS m00, sum(u*u*x1) AS m01, sum(u*u*x2) AS m02,
         |    sum(u*u*x1*x1) AS m11, sum(u*u*x1*x2) AS m12, sum(u*u*x2*x2) AS m22,
         |    count(*)::BIGINT AS n
         |  FROM sc),
         |inv AS (SELECT
         |    (-(s12*s33 - s23*s13))/det AS r0,
         |    (s11*s33 - s13*s13)/det AS r1,
         |    (-(s11*s23 - s12*s13))/det AS r2
         |  FROM (SELECT f.*,
         |          s11*(s22*s33 - s23*s23) - s12*(s12*s33 - s23*s13)
         |            + s13*(s12*s23 - s22*s13) AS det
         |        FROM cfin f))
         |SELECT round(f.b1, 4) AS b_disc,
         |  round(f.b2, 4) AS b_qty,
         |  round(sqrt(
         |    r0*r0*m00 + r1*r1*m11 + r2*r2*m22
         |      + 2.0*(r0*r1*m01 + r0*r2*m02 + r1*r2*m12)), 4) AS se_rob_disc,
         |  meat.n, f.i::BIGINT AS iters,
         |  (CASE WHEN f.done THEN 1 ELSE 0 END)::BIGINT AS converged
         |FROM cfin f, meat, inv""".stripMargin
    }
  )

  // ---- C47: pairs-cluster Poisson bootstrap of an OLS slope (FULL
  // oracle — per-cluster draws and all 32 replicate regressions
  // replayed from the shared hash) -------------------------------------

  val q157 = Q(
    "q157_boot_slope_cluster",
    (s, dir) =>
      graft.ops.Bootstrap.olsSlopeSE(
        Tables.lineitem(s, dir), "l_extendedprice", "l_quantity", "l_suppkey", b = 32),
    Some {
      val w = graft.ops.Bootstrap.weightSqlRep("l_suppkey::VARCHAR", "rep")
      s"""WITH r AS (SELECT unnest(range(32)) AS rep),
         |w AS (SELECT l_quantity::DOUBLE AS x, l_extendedprice::DOUBLE AS y, rep,
         |        $w::DOUBLE AS w
         |      FROM lineitem CROSS JOIN r),
         |m AS (SELECT rep, sum(w) AS sw, sum(w*x) AS swx, sum(w*y) AS swy,
         |        sum(w*x*x) AS swxx, sum(w*x*y) AS swxy FROM w GROUP BY 1),
         |sl AS (SELECT (sw*swxy - swx*swy)/(sw*swxx - swx*swx) AS s FROM m),
         |se AS (SELECT sqrt((sum(s*s) - 32.0*avg(s)*avg(s))/31.0) AS v FROM sl),
         |base AS (SELECT count(*)::DOUBLE AS n, sum(l_quantity) AS sx,
         |           sum(l_extendedprice) AS sy,
         |           sum(l_quantity*l_quantity) AS sxx,
         |           sum(l_quantity*l_extendedprice) AS sxy FROM lineitem)
         |SELECT n::BIGINT AS n,
         |  round((n*sxy - sx*sy)/(n*sxx - sx*sx), 4) AS slope,
         |  round((SELECT v FROM se), 4) AS boot_se_cluster
         |FROM base""".stripMargin
    }
  )

  // ---- C48: quantile regression (FULL oracle, r12: the δ-smoothed
  // IRLS is a deterministic loop — OLS init, auto-δ from mean |OLS
  // residual|, per-pass weighted 2-param pivot solve with the pinball
  // loss, subgradient z-gap certificate, best-iterate tracking,
  // 3-strikes no-improve counter and the triple stopping rule all
  // replay in a recursive CTE, once per τ) -----------------------------

  val q158 = Q(
    "q158_quantile_reg",
    (s, dir) => {
      // maxIter bounds the bench cost: the skewed price tail polishes
      // slowly past ~15 sweeps while the coefficients are stable to 4dp;
      // the z-gap in the output is the honest convergence certificate
      val li = Tables.lineitem(s, dir)
      val m50 = graft.ml.QuantileReg.fit(li, "l_extendedprice", Seq("l_quantity"), 0.5, maxIter = 20)
      val m90 = graft.ml.QuantileReg.fit(li, "l_extendedprice", Seq("l_quantity"), 0.9, maxIter = 20)
      scalarRow(
        s,
        Seq(
          "slope_p50" -> rnd(m50.coef(1), 4),
          "slope_p90" -> rnd(m90.coef(1), 4),
          "gap_p50" -> rnd(m50.gradGap, 6),
          "gap_p90" -> rnd(m90.gradGap, 6)),
        Seq("n" -> m50.n, "iters_p50" -> m50.iters.toLong, "iters_p90" -> m90.iters.toLong,
          "converged" -> (if (m50.converged && m90.converged) 1L else 0L)))
    },
    Some {
      val MaxD = "1.7976931348623157e308"
      // one recursion per τ: OLS init, auto-δ, per-pass weighted pivot
      // solve + pinball loss + subgradient gap, best-iterate tracking,
      // the exact triple stop (certificate / smooth loss / 3 strikes)
      def qr(tag: String, tau: Double): String = {
        val tau1 = 1.0 - tau
        val tt = tau * (1.0 - tau)
        s"""${tag}ini AS (SELECT ip.*,
           |    (v0 - m01*ib1)/m00 AS ib0,
           |    sqrt($tt*g11) AS gse0, sqrt($tt*g22) AS gse1
           |  FROM (SELECT qp.*,
           |          (v1 - (m10/m00)*v0)/(m11 - (m10/m00)*m01) AS ib1
           |        FROM (SELECT qm.*,
           |            CASE WHEN abs(g12) > abs(g11) THEN g12 ELSE g11 END AS m00,
           |            CASE WHEN abs(g12) > abs(g11) THEN g22 ELSE g12 END AS m01,
           |            CASE WHEN abs(g12) > abs(g11) THEN c2 ELSE c1 END AS v0,
           |            CASE WHEN abs(g12) > abs(g11) THEN g11 ELSE g12 END AS m10,
           |            CASE WHEN abs(g12) > abs(g11) THEN g12 ELSE g22 END AS m11,
           |            CASE WHEN abs(g12) > abs(g11) THEN c1 ELSE c2 END AS v1
           |          FROM (SELECT sum(1.0*1.0) AS g11, sum(1.0*x) AS g12,
           |                  sum(x*x) AS g22, sum(1.0*y) AS c1, sum(x*y) AS c2
           |                FROM src) qm) qp) ip),
           |${tag}dlt AS (SELECT greatest(1e-12,
           |    1e-3*avg(abs(d.y - (i.ib0 + i.ib1*d.x)))) AS de
           |  FROM src d, ${tag}ini i),
           |${tag}it AS (
           |  SELECT 0 AS i, ib0 AS b0, ib1 AS b1, $MaxD AS prevloss,
           |    $MaxD AS bestloss, ib1 AS bestb1, $MaxD AS bestgap,
           |    0 AS noimp, false AS done, 0::BIGINT AS nn
           |  FROM ${tag}ini
           |  UNION ALL
           |  SELECT i + 1, nb0, nb1, lossnow,
           |    CASE WHEN lossnow < bestloss THEN lossnow ELSE bestloss END,
           |    CASE WHEN lossnow < bestloss THEN b1 ELSE bestb1 END,
           |    CASE WHEN lossnow < bestloss THEN gapnow ELSE bestgap END,
           |    noimp2,
           |    gapnow < 0.1
           |      OR (prevloss <> $MaxD
           |          AND abs(lossnow - prevloss)/(abs(lossnow) + 1e-12) < 1e-7)
           |      OR noimp2 >= 3,
           |    nn
           |  FROM (
           |    SELECT s3.*,
           |      CASE WHEN lossnow < bestloss - 1e-7*(abs(bestloss) + 1e-12)
           |        THEN 0 ELSE noimp + 1 END AS noimp2,
           |      (v0 - m01*nb1)/m00 AS nb0
           |    FROM (
           |      SELECT s2.*,
           |        (v1 - (m10/m00)*v0)/(m11 - (m10/m00)*m01) AS nb1
           |      FROM (
           |        SELECT s1.*,
           |          CASE WHEN abs(s12) > abs(s11) THEN s12 ELSE s11 END AS m00,
           |          CASE WHEN abs(s12) > abs(s11) THEN s22 ELSE s12 END AS m01,
           |          CASE WHEN abs(s12) > abs(s11) THEN c2 ELSE c1 END AS v0,
           |          CASE WHEN abs(s12) > abs(s11) THEN s11 ELSE s12 END AS m10,
           |          CASE WHEN abs(s12) > abs(s11) THEN s12 ELSE s22 END AS m11,
           |          CASE WHEN abs(s12) > abs(s11) THEN c1 ELSE c2 END AS v1,
           |          greatest(abs(g0)/greatest(gse0, 1e-12),
           |                   abs(g1)/greatest(gse1, 1e-12)) AS gapnow
           |        FROM (
           |          SELECT DISTINCT i, b0, b1, prevloss, bestloss, bestb1,
           |            bestgap, noimp, gse0, gse1,
           |            sum(w*1.0*1.0) OVER () AS s11,
           |            sum(w*1.0*x) OVER () AS s12,
           |            sum(w*x*x) OVER () AS s22,
           |            sum(w*1.0*y) OVER () AS c1, sum(w*x*y) OVER () AS c2,
           |            sum(1.0*sgn) OVER () AS g0, sum(x*sgn) OVER () AS g1,
           |            sum(tauside*abs(r)) OVER () AS lossnow,
           |            count(*) OVER () AS nn
           |          FROM (
           |            SELECT t0.*,
           |              CASE WHEN r < 0.0 THEN $tau1 ELSE $tau END AS tauside,
           |              CASE WHEN r < 0.0 THEN ${tau - 1.0} ELSE $tau END AS sgn,
           |              (CASE WHEN r < 0.0 THEN $tau1 ELSE $tau END)
           |                /greatest(abs(r), (SELECT de FROM ${tag}dlt)) AS w
           |            FROM (
           |              SELECT q.i, q.b0, q.b1, q.prevloss, q.bestloss,
           |                q.bestb1, q.bestgap, q.noimp,
           |                n.gse0, n.gse1, d.x, d.y,
           |                d.y - (q.b0 + q.b1*d.x) AS r
           |              FROM ${tag}it q, src d, ${tag}ini n
           |              WHERE q.i < 20 AND NOT q.done) t0
           |          )
           |        ) s1
           |      ) s2
           |    ) s3
           |  ) s4
           |),
           |${tag}fin AS (SELECT * FROM ${tag}it
           |              WHERE i = (SELECT max(i) FROM ${tag}it))""".stripMargin
      }
      s"""WITH RECURSIVE src AS (
         |  SELECT l_extendedprice::DOUBLE AS y, l_quantity::DOUBLE AS x
         |  FROM lineitem),
         |${qr("qa", 0.5)},
         |${qr("qb", 0.9)}
         |SELECT round(a.bestb1, 4) AS slope_p50, round(b.bestb1, 4) AS slope_p90,
         |  round(a.bestgap, 6) AS gap_p50, round(b.bestgap, 6) AS gap_p90,
         |  a.nn AS n, a.i::BIGINT AS iters_p50, b.i::BIGINT AS iters_p90,
         |  (CASE WHEN a.done AND b.done THEN 1 ELSE 0 END)::BIGINT AS converged
         |FROM qafin a, qbfin b""".stripMargin
    }
  )

  // ---- C49: IPW + AIPW treatment effects (FULL oracle — the logistic
  // propensity replays via the shared 2-parameter IRLS recursive CTE
  // (OracleSql.logisticIrls2), the outcome OLS pair via Cramer closed
  // forms, everything else Hajek/AIPW closed-form sums at 4dp;
  // CausalSpec still pins planted-confounding debiasing) ---------------

  val q159 = Q(
    "q159_ate",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("hi_disc", (col("l_discount") > 0.05).cast("double"))
      val ipw = graft.ml.Causal.ipwATE(li, "l_extendedprice", "hi_disc", Seq("l_quantity"))
      val aipw = graft.ml.Causal.aipwATE(li, "l_extendedprice", "hi_disc", Seq("l_quantity"))
      scalarRow(
        s,
        Seq(
          "ate_ipw" -> rnd(ipw.ate, 4),
          "ate_aipw" -> rnd(aipw.ate, 4),
          "mean_treated_ipw" -> rnd(ipw.meanTreated, 4),
          "mean_control_ipw" -> rnd(ipw.meanControl, 4)),
        Seq("n" -> ipw.n))
    },
    Some {
      s"""WITH RECURSIVE src AS (
         |  SELECT l_quantity::DOUBLE AS x,
         |         CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END AS y,
         |         l_extendedprice::DOUBLE AS yy
         |  FROM lineitem),
         |${OracleSql.logisticIrls2("src")},
         |sc AS (SELECT src.x, src.y, src.yy,
         |         least(greatest(
         |           1.0/(1.0 + exp(-least(greatest(f.b0 + src.x*f.b1, -30.0), 30.0))),
         |           0.01), 0.99) AS e
         |       FROM src, fin f),
         |ipw AS (SELECT sum(y*yy/e) AS ty, sum(y/e) AS tw,
         |          sum((1.0 - y)*yy/(1.0 - e)) AS cy,
         |          sum((1.0 - y)/(1.0 - e)) AS cw,
         |          count(*)::BIGINT AS n
         |        FROM sc),
         |o1 AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(yy) AS sy,
         |         sum(x*x) AS sxx, sum(x*yy) AS sxy FROM sc WHERE y = 1.0),
         |c1 AS (SELECT (n*sxy - sx*sy)/(n*sxx - sx*sx) AS sl,
         |         (sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n AS ic FROM o1),
         |o0 AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(yy) AS sy,
         |         sum(x*x) AS sxx, sum(x*yy) AS sxy FROM sc WHERE y = 0.0),
         |c0 AS (SELECT (n*sxy - sx*sy)/(n*sxx - sx*sx) AS sl,
         |         (sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n AS ic FROM o0),
         |aipw AS (SELECT
         |    sum(f1 - f0 + y*(yy - f1)/e - (1.0 - y)*(yy - f0)/(1.0 - e))
         |      / count(*) AS ate
         |  FROM (SELECT sc.*, c1.ic + sc.x*c1.sl AS f1, c0.ic + sc.x*c0.sl AS f0
         |        FROM sc, c1, c0))
         |SELECT round(ipw.ty/ipw.tw - ipw.cy/ipw.cw, 4) AS ate_ipw,
         |  round(aipw.ate, 4) AS ate_aipw,
         |  round(ipw.ty/ipw.tw, 4) AS mean_treated_ipw,
         |  round(ipw.cy/ipw.cw, 4) AS mean_control_ipw,
         |  ipw.n
         |FROM ipw, aipw""".stripMargin
    }
  )

  // ---- C51: Driscoll–Kraay serial+cross-sectional robust SE (FULL
  // oracle — per-period scores, Bartlett kernel, sandwich, all replayed
  // from the Cramer β) -------------------------------------------------

  val q163 = Q(
    "q163_driscoll_kraay",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = olsSimple(s, dir)
      val se = graft.ml.Diagnostics.seDriscollKraay(li, m, "l_extendedprice", "l_shipdate", maxLag = 2)
      scalarRow(
        s,
        Seq("se_dk_intercept" -> rnd(se(0), 4), "se_dk_qty" -> rnd(se(1), 4)),
        Seq("n" -> m.n))
    },
    Some(
      """WITH s AS (SELECT count(*)::DOUBLE AS n, sum(l_quantity) AS sx,
        |             sum(l_extendedprice) AS sy, sum(l_quantity*l_quantity) AS sxx,
        |             sum(l_quantity*l_extendedprice) AS sxy FROM lineitem),
        |b AS (SELECT (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
        |        (sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n AS b0,
        |        n, sx, sxx, n*sxx - sx*sx AS det FROM s),
        |u AS (SELECT l_shipdate AS t,
        |        l_extendedprice - b.b0 - b.b1*l_quantity AS u, l_quantity AS x
        |      FROM lineitem CROSS JOIN b),
        |h AS (SELECT t, sum(u) AS h0, sum(u*x) AS h1 FROM u GROUP BY t),
        |hl AS (SELECT h0, h1,
        |         lag(h0, 1) OVER w AS h0l1, lag(h1, 1) OVER w AS h1l1,
        |         lag(h0, 2) OVER w AS h0l2, lag(h1, 2) OVER w AS h1l2
        |       FROM h WINDOW w AS (ORDER BY t)),
        |g AS (SELECT sum(h0*h0) AS g000, sum(h0*h1) AS g001, sum(h1*h1) AS g011,
        |        sum(h0*COALESCE(h0l1, 0)) AS a00, sum(h0*COALESCE(h1l1, 0)) AS a01,
        |        sum(h1*COALESCE(h0l1, 0)) AS a10, sum(h1*COALESCE(h1l1, 0)) AS a11,
        |        sum(h0*COALESCE(h0l2, 0)) AS c00, sum(h0*COALESCE(h1l2, 0)) AS c01,
        |        sum(h1*COALESCE(h0l2, 0)) AS c10, sum(h1*COALESCE(h1l2, 0)) AS c11
        |      FROM hl),
        |m AS (SELECT g000 + (2.0/3.0)*(a00 + a00) + (1.0/3.0)*(c00 + c00) AS m00,
        |        g001 + (2.0/3.0)*(a01 + a10) + (1.0/3.0)*(c01 + c10) AS m01,
        |        g011 + (2.0/3.0)*(a11 + a11) + (1.0/3.0)*(c11 + c11) AS m11
        |      FROM g)
        |SELECT
        |  round(sqrt((b.sxx*b.sxx*m.m00 - 2.0*b.sxx*b.sx*m.m01 + b.sx*b.sx*m.m11)
        |    / (b.det*b.det)), 4) AS se_dk_intercept,
        |  round(sqrt((b.sx*b.sx*m.m00 - 2.0*b.sx*b.n*m.m01 + b.n*b.n*m.m11)
        |    / (b.det*b.det)), 4) AS se_dk_qty,
        |  b.n::BIGINT AS n
        |FROM m CROSS JOIN b""".stripMargin
    )
  )

  // ---- C52: Breusch–Pagan heteroskedasticity LM (FULL oracle —
  // n·corr²(x, u²) closed form) ----------------------------------------

  val q164 = Q(
    "q164_breusch_pagan",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = olsSimple(s, dir)
      val (lm, n) = graft.ml.Diagnostics.breuschPagan(li, m, "l_extendedprice")
      scalarRow(s, Seq("bp_lm" -> rnd(lm, 1)), Seq("n" -> n))
    },
    Some(
      """WITH s AS (SELECT count(*)::DOUBLE AS n, sum(l_quantity) AS sx,
        |             sum(l_extendedprice) AS sy, sum(l_quantity*l_quantity) AS sxx,
        |             sum(l_quantity*l_extendedprice) AS sxy FROM lineitem),
        |b AS (SELECT (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
        |        (sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n AS b0 FROM s),
        |z AS (SELECT l_quantity AS x,
        |        (l_extendedprice - b.b0 - b.b1*l_quantity)
        |          * (l_extendedprice - b.b0 - b.b1*l_quantity) AS z
        |      FROM lineitem CROSS JOIN b),
        |t AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(z) AS sz,
        |        sum(x*x) AS sxx, sum(z*z) AS szz, sum(x*z) AS sxz FROM z)
        |SELECT round(n*(n*sxz - sx*sz)*(n*sxz - sx*sz)
        |    / ((n*sxx - sx*sx)*(n*szz - sz*sz)), 1) AS bp_lm,
        |  n::BIGINT AS n FROM t""".stripMargin
    )
  )

  // ---- C53: Durbin–Watson over the ship-date total order (FULL oracle
  // — boundary-stitched range partitions ≡ one global lag window) ------

  val q165 = Q(
    "q165_durbin_watson",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val m = olsSimple(s, dir)
      val dw = graft.ml.Diagnostics.durbinWatson(
        li, m, "l_extendedprice", Seq("l_shipdate", "l_orderkey", "l_linenumber"))
      scalarRow(s, Seq("dw" -> rnd(dw, 6)), Seq("n" -> m.n))
    },
    Some(
      """WITH s AS (SELECT count(*)::DOUBLE AS n, sum(l_quantity) AS sx,
        |             sum(l_extendedprice) AS sy, sum(l_quantity*l_quantity) AS sxx,
        |             sum(l_quantity*l_extendedprice) AS sxy FROM lineitem),
        |b AS (SELECT (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
        |        (sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n AS b0 FROM s),
        |u AS (SELECT l_extendedprice - b.b0 - b.b1*l_quantity AS u,
        |        l_shipdate, l_orderkey, l_linenumber
        |      FROM lineitem CROSS JOIN b),
        |d AS (SELECT u, u - lag(u) OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) AS du
        |      FROM u)
        |SELECT round(sum(du*du)/sum(u*u), 6) AS dw, count(*)::BIGINT AS n FROM d""".stripMargin
    )
  )

  /** Round a driver-side double the same way Spark/DuckDB `round` does
    * (HALF_UP on the decimal representation).
    */
  private def rnd(v: Double, scale: Int): Double =
    BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- C100: probit GLM (FULL oracle — the IRLS loop replays via the
  // 2-parameter probit recursive CTE (OracleSql.probitIrls2: the shared
  // portable Φ polynomial, ±8 η clamp, same 2×2 pivot order and
  // relative-deviance stop), the logit comparator via the q268
  // logisticIrls2, information SE from the final pass's carried Gram.
  // GlmSpec still pins the multi-covariate dense-IRLS parity) -----------
  val q303 = Q(
    "q303_probit",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("lp", log(col("l_extendedprice")))
        .withColumn("ret", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
      val m = graft.ml.Glm.probit(li, "ret", Seq("lp"))
      val lg = graft.ml.Glm.logistic(li, "ret", Seq("lp"))
      scalarRow(
        s,
        Seq(
          "beta_lp" -> rnd(m.coef(1), 4),
          "se_info_lp" -> rnd(m.seInformation(1), 4),
          "deviance" -> rnd(m.deviance, 2),
          // the latent-scale link check: logit slopes ≈ 1.7× probit's
          "logit_probit_ratio" -> rnd(lg.coef(1) / m.coef(1), 3)
        ),
        Seq("n" -> m.n, "iters" -> m.iters.toLong,
          "converged" -> (if (m.converged) 1L else 0L))
      )
    },
    Some {
      s"""WITH RECURSIVE src AS (
         |  SELECT ln(l_extendedprice) AS x,
         |         CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
         |  FROM lineitem),
         |${OracleSql.probitIrls2("src")},
         |${OracleSql.logisticIrls2("src")}
         |SELECT round(pf.b1, 4) AS beta_lp,
         |  round(sqrt(pf.sa/(pf.sa*pf.sc - pf.sb*pf.sb)), 4) AS se_info_lp,
         |  round(pf.dev, 2) AS deviance,
         |  round(lf.b1/pf.b1, 3) AS logit_probit_ratio,
         |  (SELECT count(*) FROM src)::BIGINT AS n,
         |  pf.i::BIGINT AS iters,
         |  (CASE WHEN pf.done THEN 1 ELSE 0 END)::BIGINT AS converged
         |FROM pfin pf, fin lf""".stripMargin
    }
  )

  // ---- C101: Heckman two-step selection correction (FULL oracle —
  // stage 1 replays through the 3-parameter probit recursive CTE
  // (OracleSql.probitIrls3: per-pass Cramer 3×3, ulp-off from the
  // pivoted LinAlg but IRLS contracts to the same MLE), the inverse
  // Mills ratio is the row-local portable ϕ/Φ, and the outcome OLS is
  // a closed-form 3×3 Cramer on plain moments) --------------------------
  val q304 = Q(
    "q304_heckman",
    (s, dir) => {
      // outcome: log price on quantity, observed where a LATENT index
      // with REAL covariate signal crosses zero: (qty−25)/10 +
      // (disc−0.05)·20 + hash-uniform(−2,2) noise. The earlier
      // returnflag selection was nearly independent of the covariates,
      // so the fitted index was ~constant and (1, λ) near-perfectly
      // collinear — sum-order ulps amplified ~1e8× through the outcome
      // solve and straddled the 6dp quantizer at sf0.1 (r11 lesson:
      // an oracle needs a well-conditioned demonstration, not just a
      // replayable one). The md5-60 noise replays exactly; signal range
      // ±2.5 vs noise ±2 keeps selection informative but not separable.
      val li = Tables.lineitem(s, dir)
        .withColumn("lp", log(col("l_extendedprice")))
        .withColumn("u",
          pmod(graft.functions.SharedHash.md5Long60(
            (col("l_orderkey") * 10 + col("l_linenumber")).cast("string")),
            lit(1000L)).cast("double") / 1000.0)
        .withColumn("sel",
          when(
            (col("l_quantity") - 25.0) / 10.0 + (col("l_discount") - 0.05) * 20.0 +
              (col("u") - 0.5) * 4.0 > 0.0, 1.0).otherwise(0.0))
      graft.ml.Heckman.twoStep(
        li, "lp", Seq("l_quantity"), "sel", Seq("l_quantity", "l_discount"))
        .orderBy("stage", "name")
    },
    Some {
      val phiE = graft.functions.NormalDist.phiSql("e")
      val C = graft.functions.NormalDist.INV_SQRT_2PI
      val h = graft.functions.SharedHash.md5Long60Sql(
        "(l_orderkey*10 + l_linenumber)::VARCHAR")
      s"""WITH RECURSIVE src AS (
         |  SELECT l_quantity::DOUBLE AS x1, l_discount::DOUBLE AS x2,
         |         CASE WHEN (l_quantity - 25.0)/10.0 + (l_discount - 0.05)*20.0 +
         |             ((($h % 1000)::DOUBLE)/1000.0 - 0.5)*4.0 > 0.0
         |           THEN 1.0 ELSE 0.0 END AS y,
         |         ln(l_extendedprice) AS lp
         |  FROM lineitem),
         |${OracleSql.probitIrls3("src", tol = 1e-12, maxIter = 60)},
         |sc AS (SELECT lp, x1, ($C*exp(-(e*e)/2.0))/greatest($phiE, 1e-12) AS imr
         |       FROM (SELECT src.lp, src.x1,
         |               least(greatest(f.b0 + src.x1*f.b1 + src.x2*f.b2, -8.0), 8.0)
         |                 AS e
         |             FROM src, p3fin f WHERE src.y > 0.5)),
         |m AS (SELECT count(*)::DOUBLE AS m11, sum(x1) AS m12, sum(imr) AS m13,
         |        sum(x1*x1) AS m22, sum(x1*imr) AS m23, sum(imr*imr) AS m33,
         |        sum(lp) AS d1, sum(x1*lp) AS d2, sum(imr*lp) AS d3
         |      FROM sc),
         |ofit AS (SELECT ob0, ob1, ob2
         |  FROM ${OracleSql.pivotSolve3("m",
                 "m11", "m12", "m13", "m22", "m23", "m33",
                 "d1", "d2", "d3", "ob0", "ob1", "ob2")})
         |SELECT stage, name, floor(coef*1e6 + 0.5)/1e6 AS coef FROM (
         |  SELECT 'selection' AS stage, '(intercept)' AS name, b0 AS coef FROM p3fin
         |  UNION ALL SELECT 'selection', 'l_quantity', b1 FROM p3fin
         |  UNION ALL SELECT 'selection', 'l_discount', b2 FROM p3fin
         |  UNION ALL SELECT 'outcome', '(intercept)', ob0 FROM ofit
         |  UNION ALL SELECT 'outcome', 'l_quantity', ob1 FROM ofit
         |  UNION ALL SELECT 'outcome', 'lambda', ob2 FROM ofit)
         |ORDER BY stage, name""".stripMargin
    }
  )

  // ---- C102: Tobit censored regression (FULL oracle — the Newton
  // loop in Olsen's (δ,γ) replays as a recursive CTE seeded with the
  // Cramer OLS init (row i=0): per pass, the ten moment sums as global
  // window sums over the arithmetic-blend row terms (already
  // engine-stable — the q305 JIT lesson), the 3×3 Newton solve as
  // closed-form Cramer determinants (ulp-off from LinAlg's pivot order;
  // Newton contracts to the same MLE), same step/ll stop. GlmSpec
  // still pins planted-parameter recovery) ------------------------------
  val q305 = Q(
    "q305_tobit",
    (s, dir) => {
      // censored-by-construction outcome with a REAL slope in the
      // regressor and discount supplying the independent noise:
      // y = max(0, (qty − 20)/10 + 20·(disc − 0.05)), fit on quantity
      val li = Tables.lineitem(s, dir)
        .withColumn("ylat",
          greatest(lit(0.0),
            (col("l_quantity") - lit(20.0)) / lit(10.0) +
              (col("l_discount") - lit(0.05)) * lit(20.0)))
      val m = graft.ml.Tobit.fit(li, "ylat", Seq("l_quantity"), lower = 0.0)
      graft.ml.Tobit.summary(s, m).orderBy("name")
    },
    Some {
      val phi = graft.functions.NormalDist.phiSql("c")
      val C = graft.functions.NormalDist.INV_SQRT_2PI
      val lnC = math.log(graft.functions.NormalDist.INV_SQRT_2PI)
      s"""WITH RECURSIVE base AS (
         |  SELECT greatest(0.0, (l_quantity - 20.0)/10.0 + (l_discount - 0.05)*20.0) AS y,
         |         l_quantity::DOUBLE AS x
         |  FROM lineitem),
         |u0 AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
         |         sum(x*x) AS sxx, sum(x*y) AS sxy FROM base WHERE y > 0.0),
         |ini AS (SELECT (n*sxy - sx*sy)/(n*sxx - sx*sx) AS b1,
         |          (sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n AS b0, n FROM u0),
         |rv AS (SELECT greatest(
         |          sum((y - (ini.b0 + x*ini.b1))*(y - (ini.b0 + x*ini.b1)))/ini.n, 1e-8)
         |          AS v
         |        FROM base, ini WHERE y > 0.0 GROUP BY ini.n),
         |tit AS (
         |  SELECT 0 AS i, ini.b0*(1.0/sqrt(rv.v)) AS d0, ini.b1*(1.0/sqrt(rv.v)) AS d1,
         |    1.0/sqrt(rv.v) AS gam, CAST('-infinity' AS DOUBLE) AS ll, false AS done
         |  FROM ini, rv
         |  UNION ALL
         |  SELECT i + 1,
         |    d0 + s0, d1 + s1, greatest(gam + s2, 1e-10), llnow,
         |    greatest(abs(s0), greatest(abs(s1), abs(s2))) < 1e-8
         |      AND abs(llnow - llprev) < 1e-10*(1.0 + abs(llnow))
         |  FROM (
         |    SELECT w.*,
         |      (g0*(dd*f - e*e) - b*(g1*f - e*g2) + c2*(g1*e - dd*g2))/det AS s0,
         |      (a*(g1*f - e*g2) - g0*(b*f - e*c2) + c2*(b*g2 - g1*c2))/det AS s1,
         |      (a*(dd*g2 - g1*e) - b*(b*g2 - g1*c2) + g0*(b*e - dd*c2))/det AS s2
         |    FROM (
         |      SELECT v.*,
         |        a*(dd*f - e*e) - b*(b*f - e*c2) + c2*(b*e - dd*c2) AS det
         |      FROM (
         |        SELECT u.*, -h00 AS a, -h01 AS b, -h02 AS c2,
         |               -h11 AS dd, -h12 AS e, -h22 AS f
         |        FROM (
         |          SELECT DISTINCT i, d0, d1, gam, llprev,
         |            llnow, g0, g1, g2, h00, h01, h11, h02, h12, h22
         |          FROM (
         |            SELECT i, d0, d1, gam, llprev,
         |              sum(llt) OVER () AS llnow,
         |              sum(gd*1.0) OVER () AS g0, sum(gd*x) OVER () AS g1,
         |              sum(gg) OVER () AS g2,
         |              sum(hdd*1.0*1.0) OVER () AS h00,
         |              sum(hdd*1.0*x) OVER () AS h01,
         |              sum(hdd*x*x) OVER () AS h11,
         |              sum(hdg*1.0) OVER () AS h02, sum(hdg*x) OVER () AS h12,
         |              sum(hgg) OVER () AS h22
         |            FROM (
         |              SELECT i, d0, d1, gam, llprev, x, y,
         |                cI*ln(cdf) + uI*(ln(gam) + $lnC - z*z/2.0) AS llt,
         |                cI*(-mr) + uI*z AS gd,
         |                cI*(mr*0.0) + uI*(1.0/gam - z*y) AS gg,
         |                cI*dm + uI*(-1.0) AS hdd,
         |                cI*((-dm)*0.0) + uI*y AS hdg,
         |                cI*(dm*0.0*0.0) + uI*((-1.0)/(gam*gam) - y*y) AS hgg
         |              FROM (
         |                SELECT t.*, -(c*mr + mr*mr) AS dm FROM (
         |                  SELECT s.*, pdf/cdf AS mr FROM (
         |                    SELECT r.*,
         |                      $C*exp(-(c*c)/2.0) AS pdf,
         |                      greatest($phi, 1e-300) AS cdf
         |                    FROM (
         |                      SELECT p.*,
         |                        least(greatest(0.0 - xdelta, -8.0), 8.0) AS c,
         |                        gam*y - xdelta AS z
         |                      FROM (
         |                        SELECT q.i, q.d0, q.d1, q.gam, q.ll AS llprev,
         |                          d.x, d.y,
         |                          CASE WHEN d.y <= 0.0 THEN 1.0 ELSE 0.0 END AS cI,
         |                          1.0 - (CASE WHEN d.y <= 0.0 THEN 1.0 ELSE 0.0 END)
         |                            AS uI,
         |                          1.0*q.d0 + d.x*q.d1 AS xdelta
         |                        FROM tit q, base d WHERE q.i < 50 AND NOT q.done) p
         |                    ) r
         |                  ) s
         |                ) t
         |              )
         |            )
         |          )
         |        ) u
         |      ) v
         |    ) w
         |  )
         |),
         |tfin AS (SELECT d0, d1, gam, i, done FROM tit
         |         WHERE i = (SELECT max(i) FROM tit)),
         |cnt AS (SELECT count(*)::BIGINT AS n,
         |          sum(CASE WHEN y <= 0.0 THEN 1 ELSE 0 END)::BIGINT AS ncens
         |        FROM base)
         |SELECT o.name, floor(o.coef*1e6 + 0.5)/1e6 AS coef,
         |  floor((1.0/tfin.gam)*1e6 + 0.5)/1e6 AS sigma,
         |  cnt.n, cnt.ncens AS n_censored, tfin.i::INT AS iters,
         |  (CASE WHEN tfin.done THEN 1 ELSE 0 END)::INT AS converged
         |FROM (SELECT '(intercept)' AS name, tfin.d0/tfin.gam AS coef FROM tfin
         |      UNION ALL
         |      SELECT 'l_quantity', tfin.d1/tfin.gam FROM tfin) o, tfin, cnt
         |ORDER BY o.name""".stripMargin
    }
  )

  // ---- C103: ordered logit / proportional odds (rows-only: Newton
  // MLE; GlmSpec pins the J=2 ≡ logistic identity at 1e-7 and planted
  // 3-level recovery) --------------------------------------------------
  val q310 = Q(
    "q310_ordered_logit",
    (s, dir) => {
      // order priority is a 5-level ordinal scale ("1-URGENT" < … <
      // "5-LOW" in its own string order); model it on scaled price
      val o = Tables.orders(s, dir)
        .withColumn("xp", col("o_totalprice") / lit(100000.0))
      val m = graft.ml.OrderedLogit.fit(o, "o_orderpriority", Seq("xp"))
      graft.ml.OrderedLogit.summary(s, m).orderBy("kind", "name")
    },
    None
  )

  // ---- C104: multinomial (softmax) logit (rows-only: Newton MLE;
  // GlmSpec pins the J=2 ≡ logistic identity at 1e-7 and planted
  // 3-class recovery + share calibration) ------------------------------
  val q311 = Q(
    "q311_multinomial",
    (s, dir) => {
      // nominal outcome: return flag (A/N/R) on scaled price + discount
      val li = Tables.lineitem(s, dir)
        .withColumn("xp", col("l_extendedprice") / lit(100000.0))
      val m = graft.ml.Multinomial.fit(li, "l_returnflag", Seq("xp", "l_discount"))
      graft.ml.Multinomial.summary(s, m).orderBy("class", "name")
    },
    None
  )

  // ---- C107: one-way random-effects panel (Swamy–Arora FGLS) + the
  // Hausman FE-vs-RE test (FULL oracle — the ENTIRE estimator is
  // per-group-stat algebra: one groupBy + strata-sized reductions, so
  // the replay is the identical closed-form chain; the Hausman p
  // mirrors the portable-Φ tail 2·(pdf·poly) in the same Horner
  // order) ---------------------------------------------------------------
  val q316 = Q(
    "q316_random_effects",
    (s, dir) => {
      val m = graft.ml.RandomEffects.fit(
        Tables.lineitem(s, dir), "l_extendedprice", "l_quantity", "l_suppkey")
      graft.ml.RandomEffects.summary(s, m)
    },
    Some {
      import graft.functions.NormalDist._
      s"""WITH g AS (SELECT l_suppkey, count(*)::DOUBLE AS tn,
         |    sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
         |    sum(l_quantity*l_quantity) AS sxx,
         |    sum(l_quantity*l_extendedprice) AS sxy,
         |    sum(l_extendedprice*l_extendedprice) AS syy
         |  FROM lineitem GROUP BY 1),
         |r1 AS (SELECT sum(tn) AS n, count(*)::DOUBLE AS gc,
         |    sum(sxx - sx*sx/tn) AS wxx,
         |    sum(sxy - sx*sy/tn) AS wxy,
         |    sum(syy - sy*sy/tn) AS wyy,
         |    sum(sx/tn) AS bsx, sum(sy/tn) AS bsy,
         |    sum((sx/tn)*(sx/tn)) AS bsxx,
         |    sum((sx/tn)*(sy/tn)) AS bsxy,
         |    sum((sy/tn)*(sy/tn)) AS bsyy,
         |    sum(1.0/tn) AS sinvt
         |  FROM g),
         |c1 AS (SELECT r1.*,
         |    wxy/wxx AS bfe,
         |    (wyy - (wxy/wxx)*wxy)/(n - gc - 1.0) AS sige2,
         |    bsxx - bsx*bsx/gc AS bvxx, bsxy - bsx*bsy/gc AS bvxy,
         |    bsyy - bsy*bsy/gc AS bvyy
         |  FROM r1),
         |c2 AS (SELECT c1.*,
         |    greatest(0.0,
         |      (bvyy - (bvxy/bvxx)*bvxy)/(gc - 2.0) - sige2/(gc/sinvt)) AS sigu2
         |  FROM c1),
         |gt AS (SELECT g.*,
         |    1.0 - sqrt(c2.sige2/(g.tn*c2.sigu2 + c2.sige2)) AS th
         |  FROM g, c2),
         |r2a AS (SELECT
         |    sum(sxx - (2.0*th - th*th)*sx*sx/tn) AS txx,
         |    sum(sxy - (2.0*th - th*th)*sx*sy/tn) AS txy,
         |    sum(syy - (2.0*th - th*th)*sy*sy/tn) AS tyy,
         |    sum((1.0 - th)*(1.0 - th)*sx) AS tix,
         |    sum((1.0 - th)*(1.0 - th)*sy) AS tiy,
         |    sum(tn*(1.0 - th)*(1.0 - th)) AS tii,
         |    min(th) AS thmin, max(th) AS thmax
         |  FROM gt),
         |r2 AS (SELECT r2a.*, c2.* FROM r2a, c2),
         |fin AS (SELECT r2.*,
         |    (tii*txy - tix*tiy)/(tii*txx - tix*tix) AS bre
         |  FROM r2),
         |f2 AS (SELECT fin.*, (tiy - bre*tix)/tii AS are FROM fin),
         |f4 AS (SELECT f2.*,
         |    sige2/wxx - sige2*tii/(tii*txx - tix*tix) AS dvar
         |  FROM f2),
         |f5 AS (SELECT f4.*,
         |    CASE WHEN dvar > 0 THEN (bfe - bre)*(bfe - bre)/dvar END AS h
         |  FROM f4),
         |f6 AS (SELECT f5.*, sqrt(h) AS z, 1.0/(1.0 + $P*sqrt(h)) AS t FROM f5)
         |SELECT
         |  floor(bre*1e6 + 0.5)/1e6 AS b_re,
         |  floor(are*1e6 + 0.5)/1e6 AS icept_re,
         |  floor(bfe*1e6 + 0.5)/1e6 AS b_fe,
         |  floor(sqrt(sigu2)*1e6 + 0.5)/1e6 AS sigma_u,
         |  floor(sqrt(sige2)*1e6 + 0.5)/1e6 AS sigma_e,
         |  floor(thmin*1e6 + 0.5)/1e6 AS theta_min,
         |  floor(thmax*1e6 + 0.5)/1e6 AS theta_max,
         |  floor(h*1e6 + 0.5)/1e6 AS hausman,
         |  floor((2.0*(($INV_SQRT_2PI*exp(-(z*z)/2.0))
         |    *(t*($B1 + t*($B2 + t*($B3 + t*($B4 + t*$B5)))))))*1e6 + 0.5)/1e6
         |    AS p_hausman,
         |  CAST(n AS BIGINT) AS n, CAST(gc AS BIGINT) AS groups
         |FROM f6""".stripMargin
    }
  )

  // ---- C107b: TWO-regressor random-effects panel + k-dim Hausman
  // (FULL oracle — the centered/intercept-eliminated chain makes every
  // 2×2 solve a Cramer closed form, and the χ²(2) upper tail is exactly
  // e^(−H/2), so the WHOLE k-dim estimator replays in SQL) ---------------
  val q326 = Q(
    "q326_random_effects_k2",
    (s, dir) => {
      val m = graft.ml.RandomEffects.fit(
        Tables.lineitem(s, dir), "l_extendedprice",
        Seq("l_quantity", "l_discount"), "l_suppkey")
      graft.ml.RandomEffects.summaryK(s, m).orderBy("name")
    },
    Some {
      s"""WITH g AS (SELECT l_suppkey, count(*)::DOUBLE AS tn,
         |    sum(l_extendedprice) AS sy,
         |    sum(l_extendedprice*l_extendedprice) AS syy,
         |    sum(l_quantity) AS sx1, sum(l_discount) AS sx2,
         |    sum(l_quantity*l_extendedprice) AS sxy1,
         |    sum(l_discount*l_extendedprice) AS sxy2,
         |    sum(l_quantity*l_quantity) AS sxx11,
         |    sum(l_quantity*l_discount) AS sxx12,
         |    sum(l_discount*l_discount) AS sxx22
         |  FROM lineitem GROUP BY 1),
         |r1 AS (SELECT sum(tn) AS n, count(*)::DOUBLE AS gc, sum(1.0/tn) AS sinvt,
         |    sum(syy - sy*sy/tn) AS wyy,
         |    sum(sy/tn) AS bsy, sum((sy/tn)*(sy/tn)) AS bsyy,
         |    sum(sxy1 - sx1*sy/tn) AS wxy1, sum(sxy2 - sx2*sy/tn) AS wxy2,
         |    sum(sxx11 - sx1*sx1/tn) AS wxx11,
         |    sum(sxx12 - sx1*sx2/tn) AS wxx12,
         |    sum(sxx22 - sx2*sx2/tn) AS wxx22,
         |    sum(sx1/tn) AS bsx1, sum(sx2/tn) AS bsx2,
         |    sum((sx1/tn)*(sy/tn)) AS bsxy1, sum((sx2/tn)*(sy/tn)) AS bsxy2,
         |    sum((sx1/tn)*(sx1/tn)) AS bsxx11,
         |    sum((sx1/tn)*(sx2/tn)) AS bsxx12,
         |    sum((sx2/tn)*(sx2/tn)) AS bsxx22
         |  FROM g),
         |c1 AS (SELECT r1.*,
         |    wxx11*wxx22 - wxx12*wxx12 AS detw,
         |    (wxx22*wxy1 - wxx12*wxy2)/(wxx11*wxx22 - wxx12*wxx12) AS bfe1,
         |    (wxx11*wxy2 - wxx12*wxy1)/(wxx11*wxx22 - wxx12*wxx12) AS bfe2,
         |    bsxx11 - bsx1*bsx1/gc AS bv11, bsxx12 - bsx1*bsx2/gc AS bv12,
         |    bsxx22 - bsx2*bsx2/gc AS bv22,
         |    bsxy1 - bsx1*bsy/gc AS bvy1, bsxy2 - bsx2*bsy/gc AS bvy2,
         |    bsyy - bsy*bsy/gc AS bvyy
         |  FROM r1),
         |c2 AS (SELECT c1.*,
         |    (wyy - bfe1*wxy1 - bfe2*wxy2)/(n - gc - 2.0) AS sige2,
         |    bv11*bv22 - bv12*bv12 AS detb,
         |    (bv22*bvy1 - bv12*bvy2)/(bv11*bv22 - bv12*bv12) AS bb1,
         |    (bv11*bvy2 - bv12*bvy1)/(bv11*bv22 - bv12*bv12) AS bb2
         |  FROM c1),
         |c3 AS (SELECT c2.*,
         |    greatest(0.0,
         |      (bvyy - bb1*bvy1 - bb2*bvy2)/(gc - 3.0) - sige2/(gc/sinvt)) AS sigu2
         |  FROM c2),
         |gt AS (SELECT g.*, c3.sige2, c3.sigu2, c3.n, c3.gc,
         |    c3.bfe1, c3.bfe2, c3.detw, c3.wxx11, c3.wxx12, c3.wxx22,
         |    1.0 - sqrt(c3.sige2/(g.tn*c3.sigu2 + c3.sige2)) AS th
         |  FROM g, c3),
         |r2 AS (SELECT any_value(sige2) AS sige2, any_value(sigu2) AS sigu2,
         |    any_value(n) AS n, any_value(gc) AS gc,
         |    any_value(bfe1) AS bfe1, any_value(bfe2) AS bfe2,
         |    any_value(detw) AS detw, any_value(wxx11) AS wxx11,
         |    any_value(wxx12) AS wxx12, any_value(wxx22) AS wxx22,
         |    sum(sxy1 - (2.0*th - th*th)*sx1*sy/tn) AS txy1,
         |    sum(sxy2 - (2.0*th - th*th)*sx2*sy/tn) AS txy2,
         |    sum(sxx11 - (2.0*th - th*th)*sx1*sx1/tn) AS txx11,
         |    sum(sxx12 - (2.0*th - th*th)*sx1*sx2/tn) AS txx12,
         |    sum(sxx22 - (2.0*th - th*th)*sx2*sx2/tn) AS txx22,
         |    sum((1.0 - th)*(1.0 - th)*sx1) AS tix1,
         |    sum((1.0 - th)*(1.0 - th)*sx2) AS tix2,
         |    sum((1.0 - th)*(1.0 - th)*sy) AS tiy,
         |    sum(tn*(1.0 - th)*(1.0 - th)) AS tii,
         |    min(th) AS thmin, max(th) AS thmax
         |  FROM gt),
         |f1 AS (SELECT r2.*,
         |    txx11 - tix1*tix1/tii AS tc11, txx12 - tix1*tix2/tii AS tc12,
         |    txx22 - tix2*tix2/tii AS tc22,
         |    txy1 - tix1*tiy/tii AS ty1, txy2 - tix2*tiy/tii AS ty2
         |  FROM r2),
         |f2 AS (SELECT f1.*,
         |    tc11*tc22 - tc12*tc12 AS dett,
         |    (tc22*ty1 - tc12*ty2)/(tc11*tc22 - tc12*tc12) AS bre1,
         |    (tc11*ty2 - tc12*ty1)/(tc11*tc22 - tc12*tc12) AS bre2
         |  FROM f1),
         |f3 AS (SELECT f2.*,
         |    (tiy - bre1*tix1 - bre2*tix2)/tii AS are,
         |    sige2*wxx22/detw - sige2*tc22/dett AS dv11,
         |    -sige2*wxx12/detw + sige2*tc12/dett AS dv12,
         |    sige2*wxx11/detw - sige2*tc11/dett AS dv22,
         |    bfe1 - bre1 AS d1, bfe2 - bre2 AS d2
         |  FROM f2),
         |f4 AS (SELECT f3.*,
         |    CASE WHEN dv11 > 0 AND dv22 > 0
         |           AND dv11*dv22 - dv12*dv12 <> 0
         |           AND (d1*(dv22*d1 - dv12*d2) + d2*(dv11*d2 - dv12*d1))
         |             /(dv11*dv22 - dv12*dv12) > 0
         |      THEN (d1*(dv22*d1 - dv12*d2) + d2*(dv11*d2 - dv12*d1))
         |             /(dv11*dv22 - dv12*dv12) END AS h
         |  FROM f3),
         |names(name, ord) AS (VALUES ('l_quantity', 1), ('l_discount', 2))
         |SELECT name,
         |  floor((CASE WHEN ord = 1 THEN bre1 ELSE bre2 END)*1e6 + 0.5)/1e6 AS b_re,
         |  floor((CASE WHEN ord = 1 THEN bfe1 ELSE bfe2 END)*1e6 + 0.5)/1e6 AS b_fe,
         |  floor(are*1e6 + 0.5)/1e6 AS icept_re,
         |  floor(sqrt(sigu2)*1e6 + 0.5)/1e6 AS sigma_u,
         |  floor(sqrt(sige2)*1e6 + 0.5)/1e6 AS sigma_e,
         |  floor(thmin*1e6 + 0.5)/1e6 AS theta_min,
         |  floor(thmax*1e6 + 0.5)/1e6 AS theta_max,
         |  floor(h*1e6 + 0.5)/1e6 AS hausman,
         |  2::INT AS hausman_df,
         |  floor(exp(-h/2.0)*1e6 + 0.5)/1e6 AS p_hausman,
         |  CAST(n AS BIGINT) AS n, CAST(gc AS BIGINT) AS groups
         |FROM f4, names
         |ORDER BY name""".stripMargin
    }
  )

  // ---- C108: Dickey–Fuller unit-root test (FULL oracle — the lag
  // pairs come from an equi-join on t−1, never a window; Cramer
  // slope/SE closed forms; the MacKinnon critical value ships as a
  // documented constant and the reject flag is an exact compare) --------
  val q317 = Q(
    "q317_dickey_fuller",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(floor(unix_timestamp(col("ts")) / 86400).as("day"))
        .agg(count(lit(1)).cast("double").as("n_events"))
      val r = graft.ml.UnitRoot.dickeyFuller(daily, "day", "n_events")
      graft.ml.UnitRoot.summary(s, r)
    },
    Some(
      """WITH d AS (SELECT floor(epoch(ts)/86400)::BIGINT AS day,
        |             count(*)::DOUBLE AS y FROM events GROUP BY 1),
        |p AS (SELECT c.y - l.y AS dd, l.y AS x
        |      FROM d c JOIN (SELECT day + 1 AS day, y FROM d) l USING (day)),
        |m AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(dd) AS sd,
        |        sum(x*x) AS sxx, sum(x*dd) AS sxd, sum(dd*dd) AS sdd FROM p),
        |b AS (SELECT m.*, (n*sxd - sx*sd)/(n*sxx - sx*sx) AS rho FROM m),
        |a AS (SELECT b.*, (sd - rho*sx)/n AS drift FROM b),
        |s AS (SELECT a.*,
        |        sqrt((greatest(sdd - drift*sd - rho*sxd, 0.0)/(n - 2.0))
        |             * n/(n*sxx - sx*sx)) AS se
        |      FROM a)
        |SELECT floor(rho*1e6 + 0.5)/1e6 AS rho,
        |  floor((rho/se)*1e6 + 0.5)/1e6 AS t_stat,
        |  floor(drift*1e6 + 0.5)/1e6 AS drift,
        |  n::BIGINT AS n_obs,
        |  -2.8621::DOUBLE AS crit_5pct,
        |  (CASE WHEN rho/se < -2.8621 THEN 1 ELSE 0 END)::INT AS reject_5pct
        |FROM s""".stripMargin
    )
  )

  // ---- C109: sharp regression discontinuity (FULL oracle — one
  // conditional weighted-moment aggregate, both sides' local-linear
  // fits as Cramer closed forms; the outcome carries a PLANTED +5000
  // jump at the cutoff so τ is real, not a zero-test) -------------------
  val q318 = Q(
    "q318_rdd",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("y_j",
          col("l_extendedprice") + when(col("l_quantity") >= 25.0, 5000.0).otherwise(0.0))
      graft.ml.Causal.rdd(li, "y_j", "l_quantity", cutoff = 25.0, bandwidth = 15.0)
    },
    Some(
      """WITH b AS (SELECT l_extendedprice
        |      + (CASE WHEN l_quantity >= 25.0 THEN 5000.0 ELSE 0.0 END) AS y,
        |    l_quantity - 25.0 AS r,
        |    1.0 - abs(l_quantity - 25.0)/15.0 AS w,
        |    CASE WHEN l_quantity - 25.0 >= 0 THEN 1.0 ELSE 0.0 END AS ri
        |  FROM lineitem WHERE abs(l_quantity - 25.0) <= 15.0),
        |m AS (SELECT
        |    sum((1.0 - ri)*w) AS lw, sum((1.0 - ri)*w*r) AS lwx,
        |    sum((1.0 - ri)*w*r*r) AS lwxx, sum((1.0 - ri)*w*y) AS lwy,
        |    sum((1.0 - ri)*w*r*y) AS lwxy, sum(1.0 - ri)::BIGINT AS ln,
        |    sum(ri*w) AS rw, sum(ri*w*r) AS rwx,
        |    sum(ri*w*r*r) AS rwxx, sum(ri*w*y) AS rwy,
        |    sum(ri*w*r*y) AS rwxy, sum(ri)::BIGINT AS rn
        |  FROM b),
        |f AS (SELECT
        |    (lw*lwxy - lwx*lwy)/(lw*lwxx - lwx*lwx) AS bl,
        |    (rw*rwxy - rwx*rwy)/(rw*rwxx - rwx*rwx) AS br,
        |    m.* FROM m),
        |f2 AS (SELECT (lwy - bl*lwx)/lw AS al, (rwy - br*rwx)/rw AS ar, f.* FROM f)
        |SELECT floor((ar - al)*1e6 + 0.5)/1e6 AS tau,
        |  floor(al*1e6 + 0.5)/1e6 AS icept_left,
        |  floor(ar*1e6 + 0.5)/1e6 AS icept_right,
        |  floor(bl*1e6 + 0.5)/1e6 AS slope_left,
        |  floor(br*1e6 + 0.5)/1e6 AS slope_right,
        |  ln AS n_left, rn AS n_right,
        |  25.0::DOUBLE AS cutoff, 15.0::DOUBLE AS bandwidth
        |FROM f2""".stripMargin
    )
  )

  // ---- C111: KPSS stationarity test (FULL oracle — demeaned partial
  // sums via the prefix machinery, Bartlett long-run variance from one
  // lag join per l, closed forms; the null is FLIPPED vs C108's DF —
  // running both is the standard pre-forecast certificate) --------------
  val q325 = Q(
    "q325_kpss",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(floor(unix_timestamp(col("ts")) / 86400).as("day"))
        .agg(count(lit(1)).cast("double").as("n_events"))
      val r = graft.ml.UnitRoot.kpss(daily, "day", "n_events", lags = 4)
      graft.ml.UnitRoot.kpssSummary(s, r)
    },
    Some {
      val gl = (1 to 4).map { l =>
        s"""g$l AS (SELECT coalesce(sum(a.e*b.e), 0.0) AS g FROM e a
           |  JOIN (SELECT t + $l AS t, e FROM e) b USING (t))""".stripMargin
      }.mkString(",\n")
      val sig = "r0.g0/(SELECT n FROM m)" + (1 to 4).map { l =>
        s" + 2.0*(1.0 - $l.0/5.0)*((SELECT g FROM g$l)/(SELECT n FROM m))"
      }.mkString
      s"""WITH d AS (SELECT floor(epoch(ts)/86400)::BIGINT AS day,
         |    count(*)::DOUBLE AS y FROM events GROUP BY 1),
         |m AS (SELECT count(*)::DOUBLE AS n, sum(y) AS sy FROM d),
         |e AS (SELECT day AS t, y - (SELECT sy/n FROM m) AS e FROM d),
         |c AS (SELECT t, e, sum(e) OVER (ORDER BY t
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM e),
         |r0 AS (SELECT sum(s*s) AS ss, sum(e*e) AS g0 FROM c),
         |$gl,
         |sg AS (SELECT $sig AS sigma2 FROM r0)
         |SELECT
         |  floor((r0.ss/((SELECT n FROM m)*(SELECT n FROM m)*sg.sigma2))*1e6 + 0.5)/1e6
         |    AS kpss_stat,
         |  floor(sg.sigma2*1e6 + 0.5)/1e6 AS sigma2_lr,
         |  (SELECT n FROM m)::BIGINT AS n_obs, 4 AS lags,
         |  0.463::DOUBLE AS crit_5pct,
         |  (CASE WHEN r0.ss/((SELECT n FROM m)*(SELECT n FROM m)*sg.sigma2) > 0.463
         |    THEN 1 ELSE 0 END)::INT AS reject_5pct
         |FROM r0, sg""".stripMargin
    }
  )

  // ---- C112: Ljung–Box white-noise portmanteau (FULL oracle — one
  // t−k equi-join per lag like q325's Bartlett terms, the exact
  // ascending Q accumulation, and the χ²(6) tail's even-df recurrence
  // unrolled in the same IEEE order as NormalDist.chiSqUpperTail) ------
  val q327 = Q(
    "q327_ljung_box",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(floor(unix_timestamp(col("ts")) / 86400).as("day"))
        .agg(count(lit(1)).cast("double").as("n_events"))
      val r = graft.ml.UnitRoot.ljungBox(daily, "day", "n_events", lags = 6)
      graft.ml.UnitRoot.ljungBoxSummary(s, r)
    },
    Some {
      val lagTerms = (1 to 6).map { k =>
        s"""g$k AS (SELECT coalesce(sum(a.e*b.e), 0.0) AS g
           |  FROM e a JOIN (SELECT t + $k AS t, e FROM e) b USING (t))""".stripMargin
      }.mkString(",\n")
      val qSum = (1 to 6).map(k =>
        s"((SELECT g FROM g$k)/g0.g0)*((SELECT g FROM g$k)/g0.g0)/(m.n - $k.0)")
        .mkString(" + ")
      s"""WITH d AS (SELECT floor(epoch(ts)/86400)::BIGINT AS t,
         |             count(*)::DOUBLE AS y FROM events GROUP BY 1),
         |m AS (SELECT count(*)::DOUBLE AS n, sum(y) AS sy FROM d),
         |e AS (SELECT t, y - (SELECT sy/n FROM m) AS e FROM d),
         |g0 AS (SELECT sum(e*e) AS g0 FROM e),
         |$lagTerms,
         |st AS (SELECT m.n, m.n*(m.n + 2.0)*($qSum) AS stat FROM m, g0),
         |pt AS (SELECT st.*, exp(-stat/2.0) AS ex FROM st),
         |pv AS (SELECT pt.*,
         |    least(1.0, greatest(0.0,
         |      ex + ex*(stat/2.0) + (ex*(stat/2.0))*(stat/4.0))) AS p
         |  FROM pt)
         |SELECT floor(stat*1e6 + 0.5)/1e6 AS q_stat, 6::INT AS lags,
         |  CAST(n AS BIGINT) AS n_obs, floor(p*1e6 + 0.5)/1e6 AS p_value,
         |  (CASE WHEN p < 0.05 THEN 1 ELSE 0 END)::INT AS reject_5pct
         |FROM pv""".stripMargin
    }
  )

  // ---- C113: Newey–West HAC standard errors for a trend regression
  // (FULL oracle — OLS via the replayed 2×2 pivot solve, Γ0 one pass,
  // each Γ_l a t−l equi-join reduced to the 2×2 meat, Bartlett fold in
  // ascending-l order, bread/meat/bread closed forms) ------------------
  val q328 = Q(
    "q328_newey_west",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(floor(unix_timestamp(col("ts")) / 86400).as("day"))
        .agg(count(lit(1)).cast("double").as("n_events"))
      val d0 = daily.agg(min(col("day"))).head().getLong(0)
      val idx = daily.withColumn("tidx", (col("day") - d0).cast("double"))
      val m = graft.ml.Hac.neweyWest(idx, "day", "n_events", Seq("tidx"), lags = 4)
      graft.ml.Hac.summary(s, m).orderBy("name")
    },
    Some {
      // per-lag Γ_l moments: x_t(0)=1, x_t(1)=t — γij = Σ u_t·u_{t−l}·x_t(i)·x_{t−l}(j)
      val lagG = (1 to 4).map { l =>
        s"""nw$l AS (SELECT
           |    coalesce(sum(a.u*b.u), 0.0) AS g00,
           |    coalesce(sum(a.u*b.u*b.x), 0.0) AS g01,
           |    coalesce(sum(a.u*b.u*a.x), 0.0) AS g10,
           |    coalesce(sum(a.u*b.u*a.x*b.x), 0.0) AS g11
           |  FROM u a JOIN (SELECT t + $l AS t, u, x FROM u) b USING (t))""".stripMargin
      }.mkString(",\n")
      def w(l: Int) = s"(1.0 - $l.0/5.0)"
      val s00 = "s000" + (1 to 4).map(l => s" + ${w(l)}*((SELECT g00 FROM nw$l) + (SELECT g00 FROM nw$l))").mkString
      val s01 = "s010" + (1 to 4).map(l => s" + ${w(l)}*((SELECT g01 FROM nw$l) + (SELECT g10 FROM nw$l))").mkString
      val s11 = "s110" + (1 to 4).map(l => s" + ${w(l)}*((SELECT g11 FROM nw$l) + (SELECT g11 FROM nw$l))").mkString
      s"""WITH d AS (SELECT floor(epoch(ts)/86400)::BIGINT AS day,
         |             count(*)::DOUBLE AS y FROM events GROUP BY 1),
         |dd AS (SELECT (day - (SELECT min(day) FROM d))::DOUBLE AS x, y,
         |         day AS t FROM d),
         |g AS (SELECT count(*)::DOUBLE AS g11r, sum(x) AS g12, sum(x*x) AS g22,
         |        sum(y) AS c1, sum(x*y) AS c2, sum(y*y) AS syy FROM dd),
         |b AS (SELECT g.*,
         |    CASE WHEN abs(g12) > abs(g11r) THEN g12 ELSE g11r END AS m00,
         |    CASE WHEN abs(g12) > abs(g11r) THEN g22 ELSE g12 END AS m01,
         |    CASE WHEN abs(g12) > abs(g11r) THEN c2 ELSE c1 END AS v0,
         |    CASE WHEN abs(g12) > abs(g11r) THEN g11r ELSE g12 END AS m10,
         |    CASE WHEN abs(g12) > abs(g11r) THEN g12 ELSE g22 END AS m11,
         |    CASE WHEN abs(g12) > abs(g11r) THEN c1 ELSE c2 END AS v1
         |  FROM g),
         |b2 AS (SELECT b.*,
         |    (v1 - (m10/m00)*v0)/(m11 - (m10/m00)*m01) AS b1 FROM b),
         |b3 AS (SELECT b2.*, (v0 - m01*b1)/m00 AS b0 FROM b2),
         |u AS (SELECT dd.t, dd.x, dd.y - (b3.b0 + b3.b1*dd.x) AS u FROM dd, b3),
         |g0m AS (SELECT sum(u*u) AS s000, sum(u*u*x) AS s010,
         |          sum(u*u*x*x) AS s110 FROM u),
         |$lagG,
         |sm AS (SELECT $s00 AS s00, $s01 AS s01, $s11 AS s11 FROM g0m),
         |fin AS (SELECT b3.*, sm.s00, sm.s01, sm.s11,
         |    g11r*g22 - g12*g12 AS det,
         |    (g22*g22*sm.s00 - 2.0*g22*g12*sm.s01 + g12*g12*sm.s11)
         |      /((g11r*g22 - g12*g12)*(g11r*g22 - g12*g12)) AS v00,
         |    (g12*g12*sm.s00 - 2.0*g12*g11r*sm.s01 + g11r*g11r*sm.s11)
         |      /((g11r*g22 - g12*g12)*(g11r*g22 - g12*g12)) AS v11,
         |    (syy - 2.0*(b0*c1 + b1*c2)
         |      + (b0*(g11r*b0 + g12*b1) + b1*(g12*b0 + g22*b1)))
         |      /(g11r - 2.0) AS sig2
         |  FROM b3, sm),
         |names(name, ord) AS (VALUES ('(intercept)', 0), ('tidx', 1))
         |SELECT name,
         |  floor((CASE ord WHEN 0 THEN b0 ELSE b1 END)*1e6 + 0.5)/1e6 AS coef,
         |  floor(sqrt(CASE ord WHEN 0 THEN v00 ELSE v11 END)*1e6 + 0.5)/1e6
         |    AS se_nw,
         |  floor(sqrt(sig2*(CASE ord WHEN 0 THEN g22 ELSE g11r END)/det)*1e6
         |    + 0.5)/1e6 AS se_ols,
         |  floor(((CASE ord WHEN 0 THEN b0 ELSE b1 END)
         |    /sqrt(CASE ord WHEN 0 THEN v00 ELSE v11 END))*1e6 + 0.5)/1e6 AS t_nw,
         |  4::INT AS lags, CAST(g11r AS BIGINT) AS n
         |FROM fin, names ORDER BY name""".stripMargin
    }
  )

  // ---- C114: Cochrane–Orcutt AR(1) FGLS (FULL oracle — the whole
  // iterate-ρ/quasi-difference/re-fit loop as a recursive CTE: the ρ
  // moment and the 2-param transformed normal equations are window
  // sums over the ONCE-built lag-pair frame, the 2×2 solve replays the
  // pivot order, the level intercept recovers as α*/(1−ρ), and the
  // final homoskedastic SE replays the Gram-identity SSR) --------------
  val q329 = Q(
    "q329_cochrane_orcutt",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(floor(unix_timestamp(col("ts")) / 86400).as("day"))
        .agg(count(lit(1)).cast("double").as("n_events"))
      val d0 = daily.agg(min(col("day"))).head().getLong(0)
      val idx = daily.withColumn("tidx", (col("day") - d0).cast("double"))
      val m = graft.ml.Hac.cochraneOrcutt(idx, "day", "n_events", "tidx")
      graft.ml.Hac.coSummary(s, m)
    },
    Some {
      s"""WITH RECURSIVE d AS (
         |  SELECT floor(epoch(ts)/86400)::BIGINT AS t,
         |         count(*)::DOUBLE AS y FROM events GROUP BY 1),
         |dd AS (SELECT t, y, (t - (SELECT min(t) FROM d))::DOUBLE AS x FROM d),
         |im AS (SELECT count(*)::DOUBLE AS g11, sum(x) AS g12, sum(x*x) AS g22,
         |         sum(y) AS c1, sum(x*y) AS c2 FROM dd),
         |ip AS (SELECT im.*,
         |    CASE WHEN abs(g12) > abs(g11) THEN g12 ELSE g11 END AS m00,
         |    CASE WHEN abs(g12) > abs(g11) THEN g22 ELSE g12 END AS m01,
         |    CASE WHEN abs(g12) > abs(g11) THEN c2 ELSE c1 END AS v0,
         |    CASE WHEN abs(g12) > abs(g11) THEN g11 ELSE g12 END AS m10,
         |    CASE WHEN abs(g12) > abs(g11) THEN g12 ELSE g22 END AS m11,
         |    CASE WHEN abs(g12) > abs(g11) THEN c1 ELSE c2 END AS v1
         |  FROM im),
         |ini AS (SELECT ib1, (v0 - m01*ib1)/m00 AS ib0
         |  FROM (SELECT ip.*,
         |          (v1 - (m10/m00)*v0)/(m11 - (m10/m00)*m01) AS ib1 FROM ip)),
         |pr AS (SELECT a.t, a.y, a.x, b.y AS ylag, b.x AS xlag
         |  FROM dd a JOIN (SELECT t + 1 AS t, y, x FROM dd) b USING (t)),
         |coit AS (
         |  SELECT 0 AS i, 0.0::DOUBLE AS rho, ib0 AS b0, ib1 AS b1,
         |    0.0::DOUBLE AS aa, 0.0::DOUBLE AS tn, 0.0::DOUBLE AS tsx,
         |    0.0::DOUBLE AS tsxx, 0.0::DOUBLE AS tsy, 0.0::DOUBLE AS tsxy,
         |    0.0::DOUBLE AS tsyy, false AS done
         |  FROM ini
         |  UNION ALL
         |  SELECT i + 1, rho2, aa2/(1.0 - rho2), nb1, aa2,
         |    tn, tsx, tsxx, tsy, tsxy, tsyy,
         |    abs(rho2 - rho) < 1e-8
         |  FROM (
         |    SELECT s4.*, (v0 - m01*nb1)/m00 AS aa2
         |    FROM (
         |      SELECT s3.*,
         |        (v1 - (m10/m00)*v0)/(m11 - (m10/m00)*m01) AS nb1
         |      FROM (
         |        SELECT s2.*,
         |          CASE WHEN abs(tsx) > abs(tn) THEN tsx ELSE tn END AS m00,
         |          CASE WHEN abs(tsx) > abs(tn) THEN tsxx ELSE tsx END AS m01,
         |          CASE WHEN abs(tsx) > abs(tn) THEN tsxy ELSE tsy END AS v0,
         |          CASE WHEN abs(tsx) > abs(tn) THEN tn ELSE tsx END AS m10,
         |          CASE WHEN abs(tsx) > abs(tn) THEN tsx ELSE tsxx END AS m11,
         |          CASE WHEN abs(tsx) > abs(tn) THEN tsy ELSE tsxy END AS v1
         |        FROM (
         |          SELECT DISTINCT i, rho, rho2,
         |            count(*) OVER ()::DOUBLE AS tn,
         |            sum(xs) OVER () AS tsx, sum(xs*xs) OVER () AS tsxx,
         |            sum(ys) OVER () AS tsy, sum(xs*ys) OVER () AS tsxy,
         |            sum(ys*ys) OVER () AS tsyy
         |          FROM (
         |            SELECT i, rho, rho2, y - rho2*ylag AS ys,
         |              x - rho2*xlag AS xs
         |            FROM (
         |              SELECT s0.*,
         |                sum(u*ul) OVER ()/sum(ul*ul) OVER () AS rho2
         |              FROM (
         |                SELECT q.i, q.rho, p.y, p.x, p.ylag, p.xlag,
         |                  p.y - (q.b0 + q.b1*p.x) AS u,
         |                  p.ylag - (q.b0 + q.b1*p.xlag) AS ul
         |                FROM coit q, pr p
         |                WHERE q.i < 50 AND NOT q.done) s0
         |            ) s1
         |          ) s1b
         |        ) s2
         |      ) s3
         |    ) s4
         |  ) s5
         |),
         |cofin AS (SELECT * FROM coit WHERE i = (SELECT max(i) FROM coit)),
         |sef AS (SELECT cofin.*,
         |    (tsyy - 2.0*(aa*tsy + b1*tsxy)
         |      + (aa*(tn*aa + tsx*b1) + b1*(tsx*aa + tsxx*b1)))
         |      /(tn - 2.0) AS sig2
         |  FROM cofin)
         |SELECT floor(rho*1e6 + 0.5)/1e6 AS rho,
         |  floor(b0*1e6 + 0.5)/1e6 AS b0,
         |  floor(b1*1e6 + 0.5)/1e6 AS b1,
         |  floor(sqrt(sig2*tn/(tn*tsxx - tsx*tsx))*1e6 + 0.5)/1e6 AS se_b1,
         |  CAST(tn AS BIGINT) AS n_pairs, i::INT AS iters,
         |  (CASE WHEN done THEN 1 ELSE 0 END)::INT AS converged
         |FROM sef""".stripMargin
    }
  )

  // ---- C115: Cragg hurdle count model (FULL oracle — the logit part
  // via OracleSql.logisticIrls3, the zero-truncated-Poisson part as its
  // own recursive CTE with the truncated mean/variance expressions and
  // the identical 1e-300 floor guard; both loops' iteration counts and
  // the joint converged flag replayed) ---------------------------------

  val q334 = Q(
    "q334_hurdle",
    (s, dir) => {
      // "units beyond the first": l_quantity >= 1 always, so y has a
      // real zero mass (quantity = 1) and positive counts above it
      val li = Tables.lineitem(s, dir)
        .withColumn("lp", log(col("l_extendedprice")))
        .withColumn("extra", col("l_quantity") - 1.0)
      val m = graft.ml.Hurdle.fit(li, "extra", Seq("lp", "l_discount"))
      scalarRow(
        s,
        Seq(
          "logit_icept" -> rnd(m.gamma(0), 4),
          "logit_lp" -> rnd(m.gamma(1), 4),
          "logit_disc" -> rnd(m.gamma(2), 4),
          "trunc_icept" -> rnd(m.beta(0), 4),
          "trunc_lp" -> rnd(m.beta(1), 4),
          "trunc_disc" -> rnd(m.beta(2), 4),
          // per-observation mean ll: the SUM's cross-engine summation-
          // order noise (~|ll|·1e-16·√n ≈ 2.5e-6 at sf0.1) would sit at
          // ~6× a 2dp margin; the mean divides the noise by n_pos
          "ll_trunc_avg" -> rnd(m.llTrunc / m.nPos, 4)),
        Seq("n" -> m.n, "n_pos" -> m.nPos,
          "logit_iters" -> m.logitIters.toLong,
          "trunc_iters" -> m.truncIters.toLong,
          "converged" -> (if (m.converged) 1L else 0L)))
    },
    Some {
      val sums =
        """sum(w) OVER () AS s11, sum(w*x1) OVER () AS s12,
          |               sum(w*x2) OVER () AS s13, sum(w*x1*x1) OVER () AS s22,
          |               sum(w*x1*x2) OVER () AS s23, sum(w*x2*x2) OVER () AS s33,
          |               sum(w*z) OVER () AS c1, sum(w*x1*z) OVER () AS c2,
          |               sum(w*x2*z) OVER () AS c3,
          |               sum(y*eta - lam - ln(om)) OVER () AS llnow""".stripMargin
      val solved = OracleSql.pivotSolve3(
        s"""(
           |  SELECT DISTINCT i, ll, $sums
           |  FROM (
           |    SELECT i, ll, x1, x2, y, eta, lam, om,
           |      lam/om AS m
           |    FROM (
           |      SELECT i, ll, x1, x2, y, eta,
           |        exp(least(greatest(eta, -30.0), 30.0)) AS lam,
           |        greatest(1.0 - exp(-exp(least(greatest(eta, -30.0), 30.0))),
           |          1e-300) AS om
           |      FROM (
           |        SELECT q0.i, q0.ll, d0.x1, d0.x2, d0.y,
           |          CASE WHEN q0.i = 0
           |            THEN ln((d0.y + (SELECT yb FROM tpyb))/2.0)
           |            ELSE 1.0*q0.b0 + d0.x1*q0.b1 + d0.x2*q0.b2 END AS eta
           |        FROM tpit q0, pos d0
           |        WHERE q0.i < 30 AND NOT q0.done)
           |    ) e0
           |  ) e1
           |  , LATERAL (SELECT m*(1.0 + lam - m) AS w,
           |             eta + (y - m)/(m*(1.0 + lam - m)) AS z) e2
           |)""".stripMargin,
        "s11", "s12", "s13", "s22", "s23", "s33", "c1", "c2", "c3",
        "nb0", "nb1", "nb2")
      s"""WITH RECURSIVE src1 AS (
         |  SELECT ln(l_extendedprice) AS x1, l_discount::DOUBLE AS x2,
         |         CASE WHEN l_quantity - 1.0 > 0 THEN 1.0 ELSE 0.0 END AS y
         |  FROM lineitem),
         |${OracleSql.logisticIrls3("src1")},
         |pos AS (
         |  SELECT ln(l_extendedprice) AS x1, l_discount::DOUBLE AS x2,
         |         l_quantity - 1.0 AS y
         |  FROM lineitem WHERE l_quantity - 1.0 > 0),
         |tpyb AS (SELECT sum(1.0*y)/sum(1.0) AS yb FROM pos),
         |tpit AS (
         |  SELECT 0 AS i, 0.0::DOUBLE AS b0, 0.0::DOUBLE AS b1,
         |    0.0::DOUBLE AS b2, CAST('infinity' AS DOUBLE) AS ll, false AS done
         |  FROM (SELECT 1)
         |  UNION ALL
         |  SELECT i + 1, nb0, nb1, nb2, llnow,
         |    abs(llnow - ll)/(abs(llnow) + 0.1) < 1e-9
         |  FROM $solved
         |),
         |tpfin AS (SELECT * FROM tpit WHERE i = (SELECT max(i) FROM tpit)),
         |nn AS (SELECT count(*)::BIGINT AS n,
         |         sum(CASE WHEN l_quantity - 1.0 > 0 THEN 1 ELSE 0 END)::BIGINT
         |           AS npos
         |       FROM lineitem)
         |SELECT round(g.b0, 4) AS logit_icept, round(g.b1, 4) AS logit_lp,
         |  round(g.b2, 4) AS logit_disc,
         |  round(t.b0, 4) AS trunc_icept, round(t.b1, 4) AS trunc_lp,
         |  round(t.b2, 4) AS trunc_disc,
         |  round(t.ll/nn.npos, 4) AS ll_trunc_avg,
         |  nn.n, nn.npos AS n_pos,
         |  g.i::BIGINT AS logit_iters, t.i::BIGINT AS trunc_iters,
         |  (CASE WHEN g.done AND t.done THEN 1 ELSE 0 END)::BIGINT AS converged
         |FROM lg3fin g, tpfin t, nn""".stripMargin
    }
  )

  // ---- C116: Breusch–Godfrey serial-correlation LM test (FULL oracle
  // — trend-OLS residuals via the replayed 2×2 pivot, one t−1 lag join,
  // the 3-param auxiliary solve through pivotSolve3, the Gram-identity
  // SSR, centered SST, and the χ²(1) tail as 2(1−Φ(√LM))) --------------

  val q335 = Q(
    "q335_breusch_godfrey",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(floor(unix_timestamp(col("ts")) / 86400).as("day"))
        .agg(count(lit(1)).cast("double").as("n_events"))
      val d0 = daily.agg(min(col("day"))).head().getLong(0)
      val idx = daily.withColumn("tidx", (col("day") - d0).cast("double"))
      val r = graft.ml.Hac.breuschGodfrey(idx, "day", "n_events", Seq("tidx"), lags = 1)
      graft.ml.Hac.bgSummary(s, r)
    },
    Some {
      import graft.functions.NormalDist._
      val solvedAux = OracleSql.pivotSolve3(
        s"""(SELECT count(*)::DOUBLE AS s11, sum(x) AS s12, sum(ul) AS s13,
           |    sum(x*x) AS s22, sum(x*ul) AS s23, sum(ul*ul) AS s33,
           |    sum(u) AS c1, sum(x*u) AS c2, sum(ul*u) AS c3,
           |    sum(u*u) AS suu
           |  FROM j)""".stripMargin,
        "s11", "s12", "s13", "s22", "s23", "s33", "c1", "c2", "c3",
        "a0", "a1", "a2")
      s"""WITH d AS (SELECT floor(epoch(ts)/86400)::BIGINT AS t,
         |             count(*)::DOUBLE AS y FROM events GROUP BY 1),
         |dd AS (SELECT t, y, (t - (SELECT min(t) FROM d))::DOUBLE AS x FROM d),
         |g AS (SELECT count(*)::DOUBLE AS g11, sum(x) AS g12, sum(x*x) AS g22,
         |        sum(y) AS c1, sum(x*y) AS c2 FROM dd),
         |b AS (SELECT g.*,
         |    CASE WHEN abs(g12) > abs(g11) THEN g12 ELSE g11 END AS m00,
         |    CASE WHEN abs(g12) > abs(g11) THEN g22 ELSE g12 END AS m01,
         |    CASE WHEN abs(g12) > abs(g11) THEN c2 ELSE c1 END AS v0,
         |    CASE WHEN abs(g12) > abs(g11) THEN g11 ELSE g12 END AS m10,
         |    CASE WHEN abs(g12) > abs(g11) THEN g12 ELSE g22 END AS m11,
         |    CASE WHEN abs(g12) > abs(g11) THEN c1 ELSE c2 END AS v1
         |  FROM g),
         |b2 AS (SELECT b.*,
         |    (v1 - (m10/m00)*v0)/(m11 - (m10/m00)*m01) AS b1 FROM b),
         |b3 AS (SELECT b2.*, (v0 - m01*b1)/m00 AS b0 FROM b2),
         |u AS (SELECT dd.t, dd.x, dd.y - (b3.b0 + b3.b1*dd.x) AS u
         |      FROM dd, b3),
         |j AS (SELECT a.t, a.x, a.u, l.u AS ul
         |      FROM u a JOIN (SELECT t + 1 AS t, u FROM u) l USING (t)),
         |sv AS (SELECT s.*,
         |    suu - 2.0*(a0*c1 + a1*c2 + a2*c3)
         |      + (a0*(s11*a0 + s12*a1 + s13*a2)
         |       + a1*(s12*a0 + s22*a1 + s23*a2)
         |       + a2*(s13*a0 + s23*a1 + s33*a2)) AS ssr
         |  FROM $solvedAux s),
         |mt AS (SELECT sv.*, (SELECT sum(u)/count(*) FROM j) AS ub FROM sv),
         |st AS (SELECT mt.*,
         |    (SELECT sum((u - mt.ub)*(u - mt.ub)) FROM j) AS sst FROM mt),
         |fin AS (SELECT st.*, s11*(1.0 - ssr/sst) AS lm FROM st),
         |pv AS (SELECT fin.*, sqrt(lm) AS zv,
         |    1.0/(1.0 + $P*sqrt(lm)) AS tv FROM fin)
         |SELECT floor(lm*1e4 + 0.5)/1e4 AS lm, 1::INT AS lags,
         |  floor((1.0 - ssr/sst)*1e4 + 0.5)/1e4 AS r2_aux,
         |  CAST(floor(s11 + 0.5) AS BIGINT) AS n_aux,
         |  floor((2.0*(($INV_SQRT_2PI*exp(-(zv*zv)/2.0))
         |    *(tv*($B1 + tv*($B2 + tv*($B3 + tv*($B4 + tv*$B5)))))))*1e6
         |    + 0.5)/1e6 AS p_value,
         |  (CASE WHEN 2.0*(($INV_SQRT_2PI*exp(-(zv*zv)/2.0))
         |    *(tv*($B1 + tv*($B2 + tv*($B3 + tv*($B4 + tv*$B5)))))) < 0.05
         |    THEN 1 ELSE 0 END)::INT AS reject_5pct
         |FROM pv""".stripMargin
    }
  )

  // ---- C117: Chamberlain conditional FE logit, paired panels (FULL
  // oracle — pair assembly via row_number over the in-group order,
  // discordant filter, then a NO-INTERCEPT 2-param logistic IRLS as a
  // recursive CTE mirroring Glm.fit(intercept = false) exactly) --------

  val q336 = Q(
    "q336_cond_logit",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("lp", log(col("l_extendedprice")))
        .withColumn("ret", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
      val m = graft.ml.CondLogit.fitPaired(
        li, "ret", Seq("lp", "l_discount"), "l_orderkey", "l_linenumber")
      graft.ml.CondLogit.summary(s, m).orderBy("name")
    },
    Some {
      s"""WITH RECURSIVE b AS (
         |  SELECT l_orderkey AS g, l_linenumber AS o,
         |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
         |    ln(l_extendedprice) AS xa, l_discount::DOUBLE AS xb
         |  FROM lineitem),
         |cg AS (SELECT g FROM b GROUP BY g HAVING count(*) = 2),
         |r AS (SELECT b.*, row_number() OVER (PARTITION BY g ORDER BY o, y, xa, xb) AS rn
         |      FROM b JOIN cg USING (g)),
         |np AS (SELECT (count(*)//2)::BIGINT AS n_pairs FROM r),
         |src AS (SELECT a.y AS y, a.xa - s.xa AS x1, a.xb - s.xb AS x2
         |        FROM r a JOIN r s ON a.g = s.g AND a.rn = 1 AND s.rn = 2
         |        WHERE a.y <> s.y),
         |clit AS (
         |  SELECT 0 AS i, 0.0::DOUBLE AS b1, 0.0::DOUBLE AS b2,
         |    CAST('infinity' AS DOUBLE) AS dev, false AS done
         |  FROM (SELECT 1)
         |  UNION ALL
         |  SELECT i + 1, nb1, nb2, devnow,
         |    abs(devnow - dev)/(abs(devnow) + 0.1) < 1e-9
         |  FROM (
         |    SELECT s4.*, (v0 - m01*nb2)/m00 AS nb1
         |    FROM (
         |      SELECT s3.*,
         |        (v1 - (m10/m00)*v0)/(m11 - (m10/m00)*m01) AS nb2
         |      FROM (
         |        SELECT s2.*,
         |          CASE WHEN abs(s12) > abs(s11) THEN s12 ELSE s11 END AS m00,
         |          CASE WHEN abs(s12) > abs(s11) THEN s22 ELSE s12 END AS m01,
         |          CASE WHEN abs(s12) > abs(s11) THEN c2 ELSE c1 END AS v0,
         |          CASE WHEN abs(s12) > abs(s11) THEN s11 ELSE s12 END AS m10,
         |          CASE WHEN abs(s12) > abs(s11) THEN s12 ELSE s22 END AS m11,
         |          CASE WHEN abs(s12) > abs(s11) THEN c1 ELSE c2 END AS v1
         |        FROM (
         |          SELECT DISTINCT i, dev,
         |            sum(w*x1*x1) OVER () AS s11,
         |            sum(w*x1*x2) OVER () AS s12,
         |            sum(w*x2*x2) OVER () AS s22,
         |            sum(w*x1*z) OVER () AS c1, sum(w*x2*z) OVER () AS c2,
         |            sum(devterm) OVER () AS devnow
         |          FROM (
         |            SELECT i, dev, x1, x2, mu*(1.0 - mu) AS w,
         |              eta + (y - mu)/(mu*(1.0 - mu)) AS z,
         |              -2.0*(CASE WHEN y > 0.0 THEN y*ln(mu) ELSE 0.0 END +
         |                    CASE WHEN y < 1.0 THEN (1.0 - y)*ln(1.0 - mu)
         |                      ELSE 0.0 END) AS devterm
         |            FROM (
         |              SELECT i, dev, x1, x2, y, eta,
         |                1.0/(1.0 + exp(-least(greatest(eta, -30.0), 30.0))) AS mu
         |              FROM (
         |                SELECT q0.i, q0.dev, d0.x1, d0.x2, d0.y,
         |                  CASE WHEN q0.i = 0
         |                    THEN ln(((d0.y + 0.5)/2.0)/(1.0 - (d0.y + 0.5)/2.0))
         |                    ELSE d0.x1*q0.b1 + d0.x2*q0.b2 END AS eta
         |                FROM clit q0, src d0
         |                WHERE q0.i < 30 AND NOT q0.done)
         |            )
         |          )
         |        ) s2
         |      ) s3
         |    ) s4
         |  ) s5
         |),
         |cfin AS (SELECT * FROM clit WHERE i = (SELECT max(i) FROM clit)),
         |nd AS (SELECT count(*)::BIGINT AS n_disc FROM src),
         |names(name, ord) AS (VALUES ('lp', 1), ('l_discount', 2))
         |SELECT name,
         |  floor((CASE ord WHEN 1 THEN b1 ELSE b2 END)*1e4 + 0.5)/1e4 AS coef,
         |  floor((dev/nd.n_disc)*1e4 + 0.5)/1e4 AS dev_avg,
         |  (SELECT n_pairs FROM np) AS n_pairs, nd.n_disc AS n_discordant,
         |  i::INT AS iters, (CASE WHEN done THEN 1 ELSE 0 END)::INT AS converged
         |FROM cfin, nd, names ORDER BY name""".stripMargin
    }
  )

  val all: Seq[Q] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q13, q14, q15, q16, q17, q18,
      q19, q36, q37, q38, q41, q42, q43, q59, q68, q70, q74, q79, q80, q90, q91, q94,
      q144, q145, q146, q147, q148, q149, q150, q156, q157, q158, q159, q163, q164, q165,
      q303, q304, q305, q310, q311, q316, q317, q318, q325, q326, q327, q328,
      q329, q334, q335, q336)
}
