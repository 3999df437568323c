package graft.queries

/** Shared DuckDB oracle fragments. */
object OracleSql {

  /** Recursive-CTE replay of the house 2-parameter logistic IRLS
    * (intercept + one covariate) — [[graft.ml.Glm.fit]]'s Binomial
    * path: per pass, the five weighted sufficient sums as global
    * window sums, the 2×2 solve in LinAlg's exact
    * pivot/eliminate/back-substitute op order, the same
    * relative-deviance stop rule, max 30 passes. Emits CTE definitions
    * `it` (iterations) and `fin(b0, b1)` (the converged coefficients);
    * `src` must be a prior CTE with columns (x DOUBLE, y DOUBLE∈{0,1}).
    * The enclosing query must open with WITH RECURSIVE.
    */
  def logisticIrls2(src: String): String =
    s"""it AS (
       |  SELECT 1 AS i,
       |    (v0 - m01*b1n)/m00 AS b0, b1n AS b1, devnow AS dev, false AS done
       |  FROM (
       |    SELECT u.*,
       |      (v1 - (m10/m00)*v0) / (m11 - (m10/m00)*m01) AS b1n
       |    FROM (
       |      SELECT DISTINCT
       |        CASE WHEN abs(sB) > abs(sA) THEN sB ELSE sA END AS m00,
       |        CASE WHEN abs(sB) > abs(sA) THEN sC ELSE sB END AS m01,
       |        CASE WHEN abs(sB) > abs(sA) THEN sA ELSE sB END AS m10,
       |        CASE WHEN abs(sB) > abs(sA) THEN sB ELSE sC END AS m11,
       |        CASE WHEN abs(sB) > abs(sA) THEN d1 ELSE d0 END AS v0,
       |        CASE WHEN abs(sB) > abs(sA) THEN d0 ELSE d1 END AS v1,
       |        devnow
       |      FROM (
       |        SELECT sum(w) OVER () AS sA, sum(w*x) OVER () AS sB,
       |               sum(w*x*x) OVER () AS sC, sum(w*z) OVER () AS d0,
       |               sum(w*x*z) OVER () AS d1, sum(devterm) OVER () AS devnow
       |        FROM (
       |          SELECT x, y, eta, mu, mu*(1.0 - mu) AS w,
       |            eta + (y - mu)/(mu*(1.0 - mu)) AS z,
       |            -2.0*(CASE WHEN y > 0.0 THEN y*ln(mu) ELSE 0.0 END +
       |                  CASE WHEN y < 1.0 THEN (1.0 - y)*ln(1.0 - mu) ELSE 0.0 END)
       |              AS devterm
       |          FROM (
       |            SELECT x, y, eta,
       |              1.0/(1.0 + exp(-least(greatest(eta, -30.0), 30.0))) AS mu
       |            FROM (
       |              SELECT x, y,
       |                ln(((y + 0.5)/2.0)/(1.0 - (y + 0.5)/2.0)) AS eta
       |              FROM $src))
       |        )
       |      )
       |    ) u
       |  )
       |  UNION ALL
       |  SELECT i + 1,
       |    (v0 - m01*b1n)/m00, b1n, devnow,
       |    abs(devnow - dev)/(abs(devnow) + 0.1) < 1e-9
       |  FROM (
       |    SELECT u.*,
       |      (v1 - (m10/m00)*v0) / (m11 - (m10/m00)*m01) AS b1n
       |    FROM (
       |      SELECT DISTINCT i, dev,
       |        CASE WHEN abs(sB) > abs(sA) THEN sB ELSE sA END AS m00,
       |        CASE WHEN abs(sB) > abs(sA) THEN sC ELSE sB END AS m01,
       |        CASE WHEN abs(sB) > abs(sA) THEN sA ELSE sB END AS m10,
       |        CASE WHEN abs(sB) > abs(sA) THEN sB ELSE sC END AS m11,
       |        CASE WHEN abs(sB) > abs(sA) THEN d1 ELSE d0 END AS v0,
       |        CASE WHEN abs(sB) > abs(sA) THEN d0 ELSE d1 END AS v1,
       |        devnow
       |      FROM (
       |        SELECT i, dev,
       |               sum(w) OVER () AS sA, sum(w*x) OVER () AS sB,
       |               sum(w*x*x) OVER () AS sC, sum(w*z) OVER () AS d0,
       |               sum(w*x*z) OVER () AS d1, sum(devterm) OVER () AS devnow
       |        FROM (
       |          SELECT i, dev, x, y, eta, mu, mu*(1.0 - mu) AS w,
       |            eta + (y - mu)/(mu*(1.0 - mu)) AS z,
       |            -2.0*(CASE WHEN y > 0.0 THEN y*ln(mu) ELSE 0.0 END +
       |                  CASE WHEN y < 1.0 THEN (1.0 - y)*ln(1.0 - mu) ELSE 0.0 END)
       |              AS devterm
       |          FROM (
       |            SELECT q.i, q.dev, d.x, d.y,
       |              1.0*q.b0 + d.x*q.b1 AS eta,
       |              1.0/(1.0 + exp(-least(greatest(1.0*q.b0 + d.x*q.b1, -30.0), 30.0)))
       |                AS mu
       |            FROM it q, $src d WHERE q.i < 30 AND NOT q.done)
       |        )
       |      )
       |    ) u
       |  )
       |),
       |fin AS (SELECT b0, b1 FROM it WHERE i = (SELECT max(i) FROM it))""".stripMargin

  /** Recursive-CTE replay of the house 2-parameter PROBIT IRLS
    * (intercept + one covariate) — [[graft.ml.Glm.fit]] with the
    * [[graft.ml.Glm.Probit]] family: η clamped at ±8, μ = Φ(η) through
    * the shared portable polynomial ([[graft.functions.NormalDist
    * .phiSql]] — the identical Horner chain both engines run), weight
    * ϕ(η)²/(μ(1−μ)), working response z = η + (y−μ)/ϕ(η), the logit
    * init rescaled by 1.702, the same 2×2 pivot order and relative-
    * deviance stop, max 30 passes. Emits `pit` and
    * `pfin(b0, b1, sa, sb, sc, dev, i, done)` — the final pass's raw
    * Gram rides along so information SEs replay as the closed-form 2×2
    * inverse. `src` must provide (x DOUBLE, y DOUBLE∈{0,1}); the
    * enclosing query must open with WITH RECURSIVE.
    */
  def probitIrls2(src: String): String = {
    val phi = graft.functions.NormalDist.phiSql("ec")
    val C = graft.functions.NormalDist.INV_SQRT_2PI
    // shared per-pass row pipeline given an eta expression is already
    // bound as column `eta` (plus any carried columns in `keep`)
    def pass(keep: String, from: String): String =
      s"""SELECT $keep x, y, (pdfc*pdfc)/(mu*(1.0 - mu)) AS w,
         |  eta + (y - mu)/pdfc AS z,
         |  -2.0*(CASE WHEN y > 0.0 THEN y*ln(mu) ELSE 0.0 END +
         |        CASE WHEN y < 1.0 THEN (1.0 - y)*ln(1.0 - mu) ELSE 0.0 END)
         |    AS devterm
         |FROM (
         |  SELECT $keep x, y, eta,
         |    least(greatest($phi, 1e-12), 1.0 - 1e-12) AS mu,
         |    $C*exp(-(ec*ec)/2.0) AS pdfc
         |  FROM (
         |    SELECT $keep x, y, eta, least(greatest(eta, -8.0), 8.0) AS ec
         |    FROM $from))""".stripMargin
    s"""pit AS (
       |  SELECT 1 AS i,
       |    (v0 - m01*b1n)/m00 AS b0, b1n AS b1, devnow AS dev,
       |    sA AS sa, sB AS sb, sC AS sc, false AS done
       |  FROM (
       |    SELECT u.*,
       |      (v1 - (m10/m00)*v0) / (m11 - (m10/m00)*m01) AS b1n
       |    FROM (
       |      SELECT DISTINCT sA, sB, sC,
       |        CASE WHEN abs(sB) > abs(sA) THEN sB ELSE sA END AS m00,
       |        CASE WHEN abs(sB) > abs(sA) THEN sC ELSE sB END AS m01,
       |        CASE WHEN abs(sB) > abs(sA) THEN sA ELSE sB END AS m10,
       |        CASE WHEN abs(sB) > abs(sA) THEN sB ELSE sC END AS m11,
       |        CASE WHEN abs(sB) > abs(sA) THEN d1 ELSE d0 END AS v0,
       |        CASE WHEN abs(sB) > abs(sA) THEN d0 ELSE d1 END AS v1,
       |        devnow
       |      FROM (
       |        SELECT sum(w) OVER () AS sA, sum(w*x) OVER () AS sB,
       |               sum(w*x*x) OVER () AS sC, sum(w*z) OVER () AS d0,
       |               sum(w*x*z) OVER () AS d1, sum(devterm) OVER () AS devnow
       |        FROM (
       |          ${pass("", s"""(
       |            SELECT x, y,
       |              ln(((y + 0.5)/2.0)/(1.0 - (y + 0.5)/2.0))/1.702 AS eta
       |            FROM $src)""")}
       |        )
       |      )
       |    ) u
       |  )
       |  UNION ALL
       |  SELECT i + 1,
       |    (v0 - m01*b1n)/m00, b1n, devnow, sA, sB, sC,
       |    abs(devnow - dev)/(abs(devnow) + 0.1) < 1e-9
       |  FROM (
       |    SELECT u.*,
       |      (v1 - (m10/m00)*v0) / (m11 - (m10/m00)*m01) AS b1n
       |    FROM (
       |      SELECT DISTINCT i, dev, sA, sB, sC,
       |        CASE WHEN abs(sB) > abs(sA) THEN sB ELSE sA END AS m00,
       |        CASE WHEN abs(sB) > abs(sA) THEN sC ELSE sB END AS m01,
       |        CASE WHEN abs(sB) > abs(sA) THEN sA ELSE sB END AS m10,
       |        CASE WHEN abs(sB) > abs(sA) THEN sB ELSE sC END AS m11,
       |        CASE WHEN abs(sB) > abs(sA) THEN d1 ELSE d0 END AS v0,
       |        CASE WHEN abs(sB) > abs(sA) THEN d0 ELSE d1 END AS v1,
       |        devnow
       |      FROM (
       |        SELECT i, dev,
       |               sum(w) OVER () AS sA, sum(w*x) OVER () AS sB,
       |               sum(w*x*x) OVER () AS sC, sum(w*z) OVER () AS d0,
       |               sum(w*x*z) OVER () AS d1, sum(devterm) OVER () AS devnow
       |        FROM (
       |          ${pass("i, dev,", s"""(
       |            SELECT q.i, q.dev, d.x, d.y,
       |              1.0*q.b0 + d.x*q.b1 AS eta
       |            FROM pit q, $src d WHERE q.i < 30 AND NOT q.done)""")}
       |        )
       |      )
       |    ) u
       |  )
       |),
       |pfin AS (SELECT b0, b1, sa, sb, sc, dev, i, done
       |         FROM pit WHERE i = (SELECT max(i) FROM pit))""".stripMargin
  }

  /** Bit-exact SQL mirror of [[graft.ml.LinAlg.solve]] for a SYMMETRIC
    * 3×3 system: partial-pivoted Gaussian elimination in the identical
    * float op order — pivot by strict |·| comparisons with the same
    * first-max tie rule, fused `m −= f·p` updates, the same
    * back-substitution association. Cramer determinants are ulp-off
    * from the pivoted chain, and q304 showed those ulps can straddle a
    * 6dp boundary at sf0.1 — this mirror removes the solver from the
    * noise budget entirely. Returns a subquery string selecting
    * `inner`'s columns (aliased `q`) plus `$x0/$x1/$x2`; matrix
    * (a11..a33) and rhs (r1..r3) are column names of `inner`.
    */
  def pivotSolve3(
      inner: String,
      a11: String, a12: String, a13: String,
      a22: String, a23: String, a33: String,
      r1: String, r2: String, r3: String,
      x0: String, x1: String, x2: String): String =
    s"""(
       |  SELECT s5.*,
       |    ((__v0 - __m01*$x1) - __m02*$x2)/__m00 AS $x0
       |  FROM (
       |    SELECT s4.*, (__w1 - __n12*$x2)/__n11 AS $x1
       |    FROM (
       |      SELECT s3.*,
       |        (__w2 - (__n21/__n11)*__w1)
       |          / (__n22 - (__n21/__n11)*__n12) AS $x2
       |      FROM (
       |        SELECT s2.*,
       |          CASE WHEN __p1 THEN __m21a ELSE __m11a END AS __n11,
       |          CASE WHEN __p1 THEN __m22a ELSE __m12a END AS __n12,
       |          CASE WHEN __p1 THEN __v2a  ELSE __v1a  END AS __w1,
       |          CASE WHEN __p1 THEN __m11a ELSE __m21a END AS __n21,
       |          CASE WHEN __p1 THEN __m12a ELSE __m22a END AS __n22,
       |          CASE WHEN __p1 THEN __v1a  ELSE __v2a  END AS __w2
       |        FROM (
       |          SELECT s1.*, abs(__m21a) > abs(__m11a) AS __p1
       |          FROM (
       |            SELECT s0.*,
       |              __m11 - (__m10/__m00)*__m01 AS __m11a,
       |              __m12 - (__m10/__m00)*__m02 AS __m12a,
       |              __v1  - (__m10/__m00)*__v0  AS __v1a,
       |              __m21 - (__m20/__m00)*__m01 AS __m21a,
       |              __m22 - (__m20/__m00)*__m02 AS __m22a,
       |              __v2  - (__m20/__m00)*__v0  AS __v2a
       |            FROM (
       |              SELECT p.*,
       |                CASE __p0 WHEN 1 THEN $a12 WHEN 2 THEN $a13 ELSE $a11 END AS __m00,
       |                CASE __p0 WHEN 1 THEN $a22 WHEN 2 THEN $a23 ELSE $a12 END AS __m01,
       |                CASE __p0 WHEN 1 THEN $a23 WHEN 2 THEN $a33 ELSE $a13 END AS __m02,
       |                CASE __p0 WHEN 1 THEN $r2  WHEN 2 THEN $r3  ELSE $r1  END AS __v0,
       |                CASE __p0 WHEN 1 THEN $a11 ELSE $a12 END AS __m10,
       |                CASE __p0 WHEN 1 THEN $a12 ELSE $a22 END AS __m11,
       |                CASE __p0 WHEN 1 THEN $a13 ELSE $a23 END AS __m12,
       |                CASE __p0 WHEN 1 THEN $r1  ELSE $r2  END AS __v1,
       |                CASE __p0 WHEN 2 THEN $a11 ELSE $a13 END AS __m20,
       |                CASE __p0 WHEN 2 THEN $a12 ELSE $a23 END AS __m21,
       |                CASE __p0 WHEN 2 THEN $a13 ELSE $a33 END AS __m22,
       |                CASE __p0 WHEN 2 THEN $r1  ELSE $r3  END AS __v2
       |              FROM (
       |                SELECT q.*,
       |                  CASE WHEN abs($a13) >
       |                    (CASE WHEN abs($a12) > abs($a11)
       |                       THEN abs($a12) ELSE abs($a11) END) THEN 2
       |                  WHEN abs($a12) > abs($a11) THEN 1 ELSE 0 END AS __p0
       |                FROM $inner q
       |              ) p
       |            ) s0
       |          ) s1
       |        ) s2
       |      ) s3
       |    ) s4
       |  ) s5
       |)""".stripMargin

  /** 3-parameter probit IRLS (intercept + two covariates) as a
    * recursive CTE — the [[probitIrls2]] machinery with the per-pass
    * 3×3 normal equations solved by [[pivotSolve3]], the bit-exact
    * mirror of LinAlg's pivoted elimination (a Cramer solve's ulps
    * straddled a 6dp boundary at sf0.1 — r11 lesson). Emits `p3it` and
    * `p3fin(b0, b1, b2)`. `src` must provide (x1 DOUBLE, x2 DOUBLE,
    * y DOUBLE∈{0,1}); the enclosing query must open with
    * WITH RECURSIVE.
    */
  def probitIrls3(src: String, tol: Double = 1e-9, maxIter: Int = 30): String = {
    val phi = graft.functions.NormalDist.phiSql("ec")
    val C = graft.functions.NormalDist.INV_SQRT_2PI
    def pass(keep: String, from: String): String =
      s"""SELECT $keep x1, x2, y, (pdfc*pdfc)/(mu*(1.0 - mu)) AS w,
         |  eta + (y - mu)/pdfc AS z,
         |  -2.0*(CASE WHEN y > 0.0 THEN y*ln(mu) ELSE 0.0 END +
         |        CASE WHEN y < 1.0 THEN (1.0 - y)*ln(1.0 - mu) ELSE 0.0 END)
         |    AS devterm
         |FROM (
         |  SELECT $keep x1, x2, y, eta,
         |    least(greatest($phi, 1e-12), 1.0 - 1e-12) AS mu,
         |    $C*exp(-(ec*ec)/2.0) AS pdfc
         |  FROM (
         |    SELECT $keep x1, x2, y, eta, least(greatest(eta, -8.0), 8.0) AS ec
         |    FROM $from))""".stripMargin
    val sums =
      """sum(w) OVER () AS s11, sum(w*x1) OVER () AS s12,
        |               sum(w*x2) OVER () AS s13, sum(w*x1*x1) OVER () AS s22,
        |               sum(w*x1*x2) OVER () AS s23, sum(w*x2*x2) OVER () AS s33,
        |               sum(w*z) OVER () AS c1, sum(w*x1*z) OVER () AS c2,
        |               sum(w*x2*z) OVER () AS c3,
        |               sum(devterm) OVER () AS devnow""".stripMargin
    def solved(inner: String): String =
      pivotSolve3(inner, "s11", "s12", "s13", "s22", "s23", "s33",
        "c1", "c2", "c3", "nb0", "nb1", "nb2")
    s"""p3it AS (
       |  SELECT 1 AS i, nb0 AS b0, nb1 AS b1, nb2 AS b2, devnow AS dev, false AS done
       |  FROM ${solved(s"""(
       |      SELECT DISTINCT $sums
       |        FROM (
       |          ${pass("", s"""(
       |            SELECT x1, x2, y,
       |              ln(((y + 0.5)/2.0)/(1.0 - (y + 0.5)/2.0))/1.702 AS eta
       |            FROM $src)""")}
       |        )
       |      )""")}
       |  UNION ALL
       |  SELECT i + 1, nb0, nb1, nb2, devnow,
       |    abs(devnow - dev)/(abs(devnow) + 0.1) < $tol
       |  FROM ${solved(s"""(
       |      SELECT DISTINCT i, dev, $sums
       |        FROM (
       |          ${pass("i, dev,", s"""(
       |            SELECT q.i, q.dev, d.x1, d.x2, d.y,
       |              1.0*q.b0 + d.x1*q.b1 + d.x2*q.b2 AS eta
       |            FROM p3it q, $src d WHERE q.i < $maxIter AND NOT q.done)""")}
       |        )
       |      )""")}
       |),
       |p3fin AS (SELECT b0, b1, b2 FROM p3it WHERE i = (SELECT max(i) FROM p3it))""".stripMargin
  }

  /** 3-parameter LOGISTIC IRLS (intercept + two covariates) as a
    * recursive CTE — [[logisticIrls2]]'s Binomial chain widened one
    * covariate, per-pass normal equations through [[pivotSolve3]].
    * Emits `lg3it` and `lg3fin(b0, b1, b2, i, done)`. `src` must
    * provide (x1, x2, y); the enclosing query must open with
    * WITH RECURSIVE.
    */
  def logisticIrls3(src: String, tol: Double = 1e-9, maxIter: Int = 30): String = {
    def pass(keep: String, from: String): String =
      s"""SELECT $keep x1, x2, y, mu*(1.0 - mu) AS w,
         |  eta + (y - mu)/(mu*(1.0 - mu)) AS z,
         |  -2.0*(CASE WHEN y > 0.0 THEN y*ln(mu) ELSE 0.0 END +
         |        CASE WHEN y < 1.0 THEN (1.0 - y)*ln(1.0 - mu) ELSE 0.0 END)
         |    AS devterm
         |FROM (
         |  SELECT $keep x1, x2, y, eta,
         |    1.0/(1.0 + exp(-least(greatest(eta, -30.0), 30.0))) AS mu
         |  FROM $from)""".stripMargin
    val sums =
      """sum(w) OVER () AS s11, sum(w*x1) OVER () AS s12,
        |               sum(w*x2) OVER () AS s13, sum(w*x1*x1) OVER () AS s22,
        |               sum(w*x1*x2) OVER () AS s23, sum(w*x2*x2) OVER () AS s33,
        |               sum(w*z) OVER () AS c1, sum(w*x1*z) OVER () AS c2,
        |               sum(w*x2*z) OVER () AS c3,
        |               sum(devterm) OVER () AS devnow""".stripMargin
    def solved(inner: String): String =
      pivotSolve3(inner, "s11", "s12", "s13", "s22", "s23", "s33",
        "c1", "c2", "c3", "nb0", "nb1", "nb2")
    s"""lg3it AS (
       |  SELECT 1 AS i, nb0 AS b0, nb1 AS b1, nb2 AS b2, devnow AS dev, false AS done
       |  FROM ${solved(s"""(
       |      SELECT DISTINCT $sums
       |        FROM (
       |          ${pass("", s"""(
       |            SELECT x1, x2, y,
       |              ln(((y + 0.5)/2.0)/(1.0 - (y + 0.5)/2.0)) AS eta
       |            FROM $src)""")}
       |        )
       |      )""")}
       |  UNION ALL
       |  SELECT i + 1, nb0, nb1, nb2, devnow,
       |    abs(devnow - dev)/(abs(devnow) + 0.1) < $tol
       |  FROM ${solved(s"""(
       |      SELECT DISTINCT i, dev, $sums
       |        FROM (
       |          ${pass("i, dev,", s"""(
       |            SELECT q.i, q.dev, d.x1, d.x2, d.y,
       |              1.0*q.b0 + d.x1*q.b1 + d.x2*q.b2 AS eta
       |            FROM lg3it q, $src d WHERE q.i < $maxIter AND NOT q.done)""")}
       |        )
       |      )""")}
       |),
       |lg3fin AS (SELECT b0, b1, b2, i, done
       |           FROM lg3it WHERE i = (SELECT max(i) FROM lg3it))""".stripMargin
  }

  /** 3-parameter NB2 NEGATIVE-BINOMIAL IRLS (intercept + two
    * covariates) with the Cameron–Trivedi per-pass α moment update —
    * [[graft.ml.Glm.negBinomial]]'s exact loop: α starts at 0 (the
    * Poisson limit — the α = 0 column-expression branch is a plan-time
    * `if` in Scala, replayed as an exact `CASE WHEN a = 0.0`), each
    * pass solves the weighted normal equations via [[pivotSolve3]] and
    * re-estimates α = max(Σ((y−μ)²−y)/Σμ², 0), stopping when BOTH the
    * relative deviance and the α movement fall under `tol`. The
    * recursion is seeded with an i = 0 init row (the Tobit pattern);
    * pass 1 uses the ln((y+ȳ)/2) Poisson initializer. Emits `nbit`
    * and `nbfin(b0, b1, b2, a, s11..s33, dev, i, done)` — the final
    * pass's weighted Gram rides along for the information/robust SEs.
    * `src` must provide (x1, x2, y ≥ 0).
    */
  /** 3-parameter POISSON IRLS (intercept + two covariates) as a
    * recursive CTE — [[graft.ml.Glm.poisson]]'s exact loop (log link:
    * μ = exp(clamp(η, ±30)), w = μ, z = η + (y−μ)/μ, the ln((y+ȳ)/2)
    * initializer, |Δdev|/(|dev|+0.1) < tol stop), per-pass normal
    * equations through [[pivotSolve3]]. The [[negbinIrls3]] skeleton
    * with the α update removed (NB2 at α ≡ 0 IS Poisson). Emits `psyb`,
    * `psit` and `psfin(b0, b1, b2, s11..s33, i, done)` — the final
    * pass's weighted Gram rides along for the information/robust SEs
    * (the bread is the Gram of the pass that PRODUCED the final β).
    * `src` must provide (x1, x2, y ≥ 0).
    */
  def poissonIrls3(src: String, tol: Double = 1e-9, maxIter: Int = 30): String = {
    val sums =
      """sum(w) OVER () AS s11, sum(w*x1) OVER () AS s12,
        |               sum(w*x2) OVER () AS s13, sum(w*x1*x1) OVER () AS s22,
        |               sum(w*x1*x2) OVER () AS s23, sum(w*x2*x2) OVER () AS s33,
        |               sum(w*z) OVER () AS c1, sum(w*x1*z) OVER () AS c2,
        |               sum(w*x2*z) OVER () AS c3,
        |               sum(devterm) OVER () AS devnow""".stripMargin
    def solved(inner: String): String =
      pivotSolve3(inner, "s11", "s12", "s13", "s22", "s23", "s33",
        "c1", "c2", "c3", "nb0", "nb1", "nb2")
    s"""psyb AS (SELECT sum(1.0*y)/sum(1.0) AS yb FROM $src),
       |psit AS (
       |  SELECT 0 AS i, 0.0::DOUBLE AS b0, 0.0::DOUBLE AS b1, 0.0::DOUBLE AS b2,
       |    CAST('infinity' AS DOUBLE) AS dev,
       |    0.0::DOUBLE AS s11, 0.0::DOUBLE AS s12, 0.0::DOUBLE AS s13,
       |    0.0::DOUBLE AS s22, 0.0::DOUBLE AS s23, 0.0::DOUBLE AS s33,
       |    false AS done
       |  UNION ALL
       |  SELECT i + 1, nb0, nb1, nb2, devnow,
       |    s11, s12, s13, s22, s23, s33,
       |    abs(devnow - dev)/(abs(devnow) + 0.1) < $tol
       |  FROM ${solved(s"""(
       |      SELECT DISTINCT i, dev, $sums
       |        FROM (
       |          SELECT i, dev, x1, x2, y, mu, mu AS w,
       |            eta + (y - mu)/mu AS z,
       |            2.0*((CASE WHEN y > 0.0 THEN y*ln(y/mu) ELSE 0.0 END)
       |                 - (y - mu)) AS devterm
       |          FROM (
       |            SELECT i, dev, x1, x2, y, eta,
       |              exp(least(greatest(eta, -30.0), 30.0)) AS mu
       |            FROM (
       |              SELECT q0.i AS i, q0.dev AS dev,
       |                d0.x1 AS x1, d0.x2 AS x2, d0.y AS y,
       |                CASE WHEN q0.i = 0
       |                  THEN ln((d0.y + (SELECT yb FROM psyb))/2.0)
       |                  ELSE 1.0*q0.b0 + d0.x1*q0.b1 + d0.x2*q0.b2 END AS eta
       |              FROM psit q0, $src d0
       |              WHERE q0.i < $maxIter AND NOT q0.done)
       |          )
       |        )
       |      )""")}
       |),
       |psfin AS (SELECT b0, b1, b2, s11, s12, s13, s22, s23, s33, i, done
       |          FROM psit WHERE i = (SELECT max(i) FROM psit))""".stripMargin
  }

  /** Two-covariate, two-FE GLM-IRLS (the [[graft.ml.Glm.fitFE]] loop)
    * as a recursive CTE whose rows are the FE CELLS — the q79 PPML
    * replay generalized over the log-link families (Poisson, Gamma,
    * NB2 with the interleaved Cameron–Trivedi α): per step the weighted
    * cell stats re-aggregate at the current η, the TWO-FE weighted
    * demeaning fixpoint solves in CLOSED FORM (gauge b = 0 on the
    * first group of the second FE — which must have EXACTLY TWO groups
    * so the reduced system is one scalar per column; cell-total
    * effects are gauge-invariant and unique on a connected FE graph),
    * the demeaned Gram assembles from cell stats (the olsFromCellGram
    * identity), a 2×2 pivot solve updates β, and the deviance (plus
    * the α moments when `alpha`) evaluates at the new η in a second
    * row pass. η clamps at ±30 (the shared exp-link clamp); z =
    * η + (y−μ)/μ for ALL three families (canonical Poisson and the
    * non-canonical log links share dμ/dη = μ).
    *
    * Emits `${tag}it` and `${tag}fin`; state rows carry per-cell
    * (coff, ez, e1, e2) and the final Gram (g11, g12, g22) so the
    * HC0 sandwich can replay downstream. `src` must provide
    * (y, x1, x2, rf, ls); `ybarSel` is a scalar subquery for ȳ.
    *
    * @param wOf   IRLS weight SQL of (mu, a)
    * @param devOf deviance-term SQL of (y, mu, a)
    * @param alpha interleave the NB2 α update (adds the anum/aden
    *              moments at the new η and the α stop criterion)
    */
  def feGlm2x2(
      tag: String,
      src: String,
      ybarSel: String,
      wOf: (String, String) => String,
      devOf: (String, String, String) => String,
      tol: Double,
      maxIter: Int,
      alpha: Boolean): String = {
    val aInit = "0.0::DOUBLE AS a"
    val mu2 = s"exp(least(greatest(d.x1*c.nb1 + d.x2*c.nb2 + c.coff2, -30.0), 30.0))"
    val devT = devOf("d.y", mu2, "c.a")
    val alphaMoms =
      if (alpha)
        s""",
           |      sum((d.y - $mu2)*(d.y - $mu2) - d.y) OVER () AS anum,
           |      sum(($mu2)*($mu2)) OVER () AS aden""".stripMargin
      else ""
    val a2 = if (alpha) "greatest(anum/aden, 0.0)" else "a"
    val alphaDone =
      if (alpha)
        s""" AND abs(greatest(anum/aden, 0.0) - a)
           |          /(greatest(anum/aden, 0.0) + 0.1) < $tol""".stripMargin
      else ""
    s"""${tag}it AS (
       |  SELECT 0 AS i, rf, ls, 0.0::DOUBLE AS b1, 0.0::DOUBLE AS b2,
       |    $aInit, CAST('infinity' AS DOUBLE) AS dev, false AS done,
       |    0.0::DOUBLE AS coff, 0.0::DOUBLE AS ez, 0.0::DOUBLE AS e1,
       |    0.0::DOUBLE AS e2, 0.0::DOUBLE AS g11, 0.0::DOUBLE AS g12,
       |    0.0::DOUBLE AS g22
       |  FROM (SELECT DISTINCT rf, ls FROM $src)
       |  UNION ALL
       |  SELECT i + 1, rf, ls, nb1 AS b1, nb2 AS b2, $a2 AS a,
       |    devnow AS dev,
       |    abs(devnow - dev)/(abs(devnow) + 0.1) < $tol$alphaDone AS done,
       |    coff2 AS coff, ez, e1, e2, g11, g12, g22
       |  FROM (
       |    SELECT DISTINCT c.i, c.a, c.dev, c.rf, c.ls, c.nb1, c.nb2, c.coff2,
       |      c.ez, c.e1, c.e2, c.g11, c.g12, c.g22,
       |      sum($devT) OVER () AS devnow$alphaMoms
       |    FROM (
       |      SELECT t8c.*, ez - nb1*e1 - nb2*e2 AS coff2
       |      FROM (
       |        SELECT t8b.*, (v0 - m01*nb2)/m00 AS nb1
       |        FROM (
       |          SELECT t8a.*,
       |            (v1 - (m10/m00)*v0)/(m11 - (m10/m00)*m01) AS nb2
       |          FROM (
       |            SELECT t7p.*,
       |              CASE WHEN pv THEN g12 ELSE g11 END AS m00,
       |              CASE WHEN pv THEN g22 ELSE g12 END AS m01,
       |              CASE WHEN pv THEN c2g ELSE c1g END AS v0,
       |              CASE WHEN pv THEN g11 ELSE g12 END AS m10,
       |              CASE WHEN pv THEN g12 ELSE g22 END AS m11,
       |              CASE WHEN pv THEN c1g ELSE c2g END AS v1
       |            FROM (
       |              SELECT t6b.*, abs(g12) > abs(g11) AS pv
       |              FROM (
       |                SELECT t6.*,
       |                  q11 - sum(2.0*s1*e1 - cn*e1*e1) OVER () AS g11,
       |                  q12 - sum(s1*e2 + s2*e1 - cn*e1*e2) OVER () AS g12,
       |                  q22 - sum(2.0*s2*e2 - cn*e2*e2) OVER () AS g22,
       |                  qz1 - sum(s1*ez + sz*e1 - cn*e1*ez) OVER () AS c1g,
       |                  qz2 - sum(s2*ez + sz*e2 - cn*e2*ez) OVER () AS c2g
       |                FROM (
       |                  SELECT t5.*,
       |                    (sgz - ngh1*dz)/ng
       |                      + (CASE WHEN ish1 THEN dz ELSE 0.0 END) AS ez,
       |                    (sg1 - ngh1*d1)/ng
       |                      + (CASE WHEN ish1 THEN d1 ELSE 0.0 END) AS e1,
       |                    (sg2 - ngh1*d2)/ng
       |                      + (CASE WHEN ish1 THEN d2 ELSE 0.0 END) AS e2
       |                  FROM (
       |                    SELECT t4.*,
       |                      sum(CASE WHEN ish1 THEN cn ELSE 0.0 END)
       |                        OVER (PARTITION BY rf) AS ngh1,
       |                      (sum(CASE WHEN ish1 THEN sz ELSE 0.0 END) OVER ()
       |                       - sum(CASE WHEN ish1 THEN cn*sgz/ng ELSE 0.0 END)
       |                           OVER ())
       |                      /(sum(CASE WHEN ish1 THEN cn ELSE 0.0 END) OVER ()
       |                        - sum(CASE WHEN ish1 THEN cn*cn/ng ELSE 0.0 END)
       |                            OVER ()) AS dz,
       |                      (sum(CASE WHEN ish1 THEN s1 ELSE 0.0 END) OVER ()
       |                       - sum(CASE WHEN ish1 THEN cn*sg1/ng ELSE 0.0 END)
       |                           OVER ())
       |                      /(sum(CASE WHEN ish1 THEN cn ELSE 0.0 END) OVER ()
       |                        - sum(CASE WHEN ish1 THEN cn*cn/ng ELSE 0.0 END)
       |                            OVER ()) AS d1,
       |                      (sum(CASE WHEN ish1 THEN s2 ELSE 0.0 END) OVER ()
       |                       - sum(CASE WHEN ish1 THEN cn*sg2/ng ELSE 0.0 END)
       |                           OVER ())
       |                      /(sum(CASE WHEN ish1 THEN cn ELSE 0.0 END) OVER ()
       |                        - sum(CASE WHEN ish1 THEN cn*cn/ng ELSE 0.0 END)
       |                            OVER ()) AS d2
       |                    FROM (
       |                      SELECT t3.*,
       |                        sum(cn) OVER (PARTITION BY rf) AS ng,
       |                        sum(sz) OVER (PARTITION BY rf) AS sgz,
       |                        sum(s1) OVER (PARTITION BY rf) AS sg1,
       |                        sum(s2) OVER (PARTITION BY rf) AS sg2,
       |                        ls = max(ls) OVER () AS ish1
       |                      FROM (
       |                        SELECT DISTINCT i, a, dev, rf, ls,
       |                          sum(w) OVER (PARTITION BY rf, ls) AS cn,
       |                          sum(w*z) OVER (PARTITION BY rf, ls) AS sz,
       |                          sum(w*x1) OVER (PARTITION BY rf, ls) AS s1,
       |                          sum(w*x2) OVER (PARTITION BY rf, ls) AS s2,
       |                          sum(w*x1*x1) OVER () AS q11,
       |                          sum(w*x1*x2) OVER () AS q12,
       |                          sum(w*x2*x2) OVER () AS q22,
       |                          sum(w*x1*z) OVER () AS qz1,
       |                          sum(w*x2*z) OVER () AS qz2
       |                        FROM (
       |                          SELECT i, a, dev, rf, ls, x1, x2,
       |                            ${wOf("mu", "a")} AS w,
       |                            eta + (y - mu)/mu AS z
       |                          FROM (
       |                            SELECT i, a, dev, rf, ls, y, x1, x2, eta,
       |                              exp(least(greatest(eta, -30.0), 30.0)) AS mu
       |                            FROM (
       |                              SELECT q0.i, q0.a, q0.dev, d0.rf, d0.ls,
       |                                d0.y, d0.x1, d0.x2,
       |                                CASE WHEN q0.i = 0
       |                                  THEN ln((d0.y + $ybarSel)/2.0)
       |                                  ELSE d0.x1*q0.b1 + d0.x2*q0.b2 + q0.coff
       |                                END AS eta
       |                              FROM ${tag}it q0
       |                              JOIN $src d0
       |                                ON d0.rf = q0.rf AND d0.ls = q0.ls
       |                              WHERE q0.i < $maxIter AND NOT q0.done)
       |                          )
       |                        ) t2w
       |                      ) t3
       |                    ) t4
       |                  ) t5
       |                ) t6
       |              ) t6b
       |            ) t7p
       |          ) t8a
       |        ) t8b
       |      ) t8c
       |    ) c
       |    JOIN $src d ON d.rf = c.rf AND d.ls = c.ls
       |  ) step
       |),
       |${tag}fin AS (SELECT * FROM ${tag}it
       |              WHERE i = (SELECT max(i) FROM ${tag}it))""".stripMargin
  }

  /** HC0 sandwich tail for a [[feGlm2x2]] fit: per-row score u from
    * `scoreOf(y, mu, a)` at the converged μ, demeaned covariates from
    * the carried cell effects, meat moments + the carried Gram as one
    * DISTINCT row `${tag}se`.
    */
  def feGlm2x2Se(tag: String, src: String,
      scoreOf: (String, String, String) => String): String = {
    val mu = s"exp(least(greatest(d.x1*f.b1 + d.x2*f.b2 + f.coff, -30.0), 30.0))"
    s"""${tag}se AS (
       |  SELECT DISTINCT b1, b2, a, i AS iters, done, g11, g12, g22,
       |    sum(u*u*xt1*xt1) OVER () AS m11,
       |    sum(u*u*xt1*xt2) OVER () AS m12,
       |    sum(u*u*xt2*xt2) OVER () AS m22
       |  FROM (
       |    SELECT f.b1, f.b2, f.a, f.i, f.done, f.g11, f.g12, f.g22,
       |      ${scoreOf("d.y", mu, "f.a")} AS u,
       |      d.x1 - f.e1 AS xt1, d.x2 - f.e2 AS xt2
       |    FROM ${tag}fin f JOIN $src d ON d.rf = f.rf AND d.ls = f.ls))""".stripMargin
  }

  def negbinIrls3(src: String, tol: Double = 1e-9, maxIter: Int = 50): String = {
    val sums =
      """sum(w) OVER () AS s11, sum(w*x1) OVER () AS s12,
        |               sum(w*x2) OVER () AS s13, sum(w*x1*x1) OVER () AS s22,
        |               sum(w*x1*x2) OVER () AS s23, sum(w*x2*x2) OVER () AS s33,
        |               sum(w*z) OVER () AS c1, sum(w*x1*z) OVER () AS c2,
        |               sum(w*x2*z) OVER () AS c3,
        |               sum(devterm) OVER () AS devnow,
        |               sum((y - mu)*(y - mu) - y) OVER () AS anum,
        |               sum(mu*mu) OVER () AS aden""".stripMargin
    def solved(inner: String): String =
      pivotSolve3(inner, "s11", "s12", "s13", "s22", "s23", "s33",
        "c1", "c2", "c3", "nb0", "nb1", "nb2")
    s"""nbyb AS (SELECT sum(1.0*y)/sum(1.0) AS yb FROM $src),
       |nbit AS (
       |  SELECT 0 AS i, 0.0::DOUBLE AS b0, 0.0::DOUBLE AS b1, 0.0::DOUBLE AS b2,
       |    0.0::DOUBLE AS a, CAST('infinity' AS DOUBLE) AS dev,
       |    0.0::DOUBLE AS s11, 0.0::DOUBLE AS s12, 0.0::DOUBLE AS s13,
       |    0.0::DOUBLE AS s22, 0.0::DOUBLE AS s23, 0.0::DOUBLE AS s33,
       |    false AS done
       |  UNION ALL
       |  SELECT i + 1, nb0, nb1, nb2, greatest(anum/aden, 0.0), devnow,
       |    s11, s12, s13, s22, s23, s33,
       |    abs(devnow - dev)/(abs(devnow) + 0.1) < $tol
       |      AND i >= 1
       |      AND abs(greatest(anum/aden, 0.0) - a)
       |            /(greatest(anum/aden, 0.0) + 0.1) < $tol
       |  FROM ${solved(s"""(
       |      SELECT DISTINCT i, a, dev, $sums
       |        FROM (
       |          SELECT i, a, dev, x1, x2, y, mu,
       |            CASE WHEN a = 0.0 THEN mu ELSE mu/(1.0 + a*mu) END AS w,
       |            eta + (y - mu)/mu AS z,
       |            CASE WHEN a = 0.0
       |              THEN 2.0*((CASE WHEN y > 0.0 THEN y*ln(y/mu) ELSE 0.0 END)
       |                        - (y - mu))
       |              ELSE 2.0*((CASE WHEN y > 0.0 THEN y*ln(y/mu) ELSE 0.0 END)
       |                        - (y + 1.0/a)*ln((1.0 + a*y)/(1.0 + a*mu)))
       |            END AS devterm
       |          FROM (
       |            SELECT i, a, dev, x1, x2, y, eta,
       |              exp(least(greatest(eta, -30.0), 30.0)) AS mu
       |            FROM (
       |              SELECT q0.i AS i, q0.a AS a, q0.dev AS dev,
       |                d0.x1 AS x1, d0.x2 AS x2, d0.y AS y,
       |                CASE WHEN q0.i = 0
       |                  THEN ln((d0.y + (SELECT yb FROM nbyb))/2.0)
       |                  ELSE 1.0*q0.b0 + d0.x1*q0.b1 + d0.x2*q0.b2 END AS eta
       |              FROM nbit q0, $src d0
       |              WHERE q0.i < $maxIter AND NOT q0.done)
       |          )
       |        )
       |      )""")}
       |),
       |nbfin AS (SELECT b0, b1, b2, a, s11, s12, s13, s22, s23, s33, i, done
       |          FROM nbit WHERE i = (SELECT max(i) FROM nbit))""".stripMargin
  }

  // ---- tiny symbolic-determinant builder (SQL expression strings) ----
  private def minorM(m: Vector[Vector[String]], r: Int, c: Int): Vector[Vector[String]] =
    m.zipWithIndex.collect { case (row, i) if i != r =>
      row.zipWithIndex.collect { case (e, j) if j != c => e }
    }

  /** Cofactor-expansion determinant over SQL expression strings —
    * deterministic text, same shape both uses. NOT an op-order mirror
    * of LinAlg's pivoted elimination (ulps differ); callers must have
    * well-conditioned systems and probed margins (the q304 lesson).
    */
  private def detExpr(m: Vector[Vector[String]]): String = m.size match {
    case 1 => m(0)(0)
    case 2 => s"(${m(0)(0)})*(${m(1)(1)}) - (${m(0)(1)})*(${m(1)(0)})"
    case n =>
      (0 until n).map { j =>
        val t = s"(${m(0)(j)})*(${detExpr(minorM(m, 0, j))})"
        if (j == 0) t else if (j % 2 == 0) s"+ $t" else s"- $t"
      }.mkString(" ")
  }

  /** 4-parameter LOGISTIC IRLS (intercept + three covariates) as a
    * recursive CTE — the [[logisticIrls2]] Binomial chain with the
    * per-pass 4×4 normal equations solved by CRAMER determinants
    * (generated by the symbolic builder; ulp-off from the pivoted
    * LinAlg, fine for well-conditioned designs at the 4dp output
    * quantizer — margins probed). Emits `lg4it` and
    * `lg4fin(b0..b3, s11..s44, dev, i, done)` with the final pass's
    * weighted Gram carried for information/cluster SEs. `src` must
    * provide (x1, x2, x3, y ∈ {0,1}).
    */
  def logisticIrls4(src: String, tol: Double = 1e-9, maxIter: Int = 30): String = {
    val A = Vector(
      Vector("s11", "s12", "s13", "s14"),
      Vector("s12", "s22", "s23", "s24"),
      Vector("s13", "s23", "s33", "s34"),
      Vector("s14", "s24", "s34", "s44"))
    val rhs = Vector("c1", "c2", "c3", "c4")
    def replaced(col: Int): Vector[Vector[String]] =
      A.zipWithIndex.map { case (row, i) => row.updated(col, rhs(i)) }
    val detA = detExpr(A)
    val solves = (0 until 4).map(j => s"(${detExpr(replaced(j))})/det AS nb$j").mkString(",\n      ")
    def pass(keep: String, from: String): String =
      s"""SELECT $keep x1, x2, x3, y, mu*(1.0 - mu) AS w,
         |  eta + (y - mu)/(mu*(1.0 - mu)) AS z,
         |  -2.0*(CASE WHEN y > 0.0 THEN y*ln(mu) ELSE 0.0 END +
         |        CASE WHEN y < 1.0 THEN (1.0 - y)*ln(1.0 - mu) ELSE 0.0 END)
         |    AS devterm
         |FROM (
         |  SELECT $keep x1, x2, x3, y, eta,
         |    1.0/(1.0 + exp(-least(greatest(eta, -30.0), 30.0))) AS mu
         |  FROM $from)""".stripMargin
    val sums =
      """sum(w) OVER () AS s11, sum(w*x1) OVER () AS s12,
        |               sum(w*x2) OVER () AS s13, sum(w*x3) OVER () AS s14,
        |               sum(w*x1*x1) OVER () AS s22, sum(w*x1*x2) OVER () AS s23,
        |               sum(w*x1*x3) OVER () AS s24, sum(w*x2*x2) OVER () AS s33,
        |               sum(w*x2*x3) OVER () AS s34, sum(w*x3*x3) OVER () AS s44,
        |               sum(w*z) OVER () AS c1, sum(w*x1*z) OVER () AS c2,
        |               sum(w*x2*z) OVER () AS c3, sum(w*x3*z) OVER () AS c4,
        |               sum(devterm) OVER () AS devnow""".stripMargin
    def solved(inner: String): String =
      s"""(
         |  SELECT d.*,
         |      $solves
         |  FROM (SELECT q.*, $detA AS det FROM $inner q) d
         |)""".stripMargin
    s"""lg4it AS (
       |  SELECT 1 AS i, nb0 AS b0, nb1 AS b1, nb2 AS b2, nb3 AS b3,
       |    s11, s12, s13, s14, s22, s23, s24, s33, s34, s44,
       |    devnow AS dev, false AS done
       |  FROM ${solved(s"""(
       |      SELECT DISTINCT $sums
       |        FROM (
       |          ${pass("", s"""(
       |            SELECT x1, x2, x3, y,
       |              ln(((y + 0.5)/2.0)/(1.0 - (y + 0.5)/2.0)) AS eta
       |            FROM $src)""")}
       |        )
       |      )""")}
       |  UNION ALL
       |  SELECT i + 1, nb0, nb1, nb2, nb3,
       |    s11, s12, s13, s14, s22, s23, s24, s33, s34, s44, devnow,
       |    abs(devnow - dev)/(abs(devnow) + 0.1) < $tol
       |  FROM ${solved(s"""(
       |      SELECT DISTINCT i, dev, $sums
       |        FROM (
       |          ${pass("i, dev,", s"""(
       |            SELECT q.i, q.dev, d.x1, d.x2, d.x3, d.y,
       |              1.0*q.b0 + d.x1*q.b1 + d.x2*q.b2 + d.x3*q.b3 AS eta
       |            FROM lg4it q, $src d WHERE q.i < $maxIter AND NOT q.done)""")}
       |        )
       |      )""")}
       |),
       |lg4fin AS (SELECT b0, b1, b2, b3,
       |             s11, s12, s13, s14, s22, s23, s24, s33, s34, s44, i, done,
       |             dev
       |           FROM lg4it WHERE i = (SELECT max(i) FROM lg4it))""".stripMargin
  }

  /** Determinant of the symmetric 4×4 Gram (s11..s44 column names) —
    * the `det` the [[inv4Row1]] cofactors divide by.
    */
  def det4Sym: String = detExpr(Vector(
    Vector("s11", "s12", "s13", "s14"),
    Vector("s12", "s22", "s23", "s24"),
    Vector("s13", "s23", "s33", "s34"),
    Vector("s14", "s24", "s34", "s44")))

  /** Row 1 (the first covariate) of the symmetric 4×4 inverse as SQL
    * expressions (r0..r3 — cofactors over `det`), for information /
    * sandwich SEs of the `lg4fin` Gram.
    */
  def inv4Row1(prefix: String = ""): String = {
    val A = Vector(
      Vector("s11", "s12", "s13", "s14"),
      Vector("s12", "s22", "s23", "s24"),
      Vector("s13", "s23", "s33", "s34"),
      Vector("s14", "s24", "s34", "s44"))
    // inv[1][j] = (−1)^{1+j}·det(minor(j, 1))/det (A symmetric)
    def cof(j: Int): String = {
      val d = detExpr(minorM(A, j, 1))
      if ((1 + j) % 2 == 0) s"($d)" else s"(-($d))"
    }
    s"""${cof(0)}/det AS ${prefix}r0,
       |    ${cof(1)}/det AS ${prefix}r1,
       |    ${cof(2)}/det AS ${prefix}r2,
       |    ${cof(3)}/det AS ${prefix}r3""".stripMargin
  }

  /** Cox proportional-hazards Newton loop (TWO covariates, Breslow
    * ties) as a recursive CTE — [[graft.ml.Cox.fit]]'s exact chain:
    * per pass, the distinct-duration collapse (PARTITION BY t window
    * sums + DISTINCT — DuckDB's recursive term forbids GROUP BY, the
    * same trick the IRLS replays use for the global sums), ascending
    * prefix + total windows standing in for `Rank.withPrefixSums`
    * (suffix risk sets as tot − cum + value), the dt > 0 event
    * reduction, and the 2×2 Newton solve in [[logisticIrls2]]'s exact
    * pivot order. State carries the pass's Hessian — the converged
    * model's Wald SEs read EXACTLY that matrix (Cox.fit's hLast); a
    * maxIter exit recomputes H at the final β (`cxh` handles both).
    * Emits `cxit`, `cxfin(b0, b1, h00, h01, h11, ll, i, done)` and
    * `cxh(h00, h01, h11)`. `src` must provide (t, ev ∈ {0,1}, x0, x1).
    */
  def coxNewton2(src: String, tol: Double = 1e-9, maxIter: Int = 25): String = {
    // per-pass pipeline from a (carried-cols + t, ev, x0, x1, eta) base:
    // per-t window collapse → DISTINCT → prefix/total windows → dt>0
    // reduction windows → DISTINCT. `keep` columns ride the whole way.
    def pass(keep: String, from: String, hOnly: Boolean): String = {
      val evAggs =
        s"""sum(CASE WHEN ev = 1 THEN eta ELSE 0.0 END) OVER (PARTITION BY t) AS ev_eta,
           |      sum(CASE WHEN ev = 1 THEN x0 ELSE 0.0 END) OVER (PARTITION BY t) AS ex_0,
           |      sum(CASE WHEN ev = 1 THEN x1 ELSE 0.0 END) OVER (PARTITION BY t) AS ex_1""".stripMargin
      val reduceCols =
        if (hOnly)
          """sum(dt*(sw200/s0 - (sw10/s0)*(sw10/s0))) OVER () AS h00,
            |    sum(dt*(sw201/s0 - (sw10/s0)*(sw11/s0))) OVER () AS h01,
            |    sum(dt*(sw211/s0 - (sw11/s0)*(sw11/s0))) OVER () AS h11""".stripMargin
        else
          """sum(ev_eta - dt*ln(s0)) OVER () AS llnow,
            |    sum(ex_0 - dt*(sw10/s0)) OVER () AS g0,
            |    sum(ex_1 - dt*(sw11/s0)) OVER () AS g1,
            |    sum(dt*(sw200/s0 - (sw10/s0)*(sw10/s0))) OVER () AS h00,
            |    sum(dt*(sw201/s0 - (sw10/s0)*(sw11/s0))) OVER () AS h01,
            |    sum(dt*(sw211/s0 - (sw11/s0)*(sw11/s0))) OVER () AS h11""".stripMargin
      s"""SELECT DISTINCT $keep $reduceCols
         |FROM (
         |  SELECT $keep dt, ev_eta, ex_0, ex_1,
         |    (tw0 - cw0) + w0 AS s0,
         |    (tw1_0 - cw1_0) + w1_0 AS sw10,
         |    (tw1_1 - cw1_1) + w1_1 AS sw11,
         |    (tw2_00 - cw2_00) + w2_00 AS sw200,
         |    (tw2_01 - cw2_01) + w2_01 AS sw201,
         |    (tw2_11 - cw2_11) + w2_11 AS sw211
         |  FROM (
         |    SELECT $keep t, w0, w1_0, w1_1, w2_00, w2_01, w2_11, dt, ev_eta,
         |      ex_0, ex_1,
         |      sum(w0) OVER wc AS cw0, sum(w0) OVER () AS tw0,
         |      sum(w1_0) OVER wc AS cw1_0, sum(w1_0) OVER () AS tw1_0,
         |      sum(w1_1) OVER wc AS cw1_1, sum(w1_1) OVER () AS tw1_1,
         |      sum(w2_00) OVER wc AS cw2_00, sum(w2_00) OVER () AS tw2_00,
         |      sum(w2_01) OVER wc AS cw2_01, sum(w2_01) OVER () AS tw2_01,
         |      sum(w2_11) OVER wc AS cw2_11, sum(w2_11) OVER () AS tw2_11
         |    FROM (
         |      SELECT DISTINCT $keep t,
         |        sum(wgt) OVER (PARTITION BY t) AS w0,
         |        sum(x0*wgt) OVER (PARTITION BY t) AS w1_0,
         |        sum(x1*wgt) OVER (PARTITION BY t) AS w1_1,
         |        sum(x0*x0*wgt) OVER (PARTITION BY t) AS w2_00,
         |        sum(x0*x1*wgt) OVER (PARTITION BY t) AS w2_01,
         |        sum(x1*x1*wgt) OVER (PARTITION BY t) AS w2_11,
         |        sum(CAST(ev AS BIGINT)) OVER (PARTITION BY t) AS dt,
         |        $evAggs
         |      FROM (SELECT $keep t, ev, x0, x1, eta, exp(eta) AS wgt
         |            FROM $from)
         |    )
         |    WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
         |                  AND CURRENT ROW)
         |  )
         |  WHERE dt > 0
         |)""".stripMargin
    }
    // 2×2 pivoted solve on [[h00,h01],[h01,h11]] x = (g0,g1), the
    // logisticIrls2 CASE pattern verbatim
    val solve =
      """SELECT u.*, (v0 - m01*d1n)/m00 AS d0, d1n AS d1
        |FROM (
        |  SELECT w.*, (v1 - (m10/m00)*v0) / (m11 - (m10/m00)*m01) AS d1n
        |  FROM (
        |    SELECT p.*,
        |      CASE WHEN abs(h01) > abs(h00) THEN h01 ELSE h00 END AS m00,
        |      CASE WHEN abs(h01) > abs(h00) THEN h11 ELSE h01 END AS m01,
        |      CASE WHEN abs(h01) > abs(h00) THEN h00 ELSE h01 END AS m10,
        |      CASE WHEN abs(h01) > abs(h00) THEN h01 ELSE h11 END AS m11,
        |      CASE WHEN abs(h01) > abs(h00) THEN g1 ELSE g0 END AS v0,
        |      CASE WHEN abs(h01) > abs(h00) THEN g0 ELSE g1 END AS v1""".stripMargin
    s"""cxit AS (
       |  SELECT 0 AS i, 0.0::DOUBLE AS b0, 0.0::DOUBLE AS b1,
       |    CAST('-infinity' AS DOUBLE) AS ll,
       |    0.0::DOUBLE AS h00, 0.0::DOUBLE AS h01, 0.0::DOUBLE AS h11,
       |    false AS done
       |  UNION ALL
       |  SELECT i + 1, b0 + d0, b1 + d1, llnow, h00, h01, h11,
       |    (CASE WHEN abs(d0) > abs(d1) THEN abs(d0) ELSE abs(d1) END) < $tol
       |      AND abs(llnow - ll) < 1e-12*(1.0 + abs(llnow))
       |  FROM (
       |    $solve
       |    FROM (
       |      ${pass("i, b0, b1, ll,", s"""(
       |        SELECT q.i, q.b0, q.b1, q.ll, d.t, d.ev, d.x0, d.x1,
       |          q.b0*d.x0 + q.b1*d.x1 AS eta
       |        FROM cxit q, $src d WHERE q.i < $maxIter AND NOT q.done)""", hOnly = false)}
       |      ) p
       |    ) w
       |  ) u
       |  )
       |),
       |cxfin AS (SELECT b0, b1, h00, h01, h11, ll, i, done
       |          FROM cxit WHERE i = (SELECT max(i) FROM cxit)),
       |cxrecomp AS (
       |  ${pass("", s"""(
       |    SELECT d.t, d.ev, d.x0, d.x1, f.b0*d.x0 + f.b1*d.x1 AS eta
       |    FROM $src d, cxfin f)""", hOnly = true)}
       |),
       |cxh AS (SELECT
       |    CASE WHEN f.done THEN f.h00 ELSE r.h00 END AS h00,
       |    CASE WHEN f.done THEN f.h01 ELSE r.h01 END AS h01,
       |    CASE WHEN f.done THEN f.h11 ELSE r.h11 END AS h11
       |  FROM cxfin f, cxrecomp r)""".stripMargin
  }

  /** 3-parameter CLOGLOG IRLS (intercept + two covariates) as a
    * recursive CTE — [[graft.ml.Glm.Cloglog]]'s exact link chain
    * (η clamped to [−30, 3.4], μ = 1 − e^{−e^η} floored at 1e-12,
    * dμ/dη = −(1−μ)·ln(1−μ), w = (1−μ)·ln²(1−μ)/μ, the ln(−ln(1−m))
    * init), the per-pass 3×3 normal equations through [[pivotSolve3]].
    * Emits `cit` and `cfin(b0, b1, b2, s11..s33, dev, i, done)` — the
    * final pass's weighted Gram rides along because the robust
    * sandwich's bread is exactly that matrix (NOT a recompute at the
    * final β). `src` must provide (x1, x2, y); the enclosing query
    * must open with WITH RECURSIVE.
    */
  def cloglogIrls3(src: String, tol: Double = 1e-9, maxIter: Int = 30): String = {
    def pass(keep: String, from: String): String =
      s"""SELECT $keep x1, x2, y,
         |  (1.0 - mu)*ln(1.0 - mu)*ln(1.0 - mu)/mu AS w,
         |  eta + (y - mu)/((-(1.0 - mu))*ln(1.0 - mu)) AS z,
         |  -2.0*(CASE WHEN y > 0.0 THEN y*ln(mu) ELSE 0.0 END +
         |        CASE WHEN y < 1.0 THEN (1.0 - y)*ln(1.0 - mu) ELSE 0.0 END)
         |    AS devterm
         |FROM (
         |  SELECT $keep x1, x2, y, eta,
         |    least(greatest(1.0 - exp(-exp(ec)), 1e-12), 1.0 - 1e-12) AS mu
         |  FROM (
         |    SELECT $keep x1, x2, y, eta, least(greatest(eta, -30.0), 3.4) AS ec
         |    FROM $from))""".stripMargin
    val sums =
      """sum(w) OVER () AS s11, sum(w*x1) OVER () AS s12,
        |               sum(w*x2) OVER () AS s13, sum(w*x1*x1) OVER () AS s22,
        |               sum(w*x1*x2) OVER () AS s23, sum(w*x2*x2) OVER () AS s33,
        |               sum(w*z) OVER () AS c1, sum(w*x1*z) OVER () AS c2,
        |               sum(w*x2*z) OVER () AS c3,
        |               sum(devterm) OVER () AS devnow""".stripMargin
    def solved(inner: String): String =
      pivotSolve3(inner, "s11", "s12", "s13", "s22", "s23", "s33",
        "c1", "c2", "c3", "nb0", "nb1", "nb2")
    s"""cit AS (
       |  SELECT 1 AS i, nb0 AS b0, nb1 AS b1, nb2 AS b2,
       |    s11, s12, s13, s22, s23, s33, devnow AS dev, false AS done
       |  FROM ${solved(s"""(
       |      SELECT DISTINCT $sums
       |        FROM (
       |          ${pass("", s"""(
       |            SELECT x1, x2, y,
       |              ln(-ln(1.0 - (y + 0.5)/2.0)) AS eta
       |            FROM $src)""")}
       |        )
       |      )""")}
       |  UNION ALL
       |  SELECT i + 1, nb0, nb1, nb2, s11, s12, s13, s22, s23, s33, devnow,
       |    abs(devnow - dev)/(abs(devnow) + 0.1) < $tol
       |  FROM ${solved(s"""(
       |      SELECT DISTINCT i, dev, $sums
       |        FROM (
       |          ${pass("i, dev,", s"""(
       |            SELECT q.i, q.dev, d.x1, d.x2, d.y,
       |              1.0*q.b0 + d.x1*q.b1 + d.x2*q.b2 AS eta
       |            FROM cit q, $src d WHERE q.i < $maxIter AND NOT q.done)""")}
       |        )
       |      )""")}
       |),
       |cfin AS (SELECT b0, b1, b2, s11, s12, s13, s22, s23, s33, dev, i, done
       |         FROM cit WHERE i = (SELECT max(i) FROM cit))""".stripMargin
  }
}
