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
}
