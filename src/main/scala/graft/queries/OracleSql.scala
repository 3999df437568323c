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
}
