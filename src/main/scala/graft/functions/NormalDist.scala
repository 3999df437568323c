package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Standard-normal CDF as PORTABLE column algebra — Zelen & Severo's
  * polynomial (Abramowitz & Stegun 26.2.17, |ε| < 7.5e-8): both
  * engines evaluate the identical exp + Horner chain in the same IEEE
  * order, so Φ (and the p-values built on it) cross-check at the 6dp
  * quantizer without either engine needing a native erf. Spark has no
  * built-in normal CDF and DuckDB's erf availability varies — a shared
  * closed form beats both.
  */
object NormalDist {
  val B1 = 0.319381530
  val B2 = -0.356563782
  val B3 = 1.781477937
  val B4 = -1.821255978
  val B5 = 1.330274429
  val P = 0.2316419
  val INV_SQRT_2PI = 0.3989422804014327 // 1/sqrt(2π)

  /** Φ(x) for any-sign x (reflection on the absolute value). */
  def phi(x: Column): Column = {
    val ax = abs(x)
    val t = lit(1.0) / (lit(1.0) + lit(P) * ax)
    val pdf = lit(INV_SQRT_2PI) * exp(-(ax * ax) / lit(2.0))
    // Horner: t(b1 + t(b2 + t(b3 + t(b4 + t·b5))))
    val poly = t * (lit(B1) + t * (lit(B2) + t * (lit(B3) + t * (lit(B4) + t * lit(B5)))))
    val upper = lit(1.0) - pdf * poly
    when(x >= 0, upper).otherwise(lit(1.0) - upper)
  }

  /** The same Φ in DuckDB SQL over a sql expression string. */
  def phiSql(x: String): String = {
    val ax = s"abs($x)"
    val t = s"(1.0/(1.0 + $P*$ax))"
    val pdf = s"($INV_SQRT_2PI*exp(-($ax*$ax)/2.0))"
    val poly = s"($t*($B1 + $t*($B2 + $t*($B3 + $t*($B4 + $t*$B5)))))"
    s"(CASE WHEN $x >= 0 THEN 1.0 - $pdf*$poly ELSE 1.0 - (1.0 - $pdf*$poly) END)"
  }

  /** Two-sided p-value of a z statistic: 2·(1 − Φ(|z|)). */
  def pTwoSided(z: Column): Column = lit(2.0) * (lit(1.0) - phi(abs(z)))

  def pTwoSidedSql(z: String): String = s"(2.0*(1.0 - ${phiSql(s"abs($z)")}))"

  /** 1 − Φ(z) as a DRIVER scalar — the identical Zelen & Severo chain
    * the column form evaluates, so driver-computed p-values (Hausman,
    * unit roots) stay bit-compatible with the in-plan ones.
    */
  def upperTail(z: Double): Double = {
    val az = math.abs(z)
    val t = 1.0 / (1.0 + P * az)
    val pdf = INV_SQRT_2PI * math.exp(-(az * az) / 2.0)
    val poly = t * (B1 + t * (B2 + t * (B3 + t * (B4 + t * B5))))
    if (z >= 0) pdf * poly else 1.0 - pdf * poly
  }

  /** χ²(df) upper tail Q(x; df) for INTEGER df, exact up to the Φ
    * polynomial: Q₁(x) = 2(1 − Φ(√x)), Q₂(x) = e^(−x/2), and the
    * standard recurrence Q_{k+2}(x) = Q_k(x) + (x/2)^{k/2}·e^(−x/2)/Γ(k/2+1)
    * climbs to any df — closed form, no incomplete-gamma iteration, and
    * df = 1 reproduces the historical 2(1−Φ(√H)) bits exactly.
    */
  def chiSqUpperTail(x: Double, df: Int): Double = {
    require(df >= 1, s"chiSqUpperTail: df must be >= 1, got $df")
    if (x <= 0) return 1.0
    if (df % 2 == 1) {
      // odd: Q1 + e^(-x/2) · Σ terms; term_j = x^(j-1/2)... use the
      // recurrence directly: k = 1, 3, 5, …
      var q = 2.0 * upperTail(math.sqrt(x))
      // Γ(k/2 + 1) for k odd: Γ(3/2)=√π/2, then ·(k/2+… ) — build the
      // additive term iteratively: t_k = (x/2)^(k/2) e^(-x/2) / Γ(k/2+1)
      var k = 1
      var term = math.sqrt(x / 2.0) * math.exp(-x / 2.0) / (math.sqrt(Math.PI) / 2.0)
      while (k + 2 <= df) {
        q += term
        k += 2
        term *= x / k.toDouble // t_{k} = t_{k-2} · (x/2)/(k/2) = t_{k-2} · x/k
      }
      math.min(1.0, math.max(0.0, q))
    } else {
      var q = math.exp(-x / 2.0)
      var term = q
      var k = 2
      while (k + 2 <= df) {
        term *= x / k.toDouble
        q += term
        k += 2
      }
      math.min(1.0, math.max(0.0, q))
    }
  }
}
