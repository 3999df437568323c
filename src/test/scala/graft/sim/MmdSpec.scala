package graft.sim

import graft.SparkSpec

class MmdSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")

  private val base = (0 until 40).map(i =>
    (i.toLong, Seq(math.sin(i * 0.3).toFloat, math.cos(i * 0.7).toFloat)))

  test("Embed.mmdDrift: identical populations score exactly zero") {
    val r = Embed.mmdDrift(vecs(base), vecs(base), "embedding").head()
    assert(r.getAs[Double]("mmd2_lin") === 0.0)
    assert(r.getAs[Double]("mmd2_quad") === 0.0)
    assert(r.getAs[Long]("n_a") === 40L && r.getAs[Long]("n_b") === 40L)
  }

  test("Embed.mmdDrift: pure mean shift reads exactly in the linear term; dense parity") {
    // shift every vector by (0.5, -0.25): mmd2_lin = 0.5^2 + 0.25^2
    val shifted = base.map { case (id, v) =>
      (id + 1000L, Seq(v(0) + 0.5f, v(1) - 0.25f))
    }
    val r = Embed.mmdDrift(vecs(base), vecs(shifted), "embedding").head()
    val lin = r.getAs[Double]("mmd2_lin")
    assert(math.abs(lin - (0.25 + 0.0625)) < 1e-4, s"lin=$lin")
    // dense replica of both statistics
    def moments(rows: Seq[(Long, Seq[Float])]) = {
      val n = rows.length.toDouble
      val d = 2
      val mu = Array.tabulate(d)(i => rows.map(_._2(i).toDouble).sum / n)
      val m = Array.tabulate(d, d)((i, j) =>
        rows.map(r => r._2(i).toDouble * r._2(j).toDouble).sum / n)
      (mu, m)
    }
    val (muA, ma) = moments(base); val (muB, mb) = moments(shifted)
    val linRef = muA.zip(muB).map { case (x, y) => (x - y) * (x - y) }.sum
    def k(mx: Array[Array[Double]], my: Array[Array[Double]],
        ux: Array[Double], uy: Array[Double]) = {
      val f = (for (i <- 0 to 1; j <- 0 to 1) yield mx(i)(j) * my(i)(j)).sum
      f + 2.0 * ux.zip(uy).map { case (a, b) => a * b }.sum + 1.0
    }
    val quadRef = k(ma, ma, muA, muA) + k(mb, mb, muB, muB) - 2.0 * k(ma, mb, muA, muB)
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(lin === q6(linRef))
    assert(r.getAs[Double]("mmd2_quad") === q6(quadRef))
  }

  test("Embed.mmdDrift: covariance-only drift is invisible to the linear term, visible to quad") {
    // same mean (zero), different spread: B = 3x scaled mirror pairs
    val aRows = (0 until 30).flatMap(i => Seq(
      (2L * i, Seq(0.2f, -0.1f)), (2L * i + 1, Seq(-0.2f, 0.1f))))
    val bRows = (0 until 30).flatMap(i => Seq(
      (2L * i + 1000, Seq(0.6f, -0.3f)), (2L * i + 1001, Seq(-0.6f, 0.3f))))
    val r = Embed.mmdDrift(vecs(aRows), vecs(bRows), "embedding").head()
    assert(r.getAs[Double]("mmd2_lin") === 0.0, "means are identical")
    assert(r.getAs[Double]("mmd2_quad") > 0.01,
      s"second-moment drift must register: ${r.getAs[Double]("mmd2_quad")}")
    // dimension mismatch raises
    val bad = vecs(Seq((1L, Seq(1f, 2f, 3f))))
    intercept[IllegalArgumentException](
      Embed.mmdDrift(vecs(aRows), bad, "embedding"))
  }
}
