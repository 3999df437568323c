package graft.ops

import graft.SparkSpec

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("Agreement.cohenKappa: perfect 1, independent ~0, hand 2x2, disagreement-only labels count") {
    val perfect = Seq(("k", "k"), ("d", "d"), ("k", "k")).toDF("a", "b")
    assert(Agreement.cohenKappa(perfect, "a", "b").head().getAs[Double]("kappa") === 1.0)

    // hand 2x2: cells kk=20, kd=5, dk=10, dd=15 → n=50
    // po = 35/50 = 0.7; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    val rows = Seq.fill(20)(("k", "k")) ++ Seq.fill(5)(("k", "d")) ++
      Seq.fill(10)(("d", "k")) ++ Seq.fill(15)(("d", "d"))
    val r = Agreement.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Double]("p_o") === 0.7)
    assert(r.getAs[Double]("p_e") === 0.5)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-9)

    // a label the raters NEVER agree on still carries chance mass:
    // a: x,x  b: y,y plus one (y,x) — label x in both margins, no (x,x)
    val never = Seq(("x", "y"), ("x", "y"), ("y", "x")).toDF("a", "b")
    val r2 = Agreement.cohenKappa(never, "a", "b").head()
    // margins a: x=2,y=1; b: y=2,x=1 → pe = (2*1 + 1*2)/9 = 4/9 ≠ 0
    assert(math.abs(r2.getAs[Double]("p_e") - 4.0 / 9) < 1e-6)
    assert(r2.getAs[Double]("p_o") === 0.0)
  }

  test("Agreement.partialCorr: confounder-driven correlation vanishes given z") {
    val rng = new scala.util.Random(23)
    // x and y both driven by z, no direct link: r_xy large, r_xy.z ~ 0
    val rows = (1 to 6000).map { _ =>
      val z = rng.nextGaussian()
      (2.0 * z + rng.nextGaussian() * 0.5, -1.5 * z + rng.nextGaussian() * 0.5, z)
    }
    val r = Agreement.partialCorr(rows.toDF("x", "y", "z"), "x", "y", "z").head()
    assert(math.abs(r.getAs[Double]("r_xy")) > 0.7, "confounded marginal correlation")
    assert(math.abs(r.getAs[Double]("r_xy_given_z")) < 0.05, "should vanish given z")

    // direct link survives the partial
    val rows2 = (1 to 6000).map { _ =>
      val z = rng.nextGaussian()
      val x = z + rng.nextGaussian()
      (x, 2.0 * x + z + rng.nextGaussian() * 0.3, z)
    }
    val r2 = Agreement.partialCorr(rows2.toDF("x", "y", "z"), "x", "y", "z").head()
    assert(r2.getAs[Double]("r_xy_given_z") > 0.8)
  }
}
