package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class InferenceSpec extends SparkSpec {
  import spark.implicits._

  test("Survival.logRank: hand-computed O/E/chi2 on a tiny two-group table") {
    // A: events at t=1,2; B: events at t=3,4 (all events, no censoring)
    val rows = Seq((1.0, 1, "A"), (2.0, 1, "A"), (3.0, 1, "B"), (4.0, 1, "B"))
    val r = Survival.logRank(rows.toDF("t", "ev", "g"), "t", "ev", "g", "A").head()
    // t=1: n=4, nA=2, d=1, dA=1, E=1/2, V=(1/2)(1/2)(3/3)=1/4
    // t=2: n=3, nA=1, d=1, dA=1, E=1/3, V=(1/3)(2/3)(2/2)=2/9
    // t=3: n=2, nA=0, E=0, V=0 (excluded? nj=2>1, d=1: V=(0)(1)(1/1)=0)
    // t=4: nj=1 → excluded by nj>1
    val eHand = 0.5 + 1.0 / 3
    val vHand = 0.25 + 2.0 / 9
    val chiHand = math.pow(2.0 - eHand, 2) / vHand
    assert(r.getAs[Long]("o_a") === 2L)
    assert(math.abs(r.getAs[Double]("e_a") - eHand) < 1e-6)
    assert(math.abs(r.getAs[Double]("chi2") - chiHand) < 1e-5)
  }

  test("Survival.logRank: separated curves alarm, identical curves do not") {
    val rng = new scala.util.Random(31)
    val sep = (1 to 400).map { i =>
      val g = if (i % 2 == 0) "A" else "B"
      val rate = if (g == "A") 2.0 else 0.5 // A dies 4x faster
      (-math.log(rng.nextDouble()) / rate, 1, g)
    }
    val chiSep = Survival.logRank(sep.toDF("t", "ev", "g"), "t", "ev", "g", "A")
      .head().getAs[Double]("chi2")
    assert(chiSep > 20.0, s"separated curves should alarm, chi2=$chiSep")

    val same = (1 to 400).map { i =>
      (-math.log(rng.nextDouble()), 1, if (i % 2 == 0) "A" else "B")
    }
    val chiSame = Survival.logRank(same.toDF("t", "ev", "g"), "t", "ev", "g", "A")
      .head().getAs[Double]("chi2")
    assert(chiSame < 6.0, s"identical curves should not alarm, chi2=$chiSame")
  }

  test("Decompose.mediation: full mediation → direct ≈ 0, indirect ≈ total effect") {
    val rng = new scala.util.Random(12)
    val rows = (1 to 4000).map { _ =>
      val x = rng.nextGaussian()
      val m = 2.0 * x + rng.nextGaussian() * 0.3
      val y = 3.0 * m + rng.nextGaussian() * 0.3 // y depends on x ONLY via m
      (x, m, y)
    }
    val r = Decompose.mediation(rows.toDF("x", "m", "y"), "x", "m", "y").head()
    assert(math.abs(r.getAs[Double]("a_path") - 2.0) < 0.05)
    assert(math.abs(r.getAs[Double]("b_path") - 3.0) < 0.05)
    assert(math.abs(r.getAs[Double]("direct")) < 0.15, "direct path should vanish")
    assert(math.abs(r.getAs[Double]("indirect") - 6.0) < 0.2)
    assert(r.getAs[Double]("sobel_z") > 20.0)
  }

  test("Decompose.mediation: no mediation → indirect ≈ 0, Sobel insignificant") {
    val rng = new scala.util.Random(14)
    val rows = (1 to 4000).map { _ =>
      val x = rng.nextGaussian()
      val m = rng.nextGaussian() // independent of x
      val y = 2.0 * x + rng.nextGaussian() * 0.3
      (x, m, y)
    }
    val r = Decompose.mediation(rows.toDF("x", "m", "y"), "x", "m", "y").head()
    assert(math.abs(r.getAs[Double]("indirect")) < 0.05)
    assert(math.abs(r.getAs[Double]("sobel_z")) < 3.0)
    assert(math.abs(r.getAs[Double]("direct") - 2.0) < 0.05)
  }

  test("Abtest.msprt: planted lift drives p_av to ~0; null keeps it high") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(i: Int) = new java.sql.Timestamp(base.getTime + i * 1000L)
    val rng = new scala.util.Random(19)
    val lifted = (1 to 4000).map { i =>
      val arm = i % 2
      val v = rng.nextGaussian() + (if (arm == 0) 0.0 else 0.5)
      (i.toLong, ts(i), arm.toLong, v)
    }
    val df = lifted.toDF("event_id", "ts", "arm", "value")
    val out = graft.ops.Abtest.msprt(
      df, when(col("arm") === 0, "A").otherwise("B"), col("value"),
      "ts", "event_id", tau = 1.0, minPerArm = 30, emitEvery = 500)
      .orderBy("at_event").collect()
    assert(out.length === 8)
    assert(out.last.getAs[Double]("p_av") < 1e-6, "a 0.5σ lift must be detected")
    assert(math.abs(out.last.getAs[Double]("delta") - 0.5) < 0.1)

    val nullData = (1 to 4000).map { i =>
      (i.toLong, ts(i), (i % 2).toLong, rng.nextGaussian())
    }
    val outN = graft.ops.Abtest.msprt(
      nullData.toDF("event_id", "ts", "arm", "value"),
      when(col("arm") === 0, "A").otherwise("B"), col("value"),
      "ts", "event_id", tau = 1.0, minPerArm = 30, emitEvery = 500)
      .collect()
    // always-valid: under H0 the p stays comfortably high (this seed)
    assert(outN.forall(_.getAs[Double]("p_av") > 0.05))
  }
}
