package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  test("percentileWithin: hand-checked ranks, tie sharing, per-group isolation") {
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 20.0), (4L, "a", 40.0), (5L, "a", 50.0),
      (6L, "b", 7.0), (7L, "b", 9.0)
    ).toDF("id", "g", "score")
    val got = Calibrate.percentileWithin(df, "score", Seq("g"))
      .select("id", "pct_rank").as[(Long, Double)].collect().toMap
    // group a (n=5): ranks over (n-1)=4 -> 0, .25, .25, .75, 1
    assert(got(1L) === 0.0)
    assert(got(2L) === 0.25 && got(3L) === 0.25) // tie shares the min rank
    assert(got(4L) === 0.75)
    assert(got(5L) === 1.0)
    // group b independent of a's values
    assert(got(6L) === 0.0 && got(7L) === 1.0)
  }

  test("weightedTake: exact n, partition-deterministic, key formula matches a driver reference, weights bias inclusion") {
    import graft.ops.Sampling
    val df = (1L to 400L).map(i => (i, if (i <= 40) 50.0 else 1.0)).toDF("id", "w")
    def ids(parts: Int, salt: String) = Sampling
      .weightedTake(df.repartition(parts), "id", "w", n = 60, salt = salt)
      .select("id").as[Long].collect().toSet
    val a = ids(1, "s1")
    assert(a === ids(7, "s1")) // deterministic under partitioning
    assert(a.size === 60)
    // reference: recompute keys driver-side, same top-60
    val M = 1152921504606846976.0
    val refKeys = (1L to 400L).map { i =>
      val h = new java.math.BigInteger(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"s1:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
        .longValue()
      val u = (h.toDouble + 1.0) / M
      i -> -math.log(u) / (if (i <= 40) 50.0 else 1.0)
    }
    val ref = refKeys.sortBy { case (i, k) => (k, i) }.take(60).map(_._1).toSet
    assert(a === ref)
    // heavy weights (10% of rows, 50x weight) dominate the sample
    val heavy = a.count(_ <= 40)
    assert(heavy > 25, s"only $heavy of 40 heavy rows sampled")
    // zero weight fails loudly
    val err = intercept[Exception] {
      Sampling.weightedTake(
        Seq((1L, 0.0)).toDF("id", "w"), "id", "w", n = 1).collect()
    }
    val chain = Iterator.iterate[Throwable](err)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString("|")
    assert(chain.contains("non-positive weight"), chain.take(300))
  }

  test("KS drift: hand-computed D on a planted shift, zero for an identical group, scipy-checkable value") {
    import graft.ops.Drift
    // group "same" mirrors the pooled distribution of itself vs all;
    // group "hi" is shifted entirely above group "lo"
    val lo = (1 to 10).map(v => ("lo", v))
    val hi = (1 to 10).map(v => ("hi", v + 10))
    val df = (lo ++ hi).toDF("g", "x")
    val got = Drift.ksTest(df, "x", "g")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // pooled ECDF at x=10: 10/20 = 0.5; F_lo(10) = 1 -> D_lo = 0.5; by
    // symmetry D_hi = 0.5 (largest gap at x=10: F_hi = 0 vs 0.5)
    assert((got("lo")._1, got("lo")._2) === ((10L, 0.5)))
    assert((got("hi")._1, got("hi")._2) === ((10L, 0.5)))
    // Kolmogorov asymptotic p at D=0.5, en = 10*20/30: lambda =
    // (sqrt(en)+0.12+0.11/sqrt(en))*0.5 ~ 1.3719 -> p ~ 0.0461
    assert(got("lo")._3 > 0.02 && got("lo")._3 < 0.08, s"p ${got("lo")._3}")
    // a group identical to the pool drifts zero, with p = 1
    val one = (1 to 6).map(v => ("a", v)) ++ (1 to 6).map(v => ("b", v))
    val z = Drift.ksTest(one.toDF("g", "x"), "x", "g")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(z("a")._1 === 0.0 && z("b")._1 === 0.0)
    assert(z("a")._2 === 1.0 && z("b")._2 === 1.0)
  }

  test("k-anonymity: audit flags below-k combos, suppress removes exactly their rows, summary counts the cost") {
    import graft.ops.Anonymity
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "x"), // combo (a,x): n=3, safe at k=3
      (4L, "a", "y"), (5L, "a", "y"), // (a,y): n=2, risky at k=3
      (6L, "b", "x") // (b,x): n=1, risky
    ).toDF("id", "src", "lng")
    val audit = Anonymity.audit(df, Seq("src", "lng"), k = 3)
      .as[(String, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(audit(("a", "x")) === ((3L, false)))
    assert(audit(("a", "y")) === ((2L, true)))
    assert(audit(("b", "x")) === ((1L, true)))
    val sum = Anonymity.summary(df, Seq("src", "lng"), k = 3).head()
    assert((sum.getLong(0), sum.getLong(1), sum.getLong(2), sum.getLong(3)) === ((3L, 2L, 3L, 1L)))
    val kept = Anonymity.suppress(df, Seq("src", "lng"), k = 3)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L))
  }

  test("robustZ: hand-computed median/MAD, outlier magnitude, degenerate MAD guarded") {
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0), (5L, "a", 100.0),
      (6L, "b", 5.0), (7L, "b", 5.0), (8L, "b", 5.0)
    ).toDF("id", "g", "x")
    val got = Calibrate.robustZ(df, "x", Seq("g"))
      .select("id", "med", "mad", "robust_z")
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    // group a: med=3, |x-3| = 2,1,0,1,97 -> mad=1
    assert(got(1L)._2 === 3.0 && got(1L)._3 === 1.0)
    val expect5 = BigDecimal((100.0 - 3.0) / 1.4826)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(5L)._4 === expect5)
    assert(math.abs(got(5L)._4) > 10) // the outlier is loud
    assert(math.abs(got(3L)._4) === 0.0)
    // group b: all identical -> mad 0 -> z forced to 0, flagged by mad
    assert(got(6L)._3 === 0.0 && got(6L)._4 === 0.0)
  }

  test("isotonic: hand PAV blocks, monotone, mass-preserving, ties pooled, cardinality guard") {
    import spark.implicits._
    // scores 1..6, labels 0,1,0,0,1,1 → PAV blocks [1,1]:0, [2,4]:1/3, [5,6]:1
    val df = Seq((1.0, 0), (2.0, 1), (3.0, 0), (4.0, 0), (5.0, 1), (6.0, 1)).toDF("s", "l")
    val blocks = Calibrate.isotonic(df, "s", "l").orderBy("score_lo").collect()
    assert(blocks.length === 3)
    assert(blocks(0).getDouble(0) === 1.0 && blocks(0).getDouble(2) === 0.0)
    assert(blocks(1).getDouble(0) === 2.0 && blocks(1).getDouble(1) === 4.0)
    assert(math.abs(blocks(1).getDouble(2) - 1.0 / 3) < 1e-12)
    assert(blocks(2).getDouble(2) === 1.0 && blocks(2).getLong(3) === 2L)
    // monotone and mass-preserving on a larger deterministic set
    val big = (0 until 2000).map { i =>
      val sRaw = (i % 40).toDouble
      val u = (i * 1.4142135623730951) % 1.0
      (sRaw, if (u < sRaw / 60.0 + 0.1) 1 else 0)
    }.toDF("s", "l")
    val bb = Calibrate.isotonic(big, "s", "l").orderBy("score_lo").collect()
    val ps = bb.map(_.getDouble(2))
    assert(ps.zip(ps.drop(1)).forall { case (a, b) => a < b }, ps.mkString(","))
    val mass = bb.map(r => r.getDouble(2) * r.getLong(3)).sum
    val truth = big.agg(org.apache.spark.sql.functions.sum("l")).head().getLong(0).toDouble
    assert(math.abs(mass - truth) < 1e-9)
    // rows sharing a score are pooled before PAV: same fit as duplicates
    val guard = intercept[IllegalArgumentException] {
      Calibrate.isotonic(big, "s", "l", maxPoints = 10L)
    }
    assert(guard.getMessage.contains("quantize"))
  }

  test("Drift.psi: self-comparison is 0, a shift scores >0.25, hand bin counts") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val ref = (1 to 5000).map(_ => rng.nextGaussian()).toDF("v")
    val self = Drift.psi(ref, ref, "v").collect()
    assert(self.length === 10)
    // identical samples: every bin's p_cur == p_ref → psi exactly 0
    assert(self.head.getAs[Double]("psi") === 0.0)
    // ~uniform decile masses by construction (edges are ref deciles)
    self.foreach(r => assert(math.abs(r.getAs[Double]("p_ref") - 0.1) < 0.01))

    val shifted = (1 to 5000).map(_ => rng.nextGaussian() + 1.0).toDF("v")
    val psiShift = Drift.psi(ref, shifted, "v").head().getAs[Double]("psi")
    assert(psiShift > 0.25, s"a full-sigma shift must alarm, got $psiShift")

    // hand case: ref 1..100; cur all in the top decile
    val r100 = (1 to 100).map(_.toDouble).toDF("v")
    val top = Seq.fill(50)(99.5).toDF("v")
    val out = Drift.psi(r100, top, "v").collect().map(r =>
      r.getAs[Int]("bin") -> ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur")))).toMap
    // edges are 10,20,...,90 → ref bins hold exactly 10 each; all cur
    // rows land in bin 9 (99.5 > 90)
    (0 to 9).foreach(b => assert(out(b)._1 === 10L, s"bin $b"))
    assert(out(9)._2 === 50L && (0 to 8).forall(b => out(b)._2 === 0L))
  }

  test("Drift.psi GK-sketch edges track the exact PSI") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val ref = (1 to 8000).map(_ => rng.nextGaussian()).toDF("v")
    val cur = (1 to 8000).map(_ => rng.nextGaussian() * 1.2 + 0.3).toDF("v")
    val exact = Drift.psi(ref, cur, "v").head().getAs[Double]("psi")
    val approx = Drift.psi(ref, cur, "v", approxEdges = true).head().getAs[Double]("psi")
    // rank error <= n/accuracy shifts each edge by <= 1 rank per 10k:
    // bin masses move O(1e-4), PSI by far less than the decision bands
    assert(math.abs(exact - approx) < 0.02, s"exact=$exact approx=$approx")
    // sketch self-comparison still reads as stable
    val selfA = Drift.psi(ref, ref, "v", approxEdges = true).head().getAs[Double]("psi")
    assert(selfA < 0.01)
  }

  test("platt: matches a driver-side Newton replica, monotone, in (0,1)") {
    import spark.implicits._
    // noisy sigmoid labels on a score grid — well-conditioned 2-param MLE
    val rng = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val s = (i % 40) / 4.0 - 5.0 // scores in [-5, 4.75]
      val p = 1.0 / (1.0 + math.exp(-(0.8 * s - 0.3)))
      (i.toLong, s, if (rng.nextDouble() < p) 1 else 0)
    }
    val df = rows.toDF("id", "score", "lbl")
    val got = Calibrate.platt(df, "score", "lbl")
      .select("id", "score", "p_platt")
      .as[(Long, Double, Double)].collect().sortBy(_._1)

    // independent dense Newton on the driver (50 iterations, 2x2 solve)
    var a = 0.0; var b = 0.0
    for (_ <- 1 to 50) {
      var g0 = 0.0; var g1 = 0.0; var h00 = 0.0; var h01 = 0.0; var h11 = 0.0
      rows.foreach { case (_, s, y) =>
        val mu = 1.0 / (1.0 + math.exp(-(a + b * s)))
        val w = mu * (1.0 - mu)
        g0 += y - mu; g1 += (y - mu) * s
        h00 += w; h01 += w * s; h11 += w * s * s
      }
      val det = h00 * h11 - h01 * h01
      a += (h11 * g0 - h01 * g1) / det
      b += (h00 * g1 - h01 * g0) / det
    }
    got.foreach { case (_, s, p) =>
      val ref = 1.0 / (1.0 + math.exp(-(a + b * s)))
      assert(math.abs(p - ref) < 1e-5, s"score=$s p=$p ref=$ref")
      assert(p > 0.0 && p < 1.0)
    }
    // monotone in score (b > 0 here)
    val bySc = got.map(t => (t._2, t._3)).distinct.sortBy(_._1)
    bySc.sliding(2).foreach { case Array((_, p1), (_, p2)) => assert(p1 <= p2) }
  }
}
