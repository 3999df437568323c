package graft.ml

import graft.SparkSpec

class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  /** Dense replica: same fixed-sweep MM on count matrices, final
    * normalize — the independent reference for the distributed fit.
    */
  private def denseBT(duels: Seq[(String, String)], iters: Int): Map[String, Double] = {
    val items = duels.flatMap(d => Seq(d._1, d._2)).distinct.sorted
    val idx = items.zipWithIndex.toMap
    val k = items.size
    val n = Array.ofDim[Double](k, k) // games between i and j (symmetric)
    val w = Array.fill(k)(0.0)
    duels.foreach { case (wi, li) =>
      val a = idx(wi); val b = idx(li)
      n(a)(b) += 1; n(b)(a) += 1; w(a) += 1
    }
    var pi = Array.fill(k)(1.0)
    for (_ <- 0 until iters) {
      val next = Array.tabulate(k) { i =>
        var den = 0.0
        for (j <- 0 until k if j != i && n(i)(j) > 0) den += n(i)(j) / (pi(i) + pi(j))
        if (den == 0.0) 0.0 else w(i) / den
      }
      pi = next
    }
    val tot = pi.sum
    items.zip(pi.map(_ / tot)).toMap
  }

  test("BradleyTerry.fit matches the dense MM replica after the same sweeps") {
    val rng = new scala.util.Random(8)
    val strength = Map("a" -> 4.0, "b" -> 2.0, "c" -> 1.0, "d" -> 0.5)
    val items = strength.keys.toSeq.sorted
    val duels = (1 to 3000).map { _ =>
      val i = items(rng.nextInt(4)); var j = items(rng.nextInt(4))
      while (j == i) j = items(rng.nextInt(4))
      val pWin = strength(i) / (strength(i) + strength(j))
      if (rng.nextDouble() < pWin) (i, j) else (j, i)
    }
    val ref = denseBT(duels, iters = 30)
    val got = BradleyTerry.fit(duels.toDF("w", "l"), "w", "l", iters = 30)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("pi"), r.getAs[Int]("rank")))).toMap
    items.foreach { it =>
      assert(math.abs(got(it)._1 - math.floor(ref(it) * 1e6 + 0.5) / 1e6) < 2e-6, it)
    }
    // planted order recovered: a > b > c > d
    assert(got("a")._2 === 1 && got("b")._2 === 2 && got("c")._2 === 3 && got("d")._2 === 4)
    // strengths roughly reproduce the planted 4:2:1:0.5 ratios
    assert(got("a")._1 / got("b")._1 > 1.4 && got("a")._1 / got("b")._1 < 2.8)
  }

  /** Dense replica of the ω-relaxed recurrence: sweep 1 plain, then
    * π ← π·(r·sqrt(r)) with r = MM(π)/π — same float ops as the
    * distributed fit and the q205 oracle.
    */
  private def denseBTRelaxed(duels: Seq[(String, String)], iters: Int): Map[String, Double] = {
    val items = duels.flatMap(d => Seq(d._1, d._2)).distinct.sorted
    val idx = items.zipWithIndex.toMap
    val k = items.size
    val n = Array.ofDim[Double](k, k)
    val w = Array.fill(k)(0.0)
    duels.foreach { case (wi, li) =>
      val a = idx(wi); val b = idx(li)
      n(a)(b) += 1; n(b)(a) += 1; w(a) += 1
    }
    var pi = Array.fill(k)(1.0)
    for (sweep <- 1 to iters) {
      val next = Array.tabulate(k) { i =>
        var den = 0.0
        for (j <- 0 until k if j != i && n(i)(j) > 0) den += n(i)(j) / (pi(i) + pi(j))
        val mm = if (den == 0.0) 0.0 else w(i) / den
        if (sweep == 1 || mm == 0.0 || pi(i) == 0.0) mm
        else { val r = mm / pi(i); pi(i) * (r * math.sqrt(r)) }
      }
      pi = next
    }
    val tot = pi.sum
    items.zip(pi.map(_ / tot)).toMap
  }

  test("BradleyTerry.fit omega=1.5: dense-replica parity, and 8 relaxed sweeps land deeper than 12 plain") {
    val rng = new scala.util.Random(17)
    val strength = Map("a" -> 4.0, "b" -> 2.0, "c" -> 1.0, "d" -> 0.5, "e" -> 0.8)
    val items = strength.keys.toSeq.sorted
    val duels = (1 to 4000).map { _ =>
      val i = items(rng.nextInt(5)); var j = items(rng.nextInt(5))
      while (j == i) j = items(rng.nextInt(5))
      val pWin = strength(i) / (strength(i) + strength(j))
      if (rng.nextDouble() < pWin) (i, j) else (j, i)
    }
    val got = BradleyTerry.fit(duels.toDF("w", "l"), "w", "l", iters = 8, omega = 1.5)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pi")).toMap
    val ref = denseBTRelaxed(duels, iters = 8)
    items.foreach { it =>
      assert(math.abs(got(it) - math.floor(ref(it) * 1e6 + 0.5) / 1e6) < 2e-6, it)
    }
    // acceleration claim: distance to the (effectively converged)
    // 60-plain-sweep fixpoint after 8 relaxed sweeps beats 12 plain
    val fix = denseBT(duels, iters = 60)
    val plain12 = denseBT(duels, iters = 12)
    def dist(m: Map[String, Double]) = items.map(it => math.abs(m(it) - fix(it))).max
    assert(dist(ref) <= dist(plain12),
      s"relaxed-8 ${dist(ref)} should be at least as close as plain-12 ${dist(plain12)}")
  }

  test("BradleyTerry.fit: never-beaten item drives pi to ~0; beatings of it carry no information") {
    val duels = Seq(("a", "z"), ("b", "z"), ("a", "b"), ("b", "a"), ("a", "z"))
    val got = BradleyTerry.fit(duels.toDF("w", "l"), "w", "l", iters = 30)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pi")).toMap
    assert(got("z") < 1e-4)
    // a's EXTRA wins are all against the zero-strength z, which are
    // uninformative in the limit: a and b split 1-1 head-to-head, so
    // their strengths converge EQUAL (the MM fixpoint, verified by hand)
    assert(math.abs(got("a") - got("b")) < 1e-4)
    // a direct head-to-head edge, by contrast, must rank a above b
    val duels2 = Seq(("a", "b"), ("a", "b"), ("b", "a"))
    val got2 = BradleyTerry.fit(duels2.toDF("w", "l"), "w", "l", iters = 30)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("pi")).toMap
    // closed form: pi_a/pi_b = 2 → normalized (2/3, 1/3)
    assert(math.abs(got2("a") - 2.0 / 3) < 1e-6 && math.abs(got2("b") - 1.0 / 3) < 1e-6)
  }
}
