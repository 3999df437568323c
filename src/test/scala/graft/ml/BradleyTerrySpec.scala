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
