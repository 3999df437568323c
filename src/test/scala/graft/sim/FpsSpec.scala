package graft.sim

import graft.SparkSpec

class FpsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("Fps.sample: three tight clusters — one exemplar per cluster before densifying") {
    // clusters around (0,0), (10,0), (0,10); seed = min id lands in A
    val rows = Seq[(Long, Seq[Float])](
      1L -> Seq(0f, 0f), 2L -> Seq(0.1f, 0f), 3L -> Seq(0f, 0.1f),
      10L -> Seq(10f, 0f), 11L -> Seq(10.1f, 0f),
      20L -> Seq(0f, 10f), 21L -> Seq(0f, 10.1f))
    val out = Fps.sample(vecs(rows), "vec_id", "embedding", k = 3)
      .orderBy("sel_order").as[(Int, Long, Double)].collect()
    assert(out(0)._2 === 1L, "seed is the smallest id")
    assert(out(0)._3 === 0.0)
    // the next two picks must cover BOTH far clusters, never cluster A
    val picked = out.drop(1).map(_._2).toSet
    assert(picked.subsetOf(Set(10L, 11L, 20L, 21L)) &&
      picked.exists(_ >= 20L) && picked.exists(id => id >= 10L && id < 20L),
      s"k-center must cover both far clusters: ${out.toSeq}")
  }

  test("Fps.sample: dense greedy replica, tie broken by smallest id, radius non-increasing") {
    val rows: Seq[(Long, Seq[Float])] = (0 until 25).map { i =>
      (i.toLong, Seq(math.sin(i * 1.7).toFloat * 3, math.cos(i * 0.9).toFloat * 2))
    }
    val out = Fps.sample(vecs(rows), "vec_id", "embedding", k = 6)
      .orderBy("sel_order").as[(Int, Long, Double)].collect()
    // dense replica
    val pts = rows.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var chosen = Vector(0L)
    val dists = scala.collection.mutable.ArrayBuffer(0.0)
    while (chosen.length < 6) {
      val cands = pts.keys.filterNot(chosen.contains).toSeq
      val scored = cands.map(id => id -> chosen.map(c => d2(pts(id), pts(c))).min)
      val best = scored.minBy { case (id, d) => (-d, id) }
      chosen :+= best._1
      dists += best._2
    }
    assert(out.map(_._2).toSeq === chosen, s"${out.toSeq} vs $chosen")
    out.zip(dists).foreach { case ((_, _, got), want) =>
      assert(math.abs(got - math.floor(want * 1e4 + 0.5) / 1e4) < 1e-12)
    }
    // the k-center radius trajectory is non-increasing after the seed
    val radii = out.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a + 1e-12 }, radii.toSeq)
    // exact tie: two points equidistant from the seed — smaller id wins
    val tie = vecs(Seq[(Long, Seq[Float])](
      1L -> Seq(0f, 0f), 5L -> Seq(1f, 0f), 3L -> Seq(-1f, 0f)))
    val t = Fps.sample(tie, "vec_id", "embedding", k = 2)
      .orderBy("sel_order").as[(Int, Long, Double)].collect()
    assert(t(1)._2 === 3L, s"tie must break to the smaller id: ${t.toSeq}")
  }

  test("Fps.sample: guards") {
    val df = vecs(Seq(1L -> Seq(0f, 0f)))
    intercept[IllegalArgumentException](Fps.sample(df, "vec_id", "embedding", 0))
    intercept[IllegalArgumentException](Fps.sample(df, "vec_id", "embedding", 2))
  }
}
