package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LdaSpec extends SparkSpec {
  import spark.implicits._

  /** Two disjoint-vocabulary topics: docs 0..19 draw only from sports
    * words, docs 20..39 only from cooking words, with deterministic
    * per-doc count patterns.
    */
  private def planted = {
    val sports = Seq("goal", "team", "match", "score", "league")
    val cooking = Seq("oven", "dough", "spice", "simmer", "whisk")
    val rows = for {
      d <- 0 until 40
      vocab = if (d < 20) sports else cooking
      (w, i) <- vocab.zipWithIndex
    } yield (s"d$d", w, ((d + i) % 4 + 1).toDouble)
    rows.toDF("doc", "word", "cnt")
  }

  test("planted disjoint topics are recovered: phi mass separates, theta routes docs") {
    val m = Lda.fit(planted, "doc", "word", "cnt", k = 2, iters = 25, beta = 0.001)
    val phi = m.phi.collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val sports = Seq("goal", "team", "match", "score", "league")
    val cooking = Seq("oven", "dough", "spice", "simmer", "whisk")
    // identify which topic owns sports by the heavier phi mass
    val sportsMass = Array(0, 1).map(t => sports.map(w => phi(w)(t)).sum)
    val st = if (sportsMass(0) > sportsMass(1)) 0 else 1
    val ct = 1 - st
    assert(sports.map(w => phi(w)(st)).sum > 0.99, "sports vocab mass not concentrated")
    assert(cooking.map(w => phi(w)(ct)).sum > 0.99, "cooking vocab mass not concentrated")
    val theta = m.theta.collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    (0 until 20).foreach(d => assert(theta(s"d$d")(st) > 0.9, s"doc d$d not routed to sports"))
    (20 until 40).foreach(d => assert(theta(s"d$d")(ct) > 0.9, s"doc d$d not routed to cooking"))
  }

  test("MAP objective is non-decreasing across EM iterations") {
    val m = Lda.fit(planted, "doc", "word", "cnt", k = 3, iters = 12)
    m.objective.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-9, s"objective fell: $a -> $b")
      case _ =>
    }
  }

  test("K=1 degenerates to the smoothed corpus unigram distribution exactly") {
    val m = Lda.fit(planted, "doc", "word", "cnt", k = 1, iters = 3, beta = 0.5)
    val counts = planted.groupBy("word").agg(sum("cnt").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val total = counts.values.sum
    val v = counts.size
    m.phi.collect().foreach { r =>
      val expected = (counts(r.getString(0)) + 0.5) / (total + v * 0.5)
      assert(math.abs(r.getSeq[Double](1).head - expected) < 1e-12)
    }
    m.theta.collect().foreach(r => assert(r.getSeq[Double](1).head === 1.0))
  }

  test("theta and phi rows normalize; fit is deterministic; topWords ranks by phi") {
    val m1 = Lda.fit(planted, "doc", "word", "cnt", k = 2, iters = 5)
    val m2 = Lda.fit(planted, "doc", "word", "cnt", k = 2, iters = 5)
    m1.theta.collect().foreach(r =>
      assert(math.abs(r.getSeq[Double](1).sum - 1.0) < 1e-9))
    val phiByTopic = m1.phi.collect().map(_.getSeq[Double](1))
    (0 until 2).foreach { t =>
      assert(math.abs(phiByTopic.map(_(t)).sum - 1.0) < 1e-9, s"phi topic $t not normalized")
    }
    // determinism up to partial-aggregate MERGE order: the M-step's
    // grouped vector sums combine partial buffers in task-completion
    // order, which under concurrent-suite load can differ between two
    // runs by 1-2 ulps per element (observed in the full-suite run;
    // bit-identical in isolation). The model is deterministic in the
    // data — compare at 1e-12, far below the 5dp output quantizer.
    val t1 = m1.theta.orderBy("doc").collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    val t2 = m2.theta.orderBy("doc").collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    assert(t1.length === t2.length)
    t1.zip(t2).foreach { case ((d1, v1), (d2, v2)) =>
      assert(d1 === d2)
      v1.zip(v2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12, s"doc $d1") }
    }
    // the USER-VISIBLE contract stays exact (r12 advice): at the 5dp
    // output quantizer the two fits must match bit-for-bit
    def q5(x: Double): Double = math.round(x * 1e5).toDouble / 1e5
    t1.zip(t2).foreach { case ((d1, v1), (_, v2)) =>
      v1.zip(v2).foreach { case (a, b) => assert(q5(a) === q5(b), s"quantized doc $d1") }
    }
    val tw = Lda.topWords(m1, 3).orderBy("topic", "rank").collect()
    assert(tw.length === 6)
    tw.groupBy(_.getInt(0)).values.foreach { rows =>
      val phis = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(phis.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }
}
