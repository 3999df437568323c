package graft.ml

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("prCurve: perfect ranking has AP 1; hand-checked mixed ranking") {
    val perfect = Seq((10.0, 1), (9.0, 1), (2.0, 0), (1.0, 0)).toDF("s", "l")
    val pr = Eval.prCurve(perfect, "s", "l").collect()
    assert(pr.head.getAs[Double]("ap") == 1.0)
    // sklearn-style step AP on scores 4>3>2>1 with labels 1,0,1,0:
    // thresholds desc: tp/fp = 1/0, 1/1, 2/1, 2/2 -> AP = .5*1 + .5*(2/3)
    val mixed = Seq((4.0, 1), (3.0, 0), (2.0, 1), (1.0, 0)).toDF("s", "l")
    val rows = Eval.prCurve(mixed, "s", "l").orderBy($"threshold".desc).collect()
    assert(rows.map(r => (r.getAs[Long]("tp"), r.getAs[Long]("fp"))).toSeq ==
      Seq((1L, 0L), (1L, 1L), (2L, 1L), (2L, 2L)))
    val want = math.floor((0.5 + 0.5 * 2.0 / 3.0) * 1e6 + 0.5) / 1e6
    assert(rows.head.getAs[Double]("ap") == want)
    assert(rows.map(_.getAs[Double]("recall")).toSeq == Seq(0.5, 0.5, 1.0, 1.0))
  }

  test("mapMrr: hand-checked AP/RR, TREC denominator, no-relevant and out-of-k conventions") {
    // query A ranked by score desc: rel pattern 1,0,1,0 →
    // AP = (1/1 + 2/3)/2, RR = 1
    val df = Seq(
      ("A", 4.0, 1, 1L), ("A", 3.0, 0, 2L), ("A", 2.0, 1, 3L), ("A", 1.0, 0, 4L),
      // query B: first relevant at rank 3 → RR = 1/3; AP = (1/3)/1
      ("B", 9.0, 0, 5L), ("B", 8.0, 0, 6L), ("B", 7.0, 1, 7L),
      // query C: nothing relevant → AP = 0, RR = 0
      ("C", 5.0, 0, 8L), ("C", 4.0, 0, 9L)
    ).toDF("q", "s", "rel", "tie")
    val out = Eval.mapMrr(df, "q", "s", "rel", "tie", k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("ap"), r.getAs[Double]("rr"), r.getAs[Long]("n_relevant")))).toMap
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(out("A")._1 === q6((1.0 + 2.0 / 3.0) / 2))
    assert(out("A")._2 === 1.0)
    assert(out("B") === ((q6(1.0 / 3.0), q6(1.0 / 3.0), 1L)))
    assert(out("C") === ((0.0, 0.0, 0L)))
    // k cuts: with k=2, B's only relevant sits at rank 3 → AP=RR=0,
    // but n_relevant still reports it (the coverage audit)
    val cut = Eval.mapMrr(df, "q", "s", "rel", "tie", k = 2)
      .where($"q" === "B").head()
    assert(cut.getAs[Double]("ap") === 0.0 && cut.getAs[Double]("rr") === 0.0)
    assert(cut.getAs[Long]("n_relevant") === 1L)
    // TREC denominator: 3 relevant, k=2, both top-2 relevant → AP = 1
    val deep = Seq(("D", 5.0, 1, 1L), ("D", 4.0, 1, 2L), ("D", 3.0, 1, 3L))
      .toDF("q", "s", "rel", "tie")
    assert(Eval.mapMrr(deep, "q", "s", "rel", "tie", k = 2).head()
      .getAs[Double]("ap") === 1.0)
  }

  test("prCurve distributed prefix equals a driver-side cumulative scan") {
    val rng = new scala.util.Random(5)
    val rows = (1 to 4000).map(_ => (rng.nextInt(400).toDouble, if (rng.nextBoolean()) 1 else 0))
    val got = Eval.prCurve(rows.toDF("s", "l"), "s", "l", buckets = 16)
      .orderBy($"threshold".desc).collect()
    val byScore = rows.groupBy(_._1).map { case (s, g) =>
      (s, g.count(_._2 == 1).toLong, g.count(_._2 == 0).toLong)
    }.toSeq.sortBy(-_._1)
    var (tp, fp) = (0L, 0L)
    val want = byScore.map { case (s, p, n) => tp += p; fp += n; (s, tp, fp) }
    assert(got.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq == want)
  }

  test("ndcg: ideal ordering scores 1; reversed relevance scores below; zero-relevance group 0") {
    // query A: scores align with relevance; query B: inverted; query C: all rel 0
    val rows =
      Seq(("A", 3.0, 2, 1L), ("A", 2.0, 1, 2L), ("A", 1.0, 0, 3L),
        ("B", 3.0, 0, 4L), ("B", 2.0, 1, 5L), ("B", 1.0, 2, 6L),
        ("C", 3.0, 0, 7L), ("C", 2.0, 0, 8L))
    val m = Eval.ndcg(rows.toDF("q", "s", "rel", "id"), "q", "s", "rel", "id", k = 10)
      .collect().map(r => r.getAs[String]("q") -> r.getAs[Double]("ndcg")).toMap
    assert(m("A") == 1.0)
    assert(m("B") < 1.0 && m("B") > 0.0)
    assert(m("C") == 0.0)
    // hand value for B: DCG = 0/log2(2) + 1/log2(3) + 3/log2(4); IDCG = 3 + 1/log2(3)
    val dcgB = 1.0 / (math.log(3.0) / math.log(2.0)) + 3.0 / 2.0
    val idcgB = 3.0 + 1.0 / (math.log(3.0) / math.log(2.0))
    assert(math.abs(m("B") - dcgB / idcgB) < 2e-6)
  }

  test("brierDecomposition: REL - RES + UNC reconstructs the binned Brier; sharp calibrated forecasts") {
    // perfectly calibrated by construction: p = 0.2 bins with 20% positives etc.
    val rows = Seq.fill(40)((0.25, 0)) ++ Seq.fill(10)((0.25, 1)) ++ // 20% at p=.25... not exact
      Seq.fill(10)((0.85, 1)) ++ Seq.fill(2)((0.85, 0))
    val r = Eval.brierDecomposition(rows.toDF("p", "l"), "p", "l", bins = 10).head()
    val brier = r.getAs[Double]("brier")
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val unc = r.getAs[Double]("uncertainty")
    val residue = r.getAs[Double]("brier_residue")
    // within-bin forecasts are constant here, so the residue vanishes
    assert(math.abs(brier - (rel - res + unc) - residue) < 3e-6)
    assert(math.abs(residue) < 3e-6)
    assert(rel >= 0 && res >= 0 && unc > 0)
    // driver replay
    val n = rows.size.toDouble
    val obar = rows.count(_._2 == 1) / n
    assert(math.abs(unc - math.floor(obar * (1 - obar) * 1e6 + 0.5) / 1e6) < 1e-9)
  }
}
