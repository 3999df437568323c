package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KeynessSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "source")

  /** Driver-side reference G²/JS from raw token counts. */
  private def tokCounts(rows: Seq[(String, String)]): Map[(String, String), Long] =
    rows.flatMap { case (src, text) => text.split(" ").map(t => (src, t)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("G² matches a hand-computed 2x2 contingency reference") {
    val df = docs(
      (1L, "spam spam spam ham", "a"),
      (2L, "ham ham eggs eggs", "b"))
    val got = Keyness.g2(df, "text", "source")
      .select("corpus", "token", "n_self", "n_rest", "g2", "over")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    // reference: a=3 spam in corpus a (n1=4), b=0 in rest (n2=4), N=8
    // e1 = 4*3/8 = 1.5; G2 = 2*(3*ln(3/1.5)) = 6*ln2
    val (a, b, g2, over) = got(("a", "spam"))
    assert((a, b) === (3L, 0L))
    assert(math.abs(g2 - 6 * math.log(2)) < 1e-12)
    assert(over)
    // "ham": 1 of 4 in a vs 2 of 4 in rest -> underrepresented in a
    assert(!got(("a", "ham"))._4)
    assert(got(("b", "ham"))._4)
  }

  test("G² equals a driver-side reference on real docs, every row") {
    val df = graft.util.Tables.documents(spark, sf)
    val cnts = tokCounts(
      df.select("source", "text").as[(String, String)].collect().toSeq)
    val n1 = cnts.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val tok = cnts.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
    val n = cnts.values.sum.toDouble
    def ref(src: String, t: String): Double = {
      val a = cnts((src, t)).toDouble
      val b = tok(t) - a
      val e1 = n1(src) * tok(t) / n
      val e2 = (n - n1(src)) * tok(t) / n
      2.0 * ((if (a > 0) a * math.log(a / e1) else 0.0) +
        (if (b > 0) b * math.log(b / e2) else 0.0))
    }
    val rows = Keyness.g2(df, "text", "source")
      .select("corpus", "token", "g2").as[(String, String, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, t, g) =>
      assert(math.abs(g - ref(s, t)) < 1e-9, s"($s,$t): $g vs ${ref(s, t)}")
    }
  }

  test("JS divergence: zero for a corpus identical to the global mix, ln2-bounded, reference parity") {
    val same = "x y z x y z"
    val dfSame = docs((1L, same, "a"), (2L, same, "b"))
    val js0 = Keyness.jsDivergence(dfSame, "text", "source")
      .as[(String, Double)].collect().toMap
    assert(js0("a") === 0.0)
    assert(js0("b") === 0.0)

    val dfDisj = docs((1L, "p q r s", "a"), (2L, "t u v w", "b"))
    val jsD = Keyness.jsDivergence(dfDisj, "text", "source")
      .as[(String, Double)].collect().toMap
    assert(jsD("a") > 0.0 && jsD("a") <= math.log(2) + 1e-9)
    // equal-size disjoint halves vs the global mix:
    // 0.5·ln(4/3) + 0.25·ln(2/3) + 0.25·ln2, rounded to 4dp
    val analytic = 0.5 * math.log(4.0 / 3) + 0.25 * math.log(2.0 / 3) + 0.25 * math.log(2)
    assert(math.abs(jsD("a") - BigDecimal(analytic).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(jsD("a") === jsD("b"))
  }

  test("topKeyness keeps only overrepresented tokens, k per corpus, deterministic rank") {
    val df = graft.util.Tables.documents(spark, sf)
    val top = Keyness.topKeyness(df, "text", "source", k = 3)
    val perCorpus = top.groupBy("corpus").agg(count(lit(1)).as("c"), max("rk").as("m"))
      .as[(String, Long, Int)].collect()
    assert(perCorpus.forall { case (_, c, m) => c <= 3 && m <= 3 })
    // stability across partitionings
    val a = top.orderBy("corpus", "rk").collect().toSeq
    val b = Keyness.topKeyness(df.repartition(7), "text", "source", k = 3)
      .orderBy("corpus", "rk").collect().toSeq
    assert(a === b)
  }
}
