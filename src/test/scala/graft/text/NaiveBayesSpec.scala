package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed scores on a tiny corpus; held-out doc classified by its tokens") {
    val train = Seq(
      (1L, "aa aa bb", "x"), (2L, "aa bb bb cc", "x"),
      (3L, "dd dd ee", "y")
    ).toDF("doc_id", "text", "lang")
    val m = NaiveBayes.train(train, "text", "lang")
    // vocab = {aa,bb,cc,dd,ee} = 5; n_x = 7, n_y = 3
    // P(aa|x) = (3+1)/(7+5); P(dd|y) = (2+1)/(3+5); priors 2/3, 1/3
    val test = Seq((10L, "aa bb"), (11L, "dd ee"), (12L, "zz qq")).toDF("doc_id", "text")
    val got = NaiveBayes.predict(test, "text", "doc_id", m)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(10L)._2 === "x")
    assert(got(11L)._2 === "y")
    // all-unseen doc: likelihoods are the per-label smoothing floor;
    // x's floor ln(1/12) is LOWER than y's ln(1/8), and two tokens of
    // that difference outweigh the prior gap -> y wins
    assert(got(12L)._2 === "y")
    // exact margin for doc 10: score_x - score_y
    // aa: (3+1)/12, bb: (3+1)/12 (both appear 3 times under x)
    val sx = math.log(2.0 / 3) + math.log(4.0 / 12) + math.log(4.0 / 12)
    val sy = math.log(1.0 / 3) + 2 * math.log(1.0 / 8)
    val expect = BigDecimal(sx - sy).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(10L)._3 - expect) < 1e-9, s"${got(10L)._3} vs $expect")
  }

  test("trained on real docs: accuracy on its own labels beats the majority-class baseline, deterministic") {
    val docs = graft.util.Tables.documents(spark, sf)
    val m = NaiveBayes.train(docs, "text", "lang")
    val pred = NaiveBayes.predict(docs, "text", "doc_id", m)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val n = pred.count().toDouble
    val acc = pred.where(col("nb_label") === col("lang")).count() / n
    val majority = docs.groupBy("lang").count()
      .agg(max("count")).head().getLong(0) / n
    assert(acc > majority, s"NB accuracy $acc not above majority baseline $majority")
    val a = NaiveBayes.predict(docs, "text", "doc_id", m).orderBy("doc_id").collect().toSeq
    val b = NaiveBayes.predict(docs.repartition(7), "text", "doc_id", m)
      .orderBy("doc_id").collect().toSeq
    assert(a.map(_.getString(1)) === b.map(_.getString(1)))
  }
}
