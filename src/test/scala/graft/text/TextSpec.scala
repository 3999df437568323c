package graft.text

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("TextStats token counts and bpe estimate") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("id", "text")
    val r = TextStats.withTokenStats(df, "text").head()
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Int]("n_uniq_tokens") == 5)
    assert(r.getAs[Int]("n_chars_obs") == 22)
    assert(r.getAs[Long]("est_bpe_tokens") == 6) // ceil(22/4)
    assert(math.abs(r.getAs[Double]("avg_token_len") - 17.0 / 6).toFloat < 1e-3)
  }

  test("TextStats quality rewards diversity, penalizes stopword soup") {
    val df = Seq(
      (1L, "the the the the the the the the"),
      (2L, "diverse vocabulary spanning many unique interesting informative tokens")
    ).toDF("id", "text")
    val q = TextStats.withQuality(df, "text").select("id", "quality").as[(Long, Double)].collect().toMap
    assert(q(2L) > q(1L))
  }

  test("LangId detects language from marker stopwords") {
    val df = Seq(
      (1L, "the cat is a friend of the dog"),
      (2L, "el perro de la casa es que y grande"),
      (3L, "der hund und die katze das ist gut"),
      (4L, "le chat et les amis une belle est"),
      (5L, "的 是 在 了 我 something"),
      (6L, "zzz qqq www")
    ).toDF("id", "text")
    val got = LangId.withLangId(df, "text").select("id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "zh", 6L -> "und"))
  }

  test("Vocab counts term and document frequency; idf follows the smoothed formula") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the the dog"),
      (3L, "a cat ran")
    ).toDF("doc_id", "text")
    val v = Vocab.vocab(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v("the") == (3L, 2L)) // 3 occurrences across 2 docs
    assert(v("cat") == (2L, 2L))
    assert(v("dog") == (1L, 1L))
    val idf = Vocab.withIdf(Vocab.vocab(docs, "text", "doc_id"), nDocs = 3)
      .where(col("token") === "dog").select("idf").head().getDouble(0)
    assert(math.abs(idf - (math.log(4.0 / 2.0) + 1.0)) < 1e-12)
  }

  test("Fingerprint: equal text iff equal fingerprint on distinct corpus") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma delta"),
      (4L, "gamma beta alpha")
    ).toDF("id", "text")
    val fp = Fingerprint.withFingerprint(df, "text").select("id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp(1L) != fp(4L)) // order matters in a rolling hash
  }
}
