package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the R8 curation additions: PMI collocations (T25),
  * Gopher-style rule filter (T26), n-gram novelty (T27).
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("Collocations.pmi: planted phrase dominates, counts exact, score matches hand arithmetic") {
    // "new york" appears 6 times; every other adjacent pair is rarer
    val docs = Seq(
      (0L, "visit new york in new york with new york friends"),
      (1L, "new york and new york and new york again"),
      (2L, "boston boston boston boston boston boston boston boston")
    ).toDF("doc_id", "text")
    val out = Collocations.pmi(docs, "text", minCount = 5)
    val rows = out.collect().map(r =>
      (r.getAs[String]("prev"), r.getAs[String]("token")) -> r).toMap

    val ny = rows(("new", "york"))
    assert(ny.getAs[Long]("c_pair") == 6L)
    assert(ny.getAs[Long]("c_prev") == 6L) // "new" occurs 6 times
    assert(ny.getAs[Long]("c_tok") == 6L) // "york" occurs 6 times
    val nTotal = 10 + 9 + 8 // tokens per doc
    val expected = math.log(6.0 * nTotal / (6.0 * 6.0))
    assert(math.abs(ny.getAs[Double]("pmi") - expected) < 1e-3)

    // "boston boston" has 7 adjacent occurrences but low PMI (c1 = 8)
    val bb = rows(("boston", "boston"))
    assert(bb.getAs[Long]("c_pair") == 7L)
    assert(bb.getAs[Double]("pmi") < ny.getAs[Double]("pmi"))

    // min-count gate: nothing below 5 leaks through
    assert(out.agg(min("c_pair")).as[Long].head() >= 5L)
  }

  test("Collocations.pmi: single-token docs contribute no pairs but do count as unigrams") {
    val docs = Seq((0L, "solo"), (1L, "solo"), (2L, "a b a b a b a b a b")).toDF("doc_id", "text")
    val out = Collocations.pmi(docs, "text", minCount = 2).collect()
    // no pair involves "solo"; sequence(0, -1) must NOT fabricate pairs
    assert(!out.exists(r => r.getAs[String]("prev") == "solo" || r.getAs[String]("token") == "solo"))
    val ab = out.find(r => r.getAs[String]("prev") == "a" && r.getAs[String]("token") == "b").get
    assert(ab.getAs[Long]("c_pair") == 5L)
    // but N includes the solo tokens: pmi = ln(5 * 12 / (5 * 5))
    assert(math.abs(ab.getAs[Double]("pmi") - math.log(5.0 * 12 / 25.0)) < 1e-3)
  }

  test("RuleFilter: each rule trips on its planted violator and only there") {
    val good = "the cat sat on a mat and the dog ran to the park in town today ok fine"
    val docs = Seq(
      (0L, good), // passes everything
      (1L, "too short to keep"), // r_word_count
      (2L, ("zz " * 7 + "supercalifragilisticexpialidocious " * 13).trim), // r_mean_word_len (mean > 10)
      (3L, ("7 42 99 13 8 55 1 2 3 4 5 6 0 9 11 " * 2).trim), // r_alpha + r_stopwords
      (4L, ("the a " + "spam " * 28).trim), // r_dup_tokens (30 tokens, 3 distinct)
      (5L, good + " # # # ...") // r_symbols (4 symbols / 20 tokens)
    ).toDF("doc_id", "text")
    val out = RuleFilter.withRules(docs, "text")
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(byId(0L).getAs[Boolean]("keep"))
    Seq("r_word_count", "r_mean_word_len", "r_alpha", "r_stopwords", "r_dup_tokens", "r_symbols")
      .foreach(c => assert(byId(0L).getAs[Boolean](c), c))

    assert(!byId(1L).getAs[Boolean]("r_word_count") && !byId(1L).getAs[Boolean]("keep"))
    assert(!byId(2L).getAs[Boolean]("r_mean_word_len"))
    assert(!byId(3L).getAs[Boolean]("r_alpha"))
    assert(!byId(3L).getAs[Boolean]("r_stopwords"))
    assert(!byId(4L).getAs[Boolean]("r_dup_tokens"))
    assert(!byId(5L).getAs[Boolean]("r_symbols") && !byId(5L).getAs[Boolean]("keep"))
  }

  test("Novelty: exact copies share every gram; unique doc scores 1.0; df arithmetic exact") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"), // exact copy: df=2 on all grams
      (2L, "completely fresh material nobody else wrote here"),
      (3L, "alpha beta gamma then totally new continuation text") // shares ONE gram with 0/1
    ).toDF("doc_id", "text")
    val out = Novelty.score(docs, "text", "doc_id", n = 3).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(byId(0L).getAs[Double]("novel_frac") == 0.0)
    assert(byId(1L).getAs[Double]("novel_frac") == 0.0)
    assert(byId(2L).getAs[Double]("novel_frac") == 1.0)
    assert(byId(2L).getAs[Double]("info_density") == 1.0)
    // doc 3: 6 grams, one ("alpha beta gamma") has df=3, rest df=1
    assert(byId(3L).getAs[Long]("n_grams") == 6L)
    assert(byId(3L).getAs[Long]("n_novel") == 5L)
    val expDensity = (5.0 * 1.0 + 1.0 / 3.0) / 6.0
    assert(math.abs(byId(3L).getAs[Double]("info_density") - expDensity) < 1e-3)
    // copies: "alpha beta gamma" also in doc 3 (df=3), other 3 grams df=2
    val expCopy = (1.0 / 3 + 3.0 / 2) / 4
    assert(math.abs(byId(0L).getAs[Double]("info_density") - expCopy) < 1e-3)
  }

  test("Novelty: short docs fall back to whole-text grams (q21 convention)") {
    val docs = Seq((0L, "tiny doc"), (1L, "tiny doc"), (2L, "solo")).toDF("doc_id", "text")
    val byId = Novelty.score(docs, "text", "doc_id", n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(0L).getAs[Long]("n_grams") == 1L && byId(0L).getAs[Long]("n_novel") == 0L)
    assert(byId(2L).getAs[Double]("novel_frac") == 1.0)
  }
}
