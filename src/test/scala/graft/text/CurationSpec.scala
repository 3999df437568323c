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

  test("TextStats.withScriptProfile: class counts partition the text; dominant ties resolve in fixed order") {
    val docs = Seq(
      (0L, "plain alpha words only here"),
      (1L, "123 456 789 000 111"),
      (2L, "!!! ??? ... ;;; :::"),
      (3L, "mix3d t0kens with 42 numbers"),
      (4L, "ab 12") // letters == digits -> alpha wins the tie
    ).toDF("doc_id", "text")
    val r = TextStats.withScriptProfile(docs, "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    r.values.foreach { x =>
      assert(
        x.getAs[Long]("n_letters") + x.getAs[Long]("n_digits") +
          x.getAs[Long]("n_spaces") + x.getAs[Long]("n_punct") == x.getAs[Long]("n_chars_p"))
    }
    assert(r(0L).getAs[String]("dominant") == "alpha")
    assert(r(0L).getAs[Long]("n_alpha_tokens") == 5L && r(0L).getAs[Long]("n_punct") == 0L)
    assert(r(1L).getAs[String]("dominant") == "digit")
    assert(r(1L).getAs[Long]("n_digit_tokens") == 5L)
    assert(r(2L).getAs[String]("dominant") == "punct")
    assert(r(3L).getAs[Long]("n_alpha_tokens") == 2L) // "with", "numbers"
    assert(r(3L).getAs[Long]("n_digit_tokens") == 1L) // "42"
    assert(r(4L).getAs[String]("dominant") == "alpha")
  }

  test("Zipf slope via Vocab.top + Ols: a planted power-law corpus recovers its exponent") {
    import org.apache.spark.sql.expressions.Window
    // token t_r occurs round(1000 * r^-0.8) times: slope must come back ~-0.8
    val rows = (1 to 60).flatMap { rank =>
      Seq.fill(math.max(1, math.round(1000.0 * math.pow(rank, -0.8)).toInt))(f"tok$rank%03d")
    }
    val docs = rows.grouped(40).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val top = Vocab.top(docs, "text", "doc_id", k = 50)
      .withColumn("rank", row_number().over(Window.orderBy(col("term_freq").desc, col("token"))))
    val logs = top.select(
      log(col("rank").cast("double")).as("x"),
      log(col("term_freq").cast("double")).as("y"))
    val m = graft.ml.Ols.fit(logs, "y", Seq("x"))
    assert(math.abs(m.coef(1) - (-0.8)) < 0.02, s"slope ${m.coef(1)}")
  }

  test("Novelty: short docs fall back to whole-text grams (q21 convention)") {
    val docs = Seq((0L, "tiny doc"), (1L, "tiny doc"), (2L, "solo")).toDF("doc_id", "text")
    val byId = Novelty.score(docs, "text", "doc_id", n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(0L).getAs[Long]("n_grams") == 1L && byId(0L).getAs[Long]("n_novel") == 0L)
    assert(byId(2L).getAs[Double]("novel_frac") == 1.0)
  }
}
