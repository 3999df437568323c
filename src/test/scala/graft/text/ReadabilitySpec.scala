package graft.text

import graft.SparkSpec

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private def row(text: String) =
    Readability.scores(Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id")
      .collect().head

  test("hand-computed counts: words, sentences, syllables, letters") {
    // syllables: "the"=1 ('e' run; silent-e needs >=2 runs), "quick"=1 (ui),
    // "table"=2 (a,e; ends 'le' so NO silent-e drop), "blue"=1 (ue run, ends
    // 'ue' -> silent-e rule: runs=1 so floor keeps 1), "banana"=3
    val r = row("the quick table blue banana. ok!")
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    // the=1 quick=1 table=2 blue=1 banana.=3 ok!=1
    assert(r.getAs[Long]("n_syllables") == 9L)
    assert(r.getAs[Long]("n_letters") == 25L)
  }

  test("silent final e drops one syllable; 'le' endings keep it") {
    assert(row("make").getAs[Long]("n_syllables") == 1L)   // ma-ke: 2 runs - 1
    assert(row("table").getAs[Long]("n_syllables") == 2L)  // 'le' keeps
    assert(row("e").getAs[Long]("n_syllables") == 1L)      // floor at 1
    assert(row("rhythm").getAs[Long]("n_syllables") == 1L) // y counts as vowel
  }

  test("flesch ease closed form on a fixed sample") {
    val r = row("the cat sat. the dog ran.")
    // 6 words, 2 sentences, 6 syllables: 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(math.abs(r.getAs[Double]("flesch_ease") - 119.19) < 1e-9)
    assert(math.abs(r.getAs[Double]("fk_grade") - (0.39 * 3 + 11.8 - 15.59)) < 1e-9)
  }

  test("no sentence punctuation floors sentences at one; prose scores higher ease than jargon") {
    val plain = row("the cat sat on the mat and the dog ran to the man")
    assert(plain.getAs[Long]("n_sentences") == 1L)
    val jargon = row("organizational standardization prioritization implementation")
    assert(plain.getAs[Double]("flesch_ease") > jargon.getAs[Double]("flesch_ease"))
    assert(jargon.getAs[Double]("fk_grade") > plain.getAs[Double]("fk_grade"))
  }
}
