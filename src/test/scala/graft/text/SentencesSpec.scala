package graft.text

import graft.SparkSpec

class SentencesSpec extends SparkSpec {
  import spark.implicits._

  test("Sentences.split: terminators, runs, trailing tail, word counts") {
    val df = Seq(
      (1L, "First one. Second two!  Third three?! And a tail without end"),
      (2L, "No terminators at all here")).toDF("doc_id", "text")
    val out = Sentences.split(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3)))).toMap

    assert(out((1L, 1)) === (("First one.", 2)))
    assert(out((1L, 2)) === (("Second two!", 2)))
    assert(out((1L, 3)) === (("Third three?!", 2))) // terminator RUN stays attached
    assert(out((1L, 4)) === (("And a tail without end", 5)))
    assert(out((2L, 1)) === (("No terminators at all here", 5)))
    assert(out.size === 5)
  }

  test("Sentences.split: empty splits dropped, indices stay dense; sentence-final doc") {
    val df = Seq((1L, "Only sentence here. ")).toDF("doc_id", "text")
    val out = Sentences.split(df, "text", "doc_id").collect()
    assert(out.length === 1) // the trailing empty split is dropped
    assert(out.head.getInt(1) === 1)
    assert(out.head.getString(2) === "Only sentence here.")
  }

  test("Sentences.split composes into Chunker-scale counts on a long doc") {
    val doc = (1 to 50).map(i => s"Sentence number $i is here.").mkString(" ")
    val out = Sentences.split(Seq((7L, doc)).toDF("doc_id", "text"), "text", "doc_id")
      .collect()
    assert(out.length === 50)
    assert(out.map(_.getInt(1)).toSeq === (1 to 50))
    assert(out.forall(_.getInt(3) === 5))
  }
}
