package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** P19 canonicalization-keyed exact dedup. */
class CanonicalSpec extends SparkSpec {
  import spark.implicits._

  test("Canonical.canonicalize: case, punctuation and whitespace churn collapse to one form") {
    val df = Seq(
      (0L, "Hello, World!"),
      (1L, "hello world"),
      (2L, "HELLO   WORLD"),
      (3L, "  hello -- world?  "),
      (4L, "a different document entirely")
    ).toDF("doc_id", "text")
    val forms = df.select(Canonical.canonicalize(col("text")).as("c")).as[String].collect()
    assert(forms.take(4).toSet == Set("hello world"))
    assert(forms(4) == "a different document entirely")
  }

  test("Canonical.dedupGroups: merges reformatted copies raw exact dedup cannot, min id wins") {
    val df = Seq(
      (5L, "Spark, at scale."),
      (2L, "spark at scale"),
      (9L, "SPARK AT SCALE"),
      (7L, "unrelated text here"),
      (8L, "unrelated text here") // raw exact dup
    ).toDF("doc_id", "text")
    val out = Canonical.dedupGroups(df, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("keep_id") -> r).toMap
    assert(out.size == 2)
    val sparkGroup = out(2L)
    assert(sparkGroup.getAs[Long]("n_copies") == 3L)
    assert(sparkGroup.getAs[Long]("n_variants") == 3L) // canonicalization did the work
    val rawGroup = out(7L)
    assert(rawGroup.getAs[Long]("n_copies") == 2L)
    assert(rawGroup.getAs[Long]("n_variants") == 1L) // raw dedup would have caught this one
  }

  test("Canonical.dedupGroups: degenerate all-punctuation text canonicalizes to empty, still one group") {
    val df = Seq((0L, "!!! ???"), (1L, "..."), (2L, "real content")).toDF("doc_id", "text")
    val out = Canonical.dedupGroups(df, "text", "doc_id").collect()
    assert(out.length == 2)
    val empty = out.find(_.getAs[Long]("keep_id") == 0L).get
    assert(empty.getAs[Long]("n_copies") == 2L)
  }
}
