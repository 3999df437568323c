package graft.text

import graft.SparkSpec

class DispersionSpec extends SparkSpec {
  import spark.implicits._

  test("tokenDispersion: hand-computed VMR; bursty token far above evenly-spread token") {
    // 4 docs: "the" once everywhere (uniform), "x" piled into one doc (bursty)
    val docs = Seq(
      (1L, "the a b"),
      (2L, "the c d"),
      (3L, "the e f"),
      (4L, "the x x x x x x")
    ).toDF("doc_id", "text")
    val out = Dispersion.tokenDispersion(docs, "text", "doc_id", k = 10)
      .collect().map(r => r.getString(0) -> r).toMap

    // "the": counts (1,1,1,1), N=4 → mean 1, var 0 → VMR 0
    val the = out("the")
    assert(the.getLong(1) === 4L && the.getLong(2) === 4L)
    assert(the.getDouble(3) === 0.0)

    // "x": counts (0,0,0,6) → tf=6, sq=36; var = (36 − 36/4)/3 = 9; mean 1.5 → VMR 6
    val x = out("x")
    assert(x.getLong(1) === 1L && x.getLong(2) === 6L)
    assert(math.abs(x.getDouble(3) - 6.0) < 1e-9)
    assert(x.getDouble(3) > the.getDouble(3))

    // deterministic ordering: term_freq desc then token
    val ordered = Dispersion.tokenDispersion(docs, "text", "doc_id", k = 3)
      .collect().map(_.getString(0)).toSeq
    assert(ordered === Seq("x", "the", "a"))
  }
}
