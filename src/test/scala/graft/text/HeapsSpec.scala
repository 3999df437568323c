package graft.text

import graft.SparkSpec

class HeapsSpec extends SparkSpec {
  import spark.implicits._

  test("Heaps.fit: hand-computed tiny corpus matches the closed form exactly") {
    val docs = Seq(
      (1L, "a b"), (2L, "a c"), (3L, "b d e")
    ).toDF("doc_id", "text")
    val r = Heaps.fit(docs, "text", "doc_id", checkpoints = 3).head()
    // ranks 1,2,3; cum tokens 2,4,7; checkpoints R = 1,2,3
    // firsts: a,b -> 1; c -> 2; d,e -> 3  =>  V = 2,3,5
    val xs = Seq(2.0, 4.0, 7.0).map(math.log)
    val ys = Seq(2.0, 3.0, 5.0).map(math.log)
    val m = 3.0
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(v => v * v).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    val logK = (sy - beta * sx) / m
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("beta") === q6(beta))
    assert(r.getAs[Double]("log_k") === q6(logK))
    assert(r.getAs[Long]("total_tokens") === 7L)
    assert(r.getAs[Long]("total_vocab") === 5L)
  }

  test("Heaps.fit: all-unique tokens give beta = 1, K = 1; a template corpus gives beta = 0") {
    // every token globally unique: V(N) = N exactly -> ln V = ln N
    val unique = (1L to 40L).map(i =>
      (i, (0 until 5).map(k => s"tok_${i}_$k").mkString(" "))).toDF("doc_id", "text")
    val u = Heaps.fit(unique, "text", "doc_id", checkpoints = 5).head()
    assert(math.abs(u.getAs[Double]("beta") - 1.0) < 1e-9, u.toString)
    assert(math.abs(u.getAs[Double]("k_coef") - 1.0) < 1e-9)
    // the same line repeated: V flat after checkpoint 1 -> beta ~ 0
    val template = (1L to 40L).map(i => (i, "the same boilerplate line"))
      .toDF("doc_id", "text")
    val t = Heaps.fit(template, "text", "doc_id", checkpoints = 5).head()
    assert(math.abs(t.getAs[Double]("beta")) < 1e-9, t.toString)
    assert(t.getAs[Long]("total_vocab") === 4L)
  }

  test("Heaps.coverage: hand-computed Good–Turing and Chao1; singleton-only corpus nulls chao1") {
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = Heaps.coverage(docs, "text", "doc_id").head()
    // counts: a=3, b=2, c=1 -> N=6, V=3, n1=1, n2=1
    assert(r.getAs[Long]("n_tokens") === 6L && r.getAs[Long]("vocab") === 3L)
    assert(r.getAs[Long]("n1") === 1L && r.getAs[Long]("n2") === 1L)
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("p_unseen") === q6(1.0 / 6))
    assert(r.getAs[Double]("coverage") === q6(5.0 / 6))
    assert(r.getAs[Double]("chao1") === 3.5) // V + n1²/(2 n2) = 3 + 1/2
    assert(r.getAs[Double]("chao1_bc") === 3.0) // n1(n1−1) = 0
    // every token unique: n2 = 0 -> classic chao1 undefined (null),
    // the bias-corrected form still finite; P0 = 1 (all mass unseen)
    val uniq = Seq((1L, "x y z")).toDF("doc_id", "text")
    val u = Heaps.coverage(uniq, "text", "doc_id").head()
    assert(u.isNullAt(u.fieldIndex("chao1")))
    assert(u.getAs[Double]("p_unseen") === 1.0)
    assert(u.getAs[Double]("chao1_bc") === 3 + 3.0 * 2 / 2)
    intercept[IllegalArgumentException](
      Heaps.coverage(Seq((1L, "")).toDF("doc_id", "text"), "text", "doc_id"))
  }

  test("Heaps.fit: sublinear growth lands between the extremes; guards raise") {
    // doc i carries i%7 fresh tokens + shared filler: concave growth
    val mixed = (1L to 60L).map { i =>
      val fresh = (0 until (i % 7L).toInt).map(k => s"new_${i}_$k")
      (i, (Seq("the", "common", "filler") ++ fresh).mkString(" "))
    }.toDF("doc_id", "text")
    val m = Heaps.fit(mixed, "text", "doc_id", checkpoints = 6).head()
    val beta = m.getAs[Double]("beta")
    assert(beta > 0.3 && beta < 1.0, s"expected sublinear growth, got $beta")
    intercept[IllegalArgumentException](Heaps.fit(mixed, "text", "doc_id", checkpoints = 1))
    intercept[IllegalArgumentException](
      Heaps.fit(Seq((1L, "a b")).toDF("doc_id", "text"), "text", "doc_id", checkpoints = 4))
  }
}
