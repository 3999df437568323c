package graft.ops

import graft.SparkSpec

class EncodeSpec extends SparkSpec {
  import spark.implicits._

  test("targetOof: leave-fold-out means exact; own fold never leaks; fallback flagged") {
    // folds from the shared hash are opaque; verify the CONTRACT instead:
    // each row's te equals the mean of its category's target over the
    // OTHER folds, recomputed driver-side
    val rows = (1L to 400L).map(i => (i, s"c${i % 3}", (i % 7).toDouble))
    val df = rows.toDF("id", "cat", "y")
    val got = Encode.targetOof(df, "id", "cat", "y", folds = 4, salt = "s")
      .select("id", "cat", "fold", "te", "te_fallback")
      .collect()
    val foldOf = got.map(r => r.getAs[Long]("id") -> r.getAs[Int]("fold")).toMap
    val byId = rows.map(t => t._1 -> t).toMap
    got.foreach { r =>
      val id = r.getAs[Long]("id")
      val (_, cat, _) = byId(id)
      val others = rows.filter(t => t._2 == cat && foldOf(t._1) != foldOf(id))
      assert(others.nonEmpty && !r.getAs[Boolean]("te_fallback"))
      val ref = others.map(_._3).sum / others.size
      assert(math.abs(r.getAs[Double]("te") - ref) < 1e-5, s"id=$id")
    }
    // a category confined to one fold falls back to the global OOF mean
    val solo = df.union(Seq((9001L, "solo", 100.0)).toDF("id", "cat", "y"))
    val s = Encode.targetOof(solo, "id", "cat", "y", folds = 4, salt = "s")
      .where($"cat" === "solo").head()
    assert(s.getAs[Boolean]("te_fallback"))
    // fallback excludes the row's own fold, so the planted 100 never leaks in
    assert(s.getAs[Double]("te") < 10.0)
  }
}
