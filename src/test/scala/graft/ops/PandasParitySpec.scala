package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** pandas-parity frame operators: expanding, pct_change, ffill/bfill. */
class PandasParitySpec extends SparkSpec {
  import spark.implicits._

  test("Grouped.expanding: running mean/max per group in order") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 3.0),
      ("b", 1, 5.0), ("b", 2, 1.0)).toDF("k", "t", "v")
    val got = Grouped.expanding(df, Seq("k"), "t",
      Seq(c => avg(c), c => max(c)), "v", Seq("m", "mx"))
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("a", 1, 10.0, 10.0), ("a", 2, 15.0, 20.0), ("a", 3, 11.0, 20.0),
      ("b", 1, 5.0, 5.0), ("b", 2, 3.0, 5.0)))
  }

  test("Lags.pctChange: first row null, zero base null, signed ratios") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 15.0), ("a", 3, 0.0), ("a", 4, 7.0),
      ("a", 5, -14.0)).toDF("k", "t", "v")
    val got = Lags.pctChange(df, Seq("k"), Seq("t"), "v", "pct")
      .orderBy("t").collect()
      .map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(got(0).isEmpty)                    // no previous row
    assert(got(1).contains(0.5))              // 10 -> 15
    assert(got(2).contains(-1.0))             // 15 -> 0
    assert(got(3).isEmpty)                    // base 0
    assert(got(4).contains(-3.0))             // 7 -> -14
  }

  test("Lags.fillGaps forward and backward, per group, leading/trailing gaps stay null") {
    val df = Seq(
      ("a", 1, None), ("a", 2, Some(5.0)), ("a", 3, None), ("a", 4, Some(9.0)), ("a", 5, None),
      ("b", 1, Some(1.0)), ("b", 2, None))
      .toDF("k", "t", "v")
    val f = Lags.fillGaps(df, Seq("k"), Seq("t"), "v").orderBy("k", "t").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    assert(f.toSeq == Seq(None, Some(5.0), Some(5.0), Some(9.0), Some(9.0), Some(1.0), Some(1.0)))
    val b = Lags.fillGaps(df, Seq("k"), Seq("t"), "v", direction = "backward")
      .orderBy("k", "t").collect()
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    assert(b.toSeq == Seq(Some(5.0), Some(5.0), Some(9.0), Some(9.0), None, Some(1.0), None))
  }

  test("Islands.coverage merges overlapping and touching spans, keeps gaps apart") {
    val spans = Seq(
      ("u", 0L, 10L), ("u", 5L, 12L), ("u", 12L, 20L), // one island [0,20] (touching merges)
      ("u", 30L, 40L),                                  // gap -> second island
      ("v", 100L, 110L))
      .toDF("k", "s", "e")
    val got = Islands.coverage(spans, "k", "s", "e").orderBy("k", "island").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == Seq(
      ("u", 1L, 0L, 20L, 3L, 20L, 2L, 30L),
      ("u", 2L, 30L, 40L, 1L, 10L, 2L, 30L),
      ("v", 1L, 100L, 110L, 1L, 10L, 1L, 10L)))
  }

  test("Stats.pairedT: hand value; zero-difference pairs give t ~ 0") {
    val pairs = Seq((5.0, 3.0), (6.0, 5.0), (8.0, 4.0), (7.0, 7.0)).toDF("x", "y")
    val r = Stats.pairedT(pairs, "x", "y").head()
    // d = 2,1,4,0: mean 1.75, s^2 = (21 - 12.25)/3, t = 1.75/(sqrt(2.91667)/2)
    assert(r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("mean_diff") - 1.75) < 1e-9)
    val s = math.sqrt((21.0 - 4 * 1.75 * 1.75) / 3)
    assert(math.abs(r.getAs[Double]("sd_diff") - s) < 2e-6)
    assert(math.abs(r.getAs[Double]("t") - 1.75 / (s / 2)) < 2e-6)
    val same = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0 + 1e-12)).toDF("x", "y")
    assert(math.abs(Stats.pairedT(same, "x", "y").head().getAs[Double]("mean_diff")) < 1e-9)
  }

  test("Quota.perKeyWindow keeps exactly limit rows per (key, bucket) in (ts, tie) order") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    // user 1: five events on day 1, two on day 2; limit 3/day
    val rows = (0 until 5).map(i => (i.toLong, 1L, ts(i))) ++
      Seq((10L, 1L, ts(25)), (11L, 1L, ts(26))) ++ (20 until 22).map(i => (i.toLong, 2L, ts(0)))
    val got = Quota.perKeyWindow(rows.toDF("id", "u", "ts"), "u", "ts", "id",
      bucketSec = 86400L, limit = 3)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("kept")).toMap
    assert((0L to 2L).forall(got(_) == 1L) && got(3L) == 0L && got(4L) == 0L)
    assert(got(10L) == 1L && got(11L) == 1L) // fresh bucket resets the quota
    assert(got(20L) == 1L && got(21L) == 1L) // other keys unaffected
  }

  test("Privacy.laplaceCounts: reproducible, epsilon-scaled, non-negative releases") {
    val df = (1 to 2000).map(i => (s"g${i % 40}", i)).toDF("g", "x")
    val a = Privacy.laplaceCounts(df, "g", epsilon = 0.5).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getLong(3)))
    val b = Privacy.laplaceCounts(df, "g", epsilon = 0.5).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getLong(3)))
    assert(a.toSet == b.toSet, "same seed -> identical release")
    assert(a.forall(_._3 >= 0L))
    // different seed -> different noise
    val c = Privacy.laplaceCounts(df, "g", epsilon = 0.5, seed = "other").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(a.count { case (g, nz, _) => c(g) != nz } > 30)
    // tighter epsilon -> strictly larger magnitude per group (b scales linearly)
    val loose = Privacy.laplaceCounts(df, "g", epsilon = 5.0).collect()
      .map(r => r.getString(0) -> math.abs(r.getDouble(2))).toMap
    a.foreach { case (g, nz, _) =>
      assert(math.abs(nz) >= loose(g) - 1e-6, s"group $g") }
    // mean noise near zero across groups (Laplace is symmetric)
    assert(math.abs(a.map(_._2).sum / a.length) < 2.0)
  }

  test("Privacy release nonce: fresh noise per publication; publish views carry only released") {
    val df = (1 to 2000).map(i => (s"g${i % 40}", i)).toDF("g", "x")
    val noiseOf = (rel: String) =>
      Privacy.laplaceCounts(df, "g", epsilon = 0.5, release = rel).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val r1 = noiseOf("2024-06-01")
    val r1b = noiseOf("2024-06-01")
    val r2 = noiseOf("2024-07-01")
    assert(r1 == r1b, "same (seed, release) -> identical regeneration")
    // a repeated release on updated data must NOT share noise: otherwise
    // the difference of the two published tables is the exact count delta
    assert(r1.count { case (g, nz) => r2(g) != nz } > 30,
      "different release nonce must redraw the noise")
    // empty release keeps the legacy (seed|group) draw
    val legacy = Privacy.laplaceCounts(df, "g", epsilon = 0.5).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(legacy.count { case (g, nz) => r1(g) != nz } > 30)
    // publication views: just (group, released) — no exact n, no raw noise
    assert(Privacy.publishCounts(df, "g", epsilon = 0.5, release = "x")
      .columns.toSeq == Seq("g", "released"))
    assert(Privacy.publishSums(df, "g", "x", 0.0, 5.0, epsilon = 1.0, release = "x")
      .columns.toSeq == Seq("g", "released"))
  }

  test("Privacy.laplaceSum: clipping census, reproducible noise, sensitivity from the bounds") {
    // values 0..9 per group; clip to [0, 5] → 4 rows clipped, clipped sum = 0+1+2+3+4+5+5+5+5+5
    val df = (0 until 10).flatMap(v => Seq(("a", v.toDouble), ("b", v.toDouble))).toDF("g", "x")
    val out = Privacy.laplaceSum(df, "g", "x", lo = 0.0, hi = 5.0, epsilon = 1.0)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n_clipped") === 4L)
    assert(out("a").getAs[Double]("clipped_sum") === 35.0)
    // released = clipped_sum + noise (both quantized)
    val ra = out("a")
    assert(math.abs(ra.getAs[Double]("released") -
      (ra.getAs[Double]("clipped_sum") + ra.getAs[Double]("noise"))) < 2e-6)
    // reproducible with the same seed
    val again = Privacy.laplaceSum(df, "g", "x", lo = 0.0, hi = 5.0, epsilon = 1.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("noise")).toMap
    assert(again("a") === ra.getAs[Double]("noise"))
    // wider bounds → larger sensitivity → noise scales by hi ratio exactly
    // (same u draw per group, b linear in max(|lo|,|hi|))
    val wide = Privacy.laplaceSum(df, "g", "x", lo = 0.0, hi = 50.0, epsilon = 1.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("noise")).toMap
    assert(math.abs(wide("a") - 10.0 * ra.getAs[Double]("noise")) < 1e-4)
  }

  test("Eval.confusion: hand 3-class table; absent predicted class scores precision 0") {
    // truth:  a a a b b c ; pred: a a b b b a  -> c never predicted
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a"))
      .toDF("t", "p")
    val rows = graft.ml.Eval.confusion(df, "t", "p").collect()
      .map(r => r.getAs[String]("class") -> r).toMap
    assert(rows("a").getAs[Long]("tp") == 2L && rows("a").getAs[Long]("n_pred") == 3L)
    assert(rows("b").getAs[Long]("tp") == 2L && rows("b").getAs[Long]("n_pred") == 3L)
    assert(rows("c").getAs[Long]("tp") == 0L && rows("c").getAs[Long]("n_pred") == 0L)
    assert(rows("c").getAs[Double]("precision") == 0.0 && rows("c").getAs[Double]("recall") == 0.0)
    // accuracy = 4/6; micro = accuracy
    val acc = rows("a").getAs[Double]("accuracy")
    assert(math.abs(acc - 4.0 / 6) < 2e-6)
    assert(rows("a").getAs[Double]("micro_f1") == acc)
    // macro: f1(a) with p=2/3 r=2/3 -> 2/3; f1(b) p=2/3 r=1 -> 0.8; f1(c)=0
    val macroF1 = rows("a").getAs[Double]("macro_f1")
    assert(math.abs(macroF1 - (2.0 / 3 + 0.8 + 0.0) / 3) < 2e-6)
  }
}
