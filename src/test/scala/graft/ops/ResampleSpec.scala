package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def ts(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000L)

  test("Resample.fillForward: dense grid, gaps carried forward, last-in-bucket wins") {
    // key 1: obs at t=0 (v=10), t=25 twice in one bucket (v=20 then 21), t=95 (v=30)
    // step 10 → buckets 0,10,...,90; bucket 20 holds the later value 21
    val df = Seq(
      (1L, ts(0), 1L, 10.0), (1L, ts(25), 2L, 20.0), (1L, ts(27), 3L, 21.0),
      (1L, ts(95), 4L, 30.0),
      (2L, ts(5), 5L, 7.0)).toDF("k", "ts", "tie", "v")
    val out = Resample.fillForward(df, "k", "ts", "tie", "v", stepSec = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap

    val b0 = base.getTime / 1000L
    // key 1 grid spans buckets b0+0 .. b0+90 → 10 rows
    assert(out.count(_._1._1 == 1L) === 10)
    assert(out((1L, b0)) === ((10.0, 1L)))
    assert(out((1L, b0 + 10)) === ((10.0, 0L))) // gap: carried
    assert(out((1L, b0 + 20)) === ((21.0, 1L))) // last obs in bucket wins
    assert(out((1L, b0 + 30)) === ((21.0, 0L)))
    assert(out((1L, b0 + 90)) === ((30.0, 1L)))
    // key 2: single observation → single grid row
    assert(out.count(_._1._1 == 2L) === 1)
    assert(out((2L, b0)) === ((7.0, 1L)))
  }

  test("Resample.ohlc: hand candle with open/close by arrival order") {
    // one bucket (step 60): values 5, 9, 2, 7 in ts order
    val df = Seq(
      (1L, ts(1), 1L, 5.0), (1L, ts(10), 2L, 9.0),
      (1L, ts(20), 3L, 2.0), (1L, ts(30), 4L, 7.0)).toDF("k", "ts", "tie", "v")
    val r = Resample.ohlc(df, "k", "ts", "tie", "v", stepSec = 60L).head()
    assert(r.getAs[Double]("open") === 5.0)
    assert(r.getAs[Double]("high") === 9.0)
    assert(r.getAs[Double]("low") === 2.0)
    assert(r.getAs[Double]("close") === 7.0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("vsum") === 23.0)
  }

  test("Resample.ohlc: same-timestamp ties resolved by the tie column") {
    val df = Seq(
      (1L, ts(0), 2L, 50.0), (1L, ts(0), 1L, 40.0)).toDF("k", "ts", "tie", "v")
    val r = Resample.ohlc(df, "k", "ts", "tie", "v", stepSec = 60L).head()
    assert(r.getAs[Double]("open") === 40.0) // tie 1 first
    assert(r.getAs[Double]("close") === 50.0)
  }
}
