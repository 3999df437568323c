package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** T28 length-bucketed batch assignment. */
class LengthBucketsSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(lens: Seq[Int]) =
    lens.zipWithIndex
      .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")

  test("assign: power-of-two bucket bounds are exact at the boundaries") {
    val docs = mkDocs(Seq(1, 16, 17, 32, 33, 64, 100, 1024, 1025))
    val got = LengthBuckets.assign(docs, "text", "doc_id")
      .select("n_tokens", "bucket").as[(Int, Int)].collect().toMap
    assert(got(1) == 16 && got(16) == 16)
    assert(got(17) == 32 && got(32) == 32)
    assert(got(33) == 64 && got(64) == 64)
    assert(got(100) == 128)
    assert(got(1024) == 1024 && got(1025) == 4096)
  }

  test("assign: batches are contiguous id runs within (bucket, shard), capped at batchSize, pad exact") {
    // 40 docs of close-by lengths in one bucket (17..32 -> bucket 32), 4 shards
    val docs = mkDocs(Seq.tabulate(40)(i => 17 + (i % 16)))
    val out = LengthBuckets.assign(docs, "text", "doc_id", batchSize = 8, nShards = 4)
    val rows = out.collect()
    assert(rows.forall(_.getAs[Int]("bucket") == 32))
    // batch occupancy never exceeds batchSize
    val occ = rows.groupBy(r =>
      (r.getAs[Int]("shard"), r.getAs[Int]("batch_idx"))).view.mapValues(_.length)
    assert(occ.values.forall(_ <= 8))
    // 10 docs per shard -> batches 0 (8 docs) and 1 (2 docs)
    assert(occ.toMap == (0 to 3).flatMap(s => Seq((s, 0) -> 8, (s, 1) -> 2)).toMap)
    // pad = batch_max - n_tokens, and batch_max really is the batch max
    rows.groupBy(r => (r.getAs[Int]("shard"), r.getAs[Int]("batch_idx"))).foreach {
      case (_, rs) =>
        val mx = rs.map(_.getAs[Int]("n_tokens")).max
        assert(rs.forall(_.getAs[Int]("batch_max") == mx))
        assert(rs.forall(r => r.getAs[Int]("pad") == mx - r.getAs[Int]("n_tokens")))
    }
  }

  test("assign is deterministic and partitioning-invariant") {
    val docs = mkDocs(Seq.tabulate(60)(i => 5 + (i * 7) % 120))
    val a = LengthBuckets.assign(docs, "text", "doc_id").orderBy("doc_id").collect()
    val b = LengthBuckets.assign(docs.repartition(7), "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("waste: padded volume reconciles and bucketing beats one global batch on mixed lengths") {
    val docs = mkDocs(Seq.fill(16)(20) ++ Seq.fill(16)(500))
    val assigned = LengthBuckets.assign(docs, "text", "doc_id", batchSize = 8, nShards = 2)
    val w = LengthBuckets.waste(assigned).collect()
      .map(r => r.getAs[Int]("bucket") -> r).toMap
    // bucket 32: all rows length 20, zero waste
    assert(w(32).getAs[Long]("sum_tokens") == 16L * 20)
    assert(w(32).getAs[Double]("waste_frac") == 0.0)
    assert(w(512).getAs[Double]("waste_frac") == 0.0)
    // sanity: padded == sum + sum(pad)
    val totPad = assigned.agg(sum("pad")).as[Long].head()
    val padded = w.values.map(_.getAs[Long]("padded_tokens")).sum
    val real = w.values.map(_.getAs[Long]("sum_tokens")).sum
    assert(padded == real + totPad)
    // un-bucketed reference: one batch stream ordered by id would pad
    // the 20-token docs to 500 somewhere; here total waste is zero
    assert(totPad == 0L)
  }
}
