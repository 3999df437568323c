package graft.media

import graft.SparkSpec

class VideoSpec extends SparkSpec {
  import spark.implicits._

  private def png(seed: Long) = Multimodal.encodePng(32, 32, seed)

  test("encodeVideo/decodeFrames round-trip; truncated and foreign payloads refuse cleanly") {
    val frames = (1L to 5L).map(png)
    val payload = VideoDedup.encodeVideo(frames)
    val back = VideoDedup.decodeFrames(payload).get
    assert(back.length === 5)
    back.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    assert(VideoDedup.decodeFrames(payload.take(payload.length - 3)).isEmpty,
      "truncated payload must refuse, not throw")
    assert(VideoDedup.decodeFrames("not a video".getBytes).isEmpty)
    assert(VideoDedup.decodeFrames(payload, maxFrames = 3).isEmpty,
      "frame-count budget enforced")
  }

  test("frameHashes samples at the stride; identical pixels give identical hashes") {
    val v = Seq(
      VideoDedup.VideoRow(1L, VideoDedup.encodeVideo((0L until 6L).map(png))),
      VideoDedup.VideoRow(2L, VideoDedup.encodeVideo(Seq(png(0L)))))
    val fh = VideoDedup.frameHashes(v.toDS(), stride = 2)
      .as[(Long, Int, Long)].collect()
    assert(fh.filter(_._1 == 1L).map(_._2).sorted.toSeq === Seq(0, 2, 4))
    val h0v1 = fh.find(r => r._1 == 1L && r._2 == 0).get._3
    val h0v2 = fh.find(r => r._1 == 2L && r._2 == 0).get._3
    assert(h0v1 === h0v2, "same pixels, same dHash — the cross-video match primitive")
  }

  test("nearDup: planted re-cut found, unrelated footage clean, overlap exact") {
    val ids = (10L until 18L)
    val base = VideoDedup.encodeVideo(ids.map(png))
    val recut = VideoDedup.encodeVideo(
      ids.take(6).map(png) ++ ids.drop(6).map(i => png(i + 500)))
    val other = VideoDedup.encodeVideo(ids.map(i => png(i + 900)))
    val vids = Seq(
      VideoDedup.VideoRow(1L, base),
      VideoDedup.VideoRow(2L, recut),
      VideoDedup.VideoRow(3L, other)).toDS()
    val out = VideoDedup.nearDup(vids, stride = 2, maxHamming = 3, minOverlap = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("overlap")).toMap
    // sampled frames 0,2,4,6: the re-cut shares 0,2,4 → overlap 3/4
    assert(out.keySet === Set((1L, 2L)), s"got $out")
    assert(out((1L, 2L)) === 0.75)
    // audit: all three decode, 4 sampled frames each
    val audit = VideoDedup.frameAudit(vids, stride = 2)
      .as[(Long, Int, Int, Boolean)].collect()
    assert(audit.forall(a => a._4 && a._2 === 8 && a._3 === 4))
  }

  test("nearDup hot-bucket cap: a shared black-frame class stays bounded") {
    // 30 videos all containing the SAME single frame: every band bucket
    // holds 30 members; with maxBucket=5 the pair set is C(5,2)-bounded
    // instead of C(30,2) — and the job completes
    val vids = (1L to 30L).map(i =>
      VideoDedup.VideoRow(i, VideoDedup.encodeVideo(Seq(png(7L))))).toDS()
    val pairs = VideoDedup.nearDup(vids, stride = 1, minOverlap = 0.5, maxBucket = 5)
    val n = pairs.count()
    assert(n <= 10L, s"capped bucket must bound pairs: $n")
    assert(n > 0L, "kept members still pair with each other")
  }

  test("undecodable videos drop from hashing but stay in the audit") {
    val vids = Seq(
      VideoDedup.VideoRow(1L, VideoDedup.encodeVideo(Seq(png(1L)))),
      VideoDedup.VideoRow(2L, "garbage-bytes-not-a-container".getBytes)).toDS()
    assert(VideoDedup.frameHashes(vids, stride = 1).count() === 1L)
    val audit = VideoDedup.frameAudit(vids, stride = 1)
      .as[(Long, Int, Int, Boolean)].collect().map(a => a._1 -> a._4).toMap
    assert(audit(1L) && !audit(2L))
  }
}
