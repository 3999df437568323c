package graft.media

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Video near-duplicate detection by frame sampling — the video member
  * of the multimodal family beside [[PerceptualHash]]'s still-image
  * dedup: decode is per-row and embarrassingly parallel
  * (`mapPartitions`, budget-guarded), every frame at the sampling
  * stride gets the SAME 64-bit dHash the image path uses, and two
  * videos are near-duplicates when enough of their sampled frames
  * match — re-encoded, re-containered, or lightly re-cut copies share
  * most frame hashes while unrelated footage shares none.
  *
  * Container: the test corpus has no real video files, so the operator
  * ships its own deterministic container (`encodeVideo`: GVID magic +
  * length-prefixed REAL PNG frames) — the Spark-side plumbing (binary
  * column, per-partition decode, frame explode, banded join) is
  * exactly what MP4+keyframe extraction would feed; only the codec
  * call is swappable.
  *
  * Scale shape: ONE decode pass (corpus-sized, no shuffle) → frame-
  * hash rows (videos × sampled frames) → candidate FRAME pairs from a
  * 16-bit banded self-join on the hash (the pigeonhole bands of
  * [[PerceptualHash.nearDupPairs]] — never all-pairs, and hot buckets
  * are CAPPED like [[graft.dedup.MinHashLsh]]: black/intro/outro
  * frames are real degenerate buckets) → per-video-pair overlap
  * counts. Nothing corpus² anywhere.
  */
object VideoDedup {

  final case class VideoRow(video_id: Long, payload: Array[Byte])

  private val Magic = Array[Byte]('G', 'V', 'I', 'D')

  /** Deterministic container: magic, int32 frame count, then
    * length-prefixed frame payloads (PNG bytes from the caller).
    */
  def encodeVideo(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Magic)
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  /** Frame payloads, bounds-checked (a truncated or foreign payload
    * yields None, never an exception mid-job — the decode-budget
    * convention of [[Multimodal]]).
    */
  def decodeFrames(payload: Array[Byte], maxFrames: Int = 512): Option[Seq[Array[Byte]]] = {
    if (payload == null || payload.length < 8) return None
    if (!(0 until 4).forall(i => payload(i) == Magic(i))) return None
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(payload, 4, payload.length - 4))
    try {
      val n = in.readInt()
      if (n < 0 || n > maxFrames) return None
      val frames = Vector.newBuilder[Array[Byte]]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        if (len < 0 || len > payload.length) return None
        val buf = new Array[Byte](len)
        in.readFully(buf)
        frames += buf
        i += 1
      }
      Some(frames.result())
    } catch { case _: java.io.IOException => None }
  }

  /** (video_id, frame_idx, phash) for every STRIDE-th frame that
    * decodes (frame 0, stride, 2·stride, …) — the keyframe-sampling
    * stand-in; undecodable videos/frames are dropped with a per-row
    * `ok` audit available via [[frameAudit]].
    */
  def frameHashes(
      videos: Dataset[VideoRow],
      stride: Int = 2,
      maxFrames: Int = 512): DataFrame = {
    require(stride >= 1, "VideoDedup: stride must be >= 1")
    val spark = videos.sparkSession
    import spark.implicits._
    videos
      .flatMap { v =>
        decodeFrames(v.payload, maxFrames).toSeq.flatMap { frames =>
          frames.zipWithIndex
            .filter(_._2 % stride == 0)
            .flatMap { case (png, idx) =>
              PerceptualHash.dHash64(png).map(h => (v.video_id, idx, h))
            }
        }
      }
      .toDF("video_id", "frame_idx", "phash")
  }

  /** Per-video decode audit: (video_id, n_frames, n_sampled, ok). */
  def frameAudit(videos: Dataset[VideoRow], stride: Int = 2, maxFrames: Int = 512): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.map { v =>
      val dec = decodeFrames(v.payload, maxFrames)
      val n = dec.map(_.length).getOrElse(0)
      (v.video_id, n, if (n == 0) 0 else (n + stride - 1) / stride, dec.isDefined)
    }.toDF("video_id", "n_frames", "n_sampled", "ok")
  }

  /** Near-duplicate video pairs (id_a < id_b): sampled frames match at
    * hamming ≤ `maxHamming` through the 4×16-bit banded join (complete
    * for maxHamming ≤ 3 by pigeonhole — hence the require; 4+ bit flips
    * can corrupt all four bands, silently losing candidates; buckets
    * capped at `maxBucket` members — the MinHashLsh hot-bucket
    * contract), and the pair qualifies when BOTH videos have ≥
    * `minOverlap` of their sampled frames matched. Emits per-side
    * matched counts and the min overlap fraction (4dp).
    */
  def nearDup(
      videos: Dataset[VideoRow],
      stride: Int = 2,
      maxHamming: Int = 3,
      minOverlap: Double = 0.6,
      maxFrames: Int = 512,
      maxBucket: Int = 2000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"VideoDedup.nearDup: the 4-band pigeonhole join is only complete for " +
        s"maxHamming <= 3 (got $maxHamming)")
    val fh = frameHashes(videos, stride, maxFrames).persist()
    val sizes = fh.groupBy(col("video_id")).agg(count(lit(1)).as("n_sampled"))
    val banded = fh.select(
      col("video_id"), col("frame_idx"), col("phash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("phash"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("key"))): _*))
        .as("bk"))
      .select(col("video_id"), col("frame_idx"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    // hot-bucket cap (black frames, standard intros): deterministic
    // hash-sample above maxBucket via the shared two-pass — cold
    // buckets are never sorted; only the degenerate slice pays
    val capped = graft.dedup.MinHashLsh.capBuckets(
      banded, Seq("band", "key"),
      Seq(xxhash64(col("video_id"), col("frame_idx")), col("video_id"), col("frame_idx")),
      maxBucket)
    val l = capped.select(col("band"), col("key"), col("video_id").as("va"),
      col("frame_idx").as("fa"), col("phash").as("ha"))
    val r = capped.select(col("band"), col("key"), col("video_id").as("vb"),
      col("frame_idx").as("fb"), col("phash").as("hb"))
    val framePairs = l.join(r, Seq("band", "key"))
      .where(col("va") < col("vb"))
      .select(col("va"), col("fa"), col("ha"), col("vb"), col("fb"), col("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .where(col("hamming") <= maxHamming)
    val perPair = framePairs
      .groupBy(col("va"), col("vb"))
      .agg(
        count_distinct(col("fa")).as("n_matched_a"),
        count_distinct(col("fb")).as("n_matched_b"))
    val out = perPair
      .join(sizes.select(col("video_id").as("va"), col("n_sampled").as("n_a")), Seq("va"))
      .join(sizes.select(col("video_id").as("vb"), col("n_sampled").as("n_b")), Seq("vb"))
      .withColumn("overlap",
        round(least(
          col("n_matched_a").cast("double") / col("n_a"),
          col("n_matched_b").cast("double") / col("n_b")), 4))
      .where(col("overlap") >= minOverlap)
      .select(col("va").as("id_a"), col("vb").as("id_b"),
        col("n_matched_a"), col("n_matched_b"), col("n_a"), col("n_b"), col("overlap"))
    val materialized = out.localCheckpoint()
    fh.unpersist(false)
    materialized
  }
}
