package graft.media

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Audio near-duplicate detection by window fingerprinting — the audio
  * member of the multimodal family beside [[VideoDedup]] (SURVEY §2
  * X6): re-encoded, gain-changed, or trimmed copies of a recording
  * share most window fingerprints while unrelated audio shares none.
  *
  * Fingerprint (Haitsma–Kalker 2002 shape, FFT-free stand-in): decode
  * to channel-0 PCM (the [[AudioProfile]] canonicalization — the JDK
  * converts 8-bit/stereo/big-endian to one amplitude scale), slide a
  * `win`-sample window at `stride`; each window splits into 33
  * contiguous blocks whose energies E[t][b] give bit b of a 32-bit
  * fingerprint as sign((E[t][b] − E[t][b+1]) − (E[t−1][b] −
  * E[t−1][b+1])) — energy DIFFERENCES across band and time, so a
  * uniform gain g scales every energy by g² and flips no bit
  * (gain-invariance is spec-pinned). The first window of each file has
  * no predecessor and is dropped.
  *
  * Scale shape: ONE decode pass (embarrassingly parallel flatMap, no
  * shuffle) → (audio, window, fp) rows → candidate WINDOW pairs from a
  * 2×16-bit banded self-join on the fingerprint (complete for hamming
  * ≤ 1 by pigeonhole — hence the require; hot buckets CAPPED via
  * [[graft.dedup.MinHashLsh.capBuckets]]: silence and steady tones are
  * real degenerate buckets) → per-pair overlap counts. Windows join on
  * fingerprint VALUE, not index, so copies trimmed by whole strides
  * still collide. Nothing corpus² anywhere.
  */
object AudioDedup {

  /** Channel-0 samples in [−1, 1) — [[AudioProfile]]'s decode
    * convention; non-PCM or truncated payloads yield None.
    */
  def samples(payload: Array[Byte]): Option[Array[Double]] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val src = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      val fmt = src.getFormat
      val enc = fmt.getEncoding
      val pcm = enc == AudioFormat.Encoding.PCM_SIGNED ||
        enc == AudioFormat.Encoding.PCM_UNSIGNED ||
        enc == AudioFormat.Encoding.PCM_FLOAT
      if (!pcm) None
      else {
        val channels = math.max(fmt.getChannels, 1)
        val target = new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, channels, 2 * channels, fmt.getSampleRate, false)
        val ais = AudioSystem.getAudioInputStream(target, src)
        val bytes = ais.readAllBytes()
        val frames = bytes.length / 2 / channels
        val out = new Array[Double](frames)
        var t = 0
        while (t < frames) {
          val i = t * channels
          out(t) = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort / 32768.0
          t += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }

  private val Bands = 33 // 32 fingerprint bits need 33 block energies

  /** 32-bit fingerprints of one sample array: one per window after the
    * first (needs a predecessor); fewer than `win` + `stride` samples
    * yield nothing.
    */
  def fingerprintsOf(s: Array[Double], win: Int, stride: Int): Seq[(Int, Int)] = {
    require(win >= Bands, s"AudioDedup: win must be >= $Bands samples")
    require(stride >= 1, "AudioDedup: stride must be >= 1")
    val nWin = if (s.length < win) 0 else (s.length - win) / stride + 1
    if (nWin < 2) return Nil
    val energies = Array.tabulate(nWin) { w =>
      val base = w * stride
      Array.tabulate(Bands) { b =>
        val from = base + b * win / Bands
        val until = base + (b + 1) * win / Bands
        var e = 0.0
        var i = from
        while (i < until) { e += s(i) * s(i); i += 1 }
        e
      }
    }
    (1 until nWin).map { w =>
      var fp = 0
      var b = 0
      while (b < 32) {
        val cur = energies(w)(b) - energies(w)(b + 1)
        val prev = energies(w - 1)(b) - energies(w - 1)(b + 1)
        if (cur - prev > 0) fp |= (1 << b)
        b += 1
      }
      (w, fp)
    }
  }

  /** (audio_id, win_idx, fp) for every decodable payload. */
  def fingerprints(
      media: Dataset[Multimodal.MediaRow],
      win: Int = 1024,
      stride: Int = 512): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .flatMap { m =>
        samples(m.payload).toSeq.flatMap(s =>
          fingerprintsOf(s, win, stride).map { case (w, fp) => (m.media_id, w, fp) })
      }
      .toDF("audio_id", "win_idx", "fp")
  }

  /** Near-duplicate audio pairs (id_a < id_b): window fingerprints
    * match at hamming ≤ `maxHamming` through the 2×16-bit banded join
    * (complete for maxHamming ≤ 1 by pigeonhole), buckets capped at
    * `maxBucket` (the [[graft.dedup.MinHashLsh]] hot-bucket contract —
    * silence/steady-tone windows are degenerate buckets), and the pair
    * qualifies when BOTH sides have ≥ `minOverlap` of their windows
    * matched. Emits per-side matched counts and the min overlap (4dp).
    */
  def nearDup(
      media: Dataset[Multimodal.MediaRow],
      win: Int = 1024,
      stride: Int = 512,
      maxHamming: Int = 1,
      minOverlap: Double = 0.5,
      maxBucket: Int = 2000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 1,
      s"AudioDedup.nearDup: the 2-band pigeonhole join is only complete for " +
        s"maxHamming <= 1 (got $maxHamming)")
    val fh = fingerprints(media, win, stride).persist()
    val sizes = fh.groupBy(col("audio_id")).agg(count(lit(1)).as("n_win"))
    val banded = fh.select(
      col("audio_id"), col("win_idx"), col("fp"),
      explode(array((0 until 2).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("fp").cast("long").bitwiseAND(lit(0xFFFFFFFFL)), 16 * b)
            .bitwiseAND(lit(0xFFFFL)).as("key"))): _*))
        .as("bk"))
      .select(col("audio_id"), col("win_idx"), col("fp"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val capped = graft.dedup.MinHashLsh.capBuckets(
      banded, Seq("band", "key"),
      Seq(xxhash64(col("audio_id"), col("win_idx")), col("audio_id"), col("win_idx")),
      maxBucket)
    val l = capped.select(col("band"), col("key"), col("audio_id").as("va"),
      col("win_idx").as("wa"), col("fp").as("ha"))
    val r = capped.select(col("band"), col("key"), col("audio_id").as("vb"),
      col("win_idx").as("wb"), col("fp").as("hb"))
    val winPairs = l.join(r, Seq("band", "key"))
      .where(col("va") < col("vb"))
      .select(col("va"), col("wa"), col("ha"), col("vb"), col("wb"), col("hb"))
      .distinct()
      .withColumn("hamming",
        expr("bit_count((cast(ha as bigint) & 4294967295) ^ (cast(hb as bigint) & 4294967295))"))
      .where(col("hamming") <= maxHamming)
    val perPair = winPairs
      .groupBy(col("va"), col("vb"))
      .agg(
        count_distinct(col("wa")).as("n_matched_a"),
        count_distinct(col("wb")).as("n_matched_b"))
    val out = perPair
      .join(sizes.select(col("audio_id").as("va"), col("n_win").as("n_a")), Seq("va"))
      .join(sizes.select(col("audio_id").as("vb"), col("n_win").as("n_b")), Seq("vb"))
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
