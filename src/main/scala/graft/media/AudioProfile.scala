package graft.media

import org.apache.spark.sql.{DataFrame, Dataset}

/** Audio quality profiling — the audio analog of the image decode /
  * feature pass ([[Multimodal.decodeReal]]) and the quality-scoring
  * filters a speech-data pipeline gates on BEFORE transcription: RMS
  * level (dead-air detection), zero-crossing rate (a cheap spectral
  * proxy — a pure tone's ZCR is 2f/rate, broadband noise sits much
  * higher), clipping ratio (overdriven capture), and silence ratio.
  * Decode canonicalizes through the JDK's own converters to 16-bit
  * signed LE PCM like [[Multimodal.decodeAudio]] — 8-bit, stereo, and
  * big-endian containers all land on the same amplitude scale;
  * non-PCM payloads degrade to `ok = false` rows.
  *
  * Embarrassingly parallel map, one decode per row; nothing
  * corpus-sized anywhere.
  */
object AudioProfile {

  case class Stats(
      media_id: Long,
      ok: Boolean,
      n_frames: Long,
      rate: Int,
      duration_sec: Double,
      rms: Double,
      zcr: Double,
      clip_ratio: Double,
      silence_ratio: Double)

  /** Profile one payload. ZCR counts sign changes between consecutive
    * frames on channel 0 over (frames − 1) transitions; clipping is
    * |s| ≥ 32760/32768; silence is |s| < 0.002 (≈ −54 dBFS).
    */
  def profile(payload: Array[Byte]): Option[(Long, Int, Double, Double, Double, Double)] =
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
        val nTotal = bytes.length / 2
        val frames = nTotal / channels
        var sumSq = 0.0
        var clipped = 0L
        var silent = 0L
        var crossings = 0L
        var prevSign = 0
        var i = 0
        while (i < nTotal) {
          val raw = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
          val s = raw / 32768.0
          sumSq += s * s
          if (math.abs(raw.toInt) >= 32760) clipped += 1
          if (math.abs(s) < 0.002) silent += 1
          if (i % channels == 0) { // channel 0 only for ZCR
            val sign = if (raw > 0) 1 else if (raw < 0) -1 else 0
            if (sign != 0) {
              if (prevSign != 0 && sign != prevSign) crossings += 1
              prevSign = sign
            }
          }
          i += 1
        }
        val n = math.max(nTotal, 1).toDouble
        Some((
          frames.toLong,
          fmt.getSampleRate.toInt,
          math.sqrt(sumSq / n),
          if (frames > 1) crossings.toDouble / (frames - 1) else 0.0,
          clipped / n,
          silent / n))
      }
    } catch { case _: Exception => None }

  /** Batch profile over a media Dataset; non-audio and undecodable rows
    * degrade with `ok = false` and zeroed stats.
    */
  def profileAll(media: Dataset[Multimodal.MediaRow]): Dataset[Stats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val p = if (m.kind == "audio") profile(m.payload) else None
      p match {
        case Some((fr, rate, rms, zcr, clip, sil)) =>
          Stats(m.media_id, ok = true, fr, rate,
            if (rate > 0) fr.toDouble / rate else 0.0, rms, zcr, clip, sil)
        case None => Stats(m.media_id, ok = false, 0L, 0, 0.0, 0.0, 0.0, 0.0, 0.0)
      }
    }
  }
}
