package graft.media

import graft.SparkSpec

class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("AudioProfile: sine-tone closed forms — RMS, ZCR, no clipping") {
    val wav = Multimodal.encodeWav(16000, 8000, 200.0) // 2s of 200 Hz
    val Some((frames, rate, rms, zcr, clip, silence)) = AudioProfile.profile(wav)
    assert(frames === 16000L && rate === 8000)
    // half-scale sine: RMS = 0.5/sqrt(2) ≈ 0.3536
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01, s"rms=$rms")
    // pure tone ZCR = 2f/rate = 0.05
    assert(math.abs(zcr - 0.05) < 0.003, s"zcr=$zcr")
    assert(clip === 0.0)
    // 200 Hz on an 8000 Hz grid lands EXACTLY on zero every 20th
    // sample (sin(πk/20) at k ≡ 0 mod 20) → silence is exactly 1/20
    assert(silence === 0.05, s"silence=$silence")
  }

  test("AudioProfile: overdriven sine clips at the discrete arcsine fraction; quiet sine is silence") {
    val loud = Multimodal.encodeWav(16000, 8000, 200.0, amp = 48000.0)
    val Some((_, _, _, _, clip, _)) = AudioProfile.profile(loud)
    // the sampling grid quantizes the sine to 40 phases per period;
    // count the clipped ones exactly rather than using the continuous
    // arcsine limit (which is off by the grid, 0.522 vs 0.55)
    val expect = (0 until 40).count { k =>
      val s = math.max(-32768, math.min(32767,
        (math.sin(2.0 * math.Pi * k / 40.0) * 48000.0).toInt))
      math.abs(s) >= 32760
    } / 40.0
    assert(math.abs(clip - expect) < 1e-9, s"clip=$clip expect=$expect")

    val quiet = Multimodal.encodeWav(16000, 8000, 200.0, amp = 40.0)
    val Some((_, _, rms, _, _, silence)) = AudioProfile.profile(quiet)
    // amp 40/32768 ≈ 0.00122 < 0.002 threshold for most of the cycle
    assert(silence > 0.5, s"silence=$silence")
    assert(rms < 0.001)
  }

  test("AudioProfile.profileAll degrades non-audio rows and runs the batch") {
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "audio", Multimodal.encodeWav(800, 8000, 400.0), 0, 0),
      Multimodal.MediaRow(2L, "audio", "junk".getBytes, 0, 0),
      Multimodal.MediaRow(3L, "image", Multimodal.encodePng(8, 8, 1), 0, 0)))
    val out = AudioProfile.profileAll(media).collect().map(s => s.media_id -> s).toMap
    assert(out(1L).ok && out(1L).n_frames === 800L)
    assert(math.abs(out(1L).zcr - 0.1) < 0.005) // 2*400/8000
    assert(!out(2L).ok && !out(3L).ok)
  }
}
