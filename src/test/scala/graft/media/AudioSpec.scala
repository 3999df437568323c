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


  // ---- AudioDedup (X6) --------------------------------------------------

  private def mix(cls: Int, gain: Double, n: Int = 4096): Array[Byte] = {
    // close-frequency pairs create class-specific BEAT envelopes — the
    // temporal structure the block-energy fingerprints read
    val f = 200.0 + 17.0 * cls
    Multimodal.encodeWavMix(n, 8000, Seq(
      (f, 9000.0 * gain), (f + 5.0 + cls % 3, 9000.0 * gain),
      (2.3 * f, 4000.0 * gain)))
  }

  private def media(rows: Seq[(Long, Array[Byte])]) =
    spark.createDataset(rows.map { case (id, p) =>
      Multimodal.MediaRow(id, "audio", p, 0, 0)
    })

  test("AudioDedup: gain-changed copy found with high overlap; unrelated classes clean") {
    val m = media(Seq(
      1L -> mix(0, 1.0), 2L -> mix(0, 0.25), // same class, 12 dB apart
      3L -> mix(5, 1.0), 4L -> mix(9, 1.0))) // unrelated
    val pairs = AudioDedup.nearDup(m, minOverlap = 0.5)
      .select("id_a", "id_b", "overlap")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs.contains((1L, 2L)), s"gain-changed copy must be found: $pairs")
    assert(pairs((1L, 2L)) >= 0.8, s"energy-difference bits are gain-invariant: ${pairs((1L, 2L))}")
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L),
      s"unrelated recordings must not pair: $pairs")
  }

  test("AudioDedup: copy trimmed by whole strides still collides (fp joins on value, not index)") {
    val full = mix(2, 1.0, n = 4096 + 1024)
    // decode, drop the first 2 strides, re-encode — a head-trimmed copy
    val s = AudioDedup.samples(full).get
    val trimmedPcm = s.drop(1024)
    val bytes = new Array[Byte](trimmedPcm.length * 2)
    trimmedPcm.zipWithIndex.foreach { case (v, i) =>
      val raw = math.max(-32768, math.min(32767, (v * 32768.0).round.toInt))
      bytes(2 * i) = (raw & 0xff).toByte
      bytes(2 * i + 1) = ((raw >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, trimmedPcm.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val m = media(Seq(1L -> full, 2L -> bos.toByteArray))
    val pairs = AudioDedup.nearDup(m, minOverlap = 0.5)
      .select("id_a", "id_b", "overlap").as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 0.5),
      s"stride-trimmed copy must still collide: ${pairs.toSeq}")
  }

  test("AudioDedup: a silent degenerate class stays bounded by the hot-bucket cap") {
    // 30 all-silence recordings: every window's fp is 0 — one degenerate
    // bucket; with cap 5 the pair count is bounded by the kept slice
    val silent = Multimodal.encodeWavMix(4096, 8000, Seq((200.0, 0.0)))
    val m = media((1L to 30L).map(_ -> silent))
    val capped = AudioDedup.nearDup(m, minOverlap = 0.5, maxBucket = 5)
    // windows per file: 6 fps after the first; kept members pair only
    // within the 5-member hash sample per bucket
    assert(capped.count() <= 5L * 4 / 2 + 1,
      s"cap must bound the silent clique: ${capped.count()}")
    // undecodable payloads drop from fingerprinting silently
    val withJunk = media(Seq(1L -> silent, 2L -> "not audio at all".getBytes("UTF-8")))
    assert(AudioDedup.fingerprints(withJunk).where(org.apache.spark.sql.functions
      .col("audio_id") === 2L).count() === 0L)
  }

  test("AudioDedup: fingerprintsOf guards and determinism") {
    intercept[IllegalArgumentException](AudioDedup.fingerprintsOf(new Array[Double](64), 16, 8))
    intercept[IllegalArgumentException](AudioDedup.fingerprintsOf(new Array[Double](64), 64, 0))
    // too short for two windows -> empty
    assert(AudioDedup.fingerprintsOf(new Array[Double](100), 64, 64) === Nil)
    val s = AudioDedup.samples(mix(1, 1.0)).get
    val a = AudioDedup.fingerprintsOf(s, 1024, 512)
    val b = AudioDedup.fingerprintsOf(s, 1024, 512)
    assert(a === b && a.nonEmpty)
  }
}
