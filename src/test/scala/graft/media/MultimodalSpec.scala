package graft.media

import graft.SparkSpec
import graft.util.Tables

class MultimodalSpec extends SparkSpec {

  test("media plumbing: schema, batch extraction, deterministic features") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media, dims = 8)

    assert(
      feats.schema.fieldNames.toSeq == Seq("media_id", "kind", "n_bytes", "content_md5", "feature"))
    val rows = feats.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(_.n_bytes > 0))
    assert(rows.forall(_.content_md5.matches("[0-9a-f]{32}")))

    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(media, dims = 8).collect()
    assert(rows.sortBy(_.media_id).zip(again.sortBy(_.media_id)).forall { case (a, b) =>
      a.feature.sameElements(b.feature)
    })
  }

  test("decodeStub is a pure function of payload bytes") {
    val a = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val b = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val c = Multimodal.decodeStub("hello worle".getBytes("UTF-8"))
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
  }

  test("REAL image decode: ImageIO round-trips synthesized PNGs with exact features") {
    import spark.implicits._
    // a constant-color PNG pins the channel means exactly
    val img = new java.awt.image.BufferedImage(5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 5) img.setRGB(x, y, 0x4080c0) // r=64 g=128 b=192
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", bos.toByteArray, 5, 3),
      Multimodal.MediaRow(2L, "image", Multimodal.encodePng(16, 9, seed = 7L), 16, 9),
      Multimodal.MediaRow(3L, "image", "not a png at all".getBytes("UTF-8"), 0, 0)
    )
    val got = Multimodal.decodeReal(spark.createDataset(rows))
      .collect().map(d => d.media_id -> d).toMap
    assert(got(1L).decode_ok && got(1L).width == 5 && got(1L).height == 3)
    assert(math.abs(got(1L).mean_c0 - 64f / 255f) < 1e-6)
    assert(math.abs(got(1L).mean_c1 - 128f / 255f) < 1e-6)
    assert(math.abs(got(1L).mean_c2 - 192f / 255f) < 1e-6)
    assert(got(2L).decode_ok && got(2L).width == 16 && got(2L).height == 9)
    assert(!got(3L).decode_ok) // corrupt payload degrades, never throws
    // PNG encoding + decode is deterministic end to end
    val again = Multimodal.decodeReal(spark.createDataset(rows)).collect()
      .map(d => d.media_id -> d).toMap
    assert(again(2L) == got(2L))
  }

  test("REAL image resize: dimensions change, constant color survives, corrupt flagged") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x4080c0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", bos.toByteArray, 8, 8),
      Multimodal.MediaRow(2L, "image", "garbage".getBytes("UTF-8"), 0, 0),
      Multimodal.MediaRow(3L, "audio", Multimodal.encodeWav(100, 8000, 440.0), 0, 0)
    )
    val resized = Multimodal.resizeAll(spark.createDataset(rows), 4, 3)
      .collect().map(m => m.media_id -> m).toMap
    // resized payload decodes to the TARGET dimensions with the color intact
    val d = Multimodal.decodeImage(resized(1L).payload).get
    assert((d._1, d._2) == ((4, 3)))
    assert(math.abs(d._3(0) - 64f / 255f) < 1e-6 && math.abs(d._3(2) - 192f / 255f) < 1e-6)
    assert(resized(1L).width == 4 && resized(1L).height == 3)
    assert(resized(2L).width == 0 && resized(2L).height == 0) // corrupt flagged, not thrown
    assert(resized(3L).payload.sameElements(rows(2).payload)) // non-images pass through
  }

  /** Sine-wave PCM in an arbitrary container: bits ∈ {8, 16}, any channel
    * count, LE WAV or BE AIFF — every channel carries the same 0.5-amplitude
    * signal, so RMS is 0.5/√2 regardless of layout.
    */
  private def sineAudio(
      nFrames: Int,
      rate: Int,
      freq: Double,
      bits: Int,
      channels: Int,
      fileType: javax.sound.sampled.AudioFileFormat.Type,
      bigEndian: Boolean
  ): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    val bps = bits / 8
    val data = new Array[Byte](nFrames * channels * bps)
    for (i <- 0 until nFrames; c <- 0 until channels) {
      val v = math.sin(2.0 * math.Pi * freq * i / rate)
      val off = (i * channels + c) * bps
      if (bits == 16) {
        val s = (v * 16384.0).toInt
        if (bigEndian) {
          data(off) = ((s >> 8) & 0xff).toByte; data(off + 1) = (s & 0xff).toByte
        } else {
          data(off) = (s & 0xff).toByte; data(off + 1) = ((s >> 8) & 0xff).toByte
        }
      } else { // 8-bit: WAV stores unsigned, centered at 128
        data(off) = ((128 + (v * 64.0).toInt) & 0xff).toByte
      }
    }
    val fmt = new AudioFormat(rate.toFloat, bits, channels, bits == 16, bigEndian)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, fileType, bos)
    bos.toByteArray
  }

  test("audio decode honors the container format: stereo, 8-bit, big-endian, non-PCM") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioSystem}
    val rms = 0.5 / math.sqrt(2.0)

    // stereo 16-bit LE WAV: n_samples is the FRAME count, not 2× it
    val stereo = Multimodal.decodeAudio(
      sineAudio(4000, 8000, 440.0, 16, 2, AudioFileFormat.Type.WAVE, bigEndian = false)).get
    assert(stereo._1 == 4000L && stereo._2 == 8000)
    assert(math.abs(stereo._3 - rms) < 0.01, s"stereo rms ${stereo._3}")

    // 8-bit unsigned mono WAV: bytes are NOT 2/sample — the old
    // hardcoded s16 unpack read half the samples at garbage amplitudes
    val eight = Multimodal.decodeAudio(
      sineAudio(4000, 8000, 440.0, 8, 1, AudioFileFormat.Type.WAVE, bigEndian = false)).get
    assert(eight._1 == 4000L)
    assert(math.abs(eight._3 - rms) < 0.02, s"8-bit rms ${eight._3}")

    // big-endian 16-bit AIFF: byte order honored (LE unpack of BE data
    // would scramble amplitudes completely)
    val be = Multimodal.decodeAudio(
      sineAudio(4000, 8000, 440.0, 16, 1, AudioFileFormat.Type.AIFF, bigEndian = true)).get
    assert(be._1 == 4000L)
    assert(math.abs(be._3 - rms) < 0.01, s"big-endian rms ${be._3}")

    // all four layouts agree on the signal's RMS
    val mono = Multimodal.decodeAudio(
      sineAudio(4000, 8000, 440.0, 16, 1, AudioFileFormat.Type.WAVE, bigEndian = false)).get
    assert(math.abs(mono._3 - stereo._3) < 0.005 && math.abs(mono._3 - be._3) < 0.005)

    // non-PCM (µ-law) WAV: decode_ok = false, NOT a wrong-scale success
    val pcmSrc = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(
      sineAudio(1000, 8000, 440.0, 16, 1, AudioFileFormat.Type.WAVE, bigEndian = false)))
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val ulaw = AudioSystem.getAudioInputStream(ulawFmt, pcmSrc)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulaw, AudioFileFormat.Type.WAVE, bos)
    assert(Multimodal.decodeAudio(bos.toByteArray).isEmpty)
  }

  test("image decompression bomb: gigapixel header degrades to decode_ok=false, no OOM") {
    import spark.implicits._
    // take a real 4×4 PNG and rewrite its IHDR to claim 40000×40000
    // (1.6 GP ≫ the 64 MP budget), with a valid chunk CRC so the header
    // parse succeeds and only the budget check can reject it
    val png = Multimodal.encodePng(4, 4, seed = 1L)
    val bomb = png.clone()
    def putInt(off: Int, v: Int): Unit = {
      bomb(off) = ((v >>> 24) & 0xff).toByte; bomb(off + 1) = ((v >>> 16) & 0xff).toByte
      bomb(off + 2) = ((v >>> 8) & 0xff).toByte; bomb(off + 3) = (v & 0xff).toByte
    }
    putInt(16, 40000) // IHDR width
    putInt(20, 40000) // IHDR height
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 17) // "IHDR" + 13 data bytes
    putInt(29, crc.getValue.toInt)

    assert(Multimodal.decodeImage(bomb).isEmpty)
    assert(Multimodal.resizeImage(bomb, 4, 4).isEmpty)
    // and through the batch path: a flagged row, not a dead task
    val got = Multimodal.decodeReal(spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "image", bomb, 0, 0),
      Multimodal.MediaRow(2L, "image", png, 4, 4)))).collect()
      .map(d => d.media_id -> d).toMap
    assert(!got(1L).decode_ok)
    assert(got(2L).decode_ok && got(2L).width == 4)
  }

  test("REAL audio decode: AudioSystem parses synthesized WAV, RMS matches a sine") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", Multimodal.encodeWav(8000, 8000, 440.0), 0, 0),
      Multimodal.MediaRow(2L, "audio", Array[Byte](1, 2, 3, 4), 0, 0)
    )
    val got = Multimodal.decodeReal(spark.createDataset(rows))
      .collect().map(d => d.media_id -> d).toMap
    assert(got(1L).decode_ok && got(1L).n_samples == 8000L)
    assert(got(1L).mean_c1 == 8000f) // sample rate survives the round trip
    // RMS of a 0.5-amplitude sine is 0.5/sqrt(2) ~ 0.3536
    assert(math.abs(got(1L).mean_c0 - 0.5f / math.sqrt(2.0).toFloat) < 0.01)
    assert(!got(2L).decode_ok)
  }
}
