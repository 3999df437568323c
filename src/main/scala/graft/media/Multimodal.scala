package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (SURVEY.md §2 X1).
  *
  * Media are opaque `binary` payloads plus a typed metadata struct.
  * TWO decode tiers exist:
  *
  *  - [[decodeImage]] / [[decodeAudio]]: REAL codecs — the JDK's own
  *    `javax.imageio` (PNG/JPEG/BMP/GIF) and `javax.sound.sampled`
  *    (WAV/PCM), no external libraries. [[decodeReal]] runs them per
  *    partition with corrupt payloads degrading to `decode_ok = false`
  *    rows, never task failures. Features are real: decoded dimensions,
  *    per-channel pixel means, sample counts, RMS amplitude.
  *  - [[decodeStub]]: the deterministic fake kept for payloads with no
  *    in-JDK codec (video, proprietary formats) and for the q34 oracle,
  *    which needs DuckDB-recomputable outputs.
  *
  * Scale shape: `mapPartitions` over a typed Dataset — the per-partition
  * iterator is exactly the batch boundary a vectorized decoder wants
  * (analogous to `mapInPandas` batches in PySpark); no driver collect,
  * no shuffle: decoding is embarrassingly parallel.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],
      width: Int,            // metadata the storage layer knows
      height: Int
  )

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      /** content hash of the raw payload — the exact-dedup key a real
        * media pipeline computes alongside decoding (hex md5, so the
        * driver's DuckDB oracle can recompute it with `md5(...)`)
        */
      content_md5: String,
      // deterministic fake "embedding" standing in for decoded features
      feature: Array[Float]
  )

  /** STUB decode: a real implementation would decode `payload` with an
    * image/audio codec and run feature extraction. The deterministic
    * fake hashes fixed-stride byte windows so tests can pin exact
    * values and the batch plumbing is exercised end to end.
    */
  def decodeStub(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < dims) {
      var h = 1125899906842597L
      var j = i
      while (j < payload.length) {
        h = 31 * h + payload(j)
        j += dims
      }
      out(i) = (h % 1000L).toFloat / 1000f
      i += 1
    }
    out
  }

  /** Batch feature extraction over the binary payload column. */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition setup is where a real codec would init once — the
      // digest instance is reused across the whole batch
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { m =>
        md.reset()
        val hex = md.digest(m.payload).map(b => f"$b%02x").mkString
        MediaFeatures(m.media_id, m.kind, m.payload.length, hex, decodeStub(m.payload, dims))
      }
    }
  }

  /** Derive a media table from the documents table (the container has no
    * real media files): payload = utf-8 bytes. Exercises the exact
    * schema/partitioning path a real binary column takes.
    */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        col("text").cast("binary").as("payload"),
        lit(64).as("width"),
        lit(64).as("height")
      )
      .as[MediaRow]
  }

  // ---- REAL codecs (pure JDK: javax.imageio + javax.sound.sampled) ----

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** A REAL PNG payload: width×height RGB image whose pixel (x, y) is a
    * pure function of `seed` — deterministic test media with genuine
    * codec structure (chunk layout, zlib streams, CRCs).
    */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val h = mix(seed ^ (y.toLong << 32) ^ x.toLong)
        img.setRGB(x, y, (h & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A REAL WAV payload: 16-bit PCM mono sine wave at `freqHz`. `amp`
    * above 32767 yields a deliberately clipped signal (clamped, not
    * wrapped) for clipping-detection tests.
    */
  def encodeWav(
      nSamples: Int, sampleRate: Int, freqHz: Double, amp: Double = 16384.0): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = math.max(-32768, math.min(32767,
        (math.sin(2.0 * math.Pi * freqHz * i / sampleRate) * amp).toInt))
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic multi-component WAV: a SUM of (freqHz, amp) sines —
    * spectrally structured enough that [[AudioDedup]]'s band-energy
    * fingerprints distinguish recordings (a single pure tone is
    * periodic and degenerates to near-identical windows).
    */
  def encodeWavMix(
      nSamples: Int, sampleRate: Int, components: Seq[(Double, Double)]): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      var v = 0.0
      components.foreach { case (f, a) =>
        v += math.sin(2.0 * math.Pi * f * i / sampleRate) * a
      }
      val s = math.max(-32768, math.min(32767, v.toInt))
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decoded-media features. Image rows carry real decoded dimensions
    * and per-channel pixel means; audio rows carry sample count, sample
    * rate and RMS amplitude (in `mean_c0`, normalized to [0, 1]).
    * `decode_ok = false` rows are payloads the codec rejected.
    */
  case class DecodedMedia(
      media_id: Long,
      kind: String,
      decode_ok: Boolean,
      width: Int,
      height: Int,
      n_samples: Long,
      mean_c0: Float,
      mean_c1: Float,
      mean_c2: Float
  )

  /** Pixel budget for [[decodeImage]]/[[resizeImage]]: a decompression
    * bomb (a few-KB PNG whose header declares a gigapixel canvas) would
    * OOM the task inside `ImageIO.read` — an `OutOfMemoryError`, which
    * `catch Exception` does NOT stop, killing the executor instead of
    * degrading the row. Dimensions are peeked from the header BEFORE any
    * pixel allocation and over-budget payloads degrade to None.
    */
  val MaxImagePixels: Long = 64L * 1024 * 1024

  /** Decode with the header-dimension budget check: peek w×h via the
    * ImageReader BEFORE `read` allocates the pixel raster.
    */
  private def readBudgeted(
      payload: Array[Byte],
      maxPixels: Long
  ): Option[java.awt.image.BufferedImage] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      // the stream must be closed on EVERY path: with ImageIO's default
      // useCache=true it is backed by a temp file + fd that survive
      // until finalization — per-row leaks kill long-running executors
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) None
            else Some(reader.read(0))
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => None }

  /** REAL image decode to a grayscale plane (ITU-R 601 integer luma,
    * (299r + 587g + 114b)/1000 — exact integer arithmetic, so the
    * plane is bit-deterministic on any JVM): (width, height, row-major
    * luma). Feeds [[PerceptualHash]].
    */
  def decodeGray(
      payload: Array[Byte],
      maxPixels: Long = MaxImagePixels
  ): Option[(Int, Int, Array[Int])] =
    readBudgeted(payload, maxPixels).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val gray = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          gray(y * w + x) =
            (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
          x += 1
        }
        y += 1
      }
      (w, h, gray)
    }

  /** REAL image decode (JDK ImageIO): dimensions + per-channel means.
    * Header dimensions are checked against `maxPixels` before decoding.
    */
  def decodeImage(
      payload: Array[Byte],
      maxPixels: Long = MaxImagePixels
  ): Option[(Int, Int, Array[Float])] =
    readBudgeted(payload, maxPixels).map { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Double](3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sums(0) += (rgb >> 16) & 0xff
          sums(1) += (rgb >> 8) & 0xff
          sums(2) += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      (w, h, sums.map(s => (s / n / 255.0).toFloat))
    }

  /** REAL audio decode (JDK AudioSystem): frame count, rate, RMS.
    *
    * The container's declared format is honored, not assumed: the stream
    * is canonicalized to 16-bit signed little-endian PCM (channel count
    * and rate preserved) through the JDK's own converters, so 8-bit
    * unsigned, stereo, and big-endian payloads (AIFF, or BE WAV
    * variants) all decode to the SAME normalized amplitude scale.
    * Non-PCM encodings (µ-law, a-law, compressed) return None — a
    * wrong-scale "success" on them would be a silent wrong answer.
    *
    * `n_samples` is the FRAME count (samples per channel); RMS is over
    * all interleaved channel samples.
    */
  def decodeAudio(payload: Array[Byte]): Option[(Long, Int, Float)] =
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
        val channels = fmt.getChannels
        val target = new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, channels, 2 * channels, fmt.getSampleRate,
          false)
        val ais = AudioSystem.getAudioInputStream(target, src)
        val bytes = ais.readAllBytes()
        val nTotal = bytes.length / 2
        val frames = nTotal / math.max(channels, 1)
        var sumSq = 0.0
        var i = 0
        while (i < nTotal) {
          val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort / 32768.0
          sumSq += s * s
          i += 1
        }
        Some(
          (frames.toLong, fmt.getSampleRate.toInt,
            math.sqrt(sumSq / math.max(nTotal, 1)).toFloat))
      }
    } catch { case _: Exception => None }

  /** REAL image resize: decode → bilinear-interpolated redraw → PNG
    * re-encode, pure JDK (`Graphics2D`). Returns None for payloads
    * ImageIO rejects or whose header exceeds the pixel budget.
    */
  def resizeImage(payload: Array[Byte], width: Int, height: Int): Option[Array[Byte]] =
    try {
      readBudgeted(payload, MaxImagePixels).map { src =>
        val dst = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, width, height, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }
    } catch { case _: Exception => None }

  /** Batch REAL resize over an image Dataset — the thumbnail /
    * model-input-normalization pass. Output rows carry the re-encoded
    * payload with updated metadata; undecodable payloads pass through
    * unchanged with `width = height = 0` flagging them (quarantine
    * downstream). Embarrassingly parallel, same shape as [[decodeReal]].
    */
  def resizeAll(media: Dataset[MediaRow], width: Int, height: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        if (m.kind != "image") m
        else
          resizeImage(m.payload, width, height) match {
            case Some(p) => MediaRow(m.media_id, m.kind, p, width, height)
            case None => MediaRow(m.media_id, m.kind, m.payload, 0, 0)
          }
      }
    }
  }

  /** Batch REAL decode: images through ImageIO, audio through
    * AudioSystem, anything the codec rejects degrades to a
    * `decode_ok = false` row (quarantine-style: corrupt media must
    * never fail a 100 TB scan). Embarrassingly parallel mapPartitions,
    * same shape as [[extractFeatures]].
    */
  def decodeReal(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        m.kind match {
          case "image" =>
            decodeImage(m.payload) match {
              case Some((w, h, means)) =>
                DecodedMedia(m.media_id, m.kind, decode_ok = true, w, h, 0L,
                  means(0), means(1), means(2))
              case None =>
                DecodedMedia(m.media_id, m.kind, decode_ok = false, 0, 0, 0L, 0f, 0f, 0f)
            }
          case "audio" =>
            decodeAudio(m.payload) match {
              case Some((n, rate, rms)) =>
                DecodedMedia(m.media_id, m.kind, decode_ok = true, 0, 0, n, rms, rate.toFloat, 0f)
              case None =>
                DecodedMedia(m.media_id, m.kind, decode_ok = false, 0, 0, 0L, 0f, 0f, 0f)
            }
          case _ =>
            DecodedMedia(m.media_id, m.kind, decode_ok = false, 0, 0, 0L, 0f, 0f, 0f)
        }
      }
    }
  }
}
