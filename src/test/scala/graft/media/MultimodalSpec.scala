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
