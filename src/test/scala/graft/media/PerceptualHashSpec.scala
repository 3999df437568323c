package graft.media

import graft.SparkSpec

class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private def perturbedPng(width: Int, height: Int, seed: Long, flips: Int): Array[Byte] = {
    // decode the clean PNG, darken a few isolated pixels, re-encode —
    // a genuine small edit through the real codec
    val clean = Multimodal.encodePng(width, height, seed)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(clean))
    (0 until flips).foreach { i =>
      img.setRGB((i * 7) % width, (i * 3) % height, 0x000000)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash64: deterministic; identical images hash equal; re-encode invariant") {
    val a = Multimodal.encodePng(32, 32, seed = 5)
    val b = Multimodal.encodePng(32, 32, seed = 5)
    val h1 = PerceptualHash.dHash64(a).get
    assert(h1 === PerceptualHash.dHash64(b).get)
    // zero-edit re-encode through the codec: same pixels, same hash
    assert(PerceptualHash.dHash64(perturbedPng(32, 32, 5, flips = 0)).get === h1)
  }

  test("dHash64: small edits stay close, different images sit far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val h = PerceptualHash.dHash64(Multimodal.encodePng(48, 48, seed = 9)).get
    val hNear = PerceptualHash.dHash64(perturbedPng(48, 48, 9, flips = 4)).get
    val hFar = PerceptualHash.dHash64(Multimodal.encodePng(48, 48, seed = 10)).get
    assert(ham(h, hNear) <= 8, s"small edit moved ${ham(h, hNear)} bits")
    assert(ham(h, hFar) >= 16, s"unrelated images only ${ham(h, hFar)} bits apart")
    // undecodable and too-small payloads degrade to None
    assert(PerceptualHash.dHash64("not a png".getBytes).isEmpty)
    assert(PerceptualHash.dHash64(Multimodal.encodePng(4, 4, 1)).isEmpty)
  }

  test("nearDupPairs finds planted duplicate classes and nothing else at hamming 0") {
    val media = spark.createDataset(
      (0L until 40L).map { id =>
        val seed = if (id < 30) id % 10 else 1000 + id // 10 classes of 3 + 10 singletons
        Multimodal.MediaRow(id, "image", Multimodal.encodePng(24, 24, seed), 0, 0)
      })
    val hashes = PerceptualHash.hashAll(media)
    val pairs = PerceptualHash.nearDupPairs(hashes, "media_id", "phash", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("hamming")))
    val exact = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    // each class {s, s+10, s+20} contributes exactly its 3 pairs
    val expected = (0L until 10L).flatMap(s =>
      Seq((s, s + 10), (s, s + 20), (s + 10, s + 20))).toSet
    assert(expected.subsetOf(exact), s"missing ${expected.diff(exact)}")
    // no singleton appears in any exact-duplicate pair
    assert(!pairs.exists(p => p._3 == 0 && (p._1 >= 30 || p._2 >= 30)))
  }

  test("nearDupPairs band-0 key: pigeonhole holds for hashes with bit 63 set") {
    import spark.implicits._
    // pairs whose ONLY agreeing band is band 0, with bit 63 set (negative
    // long): one differing bit each in bands 1 and 2 plus bit 63 itself
    // toggled in the partner's band 3 — hamming 3, must be found
    val base = 0xF0F0_0F0F_1234_ABCDL // bit 63 set -> negative
    val partner = base ^ (1L << 20) ^ (1L << 40) ^ (1L << 63) // bands 1,2,3 each differ by 1 bit
    assert(base < 0 && java.lang.Long.bitCount(base ^ partner) == 3)
    val hashes = Seq((1L, base), (2L, partner), (3L, 0x12345L)).toDF("media_id", "phash")
    val pairs = PerceptualHash.nearDupPairs(hashes, "media_id", "phash", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.toSet == Set((1L, 2L)))
  }
}
