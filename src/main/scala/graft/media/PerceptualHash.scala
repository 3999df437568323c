package graft.media

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + near-duplicate image dedup — the
  * multimodal sibling of [[graft.dedup.SimHash]]: a 64-bit dHash
  * (gradient hash) per image, then the same band-join candidate
  * generation simhash uses, verified by exact Hamming distance. Resized
  * crops, re-encodes, and light edits keep most gradient bits, so they
  * land within a few bits of the original; unrelated images sit near 32.
  *
  * The hash's 9×8 downscale is a plain BLOCK AVERAGE computed in
  * integer-derived arithmetic (no AWT rendering pipeline), so it is
  * bit-deterministic on any JVM. Decode reuses [[Multimodal]]'s
  * pixel-budgeted ImageIO path — undecodable payloads degrade to
  * `ok = false` rows, never fail the scan.
  *
  * Scale shape: hashing is an embarrassingly parallel map (one decode
  * per image); candidate generation explodes 4 × 16-bit bands and
  * self-joins on (band, key) — pairs within Hamming ≤ 3 of each other
  * share at least one band by pigeonhole, so the ≤3 regime has NO
  * recall loss; verification is one codegen'd `bit_count(xor)` per
  * candidate. Nothing all-pairs, nothing driver-side.
  */
object PerceptualHash {

  /** 64-bit difference hash: decode, block-average to a 9×8 grayscale
    * grid, emit bit (row r, col c) = cell(r,c) > cell(r,c+1), row-major
    * MSB-first. None if the payload doesn't decode inside the pixel
    * budget.
    */
  def dHash64(
      payload: Array[Byte],
      maxPixels: Long = Multimodal.MaxImagePixels): Option[Long] =
    Multimodal.decodeGray(payload, maxPixels).flatMap { case (w, h, gray) =>
      if (w < 9 || h < 8) None
      else {
        val cells = Array.ofDim[Double](8, 9)
        var r = 0
        while (r < 8) {
          val y0 = r * h / 8; val y1 = (r + 1) * h / 8
          var c = 0
          while (c < 9) {
            val x0 = c * w / 9; val x1 = (c + 1) * w / 9
            var s = 0.0; var n = 0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { s += gray(y * w + x); n += 1; x += 1 }
              y += 1
            }
            cells(r)(c) = if (n == 0) 0.0 else s / n
            c += 1
          }
          r += 1
        }
        var bits = 0L
        var i = 0
        while (i < 64) {
          val rr = i / 8; val cc = i % 8
          bits = (bits << 1) | (if (cells(rr)(cc) > cells(rr)(cc + 1)) 1L else 0L)
          i += 1
        }
        Some(bits)
      }
    }

  /** (media_id, phash, ok) for every image row. */
  def hashAll(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .map { m =>
        val h = if (m.kind == "image") dHash64(m.payload) else None
        (m.media_id, h.getOrElse(0L), h.isDefined)
      }
      .toDF("media_id", "phash", "ok")
  }

  /** Near-duplicate pairs (id_a < id_b, hamming ≤ maxHamming) from a
    * hashed frame. Complete for maxHamming ≤ 3 (4 bands × 16 bits,
    * pigeonhole); above that it is a recall-bounded shortlist like any
    * LSH — stated, not silent.
    */
  def nearDupPairs(
      hashes: DataFrame,
      idCol: String,
      hashCol: String,
      maxHamming: Int = 3): DataFrame = {
    val banded = hashes
      .select(col(idCol).as("id"), col(hashCol).as("h"))
      .select(col("id"), col("h"),
        // mask, not %: shiftrightunsigned(h, 0) is h itself, and Spark's
        // % keeps the sign — a hash with bit 63 set would get a NEGATIVE
        // band-0 key and miss partners agreeing on the low 16 bits
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("h"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("key"))): _*))
          .as("bk"))
      .select(col("id"), col("h"), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"), col("id").as("id_a"), col("h").as("h_a"))
    val b = banded.select(col("band"), col("key"), col("id").as("id_b"), col("h").as("h_b"))
    a.join(b, Seq("band", "key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
