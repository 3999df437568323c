package graft.text

import java.util.zip.Deflater

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Model-free redundancy signals for quality filtering — the two
  * standard "is this text mostly repetition/boilerplate" gauges a
  * curation pipeline runs before any model-based scorer:
  *
  *   - DEFLATE compression ratio (the Dolma-style gzip-ratio tagger):
  *     templated/repetitive text compresses far below natural prose.
  *     zlib with pinned settings, computed in `mapPartitions` with one
  *     reused `Deflater` per partition (the [[Bpe.tokenize]] shape —
  *     embarrassingly parallel, no shuffle, no UDF boxing per call).
  *     Not SQL-expressible → rows+spec, like the tokenizers.
  *
  *   - Token Shannon entropy (nats): low entropy = few distinct tokens
  *     dominate. Pure closed-form column arithmetic over per-doc token
  *     counts, fully DuckDB-replayable.
  */
object Compressibility {

  /** (idCol, n_bytes, n_deflate, deflate_ratio) — ratio rounded 4dp;
    * empty text keeps ratio 1.0 (incompressible by convention).
    */
  def deflateRatio(df: DataFrame, textCol: String, idCol: String, level: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val bytes = (if (text == null) "" else text).getBytes("UTF-8")
          if (bytes.isEmpty) (id, 0L, 0L, 1.0)
          else {
            // fresh Deflater per doc (reset() keeps dictionary state
            // deterministic too, but fresh is unambiguous); pinned
            // level + default strategy = deterministic for a given zlib
            val d = new Deflater(level, false)
            d.setInput(bytes)
            d.finish()
            var n = 0L
            while (!d.finished()) n += d.deflate(buf)
            d.end()
            val ratio = BigDecimal(n.toDouble / bytes.length)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            (id, bytes.length.toLong, n, ratio)
          }
        }
      }
      .toDF(idCol, "n_bytes", "n_deflate", "deflate_ratio")
  }

  /** Per-doc token Shannon entropy in nats: −Σ (c/n)·ln(c/n) over the
    * doc's token counts. One explode + one (doc, token) aggregate +
    * one per-doc sum; every term is a closed form on integer counts.
    * Output (idCol, n_tokens_e, n_distinct, entropy).
    */
  def tokenEntropy(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val counts = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("__tok"))
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__c"))
    val totals = counts.groupBy(col(idCol)).agg(sum("__c").as("__n"))
    val p = col("__c").cast("double") / col("__n").cast("double")
    counts
      .join(totals, Seq(idCol))
      .groupBy(col(idCol))
      .agg(
        max(col("__n")).as("n_tokens_e"),
        count(lit(1)).as("n_distinct"),
        round(-sum(p * log(p)), 4).as("entropy"))
  }
}
