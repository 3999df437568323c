package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection (SURVEY.md §2 P2).
  *
  * Pipeline (all declarative, shuffle only on small derived keys):
  *  1. shingle: word n-grams per document (`sequence` + `transform` —
  *     array algebra inside codegen);
  *  2. hash shingles with xxhash64 and explode → (doc, shingleHash);
  *  3. minhash signature: for each of `numHashes` seeded affine
  *     permutations h_i(x) = (a_i·x + b_i) mod p, take min over the
  *     document's shingles — ONE groupBy(doc) with `numHashes` min
  *     aggregates (map-side combined);
  *  4. band: split the signature into `bands` bands of `rowsPerBand`,
  *     hash each band, explode → (band, bucket, doc);
  *  5. candidate pairs: self-join on (band, bucket) with id< id —
  *     only same-bucket docs ever meet, never all pairs;
  *  6. verify: exact shingle-set Jaccard on candidates only.
  *
  * Determinism: the permutation constants come from a fixed seed, so
  * results are reproducible across runs and cluster sizes.
  */
object MinHashLsh {
  /** 2^31-1: shingle hashes and permutation constants live in this field
    * so a*h + b stays < 2^62 — no silent Long overflow inside the plan.
    */
  private val MersennePrime = 2147483647L

  /** Seeded affine permutation constants (deterministic). */
  def coefficients(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1,
                         math.abs(rnd.nextLong()) % MersennePrime))
  }

  /** Word n-gram shingles from an ALREADY-MATERIALIZED token array
    * column. Higher-order functions run interpreted: if the tokens were
    * an inline `split(...)` expression it would re-evaluate once per
    * shingle (O(tokens²) per document) — callers must bind tokens to a
    * real column first (see [[shingled]]).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))
        )
      )

  /** df + `__shingles` column (distinct word n-grams of `textCol`). */
  def shingled(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.withColumn("__toks", split(col(textCol), " "))
      .withColumn("__shingles", array_distinct(shinglesFromTokens(col("__toks"), n)))
      .drop("__toks")

  /** Word n-gram shingles of `text` as an array column (small-input
    * convenience; prefer [[shingled]] in plans).
    */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(split(text, " "), n)

  /** (id, sig array<long>) — minhash signatures. */
  def signatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      seed: Long = 42L
  ): DataFrame = {
    val coefs = coefficients(numHashes, seed)
    val exploded = shingled(df, textCol, shingleSize)
      .select(col(idCol), explode(col("__shingles")).as("sh"))
      .withColumn("h", pmod(xxhash64(col("sh")), lit(MersennePrime)))
    val minAggs = coefs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(MersennePrime))).as(s"m_$i")
    }
    exploded
      .groupBy(col(idCol))
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col(idCol), array(coefs.indices.map(i => col(s"m_$i")): _*).as("sig"))
  }

  /** (band, bucket, id) — banded signature buckets. */
  def bands(sig: DataFrame, idCol: String, numBands: Int): DataFrame = {
    val n = sig.select(size(col("sig"))).head().getInt(0)
    val rowsPerBand = n / numBands
    val bandCols = (0 until numBands).map { b =>
      struct(lit(b).as("band"), xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))).as("bucket"))
    }
    sig
      .select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate near-duplicate pairs (id_a < id_b), deduplicated. */
  def candidatePairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      numBands: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    val sig = signatures(df, textCol, idCol, numHashes, shingleSize, seed)
    val b = bands(sig, idCol, numBands)
    val l = b.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val r = b.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Candidates verified with exact shingle-set Jaccard ≥ threshold. */
  def nearDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      numBands: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    val cands = candidatePairs(df, textCol, idCol, numHashes, shingleSize, numBands, seed)
    val sets = shingled(df, textCol, shingleSize)
      .select(col(idCol), col("__shingles").as("sh_set"))
    cands
      .join(sets.withColumnRenamed(idCol, "id_a").withColumnRenamed("sh_set", "set_a"), Seq("id_a"))
      .join(sets.withColumnRenamed(idCol, "id_b").withColumnRenamed("sh_set", "set_b"), Seq("id_b"))
      .withColumn(
        "jaccard",
        round(
          size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
            size(array_union(col("set_a"), col("set_b"))),
          4
        )
      )
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
