package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
  * the SentencePiece unigram model): pieces carry independent
  * probabilities, a word's segmentation likelihood is the product of
  * its pieces' probabilities, training is EM over the segmentation
  * lattice, and encoding is the Viterbi segmentation. The OTHER major
  * tokenizer family next to [[Bpe]]'s merge ranks: probabilistic,
  * prune-to-target rather than grow-by-merge.
  *
  * Scale shape — stronger than the classic single-node trainer:
  *   - Like [[Bpe.trainOn]], ONE corpus pass builds the (pre-token,
  *     count) dictionary. UNLIKE the BPE loop, EM never needs that
  *     dictionary on the driver: each E-step is a row-local
  *     forward–backward over the word's character lattice
  *     (O(len · maxPieceLen) per word) with the CURRENT vocab broadcast,
  *     expected piece counts pre-aggregated per partition into a
  *     vocab-sized map — so the shuffle and the driver collect are both
  *     bounded by the vocabulary, never by the dictionary. A 100 TB
  *     corpus with a billion distinct pre-tokens trains with the word
  *     frame persisted and distributed throughout.
  *   - Seeding is the same shape: candidate substrings (≤ maxPieceLen)
  *     explode out of the word frame, aggregate by total occurrence
  *     mass, and only the top `seedSize` come back (TakeOrdered — no
  *     full sort), single characters always included.
  *   - ENCODING is embarrassingly parallel mapPartitions: broadcast
  *     (piece → logprob) map, per-partition Viterbi cache keyed by
  *     word (Zipf head ⇒ high hit rate), no shuffle. Round trip is
  *     lossless BY CONSTRUCTION (a segmentation concatenates to its
  *     word; characters are protected from pruning, and a character
  *     unseen at training time is emitted as its own piece).
  *
  * Pruning follows the shrink-by-expected-count simplification (drop
  * the lowest-mass non-character pieces per round, `keepFrac` at a
  * time, never below `targetVocab`) rather than SentencePiece's exact
  * per-piece loss delta — the standard approximation; the EM fixpoint
  * and encode semantics are unchanged.
  *
  * Determinism: every tie (seed candidate mass, prune order, Viterbi
  * path) breaks on (value, piece-lexicographic) so a vocabulary is a
  * pure function of the dictionary and the hyperparameters. Expected
  * counts are distributed double sums, so the last bits of the
  * PROBABILITIES can vary with partitioning; piece SETS and Viterbi
  * paths are pinned by spec on well-separated examples.
  */
object UnigramLm {

  /** A trained vocabulary: piece → natural-log probability. */
  final case class UVocab(pieces: Map[String, Double]) extends Serializable {
    def size: Int = pieces.size
    lazy val maxPieceLen: Int = if (pieces.isEmpty) 1 else pieces.keysIterator.map(_.length).max
  }

  // ---- lattice machinery (row-local) ----------------------------------

  private def logSumExp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

  /** Expected piece counts and log-likelihood of one word under the
    * current vocab (forward–backward over the character lattice),
    * accumulated into `acc` weighted by `cnt`.
    */
  private def accumExpected(
      word: String,
      cnt: Long,
      vocab: Map[String, Double],
      maxLen: Int,
      acc: mutable.HashMap[String, Double]
  ): Unit = {
    val n = word.length
    if (n == 0) return
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    val beta = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= math.min(maxLen, i)) {
        val lp = vocab.getOrElse(word.substring(i - l, i), Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity && alpha(i - l) != Double.NegativeInfinity)
          alpha(i) = logSumExp(alpha(i), alpha(i - l) + lp)
        l += 1
      }
      i += 1
    }
    val total = alpha(n)
    if (total == Double.NegativeInfinity) return // unsegmentable: contributes nothing
    beta(n) = 0.0
    i = n - 1
    while (i >= 0) {
      var l = 1
      while (l <= math.min(maxLen, n - i)) {
        val lp = vocab.getOrElse(word.substring(i, i + l), Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity && beta(i + l) != Double.NegativeInfinity)
          beta(i) = logSumExp(beta(i), lp + beta(i + l))
        l += 1
      }
      i -= 1
    }
    i = 0
    while (i < n) {
      var l = 1
      while (l <= math.min(maxLen, n - i)) {
        val piece = word.substring(i, i + l)
        val lp = vocab.getOrElse(piece, Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity &&
          alpha(i) != Double.NegativeInfinity && beta(i + l) != Double.NegativeInfinity) {
          val gamma = math.exp(alpha(i) + lp + beta(i + l) - total)
          acc.update(piece, acc.getOrElse(piece, 0.0) + gamma * cnt)
        }
        l += 1
      }
      i += 1
    }
  }

  /** Viterbi segmentation under `vocab`; ties prefer the LONGER last
    * piece (strictly-greater updates scanning lengths long→short).
    * Characters missing from the vocab become their own pieces at a
    * floor score, so every word segments (lossless by construction).
    */
  def segmentWord(word: String, vocab: Map[String, Double], maxLen: Int): List[String] = {
    val n = word.length
    if (n == 0) return Nil
    val floor = -1e4 // worse than any real logprob; keeps unknown chars segmentable
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val from = new Array[Int](n + 1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = math.min(maxLen, i)
      while (l >= 1) {
        val piece = word.substring(i - l, i)
        val lp = vocab.getOrElse(piece, if (l == 1) floor else Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity && best(i - l) != Double.NegativeInfinity) {
          val s = best(i - l) + lp
          if (s > best(i)) { best(i) = s; from(i) = i - l }
        }
        l -= 1
      }
      i += 1
    }
    var out = List.empty[String]
    var pos = n
    while (pos > 0) { out = word.substring(from(pos), pos) :: out; pos = from(pos) }
    out
  }

  // ---- training -------------------------------------------------------

  /** Pre-token dictionary: same pre-tokenizer as [[Bpe.wordCounts]]. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame = Bpe.wordCounts(df, textCol)

  /** One distributed E-step: expected piece counts over the whole word
    * frame. Per-partition accumulation keeps every emitted map
    * vocab-sized; the groupBy shuffle moves ≤ #partitions × vocab rows.
    */
  private[text] def expectedCounts(
      words: DataFrame,
      vocab: Map[String, Double],
      maxLen: Int
  ): Array[(String, Double)] = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    words.as[(String, Long)]
      .mapPartitions { it =>
        val acc = mutable.HashMap.empty[String, Double]
        it.foreach { case (w, c) => accumExpected(w, c, bc.value, maxLen, acc) }
        acc.iterator
      }
      .toDF("piece", "ec")
      .groupBy("piece").agg(sum("ec").as("ec"))
      .as[(String, Double)]
      .collect()
  }

  /** Train to `targetVocab` pieces: seed with the top-`seedSize`
    * substrings by occurrence mass (chars always in), then alternate
    * `emIters` EM refits with a shrink-to-`keepFrac` prune until the
    * target size holds, finishing with one final refit.
    */
  def train(
      df: DataFrame,
      textCol: String,
      targetVocab: Int,
      maxPieceLen: Int = 8,
      seedSize: Int = 4000,
      emIters: Int = 2,
      keepFrac: Double = 0.75
  ): UVocab = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = wordCounts(df, textCol).persist()
    try {
      // ---- seed: substring mass, chars protected ----------------------
      val cands = words.as[(String, Long)]
        .mapPartitions { it =>
          val acc = mutable.HashMap.empty[String, Double]
          it.foreach { case (w, c) =>
            var i = 0
            while (i < w.length) {
              var l = 1
              while (l <= math.min(maxPieceLen, w.length - i)) {
                val p = w.substring(i, i + l)
                acc.update(p, acc.getOrElse(p, 0.0) + c.toDouble)
                l += 1
              }
              i += 1
            }
          }
          acc.iterator
        }
        .toDF("piece", "mass")
        .groupBy("piece").agg(sum("mass").as("mass"))
      val chars = cands.where(length(col("piece")) === 1)
        .as[(String, Double)].collect()
      val multis = cands.where(length(col("piece")) > 1)
        .orderBy(col("mass").desc, col("piece"))
        .limit(math.max(0, seedSize - chars.length))
        .as[(String, Double)].collect()
      require(chars.nonEmpty, "unigram training needs a non-empty corpus")
      require(targetVocab >= chars.length,
        s"targetVocab $targetVocab below the ${chars.length} protected characters")

      def normalize(counts: Seq[(String, Double)]): Map[String, Double] = {
        val floor = 1e-12 // protected pieces with no mass keep a floor
        val total = counts.map(c => math.max(c._2, floor)).sum
        counts.map { case (p, c) => p -> math.log(math.max(c, floor) / total) }.toMap
      }

      var vocab = normalize((chars ++ multis).toSeq)
      val charSet = chars.map(_._1).toSet

      // ---- EM + prune rounds -----------------------------------------
      var done = false
      while (!done) {
        var e = 0
        while (e < emIters) {
          vocab = normalize(expectedCounts(words, vocab, maxPieceLen).toSeq)
          e += 1
        }
        if (vocab.size <= targetVocab) done = true
        else {
          // drop the lowest-probability non-char pieces, keepFrac at a
          // time (ties: piece lexicographic), never below target
          val multisNow = vocab.toSeq.filter(p => !charSet.contains(p._1))
          val keepMulti = math.max(
            targetVocab - charSet.size,
            (multisNow.size * keepFrac).toInt)
          val kept = multisNow.sortBy { case (p, lp) => (-lp, p) }.take(keepMulti)
          vocab = (vocab.toSeq.filter(p => charSet.contains(p._1)) ++ kept).toMap
          // renormalize the survivors' mass
          val z = vocab.values.map(math.exp).sum
          vocab = vocab.view.mapValues(lp => lp - math.log(z)).toMap
        }
      }
      vocab = normalize(expectedCounts(words, vocab, maxPieceLen).toSeq)
      UVocab(vocab)
    } finally words.unpersist(false)
  }

  // ---- corpus-side application ---------------------------------------

  /** `(idCol, pieces array<string>, n_pieces, roundtrip_ok)` — Viterbi
    * per pre-token, mapPartitions with the vocab broadcast once and a
    * per-partition word cache; `roundtrip_ok` re-concatenates the
    * pieces against the original text IN the query (losslessness is
    * structural, the column proves it end-to-end).
    */
  def withPieces(df: DataFrame, textCol: String, idCol: String, vocab: UVocab): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val v = bc.value
        val pat = java.util.regex.Pattern.compile(Bpe.PretokenPattern)
        val cache = mutable.HashMap.empty[String, List[String]]
        it.map { case (id, textRaw) =>
          val text = if (textRaw == null) "" else textRaw
          val m = pat.matcher(text)
          val pieces = mutable.ArrayBuffer.empty[String]
          while (m.find()) {
            val w = m.group()
            pieces ++= cache.getOrElseUpdate(w, segmentWord(w, v.pieces, v.maxPieceLen))
          }
          (id, pieces.toSeq, pieces.length.toLong, pieces.mkString == text)
        }
      }
      .toDF(idCol, "pieces", "n_pieces", "roundtrip_ok")
  }

  /** Persist / restore a vocabulary (train once, tokenize anywhere) —
    * an [[graft.sources.IndexCatalog]] entry (kind `unigram_vocab`,
    * part `pieces`).
    */
  def saveVocab(spark: SparkSession, vocab: UVocab, path: String): Unit = {
    import spark.implicits._
    graft.sources.IndexCatalog.write(
      spark, path, "unigram_vocab",
      Map("vocab_size" -> vocab.pieces.size.toString),
      Seq("pieces" -> vocab.pieces.toSeq.sortBy(_._1).toDF("piece", "logprob")))
  }

  def loadVocab(spark: SparkSession, path: String): UVocab = {
    import spark.implicits._
    graft.sources.IndexCatalog.open(spark, path, "unigram_vocab")
    UVocab(
      graft.sources.IndexCatalog.part(spark, path, "pieces")
        .as[(String, Double)].collect().toMap)
  }
}
