package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenization — the third tokenizer family next to
  * [[Bpe]] (frequency-merge) and [[UnigramLm]] (probabilistic prune):
  * BERT's subword scheme (Schuster & Nakajima 2012; the trainer loop
  * and `##` continuation convention as in the public BERT /
  * HuggingFace implementations).
  *
  * Differences from BPE that make it a distinct operator, not a
  * variant: training merges the pair maximizing the LIKELIHOOD score
  * count(ab) / (count(a)·count(b)) — high-PMI pairs win over merely
  * frequent ones — and encoding is greedy longest-match-first against
  * the piece vocabulary (no merge replay), with whole-word [UNK]
  * fallback when any position has no matching piece (WordPiece is NOT
  * lossless, unlike byte-level BPE — that trade buys the fixed
  * linguistic-looking vocab BERT-family models expect).
  *
  * Scale shape is [[Bpe]]'s: ONE distributed (word, count) pass
  * compresses the corpus to a bounded dictionary, the merge loop runs
  * driver-side on that table, and encoding is mapPartitions with the
  * vocab broadcast once — no shuffle, no driver involvement.
  */
object WordPiece {

  val Unk = "[UNK]"

  /** Piece inventory: index 0 is [UNK]; initial alphabet (sorted) then
    * merged symbols in merge order, so the vocabulary is a pure
    * deterministic function of the dictionary. Continuation pieces
    * carry the `##` prefix.
    */
  final case class Vocab(pieces: IndexedSeq[String]) extends Serializable {
    require(pieces.headOption.contains(Unk), "pieces(0) must be [UNK]")
    def size: Int = pieces.length
    @transient lazy val index: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](pieces.length * 2)
      pieces.zipWithIndex.foreach { case (p, i) => m.put(p, i) }
      m
    }
    @transient lazy val maxPieceChars: Int =
      if (pieces.length <= 1) 1
      else pieces.iterator.drop(1).map(p => if (p.startsWith("##")) p.length - 2 else p.length).max
    def piece(id: Int): String = pieces(id)
  }

  /** Greedy longest-match-first encoding of one word (BERT
    * `WordpieceTokenizer`): at each position take the LONGEST vocab
    * piece (`##`-prefixed beyond position 0); any position with no
    * match, or a word over `maxInputChars`, collapses to one [UNK].
    */
  def encodeWord(word: String, vocab: Vocab, maxInputChars: Int = 100): Array[Int] = {
    if (word.isEmpty) return Array.empty
    if (word.length > maxInputChars) return Array(0)
    val out = mutable.ArrayBuilder.make[Int]
    var i = 0
    while (i < word.length) {
      val limit = math.min(word.length, i + vocab.maxPieceChars)
      var j = limit
      var found = -1
      while (j > i && found < 0) {
        val cand = if (i == 0) word.substring(i, j) else "##" + word.substring(i, j)
        val id = vocab.index.get(cand)
        if (id != null) found = id else j -= 1
      }
      if (found < 0) return Array(0) // whole-word UNK
      out += found
      i = j
    }
    out.result()
  }

  /** Best-effort inverse (strips `##`); exact for UNK-free encodings. */
  def decodeWord(ids: Seq[Int], vocab: Vocab): String =
    ids.map { id =>
      val p = vocab.piece(id)
      if (p.startsWith("##")) p.substring(2) else p
    }.mkString

  /** Whitespace word counts — the one corpus-sized pass of training. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Driver-side likelihood-merge loop on a bounded (word, count)
    * dictionary. Per round: symbol and adjacent-pair counts under the
    * CURRENT segmentation, merge the pair with the highest
    * count(ab)/(count(a)·count(b)) — ties by (left, right) lexicographic
    * so training is deterministic. Stops early when no pair repeats.
    */
  def train(words: Seq[(String, Long)], numMerges: Int): Vocab = {
    var seqs: Array[(Array[String], Long)] = words.iterator
      .filter(_._1.nonEmpty)
      .map { case (w, c) =>
        (w.toCharArray.zipWithIndex.map { case (ch, i) =>
          if (i == 0) ch.toString else "##" + ch
        }, c)
      }
      .toArray

    val alphabet = seqs.iterator.flatMap(_._1).toSet.toSeq.sorted
    val merged = mutable.ArrayBuffer.empty[String]
    var stop = false
    while (merged.length < numMerges && !stop) {
      val symCnt = new java.util.HashMap[String, java.lang.Long]()
      val pairCnt = new java.util.HashMap[(String, String), java.lang.Long]()
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symCnt.merge(syms(i), c, (x, y) => x + y)
          if (i < syms.length - 1) pairCnt.merge((syms(i), syms(i + 1)), c, (x, y) => x + y)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestScore = 0.0
      var bestCnt = 0L
      pairCnt.forEach { (k, v) =>
        if (v >= 2) {
          val s = v.toDouble / (symCnt.get(k._1).toDouble * symCnt.get(k._2).toDouble)
          val better = s > bestScore ||
            (s == bestScore && best != null &&
              (k._1 < best._1 || (k._1 == best._1 && k._2 < best._2)))
          if (best == null || better) { best = k; bestScore = s; bestCnt = v }
        }
      }
      if (best == null) stop = true
      else {
        val joined = best._1 + best._2.stripPrefix("##")
        merged += joined
        seqs = seqs.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = mutable.ArrayBuilder.make[String]
            var k = 0
            while (k < syms.length) {
              if (k < syms.length - 1 && syms(k) == best._1 && syms(k + 1) == best._2) {
                out += joined; k += 2
              } else { out += syms(k); k += 1 }
            }
            (out.result(), c)
          }
        }
      }
    }
    Vocab(((Unk +: alphabet) ++ merged).toIndexedSeq)
  }

  /** End-to-end training: distributed word counts, top `maxWords` (by
    * count desc, word asc — the [[Bpe.trainOn]] compromise), driver
    * merge loop.
    */
  def trainOn(df: DataFrame, textCol: String, numMerges: Int, maxWords: Int = 100000): Vocab = {
    val top = wordCounts(df, textCol)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    train(top.toSeq, numMerges)
  }

  /** Tokenize a corpus: `(idCol, pieces array<int>, n_pieces, n_unk)`.
    * mapPartitions, vocab broadcast once, per-partition word cache
    * (Zipf head ⇒ high hit rate). No shuffle.
    */
  def tokenize(df: DataFrame, textCol: String, idCol: String, vocab: Vocab): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val v = bc.value
        val cache = new java.util.HashMap[String, Array[Int]]()
        it.map { case (id, text) =>
          val words = (if (text == null) "" else text).split("\\s+").filter(_.nonEmpty)
          val buf = mutable.ArrayBuilder.make[Int]
          words.foreach { w =>
            var ids = cache.get(w)
            if (ids == null) {
              ids = encodeWord(w, v)
              if (cache.size < 100000) cache.put(w, ids)
            }
            buf.addAll(ids)
          }
          (id, buf.result())
        }
      }
      .toDF(idCol, "pieces")
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
      .withColumn(
        "n_unk",
        size(filter(col("pieces"), p => p === 0)).cast("long"))
  }

  // ---- persisted lifecycle ([[graft.sources.IndexCatalog]]) ----------

  private val Kind = "wordpiece_vocab"

  def saveVocab(spark: SparkSession, vocab: Vocab, path: String): Unit = {
    import spark.implicits._
    graft.sources.IndexCatalog.write(
      spark, path, Kind,
      Map("size" -> vocab.size.toString),
      Seq("pieces" -> vocab.pieces.zipWithIndex
        .map { case (p, i) => (i, p) }
        .toDF("id", "piece")))
  }

  def loadVocab(spark: SparkSession, path: String): Vocab = {
    graft.sources.IndexCatalog.open(spark, path, Kind)
    Vocab(
      graft.sources.IndexCatalog.part(spark, path, "pieces")
        .orderBy(col("id"))
        .collect()
        .map(_.getString(1))
        .toIndexedSeq)
  }
}
