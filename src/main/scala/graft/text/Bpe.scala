package graft.text

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-level byte-pair encoding — REAL tokenization for the token
  * budgets every training-data pipeline runs on (T1 token stats, T9
  * chunk boundaries, T10 packing budgets), replacing the declared
  * regex proxy (`TextStats.BpeishPattern`).
  *
  * Algorithm (public: Sennrich et al. 2016, "Neural Machine Translation
  * of Rare Words with Subword Units"; byte-level variant as in the
  * GPT-2 public code): text is pre-tokenized by a regex, each pre-token
  * becomes its UTF-8 byte sequence (ids 0–255), and the ranked merge
  * table is applied greedily — the LOWEST-ranked adjacent pair present
  * is merged (all its occurrences, left to right) until none remains.
  * Byte-level means NO unknown tokens and lossless round-trip:
  * `decode(encode(s)) == s` for every string.
  *
  * Scale shape:
  *   - TRAINING is the classic two-phase split used by real tokenizer
  *     trainers: ONE distributed pass compresses the corpus to a
  *     (pre-token, count) table (explode + groupBy — the only
  *     corpus-sized stage), then the merge loop runs on that bounded
  *     table driver-side. 100 TB of text becomes a ≤`maxWords`-row
  *     dictionary before any iteration happens.
  *   - ENCODING is embarrassingly parallel: `mapPartitions` with the
  *     vocab broadcast once per executor, the primitive-keyed rank map
  *     and a per-partition word cache built once per partition (the
  *     Zipf head of a natural corpus makes the cache hit rate ~95%+).
  *     No shuffle, no driver involvement.
  */
object Bpe {

  /** The GPT-2 pre-tokenizer pattern (public, from the GPT-2 released
    * code): contractions, optionally-space-prefixed letter/number/punct
    * runs, then trailing/other whitespace.
    */
  val PretokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** A trained vocabulary: merge `i` combines token ids `(a, b)` into
    * token id `256 + i`; ids 0–255 are the raw bytes. The whole state
    * is this one table — small (numMerges rows), broadcast-friendly,
    * trivially serializable.
    */
  final case class Vocab(merges: IndexedSeq[(Int, Int)]) extends Serializable {
    def size: Int = 256 + merges.length

    /** Byte sequence a token id expands to (memoized bottom-up). */
    lazy val tokenBytes: IndexedSeq[Array[Byte]] = {
      val out = new Array[Array[Byte]](size)
      var i = 0
      while (i < 256) { out(i) = Array(i.toByte); i += 1 }
      var m = 0
      while (m < merges.length) {
        val (a, b) = merges(m)
        out(256 + m) = out(a) ++ out(b)
        m += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }

    def decode(ids: Seq[Int]): String = {
      val bos = new java.io.ByteArrayOutputStream()
      ids.foreach(id => bos.write(tokenBytes(id)))
      new String(bos.toByteArray, UTF_8)
    }
  }

  private def pairKey(a: Int, b: Int): Long = (a.toLong << 32) | (b.toLong & 0xffffffffL)

  /** Per-partition encoder: primitive-keyed rank lookup + word cache,
    * built once per partition from the broadcast vocab.
    */
  final class Encoder(vocab: Vocab) {
    private val ranks = new java.util.HashMap[java.lang.Long, Integer](vocab.merges.length * 2)
    vocab.merges.zipWithIndex.foreach { case ((a, b), i) => ranks.put(pairKey(a, b), i) }
    private val pretoken = java.util.regex.Pattern.compile(PretokenPattern)
    private val cache = new java.util.HashMap[String, Array[Int]]()

    /** Apply ranked merges to one pre-token's byte ids (GPT-2 `bpe()`):
      * repeatedly merge ALL occurrences of the lowest-ranked adjacent
      * pair, left to right, until no ranked pair remains.
      */
    def encodeWord(word: String): Array[Int] = {
      val hit = cache.get(word)
      if (hit != null) return hit
      val bytes = word.getBytes(UTF_8)
      var ids = new Array[Int](bytes.length)
      var i = 0
      while (i < bytes.length) { ids(i) = bytes(i) & 0xff; i += 1 }
      var done = ids.length < 2
      while (!done) {
        var bestRank = Int.MaxValue
        var j = 0
        while (j < ids.length - 1) {
          val r = ranks.get(pairKey(ids(j), ids(j + 1)))
          if (r != null && r < bestRank) bestRank = r
          j += 1
        }
        if (bestRank == Int.MaxValue) done = true
        else {
          val (a, b) = vocab.merges(bestRank)
          val merged = 256 + bestRank
          val out = new Array[Int](ids.length)
          var n = 0
          var k = 0
          while (k < ids.length) {
            if (k < ids.length - 1 && ids(k) == a && ids(k + 1) == b) {
              out(n) = merged; n += 1; k += 2
            } else { out(n) = ids(k); n += 1; k += 1 }
          }
          ids = java.util.Arrays.copyOf(out, n)
          done = ids.length < 2
        }
      }
      // cache bound: pre-tokens are words — a runaway synthetic corpus
      // of unique strings must not grow the map without limit
      if (cache.size < 100000) cache.put(word, ids)
      ids
    }

    def encode(text: String): Array[Int] = {
      val m = pretoken.matcher(text)
      val buf = mutable.ArrayBuilder.make[Int]
      while (m.find()) buf.addAll(encodeWord(m.group()))
      buf.result()
    }
  }

  /** Persist a trained vocab: one (rank, a, b) row per merge — the
    * whole tokenizer state, reloadable by any session ([[loadVocab]]).
    * The natural companion of the persisted ANN/graph indexes: train
    * once on the 100 TB corpus, tokenize everywhere. Stored as a
    * [[graft.sources.IndexCatalog]] entry (kind `bpe_vocab`, part
    * `merges`).
    */
  def saveVocab(spark: org.apache.spark.sql.SparkSession, vocab: Vocab, path: String): Unit = {
    import spark.implicits._
    graft.sources.IndexCatalog.write(
      spark, path, "bpe_vocab",
      Map("num_merges" -> vocab.merges.length.toString),
      Seq("merges" -> vocab.merges.zipWithIndex
        .map { case ((a, b), i) => (i, a, b) }
        .toDF("rank", "a", "b")))
  }

  def loadVocab(spark: org.apache.spark.sql.SparkSession, path: String): Vocab = {
    graft.sources.IndexCatalog.open(spark, path, "bpe_vocab")
    Vocab(
      graft.sources.IndexCatalog.part(spark, path, "merges")
        .orderBy(col("rank"))
        .collect()
        .map(r => (r.getInt(1), r.getInt(2)))
        .toIndexedSeq)
  }

  /** Distributed pre-token frequency table — the ONE corpus-sized pass
    * of training. `(word, count)` rows, exact.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(
        explode(regexp_extract_all(col(textCol), lit(PretokenPattern), lit(0))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))

  /** Deterministic merge-table training on a (word, count) dictionary
    * (Sennrich 2016's loop): per round, count adjacent id pairs weighted
    * by word frequency, merge the most frequent — ties broken by
    * (first id asc, second id asc) so the result is a pure function of
    * the dictionary. Stops early when no pair repeats.
    */
  def train(words: Seq[(String, Long)], numMerges: Int): Vocab = {
    var seqs: Array[(Array[Int], Long)] = words.map { case (w, c) =>
      (w.getBytes(UTF_8).map(b => b & 0xff), c)
    }.toArray
    val merges = mutable.ArrayBuffer.empty[(Int, Int)]
    var stop = false
    while (merges.length < numMerges && !stop) {
      val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()
      seqs.foreach { case (ids, c) =>
        var i = 0
        while (i < ids.length - 1) {
          counts.merge(pairKey(ids(i), ids(i + 1)), c, (x, y) => x + y)
          i += 1
        }
      }
      if (counts.isEmpty) stop = true
      else {
        var bestKey = 0L
        var bestCnt = 0L
        counts.forEach { (k, v) =>
          if (v > bestCnt || (v == bestCnt && java.lang.Long.compareUnsigned(k, bestKey) < 0))
          { bestKey = k; bestCnt = v }
        }
        if (bestCnt < 2) stop = true // a pair seen once compresses nothing
        else {
          val a = (bestKey >>> 32).toInt
          val b = (bestKey & 0xffffffffL).toInt
          val merged = 256 + merges.length
          merges += ((a, b))
          seqs = seqs.map { case (ids, c) =>
            if (ids.length < 2) (ids, c)
            else {
              val out = new Array[Int](ids.length)
              var n = 0
              var k = 0
              while (k < ids.length) {
                if (k < ids.length - 1 && ids(k) == a && ids(k + 1) == b) {
                  out(n) = merged; n += 1; k += 2
                } else { out(n) = ids(k); n += 1; k += 1 }
              }
              (java.util.Arrays.copyOf(out, n), c)
            }
          }
        }
      }
    }
    Vocab(merges.toIndexedSeq)
  }

  /** End-to-end training: one distributed word-count pass, top
    * `maxWords` of the dictionary (by count desc, word asc — rare-tail
    * words beyond the cap contribute negligible pair mass, the standard
    * trainer compromise), then the driver-side merge loop on that
    * bounded table.
    */
  def trainOn(df: DataFrame, textCol: String, numMerges: Int, maxWords: Int = 100000): Vocab = {
    val top = wordCounts(df, textCol)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    train(top.toSeq, numMerges)
  }

  /** Tokenize a corpus: `(idCol, tokens array<int>, n_tokens_bpe)` —
    * embarrassingly parallel mapPartitions, vocab broadcast once,
    * encoder + word cache built once per partition. No shuffle.
    */
  def tokenize(df: DataFrame, textCol: String, idCol: String, vocab: Vocab): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val enc = new Encoder(bc.value)
        it.map { case (id, text) => (id, enc.encode(if (text == null) "" else text)) }
      }
      .toDF(idCol, "tokens")
      .withColumn("n_tokens_bpe", size(col("tokens")))
  }

  /** Serializable encode fn for the column form: the encoder (rank map +
    * word cache) is `@transient lazy`, built once per deserialized task,
    * never shipped.
    */
  private final class EncodeFn(bc: org.apache.spark.broadcast.Broadcast[Vocab])
      extends (String => Array[Int])
      with Serializable {
    @transient private lazy val enc = new Encoder(bc.value)
    def apply(s: String): Array[Int] = enc.encode(if (s == null) "" else s)
  }

  private final class DecodeFn(bc: org.apache.spark.broadcast.Broadcast[Vocab])
      extends (Seq[Int] => String)
      with Serializable {
    def apply(ids: Seq[Int]): String = if (ids == null) "" else bc.value.decode(ids)
  }

  /** Column-append form of [[tokenize]]: keeps the input schema and adds
    * `tokens` + `n_tokens_bpe`. Tokenization is genuinely imperative —
    * a UDF is the per-row cost floor here (no builtin expresses ranked
    * merges); the encoder state initializes once per task, not per row.
    */
  def withTokens(df: DataFrame, textCol: String, vocab: Vocab): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(vocab)
    df.withColumn("tokens", udf(new EncodeFn(bc)).apply(col(textCol)))
      .withColumn("n_tokens_bpe", size(col("tokens")))
  }

  /** Decode a token-id array column back to text (lossless). */
  def decodeCol(df: DataFrame, tokensCol: String, outCol: String, vocab: Vocab): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(vocab)
    df.withColumn(outCol, udf(new DecodeFn(bc)).apply(col(tokensCol)))
  }

  /** Fixed-window chunking in REAL token space (the BPE counterpart of
    * [[Chunker.chunk]], same `[i*stride, i*stride + chunkSize)` window
    * math): tokenize, slice the id array, decode each chunk back to
    * text. One row-local pass — tokenize + chunk + decode never leave
    * the partition, so 100 TB chunks with zero shuffle, like Chunker.
    * Byte-level BPE makes reassembly exact IN TOKEN SPACE: concatenate
    * the `tokens` arrays (overlap dropped) and decode ONCE to restore
    * the document byte for byte. Do NOT concatenate `chunk_text`
    * strings — a multibyte UTF-8 character straddling a chunk boundary
    * decodes to U+FFFD in both adjacent chunk_texts (each is decoded
    * independently), so the string concatenation is lossy there.
    */
  def chunk(
      df: DataFrame,
      textCol: String,
      idCol: String,
      vocab: Vocab,
      chunkSize: Int,
      overlap: Int
  ): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val enc = new Encoder(bc.value)
        val voc = bc.value
        it.flatMap { case (id, text) =>
          val ids = enc.encode(if (text == null) "" else text)
          val n = ids.length
          val nChunks = if (n <= chunkSize) 1 else (n - chunkSize + stride - 1) / stride + 1
          (0 until nChunks).iterator.map { ci =>
            val start = ci * stride
            val slice = ids.slice(start, math.min(start + chunkSize, n))
            (id, ci.toLong, start.toLong, slice.length.toLong, voc.decode(slice.toSeq), slice)
          }
        }
      }
      .toDF(idCol, "chunk_id", "start_tok", "n_tokens", "chunk_text", "tokens")
  }
}
