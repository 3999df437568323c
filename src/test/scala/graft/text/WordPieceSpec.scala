package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def vocabOf(ps: String*): WordPiece.Vocab =
    WordPiece.Vocab((WordPiece.Unk +: ps).toIndexedSeq)

  test("greedy longest-match-first: BERT reference example") {
    val v = vocabOf("un", "##able", "##a", "##b", "##l", "##e", "u", "##n", "able")
    def enc(w: String) = WordPiece.encodeWord(w, v).map(v.piece).toSeq
    assert(enc("unable") === Seq("un", "##able"))
    assert(enc("able") === Seq("able"))
    assert(enc("un") === Seq("un"))
  }

  test("position with no matching piece collapses the WHOLE word to [UNK]") {
    val v = vocabOf("ab", "##c")
    assert(WordPiece.encodeWord("abc", v).toSeq === Seq(v.index.get("ab").toInt, v.index.get("##c").toInt))
    assert(WordPiece.encodeWord("abz", v).toSeq === Seq(0)) // ##z missing
    assert(WordPiece.encodeWord("zab", v).toSeq === Seq(0)) // z missing at start
    assert(WordPiece.encodeWord("a" * 200, v).toSeq === Seq(0)) // over maxInputChars
  }

  test("training merges the highest-LIKELIHOOD pair, not the most frequent (the BPE difference)") {
    // pair (a,##a): count 100, syms a:100, ##a:100 -> score 100/1e4 = 0.01
    // pair (b,##c): count 20,  syms b:20,  ##c:20  -> score 20/400  = 0.05
    val words = Seq(("aa", 100L), ("bc", 20L))
    val v = WordPiece.train(words, numMerges = 1)
    assert(v.pieces.last === "bc")
    // BPE on the same dictionary merges the raw-count winner instead
    val bpe = Bpe.train(words, numMerges = 1)
    assert(bpe.merges.head === (('a'.toInt, 'a'.toInt)))
  }

  test("merged continuation pieces keep the ## prefix and chain correctly") {
    val v = WordPiece.train(Seq(("abcd", 50L)), numMerges = 3)
    // all merges inside one word; encoding that word must use them
    val enc = WordPiece.encodeWord("abcd", v).map(v.piece)
    assert(WordPiece.decodeWord(WordPiece.encodeWord("abcd", v), v) === "abcd")
    assert(enc.length < 4, s"merges unused: ${enc.toSeq}")
    assert(enc.drop(1).forall(_.startsWith("##")))
  }

  test("training is deterministic under dictionary permutation") {
    val words = Seq(("the", 50L), ("then", 20L), ("than", 15L), ("net", 12L), ("ten", 9L))
    val a = WordPiece.train(words, 10).pieces
    val b = WordPiece.train(words.reverse, 10).pieces
    assert(a === b)
  }

  test("corpus roundtrip: trained-on text encodes UNK-free and decodes exactly") {
    val docs = graft.util.Tables.documents(spark, sf).limit(50)
    val v = WordPiece.trainOn(docs, "text", numMerges = 32)
    val toks = WordPiece.tokenize(docs, "text", "doc_id", v)
    assert(toks.agg(sum("n_unk")).head().getLong(0) === 0L)
    // decode pieces word-joined == whitespace-normalized text
    val bad = toks
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .as[(Long, Seq[Int], Long, Long, String)]
      .map { case (_, pieces, _, _, text) =>
        val dec = pieces.map(id => v.piece(id))
          .foldLeft(Vector.empty[String]) { (acc, p) =>
            if (p.startsWith("##") && acc.nonEmpty) acc.init :+ (acc.last + p.substring(2))
            else acc :+ p
          }
          .mkString(" ")
        val norm = text.split("\\s+").filter(_.nonEmpty).mkString(" ")
        if (dec == norm) 0 else 1
      }
      .reduce(_ + _)
    assert(bad === 0)
  }

  test("vocab persists via the catalog: fresh-load parity, wrong kind rejected") {
    val docs = graft.util.Tables.documents(spark, sf).limit(30)
    val v = WordPiece.trainOn(docs, "text", numMerges = 16)
    val dir = java.nio.file.Files.createTempDirectory("wp_vocab").toString
    WordPiece.saveVocab(spark, v, dir)
    val loaded = WordPiece.loadVocab(spark, dir)
    assert(loaded.pieces === v.pieces)
    val text = "some words to encode here"
    assert(
      text.split(" ").flatMap(WordPiece.encodeWord(_, loaded)).toSeq ===
        text.split(" ").flatMap(WordPiece.encodeWord(_, v)).toSeq)
    val e = intercept[Exception] {
      graft.sources.IndexCatalog.open(spark, dir, "bpe_vocab")
    }
    assert(e.getMessage.contains("kind"))
  }
}
