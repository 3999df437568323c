package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  // ---- training: hand-computed merges ------------------------------

  // corpus "ab ab ab ac" pre-tokenizes (GPT-2 pattern) to
  //   "ab"×1, " ab"×2, " ac"×1      (bytes: ' '=32 a=97 b=98 c=99)
  // round 1 pair counts: (32,97)=3, (97,98)=3, (97,99)=1
  //   → TIE at 3; break by (first id asc): (32,97) wins → id 256 = " a"
  // round 2: "ab"=[97,98]×1, " ab"=[256,98]×2, " ac"=[256,99]×1
  //   counts: (97,98)=1, (256,98)=2, (256,99)=1 → (256,98) → id 257 = " ab"
  // round 3: best remaining count is 1 → stop (singleton pairs don't
  //   compress); merges = [(32,97), (256,98)] even though 3 were asked
  test("Bpe.train: hand-computed merge table, tie-break, early stop") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab ab ac")).toDF("doc_id", "text")
    val vocab = Bpe.trainOn(docs, "text", numMerges = 3)
    assert(vocab.merges == IndexedSeq((32, 97), (256, 98)))
    assert(new String(vocab.tokenBytes(256), "UTF-8") == " a")
    assert(new String(vocab.tokenBytes(257), "UTF-8") == " ab")

    // encode "ab ab ac" → "ab" has no ranked pair → [97,98];
    // " ab" → [256,98] → [257]; " ac" → [256,99]
    val enc = new Bpe.Encoder(vocab)
    assert(enc.encode("ab ab ac").toSeq == Seq(97, 98, 257, 256, 99))
  }

  test("Bpe.train is deterministic: same corpus → identical merge table") {
    val docs = graft.util.Tables.documents(spark, sf).limit(80)
    val v1 = Bpe.trainOn(docs, "text", numMerges = 50)
    val v2 = Bpe.trainOn(docs, "text", numMerges = 50)
    assert(v1.merges == v2.merges)
    assert(v1.merges.length == 50) // real corpus: no early stop at 50

    // persisted vocab round-trips exactly (train once, tokenize anywhere)
    val dir = java.nio.file.Files.createTempDirectory("bpe_vocab").toString
    Bpe.saveVocab(spark, v1, dir)
    assert(Bpe.loadVocab(spark, dir).merges == v1.merges)
  }

  // ---- encoding: adversarial strings --------------------------------

  test("Bpe.encode merges ALL occurrences of the best pair left-to-right") {
    val vocab = Bpe.Vocab(IndexedSeq((97, 97))) // 256 = "aa"
    val enc = new Bpe.Encoder(vocab)
    assert(enc.encode("aaaa").toSeq == Seq(256, 256))
    assert(enc.encode("aaa").toSeq == Seq(256, 97)) // no overlap reuse
    // ranked pair of merged tokens: 257 = "aaaa"
    val vocab2 = Bpe.Vocab(IndexedSeq((97, 97), (256, 256)))
    assert(new Bpe.Encoder(vocab2).encode("aaaaa").toSeq == Seq(257, 97))
  }

  test("byte-level round trip is lossless: multibyte UTF-8, emoji, empty, whitespace") {
    val vocabs = Seq(
      Bpe.Vocab(IndexedSeq.empty),
      Bpe.trainOn(graft.util.Tables.documents(spark, sf).limit(50), "text", 30))
    val cases = Seq(
      "héllo wörld", "你好 世界", "mixed ascii né 你 123", "aé你🎉end",
      "", "   ", "\t\n  x", "word", "trailing space ", " leading")
    for (v <- vocabs; s <- cases) {
      val enc = new Bpe.Encoder(v)
      val ids = enc.encode(s)
      assert(v.decode(ids.toSeq) == s, s"round trip failed for '$s'")
    }
    // empty vocab: token count == UTF-8 byte count; empty doc → 0 tokens
    val raw = new Bpe.Encoder(Bpe.Vocab(IndexedSeq.empty))
    assert(raw.encode("né 你").length == "né 你".getBytes("UTF-8").length)
    assert(raw.encode("").length == 0)
  }

  // ---- Spark surface -------------------------------------------------

  test("Bpe.tokenize/withTokens: partition-invariant, matches local encode") {
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sf).limit(60).cache()
    val vocab = Bpe.trainOn(docs, "text", numMerges = 40)
    val local = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    val enc = new Bpe.Encoder(vocab)

    for (parts <- Seq(1, 3)) {
      val got = Bpe.tokenize(docs.repartition(parts), "text", "doc_id", vocab)
        .select("doc_id", "tokens").as[(Long, Seq[Int])].collect().toMap
      assert(got.keySet == local.keySet)
      got.foreach { case (id, ids) => assert(ids == enc.encode(local(id)).toSeq, s"doc $id") }
    }
    // column-append form keeps the schema and agrees
    val w = Bpe.withTokens(docs, "text", vocab)
    assert(w.columns.toSeq.take(docs.columns.length) == docs.columns.toSeq)
    val wt = w.select("doc_id", "tokens").as[(Long, Seq[Int])].collect().toMap
    wt.foreach { case (id, ids) => assert(ids == enc.encode(local(id)).toSeq) }
    docs.unpersist()
  }

  test("Bpe.chunk: exact token-space boundaries; chunks reassemble the document") {
    import spark.implicits._
    val docs = graft.util.Tables.documents(spark, sf).limit(25)
    val vocab = Bpe.trainOn(docs, "text", numMerges = 40)
    val enc = new Bpe.Encoder(vocab)
    val chunks = Bpe.chunk(docs, "text", "doc_id", vocab, chunkSize = 7, overlap = 2)
      .select("doc_id", "chunk_id", "start_tok", "n_tokens", "chunk_text", "tokens")
      .as[(Long, Long, Long, Long, String, Seq[Int])]
      .collect()
      .groupBy(_._1)
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap

    texts.foreach { case (id, text) =>
      val ids = enc.encode(text)
      val cs = chunks(id).sortBy(_._2)
      // boundary math: chunk i starts at i*stride, stride = 5
      cs.foreach { case (_, ci, start, n, ctext, ctoks) =>
        assert(start == ci * 5)
        assert(n == math.min(start + 7, ids.length) - start || (ids.isEmpty && n == 0))
        assert(ctoks == ids.slice(start.toInt, start.toInt + 7).toSeq)
        assert(ctext == vocab.decode(ctoks))
      }
      // reassembly: first chunk whole + each later chunk minus overlap
      val rebuilt = cs.head._6 ++ cs.tail.flatMap(_._6.drop(2))
      assert(vocab.decode(rebuilt.toSeq) == text, s"doc $id reassembly")
      // short doc → exactly one chunk
      if (ids.length <= 7) assert(cs.length == 1)
    }
  }

  test("Bpe token counts feed Packing budgets: bins conserve total token mass") {
    val docs = graft.util.Tables.documents(spark, sf).limit(40)
    val vocab = Bpe.trainOn(docs, "text", numMerges = 40)
    val toks = Bpe.tokenize(docs, "text", "doc_id", vocab)
    val packed = graft.ops.Packing.packBins(toks, "doc_id", "n_tokens_bpe", budget = 500L)
    val total = toks.agg(sum("n_tokens_bpe")).head().getLong(0)
    val packedTotal = packed.agg(sum("n_tokens")).head().getLong(0)
    assert(total == packedTotal && total > 0)
    // bin ids are the dense prefix 0..maxBin (no gaps: bins fill in order)
    val bins = packed.select("bin").distinct().collect().map(_.getLong(0)).sorted
    assert(bins.toSeq == (0L to bins.max).toSeq)
  }
}
