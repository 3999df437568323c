package graft.text

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("expectedCounts: hand-computed forward-backward on the two-segmentation word") {
    // word "ab" (count 10), vocab {a, b, ab} at probability 1/3 each.
    // Segmentations: [ab] with p=1/3, [a][b] with p=1/9 → posterior
    // 3/4 vs 1/4, so E[ab] = 7.5 and E[a] = E[b] = 2.5 exactly.
    val words = Seq(("ab", 10L)).toDF("word", "cnt")
    val third = math.log(1.0 / 3.0)
    val got = UnigramLm
      .expectedCounts(words, Map("a" -> third, "b" -> third, "ab" -> third), maxLen = 2)
      .toMap
    assert(math.abs(got("ab") - 7.5) < 1e-9, got.toString)
    assert(math.abs(got("a") - 2.5) < 1e-9)
    assert(math.abs(got("b") - 2.5) < 1e-9)
  }

  test("segmentWord: Viterbi equals brute-force max; documented tie-break; unknown-char fallback") {
    val vocab = Map(
      "a" -> -1.2, "b" -> -1.5, "c" -> -2.0,
      "ab" -> -1.8, "bc" -> -2.1, "abc" -> -3.9)
    def brute(w: String): Double = {
      def go(i: Int): Double =
        if (i == w.length) 0.0
        else (1 to math.min(3, w.length - i)).flatMap { l =>
          vocab.get(w.substring(i, i + l)).map(_ + go(i + l))
        }.foldLeft(Double.NegativeInfinity)(math.max)
      go(0)
    }
    for (w <- Seq("abc", "abcabc", "aabbcc", "cab", "abab")) {
      val seg = UnigramLm.segmentWord(w, vocab, 3)
      assert(seg.mkString == w, s"$w: lossy $seg")
      val score = seg.map(vocab).sum
      assert(math.abs(score - brute(w)) < 1e-12, s"$w: viterbi $score vs brute ${brute(w)}")
    }
    // exact tie [a,a,a]=[aa,a]=[a,aa]: longer LAST piece wins
    val tied = UnigramLm.segmentWord("aaa", Map("a" -> -1.0, "aa" -> -2.0), 2)
    assert(tied == List("a", "aa"), tied.toString)
    // characters outside the vocab become their own pieces (lossless)
    val unk = UnigramLm.segmentWord("axb", Map("a" -> -1.0, "b" -> -1.0), 2)
    assert(unk == List("a", "x", "b"))
  }

  test("train end-to-end: morphemes surface as pieces, compression, lossless corpus round trip") {
    // corpus built from repeated morphemes — the unigram model should
    // keep multi-char pieces covering them
    val morphs = Seq("data", "base", "load", "er", "ing")
    val docs = (0 until 120).map { i =>
      val ws = (0 until 12).map { j =>
        morphs((i + j) % 5) + morphs((i * 3 + j * 7) % 5)
      }
      (i.toLong, ws.mkString(" "))
    }.toDF("doc_id", "text")
    val v = UnigramLm.train(docs, "text", targetVocab = 60, maxPieceLen = 6, seedSize = 300)
    assert(v.size <= 60)
    val multi = v.pieces.keys.filter(_.length > 1)
    assert(multi.nonEmpty, "no multi-char pieces survived")
    // at least one bare morpheme (or its space-prefixed pre-token form)
    assert(morphs.exists(m => v.pieces.contains(m) || v.pieces.contains(" " + m)),
      s"no morpheme piece in ${multi.toSeq.sorted}")

    val out = UnigramLm.withPieces(docs, "text", "doc_id", v)
    val rows = out.select("doc_id", "n_pieces", "roundtrip_ok")
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length == 120 && rows.forall(_._3), "round trip broke")
    val totalPieces = rows.map(_._2).sum
    val totalChars = docs.as[(Long, String)].collect().map(_._2.length.toLong).sum
    assert(totalPieces < totalChars / 2, s"no compression: $totalPieces pieces vs $totalChars chars")

    // save/load: identical vocabulary
    val dir = java.nio.file.Files.createTempDirectory("uvocab").toString
    UnigramLm.saveVocab(spark, v, dir)
    val loaded = UnigramLm.loadVocab(spark, dir)
    assert(loaded.pieces.keySet == v.pieces.keySet)
    loaded.pieces.foreach { case (p, lp) => assert(math.abs(lp - v.pieces(p)) < 1e-12) }
  }

  test("train determinism and multibyte round trip") {
    val docs = Seq(
      (0L, "héllo wörld héllo"),
      (1L, "日本語 テスト 日本語"),
      (2L, "emoji 🌍 and emoji 🌍 again"),
      (3L, "héllo wörld again")).toDF("doc_id", "text")
    val v1 = UnigramLm.train(docs, "text", targetVocab = 80, maxPieceLen = 4, seedSize = 150)
    val v2 = UnigramLm.train(docs, "text", targetVocab = 80, maxPieceLen = 4, seedSize = 150)
    assert(v1.pieces.keySet == v2.pieces.keySet)
    v1.pieces.foreach { case (p, lp) => assert(math.abs(lp - v2.pieces(p)) < 1e-9, p) }
    val ok = UnigramLm.withPieces(docs, "text", "doc_id", v1)
      .agg(org.apache.spark.sql.functions.min(col("roundtrip_ok"))).head().getBoolean(0)
    assert(ok, "multibyte round trip broke")
  }
}
