package graft.text

import org.apache.spark.sql.functions.{col, count, count_distinct, explode, lit, size, split, sum}

import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("TextStats token counts and bpe estimate") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("id", "text")
    val r = TextStats.withTokenStats(df, "text").head()
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Int]("n_uniq_tokens") == 5)
    assert(r.getAs[Int]("n_chars_obs") == 22)
    assert(r.getAs[Long]("est_bpe_tokens") == 6) // ceil(22/4)
    assert(math.abs(r.getAs[Double]("avg_token_len") - 17.0 / 6).toFloat < 1e-3)
  }

  test("TextStats quality rewards diversity, penalizes stopword soup") {
    val df = Seq(
      (1L, "the the the the the the the the"),
      (2L, "diverse vocabulary spanning many unique interesting informative tokens")
    ).toDF("id", "text")
    val q = TextStats.withQuality(df, "text").select("id", "quality").as[(Long, Double)].collect().toMap
    assert(q(2L) > q(1L))
  }

  test("Redact masks planted emails, IPs and phones; clean text unchanged; idempotent") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@sub.example.co.uk or call +4915123456789 now"),
      (2L, "server at 192.168.0.1 and backup at 10.0.255.7 serve traffic"),
      (3L, "dial 415-555-0123 for support"),
      (4L, "a perfectly clean sentence with numbers like 42 and 3.5 inside"),
      (5L, "mixed: a@b.io at 8.8.8.8 call +12345678"),
      (6L, "write bob@10.0.0.1.example.com today") // IP-shaped substring INSIDE an email
    ).toDF("id", "text")
    val r = Redact.withRedaction(df, "text")
      .select("id", "n_emails", "n_ips", "n_phones", "text_redacted")
      .as[(Long, Int, Int, Int, String)].collect().map(t => t._1 -> t).toMap
    assert(r(1L)._5 == "reach me at [EMAIL] or call [PHONE] now")
    assert((r(1L)._2, r(1L)._3, r(1L)._4) == (1, 0, 1))
    assert(r(2L)._5 == "server at [IP] and backup at [IP] serve traffic")
    assert(r(2L)._3 == 2)
    assert(r(3L)._5 == "dial [PHONE] for support")
    // plain integers and decimals are NOT phones/IPs
    assert(r(4L)._5 == "a perfectly clean sentence with numbers like 42 and 3.5 inside")
    assert((r(4L)._2, r(4L)._3, r(4L)._4) == (0, 0, 0))
    assert(r(5L)._5 == "mixed: [EMAIL] at [IP] call [PHONE]")
    // audit counts agree with the tags actually emitted: the dotted run
    // inside the email is redacted as part of the email, not as an IP
    assert(r(6L)._5 == "write [EMAIL] today")
    assert((r(6L)._2, r(6L)._3, r(6L)._4) == (1, 0, 0))
    // idempotent: redacting redacted text changes nothing
    val again = Redact
      .withRedaction(
        Redact.withRedaction(df, "text").select($"id", $"text_redacted".as("text")), "text")
      .select("id", "text_redacted").as[(Long, String)].collect().toMap
    assert(again == r.view.mapValues(_._5).toMap)
  }

  test("Vocab.strataProfile: HLL sketch within rsd contract, partitioning-independent") {
    val docs = (1 to 300).map { i =>
      val lang = if (i % 3 == 0) "es" else "en"
      (i.toLong, lang, (1 to 30).map(j => s"tok${(i * 31 + j * 7) % 997}").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val prof = Vocab.strataProfile(docs, "text", "doc_id", "lang", rsd = 0.02)
      .collect().map(r => r.getString(0) -> r).toMap
    // exact reference per stratum
    val exact = docs.select($"lang", explode(split($"text", " ")).as("token"))
      .groupBy("lang").agg(count_distinct(col("token")).as("v"))
      .as[(String, Long)].collect().toMap
    for ((lang, row) <- prof) {
      val approx = row.getLong(3).toDouble
      val ex = exact(lang).toDouble
      assert(math.abs(approx - ex) / ex < 0.10, s"$lang: approx $approx vs exact $ex")
      assert(row.getLong(1) == (if (lang == "es") 100L else 200L) * 30) // n_tokens
      assert(row.getLong(2) == (if (lang == "es") 100L else 200L)) // n_docs
    }
    // HLL registers max-merge: identical results on any partitioning
    val prof7 = Vocab.strataProfile(docs.repartition(7), "text", "doc_id", "lang", rsd = 0.02)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(prof7 == prof.view.mapValues(_.getLong(3)).toMap)
  }

  test("Vocab.strataQuantiles: GK sketch honors the rank-error contract per stratum") {
    // per-stratum doc lengths with DIFFERENT distributions: en linear
    // 10..209, es quadratic-ish — exercises tails, not just medians
    val docs = (1 to 300).map { i =>
      val lang = if (i % 3 == 0) "es" else "en"
      val len = if (lang == "en") 10 + (i % 200) else 5 + (i * i) % 97
      (i.toLong, lang, (1 to len).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val probs = Seq(0.5, 0.9, 0.99)
    val got = Vocab.strataQuantiles(docs, "text", "lang", probs, accuracy = 1000)
      .collect().map(r => r.getString(0) -> (r.getLong(1), probs.indices.map(i => r.getInt(2 + i)))).toMap
    val lens = docs.select($"lang", size(split($"text", " ")).as("n"))
      .as[(String, Int)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((lang, (nDocs, qs)) <- got; (p, v) <- probs.zip(qs)) {
      val sorted = lens(lang)
      assert(nDocs == sorted.length.toLong)
      // GK contract: the returned value's RANK is within n/accuracy of
      // the target rank (+1 for discreteness)
      val rank = sorted.count(_ <= v)
      val target = p * sorted.length
      val tol = sorted.length.toDouble / 1000 + 1
      assert(math.abs(rank - target) <= tol, s"$lang p$p: value $v rank $rank target $target")
    }
  }

  test("LangId detects language from marker stopwords") {
    val df = Seq(
      (1L, "the cat is a friend of the dog"),
      (2L, "el perro de la casa es que y grande"),
      (3L, "der hund und die katze das ist gut"),
      (4L, "le chat et les amis une belle est"),
      (5L, "的 是 在 了 我 something"),
      (6L, "zzz qqq www")
    ).toDF("id", "text")
    val got = LangId.withLangId(df, "text").select("id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "zh", 6L -> "und"))
  }

  test("LangId.confusion: mislabels land off-diagonal, shares sum to 1 per label") {
    val df = Seq(
      (1L, "the cat is a friend of the dog", "en"),
      (2L, "the other one is of the same", "en"),
      (3L, "el perro de la casa es que y grande", "en"), // mislabeled: es text tagged en
      (4L, "der hund und die katze das ist gut", "de")
    ).toDF("id", "text", "lang")
    val got = LangId.confusion(df, "text", "lang")
      .select("label", "pred_lang", "n", "label_total", "share")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got(("en", "en")) === ((2L, 3L, 0.6667)))
    assert(got(("en", "es")) === ((1L, 3L, 0.3333))) // the mislabel surfaces
    assert(got(("de", "de")) === ((1L, 1L, 1.0)))
    // shares per label sum to ~1
    got.groupBy(_._1._1).foreach { case (lbl, cells) =>
      assert(math.abs(cells.values.map(_._3).sum - 1.0) < 1e-3, s"label $lbl")
    }
  }

  test("tokenizer bake-off invariants: whitespace fertility is exactly 1, BPE merges reduce tokens, all families positive") {
    val docs = graft.util.Tables.documents(spark, sf).limit(60)
    val words = docs
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split($"text", " ")))).head().getLong(0)
    // byte-level BPE: zero merges -> one token per BYTE; merges strictly reduce
    val v0 = Bpe.Vocab(IndexedSeq.empty)
    val n0 = Bpe.tokenize(docs, "text", "doc_id", v0)
      .agg(org.apache.spark.sql.functions.sum("n_tokens_bpe")).head().getLong(0)
    val v32 = Bpe.trainOn(docs, "text", 32)
    val n32 = Bpe.tokenize(docs, "text", "doc_id", v32)
      .agg(org.apache.spark.sql.functions.sum("n_tokens_bpe")).head().getLong(0)
    assert(n32 < n0, s"merges did not reduce tokens: $n32 vs $n0")
    assert(n32 > words, "subword tokens cannot be fewer than words on this corpus")
    val wp = WordPiece.tokenize(docs, "text", "doc_id", WordPiece.trainOn(docs, "text", 32))
      .agg(org.apache.spark.sql.functions.sum("n_pieces")).head().getLong(0)
    assert(wp > 0L && wp >= words)
  }

  test("Vocab counts term and document frequency; idf follows the smoothed formula") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the the dog"),
      (3L, "a cat ran")
    ).toDF("doc_id", "text")
    val v = Vocab.vocab(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(v("the") == (3L, 2L)) // 3 occurrences across 2 docs
    assert(v("cat") == (2L, 2L))
    assert(v("dog") == (1L, 1L))
    val idf = Vocab.withIdf(Vocab.vocab(docs, "text", "doc_id"), nDocs = 3)
      .where(col("token") === "dog").select("idf").head().getDouble(0)
    assert(math.abs(idf - (math.log(4.0 / 2.0) + 1.0)) < 1e-12)
  }

  test("TfIdf vectors follow the smoothed-idf convention; unit vectors have norm 1") {
    val docs = Seq(
      (1L, "cat sat cat"),
      (2L, "dog sat"),
      (3L, "bird flew")
    ).toDF("doc_id", "text")
    val vec = TfIdf.vectors(docs, "text", "doc_id", nDocs = Some(3))
    val w = vec.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3)).toMap
    // tf("cat" in 1)=2, df=1 -> 2*(ln(4/2)+1)
    assert(math.abs(w((1L, "cat")) - 2.0 * (math.log(2.0) + 1.0)) < 1e-12)
    // tf("sat" in 2)=1, df=2 -> ln(4/3)+1
    assert(math.abs(w((2L, "sat")) - (math.log(4.0 / 3.0) + 1.0)) < 1e-12)
    val norms = TfIdf.unitVectors(vec, "doc_id")
      .groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
      .as[(Long, Double)].collect().toMap
    norms.values.foreach(n2 => assert(math.abs(n2 - 1.0) < 1e-12))
  }

  test("TfIdf topTerms ranks by weight with token tie-break; similarityJoin finds the near-identical pair") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha beta gamma alpha"),
      (3L, "delta epsilon zeta eta")
    ).toDF("doc_id", "text")
    val vec = TfIdf.vectors(docs, "text", "doc_id", nDocs = Some(3))
    val top1 = TfIdf.topTerms(vec, "doc_id", 1)
      .as[(Long, String, Double)].collect().map(t => t._1 -> t._2).toMap
    assert(top1(1L) == "alpha") // tf=2 dominates
    val sims = TfIdf.similarityJoin(TfIdf.unitVectors(vec, "doc_id"), "doc_id", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sims == Set((1L, 2L))) // identical docs; doc 3 shares no token
  }

  test("TfIdf maxDfFrac prunes head tokens from the vocabulary") {
    val docs = Seq(
      (1L, "the cat"),
      (2L, "the dog"),
      (3L, "the bird")
    ).toDF("doc_id", "text")
    val toks = TfIdf.vectors(docs, "text", "doc_id", nDocs = Some(3), maxDfFrac = 0.5)
      .select("token").distinct().as[String].collect().toSet
    assert(!toks.contains("the")) // df=3 > 0.5*3
    assert(toks == Set("cat", "dog", "bird"))
  }

  test("TfIdf vectors(nDocs=None) derives the count without a third shingling pass") {
    val docs = Seq(
      (1L, "cat sat cat"),
      (2L, "dog sat"),
      (3L, "bird flew")
    ).toDF("doc_id", "text")
    val auto = TfIdf.vectors(docs, "text", "doc_id", nDocs = None)
    val explicit = TfIdf.vectors(docs, "text", "doc_id", nDocs = Some(3))
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getString(1))
    val a = auto.collect().map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
    val e = explicit.collect().map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(a == e)
    // the derived count aggregates the CORPUS frame's id column, not the
    // shingled tf subtree: the plan carries at most the two structural
    // Generates (doc_freq chain + join chain — shared, so exchange reuse
    // can collapse them at runtime), never the third one the count used
    // to add. No persist, so nothing leaks into the session cache.
    // AQE prints Final + Initial sections; count the final one only
    val plan = auto.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val generates = "Generate".r.findAllIn(plan).size
    assert(generates <= 2, s"expected ≤2 Generates, got $generates:\n$plan")
    assert(!plan.contains("InMemoryTableScan"), "vectors() must not leak a persisted frame")
  }

  test("NgramLm: hand-computed stupid-backoff probabilities, backoff and OOV paths") {
    val corpus = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val model = NgramLm.train(corpus, "text", "doc_id")
    // counts: uni a=3 b=2 c=1, total=6; bi (a,b)=2 (b,a)=1 (a,c)=1
    val got = NgramLm.score(corpus, "text", "doc_id", model)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1: ln(3/6), ln(2/3), ln(1/2), ln(2/3) → avg = ln(1/3)/2, ppl = √3
    assert(got(1L)._2 == 4)
    assert(math.abs(got(1L)._3 - math.log(1.0 / 3.0) / 2) < 1e-4)
    assert(math.abs(got(1L)._4 - math.sqrt(3.0)) < 0.01)
    // doc 2: ln(1/2), ln(1/3) → avg = ln(1/6)/2, ppl = √6
    assert(math.abs(got(2L)._4 - math.sqrt(6.0)) < 0.01)

    // backoff: "b c" — bigram (b,c) unseen → α·c1(c)/total; OOV: "z b" —
    // z falls to the 0.5 pseudo-count, prev=z unseen → backoff for b
    val news = Seq((10L, "b c"), (11L, "z b")).toDF("doc_id", "text")
    val s2 = NgramLm.score(news, "text", "doc_id", model)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val expB = (math.log(2.0 / 6.0) + math.log(0.4 * 1.0 / 6.0)) / 2
    assert(math.abs(s2(10L)._3 - expB) < 1e-4)
    val expZ = (math.log(0.5 / 6.0) + math.log(0.4 * 2.0 / 6.0)) / 2
    assert(math.abs(s2(11L)._3 - expZ) < 1e-4)

    // the filter: in-distribution text scores lower perplexity than the
    // same tokens shuffled out of distribution
    val docs = graft.util.Tables.documents(spark, sf).limit(200).cache()
    val m2 = NgramLm.train(docs, "text", "doc_id")
    val probe = docs.select("doc_id", "text").as[(Long, String)].first()
    val shuffled = probe._2.split(" ").reverse.mkString(" ")
    val pair = Seq((1L, probe._2), (2L, shuffled)).toDF("doc_id", "text")
    val ppls = NgramLm.score(pair, "text", "doc_id", m2)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(ppls(1L) < ppls(2L), s"in-distribution ${ppls(1L)} !< shuffled ${ppls(2L)}")
    val kept = NgramLm.perplexityFilter(pair, "text", "doc_id", m2, maxPpl = ppls(1L) + 0.01)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    docs.unpersist()
    model.release(); m2.release()
  }

  test("NgramLm.Model.release unpersists the unigram cache; scoring parity unchanged") {
    val corpus = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val model = NgramLm.train(corpus, "text", "doc_id")
    val before = NgramLm.score(corpus, "text", "doc_id", model)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(model.uni.storageLevel.useMemory, "train() persists the unigram frame")
    model.release()
    assert(model.uni.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "release() must drop the cache entry")
    // the model still scores (plan recomputes instead of reading cache)
    val after = NgramLm.score(corpus, "text", "doc_id", model)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(after == before)
  }

  test("Dsir: log-weights favor target-like docs; Gumbel top-k deterministic, partition-invariant") {
    // two vocabularies: target domain speaks A-words, background mixes
    val aDoc = (i: Int) => (0 until 30).map(j => s"alpha${(i + j) % 6}").mkString(" ")
    val bDoc = (i: Int) => (0 until 30).map(j => s"beta${(i * 3 + j) % 6}").mkString(" ")
    val corpus = ((0 until 40).map(i => (i.toLong, aDoc(i))) ++
      (40 until 80).map(i => (i.toLong, bDoc(i)))).toDF("doc_id", "text")
    val targetFrame = (100 until 120).map(i => (i.toLong, aDoc(i))).toDF("doc_id", "text")
    val target = NgramLm.train(targetFrame, "text", "doc_id")
    val background = NgramLm.train(corpus, "text", "doc_id")

    val lw = Dsir.logWeights(corpus, "text", "doc_id", target, background)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // every A-doc outweighs every B-doc (B tokens are OOV for the target LM)
    val aMin = (0 until 40).map(i => lw(i.toLong)).min
    val bMax = (40 until 80).map(i => lw(i.toLong)).max
    assert(aMin > bMax, s"target-like min $aMin !> background-only max $bMax")

    // resampling: k of 30 picks A-docs overwhelmingly, ranked by key desc
    val sel = Dsir.resample(corpus, "text", "doc_id", target, background, k = 30)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(sel.length == 30)
    assert(sel.map(_._2).distinct.length == 30, "without replacement: ids distinct")
    assert(sel.map(_._1).toSeq == (1L to 30L), "ranks contiguous")
    assert(sel.sliding(2).forall(p => p(0)._5 >= p(1)._5), "keys descend with rank")
    val aPicked = sel.count(_._2 < 40)
    assert(aPicked >= 28, s"expected nearly all picks from the target-like half, got $aPicked/30")

    // determinism: same result from a different partitioning
    val sel2 = Dsir.resample(corpus.repartition(7), "text", "doc_id", target, background, k = 30)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(sel.map(r => (r._1, r._2)).toSeq == sel2.map(r => (r._1, r._2)).toSeq)

    // fraction path: threshold semantics exact (kept min >= dropped max),
    // realized fraction within the sketch's rank error
    val frac = Dsir.selectFraction(corpus, "text", "doc_id", target, background, fraction = 0.4)
      .as[(Long, Long, Double, Double)].collect()
    assert(math.abs(frac.length - 32) <= 2, s"~40% of 80 expected, got ${frac.length}")
    val keptIds = frac.map(_._1).toSet
    val allKeys = Dsir.resample(corpus, "text", "doc_id", target, background, k = 80)
      .as[(Long, Long, Long, Double, Double)].collect().map(r => r._2 -> r._5).toMap
    val keptMin = frac.map(r => allKeys(r._1)).min
    val dropMax = allKeys.filterNot(kv => keptIds(kv._1)).values.max
    assert(keptMin >= dropMax, s"threshold violated: kept min $keptMin < dropped max $dropMax")
    // and the fraction cut equals the top-|kept| of the ranked path
    val topIds = Dsir.resample(corpus, "text", "doc_id", target, background, k = frac.length)
      .as[(Long, Long, Long, Double, Double)].collect().map(_._2).toSet
    assert(keptIds == topIds)
    target.release(); background.release()
  }

  test("NgramLm save/load model: fresh-session scoring parity, alpha preserved") {
    val corpus = graft.util.Tables.documents(spark, sf).limit(150).localCheckpoint()
    val model = NgramLm.train(corpus, "text", "doc_id", alpha = 0.3)
    val dir = java.nio.file.Files.createTempDirectory("ngram_lm").toString
    NgramLm.saveModel(spark, model, dir)
    val loaded = NgramLm.loadModel(spark, dir)
    assert(loaded.alpha == 0.3)
    val before = NgramLm.score(corpus, "text", "doc_id", model)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val after = NgramLm.score(corpus, "text", "doc_id", loaded)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(before == after)
    // wrong-kind load fails with a message
    val err = intercept[IllegalArgumentException] {
      graft.sources.IndexCatalog.open(spark, dir, "bpe_vocab")
    }
    assert(err.getMessage.contains("ngram_lm"), err.getMessage)
    model.release(); loaded.release()
  }

  test("Repetition stats match hand computation, including the single-token edge") {
    val docs = Seq(
      (1L, "a a a b"), // top tok a:3/4, unique 2/4, top bigram "a a":2/3
      (2L, "x")        // no bigrams
    ).toDF("doc_id", "text")
    val r = Repetition.stats(docs, "text", "doc_id")
      .as[(Long, Long, Double, Double, Double)].collect().map(t => t._1 -> t).toMap
    assert(r(1L)._2 == 4L)
    assert(math.abs(r(1L)._3 - 3.0 / 4.0) < 1e-12)
    assert(math.abs(r(1L)._4 - 2.0 / 4.0) < 1e-12)
    assert(math.abs(r(1L)._5 - 2.0 / 3.0) < 1e-12)
    assert(r(2L) == ((2L, 1L, 1.0, 1.0, 0.0)))
  }

  test("Fingerprint: equal text iff equal fingerprint on distinct corpus") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma delta"),
      (4L, "gamma beta alpha")
    ).toDF("id", "text")
    val fp = Fingerprint.withFingerprint(df, "text").select("id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
    assert(fp(1L) != fp(4L)) // order matters in a rolling hash
  }

  test("Chunker: exact boundaries, overlap, and short-doc single chunk") {
    val doc = (0 until 25).map(i => s"w$i").mkString(" ") // 25 tokens
    val df = Seq((1L, doc), (2L, "a b c")).toDF("doc_id", "text")
    val got = Chunker
      .chunk(df, "text", "doc_id", chunkSize = 10, overlap = 4)
      .select("doc_id", "chunk_id", "start_tok", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, Long, String)]
      .collect()
      .sortBy(r => (r._1, r._2))
    // stride 6: starts 0,6,12,18 -> last covers [18,25) (7 tokens)
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, 0L, 10L), (1L, 6L, 10L), (2L, 12L, 10L), (3L, 18L, 7L)))
    assert(d1(1)._5 == (6 until 16).map(i => s"w$i").mkString(" "))
    assert(got.filter(_._1 == 2L).map(r => (r._2, r._3, r._4, r._5)).toSeq ==
      Seq((0L, 0L, 3L, "a b c")))
  }

  test("Chunker: chunks reassemble the document exactly (drop the overlap)") {
    val docs = Seq(
      (1L, (0 until 57).map(i => s"t$i").mkString(" ")),
      (2L, (0 until 20).map(i => s"u$i").mkString(" ")), // exactly chunkSize
      (3L, "solo")
    ).toDF("doc_id", "text")
    val chunks = Chunker
      .chunk(docs, "text", "doc_id", chunkSize = 20, overlap = 5)
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)]
      .collect()
      .groupBy(_._1)
    val original = docs.as[(Long, String)].collect().toMap
    for ((id, cs) <- chunks) {
      val ordered = cs.sortBy(_._2).map(_._3)
      // first chunk whole, later chunks minus their 5-token overlap head
      val rebuilt = (ordered.head +: ordered.tail.map(_.split(" ").drop(5).mkString(" ")))
        .filter(_.nonEmpty).mkString(" ")
      assert(rebuilt == original(id), s"doc $id reassembly")
    }
  }

  test("Bm25.topK matches hand-computed Okapi scores; ranks, ties, missing terms") {
    val docs = Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "cherry cherry cherry durian")
    ).toDF("doc_id", "text")
    // query 0: apple + cherry + apple (a repeated slot); query 1 has a
    // term absent from the corpus in slot 1
    val qs = Seq(
      (0L, 0, "apple"), (0L, 1, "cherry"), (0L, 2, "apple"),
      (1L, 0, "banana"), (1L, 1, "zzz"), (1L, 2, "durian")
    ).toDF("qid", "qpos", "term")
    val out = Bm25.topK(docs, "text", "doc_id", qs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap

    // independent scalar reimplementation
    val dl = Map(0L -> 3.0, 1L -> 2.0, 2L -> 4.0)
    val avgdl = 3.0
    val n = 3.0
    def idf(df: Int) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def term(tf: Int, d: Long, df: Int) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl(d) / avgdl))
    // q0: apple (df 1) hits d0 tf2 in slots 0 AND 2; cherry (df 2) hits d1 tf1, d2 tf3
    val s00 = 2 * term(2, 0L, 1)
    val s01 = term(1, 1L, 2)
    val s02 = term(3, 2L, 2)
    assert(s00 > s02 && s02 > s01) // expected ordering
    assert(out((0L, 1L)) == ((0L, s00)) || math.abs(out((0L, 1L))._2 - s00) < 1e-12)
    assert(out((0L, 1L))._1 == 0L)
    assert(math.abs(out((0L, 2L))._2 - s02) < 1e-12)
    assert(out((0L, 2L))._1 == 2L)
    assert(!out.contains((0L, 3L))) // k = 2 cutoff
    // q1: banana (df 2) hits d0 tf1, d1 tf1; zzz contributes nothing;
    // durian (df 1) hits d2 tf1
    val s10 = term(1, 0L, 2)
    val s11 = term(1, 1L, 2)
    val s12 = term(1, 2L, 1)
    assert(math.abs(out((1L, 1L))._2 - Seq(s10, s11, s12).max) < 1e-12)
    // banana's equal idf but shorter d1 beats d0 (length normalization)
    assert(s11 > s10)
    assert(out((1L, 2L))._1 == (if (s12 > s11) 1L else 2L) ||
      math.abs(out((1L, 2L))._2 - Seq(s10, s11, s12).sorted.apply(1)) < 1e-12)
  }

  test("Bm25 tie-break: equal scores rank by ascending doc id") {
    val docs = Seq((10L, "t t"), (11L, "t t"), (12L, "t t")).toDF("doc_id", "text")
    val qs = Seq((0L, 0, "t")).toDF("qid", "qpos", "term")
    val ranked = Bm25.topK(docs, "text", "doc_id", qs, k = 3, qLen = 1)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranked.toSeq == Seq((1L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("Hybrid.rrf: hand-computed fusion, missing-doc zero, ties by id, k cut") {
    // system A: q1 ranks d1, d2, d3; system B: q1 ranks d3, d1
    val sysA = Seq((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L)).toDF("qid", "id", "rank")
    val sysB = Seq((1L, 3L, 1L), (1L, 1L, 2L)).toDF("qid", "id", "rank")
    val out = Hybrid.rrf(Seq(sysA, sysB), k = 10)
      .orderBy("rank")
      .select("rank", "id", "rrf_score")
      .as[(Long, Long, Double)]
      .collect()
    def r(a: Double, b: Double) = a + b
    val expect = Map(
      1L -> r(1.0 / 61, 1.0 / 62), // d1: rank 1 in A, 2 in B
      2L -> r(1.0 / 62, 0.0),      // d2: only in A
      3L -> r(1.0 / 63, 1.0 / 61)) // d3: rank 3 in A, 1 in B
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 2L), out.mkString(","))
    out.foreach { case (_, id, s) => assert(math.abs(s - expect(id)) < 1e-15, s"$id: $s") }
    // tie: two docs with symmetric ranks fuse to the SAME score — the
    // smaller id must win the rank (heap payload order)
    val tA = Seq((1L, 7L, 1L), (1L, 9L, 2L)).toDF("qid", "id", "rank")
    val tB = Seq((1L, 9L, 1L), (1L, 7L, 2L)).toDF("qid", "id", "rank")
    val tied = Hybrid.rrf(Seq(tA, tB), k = 10)
      .orderBy("rank").select("id").as[Long].collect()
    assert(tied.toSeq == Seq(7L, 9L))
    // k cuts the fused list, not the inputs
    val cut = Hybrid.rrf(Seq(sysA, sysB), k = 2).select("id").as[Long].collect()
    assert(cut.toSet == Set(1L, 3L))
  }

  test("QualityModel: trained logistic gate separates held-out planted populations") {
    def goodDoc(i: Int): String = {
      val fillers = Seq("morning", "market", "river", "garden", "signal", "window",
        "story", "number", "silver", "meadow")
      (0 until 12).map { j =>
        s"the ${fillers((i * 3 + j) % 10)} and a ${fillers((i * 7 + j * 5) % 10)} of it"
      }.mkString(" ")
    }
    def badDoc(i: Int): String =
      (0 until 20).map(_ => s"$$$$## spam${i % 3} @@!!").mkString(" ")
    val labeled = ((0 until 40).map(i => (i.toLong, goodDoc(i), 1.0)) ++
      (0 until 40).map(i => (1000L + i, badDoc(i), 0.0))).toDF("doc_id", "text", "label")
    val m = QualityModel.train(labeled, "text", "label")
    assert(m.converged)
    // held-out docs from BOTH populations, ids the trainer never saw
    val holdout = ((100 until 120).map(i => (i.toLong, goodDoc(i), true)) ++
      (100 until 120).map(i => (2000L + i, badDoc(i), false))).toDF("doc_id", "text", "is_good")
    val scored = QualityModel.score(holdout, "text", m)
      .select("doc_id", "is_good", "q_score").as[(Long, Boolean, Double)].collect()
    val good = scored.filter(_._2).map(_._3)
    val bad = scored.filterNot(_._2).map(_._3)
    assert(good.min > bad.max, s"no separation: good min ${good.min} vs bad max ${bad.max}")
    // the 0.5 gate keeps exactly the good half
    val kept = QualityModel.filter(holdout, "text", m, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == scored.filter(_._2).map(_._1).toSet)
  }

  test("RepeatMining.perDoc: suffix-automaton answers equal brute force on adversarial docs") {
    // brute force: all distinct token n-grams; repeated = count >= 2
    def brute(toks: Array[String]): (Long, String, Long) = {
      val grams = for {
        n <- 1 to toks.length
        i <- 0 to toks.length - n
      } yield (n, toks.slice(i, i + n).toSeq, i)
      val byGram = grams.groupBy(g => (g._1, g._2))
      val distinct = byGram.size.toLong
      val reps = byGram.filter(_._2.size >= 2)
      if (reps.isEmpty) (0L, "", distinct)
      else {
        val lrs = reps.keys.map(_._1).max
        val best = reps.collect { case ((n, g), occ) if n == lrs => (occ.map(_._3).min, g) }.minBy(_._1)
        (lrs.toLong, best._2.mkString(" "), distinct)
      }
    }
    val docs = Seq(
      "a b c a b d a b c",                    // overlapping repeats, lrs = "a b c"
      "x y z w",                              // no repeats at all
      "t t t t t t",                          // all-same: lrs = n-1, maximal overlap
      "p q p q p q r",                        // periodic
      "m",                                    // single token
      "u v u v x u v u v",                    // nested periodic
      (1 to 30).map(i => s"w${i % 7}").mkString(" ") // cyclic vocabulary
    )
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = RepeatMining.perDoc(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    docs.zipWithIndex.foreach { case (t, i) =>
      val expect = brute(t.split(" "))
      assert(got(i.toLong) == expect, s"doc $i '$t': got ${got(i.toLong)}, expect $expect")
    }
    // empty text degrades to zeros
    val empty = RepeatMining.perDoc(Seq((9L, "")).toDF("doc_id", "text"), "text", "doc_id").head()
    assert(empty.getLong(1) == 0L && empty.getString(2) == "" && empty.getLong(3) == 0L)
  }

  test("HeavyHittersAgg: Misra–Gries containment and underestimate bounds on a Zipf stream") {
    import graft.functions.HeavyHittersAgg.heavyHitters
    // deterministic Zipf-ish stream: token t_r appears ~600/r times
    val stream = (1 to 60).flatMap(r => Seq.fill(600 / r)(s"t_$r"))
    val n = stream.length
    val cap = 16
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // many partitions → the merge path runs, not just update
    val df = stream.grouped(50).toSeq.map(g => Tuple1(g.toArray)).toDF("toks").repartition(13)
    val sketch = df.agg(heavyHitters(col("toks"), cap)).head()
      .getSeq[org.apache.spark.sql.Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= cap)
    val bound = n.toDouble / (cap + 1)
    for ((tok, cnt) <- exact) {
      if (cnt > bound) assert(sketch.contains(tok), s"$tok (cnt=$cnt > $bound) missing")
      sketch.get(tok).foreach { est =>
        assert(est <= cnt, s"$tok overestimated: $est > $cnt")
        assert(cnt - est <= bound + 1e-9, s"$tok undershoots by ${cnt - est} > $bound")
      }
    }
  }

  test("Vocab.heavyHitters: exact output, partition-invariant, equals the plain group-by answer") {
    // skewed synthetic corpus: per lang, token h_i is hot, the rest dust
    val docs = (1 to 200).map { i =>
      val lang = if (i % 2 == 0) "en" else "es"
      val hot = Seq.fill(8)(s"hot_${lang}_${i % 3}")
      val dust = (1 to 12).map(j => s"dust_${(i * 131 + j * 17) % 1499}")
      (i.toLong, lang, (hot ++ dust).mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val got = Vocab.heavyHitters(docs, "text", "lang", pct = 50, capacity = 64)
      .as[(String, String, Long, Long)].collect().toSet
    // exact reference computed the brute way
    val toks = docs.select($"lang", explode(split($"text", " ")).as("token"))
    val nTok = toks.groupBy("lang").agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    val expect = toks.groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      .as[(String, String, Long)].collect()
      .filter { case (l, _, c) => c * 50 > nTok(l) }
      .map { case (l, t, c) => (l, t, c, nTok(l)) }.toSet
    assert(got == expect && got.nonEmpty)
    // partition-invariance of the COMPOSED output (sketch internals may
    // differ per partitioning; the verified answer may not)
    val got17 = Vocab.heavyHitters(docs.repartition(17), "text", "lang", pct = 50, capacity = 64)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got17 == got)
    // capacity too small for the threshold is refused, not silently lossy
    assertThrows[IllegalArgumentException] {
      Vocab.heavyHitters(docs, "text", "lang", pct = 50, capacity = 16)
    }
  }

  test("PplBuckets: exact order-statistic cuts, per-doc bucket parity, trained-domain bias") {
    val docs = graft.util.Tables.documents(spark, sf).cache()
    val model = NgramLm.train(docs.where(col("source") === "src0"), "text", "doc_id")

    val got = PplBuckets
      .bucket(docs, "text", "doc_id", model)
      .select("doc_id", "ppl", "bucket")
      .as[(Long, Double, String)].collect()

    // recompute the contract from scratch: sorted ppl, cut_j =
    // min{v : #(ppl <= v) >= ceil(phi_j * n)} = sorted(ceil(phi_j*n)-1)
    val scored = NgramLm.score(docs, "text", "doc_id", model)
      .select("doc_id", "ppl").as[(Long, Double)].collect()
    val n = scored.length
    val sortedPpl = scored.map(_._2).sorted
    def cut(phi: Double): Double = sortedPpl(math.ceil(phi * n).toInt - 1)
    val (c0, c1) = (cut(1.0 / 3.0), cut(2.0 / 3.0))
    val expect = scored.map { case (id, p) =>
      id -> (if (p <= c0) "head" else if (p <= c1) "middle" else "tail")
    }.toMap
    assert(got.length == n)
    got.foreach { case (id, p, b) =>
      assert(b == expect(id), s"doc $id ppl=$p: got $b, expected ${expect(id)}")
    }
    // every bucket non-empty at terciles on this corpus, and bucket
    // ranges are monotone: max(head) <= min(middle) <= ... by the cuts
    val byBucket = got.groupBy(_._3)
    assert(Set("head", "middle", "tail").subsetOf(byBucket.keySet))
    assert(byBucket("head").map(_._2).max <= byBucket("middle").map(_._2).min)
    assert(byBucket("middle").map(_._2).max <= byBucket("tail").map(_._2).min)

    // the CCNet point: docs from the LM's training domain skew toward
    // head (lower perplexity) vs the rest of the corpus
    val srcOf = docs.select("doc_id", "source").as[(Long, String)].collect().toMap
    val (inDom, outDom) = got.partition(r => srcOf(r._1) == "src0")
    val headShare = (rs: Array[(Long, Double, String)]) =>
      rs.count(_._3 == "head").toDouble / rs.length
    assert(headShare(inDom) > headShare(outDom),
      s"src0 head share ${headShare(inDom)} !> other ${headShare(outDom)}")

    assertThrows[IllegalArgumentException] {
      PplBuckets.bucket(docs, "text", "doc_id", model, labels = Seq("a", "b"))
    }
    docs.unpersist(); model.release()
  }

  test("CountMinAgg: overcount-only estimates, exact for a collision-free width, content partition-invariant") {
    import org.apache.spark.sql.functions._
    val hashFn = graft.functions.SharedHash.md5Long60 _
    // Zipf-ish stream: token t_i occurs 2^(8-i) times, i = 0..8
    val rows = (0 to 8).flatMap(i => Seq.fill(1 << (8 - i))((s"tok$i", "s")))
    val docs = rows.zipWithIndex
      .map { case ((t, l), j) => (j.toLong, t, l) }.toDF("id", "text", "lang")
    val exact = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap

    val w = 512; val d = 4; val seed = 7L
    val sk = Vocab.cmsSketch(docs, "text", "lang", w, d, seed, hashFn)
    val probes = exact.keys.toSeq.toDF("token")
    val est = Vocab.cmsEstimates(sk, probes, "token", "lang", w, d, seed, hashFn)
      .select("token", "est").as[(String, Long)].collect().toMap
    // one-sided error: never undercounts; at width 512 with 9 tokens the
    // deterministic hash layout is collision-free -> exact
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t undercounted: ${est(t)} < $c")
      assert(est(t) == c, s"$t not exact at collision-free width: ${est(t)} vs $c")
    }
    // an absent token reads 0 under the same collision-free layout
    val ghost = Vocab.cmsEstimates(sk, Seq("neverseen").toDF("token"),
      "token", "lang", w, d, seed, hashFn)
      .select("est").as[Long].head()
    assert(ghost == 0L)

    // sketch CONTENT (not just guarantees) is partition-invariant:
    // counters add elementwise, merge order cannot matter
    val sk1 = sk.select("cms").as[Seq[Long]].head()
    val sk17 = Vocab.cmsSketch(docs.repartition(17), "text", "lang", w, d, seed, hashFn)
      .select("cms").as[Seq[Long]].head()
    assert(sk1 == sk17)
    assert(sk1.sum == rows.size.toLong * d) // every occurrence lands in d cells

    // tiny width FORCES collisions: still never undercounts
    val wee = Vocab.cmsSketch(docs, "text", "lang", 4, 2, seed, hashFn)
    val weeEst = Vocab.cmsEstimates(wee, probes, "token", "lang", 4, 2, seed, hashFn)
      .select("token", "est").as[(String, Long)].collect().toMap
    exact.foreach { case (t, c) => assert(weeEst(t) >= c) }
  }

  test("count_min / cms_query SQL surface ≡ DataFrame sketch bit-for-bit") {
    import org.apache.spark.sql.functions._
    graft.sql.GraftFunctions.register(spark)
    val docs = Seq((0L, "a b a c", "x"), (1L, "b b c d", "x"), (2L, "a a a a", "y"))
      .toDF("id", "text", "lang")
    docs.createOrReplaceTempView("cms_docs")
    val viaSql = spark.sql(
      """SELECT lang, count_min(pmod(xxhash64(tok), 1152921504606846976), 32, 3, 11L) AS cms
        |FROM (SELECT lang, explode(split(text, ' ')) AS tok FROM cms_docs)
        |GROUP BY lang""".stripMargin)
      .as[(String, Seq[Long])].collect().toMap
    val viaDf = Vocab.cmsSketch(docs, "text", "lang", 32, 3, 11L,
      t => pmod(xxhash64(t), lit(1152921504606846976L)))
      .select("lang", "cms").as[(String, Seq[Long])].collect().toMap
    assert(viaSql == viaDf)
  }

  test("Vocab.chao1: hand frequency spectrum; saturated corpus estimates no unseen mass") {
    // corpus: "a a a b b c d" → S=4, f1={c,d}=2, f2={b}=1, N=7
    // chao1 = 4 + 2·1/(2·2) = 4.5 ; coverage = 1 − 2/7
    val df = Seq(("x", "a a a b b c d")).toDF("g", "text")
    val r = Vocab.chao1(df, "text", "g").head()
    assert(r.getAs[Long]("n_tokens") === 7L)
    assert(r.getAs[Long]("s_obs") === 4L)
    assert(r.getAs[Long]("f1") === 2L)
    assert(r.getAs[Long]("f2") === 1L)
    assert(r.getAs[Double]("chao1") === 4.5)
    assert(r.getAs[Double]("coverage") === math.floor((1.0 - 2.0 / 7.0) * 1e6 + 0.5) / 1e6)

    // every type seen many times → f1 = 0 → chao1 = S_obs, coverage 1
    val sat = Seq(("y", "a a a b b b")).toDF("g", "text")
    val rs = Vocab.chao1(sat, "text", "g").head()
    assert(rs.getAs[Double]("chao1") === rs.getAs[Long]("s_obs").toDouble)
    assert(rs.getAs[Double]("coverage") === 1.0)
  }

  test("NgramLm KN: hand bigram probabilities; KN separates contexts stupid-backoff can't") {
    import spark.implicits._
    // classic KN example: 'francisco' only ever follows 'san', so its
    // CONTINUATION probability is low even though its raw count is high
    val docs = Seq(
      (1L, "san francisco"), (2L, "san francisco"), (3L, "san francisco"),
      (4L, "new york"), (5L, "old york"), (6L, "big york")
    ).toDF("doc_id", "text")
    val m = NgramLm.trainKN(docs, "text", "doc_id", discount = 0.75)
    // bigram type counts: (san,francisco),(new,york),(old,york),(big,york) -> nbt = 4
    assert(m.totalsDf.head().getDouble(0) === 4.0)
    val cont = m.cont.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cont("francisco") === 1L && cont("york") === 3L)
    // score a doc: p(francisco | san) = (3-.75)/3 + .75*(1/3)*(1/4) = 0.8125
    val s = NgramLm.scoreKN(Seq((9L, "san francisco")).toDF("doc_id", "text"),
      "text", "doc_id", m).head()
    // pos0: p(san) = pcont(san) = 0 -> floored at 1e-10;
    // avg_logprob = (ln 1e-10 + ln .8125)/2
    val expected = (math.log(1e-10) + math.log(0.8125)) / 2.0
    assert(math.abs(s.getAs[Double]("avg_logprob") - expected) < 1e-3)
    m.release()
  }

  test("NgramLm KN: unseen context backs off to continuation; york beats francisco there") {
    import spark.implicits._
    val docs = Seq(
      (1L, "san francisco"), (2L, "san francisco"), (3L, "san francisco"),
      (4L, "new york"), (5L, "old york"), (6L, "big york")
    ).toDF("doc_id", "text")
    val m = NgramLm.trainKN(docs, "text", "doc_id")
    // 'zzz york' vs 'zzz francisco': unseen context 'zzz' -> pcont decides
    val out = NgramLm.scoreKN(
      Seq((1L, "zzz york"), (2L, "zzz francisco")).toDF("doc_id", "text"),
      "text", "doc_id", m)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl")).toMap
    assert(out(1L) < out(2L), s"york (3 contexts) must out-score francisco (1): $out")
    m.release()
  }
}
