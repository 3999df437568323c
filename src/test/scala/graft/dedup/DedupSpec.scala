package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bend today"), // near dup of 0
    (3L, "completely different words about spark clusters and shuffle partitions here"),
    (4L, "another unrelated document mentioning parquet files and columnar storage layouts")
  ).toDF("doc_id", "text")

  test("Exact.dedup keeps one row per distinct text (min id wins)") {
    val out = Exact.dedup(docs, "text", "doc_id").select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(0L, 2L, 3L, 4L))
  }

  test("Exact.dedupGroups counts copies") {
    val groups = Exact
      .dedupGroups(docs, "text", "doc_id")
      .select("keep_id", "n_copies")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(groups(0L) == 2L)
    assert(groups(2L) == 1L)
  }

  test("MinHashLsh finds planted near-duplicate and not unrelated docs") {
    val pairs = MinHashLsh
      .nearDuplicates(docs, "text", "doc_id", threshold = 0.5)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((0L, 1L))) // exact dup always collides
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists { case (a, b) => b == 3L || b == 4L || a == 3L || a == 4L })
  }

  test("EditDedup: banded candidates verified by bounded Levenshtein, budget semantics exact") {
    val base = "the quick brown fox jumps over the lazy dog near the wide river bank " +
      "while morning light settles across the quiet valley and birds begin to call"
    val docs = Seq(
      (0L, base),
      (1L, base.replace("morning", "evening")),          // tiny edit, shares most shingles
      (2L, base.take(130) + "entirely rewritten closing words sharing nothing at all"),
      // ^ long shared head → bands collide; the rewritten tail alone
      //   exceeds a 10% edit budget
      (3L, "completely different words about spark clusters and shuffle partitions here")
    ).toDF("doc_id", "text")

    // driver-side reference Levenshtein (full matrix, unbounded)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => i.max(j)))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val texts = Map(0L -> base, 1L -> base.replace("morning", "evening"),
      2L -> (base.take(130) + "entirely rewritten closing words sharing nothing at all"))

    val out = EditDedup.pairs(docs, "text", "doc_id", maxDistRatio = 0.1)
      .select("id_a", "id_b", "edit_dist", "edit_ratio")
      .as[(Long, Long, Long, Double)]
      .collect()
      .map(r => (r._1, r._2) -> (r._3, r._4))
      .toMap
    // the tiny edit passes: distance matches the reference DP exactly
    assert(out.contains((0L, 1L)), out.toString)
    val (d01, r01) = out((0L, 1L))
    assert(d01 == lev(texts(0L), texts(1L)).toLong, s"$d01 vs ${lev(texts(0L), texts(1L))}")
    val maxLen01 = math.max(texts(0L).length, texts(1L).length).toDouble
    assert(math.abs(r01 - BigDecimal(d01 / maxLen01)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    // doc 2 IS a banding candidate of doc 0 (shared head shingles) but
    // fails the edit budget — the thresholded DP must drop it, so its
    // absence proves the verify stage, not the recall stage
    val cands = MinHashLsh.candidatePairs(docs, "text", "doc_id").
      select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((0L, 2L)), s"precondition: 0-2 must band-collide, got $cands")
    assert(lev(texts(0L), texts(2L)) >
      0.1 * math.max(texts(0L).length, texts(2L).length))
    assert(!out.contains((0L, 2L)))
    // unrelated doc never pairs
    assert(!out.keys.exists { case (a, b) => a == 3L || b == 3L })
    // a generous budget admits doc 2 with the exact reference distance
    val wide = EditDedup.pairs(docs, "text", "doc_id", maxDistRatio = 0.9)
      .select("id_a", "id_b", "edit_dist").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(wide((0L, 2L)) == lev(texts(0L), texts(2L)).toLong)
  }

  test("MinHash signature is deterministic across invocations") {
    val s1 = MinHashLsh.signatures(docs, "text", "doc_id").orderBy("doc_id").collect()
    val s2 = MinHashLsh.signatures(docs, "text", "doc_id").orderBy("doc_id").collect()
    assert(s1.map(_.getSeq[Long](1)).toSeq == s2.map(_.getSeq[Long](1)).toSeq)
  }

  test("WeightedMinHash: lane agreement estimates generalized Jaccard") {
    // controlled weights: A = 40 tokens at w=1; B = same tokens, first 20
    // at w=3 => J_w = (20·1 + 20·1)/(20·3 + 20·1) = 0.5, while the SET
    // Jaccard is 1.0 — the regime plain minhash cannot see
    val rows =
      (1 to 40).map(t => (0L, 100L + t, 1.0)) ++
        (1 to 40).map(t => (1L, 100L + t, if (t <= 20) 3.0 else 1.0))
    val wsh = rows.toDF("doc_id", "sh", "w")
    val n = 256
    val sigs = WeightedMinHash
      .signaturesFromWeighted(wsh, "doc_id", numHashes = n)
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val agree = sigs(0).zip(sigs(1)).count { case (a, b) => a == b }.toDouble / n
    // sd at J=0.5 with 256 lanes is ~0.031; ±0.12 is ~4 sigma
    assert(math.abs(agree - 0.5) < 0.12, s"agreement $agree, expected ~0.5")
    // identical weighted sets -> identical signatures, on any partitioning
    val sigA = WeightedMinHash
      .signaturesFromWeighted(wsh.where($"doc_id" === 0L).repartition(5), "doc_id", numHashes = n)
      .head().getSeq[Long](1)
    assert(sigA == sigs(0))
  }

  test("WeightedMinHash.nearDuplicates: exact dup at 1.0, weight-skewed dup below it") {
    // doc 5 repeats one phrase of doc 0 many times: same shingle SET
    // similarity as a near-dup, but weights diverge
    val spam = (docs.collect().find(_.getLong(0) == 0L).get.getString(1) + " ") * 1 +
      Seq.fill(8)("the quick brown fox").mkString(" ")
    val wdocs = docs.union(Seq((5L, spam)).toDF("doc_id", "text"))
    // single-row bands: candidate recall ~1 even at J_w ≈ 0.3, so the
    // test pins the VERIFY stage, not banding luck
    val out = WeightedMinHash
      .nearDuplicates(wdocs, "text", "doc_id", threshold = 0.2, shingleSize = 2, numBands = 64)
      .select("id_a", "id_b", "jaccard_w")
      .as[(Long, Long, Double)]
      .collect()
      .map(t => (t._1, t._2) -> t._3)
      .toMap
    assert(out((0L, 1L)) == 1.0) // identical docs, identical tf
    // the repeat-heavy doc is found but its weighted Jaccard is well
    // below the exact-dup pair's
    assert(out.keySet.exists { case (a, b) => b == 5L || a == 5L })
    out.collect { case ((a, b), j) if a == 5L || b == 5L => j }
      .foreach(j => assert(j < 0.75, s"weight-skewed pair scored $j"))
    // unrelated docs never verified
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L || a == 4L || b == 4L })
    // exact generalized Jaccard of the verify stage: replay (0,5) by hand
    val w05 = WeightedMinHash.tokenWeights(wdocs, "text", "doc_id", n = 2)
      .where($"doc_id".isin(0L, 5L))
      .select("doc_id", "sh", "w").as[(Long, Long, Double)].collect()
    val wa = w05.filter(_._1 == 0L).map(t => t._2 -> t._3).toMap
    val wb = w05.filter(_._1 == 5L).map(t => t._2 -> t._3).toMap
    val imin = wa.keySet.intersect(wb.keySet).toSeq.map(k => math.min(wa(k), wb(k))).sum
    val expect = imin / (wa.values.sum + wb.values.sum - imin)
    out.collect { case ((a, b), j) if a == 0L && b == 5L => j }
      .foreach(j => assert(math.abs(j - expect) < 1e-3, s"verify $j vs hand $expect"))
  }

  test("SimHash: identical texts get identical fingerprints, near-dups small hamming") {
    val fps = SimHash
      .fingerprints(docs, "text", "doc_id")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(fps(0L) == fps(1L))
    val hammingNear = java.lang.Long.bitCount(fps(0L) ^ fps(2L))
    val hammingFar = java.lang.Long.bitCount(fps(0L) ^ fps(3L))
    assert(hammingNear < hammingFar)
  }

  test("SimHash.nearDuplicates returns planted duplicates only") {
    val pairs = SimHash
      .nearDuplicates(docs, "text", "doc_id", maxDist = 3)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).intersect(Set(3L, 4L)).nonEmpty })
  }

  test("ConnectedComponents: chains, separate clusters, min-id labels") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // a chain (exercises pointer jumping)
      (11L, 10L), (11L, 12L),                 // a star
      (20L, 21L)                              // a pair
    ).toDF("a", "b")
    val comps = ConnectedComponents
      .components(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(comps(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(comps(_) == 10L))
    assert(comps(20L) == 20L && comps(21L) == 20L)
  }

  test("ConnectedComponents matches driver union-find on a random graph") {
    val rnd = new scala.util.Random(5)
    val n = 60
    val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // driver union-find ground truth
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> {
        // canonical label: min id in the component
        val r = find(id.toInt)
        edges.flatMap(e => Seq(e._1, e._2)).distinct.filter(o => find(o.toInt) == r).min
      }).toMap
    val got = ConnectedComponents
      .components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("SpanDedup flags a planted shared 8-token span and keeps owners") {
    // doc 20 copies an 8-token run from doc 10 into otherwise-unrelated text
    val span = "one two three four five six seven eight"
    val d = Seq(
      (10L, s"intro words here $span trailing content words"),
      (20L, s"completely different payload $span other tail tokens"),
      (30L, "no overlap with anything at all in this document right here"),
      (40L, "tiny doc") // shorter than n=8 -> whole-text span
    ).toDF("doc_id", "text")
    val stats = SpanDedup.spanStats(d, "text", "doc_id", n = 8)
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(stats(10L)._4 == 0L) // owner of the shared span (min id)
    assert(stats(10L)._3 == 1L) // exactly one span shared
    assert(stats(20L)._4 == 1L) // one foreign span -> flagged
    assert(stats(30L)._3 == 0L && stats(30L)._4 == 0L)
    assert(stats(40L)._2 == 1L) // short doc = one whole-text span
    val kept = SpanDedup.survivors(d, "text", "doc_id", n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 30L, 40L))
  }

  test("SpanDedup.contamination counts spans leaking from the probe set") {
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, s"clean document with entirely original content here now"),
      (2L, s"prefix words $span suffix words closing out this one"),
      (3L, "another clean unrelated document full of its own words")
    ).toDF("doc_id", "text")
    val probe = Seq((100L, s"the benchmark question contains $span inside it"))
      .toDF("doc_id", "text")
    val got = SpanDedup.contamination(corpus, probe, "text", "doc_id", n = 8)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(got(2L)._3 == 1L) // exactly the planted span leaks
    assert(got(1L)._3 == 0L && got(3L)._3 == 0L)
    assert(got.keySet == Set(1L, 2L, 3L)) // every corpus doc reported
  }

  test("SpanDedup.contaminationBloom equals exact contamination (bloom only prunes)") {
    // realistic scale shape in miniature: a larger probe "index" and a
    // corpus with planted leaks; the bloom prefilter must change NOTHING
    // about the answer (exact semi-join removes its false positives)
    val docs = graft.util.Tables.documents(spark, sf).limit(120).cache()
    val probe = docs.where($"doc_id" % 3 === 0).select($"doc_id", $"text")
    val corpus = docs.select($"doc_id", $"text")
    val exact = SpanDedup.contamination(corpus, probe, "text", "doc_id", n = 5)
      .as[(Long, Long, Long)].collect().toSet
    for (fpp <- Seq(0.5, 0.01)) { // even an awful filter only prunes
      val bloom = SpanDedup
        .contaminationBloom(corpus, probe, "text", "doc_id", n = 5, fpp = fpp)
        .as[(Long, Long, Long)].collect().toSet
      assert(bloom == exact, s"fpp=$fpp")
    }
    docs.unpersist()
  }

  test("NGramJaccard: exact dup jaccard=1, near dup high, unrelated low") {
    val withBlock = docs.withColumn("src", lit("s"))
    val j = NGramJaccard
      .similarityJoin(withBlock, "text", "doc_id", "src", n = 2)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)]
      .collect()
      .map { case (a, b, v) => (a, b) -> v }
      .toMap
    assert(j((0L, 1L)) == 1.0)
    assert(j((0L, 2L)) > 0.5)
    assert(j((0L, 3L)) < 0.1)
  }

  test("dedup pipeline: minhash pairs -> components -> min-id survivors") {
    // docs 0,1,2 form one near-dup cluster; 3 and 4 are singletons
    val pairs = MinHashLsh.nearDuplicates(docs, "text", "doc_id", threshold = 0.5)
    val comps = ConnectedComponents.components(pairs, "id_a", "id_b")
    val survivors = docs
      .select(col("doc_id"))
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .where(coalesce(col("comp"), col("doc_id")) === col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(0L, 3L, 4L))
  }

  test("Survivors.keepBest keeps the highest-quality member per cluster, ties to lowest id") {
    val components = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), // cluster A
      (4L, 104L), // singleton
      (5L, 105L), (6L, 105L) // cluster B, tied scores
    ).toDF("doc_id", "component")
    val scored = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9), // A: 2 and 3 tie at 0.9 → keep 2
      (4L, 0.1),
      (5L, 0.7), (6L, 0.7) // B: tie → keep 5
    ).toDF("doc_id", "quality")
    for (parts <- Seq(1, 3)) {
      val got = Survivors
        .keepBest(components.repartition(parts), scored, "doc_id", "component", "quality")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((100L, 2L, 0.9), (104L, 4L, 0.1), (105L, 5L, 0.7)), s"parts=$parts")
    }
  }

  test("RepeatedSpans: planted variable-length spans — exact starts, coverage, runs, owners") {
    val base = (0 until 40).map(i => s"a$i")
    // doc 1 owns everything; doc 2 copies 21 tokens (positions 5..25) of
    // doc 1 inside unique filler; doc 3 repeats a 12-token block
    // INTERNALLY; doc 4 shares only 11 tokens — below the threshold
    val doc1 = base.mkString(" ")
    val doc2 = ((0 until 6).map(i => s"b$i") ++ base.slice(5, 26) ++
      (0 until 5).map(i => s"c$i")).mkString(" ")
    val block = (0 until 12).map(i => s"d$i")
    val doc3 = (block ++ Seq("e0", "e1", "e2") ++ block).mkString(" ")
    val doc4 = (Seq("f0") ++ base.slice(0, 11) ++ Seq("f1")).mkString(" ")
    val df = Seq((1L, doc1), (2L, doc2), (3L, doc3), (4L, doc4)).toDF("doc_id", "text")

    val st = RepeatedSpans.stats(df, "text", "doc_id", minLen = 12)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // 21 shared tokens → 10 consecutive starts, one maximal span of 21
    assert(st(1L) == ((1L, 10L, 21L, 21L, 0L)), st(1L).toString)
    // same geometry in doc 2, but every span is foreign (owner = doc 1)
    assert(st(2L) == ((2L, 10L, 21L, 21L, 10L)), st(2L).toString)
    // internal repeat: two isolated starts, 24 covered, owner = self
    assert(st(3L) == ((3L, 2L, 24L, 12L, 0L)), st(3L).toString)
    // 11-token overlap is below minLen → clean
    assert(st(4L) == ((4L, 0L, 0L, 0L, 0L)), st(4L).toString)

    // keep-earliest survivors: doc 2 evicted, internal repetition is not
    val kept = RepeatedSpans.survivors(df, "text", "doc_id", minLen = 12)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))

    // threshold exactness: at minLen = 11 doc 4's overlap now counts
    // (11 tokens → 1 start) and doc 4 is evicted
    val st11 = RepeatedSpans.stats(df, "text", "doc_id", minLen = 11)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(st11(4L)._2 == 1L && st11(4L)._5 == 1L, st11(4L).toString)
    val kept11 = RepeatedSpans.survivors(df, "text", "doc_id", minLen = 11)
      .select("doc_id").as[Long].collect().toSet
    assert(kept11 == Set(1L, 3L))
  }

  test("LineDedup removes corpus-duplicated lines, keeps earliest occurrence, preserves order") {
    // boilerplate "HDR" appears in docs 1,2,3 (and twice inside doc 3);
    // "FOOT" in docs 2,3; unique lines survive untouched
    val df = Seq(
      (1L, "HDR\nalpha\nbeta"),
      (2L, "HDR\ngamma\nFOOT"),
      (3L, "HDR\nHDR\ndelta\nFOOT"),
      (4L, "unique one\nunique two")
    ).toDF("doc_id", "text")
    val out = LineDedup.clean(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // keeper of HDR is (doc 1, pos 0); keeper of FOOT is (doc 2, pos 2)
    assert(out(1L) == (("HDR\nalpha\nbeta", 0L, 3L)))
    assert(out(2L) == (("gamma\nFOOT", 1L, 3L)))
    assert(out(3L) == (("delta", 3L, 4L)))
    assert(out(4L) == (("unique one\nunique two", 0L, 2L)))
  }

  test("LineDedup minCount=3 keeps lines below the threshold; all-removed doc stays with empty text") {
    val df = Seq(
      (1L, "X"),
      (2L, "X"),
      (3L, "X"),
      (4L, "X\nY"),
      (5L, "Y")
    ).toDF("doc_id", "text")
    // X occurs 4 times (>= 3): removed everywhere but doc 1. Y occurs
    // twice (< 3): survives everywhere.
    val out = LineDedup.clean(df, "text", "doc_id", minCount = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("X", 0L)))
    assert(out(2L) == (("", 1L)))
    assert(out(3L) == (("", 1L)))
    assert(out(4L) == (("Y", 1L))) // its X is not the keeper
    assert(out(5L) == (("Y", 0L)))
  }

  test("CdcChunks: chunks are contiguous, non-empty, and reassemble each document exactly") {
    val corpus = graft.util.Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), col("text")).cache()
    val ch = CdcChunks.chunks(corpus, "text", "doc_id", window = 8, divisor = 32)
      .as[(Long, Int, Int, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val texts = corpus.as[(Long, String)].collect().toMap
    assert(ch.keySet == texts.keySet.filter(texts(_).nonEmpty))
    ch.foreach { case (id, parts) =>
      val t = texts(id)
      // contiguity: chunk 0 starts at 1, each next starts where the
      // previous ended, the last ends at len; every chunk non-empty
      assert(parts.head._3 == 1)
      parts.foreach(p => assert(p._4 >= 1, s"doc $id empty chunk at idx ${p._2}"))
      parts.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4)
        case _           =>
      }
      assert(parts.last._3 + parts.last._4 - 1 == t.length)
      // reassembly + per-chunk hash definition
      val rebuilt = parts.map(p => t.substring(p._3 - 1, p._3 - 1 + p._4)).mkString
      assert(rebuilt == t, s"doc $id does not reassemble")
    }
    corpus.unpersist()
  }

  test("CdcChunks: boundaries survive a head insertion (shift invariance) where fixed stride loses all alignment") {
    val a = graft.util.Tables.documents(spark, sf)
      .where(length(col("text")) > 200).select("text").as[String].first()
    val b = "zzzz " + a // 5-char head insertion: every offset shifts
    val two = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val ch = CdcChunks.chunks(two, "text", "doc_id", window = 8, divisor = 32)
      .as[(Long, Int, Int, Int, Long)].collect()
    val hashesA = ch.filter(_._1 == 1L).sortBy(_._2)
    val hashesB = ch.filter(_._1 == 2L).map(_._5).toSet
    assert(hashesA.length >= 3, s"text too short to cut: ${hashesA.length} chunks")
    // every chunk of A after its first boundary reappears verbatim in B:
    // boundary windows beyond the edit see identical content
    hashesA.drop(1).foreach(p =>
      assert(hashesB.contains(p._5), s"chunk idx ${p._2} lost after head insertion"))

    // dedupStats sees the shared tail as dup chars in BOTH docs
    val stats = CdcChunks.dedupStats(two, "text", "doc_id", window = 8, divisor = 32)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val firstLenA = hashesA.head._4
    assert(stats(1L)._4 >= a.length - firstLenA,
      s"dup_chars ${stats(1L)._4} < shared-tail bound ${a.length - firstLenA}")
    // fixed-stride counterexample: stride-32 block hashes of A vs B
    // share (near) nothing after the 5-char shift
    val strideA = a.grouped(32).toSeq.dropRight(1).map(s => s.hashCode).toSet
    val strideB = b.grouped(32).toSeq.dropRight(1).map(s => s.hashCode).toSet
    assert(strideA.intersect(strideB).size <= 1, "stride hashing unexpectedly aligned")
  }

  test("CdcChunks.removeDupChunks: first occurrence survives, later copies cut, unique docs untouched") {
    val a = graft.util.Tables.documents(spark, sf)
      .where(length(col("text")) > 200).select("text").as[String].first()
    val corpus = Seq(
      (1L, a),            // keeper: first occurrence of every chunk
      (2L, "qq " + a),    // shifted copy: shared-tail chunks must vanish
      (3L, "completely unrelated content with no shared window anywhere here")
    ).toDF("doc_id", "text")
    val got = CdcChunks.removeDupChunks(corpus, "text", "doc_id")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap

    // doc 1 keeps everything (it owns the lowest (id, idx) per hash)
    assert(got(1L)._2 == a && got(1L)._4 == 0L)
    // doc 3 shares nothing → untouched
    assert(got(3L)._4 == 0L && got(3L)._2.nonEmpty)
    // doc 2 loses its shared tail: cleaned text is a strict prefix-ish
    // shrink, and what survives is exactly its first (edited) chunk(s)
    val ch2 = CdcChunks.chunks(corpus, "text", "doc_id")
      .where(col("doc_id") === 2L).as[(Long, Int, Int, Int, Long)].collect().sortBy(_._2)
    val ch1Hashes = CdcChunks.chunks(corpus, "text", "doc_id")
      .where(col("doc_id") === 1L).as[(Long, Int, Int, Int, Long)].collect().map(_._5).toSet
    val expectKept = ch2.filter(c => !ch1Hashes.contains(c._5))
    val t2 = "qq " + a
    val expectText = expectKept.map(c => t2.substring(c._3 - 1, c._3 - 1 + c._4)).mkString
    assert(got(2L)._2 == expectText, "doc 2 cleaned text must be its non-shared chunks in order")
    assert(got(2L)._4 > a.length / 2, s"expected most of doc 2 removed, got ${got(2L)._4}")
    // totals: removed chars + kept chars == original length per doc
    got.values.foreach(r => assert(r._2.length + r._4 == corpus
      .where(col("doc_id") === r._1).select(length(col("text"))).as[Int].first()))
  }

  test("GearChunks kernel: exact coverage, min/max bounds, edit resynchronization, codegen path parity") {
    // deterministic pseudo-random text long enough for ~80 chunks
    def synth(seed: Long, n: Int): String = {
      val sb = new StringBuilder; var z = seed
      while (sb.length < n) {
        z = z * 6364136223846793005L + 1442695040888963407L
        sb.append((' ' + ((z >>> 33) % 90)).toChar)
      }
      sb.toString
    }
    val a = synth(7L, 4000)
    val b = "zzz " + a
    val docs = Seq((1L, a), (2L, b), (3L, ""), (4L, "x")).toDF("doc_id", "text")
    val ch = CdcChunks.chunksGear(docs, "text", "doc_id", minLen = 16, maxLen = 128, maskBits = 5)
      .as[(Long, Int, Int, Int, Long)].collect()
    val byDoc = ch.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    // empty doc yields nothing; 1-byte doc is one forced final chunk
    assert(!byDoc.contains(3L))
    assert(byDoc(4L).map(c => (c._3, c._4)).toSeq == Seq((0, 1)))

    // coverage + bounds on the long docs (byte == char here: ASCII)
    Seq(1L -> a, 2L -> b).foreach { case (id, t) =>
      val parts = byDoc(id)
      assert(parts.head._3 == 0)
      parts.sliding(2).foreach {
        case Array(x, y) => assert(y._3 == x._3 + x._4)
        case _           =>
      }
      assert(parts.map(_._4).sum == t.length)
      parts.dropRight(1).foreach(p => assert(p._4 >= 16 && p._4 <= 128))
      assert(parts.last._4 <= 128)
      assert(parts.length >= 20, s"doc $id only ${parts.length} chunks")
    }

    // self-synchronization: after the 4-byte head insertion the chunk
    // streams re-coalesce; most of A's chunks reappear verbatim in B
    val hashesB = byDoc(2L).map(_._5).toSet
    val shared = byDoc(1L).count(c => hashesB.contains(c._5))
    assert(shared >= byDoc(1L).length / 2,
      s"only $shared/${byDoc(1L).length} chunks survived the head edit")

    // the Dataset path (codegen) agrees with a direct kernel call
    val direct = graft.functions.GearChunks
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString(a), 16, 128, 5)
    assert(direct.numElements() == byDoc(1L).length)
    byDoc(1L).zipWithIndex.foreach { case (c, i) =>
      val r = direct.getStruct(i, 3)
      assert((r.getInt(0), r.getInt(1), r.getLong(2)) == ((c._3, c._4, c._5)))
    }

    assertThrows[IllegalArgumentException] {
      graft.functions.GearChunks(null, 0, 10, 5)
    }
  }

  test("CdcChunks index persists via the catalog: fresh-open parity, params travel, wrong kind rejected") {
    val corpus = graft.util.Tables.documents(spark, sf).limit(20)
      .select(col("doc_id"), col("text"))
    val idx = CdcChunks.hashIndex(corpus, "text", "doc_id", window = 8, divisor = 16)
    val dir = java.nio.file.Files.createTempDirectory("cdc_idx").toString
    CdcChunks.saveIndex(spark, idx, dir, window = 8, divisor = 16)

    val (loaded, w, d) = CdcChunks.loadIndex(spark, dir)
    // the build params travel with the index — a serving session must
    // chunk with THESE, not its own defaults
    assert((w, d) == ((8, 16)))
    assert(loaded.as[Long].collect().toSet == idx.as[Long].collect().toSet)

    intercept[IllegalArgumentException] {
      graft.sources.IndexCatalog.open(spark, dir, "ivf-cells")
    }
  }

  test("CdcChunks: short and degenerate docs — single chunk below window+1, empty dropped, exact dups fully dup") {
    val two = Seq((1L, "tiny"), (2L, ""), (3L, "exactly8"), (4L, "same same same body"), (5L, "same same same body"))
      .toDF("doc_id", "text")
    val ch = CdcChunks.chunks(two, "text", "doc_id").as[(Long, Int, Int, Int, Long)].collect()
    assert(!ch.exists(_._1 == 2L), "empty doc must yield no chunks")
    assert(ch.count(_._1 == 1L) == 1 && ch.find(_._1 == 1L).get._4 == 4)
    assert(ch.count(_._1 == 3L) == 1, "len == window doc has no cut candidates (needs w+1)")
    val stats = CdcChunks.dedupStats(two, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // exact dup pair: every chunk shared, dup_chars == full length
    assert(stats(4L)._2 == stats(4L)._3 && stats(4L)._4 == 19L)
    assert(stats(5L)._4 == 19L)
    assert(stats(1L)._3 == 0L && stats(1L)._4 == 0L)
  }

  private val corpusA = Seq(
    (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (101L, "completely different words about spark clusters and shuffle partitions here"),
    (102L, "another unrelated document mentioning parquet files and columnar storage layouts")
  ).toDF("doc_id", "text")

  test("MinHashLsh persisted index: params travel, batch serve parity with a from-scratch union run") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-idx").toString
    MinHashLsh.saveIndex(corpusA, "text", "doc_id", dir, numHashes = 64, shingleSize = 3,
      numBands = 16, seed = 42L)
    val idx = MinHashLsh.loadIndex(spark, dir)
    assert(idx.numHashes == 64 && idx.shingleSize == 3 && idx.numBands == 16 &&
      idx.seed == 42L && idx.gramHashName == "xxhash64")

    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact of 100
      (2L, "the quick brown fox jumps over the lazy dog near the river bend today"), // near of 100
      (3L, "nothing in common with anything stored previously in the corpus lake")
    ).toDF("doc_id", "text")
    val got = MinHashLsh.dedupeAgainstIndex(batch, "text", "doc_id", idx, threshold = 0.3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap

    // reference: the ordinary union-self near-dup run restricted to
    // (new, corpus) pairs — the index path must agree value-for-value
    val ref = MinHashLsh
      .nearDuplicates(batch.unionByName(corpusA), "text", "doc_id", threshold = 0.3)
      .as[(Long, Long, Double)].collect()
      .collect { case (a, b, j) if a < 100L && b >= 100L => (a, b) -> j }
      .toMap
    assert(got == ref, s"$got vs $ref")
    assert(got.contains((1L, 100L)) && got((1L, 100L)) == 1.0)
    assert(got.contains((2L, 100L)) && got((2L, 100L)) >= 0.3)
    assert(!got.keys.exists(_._1 == 3L))

    // wrong kind rejected with a message, not a cast error
    intercept[IllegalArgumentException](graft.sim.AnnSq8.loadIndex(spark, dir))
  }

  test("MinHashLsh.appendIndex: appended docs are findable; original rows untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-app").toString
    MinHashLsh.saveIndex(corpusA, "text", "doc_id", dir)
    val day2 = Seq(
      (200L, "a second crawl contributes fresh material about streaming state stores tonight")
    ).toDF("doc_id", "text")
    MinHashLsh.appendIndex(day2, "text", "doc_id", dir)
    val idx = MinHashLsh.loadIndex(spark, dir)
    assert(idx.bands.select("corpus_id").distinct().count() == 4)

    val day3 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // dup of A
      (2L, "a second crawl contributes fresh material about streaming state stores tonight") // dup of day2
    ).toDF("doc_id", "text")
    val got = MinHashLsh.dedupeAgainstIndex(day3, "text", "doc_id", idx, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 100L)) == 1.0) // pre-append content still served
    assert(got((2L, 200L)) == 1.0) // appended content found
  }

  test("appendIndex global cap: daily appends of a degenerate class never regrow a bucket past maxBucket") {
    import org.apache.spark.sql.functions._
    val base = "boilerplate footer text repeated across every page of the crawled site today"
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-regrow").toString
    // day 0: 6 members of the class, cap 10 — under the cap at build
    val day0 = spark.range(0, 6).select(col("id").as("doc_id"), lit(base).as("text"))
    MinHashLsh.saveIndex(day0, "text", "doc_id", dir, maxBucket = 10)
    // day 1: 8 more members — only 4 fit; telemetry must report the drop
    val day1 = spark.range(100, 108).select(col("id").as("doc_id"), lit(base).as("text"))
    val tele1 = MinHashLsh.appendIndex(day1, "text", "doc_id", dir)
      .select("existing", "incoming", "admitted", "dropped")
      .as[(Long, Long, Long, Long)].collect()
    assert(tele1.nonEmpty, "quota must bind on day 1")
    tele1.foreach { case (ex, in, ad, dr) =>
      assert(ex === 6L && in === 8L && ad === 4L && dr === 4L)
    }
    // day 2: the bucket is full — nothing admitted, everything reported
    val day2 = spark.range(200, 205).select(col("id").as("doc_id"), lit(base).as("text"))
    val tele2 = MinHashLsh.appendIndex(day2, "text", "doc_id", dir)
      .select("existing", "incoming", "admitted", "dropped")
      .as[(Long, Long, Long, Long)].collect()
    tele2.foreach { case (ex, in, ad, dr) =>
      assert(ex === 10L && in === 5L && ad === 0L && dr === 5L)
    }
    // loadIndex reports a cap the on-disk bands actually satisfy
    val idx2 = MinHashLsh.loadIndex(spark, dir)
    val worst = idx2.bands.groupBy("band", "bucket").count().agg(max("count")).head().getLong(0)
    assert(worst <= 10L, s"append must never regrow a bucket past maxBucket: $worst")
    // a non-degenerate append in the same batch flow is fully admitted
    val fresh = Seq((999L, "a completely unrelated document about distributed query planning tonight"))
      .toDF("doc_id", "text")
    assert(MinHashLsh.appendIndex(fresh, "text", "doc_id", dir).count() === 0L)
    assert(MinHashLsh.loadIndex(spark, dir).bands
      .where(col("corpus_id") === 999L).count() > 0L)
  }

  test("thresholdSweep: planted pairs land in their Jaccard bins, cumulative counts descend correctly") {
    import org.apache.spark.sql.functions._
    // base 20-token doc; copies at decreasing overlap: identical (j=1),
    // three-quarters, half-ish — all band-collide with the base
    val base = (0 until 20).map(i => s"w$i").mkString(" ")
    val threeQ = ((0 until 15).map(i => s"w$i") ++ (0 until 5).map(i => s"x$i")).mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), (3L, threeQ),
      (4L, "totally different words that never collide with anything here at all")
    ).toDF("doc_id", "text")
    val sweep = MinHashLsh
      .thresholdSweep(docs, "text", "doc_id", bins = 10,
        gramHash = graft.functions.SharedHash.md5Long60)
      .select("bin", "n_pairs", "n_pairs_ge_lo")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    val byBin = sweep.map(r => r._1 -> r._2).toMap
    assert(byBin(9) === 1L, s"identical pair must land in the top bin: ${sweep.toSeq}")
    assert(byBin.keys.exists(_ < 9), s"partial-overlap pair missing: ${sweep.toSeq}")
    // cumulative = suffix sums over bins
    val sorted = sweep.sortBy(-_._1)
    var run = 0L
    sorted.foreach { case (_, n, ge) => run += n; assert(ge === run) }
    // total pairs = all candidate pairs (no threshold filter)
    val nCand = MinHashLsh
      .nearDuplicates(docs, "text", "doc_id", threshold = 0.0,
        gramHash = graft.functions.SharedHash.md5Long60).count()
    assert(sweep.map(_._2).sum === nCand)
  }

  test("MinHashLsh hot-bucket cap: a planted degenerate bucket yields bounded pairs with the drop counted") {
    // 1,000 byte-identical documents: every band's bucket holds all
    // 1,000 members, so the UNCAPPED self-join would emit 499,500
    // pairs; the cap must bound it to C(cap, 2) with the loss audited.
    val base = "boilerplate footer text repeated across every page of the crawled site today"
    val hot = spark.range(0, 1000).select(col("id").as("doc_id"), lit(base).as("text"))
    val cap = 25

    val pairs = MinHashLsh.candidatePairs(hot, "text", "doc_id", maxBucket = cap)
    assert(pairs.count() === cap.toLong * (cap - 1) / 2,
      "kept members must still pair with each other (one connected component), nothing more")

    val sig = MinHashLsh.signatures(hot, "text", "doc_id")
    val banded = MinHashLsh.bands(sig, "doc_id", numBands = 16, sigLen = 64)
    val tele = MinHashLsh.hotBuckets(banded, maxBucket = cap)
      .select("sz", "kept", "dropped_pairs")
      .as[(Long, Long, Long)]
      .collect()
    assert(tele.length === 16, "identical docs collide in all 16 bands")
    tele.foreach { case (sz, kept, dropped) =>
      assert(sz === 1000L)
      assert(kept === cap.toLong)
      assert(dropped === 1000L * 999 / 2 - cap.toLong * (cap - 1) / 2)
    }

    // non-binding cap leaves results untouched (the sf0.1 oracle regime)
    val small = docs
    val capped = MinHashLsh.candidatePairs(small, "text", "doc_id", maxBucket = 1000)
      .as[(Long, Long)].collect().toSet
    val default = MinHashLsh.candidatePairs(small, "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(capped === default)
    assert(MinHashLsh.hotBuckets(
      MinHashLsh.bands(
        MinHashLsh.signatures(small, "text", "doc_id"), "doc_id", 16, 64)).count() === 0L)
  }

  test("capBuckets plan shape: exactly one Window/Sort pair, on the hot slice only") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 200).select(col("id").as("doc_id"),
      concat(lit("unique words for doc "), col("id")).as("text"))
    val sig = MinHashLsh.signatures(docs, "text", "doc_id")
    // truncate lineage: the shingling pipeline has its own lead-windows;
    // the assertion is about what capBuckets ADDS downstream of the bands
    val banded = MinHashLsh.bands(sig, "doc_id", numBands = 16, sigLen = 64)
      .localCheckpoint(true)
    val capped = MinHashLsh.capBuckets(
      banded, Seq("band", "bucket"), Seq(xxhash64(col("doc_id")), col("doc_id")), 2000)
    val plan = capped.queryExecution.executedPlan.toString
    // the r11 regression was an unconditional row_number over the WHOLE
    // banded frame; the two-pass cap must rank only the flagged slice —
    // one Window (and its one Sort) under the hot-branch filter, the
    // cold branch a plain null-check filter with no sort
    val windows = "Window".r.findAllIn(plan).size
    assert(windows === 1, s"expected exactly one Window, got $windows:\n$plan")
    assert("(?i)sort".r.findAllIn(plan).size <= 2, // the window's local sort (+AQE labels)
      s"unexpected extra sorts:\n$plan")
    assert(plan.contains("isnull"), "cold branch must be a null-check pass-through")
  }

  test("corpusIndex hot-bucket cap: degenerate class bounded at build, batch dedup still finds it") {
    val base = "boilerplate footer text repeated across every page of the crawled site today"
    // 500 byte-identical corpus docs: every band bucket holds all 500
    val hotCorpus = spark.range(0, 500).select(col("id").as("doc_id"), lit(base).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-cap").toString
    MinHashLsh.saveIndex(hotCorpus, "text", "doc_id", dir, maxBucket = 10)
    val idx = MinHashLsh.loadIndex(spark, dir)
    assert(idx.maxBucket === 10, "cap must round-trip through the catalog")
    // the index holds at most 10 members per (band, bucket)
    val worst = idx.bands.groupBy("band", "bucket").count()
      .agg(max("count")).head().getLong(0)
    assert(worst <= 10L, s"build-time cap must bound index buckets: $worst")
    // a batch copy of the degenerate class still matches (the kept
    // members ARE the class) — recall on the class is intact
    val batch = Seq((9999L, base)).toDF("doc_id", "text")
    val hits = MinHashLsh.dedupeAgainstIndex(batch, "text", "doc_id", idx, threshold = 0.9)
    assert(hits.count() >= 1L, "capped index must still catch the duplicate class")
    assert(hits.count() <= 10L, "attribution is bounded by the kept members")
  }

  test("NGramJaccard.containmentJoin: a quote inside a long doc scores ~1 one way, Jaccard low") {
    val long = (1 to 60).map(j => s"w$j").mkString(" ")
    val quote = (10 to 20).map(j => s"w$j").mkString(" ") // 11-token contiguous slice
    val other = (100 to 160).map(j => s"x$j").mkString(" ")
    val df = Seq((1L, long, "s"), (2L, quote, "s"), (3L, other, "s"))
      .toDF("doc_id", "text", "source")
    val pairs = NGramJaccard.containmentJoin(df, "text", "doc_id", "source",
      n = 2, minContainment = 0.8)
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getDouble(3), r.getDouble(4)))).toMap
    // pair (1,2): quote's 10 bigrams all inside long's 59 -> cont_b_in_a = 1
    assert(pairs.keySet == Set((1L, 2L)))
    assert(pairs((1L, 2L))._2 == 1.0)
    assert(pairs((1L, 2L))._1 < 0.2, "containment of long in quote stays low")
    // and the symmetric Jaccard would never have flagged it at 0.5
    val j = NGramJaccard.similarityJoin(df, "text", "doc_id", "source", n = 2, minJaccard = 0.5)
    assert(j.count() == 0L)
  }
}
