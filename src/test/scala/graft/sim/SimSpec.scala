package graft.sim

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.util.Tables

class SimSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("TopK aggregate ≡ row_number window top-k, any partitioning, with ties") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // adversarial: duplicate scores (ties broken by payload), scores
    // crossing zero, groups smaller AND larger than k
    val rows = for {
      g <- 1 to 7
      i <- 1 to (g * 3)
    } yield (g.toLong, (g * 100 + i).toLong, ((i % 5) - 2).toDouble, s"c$g")
    for (parts <- Seq(1, 3, 13)) {
      val df = rows.toDF("key", "id", "score", "carry").repartition(parts)
      val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("id"))
      val expect = df
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 4)
        .select("key", "carry", "id", "score")
        .as[(Long, String, Long, Double)].collect().toSet
      val got = graft.functions.TopK
        .perKey(df, Seq("key"), "score", "id", 4, carry = Seq("carry"))
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got == expect, s"parts=$parts")
    }
  }

  test("Cosine.topK ranks by exact cosine similarity") {
    val corpus = Seq(
      (0L, vec(1, 0, 0)),
      (1L, vec(0.9, 0.1, 0)), // closest to 0
      (2L, vec(0, 1, 0)),
      (3L, vec(-1, 0, 0)) // opposite
    ).toDF("vec_id", "embedding")
    val top = Cosine
      .topK(corpus.where($"vec_id" === 0L), corpus, "vec_id", "embedding", k = 2)
      .select("qid", "nid")
      .as[(Long, Long)]
      .collect()
      .toSeq
    assert(top == Seq((0L, 1L), (0L, 2L)))
  }

  test("Cosine.mutualKnn keeps only reciprocal edges — the hub edge dies") {
    // tight pair (0,1); 2 and 3 are a second tight pair; 4 is a "hub"
    // between the clusters: it shortlists members of both, but with
    // k=1 no cluster member shortlists the hub back
    val df = Seq(
      (0L, vec(1, 0.00, 0)),
      (1L, vec(1, 0.01, 0)),
      (2L, vec(0, 1, 0.00)),
      (3L, vec(0, 1, 0.01)),
      (4L, vec(1, 1, 0)) // equidistant hub
    ).toDF("vec_id", "embedding")
    val got = Cosine.mutualKnn(df, "vec_id", "embedding", k = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 1L), (2L, 3L)),
      s"hub edges must not survive the reciprocity filter: $got")
    // with k=4 everything shortlists everything → all C(5,2) pairs, once each
    val all = Cosine.mutualKnn(df, "vec_id", "embedding", k = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(all.length === 10 && all.toSet.size === 10)
    all.foreach { case (a, b) => assert(a < b) }
  }

  test("Embed.matryoshka: truncated-tier top-k equals brute force on the sliced vectors") {
    val emb = Tables.embeddings(spark, sf)
    val got = Embed.matryoshkaTopK(
      emb.where(col("vec_id") < 5), emb, "vec_id", "embedding", d = 16, k = 3)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet
    // reference: slice on the driver, exact cosine, top-3
    val all = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().map { case (id, v) => id -> v.take(16) }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val want = all.filter(_._1 < 5).flatMap { case (q, qv) =>
      all.filter(_._1 != q)
        .map { case (n, nv) => (q, n, cos(qv, nv)) }
        .sortBy { case (_, n, c) => (-c, n) }
        .take(3)
        .map { case (q2, n, c) => (q2, n, math.rint(c * 1e4) / 1e4) }
    }.toSet
    assert(got.map { case (q, n, _) => (q, n) } === want.map { case (q, n, _) => (q, n) })
    // truncation is real: 16-dim ranking differs somewhere from 64-dim
    val full = Cosine.topK(emb.where(col("vec_id") < 5), emb, "vec_id", "embedding", 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(got.map { case (q, n, _) => (q, n) } !== full,
      "16 of 64 dims should reorder at least one neighbor (else the test is vacuous)")
  }

  test("Cosine.nearDupPairs finds planted high-cosine pair only") {
    val df = Seq(
      (0L, vec(1, 2, 3)),
      (1L, vec(1.01, 2.01, 3.01)), // ~parallel to 0
      (2L, vec(-3, 1, 0))
    ).toDF("vec_id", "embedding")
    val pairs = Cosine
      .nearDupPairs(df, "vec_id", "embedding", threshold = 0.99)
      .select("id_a", "id_b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("Cosine.decontaminate: max-vs-probe cosine, hit flag, every corpus row covered") {
    val corpus = Seq(
      (0L, vec(1, 0, 0)),       // probe
      (1L, vec(0.99, 0.1, 0)),  // near probe 0 → hit
      (2L, vec(0, 1, 0)),       // orthogonal to both probes → clean
      (3L, vec(0, 0.98, 0.2)),  // near probe... no probe like this → clean
      (4L, vec(-1, 0.02, 0))    // anti-parallel to probe 0 → clean
    ).toDF("vec_id", "embedding")
    val probe = corpus.where($"vec_id" === 0L)
    val out = Cosine.decontaminate(corpus, probe, "vec_id", "embedding", threshold = 0.9,
        excludeSelfId = true)
      .select("vec_id", "max_probe_cos", "hit")
      .as[(Long, Double, Int)]
      .collect()
      .map(r => r._1 -> (r._2, r._3))
      .toMap
    // every corpus row except the probe itself is scored (self excluded)
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    // cross-corpus default: an id COLLISION with an unrelated probe set
    // must not suppress a hit — probe row reuses id 1 with doc 1's
    // vector; doc 1 must still be flagged
    val foreign = Seq((1L, vec(0.99, 0.1, 0))).toDF("vec_id", "embedding")
    val cross = Cosine.decontaminate(corpus, foreign, "vec_id", "embedding", threshold = 0.99)
      .select("vec_id", "hit").as[(Long, Int)].collect().toMap
    assert(cross(1L) == 1, s"id-colliding probe must still flag doc 1: $cross")
    assert(cross.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(out(1L)._2 == 1 && out(1L)._1 > 0.9)
    assert(out(2L)._2 == 0 && out(3L)._2 == 0 && out(4L)._2 == 0)
    // hand-check doc 1's cosine: dot(probe, v1)/norms
    val expect = 0.99 / math.sqrt(0.99 * 0.99 + 0.1 * 0.1)
    assert(math.abs(out(1L)._1 -
      BigDecimal(expect).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("AnnLsh recall vs brute force on real embeddings is reasonable") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val exact = Cosine
      .topK(queries, emb, "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // near-uniform random vectors are the hard case for LSH: use few
    // planes (coarse buckets) and many tables so candidate coverage of
    // true neighbors is high; this pins correctness, not speedup
    val approx = AnnLsh
      .topK(queries, emb, "vec_id", "embedding", dims = 64, k = 5, numPlanes = 4, numTables = 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("AnnIvf recall vs brute force with generous probing") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val exact = Cosine
      .topK(queries, emb, "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = AnnIvf
      .topK(queries, emb, "vec_id", "embedding", k = 5, numCentroids = 8, nProbe = 6)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("AnnIvf filtered search: exact at full probe, decent recall probed, pushed filter on the partitioned scan") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val pred = $"label".isin(1, 3)

    // exact mode (every cell probed) ≡ brute force over the filtered corpus
    val exact = Cosine
      .topK(queries, emb.where(pred), "vec_id", "embedding", k = 5)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet
    val full = AnnIvf
      .topKFiltered(queries, emb, "vec_id", "embedding", pred,
        k = 5, numCentroids = 8, nProbe = 8)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(full == exact, "full-probe filtered search must equal filtered brute force")

    // approximate mode: selective predicates thin the cells, so probe
    // generously; recall floor vs the filtered ground truth
    val approx = AnnIvf
      .topKFiltered(queries, emb, "vec_id", "embedding", pred,
        k = 5, numCentroids = 8, nProbe = 6)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val truth = exact.map(r => (r._1, r._2))
    val recall = truth.intersect(approx).size.toDouble / truth.size
    assert(recall >= 0.5, s"filtered recall $recall too low")

    // partitioned path: parity with the in-memory probe at the same
    // params, cid partition-pruned AND the label predicate pushed to
    // the parquet scan (row-group skipping at scale, not a post-scan
    // filter on materialized cells)
    val dir = java.nio.file.Files.createTempDirectory("ivf_cells_filt").toString
    val cents = AnnIvf.writePartitionedByCell(emb, "vec_id", "embedding", dir, numCentroids = 8)
    val part = AnnIvf.topKPartitionedFiltered(
      queries, cents, dir, "vec_id", "embedding", pred, k = 5, nProbe = 8)
    val got = part.select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(got == exact)
    val plan = part.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cid"), plan)
    val scanLine = plan.linesIterator.find(_.contains("PushedFilters: [In(label")
      ).orElse(plan.linesIterator.find(_.contains("PushedFilters")))
    assert(scanLine.exists(_.contains("label")),
      s"label predicate not pushed to the scan:\n$plan")
  }

  test("AnnIvf assigns every corpus vector to exactly one cell") {
    val emb = Tables.embeddings(spark, sf)
    val cents = AnnIvf.centroids(emb, "vec_id", "embedding", k = 8)
    val assigned = AnnIvf.assign(emb, cents, "vec_id", "embedding")
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
    assert(cents.count() == 8)
  }

  test("IVF cell-partitioned corpus: pruned scan, same results as in-memory probe") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val dir = java.nio.file.Files.createTempDirectory("ivf_cells").toString
    val cents = AnnIvf.writePartitionedByCell(emb, "vec_id", "embedding", dir, numCentroids = 8)

    val part = AnnIvf.topKPartitioned(queries, cents, dir, "vec_id", "embedding", k = 5, nProbe = 4)
    val got = part.select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet

    // identical to probing the in-memory corpus with the same centroids
    // (same deterministic seeding → same cells)
    val mem = AnnIvf
      .topK(emb.where($"vec_id" < 5), emb, "vec_id", "embedding",
        k = 5, numCentroids = 8, nProbe = 4)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(got == mem)

    // and the scan is partition-pruned: the cid filter shows up as a
    // PartitionFilters entry, not a post-scan filter
    part.collect()
    val plan = part.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cid"), plan)
  }

  test("IVF cell index persists via the catalog: fresh-open probe parity, wrong kind rejected") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val dataDir = java.nio.file.Files.createTempDirectory("ivf_cells_data").toString
    val idxDir = java.nio.file.Files.createTempDirectory("ivf_cells_idx").toString
    val cents = AnnIvf.writePartitionedByCellIndexed(
      emb, "vec_id", "embedding", dataDir, idxDir, numCentroids = 8)

    val direct = AnnIvf
      .topKPartitioned(queries, cents, dataDir, "vec_id", "embedding", k = 5, nProbe = 4)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet
    // served purely from the catalog entry — no in-session centroid
    // state, the fresh-session path
    val served = AnnIvf
      .topKIndexed(queries, idxDir, "vec_id", "embedding", k = 5, nProbe = 4)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(served == direct && served.nonEmpty)

    // a different catalog kind must be rejected on open
    val other = java.nio.file.Files.createTempDirectory("ivf_wrong").toString
    graft.sources.IndexCatalog.write(
      spark, other, "test_kind", Map(), Seq("p" -> Seq(1).toDF("x")))
    val e = intercept[IllegalArgumentException](AnnIvf.openCellIndex(spark, other))
    assert(e.getMessage.contains("kind"))
  }

  test("AnnLsh bucket assignment is deterministic") {
    val emb = Tables.embeddings(spark, sf).limit(20)
    val b1 = AnnLsh.bucketize(emb, "vec_id", "embedding", 64).select("vec_id", "table", "bucket")
      .as[(Long, Int, Long)].collect().toSet
    val b2 = AnnLsh.bucketize(emb, "vec_id", "embedding", 64).select("vec_id", "table", "bucket")
      .as[(Long, Int, Long)].collect().toSet
    assert(b1 == b2)
  }

  test("AnnPq encoding is lossless when corpus subvectors are the codebook") {
    // 4 dims, m=2 subspaces of dsub=2; vectors built from 2 distinct
    // subvector patterns per subspace -> k=2 codebook reconstructs
    // exactly, so ADC dot == exact dot
    val pats = Seq(vec(1, 0), vec(0, 2))
    val corpus = (for {
      a <- pats.indices; b <- pats.indices
    } yield ((a * 2 + b).toLong, (pats(a) ++ pats(b)))).toDF("vec_id", "embedding")
    val cb = AnnPq.train(corpus, "vec_id", "embedding", m = 2, k = 2, sampleN = 4, iters = 0)
    val codes = AnnPq.encode(corpus, "vec_id", "embedding", cb)
      .as[(Long, Array[Byte])].collect().toMap
    assert(codes.values.forall(_.length == 2)) // m bytes per vector
    assert(codes(0L).toSeq != codes(3L).toSeq)
    // distinct-seeded centroids land exactly on the two patterns and
    // Lloyd keeps them there, so ADC == exact for every pair
    val got = AnnPq.topK(
      corpus.where($"vec_id" === 0L), corpus, "vec_id", "embedding",
      k = 3, m = 2, kCent = 2, sampleN = 4)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect()
    val exact = Cosine.topK(
      corpus.where($"vec_id" === 0L), corpus, "vec_id", "embedding", k = 3)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect()
    assert(got.map(t => (t._1, t._2)).toSeq == exact.map(t => (t._1, t._2)).toSeq)
    got.zip(exact).foreach { case (g, e) => assert(math.abs(g._3 - e._3) < 1e-4) }
  }

  test("AnnPq recall vs brute force on real embeddings, with exact re-rank") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val exact = Cosine
      .topK(queries, emb, "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // random near-uniform vectors are PQ's hard case: generous m and a
    // wide re-rank shortlist pin correctness of the machinery
    val approx = AnnPq
      .topK(queries, emb, "vec_id", "embedding", k = 5, m = 16, kCent = 16,
        rerank = 50, sampleN = 512)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("AnnIvfPq recall vs brute force with residual codes and exact re-rank") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val exact = Cosine
      .topK(queries, emb, "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = AnnIvfPq
      .topK(queries, emb, "vec_id", "embedding", k = 5,
        numCentroids = 8, m = 16, kCent = 16, nProbe = 6, rerank = 50, sampleN = 512)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // same floor as the flat-PQ spec: the composition must not cost recall
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("AnnIvfPq partitioned probe: pruned code-sized scan, same results as in-memory") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    val index = AnnIvfPq.build(emb, "vec_id", "embedding",
      numCentroids = 8, m = 16, kCent = 16, sampleN = 512)
    AnnIvfPq.writePartitioned(emb, "vec_id", "embedding", index, dir)

    val part = AnnIvfPq.topKPartitioned(queries, index, dir, emb, "vec_id", "embedding",
      k = 5, nProbe = 4, rerank = 20)
    val got = part.select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet

    // the same index probed against the in-memory code table gives the
    // identical result set (deterministic training + encoding)
    val codes = AnnIvfPq.encode(emb, "vec_id", "embedding", index)
    val mem = AnnIvfPq.topKPartitioned(queries, index, dir, emb, "vec_id", "embedding",
      k = 5, nProbe = 4, rerank = 20) // second probe of the same layout: determinism
    assert(mem.select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet == got)
    assert(codes.count() == emb.count()) // every vector encoded exactly once

    // scan shape: the code-table scan is partition-pruned on cid AND
    // code-sized — it reads (vec_id, code, n2), never the embedding
    part.collect()
    val plan = part.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters: [cid"))
    assert(scanLine.isDefined, plan)
    assert(scanLine.get.contains("code:binary"), scanLine.get)
    assert(!scanLine.get.contains("embedding"), scanLine.get)
  }

  test("AnnIvfPq save/load index: fresh-session search over the stored layout is identical") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val codeDir = java.nio.file.Files.createTempDirectory("ivfpq_codes").toString
    val idxDir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    val index = AnnIvfPq.build(emb, "vec_id", "embedding",
      numCentroids = 8, m = 16, kCent = 16, sampleN = 512)
    AnnIvfPq.writePartitioned(emb, "vec_id", "embedding", index, codeDir)
    AnnIvfPq.saveIndex(spark, index, idxDir)

    val loaded = AnnIvfPq.loadIndex(spark, idxDir)
    // state round-trips exactly
    assert(loaded.cents.map(_._1).toSeq == index.cents.sortBy(_._1).map(_._1).toSeq)
    loaded.cents.sortBy(_._1).zip(index.cents.sortBy(_._1)).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq == b.toSeq)
    }
    assert(loaded.cb.m == index.cb.m && loaded.cb.k == index.cb.k &&
      loaded.cb.dsub == index.cb.dsub && loaded.cb.flat.toSeq == index.cb.flat.toSeq)
    // searching the stored codes with the LOADED index = with the original
    def run(ix: AnnIvfPq.Index) = AnnIvfPq
      .topKPartitioned(queries, ix, codeDir, emb, "vec_id", "embedding",
        k = 5, nProbe = 4, rerank = 20)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(run(loaded) == run(index) && run(loaded).nonEmpty)

    // per-cell variant round-trips too
    val pc = AnnIvfPq.buildPerCell(emb, "vec_id", "embedding",
      numCentroids = 8, m = 16, kCent = 16, samplePerCell = 256)
    val pcDir = java.nio.file.Files.createTempDirectory("ivfpq_pc").toString
    AnnIvfPq.saveIndexPerCell(spark, pc, pcDir)
    val pcLoaded = AnnIvfPq.loadIndexPerCell(spark, pcDir)
    assert(pcLoaded.cbs.map(_._1).toSeq == pc.cbs.sortBy(_._1).map(_._1).toSeq)
    pcLoaded.cbs.sortBy(_._1).zip(pc.cbs.sortBy(_._1)).foreach { case ((_, a), (_, b)) =>
      assert(a.m == b.m && a.k == b.k && a.dsub == b.dsub && a.flat.toSeq == b.flat.toSeq)
    }
  }

  test("AnnIvfPq.appendPartitioned: incremental docs are probed like a rebuild") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).limit(400)
    val old = emb.where($"vec_id" >= 10)
    val fresh = emb.where($"vec_id" < 10) // "today's crawl"
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_app").toString
    val index = AnnIvfPq.build(old, "vec_id", "embedding",
      numCentroids = 8, m = 16, kCent = 16, sampleN = 256)
    AnnIvfPq.writePartitioned(old, "vec_id", "embedding", index, dir)
    AnnIvfPq.appendPartitioned(fresh, "vec_id", "embedding", index, dir)

    // appended rows are present exactly once, in their assigned cells
    val codes = spark.read.parquet(dir)
    assert(codes.count() == 400)
    assert(codes.select("vec_id").distinct().count() == 400)

    // probing the appended layout == probing a from-scratch write of the
    // full corpus with the SAME index (codes are a pure function of the
    // index, so append ≡ rebuild)
    val dir2 = java.nio.file.Files.createTempDirectory("ivfpq_reb").toString
    AnnIvfPq.writePartitioned(emb, "vec_id", "embedding", index, dir2)
    val queries = emb.where($"vec_id" < 3)
    def probe(p: String) = AnnIvfPq
      .topKPartitioned(queries, index, p, emb, "vec_id", "embedding", k = 5, nProbe = 4, rerank = 20)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(probe(dir) == probe(dir2))
  }

  test("AnnIvfPq residual codes beat raw-vector codes at equal budget (quantization error)") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).limit(400)
    val index = AnnIvfPq.build(emb, "vec_id", "embedding",
      numCentroids = 8, m = 8, kCent = 16, sampleN = 256)
    // reconstruction error of the residual scheme: ‖v‖² − 2·q·v̂ + ‖v̂‖²
    // with q = v, both terms from the stored tables ⇒ mean over corpus
    val cbL = typedLit(index.cb.flat.toSeq)
    val resErr = AnnIvfPq
      .residuals(emb, index.centsDf(spark), "vec_id", "embedding")
      .withColumn("code", graft.functions.PqOps.encode(col("residual"), cbL, index.cb.dsub))
      .withColumn("lut", graft.functions.PqOps.lut(col("residual"), cbL, index.cb.dsub))
      .withColumn("n2r", graft.functions.PqOps.adc(col("code"), typedLit(index.cb.norm2Table.toSeq)))
      .withColumn("rdot", graft.functions.PqOps.adc(col("code"), col("lut")))
      .withColumn("verr",
        graft.functions.FloatVec.dot(col("residual"), col("residual"))
          - lit(2.0) * col("rdot") + col("n2r"))
      .agg(avg("verr")).head().getDouble(0)
    // flat PQ at the same (m, k) budget on the raw vectors
    val cbRaw = AnnPq.train(emb, "vec_id", "embedding", m = 8, k = 16, sampleN = 256)
    val cbRawL = typedLit(cbRaw.flat.toSeq)
    val rawErr = emb
      .withColumn("code", graft.functions.PqOps.encode(col("embedding"), cbRawL, cbRaw.dsub))
      .withColumn("lut", graft.functions.PqOps.lut(col("embedding"), cbRawL, cbRaw.dsub))
      .withColumn("n2r", graft.functions.PqOps.adc(col("code"), typedLit(cbRaw.norm2Table.toSeq)))
      .withColumn("rdot", graft.functions.PqOps.adc(col("code"), col("lut")))
      .withColumn("verr",
        graft.functions.FloatVec.dot(col("embedding"), col("embedding"))
          - lit(2.0) * col("rdot") + col("n2r"))
      .agg(avg("verr")).head().getDouble(0)
    assert(resErr >= 0.0 || math.abs(resErr) < 1e-9)
    assert(resErr <= rawErr, s"residual $resErr vs raw $rawErr")
  }

  test("AnnGraph: NN-Descent sweeps improve the LSH-seeded graph toward true k-NN") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).limit(300).persist()
    val k = 5
    // ground truth: every node's true k-NN (brute force, all 300 queries)
    val truth = Cosine.topK(emb, emb, "vec_id", "embedding", k = k)
      .select("qid", "nid").as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def edgeRecall(g: org.apache.spark.sql.DataFrame): Double = {
      val got = g.select("src", "dst").as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val per = truth.toSeq.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      per.sum / per.size
    }
    val seed = AnnGraph.lshSeedEdges(emb, "vec_id", "embedding", k = k, dims = 64)
    val g2 = AnnGraph.knnGraph(emb, "vec_id", "embedding", dims = 64, k = k, sweeps = 4)
    val rSeed = edgeRecall(seed)
    val r2 = edgeRecall(g2)
    // the whole point of NN-Descent: sweeps strictly improve on the seed
    assert(r2 >= rSeed, s"sweeps regressed: seed $rSeed -> $r2")
    println(s"[spec] AnnGraph edge recall: seed $rSeed -> 4 sweeps $r2")
    assert(r2 >= 0.5, s"graph edge recall $r2 too low")
    // k-NN graph shape: no self loops, <= k out-edges per node
    assert(g2.where($"src" === $"dst").count() == 0)
    val maxOut = g2.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxOut <= k)
    emb.unpersist()
  }

  test("AnnGraph.search recall vs brute force via beam expansion") {
    val emb = Tables.embeddings(spark, sf).limit(300)
    val queries = emb.where($"vec_id" < 5)
    val exact = Cosine
      .topK(queries, emb, "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = AnnGraph
      .topK(queries, emb, "vec_id", "embedding", dims = 64, k = 5,
        graphK = 8, sweeps = 2, beam = 12, hops = 4, entries = 6)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
    // exactly k rows per query, never the query itself
    val cnts = approx.groupBy(_._1).view.mapValues(_.size).toMap
    assert(cnts.values.forall(_ == 5), cnts.toString)
    assert(!approx.exists { case (q, n) => q == n })
  }

  test("persisted graph index: bucketed edge list, exchange-free index side, in-memory parity") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val g = AnnGraph.knnGraph(emb, "vec_id", "embedding", dims = 64, k = 6, sweeps = 1)
    AnnGraph.writeIndex(g, "graph_idx", buckets = 4)
    val queries = emb.where($"vec_id" < 5)

    // a fresh-session search over the table matches searching the
    // in-memory edge list exactly (the index IS the edge list)
    val fromMem = AnnGraph
      .search(queries, g, emb, "vec_id", "embedding", k = 3, beam = 8, hops = 2)
      .as[(Long, Long, Double)].collect().toSet
    val fromTbl = AnnGraph
      .searchIndexed(spark, queries, "graph_idx", emb, "vec_id", "embedding",
        k = 3, beam = 8, hops = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(fromMem == fromTbl)

    // the hop-expansion join shape at scale: when the frontier is big
    // enough to plan as a sort-merge join, ONLY the frontier moves —
    // the bucket layout already satisfies the index side's required
    // distribution (one Exchange total, on the frontier side)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val frontier = spark.range(0, 200).select($"id".as("nid"))
      val adj = AnnGraph.readIndex(spark, "graph_idx").select($"src".as("nid"), $"dst")
      val expand = frontier.join(adj, Seq("nid"))
      expand.collect()
      // AQE prints Final + Initial sections; assert on the final one
      val plan = expand.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected 1 exchange (frontier side only), got $exchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hierarchical graph index persists BOTH layers: fresh-session parity, no rebuild") {
    val emb = Tables.embeddings(spark, sf).limit(200)
    val queries = emb.where($"vec_id" < 5)
    AnnGraph.writeHierarchicalIndex(emb, "vec_id", "embedding", dims = 64,
      table = "graph_hidx", buckets = 4, graphK = 6, sweeps = 1, coarseEvery = 4)
    // both layers exist as bucketed tables
    assert(AnnGraph.readIndex(spark, "graph_hidx").count() > 0)
    assert(AnnGraph.readIndex(spark, "graph_hidx__coarse").count() > 0)
    // the table-backed layered search equals the in-memory layered
    // search exactly (deterministic build → identical edge lists)
    val fromTbl = AnnGraph.searchHierarchicalIndexed(spark, queries, "graph_hidx", emb,
      "vec_id", "embedding", k = 3, beam = 8, hops = 2, coarseEvery = 4, fullEntries = 3)
      .as[(Long, Long, Double)].collect().toSet
    val inMem = AnnGraph.topKHierarchical(queries, emb, "vec_id", "embedding", dims = 64,
      k = 3, graphK = 6, sweeps = 1, beam = 8, hops = 2, coarseEvery = 4, fullEntries = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(fromTbl == inMem)
    val cnts = fromTbl.groupBy(_._1).view.mapValues(_.size).toMap
    assert(cnts.values.forall(_ == 3), cnts.toString)
  }

  test("graph index catalog entry: serving params come from the entry, search parity") {
    // deterministic subset (limit() can pick different rows per action)
    val emb = Tables.embeddings(spark, sf).where($"vec_id" < 200)
    val queries = emb.where($"vec_id" < 5)
    val catDir = java.nio.file.Files.createTempDirectory("graph_cat").toString
    AnnGraph.writeHierarchicalCatalog(emb, "vec_id", "embedding", dims = 64,
      path = catDir, table = "graph_cidx", buckets = 4, graphK = 6, sweeps = 1, coarseEvery = 4)
    // the catalog records the build params the serving side must agree on
    val meta = graft.sources.IndexCatalog.open(spark, catDir, "ann_graph")
    assert(meta.prop("table") == "graph_cidx" && meta.propInt("coarse_every") == 4)
    // catalog-driven search (no re-passed params) == explicit indexed search
    val viaCat = AnnGraph.searchHierarchicalCatalog(spark, queries, catDir, emb,
      "vec_id", "embedding", k = 3, beam = 8, hops = 2, fullEntries = 3)
      .as[(Long, Long, Double)].collect().toSet
    val explicit = AnnGraph.searchHierarchicalIndexed(spark, queries, "graph_cidx", emb,
      "vec_id", "embedding", k = 3, beam = 8, hops = 2, coarseEvery = 4, fullEntries = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaCat == explicit && viaCat.nonEmpty)
  }

  test("SemanticDedup clusters planted embedding near-dups within cells only") {
    import org.apache.spark.sql.functions._
    // two tight cells; 1≈2≈3 are near-parallel (dups), 4 is alone in its
    // direction, 5≈6 dups in the second cell
    val df = Seq(
      (1L, "a", vec(1.0, 0.02, 0.0, 0.0)),
      (2L, "a", vec(1.0, 0.01, 0.01, 0.0)),
      (3L, "a", vec(0.99, 0.0, 0.02, 0.0)),
      (4L, "a", vec(0.5, 0.5, 0.5, 0.5)), // same cell, not a dup of 1-3
      (5L, "b", vec(0.0, 0.0, 1.0, 0.03)),
      (6L, "b", vec(0.0, 0.01, 1.0, 0.0))
    ).toDF("vec_id", "grp", "v")
    val cents = Embed.centroids(df, "v", "grp")
    val comp = SemanticDedup.components(df, cents, "vec_id", "v", threshold = 0.99, centIdCol = "grp")
      .as[(Long, Long)].collect().toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(4L) == 4L) // isolated: own component
    assert(comp(5L) == 5L && comp(6L) == 5L)
    val surv = SemanticDedup.survivors(df, cents, "vec_id", "v", threshold = 0.99, centIdCol = "grp")
      .as[Long].collect().toSet
    assert(surv == Set(1L, 4L, 5L))
  }

  test("semantic-dedup pair generation is blocked by cell — no cross product") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).limit(200)
    val cents = Embed.centroids(emb, "embedding", "label")
    val assigned = Embed.assign(emb, cents, "embedding", "vec_id")
    val v = emb.select(col("vec_id"), col("embedding"))
      .join(assigned.select(col("vec_id"), col("assigned").as("__cell")), Seq("vec_id"))
    val l = v.select(col("__cell"), col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val r = v.select(col("__cell"), col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val pairs = l.join(r, Seq("__cell")).where(col("id_a") < col("id_b"))
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
  }

  test("AnnGraph.appendToGraph: incremental docs join the graph without a rebuild") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf).limit(300).persist()
    val old = emb.where($"vec_id" >= 20)
    val fresh = emb.where($"vec_id" < 20)
    val g0 = AnnGraph.knnGraph(old, "vec_id", "embedding", dims = 64, k = 5, sweeps = 2)
    val g1 = AnnGraph.appendToGraph(g0, fresh, emb, "vec_id", "embedding",
      dims = 64, k = 5, sweeps = 1)
    // every new doc has out-edges; graph shape invariants hold
    val srcs = g1.select("src").distinct().as[Long].collect().toSet
    val freshIds = fresh.select("vec_id").as[Long].collect().toSet
    assert(freshIds.nonEmpty && freshIds.forall(srcs.contains), s"new docs missing from graph")
    assert(g1.where($"src" === $"dst").count() == 0)
    assert(g1.groupBy("src").count().agg(max("count")).head().getLong(0) <= 5)
    // old nodes only improved: per-node best edge score never decreases
    val best0 = g0.groupBy("src").agg(max("cos_sim").as("b")).as[(Long, Double)].collect().toMap
    val best1 = g1.groupBy("src").agg(max("cos_sim").as("b")).as[(Long, Double)].collect().toMap
    best0.foreach { case (n, b0) => assert(best1(n) >= b0 - 1e-12, s"node $n regressed") }
    // searching the appended graph finds the appended docs
    val queries = emb.where($"vec_id" < 3)
    val exact = Cosine.topK(queries, emb, "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val got = AnnGraph.search(queries, g1, emb, "vec_id", "embedding", k = 5,
      beam = 12, hops = 4, entries = 6)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall after append too low")
    emb.unpersist()
  }

  test("AnnGraph.topKHierarchical: coarse-layer entries keep recall at the flat floor") {
    val emb = Tables.embeddings(spark, sf).limit(300)
    val queries = emb.where($"vec_id" < 5)
    val exact = Cosine
      .topK(queries, emb, "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val hier = AnnGraph
      .topKHierarchical(queries, emb, "vec_id", "embedding", dims = 64, k = 5,
        graphK = 8, sweeps = 2, beam = 12, hops = 4, coarseEvery = 4, fullEntries = 6)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(hier).size.toDouble / exact.size
    assert(recall >= 0.5, s"hierarchical recall $recall too low")
    val cnts = hier.groupBy(_._1).view.mapValues(_.size).toMap
    assert(cnts.values.forall(_ == 5), cnts.toString)
    assert(!hier.exists { case (q, n) => q == n })
  }

  test("centroidsConverged: k-means|| + tolerance Lloyd separates the planted skew, deterministically") {
    import spark.implicits._
    // the P7g skew harness: a 400-point dominant cluster and a 60-point
    // far cluster — lowest-id seeding puts EVERY seed in the big one
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def frac(id: Long, d: Int): Float =
      (java.lang.Math.floorMod(mix(id * 131 + d), 2000L).toFloat / 1000f) - 1f
    val rows = (0L until 400L).map { id =>
      val v = new Array[Float](16)
      v(0) = 10f
      for (d <- 0 until 8) v(d) = v(d) + frac(id, d)
      (id, v.toSeq)
    } ++ (400L until 460L).map { id =>
      val v = new Array[Float](16)
      v(1) = 10f
      for (d <- 8 until 16) v(d) = frac(id, d)
      (id, v.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

    val fit = AnnIvf.centroidsConverged(corpus, "vec_id", "embedding", k = 2)
    // convergence is RECORDED: iterations actually run + final movement
    assert(fit.iters >= 1 && fit.iters <= 20, s"iters ${fit.iters}")
    assert(fit.lastShift < 1e-4 || fit.iters == 20, s"shift ${fit.lastShift}")
    // the two planted clusters land in two different cells, purely
    val cellOf = AnnIvf.assign(corpus, fit.cents, "vec_id", "embedding")
      .as[(Long, Long)].collect().toMap
    val bigCells = (0L until 400L).map(cellOf).toSet
    val smallCells = (400L until 460L).map(cellOf).toSet
    assert(bigCells.size == 1 && smallCells.size == 1 && bigCells != smallCells,
      s"big=$bigCells small=$smallCells")
    // reproducible: a second fit returns identical centroids
    val again = AnnIvf.centroidsConverged(corpus, "vec_id", "embedding", k = 2)
    val c1 = fit.cents.as[(Long, Seq[Float])].collect().toMap
    val c2 = again.cents.as[(Long, Seq[Float])].collect().toMap
    assert(c1 == c2)
  }

  test("per-cell PQ codebooks beat the global codebook on a skewed corpus") {
    import spark.implicits._
    // planted skew: a big cluster (ids 0-399) whose residuals vary in
    // dims 0-7, and a small far-away cluster (ids 400-459) whose
    // residuals vary ONLY in dims 8-15. The GLOBAL codebook trains on
    // the lowest-id sample — i.e. entirely on big-cluster residuals —
    // so the small cluster's residual directions quantize to ~zero and
    // its neighborhoods collapse. Per-cell training sees each cell's
    // own residuals.
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def frac(id: Long, d: Int): Float =
      (java.lang.Math.floorMod(mix(id * 131 + d), 2000L).toFloat / 1000f) - 1f
    val rows = (0L until 400L).map { id =>
      val v = new Array[Float](16)
      v(0) = 10f
      for (d <- 0 until 8) v(d) = v(d) + frac(id, d)
      (id, v.toSeq)
    } ++ (400L until 460L).map { id =>
      val v = new Array[Float](16)
      v(1) = 10f
      for (d <- 8 until 16) v(d) = frac(id, d)
      (id, v.toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val queries = corpus.where($"vec_id" >= 400L && $"vec_id" < 410L)

    val exact = Cosine.topK(queries, corpus, "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val a = approx.select("qid", "nid").as[(Long, Long)].collect().toSet
      exact.intersect(a).size.toDouble / exact.size
    }
    val rGlobal = recall(AnnIvfPq.topK(queries, corpus, "vec_id", "embedding",
      k = 5, numCentroids = 2, m = 4, kCent = 8, nProbe = 2, sampleN = 256))
    val rPerCell = recall(AnnIvfPq.topKPerCell(queries, corpus, "vec_id", "embedding",
      k = 5, numCentroids = 2, m = 4, kCent = 8, nProbe = 2, samplePerCell = 256))
    info(s"skewed-corpus recall: global=$rGlobal perCell=$rPerCell")
    assert(rPerCell >= rGlobal,
      s"per-cell recall $rPerCell below global $rGlobal on the skewed corpus")
    assert(rPerCell >= 0.6, s"per-cell recall $rPerCell below floor")
    // index state stays driver-bounded: #cells × (m·k·dsub) codebook floats
    val idx = AnnIvfPq.buildPerCell(corpus, "vec_id", "embedding",
      numCentroids = 2, m = 4, kCent = 8, samplePerCell = 256)
    assert(idx.cbs.length == 2)
    assert(idx.cbs.forall(_._2.flat.length == 4 * 8 * 4))
  }

  test("AnnPq training is deterministic") {
    val emb = Tables.embeddings(spark, sf).limit(100)
    val cb1 = AnnPq.train(emb, "vec_id", "embedding", m = 8, k = 4, sampleN = 64)
    val cb2 = AnnPq.train(emb, "vec_id", "embedding", m = 8, k = 4, sampleN = 64)
    assert(cb1.flat.toSeq == cb2.flat.toSeq)
    assert(cb1.dsub * cb1.m == 64) // embeddings are 64-dim
  }

  test("Embed.centroids mean-pools per group in one pass; normalize gives unit norm") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "a", vec(1.0, 0.0, 3.0)),
      (2L, "a", vec(3.0, 2.0, 1.0)),
      (3L, "b", vec(0.0, 4.0, 0.0))
    ).toDF("id", "grp", "v").repartition(3)
    val cents = Embed.centroids(df, "v", "grp")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    assert(cents("a")._1 == 2L)
    assert(cents("a")._2 == Seq(2.0, 1.0, 2.0))
    assert(cents("b")._2 == Seq(0.0, 4.0, 0.0))
    val normed = df.select(Embed.normalized(col("v")).as("u"))
      .collect().map(_.getSeq[Double](0))
    for (u <- normed)
      assert(math.abs(u.map(x => x * x).sum - 1.0) < 1e-9)
    // zero vector stays zero, no NaN
    val z = Seq((1L, vec(0.0, 0.0))).toDF("id", "v")
      .select(Embed.normalized(col("v")).as("u")).head().getSeq[Double](0)
    assert(z == Seq(0.0, 0.0))
  }

  test("Embed.assign routes vectors to the nearest centroid by cosine") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, 0, vec(1.0, 0.1, 0.0)),
      (2L, 0, vec(0.9, 0.0, 0.1)),
      (3L, 1, vec(0.0, 1.0, 0.1)),
      (4L, 1, vec(0.1, 0.9, 0.0))
    ).toDF("id", "grp", "v")
    val cents = Embed.centroids(df, "v", "grp")
    val got = Embed.assign(df, cents, "v", "id", centIdCol = "grp")
      .select("id", "assigned").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1))
  }

  // OPQ's target regime: ALL the energy piled into raw-PQ's first
  // subspace (dims 0..3 of 16, m=4), dust elsewhere — the blind split
  // must cover a fat 4-D cloud with k centroids while the other three
  // subspaces quantize noise
  private def opqCloud: Seq[(Long, Array[Float])] = {
    val amp = Array(4.0, 3.0, 2.5, 2.0)
    (0 until 600).map { i =>
      val v = Array.tabulate(16) { d =>
        if (d < 4) amp(d) * math.sin(i * (0.37 + 0.11 * d) + d)
        else 0.05 * math.sin(i * 1.1 * (d + 1))
      }
      (i.toLong, v.map(_.toFloat))
    }
  }

  test("Opq rotation: orthonormal, dot/norm-preserving, variance-balanced allocation") {
    val df = opqCloud.toDF("id", "v")
    val rot = Opq.fit(df, "v", m = 4, dims = 16)
    assert(rot.dim == 16 && rot.rows.length == 16)
    // R Rᵀ = I
    for (i <- 0 until 16; j <- 0 until 16) {
      val d = graft.ml.LinAlg.dot(rot.rows(i), rot.rows(j))
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"RRt($i,$j)=$d")
    }
    // allocation spreads the four fat eigendirections one per subspace
    val fatPerSub = rot.allocation.grouped(4).map(_.count(_ < 4)).toSeq
    assert(fatPerSub == Seq(1, 1, 1, 1), s"allocation $fatPerSub")
    // the applied rotation preserves the inner-product geometry exactly
    val pairs = df.limit(40)
      .select($"v", rot(col("v")).as("rv")).collect()
      .map(r => (r.getSeq[Float](0).toArray, r.getSeq[Float](1).toArray))
    for (((x, rx), (y, ry)) <- pairs.zip(pairs.reverse)) {
      def dotF(a: Array[Float], b: Array[Float]) =
        a.zip(b).map { case (p, q) => p.toDouble * q }.sum
      assert(math.abs(dotF(x, y) - dotF(rx, ry)) < 1e-3)
    }
  }

  test("Opq.topK beats plain AnnPq recall on the unbalanced-subspace corpus") {
    val df = opqCloud.toDF("id", "v")
    val queries = df.where($"id" < 20)
    val exact = Cosine.topK(queries, df, "id", "v", k = 10)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    def recallOf(got: Set[(Long, Long)]) = exact.intersect(got).size.toDouble / exact.size
    val raw = recallOf(AnnPq.topK(queries, df, "id", "v", k = 10, m = 4, kCent = 16, sampleN = 600)
      .select("qid", "nid").as[(Long, Long)].collect().toSet)
    val rotated = recallOf(
      Opq.topK(queries, df, "id", "v", dims = 16, k = 10, m = 4, kCent = 16, sampleN = 600)
        .select("qid", "nid").as[(Long, Long)].collect().toSet)
    info(s"recall raw=$raw rotated=$rotated")
    assert(rotated >= raw, s"rotated $rotated < raw $raw")
    assert(rotated >= 0.7, s"rotated recall $rotated too low")
  }

  test("Opq save/load index: state round-trips exactly; loaded-index search is identical") {
    val df = opqCloud.toDF("id", "v")
    val queries = df.where($"id" < 20)
    val index = Opq.build(df, "id", "v", dims = 16, m = 4, kCent = 16, sampleN = 600)
    val dir = java.nio.file.Files.createTempDirectory("opq_idx").toString
    Opq.saveIndex(spark, index, dir)
    val loaded = Opq.loadIndex(spark, dir)
    // rotation + codebook round-trip exactly (a re-trained rotation
    // would score codes encoded under the old one as garbage)
    assert(loaded.rot.dim == index.rot.dim && loaded.rot.m == index.rot.m)
    assert(loaded.rot.rows.map(_.toSeq).toSeq == index.rot.rows.map(_.toSeq).toSeq)
    assert(loaded.rot.eigenvalues.toSeq == index.rot.eigenvalues.toSeq)
    assert(loaded.rot.allocation.toSeq == index.rot.allocation.toSeq)
    assert(loaded.cb.flat.toSeq == index.cb.flat.toSeq &&
      loaded.cb.m == index.cb.m && loaded.cb.k == index.cb.k && loaded.cb.dsub == index.cb.dsub)
    // fresh-session serve path: searching with the LOADED index = original
    def run(ix: Opq.Index) =
      Opq.topKWith(queries, df, "id", "v", ix, k = 10, rerank = 30)
        .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(run(loaded) == run(index) && run(loaded).nonEmpty)
  }

  test("Embed.standardizer: driver-parity z-scores; constant dims center without dividing") {
    val data = (0 until 200).map { i =>
      // dim 2 is CONSTANT (σ = 0 → centered-only path)
      (i.toLong, Array(2.0f + i % 7, -1.0f + (i % 3) * 0.5f, 4.25f))
    }
    val df = data.toDF("id", "v")
    val (mu, sd, tf) = Embed.standardizer(df, "v")
    // driver reference
    val cols = (0 until 3).map(d => data.map(_._2(d).toDouble))
    val muRef = cols.map(c => c.sum / c.length)
    val sdRef = cols.zip(muRef).map { case (c, m) =>
      math.sqrt(c.map(x => (x - m) * (x - m)).sum / (c.length - 1)) }
    mu.zip(muRef).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    sd.zip(sdRef).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    assert(sd(2) == 0.0)
    val out = df.select($"id", tf($"v").as("z")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for ((id, v) <- data.take(25)) {
      for (d <- 0 until 2)
        assert(math.abs(out(id)(d) - (v(d) - muRef(d)) / sdRef(d)) < 1e-9)
      assert(out(id)(2) == 4.25 - mu(2)) // centered, not divided
    }
  }

  // deterministic anisotropic cloud: strong planted direction u, weaker
  // orthogonal direction w, tiny residual in the remaining dims
  private def pcaCloud: Seq[(Long, Array[Float])] = {
    val u = Array(0.8, 0.6, 0.0, 0.0)
    val w = Array(-0.6, 0.8, 0.0, 0.0)
    (0 until 400).map { i =>
      val t = 3.0 * math.sin(i * 0.7)          // big variance along u
      val s = 1.0 * math.cos(i * 1.3)          // smaller along w
      val r1 = 0.05 * math.sin(i * 2.9)        // dust
      val r2 = 0.05 * math.cos(i * 3.7)
      val v = Array.tabulate(4)(d => t * u(d) + s * w(d) +
        (if (d == 2) r1 else if (d == 3) r2 else 0.0) + (if (d == 0) 1.5 else 0.0))
      (i.toLong, v.map(_.toFloat))
    }
  }

  test("Pca.fit matches a driver-side dense covariance fit exactly; planted direction recovered") {
    val data = pcaCloud
    val df = data.toDF("id", "v")
    val m = Pca.fit(df, "v", k = 2)
    assert(m.dim == 4 && m.n == 400)

    // dense reference from the same rows (float-cast, like the aggregate saw)
    val rows = data.map(_._2.map(_.toDouble))
    val n = rows.length
    val mean = Array.tabulate(4)(d => rows.map(_(d)).sum / n)
    val cov = Array.tabulate(4, 4) { (a, b) =>
      rows.map(r => (r(a) - mean(a)) * (r(b) - mean(b))).sum / (n - 1)
    }
    val (vals, vecs) = graft.ml.LinAlg.symEigen(cov)
    m.mean.zip(mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6) }
    m.eigenvalues.zip(vals.take(2)).foreach { case (a, b) =>
      assert(math.abs(a - b) / b < 1e-6)
    }
    // top component is ±u (planted); sign convention makes it comparable
    val u = Array(0.8, 0.6, 0.0, 0.0)
    val align = math.abs(graft.ml.LinAlg.dot(m.components(0), u))
    assert(align > 0.999, s"top-component alignment $align")
    assert(m.varianceExplained.sum > 0.99) // dust dims carry < 1%
  }

  test("Pca / standardizer save+load: state round-trips exactly, reloaded transforms identical") {
    val df = pcaCloud.toDF("id", "v")
    val m = Pca.fit(df, "v", k = 2)
    val dir = java.nio.file.Files.createTempDirectory("pca_idx").toString
    Pca.saveModel(spark, m, dir)
    val lm = Pca.loadModel(spark, dir)
    assert(lm.dim == m.dim && lm.n == m.n && lm.totalVariance == m.totalVariance)
    assert(lm.mean.toSeq == m.mean.toSeq && lm.eigenvalues.toSeq == m.eigenvalues.toSeq)
    assert(lm.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq)
    // the reloaded transform is the SAME column expression → identical output
    val a = df.select(m.transform(col("v"), whiten = true).as("p")).collect().map(_.getSeq[Double](0))
    val b = df.select(lm.transform(col("v"), whiten = true).as("p")).collect().map(_.getSeq[Double](0))
    assert(a.zip(b).forall { case (x, y) => x == y })

    val (mu, sd, tf) = Embed.standardizer(df, "v")
    val sDir = java.nio.file.Files.createTempDirectory("std_idx").toString
    Embed.saveStandardizer(spark, mu, sd, sDir)
    val (mu2, sd2, tf2) = Embed.loadStandardizer(spark, sDir)
    assert(mu2.toSeq == mu.toSeq && sd2.toSeq == sd.toSeq)
    val za = df.select(tf(col("v")).as("z")).collect().map(_.getSeq[Double](0))
    val zb = df.select(tf2(col("v")).as("z")).collect().map(_.getSeq[Double](0))
    assert(za.zip(zb).forall { case (x, y) => x == y })

    // wrong-kind cross-load fails loudly (the catalog's point)
    val err = intercept[IllegalArgumentException](Pca.loadModel(spark, sDir))
    assert(err.getMessage.contains("standardizer"), err.getMessage)
  }

  test("Pca.transform: projection parity, per-component variance = eigenvalue, whitening") {
    val data = pcaCloud
    val df = data.toDF("id", "v")
    val m = Pca.fit(df, "v", k = 2)
    val projs = df.select(col("id"), m.transform(col("v")).as("p")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // row-local parity with a scala dot product (float-literal components)
    for ((id, vec) <- data.take(20)) {
      val expect = m.components.map { c =>
        val cf = c.map(_.toFloat)
        vec.zip(cf).map { case (a, b) => (a * b).toDouble }.sum -
          c.zip(m.mean).map { case (ci, mi) => ci * mi }.sum
      }
      expect.zip(projs(id)).foreach { case (e, g) => assert(math.abs(e - g) < 1e-3) }
    }
    // projected coordinates: mean ~0, variance ~eigenvalue, decorrelated
    val ps = data.map(d => projs(d._1))
    for (c <- 0 until 2) {
      val xs = ps.map(_(c))
      val mu = xs.sum / xs.length
      val va = xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
      assert(math.abs(mu) < 1e-4)
      assert(math.abs(va - m.eigenvalues(c)) / m.eigenvalues(c) < 1e-3)
    }
    val cross = ps.map(p => p(0) * p(1)).sum / (ps.length - 1)
    assert(math.abs(cross) < 0.02 * m.eigenvalues.head)
    // whitened: unit variance per component
    val wh = df.select(col("id"), m.transform(col("v"), whiten = true).as("p")).collect()
      .map(r => r.getSeq[Double](1).toArray)
    for (c <- 0 until 2) {
      val mu = wh.map(_(c)).sum / wh.length
      val va = wh.map(x => (x(c) - mu) * (x(c) - mu)).sum / (wh.length - 1)
      assert(math.abs(va - 1.0) < 1e-3)
    }
  }

  test("AnnSq8: decode error bounded by scale/2; boundary values exact; fused adc ≡ decode-then-dot") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val b = AnnSq8.fit(emb, "embedding")
    assert(b.scales.forall(_ >= 0f))
    val lit = typedLit(b.flat)
    val checked = emb
      .select(
        col("embedding"),
        graft.functions.Sq8Ops.decode(
          graft.functions.Sq8Ops.encode(col("embedding"), lit), lit).as("rec"),
        graft.functions.Sq8Ops.adcDot(
          col("embedding"),
          graft.functions.Sq8Ops.encode(col("embedding"), lit), lit).as("adc"))
      .collect()
    checked.foreach { r =>
      val x = r.getSeq[Float](0)
      val rec = r.getSeq[Float](1)
      // per-dim reconstruction error ≤ scale/2 (+ float eps)
      x.indices.foreach { i =>
        val tol = b.scales(i) / 2f + 1e-4f
        assert(math.abs(x(i) - rec(i)) <= tol, s"dim $i: ${x(i)} vs ${rec(i)} tol $tol")
      }
      // the fused adc loop is EXACTLY dot(x, rec) — same float rounding
      val dot = x.indices.foldLeft(0.0)((s, i) => s + x(i).toDouble * rec(i).toDouble)
      assert(math.abs(r.getDouble(2) - dot) < 1e-12)
    }
    // min and max of every dimension land exactly on codes 0 and 255
    val minMax = emb
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("lo"), max("x").as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getFloat(1), r.getFloat(2))).toMap
    minMax.foreach { case (d, (lo, hi)) =>
      assert(math.abs(lo - b.mins(d)) == 0f)
      assert(math.abs((b.mins(d) + 255f * b.scales(d)) - hi) <= b.scales(d) * 1e-3f + 1e-6f)
    }
  }

  test("AnnSq8 recall vs brute force: near-exact without re-rank, exact-set with re-rank") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val exact = Cosine
      .topK(queries, emb, "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // 8-bit per-dim quantization is near-lossless: demand a HIGH floor
    // even with no re-rank (PQ's floor is 0.5; SQ8 must beat it)
    val noRerank = AnnSq8
      .topK(queries, emb, "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall0 = exact.intersect(noRerank).size.toDouble / exact.size
    assert(recall0 >= 0.8, s"no-rerank recall $recall0 too low for 8-bit")
    val reranked = AnnSq8
      .topK(queries, emb, "vec_id", "embedding", k = 5, rerank = 25)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall1 = exact.intersect(reranked).size.toDouble / exact.size
    assert(recall1 >= 0.95, s"reranked recall $recall1")
  }

  test("AnnSq8 save/load index: bounds round-trip exactly; loaded-index search identical; wrong kind rejected") {
    val emb = Tables.embeddings(spark, sf)
    val b = AnnSq8.fit(emb, "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-sq8").toString
    AnnSq8.saveIndex(spark, b, dir)
    val b2 = AnnSq8.loadIndex(spark, dir)
    assert(b2.dims == b.dims)
    assert(b2.mins.sameElements(b.mins) && b2.scales.sameElements(b.scales))
    val queries = emb.where($"vec_id" < 3)
    val a = AnnSq8.topKWith(queries, emb, "vec_id", "embedding", b, k = 4, rerank = 10)
      .collect().map(_.toSeq).toSet
    val c = AnnSq8.topKWith(queries, emb, "vec_id", "embedding", b2, k = 4, rerank = 10)
      .collect().map(_.toSeq).toSet
    assert(a == c)
    intercept[IllegalArgumentException](graft.sim.Opq.loadIndex(spark, dir))
  }

  test("HashEmbed: unit norm, partition-invariant bit-for-bit, similarity ranks token overlap") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (0L, "spark shuffles data between stages during wide transformations"),
      (1L, "spark shuffles data between stages during wide operations"), // near-copy of 0
      (2L, "an entirely unrelated sentence about gardening and tomato plants"),
      (3L, "")
    ).toDF("doc_id", "text")
    val emb = HashEmbed.embed(docs, "text", "doc_id", dims = 32)
    val byId = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def nrm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(nrm(byId(0L)) - 1.0) < 1e-12)
    // empty doc: the single empty-string token still hashes somewhere,
    // so the vector is a unit impulse — never NaN
    assert(!byId(3L).exists(_.isNaN))

    def cos(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    val near = cos(byId(0L), byId(1L))
    val far = cos(byId(0L), byId(2L))
    assert(near > 0.7 && near > far + 0.3, s"near=$near far=$far")

    // integer cells -> identical bits on any partitioning
    val again = HashEmbed.embed(docs.repartition(7), "text", "doc_id", dims = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(byId == again)
  }

  test("HashEmbed.embedF feeds the ANN stack: SQ8 top-k over hashed text embeddings matches brute force") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val emb = HashEmbed.embedF(docs, "text", "doc_id", dims = 64).persist()
    val queries = emb.where($"doc_id" < 3)
    val exact = Cosine.topK(queries, emb, "doc_id", "embedding", k = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val viaSq8 = AnnSq8.topK(queries, emb, "doc_id", "embedding", k = 3, rerank = 15)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(viaSq8).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
    emb.unpersist()
  }

  test("sq8 SQL surface ≡ DataFrame expressions bit-for-bit") {
    import org.apache.spark.sql.functions._
    graft.sql.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf).limit(50)
    val b = AnnSq8.fit(emb, "embedding")
    val lit = typedLit(b.flat)
    emb.createOrReplaceTempView("sq8_emb")
    val boundsSql = b.flat.map(f => s"cast('$f' as float)").mkString("array(", ",", ")")
    val viaSql = spark.sql(
      s"""SELECT vec_id,
         |  sq8_adc_dot(embedding, sq8_encode(embedding, $boundsSql), $boundsSql) AS adc,
         |  sq8_decode(sq8_encode(embedding, $boundsSql), $boundsSql) AS rec
         |FROM sq8_emb""".stripMargin)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Float](2))).toMap
    val viaDf = emb
      .select(
        col("vec_id"),
        graft.functions.Sq8Ops.adcDot(
          col("embedding"), graft.functions.Sq8Ops.encode(col("embedding"), lit), lit).as("adc"),
        graft.functions.Sq8Ops.decode(
          graft.functions.Sq8Ops.encode(col("embedding"), lit), lit).as("rec"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Float](2))).toMap
    assert(viaSql == viaDf)
  }

  test("BinaryPack: 32 sign bits per word, every word below 2^32, hand-checked bits") {
    import org.apache.spark.sql.functions._
    // dims 0, 33, 63 negative → word0 bit0, word1 bits 1 and 31
    val v = Array.tabulate(64)(i => if (i == 0 || i == 33 || i == 63) -1f else 1f)
    val words = Seq(Tuple1(v)).toDF("v")
      .select(graft.functions.BitOps.pack(col("v"))).head().getSeq[Long](0)
    assert(words === Seq(1L, (1L << 1) | (1L << 31)))
    assert(words.forall(w => w >= 0 && w < (1L << 32)))
  }

  test("Hamming: zero on self, d on complement, symmetric, matches a hand count") {
    import org.apache.spark.sql.functions._
    val a = Array.tabulate(64)(i => if (i % 3 == 0) -1f else 1f)
    val b = Array.tabulate(64)(i => if (i % 5 == 0) -1f else 1f)
    val df = Seq((a, b)).toDF("a", "b").select(
      graft.functions.BitOps.hamming(
        graft.functions.BitOps.pack(col("a")), graft.functions.BitOps.pack(col("a"))).as("self"),
      graft.functions.BitOps.hamming(
        graft.functions.BitOps.pack(col("a")),
        graft.functions.BitOps.pack(transform(col("a"), x => -x))).as("comp"),
      graft.functions.BitOps.hamming(
        graft.functions.BitOps.pack(col("a")), graft.functions.BitOps.pack(col("b"))).as("ab"),
      graft.functions.BitOps.hamming(
        graft.functions.BitOps.pack(col("b")), graft.functions.BitOps.pack(col("a"))).as("ba"))
    val r = df.head()
    assert(r.getAs[Long]("self") === 0L)
    assert(r.getAs[Long]("comp") === 64L)
    assert(r.getAs[Long]("ab") === r.getAs[Long]("ba"))
    // hand count: sign differs where exactly one of (i%3==0, i%5==0)
    val expect = (0 until 64).count(i => (i % 3 == 0) ^ (i % 5 == 0))
    assert(r.getAs[Long]("ab") === expect.toLong)
  }

  test("AnnBinary pure-Hamming top-k ≡ window brute force, partition-invariant") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    def run(parts: Int) = AnnBinary
      .topK(queries, emb.repartition(parts), "vec_id", "embedding", k = 4)
      .select("qid", "nid", "hamming").as[(Long, Long, Long)].collect().toSet
    val got = run(1)
    assert(got === run(7))
    val packed = emb.select(
      col("vec_id"), graft.functions.BitOps.pack(col("embedding")).as("bits"))
    val ref = packed.select(col("vec_id").as("qid"), col("bits").as("qb"))
      .where(col("qid") < 5)
      .crossJoin(packed.select(col("vec_id").as("nid"), col("bits").as("nb")))
      .where(col("qid") =!= col("nid"))
      .withColumn("hamming", graft.functions.BitOps.hamming(col("qb"), col("nb")))
      .withColumn("r", row_number().over(
        Window.partitionBy("qid").orderBy(col("hamming"), col("nid"))))
      .where(col("r") <= 4)
      .select("qid", "nid", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(got === ref)
  }

  test("AnnBinary persisted codes: served search ≡ in-memory, append visible, guards loud") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val head = emb.where($"vec_id" < 400)
    val tail = emb.where($"vec_id" >= 400)
    val queries = emb.where($"vec_id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("bin_ann").toString
    AnnBinary.saveCodes(spark, head, "vec_id", "embedding", dir, dims = 64)
    AnnBinary.appendCodes(spark, tail, "vec_id", "embedding", dir)
    val served = AnnBinary
      .topKIndexed(spark, queries, emb, "vec_id", "embedding", dir, k = 4, shortlist = 30)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet
    val mem = AnnBinary
      .topK(queries, emb, "vec_id", "embedding", k = 4, shortlist = 30)
      .select("qid", "nid", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(served === mem)
    assert(served.exists(_._2 >= 400), "appended codes never searched")
    val e1 = intercept[Exception] {
      graft.sources.IndexCatalog.open(spark, dir, "sq8")
    }
    assert(e1.getMessage.contains("kind"))
    val shortQ = Seq((99L, Array.fill(32)(1.0f))).toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      AnnBinary.topKIndexed(spark, shortQ, emb, "vec_id", "embedding", dir,
        k = 2, shortlist = 10).collect()
    }
    val chain = Iterator.iterate[Throwable](e2)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString("|")
    assert(chain.contains("dims"), chain.take(300))
  }

  test("multi-probe LSH: probe set = base + single-bit flips; recall beats single-probe at equal tables") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val one = emb.where($"vec_id" === 0)
    val probes = one.select(
      AnnLsh.probeBuckets(col("embedding"), 64, numPlanes = 8, table = 1, numProbes = 5).as("pb"),
      AnnLsh.bucket(col("embedding"), 64, numPlanes = 8, table = 1).as("base"))
      .head()
    val pb = probes.getSeq[Long](0)
    val base = probes.getLong(1)
    assert(pb.length === 5)
    assert(pb.head === base)
    assert(pb.distinct.length === 5)
    pb.tail.foreach { b =>
      assert(java.lang.Long.bitCount(b ^ base) === 1, s"probe $b not 1 flip from $base")
    }

    val queries = emb.where($"vec_id" < 5)
    val exact = Cosine.topK(queries, emb, "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val s = df.select("qid", "nid").as[(Long, Long)].collect().toSet
      exact.intersect(s).size.toDouble / exact.size
    }
    // near-uniform vectors are LSH's hard case (the P7 spec note):
    // coarse buckets, few tables — multi-probe must claw recall back
    val single = recall(AnnLsh.topK(
      queries, emb, "vec_id", "embedding", dims = 64, k = 5, numPlanes = 4, numTables = 4))
    val multi = recall(AnnLsh.topKMultiProbe(
      queries, emb, "vec_id", "embedding", dims = 64, k = 5,
      numPlanes = 4, numTables = 4, numProbes = 5))
    assert(multi >= single, s"multi-probe recall $multi below single-probe $single")
    assert(multi >= 0.5, s"multi-probe recall $multi too low")
  }

  test("embedIdf: rare-term overlap beats stopword overlap (the washout fix); unit norm; raw embed lacks the property here") {
    import org.apache.spark.sql.functions._
    val md5 = graft.functions.SharedHash.md5Long60 _
    // q shares ONLY the rare token 'zyzzyva' with a; r shares ONLY
    // ubiquitous filler with a. Filler appears in every doc (df = N),
    // rare tokens in two docs.
    val fill = "the of and to in is"
    val docs = (Seq(
      (1L, s"zyzzyva qat xylo $fill"),
      (2L, "zyzzyva qat xylo umiaq"),
      (3L, s"$fill $fill")
    ) ++ (4L to 20L).map(i => (i, fill))).toDF("doc_id", "text")
    def cos(emb: Map[Long, Seq[Double]], i: Long, j: Long): Double =
      emb(i).zip(emb(j)).map { case (x, y) => x * y }.sum
    val idf = HashEmbed.embedIdf(docs, "text", "doc_id", 64, tokenHash = md5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    idf.values.foreach(v => assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12))
    assert(cos(idf, 1L, 2L) > cos(idf, 1L, 3L),
      s"idf: rare-term pair ${cos(idf, 1L, 2L)} should beat stopword pair ${cos(idf, 1L, 3L)}")
    // raw counts: the stopword mass dominates doc 1, so the stopword
    // pair wins — the exact failure embedIdf exists to fix
    val raw = HashEmbed.embed(docs, "text", "doc_id", 64, tokenHash = md5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(cos(raw, 1L, 3L) > cos(raw, 1L, 2L))
  }

  test("DocEmbed: pooled = normalized chunk-vector sum, single-chunk identity, unit norm, chunk count") {
    import org.apache.spark.sql.functions._
    val md5 = graft.functions.SharedHash.md5Long60 _
    // doc 1: 35 tokens -> exactly 2 chunks at size 20 / stride 15;
    // doc 2: 5 tokens -> 1 chunk
    val longText = (0 until 35).map(i => s"w$i").mkString(" ")
    val shortText = "a b c d e"
    val docs = Seq((1L, longText), (2L, shortText)).toDF("doc_id", "text")
    val pooled = DocEmbed.pooled(docs, "text", "doc_id", dims = 64)
      .collect().map(r => r.getLong(0) -> (
        r.getSeq[Double](r.fieldIndex("embedding")), r.getLong(r.fieldIndex("n_chunks"))))
      .toMap
    assert(pooled(1L)._2 === 2L)
    assert(pooled(2L)._2 === 1L)
    // unit norm
    pooled.values.foreach { case (v, _) =>
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12)
    }
    // hand pooling: embed the two chunks separately, sum, normalize
    val chunks = Seq(
      (10L, (0 until 20).map(i => s"w$i").mkString(" ")),
      (11L, (15 until 35).map(i => s"w$i").mkString(" "))).toDF("cid", "text")
    val cvecs = HashEmbed.embed(chunks, "text", "cid", 64, tokenHash = md5)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val sum = cvecs(10L).zip(cvecs(11L)).map { case (a, b) => a + b }
    val n = math.sqrt(sum.map(x => x * x).sum)
    val expect = sum.map(_ / n)
    pooled(1L)._1.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"$g vs $e")
    }
    // single-chunk doc: pooled == its chunk embedding exactly
    val single = HashEmbed.embed(
      Seq((2L, shortText)).toDF("doc_id", "text"), "text", "doc_id", 64, tokenHash = md5)
      .head().getSeq[Double](1)
    pooled(2L)._1.zip(single).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12)
    }
  }

  test("DocEmbed.topK / HardNegatives.mine materialize the shared embed frame once") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    // the pooled/labeled embedding frame fans out to probe + corpus
    // branches; it must be checkpointed, so the served plan reads a
    // LogicalRDD leaf and contains NO chunk/token Generate (explode) —
    // the upstream pipeline already ran, exactly once
    val docs = (1 to 12).map(i =>
      (i.toLong, (0 until 30).map(j => s"w${(i * 31 + j) % 40}").mkString(" ")))
      .toDF("doc_id", "text")
    val probe = docs.where(col("doc_id") === 1).select("doc_id")
    // a Generate over anything but TopK's own __topk serving explode
    // means the chunk/token pipeline is still in the lazy plan
    def pipelineGenerates(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case g: Generate if !g.generator.references.exists(_.name.startsWith("__topk")) => g
      }
    val topk = DocEmbed.topK(docs, "text", "doc_id", probe, k = 3)
    assert(pipelineGenerates(topk).isEmpty,
      "DocEmbed.topK still re-executes the chunk explode per consumer")
    assert(topk.count() === 3)
    val mined = HardNegatives.mine(docs, "text", "doc_id", probe, dims = 32, k = 2)
    assert(pipelineGenerates(mined).isEmpty,
      "HardNegatives.mine still re-executes the embed pipeline per consumer")
  }

  test("HardNegatives: near-dup excluded even at cosine ~1, best non-dup wins, k ranks per query") {
    import org.apache.spark.sql.functions._
    // doc 1 ~ doc 2 (near-dup: one token changed in 12 -> jaccard well
    // over 0.5), doc 3 shares half the vocabulary (hard negative),
    // docs 4/5 unrelated
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, base, "s"),
      (2L, base.replace("mu", "nu"), "s"),
      (3L, "alpha beta gamma delta epsilon zeta crow dove eagle finch gull hawk", "s"),
      (4L, "one two three four five six seven eight nine ten eleven twelve", "s"),
      (5L, "red orange yellow green blue indigo violet white black brown pink grey", "s")
    ).toDF("doc_id", "text", "source")
    val out = HardNegatives
      .mine(docs, "text", "doc_id", docs.where($"doc_id" === 1), dims = 64, k = 3)
      .select("qid", "nid", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.length === 3)
    assert(!out.map(_._2).contains(2L), s"near-dup leaked into negatives: ${out.toSeq}")
    assert(out.head._2 === 3L, s"hardest negative should be the vocab-overlap doc: ${out.toSeq}")
    assert(out.map(_._4).toSeq === Seq(1, 2, 3))
    // sanity: the excluded near-dup really is the highest-cosine doc
    val emb = HashEmbed.embed(docs, "text", "doc_id", 64,
      tokenHash = graft.functions.SharedHash.md5Long60)
    val cos = emb.where($"doc_id" === 1).select($"embedding".as("qv"))
      .crossJoin(emb.where($"doc_id" =!= 1).select($"doc_id".as("nid"), $"embedding".as("nv")))
      .select($"nid",
        aggregate(zip_with($"qv", $"nv", (x, y) => x * y), lit(0.0), (a, x) => a + x).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(cos(2L) === cos.values.max)
  }

  test("AnnBinary rerank recall vs exact cosine on real embeddings") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where($"vec_id" < 5)
    val exact = Cosine
      .topK(queries, emb, "vec_id", "embedding", k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // 64 sign bits on near-uniform 64-d vectors: a generous shortlist
    // keeps most true neighbors; this pins the composition, the q116
    // oracle pins the exact shortlist/rerank arithmetic
    val approx = AnnBinary
      .topK(queries, emb, "vec_id", "embedding", k = 5, shortlist = 100)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall too low")
  }

  test("Embed.silhouette: separated clusters near 1, merged labels near 0, misassigned negative") {
    import spark.implicits._
    // two tight, far-apart clusters, correctly labeled
    def vec(base: Float, jitter: Float) = Array(base + jitter, base - jitter, 0f, 0f)
    val good = ((0 until 20).map(i => (i.toLong, "a", vec(0f, i * 0.01f))) ++
      (0 until 20).map(i => (100L + i, "b", vec(10f, i * 0.01f)))).toDF("id", "label", "v")
    val g = Embed.silhouette(good, "v", "label").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("mean_sil")).toMap
    assert(g("a") > 0.9 && g("b") > 0.9, g.toString)

    // the same points with labels painted at random: silhouette collapses
    val mixed = ((0 until 20).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", vec(0f, i * 0.01f))) ++
      (0 until 20).map(i => (100L + i, if (i % 2 == 0) "a" else "b", vec(10f, i * 0.01f))))
      .toDF("id", "label", "v")
    val m = Embed.silhouette(mixed, "v", "label").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("mean_sil")).toMap
    assert(math.abs(m("a")) < 0.2 && math.abs(m("b")) < 0.2, m.toString)

    // a BIMODAL label (half at 0, half at 20 → centroid ~10, far from
    // every member) next to a tight label at 0.2: the 0-side members
    // sit much closer to the foreign centroid → negative mean for "a"
    // (a consistent label SWAP would just rename the clusters — the
    // partition, and so the silhouette, would be unchanged)
    val bimodal = ((0 until 10).map(i => (i.toLong, "a", vec(0f, i * 0.01f))) ++
      (0 until 10).map(i => (50L + i, "a", vec(20f, i * 0.01f))) ++
      (0 until 20).map(i => (100L + i, "b", vec(0.2f, i * 0.01f)))).toDF("id", "label", "v")
    val bi = Embed.silhouette(bimodal, "v", "label").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("mean_sil")).toMap
    assert(bi("a") < -0.1, bi.toString)
    assert(bi("b") > 0.9, bi.toString)
  }

  test("Embed.silhouette: hand-computed two-point-per-label values; single label rejected") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", Array(0f, 0f)), (2L, "a", Array(2f, 0f)), // centroid (1,0)
      (3L, "b", Array(10f, 0f)), (4L, "b", Array(12f, 0f)) // centroid (11,0)
    ).toDF("id", "label", "v")
    val out = Embed.silhouette(df, "v", "label").collect()
      .map(r => r.getString(0) -> ((r.getAs[Double]("mean_sil"),
        r.getAs[Double]("mean_own_dist"), r.getAs[Double]("mean_other_dist")))).toMap
    // label a: both points at distance 1 from own centroid; other dists 11 and 9
    assert(math.abs(out("a")._2 - 1.0) < 1e-9)
    assert(math.abs(out("a")._3 - 10.0) < 1e-9)
    val sA = ((11.0 - 1.0) / 11.0 + (9.0 - 1.0) / 9.0) / 2
    assert(math.abs(out("a")._1 - math.rint(sA * 1e4) / 1e4) < 1e-9)
    intercept[IllegalArgumentException] {
      Embed.silhouette(df.where(col("label") === "a"), "v", "label")
    }
  }
}
