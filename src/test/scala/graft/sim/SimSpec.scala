package graft.sim

import graft.SparkSpec
import graft.util.Tables

class SimSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

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

  test("AnnLsh bucket assignment is deterministic") {
    val emb = Tables.embeddings(spark, sf).limit(20)
    val b1 = AnnLsh.bucketize(emb, "vec_id", "embedding", 64).select("vec_id", "table", "bucket")
      .as[(Long, Int, Long)].collect().toSet
    val b2 = AnnLsh.bucketize(emb, "vec_id", "embedding", 64).select("vec_id", "table", "bucket")
      .as[(Long, Int, Long)].collect().toSet
    assert(b1 == b2)
  }
}
