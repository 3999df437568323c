package graft

import org.apache.spark.sql.functions._

import graft.util.Tables

/** Physical-plan assertions: the scale claims SURVEY.md §5 makes are
  * pinned here so a regression in plan shape (lost pushdown, a surprise
  * cartesian, a broadcast that stopped happening) fails CI, not a
  * 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("projection pruning reaches the parquet scan (unused columns never read)") {
    val q = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("sq"))
    val plan = executedPlan(q)
    val readSchema = plan.linesIterator
      .flatMap(l => "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(l).map(_.group(1)))
      .toSeq
    assert(readSchema.nonEmpty, plan)
    val readCols = readSchema.head.split(",").map(_.split(":")(0)).toSet
    assert(readCols == Set("l_returnflag", "l_quantity"), s"scan read $readCols\n$plan")
  }

  test("filter pushdown reaches the parquet scan (PushedFilters)") {
    val q = Tables.lineitem(spark, sf)
      .where(col("l_quantity") > 10.0)
      .select("l_orderkey", "l_quantity")
    val plan = executedPlan(q)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10.0)]"), plan)
  }

  test("brute-force cosine topK broadcasts the query side; corpus is never shuffled") {
    val emb = Tables.embeddings(spark, sf)
    val q = graft.sim.Cosine.topK(emb.where(col("vec_id") < 3), emb, "vec_id", "embedding", k = 2)
    val plan = executedPlan(q)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    // the only exchange is the final per-query window (partition by qid,
    // rows = candidates); the corpus scan side feeds the join directly
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("minhash LSH candidate generation joins on band buckets, never all pairs") {
    val docs = Tables.documents(spark, sf).limit(50)
    val q = graft.dedup.MinHashLsh.candidatePairs(docs, "text", "doc_id")
    // candidatePairs materializes eagerly; assert on its own plan string
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("as-of join plans as one key shuffle + window — no join operator at all") {
    val ev = Tables.events(spark, sf)
    val purchases = ev
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("p_value"))
    val q = graft.ops.AsOf.joinAsOf(
      ev.select("event_id", "user_id", "ts"), purchases,
      Seq("user_id"), "ts", "ts", Seq("p_value"))
    val plan = executedPlan(q)
    // the union + window compilation means NO join node and no
    // nested-loop anywhere; the only wide operation is the window's
    // key shuffle (+ the purchase aggregation's)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("groupby-transform join is broadcast when the group side is small (AQE)") {
    val li = Tables.lineitem(spark, sf)
    val q = graft.ops.Grouped.transform(
      li, Seq("l_returnflag"), Seq(avg(col("l_quantity")).as("__m")))
    val plan = executedPlan(q)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("tf-idf pair generation is a token equi-join, never a cross product") {
    // assert on the pre-checkpoint join shape (similarityJoin itself
    // returns an eagerly checkpointed frame whose plan is a scan)
    val docs = Tables.documents(spark, sf).limit(100)
    val vec = graft.text.TfIdf.vectors(docs, "text", "doc_id", nDocs = Some(100))
    val unit = graft.text.TfIdf.unitVectors(vec, "doc_id")
    val a = unit.select(col("doc_id").as("id_a"), col("token"), col("w").as("wa"))
    val b = unit.select(col("doc_id").as("id_b"), col("token"), col("w").as("wb"))
    val q = a.join(b, Seq("token")).where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(sum(col("wa") * col("wb")).as("cos"))
    val plan = executedPlan(q)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("decontamination broadcasts the probe span set; corpus spans joined by hash") {
    val docs = Tables.documents(spark, sf).limit(200)
    val q = graft.dedup.SpanDedup.contamination(
      docs, docs.where(col("doc_id") % 50 === 0), "text", "doc_id")
    val plan = executedPlan(q)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("PQ ADC scan broadcasts queries over the code table like the exact baseline") {
    val emb = Tables.embeddings(spark, sf).limit(300)
    val q = graft.sim.AnnPq.topK(
      emb.where(col("vec_id") < 3), emb, "vec_id", "embedding",
      k = 3, m = 8, kCent = 8, sampleN = 64)
    val plan = executedPlan(q)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("nearest-centroid assign argmax is a partial aggregate, not a window exchange") {
    val emb = Tables.embeddings(spark, sf).limit(300)
    val cents = graft.sim.Embed.centroids(emb, "embedding", "label")
    val q = graft.sim.Embed.assign(emb, cents, "embedding", "vec_id")
    val plan = executedPlan(q)
    // corpus×k scored rows must be collapsed map-side BEFORE any shuffle:
    // the argmax is a HashAggregate pair (partial_min + final), NOT a
    // row_number window that exchanges every scored row
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_min"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    // norms are hoisted OUT of the scored (row, centroid) pair: the
    // scoring projection above the join must contain ONE floatdot (the
    // numerator) — vector and centroid norms are computed once per row /
    // once per centroid in projections below the join. Pre-hoist, the
    // scoring line carried three floatdots (dot + both norms), tripling
    // the flops of the hottest stage at 1B docs × 1k centroids.
    val dotsPerLine = plan.linesIterator.map(l => "floatdot".r.findAllIn(l).size).max
    assert(dotsPerLine <= 1, s"a plan line evaluates $dotsPerLine floatdots:\n$plan")
  }

  test("ANN per-key top-k is a bounded-heap partial aggregate, not a window exchange") {
    val emb = Tables.embeddings(spark, sf).limit(300)
    // the graph-build seed sweep: every candidate edge used to go through
    // row_number() OVER (PARTITION BY src) — a full exchange + sort with
    // zero reduction. The TopK aggregate must plan as an ObjectHashAggregate
    // pair (partial topk_agg map-side), with NO Window anywhere.
    val g = graft.sim.AnnGraph.lshSeedEdges(emb, "vec_id", "embedding", k = 5, dims = 64)
    val plan = executedPlan(g)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_topk_agg"), plan)

    // same shape on the brute-force baseline (Cosine.topK)
    val q = graft.sim.Cosine.topK(
      emb.where(col("vec_id") < 3), emb, "vec_id", "embedding", k = 5)
    val planC = executedPlan(q)
    assert(!planC.contains("Window"), planC)
    assert(planC.contains("partial_topk_agg"), planC)
  }

  test("chunking is embarrassingly parallel: no exchange, no window, no join") {
    val q = graft.text.Chunker.chunk(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "doc_id", 20, 5)
    val plan = executedPlan(q)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("packing shuffles once on the fixed key range; no global single-partition sort") {
    import spark.implicits._
    val docs = (1 to 300).map(i => (i.toLong, 1 + i % 50)).toDF("id", "n_tok")
    // the public packBins checkpoints eagerly (its plan is a scan);
    // assert on the lazy plan the checkpoint materializes
    val (lazyOut, keyed) = graft.ops.Packing.packBinsPlan(docs, "id", "n_tok", 256, "pack", 8)
    // AQE plan strings repeat the plan under "== Initial Plan =="; count
    // exchanges in the final section only
    val plan = executedPlan(lazyOut).split("== Initial Plan ==")(0)
    keyed.unpersist(false)
    // exactly one hashpartitioning exchange (the __part shuffle feeding
    // the window); a naive global cumsum would plan SinglePartition
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("repeated-span doubling chain rides ONE document shuffle; no L-gram text moves") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, (0 until 40).map(j => s"t${i % 7}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    // the public flaggedStarts checkpoints eagerly; assert on the lazy
    // plan the checkpoint materializes
    val (lazyOut, fp) = graft.dedup.RepeatedSpans.flaggedPlan(docs, "text", "doc_id", minLen = 12)
    val plan = executedPlan(lazyOut).split("== Initial Plan ==")(0)
    fp.unpersist(false)
    // all ⌈log₂L⌉ doubling passes + the fingerprint lead share one
    // (doc_id)-partitioned sort: exactly ONE exchange on doc_id, and
    // the fingerprint frame is computed once (cache-shared between the
    // ownership groupBy and the join back)
    val docExchanges = "Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).size
    assert(docExchanges <= 1, s"expected <= 1 doc_id exchange, got $docExchanges:\n$plan")
    assert(plan.contains("InMemoryTableScan"), plan)
    // the ownership groupBy + join back add the fingerprint shuffle —
    // nothing else (no rangepartitioning, no single-partition funnel)
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
    // the shuffled columns are positions + 8-byte hashes, never span
    // text: no concat/slice of L tokens appears in the physical plan
    assert(!plan.contains("slice("), plan)
  }

  test("line dedup broadcasts the duplicated-line table; two hash shuffles, no sort-merge join") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, s"HDR\nbody $i line a\nbody $i line b\nFOOT"))
      .toDF("doc_id", "text")
    val plan = executedPlan(graft.dedup.LineDedup.clean(docs, "text", "doc_id"))
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // line-count groupBy + doc reassembly groupBy: nothing else moves
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("line dedup above the broadcast gate falls back to a shuffle join (no forced broadcast OOM)") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, s"HDR\nbody $i line a\nbody $i line b\nFOOT"))
      .toDF("doc_id", "text")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = graft.dedup.LineDedup.clean(docs, "text", "doc_id", broadcastDupLimit = 0L)
      val plan = executedPlan(out).split("== Initial Plan ==")(0)
      assert(!plan.contains("BroadcastHashJoin"), plan)
      // and the gated plan still computes the same answer: doc 1 holds
      // the earliest occurrence of both duplicated lines, so it keeps all
      val kept = out.where(col("doc_id") === 1L).select("clean_text").as[String].head()
      assert(kept == "HDR\nbody 1 line a\nbody 1 line b\nFOOT", kept)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("heavy hitters: candidate table broadcasts; no vocabulary-sized exchange") {
    import spark.implicits._
    val docs = (1L to 80L).map { i =>
      (i, if (i % 2 == 0) "en" else "es",
        (0 until 30).map(j => s"w${(i * 7 + j) % 23}").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val plan = executedPlan(
      graft.text.Vocab.heavyHitters(docs, "text", "lang", pct = 50, capacity = 64))
    // the exact pass joins the token stream against the BROADCAST
    // candidates — the full vocabulary never shuffles as a join side
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // sketch groupBy(stratum) + exact groupBy(stratum, token): both
    // map-side combined (partial_ aggregates present)
    assert(plan.contains("partial_heavyhittersagg") || plan.contains("HeavyHittersAgg"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("token budget: prefix table broadcasts; running totals window is bucket-bounded") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"s${i % 2}", 10L + i % 7)).toDF("doc_id", "source", "n_tok")
    val out = graft.ops.TokenBudget.select(
      docs, "doc_id", "source", "n_tok", Map("s0" -> 500L, "s1" -> 500L), buckets = 8)
    val plan = executedPlan(out)
    // budgets + bucket-prefix tables ride broadcast joins
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the ONLY window partitions by (source, __bucket) — never a
    // source-wide (let alone global) ordered scan
    assert(plan.contains("windowspecdefinition(source"), plan)
    assert(plan.contains("__bucket"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("BM25 broadcasts the idf-enriched query table; postings frame computed once") {
    import spark.implicits._
    val docs = (1L to 80L)
      .map(i => (i, (0 until 30).map(j => s"w${(i + j) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val qs = Seq((0L, 0, "w1"), (0L, 1, "w2"), (0L, 2, "w3")).toDF("qid", "qpos", "term")
    // the lazy plan that executes inside topK (the public API checkpoints
    // the #queries×k result and releases the postings cache)
    val (out, tf) =
      graft.text.Bm25.topKPlan(docs, "text", "doc_id", qs, k = 5, qLen = 3, k1 = 1.2, b = 0.75)
    val plan = executedPlan(out)
    // scoring join: broadcast, never an exchange of the postings side
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the persisted postings frame serves both the df aggregate and the
    // scoring join — the corpus is not re-tokenized
    assert(plan.contains("InMemoryTableScan"), plan)
    tf.unpersist(false)
    // and the public API leaves no cached postings behind
    spark.sharedState.cacheManager.clearCache()
    graft.text.Bm25.topK(docs, "text", "doc_id", qs, k = 5).collect()
    assert(spark.sharedState.cacheManager.isEmpty, "topK left a cached frame behind")
  }

  // AQE plan strings carry BOTH the final and the initial plan; scan
  // counting must look at the final segment only
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    executedPlan(df).split("== Initial Plan ==").head

  test("collocations: pairs are built row-locally — the only joins are count-frame joins, no corpus self-join") {
    val docs = Tables.documents(spark, sf)
    val q = graft.text.Collocations.pmi(docs, "text", minCount = 2)
    val plan = finalPlan(q)
    assert(!plan.contains("CartesianProduct"), plan)
    // at most two corpus scans (pair pass + unigram pass; AQE may even
    // reuse the exchange down to one) — the checkpointed count table
    // serves its three consumers, where the uncheckpointed form
    // re-scanned the corpus per reference (measured: 3 extra scans)
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 2, s"expected <= 2 corpus scans, got $scans\n$plan")
  }

  test("length buckets: windows partition by (bucket, shard) — batching parallelizes, no global single-partition window") {
    val docs = Tables.documents(spark, sf)
    val q = graft.ops.LengthBuckets.assign(docs, "text", "doc_id")
    val plan = executedPlan(q)
    // a Window whose partition spec is empty would read "Window [...], []"
    // or hashpartitioning on nothing; both batching windows must key on
    // bucket AND shard
    val windows = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windows.nonEmpty, plan)
    windows.foreach { w =>
      assert(w.contains("bucket") && w.contains("shard"), s"window not sharded: $w\n$plan")
    }
  }

  test("novelty: the df join is keyed on the 64-bit gram hash, not gram text") {
    val docs = Tables.documents(spark, sf)
    val q = graft.text.Novelty.score(docs, "text", "doc_id", n = 3)
    val plan = executedPlan(q)
    // the join/aggregate exchanges partition on the long hash column
    // ("gram#N: bigint" in hashpartitioning) — gram strings never shuffle
    val exch = plan.linesIterator.filter(_.contains("hashpartitioning(gram#")).toSeq
    assert(exch.nonEmpty, plan)
    assert(plan.contains("gram:bigint") || plan.contains("gram#") && !plan.contains("gram:string"),
      s"gram travels as a string\n$plan")
  }

  test("cms estimates: sketch frame crossjoins the broadcast probe list — the corpus is scanned once") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val probes = Seq("the", "a", "value").toDF("token")
    val sk = graft.text.Vocab.cmsSketch(docs, "text", "lang", 64, 4, 7L, xxhash64(_))
    val q = graft.text.Vocab.cmsEstimates(sk, probes, "token", "lang", 64, 4, 7L, xxhash64(_))
    val plan = finalPlan(q)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 corpus scan, got $scans\n$plan")
  }

  test("kmv sketches: one corpus scan, one corpus-keyed shuffle, map-side-combined sketch agg") {
    val docs = Tables.documents(spark, sf)
    val q = graft.text.CorpusOverlap.sketches(docs, "text", "source", k = 16)
    val plan = finalPlan(q)
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 corpus scan, got $scans\n$plan")
    // TypedImperativeAggregate runs as ObjectHashAggregate with a
    // partial pass before the exchange (map-side combine)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_kmvagg") || plan.contains("partial_kmv"), plan)
  }

  test("kmv pair overlap: sketch self-join broadcasts — never a shuffle of sketches") {
    val docs = Tables.documents(spark, sf)
    val sk = graft.text.CorpusOverlap.sketches(docs, "text", "source", k = 16)
    val plan = finalPlan(graft.text.CorpusOverlap.pairOverlap(sk))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("binary ANN: queries broadcast over the packed scan; corpus touched twice (scan + rerank fetch)") {
    val emb = Tables.embeddings(spark, sf)
    val q = graft.sim.AnnBinary.topK(
      emb.where(col("vec_id") < 3), emb, "vec_id", "embedding", k = 2, shortlist = 10)
    val plan = finalPlan(q)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans <= 3, s"expected <= 3 embedding scans (codes + probes + rerank), got $scans\n$plan")
  }

  test("keyness: corpus-sized count aggregate computed once (exchange reuse), totals broadcast") {
    val docs = Tables.documents(spark, sf)
    val q = graft.text.Keyness.g2(docs, "text", "source")
    val plan = finalPlan(q)
    // corpTotals/tokTotals/grand re-aggregate the SAME counts subplan:
    // the token shuffle must be planned once and reused, not re-scanned
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(
      scans == 1 || plan.contains("ReusedExchange"),
      s"counts subplan re-executed ($scans scans, no ReusedExchange)\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("weightedTake plans as TakeOrderedAndProject — per-partition heaps, no global sort exchange") {
    val docs = Tables.documents(spark, sf)
    val q = graft.ops.Sampling.weightedTake(
      docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars", n = 20)
    val plan = finalPlan(q)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("rangepartitioning"), s"global sort shuffle crept in\n$plan")
  }

  test("funnel: one user-keyed shuffle, no join operator, no window") {
    val ev = Tables.events(spark, sf)
    val q = graft.ops.Funnel.userFunnel(
      ev, "user_id", "event_type", "ts", Seq("signup", "view", "click", "purchase"))
    val plan = finalPlan(q)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 user shuffle, got $exchanges\n$plan")
    // the funnel-type filter reaches the scan
    assert(plan.contains("PushedFilters") && plan.contains("In(event_type"), plan)
  }

  test("skip-gram pairing is an equi-join on (doc, position) — no range join, no cartesian") {
    val docs = Tables.documents(spark, sf).limit(80)
    val q = graft.text.SkipGram.pairCounts(docs, "text", "doc_id", window = 2, t = 1e9)
    val plan = finalPlan(q)
    // the only nested-loop is the broadcast of the 1-ROW token total
    // (the established corpus-constant pattern); the PAIR join itself
    // must be a hash/merge equi-join and nothing may be cartesian
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
  }

  test("js drift: dense frame is corpus-totals x broadcast vocab — corpus scanned once or reused") {
    val docs = Tables.documents(spark, sf)
    val q = graft.text.Keyness.jsDivergence(docs, "text", "source")
    val plan = finalPlan(q)
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(
      scans == 1 || plan.contains("ReusedExchange"),
      s"counts subplan re-executed ($scans scans, no ReusedExchange)\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("poisson bootstrap: all replicates ride ONE corpus scan — one group shuffle, no join, no explode") {
    val li = Tables.lineitem(spark, sf)
    val q = graft.ops.Bootstrap.groupedMeanSE(
      li, "l_quantity", "l_returnflag",
      concat(col("l_orderkey").cast("string"), lit("-"), col("l_linenumber").cast("string")),
      b = 8)
    val plan = finalPlan(q)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Generate"), s"replicates must not explode rows\n$plan")
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan)
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected the one group shuffle, got $exchanges\n$plan")
  }

  test("cluster bootstrap slope: 32 replicate regressions from one scan and one global aggregate") {
    val li = Tables.lineitem(spark, sf)
    val q = graft.ops.Bootstrap.olsSlopeSE(li, "l_extendedprice", "l_quantity", "l_suppkey", b = 32)
    val plan = finalPlan(q)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Generate"), plan)
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan)
  }

  test("between estimator: the Gram pass runs over the COLLAPSED group frame — one corpus scan") {
    val li = Tables.lineitem(spark, sf)
    var plan: String = null
    val m = graft.ml.Panel.between(li, "l_extendedprice", Seq("l_quantity"), "l_suppkey")
    // the fit consumed the frame internally; re-derive the same plan shape
    val means = li.groupBy(col("l_suppkey"))
      .agg(avg(col("l_extendedprice").cast("double")).as("y"), avg(col("l_quantity").cast("double")).as("x"))
      .agg(sum(col("x") * col("y")), count(lit(1)))
    plan = finalPlan(means)
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1, plan)
    assert(m.n < 200L, "fit must see group rows, not fact rows")
  }

  test("welch t: rest-of-corpus moments come from the per-group frame — corpus scanned once") {
    val docs = Tables.documents(spark, sf)
    val q = graft.ops.Stats.welchT(docs, "n_chars", "source")
    val plan = finalPlan(q)
    val scans = plan.linesIterator.count(l => l.contains("Scan parquet") && !l.contains("Reused"))
    assert(scans == 1, s"corpus must be scanned once, got $scans\n$plan")
  }

  test("chi-square: margins and totals reuse the MATERIALIZED cells table — zero corpus rescans") {
    val docs = Tables.documents(spark, sf)
    val q = graft.ops.Stats.chiSquare(docs, "lang", "source")
    val plan = finalPlan(q)
    // the corpus was scanned exactly once, at cells-checkpoint time;
    // the statistic's own plan reads only the checkpointed cell RDD
    // (before the checkpoint, column pruning differentiated the three
    // margin subplans and the corpus was scanned FOUR times)
    val scans = plan.linesIterator.count(l => l.contains("Scan parquet") && !l.contains("Reused"))
    assert(scans == 0, s"statistic plan must read the cells checkpoint, got $scans corpus scans\n$plan")
    assert(plan.contains("ExistingRDD") || plan.contains("LocalTableScan"), plan)
  }

  test("triangles: every join is an equi-join — no cartesian, no nested loop at any stage") {
    val li = Tables.lineitem(spark, sf)
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
    val edges = a.join(b, Seq("ok")).where(col("pa") =!= col("pb"))
      .select(col("pa").as("src"), col("pb").as("dst"))
    val q = graft.graph.Triangles.perNode(edges)
    val plan = finalPlan(q)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("record linkage: blocking compiles to one equi-join; weights are folded constants") {
    import graft.dedup.RecordLinkage
    val cust = Tables.customer(spark, sf)
    val a = cust.select(col("c_custkey"), col("c_nationkey"), col("c_name"))
    val b = cust.select(col("c_custkey").as("b_id"), col("c_nationkey").as("b_n"),
      col("c_name").as("b_name"))
    val q = RecordLinkage.linkPairs(a, b, "c_custkey", "b_id", Seq(("c_nationkey", "b_n")),
      Seq((RecordLinkage.FieldRule("nm", (l, r) => l <=> r, 0.9, 0.01), "c_name", "b_name")),
      minScore = -100.0)
    val plan = finalPlan(q)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    val joins = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin") ||
        l.contains("ShuffledHashJoin"))
    assert(joins == 1, s"expected exactly the blocking join, got $joins\n$plan")
  }

  test("scd2 merge: one full-outer join on the key; history unions in shuffle-free") {
    import graft.sources.Scd2
    val cust = Tables.customer(spark, sf)
    val dim0 = Scd2.initial(cust, "c_custkey", Seq("c_mktsegment"), 0L)
    val upd = cust.limit(50).select(col("c_custkey"), concat(col("c_mktsegment"), lit("_x")).as("c_mktsegment"))
      .withColumn("eff", lit(5L))
    val q = Scd2.merge(dim0, upd, "c_custkey", Seq("c_mktsegment"), "eff")
    val plan = finalPlan(q)
    // the merge DECLARES one full-outer join; Catalyst specializes it
    // per union branch (LeftOuter for kept, Inner for closed, …) and
    // broadcasts the small batch — every join must stay a key equi-join
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    val joins = plan.linesIterator.count(l =>
      l.contains("HashJoin") || l.contains("SortMergeJoin"))
    assert(joins >= 1, s"expected key equi-joins\n$plan")
  }

  test("JL projection is exchange-free: scan, mat-vec project, posexplode — nothing shuffles") {
    val emb = Tables.embeddings(spark, sf)
    val model = graft.sim.RandomProjection.fit(64, 16)
    val q = graft.sim.RandomProjection.projectLong(emb, "vec_id", "embedding", model)
    val plan = finalPlan(q)
    // Tables.embeddings injects one repartition (split emulation); the
    // operator itself must add NO further exchange
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"projection must not shuffle\n$plan")
    assert(plan.contains("float_mat_vec") || plan.contains("FloatMatVec") ||
      plan.contains("Generate"), plan)
  }
}
