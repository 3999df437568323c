package graft.streaming

import graft.SparkSpec
import graft.util.Tables

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("EventOps.sessionize splits on idle gaps") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val df = Seq(
      (1L, 10L, ts(0), 1.0),
      (2L, 10L, ts(10), 2.0),
      (3L, 10L, ts(70), 3.0), // 60-min gap → new session
      (4L, 11L, ts(0), 4.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = EventOps
      .sessionize(df, gapMinutes = 30)
      .select("user_id", "session", "n_events", "sum_value")
      .as[(Long, Long, Long, Double)]
      .collect()
      .toSet
    assert(out == Set((10L, 1L, 2L, 3.0), (10L, 2L, 1L, 3.0), (11L, 1L, 1L, 4.0)))
  }

  test("stateful streaming sessionize equals batch sessionize (single batch)") {
    val batchEvents = Tables.events(spark, sf)
    val batch = EventOps
      .sessionize(batchEvents, gapMinutes = 30)
      .select("user_id", "session", "n_events", "sum_value")
      .as[(Long, Long, Long, Double)]
      .collect()
      .toSet

    val dir = java.nio.file.Files.createTempDirectory("events_sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet")
    )
    val stream = EventStream.readEvents(spark, dir.toString)
    val q = EventStream
      .sessionizeStream(stream, gapMinutes = 30)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sess_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark
        .table("sess_out")
        .select("user_id", "session", "n_events", "sum_value")
        .as[(Long, Long, Long, Double)]
        .collect()
        .toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("event-time-timeout sessionize emits sessions only on close") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val df = ms.toDF.toDF("event_id", "user_id", "ts", "value")
    val out = EventStream.sessionizeStreamOnClose(df, gapMinutes = 30, watermark = "0 seconds")
    val q = out.writeStream.outputMode("append").format("memory").queryName("sess_close").start()
    try {
      // batch 1: two events for user 10 inside one session — still open,
      // so NOTHING is emitted yet
      ms.addData((1L, 10L, ts(0), 1.0), (2L, 10L, ts(10), 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_close").count() == 0)

      // batch 2 advances the event-time clock far past user 10's gap
      // deadline (watermark updates at batch END, so the timeout fires
      // in the batch AFTER this one)
      ms.addData((3L, 11L, ts(120), 4.0))
      q.processAllAvailable()

      // batch 3: watermark (120 min) > user 10's deadline (40 min) →
      // the session closes and is emitted exactly once
      ms.addData((4L, 11L, ts(125), 1.0))
      q.processAllAvailable()
      val got = spark
        .table("sess_close")
        .select("user_id", "session", "n_events", "sum_value")
        .as[(Long, Long, Long, Double)]
        .collect()
        .toSet
      assert(got == Set((10L, 1L, 2L, 3.0)))
    } finally q.stop()
  }

  test("dedupStream keeps first occurrence per key across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = ms.toDF.toDF("content_hash", "ts", "value")
    val out = EventStream.dedupStream(df, Seq("content_hash"), watermark = "2 hours")
    val q = out.writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      // batch 1: hash 1 twice (in-batch dup) + hash 2 once
      ms.addData((1L, ts(0), 1.0), (1L, ts(1), 2.0), (2L, ts(2), 3.0))
      q.processAllAvailable()
      // batch 2: hash 1 again (cross-batch dup, inside the watermark
      // horizon) + new hash 3
      ms.addData((1L, ts(10), 4.0), (3L, ts(11), 5.0))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("content_hash").as[Long].collect().sorted
      assert(got.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming hourlyAgg equals the batch hourlyAgg on the same data") {
    val batchEvents = Tables.events(spark, sf)
    val batch = EventOps
      .hourlyAgg(batchEvents)
      .select("ws", "event_type", "n", "sum_value")
      .as[(Long, String, Long, Double)]
      .collect()
      .toSet

    // streaming file source requires a directory, not a single file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet")
    )
    val stream = EventStream.readEvents(spark, dir.toString)
    val agg = EventStream.hourlyAggStream(stream)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly_out")
      .start()
    try {
      q.processAllAvailable()
      val got = spark
        .table("hourly_out")
        .select("ws", "event_type", "n", "sum_value")
        .as[(Long, String, Long, Double)]
        .collect()
        .toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming contamination equals batch SpanDedup.contamination across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val span = "alpha beta gamma delta epsilon zeta eta theta"
    val corpusRows = Seq(
      (1L, "clean document with entirely original content here now"),
      (2L, s"prefix words $span suffix words closing out this one"),
      (3L, "another clean unrelated document full of its own words"),
      (4L, "tiny doc"), // shorter than the span window
      (5L, s"$span") // exactly the span
    )
    val probe = Seq((100L, s"the benchmark question contains $span inside it"))
      .toDF("doc_id", "text")
    val batch = graft.dedup.SpanDedup
      .contamination(corpusRows.toDF("doc_id", "text"), probe, "text", "doc_id", n = 8)
      .as[(Long, Long, Long)].collect().toSet

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = DocStream.contaminationStream(ms.toDF.toDF("doc_id", "text"), probe, "text", "doc_id", n = 8)
    val q = out.writeStream.outputMode("append").format("memory").queryName("contam_out").start()
    try {
      ms.addData(corpusRows.take(2): _*)
      q.processAllAvailable()
      ms.addData(corpusRows.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("contam_out").as[(Long, Long, Long)].collect().toSet
      assert(got == batch)
      assert(got.find(_._1 == 2L).get._3 == 1L) // the planted leak
      assert(got.find(_._1 == 4L).get._2 == 1L) // short doc = one whole-text span
    } finally q.stop()
  }

  test("streaming BPE tokenization: stateless withTokens matches batch across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.util.Tables.documents(spark, sf).limit(40).cache()
    val vocab = graft.text.Bpe.trainOn(docs, "text", numMerges = 30)
    val batch = graft.text.Bpe.withTokens(docs, "text", vocab)
      .select("doc_id", "tokens", "n_tokens_bpe")
      .as[(Long, Seq[Int], Int)].collect().toSet
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    // tokenization is a stateless projection (broadcast vocab, task-lazy
    // encoder) — append-safe with zero state, like the centroid gate
    val out = graft.text.Bpe.withTokens(ms.toDF.toDF("doc_id", "text"), "text", vocab)
      .select("doc_id", "tokens", "n_tokens_bpe")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("bpe_out").start()
    try {
      ms.addData(rows.take(20): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(20): _*)
      q.processAllAvailable()
      val got = spark.table("bpe_out").as[(Long, Seq[Int], Int)].collect().toSet
      assert(got == batch)
    } finally q.stop()
    docs.unpersist()
  }

  test("streaming long-span decontamination: row-local fingerprints ≡ window chain, planted leak") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, explode, xxhash64}
    import graft.dedup.RepeatedSpans
    val base = (0 until 40).map(i => s"a$i")
    val probeDoc = base.mkString(" ")
    val leak = ((0 until 6).map(i => s"b$i") ++ base.slice(5, 26) ++
      (0 until 5).map(i => s"c$i")).mkString(" ")
    val clean = (0 until 30).map(i => s"z$i").mkString(" ")
    val shortDoc = "s0 s1 s2"
    val probe = Seq((1L, probeDoc)).toDF("doc_id", "text")

    // VALUE parity: the row-local zip_with/slice chain produces exactly
    // the window chain's fingerprints, combined the same way
    val all = Seq((1L, probeDoc), (2L, leak), (3L, clean)).toDF("doc_id", "text")
    val (_, fpFrame) = RepeatedSpans.flaggedPlan(all, "text", "doc_id", minLen = 12)
    val winKeys = fpFrame
      .select(col("doc_id"), xxhash64(col("h"), col("hb")).as("fp"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    fpFrame.unpersist(false)
    val rowKeys = all
      .select(col("doc_id"),
        explode(RepeatedSpans.fingerprintKeys(col("text"), 12)).as("fp"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(winKeys == rowKeys)

    // streaming gate across micro-batches: zero state, static probe
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = graft.streaming.DocStream.longSpanContaminationStream(
      ms.toDF.toDF("doc_id", "text"), probe, "text", "doc_id", minLen = 12)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("longspan_out").start()
    try {
      ms.addData((2L, leak), (3L, clean))
      q.processAllAvailable()
      ms.addData((4L, shortDoc))
      q.processAllAvailable()
      val got = spark.table("longspan_out").as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      // 32-token leak doc: 21 distinct span starts, the 10 covering the
      // copied 21-token run all hit the probe
      assert(got(2L) == ((21L, 10L)), got(2L).toString)
      assert(got(3L) == ((19L, 0L)), got(3L).toString)
      assert(got(4L) == ((0L, 0L)), got(4L).toString)
    } finally q.stop()
  }

  test("streaming shard-append: per-epoch parity with batch TrainingShards, idempotent layout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.util.Tables.documents(spark, sf).limit(24).cache()
    val vocab = graft.text.Bpe.trainOn(docs, "text", numMerges = 30)
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val dir = java.nio.file.Files.createTempDirectory("sshards").toString
    val ckp = java.nio.file.Files.createTempDirectory("sshards_ckp").toString

    def drain(): Unit = {
      // AvailableNow terminates after consuming the backlog; each run
      // is one epoch here (all pending rows fit one micro-batch)
      val q = graft.ops.StreamingShards.run(
        ms.toDF.toDF("doc_id", "text"), "text", "doc_id", vocab,
        chunkSize = 16, overlap = 0, budget = 64L, path = dir, checkpoint = ckp)
      try q.awaitTermination() finally q.stop()
    }
    ms.addData(rows.take(12): _*); drain()
    ms.addData(rows.drop(12): _*); drain()

    val back = spark.read.parquet(dir)
      .select("ingest_epoch", "bin", "bin_pos", "doc_id", "chunk_id", "n_tokens", "tokens")
      .as[(Long, Long, Long, Long, Long, Long, Seq[Int])].collect()
    assert(back.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L), "two epochs on disk")

    // per-epoch parity: each epoch's shard set IS the batch writer's
    // output for that epoch's documents under the epoch-extended salt
    val epochDocs = Map(0L -> rows.take(12), 1L -> rows.drop(12))
    for ((ep, rws) <- epochDocs) {
      val expect = graft.ops.TrainingShards.shards(
        rws.toDF("doc_id", "text"), "text", "doc_id", vocab,
        chunkSize = 16, overlap = 0, budget = 64L, salt = s"shards-e$ep")
        .select("bin", "bin_pos", "doc_id", "chunk_id", "n_tokens", "tokens")
        .as[(Long, Long, Long, Long, Long, Seq[Int])].collect().toSet
      val got = back.filter(_._1 == ep).map(r => (r._2, r._3, r._4, r._5, r._6, r._7)).toSet
      assert(got == expect, s"epoch $ep")
    }
    // cross-epoch completeness: every chunk of every doc, exactly once
    val allChunks = graft.text.Bpe.chunk(docs, "text", "doc_id", vocab, 16, 0)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toSet
    assert(back.map(r => (r._4, r._5)).toSet == allChunks)
    assert(back.length == allChunks.size)
    // budget rule holds within every epoch
    assert(back.forall(_._3 < 64L))
    docs.unpersist()
  }

  test("streaming centroid gate: row-local assign ≡ batch Embed.assign across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val emb = graft.util.Tables.embeddings(spark, sf).limit(60).cache()
    val cents = graft.sim.Embed.centroids(emb, "embedding", "label").cache()

    // row-local form == the batch join+argmax aggregate, row for row
    // (same lexicographic (-cos, label) ordering, same rounding)
    val batch = graft.sim.Embed.assign(emb, cents, "embedding", "vec_id")
      .as[(Long, Long, Double)].collect().toSet
    val rowLocal = graft.streaming.EmbedStream
      .assignStream(emb.toDF(), cents.toDF(), "embedding", "vec_id")
      .select("vec_id", "assigned", "cos")
      .as[(Long, Long, Double)].collect().toSet
    assert(rowLocal == batch)

    // multi-batch streaming: same rows, arriving in two micro-batches
    val rows = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Float])]
    val streamed = graft.streaming.EmbedStream.assignStream(
      ms.toDF.toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding")),
      cents.toDF(), "embedding", "vec_id")
      .select("vec_id", "assigned", "cos")
    val q = streamed.writeStream.outputMode("append").format("memory")
      .queryName("assign_out").start()
    try {
      ms.addData(rows.take(25): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(25): _*)
      q.processAllAvailable()
      val got = spark.table("assign_out").as[(Long, Long, Double)].collect().toSet
      assert(got == batch, "streamed assignment diverged from batch")
    } finally q.stop()

    // the gate keeps exactly the confident members of wanted clusters
    val keep = Set(0L, 1L)
    val gatedRows = graft.streaming.EmbedStream
      .centroidGate(emb.toDF(), cents.toDF(), "embedding", "vec_id", keep, minCos = 0.2)
    // the gate preserves the payload columns (embedding flows through)
    assert(gatedRows.columns.contains("embedding"))
    val gated = gatedRows.select("vec_id", "assigned", "cos")
      .as[(Long, Long, Double)].collect().toSet
    val expect = batch.filter { case (_, lbl, cos) => keep(lbl) && cos >= 0.2 }
    assert(gated == expect && gated.nonEmpty)
    emb.unpersist(); cents.unpersist()
  }

  test("streaming quality gate equals the batch composition across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq(
      (1L, "the quick brown fox jumps over a lazy dog and runs into the green forest to find water and rest under a tree"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"), // repetition
      (3L, "el rapido zorro marron salta sobre el perro y corre hacia la montana de la sierra"), // not en
      (4L, "hello"), // single token: top-token frac 1.0
      (5L, "buy now buy now buy now buy now buy now buy now buy now buy now"), // top bigram
      (6L, "a diverse and genuinely informative document is describing the methods of careful data curation in large scale training pipelines today")
    )
    // batch composition: row-local quality + langid, Repetition.stats joined
    val batchDf = rows.toDF("doc_id", "text")
    val scored = graft.text.LangId.withLangId(
      graft.text.TextStats.withQuality(batchDf, "text"), "text")
      .join(graft.text.Repetition.stats(batchDf, "text", "doc_id"), Seq("doc_id"))
    val batchKept = scored.where(
      $"quality" >= 0.5 && $"frac_top_token" <= 0.2 && $"frac_unique" >= 0.3 &&
        $"frac_top_bigram" <= 0.2 && $"pred_lang".isin("en"))
      .select("doc_id").as[Long].collect().toSet

    // the row-local repetition rewrite matches Repetition.stats on EVERY
    // row (including the single-token bigram edge case), not just kept ones
    val batchRep = graft.text.Repetition.stats(batchDf, "text", "doc_id")
      .select("doc_id", "n_tokens", "frac_top_token", "frac_unique", "frac_top_bigram")
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    val localRep = DocStream.withRowLocalRepetition(batchDf, "text")
      .select("doc_id", "n_tokens", "frac_top_token", "frac_unique", "frac_top_bigram")
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    assert(localRep == batchRep)

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = DocStream.qualityGateStream(ms.toDF.toDF("doc_id", "text"), "text")
    val q = out.writeStream.outputMode("append").format("memory").queryName("gate_out").start()
    try {
      ms.addData(rows.take(3): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("gate_out").select("doc_id").as[Long].collect().toSet
      assert(got == batchKept, s"stream $got vs batch $batchKept")
      assert(got.contains(1L) && got.contains(6L)) // the clean docs pass
      assert(!got.exists(Set(2L, 3L, 4L, 5L))) // each reject reason fires
    } finally q.stop()
  }

  test("streaming DSIR gate: multi-batch stream admits exactly the batch selection, same scores") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // two vocabularies: even docs target-like, odd docs background-only
    val docs = (0 until 12).map { i =>
      if (i % 2 == 0) (i.toLong, s"alpha beta gamma delta alpha beta gamma t$i")
      else (i.toLong, s"zonk quux blarg wibble zonk quux blarg b$i")
    }
    val df = docs.toDF("doc_id", "text")
    val target = graft.text.NgramLm.train(df.where($"doc_id" % 2 === 0), "text", "doc_id")
    val background = graft.text.NgramLm.train(df, "text", "doc_id")
    val batchW = graft.text.Dsir.logWeights(df, "text", "doc_id", target, background)
      .select("doc_id", "n_tokens", "log_w").as[(Long, Long, Double)].collect()
    val thr = 0.0 // target-like docs score positive, background-only negative
    val batchKept = batchW.filter(_._3 >= thr).map(_._1).toSet
    assert(batchKept.nonEmpty && batchKept.size < docs.size,
      s"threshold must split the corpus: $batchKept")

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = DocStream.dsirGateStream(
      ms.toDF.toDF("doc_id", "text"), "text", "doc_id", target, background, thr)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("dsir_gate_out").start()
    try {
      ms.addData(docs.take(5): _*)
      q.processAllAvailable()
      ms.addData(docs.drop(5): _*)
      q.processAllAvailable()
      val got = spark.table("dsir_gate_out")
        .select("doc_id", "n_tokens", "log_w").as[(Long, Long, Double)].collect()
      assert(got.map(_._1).toSet == batchKept, s"${got.map(_._1).toSet} vs $batchKept")
      // row-for-row score parity with the batch scorer (per-doc sum
      // order differs, hence the 1e-9 tolerance, not exactness)
      val bw = batchW.map(r => r._1 -> (r._2, r._3)).toMap
      got.foreach { case (id, n, w) =>
        assert(n == bw(id)._1, s"doc $id token count $n vs ${bw(id)._1}")
        assert(math.abs(w - bw(id)._2) < 1e-9, s"doc $id: $w vs ${bw(id)._2}")
      }
    } finally q.stop()
  }

  test("streaming near-dup against a static corpus flags planted copies across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "completely different words about spark clusters and shuffle partitions here"),
      (102L, "another unrelated document mentioning parquet files and columnar storage layouts")
    ).toDF("doc_id", "text")
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = DocStream.nearDupAgainstCorpus(
      ms.toDF.toDF("doc_id", "text"), corpus, "text", "doc_id", threshold = 0.5)
    val q = out.writeStream.outputMode("append").format("memory").queryName("neardup_out").start()
    try {
      // batch 1: exact copy of 100 + an unrelated doc
      ms.addData(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2L, "nothing in common with anything stored previously in the corpus lake"))
      q.processAllAvailable()
      // batch 2: near copy of 100 (one word changed)
      ms.addData((3L, "the quick brown fox jumps over the lazy dog near the river bend today"))
      q.processAllAvailable()
      val got = spark.table("neardup_out")
        .select("doc_id", "corpus_id", "jaccard")
        .as[(Long, Long, Double)].collect()
      // each flagged pair appears EXACTLY once (first-matching-band rule)
      assert(got.map(r => (r._1, r._2)).distinct.length == got.length)
      val byPair = got.map(r => (r._1, r._2) -> r._3).toMap
      assert(byPair.contains((1L, 100L)) && byPair((1L, 100L)) == 1.0)
      assert(byPair.contains((3L, 100L)) && byPair((3L, 100L)) >= 0.5)
      assert(!got.exists(_._1 == 2L)) // unrelated doc never flagged
      assert(!got.exists(r => r._2 == 101L || r._2 == 102L))
    } finally q.stop()
  }

  test("streaming near-dup from a LOADED persisted index matches the in-session corpus build row-for-row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "completely different words about spark clusters and shuffle partitions here"),
      (102L, "another unrelated document mentioning parquet files and columnar storage layouts")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-mh-stream").toString
    graft.dedup.MinHashLsh.saveIndex(corpus, "text", "doc_id", dir)
    val idx = graft.dedup.MinHashLsh.loadIndex(spark, dir)

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batches = Seq(
      Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2L, "nothing in common with anything stored previously in the corpus lake")),
      Seq((3L, "the quick brown fox jumps over the lazy dog near the river bend today")))

    def run(name: String, mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
      val ms = MemoryStream[(Long, String)]
      val q = mk(ms.toDF.toDF("doc_id", "text"))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        batches.foreach { b => ms.addData(b); q.processAllAvailable() }
        spark.table(name).select("doc_id", "corpus_id", "jaccard")
          .as[(Long, Long, Double)].collect().toSet
      } finally q.stop()
    }

    val fromIndex = run("nd_idx",
      df => DocStream.nearDupAgainstIndex(df, idx, "text", "doc_id", threshold = 0.5))
    val fromCorpus = run("nd_mem",
      df => DocStream.nearDupAgainstCorpus(df, corpus, "text", "doc_id", threshold = 0.5))
    assert(fromIndex == fromCorpus && fromIndex.nonEmpty)

    // a gram-hash mismatch is refused up front, not silently zero matches
    val badIdx = idx.copy(gramHashName = "md5_60")
    intercept[IllegalArgumentException](
      DocStream.nearDupAgainstIndex(spark.range(1).toDF(), badIdx, "text", "doc_id", 0.5))
  }

  test("streaming drift monitor: exchangeable batches stay calm, planted mean shift spikes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Seq[Float])]
    val df = ms.toDF.toDF("source", "embedding")
    val out = EmbedStream.driftMonitor(df, "embedding", "source", minHistory = 20L)
    val q = out.writeStream.outputMode("update").format("memory").queryName("drift").start()
    // deterministic base distribution: mean ~0 per dim, spread ~1
    def vec(i: Int, shift: Double): Seq[Float] =
      (0 until 8).map(d => (math.sin(i * 0.71 + d * 1.3) * 1.2 + shift).toFloat)
    try {
      // batch 1: seed history (score 0 — nothing to contradict yet)
      ms.addData((0 until 40).map(i => ("s", vec(i, 0.0))))
      q.processAllAvailable()
      // batch 2: same distribution → modest score
      ms.addData((40 until 80).map(i => ("s", vec(i, 0.0))))
      q.processAllAvailable()
      // batch 3: planted mean shift of ~1σ per dim → z ~ √m per dim
      ms.addData((80 until 120).map(i => ("s", vec(i, 1.0))))
      q.processAllAvailable()
      val rows = spark.table("drift").orderBy("n_seen")
        .select("n_seen", "batch_rows", "drift_score")
        .as[(Long, Long, Double)].collect()
      assert(rows.map(_._1).toSeq == Seq(40L, 80L, 120L))
      assert(rows(0)._3 == 0.0)                      // no history yet
      assert(rows(1)._3 < 3.0, s"calm batch scored ${rows(1)._3}")
      assert(rows(2)._3 > 5 * math.max(rows(1)._3, 0.5),
        s"shifted batch ${rows(2)._3} vs calm ${rows(1)._3}")
      // scoring parity with the standardizer moment identities: replay
      // batch 3's score from the first 80 vectors' moments
      val hist = (0 until 80).map(i => vec(i, 0.0).map(_.toDouble))
      val b3 = (80 until 120).map(i => vec(i, 1.0).map(_.toDouble))
      val z2 = (0 until 8).map { d0 =>
        val mu = hist.map(_(d0)).sum / 80
        val va = hist.map(_(d0)).map(x => (x - mu) * (x - mu)).sum / 79.0
        val bm = b3.map(_(d0)).sum / 40
        val z = (bm - mu) / math.sqrt(va / 40)
        z * z
      }.sum
      assert(math.abs(rows(2)._3 - math.sqrt(z2 / 8)) < 1e-6)
    } finally q.stop()
  }

  test("streaming heavy hitters: live MG guarantee per stratum across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val df = ms.toDF.toDF("lang", "text")
    val cap = 8
    val out = DocStream.heavyHittersStream(df, "text", "lang", capacity = cap)
    val q = out.writeStream.outputMode("update").format("memory").queryName("hh_stream").start()
    // three batches, hot tokens split ACROSS batches so state must carry
    def doc(lang: String, toks: Seq[String]) = (lang, toks.mkString(" "))
    val b1 = Seq(
      doc("en", Seq.fill(30)("hot_a") ++ (1 to 20).map(i => s"d$i")),
      doc("es", Seq.fill(25)("hot_x") ++ (1 to 15).map(i => s"e$i")))
    val b2 = Seq(
      doc("en", Seq.fill(25)("hot_a") ++ Seq.fill(35)("hot_b") ++ (21 to 40).map(i => s"d$i")),
      doc("es", Seq.fill(20)("hot_x") ++ (16 to 30).map(i => s"e$i")))
    val b3 = Seq(
      doc("en", Seq.fill(20)("hot_b") ++ (41 to 55).map(i => s"d$i")))
    try {
      Seq(b1, b2, b3).foreach { b => ms.addData(b); q.processAllAvailable() }
      // LAST emission per stratum = the live sketch after everything
      val rows = spark.table("hh_stream")
        .groupBy("lang").agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct($"n_tokens", $"candidates"), $"n_tokens").as("s"))
        .select($"lang", $"s.n_tokens", $"s.candidates").collect()
      val all = (b1 ++ b2 ++ b3).flatMap { case (l, t) => t.split(" ").map(l -> _) }
      val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nBy = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(rows.map(_.getString(0)).toSet == Set("en", "es"))
      rows.foreach { r =>
        val lang = r.getString(0)
        assert(r.getLong(1) == nBy(lang)) // token mass exact
        val cands = r.getSeq[org.apache.spark.sql.Row](2)
          .map(c => c.getString(0) -> c.getLong(1)).toMap
        assert(cands.size <= cap)
        val bound = nBy(lang).toDouble / (cap + 1)
        exact.collect { case ((l, t), c) if l == lang => t -> c }.foreach { case (t, c) =>
          if (c > bound) assert(cands.contains(t), s"$lang/$t (cnt=$c > $bound) missing")
          cands.get(t).foreach { est =>
            assert(est <= c && c - est <= bound + 1e-9, s"$lang/$t est=$est true=$c")
          }
        }
      }
    } finally q.stop()
  }

  test("streaming CDC gate: corpus-known boilerplate gated out across batches, exact parity with the batch chunker") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, length}
    val base = Tables.documents(spark, sf)
      .where(length(col("text")) > 200).select("text").as[String].take(2)
    val corpus = Seq((100L, base(0)), (101L, base(1))).toDF("doc_id", "text")
    val index = graft.dedup.CdcChunks.hashIndex(corpus, "text", "doc_id").persist()
    val unrelated = (1 to 40).map(i => s"tok${i}q").mkString(" ")

    val streamDocs = Seq(
      (1L, "zz " + base(0)), // shifted copy: shared tail → gated
      (2L, unrelated), //       nothing known → kept
      (3L, base(1))) //         exact copy: share 1.0 → gated

    // ground truth from the BATCH chunker + the same index
    val known = index.as[Long].collect().toSet
    val exp = graft.dedup.CdcChunks
      .chunks(streamDocs.toDF("doc_id", "text"), "text", "doc_id")
      .as[(Long, Int, Int, Int, Long)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        val dup = rs.filter(r => known.contains(r._5))
        val chars = rs.map(_._4).sum
        val share = math.round(dup.map(_._4).sum * 10000.0 / chars) / 10000.0
        id -> (rs.length.toLong, dup.length.toLong, dup.map(_._4).sum.toLong,
          chars.toLong, share)
      }
    assert(exp(3L)._5 == 1.0, "exact copy must be fully corpus-known")
    assert(exp(2L)._3 == 0L, "unrelated doc must share nothing")
    val expKept = exp.filter(_._2._5 < 0.5).keySet

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val out = DocStream.cdcGateStream(
      ms.toDF.toDF("doc_id", "text"), index, "text", "doc_id", maxDupShare = 0.5)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("cdc_gate_out").start()
    try {
      ms.addData(streamDocs.take(2): _*)
      q.processAllAvailable()
      ms.addData(streamDocs.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("cdc_gate_out")
        .select("doc_id", "n_chunks", "dup_chunks", "dup_chars", "n_chars", "dup_share")
        .as[(Long, Long, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      assert(got.keySet == expKept, s"${got.keySet} vs $expKept")
      got.foreach { case (id, r) =>
        val e = exp(id)
        assert((r._2, r._3, r._4, r._5) == ((e._1, e._2, e._3, e._4)),
          s"doc $id stats $r vs $e")
        assert(math.abs(r._6 - e._5) < 1e-9, s"doc $id share ${r._6} vs ${e._5}")
      }
    } finally { q.stop(); index.unpersist() }
  }

  test("streaming Count-Min sketch: cell content EXACTLY equals the batch sketch on any batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(t),
        org.apache.spark.sql.functions.lit(1152921504606846976L))
    val w = 64; val d = 3; val seed = 11L

    val ms = MemoryStream[(String, String)]
    val df = ms.toDF.toDF("lang", "text")
    val out = DocStream.cmsStream(df, "text", "lang", w, d, seed, hashFn)
    val q = out.writeStream.outputMode("update").format("memory").queryName("cms_stream").start()
    val b1 = Seq(("en", "a b a c d"), ("es", "x y x"))
    val b2 = Seq(("en", "a a e f"), ("es", "y z"))
    val b3 = Seq(("en", "g b"))
    try {
      Seq(b1, b2, b3).foreach { b => ms.addData(b); q.processAllAvailable() }
      val live = spark.table("cms_stream")
        .groupBy("lang").agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct($"n_tokens", $"cms"), $"n_tokens").as("s"))
        .select($"lang", $"s.n_tokens", $"s.cms")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap

      val batchDocs = (b1 ++ b2 ++ b3).zipWithIndex
        .map { case ((l, t), i) => (i.toLong, t, l) }.toDF("id", "text", "lang")
      val batch = graft.text.Vocab.cmsSketch(batchDocs, "text", "lang", w, d, seed, hashFn)
        .collect().map(r =>
          r.getString(0) -> (r.getAs[Long]("n_tokens"), r.getSeq[Long](1))).toMap

      assert(live.keySet == Set("en", "es"))
      live.foreach { case (lang, (n, cells)) =>
        assert(n == batch(lang)._1, s"$lang token count")
        assert(cells == batch(lang)._2, s"$lang sketch cells diverge from batch")
      }
    } finally q.stop()
  }

  test("streaming KMV sketch: kept values EXACTLY equal the batch sketch on any batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      graft.functions.SharedHash.md5Long60
    val k = 8

    val ms = MemoryStream[(String, String)]
    val df = ms.toDF.toDF("source", "text")
    val out = DocStream.kmvStream(df, "text", "source", k, hashFn)
    val q = out.writeStream.outputMode("update").format("memory").queryName("kmv_stream").start()
    // s1 exceeds k distinct tokens (estimator branch); s2 stays exact
    val b1 = Seq(("s1", "a b c d e f"), ("s2", "x y"))
    val b2 = Seq(("s1", "g h i j a b"), ("s2", "y z"))
    val b3 = Seq(("s1", "k l m n"), ("s2", "x"))
    try {
      Seq(b1, b2, b3).foreach { b => ms.addData(b); q.processAllAvailable() }
      val live = spark.table("kmv_stream")
        .groupBy("source").agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct($"n_kept", $"kmv", $"theta", $"distinct_est"),
          $"n_kept").as("s"))
        .select($"source", $"s.kmv", $"s.n_kept", $"s.theta", $"s.distinct_est")
        .collect()
        .map(r => r.getString(0) -> (r.getSeq[Long](1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toMap

      val batchDocs = (b1 ++ b2 ++ b3).zipWithIndex
        .map { case ((s, t), i) => (i.toLong, t, s) }.toDF("doc_id", "text", "source")
      val batch = graft.text.CorpusOverlap.sketches(batchDocs, "text", "source", k)
        .collect()
        .map(r => r.getString(r.fieldIndex("corpus")) -> (
          r.getSeq[Long](r.fieldIndex("kmv")),
          r.getLong(r.fieldIndex("n_kept")),
          r.getLong(r.fieldIndex("theta")),
          r.getDouble(r.fieldIndex("distinct_est"))))
        .toMap

      assert(live.keySet == Set("s1", "s2"))
      live.foreach { case (src, got) =>
        assert(got === batch(src), s"$src stream/batch sketch diverge: $got vs ${batch(src)}")
      }
      assert(live("s1")._2 === k.toLong) // estimator branch exercised
      assert(live("s2")._3 === graft.text.CorpusOverlap.M) // exact branch
    } finally q.stop()
  }

  test("streaming funnel ≡ batch userFunnel row-for-row under ts-ordered arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val steps = Seq("signup", "view", "click", "purchase")
    val ev = graft.util.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts")
      .orderBy($"ts") // global ts order implies per-user ts order
      .as[(Long, String, java.sql.Timestamp)].collect()
    val n = ev.length
    val batches = Seq(ev.slice(0, n / 3), ev.slice(n / 3, 2 * n / 3), ev.slice(2 * n / 3, n))

    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val df = ms.toDF.toDF("user_id", "event_type", "ts")
    val out = graft.streaming.EventStream.funnelStream(df, "user_id", "event_type", "ts", steps)
    val q = out.writeStream.outputMode("update").format("memory").queryName("funnel_stream").start()
    try {
      batches.foreach { b => ms.addData(b.toSeq); q.processAllAvailable() }
      val live = spark.table("funnel_stream")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct($"steps_completed", $"t_first", $"t_done"),
          $"steps_completed").as("s"))
        .select($"user_id", $"s.steps_completed", $"s.t_first", $"s.t_done")
        .as[(Long, Int, java.sql.Timestamp, java.sql.Timestamp)]
        .collect().map(r => r._1 -> r).toMap
      val batch = graft.ops.Funnel
        .userFunnel(graft.util.Tables.events(spark, sf), "user_id", "event_type", "ts", steps)
        .as[(Long, Int, java.sql.Timestamp, java.sql.Timestamp)]
        .collect().map(r => r._1 -> r).toMap
      assert(live.keySet === batch.keySet)
      batch.foreach { case (u, row) =>
        assert(live(u) === row, s"user $u stream ${live(u)} vs batch $row")
      }
    } finally q.stop()
  }

  test("streaming categorical drift: chi2 vs running histogram, novel categories flagged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val df = ms.toDF.toDF("src", "lang")
    val out = DocStream.categoryDriftMonitor(df, "lang", "src", minHistory = 50L)
    val q = out.writeStream.outputMode("update").format("memory").queryName("cat_drift").start()
    def batch(counts: (String, Int)*): Seq[(String, String)] =
      counts.flatMap { case (c, n) => Seq.fill(n)(("s1", c)) }
    try {
      // b1 seeds history (scored vs empty: chi2 0, all novel)
      ms.addData(batch("en" -> 80, "de" -> 20)); q.processAllAvailable()
      // b2 identical mix: chi2 exactly 0
      ms.addData(batch("en" -> 80, "de" -> 20)); q.processAllAvailable()
      // b3 flipped mix vs hist(en 160, de 40): (20-80)^2/80 + (80-20)^2/20 = 225
      ms.addData(batch("en" -> 20, "de" -> 80)); q.processAllAvailable()
      // b4 novel category vs hist(en 180, de 120): 15 + 40 = 55, novel 10
      ms.addData(batch("en" -> 90, "zz" -> 10)); q.processAllAvailable()

      val rows = spark.table("cat_drift").orderBy("n_seen").collect()
      assert(rows.length === 4)
      val Seq(r1, r2, r3, r4) = rows.toSeq
      assert(r1.getDouble(3) === 0.0 && r1.getLong(5) === 100L) // pre-history
      assert(r2.getDouble(3) === 0.0 && r2.getLong(5) === 0L)   // identical mix
      assert(math.abs(r3.getDouble(3) - 225.0) < 1e-9 && r3.getLong(4) === 1L)
      assert(math.abs(r4.getDouble(3) - 55.0) < 1e-9 && r4.getLong(5) === 10L)
    } finally q.stop()
  }

  test("stream-stream interval join: clicks attribute to in-window impressions only, across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int): java.sql.Timestamp = new java.sql.Timestamp(3600L * 1000 + min * 60000L)
    val impStream = MemoryStream[(String, java.sql.Timestamp)]
    val clkStream = MemoryStream[(String, java.sql.Timestamp)]
    val out = EventStream.attributionJoin(
      impStream.toDF.toDF("user", "ts"), clkStream.toDF.toDF("user", "ts"),
      "user", "ts", windowMinutes = 30, watermark = "10 minutes")
    val q = out.writeStream.outputMode("append").format("memory").queryName("attr_join").start()
    try {
      // batch 1: impressions only — nothing can match yet
      impStream.addData(Seq(("u1", ts(0)), ("u2", ts(5)), ("u3", ts(0))))
      q.processAllAvailable()
      assert(spark.table("attr_join").count() === 0)
      // batch 2: clicks — u1 in-window, u2 in-window, u3 too late (40 min), u4 has no impression
      clkStream.addData(Seq(("u1", ts(10)), ("u2", ts(34)), ("u3", ts(40)), ("u4", ts(10))))
      q.processAllAvailable()
      val rows = spark.table("attr_join")
        .collect().map(r => (r.getString(0), r.getLong(3))).sortBy(_._1).toSeq
      assert(rows === Seq(("u1", 600L), ("u2", 29L * 60)))
      // batch 3: a later impression for u4 cannot claim the EARLIER click (click before impression)
      impStream.addData(Seq(("u4", ts(20))))
      q.processAllAvailable()
      assert(!spark.table("attr_join").collect().map(_.getString(0)).contains("u4"))
    } finally q.stop()
  }

  test("DimStream.scd2Sink: streamed updates equal sequential batch merges; replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.Scd2
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("scd2s")
    val dimPath = dir.resolve("dim").toString
    Scd2.initial(Seq((1L, "A"), (2L, "B")).toDF("k", "seg"), "k", Seq("seg"), from = 0L)
      .write.parquet(dimPath)

    def table() = spark.read.parquet(dimPath)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("seg"), r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue),
        r.getAs[Boolean]("is_current")))
      .toSeq.sortBy(t => (t._1, t._3))

    val ms = MemoryStream[(Long, String, Long)]
    val q = DimStream.scd2Sink(
      ms.toDF.toDF("k", "seg", "eff"), dimPath, "k", Seq("seg"), "eff",
      dir.resolve("ckpt").toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    // batch 1: change key 1 (with an in-batch duplicate — the later
    // eff wins), insert key 9
    ms.addData((1L, "STALE", 9L), (1L, "A2", 10L), (9L, "NEW", 10L))
    q.processAllAvailable()
    // batch 2: change key 1 again, no-op on key 2
    ms.addData((1L, "A3", 20L), (2L, "B", 20L))
    q.processAllAvailable()
    q.stop()

    // reference: the same two merges applied in batch
    val d0 = Scd2.initial(Seq((1L, "A"), (2L, "B")).toDF("k", "seg"), "k", Seq("seg"), 0L)
    val d1 = Scd2.merge(d0,
      Seq((1L, "A2", 10L), (9L, "NEW", 10L)).toDF("k", "seg", "eff"), "k", Seq("seg"), "eff")
    val d2 = Scd2.merge(d1,
      Seq((1L, "A3", 20L), (2L, "B", 20L)).toDF("k", "seg", "eff"), "k", Seq("seg"), "eff")
    val want = d2.collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("seg"), r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue),
        r.getAs[Boolean]("is_current")))
      .toSeq.sortBy(t => (t._1, t._3))
    val got = table()
    assert(got === want)
    assert(got.count(_._1 == 1L) === 3) // A -> A2 -> A3 version chain

    // at-least-once replay: a FRESH checkpoint reprocesses the same
    // updates against the already-merged table — merge no-ops, the
    // table is unchanged (no duplicate versions)
    val ms2 = MemoryStream[(Long, String, Long)]
    val q2 = DimStream.scd2Sink(
      ms2.toDF.toDF("k", "seg", "eff"), dimPath, "k", Seq("seg"), "eff",
      dir.resolve("ckpt2").toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    ms2.addData((1L, "A3", 20L), (2L, "B", 20L))
    q2.processAllAvailable()
    q2.stop()
    assert(table() === want)

    // crash between the two swap renames: dimPath gone, __old intact.
    // The next batch must roll __old back and merge on top of it.
    val fs = new org.apache.hadoop.fs.Path(dimPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dimPath),
      new org.apache.hadoop.fs.Path(dimPath + "__old")))
    val ms3 = MemoryStream[(Long, String, Long)]
    val q3 = DimStream.scd2Sink(
      ms3.toDF.toDF("k", "seg", "eff"), dimPath, "k", Seq("seg"), "eff",
      dir.resolve("ckpt3").toString,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    ms3.addData((2L, "B2", 30L))
    q3.processAllAvailable()
    q3.stop()
    val afterCrash = table()
    assert(afterCrash.count(_._1 == 1L) === 3)            // prior state recovered
    assert(afterCrash.count(t => t._1 == 2L && t._2 == "B2" && t._5) === 1) // new merge applied
  }

  test("streaming EWMA monitor ≡ batch Ewma.smooth row-for-row across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two keys, in-order arrivals (the stated S27 contract), a spike
    val rows = Seq(
      (1L, ts(0), 1L, 10.0), (1L, ts(1), 2L, 12.0), (1L, ts(2), 3L, 300.0),
      (1L, ts(3), 4L, 11.0),
      (2L, ts(0), 5L, 5.0), (2L, ts(1), 6L, 5.5), (2L, ts(2), 7L, 6.0))
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val df = ms.toDF.toDF("k", "ts", "tie", "v")
    val out = EventStream.ewmaStream(df, "k", "ts", "tie", "v", alpha = 0.3, delta = 100.0)
    val q = out.writeStream.outputMode("append").format("memory").queryName("ewma_s").start()
    try {
      ms.addData(rows.take(3): _*)
      q.processAllAvailable()
      ms.addData(rows.slice(3, 5): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(5): _*)
      q.processAllAvailable()
      val got = spark.table("ewma_s")
        .select("k", "tie", "v", "ewma", "resid", "spike")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5)))
        .toSet
      val batch = graft.ops.Ewma
        .smooth(rows.toDF("k", "ts", "tie", "v"), "k", "ts", "tie", "v", 0.3, 100.0)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5)))
        .toSet
      assert(got === batch)
      // the planted spike flagged
      assert(got.exists(t => t._2 === 3L && t._6))
    } finally q.stop()
  }

  test("streaming HTML extraction gate: stateless, parity with batch Extract, malformed routed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mk = (i: Long, body: String, broken: Boolean) =>
      (i, s"<nav><a href='/'>Home</a> <a href='/a'>About</a></nav><p>$body</p>" +
        (if (broken) "<div class=" else ""))
    val rows = Seq(
      mk(1L, "a long enough real paragraph with plenty of ordinary words inside it", false),
      mk(2L, "too short", false),
      mk(3L, "another long enough paragraph with plenty of perfectly ordinary words", true))
    val ms = MemoryStream[(Long, String)]
    val out = DocStream.extractGateStream(
      ms.toDF.toDF("doc_id", "html"), "html", "doc_id", minBodyWords = 5)
    val q = out.writeStream.outputMode("append").format("memory").queryName("xgate").start()
    try {
      ms.addData(rows.take(2): _*); q.processAllAvailable()
      ms.addData(rows.drop(2): _*); q.processAllAvailable()
      val got = spark.table("xgate").select("doc_id", "malformed").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // 1 and 3 pass the word floor (3 flagged malformed, kept by default); 2 gated out
      assert(got.keySet == Set(1L, 3L))
      assert(got(1L) == 0L && got(3L) == 1L)
      // dropMalformed routes doc 3 out too
      val ms2 = MemoryStream[(Long, String)]
      val out2 = DocStream.extractGateStream(
        ms2.toDF.toDF("doc_id", "html"), "html", "doc_id", minBodyWords = 5,
        dropMalformed = true)
      val q2 = out2.writeStream.outputMode("append").format("memory").queryName("xgate2").start()
      try {
        ms2.addData(rows: _*); q2.processAllAvailable()
        assert(spark.table("xgate2").select("doc_id").collect().map(_.getLong(0)).toSet ==
          Set(1L))
      } finally q2.stop()
    } finally q.stop()
  }

  test("streaming CUSUM monitor ≡ batch Changepoint.cusum across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // key 1: stable then a level shift; key 2: stable throughout
    val vals1 = Seq(10.0, 11, 9, 10, 10, 11, 9, 10, 15, 16, 15, 17, 16, 15)
    val vals2 = Seq(5.0, 5, 6, 5, 5, 6, 5)
    val rows =
      vals1.zipWithIndex.map { case (v, i) => (1L, ts(i), i.toLong, v) } ++
        vals2.zipWithIndex.map { case (v, i) => (2L, ts(i), 100L + i, v) }
    val batchDf = rows.toDF("k", "ts", "tie", "v")
    val batch = graft.ops.Changepoint.cusum(batchDf, "k", "ts", "v", hSigma = 3.0)
      .select("k", "tie", "cusum_pos", "cusum_neg", "alarm", "sigma").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5)))).toMap
    // streaming against the batch's own baseline: same explicit-moment
    // mu/sigma (exact doubles for integer series, NOT the quantized
    // sigma column the batch emits)
    val baseline = Seq(1L -> vals1, 2L -> vals2).map { case (k, vs) =>
      val mu = vs.sum / vs.size
      val sigma = math.sqrt(math.max(0.0, vs.map(v => v * v).sum / vs.size - mu * mu))
      (k, mu, sigma)
    }.toDF("k", "mu", "sigma")
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val out = EventStream.cusumStream(
      ms.toDF.toDF("k", "ts", "tie", "v"), "k", "ts", "tie", "v", baseline, hSigma = 3.0)
    val q = out.writeStream.outputMode("append").format("memory").queryName("cusum_s").start()
    try {
      ms.addData(rows.take(6): _*); q.processAllAvailable()
      ms.addData(rows.slice(6, 15): _*); q.processAllAvailable()
      ms.addData(rows.drop(15): _*); q.processAllAvailable()
      val got = spark.table("cusum_s")
        .select("k", "tie", "cusum_pos", "cusum_neg", "alarm").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
      assert(got.size == rows.size)
      got.foreach { case (key, (cp, cn, al)) =>
        val (bp, bn, ba, _) = batch(key)
        assert(math.abs(cp - bp) < 1e-9, s"$key pos")
        assert(math.abs(cn - bn) < 1e-9, s"$key neg")
        assert(al == ba, s"$key alarm")
      }
      // the level shift alarms in the stream; the stable key never does
      assert(got.exists { case ((k, _), (_, _, al)) => k == 1L && al == 1L })
      assert(got.forall { case ((k, _), (_, _, al)) => k != 2L || al == 0L })
    } finally q.stop()
  }

  test("streaming Page-Hinkley ≡ batch Changepoint.pageHinkley row-for-row across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // key 1: level shift mid-series; key 2: stable
    val v1 = Seq(10.0, 11, 9, 10, 11, 9, 10, 30, 31, 30, 29, 31, 30, 30)
    val v2 = Seq(5.0, 5, 6, 5, 5, 6)
    val rows = v1.zipWithIndex.map { case (v, i) => (1L, ts(i), i.toLong, v) } ++
      v2.zipWithIndex.map { case (v, i) => (2L, ts(i), (100 + i).toLong, v) }

    val batch = graft.ops.Changepoint
      .pageHinkley(rows.toDF("k", "ts", "tie", "v"), "k", "ts", "tie", "v",
        delta = 0.1, lambda = 15.0)
      .select("k", "tie", "ph_up", "ph_dn", "alarm").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap

    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val out = EventStream.pageHinkleyStream(
      ms.toDF.toDF("k", "ts", "tie", "v"), "k", "ts", "tie", "v",
      delta = 0.1, lambda = 15.0)
    val q = out.writeStream.outputMode("append").format("memory").queryName("ph_s").start()
    try {
      ms.addData(rows.take(5): _*); q.processAllAvailable()
      ms.addData(rows.slice(5, 12): _*); q.processAllAvailable()
      ms.addData(rows.drop(12): _*); q.processAllAvailable()
      val got = spark.table("ph_s")
        .select("k", "tie", "ph_up", "ph_dn", "alarm").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
      assert(got.size == rows.size)
      // identical arithmetic, identical order → exact row-for-row parity
      assert(got === batch)
      assert(got.exists { case ((k, _), (_, _, al)) => k == 1L && al == 1L })
      assert(got.forall { case ((k, _), (_, _, al)) => k != 2L || al == 0L })
    } finally q.stop()
  }

  test("streaming last-touch attribution: state carries across micro-batches; lookback filters") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // user 1: click@1, view@3, CONV@4 -> view; click@5, CONV@6 -> click;
    //         touch@10, CONV@200 (lookback 100) -> null channel
    val rows = Seq(
      (1L, ts(1), 1L, "click"), (1L, ts(3), 2L, "view"), (1L, ts(4), 10L, "purchase"),
      (1L, ts(5), 3L, "click"), (1L, ts(6), 11L, "purchase"),
      (1L, ts(10), 4L, "view"), (1L, ts(200), 12L, "purchase"),
      // user 2: conversion with NO prior touch at all
      (2L, ts(2), 20L, "purchase"))
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val out = EventStream.lastTouchStream(
      ms.toDF.toDF("u", "ts", "id", "et"), "u", "ts", "id", "et",
      conversionType = "purchase", touchTypes = Seq("click", "view"), lookbackSec = 100L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("lt_s").start()
    try {
      ms.addData(rows.take(3): _*); q.processAllAvailable()
      ms.addData(rows.slice(3, 6): _*); q.processAllAvailable() // state must carry
      ms.addData(rows.drop(6): _*); q.processAllAvailable()
      val got = spark.table("lt_s")
        .select("conv_id", "channel").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got.size === 4)
      assert(got(10L) === Some("view"))
      assert(got(11L) === Some("click")) // click@5 arrived in a LATER batch than view@3
      assert(got(12L) === None) // view@10 outside the 100s lookback
      assert(got(20L) === None) // no touch ever
    } finally q.stop()
  }

  test("streaming last-touch: same-instant touch counts even when its id exceeds the conversion's") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the batch operator's filter is time-only (__dt >= 0): a touch at
    // the conversion's exact instant attributes regardless of id order.
    // id 99 (touch) > id 5 (conversion), same second — a (ts, id) fold
    // would process the conversion first and miss it.
    val rows = Seq(
      (1L, ts(1), 1L, "click"),
      (1L, ts(4), 99L, "view"), (1L, ts(4), 5L, "purchase"))
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val out = EventStream.lastTouchStream(
      ms.toDF.toDF("u", "ts", "id", "et"), "u", "ts", "id", "et",
      conversionType = "purchase", touchTypes = Seq("click", "view"), lookbackSec = 100L)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("lt_tie").start()
    try {
      ms.addData(rows: _*); q.processAllAvailable()
      val got = spark.table("lt_tie")
        .select("conv_id", "channel", "touch_id").collect()
        .map(r => r.getLong(0) -> ((Option(r.getString(1)), Option(r.get(2))))).toMap
      assert(got(5L)._1 === Some("view"), "same-instant touch must attribute")
      assert(got(5L)._2 === Some(99L))
    } finally q.stop()
  }
}
