package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Tables

class SourcesSpec extends SparkSpec {

  test("JSONL ingest quarantines corrupt lines and keeps the declared schema") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("ingest")
    java.nio.file.Files.writeString(
      dir.resolve("part-0.jsonl"),
      """{"doc_id": 1, "text": "hello world"}
        |{"doc_id": 2, "text": "second doc"}
        |{"doc_id": oops not json
        |{"doc_id": 3, "text": "third"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val s = Ingest.readJsonl(spark, dir.toString, schema)
    try {
      assert(s.good.columns.toSeq == Seq("doc_id", "text"))
      assert(s.good.count() == 3)
      val bad = s.quarantine.collect().map(_.getString(0))
      assert(bad.length == 1 && bad.head.contains("oops"))
    } finally s.release()
  }

  test("CSV ingest quarantines rows that violate the schema") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("ingest_csv")
    java.nio.file.Files.writeString(
      dir.resolve("part-0.csv"),
      """id,score
        |1,0.5
        |2,not_a_number
        |3,0.25
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    val s = Ingest.readCsv(spark, dir.toString, schema)
    try {
      assert(s.good.count() == 2)
      assert(s.quarantine.count() == 1)
    } finally s.release()
  }

  test("StreamingIngest discovers files incrementally, splits good/quarantine exactly once") {
    import org.apache.spark.sql.types._
    val in = java.nio.file.Files.createTempDirectory("sing_in")
    val out = java.nio.file.Files.createTempDirectory("sing_out")
    val good = s"$out/good"; val quar = s"$out/quarantine"; val ckpt = s"$out/ckpt"
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    java.nio.file.Files.writeString(
      in.resolve("a.jsonl"),
      """{"doc_id": 1, "text": "one"}
        |{"doc_id": 2, "text": "two"}
        |{"doc_id": broken line
        |""".stripMargin)
    val q1 = StreamingIngest.runJsonl(spark, in.toString, schema, good, quar, ckpt)
    q1.awaitTermination()
    assert(spark.read.parquet(good).count() == 2)
    assert(spark.read.parquet(quar).collect().map(_.getString(0)).exists(_.contains("broken")))

    // a shard landing later is picked up WITHOUT re-reading the first
    // (checkpointed file log = exactly-once per shard)
    java.nio.file.Files.writeString(
      in.resolve("b.jsonl"),
      """{"doc_id": 3, "text": "three"}
        |also not json
        |""".stripMargin)
    val q2 = StreamingIngest.runJsonl(spark, in.toString, schema, good, quar, ckpt)
    q2.awaitTermination()
    val g = spark.read.parquet(good)
    assert(g.count() == 3)
    assert(g.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet == Set(1L, 2L, 3L))
    assert(spark.read.parquet(quar).count() == 2)
  }

  test("bucketed co-located join runs without any Exchange and matches plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_quantity")
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    Bucketed.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketed.writeBucketed(orders, "ord_b", "l_orderkey", 4)

    // force a sort-merge join so the plan shape (not a broadcast) is
    // what's under test
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.cogroupedJoin(spark, "li_b", "ord_b", "l_orderkey")
      val got = joined.collect()

      // identical rows to the plain (shuffled) join
      val want = li.join(orders, "l_orderkey").collect()
      assert(got.map(_.toString).sorted.toSeq == want.map(_.toString).sorted.toSeq)

      // the executed plan reads both bucketed scans directly: no
      // shuffle on either side (bucket layout satisfies the join's
      // required distribution)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in bucketed join plan:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed scan reports bucket pruning metadata (SelectedBucketsCount)") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_quantity")
    Bucketed.writeBucketed(li, "li_prune", "l_orderkey", 4)
    // the planner turns OFF bucketed scans when no operator needs the
    // distribution ("disabled by query planner") — which also forfeits
    // bucket PRUNING; pin it on for the pruning assertion
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val one = Bucketed.table(spark, "li_prune").where(col("l_orderkey") === 1L)
      one.collect()
      val plan = one.queryExecution.executedPlan.toString
      // an equality filter on the bucket key scans 1 of 4 buckets
      assert(plan.contains("SelectedBucketsCount: 1 out of 4"), plan)
    } finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
  }

  test("ZOrder.write: layout-only rewrite — read-back equality, both dims cluster tightly") {
    import spark.implicits._
    // two INDEPENDENT skewed-ish dims: a linear sort on one can't serve
    // the other, the z-curve serves both
    val rows = (0 until 40000).map { i =>
      val a = (i * 48271) % 40000          // pseudo-shuffled
      val b = (i * 16807) % 40000
      (i.toLong, a.toLong, b.toLong)
    }
    val df = rows.toDF("id", "a", "b").repartition(8)
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val sdir = java.nio.file.Files.createTempDirectory("asort").toString
    ZOrder.write(df, zdir, Seq("a", "b"), files = 64, bits = 8)
    // control: classic single-column sort layout, same file count
    df.repartitionByRange(64, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(sdir)

    val z = spark.read.parquet(zdir)
    // layout only: same schema, same row multiset
    assert(z.schema.fieldNames.toSeq == Seq("id", "a", "b"))
    assert(z.as[(Long, Long, Long)].collect().sorted.toSeq == rows.sorted)

    def filesHit(path: String, pred: Column): Long =
      spark.read.parquet(path).where(pred)
        .select(col("_metadata.file_path")).distinct().count()

    // a 1%-selective range on EACH dim: the z-layout confines either
    // to a handful of the 16 files; the a-sorted control serves only a
    val aPred = col("a").between(10000, 10399)
    val bPred = col("b").between(20000, 20399)
    // ≤ 25% of files on EITHER dim beats the control's non-sort dim
    // (≥ 85%) by 3.5×+; the single-column sort only serves its own dim
    assert(filesHit(zdir, aPred) <= 16, s"z-layout spread a-matches over ${filesHit(zdir, aPred)}/64 files")
    assert(filesHit(zdir, bPred) <= 16, s"z-layout spread b-matches over ${filesHit(zdir, bPred)}/64 files")
    assert(filesHit(sdir, aPred) <= 3)          // the sort's own dim: best case
    assert(filesHit(sdir, bPred) >= 55, "control should smear the non-sort dim")
    // predicates still push to the scan on the rewritten layout
    val plan = spark.read.parquet(zdir).where(aPred).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(a,"), plan)
  }

  test("ZOrder.zKey: quantile buckets keep the curve balanced under heavy skew") {
    import spark.implicits._
    // 90% of mass piled near zero, long thin tail: uniform-range buckets
    // would put 90% of rows in one z-prefix; quantile buckets spread them
    val rows = (0 until 20000).map { i =>
      val v = if (i % 10 < 9) (i % 997).toDouble else 1e6 + i
      (i.toLong, v, (i * 7919 % 20000).toDouble)
    }
    val df = rows.toDF("id", "x", "y")
    val keyed = df.withColumn("__z", ZOrder.zKey(df, Seq("x", "y"), bits = 6))
    val q = keyed.stat.approxQuantile("__z", Array(0.25, 0.5, 0.75), 0.01)
    // a balanced key has genuinely distinct quartiles (no mass collapse)
    assert(q(0) < q(1) && q(1) < q(2), q.mkString(","))
    // every row keyed, key within the 2·6-bit range
    val mm = keyed.agg(min("__z"), max("__z")).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < (1L << 12))
  }

  test("ZOrder boundaries persist via the catalog: appends reuse the exact bucketing") {
    import spark.implicits._
    val rows = (0 until 5000).map { i =>
      (i.toLong, (i * 48271 % 5000).toDouble, (i * 16807 % 5000).toDouble)
    }
    val df = rows.toDF("id", "a", "b")
    val bounds = ZOrder.fitBoundaries(df, Seq("a", "b"), bits = 6)
    val dir = java.nio.file.Files.createTempDirectory("zorder_idx").toString
    ZOrder.saveBoundaries(spark, dir, Seq("a", "b"), 6, bounds)
    val (cols, bits, loaded) = ZOrder.loadBoundaries(spark, dir)
    assert(cols == Seq("a", "b") && bits == 6)
    assert(loaded.zip(bounds).forall { case (l, o) => l.sameElements(o) })
    // the reconstructed key expression matches the in-session one
    // row-for-row — an append bucketized by the persisted entry lands
    // in the same z-ranks as the original write
    val inMem = df.withColumn("__z", ZOrder.zKeyOf(Seq("a", "b"), bounds, 6))
      .select("id", "__z").as[(Long, Long)].collect().toSet
    val fromDisk = df.withColumn("__z", ZOrder.zKeyIndexed(spark, dir))
      .select("id", "__z").as[(Long, Long)].collect().toSet
    assert(inMem == fromDisk)
    // wrong-kind entry rejected on open
    val other = java.nio.file.Files.createTempDirectory("zorder_wrong").toString
    IndexCatalog.write(spark, other, "test_kind", Map(), Seq("p" -> Seq(1).toDF("x")))
    val e = intercept[IllegalArgumentException](ZOrder.loadBoundaries(spark, other))
    assert(e.getMessage.contains("kind"))
  }

  test("IndexCatalog: write/open round-trip, kind validation, incomplete-entry rejection") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("idxcat").toString
    IndexCatalog.write(
      spark, dir, "test_kind",
      Map("alpha" -> "1", "beta" -> "two"),
      Seq(
        "nums" -> Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
        "more" -> Seq((3.5, 7)).toDF("x", "y")))

    val meta = IndexCatalog.open(spark, dir, "test_kind")
    assert(meta.kind == "test_kind" && meta.version == IndexCatalog.FormatVersion)
    assert(meta.props == Map("alpha" -> "1", "beta" -> "two") && meta.propInt("alpha") == 1)
    assert(meta.parts.toSet == Set("nums", "more"))
    assert(IndexCatalog.part(spark, dir, "nums").as[(Long, String)].collect().toSet
      == Set((1L, "a"), (2L, "b")))
    // missing prop names itself in the error
    val missing = intercept[RuntimeException](meta.prop("gamma"))
    assert(missing.getMessage.contains("gamma"), missing.getMessage)

    // opening under the wrong kind fails with a message, not a cast
    // error three calls later
    val wrong = intercept[IllegalArgumentException](IndexCatalog.open(spark, dir, "other_kind"))
    assert(wrong.getMessage.contains("test_kind") && wrong.getMessage.contains("other_kind"))

    // a directory with parts but NO meta marker (interrupted write) is
    // unopenable — never silently half-readable
    val partial = java.nio.file.Files.createTempDirectory("idxcat_part").toString
    Seq((1, 2)).toDF("a", "b").write.parquet(s"$partial/nums")
    val bad = intercept[IllegalStateException](IndexCatalog.open(spark, partial, "test_kind"))
    assert(bad.getMessage.contains("no complete entry"), bad.getMessage)

    // reserved / duplicate part names rejected at write time
    intercept[IllegalArgumentException] {
      IndexCatalog.write(spark, dir, "k", Map(), Seq("_graft_meta" -> Seq((1, 1)).toDF("a", "b")))
    }
    intercept[IllegalArgumentException] {
      IndexCatalog.write(spark, dir, "k", Map(),
        Seq("p" -> Seq((1, 1)).toDF("a", "b"), "p" -> Seq((2, 2)).toDF("a", "b")))
    }
  }

  test("Compact: many small files bin-packed to sized outputs; rows kept; sort stays selective") {
    import spark.implicits._
    val rows = (0 until 20000).map(i => (i.toLong, (i * 48271) % 20000, s"pad_${i % 97}"))
    val in = java.nio.file.Files.createTempDirectory("cmp_in").toString
    val outA = java.nio.file.Files.createTempDirectory("cmp_outa").toString
    val outB = java.nio.file.Files.createTempDirectory("cmp_outb").toString
    // fragment: 64 files of a few hundred rows each
    rows.toDF("id", "k", "pad").repartition(64).write.mode("overwrite").parquet(in)

    // ungrouped: file listing sizes the job, rows survive exactly
    val rep = Compact.compact(spark, in, outA, targetBytes = 256L << 10)
    assert(rep.filesBefore === 64L)
    assert(rep.filesAfter === rep.outputs.toLong)
    assert(rep.filesAfter < 16L, s"still fragmented: ${rep.filesAfter}")
    assert(spark.read.parquet(outA).as[(Long, Long, String)].collect().sorted.toSeq
      == rows.map(r => (r._1, r._2.toLong, r._3)).sorted)

    // sortBy: range partitioning keeps a key predicate confined to few files
    val rep2 = Compact.compact(spark, in, outB, targetBytes = 64L << 10, sortBy = Seq("k"))
    assert(rep2.filesAfter >= 4L, s"need several outputs to test selectivity, got ${rep2.filesAfter}")
    def filesHit(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).where(pred)
        .select(col("_metadata.file_path")).distinct().count()
    val pred = col("k").between(5000, 5199) // 1% of the key range
    assert(filesHit(outB, pred) <= 2L, s"sorted compaction smeared the key: ${filesHit(outB, pred)}/${rep2.filesAfter}")
    assert(filesHit(in, pred) >= 60L, "the fragmented input should smear the key everywhere")
    assert(spark.read.parquet(outB).count() === 20000L)
  }

  test("Rollup: three incremental maintenance rounds equal the one-shot aggregate; crash-safe swap") {
    import spark.implicits._
    val all = (0 until 3000).map(i => (s"k${i % 7}", (i % 100).toDouble))
    val chunks = all.grouped(1000).toSeq
    val statePath = java.nio.file.Files.createTempDirectory("rollup").toString + "/state"
    chunks.foreach { c =>
      Rollup.maintain(spark, statePath, c.toDF("k", "v"), Seq("k"), "v")
    }
    val incr = Rollup.withStats(spark.read.parquet(statePath))
      .collect().map(r => r.getString(0) -> r).toMap
    val direct = Rollup.withStats(Rollup.aggregate(all.toDF("k", "v"), Seq("k"), "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(incr.keySet === direct.keySet)
    incr.foreach { case (k, r) =>
      val d = direct(k)
      assert(r.getLong(1) === d.getLong(1))                      // n
      assert(math.abs(r.getDouble(2) - d.getDouble(2)) < 1e-9)   // s
      assert(r.getDouble(4) === d.getDouble(4))                  // mn
      assert(r.getDouble(5) === d.getDouble(5))                  // mx
      assert(math.abs(r.getDouble(6) - d.getDouble(6)) < 1e-9)   // mean
      assert(math.abs(r.getDouble(7) - d.getDouble(7)) < 1e-6)   // variance
    }
    // staging/old are cleaned up after the swap
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(statePath + "__staging")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(statePath + "__old")))
  }

  test("Observe: write-job metrics equal direct aggregation; single scan (no second metrics pass)") {
    import spark.implicits._
    val df = (0 until 5000)
      .map(i => (i.toLong, if (i % 10 == 0) null else s"v$i", (i % 50).toDouble))
      .toDF("id", "txt", "score")
    val out = java.nio.file.Files.createTempDirectory("observe").toString + "/data"
    val m = Observe.writeWithMetrics(df, out, Map(
      "rows" -> count(lit(1)),
      "null_txt" -> sum(when(col("txt").isNull, 1L).otherwise(0L)),
      "score_sum" -> sum(col("score"))))
    assert(m("rows") === 5000L)
    assert(m("null_txt") === 500L)
    assert(math.abs(m("score_sum").asInstanceOf[Double] -
      df.agg(sum("score")).head().getDouble(0)) < 1e-9)
    assert(spark.read.parquet(out).count() === 5000L)
  }

  private def scd2Rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long, Option[Long], Boolean)] =
    df.collect().map { r =>
      (r.getAs[Long]("k"), r.getAs[String]("seg"), r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.longValue), r.getAs[Boolean]("is_current"))
    }.toSeq.sortBy(t => (t._1, t._3))

  test("Scd2.merge: changed keys close+reopen, unchanged keep, new keys insert") {
    import spark.implicits._
    val snap = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "seg")
    val dim0 = Scd2.initial(snap, "k", Seq("seg"), from = 0L)
    val upd = Seq(
      (1L, "A2", 10L), // changed
      (2L, "B", 10L), // identical → no-op
      (9L, "NEW", 10L) // unknown key
    ).toDF("k", "seg", "eff")
    val out = scd2Rows(Scd2.merge(dim0, upd, "k", Seq("seg"), "eff"))
    assert(out === Seq(
      (1L, "A", 0L, Some(10L), false),
      (1L, "A2", 10L, None, true),
      (2L, "B", 0L, None, true),
      (3L, "C", 0L, None, true),
      (9L, "NEW", 10L, None, true)))
  }

  test("Scd2.merge is idempotent and chains versions across rounds") {
    import spark.implicits._
    val dim0 = Scd2.initial(Seq((1L, "A")).toDF("k", "seg"), "k", Seq("seg"), from = 0L)
    val upd1 = Seq((1L, "A2", 10L)).toDF("k", "seg", "eff")
    val dim1 = Scd2.merge(dim0, upd1, "k", Seq("seg"), "eff")
    // re-merging the same batch (now matching the open version) changes nothing
    val again = Scd2.merge(dim1, upd1, "k", Seq("seg"), "eff")
    assert(scd2Rows(again) === scd2Rows(dim1))
    // a later round chains: every closed version's valid_to is its successor's valid_from
    val dim2 = Scd2.merge(dim1, Seq((1L, "A3", 20L)).toDF("k", "seg", "eff"),
      "k", Seq("seg"), "eff")
    assert(scd2Rows(dim2) === Seq(
      (1L, "A", 0L, Some(10L), false),
      (1L, "A2", 10L, Some(20L), false),
      (1L, "A3", 20L, None, true)))
  }

  test("Scd2.merge: null-safe tracked comparison and duplicate-key batches raise") {
    import spark.implicits._
    val dim0 = Scd2.initial(
      Seq((1L, null.asInstanceOf[String])).toDF("k", "seg"), "k", Seq("seg"), from = 0L)
    // null → null is NOT a change
    val same = Scd2.merge(dim0,
      Seq((1L, null.asInstanceOf[String], 5L)).toDF("k", "seg", "eff"),
      "k", Seq("seg"), "eff")
    assert(scd2Rows(same) === Seq((1L, null, 0L, None, true)))
    // null → value IS a change
    val chg = Scd2.merge(dim0, Seq((1L, "X", 5L)).toDF("k", "seg", "eff"),
      "k", Seq("seg"), "eff")
    assert(scd2Rows(chg).map(_._5) === Seq(false, true))
    val dup = Seq((1L, "X", 5L), (1L, "Y", 5L)).toDF("k", "seg", "eff")
    val ex = intercept[Exception] {
      Scd2.merge(dim0, dup, "k", Seq("seg"), "eff").collect()
    }
    assert(ex.getMessage != null)
  }

  test("Snapshots: append/overwrite versioning, time travel, torn commits invisible") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-snap").toString
    // v1: append 3 rows; v2: append 2 more; v3: overwrite with 1
    val v1 = Snapshots.append(spark, root, Seq(1, 2, 3).toDF("x"))
    val v2 = Snapshots.append(spark, root, Seq(4, 5).toDF("x"))
    assert(v1 === 1 && v2 === 2)
    assert(Snapshots.readVersion(spark, root, 1).as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    assert(Snapshots.readVersion(spark, root, 2).as[Int].collect().sorted.toSeq === Seq(1, 2, 3, 4, 5))
    assert(Snapshots.readLatest(spark, root).count() === 5L)

    val v3 = Snapshots.overwrite(spark, root, Seq(9).toDF("x"))
    assert(v3 === 3)
    assert(Snapshots.readLatest(spark, root).as[Int].collect().toSeq === Seq(9))
    // time travel still sees v1/v2 unchanged after the overwrite
    assert(Snapshots.readVersion(spark, root, 1).count() === 3L)
    assert(Snapshots.versions(spark, root) === Seq(1, 2, 3))

    // torn commit: a data dir WITHOUT a manifest must be invisible to
    // readers and must not block the next committed version
    Seq(99).toDF("x").write.parquet(s"$root/data/v4-torn")
    assert(Snapshots.versions(spark, root) === Seq(1, 2, 3))
    assert(Snapshots.readLatest(spark, root).as[Int].collect().toSeq === Seq(9))
    // ...and an incomplete MANIFEST dir (no _graft_meta) is skipped too
    new java.io.File(s"$root/_manifests/v5").mkdirs()
    assert(Snapshots.versions(spark, root) === Seq(1, 2, 3))

    // append after the torn artifacts: commits as v4, orphan dir and
    // orphan manifest dir stay inert, data unaffected
    val v4 = Snapshots.append(spark, root, Seq(7).toDF("x"))
    assert(v4 === 4)
    assert(Snapshots.readLatest(spark, root).as[Int].collect().sorted.toSeq === Seq(7, 9))
    assert(Snapshots.readVersion(spark, root, 2).count() === 5L)

    // VACUUM: keep the latest 2 versions; v1/v2 manifests and every
    // unreferenced data dir (incl. the torn v4-torn orphan) are gone,
    // the kept history still reads exactly
    val (dropped, deleted) = Snapshots.vacuum(spark, root, keepVersions = 2)
    assert(dropped === 2)
    assert(deleted >= 3) // v1's dir, v2's dir, the torn orphan
    assert(Snapshots.versions(spark, root) === Seq(3, 4))
    assert(Snapshots.readVersion(spark, root, 3).as[Int].collect().toSeq === Seq(9))
    assert(Snapshots.readLatest(spark, root).as[Int].collect().sorted.toSeq === Seq(7, 9))
    assert(intercept[Exception] { Snapshots.readVersion(spark, root, 1) } != null)
    // idempotent: vacuuming again deletes nothing further
    assert(Snapshots.vacuum(spark, root, keepVersions = 2) === ((0, 0)))
  }
}
