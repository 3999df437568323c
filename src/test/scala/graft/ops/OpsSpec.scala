package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("Grouped.aggregate matches pandas-groupby semantics (reference test_groupby_apply_mean)") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("k", "y")
    val got = Grouped
      .aggregate(df, Seq("k"), Seq(avg(col("y")).as("m")))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assert(got == Map("a" -> 2.0, "b" -> 10.0))
  }

  test("Grouped.transform broadcasts the group stat to every row (reference test_groupby_transform_mean)") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("k", "y")
    val got = Grouped
      .transform(df, Seq("k"), Seq(avg(col("y")).as("m")))
      .select(col("k"), col("y"), col("m"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    assert(got == Set(("a", 1.0, 2.0), ("a", 3.0, 2.0), ("b", 10.0, 10.0)))
  }

  test("Lags.makeLags produces within-group lags and leads in explicit order") {
    val df = Seq(
      ("g1", 1, 10.0), ("g1", 2, 20.0), ("g1", 3, 30.0), ("g2", 1, 100.0), ("g2", 2, 200.0)
    ).toDF("g", "t", "y")
    val out = Lags
      .makeLags(df, Seq("g"), Seq("t"), Seq("y"), nLagsBack = 1, nLagsForward = 1, fillZeros = false)
      .orderBy("g", "t")
      .select("g", "t", "y_lag_1", "y_lag_-1")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), Option(r.get(2)), Option(r.get(3))))
    assert(
      out.toSeq == Seq(
        ("g1", 1, None, Some(20.0)),
        ("g1", 2, Some(10.0), Some(30.0)),
        ("g1", 3, Some(20.0), None),
        ("g2", 1, None, Some(200.0)),
        ("g2", 2, Some(100.0), None)
      )
    )
  }

  test("Lags.makeLags fillZeros sets 0 + missing indicator (reference hdfe.py:280-297)") {
    val df = Seq(("g1", 1, 10.0), ("g1", 2, 20.0)).toDF("g", "t", "y")
    val out = Lags
      .makeLags(df, Seq("g"), Seq("t"), Seq("y"), nLagsBack = 1, nLagsForward = 0, fillZeros = true)
      .orderBy("t")
      .select("y_lag_1", "y_lag_1_mi")
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(out.toSeq == Seq((0.0, 1.0), (10.0, 0.0)))
  }

  test("Dummies.oneHot matches reference make_dummies on categories (reference test_make_dummies_cat)") {
    val df = Seq("horse", "cat", "cat").toDF("animal")
    val out = Dummies
      .oneHot(df, "animal")
      .select("animal_cat", "animal_horse")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    // np.unique sorts: cat, horse — rows keep input order semantics via values
    assert(out.toSeq == Seq((0, 1), (1, 0), (1, 0)))
  }

  test("Dummies.oneHot dropLast drops the last sorted category (reference drop_col)") {
    val df = Seq("horse", "cat", "cat").toDF("animal")
    val out = Dummies.oneHot(df, "animal", dropLast = true)
    assert(out.columns.toSeq == Seq("animal", "animal_cat"))
  }

  test("Dummies.allDummies keeps first categorical complete, drops last of the rest") {
    val df = Seq(("a", "x"), ("b", "y"), ("a", "y")).toDF("c1", "c2")
    val out = Dummies.allDummies(df, Seq("c1", "c2"))
    assert(out.columns.toSeq == Seq("c1", "c2", "c1_a", "c1_b", "c2_x"))
  }

  test("Dummies.categories fails fast above maxCategories instead of collecting the column") {
    val df = spark.range(0, 500).selectExpr("cast(id as string) as k")
    val err = intercept[IllegalArgumentException] {
      Dummies.categories(df, "k", maxCategories = 100)
    }
    assert(err.getMessage.contains("more than 100 distinct values"))
    // at-or-under the ceiling still works (probe collects limit+1 rows max)
    assert(Dummies.categories(df.limit(100), "k", maxCategories = 100).size == 100)
  }

  test("TrainingShards: every chunk lands in exactly one bin, deterministically, tokens intact") {
    val docs = graft.util.Tables.documents(spark, sf).limit(30)
    val vocab = graft.text.Bpe.trainOn(docs, "text", numMerges = 40)
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    graft.ops.TrainingShards.write(docs, "text", "doc_id", vocab,
      chunkSize = 16, overlap = 0, budget = 64L, path = dir)
    val back = spark.read.parquet(dir)
      .select("bin", "bin_pos", "doc_id", "chunk_id", "n_tokens", "tokens")
      .as[(Long, Long, Long, Long, Long, Seq[Int])].collect()

    // completeness: the shard set IS the chunk set, exactly once
    val chunks = graft.text.Bpe.chunk(docs, "text", "doc_id", vocab, 16, 0)
      .select("doc_id", "chunk_id", "tokens")
      .as[(Long, Long, Seq[Int])].collect()
    assert(back.map(r => (r._3, r._4)).toSet == chunks.map(c => (c._1, c._2)).toSet)
    assert(back.length == chunks.length)
    // token payloads survive the pack + partitioned write byte for byte
    val byKey = chunks.map(c => (c._1, c._2) -> c._3).toMap
    back.foreach(r => assert(r._6 == byKey((r._3, r._4))))
    // bins fill densely: a chunk STARTS in its bin at bin_pos < budget
    assert(back.forall(_._2 < 64L))
    val bins = back.map(_._1).distinct.sorted
    assert(bins.toSeq == (0L to bins.max).toSeq)
    // deterministic: a second write assigns identical (bin, bin_pos)
    val dir2 = java.nio.file.Files.createTempDirectory("shards2").toString
    graft.ops.TrainingShards.write(docs, "text", "doc_id", vocab,
      chunkSize = 16, overlap = 0, budget = 64L, path = dir2)
    val again = spark.read.parquet(dir2)
      .select("bin", "bin_pos", "doc_id", "chunk_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(again == back.map(r => (r._1, r._2, r._3, r._4)).toSet)
  }

  test("TrainingShards fails fast on doc ids outside the packable key range") {
    val docs = graft.util.Tables.documents(spark, sf).limit(5)
    val vocab = graft.text.Bpe.trainOn(docs, "text", numMerges = 20)
    // id · 2^20 would overflow the packed long — must error, not collide
    val bad = docs.withColumn("doc_id", col("doc_id") + lit(Long.MaxValue / (1L << 20)))
    val err = intercept[Exception] {
      graft.ops.TrainingShards.shards(bad, "text", "doc_id", vocab,
        chunkSize = 16, overlap = 0, budget = 64L).count()
    }
    val chain = Iterator.iterate[Throwable](err)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString("|")
    assert(chain.contains("out of packable range"), chain.take(500))

    // a NULL id must fail LOUDLY somewhere, never collapse every chunk
    // of the doc onto one null packing key: today Bpe.chunk's typed
    // encoder rejects it (NOT_NULL_ASSERT_VIOLATION); the __ck guard's
    // isNull arm is the backstop should that path ever change
    val nullId = docs.withColumn(
      "doc_id", when(col("doc_id") % 2 === 0, col("doc_id")).otherwise(lit(null).cast("long")))
    val err2 = intercept[Exception] {
      graft.ops.TrainingShards.shards(nullId, "text", "doc_id", vocab,
        chunkSize = 16, overlap = 0, budget = 64L).count()
    }
    val chain2 = Iterator.iterate[Throwable](err2)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString("|")
    assert(
      chain2.contains("out of packable range") || chain2.contains("NOT_NULL_ASSERT_VIOLATION"),
      chain2.take(500))
  }

  test("AsOf.joinAsOf picks latest preceding right row; ties and strictness honored") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val left = Seq(
      (1L, 10L, ts(5)),  // after r@0 → 100
      (2L, 10L, ts(10)), // tie with r@10 → 200 (>= semantics)
      (3L, 10L, ts(3)),  // after r@0 → 100
      (4L, 11L, ts(7)),  // user with no right rows → null
      (5L, 10L, ts(0))   // tie with r@0 → 100
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(0), 100.0),
      (10L, ts(10), 200.0)
    ).toDF("user_id", "ts", "v")

    val out = AsOf
      .joinAsOf(left, right, Seq("user_id"), "ts", "ts", Seq("v"))
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(
      1L -> Some(100.0), 2L -> Some(200.0), 3L -> Some(100.0), 4L -> None, 5L -> Some(100.0)))

    // strict: at equal ts the right row is NOT visible
    val strictOut = AsOf
      .joinAsOf(left, right, Seq("user_id"), "ts", "ts", Seq("v"), strict = true)
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(strictOut(2L) == Some(100.0)) // tie excluded → previous row
    assert(strictOut(5L) == None)        // tie excluded → nothing before
  }

  test("AsOf.joinAsOfForward picks earliest following right row; ties and strictness honored") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val left = Seq(
      (1L, 10L, ts(5)),  // before r@10 → 200
      (2L, 10L, ts(10)), // tie with r@10 → 200 (>= semantics)
      (3L, 10L, ts(11)), // after the last right row → null
      (4L, 11L, ts(7)),  // user with no right rows → null
      (5L, 10L, ts(0))   // tie with r@0 → 100
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(0), 100.0),
      (10L, ts(10), 200.0)
    ).toDF("user_id", "ts", "v")
    val out = AsOf
      .joinAsOfForward(left, right, Seq("user_id"), "ts", "ts", Seq("v"))
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(
      1L -> Some(200.0), 2L -> Some(200.0), 3L -> None, 4L -> None, 5L -> Some(100.0)))
    val strictOut = AsOf
      .joinAsOfForward(left, right, Seq("user_id"), "ts", "ts", Seq("v"), strict = true)
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(strictOut(2L) == None)        // tie excluded → nothing after
    assert(strictOut(5L) == Some(200.0)) // tie excluded → NEXT row
  }

  test("AsOf.joinAsOfTolerance: match at exactly the tolerance kept, staler nulled, no-match stays null") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val left = Seq(
      (1L, 10L, ts(5)),  // 5 min after r@0: exactly 300s → kept at tol 300
      (2L, 10L, ts(6)),  // 360s stale → nulled
      (3L, 10L, ts(0)),  // exact tie, 0s → kept
      (4L, 11L, ts(7))   // no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts(0), 100.0)).toDF("user_id", "ts", "v")
    val out = AsOf
      .joinAsOfTolerance(left, right, Seq("user_id"), "ts", "ts", Seq("v"), toleranceSec = 300.0)
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(1L -> Some(100.0), 2L -> None, 3L -> Some(100.0), 4L -> None))
  }

  test("RangeJoin.pointInInterval equals the naive inequality join") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val points = (0 until 120 by 7).map(m => (m.toLong, ts(m))).toDF("pid", "ts")
    val intervals = Seq(
      ("a", ts(0), ts(30)),    // spans several 10-min bins
      ("b", ts(25), ts(35)),   // overlaps a
      ("c", ts(100), ts(100)), // zero-length
      ("d", ts(200), ts(210))  // matches nothing
    ).toDF("iid", "ws", "we")

    val binned = RangeJoin
      .pointInInterval(points, intervals, "ts", "ws", "we", binSeconds = 600L)
      .select("pid", "iid").collect().map(_.toString).sorted.toSeq
    val naive = points.join(intervals, col("ts").between(col("ws"), col("we")))
      .select("pid", "iid").collect().map(_.toString).sorted.toSeq
    assert(binned == naive)
    assert(binned.nonEmpty)
  }

  test("RangeJoin.intervalOverlap equals the naive inequality join; bin-width invariant; no duplicate pairs") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val rng = new scala.util.Random(3)
    val left = (0 until 40).map { i =>
      val s0 = rng.nextInt(600); (i.toLong, ts(s0), ts(s0 + 1 + rng.nextInt(90)))
    }.toDF("lid", "ls", "le")
    val right = (0 until 40).map { i =>
      val s0 = rng.nextInt(600); (i.toLong, ts(s0), ts(s0 + 1 + rng.nextInt(90)))
    }.toDF("rid", "rs", "re")
    val naive = left.join(right, col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(_.toString).sorted.toSeq
    for (bin <- Seq(300L, 600L, 3600L)) {
      val got = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", bin)
        .select("lid", "rid").collect().map(_.toString).toSeq
      assert(got.sorted == naive, s"bin=$bin")
      assert(got.distinct.size == got.size, s"bin=$bin produced duplicate pairs")
    }
    assert(naive.nonEmpty)
  }

  test("RangeJoin.intervalOverlap: touching endpoints included (closed), disjoint excluded") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val left = Seq((1L, ts(0), ts(10))).toDF("lid", "ls", "le")
    val right = Seq(
      (1L, ts(10), ts(20)), // touches at the endpoint → included
      (2L, ts(11), ts(20)) // strictly after → excluded
    ).toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", 600L)
      .select("rid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  test("Sampling.stratifiedKFold: per-stratum balance within 1, deterministic, complete") {
    val df = ((0 until 100).map(i => (i.toLong, "big")) ++
      (1000 until 1007).map(i => (i.toLong, "tiny"))).toDF("doc_id", "strata")
    val f1 = Sampling.stratifiedKFold(df, "doc_id", "strata", k = 5)
      .select("doc_id", "strata", "fold").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(f1.length === 107)
    // every stratum's fold sizes differ by at most 1 — even the 7-row one
    for ((st, rows) <- f1.groupBy(_._2)) {
      val sizes = rows.groupBy(_._3).view.mapValues(_.size).values
      assert(sizes.max - sizes.min <= 1, s"$st folds unbalanced: $sizes")
      assert(rows.map(_._3).toSet.subsetOf((0 until 5).toSet))
    }
    val f2 = Sampling.stratifiedKFold(df, "doc_id", "strata", k = 5)
      .select("doc_id", "fold").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(f1.map(r => r._1 -> r._3).toMap === f2) // bit-deterministic
    // a different salt deals differently
    val f3 = Sampling.stratifiedKFold(df, "doc_id", "strata", k = 5, salt = "cv2")
      .select("doc_id", "fold").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(f2 !== f3)
  }

  test("Grouped.rollingByTime: trailing RANGE window by event time, equal timestamps pooled") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    val df = Seq(
      (1L, "u", ts(0), 1.0), (2L, "u", ts(10), 2.0), (3L, "u", ts(30), 4.0),
      (4L, "u", ts(100), 8.0),
      (5L, "u", ts(100), 16.0), // same second as 4 → both windows include both
      (6L, "w", ts(5), 100.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = graft.ops.Grouped.rollingByTime(
      df, Seq("user_id"), "ts", windowSec = 25,
      Seq(c => sum(c), c => count(c)), "value", Seq("rs", "rn"))
      .select("event_id", "rs", "rn").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out(1L) === ((1.0, 1L)))
    assert(out(2L) === ((3.0, 2L))) // 0 and 10 within 25s
    assert(out(3L) === ((6.0, 2L))) // 10 and 30; 0 fell out
    assert(out(4L) === ((24.0, 2L))) // RANGE: the equal-ts row 5 is included
    assert(out(5L) === ((24.0, 2L)))
    assert(out(6L) === ((100.0, 1L))) // other key untouched
  }

  test("Transitions.matrix: hand-computed pairs, terminal rows, per-from probabilities sum to 1") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    val df = Seq(
      (1L, "u1", ts(0), "view"), (2L, "u1", ts(1), "cart"), (3L, "u1", ts(2), "buy"),
      (4L, "u2", ts(0), "view"), (5L, "u2", ts(1), "leave"),
      (6L, "u3", ts(0), "view"), (7L, "u3", ts(1), "cart"), (8L, "u3", ts(2), "leave")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.ops.Transitions.matrix(df, "user_id", "ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(("view", "cart")) === ((2L, 0.666667)))
    assert(out(("view", "leave")) === ((1L, 0.333333)))
    assert(out(("cart", "buy")) === ((1L, 0.5)))
    assert(out(("cart", "leave")) === ((1L, 0.5)))
    assert(out(("buy", "__end")) === ((1L, 1.0)))
    assert(out(("leave", "__end")) === ((2L, 1.0)))
    // per-from probability mass is 1
    out.keys.map(_._1).toSeq.distinct.foreach { f =>
      val mass = out.collect { case ((`f`, _), (_, p)) => p }.sum
      assert(math.abs(mass - 1.0) < 1e-4, s"$f mass $mass")
    }
  }

  test("Transitions.ngrams: hand trigram counts; incomplete tails dropped; share fixed before the prune") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    // u1: a b c d → abc, bcd ; u2: a b c → abc ; u3: a b → no trigram
    val df = Seq(
      (1L, "u1", ts(0), "a"), (2L, "u1", ts(1), "b"), (3L, "u1", ts(2), "c"), (4L, "u1", ts(3), "d"),
      (5L, "u2", ts(0), "a"), (6L, "u2", ts(1), "b"), (7L, "u2", ts(2), "c"),
      (8L, "u3", ts(0), "a"), (9L, "u3", ts(1), "b")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.ops.Transitions.ngrams(df, "user_id", "ts", "event_type", "event_id", n = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out === Map("a>b>c" -> ((2L, 0.666667)), "b>c>d" -> ((1L, 0.333333))))

    // minCount prunes rows but the share denominator stays the full n-gram count
    val pruned = graft.ops.Transitions.ngrams(df, "user_id", "ts", "event_type", "event_id",
      n = 3, minCount = 2L).collect()
    assert(pruned.length === 1)
    assert(pruned.head.getDouble(2) === 0.666667)
  }

  test("Abtest.srm: hand chi-square; zero-count arm charges its full expectation; unknown arm fails fast") {
    import org.apache.spark.sql.functions.col
    // 90 units in main, 30 in holdout; expected 0.8/0.2 of 120 → E=96/24
    val df = ((1 to 90).map(i => (s"m$i", "main")) ++ (1 to 30).map(i => (s"h$i", "holdout")))
      .toDF("u", "arm")
    val out = Abtest.srm(df, "u", col("arm"), Seq(("main", 0.8), ("holdout", 0.2)))
      .collect().map(r => r.getString(0) -> r).toMap
    val chi = math.pow(90 - 96.0, 2) / 96.0 + math.pow(30 - 24.0, 2) / 24.0
    assert(out("main").getAs[Long]("n_units") === 90L)
    assert(math.abs(out("main").getAs[Double]("chi2") - math.floor(chi * 1e6 + 0.5) / 1e6) < 1e-9)
    assert(out("main").getAs[Long]("dof") === 1L)

    // an arm in `expected` that never shows up still contributes (0−E)²/E
    val one = Seq(("u1", "main"), ("u2", "main")).toDF("u", "arm")
    val r2 = Abtest.srm(one, "u", col("arm"), Seq(("main", 0.5), ("ghost", 0.5)))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(r2("ghost").getAs[Long]("n_units") === 0L)
    assert(r2("ghost").getAs[Double]("chi2") === 2.0) // (0-1)²/1 + (2-1)²/1

    // observed arm missing from `expected` → raise_error
    val bad = Seq(("u1", "typo")).toDF("u", "arm")
    intercept[Exception] {
      Abtest.srm(bad, "u", col("arm"), Seq(("main", 1.0))).collect()
    }
  }

  test("AsOf.joinNearest: direction choice, backward tie-break, tolerance, no-candidate null") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    // right points for key 1 at t=100 (r1) and t=200 (r2)
    val right = Seq((1L, ts(100), "r1"), (1L, ts(200), "r2")).toDF("k", "rts", "tag")
    val left = Seq(
      (10L, 1L, ts(120)), // nearer to 100 (20s) than 200 (80s) → r1
      (11L, 1L, ts(180)), // nearer to 200 → r2
      (12L, 1L, ts(150)), // exact tie 50/50 → backward → r1
      (13L, 1L, ts(400)), // 200s from r2 > tolerance → null
      (14L, 2L, ts(100))  // no right rows for key 2 → null
    ).toDF("id", "k", "ts")
    val out = AsOf.joinNearest(left, right, Seq("k"), "ts", "rts", Seq("tag"),
      toleranceSec = 100L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getAs[String]("tag")),
          if (r.isNullAt(r.fieldIndex("matched_dist_ms"))) None
          else Some(r.getAs[Long]("matched_dist_ms"))))).toMap
    assert(out(10L) === ((Some("r1"), Some(20000L))))
    assert(out(11L) === ((Some("r2"), Some(20000L))))
    assert(out(12L) === ((Some("r1"), Some(50000L))))
    assert(out(13L) === ((None, None)))
    assert(out(14L) === ((None, None)))
    // an exact-timestamp right row matches at distance 0
    val exact = Seq((20L, 1L, ts(200))).toDF("id", "k", "ts")
    val r0 = AsOf.joinNearest(exact, right, Seq("k"), "ts", "rts", Seq("tag"), 100L).head()
    assert(r0.getAs[String]("tag") === "r2")
    assert(r0.getAs[Long]("matched_dist_ms") === 0L)
  }

  test("Sampling.deterministicSplit is stable, complete, and near the target fractions") {
    val ids = (0L until 2000L).toDF("doc_id")
    val s1 = Sampling.deterministicSplit(ids, "doc_id")
      .as[(Long, String)].collect().toMap
    val s2 = Sampling.deterministicSplit(ids, "doc_id")
      .as[(Long, String)].collect().toMap
    assert(s1 == s2) // identical across runs
    assert(s1.size == 2000) // complete: every id assigned exactly once
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.90) < 0.03)
    assert(math.abs(frac("val") - 0.05) < 0.02)
    assert(math.abs(frac("test") - 0.05) < 0.02)
    // growing the corpus never reassigns an existing id
    val s3 = Sampling.deterministicSplit((0L until 4000L).toDF("doc_id"), "doc_id")
      .as[(Long, String)].collect().toMap
    assert(s1.forall { case (id, sp) => s3(id) == sp })
    // the shuffle key is deterministic and salt-sensitive
    val k1 = ids.select(Sampling.shuffleKey(col("doc_id")).as("k")).as[Long].collect().toSeq
    val k2 = ids.select(Sampling.shuffleKey(col("doc_id")).as("k")).as[Long].collect().toSeq
    val k3 = ids.select(Sampling.shuffleKey(col("doc_id"), "epoch1").as("k")).as[Long].collect().toSeq
    assert(k1 == k2 && k1 != k3)
  }

  test("Sampling.takePerStratum returns exactly n deterministic rows per stratum") {
    val df = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val s1 = Sampling.takePerStratum(df, "stratum", "id", n = 7)
      .select("id", "stratum").as[(Long, String)].collect().toSet
    val s2 = Sampling.takePerStratum(df, "stratum", "id", n = 7)
      .select("id", "stratum").as[(Long, String)].collect().toSet
    assert(s1 == s2)
    assert(s1.groupBy(_._2).view.mapValues(_.size).toMap == Map("s0" -> 7, "s1" -> 7, "s2" -> 7))
    // a different salt draws a different sample
    val s3 = Sampling.takePerStratum(df, "stratum", "id", n = 7, salt = "other")
      .select("id", "stratum").as[(Long, String)].collect().toSet
    assert(s1 != s3)
  }

  test("Sampling.writeShuffled materializes one deterministic global shuffle order") {
    val ids = (0L until 1000L).toDF("doc_id")
    val dir = java.nio.file.Files.createTempDirectory("shuf").toString
    Sampling.writeShuffled(ids, "doc_id", dir, numFiles = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.toString).sorted
    assert(files.length == 4)
    // reading files in name order must replay ONE global order by key
    val replayed = files.flatMap { f =>
      spark.read.parquet(f).select("doc_id").as[Long].collect()
    }.toSeq
    assert(replayed.toSet == (0L until 1000L).toSet) // complete, no dup
    val keys = ids.sparkSession.createDataset(replayed)
      .select(Sampling.shuffleKey(col("value")).as("k")).as[Long].collect().toSeq
    assert(keys == keys.sorted) // globally ordered across file boundaries
    assert(replayed != (0L until 1000L).toSeq) // actually shuffled
    // same salt → identical order on a rewrite
    val dir2 = java.nio.file.Files.createTempDirectory("shuf2").toString
    Sampling.writeShuffled(ids, "doc_id", dir2, numFiles = 4)
    val files2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.toString).sorted
    val replayed2 = files2.flatMap { f =>
      spark.read.parquet(f).select("doc_id").as[Long].collect()
    }.toSeq
    assert(replayed == replayed2)
  }

  test("Salt.saltedJoin equals plain join on a skewed key distribution") {
    // one hot key (90% of facts) + a tail
    val facts = ((1 to 90).map(i => (7L, i.toDouble)) ++ (1 to 10).map(i => (i.toLong, -i.toDouble)))
      .toDF("k", "v")
    val dim = (1 to 10).map(i => (i.toLong, s"name_$i")).toDF("k", "name")
    val salted = Salt.saltedJoin(facts, dim, "k", factor = 8)
      .select("k", "v", "name").collect().map(_.toString).sorted.toSeq
    val plain = facts.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    assert(salted.size == 100) // 90 hot-key rows + 10 tail rows, all matched
  }

  test("Sampling.temperatureSample flattens toward low-resource strata, deterministically") {
    val docs = ((1 to 200).map(i => (i.toLong, "high")) ++ (1001 to 1020).map(i => (i.toLong, "low")))
      .toDF("id", "lang")
    val kept = Sampling.temperatureSample(docs, "lang", "id", alpha = 0.5, targetN = 60)
      .select("id", "lang").as[(Long, String)].collect().toSet
    // deterministic: identical output regardless of partitioning
    val kept2 = Sampling.temperatureSample(docs.repartition(7), "lang", "id", alpha = 0.5, targetN = 60)
      .select("id", "lang").as[(Long, String)].collect().toSet
    assert(kept == kept2)
    // alpha < 1 upweights the low-resource stratum: its keep RATE must
    // exceed the high-resource stratum's
    val rateHigh = kept.count(_._2 == "high") / 200.0
    val rateLow = kept.count(_._2 == "low") / 20.0
    assert(rateLow > rateHigh, s"low $rateLow vs high $rateHigh")
    // alpha = 1 with targetN = N keeps everything (p_s = 1)
    val all = Sampling.temperatureSample(docs, "lang", "id", alpha = 1.0, targetN = 220)
    assert(all.count() == 220)
  }

  test("Grouped.rolling: trailing window per group, min_periods=1 convention") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0), ("a", 4L, 40.0),
      ("b", 1L, 5.0), ("b", 2L, 7.0)
    ).toDF("g", "t", "v")
    val got = Grouped
      .rolling(df, Seq("g"), "t", window = 3,
        aggs = Seq(c => avg(c), c => count(c)), valueCol = "v",
        names = Seq("m", "n"))
      .select("g", "t", "m", "n")
      .as[(String, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("a", 1L)) == ((10.0, 1L))) // partial head window
    assert(got(("a", 2L)) == ((15.0, 2L)))
    assert(got(("a", 3L)) == ((20.0, 3L)))
    assert(got(("a", 4L)) == ((30.0, 3L))) // trailing 3: 20,30,40
    assert(got(("b", 2L)) == ((6.0, 2L))) // groups never mix
  }

  test("Sampling.temperatureSampleReplicated upsamples deterministically and conserves mass") {
    val docs = ((1 to 400).map(i => (i.toLong, "high")) ++ (1001 to 1025).map(i => (i.toLong, "low")))
      .toDF("id", "lang")
    val targetN = 850L // ~2× the corpus: forces p > 1
    val rep = Sampling.temperatureSampleReplicated(docs, "lang", "id", alpha = 0.5, targetN = targetN)
      .select("id", "lang", "copy").as[(Long, String, Long)].collect().toSeq
    // deterministic: identical multiset regardless of partitioning
    val rep2 = Sampling
      .temperatureSampleReplicated(docs.repartition(7), "lang", "id", alpha = 0.5, targetN = targetN)
      .select("id", "lang", "copy").as[(Long, String, Long)].collect().toSeq
    assert(rep.sorted == rep2.sorted)
    // copies are contiguous 0-based indices per doc (floor(p)+Bernoulli)
    rep.groupBy(_._1).foreach { case (id, copies) =>
      assert(copies.map(_._3).sorted == (0L until copies.size).toSeq, s"doc $id")
    }
    // mass conservation: E[rows] = targetN exactly; Bernoulli noise over
    // 425 docs has sd < 11, so ±6% is a >4-sigma bound
    assert(math.abs(rep.size - targetN.toDouble) < 0.06 * targetN, s"got ${rep.size}")
    // the low-resource stratum's expected copies/doc exceeds the
    // high-resource stratum's (alpha < 1 flattening, now WITH replication)
    val perLow = rep.count(_._2 == "low") / 25.0
    val perHigh = rep.count(_._2 == "high") / 400.0
    assert(perLow > perHigh, s"low $perLow vs high $perHigh")
    // strict generalization: where every p <= 1, the replicated form is
    // the Bernoulli keep (all copy = 0) — bit-identical to temperatureSample
    val small = Sampling
      .temperatureSampleReplicated(docs, "lang", "id", alpha = 0.5, targetN = 60)
      .select("id", "lang", "copy").as[(Long, String, Long)].collect().toSeq
    assert(small.forall(_._3 == 0L))
    val keep = Sampling.temperatureSample(docs, "lang", "id", alpha = 0.5, targetN = 60)
      .select("id", "lang").as[(Long, String)].collect().toSet
    assert(small.map(t => (t._1, t._2)).toSet == keep)
  }

  test("Packing.packBins equals the global-window reference and is parts-invariant") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1 to 500).map(i => (i.toLong, 1 + (i * 37) % 90)).toDF("id", "n_tok")
    def run(parts: Int) = Packing
      .packBins(docs, "id", "n_tok", budget = 256, salt = "s1", parts = parts)
      .select("id", "n_tokens", "bin", "bin_pos")
      .as[(Long, Long, Long, Long)]
      .collect()
      .sortBy(_._1)
      .toSeq
    // reference: ONE global window cumsum in (salted key, id) order
    val w = Window
      .orderBy(Sampling.shuffleKey(col("id"), "s1"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs
      .withColumn("cb", sum(col("n_tok").cast("long")).over(w) - col("n_tok"))
      .select(
        col("id"),
        col("n_tok").cast("long"),
        expr("cb DIV 256L"),
        (col("cb") % 256).cast("long"))
      .as[(Long, Long, Long, Long)]
      .collect()
      .sortBy(_._1)
      .toSeq
    val got8 = run(8)
    assert(got8 == ref)
    assert(run(1) == got8) // partition count never changes the assignment
    assert(run(64) == got8)
    // bins are contiguous token ranges: every bin except the last starts
    // at its boundary, i.e. some doc has bin_pos < doc-length overlap
    val bins = got8.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val maxDoc = got8.map(_._2).max
    val lastBin = bins.keys.max
    for ((b, fill) <- bins if b != lastBin)
      assert(fill >= 256 - maxDoc && fill <= 256 + maxDoc, s"bin $b fill $fill")
  }

  test("Attrition.firstFailed attributes the FIRST failing stage in order; kept rows null") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, 0, 0), // fails A and B -> attributed to A
      (2L, 1, 0), // fails only B
      (3L, 0, 1), // fails only A
      (4L, 1, 1)  // kept
    ).toDF("id", "a_ok", "b_ok")
    val v = graft.ops.Attrition.firstFailed(df,
      Seq("A" -> (col("a_ok") === 1), "B" -> (col("b_ok") === 1)))
      .select("id", "first_failed").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(v(1L) == Some("A"))
    assert(v(2L) == Some("B"))
    assert(v(3L) == Some("A"))
    assert(v(4L) == None)
  }

  test("Attrition.funnel: cumulative reach, zero-drop stages, kept total") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 10L).map { i =>
      (i, if (i <= 3) 0 else 1, 1, if (i >= 9) 0 else 1)
    }.toDF("id", "a_ok", "b_ok", "c_ok")
    val v = graft.ops.Attrition.firstFailed(df, Seq(
      "A" -> (col("a_ok") === 1), "B" -> (col("b_ok") === 1), "C" -> (col("c_ok") === 1)))
    val f = graft.ops.Attrition.funnel(v, Seq("A", "B", "C")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(f("A") == ((10L, 3L, 7L)))
    assert(f("B") == ((7L, 0L, 7L)))  // zero-drop stage keeps the chain
    assert(f("C") == ((7L, 2L, 5L)))  // ids 9, 10 fail C after passing A
  }

  test("TokenBudget.select: exact hash-ordered budget cut, brute-force parity, partition-invariant") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val rows = (0 until 300).map { i =>
      val src = s"s${i % 3}"
      (i.toLong, src, 10L + (i * 7) % 50) // token counts 10..59
    }
    val df = rows.toDF("doc_id", "source", "n_tok")
    val budgets = Map("s0" -> 900L, "s1" -> 1500L, "s2" -> 1L) // s2: below any doc
    // brute force with the SAME cross-engine hash values
    val hs = df
      .select(col("doc_id"), graft.functions.SharedHash
        .md5Long60(concat(lit("graft:"), col("doc_id").cast("string"))).as("h"))
      .as[(Long, Long)].collect().toMap
    val expect = rows.groupBy(_._2).flatMap { case (src, docs) =>
      budgets.get(src).toSeq.flatMap { b =>
        var run = 0L
        docs.sortBy(d => (hs(d._1), d._1)).flatMap { case (id, s, t) =>
          run += t
          if (run <= b) Some((id, s, t, run)) else None
        }
      }
    }.toSet
    // buckets=4 forces real multi-bucket prefix composition
    val got = TokenBudget.select(df, "doc_id", "source", "n_tok", budgets, buckets = 4)
      .select("doc_id", "source", "n_tok", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
    assert(!got.exists(_._2 == "s2")) // sub-doc budget keeps nothing
    // unbudgeted source dropped entirely
    val gotNoS1 = TokenBudget.select(df, "doc_id", "source", "n_tok", budgets - "s1", buckets = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(gotNoS1 == expect.collect { case (id, "s0", _, _) => id })
    // partitioning cannot change an order defined by (hash, id)
    val got13 = TokenBudget
      .select(df.repartition(13), "doc_id", "source", "n_tok", budgets, buckets = 4)
      .select("doc_id", "source", "n_tok", "cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got13 == got)
  }

  test("CorpusDiff: statuses, chunk-level retained chars, and the rollup arithmetic") {
    import org.apache.spark.sql.functions.{col, length}
    val a = graft.util.Tables.documents(spark, sf)
      .where(length(col("text")) > 200).select("text").as[String].take(2)
    val oldSnap = Seq((1L, a(0)), (2L, a(1)), (3L, "short stable row here")).toDF("doc_id", "text")
    val newSnap = Seq(
      (2L, a(1)), //                  unchanged
      (3L, "short stable row here"), // unchanged
      (4L, "a brand new page"), //    added
      (5L, "HDR " + a(0))) //         id 5 is added; id 1 removed
      .toDF("doc_id", "text")
    val got = graft.ops.CorpusDiff.diff(oldSnap, newSnap, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(got(1L)._1 == "removed" && got(1L)._3 == -1L && got(1L)._4 == -1L)
    assert(got(2L) == (("unchanged", a(1).length.toLong, a(1).length.toLong, a(1).length.toLong)))
    assert(got(3L)._1 == "unchanged")
    assert(got(4L) == (("added", -1L, 16L, 0L)))
    assert(got(5L)._1 == "added" && got(5L)._4 == 0L)

    // an EDIT of doc 1 under the same id: retained = exactly the new
    // version's chunks whose hash exists in the old version (CDC makes
    // a head edit cheap — most chunks survive)
    val edited = Seq((1L, "HDR " + a(0))).toDF("doc_id", "text")
    val d2 = graft.ops.CorpusDiff.diff(oldSnap, edited
      .unionByName(Seq((2L, a(1)), (3L, "short stable row here")).toDF("doc_id", "text")),
      "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(4))).toMap
    assert(d2(1L)._1 == "edited")
    val oldH = graft.dedup.CdcChunks.chunks(oldSnap.where(col("doc_id") === 1L), "text", "doc_id")
      .as[(Long, Int, Int, Int, Long)].collect().map(_._5).toSet
    val expRet = graft.dedup.CdcChunks.chunks(edited, "text", "doc_id")
      .as[(Long, Int, Int, Int, Long)].collect()
      .filter(c => oldH.contains(c._5)).map(_._4.toLong).sum
    assert(d2(1L)._2 == expRet && expRet > a(0).length / 2,
      s"retained ${d2(1L)._2} vs $expRet (doc len ${a(0).length})")

    // rollup: per-status doc counts and churn arithmetic
    val sum1 = graft.ops.CorpusDiff
      .summary(graft.ops.CorpusDiff.diff(oldSnap, newSnap, "text", "doc_id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(sum1("unchanged") == ((2L, 0L)))
    assert(sum1("removed")._1 == 1L)
    assert(sum1("added") == ((2L, 16L + ("HDR " + a(0)).length)))
  }
}
