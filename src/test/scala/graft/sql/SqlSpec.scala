package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The pure-SQL surface: graft's codegen'd expressions registered as SQL
  * functions must return exactly what the DataFrame API returns.
  */
class SqlSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("float_dot / float_norm / float_normalize from SQL") {
    val r = spark.sql(
      """SELECT
        |  float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |  float_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n,
        |  float_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS u
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getSeq[Double](2).zip(Seq(0.6, 0.8)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("cdc_gear from SQL equals the DataFrame kernel") {
    val t = "the quick brown fox jumps over the lazy dog " * 8
    val sqlRows = spark
      .sql(s"SELECT inline(cdc_gear('$t', 16, 128, 5))")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val direct = graft.functions.GearChunks
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString(t), 16, 128, 5)
    val expect = (0 until direct.numElements()).map { i =>
      val s = direct.getStruct(i, 3); (s.getInt(0), s.getInt(1), s.getLong(2))
    }
    assert(sqlRows == expect && sqlRows.nonEmpty)
  }

  test("sorted_intersect_size from SQL") {
    val n = spark.sql(
      "SELECT sorted_intersect_size(array(1L, 2L, 3L, 9L), array(2L, 3L, 5L)) AS n")
      .head().getInt(0)
    assert(n == 2)
  }

  test("pq_encode / pq_lut / pq_adc round-trip from SQL") {
    // 2 subspaces of dsub=2, k=2 codewords per subspace: codebook rows
    // land exactly on the vector's subvectors, so ADC == exact dot
    spark.sql(
      """SELECT CAST(array(1.0, 0.0, 0.0, 2.0) AS ARRAY<FLOAT>) AS v,
        |       CAST(array(1.0, 0.0,  0.0, 2.0,   0.0, 2.0,  1.0, 0.0) AS ARRAY<FLOAT>) AS cb
        |""".stripMargin).createOrReplaceTempView("pq_in")
    val r = spark.sql(
      """SELECT pq_adc(pq_encode(v, cb, 2), pq_lut(v, cb, 2)) AS adc,
        |       float_dot(v, v) AS exact
        |FROM pq_in""".stripMargin).head()
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("minhash_sig aggregate from SQL equals the DataFrame pipeline") {
    val sh = Seq(
      (1L, 111L), (1L, 222L), (1L, 333L),
      (2L, 222L), (2L, 444L)
    ).toDF("doc_id", "sh")
    sh.createOrReplaceTempView("sh_in")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_sig(sh, 8, 42L) AS sig FROM sh_in GROUP BY doc_id")
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    val viaDf = graft.dedup.MinHashLsh
      .signaturesFromShingles(sh, "doc_id", numHashes = 8, seed = 42L)
      .orderBy("doc_id").collect().map(_.getSeq[Long](1))
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("heavy_hitters aggregate from SQL equals the DataFrame form") {
    val docs = Seq(
      ("en", Seq("a", "a", "a", "b", "c")),
      ("en", Seq("a", "b", "b", "d", "e")),
      ("es", Seq("x", "x", "y"))
    ).toDF("lang", "toks")
    docs.createOrReplaceTempView("hh_in")
    val viaSql = spark.sql(
      "SELECT lang, heavy_hitters(toks, 4) AS hh FROM hh_in GROUP BY lang")
      .orderBy("lang").collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getString(0), x.getLong(1))))
    val viaDf = docs.groupBy("lang")
      .agg(graft.functions.HeavyHittersAgg.heavyHitters(col("toks"), 4).as("hh"))
      .orderBy("lang").collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getString(0), x.getLong(1))))
    assert(viaSql.toSeq == viaDf.toSeq)
  }

  test("vec_outer aggregate from SQL equals the DataFrame form bit-for-bit") {
    val vecs = Seq(
      Tuple1(Array(1.0f, 2.0f)), Tuple1(Array(3.0f, 4.0f)), Tuple1(Array(-1.0f, 0.5f))
    ).toDF("v")
    vecs.createOrReplaceTempView("vo_in")
    val viaSql = spark.sql("SELECT vec_outer(v) AS o FROM vo_in").head().getSeq[Double](0)
    val viaDf = vecs.agg(graft.functions.VecOuterAgg.vecOuter(col("v"))).head().getSeq[Double](0)
    assert(viaSql == viaDf)
    // layout check: [n, s0, s1, q00, q01, q11]
    assert(viaSql.head == 3.0 && viaSql(1) == 3.0 && viaSql(2) == 6.5)
  }

  test("vec_outer rejects null vector ELEMENTS loudly (no silent moment skew)") {
    val withNullElem = spark.sql("SELECT array(1.0f, CAST(NULL AS FLOAT)) AS v")
    val err = intercept[Exception] {
      withNullElem.agg(graft.functions.VecOuterAgg.vecOuter(col("v"))).head()
    }
    val chain = Iterator.iterate[Throwable](err)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString("|")
    assert(chain.contains("null element"), chain.take(500))
    // whole-row nulls stay skipped, as before
    val skipped = spark.sql("SELECT CAST(NULL AS ARRAY<FLOAT>) AS v UNION ALL SELECT array(2.0f)")
      .agg(graft.functions.VecOuterAgg.vecOuter(col("v"))).head().getSeq[Double](0)
    assert(skipped == Seq(1.0, 2.0, 4.0))
  }

  test("binary_pack / hamming / kmv SQL ≡ DataFrame bit-for-bit") {
    import org.apache.spark.sql.functions._
    val vecs = Seq(
      (1L, Array(-1.0f, 2.0f, -3.0f, 4.0f)),
      (2L, Array(1.0f, -2.0f, 3.0f, -4.0f))
    ).toDF("id", "v")
    vecs.createOrReplaceTempView("bp_in")
    val viaSql = spark.sql(
      """SELECT a.id, binary_pack(a.v) AS bits,
        |  hamming(binary_pack(a.v), binary_pack(b.v)) AS h
        |FROM bp_in a JOIN bp_in b ON b.id = 1 ORDER BY a.id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSeq
    val packed = vecs.select(col("id"), graft.functions.BitOps.pack(col("v")).as("bits"))
    val ref = packed
      .crossJoin(packed.where(col("id") === 1).select(col("bits").as("qb")))
      .select(col("id"), col("bits"),
        graft.functions.BitOps.hamming(col("bits"), col("qb")).as("h"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSeq
    assert(viaSql === ref)
    assert(viaSql.head._3 === 0L) // self
    assert(viaSql(1)._3 === 4L) // full sign flip

    val hs = Seq(Seq(9L, 3L, 3L), Seq(1L, 7L)).toDF("hs")
    hs.createOrReplaceTempView("kmv_in")
    val sqlKmv = spark.sql("SELECT kmv(hs, 3) FROM kmv_in").head().getSeq[Long](0)
    val dfKmv = hs.agg(graft.functions.KmvAgg.kmv(col("hs"), 3)).head().getSeq[Long](0)
    assert(sqlKmv === dfKmv)
    assert(sqlKmv === Seq(1L, 3L, 7L))
  }

  test("GraftExtensions injects the same function list (wiring smoke)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; names stay unique
    assert(GraftFunctions.builders.map(_._1).distinct.size == GraftFunctions.builders.size)
  }
}
