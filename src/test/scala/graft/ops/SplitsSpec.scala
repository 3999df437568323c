package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  test("byGroup: rows sharing a group ALWAYS share a split; assignment is deterministic") {
    val df = (1 to 3000).map(i => (i.toLong, i.toLong % 500)).toDF("id", "grp")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Splits.byGroup(df, "grp", w).select("grp", "split").distinct().collect()
    assert(a.length == 500, "one split per group")
    val b = Splits.byGroup(df, "grp", w).select("grp", "split").distinct().collect()
    assert(a.map(r => (r.getLong(0), r.getString(1))).toSet ==
      b.map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("byGroup: weights land near their targets over many groups") {
    val df = (1 to 20000).map(i => (i.toLong, i.toLong)).toDF("id", "grp")
    val shares = Splits.byGroup(df, "grp", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(shares("train") / 20000.0 - 0.8) < 0.02, shares.toString)
    assert(math.abs(shares("val") / 20000.0 - 0.1) < 0.02, shares.toString)
    assert(math.abs(shares("test") / 20000.0 - 0.1) < 0.02, shares.toString)
  }

  test("byGroup: bad weights rejected; seed changes the assignment") {
    val df = Seq((1L, 1L)).toDF("id", "grp")
    intercept[IllegalArgumentException] {
      Splits.byGroup(df, "grp", Seq("a" -> 0.5, "b" -> 0.6))
    }
    val many = (1 to 1000).map(i => (i.toLong, i.toLong)).toDF("id", "grp")
    val s1 = Splits.byGroup(many, "grp", Seq("a" -> 0.5, "b" -> 0.5), seed = "s1")
      .select("grp", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Splits.byGroup(many, "grp", Seq("a" -> 0.5, "b" -> 0.5), seed = "s2")
      .select("grp", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1 to 1000).count(i => s1(i.toLong) != s2(i.toLong)) > 200)
  }

  test("leakageSafe: planted near-duplicates never straddle splits") {
    // 40 base docs with per-doc-unique vocabularies (no accidental
    // overlap); docs 1000+i are near-copies of doc i (one token edit)
    val base = (1 to 40).map { i =>
      val words = (1 to 30).map(j => s"d${i}w$j").mkString(" ")
      (i.toLong, words)
    }
    val copies = base.take(20).map { case (i, t) =>
      (1000L + i, t.replaceFirst("\\w+$", "edited"))
    }
    val docs = (base ++ copies).toDF("doc_id", "text")
    val out = Splits.leakageSafe(docs, "text", "doc_id",
      Seq("train" -> 0.7, "test" -> 0.3))
    val m = out.select("doc_id", "cluster_id", "split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    (1L to 20L).foreach { i =>
      assert(m(i)._1 == m(1000L + i)._1, s"pair $i clusters together")
      assert(m(i)._2 == m(1000L + i)._2, s"pair $i same split")
    }
    // base docs are mutually distinct: clusters are the pair min (or self)
    (21L to 40L).foreach(i => assert(m(i)._1 == i))
  }
}
