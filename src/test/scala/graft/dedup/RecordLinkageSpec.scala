package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.RecordLinkage.FieldRule

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    (FieldRule("name", (l, r) => l <=> r, m = 0.9, u = 0.01), "name", "name"),
    (FieldRule("city", (l, r) => l <=> r, m = 0.8, u = 0.2), "city", "city"))

  test("hand-computed Fellegi-Sunter weights: full agreement, partial, none") {
    val a = Seq((1L, "blk", "ann", "rome"), (2L, "blk", "bob", "oslo"))
      .toDF("id", "blk", "name", "city")
    val b = Seq(
      (10L, "blk", "ann", "rome"), // full agree with 1
      (20L, "blk", "bob", "rome"), // name-only agree with 2
      (30L, "blk", "zoe", "bern") // agrees with nothing
    ).toDF("id", "blk", "name", "city")
    val out = RecordLinkage
      .linkPairs(a, b, "id", "id", Seq(("blk", "blk")), rules, minScore = -100.0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("score"))
      .toMap
    val wName = math.log(0.9 / 0.01) / math.log(2)
    val wNameDis = math.log(0.1 / 0.99) / math.log(2)
    val wCity = math.log(0.8 / 0.2) / math.log(2)
    val wCityDis = math.log(0.2 / 0.8) / math.log(2)
    assert(out.size === 6) // 2 x 3, one block
    assert(math.abs(out((1L, 10L)) - (wName + wCity)) < 1e-4)
    assert(math.abs(out((2L, 20L)) - (wName + wCityDis)) < 1e-4)
    assert(math.abs(out((2L, 30L)) - (wNameDis + wCityDis)) < 1e-4)
    // rome agreement between 1 and 20 without name agreement
    assert(math.abs(out((1L, 20L)) - (wNameDis + wCity)) < 1e-4)
  }

  test("threshold keeps matches, drops non-matches; blocking prunes cross-block pairs") {
    val a = Seq((1L, "b1", "ann", "rome"), (2L, "b2", "ann", "rome"))
      .toDF("id", "blk", "name", "city")
    val b = Seq((10L, "b1", "ann", "rome"), (11L, "b1", "zoe", "bern"))
      .toDF("id", "blk", "name", "city")
    val out = RecordLinkage
      .linkPairs(a, b, "id", "id", Seq(("blk", "blk")), rules, minScore = 5.0)
      .collect()
    // id 2 is in block b2 — never compared against b1 rows even though
    // its fields agree perfectly with 10
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 10L)))
    assert(out.head.getAs[Boolean]("agree_name") === true)
  }

  test("null-safe agreement: null<=>null agrees, null<=>value disagrees; bad m/u rejected") {
    val a = Seq((1L, "b", null.asInstanceOf[String], "rome")).toDF("id", "blk", "name", "city")
    val b = Seq((10L, "b", null.asInstanceOf[String], "rome"),
      (11L, "b", "ann", "rome")).toDF("id", "blk", "name", "city")
    val out = RecordLinkage
      .linkPairs(a, b, "id", "id", Seq(("blk", "blk")), rules, minScore = -100.0)
      .collect()
      .map(r => (r.getLong(1), r.getAs[Boolean]("agree_name")))
      .toMap
    assert(out(10L) === true)
    assert(out(11L) === false)
    intercept[IllegalArgumentException] {
      FieldRule("bad", (l, r) => l <=> r, m = 0.1, u = 0.5) // m < u
    }
  }
}
