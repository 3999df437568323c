package graft.graph

import graft.SparkSpec

class LinkPredSpec extends SparkSpec {
  import spark.implicits._

  test("LinkPred.bipartiteScores: hand wedge counts, AA weights, jaccard") {
    // lefts: w1→{A,B}, w2→{A,B,C}, w3→{C} (degree-1: no pairs)
    val edges = Seq(
      ("w1", "A"), ("w1", "B"),
      ("w2", "A"), ("w2", "B"), ("w2", "C"),
      ("w3", "C")).toDF("l", "r")
    val rows = LinkPred.bipartiteScores(edges, "l", "r").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.size === 3) // (A,B), (A,C), (B,C)

    val ab = rows(("A", "B"))
    assert(ab.getAs[Long]("cn") === 2L) // via w1 and w2
    // AA = 1/ln(2) + 1/ln(3)
    val aaExpect = math.floor((1.0 / math.log(2.0) + 1.0 / math.log(3.0)) * 1e6 + 0.5) / 1e6
    assert(ab.getAs[Double]("aa") === aaExpect)
    // deg(A)=2, deg(B)=2 → jaccard = 2/(2+2-2) = 1
    assert(ab.getAs[Double]("jaccard") === 1.0)

    val ac = rows(("A", "C"))
    assert(ac.getAs[Long]("cn") === 1L) // via w2 only
    assert(ac.getAs[Double]("aa") === math.floor(1.0 / math.log(3.0) * 1e6 + 0.5) / 1e6)
    // deg(A)=2, deg(C)=2 → jaccard = 1/3
    assert(ac.getAs[Double]("jaccard") === math.floor(1.0 / 3.0 * 1e6 + 0.5) / 1e6)
  }

  test("LinkPred.bipartiteScores: duplicate/self edges dedup; minCommon filters; hub cap drops wedges") {
    val edges = Seq(
      ("w1", "A"), ("w1", "A"), ("w1", "B"), // dup edge collapses
      ("hub", "A"), ("hub", "B"), ("hub", "C"), ("hub", "D")).toDF("l", "r")

    // minCommon=2: only (A,B) survives (w1 + hub)
    val strict = LinkPred.bipartiteScores(edges, "l", "r", minCommon = 2L).collect()
    assert(strict.map(r => (r.getString(0), r.getString(1))).toSet === Set(("A", "B")))

    // cap at degree 2: the hub (deg 4) is dropped from the projection;
    // only w1's wedge remains
    val capped = LinkPred.bipartiteScores(edges, "l", "r", maxLeftDegree = 2L).collect()
    assert(capped.map(r => (r.getString(0), r.getString(1))).toSet === Set(("A", "B")))
    assert(capped.head.getAs[Long]("cn") === 1L)
  }

  test("LinkPred.bipartiteScores: degree-1 weight guard — deg-1 lefts cannot appear, ln(1)=0 never divides") {
    val edges = Seq(("w1", "A"), ("w2", "B")).toDF("l", "r")
    assert(LinkPred.bipartiteScores(edges, "l", "r").count() === 0L)
  }
}
