package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompressSpec extends SparkSpec {
  import spark.implicits._

  test("deflate ratio: repetition compresses far below shuffled prose; bounds and determinism") {
    val rep = ("lorem ipsum " * 200).trim
    val varied = (0 until 400).map(i => s"tok${i * 7919 % 3001}x$i").mkString(" ")
    val docs = Seq((1L, rep), (2L, varied), (3L, "")).toDF("doc_id", "text")
    def run(parts: Int) = Compressibility
      .deflateRatio(docs.repartition(parts), "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val a = run(1)
    assert(a === run(5)) // deterministic incl. partitioning
    val (repBytes, repDef, repRatio) = a(1L)
    val (_, _, variedRatio) = a(2L)
    assert(repBytes === rep.getBytes("UTF-8").length.toLong)
    assert(repDef > 0L && repDef < repBytes)
    assert(repRatio < 0.05, s"repetition ratio $repRatio not tiny")
    assert(variedRatio > 3 * repRatio, s"varied $variedRatio vs repeated $repRatio")
    assert(a(3L) === ((0L, 0L, 1.0))) // empty text convention
    // reference check against a direct driver-side deflate
    val d = new java.util.zip.Deflater(6, false)
    d.setInput(rep.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](1 << 20)
    val n = d.deflate(buf); d.end()
    assert(repDef === n.toLong)
  }

  test("Luhn card redaction: known-valid card redacted through separators, invalid kept, counts audit") {
    val docs = Seq(
      (1L, "pay with 4111 1111 1111 1111 today"), // canonical valid test number
      (2L, "ref 4111 1111 1111 1112 thanks"), // off-by-one: fails Luhn
      (3L, "order 4111-1111-1111-1111 shipped"), // dashes strip too
      (4L, "no digits here at all"),
      (5L, "pin 1234 code 99") // too short: not even a candidate
    ).toDF("doc_id", "text")
    val got = Redact.withCardRedaction(docs, "text")
      .select("doc_id", "n_card_candidates", "n_cards", "n_luhn_rejected", "text_cards_redacted")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._3 === 1L)
    assert(got(1L)._5 === "pay with [CARD] today")
    assert(got(2L) === ((2L, 1L, 0L, 1L, "ref 4111 1111 1111 1112 thanks")))
    assert(got(3L)._5 === "order [CARD] shipped")
    assert(got(4L) === ((4L, 0L, 0L, 0L, "no digits here at all")))
    assert(got(5L) === ((5L, 0L, 0L, 0L, "pin 1234 code 99")))
    // luhnSum reference: 4111111111111111 -> weighted sum 30
    val s = docs.sparkSession.range(1)
      .select(Redact.luhnSum(lit("4111111111111111"))).head().getInt(0)
    assert(s === 30)
  }

  test("token entropy: uniform tokens hit ln(k), constant doc hits 0, reference parity") {
    val uniform = (0 until 8).map(i => s"t$i").mkString(" ") // 8 distinct once each
    val const = "x x x x x x"
    val mixed = "a a a b"
    val docs = Seq((1L, uniform), (2L, const), (3L, mixed)).toDF("doc_id", "text")
    val got = Compressibility.tokenEntropy(docs, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((8L, 8L, r4(math.log(8)))))
    assert(got(2L) === ((6L, 1L, -0.0)) || got(2L) === ((6L, 1L, 0.0)))
    val expMixed = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(got(3L) === ((4L, 2L, r4(expMixed))))
  }
}
