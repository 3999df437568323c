package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Within-document repeat mining by suffix automaton — exact,
  * arbitrary-length answers to "what is this document's longest
  * repeated token span?" in linear time per document, complementing
  * [[Repetition]]'s fixed-n-gram ratio filters (T8) and the CROSS-doc
  * span machinery ([[graft.dedup.SpanDedup]]/`RepeatedSpans`). The
  * suffix automaton (Blumer et al. 1985; the standard online
  * construction) recognizes every distinct substring of the token
  * sequence in O(n) states, so per doc it yields exactly:
  *
  *  - `lrs_len` / `lrs_gram`: the longest token span occurring ≥ 2
  *    times (max state length with endpos multiplicity ≥ 2), the
  *    reported gram being the occurrence with the EARLIEST first
  *    position (deterministic tie-break, oracle-replayable);
  *  - `distinct_subs`: the exact number of distinct token spans,
  *    Σ_states (len(v) − len(link(v))) — a strong in-query witness
  *    that the automaton is built correctly, since DuckDB can replay
  *    it as a brute-force distinct-gram count.
  *
  * Scale shape: embarrassingly parallel — one `mapPartitions` pass,
  * no shuffle, no state across documents; per-doc memory is O(doc
  * tokens) (≤ 2n automaton states, token-interning map). The gram
  * report is a second O(n) sliding-window pass at the known answer
  * length, still row-local.
  */
object RepeatMining {

  /** Token-level suffix automaton over an interned int sequence. */
  private final class Sam(capTokens: Int) {
    private val cap = 2 * capTokens + 4
    val len = new Array[Int](cap)
    val link = new Array[Int](cap)
    val cnt = new Array[Int](cap)
    val next = Array.fill(cap)(mutable.HashMap.empty[Int, Int])
    var size = 1
    private var last = 0
    link(0) = -1

    def extend(c: Int): Unit = {
      val cur = size; size += 1
      len(cur) = len(last) + 1
      cnt(cur) = 1
      var p = last
      while (p >= 0 && !next(p).contains(c)) { next(p).update(c, cur); p = link(p) }
      if (p < 0) link(cur) = 0
      else {
        val q = next(p)(c)
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          cnt(clone) = 0
          next(clone) ++= next(q)
          while (p >= 0 && next(p).get(c).contains(q)) { next(p).update(c, clone); p = link(p) }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
    }

    /** (longest-repeated length, distinct substring count) after
      * propagating endpos multiplicities up the suffix-link tree in
      * decreasing-length order (counting sort — lengths are ≤ n).
      */
    def stats(n: Int): (Int, Long) = {
      val byLen = Array.fill(n + 1)(mutable.ArrayBuffer.empty[Int])
      var v = 1
      while (v < size) { byLen(len(v)) += v; v += 1 }
      var lrs = 0
      var distinct = 0L
      var l = n
      while (l >= 1) {
        byLen(l).foreach { s =>
          if (link(s) > 0) cnt(link(s)) += cnt(s) else if (link(s) == 0) ()
          if (cnt(s) >= 2 && len(s) > lrs) lrs = len(s)
          distinct += len(s) - len(link(s))
        }
        l -= 1
      }
      (lrs, distinct)
    }
  }

  private def analyze(tokens: Array[String]): (Int, String, Long) = {
    val n = tokens.length
    if (n == 0) return (0, "", 0L)
    val intern = mutable.HashMap.empty[String, Int]
    val ids = tokens.map(t => intern.getOrElseUpdate(t, intern.size))
    val sam = new Sam(n)
    ids.foreach(sam.extend)
    val (lrs, distinct) = sam.stats(n)
    if (lrs == 0) return (0, "", distinct)
    // earliest-first-position repeated lrs-gram: one sliding-window pass
    val first = mutable.HashMap.empty[Seq[Int], Int]
    var bestPos = -1
    var i = 0
    while (i + lrs <= n) {
      val g = ids.slice(i, i + lrs).toSeq
      first.get(g) match {
        case Some(fp) => if (bestPos < 0 || fp < bestPos) bestPos = fp
        case None     => first.update(g, i)
      }
      i += 1
    }
    (lrs, tokens.slice(bestPos, bestPos + lrs).mkString(" "), distinct)
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lrs_len", LongType),
    StructField("lrs_gram", StringType),
    StructField("distinct_subs", LongType)))

  /** One row per document: (idCol, lrs_len, lrs_gram, distinct_subs). */
  def perDoc(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val in = df.select(idCol, textCol)
    in.sparkSession.createDataFrame(
      in.rdd.mapPartitions(_.map { r =>
        val toks =
          if (r.isNullAt(1)) Array.empty[String]
          else r.getString(1).split(" ").filter(_.nonEmpty)
        val (lrs, gram, distinct) = analyze(toks)
        Row(r.getLong(0), lrs.toLong, gram, distinct)
      }),
      outSchema)
  }
}
