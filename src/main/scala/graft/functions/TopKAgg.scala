package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded-heap state for [[TopKAgg]]: at most k (score, payload) entries,
  * kept as a binary min-heap ordered by GOODNESS (higher score better,
  * ties → smaller payload better), so the root is always the worst kept
  * entry and a full-buffer insert is one root compare + sift-down.
  */
final class TopKBuffer(val k: Int, ord: Ordering[Any]) {
  var n: Int = 0
  val scores = new Array[Double](k)
  val vals = new Array[Any](k)

  /** true if (s1, v1) is a WORSE result than (s2, v2). */
  @inline private def worse(s1: Double, v1: Any, s2: Double, v2: Any): Boolean =
    s1 < s2 || (s1 == s2 && ord.gt(v1, v2))

  def insert(s: Double, v: Any): Unit = {
    if (n < k) {
      var i = n
      scores(i) = s; vals(i) = v; n += 1
      // sift up: parent must be worse-or-equal
      while (i > 0) {
        val p = (i - 1) >> 1
        if (worse(scores(i), vals(i), scores(p), vals(p))) {
          val ts = scores(i); val tv = vals(i)
          scores(i) = scores(p); vals(i) = vals(p)
          scores(p) = ts; vals(p) = tv
          i = p
        } else i = 0
      }
    } else if (worse(scores(0), vals(0), s, v)) {
      scores(0) = s; vals(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i // worst of (i, l, r)
        if (l < n && worse(scores(l), vals(l), scores(w), vals(w))) w = l
        if (r < n && worse(scores(r), vals(r), scores(w), vals(w))) w = r
        if (w == i) done = true
        else {
          val ts = scores(i); val tv = vals(i)
          scores(i) = scores(w); vals(i) = vals(w)
          scores(w) = ts; vals(w) = tv
          i = w
        }
      }
    }
  }

  /** Entries sorted best-first — (score desc, payload asc). */
  def sorted: Array[(Double, Any)] = {
    val out = Array.tabulate(n)(i => (scores(i), vals(i)))
    scala.util.Sorting.stableSort(
      out,
      (a: (Double, Any), b: (Double, Any)) =>
        a._1 > b._1 || (a._1 == b._1 && ord.lt(a._2, b._2)))
    out
  }
}

/** Per-key bounded top-k as a real AGGREGATE — the map-side-combined
  * replacement for `row_number() OVER (PARTITION BY key ORDER BY score
  * DESC, payload)` + `WHERE rk <= k` (SURVEY.md §3 custom-Expression
  * tier; the q58 partial-aggregate lesson applied family-wide).
  *
  * A window top-k shuffles EVERY candidate row to its key's reducer and
  * sorts there: |candidates| rows through the exchange, zero reduction,
  * skewed keys land on one task. This aggregate keeps k (score, payload)
  * pairs per buffer, so map-side partials reduce the shuffle to
  * k × #map-partitions rows per key and hot keys combine before they
  * move — exactly the [[MinHashAgg]] buffer pattern, with a bounded
  * binary heap instead of a lane array.
  *
  * Result: `array<struct<score double, payload P>>` sorted best-first
  * under (score desc, payload asc) — identical rows to the window form
  * whenever (score, payload) is unique per key (all graft call sites:
  * payload is the neighbor/cell id). Use [[TopK.perKey]] to explode it
  * back to rows.
  */
case class TopKAgg(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer]
    with BinaryLike[Expression] {

  require(k > 0, s"top-k requires k > 0, got $k")

  @transient private lazy val payloadOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(payload.dataType)

  @transient private lazy val serProj: UnsafeProjection =
    UnsafeProjection.create(Array[DataType](DoubleType, payload.dataType))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, payloadOrd)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val v = payload.eval(input)
    if (s != null && v != null) {
      // payload may be backed by the reused unsafe input row — copy on keep.
      // Cheap pre-check: only copy when the entry would actually be kept.
      val sd = s.asInstanceOf[Double]
      if (buffer.n < buffer.k || sd > buffer.scores(0) ||
        (sd == buffer.scores(0) && payloadOrd.lt(v, buffer.vals(0)))) {
        buffer.insert(sd, InternalRow.copyValue(v))
      }
    }
    buffer
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b2.n) { b1.insert(b2.scores(i), b2.vals(i)); i += 1 }
    b1
  }

  override def eval(buffer: TopKBuffer): Any = {
    val s = buffer.sorted
    new GenericArrayData(s.map { case (sc, v) =>
      new GenericInternalRow(Array[Any](sc, v)): Any
    })
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val rows = new Array[Array[Byte]](buffer.n)
    var total = 4
    var i = 0
    val tmp = new GenericInternalRow(2)
    while (i < buffer.n) {
      tmp.update(0, buffer.scores(i))
      tmp.update(1, buffer.vals(i))
      // getBytes returns the projection's REUSED backing array when the
      // row is exactly sized — clone, or every entry aliases the last
      rows(i) = serProj(tmp).getBytes.clone()
      total += 4 + rows(i).length
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buffer.n)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k, payloadOrd)
    val row = new UnsafeRow(2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      row.pointTo(arr, len)
      buf.insert(row.getDouble(0), InternalRow.copyValue(row.get(1, payload.dataType)))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("payload", payload.dataType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def left: Expression = score
  override def right: Expression = payload

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): TopKAgg = copy(score = newLeft, payload = newRight)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "topk_agg"
}

object TopK {

  /** The aggregate as a Column: `array<struct<score, payload>>` of the k
    * best (score desc, payload asc) entries per group.
    */
  def agg(score: Column, payload: Column, k: Int): Column =
    Bridge.aggColumn(TopKAgg(
      Bridge.expr(score.cast("double")), Bridge.expr(payload), k))

  /** Per-key top-k as rows: groupBy(keys) → bounded-heap aggregate →
    * explode. Output columns: keys ++ carry ++ (payloadCol, scoreCol) —
    * the same rows `row_number() OVER (PARTITION BY keys ORDER BY score
    * DESC, payload) <= k` keeps, with map-side combining instead of a
    * full exchange+sort of the candidate frame.
    *
    * `carry` columns must be FUNCTIONALLY DETERMINED by the keys (e.g. a
    * query's own vector repeated on each scored row) — they ride along
    * via `first(...)`.
    */
  def perKey(
      df: DataFrame,
      keys: Seq[String],
      scoreCol: String,
      payloadCol: String,
      k: Int,
      carry: Seq[String] = Nil
  ): DataFrame = {
    val aggs = agg(col(scoreCol), col(payloadCol), k).as("__topk") +:
      carry.map(c => first(col(c)).as(c))
    df.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((keys ++ carry).map(col) :+ explode(col("__topk")).as("__kv"): _*)
      .select(
        (keys ++ carry).map(col) :+
          col("__kv.payload").as(payloadCol) :+
          col("__kv.score").as(scoreCol): _*)
  }
}
