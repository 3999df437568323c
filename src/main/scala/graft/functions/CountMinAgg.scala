package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode–Muthukrishnan 2005) over pre-hashed token
  * values — the point-frequency complement to the [[HeavyHittersAgg]]
  * Misra–Gries sketch (MG keeps only the top-`capacity` candidates;
  * CMS answers "how often did THIS token occur" for ANY token, with a
  * one-sided overcount error ≤ e·n/width at probability 1−(1/e)^depth).
  *
  * Depth hash rows are the same affine family the minhash signatures
  * use — `(a_r·h + b_r) mod p mod width` with `p = 2³¹−1` and
  * [[graft.dedup.MinHashLsh.coefficients]] seeded constants — so a
  * sketch built on the shared 60-bit md5 hash is REPLAYED EXACTLY by
  * the DuckDB oracle (all arithmetic < 2⁶²; same trade as q21).
  *
  * Unlike MG, the CMS buffer is a pure counter ARRAY: merge is
  * element-wise addition, so the sketch CONTENT (not just its
  * guarantee) is partition- and merge-order-invariant — exactly
  * reproducible on any cluster layout. State is depth·width longs per
  * group, map-side combined like every graft sketch.
  */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(width >= 2, "count-min width must be >= 2")
  require(depth >= 1, "count-min depth must be >= 1")

  @transient private lazy val coefs = graft.dedup.MinHashLsh.coefficients(depth, seed)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMinAgg.updateCells(buffer, v.asInstanceOf[Long], width, coefs)
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

object CountMinAgg {
  val Prime: Long = 2147483647L

  /** The shared cell addressing — one definition for the batch
    * aggregate, the point query, and the streaming state
    * ([[graft.streaming.DocStream.cmsStream]]), so all three carry the
    * same layout from the same code (the MisraGries precedent).
    */
  def cellIdx(a: Long, b: Long, hh: Long, width: Int): Int =
    (((a * hh + b) % Prime) % width).toInt

  def updateCells(cells: Array[Long], h: Long, width: Int, coefs: Seq[(Long, Long)]): Unit = {
    val hh = java.lang.Math.floorMod(h, Prime)
    var r = 0
    while (r < coefs.length) {
      val (a, b) = coefs(r)
      cells(r * width + cellIdx(a, b, hh, width)) += 1L
      r += 1
    }
  }

  /** Column form over a LONG hash column (shared md5-60 for oracle
    * replay, xxhash64 for production throughput — the q21 trade).
    */
  def countMin(hash: Column, width: Int, depth: Int, seed: Long): Column =
    Bridge.aggColumn(CountMinAgg(Bridge.expr(hash), width, depth, seed))
}

/** Point query against a [[CountMinAgg]] sketch: min over the depth
  * rows at the probe hash's cells. Sketch frames are stratum-sized
  * (rows = groups, not corpus), so this stays an eval expression —
  * nothing here is in a 100 TB hot path.
  */
case class CmsQuery(
    left: Expression,
    right: Expression,
    width: Int,
    depth: Int,
    seed: Long
) extends BinaryExpression
    with CodegenFallback {

  @transient private lazy val coefs = graft.dedup.MinHashLsh.coefficients(depth, seed)

  override def dataType: DataType = LongType

  override def nullSafeEval(sketch: Any, hash: Any): Any = {
    val counts = sketch.asInstanceOf[ArrayData]
    require(
      counts.numElements() == depth * width,
      s"cms_query: sketch has ${counts.numElements()} cells, expected ${depth * width}")
    val hh = java.lang.Math.floorMod(hash.asInstanceOf[Long], CountMinAgg.Prime)
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val (a, b) = coefs(r)
      val c = counts.getLong(r * width + CountMinAgg.cellIdx(a, b, hh, width))
      if (c < best) best = c
      r += 1
    }
    best
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsQuery =
    copy(left = l, right = r)
}

object CmsQuery {
  def apply(sketch: Column, hash: Column, width: Int, depth: Int, seed: Long): Column =
    Bridge.column(new CmsQuery(Bridge.expr(sketch), Bridge.expr(hash), width, depth, seed))
}
