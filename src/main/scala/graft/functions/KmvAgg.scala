package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** K-minimum-values (KMV / bottom-k theta) sketch over a long hash
  * column — the distinct-count and SET-OPERATION summary a corpus
  * catalog needs at 100 TB: "how many distinct tokens does this source
  * have" and "how much does the new crawl overlap what we already
  * hold", without ever shuffling the vocabulary (Bar-Yossef et al.
  * 2002; set operations per the theta-sketch framework,
  * Dasgupta et al. 2016).
  *
  * State is the k smallest DISTINCT hash values seen, nothing else —
  * k longs per group regardless of corpus size, map-side combined like
  * every graft sketch. Unlike Misra–Gries ([[HeavyHittersAgg]]), the
  * sketch CONTENT is partition/merge-order invariant (the k smallest
  * of a union is a symmetric function), so a DuckDB oracle can replay
  * the exact kept values with `row_number() OVER (ORDER BY h) <= k`,
  * and estimates derived from them are bit-replayable too.
  *
  * Input is an array<long> of hashes (one per token, pre-hashed with a
  * cross-engine hash such as [[SharedHash.md5Long60]]); nulls and null
  * elements are skipped. Eval output: the kept values sorted ASCENDING
  * (so `element_at(kmv, k)` is the kth minimum = theta).
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.TreeSet[Long]]
    with UnaryLike[Expression] {

  require(k >= 2, "kmv sketch size must be >= 2")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  @inline private def insert(s: mutable.TreeSet[Long], v: Long): Unit =
    Kmv.insert(s, v, k)

  override def update(
      buffer: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) insert(buffer, arr.getLong(i))
        i += 1
      }
    }
    buffer
  }

  override def merge(
      b1: mutable.TreeSet[Long],
      b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(insert(b1, _))
    b1
  }

  override def eval(buffer: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buffer.toArray) // TreeSet iterates ascending

  override def serialize(buffer: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object KmvAgg {
  /** Column form: KMV sketch (k smallest distinct values, ascending)
    * of an array<long> hash column.
    */
  def kmv(hashes: Column, k: Int): Column =
    Bridge.aggColumn(KmvAgg(Bridge.expr(hashes), k))
}

/** The KMV insert move, shared by the batch aggregate above and the
  * streaming per-corpus state
  * ([[graft.streaming.DocStream.kmvStream]]) — same code, so the
  * streamed sketch CONTENT equals the batch sketch bit-for-bit on any
  * batch split (k smallest of a union is symmetric).
  */
object Kmv {
  def insert(s: mutable.TreeSet[Long], v: Long, k: Int): Unit =
    if (s.size < k) s.add(v)
    else if (v < s.last) { // s.last = current kth minimum
      if (s.add(v)) s.remove(s.last)
    }
}
