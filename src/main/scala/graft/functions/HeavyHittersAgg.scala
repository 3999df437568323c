package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries heavy-hitters sketch over token arrays — the
  * frequent-items summary a 100 TB corpus dashboard needs where an
  * exact per-token groupBy would shuffle every (stratum, token)
  * occurrence just to find the few fat ones. State is AT MOST
  * `capacity` (token, counter) pairs per group regardless of
  * vocabulary size, map-side combined like every graft sketch.
  *
  * Guarantee (Misra–Gries 1982; merge rule per Agarwal et al. 2013,
  * "Mergeable summaries"): after any sequence of updates and merges
  * totalling n tokens, every token with true frequency > n/(capacity+1)
  * is IN the sketch, and each kept counter underestimates its true
  * count by at most n/(capacity+1). The sketch CONTENTS depend on
  * partitioning / merge order, but the containment guarantee does not —
  * which is why [[graft.text.Vocab.heavyHitters]] uses it only as a
  * candidate filter in front of an exact counting pass, making the
  * composed output exact and partition-invariant (and DuckDB-
  * oracle-checkable).
  *
  * Update: counter present → +1; room free → insert at 1; full → every
  * counter −1, zeros evicted (the arriving token is not inserted — it
  * and `capacity` kept counts cancel, which is where the n/(capacity+1)
  * bound comes from). Merge: sum counters pointwise, then subtract the
  * (capacity+1)-th largest count and evict ≤ 0 (a no-op when the union
  * already fits).
  *
  * Eval output: array<struct<token string, count long>> sorted by count
  * desc, token asc (deterministic given the final counter multiset).
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(capacity >= 1, "heavy-hitters capacity must be >= 1")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def updateOne(m: mutable.HashMap[String, Long], tok: String): Unit =
    MisraGries.updateOne(m, tok, capacity)

  override def update(
      buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) updateOne(buffer, arr.getUTF8String(i).toString)
        i += 1
      }
    }
    buffer
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGries.merge(b1, b2, capacity)

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val entries = buffer.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(entries.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    })
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    var len = 4
    val items = buffer.toArray.map { case (k, c) =>
      val b = k.getBytes(StandardCharsets.UTF_8); len += 4 + b.length + 8; (b, c)
    }
    val bb = ByteBuffer.allocate(len)
    bb.putInt(items.length)
    items.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      m.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}

object HeavyHittersAgg {
  /** Column form: Misra–Gries sketch of an array<string> token column. */
  def heavyHitters(tokens: Column, capacity: Int): Column =
    Bridge.aggColumn(HeavyHittersAgg(Bridge.expr(tokens), capacity))
}

/** The Misra–Gries counter moves, shared by the batch aggregate above
  * and the streaming per-stratum state
  * ([[graft.streaming.DocStream.heavyHittersStream]]) so both carry the
  * same containment guarantee from the same code.
  */
object MisraGries {

  def updateOne(m: mutable.HashMap[String, Long], tok: String, capacity: Int): Unit =
    m.get(tok) match {
      case Some(c) => m.update(tok, c + 1L)
      case None =>
        if (m.size < capacity) m.update(tok, 1L)
        else {
          // decrement-all; amortized O(1) per token: each pass here
          // consumes capacity+1 count units (the arriving token included)
          val keys = m.keysIterator.toArray
          keys.foreach { k =>
            val c = m(k)
            if (c == 1L) m.remove(k) else m.update(k, c - 1L)
          }
        }
    }

  /** Pointwise-sum then subtract the (capacity+1)-th largest count —
    * the mergeable-summaries rule (Agarwal 2013). Mutates and returns b1.
    */
  def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long],
      capacity: Int): mutable.HashMap[String, Long] = {
    b2.foreachEntry { (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    if (b1.size > capacity) {
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val keys = b1.keysIterator.toArray
      keys.foreach { k =>
        val c = b1(k)
        if (c <= sub) b1.remove(k) else b1.update(k, c - sub)
      }
    }
    b1
  }
}
