package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst aggregate computing a FULL minhash signature in one
  * pass (SURVEY.md §3: custom-Expression tier).
  *
  * The declarative alternative — `numHashes` separate `min(pmod(...))`
  * aggregates — generates enormous Janino code (hundreds of lines per
  * lane × 64 lanes × partial+final stages) whose compilation dominates
  * runtime on medium inputs and risks falling out of JIT limits. This
  * TypedImperativeAggregate keeps one `Array[Long]` buffer and updates
  * all lanes in a tight primitive loop per shingle hash: no codegen
  * blow-up, map-side combine for free, and the buffer serializes as a
  * compact byte block between stages.
  *
  * Semantics match the expression form exactly: lane i holds
  * min over shingles of (a_i·h + b_i) mod prime, with h = child value
  * already reduced into [0, prime).
  */
case class MinHashAgg(
    child: Expression,
    as: Seq[Long],
    bs: Seq[Long],
    prime: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  private val aArr = as.toArray
  private val bArr = bs.toArray

  override def createAggregationBuffer(): Array[Long] = Array.fill(aArr.length)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < aArr.length) {
        val x = (aArr(i) * h + bArr(i)) % prime // h < prime, a < prime≤2^31 ⇒ no overflow
        val m = if (x < 0) x + prime else x
        if (m < buffer(i)) buffer(i) = m
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(storageFormat)
    Array.fill(storageFormat.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Column form: minhash signature (array<long>) of grouped hash values. */
  def minhash(hashCol: Column, as: Seq[Long], bs: Seq[Long], prime: Long): Column =
    Bridge.aggColumn(MinHashAgg(Bridge.expr(hashCol), as, bs, prime))
}
