package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise sum of float-vector columns in ONE aggregate pass — the
  * primitive under embedding centroids / mean pooling.
  *
  * The composable alternatives are structurally wrong at scale:
  * `posexplode + groupBy(group, dim)` multiplies the shuffle by the
  * dimension count and needs a second shuffle to reassemble the vector;
  * `dims` separate `sum(element_at(...))` aggregates is the same Janino
  * codegen blow-up [[MinHashAgg]] exists to avoid. This
  * TypedImperativeAggregate keeps one `Array[Double]` buffer (sized on
  * first input), adds each vector in a tight primitive loop, map-side
  * combines for free, and ships dims×8 bytes per partial.
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  // element accessor resolved ONCE from the input type: float vectors
  // (raw embeddings) and double vectors (normalized [[graft.sim.HashEmbed]]
  // output, [[graft.sim.DocEmbed]] pooling) both sum in double
  private lazy val isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => false
    case other => throw new IllegalArgumentException(
      s"VecSumAgg: expected array<float> or array<double>, got $other")
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buffer.length == 0) new Array[Double](n) else buffer
      require(b.length == n, s"vector length mismatch: ${b.length} vs $n")
      var i = 0
      if (isDouble) while (i < n) { b(i) += arr.getDouble(i); i += 1 }
      else while (i < n) { b(i) += arr.getFloat(i); i += 1 }
      b
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1.length == 0) b2
    else if (b2.length == 0) b1
    else {
      // same guard as update(): ragged lengths split across partitions
      // must fail loudly, not silently truncate / overrun
      require(b1.length == b2.length, s"vector length mismatch: ${b1.length} vs ${b2.length}")
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(storageFormat)
    Array.fill(storageFormat.length / 8)(bb.getDouble)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
    copy(child = newChild)
}

object VecSumAgg {
  /** Column form: element-wise sum (array<double>) of an array<float>
    * or array<double> column.
    */
  def vecSum(vec: Column): Column = Bridge.aggColumn(VecSumAgg(Bridge.expr(vec)))
}
