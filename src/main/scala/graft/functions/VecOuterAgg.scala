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

/** Second-moment accumulator for float-vector columns in ONE aggregate
  * pass: count, Σv (d doubles) and the upper triangle of Σ v·vᵀ
  * (d(d+1)/2 doubles) in a single flat buffer — everything a covariance
  * matrix / PCA fit needs. Same design rationale as [[VecSumAgg]]: the
  * exploded `groupBy(dim_i, dim_j)` alternative shuffles n·d² rows and
  * d² separate `sum(element_at×element_at)` aggregates blow up Janino;
  * this buffer map-side combines and ships (1 + d + d(d+1)/2)×8 bytes
  * per partial — ~16 KB at d = 64 — regardless of n.
  *
  * Buffer layout (and the eval output, as array<double>):
  * `[n, s_0..s_{d-1}, q_00, q_01, .., q_0(d-1), q_11, .., q_(d-1)(d-1)]`.
  */
case class VecOuterAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      val len = 1 + d + d * (d + 1) / 2
      val b = if (buffer.length == 0) new Array[Double](len) else buffer
      require(b.length == len, s"vector length mismatch: buffer ${b.length} vs dim $d")
      b(0) += 1.0
      val x = new Array[Double](d)
      var i = 0
      while (i < d) {
        // a null element would read as 0/garbage and silently skew every
        // downstream moment (Pca.fit, Embed.standardizer) — fail loudly
        require(!arr.isNullAt(i), s"VecOuterAgg: null element at dim $i (containsNull input)")
        x(i) = arr.getFloat(i); b(1 + i) += x(i); i += 1
      }
      var p = 1 + d
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { b(p) += x(i) * x(j); p += 1; j += 1 }
        i += 1
      }
      b
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1.length == 0) b2
    else if (b2.length == 0) b1
    else {
      require(b1.length == b2.length, s"buffer length mismatch: ${b1.length} vs ${b2.length}")
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

  override def withNewMutableAggBufferOffset(newOffset: Int): VecOuterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecOuterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecOuterAgg =
    copy(child = newChild)
}

object VecOuterAgg {
  /** Column form: the flat [n, Σv, upper(Σvvᵀ)] buffer of an
    * array<float> column.
    */
  def vecOuter(vec: Column): Column = Bridge.aggColumn(VecOuterAgg(Bridge.expr(vec)))
}
