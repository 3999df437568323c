package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Improved Consistent Weighted Sampling (Ioffe, "Improved Consistent
  * Sampling, Weighted Minhash and L1 Sketching", ICDM 2010) as one
  * aggregate pass — WEIGHTED minhash, where the collision probability of
  * two documents' lane samples equals their generalized Jaccard
  * `Σ_x min(wA(x), wB(x)) / Σ_x max(wA(x), wB(x))` instead of the
  * set Jaccard plain [[MinHashAgg]] estimates.
  *
  * Per element x (a 64-bit token/shingle hash) with weight w > 0 and per
  * lane i, ICWS draws (r, c ~ Gamma(2,1), β ~ U(0,1)) as pure functions
  * of (x, i, seed) — consistency: the SAME element always draws the same
  * variables in every document — then
  *   t = ⌊ln(w)/r + β⌋,  y = exp(r·(t − β)),  a = c / (y·exp(r))
  * and the lane keeps the element minimizing `a`; the emitted lane value
  * identifies the sample (x, t), so two documents agree on a lane iff
  * they sampled the same element at the same weight level.
  *
  * Same structural justification as [[MinHashAgg]]: all lanes update in
  * one primitive loop per input row (numHashes separate declarative
  * aggregates would blow up Janino), the buffer map-side combines, and
  * the shuffle carries 2×lanes×8 bytes per partial. Uniform draws come
  * from a splitmix64 chain (public-domain mixing constants); exp/log are
  * JVM-deterministic, and ties on `a` break toward the smaller sample
  * value so results are independent of partitioning.
  */
case class IcwsMinHashAgg(
    left: Expression,  // element hash (long)
    right: Expression, // weight (double, > 0; rows with w <= 0 are skipped)
    numHashes: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[IcwsMinHashAgg.Buf]
    with BinaryLike[Expression] {
  import IcwsMinHashAgg.{mix, uniform}

  override def createAggregationBuffer(): IcwsMinHashAgg.Buf =
    IcwsMinHashAgg.Buf(Array.fill(numHashes)(Double.MaxValue), new Array[Long](numHashes))

  override def update(buf: IcwsMinHashAgg.Buf, input: InternalRow): IcwsMinHashAgg.Buf = {
    val hv = left.eval(input)
    val wv = right.eval(input)
    if (hv != null && wv != null) {
      val h = hv.asInstanceOf[Long]
      val w = wv.asInstanceOf[Double]
      if (w > 0.0) {
        val lnW = math.log(w)
        val base = mix(h ^ seed)
        var i = 0
        while (i < numHashes) {
          // five uniforms per (element, lane), chained from a per-lane seed
          var z = mix(base + i * 0x9e3779b97f4a7c15L)
          val u1 = uniform(z); z = mix(z)
          val u2 = uniform(z); z = mix(z)
          val u3 = uniform(z); z = mix(z)
          val u4 = uniform(z); z = mix(z)
          val u5 = uniform(z)
          val r = -math.log(u1 * u2) // Gamma(2,1)
          val c = -math.log(u3 * u4) // Gamma(2,1)
          val t = math.floor(lnW / r + u5)
          val y = math.exp(r * (t - u5))
          val a = c / (y * math.exp(r))
          val sample = mix(h ^ mix(java.lang.Double.doubleToLongBits(t)))
          if (a < buf.best(i) || (a == buf.best(i) && sample < buf.sample(i))) {
            buf.best(i) = a
            buf.sample(i) = sample
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(b1: IcwsMinHashAgg.Buf, b2: IcwsMinHashAgg.Buf): IcwsMinHashAgg.Buf = {
    var i = 0
    while (i < b1.best.length) {
      if (b2.best(i) < b1.best(i) ||
        (b2.best(i) == b1.best(i) && b2.sample(i) < b1.sample(i))) {
        b1.best(i) = b2.best(i)
        b1.sample(i) = b2.sample(i)
      }
      i += 1
    }
    b1
  }

  override def eval(buf: IcwsMinHashAgg.Buf): Any = new GenericArrayData(buf.sample)

  override def serialize(buf: IcwsMinHashAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.best.length * 16)
    buf.best.foreach(bb.putDouble)
    buf.sample.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): IcwsMinHashAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bytes.length / 16
    IcwsMinHashAgg.Buf(Array.fill(n)(bb.getDouble), Array.fill(n)(bb.getLong))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): IcwsMinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): IcwsMinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IcwsMinHashAgg =
    copy(left = l, right = r)
}

object IcwsMinHashAgg {

  /** Per-lane running minimum of ICWS `a` plus the winning sample id. */
  final case class Buf(best: Array[Double], sample: Array[Long])

  /** splitmix64 finalizer — public-domain mixing constants. */
  private[functions] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Strictly-inside-(0,1) uniform from a mixed long (53-bit mantissa). */
  private[functions] def uniform(z: Long): Double =
    ((z >>> 11) + 0.5) / 9007199254740992.0 // 2^53

  /** Column form: ICWS weighted-minhash signature (array<long>) of
    * grouped (hash, weight) rows.
    */
  def icws(hashCol: Column, weightCol: Column, numHashes: Int, seed: Long): Column =
    Bridge.aggColumn(
      IcwsMinHashAgg(Bridge.expr(hashCol), Bridge.expr(weightCol), numHashes, seed))
}
