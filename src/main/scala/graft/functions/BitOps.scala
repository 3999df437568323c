package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Sign-bit packing for binary-quantized ANN ([[graft.sim.AnnBinary]]):
  * dimension i contributes bit (i mod 32) of word (i div 32), bit = 1
  * iff the component is strictly negative. 32 dims per long word — not
  * 64 — so every word stays below 2^32 and the DuckDB oracle can
  * rebuild it with plain BIGINT shifts/sums (a sign bit in position 63
  * would need unsigned-overflow gymnastics on the SQL side).
  *
  * Zero maps to bit 0 on both engines (-0.0f < 0 is false in Java and
  * DuckDB alike), so packing is an exact cross-engine function of the
  * float values.
  */
case class BinaryPack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val d = v.numElements()
    val words = new Array[Long]((d + 31) / 32)
    var i = 0
    while (i < d) {
      if (v.getFloat(i) < 0f) words(i >> 5) |= (1L << (i & 31))
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.freshName("bpD")
    val w = ctx.freshName("bpW")
    val i = ctx.freshName("bpI")
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        |int $d = $a.numElements();
        |long[] $w = new long[($d + 31) / 32];
        |for (int $i = 0; $i < $d; $i++) {
        |  if ($a.getFloat($i) < 0f) $w[$i >> 5] |= (1L << ($i & 31));
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($w);
        |""".stripMargin
    )
  }

  override protected def withNewChildInternal(newChild: Expression): BinaryPack =
    copy(child = newChild)
}

/** Codegen'd Hamming distance between two packed sign-bit arrays
  * (array<long> from [[BinaryPack]]): XOR + popcount per word, one
  * tight loop — the shortlist scorer for [[graft.sim.AnnBinary]].
  */
case class Hamming(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("hmN")
    val s = ctx.freshName("hmS")
    val i = ctx.freshName("hmI")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |long $s = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
        |}
        |${ev.value} = $s;
        |""".stripMargin
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hamming =
    copy(left = l, right = r)
}

object BitOps {
  /** Pack an array<float> into 32-dims-per-word sign bits. */
  def pack(v: Column): Column = Bridge.column(BinaryPack(Bridge.expr(v)))

  /** Hamming distance between two packed arrays. */
  def hamming(a: Column, b: Column): Column =
    Bridge.column(Hamming(Bridge.expr(a), Bridge.expr(b)))
}
