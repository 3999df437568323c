package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Product-quantization primitives (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) as codegen'd Catalyst
  * expressions — the [[FloatDot]] tier: tight primitive loops inside
  * whole-stage codegen, no boxing, no HOF interpretation.
  *
  * Layout conventions (all row-major, flattened):
  *   codebook  array<float>  [m·k·dsub]  entry (sub, cent, dim) at
  *             (sub·k + cent)·dsub + dim
  *   codes     binary        [m]         one unsigned byte per subspace
  *                                       (k ≤ 256)
  *   lut       array<double> [m·k]       entry (sub, cent) at sub·k+cent
  *
  * The whole point of PQ at 100 TB: corpus vectors shrink from d floats
  * to m bytes (e.g. 256 B → 8 B), and asymmetric-distance scoring reads
  * the LUT (computed ONCE per query) with m adds per candidate instead
  * of d multiplies — memory traffic, not FLOPs, is what bounds
  * brute-force scans at scale.
  */
object PqOps {

  /** `argmin_c ‖v_sub − codebook[sub][c]‖²` per subspace → m code bytes. */
  case class PqEncode(left: Expression, right: Expression, dsub: Int)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType

    override def nullSafeEval(v: Any, cb: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val c = cb.asInstanceOf[ArrayData]
      val m = x.numElements() / dsub
      val k = c.numElements() / (m * dsub)
      val out = new Array[Byte](m)
      var sub = 0
      while (sub < m) {
        var best = Double.MaxValue; var bi = 0; var cc = 0
        while (cc < k) {
          var s = 0.0; var d = 0
          while (d < dsub) {
            val diff = x.getFloat(sub * dsub + d) - c.getFloat((sub * k + cc) * dsub + d)
            s += diff * diff; d += 1
          }
          if (s < best) { best = s; bi = cc }
          cc += 1
        }
        out(sub) = bi.toByte
        sub += 1
      }
      out
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = ctx.freshName("pqM"); val k = ctx.freshName("pqK")
      val out = ctx.freshName("pqOut"); val sub = ctx.freshName("pqSub")
      val best = ctx.freshName("pqBest"); val bi = ctx.freshName("pqBi")
      val cc = ctx.freshName("pqC"); val s = ctx.freshName("pqS")
      val d = ctx.freshName("pqD"); val diff = ctx.freshName("pqDiff")
      nullSafeCodeGen(
        ctx,
        ev,
        (v, cb) => s"""
          |int $m = $v.numElements() / $dsub;
          |int $k = $cb.numElements() / ($m * $dsub);
          |byte[] $out = new byte[$m];
          |for (int $sub = 0; $sub < $m; $sub++) {
          |  double $best = Double.MAX_VALUE; int $bi = 0;
          |  for (int $cc = 0; $cc < $k; $cc++) {
          |    double $s = 0.0;
          |    for (int $d = 0; $d < $dsub; $d++) {
          |      double $diff = (double) $v.getFloat($sub * $dsub + $d)
          |        - (double) $cb.getFloat(($sub * $k + $cc) * $dsub + $d);
          |      $s += $diff * $diff;
          |    }
          |    if ($s < $best) { $best = $s; $bi = $cc; }
          |  }
          |  $out[$sub] = (byte) $bi;
          |}
          |${ev.value} = $out;
          |""".stripMargin
      )
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
      copy(left = l, right = r)
  }

  /** Per-query lookup table: `lut[sub·k+c] = ⟨q_sub, codebook[sub][c]⟩`.
    * Computed once per query row (d·k multiplies), amortized over every
    * candidate it scores.
    */
  case class PqLut(left: Expression, right: Expression, dsub: Int)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

    override def nullSafeEval(v: Any, cb: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val c = cb.asInstanceOf[ArrayData]
      val m = x.numElements() / dsub
      val k = c.numElements() / (m * dsub)
      val out = new Array[Double](m * k)
      var sub = 0
      while (sub < m) {
        var cc = 0
        while (cc < k) {
          var s = 0.0; var d = 0
          while (d < dsub) {
            s += x.getFloat(sub * dsub + d).toDouble * c.getFloat((sub * k + cc) * dsub + d).toDouble
            d += 1
          }
          out(sub * k + cc) = s
          cc += 1
        }
        sub += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = ctx.freshName("plM"); val k = ctx.freshName("plK")
      val out = ctx.freshName("plOut"); val sub = ctx.freshName("plSub")
      val cc = ctx.freshName("plC"); val s = ctx.freshName("plS"); val d = ctx.freshName("plD")
      nullSafeCodeGen(
        ctx,
        ev,
        (v, cb) => s"""
          |int $m = $v.numElements() / $dsub;
          |int $k = $cb.numElements() / ($m * $dsub);
          |double[] $out = new double[$m * $k];
          |for (int $sub = 0; $sub < $m; $sub++) {
          |  for (int $cc = 0; $cc < $k; $cc++) {
          |    double $s = 0.0;
          |    for (int $d = 0; $d < $dsub; $d++) {
          |      $s += (double) $v.getFloat($sub * $dsub + $d)
          |        * (double) $cb.getFloat(($sub * $k + $cc) * $dsub + $d);
          |    }
          |    $out[$sub * $k + $cc] = $s;
          |  }
          |}
          |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
          |""".stripMargin
      )
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqLut =
      copy(left = l, right = r)
  }

  /** Asymmetric-distance score: `Σ_sub lut[sub·k + codes[sub]]` — m array
    * reads and adds per candidate. Also evaluates any other per-(sub,
    * cent) table (e.g. squared-norm tables for approximate cosine).
    */
  case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType

    override def nullSafeEval(codes: Any, lut: Any): Any = {
      val c = codes.asInstanceOf[Array[Byte]]
      val l = lut.asInstanceOf[ArrayData]
      val m = c.length
      val k = l.numElements() / m
      var s = 0.0; var sub = 0
      while (sub < m) { s += l.getDouble(sub * k + (c(sub) & 0xff)); sub += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val m = ctx.freshName("paM"); val k = ctx.freshName("paK")
      val s = ctx.freshName("paS"); val sub = ctx.freshName("paSub")
      nullSafeCodeGen(
        ctx,
        ev,
        (codes, lut) => s"""
          |int $m = $codes.length;
          |int $k = $lut.numElements() / $m;
          |double $s = 0.0;
          |for (int $sub = 0; $sub < $m; $sub++) {
          |  $s += $lut.getDouble($sub * $k + ($codes[$sub] & 0xff));
          |}
          |${ev.value} = $s;
          |""".stripMargin
      )
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
      copy(left = l, right = r)
  }

  def encode(vec: Column, codebook: Column, dsub: Int): Column =
    Bridge.column(PqEncode(Bridge.expr(vec), Bridge.expr(codebook), dsub))

  def lut(query: Column, codebook: Column, dsub: Int): Column =
    Bridge.column(PqLut(Bridge.expr(query), Bridge.expr(codebook), dsub))

  def adc(codes: Column, lutCol: Column): Column =
    Bridge.column(PqAdc(Bridge.expr(codes), Bridge.expr(lutCol)))
}
