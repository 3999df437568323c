package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two `array<float>` columns, accumulating
  * in double (SURVEY.md §3: custom-Expression tier).
  *
  * The composable alternative `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * is a higher-order function: Spark evaluates those interpreted, per
  * pair, with boxing — the dominant cost in similarity joins. This
  * expression is a tight primitive loop inside whole-stage codegen.
  * Summation order is sequential (index 0..n-1), matching both the HOF
  * form and the DuckDB oracle's ordered unnest sum.
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh names: multiple FloatDot instances can land in ONE codegen
    // stage (dot + two norms in a cosine); fixed locals would collide
    // and Janino's compile error silently falls back to interpreted
    val n = ctx.freshName("fdN")
    val s = ctx.freshName("fdS")
    val i = ctx.freshName("fdI")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        |}
        |${ev.value} = $s;
        |""".stripMargin
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDot =
    copy(left = l, right = r)
}

/** Codegen'd L2 unit-normalization of an `array<float>` column, result
  * `array<double>`. The composable `transform(v, x -> x / norm(v))`
  * re-evaluates the norm subtree PER ELEMENT once CollapseProject
  * inlines the bound alias into the interpreted lambda (the measured
  * shingling pitfall, SURVEY §3) — here the norm is computed once and
  * the divide is one primitive loop. A zero vector normalizes to zeros.
  */
case class FloatNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val f = x.getFloat(i).toDouble; s += f * f; i += 1 }
    val inv = if (s == 0.0) 0.0 else 1.0 / math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = x.getFloat(i).toDouble * inv; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("fnN")
    val s = ctx.freshName("fnS")
    val i = ctx.freshName("fnI")
    val inv = ctx.freshName("fnInv")
    val out = ctx.freshName("fnOut")
    val v = ctx.freshName("fnV")
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        |int $n = $a.numElements();
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $v = (double) $a.getFloat($i); $s += $v * $v;
        |}
        |double $inv = $s == 0.0 ? 0.0 : 1.0 / java.lang.Math.sqrt($s);
        |double[] $out = new double[$n];
        |for (int $i = 0; $i < $n; $i++) {
        |  $out[$i] = (double) $a.getFloat($i) * $inv;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |""".stripMargin
    )
  }

  override protected def withNewChildInternal(newChild: Expression): FloatNormalize =
    copy(child = newChild)
}

object FloatVec {
  /** Dot product of two float-array columns (double result). */
  def dot(a: Column, b: Column): Column = Bridge.column(FloatDot(Bridge.expr(a), Bridge.expr(b)))

  /** L2 norm of a float-array column. */
  def norm(v: Column): Column = org.apache.spark.sql.functions.sqrt(dot(v, v))

  /** Unit-normalized copy (array<double>) of a float-array column. */
  def normalize(v: Column): Column = Bridge.column(FloatNormalize(Bridge.expr(v)))
}
