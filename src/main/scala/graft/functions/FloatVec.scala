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

object FloatVec {
  /** Dot product of two float-array columns (double result). */
  def dot(a: Column, b: Column): Column = Bridge.column(FloatDot(Bridge.expr(a), Bridge.expr(b)))

  /** L2 norm of a float-array column. */
  def norm(v: Column): Column = org.apache.spark.sql.functions.sqrt(dot(v, v))
}
