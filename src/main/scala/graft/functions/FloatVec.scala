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

/** Codegen'd dense matrix × float-vector product: out[r] = Σ_j
  * flat[r·dim + j] · v[j], double accumulation per row, float output —
  * bit-identical to a stack of [[FloatDot]]s cast to float, which is
  * exactly what it replaces in [[graft.sim.Opq.Rotation]]: a d×d
  * rotation as d separate dot expressions is d literal arrays and d
  * codegen subtrees (a Janino-sized expression at d = 64+); here the
  * matrix is ONE broadcast reference object and the product one tight
  * loop. The matrix is constructor state, not a child expression.
  */
case class FloatMatVec(child: Expression, flat: Array[Float], rows: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(rows > 0 && flat.length % rows == 0, s"bad matrix shape: ${flat.length} floats / $rows rows")
  private val dim = flat.length / rows

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(dim, x.numElements())
    val out = new Array[Float](rows)
    var r = 0
    while (r < rows) {
      var s = 0.0
      var j = 0
      while (j < n) { s += flat(r * dim + j).toDouble * x.getFloat(j).toDouble; j += 1 }
      out(r) = s.toFloat
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("fmvMat", flat, "float[]")
    val n = ctx.freshName("fmvN")
    val out = ctx.freshName("fmvOut")
    val r = ctx.freshName("fmvR")
    val j = ctx.freshName("fmvJ")
    val s = ctx.freshName("fmvS")
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"""
        |int $n = java.lang.Math.min($dim, $a.numElements());
        |float[] $out = new float[$rows];
        |for (int $r = 0; $r < $rows; $r++) {
        |  double $s = 0.0;
        |  for (int $j = 0; $j < $n; $j++) {
        |    $s += (double) $mat[$r * $dim + $j] * (double) $a.getFloat($j);
        |  }
        |  $out[$r] = (float) $s;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |""".stripMargin
    )
  }

  override protected def withNewChildInternal(newChild: Expression): FloatMatVec =
    copy(child = newChild)
}

object FloatVec {
  /** Dot product of two float-array columns (double result). */
  def dot(a: Column, b: Column): Column = Bridge.column(FloatDot(Bridge.expr(a), Bridge.expr(b)))

  /** Dense matrix (row-major flat, `rows` rows) × float-vector column:
    * array<float> of length `rows`.
    */
  def matVec(v: Column, flat: Array[Float], rows: Int): Column =
    Bridge.column(FloatMatVec(Bridge.expr(v), flat, rows))

  /** L2 norm of a float-array column. */
  def norm(v: Column): Column = org.apache.spark.sql.functions.sqrt(dot(v, v))

  /** Unit-normalized copy (array<double>) of a float-array column. */
  def normalize(v: Column): Column = Bridge.column(FloatNormalize(Bridge.expr(v)))
}
