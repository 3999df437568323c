package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Codegen'd |A ∩ B| for two SORTED `array<long>` columns
  * (SURVEY.md §3: custom-Expression tier).
  *
  * `size(array_intersect(a, b))` builds a hash set PER ROW PAIR — in a
  * similarity join that is millions of allocations. A merge walk over
  * pre-sorted arrays allocates nothing and stays in whole-stage codegen.
  * Callers sort once per document (`sort_array`), not once per pair.
  */
case class SortedIntersectSize(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh names — fixed locals collide when several instances share a
    // codegen stage (Janino error → silent interpreted fallback)
    val i = ctx.freshName("siI"); val j = ctx.freshName("siJ"); val c = ctx.freshName("siC")
    val na = ctx.freshName("siNa"); val nb = ctx.freshName("siNb")
    val xv = ctx.freshName("siX"); val yv = ctx.freshName("siY")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int $i = 0, $j = 0, $c = 0;
        |int $na = $a.numElements(), $nb = $b.numElements();
        |while ($i < $na && $j < $nb) {
        |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
        |  if ($xv == $yv) { $c++; $i++; $j++; }
        |  else if ($xv < $yv) { $i++; } else { $j++; }
        |}
        |${ev.value} = $c;
        |""".stripMargin
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectSize =
    copy(left = l, right = r)
}

object SetOps {
  /** |A ∩ B| of two sorted long-array columns. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectSize(Bridge.expr(a), Bridge.expr(b)))
}
