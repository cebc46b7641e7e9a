package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection SIZE of two SORTED ascending ARRAY<BIGINT> columns by a
  * single merge pass — the codegen'd exact-verify kernel for
  * set-similarity joins.
  *
  * Why it exists: `size(array_intersect(a, b))` evaluates in Catalyst's
  * interpreted collection path and builds a hash set PER ROW — at
  * millions of candidate pairs that interpreter tax dominates the whole
  * join (the same lesson as `WinnowSelectSpans`, q142). This expression
  * does one O(na+nb) primitive-long merge inside whole-stage codegen:
  * no allocation, no boxing, no per-row hash set.
  *
  * Contract: both inputs sorted ascending with DISTINCT elements
  * (array_sort(collect_set(...)) produces exactly that); null inputs
  * yield null. Equal runs advance both sides, so duplicate-free inputs
  * count each common value once. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects two ARRAY<BIGINT>, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0L
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        int $i = 0; int $j = 0;
        final int $nx = $a.numElements();
        final int $ny = $b.numElements();
        long ${ev.value}Acc = 0L;
        while ($i < $nx && $j < $ny) {
          final long $xv = $a.getLong($i);
          final long $yv = $b.getLong($j);
          if ($xv == $yv) { ${ev.value}Acc++; $i++; $j++; }
          else if ($xv < $yv) { $i++; } else { $j++; }
        }
        ${ev.value} = ${ev.value}Acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object ArrayIntersectCount {
  /** Column API: intersection size of two sorted-distinct ARRAY<BIGINT>. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
