package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Hilbert space-filling curve on the 2^bits × 2^bits grid.
  *
  * The iterative bit-rotation algorithm (one reflect/swap per level)
  * cannot be a sane Column tree — each level's x/y reference the previous
  * level's twice, so an expression encoding doubles per level. It lives
  * here as a tight JVM loop instead, called from both the interpreted
  * `eval` and the generated code (same single-static-call shape as
  * [[Geodesic.inverse]] — stays inside whole-stage codegen). */
object Hilbert {

  /** Curve index d of (x, y), both in [0, 2^bits). Standard xy→d walk:
    * per level s (high to low), the quadrant contributes s²·((3·rx)⊕ry)
    * and the frame reflects+swaps when entering a bottom quadrant. */
  def index(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0; var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk d→(x, y); [[index]]'s exact mirror (bijectivity and
    * unit-step adjacency are property-tested over whole grids). */
  def inverse(bits: Int, d0: Long): (Long, Long) = {
    val n = 1L << bits
    var x = 0L; var y = 0L
    var t = d0
    var s = 1L
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

/** Native Catalyst expression for the Hilbert index of two long
  * coordinate columns — codegen emits one static call, so the layout key
  * computation stays inside whole-stage codegen like [[Layout.zValue]]'s
  * bit arithmetic. */
case class HilbertIndex(xExpr: Expression, yExpr: Expression, bits: Int)
    extends Expression {
  require(bits >= 1 && 2 * bits <= 62,
    "bits must be in [1, 31] (2*bits index bits must fit a long)")

  override def children: Seq[Expression] = Seq(xExpr, yExpr)
  override def nullable: Boolean = xExpr.nullable || yExpr.nullable
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def eval(input: InternalRow): Any = {
    val x = xExpr.eval(input)
    val y = yExpr.eval(input)
    if (x == null || y == null) null
    else Hilbert.index(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xGen = xExpr.genCode(ctx)
    val yGen = yExpr.genCode(ctx)
    ev.copy(code =
      code"""
        ${xGen.code}
        ${yGen.code}
        boolean ${ev.isNull} = ${xGen.isNull} || ${yGen.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.Hilbert.index(
            $bits, ${xGen.value}, ${yGen.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(xExpr = newChildren(0), yExpr = newChildren(1))
}

object HilbertIndex {
  /** Column API: Hilbert index of (x, y) long columns on the 2^bits grid. */
  def column(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), bits))
}
