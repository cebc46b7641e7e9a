package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Point-in-polygon (PNPOLY even-odd ray cast) as a JVM loop shared by
  * the interpreted and generated paths — the per-edge toggle walk is a
  * loop over the vertex arrays, not an expression tree. Comparison-based
  * (one multiply/divide per crossing edge), so results are stable across
  * engines computing the same IEEE doubles — the property the DuckDB
  * oracle needs. */
object Polygon {

  /** Even-odd containment of (x, y) in the polygon (xs(i), ys(i)),
    * vertices in order (either winding), implicitly closed. Points
    * exactly on an edge follow PNPOLY's half-open convention
    * (deterministic, but treat edge-point semantics as unspecified). */
  def contains(xs: Array[Double], ys: Array[Double],
               x: Double, y: Double): Boolean = {
    var inside = false
    var j = xs.length - 1
    var i = 0
    while (i < xs.length) {
      if (((ys(i) > y) != (ys(j) > y)) &&
          (x < (xs(j) - xs(i)) * (y - ys(i)) / (ys(j) - ys(i)) + xs(i)))
        inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Does the closed axis-aligned rectangle [x0,x1]×[y0,y1] intersect the
    * polygon (interior or boundary)? Driver-side only — used to prune
    * partition directories to the cells a concave polygon actually
    * touches, instead of its whole bounding box. Exact up to IEEE double
    * arithmetic; boundary-touching cases count as intersecting (the
    * conservative direction for pruning — an extra directory read is
    * cheap, a missed one loses rows). */
  def rectIntersects(xs: Array[Double], ys: Array[Double],
                     x0: Double, x1: Double, y0: Double, y1: Double): Boolean = {
    // (a) any polygon vertex inside the rect ⊇ "polygon ⊂ rect"
    var i = 0
    while (i < xs.length) {
      if (xs(i) >= x0 && xs(i) <= x1 && ys(i) >= y0 && ys(i) <= y1) return true
      i += 1
    }
    // (b) any rect corner inside the polygon ⊇ "rect ⊂ polygon"
    if (contains(xs, ys, x0, y0) || contains(xs, ys, x1, y0) ||
        contains(xs, ys, x0, y1) || contains(xs, ys, x1, y1)) return true
    // (c) any polygon edge crosses any rect edge (no containment either way)
    var j = xs.length - 1
    i = 0
    while (i < xs.length) {
      if (segmentsIntersect(xs(j), ys(j), xs(i), ys(i), x0, y0, x1, y0) ||
          segmentsIntersect(xs(j), ys(j), xs(i), ys(i), x1, y0, x1, y1) ||
          segmentsIntersect(xs(j), ys(j), xs(i), ys(i), x1, y1, x0, y1) ||
          segmentsIntersect(xs(j), ys(j), xs(i), ys(i), x0, y1, x0, y0))
        return true
      j = i
      i += 1
    }
    false
  }

  /** Closed segment intersection (touching endpoints and collinear overlap
    * both count) via orientation tests. */
  private[graft] def segmentsIntersect(ax: Double, ay: Double, bx: Double, by: Double,
                                       cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    if (o1 != o2 && o3 != o4) true
    else (o1 == 0 && onSegment(ax, ay, bx, by, cx, cy)) ||
         (o2 == 0 && onSegment(ax, ay, bx, by, dx, dy)) ||
         (o3 == 0 && onSegment(cx, cy, dx, dy, ax, ay)) ||
         (o4 == 0 && onSegment(cx, cy, dx, dy, bx, by))
  }

  private def orient(ax: Double, ay: Double, bx: Double, by: Double,
                     cx: Double, cy: Double): Int =
    math.signum((bx - ax) * (cy - ay) - (by - ay) * (cx - ax)).toInt

  /** Is collinear point (px, py) within segment (ax, ay)-(bx, by)'s box? */
  private def onSegment(ax: Double, ay: Double, bx: Double, by: Double,
                        px: Double, py: Double): Boolean =
    px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
    py >= math.min(ay, by) && py <= math.max(ay, by)
}

/** Native Catalyst expression: is (lon, lat) inside the fixed polygon?
  * The vertex arrays ride along as codegen reference objects; generated
  * code is one static call, inside whole-stage codegen. Combine with a
  * bounding-box pre-filter (`GeoExtent` / partition pruning) so the exact
  * test only runs on candidate rows. */
case class PointInPolygon(lonExpr: Expression, latExpr: Expression,
                          xs: Seq[Double], ys: Seq[Double])
    extends Expression {
  require(xs.length == ys.length && xs.length >= 3,
    "polygon needs >= 3 (x, y) vertices with matching lengths")

  override def children: Seq[Expression] = Seq(lonExpr, latExpr)
  override def nullable: Boolean = lonExpr.nullable || latExpr.nullable
  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"

  private lazy val xsArr = xs.toArray
  private lazy val ysArr = ys.toArray

  override def eval(input: InternalRow): Any = {
    val lon = lonExpr.eval(input)
    val lat = latExpr.eval(input)
    if (lon == null || lat == null) null
    else Polygon.contains(xsArr, ysArr,
      lon.asInstanceOf[Double], lat.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lonGen = lonExpr.genCode(ctx)
    val latGen = latExpr.genCode(ctx)
    val xsRef = ctx.addReferenceObj("polyXs", xsArr, "double[]")
    val ysRef = ctx.addReferenceObj("polyYs", ysArr, "double[]")
    ev.copy(code =
      code"""
        ${lonGen.code}
        ${latGen.code}
        boolean ${ev.isNull} = ${lonGen.isNull} || ${latGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.Polygon.contains(
            $xsRef, $ysRef, ${lonGen.value}, ${latGen.value});
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lonExpr = newChildren(0), latExpr = newChildren(1))
}

object PointInPolygon {
  /** Column API: true where (lon, lat) falls inside the polygon. */
  def column(lon: Column, lat: Column,
             vertices: Seq[(Double, Double)]): Column =
    ColumnBridge.column(PointInPolygon(
      ColumnBridge.expression(lon.cast("double")),
      ColumnBridge.expression(lat.cast("double")),
      vertices.map(_._1), vertices.map(_._2)))
}
