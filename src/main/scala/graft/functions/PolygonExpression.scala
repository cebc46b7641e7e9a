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
