package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expression for WGS84 ellipsoidal distance to a fixed
  * point — replaces the ScalaUDF on the point-radius hot path: stays inside
  * whole-stage codegen (the generated code calls the static
  * [[Geodesic.inverse]] forwarder directly; no row serialization, no
  * closure dispatch).
  */
case class GeodesicDistanceToPoint(lonExpr: Expression, latExpr: Expression,
                                   lon0: Double, lat0: Double)
    extends Expression {

  override def children: Seq[Expression] = Seq(lonExpr, latExpr)
  override def nullable: Boolean = lonExpr.nullable || latExpr.nullable
  override def dataType: DataType = DoubleType
  override def prettyName: String = "geodesic_distance"

  override def eval(input: InternalRow): Any = {
    val lon = lonExpr.eval(input)
    val lat = latExpr.eval(input)
    if (lon == null || lat == null) null
    else Geodesic.inverse(lon.asInstanceOf[Double], lat.asInstanceOf[Double],
      lon0, lat0)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lonGen = lonExpr.genCode(ctx)
    val latGen = latExpr.genCode(ctx)
    ev.copy(code =
      code"""
        ${lonGen.code}
        ${latGen.code}
        boolean ${ev.isNull} = ${lonGen.isNull} || ${latGen.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.Geodesic.inverse(
            ${lonGen.value}, ${latGen.value}, ${lon0}D, ${lat0}D);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lonExpr = newChildren(0), latExpr = newChildren(1))
}

object GeodesicDistanceToPoint {
  /** Column API: distance (m) from each (lon, lat) row to the point. */
  def column(lon: Column, lat: Column, lon0: Double, lat0: Double): Column =
    ColumnBridge.column(GeodesicDistanceToPoint(
      ColumnBridge.expression(lon), ColumnBridge.expression(lat),
      lon0, lat0))
}
