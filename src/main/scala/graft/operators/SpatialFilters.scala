package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeodesicDistanceToPoint
import graft.partitioning.Extent

/** Row-level spatial refinement filters (reference satbucket/filters.py).
  * These run *inside* partitions after directory-level pruning; Catalyst
  * additionally pushes the box predicates to parquet row-group skipping.
  */
object SpatialFilters {

  /** Closed bounding-box predicate (filter_by_extent, filters.py:66-77). */
  def extentPredicate(x: Column, y: Column, e: Extent): Column =
    x.between(e.xmin, e.xmax) && y.between(e.ymin, e.ymax)

  def filterByExtent(df: DataFrame, e: Extent,
                     x: String = "lon", y: String = "lat"): DataFrame =
    df.where(extentPredicate(col(x), col(y), e))

  /** Geodesic point-radius filter: appends a `distance` column (meters,
    * WGS84 ellipsoidal) and keeps rows with distance <= d
    * (filter_around_point, filters.py:43-63). Uses the native codegen
    * expression, not a UDF. */
  def filterAroundPoint(spark: SparkSession, df: DataFrame,
                        lon: Double, lat: Double, distance: Double,
                        x: String = "lon", y: String = "lat"): DataFrame =
    df.withColumn("distance",
        GeodesicDistanceToPoint.column(col(x).cast("double"), col(y).cast("double"), lon, lat))
      .where(col("distance") <= distance)

  /** Exact polygon filter — beyond the reference's box/country extents:
    * PNPOLY even-odd containment as a native codegen expression
    * ([[graft.functions.PointInPolygon]]), prefixed by the polygon's
    * bounding box so Catalyst can push the cheap range predicate to
    * partition pruning and parquet row-group skipping; the exact per-edge
    * test only runs on candidate rows that survive it. */
  def polygonPredicate(x: Column, y: Column,
                       vertices: Seq[(Double, Double)]): Column = {
    val e = Extent(vertices.map(_._1).min, vertices.map(_._1).max,
      vertices.map(_._2).min, vertices.map(_._2).max)
    extentPredicate(x, y, e) &&
      graft.functions.PointInPolygon.column(x, y, vertices)
  }

  def filterByPolygon(df: DataFrame, vertices: Seq[(Double, Double)],
                      x: String = "lon", y: String = "lat"): DataFrame =
    df.where(polygonPredicate(col(x), col(y), vertices))
}
