package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.partitioning.{Extent, GeoExtent, LonLatPartitioning, Partitioning2D}
import graft.geo.NamedExtents
import graft.operators.SpatialFilters

/** The read query path (reference read_bucket / satbucket.read,
  * satbucket/readers.py:162-303).
  *
  * One Catalyst plan does everything the reference stages by hand:
  * manifest → label-predicate partition pruning (directory-level, via
  * `PartitioningAwareFileIndex`) → vectorized parquet scan with projection
  * + predicate pushdown → spatial refinement → optional limit.
  */
object BucketReader {

  sealed trait SpatialQuery
  case object Everything extends SpatialQuery
  final case class ByExtent(extent: Extent, padding: Double = 0.0) extends SpatialQuery
  final case class ByCountry(name: String, padding: Double = 0.0) extends SpatialQuery
  final case class ByContinent(name: String, padding: Double = 0.0) extends SpatialQuery
  /** Geodesic radius (meters) or a sizeDeg-wide box around a point; appends
    * a `distance` column like the reference (readers.py:147-148). */
  final case class AroundPoint(lon: Double, lat: Double,
                               distance: Double = Double.NaN,
                               sizeDeg: Double = Double.NaN) extends SpatialQuery

  def read(spark: SparkSession, bucketDir: String,
           query: SpatialQuery = Everything,
           columns: Seq[String] = Nil,
           filters: Seq[Column] = Nil,
           nRows: Long = -1L,
           x: String = "lon", y: String = "lat"): DataFrame = {
    val p = BucketInfo.readPartitioning(bucketDir)

    // Partition-label strings must come back as strings: disable Spark's
    // hive partition value type inference for this read (SURVEY §1.2).
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")

    var df = spark.read.parquet(bucketDir)

    // 1. directory-level pruning from the spatial argument
    val resolvedExtent: Option[Extent] = query match {
      case Everything => None
      case ByExtent(e, pad) => Some(pad2(e, pad))
      case ByCountry(n, pad) => Some(NamedExtents.country(n, pad))
      case ByContinent(n, pad) => Some(NamedExtents.continent(n, pad))
      case AroundPoint(lon, lat, d, s) => Some(GeoExtent.aroundPoint(lon, lat, d, s))
    }
    resolvedExtent.foreach { e => df = df.where(p.prunePredicate(e)) }

    // 2. row-level spatial refinement
    query match {
      case ByExtent(e, pad) =>
        df = SpatialFilters.filterByExtent(df, pad2(e, pad), x, y)
      case ByCountry(n, pad) =>
        df = SpatialFilters.filterByExtent(df, NamedExtents.country(n, pad), x, y)
      case ByContinent(n, pad) =>
        df = SpatialFilters.filterByExtent(df, NamedExtents.continent(n, pad), x, y)
      case AroundPoint(lon, lat, d, _) if !d.isNaN =>
        df = SpatialFilters.filterAroundPoint(spark, df, lon, lat, d, x, y)
      case AroundPoint(lon, lat, _, s) if !s.isNaN =>
        df = SpatialFilters.filterByExtent(df, GeoExtent.aroundPoint(lon, lat, sizeDeg = s), x, y)
      case _ => ()
    }

    // 3. user predicates (P3) then projection (P1) then limit (P2)
    filters.foreach { f => df = df.where(f) }
    if (columns.nonEmpty) {
      // keep partition labels out unless requested; reference returns only
      // the requested columns
      df = df.select(columns.map(col): _*)
    }
    if (nRows >= 0) df = df.limit(nRows.toInt)
    df
  }

  private def pad2(e: Extent, pad: Double): Extent =
    if (pad == 0.0) e
    else Extent(e.xmin - pad, e.xmax + pad, e.ymin - pad, e.ymax + pad)
}
