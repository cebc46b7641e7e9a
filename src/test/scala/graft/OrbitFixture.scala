package graft

import java.sql.Timestamp
import java.time.LocalDateTime
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scala port of the reference's synthetic orbit fixture
  * (satbucket/tests/utils/fake_datasets.py:74-127): a swath band from
  * (startLon, startLat) to (endLon, endLat), nCross × nAlong footprints per
  * granule. Spherical interpolation (the reference uses pyproj
  * ellps="sphere") — our tests assert engine behavior on the rows, not the
  * reference's exact coordinates.
  */
object OrbitFixture {

  final case class Obs(lon: Double, lat: Double, time: Timestamp,
                       dummy_var: Double, gpm_granule_id: Int,
                       gpm_cross_track_id: Int, gpm_along_track_id: Int,
                       gpm_id: String)

  def granule(spark: SparkSession, granuleId: Int,
              startLonLat: (Double, Double) = (0.0, 0.0),
              endLonLat: (Double, Double) = (10.0, 20.0),
              widthM: Double = 1e6,
              nAlong: Int = 10, nCross: Int = 5,
              startTime: LocalDateTime = LocalDateTime.of(2000, 1, 1, 0, 0)): DataFrame = {
    import spark.implicits._
    val (lon0, lat0) = startLonLat
    val (lon1, lat1) = endLonLat
    // crude but deterministic: linear interpolation along track; cross-track
    // offsets perpendicular in degrees (~111 km per degree)
    val trackDegX = lon1 - lon0
    val trackDegY = lat1 - lat0
    val norm = math.sqrt(trackDegX * trackDegX + trackDegY * trackDegY)
    val (perpX, perpY) = (-trackDegY / norm, trackDegX / norm)
    val halfWidthDeg = widthM / 2 / 111000.0
    val rng = new scala.util.Random(granuleId) // deterministic per granule
    val rows = for {
      a <- 0 until nAlong
      c <- 0 until nCross
    } yield {
      val f = a.toDouble / (nAlong - 1)
      val off = (c.toDouble / (nCross - 1) * 2 - 1) * halfWidthDeg
      Obs(
        lon = lon0 + f * trackDegX + off * perpX,
        lat = lat0 + f * trackDegY + off * perpY,
        time = Timestamp.valueOf(startTime.plusSeconds(a)),
        dummy_var = rng.nextDouble(),
        gpm_granule_id = granuleId,
        gpm_cross_track_id = c,
        gpm_along_track_id = a,
        gpm_id = s"$granuleId-$a")
    }
    rows.toDF()
  }

  /** The standard 3-granule, 150-row instance used across reference tests. */
  def standard(spark: SparkSession): DataFrame = {
    val g0 = granule(spark, 0, startTime = LocalDateTime.of(2021, 7, 5, 1, 39))
    val g1 = granule(spark, 1, startTime = LocalDateTime.of(2021, 8, 5, 1, 39))
    val g2 = granule(spark, 2, startTime = LocalDateTime.of(2023, 7, 5, 1, 39))
    g0.unionByName(g1).unionByName(g2)
  }
}
