package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geodesic

class GeodesicSpec extends AnyFunSuite {

  test("WGS84 inverse distance matches published geodesic values") {
    // 1 degree of latitude along a meridian from the equator (GeographicLib)
    assert(math.abs(Geodesic.inverse(0, 0, 0, 1) - 110574.389) < 0.01)
    // 1 degree of longitude along the equator
    assert(math.abs(Geodesic.inverse(0, 0, 1, 0) - 111319.491) < 0.01)
    // Vincenty's classic test line: Flinders Peak -> Buninyong (GDA94-ish)
    val d = Geodesic.inverse(144.424868, -37.951033, 143.926495, -37.652821)
    assert(math.abs(d - 54972.271) < 0.05)
    // symmetric + zero
    assert(Geodesic.inverse(10, 45, 10, 45) == 0.0)
    assert(math.abs(Geodesic.inverse(5, 5, 6, 6) -
      Geodesic.inverse(6, 6, 5, 5)) < 1e-6)
  }

  test("q24 oracle contract: disc around the query point converges within FixedIters") {
    // The q24 DuckDB oracle unrolls EXACTLY Geodesic.FixedIters lambda
    // steps, while inverse() keeps iterating while the delta is in
    // (1e-12, 1e-6]. Hash parity therefore requires every pair that can
    // appear in the result (distance <= radius) to converge to <1e-12
    // within FixedIters. Assert it over a dense grid covering 2x the query
    // radius around the q24 point so a future radius/point change that
    // breaks the assumption fails HERE, not as a silent oracle mismatch.
    val (lon0, lat0) = (12.5, 41.9)       // Spatial.geodesicRadiusOracle point
    val radius = 1500000.0                // q24 radius (m)
    var checked = 0
    var lat = lat0 - 30.0
    while (lat <= lat0 + 30.0) {
      var lon = lon0 - 40.0
      while (lon <= lon0 + 40.0) {
        if (Geodesic.inverse(lon0, lat0, lon, lat) <= 2 * radius) {
          checked += 1
          val it = Geodesic.itersToConverge(lon0, lat0, lon, lat)
          assert(it <= Geodesic.FixedIters,
            s"($lon, $lat) needs $it iters > FixedIters=${Geodesic.FixedIters}")
        }
        lon += 0.25
      }
      lat += 0.25
    }
    assert(checked > 10000) // the sweep actually covered the disc
  }

  test("near-antipodal falls back without exploding") {
    val d = Geodesic.inverse(0, 0, 179.9, 0.1)
    assert(d > 19000e3 && d < 20100e3)
  }

  test("native expression: codegen'd, SQL-registered, matches direct eval") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((0.0, 0.0), (1.0, 1.0)).toDF("lon", "lat")
    val got = df.select(graft.functions.GeodesicDistanceToPoint
        .column($"lon", $"lat", 0.0, 1.0).as("d"))
      .as[Double].collect().toSeq
    assert(math.abs(got.head - Geodesic.inverse(0, 0, 0, 1)) < 1e-9)
    assert(got(1) == Geodesic.inverse(1, 1, 0, 1))
    // stays inside WholeStageCodegen (no UDF bailout); a range-backed plan
    // (local Seqs collapse to LocalTableScan and prove nothing)
    val ranged = spark.range(100)
      .select(($"id" % 360 - 180).cast("double").as("lon"),
        ($"id" % 180 - 90).cast("double").as("lat"))
    val planned = ranged.select(graft.functions.GeodesicDistanceToPoint
      .column($"lon", $"lat", 0.0, 1.0).as("d"))
    // "*(1) Project" prefix = the project (with our expression) is inside
    // a WholeStageCodegen stage
    assert(planned.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(planned.agg(max($"d")).as[Double].head() > 0)
    // SQL surface
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT geodesic_distance(0.0D, 0.0D, 0.0D, 1.0D) AS d").as[Double].head()
    assert(math.abs(viaSql - 110574.389) < 0.01)
  }

  test("SparkSessionExtensions injection registers the SQL function") {
    // getOrCreate reuses the active test session (skipping withExtensions),
    // so apply the injections through the same hook session bootstrap uses
    val spark = SparkTestBase.spark
    import spark.implicits._
    val session = spark.newSession()
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    org.apache.spark.sql.graftbridge.ColumnBridge
      .applyFunctionInjections(ext, session)
    val d = session.sql(
      "SELECT geodesic_distance(0.0D, 0.0D, 1.0D, 0.0D) AS d")
      .collect().head.getDouble(0)
    assert(math.abs(d - 111319.491) < 0.01)
    // the sketch aggregate rides the same injection path
    val sketch = session.sql(
      "SELECT kmv_sketch(CAST(id AS BIGINT), 4) AS s FROM range(100)")
      .collect().head.getSeq[Long](0)
    assert(sketch == Seq(0L, 1L, 2L, 3L))
  }

  test("point-in-polygon: concave containment, codegen matches JVM walk") {
    import graft.functions.Polygon
    // L-shape: unit-grid polygon where the bbox alone over-selects
    val xs = Array(0.0, 4.0, 4.0, 2.0, 2.0, 0.0)
    val ys = Array(0.0, 0.0, 2.0, 2.0, 4.0, 4.0)
    assert(Polygon.contains(xs, ys, 1.0, 1.0))   // lower arm
    assert(Polygon.contains(xs, ys, 3.0, 1.0))   // lower arm, right
    assert(Polygon.contains(xs, ys, 1.0, 3.0))   // upper arm
    assert(!Polygon.contains(xs, ys, 3.0, 3.0))  // inside bbox, OUTSIDE L
    assert(!Polygon.contains(xs, ys, 5.0, 1.0))  // outside bbox

    val spark = SparkTestBase.spark
    import spark.implicits._
    val verts = xs.zip(ys).toSeq
    val pts = (for (i <- 0 to 40; j <- 0 to 40)
      yield (i.toLong * 41 + j, i * 0.1, j * 0.1)).toDF("id", "x", "y")
    val got = graft.operators.SpatialFilters
      .filterByPolygon(pts, verts, x = "x", y = "y")
      .select($"id").as[Long].collect().toSet
    val expect = (for (i <- 0 to 40; j <- 0 to 40
        if Polygon.contains(xs, ys, i * 0.1, j * 0.1))
      yield i.toLong * 41 + j).toSet
    assert(got == expect)
  }
}
