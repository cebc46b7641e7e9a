package graft

import java.nio.file.Paths
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.partitioning.Extent
import graft.sources.{BucketInfo, BucketReader}

/** On-disk interop with REFERENCE-written buckets: the fixture under
  * src/test/resources/reference_bucket was written by pyarrow/pandas with
  * the reference's exact semantics (pd.cut labels, hive dirs,
  * bucket_info.yaml manifest; see scripts/ generator in the commit). Our
  * reader must consume it unchanged — manifest, pruning, refinement.
  */
class ReferenceBucketInteropSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val bucketDir = {
    val url = getClass.getResource("/reference_bucket/bucket_info.yaml")
    assert(url != null, "fixture missing")
    Paths.get(url.toURI).getParent.toString
  }

  test("yaml manifest reconstructs the partitioning") {
    val p = BucketInfo.readPartitioning(bucketDir)
    assert(p.levels == Seq("lon_bin", "lat_bin"))
    assert(p.flavor.contains("hive"))
    assert(p.extent == Extent(-180, 180, -90, 90))
    assert(p.nX == 36 && p.nY == 18)
  }

  test("CRS survives the manifest round trip and rides grid-product schemas") {
    import graft.partitioning.LonLatPartitioning
    import graft.sources.BucketWriter
    val dir = java.nio.file.Files.createTempDirectory("graft_crs").toString
    val p = LonLatPartitioning(size = (90, 90))
    BucketWriter.writeBucket(OrbitFixture.standard(spark), dir, p,
      mode = "overwrite")
    // manifest carries the CRS; the factory still rebuilds (unknown keys
    // are ignored) so old manifests stay readable
    assert(BucketInfo.read(dir)("crs") == "EPSG:4326")
    val rebuilt = BucketInfo.readPartitioning(dir)
    assert(rebuilt.crs == "EPSG:4326")
    // grid products tag their coordinate columns; the tag survives a
    // select + filter chain (anything resolving columns by name)
    val cube = graft.operators.Analysis.toGridCube(spark,
      p.addCentroids(OrbitFixture.standard(spark), "lon", "lat")
        .groupBy(col(p.xCoord), col(p.yCoord)).agg(count(lit(1)).as("n")), p)
      .select(p.xCoord, p.yCoord, "n").where(col("n").isNotNull)
    assert(cube.schema(p.xCoord).metadata.getString("crs") == "EPSG:4326")
    assert(cube.schema(p.yCoord).metadata.getString("crs") == "EPSG:4326")
    val grid = p.datasetGrid(spark)
    assert(grid.schema(p.xCoord).metadata.getString("crs") == "EPSG:4326")
  }

  test("full read + extent pruning + point radius on a reference bucket") {
    val all = BucketReader.read(spark, bucketDir)
    assert(all.count() == 400)
    assert(all.columns.contains("dummy_var"))

    // every row's engine-computed label equals the on-disk directory label
    val p = BucketInfo.readPartitioning(bucketDir)
    val relabeled = all.withColumnRenamed("lon_bin", "disk_lon")
      .withColumnRenamed("lat_bin", "disk_lat")
    val mismatches = p.addLabels(relabeled, "lon", "lat")
      .where($"lon_bin" =!= $"disk_lon" || $"lat_bin" =!= $"disk_lat")
      .count()
    assert(mismatches == 0, "engine labels diverge from reference dirs")

    // extent query: only in-box rows, matches a raw filter
    val e = Extent(0, 20, 0, 20)
    val sub = BucketReader.read(spark, bucketDir, BucketReader.ByExtent(e))
    val expected = all.where($"lon".between(e.xmin, e.xmax) &&
      $"lat".between(e.ymin, e.ymax)).count()
    assert(sub.count() == expected && expected > 0)

    // geodesic radius adds distance and respects the cap
    val pr = BucketReader.read(spark, bucketDir,
      BucketReader.AroundPoint(10.0, 10.0, distance = 1000e3))
    assert(pr.count() > 0)
    assert(pr.agg(max($"distance")).as[Double].head() <= 1000e3)
  }
}
