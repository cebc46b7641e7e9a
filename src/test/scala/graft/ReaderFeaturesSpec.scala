package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.partitioning.{Extent, LonLatPartitioning, XYPartitioning}
import graft.sources.{BucketReader, BucketWriter}

class ReaderFeaturesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmp(n: String) = {
    val p = Files.createTempDirectory(s"graft_rf_$n"); p.toFile.deleteOnExit(); p.toString
  }

  test("directory-flavor bucket: bare label dirs, labels from paths, pruned reads") {
    val dir = tmp("dirflavor")
    val p = LonLatPartitioning(size = (10, 10), flavor = Some("directory"))
    val df = OrbitFixture.standard(spark)
    BucketWriter.writeBucket(df, dir, p, mode = "overwrite")

    // layout: bare labels, no `lon_bin=` prefix (test_routines.py:105-150)
    val top = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(top.nonEmpty && top.forall(!_.contains("=")), top.toSeq)

    val back = BucketReader.read(spark, dir)
    assert(back.count() == 150)
    assert(back.columns.contains("lon_bin") && back.columns.contains("lat_bin"))
    // labels identical to the hive flavor's values
    val labels = back.select("lon_bin").distinct().as[String].collect().toSet
    assert(labels.forall(_.matches("-?\\d+\\.\\d+")))

    // pruned read returns exactly the in-extent rows
    val ext = Extent(-1, 3, -1, 5)
    val sub = BucketReader.read(spark, dir, BucketReader.ByExtent(ext))
    val expected = df.where($"lon".between(ext.xmin, ext.xmax) &&
      $"lat".between(ext.ymin, ext.ymax)).count()
    assert(sub.count() == expected && expected > 0)
  }

  test("filepathsByPartition groups data files by partition path (io.py:110-126)") {
    val dir = tmp("bypart")
    BucketWriter.writeBucket(OrbitFixture.standard(spark), dir,
      LonLatPartitioning(size = (10, 10)), mode = "overwrite")
    val byPart = BucketReader.filepathsByPartition(dir, fileExtension = ".parquet")
    assert(byPart.nonEmpty)
    // keys are the 2-level relative partition paths
    assert(byPart.keys.forall(_.matches("lon_bin=[^/]+/lat_bin=[^/]+")), byPart.keys)
    // every file accounted for, each under its own key's directory
    val all = BucketReader.listFiles(dir, fileExtension = ".parquet")
    assert(byPart.values.flatten.toSet == all.toSet)
    byPart.foreach { case (k, files) =>
      assert(files.nonEmpty && files.forall(_.contains(s"/$k/")))
    }
  }

  test("filename filters: extension, glob, regex (P11)") {
    val dir = tmp("namefilters")
    val p = LonLatPartitioning(size = (10, 10))
    val reader = new BucketWriter.GranuleReader {
      def read(s: org.apache.spark.sql.SparkSession, path: String) =
        Some(OrbitFixture.granule(s, path.stripSuffix(".HDF5").takeRight(1).toInt))
    }
    BucketWriter.writeGranulesBucket(spark,
      Seq("GRAN.V07A.1.HDF5", "GRAN.V07B.2.HDF5"), dir, p, reader, parallelism = 1)

    assert(BucketReader.read(spark, dir).count() == 100)
    val onlyB = BucketReader.read(spark, dir, globPattern = "*V07B*")
    assert(onlyB.count() == 50)
    val regexed = BucketReader.read(spark, dir, regexPattern = "GRAN\\.V07A.*")
    assert(regexed.count() == 50)
    val ext = BucketReader.read(spark, dir, fileExtension = ".parquet")
    assert(ext.count() == 100)
    intercept[IllegalArgumentException] {
      BucketReader.read(spark, dir, globPattern = "*NOPE*").count()
    }
  }

  test("country/continent queries resolve to extents and refine rows") {
    val dir = tmp("country")
    val p = LonLatPartitioning(size = (10, 10))
    // band crosses the Kenya box (34..42E, -5..5N)
    val df = OrbitFixture.granule(spark, 0, startLonLat = (30.0, -10.0),
      endLonLat = (45.0, 10.0))
    BucketWriter.writeBucket(df, dir, p, mode = "overwrite")
    val kenya = BucketReader.read(spark, dir, BucketReader.ByCountry("Kenya"))
    assert(kenya.count() > 0)
    val africa = BucketReader.read(spark, dir, BucketReader.ByContinent("Africa"))
    assert(africa.count() >= kenya.count())
    intercept[IllegalArgumentException] {
      BucketReader.read(spark, dir, BucketReader.ByCountry("Atlantis")).count()
    }
  }

  test("quadmesh corners / vertices / datasetGrid (B16/B18)") {
    val p = XYPartitioning(size = (1, 2), extent = Extent(0, 2, 0, 4))
    val (xc, yc) = p.quadmeshCorners()
    assert(xc.length == p.nY + 1 && xc.head.length == p.nX + 1)
    assert(yc.head.head == 0.0 && yc.last.head == 4.0)
    val (_, ycTop) = p.quadmeshCorners("top")
    assert(ycTop.head.head == 4.0)
    val v = p.vertices()
    assert(v.length == p.nPartitions && v.head.length == 4)
    assert(v.head.head.toSeq == Seq(0.0, 0.0))
    val grid = p.datasetGrid(spark)
    assert(grid.count() == p.nPartitions)
    assert(grid.columns.toSet == Set("x_c", "y_c", "data"))
  }
}
