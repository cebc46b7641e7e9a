package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke: 10M synthetic observations through the full bucket
  * lifecycle at the reference's production GMI config (4-degree LonLat
  * partitioning ⇒ up to 4050 directories) — 17× the sf0.1 bench rows.
  * Run: sbt "runMain graft.tools.ScaleSmoke [nRows]"
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = graft.core.GraftSession.builder("32", "64", rawLocalFs = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.partitioning._
    import graft.sources._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // deterministic synthetic swath: full-globe coverage, 90-day window
    val obs = spark.range(n).select(
      (rand(42) * 360 - 180).as("lon"),
      (rand(43) * 180 - 90).as("lat"),
      timestamp_micros((lit(1609459200000000L) +
        (col("id") * 777600L))).as("time"), // ~90 days span
      (col("id") % 1000).cast("double").as("value"),
      col("id"))

    val p = LonLatPartitioning(size = (4, 4), labelsDecimals = Some((0, 0)))
    val bucket = "/tmp/scale_bucket"
    val merged = "/tmp/scale_merged"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(bucket))
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(merged))

    time(s"writeBucket ${n / 1000000}M rows, 4050 dirs") {
      BucketWriter.writeBucket(obs, bucket, p, mode = "overwrite")
    }
    val nDirs = new java.io.File(bucket).listFiles().count(_.isDirectory)
    println(s"[scale] lon dirs: $nDirs")

    val cnt = time("extent query (Alps box)") {
      BucketReader.read(spark, bucket,
        BucketReader.ByExtent(Extent(5, 15, 44, 48))).count()
    }
    println(s"[scale] extent rows: $cnt")

    val pr = time("point radius 300km (Rome)") {
      BucketReader.read(spark, bucket,
        BucketReader.AroundPoint(12.5, 41.9, distance = 300e3)).count()
    }
    println(s"[scale] radius rows: $pr")

    time("merge to monthly files") {
      Merge.mergeGranuleBuckets(spark, bucket, merged,
        temporalPartitioning = "month")
    }
    val mergedCnt = time("read merged, country query") {
      BucketReader.read(spark, merged,
        BucketReader.ByCountry("France")).count()
    }
    println(s"[scale] merged france rows: $mergedCnt")

    val sess = time("sessionize by cell (window)") {
      val cells = p.addLabels(
        BucketReader.read(spark, bucket,
          BucketReader.ByExtent(Extent(-20, 20, -20, 20))), "lon", "lat")
      graft.operators.Analysis.listOverpassTimes(
        cells, gapSeconds = 3600, partitionBy = Seq("lon_bin", "lat_bin")).count()
    }
    println(s"[scale] sessions: $sess")

    // z-ordered variant LAST so the second 10M-row write can't evict the
    // primary bucket's page cache under the read/merge timings above —
    // measures the layout pass's cost (one per-task sort)
    val zbucket = "/tmp/scale_bucket_z"
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(zbucket))
    time(s"writeBucket + zorderWithinFiles") {
      BucketWriter.writeBucket(obs, zbucket, p, mode = "overwrite",
        zorderWithinFiles = true)
    }
    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(zbucket))
    spark.stop()
  }
}
