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

  test("merge output honors the reference '{time_prefix}_{i}.parquet' naming " +
       "contract end-to-end (directory flavor, adversarial month prefixes)") {
    // reference consumers identify a period's files by
    // basename.startswith(time_prefix) (satbucket/routines.py:791-810);
    // months "2024_1" and "2024_11" are the adversarial pair where a raw
    // startswith is ambiguous — the contract that makes our output safe
    // is the template `{prefix}_{i}.parquet` WITH the underscore
    // separator, which both engines emit and which restores unambiguous
    // grouping via startswith(prefix + "_")
    import graft.partitioning.LonLatPartitioning
    import graft.sources.{BucketReader, BucketWriter, Merge, Temporal}
    val src = java.nio.file.Files.createTempDirectory("graft_interop_src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_interop_dst").toString + "/b"
    val p = LonLatPartitioning(size = (90, 90), flavor = Some("directory"))
    def monthDf(m: Int, n: Int, off: Long) = spark.range(n).select(
      (col("id") * 7 % 360 - 180 + 0.5).cast("double").as("lon"),
      (col("id") * 11 % 180 - 90 + 0.5).cast("double").as("lat"),
      expr(s"timestamp_micros(${java.time.LocalDateTime.of(2024, m, 1, 0, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC)}000000 + id * 3600000000)")
        .as("time"),
      (col("id") + off).as("v"))
    val df = monthDf(1, 300, 0L).union(monthDf(11, 300, 100000L))
    BucketWriter.writeBucket(df, src, p, mode = "overwrite")
    Merge.mergeGranuleBuckets(spark, src, dst, temporalPartitioning = "month")

    def dataFiles(): Seq[java.nio.file.Path] = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(dst))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(w.iterator()).asScala
        .filter(_.toString.endsWith(".parquet")).toList
      finally w.close()
    }
    // 1. every basename matches the reference template exactly
    val names = dataFiles().map(_.getFileName.toString)
    val template = "^(2024_1|2024_11)_(\\d+)\\.parquet$".r
    assert(names.nonEmpty && names.forall(template.matches(_)),
      s"non-conforming basenames: ${names.filterNot(template.matches(_))}")
    // 2. reference-style prefix grouping (startswith(prefix + "_"))
    //    recovers each month's files totally and disjointly, and each
    //    group's ROWS are exactly that month's rows
    val prefixes = Seq(java.time.LocalDateTime.of(2024, 1, 1, 0, 0),
        java.time.LocalDateTime.of(2024, 11, 1, 0, 0))
      .map(Temporal.timePrefix(_, "month"))
    assert(prefixes == Seq("2024_1", "2024_11"))
    val groups = prefixes.map(pre => pre -> names.filter(_.startsWith(pre + "_")))
    assert(groups.map(_._2.size).sum == names.size, "grouping not total")
    // disjoint: no basename matches both underscore-terminated prefixes
    // (the raw reference startswith WOULD overlap on 2024_1 vs 2024_11;
    // the '_' separator restores unambiguity)
    assert(names.count(n => prefixes.forall(p0 => n.startsWith(p0 + "_"))) == 0,
      "grouping overlaps")
    groups.foreach { case (pre, fs) =>
      val rows = spark.read.parquet(
        dataFiles().filter(f => fs.contains(f.getFileName.toString))
          .map(_.toString): _*)
      val wantMonth = if (pre == "2024_1") 1 else 11
      assert(rows.where(month(col("time")) =!= wantMonth).count() == 0,
        s"$pre group holds out-of-period rows")
    }
    // 3. the merged bucket re-reads through BucketReader with full parity
    val back = BucketReader.read(spark, dst)
    assert(back.count() == 600)
    assert(back.agg(sum($"v")).as[Long].head() ==
      df.agg(sum($"v")).as[Long].head())
    // 4. update-merge of January must leave November untouched — the
    //    underscore-separated prefix match may not bleed onto 2024_11
    val novBefore = dataFiles().filter(_.getFileName.toString.startsWith("2024_11_"))
      .map(f => f.toString -> java.nio.file.Files.size(f)).sortBy(_._1)
    val src2 = java.nio.file.Files.createTempDirectory("graft_interop_upd").toString
    BucketWriter.writeBucket(
      monthDf(1, 300, 500000L), src2, p, mode = "overwrite")
    Merge.mergeGranuleBuckets(spark, src2, dst,
      temporalPartitioning = "month", update = true)
    val novAfter = dataFiles().filter(_.getFileName.toString.startsWith("2024_11_"))
      .map(f => f.toString -> java.nio.file.Files.size(f)).sortBy(_._1)
    assert(novAfter == novBefore, "update of 2024_1 disturbed 2024_11 files")
    val upd = BucketReader.read(spark, dst)
    assert(upd.count() == 600)
    assert(upd.where(month(col("time")) === 1)
      .agg(min($"v")).as[Long].head() == 500000L, "January not replaced")
    graft.sources.BucketFs.deleteRecursive(src)
    graft.sources.BucketFs.deleteRecursive(src2)
    graft.sources.BucketFs.deleteRecursive(dst)
  }

  test("reference-written GRANULE bucket: merge + update mode reproduce " +
       "the reference's own expected layout (test_routines.py:327-388)") {
    // fixture generated by scripts/gen_reference_granule_bucket.py with
    // pandas/pyarrow: hive granule layout exactly as write_granules_bucket
    // emits it — per-granule `<stem>_0.parquet` files, bucket_info.yaml,
    // NANOSECOND timestamps — for the three granule ids the reference
    // merge tests use (two 2021, one 2023)
    import graft.sources.{BucketFs, Merge}
    val fixUrl = getClass.getResource("/reference_granule_src/bucket_info.yaml")
    assert(fixUrl != null, "granule fixture missing")
    val fixture = Paths.get(fixUrl.toURI).getParent.toString
    val src = java.nio.file.Files.createTempDirectory("graft_refgran_src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_refgran_dst").toString + "/dst"
    def copyFixture(keep: String => Boolean): Unit = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(fixture))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(w.iterator()).asScala
        .filter(f => java.nio.file.Files.isRegularFile(f))
        .filter(f => f.getFileName.toString == "bucket_info.yaml" ||
          keep(f.getFileName.toString))
        .foreach { f =>
          val rel = java.nio.file.Paths.get(fixture).relativize(f)
          val to = java.nio.file.Paths.get(src).resolve(rel)
          java.nio.file.Files.createDirectories(to.getParent)
          java.nio.file.Files.copy(f, to,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      finally w.close()
    }
    try {
      // phase 1 (test_routines.py:327-368): only the 2021 granules exist;
      // merge with year partitioning must leave exactly `2021_0.parquet`
      // in the partition the reference asserts on
      copyFixture(_.contains(".2021"))
      Merge.mergeGranuleBuckets(spark, src, dst, temporalPartitioning = "year")
      val pdir = new java.io.File(s"$dst/lon_bin=-5.0/lat_bin=5.0")
      assert(pdir.isDirectory, s"expected partition missing: $pdir")
      // LocalFileSystem leaves .crc sidecars the real stores don't have;
      // the layout contract is over visible files only
      def visible() = pdir.list().filterNot(_.startsWith(".")).sorted.toSeq
      assert(visible() == Seq("2021_0.parquet"), s"got ${visible()}")
      val bytes2021 = java.nio.file.Files.readAllBytes(
        pdir.toPath.resolve("2021_0.parquet")).toSeq

      // phase 2 (:370-388): the 2023 granule arrives in src; update-merge
      // windowed to 2023 adds `2023_0.parquet` beside the 2021 file
      copyFixture(_.contains(".2023"))
      Merge.mergeGranuleBuckets(spark, src, dst,
        temporalPartitioning = "year", update = true,
        startTime = Some(java.time.LocalDateTime.of(2023, 1, 1, 0, 0)),
        endTime = Some(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)))
      assert(visible() == Seq("2021_0.parquet", "2023_0.parquet"),
        s"got ${visible()}")
      // the 2021 file is untouched byte-for-byte (update replaces only
      // the affected periods' files)
      assert(java.nio.file.Files.readAllBytes(
        pdir.toPath.resolve("2021_0.parquet")).toSeq == bytes2021,
        "update disturbed the 2021 file")

      // row parity: the merged archive holds every fixture row exactly
      // once — 2 granules x 50 rows in 2021, 1 x 50 in 2023 — and the
      // nanos time column came through as a real timestamp
      val back = BucketReader.read(spark, dst)
      assert(back.count() == 150, s"got ${back.count()}")
      assert(back.schema("time").dataType ==
        org.apache.spark.sql.types.TimestampType)
      assert(back.where(year($"time") === 2023).count() == 50)
      assert(back.where(year($"time") === 2021).count() == 100)
    } finally {
      BucketFs.deleteRecursive(src)
      BucketFs.deleteRecursive(dst)
    }
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
