package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.LocalDateTime
import scala.collection.parallel.CollectionConverters._
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucket compaction (reference merge_granule_buckets,
  * satbucket/routines.py:529-852): consolidate the many small per-granule
  * files of each spatial partition into few large files grouped by temporal
  * period and named `{period_prefix}_{i}.parquet`, with incremental
  * `update=true` replacing exactly the files of affected periods.
  *
  * Spark-native design (SURVEY §7 decision 4): ONE distributed job writes
  * the whole archive — `read(src) → filter(time) → write dst partitioned by
  * (spatial levels, __period)` — then a driver-side metadata pass renames
  * `__period=P/part-*.parquet` up into the spatial directory as
  * `P_{i}.parquet`. No per-partition driver loop (the reference iterates
  * spatial partitions sequentially, :751); at 100 TB this is the difference
  * between one shuffle-free scan and 10⁴ sequential jobs.
  */
object Merge {

  private val PeriodCol = "__period"

  def mergeGranuleBuckets(spark: SparkSession,
                          srcBucketDir: String, dstBucketDir: String,
                          temporalPartitioning: String = "month",
                          startTime: Option[LocalDateTime] = None,
                          endTime: Option[LocalDateTime] = None,
                          update: Boolean = false,
                          rowGroupSize: String = "200MB",
                          maxFileSize: String = "2GB",
                          compression: String = "snappy",
                          timeColumn: String = "time",
                          writeMetadata: Boolean = false): Unit = {
    Temporal.check(temporalPartitioning)
    val p = BucketInfo.readPartitioning(srcBucketDir)
    if (update) {
      require(Files.exists(Paths.get(dstBucketDir, BucketInfo.FileName)),
        "update=true requires an existing destination bucket")
      val dstTp = BucketInfo.readTemporalPartitioning(dstBucketDir)
      require(dstTp.contains(temporalPartitioning),
        s"destination bucket uses temporal partitioning $dstTp, not $temporalPartitioning")
    }

    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    var df = spark.read.parquet(srcBucketDir)
    startTime.foreach(s => df = df.where(col(timeColumn) >= lit(java.sql.Timestamp.valueOf(s))))
    endTime.foreach(e => df = df.where(col(timeColumn) < lit(java.sql.Timestamp.valueOf(e))))

    val withPeriod = df.withColumn(PeriodCol,
      Temporal.timePrefixCol(col(timeColumn), temporalPartitioning))

    val maxRecords = BucketWriter.estimateRowsForSize(df, BucketWriter.parseSize(maxFileSize))
    val staging = s"$dstBucketDir/_staging"
    // co-locate each (spatial partition, period) in one task → exactly the
    // few large files per directory the compaction exists to produce;
    // oversubscribed tasks parallelize the per-file writer-init cost
    val repartitioned = withPeriod.repartition(BucketWriter.writeTasks(df),
      (p.order :+ PeriodCol).map(col): _*)
    repartitioned.write
      .mode("overwrite")
      .partitionBy((p.order :+ PeriodCol): _*)
      .option("compression", compression)
      .option("maxRecordsPerFile", maxRecords)
      .option("parquet.block.size", BucketWriter.parseSize(rowGroupSize))
      .parquet(staging)

    // metadata pass: lift __period=P/part-i.parquet → <spatial dir>/P_i.parquet
    // (parallel: at 10^4 dirs a sequential rename loop dominates merge time)
    val stagingPath = Paths.get(staging)
    val periodDirsSeq = walk(stagingPath).filter(d =>
      Files.isDirectory(d) && d.getFileName.toString.startsWith(s"$PeriodCol="))
    val touchedPrefixes = periodDirsSeq.map(_.getFileName.toString.stripPrefix(s"$PeriodCol=")).toSet

    val periodDirs = periodDirsSeq.par
    periodDirs.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(
      new java.util.concurrent.ForkJoinPool(16))
    periodDirs.foreach { dir =>
      val prefix = dir.getFileName.toString.stripPrefix(s"$PeriodCol=")
      val rel = stagingPath.relativize(dir.getParent) // spatial partition path
      val dstDir = Paths.get(dstBucketDir).resolve(rel)
      Files.createDirectories(dstDir)
      if (update) {
        // replace exactly the files of this period (reference :791-810)
        val ls = Files.list(dstDir)
        try ls.iterator().asScala
          .filter(_.getFileName.toString.startsWith(s"${prefix}_"))
          .toSeq.foreach(Files.delete)
        finally ls.close() // unclosed streams leak fds across 10^4 dirs
      }
      val ls2 = Files.list(dir)
      val parts = try ls2.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
        finally ls2.close()
      parts.zipWithIndex.foreach { case (f, i) =>
        Files.move(f, dstDir.resolve(s"${prefix}_$i.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
    deleteRecursively(stagingPath)
    if (!update || !Files.exists(Paths.get(dstBucketDir, BucketInfo.FileName))) {
      BucketInfo.write(dstBucketDir, p, Some(temporalPartitioning))
    }
    if (writeMetadata) DatasetMetadata.write(dstBucketDir)
    require(touchedPrefixes.nonEmpty || startTime.nonEmpty || endTime.nonEmpty,
      "merge produced no output files — is the source bucket empty?")
  }

  private def walk(p: Path): Seq[Path] = {
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    // deepest-first, parallel within each depth level (sequential deletes
    // of 10^4+ staging paths are driver-time at scale)
    val byDepth = walk(p).groupBy(_.getNameCount).toSeq.sortBy(-_._1)
    byDepth.foreach { case (_, paths) =>
      val par = paths.par
      par.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(
        new java.util.concurrent.ForkJoinPool(16))
      par.foreach(f => Files.deleteIfExists(f))
    }
  }
}
