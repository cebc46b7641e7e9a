package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.parallel.CollectionConverters._
import scala.util.{Try, Failure, Success}
import graft.partitioning.Partitioning2D

/** Bucket ETL writers (reference write_bucket / write_granule_bucket /
  * write_granules_bucket, satbucket/routines.py:66-318, and the sink core
  * satbucket/writers.py).
  *
  * Spark-native layout decision: buckets are written hive-flavor via
  * `partitionBy(order)` — Catalyst prunes these directories from label
  * predicates for free. File sizing maps the reference's "500MB"-style
  * row-group targets onto `maxRecordsPerFile` + `parquet.block.size`
  * estimated from sampled bytes/row (writers.py:95-112).
  */
object BucketWriter {

  /** Dynamic-partition write parallelism: 4× cores (see writeBucket). */
  private[sources] def writeTasks(df: DataFrame): Int =
    math.max(df.sparkSession.sparkContext.defaultParallelism * 4,
      df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Repartition for a dynamic-partition write, auto-salting hot cells.
    *
    * Plain `repartition(keys)` lands ALL rows of one spatial cell on one
    * task — and satellite data is exactly this skewed (polar orbits revisit
    * high latitudes every pass), so at scale a hot cell serializes the
    * write. A cheap skew probe first: ONE aggregate over the key columns
    * (column-pruned scan — for a parquet source it reads only the x/y/time
    * columns, a few percent of the write's bytes). Cells whose row count
    * exceeds `maxRecords` (the per-file row target — more rows than that
    * must split into multiple files anyway) get a deterministic salt
    * `pmod(xxhash64(row), ceil(cellRows/maxRecords))` via a broadcast join
    * of the (tiny) hot-cell set, fanning the cell over that many tasks.
    * Cells at or under the target keep salt 0 — exactly one file, the
    * compaction contract — and when no cell is hot the plan degenerates to
    * the plain repartition.
    *
    * Callers whose input is NOT re-scannable side-effect-free (e.g. the
    * distributed granule ingest, whose probe would re-run every granule
    * reader and double-fire its error accumulator) pass
    * `autoSaltSkew = false`. */
  /** Safety factor for the stats-based probe skip: for FILE-source inputs
    * Catalyst's sizeInBytes is the on-disk COMPRESSED byte count
    * (fileCompressionFactor defaults to 1.0), so the estimate can
    * undershoot decoded size by the compression ratio. 8x covers
    * zstd/gzip on typical telemetry; inputs past maxFileBytes/8 take the
    * real probe. */
  private val StatsSkipCompressionAllowance = 8L

  private[sources] def skewAwareRepartition(labeled: DataFrame, keys: Seq[String],
                                            maxRecords: Long,
                                            autoSaltSkew: Boolean,
                                            maxFileBytes: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    val tasks = writeTasks(labeled)
    val keyCols = keys.map(col)
    if (!autoSaltSkew)
      return labeled.repartition(tasks, keyCols: _*)
    // free fast path: when Catalyst's size estimate says the WHOLE input
    // (with a decompression allowance, see above) fits in one output
    // file, no single cell can exceed it — skip the probe without running
    // any job. Unknown sizes surface as huge defaults and fall through to
    // the real probe.
    val estBytes = labeled.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estBytes.isValidLong &&
        estBytes.toLong <= maxFileBytes / StatsSkipCompressionAllowance)
      return labeled.repartition(tasks, keyCols: _*)
    val hot = labeled.groupBy(keyCols: _*).agg(count(lit(1)).as("__cell_n"))
      .where(col("__cell_n") > maxRecords)
      .withColumn("__n_salts",
        least(ceil(col("__cell_n").cast("double") / maxRecords), lit(tasks.toLong))
          .cast("int"))
      .select((keyCols :+ col("__n_salts")): _*)
    // the hot set is structurally bounded by totalRows/maxRecords cells
    // (each needs > maxRecords rows), i.e. by the total FILE count of the
    // write — collect once (avoids recomputing the agg for an isEmpty
    // probe) and broadcast the local set
    val hotRows = hot.collect()
    if (hotRows.isEmpty) return labeled.repartition(tasks, keyCols: _*)
    val hotDf = labeled.sparkSession.createDataFrame(
      java.util.Arrays.asList(hotRows: _*), hot.schema)
    val rowHash = xxhash64(struct(labeled.columns.map(col): _*))
    labeled.join(broadcast(hotDf), keys, "left")
      .withColumn("__salt",
        when(col("__n_salts").isNull, lit(0L))
          .otherwise(pmod(rowHash, col("__n_salts").cast("long"))))
      .repartition(tasks, (keyCols :+ col("__salt")): _*)
      .drop("__n_salts", "__salt")
  }

  /** Per-codec compression-level writer options (reference
    * compression_level, routines.py:544-545,613-616 and writers.py:192-200,
    * where pyarrow receives it). parquet-mr exposes levels per codec:
    * zstd reads `parquet.compression.codec.zstd.level` (default 3), gzip
    * maps onto Hadoop's zlib level conf (which only distinguishes
    * fastest/best/default). Codecs without a level knob reject a level —
    * matching pyarrow, which errors rather than silently ignoring it. */
  private[graft] def compressionLevelOptions(codec: String,
                                             level: Option[Int]): Map[String, String] =
    level match {
      case None => Map.empty
      case Some(l) => codec.toLowerCase match {
        case "zstd" => Map("parquet.compression.codec.zstd.level" -> l.toString)
        case "gzip" =>
          val zl = l match {
            case x if x <= 1 => "BEST_SPEED"
            case x if x >= 9 => "BEST_COMPRESSION"
            case _ => "DEFAULT_COMPRESSION"
          }
          Map("zlib.compress.level" -> zl)
        case other => throw new IllegalArgumentException(
          s"compression codec '$other' does not take a compression level")
      }
    }

  /** "200MB"/"2GB"-style size string → bytes (writers.py:39-92). */
  def parseSize(s: String): Long = {
    val m = "(?i)^\\s*([0-9]+(?:\\.[0-9]+)?)\\s*(B|KB|MB|GB|TB)?\\s*$".r
    s match {
      case m(num, unit) =>
        val mult = Option(unit).map(_.toUpperCase) match {
          case None | Some("B") => 1L
          case Some("KB") => 1L << 10
          case Some("MB") => 1L << 20
          case Some("GB") => 1L << 30
          case Some("TB") => 1L << 40
        }
        (num.toDouble * mult).toLong
      case _ => throw new IllegalArgumentException(s"cannot parse size '$s'")
    }
  }

  /** Estimate rows that fit in `sizeBytes` from a sample's in-memory size
    * (reference estimate_row_group_size, writers.py:95-112): fixed widths
    * for primitives plus measured average lengths for string/binary
    * columns over a bounded sample. */
  def estimateRowsForSize(df: DataFrame, sizeBytes: Long,
                          sampleRows: Int = 10000): Long = {
    import org.apache.spark.sql.functions.{avg, length, lit, coalesce}
    import org.apache.spark.sql.types.{StringType, BinaryType}
    val varCols = df.schema.fields.collect {
      case f if f.dataType == StringType || f.dataType == BinaryType => f.name
    }
    val fixed = df.schema.fields.collect {
      case f if f.dataType != StringType && f.dataType != BinaryType =>
        f.dataType.defaultSize.toDouble
    }.sum
    val varBytes =
      if (varCols.isEmpty) 0.0
      else {
        val sample = df.limit(sampleRows)
        val aggs = varCols.map(c => coalesce(avg(length(org.apache.spark.sql.functions.col(c))), lit(0.0)).as(c))
        val row = sample.agg(aggs.head, aggs.tail: _*).head()
        varCols.indices.map(i => row.getDouble(i)).sum
      }
    val bytesPerRow = math.max(fixed + varBytes, 8.0)
    math.max((sizeBytes / bytesPerRow).toLong, 1L)
  }

  /** Write a single dataframe as a spatially partitioned bucket
    * (reference write_bucket, routines.py:255-318). */
  def writeBucket(df: DataFrame, bucketDir: String, p: Partitioning2D,
                  x: String = "lon", y: String = "lat",
                  rowGroupSize: String = "500MB",
                  maxFileSize: String = "2GB",
                  compression: String = "snappy",
                  compressionLevel: Option[Int] = None,
                  mode: String = "append",
                  removeInvalidRows: Boolean = true,
                  writeMetadata: Boolean = false,
                  autoSaltSkew: Boolean = true,
                  zorderWithinFiles: Boolean = false,
                  layoutCurve: String = "zorder"): Unit = {
    // validate unconditionally: a misspelled curve, or a non-default
    // curve with the layout sort left off, must not silently write an
    // unsorted bucket the caller believes is curve-ordered
    require(layoutCurve == "zorder" || layoutCurve == "hilbert",
      s"unknown layoutCurve '$layoutCurve' (use 'zorder' or 'hilbert')")
    require(layoutCurve == "zorder" || zorderWithinFiles,
      s"layoutCurve = '$layoutCurve' requires zorderWithinFiles = true " +
        "(the in-file layout sort is what applies the curve)")
    val labeled0 = p.addLabels(df, x, y, removeInvalidRows)
    // co-locate each spatial partition in one task: one output file per
    // directory instead of (tasks × dirs) small files — at scale this is
    // the difference between nDirs files and nDirs × nTasks files. Hot
    // cells (> one file's rows) are auto-salted over multiple tasks — see
    // skewAwareRepartition. Oversubscribe the write tasks (4× cores):
    // parquet writer init is the per-file cost and each directory's file
    // opens serially within its task — 2.4× faster on a 253-dir write than
    // cores-many tasks.
    val maxRecords = estimateRowsForSize(df, parseSize(maxFileSize))
    val repartitioned = skewAwareRepartition(labeled0, p.order, maxRecords,
      autoSaltSkew, maxFileBytes = parseSize(maxFileSize))
    // optional Z-order INSIDE each cell's files: sort tasks by (labels, z)
    // — labels lead so the dynamic-partition writer's required ordering is
    // already satisfied (it would otherwise insert its own, NOT stable,
    // sort on the partition columns and scramble z). Rows then land in
    // Morton order, so parquet page/row-group min-max stats stay tight on
    // BOTH coordinates and sub-cell extent reads prune within big files.
    // No extra shuffle: this is a per-task sort after the repartition.
    val labeled =
      if (!zorderWithinFiles) repartitioned
      else {
        import org.apache.spark.sql.functions.col
        import graft.operators.Layout
        val e = p.extent
        val bits = 15 // 2^15 per axis: finer than any realistic cell split
        val xi = Layout.gridIdx(col(x), e.xmin, e.xmax, bits)
        val yi = Layout.gridIdx(col(y), e.ymin, e.ymax, bits)
        // "hilbert" trades a per-row walk for seam-free key ranges —
        // tighter per-file bboxes at the same sort cost (Layout scaladoc)
        val key = layoutCurve match {
          case "zorder" => Layout.zValue(Seq(xi, yi), bits)
          case "hilbert" => Layout.hilbertValue(xi, yi, bits)
          case other => throw new IllegalArgumentException(
            s"unknown layoutCurve '$other' (use 'zorder' or 'hilbert')")
        }
        repartitioned.sortWithinPartitions((p.order.map(col) :+ key): _*)
      }
    labeled.write
      .mode(mode)
      .partitionBy(p.order: _*)
      .option("compression", compression)
      .options(compressionLevelOptions(compression, compressionLevel))
      .option("maxRecordsPerFile", maxRecords)
      .option("parquet.block.size", parseSize(rowGroupSize))
      .parquet(bucketDir)
    // directory flavor (bare `label/` dirs, reference partitioning.py:253-257):
    // Spark only writes hive-style, so strip the `level=` prefixes after the
    // write (metadata-only renames)
    if (p.flavor.contains("directory")) stripHivePrefixes(bucketDir, p.order)
    // after the data: "overwrite" clears the directory first, which would
    // delete a manifest written up front
    BucketInfo.write(bucketDir, p)
    // optional _metadata/_common_metadata sidecars (reference default off:
    // "can take much longer", routines.py:588-599)
    if (writeMetadata) DatasetMetadata.write(bucketDir)
  }

  private def stripHivePrefixes(bucketDir: String, order: Seq[String]): Unit = {
    import org.apache.hadoop.fs.Path
    val (fs, root) = BucketFs.resolve(bucketDir)
    def renameLevel(dir: Path, levels: Seq[String]): Unit =
      levels match {
        case Nil => ()
        case level +: rest =>
          val subs = fs.listStatus(dir)
            .filter(st => st.isDirectory &&
              st.getPath.getName.startsWith(s"$level=")).toSeq
          subs.foreach { st =>
            val bare = st.getPath.getName.stripPrefix(s"$level=")
            val dst = new Path(dir, bare)
            BucketFs.move(fs, st.getPath, dst)
            renameLevel(dst, rest)
          }
      }
    renameLevel(root, order)
  }

  /** User extension point: filepath → rows (reference granule_to_df_func,
    * routines.py:66-125). Return None to skip (e.g. no AOI intersection). */
  trait GranuleReader extends Serializable {
    def read(spark: SparkSession, path: String): Option[DataFrame]
  }

  /** Row-typed converter for the distributed ingest path: runs on
    * EXECUTORS, so it must not touch the SparkSession. */
  trait RowGranuleReader extends Serializable {
    def rows(path: String): Iterator[org.apache.spark.sql.Row]
  }

  /** Distributed single-job ingest (SURVEY §3.2's scale path): the file
    * list becomes a Dataset, each executor task converts its granules to
    * rows, and ONE write lands the whole batch — no per-granule driver
    * jobs, so 10^5 granules cost one job instead of 10^5. Per-file errors
    * are captured in an accumulator (skipped, not fatal), matching the
    * reference's error-capture contract.
    *
    * Use this when the converter is row-typed (plain file parsing);
    * [[writeGranulesBucket]] remains for converters that need a
    * SparkSession (e.g. reading each granule with spark.read).
    *
    * Returns the failed (path, error) pairs.
    */
  def writeGranulesBucketDistributed(spark: SparkSession,
                                     filepaths: Seq[String],
                                     bucketDir: String, p: Partitioning2D,
                                     reader: RowGranuleReader,
                                     schema: org.apache.spark.sql.types.StructType,
                                     x: String = "lon", y: String = "lat",
                                     rowGroupSize: String = "500MB",
                                     maxFileSize: String = "2GB"): Seq[(String, String)] = {
    import spark.implicits._
    val errors = spark.sparkContext.collectionAccumulator[(String, String)]("granule_errors")
    val paths = spark.createDataset(filepaths)
      .repartition(math.min(filepaths.size,
        spark.sparkContext.defaultParallelism * 2))
    val rows = paths.flatMap { path =>
      try reader.rows(path)
      catch { case e: Throwable =>
        errors.add(path -> String.valueOf(e.getMessage)); Iterator.empty
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    // autoSaltSkew=false: the skew probe would re-run every granule reader
    // (the input is a flatMap over files, not a re-scannable source) and
    // double-fire the error accumulator
    writeBucket(rows.toDF(), bucketDir, p, x, y, rowGroupSize, maxFileSize,
      mode = "append", autoSaltSkew = false)
    scala.jdk.CollectionConverters.ListHasAsScala(errors.value).asScala.toSeq
  }

  /** Per-granule fan-out ETL (reference write_granules_bucket,
    * routines.py:143-250): driver-parallel loop, per-file error capture,
    * collision-free append via per-granule filename prefixes — each granule
    * writes to its own staging dir, then its files move into the bucket as
    * `{granule}_{i}.parquet` (concurrent Spark jobs appending to one path
    * share committer staging and can clobber each other, so direct append
    * is NOT safe here; distinct staging dirs + atomic moves are).
    *
    * Returns (path, error) for each failed granule — failures don't abort
    * the run, matching the reference's error-capture contract.
    */
  def writeGranulesBucket(spark: SparkSession, filepaths: Seq[String],
                          bucketDir: String, p: Partitioning2D,
                          reader: GranuleReader,
                          x: String = "lon", y: String = "lat",
                          parallelism: Int = 4,
                          rowGroupSize: String = "500MB"): Seq[(String, String)] = {
    import org.apache.hadoop.fs.Path
    BucketInfo.write(bucketDir, p)
    val par = filepaths.par
    par.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(
      new java.util.concurrent.ForkJoinPool(parallelism))
    val results = par.flatMap { path =>
      Try {
        reader.read(spark, path).foreach { df =>
          val granuleBase = path.split('/').last.replaceAll("[^A-Za-z0-9._-]", "_")
          val staging = s"$bucketDir/_staging_$granuleBase"
          val labeled = p.addLabels(df, x, y, removeInvalidRows = true)
          labeled.write
            .mode("overwrite")
            .partitionBy(p.order: _*)
            .option("compression", "snappy")
            .option("parquet.block.size", parseSize(rowGroupSize))
            .parquet(staging)
          // move part files up as {granule}_{i}.parquet per partition dir
          // (Hadoop FS: staging + bucket may live on hdfs:// / s3a://)
          val (fs, stagingPath) = BucketFs.resolve(staging)
          val parts = BucketFs.listFileStatuses(fs, stagingPath)
            .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
            .map(_.getPath).sortBy(_.toString)
          parts.groupBy(_.getParent).foreach { case (dir, files) =>
            val rel = BucketFs.relativize(fs, stagingPath, dir)
            val dst = if (rel.isEmpty) new Path(bucketDir) else new Path(bucketDir, rel)
            BucketFs.mkdirs(fs, dst)
            files.zipWithIndex.foreach { case (f, i) =>
              BucketFs.move(fs, f, new Path(dst, s"${granuleBase}_$i.parquet"))
            }
          }
          BucketFs.deleteRecursive(staging)
        }
      } match {
        case Success(_) => None
        case Failure(e) => Some(path -> String.valueOf(e.getMessage))
      }
    }.seq.toSeq
    results
  }
}
