package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{Footer, ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.metadata.{BlockMetaData, FileMetaData, ParquetMetadata}
import org.apache.spark.sql.SparkSession
import scala.collection.parallel.CollectionConverters._
import scala.jdk.CollectionConverters._

/** `_metadata` / `_common_metadata` sidecars (reference
  * write_dataset_metadata, satbucket/writers.py:131-142 — S8).
  *
  * Catalyst reads per-file footers and doesn't consume these, but external
  * pyarrow/dask readers use them to plan scans without touching every
  * footer — writing them keeps graft buckets fully consumable by the
  * reference's own read stack.
  *
  * Scale: below [[DistributeAbove]] files the footers are gathered by the
  * shared 16-way driver pool (no job overhead — the common case). Above
  * it, footer reading AND per-partition merging run as a Spark job: each
  * task reads its slice of footers, relativizes block paths, merges them
  * into ONE partial thrift blob, and the driver only merges nPartitions
  * compact partials — so the read cost scales with the cluster and the
  * driver never holds the raw per-file footer objects (at 10^5-10^6
  * consolidated files the old driver-pool gather was a driver-bound
  * hour). The final merged metadata is inherently driver-resident — the
  * `_metadata` format is one footer holding every row group — but that is
  * the irreducible size of the artifact itself.
  */
object DatasetMetadata {

  /** Past this many files the footer gather runs as a Spark job (same
    * escalation contract as Merge.DistributeRenamesAbove). */
  val DistributeAbove = 1024

  def write(bucketDir: String, conf: Configuration = BucketFs.conf,
            distributeAbove: Int = DistributeAbove): Unit = {
    val files = BucketReader.listFiles(bucketDir, fileExtension = ".parquet")
    require(files.nonEmpty, s"no parquet files under $bucketDir")
    val sessionOpt =
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    if (files.size <= distributeAbove || sessionOpt.isEmpty)
      writeDriver(bucketDir, files, conf)
    else writeDistributed(sessionOpt.get, bucketDir, files)
  }

  /** Driver-pool path: parquet-mr's own merge+write, proven at gate scale. */
  private def writeDriver(bucketDir: String, files: Seq[String],
                          conf: Configuration): Unit = {
    val par = files.par
    par.tasksupport = BucketFs.fsTaskSupport
    val footers = par.map { f =>
      val p = new Path(f)
      new Footer(p, ParquetFileReader.readFooter(conf, p,
        ParquetMetadataConverter.NO_FILTER))
    }.seq.toList
    // writes BOTH _metadata (row groups) and _common_metadata (schema only)
    ParquetFileWriter.writeMetadataFile(conf, new Path(bucketDir), footers.asJava)
  }

  /** parquet-mr's path-relativization rule (mergeFooters): scheme-less
    * URI path, root prefix stripped, leading slashes dropped. Replicated
    * exactly so distributed and driver outputs carry identical paths. */
  private def relativize(rootUriPath: String, file: Path): String = {
    val fp = file.toUri.getPath
    require(fp.startsWith(rootUriPath),
      s"$fp invalid: all files must be contained in the root $rootUriPath")
    fp.substring(rootUriPath.length).dropWhile(_ == '/')
  }

  /** One partition's footers merged to a single thrift blob:
    * (thriftBytes, distinct createdBy strings). The partial's blocks are
    * already relativized; its schema is the union of its files' schemas;
    * its key-value map is strict-merged. */
  private case class Partial(bytes: Array[Byte], createdBy: Seq[String])

  private def strictMergeKv(maps: Iterator[java.util.Map[String, String]])
      : java.util.Map[String, String] = {
    val merged = new java.util.LinkedHashMap[String, String]()
    maps.foreach { m =>
      m.asScala.foreach { case (k, v) =>
        val prev = merged.putIfAbsent(k, v)
        require(prev == null || prev == v,
          s"conflicting values for key-value metadata key '$k' (strict merge)")
      }
    }
    merged
  }

  private def writeDistributed(spark: SparkSession, bucketDir: String,
                               files: Seq[String]): Unit = {
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val rootUriPath = new Path(bucketDir).toUri.getPath
    val nParts = math.min(
      math.max(1, files.size / 64), spark.sparkContext.defaultParallelism * 4)
    val partials = spark.sparkContext
      .parallelize(files, nParts)
      .mapPartitions { it =>
        val conf = confSer.value
        val converter = new ParquetMetadataConverter()
        var schema: org.apache.parquet.schema.MessageType = null
        val createdBy = scala.collection.mutable.LinkedHashSet.empty[String]
        val kv = scala.collection.mutable.ArrayBuffer
          .empty[java.util.Map[String, String]]
        val blocks = new java.util.ArrayList[BlockMetaData]()
        it.foreach { f =>
          val p = new Path(f)
          val md = ParquetFileReader.readFooter(conf, p,
            ParquetMetadataConverter.NO_FILTER)
          val rel = relativize(rootUriPath, p)
          md.getBlocks.asScala.foreach { b => b.setPath(rel); blocks.add(b) }
          val fmd = md.getFileMetaData
          schema =
            if (schema == null) fmd.getSchema else schema.union(fmd.getSchema)
          createdBy += fmd.getCreatedBy
          kv += fmd.getKeyValueMetaData
        }
        if (blocks.isEmpty) Iterator.empty
        else {
          // the partial's createdBy is a placeholder — the real set rides
          // alongside and the driver applies the size==1 rule globally
          val partialFmd = new FileMetaData(schema,
            strictMergeKv(kv.iterator), "graft-partial")
          val pm = new ParquetMetadata(partialFmd, blocks)
          val out = new java.io.ByteArrayOutputStream()
          org.apache.parquet.format.Util.writeFileMetaData(
            converter.toParquetMetadata(ParquetFileWriter.CURRENT_VERSION, pm), out)
          Iterator.single(Partial(out.toByteArray, createdBy.toSeq))
        }
      }
      .collect()

    // driver merge over nPartitions compact partials (not nFiles footers)
    val converter = new ParquetMetadataConverter()
    var schema: org.apache.parquet.schema.MessageType = null
    val createdBy = scala.collection.mutable.LinkedHashSet.empty[String]
    val blocks = new java.util.ArrayList[BlockMetaData]()
    val kvMaps = scala.collection.mutable.ArrayBuffer
      .empty[java.util.Map[String, String]]
    partials.foreach { part =>
      val pm = converter.fromParquetMetadata(
        org.apache.parquet.format.Util.readFileMetaData(
          new java.io.ByteArrayInputStream(part.bytes)))
      pm.getBlocks.asScala.foreach(blocks.add)
      val fmd = pm.getFileMetaData
      schema = if (schema == null) fmd.getSchema else schema.union(fmd.getSchema)
      createdBy ++= part.createdBy
      kvMaps += fmd.getKeyValueMetaData
    }
    // GlobalMetaData.merge's createdBy rule: the single value when
    // unanimous, else the set rendered as a string
    val createdByStr =
      if (createdBy.size == 1) createdBy.head else createdBy.mkString("[", ", ", "]")
    val fmd = new FileMetaData(schema, strictMergeKv(kvMaps.iterator), createdByStr)
    val conf = confSer.value
    writeFooterFile(conf, new Path(bucketDir, ParquetFileWriter.PARQUET_METADATA_FILE),
      new ParquetMetadata(fmd, blocks))
    writeFooterFile(conf,
      new Path(bucketDir, ParquetFileWriter.PARQUET_COMMON_METADATA_FILE),
      new ParquetMetadata(fmd, new java.util.ArrayList[BlockMetaData]()))
  }

  /** The documented parquet footer-file format: PAR1 + thrift FileMetaData
    * + 4-byte little-endian footer length + PAR1 (what
    * ParquetFileWriter.serializeFooter emits). */
  private def writeFooterFile(conf: Configuration, path: Path,
                              md: ParquetMetadata): Unit = {
    val converter = new ParquetMetadataConverter()
    val body = new java.io.ByteArrayOutputStream()
    org.apache.parquet.format.Util.writeFileMetaData(
      converter.toParquetMetadata(ParquetFileWriter.CURRENT_VERSION, md), body)
    val fs = path.getFileSystem(conf)
    val out = fs.create(path, true)
    try {
      out.write(ParquetFileWriter.MAGIC)
      body.writeTo(out)
      val len = body.size()
      out.write(len & 0xFF); out.write((len >> 8) & 0xFF)
      out.write((len >> 16) & 0xFF); out.write((len >> 24) & 0xFF)
      out.write(ParquetFileWriter.MAGIC)
    } finally out.close()
  }
}
