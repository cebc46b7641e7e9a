package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{Footer, ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.format.converter.ParquetMetadataConverter
import scala.collection.parallel.CollectionConverters._
import scala.jdk.CollectionConverters._

/** `_metadata` / `_common_metadata` sidecars (reference
  * write_dataset_metadata, satbucket/writers.py:131-142 — S8).
  *
  * Catalyst reads per-file footers and doesn't consume these, but external
  * pyarrow/dask readers use them to plan scans without touching every
  * footer — writing them keeps graft buckets fully consumable by the
  * reference's own read stack. Footers are gathered in a parallel pass.
  */
object DatasetMetadata {

  def write(bucketDir: String, conf: Configuration = BucketFs.conf): Unit = {
    val files = BucketReader.listFiles(bucketDir, fileExtension = ".parquet")
    require(files.nonEmpty, s"no parquet files under $bucketDir")
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
}
