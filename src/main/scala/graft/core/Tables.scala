package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  * One parquet file per table under the scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Schema cache keyed by file IDENTITY (path, length, mtime): every
  // `spark.read.parquet` EAGERLY re-reads the footer to infer the schema
  // (~tens of ms), and the bench harness re-invokes each query function
  // per trial, so the same ten immutable table files were re-inferred
  // thousands of times per board (r21). A hit passes the schema
  // explicitly — same plan, no footer read; any regeneration of the
  // testdata changes (length, mtime) and misses. NOT result caching:
  // only the input file's own schema, validated against the input
  // file's own stat, lives here.
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), org.apache.spark.sql.types.StructType]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized reader
    // rejects; read as long nanos and truncate to micros (identical to
    // DuckDB's nanos->micros conversion, so oracle values line up). The
    // nanos flag lives in a cloned reader session so the caller's session
    // conf is untouched (and is constant across ReaderSession clones, so
    // one file always infers one schema — cacheable by file identity).
    val path = s"$sfDir/$name.parquet"
    val f = new java.io.File(path)
    val key = (f.getAbsolutePath, f.length(), f.lastModified())
    val reader = ReaderSession(spark).read
    val df = Option(schemaCache.get(key)) match {
      case Some(schema) => reader.schema(schema).parquet(path)
      case None =>
        val resolved = reader.parquet(path)
        schemaCache.put(key, resolved.schema)
        resolved
    }
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
}
