package graft.sources

import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, MapType,
  StructField, StructType}

/** Read-back schema bookkeeping for the persisted index layouts (r21).
  *
  * `spark.read.parquet(dir)` EAGERLY lists the directory tree and reads a
  * parquet footer to infer the schema — ~100 ms per resolution on the
  * bench host for a generation-partitioned index directory, vs ~18 ms
  * when the schema is passed explicitly (measured by
  * [[graft.tools.ResolveBench]]). Loaders resolve several sub-datasets
  * per load, and the streaming ingest paths re-load their index every
  * micro-batch (the generation head moves), so the inference tax is paid
  * over and over for schemas that are FIXED by the layout.
  *
  * The index manifests therefore persist, per sub-dataset, the exact
  * schema a fresh inference would return, computed HERE from the frame
  * that was written — not by re-reading the files:
  *
  *  - data columns keep their frame order with partition columns
  *    removed (what lands in the parquet files);
  *  - partition columns append at the END in `partitionBy` order, typed
  *    INT — every partition value these layouts write (`gen`, `band`,
  *    `bucket`, `cell`) is a small non-negative integer, which is what
  *    Spark's partition-column type inference yields for `name=123`
  *    directories;
  *  - every field is nullable (parquet file reads come back nullable
  *    regardless of writer-side nullability).
  *
  * Pre-r21 manifests have no schemas field; loaders fall back to plain
  * inference for them, so old persisted indexes keep working unchanged.
  */
private[sources] object ReadBackSchema {

  /** Parquet read-back forces nullability RECURSIVELY (Spark converts
    * all columns to nullable on read "for compatibility reasons"), so
    * the stored schema must too — e.g. a frame-side `array<long>` built
    * with `containsNull = false` reads back `containsNull = true`.
    * Metadata is dropped (inference carries none). */
  private def nullify(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, nullify(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(nullify(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(nullify(m.keyType), nullify(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** Schema `spark.read.parquet` would infer for a directory written as
    * `written.write.partitionBy(parts: _*)`. */
  def of(written: StructType, parts: Seq[String]): StructType = {
    val data = written.fields
      .filterNot(f => parts.contains(f.name))
      .map(f => StructField(f.name, nullify(f.dataType), nullable = true))
    val partition = parts.map(p => StructField(p, IntegerType, nullable = true))
    StructType(data ++ partition)
  }

  /** JSON form for the manifest (DataType.json round-trips StructType). */
  def toJsonString(s: StructType): String = s.json

  def fromJsonString(j: String): StructType =
    DataType.fromJson(j).asInstanceOf[StructType]
}
