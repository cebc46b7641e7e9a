package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named batch of driver-checkable queries.
  *
  * Each entry in `queries` is mirrored by ANSI SQL in `oracle` runnable by
  * DuckDB over the same parquet tables (registered under their bare names).
  * Column names/aliases MUST match between the Spark plan and the SQL —
  * the driver sorts columns by name before hashing.
  *
  * Determinism rules used throughout (so hashes match bit-for-bit):
  *  - money/value aggregates are computed in exact integer cents
  *    (`round(x*100)` then cast to long) — no float-sum ordering issues;
  *  - ratios are emitted as (numerator, denominator) integer pairs;
  *  - top-k queries always carry a unique tie-break key in the sort.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
