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

object QueryModule {
  /** Cache key for /tmp-staged gate inputs derived from a testdata dir.
    *
    * The driver regenerates `/root/testdata` IN PLACE between rounds
    * (same paths, new content — round 9 even switched parquet timestamp
    * flavor), while /tmp staging outlives rounds. A key derived only
    * from the dir string would bless stale staged copies of the OLD
    * tables, silently diverging from oracles recomputed on the new
    * files. So the key folds in a fingerprint (size + mtime) of every
    * source table the gates stage from. */
  def cacheKey(dir: String): String = {
    val fp = Seq("events", "documents", "embeddings", "lineitem", "orders")
      .map { t =>
        val f = new java.io.File(s"$dir/$t.parquet")
        f.length * 31L + f.lastModified
      }
      .foldLeft(0L)((a, b) => a * 1000003L + b)
    s"${dir.hashCode.toHexString}_${java.lang.Long.toHexString(fp)}"
  }
}
