package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hash-clustered (Spark "bucketed") datasource tables: the co-located
  * join strategy for fact-to-fact joins too big to broadcast.
  *
  * Writing both sides `CLUSTERED BY (key) INTO n BUCKETS` fixes each
  * row's file by `hash(key) % n` at WRITE time, so a later equi-join on
  * the key needs NO exchange on either side — the scan itself reports
  * `HashPartitioning(key, n)` and Catalyst elides both shuffles (and,
  * with `sortBy`, the sorts). At 100 TB this converts every recurring
  * join/aggregation on the cluster key from a full network shuffle into
  * a map-side zip of pre-matched files — the biggest single lever for a
  * join-heavy pipeline; `ClusteredSpec` asserts the exchange-free plan.
  *
  * Orthogonal to the spatial bucket layout ([[BucketWriter]]): spatial
  * partitioning prunes WHICH files a query reads, clustering fixes HOW
  * rows are distributed so joins co-locate. (The reference engine has no
  * join engine and thus no analogue; this is Spark-native surface,
  * satbucket/readers.py:162's pruning being the closest cousin.)
  */
object Clustered {

  /** Write `df` as a hash-clustered external datasource table at `path`.
    * `nBuckets` must match on both sides of a co-located join, and should
    * be sized so one bucket of the LARGER table fits a task comfortably
    * (≈ total size / nBuckets ≤ a few hundred MB).
    *
    * `readerSessions`: every session that will READ the table afterwards
    * and may have resolved it BEFORE this rewrite. On Spark 4.1,
    * saveAsTable-overwrite does NOT evict the per-session resolved-relation
    * cache (`SessionCatalog.tableRelationCache`), so a prior reader session
    * keeps planning against the part-files this overwrite just deleted —
    * `FAILED_READ_FILE.FILE_NOT_EXIST`; this exact stale listing aborted a
    * q120 re-run inside the r6 bench. The cache is PER SESSION (a cloned
    * session — e.g. a reader clone carrying parquet flags — has its own),
    * which is why refreshing only `df.sparkSession` is not enough when the
    * input df came from a clone: the session that runs the later join still
    * holds the stale entry. We evict via SQL REFRESH TABLE on each reader
    * session (verified empirically in r7: REFRESH TABLE on the reading
    * session evicts its cached relation and the next resolution lists the
    * rewritten files; DROP TABLE + recreate does not evict). */
  def writeClustered(df: DataFrame, table: String, path: String,
                     keyCols: Seq[String], nBuckets: Int,
                     sortCols: Seq[String] = Nil,
                     mode: String = "overwrite",
                     readerSessions: Seq[SparkSession] = Nil,
                     claimStaleness: Long =
                       GenerationLock.DefaultStalenessMs): Unit = {
    require(keyCols.nonEmpty, "clustering needs at least one key column")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    // single-writer contract on the table path, enforced (shared
    // [[GenerationLock]] protocol, whole-dir slot): two concurrent
    // overwrites of one clustered table interleave delete-old/write-new
    // inside saveAsTable and can leave a mix of both runs' bucket files
    // — which silently BREAKS the exchange-free join guarantee (bucket i
    // must hold exactly hash(key)%n == i rows from ONE consistent write).
    // The second writer fails loudly instead; a crashed writer's claim
    // goes stale after the window and is swept by the next. claimBeside,
    // not claimDir: the overwrite wipes the path's contents, so a claim
    // INSIDE it would vanish mid-write.
    val claim = GenerationLock.claimBeside(path, claimStaleness)
    try {
      var w = df.write.mode(mode)
        .option("path", path)
        .bucketBy(nBuckets, keyCols.head, keyCols.tail: _*)
      val sorts = if (sortCols.nonEmpty) sortCols else keyCols
      w = w.sortBy(sorts.head, sorts.tail: _*)
      w.saveAsTable(table)
      (df.sparkSession +: readerSessions).distinct.foreach { s =>
        s.sql(s"REFRESH TABLE `$table`")
      }
    } finally GenerationLock.release(claim)
  }

  /** Equi-join two co-clustered tables on their cluster key. When both
    * were written with the same nBuckets, the physical plan has no
    * Exchange (verify with `.explain`); bucketing survives only through
    * the session CATALOG (`spark.table`), not `spark.read.parquet` on
    * the same files, which is why this takes table names. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    on: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on, joinType)
}
