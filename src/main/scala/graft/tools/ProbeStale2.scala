package graft.tools
/** Empirical evidence behind Clustered.writeClustered's readerSessions
  * refresh (the root cause of the swallowed r6 bench abort):
  *
  * On Spark 4.1, saveAsTable-overwrite does NOT evict the per-session
  * resolved-relation cache (SessionCatalog.tableRelationCache) — after a
  * rewrite, a session that resolved the table earlier keeps planning
  * against the deleted part-files (FAILED_READ_FILE.FILE_NOT_EXIST).
  * The cache is PER SESSION: q120 builds its inputs through the Tables
  * reader CLONE, so refreshing df.sparkSession (the clone) left the
  * OUTER session — the one running the co-located join — stale. Neither
  * DROP TABLE + recreate nor refreshing the clone helps; SQL REFRESH
  * TABLE issued on the READING session evicts its entry and the next
  * resolution lists the rewritten files.
  *
  * Runs the q120 gate x3 in one session exactly as Bench does; all
  * trials must pass. */
object ProbeStale2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("32", "32", rawLocalFs = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failures = 0
    for (i <- 1 to 3) {
      try {
        val n = graft.SparkEntry.queries("q120_clustered_join")(spark, sfDir).count()
        println(s"[t$i] OK rows=$n")
      } catch { case t: Throwable =>
        failures += 1
        println(s"[t$i] FAIL ${t.getMessage.linesIterator.next()}")
      }
    }
    println(s"PROBE_DONE failures=$failures")
    spark.stop()
  }
}
