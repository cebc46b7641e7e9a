package graft.tools

import graft.SparkEntry

/** Round-7 reproduction harness for the swallowed r6 bench abort
  * (`ERROR TaskSetManager: Task 5 in stage 1820.0 ... FileScanRDD`):
  * runs the self-rewriting gates (persisted-index lifecycle + merge/update)
  * back-to-back x3 exactly as Bench does, but SURFACES every trial failure
  * instead of eating it, printing the full cause chain so the failing
  * read's path is visible. */
object ReproR7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("32", "32", rawLocalFs = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val suspects = Seq(
      "q120_clustered_join", // CONFIRMED culprit: stale listing on trial 2+
      "q100_pq_persist", "q109_pq_persist_residual",
      "q113_stream_index_ingest", "q114_stream_residual_ingest",
      "q121_index_delete", "q122_index_compact",
      "q27_merge_roundtrip", "q54_update_merge")
      .filter(SparkEntry.queries.contains)
    var failures = 0
    for (round <- 1 to 3; name <- suspects) {
      val t0 = System.nanoTime()
      try {
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"OK    r$round $name%-28s rows=$n%-6d ${(System.nanoTime()-t0)/1e9}%.2fs")
      } catch { case t: Throwable =>
        failures += 1
        println(s"FAIL  r$round $name: ${t.getClass.getName}: ${t.getMessage}")
        var c = t.getCause
        while (c != null) { println(s"  caused by: ${c.getClass.getName}: ${c.getMessage}"); c = c.getCause }
      }
    }
    println(s"REPRO_DONE failures=$failures")
    spark.stop()
  }
}
