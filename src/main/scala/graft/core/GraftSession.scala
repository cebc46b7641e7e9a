package graft.core

import org.apache.spark.sql.SparkSession

/** Canonical local SparkSession config, shared by every entry point
  * (Bench, Verify, plan/stage audits, profile and scale smokes). The
  * session-level tuning lives HERE and only here, so a tool can never
  * measure a differently-optimized plan than the one Bench/Verify run.
  *
  * Notable settings and why:
  *  - `excludedRules = InferFiltersFromGenerate`: that rule duplicates the
  *    ENTIRE generator expression into an inferred size()>0 filter, which
  *    predicate pushdown then drags below the fan-out repartition — an
  *    expensive in-row array build (shingles, winnow sketches) runs twice,
  *    once single-core. Measured 23x on the winnow query. The skipped
  *    optimization only pre-filters empty arrays, which our generators
  *    never produce.
  *  - file-output committer v2 + no _SUCCESS: many-directory partitionBy
  *    writes commit per task, avoiding the job-commit rename storm.
  *  - `rawLocalFs`: local-fs benches skip .crc sidecar writes (~15% on
  *    many-file writes). Off for Verify (the driver reads the output with
  *    other tools; checksums are harmless there).
  */
object GraftSession {
  def builder(cores: String, shufflePartitions: String,
              rawLocalFs: Boolean = false): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      // naive parquet timestamps are naive-UTC in this engine's data model:
      // read them as TIMESTAMP (session zone = UTC), never TIMESTAMP_NTZ.
      // Set at builder level so readStream sources and newSession() clones
      // (streaming gates) inherit it, not just ReaderSession batch reads.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      // Spill-merge read-ahead is a throughput optimization that buys
      // memory per (concurrent merging task × spill file) — and in
      // local[N] mode all N tasks share ONE driver heap, so the
      // multiplier is N=32 here vs ~5 cores/executor on a real cluster.
      // That multiplier is exactly what made the uncapped q207 at 10×
      // adversarial replication OOM an 8 g driver (r17 operational
      // note); with read-ahead off it completes in the DEFAULT heap,
      // 151.9 s vs 191.1 s at 32 g (r18, PERFNOTES) — faster, because
      // the merge no longer thrashes a heap it nearly fills. Disabled
      // for the local harness; a cluster deployment with per-executor
      // heaps can leave the Spark default on.
      .config("spark.unsafe.sorter.spill.read.ahead.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    if (rawLocalFs)
      b.config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    else b
  }

  def builder(cores: String): SparkSession.Builder = builder(cores, cores)
}
