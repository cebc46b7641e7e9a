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
      // Spill-merge read-ahead trades memory for merge throughput: each
      // open spill reader buys buffers (and in local[N] mode all N tasks
      // share ONE heap, ×32 here vs ~5 cores/executor on a cluster).
      // Both directions were measured in r18 (PERFNOTES): ON, the
      // uncapped q207 at 10× adversarial replication OOMs an 8 g driver
      // in the merge (the r17 32 g note) but the 10M-row bucket write
      // runs 33 s; OFF, q207-10× completes in the default heap (151.9 s,
      // faster than 191.1 s at 32 g) but the write's spill merge drops
      // to unbuffered reads and the bucket write runs 79 s — 2.4×. So
      // the Spark default (ON) stays the session default, and the one
      // adversarial configuration that needs the memory headroom flips
      // it per run: SPARK_GRAFT_SPILL_READAHEAD=false (the documented
      // alternative to a 4× driver heap; see StageAudit's q207 note).
      .config("spark.unsafe.sorter.spill.read.ahead.enabled",
        spillReadAhead(sys.env.get("SPARK_GRAFT_SPILL_READAHEAD")))
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    if (rawLocalFs)
      // NioLocalFileSystem = RawLocalFileSystem minus the fork-per-created-
      // file chmod that Hadoop's Shell fallback pays without libhadoop —
      // see the class scaladoc (r21 jstack find: multi-second per-query tax
      // on file-churny lifecycle/streaming gates)
      b.config("spark.hadoop.fs.file.impl",
        classOf[graft.sources.NioLocalFileSystem].getName)
    else b
  }

  def builder(cores: String): SparkSession.Builder = builder(cores, cores)

  /** Normalize the SPARK_GRAFT_SPILL_READAHEAD override before it
    * reaches the Spark conf: only true/false (any case) are meaningful,
    * and anything else ("0", "off", a typo) would otherwise fail much
    * later, deep inside Spark's boolean conf parsing, with an error that
    * never names the environment variable the user actually set. */
  private[graft] def spillReadAhead(env: Option[String]): String = env match {
    case None => "true"
    case Some(v) if v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false") =>
      v.toLowerCase
    case Some(v) => throw new IllegalArgumentException(
      s"SPARK_GRAFT_SPILL_READAHEAD must be 'true' or 'false', got '$v' " +
        "(the per-run override for spark.unsafe.sorter.spill.read.ahead." +
        "enabled — see the GraftSession builder comment)")
  }
}
