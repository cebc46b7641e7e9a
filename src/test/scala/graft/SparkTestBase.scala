package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // see Verify/Bench: keeps inferred size()>0 filters from duplicating
      // expensive generator expressions below fan-out repartitions
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // non-local scheme for HadoopFsSpec: `mock:/...` paths resolve through
      // the Hadoop FS API (backed by RawLocalFileSystem on disk), proving
      // the bucket plumbing never shortcuts through java.nio
      .config("spark.hadoop.fs.mock.impl", "graft.MockFs")
      // object-store stand-in whose setTimes is unsupported: exercises
      // the heartbeat's rewrite fallback (GenerationLockSpec)
      .config("spark.hadoop.fs.mocknst.impl", "graft.MockNoSetTimesFs")
      // full raw-S3A semantics (rename = copy+delete with fresh mtimes,
      // check-then-act create, no setTimes): pins the claim protocol's
      // documented object-store degradation (GenerationLockSpec)
      .config("spark.hadoop.fs.mocks3.impl", "graft.MockS3Fs")
      // metadata-RPC counting store: pins per-operation RPC budgets
      // (e.g. the claim busy fast path = one stat, no LIST)
      .config("spark.hadoop.fs.mockcnt.impl", "graft.MockCountingFs")
      // plan-audit asserts read PartitionFilters/PushedFilters out of the
      // formatted plan; the default 100-char cap truncates those lines
      // once expression ids grow past 4 digits (suite-order dependent),
      // so the same assert passes alone and fails after other suites
      .config("spark.sql.maxMetadataStringLength", "4000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
