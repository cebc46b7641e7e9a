package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed-cell write smoke: 90% of all rows land in ONE spatial cell —
  * the polar-orbit revisit pattern, exaggerated so the straggler
  * dominates on local[32]. Without auto-salting that cell serializes the
  * dynamic-partition write on one task; with it the hot cell fans out
  * over ceil(cellRows/maxRecords) tasks.
  *
  * Compares three writes of the same row count:
  *   uniform           — rows spread evenly (the baseline)
  *   skewed, salted    — 90% in one cell, autoSaltSkew on (the default)
  *   skewed, unsalted  — same data, autoSaltSkew off (the round-2 behavior)
  * Pass criterion: salted skewed write within ~2x of uniform.
  *
  * Run: sbt "runMain graft.tools.SkewSmoke [nRows]"
  */
object SkewSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = graft.core.GraftSession.builder("32", "64", rawLocalFs = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.partitioning._
    import graft.sources._

    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[skew] $name%-34s $s%8.2f s")
      s
    }

    // 10x10-degree cells; maxFileSize sized so the hot cell (n/2 rows)
    // is ~30 files worth — plenty of salt fan-out
    val p = LonLatPartitioning(size = (10, 10), labelsDecimals = Some((0, 0)))
    val maxFile = "8MB"

    // uniform: rows spread over the full globe
    val uniform = spark.range(n).select(
      (rand(42) * 360 - 180).as("lon"),
      (rand(43) * 180 - 90).as("lat"),
      (col("id") % 1000).cast("double").as("value"),
      col("id"))
    // skewed: same schema, but 90% of rows inside ONE 10x10 cell (the
    // straggler has to dominate the job for the smoke to discriminate —
    // at 50% skew a local[32] run hides the serial cell in aggregate IO)
    val skewed = spark.range(n).select(
      when(col("id") % 10 === 0, (rand(44) * 360 - 180))
        .otherwise(rand(45) * 9.9 + 80.05).as("lon"),
      when(col("id") % 10 === 0, (rand(46) * 180 - 90))
        .otherwise(rand(47) * 9.9 + 80.05).as("lat"),
      (col("id") % 1000).cast("double").as("value"),
      col("id"))

    def clean(d: String): Unit =
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(d))
    Seq("/tmp/skew_warm", "/tmp/skew_uniform", "/tmp/skew_salted",
      "/tmp/skew_unsalted").foreach(clean)

    // codegen/committer warmup so the first timed write isn't penalized
    BucketWriter.writeBucket(uniform.limit(10000), "/tmp/skew_warm", p,
      maxFileSize = maxFile, mode = "overwrite")

    val tUniform = time(s"uniform ${n / 1000000}M rows") {
      BucketWriter.writeBucket(uniform, "/tmp/skew_uniform", p,
        maxFileSize = maxFile, mode = "overwrite")
    }
    val tSalted = time("skewed 90%-one-cell, salted") {
      BucketWriter.writeBucket(skewed, "/tmp/skew_salted", p,
        maxFileSize = maxFile, mode = "overwrite")
    }
    val tUnsalted = time("skewed, UNSALTED (old path)") {
      BucketWriter.writeBucket(skewed, "/tmp/skew_unsalted", p,
        maxFileSize = maxFile, mode = "overwrite", autoSaltSkew = false)
    }

    // row-count integrity: salting must not lose or duplicate rows
    val salted = spark.read.option("pathGlobFilter", "*.parquet")
      .parquet("/tmp/skew_salted").count()
    val unsalted = spark.read.option("pathGlobFilter", "*.parquet")
      .parquet("/tmp/skew_unsalted").count()
    println(s"[skew] rows salted=$salted unsalted=$unsalted expected=$n")
    val hotDir = new java.io.File("/tmp/skew_salted")
      .listFiles().filter(_.isDirectory).map { lonDir =>
        lonDir.listFiles().filter(_.isDirectory).map(latDir =>
          (s"${lonDir.getName}/${latDir.getName}",
           latDir.listFiles().count(_.getName.endsWith(".parquet")))).toSeq
      }.flatten.maxBy(_._2)
    println(s"[skew] hottest dir: ${hotDir._1} with ${hotDir._2} files")
    println(f"[skew] salted/uniform = ${tSalted / tUniform}%.2fx " +
      f"(pass if <= ~2x); unsalted/uniform = ${tUnsalted / tUniform}%.2fx")
    assert(salted == n && unsalted == n, "row count mismatch")
    spark.stop()
  }
}
