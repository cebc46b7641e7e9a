package graft.tools

/** Micro-measurement (r21): what does ONE `spark.read.parquet(dir)`
  * relation resolution cost on this engine's index layouts — the eager
  * file listing + parquet footer schema inference that happens on every
  * DataFrame CREATION, before any action? The lifecycle gates re-load
  * their index every micro-batch (the generation head moves), so each
  * batch pays several of these; if a resolution is tens of ms, an
  * explicit schema (skipping inference) is worth plumbing through the
  * index loaders.
  *
  * Run: sbt "runMain graft.tools.ResolveBench <dir> [reps]"
  * Prints per-rep resolution time with and without an explicit schema.
  */
object ResolveBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.error("usage: ResolveBench <parquetDir> [reps]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.core.GraftSession
      .builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](what: String)(f: => A): Unit = {
      // warm once, then measure
      f
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      val ms = (System.nanoTime() - t0) / 1e6 / reps
      println(f"$what%-28s $ms%8.2f ms/resolution ($reps reps)")
    }

    time("infer (no schema)") { spark.read.parquet(dir) }
    val schema = spark.read.parquet(dir).schema
    time("explicit schema") { spark.read.schema(schema).parquet(dir) }
    spark.stop()
  }
}
