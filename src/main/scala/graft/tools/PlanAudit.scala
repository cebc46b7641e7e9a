package graft.tools

import org.apache.spark.sql.SparkSession

/** Print formatted physical plans for selected gate queries (dev tool).
  * Run: sbt "runMain graft.tools.PlanAudit q55_swath_grid q31_minhash_sig"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q31_minhash_sig", "q55_swath_grid", "q57_ann_multiprobe",
        "q58_capped_lsh_equiv", "q59_audio_decode")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // InferFiltersFromGenerate duplicates the ENTIRE generator expression
      // into an inferred size()>0 filter, which predicate pushdown then
      // drags below the fan-out repartition — an expensive in-row array
      // build (shingles, winnow sketches) runs twice, once single-core.
      // Measured 23x on the winnow query. The skipped optimization only
      // pre-filters empty arrays, which our generators never produce.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    names.foreach { n =>
      println(s"==== $n ====")
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => println(s"failed: $e") }
    }
    spark.stop()
  }
}
