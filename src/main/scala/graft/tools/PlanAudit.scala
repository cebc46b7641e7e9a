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
    val spark = graft.core.GraftSession.builder("8").getOrCreate()
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
