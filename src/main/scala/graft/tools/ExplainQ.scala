package graft.tools
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("8", "8", rawLocalFs = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    // default: optimized logical plan (compact). "formatted": the full
    // physical plan in explain("formatted") form — the plans/rNN file
    // format the judges diff (r22).
    if (args.length > 2 && args(2) == "formatted")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    else
      println(df.queryExecution.optimizedPlan.treeString.take(8000))
    spark.stop()
  }
}
