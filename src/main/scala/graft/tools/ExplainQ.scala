package graft.tools
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("8", "8", rawLocalFs = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    println(df.queryExecution.optimizedPlan.treeString.take(8000))
    spark.stop()
  }
}
