package graft.tools
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val trials = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.GraftSession.builder("32", "32", rawLocalFs = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to trials) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"trial $i rows=$n ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
