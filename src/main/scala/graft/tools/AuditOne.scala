package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage diagnostic for ONE query: prints every completed stage's
  * task count, total/max task runtime, and the head of its physical
  * description — for chasing a [[StageAudit]] offender down to the
  * operator. Run: sbt "runMain graft.tools.AuditOne <query> [sfDir]". */
object AuditOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val scopes = si.rddInfos.flatMap(_.scope)
          .map(_.name).distinct.mkString(" > ")
        rows.synchronized {
          rows += ((si.stageId, si.numTasks,
            si.taskMetrics.executorRunTime / 1000.0, scopes.take(220)))
        }
      }
    })
    val fn = graft.SparkEntry.queries(name)
    // warm run then measured run (JIT out of the figures); drain the
    // async listener bus BEFORE clearing, or late warm-run events land
    // in the measured table
    fn(spark, dir).count()
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    rows.clear()
    fn(spark, dir).count()
    org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
    rows.sortBy(-_._3).foreach { case (sid, n, sec, what) =>
      println(f"stage=$sid%5d tasks=$n%4d runSec=$sec%7.2f  $what")
    }
    spark.stop()
  }
}
