package graft.tools

import org.apache.spark.graftbridge.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Parallelism tripwire: runs every gate query and flags stages that burn
  * significant core time in a SINGLE task — the signature of work
  * serialized below a repartition (e.g. a pushed-down filter cloning an
  * expensive generator expression, the q84 failure mode) or of a missing
  * fan-out. Run: sbt "runMain graft.tools.StageAudit [sfDir] [thresholdSec]".
  *
  * Streaming gates legitimately run some 1-task micro-batch bookkeeping
  * stages; the threshold keeps those below the radar.
  *
  * Exit is non-zero when an offender is found OR when any query failed to
  * run — a query that throws was never audited, and reporting OK over
  * reduced coverage would defeat the tripwire.
  */
object StageAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(2.0)
    val spark = graft.core.GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var current = ""
    val offenders = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Double)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val coreSec = si.taskMetrics.executorRunTime / 1000.0
        if (si.numTasks == 1 && coreSec > threshold)
          offenders.synchronized {
            offenders += ((current, si.stageId, coreSec))
          }
      }
    })

    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      current = name
      try fn(spark, dir).count()
      catch { case e: Throwable =>
        failed += name
        println(s"[audit] $name FAILED: ${e.getMessage}")
      }
      // stage events arrive on the async listener bus — drain before the
      // label advances so none are attributed to the next query or lost
      // at exit
      ListenerBridge.drain(spark.sparkContext)
    }
    offenders.foreach { case (q, sid, s) =>
      println(f"[audit] OFFENDER $q stage=$sid singleTaskCoreSec=$s%.2f")
    }
    if (failed.nonEmpty)
      println(s"[audit] INCOMPLETE: ${failed.size} queries failed to run " +
        s"(${failed.mkString(", ")}) — their stages were never audited")
    if (offenders.isEmpty && failed.isEmpty)
      println(s"[audit] OK: no single-task stage over $threshold core-sec across " +
        s"${graft.SparkEntry.queries.size} queries")
    spark.stop()
    if (offenders.nonEmpty || failed.nonEmpty) sys.exit(1)
  }
}
