package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Parallelism tripwire: runs every gate query and flags stages that burn
  * significant core time in a SINGLE task — the signature of work
  * serialized below a repartition (e.g. a pushed-down filter cloning an
  * expensive generator expression, the q84 failure mode) or of a missing
  * fan-out. Run: sbt "runMain graft.tools.StageAudit [sfDir] [thresholdSec]".
  *
  * Streaming gates legitimately run some 1-task micro-batch bookkeeping
  * stages; the threshold keeps those below the radar.
  */
object StageAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(2.0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      current = name
      try fn(spark, dir).count()
      catch { case e: Throwable => println(s"[audit] $name FAILED: ${e.getMessage}") }
    }
    Thread.sleep(1000)
    if (offenders.isEmpty)
      println(s"[audit] OK: no single-task stage over $threshold core-sec across " +
        s"${graft.SparkEntry.queries.size} queries")
    else {
      offenders.foreach { case (q, sid, s) =>
        println(f"[audit] OFFENDER $q stage=$sid singleTaskCoreSec=$s%.2f")
      }
      sys.exit(1)
    }
    spark.stop()
  }
}
