package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-query job-timeline decomposition (r21 optimization harness).
  *
  * For each named query: one untimed warm run, then one measured run with
  * a listener recording every Spark job's (submit, complete) wall times.
  * Prints, per query:
  *
  *   - wall: end-to-end wall clock of the measured run
  *   - jobs: job count and the sum of per-job durations
  *   - gap:  wall − union(job intervals) — driver-side time spent OUTSIDE
  *           any running job (Catalyst planning, file listing, manifest
  *           IO, commit protocol, foreachBatch glue). Overlapping jobs
  *           are merged before subtracting, so concurrent jobs don't
  *           undercount the gap.
  *   - the 8 longest jobs (id, dur, gap-before) — where the seconds live.
  *
  * This separates "the cluster is computing" from "the driver is
  * deciding what to compute", which is the split that matters for the
  * lifecycle/streaming tail (many tiny sequential jobs).
  *
  * Run: sbt "runMain graft.tools.JobProfile <sfDir> q147_... [q163_...]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q147_stream_dedup_ingest")
    val spark = graft.core.GraftSession.builder("32", "32", rawLocalFs = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class J(id: Int, t0: Long, var t1: Long, what: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // attribute the job: the final stage's callsite is the most
        // readable one-liner Spark gives us without the UI
        val what = e.stageInfos.lastOption.map(_.name).getOrElse("?")
          .replaceAll("\\s+", " ").take(70)
        jobs.put(e.jobId, J(e.jobId, e.time, -1L, what))
        ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
      }
    }

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, sfDir).count() // warm: staging + JIT outside the measure
      catch { case scala.util.control.NonFatal(t) =>
        println(s"$name warm FAILED: $t") }
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val w0 = System.currentTimeMillis()
      val n = fn(spark, sfDir).count()
      val w1 = System.currentTimeMillis()
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)

      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.filter(_.t1 > 0).sortBy(_.t0)
      // merge overlapping job intervals, then busy = covered span
      var busy = 0L
      var curS = -1L; var curE = -1L
      js.foreach { j =>
        if (curE < 0) { curS = j.t0; curE = j.t1 }
        else if (j.t0 <= curE) { curE = math.max(curE, j.t1) }
        else { busy += curE - curS; curS = j.t0; curE = j.t1 }
      }
      if (curE >= 0) busy += curE - curS
      val wall = w1 - w0
      println(f"==== $name rows=$n wall=${wall / 1e3}%.2fs jobs=${js.size} " +
        f"busy=${busy / 1e3}%.2fs gap=${(wall - busy) / 1e3}%.2fs")
      // longest jobs with the idle gap that preceded each
      val withGaps = js.zip((-1L) +: js.map(_.t1).dropRight(1)).map {
        case (j, prevEnd) =>
          val gapBefore = if (prevEnd < 0) j.t0 - w0 else math.max(0L, j.t0 - prevEnd)
          (j, gapBefore)
      }
      withGaps.sortBy { case (j, _) => j.t0 - j.t1 }.take(12).foreach { case (j, g) =>
        println(f"  job ${j.id}%4d dur=${(j.t1 - j.t0) / 1e3}%6.2fs gapBefore=${g / 1e3}%5.2fs  ${j.what}")
      }
      val gapSum = withGaps.map(_._2).sum
      println(f"  sum(gapBefore)=${gapSum / 1e3}%.2fs over ${js.size} jobs " +
        f"(mean ${if (js.nonEmpty) gapSum / js.size else 0L} ms)")
    }
    spark.stop()
  }
}
