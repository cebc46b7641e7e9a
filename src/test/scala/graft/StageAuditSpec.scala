package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the StageAudit gate's TEETH (r19 verdict directive #6): the
  * adjudicated-by-design escape hatch must never become a blanket
  * pass — a listed stage above the full threshold still fails, an
  * unlisted persistent offender fails regardless of warm time — and
  * the offender-recording listener must attribute a real forced
  * single-task stage down to threshold/2 (the shape check that keeps a
  * page-cache-warm re-run from clearing a genuine serialization on
  * timing alone). */
class StageAuditSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark

  private val listed = StageAudit.AdjudicatedSingleTask.keys.head

  test("adjudicate: listed stage under the full threshold passes (known)") {
    val (known, confirmed) =
      StageAudit.adjudicate(Seq((listed, 7, 1.2)), threshold = 2.0)
    assert(known.map(_._1) == Seq(listed) && confirmed.isEmpty)
  }

  test("adjudicate: listed stage ABOVE the full threshold still fails — " +
       "the acknowledgment is not a waiver") {
    val (known, confirmed) =
      StageAudit.adjudicate(Seq((listed, 7, 2.4)), threshold = 2.0)
    assert(known.isEmpty && confirmed.map(_._1) == Seq(listed))
  }

  test("adjudicate: unlisted persistent offender fails regardless of warm " +
       "time (even under the full threshold)") {
    assert(!StageAudit.AdjudicatedSingleTask.contains("q999_unlisted"))
    // warm figure BETWEEN threshold/2 and threshold — the exact window a
    // timing-only re-audit would have cleared
    val (known, confirmed) =
      StageAudit.adjudicate(Seq(("q999_unlisted", 3, 1.4)), threshold = 2.0)
    assert(known.isEmpty && confirmed.map(_._1) == Seq("q999_unlisted"))
    // and far above: still confirmed, never silently dropped
    val (_, c2) = StageAudit.adjudicate(Seq(("q999_unlisted", 3, 9.9)), 2.0)
    assert(c2.nonEmpty)
  }

  test("adjudicate: mixed batch partitions correctly") {
    val batch = Seq((listed, 1, 1.1), (listed, 2, 3.0), ("q_x", 3, 1.2))
    val (known, confirmed) = StageAudit.adjudicate(batch, threshold = 2.0)
    assert(known == Seq((listed, 1, 1.1)))
    assert(confirmed.toSet == Set((listed, 2, 3.0), ("q_x", 3, 1.2)))
  }

  test("listener records a real forced-single-task stage, attributed to the " +
       "current query label") {
    val listener = new StageAudit.SingleTaskListener(halfThreshold = 1e-4)
    spark.sparkContext.addSparkListener(listener)
    try {
      listener.current = "fixture_single_task"
      // coalesce(1) serializes the scan+sum onto one task — the exact
      // shape the tripwire exists for; enough rows that executorRunTime
      // is reliably nonzero
      // modulo bounds the summand so 3M-row ANSI sum cannot overflow long
      spark.range(3000000L).coalesce(1)
        .select(sum(xxhash64(col("id")) % 1000)).collect()
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      val hits = listener.offenders.synchronized {
        listener.offenders.filter(_._1 == "fixture_single_task").toSeq
      }
      assert(hits.nonEmpty, "forced single-task stage was not recorded")
      assert(hits.forall(_._3 > 1e-4))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("listener ignores stages below threshold/2 — the sub-radar band for " +
       "streaming micro-batch bookkeeping") {
    val listener = new StageAudit.SingleTaskListener(halfThreshold = 1e9)
    spark.sparkContext.addSparkListener(listener)
    try {
      listener.current = "fixture_below_radar"
      spark.range(1000L).coalesce(1).count()
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      assert(listener.offenders.synchronized(listener.offenders.isEmpty))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
