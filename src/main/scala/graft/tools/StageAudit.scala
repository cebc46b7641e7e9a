package graft.tools

import org.apache.spark.graftbridge.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Parallelism tripwire: runs gate queries and flags stages that burn
  * significant core time in a SINGLE task — the signature of work
  * serialized below a repartition (e.g. a pushed-down filter cloning an
  * expensive generator expression, the q84 failure mode), of a missing
  * fan-out, or of AQE's byte-based coalescing collapsing a small-byte /
  * high-CPU shuffle to one partition (the r17 LSH failure mode, visible
  * only at 10×).
  *
  * STANDING PER-ROUND GATE (r17 verdict directive, institutionalized
  * r18) — both passes are part of the closing-board ritual, each ending
  * in a PERFNOTES "StageAudit: OK" row:
  *
  *   1. full board at bench scale, threshold 2.0 core-sec:
  *        sbt "runMain graft.tools.StageAudit /root/testdata/sf0.1 2.0"
  *   2. heavy families at 10×, threshold 6.0 core-sec (catches
  *      scale-dependent serialization sf0.1 structurally hides —
  *      r17: five LSH queries carried 60–172 single-task core-sec
  *      at 10× while the sf0.1 audit read clean):
  *        sbt "runMain graft.tools.StageAudit 10x 6.0"
  *      `10x` (or `10x:/root/testdata/sf0.1`) stages the replication
  *      dir via [[ScaleStage]] (marker-gated, reused across runs) and
  *      audits [[Heavy10x]] — the LSH / prefix-join / cluster-split /
  *      stream-ingest families. q207_prefix_join_rs is deliberately
  *      absent from the standing list: its uncapped 10× run costs
  *      ~150 s by output-cardinality contract — audit it directedly
  *      with an explicit query list when its plan changes (last clean:
  *      r18), under SPARK_GRAFT_SPILL_READAHEAD=false, which lets the
  *      run complete in the default heap (the r18 replacement for the
  *      retired 32 g driver note; the default stays on because the
  *      bucket write's spill merge is 2.4× slower without read-ahead
  *      — PERFNOTES r18).
  *
  * Run: sbt "runMain graft.tools.StageAudit [sfDir|10x[:base]]
  * [thresholdSec] [q1,q2,...]" — an explicit query list overrides the
  * default (all queries at a plain dir, [[Heavy10x]] at a 10x dir).
  *
  * Streaming gates legitimately run some 1-task micro-batch bookkeeping
  * stages; the threshold keeps those below the radar.
  *
  * Flagged queries RE-RUN once in the now-warm session before the gate
  * adjudicates (a genuine serialization is in the plan and persists; a
  * first-run JIT artifact near the threshold disappears — cleared flags
  * are printed, never silently dropped). The re-audit confirms by
  * SHAPE, not time alone: any single-task stage above threshold/2 on
  * the warm run keeps the flag, so a real serialization that merely
  * dips under the threshold on a page-cache-warm second run cannot
  * clear itself. Stages whose 1-task shape is structural by design are
  * acknowledged on [[AdjudicatedSingleTask]] (narrow, reasoned, and
  * still failing above the full threshold). Exit is non-zero when an
  * offender persists the re-audit OR when any query failed to run — a
  * query that throws was never audited, and reporting OK over reduced
  * coverage would defeat the tripwire.
  */
object StageAudit {

  /** Adjudicated BY-DESIGN single-task stages: gate queries whose
    * 1-task stage is structural, not a missing fan-out, each carrying
    * its reason. The r19 shape-checked re-audit (which no longer clears
    * a flag on warm TIME alone) correctly refuses to clear these, so
    * they are acknowledged here instead — but with TEETH: an
    * adjudicated stage passes only while its warm re-run stays UNDER
    * the full threshold; a regression pushing it above still fails the
    * gate, and an unlisted persistent offender always fails. */
  val AdjudicatedSingleTask: Map[String, String] = Map(
    "q202_mjpeg_avi" -> ("one-file AVI fixture: the RIFF container " +
      "parse is inherently sequential PER FILE (the documented JDK-" +
      "codec boundary, Avi.scala header), so a single-file gate is one " +
      "task by shape; at scale the fan-out is per-file and the decode " +
      "parallelizes across files, which this fixture cannot show"))

  /** The scale-sensitive families for the 10× pass: every query whose
    * plan shuffles small-byte/high-CPU rows (banded LSH buckets, prefix
    * candidate pairs) or runs a per-batch lifecycle — where AQE
    * coalescing or a missing fan-out shows up only when the CPU behind
    * each byte grows with the data. */
  val Heavy10x: Seq[String] = Seq(
    "q32_minhash_lsh_pairs", "q45_dedup_clusters", "q58_capped_lsh_equiv",
    "q111_dedup_keep_best", "q192_prefix_filter_join",
    "q210_cluster_split", "q212_cluster_split_str",
    "q214_prefix_join_capped", "q147_stream_dedup_ingest",
    "q148_stream_text_ingest",
    // the graph family (r19 verdict What's-wrong #2): each PageRank /
    // label-propagation round is a src-keyed join + dst-keyed agg whose
    // BOTH sides scale with edges — exactly the small-byte/high-CPU
    // shuffle shape AQE coalescing can serialize at scale; previously
    // their only scale evidence was a one-off 30× exponent row, not a
    // standing gate. q190 joins for the same reason on its per-batch
    // probe-cell scan.
    "q177_pagerank", "q188_pagerank_weighted", "q199_label_propagation",
    "q205_personalized_pagerank", "q190_stream_ann_search")

  /** The offender-recording half of the tripwire, extracted so the
    * fixture spec can drive it against a real forced-single-task plan:
    * records (query, stageId, coreSec) for every completed stage that
    * ran as ONE task and burned more than `halfThreshold` core-seconds
    * (threshold/2 — the re-audit confirms by shape at half the gate
    * threshold, see main's re-audit note). */
  private[tools] class SingleTaskListener(halfThreshold: Double)
      extends SparkListener {
    @volatile var current = ""
    val offenders =
      scala.collection.mutable.ArrayBuffer.empty[(String, Int, Double)]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val coreSec = si.taskMetrics.executorRunTime / 1000.0
      if (si.numTasks == 1 && coreSec > halfThreshold)
        offenders.synchronized {
          offenders += ((current, si.stageId, coreSec))
        }
    }
  }

  /** The gate decision over persisting (re-audit-confirmed) offenders —
    * extracted so the teeth are spec-pinned (r19 verdict #6): returns
    * (known, confirmed) where `known` passes the gate and `confirmed`
    * fails it. A stage passes ONLY if its query is on
    * [[AdjudicatedSingleTask]] AND its warm figure stays at-or-under
    * the FULL threshold; a listed query above the threshold still
    * fails, and an unlisted persistent offender fails regardless of
    * its warm time. */
  private[tools] def adjudicate(persisting: Seq[(String, Int, Double)],
      threshold: Double)
      : (Seq[(String, Int, Double)], Seq[(String, Int, Double)]) =
    persisting.partition { case (q, _, s) =>
      AdjudicatedSingleTask.contains(q) && s <= threshold
    }

  def main(args: Array[String]): Unit = {
    val dirArg = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threshold = args.lift(1).map(_.toDouble)
      .getOrElse(if (dirArg.startsWith("10x")) 6.0 else 2.0)
    val spark = graft.core.GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tenX = dirArg.startsWith("10x")
    val dir =
      if (tenX) {
        val base = dirArg.split(':').lift(1).getOrElse("/root/testdata/sf0.1")
        ScaleStage.ensure(spark, base, 10)
      } else dirArg
    val names: Seq[String] = args.lift(2) match {
      case Some(csv) => csv.split(',').map(_.trim).toSeq.filter(_.nonEmpty)
      case None if tenX => Heavy10x
      case None => graft.SparkEntry.queries.keys.toSeq.sorted
    }

    // the listener records single-task stages down to threshold/2: the
    // main pass flags at the FULL threshold, but the warm re-audit must
    // also see the stage SHAPE — a genuine serialization whose warm
    // re-run lands just under the time threshold (JIT + page cache +
    // shuffle reuse all warm the second run, not just codegen) would
    // otherwise clear the gate on timing alone
    val listener = new SingleTaskListener(threshold / 2)
    val offenders = listener.offenders
    spark.sparkContext.addSparkListener(listener)

    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    def run(batch: Seq[String]): Unit = batch.foreach { name =>
      listener.current = name
      try graft.SparkEntry.queries(name)(spark, dir).count()
      catch { case e: Throwable =>
        failed += name
        println(s"[audit] $name FAILED: ${e.getMessage}")
      }
      // stage events arrive on the async listener bus — drain before the
      // label advances so none are attributed to the next query or lost
      // at exit
      ListenerBridge.drain(spark.sparkContext)
    }
    run(names)
    // RE-AUDIT pass (same defense as Bench's end-of-run re-time): the
    // main pass runs each query exactly once, COLD, so near-threshold
    // flags are often first-run JIT rather than plan shape (r18: a
    // one-file codec fixture read 2.31 cold, 1.20 warm). A flagged query
    // re-runs once in the now-warm session — a genuine serialization is
    // in the PLAN and persists; a JIT artifact disappears. Clearing is
    // SHAPE-checked, not purely timed (r18 ADVICE): warmth includes the
    // OS page cache and shuffle/broadcast reuse, so a real single-task
    // stage can dip under the threshold on the second run — the re-run
    // confirms at threshold/2, and only a flag whose re-run shows NO
    // single-task stage above even that is cleared. Only persisting
    // offenders fail the gate, and cleared flags are printed so the
    // adjudication is auditable, never silent.
    val flagged = offenders.synchronized {
      offenders.filter(_._3 > threshold).map(_._1).distinct.toSeq
    }
    if (flagged.nonEmpty) {
      offenders.synchronized(offenders.clear())
      run(flagged)
    }
    val persisting = offenders.synchronized {
      offenders.filter(o => flagged.contains(o._1)).toSeq
    }
    // a persisting single-task stage passes ONLY if it is on the
    // adjudicated-by-design list AND its warm figure stays under the
    // full threshold (see adjudicate — teeth retained and spec-pinned)
    val (known, confirmed) = adjudicate(persisting.toSeq, threshold)
    known.foreach { case (q, sid, s) =>
      println(f"[audit] adjudicated single-task shape $q stage=$sid " +
        f"singleTaskCoreSec=$s%.2f (by design: ${AdjudicatedSingleTask(q)})")
    }
    confirmed.foreach { case (q, sid, s) =>
      println(f"[audit] OFFENDER $q stage=$sid singleTaskCoreSec=$s%.2f" +
        (if (s <= threshold)
           " (warm re-run under the time threshold, but the single-task" +
             " shape persists above threshold/2 — not a JIT artifact;" +
             " if this 1-task shape is structural BY DESIGN, acknowledge" +
             " it with a reason on StageAudit.AdjudicatedSingleTask)"
         else ""))
    }
    flagged.filterNot(persisting.map(_._1).toSet).foreach { q =>
      println(s"[audit] cleared on warm re-audit (first-run JIT): $q")
    }
    if (failed.nonEmpty)
      println(s"[audit] INCOMPLETE: ${failed.size} queries failed to run " +
        s"(${failed.mkString(", ")}) — their stages were never audited")
    if (confirmed.isEmpty && failed.isEmpty)
      println(s"[audit] OK: no single-task stage over $threshold core-sec across " +
        s"${names.size} queries at $dir" +
        (if (flagged.nonEmpty)
           s" (${flagged.size} first-run flags cleared on warm re-audit)"
         else ""))
    spark.stop()
    if (confirmed.nonEmpty || failed.nonEmpty) sys.exit(1)
  }
}
