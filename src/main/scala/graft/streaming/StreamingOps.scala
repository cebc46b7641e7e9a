package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.Row
import graft.partitioning.Partitioning2D

/** Structured Streaming extensions (SURVEY §2.9: the reference is batch-only;
  * these are the streaming analogues of its two incremental patterns —
  * gap sessionization (W1-W4 ≡ session_window) and incremental bucket
  * append (T8 ≡ file-sink partitioned append with checkpointing)).
  */
object StreamingOps {

  /** Streaming gap sessionization: session_window over event time with a
    * watermark — the exact streaming analogue of the batch overpass
    * detection (satbucket/analysis.py:41-94). Returns (keys…, session
    * start/end, n_events) in append mode once the watermark closes a
    * session. */
  def sessionize(events: DataFrame, gap: String = "60 minutes",
                 watermark: String = "2 hours",
                 time: String = "time",
                 keyCols: Seq[String] = Nil): DataFrame = {
    val keyed = events.withWatermark(time, watermark)
    val groupCols = session_window(col(time), gap).as("session") +:
      keyCols.map(col)
    keyed.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(time)).as("first_event"),
        max(col(time)).as("last_event"))
      .select((keyCols.map(col) :+ col("session.start").as("session_start") :+
        col("session.end").as("session_end") :+ col("n_events") :+
        col("first_event") :+ col("last_event")): _*)
  }

  /** Streaming tumbling-window rollup with watermark (W8 analogue).
    * `extraAggs` must be pre-aliased aggregate columns; they ride along
    * next to the count. */
  def windowedRollup(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours", time: String = "time",
                     keyCols: Seq[String] = Nil,
                     extraAggs: Seq[Column] = Nil): DataFrame = {
    events.withWatermark(time, watermark)
      .groupBy((window(col(time), window_).as("w") +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n"), extraAggs: _*)
      .withColumn("window_start", col("w.start"))
      .drop("w")
  }

  /** Streaming windowed distinct-count sketch: a KMV
    * [[graft.functions.KmvSketchAgg]] inside a watermarked tumbling-window
    * aggregation — per (window, keys), the ≤ k smallest distinct hashes of
    * `hashCol` accumulate across micro-batches in the state store (the
    * aggregate's serialize/merge path), and append mode emits each
    * window's final sketch once the watermark passes. The streaming
    * answer is BIT-IDENTICAL to the batch [[graft.operators.Sketches]]
    * estimate over the same rows (deterministic hash, order-free merge) —
    * the property HLL-based approx_count_distinct cannot give a
    * reconciliation job. State per open window is O(k) longs. */
  def windowedDistinctSketch(events: DataFrame, window_ : String,
                             watermark: String, time: String,
                             keyCols: Seq[String], hashCol: Column,
                             k: Int): DataFrame = {
    events.withWatermark(time, watermark)
      .withColumn("__hv", hashCol)
      .groupBy((window(col(time), window_).as("w") +: keyCols.map(col)): _*)
      .agg(graft.functions.KmvSketch.kMinValues(col("__hv"), k).as("kmins"))
      .withColumn("window_start", col("w.start"))
      .drop("w")
  }

  /** Streaming windowed HLL: the constant-memory distinct counter inside
    * a watermarked tumbling-window aggregation — per (window, keys)
    * exactly m register BYTES accumulate across micro-batches in the
    * state store (elementwise max, idempotent under replays), and append
    * mode emits each window's final registers once the watermark passes.
    * The fixed md5 bucket/rho split makes the streaming registers
    * BIT-IDENTICAL to a batch build over the same rows — any batching. */
  def windowedHllSketch(events: DataFrame, window_ : String,
                        watermark: String, time: String,
                        keyCols: Seq[String], bucketCol: Column,
                        rhoCol: Column, m: Int): DataFrame = {
    events.withWatermark(time, watermark)
      .withColumn("__b", bucketCol)
      .withColumn("__r", rhoCol)
      .groupBy((window(col(time), window_).as("w") +: keyCols.map(col)): _*)
      .agg(graft.functions.HllSketch.registers(col("__b"), col("__r"), m)
        .as("regs"))
      .withColumn("window_start", col("w.start"))
      .drop("w")
  }

  /** Streaming windowed heavy hitters: a Space-Saving
    * [[graft.functions.TopKSketchAgg]] inside a watermarked tumbling-
    * window aggregation — per (window, keys), at most `capacity` counters
    * accumulate across micro-batches in the state store, and append mode
    * emits each window's final (item, count, err) array once the
    * watermark passes. In the exact regime (capacity ≥ distinct items per
    * group) the streaming answer is BIT-IDENTICAL to the batch count —
    * merge is pointwise sum, order-free — so a reconciliation job can
    * hash-compare the two. State per open window is O(capacity) entries. */
  def windowedTopKSketch(events: DataFrame, window_ : String,
                         watermark: String, time: String,
                         keyCols: Seq[String], itemCol: Column,
                         capacity: Int): DataFrame = {
    events.withWatermark(time, watermark)
      .withColumn("__item", itemCol)
      .groupBy((window(col(time), window_).as("w") +: keyCols.map(col)): _*)
      .agg(graft.functions.TopKSketch.topK(col("__item"), capacity).as("hh"))
      .withColumn("window_start", col("w.start"))
      .drop("w")
  }

  /** Streaming windowed quantile sketch: the min-k row-sampling
    * [[graft.functions.QuantileSketchAgg]] inside a watermarked
    * tumbling-window aggregation — at most k (hash, value) pairs per
    * (window, keys) accumulate across micro-batches in the state store,
    * append mode emits each window's sample (ascending values) once the
    * watermark passes. The min-k rule is a commutative semilattice, so
    * the streamed sketch is BIT-IDENTICAL to a batch recomputation no
    * matter how the input batches — and exact (the sample IS the group)
    * whenever a group holds ≤ k rows. `rowKey` must be unique per event
    * (it seeds the sampling hash). State per open window is O(k). */
  def windowedQuantileSketch(events: DataFrame, window_ : String,
                             watermark: String, time: String,
                             keyCols: Seq[String], rowKey: Column,
                             valueCol: Column, k: Int): DataFrame = {
    events.withWatermark(time, watermark)
      .withColumn("__h", rowKey)
      .withColumn("__v", valueCol.cast("double"))
      .groupBy((window(col(time), window_).as("w") +: keyCols.map(col)): _*)
      .agg(graft.functions.QuantileSketch.quantileSketch(
        col("__h"), col("__v"), k).as("qsketch"))
      .withColumn("window_start", col("w.start"))
      .drop("w")
  }

  /** Stream-static enrichment: inner-join a stream against a broadcast
    * batch dimension — the lookup-table join of an ingest pipeline
    * (stateless: each micro-batch joins independently, so output is
    * batching-invariant; the dimension is re-read per batch, picking up
    * slowly-changing updates). */
  def enrich(stream: DataFrame, dim: DataFrame, joinExpr: Column): DataFrame =
    stream.join(broadcast(dim), joinExpr)

  /** Watermarked stream-stream join. `condition` must carry an
    * event-time range constraint between the two time columns — that
    * constraint plus the watermarks is what lets the engine BOUND the
    * join state (each side's buffered rows are evicted once the watermark
    * passes the range they could still match); without it state grows
    * forever. Inner-join matches emit as soon as both rows have arrived,
    * so the result is batching-invariant — equal to the batch join of the
    * full inputs.
    *
    * `joinType = "left_outer"` (or right/full) is the late-enrichment
    * shape: an unmatched row emits null-padded once the watermark CLOSES
    * its match window (state eviction), with the same state bound as the
    * inner join. Emission timing then depends on watermark progress — the
    * final CONTENT still equals the batch outer join, but a source that
    * never advances the watermark past a row's range keeps it buffered,
    * never emitted. In particular: if far-future sentinel rows drive the
    * watermark (the q101 gate pattern), they must flow THROUGH both
    * sides' withWatermark operators — a sentinel filtered out upstream
    * advances nothing. */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
                         leftTime: String, rightTime: String,
                         watermark: String, condition: Column,
                         joinType: String = "inner"): DataFrame =
    left.withWatermark(leftTime, watermark)
      .join(right.withWatermark(rightTime, watermark), condition, joinType)

  /** Streaming exact deduplication: first occurrence per key wins, state
    * carried across micro-batches. With no event-time column among the
    * keys, per-key state is retained for the stream's lifetime — exact
    * global dedup, right for bounded backfills. For unbounded streams at
    * scale, bound the state: include an event-time bucket in `keyCols`
    * (watermark then evicts closed buckets) or use Spark's
    * `dropDuplicatesWithinWatermark` when duplicates are known to arrive
    * within the watermark delay. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  time: String = null, watermark: String = null): DataFrame = {
    val bounded =
      if (time != null && watermark != null) events.withWatermark(time, watermark)
      else events
    bounded.dropDuplicates(keyCols)
  }

  /** Event for the custom-state sessionizer. */
  case class KeyedEvent(key: Long, eventTimeMs: Long)
  /** Session summary emitted when a custom-state session closes. */
  case class SessionOut(key: Long, startMs: Long, endMs: Long, nEvents: Long)
  /** Internal per-key state (public: Catalyst encoders codegen against it). */
  case class SessionState(startMs: Long, endMs: Long, n: Long)

  /** Custom-state sessionization via flatMapGroupsWithState — the
    * arbitrary-state alternative to session_window for semantics the
    * built-in can't express (e.g. per-key gap overrides, emitting partial
    * summaries). Sessions close on event-time timeout (watermark + gap)
    * and emit one summary row. */
  def sessionizeWithState(events: Dataset[KeyedEvent], gapMs: Long,
                          watermark: String = "30 seconds",
                          time: String = "eventTime"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val withTime = events
      .withColumn("eventTime", timestamp_millis(col("eventTimeMs")))
      .withWatermark("eventTime", watermark)
      .as[(Long, Long, java.sql.Timestamp)]

    withTime.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(key, s.startMs, s.endMs, s.n))
          } else {
            val times = rows.map(_._2).toSeq.sorted
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  cur = Some(s.copy(endMs = math.max(s.endMs, t), n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(key, s.startMs, s.endMs, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Event for the streaming funnel: (user key, 0-based step, unix us). */
  case class FunnelEvent(key: Long, step: Int, us: Long)
  /** Per-key buffered step events (public: Catalyst encodes it). */
  case class FunnelBuf(steps: Seq[Int], times: Seq[Long], maxUs: Long)
  /** Final per-user funnel result once the watermark closes the user. */
  case class FunnelOut(key: Long, stageReached: Int)

  /** Streaming ordered-step funnel via flatMapGroupsWithState: events
    * BUFFER per user until the event-time watermark passes the user's
    * last activity, then the exact batch funnel chain (earliest step-k
    * event strictly after step-(k−1), all within `withinUs` of step 1 —
    * Analysis.funnelSteps' semantics) runs over the sorted buffer and
    * one (user, stageReached) row is emitted. Buffering is the honest
    * cost of EXACT funnel semantics under out-of-order arrival — state
    * is bounded by per-user event volume inside the watermark horizon.
    * Same operating envelope as [[sessionizeWithState]]: a key is final
    * once the watermark passes its timeout (engineered-deterministic in
    * the AvailableNow gates via late sentinel rows).
    *
    * `maxBufferedPerKey` caps per-key state (skew guard for bot traffic /
    * replay storms). While the buffer stays under the cap the prunes are
    * EXACT; once the cap binds for a key, the earliest cap/nSteps events
    * per step are kept and the reported stage for that key becomes a
    * LOWER BOUND of the exact answer — never an over-report. One known
    * corner of that contract: an event dropped by the cap at a
    * micro-batch boundary is not resurrected if a LATER step-0 arrival
    * tightens the window enough that the buffer would have fit — also
    * strictly conservative (gated non-binding against the batch oracle
    * in q213; the binding under-report shape is pinned in
    * StreamingSpec). */
  def funnelWithState(events: Dataset[FunnelEvent], nSteps: Int,
                      withinUs: Long,
                      watermark: String = "30 seconds",
                      maxBufferedPerKey: Int = 10000): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val withTime = events
      .withColumn("eventTime", expr("timestamp_micros(us)"))
      .withWatermark("eventTime", watermark)
      .as[(Long, Int, Long, java.sql.Timestamp)]
    withTime.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelBuf, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[FunnelBuf]) =>
          if (state.hasTimedOut) {
            val b = state.get
            state.remove()
            Iterator(FunnelOut(key,
              funnelStage(b.steps.zip(b.times), nSteps, withinUs)))
          } else {
            val prev = state.getOption.getOrElse(FunnelBuf(Nil, Nil, 0L))
            val add = rows.map(r => (r._2, r._3)).toSeq
            // state is ALWAYS stored pre-compacted (mergeFunnelBuf's
            // output invariant), so each update is one sorted merge of
            // the new batch into the kept buffer — O(kept + new·log new)
            // — instead of re-grouping/sorting the whole history
            val (steps, times) = mergeFunnelBuf(
              prev.steps, prev.times, add.map(_._1), add.map(_._2),
              nSteps, withinUs, maxBufferedPerKey)
            val mx = math.max(prev.maxUs, add.map(_._2).max)
            state.update(FunnelBuf(steps, times, mx))
            // a group fed only WITHIN-watermark-late rows can see the
            // global watermark already past its own max event — a raw
            // mx-based timeout would then be rejected; clamp forward
            // (the rows themselves are still on time, by definition of
            // reaching the function at all)
            state.setTimeoutTimestamp(
              math.max(mx / 1000 + 1, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Per-key buffer compaction for the streaming funnel — the skew guard
    * that keeps a hot key (bot traffic, replay storms) from growing state
    * without bound while preserving exactness wherever possible. Four
    * prunes, the first three EXACT for [[funnelStage]]'s chain:
    *
    *  1. steps outside [0, nSteps) are dropped (the chain never reads
    *     them — they only had to reach the operator to advance maxUs,
    *     which is tracked separately);
    *  2. step 0 collapses to its MINIMUM time t1 (the chain only reads
    *     byStep(0).head, and the running min is monotone under late
    *     arrivals);
    *  3. events later than t1 + withinUs are dropped (t1 only DECREASES
    *     as more step-0 events arrive, so the window's upper bound only
    *     tightens — a pruned event can never become reachable). Events
    *     at-or-before t1 are NOT pruned: a later, smaller t1 could make
    *     them reachable;
    *  4. duplicates of an exact (step, time) pair collapse (the chain
    *     picks the earliest match > tk; a duplicate is never the answer
    *     twice).
    *
    * If the buffer STILL exceeds `cap` (adversarial: >cap distinct
    * timestamps inside one key's window), overflow policy: keep the
    * EARLIEST cap/nSteps times per step. This can under-report the stage
    * for that key (a kept-but-unreachable early event may shadow a
    * dropped later one) — the documented trade for bounded state; the
    * chain's greedy earliest-first choice makes the earliest events the
    * right ones to keep. */
  private[graft] def compactFunnelBuf(steps: Seq[Int], times: Seq[Long],
                                      nSteps: Int, withinUs: Long,
                                      cap: Int): (Seq[Int], Seq[Long]) = {
    val evs = steps.zip(times).filter(e => e._1 >= 0 && e._1 < nSteps)
    val zeroMin = evs.collect { case (0, t) => t } match {
      case s if s.nonEmpty => Some(s.min); case _ => None
    }
    val kept0 = zeroMin.map(t => (0, t)).toSeq
    val others = evs.filter(_._1 != 0).distinct
    val windowed = zeroMin match {
      case Some(t1) => others.filter(_._2 <= t1 + withinUs)
      case None => others
    }
    val bounded =
      if (kept0.size + windowed.size <= cap) windowed
      else {
        val perStep = math.max(1,
          (cap - kept0.size) / math.max(1, nSteps - 1))
        windowed.groupBy(_._1).toSeq.sortBy(_._1)
          .flatMap { case (_, es) => es.sortBy(_._2).take(perStep) }
      }
    val out = kept0 ++ bounded
    (out.map(_._1), out.map(_._2))
  }

  /** Incremental form of [[compactFunnelBuf]]: merge a NEW batch of
    * events into an ALREADY-COMPACTED buffer, maintaining the state
    * invariant (step 0 collapsed to its running min; non-zero steps
    * deduped, windowed, sorted ascending within each step) with ONE
    * two-pointer sorted merge per touched step — O(kept + new·log new)
    * per update for a hot key, vs the from-scratch compaction's
    * re-group-and-sort of the whole buffer every micro-batch.
    *
    * Equivalence contract (property-spec'd): starting from an empty
    * buffer, chained merges produce exactly the same kept multiset as
    * [[compactFunnelBuf]] over the concatenated history whenever the cap
    * never bound along the way — the three exact prunes are all
    * monotone-composable (running min of step 0; dedup; the window's
    * upper bound only tightens as t1 decreases, so a pruned event never
    * becomes reachable). When the cap DOES bind, keep-earliest-per-step
    * composes under increments (earliest-k of (earliest-k(A) ∪ B) =
    * earliest-k(A ∪ B), and the per-step k never grows once step 0
    * arrives) — except that a cap drop at a batch boundary is never
    * resurrected by a LATER step-0 arrival shrinking the window below
    * the cap; that corner under-reports exactly like the cap's
    * documented contract, strictly conservatively. */
  private[graft] def mergeFunnelBuf(prevSteps: Seq[Int], prevTimes: Seq[Long],
                                    addSteps: Seq[Int], addTimes: Seq[Long],
                                    nSteps: Int, withinUs: Long,
                                    cap: Int): (Seq[Int], Seq[Long]) =
    if (!isCanonicalFunnelBuf(prevSteps, prevTimes, nSteps))
      // CHECKPOINT COMPATIBILITY: the run-scan below requires `prev` in
      // the canonical order this function emits (step ascending, times
      // strictly ascending within each step, at most one step-0 entry).
      // A checkpoint written by the pre-merge compactFunnelBuf path
      // stored the buffer in ENCOUNTER order — resuming such state
      // through the scan would let a later run of a step overwrite an
      // earlier non-contiguous run of the same step (dropping events)
      // and mis-window unsorted times. Re-normalize ONCE by replaying
      // the old buffer as batch input against an empty buffer (the
      // prunes are idempotent, so re-applying them to already-pruned
      // state is exact); every later micro-batch takes the linear path.
      mergeFunnelBuf(Nil, Nil, prevSteps ++ addSteps, prevTimes ++ addTimes,
        nSteps, withinUs, cap)
    else mergeFunnelBufCanonical(prevSteps, prevTimes, addSteps, addTimes,
      nSteps, withinUs, cap)

  /** Does (steps, times) satisfy [[mergeFunnelBuf]]'s output invariant?
    * One linear pass: steps in [0, nSteps) and non-decreasing, at most
    * one step-0 entry, times strictly ascending within each step run.
    * Empty is canonical. */
  private[graft] def isCanonicalFunnelBuf(steps: Seq[Int], times: Seq[Long],
                                          nSteps: Int): Boolean = {
    val ss = steps.toIndexedSeq; val ts = times.toIndexedSeq
    var i = 0
    var ok = ss.length == ts.length
    while (ok && i < ss.length) {
      val s = ss(i)
      ok = s >= 0 && s < nSteps &&
        (i == 0 || (s > ss(i - 1) || (s == ss(i - 1) && s != 0 &&
          ts(i) > ts(i - 1))))
      i += 1
    }
    ok
  }

  private def mergeFunnelBufCanonical(
      prevSteps: Seq[Int], prevTimes: Seq[Long],
      addSteps: Seq[Int], addTimes: Seq[Long],
      nSteps: Int, withinUs: Long, cap: Int): (Seq[Int], Seq[Long]) = {
    val addEvs = addSteps.zip(addTimes).filter(e => e._1 >= 0 && e._1 < nSteps)
    // by invariant prev holds at most ONE step-0 entry (the running min)
    val prevZero = prevSteps.zip(prevTimes).collect { case (0, t) => t }
    val addZero = addEvs.collect { case (0, t) => t }
    val zeroMin = (prevZero ++ addZero) match {
      case s if s.nonEmpty => Some(s.min); case _ => None
    }
    val bound = zeroMin.map(t => t + withinUs)
    // prev is stored ordered (step asc, time asc within step), so ONE
    // linear run-scan splits it per step — no hashing of the kept buffer
    // on every micro-batch
    val prevBy = Array.fill(nSteps)(Seq.empty[Long])
    locally {
      val ps = prevSteps.toIndexedSeq; val pt = prevTimes.toIndexedSeq
      var i = 0
      while (i < ps.length) {
        val s0 = ps(i)
        var j = i + 1
        while (j < ps.length && ps(j) == s0) j += 1
        if (s0 > 0 && s0 < nSteps) prevBy(s0) = pt.slice(i, j)
        i = j
      }
    }
    val addBy = addEvs.filter(_._1 != 0)
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val kept0 = zeroMin.map(t => (0, t)).toSeq
    val windowedBy = (1 until nSteps).map { k =>
      val merged = mergeSortedDistinct(prevBy(k), addBy.getOrElse(k, Nil))
      // sorted ascending → the (possibly newly tightened) window bound
      // is a prefix cut
      bound match {
        case Some(b) => merged.takeWhile(_ <= b); case None => merged
      }
    }
    val total = kept0.size + windowedBy.iterator.map(_.size).sum
    val keptBy =
      if (total <= cap) windowedBy
      else {
        val perStep = math.max(1,
          (cap - kept0.size) / math.max(1, nSteps - 1))
        // per-step runs are already time-ascending: keep-earliest = take
        windowedBy.map(_.take(perStep))
      }
    val out = kept0 ++ keptBy.zipWithIndex.flatMap { case (ts, i) =>
      ts.map(t => (i + 1, t)) }
    (out.map(_._1), out.map(_._2))
  }

  /** Two-pointer merge of two ascending-sorted sequences, dropping
    * duplicates (both within and across inputs). */
  private def mergeSortedDistinct(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val av = a.toIndexedSeq; val bv = b.toIndexedSeq
      val out = new scala.collection.mutable.ArrayBuffer[Long](av.length + bv.length)
      var i = 0; var j = 0
      while (i < av.length || j < bv.length) {
        val v =
          if (j >= bv.length || (i < av.length && av(i) <= bv(j))) {
            val x = av(i); i += 1; x
          } else { val x = bv(j); j += 1; x }
        if (out.isEmpty || out.last != v) out += v
      }
      out.toSeq
    }

  /** The batch funnel chain over one user's buffered (step, us) events:
    * stage k is reached at the EARLIEST step-k event strictly after the
    * stage-(k−1) time, no later than t1 + withinUs. */
  private[graft] def funnelStage(evs: Seq[(Int, Long)], nSteps: Int,
                                     withinUs: Long): Int = {
    val byStep = evs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byStep.get(0).map(_.head) match {
      case None => 0
      case Some(t1) =>
        var reached = 1
        var tk = t1
        var k = 1
        var stuck = false
        while (k < nSteps && !stuck) {
          byStep.get(k).flatMap(_.find(t => t > tk && t <= t1 + withinUs)) match {
            case Some(t) => tk = t; reached = k + 1; k += 1
            case None => stuck = true
          }
        }
        reached
    }
  }

  /** Stage `batches` as one parquet file each under `inDir` (`b0.parquet`,
    * `b1.parquet`, …), mtime-spaced a minute apart, so a file source with
    * `maxFilesPerTrigger=1` processes them as micro-batches in exactly
    * this order (FileStreamSource batches in mtime order) — the
    * determinism idiom every staged streaming gate and spec relies on. */
  def stageOrderedBatches(batches: Seq[DataFrame], inDir: String): Unit = {
    import graft.sources.BucketFs
    require(batches.nonEmpty, "stageOrderedBatches needs at least one batch")
    // the batch order is derived from the FULL directory listing below,
    // so leftovers from a previous staging would silently replay as
    // extra batches — the helper owns the clean-directory precondition
    BucketFs.deleteRecursive(inDir)
    val tmp = s"${inDir}_stage_tmp" // sibling: never visible to the source
    batches.zipWithIndex.foreach { case (b, k) =>
      BucketFs.deleteRecursive(tmp)
      b.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$inDir/b$k.parquet")
      dst.getParentFile.mkdirs()
      require(part.renameTo(dst), s"staging rename failed for batch $k")
      BucketFs.deleteRecursive(tmp)
    }
    val files = new java.io.File(inDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    files.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(((files.head.lastModified() / 60000L) * 60000L)
        + i * 60000L)
    }
  }

  /** Shared replay-idempotence core of the index-growth streams: pin the
    * index's generation count at stream START to `sidecarPath`, so batch
    * `k` owns generation `base + k` across checkpoint restarts; a
    * micro-batch whose generation is already committed is skipped (the
    * index's atomic manifest commit decides), which upgrades
    * foreachBatch's at-least-once to exactly-once observable behavior.
    * The sidecar must be scoped to THIS stream — it has to SURVIVE
    * checkpoint loss (a replay after ckpt deletion must keep the original
    * base, or re-fired batches would re-append) but not leak to a later,
    * different stream over the same index (which would silently skip its
    * batches as "replayed"). `apply` gets the batch's single freshly
    * loaded index view. */
  private def genGuardedBatches[I](sidecarPath: String, load: () => I,
      gensOf: I => Int)(apply: (I, DataFrame, Long) => Unit)
      : (Dataset[Row], Long) => Unit = {
    import graft.sources.BucketFs
    val baseGens =
      if (BucketFs.exists(sidecarPath))
        BucketFs.readString(sidecarPath).trim.toInt
      else {
        val g = gensOf(load())
        BucketFs.writeStringAtomic(sidecarPath, s"$g\n")
        g
      }
    (batch: Dataset[Row], batchId: Long) => {
      val idx = load()
      val target = baseGens + batchId
      if (gensOf(idx) <= target) {
        require(gensOf(idx) == target,
          s"generation gap: index at ${gensOf(idx)}, batch $batchId " +
            s"expects $target — was the index mutated outside the stream?")
        apply(idx, batch.toDF(), batchId)
      } // else: replayed, already-committed batch — idempotent skip
      ()
    }
  }

  /** Continuous DEDUPLICATED ingest against a persisted MinHash index —
    * the production shape of corpus dedup: today's crawl streams in,
    * every micro-batch keeps only documents that near-duplicate neither
    * the archived corpus nor any earlier kept batch, kept rows land in a
    * per-batch output directory AND grow the index (so later batches
    * dedup against them). The batch path is
    * [[graft.sources.DedupIndex.MinHashIndex.newDocsToKeep]]; this wires
    * it into `foreachBatch` with REPLAY-IDEMPOTENT commits:
    *
    *  - the index's generation counter at stream START is pinned to a
    *    sidecar (`outDir/_base_gens`), so batch `k` owns generation
    *    `base + k` across checkpoint restarts;
    *  - a replayed batch whose generation is already committed skips the
    *    append (the atomic manifest commit decides), and its sink write
    *    is an overwrite of its OWN `batch=k` directory — both effects
    *    idempotent, which upgrades foreachBatch's at-least-once to
    *    exactly-once observable behavior;
    *  - sink-before-append ordering: a crash between the two replays
    *    into an overwrite + a swept-debris append, never a double.
    *
    * Every batch commits a generation (even an all-duplicates one), so
    * the batch↔generation mapping never drifts. Caller starts/stops the
    * returned writer; read `outDir` back for (batch, kept rows). */
  def dedupIngest(spark: SparkSession, sourceDir: String,
                  schema: org.apache.spark.sql.types.StructType,
                  indexDir: String, outDir: String, checkpointDir: String,
                  textCol: String, minMatch: Int,
                  maxBucketSize: Int = 1024,
                  maxFilesPerTrigger: Option[Int] = None): DataStreamWriter[Row] = {
    import graft.sources.DedupIndex
    // the per-stream outDir scopes the sidecar to this stream's lifetime
    val guarded = genGuardedBatches(s"$outDir/_base_gens",
      () => DedupIndex.load(spark, indexDir), (i: DedupIndex.MinHashIndex) =>
        i.nGens) { (idx, batch, batchId) =>
      // fused path: one minhash pass serves lookup + append; the sink
      // write happens before the generation commit (see ingest)
      idx.ingest(batch, textCol, minMatch, maxBucketSize) { kept =>
        kept.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      ()
    }
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(m => reader.option("maxFilesPerTrigger", m))
    reader.parquet(sourceDir)
      .writeStream
      .foreachBatch(guarded)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
  }

  /** Continuous BM25 text-index growth: each micro-batch of new
    * documents appends into the persisted [[graft.sources.TextIndex]] —
    * the lexical sibling of [[dedupIngest]]'s index growth, on the same
    * [[genGuardedBatches]] replay-idempotent commit scheme. The sidecar
    * is keyed by the CHECKPOINT path (`_stream_base_gens_<ckpt-hash>` in
    * `indexDir`), so a later stream with its own checkpoint gets a fresh
    * base instead of silently skipping its batches, while a replay of
    * THIS stream (same checkpoint path, even after checkpoint loss)
    * keeps the pinned base; `TextIndex.save` sweeps the sidecars on
    * rebuild. Batch ids must be new across the whole stream
    * (TextIndex.append's id screen applies per batch). Caller
    * starts/stops the returned writer. */
  def textIndexIngest(spark: SparkSession, sourceDir: String,
                      schema: org.apache.spark.sql.types.StructType,
                      indexDir: String, checkpointDir: String,
                      textCol: String,
                      maxFilesPerTrigger: Option[Int] = None)
      : DataStreamWriter[Row] = {
    import graft.sources.TextIndex
    val sidecar = s"$indexDir/_stream_base_gens_" +
      Integer.toHexString(checkpointDir.hashCode)
    val guarded = genGuardedBatches(sidecar,
      () => TextIndex.load(spark, indexDir), (i: TextIndex.Bm25Index) =>
        i.nGens) { (idx, batch, _) => idx.append(batch, textCol); () }
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(m => reader.option("maxFilesPerTrigger", m))
    reader.parquet(sourceDir)
      .writeStream
      .foreachBatch(guarded)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
  }

  /** Streaming model-based quality filtering — the production shape of
    * the classifier pass: tail a JSONL directory, parse + quarantine
    * each micro-batch ([[graft.sources.Jsonl]] semantics), score the
    * valid documents with a PERSISTED Naive Bayes model
    * ([[graft.sources.TextModelStore]], loaded once — the model is
    * read-only so no generation guard is needed), keep positive scorers,
    * and land them in per-batch sink directories (`batch=N` overwrite →
    * checkpoint replay is idempotent). Scoring aggregates per document,
    * which streaming append mode can't express — hence foreachBatch,
    * where each micro-batch is a plain batch frame. Caller starts/stops
    * the returned writer. */
  def qualityFilterIngest(spark: SparkSession, sourceDir: String,
                          schema: org.apache.spark.sql.types.StructType,
                          modelDir: String, outDir: String,
                          checkpointDir: String, idCol: String,
                          textCol: String,
                          maxFilesPerTrigger: Option[Int] = None)
      : DataStreamWriter[Row] = {
    val model = graft.sources.TextModelStore.loadNaiveBayes(spark, modelDir)
    val fn: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      val valid = graft.sources.Jsonl.valid(batch.toDF())
      graft.operators.TextAnalysis
        .naiveBayesScore(valid, idCol, textCol, model)
        .where(col("pred_pos"))
        .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      ()
    }
    graft.sources.Jsonl.readStream(spark, sourceDir, schema,
        maxFilesPerTrigger)
      .writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
  }

  /** Continuous bucket ingest: stream granule rows (file source) into a
    * spatially partitioned bucket — the streaming version of
    * write_granules_bucket: same layout, exactly-once via checkpoint.
    * Caller starts/stops the returned writer. */
  def bucketIngest(spark: SparkSession, sourceDir: String,
                   schema: org.apache.spark.sql.types.StructType,
                   bucketDir: String, p: Partitioning2D,
                   checkpointDir: String,
                   x: String = "lon", y: String = "lat"): DataStreamWriter[Row] = {
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val staged = stream.where(p.validCoords(col(x), col(y)))
      .withColumn("__xi", p.xIndexCol(col(x)))
      .withColumn("__yi", p.yIndexCol(col(y)))
    val labeled = p.labelsByIndices(col("__xi"), col("__yi"))
      .foldLeft(staged) { case (d, (n, c)) => d.withColumn(n, c) }
      .drop("__xi", "__yi")
    labeled.writeStream
      .format("parquet")
      .option("path", bucketDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy(p.order: _*)
      .trigger(Trigger.AvailableNow())
  }
}
