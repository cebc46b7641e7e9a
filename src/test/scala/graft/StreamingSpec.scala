package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.partitioning.LonLatPartitioning
import graft.sources.{BucketInfo, BucketReader}
import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def tmp(n: String) = {
    val p = Files.createTempDirectory(s"graft_stream_$n"); p.toFile.deleteOnExit(); p.toString
  }

  test("streaming sessionization with session_window + watermark") {
    val src = tmp("events")
    Seq(
      (1L, ts("2021-01-01 00:00:00")), (1L, ts("2021-01-01 00:10:00")),
      (1L, ts("2021-01-01 03:00:00")), (2L, ts("2021-01-01 00:05:00"))
    ).toDF("user_id", "time").write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema("user_id LONG, time TIMESTAMP").parquet(src)
    val sessions = StreamingOps.sessionize(stream, gap = "60 minutes",
      keyCols = Seq("user_id"))
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sess")
        .select($"user_id", $"n_events", $"first_event")
        .as[(Long, Long, Timestamp)].collect().toSet
      assert(got == Set(
        (1L, 2L, ts("2021-01-01 00:00:00")),
        (1L, 1L, ts("2021-01-01 03:00:00")),
        (2L, 1L, ts("2021-01-01 00:05:00"))))
    } finally q.stop()
  }

  test("custom-state sessionizer (flatMapGroupsWithState) closes on timeout") {
    import graft.streaming.StreamingOps.{KeyedEvent, SessionOut}
    val src = tmp("stateful")
    // two batches: first opens sessions, second advances the watermark far
    // enough to time them out
    Seq(KeyedEvent(1L, 1000L), KeyedEvent(1L, 2000L), KeyedEvent(2L, 5000L))
      .toDF().write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema("key LONG, eventTimeMs LONG")
      .parquet(src).as[KeyedEvent]
    val sessions = graft.streaming.StreamingOps.sessionizeWithState(
      stream, gapMs = 3000, watermark = "1 second")
    val q = sessions.writeStream.format("memory").queryName("state_sess")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // late batch far in the future → watermark passes the old sessions
      Seq(KeyedEvent(3L, 100000000L)).toDF().write.mode("append").parquet(src)
      q.processAllAvailable()
      // one more batch so timed-out state from the previous watermark emits
      Seq(KeyedEvent(3L, 100000001L)).toDF().write.mode("append").parquet(src)
      q.processAllAvailable()
      val got = spark.table("state_sess").as[SessionOut].collect()
        .map(s => s.key -> ((s.startMs, s.endMs, s.nEvents))).toMap
      assert(got(1L) == ((1000L, 2000L, 2L)))
      assert(got(2L) == ((5000L, 5000L, 1L)))
    } finally q.stop()
  }

  test("left-outer stream-stream interval join null-pads on watermark close") {
    val lsrc = tmp("ssj_left"); val rsrc = tmp("ssj_right")
    // left 1: match within range; left 2: right row OUTSIDE the 10-minute
    // range; left 3: no right row at all → 2 and 3 must null-pad
    Seq((1L, ts("2021-01-01 00:00:00")), (2L, ts("2021-01-01 01:00:00")),
        (3L, ts("2021-01-01 02:00:00")))
      .toDF("l_id", "l_ts").write.mode("overwrite").parquet(lsrc)
    Seq((1L, ts("2021-01-01 00:05:00")), (2L, ts("2021-01-01 01:30:00")))
      .toDF("r_id", "r_ts").write.mode("overwrite").parquet(rsrc)
    val left = spark.readStream.schema("l_id LONG, l_ts TIMESTAMP").parquet(lsrc)
    val right = spark.readStream.schema("r_id LONG, r_ts TIMESTAMP").parquet(rsrc)
    val joined = StreamingOps.streamIntervalJoin(left, right, "l_ts", "r_ts",
      watermark = "1 second",
      condition = col("l_id") === col("r_id") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr("interval 10 minutes"),
      joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // matched row emits immediately; unmatched left rows wait for the
      // watermark — push it past every match window, then one more batch
      // so the eviction-driven emission lands
      Seq((99L, ts("2021-01-02 00:00:00")))
        .toDF("l_id", "l_ts").write.mode("append").parquet(lsrc)
      Seq((99L, ts("2021-01-02 00:00:00")))
        .toDF("r_id", "r_ts").write.mode("append").parquet(rsrc)
      q.processAllAvailable()
      Seq((98L, ts("2021-01-02 00:00:01")))
        .toDF("l_id", "l_ts").write.mode("append").parquet(lsrc)
      Seq((98L, ts("2021-01-02 00:00:01")))
        .toDF("r_id", "r_ts").write.mode("append").parquet(rsrc)
      q.processAllAvailable()
      val got = spark.table("ssj_outer").where($"l_id" < 90)
        .select($"l_id", $"r_ts".isNull.as("padded"))
        .as[(Long, Boolean)].collect().toSet
      assert(got == Set((1L, false), (2L, true), (3L, true)))
    } finally q.stop()
  }

  test("streaming windowed KMV sketch matches the batch estimate") {
    val src = tmp("kmv_src")
    // 40 users in one hour window for key "a": exceeds k=16 → estimation
    // path; 3 users for "b": exact path
    val rows = (0 until 40).map(u => (u.toLong, "a", ts("2024-01-01 10:00:05"))) ++
      (0 until 3).map(u => (u.toLong, "b", ts("2024-01-01 10:00:06")))
    rows.toDF("user_id", "event_type", "ts").write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("user_id LONG, event_type STRING, ts TIMESTAMP").parquet(src)
    val sketched = StreamingOps.windowedDistinctSketch(stream,
      window_ = "1 hour", watermark = "1 minute", time = "ts",
      keyCols = Seq("event_type"),
      hashCol = graft.operators.Sketches.hash40($"user_id"), k = 16)
    val q = sketched.writeStream.format("memory").queryName("kmv_sk")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // watermark-advancing batch, then one more so the closed window emits
      Seq((999L, "z", ts("2024-01-02 10:00:00"))).toDF("user_id", "event_type", "ts")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      Seq((999L, "z", ts("2024-01-02 11:00:00"))).toDF("user_id", "event_type", "ts")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val streamed = spark.table("kmv_sk")
        .select($"event_type" +: graft.operators.Sketches.sketchSummary($"kmins", 16): _*)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      // batch recomputation over the same rows must agree bit-for-bit
      val batch = graft.operators.Sketches.distinctEstimate(
          rows.toDF("user_id", "event_type", "ts"), "event_type", "user_id", 16)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(streamed("a") == batch("a"))
      assert(streamed("b") == batch("b"))
      assert(streamed("b")._1 == 3L && streamed("b")._3 == 3L) // exact below k
      assert(streamed("a")._1 == 16L) // estimation path engaged
    } finally q.stop()
  }

  test("streaming windowed HLL registers match the batch build bit-for-bit") {
    val src = tmp("hll_src")
    val rows = (0 until 500).map(u => (u.toLong, "a", ts("2024-01-01 10:00:05"))) ++
      (0 until 3).map(u => (u.toLong, "b", ts("2024-01-01 10:00:06")))
    rows.toDF("user_id", "event_type", "ts").write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("user_id LONG, event_type STRING, ts TIMESTAMP").parquet(src)
    val (b, r) = graft.operators.Sketches.hllBucketRho($"user_id", 8)
    val sketched = StreamingOps.windowedHllSketch(stream,
      window_ = "1 hour", watermark = "1 minute", time = "ts",
      keyCols = Seq("event_type"), bucketCol = b, rhoCol = r, m = 256)
    val q = sketched.writeStream.format("memory").queryName("hll_sk")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      Seq((999L, "z", ts("2024-01-02 10:00:00"))).toDF("user_id", "event_type", "ts")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      Seq((999L, "z", ts("2024-01-02 11:00:00"))).toDF("user_id", "event_type", "ts")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val streamed = spark.table("hll_sk")
        .select($"event_type" +:
          graft.operators.Sketches.hllSummary($"regs", 256): _*)
        .collect().map(r0 => r0.getString(0) ->
          ((r0.getLong(1), r0.getLong(2), r0.getLong(3)))).toMap
      val batch = graft.operators.Sketches.hllDistinct(
          rows.toDF("user_id", "event_type", "ts"), "event_type", "user_id", 256)
        .collect().map(r0 => r0.getString(0) ->
          ((r0.getLong(1), r0.getLong(2), r0.getLong(3)))).toMap
      assert(streamed("a") == batch("a"), "500-distinct window must agree")
      assert(streamed("b") == batch("b"), "3-distinct window must agree")
      // 500 distinct at m=256: estimate within the ~6.5%·3 error band
      assert(math.abs(streamed("a")._3 - 500L) < 100L)
    } finally q.stop()
  }

  test("streaming funnel: buffered state reproduces the batch funnel chain") {
    import graft.streaming.StreamingOps.{FunnelEvent, funnelStage}
    // unit level: the chain over a buffer (order, window, missing steps)
    def us(m: Int) = m * 60000000L
    assert(funnelStage(Seq((0, us(0)), (1, us(10)), (2, us(20))), 3, us(60)) == 3)
    assert(funnelStage(Seq((1, us(0)), (0, us(5))), 3, us(60)) == 1,
      "step 1 before step 0 must not count")
    assert(funnelStage(Seq((0, us(0)), (1, us(30)), (2, us(90))), 3, us(60)) == 2,
      "step 2 outside the window of t1")
    assert(funnelStage(Seq((2, us(0))), 3, us(60)) == 0, "no step 0 -> stage 0")
    assert(funnelStage(Seq((0, us(0)), (1, us(60))), 3, us(60)) == 2,
      "closed upper boundary")
    // stream level: out-of-order batches, finalized by a late sentinel
    val src = tmp("funnel_src")
    val rows = Seq(
      (1L, 1, ts("2024-01-01 10:10:00")), // arrives before its step-0
      (1L, 0, ts("2024-01-01 10:00:00")),
      (1L, 2, ts("2024-01-01 10:20:00")),
      (2L, 0, ts("2024-01-01 10:00:00")),
      (2L, 2, ts("2024-01-01 10:10:00"))) // skips step 1
    rows.toDF("key", "step", "tsv")
      .write.mode("overwrite").parquet(src)
    val spark2 = spark
    import spark2.implicits._
    val stream = spark.readStream
      .schema("key LONG, step INT, tsv TIMESTAMP").parquet(src)
      .select($"key", $"step", unix_micros($"tsv").as("us"))
      .as[FunnelEvent]
    val q = graft.streaming.StreamingOps
      .funnelWithState(stream, 3, 3600000000L, "1 minute")
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      Seq((99L, -1, ts("2024-01-03 10:00:00"))).toDF("key", "step", "tsv")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      Seq((99L, -1, ts("2024-01-04 10:00:00"))).toDF("key", "step", "tsv")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val got = spark.table("funnel_out").where($"key" < 90)
        .as[(Long, Int)].collect().toMap
      assert(got == Map(1L -> 3, 2L -> 1),
        s"out-of-order buffer must still reach the right stages: $got")
    } finally q.stop()
  }

  test("model check: random streams, random batch splits — funnel ≡ batch replica") {
    import graft.streaming.StreamingOps.{FunnelEvent, funnelStage}
    val rnd = new scala.util.Random(1234)
    (1 to 2).foreach { trial =>
      val users = 1L to 6L
      val events = users.flatMap { u =>
        (1 to 3 + rnd.nextInt(6)).map { _ =>
          (u, rnd.nextInt(4) - 1, // steps -1..2 (-1 = irrelevant type)
            ts("2024-01-01 10:00:00").getTime * 1000L +
              rnd.nextInt(7200) * 1000000L)
        }
      }
      val expect = events.groupBy(_._1).map { case (u, evs) =>
        u -> funnelStage(evs.map(e => (e._2, e._3)), 3, 3600000000L)
      }
      // random split into ordered micro-batches
      val shuffled = rnd.shuffle(events)
      val nb = 2 + rnd.nextInt(3)
      val batches = shuffled.grouped(math.max(1, shuffled.size / nb)).toSeq
        .map(b => b.toDF("key", "step", "us")
          .select($"key", $"step", expr("timestamp_micros(us)").as("tsv"))) :+
        Seq((99L, -1, ts("2024-01-03 10:00:00"))).toDF("key", "step", "tsv") :+
        Seq((99L, -1, ts("2024-01-04 10:00:00"))).toDF("key", "step", "tsv")
      val src = tmp(s"funnel_mc_$trial")
      graft.streaming.StreamingOps.stageOrderedBatches(
        batches.map(_.select($"key", $"step", unix_micros($"tsv").as("us"))), src)
      val stream = spark.readStream
        .schema("key LONG, step INT, us LONG")
        .option("maxFilesPerTrigger", "1").parquet(src)
        .as[FunnelEvent]
      val q = graft.streaming.StreamingOps
        .funnelWithState(stream, 3, 3600000000L, "1 minute")
        .writeStream.format("memory").queryName(s"funnel_mc_out_$trial")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table(s"funnel_mc_out_$trial").where($"key" < 90)
          .as[(Long, Int)].collect().toMap
        assert(got == expect, s"trial $trial: $got vs $expect")
      } finally q.stop()
    }
  }

  test("funnel buffer compaction: exact prunes preserve the chain; hot key stays bounded") {
    import graft.streaming.StreamingOps.{compactFunnelBuf, funnelStage}
    val rnd = new scala.util.Random(77)
    // property: under the cap, compaction NEVER changes the chain result —
    // including when later batches bring an earlier step-0 (the prune's
    // monotonicity argument), simulated by compacting incrementally
    (1 to 50).foreach { trial =>
      val evs = (1 to 5 + rnd.nextInt(40)).map(_ =>
        (rnd.nextInt(5) - 1, rnd.nextLong(7200L) * 1000000L))
      val exact = funnelStage(evs, 3, 3600000000L)
      // feed in random chunks, compacting after each (the streaming shape)
      var steps = Seq.empty[Int]; var times = Seq.empty[Long]
      rnd.shuffle(evs).grouped(1 + rnd.nextInt(7)).foreach { chunk =>
        val r = compactFunnelBuf(steps ++ chunk.map(_._1),
          times ++ chunk.map(_._2), 3, 3600000000L, 10000)
        steps = r._1; times = r._2
      }
      assert(funnelStage(steps.zip(times), 3, 3600000000L) == exact,
        s"trial $trial: compaction changed the chain")
    }
    // hot key: 10^5 events for one key stay bounded at the cap — and the
    // exact prunes alone (dup collapse + window + step-0 min) do the work
    // here, so the stage is still exact
    val hotSteps = Seq.fill(100000)(rnd.nextInt(4) - 1)
    val hotTimes = hotSteps.map(_ => rnd.nextLong(7200L) * 1000000L)
    val exactHot = funnelStage(hotSteps.zip(hotTimes), 3, 3600000000L)
    val (cs, ct) = compactFunnelBuf(hotSteps, hotTimes, 3, 3600000000L, 10000)
    assert(cs.size <= 10000, s"hot-key buffer not bounded: ${cs.size}")
    assert(funnelStage(cs.zip(ct), 3, 3600000000L) == exactHot)
    // adversarial overflow (> cap DISTINCT in-window times): bounded, and
    // the earliest-per-step keep makes the result a LOWER bound
    val advSteps = Seq(0) ++ Seq.fill(30000)(1) ++ Seq.fill(30000)(2)
    val advTimes = Seq(0L) ++ (1 to 30000).map(_ * 10L) ++
      (1 to 30000).map(_ * 10L + 5L)
    val (as_, at_) = compactFunnelBuf(advSteps, advTimes, 3, 3600000000L, 1000)
    assert(as_.size <= 1001, s"adversarial buffer not bounded: ${as_.size}")
    assert(funnelStage(as_.zip(at_), 3, 3600000000L) <=
      funnelStage(advSteps.zip(advTimes), 3, 3600000000L))
  }

  test("mergeFunnelBuf ≡ from-scratch compaction under incremental feeds " +
       "(non-binding cap); binding stays bounded and conservative") {
    import graft.streaming.StreamingOps.{compactFunnelBuf, mergeFunnelBuf, funnelStage}
    val rnd = new scala.util.Random(131)
    (1 to 60).foreach { trial =>
      val evs = (1 to 5 + rnd.nextInt(60)).map(_ =>
        (rnd.nextInt(6) - 1, rnd.nextLong(7200L) * 1000000L))
      // incremental: merge random chunks into an initially-empty buffer
      var steps = Seq.empty[Int]; var times = Seq.empty[Long]
      rnd.shuffle(evs).grouped(1 + rnd.nextInt(9)).foreach { chunk =>
        val r = mergeFunnelBuf(steps, times,
          chunk.map(_._1), chunk.map(_._2), 4, 3600000000L, 10000)
        steps = r._1; times = r._2
      }
      // from-scratch: one compaction over the whole history
      val (fs_, ft_) = compactFunnelBuf(
        evs.map(_._1), evs.map(_._2), 4, 3600000000L, 10000)
      assert(steps.zip(times).sorted == fs_.zip(ft_).sorted,
        s"trial $trial: merge diverged from from-scratch compaction")
      assert(funnelStage(steps.zip(times), 4, 3600000000L) ==
        funnelStage(evs.map(e => (e._1, e._2)), 4, 3600000000L))
    }
    // binding: hot key fed incrementally stays bounded, result is a
    // lower bound of exact (the cap's conservative contract)
    val hot = (1 to 50000).map(_ =>
      (rnd.nextInt(4) - 1, rnd.nextLong(7200L) * 1000000L))
    var hs = Seq.empty[Int]; var ht = Seq.empty[Long]
    hot.grouped(5000).foreach { chunk =>
      val r = mergeFunnelBuf(hs, ht, chunk.map(_._1), chunk.map(_._2),
        3, 3600000000L, 500)
      hs = r._1; ht = r._2
    }
    assert(hs.size <= 501, s"hot-key merge buffer not bounded: ${hs.size}")
    assert(funnelStage(hs.zip(ht), 3, 3600000000L) <=
      funnelStage(hot, 3, 3600000000L))
  }

  test("mergeFunnelBuf re-normalizes a legacy encounter-order checkpoint " +
       "(pre-merge compactFunnelBuf state) instead of corrupting it") {
    import graft.streaming.StreamingOps.{compactFunnelBuf, funnelStage,
      isCanonicalFunnelBuf, mergeFunnelBuf}
    // the exact failure shape from the old run-scan assumption: prev holds
    // NON-CONTIGUOUS runs of the same step (1, 2, 1) with unsorted times —
    // the scan would overwrite the first step-1 run with the second
    // (dropping t=5, the only event that completes the chain) and
    // takeWhile on unsorted times would mis-window the rest
    val legacySteps = Seq(0, 1, 2, 1)
    val legacyTimes = Seq(0L, 5L, 12L, 40L)
    assert(!isCanonicalFunnelBuf(legacySteps, legacyTimes, 3))
    val (ms, mt) = mergeFunnelBuf(legacySteps, legacyTimes, Nil, Nil,
      3, 3600000000L, 10000)
    assert(isCanonicalFunnelBuf(ms, mt, 3), "output not canonical")
    assert(funnelStage(ms.zip(mt), 3, 3600000000L) ==
      funnelStage(legacySteps.zip(legacyTimes), 3, 3600000000L))
    assert(ms.zip(mt).toSet == legacySteps.zip(legacyTimes).toSet)
    // property: ANY legacy-order buffer (a shuffled compactFunnelBuf
    // output) resumed through mergeFunnelBuf with a fresh batch equals
    // the from-scratch compaction over the full history
    val rnd = new scala.util.Random(211)
    (1 to 40).foreach { trial =>
      val hist = (1 to 5 + rnd.nextInt(40)).map(_ =>
        (rnd.nextInt(5) - 1, rnd.nextLong(7200L) * 1000000L))
      val (cs, ct) = compactFunnelBuf(
        hist.map(_._1), hist.map(_._2), 3, 3600000000L, 10000)
      // simulate the old checkpoint layout: same kept multiset, encounter
      // (here: worst-case shuffled) order
      val legacy = rnd.shuffle(cs.zip(ct).toVector)
      val batch = (1 to 1 + rnd.nextInt(10)).map(_ =>
        (rnd.nextInt(5) - 1, rnd.nextLong(7200L) * 1000000L))
      val (rs, rt) = mergeFunnelBuf(legacy.map(_._1), legacy.map(_._2),
        batch.map(_._1), batch.map(_._2), 3, 3600000000L, 10000)
      val (es, et) = compactFunnelBuf(
        (hist ++ batch).map(_._1), (hist ++ batch).map(_._2),
        3, 3600000000L, 10000)
      assert(rs.zip(rt).sorted == es.zip(et).sorted,
        s"trial $trial: legacy resume diverged from from-scratch")
      assert(isCanonicalFunnelBuf(rs, rt, 3),
        s"trial $trial: resumed state not re-normalized")
    }
  }

  test("funnel cap BINDING: deterministic under-report shape " +
       "(earliest cap/nSteps kept per step)") {
    import graft.streaming.StreamingOps.{compactFunnelBuf, funnelStage}
    // cap = 9, nSteps = 3 → perStep = (9 − kept0) / 2 = 4 kept per step.
    // step 0 @ 0; the only step-1 event @ 10; step-2 events @ 1..8 (all
    // in-window but ≤ the step-1 time → unreachable) plus the one
    // qualifying step-2 @ 20. Exact chain: 0 → 10 → 20 = stage 3. The
    // overflow keep (earliest 4 per step) retains step-2 @ 1..4 and
    // drops @ 20 — kept-but-unreachable early events shadow the dropped
    // later one, and the capped chain under-reports stage 2: exactly the
    // documented trade for bounded state, pinned here shape-for-shape.
    val steps = Seq(0, 1) ++ Seq.fill(8)(2) ++ Seq(2)
    val times = Seq(0L, 10L) ++ (1L to 8L) ++ Seq(20L)
    assert(funnelStage(steps.zip(times), 3, 3600000000L) == 3)
    val (cs, ct) = compactFunnelBuf(steps, times, 3, 3600000000L, 9)
    val kept = cs.zip(ct)
    assert(kept.toSet ==
      Set((0, 0L), (1, 10L), (2, 1L), (2, 2L), (2, 3L), (2, 4L)),
      s"unexpected kept shape: $kept")
    assert(funnelStage(kept, 3, 3600000000L) == 2, "expected under-report")
    // the incremental merge path (what funnelWithState actually runs)
    // produces the identical binding shape from an empty buffer
    val (ms, mt) = graft.streaming.StreamingOps.mergeFunnelBuf(
      Nil, Nil, steps, times, 3, 3600000000L, 9)
    assert(ms.zip(mt).toSet == kept.toSet, "merge path diverged")
  }

  test("streaming funnel survives a 10^5-event hot key with bounded state") {
    import graft.streaming.StreamingOps.FunnelEvent
    val rnd = new scala.util.Random(101)
    val base = ts("2024-01-01 10:00:00").getTime * 1000L
    // hot key 7: 100k events in two batches; cold key 8: a clean 3-chain
    val hot = (1 to 100000).map(_ =>
      (7L, rnd.nextInt(4) - 1, base + rnd.nextLong(3600L) * 1000000L))
    val cold = Seq((8L, 0, base), (8L, 1, base + 60000000L),
      (8L, 2, base + 120000000L))
    // cold batch FIRST: the hot batches' max event time advances the
    // watermark an hour past the cold chain, which would drop it as late
    val batches = cold.toDF("key", "step", "us") +:
      hot.grouped(50000).toSeq.map(b => b.toDF("key", "step", "us")) :+
      Seq((99L, -1, ts("2024-01-03 10:00:00").getTime * 1000L))
        .toDF("key", "step", "us") :+
      Seq((99L, -1, ts("2024-01-04 10:00:00").getTime * 1000L))
        .toDF("key", "step", "us")
    val src = tmp("funnel_hot")
    graft.streaming.StreamingOps.stageOrderedBatches(batches, src)
    val stream = spark.readStream
      .schema("key LONG, step INT, us LONG")
      .option("maxFilesPerTrigger", "1").parquet(src)
      .as[FunnelEvent]
    val q = graft.streaming.StreamingOps
      .funnelWithState(stream, 3, 3600000000L, "1 minute",
        maxBufferedPerKey = 5000)
      .writeStream.format("memory").queryName("funnel_hot_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("funnel_hot_out").where($"key" < 90)
        .as[(Long, Int)].collect().toMap
      // the hot key's dense random stream reaches stage 3 with certainty
      // at this density even under compaction; the cold chain is exact
      val expectHot = graft.streaming.StreamingOps.funnelStage(
        hot.map(e => (e._2, e._3)), 3, 3600000000L)
      assert(got(8L) == 3, s"cold key wrong: $got")
      assert(got(7L) == expectHot, s"hot key wrong: $got vs $expectHot")
    } finally q.stop()
  }

  test("streaming windowed quantile sketch matches batch sample bit-for-bit") {
    val src = tmp("qsk_src")
    // key "a": 30 rows > k=8 → sampling regime; key "b": 3 rows → exact
    val rows = (0 until 30).map(u =>
      (u.toLong, "a", u * 1.5, ts("2024-01-01 10:00:05"))) ++
      (0 until 3).map(u => (u.toLong, "b", u * 10.0, ts("2024-01-01 10:00:06")))
    rows.toDF("user_id", "event_type", "value", "ts")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema("user_id LONG, event_type STRING, value DOUBLE, ts TIMESTAMP")
      .parquet(src)
    val sketched = StreamingOps.windowedQuantileSketch(stream,
      window_ = "1 hour", watermark = "1 minute", time = "ts",
      keyCols = Seq("event_type"),
      rowKey = xxhash64($"user_id", $"event_type"), valueCol = $"value", k = 8)
    val q = sketched.writeStream.format("memory").queryName("q_sk")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      Seq((999L, "z", 0.0, ts("2024-01-02 10:00:00")))
        .toDF("user_id", "event_type", "value", "ts")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      Seq((999L, "z", 0.0, ts("2024-01-02 11:00:00")))
        .toDF("user_id", "event_type", "value", "ts")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val streamed = spark.table("q_sk")
        .select($"event_type", $"qsketch")
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      val batch = rows.toDF("user_id", "event_type", "value", "ts")
        .groupBy($"event_type")
        .agg(graft.functions.QuantileSketch.quantileSketch(
          xxhash64($"user_id", $"event_type"), $"value", 8).as("s"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
      assert(streamed("a") == batch("a"), "sampling regime must be batching-invariant")
      assert(streamed("b") == batch("b"))
      assert(streamed("b") == Seq(0.0, 10.0, 20.0), "below-k group is the full sorted sample")
      assert(streamed("a").size == 8, "sampling regime fills k")
    } finally q.stop()
  }

  test("dedupIngest: sequential batches dedup against archive + earlier kept; replay is idempotent") {
    val base = tmp("sdedup")
    val inDir = s"$base/in"; val idxDir = s"$base/idx"
    val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    val archived = "the quick brown fox jumps over the lazy dog again and again"
    val novel0 = "entirely different content describing spark execution engines"
    val novel1 = "another unrelated row of words that shares nothing with others"
    graft.sources.DedupIndex.save(
      Seq((1L, archived)).toDF("doc_id", "text"), "text", "doc_id", idxDir,
      shingleK = 3, numHashes = 8, bands = 4)
    // batch 0: a dup of the archive + a novel doc; batch 1: a dup of the
    // doc batch 0 KEPT (only detectable if kept docs grew the index) + a
    // novel doc
    StreamingOps.stageOrderedBatches(Seq(
      Seq((10L, archived), (11L, novel0)).toDF("doc_id", "text"),
      Seq((20L, novel0), (21L, novel1)).toDF("doc_id", "text")), inDir)
    val schema = spark.read.parquet(s"$inDir/b0.parquet").schema
    def run(): Set[(Int, Long)] = {
      val q = StreamingOps.dedupIngest(spark, inDir, schema, idxDir, outDir,
          ckpt, "text", minMatch = 6, maxBucketSize = Int.MaxValue,
          maxFilesPerTrigger = Some(1))
        .start()
      try q.awaitTermination(120000) finally if (q.isActive) q.stop()
      spark.read.parquet(outDir).select($"batch", $"doc_id")
        .as[(Int, Long)].collect().toSet
    }
    val first = run()
    // 10 dups the archive; 20 dups batch 0's kept doc 11
    assert(first == Set((0, 11L), (1, 21L)))
    val grown = graft.sources.DedupIndex.load(spark, idxDir)
    assert(grown.nGens == 3) // base + one generation per batch
    // replay from scratch: lose the checkpoint, keep index + sink — every
    // batch re-fires, the generation guard must skip the appends and the
    // sink overwrites must converge to the identical state
    graft.sources.BucketFs.deleteRecursive(ckpt)
    assert(run() == first)
    val replayed = graft.sources.DedupIndex.load(spark, idxDir)
    assert(replayed.nGens == 3, "replay committed extra generations")
    assert(replayed.signatures.groupBy($"doc_id").count()
      .where($"count" > 1).count() == 0, "replay double-posted signatures")
  }

  test("textIndexIngest: streamed appends equal a one-shot build; replay is idempotent") {
    val base = tmp("stext")
    val inDir = s"$base/in"; val idxDir = s"$base/idx"; val ckpt = s"$base/ckpt"
    val all = Seq(
      0L -> "spark table scan fast table", 1L -> "merge table slow",
      2L -> "scan scan scan", 3L -> "nothing relevant here")
    graft.sources.TextIndex.save(
      all.take(2).toDF("doc_id", "text"), "text", "doc_id", idxDir, nBuckets = 8)
    StreamingOps.stageOrderedBatches(Seq(
      Seq(all(2)).toDF("doc_id", "text"),
      Seq(all(3)).toDF("doc_id", "text")), inDir)
    val schema = spark.read.parquet(s"$inDir/b0.parquet").schema
    def run(): Set[(Long, Int, Long)] = {
      val q = StreamingOps.textIndexIngest(spark, inDir, schema, idxDir, ckpt,
          "text", maxFilesPerTrigger = Some(1)).start()
      try q.awaitTermination(120000) finally if (q.isActive) q.stop()
      graft.sources.TextIndex.load(spark, idxDir)
        .search(Seq("table", "scan"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    }
    val streamed = run()
    assert(graft.sources.TextIndex.load(spark, idxDir).nGens == 3)
    // one-shot build over the same 4 docs must score identically
    val oneDir = s"$base/one"
    graft.sources.TextIndex.save(all.toDF("doc_id", "text"),
      "text", "doc_id", oneDir, nBuckets = 8)
    val oneShot = graft.sources.TextIndex.load(spark, oneDir)
      .search(Seq("table", "scan"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamed == oneShot)
    // checkpoint loss: every batch re-fires, the generation guard skips
    // the appends, and the index converges to the identical state
    graft.sources.BucketFs.deleteRecursive(ckpt)
    assert(run() == streamed)
    assert(graft.sources.TextIndex.load(spark, idxDir).nGens == 3,
      "replay committed extra generations")
    // a LATER stream (own source + checkpoint) over the same index must
    // append its batches, not inherit the first stream's pinned base and
    // silently skip them as "replayed"
    val in2 = s"$base/in2"; val ckpt2 = s"$base/ckpt2"
    StreamingOps.stageOrderedBatches(Seq(
      Seq(4L -> "brand new table content").toDF("doc_id", "text")), in2)
    val q2 = StreamingOps.textIndexIngest(spark, in2, schema, idxDir, ckpt2,
        "text", maxFilesPerTrigger = Some(1)).start()
    try q2.awaitTermination(120000) finally if (q2.isActive) q2.stop()
    val after2 = graft.sources.TextIndex.load(spark, idxDir)
    assert(after2.nGens == 4, "second stream's batch was silently skipped")
    assert(after2.search(Seq("table"), topK = 10)
      .collect().map(_.getLong(0)).toSet.contains(4L))
  }

  test("streaming bucket ingest: file source → partitioned bucket") {
    val src = tmp("granules")
    val bucket = tmp("bucket")
    val ckpt = tmp("ckpt")
    val p = LonLatPartitioning(size = (10, 10))
    OrbitFixture.standard(spark).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema

    val writer = StreamingOps.bucketIngest(spark, src, schema, bucket, p, ckpt)
    val q = writer.start()
    try q.awaitTermination(60000) finally if (q.isActive) q.stop()
    BucketInfo.write(bucket, p) // manifest (stream sink writes only data)

    val back = BucketReader.read(spark, bucket)
    assert(back.count() == 150)
    assert(back.columns.contains("lon_bin"))
  }
}
