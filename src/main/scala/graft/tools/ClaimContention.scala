package graft.tools

import org.apache.spark.sql.functions._

/** Wall-clock multi-writer contention trial on a persisted dedup index
  * (VERDICT r16 directive #3): the slow-appender SPECS prove claim-
  * protocol data purity under latch-gated 800 ms windows; this tool
  * anchors the same guarantee OUTSIDE test-latch conditions — two real
  * concurrent appenders on one staged index, real Spark jobs, real
  * wall-clock, with one appender's mutation FORCED past the staleness
  * window (so only the claim heartbeat stands between it and a false
  * sweep by the contender's retry loop).
  *
  * Shape: a base index over a quarter of `documents`; appender A writes
  * a `factor`x-replicated slice (big enough that its append outruns the
  * window), appender B a 1x slice, concurrently, each retrying on the
  * protocol's loud busy refusal. The window is SELF-CALIBRATED to ~1/3
  * of a measured throwaway append of A's batch, so "mutation outlives
  * the window" holds by construction on any host speed. Success =
  * commits observed == appenders == 2, at least one of B's refusals
  * lands AFTER A's claim is older than the window (heartbeat-defended
  * territory — an unrefreshed claim would have been swept there), and
  * the final signature rows are EXACT: base + A + B, all ids distinct.
  *
  * Run: sbt "runMain graft.tools.ClaimContention [sfDir] [factor]".
  * Results recorded in PERFNOTES (round 17).
  */
object ClaimContention {

  private def replicate(df: org.apache.spark.sql.DataFrame, idCol: String,
                        factor: Int): org.apache.spark.sql.DataFrame =
    (0 until factor).map { k =>
      df.withColumn(idCol, col(idCol) + lit(k.toLong * 1000000000000L))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.core.GraftSession.builder("32", "32", rawLocalFs = true)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = graft.core.Tables(spark, base, "documents")
    val baseSlice = docs.where($"doc_id" % 4 === 0)
    val batchA = replicate(docs.where($"doc_id" % 4 === 1), "doc_id", factor)
    val batchB = docs.where($"doc_id" % 4 === 2)
    val (nBase, nA, nB) = (baseSlice.count(), batchA.count(), batchB.count())
    println(s"base=$nBase appenderA=${nA} (${factor}x) appenderB=$nB")

    val root = s"/tmp/graft_claim_contention_${System.nanoTime()}"
    def newIndex(dir: String): Unit =
      graft.sources.DedupIndex.save(baseSlice, "text", "doc_id", dir,
        shingleK = 8, numHashes = 8, bands = 4)

    // calibrate: how long does A's append take on THIS host? Two runs —
    // the first doubles as JIT/codegen warm-up, the SECOND (warm) figure
    // is what the real trial's append will actually take, and the window
    // is set to a quarter of it so the mutation outruns the window by
    // construction
    val calMs = (1 to 2).map { i =>
      val calDir = s"$root/cal$i"
      newIndex(calDir)
      val tc0 = System.nanoTime()
      graft.sources.DedupIndex.load(spark, calDir).append(batchA, "text")
      (System.nanoTime() - tc0) / 1000000L
    }.last
    val windowMs = math.max(1000L, calMs / 4)
    println(s"calibration: warm A-append=$calMs ms -> " +
      s"staleness window=$windowMs ms")

    // the real trial
    val idxDir = s"$root/idx"
    newIndex(idxDir)
    val aStart = new java.util.concurrent.atomic.AtomicLong(0L)
    val aDurMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val refusalsAfterWindow = new java.util.concurrent.atomic.AtomicInteger(0)
    val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
    val commits = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    def appender(name: String, batch: org.apache.spark.sql.DataFrame,
                 startDelayMs: Long, backoffMs: Long): Thread = {
      val t = new Thread(() => {
        try {
          Thread.sleep(startDelayMs)
          var done = false
          var tries = 0
          while (!done && tries < 300) {
            tries += 1
            val t0 = System.nanoTime()
            try {
              if (name == "A") aStart.set(System.currentTimeMillis())
              graft.sources.DedupIndex.load(spark, idxDir)
                .append(batch, "text", claimStaleness = windowMs)
              val ms = (System.nanoTime() - t0) / 1000000L
              if (name == "A") aDurMs.set(ms)
              commits.incrementAndGet()
              println(s"  appender $name committed in $ms ms (attempt $tries)")
              done = true
            } catch {
              case e: IllegalStateException
                  if e.getMessage.contains("another session is writing") ||
                     e.getMessage.contains("lost the writer-claim race") ||
                     e.getMessage.contains("stale index handle") =>
                refusals.incrementAndGet()
                // a refusal AFTER A's claim is older than the window is
                // the heartbeat's territory: an unrefreshed claim would
                // have been adjudicated stale and swept right here
                // margin of window/4 over aStart (set slightly BEFORE the
                // claim is actually taken — load runs first), so this
                // only counts refusals where the claim itself is
                // provably past the window
                if (aStart.get > 0 &&
                    System.currentTimeMillis() - aStart.get >
                      windowMs + windowMs / 4)
                  refusalsAfterWindow.incrementAndGet()
                Thread.sleep(backoffMs)
            }
          }
          if (!done) sys.error(s"appender $name never committed")
        } catch { case th: Throwable => errors.add(th) }
      }, s"appender-$name")
      t.start(); t
    }

    val t0 = System.currentTimeMillis()
    val a = appender("A", batchA, startDelayMs = 0L, backoffMs = windowMs / 8)
    val b = appender("B", batchB, startDelayMs = windowMs / 4,
      backoffMs = windowMs / 8)
    a.join(); b.join()
    val wallMs = System.currentTimeMillis() - t0
    errors.forEach(e => throw e)

    val idx = graft.sources.DedupIndex.load(spark, idxDir)
    val sigRows = idx.signatures.count()
    val sigIds = idx.signatures.select("doc_id").distinct().count()
    val expected = nBase + nA + nB
    println(s"final: nGens=${idx.nGens} sigRows=$sigRows " +
      s"distinctIds=$sigIds expected=$expected")
    require(commits.get == 2, s"commits=${commits.get}, want 2")
    require(idx.nGens == 3, s"nGens=${idx.nGens}, want 3 (save + 2 appends)")
    require(sigRows == expected && sigIds == expected,
      s"row purity violated: $sigRows rows / $sigIds ids vs $expected")
    require(aDurMs.get > windowMs,
      s"A's mutation (${aDurMs.get} ms) did not outrun the window " +
        s"($windowMs ms) — trial not meaningful, raise the factor")
    require(refusalsAfterWindow.get > 0,
      "B was never refused in heartbeat-defended territory — raise factor " +
        "or lower backoff")
    println(f"CLAIM_CONTENTION appenders=2 commits=${commits.get} " +
      f"refusals=${refusals.get} refusals_after_window=" +
      f"${refusalsAfterWindow.get} window_ms=$windowMs " +
      f"a_mutation_ms=${aDurMs.get} wall_ms=$wallMs rows_exact=true")
    graft.sources.BucketFs.deleteRecursive(root)
    spark.stop()
  }
}
