package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wall-clock multi-writer contention trials on the persisted artifact
  * families (VERDICT r16 directive #3): the slow-appender SPECS prove
  * claim-protocol data purity under latch-gated 800 ms windows; this
  * tool anchors the same guarantee OUTSIDE test-latch conditions — two
  * real concurrent appenders per artifact, real Spark jobs, real
  * wall-clock, with one appender's mutation FORCED past the staleness
  * window (so only the claim heartbeat stands between it and a false
  * sweep by the contender's retry loop).
  *
  * Three families, covering both claim flavors: the MinHash dedup index
  * and the BM25 text index (per-generation claim slots) and the IVF-PQ
  * ANN index (whole-dir claim — it excludes in-place deletes too). Per
  * family: a base artifact, appender A with a `factor`x-replicated
  * slice (big enough that its append outruns the window), appender B
  * with a 1x slice, concurrently, each retrying on the protocol's loud
  * busy/stale-handle refusal. The window is SELF-CALIBRATED to 1/4 of a
  * measured warm throwaway append of A's batch, so "mutation outlives
  * the window" holds by construction on any host speed. Success per
  * family = commits observed == appenders == 2, at least one of B's
  * refusals lands AFTER A's claim is provably older than the window
  * (heartbeat-defended territory — an unrefreshed claim would have been
  * swept there), and the final row/doc counts are EXACT: base + A + B.
  *
  * Run: sbt "runMain graft.tools.ClaimContention [sfDir] [factor]
  * [families] [store]" (families comma-separated from dedup,text,ann;
  * default all three). `store` = `local` (default) or `mocks3` — the
  * latter roots the artifacts on the raw-S3A-semantics test filesystem
  * ([[graft.MockS3Fs]]: copy+delete renames with fresh mtimes,
  * check-then-act create, no setTimes, so the heartbeats run their
  * rewrite fallback under REAL concurrency); that mode needs the test
  * classpath: sbt "Test/runMain graft.tools.ClaimContention ...".
  * Results recorded in PERFNOTES (rounds 17-18).
  */
object ClaimContention {

  private def replicate(df: DataFrame, idCol: String, factor: Int): DataFrame =
    (0 until factor).map { k =>
      df.withColumn(idCol, col(idCol) + lit(k.toLong * 1000000000000L))
    }.reduce(_ unionByName _)

  /** One family's wiring: stage the base artifact at `dir`, append a
    * batch under a given staleness window, and assert final purity
    * given the expected total row count. */
  private case class Family(name: String, batchA: DataFrame,
                            batchB: DataFrame, nBase: () => Long,
                            stage: String => Unit,
                            append: (String, DataFrame, Long) => Unit,
                            purity: (String, Long) => String)

  private def families(spark: SparkSession, base: String, factor: Int)
      : Map[String, Family] = {
    import spark.implicits._
    val docs = graft.core.Tables(spark, base, "documents")
    val emb = graft.core.Tables(spark, base, "embeddings")

    val dedup = {
      val baseSlice = docs.where($"doc_id" % 4 === 0)
      Family("dedup",
        batchA = replicate(docs.where($"doc_id" % 4 === 1), "doc_id", factor),
        batchB = docs.where($"doc_id" % 4 === 2),
        nBase = () => baseSlice.count(), // deferred: only selected families pay
        stage = dir => graft.sources.DedupIndex.save(
          baseSlice, "text", "doc_id", dir,
          shingleK = 8, numHashes = 8, bands = 4),
        append = (dir, batch, w) => {
          graft.sources.DedupIndex.load(spark, dir)
            .append(batch, "text", claimStaleness = w); ()
        },
        purity = (dir, expected) => {
          val idx = graft.sources.DedupIndex.load(spark, dir)
          val rows = idx.signatures.count()
          val ids = idx.signatures.select("doc_id").distinct().count()
          require(idx.nGens == 3, s"nGens=${idx.nGens}, want 3")
          require(rows == expected && ids == expected,
            s"dedup purity violated: $rows rows / $ids ids vs $expected")
          s"nGens=3 sigRows=$rows distinctIds=$ids"
        })
    }

    val text = {
      val baseSlice = docs.where($"doc_id" % 4 === 0)
      Family("text",
        batchA = replicate(docs.where($"doc_id" % 4 === 1), "doc_id", factor),
        batchB = docs.where($"doc_id" % 4 === 2),
        nBase = () => baseSlice.count(), // deferred: only selected families pay
        stage = dir => graft.sources.TextIndex.save(
          baseSlice, "text", "doc_id", dir, nBuckets = 16),
        append = (dir, batch, w) => {
          graft.sources.TextIndex.load(spark, dir)
            .append(batch, "text", claimStaleness = w); ()
        },
        purity = (dir, expected) => {
          val idx = graft.sources.TextIndex.load(spark, dir)
          require(idx.nGens == 3, s"nGens=${idx.nGens}, want 3")
          require(idx.nDocs == expected,
            s"text purity violated: nDocs=${idx.nDocs} vs $expected")
          s"nGens=3 nDocs=${idx.nDocs}"
        })
    }

    val ann = {
      val baseSlice = emb.where($"vec_id" % 4 === 0)
      Family("ann",
        batchA = replicate(emb.where($"vec_id" % 4 === 1), "vec_id",
          factor * 4), // vectors are cheaper to append than text: 4x more
        batchB = emb.where($"vec_id" % 4 === 2),
        nBase = () => baseSlice.count(), // deferred: only selected families pay
        stage = dir => graft.sources.AnnIndex.saveIvfPq(
          baseSlice, "vec_id", "embedding", dir,
          dims = 64, m = 4, k = 16, nList = 8),
        append = (dir, batch, w) => {
          graft.sources.AnnIndex.loadIvfPq(spark, dir)
            .append(batch, "embedding", claimStaleness = w); ()
        },
        purity = (dir, expected) => {
          val idx = graft.sources.AnnIndex.loadIvfPq(spark, dir)
          val ids = idx.codes.select("vec_id").distinct().count()
          require(idx.nGens == 3, s"nGens=${idx.nGens}, want 3")
          require(ids == expected,
            s"ann purity violated: $ids distinct ids vs $expected")
          s"nGens=3 distinctIds=$ids"
        })
    }

    Map("dedup" -> dedup, "text" -> text, "ann" -> ann)
  }

  private def runTrial(spark: SparkSession, f: Family, root: String)
      : String = {
    val nBase = f.nBase()
    val (nA, nB) = (f.batchA.count(), f.batchB.count())
    println(s"[${f.name}] base=$nBase appenderA=$nA appenderB=$nB")

    // calibrate: two runs — the first doubles as JIT/codegen warm-up,
    // the SECOND (warm) figure is what the real trial's append will
    // take, and the window is a quarter of it so the mutation outruns
    // the window by construction
    val calMs = (1 to 2).map { i =>
      val calDir = s"$root/${f.name}_cal$i"
      f.stage(calDir)
      val tc0 = System.nanoTime()
      f.append(calDir, f.batchA, GenerationLock_DefaultStaleness)
      (System.nanoTime() - tc0) / 1000000L
    }.last
    val windowMs = math.max(1000L, calMs / 4)
    println(s"[${f.name}] calibration: warm A-append=$calMs ms -> " +
      s"window=$windowMs ms")

    val idxDir = s"$root/${f.name}_idx"
    f.stage(idxDir)
    val aStart = new java.util.concurrent.atomic.AtomicLong(0L)
    val aDurMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val refusalsAfterWindow = new java.util.concurrent.atomic.AtomicInteger(0)
    val refusals = new java.util.concurrent.atomic.AtomicInteger(0)
    val commits = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    def appender(name: String, batch: DataFrame, startDelayMs: Long,
                 backoffMs: Long): Thread = {
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
              f.append(idxDir, batch, windowMs)
              val ms = (System.nanoTime() - t0) / 1000000L
              if (name == "A") aDurMs.set(ms)
              commits.incrementAndGet()
              println(s"  [${f.name}] appender $name committed in $ms ms " +
                s"(attempt $tries)")
              done = true
            } catch {
              case e: IllegalStateException
                  // null-guard like the IAE branch below: a null-message
                  // ISE must fall through as a real error, not NPE out
                  // of the guard and kill the appender thread with a
                  // misleading failure
                  if e.getMessage != null &&
                     (e.getMessage.contains("another session is writing") ||
                     e.getMessage.contains("lost the writer-claim race") ||
                     // the nonce read-back arbitration on check-then-act
                     // stores (rawLocalFs here): both "created", the
                     // loser's post-create verify refuses — a retryable
                     // loss, same as lost-race
                     e.getMessage.contains("no longer held") ||
                     e.getMessage.contains("stale index handle") ||
                     e.getMessage.contains("head moved")) =>
                refusals.incrementAndGet()
                // margin of window/4 over aStart (set slightly BEFORE
                // the claim is actually taken — load runs first), so
                // this only counts refusals where the claim itself is
                // provably past the window: heartbeat-defended territory
                // where an unrefreshed claim would have been swept
                if (aStart.get > 0 &&
                    System.currentTimeMillis() - aStart.get >
                      windowMs + windowMs / 4)
                  refusalsAfterWindow.incrementAndGet()
                Thread.sleep(backoffMs)
              case e: IllegalArgumentException
                  if e.getMessage != null &&
                     e.getMessage.contains("stale") =>
                refusals.incrementAndGet(); Thread.sleep(backoffMs)
            }
          }
          if (!done) sys.error(s"appender $name never committed")
        } catch { case th: Throwable => errors.add(th) }
      }, s"${f.name}-appender-$name")
      t.start(); t
    }

    val t0 = System.currentTimeMillis()
    val a = appender("A", f.batchA, startDelayMs = 0L,
      backoffMs = windowMs / 8)
    val b = appender("B", f.batchB, startDelayMs = windowMs / 4,
      backoffMs = windowMs / 8)
    a.join(); b.join()
    val wallMs = System.currentTimeMillis() - t0
    errors.forEach(e => throw e)

    val expected = nBase + nA + nB
    val purity = f.purity(idxDir, expected)
    require(commits.get == 2, s"commits=${commits.get}, want 2")
    require(aDurMs.get > windowMs,
      s"A's mutation (${aDurMs.get} ms) did not outrun the window " +
        s"($windowMs ms) — trial not meaningful, raise the factor")
    require(refusalsAfterWindow.get > 0,
      "B was never refused in heartbeat-defended territory — raise " +
        "factor or lower backoff")
    val row = s"CLAIM_CONTENTION family=${f.name} appenders=2 " +
      s"commits=${commits.get} refusals=${refusals.get} " +
      s"refusals_after_window=${refusalsAfterWindow.get} " +
      s"window_ms=$windowMs a_mutation_ms=${aDurMs.get} wall_ms=$wallMs " +
      s"expected=$expected $purity rows_exact=true"
    println(row)
    row
  }

  private val GenerationLock_DefaultStaleness =
    graft.sources.GenerationLock.DefaultStalenessMs

  /** Beat-format long-life check (r19 stretch #8), mocks3 only (no
    * setTimes, so every heartbeat REWRITES the claim with a `beat=<k>`
    * line): the beat counter is a per-acquisition AtomicLong from 0 —
    * assert a claim re-acquired after release starts a FRESH counter,
    * and that the two incarnations' contents still differ by NONCE line
    * even where their beat numbers could coincide (the stale sweep's
    * full-content identity re-check distinguishes incarnations across
    * acquisitions, not just rewrites within one). First incarnation
    * beats ~4 ticks, second ~1, so a counter that carried over would
    * read k2 > k1's first ticks and fail the k2 < k1 assertion. */
  private def beatIncarnationCheck(root: String): String = {
    import graft.sources.{BucketFs, GenerationLock}
    val dir = s"$root/beat_incarnation"
    val claimFile = s"$dir/_writer_claim"
    val staleness = 1600L // beat period = staleness/4 = 400 ms
    def parse(s: String): (String, Long) = {
      val lines = s.split('\n')
      (lines.head,
        lines.find(_.startsWith("beat=")).map(_.drop(5).toLong).getOrElse(0L))
    }
    // Poll the claim file until the beat line reaches a TARGET count
    // instead of sleeping a fixed interval (r20 ADVICE: this runner
    // suffers minutes-scale steal bursts that can delay the heartbeat
    // thread arbitrarily — fixed 1900/700 ms sleeps made the diagnostic
    // throw spuriously even though the per-acquisition counter contract
    // held). Generous 30 s deadline, then the usual loud failure.
    def awaitBeat(target: Long, what: String): String = {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var content = BucketFs.readString(claimFile)
      while (parse(content)._2 < target && System.nanoTime() < deadline) {
        Thread.sleep(100)
        content = BucketFs.readString(claimFile)
      }
      require(parse(content)._2 >= target,
        s"$what never reached rewrite-beat $target " +
          s"(k=${parse(content)._2}) — is this store really setTimes-less?")
      content
    }
    val c1 = GenerationLock.claimDir(dir, staleness)
    // first incarnation: let it beat well clear of the restart floor, so
    // the k2 < k1 restart assertion below has margin even if the second
    // read is delayed by one beat
    val content1 = awaitBeat(3, "first incarnation")
    GenerationLock.release(c1)
    val c2 = GenerationLock.claimDir(dir, staleness)
    // second incarnation: read at its FIRST observed beat — a restarted
    // counter is caught low, a carried-over counter reads >= k1
    val content2 = awaitBeat(1, "re-acquired incarnation")
    GenerationLock.release(c2)
    val (n1, k1) = parse(content1)
    val (n2, k2) = parse(content2)
    require(n1 == c1.nonce && n2 == c2.nonce,
      "claim content's nonce line does not match the acquiring session")
    require(k2 >= 1 && k2 < k1,
      s"re-acquired claim did not restart its beat counter: k1=$k1 k2=$k2")
    require(n1 != n2 && content1 != content2,
      "incarnations not distinguished by nonce line")
    val row = s"BEAT_INCARNATION store=mocks3 k1=$k1 k2=$k2 " +
      "fresh_counter=true nonce_distinct=true"
    println(row)
    row
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val which = args.lift(2).map(_.split(',').map(_.trim).toSet)
      .getOrElse(Set("dedup", "text", "ann"))
    val store = args.lift(3).getOrElse("local")
    require(store == "local" || store == "mocks3",
      s"store must be local|mocks3, got $store")
    val builder = graft.core.GraftSession.builder("32", "32", rawLocalFs = true)
    // the class is on the TEST classpath (it is a test fixture) — this
    // mode is run via Test/runMain; a plain runMain fails loudly at the
    // first FS resolve, which is the right failure
    if (store == "mocks3")
      builder.config("spark.hadoop.fs.mocks3.impl", "graft.MockS3Fs")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val localRoot = s"/tmp/graft_claim_contention_${System.nanoTime()}"
    val root =
      if (store == "mocks3") s"mocks3:$localRoot" else localRoot
    val fams = families(spark, base, factor)
    val rows = which.toSeq.sorted.map(n => runTrial(spark, fams(n), root)) ++
      (if (store == "mocks3") Seq(beatIncarnationCheck(root)) else Nil)
    println("=== all trials ===")
    rows.foreach(println)
    graft.sources.BucketFs.deleteRecursive(root)
    spark.stop()
  }
}
