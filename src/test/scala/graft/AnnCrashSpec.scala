package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{AnnIndex, BucketFs}

/** Crash-injection property test for AnnIndex.delete's per-cell swap
  * window (live → aside → move-in → drop-aside). A "kill" is injected at
  * each step via AnnIndex.deleteSwapHook; the assertions are the commit
  * protocol's contract:
  *   - the index is LOADABLE after the crash (repairDeleteAsides rolls
  *     forward on load);
  *   - no id is ever lost that wasn't tombstoned, and none duplicated
  *     (either-copy-complete at every instant);
  *   - a retried delete(ids) converges to the exact end state;
  *   - a present aside fences as-of history (the mutation might have
  *     landed without its manifest fence).
  */
class AnnCrashSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // every crash here is a SIMULATED kill — the writer is dead by
  // construction, so the reader-side staleness guard (which protects a
  // LIVE writer's swap window from a racing repair) is waived PER CALL
  // via loadIvfPq's repairStaleness parameter (no global state: other
  // suites in this JVM keep the production default); the
  // concurrent-reader test below loads with the default to assert the
  // guard itself

  private val allIds = (0L until 48L)
  private val delIds = Seq(1L, 2L, 40L, 41L)

  private def freshIndex(tag: String): String = {
    val rnd = new scala.util.Random(31)
    val vecs = allIds.map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f)).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory(s"annidx_crash_$tag").toString
    AnnIndex.saveIvfPq(vecs.where($"vec_id" < 32),
      "vec_id", "embedding", dir, dims = 8, m = 2, k = 4, nList = 4)
    AnnIndex.loadIvfPq(spark, dir)
      .append(vecs.where($"vec_id" >= 32), "embedding")
    dir
  }

  private def survivors(dir: String): Seq[Long] =
    AnnIndex.loadIvfPq(spark, dir, repairStaleness = 0L).codes
      .select($"vec_id").as[Long].collect().toSeq

  private case object Kill extends RuntimeException("injected crash")

  /** Crash at `point` on the `nth` hook firing of that point, then assert
    * the protocol contract and that a retry converges. */
  private def crashAt(point: String, nth: Int): Unit = {
    val dir = freshIndex(s"${point}_$nth")
    try {
      var seen = 0
      AnnIndex.deleteSwapHook = (p, _, _) =>
        if (p == point) { seen += 1; if (seen == nth) throw Kill }
      val idx = AnnIndex.loadIvfPq(spark, dir)
      try intercept[Kill.type](idx.delete(delIds))
      finally AnnIndex.deleteSwapHook = (_, _, _) => ()

      // loadable after the crash; either-copy-complete: every id either
      // survived intact or was a tombstone target — never lost, never
      // duplicated
      val after = survivors(dir)
      assert(after.size == after.distinct.size, "duplicated ids after crash")
      val lost = allIds.filterNot(delIds.contains)
        .filterNot(after.contains)
      assert(lost.isEmpty, s"non-tombstoned ids lost: $lost")

      // mutation debris (an aside that was repaired) must fence as-of
      // history; pre-crash points leave history intact. Either way the
      // HEAD load above already succeeded — here we only require that a
      // repair never UNfences: once fenced, asOf=1 is refused.
      // retry converges to the exact end state (staleness waived: the
      // crashed writer's marker is fresh but the writer is dead)
      val end = AnnIndex.loadIvfPq(spark, dir, repairStaleness = 0L)
        .delete(delIds)
      assert(end.codes.select($"vec_id").as[Long].collect().toSet ==
        allIds.toSet -- delIds)
      val e = intercept[IllegalArgumentException](
        AnnIndex.loadIvfPq(spark, dir, asOfGen = 1))
      assert(e.getMessage.contains("in-place delete"))
      // the repaired index still answers searches
      val q = Seq(7L -> Array.fill(8)(0.1f)).toDF("vec_id", "embedding")
      assert(end.search(q, "embedding", topK = 3).count() > 0)
    } finally BucketFs.deleteRecursive(dir)
  }

  for (point <- Seq("beforeAside", "afterAside", "afterMoveIn"); nth <- Seq(1, 2))
    test(s"delete swap crash at $point (occurrence $nth) recovers") {
      crashAt(point, nth)
    }

  // crash BETWEEN the tmp rewrite and the swap loop: marker + fence +
  // complete tmp on disk, zero asides — repair must sweep forward to a
  // loadable pre-delete state and a retry must converge
  test("delete crash after the tmp rewrite (before any swap) recovers") {
    crashAt("afterTmpWrite", 1)
  }

  test("concurrent reader during the TMP-WRITE window refuses loudly " +
       "(marker covers the whole mutation, not just the swap loop)") {
    // the round-13 ordering wrote the marker AFTER the tmp rewrite job;
    // a reader landing in that window saw tmp-only debris with no
    // marker, swept codes_rewrite_tmp, and the live writer's swap loop
    // then read every affected cell as "emptied entirely" and dropped
    // the asides — losing all surviving rows in those cells. The marker
    // now lands FIRST, so the reader must be refused here too.
    val dir = freshIndex("tmpwin")
    try {
      var refused = 0
      AnnIndex.deleteSwapHook = (p, _, _) =>
        if (p == "afterTmpWrite") {
          val e = intercept[IllegalStateException](
            AnnIndex.loadIvfPq(spark, dir))
          assert(e.getMessage.contains("delete() may be in progress"))
          // the refused reader must NOT have swept the live writer's tmp
          assert(BucketFs.exists(s"$dir/codes_rewrite_tmp"),
            "reader swept the live writer's rewrite tmp")
          refused += 1
        }
      val end =
        try AnnIndex.loadIvfPq(spark, dir).delete(delIds)
        finally AnnIndex.deleteSwapHook = (_, _, _) => ()
      assert(refused == 1, "the tmp-write window never exercised the reader")
      // the writer completed untouched: exactly the survivors remain
      assert(end.codes.select($"vec_id").as[Long].collect().toSet ==
        allIds.toSet -- delIds)
      assert(!BucketFs.exists(s"$dir/${AnnIndex.DeleteMarkerFile}"))
    } finally BucketFs.deleteRecursive(dir)
  }

  test("concurrent reader during the swap window refuses loudly (no double-move)") {
    val dir = freshIndex("conc")
    try {
      // the writer below is LIVE, so these reads run with the PRODUCTION
      // default staleness guard (no parameter override)
      var refused = 0
      AnnIndex.deleteSwapHook = (p, _, _) =>
        if (p == "afterAside") {
          // a reader loading mid-swap must fail loudly, not "repair"
          // concurrently with the writer's own moves
          val e = intercept[IllegalStateException](
            AnnIndex.loadIvfPq(spark, dir))
          assert(e.getMessage.contains("delete() may be in progress"))
          refused += 1
        }
      val end =
        try AnnIndex.loadIvfPq(spark, dir).delete(delIds)
        finally AnnIndex.deleteSwapHook = (_, _, _) => ()
      assert(refused > 0, "the swap window never exercised the reader")
      // the writer's own delete completed untouched by the refused reads
      assert(end.codes.select($"vec_id").as[Long].collect().toSet ==
        allIds.toSet -- delIds)
      assert(!BucketFs.exists(s"$dir/${AnnIndex.DeleteMarkerFile}"))
    } finally BucketFs.deleteRecursive(dir)
  }

  test("tmp-only delete debris (no asides) is fenced and swept on load") {
    // crash window: tmp written, fence committed, swap loop never ran —
    // no aside exists, but the leftover codes_rewrite_tmp alone must be
    // treated as repair evidence (swept + fence asserted), not ignored
    val dir = freshIndex("tmponly")
    try {
      val before = survivors(dir).toSet
      val (fs, tmp) = BucketFs.resolve(s"$dir/codes_rewrite_tmp/gen=0/cell=0")
      BucketFs.mkdirs(fs, tmp)
      val reloaded = AnnIndex.loadIvfPq(spark, dir)
      assert(!BucketFs.exists(s"$dir/codes_rewrite_tmp"),
        "leftover rewrite tmp not swept")
      assert(reloaded.codes.select($"vec_id").as[Long].collect().toSet
        == before)
      // debris proves an interrupted delete: history is fenced
      val e = intercept[IllegalArgumentException](
        AnnIndex.loadIvfPq(spark, dir, asOfGen = 1))
      assert(e.getMessage.contains("in-place delete"))
    } finally BucketFs.deleteRecursive(dir)
  }

  test("repairDeleteAsides is a no-op listing on a clean index") {
    val dir = freshIndex("clean")
    try {
      val before = survivors(dir).toSet
      AnnIndex.repairDeleteAsides(dir)
      assert(survivors(dir).toSet == before)
      // clean path must NOT fence history: gen 1 still loadable
      assert(AnnIndex.loadIvfPq(spark, dir, asOfGen = 1).codes.count() == 32)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("compactGens: pre-vacuum crash debris below baseGen is invisible and swept") {
    val dir = freshIndex("cmp")
    try {
      val compacted = AnnIndex.loadIvfPq(spark, dir).compactGens()
      val want = survivors(dir).toSet
      // simulate a crash BETWEEN the manifest commit and the vacuum: a
      // stale pre-compaction generation reappears below baseGen
      val stale = s"$dir/codes/gen=0"
      BucketFs.deleteRecursive(stale)
      val (fs, src) = BucketFs.resolve(s"$dir/codes/gen=${compacted.baseGen}")
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
        new org.apache.hadoop.fs.Path(stale), false, BucketFs.conf)
      // readers filter gen >= baseGen: the debris is invisible
      assert(survivors(dir).toSet == want)
      // the next compaction's vacuum sweeps it
      AnnIndex.loadIvfPq(spark, dir).compactGens()
      assert(!BucketFs.exists(stale), "stale generation not vacuumed")
      assert(survivors(dir).toSet == want)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("compactGens(vacuum = false): reader grace, then vacuumOldGens " +
       "retires the superseded generations") {
    val dir = freshIndex("vac") // already gens [0, 2): save + append
    try {
      val pre = AnnIndex.loadIvfPq(spark, dir)
      val want = survivors(dir).toSet
      val preCodes = pre.codes.count()
      val compacted = pre.compactGens(vacuum = false)
      assert(compacted.baseGen == 2 && compacted.nGens == 3)
      def gens = new java.io.File(s"$dir/codes").listFiles()
        .map(_.getName).filter(_.startsWith("gen=")).toSet
      assert(gens == Set("gen=0", "gen=1", "gen=2"), s"got $gens")
      // the pre-compact handle still reads its generations (grace)
      assert(pre.codes.count() == preCodes)
      assert(survivors(dir).toSet == want)
      val after = compacted.vacuumOldGens()
      assert(gens == Set("gen=2"), s"got $gens")
      assert(survivors(dir).toSet == want)
      assert(after.codes.count() == preCodes)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("delete heartbeat: the liveness marker stays FRESH through a tmp " +
       "rewrite longer than the staleness window, and is retired after") {
    val dir = freshIndex("heartbeat")
    try {
      val marker = s"$dir/${AnnIndex.DeleteMarkerFile}"
      def markerMtime(): Long = {
        val (fs, p) = BucketFs.resolve(marker)
        fs.getFileStatus(p).getModificationTime
      }
      // simulate a rewrite job that outlives a (tiny) staleness window:
      // pause after the tmp write for several heartbeat periods and
      // assert a reader adjudicating NOW would still see a live writer —
      // the marker's age stays under the window because the beat
      // refreshes its mtime, even though the delete started long before
      val stalenessMs = 300L
      var freshDuringRewrite = false
      var absentSeen = false
      var rewriteSeen = false
      AnnIndex.deleteSwapHook = (p, _, _) =>
        if (p == "afterTmpWrite") {
          val t0 = markerMtime()
          // poll through ~18 beat periods: the refresh is fs.setTimes IN
          // PLACE, so the marker must never be absent (a rewrite-based
          // beat commits by rename, whose replace-existing fallback
          // opens a marker-ABSENT window on HDFS-semantics stores) and
          // no writeStringAtomic tmp sibling may ever appear
          val tmpSibling = s"$dir/.${AnnIndex.DeleteMarkerFile}.tmp"
          val deadline = System.currentTimeMillis() + 3 * stalenessMs
          while (System.currentTimeMillis() < deadline) {
            if (!BucketFs.exists(marker)) absentSeen = true
            if (BucketFs.exists(tmpSibling)) rewriteSeen = true
            Thread.sleep(5)
          }
          freshDuringRewrite =
            System.currentTimeMillis() - markerMtime() < stalenessMs
          assert(markerMtime() > t0,
            "heartbeat never refreshed the marker mtime")
        }
      try AnnIndex.loadIvfPq(spark, dir).delete(delIds,
        markerHeartbeatMs = 50L)
      finally AnnIndex.deleteSwapHook = (_, _, _) => ()
      assert(freshDuringRewrite,
        "marker went stale mid-rewrite: a racing reader would have " +
          "adjudicated the live writer as crashed and swept its tmp dir")
      assert(!absentSeen,
        "marker vanished mid-beat: a reader listing the root in that " +
          "window sees tmp debris with no marker and sweeps the live " +
          "writer's rewrite")
      assert(!rewriteSeen,
        "beat rewrote the marker (writeStringAtomic tmp sibling seen) " +
          "instead of refreshing its mtime in place")
      // the beat is stopped BEFORE the marker is retired — no phantom
      // writer left behind
      assert(!BucketFs.exists(marker), "marker not retired after delete")
      assert(survivors(dir).toSet == allIds.toSet -- delIds)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("concurrent sessions: the writer claim serializes appends — " +
       "second session fails loudly, never co-writes a generation") {
    val rnd = new scala.util.Random(47)
    val vecs = (0L until 64L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f)).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("annidx_cc").toString
    try {
      AnnIndex.saveIvfPq(vecs.where($"vec_id" < 32),
        "vec_id", "embedding", dir, dims = 8, m = 2, k = 4, nList = 4)
      // two INDEPENDENT SparkSessions each load the same head (nGens = 1)
      val sA = spark.newSession(); val sB = spark.newSession()
      val hA = AnnIndex.loadIvfPq(sA, dir)
      val hB = AnnIndex.loadIvfPq(sB, dir)
      assert(hA.nGens == 1 && hB.nGens == 1)
      // A appends and commits generation 1
      val grownA = hA.append(
        vecs.where($"vec_id" >= 32 && $"vec_id" < 48), "embedding")
      assert(grownA.nGens == 2)
      // B's handle is now stale; without the claim-then-recheck ordering
      // B would sweep A's COMMITTED gen 1 as debris and co-write it —
      // silently double-posting codes. The claim re-check reports the
      // moved head instead.
      val eStale = intercept[IllegalArgumentException](
        hB.append(vecs.where($"vec_id" >= 48), "embedding"))
      assert(eStale.getMessage.contains("stale index handle"))
      // B's refused attempt must not have disturbed A's committed codes
      assert(survivors(dir).toSet == (0L until 48L).toSet)
      // a LIVE claim held by another writer refuses the second session
      // loudly before any mutation. The slot is WHOLE-DIR (one mutex for
      // append/compactGens/delete): this index has an in-place mutator,
      // so every mutator pair must exclude, not just same-generation
      // appends
      val claim = s"$dir/_writer_claim"
      BucketFs.writeString(claim, "")
      val eClaim = intercept[IllegalStateException](
        AnnIndex.loadIvfPq(sB, dir).append(
          vecs.where($"vec_id" >= 48), "embedding"))
      assert(eClaim.getMessage.contains("another session is writing"))
      // delete is refused by the SAME live claim — append-vs-delete is
      // the manifest-last-writer-wins race the whole-dir slot closes
      val eDel = intercept[IllegalStateException](
        AnnIndex.loadIvfPq(sB, dir).delete(Seq(0L)))
      assert(eDel.getMessage.contains("another session is writing"))
      // a STALE claim (dead writer) is swept and the append proceeds
      val grownB = AnnIndex.loadIvfPq(sB, dir).append(
        vecs.where($"vec_id" >= 48), "embedding", claimStaleness = 0L)
      assert(grownB.nGens == 3)
      assert(!BucketFs.exists(claim), "claim not released")
      // serialized end state: every id present exactly once
      val ids = survivors(dir)
      assert(ids.size == ids.distinct.size, "a generation was co-written")
      assert(ids.toSet == (0L until 64L).toSet)
      // compactGens takes the same claim
      BucketFs.writeString(claim, "")
      val eCmp = intercept[IllegalStateException](
        AnnIndex.loadIvfPq(spark, dir).compactGens())
      assert(eCmp.getMessage.contains("another session is writing"))
      BucketFs.deleteRecursive(claim)
      assert(AnnIndex.loadIvfPq(spark, dir).compactGens().nGens == 4)
      assert(survivors(dir).toSet == (0L until 64L).toSet)
      // delete under no contention proceeds and releases its claim
      val afterDel = AnnIndex.loadIvfPq(spark, dir).delete(Seq(63L))
      assert(survivors(dir).toSet == (0L until 63L).toSet)
      assert(!BucketFs.exists(claim), "delete did not release the claim")
      assert(afterDel.nGens == 4)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("repair re-stats the marker before acting on marker-less debris: " +
       "a marker landing after the listing is honored (listing-vs-beat " +
       "race guard)") {
    val dir = freshIndex("restat")
    try {
      val marker = s"$dir/${AnnIndex.DeleteMarkerFile}"
      // stage tmp-only debris with NO marker in the listing; the hook
      // plants a FRESH marker between the listing and the re-stat — the
      // exact interleave a live writer's beat produces on stores where
      // the beat falls back to rewriting the marker (setTimes
      // unsupported: the rewrite's rename fallback briefly removes it)
      BucketFs.writeString(s"$dir/codes_rewrite_tmp/part-0", "debris")
      AnnIndex.repairListHook =
        () => BucketFs.writeString(marker, "delete in progress")
      try {
        val e = intercept[IllegalStateException](
          AnnIndex.repairDeleteAsides(dir))
        assert(e.getMessage.contains("may be in progress"))
      } finally AnnIndex.repairListHook = () => ()
      // the live writer's tmp dir was NOT swept
      assert(BucketFs.exists(s"$dir/codes_rewrite_tmp/part-0"),
        "repair swept a live writer's tmp dir")
      // once the marker is genuinely stale the repair proceeds
      val (fs, p) = BucketFs.resolve(marker)
      val old = System.currentTimeMillis() - 60 * 60 * 1000L
      fs.setTimes(p, old, old)
      AnnIndex.repairDeleteAsides(dir)
      assert(!BucketFs.exists(s"$dir/codes_rewrite_tmp"))
      assert(!BucketFs.exists(marker))
      assert(survivors(dir).toSet == allIds.toSet)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("repair runs as a WRITER: a mutator's claim taken after the " +
       "repair's listing refuses the repair before it can sweep") {
    val dir = freshIndex("repairclaim")
    try {
      // stale debris from a long-dead writer (marker backdated past the
      // window) — adjudication alone says "safe to sweep"
      BucketFs.writeString(s"$dir/codes_rewrite_tmp/part-0", "debris")
      BucketFs.writeString(s"$dir/${AnnIndex.DeleteMarkerFile}", "dead")
      val (mfs, mp) = BucketFs.resolve(s"$dir/${AnnIndex.DeleteMarkerFile}")
      val old = System.currentTimeMillis() - 60 * 60 * 1000L
      mfs.setTimes(mp, old, old)
      // a NEW delete() claims the index between the repair's listing and
      // its sweep — the exact interleave where a marker-only guard would
      // let the repair destroy the new writer's upcoming rewrite. The
      // repair must hit the writer claim and refuse LOUDLY, leaving the
      // debris alone.
      AnnIndex.repairListHook =
        () => BucketFs.writeString(s"$dir/_writer_claim", "mutator-nonce")
      try {
        val e = intercept[IllegalStateException](
          AnnIndex.repairDeleteAsides(dir))
        assert(e.getMessage.contains("another session is writing"))
      } finally AnnIndex.repairListHook = () => ()
      assert(BucketFs.exists(s"$dir/codes_rewrite_tmp/part-0"),
        "repair swept debris despite a live writer claim")
      // writer done (claim released): the repair proceeds and rolls
      // forward
      BucketFs.deleteRecursive(s"$dir/_writer_claim")
      AnnIndex.repairDeleteAsides(dir)
      assert(!BucketFs.exists(s"$dir/codes_rewrite_tmp"))
      assert(!BucketFs.exists(s"$dir/_writer_claim"),
        "repair leaked its own claim")
      assert(survivors(dir).toSet == allIds.toSet)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("slow appender: a staged write outliving the staleness window " +
       "survives a second writer's arrival — exactly one commit, no " +
       "co-mingled rows (claim heartbeat end-to-end)") {
    val rnd = new scala.util.Random(53)
    val vecs = (0L until 64L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f)).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("annidx_slow").toString
    try {
      AnnIndex.saveIvfPq(vecs.where($"vec_id" < 32),
        "vec_id", "embedding", dir, dims = 8, m = 2, k = 4, nList = 4)
      SlowAppendGate.reached = new java.util.concurrent.CountDownLatch(1)
      SlowAppendGate.go = new java.util.concurrent.CountDownLatch(1)
      // latch-gated id column: evaluated only inside the staged write's
      // Spark job, so writer A blocks mid-stage WITH THE CLAIM HELD until
      // the test releases the gate — a deterministic stand-in for a
      // 100 TB encode job that outruns the staleness window
      val slowId = udf { i: Long =>
        SlowAppendGate.reached.countDown()
        SlowAppendGate.go.await(120, java.util.concurrent.TimeUnit.SECONDS)
        i
      }
      val stalenessMs = 800L // beat period 200 ms
      val sA = spark.newSession(); val sB = spark.newSession()
      val hA = AnnIndex.loadIvfPq(sA, dir)
      val hB = AnnIndex.loadIvfPq(sB, dir)
      @volatile var aResult: Either[Throwable, Long] = null
      val a = new Thread(() => {
        aResult =
          try Right(hA.append(
            vecs.where($"vec_id" >= 32 && $"vec_id" < 48)
              .withColumn("vec_id", slowId($"vec_id")),
            "embedding", claimStaleness = stalenessMs).nGens.toLong)
          catch { case t: Throwable => Left(t) }
      }, "slow-appender")
      a.start()
      assert(SlowAppendGate.reached.await(
        120, java.util.concurrent.TimeUnit.SECONDS),
        "writer A never reached its staged write")
      // A's mutation now runs 3x longer than the window. Without the
      // claim heartbeat, B below would adjudicate A's claim stale (mtime
      // never refreshed), sweep it, drop gen>=1 debris, and stage into
      // the SAME gen=1 directory — A's still-running job then lands its
      // task files into the generation B commits: silent double posting.
      Thread.sleep(3 * stalenessMs)
      val busy = intercept[IllegalStateException](
        hB.append(vecs.where($"vec_id" >= 48), "embedding",
          claimStaleness = stalenessMs))
      assert(busy.getMessage.contains("another session is writing"))
      SlowAppendGate.go.countDown()
      a.join(120000)
      assert(aResult != null, "writer A never finished")
      val nGensA = aResult.fold(t => fail(s"writer A failed: $t"), identity)
      assert(nGensA == 2L)
      // exactly one commit, rows exact: 32..47 appended once each, B's
      // refused batch absent
      val ids = survivors(dir)
      assert(ids.size == ids.distinct.size, "a generation was co-written")
      assert(ids.toSet == (0L until 48L).toSet)
      // the slot is free after A's release: B retries on a fresh handle
      val grownB = AnnIndex.loadIvfPq(sB, dir).append(
        vecs.where($"vec_id" >= 48), "embedding")
      assert(grownB.nGens == 3)
      assert(survivors(dir).toSet == (0L until 64L).toSet)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("saveIvfPq takes the SAME whole-dir slot as the mutation verbs: " +
       "a save racing an in-flight mutation (or save) is refused loudly") {
    val dir = java.nio.file.Files.createTempDirectory("annidx_savclm").toString
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 16L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat())).toDF("vec_id", "embedding")
    // an append/delete/compact/repair in flight holds the dir slot —
    // on this artifact save-vs-mutation exclusion is total
    val held = graft.sources.GenerationLock.claimDir(dir)
    val busy = intercept[IllegalStateException](
      AnnIndex.saveIvfPq(vecs, "vec_id", "embedding", dir,
        dims = 8, m = 2, k = 4, nList = 2))
    assert(busy.getMessage.contains("another session is writing"))
    graft.sources.GenerationLock.release(held)
    AnnIndex.saveIvfPq(vecs, "vec_id", "embedding", dir,
      dims = 8, m = 2, k = 4, nList = 2)
    val idx = AnnIndex.loadIvfPq(spark, dir)
    assert(idx.codes.select($"vec_id").distinct().count() == 16)
    BucketFs.deleteRecursive(dir)
  }
}

/** Latch gate for the slow-appender spec, referenced from a UDF: a
  * top-level module is restored via MODULE$ on closure deserialization —
  * the same instance in local mode — where a captured latch field would
  * fail task serialization. */
object SlowAppendGate {
  @volatile var reached: java.util.concurrent.CountDownLatch = _
  @volatile var go: java.util.concurrent.CountDownLatch = _
}
