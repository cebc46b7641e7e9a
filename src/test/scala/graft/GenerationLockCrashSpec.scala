package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{BucketFs, GenerationLock}

/** Crash MATRIX for the writer-claim protocol: a claimant dies at every
  * interleave point (the deterministic hooks double as kill points — an
  * exception thrown from the hook leaves on-disk state exactly as a
  * process death there would), and in every case the next claimant must
  * recover the slot within one staleness window, with no debris left
  * and the dead session's token refusing to verify. The point-race
  * specs in [[GenerationLockSpec]] each pin one interleaving; this
  * suite pins that NO phase leaves an unrecoverable or silently-shared
  * slot. */
class GenerationLockCrashSpec extends AnyFunSuite {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString

  private def claimFile(dir: String, gen: Int) =
    s"$dir/_writer_claim_gen=$gen"

  private def age(dir: String, gen: Int, ms: Long): Unit = {
    val (fs, p) = BucketFs.resolve(claimFile(dir, gen))
    val t = System.currentTimeMillis() - ms
    fs.setTimes(p, t, t)
  }

  private def noDebris(dir: String): Unit = {
    val (fs, root) = BucketFs.resolve(dir)
    val leftovers = fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.contains(".swept.") || n.contains(".release."))
    assert(leftovers.isEmpty, s"adjudication debris left: ${leftovers.toSeq}")
  }

  private case class Die(phase: String) extends RuntimeException(phase)

  /** Run a claim that crashes at `phase` while recovering a stale claim
    * (or taking a free slot); returns the on-disk state to the caller. */
  private def crashAt(dir: String, gen: Int, phase: String,
                      staleness: Long = 10 * 60 * 1000L): Unit = {
    val hook: String => Unit = p => if (p == phase) throw Die(phase)
    intercept[Die](GenerationLock.claim(dir, gen, staleness, hook))
    ()
  }

  test("die at afterStat (stale claim seen, nothing touched): next " +
       "claimant sweeps and proceeds") {
    val dir = tmp("glockx_stat")
    GenerationLock.claim(dir, 1, stalenessMs = 0L) // dead writer, no beat
    age(dir, 1, 60 * 60 * 1000L)
    crashAt(dir, 1, "afterStat")
    // the stale claim is still on disk, untouched
    assert(BucketFs.exists(claimFile(dir, 1)))
    val c = GenerationLock.claim(dir, 1, stalenessMs = 10 * 60 * 1000L)
    GenerationLock.verify(c)
    GenerationLock.release(c)
    noDebris(dir)
  }

  test("die at beforeRename (stale claim re-statted, nothing touched): " +
       "next claimant sweeps and proceeds") {
    val dir = tmp("glockx_restat")
    GenerationLock.claim(dir, 6, stalenessMs = 0L) // dead writer, no beat
    age(dir, 6, 60 * 60 * 1000L)
    crashAt(dir, 6, "beforeRename")
    // the stale claim is still on disk, untouched — dying between the
    // re-stat and the rename leaves the same state as afterStat
    assert(BucketFs.exists(claimFile(dir, 6)))
    val c = GenerationLock.claim(dir, 6, stalenessMs = 10 * 60 * 1000L)
    GenerationLock.verify(c)
    GenerationLock.release(c)
    noDebris(dir)
  }

  test("die at afterSweep (stale claim renamed aside, neither deleted " +
       "nor restored): the leaked aside is retired and the slot recovers") {
    val dir = tmp("glockx_sweep")
    val dead = GenerationLock.claim(dir, 2, stalenessMs = 0L)
    age(dir, 2, 60 * 60 * 1000L)
    crashAt(dir, 2, "afterSweep")
    // crash state: claim gone from its path, aside leaked at the root
    assert(!BucketFs.exists(claimFile(dir, 2)))
    val (fs, root) = BucketFs.resolve(dir)
    assert(fs.listStatus(root).exists(_.getPath.getName.contains(".swept.")),
      "precondition: the crash must have leaked an aside")
    // the aside carries the ORIGINAL stale mtime (rename preserves it on
    // HDFS-semantics stores), so the next claim's step-0 retirement
    // deletes it and the create proceeds — the round-17 aside-retirement
    // fix; before it this file leaked forever
    val c = GenerationLock.claim(dir, 2, stalenessMs = 10 * 60 * 1000L)
    GenerationLock.verify(c)
    intercept[IllegalStateException](GenerationLock.verify(dead))
    GenerationLock.release(c)
    noDebris(dir)
  }

  test("die at afterCreate (claim taken, never released, no beat): " +
       "fresh claim blocks honestly, then goes stale and is swept") {
    val dir = tmp("glockx_create")
    crashAt(dir, 3, "afterCreate") // free slot: dies right after create
    assert(BucketFs.exists(claimFile(dir, 3)))
    // within the window the dead claim blocks — indistinguishable from a
    // live writer by design (it has not missed a beat yet)
    val busy = intercept[IllegalStateException](
      GenerationLock.claim(dir, 3, stalenessMs = 10 * 60 * 1000L))
    assert(busy.getMessage.contains("another session is writing"))
    // past the window it is swept like any crashed writer
    age(dir, 3, 60 * 60 * 1000L)
    val c = GenerationLock.claim(dir, 3, stalenessMs = 10 * 60 * 1000L)
    GenerationLock.verify(c)
    GenerationLock.release(c)
    noDebris(dir)
  }

  test("sweeper crashes at afterSweep having parked a FRESH claim (the " +
       "displaced-holder residual): displaced holder aborts at verify, " +
       "the orphaned fresh aside is retired once it goes stale") {
    val dir = tmp("glockx_displaced")
    GenerationLock.claim(dir, 4, stalenessMs = 0L) // dead writer, no beat
    age(dir, 4, 60 * 60 * 1000L)
    // B adjudicates the stale claim; INSIDE its re-stat→rename window A
    // sweeps it and claims the slot (A is LIVE); B's rename then parks
    // A's fresh claim — and B crashes before the identity re-check can
    // restore it
    var a: Option[GenerationLock.Claim] = None
    var fired = false
    val hook: String => Unit = {
      case "beforeRename" if !fired =>
        fired = true
        a = Some(GenerationLock.claim(dir, 4, 10 * 60 * 1000L, _ => ()))
      case "afterSweep" => throw Die("afterSweep")
      case _ => ()
    }
    intercept[Die](GenerationLock.claim(dir, 4, 10 * 60 * 1000L, hook))
    // crash state: A's live claim sits in a .swept. aside, slot is empty.
    // A third claimant takes the slot (nothing blocks it) — the
    // documented verify-bounded residual: displaced A must ABORT its
    // commit, not co-commit
    val c3 = GenerationLock.claim(dir, 4, stalenessMs = 10 * 60 * 1000L)
    GenerationLock.verify(c3)
    intercept[IllegalStateException](GenerationLock.verify(a.get))
    GenerationLock.release(a.get) // no-op: must not disturb c3's claim
    GenerationLock.verify(c3)
    GenerationLock.release(c3)
    // the orphaned aside holds A's FRESH mtime, so step-0 leaves it
    // alone until it ages out; once stale it is retired by the next claim
    val (fs, root) = BucketFs.resolve(dir)
    val aside = fs.listStatus(root)
      .filter(_.getPath.getName.contains(".swept.")).head.getPath
    val t = System.currentTimeMillis() - 60 * 60 * 1000L
    fs.setTimes(aside, t, t)
    val c4 = GenerationLock.claim(dir, 4, stalenessMs = 10 * 60 * 1000L)
    GenerationLock.release(c4)
    noDebris(dir)
  }

  test("the matrix holds on the S3-shaped store too (copy+delete " +
       "renames): die at afterSweep, slot recovers, no debris") {
    SparkTestBase.spark // registers fs.mocks3.impl
    val local = Files.createTempDirectory("graft_glockx_s3")
    local.toFile.deleteOnExit()
    val dir = s"mocks3:$local"
    GenerationLock.claim(dir, 5, stalenessMs = 0L) // dead writer
    Thread.sleep(10)
    crashAt(dir, 5, "afterSweep", staleness = 1L)
    assert(!BucketFs.exists(claimFile(dir, 5)))
    // on the copy+delete store the leaked aside's mtime is the COPY time
    // (fresh) — it is not retired yet, but it also cannot block the slot
    Thread.sleep(10)
    val c = GenerationLock.claim(dir, 5, stalenessMs = 1L)
    GenerationLock.verify(c)
    GenerationLock.release(c)
    // ... and once stale it is retired by a later claim's step-0
    Thread.sleep(30)
    val c2 = GenerationLock.claim(dir, 5, stalenessMs = 20L)
    GenerationLock.release(c2)
    noDebris(dir)
  }
}
