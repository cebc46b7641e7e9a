package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path

/** Atomic writer-claim serialization for the generation-commit protocol
  * shared by the persisted artifacts ([[TextIndex]], [[DedupIndex]],
  * [[AnnIndex]], [[TextModelStore]]).
  *
  * All of them stage data into an uncommitted generation directory and
  * then commit it with one atomic manifest rename. The stale-handle
  * re-check each mutation performs is check-then-act, so two sessions
  * racing the same generation would each pass it, co-write one gen
  * directory, and the loser's manifest rename would commit a generation
  * holding BOTH writers' rows — silent double counting. The claim file
  * (`_writer_claim_gen=N` at the artifact root) serializes them: it is
  * taken with `FileSystem.create(overwrite = false)` — atomic on HDFS —
  * so exactly one racer proceeds and the other fails LOUDLY; a session
  * nonce written into the file and read back arbitrates even on
  * filesystems whose create is itself check-then-act (raw local FS).
  *
  * A LIVE claimant is kept fresh by a heartbeat: [[claim]] starts a
  * daemon timer that refreshes the claim file's mtime (fs.setTimes, no
  * rewrite) every `stalenessMs/4` until [[release]], so a writer whose
  * staged data job outruns the staleness window — routine at 100 TB —
  * is never falsely adjudicated dead, swept, and raced into the same
  * generation directory by a contender (whose commit would co-mingle
  * both writers' late-landing task files). A crashed claimant stops
  * beating; its file goes stale after `stalenessMs` and is swept
  * by the next writer (its partial gen dir is already
  * uncommitted-debris the mutation sweeps separately). The sweep is
  * ATOMIC — rename-to-unique, so of two recoverers racing one stale
  * claim exactly one sweeps it and the `create` arbitrates the rest —
  * guarded on both sides of the rename: immediately BEFORE it the claim
  * is re-statted and any mtime movement since the adjudication reports
  * busy (a heartbeat refresh or a replacement landed while the
  * adjudication's own RPCs ran — the exposure is now one rename RPC
  * wide, not several), and AFTER it the aside is re-verified BY
  * IDENTITY (nonce, with mtime-equality as the torn-content fallback):
  * if the renamed-aside file is not the incarnation that was
  * adjudicated stale (a new claimant landed inside that last RPC), it
  * is restored and the sweeper reports busy instead of proceeding.
  * Identity, not age, because on copy+delete-rename stores (raw S3A)
  * the rename itself freshens the aside's mtime — an age re-check would
  * restore every legitimately swept claim and wedge stale recovery. On
  * stores whose rename PRESERVES mtimes (local/HDFS — probed once per
  * store), a matching nonce with a MOVED aside mtime is additionally
  * restored: there the movement can only be a heartbeat that refreshed
  * the claim inside the rename window (a content-identical refresh —
  * setTimes in place — leaves the nonce AND the bytes unchanged, so
  * only the mtime can tell "the stale incarnation I judged" from "the
  * same claim, re-beaten alive"). Rewrite-beats additionally carry a
  * monotonic `beat=<k>` line beside the nonce (r19), so on stores where
  * the beat REWRITES (setTimes unsupported — exactly the raw-S3 shape
  * whose rename also hides mtime signals) ANY revival between the
  * identity read and the rename changes the claim's CONTENT and the
  * full-content identity re-check catches it with no mtime semantics
  * needed — the r18 rewrite-beat residual on copy+delete stores is
  * closed by content identity.
  * Documented residuals, both bounded by [[verify]] (every holder
  * re-asserts ownership immediately before its manifest commit, so the
  * exposure shrinks from the whole data-write job to one rename RPC):
  * a falsely-swept claim whose restore loses to a third claimant; and,
  * only on a store that BOTH renames by copy+delete AND supports an
  * in-place setTimes (no known real store — raw S3A has neither), a
  * full-window-delinquent setTimes-beat reviving inside the one-RPC
  * gap, where neither content nor mtime carries a signal.
  *
  * The reference has no concurrent-writer story at all (single-process
  * orchestration, satbucket/routines.py:219-250); at 100 TB, two
  * schedulers retrying one ingest job is an expected failure mode, not
  * an exotic one.
  *
  * Object-store caveat (same honesty as [[BucketFs]]'s rename notes): on
  * stores whose rename is copy+delete (raw S3A), the stale-claim sweep
  * loses its atomicity and `create(overwrite = false)` may be
  * check-then-act — the protocol then rests entirely on the nonce
  * read-back plus the pre-commit [[verify]], which still guarantee AT
  * MOST ONE COMMIT per claim slot (the invariant the thread-stress spec
  * pins); only the loud-refusal-vs-lost-race error message degrades. On
  * HDFS-semantics stores (HDFS, ABFS, GCS rename) every step is atomic
  * as documented. Stores that expose conditional writes (S3
  * If-None-Match, GCS ifGenerationMatch, ABFS ETag) can restore a truly
  * atomic take by plugging a [[ClaimBackend]] whose tryCreate maps to
  * the store's conditional put — the one store-dependent step of the
  * protocol, seamed behind one method.
  */
object GenerationLock {

  /** ONE staleness constant for the whole artifact family — how old
    * writer-liveness evidence (a claim file here, [[AnnIndex]]'s delete
    * marker there) must be before another process may adjudicate the
    * writer as dead and sweep its debris. Crash specs pass 0 at the call
    * site (their simulated writer is dead by construction).
    *
    * Clock-skew honesty: the beat stamps mtimes from the WRITER's clock
    * (fs.setTimes with an explicit timestamp; on HDFS the namenode
    * stamps creates itself) while the adjudicator compares against ITS
    * clock, so cross-machine skew shifts the effective window by the
    * skew. The 10-minute default is ~5 orders of magnitude above
    * NTP-disciplined skew; deployments with undisciplined clocks should
    * widen the window rather than tighten it — a falsely-early sweep is
    * bounded by the pre-commit [[verify]] either way. */
  val DefaultStalenessMs: Long = 10 * 60 * 1000L

  /** Ownership token returned by [[claim]]: holding it means this
    * session staged generation `gen` of `dir`. The nonce is what
    * [[verify]] and [[release]] check against the on-disk claim, so a
    * claim that was falsely swept and re-taken by another session is
    * detected instead of silently co-committed. */
  final case class Claim(dir: String, gen: Int, nonce: String) {
    // the claim-freshness heartbeat (started by claim(), stopped by
    // release()) — deliberately NOT a constructor field: two tokens for
    // one slot compare equal regardless of beat state, and specs that
    // build tokens by hand get no beat to manage
    @transient private[sources] var beat:
      Option[java.util.concurrent.ScheduledExecutorService] = None
  }

  /** How the atomic TAKE of a claim file happens — the one step of the
    * protocol whose atomicity is store-dependent. The default speaks the
    * plain Hadoop FS contract (`create(overwrite = false)`): atomic on
    * HDFS-semantics stores, check-then-act on raw object stores, where
    * the nonce read-back + pre-commit [[verify]] still bound commits to
    * at most one (the object-store caveat in the class doc). Object
    * stores with conditional writes — S3 `If-None-Match: *` PUT, GCS
    * `ifGenerationMatch=0`, ABFS ETag preconditions — can close that
    * gap by plugging a backend whose [[ClaimBackend.tryCreate]] maps to
    * the store's conditional put against the SAME path (so the stale
    * sweep's delete naturally frees the slot); every other step
    * (staleness adjudication, atomic sweep, heartbeat, verify, release)
    * is unchanged and store-agnostic. */
  trait ClaimBackend {
    /** Atomically create `p` holding `nonce` iff absent: true if THIS
      * call created it, false if it already existed (lost the race).
      * Must be atomic with respect to concurrent tryCreate calls on the
      * same path — that atomicity is the whole contract; the file's
      * bytes may land non-atomically afterwards (readers of a torn
      * claim adjudicate it unreadable = not-held, see [[verify]]). */
    def tryCreate(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                  nonce: String): Boolean
  }

  /** Default [[ClaimBackend]]: plain Hadoop atomic create. Only the
    * `create` call's IOException means "lost the race" — once the create
    * has succeeded the slot is OURS, and a write/close failure must NOT
    * be reported as a lost race (the session would abort with a
    * misleading error while its own empty/torn claim file blocks the
    * slot — for itself and everyone else — for the full staleness
    * window). Instead the just-created file is best-effort deleted to
    * free the slot and the real error is rethrown — but ONLY after a
    * read-back confirms the file still holds THIS call's nonce: on
    * check-then-act stores both racers' create can "succeed", so by the
    * time the loser's write/close fails the path may hold the WINNER's
    * nonce, and a blind delete here would abort a healthy winner at its
    * post-create read-back (an availability hole, not a correctness one
    * — at-most-one-commit never depended on this delete). Unconfirmable
    * content (unreadable/torn) is left for the staleness sweep. */
  object HadoopCreateBackend extends ClaimBackend {
    def tryCreate(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                  nonce: String): Boolean = {
      val out =
        try fs.create(p, false)
        catch { case _: java.io.IOException => return false }
      try {
        try out.write(nonce.getBytes(StandardCharsets.UTF_8))
        finally out.close()
      } catch {
        case e: java.io.IOException =>
          try {
            val in = fs.open(p)
            val bytes =
              try {
                val buf = new java.io.ByteArrayOutputStream()
                val b = new Array[Byte](256)
                var n = in.read(b)
                while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
                buf.toByteArray
              } finally in.close()
            if (new String(bytes, StandardCharsets.UTF_8) == nonce)
              fs.delete(p, false)
          } catch { case _: java.io.IOException => () }
          throw e
      }
      true
    }
  }

  /** Reserved slots of the non-generational claim flavors ([[claimDir]],
    * [[claimBeside]]); real staged generations are >= 0. */
  private val DirSlot = -1
  private val BesideSlot = -2

  private def claimPath(dir: String, gen: Int) = gen match {
    case BesideSlot => s"${dir}__writer_claim" // sibling of the dest
    case g if g < 0 => s"$dir/_writer_claim"
    case g          => s"$dir/_writer_claim_gen=$g"
  }

  private def what(dir: String, gen: Int) =
    if (gen < 0) dir else s"generation $gen of $dir"

  /** Claim-file content format: line 1 is the session nonce; rewrite
    * heartbeats (stores without setTimes) append a `beat=<k>` line with
    * a strictly increasing k. Ownership checks ([[verify]], [[release]],
    * the beat's foreign-claim test) parse ONLY the nonce line — a beat
    * never changes who owns the slot — while the stale sweep's identity
    * re-check compares FULL content, so ANY rewrite-beat between the
    * adjudication's identity read and its rename changes the bytes and
    * is detected, with no mtime semantics needed. That closes the
    * copy+delete-store residual the r18 class doc carried (a
    * full-window-delinquent rewrite-beat reviving inside the one-RPC
    * gap was indistinguishable there from the rename's own
    * mtime-freshening): content now arbitrates on exactly the stores
    * where mtime cannot. */
  private def nonceOf(content: String): String = {
    val i = content.indexOf('\n')
    if (i < 0) content else content.substring(0, i)
  }

  /** Per-store memo: does this filesystem's FILE rename preserve the
    * source's mtime (inode semantics — local, HDFS, ABFS) or stamp a
    * fresh one (copy+delete stores — raw S3A)? Consulted only on the
    * rare sweep path, when a renamed-aside's nonce matches the
    * adjudicated claim but its mtime MOVED: on a preserving store that
    * combination can only be a heartbeat refresh that slipped into the
    * re-stat→rename gap (restore it — the belt-and-braces branch below),
    * while on a copy+delete store every sweep looks like that and the
    * nonce must win or stale recovery wedges (the r17 age-check defect).
    * No Hadoop API exposes the semantics, so it is probed empirically
    * ONCE per store per JVM: create a scratch file, make "preserved"
    * distinguishable from "freshly stamped" (back-date it 10 minutes
    * where setTimes works — verified applied, some stores silently
    * no-op — else wait out any plausible mtime granularity), rename,
    * compare. Conservative on any failure or ambiguity: NOT preserving,
    * which only disables the extra restore — never the sweep itself,
    * never the busy fast path. */
  private val renameMtimeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private[sources] def renamePreservesMtime(
      fs: org.apache.hadoop.fs.FileSystem, near: Path): Boolean = {
    val key = fs.getUri.toString
    val cached = renameMtimeMemo.get(key)
    if (cached != null) return cached.booleanValue()
    val probed: Boolean =
      try {
        val tag = java.util.UUID.randomUUID().toString
        val src = new Path(near, s".graft_mtprobe.$tag.src")
        val dst = new Path(near, s".graft_mtprobe.$tag.dst")
        val out = fs.create(src, true)
        try out.write('p'.toInt) finally out.close()
        val backdated: Option[Long] =
          try {
            val t = System.currentTimeMillis() - 10 * 60 * 1000L
            fs.setTimes(src, t, -1)
            val got = fs.getFileStatus(src).getModificationTime
            // stores may round the stamp; accept it only if it clearly
            // landed in the past (a silent no-op leaves it at "now",
            // where copy-fresh and preserved are indistinguishable)
            if (math.abs(got - t) < 5 * 60 * 1000L) Some(got) else None
          } catch {
            case _: UnsupportedOperationException => None
            case _: java.io.IOException => None
          }
        val m0 = backdated.getOrElse {
          val t0 = fs.getFileStatus(src).getModificationTime
          Thread.sleep(1200) // > 1 s: coarser than any common mtime tick
          t0
        }
        val renamed = fs.rename(src, dst)
        val preserved = renamed &&
          fs.getFileStatus(dst).getModificationTime == m0
        try fs.delete(if (renamed) dst else src, false)
        catch { case _: java.io.IOException => () }
        preserved
      } catch { case scala.util.control.NonFatal(_) => false }
    renameMtimeMemo.putIfAbsent(key, java.lang.Boolean.valueOf(probed))
    probed
  }

  /** Whole-destination mutex for the NON-generational mutators (the
    * update-merge's delete-then-rename pass over period files,
    * [[Clustered.writeClustered]]'s table overwrite, [[AnnIndex]]'s
    * append/delete/compact/repair family, and — round 17 — every
    * artifact's PROVISIONING save, whose generation-0 writes would
    * otherwise co-mingle under two schedulers retrying one build): the
    * same claim/verify/release protocol on one reserved slot
    * (`_writer_claim`, no generation suffix) instead of a staged
    * generation number. Two concurrent update-merges over one
    * destination would otherwise interleave their per-period deletes
    * and renames — each can delete files the other just renamed in,
    * leaving periods with a mix of both runs' files. */
  def claimDir(dir: String, stalenessMs: Long = DefaultStalenessMs,
               backend: ClaimBackend = HadoopCreateBackend): Claim =
    claim(dir, DirSlot, stalenessMs, noHook, backend)

  /** [[claimDir]] variant for destinations the claimed mutation itself
    * may WIPE (a `saveAsTable` overwrite deletes the table path's whole
    * contents — a claim INSIDE it would vanish mid-write, silently
    * re-opening the race): the claim file lands BESIDE the destination
    * (`<path>__writer_claim`), which the mutation never touches. */
  def claimBeside(path: String,
                  stalenessMs: Long = DefaultStalenessMs,
                  backend: ClaimBackend = HadoopCreateBackend): Claim =
    claim(path, BesideSlot, stalenessMs, noHook, backend)

  /** Deterministic-interleave hook for race specs (phases: "afterStat",
    * "beforeRename", "afterSweep", "afterCreate"). A parameter of the
    * private overload, not mutable global state. */
  private[graft] type Hook = String => Unit
  private val noHook: Hook = _ => ()

  /** Take the writer claim on generation `gen` of `dir`, or throw
    * `IllegalStateException` LOUDLY if another session holds it (fresh
    * claim) or wins the race (concurrent create). Never blocks. */
  def claim(dir: String, gen: Int,
            stalenessMs: Long = DefaultStalenessMs,
            backend: ClaimBackend = HadoopCreateBackend): Claim =
    claim(dir, gen, stalenessMs, noHook, backend)

  private[graft] def claim(dir: String, gen: Int, stalenessMs: Long,
                           hook: Hook): Claim =
    claim(dir, gen, stalenessMs, hook, HadoopCreateBackend)

  private[graft] def claim(dir: String, gen: Int, stalenessMs: Long,
                           hook: Hook, backend: ClaimBackend): Claim = {
    val (fs, p) = BucketFs.resolve(claimPath(dir, gen))
    def busy(age: Long): Nothing = throw new IllegalStateException(
      s"another session is writing ${what(dir, gen)} (writer claim " +
        s"is $age ms old < $stalenessMs): retry after it commits, or " +
        "after the staleness window if it is dead")
    // the stale-adjudication aborts below cannot honestly report an age
    // — the claim just PROVED itself alive (refreshed or replaced while
    // this adjudication's own RPCs ran), so "0 ms old" would misstate a
    // live holder as a newborn claim
    def busyLive(how: String): Nothing = throw new IllegalStateException(
      s"another session is writing ${what(dir, gen)} (the claim $how " +
        "during this session's stale adjudication — the holder is " +
        "alive): retry after it commits")
    // FAST PATH: a fresh claim refuses in ONE stat. Busy-retry loops
    // (schedulers polling a held artifact) must not pay the retirement
    // LIST or the identity read below — on real object stores LIST is
    // the expensive RPC. Only an absent-or-stale slot (rare: free take
    // or crash recovery) continues into the adjudication steps.
    try {
      val st0 = fs.getFileStatus(p)
      val age0 = System.currentTimeMillis() - st0.getModificationTime
      if (age0 < stalenessMs) busy(age0)
    } catch { case _: java.io.FileNotFoundException => () }
    // 0. retire leaked adjudication asides: both release() and the stale
    // sweep below park claims as dot-file asides
    // (".<claim>.{release,swept}.<uuid>") and delete them best-effort — a
    // crash or failed delete between the rename and the delete leaks
    // them at the artifact root forever, since no other path ever lists
    // them. Only STALE asides are retired: a fresh one may be
    // mid-adjudication by a live releaser/sweeper about to restore it.
    // (A stale-mtime aside a live adjudicator still holds is safe to
    // drop: its sweptFresh/ownership re-stat treats FNF as not-fresh /
    // not-owned and the slot adjudicates exactly as if the stale claim
    // had been swept — which, by mtime, it legitimately is.)
    try {
      val now = System.currentTimeMillis()
      val asides = fs.globStatus(new Path(p.getParent, s".${p.getName}.*"))
      if (asides != null) asides.foreach { st =>
        if (now - st.getModificationTime >= stalenessMs)
          try fs.delete(st.getPath, false)
          catch { case _: java.io.IOException => () }
      }
    } catch { case _: java.io.IOException => () }
    // 1. adjudicate an existing claim. The nonce is read BEFORE the
    // (authoritative) staleness stat so the pair (nonce, mtime)
    // identifies the exact claim INCARNATION being adjudicated — the
    // sweep's post-rename re-check below compares identity, not age,
    // and a claimant landing between this read and the stat shows up
    // FRESH at the stat (busy), never as a false identity match.
    // getFileStatus directly (no exists-then-stat: the file can vanish
    // between the two — a released claim is the same as an absent one)
    val staleNonce: Option[String] =
      try Some(BucketFs.readString(p.toString))
      catch { case _: java.io.IOException => None } // absent or torn
    val existing =
      try Some(fs.getFileStatus(p))
      catch { case _: java.io.FileNotFoundException => None }
    hook("afterStat")
    existing.foreach { st =>
      val age = System.currentTimeMillis() - st.getModificationTime
      if (age < stalenessMs) busy(age)
      // re-adjudicate IMMEDIATELY before the rename: the identity read
      // and the authoritative stat above are separated from the rename
      // by this block's own RPCs, and a heartbeat refresh or a whole
      // release-and-re-claim landing in that span used to reach the
      // rename unnoticed (the nonce survives a same-nonce beat rewrite,
      // so the post-rename identity check below cannot catch THAT case
      // on every store). Any mtime movement since the adjudicated stamp
      // means the claim is not the dead incarnation judged above —
      // report busy, never sweep. After this check the exposure is one
      // rename RPC wide.
      val moved =
        try fs.getFileStatus(p).getModificationTime != st.getModificationTime
        // vanished = released: the rename below fails cleanly and the
        // create arbitrates
        catch { case _: java.io.FileNotFoundException => false }
      if (moved) busyLive("was refreshed (mtime moved)")
      hook("beforeRename")
      // stale: sweep by ATOMIC rename-to-unique. Of two recoverers racing
      // the same stale claim, exactly one rename succeeds; the loser
      // falls through to the create, which arbitrates. (delete-then-
      // create would let both delete each other's fresh claims and both
      // proceed — the round-14 defect this replaces.)
      val aside = new Path(p.getParent,
        s".${p.getName}.swept.${java.util.UUID.randomUUID()}")
      val renamed =
        try fs.rename(p, aside)
        catch { case _: java.io.IOException => false }
      hook("afterSweep")
      if (renamed) {
        // guard the re-stat→rename window: if the file we renamed is
        // NOT the stale claim we judged — a new claimant landed in that
        // one RPC — restore it and report busy; if the restore loses to
        // a third claimant, the swept-then-restored holder's pre-commit
        // verify() catches the hijack. Identity is adjudicated by NONCE
        // (unique per claim), with mtime-equality as the fallback for an
        // unreadable (torn) incumbent — NOT by the aside's age: on
        // stores whose rename is copy+delete (raw S3A) the rename itself
        // freshens the mtime, so an age check would judge every swept
        // stale claim "fresh", restore it (freshening it again), and
        // wedge stale recovery permanently. A new claimant's file can
        // never alias either test: its nonce is a fresh UUID and its
        // mtime is now, >= stalenessMs after the adjudicated stamp. The
        // one residual on copy+delete stores: a TORN incumbent (nonce
        // unreadable, mtime not comparable) restores and reports busy —
        // near-impossible there (object PUTs are atomic), and it fails
        // toward safety, never toward a false sweep.
        val sweptSame: Boolean =
          try {
            val asideSt = fs.getFileStatus(aside)
            val asideNonce =
              try Some(BucketFs.readString(aside.toString))
              catch { case _: java.io.IOException => None }
            if (asideNonce.isDefined && asideNonce == staleNonce)
              // FULL-CONTENT match (not just the nonce line): a
              // rewrite-beat increments its beat=<k> line, so any
              // revival that REWROTE the claim inside the rename window
              // lands in the `else` branch below and restores — content
              // identity is exactly the signal copy+delete stores
              // cannot erase (r19, closing the r18 residual). A
              // content-identical match can still be a SETTIMES refresh
              // (in-place, bytes untouched), so the aside's mtime
              // arbitrates where the store lets it: equal to the
              // adjudicated stamp = untouched since the adjudication —
              // sweep; MOVED on a store whose rename preserves mtimes
              // (probed once per store) = only a beat refresh explains
              // it — restore and report busy. On copy+delete stores the
              // rename itself freshened the stamp, so mtime carries no
              // signal and the content match wins (an mtime test there
              // is the r17 wedge) — safe there because those stores
              // have no setTimes: every beat rewrites, and a rewrite
              // never content-matches.
              asideSt.getModificationTime == st.getModificationTime ||
                !renamePreservesMtime(fs, p.getParent)
            else
              asideSt.getModificationTime == st.getModificationTime
          } catch {
            // aside vanished (another recoverer's step-0 retirement):
            // nothing left to restore — fall through to the create,
            // which arbitrates
            case _: java.io.FileNotFoundException => true
          }
        if (!sweptSame) {
          if (!fs.rename(aside, p)) fs.delete(aside, false)
          busyLive("proved live mid-sweep and was restored")
        }
        fs.delete(aside, false)
      }
    }
    // 2. take the claim: nonce in, atomic create-if-absent via the
    // backend (plain Hadoop create by default; a conditional-put
    // backend on object stores that have one)
    val nonce = java.util.UUID.randomUUID().toString
    if (!backend.tryCreate(fs, p, nonce))
      throw new IllegalStateException(
        s"lost the writer-claim race on ${what(dir, gen)}: another " +
          "session claimed it concurrently — reload and retry")
    hook("afterCreate")
    val c = Claim(dir, gen, nonce)
    // 3. nonce read-back: where create is not truly atomic (raw local
    // FS), two racers may both have "created" — the file now holds
    // exactly one racer's nonce, so at most one proceeds
    verify(c)
    // 4. HEARTBEAT the claim for the duration of the mutation: the
    // staleness adjudication above measures time-since-last-mtime, so a
    // claim that is never refreshed makes a LIVE writer whose staged
    // data job outruns stalenessMs (routine at 100 TB) look crashed — a
    // contending writer then sweeps it, claims the same generation, and
    // the victim's still-running Spark job lands task files into the
    // SAME gen directory the contender later commits (the victim's own
    // manifest rename is stopped by [[verify]], but the contender's
    // generation would co-mingle both writers' rows). A daemon timer
    // refreshes the claim file's mtime IN PLACE (fs.setTimes — no
    // rewrite, so there is never a claim-absent or torn-content window)
    // every stalenessMs/4, keeping a live writer's claim fresh no
    // matter how long its mutation runs; same beat shape as
    // [[AnnIndex]]'s delete liveness marker. Beat hygiene: a tick that
    // finds the file GONE for two consecutive reads ~2 periods apart
    // (released/committed, or swept for real) stops itself — an orphan
    // beat must never re-freshen a SUCCESSOR's claim forever (that would
    // wedge staleness recovery for as long as this process lives) — but
    // a SINGLE absent read is only retried: a foreign adjudication
    // (release/sweep) transiently renames a live claim aside and
    // restores it, and a beat that died on that one intersecting tick
    // would leave the falsely-swept-then-restored holder beatless for
    // the rest of its mutation. Each tick re-reads the nonce and stops
    // on a CONFIRMED foreign claim (a falsely-swept-and-re-taken slot
    // must not be kept artificially fresh past its new holder's own
    // life; an UNREADABLE file is not confirmation — keep beating, the
    // file is almost certainly our own mid-rewrite on a fallback
    // store). Other
    // failures are swallowed: a transient FS hiccup must not kill the
    // beat, and stores whose setTimes is unsupported (raw object
    // stores) fall back to rewriting the same nonce — those stores'
    // rename is copy+delete anyway, so the protocol there already rests
    // on the nonce + pre-commit verify (see the object-store caveat
    // above). stalenessMs = 0 skips the beat entirely (crash specs: the
    // simulated writer is dead by construction, and there is no window
    // to defend).
    val period = stalenessMs / 4
    if (period > 0) {
      // monotonic beat counter for the rewrite fallback: each rewrite
      // changes the claim's CONTENT (nonce line unchanged, beat line
      // incremented), giving the stale sweep's full-content identity
      // re-check a signal on stores where the rename freshens mtimes
      val beatSeq = new java.util.concurrent.atomic.AtomicLong(0L)
      val exec = java.util.concurrent.Executors
        .newSingleThreadScheduledExecutor { r =>
          val t = new Thread(r, s"writer-claim-heartbeat-${p.getName}")
          t.setDaemon(true); t
        }
      exec.scheduleAtFixedRate(
        () => try {
          // None = absent; Some(nonce) = ours (an UNREADABLE file is
          // adjudicated ours: almost certainly our own beat mid-rewrite
          // on a fallback store); Some(other) = confirmed foreign
          def readNonce(): Option[String] =
            try Some(BucketFs.readString(p.toString))
            catch {
              case _: java.io.FileNotFoundException => None
              case _: java.io.IOException => Some(nonce)
            }
          var onDisk = readNonce()
          if (onDisk.isEmpty) {
            // transiently ABSENT is not proof of death: both release()
            // and the stale sweep rename a claim ASIDE, read it, and
            // restore it when it turns out live/foreign — a foreign
            // session's adjudication intersecting this tick would
            // otherwise permanently kill a live writer's beat exactly
            // when it was falsely swept, silently degrading the
            // whole-mutation guarantee back to verify()-bounded for the
            // raced claim. Retry once after ~2 beat periods (far wider
            // than the rename→restore window). Worst-case un-refreshed
            // ageing: ~3 beat periods = 0.75 × stalenessMs — one period
            // from the last successful refresh to the absent tick, plus
            // the 2-period sleep — strictly under the window, with one
            // period of margin (and the restore preserves mtime, so a
            // resumed beat's setTimes picks up exactly where it left
            // off). The in-tick sleep intentionally blocks this single-
            // thread executor: ticks missed during the retry fire
            // back-to-back afterwards (fixed-rate semantics), which is
            // harmless — the retry IS the refresh decision. Shut down
            // only if the claim is STILL absent (genuinely released/
            // swept) or now holds a foreign nonce.
            Thread.sleep(2 * period)
            onDisk = readNonce()
          }
          onDisk match {
            case None => exec.shutdown() // still absent: truly gone
            case Some(n) if nonceOf(n) != nonce =>
              exec.shutdown() // re-taken: the new holder beats now
            case _ =>
              try fs.setTimes(p, System.currentTimeMillis(), -1)
              catch {
                case _: UnsupportedOperationException =>
                  val out = fs.create(p, true)
                  try out.write((nonce + "\nbeat=" + beatSeq.incrementAndGet())
                    .getBytes(StandardCharsets.UTF_8))
                  finally out.close()
              }
          }
        } catch {
          case scala.util.control.NonFatal(_) => ()
        },
        period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
      c.beat = Some(exec)
    }
    c
  }

  /** Re-assert ownership of `c` — call IMMEDIATELY BEFORE the manifest
    * commit, so a writer whose claim was falsely stale-adjudicated and
    * re-taken by another session aborts BEFORE committing instead of
    * co-committing a generation. Throws `IllegalStateException` if the
    * on-disk claim is missing or carries a different session's nonce. */
  def verify(c: Claim): Unit = {
    def readOnce(): Option[String] =
      try Some(BucketFs.readString(claimPath(c.dir, c.gen)))
      catch {
        case _: java.io.FileNotFoundException => None
        // an UNREADABLE claim (e.g. ChecksumException on the local
        // checksummed FS: the data file and its .crc land non-atomically,
        // so a read racing another writer's in-flight rewrite sees an
        // inconsistent pair) means someone else is writing the file RIGHT
        // NOW — this session does not safely own it. Adjudicate as
        // not-held (abort the commit) instead of escaping with a raw FS
        // error.
        case _: java.io.IOException => None
      }
    // ownership = the nonce LINE matches (a rewrite-beat appends a
    // beat=<k> line but never changes the owner)
    def owned(content: Option[String]) = content.map(nonceOf).contains(c.nonce)
    var onDisk = readOnce()
    // On stores where the heartbeat falls back to REWRITING the claim
    // (setTimes unsupported AND writes not atomic — real object stores
    // have atomic PUT, so in practice this is exotic), the holder's OWN
    // verify can race its own beat mid-rewrite and read a torn or empty
    // file. Retrying never weakens the guarantee (the final read must
    // still match exactly), so when this token runs a beat give the
    // rewrite two brief chances to settle before adjudicating. Tokens
    // without a beat (foreign/zombie checks, the post-create read-back)
    // keep single-read semantics.
    var retries = if (c.beat.isDefined) 2 else 0
    while (!owned(onDisk) && retries > 0) {
      Thread.sleep(60)
      onDisk = readOnce()
      retries -= 1
    }
    if (!owned(onDisk))
      throw new IllegalStateException(
        s"writer claim on ${what(c.dir, c.gen)} is no longer " +
          s"held by this session (${onDisk.fold("claim file missing or " +
            "unreadable (concurrent writer)")(_ =>
            "another session re-claimed it")}) — the staged generation " +
          "is abandoned, NOT committed; reload and retry")
  }

  /** Release ONLY a claim this session still owns — deleting another
    * session's claim would re-open the race the claim serializes. A
    * missing OR unreadable file is a no-op (already swept/released, or a
    * concurrent writer is mid-rewrite — either way ownership can't be
    * confirmed, so leave it; an orphan goes stale and is swept).
    *
    * Stops the claim heartbeat FIRST (before any file operation): a
    * beat tick racing the delete below could otherwise resurrect the
    * claim on stores where the beat rewrites instead of setTimes,
    * leaving a phantom holder that blocks the slot until it goes stale.
    *
    * Ownership is confirmed by rename-to-unique-then-read, not
    * read-then-delete: under the old shape a stale-sweeper could rename
    * this claim away and a NEW claimant create the file between the
    * nonce read-back and the delete — release would then delete the new
    * holder's live claim, re-opening the slot for a third writer. The
    * rename pins ONE specific inode: what we read is exactly what we
    * delete (ours) or restore (someone else's, mtime preserved through
    * the renames so a genuinely stale claim does not get freshened —
    * except on copy+delete-rename stores, where the restore stamps a
    * fresh mtime and a stale foreign claim's sweep is DELAYED by one
    * window; an availability nit, never a correctness one). If
    * the restore loses to a claimant that landed at the original path
    * mid-release, the aside is dropped and the displaced holder's
    * pre-commit [[verify]] catches the hijack — the same verify-bounded
    * residual as the sweep path, now one rename wide. */
  def release(c: Claim): Unit = {
    c.beat.foreach { b =>
      b.shutdownNow()
      b.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
    }
    c.beat = None
    val (fs, p) = BucketFs.resolve(claimPath(c.dir, c.gen))
    val aside = new Path(p.getParent,
      s".${p.getName}.release.${java.util.UUID.randomUUID()}")
    val renamed =
      try fs.rename(p, aside)
      catch { case _: java.io.IOException => false }
    if (!renamed) return // absent (already swept/released): no-op
    val owned =
      try {
        val in = fs.open(aside)
        val bytes =
          try {
            val buf = new java.io.ByteArrayOutputStream()
            val b = new Array[Byte](256)
            var n = in.read(b)
            while (n >= 0) { buf.write(b, 0, n); n = in.read(b) }
            buf.toByteArray
          } finally in.close()
        nonceOf(new String(bytes, StandardCharsets.UTF_8)) == c.nonce
      } catch { case _: java.io.IOException => false }
    if (owned) { fs.delete(aside, false); () }
    else if (!fs.rename(aside, p)) { fs.delete(aside, false); () }
  }
}
