package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{BucketFs, DedupIndex}

/** Persisted MinHash/LSH dedup index: save/load/candidates round trip,
  * append ≡ from-scratch equivalence, the over-cap representative degrade,
  * and the keep-side filter. */
class DedupIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("id", "text")

  private val corpus = docs(
    1L -> "the quick brown fox jumps over the lazy dog again and again",
    2L -> "entirely different content describing spark execution engines",
    3L -> "another unrelated row of words that shares nothing with others")

  private val batch = docs(
    10L -> "the quick brown fox jumps over the lazy dog again and again",
    11L -> "completely novel text matching no archived document whatsoever")

  test("save/load/candidates: duplicates surface from stored signatures only") {
    val dir = java.nio.file.Files.createTempDirectory("dedupidx").toString
    try {
      DedupIndex.save(corpus, "text", "id", dir,
        shingleK = 3, numHashes = 8, bands = 4)
      val idx = DedupIndex.load(spark, dir)
      assert((idx.shingleK, idx.numHashes, idx.bands, idx.idCol) == (3, 8, 4, "id"))
      // every index scan filters to committed generations statically
      val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(
        idx.candidates(batch, "text", maxBucketSize = Int.MaxValue)
          .queryExecution.executedPlan.toString).toSeq
      assert(pf.nonEmpty && pf.forall(_.contains("gen#")),
        s"index scans lost gen partition pruning: $pf")
      val cands = idx.candidates(batch, "text", maxBucketSize = Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      // the exact duplicate agrees on every signature component
      assert(cands.contains((10L, 1L, 8)))
      // the novel doc matches nothing
      assert(!cands.exists(_._1 == 11L))
      val kept = idx.newDocsToKeep(batch, "text", minMatch = 6)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(11L))
    } finally BucketFs.deleteRecursive(dir)
  }

  test("append twice == one-shot save over the union (stats merged incrementally)") {
    val extra = docs(
      4L -> "yet more archived prose landing in its own lsh bucket somewhere",
      5L -> "the quick brown fox jumps over the lazy dog again and again")
    val dirA = java.nio.file.Files.createTempDirectory("dedupidx_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("dedupidx_b").toString
    try {
      DedupIndex.save(corpus, "text", "id", dirA,
        shingleK = 3, numHashes = 8, bands = 4)
      DedupIndex.load(spark, dirA)
        .append(extra.where($"id" === 4), "text")
        .append(extra.where($"id" === 5), "text")
      DedupIndex.save(corpus.unionByName(extra), "text", "id", dirB,
        shingleK = 3, numHashes = 8, bands = 4)
      def answer(d: String) = DedupIndex.load(spark, d)
        .candidates(batch, "text", maxBucketSize = Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val incremental = answer(dirA)
      assert(incremental == answer(dirB))
      assert(incremental.contains((10L, 5L, 8))) // appended dup is found
      // merged stats agree with a recount of the merged postings
      val statsA = DedupIndex.load(spark, dirA).bucketStats
        .select("band", "band_sig", "n", "rep_id")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      val recount = DedupIndex.load(spark, dirA).bandPostings
        .groupBy("band", "band_sig")
        .agg(count(lit(1)).as("n"), min($"id").as("rep_id"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(statsA == recount)
    } finally { BucketFs.deleteRecursive(dirA); BucketFs.deleteRecursive(dirB) }
  }

  test("over-cap buckets degrade to the stored representative (min id)") {
    val boiler = docs((1L to 5L).map(i =>
      i -> "identical boilerplate body repeated across the whole archive"): _*)
    val b = docs(10L -> "identical boilerplate body repeated across the whole archive")
    val dir = java.nio.file.Files.createTempDirectory("dedupidx_cap").toString
    try {
      DedupIndex.save(boiler, "text", "id", dir,
        shingleK = 3, numHashes = 8, bands = 4)
      val idx = DedupIndex.load(spark, dir)
      // uncapped: all five corpus copies enumerate
      assert(idx.candidates(b, "text", Int.MaxValue).count() == 5L)
      // capped below the bucket population: one O(1) witness, the min id
      val capped = idx.candidates(b, "text", maxBucketSize = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(capped.toSeq == Seq((10L, 1L, 8)))
    } finally BucketFs.deleteRecursive(dir)
  }

  test("as-of: historical candidates equal the pre-append index, read-only") {
    val dir = java.nio.file.Files.createTempDirectory("dedupidx_tt").toString
    try {
      val extra = docs(
        5L -> "the quick brown fox jumps over the lazy dog again and again")
      DedupIndex.save(corpus, "text", "id", dir,
        shingleK = 3, numHashes = 8, bands = 4)
      val preAppend = DedupIndex.load(spark, dir)
        .candidates(batch, "text", maxBucketSize = Int.MaxValue)
        .collect().map(_.toSeq).toSet
      DedupIndex.load(spark, dir).append(extra, "text")
      val asOf = DedupIndex.load(spark, dir, asOfGen = 1)
      assert(asOf.candidates(batch, "text", maxBucketSize = Int.MaxValue)
        .collect().map(_.toSeq).toSet == preAppend)
      // head sees the appended duplicate (id 5 duplicates batch id 10)
      assert(DedupIndex.load(spark, dir)
        .candidates(batch, "text", maxBucketSize = Int.MaxValue)
        .collect().exists(_.getLong(1) == 5L))
      val e = intercept[IllegalArgumentException](asOf.append(extra, "text"))
      assert(e.getMessage.contains("read-only"))
      intercept[IllegalArgumentException](DedupIndex.load(spark, dir, asOfGen = 9))
    } finally BucketFs.deleteRecursive(dir)
  }

  test("compact(vacuum = false): reader grace, then vacuumOldGens retires " +
       "the superseded generations") {
    val dir = java.nio.file.Files.createTempDirectory("dedupidx_vac").toString
    try {
      DedupIndex.save(corpus.where(col("id") < 3), "text", "id", dir,
        shingleK = 3, numHashes = 8, bands = 4)
      val pre = DedupIndex.load(spark, dir)
        .append(corpus.where(col("id") >= 3), "text") // gens [0, 2)
      val expect = pre.candidates(batch, "text", maxBucketSize = Int.MaxValue)
        .collect().map(_.toSeq).toSet
      val compacted = pre.compact(vacuum = false)
      assert(compacted.baseGen == 2 && compacted.nGens == 3)
      def gens = new java.io.File(s"$dir/bands").listFiles()
        .map(_.getName).filter(_.startsWith("gen=")).toSet
      assert(gens == Set("gen=0", "gen=1", "gen=2"), s"got $gens")
      // the pre-compact handle still answers from the old generations
      assert(pre.candidates(batch, "text", maxBucketSize = Int.MaxValue)
        .collect().map(_.toSeq).toSet == expect)
      assert(compacted.candidates(batch, "text", maxBucketSize = Int.MaxValue)
        .collect().map(_.toSeq).toSet == expect)
      val after = compacted.vacuumOldGens()
      assert(gens == Set("gen=2"), s"got $gens")
      assert(after.candidates(batch, "text", maxBucketSize = Int.MaxValue)
        .collect().map(_.toSeq).toSet == expect)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("compact: folds generations, candidates unchanged, vacuumed dirs") {
    val dir = java.nio.file.Files.createTempDirectory("dedupidx_cmp").toString
    try {
      DedupIndex.save(corpus.where(col("id") < 3), "text", "id", dir,
        shingleK = 3, numHashes = 8, bands = 4)
      val grown = DedupIndex.load(spark, dir)
        .append(corpus.where(col("id") >= 3), "text")
      val before = grown.candidates(batch, "text", maxBucketSize = Int.MaxValue)
        .collect().map(_.toSeq).toSet
      val compacted = grown.compact()
      assert(compacted.baseGen == 2 && compacted.nGens == 3)
      assert(compacted.candidates(batch, "text", maxBucketSize = Int.MaxValue)
        .collect().map(_.toSeq).toSet == before)
      val gens = new java.io.File(s"$dir/bands").listFiles()
        .map(_.getName).filter(_.startsWith("gen=")).toSet
      assert(gens == Set("gen=2"), s"unexpected generations: $gens")
      intercept[IllegalArgumentException](DedupIndex.load(spark, dir, asOfGen = 1))
      // append chains past the compaction
      val grown2 = compacted.append(
        docs(20L -> "yet more novel words unseen anywhere previously"), "text")
      assert(grown2.baseGen == 2 && grown2.nGens == 4)
      assert(grown2.candidates(batch, "text", maxBucketSize = Int.MaxValue)
        .collect().map(_.toSeq).toSet == before) // new doc is no dup
    } finally BucketFs.deleteRecursive(dir)
  }

  test("crashed append: uncommitted generation is invisible and swept on retry") {
    val dir = java.nio.file.Files.createTempDirectory("dedupidx_c").toString
    try {
      DedupIndex.save(corpus, "text", "id", dir,
        shingleK = 3, numHashes = 8, bands = 4)
      val before = DedupIndex.load(spark, dir)
        .candidates(batch, "text", Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // simulate an append that died after its data writes but BEFORE the
      // manifest commit: gen=1 band/signature debris the manifest ignores
      Seq(("sig_x", 99L)).toDF("band_sig", "id").withColumn("band", lit(0))
        .write.parquet(s"$dir/bands/gen=1/band=0")
      Seq((99L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))).toDF("id", "sig")
        .write.parquet(s"$dir/signatures/gen=1")
      val reloaded = DedupIndex.load(spark, dir)
      val after = reloaded.candidates(batch, "text", Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(after == before, "uncommitted generation leaked into candidates")
      // the retry (a real append) sweeps the debris instead of merging it
      val grown = reloaded.append(
        docs(50L -> "fresh archived content for the retry append"), "text")
      assert(grown.nGens == 2)
      assert(grown.signatures.where($"id" === 99L).count() == 0,
        "crashed-append debris survived the retry sweep")
    } finally BucketFs.deleteRecursive(dir)
  }

  test("append refuses a stale handle (would sweep a committed generation)") {
    val dir = java.nio.file.Files.createTempDirectory("dedupidx_s").toString
    try {
      DedupIndex.save(corpus, "text", "id", dir,
        shingleK = 3, numHashes = 8, bands = 4)
      val idx = DedupIndex.load(spark, dir)
      idx.append(docs(40L -> "first append committed elsewhere"), "text")
      val e = intercept[IllegalArgumentException](
        idx.append(docs(41L -> "second append through the stale handle"), "text"))
      assert(e.getMessage.contains("stale index handle"))
    } finally BucketFs.deleteRecursive(dir)
  }

  test("concurrent sessions: the writer claim serializes appends — " +
       "second session fails loudly, never co-writes a generation") {
    val dir = java.nio.file.Files.createTempDirectory("dedupidx_cc").toString
    try {
      DedupIndex.save(corpus, "text", "id", dir,
        shingleK = 3, numHashes = 8, bands = 4)
      // two INDEPENDENT SparkSessions each load the same head (nGens = 1)
      val sA = spark.newSession(); val sB = spark.newSession()
      val hA = DedupIndex.load(sA, dir)
      val hB = DedupIndex.load(sB, dir)
      assert(hA.nGens == 1 && hB.nGens == 1)
      // A appends and commits generation 1
      val grownA = hA.append(docs(20L -> "session a archived prose"), "text")
      assert(grownA.nGens == 2)
      // B's handle is now stale; without the claim-then-recheck ordering
      // B would pass its own pre-claim checks, sweep A's COMMITTED gen 1
      // as debris, and co-write gen 1. The claim re-check reports the
      // moved head instead.
      val eStale = intercept[IllegalArgumentException](
        hB.append(docs(21L -> "session b racing prose"), "text"))
      assert(eStale.getMessage.contains("stale index handle"))
      // B's refused attempt must not have disturbed A's committed rows
      assert(DedupIndex.load(spark, dir).signatures
        .where($"id" === 20L).count() == 1)
      assert(DedupIndex.load(spark, dir).signatures
        .where($"id" === 21L).count() == 0)
      // a LIVE claim held by another writer refuses the second session
      // loudly before any mutation
      val claim = s"$dir/_writer_claim_gen=2"
      BucketFs.writeString(claim, "")
      val eClaim = intercept[IllegalStateException](
        DedupIndex.load(sB, dir).append(docs(22L -> "gamma row"), "text"))
      assert(eClaim.getMessage.contains("another session is writing"))
      // a STALE claim (dead writer) is swept and the append proceeds
      val grownB = DedupIndex.load(sB, dir).append(
        docs(22L -> "gamma row archived"), "text", claimStaleness = 0L)
      assert(grownB.nGens == 3)
      assert(!BucketFs.exists(claim), "claim not released")
      // serialized end state: each committed append present exactly once
      val sigs = DedupIndex.load(spark, dir).signatures
        .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sigs.get(20L).contains(1L) && sigs.get(22L).contains(1L) &&
        !sigs.contains(21L))
      // compact takes the same claim: a live claim on the next gen
      // refuses it too
      BucketFs.writeString(s"$dir/_writer_claim_gen=3", "")
      val eCmp = intercept[IllegalStateException](
        DedupIndex.load(spark, dir).compact())
      assert(eCmp.getMessage.contains("another session is writing"))
      BucketFs.deleteRecursive(s"$dir/_writer_claim_gen=3")
      assert(DedupIndex.load(spark, dir).compact().nGens == 4)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("slow appender: a staged signature write outliving the staleness " +
       "window survives a second writer — exactly one commit, no " +
       "co-mingled rows (claim heartbeat end-to-end)") {
    val dir = java.nio.file.Files.createTempDirectory("dedupidx_slow").toString
    try {
      DedupIndex.save(corpus, "text", "id", dir,
        shingleK = 3, numHashes = 8, bands = 4)
      DedupSlowGate.reached = new java.util.concurrent.CountDownLatch(1)
      DedupSlowGate.go = new java.util.concurrent.CountDownLatch(1)
      // latch-gated text column: evaluated inside appendSigs' staged
      // write, so writer A blocks mid-stage with the gen-1 claim held —
      // a stand-in for a signature job outliving the staleness window
      val slowText = udf { t: String =>
        DedupSlowGate.reached.countDown()
        DedupSlowGate.go.await(120, java.util.concurrent.TimeUnit.SECONDS)
        t
      }
      val stalenessMs = 800L // beat period 200 ms
      val sA = spark.newSession(); val sB = spark.newSession()
      val hA = DedupIndex.load(sA, dir)
      val hB = DedupIndex.load(sB, dir)
      // the gated batch must be parquet-backed, NOT a LocalRelation:
      // ConvertToLocalRelation evaluates projections over LocalRelation
      // driver-side as soon as any plan is built (minHashSignature's
      // fanOut touches df.rdd, which optimizes), so an in-memory batch
      // would fire the gate BEFORE appendSigs takes the claim and the
      // test would block writer A pre-claim (observed: B then appends
      // into an unclaimed slot and the test asserts nothing real)
      docs(30L -> "slow archived prose staged for a long time")
        .write.parquet(s"$dir/__slow_in")
      val gated = sA.read.parquet(s"$dir/__slow_in")
        .withColumn("text", slowText($"text"))
      @volatile var aGens: Either[Throwable, Int] = null
      val a = new Thread(() => {
        aGens =
          try Right(hA.append(gated, "text",
            claimStaleness = stalenessMs).nGens)
          catch { case t: Throwable => Left(t) }
      }, "slow-dedup-appender")
      a.start()
      assert(DedupSlowGate.reached.await(
        120, java.util.concurrent.TimeUnit.SECONDS),
        "writer A never reached its staged write")
      // A's claim is now older than the window in wall-clock terms; the
      // heartbeat must keep it fresh so B is refused instead of sweeping
      // A and co-writing generation 1
      Thread.sleep(3 * stalenessMs)
      val busy = intercept[IllegalStateException](
        hB.append(docs(31L -> "contender prose"), "text",
          claimStaleness = stalenessMs))
      assert(busy.getMessage.contains("another session is writing"))
      DedupSlowGate.go.countDown()
      a.join(120000)
      assert(aGens != null, "writer A never finished")
      assert(aGens.fold(t => fail(s"writer A failed: $t"), identity) == 2)
      // exactly one commit: id 30 once, B's refused batch absent
      val counts = DedupIndex.load(spark, dir).signatures
        .groupBy("id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(counts.get(30L).contains(1L), s"co-mingled or lost: $counts")
      assert(!counts.contains(31L))
      // slot free after A's release: B retries on a fresh handle
      assert(DedupIndex.load(sB, dir)
        .append(docs(31L -> "contender prose"), "text").nGens == 3)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("load: non-index directory fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("notadedupidx").toString
    try {
      val e = intercept[IllegalArgumentException](DedupIndex.load(spark, dir))
      assert(e.getMessage.contains("_dedup_index.json"))
    } finally BucketFs.deleteRecursive(dir)
  }

  test("manifest read-back schemas equal a fresh footer inference for every " +
       "sub-dataset, across save/append/compact (r21 resolution fast path)") {
    // the loader trusts these schemas INSTEAD of inferring — if the
    // reconstruction ever drifted from what spark.read.parquet would
    // return (column order, partition-col typing, recursive nullability
    // of the packed sig array), index scans would silently mis-read
    val dir = java.nio.file.Files.createTempDirectory("dedupidx_rbs").toString
    def check(stage: String): Unit = {
      val idx = DedupIndex.load(spark, dir)
      assert(idx.schemas.keySet == Set("bands", "signatures", "bucket_stats"),
        s"$stage: schemas missing from manifest")
      idx.schemas.foreach { case (sub, stored) =>
        val inferred = spark.read.parquet(s"$dir/$sub").schema
        assert(stored == inferred,
          s"$stage/$sub: stored $stored != inferred $inferred")
      }
    }
    try {
      DedupIndex.save(corpus, "text", "id", dir,
        shingleK = 3, numHashes = 8, bands = 4)
      check("save")
      DedupIndex.load(spark, dir).append(batch, "text")
      check("append")
      DedupIndex.load(spark, dir).compact()
      check("compact")
      // and the fast-path frames answer exactly like inference would
      val cands = DedupIndex.load(spark, dir)
        .candidates(docs(20L -> "the quick brown fox jumps over the lazy dog again and again"),
          "text", maxBucketSize = Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(cands.exists { case (_, c, m) => (c == 1L || c == 10L) && m == 8 },
        s"duplicate failed to surface through schema-fast-path scans: $cands")
    } finally BucketFs.deleteRecursive(dir)
  }

  test("save takes the whole-dir writer claim: a racing provisioner is " +
       "refused loudly and the slot serves the eventual winner exactly") {
    val dir = java.nio.file.Files.createTempDirectory("dedupidx_savclm").toString
    // an in-flight save (or any whole-dir mutator) holds the dir slot
    val held = graft.sources.GenerationLock.claimDir(dir)
    val busy = intercept[IllegalStateException](
      DedupIndex.save(corpus, "text", "id", dir))
    assert(busy.getMessage.contains("another session is writing"))
    // the refused save wrote NOTHING: no manifest to load
    intercept[IllegalArgumentException](DedupIndex.load(spark, dir))
    graft.sources.GenerationLock.release(held)
    DedupIndex.save(corpus, "text", "id", dir)
    val idx = DedupIndex.load(spark, dir)
    assert(idx.signatures.count() == 3 && idx.nGens == 1)
    BucketFs.deleteRecursive(dir)
  }
}

/** Latch gate for the slow-appender spec (see [[SlowAppendGate]] for the
  * closure-serialization rationale). */
object DedupSlowGate {
  @volatile var reached: java.util.concurrent.CountDownLatch = _
  @volatile var go: java.util.concurrent.CountDownLatch = _
}
