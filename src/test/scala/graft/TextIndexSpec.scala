package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.TextIndex

class TextIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def fixture = Seq(
    (0L, "spark table scan fast table"),
    (1L, "merge table slow"),
    (2L, "scan scan scan"),
    (3L, "nothing relevant here"),
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("save/load/search: manifest stats, postings pruning, ranking") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ti").toString
    try {
      TextIndex.save(fixture, "text", "doc_id", dir, nBuckets = 8)
      val idx = TextIndex.load(spark, dir)
      assert(idx.nDocs == 5)
      // dl: 5 + 3 + 3 + 3 + 1 (null text → one empty token, like bm25)
      assert(idx.sumDl == 15)
      val res = idx.search(Seq("table", "scan"), topK = 10)
      // only committed generations of the query terms' buckets appear in
      // the physical scan — STATIC partition filters, not best-effort DPP
      val pf = "PartitionFilters: \\[[^\\]]*\\]".r
        .findAllIn(res.queryExecution.executedPlan.toString).toSeq
      assert(pf.nonEmpty && pf.forall(l =>
          l.contains("gen#") &&
          (l.contains("bucket# IN") || "bucket#\\d+ (IN|=)".r
            .findFirstIn(l).isDefined)),
        s"postings scan lost gen/bucket partition pruning: $pf")
      val got = res.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      // docs 0,1,2 contain a query term; 3 and 4 must be absent
      assert(got.keySet == Set(0L, 1L, 2L))
      // doc 0 has both terms (tf 2+1) and must rank first
      assert(got(0L) == 1)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("corpus stats derive from postings without a second tokenize pass: " +
      "empty/whitespace/null docs each count dl = 1 (r21 optimization)") {
    // the r21 corpusStats reads per-doc dl back from the postings and
    // corrects for posting-less docs (normalized-empty → split("") =
    // [""] → dl 1); this case pins that correction against the old
    // tokenize-twice formula's values on every degenerate text shape
    val docs = Seq(
      (10L, "alpha beta alpha"), // dl 3
      (11L, ""),                 // dl 1 (split("") = [""])
      // trim strips spaces but NOT the tab, so this normalizes to " "
      // and splits to ["", ""] — dl 2, zero postings: the exact shape
      // a stats path that guessed "posting-less docs have dl 1" would
      // get wrong (the kept "" row carries the true size instead)
      (12L, "   \t  "),          // dl 2
      (13L, null.asInstanceOf[String]), // dl 1
      (14L, "gamma")             // dl 1
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_stats").toString
    try {
      TextIndex.save(docs.where($"doc_id" <= 12), "text", "doc_id", dir,
        nBuckets = 4)
      val base = TextIndex.load(spark, dir)
      assert(base.nDocs == 3 && base.sumDl == 6, // 3 + 1 + 2
        s"save stats: ${(base.nDocs, base.sumDl)}")
      assert(base.idRange.contains((10L, 12L)))
      // the "" bookkeeping rows must never reach disk: gen 0 postings
      // hold only doc 10's two real terms
      val onDisk = spark.read.parquet(s"$dir/postings")
      assert(onDisk.where(col("term") === "").count() == 0)
      assert(onDisk.select("id").distinct().count() == 1)
      val grown = base.append(docs.where($"doc_id" > 12), "text")
      assert(grown.nDocs == 5 && grown.sumDl == 8, // + 1 + 1
        s"append stats: ${(grown.nDocs, grown.sumDl)}")
      assert(grown.idRange.contains((10L, 14L)))
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("static read-back schemas equal a fresh footer inference for both " +
      "sub-datasets (r21 resolution fast path)") {
    // committed() trusts these schemas instead of inferring; drift in
    // column order, partition-col typing, or nullability would silently
    // mis-read every index scan
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_rbs").toString
    try {
      TextIndex.save(docs, "text", "doc_id", dir, nBuckets = 4)
      TextIndex.load(spark, dir)
        .append(Seq((3L, "gamma delta")).toDF("doc_id", "text"), "text")
      Seq("postings", "termstats").foreach { sub =>
        val inferred = spark.read.parquet(s"$dir/$sub").schema
        val static = graft.sources.TextIndex.readBackSchema(sub)
        assert(static == inferred, s"$sub: static $static != inferred $inferred")
      }
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("as-of: historical search equals the pre-append index, read-only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_tt").toString
    val ref = java.nio.file.Files.createTempDirectory("graft_ti_ttr").toString
    try {
      TextIndex.save(fixture.where($"doc_id" < 2), "text", "doc_id", dir,
        nBuckets = 8)
      TextIndex.load(spark, dir).append(fixture.where($"doc_id" >= 2), "text")
      val asOf = TextIndex.load(spark, dir, asOfGen = 1)
      // constants are the gen-0 prefix sums, not the head totals
      assert(asOf.nDocs == 2 && asOf.sumDl == 8)
      TextIndex.save(fixture.where($"doc_id" < 2), "text", "doc_id", ref,
        nBuckets = 8)
      val expect = TextIndex.load(spark, ref)
        .search(Seq("table", "scan"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val got = asOf.search(Seq("table", "scan"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == expect)
      // read-only + bounds
      val e = intercept[IllegalArgumentException](
        asOf.append(fixture.where($"doc_id" >= 2), "text"))
      assert(e.getMessage.contains("read-only"))
      intercept[IllegalArgumentException](TextIndex.load(spark, dir, asOfGen = 3))
      // head load unchanged
      assert(TextIndex.load(spark, dir).nDocs == 5)
    } finally {
      graft.sources.BucketFs.deleteRecursive(dir)
      graft.sources.BucketFs.deleteRecursive(ref)
    }
  }

  test("compact(vacuum = false): pre-commit handles keep reader grace; " +
       "vacuumOldGens retires the superseded generations") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_vac").toString
    try {
      TextIndex.save(fixture.where($"doc_id" < 2), "text", "doc_id", dir,
        nBuckets = 8)
      val pre = TextIndex.load(spark, dir)
        .append(fixture.where($"doc_id" >= 2), "text") // gens [0, 2)
      val expect = pre.search(Seq("table", "scan"), topK = 10)
        .collect().map(_.toSeq).toSet
      val compacted = pre.compact(vacuum = false)
      assert(compacted.baseGen == 2 && compacted.nGens == 3)
      def gens = new java.io.File(s"$dir/postings").listFiles()
        .map(_.getName).filter(_.startsWith("gen=")).toSet
      // superseded generations STAY on disk...
      assert(gens == Set("gen=0", "gen=1", "gen=2"), s"got $gens")
      // ...so the PRE-COMPACT handle still answers correctly (its gen
      // filter [0, 2) never sees the staged gen=2) — the grace window
      assert(pre.search(Seq("table", "scan"), topK = 10)
        .collect().map(_.toSeq).toSet == expect)
      // the post-compact handle ignores them (filter [2, 3))
      assert(compacted.search(Seq("table", "scan"), topK = 10)
        .collect().map(_.toSeq).toSet == expect)
      // vacuum retires exactly the generations below the live base
      val after = compacted.vacuumOldGens()
      assert(gens == Set("gen=2"), s"got $gens")
      assert(after.search(Seq("table", "scan"), topK = 10)
        .collect().map(_.toSeq).toSet == expect)
      // idempotent
      after.vacuumOldGens()
      assert(gens == Set("gen=2"))
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("compact: folds generations, scores unchanged, history renumbers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_cmp").toString
    try {
      TextIndex.save(fixture.where($"doc_id" < 2), "text", "doc_id", dir,
        nBuckets = 8)
      val grown = TextIndex.load(spark, dir)
        .append(fixture.where($"doc_id" >= 2), "text")
      val before = grown.search(Seq("table", "scan"), topK = 10)
        .collect().map(_.toSeq).toSet
      val compacted = grown.compact()
      assert(compacted.baseGen == 2 && compacted.nGens == 3)
      assert(compacted.nDocs == 5 && compacted.sumDl == 15)
      assert(compacted.search(Seq("table", "scan"), topK = 10)
        .collect().map(_.toSeq).toSet == before)
      // old generation directories are vacuumed
      val gens = new java.io.File(s"$dir/postings").listFiles()
        .map(_.getName).filter(_.startsWith("gen=")).toSet
      assert(gens == Set("gen=2"), s"unexpected generations: $gens")
      // pre-compaction history is folded away; post-compaction head works
      intercept[IllegalArgumentException](TextIndex.load(spark, dir, asOfGen = 1))
      // append after compact: chains, and as-of the compacted point works
      val grown2 = compacted.append(
        Seq((9L, "table table")).toDF("doc_id", "text"), "text")
      assert(grown2.nDocs == 6 && grown2.baseGen == 2 && grown2.nGens == 4)
      val asOf = TextIndex.load(spark, dir, asOfGen = 3)
      assert(asOf.nDocs == 5 && asOf.sumDl == 15)
      assert(asOf.search(Seq("table", "scan"), topK = 10)
        .collect().map(_.toSeq).toSet == before)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("model check: random append/compact sequences keep every reachable " +
      "as-of point equal to a from-scratch build of its batch prefix") {
    val rnd = new scala.util.Random(20260814L)
    val docsAll = (0L until 40L).map { i =>
      val words = Seq("table", "scan", "merge", "spark", "row", "plan")
      (i, (0 until 3 + rnd.nextInt(5))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    def search(idx: TextIndex.Bm25Index) =
      idx.search(Seq("table", "scan"), topK = 20)
        .collect().map(_.toSeq).toSet
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_ti_model$trial").toString
      val ref = java.nio.file.Files
        .createTempDirectory(s"graft_ti_modelr$trial").toString
      try {
        // batches(i) = the docs that generation (baseGen-relative) i added;
        // the reference model is just this list of batch slices
        var batches = Vector(docsAll.slice(0, 8))
        var next = 8
        TextIndex.save(batches(0).toDF("doc_id", "text"), "text", "doc_id",
          dir, nBuckets = 8)
        var idx = TextIndex.load(spark, dir)
        for (_ <- 1 to 4) {
          if (rnd.nextBoolean() && next < docsAll.length) {
            val take = math.min(4 + rnd.nextInt(5), docsAll.length - next)
            val b = docsAll.slice(next, next + take)
            next += take
            idx = idx.append(b.toDF("doc_id", "text"), "text")
            batches = batches :+ b
          } else {
            idx = idx.compact()
            batches = Vector(batches.flatten) // history folds to one batch
          }
          // every reachable as-of point must equal a from-scratch build
          // of the corresponding batch prefix
          for (k <- 1 to batches.length) {
            val g = idx.baseGen + k
            val asOf = TextIndex.load(spark, dir, asOfGen = g)
            graft.sources.BucketFs.deleteRecursive(ref)
            TextIndex.save(batches.take(k).flatten.toDF("doc_id", "text"),
              "text", "doc_id", ref, nBuckets = 8)
            val scratch = TextIndex.load(spark, ref)
            assert(asOf.nDocs == scratch.nDocs && asOf.sumDl == scratch.sumDl,
              s"trial $trial asOf=$g constants: " +
                s"(${asOf.nDocs},${asOf.sumDl}) vs " +
                s"(${scratch.nDocs},${scratch.sumDl})")
            assert(search(asOf) == search(scratch),
              s"trial $trial asOf=$g search mismatch")
          }
          // points at or before the base are refused
          intercept[IllegalArgumentException](
            TextIndex.load(spark, dir, asOfGen = idx.baseGen))
        }
      } finally {
        graft.sources.BucketFs.deleteRecursive(dir)
        graft.sources.BucketFs.deleteRecursive(ref)
      }
    }
  }

  test("append: grown index equals a from-scratch build, exactly") {
    val dir1 = java.nio.file.Files.createTempDirectory("graft_ti_a").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_ti_b").toString
    try {
      TextIndex.save(fixture.where($"doc_id" < 2), "text", "doc_id", dir1,
        nBuckets = 8)
      val grown = TextIndex.load(spark, dir1)
        .append(fixture.where($"doc_id" >= 2), "text")
      TextIndex.save(fixture, "text", "doc_id", dir2, nBuckets = 8)
      val scratch = TextIndex.load(spark, dir2)
      assert(grown.nDocs == scratch.nDocs && grown.sumDl == scratch.sumDl)
      val a = grown.search(Seq("table", "scan"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val b = scratch.search(Seq("table", "scan"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(a == b)
    } finally {
      graft.sources.BucketFs.deleteRecursive(dir1)
      graft.sources.BucketFs.deleteRecursive(dir2)
    }
  }

  test("search normalizes query terms like the indexed text") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_n").toString
    try {
      TextIndex.save(fixture, "text", "doc_id", dir, nBuckets = 8)
      val idx = TextIndex.load(spark, dir)
      def rows(terms: Seq[String]) = idx.search(terms, topK = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val plain = rows(Seq("table"))
      assert(plain.nonEmpty)
      assert(rows(Seq("Table")) == plain, "case must not matter")
      assert(rows(Seq("  TABLE  ")) == plain, "whitespace must not matter")
      // a multi-word query string tokenizes like indexed text does
      assert(rows(Seq("Table SCAN")) == rows(Seq("table", "scan")))
      // terms that normalize to nothing return an empty, well-formed frame
      val empty = idx.search(Seq("   "), topK = 5)
      assert(empty.columns.toSeq == Seq("doc_id", "rk", "bm25_q4"))
      assert(empty.count() == 0)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("crashed append: uncommitted generation is invisible and cleaned up") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_c").toString
    try {
      TextIndex.save(fixture.where($"doc_id" < 4), "text", "doc_id", dir,
        nBuckets = 8)
      val idx = TextIndex.load(spark, dir)
      val before = idx.search(Seq("table", "scan"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      // simulate an append that died after its data writes but BEFORE the
      // manifest commit: a gen=1 directory the manifest doesn't know about
      Seq(("table", 99L, 5L, 5L)).toDF("term", "id", "tf", "dl")
        .write.parquet(s"$dir/postings/gen=1/bucket=0")
      Seq(("table", 1L)).toDF("term", "df")
        .write.parquet(s"$dir/termstats/gen=1/bucket=0")
      val reloaded = TextIndex.load(spark, dir)
      val after = reloaded.search(Seq("table", "scan"), topK = 10)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(after == before, "uncommitted generation leaked into scoring")
      // the retry (a real append) must clean the debris, not merge with it
      val grown = reloaded.append(
        Seq((10L, "table fresh")).toDF("doc_id", "text"), "text")
      val ids = grown.search(Seq("table"), topK = 10)
        .collect().map(_.getLong(0)).toSet
      assert(ids.contains(10L) && !ids.contains(99L))
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("concurrent sessions: the writer claim serializes appends — " +
       "second session fails loudly, never co-writes a generation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_cc").toString
    try {
      TextIndex.save(fixture.where($"doc_id" < 4), "text", "doc_id", dir,
        nBuckets = 8)
      // two INDEPENDENT SparkSessions each load the same head (nGens = 1)
      val sA = spark.newSession(); val sB = spark.newSession()
      val hA = TextIndex.load(sA, dir)
      val hB = TextIndex.load(sB, dir)
      assert(hA.nGens == 1 && hB.nGens == 1)
      // A appends and commits generation 1
      val grownA = hA.append(
        Seq((10L, "table alpha")).toDF("doc_id", "text"), "text")
      assert(grownA.nGens == 2)
      // B's handle is now stale; without the claim-then-recheck ordering
      // B would pass its own pre-claim checks, sweep nothing (its
      // dropUncommittedGens targets gen >= 1 — A's committed data!), and
      // co-write gen 1. The claim re-check reports the moved head.
      val eStale = intercept[IllegalArgumentException](
        hB.append(Seq((11L, "table beta")).toDF("doc_id", "text"), "text"))
      assert(eStale.getMessage.contains("stale index handle"))
      // B's refused attempt must not have disturbed A's committed data
      assert(TextIndex.load(spark, dir).search(Seq("alpha"), topK = 5)
        .collect().map(_.getLong(0)).toSet == Set(10L))
      // a LIVE claim held by another writer refuses the second session
      // loudly before any mutation
      val claim = s"$dir/_writer_claim_gen=2"
      graft.sources.BucketFs.writeString(claim, "")
      val eClaim = intercept[IllegalStateException](
        TextIndex.load(sB, dir).append(
          Seq((12L, "gamma")).toDF("doc_id", "text"), "text"))
      assert(eClaim.getMessage.contains("another session is writing"))
      // a STALE claim (dead writer) is swept and the append proceeds
      val grownB = TextIndex.load(sB, dir).append(
        Seq((12L, "table gamma")).toDF("doc_id", "text"), "text",
        claimStaleness = 0L)
      assert(grownB.nGens == 3)
      assert(!graft.sources.BucketFs.exists(claim), "claim not released")
      // serialized protocol end state: every appended doc present once
      val ids = TextIndex.load(spark, dir).search(Seq("table"), topK = 20)
        .collect().map(_.getLong(0)).toSet
      assert(Set(10L, 12L).subsetOf(ids) && !ids.contains(11L))
      // compact takes the same claim: a live claim on the next gen
      // refuses it too
      graft.sources.BucketFs.writeString(s"$dir/_writer_claim_gen=3", "")
      val eCmp = intercept[IllegalStateException](
        TextIndex.load(spark, dir).compact())
      assert(eCmp.getMessage.contains("another session is writing"))
      graft.sources.BucketFs.deleteRecursive(s"$dir/_writer_claim_gen=3")
      assert(TextIndex.load(spark, dir).compact().nGens == 4)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("append rejects ids already in the index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_d").toString
    try {
      TextIndex.save(fixture.where($"doc_id" % 2 === 0), "text", "doc_id",
        dir, nBuckets = 8) // ids 0, 2, 4
      val idx = TextIndex.load(spark, dir)
      val ex = intercept[IllegalArgumentException] {
        idx.append(Seq((2L, "scan again")).toDF("doc_id", "text"), "text")
      }
      assert(ex.getMessage.contains("already in the index"))
      // interleaved-but-new ids (range overlap, no id overlap) still append
      val ok = TextIndex.load(spark, dir).append(
        Seq((3L, "brand new doc")).toDF("doc_id", "text"), "text")
      assert(ok.nDocs == 4)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("slow appender: a staged postings write outliving the staleness " +
       "window survives a second writer — exactly one commit, no " +
       "co-mingled postings (claim heartbeat end-to-end)") {
    import graft.sources.BucketFs
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_slow").toString
    try {
      TextIndex.save(fixture.where($"doc_id" < 4), "text", "doc_id", dir,
        nBuckets = 8)
      TextSlowGate.reached = new java.util.concurrent.CountDownLatch(1)
      TextSlowGate.go = new java.util.concurrent.CountDownLatch(1)
      val slowText = udf { t: String =>
        TextSlowGate.reached.countDown()
        TextSlowGate.go.await(120, java.util.concurrent.TimeUnit.SECONDS)
        t
      }
      val stalenessMs = 800L // beat period 200 ms
      val sA = spark.newSession(); val sB = spark.newSession()
      val hA = TextIndex.load(sA, dir)
      val hB = TextIndex.load(sB, dir)
      // parquet-backed gated batch: ConvertToLocalRelation evaluates
      // projections over in-memory relations driver-side at plan build,
      // which would fire the gate before append takes the claim (see the
      // DedupIndexSpec twin for the observed failure shape)
      Seq((10L, "wholly new appended document text")).toDF("doc_id", "text")
        .write.parquet(s"$dir/__slow_in")
      val gated = sA.read.parquet(s"$dir/__slow_in")
        .withColumn("text", slowText($"text"))
      @volatile var aGens: Either[Throwable, Int] = null
      val a = new Thread(() => {
        aGens =
          try Right(hA.append(gated, "text",
            claimStaleness = stalenessMs).nGens)
          catch { case t: Throwable => Left(t) }
      }, "slow-text-appender")
      a.start()
      assert(TextSlowGate.reached.await(
        120, java.util.concurrent.TimeUnit.SECONDS),
        "writer A never reached its staged write")
      // A's mutation now outlives the window; the claim heartbeat must
      // keep B out — without it B sweeps A, stages gen 1 itself, and its
      // commit co-mingles A's late-landing postings files
      Thread.sleep(3 * stalenessMs)
      val busy = intercept[IllegalStateException](
        hB.append(Seq((11L, "contender document")).toDF("doc_id", "text"),
          "text", claimStaleness = stalenessMs))
      assert(busy.getMessage.contains("another session is writing"))
      TextSlowGate.go.countDown()
      a.join(120000)
      assert(aGens != null, "writer A never finished")
      assert(aGens.fold(t => fail(s"writer A failed: $t"), identity) == 2)
      // exactly one commit: doc 10 indexed once, B's refused batch absent
      val idx = TextIndex.load(spark, dir)
      assert(idx.nDocs == 5)
      val hits = idx.search(Seq("appended"), topK = 10)
        .collect().map(_.getLong(0)).toSeq
      assert(hits == Seq(10L), s"got $hits")
      assert(idx.search(Seq("contender"), topK = 10).count() == 0)
      // slot free after release: B retries on a fresh handle
      assert(TextIndex.load(sB, dir)
        .append(Seq((11L, "contender document")).toDF("doc_id", "text"),
          "text").nGens == 3)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("save takes the whole-dir writer claim: a racing provisioner is " +
       "refused loudly and the eventual winner's stats are exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ti_savclm").toString
    val held = graft.sources.GenerationLock.claimDir(dir)
    val busy = intercept[IllegalStateException](
      TextIndex.save(fixture, "text", "doc_id", dir, nBuckets = 8))
    assert(busy.getMessage.contains("another session is writing"))
    intercept[IllegalArgumentException](TextIndex.load(spark, dir))
    graft.sources.GenerationLock.release(held)
    TextIndex.save(fixture, "text", "doc_id", dir, nBuckets = 8)
    val idx = TextIndex.load(spark, dir)
    assert(idx.nDocs == 5 && idx.nGens == 1)
    graft.sources.BucketFs.deleteRecursive(dir)
  }
}

/** Latch gate for the slow-appender spec (see [[SlowAppendGate]] for the
  * closure-serialization rationale). */
object TextSlowGate {
  @volatile var reached: java.util.concurrent.CountDownLatch = _
  @volatile var go: java.util.concurrent.CountDownLatch = _
}
