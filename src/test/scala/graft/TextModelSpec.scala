package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** DSIR importance resampling, the Naive Bayes quality classifier, and
  * the JSONL ingestion source. */
class TextModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("wordFeatures: unigrams plus bigrams with multiplicity, empty-safe") {
    val df = Seq("The  quick fox", "solo", "", "a a a").toDF("text")
    val got = df.select(TextAnalysis.wordFeatures($"text").as("f"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("the", "quick", "fox", "the quick", "quick fox"))
    assert(got(1) == Seq("solo"))
    assert(got(2) == Seq.empty)
    assert(got(3) == Seq("a", "a", "a", "a a", "a a"))
  }

  test("dsirBucketWeights: closed over the bucket space, smoothed ratios") {
    val raw = Seq("x x y", "y z").toDF("text")        // feats: uni 5 + bi 3 = 8
    val target = Seq("x x").toDF("text")              // feats: x, x, "x x" = 3
    val b = 16
    val w = TextAnalysis.dsirBucketWeights(raw, target, "text", buckets = b)
      .weights.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size == b && w.keySet == (0L until b.toLong).toSet)
    def q(num: Long, den: Long) =
      math.floor(1e4 * math.log(num.toDouble / den.toDouble)).toLong
    // a bucket unseen in BOTH corpora carries the pure smoothing weight
    val unseen = q(1, 3 + b) - q(1, 8 + b)
    // raw has 8 occurrences spread over <=7 buckets, target 3 over <=2:
    // at least one of 16 buckets is empty on both sides
    assert(w.values.count(_ == unseen) >= b - 9)
    // total ratio mass is conserved: every weight is a difference of two
    // monotone terms, so the max weight must come from a target-heavy
    // bucket ("x" appears twice in target, twice in raw)
    val xB = TextAnalysis.featureBucket(lit("x"), b)
    val xBucket = raw.select(xB).head().getLong(0)
    assert(w(xBucket) == q(2 + 1, 3 + b) - q(2 + 1, 8 + b))
  }

  test("dsirScore: brute-force agreement on a tiny corpus") {
    val docs = Seq((1L, "x x y"), (2L, "y z"), (3L, "")).toDF("id", "text")
    val w = TextAnalysis.dsirBucketWeights(docs, docs.where($"id" === 1), "text", 32)
    val wm = w.weights.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val feats = Map(1L -> Seq("x", "x", "y", "x x", "x y"),
                    2L -> Seq("y", "z", "y z"))
    def bk(f: String): Long =
      docs.select(TextAnalysis.featureBucket(lit(f), 32)).head().getLong(0)
    val got = TextAnalysis.dsirScore(docs, "id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = feats.map { case (id, fs) =>
      (id, fs.size.toLong, fs.map(f => wm(bk(f))).sum)
    }.toSet
    assert(got == want) // empty doc 3 absent from both
  }

  test("naive bayes: hand-checked weights, OOV path, prior, single-class guard") {
    val labeled = Seq(
      (true, "good good fine"), (true, "good"),
      (false, "bad awful"), (false, "bad")).toDF("y", "text")
    val m = TextAnalysis.naiveBayesTrain(labeled, "text", "y")
    def q(num: Long, den: Long) =
      math.floor(1e4 * math.log(num.toDouble / den.toDouble)).toLong
    // vocab = {good, fine, bad, awful} -> v=4, vs=5; np=4, nn=3
    assert(m.priorQ4 == q(2, 4) - q(2, 4))
    assert(m.unknownQ4 == q(1, 9) - q(1, 8))
    val wm = m.tokenWeights.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wm("good") == q(4, 9) - q(1, 8))
    assert(wm("bad") == q(1, 9) - q(3, 8))
    // scoring: known-token doc classifies positive, OOV-only doc takes
    // unknownQ4 per token
    val score = TextAnalysis.naiveBayesScore(
      Seq((10L, "good fine"), (11L, "zzz zzz")).toDF("id", "text"),
      "id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(score(10L) == (2L, m.priorQ4 + wm("good") + wm("fine")))
    assert(score(11L) == (2L, m.priorQ4 + 2 * m.unknownQ4))
    intercept[IllegalArgumentException] {
      TextAnalysis.naiveBayesTrain(
        Seq((true, "a")).toDF("y", "text"), "text", "y")
    }
    // empty frame must hit the same guard, not an NPE on the null SUM
    intercept[IllegalArgumentException] {
      TextAnalysis.naiveBayesTrain(
        Seq.empty[(Boolean, String)].toDF("y", "text"), "text", "y")
    }
  }

  test("jsonl: valid rows parse, malformed lines quarantine without a throw") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec")
      .toString
    val lines = Seq(
      """{"id":1,"text":"hello world","n":11}""",
      "", // blank line: from_json yields a NULL STRUCT, not a corrupt row
      """{"id":2,"text":"bye","n":3}""",
      """{"id":3,"text":"truncat""", // malformed
      """not json at all""",
      "   ") // whitespace-only: also a null struct
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = new StructType()
      .add("id", LongType).add("text", StringType).add("n", LongType)
    val parsed = graft.sources.Jsonl.read(spark, dir, schema)
    val valid = graft.sources.Jsonl.valid(parsed)
    assert(valid.count() == 2)
    assert(valid.agg(sum($"n")).head().getLong(0) == 14L)
    // partial parses (line 3 decodes id before the syntax error) must
    // still quarantine whole — valid/corrupt key off the quarantine
    // column, never field nullness
    val corrupt = graft.sources.Jsonl.corrupt(parsed)
      .as[String].collect().toSet
    assert(corrupt == Set("", "   ", lines(3), lines(4)))
    intercept[IllegalArgumentException] {
      graft.sources.Jsonl.read(spark, dir,
        schema.add(graft.sources.Jsonl.CorruptCol, StringType))
    }
    // streaming read over the same dir: identical valid/corrupt split
    val sq = graft.sources.Jsonl.readStream(spark, dir, schema,
        maxFilesPerTrigger = Some(1))
      .writeStream.format("memory").queryName("jsonl_stream_spec")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    sq.awaitTermination()
    val streamed = spark.table("jsonl_stream_spec")
    assert(graft.sources.Jsonl.valid(streamed).count() == 2)
    assert(graft.sources.Jsonl.corrupt(streamed)
      .as[String].collect().toSet == corrupt)
  }

  test("tsv: valid rows parse, malformed lines quarantine, quotes literal") {
    import graft.sources.Csv
    import org.apache.spark.sql.types._
    val schema = new StructType()
      .add("id", LongType).add("text", StringType).add("n", LongType)
    val lines = Seq(
      "1\thello world\t11",
      "2\tsays \"hi\" there\t15", // stray quotes stay literal
      "3\ttoo few fields", // missing column
      "4\tbad number\t12x", // Long field fails to parse
      "5\t\t0" // empty text field
    ).toDF("value")
    val parsed = Csv.parseLines(lines, schema, "\t")
    val ok = Csv.valid(parsed).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(ok.map(_._1).toSeq == Seq(1L, 2L, 5L))
    assert(ok(1)._2 == "says \"hi\" there", "quote chars must stay literal")
    val bad = Csv.corrupt(parsed).collect().map(_.getString(0)).toSet
    assert(bad == Set("3\ttoo few fields", "4\tbad number\t12x"))
    // valid + corrupt partition the input
    assert(Csv.valid(parsed).count() + bad.size == 5)
    intercept[IllegalArgumentException](Csv.parseLines(lines, schema, "||"))
  }

  test("clusterBalancedSample: sqrt budgets, md5-order selection, floor-to-1") {
    import graft.operators.Sampling
    // clusters: a=16 rows, b=4 rows, c=1 row
    val rows = (0 until 16).map(i => (i.toLong, "a")) ++
      (16 until 20).map(i => (i.toLong, "b")) :+ (20L, "c")
    val df = rows.toDF("id", "cl")
    val kept = Sampling.clusterBalancedSample(df, "id", "cl", totalBudget = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // wq = 1e6*{4, 2, 1}, z = 7e6 -> budgets floor(10*w/z) = {5, 2, 1}
    val byCl = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCl("a").size == 5 && byCl("b").size == 2 && byCl("c") == Set(20L))
    // selection = first-k in md5(id) order
    def md5Order(ids: Seq[Long], k: Int): Set[Long] = {
      val m = java.security.MessageDigest.getInstance("MD5")
      ids.sortBy { i =>
        m.reset()
        m.digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }.take(k).toSet
    }
    assert(byCl("a") == md5Order(0L until 16L, 5))
    assert(byCl("b") == md5Order(16L until 20L, 2))
    // null-cluster rows are excluded AND don't deflate real budgets
    val withNulls = df.unionByName(
      Seq.fill(30)((99L, null: String)).toDF("id", "cl"))
    val kept2 = Sampling.clusterBalancedSample(withNulls, "id", "cl", 10)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(kept2.sorted.sameElements(kept.sorted))
  }

  test("TextModelStore: char-LM counts round-trip; append == one-shot train") {
    import graft.sources.TextModelStore
    val dir = java.nio.file.Files.createTempDirectory("graft_clm").toString
    try {
      val docs = Seq((0L, "abc abc zq"), (1L, "abcd"), (2L, "zz"),
        (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
      val inline = TextAnalysis.charLmTrain(docs, "text", n = 3)
      val score = (c: TextAnalysis.CharLmCounts) =>
        TextAnalysis.charLmScore(docs, "doc_id", "text", c.ngrams,
          c.contexts, n = 3, vocabSize = 128)
          .collect().map(_.toSeq).toSet
      val expect = score(inline)
      // roundtrip
      TextModelStore.saveCharLm(docs, "text", s"$dir/a", n = 3)
      val ra = TextModelStore.loadCharLm(spark, s"$dir/a")
      assert(ra.n == 3 && score(ra) == expect)
      // append(odds) after save(evens) == one-shot; crashed debris swept
      TextModelStore.saveCharLm(docs.where($"doc_id" % 2 === 0), "text",
        s"$dir/b", n = 3)
      graft.sources.BucketFs.writeString(
        s"$dir/b/ngrams/gen=1/junk.parquet", "debris\n")
      TextModelStore.appendCharLm(spark,
        docs.where($"doc_id" % 2 === 1), "text", s"$dir/b")
      val rb = TextModelStore.loadCharLm(spark, s"$dir/b")
      assert(score(rb) == expect)
      assert(rb.ngrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == inline.ngrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      // wrong model type rejected by name
      intercept[IllegalArgumentException] {
        TextModelStore.loadNaiveBayes(spark, s"$dir/a")
      }
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("TextModelStore: concurrent sessions — the writer claim serializes " +
       "appends; second session fails loudly, never double-counts") {
    import graft.sources.{BucketFs, TextModelStore}
    val dir = java.nio.file.Files.createTempDirectory("graft_tms_cc").toString
    try {
      val labeled = Seq((true, "good good fine"), (true, "good"),
        (false, "bad awful"), (false, "bad")).toDF("y", "text")
      val oneShot = TextAnalysis.naiveBayesTrain(labeled, "text", "y")
      val firstHalf = labeled.where($"text".isin("good", "bad"))
      val secondHalf = labeled.where(!$"text".isin("good", "bad"))
      TextModelStore.saveNaiveBayes(firstHalf, "text", "y", s"$dir/nb")
      // a LIVE claim held by another session (mid-append) refuses this
      // session LOUDLY before any mutation: without it, two sessions
      // reading head gen=0 would each merge their batch into the SAME
      // prior and the loser's manifest commit would double-count
      val claim = s"$dir/nb/_writer_claim_gen=1"
      BucketFs.writeString(claim, "")
      val sB = spark.newSession()
      val eClaim = intercept[IllegalStateException](
        TextModelStore.appendNaiveBayes(sB, secondHalf, "text", "y",
          s"$dir/nb"))
      assert(eClaim.getMessage.contains("another session is writing"))
      // the refused attempt must not have disturbed the committed model
      val half = TextModelStore.loadNaiveBayes(spark, s"$dir/nb")
      assert(half.tokenWeights.count() ==
        TextAnalysis.naiveBayesTrain(firstHalf, "text", "y")
          .tokenWeights.count())
      // a STALE claim (dead writer) is swept and the append proceeds;
      // the claim is released afterwards
      TextModelStore.appendNaiveBayes(sB, secondHalf, "text", "y",
        s"$dir/nb", claimStaleness = 0L)
      assert(!BucketFs.exists(claim), "claim not released")
      val merged = TextModelStore.loadNaiveBayes(spark, s"$dir/nb")
      assert(merged.priorQ4 == oneShot.priorQ4 &&
        merged.unknownQ4 == oneShot.unknownQ4)
      assert(merged.tokenWeights.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap ==
        oneShot.tokenWeights.collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap)
      // char-LM appends take the same claim
      val docs = Seq((0L, "abc abc"), (1L, "abcd")).toDF("doc_id", "text")
      TextModelStore.saveCharLm(docs.where($"doc_id" === 0), "text",
        s"$dir/clm", n = 3)
      BucketFs.writeString(s"$dir/clm/_writer_claim_gen=1", "")
      val eClm = intercept[IllegalStateException](
        TextModelStore.appendCharLm(sB, docs.where($"doc_id" === 1), "text",
          s"$dir/clm"))
      assert(eClm.getMessage.contains("another session is writing"))
      TextModelStore.appendCharLm(sB, docs.where($"doc_id" === 1), "text",
        s"$dir/clm", claimStaleness = 0L)
      val got = TextModelStore.loadCharLm(spark, s"$dir/clm")
      val expect = TextAnalysis.charLmTrain(docs, "text", n = 3)
      assert(got.ngrams.collect().map(r => r.getString(0) -> r.getLong(1))
        .toMap == expect.ngrams.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("TextModelStore: exact round trips, crashed save fails loudly, type check") {
    import graft.sources.TextModelStore
    val dir = java.nio.file.Files.createTempDirectory("graft_tms").toString
    val labeled = Seq((true, "good good fine"), (true, "good"),
      (false, "bad awful"), (false, "bad")).toDF("y", "text")
    val m = TextAnalysis.naiveBayesTrain(labeled, "text", "y")
    TextModelStore.saveNaiveBayes(labeled, "text", "y", s"$dir/nb")
    val lm = TextModelStore.loadNaiveBayes(spark, s"$dir/nb")
    assert(lm.priorQ4 == m.priorQ4 && lm.unknownQ4 == m.unknownQ4)
    val score = (mm: TextAnalysis.NaiveBayesModel) =>
      TextAnalysis.naiveBayesScore(
        Seq((1L, "good zzz")).toDF("id", "text"), "id", "text", mm)
        .head().getLong(2)
    assert(score(lm) == score(m))
    // incremental append: save(half) + append(half) == one-shot train,
    // including the OOV/prior scalars; crashed-append debris is swept
    val firstHalf = labeled.where($"text".isin("good", "bad"))
    TextModelStore.saveNaiveBayes(firstHalf, "text", "y", s"$dir/nb2")
    graft.sources.BucketFs.writeString(
      s"$dir/nb2/counts/gen=1/junk.parquet", "debris of a crashed append\n")
    TextModelStore.appendNaiveBayes(spark,
      labeled.where(!$"text".isin("good", "bad")), "text", "y", s"$dir/nb2")
    val am = TextModelStore.loadNaiveBayes(spark, s"$dir/nb2")
    assert(am.priorQ4 == m.priorQ4 && am.unknownQ4 == m.unknownQ4)
    assert(score(am) == score(m))
    assert(am.tokenWeights.collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap == m.tokenWeights.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap)
    // dsir round trip keeps the bucket modulus
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("id", "text")
    val dw = TextAnalysis.dsirBucketWeights(docs, docs.where($"id" === 1),
      "text", buckets = 64)
    TextModelStore.saveDsir(dw, s"$dir/dsir")
    val ldw = TextModelStore.loadDsir(spark, s"$dir/dsir")
    assert(ldw.buckets == 64)
    assert(TextAnalysis.dsirScore(docs, "id", "text", ldw).collect().toSet
      == TextAnalysis.dsirScore(docs, "id", "text", dw).collect().toSet)
    // a save that died before the manifest commit must refuse to load
    graft.sources.BucketFs.deleteRecursive(
      s"$dir/nb/${TextModelStore.ManifestFile}")
    intercept[IllegalArgumentException] {
      TextModelStore.loadNaiveBayes(spark, s"$dir/nb")
    }
    // and a model dir of the wrong type must be rejected by name
    intercept[IllegalArgumentException] {
      TextModelStore.loadNaiveBayes(spark, s"$dir/dsir")
    }
  }

  test("slow NB appender: a staged counts write outliving the staleness " +
       "window survives a second writer — exactly one commit (claim " +
       "heartbeat end-to-end)") {
    import graft.sources.{BucketFs, TextModelStore}
    val dir = java.nio.file.Files.createTempDirectory("graft_tms_slow").toString
    try {
      TextModelStore.saveNaiveBayes(
        Seq((true, "good fine nice"), (false, "bad awful")).toDF("y", "text"),
        "text", "y", dir)
      ModelSlowGate.reached = new java.util.concurrent.CountDownLatch(1)
      ModelSlowGate.go = new java.util.concurrent.CountDownLatch(1)
      val slowText = udf { t: String =>
        ModelSlowGate.reached.countDown()
        ModelSlowGate.go.await(120, java.util.concurrent.TimeUnit.SECONDS)
        t
      }
      val stalenessMs = 800L // beat period 200 ms
      // parquet-backed gated batch (ConvertToLocalRelation would run the
      // udf at plan build otherwise — see the DedupIndexSpec twin)
      Seq((true, "great solid")).toDF("y", "text")
        .write.parquet(s"$dir/__slow_in")
      val gated = spark.read.parquet(s"$dir/__slow_in")
        .withColumn("text", slowText($"text"))
      @volatile var aDone: Either[Throwable, Unit] = null
      val a = new Thread(() => {
        aDone =
          try Right(TextModelStore.appendNaiveBayes(spark.newSession(), gated,
            "text", "y", dir, claimStaleness = stalenessMs))
          catch { case t: Throwable => Left(t) }
      }, "slow-nb-appender")
      a.start()
      assert(ModelSlowGate.reached.await(
        120, java.util.concurrent.TimeUnit.SECONDS),
        "writer A never reached its staged write")
      Thread.sleep(3 * stalenessMs)
      // the heartbeat keeps A's gen-1 claim fresh: B is refused loudly
      // instead of sweeping A and co-writing the merged counts
      val busy = intercept[IllegalStateException](
        TextModelStore.appendNaiveBayes(spark.newSession(),
          Seq((false, "contender text")).toDF("y", "text"), "text", "y",
          dir, claimStaleness = stalenessMs))
      assert(busy.getMessage.contains("another session is writing"))
      ModelSlowGate.go.countDown()
      a.join(120000)
      assert(aDone != null, "writer A never finished")
      aDone.left.foreach(t => fail(s"writer A failed: $t"))
      // exactly one commit: A's batch merged once, B's absent — the
      // reloaded model scores A's tokens as learned, B's as unseen
      val counts = TextModelStore.loadNaiveBayesCounts(spark, dir)
      val toks = counts.tokenCounts.select("token")
        .collect().map(_.getString(0)).toSet
      assert(toks.contains("great") && !toks.contains("contender"))
      assert(counts.nd == 3 && counts.ndPos == 2)
      // slot free after release: B retries and lands generation 2
      TextModelStore.appendNaiveBayes(spark.newSession(),
        Seq((false, "contender text")).toDF("y", "text"), "text", "y", dir)
      val after = TextModelStore.loadNaiveBayesCounts(spark, dir)
      assert(after.nd == 4 && after.ndPos == 2)
    } finally BucketFs.deleteRecursive(dir)
  }

  test("model-store saves take the whole-dir writer claim: a racing " +
       "provisioner is refused loudly, winner's model intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nb_savclm").toString
    val labeled = Seq(
      ("clean text about spark engines", true), ("buy now cheap pills", false),
      ("structured data pipelines", true), ("winner click here now", false)
    ).toDF("text", "label")
    val held = graft.sources.GenerationLock.claimDir(dir)
    val busy = intercept[IllegalStateException](
      graft.sources.TextModelStore.saveNaiveBayes(labeled, "text", "label", dir))
    assert(busy.getMessage.contains("another session is writing"))
    graft.sources.GenerationLock.release(held)
    graft.sources.TextModelStore.saveNaiveBayes(labeled, "text", "label", dir)
    val m = graft.sources.TextModelStore.loadNaiveBayesCounts(spark, dir)
    assert(m.nd == 4 && m.ndPos == 2)
    graft.sources.BucketFs.deleteRecursive(dir)
  }
}

/** Latch gate for the slow-appender spec (see [[SlowAppendGate]] for the
  * closure-serialization rationale). */
object ModelSlowGate {
  @volatile var reached: java.util.concurrent.CountDownLatch = _
  @volatile var go: java.util.concurrent.CountDownLatch = _
}
