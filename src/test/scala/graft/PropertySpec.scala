package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.partitioning._

/** Property tests (SURVEY §5 plan item 2): randomized partitioning configs
  * checked for the invariants that pruning correctness hangs on. A fixed
  * seed + batched Spark jobs keep it fast and reproducible.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val rng = new scala.util.Random(20260812L)

  private def randomConfig(): (XYPartitioning, Seq[Double], Seq[Double]) = {
    val xmin = math.rint((rng.nextDouble() * 200 - 100) * 4) / 4
    val xmax = xmin + 1 + rng.nextInt(50)
    val ymin = math.rint((rng.nextDouble() * 100 - 50) * 4) / 4
    val ymax = ymin + 1 + rng.nextInt(30)
    val sizes = Seq(0.25, 0.5, 1.0, 2.0, 2.5, 5.0)
    val sx = sizes(rng.nextInt(sizes.length))
    val sy = sizes(rng.nextInt(sizes.length))
    val p = XYPartitioning(size = (sx, sy), extent = Extent(xmin, xmax, ymin, ymax))
    val xs = Seq.fill(60)(xmin + rng.nextDouble() * (xmax - xmin)) ++
      Seq(xmin, xmax) // boundary values included
    val ys = Seq.fill(60)(ymin + rng.nextDouble() * (ymax - ymin)) ++
      Seq(ymin, ymax)
    (p, xs, ys)
  }

  test("∀ in-extent v: bin index valid and centroid within the bin") {
    (1 to 15).foreach { _ =>
      val (p, xs, ys) = randomConfig()
      val df = xs.zip(ys).toDF("x", "y")
      val rows = df.select(
        col("x"), p.xIndexCol(col("x")).as("xi"),
        p.xCentroidCol(col("x")).as("xc")).collect()
      rows.foreach { r =>
        val (v, xi, xc) = (r.getDouble(0), r.getInt(1), r.getDouble(2))
        assert(xi >= 0 && xi < p.nX, s"index $xi out of range for $v / $p")
        // v lies within the bin's closed bounds
        val lo = p.xBounds(xi); val hi = p.xBounds(xi + 1)
        assert(v >= lo - 1e-9 && v <= hi + 1e-9, s"$v outside bin [$lo,$hi]")
        assert(xc > lo && xc < hi, s"centroid $xc outside ($lo,$hi)")
      }
    }
  }

  test("executor label columns byte-match driver labelString (pruning contract)") {
    (1 to 15).foreach { _ =>
      val (p, xs, ys) = randomConfig()
      val df = xs.zip(ys).toDF("x", "y")
      val got = p.addLabels(df, "x", "y")
        .select(col("x"), col("y"), col("xbin"), col("ybin")).collect()
      got.foreach { r =>
        val (x, y) = (r.getDouble(0), r.getDouble(1))
        val expected = {
          // driver-side: shared exact-bounds index then labelString — the
          // same pair BucketReader pruning relies on
          val xi = Binning.indexOf(x, p.xBounds, p.extent.xmin, p.extent.xmax, p.xSize)
          val yi = Binning.indexOf(y, p.yBounds, p.extent.ymin, p.extent.ymax, p.ySize)
          p.labelsOfIndices(xi, yi)
        }
        assert(r.getString(2) == expected(0) && r.getString(3) == expected(1),
          s"labels mismatch at ($x,$y): got (${r.getString(2)},${r.getString(3)}), want $expected")
      }
    }
  }

  test("prune superset: every in-extent point's labels appear in partitionsByExtent") {
    (1 to 15).foreach { _ =>
      val (p, xs, ys) = randomConfig()
      // random query sub-extent
      val qx0 = p.extent.xmin + rng.nextDouble() * (p.extent.xmax - p.extent.xmin) / 2
      val qy0 = p.extent.ymin + rng.nextDouble() * (p.extent.ymax - p.extent.ymin) / 2
      val q = Extent(qx0, qx0 + (p.extent.xmax - qx0) / 2,
        qy0, qy0 + (p.extent.ymax - qy0) / 2)
      val dict = p.partitionsByExtent(q)
      val inQuery = xs.zip(ys).filter { case (x, y) =>
        x >= q.xmin && x <= q.xmax && y >= q.ymin && y <= q.ymax }
      val df = inQuery.toDF("x", "y")
      if (inQuery.nonEmpty) {
        val labels = p.addLabels(df, "x", "y")
          .select("xbin", "ybin").as[(String, String)].collect()
        labels.foreach { case (xb, yb) =>
          assert(dict(p.levels(0)).contains(xb),
            s"x label $xb missing from pruned set ${dict(p.levels(0))}")
          assert(dict(p.levels(1)).contains(yb),
            s"y label $yb missing from pruned set")
        }
      }
    }
  }

  test("LSH bucket cap bounds candidate pairs on a degenerate corpus") {
    import graft.operators.{Dedup, Similarity}
    val spark = SparkTestBase.spark
    import spark.implicits._
    // 300 identical docs: every band bucket holds the whole corpus, so an
    // uncapped self-join would emit 300*299/2 = 44,850 pairs per band.
    // Over the cap, buckets degrade to chained pairs: exactly n-1 distinct.
    val docs = (0 until 300).map(i => (i.toLong, "the same document text"))
      .toDF("doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(docs, "text", "doc_id",
      maxBucketSize = 50)
    assert(pairs.count() == 299)
    // chain spans one component: CC still collapses everything to one
    // cluster — on BOTH paths (driver union-find and, forced via
    // driverEdgeLimit=0, the distributed pointer-jumping loop)
    val cc = graft.operators.Dedup.connectedComponents(pairs)
    assert(cc.agg(org.apache.spark.sql.functions.countDistinct($"cluster_id"))
      .head().getLong(0) == 1)
    val ccDist = graft.operators.Dedup.connectedComponents(pairs, driverEdgeLimit = 0)
    assert(ccDist.agg(org.apache.spark.sql.functions.countDistinct($"cluster_id"))
      .head().getLong(0) == 1)
    // identical assignments from both paths
    assert(cc.except(ccDist).count() == 0 && ccDist.except(cc).count() == 0)
    // third shape: a SMALL POSITIVE limit the edge count EXCEEDS — the
    // count-based adjudication runs and REJECTS the driver path, so the
    // loop consumes the same edges checkpoint the count read (r18
    // checkpoint-first design; driverEdgeLimit=0 skips the adjudication
    // entirely, so this branch is otherwise uncovered)
    val ccOver = graft.operators.Dedup.connectedComponents(pairs, driverEdgeLimit = 7)
    assert(cc.except(ccOver).count() == 0 && ccOver.except(cc).count() == 0)

    // identical embeddings: one hyperplane bucket of 200 → 199 chained pairs
    val vecs = (0 until 200).map(i => (i.toLong, Array.fill(8)(0.5f)))
      .toDF("doc_id", "vec")
    val nd = Similarity.embeddingNearDupPairs(vecs, "doc_id", "vec",
      threshold = 0.99, maxBucketSize = 50)
    assert(nd.count() == 199)
    // under the cap the exact all-pairs path is unchanged
    val ndExact = Similarity.embeddingNearDupPairs(vecs.limit(10), "doc_id",
      "vec", threshold = 0.99, maxBucketSize = 1024)
    assert(ndExact.count() == 45)
  }

  test("connectedComponents drops null-id pairs for ALL id types — a " +
       "(null, x) string pair neither self-loops x nor emits a null node") {
    // least/greatest skip nulls, so without the explicit filter a
    // (null, "x") pair canonicalizes to an ("x","x") SELF-LOOP — "x"
    // would silently register as a singleton cluster (r18 ADVICE: the
    // integral path filtered nulls, the string path did not)
    val spark = SparkTestBase.spark
    import spark.implicits._
    // the chain c-b, b-a forces the label-propagation loop through more
    // than one round on RAW (non-numeric) string ids — which also pins
    // the type-agnostic convergence key (the old sum(label) relied on
    // ANSI's string→double cast and threw CAST_INVALID_INPUT here; the
    // q212 production gate pre-hashes its string ids so it never saw it)
    val pairs = Seq(
      (Option("c"), Option("b")),
      (Option("b"), Option("a")),
      (Option.empty[String], Option("x")),
      (Option("y"), Option.empty[String]),
      (Option.empty[String], Option.empty[String])
    ).toDF("a", "b")
    val cc = graft.operators.Dedup.connectedComponents(pairs)
    val nodes = cc.select("node").as[String].collect().toSet
    assert(nodes == Set("a", "b", "c"),
      s"null-partnered pairs leaked nodes: $nodes")
    // one component, min-id representative "a" on every node
    assert(cc.select("cluster_id").as[String].collect().toSet == Set("a"))
    // and the same contract on the integral path (already filtered, now
    // pinned beside its string sibling): driver union-find branch
    val iPairs = Seq((Option(1L), Option(2L)), (Option.empty[Long], Option(9L)))
      .toDF("a", "b")
    val icc = graft.operators.Dedup.connectedComponents(iPairs)
    assert(icc.select("node").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("connectedComponents frees its checkpoint blocks: repeated calls " +
       "do not accumulate storage") {
    // Dataset.unpersist cannot free localCheckpoint blocks (the cache
    // lives on the internal RDD), so before the r19 hygiene every CC
    // call leaked its edge checkpoint — and the loop path additionally
    // one block set PER ROUND — until ContextCleaner GC. A long-lived
    // or streaming session calling dedup repeatedly accumulated storage
    // without bound (r18 ADVICE). Pin the fix via the session's
    // persistent-RDD registry.
    val spark = SparkTestBase.spark
    import spark.implicits._
    // count only RDD ids CREATED inside each window: the shared session's
    // ContextCleaner concurrently GC-unpersists EARLIER tests' blocks, so
    // a raw before/after size delta reads negative nondeterministically
    def persistedIds = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    // SMALL path: the edge checkpoint is released right after the collect
    val before = persistedIds
    (1 to 5).foreach(_ =>
      graft.operators.Dedup.connectedComponents(pairs).count())
    val leakedSmall = (persistedIds -- before).size
    assert(leakedSmall == 0,
      s"small path leaked $leakedSmall cached RDDs over 5 calls")
    // LOOP path (forced via driverEdgeLimit = 0): at most ONE survivor
    // per call — the final label checkpoint backing the returned frame
    // (ContextCleaner-owned once the caller drops it); the edge
    // checkpoint and every per-round intermediate must be freed eagerly
    // (this 2-component graph runs 2+ pointer-jumping rounds, so an
    // unhygienic call leaks 4-5 block sets, not 1)
    val b2 = persistedIds
    (1 to 3).foreach(_ =>
      graft.operators.Dedup.connectedComponents(pairs, driverEdgeLimit = 0)
        .count())
    val growth = (persistedIds -- b2).size
    assert(growth <= 3,
      s"loop path leaked $growth cached RDDs over 3 calls (want <= 1/call)")
  }

  test("planesFor scales hyperplane count with corpus size") {
    import graft.operators.Similarity
    assert(Similarity.planesFor(100000) == 8)          // small: floor of 8
    assert(Similarity.planesFor(1000000000L) == 20)    // 1e9/1024 ≈ 2^20
    assert(Similarity.planesFor(Long.MaxValue) == 53)  // capped growth
  }

  test("zero-shuffle minhash equals the explode+groupBy reference shape") {
    // the in-row transform/array_min signature must be value-identical to
    // the classic explode + hash-aggregate formulation on arbitrary text
    // (incl. unicode, whitespace runs, short strings)
    import graft.operators.Dedup
    val texts = Seq.tabulate(40) { i =>
      val words = Seq.fill(1 + rng.nextInt(20))(
        rng.alphanumeric.take(1 + rng.nextInt(10)).mkString)
      (i.toLong, words.mkString(" ") + (if (i % 7 == 0) "  émoji\tmix" else ""))
    }
    val df = texts.toDF("doc_id", "text")
    val fast = Dedup.minHashSignature(df, "text", "doc_id",
      shingleK = 5, numHashes = 6)
    val exploded = df.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 5)).as("__sh"))
    val (h1, h2) = Dedup.shingleHashPair(col("__sh"))
    val hashed = exploded.select(col("doc_id"), h1.as("__h1"), h2.as("__h2"))
    val aggs = (0 until 6).map(i =>
      min(col("__h1") + lit(i.toLong) * col("__h2")).as(s"mh$i"))
    val reference = hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val f = fast.orderBy("doc_id").collect().map(_.toSeq)
    val r = reference.orderBy("doc_id").collect().map(_.toSeq)
    assert(f.length == 40 && f.toSeq == r.toSeq)
  }

  test("packBins: every doc binned exactly once; bins within a shard are " +
       "contiguous from 0; prefix invariant holds") {
    import graft.operators.Sampling
    (1 to 5).foreach { _ =>
      val n = 50 + rng.nextInt(200)
      val docs = (0 until n).map(i => (i.toLong, 1L + rng.nextInt(300).toLong))
      val maxTokens = 200L + rng.nextInt(400)
      val out = Sampling.packBins(docs.toDF("doc_id", "n_tokens"),
          "doc_id", "n_tokens", maxTokens, shards = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.length == n) // complete, no duplicates
      assert(out.map(_._1).distinct.length == n)
      out.groupBy(_._3).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._1)
        // exclusive prefix sums reproduce the bin assignment
        var prefix = 0L
        sorted.foreach { case (_, toks, _, bin) =>
          assert(bin == prefix / maxTokens)
          prefix += toks
        }
        // bins start at 0 and are non-decreasing in id order; contiguity
        // only holds when no doc exceeds maxTokens (an oversized doc jumps
        // the prefix by >maxTokens and legitimately skips bins)
        val bins = sorted.map(_._4)
        assert(bins.head == 0L)
        assert(bins.zip(bins.tail).forall { case (a, b) => a <= b })
        if (sorted.forall(_._2 <= maxTokens))
          assert(bins.distinct.sorted.toList == (0L to bins.max).toList)
      }
    }
  }

  test("chunkDocuments with stride == window reconstructs the text") {
    import graft.operators.TextAnalysis
    val vocab = Vector("alpha", "beta", "gamma", "delta")
    (1 to 5).foreach { _ =>
      val docs = (0 until 20).map { i =>
        (i.toLong, Seq.fill(1 + rng.nextInt(40))(vocab(rng.nextInt(4))).mkString(" "))
      }
      val w = 1 + rng.nextInt(12)
      val rebuilt = TextAnalysis.chunkDocuments(docs.toDF("doc_id", "text"),
          "text", "doc_id", window = w, stride = w)
        .groupBy("doc_id")
        .agg(array_join(transform(array_sort(collect_list(
          struct(col("chunk_id"), col("chunk_text")))),
          s => s.getField("chunk_text")), " ").as("t"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      docs.foreach { case (id, text) => assert(rebuilt(id) == text, s"doc $id w=$w") }
    }
  }

  test("kmv sketch equals the k smallest of the exact distinct hash set") {
    import graft.operators.Sketches
    val values = Seq.fill(3000)(rng.nextInt(500).toLong)
    val df = values.map(v => ("g", v)).toDF("g", "v").repartition(7)
    val k = 32
    val sketch = df.groupBy("g")
      .agg(graft.functions.KmvSketch.kMinValues(Sketches.hash40(col("v")), k).as("s"))
      .head().getSeq[Long](1)
    val exact = values.distinct
      .map(v => java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(v.toString).take(10), 16))
      .distinct.sorted.take(k)
    assert(sketch == exact)
  }

  test("sketch jaccard counts bounded: 0 <= overlap <= n_sketch <= k") {
    import graft.operators.TextAnalysis
    val docs = (0 until 30).map { i =>
      (i.toLong, Seq.fill(5 + rng.nextInt(30))(('a' + rng.nextInt(6)).toChar)
        .mkString(" "))
    }.toDF("doc_id", "text")
    val sk = TextAnalysis.winnowFingerprint(docs, "text", "doc_id", 3, 8)
    val pairs = (for (a <- 0 until 10; b <- a + 1 until 10)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    TextAnalysis.sketchJaccardCounts(sk, pairs, "doc_id", 8).collect().foreach { r =>
      val (ns, ov) = (r.getLong(2), r.getLong(3))
      assert(ov >= 0 && ov <= ns && ns <= 8, s"pair ${r.getLong(0)}-${r.getLong(1)}")
    }
  }

  test("geodesic: symmetric, zero at identity, positive otherwise") {
    import graft.functions.Geodesic
    (1 to 200).foreach { _ =>
      val lon1 = rng.nextDouble() * 360 - 180; val lat1 = rng.nextDouble() * 180 - 90
      val lon2 = rng.nextDouble() * 360 - 180; val lat2 = rng.nextDouble() * 180 - 90
      val d12 = Geodesic.inverse(lon1, lat1, lon2, lat2)
      val d21 = Geodesic.inverse(lon2, lat2, lon1, lat1)
      assert(d12 >= 0 && d12 < 2.1e7)
      assert(math.abs(d12 - d21) < 1e-6, s"asymmetry at ($lon1,$lat1)-($lon2,$lat2)")
      assert(Geodesic.inverse(lon1, lat1, lon1, lat1) == 0.0)
    }
  }

  test("∀ random dims/layouts: AVI raw-DIB write→parse round-trips exactly") {
    import graft.operators.Avi
    for (_ <- 1 to 40) {
      val id = rng.nextLong() & 0x7fffffffffffffffL
      val w = 1 + rng.nextInt(13)
      val h = 1 + rng.nextInt(11)
      val n = 1 + rng.nextInt(5)
      val bits = if (rng.nextBoolean()) 8 else 24
      val topDown = rng.nextBoolean()
      val stride = 1 + rng.nextInt(3)
      val payload = Avi.syntheticAviDib(id, w, h, n, bits, topDown)
      val (pw, ph, total, sampled) = Avi.decodeAviFramesStrided(payload, stride)
      assert((pw, ph, total) == (w, h, n),
        s"dims for id=$id ${w}x$h n=$n bits=$bits topDown=$topDown")
      assert(sampled.map(_._1).toSeq == (0 until n by stride).toSeq)
      for ((f, px) <- sampled; y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xff) == Avi.syntheticLuma(id, f, x, y),
          s"pixel ($x,$y) frame $f id=$id bits=$bits topDown=$topDown " +
            s"w=$w h=$h (stride padding)")
    }
  }

  test("∀ random sample counts: interleaved AVI audio round-trips exactly") {
    import graft.operators.Avi
    for (_ <- 1 to 20) {
      val id = rng.nextLong() & 0x7fffffffffffffffL
      val nFrames = 1 + rng.nextInt(4)
      val nSamples = 1 + rng.nextInt(300)
      val bits = if (rng.nextBoolean()) 8 else 16
      val av = Avi.syntheticAviInterleaved(id, 4, 4, nFrames,
        nSamples, 8000, bits)
      val (rate, ch, n, samples) = Avi.decodeAviAudio(av)
      assert((rate, ch, n) == (8000, 1, nSamples),
        s"shape id=$id nFrames=$nFrames nSamples=$nSamples bits=$bits")
      for (j <- 0 until nSamples)
        assert((samples(j) & 0xff) == Avi.syntheticPcmSample(id, j),
          s"sample $j id=$id bits=$bits")
    }
  }
}
