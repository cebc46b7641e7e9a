package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox jumps over a lazy dog"),   // near dup of 0
    (3L, "completely different content about spark engines"),
    (4L, "THE  QUICK   brown fox JUMPS over the lazy dog") // dup after normalize
  ).toDF("doc_id", "text")

  test("exact dedup: normalized-content groups and semi-join drop") {
    val groups = Dedup.exactDuplicateGroups(docs, "text", "doc_id")
    val byKeep = groups.select("keep_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(byKeep(0L) == 3) // 0, 1, 4 collapse
    assert(byKeep(2L) == 1 && byKeep(3L) == 1)
    val deduped = Dedup.dropExactDuplicates(docs, "text", "doc_id")
    assert(deduped.select("doc_id").as[Long].collect().toSet == Set(0L, 2L, 3L))
  }

  test("minhash LSH: near-dups collide, distinct content does not") {
    val pairs = Dedup.lshCandidatePairs(docs, "text", "doc_id",
      shingleK = 4, numHashes = 8, bands = 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L))) // identical text
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }) // unrelated
  }

  test("simhash: identical text → identical hash; near dup → close hash") {
    val sh = Dedup.simHash(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(sh(0L) == sh(1L) && sh(0L) == sh(4L))
    val hamming = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    val hammingFar = java.lang.Long.bitCount(sh(0L) ^ sh(3L))
    assert(hamming < hammingFar)
  }

  test("ngram jaccard counts: exact integers") {
    val pairs = Seq((0L, 1L), (0L, 3L)).toDF("a", "b")
    val j = Dedup.ngramJaccardCounts(docs, pairs, "text", "doc_id", shingleK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val (i01, u01) = j((0L, 1L))
    assert(i01 == u01) // identical text → intersection == union
    val (i03, u03) = j((0L, 3L))
    assert(i03 < u03 && i03 < i01)
  }

  test("cosine top-k: identical vector is rank 1; ties broken by id") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f)), (3L, Array(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(vecs.where($"vec_id" === 0), vecs,
      "vec_id", "embedding", k = 2)
      .select("rk", "neighbor_id").as[(Int, Long)].collect().toMap
    assert(top(1) == 1L) // identical vector
    assert(top(2) == 2L) // then the near one
  }

  test("LSH ANN: same vector lands in same bucket; topK within bucket") {
    val vecs = Seq(
      (0L, Array.fill(8)(0.5f)), (1L, Array.fill(8)(0.5f)),
      (2L, Array.fill(8)(-0.5f))
    ).toDF("vec_id", "embedding")
    val planes = Similarity.hyperplanes(4, 8)
    val bucketed = vecs.withColumn("b",
      Similarity.lshBucket(Similarity.asDouble($"embedding"), planes))
      .select("vec_id", "b").as[(Long, String)].collect().toMap
    assert(bucketed(0L) == bucketed(1L))
    assert(bucketed(0L) != bucketed(2L))
    val nn = Similarity.lshTopK(vecs.where($"vec_id" === 0), vecs,
      "vec_id", "embedding", k = 1, nPlanes = 4)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(nn == Seq(1L))
  }

  test("embedding near-dup pairs above threshold") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.999f, 0.001f)), (2L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.99, nPlanes = 2)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("language id: stopword heuristic picks the right language") {
    val t = Seq(
      (0L, "the cat and the dog of the house"),
      (1L, "der Hund und die Katze und das Haus"),
      (2L, "le chat et le chien et un oiseau")
    ).toDF("doc_id", "text")
    val got = t.withColumn("l", TextAnalysis.langIdCol($"text"))
      .select("doc_id", "l").as[(Long, String)].collect().toMap
    assert(got(0L) == "en" && got(1L) == "de" && got(2L) == "fr")
  }

  test("token counts + quality metrics") {
    val t = Seq((0L, "Hello, world! This is a test-case with 42 tokens maybe."))
      .toDF("doc_id", "text")
    val q = TextAnalysis.qualityMetrics(t, "text").head()
    assert(q.getAs[Long]("n_tokens") == 10)
    assert(q.getAs[Long]("n_punct") == 3) // comma, bang, final period
    val counts = t.select(
      TextAnalysis.tokenCount($"text").as("ws"),
      TextAnalysis.bpeishCount($"text").as("bp")).head()
    assert(counts.getLong(0) == 10)
    assert(counts.getLong(1) > counts.getLong(0)) // subwords split punctuation
  }

  test("connected components: min-id cluster per component") {
    // components: {1,2,3,9} (chain), {5,7}, isolated nodes don't appear
    val pairs = Seq((2L, 3L), (1L, 2L), (3L, 9L), (5L, 7L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 7L -> 5L))
  }

  test("salted aggregation and join match unsalted results (skew path)") {
    import graft.operators.Skew
    val df = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i.toDouble))
      .toDF("k", "v") // 90% of rows on one key
    val salted = Skew.saltedAggregate(df, Seq("k"), 8,
      partialAggs = Map("cnt" -> count(lit(1)), "sum_v" -> sum($"v")),
      finalAggs = Map("cnt" -> sum($"cnt"), "sum_v" -> sum($"sum_v")))
    val plain = df.groupBy("k").agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"))
    assert(salted.orderBy("k").collect().toSeq ==
      plain.orderBy("k").collect().toSeq)

    val dim = Seq(("hot", "H"), ("k901", "A")).toDF("k", "tag")
    val j = Skew.saltedJoin(df, dim, "k", 4)
    assert(j.count() == df.join(dim, "k").count())
  }

  test("multimodal: typed assets, batched stub decode, feature shape") {
    val t = Seq((7L, "src1", "some media payload bytes")).toDF("doc_id", "source", "text")
      .withColumn("payload", encode($"text", "UTF-8"))
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    val assets = Multimodal.toAssets(t, "doc_id", "payload", "video", "source")
    assert(shape(assets.schema) == shape(Multimodal.assetSchema))
    val feats = Multimodal.extractFeatures(spark, assets)
    assert(shape(feats.schema) == shape(Multimodal.featureSchema))
    val r = feats.head()
    assert(r.getAs[Long]("asset_id") == 7L)
    val feature = r.getSeq[Float](r.fieldIndex("feature"))
    assert(feature.length == 16)
    // L1-normalized histogram sums to ~1
    assert(math.abs(feature.sum - 1f) < 1e-5)
    // frame sampling explodes by stride
    val sampled = Multimodal.sampleFrameIndices(feats, stride = 1)
    assert(sampled.count() == r.getAs[Int]("n_frames"))
  }

  test("avi: raw-DIB frames round-trip the closed form in all four layouts") {
    import graft.operators.Avi
    for (bits <- Seq(8, 24); topDown <- Seq(false, true)) {
      val payload = Avi.syntheticAviDib(11L, 7, 5, 3, bits, topDown)
      assert(Avi.isAvi(payload))
      val (w, h, frames) = Avi.decodeAviFrames(payload)
      assert((w, h, frames.length) == (7, 5, 3),
        s"dims wrong for bits=$bits topDown=$topDown")
      for (f <- 0 until 3; y <- 0 until 5; x <- 0 until 7)
        assert((frames(f)(y * 7 + x) & 0xff) == Avi.syntheticLuma(11L, f, x, y),
          s"pixel ($x,$y) frame $f, bits=$bits topDown=$topDown")
    }
  }

  test("avi: MJPEG frames decode with the right shape and near-exact pixels") {
    import graft.operators.Avi
    val payload = Avi.syntheticAviMjpeg(4L, 16, 12, 2)
    val (w, h, frames) = Avi.decodeAviFrames(payload)
    assert((w, h, frames.length) == (16, 12, 2))
    // JPEG is lossy: tolerate small per-pixel drift on this smooth ramp
    for (f <- 0 until 2) {
      val diffs = for (y <- 0 until 12; x <- 0 until 16)
        yield math.abs((frames(f)(y * 16 + x) & 0xff) -
          Avi.mjpegLuma(4L, f, x, y, 16, 12))
      assert(diffs.sum.toDouble / diffs.length < 8.0,
        s"frame $f mean abs error ${diffs.sum.toDouble / diffs.length}")
    }
  }

  test("mjpeg-avi: constant-frame decode error stays within the q202 gate tolerance") {
    import graft.operators.Avi
    (0L until 40L).foreach { id =>
      val nf = (id % 3 + 2).toInt
      val (w, h, frames) =
        Avi.decodeAviFrames(Avi.syntheticAviMjpegConst(id, 16, 16, nf))
      assert((w, h, frames.length) == (16, 16, nf))
      frames.zipWithIndex.foreach { case (px, f) =>
        val exp = Avi.mjpegConstLuma(id, f)
        val maxErr = px.map(b => math.abs((b & 0xff) - exp)).max
        assert(maxErr <= 3, s"id=$id frame=$f maxErr=$maxErr (exp=$exp)")
      }
    }
  }

  test("avi: container sniffing routes AVI and GIF through one video seam") {
    import graft.operators.Avi
    val gif = Multimodal.syntheticGif(3L, 6, 6, 2)
    assert(!Avi.isAvi(gif))
    val (gw, gh, gifFrames) = Multimodal.decodeVideoFrames(gif)
    assert((gw, gh, gifFrames.length) == (6, 6, 2))
    val avi = Avi.syntheticAviDib(3L, 6, 6, 2)
    val (aw, ah, aviFrames) = Multimodal.decodeVideoFrames(avi)
    assert((aw, ah, aviFrames.length) == (6, 6, 2))
    // non-AVI payloads fail the AVI parser loudly, not silently
    intercept[IllegalArgumentException](Avi.decodeAviFrames(gif))
    // unknown codec fourcc is rejected with the fourcc in the message:
    // patch biCompression (it is unique bytes in the strf of an 8-bit file)
    val patched = avi.clone()
    val strfAt = indexOfBytes(patched, "strf".getBytes("US-ASCII"))
    assert(strfAt > 0)
    patched(strfAt + 8 + 16) = 0x34 // biCompression = "4..." (fake codec)
    patched(strfAt + 8 + 17) = 0x32
    patched(strfAt + 8 + 18) = 0x36
    patched(strfAt + 8 + 19) = 0x68
    val e = intercept[IllegalArgumentException](Avi.decodeAviFrames(patched))
    assert(e.getMessage.contains("unsupported AVI video compression"))
  }

  test("avi: interleaved A/V — each decoder selects its stream exactly") {
    import graft.operators.Avi
    for (bits <- Seq(8, 16)) {
      val av = Avi.syntheticAviInterleaved(9L, 6, 4, 3,
        nSamples = 100, sampleRate = 8000, bits = bits)
      // video decode skips the interleaved '01wb' audio chunks
      val (w, h, frames) = Avi.decodeAviFrames(av)
      assert((w, h, frames.length) == (6, 4, 3), s"bits=$bits video dims")
      for (f <- 0 until 3; y <- 0 until 4; x <- 0 until 6)
        assert((frames(f)(y * 6 + x) & 0xff) == Avi.syntheticLuma(9L, f, x, y))
      // audio decode skips the '00db' video chunks
      val (rate, ch, n, samples) = Avi.decodeAviAudio(av)
      assert((rate, ch, n) == (8000, 1, 100), s"bits=$bits audio shape")
      for (j <- 0 until 100)
        assert((samples(j) & 0xff) == Avi.syntheticPcmSample(9L, j),
          s"bits=$bits sample $j")
      // the media seam routes AVI audio through the container parser
      val (mr, mc, mn, ms) = Multimodal.JdkMediaDecoder.decode("audio", av)
      assert((mr, mc, mn) == (8000, 1, 100) && ms.sameElements(samples))
    }
    // an audio decode of a video-only AVI fails loudly
    intercept[IllegalArgumentException](
      Avi.decodeAviAudio(Avi.syntheticAviDib(1L, 4, 4, 2)))
  }

  test("avi: corrupt chunk sizes fail loudly instead of looping or OOB") {
    import graft.operators.Avi
    val good = Avi.syntheticAviDib(1L, 6, 4, 2)
    // negative chunk size (0xFFFFFFF8) on the first top-level LIST:
    // unguarded, off = body + sz + (sz & 1) would never advance
    val neg = good.clone()
    neg(16) = 0xf8.toByte; neg(17) = 0xff.toByte
    neg(18) = 0xff.toByte; neg(19) = 0xff.toByte
    val e1 = intercept[IllegalArgumentException](Avi.decodeAviFrames(neg))
    assert(e1.getMessage.contains("corrupt AVI"))
    // size running past the payload
    val over = good.clone()
    over(16) = 0xff.toByte; over(17) = 0xff.toByte
    over(18) = 0x00.toByte; over(19) = 0x00.toByte
    val e2 = intercept[IllegalArgumentException](Avi.decodeAviFrames(over))
    assert(e2.getMessage.contains("corrupt AVI"))
    // truncated payload: enclosing extents shrink with it
    intercept[IllegalArgumentException](
      Avi.decodeAviFrames(good.take(good.length / 2)))
  }

  test("AnnIndex.delete fences off older as-of history") {
    val rnd = new scala.util.Random(31)
    val vecs = (0L until 48L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f)).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("annidx_fence").toString
    try {
      graft.sources.AnnIndex.saveIvfPq(vecs.where($"vec_id" < 32),
        "vec_id", "embedding", dir, dims = 8, m = 2, k = 4, nList = 4)
      graft.sources.AnnIndex.loadIvfPq(spark, dir)
        .append(vecs.where($"vec_id" >= 32), "embedding")
        .delete(Seq(1L, 2L))
      // the delete rewrote rows inside gen 0: as-of gen 1 would read a
      // mutated history — refused
      val e = intercept[IllegalArgumentException](
        graft.sources.AnnIndex.loadIvfPq(spark, dir, asOfGen = 1))
      assert(e.getMessage.contains("in-place delete"))
      // the post-delete head state is still reachable as-of
      assert(graft.sources.AnnIndex.loadIvfPq(spark, dir, asOfGen = 2)
        .codes.count() == 46L)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("AnnIndex manifest codes schema equals a fresh footer inference " +
       "across save/append/delete/compactGens (r21 resolution fast path)") {
    // loadIvfPq trusts the manifest schema instead of inferring; drift in
    // column order, partition-col typing, or recursive nullability of
    // pq_code would silently mis-read every search
    val rnd = new scala.util.Random(32)
    val vecs = (0L until 48L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f)).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("annidx_rbs").toString
    def check(stage: String): Unit = {
      val mf = org.json4s.jackson.JsonMethods.parse(
        graft.sources.BucketFs.readString(s"$dir/_ann_index.json"))
      val stored = mf \ "codes_schema" match {
        case org.json4s.JString(s) =>
          org.apache.spark.sql.types.DataType.fromJson(s)
        case other => fail(s"$stage: codes_schema missing: $other")
      }
      val inferred = spark.read.parquet(s"$dir/codes").schema
      assert(stored == inferred, s"$stage: stored $stored != inferred $inferred")
    }
    try {
      graft.sources.AnnIndex.saveIvfPq(vecs.where($"vec_id" < 32),
        "vec_id", "embedding", dir, dims = 8, m = 2, k = 4, nList = 4)
      check("save")
      graft.sources.AnnIndex.loadIvfPq(spark, dir)
        .append(vecs.where($"vec_id" >= 32), "embedding")
      check("append")
      graft.sources.AnnIndex.loadIvfPq(spark, dir).delete(Seq(1L, 2L))
      check("delete")
      val compacted = graft.sources.AnnIndex.loadIvfPq(spark, dir).compactGens()
      check("compactGens")
      // and the fast-path scan still answers: exact self-match survives
      val hit = compacted.search(vecs.where($"vec_id" === 5L), "embedding",
        topK = 1).collect()
      assert(hit.nonEmpty, "search through schema-fast-path scan returned nothing")
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("randomProjection: wrong-length vectors fail loudly, not null") {
    import graft.operators.Similarity
    val bad = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.randomProjection(bad, "vec_id", "embedding",
        inDim = 3, outDim = 2).collect()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(messages.contains("randomProjection"),
      s"expected a loud length error, got: $messages")
  }

  private def indexOfBytes(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      if (hay.slice(i, i + needle.length).sameElements(needle)) return i
      i += 1
    }
    -1
  }

  test("random projection: exact integer JL transform matches brute force") {
    import graft.operators.Similarity
    val vecs = Seq(
      (1L, Seq(0.5f, -1.25f, 2.0f, 0.001f)),
      (2L, Seq(-0.75f, 0.0f, 1.5f, -2.5f))).toDF("vec_id", "embedding")
    val got = Similarity.randomProjection(vecs, "vec_id", "embedding",
        inDim = 4, outDim = 3)
      .as[(Long, Int, Long)].collect().toSet
    val expect = for {
      (id, e) <- Seq(1L -> Seq(0.5f, -1.25f, 2.0f, 0.001f),
                     2L -> Seq(-0.75f, 0.0f, 1.5f, -2.5f))
      j <- 0 until 3
    } yield (id, j, (0 until 4).map(i =>
      math.floor(e(i).toDouble * 1000).toLong * Similarity.rpSign(i, j)).sum)
    assert(got == expect.toSet)
    // signs are balanced-ish and deterministic
    assert(Similarity.rpSign(0, 0) == Similarity.rpSign(0, 0))
    val signs = for (i <- 0 until 64; j <- 0 until 16) yield Similarity.rpSign(i, j)
    assert(math.abs(signs.sum) < signs.length / 4, "sign matrix heavily biased")
  }

  test("strided video decode equals full decode + filter for GIF and AVI") {
    import graft.operators.Avi
    for ((name, payload) <- Seq(
        "gif" -> Multimodal.syntheticGif(5L, 6, 4, 5),
        "avi" -> Avi.syntheticAviDib(5L, 6, 4, 5))) {
      val (w, h, full) = Multimodal.JdkFrameDecoder.decodeFrames("video", payload)
      for (stride <- Seq(1, 2, 3, 7)) {
        val (sw, sh, n, sampled) =
          Multimodal.JdkFrameDecoder.decodeFramesStrided("video", payload, stride)
        assert((sw, sh, n) == (w, h, full.length), s"$name stride $stride dims")
        assert(sampled.map(_._1).toSeq == (0 until full.length by stride).toSeq,
          s"$name stride $stride indices")
        assert(sampled.forall { case (i, px) => px.sameElements(full(i)) },
          s"$name stride $stride pixels")
      }
    }
  }

  test("resized frame features: strided decode + nearest resize closed form") {
    import graft.operators.Avi
    val avis = Seq((7L, Avi.syntheticAviDib(7L, 8, 8, 3)))
      .toDF("doc_id", "payload")
      .withColumn("src", lit("t"))
    val assets = Multimodal.toAssets(avis, "doc_id", "payload", "video", "src")
    val rows = Multimodal.extractResizedFrameFeatures(spark, assets,
        stride = 2, outW = 4, outH = 4)
      .collect()
    assert(rows.map(r => r.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 2))
    for (r <- rows) {
      assert((r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Int]("n_frames"), r.getAs[Int]("out_w"),
        r.getAs[Int]("out_h")) == (8, 8, 3, 4, 4))
      val f = r.getAs[Int]("frame_idx")
      val expect = new Array[Long](16)
      for (y <- 0 until 4; x <- 0 until 4)
        expect(Avi.syntheticLuma(7L, f, 2 * x, 2 * y) / 16) += 1L
      assert(r.getSeq[Long](r.fieldIndex("hist")) == expect.toSeq,
        s"frame $f histogram")
    }
  }

  test("nfc_normalize: composes combining sequences, idempotent, SQL-registered") {
    import graft.functions.NfcNormalize
    // explicit escapes only: literal accented chars in source are
    // ambiguous about their normalization form
    val decomposed = "cafe\u0301" // e + combining acute
    val composed = "caf\u00e9" // precomposed
    val df = Seq(
      (1L, decomposed),
      (2L, composed), // already NFC
      (3L, "A\u030A b"), // A + combining ring
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val got = df.select($"id", NfcNormalize.column($"t").as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == composed && got(2L) == composed)
    assert(got(3L) == "\u00c5 b")
    assert(got.get(4L).contains(null))
    // idempotent: normalizing an NFC string is a no-op
    assert(df.select(NfcNormalize.column(NfcNormalize.column($"t")).as("a"),
        NfcNormalize.column($"t").as("b"))
      .where($"a" =!= $"b").count() == 0)
    // SQL surface
    graft.functions.GraftFunctions.register(spark)
    df.createOrReplaceTempView("nfc_in")
    assert(spark.sql("select nfc_normalize(t) from nfc_in where id = 1")
      .head().getString(0) == composed)
    // NFKC compatibility composition: ligature and fullwidth fold to ASCII
    val k = Seq((1L, "\ufb01le \uff21")).toDF("id", "t")
    assert(k.select(graft.functions.UnicodeNormalize.column($"t", "NFKC"))
      .head().getString(0) == "file A")
    assert(spark.sql("select unicode_normalize('\ufb01', 'NFKC')")
      .head().getString(0) == "fi")
    intercept[IllegalArgumentException](
      graft.functions.UnicodeNormalize.column($"t", "NFX"))
  }

  test("feature hashing: signed bucket counts match brute force") {
    def h(prefix: String, tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((prefix + tok).getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val docs = Seq((1L, "Alpha beta  ALPHA gamma"), (2L, "beta beta"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.hashedFeatures(docs, "text", "doc_id", dim = 8)
      .as[(Long, Long, Long)].collect().toSet
    val expect = Seq(1L -> Seq("alpha", "beta", "alpha", "gamma"),
        2L -> Seq("beta", "beta"))
      .flatMap { case (id, toks) =>
        toks.map(t => ((id, h("fh:", t) % 8),
          if (h("sg:", t) % 2 == 0) 1L else -1L))
      }
      .groupBy(_._1).map { case ((id, j), xs) => (id, j, xs.map(_._2).sum) }
      .toSet
    assert(got == expect)
    assert(!got.exists(_._1 == 3L)) // null text contributes nothing
  }

  test("repetition metrics: duplicate-token and top-2-gram counts") {
    val docs = Seq((1L, "A a  a b"), (2L, "x"), (3L, "one two three"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    // doc 1 normalizes to "a a a b": 4 tokens, 2 distinct; 2-grams
    // [a a, a a, a b] -> max 2 of 3
    assert(m(0).toSeq == Seq(1L, 4L, 2L, 2L, 3L))
    // single token: no 2-grams
    assert(m(1).toSeq == Seq(2L, 1L, 1L, 0L, 0L))
    // no repetition: max 2-gram count 1
    assert(m(2).toSeq == Seq(3L, 3L, 3L, 1L, 2L))
  }

  test("pii scrub redacts emails and long digit runs") {
    val d = Seq((1L, "Mail Bob.Smith+x@Example.COM or call 0123456789 now"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(d, "text").head()
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("n_long_numbers") == 1L)
    assert(r.getAs[String]("redacted_text") == "mail <EMAIL> or call <NUM> now")
  }

  test("hash split is deterministic, complete, and roughly proportioned") {
    import graft.operators.Sampling
    val ids = spark.range(10000).toDF("id")
    val s1 = ids.select($"id", Sampling.splitCol($"id").as("split"))
    val s2 = ids.select($"id", Sampling.splitCol($"id").as("split"))
    assert(s1.except(s2).count() == 0) // pure function of id
    val byLabel = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.values.sum == 10000)
    assert(math.abs(byLabel("train") - 8000) < 300)
    assert(math.abs(byLabel("val") - 1000) < 150)
    // sampling keeps exactly the ids below the bucket threshold
    val kept = ids.where(Sampling.sampledBy($"id", 10)).count()
    assert(math.abs(kept - 1000) < 150)
    intercept[IllegalArgumentException](Sampling.splitCol($"id", 90, 20))
  }

  test("weightedKeep: inclusion rate tracks weight; caps at p=1; rejects bad weights") {
    import graft.operators.Sampling
    val ids = spark.range(20000).toDF("id")
    // p = w/100: weight 10 → ~10%, weight 50 → ~50%
    def rate(w: Int): Double =
      ids.where(Sampling.weightedKeep($"id", lit(w), 1L, 100L)).count() / 20000.0
    assert(math.abs(rate(10) - 0.10) < 0.02)
    assert(math.abs(rate(50) - 0.50) < 0.02)
    assert(rate(100) == 1.0) // p >= 1 keeps everything
    assert(rate(0) == 0.0)
    // null / negative weights never kept
    val mixed = ids.withColumn("w",
      when($"id" % 2 === 0, lit(null).cast("long")).otherwise(lit(-5L)))
    assert(mixed.where(Sampling.weightedKeep($"id", $"w", 1L, 2L)).count() == 0)
    intercept[IllegalArgumentException](
      Sampling.weightedKeep($"id", lit(1), 1L, (1L << 21)))
    intercept[IllegalArgumentException](
      Sampling.weightedKeep($"id", lit(1), (1L << 21), 100L)) // num bound
    // overflow regression (r6 ADVICE): a huge weight must ALWAYS be kept —
    // the old p>=1 check formed w*num, which wraps negative for
    // w*num >= 2^63 and silently dropped every such row
    val huge = ids.limit(100).withColumn("w", lit(Long.MaxValue / 2))
    assert(huge.where(Sampling.weightedKeep($"id", $"w", 3L, 100L)).count() == 100)
  }

  test("weightedTopK: deterministic, fixed-size, inclusion ∝ weight") {
    import graft.operators.Sampling
    val df = spark.range(1000).toDF("id")
      .withColumn("w", when($"id" < 100, lit(20.0)).otherwise(lit(1.0)))
    val a = Sampling.weightedTopK(df, "id", "w", k = 200).collect()
    val b = Sampling.weightedTopK(df, "id", "w", k = 200).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq) // deterministic
    assert(a.length == 200)
    // heavy items (20× weight, 10% of rows) should dominate the sample:
    // average inclusion across salts; each salt is an independent draw
    val heavyRates = (0 until 5).map { s =>
      Sampling.weightedTopK(df, "id", "w", k = 200, salt = s.toString)
        .where($"id" < 100).count().toDouble / 100.0
    }
    val lightRate = Sampling.weightedTopK(df, "id", "w", k = 200)
      .where($"id" >= 100).count().toDouble / 900.0
    assert(heavyRates.sum / 5 > 0.75, s"heavy inclusion ${heavyRates.sum / 5}")
    assert(lightRate < 0.25, s"light inclusion $lightRate")
    // w <= 0 rows can never win
    val z = df.withColumn("w", when($"id" === 0, lit(0.0)).otherwise($"w"))
    assert(!Sampling.weightedTopK(z, "id", "w", k = 1000).collect()
      .exists(_.getLong(0) == 0L))
  }

  test("binaryQuantize: packed bits match per-dim thresholds; hammingTopK finds duplicates") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(9)
    // 70 dims forces TWO packed words (64 + 6)
    val base = (0L until 40L).map(i => i -> Array.fill(70)(rnd.nextFloat() * 2f - 1f))
    val vecs = (base :+ (41L -> base(3)._2.clone)).toDF("vec_id", "embedding")
    val bits = Similarity.binaryQuantize(vecs, "vec_id", "embedding")
      .select($"vec_id", $"__bits").as[(Long, Seq[Long])].collect().toMap
    assert(bits.values.forall(_.length == 2), "70 dims must pack into 2 words")
    // unpack and compare against per-dim midrange thresholds
    val cols = (0 until 70).map(d => base.map(_._2(d)))
    val th = cols.map(c => (c.min + c.max) / 2.0)
    base.foreach { case (id, v) =>
      (0 until 70).foreach { d =>
        val bit = (bits(id)(d / 64) >> (d % 64)) & 1L
        assert((bit == 1L) == (v(d) > th(d)), s"vec $id dim $d")
      }
    }
    assert(bits(41L) == bits(3L))
    val top = Similarity.hammingTopK(vecs.where($"vec_id" === 41), vecs,
        "vec_id", "embedding", k = 1)
      .select($"neighbor_id", $"hamming").as[(Long, Long)].collect()
    assert(top.toSeq == Seq((3L, 0L)))
  }

  test("clusterAwareSplit: no near-duplicate cluster straddles a split boundary") {
    import graft.operators.Sampling
    val docs = spark.range(500).toDF("doc_id")
    // chain 0-1-2-...-9 into one component + a 3-cycle + singletons
    val pairs = ((0L until 9L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L))).toDF("a", "b")
    val got = Sampling.clusterAwareSplit(docs, pairs, "doc_id")
      .as[(Long, Long, String)].collect()
    val byCluster = got.groupBy(_._2)
    // every cluster's members share ONE split
    byCluster.foreach { case (cid, ms) =>
      assert(ms.map(_._3).distinct.length == 1, s"cluster $cid straddles") }
    assert(byCluster((0L)).map(_._1).toSet == (0L to 9L).toSet)
    assert(byCluster((100L)).map(_._1).toSet == Set(100L, 101L, 102L))
    // singletons keep the plain id-hash split — join-stable with splitCol
    val single = got.filter(r => r._1 > 200).map(r => r._1 -> r._3).toMap
    val plain = docs.where($"doc_id" > 200)
      .select($"doc_id", Sampling.splitCol($"doc_id").as("s"))
      .as[(Long, String)].collect().toMap
    assert(single == plain)
    // rates roughly hold over the full set
    val frac = got.count(_._3 == "train").toDouble / got.length
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("clusterAwareSplit over STRING ids: clusters stay whole; hashed " +
       "space matches the portable md5 convention") {
    import graft.operators.Sampling
    val docs = spark.range(500)
      .select(concat(lit("u-"), $"id".cast("string")).as("uid"))
    val pairs = ((0L until 9L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L)))
      .toDF("ia", "ib")
      .select(concat(lit("u-"), $"ia".cast("string")).as("a"),
        concat(lit("u-"), $"ib".cast("string")).as("b"))
    val got = Sampling.clusterAwareSplit(docs, pairs, "uid")
      .as[(String, Long, String)].collect()
    assert(got.length == 500)
    // every cluster's members share ONE split — the leakage guarantee
    val byCluster = got.groupBy(_._2)
    byCluster.foreach { case (cid, ms) =>
      assert(ms.map(_._3).distinct.length == 1, s"cluster $cid straddles") }
    // the chain and the 3-cycle each land in exactly one cluster
    def members(ids: Seq[Long]): Set[String] = ids.map(i => s"u-$i").toSet
    val chain = got.filter(r => members(0L to 9L).contains(r._1))
    assert(chain.map(_._2).distinct.length == 1, "chain torn apart")
    val cyc = got.filter(r => members(Seq(100L, 101L, 102L)).contains(r._1))
    assert(cyc.map(_._2).distinct.length == 1, "cycle torn apart")
    // cluster_id lives in the hashed node space: the portable 48-bit
    // md5 prefix convention an oracle replays via conv(substr(md5,...))
    def h48(sid: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sid.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 12), 16)
    }
    assert(chain.head._2 == (0L to 9L).map(i => h48(s"u-$i")).min)
    // singletons: own hashed id as cluster, split = splitCol of it
    val single = got.filter(_._1 == "u-300").head
    assert(single._2 == h48("u-300"))
  }

  test("clusterAwareSplit refuses mixed id families between df and pairs") {
    import graft.operators.Sampling
    val intDocs = spark.range(10).toDF("doc_id")
    val strDocs = spark.range(10)
      .select(concat(lit("u-"), $"id".cast("string")).as("uid"))
    val intPairs = Seq((1L, 2L)).toDF("a", "b")
    val strPairs = Seq(("u-1", "u-2")).toDF("a", "b")
    // integral corpus + string pairs: without the guard this joined raw
    // longs against hashed longs and silently returned leakage-unsafe
    // splits (no cluster ever matched its members)
    val e1 = intercept[IllegalArgumentException](
      Sampling.clusterAwareSplit(intDocs, strPairs, "doc_id"))
    assert(e1.getMessage.contains("both sides must"))
    val e2 = intercept[IllegalArgumentException](
      Sampling.clusterAwareSplit(strDocs, intPairs, "uid"))
    assert(e2.getMessage.contains("both sides must"))
  }

  test("scalarQuantize: codes in range, per-dim monotone; sqTopK finds exact duplicates") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(5)
    val base = (0L until 60L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 4f - 2f))
    // vec 61 duplicates vec 7 exactly: SQ codes equal, distance 0
    val vecs = (base :+ (61L -> base(7)._2.clone)).toDF("vec_id", "embedding")
    val codes = Similarity.scalarQuantize(vecs, "vec_id", "embedding")
      .select($"vec_id", $"__codes").as[(Long, Seq[Long])].collect().toMap
    assert(codes.values.flatten.forall(c => c >= 0 && c <= 255))
    // monotone per dim: higher raw value never gets a lower code
    val raw = base.toMap
    for (d <- 0 until 8; a <- base.map(_._1); b <- base.map(_._1)
         if raw(a)(d) < raw(b)(d))
      assert(codes(a)(d) <= codes(b)(d), s"dim $d not monotone")
    assert(codes(61L) == codes(7L))
    val top = Similarity.sqTopK(vecs.where($"vec_id" === 61), vecs,
        "vec_id", "embedding", k = 1)
      .select($"neighbor_id", $"dist_sq").as[(Long, Long)].collect()
    assert(top.toSeq == Seq((7L, 0L)), s"duplicate not found: ${top.toSeq}")
  }

  test("weightedTopKPerGroup: k per group, agrees with the global draw per stratum") {
    import graft.operators.Sampling
    val df = spark.range(900).toDF("id")
      .withColumn("src", when($"id" % 3 === 0, "a")
        .when($"id" % 3 === 1, "b").otherwise("c"))
      .withColumn("w", when($"id" < 90, lit(20.0)).otherwise(lit(1.0)))
    val got = Sampling.weightedTopKPerGroup(df, "src", "id", "w", k = 50)
    // exactly k per group, deterministic
    val byGroup = got.groupBy($"src").count().as[(String, Long)].collect().toMap
    assert(byGroup == Map("a" -> 50L, "b" -> 50L, "c" -> 50L))
    val again = Sampling.weightedTopKPerGroup(df, "src", "id", "w", k = 50)
    assert(got.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
    // per-stratum winners are EXACTLY the global A-ES draw restricted to
    // that stratum (same key function) — the defining property
    (0 until 3).foreach { g =>
      val src = Seq("a", "b", "c")(g)
      val stratum = df.where($"src" === src)
      val global = Sampling.weightedTopK(stratum, "id", "w", k = 50)
        .select("id").as[Long].collect().sorted.toSeq
      val grouped = got.where($"src" === src)
        .select("id").as[Long].collect().sorted.toSeq
      assert(grouped == global, s"stratum $src diverges from global draw")
    }
    // small groups keep everything eligible; zero weights never win
    val tiny = Seq(("x", 1L, 2.0), ("x", 2L, 0.0), ("y", 3L, 1.0))
      .toDF("src", "id", "w")
    val t = Sampling.weightedTopKPerGroup(tiny, "src", "id", "w", k = 5)
      .select("id").as[Long].collect().toSet
    assert(t == Set(1L, 3L))
  }

  test("charLmScore: known text scores above gibberish; short docs absent; partition-stable") {
    import graft.operators.TextAnalysis
    val train = Seq.tabulate(50)(i => (i.toLong, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val m3 = TextAnalysis.charLmCounts(train, "text", 3)
    val m2 = TextAnalysis.charLmCounts(train, "text", 2)
    val docs = Seq(
      (1L, "the quick brown fox"), // in-domain
      (2L, "zzq xvj qqw pzk zxv"), // gibberish: all unknown grams
      (3L, "ab"), // shorter than n=3 → no ngrams → absent
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextAnalysis.charLmScore(docs, "doc_id", "text", m3, m2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!out.contains(3L) && !out.contains(4L))
    val (n1, q1) = out(1L); val (n2, q2) = out(2L)
    assert(n1 == 17 && n2 == 17) // len 19 → 17 trigrams
    // per-gram average log-prob: fluent text ≫ gibberish
    assert(q1.toDouble / n1 > q2.toDouble / n2 + 10000,
      s"fluent ${q1 / n1} vs gibberish ${q2 / n2}")
    // every gibberish gram is unknown: each scores at or below the
    // all-unknown floor ln(1/128) (known contexts only lower p further)
    assert(q2 <= 17L * math.floor(1e4 * math.log(1.0 / 128.0)).toLong)
    // integer quantization makes the sum partition-order independent
    val rep = TextAnalysis.charLmScore(docs.repartition(13), "doc_id", "text", m3, m2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep == out)
  }

  test("multimodal: REAL png encode/decode round trip is pixel-exact") {
    val png = Multimodal.syntheticPng(42L, 16, 16)
    // PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (w, h, nf, px) = Multimodal.ImageIoDecoder.decode("image", png)
    assert(w == 16 && h == 16 && nf == 1)
    // decoded luma reproduces the generating closed form exactly
    for (y <- 0 until 16; x <- 0 until 16) {
      val expected = java.lang.Math.floorMod(42L * 31 + x * 7 + y * 13, 256L).toInt
      assert((px(y * 16 + x) & 0xff) == expected, s"pixel ($x,$y)")
    }
    // non-image media still routes through the stub
    val (sw, _, _, spx) = Multimodal.ImageIoDecoder.decode("audio", Array[Byte](1, 2, 3))
    assert(sw == 3 && spx.length == 3)
  }

  test("multimodal: REAL wav encode/decode round trip is sample-exact") {
    val wav = Multimodal.syntheticWav(7L, 256)
    // RIFF/WAVE magic
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
    assert(wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E')
    val (rate, channels, nFrames, samples) =
      Multimodal.JdkMediaDecoder.decode("audio", wav)
    assert(rate == 8000 && channels == 1 && nFrames == 256)
    // decoded PCM reproduces the generating closed form exactly
    for (j <- 0 until 256) {
      val expected = java.lang.Math.floorMod(7L * 17 + j * 29, 256L).toInt
      assert((samples(j) & 0xff) == expected, s"sample $j")
    }
    // 16-bit signed PCM maps onto the unsigned high byte
    val data16 = Array.tabulate(8)(j => (j * 4096 - 16384).toShort)
    val bytes16 = new Array[Byte](16)
    java.nio.ByteBuffer.wrap(bytes16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer().put(data16)
    val fmt16 = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes16), fmt16, 8),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val (_, _, nf16, s16) = Multimodal.JdkMediaDecoder.decode("audio", bos.toByteArray)
    assert(nf16 == 8)
    for (j <- 0 until 8)
      assert((s16(j) & 0xff) == ((data16(j) >> 8) + 128), s"16-bit sample $j")
    // images route through ImageIoDecoder unchanged
    val (w, h, _, _) = Multimodal.JdkMediaDecoder.decode("image",
      Multimodal.syntheticPng(1L, 8, 8))
    assert(w == 8 && h == 8)
  }

  test("decontamination: shared word n-grams against a benchmark set") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),   // contains bench 5-grams
      (1L, "alpha beta gamma delta epsilon"),        // = one bench doc exactly
      (2L, "totally unrelated words here now then"), // clean
      (3L, "too short")                              // < n tokens: no n-grams
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val rows = TextAnalysis.contamination(corpus, bench, "text", "doc_id", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows(0L) == ((1L, true)))  // one shared 5-gram window
    assert(rows(1L) == ((1L, true)))
    assert(rows(2L) == ((0L, false)))
    assert(rows(3L) == ((0L, false)))
  }

  test("line dedup: repeated lines keep first occurrence only") {
    val df = Seq(
      (0L, "shared header\nunique zero\nshared footer"),
      (1L, "shared header\nunique one\nshared footer"),
      (2L, "unique two")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) == ((3L, 3L, "shared header\nunique zero\nshared footer")))
    assert(out(1L) == ((3L, 1L, "unique one"))) // both shared lines removed
    assert(out(2L) == ((1L, 1L, "unique two")))
  }

  test("chunkIntoLines: 10-token lines with a short tail") {
    val df = Seq((0L, (1 to 23).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val lines = df.select(Dedup.chunkIntoLines($"text", 10).as("c"))
      .as[String].head().split("\n")
    assert(lines.length == 3)
    assert(lines(0).split(" ").length == 10)
    assert(lines(2) == "t21 t22 t23")
  }

  test("bm25: rational-idf scores rank term-bearing docs first") {
    val df = Seq(
      (0L, "spark spark spark engine"),
      (1L, "spark engine"),
      (2L, "window function"),
      (3L, "nothing relevant at all here in this very long document text")
    ).toDF("doc_id", "text")
    val scores = TextAnalysis.bm25(df, "text", "doc_id", Seq("spark", "window"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(0L) > scores(1L)) // higher tf wins at equal dl-ish
    assert(scores(1L) > 0 && scores(2L) > 0)
    assert(scores(3L) == 0.0)       // no query terms → zero score
  }

  test("kmeans: separable clusters converge; init ids under k") {
    // two tight groups far apart in 4-d; ids 0,1 (one per group) seed
    val vecs = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), (2L, Array(0.1f, 0f, 0f, 0f)),
      (4L, Array(0f, 0.1f, 0f, 0f)),
      (1L, Array(10f, 10f, 10f, 10f)), (3L, Array(10.1f, 10f, 10f, 10f)),
      (5L, Array(10f, 10.1f, 10f, 10f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansAssign(vecs, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 0L && out(2L) == 0L && out(4L) == 0L)
    assert(out(1L) == 1L && out(3L) == 1L && out(5L) == 1L)
  }

  test("kmv sketch: k smallest distinct hashes; exact below k; merge-stable") {
    import graft.operators.Sketches
    // 1000 values in 4 partitions: exercises partial update + merge
    val df = spark.range(1000).toDF("v").repartition(4)
      .select(lit("g").as("g"), $"v")
    val est = Sketches.distinctEstimate(df, "g", "v", k = 64)
      .head()
    val (nSeen, kth, estD) = (est.getLong(1), est.getLong(2), est.getLong(3))
    assert(nSeen == 64)
    // estimate within ~3 standard errors (se ≈ 1/sqrt(k-2) ≈ 13%)
    assert(math.abs(estD - 1000.0) / 1000.0 < 0.4, s"estimate $estD")
    // exact path below k: 10 distinct values
    val small = spark.range(10).toDF("v").select(lit("g").as("g"), $"v")
    val ex = Sketches.distinctEstimate(small, "g", "v", k = 64).head()
    assert(ex.getLong(1) == 10 && ex.getLong(3) == 10)
    // determinism: repartitioning does not change the sketch
    val est2 = Sketches.distinctEstimate(df.repartition(13), "g", "v", k = 64).head()
    assert(est2.getLong(2) == kth && est2.getLong(3) == estD)
  }

  test("chunkDocuments: overlapping windows, truncated tail") {
    val df = Seq((0L, (1 to 25).map(i => s"t$i").mkString(" ")),
                 (1L, "short doc")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(df, "text", "doc_id",
        window = 16, stride = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    // doc 0: 25 tokens → ceil((25-16)/8)+1 = 3 chunks at starts 0, 8, 16
    assert(chunks((0L, 0))._2 == 16L)
    assert(chunks((0L, 1))._1.startsWith("t9 "))
    assert(chunks((0L, 2)) == (((17 to 25).map(i => s"t$i").mkString(" "), 9L)))
    // doc 1: shorter than one window → exactly one chunk
    assert(chunks((1L, 0)) == (("short doc", 2L)))
    assert(!chunks.contains((1L, 1)))
  }

  test("packBins: per-shard exclusive running sum, boundary-split bins") {
    import graft.operators.Sampling
    val df = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L))
      .toDF("doc_id", "n_tokens")
    // one shard → deterministic id order: prefixes 0,100,200,300
    val out = Sampling.packBins(df, "doc_id", "n_tokens",
        maxTokens = 250, shards = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L))
  }

  test("kmeans collected variant matches the pure-plan variant bit-for-bit") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Similarity.kmeansAssign(emb, "vec_id", "embedding", k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (collectedDf, centroids) =
      Similarity.kmeansFitCollected(emb, "vec_id", "embedding", k = 8, iters = 2)
    val collected = collectedDf
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(plan == collected)
    assert(centroids.nonEmpty && centroids.forall(_._2.length == 64))
    // trained centroids feed IVF as the coarse quantizer
    val centFrame = {
      import spark.implicits._
      centroids.toSeq.map { case (cid, c) => (cid, c.map(_.toFloat)) }
        .toDF("vec_id", "embedding")
    }
    val assignedViaIvf = Similarity.ivfAssign(
      emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("embedding")),
      "vec_id", "embedding", centFrame)
    assert(assignedViaIvf.count() == emb.count())
  }

  test("resizeNearest: integer source mapping, 2x downsample is stride-2") {
    val src = Array.tabulate[Byte](16 * 16)(i => i.toByte)
    val out = Multimodal.resizeNearest(src, 16, 16, 8, 8)
    assert(out.length == 64)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(out(y * 8 + x) == src(2 * y * 16 + 2 * x), s"($x,$y)")
    // upsample: 2x2 → 4x4 repeats each pixel in 2x2 blocks
    val up = Multimodal.resizeNearest(Array[Byte](1, 2, 3, 4), 2, 2, 4, 4)
    assert(up.toSeq == Seq[Byte](1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
  }

  test("winnowFingerprint: k smallest shingle hashes, ascending") {
    val df = Seq((0L, "abcdefghij"), (1L, "ab")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprint(df, "text", "doc_id",
        shingleK = 4, k = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fps(0L).length == 3)
    assert(fps(0L) == fps(0L).sorted)
    // doc 1 has a single (short) shingle → sketch keeps what exists
    assert(fps(1L).length == 1)
    // sketch overlap of identical docs is total
    val same = Seq((0L, "abcdefghij"), (1L, "abcdefghij")).toDF("doc_id", "text")
    val s2 = TextAnalysis.winnowFingerprint(same, "text", "doc_id", 4, 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(s2(0L) == s2(1L))
  }

  test("sketchJaccard: identical docs estimate 1.0; disjoint estimate 0.0") {
    val df = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "zzz yyy xxx www vvv uuu")).toDF("doc_id", "text")
    val sketches = TextAnalysis.winnowFingerprint(df, "text", "doc_id", 3, 8)
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("a", "b")
    val out = TextAnalysis.sketchJaccardCounts(sketches, pairs, "doc_id", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val (k01, ov01) = out((0L, 1L))
    assert(k01 == ov01) // identical sketches → total overlap → J est 1.0
    assert(out((0L, 2L))._2 == 0L) // disjoint shingles → zero overlap
  }

  test("tfidf: rare term outranks common term; top-k and ties ordered") {
    val df = Seq(
      (0L, "common common rare"),
      (1L, "common boring"),
      (2L, "common boring")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, "text", "doc_id", topK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // doc 0: "rare" (df=1) must outrank "common" (df=3) despite tf 1 vs 2
    assert(out((0L, 1)) == "rare")
    assert(out((0L, 2)) == "common")
  }

  test("int8 quantization clamps and floors; matryoshka renorm is unit") {
    val vecs = Seq((0L, Array(0.5f, -0.5f, 2.0f, -2.0f)),
                   (1L, Array(0.0f, 0.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
    val q8 = vecs.select($"vec_id", Similarity.quantizeInt8($"embedding").as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(q8(0L) == Seq(63, -64, 127, -128)) // floor + clamp
    val ren = Similarity.truncateRenormed(vecs, "vec_id", "embedding", dims = 2)
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    val v0 = ren(0L).get
    assert(math.abs(math.sqrt(v0.map(x => x * x).sum) - 1.0) < 1e-12)
    assert(ren(1L).isEmpty) // all-zero prefix → null, not NaN
    // column form agrees with the staged form
    val colForm = vecs.select($"vec_id",
        Similarity.truncateRenorm($"embedding", 2).as("r"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    assert(colForm(0L).get == v0 && colForm(1L).isEmpty)
  }

  test("ivfKmeansTopK: trained cells confine neighbors to their family") {
    val vecs = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), (2L, Array(0.1f, 0f, 0f, 0f)),
      (4L, Array(0f, 0.1f, 0f, 0f)),
      (1L, Array(10f, 10f, 10f, 10f)), (3L, Array(10.1f, 10f, 10f, 10f)),
      (5L, Array(10f, 10.1f, 10f, 10f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.ivfKmeansTopK(vecs, vecs, "vec_id", "embedding",
        k = 1, nList = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.size == 6)
    out.foreach { case (q, n) =>
      assert(q % 2 == n % 2, s"query $q got cross-family neighbor $n")
    }
  }

  test("quantileThreshold: exact rank quantile from a value histogram") {
    val df = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    def thr(p: Double): Long =
      graft.operators.Sampling.quantileThreshold(df, "v", p)
        .head().getLong(0)
    assert(thr(0.25) == 25L)
    assert(thr(0.5) == 50L)
    assert(thr(1.0) == 100L)
    // ceil semantics: p just over a rank boundary moves to the next value
    assert(thr(0.251) == 26L)
  }

  test("quantileThresholdBy: per-group thresholds match per-group global runs") {
    import graft.operators.Sampling
    val df = ((1 to 100).map(i => ("a", Some(i.toLong))) ++
      (1 to 10).map(i => ("b", Some(i * 7L))) ++
      Seq(("c", None: Option[Long])))
      .toDF("g", "v")
    val got = Sampling.quantileThresholdBy(df, "g", "v", 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == 50L)
    assert(got("b") == 35L) // 5th of 7,14,...,70
    assert(!got.contains("c")) // only-null group drops with its null values
    // agrees with the global operator run per group
    Seq("a", "b").foreach { g =>
      val solo = Sampling.quantileThreshold(df.where($"g" === g), "v", 0.5)
        .head().getLong(0)
      assert(solo == got(g), s"group $g")
    }
  }

  test("repeatedSpans: cross-doc windows surface with exact doc/occurrence counts") {
    import graft.operators.Dedup
    val df = Seq(
      (0L, "the shared prefix runs here and unique tail zero"),
      (1L, "the shared prefix runs here with unique tail one"),
      (2L, "completely different body text without any overlap"),
      (3L, "xx the shared prefix runs here xx the shared prefix runs here xx")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(df, "text", "doc_id", spanLen = 28, minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // the full shared sentence window appears in docs 0, 1, 3 (twice in 3)
    val key = "the shared prefix runs here "
    val hit = spans.find(_._1 == key)
    assert(hit.contains((key, 3L, 4L)), s"got ${spans.toSeq.sortBy(-_._2).take(3)}")
    // nothing from the non-overlapping doc
    assert(!spans.exists(_._1.contains("different body")))
    // all reported spans really span >= 2 docs
    assert(spans.forall(_._2 >= 2))
  }

  test("keepBestPerCluster: highest quality wins, ties by id, singletons survive") {
    import graft.operators.Dedup
    val d = Seq(
      (0L, 10L), (1L, 50L), (2L, 50L), // cluster {0,1,2}: 1 wins (50, min id)
      (3L, 7L), (4L, 3L),              // cluster {3,4}: 3 wins
      (5L, 1L)                         // singleton: survives
    ).toDF("doc_id", "quality")
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("a", "b")
    val kept = Dedup.keepBestPerCluster(d, pairs, "doc_id", "quality")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
  }

  test("temperatureBudgets: alpha=1 is proportional, alpha=0 is uniform") {
    import graft.operators.Sampling
    val d = Seq.tabulate(40)(i =>
      (i.toLong, if (i < 30) "big" else "small", 100L))
      .toDF("id", "src", "tok") // big: 3000 tokens, small: 1000
    val prop = Sampling.temperatureBudgets(d, "src", "tok", 4000L, alpha = 1.0)
    assert(prop("big") == 3000L && prop("small") == 1000L)
    val unif = Sampling.temperatureBudgets(d, "src", "tok", 4000L, alpha = 0.0)
    assert(unif("big") == 2000L && unif("small") == 2000L)
    // intermediate alpha up-weights the small source, monotonically
    val mid = Sampling.temperatureBudgets(d, "src", "tok", 4000L, alpha = 0.5)
    assert(mid("small") > 1000L && mid("small") < 2000L)
    assert(mid("big") + mid("small") <= 4000L)
    // composes with mixtureSample: budgets cap each source's token mass
    val mixed = Sampling.mixtureSample(d, "id", "src", "tok", unif)
    val toks = mixed.groupBy("src").agg(sum($"tok").as("t"))
      .as[(String, Long)].collect().toMap
    assert(toks("small") == 1000L)       // whole source fits its budget
    assert(toks("big") == 2000L)         // filled to the budget exactly
  }

  test("mixtureSample: fill-until-reached budgets in deterministic hash order") {
    import graft.operators.Sampling
    val docs = (0L until 30L).map(i =>
      (i, if (i < 15) "a" else "b", 100L)).toDF("doc_id", "source", "n_tok")
    // budget 350 → exclusive prefix < 350 → 4 docs of 100 (the 4th crosses)
    val got = Sampling.mixtureSample(docs, "doc_id", "source", "n_tok",
      Map("a" -> 350L, "b" -> 1L))
    val bySource = got.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource == Map("a" -> 4L, "b" -> 1L)) // b: budget 1 = first doc
    // determinism: partition order must not change the mix
    val again = Sampling.mixtureSample(docs.repartition(7), "doc_id",
      "source", "n_tok", Map("a" -> 350L, "b" -> 1L))
      .select("doc_id").as[Long].collect().toSet
    assert(again == got.select("doc_id").as[Long].collect().toSet)
    // unlisted source drops entirely
    assert(!got.select("source").as[String].collect().contains("c"))
  }

  test("farthest-point seeding: inertia <= first-ids on adversarial id order") {
    val r = new scala.util.Random(20260813L)
    (1 to 5).foreach { round =>
      val c = 3 + r.nextInt(3) // well-separated clusters, k = c
      val centers = (0 until c).map(i => (i * 20.0, (i % 2) * 20.0))
      val pts = scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]()
      var id = 0L
      // adversarial: the first k ids are DUPLICATE points inside cluster 0,
      // so the id<k init seeds one cluster k times over
      (0 until c).foreach { _ =>
        pts += ((id, Array(centers(0)._1.toFloat, centers(0)._2.toFloat)))
        id += 1
      }
      centers.foreach { case (cx, cy) =>
        (0 until 10).foreach { _ =>
          pts += ((id, Array((cx + r.nextDouble() - 0.5).toFloat,
            (cy + r.nextDouble() - 0.5).toFloat)))
          id += 1
        }
      }
      val df = pts.toSeq.toDF("vec_id", "embedding")
      val base = Similarity.kmeansCentroidsFrame(df, "vec_id", "embedding",
        k = c, updates = 2)
      val fp = Similarity.kmeansCentroidsFrame(df, "vec_id", "embedding",
        k = c, updates = 2, seeding = "farthest")
      val iBase = Similarity.kmeansInertia(df, "vec_id", "embedding", base)
      val iFp = Similarity.kmeansInertia(df, "vec_id", "embedding", fp)
      assert(iFp <= iBase + 1e-6,
        s"round $round: farthest inertia $iFp > first-ids $iBase")
      // on this geometry the spread init must actually win, not just tie
      assert(iFp < iBase, s"round $round: expected a strict win, got tie $iFp")
    }
  }

  test("farthest-point seeds are partition-order invariant") {
    val vecs = (0L until 40L).map(i =>
      (i, Array((i % 7).toFloat, (i % 11).toFloat))).toDF("vec_id", "embedding")
    def seedsOf(df: org.apache.spark.sql.DataFrame) =
      Similarity.farthestPointSeeds(df, "vec_id", "embedding", k = 4)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toList
        .sortBy(_._1)
    assert(seedsOf(vecs) == seedsOf(vecs.repartition(7)))
  }

  test("AnnIndex: persisted IVF-PQ search equals inline search exactly") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 64L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f)).toDF("vec_id", "embedding")
    val queries = vecs.where($"vec_id" < 4)
    val inline = Similarity.ivfPqTopK(queries, vecs, "vec_id", "embedding",
      dims = 8, m = 2, k = 4, nList = 4, topK = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet

    val dir = java.nio.file.Files.createTempDirectory("annidx").toString
    try {
      graft.sources.AnnIndex.saveIvfPq(vecs, "vec_id", "embedding", dir,
        dims = 8, m = 2, k = 4, nList = 4)
      // manifest present, underscore-prefixed (metadata to Spark's lister)
      assert(graft.sources.BucketFs.exists(
        s"$dir/${graft.sources.AnnIndex.ManifestFile}"))
      // codes laid out as one directory per cell inside generation 0
      // (the inverted list, committed by the manifest)
      val cellDirs = new java.io.File(s"$dir/codes/gen=0").listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
      assert(cellDirs.nonEmpty)
      val idx = graft.sources.AnnIndex.loadIvfPq(spark, dir)
      assert(idx.dims == 8 && idx.m == 2 && idx.k == 4 && idx.nList == 4 &&
        idx.quantizeScale.contains(1000.0) && idx.idCol == "vec_id")
      val persisted = idx.search(queries, "embedding", topK = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(persisted == inline)
      // a second search from the same loaded index (no rebuild) also matches
      assert(idx.search(queries, "embedding", topK = 3).count() == inline.size)
      // cell pruning: the probe-cell set lands as a STATIC partition
      // filter on the codes scan, and results are identical with it off
      val pruned = idx.search(queries, "embedding", topK = 3)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"),
        "expected a static cell partition filter on the codes scan")
      val unpruned = idx.search(queries, "embedding", topK = 3,
          pruneCells = false)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(unpruned == persisted)
    } finally graft.sources.BucketFs.deleteRecursive(dir)

    // residual variant: same round-trip equality through its own manifest
    val inlineRes = Similarity.ivfPqTopK(queries, vecs, "vec_id", "embedding",
      dims = 8, m = 2, k = 4, nList = 4, topK = 3, residual = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val rdir = java.nio.file.Files.createTempDirectory("annidx_res").toString
    try {
      graft.sources.AnnIndex.saveIvfPq(vecs, "vec_id", "embedding", rdir,
        dims = 8, m = 2, k = 4, nList = 4, residual = true)
      val ridx = graft.sources.AnnIndex.loadIvfPq(spark, rdir)
      assert(ridx.residual)
      val persistedRes = ridx.search(queries, "embedding", topK = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(persistedRes == inlineRes)
    } finally graft.sources.BucketFs.deleteRecursive(rdir)
  }

  test("AnnIndex.delete: tombstones rewrite only affected cells; emptied cell vanishes") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 64L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f)).toDF("vec_id", "embedding")
    val queries = vecs.where($"vec_id" < 4)
    val dir = java.nio.file.Files.createTempDirectory("annidx_del").toString
    try {
      graft.sources.AnnIndex.saveIvfPq(vecs, "vec_id", "embedding", dir,
        dims = 8, m = 2, k = 4, nList = 4)
      val idx0 = graft.sources.AnnIndex.loadIvfPq(spark, dir)
      // pick one whole cell's ids (to empty it) plus an unknown id
      val cellOfRow = idx0.codes.select($"vec_id", $"cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      val (victimCell, victimIds) =
        cellOfRow.groupBy(_._2).view.mapValues(_.map(_._1).toSeq).minBy(_._2.size)
      val untouched = new java.io.File(s"$dir/codes/gen=0/cell=${(victimCell + 1) % 4}")
      val beforeMtimes = untouched.listFiles().map(f => f.getName -> f.lastModified()).toMap
      val idx = idx0.delete(victimIds :+ 9999L)
      // the emptied cell's directory is gone; the untouched cell's files unmoved
      assert(!new java.io.File(s"$dir/codes/gen=0/cell=$victimCell").exists())
      assert(untouched.listFiles().map(f => f.getName -> f.lastModified()).toMap
        == beforeMtimes)
      // search equals a rebuild-free recompute over the surviving ids
      val got = idx.search(queries, "embedding", topK = 3)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(got.nonEmpty)
      assert(!got.exists(t => victimIds.contains(t._2)))
      // deleting from a stream-managed codes dir is refused
      graft.sources.BucketFs.mkdirs(
        org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration()),
        new org.apache.hadoop.fs.Path(s"$dir/codes/_spark_metadata"))
      intercept[IllegalArgumentException](idx.delete(Seq(1L)))
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("AnnIndex.append: incremental ingest encodes against the frozen codebook") {
    val rnd = new scala.util.Random(11)
    val all = (0L until 64L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    val first = all.filter(_._1 < 40).toDF("vec_id", "embedding")
    val rest = all.filter(_._1 >= 40).toDF("vec_id", "embedding")
    val allDf = all.toDF("vec_id", "embedding")
    val queries = allDf.where($"vec_id" < 4)
    val dir = java.nio.file.Files.createTempDirectory("annidx_app").toString
    try {
      graft.sources.AnnIndex.saveIvfPq(first, "vec_id", "embedding", dir,
        dims = 8, m = 2, k = 4, nList = 4)
      val idx0 = graft.sources.AnnIndex.loadIvfPq(spark, dir)
      val idx = idx0.append(rest, "embedding")
      val got = idx.search(queries, "embedding", topK = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      // expected: the SAME frozen centroids/codebook (built from the first
      // 40 rows) with codes covering all 64 — computed in memory, no
      // persistence involved
      val cents = idx.centroids.select(col("cell").as("centroid_id"),
        col("centroid").as("__c"))
      val cb = idx.codebook.select(col("subspace").as("__s"),
        col("code_id").as("__cid"), col("centroid").as("__c"))
      val codesAll = graft.operators.Similarity.encodeAgainstIndex(allDf,
        "vec_id", "embedding", cents, cb, dims = 8, m = 2, k = 4, nList = 4,
        residual = false, quantizeScale = Some(1000.0), integerCb = true)
      val expect = graft.operators.Similarity.ivfPqSearchIndex(queries,
          "vec_id", "embedding", cents, cb, codesAll, dims = 8, m = 2,
          k = 4, nList = 4, topK = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(got == expect)
      // the appended half is actually searchable (some neighbor >= 40)
      assert(got.exists(_._3 >= 40L))
      // the stale pre-append instance still sees only the original codes
      assert(idx0.codes.count() == 40L && idx.codes.count() == 64L)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("AnnIndex: as-of reads pin a historical generation and are read-only") {
    val rnd = new scala.util.Random(23)
    val all = (0L until 64L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    val first = all.filter(_._1 < 40).toDF("vec_id", "embedding")
    val rest = all.filter(_._1 >= 40).toDF("vec_id", "embedding")
    val queries = first.where($"vec_id" < 4)
    val dir = java.nio.file.Files.createTempDirectory("annidx_asof").toString
    try {
      graft.sources.AnnIndex.saveIvfPq(first, "vec_id", "embedding", dir,
        dims = 8, m = 2, k = 4, nList = 4)
      val preAppend = graft.sources.AnnIndex.loadIvfPq(spark, dir)
        .search(queries, "embedding", topK = 5).collect().toSeq.map(_.toSeq)
      graft.sources.AnnIndex.loadIvfPq(spark, dir).append(rest, "embedding")
      // time travel back to gen 1 = the pre-append search, exactly
      val asOf = graft.sources.AnnIndex.loadIvfPq(spark, dir, asOfGen = 1)
      assert(asOf.search(queries, "embedding", topK = 5)
        .collect().toSeq.map(_.toSeq) == preAppend)
      assert(asOf.codes.count() == 40L)
      // read-only: history cannot be forked
      val e = intercept[IllegalArgumentException](asOf.append(rest, "embedding"))
      assert(e.getMessage.contains("read-only"))
      // a generation ahead of head is refused
      intercept[IllegalArgumentException](
        graft.sources.AnnIndex.loadIvfPq(spark, dir, asOfGen = 3))
      // head load still sees everything
      assert(graft.sources.AnnIndex.loadIvfPq(spark, dir).codes.count() == 64L)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("AnnIndex.compactGens: folds code generations, search unchanged") {
    val rnd = new scala.util.Random(29)
    val all = (0L until 64L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    val first = all.filter(_._1 < 40).toDF("vec_id", "embedding")
    val rest = all.filter(_._1 >= 40).toDF("vec_id", "embedding")
    val queries = first.where($"vec_id" < 4)
    val dir = java.nio.file.Files.createTempDirectory("annidx_gcmp").toString
    try {
      graft.sources.AnnIndex.saveIvfPq(first, "vec_id", "embedding", dir,
        dims = 8, m = 2, k = 4, nList = 4)
      val grown = graft.sources.AnnIndex.loadIvfPq(spark, dir)
        .append(rest, "embedding")
      val before = grown.search(queries, "embedding", topK = 5)
        .collect().toSeq.map(_.toSeq)
      val compacted = grown.compactGens()
      assert(compacted.baseGen == 2 && compacted.nGens == 3)
      assert(compacted.search(queries, "embedding", topK = 5)
        .collect().toSeq.map(_.toSeq) == before)
      val gens = new java.io.File(s"$dir/codes").listFiles()
        .map(_.getName).filter(_.startsWith("gen=")).toSet
      assert(gens == Set("gen=2"), s"unexpected generations: $gens")
      // folded history unreachable; further appends chain
      intercept[IllegalArgumentException](
        graft.sources.AnnIndex.loadIvfPq(spark, dir, asOfGen = 1))
      val grown2 = compacted.append(
        Seq((99L, Array.fill(8)(0.5f))).toDF("vec_id", "embedding"),
        "embedding")
      assert(grown2.baseGen == 2 && grown2.nGens == 4)
      assert(grown2.codes.count() == 65L)
      // as-of the compacted point = the pre-compaction head, exactly
      assert(graft.sources.AnnIndex.loadIvfPq(spark, dir, asOfGen = 3)
        .search(queries, "embedding", topK = 5)
        .collect().toSeq.map(_.toSeq) == before)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("AnnIndex: crashed append is invisible, swept on retry; stale handles refused") {
    val rnd = new scala.util.Random(19)
    val vecs = (0L until 48L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat() * 2f - 1f)).toDF("vec_id", "embedding")
    val queries = vecs.where($"vec_id" < 4)
    val dir = java.nio.file.Files.createTempDirectory("annidx_crash").toString
    try {
      graft.sources.AnnIndex.saveIvfPq(vecs.where($"vec_id" < 32),
        "vec_id", "embedding", dir, dims = 8, m = 2, k = 4, nList = 4)
      val idx0 = graft.sources.AnnIndex.loadIvfPq(spark, dir)
      val before = idx0.search(queries, "embedding", topK = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      // simulate an append that died after its codes write but BEFORE the
      // manifest commit: a gen=1 directory the manifest doesn't know about
      Seq((99L, Seq(0L, 0L))).toDF("vec_id", "pq_code")
        .write.parquet(s"$dir/codes/gen=1/cell=0")
      val reloaded = graft.sources.AnnIndex.loadIvfPq(spark, dir)
      assert(reloaded.codes.count() == 32L,
        "uncommitted generation leaked into the codes frame")
      assert(reloaded.search(queries, "embedding", topK = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet == before)
      // the retry (a real append) sweeps the debris, not merges it
      val grown = reloaded.append(vecs.where($"vec_id" >= 32), "embedding")
      assert(grown.nGens == 2)
      assert(grown.codes.where($"vec_id" === 99L).count() == 0,
        "crashed-append debris survived the retry sweep")
      assert(grown.codes.count() == 48L)
      // a stale handle must not append (it would sweep gen=1 as debris)
      val e = intercept[IllegalArgumentException](
        reloaded.append(vecs.limit(1), "embedding"))
      assert(e.getMessage.contains("stale index handle"))
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("AnnIndex: batch/stream codes ownership is mutually exclusive") {
    val rnd = new scala.util.Random(17)
    val vecs = (0L until 32L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat())).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("annidx_own").toString
    try {
      // batch-managed codes: the streaming writer must refuse
      graft.sources.AnnIndex.saveIvfPq(vecs, "vec_id", "embedding", dir,
        dims = 8, m = 2, k = 4, nList = 4)
      val e1 = intercept[IllegalArgumentException](
        graft.sources.AnnIndex.streamingCodesWriter(spark, dir, "/tmp/none",
          vecs.schema, "embedding", s"$dir/_ckpt"))
      assert(e1.getMessage.contains("batch-managed"))

      // stream-managed codes: batch append must refuse
      val sdir = java.nio.file.Files.createTempDirectory("annidx_own2").toString
      try {
        graft.sources.AnnIndex.saveIvfPq(vecs, "vec_id", "embedding", sdir,
          dims = 8, m = 2, k = 4, nList = 4, includeCodes = false)
        val src = s"$sdir/_src"
        vecs.write.parquet(src)
        val q = graft.sources.AnnIndex.streamingCodesWriter(spark, sdir, src,
          vecs.schema, "embedding", s"$sdir/_ckpt").start()
        q.awaitTermination()
        val idx = graft.sources.AnnIndex.loadIvfPq(spark, sdir)
        assert(idx.codes.count() == 32L)
        val e2 = intercept[IllegalArgumentException](
          idx.append(vecs, "embedding"))
        assert(e2.getMessage.contains("stream-managed"))
        // and a second streaming run over the same source is a no-op
        // (checkpoint replay), not a duplication
        val q2 = graft.sources.AnnIndex.streamingCodesWriter(spark, sdir, src,
          vecs.schema, "embedding", s"$sdir/_ckpt").start()
        q2.awaitTermination()
        assert(graft.sources.AnnIndex.loadIvfPq(spark, sdir).codes.count() == 32L)
      } finally graft.sources.BucketFs.deleteRecursive(sdir)
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("AnnIndex.compactCodes: stream->batch handoff preserves codes and unlocks batch verbs") {
    val rnd = new scala.util.Random(19)
    val vecs = (0L until 32L).map(i =>
      i -> Array.fill(8)(rnd.nextFloat())).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("annidx_cmp").toString
    try {
      graft.sources.AnnIndex.saveIvfPq(vecs, "vec_id", "embedding", dir,
        dims = 8, m = 2, k = 4, nList = 4, includeCodes = false)
      val src = s"$dir/_src"
      vecs.write.parquet(src)
      val q = graft.sources.AnnIndex.streamingCodesWriter(spark, dir, src,
        vecs.schema, "embedding", s"$dir/_ckpt").start()
      q.awaitTermination()
      val before = graft.sources.AnnIndex.loadIvfPq(spark, dir).codes
        .select($"vec_id", $"cell", $"pq_code").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet

      graft.sources.AnnIndex.compactCodes(spark, dir)
      // sink log gone, codes byte-identical, double compaction refused
      assert(!graft.sources.BucketFs.exists(s"$dir/codes/_spark_metadata"))
      val after = graft.sources.AnnIndex.loadIvfPq(spark, dir).codes
        .select($"vec_id", $"cell", $"pq_code").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
      assert(after == before)
      intercept[IllegalArgumentException](
        graft.sources.AnnIndex.compactCodes(spark, dir))
      // batch verbs now work: delete a vector, search never returns it
      val idx = graft.sources.AnnIndex.loadIvfPq(spark, dir).delete(Seq(31L))
      assert(idx.codes.count() == 31L)
      // and the old stream refuses to restart into the batch-managed dir
      intercept[IllegalArgumentException](
        graft.sources.AnnIndex.streamingCodesWriter(spark, dir, src,
          vecs.schema, "embedding", s"$dir/_ckpt"))
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("encodeRowsAgainstCollected: NaN vector fails fast (streaming-batch parity)") {
    // r6 ADVICE: least(struct) tolerates NaN (NaN loses in Spark ordering),
    // so without the guard a malformed vector encodes SILENTLY in the
    // streaming ingest while the batch packed argmin raises on it
    import graft.operators.Similarity
    val df = Seq((1L, Array(Double.NaN, 1.0, 0.5, 0.25))).toDF("id", "v")
    val cents = Array(0L -> Array(0.0, 0.0, 0.0, 0.0), 1L -> Array(1.0, 1.0, 1.0, 1.0))
    val cb = Map(
      0 -> Array(0L -> Array(0.0, 0.0), 1L -> Array(1.0, 1.0)),
      1 -> Array(0L -> Array(0.0, 0.0), 1L -> Array(1.0, 1.0)))
    val enc = Similarity.encodeRowsAgainstCollected(
      df, "id", "v", cents, cb, dims = 4, m = 2, quantizeScale = None)
    val e = intercept[Exception](enc.collect())
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else t.getMessage :: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("non-finite distance")))
  }

  test("AnnIndex: loading a non-index directory fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("notanidx").toString
    try {
      val e = intercept[IllegalArgumentException](
        graft.sources.AnnIndex.loadIvfPq(spark, dir))
      assert(e.getMessage.contains("_ann_index.json"))
    } finally graft.sources.BucketFs.deleteRecursive(dir)
  }

  test("spanDuplicationStats: shared vs unique windows, repeats within one doc don't count") {
    val d = Seq(
      (0L, "abcdefghij"),   // shares every 4-window with doc 1
      (1L, "abcdefghij"),
      (2L, "zxywzxywzx"),   // repeats its own windows, shares none
      (3L, "zz")            // shorter than spanLen: no windows, absent
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.spanDuplicationStats(d, "text", "doc_id",
      spanLen = 4, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == (7L, 7L) && got(1L) == (7L, 7L),
      "dup docs: all 7 windows duplicated")
    // doc 2's 7 windows cycle 'abcd': multiplicity within ONE doc is not
    // cross-document duplication
    assert(got(2L) == (7L, 0L), "self-repeats must not count as dup")
    assert(!got.contains(3L), "sub-spanLen doc has no windows")
  }

  test("bpeTrain: hand-computed merges, tie-break, composition, early exhaustion") {
    // words: "aab" ×3, "ab" ×2
    // step 1: (a,b) n=5 ties (b,</w>) n=5 → left asc wins → merge "ab"
    // step 2: (ab,</w>) n=5
    // step 3: (a,ab</w>) n=3 — merged symbols keep composing
    val df = Seq("aab aab ab", "aab ab").toDF("text")
    val got = graft.operators.TextAnalysis.bpeTrain(df, "text", merges = 10)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, "a", "b", "ab", 5L),
      (2, "ab", "</w>", "ab</w>", 5L),
      (3, "a", "ab</w>", "aab</w>", 3L)),
      "merge table must equal the hand computation")
    // after step 3 every word is a single symbol — no pairs remain, so
    // training exhausts at 3 even though 10 merges were requested
  }

  test("bpeTrainBatched: batch=1 == sequential table; batching collapses jobs; disjoint rule holds") {
    val corpus = Seq("aab aab ab cde cde", "aab ab fgh cde", "fgh fgh xy").toDF("text")
    def table(df: org.apache.spark.sql.DataFrame) = df.orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    // count Spark jobs per run — batching's whole point is fewer of them
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    def counted[A](body: => A): (A, Int) = {
      spark.sparkContext.addSparkListener(listener)
      jobs = 0
      try {
        val a = body
        // the listener bus is async: wait until the count stops moving
        var last = -1
        var spins = 0
        while (jobs != last && spins < 50) {
          last = jobs; spins += 1; Thread.sleep(100)
        }
        (a, jobs)
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    import graft.operators.TextAnalysis
    val (seq8, jSeq) = counted(table(TextAnalysis.bpeTrain(corpus, "text", merges = 8)))
    val (one8, jOne) = counted(table(TextAnalysis.bpeTrainBatched(corpus, "text", merges = 8, batch = 1)))
    assert(one8 == seq8, "batch=1 must reproduce the sequential table exactly")
    val (bat8, jBat) = counted(table(TextAnalysis.bpeTrainBatched(corpus, "text", merges = 8, batch = 4)))
    assert(bat8.map(_._1) == (1 to bat8.length), "steps stay dense and ordered")
    // within each round, accepted pairs' symbol sets are pairwise disjoint
    bat8.grouped(4).foreach { round =>
      val syms = round.flatMap(m => Seq(m._2, m._3))
      assert(syms.distinct.size == syms.size, s"round shares symbols: $round")
    }
    // 8 count+apply rounds collapse to 2: strictly fewer driver jobs
    assert(jBat < jSeq / 2,
      s"batched run should schedule far fewer jobs: sequential $jSeq (=$jOne at batch=1), batched $jBat")
  }

  test("suffixRanks: prefix-doubling matches brute-force generalized suffix sort") {
    val rnd = new scala.util.Random(11)
    val fixture = (0L until 6L).map { i =>
      (i, Seq.fill(30)(('a' + rnd.nextInt(3)).toChar).mkString)
    } :+ (6L, Seq.fill(30)(('a' + rnd.nextInt(3)).toChar).mkString.take(30)) :+
      (7L, "") // empty doc contributes no suffixes
    val dup = fixture.head._2
    val docs = (fixture :+ (8L, dup)).toDF("doc_id", "text") // exact dup doc
    val got = graft.operators.SuffixArray.suffixRanks(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val texts = (fixture :+ (8L, dup)).toMap
    val sfx = texts.toSeq.flatMap { case (d, t) =>
      (1 to t.length).map(p => (d, p.toLong, t.substring(p - 1))) }
    val rankOf = sfx.map(_._3).distinct.sorted.zipWithIndex.toMap
    val expect = sfx.map { case (d, p, s) => (d, p, rankOf(s).toLong) }.toSet
    assert(got == expect)
  }

  test("suffixRanks: empty and all-null corpora return the empty rank frame") {
    for (fixture <- Seq(
        Seq.empty[(Long, String)],
        Seq((0L, null.asInstanceOf[String]), (1L, null.asInstanceOf[String])))) {
      val df = fixture.toDF("doc_id", "text")
      val ranks = graft.operators.SuffixArray.suffixRanks(df, "text", "doc_id")
      assert(ranks.columns.toSeq == Seq("doc_id", "pos", "rank"))
      assert(ranks.count() == 0)
    }
  }

  test("repeatsAtLeast: maximal SA runs match a brute-force replica") {
    val docs = Seq(
      (0L, "aaa the common repeated segment xxx"),
      (1L, "bbb the common repeated segment yyy"),
      (2L, "ccc the common repeated segment yyy"),
      (3L, "nothing shared in this document at all"),
      (4L, "aaa the common repeated segment xxx") // exact dup of 0
    ).toDF("doc_id", "text")
    val minLen = 10; val cap = 20
    val got = graft.operators.SuffixArray.repeatsAtLeast(docs, "text", "doc_id",
        minLen, cap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force replica of the definition: sort all suffixes, capped
    // adjacent lcp, maximal runs of lcp >= minLen, min-lcp common prefix
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    val sfx = texts.flatMap { case (d, t) =>
      (1 to t.length).map(p => (d, p, t.substring(p - 1))) }
      .sortBy { case (d, p, s) => (s, d, p) }
    def lcpOf(x: String, y: String): Long =
      x.take(cap).zip(y.take(cap)).takeWhile { case (u, v) => u == v }.size.toLong
    val lcps = sfx.indices.map(i =>
      if (i == 0) 0L else lcpOf(sfx(i)._3, sfx(i - 1)._3))
    val expect = scala.collection.mutable.Set.empty[(String, Long, Long)]
    var i = 0
    while (i < sfx.length) {
      var j = i + 1
      while (j < sfx.length && lcps(j) >= minLen) j += 1
      if (j - i >= 2) {
        val replen = (i + 1 until j).map(lcps).min
        expect += ((sfx(i)._3.take(replen.toInt), replen, (j - i).toLong))
      }
      i = j
    }
    assert(got == expect.toSet)
    // sanity: the shared segment surfaces as a multi-doc repeat (capped
    // at 20 chars, so the run head reads "the common repeated ")
    assert(got.exists(r => r._1.startsWith("the common repeated") && r._3 >= 3))
  }

  test("WinnowSelect: deque pass matches brute-force rightmost-argmin windows") {
    val rnd = new scala.util.Random(7)
    def brute(h: Array[Long], w: Int): Seq[Int] = {
      val m = h.length
      val ww = math.min(m, w)
      (0 to m - ww).map { s =>
        val win = h.slice(s, s + ww)
        s + win.lastIndexOf(win.min) // 0-based, rightmost tie
      }.distinct
    }
    for (trial <- 0 until 200) {
      val m = 1 + rnd.nextInt(40)
      val w = 2 + rnd.nextInt(10)
      // small value range forces heavy ties — the tricky case
      val h = Array.fill(m)(rnd.nextInt(4).toLong)
      val got = graft.functions.WinnowSelect.positions(h, w).toSeq
      assert(got == brute(h, w), s"trial $trial: w=$w h=${h.mkString(",")}")
    }
  }

  test("WinnowSelectSpans: fused expression matches the Catalyst-HOF replica") {
    // the exact pre-fusion formulation, as columns — the semantics the
    // fused expression must reproduce bit-for-bit (and what the q142
    // DuckDB oracle mirrors)
    def hofSpans(spanLen: Int, w: Int) = {
      val spansE = filter(transform(
        sequence(lit(1), greatest(length($"norm") - (spanLen - 1), lit(1))),
        i => $"norm".substr(i, lit(spanLen))),
        g => length(g) === spanLen)
      val hashE = transform($"spans",
        s => conv(substring(md5(s), 1, 12), 16, 10).cast("long"))
      val mC = size($"h")
      val nWin = greatest(mC - (w - 1), lit(1))
      val pickAt = (i: org.apache.spark.sql.Column) => {
        val sl = slice($"h", i, lit(w))
        i + size(sl) - array_position(reverse(sl), array_min(sl)).cast("int")
      }
      val sel = array_distinct(transform(sequence(lit(1), nWin), pickAt))
      (spansE, hashE, sel)
    }
    val rnd = new scala.util.Random(13)
    val docs = ((0 until 30).map { i =>
      (i.toLong, Seq.fill(5 + rnd.nextInt(120))(
        ('a' + rnd.nextInt(3)).toChar).mkString)
    } ++ Seq((100L, "exact"), (101L, ""), (102L, "ab"),
      (103L, "añ∂é multibyte ∆ text añ∂é multibyte ∆"),
      (104L, "astral 😀🎉 chars 😀🎉 astral 😀🎉 chars"))).toDF("doc_id", "text")
    for ((spanLen, w) <- Seq((6, 4), (24, 8), (2, 2))) {
      val (spansE, hashE, sel) = hofSpans(spanLen, w)
      val expect = docs
        .select($"doc_id", graft.operators.Dedup.normalizedText($"text").as("norm"))
        .select($"doc_id", spansE.as("spans"))
        .select($"doc_id", $"spans", hashE.as("h"))
        .where(size($"spans") >= 1)
        .select($"doc_id", $"spans", sel.as("sel"))
        .select($"doc_id", explode(transform($"sel",
          p => element_at($"spans", p))).as("span"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      val got = docs
        .select($"doc_id", graft.operators.Dedup.normalizedText($"text").as("norm"))
        .select($"doc_id", explode(graft.functions.WinnowSelectSpans
          .column($"norm", spanLen, w)).as("span"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(got == expect, s"spanLen=$spanLen w=$w")
    }
  }

  test("contaminationBloom: bit-identical to the exact contamination join") {
    val bench = docs.where($"doc_id" === 2L)
    val exact = TextAnalysis.contamination(docs, bench, "text", "doc_id", n = 3)
      .orderBy("doc_id").collect().toSeq
    // the near-dup docs share 3-grams with doc 2, doc 3 shares none —
    // both sides of the equivalence must see hits AND zero-hit docs
    assert(exact.exists(_.getLong(1) > 0) && exact.exists(_.getLong(1) == 0))
    val bloomed = TextAnalysis.contaminationBloom(docs, bench, "text", "doc_id",
      n = 3).orderBy("doc_id").collect().toSeq
    assert(bloomed == exact)
  }

  test("l2TopK: exact nearest by squared L2, self excluded, quantized grid") {
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0.001f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(0f, 3f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.l2TopK(vecs.where($"vec_id" === 0), vecs,
      "vec_id", "embedding", k = 3)
      .select("rk", "neighbor_id", "d2").as[(Int, Long, Double)].collect()
      .sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(1L, 2L, 3L))
    // floor(0.001*1000)=1 → d2=1; 1000² and 3000² for the others
    assert(got.map(_._3).toSeq == Seq(1.0, 1e6, 9e6))
  }

  test("recall curve: hits non-decreasing in nProbe, exact at full probe") {
    // 8 integer-valued patterns × 3 copies; the k=8 codebook is trained
    // on the first 8 vectors = one of each pattern, so every vector
    // PQ-encodes LOSSLESSLY and ADC distance = exact distance. Then
    // nProbe=4 (all cells) must recover the exact top-3 bit-for-bit, and
    // with distances agreeing and both sides tie-breaking by neighbor id,
    // a wider probe set can never displace a true hit → hits monotone.
    val vecs = (0 until 24).map { i =>
      val p = i % 8
      (i.toLong, Array.tabulate(8)(d => ((p + 1) * (d + 3) % 11).toFloat))
    }.toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft_curve").toString
    try {
      graft.sources.AnnIndex.saveIvfPq(vecs, "vec_id", "embedding", idx,
        dims = 8, m = 4, k = 8, nList = 4)
      val loaded = graft.sources.AnnIndex.loadIvfPq(spark, idx)
      val queries = vecs.where($"vec_id" < 4)
      val exact = Similarity.l2TopK(queries, vecs, "vec_id", "embedding", k = 3)
      val byProbe = Seq(1, 2, 4).map { p =>
        p -> Similarity.annRecallAtK(
            loaded.search(queries, "embedding", topK = 3, nProbe = p),
            exact, k = 3)
          .agg(sum($"hits"), sum($"possible")).as[(Long, Long)].head()
      }
      val hits = byProbe.map(_._2._1)
      assert(hits == hits.sorted, s"recall must not decrease with nProbe: $byProbe")
      assert(byProbe.last._2._1 == byProbe.last._2._2,
        s"full probe must recover exact top-3: $byProbe")
    } finally graft.sources.BucketFs.deleteRecursive(idx)
  }

  test("rrfFuse: consensus candidates outrank single-system ones; ties by id") {
    val r1 = Seq((0L, 1, 10L), (0L, 2, 20L)).toDF("query_id", "rk", "neighbor_id")
    val r2 = Seq((0L, 1, 20L), (0L, 2, 30L)).toDF("query_id", "rk", "neighbor_id")
    val got = graft.operators.Similarity.rrfFuse(Seq(r1, r2), k0 = 60, topK = 3)
      .orderBy("rk").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // 20 appears in both (1/62 + 1/61) and must beat 10 (1/61) and 30 (1/62)
    assert(got.map(_._2).toSeq == Seq(20L, 10L, 30L))
    assert(math.abs(got(0)._3 - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(got(1)._3 == 1.0 / 61 && got(2)._3 == 1.0 / 62)
  }

  test("contentDefinedChunks: lengths reassemble; an edit only disturbs its own chunk") {
    val rnd = new scala.util.Random(17)
    val body = Seq.fill(300)(('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, body), (2L, "PREFIX EDIT " + body)).toDF("doc_id", "text")
    val got = graft.operators.Dedup.contentDefinedChunks(docs, "text", "doc_id",
      window = 16, zeroNibbles = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val byDoc = got.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // chunk lengths tile the normalized doc exactly
    assert(byDoc(1L).map(_._3).sum == body.length.toLong)
    assert(byDoc(2L).map(_._3).sum == body.length.toLong + 12L)
    // content-defined boundaries: once past the edit, doc 2 re-synchronizes
    // onto doc 1's chunk stream — the SHARED chunk hashes are what a
    // storage dedup would coalesce
    val h1 = byDoc(1L).map(_._4).toSet
    val shared = byDoc(2L).map(_._4).count(h1.contains)
    assert(shared >= byDoc(1L).size - 1,
      s"edit must only disturb the leading chunk(s): shared=$shared of ${byDoc(1L).size}")
  }

  test("simHashPairs: recall-complete vs brute force at maxHamming <= bands-1") {
    val rnd = new scala.util.Random(31)
    val pool = Vector("spark", "table", "query", "scan", "merge", "batch",
      "row", "fast", "slow", "key")
    val docs = (0L until 60L).map(i =>
      (i, Seq.fill(12)(pool(rnd.nextInt(pool.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.simHashPairs(docs, "text", "doc_id",
      maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same simhashes
    val hashes = graft.operators.Dedup.simHash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == brute, "banding must find EXACTLY the brute-force <=3 set")
    assert(brute.nonEmpty, "fixture must actually contain close pairs")
  }

  test("simHashPairs: capped pairs are a subset of uncapped and still pair exact dups") {
    // 3 exact-dup families x 30 docs: every (band, chunk) bucket is one
    // family, so cap=8 forces the chain branch on all of them
    val docs = (0L until 90L).map(i =>
      (i, s"family ${i % 3} body text shared by the whole family"))
      .toDF("doc_id", "text")
    val uncapped = graft.operators.Dedup.simHashPairs(docs, "text", "doc_id",
      maxHamming = 3, bands = 4, maxBucketSize = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = graft.operators.Dedup.simHashPairs(docs, "text", "doc_id",
      maxHamming = 3, bands = 4, maxBucketSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped), "cap must only DROP candidates")
    assert(capped.nonEmpty, "chained branch must still emit close pairs")
    // chain connectivity: within one family every doc pairs with its
    // id-order neighbor, so transitive closure still recovers the family
    val fam0 = (0L until 90L by 3L).toSeq
    val adj = fam0.sliding(2).map { case Seq(a, b) => (a, b) }.toSet
    assert(adj.subsetOf(capped), "id-order neighbor chain must survive the cap")
  }

  test("bpeEncodeCounts: doc-level replaces equal per-word application") {
    val corpus = Seq((1L, "aab aab ab"), (2L, "aab ab")).toDF("doc_id", "text")
    // 2 merges: (a,b)->ab then (ab,</w>)->ab</w>
    // "aab" -> [a, ab</w>] (2), "ab" -> [ab</w>] (1)
    val m2 = graft.operators.TextAnalysis.bpeTrain(corpus, "text", merges = 2)
    val got2 = graft.operators.TextAnalysis
      .bpeEncodeCounts(corpus, "doc_id", "text", m2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got2(1L) == (3L, 5L) && got2(2L) == (2L, 3L))
    // 3rd merge (a,ab</w>) fuses every word to one symbol
    val m3 = graft.operators.TextAnalysis.bpeTrain(corpus, "text", merges = 3)
    val got3 = graft.operators.TextAnalysis
      .bpeEncodeCounts(corpus, "doc_id", "text", m3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got3(1L) == (3L, 3L) && got3(2L) == (2L, 2L),
      "fully fused: one BPE token per word, boundaries intact")
  }

  test("semDedup: lower-id near-dup survives, duplicates drop, cap-equivalence") {
    val rnd = new scala.util.Random(9)
    // 4 well-separated base directions; ids 100+ are exact copies of the
    // base vector with tiny jitter (cosine ~1), others are distinct
    val base = Array.fill(4)(Array.fill(8)(rnd.nextFloat() * 2f - 1f))
    val rows = (0 until 4).map(i => (i.toLong, base(i))) ++
      (0 until 4).map(i => (100L + i, base(i).map(x => x + 0.001f)))
    val df = rows.toDF("id", "vec")
    val got = graft.operators.Similarity.semDedup(df, "id", "vec",
      k = 4, iters = 2, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    (0 until 4).foreach { i =>
      assert(got(i.toLong), s"base $i must be kept (lowest id in its family)")
      assert(!got(100L + i), s"copy ${100 + i} must be dropped")
    }
    // cap smaller than every cluster forces the chain branch; with
    // exactly 2 rows per cluster the chain sees the same single pair, so
    // results must be identical
    val capped = graft.operators.Similarity.semDedup(df, "id", "vec",
      k = 4, iters = 2, threshold = 0.95, maxClusterSize = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(capped == got, "2-row clusters: chain == all-pairs")
  }

  test("pqRerankTopK: exact ordering on the shortlist; full-width shortlist == brute force") {
    val rnd = new scala.util.Random(5)
    val emb = (0L until 64L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f))).toDF("id", "vec")
    val qs = emb.where($"id" < 2)
    val rr = graft.operators.Similarity.pqRerankTopK(qs, emb, "id", "vec",
      dims = 16, m = 4, k = 8, candK = 63, topK = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // candK = corpus-1 means the shortlist is everything: result must be
    // the true exact top-3 (cross-check against brute-force squared L2
    // on the same quantized grid)
    val vecs = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(x => math.floor(x * 1000.0)).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (q <- Seq(0L, 1L)) {
      val truth = vecs.keys.filter(_ != q).toSeq
        .map(c => (c, d2(vecs(q), vecs(c))))
        .sortBy { case (c, d) => (d, c) }.take(3)
      val got = rr.filter(_._1 == q).sortBy(_._2).map(t => (t._3, t._4))
      assert(got.map(_._1).toSeq == truth.map(_._1),
        s"query $q: rerank != brute force")
      got.zip(truth).foreach { case ((_, gd), (_, td)) =>
        assert(math.abs(gd - td) < 1e-6, s"query $q distance mismatch") }
    }
  }
}
