package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup-stack smoke at training-pipeline scale: a 500k-doc corpus built
  * from 50 templates — every LSH bucket holds ~10k near-identical docs,
  * the exact degenerate shape that makes an uncapped pipeline quadratic
  * (50 buckets × 10k² /2 ≈ 2.5e9 candidate pairs). With the bucket cap the
  * candidate count must stay O(bands × n) and connected components must
  * still collapse each template family into one cluster.
  */
object PipelineScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = graft.core.GraftSession.builder("32", "64").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pscale] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // 50 template families with DISJOINT shingle sets (md5-derived bodies),
    // each duplicated n/50 times — exact mass duplication, no cross-family
    // similarity, so LSH must produce exactly 50 clusters
    val tid = $"id" % 50
    val docs = spark.range(n).select($"id".as("doc_id"),
      concat_ws(" ", md5(tid.cast("string")),
        md5((tid + 1000).cast("string")),
        md5((tid + 2000).cast("string")),
        md5((tid + 3000).cast("string"))).as("text"))

    // materialize the pair pipeline ONCE so the CC phase times CC alone
    val pairs = Dedup.lshCandidatePairs(docs, "text", "doc_id",
      shingleK = 8, numHashes = 8, bands = 4).localCheckpoint(false)
    val nPairs = t(s"capped LSH pairs ($n docs)") { pairs.count() }
    println(s"[pscale] candidate pairs: $nPairs")
    val bound = 4L * n
    require(nPairs <= bound,
      s"cap failed: $nPairs pairs exceeds O(bands*n) bound $bound")

    val nClusters = t("connected components") {
      Dedup.connectedComponents(pairs, driverEdgeLimit = 4000000)
        .agg(countDistinct($"cluster_id")).head().getLong(0)
    }
    println(s"[pscale] clusters: $nClusters (expect 50 template families)")
    require(nClusters == 50, s"expected 50 clusters, got $nClusters")

    // ---- line-level dedup at the same scale: every doc shares one of 50
    // boilerplate headers (the C4 shape); each header must survive exactly
    // once and every unique body line must survive everywhere
    val lined = docs.select($"doc_id",
      concat_ws("\n", concat(lit("header "), md5(($"doc_id" % 50).cast("string"))),
        concat(lit("body "), md5($"doc_id".cast("string")))).as("text"))
    val cleaned = t(s"line dedup ($n docs)") {
      Dedup.dedupLines(lined, "text", "doc_id")
        .agg(sum($"n_lines_kept"), sum($"n_lines")).head()
    }
    val (kept, totalLines) = (cleaned.getLong(0), cleaned.getLong(1))
    require(totalLines == 2L * n && kept == n + 50,
      s"line dedup: kept $kept of $totalLines (expect ${n + 50} of ${2L * n})")

    // ---- KMV distinct sketch over 20M values in 200 groups: bounded
    // buffers, merge across 64 partitions, estimate within 3 standard
    // errors of truth (k=256 → se ≈ 6.3%)
    val sketchN = 20000000L
    val est = t(s"kmv sketch ($sketchN values)") {
      graft.operators.Sketches.distinctEstimate(
        spark.range(sketchN).select(($"id" % 200).as("g"),
          ($"id" % lit(sketchN / 2)).as("v")),
        "g", "v", k = 256).agg(sum($"est_distinct")).head().getLong(0)
    }
    val truth = sketchN / 2 // each v appears twice
    require(math.abs(est - truth).toDouble / truth < 0.05,
      s"kmv estimate $est vs truth $truth out of tolerance")
    println(s"[pscale] kmv distinct estimate: $est (truth $truth)")

    // ---- collected k-means over 500k × 64-dim vectors, 3 rounds: corpus
    // is never shuffled (assignment is map-only); must recover the 8
    // well-separated synthetic centers
    val dim = 64
    val kVecs = docs.select($"doc_id".as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (($"doc_id" % 8) * 10).cast("float") +
          (pmod(xxhash64($"doc_id" * lit(dim) + i), lit(100)) / lit(1000.0)).cast("float"))
        .as("embedding"))
    val (asgn, cents) = graft.operators.Similarity.kmeansFitCollected(
      kVecs, "vec_id", "embedding", k = 8, iters = 3)
    val nK = t(s"collected kmeans ($n vecs)") {
      asgn.select($"vec_id" % 8, $"centroid_id").distinct().count()
    }
    require(nK == 8 && cents.length == 8,
      s"kmeans: expected a 1:1 family-to-cluster map (8), got $nK")
    println(s"[pscale] kmeans clusters stable: $nK families -> ${cents.length} centroids")

    // ---- PQ encode + ADC search over the same 500k × 64-dim corpus: the
    // vectors form 8 tight families, so every vector's top ADC neighbors
    // must come from its own family (codes separate the families even at
    // 64x compression). Encode is broadcast-join + hash-agg only.
    val pqCodes = graft.operators.Similarity.pqEncode(
      kVecs, "vec_id", "embedding", dims = dim, m = 4, k = 16)
    val nCodeRows = t(s"pq encode ($n vecs)") { pqCodes.count() }
    require(nCodeRows == n, s"pq encode: $nCodeRows of $n vectors coded")
    val adc = graft.operators.Similarity.pqAdcTopK(
      kVecs.where($"vec_id" < 8), kVecs, "vec_id", "embedding",
      dims = dim, m = 4, k = 16, topK = 5)
    val crossFamily = t("pq adc top-5 (8 queries)") {
      adc.where($"neighbor_id" % 8 =!= $"query_id" % 8).count()
    }
    require(crossFamily == 0,
      s"pq adc: $crossFamily cross-family neighbors in top-5")
    println(s"[pscale] pq adc: all top-5 neighbors in-family at $n vecs")

    // ---- combined IVF-PQ (residual, nProbe=2) over the same corpus: the
    // cell-probed search must also stay in-family end to end
    val ivfCross = t("ivf-pq residual top-5 (8 queries)") {
      graft.operators.Similarity.ivfPqTopK(
          kVecs.where($"vec_id" < 8), kVecs, "vec_id", "embedding",
          dims = dim, m = 4, k = 16, nList = 8, topK = 5, nProbe = 2,
          residual = true)
        .where($"neighbor_id" % 8 =!= $"query_id" % 8).count()
    }
    require(ivfCross == 0,
      s"ivf-pq: $ivfCross cross-family neighbors in top-5")
    println(s"[pscale] ivf-pq residual: all top-5 neighbors in-family at $n vecs")

    // ---- persisted-index lifecycle at the same scale: save the 500k-vec
    // IVF-PQ index (codes cell-partitioned), reload, search with the
    // probe-cell partition filter — results must stay in-family, and the
    // codes directory must actually be cell-partitioned
    val idxDir = java.nio.file.Files.createTempDirectory("pscale_idx").toString
    try {
      t(s"ann index save ($n vecs)") {
        graft.sources.AnnIndex.saveIvfPq(kVecs, "vec_id", "embedding",
          idxDir, dims = dim, m = 4, k = 16, nList = 8)
      }
      val idx = graft.sources.AnnIndex.loadIvfPq(spark, idxDir)
      val idxCross = t("ann index search (8 queries)") {
        idx.search(kVecs.where($"vec_id" < 8), "embedding", topK = 5)
          .where($"neighbor_id" % 8 =!= $"query_id" % 8).count()
      }
      require(idxCross == 0,
        s"ann index: $idxCross cross-family neighbors in top-5")
      val cellDirs = new java.io.File(s"$idxDir/codes/gen=0").listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("cell="))
      require(cellDirs == 8, s"expected 8 cell dirs, got $cellDirs")
      println(s"[pscale] ann index: persisted search in-family, $cellDirs cell dirs")

      // ---- index delete at the same scale: tombstone 1000 ids spread
      // over every family; only the affected cells rewrite and the ids
      // are really gone
      val tombstones = (8L until 8008L by 8L).toSeq
      val afterDelete = t(s"ann index delete (${tombstones.size} ids)") {
        idx.delete(tombstones).codes.count()
      }
      require(afterDelete == n - tombstones.size,
        s"delete: $afterDelete codes remain, expected ${n - tombstones.size}")
      println(s"[pscale] ann index delete: ${tombstones.size} tombstones applied")
    } finally graft.sources.BucketFs.deleteRecursive(idxDir)

    // ---- heavy hitters over 20M tokens from a 10k-type zipf-ish stream:
    // bounded counters (capacity 512), merge across partitions; every
    // item with true count > N/512 must surface and estimates must
    // respect count - err <= true <= count (checked on the known top-20)
    val hhN = 20000000L
    val hh = t(s"heavy hitters ($hhN tokens)") {
      graft.operators.Sketches.heavyHitters(
        spark.range(hhN).select(
          concat(lit("tok"), (pmod(xxhash64($"id"), lit(10000)) % (pmod($"id", lit(200)) + 1)).cast("string"))
            .as("item")),
        "item", capacity = 512, minCount = 1L)
        .limit(30).collect()
    }
    require(hh.length >= 20, s"heavy hitters: only ${hh.length} entries")
    require(hh.forall(r => r.getLong(1) >= r.getLong(2)),
      "heavy hitters: count < err on a reported item")
    println(s"[pscale] heavy hitters: top '${hh.head.getString(0)}' " +
      s"count ${hh.head.getLong(1)} err ${hh.head.getLong(2)}")

    // ---- char-LM scoring at 500k docs: model trains on the corpus
    // itself (charset-bounded broadcast), scoring is map-side; every doc
    // must come back scored
    val lmScored = t(s"char-LM score ($n docs)") {
      val m3 = graft.operators.TextAnalysis.charLmCounts(docs, "text", 3)
      val m2 = graft.operators.TextAnalysis.charLmCounts(docs, "text", 2)
      graft.operators.TextAnalysis.charLmScore(docs, "doc_id", "text", m3, m2)
        .count()
    }
    require(lmScored == n, s"char-LM: scored $lmScored of $n docs")
    println(s"[pscale] char-LM: $lmScored docs scored")

    // ---- weighted Bernoulli sampling at 500k rows: integer-exact
    // predicate, inclusion rate tracks the weight-derived probability
    val wKept = t(s"weighted sample ($n docs)") {
      docs.where(graft.operators.Sampling.weightedKeep(
        $"doc_id", lit(25L), num = 1L, denom = 100L)).count()
    }
    require(math.abs(wKept - n / 4.0) / (n / 4.0) < 0.02,
      s"weighted sample: kept $wKept, expected ~${n / 4}")
    println(s"[pscale] weighted sample: $wKept kept (~25%)")

    // ---- quantile sketch at 500k rows / 50 groups: k=256 sampling
    // regime, the min-k merge must stay partition-invariant at scale
    val qs = t(s"quantile sketch ($n rows)") {
      graft.operators.Sketches.groupQuantiles(
        docs.select($"doc_id", (($"doc_id" % 50).cast("string")).as("g"),
          ($"doc_id" % 1000).cast("double").as("v")),
        "g", "doc_id", "v", qs = Seq(0.5), k = 256)
        .collect()
    }
    require(qs.length == 50, s"quantile sketch: ${qs.length} groups")
    require(qs.forall(r => math.abs(r.getDouble(1) - 500.0) < 120.0),
      "quantile sketch: a median strayed far from 500")
    println(s"[pscale] quantile sketch: 50 medians within sampling error")

    // ---- BPE training at 500k docs: the word-frequency pass is the only
    // corpus-sized job; 8 merge iterations then run on the (tiny) vocab
    val bpe = t(s"bpe train ($n docs, 8 merges)") {
      graft.operators.TextAnalysis.bpeTrain(docs, "text", merges = 8).collect()
    }
    require(bpe.length == 8, s"bpe: learned ${bpe.length} merges")
    println(s"[pscale] bpe: first merge '${bpe.head.getString(1)}'+'${bpe.head.getString(2)}' n=${bpe.head.getLong(4)}")

    // ---- SimHash banded pairs on the 50-template corpus: every bucket
    // is a ~10k-doc degenerate pile, so the >cap chain branch carries the
    // whole load — candidate count must stay O(bands x n), not O(n^2)
    val shPairs = t(s"simhash pairs ($n docs, capped)") {
      Dedup.simHashPairs(docs, "text", "doc_id", maxHamming = 3, bands = 4,
        maxBucketSize = 1024).count()
    }
    require(shPairs < 8L * n, s"simhash pairs exploded: $shPairs")
    require(shPairs > 0L, "simhash pairs: exact dups must pair")
    println(s"[pscale] simhash pairs: $shPairs candidates (chain-capped)")

    // ---- content-defined chunking at 500k docs: in-row, ~1 md5/char;
    // identical docs must produce identical chunk streams
    val cdc = t(s"cdc chunks ($n docs)") {
      graft.operators.Dedup.contentDefinedChunks(docs, "text", "doc_id",
        window = 16, zeroNibbles = 1)
        .agg(count(lit(1)), countDistinct(col("chunk_hash"))).head()
    }
    require(cdc.getLong(1) <= 50L * 20,
      s"cdc: ${cdc.getLong(1)} distinct hashes from 50 templates")
    println(s"[pscale] cdc: ${cdc.getLong(0)} chunks, ${cdc.getLong(1)} distinct (50 templates)")

    // ---- winnow-sampled span coverage at 500k docs: every doc is one of
    // 50 templates, so every SELECTED window is duplicated ~10k-fold —
    // sampled coverage must be 100% dup, and the shuffle carries ~2/(w+1)
    // of the char positions instead of all of them (q126's full cost)
    val wsp = t(s"winnowed spans ($n docs)") {
      Dedup.winnowedSpanStats(docs, "text", "doc_id",
          spanLen = 24, w = 8, minDocs = 2)
        .agg(sum($"n_windows_sampled"), sum($"n_dup_windows_sampled"),
          count(lit(1))).head()
    }
    require(wsp.getLong(2) == n, s"winnowed spans covered ${wsp.getLong(2)} docs")
    require(wsp.getLong(0) == wsp.getLong(1),
      s"template corpus must be fully duplicated at the sampled windows: " +
        s"${wsp.getLong(1)} of ${wsp.getLong(0)}")
    // density: a 4-hash body (~131 chars, ~108 windows) winnows to ~2/(w+1)
    // of positions; assert the sample stays an order of magnitude under full
    require(wsp.getLong(0) < n * 40,
      s"winnow sample too dense: ${wsp.getLong(0)} windows for $n docs")
    println(s"[pscale] winnowed spans: ${wsp.getLong(0)} sampled windows, all dup")

    // ---- persisted dedup index at 500k docs: archive alternating 50-id
    // blocks, query the others. NOT an id-parity split: family = id % 50
    // with an even modulus makes family membership parity-pure, so
    // even-vs-odd leaves the query batch with ZERO archived twins (the
    // fixture bug that kept this assertion red from the day it landed).
    // Block-alternating, every family has ~n/100 archived twins per query
    // doc — candidates must stay capped via bucket representatives,
    // never bucket-quadratic
    val dedupIdxDir = java.nio.file.Files.createTempDirectory("pscale_dedupidx").toString
    try {
      val archived = ($"doc_id" % 100) < 50
      t(s"dedup index build (${n / 2} docs)") {
        graft.sources.DedupIndex.save(docs.where(archived),
          "text", "doc_id", dedupIdxDir, shingleK = 8, numHashes = 8, bands = 4)
      }
      val cand = t(s"dedup index query (${n / 2} new)") {
        graft.sources.DedupIndex.load(spark, dedupIdxDir)
          .candidates(docs.where(!archived), "text",
            maxBucketSize = 1024)
          .agg(count(lit(1)), countDistinct($"new_id")).head()
      }
      require(cand.getLong(1) == n / 2,
        s"every new doc must find its family: ${cand.getLong(1)} of ${n / 2}")
      require(cand.getLong(0) <= 4L * n,
        s"capped index candidates exploded: ${cand.getLong(0)}")
      println(s"[pscale] dedup index: ${cand.getLong(0)} candidates, " +
        s"all ${cand.getLong(1)} new docs matched")
    } finally graft.sources.BucketFs.deleteRecursive(dedupIdxDir)

    // ---- DSIR importance weights at 500k docs: target = families 0-9.
    // Family vocabularies are disjoint, so every target-family doc must
    // outscore every non-target doc (weights broadcast; corpus never
    // shuffles). Scores are per-family constants — compare the 50.
    val dsirOk = t(s"dsir score ($n docs)") {
      val w = graft.operators.TextAnalysis.dsirBucketWeights(
        docs, docs.where($"doc_id" % 50 < 10), "text", buckets = 4096)
      val famScores = graft.operators.TextAnalysis
        .dsirScore(docs, "doc_id", "text", w)
        .select(($"doc_id" % 50).as("fam"), $"logratio_q4").distinct()
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      (famScores.length,
        famScores.filter(_._1 < 10).map(_._2).min,
        famScores.filter(_._1 >= 10).map(_._2).max)
    }
    require(dsirOk._1 == 50, s"dsir: ${dsirOk._1} family scores, expect 50")
    require(dsirOk._2 > dsirOk._3,
      s"dsir: target families must outscore raw (min target ${dsirOk._2} " +
        s"<= max other ${dsirOk._3})")
    println(s"[pscale] dsir: 50 family scores, target min ${dsirOk._2} > other max ${dsirOk._3}")

    // ---- Naive Bayes classifier at 500k docs: train on the ~50% hash
    // split (label = family < 25), score everything — disjoint family
    // vocabularies make the classifier exact, so accuracy must be 100%
    val nbWrong = t(s"naive bayes train+score ($n docs)") {
      val labeled = docs
        .where(graft.operators.Sampling.hashBucket($"doc_id") < 50)
        .withColumn("__hq", $"doc_id" % 50 < 25)
      val m = graft.operators.TextAnalysis.naiveBayesTrain(labeled, "text", "__hq")
      graft.operators.TextAnalysis.naiveBayesScore(docs, "doc_id", "text", m)
        .where($"pred_pos" =!= ($"doc_id" % 50 < 25)).count()
    }
    require(nbWrong == 0, s"naive bayes: $nbWrong of $n misclassified")
    println(s"[pscale] naive bayes: $n docs scored, 0 misclassified")

    // ---- JSONL ingest at 500k lines (~100 MB): to_json stage with the
    // 1-in-25 md5 truncation rule, from_json parse back — valid+corrupt
    // must partition the corpus exactly
    val jsonlDir = java.nio.file.Files.createTempDirectory("pscale_jsonl").toString
    try {
      val line = to_json(struct($"doc_id", $"text"))
      val corruptExpected = docs
        .where(graft.operators.Sampling.hashBucket($"doc_id", 25) === 0).count()
      docs.select(
          when(graft.operators.Sampling.hashBucket($"doc_id", 25) === 0,
            line.substr(lit(1), length(line) - 5)).otherwise(line).as("value"))
        .write.mode("overwrite").text(jsonlDir)
      val (nValid, nCorrupt) = t(s"jsonl parse ($n lines)") {
        val schema = new org.apache.spark.sql.types.StructType()
          .add("doc_id", org.apache.spark.sql.types.LongType)
          .add("text", org.apache.spark.sql.types.StringType)
        val parsed = graft.sources.Jsonl.read(spark, jsonlDir, schema)
          .localCheckpoint(false)
        (graft.sources.Jsonl.valid(parsed).count(),
          graft.sources.Jsonl.corrupt(parsed).count())
      }
      require(nValid + nCorrupt == n && nCorrupt == corruptExpected,
        s"jsonl: $nValid valid + $nCorrupt corrupt != $n ($corruptExpected expected corrupt)")
      println(s"[pscale] jsonl: $nValid valid, $nCorrupt quarantined")
    } finally graft.sources.BucketFs.deleteRecursive(jsonlDir)

    // ---- cluster-balanced resample over the kmeans assignment: 8 equal
    // clusters -> equal sqrt budgets, exactly 1000/8 kept per cluster
    val cbCounts = t(s"cluster-balanced sample ($n vecs)") {
      graft.operators.Sampling.clusterBalancedSample(asgn, "vec_id",
          "centroid_id", totalBudget = 1000)
        .groupBy($"centroid_id").agg(count(lit(1)).as("kept"))
        .collect().map(_.getLong(1))
    }
    require(cbCounts.length == 8 && cbCounts.forall(_ == 125L),
      s"cluster-balanced: kept ${cbCounts.mkString(",")}, expect 8 x 125")
    println(s"[pscale] cluster-balanced: 8 clusters x 125 kept")
    spark.stop()
  }
}
