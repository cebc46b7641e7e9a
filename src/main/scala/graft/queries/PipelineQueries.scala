package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Avi, Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators on the documents/embeddings tables,
  * hash-checked against DuckDB transcriptions (md5 is identical across
  * engines; set sizes and fixed-point integers avoid float drift; cosine
  * uses a fixed sequential fold mirrored by list_inner_product).
  */
object PipelineQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup groups via content hash.
    "q30_dedup_exact" -> ((s, dir) => {
      Dedup.exactDuplicateGroups(Tables(s, dir, "documents"), "text", "doc_id")
    }),

    // MinHash signatures (first 4 of 8 hash fns exposed for the check).
    "q31_minhash_sig" -> ((s, dir) => {
      import s.implicits._
      Dedup.minHashSignature(Tables(s, dir, "documents"), "text", "doc_id",
          shingleK = 8, numHashes = 4)
        .select($"doc_id", $"mh0", $"mh1", $"mh2", $"mh3")
    }),

    // LSH candidate pairs (banded minhash, 8 hashes × 4 bands). The gated
    // queries disable the bucket-size cap explicitly: the DuckDB oracle is
    // uncapped all-pairs, and the semantics must agree at EVERY scale, not
    // just ones whose buckets happen to fit the default cap.
    "q32_minhash_lsh_pairs" -> ((s, dir) => {
      Dedup.lshCandidatePairs(Tables(s, dir, "documents"), "text", "doc_id",
        shingleK = 8, numHashes = 8, bands = 4, maxBucketSize = Int.MaxValue)
    }),

    // 32-plane portable SimHash per document.
    "q33_simhash" -> ((s, dir) => {
      Dedup.simHash(Tables(s, dir, "documents"), "text", "doc_id")
    }),

    // n-gram Jaccard set sizes over same-source candidate pairs.
    "q34_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val bySource = docs.select($"source".as("src"), $"doc_id")
      val pairs = bySource.toDF("src", "a")
        .join(bySource.toDF("src", "b"), Seq("src"))
        .where($"a" < $"b" && ($"b" - $"a") <= 40) // bound candidates (same-source ids are 20 apart)
        .select("a", "b")
      Dedup.ngramJaccardCounts(docs, pairs, "text", "doc_id", shingleK = 3)
    }),

    // EXACT set-similarity self-join by prefix filtering (PPJoin-style):
    // all pairs at 6-shingle-set Jaccard ≥ 1/2, candidates generated
    // ONLY from each doc's rarest-shingle prefix (inverted-index join
    // that never touches hot elements — the skew-proof exact alternative
    // to LSH's probabilistic recall). Shingles, not word tokens: this
    // corpus's 31-word vocabulary makes every doc word-similar to every
    // other (8.9M qualifying pairs at sf0.1), while shingle sets encode
    // order and keep the true answer sparse. Integer threshold test.
    // Gated on the doc_id %3 slice: this synthetic corpus is
    // adversarially homogeneous (31-word vocabulary — prefix filtering
    // can only prune what rarity structure exists), so the full-corpus
    // exact join is quadratic-ish by the data's nature; LSH (q31/q32)
    // is the documented scale path for such corpora.
    "q192_prefix_filter_join" -> ((s, dir) => {
      import s.implicits._
      Dedup.prefixFilterPairs(
        Tables(s, dir, "documents").where($"doc_id" % 3 === 0),
        "text", "doc_id", tNum = 1, tDen = 2, shingleK = 6)
    }),

    // Two-corpus exact similarity join (the DECONTAMINATION shape): the
    // doc_id % 5 == 0 "eval set" against the rest of the corpus, all
    // cross pairs at Jaccard >= 1/2 — prefix filtering under a union-df
    // global token order, codegen'd merge-intersect verify.
    "q207_prefix_join_rs" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      Dedup.prefixFilterJoin(
        docs.where($"doc_id" % 5 === 0),
        docs.where($"doc_id" % 5 =!= 0),
        "text", "doc_id", tNum = 1, tDen = 2, shingleK = 6)
    }),

    // q207's R-S join in its BOUNDED production mode: topKPerLeft caps
    // the output at k best matches per left doc (highest Jaccard, ties
    // by smallest right id) with the total match count reported loudly
    // in n_matches. On this fixture the cap (8) never binds — the true
    // per-left maximum is 2 — so the capped rows must equal the exact
    // uncapped answer bit-for-bit; the binding case's truncation shape
    // is spec'd in PrefixFilterSpec. Gated on a smaller two-slice corpus
    // than q207 (doc_id % 7 ∈ {0, 1}) so the board carries the capped
    // plan without duplicating q207's full cost.
    "q214_prefix_join_capped" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      Dedup.prefixFilterJoin(
        docs.where($"doc_id" % 7 === 0),
        docs.where($"doc_id" % 7 === 1),
        "text", "doc_id", tNum = 1, tDen = 2, shingleK = 6,
        topKPerLeft = 8)
        .select("a", "b", "intersection", "n_a", "n_b", "n_matches")
    }),

    // Shingle containment over the q34 candidate pairs: the asymmetric
    // subset-duplication measure (|S(a)∩S(b)| / |S(a)|) that symmetric
    // Jaccard dilutes — finds quotes / partial copies. DISTINCT shingle
    // sets stay in-row; only the bounded candidate pairs shuffle.
    "q187_containment" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val bySource = docs.select($"source".as("src"), $"doc_id")
      val pairs = bySource.toDF("src", "a")
        .join(bySource.toDF("src", "b"), Seq("src"))
        .where($"a" < $"b" && ($"b" - $"a") <= 40)
        .select("a", "b")
      Dedup.containmentCounts(docs, pairs, "text", "doc_id", shingleK = 3)
    }),

    // Content-defined chunking: windowed-hash boundaries (expected chunk
    // 256 chars), chunk hashes for storage-level dedup. Entirely in-row.
    "q135_cdc_chunks" -> ((s, dir) =>
      Dedup.contentDefinedChunks(Tables(s, dir, "documents"), "text",
        "doc_id", window = 16, zeroNibbles = 2)),

    // SimHash hamming near-dup pairs (Manku et al.): 8-bit chunk banding
    // makes the <=3-bit pair set recall-complete without an all-pairs
    // scan; bit_count(xor) verifies in-bucket survivors.
    "q134_simhash_pairs" -> ((s, dir) =>
      Dedup.simHashPairs(Tables(s, dir, "documents"), "text", "doc_id",
        maxHamming = 3, bands = 4)),

    // Edit-distance verification of the q34 candidate pairs: Levenshtein
    // on normalized text, exact integers, row-local after id joins.
    "q133_edit_distance" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val bySource = docs.select($"source".as("src"), $"doc_id")
      val pairs = bySource.toDF("src", "a")
        .join(bySource.toDF("src", "b"), Seq("src"))
        .where($"a" < $"b" && ($"b" - $"a") <= 40)
        .select("a", "b")
      Dedup.editDistancePairs(docs, pairs, "text", "doc_id")
    }),

    // Brute-force cosine top-3 neighbors for the first 24 vectors.
    "q35_cosine_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.where($"vec_id" < 24)
      Similarity.cosineTopK(queries, emb, "vec_id", "embedding", k = 3)
        .select($"query_id", $"rk", $"neighbor_id")
    }),

    // Unicode NFC normalization (codegen'd Catalyst expression over the
    // JDK Normalizer): decomposed combining sequences — appended here as
    // a deterministic suffix, since the corpus is ASCII — must compose
    // to their canonical forms, or dedup keys and n-gram stats fragment
    // by input source. The oracle is DuckDB's own nfc_normalize.
    "q172_unicode_nfc" -> ((s, dir) => {
      import s.implicits._
      // DECOMPOSED combining sequences (explicit escapes, no literal
      // precomposed chars): e+U+0301 composes to \u00e9, A+U+030A to \u00c5
      val suffix = " cafe\u0301 A\u030A"
      val t = concat(coalesce($"text", lit("")), lit(suffix))
      Tables(s, dir, "documents").select(
        $"doc_id",
        graft.functions.NfcNormalize.column(t).as("nfc_text"),
        (graft.functions.NfcNormalize.column(t) =!= t).as("changed"),
        length(t).cast("long").as("n_chars_raw"),
        length(graft.functions.NfcNormalize.column(t)).cast("long")
          .as("n_chars_nfc"))
    }),

    // Feature hashing (signed hashing trick): vocabulary-free doc → 32-dim
    // signed count vector, exact integers under the md5 convention — one
    // explode + one hash aggregation, no fitted dictionary, no join.
    "q165_feature_hashing" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.hashedFeatures(Tables(s, dir, "documents"),
          "text", "doc_id", dim = 32)
        .select($"doc_id", $"j", $"val")
    }),

    // End-to-end LEXICAL similarity without embeddings: hashed feature
    // vectors (q165) densified in-row and fed to brute cosine top-k —
    // the text half of the composition q159/q165 enable. Zero-norm
    // vectors (sign-cancelled docs) are excluded on both sides.
    "q169_hashed_cosine" -> ((s, dir) => {
      import s.implicits._
      val hv = TextAnalysis.hashedFeatures(Tables(s, dir, "documents"),
        "text", "doc_id", dim = 32)
      val vecs = hv.groupBy($"doc_id")
        .agg(map_from_arrays(collect_list($"j"), collect_list($"val"))
          .as("__m"))
        .select($"doc_id", transform(sequence(lit(0), lit(31)),
          j => coalesce(element_at($"__m", j.cast("long")), lit(0L))
            .cast("double")).as("__v"))
        .where(aggregate($"__v", lit(0d), (a, x) => a + x * x) > 0)
        .localCheckpoint(true) // feeds query AND corpus side: hash once
      Similarity.cosineTopK(vecs.where($"doc_id" < 16), vecs,
          "doc_id", "__v", k = 3)
        .select($"query_id", $"rk", $"neighbor_id")
    }),

    // Johnson-Lindenstrauss ±1 random projection 64 → 16: the sign matrix
    // is a deterministic md5-parity literal and vectors are grid-quantized
    // first, so every output coordinate is an exact integer — row-local
    // arithmetic, zero shuffle, reproducible on any engine.
    "q159_random_projection" -> ((s, dir) => {
      import s.implicits._
      Similarity.randomProjection(Tables(s, dir, "embeddings"),
          "vec_id", "embedding", inDim = 64, outDim = 16)
        .select($"vec_id", $"j".cast("int").as("j"), $"val")
    }),

    // LSH bucket signatures (deterministic hyperplanes) + bucket sizes.
    "q36_ann_lsh_buckets" -> ((s, dir) => {
      import s.implicits._
      val planes = Similarity.hyperplanes(nPlanes = 8, dim = 64)
      Tables(s, dir, "embeddings")
        .withColumn("bucket",
          Similarity.lshBucket(Similarity.asDouble($"embedding"), planes))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), min($"vec_id").as("min_id"))
    }),

    // Language-id heuristic + agreement with the labeled lang column.
    "q37_langid" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .withColumn("pred_lang", TextAnalysis.langIdCol($"text"))
        .select($"doc_id", $"pred_lang",
          ($"pred_lang" === $"lang").cast("int").as("hit"))
    }),

    // Quality metrics (integer components + keep flag).
    "q38_quality" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.qualityMetrics(Tables(s, dir, "documents"), "text")
        .select($"doc_id", $"n_chars_norm", $"n_tokens", $"n_punct",
          $"n_stopwords_en", $"mean_token_len_e2", $"quality_keep")
    }),

    // Token counting: whitespace + BPE-ish subword units.
    "q39_token_counts" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .select($"doc_id",
          TextAnalysis.tokenCount($"text").as("n_ws_tokens"),
          TextAnalysis.bpeishCount($"text").as("n_bpeish"))
    }),

    // Document fingerprinting (normalized md5 + min shingle hash).
    "q40_fingerprint" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.fingerprint(Tables(s, dir, "documents"), "text", shingleK = 8)
        .select($"doc_id", $"fp_md5", $"fp_min_shingle")
    }),

    // Near-dup clusters: connected components over the LSH candidate pairs
    // (min-id representative per cluster) — the keep-one-per-group step.
    "q45_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.lshCandidatePairs(Tables(s, dir, "documents"),
        "text", "doc_id", shingleK = 8, numHashes = 8, bands = 4,
        maxBucketSize = Int.MaxValue) // uncapped: must match the oracle at any scale
      Dedup.connectedComponents(pairs)
    }),

    // Leakage-safe split on q45's clusters: near-duplicates move between
    // train/val/test as ONE unit (split key = cluster id, not doc id) —
    // the eval-contamination bug an id-hash split can't avoid.
    "q210_cluster_split" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.lshCandidatePairs(docs, "text", "doc_id",
        shingleK = 8, numHashes = 8, bands = 4,
        maxBucketSize = Int.MaxValue)
      graft.operators.Sampling.clusterAwareSplit(docs, pairs, "doc_id")
        .select($"doc_id", $"cluster_id", $"split")
    }),

    // q210's leakage-safe split over STRING ids (the UUID/URL-corpus
    // shape): doc ids rendered as strings on BOTH the corpus and the
    // pairs frame, so the 48-bit md5 node hash maps them into the long
    // component space — cluster_id is in the HASHED space, and the
    // oracle replays the portable conv(substr(md5(id),1,12),16,10)
    // convention (same as q71/q117's hashBucket).
    "q212_cluster_split_str" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
        .withColumn("sid", concat(lit("doc-"), $"doc_id".cast("string")))
      val pairs = Dedup.lshCandidatePairs(docs, "text", "doc_id",
        shingleK = 8, numHashes = 8, bands = 4,
        maxBucketSize = Int.MaxValue)
        .select(concat(lit("doc-"), $"a".cast("string")).as("a"),
          concat(lit("doc-"), $"b".cast("string")).as("b"))
      graft.operators.Sampling.clusterAwareSplit(docs, pairs, "sid")
        .select($"sid", $"cluster_id", $"split")
    }),

    // The PRODUCTION configuration of the leakage-safe split: candidate
    // pairs come from the bucket-CAPPED LSH — buckets over the cap
    // degrade to chained candidates (O(n) pairs; transitivity preserves
    // the component a clique would span, see lshCandidatePairs) — so
    // pair volume stays linear in corpus size no matter how
    // duplication-degenerate the corpus gets. q210/q212 gate the
    // oracle-exact UNCAPPED form; this is the plan a 100 TB run ships
    // (measured r15: a 30×-replicated corpus pushes the uncapped pair
    // set past 10^9 rows — one band bucket alone holds 18k docs — while
    // the capped set stays corpus-linear). Cap = 8 so the chain branch
    // BINDS on the sf0.01 fixture, proving the degraded path end-to-end.
    "q215_cluster_split_capped" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.lshCandidatePairs(docs, "text", "doc_id",
        shingleK = 8, numHashes = 8, bands = 4, maxBucketSize = 8)
      graft.operators.Sampling.clusterAwareSplit(docs, pairs, "doc_id")
        .select($"doc_id", $"cluster_id", $"split")
    }),

    // Quality-aware group dedup on q45's clusters: among near-duplicates,
    // keep the longest copy (ties by smallest id) — not the arbitrary
    // min-id representative; singletons survive untouched.
    "q111_dedup_keep_best" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val pairs = Dedup.lshCandidatePairs(docs, "text", "doc_id",
        shingleK = 8, numHashes = 8, bands = 4,
        maxBucketSize = Int.MaxValue)
      Dedup.keepBestPerCluster(docs, pairs, "doc_id", "n_chars")
        .select($"doc_id", $"n_chars")
    }),

    // IVF coarse-quantized ANN: 16 deterministic centroids (vec_id < 16),
    // top-2 within the query's cell for the first 24 queries.
    "q44_ivf_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfTopK(emb.where($"vec_id" < 24), emb,
          "vec_id", "embedding", k = 2, nList = 16)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id")
    }),

    // Embedding near-duplicate pairs: LSH bucket agreement + cosine
    // threshold (4 deterministic hyperplanes, threshold tuned to the
    // corpus's cosine range).
    "q42_embedding_neardup" -> ((s, dir) => {
      Similarity.embeddingNearDupPairs(Tables(s, dir, "embeddings"),
          "vec_id", "embedding", threshold = 0.42, nPlanes = 4,
          maxBucketSize = Int.MaxValue) // uncapped: must match the oracle at any scale
        .select("a", "b")
    }),

    // Multi-probe LSH top-k: the exact bucket PLUS every Hamming-distance-1
    // bucket is probed per query (recall close to brute force at a fraction
    // of a full scan). The oracle mirrors the probe-set expansion in SQL.
    "q57_ann_multiprobe" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshTopKMultiProbe(emb.where($"vec_id" < 24), emb,
          "vec_id", "embedding", k = 2, nPlanes = 4)
        .select($"query_id", $"rk", $"neighbor_id")
    }),

    // Hybrid retrieval via reciprocal-rank fusion: per-query dense
    // brute-force top-10 fused with a global BM25 quality prior
    // (replicated per query) — RRF sums 1/(60+rank) in a fixed fold
    // order, so the fused doubles hash-match across engines.
    "q137_hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val docs = Tables(s, dir, "documents")
      val queries = emb.where($"vec_id" < 8)
      val dense = Similarity.cosineTopK(queries, emb, "vec_id", "embedding",
        k = 10)
      val sparseTop = TextAnalysis.bm25(docs, "text", "doc_id",
          terms = Seq("table", "scan", "merge"))
        .orderBy($"bm25".desc, $"doc_id".asc).limit(10)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy($"bm25".desc, $"doc_id".asc)))
        .select($"rk", $"doc_id".as("neighbor_id"))
      val sparse = queries.select($"vec_id".as("query_id"))
        .crossJoin(sparseTop)
      Similarity.rrfFuse(Seq(dense, sparse), k0 = 60, topK = 5)
    }),

    // ANN recall evaluation: multiprobe-LSH top-2 (q57's search) scored
    // against exact brute-force top-2 — per-query (possible, hits) as
    // exact integers; the index-tuning feedback metric.
    "q136_ann_recall" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.where($"vec_id" < 24)
      Similarity.annRecallAtK(
        Similarity.lshTopKMultiProbe(queries, emb, "vec_id", "embedding",
          k = 2, nPlanes = 4),
        Similarity.cosineTopK(queries, emb, "vec_id", "embedding", k = 2),
        k = 2)
    }),

    // The recall-vs-nProbe tuning curve on the PERSISTED index — the
    // workflow a user actually runs to pick nProbe: one exact-L2 ground
    // truth (same 1000× integer grid as the index), three searches of the
    // reloaded IVF-PQ index at nProbe ∈ {1, 2, 4}, each scored by
    // annRecallAtK as exact integers. Widening the probe set can only add
    // candidates, and ADC ranks a superset at least as well on this
    // fixture, so hits are non-decreasing in nprobe (the spec asserts it;
    // the oracle pins the exact integers).
    "q140_recall_curve" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val idx = s"/tmp/graft_annidx_curve_v2_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(idx)
      graft.sources.AnnIndex.saveIvfPq(emb, "vec_id", "embedding", idx,
        dims = 64, m = 4, k = 16, nList = 8)
      val loaded = graft.sources.AnnIndex.loadIvfPq(s, idx)
      val queries = emb.where($"vec_id" < 8)
      val exact = Similarity.l2TopK(queries, emb, "vec_id", "embedding", k = 3)
      Seq(1, 2, 4).map { p =>
        Similarity.annRecallAtK(
            loaded.search(queries, "embedding", topK = 3, nProbe = p),
            exact, k = 3)
          .withColumn("nprobe", lit(p))
      }.reduce(_ unionByName _)
        .select($"nprobe", $"query_id", $"possible", $"hits")
    }),

    // Capped-vs-uncapped LSH equivalence on a deliberately degenerate
    // corpus: 5 groups of exact duplicates, every LSH bucket far over the
    // cap, so candidate generation takes the CHAINED branch (consecutive
    // pairs, O(n) per bucket) — and connected components must still
    // recover exactly the uncapped clusters, which the oracle states in
    // closed form (cluster = min doc_id of the duplicate group). This is
    // the only gate that exercises the chain degradation path end-to-end.
    "q58_capped_lsh_equiv" -> ((s, dir) => {
      import s.implicits._
      // each group's text is one character repeated — the groups share NO
      // shingle, so cross-group bucket collisions are impossible and the
      // expected clusters are exactly the duplicate groups
      val degenerate = Tables(s, dir, "documents")
        .select($"doc_id",
          repeat(substring(lit("abcde"), (($"doc_id" % 5) + 1).cast("int"), lit(1)), 64)
            .as("text"))
      val pairs = Dedup.lshCandidatePairs(degenerate, "text", "doc_id",
        shingleK = 8, numHashes = 8, bands = 4, maxBucketSize = 16)
      Dedup.connectedComponents(pairs)
    }),

    // Per-language character-bigram document-frequency profile (top 10).
    "q46_ngram_profile" -> ((s, dir) => {
      TextAnalysis.ngramProfile(Tables(s, dir, "documents"),
        "text", "lang", n = 2, topK = 10)
    }),

    // Multimodal plumbing: text bytes as a stand-in binary payload →
    // typed asset table → batched stub decode → features. Output restricted
    // to fields the oracle can recompute (metadata + stub dimensions).
    "q41_multimodal_stub" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
        .withColumn("payload", encode($"text", "UTF-8"))
      val assets = Multimodal.toAssets(docs, "doc_id", "payload", "image", "source")
      val feats = Multimodal.extractFeatures(s, assets)
      assets.join(feats, Seq("asset_id"))
        .select($"asset_id", $"meta.n_bytes".as("n_bytes"),
          $"meta.content_md5".as("content_md5"),
          $"width", $"height", $"n_frames")
    }),

    // REAL image decode (javax.imageio): deterministic 16x16 gray PNGs are
    // encoded per doc, decoded back by ImageIoDecoder on executors, and the
    // 16-bin pixel histogram emitted as exact integers. PNG is lossless and
    // the gray ramp has a closed form, so the oracle recomputes the
    // histogram without any decoder.
    "q49_image_decode" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents").select($"doc_id").as[Long]
      val pngs = ids
        .mapPartitions(it => it.map(id => (id, Multimodal.syntheticPng(id, 16, 16))))
        .toDF("doc_id", "png")
        .withColumn("src", lit("synthetic_png"))
      val assets = Multimodal.toAssets(pngs, "doc_id", "png", "image", "src")
      val feats = Multimodal.extractFeatures(s, assets, Multimodal.ImageIoDecoder)
      // feature(i) = count_i / (w*h) exactly (w*h = 256 a power of two), so
      // the integer counts reconstruct exactly
      feats.select($"asset_id", $"width", $"height",
          posexplode($"feature").as(Seq("bin", "frac")))
        .select($"asset_id", $"width", $"height", $"bin",
          round($"frac" * ($"width" * $"height")).cast("long").as("cnt"))
    }),

    // REAL audio decode (javax.sound.sampled): deterministic 8-bit mono
    // WAVs are encoded per doc, decoded back by JdkMediaDecoder on
    // executors, and the 16-bin sample histogram emitted as exact
    // integers. PCM is lossless and the sample ramp has a closed form, so
    // the oracle recomputes the histogram without any decoder (q49's
    // construction, for audio).
    "q59_audio_decode" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents").select($"doc_id").as[Long]
      val wavs = ids
        .mapPartitions(it => it.map(id => (id, Multimodal.syntheticWav(id, 512))))
        .toDF("doc_id", "wav")
        .withColumn("src", lit("synthetic_wav"))
      val assets = Multimodal.toAssets(wavs, "doc_id", "wav", "audio", "src")
      val feats = Multimodal.extractFeatures(s, assets, Multimodal.JdkMediaDecoder)
      // feature(i) = count_i / 512 exactly (power of two), so the integer
      // counts reconstruct exactly
      feats.select($"asset_id", $"width".as("sample_rate"),
          $"height".as("channels"), $"n_frames",
          posexplode($"feature").as(Seq("bin", "frac")))
        .select($"asset_id", $"sample_rate", $"channels", $"n_frames", $"bin",
          round($"frac" * $"n_frames").cast("long").as("cnt"))
    }),

    // REAL multi-frame video decode (javax.imageio GIF): a deterministic
    // grayscale animated GIF per doc (2-4 frames) is decoded back frame by
    // frame on executors, every 2nd frame sampled, and its 16-bin pixel
    // histogram emitted as exact integers. GIF LZW is lossless and the
    // frame pixels have a closed form, so the oracle recomputes the
    // histograms without any decoder (q49/q59's construction, for video).
    "q68_video_frames" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents").select($"doc_id").as[Long]
      val gifs = ids
        .mapPartitions(it => it.map(id =>
          (id, Multimodal.syntheticGif(id, 8, 8, (id % 3 + 2).toInt))))
        .toDF("doc_id", "gif")
        .withColumn("src", lit("synthetic_gif"))
      val assets = Multimodal.toAssets(gifs, "doc_id", "gif", "video", "src")
      Multimodal.extractFrameFeatures(s, assets, stride = 2)
        .select($"asset_id", $"width", $"height", $"n_frames", $"frame_idx",
          posexplode($"hist").as(Seq("bin", "cnt")))
    }),

    // REAL second video container: a spec-conformant RIFF/AVI file per doc
    // (raw BI_RGB DIB frames — even ids 8-bit paletted, odd ids 24-bit
    // BGR; every 5th id stored top-down) is parsed and decoded back frame
    // by frame on executors through the same frame-sampling path as q68.
    // Raw DIB is lossless and the pixels have a closed form, so the
    // oracle recomputes the histograms with no container parser.
    "q158_video_avi" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents").select($"doc_id").as[Long]
      val avis = ids
        .mapPartitions(it => it.map { id =>
          val bits = if (id % 2 == 0) 8 else 24
          (id, Avi.syntheticAviDib(id, 8, 8, (id % 3 + 2).toInt,
            bitCount = bits, topDown = id % 5 == 0))
        })
        .toDF("doc_id", "avi")
        .withColumn("src", lit("synthetic_avi"))
      val assets = Multimodal.toAssets(avis, "doc_id", "avi", "video", "src")
      Multimodal.extractFrameFeatures(s, assets, stride = 2)
        .select($"asset_id", $"width", $"height", $"n_frames", $"frame_idx",
          posexplode($"hist").as(Seq("bin", "cnt")))
    }),

    // MJPEG-compressed AVI, oracle-gated despite the LOSSY codec: frames
    // are constant-luma (pure DC through the 8x8 DCT, so JDK decode
    // error is a small bounded rounding term) and the gate emits the
    // TOLERANCE VERDICT per frame plus the exact container metadata —
    // the oracle replays the closed-form geometry and literal trues.
    // The JPEG decode itself runs at the JDK codec boundary
    // (mapPartitions), same as every other codec gate.
    "q202_mjpeg_avi" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents").select($"doc_id").as[Long]
      ids.mapPartitions(it => it.flatMap { id =>
        val nf = (id % 3 + 2).toInt
        val payload = Avi.syntheticAviMjpegConst(id, 16, 16, nf)
        val (w, h, frames) = Avi.decodeAviFrames(payload)
        frames.iterator.zipWithIndex.map { case (px, f) =>
          val exp = Avi.mjpegConstLuma(id, f)
          var mn = 255; var mx = 0
          px.foreach { b =>
            val v = b & 0xff; if (v < mn) mn = v; if (v > mx) mx = v }
          (id, f, w, h, nf, mn >= exp - 3 && mx <= exp + 3)
        }
      }).toDF("doc_id", "frame_idx", "width", "height", "n_frames", "ok")
    }),

    // PCM audio decoded out of an INTERLEAVED A/V AVI: the same
    // closed-form samples as q59's WAV path (one shared oracle), but the
    // decoder must select the 'auds' stream and skip the video chunks
    // woven between its data. Alternating 8/16-bit PCM by id parity.
    "q171_audio_avi" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents").select($"doc_id").as[Long]
      val avis = ids
        .mapPartitions(it => it.map { id =>
          (id, Avi.syntheticAviInterleaved(id, 8, 8, (id % 3 + 2).toInt,
            nSamples = 512, sampleRate = 8000,
            bits = if (id % 2 == 0) 8 else 16))
        })
        .toDF("doc_id", "avi")
        .withColumn("src", lit("synthetic_avi_av"))
      val assets = Multimodal.toAssets(avis, "doc_id", "avi", "audio", "src")
      val feats = Multimodal.extractFeatures(s, assets, Multimodal.JdkMediaDecoder)
      feats.select($"asset_id", $"width".as("sample_rate"),
          $"height".as("channels"), $"n_frames",
          posexplode($"feature").as(Seq("bin", "frac")))
        .select($"asset_id", $"sample_rate", $"channels", $"n_frames", $"bin",
          round($"frac" * $"n_frames").cast("long").as("cnt"))
    }),

    // Video preprocessing chain: strided AVI decode (unsampled frames
    // never decode) → nearest resize 8x8 → 4x4 → exact histograms.
    // resizeNearest's integer index map (in-x = 2·out-x) keeps the
    // composition closed-form, so the oracle needs no decoder OR resizer.
    "q170_video_resize" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents").select($"doc_id").as[Long]
      val avis = ids
        .mapPartitions(it => it.map { id =>
          (id, Avi.syntheticAviDib(id, 8, 8, (id % 3 + 2).toInt,
            bitCount = if (id % 2 == 0) 8 else 24))
        })
        .toDF("doc_id", "avi")
        .withColumn("src", lit("synthetic_avi"))
      val assets = Multimodal.toAssets(avis, "doc_id", "avi", "video", "src")
      Multimodal.extractResizedFrameFeatures(s, assets, stride = 2,
          outW = 4, outH = 4)
        .select($"asset_id", $"width", $"height", $"n_frames", $"frame_idx",
          $"out_w", $"out_h", posexplode($"hist").as(Seq("bin", "cnt")))
    }),

    // Gopher-style repetition filters: duplicate-token mass and top-2-gram
    // dominance as exact integers.
    "q50_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionMetrics(Tables(s, dir, "documents"), "text", "doc_id")),

    // PII detection + redaction (emails, long digit runs) — the redacted
    // text itself is hash-compared byte-for-byte.
    "q51_pii_scrub" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.piiScrub(Tables(s, dir, "documents"), "text")
        .select($"doc_id", $"n_emails", $"n_long_numbers", $"redacted_text")
    }),

    // Deterministic hash-bucket train/val/test split — stable across runs,
    // engines, and partitionings.
    "q52_split" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents").select($"doc_id",
        graft.operators.Sampling.hashBucket($"doc_id").as("bucket"),
        graft.operators.Sampling.splitCol($"doc_id").as("split"))
    }),

    // Weighted Bernoulli sampling (probability ∝ document length, capped
    // at 1) decided by exact integer arithmetic on the id's 40-bit md5
    // prefix — reproducible on any engine, no float pow; a row-local
    // predicate with no shuffle. The fixed-size A-ES variant
    // (weightedTopK) is property-tested in SamplingSpec.
    "q117_weighted_sample" -> ((s, dir) => {
      import s.implicits._
      val d = Tables(s, dir, "documents")
      d.where(graft.operators.Sampling.weightedKeep(
          $"doc_id", length($"text"), num = 1L, denom = 2048L))
        .select($"doc_id", $"lang", length($"text").cast("long").as("w"))
    }),

    // Char-trigram LM fluency scoring (CCNet-style quality signal),
    // self-trained on the corpus: per-doc sum of add-one-smoothed
    // conditional log-probs, QUANTIZED per n-gram to 0.1 milli-nats
    // before summing so the aggregate is exact integer arithmetic —
    // engine- and order-independent, hence hashable. Model frames are
    // charset-bounded broadcasts; the corpus never shuffles.
    "q118_lm_score" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // Deliberately the LAZY two-frame form, not charLmTrain's combined
      // checkpoint (r21, measured): both model frames feed broadcast
      // exchanges whose corpus scans materialize CONCURRENTLY in the
      // broadcast threads, overlapping with each other — the eager
      // combined pass serializes an extra action and benched 0.57→0.97 s.
      // charLmTrain keeps the one-pass shape for the model-store paths,
      // where each order is a separate WRITE action and nothing overlaps.
      val m3 = TextAnalysis.charLmCounts(docs, "text", 3)
      val m2 = TextAnalysis.charLmCounts(docs, "text", 2)
      TextAnalysis.charLmScore(docs, "doc_id", "text", m3, m2,
        n = 3, vocabSize = 128)
    }),

    // Persisted char-LM roundtrip: counts trained once, written to disk,
    // reloaded, scored — must equal q118's self-trained in-memory scores.
    "q166_charlm_roundtrip" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val mdl = s"/tmp/graft_charlm_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(mdl)
      graft.sources.TextModelStore.saveCharLm(docs, "text", mdl, n = 3)
      val m = graft.sources.TextModelStore.loadCharLm(s, mdl)
      TextAnalysis.charLmScore(docs, "doc_id", "text", m.ngrams, m.contexts,
        n = 3, vocabSize = 128)
    }),

    // Incremental char-LM: train on even ids, append odd ids — merged
    // counts must equal one-shot full-corpus training (counts are
    // additive), so scoring matches q118's oracle verbatim.
    "q167_charlm_append" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val mdl = s"/tmp/graft_charlm_app_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(mdl)
      graft.sources.TextModelStore.saveCharLm(
        docs.where($"doc_id" % 2 === 0), "text", mdl, n = 3)
      graft.sources.TextModelStore.appendCharLm(s,
        docs.where($"doc_id" % 2 === 1), "text", mdl)
      val m = graft.sources.TextModelStore.loadCharLm(s, mdl)
      TextAnalysis.charLmScore(docs, "doc_id", "text", m.ngrams, m.contexts,
        n = 3, vocabSize = 128)
    }),

    // Exact repeated-substring spans (exact-substring dedup's detection
    // pass): every 24-char window of normalized text occurring in >= 2
    // distinct documents, with doc + occurrence counts. In-row window
    // fan-out, one span aggregation — no joins.
    "q124_repeated_spans" -> ((s, dir) =>
      Dedup.repeatedSpans(Tables(s, dir, "documents"), "text", "doc_id",
        spanLen = 24, minDocs = 2)),

    // Per-language token-count quartiles via the mergeable min-k
    // row-sampling quantile sketch. k=8192 exceeds every language group
    // here, so the sketch is the group and every quartile is exact —
    // which is what makes the DuckDB oracle a fair hash check; the same
    // plan at 100 TB degrades gracefully to a deterministic
    // uniform-sample estimate with only k pairs per group crossing the
    // shuffle.
    "q125_quantile_sketch" -> ((s, dir) => {
      import s.implicits._
      val withTok = Tables(s, dir, "documents")
        .select($"doc_id", $"lang",
          TextAnalysis.tokenCount($"text").as("n_tokens"))
      graft.operators.Sketches.groupQuantiles(withTok, "lang", "doc_id",
        "n_tokens", qs = Seq(0.25, 0.5, 0.75), k = 8192)
    }),

    // Per-document duplicated-span coverage (exact-substring dedup's
    // doc-level filter statistic): of each doc's 24-char windows, how
    // many also appear in >= 2 distinct docs. Two hash-aggs + one
    // span-keyed join of aggregated sides — no windows, no arrays.
    "q126_span_coverage" -> ((s, dir) =>
      Dedup.spanDuplicationStats(Tables(s, dir, "documents"), "text",
        "doc_id", spanLen = 24, minDocs = 2)),

    // BPE tokenizer training: 6 merges learned from the corpus. Only the
    // word-frequency aggregation is corpus-sized; every merge iteration
    // runs on the distinct-word vocabulary frame.
    "q131_bpe_train" -> ((s, dir) =>
      TextAnalysis.bpeTrain(Tables(s, dir, "documents"), "text", merges = 6)),

    // BPE encode: the 6 learned merges applied to every document as
    // nested row-local replaces (no explode, no vocab join) — per-doc
    // word and BPE-token counts.
    "q132_bpe_encode" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      TextAnalysis.bpeEncodeCounts(docs, "doc_id", "text",
        TextAnalysis.bpeTrain(docs, "text", merges = 6))
    }),

    // Per-language token heavy hitters: one Space-Saving sketch per
    // group. capacity=64 > the 31 distinct tokens per language, so every
    // count is exact (err 0) and the plain GROUP BY oracle hash-matches;
    // the identical plan at 100 TB keeps per-group state bounded at 64
    // counters instead of exchanging a vocabulary-sized frame.
    "q130_group_topk" -> ((s, dir) => {
      val toks = Dedup.fanOut(Tables(s, dir, "documents"))
        .select(col("lang"),
          explode(split(Dedup.normalizedText(coalesce(col("text"), lit(""))),
            " ")).as("token"))
        .where(col("token") =!= "")
      graft.operators.Sketches.groupHeavyHitters(toks, "lang", "token",
        capacity = 64, minCount = 5L)
    }),

    // Corpus vocabulary: global top-100 tokens by occurrences with
    // document frequencies — deterministic tie-break (count desc, token).
    "q72_vocabulary" -> ((s, dir) =>
      TextAnalysis.vocabulary(Tables(s, dir, "documents"), "text", "doc_id",
        topK = 100)),

    // End-to-end clean-corpus pipeline — the composition story: quality
    // filter → exact dedup (min-id survivor among kept docs) → stratified
    // rebalancing sample → per-language corpus stats. Every stage is an
    // operator gated elsewhere (q38/q30/q71); this gate proves they
    // compose into one lazy plan with the filters feeding the dedup
    // aggregation directly.
    "q73_clean_corpus" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val kept = TextAnalysis.qualityMetrics(docs, "text")
        .where($"quality_keep")
      val deduped = Dedup.dropExactDuplicates(kept, "text", "doc_id")
      deduped
        .where(graft.operators.Sampling.stratifiedKeep($"doc_id", $"lang",
          Map("en" -> 60), defaultPct = 80))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("sum_tokens"))
    }),

    // Stratified rebalancing sample: downsample dominant English to 60%,
    // German to 30%, everything else to 10% — deterministic md5 buckets,
    // join-stable with q52's split, pure row-local predicate (no shuffle).
    "q71_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .where(graft.operators.Sampling.stratifiedKeep($"doc_id", $"lang",
          Map("en" -> 60, "de" -> 30), defaultPct = 10))
        .select($"doc_id", $"lang")
    }),

    // Deterministic mixture sampling: fill per-source token budgets in
    // md5(id) order — the pretraining data-mixing step. Budget edges
    // covered: src2's budget exceeds its total (all rows), src3's is 1
    // (exactly the first hash-ordered doc); unlisted sources drop.
    "q108_mixture" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Sampling.mixtureSample(Tables(s, dir, "documents"),
          "doc_id", "source", "n_chars",
          Map("src0" -> 4000L, "src1" -> 2000L, "src2" -> 1000000L,
            "src3" -> 1L))
        .select($"doc_id", $"source", $"n_chars")
    }),

    // Benchmark decontamination: word-5-gram overlap of every corpus doc
    // against a benchmark subset (doc_id % 97 == 0 stands in for the
    // held-out eval set). Benchmark n-gram set is broadcast; the corpus
    // is never shuffled on n-gram.
    "q74_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val bench = docs.where($"doc_id" % 97 === 0)
      TextAnalysis.contamination(docs, bench, "text", "doc_id", n = 5)
    }),

    // Persisted BM25 text index lifecycle: build the bucket-partitioned
    // postings on disk, reload, search fixed terms — only the query
    // terms' bucket directories are read (static partition filter), and
    // quantize-before-sum scoring (bm25_q4) keeps the result
    // hash-exact against an oracle that recomputes BM25 from scratch.
    "q145_text_index" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val idx = s"/tmp/graft_textidx_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(idx)
      graft.sources.TextIndex.save(docs, "text", "doc_id", idx, nBuckets = 16)
      graft.sources.TextIndex.load(s, idx)
        .search(Seq("table", "scan", "merge"), topK = 10)
    }),

    // Incremental text-index growth: index even ids, append odd ids —
    // postings/df-deltas append into the bucket layout, manifest
    // constants add — then the same search must equal the from-scratch
    // full-corpus oracle exactly.
    "q146_text_index_append" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val idx = s"/tmp/graft_textidx_app_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(idx)
      graft.sources.TextIndex.save(docs.where($"doc_id" % 2 === 0),
        "text", "doc_id", idx, nBuckets = 16)
      graft.sources.TextIndex.load(s, idx)
        .append(docs.where($"doc_id" % 2 === 1), "text")
        .search(Seq("table", "scan", "merge"), topK = 10)
    }),

    // TIME-TRAVEL read on the text index: index even ids, append odd ids,
    // search AS-OF generation 1 — the pre-append state. The manifest
    // records per-generation (n_docs, sum_dl) deltas, so the historical
    // BM25 constants are exact prefix sums and the as-of search equals
    // the from-scratch even-ids search byte for byte.
    "q161_text_index_time_travel" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val idx = s"/tmp/graft_textidx_tt_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(idx)
      graft.sources.TextIndex.save(docs.where($"doc_id" % 2 === 0),
        "text", "doc_id", idx, nBuckets = 16)
      graft.sources.TextIndex.load(s, idx)
        .append(docs.where($"doc_id" % 2 === 1), "text")
      graft.sources.TextIndex.load(s, idx, asOfGen = 1)
        .search(Seq("table", "scan", "merge"), topK = 10)
    }),

    // Variable-length exact-substring repeats via the generalized suffix
    // array (prefix doubling; Lee et al. 2022's exact-substring design):
    // every maximal run of SA-adjacent suffixes with pairwise LCP >= 16
    // is one repeated substring — string, exact length (capped at 48),
    // occurrence count. Bounded slice: the corpus-wide answer at 100 TB
    // belongs to the winnowed/fixed-window operators (q124/q142); this is
    // the exact variable-length instrument for a shard.
    "q144_suffix_repeats" -> ((s, dir) => {
      import s.implicits._
      graft.operators.SuffixArray.repeatsAtLeast(
        Tables(s, dir, "documents").where($"doc_id" < 200),
        "text", "doc_id", minLen = 16, cap = 48)
    }),

    // Bloom-prescreened decontamination: q74's exact result through the
    // two-pass production shape — broadcast Bloom bits gate the corpus
    // grams (codegen'd long probe), the exact broadcast join verifies
    // survivors only. No false negatives → the gate shares q74's oracle.
    "q143_bloom_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val bench = docs.where($"doc_id" % 97 === 0)
      TextAnalysis.contaminationBloom(docs, bench, "text", "doc_id", n = 5)
    }),

    // C4-style line-level corpus dedup: documents re-chunked into 10-token
    // lines, every line that repeats anywhere in the corpus keeps only its
    // first (doc_id, position) occurrence, documents reassembled — the
    // reassembled text is byte-compared against the oracle.
    "q75_line_dedup" -> ((s, dir) => {
      import s.implicits._
      val chunked = Tables(s, dir, "documents")
        .select($"doc_id",
          split(Dedup.normalizedText(coalesce($"text", lit(""))), " ").as("__toks"))
        .select($"doc_id", Dedup.chunkTokensIntoLines($"__toks", 10).as("text"))
      Dedup.dedupLines(chunked, "text", "doc_id")
    }),

    // BM25 relevance of every document against fixed query terms —
    // rational IDF (no ln), dyadic k1/b, so scores are bit-identical
    // across engines; corpus stats are one broadcast aggregate row.
    "q76_bm25" -> ((s, dir) => {
      TextAnalysis.bm25(Tables(s, dir, "documents"), "text", "doc_id",
        terms = Seq("spark", "window", "merge"))
    }),

    // Distributed Lloyd's k-means (k=8, 2 rounds) over grid-quantized
    // embeddings — the IVF training step. Quantization makes every
    // centroid sum exact, so assignments are bit-reproducible and the
    // oracle unrolls both rounds in SQL.
    "q77_kmeans" -> ((s, dir) => {
      Similarity.kmeansAssign(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2)
    }),

    // KMV distinct-count sketch (custom TypedImperativeAggregate): per-
    // language approximate distinct 8-shingles. Deterministic hash → the
    // estimate is reproducible and oracle-checkable, unlike HLL; only k
    // longs per group cross the shuffle.
    // Heavy hitters via a Space-Saving sketch: bounded counters with
    // map-side combine — at most `capacity` entries per partition cross
    // the shuffle, never a vocabulary-sized exchange. capacity 64 exceeds
    // the corpus vocabulary, so the sketch is in its EXACT regime (every
    // err 0, order-independent) and the groupBy-count oracle pins it;
    // TopKSketchSpec property-tests the approximate regime.
    "q116_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val toks = Dedup.fanOut(Tables(s, dir, "documents"))
        .select(explode(split(Dedup.normalizedText(coalesce($"text", lit(""))), " "))
          .as("token"))
        .where($"token" =!= "")
      graft.operators.Sketches.heavyHitters(toks, "token",
          capacity = 64, minCount = 500L)
        .withColumnRenamed("count", "n")
    }),

    "q80_kmv_distinct" -> ((s, dir) => {
      import s.implicits._
      // fanOut before the explode: the shingle fan-out and its md5s are
      // the cost, and a single-split input would run them on one core;
      // staged __norm so the normalization runs once per row, not per
      // shingle (see Dedup.shinglesOfNormalized)
      val sh = Dedup.fanOut(Tables(s, dir, "documents"))
        .select($"lang", Dedup.normalizedText($"text").as("__norm"))
        .select($"lang", explode(Dedup.shinglesOfNormalized($"__norm", 8)).as("sh"))
      graft.operators.Sketches.distinctEstimate(sh, "lang", "sh", k = 64)
    }),

    // HLL distinct users per event type: the constant-memory counterpart
    // of q80's KMV — m=256 BYTES of register state per group cross the
    // shuffle regardless of cardinality. The md5 bucket/rho split and the
    // 2^49-scaled integer harmonic sum make the registers AND the
    // estimate bit-reproducible in ANSI SQL (the one FP step is a single
    // literal/integer division); exact countDistinct joined alongside to
    // expose the ~1.04/sqrt(256) ≈ 6.5% error regime.
    "q175_hll_distinct" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events").where($"user_id".isNotNull)
      val sk = graft.operators.Sketches.hllDistinct(ev, "event_type", "user_id", m = 256)
      val exact = ev.groupBy($"event_type")
        .agg(countDistinct($"user_id").as("exact_distinct"))
      sk.join(exact, Seq("event_type"))
    }),

    // HLL under ROLLUP: one pass produces per-type registers AND the
    // grand-total registers through Spark's partial-aggregation of the
    // custom TypedImperativeAggregate — the mergeability property
    // (elementwise max) is what makes the rollup row correct without a
    // second scan. The oracle recomputes both levels independently and
    // must land on identical registers.
    "q191_hll_rollup" -> ((s, dir) => {
      import s.implicits._
      // event_type IS NOT NULL: the rollup's grand-total row is keyed by
      // NULL, so a data-derived NULL group would alias it under the
      // coalesce below (two "__total" rows, different registers)
      val ev = Tables(s, dir, "events")
        .where($"user_id".isNotNull && $"event_type".isNotNull)
      val (b, r) = graft.operators.Sketches.hllBucketRho($"user_id", 8)
      val rolled = ev.select($"event_type", b.as("__b"), r.as("__r"))
        .rollup($"event_type")
        .agg(graft.functions.HllSketch.registers($"__b", $"__r", 256).as("__regs"))
      rolled.select(coalesce($"event_type", lit("__total")).as("event_type") +:
        graft.operators.Sketches.hllSummary($"__regs", 256): _*)
    }),

    // HLL set algebra: register-level UNION (elementwise max) +
    // inclusion–exclusion gives the click∩purchase distinct-user
    // estimate from three fixed-size sketches — no re-scan, no join of
    // the raw data. Exact intersection joined alongside.
    "q194_hll_set_algebra" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events").where($"user_id".isNotNull)
      val (b, r) = graft.operators.Sketches.hllBucketRho($"user_id", 8)
      def regsOf(t: String) = ev.where($"event_type" === t)
        .select(b.as("__b"), r.as("__r"))
        .agg(graft.functions.HllSketch.registers($"__b", $"__r", 256).as("regs"))
      def estOf(c0: org.apache.spark.sql.Column) =
        graft.operators.Sketches.hllSummary(c0, 256).last
      val both = regsOf("click").select($"regs".as("rc"))
        .crossJoin(regsOf("purchase").select($"regs".as("rp")))
        .select($"rc", $"rp",
          graft.operators.Sketches.hllUnionRegisters($"rc", $"rp").as("ru"))
      val exact = ev
        .groupBy($"user_id")
        .agg(max(when($"event_type" === "click", 1).otherwise(0)).as("c"),
          max(when($"event_type" === "purchase", 1).otherwise(0)).as("p"))
        .where($"c" === 1 && $"p" === 1)
        .agg(count(lit(1)).as("exact_inter"))
      both.crossJoin(exact).select(
        estOf($"rc").as("est_click"),
        estOf($"rp").as("est_purchase"),
        estOf($"ru").as("est_union"),
        (estOf($"rc") + estOf($"rp") - estOf($"ru")).as("est_inter"),
        $"exact_inter")
    }),

    // Sliding-window distinct users from STORED sketches: per-hour HLL
    // registers are built once, then every trailing-3h estimate is pure
    // register algebra — a windowed max per (bucket) over the hour axis
    // — without ever rescanning events. The monitoring-dashboard shape:
    // store m bytes per hour, answer any trailing-window cardinality.
    "q197_hll_sliding" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events").where($"user_id".isNotNull)
      val (b, r) = graft.operators.Sketches.hllBucketRho($"user_id", 8)
      val regsHr = ev
        .select(expr("unix_micros(ts) div 3600000000").as("hour"),
          b.as("__b"), r.as("__r"))
        .groupBy($"hour")
        .agg(graft.functions.HllSketch.registers($"__b", $"__r", 256).as("regs"))
      val exploded = regsHr
        .select($"hour", posexplode($"regs").as(Seq("bucket", "rho")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"bucket").orderBy($"hour").rangeBetween(-2, 0)
      exploded.withColumn("rho3", max($"rho").over(w))
        .groupBy($"hour")
        .agg(sum(when($"rho3" === 0, 1L).otherwise(0L)).as("n_zero"),
          sum(call_function("shiftleft", lit(1L), lit(49) - $"rho3"))
            .as("sum_scaled"))
        .select($"hour", $"n_zero", $"sum_scaled",
          floor(lit(graft.operators.Sketches.hllConstant(256)) /
            $"sum_scaled".cast("double")).as("est_distinct"))
    }),

    // CMS inner product: the classic join-size estimator — min over
    // hash rows of Σ_b A[row][b]·B[row][b] approximates Σ_k fA(k)·fB(k)
    // (view→purchase user pair count) from two fixed 4×512 sketches,
    // WITHOUT executing the join. One-sided (est ≥ true); exact joined
    // alongside.
    "q195_cms_join_size" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events").where($"user_id".isNotNull)
      def m(t: String) = graft.operators.Sketches.cmsMatrix(
        ev.where($"event_type" === t), "user_id", depth = 4, width = 512)
      val est = m("view").select($"cms".as("ma"))
        .crossJoin(m("purchase").select($"cms".as("mb")))
        .select(graft.operators.Sketches.cmsInnerProduct($"ma", $"mb", 4, 512)
          .as("est_pairs"))
      val exact = ev.where($"event_type" === "view")
        .groupBy($"user_id").agg(count(lit(1)).as("fa"))
        .join(ev.where($"event_type" === "purchase")
          .groupBy($"user_id").agg(count(lit(1)).as("fb")), "user_id")
        .agg(coalesce(sum($"fa" * $"fb"), lit(0L)).as("exact_pairs"))
      est.crossJoin(exact)
    }),

    // Count-Min token frequencies: the frequency-estimation sketch —
    // q116's Space-Saving answers "which items are frequent", CMS answers
    // "how frequent is THIS item" with a fixed 4×512-counter matrix (d·w
    // longs cross the shuffle regardless of token-stream size, map-side
    // combined, elementwise-add merge). Estimates for the top-20 exact
    // tokens, exact counts joined alongside to expose the one-sided
    // (est ≥ true) collision error.
    "q176_cms_counts" -> ((s, dir) => {
      import s.implicits._
      val toks = Dedup.fanOut(Tables(s, dir, "documents"))
        .select(explode(split(Dedup.normalizedText(coalesce($"text", lit(""))), " "))
          .as("token"))
        .where($"token" =!= "")
      val matrix = graft.operators.Sketches.cmsMatrix(toks, "token",
        depth = 4, width = 512)
      val top = toks.groupBy($"token").agg(count(lit(1)).as("exact_count"))
        .orderBy($"exact_count".desc, $"token".asc).limit(20)
      top.crossJoin(broadcast(matrix))
        .select($"token",
          graft.operators.Sketches.cmsEstimate($"cms", $"token", 4, 512)
            .as("est_count"),
          $"exact_count")
    }),

    // PageRank over the nation trade graph (customer nation → supplier
    // nation per distinct trading relationship): the canonical iterative
    // join-aggregate workload — 3 rounds, each one shuffle join on src +
    // one map-side-combined aggregation on dst, ranks materialized
    // between rounds so round k+1 reads data, not a 2^k-deep plan.
    // Scaled-integer floor arithmetic end to end (see Graph.pageRank), so
    // the oracle unrolls the same 3 rounds in pure SQL bit-exactly.
    "q177_pagerank" -> ((s, dir) => {
      import s.implicits._
      val edges = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
        .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(Tables(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
          $"o_custkey" === $"c_custkey")
        .join(Tables(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
          $"l_suppkey" === $"s_suppkey")
        .select($"c_nationkey".cast("long").as("src"),
          $"s_nationkey".cast("long").as("dst"))
        .distinct()
      graft.operators.Graph.pageRank(edges, iterations = 3)
    }),

    // Scalar (int8-style) quantization codes: per-dim global [min, max]
    // from one corpus agg, floor-quantized to 8 bits — floor of
    // identical IEEE-double expressions is bit-stable across engines, so
    // the codes hash-match exactly (round()'s half-tie conventions
    // wouldn't).
    "q208_sq8_codes" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Similarity.scalarQuantize(
          Tables(s, dir, "embeddings"), "vec_id", "embedding")
        .where($"vec_id" < 64)
        .select($"vec_id", posexplode($"__codes").as(Seq("dim", "code")))
    }),

    // SQ asymmetric search: top-3 neighbors per query under the pure
    // INTEGER code-space L2 — the cheap first-pass ranking an SQ index
    // serves before raw-vector rerank. Every output value integral.
    "q209_sq8_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      graft.operators.Similarity.sqTopK(
        emb.where($"vec_id" < 24), emb, "vec_id", "embedding", k = 3)
    }),

    // Binary-embedding retrieval: sign bits against per-dim MIDRANGE
    // thresholds (min/max are aggregation-order exact — a float mean
    // would not be), packed 64 dims/long, top-3 by integer Hamming.
    "q211_binary_hamming" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      graft.operators.Similarity.hammingTopK(
        emb.where($"vec_id" < 24), emb, "vec_id", "embedding", k = 3)
    }),

    // Personalized PageRank on the same nation trade graph: teleport
    // confined to seed nations (node < 5), so rank measures proximity to
    // the seed set — exact integer arithmetic, 3 fixed iterations, every
    // floor division replayed by the oracle.
    "q205_personalized_pagerank" -> ((s, dir) => {
      import s.implicits._
      val edges = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
        .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(Tables(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
          $"o_custkey" === $"c_custkey")
        .join(Tables(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
          $"l_suppkey" === $"s_suppkey")
        .select($"c_nationkey".cast("long").as("src"),
          $"s_nationkey".cast("long").as("dst"))
        .distinct()
      val seeds = edges.select($"src".as("node"))
        .union(edges.select($"dst".as("node")))
        .distinct().where($"node" < 5)
      graft.operators.Graph.personalizedPageRank(edges, seeds, iterations = 3)
    }),

    // Sliding-window chunking (window 16, stride 8): the corpus → training
    // examples step; overlapping windows, truncated tail, in-row expansion.
    "q81_chunking" -> ((s, dir) => {
      TextAnalysis.chunkDocuments(Tables(s, dir, "documents"),
        "text", "doc_id", window = 16, stride = 8)
    }),

    // Sequence-packing bin assignment (256-token bins across 8 hash
    // shards): deterministic layout of documents into fixed-length
    // training sequences via per-shard running token sums.
    "q82_packing" -> ((s, dir) => {
      import s.implicits._
      val withTok = Tables(s, dir, "documents")
        .select($"doc_id", TextAnalysis.tokenCount($"text").as("n_tokens"))
      graft.operators.Sampling.packBins(withTok, "doc_id", "n_tokens",
        maxTokens = 256, shards = 8)
    }),

    // Nearest-neighbor image resize (decode → resample → exact histogram):
    // 16x16 synthetic PNGs downsampled to 8x8 on executors; integer
    // source-index arithmetic means the oracle recomputes the resized
    // pixels in closed form.
    "q83_image_resize" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents").select($"doc_id").as[Long]
      val pngs = ids
        .mapPartitions(it => it.map(id => (id, Multimodal.syntheticPng(id, 16, 16))))
        .toDF("doc_id", "png")
        .withColumn("src", lit("synthetic_png"))
      val assets = Multimodal.toAssets(pngs, "doc_id", "png", "image", "src")
      Multimodal.extractResizedFeatures(s, assets, 8, 8, Multimodal.ImageIoDecoder)
        .select($"asset_id", $"width", $"height", $"out_width", $"out_height",
          posexplode($"hist").as(Seq("bin", "cnt")))
    }),

    // Min-k winnowing fingerprints (MOSS-style): the 8 smallest shingle
    // hashes per document, in order — sketch-level similarity without
    // full texts.
    "q84_winnow" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.winnowFingerprint(Tables(s, dir, "documents"),
          "text", "doc_id", shingleK = 8, k = 8)
        .select($"doc_id", posexplode($"fp_hashes").as(Seq("rk", "fp_hash")))
    }),

    // End-to-end IVF with TRAINED centroids: 2 Lloyd rounds fit 8
    // centroids on the quantized corpus, corpus + queries assign to
    // cells, top-2 squared-L2 neighbors within the query's cell — the
    // full train → coarse-quantize → search lifecycle in one lazy plan.
    // Round-1 distances are exact integers; the Lloyd-updated centroids
    // are fractional means, so round-2 cross-engine agreement rests on
    // deterministic IEEE double ops with identical summation order
    // (sequential-fold dot on both sides — the q77 guarantee), NOT on
    // integer exactness. Don't reorder the distance expression.
    "q90_ivf_kmeans" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfKmeansTopK(emb.where($"vec_id" < 24), emb,
        "vec_id", "embedding", k = 2, nList = 8, iters = 2)
    }),

    // Farthest-point (k-means++-style) seeding, oracle-gated: 3 seeds
    // picked by the greedy max-min-distance walk (start = min id, ties by
    // id), one Lloyd mean update, final assignment. The oracle unrolls
    // the seed picks as scalar-subquery CTEs.
    "q112_kmeans_farthest" -> ((s, dir) => {
      import s.implicits._
      Similarity.kmeansAssign(Tables(s, dir, "embeddings"), "vec_id",
        "embedding", k = 3, iters = 2, seeding = "farthest")
    }),

    // Trained IVF with nProbe=2 — the recall knob on the TRAINED coarse
    // quantizer (q57/q97 cover it for the untrained variants): each query
    // searches its two nearest k-means cells; ranks re-order as closer
    // neighbors surface from the second cell.
    "q102_ivf_kmeans_probe2" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfKmeansTopK(emb.where($"vec_id" < 24), emb,
        "vec_id", "embedding", k = 2, nList = 8, iters = 2, nProbe = 2)
    }),

    // Product-quantization codes: 64-dim vectors → 4 subspaces × 16
    // centroids, each vector stored as 4 small ids (the 100-TB
    // vector-store compression). Exact integer distances on the
    // quantized grid → bit-reproducible codes.
    "q93_pq_codes" -> ((s, dir) => {
      import s.implicits._
      Similarity.pqEncode(Tables(s, dir, "embeddings"),
          "vec_id", "embedding", dims = 64, m = 4, k = 16)
        .select($"vec_id", posexplode($"pq_code").as(Seq("s", "code")))
    }),

    // PQ asymmetric-distance search: 8 full-precision queries scored
    // against the corpus's PQ codes alone via per-query distance tables —
    // the IVF-PQ search kernel. Integer-exact end to end.
    "q94_pq_adc" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Similarity.pqAdcTopK(emb.where($"vec_id" < 8), emb,
          "vec_id", "embedding", dims = 64, m = 4, k = 16, topK = 3)
        .select($"query_id", $"rk", $"neighbor_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    // SemDeDup: kmeans clusters (k=8, 2 Lloyd iterations, the q77
    // assignment) bound the pairwise cosine comparison; inside a cluster
    // any vector with a lower-id neighbor at cosine >= 0.42 is dropped.
    "q128_semdedup" -> ((s, dir) => {
      import s.implicits._
      Similarity.semDedup(Tables(s, dir, "embeddings"), "vec_id",
        "embedding", k = 8, iters = 2, threshold = 0.42)
    }),

    // Two-stage ANN: ADC shortlist (candK=10) then exact re-rank of the
    // candidates on the quantized vectors — raw vectors touched for
    // candidates only, never shuffled corpus-wide.
    "q127_pq_rerank" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Similarity.pqRerankTopK(emb.where($"vec_id" < 8), emb,
          "vec_id", "embedding", dims = 64, m = 4, k = 16,
          candK = 10, topK = 3)
        .select($"query_id", $"rk", $"neighbor_id",
          $"exact_d2".cast("long").as("exact_d2"))
    }),

    // Symmetric int8 embedding quantization — the 4x storage compression
    // of a serving stack, exact integer outputs.
    "q88_int8_quant" -> ((s, dir) => {
      import s.implicits._
      Tables(s, dir, "embeddings")
        .select($"vec_id", posexplode(Similarity.quantizeInt8($"embedding"))
          .as(Seq("pos", "q8")))
    }),

    // Matryoshka truncation to 16 dims + renormalization (staged norm) —
    // the cheap-first-pass retrieval representation; bit-exact doubles.
    "q89_matryoshka" -> ((s, dir) => {
      import s.implicits._
      Similarity.truncateRenormed(Tables(s, dir, "embeddings"),
          "vec_id", "embedding", dims = 16)
        .select($"vec_id", posexplode($"embedding").as(Seq("pos", "v")))
    }),

    // Combined IVF-PQ: corpus coarse-assigned to 8 cells and stored as
    // 4 PQ codes per vector; queries probe their own cell and rank by
    // asymmetric distance from broadcast lookup tables — the
    // billion-scale ANN search layout, integer-exact end to end.
    "q96_ivfpq" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb.where($"vec_id" < 8), emb, "vec_id",
          "embedding", dims = 64, m = 4, k = 16, nList = 8, topK = 3)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    // IVF-PQ with nProbe=2: each query's candidate set widens to its two
    // nearest cells — the recall knob of a production IVF index; ranks
    // re-order as better neighbors surface from the second cell.
    "q97_ivfpq_probe2" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb.where($"vec_id" < 8), emb, "vec_id",
          "embedding", dims = 64, m = 4, k = 16, nList = 8, topK = 3,
          nProbe = 2)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    // Trained PQ: one Lloyd mean-update per subspace codebook before
    // encoding — classic trained product quantization; all 4 subspaces
    // train in one grouped plan.
    "q99_pq_trained" -> ((s, dir) => {
      import s.implicits._
      Similarity.pqEncode(Tables(s, dir, "embeddings"), "vec_id",
          "embedding", dims = 64, m = 4, k = 16, trainUpdates = 1)
        .select($"vec_id", posexplode($"pq_code").as(Seq("s", "code")))
    }),

    // Residual IVF-PQ: codes quantize v − centroid(cell) — the classic
    // refinement whose smaller residual spread gives finer codes for the
    // same k. Residuals of integers stay integers, so the oracle is
    // still exact.
    "q98_ivfpq_residual" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb.where($"vec_id" < 8), emb, "vec_id",
          "embedding", dims = 64, m = 4, k = 16, nList = 8, topK = 3,
          residual = true)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    // Trained IVF-PQ: one Lloyd refinement of the PQ codebook before
    // encoding, inside the full cell-probed search — codes AND distance
    // tables share the single trained codebook.
    "q103_ivfpq_trained" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      // trained distances are fractional (Lloyd means) → floor on BOTH
      // engines; DuckDB's double→BIGINT cast rounds, Spark's truncates
      Similarity.ivfPqTopK(emb.where($"vec_id" < 8), emb, "vec_id",
          "embedding", dims = 64, m = 4, k = 16, nList = 8, topK = 3,
          trainUpdates = 1)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          floor($"adc_d2").cast("long").as("adc_d2"))
    }),

    // Residual + trained combined: the codebook Lloyd-refines on the
    // RESIDUAL subvectors (classic trained residual IVF-PQ) — closes the
    // last gap in the PQ matrix (raw/residual x untrained/trained).
    "q104_ivfpq_residual_trained" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfPqTopK(emb.where($"vec_id" < 8), emb, "vec_id",
          "embedding", dims = 64, m = 4, k = 16, nList = 8, topK = 3,
          residual = true, trainUpdates = 1)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          floor($"adc_d2").cast("long").as("adc_d2"))
    }),

    // Persisted IVF-PQ index lifecycle: build the (centroids, codebook,
    // codes) frames, write them to parquet (codes partitioned by cell,
    // manifest alongside), reload, and search WITHOUT touching the corpus
    // again — must equal q96's inline search bit-for-bit (same oracle).
    // The whole index lifecycle in one gate: codebook-only build →
    // STREAMING codes ingest (exactly-once file sink) → compact to
    // batch-managed (stream→batch handoff through the sink log) →
    // DELETE a tombstone batch → search. Must equal q121 (batch-built
    // then deleted): streamed codes ≡ batch codes, and compaction
    // preserves them exactly.
    "q122_index_compact" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val h = s"v1_${QueryModule.cacheKey(dir)}"
      val idx = s"/tmp/graft_annidx_cmp_$h"
      val src = s"/tmp/graft_annidx_cmpsrc_$h"
      graft.sources.BucketFs.deleteRecursive(idx)
      graft.sources.BucketFs.deleteRecursive(src)
      graft.sources.AnnIndex.saveIvfPq(emb, "vec_id", "embedding", idx,
        dims = 64, m = 4, k = 16, nList = 8, includeCodes = false)
      emb.write.parquet(src)
      val q = graft.sources.AnnIndex.streamingCodesWriter(s, idx, src,
        emb.schema, "embedding", s"$idx/_ckpt").start()
      q.awaitTermination()
      graft.sources.AnnIndex.compactCodes(s, idx)
      graft.sources.AnnIndex.loadIvfPq(s, idx)
        .delete(DeletedIds)
        .search(emb.where($"vec_id" < 8), "embedding", topK = 3)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    // Index DELETE: build, tombstone a batch of ids (five of them are
    // current top-3 winners, so results MUST change), search — equals
    // the inline search over the corpus minus the deleted ids against a
    // frozen codebook. Only the affected cell directories rewrite.
    "q121_index_delete" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      // fresh build every run: delete mutates the index in place
      val idx = s"/tmp/graft_annidx_del_v2_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(idx)
      graft.sources.AnnIndex.saveIvfPq(emb, "vec_id", "embedding", idx,
        dims = 64, m = 4, k = 16, nList = 8)
      graft.sources.AnnIndex.loadIvfPq(s, idx)
        .delete(DeletedIds)
        .search(emb.where($"vec_id" < 8), "embedding", topK = 3)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    // TIME-TRAVEL read: build the index on the first half of the corpus,
    // append the second half as generation 1, then search AS-OF
    // generation 1 — the pre-append state. Must equal the inline search
    // with candidates restricted to the first half: appends never retrain
    // (centroids/codebook frozen at save), so historical generations are
    // exact, and the gen filter is a pruned partition-directory predicate.
    "q160_index_time_travel" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      // fresh build every run: the gate exercises the append lifecycle
      val idx = s"/tmp/graft_annidx_tt_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(idx)
      graft.sources.AnnIndex.saveIvfPq(emb.where($"vec_id" < 250),
        "vec_id", "embedding", idx, dims = 64, m = 4, k = 16, nList = 8)
      graft.sources.AnnIndex.loadIvfPq(s, idx)
        .append(emb.where($"vec_id" >= 250), "embedding")
      graft.sources.AnnIndex.loadIvfPq(s, idx, asOfGen = 1)
        .search(emb.where($"vec_id" < 8), "embedding", topK = 3)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    // ANN-index COMPACTION: save half, append half (two generations),
    // fold into one replacement generation, search — must equal the
    // plain full-corpus persisted search (q100's oracle).
    "q168_ann_index_compact" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val idx = s"/tmp/graft_annidx_gcmp_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(idx)
      graft.sources.AnnIndex.saveIvfPq(emb.where($"vec_id" < 250),
        "vec_id", "embedding", idx, dims = 64, m = 4, k = 16, nList = 8)
      graft.sources.AnnIndex.loadIvfPq(s, idx)
        .append(emb.where($"vec_id" >= 250), "embedding")
        .compactGens()
        .search(emb.where($"vec_id" < 8), "embedding", topK = 3)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    "q100_pq_persist" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      // v-token: bump when the index layout/params change (stale /tmp cache)
      val idx = s"/tmp/graft_annidx_v2_${QueryModule.cacheKey(dir)}"
      graft.sources.AnnIndex.saveIvfPq(emb, "vec_id", "embedding", idx,
        dims = 64, m = 4, k = 16, nList = 8)
      graft.sources.AnnIndex.loadIvfPq(s, idx)
        .search(emb.where($"vec_id" < 8), "embedding", topK = 3)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    // STREAMING query search: the converse of q113's streaming ingest —
    // the index is STATIC on disk and the QUERIES arrive as a file
    // stream, searched per micro-batch in foreachBatch against the
    // persisted index (loaded in the batch's own session; probed-cell
    // pruning applies per batch) with results appended to a parquet
    // sink. Batching must not change answers: the sink equals the q100
    // batch search bit-for-bit (same oracle). The online-serving shape:
    // queries flow, the index stands still.
    "q190_stream_ann_search" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val idx = s"/tmp/graft_annidx_v2_${QueryModule.cacheKey(dir)}"
      graft.sources.AnnIndex.saveIvfPq(emb, "vec_id", "embedding", idx,
        dims = 64, m = 4, k = 16, nList = 8)
      val h = s"v1_${QueryModule.cacheKey(dir)}"
      val base = s"/tmp/graft_annq_$h"
      val qsrc = s"$base/qsrc"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
      Seq(sink, ckpt).foreach(graft.sources.BucketFs.deleteRecursive)
      if (!graft.sources.BucketFs.exists(s"$base/_staged_ok")) {
        graft.sources.BucketFs.deleteRecursive(qsrc)
        emb.where($"vec_id" < 8).repartition(4)
          .write.mode("overwrite").parquet(qsrc)
        graft.sources.BucketFs.writeString(s"$base/_staged_ok", "ok\n")
      }
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      // AQE off in the micro-batch session — same rationale as q147 (the
      // per-batch search is query-batch-bounded; the index side prunes by
      // cell and broadcasts the query side, neither AQE-chosen)
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      val schema = s.read.parquet(qsrc).schema
      val stream = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(qsrc)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            graft.sources.AnnIndex.loadIvfPq(batch.sparkSession, idx)
              .search(batch, "embedding", topK = 3)
              .write.mode("append").parquet(sink)
          }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(sink)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    // STREAMING codes ingest: a codebook-only index (quantizers trained
    // batch-side, no codes) + the whole corpus streamed through the
    // map-only encoder into the exactly-once file sink, then a search on
    // the reloaded index. Must equal the inline ivfPqTopK search (q96's
    // oracle): the in-row argmin against collected codebook literals
    // picks the same winners as the batch packed argmin.
    "q113_stream_index_ingest" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val h = s"v1_${QueryModule.cacheKey(dir)}"
      val idx = s"/tmp/graft_annidx_stream_$h"
      val src = s"/tmp/graft_annidx_ssrc_$h"
      // fresh lifecycle per run: a reused checkpoint would no-op the
      // stream and an old sink would double-count
      graft.sources.BucketFs.deleteRecursive(idx)
      graft.sources.BucketFs.deleteRecursive(src)
      graft.sources.AnnIndex.saveIvfPq(emb, "vec_id", "embedding", idx,
        dims = 64, m = 4, k = 16, nList = 8, includeCodes = false)
      emb.write.parquet(src)
      val q = graft.sources.AnnIndex.streamingCodesWriter(s, idx, src,
        emb.schema, "embedding", s"$idx/_ckpt").start()
      q.awaitTermination()
      graft.sources.AnnIndex.loadIvfPq(s, idx)
        .search(emb.where($"vec_id" < 8), "embedding", topK = 3)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    // Streamed RESIDUAL codes: same lifecycle as q113 with the residual
    // subtraction riding the in-row argmin struct — must equal q98's
    // inline residual search.
    "q114_stream_residual_ingest" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val h = s"v1_${QueryModule.cacheKey(dir)}"
      val idx = s"/tmp/graft_annidx_rstream_$h"
      val src = s"/tmp/graft_annidx_rssrc_$h"
      graft.sources.BucketFs.deleteRecursive(idx)
      graft.sources.BucketFs.deleteRecursive(src)
      graft.sources.AnnIndex.saveIvfPq(emb, "vec_id", "embedding", idx,
        dims = 64, m = 4, k = 16, nList = 8, residual = true,
        includeCodes = false)
      emb.write.parquet(src)
      val q = graft.sources.AnnIndex.streamingCodesWriter(s, idx, src,
        emb.schema, "embedding", s"$idx/_ckpt").start()
      q.awaitTermination()
      graft.sources.AnnIndex.loadIvfPq(s, idx)
        .search(emb.where($"vec_id" < 8), "embedding", topK = 3)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    // Residual-index persistence: same lifecycle as q100 but the codebook
    // quantizes v − c(cell) — save, reload, search, match q98's inline
    // residual results (same oracle).
    "q109_pq_persist_residual" -> ((s, dir) => {
      import s.implicits._
      val emb = Tables(s, dir, "embeddings")
      val idx = s"/tmp/graft_annidx_res_v2_${QueryModule.cacheKey(dir)}"
      graft.sources.AnnIndex.saveIvfPq(emb, "vec_id", "embedding", idx,
        dims = 64, m = 4, k = 16, nList = 8, residual = true)
      graft.sources.AnnIndex.loadIvfPq(s, idx)
        .search(emb.where($"vec_id" < 8), "embedding", topK = 3)
        .select($"query_id", $"rk", $"neighbor_id", $"centroid_id",
          $"adc_d2".cast("long").as("adc_d2"))
    }),

    // Sketch-based pairwise Jaccard: q34's candidate pairs verified from
    // 8-hash winnow sketches alone (min-k union estimator) — near-dup
    // verification without touching full texts.
    "q85_sketch_jaccard" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val sketches = TextAnalysis.winnowFingerprint(docs, "text", "doc_id",
        shingleK = 3, k = 8)
      val bySource = docs.select($"source".as("src"), $"doc_id")
      val pairs = bySource.toDF("src", "a")
        .join(bySource.toDF("src", "b"), Seq("src"))
        .where($"a" < $"b" && ($"b" - $"a") <= 40)
        .select("a", "b")
      TextAnalysis.sketchJaccardCounts(sketches, pairs, "doc_id", k = 8)
    }),

    // TF-IDF top-3 terms per document (rational IDF — rank-equivalent to
    // the log form, bit-portable).
    "q86_tfidf" -> ((s, dir) => {
      TextAnalysis.tfidfTopTerms(Tables(s, dir, "documents"),
        "text", "doc_id", topK = 3)
    }),

    // Adaptive quality filter: exact rank-quantile threshold (p25 of token
    // count, computed from a value histogram — no global row sort) applied
    // back to the corpus.
    "q78_quantile_filter" -> ((s, dir) => {
      import s.implicits._
      val withTok = Tables(s, dir, "documents")
        .select($"doc_id", TextAnalysis.tokenCount($"text").as("n_tokens"))
      val thr = graft.operators.Sampling.quantileThreshold(withTok, "n_tokens", 0.25)
      withTok.crossJoin(broadcast(thr))
        .where($"n_tokens" >= $"threshold")
        .select($"doc_id", $"n_tokens", $"threshold")
    }),

    // Per-group exact quantiles (q78's threshold, per language): the
    // value histogram collapses the corpus, and the cumulative window
    // partitions BY GROUP — no single-partition stage anywhere.
    "q123_group_quantile" -> ((s, dir) => {
      import s.implicits._
      val withTok = Tables(s, dir, "documents")
        .select($"lang", TextAnalysis.tokenCount($"text").as("n_tokens"))
      graft.operators.Sampling.quantileThresholdBy(withTok, "lang", "n_tokens", 0.5)
    }),

    // Winnow-sampled span-duplication coverage: q126's statistic at
    // ~2/(w+1) of its shuffle cost — only winnowing-selected windows
    // (local rightmost-argmin over w=8 consecutive span hashes) cross
    // the shuffle. Self-synchronizing selection: shared runs >= spanLen
    // + w - 1 select identical spans in every document containing them.
    "q142_winnowed_spans" -> ((s, dir) =>
      Dedup.winnowedSpanStats(Tables(s, dir, "documents"), "text", "doc_id",
        spanLen = 24, w = 8, minDocs = 2)),

    // Batched BPE training: each round greedily accepts up to 4 symbol-
    // disjoint pairs from one ranked count and applies them in one pass —
    // 8 merges in 2 rounds instead of 8 (the job-count collapse a 32k-
    // merge tokenizer needs). batch=4 over merges=8 deliberately spans
    // TWO rounds so the oracle also pins the recount-and-continue seam.
    "q141_bpe_batched" -> ((s, dir) =>
      TextAnalysis.bpeTrainBatched(Tables(s, dir, "documents"), "text",
        merges = 8, batch = 4)),

    // Persisted dedup-index lifecycle: build a MinHash/LSH index over the
    // archived corpus (doc_id % 4 != 0) ONCE, then find each new-batch
    // doc's near-dup candidates in the corpus from stored band postings +
    // signatures alone — corpus text untouched at query time. Uncapped to
    // match the all-pairs oracle (the cap degrade is spec-tested).
    "q138_dedup_index" -> ((s, dir) => {
      import s.implicits._
      val h = s"v2_${QueryModule.cacheKey(dir)}" // v2: generational layout
      val idxDir = s"/tmp/graft_dedupidx_$h"
      val docs = Tables(s, dir, "documents")
      if (!graft.sources.BucketFs.exists(s"$idxDir/_staged_ok")) {
        graft.sources.BucketFs.deleteRecursive(idxDir)
        graft.sources.DedupIndex.save(docs.where($"doc_id" % 4 =!= 0),
          "text", "doc_id", idxDir, shingleK = 8, numHashes = 8, bands = 4)
        graft.sources.BucketFs.writeString(s"$idxDir/_staged_ok", "ok\n")
      }
      graft.sources.DedupIndex.load(s, idxDir)
        .candidates(docs.where($"doc_id" % 4 === 0), "text",
          maxBucketSize = Int.MaxValue)
    }),

    // Incremental variant: the same corpus arrives as a base save plus two
    // appends (batch-sized band/signature appends + a bucket-count-sized
    // stats merge — nothing corpus-sized rescanned). Must answer exactly
    // like q138's one-shot build; the oracle recomputes from scratch.
    "q139_dedup_index_append" -> ((s, dir) => {
      import s.implicits._
      val h = s"v2_${QueryModule.cacheKey(dir)}" // v2: generational layout
      val idxDir = s"/tmp/graft_dedupidx_app_$h"
      val docs = Tables(s, dir, "documents")
      if (!graft.sources.BucketFs.exists(s"$idxDir/_staged_ok")) {
        graft.sources.BucketFs.deleteRecursive(idxDir)
        graft.sources.DedupIndex.save(docs.where($"doc_id" % 4 === 1),
          "text", "doc_id", idxDir, shingleK = 8, numHashes = 8, bands = 4)
        graft.sources.DedupIndex.load(s, idxDir)
          .append(docs.where($"doc_id" % 4 === 2), "text")
          .append(docs.where($"doc_id" % 4 === 3), "text")
        graft.sources.BucketFs.writeString(s"$idxDir/_staged_ok", "ok\n")
      }
      graft.sources.DedupIndex.load(s, idxDir)
        .candidates(docs.where($"doc_id" % 4 === 0), "text",
          maxBucketSize = Int.MaxValue)
    }),

    // Text-index COMPACTION: build + append (two generations), fold them
    // into one replacement generation, search — must still equal the
    // full-corpus from-scratch oracle. The merged copy commits by one
    // atomic manifest rename (no unreadable window) and the old
    // generations are vacuumed after the commit.
    "q163_text_index_compact" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val idx = s"/tmp/graft_textidx_cmp_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(idx)
      graft.sources.TextIndex.save(docs.where($"doc_id" % 2 === 0),
        "text", "doc_id", idx, nBuckets = 16)
      graft.sources.TextIndex.load(s, idx)
        .append(docs.where($"doc_id" % 2 === 1), "text")
        .compact()
        .search(Seq("table", "scan", "merge"), topK = 10)
    }),

    // Dedup-index COMPACTION: q139's lineage (save + two appends) folded
    // into one generation; candidates must be unchanged.
    "q164_dedup_index_compact" -> ((s, dir) => {
      import s.implicits._
      val h = s"v1_${QueryModule.cacheKey(dir)}"
      val idxDir = s"/tmp/graft_dedupidx_cmp_$h"
      val docs = Tables(s, dir, "documents")
      if (!graft.sources.BucketFs.exists(s"$idxDir/_staged_ok")) {
        graft.sources.BucketFs.deleteRecursive(idxDir)
        graft.sources.DedupIndex.save(docs.where($"doc_id" % 4 === 1),
          "text", "doc_id", idxDir, shingleK = 8, numHashes = 8, bands = 4)
        graft.sources.DedupIndex.load(s, idxDir)
          .append(docs.where($"doc_id" % 4 === 2), "text")
          .append(docs.where($"doc_id" % 4 === 3), "text")
          .compact()
        graft.sources.BucketFs.writeString(s"$idxDir/_staged_ok", "ok\n")
      }
      graft.sources.DedupIndex.load(s, idxDir)
        .candidates(docs.where($"doc_id" % 4 === 0), "text",
          maxBucketSize = Int.MaxValue)
    }),

    // TIME-TRAVEL read on the dedup index: same staged lineage as q139
    // (save %4=1, append %4=2, append %4=3), but candidates run against
    // the index AS-OF generation 1 — only the save batch is corpus, the
    // two appended generations are pruned out at the directory level.
    "q162_dedup_index_time_travel" -> ((s, dir) => {
      import s.implicits._
      val h = s"v2_${QueryModule.cacheKey(dir)}" // shares q139's staging
      val idxDir = s"/tmp/graft_dedupidx_app_$h"
      val docs = Tables(s, dir, "documents")
      if (!graft.sources.BucketFs.exists(s"$idxDir/_staged_ok")) {
        graft.sources.BucketFs.deleteRecursive(idxDir)
        graft.sources.DedupIndex.save(docs.where($"doc_id" % 4 === 1),
          "text", "doc_id", idxDir, shingleK = 8, numHashes = 8, bands = 4)
        graft.sources.DedupIndex.load(s, idxDir)
          .append(docs.where($"doc_id" % 4 === 2), "text")
          .append(docs.where($"doc_id" % 4 === 3), "text")
        graft.sources.BucketFs.writeString(s"$idxDir/_staged_ok", "ok\n")
      }
      graft.sources.DedupIndex.load(s, idxDir, asOfGen = 1)
        .candidates(docs.where($"doc_id" % 4 === 0), "text",
          maxBucketSize = Int.MaxValue)
    }),

    // Streaming deduplicated ingest — the production corpus-dedup shape
    // end-to-end: odd-id docs are the archived corpus (persisted MinHash
    // index); three mtime-ordered files (doc_id % 8 = 0 / 2 / 4) stream
    // through foreachBatch, each batch keeping only docs that near-dup
    // neither the archive nor any EARLIER KEPT batch; kept docs grow the
    // index between batches. Uncapped to match the all-pairs oracle,
    // which replays the same three-batch sequence in SQL.
    "q147_stream_dedup_ingest" -> ((s, dir) => {
      import s.implicits._
      val base = s"/tmp/graft_sdedup_v1_${QueryModule.cacheKey(dir)}"
      val inDir = s"$base/in"
      if (!graft.sources.BucketFs.exists(s"$inDir/_staged_ok")) {
        graft.sources.BucketFs.deleteRecursive(inDir)
        val docs = Tables(s, dir, "documents")
        graft.streaming.StreamingOps.stageOrderedBatches(
          Seq(0L, 2L, 4L).map(m => docs.where($"doc_id" % 8 === m)), inDir)
        graft.sources.BucketFs.writeString(s"$inDir/_staged_ok", "ok\n")
      }
      // the INGEST mutates the index, so index/sink/checkpoint are fresh
      // every invocation; only the staged input is cached
      val idxDir = s"$base/idx"; val outDir = s"$base/out"
      val ckpt = s"$base/ckpt"
      Seq(idxDir, outDir, ckpt).foreach(graft.sources.BucketFs.deleteRecursive)
      // 4 shuffle partitions: ~18 tiny sequential jobs (3 batches × the
      // dedup/sink/append/stats chain) — per-job overhead dominates at
      // gate scale, so fewer tasks beats more parallelism here
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      // AQE off in the micro-batch session: Spark disables AQE inside
      // streaming plans for latency; foreachBatch bodies re-enable it and
      // every per-batch action then submits one job PER QUERY STAGE. A
      // micro-batch is small by construction (trigger-bounded), so AQE's
      // runtime re-planning buys nothing here and its per-stage job
      // rounds are pure driver latency (r21 JobProfile: 90 jobs / 3.5 s
      // of inter-job gap at ~39 ms each on this gate). Batch-side index
      // scans keep their explicit broadcast hints, so no join strategy
      // depends on AQE. Scale-independent: the batch stays micro at any
      // corpus size — the INDEX side grows, and its joins are
      // hint-pinned, never AQE-chosen.
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      val docs = Tables(ss, dir, "documents")
      graft.sources.DedupIndex.save(docs.where($"doc_id" % 2 === 1),
        "text", "doc_id", idxDir, shingleK = 8, numHashes = 8, bands = 4)
      val schema = ss.read.parquet(s"$inDir/b0.parquet").schema
      val q = graft.streaming.StreamingOps.dedupIngest(ss, inDir, schema,
          idxDir, outDir, ckpt, "text", minMatch = 6,
          maxBucketSize = Int.MaxValue, maxFilesPerTrigger = Some(1))
        .start()
      q.awaitTermination()
      s.read.parquet(outDir)
        .select(col("batch").cast("long").as("batch"), $"doc_id")
    }),

    // Streaming BM25 index growth: a quarter of the corpus is the saved
    // base index, the other three quarters stream in as mtime-ordered
    // micro-batches appending generation-committed postings — the final
    // search must equal q145's from-scratch full-corpus build exactly
    // (same oracle).
    "q148_stream_text_ingest" -> ((s, dir) => {
      import s.implicits._
      val base = s"/tmp/graft_stext_v1_${QueryModule.cacheKey(dir)}"
      val inDir = s"$base/in"
      if (!graft.sources.BucketFs.exists(s"$inDir/_staged_ok")) {
        graft.sources.BucketFs.deleteRecursive(inDir)
        val docs = Tables(s, dir, "documents")
        graft.streaming.StreamingOps.stageOrderedBatches(
          Seq(1L, 2L, 3L).map(m => docs.where($"doc_id" % 4 === m)), inDir)
        graft.sources.BucketFs.writeString(s"$inDir/_staged_ok", "ok\n")
      }
      // the ingest mutates the index: index + checkpoint fresh every run
      val idxDir = s"$base/idx"; val ckpt = s"$base/ckpt"
      Seq(idxDir, ckpt).foreach(graft.sources.BucketFs.deleteRecursive)
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      // AQE off in the micro-batch session — same rationale as q147 (the
      // per-batch append chain is trigger-bounded; AQE's per-stage job
      // rounds are pure driver latency at micro-batch size)
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      val docs = Tables(ss, dir, "documents")
      graft.sources.TextIndex.save(docs.where($"doc_id" % 4 === 0),
        "text", "doc_id", idxDir, nBuckets = 16)
      val schema = ss.read.parquet(s"$inDir/b0.parquet").schema
      val q = graft.streaming.StreamingOps.textIndexIngest(ss, inDir, schema,
          idxDir, ckpt, "text", maxFilesPerTrigger = Some(1))
        .start()
      q.awaitTermination()
      graft.sources.TextIndex.load(s, idxDir)
        .search(Seq("table", "scan", "merge"), topK = 10)
    }),

    // DSIR importance resampling (Xie et al. 2023): hashed uni+bigram
    // bucket weights estimated from a target slice (lang=en) vs the raw
    // corpus, per-doc quantized log-importance scores, top-64 selection.
    // Weights are B=512 rows (broadcast); the corpus never shuffles —
    // one explode + broadcast join + hash agg, then a TakeOrdered.
    "q149_dsir_resample" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      // dsirTop64: TakeOrdered top-64 FIRST (distributed partial sort,
      // no global single-partition window over the corpus), then rank
      dsirTop64(docs, TextAnalysis.dsirBucketWeights(
        raw = docs, target = docs.where($"lang" === "en"), "text",
        buckets = 512))
    }),

    // Model-based quality filtering (the CCNet/GPT-3-style classifier
    // pass): train a multinomial Naive Bayes on a 50% hash split with
    // lang=en as the "high quality" label, score EVERY doc with the
    // broadcast vocab weights, report prediction + agreement with truth.
    "q150_nb_quality" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val model = trainNbQuality(s, dir)
      TextAnalysis.naiveBayesScore(docs, "doc_id", "text", model)
        .join(docs.select($"doc_id", ($"lang" === "en").as("__truth")),
          Seq("doc_id"))
        .select($"doc_id", $"n_tokens", $"score_q4", $"pred_pos",
          ($"pred_pos" === $"__truth").cast("int").as("hit"))
    }),

    // JSONL ingestion with corrupt-record quarantine: the corpus staged
    // as line-delimited JSON with a deterministic 1-in-25 slice of lines
    // truncated (invalid JSON), read back through Jsonl.read — per-source
    // stats over the parsed rows plus a '__corrupt' quarantine row. The
    // oracle recomputes both from the parquet table and the same md5
    // corruption rule, so the gate proves parse + quarantine fidelity.
    // TSV ingestion with quarantine — the raw-corpus entry point for
    // tab-separated dumps, same contract as JSONL (q151): explicit
    // schema, codegen'd from_csv, malformed lines kept whole in the
    // quarantine column. The corruption rule (trailing non-digit on the
    // final Long field) is an unambiguous parse failure, so the stats
    // oracle is q151's verbatim.
    "q173_tsv_ingest" -> ((s, dir) => {
      val parsed = graft.sources.Csv.read(s, s"${stagedTsv(s, dir)}/data",
        jsonlDocSchema)
      jsonlStats(parsed)
    }),

    // ORC interop: the documents table round-tripped through a
    // lang-partitioned ORC dataset and queried with a partition filter +
    // projection. Spark's ORC source shares Parquet's Catalyst
    // integration, so partition pruning and column pushdown carry over
    // — OrcInteropSpec pins that plan shape; this gate pins values.
    "q178_orc_interop" -> ((s, dir) => {
      import s.implicits._
      s.read.orc(s"${stagedOrc(s, dir)}/data")
        .where($"lang" === "en")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars_sum"))
    }),

    // HTML → text extraction: each doc wrapped in a deterministic page
    // (script/style/comment blocks, attribute-bearing tags, entities —
    // incl. an unknown &iacute; that must survive literally), stripped
    // back by the codegen'd regexp/replace chain. The oracle builds the
    // identical page in SQL and strips it with the transcribed chain
    // (TextAnalysis.stripHtmlSql), pinning Java/RE2 regex agreement.
    "q181_html_strip" -> ((s, dir) => {
      import s.implicits._
      val html = concat(
        lit("<html><head><title>Doc &amp; Co</title><style>p { color: #fff }</style>"),
        lit("<script type=\"text/js\">if (a < b && c > 1) { run() }</script></head>"),
        lit("<body><!-- doc "), $"doc_id", lit(" --><h1>T&iacute;tle "), $"doc_id",
        lit("</h1><p class=\"main\">"), coalesce($"text", lit("")),
        lit("</p><br/>&nbsp;&lt;end&gt;</body></html>"))
      Tables(s, dir, "documents")
        .select($"doc_id", TextAnalysis.stripHtml(html).as("clean"))
        .withColumn("n_clean", length($"clean").cast("long"))
    }),

    // Bounded-round label propagation over the bipartite customer↔
    // supplier graph (disjoint node ids via 2c / 2s+1): after 2 rounds
    // each node holds the min id within distance 2 — community seeds,
    // oracle-unrollable (vs connectedComponents' pointer-jump fixpoint,
    // q45). One edge⋈labels join + min-agg per round, materialized.
    "q199_label_propagation" -> ((s, dir) => {
      import s.implicits._
      val edges = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
        .join(Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey"),
          $"o_orderkey" === $"l_orderkey")
        .select(($"o_custkey".cast("long") * 2).as("src"),
          ($"l_suppkey".cast("long") * 2 + 1).as("dst"))
        .distinct()
      graft.operators.Graph.labelPropagation(edges, rounds = 2)
    }),

    // Weighted PageRank over the same trade graph, edges weighted by
    // total traded cents: contributions split by out-weight SHARE
    // (pre-normalized integer shares keep every product ≤ scale·10^4,
    // inside 64 bits). Same iteration scaffold as q177; oracle unrolls
    // the identical integer arithmetic.
    "q188_pagerank_weighted" -> ((s, dir) => {
      import s.implicits._
      val edges = Tables(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_extendedprice")
        .join(Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .join(Tables(s, dir, "customer").select($"c_custkey", $"c_nationkey"),
          $"o_custkey" === $"c_custkey")
        .join(Tables(s, dir, "supplier").select($"s_suppkey", $"s_nationkey"),
          $"l_suppkey" === $"s_suppkey")
        .groupBy($"c_nationkey".cast("long").as("src"),
          $"s_nationkey".cast("long").as("dst"))
        .agg(sum(round($"l_extendedprice" * 100).cast("long")).as("w"))
      graft.operators.Graph.pageRankWeighted(edges, iterations = 3)
    }),

    // Dominant principal direction (top-1 PCA) of the quantized embedding
    // second-moment matrix by power iteration: the only corpus-sized work
    // is ONE explode + hash-agg pass building the dim² matrix (map-side
    // combined); the bounded dim×dim result is collected and iterated on
    // the driver (kmeansFitCollected's contract). Exact integer
    // arithmetic round for round — the oracle unrolls the same 3
    // iterations in SQL, truncating division matching `//`.
    "q186_dominant_direction" -> ((s, dir) =>
      graft.operators.Similarity.dominantDirection(
        Tables(s, dir, "embeddings"), "embedding", "vec_id")),

    // Principal-axis extremes: each vector's exact-integer projection
    // onto the q186 dominant direction, top-10 by |score| — the
    // axis-extremal outlier/drift surfacing step that PCA-1 exists for.
    // Direction broadcasts (dim rows); scoring is one exploded-join +
    // hash agg pass.
    "q200_pca_scores" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Similarity.principalScores(
          Tables(s, dir, "embeddings"), "embedding", "vec_id")
        .orderBy(abs($"score").desc, $"vec_id".asc).limit(10)
    }),

    // SentencePiece-style unigram segmentation: corpus-derived piece
    // vocabulary (all single chars + top bigrams/trigrams, quantized
    // -log2-frequency integer costs) applied to every distinct word by
    // Viterbi DP. (cost, n_pieces) are minimized lexicographically via a
    // fused integer objective, so the answer is unique — no tie-break
    // convention to drift between engines. Broadcast vocab + row-local
    // DP: the tokenizer-application shape at 100 TB. The oracle unrolls
    // the DP over the 12 word positions in pure SQL.
    "q183_unigram_segment" -> ((s, dir) =>
      TextAnalysis.unigramSegmentWords(Tables(s, dir, "documents"), "text")),

    // Audio spectral features: REAL WAV decode → quantized-table DFT
    // (Goertzel-style integer re/im/energy per analysis bin). The trig
    // table is computed once on the driver (round(cos·1024)) and shipped
    // into BOTH the executor closure and the oracle as literals, so the
    // whole spectrum is exact integer math — no libm in the distributed
    // path, bit-identical across engines.
    "q182_audio_spectrum" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents").select($"doc_id").as[Long]
      val wavs = ids
        .mapPartitions(it => it.map(id => (id, Multimodal.syntheticWav(id, 64))))
        .toDF("doc_id", "wav")
        .withColumn("src", lit("synthetic_wav"))
      val assets = Multimodal.toAssets(wavs, "doc_id", "wav", "audio", "src")
      Multimodal.audioSpectrum(s, assets, freqs = Seq(1, 3, 5, 7), n = 64)
    }),

    // Perceptual image dedup: REAL PNG decode → dHash (2×2 block means →
    // 64 comparison bits as four 16-bit bands) → pigeonhole band join →
    // exact hamming verify. The fixture (syntheticPngGrouped) plants
    // pixel-identical groups plus one-bit and many-bit perturbations, and
    // its closed form lets the oracle recompute every pixel, block, bit,
    // band, and pair with no decoder — the q49 construction, for
    // perceptual hashing. Candidates come only from band-equality joins
    // (never an all-pairs product), the 100 TB image-dedup shape.
    "q179_image_dhash" -> ((s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents").select($"doc_id")
        .where($"doc_id" % 7 === 0).as[Long]
      val pngs = ids
        .mapPartitions(it => it.map(id =>
          (id, Multimodal.syntheticPngGrouped(id, 18, 16))))
        .toDF("doc_id", "png")
        .withColumn("src", lit("synthetic_png"))
      val assets = Multimodal.toAssets(pngs, "doc_id", "png", "image", "src")
      val hashes = Multimodal.imageDHash(s, assets)
      Multimodal.dHashNearDupPairs(hashes, maxDist = 3)
    }),

    "q151_jsonl_ingest" -> ((s, dir) => {
      val parsed = graft.sources.Jsonl.read(s, s"${stagedJsonl(s, dir)}/data",
        jsonlDocSchema)
      jsonlStats(parsed)
    }),

    // Streaming JSONL ingestion: the same staged corpus tailed as a
    // file-source stream (from_json parse + quarantine per micro-batch,
    // parquet sink, AvailableNow), then the q151 aggregation over the
    // sink — batch and streaming ingestion must account every valid and
    // quarantined line identically (same oracle).
    // streamed TSV micro-batch ingest must account identically to the
    // batch read (q173) — same stats oracle
    "q174_stream_tsv_ingest" -> ((s, dir) => {
      val stage = stagedTsv(s, dir)
      val base = s"/tmp/graft_stsv_v1_${QueryModule.cacheKey(dir)}"
      val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
      Seq(sink, ckpt).foreach(graft.sources.BucketFs.deleteRecursive)
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      // AQE off in the micro-batch session — q147's rationale (trigger-
      // bounded batches; AQE's per-stage job rounds are pure driver
      // latency at micro-batch size)
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      val q = graft.sources.Csv.readStream(ss, s"$stage/data",
          jsonlDocSchema, maxFilesPerTrigger = Some(8))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      jsonlStats(s.read.parquet(sink))
    }),

    "q152_stream_jsonl_ingest" -> ((s, dir) => {
      val stage = stagedJsonl(s, dir)
      val base = s"/tmp/graft_sjsonl_v1_${QueryModule.cacheKey(dir)}"
      val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
      Seq(sink, ckpt).foreach(graft.sources.BucketFs.deleteRecursive)
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      // AQE off in the micro-batch session — q147's rationale (trigger-
      // bounded batches; AQE's per-stage job rounds are pure driver
      // latency at micro-batch size)
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      val q = graft.sources.Jsonl.readStream(ss, s"$stage/data",
          jsonlDocSchema, maxFilesPerTrigger = Some(8))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      jsonlStats(s.read.parquet(sink))
    }),

    // Cluster-balanced corpus resampling (DataComp-style curation):
    // 2-iter kmeans assignment over the embeddings, then a sqrt-
    // temperature per-cluster budget in exact integer arithmetic and
    // md5-order selection — dense embedding regions are downweighted,
    // small clusters survive whole.
    "q153_cluster_balanced" -> ((s, dir) => {
      import s.implicits._
      val assigned = Similarity.kmeansAssign(Tables(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2)
      graft.operators.Sampling.clusterBalancedSample(assigned, "vec_id",
          "centroid_id", totalBudget = 200)
        .select($"vec_id", $"centroid_id")
    }),

    // Persisted-model lifecycle (the fourth persisted artifact, next to
    // the ANN/dedup/BM25 indexes): the q150 classifier saved via
    // TextModelStore, reloaded, and applied — integer weights round-trip
    // parquet exactly, so scores are bit-identical to in-memory training
    // (save+load run fresh every invocation; they ARE the op under test).
    "q154_nb_model_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val mDir = s"/tmp/graft_nbmodel_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.TextModelStore.saveNaiveBayes(
        labeledNbQuality(s, dir), "text", "__hq", mDir)
      val loaded = graft.sources.TextModelStore.loadNaiveBayes(s, mDir)
      TextAnalysis.naiveBayesScore(Tables(s, dir, "documents"),
          "doc_id", "text", loaded)
        .select($"doc_id", $"n_tokens", $"score_q4", $"pred_pos")
    }),

    // Streaming model-based quality filtering — the production filter
    // shape end to end: JSONL tailed as a stream, per-micro-batch parse +
    // quarantine, scoring against the PERSISTED classifier, positives
    // landed in per-batch sink dirs. Batch replica: the same model over
    // the JSONL-surviving docs, positives only (shared oracle CTEs).
    "q155_stream_quality_ingest" -> ((s, dir) => {
      import s.implicits._
      val stage = stagedJsonl(s, dir)
      val base = s"/tmp/graft_squal_v1_${QueryModule.cacheKey(dir)}"
      val mDir = s"$base/model"; val sink = s"$base/sink"
      val ckpt = s"$base/ckpt"
      Seq(mDir, sink, ckpt).foreach(graft.sources.BucketFs.deleteRecursive)
      graft.sources.TextModelStore.saveNaiveBayes(
        labeledNbQuality(s, dir), "text", "__hq", mDir)
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      // AQE off in the micro-batch session — q147's rationale (trigger-
      // bounded batches; AQE's per-stage job rounds are pure driver
      // latency at micro-batch size)
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      val q = graft.streaming.StreamingOps.qualityFilterIngest(ss,
          s"$stage/data", jsonlDocSchema, mDir, sink, ckpt,
          "doc_id", "text", maxFilesPerTrigger = Some(8))
        .start()
      q.awaitTermination()
      s.read.parquet(sink).select($"doc_id", $"n_tokens", $"score_q4")
    }),

    // Incremental classifier update: train-and-save on the first half of
    // the labeled split (bk<25), APPEND the second half (25<=bk<50) into
    // the persisted counts — the two-step model must score every doc
    // bit-identically to one-shot training on the whole split (q154's
    // oracle verbatim). Counts are the additive form; weights derive.
    "q157_nb_model_append" -> ((s, dir) => {
      import s.implicits._
      val mDir = s"/tmp/graft_nbappend_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.BucketFs.deleteRecursive(mDir)
      val labeled = labeledNbQuality(s, dir)
      val bk = graft.operators.Sampling.hashBucket($"doc_id")
      graft.sources.TextModelStore.saveNaiveBayes(
        labeled.where(bk < 25), "text", "__hq", mDir)
      graft.sources.TextModelStore.appendNaiveBayes(s,
        labeled.where(bk >= 25), "text", "__hq", mDir)
      TextAnalysis.naiveBayesScore(Tables(s, dir, "documents"),
          "doc_id", "text",
          graft.sources.TextModelStore.loadNaiveBayes(s, mDir))
        .select($"doc_id", $"n_tokens", $"score_q4", $"pred_pos")
    }),

    // DSIR weights saved + reloaded must select the identical top-64
    // (bucket modulus rides in the manifest)
    "q156_dsir_model_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val mDir = s"/tmp/graft_dsirmodel_v1_${QueryModule.cacheKey(dir)}"
      graft.sources.TextModelStore.saveDsir(
        TextAnalysis.dsirBucketWeights(docs,
          docs.where($"lang" === "en"), "text", buckets = 512), mDir)
      dsirTop64(docs,
        graft.sources.TextModelStore.loadDsir(s, mDir))
    })
  )

  /** The q150/q154/q155/q157 labeled training set: the 50% md5 split
    * with lang=en as the positive label. */
  private def labeledNbQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .where(graft.operators.Sampling.hashBucket($"doc_id") < 50)
      .withColumn("__hq", $"lang" === "en")
  }

  private def trainNbQuality(s: SparkSession, dir: String)
      : TextAnalysis.NaiveBayesModel =
    TextAnalysis.naiveBayesTrain(labeledNbQuality(s, dir), "text", "__hq")

  /** q149/q156 shared tail: score + distributed top-64 + rank. */
  private def dsirTop64(docs: DataFrame,
                        w: TextAnalysis.DsirWeights): DataFrame = {
    import docs.sparkSession.implicits._
    TextAnalysis.dsirScore(docs, "doc_id", "text", w)
      .orderBy($"logratio_q4".desc, $"doc_id").limit(64)
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy($"logratio_q4".desc, $"doc_id")).cast("long"))
      .select($"rk", $"doc_id", $"n_feats", $"logratio_q4")
  }

  /** documents-table JSONL schema for the q151/q152 ingestion gates. */
  private def jsonlDocSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    new StructType()
      .add("doc_id", LongType).add("text", StringType)
      .add("lang", StringType).add("source", StringType)
      .add("n_chars", LongType)
  }

  /** Stage the documents table as JSONL with a deterministic 1-in-25
    * slice of lines truncated (invalid JSON); cacheKey-marker-gated. */
  /** Stage the documents table as a lang-partitioned ORC dataset — the
    * second columnar format next to Parquet. Spark's native ORC source
    * has the same Catalyst integration (vectorized scan, predicate
    * pushdown, partition pruning), so the engine's read path carries
    * over unchanged; q178 proves the round trip and `OrcInteropSpec`
    * pins the pruned/pushed plan shape. */
  private def stagedOrc(s: SparkSession, dir: String): String = {
    val stage = s"/tmp/graft_orc_v1_${QueryModule.cacheKey(dir)}"
    if (!graft.sources.BucketFs.exists(s"$stage/_staged_ok")) {
      graft.sources.BucketFs.deleteRecursive(stage)
      Tables(s, dir, "documents")
        .write.mode("overwrite").partitionBy("lang").orc(s"$stage/data")
      graft.sources.BucketFs.writeString(s"$stage/_staged_ok", "ok\n")
    }
    stage
  }

  private def stagedJsonl(s: SparkSession, dir: String): String = {
    val stage = s"/tmp/graft_jsonl_v1_${QueryModule.cacheKey(dir)}"
    if (!graft.sources.BucketFs.exists(s"$stage/_staged_ok")) {
      graft.sources.BucketFs.deleteRecursive(stage)
      val line = to_json(struct(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
      Tables(s, dir, "documents")
        .select(when(graft.operators.Sampling.hashBucket(col("doc_id"), 25) === 0,
            line.substr(lit(1), length(line) - 5))
          .otherwise(line).as("value"))
        .write.mode("overwrite").text(s"$stage/data")
      graft.sources.BucketFs.writeString(s"$stage/_staged_ok", "ok\n")
    }
    stage
  }

  /** Stage the documents table as TSV with the SAME deterministic
    * 1-in-25 corruption rule as [[stagedJsonl]], applied as a trailing
    * non-digit on the final Long column (an unambiguous parse failure —
    * a truncation could still parse as fewer columns). Free-text fields
    * are sanitized on write (tabs/newlines → space): the TSV convention
    * this source documents in place of quoting. */
  private def stagedTsv(s: SparkSession, dir: String): String = {
    val stage = s"/tmp/graft_tsv_v1_${QueryModule.cacheKey(dir)}"
    if (!graft.sources.BucketFs.exists(s"$stage/_staged_ok")) {
      graft.sources.BucketFs.deleteRecursive(stage)
      val line = concat_ws("\t",
        col("doc_id"),
        regexp_replace(coalesce(col("text"), lit("")), "[\\t\\n\\r]", " "),
        coalesce(col("lang"), lit("")),
        coalesce(col("source"), lit("")),
        col("n_chars"))
      Tables(s, dir, "documents")
        .select(when(graft.operators.Sampling.hashBucket(col("doc_id"), 25) === 0,
            concat(line, lit("x")))
          .otherwise(line).as("value"))
        .write.mode("overwrite").text(s"$stage/data")
      graft.sources.BucketFs.writeString(s"$stage/_staged_ok", "ok\n")
    }
    stage
  }

  /** Per-source stats over the valid rows + the quarantine row — shared
    * by the batch (q151) and streaming (q152) ingestion gates. */
  private def jsonlStats(parsed: DataFrame): DataFrame = {
    val perSource = graft.sources.Jsonl.valid(parsed)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"))
    val quarantined = graft.sources.Jsonl.corrupt(parsed)
      .agg(count(lit(1)).as("n_docs"))
      .select(lit("__corrupt").as("source"), col("n_docs"),
        lit(0L).as("chars_sum"))
    perSource.unionByName(quarantined)
  }

  // ---- oracle SQL ----

  /** q118/q166/q167 shared char-trigram LM oracle: self-trained
    * full-corpus counts, add-one smoothing, floor(1e4*ln) per gram. */
  private lazy val charLmOracle: String = s"""
      WITH nd AS (SELECT doc_id, ${normSql("text")} AS nt FROM documents),
      g3 AS (SELECT nd.doc_id, substr(nd.nt, g.i, 3) AS gram FROM nd,
               LATERAL UNNEST(range(1, GREATEST(length(nd.nt) - 2, 1) + 1)) AS g(i)
             WHERE length(substr(nd.nt, g.i, 3)) = 3),
      g2 AS (SELECT nd.doc_id, substr(nd.nt, g.i, 2) AS gram FROM nd,
               LATERAL UNNEST(range(1, GREATEST(length(nd.nt) - 1, 1) + 1)) AS g(i)
             WHERE length(substr(nd.nt, g.i, 2)) = 2),
      m3 AS (SELECT gram, COUNT(*) AS c3 FROM g3 GROUP BY 1),
      m2 AS (SELECT gram, COUNT(*) AS c2 FROM g2 GROUP BY 1),
      s AS (SELECT d.doc_id,
              CAST(FLOOR(10000.0 * ln(
                CAST(COALESCE(m3.c3, 0) + 1 AS DOUBLE) /
                CAST(COALESCE(m2.c2, 0) + 128 AS DOUBLE))) AS BIGINT) AS q
            FROM g3 d
            LEFT JOIN m3 ON d.gram = m3.gram
            LEFT JOIN m2 ON substr(d.gram, 1, 2) = m2.gram)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams,
        CAST(SUM(q) AS BIGINT) AS logprob_q4
      FROM s GROUP BY 1"""

  /** q59/q171 shared PCM-sample histogram oracle: 512 closed-form
    * samples per asset, 16 bins — the WAV and interleaved-AVI audio
    * paths decode to the same bytes. */
  private lazy val pcmHistogramOracle: String = """
      WITH d AS (SELECT doc_id AS asset_id FROM documents),
      sm AS (
        SELECT asset_id, (asset_id * 17 + j * 29) % 256 AS v
        FROM d, generate_series(0, 511) g(j)),
      c AS (SELECT asset_id, v // 16 AS bin, COUNT(*) AS cnt
            FROM sm GROUP BY 1, 2),
      db AS (SELECT asset_id, bin
             FROM d, (SELECT UNNEST(generate_series(0, 15)) AS bin))
      SELECT db.asset_id, 8000 AS sample_rate, 1 AS channels,
        512 AS n_frames, CAST(db.bin AS INT) AS bin,
        CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      FROM db LEFT JOIN c ON db.asset_id = c.asset_id AND db.bin = c.bin"""

  /** q186/q200 shared oracle scaffold: the power-iteration CTE chain
    * ending at x3 (the round-3 direction). */
  private lazy val dominantDirectionCtes: String = """
      WITH e0 AS (SELECT vec_id,
              list_transform(embedding::DOUBLE[], x -> floor(x * 1000.0)) AS e
            FROM embeddings),
      v AS MATERIALIZED (SELECT vec_id, g.i - 1 AS i, CAST(e[g.i] AS BIGINT) AS q
           FROM e0, LATERAL UNNEST(range(1, len(e) + 1)) AS g(i)),
      m AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
             CAST(SUM(a.q * b.q) AS BIGINT) AS m
           FROM v a JOIN v b ON a.vec_id = b.vec_id GROUP BY 1, 2),
      x0 AS (SELECT DISTINCT i AS j, CAST(1000000 AS BIGINT) AS x FROM v),
      y1 AS MATERIALIZED (SELECT m.i, CAST(SUM(m.m * x0.x) AS BIGINT) AS y
           FROM m JOIN x0 ON m.j = x0.j GROUP BY 1),
      x1 AS MATERIALIZED (SELECT i AS j,
             CAST(y // ((SELECT MAX(abs(y)) FROM y1) // 1000000 + 1) AS BIGINT) AS x
           FROM y1),
      y2 AS MATERIALIZED (SELECT m.i, CAST(SUM(m.m * x1.x) AS BIGINT) AS y
           FROM m JOIN x1 ON m.j = x1.j GROUP BY 1),
      x2 AS MATERIALIZED (SELECT i AS j,
             CAST(y // ((SELECT MAX(abs(y)) FROM y2) // 1000000 + 1) AS BIGINT) AS x
           FROM y2),
      y3 AS MATERIALIZED (SELECT m.i, CAST(SUM(m.m * x2.x) AS BIGINT) AS y
           FROM m JOIN x2 ON m.j = x2.j GROUP BY 1),
      x3 AS (SELECT i AS j,
             CAST(y // ((SELECT MAX(abs(y)) FROM y3) // 1000000 + 1) AS BIGINT) AS x
           FROM y3)"""

  private def normSql(t: String) =
    s"regexp_replace(trim(lower($t)), '\\s+', ' ', 'g')"

  /** q149/q156 shared oracle: DSIR hashed uni+bigram bucket weights
    * (target lang=en vs raw), quantized log-importance, top-64. */
  private lazy val dsirResampleSql = s"""
      WITH nd AS (SELECT doc_id, lang,
          ${normSql("COALESCE(text, '')")} AS nt FROM documents),
      tk AS (SELECT doc_id, lang,
               list_filter(string_split(nt, ' '), x -> x <> '') AS t
             FROM nd),
      ft AS (SELECT doc_id, lang, UNNEST(list_concat(t,
               list_transform(range(1, GREATEST(len(t), 1)),
                 i -> t[i] || ' ' || t[i + 1]))) AS f
             FROM tk),
      b AS (SELECT doc_id, lang,
              ('0x' || substr(md5(f), 1, 12))::BIGINT % 512 AS bucket
            FROM ft),
      rb AS (SELECT bucket, COUNT(*) AS r FROM b GROUP BY 1),
      tb AS (SELECT bucket, COUNT(*) AS t FROM b WHERE lang = 'en' GROUP BY 1),
      tot AS (SELECT (SELECT COALESCE(SUM(r), 0) FROM rb) AS rr,
                     (SELECT COALESCE(SUM(t), 0) FROM tb) AS tt),
      w AS (SELECT g.bucket,
              (CAST(FLOOR(10000.0 * ln(CAST(COALESCE(tb.t, 0) + 1 AS DOUBLE)
                 / CAST(tot.tt + 512 AS DOUBLE))) AS BIGINT)
             - CAST(FLOOR(10000.0 * ln(CAST(COALESCE(rb.r, 0) + 1 AS DOUBLE)
                 / CAST(tot.rr + 512 AS DOUBLE))) AS BIGINT)) AS wq
            FROM (SELECT UNNEST(range(0, 512)) AS bucket) g
            LEFT JOIN rb ON rb.bucket = g.bucket
            LEFT JOIN tb ON tb.bucket = g.bucket, tot),
      s AS (SELECT b.doc_id, COUNT(*) AS n_feats, SUM(w.wq) AS lr
            FROM b JOIN w ON w.bucket = b.bucket GROUP BY 1)
      SELECT CAST(rk AS BIGINT) AS rk, doc_id,
        CAST(n_feats AS BIGINT) AS n_feats, CAST(lr AS BIGINT) AS logratio_q4
      FROM (SELECT ROW_NUMBER() OVER (ORDER BY lr DESC, doc_id) AS rk,
              doc_id, n_feats, lr FROM s)
      WHERE rk <= 64"""

  /** Shared Naive Bayes CTE chain for q150/q154/q155: train on the
    * bk<50 md5 split (label lang=en), per-token quantized log-likelihood
    * ratios over vocab+1, per-doc integer score `sc` in CTE `s`; `nd`
    * also carries `jbk` (the q151 JSONL 1-in-25 corruption bucket) for
    * the streamed-ingest gate's survivor filter. */
  private val nbQualityBaseSql = s"""
      WITH nd AS (SELECT doc_id, lang,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100
            AS bk,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 25
            AS jbk,
          ${normSql("COALESCE(text, '')")} AS nt FROM documents),
      tok AS (SELECT doc_id, lang, bk,
                UNNEST(list_filter(string_split(nt, ' '), x -> x <> ''))
                  AS token
              FROM nd),
      cnt AS (SELECT token,
                SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cp,
                SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS cn
              FROM tok WHERE bk < 50 GROUP BY 1),
      tot AS (SELECT COALESCE(SUM(cp), 0) AS np, COALESCE(SUM(cn), 0) AS nn,
                COUNT(*) + 1 AS vs FROM cnt),
      pri AS (SELECT SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ndp,
                COUNT(*) AS ndd FROM nd WHERE bk < 50),
      k AS (SELECT
              (CAST(FLOOR(10000.0 * ln(CAST(ndp AS DOUBLE) / ndd)) AS BIGINT)
             - CAST(FLOOR(10000.0 * ln(CAST(ndd - ndp AS DOUBLE) / ndd))
                 AS BIGINT)) AS pq,
              (CAST(FLOOR(10000.0 * ln(1.0 / CAST(np + vs AS DOUBLE)))
                 AS BIGINT)
             - CAST(FLOOR(10000.0 * ln(1.0 / CAST(nn + vs AS DOUBLE)))
                 AS BIGINT)) AS uq
            FROM tot, pri),
      w AS (SELECT token,
              (CAST(FLOOR(10000.0 * ln(CAST(cp + 1 AS DOUBLE)
                 / CAST(np + vs AS DOUBLE))) AS BIGINT)
             - CAST(FLOOR(10000.0 * ln(CAST(cn + 1 AS DOUBLE)
                 / CAST(nn + vs AS DOUBLE))) AS BIGINT)) AS wq
            FROM cnt, tot),
      s AS (SELECT t.doc_id, t.lang, COUNT(*) AS n_tokens,
              MIN(k.pq) + SUM(COALESCE(w.wq, k.uq)) AS sc
            FROM tok t LEFT JOIN w ON w.token = t.token, k GROUP BY 1, 2)"""

  /** q151/q152 shared oracle: valid per-source stats + quarantine row,
    * from the parquet table and the staged md5 corruption rule. */
  private val jsonlStatsSql = """
      WITH b AS (SELECT *,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 25
            AS bk
        FROM documents)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS chars_sum
      FROM b WHERE bk <> 0 GROUP BY 1
      UNION ALL
      SELECT '__corrupt' AS source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(0 AS BIGINT) AS chars_sum
      FROM b WHERE bk = 0"""

  /** The q77 two-iteration kmeans assignment as a reusable CTE chain
    * (ends at `a1(vec_id, cid)`); mirrors Similarity.kmeansAssign at
    * k=8, iters=2. */
  private val kmeans2AssignCte = """
      WITH v AS (SELECT vec_id,
                   list_transform(embedding::DOUBLE[], x -> floor(x * 1000.0)) AS e
                 FROM embeddings),
      vv AS (SELECT vec_id, e, list_inner_product(e, e) AS sq FROM v),
      c0 AS (SELECT vec_id AS cid, e AS ce, list_inner_product(e, e) AS cc
             FROM v WHERE vec_id < 8),
      a0 AS (SELECT vec_id, cid, e FROM (
               SELECT vv.vec_id, c.cid, vv.e,
                 row_number() OVER (PARTITION BY vv.vec_id ORDER BY
                   ((vv.sq - 2.0 * list_inner_product(vv.e, c.ce)) + c.cc) ASC,
                   c.cid ASC) AS rk
               FROM vv, c0 c)
             WHERE rk = 1),
      sums AS (SELECT cid, g.i AS pos, SUM(e[g.i]) AS sx, COUNT(*) AS cnt
               FROM a0, LATERAL UNNEST(range(1, len(e) + 1)) AS g(i)
               GROUP BY 1, 2),
      c1 AS (SELECT cid, list(sx / CAST(cnt AS DOUBLE) ORDER BY pos) AS ce
             FROM sums GROUP BY cid),
      c1c AS (SELECT cid, ce, list_inner_product(ce, ce) AS cc FROM c1),
      a1 AS (SELECT vec_id, cid FROM (
               SELECT vv.vec_id, c.cid,
                 row_number() OVER (PARTITION BY vv.vec_id ORDER BY
                   ((vv.sq - 2.0 * list_inner_product(vv.e, c.ce)) + c.cc) ASC,
                   c.cid ASC) AS rk
               FROM vv, c1c c)
             WHERE rk = 1)"""

  /** distinct k-shingles of the normalized text. Correlated
    * generate_series is unsupported in DuckDB 1.0; UNNEST over a
    * correlated range() list works. */
  private def shinglesSql(k: Int): String =
    s"""SELECT DISTINCT doc_id, substr(d.nt, g.i, $k) AS sh FROM (
       |  SELECT doc_id, ${normSql("text")} AS nt FROM documents) d,
       |  LATERAL UNNEST(range(1, GREATEST(length(d.nt) - ${k - 1}, 1) + 1)) AS g(i)""".stripMargin

  private def minhashSql(numHashes: Int, shingleK: Int = 8): String = {
    // mirror of Dedup.shingleHashPair + Kirsch-Mitzenmacher combination
    val aggs = (0 until numHashes).map(i =>
      s"MIN(h1 + $i * h2) AS mh$i").mkString(", ")
    s"""SELECT doc_id, $aggs FROM (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(sh), 1, 12))::BIGINT AS h1,
       |    ('0x' || substr(md5(sh), 13, 12))::BIGINT AS h2
       |  FROM (${shinglesSql(shingleK)})) GROUP BY doc_id""".stripMargin
  }

  /** Shared PQ oracle CTEs (mirrors Similarity.subvectorFrame/pqCodebook/
    * pqEncode at dims=64, m=4, k=16 on the 1000× integer grid): quantize,
    * split into 4×16-dim subvectors, codebook from vec_id < 16, nearest
    * centroid per (vector, subspace) with ties by centroid id. */
  private val pqCommonSql: String = """
      WITH v AS (SELECT vec_id,
                   list_transform(embedding::DOUBLE[], x -> floor(x * 1000.0)) AS e
                 FROM embeddings),
      sub AS (SELECT vec_id, g.s AS s, e[(g.s * 16 + 1):(g.s * 16 + 16)] AS sv
              FROM v, LATERAL UNNEST(range(0, 4)) AS g(s)),
      svv AS (SELECT vec_id, s, sv, list_inner_product(sv, sv) AS n2 FROM sub),
      cb AS (SELECT s, vec_id AS cid, sv AS c, n2 AS cc FROM svv WHERE vec_id < 16),
      scored AS (SELECT t.vec_id, t.s, cb.cid,
                   (t.n2 - 2.0 * list_inner_product(t.sv, cb.c)) + cb.cc AS d2
                 FROM svv t JOIN cb ON t.s = cb.s),
      best AS (SELECT vec_id, s, cid FROM (
                 SELECT vec_id, s, cid,
                   row_number() OVER (PARTITION BY vec_id, s
                     ORDER BY d2 ASC, cid ASC) AS rk
                 FROM scored) WHERE rk = 1)"""

  /** Shared IVF cell-assignment CTEs (full-vector rank-1 argmin against
    * the nList=8 deterministic centroids) appended after [[pqCommonSql]]
    * by the IVF-PQ oracles — ONE copy so q96/q97/q98 cannot drift on
    * what "the corpus cell" means. */
  private val ivfCellsSql: String = """
      fv AS (SELECT vec_id, e, list_inner_product(e, e) AS sq FROM v),
      cen AS (SELECT vec_id AS ccell, e AS ce, sq AS cc2 FROM fv
              WHERE vec_id < 8),
      cells AS (SELECT vec_id, ccell AS cell FROM (
                  SELECT fv.vec_id, c.ccell,
                    row_number() OVER (PARTITION BY fv.vec_id ORDER BY
                      ((fv.sq - 2.0 * list_inner_product(fv.e, c.ce)) + c.cc2)
                        ASC, c.ccell ASC) AS rk
                  FROM fv, cen c) WHERE rk = 1)"""

  /** Trained-IVF search oracle (mirrors Similarity.ivfKmeansTopK at k=2,
    * nList=8, iters=2, queries vec_id < 24): two unrolled Lloyd rounds —
    * rank-1 assignment against the id<8 seeds, exact integer mean update,
    * rank-1 re-assignment — then the query side probes its `nProbe`
    * nearest trained cells and top-2 ranks candidates within them. The
    * corpus side stays rank-1 (a vector lives in exactly one cell). */
  /** Word-5-gram benchmark-overlap oracle, shared by q74 (exact join)
    * and q143 (Bloom prescreen + exact verify): identical output is the
    * point — Bloom filters have no false negatives and the verify pass
    * removes false positives. */
  private lazy val decontaminateOracle: String = s"""
      WITH t AS (SELECT doc_id, string_split(${normSql("text")}, ' ') AS toks
                 FROM documents),
      g AS (SELECT DISTINCT doc_id,
              array_to_string(toks[(i.i):(i.i + 4)], ' ') AS gram
            FROM t, LATERAL UNNEST(range(1, len(toks) - 4 + 1)) AS i(i)
            WHERE len(toks) >= 5),
      b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
      h AS (SELECT g.doc_id, COUNT(*) AS n FROM g JOIN b USING (gram)
            GROUP BY 1)
      SELECT d.doc_id,
        CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminated_ngrams,
        COALESCE(h.n, 0) > 0 AS contaminated
      FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id"""

  private def ivfKmeansOracle(nProbe: Int): String = s"""
      WITH v AS (SELECT vec_id,
                   list_transform(embedding::DOUBLE[], x -> floor(x * 1000.0)) AS e
                 FROM embeddings),
      vv AS (SELECT vec_id, e, list_inner_product(e, e) AS sq FROM v),
      c0 AS (SELECT vec_id AS cid, e AS ce, list_inner_product(e, e) AS cc
             FROM v WHERE vec_id < 8),
      a0 AS (SELECT vec_id, cid, e FROM (
               SELECT vv.vec_id, c.cid, vv.e,
                 row_number() OVER (PARTITION BY vv.vec_id ORDER BY
                   ((vv.sq - 2.0 * list_inner_product(vv.e, c.ce)) + c.cc) ASC,
                   c.cid ASC) AS rk
               FROM vv, c0 c)
             WHERE rk = 1),
      sums AS (SELECT cid, g.i AS pos, SUM(e[g.i]) AS sx, COUNT(*) AS cnt
               FROM a0, LATERAL UNNEST(range(1, len(e) + 1)) AS g(i)
               GROUP BY 1, 2),
      c1 AS (SELECT cid, list(sx / CAST(cnt AS DOUBLE) ORDER BY pos) AS ce
             FROM sums GROUP BY cid),
      c1c AS (SELECT cid, ce, list_inner_product(ce, ce) AS cc FROM c1),
      ranked AS (SELECT vv.vec_id, c.cid, vv.e, vv.sq,
                   row_number() OVER (PARTITION BY vv.vec_id ORDER BY
                     ((vv.sq - 2.0 * list_inner_product(vv.e, c.ce)) + c.cc) ASC,
                     c.cid ASC) AS rk
                 FROM vv, c1c c),
      a1 AS (SELECT vec_id, cid, e, sq FROM ranked WHERE rk = 1),
      aq AS (SELECT vec_id, cid, e, sq FROM ranked WHERE rk <= $nProbe),
      scored AS (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, q.cid,
              ((q.sq - 2.0 * list_inner_product(q.e, n.e)) + n.sq) AS d2
            FROM aq q JOIN a1 n ON q.cid = n.cid AND q.vec_id <> n.vec_id
            WHERE q.vec_id < 24)
      SELECT query_id, rk, neighbor_id, CAST(cid AS BIGINT) AS centroid_id
      FROM (SELECT query_id, neighbor_id, cid,
              row_number() OVER (PARTITION BY query_id
                ORDER BY d2 ASC, neighbor_id ASC) AS rk
            FROM scored)
      WHERE rk <= 2"""

  /** IVF-PQ search oracle (mirrors Similarity.ivfPqTopK at dims=64, m=4,
    * k=16, nList=8, topK=3, queries vec_id < 8): corpus cells by rank-1
    * full-vector argmin, query probe set by rank <= nProbe, candidates
    * where a corpus cell meets a probed cell, ADC summed from the
    * distance tables. `trained` inserts one unrolled Lloyd round on the
    * PQ codebook (q99's pattern) and routes codes AND tables through the
    * refined cb1; trained ADC distances are fractional (means), so the
    * output goes through floor() on BOTH engines — DuckDB's double→BIGINT
    * cast rounds where Spark truncates. */
  /** q121's tombstone batch: five current top-3 winners (so the delete
    * visibly changes results) plus a non-winner and the max id (no-op
    * cells exercise the untouched-directory path). */
  private val DeletedIds: Seq[Long] = Seq(88L, 126L, 209L, 364L, 450L, 1999L)

  private def ivfPqOracle(nProbe: Int, trained: Boolean = false,
                          excludeIds: Seq[Long] = Nil,
                          corpusBelow: Option[Long] = None): String = {
    val trainCtes = if (!trained) "" else """,
      tsums AS (SELECT b.s, b.cid, g.i AS pos, SUM(t.sv[g.i]) AS sx,
                  COUNT(*) AS cnt
                FROM best b
                JOIN svv t ON t.vec_id = b.vec_id AND t.s = b.s,
                LATERAL UNNEST(range(1, len(t.sv) + 1)) AS g(i)
                GROUP BY 1, 2, 3),
      cb1 AS (SELECT s, cid, c, list_inner_product(c, c) AS cc FROM (
                SELECT s, cid, list(sx / CAST(cnt AS DOUBLE) ORDER BY pos) AS c
                FROM tsums GROUP BY 1, 2)),
      best1 AS (SELECT vec_id, s, cid FROM (
                  SELECT t.vec_id, t.s, c.cid,
                    row_number() OVER (PARTITION BY t.vec_id, t.s
                      ORDER BY ((t.n2 - 2.0 * list_inner_product(t.sv, c.c))
                                  + c.cc) ASC,
                        c.cid ASC) AS rk
                  FROM svv t JOIN cb1 c ON t.s = c.s) WHERE rk = 1)"""
    val cbRef = if (trained) "cb1" else "cb"
    val bestRef = if (trained) "best1" else "best"
    val d2Out = if (trained) "CAST(floor(d2) AS BIGINT)" else "CAST(d2 AS BIGINT)"
    val excludeSql =
      (if (excludeIds.isEmpty) ""
       else s" AND b.vec_id NOT IN (${excludeIds.mkString(", ")})") +
        corpusBelow.map(n => s" AND b.vec_id < $n").getOrElse("")
    s"""$pqCommonSql$trainCtes,
      $ivfCellsSql,
      qcells AS (SELECT vec_id AS query_id, ccell AS cell FROM (
                  SELECT fv.vec_id, c.ccell,
                    row_number() OVER (PARTITION BY fv.vec_id ORDER BY
                      ((fv.sq - 2.0 * list_inner_product(fv.e, c.ce)) + c.cc2)
                        ASC, c.ccell ASC) AS rk
                  FROM fv, cen c WHERE fv.vec_id < 8) WHERE rk <= $nProbe),
      q AS (SELECT vec_id AS query_id, s, sv, n2 FROM svv WHERE vec_id < 8),
      dt AS (SELECT q.query_id, cb.s, cb.cid,
               (q.n2 - 2.0 * list_inner_product(q.sv, cb.c)) + cb.cc AS ld
             FROM q JOIN $cbRef cb ON q.s = cb.s),
      acc AS (SELECT dt.query_id, b.vec_id AS neighbor_id, nc.cell,
                SUM(dt.ld) AS d2
              FROM $bestRef b
              JOIN dt ON b.s = dt.s AND b.cid = dt.cid
              JOIN cells nc ON nc.vec_id = b.vec_id
              JOIN qcells qc ON qc.query_id = dt.query_id AND qc.cell = nc.cell
              WHERE b.vec_id <> dt.query_id$excludeSql
              GROUP BY 1, 2, 3)
      SELECT query_id, rk, neighbor_id, CAST(cell AS BIGINT) AS centroid_id,
        $d2Out AS adc_d2
      FROM (SELECT query_id, neighbor_id, cell, d2,
              row_number() OVER (PARTITION BY query_id
                ORDER BY d2 ASC, neighbor_id ASC) AS rk
            FROM acc)
      WHERE rk <= 3"""
  }

  /** Residual IVF-PQ oracle (mirrors ivfPqTopK(residual = true) at
    * dims=64, m=4, k=16, nList=8, topK=3, nProbe=1): residuals vs the
    * rank-1 cell centroid, residual codebook from rows 8 <= vec_id < 24,
    * per-cell query tables. Shared by q98 (inline) and q109 (persisted
    * index) — identical results by construction. */
  private lazy val residualIvfPqOracle: String = s"""$pqCommonSql,
      $ivfCellsSql,
      rv AS (SELECT f.vec_id, cl.cell,
               list_transform(range(1, len(f.e) + 1), i -> f.e[i] - c.ce[i])
                 AS re
             FROM fv f JOIN cells cl ON cl.vec_id = f.vec_id
             JOIN cen c ON c.ccell = cl.cell),
      rsub AS (SELECT vec_id, cell, g.s AS s,
                 re[(g.s * 16 + 1):(g.s * 16 + 16)] AS sv
               FROM rv, LATERAL UNNEST(range(0, 4)) AS g(s)),
      rsvv AS (SELECT vec_id, cell, s, sv, list_inner_product(sv, sv) AS n2
               FROM rsub),
      rcb AS (SELECT s, vec_id - 8 AS cid, sv AS c, n2 AS cc FROM rsvv
              WHERE vec_id >= 8 AND vec_id < 24),
      rscored AS (SELECT t.vec_id, t.cell, t.s, rcb.cid,
                    (t.n2 - 2.0 * list_inner_product(t.sv, rcb.c)) + rcb.cc
                      AS d2
                  FROM rsvv t JOIN rcb ON t.s = rcb.s),
      rbest AS (SELECT vec_id, cell, s, cid FROM (
                  SELECT vec_id, cell, s, cid,
                    row_number() OVER (PARTITION BY vec_id, s
                      ORDER BY d2 ASC, cid ASC) AS rk
                  FROM rscored) WHERE rk = 1),
      dt AS (SELECT t.vec_id AS query_id, t.cell, rcb.s, rcb.cid,
               (t.n2 - 2.0 * list_inner_product(t.sv, rcb.c)) + rcb.cc AS ld
             FROM rsvv t JOIN rcb ON t.s = rcb.s WHERE t.vec_id < 8),
      acc AS (SELECT dt.query_id, b.vec_id AS neighbor_id, b.cell,
                SUM(dt.ld) AS d2
              FROM rbest b
              JOIN dt ON b.s = dt.s AND b.cid = dt.cid AND b.cell = dt.cell
              WHERE b.vec_id <> dt.query_id
              GROUP BY 1, 2, 3)
      SELECT query_id, rk, neighbor_id, CAST(cell AS BIGINT) AS centroid_id,
        CAST(d2 AS BIGINT) AS adc_d2
      FROM (SELECT query_id, neighbor_id, cell, d2,
              row_number() OVER (PARTITION BY query_id
                ORDER BY d2 ASC, neighbor_id ASC) AS rk
            FROM acc)
      WHERE rk <= 3"""

  /** From-scratch recompute of the q138/q139 dedup-index answer: both
    * gates split documents into corpus (doc_id % 4 != 0) and new batch
    * (doc_id % 4 == 0), band the 8-hash MinHash signatures 2-per-band,
    * and report every cross-side bucket collision with its count of
    * agreeing signature components. ONE text for both gates — q139's
    * save+append+append build must be indistinguishable from q138's
    * one-shot build. */
  private def dedupIndexSql: String = dedupIndexSql("c.doc_id % 4 <> 0")

  /** `corpusPred` narrows which docs count as the indexed corpus —
    * the as-of gate pins it to the generation-0 save batch. */
  private def dedupIndexSql(corpusPred: String): String = s"""
      WITH sig AS (${minhashSql(8)}),
      bands AS (
        SELECT doc_id, b.band,
          CASE b.band
            WHEN 0 THEN CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)
            WHEN 1 THEN CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)
            WHEN 2 THEN CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR)
            ELSE CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) END AS band_sig
        FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b),
      pairs AS (
        SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corpus_id
        FROM bands n JOIN bands c
          ON n.band = c.band AND n.band_sig = c.band_sig
        WHERE n.doc_id % 4 = 0 AND ($corpusPred))
      SELECT p.new_id, p.corpus_id,
        CAST((a.mh0 = b.mh0)::INT + (a.mh1 = b.mh1)::INT
           + (a.mh2 = b.mh2)::INT + (a.mh3 = b.mh3)::INT
           + (a.mh4 = b.mh4)::INT + (a.mh5 = b.mh5)::INT
           + (a.mh6 = b.mh6)::INT + (a.mh7 = b.mh7)::INT AS BIGINT) AS n_match
      FROM pairs p
      JOIN sig a ON p.new_id = a.doc_id
      JOIN sig b ON p.corpus_id = b.doc_id"""

  /** Sequential replay of the q147 streaming ingest: batch k's kept set
    * is defined against the archive (odd ids) PLUS the kept sets of
    * batches < k — the same banded-candidate + component-count rule as
    * the engine (a doc is dropped iff some banded collision agrees on
    * ≥ 6 of 8 signature components). */
  private def streamDedupIngestSql: String = s"""
      WITH sig AS (${minhashSql(8)}),
      bands AS (
        SELECT doc_id, b.band,
          CASE b.band
            WHEN 0 THEN CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)
            WHEN 1 THEN CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)
            WHEN 2 THEN CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR)
            ELSE CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) END AS band_sig
        FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b),
      hit AS (
        SELECT DISTINCT n.doc_id AS x, c.doc_id AS y
        FROM bands n JOIN bands c
          ON n.band = c.band AND n.band_sig = c.band_sig
        JOIN sig a ON n.doc_id = a.doc_id
        JOIN sig b ON c.doc_id = b.doc_id
        WHERE n.doc_id <> c.doc_id
          AND (a.mh0 = b.mh0)::INT + (a.mh1 = b.mh1)::INT
            + (a.mh2 = b.mh2)::INT + (a.mh3 = b.mh3)::INT
            + (a.mh4 = b.mh4)::INT + (a.mh5 = b.mh5)::INT
            + (a.mh6 = b.mh6)::INT + (a.mh7 = b.mh7)::INT >= 6),
      k0 AS (
        SELECT doc_id FROM documents d WHERE doc_id % 8 = 0
          AND NOT EXISTS (SELECT 1 FROM hit
            WHERE hit.x = d.doc_id AND hit.y % 2 = 1)),
      k1 AS (
        SELECT doc_id FROM documents d WHERE doc_id % 8 = 2
          AND NOT EXISTS (SELECT 1 FROM hit
            WHERE hit.x = d.doc_id AND (hit.y % 2 = 1
              OR hit.y IN (SELECT doc_id FROM k0)))),
      k2 AS (
        SELECT doc_id FROM documents d WHERE doc_id % 8 = 4
          AND NOT EXISTS (SELECT 1 FROM hit
            WHERE hit.x = d.doc_id AND (hit.y % 2 = 1
              OR hit.y IN (SELECT doc_id FROM k0)
              OR hit.y IN (SELECT doc_id FROM k1))))
      SELECT CAST(0 AS BIGINT) AS batch, doc_id FROM k0
      UNION ALL SELECT CAST(1 AS BIGINT), doc_id FROM k1
      UNION ALL SELECT CAST(2 AS BIGINT), doc_id FROM k2"""

  def oracle: Map[String, String] = Map(
    "q138_dedup_index" -> dedupIndexSql,
    "q139_dedup_index_append" -> dedupIndexSql,
    // as-of gen 1 = only the save batch (doc_id % 4 = 1) is corpus
    "q162_dedup_index_time_travel" -> dedupIndexSql("c.doc_id % 4 = 1"),
    // compaction changes nothing observable
    "q163_text_index_compact" ->
      bm25IndexOracle(Seq("table", "scan", "merge"), topK = 10),
    "q164_dedup_index_compact" -> dedupIndexSql,
    "q147_stream_dedup_ingest" -> streamDedupIngestSql,

    // DSIR: hashed uni+bigram bucket weights (target=en vs raw), per-doc
    // quantized log-importance, top-64. ln terms quantized with floor
    // BEFORE summation — exact integer arithmetic end to end (see q118).
    "q149_dsir_resample" -> dsirResampleSql,

    // saved+reloaded DSIR weights must select the identical top-64
    "q156_dsir_model_roundtrip" -> dsirResampleSql,

    // Naive Bayes quality classifier: train on the bk<50 hash split with
    // lang=en as positive, add-one smoothing over vocab+1 (the OOV
    // pseudo-token), floor(1e4*ln) per term, integer sums.
    "q150_nb_quality" -> s"""
      $nbQualityBaseSql
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(sc AS BIGINT) AS score_q4, sc > 0 AS pred_pos,
        CAST((sc > 0) = (lang = 'en') AS INT) AS hit
      FROM s""",

    // the SAVED+RELOADED model must score bit-identically to q150's
    // in-memory one (integer counts round-trip parquet exactly and the
    // weights are a pure derived function of them)
    "q154_nb_model_roundtrip" -> s"""
      $nbQualityBaseSql
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(sc AS BIGINT) AS score_q4, sc > 0 AS pred_pos
      FROM s""",

    // two-step train+append ≡ one-shot training on the union (counts
    // are additive) — q154's oracle verbatim
    "q157_nb_model_append" -> s"""
      $nbQualityBaseSql
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        CAST(sc AS BIGINT) AS score_q4, sc > 0 AS pred_pos
      FROM s""",

    // streamed quality-filtered ingest: the same trained model applied
    // to the JSONL-surviving docs (staging bucket <> 0), positives only
    "q155_stream_quality_ingest" -> s"""
      $nbQualityBaseSql
      SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens,
        CAST(s.sc AS BIGINT) AS score_q4
      FROM s JOIN nd ON nd.doc_id = s.doc_id
      WHERE nd.jbk <> 0 AND s.sc > 0""",

    // JSONL round trip: valid per-source stats + the quarantine row,
    // recomputed from the parquet table and the same md5 corruption rule
    // (1-in-25 lines truncated at stage time).
    "q151_jsonl_ingest" -> jsonlStatsSql,
    // same accounting, TSV container (batch and streamed)
    "q173_tsv_ingest" -> jsonlStatsSql,

    "q178_orc_interop" -> """
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS chars_sum
      FROM documents WHERE lang = 'en' GROUP BY 1""",

    "q181_html_strip" -> s"""
      SELECT doc_id, clean, CAST(length(clean) AS BIGINT) AS n_clean
      FROM (SELECT doc_id, ${graft.operators.TextAnalysis.stripHtmlSql(
        """'<html><head><title>Doc &amp; Co</title><style>p { color: #fff }</style>'
           || '<script type="text/js">if (a < b && c > 1) { run() }</script></head>'
           || '<body><!-- doc ' || CAST(doc_id AS VARCHAR) || ' --><h1>T&iacute;tle '
           || CAST(doc_id AS VARCHAR) || '</h1><p class="main">'
           || COALESCE(text, '') || '</p><br/>&nbsp;&lt;end&gt;</body></html>'""")}
        AS clean FROM documents)""",

    "q183_unigram_segment" ->
      graft.operators.TextAnalysis.unigramSegmentSql(),

    "q199_label_propagation" -> """
      WITH e AS (SELECT DISTINCT CAST(o.o_custkey AS BIGINT) * 2 AS src,
                   CAST(l.l_suppkey AS BIGINT) * 2 + 1 AS dst
                 FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
      nodes AS (SELECT DISTINCT src AS node FROM sym),
      l0 AS (SELECT node, node AS lbl FROM nodes),
      n1 AS (SELECT sym.dst AS node, MIN(l0.lbl) AS nl
             FROM sym JOIN l0 ON l0.node = sym.src GROUP BY 1),
      l1 AS (SELECT l0.node, LEAST(l0.lbl, COALESCE(n1.nl, l0.lbl)) AS lbl
             FROM l0 LEFT JOIN n1 ON n1.node = l0.node),
      n2 AS (SELECT sym.dst AS node, MIN(l1.lbl) AS nl
             FROM sym JOIN l1 ON l1.node = sym.src GROUP BY 1),
      l2 AS (SELECT l1.node, LEAST(l1.lbl, COALESCE(n2.nl, l1.lbl)) AS lbl
             FROM l1 LEFT JOIN n2 ON n2.node = l1.node)
      SELECT node, CAST(lbl AS BIGINT) AS lbl FROM l2""",

    "q188_pagerank_weighted" -> s"""
      WITH ew AS (SELECT CAST(c.c_nationkey AS BIGINT) AS src,
                    CAST(su.s_nationkey AS BIGINT) AS dst,
                    CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) AS w
                  FROM lineitem l
                  JOIN orders o ON l.l_orderkey = o.o_orderkey
                  JOIN customer c ON o.o_custkey = c.c_custkey
                  JOIN supplier su ON l.l_suppkey = su.s_suppkey
                  GROUP BY 1, 2),
      ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS tw FROM ew
             WHERE w > 0 GROUP BY 1),
      e AS (SELECT ew.src, ew.dst, (ew.w * 10000) // ow.tw AS share
            FROM ew JOIN ow ON ew.src = ow.src WHERE ew.w > 0),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      c0 AS (SELECT COUNT(*) AS n FROM nodes),
      r0 AS (SELECT node, 1000000000000 // (SELECT n FROM c0) AS r FROM nodes),
      s1 AS (SELECT e.dst AS node, SUM((r0.r * e.share) // 10000) AS s
             FROM e JOIN r0 ON r0.node = e.src GROUP BY 1),
      r1 AS (SELECT nodes.node,
               (15 * 1000000000000) // (100 * (SELECT n FROM c0))
                 + (85 * COALESCE(s1.s, 0)) // 100 AS r
             FROM nodes LEFT JOIN s1 ON s1.node = nodes.node),
      s2 AS (SELECT e.dst AS node, SUM((r1.r * e.share) // 10000) AS s
             FROM e JOIN r1 ON r1.node = e.src GROUP BY 1),
      r2 AS (SELECT nodes.node,
               (15 * 1000000000000) // (100 * (SELECT n FROM c0))
                 + (85 * COALESCE(s2.s, 0)) // 100 AS r
             FROM nodes LEFT JOIN s2 ON s2.node = nodes.node),
      s3 AS (SELECT e.dst AS node, SUM((r2.r * e.share) // 10000) AS s
             FROM e JOIN r2 ON r2.node = e.src GROUP BY 1),
      r3 AS (SELECT nodes.node,
               (15 * 1000000000000) // (100 * (SELECT n FROM c0))
                 + (85 * COALESCE(s3.s, 0)) // 100 AS r
             FROM nodes LEFT JOIN s3 ON s3.node = nodes.node)
      SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r3""",

    "q186_dominant_direction" ->
      s"$dominantDirectionCtes\n      SELECT CAST(j AS INT) AS i, x FROM x3",

    "q200_pca_scores" -> s"""$dominantDirectionCtes,
      sc AS (SELECT v.vec_id, CAST(SUM(v.q * x3.x) AS BIGINT) AS score
             FROM v JOIN x3 ON x3.j = v.i GROUP BY 1)
      SELECT vec_id, score FROM sc
      ORDER BY abs(score) DESC, vec_id LIMIT 10""",

    "q182_audio_spectrum" -> s"""
      WITH d AS (SELECT doc_id AS asset_id FROM documents),
      smp AS (SELECT asset_id, g.j AS j, (asset_id*17 + g.j*29) % 256 AS v
              FROM d, generate_series(0, 63) g(j)),
      tab(k, j, c, si) AS (VALUES ${graft.operators.Multimodal
        .spectrumTable(Seq(1, 3, 5, 7), 64)
        .map { case (k, j, c, si) => s"($k,$j,$c,$si)" }.mkString(", ")}),
      agg AS (SELECT smp.asset_id, tab.k,
                CAST(SUM(smp.v * tab.c) AS BIGINT) AS re,
                CAST(SUM(smp.v * tab.si) AS BIGINT) AS im
              FROM smp JOIN tab ON smp.j = tab.j GROUP BY 1, 2)
      SELECT asset_id, CAST(k AS INT) AS k, re, im,
        CAST(re*re + im*im AS BIGINT) AS energy
      FROM agg""",

    "q179_image_dhash" -> """
      WITH d AS (SELECT doc_id AS id, doc_id % 17 AS g FROM documents
                 WHERE doc_id % 7 = 0),
      px AS (SELECT id, x, y,
               (g*37 + x*11 + y*23) % 150
               + CASE WHEN id % 5 = 0 AND x IN (4, 5) THEN 40 ELSE 0 END
               + CASE WHEN id % 3 = 0 AND x IN (6, 7) AND y < 2 THEN 60
                      ELSE 0 END AS v
             FROM d, generate_series(0, 17) gx(x), generate_series(0, 15) gy(y)),
      blk AS (SELECT id, x // 2 AS c, y // 2 AS r, SUM(v) // 4 AS m
              FROM px GROUP BY 1, 2, 3),
      bits AS (SELECT l.id, l.r, l.c,
                 CASE WHEN rgt.m > l.m THEN 1 ELSE 0 END AS bit
               FROM blk l JOIN blk rgt
                 ON rgt.id = l.id AND rgt.r = l.r AND rgt.c = l.c + 1
               WHERE l.c < 8),
      bands AS (SELECT id, (r*8 + c) // 16 AS band,
                  CAST(SUM(bit * (1::BIGINT << ((r*8 + c) % 16))) AS BIGINT) AS bv
                FROM bits GROUP BY 1, 2),
      hs AS (SELECT id,
               MAX(CASE WHEN band = 0 THEN bv END) AS b0,
               MAX(CASE WHEN band = 1 THEN bv END) AS b1,
               MAX(CASE WHEN band = 2 THEN bv END) AS b2,
               MAX(CASE WHEN band = 3 THEN bv END) AS b3
             FROM bands GROUP BY 1),
      cand AS (SELECT a.id AS id_a, b.id AS id_b,
                 bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
                 + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS dist
               FROM hs a JOIN hs b ON a.id < b.id
               WHERE a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
      SELECT id_a, id_b, CAST(dist AS BIGINT) AS dist
      FROM cand WHERE dist <= 3""",
    "q174_stream_tsv_ingest" -> jsonlStatsSql,

    // streamed ingestion must account identically to the batch read
    "q152_stream_jsonl_ingest" -> jsonlStatsSql,

    // q77's two-iteration kmeans assignment (a1), then sqrt-temperature
    // budgets in exact integer arithmetic and md5-order selection
    "q153_cluster_balanced" -> s"""
      $kmeans2AssignCte,
      cntc AS (SELECT cid, COUNT(*) AS n FROM a1 GROUP BY 1),
      wq AS (SELECT cid,
               CAST(FLOOR(1000000.0 * sqrt(CAST(n AS DOUBLE))) AS BIGINT)
                 AS w
             FROM cntc),
      z AS (SELECT CAST(SUM(w) AS BIGINT) AS z FROM wq),
      bud AS (SELECT cid,
                GREATEST(CAST(1 AS BIGINT), CAST((200 * w) // z.z AS BIGINT))
                  AS b
              FROM wq, z),
      rk AS (SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY cid
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
             FROM a1)
      SELECT rk.vec_id, CAST(rk.cid AS BIGINT) AS centroid_id
      FROM rk JOIN bud ON bud.cid = rk.cid WHERE rk.rk <= bud.b""",
    "q30_dedup_exact" -> s"""
      SELECT md5(${normSql("text")}) AS text_md5,
        MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents GROUP BY 1""",

    "q31_minhash_sig" -> minhashSql(4),

    "q32_minhash_lsh_pairs" -> s"""
      WITH sig AS (${minhashSql(8)}),
      bands AS (
        SELECT doc_id, b.band,
          CASE b.band
            WHEN 0 THEN CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)
            WHEN 1 THEN CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)
            WHEN 2 THEN CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR)
            ELSE CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) END AS band_sig
        FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b)
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM bands l JOIN bands r
        ON l.band = r.band AND l.band_sig = r.band_sig AND l.doc_id < r.doc_id""",

    "q33_simhash" -> s"""
      WITH toks AS (
        SELECT doc_id, md5(tok.t) AS h
        FROM (SELECT doc_id, ${normSql("text")} AS nt FROM documents) d,
          LATERAL UNNEST(string_split(d.nt, ' ')) AS tok(t)),
      votes AS (
        SELECT doc_id, j,
          CAST(SUM(CASE WHEN strpos('89abcdef', substr(h, j, 1)) > 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
        FROM toks, generate_series(1, 32) AS g(j)
        GROUP BY doc_id, j)
      SELECT doc_id,
        CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << (j - 1)) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id""",

    "q135_cdc_chunks" -> s"""
      WITH nd AS (SELECT doc_id, ${normSql("text")} AS nt FROM documents),
      b AS (SELECT doc_id, nt,
              list_filter(range(16, GREATEST(length(nt) - 1, 15) + 1),
                i -> i >= 16 AND i <= length(nt) - 1
                  AND md5(substr(nt, i - 15, 16)) LIKE '00%') AS bounds
            FROM nd),
      sp AS (SELECT doc_id, nt,
               list_prepend(1, list_transform(bounds, p -> p + 1)) AS starts,
               list_append(bounds, length(nt)) AS ends
             FROM b)
      SELECT doc_id, CAST(g.i - 1 AS BIGINT) AS chunk_no,
        CAST(ends[g.i] - starts[g.i] + 1 AS BIGINT) AS n_chars,
        md5(substr(nt, starts[g.i], ends[g.i] - starts[g.i] + 1)) AS chunk_hash
      FROM sp, LATERAL UNNEST(range(1, len(starts) + 1)) AS g(i)
      WHERE ends[g.i] - starts[g.i] + 1 > 0""",

    "q134_simhash_pairs" -> s"""
      WITH toks AS (
        SELECT doc_id, md5(tok.t) AS h
        FROM (SELECT doc_id, ${normSql("text")} AS nt FROM documents) d,
          LATERAL UNNEST(string_split(d.nt, ' ')) AS tok(t)),
      votes AS (
        SELECT doc_id, j,
          CAST(SUM(CASE WHEN strpos('89abcdef', substr(h, j, 1)) > 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
        FROM toks, generate_series(1, 32) AS g(j)
        GROUP BY doc_id, j),
      sh AS (SELECT doc_id,
        CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << (j - 1)) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id),
      ch AS (SELECT doc_id, simhash, g.band,
               (simhash >> (g.band * 8)) & 255 AS chunk
             FROM sh, generate_series(0, 3) AS g(band))
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
        CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
      FROM ch l JOIN ch r
        ON l.band = r.band AND l.chunk = r.chunk AND l.doc_id < r.doc_id
      WHERE bit_count(xor(l.simhash, r.simhash)) <= 3""",

    "q34_ngram_jaccard" -> s"""
      WITH sh AS (${shinglesSql(3)}),
      arrs AS (SELECT doc_id, list(sh) AS shs FROM sh GROUP BY doc_id),
      pairs AS (
        SELECT l.doc_id AS a, r.doc_id AS b
        FROM documents l JOIN documents r
          ON l.source = r.source AND l.doc_id < r.doc_id
          AND r.doc_id - l.doc_id <= 40)
      SELECT p.a, p.b,
        CAST(len(list_intersect(la.shs, lb.shs)) AS BIGINT) AS intersection,
        CAST(len(la.shs) + len(lb.shs) - len(list_intersect(la.shs, lb.shs)) AS BIGINT) AS union_size
      FROM pairs p
      JOIN arrs la ON la.doc_id = p.a
      JOIN arrs lb ON lb.doc_id = p.b""",

    "q192_prefix_filter_join" -> s"""
      WITH nd AS (SELECT doc_id AS id, ${normSql("COALESCE(text, '')")} AS nt
                  FROM documents WHERE doc_id % 3 = 0),
      tk AS (SELECT DISTINCT id,
               ('0x' || substr(md5(substr(nt, g.i, 6)), 1, 10))::BIGINT AS tok
             FROM nd, LATERAL UNNEST(range(1, GREATEST(length(nt) - 5, 1) + 1))
               AS g(i)
             WHERE substr(nt, g.i, 6) <> ''),
      dfc AS (SELECT tok, COUNT(*) AS dfn FROM tk GROUP BY 1),
      rk AS (SELECT tk.id, tk.tok,
               row_number() OVER (PARTITION BY tk.id
                 ORDER BY dfc.dfn, tk.tok) AS rk,
               COUNT(*) OVER (PARTITION BY tk.id) AS n
             FROM tk JOIN dfc ON tk.tok = dfc.tok),
      pre AS (SELECT id, tok FROM rk
              WHERE rk <= n - ((1 * n + 2 - 1) // 2) + 1),
      cand AS (SELECT DISTINCT a.id AS a, b.id AS b
               FROM pre a JOIN pre b ON a.tok = b.tok AND a.id < b.id),
      sets AS (SELECT id, list_distinct(list(tok)) AS s FROM tk GROUP BY 1),
      v AS (SELECT c.a, c.b,
              CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS intersection,
              CAST(len(sa.s) AS BIGINT) AS n_a,
              CAST(len(sb.s) AS BIGINT) AS n_b
            FROM cand c JOIN sets sa ON sa.id = c.a
            JOIN sets sb ON sb.id = c.b)
      SELECT a, b, intersection, n_a, n_b FROM v
      WHERE 2 * intersection >= 1 * (n_a + n_b - intersection)""",

    "q207_prefix_join_rs" -> s"""
      WITH nd AS (SELECT doc_id AS id, doc_id % 5 = 0 AS lft,
                    ${normSql("COALESCE(text, '')")} AS nt
                  FROM documents),
      tk AS (SELECT DISTINCT id, lft,
               ('0x' || substr(md5(substr(nt, g.i, 6)), 1, 10))::BIGINT AS tok
             FROM nd, LATERAL UNNEST(range(1, GREATEST(length(nt) - 5, 1) + 1))
               AS g(i)
             WHERE substr(nt, g.i, 6) <> ''),
      dfc AS (SELECT tok, COUNT(*) AS dfn FROM tk GROUP BY 1),
      rk AS (SELECT tk.id, tk.lft, tk.tok,
               row_number() OVER (PARTITION BY tk.id
                 ORDER BY dfc.dfn, tk.tok) AS rk,
               COUNT(*) OVER (PARTITION BY tk.id) AS n
             FROM tk JOIN dfc ON tk.tok = dfc.tok),
      pre AS (SELECT id, lft, tok FROM rk
              WHERE rk <= n - ((1 * n + 2 - 1) // 2) + 1),
      cand AS (SELECT DISTINCT a.id AS a, b.id AS b
               FROM pre a JOIN pre b ON a.tok = b.tok
               WHERE a.lft AND NOT b.lft),
      sets AS (SELECT id, list_distinct(list(tok)) AS s FROM tk GROUP BY 1),
      v AS (SELECT c.a, c.b,
              CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS intersection,
              CAST(len(sa.s) AS BIGINT) AS n_a,
              CAST(len(sb.s) AS BIGINT) AS n_b
            FROM cand c JOIN sets sa ON sa.id = c.a
            JOIN sets sb ON sb.id = c.b)
      SELECT a, b, intersection, n_a, n_b FROM v
      WHERE 2 * intersection >= 1 * (n_a + n_b - intersection)""",

    // q207's algorithm on the %7 two-slice corpus; the cap (8) never
    // binds here, so the oracle is simply the exact join PLUS the loud
    // per-left match count (window AFTER the threshold filter, exactly
    // like capPerLeft counts the thresholded output)
    "q214_prefix_join_capped" -> s"""
      WITH nd AS (SELECT doc_id AS id, doc_id % 7 = 0 AS lft,
                    ${normSql("COALESCE(text, '')")} AS nt
                  FROM documents WHERE doc_id % 7 <= 1),
      tk AS (SELECT DISTINCT id, lft,
               ('0x' || substr(md5(substr(nt, g.i, 6)), 1, 10))::BIGINT AS tok
             FROM nd, LATERAL UNNEST(range(1, GREATEST(length(nt) - 5, 1) + 1))
               AS g(i)
             WHERE substr(nt, g.i, 6) <> ''),
      dfc AS (SELECT tok, COUNT(*) AS dfn FROM tk GROUP BY 1),
      rk AS (SELECT tk.id, tk.lft, tk.tok,
               row_number() OVER (PARTITION BY tk.id
                 ORDER BY dfc.dfn, tk.tok) AS rk,
               COUNT(*) OVER (PARTITION BY tk.id) AS n
             FROM tk JOIN dfc ON tk.tok = dfc.tok),
      pre AS (SELECT id, lft, tok FROM rk
              WHERE rk <= n - ((1 * n + 2 - 1) // 2) + 1),
      cand AS (SELECT DISTINCT a.id AS a, b.id AS b
               FROM pre a JOIN pre b ON a.tok = b.tok
               WHERE a.lft AND NOT b.lft),
      sets AS (SELECT id, list_distinct(list(tok)) AS s FROM tk GROUP BY 1),
      v AS (SELECT c.a, c.b,
              CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS intersection,
              CAST(len(sa.s) AS BIGINT) AS n_a,
              CAST(len(sb.s) AS BIGINT) AS n_b
            FROM cand c JOIN sets sa ON sa.id = c.a
            JOIN sets sb ON sb.id = c.b)
      SELECT a, b, intersection, n_a, n_b,
        COUNT(*) OVER (PARTITION BY a) AS n_matches
      FROM v
      WHERE 2 * intersection >= 1 * (n_a + n_b - intersection)""",

    "q187_containment" -> s"""
      WITH sh AS (${shinglesSql(3)}),
      arrs AS (SELECT doc_id, list_distinct(list(sh)) AS shs
               FROM sh GROUP BY doc_id),
      pairs AS (
        SELECT l.doc_id AS a, r.doc_id AS b
        FROM documents l JOIN documents r
          ON l.source = r.source AND l.doc_id < r.doc_id
          AND r.doc_id - l.doc_id <= 40)
      SELECT p.a, p.b,
        CAST(len(list_intersect(la.shs, lb.shs)) AS BIGINT) AS intersection,
        CAST(len(la.shs) AS BIGINT) AS n_a,
        CAST(len(lb.shs) AS BIGINT) AS n_b
      FROM pairs p
      JOIN arrs la ON la.doc_id = p.a
      JOIN arrs lb ON lb.doc_id = p.b""",

    "q133_edit_distance" -> s"""
      WITH nd AS (SELECT doc_id, ${normSql("text")} AS nt FROM documents),
      pairs AS (
        SELECT l.doc_id AS a, r.doc_id AS b
        FROM documents l JOIN documents r
          ON l.source = r.source AND l.doc_id < r.doc_id
          AND r.doc_id - l.doc_id <= 40)
      SELECT p.a, p.b,
        CAST(levenshtein(la.nt, lb.nt) AS BIGINT) AS edit_distance,
        CAST(GREATEST(length(la.nt), length(lb.nt)) AS BIGINT) AS max_len
      FROM pairs p
      JOIN nd la ON la.doc_id = p.a
      JOIN nd lb ON lb.doc_id = p.b""",

    "q35_cosine_topk" -> """
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_inner_product(q.e, c.e) /
            (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(c.e, c.e))) AS cos
        FROM v q JOIN v c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 24),
      ranked AS (
        SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
        FROM scored)
      SELECT query_id, rk, neighbor_id FROM ranked WHERE rk <= 3""",

    "q172_unicode_nfc" -> """
      WITH t AS (SELECT doc_id,
          COALESCE(text, '') || ' cafe' || chr(769) || ' A' || chr(778) AS raw
        FROM documents)
      SELECT doc_id, nfc_normalize(raw) AS nfc_text,
        nfc_normalize(raw) <> raw AS changed,
        CAST(length(raw) AS BIGINT) AS n_chars_raw,
        CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_chars_nfc
      FROM t""",

    "q165_feature_hashing" -> s"""
      WITH t AS (SELECT doc_id,
                   string_split(${normSql("COALESCE(text, '')")}, ' ') AS toks
                 FROM documents),
      tok AS (SELECT doc_id, tk FROM t, LATERAL UNNEST(toks) AS u(tk)
              WHERE tk <> ''),
      f AS (SELECT doc_id,
              ('0x' || substr(md5('fh:' || tk), 1, 12))::BIGINT % 32 AS j,
              CASE WHEN ('0x' || substr(md5('sg:' || tk), 1, 12))::BIGINT
                        % 2 = 0
                   THEN 1 ELSE -1 END AS s
            FROM tok)
      SELECT doc_id, CAST(j AS BIGINT) AS j, CAST(SUM(s) AS BIGINT) AS val
      FROM f GROUP BY 1, 2""",

    "q169_hashed_cosine" -> s"""
      WITH t AS (SELECT doc_id,
                   string_split(${normSql("COALESCE(text, '')")}, ' ') AS toks
                 FROM documents),
      tok AS (SELECT doc_id, tk FROM t, LATERAL UNNEST(toks) AS u(tk)
              WHERE tk <> ''),
      hv AS (SELECT doc_id,
               ('0x' || substr(md5('fh:' || tk), 1, 12))::BIGINT % 32 AS j,
               CAST(SUM(CASE WHEN ('0x' || substr(md5('sg:' || tk), 1, 12))::BIGINT
                                  % 2 = 0
                             THEN 1 ELSE -1 END) AS BIGINT) AS val
             FROM tok GROUP BY 1, 2),
      grid AS (SELECT d.doc_id, g.j
               FROM (SELECT DISTINCT doc_id FROM hv) d,
                    generate_series(0, 31) g(j)),
      vv AS (SELECT grid.doc_id, grid.j, COALESCE(hv.val, 0) AS val
             FROM grid LEFT JOIN hv ON grid.doc_id = hv.doc_id
               AND grid.j = hv.j),
      vec AS (SELECT doc_id, list(CAST(val AS DOUBLE) ORDER BY j) AS e
              FROM vv GROUP BY 1),
      nz AS (SELECT doc_id, e FROM vec WHERE list_inner_product(e, e) > 0),
      scored AS (
        SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
          list_inner_product(q.e, c.e) /
            (sqrt(list_inner_product(q.e, q.e)) *
             sqrt(list_inner_product(c.e, c.e))) AS cos
        FROM nz q JOIN nz c ON q.doc_id <> c.doc_id
        WHERE q.doc_id < 16),
      ranked AS (
        SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, neighbor_id ASC) AS rk
        FROM scored)
      SELECT query_id, rk, neighbor_id FROM ranked WHERE rk <= 3""",

    "q159_random_projection" -> """
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      q AS (SELECT vec_id, i, CAST(FLOOR(e[i + 1] * 1000) AS BIGINT) AS qv
            FROM v, generate_series(0, 63) g(i)),
      s AS (SELECT i, j,
              CASE WHEN ('0x' || substr(md5('rp:' || i || ':' || j), 1, 12))::BIGINT
                        % 2 = 0
                   THEN 1 ELSE -1 END AS sgn
            FROM generate_series(0, 63) gi(i), generate_series(0, 15) gj(j))
      SELECT q.vec_id, CAST(s.j AS INT) AS j,
        CAST(SUM(q.qv * s.sgn) AS BIGINT) AS val
      FROM q JOIN s USING (i) GROUP BY 1, 2""",

    "q37_langid" -> langIdOracle,

    "q38_quality" -> s"""
      WITH d AS (SELECT doc_id, text, ${normSql("text")} AS nt FROM documents),
      m AS (SELECT doc_id, text, nt,
        CAST(length(nt) AS BIGINT) AS n_chars_norm,
        CAST(length(string_split(nt, ' ')) AS BIGINT) AS n_tokens,
        CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
        ${stopCountSql("en")} AS n_stopwords_en
      FROM d)
      SELECT doc_id, n_chars_norm, n_tokens, n_punct, n_stopwords_en,
        CAST(FLOOR(CAST(n_chars_norm - (n_tokens - 1) AS DOUBLE) * 100.0
          / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS mean_token_len_e2,
        (n_tokens >= 10 AND n_chars_norm >= 50 AND n_punct * 5 <= n_tokens)
          AS quality_keep
      FROM m""",

    "q39_token_counts" -> s"""
      SELECT doc_id,
        CAST(length(string_split(${normSql("text")}, ' ')) AS BIGINT) AS n_ws_tokens,
        CAST(length(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpeish
      FROM documents""",

    "q40_fingerprint" -> s"""
      WITH sh AS (${shinglesSql(8)})
      SELECT d.doc_id, md5(${normSql("text")}) AS fp_md5,
        (SELECT MIN(md5(sh.sh)) FROM sh WHERE sh.doc_id = d.doc_id) AS fp_min_shingle
      FROM documents d""",

    "q46_ngram_profile" -> s"""
      WITH sh AS (
        SELECT DISTINCT d.doc_id, d.lang, substr(d.nt, g.i, 2) AS ngram FROM (
          SELECT doc_id, lang, ${normSql("text")} AS nt FROM documents) d,
          LATERAL UNNEST(range(1, GREATEST(length(d.nt) - 1, 1) + 1)) AS g(i)),
      counts AS (
        SELECT lang, ngram, COUNT(*) AS freq FROM sh GROUP BY lang, ngram),
      ranked AS (
        SELECT lang, ngram, freq,
          row_number() OVER (PARTITION BY lang ORDER BY freq DESC, ngram ASC) AS rank
        FROM counts)
      SELECT lang, ngram, freq, rank FROM ranked WHERE rank <= 10""",

    "q41_multimodal_stub" -> """
      WITH b AS (SELECT doc_id AS asset_id,
        encode(text) AS payload FROM documents),
      m AS (SELECT asset_id,
        CAST(octet_length(payload) AS BIGINT) AS n_bytes,
        md5(payload::VARCHAR) AS content_md5 FROM b)
      SELECT asset_id, n_bytes, content_md5,
        CAST(GREATEST(1, LEAST(64, n_bytes)) AS INT) AS width,
        CAST(GREATEST(1, n_bytes // GREATEST(1, LEAST(64, n_bytes))) AS INT) AS height,
        1 AS n_frames
      FROM m""",

    "q49_image_decode" -> """
      WITH d AS (SELECT doc_id AS asset_id FROM documents),
      px AS (
        SELECT asset_id, (asset_id * 31 + x * 7 + y * 13) % 256 AS g
        FROM d, generate_series(0, 15) gx(x), generate_series(0, 15) gy(y)),
      c AS (SELECT asset_id, g // 16 AS bin, COUNT(*) AS cnt
            FROM px GROUP BY 1, 2),
      db AS (SELECT asset_id, bin
             FROM d, (SELECT UNNEST(generate_series(0, 15)) AS bin))
      SELECT db.asset_id, 16 AS width, 16 AS height,
        CAST(db.bin AS INT) AS bin,
        CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      FROM db LEFT JOIN c ON db.asset_id = c.asset_id AND db.bin = c.bin""",

    "q59_audio_decode" -> pcmHistogramOracle,
    "q171_audio_avi" -> pcmHistogramOracle,

    "q68_video_frames" -> """
      WITH d AS (SELECT doc_id AS asset_id, doc_id % 3 + 2 AS nf FROM documents),
      fr AS (SELECT asset_id, nf, f
             FROM d, generate_series(0, 3) g(f)
             WHERE f < nf AND f % 2 = 0),
      px AS (
        SELECT asset_id, nf, f,
          (asset_id * 31 + f * 41 + x * 7 + y * 13) % 256 AS v
        FROM fr, generate_series(0, 7) gx(x), generate_series(0, 7) gy(y)),
      c AS (SELECT asset_id, f, v // 16 AS bin, COUNT(*) AS cnt
            FROM px GROUP BY 1, 2, 3),
      db AS (SELECT asset_id, nf, f, bin
             FROM fr, (SELECT UNNEST(generate_series(0, 15)) AS bin))
      SELECT db.asset_id, 8 AS width, 8 AS height, CAST(db.nf AS INT) AS n_frames,
        CAST(db.f AS INT) AS frame_idx, CAST(db.bin AS INT) AS bin,
        CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      FROM db LEFT JOIN c
        ON db.asset_id = c.asset_id AND db.f = c.f AND db.bin = c.bin""",

    "q202_mjpeg_avi" -> """
      SELECT doc_id, CAST(g.f AS INT) AS frame_idx,
        16 AS width, 16 AS height,
        CAST(doc_id % 3 + 2 AS INT) AS n_frames, TRUE AS ok
      FROM documents, LATERAL UNNEST(range(0, doc_id % 3 + 2)) AS g(f)""",

    "q158_video_avi" -> """
      WITH d AS (SELECT doc_id AS asset_id, doc_id % 3 + 2 AS nf FROM documents),
      fr AS (SELECT asset_id, nf, f
             FROM d, generate_series(0, 3) g(f)
             WHERE f < nf AND f % 2 = 0),
      px AS (
        SELECT asset_id, nf, f,
          (asset_id * 37 + f * 43 + x * 5 + y * 11) % 256 AS v
        FROM fr, generate_series(0, 7) gx(x), generate_series(0, 7) gy(y)),
      c AS (SELECT asset_id, f, v // 16 AS bin, COUNT(*) AS cnt
            FROM px GROUP BY 1, 2, 3),
      db AS (SELECT asset_id, nf, f, bin
             FROM fr, (SELECT UNNEST(generate_series(0, 15)) AS bin))
      SELECT db.asset_id, 8 AS width, 8 AS height, CAST(db.nf AS INT) AS n_frames,
        CAST(db.f AS INT) AS frame_idx, CAST(db.bin AS INT) AS bin,
        CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      FROM db LEFT JOIN c
        ON db.asset_id = c.asset_id AND db.f = c.f AND db.bin = c.bin""",

    "q170_video_resize" -> """
      WITH d AS (SELECT doc_id AS asset_id, doc_id % 3 + 2 AS nf FROM documents),
      fr AS (SELECT asset_id, nf, f
             FROM d, generate_series(0, 3) g(f)
             WHERE f < nf AND f % 2 = 0),
      px AS (
        SELECT asset_id, nf, f,
          (asset_id * 37 + f * 43 + (2 * x) * 5 + (2 * y) * 11) % 256 AS v
        FROM fr, generate_series(0, 3) gx(x), generate_series(0, 3) gy(y)),
      c AS (SELECT asset_id, f, v // 16 AS bin, COUNT(*) AS cnt
            FROM px GROUP BY 1, 2, 3),
      db AS (SELECT asset_id, nf, f, bin
             FROM fr, (SELECT UNNEST(generate_series(0, 15)) AS bin))
      SELECT db.asset_id, 8 AS width, 8 AS height, CAST(db.nf AS INT) AS n_frames,
        CAST(db.f AS INT) AS frame_idx, 4 AS out_w, 4 AS out_h,
        CAST(db.bin AS INT) AS bin,
        CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      FROM db LEFT JOIN c
        ON db.asset_id = c.asset_id AND db.f = c.f AND db.bin = c.bin""",

    "q50_repetition" -> s"""
      WITH t AS (SELECT doc_id,
                   string_split(${normSql("COALESCE(text, '')")}, ' ') AS toks
                 FROM documents),
      base AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
        toks FROM t),
      g AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram
            FROM base, LATERAL UNNEST(range(1, CAST(n_tokens AS INT))) AS r(i)
            WHERE n_tokens >= 2),
      gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
      gm AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS max_2gram_count,
             CAST(SUM(c) AS BIGINT) AS n_2grams FROM gc GROUP BY 1)
      SELECT base.doc_id, n_tokens, n_distinct_tokens,
        CAST(COALESCE(gm.max_2gram_count, 0) AS BIGINT) AS max_2gram_count,
        CAST(COALESCE(gm.n_2grams, 0) AS BIGINT) AS n_2grams
      FROM base LEFT JOIN gm ON base.doc_id = gm.doc_id""",

    "q51_pii_scrub" -> s"""
      WITH n AS (SELECT doc_id, ${normSql("text")} AS nt FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(nt, '${TextAnalysis.EmailPattern}')) AS BIGINT)
          AS n_emails,
        CAST(len(regexp_extract_all(nt, '${TextAnalysis.LongNumberPattern}')) AS BIGINT)
          AS n_long_numbers,
        regexp_replace(regexp_replace(nt, '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
          '${TextAnalysis.LongNumberPattern}', '<NUM>', 'g') AS redacted_text
      FROM n""",

    "q52_split" -> """
      WITH b AS (SELECT doc_id,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100
          AS bucket
        FROM documents)
      SELECT doc_id, bucket,
        CASE WHEN bucket < 80 THEN 'train'
             WHEN bucket < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM b""",

    "q117_weighted_sample" -> """
      SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS w FROM documents
      WHERE length(text) * 1 >= 2048
         OR ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10))::BIGINT * 2048
            < length(text) * 1 * 1099511627776""",

    "q118_lm_score" -> charLmOracle,
    "q166_charlm_roundtrip" -> charLmOracle,
    "q167_charlm_append" -> charLmOracle,

    "q124_repeated_spans" -> s"""
      WITH nd AS (SELECT doc_id, ${normSql("text")} AS nt FROM documents),
      g AS (SELECT nd.doc_id, substr(nd.nt, i.i, 24) AS span FROM nd,
              LATERAL UNNEST(range(1, GREATEST(length(nd.nt) - 23, 1) + 1)) AS i(i)
            WHERE length(substr(nd.nt, i.i, 24)) = 24)
      SELECT span, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM g GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2""",

    "q125_quantile_sketch" -> s"""
      WITH m AS (SELECT lang,
                   CAST(length(string_split(${normSql("text")}, ' ')) AS DOUBLE)
                     AS v
                 FROM documents),
      cum AS (SELECT lang, v,
                SUM(1) OVER (PARTITION BY lang ORDER BY v) AS cum,
                COUNT(*) OVER (PARTITION BY lang) AS n
              FROM m)
      SELECT lang,
        MIN(CASE WHEN cum >= ceil(0.25 * CAST(n AS DOUBLE)) THEN v END) AS p25,
        MIN(CASE WHEN cum >= ceil(0.50 * CAST(n AS DOUBLE)) THEN v END) AS p50,
        MIN(CASE WHEN cum >= ceil(0.75 * CAST(n AS DOUBLE)) THEN v END) AS p75,
        CAST(COUNT(*) AS BIGINT) AS n_sampled
      FROM cum GROUP BY 1""",

    "q126_span_coverage" -> s"""
      WITH nd AS (SELECT doc_id, ${normSql("text")} AS nt FROM documents),
      g AS (SELECT nd.doc_id, substr(nd.nt, i.i, 24) AS span FROM nd,
              LATERAL UNNEST(range(1, GREATEST(length(nd.nt) - 23, 1) + 1)) AS i(i)
            WHERE length(substr(nd.nt, i.i, 24)) = 24),
      w AS (SELECT doc_id, span, COUNT(*) AS c FROM g GROUP BY 1, 2),
      s AS (SELECT span, COUNT(*) AS span_docs FROM w GROUP BY 1)
      SELECT doc_id,
        CAST(SUM(c) AS BIGINT) AS n_windows,
        CAST(SUM(CASE WHEN s.span_docs >= 2 THEN c ELSE 0 END) AS BIGINT)
          AS n_dup_windows
      FROM w JOIN s USING (span) GROUP BY 1""",

    "q131_bpe_train" -> bpeOracle(6),

    "q132_bpe_encode" -> bpeApplyOracle(6),

    "q141_bpe_batched" -> bpeBatchedOracle(8, 4),

    // mirror of Dedup.winnowedSpanStats at spanLen=24, w=8: per doc, hash
    // every 24-char window, winnow-select the rightmost min of each run
    // of 8 consecutive hashes (one short window when fewer than 8), then
    // q126's count pipeline over the SELECTED spans only
    "q142_winnowed_spans" -> s"""
      WITH nd AS (SELECT doc_id, ${normSql("text")} AS nt FROM documents),
      sp AS (SELECT doc_id,
               list_filter(list_transform(range(1, GREATEST(length(nt) - 23, 1) + 1),
                 i -> substr(nt, i, 24)), g -> length(g) = 24) AS spans
             FROM nd),
      h AS (SELECT doc_id, spans,
              list_transform(spans,
                s -> ('0x' || substr(md5(s), 1, 12))::BIGINT) AS hs
            FROM sp WHERE len(spans) >= 1),
      selpos AS (SELECT doc_id, spans,
          list_distinct(list_transform(range(1, GREATEST(len(hs) - 7, 1) + 1),
            i -> CAST(i AS INT) + len(hs[i:i+7])
               - CAST(list_position(list_reverse(hs[i:i+7]),
                   list_aggregate(hs[i:i+7], 'min')) AS INT))) AS sel
        FROM h),
      wnd AS (SELECT doc_id, spans[p.p] AS span
              FROM selpos, LATERAL UNNEST(sel) AS p(p)),
      pds AS (SELECT doc_id, span, COUNT(*) AS c FROM wnd GROUP BY 1, 2),
      ps AS (SELECT span, COUNT(*) AS span_docs FROM pds GROUP BY 1)
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_windows_sampled,
        CAST(SUM(CASE WHEN ps.span_docs >= 2 THEN c ELSE 0 END) AS BIGINT)
          AS n_dup_windows_sampled
      FROM pds JOIN ps USING (span) GROUP BY 1""",

    "q130_group_topk" -> s"""
      WITH t AS (SELECT lang,
          UNNEST(string_split(${normSql("text")}, ' ')) AS token
        FROM documents)
      SELECT lang, token AS item,
        CAST(COUNT(*) AS BIGINT) AS count,
        CAST(0 AS BIGINT) AS err
      FROM t WHERE token <> ''
      GROUP BY 1, 2 HAVING COUNT(*) >= 5""",

    "q72_vocabulary" -> s"""
      WITH t AS (SELECT doc_id,
          UNNEST(string_split(${normSql("text")}, ' ')) AS token
        FROM documents)
      SELECT token,
        CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM t WHERE token <> ''
      GROUP BY 1 ORDER BY n_occurrences DESC, token LIMIT 100""",

    "q73_clean_corpus" -> s"""
      WITH d AS (SELECT doc_id, lang, text, ${normSql("text")} AS nt
                 FROM documents),
      m AS (SELECT doc_id, lang, nt,
        CAST(length(nt) AS BIGINT) AS n_chars_norm,
        CAST(length(string_split(nt, ' ')) AS BIGINT) AS n_tokens,
        CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct
      FROM d),
      k AS (SELECT * FROM m
            WHERE n_tokens >= 10 AND n_chars_norm >= 50
              AND n_punct * 5 <= n_tokens),
      dd AS (SELECT *, MIN(doc_id) OVER (PARTITION BY md5(nt)) AS keep_id
             FROM k),
      kept AS (SELECT * FROM dd WHERE doc_id = keep_id),
      samp AS (SELECT * FROM kept
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
          % 100 < CASE lang WHEN 'en' THEN 60 ELSE 80 END)
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
      FROM samp GROUP BY 1""",

    "q71_stratified_sample" -> """
      WITH b AS (SELECT doc_id, lang,
        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100
          AS bucket
        FROM documents)
      SELECT doc_id, lang FROM b
      WHERE bucket < CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 30
                     ELSE 10 END""",

    "q108_mixture" -> """
      WITH t AS (SELECT doc_id, source, n_chars,
              md5(CAST(doc_id AS VARCHAR)) AS hk,
              CASE source WHEN 'src0' THEN 4000 WHEN 'src1' THEN 2000
                WHEN 'src2' THEN 1000000 WHEN 'src3' THEN 1 END AS budget
            FROM documents),
      p AS (SELECT doc_id, source, n_chars, budget,
              COALESCE(SUM(n_chars) OVER (PARTITION BY source
                ORDER BY hk, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS prefix
            FROM t WHERE budget IS NOT NULL)
      SELECT doc_id, source, n_chars FROM p WHERE prefix < budget""",

    "q36_ann_lsh_buckets" -> s"""
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      b AS (SELECT vec_id, ${bucketSql("e", 8)} AS bucket FROM v)
      SELECT bucket, COUNT(*) AS n, MIN(vec_id) AS min_id
      FROM b GROUP BY bucket""",

    "q45_dedup_clusters" -> s"""
      WITH RECURSIVE
      prs AS (
        WITH sig AS (${minhashSql(8)}),
        bands AS (
          SELECT doc_id, b.band,
            CASE b.band
              WHEN 0 THEN CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)
              WHEN 1 THEN CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)
              WHEN 2 THEN CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR)
              ELSE CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) END AS band_sig
          FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b)
        SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        FROM bands l JOIN bands r
          ON l.band = r.band AND l.band_sig = r.band_sig AND l.doc_id < r.doc_id),
      edges AS (SELECT a AS src, b AS dst FROM prs
                UNION SELECT b, a FROM prs),
      reach(node, other) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.other)
      SELECT node, MIN(other) AS cluster_id FROM reach GROUP BY node""",

    // q45's recursive-CTE clusters, every doc joined in (singleton =
    // own id), split = md5 bucket of the CLUSTER key (mirrors
    // Sampling.splitCol over Sampling.hashBucket)
    "q210_cluster_split" -> s"""
      WITH RECURSIVE
      prs AS (
        WITH sig AS (${minhashSql(8)}),
        bands AS (
          SELECT doc_id, b.band,
            CASE b.band
              WHEN 0 THEN CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)
              WHEN 1 THEN CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)
              WHEN 2 THEN CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR)
              ELSE CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) END AS band_sig
          FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b)
        SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        FROM bands l JOIN bands r
          ON l.band = r.band AND l.band_sig = r.band_sig AND l.doc_id < r.doc_id),
      edges AS (SELECT a AS src, b AS dst FROM prs
                UNION SELECT b, a FROM prs),
      reach(node, other) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.other),
      cl AS (SELECT node, MIN(other) AS cid FROM reach GROUP BY node),
      keyed AS (SELECT d.doc_id, COALESCE(cl.cid, d.doc_id) AS cluster_id
                FROM documents d LEFT JOIN cl ON cl.node = d.doc_id),
      bk AS (SELECT doc_id, cluster_id,
               ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 12))::BIGINT
                 % 100 AS b
             FROM keyed)
      SELECT doc_id, cluster_id,
        CASE WHEN b < 80 THEN 'train'
             WHEN b < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM bk""",

    // q210 over string ids: the node space is the 48-bit md5 prefix of
    // the string id ('doc-' || doc_id), replayed here on the pair edges,
    // on each doc's own join key, and (for singletons) as the cluster id
    // itself; the split bucket then hashes the DECIMAL rendering of the
    // hashed cluster key, exactly like Sampling.splitCol over hashBucket
    "q212_cluster_split_str" -> s"""
      WITH RECURSIVE
      prs AS (
        WITH sig AS (${minhashSql(8)}),
        bands AS (
          SELECT doc_id, b.band,
            CASE b.band
              WHEN 0 THEN CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)
              WHEN 1 THEN CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)
              WHEN 2 THEN CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR)
              ELSE CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) END AS band_sig
          FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b)
        SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        FROM bands l JOIN bands r
          ON l.band = r.band AND l.band_sig = r.band_sig AND l.doc_id < r.doc_id),
      hp AS (SELECT
               ('0x' || substr(md5('doc-' || CAST(a AS VARCHAR)), 1, 12))::BIGINT AS ha,
               ('0x' || substr(md5('doc-' || CAST(b AS VARCHAR)), 1, 12))::BIGINT AS hb
             FROM prs),
      edges AS (SELECT ha AS src, hb AS dst FROM hp
                UNION SELECT hb, ha FROM hp),
      reach(node, other) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.other),
      cl AS (SELECT node, MIN(other) AS cid FROM reach GROUP BY node),
      hd AS (SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS sid,
               ('0x' || substr(md5('doc-' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS hid
             FROM documents),
      keyed AS (SELECT hd.sid, COALESCE(cl.cid, hd.hid) AS cluster_id
                FROM hd LEFT JOIN cl ON cl.node = hd.hid),
      bk AS (SELECT sid, cluster_id,
               ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 12))::BIGINT
                 % 100 AS b
             FROM keyed)
      SELECT sid, cluster_id,
        CASE WHEN b < 80 THEN 'train'
             WHEN b < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM bk""",

    // q210's split over the bucket-CAPPED pair set: buckets at or under
    // the cap (8) contribute all pairs, larger buckets contribute the
    // consecutive-id chain — mirroring lshCandidatePairs' window split
    // (COUNT and LEAD over the same (band, band_sig) partition)
    "q215_cluster_split_capped" -> s"""
      WITH RECURSIVE
      prs AS (
        WITH sig AS (${minhashSql(8)}),
        bands AS (
          SELECT doc_id, b.band,
            CASE b.band
              WHEN 0 THEN CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)
              WHEN 1 THEN CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)
              WHEN 2 THEN CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR)
              ELSE CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) END AS band_sig
          FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b),
        sized AS (
          SELECT doc_id, band, band_sig,
            COUNT(*) OVER (PARTITION BY band, band_sig) AS bn,
            LEAD(doc_id) OVER (PARTITION BY band, band_sig
                               ORDER BY doc_id) AS nid
          FROM bands)
        SELECT DISTINCT a, b FROM (
          SELECT l.doc_id AS a, r.doc_id AS b
          FROM sized l JOIN sized r
            ON l.band = r.band AND l.band_sig = r.band_sig
           AND l.doc_id < r.doc_id
          WHERE l.bn <= 8
          UNION ALL
          SELECT doc_id AS a, nid AS b FROM sized
          WHERE bn > 8 AND nid IS NOT NULL)),
      edges AS (SELECT a AS src, b AS dst FROM prs
                UNION SELECT b, a FROM prs),
      reach(node, other) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.other),
      cl AS (SELECT node, MIN(other) AS cid FROM reach GROUP BY node),
      keyed AS (SELECT d.doc_id, COALESCE(cl.cid, d.doc_id) AS cluster_id
                FROM documents d LEFT JOIN cl ON cl.node = d.doc_id),
      bk AS (SELECT doc_id, cluster_id,
               ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 12))::BIGINT
                 % 100 AS b
             FROM keyed)
      SELECT doc_id, cluster_id,
        CASE WHEN b < 80 THEN 'train'
             WHEN b < 90 THEN 'val'
             ELSE 'test' END AS split
      FROM bk""",

    // q45's recursive-CTE clusters + per-cluster argmax: highest n_chars
    // wins, ties by smallest doc_id; unclustered docs are their own
    // singleton cluster
    "q111_dedup_keep_best" -> s"""
      WITH RECURSIVE
      prs AS (
        WITH sig AS (${minhashSql(8)}),
        bands AS (
          SELECT doc_id, b.band,
            CASE b.band
              WHEN 0 THEN CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR)
              WHEN 1 THEN CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)
              WHEN 2 THEN CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR)
              ELSE CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR) END AS band_sig
          FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b)
        SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        FROM bands l JOIN bands r
          ON l.band = r.band AND l.band_sig = r.band_sig AND l.doc_id < r.doc_id),
      edges AS (SELECT a AS src, b AS dst FROM prs
                UNION SELECT b, a FROM prs),
      reach(node, other) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.other),
      cl AS (SELECT node, MIN(other) AS cluster_id FROM reach GROUP BY node),
      m AS (SELECT d.doc_id, d.n_chars,
              COALESCE(cl.cluster_id, d.doc_id) AS clid
            FROM documents d LEFT JOIN cl ON cl.node = d.doc_id),
      w AS (SELECT doc_id, n_chars,
              row_number() OVER (PARTITION BY clid
                ORDER BY COALESCE(n_chars, CAST('-infinity' AS DOUBLE)) DESC,
                  doc_id ASC) AS rk
            FROM m)
      SELECT doc_id, n_chars FROM w WHERE rk = 1""",

    "q44_ivf_topk" -> """
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      cent AS (SELECT vec_id AS centroid_id, e AS ce FROM v WHERE vec_id < 16),
      assign AS (
        SELECT vec_id, centroid_id, e FROM (
          SELECT v.vec_id, c.centroid_id, v.e,
            row_number() OVER (PARTITION BY v.vec_id ORDER BY
              list_inner_product(v.e, c.ce) /
                (sqrt(list_inner_product(v.e, v.e)) * sqrt(list_inner_product(c.ce, c.ce))) DESC,
              c.centroid_id ASC) AS rk
          FROM v, cent c)
        WHERE rk = 1),
      scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, q.centroid_id,
          list_inner_product(q.e, n.e) /
            (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(n.e, n.e))) AS cos
        FROM assign q JOIN assign n ON q.centroid_id = n.centroid_id
        WHERE q.vec_id < 24 AND q.vec_id <> n.vec_id)
      SELECT query_id, rk, neighbor_id, centroid_id FROM (
        SELECT query_id, neighbor_id, centroid_id,
          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
        FROM scored)
      WHERE rk <= 2""",

    "q57_ann_multiprobe" -> s"""
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      b AS (SELECT vec_id, e, ${bucketSql("e", 4)} AS bucket0 FROM v),
      probes AS (
        SELECT vec_id, e, bucket0 AS bucket FROM b WHERE vec_id < 24
        UNION ALL
        SELECT vec_id, e,
          substr(bucket0, 1, g.i) ||
          (CASE WHEN substr(bucket0, g.i + 1, 1) = '1' THEN '0' ELSE '1' END) ||
          substr(bucket0, g.i + 2, 4 - g.i - 1) AS bucket
        FROM b, (SELECT UNNEST(generate_series(0, 3)) AS i) g
        WHERE vec_id < 24),
      cand AS (
        SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM probes p JOIN b c ON p.bucket = c.bucket0
        WHERE p.vec_id <> c.vec_id),
      scored AS (
        SELECT cand.query_id, cand.neighbor_id,
          list_inner_product(q.e, c.e) /
            (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(c.e, c.e))) AS cos
        FROM cand
        JOIN v q ON q.vec_id = cand.query_id
        JOIN v c ON c.vec_id = cand.neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
        FROM scored)
      SELECT query_id, rk, neighbor_id FROM ranked WHERE rk <= 2""",

    "q137_hybrid_rrf" -> s"""
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      dscored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_inner_product(q.e, c.e) /
            (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(c.e, c.e))) AS cos
        FROM v q JOIN v c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 8),
      dtop AS (SELECT query_id, neighbor_id, rk FROM (
                 SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id ASC) AS rk
                 FROM dscored) WHERE rk <= 10),
      stop AS (SELECT neighbor_id, rk FROM (
                 SELECT doc_id AS neighbor_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rk
                 FROM (${bm25Oracle(Seq("table", "scan", "merge"))}) bmq)
               WHERE rk <= 10),
      sq AS (SELECT q.vec_id AS query_id, s.neighbor_id, s.rk
             FROM (SELECT vec_id FROM v WHERE vec_id < 8) q, stop s),
      fused AS (SELECT
          COALESCE(d.query_id, s.query_id) AS query_id,
          COALESCE(d.neighbor_id, s.neighbor_id) AS neighbor_id,
          COALESCE(1.0 / (60.0 + CAST(d.rk AS DOUBLE)), 0.0) +
            COALESCE(1.0 / (60.0 + CAST(s.rk AS DOUBLE)), 0.0) AS rrf
        FROM dtop d FULL OUTER JOIN sq s
          ON d.query_id = s.query_id AND d.neighbor_id = s.neighbor_id)
      SELECT query_id, rk, neighbor_id, rrf FROM (
        SELECT query_id, neighbor_id, rrf,
          row_number() OVER (PARTITION BY query_id
            ORDER BY rrf DESC, neighbor_id ASC) AS rk
        FROM fused)
      WHERE rk <= 5""",

    "q136_ann_recall" -> s"""
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      b AS (SELECT vec_id, e, ${bucketSql("e", 4)} AS bucket0 FROM v),
      probes AS (
        SELECT vec_id, e, bucket0 AS bucket FROM b WHERE vec_id < 24
        UNION ALL
        SELECT vec_id, e,
          substr(bucket0, 1, g.i) ||
          (CASE WHEN substr(bucket0, g.i + 1, 1) = '1' THEN '0' ELSE '1' END) ||
          substr(bucket0, g.i + 2, 4 - g.i - 1) AS bucket
        FROM b, (SELECT UNNEST(generate_series(0, 3)) AS i) g
        WHERE vec_id < 24),
      cand AS (
        SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM probes p JOIN b c ON p.bucket = c.bucket0
        WHERE p.vec_id <> c.vec_id),
      scored AS (
        SELECT cand.query_id, cand.neighbor_id,
          list_inner_product(q.e, c.e) /
            (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(c.e, c.e))) AS cos
        FROM cand
        JOIN v q ON q.vec_id = cand.query_id
        JOIN v c ON c.vec_id = cand.neighbor_id),
      atop AS (SELECT query_id, neighbor_id FROM (
                 SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id ASC) AS rk
                 FROM scored) WHERE rk <= 2),
      escored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          list_inner_product(q.e, c.e) /
            (sqrt(list_inner_product(q.e, q.e)) * sqrt(list_inner_product(c.e, c.e))) AS cos
        FROM v q JOIN v c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 24),
      etop AS (SELECT query_id, neighbor_id FROM (
                 SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY cos DESC, neighbor_id ASC) AS rk
                 FROM escored) WHERE rk <= 2)
      SELECT e.query_id,
        CAST(COUNT(*) AS BIGINT) AS possible,
        CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS hits
      FROM etop e LEFT JOIN atop a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      GROUP BY 1""",

    "q58_capped_lsh_equiv" -> """
      SELECT doc_id AS node,
        CAST(MIN(doc_id) OVER (PARTITION BY doc_id % 5) AS BIGINT) AS cluster_id
      FROM documents""",

    "q74_decontaminate" -> decontaminateOracle,

    // Bloom prescreen + exact verify ≡ the exact join (no false
    // negatives) — ONE oracle shared with q74 so the equivalence claim
    // is the gate itself, not a copy that could drift.
    "q143_bloom_decontaminate" -> decontaminateOracle,

    // mirror of SuffixArray.repeatsAtLeast(minLen=16, cap=48) on the
    // doc_id < 200 slice: sort ALL suffixes (DuckDB can, the slice is
    // bounded), capped adjacent LCP (clamped to both lengths — equal
    // short suffixes must report their own length, not the cap), maximal
    // runs of lcp >= 16 via a running break count, min-LCP common prefix
    "q144_suffix_repeats" -> s"""
      WITH nd AS (SELECT doc_id, ${normSql("text")} AS nt FROM documents
                  WHERE doc_id < 200),
      sfx AS (SELECT doc_id, CAST(i.i AS BIGINT) AS pos, substr(nt, i.i) AS s
              FROM nd, LATERAL UNNEST(range(1, length(nt) + 1)) AS i(i)),
      orded AS (SELECT doc_id, pos, s,
                  row_number() OVER (ORDER BY s, doc_id, pos) AS idx
                FROM sfx),
      adj AS (SELECT a.idx, substr(a.s, 1, 48) AS cur, substr(b.s, 1, 48) AS prv
              FROM orded a LEFT JOIN orded b ON b.idx = a.idx - 1),
      lcps AS (SELECT idx, cur,
                 CASE WHEN prv IS NULL THEN 0
                      ELSE LEAST(list_max(list_prepend(CAST(0 AS BIGINT),
                             list_filter(range(1, 49),
                               l -> substr(cur, 1, CAST(l AS INT))
                                  = substr(prv, 1, CAST(l AS INT))))),
                           length(cur), length(prv))
                 END AS lcp
               FROM adj),
      runs AS (SELECT idx, cur, lcp,
                 SUM(CASE WHEN lcp < 16 THEN 1 ELSE 0 END)
                   OVER (ORDER BY idx) AS rid
               FROM lcps),
      g AS (SELECT rid, COUNT(*) AS n_occ,
              MIN(CASE WHEN lcp >= 16 THEN lcp END) AS replen,
              arg_min(cur, idx) AS head
            FROM runs GROUP BY rid HAVING COUNT(*) >= 2)
      SELECT substr(head, 1, CAST(replen AS INT)) AS repeat,
        CAST(replen AS BIGINT) AS repeat_len, CAST(n_occ AS BIGINT) AS n_occ
      FROM g""",

    "q75_line_dedup" -> s"""
      WITH t AS (SELECT doc_id, string_split(${normSql("COALESCE(text, '')")}, ' ') AS toks
                 FROM documents),
      ch AS (SELECT doc_id,
               list_transform(
                 range(0, CAST(ceil(CAST(len(toks) AS DOUBLE) / 10.0) AS BIGINT)),
                 i -> array_to_string(toks[(i * 10 + 1):(i * 10 + 10)], ' ')) AS lines
             FROM t),
      l AS (SELECT doc_id, g.i - 1 AS line_no, lines[g.i] AS line
            FROM ch, LATERAL UNNEST(range(1, len(lines) + 1)) AS g(i)),
      k AS (SELECT doc_id, line_no, line,
              row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) = 1
                AS keep
            FROM l)
      SELECT doc_id,
        COUNT(*) AS n_lines,
        CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
        COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY line_no), '')
          AS clean_text
      FROM k GROUP BY doc_id""",

    "q76_bm25" -> bm25Oracle(Seq("spark", "window", "merge")),

    "q145_text_index" ->
      bm25IndexOracle(Seq("table", "scan", "merge"), topK = 10),
    "q146_text_index_append" ->
      bm25IndexOracle(Seq("table", "scan", "merge"), topK = 10),
    "q148_stream_text_ingest" ->
      bm25IndexOracle(Seq("table", "scan", "merge"), topK = 10),
    // as-of gen 1 = the index the even ids built
    "q161_text_index_time_travel" ->
      bm25IndexOracle(Seq("table", "scan", "merge"), topK = 10,
        corpusWhere = " WHERE doc_id % 2 = 0"),

    "q77_kmeans" -> s"""
      $kmeans2AssignCte
      SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id FROM a1""",

    // q77's two-iteration kmeans assignment (a1), then the SemDeDup drop
    // rule on raw-double cosines within each cluster
    "q128_semdedup" -> s"""
      $kmeans2AssignCte,
      raw AS (SELECT vec_id, embedding::DOUBLE[] AS re FROM embeddings),
      j AS (SELECT a1.vec_id, a1.cid, raw.re
            FROM a1 JOIN raw ON a1.vec_id = raw.vec_id),
      dup AS (SELECT DISTINCT r.vec_id FROM j l
              JOIN j r ON l.cid = r.cid AND l.vec_id < r.vec_id
              WHERE list_inner_product(l.re, r.re) /
                (sqrt(list_inner_product(l.re, l.re)) *
                 sqrt(list_inner_product(r.re, r.re))) >= 0.42)
      SELECT j.vec_id, CAST(j.cid AS BIGINT) AS centroid_id,
        (dup.vec_id IS NULL) AS kept
      FROM j LEFT JOIN dup ON j.vec_id = dup.vec_id""",

    // farthest-point seeding unrolled: s0 = the min-id row, s1 = argmax
    // distance to s0, s2 = argmax of min distance to {s0, s1} (ties by
    // id throughout — exact integers on the quantized grid), then one
    // Lloyd mean update and the final assignment, exactly q77's shape
    "q112_kmeans_farthest" -> """
      WITH v AS (SELECT vec_id,
                   list_transform(embedding::DOUBLE[], x -> floor(x * 1000.0)) AS e
                 FROM embeddings),
      vv AS (SELECT vec_id, e, list_inner_product(e, e) AS sq FROM v),
      s0 AS (SELECT e, list_inner_product(e, e) AS cc FROM v
             WHERE vec_id = (SELECT MIN(vec_id) FROM v)),
      s1 AS (SELECT e, list_inner_product(e, e) AS cc FROM (
               SELECT vv.vec_id, vv.e
               FROM vv, s0
               ORDER BY ((vv.sq - 2.0 * list_inner_product(vv.e, s0.e))
                           + s0.cc) DESC,
                 vv.vec_id ASC
               LIMIT 1)),
      s2 AS (SELECT e, list_inner_product(e, e) AS cc FROM (
               SELECT vv.vec_id, vv.e
               FROM vv, s0, s1
               ORDER BY LEAST(
                   ((vv.sq - 2.0 * list_inner_product(vv.e, s0.e)) + s0.cc),
                   ((vv.sq - 2.0 * list_inner_product(vv.e, s1.e)) + s1.cc))
                   DESC,
                 vv.vec_id ASC
               LIMIT 1)),
      c0 AS (SELECT 0 AS cid, e AS ce, cc FROM s0
             UNION ALL SELECT 1, e, cc FROM s1
             UNION ALL SELECT 2, e, cc FROM s2),
      a0 AS (SELECT vec_id, cid, e FROM (
               SELECT vv.vec_id, c.cid, vv.e,
                 row_number() OVER (PARTITION BY vv.vec_id ORDER BY
                   ((vv.sq - 2.0 * list_inner_product(vv.e, c.ce)) + c.cc) ASC,
                   c.cid ASC) AS rk
               FROM vv, c0 c)
             WHERE rk = 1),
      sums AS (SELECT cid, g.i AS pos, SUM(e[g.i]) AS sx, COUNT(*) AS cnt
               FROM a0, LATERAL UNNEST(range(1, len(e) + 1)) AS g(i)
               GROUP BY 1, 2),
      c1 AS (SELECT cid, list(sx / CAST(cnt AS DOUBLE) ORDER BY pos) AS ce
             FROM sums GROUP BY cid),
      c1c AS (SELECT cid, ce, list_inner_product(ce, ce) AS cc FROM c1),
      a1 AS (SELECT vec_id, cid FROM (
               SELECT vv.vec_id, c.cid,
                 row_number() OVER (PARTITION BY vv.vec_id ORDER BY
                   ((vv.sq - 2.0 * list_inner_product(vv.e, c.ce)) + c.cc) ASC,
                   c.cid ASC) AS rk
               FROM vv, c1c c)
             WHERE rk = 1)
      SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id FROM a1""",

    "q116_heavy_hitters" -> s"""
      WITH t AS (SELECT UNNEST(string_split(${normSql("text")}, ' ')) AS token
        FROM documents)
      SELECT token AS item, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(0 AS BIGINT) AS err
      FROM t WHERE token <> ''
      GROUP BY 1 HAVING COUNT(*) >= 500""",

    "q80_kmv_distinct" -> s"""
      WITH sh AS (SELECT DISTINCT d.lang, substr(d.nt, g.i, 8) AS sh FROM (
              SELECT lang, ${normSql("text")} AS nt FROM documents) d,
              LATERAL UNNEST(range(1, GREATEST(length(d.nt) - 7, 1) + 1)) AS g(i)),
      h AS (SELECT DISTINCT lang,
              ('0x' || substr(md5(sh), 1, 10))::BIGINT AS hv FROM sh),
      r AS (SELECT lang, hv,
              row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn FROM h),
      s AS (SELECT lang,
              CAST(SUM(CASE WHEN rn <= 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
              MAX(CASE WHEN rn <= 64 THEN hv END) AS kth_min
            FROM r GROUP BY lang)
      SELECT lang, n_seen, kth_min,
        CASE WHEN n_seen < 64 THEN n_seen
             ELSE CAST(floor(CAST(69269232549888 AS DOUBLE) /
                             CAST(kth_min AS DOUBLE)) AS BIGINT)
        END AS est_distinct
      FROM s""",

    "q175_hll_distinct" -> s"""
      WITH h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS mh
                 FROM events WHERE user_id IS NOT NULL),
      br AS (SELECT event_type,
               ('0x' || substr(mh, 1, 2))::BIGINT AS bucket,
               CASE WHEN ('0x' || substr(mh, 3, 10))::BIGINT = 0 THEN 41
                    ELSE 41 - length(bin(('0x' || substr(mh, 3, 10))::BIGINT))
               END AS rho
             FROM h),
      mx AS (SELECT event_type, bucket, MAX(rho) AS rho FROM br GROUP BY 1, 2),
      grid AS (SELECT e.event_type, g.b AS bucket
               FROM (SELECT DISTINCT event_type FROM events
                     WHERE user_id IS NOT NULL) e,
                    LATERAL UNNEST(range(0, 256)) AS g(b)),
      regs AS (SELECT grid.event_type, grid.bucket, COALESCE(mx.rho, 0) AS rho
               FROM grid LEFT JOIN mx
                 ON grid.event_type = mx.event_type AND grid.bucket = mx.bucket),
      s AS (SELECT event_type,
              CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
              CAST(SUM(1::BIGINT << (49 - rho)) AS BIGINT) AS sum_scaled
            FROM regs GROUP BY 1)
      SELECT s.event_type, s.n_zero, s.sum_scaled,
        CAST(floor(CAST(${graft.operators.Sketches.hllConstant(256)} AS DOUBLE) /
                   CAST(s.sum_scaled AS DOUBLE)) AS BIGINT) AS est_distinct,
        x.exact_distinct
      FROM s JOIN (SELECT event_type,
                     CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
                   FROM events WHERE user_id IS NOT NULL GROUP BY 1) x
        ON s.event_type = x.event_type""",

    "q194_hll_set_algebra" -> s"""
      WITH h AS (SELECT event_type, user_id,
              md5(CAST(user_id AS VARCHAR)) AS mh
            FROM events WHERE user_id IS NOT NULL
              AND event_type IN ('click', 'purchase')),
      br AS (SELECT event_type,
               ('0x' || substr(mh, 1, 2))::BIGINT AS bucket,
               CASE WHEN ('0x' || substr(mh, 3, 10))::BIGINT = 0 THEN 41
                    ELSE 41 - length(bin(('0x' || substr(mh, 3, 10))::BIGINT))
               END AS rho
             FROM h),
      mx AS (SELECT bucket,
               MAX(CASE WHEN event_type = 'click' THEN rho END) AS rc,
               MAX(CASE WHEN event_type = 'purchase' THEN rho END) AS rp,
               MAX(rho) AS ru
             FROM br GROUP BY 1),
      grid AS (SELECT g.b AS bucket FROM (SELECT UNNEST(range(0, 256)) AS b) g),
      regs AS (SELECT grid.bucket, COALESCE(mx.rc, 0) AS rc,
                 COALESCE(mx.rp, 0) AS rp, COALESCE(mx.ru, 0) AS ru
               FROM grid LEFT JOIN mx ON grid.bucket = mx.bucket),
      s AS (SELECT CAST(SUM(1::BIGINT << (49 - rc)) AS BIGINT) AS sc,
              CAST(SUM(1::BIGINT << (49 - rp)) AS BIGINT) AS sp,
              CAST(SUM(1::BIGINT << (49 - ru)) AS BIGINT) AS su
            FROM regs),
      e AS (SELECT
              CAST(floor(CAST(${graft.operators.Sketches.hllConstant(256)}
                AS DOUBLE) / CAST(sc AS DOUBLE)) AS BIGINT) AS est_click,
              CAST(floor(CAST(${graft.operators.Sketches.hllConstant(256)}
                AS DOUBLE) / CAST(sp AS DOUBLE)) AS BIGINT) AS est_purchase,
              CAST(floor(CAST(${graft.operators.Sketches.hllConstant(256)}
                AS DOUBLE) / CAST(su AS DOUBLE)) AS BIGINT) AS est_union
            FROM s),
      x AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_inter FROM (
              SELECT user_id FROM h GROUP BY 1
              HAVING MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) = 1
                AND MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1))
      SELECT e.est_click, e.est_purchase, e.est_union,
        e.est_click + e.est_purchase - e.est_union AS est_inter,
        x.exact_inter
      FROM e, x""",

    "q197_hll_sliding" -> s"""
      WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hour,
              md5(CAST(user_id AS VARCHAR)) AS mh
            FROM events WHERE user_id IS NOT NULL),
      br AS (SELECT hour,
               ('0x' || substr(mh, 1, 2))::BIGINT AS bucket,
               CASE WHEN ('0x' || substr(mh, 3, 10))::BIGINT = 0 THEN 41
                    ELSE 41 - length(bin(('0x' || substr(mh, 3, 10))::BIGINT))
               END AS rho
             FROM h),
      mx AS (SELECT hour, bucket, MAX(rho) AS rho FROM br GROUP BY 1, 2),
      grid AS (SELECT k.hour, g.b AS bucket
               FROM (SELECT DISTINCT hour FROM h) k,
                    LATERAL UNNEST(range(0, 256)) AS g(b)),
      regs AS (SELECT grid.hour, grid.bucket, COALESCE(mx.rho, 0) AS rho
               FROM grid LEFT JOIN mx
                 ON grid.hour = mx.hour AND grid.bucket = mx.bucket),
      sl AS (SELECT hour, bucket,
               MAX(rho) OVER (PARTITION BY bucket ORDER BY hour
                 RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS rho3
             FROM regs),
      s AS (SELECT hour,
              CAST(SUM(CASE WHEN rho3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_zero,
              CAST(SUM(1::BIGINT << (49 - rho3)) AS BIGINT) AS sum_scaled
            FROM sl GROUP BY 1)
      SELECT hour, n_zero, sum_scaled,
        CAST(floor(CAST(${graft.operators.Sketches.hllConstant(256)} AS DOUBLE) /
                   CAST(sum_scaled AS DOUBLE)) AS BIGINT) AS est_distinct
      FROM s""",

    "q195_cms_join_size" -> """
      WITH e AS (SELECT event_type, user_id FROM events
                 WHERE user_id IS NOT NULL
                   AND event_type IN ('view', 'purchase')),
      bk AS (SELECT event_type, g.i AS i,
               ('0x' || substr(md5(CAST(g.i AS VARCHAR) || ':' ||
                  CAST(user_id AS VARCHAR)), 1, 10))::BIGINT % 512 AS b
             FROM e, generate_series(0, 3) g(i)),
      cm AS (SELECT event_type, i, b, CAST(COUNT(*) AS BIGINT) AS c
             FROM bk GROUP BY 1, 2, 3),
      ip AS (SELECT a.i, CAST(SUM(a.c * b.c) AS BIGINT) AS p
             FROM cm a JOIN cm b ON a.i = b.i AND a.b = b.b
               AND a.event_type = 'view' AND b.event_type = 'purchase'
             GROUP BY 1),
      est AS (SELECT CAST(MIN(COALESCE(ip.p, 0)) AS BIGINT) AS est_pairs
              FROM generate_series(0, 3) g(i)
              LEFT JOIN ip ON ip.i = g.i),
      x AS (SELECT CAST(COALESCE(SUM(a.fa * b.fb), 0) AS BIGINT) AS exact_pairs
            FROM (SELECT user_id, COUNT(*) AS fa FROM e
                  WHERE event_type = 'view' GROUP BY 1) a
            JOIN (SELECT user_id, COUNT(*) AS fb FROM e
                  WHERE event_type = 'purchase' GROUP BY 1) b
              ON a.user_id = b.user_id)
      SELECT est.est_pairs, x.exact_pairs FROM est, x""",

    "q191_hll_rollup" -> s"""
      WITH h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS mh
                 FROM events
                 WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
      br AS (SELECT event_type,
               ('0x' || substr(mh, 1, 2))::BIGINT AS bucket,
               CASE WHEN ('0x' || substr(mh, 3, 10))::BIGINT = 0 THEN 41
                    ELSE 41 - length(bin(('0x' || substr(mh, 3, 10))::BIGINT))
               END AS rho
             FROM h),
      lv AS (SELECT event_type, bucket, MAX(rho) AS rho FROM br GROUP BY 1, 2
             UNION ALL
             SELECT '__total' AS event_type, bucket, MAX(rho) AS rho
             FROM br GROUP BY 2),
      keys AS (SELECT DISTINCT event_type FROM lv),
      grid AS (SELECT k.event_type, g.b AS bucket
               FROM keys k, LATERAL UNNEST(range(0, 256)) AS g(b)),
      regs AS (SELECT grid.event_type, grid.bucket, COALESCE(lv.rho, 0) AS rho
               FROM grid LEFT JOIN lv
                 ON grid.event_type = lv.event_type AND grid.bucket = lv.bucket),
      s AS (SELECT event_type,
              CAST(SUM(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
              CAST(SUM(1::BIGINT << (49 - rho)) AS BIGINT) AS sum_scaled
            FROM regs GROUP BY 1)
      SELECT event_type, n_zero, sum_scaled,
        CAST(floor(CAST(${graft.operators.Sketches.hllConstant(256)} AS DOUBLE) /
                   CAST(sum_scaled AS DOUBLE)) AS BIGINT) AS est_distinct
      FROM s""",

    "q176_cms_counts" -> s"""
      WITH t AS (SELECT UNNEST(string_split(${normSql("text")}, ' ')) AS token
                 FROM documents),
      tok AS (SELECT token FROM t WHERE token <> ''),
      cnt AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count
              FROM tok GROUP BY 1),
      top AS (SELECT token, exact_count FROM cnt
              ORDER BY exact_count DESC, token LIMIT 20),
      bk AS (SELECT token, g.i AS i,
               ('0x' || substr(md5(CAST(g.i AS VARCHAR) || ':' || token), 1, 10))::BIGINT
                 % 512 AS b
             FROM tok, generate_series(0, 3) g(i)),
      cm AS (SELECT i, b, CAST(COUNT(*) AS BIGINT) AS cell FROM bk GROUP BY 1, 2),
      qb AS (SELECT top.token, top.exact_count, g.i AS i,
               ('0x' || substr(md5(CAST(g.i AS VARCHAR) || ':' || top.token), 1, 10))::BIGINT
                 % 512 AS b
             FROM top, generate_series(0, 3) g(i)),
      est AS (SELECT qb.token, qb.exact_count,
                MIN(COALESCE(cm.cell, 0)) AS est_count
              FROM qb LEFT JOIN cm ON qb.i = cm.i AND qb.b = cm.b
              GROUP BY 1, 2)
      SELECT token, CAST(est_count AS BIGINT) AS est_count, exact_count
      FROM est""",

    "q208_sq8_codes" -> """
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      d AS (SELECT vec_id, CAST(g.i - 1 AS INT) AS dim, e[g.i] AS x
            FROM v, LATERAL UNNEST(range(1, len(e) + 1)) AS g(i)),
      st AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM d GROUP BY 1)
      SELECT d.vec_id, d.dim,
        CASE WHEN st.mx = st.mn THEN 0
             ELSE CAST(floor((d.x - st.mn) * 255 / (st.mx - st.mn)) AS BIGINT)
        END AS code
      FROM d JOIN st USING (dim)
      WHERE d.vec_id < 64""",

    "q209_sq8_topk" -> """
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      d AS (SELECT vec_id, g.i AS dim, e[g.i] AS x
            FROM v, LATERAL UNNEST(range(1, len(e) + 1)) AS g(i)),
      st AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM d GROUP BY 1),
      c AS (SELECT d.vec_id, d.dim,
              CASE WHEN st.mx = st.mn THEN 0
                   ELSE CAST(floor((d.x - st.mn) * 255 / (st.mx - st.mn))
                        AS BIGINT)
              END AS code
            FROM d JOIN st USING (dim)),
      dist AS (SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
                 CAST(SUM((q.code - t.code) * (q.code - t.code)) AS BIGINT)
                   AS dist_sq
               FROM c q JOIN c t ON q.dim = t.dim AND q.vec_id <> t.vec_id
               WHERE q.vec_id < 24
               GROUP BY 1, 2),
      ranked AS (SELECT query_id, neighbor_id, dist_sq,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY dist_sq, neighbor_id) AS rk
                 FROM dist)
      SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, dist_sq
      FROM ranked WHERE rk <= 3""",

    "q211_binary_hamming" -> """
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      d AS (SELECT vec_id, g.i AS dim, e[g.i] AS x
            FROM v, LATERAL UNNEST(range(1, len(e) + 1)) AS g(i)),
      st AS (SELECT dim, (MIN(x) + MAX(x)) / 2 AS th FROM d GROUP BY 1),
      b AS (SELECT d.vec_id, d.dim, d.x > st.th AS bit
            FROM d JOIN st USING (dim)),
      dist AS (SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
                 CAST(SUM(CASE WHEN q.bit <> t.bit THEN 1 ELSE 0 END)
                   AS BIGINT) AS hamming
               FROM b q JOIN b t ON q.dim = t.dim AND q.vec_id <> t.vec_id
               WHERE q.vec_id < 24
               GROUP BY 1, 2),
      ranked AS (SELECT query_id, neighbor_id, hamming,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY hamming, neighbor_id) AS rk
                 FROM dist)
      SELECT query_id, CAST(rk AS INT) AS rk, neighbor_id, hamming
      FROM ranked WHERE rk <= 3""",

    "q205_personalized_pagerank" -> s"""
      WITH e AS (SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
                   CAST(su.s_nationkey AS BIGINT) AS dst
                 FROM lineitem l
                 JOIN orders o ON l.l_orderkey = o.o_orderkey
                 JOIN customer c ON o.o_custkey = c.c_custkey
                 JOIN supplier su ON l.l_suppkey = su.s_suppkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      seeds AS (SELECT node FROM nodes WHERE node < 5),
      od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1),
      cS AS (SELECT COUNT(*) AS n FROM seeds),
      r0 AS (SELECT nodes.node,
               CASE WHEN seeds.node IS NOT NULL
                 THEN 1000000000000 // (SELECT n FROM cS) ELSE 0 END AS r
             FROM nodes LEFT JOIN seeds ON seeds.node = nodes.node),
      s1 AS (SELECT e.dst AS node, SUM(r0.r // od.d) AS s
             FROM e JOIN od ON e.src = od.src JOIN r0 ON r0.node = e.src
             GROUP BY 1),
      r1 AS (SELECT nodes.node,
               CASE WHEN seeds.node IS NOT NULL
                 THEN (15 * 1000000000000) // (100 * (SELECT n FROM cS))
                 ELSE 0 END
                 + (85 * COALESCE(s1.s, 0)) // 100 AS r
             FROM nodes LEFT JOIN seeds ON seeds.node = nodes.node
               LEFT JOIN s1 ON s1.node = nodes.node),
      s2 AS (SELECT e.dst AS node, SUM(r1.r // od.d) AS s
             FROM e JOIN od ON e.src = od.src JOIN r1 ON r1.node = e.src
             GROUP BY 1),
      r2 AS (SELECT nodes.node,
               CASE WHEN seeds.node IS NOT NULL
                 THEN (15 * 1000000000000) // (100 * (SELECT n FROM cS))
                 ELSE 0 END
                 + (85 * COALESCE(s2.s, 0)) // 100 AS r
             FROM nodes LEFT JOIN seeds ON seeds.node = nodes.node
               LEFT JOIN s2 ON s2.node = nodes.node),
      s3 AS (SELECT e.dst AS node, SUM(r2.r // od.d) AS s
             FROM e JOIN od ON e.src = od.src JOIN r2 ON r2.node = e.src
             GROUP BY 1),
      r3 AS (SELECT nodes.node,
               CASE WHEN seeds.node IS NOT NULL
                 THEN (15 * 1000000000000) // (100 * (SELECT n FROM cS))
                 ELSE 0 END
                 + (85 * COALESCE(s3.s, 0)) // 100 AS r
             FROM nodes LEFT JOIN seeds ON seeds.node = nodes.node
               LEFT JOIN s3 ON s3.node = nodes.node)
      SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r3""",

    "q177_pagerank" -> s"""
      WITH e AS (SELECT DISTINCT CAST(c.c_nationkey AS BIGINT) AS src,
                   CAST(su.s_nationkey AS BIGINT) AS dst
                 FROM lineitem l
                 JOIN orders o ON l.l_orderkey = o.o_orderkey
                 JOIN customer c ON o.o_custkey = c.c_custkey
                 JOIN supplier su ON l.l_suppkey = su.s_suppkey),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1),
      c0 AS (SELECT COUNT(*) AS n FROM nodes),
      r0 AS (SELECT node, 1000000000000 // (SELECT n FROM c0) AS r FROM nodes),
      s1 AS (SELECT e.dst AS node, SUM(r0.r // od.d) AS s
             FROM e JOIN od ON e.src = od.src JOIN r0 ON r0.node = e.src
             GROUP BY 1),
      r1 AS (SELECT nodes.node,
               (15 * 1000000000000) // (100 * (SELECT n FROM c0))
                 + (85 * COALESCE(s1.s, 0)) // 100 AS r
             FROM nodes LEFT JOIN s1 ON s1.node = nodes.node),
      s2 AS (SELECT e.dst AS node, SUM(r1.r // od.d) AS s
             FROM e JOIN od ON e.src = od.src JOIN r1 ON r1.node = e.src
             GROUP BY 1),
      r2 AS (SELECT nodes.node,
               (15 * 1000000000000) // (100 * (SELECT n FROM c0))
                 + (85 * COALESCE(s2.s, 0)) // 100 AS r
             FROM nodes LEFT JOIN s2 ON s2.node = nodes.node),
      s3 AS (SELECT e.dst AS node, SUM(r2.r // od.d) AS s
             FROM e JOIN od ON e.src = od.src JOIN r2 ON r2.node = e.src
             GROUP BY 1),
      r3 AS (SELECT nodes.node,
               (15 * 1000000000000) // (100 * (SELECT n FROM c0))
                 + (85 * COALESCE(s3.s, 0)) // 100 AS r
             FROM nodes LEFT JOIN s3 ON s3.node = nodes.node)
      SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r3""",

    "q81_chunking" -> s"""
      WITH t AS (SELECT doc_id, string_split(${normSql("COALESCE(text, '')")}, ' ') AS toks
                 FROM documents),
      c AS (SELECT doc_id, toks,
              CAST(ceil(CAST(GREATEST(len(toks) - 16, 0) AS DOUBLE) / 8.0) AS INT) + 1
                AS nc
            FROM t)
      SELECT doc_id, g.i AS chunk_id,
        array_to_string(toks[(g.i * 8 + 1):(g.i * 8 + 16)], ' ') AS chunk_text,
        CAST(LEAST(16, len(toks) - g.i * 8) AS BIGINT) AS n_chunk_tokens
      FROM c, LATERAL UNNEST(range(0, nc)) AS g(i)""",

    "q82_packing" -> s"""
      WITH m AS (SELECT doc_id,
              CAST(length(string_split(${normSql("text")}, ' ')) AS BIGINT) AS n_tokens,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 8
                AS shard
            FROM documents),
      p AS (SELECT doc_id, n_tokens, shard,
              COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
                AS prefix
            FROM m)
      SELECT doc_id, n_tokens, shard,
        CAST(prefix // 256 AS BIGINT) AS bin
      FROM p""",

    "q90_ivf_kmeans" -> ivfKmeansOracle(nProbe = 1),

    "q102_ivf_kmeans_probe2" -> ivfKmeansOracle(nProbe = 2),

    "q88_int8_quant" -> """
      WITH v AS (SELECT vec_id,
                   list_transform(embedding::DOUBLE[],
                     x -> CASE WHEN isnan(x) THEN 0.0 ELSE x END) AS e
                 FROM embeddings)
      SELECT vec_id, CAST(g.i - 1 AS INT) AS pos,
        CAST(GREATEST(-128, LEAST(127, floor(e[g.i] * 127.0))) AS INT) AS q8
      FROM v, LATERAL UNNEST(range(1, len(e) + 1)) AS g(i)""",

    "q89_matryoshka" -> """
      WITH v AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS p
                 FROM embeddings),
      n AS (SELECT vec_id, p, sqrt(list_inner_product(p, p)) AS nrm FROM v)
      SELECT vec_id, CAST(g.i - 1 AS INT) AS pos, p[g.i] / nrm AS v
      FROM n, LATERAL UNNEST(range(1, len(p) + 1)) AS g(i)
      WHERE nrm > 0.0""",

    "q93_pq_codes" -> s"""$pqCommonSql
      SELECT vec_id, CAST(s AS INT) AS s, CAST(cid AS BIGINT) AS code
      FROM best""",

    // one Lloyd round per subspace on top of the shared PQ CTEs: `best`
    // IS the round-0 assignment, so the update is means per (s, cid, pos)
    // then a re-scored argmin — same structure as q77's unrolled round
    "q99_pq_trained" -> s"""$pqCommonSql,
      sums AS (SELECT b.s, b.cid, g.i AS pos, SUM(t.sv[g.i]) AS sx,
                 COUNT(*) AS cnt
               FROM best b
               JOIN svv t ON t.vec_id = b.vec_id AND t.s = b.s,
               LATERAL UNNEST(range(1, len(t.sv) + 1)) AS g(i)
               GROUP BY 1, 2, 3),
      c1 AS (SELECT s, cid, list(sx / CAST(cnt AS DOUBLE) ORDER BY pos) AS c
             FROM sums GROUP BY 1, 2),
      c1c AS (SELECT s, cid, c, list_inner_product(c, c) AS cc FROM c1),
      scored1 AS (SELECT t.vec_id, t.s, c.cid,
                    (t.n2 - 2.0 * list_inner_product(t.sv, c.c)) + c.cc AS d2
                  FROM svv t JOIN c1c c ON t.s = c.s),
      best1 AS (SELECT vec_id, s, cid FROM (
                  SELECT vec_id, s, cid,
                    row_number() OVER (PARTITION BY vec_id, s
                      ORDER BY d2 ASC, cid ASC) AS rk
                  FROM scored1) WHERE rk = 1)
      SELECT vec_id, CAST(s AS INT) AS s, CAST(cid AS BIGINT) AS code
      FROM best1""",

    "q96_ivfpq" -> ivfPqOracle(nProbe = 1),

    // the persisted-index search must return exactly what the inline
    // search returns, so it shares q96's oracle
    "q100_pq_persist" -> ivfPqOracle(nProbe = 1),
    // streaming query search over the same static index: batching must
    // not change answers, so the oracle is q100's verbatim
    "q190_stream_ann_search" -> ivfPqOracle(nProbe = 1),

    // as-of gen 1 = the index the first half built: candidates (codes)
    // restricted to vec_id < 250, quantizer seeds (id < 16 / id < 8)
    // unchanged because they live in the first half
    "q160_index_time_travel" -> ivfPqOracle(nProbe = 1,
      corpusBelow = Some(250L)),
    // compaction changes nothing observable (train seeds in first half)
    "q168_ann_index_compact" -> ivfPqOracle(nProbe = 1),

    // mirror of q140: the ivfPqOracle search body with the probe rank
    // kept (rk <= 4) and cross-joined against np ∈ {1,2,4}, scored
    // against the exact quantized-L2 top-3 — per (nprobe, query) exact
    // integer (possible, hits)
    "q140_recall_curve" -> s"""$pqCommonSql,
      $ivfCellsSql,
      qc AS (SELECT fv.vec_id, c.ccell,
               row_number() OVER (PARTITION BY fv.vec_id ORDER BY
                 ((fv.sq - 2.0 * list_inner_product(fv.e, c.ce)) + c.cc2)
                   ASC, c.ccell ASC) AS rk
             FROM fv, cen c WHERE fv.vec_id < 8),
      nps AS (SELECT UNNEST([1, 2, 4]) AS np),
      qcells AS (SELECT nps.np, qc.vec_id AS query_id, qc.ccell AS cell
                 FROM qc, nps WHERE qc.rk <= nps.np),
      q AS (SELECT vec_id AS query_id, s, sv, n2 FROM svv WHERE vec_id < 8),
      dt AS (SELECT q.query_id, cb.s, cb.cid,
               (q.n2 - 2.0 * list_inner_product(q.sv, cb.c)) + cb.cc AS ld
             FROM q JOIN cb ON q.s = cb.s),
      acc AS (SELECT qc.np, dt.query_id, b.vec_id AS neighbor_id,
                SUM(dt.ld) AS d2
              FROM best b
              JOIN dt ON b.s = dt.s AND b.cid = dt.cid
              JOIN cells nc ON nc.vec_id = b.vec_id
              JOIN qcells qc ON qc.query_id = dt.query_id AND qc.cell = nc.cell
              WHERE b.vec_id <> dt.query_id
              GROUP BY 1, 2, 3),
      approx AS (SELECT np, query_id, neighbor_id FROM (
                   SELECT np, query_id, neighbor_id,
                     row_number() OVER (PARTITION BY np, query_id
                       ORDER BY d2 ASC, neighbor_id ASC) AS rk
                   FROM acc) WHERE rk <= 3),
      ex AS (SELECT query_id, neighbor_id FROM (
               SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id ORDER BY
                   ((q.sq - 2.0 * list_inner_product(q.e, n.e)) + n.sq) ASC,
                   n.vec_id ASC) AS rk
               FROM fv q JOIN fv n ON n.vec_id <> q.vec_id
               WHERE q.vec_id < 8) WHERE rk <= 3),
      exn AS (SELECT nps.np, ex.query_id, ex.neighbor_id FROM ex, nps)
      SELECT e.np AS nprobe, e.query_id,
        CAST(COUNT(*) AS BIGINT) AS possible,
        CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS hits
      FROM exn e
      LEFT JOIN approx a ON a.np = e.np AND a.query_id = e.query_id
        AND a.neighbor_id = e.neighbor_id
      GROUP BY 1, 2""",

    // post-delete search = inline search minus the tombstoned corpus
    // rows (frozen quantizers, so only the candidate set shrinks)
    "q121_index_delete" -> ivfPqOracle(nProbe = 1, excludeIds = DeletedIds),

    // stream-ingested + compacted + deleted ≡ batch-built + deleted
    "q122_index_compact" -> ivfPqOracle(nProbe = 1, excludeIds = DeletedIds),

    // streamed codes ≡ batch codes ≡ inline — same oracle again
    "q113_stream_index_ingest" -> ivfPqOracle(nProbe = 1),

    "q97_ivfpq_probe2" -> ivfPqOracle(nProbe = 2),

    "q103_ivfpq_trained" -> ivfPqOracle(nProbe = 1, trained = true),

    // mirrors ivfPqTopK(residual = true) at dims=64, m=4, k=16, nList=8,
    // topK=3, nProbe=1: residuals vs the rank-1 cell centroid, residual
    // codebook from rows 8 <= vec_id < 24 (centroid rows have zero
    // residuals and would waste codebook slots), per-cell query tables
    "q98_ivfpq_residual" -> residualIvfPqOracle,

    // the persisted residual index must return exactly what the inline
    // residual search returns, so it shares q98's oracle
    "q109_pq_persist_residual" -> residualIvfPqOracle,

    // streamed residual codes ≡ batch residual codes ≡ inline
    "q114_stream_residual_ingest" -> residualIvfPqOracle,

    // q98 + one unrolled Lloyd round on the RESIDUAL codebook (q99's
    // pattern applied to rcb/rbest): refined rcb1 feeds both the re-coded
    // corpus (rbest1, cell carried) and the per-cell query tables (dt1).
    // Trained distances are fractional → floor on both engines.
    "q104_ivfpq_residual_trained" -> s"""$pqCommonSql,
      $ivfCellsSql,
      rv AS (SELECT f.vec_id, cl.cell,
               list_transform(range(1, len(f.e) + 1), i -> f.e[i] - c.ce[i])
                 AS re
             FROM fv f JOIN cells cl ON cl.vec_id = f.vec_id
             JOIN cen c ON c.ccell = cl.cell),
      rsub AS (SELECT vec_id, cell, g.s AS s,
                 re[(g.s * 16 + 1):(g.s * 16 + 16)] AS sv
               FROM rv, LATERAL UNNEST(range(0, 4)) AS g(s)),
      rsvv AS (SELECT vec_id, cell, s, sv, list_inner_product(sv, sv) AS n2
               FROM rsub),
      rcb AS (SELECT s, vec_id - 8 AS cid, sv AS c, n2 AS cc FROM rsvv
              WHERE vec_id >= 8 AND vec_id < 24),
      rscored AS (SELECT t.vec_id, t.cell, t.s, rcb.cid,
                    (t.n2 - 2.0 * list_inner_product(t.sv, rcb.c)) + rcb.cc
                      AS d2
                  FROM rsvv t JOIN rcb ON t.s = rcb.s),
      rbest AS (SELECT vec_id, cell, s, cid FROM (
                  SELECT vec_id, cell, s, cid,
                    row_number() OVER (PARTITION BY vec_id, s
                      ORDER BY d2 ASC, cid ASC) AS rk
                  FROM rscored) WHERE rk = 1),
      rsums AS (SELECT b.s, b.cid, g.i AS pos, SUM(t.sv[g.i]) AS sx,
                  COUNT(*) AS cnt
                FROM rbest b
                JOIN rsvv t ON t.vec_id = b.vec_id AND t.s = b.s,
                LATERAL UNNEST(range(1, len(t.sv) + 1)) AS g(i)
                GROUP BY 1, 2, 3),
      rcb1 AS (SELECT s, cid, c, list_inner_product(c, c) AS cc FROM (
                 SELECT s, cid, list(sx / CAST(cnt AS DOUBLE) ORDER BY pos)
                   AS c
                 FROM rsums GROUP BY 1, 2)),
      rbest1 AS (SELECT vec_id, cell, s, cid FROM (
                   SELECT t.vec_id, t.cell, t.s, c.cid,
                     row_number() OVER (PARTITION BY t.vec_id, t.s
                       ORDER BY ((t.n2 - 2.0 * list_inner_product(t.sv, c.c))
                                   + c.cc) ASC,
                         c.cid ASC) AS rk
                   FROM rsvv t JOIN rcb1 c ON t.s = c.s) WHERE rk = 1),
      dt1 AS (SELECT t.vec_id AS query_id, t.cell, c.s, c.cid,
                (t.n2 - 2.0 * list_inner_product(t.sv, c.c)) + c.cc AS ld
              FROM rsvv t JOIN rcb1 c ON t.s = c.s WHERE t.vec_id < 8),
      acc1 AS (SELECT dt1.query_id, b.vec_id AS neighbor_id, b.cell,
                 SUM(dt1.ld) AS d2
               FROM rbest1 b
               JOIN dt1 ON b.s = dt1.s AND b.cid = dt1.cid
                 AND b.cell = dt1.cell
               WHERE b.vec_id <> dt1.query_id
               GROUP BY 1, 2, 3)
      SELECT query_id, rk, neighbor_id, CAST(cell AS BIGINT) AS centroid_id,
        CAST(floor(d2) AS BIGINT) AS adc_d2
      FROM (SELECT query_id, neighbor_id, cell, d2,
              row_number() OVER (PARTITION BY query_id
                ORDER BY d2 ASC, neighbor_id ASC) AS rk
            FROM acc1)
      WHERE rk <= 3""",

    "q94_pq_adc" -> s"""$pqCommonSql,
      q AS (SELECT vec_id AS query_id, s, sv, n2 FROM svv WHERE vec_id < 8),
      dt AS (SELECT q.query_id, cb.s, cb.cid,
               (q.n2 - 2.0 * list_inner_product(q.sv, cb.c)) + cb.cc AS ld
             FROM q JOIN cb ON q.s = cb.s),
      acc AS (SELECT dt.query_id, b.vec_id AS neighbor_id, SUM(dt.ld) AS d2
              FROM best b JOIN dt ON b.s = dt.s AND b.cid = dt.cid
              WHERE b.vec_id <> dt.query_id
              GROUP BY 1, 2)
      SELECT query_id, rk, neighbor_id, CAST(d2 AS BIGINT) AS adc_d2
      FROM (SELECT query_id, neighbor_id, d2,
              row_number() OVER (PARTITION BY query_id
                ORDER BY d2 ASC, neighbor_id ASC) AS rk
            FROM acc)
      WHERE rk <= 3""",

    "q127_pq_rerank" -> s"""$pqCommonSql,
      q AS (SELECT vec_id AS query_id, s, sv, n2 FROM svv WHERE vec_id < 8),
      dt AS (SELECT q.query_id, cb.s, cb.cid,
               (q.n2 - 2.0 * list_inner_product(q.sv, cb.c)) + cb.cc AS ld
             FROM q JOIN cb ON q.s = cb.s),
      acc AS (SELECT dt.query_id, b.vec_id AS neighbor_id, SUM(dt.ld) AS d2
              FROM best b JOIN dt ON b.s = dt.s AND b.cid = dt.cid
              WHERE b.vec_id <> dt.query_id
              GROUP BY 1, 2),
      cand AS (SELECT query_id, neighbor_id FROM (
                 SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY d2 ASC, neighbor_id ASC) AS rk
                 FROM acc) WHERE rk <= 10),
      fv AS (SELECT vec_id, e, list_inner_product(e, e) AS n2 FROM v),
      ex AS (SELECT c.query_id, c.neighbor_id,
               (qv.n2 + cv.n2 - 2.0 * list_inner_product(qv.e, cv.e)) AS d2
             FROM cand c
             JOIN fv qv ON qv.vec_id = c.query_id
             JOIN fv cv ON cv.vec_id = c.neighbor_id)
      SELECT query_id, rk, neighbor_id, CAST(d2 AS BIGINT) AS exact_d2
      FROM (SELECT query_id, neighbor_id, d2,
              row_number() OVER (PARTITION BY query_id
                ORDER BY d2 ASC, neighbor_id ASC) AS rk
            FROM ex)
      WHERE rk <= 3""",

    "q85_sketch_jaccard" -> s"""
      WITH sh AS (${shinglesSql(3)}),
      r AS (SELECT doc_id, md5(sh) AS hv,
              row_number() OVER (PARTITION BY doc_id ORDER BY md5(sh)) AS rn
            FROM sh),
      fp AS (SELECT doc_id, list(hv ORDER BY hv) AS f
             FROM r WHERE rn <= 8 GROUP BY doc_id),
      pairs AS (
        SELECT l.doc_id AS a, r2.doc_id AS b
        FROM documents l JOIN documents r2
          ON l.source = r2.source AND l.doc_id < r2.doc_id
          AND r2.doc_id - l.doc_id <= 40),
      j AS (SELECT p.a, p.b, fa.f AS fa, fb.f AS fb,
              list_sort(list_distinct(fa.f || fb.f))[1:8] AS x
            FROM pairs p
            JOIN fp fa ON fa.doc_id = p.a
            JOIN fp fb ON fb.doc_id = p.b)
      SELECT a, b,
        CAST(len(x) AS BIGINT) AS n_sketch,
        CAST(len(list_intersect(list_intersect(x, fa), fb)) AS BIGINT)
          AS n_overlap
      FROM j""",

    "q86_tfidf" -> s"""
      WITH t AS (SELECT doc_id,
              UNNEST(string_split(${normSql("COALESCE(text, '')")}, ' ')) AS token
            FROM documents),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf
             FROM t WHERE token <> '' GROUP BY 1, 2),
      dfx AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(*) AS n FROM documents),
      s AS (SELECT tf.doc_id, tf.token, tf.tf, dfx.df,
              CAST(tf.tf AS DOUBLE) *
                (((CAST(n.n AS DOUBLE) - CAST(dfx.df AS DOUBLE)) + 0.5) /
                 (CAST(dfx.df AS DOUBLE) + 0.5)) AS tfidf
            FROM tf JOIN dfx USING (token), n),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, token ASC) AS rank FROM s)
      SELECT doc_id, CAST(rank AS INT) AS rank, token,
        CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf
      FROM r WHERE rank <= 3""",

    "q83_image_resize" -> """
      WITH d AS (SELECT doc_id AS asset_id FROM documents),
      px AS (
        SELECT asset_id, (asset_id * 31 + (2 * x) * 7 + (2 * y) * 13) % 256 AS g
        FROM d, generate_series(0, 7) gx(x), generate_series(0, 7) gy(y)),
      c AS (SELECT asset_id, g // 16 AS bin, COUNT(*) AS cnt
            FROM px GROUP BY 1, 2),
      db AS (SELECT asset_id, bin
             FROM d, (SELECT UNNEST(generate_series(0, 15)) AS bin))
      SELECT db.asset_id, 16 AS width, 16 AS height,
        8 AS out_width, 8 AS out_height,
        CAST(db.bin AS INT) AS bin,
        CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
      FROM db LEFT JOIN c ON db.asset_id = c.asset_id AND db.bin = c.bin""",

    "q84_winnow" -> s"""
      WITH sh AS (${shinglesSql(8)}),
      r AS (SELECT doc_id, md5(sh) AS hv,
              row_number() OVER (PARTITION BY doc_id ORDER BY md5(sh)) AS rn
            FROM sh)
      SELECT doc_id, CAST(rn - 1 AS INT) AS rk, hv AS fp_hash
      FROM r WHERE rn <= 8""",

    "q78_quantile_filter" -> s"""
      WITH m AS (SELECT doc_id,
                   CAST(length(string_split(${normSql("text")}, ' ')) AS BIGINT)
                     AS n_tokens
                 FROM documents),
      h AS (SELECT n_tokens AS v, COUNT(*) AS c FROM m GROUP BY 1),
      n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
      cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum, n.n AS n FROM h, n),
      t AS (SELECT MIN(v) AS threshold FROM cum
            WHERE cum >= ceil(0.25 * CAST(n AS DOUBLE)))
      SELECT m.doc_id, m.n_tokens, t.threshold
      FROM m, t WHERE m.n_tokens >= t.threshold""",

    "q123_group_quantile" -> s"""
      WITH m AS (SELECT lang,
                   CAST(length(string_split(${normSql("text")}, ' ')) AS BIGINT)
                     AS n_tokens
                 FROM documents),
      h AS (SELECT lang, n_tokens AS v, COUNT(*) AS c FROM m GROUP BY 1, 2),
      cum AS (SELECT lang, v,
                SUM(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
                SUM(c) OVER (PARTITION BY lang) AS n
              FROM h)
      SELECT lang, CAST(MIN(v) AS BIGINT) AS threshold FROM cum
      WHERE cum >= ceil(0.5 * CAST(n AS DOUBLE)) GROUP BY 1""",

    "q42_embedding_neardup" -> s"""
      WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      b AS (SELECT vec_id, e, ${bucketSql("e", 4)} AS bucket FROM v)
      SELECT l.vec_id AS a, r.vec_id AS b
      FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
      WHERE list_inner_product(l.e, r.e) /
        (sqrt(list_inner_product(l.e, l.e)) * sqrt(list_inner_product(r.e, r.e)))
        >= 0.42"""
  )

  /** SQL mirror of Similarity.lshBucket: the deterministic hyperplanes are
    * inlined as DOUBLE[] literals (shortest-repr doubles parse back to the
    * identical bits). */
  private def bucketSql(vecExpr: String, nPlanes: Int): String = {
    val planes = graft.operators.Similarity.hyperplanes(nPlanes, 64)
    planes.map { p =>
      val lit = p.mkString("[", ", ", "]")
      s"(CASE WHEN list_inner_product($vecExpr, $lit::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
  }

  /** The shared CTE chain of the BPE oracles: word frequencies, initial
    * symbol sequences, and per-step (pair counts → winner b$i → applied
    * s$i) — the merge loop unrolled, winner by (n DESC, l, r), applied
    * with the same leftmost-non-overlapping `replace` on the
    * space-padded encoding. */
  private def bpeCtes(merges: Int): String = {
    val steps = (1 to merges).map { i =>
      s"""t$i AS (SELECT freq, string_split(trim(seq), ' ') AS toks FROM s${i - 1}),
      p$i AS (SELECT toks[g.i] AS l, toks[g.i + 1] AS r, SUM(freq) AS n
              FROM t$i, LATERAL UNNEST(range(1, len(toks))) AS g(i)
              GROUP BY 1, 2),
      b$i AS (SELECT l, r, n FROM p$i ORDER BY n DESC, l ASC, r ASC LIMIT 1),
      s$i AS (SELECT freq, replace(seq, ' ' || b$i.l || ' ' || b$i.r || ' ',
                   ' ' || b$i.l || b$i.r || ' ') AS seq
              FROM s${i - 1}, b$i)"""
    }.mkString(",\n      ")
    s"""w AS (SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
               SELECT UNNEST(string_split(${normSql("text")}, ' ')) AS tok
               FROM documents) WHERE tok <> '' GROUP BY 1),
      s0 AS (SELECT freq,
               ' ' || array_to_string(list_transform(range(1, length(word) + 1),
                 i -> substr(word, i, 1)), ' ') || ' </w> ' AS seq
             FROM w),
      $steps"""
  }

  /** SQL mirror of TextAnalysis.bpeTrain: the merge table b1..bN. */
  private def bpeOracle(merges: Int): String = {
    val sel = (1 to merges).map(i =>
      s"""SELECT $i AS step, l AS left_tok, r AS right_tok,
        l || r AS merged, CAST(n AS BIGINT) AS n FROM b$i""")
      .mkString("\n      UNION ALL\n      ")
    s"""
      WITH ${bpeCtes(merges)}
      $sel"""
  }

  /** SQL mirror of TextAnalysis.bpeTrainBatched: per round, rank pair
    * counts once (candidate window 4·batch + 8, the algorithm's
    * deterministic cap), unroll the greedy symbol-disjoint selection as
    * c{round}_{j} / u{round}_{j} CTE pairs (pick j = first candidate
    * whose symbols avoid the union u of symbols picked so far), apply
    * all accepted merges in rank order, recount, repeat. */
  private def bpeBatchedOracle(merges: Int, batch: Int): String = {
    require(merges % batch == 0, "oracle unroll wants batch | merges")
    val rounds = merges / batch
    val window = 4 * batch + 8
    val roundCtes = (1 to rounds).map { rd =>
      val sel = (1 to batch).map { j =>
        val excl = if (j == 1) "" else
          s"""WHERE l NOT IN (SELECT s FROM u${rd}_${j - 1})
              AND r NOT IN (SELECT s FROM u${rd}_${j - 1}) """
        val u = if (j == 1)
          s"u${rd}_1 AS (SELECT l AS s FROM c${rd}_1 UNION SELECT r FROM c${rd}_1)"
        else
          s"""u${rd}_$j AS (SELECT s FROM u${rd}_${j - 1}
              UNION SELECT l FROM c${rd}_$j UNION SELECT r FROM c${rd}_$j)"""
        s"""c${rd}_$j AS MATERIALIZED (SELECT l, r, n FROM q$rd ${excl}ORDER BY n DESC, l ASC, r ASC LIMIT 1),
      $u"""
      }.mkString(",\n      ")
      val repl = (1 to batch).foldLeft(s"s${rd - 1}.seq") { (acc, j) =>
        s"replace($acc, ' ' || c${rd}_$j.l || ' ' || c${rd}_$j.r || ' ', ' ' || c${rd}_$j.l || c${rd}_$j.r || ' ')"
      }
      val cs = (1 to batch).map(j => s"c${rd}_$j").mkString(", ")
      // MATERIALIZED: DuckDB inlines multiply-referenced CTEs by default,
      // and the per-round cross join of `batch` selection CTEs (each
      // expanding the whole prior chain) would blow up file opens
      // exponentially with rounds
      s"""t$rd AS (SELECT freq, string_split(trim(seq), ' ') AS toks FROM s${rd - 1}),
      p$rd AS (SELECT toks[g.i] AS l, toks[g.i + 1] AS r, SUM(freq) AS n
              FROM t$rd, LATERAL UNNEST(range(1, len(toks))) AS g(i)
              GROUP BY 1, 2),
      q$rd AS MATERIALIZED (SELECT l, r, n FROM p$rd ORDER BY n DESC, l ASC, r ASC LIMIT $window),
      $sel,
      s$rd AS MATERIALIZED (SELECT freq, $repl AS seq FROM s${rd - 1}, $cs)"""
    }.mkString(",\n      ")
    val out = (1 to rounds).flatMap { rd =>
      (1 to batch).map { j =>
        val step = (rd - 1) * batch + j
        s"""SELECT $step AS step, l AS left_tok, r AS right_tok,
        l || r AS merged, CAST(n AS BIGINT) AS n FROM c${rd}_$j"""
      }
    }.mkString("\n      UNION ALL\n      ")
    s"""
      WITH w AS (SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
               SELECT UNNEST(string_split(${normSql("text")}, ' ')) AS tok
               FROM documents) WHERE tok <> '' GROUP BY 1),
      s0 AS (SELECT freq,
               ' ' || array_to_string(list_transform(range(1, length(word) + 1),
                 i -> substr(word, i, 1)), ' ') || ' </w> ' AS seq
             FROM w),
      $roundCtes
      $out"""
  }

  /** SQL mirror of TextAnalysis.bpeEncodeCounts: each document becomes
    * one padded symbol string (spaces → </w>), then the learned merges
    * apply as nested replaces in training order. */
  private def bpeApplyOracle(merges: Int): String = {
    val repl = (1 to merges).foldLeft("seqd") { (acc, i) =>
      s"replace($acc, ' ' || b$i.l || ' ' || b$i.r || ' ', ' ' || b$i.l || b$i.r || ' ')"
    }
    val bs = (1 to merges).map("b" + _).mkString(", ")
    s"""
      WITH ${bpeCtes(merges)},
      d AS (SELECT doc_id, ${normSql("text")} AS nt FROM documents),
      dd AS (SELECT doc_id,
               CAST(length(string_split(nt, ' ')) AS BIGINT) AS n_words,
               ' ' || array_to_string(list_transform(range(1, length(nt) + 1),
                 i -> CASE WHEN substr(nt, i, 1) = ' ' THEN '</w> '
                      ELSE substr(nt, i, 1) END), ' ') || ' </w> ' AS seqd
             FROM d)
      SELECT doc_id, n_words,
        CAST(length(list_filter(string_split(trim($repl), ' '),
          t -> t <> '')) AS BIGINT) AS n_bpe_tokens
      FROM dd, $bs"""
  }

  /** SQL mirror of TextAnalysis.bm25 (k1=1.25, b=0.75 — dyadic, so every
    * constant is an exact double; rational IDF, no ln; same left-assoc
    * term-sum order as the Scala reduce). */
  /** Mirror of TextIndex search (k1=1.25, b=0.75): BM25 recomputed from
    * scratch over documents, per-term scores quantized BEFORE the sum
    * (floor(10⁴·x) — doubles from exact integer inputs are bit-identical
    * across engines, the long sum is order-independent), docs containing
    * no query term excluded, (bm25_q4 desc, doc_id asc) top-k. The
    * append gate shares it: growing even-ids + odd-ids must equal the
    * from-scratch index. */
  private def bm25IndexOracle(terms: Seq[String], topK: Int,
                              corpusWhere: String = ""): String = {
    val tfCols = terms.indices.map(i =>
      s"CAST(len(list_filter(toks, x -> x = '${terms(i)}')) AS BIGINT) AS tf$i")
      .mkString(",\n              ")
    val dfAggs = terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n              ")
    val q4s = terms.indices.map { i =>
      s"""CAST(floor(10000.0 * ((((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE)) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))
         | * ((CAST(tf$i AS DOUBLE) * 2.25) /
         |    (CAST(tf$i AS DOUBLE) + 1.25 * (0.25 + 0.75 *
         |      (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))))) AS BIGINT)""".stripMargin
    }
    val total = q4s.reduce((a, b) => s"($a + $b)")
    val anyTf = terms.indices.map(i => s"tf$i").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, string_split(${normSql("COALESCE(text, '')")}, ' ') AS toks
       |           FROM documents$corpusWhere),
       |w AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       |              $tfCols
       |      FROM t),
       |s AS (SELECT CAST(SUM(dl) AS BIGINT) AS sumdl, COUNT(*) AS n,
       |              $dfAggs
       |      FROM w),
       |sc AS (SELECT doc_id, $total AS bm25_q4
       |       FROM w, s WHERE ($anyTf) > 0)
       |SELECT doc_id, rk, bm25_q4 FROM (
       |  SELECT doc_id, bm25_q4,
       |    row_number() OVER (ORDER BY bm25_q4 DESC, doc_id ASC) AS rk
       |  FROM sc)
       |WHERE rk <= $topK""".stripMargin
  }

  private def bm25Oracle(terms: Seq[String]): String = {
    val tfCols = terms.indices.map(i =>
      s"CAST(len(list_filter(toks, x -> x = '${terms(i)}')) AS BIGINT) AS tf$i")
      .mkString(",\n              ")
    val dfAggs = terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n              ")
    val termScores = terms.indices.map { i =>
      s"""((((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE)) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))
         | * ((CAST(tf$i AS DOUBLE) * 2.25) /
         |    (CAST(tf$i AS DOUBLE) + 1.25 * (0.25 + 0.75 *
         |      (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))))""".stripMargin
    }
    val score = termScores.reduce((a, b) => s"($a + $b)")
    s"""WITH t AS (SELECT doc_id, string_split(${normSql("COALESCE(text, '')")}, ' ') AS toks
       |           FROM documents),
       |w AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       |              $tfCols
       |      FROM t),
       |s AS (SELECT CAST(SUM(dl) AS BIGINT) AS sumdl, COUNT(*) AS n,
       |              $dfAggs
       |      FROM w)
       |SELECT doc_id, $score AS bm25 FROM w, s""".stripMargin
  }

  private def stopCountSql(lang: String): String = {
    val words = graft.operators.TextAnalysis.stopwords(lang)
    words.map { w =>
      s"(length(' ' || nt || ' ') - length(replace(' ' || nt || ' ', '$w', ''))) // ${w.length}"
    }.mkString("(", " + ", ")")
  }

  private def langIdOracle: String = {
    val langs = graft.operators.TextAnalysis.stopwords.keys.toSeq.sorted
    val scores = langs.map(l => s"${stopCountSql(l)} AS s_$l").mkString(", ")
    // argmax with alphabetical tie-break = greatest struct of (score, -rank)
    val structList = langs.zipWithIndex.map { case (l, i) =>
      s"{'s': s_$l, 'nr': ${-i}, 'l': '$l'}"
    }.mkString(", ")
    s"""WITH d AS (SELECT doc_id, lang, ${normSql("text")} AS nt FROM documents),
       |sc AS (SELECT doc_id, lang, $scores FROM d),
       |p AS (SELECT doc_id, lang,
       |  list_aggregate([$structList], 'max').l AS pred_lang FROM sc)
       |SELECT doc_id, pred_lang,
       |  CAST(pred_lang = lang AS INT) AS hit FROM p""".stripMargin
  }
}
