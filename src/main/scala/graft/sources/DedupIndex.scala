package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.operators.Dedup

/** Persisted MinHash/LSH dedup index — incremental near-dup detection of a
  * NEW batch against an already-archived corpus, without recomputing (or
  * even reading) the corpus text.
  *
  * The production shape of text dedup is not "dedup this batch against
  * itself" (`Dedup.lshCandidatePairs`) but "dedup today's crawl against the
  * 100 TB we already kept" — which needs the corpus's MinHash band
  * signatures saved once and joinable forever (the same incremental
  * re-archival premise as the reference's update mode,
  * satbucket/routines.py:791-810, transplanted to dedup). Layout mirrors
  * [[AnnIndex]]:
  *
  * {{{
  * indexDir/
  *   _dedup_index.json      manifest: shingle_k / num_hashes / bands / id_col
  *   bands/band=<b>/        (band_sig, id): LSH band postings, band-partitioned
  *   signatures/            (id, sig[numHashes]): full MinHash signatures
  *   bucket_stats/          (band, band_sig, n, rep_id): per-bucket count + min id
  * }}}
  *
  * 100 TB posture: a query scans ONLY signature-scale data — the corpus
  * text never loads. The new batch (typically ≪ corpus) broadcasts to both
  * joins, so the corpus-side `bands` and `signatures` scans never shuffle.
  * Over-populated buckets (boilerplate signatures — the LSH scale-killer)
  * are pre-aggregated into `bucket_stats` at WRITE time, so the query can
  * route an over-cap bucket to its stored representative id in O(1) per new
  * doc without ever materializing the bucket; under-cap buckets produce
  * exact all-pairs candidates. Appends are incremental: batch-sized band /
  * signature appends plus a bucket-count-sized stats merge — nothing
  * corpus-sized is rewritten or rescanned.
  */
object DedupIndex {

  val ManifestFile = "_dedup_index.json"

  /** Pack mh0..mh{n-1} signature columns into one array column. */
  private def packedSig(numHashes: Int) =
    array((0 until numHashes).map(i => col(s"mh$i")): _*).as("sig")

  /** Build and persist the index over `corpus`. Overwrites `indexDir`. */
  def save(corpus: DataFrame, textCol: String, idCol: String, indexDir: String,
           shingleK: Int = 3, numHashes: Int = 8, bands: Int = 4): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val sigs = Dedup.minHashSignature(corpus, textCol, idCol, shingleK, numHashes)
    Dedup.lshBands(sigs, idCol, numHashes, bands)
      .write.mode("overwrite").partitionBy("band").parquet(s"$indexDir/bands")
    sigs.select(col(idCol), packedSig(numHashes))
      .write.mode("overwrite").parquet(s"$indexDir/signatures")
    // stats from the WRITTEN postings (not a recompute) — guarantees the
    // counts and the band files can never disagree
    val spark = corpus.sparkSession
    bandsOf(spark, indexDir)
      .groupBy("band", "band_sig")
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("rep_id"))
      .write.mode("overwrite").parquet(s"$indexDir/bucket_stats")
    val manifest: Map[String, Any] = Map(
      "index_type" -> "minhash_lsh", "shingle_k" -> shingleK,
      "num_hashes" -> numHashes, "bands" -> bands, "id_col" -> idCol)
    BucketFs.writeString(s"$indexDir/$ManifestFile",
      JsonMethods.pretty(JsonMethods.render(
        JObject(manifest.toList.map {
          case (k, s: String) => k -> (JString(s): JValue)
          case (k, i: Int) => k -> (JInt(i): JValue)
          case (k, other) => k -> (JString(other.toString): JValue)
        }))))
  }

  // band is a directory-partition column: pin its read-back type
  private def bandsOf(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/bands")
      .withColumn("band", col("band").cast("int"))

  /** Reload a persisted dedup index (manifest + lazy parquet frames). */
  def load(spark: SparkSession, indexDir: String): MinHashIndex = {
    val p = s"$indexDir/$ManifestFile"
    if (!BucketFs.exists(p))
      throw new IllegalArgumentException(
        s"no $ManifestFile in $indexDir — not a dedup index?")
    val mf = JsonMethods.parse(BucketFs.readString(p))
    def int(field: String): Int = mf \ field match {
      case JInt(x) => x.toInt
      case other => throw new IllegalArgumentException(
        s"manifest field '$field' missing or non-integer: $other")
    }
    val idxType = mf \ "index_type" match { case JString(s) => s; case _ => "?" }
    require(idxType == "minhash_lsh", s"unsupported index_type '$idxType'")
    val idCol = mf \ "id_col" match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException("manifest missing id_col")
    }
    MinHashIndex(spark, indexDir, int("shingle_k"), int("num_hashes"),
      int("bands"), idCol)
  }

  final case class MinHashIndex(spark: SparkSession, indexDir: String,
                                shingleK: Int, numHashes: Int, bands: Int,
                                idCol: String) {

    def bandPostings: DataFrame = bandsOf(spark, indexDir)
    def signatures: DataFrame = spark.read.parquet(s"$indexDir/signatures")
    def bucketStats: DataFrame = spark.read.parquet(s"$indexDir/bucket_stats")

    /** Index `batch` incrementally: batch-sized appends to the band
      * postings and signatures, plus a stats merge that touches only
      * bucket-count rows — the whole corpus side is never rescanned.
      * Appending rows whose ids are already indexed double-posts them
      * (same contract as [[AnnIndex.IvfPqIndex.append]]: ids are keys,
      * the caller dedups ingest batches). Returns the refreshed index. */
    def append(batch: DataFrame, textCol: String): MinHashIndex = {
      val sigs = Dedup.minHashSignature(batch, textCol, idCol, shingleK, numHashes)
      val banded = Dedup.lshBands(sigs, idCol, numHashes, bands)
      banded.write.mode("append").partitionBy("band").parquet(s"$indexDir/bands")
      sigs.select(col(idCol), packedSig(numHashes))
        .write.mode("append").parquet(s"$indexDir/signatures")
      // incremental stats merge: old stats ∪ batch stats → sum n, min rep.
      // The batch side re-derives from `banded` (batch-sized recompute)
      // rather than rescanning the appended files — cheaper and append-
      // atomicity-independent.
      val batchStats = banded.groupBy("band", "band_sig")
        .agg(count(lit(1)).as("n"), min(col(idCol)).as("rep_id"))
      val merged = bucketStats.unionByName(batchStats)
        .groupBy("band", "band_sig")
        .agg(sum(col("n")).as("n"), min(col("rep_id")).as("rep_id"))
      val tmp = s"$indexDir/bucket_stats_tmp"
      BucketFs.deleteRecursive(tmp)
      merged.write.mode("overwrite").parquet(tmp)
      // crash-safe swap (same discipline as AnnIndex.compactCodes): the
      // live stats move ASIDE before the rewrite moves in, so one complete
      // copy always exists on disk
      val old = s"$indexDir/bucket_stats_old"
      BucketFs.deleteRecursive(old)
      val (fs, live) = BucketFs.resolve(s"$indexDir/bucket_stats")
      val (_, oldP) = BucketFs.resolve(old)
      BucketFs.move(fs, live, oldP)
      val (_, src) = BucketFs.resolve(tmp)
      val (_, dst) = BucketFs.resolve(s"$indexDir/bucket_stats")
      BucketFs.move(fs, src, dst)
      BucketFs.deleteRecursive(old)
      this
    }

    /** Near-duplicate candidates of `batch` against the INDEXED corpus:
      * (new_id, corpus_id, n_match) where n_match counts agreeing MinHash
      * components out of `numHashes` — the standard unbiased Jaccard
      * estimate (n_match/numHashes), computed purely from stored
      * signatures; corpus text is never touched. Self-pairs (a batch id
      * already present in the corpus) are dropped.
      *
      * `maxBucketSize`: buckets whose STORED population exceeds the cap
      * pair each matching new doc with the bucket's representative id only
      * (min id, from bucket_stats) instead of the whole bucket — O(1) per
      * new doc instead of O(bucket), the cross-corpus analogue of
      * [[Dedup.lshCandidatePairs]]'s chain degrade. Duplicate detection is
      * preserved (any hit still surfaces A corpus witness); exhaustive
      * witness ENUMERATION inside mass-duplicated buckets is what's traded
      * away. `Int.MaxValue` disables the cap (exact all-pairs — what the
      * DuckDB oracle gates). */
    def candidates(batch: DataFrame, textCol: String,
                   maxBucketSize: Int = 1024): DataFrame = {
      val sigs = Dedup.minHashSignature(batch, textCol, idCol, shingleK, numHashes)
      val newSigs = sigs.select(col(idCol).as("new_id"),
        packedSig(numHashes).as("new_sig"))
      val newBands = Dedup.lshBands(sigs, idCol, numHashes, bands)
        .select(col(idCol).as("new_id"), col("band"), col("band_sig"))
      // bucket_stats is bounded by distinct (band, band_sig) — broadcast
      // the (small) new side so the stats join never shuffles stored data
      val matched = bucketStats.join(broadcast(newBands), Seq("band", "band_sig"))
      val under = matched.where(col("n") <= maxBucketSize)
      val underPairs = bandPostings
        .join(broadcast(under.select("band", "band_sig", "new_id")),
          Seq("band", "band_sig"))
        .select(col("new_id"), col(idCol).as("corpus_id"))
      val overPairs = matched.where(col("n") > maxBucketSize)
        .select(col("new_id"), col("rep_id").as("corpus_id"))
      val pairs = underPairs.unionByName(overPairs)
        .where(col("new_id") =!= col("corpus_id")).distinct()
      // candidate set is new-batch-bounded: broadcast it against the
      // corpus signatures scan (again no corpus-side shuffle), then count
      // agreeing components in-row
      pairs.join(broadcast(newSigs), Seq("new_id"))
        .join(signatures, col("corpus_id") === col(idCol))
        .select(col("new_id"), col("corpus_id"),
          size(filter(zip_with(col("new_sig"), col("sig"),
            (a, b) => a === b), x => x)).as("n_match"))
    }

    /** Batch rows that do NOT near-duplicate the indexed corpus: the keep
      * side of incremental ingest. A row is dropped when any candidate
      * agrees on ≥ `minMatch` of the `numHashes` signature components. */
    def newDocsToKeep(batch: DataFrame, textCol: String, minMatch: Int,
                      maxBucketSize: Int = 1024): DataFrame = {
      val dup = candidates(batch, textCol, maxBucketSize)
        .where(col("n_match") >= minMatch)
        .select(col("new_id")).distinct()
      batch.join(dup, batch(idCol) === dup("new_id"), "left_anti")
    }
  }
}
