package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * All hash primitives are md5-based column expressions (portable: identical
  * output in any engine, which the oracle gate exploits) and every operator
  * is a pure DataFrame plan — shuffles only on the natural keys
  * (hash, band signature), map-side combine everywhere.
  *
  * Scale notes (100 TB posture):
  *  - exact dedup = one hash-aggregate over the corpus; no sort.
  *  - MinHash LSH: corpus → shingles (flatMap-shaped explode) → per-doc
  *    signature (hash-agg) → band explode → self-join *within band buckets
  *    only*. The band group-by is the only join; its fan-out is bounded by
  *    bucket sizes, the classic LSH trade-off.
  *  - SimHash: one pass, fixed 32 planes per token; no join at all until
  *    bucket grouping.
  */
object Dedup {

  /** Normalized text key: lowercase, collapsed whitespace. */
  def normalizedText(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Exact duplicate groups by content hash: (hash, keepId, nCopies).
    * Dedup = semi-join back on keepId (or dropDuplicates on the hash). */
  def exactDuplicateGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(md5(normalizedText(col(textCol))).as("text_md5"), col(idCol))
      .groupBy("text_md5")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Drop exact duplicates, keeping the smallest id per content hash. */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactDuplicateGroups(df, textCol, idCol)
      .select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Character k-shingle set of the normalized text (distinct). */
  def shingles(text: Column, k: Int): Column = {
    val t = normalizedText(text)
    array_distinct(transform(
      sequence(lit(1), greatest(length(t) - (k - 1), lit(1))),
      i => t.substr(i, lit(k))))
  }

  /** Portable shingle hash for MinHash: md5 salted by the hash-function
    * index; the *string* order of md5 hex serves as the hash order, so
    * min() needs no integer conversion (engine-portable). */
  def saltedHash(hashIdx: Int, s: Column): Column =
    md5(concat(lit(hashIdx.toString), lit("|"), s))

  /** MinHash signature: numHashes min-salted-md5 strings per document.
    * One explode + one hash-aggregate (partial min map-side). */
  def minHashSignature(df: DataFrame, textCol: String, idCol: String,
                       shingleK: Int = 3, numHashes: Int = 8): DataFrame = {
    val exploded = df.select(col(idCol),
        explode(shingles(col(textCol), shingleK)).as("__sh"))
    val aggs = (0 until numHashes).map(h =>
      min(saltedHash(h, col("__sh"))).as(s"mh$h"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: (band, bandSig, id) — docs sharing a (band, bandSig)
    * bucket are near-duplicate candidates. */
  def lshBands(signatures: DataFrame, idCol: String,
               numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val sig = concat_ws("_",
        (b * rows until (b + 1) * rows).map(h => col(s"mh$h")): _*)
      struct(lit(b).as("band"), sig.as("band_sig"))
    }
    signatures.select(col(idCol), explode(array(bandCols: _*)).as("__b"))
      .select(col(idCol), col("__b.band").as("band"), col("__b.band_sig").as("band_sig"))
  }

  /** Candidate near-duplicate pairs (a < b) from LSH buckets. */
  def lshCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, numHashes: Int = 8,
                        bands: Int = 4): DataFrame = {
    val sigs = minHashSignature(df, textCol, idCol, shingleK, numHashes)
    val banded = lshBands(sigs, idCol, numHashes, bands)
    val l = banded.select(col("band"), col("band_sig"), col(idCol).as("a"))
    val r = banded.select(col("band"), col("band_sig"), col(idCol).as("b"))
    l.join(r, Seq("band", "band_sig"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** 32-plane SimHash from whitespace tokens, engine-portable: the sign of
    * plane j for a token is the top bit of hex digit j of md5(token),
    * approximated portably as digit ∈ {8..f} (tested by strpos on the hex
    * alphabet tail). simhash = Σ 2^j over planes with positive vote sum. */
  def simHash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tokens = df.select(col(idCol),
      explode(split(normalizedText(col(textCol)), " ")).as("__tok"))
    val hashed = tokens.withColumn("__h", md5(col("__tok")))
    val planes = hashed.select(col(idCol),
        explode(sequence(lit(1), lit(32))).as("j"), col("__h"))
      .withColumn("vote",
        when(expr("instr('89abcdef', substr(__h, j, 1))") > 0, 1L)
          .otherwise(-1L))
    planes.groupBy(col(idCol), col("j"))
      .agg(sum(col("vote")).as("v"))
      .groupBy(col(idCol))
      .agg(sum(when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), j - 1)"))
        .otherwise(0L)).as("simhash"))
  }

  /** n-gram Jaccard via pairwise shingle-overlap counts: explode both
    * sides once, join on the shingle, count matches; union = |A|+|B|-inter.
    * Returns exact (a, b, intersection, union) set sizes over distinct
    * shingles — integer outputs, hash-stable across engines. */
  def ngramJaccardCounts(df: DataFrame, pairs: DataFrame, textCol: String,
                         idCol: String, shingleK: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      explode(shingles(col(textCol), shingleK)).as("__sh"))
    val sizes = sh.groupBy("__id").agg(count(lit(1)).as("__n"))
    val aSide = sh.select(col("__id").as("a"), col("__sh"))
    val bSide = sh.select(col("__id").as("b"), col("__sh"))
    val inter = pairs.join(aSide, Seq("a")).join(bSide, Seq("b", "__sh"))
      .groupBy("a", "b").agg(count(lit(1)).as("intersection"))
    pairs
      .join(inter, Seq("a", "b"), "left")
      .join(sizes.select(col("__id").as("a"), col("__n").as("__na")), Seq("a"))
      .join(sizes.select(col("__id").as("b"), col("__n").as("__nb")), Seq("b"))
      .select(col("a"), col("b"),
        coalesce(col("intersection"), lit(0L)).as("intersection"),
        (col("__na") + col("__nb") - coalesce(col("intersection"), lit(0L))).as("union_size"))
  }
}
