package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.operators.Dedup

/** Persisted sparse (BM25) text index — the lexical half of hybrid
  * retrieval, with the same on-disk lifecycle discipline as the dense
  * [[AnnIndex]]: save / load / search / append, a JSON manifest, and a
  * layout whose partitioning IS the query plan.
  *
  * Layout under `indexDir/`:
  *  - `postings/bucket=B/…` — (term, id, tf, dl) rows, hash-partitioned
  *    by `bucket = pmod(xxhash64(term), nBuckets)`. A query's terms map
  *    to a bounded bucket set, pushed as a static partition filter: the
  *    search lists and reads ONLY those directories — the inverted-list
  *    pruning that makes a 100 TB corpus searchable without touching
  *    its postings. Document length rides denormalized on each posting
  *    so scoring never joins a corpus-sized side.
  *  - `termstats/bucket=B/…` — (term, df) DELTA rows, same bucketing.
  *    Appends add delta rows instead of rewriting; readers aggregate
  *    (sum of deltas = document frequency), so append is O(batch).
  *  - `_text_index.json` — n_docs, sum_dl (corpus-level BM25 constants,
  *    additive under append), n_buckets, id column.
  *
  * Scores are emitted as `bm25_q4` = Σ_term floor(10⁴·termScore) — the
  * same quantize-before-sum trick as charLmScore: per-term IEEE doubles
  * from exact integer inputs are bit-identical across engines, and the
  * integer sum is order-independent, so results hash-match an oracle
  * (a raw double sum would depend on shuffle arrival order). Documents
  * containing none of the query terms are not returned (their BM25 is
  * exactly 0). */
object TextIndex {

  private val ManifestFile = "_text_index.json"

  private def tokens(textCol: String) =
    split(Dedup.normalizedText(coalesce(col(textCol), lit(""))), " ")

  /** (id, term, tf, dl) for every non-empty term occurrence. */
  private def postingsOf(corpus: DataFrame, textCol: String,
                         idCol: String): DataFrame =
    Dedup.fanOut(corpus)
      .select(col(idCol).cast("long").as("id"), tokens(textCol).as("__toks"))
      .select(col("id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))

  private def withBucket(df: DataFrame, nBuckets: Int): DataFrame =
    df.withColumn("bucket", pmod(xxhash64(col("term")), lit(nBuckets.toLong)))

  /** Corpus-level constants: (n_docs, sum_dl). Empty-text docs count
    * toward both (dl 0), mirroring the inline [[graft.operators
    * .TextAnalysis.bm25]] statistics. */
  private def corpusStats(corpus: DataFrame, textCol: String): (Long, Long) = {
    val r = corpus.select(size(tokens(textCol)).cast("long").as("__dl"))
      .agg(count(lit(1)), sum(col("__dl"))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Build the index. One pass over the corpus: tokenize → per-(doc,
    * term) tf with dl denormalized → bucket-partitioned postings and
    * per-term df rows; corpus constants land in the manifest. */
  def save(corpus: DataFrame, textCol: String, idCol: String,
           indexDir: String, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val posts = withBucket(postingsOf(corpus, textCol, idCol), nBuckets)
      .localCheckpoint(true) // postings feed both writes; tokenize once
    posts.select(col("bucket"), col("term"), col("id"), col("tf"), col("dl"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexDir/postings")
    posts.groupBy(col("bucket"), col("term"))
      .agg(count(lit(1)).as("df"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexDir/termstats")
    val (nDocs, sumDl) = corpusStats(corpus, textCol)
    writeManifest(indexDir, nDocs, sumDl, nBuckets, idCol)
  }

  private def writeManifest(indexDir: String, nDocs: Long, sumDl: Long,
                            nBuckets: Int, idCol: String): Unit = {
    val j: JValue = JObject(List(
      "index_type" -> JString("bm25"), "n_docs" -> JInt(nDocs),
      "sum_dl" -> JInt(sumDl), "n_buckets" -> JInt(nBuckets),
      "id_col" -> JString(idCol)))
    BucketFs.writeString(s"$indexDir/$ManifestFile",
      JsonMethods.pretty(JsonMethods.render(j)))
  }

  final case class Bm25Index(spark: SparkSession, indexDir: String,
                             nDocs: Long, sumDl: Long, nBuckets: Int,
                             idCol: String) {

    /** Grow the index: the batch's postings and df-delta rows append
      * into the bucket layout (dynamic partition append — only touched
      * buckets gain files, nothing rewrites), the manifest constants add.
      * Ids must be new; re-indexing an id double-counts it. Returns a
      * fresh load so the new files are visible. */
    def append(batch: DataFrame, textCol: String): Bm25Index = {
      val posts = withBucket(postingsOf(batch, textCol, idCol), nBuckets)
        .localCheckpoint(true)
      posts.select(col("bucket"), col("term"), col("id"), col("tf"), col("dl"))
        .write.mode("append").partitionBy("bucket")
        .parquet(s"$indexDir/postings")
      posts.groupBy(col("bucket"), col("term"))
        .agg(count(lit(1)).as("df"))
        .write.mode("append").partitionBy("bucket")
        .parquet(s"$indexDir/termstats")
      val (bN, bDl) = corpusStats(batch, textCol)
      writeManifest(indexDir, nDocs + bN, sumDl + bDl, nBuckets, idCol)
      load(spark, indexDir)
    }

    /** BM25 top-k for a fixed term set. Reads ONLY the query terms'
      * bucket directories (static partition filter computed from the
      * terms — one LocalTableScan job, no file I/O), aggregates df
      * deltas for those terms, scores postings row-local against the
      * manifest constants, and ranks. Output: (id, rk, bm25_q4),
      * bm25_q4 desc / id asc, only documents containing ≥ 1 term. */
    def search(terms: Seq[String], topK: Int,
               k1: Double = 1.25, b: Double = 0.75): DataFrame = {
      require(terms.nonEmpty, "search needs at least one term")
      require(topK >= 1, s"topK must be >= 1, got $topK")
      import spark.implicits._
      val buckets = terms.toDF("term")
        .select(pmod(xxhash64(col("term")), lit(nBuckets.toLong)))
        .collect().map(_.getLong(0)).distinct.toSeq
      def pruned(path: String): DataFrame =
        spark.read.parquet(path)
          .where(col("bucket").isin(buckets: _*) &&
            col("term").isin(terms: _*))
      val dfOf = pruned(s"$indexDir/termstats")
        .groupBy(col("term")).agg(sum(col("df")).as("df"))
      val avgdl = lit(sumDl.toDouble) / lit(nDocs.toDouble)
      val idf = ((lit(nDocs.toDouble) - col("df").cast("double")) + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))
      val tf = col("tf").cast("double")
      val termScore = idf * ((tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("dl").cast("double") / avgdl))))
      // orderBy+limit plans as TakeOrderedAndProject (per-partition
      // heads merged on the driver) — no global sort; the row_number
      // window then ranks only the topK survivors
      pruned(s"$indexDir/postings")
        .join(broadcast(dfOf), Seq("term"))
        .withColumn("__q4", floor(lit(1e4) * termScore).cast("long"))
        .groupBy(col("id"))
        .agg(sum(col("__q4")).as("bm25_q4"))
        .orderBy(col("bm25_q4").desc, col("id").asc)
        .limit(topK)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("bm25_q4").desc, col("id").asc)))
        .select(col("id").as(idCol), col("rk"), col("bm25_q4"))
    }
  }

  def load(spark: SparkSession, indexDir: String): Bm25Index = {
    val p = s"$indexDir/$ManifestFile"
    if (!BucketFs.exists(p))
      throw new IllegalArgumentException(
        s"no $ManifestFile in $indexDir — not a text index?")
    val mf = JsonMethods.parse(BucketFs.readString(p))
    def long(field: String): Long = mf \ field match {
      case JInt(x) => x.toLong
      case other => throw new IllegalArgumentException(
        s"manifest field '$field' missing or non-integer: $other")
    }
    val idxType = mf \ "index_type" match { case JString(s) => s; case _ => "?" }
    require(idxType == "bm25", s"unsupported index_type '$idxType'")
    val idCol = mf \ "id_col" match {
      case JString(s) => s
      case _ => throw new IllegalArgumentException("manifest missing id_col")
    }
    Bm25Index(spark, indexDir, long("n_docs"), long("sum_dl"),
      long("n_buckets").toInt, idCol)
  }
}
