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
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
    spark.stop()
  }
}
