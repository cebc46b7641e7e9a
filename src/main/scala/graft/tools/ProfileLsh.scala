package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.{Dedup, Similarity}

/** Scratch profiling main for the LSH pair-generation stack (dev tool). */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("32", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val dir = "/root/testdata/sf0.1"
    val docs = graft.core.Tables(spark, dir, "documents")
    docs.count() // warm the scan

    // stage-by-stage: where does q32 (uncapped lshCandidatePairs) spend?
    val sigs = Dedup.minHashSignature(docs, "text", "doc_id", shingleK = 8, numHashes = 8)
    time("minhash sigs")(sigs.count())
    val banded = Dedup.lshBands(sigs, "doc_id", numHashes = 8, bands = 4)
    time("banded")(banded.count())
    val w = Window.partitionBy("band", "band_sig")
    val sized = banded.withColumn("__bn", count(lit(1)).over(w))
    time("sized (window)")(sized.count())
    time("q32 full current")(
      Dedup.lshCandidatePairs(docs, "text", "doc_id", shingleK = 8,
        numHashes = 8, bands = 4, maxBucketSize = Int.MaxValue).count())
    time("q32 full current again")(
      Dedup.lshCandidatePairs(docs, "text", "doc_id", shingleK = 8,
        numHashes = 8, bands = 4, maxBucketSize = Int.MaxValue).count())

    // candidate rewrite: groupBy + in-row pair expansion, no self-join
    def pairsInRow(maxBucketSize: Int): DataFrame = {
      val buckets = banded.groupBy("band", "band_sig")
        .agg(sort_array(collect_list(col("doc_id"))).as("__ids"))
      val n = size(col("__ids"))
      val small = buckets.where(n >= 2 && n <= maxBucketSize)
        .select(explode(flatten(transform(col("__ids"), (x, i) =>
          transform(slice(col("__ids"), i + lit(2), n),
            y => struct(x.as("a"), y.as("b")))))).as("__p"))
        .select(col("__p.a").as("a"), col("__p.b").as("b"))
      val chained = buckets.where(n > maxBucketSize)
        .select(explode(arrays_zip(
          slice(col("__ids"), lit(1), n - 1).as("a"),
          slice(col("__ids"), lit(2), n - 1).as("b"))).as("__p"))
        .select(col("__p.a").as("a"), col("__p.b").as("b"))
      small.union(chained).distinct()
    }
    time("q32 in-row rewrite")(pairsInRow(Int.MaxValue).count())
    time("q32 in-row rewrite again")(pairsInRow(Int.MaxValue).count())

    // distribution: how big do buckets get at sf0.1?
    val dist = banded.groupBy("band", "band_sig").count()
      .agg(max("count").as("max_bn"), avg("count").as("avg_bn"),
        count(lit(1)).as("n_buckets")).head()
    println(s"bucket dist: $dist")

    // q42 shape
    val emb = graft.core.Tables(spark, dir, "embeddings")
    emb.count()
    time("q42 current")(
      Similarity.embeddingNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.42, nPlanes = 4, maxBucketSize = Int.MaxValue).count())
    time("q42 current again")(
      Similarity.embeddingNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.42, nPlanes = 4, maxBucketSize = Int.MaxValue).count())
    spark.stop()
  }
}
