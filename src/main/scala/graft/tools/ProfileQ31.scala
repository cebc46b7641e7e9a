package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main for the q31_minhash_sig regression (dev tool). */
object ProfileQ31 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("32", "32", rawLocalFs = true).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Any): Double = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-40s $s%8.2f s  ($r)")
      s
    }

    def q31(df: DataFrame): Long = {
      import spark.implicits._
      graft.operators.Dedup.minHashSignature(df, "text", "doc_id",
          shingleK = 8, numHashes = 4)
        .select($"doc_id", $"mh0", $"mh1", $"mh2", $"mh3").count()
    }

    // warm (matches Bench warmup)
    q31(graft.core.Tables(spark, "/root/testdata/sf0.001", "documents"))

    (1 to 3).foreach { i =>
      time(s"gated (ReaderSession+fanOut) #$i")(
        q31(graft.core.Tables(spark, dir, "documents")))
    }
    (1 to 3).foreach { i =>
      time(s"direct read (no clone) #$i")(
        q31(spark.read.parquet(s"$dir/documents.parquet")))
    }
    // fanOut cost alone: df.rdd.getNumPartitions on both paths
    time("rdd.getNumPartitions clone")(
      graft.core.Tables(spark, dir, "documents").rdd.getNumPartitions)
    time("rdd.getNumPartitions direct")(
      spark.read.parquet(s"$dir/documents.parquet").rdd.getNumPartitions)
    // explicit repartition, skipping the probe
    def q31NoProbe(df: DataFrame): Long = {
      import spark.implicits._
      val fan = df.repartition(spark.sparkContext.defaultParallelism)
      val exploded = fan.select(col("doc_id"),
        explode(graft.operators.Dedup.shingles(col("text"), 8)).as("__sh"))
      val (h1, h2) = graft.operators.Dedup.shingleHashPair(col("__sh"))
      val hashed = exploded.select(col("doc_id"), h1.as("__h1"), h2.as("__h2"))
      val aggs = (0 until 4).map(i =>
        min(col("__h1") + lit(i.toLong) * col("__h2")).as(s"mh$i"))
      hashed.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*).count()
    }
    (1 to 3).foreach { i =>
      time(s"clone read, no probe #$i")(
        q31NoProbe(graft.core.Tables(spark, dir, "documents")))
    }
    // AQE off comparison
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    (1 to 2).foreach { i =>
      time(s"AQE off, gated #$i")(
        q31(graft.core.Tables(spark, dir, "documents")))
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
