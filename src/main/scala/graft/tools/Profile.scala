package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev tool, not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    import graft.partitioning._
    import graft.sources._
    val dir = "/root/testdata/sf0.1"
    val ev = graft.core.Tables(spark, dir, "events")
      .withColumn("lon", (($"event_id" % 3600).cast("double") / 10.0) - 180.0)
      .withColumn("lat", ((($"event_id" * 7) % 1800).cast("double") / 10.0) - 90.0)
      .select($"event_id", $"user_id", $"lon", $"lat")
    val p = LonLatPartitioning(size = (10, 10))
    ev.count() // warm
    time("labels only")(p.addLabels(ev, "lon", "lat").count())
    time("writeBucket")(BucketWriter.writeBucket(ev, "/tmp/prof_bucket", p, mode = "overwrite"))
    time("writeBucket again")(BucketWriter.writeBucket(ev, "/tmp/prof_bucket", p, mode = "overwrite"))
    time("read extent")(BucketReader.read(spark, "/tmp/prof_bucket",
      BucketReader.ByExtent(Extent(-30, 25, -15, 40))).count())
    time("read extent again")(BucketReader.read(spark, "/tmp/prof_bucket",
      BucketReader.ByExtent(Extent(-30, 25, -15, 40))).count())
    val nFiles = java.nio.file.Files.walk(java.nio.file.Paths.get("/tmp/prof_bucket"))
      .filter(f => f.toString.endsWith(".parquet")).count()
    println(s"files: $nFiles")
    val labeled = p.addLabels(ev, "lon", "lat").repartition(col("lon_bin"), col("lat_bin"))
    time("raw partitionBy write")(labeled.write.mode("overwrite")
      .partitionBy("lon_bin", "lat_bin").parquet("/tmp/prof_b2"))
    time("raw write defaults 2nd")(labeled.write.mode("overwrite")
      .partitionBy("lon_bin", "lat_bin").parquet("/tmp/prof_b2"))
    time("flat write (no partitionBy)")(labeled.write.mode("overwrite").parquet("/tmp/prof_b3"))
    val labeled64 = p.addLabels(ev, "lon", "lat").repartition(64, col("lon_bin"), col("lat_bin"))
    time("write 64 tasks")(labeled64.write.mode("overwrite").partitionBy("lon_bin", "lat_bin").parquet("/tmp/prof_b4"))
    time("write 64 tasks 2nd")(labeled64.write.mode("overwrite").partitionBy("lon_bin", "lat_bin").parquet("/tmp/prof_b4"))
    time("write shm")(labeled.write.mode("overwrite").partitionBy("lon_bin", "lat_bin").parquet("/dev/shm/prof_b5"))
    // plan checks: partition pruning + parquet pushdown
    val pruned = BucketReader.read(spark, "/tmp/prof_bucket", BucketReader.ByExtent(Extent(-30, 25, -15, 40)))
    println("=PLAN1=")
    println(pruned.queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("PartitionFilters") || l.contains("PushedFilters") || l.contains("partition")).mkString("\n").take(1200))
    val li2 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").where($"l_shipdate" >= "1996-01-01" && $"l_quantity" < 24).select($"l_extendedprice")
    println("=PLAN2=")
    println(li2.queryExecution.executedPlan.toString.split("\n").filter(l => l.contains("PushedFilters") || l.contains("ReadSchema")).mkString("\n").take(600))
    spark.stop()
  }
}
