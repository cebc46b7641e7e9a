package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiling main (dev tool, not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("count")(docs.count())
    time("norm only")(docs.select(Dedup.normalizedText(col("text")).as("t"))
      .agg(sum(length(col("t")))).count())
    time("shingles size")(docs.select(size(Dedup.shingles(col("text"), 8)).as("n"))
      .agg(sum(col("n"))).count())
    time("shingles size 2nd")(docs.select(size(Dedup.shingles(col("text"), 8)).as("n"))
      .agg(sum(col("n"))).count())
    time("explode count")(docs.select(explode(Dedup.shingles(col("text"), 8)).as("s")).count())
    time("explode+md5")(docs.select(explode(Dedup.shingles(col("text"), 8)).as("s"))
      .select(md5(col("s")).as("h")).agg(max(col("h"))).count())
    time("hash pair")(docs.select(explode(Dedup.shingles(col("text"), 8)).as("s"))
      .select(Dedup.shingleHashPair(col("s"))._1.as("h1"),
        Dedup.shingleHashPair(col("s"))._2.as("h2"))
      .agg(max(col("h1") + col("h2"))).count())
    time("full signature")(Dedup.minHashSignature(docs, "text", "doc_id", 8, 8).count())
    println("partitions: " + docs.rdd.getNumPartitions)
    val docs16 = docs.repartition(16)
    time("explode repart16")(docs16.select(explode(Dedup.shingles(col("text"), 8)).as("s")).count())
    time("signature repart16")(Dedup.minHashSignature(docs16, "text", "doc_id", 8, 8).count())
    // q20 anatomy
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    time("li count")(li.count())
    val p20 = graft.partitioning.XYPartitioning(size = (0.02, 0.02), extent = graft.partitioning.Extent(0, 0.1, 0, 0.1))
    time("q20 addLabels+agg")(p20.addLabels(li, "l_discount", "l_tax").groupBy(col("xbin"), col("ybin")).agg(count(lit(1))).count())
    time("q20 again")(p20.addLabels(li, "l_discount", "l_tax").groupBy(col("xbin"), col("ybin")).agg(count(lit(1))).count())
    time("q20 repart")(p20.addLabels(li.repartition(16), "l_discount", "l_tax").groupBy(col("xbin"), col("ybin")).agg(count(lit(1))).count())
    import graft.partitioning.Binning
    time("idx only")(li.select(Binning.binIndex(col("l_discount"), 0, 0.1, 0.02, 5).as("i")).agg(max(col("i"))).count())
    time("idx+centroid")(li.select(Binning.centroidOfIndex(Binning.binIndex(col("l_discount"), 0, 0.1, 0.02, 5), 0, 0.1, 0.02, 5).as("c")).agg(max(col("c"))).count())
    val idxed = li.withColumn("__xi", Binning.binIndex(col("l_discount"), 0, 0.1, 0.02, 5))
    time("staged centroid")(idxed.select(Binning.centroidOfIndex(col("__xi"), 0, 0.1, 0.02, 5).as("c")).agg(max(col("c"))).count())
    val cent = idxed.withColumn("__c", Binning.centroidOfIndex(col("__xi"), 0, 0.1, 0.02, 5))
    time("cast string")(cent.select(col("__c").cast("string").as("s")).agg(max(col("s"))).count())
    time("groupBy strings")(cent.select(col("__c").cast("string").as("s")).groupBy(col("s")).count().count())
    time("groupBy double")(cent.groupBy(col("__c")).count().count())
    time("addLabels only")(p20.addLabels(li, "l_discount", "l_tax").select(col("xbin")).agg(max(col("xbin"))).count())
    val lab = p20.addLabels(li, "l_discount", "l_tax")
    time("addLabels count")(lab.count())
    val noFilter = {
      val staged = li.withColumn("__xi", Binning.binIndex(col("l_discount"), 0, 0.1, 0.02, 5)).withColumn("__yi", Binning.binIndex(col("l_tax"), 0, 0.1, 0.02, 5))
      p20.labelsByIndices(col("__xi"), col("__yi")).foldLeft(staged){case (d,(n,c)) => d.withColumn(n,c)}.drop("__xi","__yi")
    }
    time("labels noFilter agg")(noFilter.groupBy(col("xbin"), col("ybin")).agg(count(lit(1))).count())
    lab.explain("formatted")
    spark.stop()
  }
}
