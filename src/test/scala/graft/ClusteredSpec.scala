package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Clustered

/** Hash-clustered tables: the co-located join must be exchange-free and
  * correct. */
class ClusteredSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("co-located join of same-bucket-count tables has no Exchange and matches plain join") {
    val base = java.nio.file.Files.createTempDirectory("graft_clustered").toString
    val left = spark.range(10000).toDF("k")
      .withColumn("lv", ($"k" * 7) % 100)
    val right = spark.range(0, 10000, 3).toDF("k")
      .withColumn("rv", ($"k" * 13) % 100)
    Clustered.writeClustered(left, "cs_left", s"$base/l", Seq("k"), nBuckets = 8)
    Clustered.writeClustered(right, "cs_right", s"$base/r", Seq("k"), nBuckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a real distributed join shape (no broadcast, no AQE rewrite)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = Clustered.coLocatedJoin(spark, "cs_left", "cs_right", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected exchange-free co-located join, got:\n$plan")

      val got = joined.agg(count(lit(1)), sum($"lv" + $"rv").cast("long"))
        .head()
      val exp = left.join(right, Seq("k"))
        .agg(count(lit(1)), sum($"lv" + $"rv").cast("long")).head()
      assert(got == exp)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS cs_left")
      spark.sql("DROP TABLE IF EXISTS cs_right")
    }
  }

  test("writeClustered: the writer claim serializes concurrent rewrites " +
       "and survives the overwrite (it lives BESIDE the table path)") {
    import graft.sources.{BucketFs, GenerationLock}
    val base = java.nio.file.Files.createTempDirectory("graft_clustered_cc").toString
    val path = s"$base/t"
    try {
      val df = spark.range(1000).toDF("k").withColumn("v", $"k" % 7)
      Clustered.writeClustered(df, "cs_cc", path, Seq("k"), nBuckets = 4)
      // the claim is a SIBLING of the path: a fresh overwrite of the path
      // must not have deleted it mid-write (it is released, so absent now)
      val claimFile = s"${path}__writer_claim"
      assert(!BucketFs.exists(claimFile), "claim not released after write")
      // a LIVE claim held by another writer refuses this session loudly
      // and leaves the committed table untouched
      BucketFs.writeString(claimFile, "")
      val e = intercept[IllegalStateException](
        Clustered.writeClustered(df.limit(10), "cs_cc", path,
          Seq("k"), nBuckets = 4))
      assert(e.getMessage.contains("another session is writing"))
      assert(spark.table("cs_cc").count() == 1000,
        "refused writer disturbed the committed table")
      // a STALE claim (dead writer) is swept and the rewrite proceeds
      Clustered.writeClustered(df.limit(10), "cs_cc", path, Seq("k"),
        nBuckets = 4, claimStaleness = 0L)
      assert(spark.table("cs_cc").count() == 10)
      assert(!BucketFs.exists(claimFile))
      // claimBeside's layout really is outside the wiped path: a claim
      // taken now still verifies after an overwrite wipes the path dir
      val c = GenerationLock.claimBeside(path)
      BucketFs.deleteRecursive(path)
      GenerationLock.verify(c)
      GenerationLock.release(c)
    } finally {
      spark.sql("DROP TABLE IF EXISTS cs_cc")
      BucketFs.deleteRecursive(base)
    }
  }

  test("grouping on the cluster key aggregates without an exchange") {
    val base = java.nio.file.Files.createTempDirectory("graft_clustered_agg").toString
    Clustered.writeClustered(
      spark.range(5000).toDF("k").withColumn("v", $"k" % 97),
      "cs_agg", s"$base/t", Seq("k"), nBuckets = 4)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val agg = spark.table("cs_agg").groupBy("k").agg(sum("v"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected exchange-free aggregation on cluster key, got:\n$plan")
      assert(agg.count() == 5000)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS cs_agg")
    }
  }
}
