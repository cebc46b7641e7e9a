package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.partitioning.LonLatPartitioning
import graft.sources.{BucketInfo, BucketReader}
import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def tmp(n: String) = {
    val p = Files.createTempDirectory(s"graft_stream_$n"); p.toFile.deleteOnExit(); p.toString
  }

  test("streaming sessionization with session_window + watermark") {
    val src = tmp("events")
    Seq(
      (1L, ts("2021-01-01 00:00:00")), (1L, ts("2021-01-01 00:10:00")),
      (1L, ts("2021-01-01 03:00:00")), (2L, ts("2021-01-01 00:05:00"))
    ).toDF("user_id", "time").write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema("user_id LONG, time TIMESTAMP").parquet(src)
    val sessions = StreamingOps.sessionize(stream, gap = "60 minutes",
      keyCols = Seq("user_id"))
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sess")
        .select($"user_id", $"n_events", $"first_event")
        .as[(Long, Long, Timestamp)].collect().toSet
      assert(got == Set(
        (1L, 2L, ts("2021-01-01 00:00:00")),
        (1L, 1L, ts("2021-01-01 03:00:00")),
        (2L, 1L, ts("2021-01-01 00:05:00"))))
    } finally q.stop()
  }

  test("streaming bucket ingest: file source → partitioned bucket") {
    val src = tmp("granules")
    val bucket = tmp("bucket")
    val ckpt = tmp("ckpt")
    val p = LonLatPartitioning(size = (10, 10))
    OrbitFixture.standard(spark).write.mode("overwrite").parquet(src)
    val schema = spark.read.parquet(src).schema

    val writer = StreamingOps.bucketIngest(spark, src, schema, bucket, p, ckpt)
    val q = writer.start()
    try q.awaitTermination(60000) finally if (q.isActive) q.stop()
    BucketInfo.write(bucket, p) // manifest (stream sink writes only data)

    val back = BucketReader.read(spark, bucket)
    assert(back.count() == 150)
    assert(back.columns.contains("lon_bin"))
  }
}
