package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.Tables
import graft.streaming.StreamingOps

/** Driver-gate coverage for the Structured Streaming surface (SURVEY §2.9).
  *
  * q48 runs a REAL streaming query — file source → watermark →
  * session_window aggregation → append-mode parquet sink with
  * checkpointing — end-to-end under Trigger.AvailableNow, then returns the
  * sink contents for the oracle hash-compare. Determinism is engineered,
  * not hoped for:
  *
  *  - the staged input is split into micro-batches with
  *    `maxFilesPerTrigger=1` and explicit file mtimes (FileStreamSource
  *    batches in mtime order);
  *  - two sentinel events far past the real data ride in their own
  *    batches: the first advances the watermark beyond every real session,
  *    the second gives the engine a batch in which that watermark emits
  *    them (append mode emits on state cleanup at batch start, so relying
  *    on a trailing no-data batch would be fragile);
  *  - sentinels are filtered from the output (negative user_id).
  *
  * session_window semantics vs the batch q06: events merge when
  * t2 - t1 < gap (window end is exclusive), so the oracle's session break
  * is `>= gap` where q06's lag-based break is `> gap` — mirrored exactly.
  */
object StreamingQueries extends QueryModule {

  private val GapUs = 1800000000L // 30 minutes, like q06

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      // v-token: bump when the staged-input shape changes — /tmp outlives
      // code revisions and the marker would otherwise bless a stale cache
      val base = s"/tmp/graft_stream_v1_${dir.hashCode.toHexString}"
      val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
      // the streaming run itself must be fresh every invocation (a reused
      // checkpoint would no-op the stream, an old sink would double-count);
      // the staged INPUT is deterministic, so it is built once and reused
      // (marker-gated) across bench repetitions
      graft.sources.BucketFs.deleteRecursive(outDir)
      graft.sources.BucketFs.deleteRecursive(ckpt)

      val ev = Tables(s, dir, "events").select($"user_id", $"ts")
      val marker = s"$inDir/_staged_ok"
      if (!graft.sources.BucketFs.exists(marker)) {
        graft.sources.BucketFs.deleteRecursive(inDir)
        ev.coalesce(1).write.parquet(inDir)
        val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
        def sentinel(days: Int): Unit =
          Seq((-1L, new java.sql.Timestamp(maxTs.getTime + days.toLong * 86400000L)))
            .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(inDir)
        sentinel(200)
        sentinel(201)
        // deterministic batch order: one file per micro-batch, mtime-spaced
        val files = new java.io.File(inDir).listFiles()
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
          .sortBy(_.lastModified())
        files.zipWithIndex.foreach { case (f, i) =>
          f.setLastModified(((files.head.lastModified() / 60000L) * 60000L) + i * 60000L)
        }
        graft.sources.BucketFs.writeString(marker, "ok\n")
      }

      // dedicated session with few shuffle partitions: the session-window
      // state store instantiates one instance per shuffle partition per
      // micro-batch, which at 32 partitions is pure overhead for this
      // volume (the batch queries keep the session default)
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val stream = ss.readStream.schema(ev.select($"user_id", $"ts").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
      val sess = StreamingOps.sessionize(stream, gap = "30 minutes",
        watermark = "1 minute", time = "ts", keyCols = Seq("user_id"))
      val q = sess.writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      s.read.parquet(outDir)
        .where($"user_id" >= 0)
        .select($"user_id",
          unix_micros($"session_start").as("start_us"),
          unix_micros($"session_end").as("end_us"),
          $"n_events")
    })
  )

  def oracle: Map[String, String] = Map(
    "q48_stream_sessionize" -> s"""
      WITH t AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
          lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        FROM events),
      m AS (
        SELECT user_id, ts_us,
          CAST(SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us >= $GapUs
                        THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts_us
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS sid
        FROM t)
      SELECT user_id,
        MIN(ts_us) AS start_us,
        MAX(ts_us) + $GapUs AS end_us,
        COUNT(*) AS n_events
      FROM m GROUP BY user_id, sid""")
}
