package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import graft.partitioning.Partitioning2D

/** Structured Streaming extensions (SURVEY §2.9: the reference is batch-only;
  * these are the streaming analogues of its two incremental patterns —
  * gap sessionization (W1-W4 ≡ session_window) and incremental bucket
  * append (T8 ≡ file-sink partitioned append with checkpointing)).
  */
object StreamingOps {

  /** Streaming gap sessionization: session_window over event time with a
    * watermark — the exact streaming analogue of the batch overpass
    * detection (satbucket/analysis.py:41-94). Returns (keys…, session
    * start/end, n_events) in append mode once the watermark closes a
    * session. */
  def sessionize(events: DataFrame, gap: String = "60 minutes",
                 watermark: String = "2 hours",
                 time: String = "time",
                 keyCols: Seq[String] = Nil): DataFrame = {
    val keyed = events.withWatermark(time, watermark)
    val groupCols = session_window(col(time), gap).as("session") +:
      keyCols.map(col)
    keyed.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(time)).as("first_event"),
        max(col(time)).as("last_event"))
      .select((keyCols.map(col) :+ col("session.start").as("session_start") :+
        col("session.end").as("session_end") :+ col("n_events") :+
        col("first_event") :+ col("last_event")): _*)
  }

  /** Streaming tumbling-window rollup with watermark (W8 analogue). */
  def windowedRollup(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours", time: String = "time",
                     keyCols: Seq[String] = Nil): DataFrame = {
    events.withWatermark(time, watermark)
      .groupBy((window(col(time), window_).as("w") +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n"))
      .select((keyCols.map(col) :+ col("w.start").as("window_start") :+
        col("n")): _*)
  }

  /** Continuous bucket ingest: stream granule rows (file source) into a
    * spatially partitioned bucket — the streaming version of
    * write_granules_bucket: same layout, exactly-once via checkpoint.
    * Caller starts/stops the returned writer. */
  def bucketIngest(spark: SparkSession, sourceDir: String,
                   schema: org.apache.spark.sql.types.StructType,
                   bucketDir: String, p: Partitioning2D,
                   checkpointDir: String,
                   x: String = "lon", y: String = "lat"): DataStreamWriter[Row] = {
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val staged = stream.where(p.validCoords(col(x), col(y)))
      .withColumn("__xi", p.xIndexCol(col(x)))
      .withColumn("__yi", p.yIndexCol(col(y)))
    val labeled = p.labelsByIndices(col("__xi"), col("__yi"))
      .foldLeft(staged) { case (d, (n, c)) => d.withColumn(n, c) }
      .drop("__xi", "__yi")
    labeled.writeStream
      .format("parquet")
      .option("path", bucketDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy(p.order: _*)
      .trigger(Trigger.AvailableNow())
  }
}
