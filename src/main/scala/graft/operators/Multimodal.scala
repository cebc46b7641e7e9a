package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling.
  *
  * Media payloads are opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as batched partition-local
  * transforms (`mapPartitions` over an iterator — the Scala analogue of
  * `mapInPandas` batches). The Spark-side plumbing (schema, partitioning,
  * batch shape) is real and tested; the actual codec is STUBBED behind
  * [[MediaDecoder]] because no image/audio libraries ship in this
  * environment — swap in a real decoder (e.g. TwelveMonkeys/JavaCV) by
  * implementing the trait.
  */
object Multimodal {

  /** Typed media-asset schema: one row per asset. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("content_md5", StringType, nullable = true)
    )), nullable = false)))

  /** Decoded-frame features produced per asset. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** The codec seam. `decode` returns (width, height, nFrames, grayPixels)
    * for the sampled frame. */
  trait MediaDecoder extends Serializable {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int, Array[Byte])
  }

  /** STUB decoder: deterministic fake — "dimensions" derived from payload
    * length, "pixels" are the payload bytes themselves. Real Spark
    * plumbing, fake codec (see class doc). */
  object StubDecoder extends MediaDecoder {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
      val n = payload.length
      val w = math.max(1, math.min(64, n))
      val h = math.max(1, n / w)
      val frames = if (mediaType == "video") math.max(1, n / 1024) else 1
      (w, h, frames, payload)
    }
  }

  /** Wrap raw binary rows into the typed asset table. */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String,
               mediaType: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        col(sourceCol).cast("string").as("source"),
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
        md5(col(payloadCol).cast("binary")).as("content_md5")).as("meta"))

  /** Batched decode + feature extraction: 16-bin byte histogram of the
    * sampled frame, L1-normalized — a stand-in embedding with the real
    * batch shape (partition-iterator, one output row per asset). */
  def extractFeatures(spark: SparkSession, assets: DataFrame,
                      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    assets.select("asset_id", "media_type", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.get(2)).map(_.asInstanceOf[Array[Byte]])
          .getOrElse(Array.emptyByteArray)
        val (w, h, nf, pixels) = decoder.decode(r.getString(1), payload)
        val hist = new Array[Float](16)
        pixels.foreach(b => hist((b & 0xff) / 16) += 1f)
        val total = math.max(1f, pixels.length.toFloat)
        Row(id, w, h, nf, hist.map(_ / total).toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video assets: every `stride`-th frame index up to
    * nFrames (plan-level; the stub decoder returns one frame). */
  def sampleFrameIndices(features: DataFrame, stride: Int): DataFrame =
    features.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
        lit(stride))))
}
