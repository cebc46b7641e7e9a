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
  * batch shape) is real and tested; IMAGE decode is REAL
  * ([[ImageIoDecoder]], JDK `javax.imageio` — PNG/BMP/GIF/JPEG), AUDIO
  * decode is REAL ([[JdkMediaDecoder]], JDK `javax.sound.sampled` —
  * WAV/AIFF/AU PCM), and VIDEO decode is REAL for multi-frame animated
  * GIF ([[JdkMediaDecoder]]/[[JdkFrameDecoder]], `javax.imageio`'s GIF
  * reader enumerates frames) and for RIFF/AVI containers carrying
  * raw-DIB or MJPEG streams ([[Avi]] — container sniffed per payload by
  * [[decodeVideoFrames]]). Codecs outside the JDK (MP4/H.264 etc.) still
  * need an external decoder (e.g. JavaCV) behind the same
  * [[MediaDecoder]]/[[FrameDecoder]] seams.
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

  /** REAL image decoder on the JDK's built-in codecs (PNG/BMP/GIF/JPEG via
    * `javax.imageio` — no external deps, headless-safe). Pixels come back
    * as integer-luma grayscale (ITU-R 601 weights in exact integer
    * arithmetic, so results are bit-deterministic across JVMs). Audio and
    * video still go through [[StubDecoder]] — those codecs aren't in the
    * JDK; swap the seam when a media library is available. */
  object ImageIoDecoder extends MediaDecoder {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int, Array[Byte]) =
      mediaType match {
        case "image" =>
          // MemoryCacheImageInputStream, NOT ImageIO.read(InputStream):
          // the latter honors ImageIO.getUseCache (default true) and spools
          // every decode through a temp FILE in java.io.tmpdir — per-image
          // disk I/O that collapses under /tmp pressure and is pure waste
          // when the payload is already an in-memory byte array.
          val img = javax.imageio.ImageIO.read(
            new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(payload)))
          require(img != null, "payload is not a decodable image")
          val w = img.getWidth; val h = img.getHeight
          val px = new Array[Byte](w * h)
          var i = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              px(i) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
              i += 1; x += 1
            }
            y += 1
          }
          (w, h, 1, px)
        case other => StubDecoder.decode(other, payload)
      }
  }

  /** REAL decoders for every JDK-supported format: images via
    * `javax.imageio` ([[ImageIoDecoder]]), WAV/AIFF/AU audio via
    * `javax.sound.sampled`, and animated-GIF video via
    * [[decodeGifFrames]] — all in the JDK, no external deps. Audio maps
    * onto the (width, height, nFrames, bytes) contract as
    * (sampleRate, channels, frameCount, first-channel samples as unsigned
    * 8-bit) — 8-bit unsigned PCM passes through untouched; 16-bit signed
    * PCM keeps the high byte shifted to unsigned. Video returns frame 0's
    * pixels with the full frame count. Only non-JDK container codecs
    * (MP4/H.264 etc.) still throw — swap the seam with e.g. JavaCV. */
  object JdkMediaDecoder extends MediaDecoder {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Int, Array[Byte]) =
      mediaType match {
        case "audio" if Avi.isAvi(payload) =>
          // PCM audio stream of an (interleaved) AVI container — same
          // output contract as the WAV path below
          Avi.decodeAviAudio(payload)
        case "audio" =>
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          try {
            val fmt = in.getFormat
            val frameBytes = fmt.getFrameSize
            val bits = fmt.getSampleSizeInBits
            // explicit reject (like pyarrow) instead of silent corruption:
            // the byte-extraction below is only correct for 8/16-bit
            // integer PCM with a known frame size — a 24-bit or float WAV
            // would otherwise decode to garbage histograms with no error
            require(bits == 8 || bits == 16,
              s"unsupported audio sample size $bits bits (8/16-bit PCM only)")
            require(frameBytes > 0, "audio format has unspecified frame size")
            require(fmt.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
              s"unsupported audio encoding ${fmt.getEncoding} (integer PCM only)")
            val raw = in.readAllBytes()
            val nFrames = raw.length / frameBytes
            val samples = new Array[Byte](nFrames)
            var f = 0
            while (f < nFrames) {
              val base = f * frameBytes // first channel of the frame
              samples(f) =
                if (bits == 8) {
                  if (fmt.getEncoding ==
                      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
                    (raw(base) + 128).toByte
                  else raw(base)
                } else { // 16-bit PCM: unsigned high byte
                  val hi = if (fmt.isBigEndian) raw(base) else raw(base + 1)
                  (hi + 128).toByte
                }
              f += 1
            }
            (fmt.getSampleRate.toInt, fmt.getChannels, nFrames, samples)
          } finally in.close()
        case "video" =>
          val (w, h, frames) = decodeVideoFrames(payload)
          (w, h, frames.length, frames.headOption.getOrElse(Array.emptyByteArray))
        case other => ImageIoDecoder.decode(other, payload)
      }
  }

  /** Container-sniffing video decode: RIFF/AVI payloads (raw-DIB or
    * MJPEG streams) go through [[Avi.decodeAviFrames]], anything else is
    * treated as animated GIF. Both return the same (width, height,
    * per-frame grayscale luma) contract. */
  def decodeVideoFrames(payload: Array[Byte]): (Int, Int, Array[Array[Byte]]) =
    if (Avi.isAvi(payload)) Avi.decodeAviFrames(payload)
    else decodeGifFrames(payload)

  /** REAL multi-frame video decode for animated GIF via the JDK's
    * `javax.imageio` GIF reader: returns (width, height, per-frame
    * integer-luma grayscale pixels). Frames written full-size (no
    * inter-frame delta) read back exactly; GIF's LZW coding is lossless.
    * Delta-coded GIFs (frames stored as sub-rectangles to be composited
    * onto the previous canvas) are REJECTED loudly rather than returned as
    * uncomposited fragments with mismatched dimensions — compositing needs
    * IIOMetadata offset/disposal handling this decoder doesn't do.
    * Formats needing non-JDK codecs (MP4 etc.) throw — swap the seam with
    * an external decoder for those. */
  def decodeGifFrames(payload: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    val (w, h, n, sampled) = decodeGifFramesStrided(payload, 1)
    require(n == sampled.length)
    (w, h, sampled.map(_._2))
  }

  /** Strided GIF decode: LZW-decode only every `stride`-th frame
    * (`ImageIO` reads frames on demand, so unrequested frames are never
    * decompressed); frame DIMENSIONS are still checked for every frame
    * from the headers alone, so delta-coded GIFs are rejected even when
    * the offending frame isn't sampled. Returns (width, height, TOTAL
    * frame count, (frameIdx, pixels) for sampled frames). */
  def decodeGifFramesStrided(payload: Array[Byte],
                             stride: Int): (Int, Int, Int, Array[(Int, Array[Byte])]) = {
    require(stride >= 1, "stride must be >= 1")
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    require(readers.hasNext, "no GIF reader available")
    val reader = readers.next()
    // memory-cached stream: createImageInputStream would spool the decode
    // through a temp file in java.io.tmpdir (ImageIO.getUseCache default)
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      require(n > 0, "payload is not a decodable GIF")
      val w0 = reader.getWidth(0); val h0 = reader.getHeight(0)
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      var i = 0
      while (i < n) {
        val w = reader.getWidth(i); val h = reader.getHeight(i)
        require(w == w0 && h == h0,
          s"delta-coded GIF: frame $i is ${w}x$h, frame 0 is ${w0}x$h0 — " +
            "full-canvas frames only (no disposal/offset compositing)")
        if (i % stride == 0) {
          val img = reader.read(i)
          val px = new Array[Byte](w * h)
          var k = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              px(k) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
              k += 1; x += 1
            }
            y += 1
          }
          frames += ((i, px))
        }
        i += 1
      }
      (w0, h0, n, frames.toArray)
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Per-frame decode seam: (width, height, one gray-pixel array per
    * frame). Video fans out to every GIF frame; image is a single frame;
    * audio maps its sample array to one "frame" (width = sample rate,
    * height = channels, as in [[JdkMediaDecoder]]). */
  trait FrameDecoder extends Serializable {
    def decodeFrames(mediaType: String, payload: Array[Byte]): (Int, Int, Array[Array[Byte]])

    /** Stride-aware decode: (width, height, TOTAL frames, (frameIdx,
      * pixels) for every stride-th frame). Default decodes everything
      * and filters; decoders that can skip at the container level
      * (AVI chunk walk, GIF on-demand reads) override so sampling
      * actually skips the decode work — at video scale the decode IS
      * the cost, and sampling that decodes everything only to discard
      * it is sampling in name only. */
    def decodeFramesStrided(mediaType: String, payload: Array[Byte],
                            stride: Int): (Int, Int, Int, Array[(Int, Array[Byte])]) = {
      val (w, h, frames) = decodeFrames(mediaType, payload)
      (w, h, frames.length,
        (0 until frames.length by stride).map(i => (i, frames(i))).toArray)
    }
  }

  /** JDK-only [[FrameDecoder]]: GIF/AVI video frames, single-frame
    * images, single-"frame" audio. Video strides skip unsampled frames
    * at the container level. */
  object JdkFrameDecoder extends FrameDecoder {
    def decodeFrames(mediaType: String, payload: Array[Byte]): (Int, Int, Array[Array[Byte]]) =
      mediaType match {
        case "video" => decodeVideoFrames(payload)
        case other =>
          val (w, h, _, px) = JdkMediaDecoder.decode(other, payload)
          (w, h, Array(px))
      }

    override def decodeFramesStrided(mediaType: String, payload: Array[Byte],
                                     stride: Int): (Int, Int, Int, Array[(Int, Array[Byte])]) =
      mediaType match {
        case "video" if Avi.isAvi(payload) =>
          Avi.decodeAviFramesStrided(payload, stride)
        case "video" => decodeGifFramesStrided(payload, stride)
        case other => super.decodeFramesStrided(other, payload, stride)
      }
  }

  /** Deterministic 8-bit unsigned mono WAV at 8 kHz: sample j is
    * `(id*17 + j*29) mod 256`. PCM is lossless, so a decode through
    * [[JdkMediaDecoder]] returns exactly these bytes — which lets the q59
    * oracle recompute the sample histogram from the closed form without
    * any decoder (same construction as [[syntheticPng]]/q49). */
  def syntheticWav(id: Long, nSamples: Int): Array[Byte] = {
    val data = Array.tabulate(nSamples)(j =>
      java.lang.Math.floorMod(id * 17 + j * 29, 256L).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 8, 1, false /* unsigned */, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic gray PNG: pixel (x, y) has luma
    * `(id*31 + x*7 + y*13) mod 256`, written as an RGB gray triple (so the
    * decoded ITU-R 601 luma reproduces it exactly: (299+587+114)/1000 of
    * equal channels is the identity). PNG is lossless, which is what lets
    * the q49 oracle recompute the histogram from this closed form instead
    * of decoding. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = java.lang.Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    javax.imageio.ImageIO.write(img, "png", ios)
    ios.close() // flushes the memory cache into bos
    bos.toByteArray
  }

  /** Deterministic grayscale animated GIF: frame f's pixel (x, y) has luma
    * `(id*31 + f*41 + x*7 + y*13) mod 256`. Frames are written full-size
    * in TYPE_BYTE_GRAY (the GIF writer keeps the 256-gray palette, LZW is
    * lossless), so a decode through [[decodeGifFrames]] returns exactly
    * these values — which lets the q68 oracle recompute per-frame
    * histograms from the closed form without any decoder (the
    * [[syntheticPng]]/[[syntheticWav]] construction, for video). */
  def syntheticGif(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no GIF writer available")
    val writer = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0,
              java.lang.Math.floorMod(id * 31 + f * 41 + x * 7 + y * 13, 256L).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
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

  /** One row per SAMPLED frame. */
  val frameFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("hist", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Batched multi-frame decode + per-frame feature extraction: every
    * `stride`-th frame of each asset becomes one output row carrying an
    * exact 16-bin integer pixel histogram. Same partition-iterator batch
    * shape as [[extractFeatures]] but fanning out per frame — the video
    * analogue of frame-sampling in a training-data pipeline. */
  def extractFrameFeatures(spark: SparkSession, assets: DataFrame, stride: Int,
                           decoder: FrameDecoder = JdkFrameDecoder): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val enc = org.apache.spark.sql.Encoders.row(frameFeatureSchema)
    assets.select("asset_id", "media_type", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = Option(r.get(2)).map(_.asInstanceOf[Array[Byte]])
          .getOrElse(Array.emptyByteArray)
        // stride goes INTO the decoder: container-skippable formats
        // never decode the unsampled frames (see decodeFramesStrided)
        val (w, h, nFrames, sampled) =
          decoder.decodeFramesStrided(r.getString(1), payload, stride)
        sampled.iterator.map { case (f, px) =>
          val hist = new Array[Long](16)
          px.foreach(b => hist((b & 0xff) / 16) += 1L)
          Row(id, w, h, nFrames, f, hist.toSeq)
        }
      }
    }(enc)
  }

  /** Strided frame decode + per-frame nearest resize + exact histogram:
    * the video preprocessing chain a training pipeline runs before
    * batching frames (sample → decode → resize), with the stride pushed
    * into the decoder so unsampled frames never decode (see
    * [[FrameDecoder.decodeFramesStrided]]) and [[resizeNearest]]'s
    * integer index map keeping the result closed-form/oracle-exact. One
    * row per sampled frame: (asset_id, width, height, n_frames,
    * frame_idx, out_w, out_h, 16-bin histogram of resized pixels). */
  def extractResizedFrameFeatures(spark: SparkSession, assets: DataFrame,
                                  stride: Int, outW: Int, outH: Int,
                                  decoder: FrameDecoder = JdkFrameDecoder): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    require(outW >= 1 && outH >= 1, "output dims must be >= 1")
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("out_w", IntegerType, nullable = false),
      StructField("out_h", IntegerType, nullable = false),
      StructField("hist", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select("asset_id", "media_type", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = Option(r.get(2)).map(_.asInstanceOf[Array[Byte]])
          .getOrElse(Array.emptyByteArray)
        val (w, h, nFrames, sampled) =
          decoder.decodeFramesStrided(r.getString(1), payload, stride)
        sampled.iterator.map { case (f, px) =>
          val resized = resizeNearest(px, w, h, outW, outH)
          val hist = new Array[Long](16)
          resized.foreach(b => hist((b & 0xff) / 16) += 1L)
          Row(id, w, h, nFrames, f, outW, outH, hist.toSeq)
        }
      }
    }(enc)
  }

  /** Frame sampling for video assets: every `stride`-th frame index up to
    * nFrames (plan-level; the stub decoder returns one frame). */
  def sampleFrameIndices(features: DataFrame, stride: Int): DataFrame =
    features.withColumn("frame_idx",
      explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
        lit(stride))))

  /** Nearest-neighbor resample of a row-major grayscale byte image:
    * out(x, y) = in(⌊x·w/outW⌋, ⌊y·h/outH⌋). Integer arithmetic only —
    * deterministic, oracle-transcribable, and the resize every training
    * pipeline applies before batching images (bilinear would trade
    * determinism for quality; the seam accepts either). */
  def resizeNearest(pixels: Array[Byte], w: Int, h: Int,
                    outW: Int, outH: Int): Array[Byte] = {
    require(w >= 1 && h >= 1 && outW >= 1 && outH >= 1, "dims must be >= 1")
    val out = new Array[Byte](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * h / outH).toInt
      var x = 0
      while (x < outW) {
        out(y * outW + x) = pixels(sy * w + (x.toLong * w / outW).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Schema of [[extractResizedFeatures]] rows. */
  val resizedFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("out_width", IntegerType, nullable = false),
    StructField("out_height", IntegerType, nullable = false),
    StructField("hist", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Decode → nearest-neighbor resize to (outW × outH) → exact 16-bin
    * integer pixel histogram of the RESIZED image. Same partition-iterator
    * batch shape as [[extractFeatures]]; the decode+resize pipeline of an
    * image-pretraining data loader, minus the learned transform. */
  def extractResizedFeatures(spark: SparkSession, assets: DataFrame,
                             outW: Int, outH: Int,
                             decoder: MediaDecoder = StubDecoder): DataFrame = {
    require(outW >= 1 && outH >= 1, "output dims must be >= 1")
    val enc = org.apache.spark.sql.Encoders.row(resizedFeatureSchema)
    assets.select("asset_id", "media_type", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.get(2)).map(_.asInstanceOf[Array[Byte]])
          .getOrElse(Array.emptyByteArray)
        val (w, h, _, pixels) = decoder.decode(r.getString(1), payload)
        // loud guard (like decodeGifFrames' delta-frame rejection): a
        // decoder whose payload is not a w×h raster — e.g. audio routed
        // here by mistake — must fail cleanly, not index out of bounds
        require(pixels.isEmpty || pixels.length == w * h,
          s"asset $id: decoded payload length ${pixels.length} is not width*height ($w*$h) — not a resizable raster")
        val resized =
          if (pixels.isEmpty) Array.emptyByteArray
          else resizeNearest(pixels, w, h, outW, outH)
        val hist = new Array[Long](16)
        resized.foreach(b => hist((b & 0xff) / 16) += 1L)
        Row(id, w, h, outW, outH, hist.toSeq)
      }
    }(enc)
  }

  // ------------------------------------------------ spectral features

  /** Quantized trig table for [[audioSpectrum]]: round(cos/sin(2π·k·n/N)
    * · 1024) for each analysis bin k and sample index n. Computed ONCE
    * on the driver and shipped both into the executor closure and into
    * the oracle SQL as literals, so the spectrum is exact integer math
    * end to end — no libm in the distributed path. */
  def spectrumTable(freqs: Seq[Int], n: Int): Seq[(Int, Int, Long, Long)] =
    for (k <- freqs; j <- 0 until n) yield {
      val ang = 2.0 * math.Pi * k * j / n
      (k, j, math.round(math.cos(ang) * 1024), math.round(math.sin(ang) * 1024))
    }

  val spectrumSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("k", IntegerType, nullable = false),
    StructField("re", LongType, nullable = false),
    StructField("im", LongType, nullable = false),
    StructField("energy", LongType, nullable = false)))

  /** Per-asset DFT power at the requested frequency bins, over the first
    * `n` decoded samples: re_k = Σ s(j)·cosTab(k,j), im_k = Σ
    * s(j)·sinTab(k,j), energy = re² + im² — the audio feature-extraction
    * step (tone/energy fingerprints) with EXACT integer arithmetic on
    * the quantized table, so an oracle replays it from the closed-form
    * fixture. Row-local compute after the decode seam; one output row
    * per (asset, bin). */
  def audioSpectrum(spark: SparkSession, assets: DataFrame,
                    freqs: Seq[Int], n: Int,
                    decoder: MediaDecoder = JdkMediaDecoder): DataFrame = {
    require(freqs.nonEmpty && n >= 1, "need at least one bin and one sample")
    val table = spectrumTable(freqs, n)
    val cosT = freqs.map(k => k -> table.collect {
      case (`k`, j, c, _) => (j, c) }.sortBy(_._1).map(_._2).toArray).toMap
    val sinT = freqs.map(k => k -> table.collect {
      case (`k`, j, _, s) => (j, s) }.sortBy(_._1).map(_._2).toArray).toMap
    val enc = org.apache.spark.sql.Encoders.row(spectrumSchema)
    assets.select("asset_id", "media_type", "payload").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = Option(r.get(2)).map(_.asInstanceOf[Array[Byte]])
          .getOrElse(Array.emptyByteArray)
        val (_, _, _, samples) = decoder.decode(r.getString(1), payload)
        require(samples.length >= n,
          s"asset $id: need $n samples, decoded ${samples.length}")
        freqs.map { k =>
          val ct = cosT(k); val st = sinT(k)
          var re = 0L; var im = 0L
          var j = 0
          while (j < n) {
            val v = (samples(j) & 0xff).toLong
            re += v * ct(j); im += v * st(j)
            j += 1
          }
          Row(id, k, re, im, re * re + im * im)
        }
      }
    }(enc)
  }

  // ------------------------------------------------- perceptual hashing

  /** Deterministic gray PNG with an explicit NEAR-DUP group structure for
    * perceptual-hash gates: the base pattern depends only on `id mod 17`
    * (so group members are pixel-identical), plus two closed-form
    * perturbations — a wide +40 column band on `id mod 5 = 0` (many-bit
    * dHash difference: a clear non-dup) and a +60 corner patch on
    * `id mod 3 = 0` (one-to-few-bit difference: a true near-dup). All
    * values stay in [0, 209] ⊂ [0, 255]; like [[syntheticPng]] the
    * closed form lets an oracle recompute every pixel without a decoder. */
  def syntheticPngGrouped(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val grp = java.lang.Math.floorMod(id, 17L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = java.lang.Math.floorMod(grp * 37 + x * 11 + y * 23, 150L).toInt
        if (id % 5 == 0 && (x == 4 || x == 5)) v += 40
        if (id % 3 == 0 && (x == 6 || x == 7) && y < 2) v += 60
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    javax.imageio.ImageIO.write(img, "png", ios)
    ios.close()
    bos.toByteArray
  }

  val dHashSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("b0", LongType, nullable = false),
    StructField("b1", LongType, nullable = false),
    StructField("b2", LongType, nullable = false),
    StructField("b3", LongType, nullable = false)))

  /** Difference-hash (dHash) of each decoded image, emitted as FOUR
    * 16-bit band integers (b0..b3) rather than one 64-bit word — the
    * band split is exactly what LSH-style near-dup joins key on
    * (pigeonhole: hamming distance ≤ 3 ⇒ at least one of 4 bands equal),
    * and it sidesteps signed-overflow portability at bit 63.
    *
    * Pipeline per image (all exact integer math, so replayable in SQL
    * from a closed-form fixture): 2×2 block means (floor of the 4-pixel
    * sum / 4) downsample w×h → (w/2)×(h/2); bit(r, c) = 1 iff
    * block(r, c+1) > block(r, c); bit index r·(w/2−1)+c; band k =
    * bits [16k, 16k+16). Requires even dims with (h/2)·(w/2−1) = 64 —
    * the classic 9×8 dHash grid (e.g. 18×16 inputs). */
  def imageDHash(spark: SparkSession, assets: DataFrame,
                 decoder: MediaDecoder = ImageIoDecoder): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(dHashSchema)
    assets.select("asset_id", "media_type", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.get(2)).map(_.asInstanceOf[Array[Byte]])
          .getOrElse(Array.emptyByteArray)
        val (w, h, _, pixels) = decoder.decode(r.getString(1), payload)
        require(w % 2 == 0 && h % 2 == 0 && (h / 2) * (w / 2 - 1) == 64,
          s"asset $id: dHash needs even dims with an (h/2)x(w/2-1) = 64-bit grid, got ${w}x$h")
        require(pixels.length == w * h,
          s"asset $id: decoded payload is not a ${w}x$h raster")
        val bw = w / 2; val bh = h / 2
        val blocks = new Array[Int](bw * bh)
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            val x0 = bx * 2; val y0 = by * 2
            val s = (pixels(y0 * w + x0) & 0xff) + (pixels(y0 * w + x0 + 1) & 0xff) +
              (pixels((y0 + 1) * w + x0) & 0xff) + (pixels((y0 + 1) * w + x0 + 1) & 0xff)
            blocks(by * bw + bx) = s / 4
            bx += 1
          }
          by += 1
        }
        val bands = new Array[Long](4)
        var rr = 0
        while (rr < bh) {
          var c = 0
          while (c < bw - 1) {
            if (blocks(rr * bw + c + 1) > blocks(rr * bw + c)) {
              val idx = rr * (bw - 1) + c
              bands(idx / 16) |= 1L << (idx % 16)
            }
            c += 1
          }
          rr += 1
        }
        Row(id, bands(0), bands(1), bands(2), bands(3))
      }
    }(enc)
  }

  /** Near-duplicate image pairs from banded dHashes: candidates via the
    * pigeonhole band join (4 shuffle-equality joins, one per band — no
    * all-pairs product), verified with the exact hamming distance
    * (bit_count of per-band XOR). `maxDist` ≤ 3 keeps the pigeonhole
    * guarantee exact (d ≤ 3 over 4 bands ⇒ some band untouched), so the
    * candidate stage loses nothing. */
  def dHashNearDupPairs(hashes: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      "maxDist must be in [0,3] for the 4-band pigeonhole to be exact")
    val a = hashes.select(col("asset_id").as("id_a"),
      col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val b = hashes.select(col("asset_id").as("id_b"),
      col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    val cands = (0 until 4).map { k =>
      a.join(b, col("id_a") < col("id_b") && col(s"a$k") === col(s"c$k"))
    }.reduce(_ unionByName _).distinct()
    val dist = (0 until 4).map(k =>
      call_function("bit_count", col(s"a$k").bitwiseXOR(col(s"c$k"))).cast("long"))
      .reduce(_ + _)
    cands.withColumn("dist", dist)
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
