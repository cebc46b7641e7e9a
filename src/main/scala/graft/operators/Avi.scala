package graft.operators

/** Minimal RIFF/AVI video container codec — pure JVM, no external codec
  * libraries. Closes the "video is GIF-only" gap in [[Multimodal]]: real
  * AVI files carrying either uncompressed DIB frames (`BI_RGB`, 8-bit
  * paletted or 24-bit BGR — the classic "raw video" flavor) or MJPEG
  * frames (one baseline JPEG per chunk, decoded with the JDK's
  * `javax.imageio` JPEG reader) parse into the same (width, height,
  * per-frame grayscale luma) contract as [[Multimodal.decodeGifFrames]].
  * Anything needing a non-JDK codec (H.264, VP9, ...) is rejected loudly
  * with the compression fourcc in the message — same honest-failure
  * policy as the rest of the media seam (swap in e.g. JavaCV there).
  *
  * Container support (reference treats media as opaque binary payloads;
  * this engine's decode stage is the extension the training-data pipeline
  * needs — see `satbucket/readers.py:101-159` for the reference's
  * format-agnostic ingest posture):
  *  - chunked `movi` payloads, both bare `##db`/`##dc` frame chunks and
  *    frames wrapped in interleaved `LIST rec ` groups;
  *  - bottom-up (positive biHeight) and top-down (negative) DIBs;
  *  - 8-bit DIBs with arbitrary palettes (luma through the palette, so an
  *    identity grayscale palette round-trips pixel values exactly);
  *  - the `idx1` index chunk is tolerated and ignored (frames are read
  *    in stream order, which the AVI spec requires to match).
  *
  * The synthetic writers emit spec-conformant files (hdrl with avih +
  * strh/strf, movi, idx1) whose DIB pixel values have a closed form —
  * lossless raw frames mean a decode returns exactly those values, so an
  * oracle can recompute frame histograms without any decoder (the
  * q49/q59/q68 construction, for a second real video container).
  */
object Avi {

  private val FccRiff = 0x46464952 // "RIFF" little-endian
  private val FccAvi = 0x20495641 // "AVI "
  private val FccList = 0x5453494c // "LIST"
  private val FccHdrl = 0x6c726468 // "hdrl"
  private val FccStrl = 0x6c727473 // "strl"
  private val FccStrh = 0x68727473 // "strh"
  private val FccStrf = 0x66727473 // "strf"
  private val FccVids = 0x73646976 // "vids"
  private val FccAuds = 0x73647561 // "auds"
  private val FccMovi = 0x69766f6d // "movi"
  private val FccRec = 0x20636572 // "rec "
  private val FccMjpg = 0x47504a4d // "MJPG"
  private val BiRgb = 0

  def isAvi(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      leU32(payload, 0) == FccRiff && leU32(payload, 8) == FccAvi

  /** Decode the first `vids` stream: (width, height, one row-major
    * grayscale byte array per frame, ITU-601 integer luma). */
  def decodeAviFrames(payload: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    val (w, h, n, sampled) = decodeAviFramesStrided(payload, 1)
    require(n == sampled.length)
    (w, h, sampled.map(_._2))
  }

  /** Strided decode: every `stride`-th frame is decoded, the rest are
    * SKIPPED AT THE CONTAINER LEVEL — the chunk walk counts them (the
    * total is needed) but never touches their bytes, so a stride-s pass
    * over an MJPEG stream pays 1/s of the JPEG decode cost. This is the
    * frame-sampling fast path [[Multimodal.extractFrameFeatures]] rides:
    * at video scale the decode dominates, and sampling that still
    * decodes everything is sampling in name only. Returns (width,
    * height, TOTAL frame count, (frameIdx, pixels) for sampled frames). */
  def decodeAviFramesStrided(payload: Array[Byte],
                             stride: Int): (Int, Int, Int, Array[(Int, Array[Byte])]) = {
    require(isAvi(payload), "payload is not a RIFF/AVI container")
    // --- pass 1 (hdrl): locate the first video stream and its format ---
    var streamIdx = -1 // running strl ordinal
    var vidsStream = -1 // ordinal of the first vids stream
    var handler = 0
    var biWidth = 0; var biHeight = 0; var biBitCount = 0; var biCompression = 0
    var palette: Array[Byte] = null // luma per palette index, 8-bit DIBs
    var inVidsStrl = false

    // every chunk-size field is attacker-controlled bytes: reject sizes
    // that are negative (signed read of a huge u32) or that run past the
    // payload — otherwise the walk loops forever or indexes out of bounds
    def checkedSize(off: Int, end: Int): Int = {
      val sz = leU32(payload, off + 4)
      require(sz >= 0 && off + 8 + sz <= end,
        s"corrupt AVI: chunk at offset $off declares size $sz beyond " +
          s"the enclosing extent $end")
      sz
    }

    def walkHdrl(off0: Int, end: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val ckid = leU32(payload, off)
        val sz = checkedSize(off, end)
        val body = off + 8
        if (ckid == FccList && sz >= 4) {
          val listType = leU32(payload, body)
          if (listType == FccStrl) {
            streamIdx += 1
            inVidsStrl = false
            walkHdrl(body + 4, body + sz)
          } else walkHdrl(body + 4, body + sz)
        } else if (ckid == FccStrh && sz >= 8) {
          val fccType = leU32(payload, body)
          if (fccType == FccVids && vidsStream < 0) {
            vidsStream = streamIdx
            handler = leU32(payload, body + 4)
            inVidsStrl = true
          } else inVidsStrl = false
        } else if (ckid == FccStrf && inVidsStrl && sz >= 40) {
          biWidth = leU32(payload, body + 4)
          biHeight = leU32(payload, body + 8)
          biBitCount = leU32(payload, body + 14) & 0xffff
          biCompression = leU32(payload, body + 16)
          if (biBitCount == 8) {
            var clrUsed = leU32(payload, body + 32)
            if (clrUsed == 0 || clrUsed > 256) clrUsed = 256
            // long arithmetic: 4 * a huge u32 would overflow Int and
            // bypass the truncation check
            require(40L + 4L * clrUsed <= sz,
              s"8-bit DIB strf truncated: $clrUsed palette entries do not fit")
            // a full 256-entry luma table regardless of biClrUsed: real
            // encoders routinely emit pixel indices past a partial
            // palette, and decoders map them to black rather than crash
            palette = new Array[Byte](256)
            var i = 0
            while (i < clrUsed) { // RGBQUAD is B,G,R,reserved
              val p = body + 40 + 4 * i
              val b = payload(p) & 0xff
              val g = payload(p + 1) & 0xff
              val r = payload(p + 2) & 0xff
              palette(i) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
              i += 1
            }
          }
        }
        off = body + sz + (sz & 1) // chunks are word-aligned
      }
    }

    // --- frame chunk decode ---
    def decodeFrame(ckid: Int, off: Int, sz: Int): Array[Byte] = {
      val isDc = (ckid >>> 16) == 0x6364 // "dc" suffix: compressed
      if (biCompression == BiRgb && !isDc) {
        decodeDib(payload, off, sz, biWidth, biHeight, biBitCount, palette)
      } else if (biCompression == FccMjpg || handler == FccMjpg) {
        decodeJpegLuma(payload, off, sz, biWidth, math.abs(biHeight))
      } else {
        require(requirement = false,
          s"unsupported AVI video compression fourcc 0x${biCompression.toHexString}" +
            " (BI_RGB raw DIB and MJPG only; use an external codec for others)")
        null
      }
    }

    // --- pass 2 (movi): collect this stream's frame chunks in order,
    // decoding only every stride-th one (counting the rest) ---
    require(stride >= 1, "stride must be >= 1")
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    var frameIdx = 0
    // "%02d" stream number as the two leading fourcc bytes; lazy because
    // vidsStream is only known after the hdrl walk (movi is walked later)
    lazy val wantPrefix =
      ((('0' + vidsStream % 10) & 0xff) << 8) | (('0' + vidsStream / 10) & 0xff)

    def walkMovi(off0: Int, end: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val ckid = leU32(payload, off)
        val sz = checkedSize(off, end)
        val body = off + 8
        if (ckid == FccList && sz >= 4 && leU32(payload, body) == FccRec) {
          walkMovi(body + 4, body + sz) // interleaved record group
        } else if ((ckid & 0xffff) == wantPrefix) {
          val suffix = ckid >>> 16
          if (suffix == 0x6264 || suffix == 0x6364) { // "db" | "dc"
            if (frameIdx % stride == 0)
              frames += ((frameIdx, decodeFrame(ckid, body, sz)))
            frameIdx += 1
          }
        }
        off = body + sz + (sz & 1)
      }
    }

    // --- top-level walk ---
    var off = 12
    val riffSz = leU32(payload, 4)
    val fileEnd =
      if (riffSz < 0) payload.length else math.min(payload.length, 8 + riffSz)
    var moviAt = -1; var moviEnd = -1
    while (off + 8 <= fileEnd) {
      val ckid = leU32(payload, off)
      val sz = checkedSize(off, fileEnd)
      val body = off + 8
      if (ckid == FccList && sz >= 4) {
        val listType = leU32(payload, body)
        if (listType == FccHdrl) walkHdrl(body + 4, body + sz)
        else if (listType == FccMovi) { moviAt = body + 4; moviEnd = body + sz }
      }
      off = body + sz + (sz & 1)
    }
    require(vidsStream >= 0, "AVI has no 'vids' stream")
    require(biWidth > 0 && biHeight != 0,
      "AVI 'vids' stream has no usable strf BITMAPINFOHEADER")
    // header-claimed dimensions are untrusted: bound them so w*h and
    // stride*h arithmetic below cannot overflow Int
    require(biWidth <= 16384 && math.abs(biHeight) <= 16384,
      s"implausible AVI dimensions ${biWidth}x$biHeight (max 16384)")
    require(moviAt >= 0, "AVI has no 'movi' list")
    walkMovi(moviAt, moviEnd)
    (biWidth, math.abs(biHeight), frameIdx, frames.toArray)
  }

  /** Raw BI_RGB DIB → row-major top-down grayscale. Positive biHeight is
    * bottom-up (the common case), negative is top-down. Rows are padded
    * to 4-byte stride. */
  private def decodeDib(buf: Array[Byte], off: Int, sz: Int,
                        w: Int, biHeight: Int, bitCount: Int,
                        palette: Array[Byte]): Array[Byte] = {
    val h = math.abs(biHeight)
    val topDown = biHeight < 0
    val out = new Array[Byte](w * h)
    bitCount match {
      case 8 =>
        require(palette != null, "8-bit DIB without a palette")
        val stride = (w + 3) & ~3
        require(stride.toLong * h <= sz,
          s"8-bit DIB chunk truncated: need ${stride.toLong * h}, have $sz")
        var y = 0
        while (y < h) {
          val srcRow = if (topDown) y else h - 1 - y
          val src = off + srcRow * stride
          var x = 0
          while (x < w) {
            out(y * w + x) = palette(buf(src + x) & 0xff)
            x += 1
          }
          y += 1
        }
      case 24 =>
        val stride = (3 * w + 3) & ~3
        require(stride.toLong * h <= sz,
          s"24-bit DIB chunk truncated: need ${stride.toLong * h}, have $sz")
        var y = 0
        while (y < h) {
          val srcRow = if (topDown) y else h - 1 - y
          val src = off + srcRow * stride
          var x = 0
          while (x < w) {
            val b = buf(src + 3 * x) & 0xff
            val g = buf(src + 3 * x + 1) & 0xff
            val r = buf(src + 3 * x + 2) & 0xff
            out(y * w + x) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
            x += 1
          }
          y += 1
        }
      case other =>
        require(requirement = false,
          s"unsupported DIB bit depth $other (8-bit paletted / 24-bit BGR only)")
    }
    out
  }

  private def decodeJpegLuma(buf: Array[Byte], off: Int, sz: Int,
                             w: Int, h: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(buf, off, sz))
    require(img != null, "MJPEG frame chunk is not a decodable JPEG")
    require(img.getWidth == w && img.getHeight == h,
      s"MJPEG frame is ${img.getWidth}x${img.getHeight}, strf says ${w}x$h")
    val out = new Array[Byte](w * h)
    val raster = img.getRaster
    val gray = raster.getNumBands == 1
    var k = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (gray) {
          // single-band JPEG: the sample IS the luma. getRGB would run a
          // linear-gray → sRGB conversion here and distort every value.
          out(k) = raster.getSample(x, y, 0).toByte
        } else {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          out(k) = ((r * 299 + g * 587 + b * 114) / 1000).toByte
        }
        k += 1; x += 1
      }
      y += 1
    }
    out
  }

  /** Decode the first `auds` (PCM audio) stream of an AVI — the audio
    * half of an interleaved A/V container. Returns the same contract as
    * the WAV path of [[Multimodal.JdkMediaDecoder]]: (sampleRate,
    * channels, frameCount, first-channel samples as unsigned 8-bit) —
    * 8-bit unsigned PCM passes through untouched, 16-bit signed
    * little-endian PCM keeps the high byte shifted to unsigned.
    * Non-PCM audio codecs (MP3-in-AVI etc.) are rejected loudly. */
  def decodeAviAudio(payload: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(isAvi(payload), "payload is not a RIFF/AVI container")
    var streamIdx = -1
    var audsStream = -1
    var inAudsStrl = false
    var formatTag = 0; var channels = 0; var sampleRate = 0
    var blockAlign = 0; var bits = 0

    def checkedSize(off: Int, end: Int): Int = {
      val sz = leU32(payload, off + 4)
      require(sz >= 0 && off + 8 + sz <= end,
        s"corrupt AVI: chunk at offset $off declares size $sz beyond " +
          s"the enclosing extent $end")
      sz
    }

    def walkHdrl(off0: Int, end: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val ckid = leU32(payload, off)
        val sz = checkedSize(off, end)
        val body = off + 8
        if (ckid == FccList && sz >= 4) {
          val listType = leU32(payload, body)
          if (listType == FccStrl) { streamIdx += 1; inAudsStrl = false }
          walkHdrl(body + 4, body + sz)
        } else if (ckid == FccStrh && sz >= 8) {
          val fccType = leU32(payload, body)
          if (fccType == FccAuds && audsStream < 0) {
            audsStream = streamIdx
            inAudsStrl = true
          } else inAudsStrl = false
        } else if (ckid == FccStrf && inAudsStrl && sz >= 16) {
          // WAVEFORMATEX: tag(2) ch(2) rate(4) avgBps(4) align(2) bits(2)
          formatTag = leU32(payload, body) & 0xffff
          channels = (leU32(payload, body) >>> 16) & 0xffff
          sampleRate = leU32(payload, body + 4)
          blockAlign = leU32(payload, body + 12) & 0xffff
          bits = (leU32(payload, body + 12) >>> 16) & 0xffff
        }
        off = body + sz + (sz & 1)
      }
    }

    val chunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    lazy val wantPrefix =
      ((('0' + audsStream % 10) & 0xff) << 8) | (('0' + audsStream / 10) & 0xff)

    def walkMovi(off0: Int, end: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val ckid = leU32(payload, off)
        val sz = checkedSize(off, end)
        val body = off + 8
        if (ckid == FccList && sz >= 4 && leU32(payload, body) == FccRec) {
          walkMovi(body + 4, body + sz)
        } else if ((ckid & 0xffff) == wantPrefix &&
            (ckid >>> 16) == 0x6277) { // "wb": audio data
          chunks += ((body, sz))
        }
        off = body + sz + (sz & 1)
      }
    }

    var off = 12
    val riffSz = leU32(payload, 4)
    val fileEnd =
      if (riffSz < 0) payload.length else math.min(payload.length, 8 + riffSz)
    var moviAt = -1; var moviEnd = -1
    while (off + 8 <= fileEnd) {
      val ckid = leU32(payload, off)
      val sz = checkedSize(off, fileEnd)
      val body = off + 8
      if (ckid == FccList && sz >= 4) {
        val listType = leU32(payload, body)
        if (listType == FccHdrl) walkHdrl(body + 4, body + sz)
        else if (listType == FccMovi) { moviAt = body + 4; moviEnd = body + sz }
      }
      off = body + sz + (sz & 1)
    }
    require(audsStream >= 0, "AVI has no 'auds' stream")
    require(formatTag == 1,
      s"unsupported AVI audio format tag $formatTag (integer PCM only)")
    require(bits == 8 || bits == 16,
      s"unsupported audio sample size $bits bits (8/16-bit PCM only)")
    require(channels >= 1 && sampleRate >= 1 && blockAlign >= 1,
      "AVI 'auds' stream has no usable WAVEFORMATEX")
    require(moviAt >= 0, "AVI has no 'movi' list")
    walkMovi(moviAt, moviEnd)
    val total = chunks.map(_._2).sum
    val nFrames = total / blockAlign
    val samples = new Array[Byte](nFrames)
    var f = 0
    var chunkI = 0
    var consumed = 0 // bytes of prior chunks
    var (cOff, cSz) = if (chunks.isEmpty) (0, 0) else chunks(0)
    while (f < nFrames) {
      var base = f * blockAlign - consumed // first channel of frame f
      while (base >= cSz) { // advance to the chunk holding this frame
        consumed += cSz; base -= cSz
        chunkI += 1
        val c = chunks(chunkI); cOff = c._1; cSz = c._2
      }
      // frames never straddle chunks (writers chunk on blockAlign
      // boundaries; enforce rather than silently mis-decode)
      require(base + (if (bits == 8) 1 else 2) <= cSz,
        s"AVI audio frame $f straddles a chunk boundary")
      samples(f) =
        if (bits == 8) payload(cOff + base) // 8-bit PCM is unsigned
        else (payload(cOff + base + 1) + 128).toByte // LE: high byte
      f += 1
    }
    (sampleRate, channels, nFrames, samples)
  }

  // ------------------------------------------------------------------
  // Synthetic writers (deterministic fixtures; see object scaladoc)
  // ------------------------------------------------------------------

  /** Closed-form luma for the synthetic fixtures (the q68 construction
    * with distinct constants, so the two video gates cannot mask each
    * other): pixel (x, y) of frame f in asset `id`. */
  def syntheticLuma(id: Long, f: Int, x: Int, y: Int): Int =
    java.lang.Math.floorMod(id * 37 + f * 43 + x * 5 + y * 11, 256L).toInt

  /** Raw-DIB AVI with closed-form pixels. `bitCount` 8 writes paletted
    * grayscale (identity palette), 24 writes BGR with B=G=R=v — both
    * decode back to [[syntheticLuma]] exactly. `topDown` negates biHeight
    * and stores rows top-first (decoder coverage for both layouts). */
  def syntheticAviDib(id: Long, w: Int, h: Int, nFrames: Int,
                      bitCount: Int = 8, topDown: Boolean = false): Array[Byte] = {
    require(bitCount == 8 || bitCount == 24, "bitCount must be 8 or 24")
    val stride = if (bitCount == 8) (w + 3) & ~3 else (3 * w + 3) & ~3
    val frames = Array.tabulate(nFrames) { f =>
      val data = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val row = if (topDown) y else h - 1 - y // storage row for image row y
        var x = 0
        while (x < w) {
          val v = syntheticLuma(id, f, x, y)
          if (bitCount == 8) data(row * stride + x) = v.toByte
          else {
            data(row * stride + 3 * x) = v.toByte
            data(row * stride + 3 * x + 1) = v.toByte
            data(row * stride + 3 * x + 2) = v.toByte
          }
          x += 1
        }
        y += 1
      }
      data
    }
    buildAvi(w, h, frames, bitCount, topDown, compression = BiRgb,
      handler = 0x20424944 /* "DIB " */, chunkSuffix = "db")
  }

  /** Smooth (non-wrapping) closed-form luma for the MJPEG fixture:
    * [[syntheticLuma]]'s mod-256 sawtooth has 255→0 cliffs that ring
    * hard under JPEG's 8x8 DCT; a bounded gradient keeps lossy error
    * within a small tolerance so the spec can assert near-exactness. */
  def mjpegLuma(id: Long, f: Int, x: Int, y: Int, w: Int, h: Int): Int =
    math.min(255,
      (java.lang.Math.floorMod(id, 16L).toInt + f * 16
        + x * 120 / math.max(1, w - 1) + y * 60 / math.max(1, h - 1)))

  /** One baseline grayscale JPEG (JDK encoder, fixed quality) over a
    * per-pixel luma function. */
  private def encodeJpegGray(w: Int, h: Int, quality: Float)
                            (luma: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, luma(x, y)); x += 1 }
      y += 1
    }
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
    require(writers.hasNext, "no JPEG writer available")
    val writer = writers.next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** MJPEG AVI: one baseline JPEG (JDK encoder, fixed quality) per frame
    * over [[mjpegLuma]]. JPEG is lossy, so this fixture is for spec-level
    * tolerance tests, not hash oracles. */
  def syntheticAviMjpeg(id: Long, w: Int, h: Int, nFrames: Int,
                        quality: Float = 0.9f): Array[Byte] = {
    val frames = Array.tabulate(nFrames) { f =>
      encodeJpegGray(w, h, quality)(mjpegLuma(id, f, _, _, w, h))
    }
    buildAvi(w, h, frames, bitCount = 24, topDown = false,
      compression = FccMjpg, handler = FccMjpg, chunkSuffix = "dc")
  }

  /** Per-frame CONSTANT luma for the oracle-gated MJPEG fixture, kept
    * away from the 0/255 rails: a flat 8x8 block is pure DC through the
    * JPEG DCT, so the decode error is a small bounded rounding term —
    * which is what lets a hash oracle check a LOSSY codec (the gate
    * emits the tolerance verdict, not raw pixels). */
  def mjpegConstLuma(id: Long, f: Int): Int =
    (java.lang.Math.floorMod(id * 7 + f * 23, 180L) + 30).toInt

  /** MJPEG AVI of constant-luma frames ([[mjpegConstLuma]]) — the
    * gate-grade companion of [[syntheticAviMjpeg]]. */
  def syntheticAviMjpegConst(id: Long, w: Int, h: Int, nFrames: Int,
                             quality: Float = 0.9f): Array[Byte] = {
    val frames = Array.tabulate(nFrames) { f =>
      val v = mjpegConstLuma(id, f)
      encodeJpegGray(w, h, quality)((_, _) => v)
    }
    buildAvi(w, h, frames, bitCount = 24, topDown = false,
      compression = FccMjpg, handler = FccMjpg, chunkSuffix = "dc")
  }

  /** Closed-form PCM sample for the interleaved fixture — the same
    * construction as `Multimodal.syntheticWav` (sample j of asset `id` is
    * `(id*17 + j*29) mod 256`), so the two audio containers share one
    * oracle. */
  def syntheticPcmSample(id: Long, j: Int): Int =
    java.lang.Math.floorMod(id * 17 + j * 29, 256L).toInt

  /** INTERLEAVED A/V AVI: DIB video as stream 0 ([[syntheticLuma]]
    * pixels) and integer PCM mono audio as stream 1
    * ([[syntheticPcmSample]] samples, split across one '01wb' chunk per
    * video frame — the classic interleaving). `bits` 8 writes unsigned
    * 8-bit PCM; 16 writes signed little-endian 16-bit whose high byte
    * reads back as the same closed form. Exercises stream SELECTION:
    * a video decode of this file must skip the audio chunks and vice
    * versa. */
  def syntheticAviInterleaved(id: Long, w: Int, h: Int, nFrames: Int,
                              nSamples: Int, sampleRate: Int,
                              bits: Int = 8): Array[Byte] = {
    require(nFrames >= 1, "need at least one video frame")
    require(bits == 8 || bits == 16, "bits must be 8 or 16")
    val stride = (w + 3) & ~3
    val vFrames = Array.tabulate(nFrames) { f =>
      val data = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val row = h - 1 - y // bottom-up
        var x = 0
        while (x < w) {
          data(row * stride + x) = syntheticLuma(id, f, x, y).toByte
          x += 1
        }
        y += 1
      }
      data
    }
    val blockAlign = bits / 8
    val perChunk = (nSamples + nFrames - 1) / nFrames
    val aChunks = Array.tabulate(nFrames) { f =>
      val lo = math.min(f * perChunk, nSamples)
      val hi = math.min(lo + perChunk, nSamples)
      val data = new Array[Byte]((hi - lo) * blockAlign)
      var j = lo
      while (j < hi) {
        val v = syntheticPcmSample(id, j)
        if (bits == 8) data(j - lo) = v.toByte
        else { // signed 16-bit LE with high byte = v - 128
          data((j - lo) * 2) = 0
          data((j - lo) * 2 + 1) = (v - 128).toByte
        }
        j += 1
      }
      data
    }

    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >>> 8) & 0xff)
      bos.write((v >>> 16) & 0xff); bos.write((v >>> 24) & 0xff)
    }
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def fcc(s: String): Unit = { require(s.length == 4); s.foreach(c => bos.write(c & 0xff)) }

    val strfV = 40 + 256 * 4
    val strlV = 4 + (8 + 56) + (8 + strfV)
    val strfA = 16 // WAVEFORMATEX without cbSize
    val strlA = 4 + (8 + 56) + (8 + strfA)
    val hdrlSize = 4 + (8 + 56) + (8 + strlV) + (8 + strlA)
    def padded(n: Int) = 8 + n + (n & 1)
    val moviSize = 4 + vFrames.map(f => padded(f.length)).sum +
      aChunks.map(c => padded(c.length)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val maxFrame = vFrames.map(_.length).max

    fcc("RIFF"); u32(riffSize); fcc("AVI ")
    fcc("LIST"); u32(hdrlSize); fcc("hdrl")
    fcc("avih"); u32(56)
    u32(40000); u32(maxFrame * 25); u32(0); u32(0)
    u32(nFrames); u32(0); u32(2); u32(maxFrame)
    u32(w); u32(h); u32(0); u32(0); u32(0); u32(0)
    // stream 0: video (8-bit DIB, identity palette)
    fcc("LIST"); u32(strlV); fcc("strl")
    fcc("strh"); u32(56)
    fcc("vids"); fcc("DIB ")
    u32(0); u16(0); u16(0); u32(0)
    u32(1); u32(25); u32(0); u32(nFrames)
    u32(maxFrame); u32(-1); u32(0)
    u16(0); u16(0); u16(w); u16(h)
    fcc("strf"); u32(strfV)
    u32(40); u32(w); u32(h); u16(1); u16(8)
    u32(BiRgb); u32(stride * h); u32(0); u32(0); u32(256); u32(0)
    var i = 0
    while (i < 256) { bos.write(i); bos.write(i); bos.write(i); bos.write(0); i += 1 }
    // stream 1: audio (integer PCM mono)
    fcc("LIST"); u32(strlA); fcc("strl")
    fcc("strh"); u32(56)
    fcc("auds"); u32(0)
    u32(0); u16(0); u16(0); u32(0)
    u32(1); u32(sampleRate); u32(0); u32(nSamples)
    u32(perChunk * blockAlign); u32(-1); u32(blockAlign)
    u16(0); u16(0); u16(0); u16(0)
    fcc("strf"); u32(strfA)
    u16(1); u16(1) // PCM, mono
    u32(sampleRate); u32(sampleRate * blockAlign)
    u16(blockAlign); u16(bits)
    // movi: interleave one audio chunk after each video frame
    fcc("LIST"); u32(moviSize); fcc("movi")
    var f = 0
    while (f < nFrames) {
      fcc("00db"); u32(vFrames(f).length); bos.write(vFrames(f))
      if ((vFrames(f).length & 1) == 1) bos.write(0)
      fcc("01wb"); u32(aChunks(f).length); bos.write(aChunks(f))
      if ((aChunks(f).length & 1) == 1) bos.write(0)
      f += 1
    }
    bos.toByteArray
  }

  /** Assemble RIFF/AVI: hdrl (avih + one strl), movi, idx1. */
  private def buildAvi(w: Int, h: Int, frames: Array[Array[Byte]],
                       bitCount: Int, topDown: Boolean, compression: Int,
                       handler: Int, chunkSuffix: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >>> 8) & 0xff)
      bos.write((v >>> 16) & 0xff); bos.write((v >>> 24) & 0xff)
    }
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >>> 8) & 0xff) }
    def fcc(s: String): Unit = { require(s.length == 4); s.foreach(c => bos.write(c & 0xff)) }

    val paletteBytes = if (bitCount == 8) 256 * 4 else 0
    val strfSize = 40 + paletteBytes
    val strlSize = 4 + (8 + 56) + (8 + strfSize)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val frameSizes = frames.map(_.length)
    val moviSize = 4 + frameSizes.map(s => 8 + s + (s & 1)).sum
    val idx1Size = 16 * frames.length
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
    val maxFrame = if (frameSizes.isEmpty) 0 else frameSizes.max

    fcc("RIFF"); u32(riffSize); fcc("AVI ")
    // hdrl
    fcc("LIST"); u32(hdrlSize); fcc("hdrl")
    fcc("avih"); u32(56)
    u32(40000) // dwMicroSecPerFrame (25 fps)
    u32(maxFrame * 25); u32(0)
    u32(0x10) // AVIF_HASINDEX
    u32(frames.length); u32(0); u32(1); u32(maxFrame)
    u32(w); u32(h)
    u32(0); u32(0); u32(0); u32(0)
    // strl
    fcc("LIST"); u32(strlSize); fcc("strl")
    fcc("strh"); u32(56)
    fcc("vids"); u32(handler)
    u32(0); u16(0); u16(0) // flags, priority, language
    u32(0) // initial frames
    u32(1); u32(25) // scale / rate
    u32(0); u32(frames.length)
    u32(maxFrame); u32(-1) // suggested buffer, quality
    u32(0) // sample size (0 = varying)
    u16(0); u16(0); u16(w); u16(h) // rcFrame
    fcc("strf"); u32(strfSize)
    u32(40); u32(w); u32(if (topDown) -h else h)
    u16(1); u16(bitCount)
    u32(compression)
    u32(if (compression == BiRgb) frames.headOption.map(_.length).getOrElse(0) else 0)
    u32(0); u32(0)
    u32(if (bitCount == 8) 256 else 0); u32(0)
    if (bitCount == 8) { // identity grayscale palette: B,G,R,reserved
      var i = 0
      while (i < 256) { bos.write(i); bos.write(i); bos.write(i); bos.write(0); i += 1 }
    }
    // movi
    fcc("LIST"); u32(moviSize); fcc("movi")
    val offsets = new Array[Int](frames.length)
    var rel = 4 // offset of each chunk from the start of 'movi' list data
    var i = 0
    while (i < frames.length) {
      offsets(i) = rel
      fcc("00" + chunkSuffix); u32(frames(i).length)
      bos.write(frames(i))
      if ((frames(i).length & 1) == 1) bos.write(0)
      rel += 8 + frames(i).length + (frames(i).length & 1)
      i += 1
    }
    // idx1 (offsets relative to the 'movi' fourcc, the common convention)
    fcc("idx1"); u32(idx1Size)
    i = 0
    while (i < frames.length) {
      fcc("00" + chunkSuffix)
      u32(0x10) // AVIIF_KEYFRAME
      u32(offsets(i)); u32(frames(i).length)
      i += 1
    }
    bos.toByteArray
  }

  private def leU32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
}
