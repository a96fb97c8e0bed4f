package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * payloads are opaque `binary` columns with typed metadata, processed
  * partition-parallel.
  *
  * What is REAL byte math (no codec library needed): container
  * sniffing, PNG/JPEG dimension parse ([[graft.functions.ImageDims]]),
  * WAV/RIFF metadata ([[graft.functions.WavMeta]]), pixel resize and
  * channel features over uncompressed 24-bpp bitmaps
  * ([[graft.functions.Bmp]]), and FULL 8-bit RGB PNG pixel decode —
  * zlib inflate + all five row unfilters via the JVM's built-in
  * Inflater ([[graft.functions.Png]]) — all codegen'd scan-stage
  * expressions. JPEG pixel decode is real too, via the JDK's built-in
  * ImageIO codecs ([[decodePixelsReal]]) — pinned by spec rather than
  * the cross-engine oracle because JPEG IDCT rounding is
  * implementation-defined. Only LEARNED embeddings (and the
  * oracle-parity fallback dims for non-image payloads) remain
  * deterministic STUBS (clearly marked), because a model genuinely
  * needs weights this container lacks — but the Spark-side plumbing
  * that matters at 100 TB is real: binary columns flow through parquet
  * scans untouched, metadata extraction is pure codegen'd expressions,
  * and per-payload decoding is a `mapPartitions` over iterators (no
  * per-row task setup, no driver collect).
  */
object MultimodalOps {

  /** Container sniffing from magic bytes — pure expression, runs in the
    * scan stage. Covers the common training-corpus containers.
    */
  def sniffMime(blob: Column): Column = {
    val magic8 = hex(substring(blob, 1, 8))
    val magic3 = hex(substring(blob, 1, 3))
    val riff = hex(substring(blob, 1, 4))
    val riffKind = hex(substring(blob, 9, 4))
    val ftyp = hex(substring(blob, 5, 4))
    when(magic8 === "89504E470D0A1A0A", "image/png")
      .when(magic3 === "FFD8FF", "image/jpeg")
      .when(riff === "52494646" && riffKind === "57415645", "audio/wav")   // RIFF…WAVE
      .when(riff === "52494646" && riffKind === "41564920", "video/avi")   // RIFF…AVI
      .when(ftyp === "66747970", "video/mp4")                              // ….ftyp
      .when(magic3 === "494433", "audio/mpeg")                             // ID3
      .when(hex(substring(blob, 1, 2)) === "424D", "image/bmp")            // BM
      .otherwise("application/octet-stream")
  }

  /** Image dimensions: REAL header parse for PNG (IHDR) and JPEG (SOF
    * marker walk) via the native [[graft.functions.ImageDims]]
    * expression — plain byte reads, no codec library, runs in the scan
    * stage. Falls back to the deterministic hash-derived stub dims for
    * payloads that are not parseable images (the fixture corpus carries
    * text bytes as stand-in payloads), so the schema is total either
    * way. Only the PIXEL decode remains a stub — dimensions are parsed
    * for real (oracle-checked by p30 over structurally-real headers).
    */
  def decodeImage(blob: Column): Column = {
    val packed = graft.functions.ImageDims.dims(blob)
    val stub = decodeImageStub(blob)
    struct(
      coalesce(shiftright(packed, 32), stub.getField("width")).as("width"),
      coalesce(packed.bitwiseAND(0xffffffffL), stub.getField("height")).as("height"),
      lit(3).as("channels"))
  }

  /** STUB image decode: derives deterministic (width, height, channels)
    * from the payload's portable hash instead of parsing a codec header
    * (no image libs in this container) — the fallback branch of
    * [[decodeImage]] for non-image payloads.
    */
  def decodeImageStub(blob: Column): Column = {
    val h = Portable.h32(blob.cast("string"))
    // integer div via exact-double trick: (h - h%448)/448 is exact
    // because the numerator is divisible and the quotient < 2^53
    val q = ((h - h % 448) / 448).cast("long")
    struct(
      (lit(64) + h % 448).as("width"),
      (lit(64) + q % 448).as("height"),
      lit(3).as("channels"))
  }

  /** Payload metadata projection: byte size, content digest, leading
    * magic bytes, sniffed container type.
    */
  def blobMeta(blob: Column): Column =
    struct(
      length(blob).as("nbytes"),
      md5(blob).as("digest"),
      hex(substring(blob, 1, 4)).as("magic"),
      sniffMime(blob).as("mime"))

  /** REAL resize loop for LOSSY compressed payloads (JPEG): ImageIO
    * decode → bilinear resample to (w, h) → ImageIO JPEG re-encode at
    * a fixed quality. The full PNG loop is bit-exact and
    * oracle-checked (p74, [[graft.functions.PngResize]]); JPEG's IDCT
    * and quantizer are implementation-defined, so this path is pinned
    * BY SPEC instead — MultimodalSpec re-decodes the emitted bytes and
    * asserts per-pixel deltas against an independent resample stay
    * inside a lossy-codec tolerance envelope (the only honest contract
    * a lossy codec offers). Same scale shape as every codec kernel
    * here: one codec context per partition via `mapPartitions`,
    * payloads streamed, no shuffle; undecodable rows yield NULL
    * payload (mid-crawl truncation is data, not an error).
    */
  def resizeJpegReal(df: DataFrame, id: String, blob: String,
                     w: Int, h: Int, quality: Float = 0.9f): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long"), col(blob).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (did, bytes) =>
          val out =
            try {
              val img = decodeBounded(bytes)
              if (img == null) null
              else {
                val scaled = bilinearScale(img, w, h)
                encodeJpeg(scaled, quality)
              }
            } catch { case _: Exception => null }
          (did, w, h, out)
        }
      }
      .toDF(id, "width", "height", "payload")
  }

  /** Bilinear rescale onto an RGB raster — shared by the resize kernel
    * and the spec's independent reference resample.
    */
  private[graft] def bilinearScale(img: java.awt.image.BufferedImage,
                                   w: Int, h: Int): java.awt.image.BufferedImage = {
    val dst = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    dst
  }

  /** JPEG-encode at an explicit quality (ImageIO's default writer). */
  private[graft] def encodeJpeg(img: java.awt.image.BufferedImage,
                                quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** ImageIO decode with the dimension-bomb guard (shared with
    * [[decodePixelsReal]]): a header claiming huge dims yields NULL
    * before raster allocation, never an executor OOM.
    */
  private[graft] def decodeBounded(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    if (bytes == null) return null
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val r = readers.next()
      try {
        r.setInput(iis)
        val w = r.getWidth(0).toLong; val h = r.getHeight(0).toLong
        if (w <= 0 || h <= 0 || w * h > graft.functions.Png.maxPixels) null
        else r.read(0)
      } finally r.dispose()
    } finally iis.close() // dispose() does not close the stream
  }

  /** STUB feature extraction for LEARNED embeddings: a deterministic
    * pseudo-embedding of `dim` doubles in [0,1) derived from the
    * payload digest — the `mapPartitions` batch shape of a real encoder
    * (one model context per partition, streamed payloads, vectors
    * emitted per row).
    * value_j = uint32(md5("emb:j:" ++ md5hex(payload))[0,8)) / 2^32.
    * For CLASSICAL pixel features over uncompressed bitmaps the
    * extraction is REAL — [[graft.functions.Bmp.channelStats]] computes
    * channel sums + histogram from actual pixel bytes (oracle-checked
    * by p55).
    */
  def embedStub(df: DataFrame, id: String, blob: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long"), col(blob).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: load one encoder/model context here per partition
        val md = java.security.MessageDigest.getInstance("MD5")
        def hexOf(bytes: Array[Byte]): String = {
          md.reset(); md.update(bytes)
          md.digest().map("%02x".format(_)).mkString
        }
        it.map { case (did, bytes) =>
          // null payload → null vector (no crash; callers filter nulls)
          val vec = if (bytes == null) null else {
            val digest = hexOf(bytes)
            Array.tabulate(dim) { j =>
              val h = hexOf(s"emb:$j:$digest".getBytes("UTF-8")).substring(0, 8)
              java.lang.Long.parseLong(h, 16).toDouble / 4294967296.0
            }
          }
          (did, vec)
        }
      }
      .toDF(id, "embedding")
  }

  /** REAL pixel decode: JPEG payloads run the FROM-SCRATCH baseline
    * decoder ([[graft.functions.Jpeg]] — T.81 Huffman + dequant + IDCT +
    * YCbCr, r18, completing the all-from-scratch codec lineage with
    * PNG/gzip/zstd/BMP/WAV); other formats fall back to the JDK's
    * ImageIO codecs (headless-safe). JPEG's IDCT rounding is
    * implementation-defined, so this lane is pinned BY SPEC against
    * ImageIO with a pixel tolerance (MultimodalSpec) plus the EXACT
    * DC-only construction oracle (p273) — the decode is genuinely real,
    * not a stub. `mapPartitions` codec shape: one decode loop per
    * partition, payloads streamed, undecodable rows yield NULL dims
    * (mid-crawl truncation is data, not an error).
    */
  def decodePixelsReal(df: DataFrame, id: String, blob: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long"), col(blob).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        System.setProperty("java.awt.headless", "true")
        // no temp-file spooling per payload: everything is already
        // in-memory bytes
        javax.imageio.ImageIO.setUseCache(false)
        def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
          if (bytes == null) return null
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) return null
            val r = readers.next()
            try {
              r.setInput(iis)
              // dimension-bomb guard BEFORE raster allocation: a header
              // claiming huge dims must yield NULL, not an executor OOM
              // (same cap as the PNG kernel)
              val w = r.getWidth(0).toLong; val h = r.getHeight(0).toLong
              if (w <= 0 || h <= 0 || w * h > graft.functions.Png.maxPixels) null
              else r.read(0)
            } finally r.dispose()
          } finally iis.close() // dispose() does not close the stream
        }
        it.map { case (did, bytes) =>
          val none = (did, None: Option[Int], None: Option[Int],
            None: Option[Long], None: Option[Long], None: Option[Long])
          // the from-scratch decoder is the PRIMARY JPEG lane (r18);
          // valid-but-unsupported shapes it declines (arithmetic/lossless
          // JPEGs, CMYK/4-component, sampling factors >2) FALL BACK to
          // ImageIO below instead of yielding NULL dims (r19, from the
          // r18 coverage-regression note) — so coverage is a superset of
          // both decoders, with the scratch path taking every baseline +
          // progressive stream it supports
          val scratch = if (bytes != null && bytes.length >= 3 &&
            (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8 &&
            (bytes(2) & 0xFF) == 0xFF)
            graft.functions.Jpeg.decodeRgb(bytes) else null
          if (scratch != null) {
            val (w, h, rgb) = scratch
            var sr = 0L; var sg = 0L; var sb = 0L
            var p = 0
            val end = w * h * 3
            while (p < end) {
              sr += rgb(p) & 0xff; sg += rgb(p + 1) & 0xff
              sb += rgb(p + 2) & 0xff
              p += 3
            }
            (did, Some(w), Some(h), Some(sr), Some(sg), Some(sb))
          } else {
            val img =
              try decode(bytes)
              catch { case _: Exception => null } // junk bytes: not an error
            if (img == null) none
            else {
              val w = img.getWidth; val h = img.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              val row = new Array[Int](w) // bulk row reads, not per-pixel
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, row, 0, w)
                var x = 0
                while (x < w) {
                  val px = row(x)
                  sr += (px >> 16) & 0xff; sg += (px >> 8) & 0xff; sb += px & 0xff
                  x += 1
                }
                y += 1
              }
              (did, Some(w), Some(h), Some(sr), Some(sg), Some(sb))
            }
          }
        }
      }
      .toDF(id, "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** STUB frame sampler: emits `n` evenly-spaced "frames" per payload as
    * (id, frame_idx, frame_hash) via `mapPartitions` — the partition-
    * parallel iterator shape of a real decoder (one codec context per
    * partition, streaming over payloads, never materializing all frames).
    * The per-frame digest stands in for decoded pixel data.
    */
  def sampleFramesStub(df: DataFrame, id: String, blob: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long"), col(blob).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real impl: open one codec context here, reuse across payloads
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (did, bytes) =>
          (0 until n).iterator.map { i =>
            // long arithmetic: length * i overflows Int for payloads
            // over ~Int.MaxValue/n bytes — exactly the blobs this
            // module targets
            val start =
              if (bytes.isEmpty) 0 else (bytes.length.toLong * i / n).toInt
            val end = math.min(bytes.length, start + 16)
            md.reset()
            md.update(bytes, start, math.max(0, end - start))
            val hash = md.digest().map("%02x".format(_)).mkString
            (did, i, hash)
          }
        }
      }
      .toDF(id, "frame_idx", "frame_hash")
  }
}
