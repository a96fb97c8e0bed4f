package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{MultimodalOps, Portable}

/** Multimodal-column entries of the driver contract. The fixture corpus
  * has no real image/audio payloads, so `documents.text` bytes stand in
  * as the opaque binary payload (`CAST(text AS BINARY)` ≡ DuckDB
  * `encode(text)`); every metadata/decode formula is mirrored exactly in
  * the DuckDB oracle. See [[graft.ops.MultimodalOps]] for the stub
  * boundary (decode is deterministic-fake, plumbing is real).
  */
object MultimodalQ {

  private val h = Portable.h32Sql("text")

  /** Little-endian hex of a value known to fit 32/16 bits — the BMP and
    * WAV container builders share these.
    */
  private[queries] def le32h(x: org.apache.spark.sql.Column) = {
    val h = lpad(hex(x.cast("long")), 8, "0")
    concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2))
  }
  private[queries] def le16h(x: org.apache.spark.sql.Column) = {
    val h = lpad(hex(x.cast("long")), 4, "0")
    concat(substring(h, 3, 2), substring(h, 1, 2))
  }

  private[queries] def le24h(x: org.apache.spark.sql.Column) = {
    val h = lpad(hex(x.cast("long")), 6, "0")
    concat(substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2))
  }

  /** LEN field of a single-STORED-block deflate member. The one-block
    * builder is only valid for payloads ≤ 65535 bytes (LEN/NLEN are 16
    * bits); a longer record would silently emit a malformed member that
    * surfaces as a mysterious oracle hash mismatch, so fail the query
    * loudly at the ceiling instead. The bound is a property of THIS
    * builder (fixture byte algebra), not of the inflate kernel, which
    * walks multi-block members fine. */
  private[queries] def storedLen16(len: org.apache.spark.sql.Column) =
    when(len > 65535L, raise_error(concat(
      lit("stored-deflate builder: record of "), len.cast("string"),
      lit(" bytes exceeds the 65535-byte single-block bound"))))
      .otherwise(le16h(len))

  /** p271 constants, assembled from the RFC 8878 grammar at query-BUILD
    * time (driver-side, once): the shard DICTIONARY and the hand-derived
    * compressed first block every record frame opens with. The point of
    * a Common Crawl shard dictionary is exactly this shape — the WARC
    * record boilerplate shared by millions of records lives ONCE in the
    * dictionary, and each record's frame references it instead of
    * carrying it; here the first block is one sequence (1 literal 'W' +
    * a 30-byte match through the dictionary's rep1 into the content
    * tail) regenerating the full "WARC/1.0\r\nWARC-Type: response\r\n"
    * record prefix from 10 block bytes.
    */
  private[queries] object ZstShardDict {
    private def hx(bs: Array[Byte]): String = bs.map(b => f"$b%02X").mkString
    private def le32(v: Int): Array[Byte] =
      Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)

    /** The record boilerplate the dictionary serves: every record frame's
      * first block copies these 30 bytes out of the dictionary tail. */
    val sharedTail = "ARC/1.0\r\nWARC-Type: response\r\n" // 30 bytes
    private val content = ("GRAFT-SHARD-DICT:" + sharedTail).getBytes("UTF-8")
    val dictId = 0x47524654 // arbitrary nonzero ID every record frame names

    /** RFC 8878 §5 structured dictionary: magic, ID, entropy tables in
      * the Huffman → OF → ML → LL order, the three recent offsets, then
      * content. The entropy tables are minimal VALID descriptions
      * (parsed by the same from-scratch readers the blocks use):
      *  - Huffman `81 11`: direct mode, 2 declared weights [1,1] → with
      *    the derived last weight the canonical 3-symbol 2-bit table;
      *  - each FSE `F0 03`: accLog bits 0000 → 5; then the §4.1.1
      *    value coding with remaining=33/threshold=32/max=30 — low
      *    read(5)=31 ≥ max so one more bit, full=63 ≥ threshold →
      *    count 63-30-1 = 32 = the whole table for symbol 0;
      *  - rep1=31 is the load-bearing one: block 1's repeat-offset
      *    match resolves through it (rep2/rep3 default 4/8). */
    val dictBytes: Array[Byte] =
      le32(0xEC30A437) ++ le32(dictId) ++
        Array[Byte](0x81.toByte, 0x11) ++ // Huffman weights
        Array[Byte](0xF0.toByte, 0x03) ++ // OF  FSE
        Array[Byte](0xF0.toByte, 0x03) ++ // ML  FSE
        Array[Byte](0xF0.toByte, 0x03) ++ // LL  FSE
        le32(31) ++ le32(4) ++ le32(8) ++
        content

    /** The dictionary travels zstd-COMPRESSED inside its skippable frame
      * (the published .warc.zst convention): one single-segment frame,
      * 1-byte FCS, a single raw last block. */
    private val dictFrame: Array[Byte] = {
      val n = dictBytes.length
      val hdr = (n << 3) | 1 // raw block, last
      le32(0xFD2FB528) ++ Array[Byte](0x20, n.toByte,
        (hdr & 0xFF).toByte, ((hdr >> 8) & 0xFF).toByte, 0) ++ dictBytes
    }

    /** Leading skippable frame, magic 0x184D2A5D — the dictionary slot
      * [[graft.functions.ZstdDecode.ccFrames]] binds. */
    val skippableHex: String =
      hx(le32(0x184D2A5D) ++ le32(dictFrame.length) ++ dictFrame)

    /** Hand-derived compressed block (predefined modes, one sequence):
      * `3C0000` block header (content 7, type compressed, not last);
      * `08 57` literals section (raw, size-format 0, ONE literal 'W');
      * `01 00` one sequence, all-predefined modes; `22 10 02` the
      * backward bitstream. Derivation of the 18 content bits (sentinel
      * at bit 17, then reads consume top-down): llS=read(6)=bits[11,17),
      * ofS=read(5)=bits[6,11), mlS=read(6)=bits[0,6) →
      * V = llS<<11 | ofS<<6 | mlS with llS=2 (predefined-LL spread puts
      * symbol/code 1 at cell 2 → LL=1+0 extra), ofS=0 (cell 0 holds
      * code 0 → offVal=1+read(0)=1, with ll≠0 the rep1 slot), mlS=34
      * (cell 34 holds code 27 → ML=30+0 extra) → V=0x01022, LE bytes
      * `22 10` + `02` (bit 16 zero, sentinel bit 17). Decode: 'W' +
      * 30 bytes via rep1=31 into the dictionary tail = the 31-byte
      * record prefix below, from 10 constant bytes per record. */
    val block1Hex: String = hx(Array[Byte](0x3C, 0, 0,
      0x08, 'W'.toByte, 0x01, 0x00, 0x22, 0x10, 0x02))

    /** What block 1 regenerates. */
    val block1Out: String = "W" + sharedTail // "WARC/1.0\r\n..." 31 bytes
    val dictIdHex: String = hx(le32(dictId))
  }

  val all: Seq[Q] = Seq(

    // ---- binary payload metadata + stub decode ---------------------------
    // this DuckDB has no BLOB slicing/md5, but the fixture text is pure
    // ASCII (verified: octet_length(encode(text)) == length(text) for
    // every row), so VARCHAR substr/md5/hex mirror the byte ops exactly
    Q("p18_blob_features", Some(s"""
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS nbytes,
             md5(text) AS digest,
             upper(hex(substr(text, 1, 4))) AS magic,
             CASE
               WHEN upper(hex(substr(text, 1, 8))) = '89504E470D0A1A0A' THEN 'image/png'
               WHEN upper(hex(substr(text, 1, 3))) = 'FFD8FF' THEN 'image/jpeg'
               WHEN upper(hex(substr(text, 1, 4))) = '52494646'
                AND upper(hex(substr(text, 9, 4))) = '57415645' THEN 'audio/wav'
               WHEN upper(hex(substr(text, 1, 4))) = '52494646'
                AND upper(hex(substr(text, 9, 4))) = '41564920' THEN 'video/avi'
               WHEN upper(hex(substr(text, 5, 4))) = '66747970' THEN 'video/mp4'
               WHEN upper(hex(substr(text, 1, 3))) = '494433' THEN 'audio/mpeg'
               WHEN upper(hex(substr(text, 1, 2))) = '424D' THEN 'image/bmp'
               ELSE 'application/octet-stream'
             END AS mime,
             64 + ($h % 448) AS width,
             64 + (CAST(($h - $h % 448) / 448 AS BIGINT) % 448) AS height,
             CAST(3 AS BIGINT) AS channels
      FROM documents
      ORDER BY doc_id""")) { (spark, dir) =>
      val blob = col("text").cast("binary")
      val meta = MultimodalOps.blobMeta(blob)
      // real header parse first; text payloads aren't images, so this
      // resolves to the deterministic stub dims the oracle mirrors
      val dec = MultimodalOps.decodeImage(blob)
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          meta.getField("nbytes").cast("long").as("nbytes"),
          meta.getField("digest").as("digest"),
          meta.getField("magic").as("magic"),
          meta.getField("mime").as("mime"),
          dec.getField("width").as("width"),
          dec.getField("height").as("height"),
          dec.getField("channels").cast("long").as("channels"))
        .orderBy(col("doc_id"))
    },

    // ---- REAL image-header dimension parse -------------------------------
    // Builds structurally-real containers in-query — a PNG signature +
    // IHDR chunk for even doc_ids, an SOI + APP0/JFIF + SOF0 JPEG
    // prefix for odd ones — with dimensions derived from doc_id, then
    // recovers them by PARSING the bytes (graft.functions.ImageDims:
    // IHDR fixed offsets / JPEG marker-segment walk). The oracle
    // computes the dims arithmetically, so any drift between the
    // encoder layout and the parser fails the hash compare. The JPEG
    // side crosses the APP0 segment before SOF0, so the skip loop is
    // exercised, not just fixed offsets.
    Q("p30_image_dims", Some("""
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS mime,
             1 + doc_id % 1000 AS width,
             1 + (doc_id * 31) % 1000 AS height
      FROM documents
      ORDER BY doc_id""")) { (spark, dir) =>
      val w = (lit(1L) + col("doc_id") % 1000).cast("int")
      val h = (lit(1L) + (col("doc_id") * 31) % 1000).cast("int")
      // PNG: signature, IHDR length 13, "IHDR", BE32 width, BE32 height,
      // bit depth 8, color type 6 (RGBA), compression/filter/interlace 0
      val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"), lit("0806000000"))
      // JPEG: SOI, APP0 (len 16, JFIF\0, v1.1, no density/thumb), SOF0
      // (len 17, precision 8, BE16 height, BE16 width, 3 components)
      val jpgHex = concat(
        lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
        lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
        lit("03012200021101031101"))
      val blob = unhex(when(col("doc_id") % 2 === 0, pngHex).otherwise(jpgHex))
      val dec = MultimodalOps.decodeImage(blob)
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          MultimodalOps.sniffMime(blob).as("mime"),
          dec.getField("width").as("width"),
          dec.getField("height").as("height"))
        .orderBy(col("doc_id"))
    },

    // ---- partition-parallel stub frame sampling --------------------------
    Q("p19_frame_sample", Some("""
      WITH f AS (SELECT doc_id, text AS b,
                        unnest(generate_series(0, 3)) AS frame_idx
                 FROM documents),
      s AS (SELECT doc_id, frame_idx,
                   length(b) * frame_idx // 4 AS st, b
            FROM f)
      SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
             md5(substr(b, CAST(st + 1 AS BIGINT),
                        CAST(least(16, length(b) - st) AS BIGINT))) AS frame_hash
      FROM s ORDER BY doc_id, frame_idx""")) { (spark, dir) =>
      MultimodalOps.sampleFramesStub(
          Tables.loadSpread(spark, dir, "documents").withColumn("blob",
            col("text").cast("binary")),
          "doc_id", "blob", n = 4)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          col("frame_hash"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },

    // ---- stub feature extraction (pseudo-embedding per payload) ----------
    // The encoder stub's formula is md5-only, so DuckDB reproduces every
    // vector component exactly; the query explodes the vectors for a
    // row-wise compare. dim=8 keeps the oracle cheap.
    Q("p27_blob_embed", Some("""
      SELECT doc_id, CAST(j AS BIGINT) AS j,
             round(CAST(concat('0x', substr(
                 md5(concat('emb:', CAST(j AS VARCHAR), ':', md5(text))),
                 1, 8)) AS BIGINT) / 4294967296.0, 6) AS v
      FROM documents, generate_series(0, 7) t(j)
      ORDER BY doc_id, j""")) { (spark, dir) =>
      MultimodalOps.embedStub(
          Tables.loadSpread(spark, dir, "documents").withColumn("blob",
            col("text").cast("binary")),
          "doc_id", "blob", dim = 8)
        .select(col("doc_id"),
          posexplode(col("embedding")).as(Seq("j", "v0")))
        .select(col("doc_id"), col("j").cast("long").as("j"),
          round(col("v0"), 6).as("v"))
        .orderBy(col("doc_id"), col("j"))
    },

    // ---- REAL WAV/RIFF header parse (audio analog of p30) ----------------
    // Builds structurally-real WAV containers in-query — RIFF header, an
    // odd-sized LIST chunk for doc_id%4==1 (exercising the even-padding
    // walk), a 16-byte fmt chunk, and a data chunk whose payload is
    // deliberately truncated (the parser must read the DECLARED size,
    // the mid-stream reality of a 100 TB crawl) — with every field
    // derived from doc_id, then recovers the fields by PARSING the bytes
    // (graft.functions.WavMeta: little-endian chunk walk). The oracle
    // computes the same fields arithmetically, so any drift between the
    // in-query encoder layout and the parser fails the hash compare.
    // duration_us is computed from the PARSED fields.
    Q("p36_wav_meta", Some("""
      WITH p AS (SELECT doc_id,
                        1 + doc_id % 2 AS channels,
                        8000 + (doc_id % 5) * 8820 AS sample_rate,
                        CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
                        100 + doc_id % 900 AS frames
                 FROM documents)
      SELECT doc_id,
             CAST(channels AS BIGINT) AS channels,
             CAST(sample_rate AS BIGINT) AS sample_rate,
             CAST(bits AS BIGINT) AS bits,
             CAST(frames * channels * (bits // 8) AS BIGINT) AS data_size,
             CAST(frames * 1000000 // sample_rate AS BIGINT) AS duration_us
      FROM p ORDER BY doc_id""")) { (spark, dir) =>
      // little-endian hex of a value known to fit 32/16 bits
      def le32(x: org.apache.spark.sql.Column) = {
        val h = lpad(hex(x.cast("long")), 8, "0")
        concat(substring(h, 7, 2), substring(h, 5, 2),
          substring(h, 3, 2), substring(h, 1, 2))
      }
      def le16(x: org.apache.spark.sql.Column) = {
        val h = lpad(hex(x.cast("long")), 4, "0")
        concat(substring(h, 3, 2), substring(h, 1, 2))
      }
      val c = lit(1L) + col("doc_id") % 2
      val r = lit(8000L) + (col("doc_id") % 5) * 8820L
      val b = when(col("doc_id") % 3 === 0, lit(8L)).otherwise(lit(16L))
      val frames = lit(100L) + col("doc_id") % 900
      val bytesPerFrame = c * expr("CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END")
      val dataSize = frames * bytesPerFrame
      // LIST chunk (size 3, odd → 1 pad byte) for doc_id%4==1: "INF"+pad
      val listHex = when(col("doc_id") % 4 === 1,
        concat(lit("4C495354"), le32(lit(3L)), lit("494E4600"))).otherwise(lit(""))
      val listBytes = when(col("doc_id") % 4 === 1, lit(12L)).otherwise(lit(0L))
      val riffSize = lit(4L) + listBytes + lit(24L) + lit(8L) + dataSize
      val wavHex = concat(
        lit("52494646"), le32(riffSize), lit("57415645"), // RIFF size WAVE
        listHex,
        lit("666D7420"), le32(lit(16L)), // "fmt " 16
        le16(lit(1L)), le16(c), le32(r), le32(r * bytesPerFrame),
        le16(bytesPerFrame), le16(b),
        lit("64617461"), le32(dataSize)) // "data" size, payload truncated
      val blob = unhex(wavHex)
      import graft.functions.WavMeta
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          WavMeta.channels(blob).as("channels"),
          WavMeta.sampleRate(blob).as("sample_rate"),
          WavMeta.bits(blob).as("bits"),
          WavMeta.dataSize(blob).as("data_size"))
        .withColumn("duration_us",
          expr("data_size * 1000000 div (sample_rate * channels * (bits div 8))"))
        .orderBy(col("doc_id"))
    },

    // ---- REAL pixel resize over an uncompressed bitmap --------------------
    // Builds a structurally-real 24-bpp BMP per document (dims and every
    // pixel value derived from doc_id), then recovers a 4x3 thumbnail by
    // PARSING the bytes — graft.functions.Bmp walks the file/info
    // headers, bottom-up padded pixel rows, and does the exact
    // nearest-neighbour index math (sx = x2*w//4, sy = y2*h//3). The
    // oracle computes the same pixels arithmetically, so any drift in
    // header layout, row padding, bottom-up order, BGR byte order, or
    // the resample arithmetic fails the hash compare. This is the real
    // resize the r6 stubs stood in for; p71 extends real decode to the
    // COMPRESSED PNG codec (and JPEG decodes for real via JDK ImageIO,
    // spec-pinned — MultimodalOps.decodePixelsReal).
    Q("p54_bmp_resize", Some("""
      WITH d AS (SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h
                 FROM documents),
      g AS (SELECT doc_id, w, h, unnest(generate_series(0, 11)) AS i FROM d),
      m AS (SELECT doc_id, i,
                   ((i % 4) * w) // 4 AS sx, ((i // 4) * h) // 3 AS sy
            FROM g)
      SELECT doc_id, CAST(i AS BIGINT) AS i,
             (doc_id*7 + sx*3 + sy*5) % 256 AS r,
             (doc_id*7 + sx*3 + sy*5 + 11) % 256 AS g,
             (doc_id*7 + sx*3 + sy*5 + 22) % 256 AS b
      FROM m ORDER BY doc_id, i""")) { (spark, dir) =>
      import graft.functions.Bmp
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), posexplode(Bmp.resample(bmpBlob, 4, 3))
          .as(Seq("i", "px")))
        .select(col("doc_id"), col("i").cast("long").as("i"),
          shiftright(col("px"), 16).cast("long").as("r"),
          (shiftright(col("px"), 8) % 256).cast("long").as("g"),
          (col("px") % 256).cast("long").as("b"))
        .orderBy(col("doc_id"), col("i"))
    },

    // ---- REAL channel features over the same bitmap ------------------------
    // One pass over every pixel (a single scan-stage codegen'd
    // expression, no per-pixel explode — the shape that survives
    // megapixel payloads): per-channel sums, a 4-bin red histogram,
    // and the integer channel mean. Dims come from the parsed header
    // (BmpDimsExpr round-trip), not the generator arithmetic.
    Q("p55_bmp_features", Some("""
      WITH d AS (SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h
                 FROM documents),
      e AS (SELECT doc_id, w, h, unnest(generate_series(0, w*h - 1)) AS i FROM d),
      v AS (SELECT doc_id, w*h AS n_px,
                   (doc_id*7 + (i % w)*3 + (i // w)*5) % 256 AS r,
                   (doc_id*7 + (i % w)*3 + (i // w)*5 + 11) % 256 AS g,
                   (doc_id*7 + (i % w)*3 + (i // w)*5 + 22) % 256 AS b
            FROM e)
      SELECT doc_id, CAST(min(n_px) AS BIGINT) AS n_px,
             CAST(SUM(r) AS BIGINT) AS sum_r,
             CAST(SUM(g) AS BIGINT) AS sum_g,
             CAST(SUM(b) AS BIGINT) AS sum_b,
             CAST(SUM(CASE WHEN r // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS rh0,
             CAST(SUM(CASE WHEN r // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rh1,
             CAST(SUM(CASE WHEN r // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS rh2,
             CAST(SUM(CASE WHEN r // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS rh3,
             CAST(CAST(SUM(r) AS BIGINT) // min(n_px) AS BIGINT) AS mean_r
      FROM v GROUP BY doc_id
      ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.Bmp
      val stats = Bmp.channelStats(bmpBlob)
      val dims = Bmp.dims(bmpBlob)
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          (shiftright(dims, 32) * dims.bitwiseAND(0xffffffffL))
            .cast("long").as("n_px"),
          stats.getItem(0).as("sum_r"), stats.getItem(1).as("sum_g"),
          stats.getItem(2).as("sum_b"),
          stats.getItem(3).as("rh0"), stats.getItem(4).as("rh1"),
          stats.getItem(5).as("rh2"), stats.getItem(6).as("rh3"))
        .withColumn("mean_r", expr("sum_r div n_px"))
        .orderBy(col("doc_id"))
    },

    // ---- REAL decode of a COMPRESSED codec: PNG ----------------------------
    // The step past p54/p55's uncompressed bitmaps: a structurally-real
    // 8-bit PNG per document (signature, IHDR, a zlib stream in the
    // IDAT, IEND), decoded by graft.functions.Png with the JVM's REAL
    // zlib inflate plus per-row unfiltering. The fixture cycles through
    // all four crawl-realistic color types by doc_id % 4 — RGB, RGBA,
    // grayscale, gray+alpha — so the decoder's per-type byte stride and
    // RGB normalization (gray replicated, alpha dropped) are
    // oracle-checked, not just the happy RGB path. The in-query builder
    // emits the zlib stream as a STORED deflate block (the one deflate
    // shape that is hex-constructible arithmetically), so the oracle
    // computes every pixel directly while the engine must walk chunks,
    // inflate, and unfilter to recover them; compressed (non-stored)
    // streams and filters 1-4 are pinned by MultimodalSpec against a
    // real java.util.zip.Deflater encoder at every bpp. (JPEG decodes
    // for real via JDK ImageIO — spec-pinned, not oracle-checkable:
    // IDCT rounding is implementation-defined.)
    Q("p71_png_decode", Some("""
      WITH d AS (SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h
                 FROM documents),
      e AS (SELECT doc_id, w, h, unnest(generate_series(0, w*h - 1)) AS i FROM d),
      v AS (SELECT doc_id, w, h,
                   (doc_id*7 + (i % w)*3 + (i // w)*5) % 256 AS r,
                   CASE WHEN doc_id % 4 >= 2
                        THEN (doc_id*7 + (i % w)*3 + (i // w)*5) % 256
                        ELSE (doc_id*7 + (i % w)*3 + (i // w)*5 + 11) % 256
                   END AS g,
                   CASE WHEN doc_id % 4 >= 2
                        THEN (doc_id*7 + (i % w)*3 + (i // w)*5) % 256
                        ELSE (doc_id*7 + (i % w)*3 + (i // w)*5 + 22) % 256
                   END AS b
            FROM e)
      SELECT doc_id, CAST(min(w) AS BIGINT) AS w, CAST(min(h) AS BIGINT) AS h,
             CAST(SUM(r) AS BIGINT) AS sum_r,
             CAST(SUM(g) AS BIGINT) AS sum_g,
             CAST(SUM(b) AS BIGINT) AS sum_b,
             CAST(SUM(CASE WHEN r // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS rh0,
             CAST(SUM(CASE WHEN r // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rh1,
             CAST(SUM(CASE WHEN r // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS rh2,
             CAST(SUM(CASE WHEN r // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS rh3
      FROM v GROUP BY doc_id
      ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.PngChannelStats
      val stats = PngChannelStats(pngBlob)
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          stats.getItem(0).as("w"), stats.getItem(1).as("h"),
          stats.getItem(2).as("sum_r"), stats.getItem(3).as("sum_g"),
          stats.getItem(4).as("sum_b"),
          stats.getItem(5).as("rh0"), stats.getItem(6).as("rh1"),
          stats.getItem(7).as("rh2"), stats.getItem(8).as("rh3"))
        .orderBy(col("doc_id"))
    },

    // ---- the FULL compressed-codec resize loop: PNG -> PNG -----------------
    // What a 100 TB thumbnail pass actually does, end to end and all
    // REAL: decode the compressed payload (inflate + unfilter, any
    // supported color type), nearest-neighbour resample to 5x4 (the
    // exact Bmp/p54 mapping: source pixel (x2*w/5, y2*h/4), floor
    // division), re-encode as a standard PNG (filter-None rows, fixed
    // Deflater, real CRCs) — then DECODE THE RE-ENCODED BYTES for the
    // checked output, so the oracle's arithmetic pixel math proves the
    // whole decode→resample→encode→decode chain is lossless. Deflate
    // bytes are implementation-defined, hence re-decode rather than
    // payload hash. One scan-stage expression chain per row: no
    // shuffle, no UDF, codegen end to end. The PNG loop is bit-exact
    // and oracle-checked here; the JPEG loop is real too
    // (MultimodalOps.resizeJpegReal) but spec-pinned with a tolerance
    // envelope, because lossy re-encode is impl-defined.
    Q("p74_png_resize", Some("""
      WITH d AS (SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h
                 FROM documents),
      e AS (SELECT doc_id, w, h, unnest(generate_series(0, 19)) AS i FROM d),
      m AS (SELECT doc_id, ((i % 5) * w) // 5 AS sx, ((i // 5) * h) // 4 AS sy
            FROM e),
      v AS (SELECT doc_id,
                   (doc_id*7 + sx*3 + sy*5) % 256 AS r,
                   CASE WHEN doc_id % 4 >= 2
                        THEN (doc_id*7 + sx*3 + sy*5) % 256
                        ELSE (doc_id*7 + sx*3 + sy*5 + 11) % 256
                   END AS g,
                   CASE WHEN doc_id % 4 >= 2
                        THEN (doc_id*7 + sx*3 + sy*5) % 256
                        ELSE (doc_id*7 + sx*3 + sy*5 + 22) % 256
                   END AS b
            FROM m)
      SELECT doc_id, CAST(5 AS BIGINT) AS w, CAST(4 AS BIGINT) AS h,
             CAST(SUM(r) AS BIGINT) AS sum_r,
             CAST(SUM(g) AS BIGINT) AS sum_g,
             CAST(SUM(b) AS BIGINT) AS sum_b,
             CAST(SUM(CASE WHEN r // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS rh0,
             CAST(SUM(CASE WHEN r // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rh1,
             CAST(SUM(CASE WHEN r // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS rh2,
             CAST(SUM(CASE WHEN r // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS rh3
      FROM v GROUP BY doc_id
      ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.{PngChannelStats, PngResize}
      val stats = PngChannelStats(PngResize(pngBlob, 5, 4))
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          stats.getItem(0).as("w"), stats.getItem(1).as("h"),
          stats.getItem(2).as("sum_r"), stats.getItem(3).as("sum_g"),
          stats.getItem(4).as("sum_b"),
          stats.getItem(5).as("rh0"), stats.getItem(6).as("rh1"),
          stats.getItem(7).as("rh2"), stats.getItem(8).as("rh3"))
        .orderBy(col("doc_id"))
    },

    // ---- REAL PCM sample decode + waveform features (audio p55) ------------
    // The step past p36's header-only parse: a structurally-real WAV
    // per document whose DATA payload is real interleaved integer PCM
    // (8-bit unsigned for doc_id%3==0, 16-bit signed LE otherwise;
    // mono/stereo by doc_id%2), decoded by graft.functions.Wav — the
    // chunk walk, then one pass over every frame computing per-channel
    // sum / sum|x| / peak / zero-crossings as a single scan-stage
    // codegen'd expression. Every stored sample is derived from
    // (doc_id, frame, channel), so the oracle computes the decoded
    // signed values arithmetically; any drift in the byte layout,
    // sign handling, channel interleave, or the feature math fails the
    // hash compare. The stereo rows prove the interleave walk; the
    // 8-bit rows prove the unsigned-offset decode.
    Q("p78_wav_pcm_features", Some("""
      WITH p AS (SELECT doc_id,
                        1 + doc_id % 2 AS nch,
                        CASE WHEN doc_id % 3 = 0 THEN 256 ELSE 65536 END AS m,
                        50 + doc_id % 200 AS frames
                 FROM documents),
      c AS (SELECT doc_id, nch, m, frames,
                   unnest(generate_series(0, nch - 1)) AS ch FROM p),
      s AS (SELECT doc_id, m, frames, ch,
                   unnest(generate_series(0, frames - 1)) AS i FROM c),
      v AS (SELECT doc_id, ch, i, frames,
                   CASE WHEN m = 256
                        THEN (doc_id*13 + i*17 + ch*29) % 256 - 128
                        WHEN (doc_id*13 + i*17 + ch*29) % 65536 < 32768
                        THEN (doc_id*13 + i*17 + ch*29) % 65536
                        ELSE (doc_id*13 + i*17 + ch*29) % 65536 - 65536
                   END AS val
            FROM s),
      z AS (SELECT doc_id, ch, frames, val,
                   lag(val) OVER (PARTITION BY doc_id, ch ORDER BY i) AS pv
            FROM v)
      SELECT doc_id, CAST(ch AS BIGINT) AS ch,
             CAST(min(frames) AS BIGINT) AS n_frames,
             CAST(sum(val) AS BIGINT) AS sum_v,
             CAST(sum(abs(val)) AS BIGINT) AS sum_abs,
             CAST(max(abs(val)) AS BIGINT) AS peak,
             CAST(sum(CASE WHEN pv IS NOT NULL AND ((val < 0) <> (pv < 0))
                           THEN 1 ELSE 0 END) AS BIGINT) AS zc
      FROM z GROUP BY doc_id, ch
      ORDER BY doc_id, ch""")) { (spark, dir) =>
      import graft.functions.Wav
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          posexplode(Wav.pcmStats(wavPcmBlob)).as(Seq("ch", "st")))
        .select(col("doc_id"), col("ch").cast("long").as("ch"),
          col("st").getItem(0).as("n_frames"),
          col("st").getItem(1).as("sum_v"),
          col("st").getItem(2).as("sum_abs"),
          col("st").getItem(3).as("peak"),
          col("st").getItem(4).as("zc"))
        .orderBy(col("doc_id"), col("ch"))
    },

    // ---- REAL PCM resample (audio p54) -------------------------------------
    // Nearest-neighbour downsample of the decoded channel-0 waveform to
    // a fixed 16 frames — out[j] reads source frame j*frames/16, the
    // exact Bmp/p54 mapping in one dimension. What a 100 TB audio pass
    // does to normalize variable-length clips to a fixed feature grid;
    // one scan-stage expression, no shuffle, no explode of raw frames.
    Q("p79_wav_pcm_resample", Some("""
      WITH p AS (SELECT doc_id,
                        CASE WHEN doc_id % 3 = 0 THEN 256 ELSE 65536 END AS m,
                        50 + doc_id % 200 AS frames
                 FROM documents),
      j AS (SELECT doc_id, m, frames,
                   unnest(generate_series(0, 15)) AS j FROM p),
      t AS (SELECT doc_id, j, m, (j * frames) // 16 AS si FROM j)
      SELECT doc_id, CAST(j AS BIGINT) AS j,
             CAST(CASE WHEN m = 256
                       THEN (doc_id*13 + si*17) % 256 - 128
                       WHEN (doc_id*13 + si*17) % 65536 < 32768
                       THEN (doc_id*13 + si*17) % 65536
                       ELSE (doc_id*13 + si*17) % 65536 - 65536
                  END AS BIGINT) AS val
      FROM t ORDER BY doc_id, j""")) { (spark, dir) =>
      import graft.functions.Wav
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          posexplode(Wav.pcmResample(wavPcmBlob, 16)).as(Seq("j", "v")))
        .select(col("doc_id"), col("j").cast("long").as("j"),
          col("v").cast("long").as("val"))
        .orderBy(col("doc_id"), col("j"))
    },

    // ---- REAL gzip member decode (compressed TEXT payloads) ----------------
    // The first thing a crawl pipeline does to a fetched body: strip
    // the RFC 1952 framing and inflate. The fixture wraps each
    // document's leading 200 chars in a structurally-real gzip member
    // — header with the FNAME flag set (the walk must skip a
    // zero-terminated filename, the single most common real-world
    // header extra), a STORED deflate block (the hex-constructible
    // shape, as in p71's IDAT), and an unverified CRC32/ISIZE trailer
    // (mid-crawl members truncate after the deflate stream; bytes
    // already inflated are data). graft.functions.Gzip raw-inflates
    // with the JVM's real zlib and the decoded BYTES compose with
    // built-in md5/length/substring downstream — decode is a
    // scan-stage expression, so decompress-and-fingerprint is one
    // codegen'd pass with zero shuffle. Compressed (non-stored)
    // members, FEXTRA/FHCRC headers, bomb payloads, and junk bytes
    // are pinned by MultimodalSpec against a real GZIPOutputStream.
    Q("p80_gunzip_decode", Some("""
      WITH p AS (SELECT doc_id, substr(text, 1, 200) AS body FROM documents)
      SELECT doc_id,
             CAST(length(body) AS BIGINT) AS n_raw,
             md5(body) AS digest,
             substr(body, 1, 16) AS head
      FROM p ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.Gzip
      val dec = Gzip.inflate(gzipBlob)
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          length(dec).cast("long").as("n_raw"),
          md5(dec).as("digest"),
          substring(dec, 1, 16).cast("string").as("head"))
        .orderBy(col("doc_id"))
    },

    // ---- REAL MP4 (ISO-BMFF) metadata box walk -----------------------------
    // The video face of the codec-kernel family: a structurally-real
    // MP4 per document — ftyp, then moov containing a v0 mvhd
    // (timescale/duration) and 1–3 trak/tkhd boxes (track dims as
    // 16.16 fixed point) — parsed back by graft.functions.Mp4's
    // bounded box walk (big-endian sizes, nested children, box-bomb
    // cap). Every doc_id % 11 == 7 payload is TRUNCATED mid-moov: the
    // kernel returns NULL and the row reports -1 sentinels — the
    // NULL-never-throw posture proven in-query, not just in specs.
    // The oracle computes all fields arithmetically from doc_id; any
    // drift in box layout, size math, fixed-point shift, or the
    // truncation contract fails the hash compare. Frame DECODE stays
    // stubbed (p19) — a real H.264 decoder is out of scope; the box
    // walk is what a 100 TB video-manifest pass actually runs.
    //
    // Scale shape: one codegen'd expression in the scan stage; no
    // shuffle, no UDF.
    Q("p139_mp4_box_walk", Some("""
      WITH p AS (SELECT doc_id,
                        600 + (doc_id % 10) * 100 AS timescale,
                        1000 + (doc_id * 37) % 100000 AS duration,
                        1 + doc_id % 3 AS n_tracks,
                        doc_id % 11 = 7 AS corrupt
                 FROM documents),
      t AS (SELECT doc_id,
                   unnest(generate_series(0, n_tracks - 1)) AS i
            FROM p),
      dims AS (SELECT doc_id,
                      CAST(MAX(64 + 16 * ((doc_id + i) % 5)) AS BIGINT)
                        AS max_w,
                      CAST(MAX(48 + 16 * ((doc_id + 2 * i) % 4)) AS BIGINT)
                        AS max_h
               FROM t GROUP BY 1)
      SELECT p.doc_id,
             CAST(CASE WHEN corrupt THEN -1 ELSE timescale END AS BIGINT)
               AS timescale,
             CAST(CASE WHEN corrupt THEN -1 ELSE duration END AS BIGINT)
               AS duration,
             CAST(CASE WHEN corrupt THEN -1 ELSE n_tracks END AS BIGINT)
               AS n_tracks,
             CAST(CASE WHEN corrupt THEN -1 ELSE dims.max_w END AS BIGINT)
               AS max_width,
             CAST(CASE WHEN corrupt THEN -1 ELSE dims.max_h END AS BIGINT)
               AS max_height,
             CAST(CASE WHEN corrupt THEN -1
                       ELSE duration * 1000 // timescale END AS BIGINT)
               AS duration_ms
      FROM p JOIN dims USING (doc_id) ORDER BY p.doc_id""")) { (spark, dir) =>
      import graft.functions.Mp4
      val meta = Mp4.meta(mp4Blob)
      val sent = (i: Int) => coalesce(element_at(meta, i), lit(-1L))
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          sent(1).as("timescale"), sent(2).as("duration"),
          sent(3).as("n_tracks"), sent(4).as("max_width"),
          sent(5).as("max_height"))
        .withColumn("duration_ms",
          when(col("timescale") === -1L, -1L)
            .otherwise(expr("duration * 1000 div timescale")))
        .orderBy(col("doc_id"))
    },

    // ---- REAL ustar (WebDataset-style) shard build + salvage walk ----------
    // Multimodal training shards ship as tar archives of
    // (sample, metadata) member pairs; the loader's first pass over a
    // 100 TB shard store is exactly this header walk. Per doc a
    // 2-member POSIX ustar archive is BUILT in-query (doc_<id>.txt
    // with the text payload, meta/<id>.json with a tiny JSON) by the
    // graft.functions.Tar kernel — real NUL-padded names, octal
    // sizes, byte-sum checksums, 512-byte blocking, 1024-zero
    // trailer — and then SALVAGE-walked: members are consumed while
    // headers verify, and the first malformed header keeps the valid
    // prefix (the mid-crawl-truncation posture, never all-or-nothing).
    // doc_id % 13 = 5 archives are cut 256 bytes into the second
    // header; doc_id % 17 = 3 archives carry a bit-rotted checksum in
    // the second member — both must salvage exactly member 1. The
    // oracle never parses bytes: it recomputes every field from the
    // 512-block algebra (header + ceil(size/512) blocks + trailer),
    // so the hash match proves the kernel's walk agrees with the
    // format arithmetic.
    Q("p164_tar_shard_walk", Some("""
      WITH p AS (SELECT doc_id,
                        CAST(length(text) AS BIGINT) AS s1,
                        CAST(7 + length(CAST(doc_id AS VARCHAR)) AS BIGINT)
                          AS s2,
                        CASE WHEN doc_id % 13 = 5 THEN 1
                             WHEN doc_id % 17 = 3 THEN 2 ELSE 0 END AS mode
                 FROM documents),
      b AS (SELECT doc_id, s1, s2, mode,
                   512 + ((s1 + 511) // 512) * 512 AS bl1,
                   512 + ((s2 + 511) // 512) * 512 AS bl2
            FROM p)
      SELECT doc_id,
             CAST(CASE WHEN mode = 0 THEN 2 ELSE 1 END AS BIGINT)
               AS n_members,
             CAST(CASE WHEN mode = 0 THEN s1 + s2 ELSE s1 END AS BIGINT)
               AS payload_bytes,
             CAST(CASE WHEN mode = 1 THEN bl1 + 256
                  ELSE bl1 + bl2 + 1024 END AS BIGINT) AS archive_bytes,
             CAST(CASE WHEN mode = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS trailer_ok
      FROM b ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.Tar
      val mode = when(col("doc_id") % 13 === 5, 1)
        .when(col("doc_id") % 17 === 3, 2).otherwise(0)
      val blob = Tar.build(
        concat(lit("doc_"), col("doc_id").cast("string"), lit(".txt")),
        col("text"),
        concat(lit("meta/"), col("doc_id").cast("string"), lit(".json")),
        concat(lit("{\"id\":"), col("doc_id").cast("string"), lit("}")),
        mode)
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), Tar.walk(blob).as("w"))
        .select(col("doc_id"), col("w.n_members").as("n_members"),
          col("w.payload_bytes").as("payload_bytes"),
          col("w.archive_bytes").as("archive_bytes"),
          col("w.trailer_ok").as("trailer_ok"))
        .orderBy(col("doc_id"))
    },

    // ---- histogram equalization over REALLY-parsed pixels ------------------
    // The classic contrast-stretch, end to end on bytes the engine
    // PARSED (the p54 BMP build → Bmp.resample 4×3 thumbnail): per
    // image, integer luminance gray = (299r + 587g + 114b) // 1000,
    // the per-image luminance CDF, and the standard equalization
    // remap eq = (cdf(v) − cdf_min)·255 // (n − cdf_min) (flat images
    // hit the n = cdf_min guard → 0). The oracle recomputes every
    // pixel ARITHMETICALLY from the p54 formula and runs the same
    // CDF algebra — so header parsing, BGR order, bottom-up rows,
    // the resample index math AND the equalization all sit under one
    // hash. The per-image histogram work is the shape of every
    // per-sample image transform in a multimodal pipeline: bounded
    // by the image, never corpus-wide.
    //
    // Scale shape: decode+resample is a scan-stage codegen kernel;
    // the CDF is a per-(doc, gray) rollup + a doc-bounded window;
    // the remap is a keyed join back to the pixel rows.
    Q("p207_histogram_equalize", Some("""
      WITH d AS (SELECT doc_id, 3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h
                 FROM documents),
      g AS (SELECT doc_id, w, h, unnest(generate_series(0, 11)) AS i FROM d),
      m AS (SELECT doc_id, i,
                   ((i % 4) * w) // 4 AS sx, ((i // 4) * h) // 3 AS sy
            FROM g),
      px AS (SELECT doc_id, i,
                    ((doc_id*7 + sx*3 + sy*5) % 256 * 299
                     + (doc_id*7 + sx*3 + sy*5 + 11) % 256 * 587
                     + (doc_id*7 + sx*3 + sy*5 + 22) % 256 * 114) // 1000
                      AS gray
             FROM m),
      hg AS (SELECT doc_id, gray, CAST(count(*) AS BIGINT) AS cnt
             FROM px GROUP BY 1, 2),
      cd AS (SELECT doc_id, gray, cnt,
                    sum(cnt) OVER (PARTITION BY doc_id ORDER BY gray
                      ROWS UNBOUNDED PRECEDING) AS cdf
             FROM hg),
      mn AS (SELECT doc_id, min(cdf) AS cdfmin FROM cd GROUP BY 1)
      SELECT px.doc_id, CAST(px.i AS BIGINT) AS i,
             CAST(px.gray AS BIGINT) AS gray,
             CAST(CASE WHEN 12 = mn.cdfmin THEN 0
                  ELSE (cd.cdf - mn.cdfmin) * 255 // (12 - mn.cdfmin) END
               AS BIGINT) AS eq
      FROM px JOIN cd ON cd.doc_id = px.doc_id AND cd.gray = px.gray
              JOIN mn ON mn.doc_id = px.doc_id
      ORDER BY px.doc_id, px.i""")) { (spark, dir) =>
      import graft.functions.Bmp
      val px = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), posexplode(Bmp.resample(bmpBlob, 4, 3))
          .as(Seq("i", "p")))
        .select(col("doc_id"), col("i").cast("long").as("i"),
          ((shiftright(col("p"), 16) * 299
            + (shiftright(col("p"), 8) % 256) * 587
            + (col("p") % 256) * 114) / lit(1000)).cast("long").as("gray"))
      val cd = px.groupBy(col("doc_id"), col("gray"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cdf", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("gray"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
      val mn = cd.groupBy(col("doc_id")).agg(min(col("cdf")).as("cdfmin"))
      px.join(cd.select(col("doc_id"), col("gray"), col("cdf")),
          Seq("doc_id", "gray"))
        .join(mn, "doc_id")
        .select(col("doc_id"), col("i"), col("gray"),
          when(col("cdfmin") === 12, 0L)
            .otherwise(expr("(cdf - cdfmin) * 255 div (12 - cdfmin)"))
            .as("eq"))
        .orderBy(col("doc_id"), col("i"))
    },

    // ---- REAL WARC/1.0 crawl-shard build + salvage walk --------------------
    // Common Crawl's container: a crawl corpus lands as WARC shards of
    // request/response record pairs, and the first pass of a 100 TB
    // crawl ingest is this record walk. Per doc a 2-record WARC shard
    // is BUILT in-query (graft.functions.Warc — real version lines,
    // CRLF headers, Content-Length framing, the spec's terminating
    // CRLFCRLF) and SALVAGE-walked: records are consumed while version
    // line + headers + declared length + terminator all verify in
    // bounds; the first malformed record keeps the valid prefix.
    // doc_id % 13 = 4 shards are cut 40 bytes into the response record
    // (mid-crawl truncation); doc_id % 17 = 6 shards carry a
    // bit-rotted version line on the response (WARX/1.0) — both must
    // salvage exactly the request record. The oracle never parses
    // bytes: every field is recomputed from the record-length algebra
    // (99 fixed framing bytes + type + uri + length-digits + payload),
    // so the hash match proves the kernel's walk agrees with the
    // format arithmetic. Record-bomb and header caps bound the loop
    // on lying shards (adversarial cases in MultimodalSpec).
    Q("p264_warc_shard_walk", Some("""
      WITH p AS (SELECT doc_id,
                        CAST(length(text) AS BIGINT) AS l2,
                        CAST(length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS d,
                        CASE WHEN doc_id % 13 = 4 THEN 1
                             WHEN doc_id % 17 = 6 THEN 2 ELSE 0 END AS mode
                 FROM documents),
      b AS (SELECT doc_id, mode, l2, d, 5 + d AS l1,
                   99 + 7 + 14 + d
                     + length(CAST(5 + d AS VARCHAR)) + (5 + d) AS r1,
                   99 + 8 + 14 + d
                     + length(CAST(l2 AS VARCHAR)) + l2 AS r2
            FROM p)
      SELECT doc_id,
             CAST(CASE WHEN mode = 0 THEN 2 ELSE 1 END AS BIGINT)
               AS n_records,
             CAST(CASE WHEN mode = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS n_responses,
             CAST(CASE WHEN mode = 0 THEN l1 + l2 ELSE l1 END AS BIGINT)
               AS payload_bytes,
             CAST(CASE WHEN mode = 1 THEN r1 + 40 ELSE r1 + r2 END
               AS BIGINT) AS shard_bytes
      FROM b ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.Warc
      val id = col("doc_id").cast("string")
      val mode = when(col("doc_id") % 13 === 4, 1)
        .when(col("doc_id") % 17 === 6, 2).otherwise(0)
      val blob = Warc.build(
        concat(lit("http://ex.com/"), id),
        concat(lit("GET /"), id),
        col("text"), mode)
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), Warc.walk(blob).as("w"))
        .select(col("doc_id"), col("w.n_records").as("n_records"),
          col("w.n_responses").as("n_responses"),
          col("w.payload_bytes").as("payload_bytes"),
          col("w.shard_bytes").as("shard_bytes"))
        .orderBy(col("doc_id"))
    },

    // ---- gzipped WARC: the ACTUAL Common Crawl shard layout ----------------
    // Production Common Crawl gzips EVERY WARC record as its own gzip
    // member and concatenates the members (so a reader can seek to a
    // record and inflate just it). This entry composes the two proven
    // kernels end to end: per doc, a request and a response record
    // (p264's exact framing) are each wrapped in a structurally-real
    // gzip member (p80's shape: 10-byte headerless-FNAME framing, one
    // STORED deflate block, unverified trailer), the members
    // concatenate into the shard, and the read side is
    // Warc.walk(Gzip.inflateMembers(blob)) — member salvage walk, then
    // record salvage walk, ONE codegen'd scan-stage pass, zero shuffle.
    // doc_id % 13 = 4 shards are cut 25 bytes into the response MEMBER
    // (truncated deflate stream: the member walk keeps member 1);
    // doc_id % 17 = 6 shards bit-rot the response member's magic
    // (1F→1E: same salvage). The oracle never parses bytes: record
    // algebra is p264's, member algebra adds the fixed 23-byte gzip
    // overhead (10 header + 5 stored-block header + 8 trailer).
    // MultimodalSpec pins the member walk against REAL concatenated
    // GZIPOutputStream members (genuine deflate, not stored) plus
    // bomb/junk/mid-member-cut adversaries.
    Q("p265_gzipped_warc_walk", Some("""
      WITH p AS (SELECT doc_id,
                        CAST(length(text) AS BIGINT) AS l2,
                        CAST(length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS d,
                        CASE WHEN doc_id % 13 = 4 THEN 1
                             WHEN doc_id % 17 = 6 THEN 2 ELSE 0 END AS mode
                 FROM documents),
      b AS (SELECT doc_id, mode, l2, d, 5 + d AS l1,
                   99 + 7 + 14 + d
                     + length(CAST(5 + d AS VARCHAR)) + (5 + d) AS r1,
                   99 + 8 + 14 + d
                     + length(CAST(l2 AS VARCHAR)) + l2 AS r2
            FROM p)
      SELECT doc_id,
             CAST(CASE WHEN mode = 0 THEN 2 ELSE 1 END AS BIGINT)
               AS n_records,
             CAST(CASE WHEN mode = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS n_responses,
             CAST(CASE WHEN mode = 0 THEN l1 + l2 ELSE l1 END AS BIGINT)
               AS payload_bytes,
             CAST(CASE WHEN mode = 0 THEN r1 + r2 ELSE r1 END AS BIGINT)
               AS inflated_bytes,
             CAST(CASE WHEN mode = 1 THEN r1 + 23 + 25
                       ELSE r1 + r2 + 46 END AS BIGINT)
               AS compressed_bytes
      FROM b ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.{Gzip, Warc}
      val id = col("doc_id").cast("string")
      val uri = concat(lit("http://ex.com/"), id)
      def rec(tpe: String, payload: org.apache.spark.sql.Column) =
        concat(lit("WARC/1.0\r\n"),
          lit(s"WARC-Type: $tpe\r\n"),
          lit("WARC-Target-URI: "), uri, lit("\r\n"),
          lit("WARC-Date: 2024-01-01T00:00:00Z\r\n"),
          lit("Content-Length: "), length(payload).cast("string"),
          lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
      def memberHex(r: org.apache.spark.sql.Column) = {
        val len = length(r).cast("long")
        concat(lit("1F8B0800"), lit("0000000000FF"),
          lit("01"), storedLen16(len), le16h(lit(65535L) - len),
          hex(r), lit("0000000000000000"))
      }
      val m1 = memberHex(rec("request", concat(lit("GET /"), id)))
      val m2full = memberHex(rec("response", col("text")))
      val m2 = when(col("doc_id") % 13 === 4, substring(m2full, 1, 50))
        .when(col("doc_id") % 17 === 6, // magic bit-rot 1F -> 1E
          concat(lit("1E"), substring(m2full, 3, Int.MaxValue)))
        .otherwise(m2full)
      val blob = unhex(concat(m1, m2))
      val w = Warc.walk(Gzip.inflateMembers(blob))
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), w.as("w"),
          length(blob).cast("long").as("compressed_bytes"))
        .select(col("doc_id"), col("w.n_records").as("n_records"),
          col("w.n_responses").as("n_responses"),
          col("w.payload_bytes").as("payload_bytes"),
          col("w.shard_bytes").as("inflated_bytes"),
          col("compressed_bytes"))
        .orderBy(col("doc_id"))
    },

    // ---- gzipped-WARC payload EXTRACTION: documents OUT of the shard -------
    // The step after p265's census: a crawl ingest does not just COUNT
    // records, it extracts the response bodies and feeds them to the
    // text pipeline. Warc.responses pulls the salvaged prefix's
    // response payloads as ARRAY<BINARY> (the same single parsing loop
    // as the walk), so the full chain — text → WARC framing → gzip
    // member → concatenated shard → member salvage → record salvage →
    // payload slice → stats — runs as ONE scan-stage pass, and the
    // md5 hash-match against DuckDB's digest of the RAW text proves
    // the round trip is byte-exact end to end. Truncated / bit-rotted
    // response members (p265's modes) salvage no response: the row
    // reports -1/'' sentinels, the NULL-never-throw posture in-query.
    Q("p266_warc_extract", Some("""
      SELECT doc_id,
             CAST(CASE WHEN doc_id % 13 = 4 OR doc_id % 17 = 6
                       THEN -1 ELSE length(text) END AS BIGINT) AS n_chars,
             CASE WHEN doc_id % 13 = 4 OR doc_id % 17 = 6
                  THEN '' ELSE md5(text) END AS digest,
             CASE WHEN doc_id % 13 = 4 OR doc_id % 17 = 6
                  THEN '' ELSE substr(text, 1, 16) END AS head
      FROM documents ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.{Gzip, Warc}
      val id = col("doc_id").cast("string")
      val uri = concat(lit("http://ex.com/"), id)
      def rec(tpe: String, payload: org.apache.spark.sql.Column) =
        concat(lit("WARC/1.0\r\n"),
          lit(s"WARC-Type: $tpe\r\n"),
          lit("WARC-Target-URI: "), uri, lit("\r\n"),
          lit("WARC-Date: 2024-01-01T00:00:00Z\r\n"),
          lit("Content-Length: "), length(payload).cast("string"),
          lit("\r\n\r\n"), payload, lit("\r\n\r\n"))
      def memberHex(r: org.apache.spark.sql.Column) = {
        val len = length(r).cast("long")
        concat(lit("1F8B0800"), lit("0000000000FF"),
          lit("01"), storedLen16(len), le16h(lit(65535L) - len),
          hex(r), lit("0000000000000000"))
      }
      val m1 = memberHex(rec("request", concat(lit("GET /"), id)))
      val m2full = memberHex(rec("response", col("text")))
      val m2 = when(col("doc_id") % 13 === 4, substring(m2full, 1, 50))
        .when(col("doc_id") % 17 === 6,
          concat(lit("1E"), substring(m2full, 3, Int.MaxValue)))
        .otherwise(m2full)
      val blob = unhex(concat(m1, m2))
      // try_element_at: salvaged-nothing shards have an EMPTY array
      val body = expr("try_element_at(resp_arr, 1)")
      // CHARACTER semantics on both sides: the extracted payload is
      // BINARY, so decode to UTF-8 before length/substring — DuckDB's
      // length(text)/substr count characters, and a non-ASCII fixture
      // would otherwise silently skew n_chars/head (md5 stays on the raw
      // bytes, byte-exact either way)
      val bodyStr = decode(body, "UTF-8")
      Tables.loadSpread(spark, dir, "documents")
        .withColumn("resp_arr", Warc.responses(Gzip.inflateMembers(blob)))
        .select(col("doc_id"),
          coalesce(length(bodyStr).cast("long"), lit(-1L)).as("n_chars"),
          coalesce(md5(body), lit("")).as("digest"),
          coalesce(substring(bodyStr, 1, 16), lit("")).as("head"))
        .orderBy(col("doc_id"))
    },

    // ---- the 100-TB story END TO END: raw crawl bytes → curated corpus -----
    // One entry composing the whole ingest funnel the component entries
    // prove piecewise: per doc a gzipped WARC shard (request + response
    // members, single-STORED-block, p265's framing) whose response body
    // is a structurally-real HTML page (p85's wrapper) around the text —
    // MIRRORED for doc_id%10==9, which serves doc_id-9's content (how
    // real crawls acquire duplicates). The chain then runs entirely
    // in-engine: member salvage (Gzip.inflateMembers) → record salvage +
    // payload extraction (Warc.responses) → UTF-8 gate (Utf8Walk; docs
    // with doc_id%7==3 carry an overlong '/' + stray continuation byte
    // appended by a hostile/buggy server) → boilerplate strip (p85's
    // block-before-tag regex chain) → lang-ID (TextOps.langId) →
    // exact-dedup canonical election (TextOps.contentHash + min-id per
    // hash). Transport damage (truncated member doc_id%13==4, bit-rot
    // doc_id%17==6) exits the funnel at salvage; byte damage exits at
    // the UTF-8 gate; survivors carry lang/hash/keep_id. The oracle
    // rebuilds every verdict from construction algebra (never parsing
    // bytes) — the hash match proves the full funnel end to end.
    //
    // Scale shape: everything through lang-ID is row-local scan-stage
    // work (inflate/salvage/DFA/regex kernels, zero shuffle); the only
    // shuffles are the mirror self-join (equi on doc_id) and ONE
    // hash-keyed aggregation + equi join-back for canonical election —
    // exactly the two a production funnel pays, both key-partitioned.
    Q("p267_crawl_ingest", Some(crawlIngestOracle)) { (spark, dir) =>
      val enriched = crawlFunnel(
        crawlShard(Tables.loadSpread(spark, dir, "documents")))
      // canonical election: ONE hash-keyed aggregation + equi join-back
      val canon = enriched.where(col("stage") === "ok")
        .groupBy(col("content_hash"))
        .agg(min(col("doc_id")).as("kid"))
      enriched.join(canon, Seq("content_hash"), "left")
        .select(col("doc_id"), col("stage"), col("n_clean"), col("lang"),
          col("content_hash"),
          coalesce(col("kid"), lit(-1L)).as("keep_id"),
          coalesce(col("kid") === col("doc_id"), lit(false)).as("is_canonical"))
        .orderBy(col("doc_id"))
    },

    // ---- zstd frame METADATA census (RFC 8878, no entropy decoding) --------
    // The magic router's modern-crawl completion: current Common Crawl
    // tooling and fresh data lakes ship zstd, and shard triage is a
    // frame-header walk, not a decompress — skippable frames carry an
    // explicit length, frame headers carry window/content sizes, and
    // every block header states its payload size, so the whole census
    // (frames, blocks, declared content, decoder window budget, damage
    // position) costs ZERO decompression. Per doc a structurally-real
    // stream is built in-query: one skippable frame, then a data frame
    // holding the text as 64-byte RAW blocks — single-segment with a
    // 4-byte FCS by default, an explicit window descriptor (2 KiB) for
    // doc_id%6==3, a declared content checksum for doc_id%4==1.
    // Damage classes: doc_id%9==2 cut mid-frame-header (truncation —
    // header never parses), else doc_id%12==7 last block's type
    // bit-rotted to RESERVED (walk salvages every prior block). The
    // oracle derives all eight fields from mode/length algebra alone —
    // the hash match proves magic dispatch, FHD bit decode, window
    // math, FCS, the 3-byte block-header walk, and both damage exits.
    //
    // Scale shape: per-row scan-stage kernel (graft.functions.Zstd),
    // zero shuffle but the output sort.
    Q("p268_zstd_census", Some("""
      WITH d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS l,
                        GREATEST((length(text) + 63) // 64, 1) AS nb,
                        doc_id % 9 = 2 AS wcut,
                        doc_id % 9 <> 2 AND doc_id % 12 = 7 AS rrot,
                        doc_id % 6 = 3 AS windowed,
                        doc_id % 4 = 1 AS chk
                 FROM documents)
      SELECT doc_id,
             CAST(CASE WHEN wcut THEN 0 ELSE 1 END AS BIGINT) AS n_frames,
             CAST(1 AS BIGINT) AS n_skippable,
             CAST(CASE WHEN wcut THEN 0 WHEN rrot THEN nb - 1
                  ELSE nb END AS BIGINT) AS n_blocks,
             CAST(CASE WHEN wcut THEN 0 WHEN rrot THEN 64 * (nb - 1)
                  ELSE l END AS BIGINT) AS raw_bytes,
             CAST(CASE WHEN wcut THEN -1 ELSE l END AS BIGINT)
               AS content_declared,
             CAST(CASE WHEN wcut THEN -1 WHEN windowed THEN 2048
                  ELSE l END AS BIGINT) AS max_window,
             CASE WHEN wcut THEN FALSE ELSE chk END AS has_checksum,
             NOT (wcut OR rrot) AS clean
      FROM d ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.Zstd
      val l = length(col("text")).cast("long")
      // ≥1: an EMPTY document still frames as one empty raw last block (a
      // valid RFC 8878 frame — zero blocks would be malformed, and
      // sequence(0, -1) would emit two bogus descending indices)
      val nb = greatest(expr("(length(text) + 63) div 64"), lit(1L))
      val wcut = col("doc_id") % 9 === 2
      val rrot = col("doc_id") % 9 =!= 2 && col("doc_id") % 12 === 7
      val windowed = col("doc_id") % 6 === 3
      val chk = col("doc_id") % 4 === 1
      // skippable frame: magic 0x184D2A50 LE, LE32 size 8, 8 pad bytes
      val skippableHex = concat(lit("502A4D18"), le32h(lit(8L)),
        lit("GRAFTPAD".getBytes.map(b => f"$b%02X").mkString))
      // FHD: fcs-flag 2 (bits 6-7) | single-segment (bit 5, unless
      // windowed) | checksum (bit 2)
      val fhd = (lit(0x80L)
        + when(windowed, 0L).otherwise(0x20L)
        + when(chk, 4L).otherwise(0L)).cast("long")
      val fhdHex = lpad(hex(fhd), 2, "0")
      // window descriptor 0x08: exponent 1, mantissa 0 -> 2 KiB window
      val wdHex = when(windowed, "08").otherwise(lit(""))
      val headerHex = concat(lit("28B52FFD"), fhdHex, wdHex, le32h(l))
      // 64-byte raw blocks; block header LE24 = size<<3 | type<<1 | last;
      // rrot flips the LAST block's type to reserved (3)
      val blocksHex = array_join(
        transform(sequence(lit(0L), nb - 1L), i => {
          val bsize = least(lit(64L), l - i * 64L)
          val isLast = i === nb - 1L
          val btype = when(rrot && isLast, 3L).otherwise(0L)
          val hdr = shiftleft(bsize, 3) + btype * 2L +
            when(isLast, 1L).otherwise(0L)
          concat(le24h(hdr), hex(col("text").substr(
            (i * 64L + 1L).cast("int"), bsize.cast("int"))))
        }), "")
      val chkHex = when(chk, "00000000").otherwise(lit(""))
      val fullHex = concat(skippableHex, headerHex, blocksHex, chkHex)
      // truncation: cut 6 bytes into the data frame (magic + FHD + one
      // FCS/window byte) -- 32 hex chars of skippable + 12
      val blobHex = when(wcut, substring(fullHex, 1, 44)).otherwise(fullHex)
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), Zstd.frameWalk(unhex(blobHex)).as("z"))
        .select(col("doc_id"),
          col("z.n_frames").as("n_frames"),
          col("z.n_skippable").as("n_skippable"),
          col("z.n_blocks").as("n_blocks"),
          col("z.raw_bytes").as("raw_bytes"),
          col("z.content_declared").as("content_declared"),
          col("z.max_window").as("max_window"),
          col("z.has_checksum").as("has_checksum"),
          col("z.clean").as("clean"))
        .orderBy(col("doc_id"))
    },

    // ---- .warc.zst payload EXTRACTION: REAL zstd decode in the chain -------
    // The modern Common Crawl shard layout — records inside zstd frames
    // (p265/p266's gzip sibling) — decoded by the from-scratch RFC 8878
    // machinery in ZstdDecode (frame walk, block decode, the real
    // FSE/Huffman paths are pinned against zstd-jni ground truth in
    // ZstdDecodeSpec; this entry's in-query-buildable frames use raw +
    // RLE blocks so the oracle stays pure construction algebra). Per
    // doc: a skippable frame (the dictionary-slot posture), then ONE
    // data frame holding a request record and a response record whose
    // payload is text plus a run of `1 + doc_id % 97` pad bytes — the
    // run travels as a genuine RLE block (1 stored byte regenerating
    // `run`), the rest as 64-byte raw blocks, FCS declared and checked
    // by the decoder. Chain: ZstdDecode.decompressFrames →
    // Warc.responses → payload slice → md5; the hash match against
    // DuckDB's digest of text||pad proves the decode round-trip
    // byte-exact end to end. Damage lanes: doc_id%13==4 cuts the frame
    // mid-header (truncated), doc_id%17==6 flips the RLE block's type
    // to reserved — both kill the frame at decode (NULL → sentinels),
    // the never-throw posture. ONE codegen'd scan-stage pass, zero
    // shuffle: a 100 TB .warc.zst extract is a pure scan.
    Q("p269_zst_warc_extract", Some("""
      WITH d AS (SELECT doc_id, text,
                        1 + doc_id % 97 AS run,
                        doc_id % 13 = 4 OR doc_id % 17 = 6 AS damaged
                 FROM documents)
      SELECT doc_id,
             CAST(CASE WHEN damaged THEN -1
                  ELSE length(text) + run END AS BIGINT) AS n_chars,
             CASE WHEN damaged THEN ''
                  ELSE md5(text || repeat('p', CAST(run AS INTEGER))) END
               AS digest,
             CASE WHEN damaged THEN '' ELSE substr(text, 1, 16) END AS head
      FROM d ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.{Warc, ZstdDecode}
      val id = col("doc_id").cast("string")
      val uri = concat(lit("http://ex.com/"), id)
      def recHdr(tpe: String, clen: org.apache.spark.sql.Column) = concat(
        lit("WARC/1.0\r\n"), lit(s"WARC-Type: $tpe\r\n"),
        lit("WARC-Target-URI: "), uri, lit("\r\n"),
        lit("WARC-Date: 2024-01-01T00:00:00Z\r\n"),
        lit("Content-Length: "), clen.cast("string"), lit("\r\n\r\n"))
      val reqPayload = concat(lit("GET /"), id)
      val reqRec = concat(recHdr("request", length(reqPayload).cast("long")),
        reqPayload, lit("\r\n\r\n"))
      // response record = headers + text (raw blocks) + pad run (the RLE
      // block) + record trailer (final raw block)
      val respHead = concat(
        recHdr("response", length(col("text")).cast("long") + col("run")),
        col("text"))
      val skippableHex = concat(lit("502A4D18"), le32h(lit(8L)),
        lit("GRAFTPAD".getBytes.map(b => f"$b%02X").mkString))
      val df0 = Tables.loadSpread(spark, dir, "documents")
        .withColumn("run", (col("doc_id") % 97 + 1).cast("long"))
        .withColumn("part1", concat(reqRec, respHead))
        .withColumn("l1", length(col("part1")).cast("long"))
        .withColumn("nb1", expr("(l1 + 63) div 64"))
      val fcs = col("l1") + col("run") + lit(4L)
      val headerHex = concat(lit("28B52FFD"), lit("A0"), le32h(fcs))
      val blocksHex = array_join(
        transform(sequence(lit(0L), col("nb1") - 1L), i => {
          val bsize = least(lit(64L), col("l1") - i * 64L)
          concat(le24h(shiftleft(bsize, 3)), // raw, not last
            hex(col("part1").substr((i * 64L + 1L).cast("int"), bsize.cast("int"))))
        }), "")
      // RLE block: header size = RUN (regenerated length), one stored 'p';
      // the %17==6 lane flips its type to reserved(3) — frame-killing
      val rleType = when(col("doc_id") % 17 === 6, 3L).otherwise(1L)
      val rleHex = concat(le24h(shiftleft(col("run"), 3) + rleType * 2L), lit("70"))
      val tailHex = concat(le24h(lit((4L << 3) | 1L)), lit("0D0A0D0A"))
      val fullHex = concat(skippableHex, headerHex, blocksHex, rleHex, tailHex)
      // %13==4 lane: cut 12 bytes into the DATA frame (past the skippable)
      val blobHex = when(col("doc_id") % 13 === 4, substring(fullHex, 1, 56))
        .otherwise(fullHex)
      val body = expr("try_element_at(resp_arr, 1)")
      val bodyStr = decode(body, "UTF-8")
      df0
        .withColumn("resp_arr",
          Warc.responses(ZstdDecode.decompressFrames(unhex(blobHex))))
        .select(col("doc_id"),
          coalesce(length(bodyStr).cast("long"), lit(-1L)).as("n_chars"),
          coalesce(md5(body), lit("")).as("digest"),
          coalesce(substring(bodyStr, 1, 16), lit("")).as("head"))
        .orderBy(col("doc_id"))
    },

    // ---- STREAMING crawl ingest: p267's funnel as its deployment shape -----
    // Shard files arrive per micro-batch; each batch runs the row-local
    // funnel with batch semantics, appends verdict rows, and folds the
    // (content_hash → min doc_id) canonical election into hash-bucketed
    // VERSIONED state (the p163 commit discipline — touched-bucket
    // rewrites, pointer flip after commit, superseded-version GC). The
    // oracle is p267's SQL TEXT VERBATIM: the driver hashing both
    // results against it is the batch≡stream equivalence proof (the
    // p152/p163 pattern applied to the whole 100-TB ingest story).
    // StreamingSpec drives the multi-batch semantics adversarially
    // (cross-batch duplicate election on a planted fixture).
    Q("p270_stream_crawl_ingest", Some(crawlIngestOracle)) { (spark, dir) =>
      val root = sinkDir(s"p270_${Integer.toHexString(dir.hashCode)}") +
        s"/${System.nanoTime()}"
      graft.streaming.StreamingOps.crawlIngest(spark, dir, root)
        .orderBy(col("doc_id"))
    },

    // ---- DICTIONARY .warc.zst: the full modern Common Crawl layout ---------
    // p269's sibling with the shard DICTIONARY in play (RFC 8878 §5):
    // the dictionary travels zstd-COMPRESSED in a leading 0x184D2A5D
    // skippable frame (the published .warc.zst convention), and EVERY
    // record frame (a) names the dictionary's ID in its frame header
    // (4-byte Dictionary_ID field — ZstdDecode.ccFrames must bind the
    // dict and match IDs), and (b) OPENS with a hand-derived compressed
    // block whose single sequence resolves through the dictionary's
    // rep1 INTO the dictionary content — regenerating the shared
    // "WARC/1.0\r\nWARC-Type: response\r\n" record boilerplate from 10
    // block bytes, which is exactly what CC shard dictionaries exist to
    // do. The rest of the record is per-doc (raw 64-byte blocks + the
    // RLE pad run, as p269), so the oracle stays pure construction
    // algebra; the md5 match proves dict-parse + ID-match + prefix-copy
    // + decode byte-exact end to end — a wrong prefix byte would break
    // the WARC header parse or the digest. Damage lanes: %13==4 cuts
    // the record frame mid-header; %17==6 stamps a WRONG Dictionary_ID
    // (the frame must NULL on ID disagreement, never wrong-decode);
    // %11==5 drops the dictionary frame entirely (a dict-naming frame
    // without one must NULL). ONE codegen'd scan-stage pass, zero
    // shuffle: same 100 TB posture as p269.
    Q("p271_zst_dict_shard", Some("""
      WITH d AS (SELECT doc_id, text,
                        1 + doc_id % 97 AS run,
                        doc_id % 13 = 4 OR doc_id % 17 = 6 OR doc_id % 11 = 5
                          AS damaged
                 FROM documents)
      SELECT doc_id,
             CAST(CASE WHEN damaged THEN -1
                  ELSE length(text) + run END AS BIGINT) AS n_chars,
             CASE WHEN damaged THEN ''
                  ELSE md5(text || repeat('p', CAST(run AS INTEGER))) END
               AS digest,
             CASE WHEN damaged THEN '' ELSE substr(text, 1, 16) END AS head
      FROM d ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.{Warc, ZstdDecode}
      val id = col("doc_id").cast("string")
      val run = (col("doc_id") % 97 + 1).cast("long")
      // the record AFTER the dictionary-served 31-byte prefix: remaining
      // headers + text travel as per-doc raw blocks, the pad run as RLE
      val rest = concat(
        lit("WARC-Target-URI: http://ex.com/"), id, lit("\r\n"),
        lit("WARC-Date: 2024-01-01T00:00:00Z\r\n"),
        lit("Content-Length: "),
        (length(col("text")).cast("long") + run).cast("string"),
        lit("\r\n\r\n"), col("text"))
      val df0 = Tables.loadSpread(spark, dir, "documents")
        .withColumn("run", run)
        .withColumn("rest", rest)
        .withColumn("lr", length(col("rest")).cast("long"))
        .withColumn("nbr", expr("(lr + 63) div 64"))
      // frame content = 31 (dict-served prefix) + rest + run + trailer 4
      val fcs = lit(31L) + col("lr") + col("run") + lit(4L)
      // FHD 0xA3: fcs-flag 2 | single-segment | dict-flag 3 (4-byte ID);
      // the %17 lane stamps an ID no dictionary declares
      val idHex = when(col("doc_id") % 17 === 6, lit("FFFFFFFF"))
        .otherwise(lit(ZstShardDict.dictIdHex))
      val headerHex = concat(lit("28B52FFD"), lit("A3"), idHex, le32h(fcs))
      val blocksHex = array_join(
        transform(sequence(lit(0L), col("nbr") - 1L), i => {
          val bsize = least(lit(64L), col("lr") - i * 64L)
          concat(le24h(shiftleft(bsize, 3)), // raw, not last
            hex(col("rest").substr((i * 64L + 1L).cast("int"), bsize.cast("int"))))
        }), "")
      val rleHex = concat(le24h(shiftleft(col("run"), 3) + 2L), lit("70"))
      val tailHex = concat(le24h(lit((4L << 3) | 1L)), lit("0D0A0D0A"))
      val noDict = col("doc_id") % 11 === 5
      val skipHex = when(noDict, lit("")).otherwise(lit(ZstShardDict.skippableHex))
      val fullHex = concat(skipHex, headerHex, lit(ZstShardDict.block1Hex),
        blocksHex, rleHex, tailHex)
      // %13==4: cut 12 bytes into the RECORD frame (past the dict frame)
      val cutChars = (when(noDict, lit(0L))
        .otherwise(lit(ZstShardDict.skippableHex.length.toLong)) + 24L).cast("int")
      val blobHex = when(col("doc_id") % 13 === 4, fullHex.substr(lit(1), cutChars))
        .otherwise(fullHex)
      val body = expr("try_element_at(resp_arr, 1)")
      val bodyStr = decode(body, "UTF-8")
      df0
        .withColumn("resp_arr",
          Warc.responses(ZstdDecode.ccFrames(unhex(blobHex))))
        .select(col("doc_id"),
          coalesce(length(bodyStr).cast("long"), lit(-1L)).as("n_chars"),
          coalesce(md5(body), lit("")).as("digest"),
          coalesce(substring(bodyStr, 1, 16), lit("")).as("head"))
        .orderBy(col("doc_id"))
    },

    // ---- SEEKABLE zstd: random-access frame extraction (the SPLIT path) ----
    // The zstd contrib seekable format: frames tiled by a trailing
    // 0x184D2A5E skippable SEEK TABLE (per-frame compressed/decompressed
    // sizes + 9-byte footer). This is the 100-TB splitting story — Spark
    // cannot normally split a zstd shard, but a seek table turns one
    // file into thousands of independent decode units: each task reads
    // the footer once and decodes ONLY its own frames, which is exactly
    // what this entry exercises per row — ZstdDecode.seekExtract decodes
    // frame (doc_id % K) ALONE out of a K-frame shard, cost independent
    // of where the frame sits. Per doc the text is tiled into 192-byte
    // chunks, one single-segment raw-block frame each (construction
    // algebra, so the oracle recomputes the chunk by substring); the
    // seek-table walk validates footer magic, reserved descriptor bits,
    // declared frame count, and that the entry sizes TILE the data
    // region exactly. Damage lanes: %13==4 flips a footer-magic byte,
    // %17==6 declares one frame too many — both kill the table (NULL →
    // sentinels), never a wrong extraction. ONE codegen'd scan pass.
    Q("p272_zst_seek_split", Some("""
      WITH d AS (SELECT doc_id, text, length(text) AS l,
                        greatest(CAST((length(text) + 191) // 192 AS BIGINT),
                                 1) AS k
                 FROM documents),
      d2 AS (SELECT *, CAST(doc_id % k AS INTEGER) AS idx,
                    doc_id % 13 = 4 OR doc_id % 17 = 6 AS damaged
             FROM d)
      SELECT doc_id,
             CAST(CASE WHEN damaged THEN -1 ELSE k END AS BIGINT) AS n_frames,
             CAST(CASE WHEN damaged THEN -1 ELSE l END AS BIGINT) AS d_total,
             CASE WHEN damaged THEN ''
                  ELSE md5(substr(text, idx * 192 + 1, 192)) END AS digest,
             CASE WHEN damaged THEN ''
                  ELSE substr(text, idx * 192 + 1, 12) END AS head
      FROM d2 ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.ZstdDecode
      val df0 = Tables.loadSpread(spark, dir, "documents")
        .withColumn("l", length(col("text")).cast("long"))
        .withColumn("k", greatest(expr("(l + 191) div 192"), lit(1L)))
        .withColumn("idx", col("doc_id") % col("k"))
      // frame i: magic + FHD 0x20 (single-segment, 1-byte FCS ≤ 255) +
      // FCS + one raw last block of the 192-byte chunk
      val framesHex = array_join(
        transform(sequence(lit(0L), col("k") - 1L), i => {
          val len = least(lit(192L), col("l") - i * 192L)
          concat(lit("28B52FFD"), lit("20"), lpad(hex(len), 2, "0"),
            le24h(shiftleft(len, 3) + 1L),
            hex(col("text").substr((i * 192L + 1L).cast("int"), len.cast("int"))))
        }), "")
      val entriesHex = array_join(
        transform(sequence(lit(0L), col("k") - 1L), i => {
          val len = least(lit(192L), col("l") - i * 192L)
          concat(le32h(len + 9L), le32h(len))
        }), "")
      val declaredK = when(col("doc_id") % 17 === 6, col("k") + 1L)
        .otherwise(col("k"))
      val footerMagic = when(col("doc_id") % 13 === 4, lit("B1EA928E"))
        .otherwise(lit("B1EA928F"))
      val tableHex = concat(lit("5E2A4D18"), le32h(col("k") * 8L + 9L),
        entriesHex, le32h(declaredK), lit("00"), footerMagic)
      val blob = unhex(concat(framesHex, tableHex))
      val partStr = decode(col("part"), "UTF-8")
      df0
        .withColumn("tbl", ZstdDecode.seekTable(blob))
        .withColumn("part", ZstdDecode.seekExtract(blob, col("idx")))
        .select(col("doc_id"),
          coalesce(size(col("tbl")).cast("long"), lit(-1L)).as("n_frames"),
          coalesce(expr(
            "aggregate(tbl, CAST(0 AS BIGINT), (acc, e) -> acc + e.d_size)"),
            lit(-1L)).as("d_total"),
          coalesce(md5(col("part")), lit("")).as("digest"),
          coalesce(substring(partStr, 1, 12), lit("")).as("head"))
        .orderBy(col("doc_id"))
    },

    // ---- p273: from-scratch BASELINE JPEG decode (r18) ----------------------
    // The last codec in the lineage off a JDK library: graft.functions.Jpeg
    // is a T.81 SOF0 decoder (marker walk, canonical Huffman with byte
    // stuffing + RSTn restarts, dequant, separable IDCT, YCbCr) written
    // from the public spec. JPEG IDCT rounding is implementation-defined,
    // so the ORACLE-EXACT entry uses construction algebra where every
    // conforming IDCT agrees: per doc a DC-only grayscale JPEG (flat 8×8
    // blocks, all-ones quant, Annex K tables, restart markers on %5==0
    // lanes) whose decode is exactly the constructed grid — the oracle
    // recomputes grid sums/histograms in SQL. Damage lanes (%13==4
    // truncation, %17==6 progressive-SOF flip) must yield NULL → -1.
    // Natural-image fidelity vs ImageIO is pinned in MultimodalSpec with
    // a pixel tolerance. One scan, zero shuffles, per-row codegen kernels
    // — the 100 TB shape.
    Q("p273_jpeg_dc_decode", Some("""
      WITH d AS (SELECT doc_id,
                        1 + doc_id % 4 AS cols, 1 + doc_id % 3 AS rows,
                        (doc_id % 13 = 4 OR doc_id % 17 = 6) AS damaged
                 FROM documents),
      g AS (SELECT d.doc_id,
                   ((d.doc_id * 31 + r1.by * 8 + r2.bx * 5) % 256) AS v
            FROM d, range(0, 3) r1(by), range(0, 4) r2(bx)
            WHERE r1.by < d.rows AND r2.bx < d.cols),
      s AS (SELECT doc_id, 64 * SUM(v) AS sr,
                   64 * SUM(CASE WHEN v < 64 THEN 1 ELSE 0 END) AS c0,
                   64 * SUM(CASE WHEN v >= 64 AND v < 128 THEN 1 ELSE 0 END) AS c1,
                   64 * SUM(CASE WHEN v >= 128 AND v < 192 THEN 1 ELSE 0 END) AS c2,
                   64 * SUM(CASE WHEN v >= 192 THEN 1 ELSE 0 END) AS c3
            FROM g GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(CASE WHEN damaged THEN -1 ELSE d.cols * 8 END AS BIGINT) AS w,
             CAST(CASE WHEN damaged THEN -1 ELSE d.rows * 8 END AS BIGINT) AS h,
             CAST(CASE WHEN damaged THEN -1 ELSE s.sr END AS BIGINT) AS sum_r,
             CAST(CASE WHEN damaged THEN -1 ELSE s.c0 END AS BIGINT) AS h0,
             CAST(CASE WHEN damaged THEN -1 ELSE s.c1 END AS BIGINT) AS h1,
             CAST(CASE WHEN damaged THEN -1 ELSE s.c2 END AS BIGINT) AS h2,
             CAST(CASE WHEN damaged THEN -1 ELSE s.c3 END AS BIGINT) AS h3
      FROM d JOIN s USING (doc_id) ORDER BY d.doc_id""")) { (spark, dir) =>
      import graft.functions.{JpegChannelStats, JpegFlatFixture}
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"))
        .withColumn("stats", JpegChannelStats(JpegFlatFixture(col("doc_id"))))
        .select(col("doc_id"),
          coalesce(col("stats").getItem(0), lit(-1L)).as("w"),
          coalesce(col("stats").getItem(1), lit(-1L)).as("h"),
          coalesce(col("stats").getItem(2), lit(-1L)).as("sum_r"),
          coalesce(col("stats").getItem(5), lit(-1L)).as("h0"),
          coalesce(col("stats").getItem(6), lit(-1L)).as("h1"),
          coalesce(col("stats").getItem(7), lit(-1L)).as("h2"),
          coalesce(col("stats").getItem(8), lit(-1L)).as("h3"))
        .orderBy(col("doc_id"))
    },

    // ---- p274: from-scratch PROGRESSIVE JPEG decode (r19) -------------------
    // SOF2 per T.81 Annex G: spectral selection + successive
    // approximation. The oracle-exact entry constructs a four-scan
    // progressive stream per doc (DC first at Al=1, AC first as EOBn
    // runs, DC refinement carrying the real low bit — quant[0]=8 keeps
    // it — and AC refinement), with RSTn restarts on %5==0 lanes, and
    // decodes it with the same from-scratch path real crawl JPEGs take.
    // DC-only construction algebra keeps the match EXACT (every
    // conforming IDCT agrees on flat blocks); natural progressive
    // images are pinned against ImageIO in MultimodalSpec. Damage
    // lanes: %13==4 truncation and %11==7 cut EOI (a progressive frame
    // is only complete at EOI) → NULL → -1. One scan, zero shuffles.
    Q("p274_jpeg_progressive", Some("""
      WITH d AS (SELECT doc_id,
                        1 + doc_id % 4 AS cols, 1 + doc_id % 3 AS rows,
                        (doc_id % 13 = 4 OR doc_id % 11 = 7) AS damaged
                 FROM documents),
      g AS (SELECT d.doc_id,
                   ((d.doc_id * 29 + r1.by * 8 + r2.bx * 7) % 256) AS v
            FROM d, range(0, 3) r1(by), range(0, 4) r2(bx)
            WHERE r1.by < d.rows AND r2.bx < d.cols),
      s AS (SELECT doc_id, 64 * SUM(v) AS sr,
                   64 * SUM(CASE WHEN v < 64 THEN 1 ELSE 0 END) AS c0,
                   64 * SUM(CASE WHEN v >= 64 AND v < 128 THEN 1 ELSE 0 END) AS c1,
                   64 * SUM(CASE WHEN v >= 128 AND v < 192 THEN 1 ELSE 0 END) AS c2,
                   64 * SUM(CASE WHEN v >= 192 THEN 1 ELSE 0 END) AS c3
            FROM g GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(CASE WHEN damaged THEN -1 ELSE d.cols * 8 END AS BIGINT) AS w,
             CAST(CASE WHEN damaged THEN -1 ELSE d.rows * 8 END AS BIGINT) AS h,
             CAST(CASE WHEN damaged THEN -1 ELSE s.sr END AS BIGINT) AS sum_r,
             CAST(CASE WHEN damaged THEN -1 ELSE s.c0 END AS BIGINT) AS h0,
             CAST(CASE WHEN damaged THEN -1 ELSE s.c1 END AS BIGINT) AS h1,
             CAST(CASE WHEN damaged THEN -1 ELSE s.c2 END AS BIGINT) AS h2,
             CAST(CASE WHEN damaged THEN -1 ELSE s.c3 END AS BIGINT) AS h3
      FROM d JOIN s USING (doc_id) ORDER BY d.doc_id""")) { (spark, dir) =>
      import graft.functions.{JpegChannelStats, JpegProgFixture}
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"))
        .withColumn("stats", JpegChannelStats(JpegProgFixture(col("doc_id"))))
        .select(col("doc_id"),
          coalesce(col("stats").getItem(0), lit(-1L)).as("w"),
          coalesce(col("stats").getItem(1), lit(-1L)).as("h"),
          coalesce(col("stats").getItem(2), lit(-1L)).as("sum_r"),
          coalesce(col("stats").getItem(5), lit(-1L)).as("h0"),
          coalesce(col("stats").getItem(6), lit(-1L)).as("h1"),
          coalesce(col("stats").getItem(7), lit(-1L)).as("h2"),
          coalesce(col("stats").getItem(8), lit(-1L)).as("h3"))
        .orderBy(col("doc_id"))
    },

    // ---- p275: seekable-zstd WRITER (r19) -----------------------------------
    // The write half of the split story (p272 reads): a corpus re-shard
    // groups docs into seekable-zstd shards — one STORE-mode frame per
    // doc (raw blocks + RLE for byte runs ≥ 32) + the contrib-spec
    // 0x184D2A5E seek table with per-frame XXH64 checksums — then reads
    // its own output back through the r17 reader (table parse + one
    // checksum-verified random-access extraction per shard). The oracle
    // recomputes the ENTIRE frame algebra in SQL: per-doc content is
    // constructed (char prefix + a '' run on %3 lanes, empty on
    // %11=5 lanes) so the raw/RLE block split — and therefore every
    // compressed size, the table size, and the blob size — is exact
    // arithmetic. ZstdSeekSpec round-trips the same writer through
    // zstd-jni as the independent-decoder proof. Scale: construction
    // and re-read are scan-stage kernels; ONE shard-keyed agg.
    Q("p275_zstd_seek_write", Some("""
      WITH d AS (SELECT doc_id, doc_id % 8 AS shard,
             CASE WHEN doc_id % 11 = 5 THEN ''
                  ELSE substr(text, 1, CAST(doc_id % 7 + 1 AS INT)) ||
                       CASE WHEN doc_id % 3 = 0
                            THEN repeat(chr(7), CAST(40 + doc_id % 20 AS INT))
                            ELSE '' END END AS content,
             CASE WHEN doc_id % 11 = 5 THEN 0
                  ELSE octet_length(encode(substr(text, 1, CAST(doc_id % 7 + 1 AS INT))))
                  END AS l1,
             CASE WHEN doc_id % 11 <> 5 AND doc_id % 3 = 0
                  THEN 40 + doc_id % 20 ELSE 0 END AS rl
           FROM documents),
      f AS (SELECT shard, doc_id, content, l1 + rl AS dsize,
             6 + CASE WHEN l1 > 0 THEN 3 + l1 ELSE 0 END
               + CASE WHEN rl > 0 THEN 4 ELSE 0 END
               + CASE WHEN l1 + rl = 0 THEN 3 ELSE 0 END AS csize
           FROM d),
      s AS (SELECT shard, COUNT(*) AS n, SUM(dsize) AS d_total,
                   SUM(csize) AS c_total
            FROM f GROUP BY shard),
      pick AS (SELECT shard, content FROM (
            SELECT f.shard, f.content,
                   ROW_NUMBER() OVER (PARTITION BY f.shard
                                      ORDER BY f.doc_id) - 1 AS rn,
                   s.n FROM f JOIN s USING (shard))
          WHERE rn = shard % n)
      SELECT s.shard, CAST(s.n AS BIGINT) AS n_frames,
             CAST(s.c_total AS BIGINT) AS c_total,
             CAST(s.d_total AS BIGINT) AS d_total,
             CAST(s.c_total + 17 + 12 * s.n AS BIGINT) AS blob_bytes,
             md5(pick.content) AS digest,
             substr(pick.content, 1, 12) AS head
      FROM s JOIN pick USING (shard) ORDER BY s.shard""")) { (spark, dir) =>
      import graft.functions.{ZstdDecode, ZstdSeekWrite}
      // per-doc content: a short char prefix (raw block) + a BEL-byte
      // run on %3 lanes (RLE block; chr(7) cannot appear in document
      // text, so the writer's run detection never merges across the
      // boundary and the oracle's block algebra stays exact); empty on
      // %11=5 lanes (the empty-frame shape)
      val docs = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
          when(col("doc_id") % 11 === 5, lit("")).otherwise(concat(
            expr("substring(text, 1, CAST(doc_id % 7 + 1 AS INT))"),
            when(col("doc_id") % 3 === 0,
              expr("repeat(chr(7), CAST(40 + doc_id % 20 AS INT))"))
              .otherwise(lit("")))).as("content"))
      val shards = docs
        .select(col("shard"), col("doc_id"),
          struct(col("doc_id"), encode(col("content"), "UTF-8").as("part"),
            col("content")).as("e"))
        .groupBy(col("shard"))
        .agg(sort_array(collect_list(col("e"))).as("es"))
        .withColumn("blob",
          ZstdSeekWrite.build(expr("transform(es, x -> x.part)")))
        .withColumn("tbl", ZstdDecode.seekTable(col("blob")))
        .withColumn("n", size(col("tbl")))
        .withColumn("k", pmod(col("shard"), col("n")).cast("int"))
      shards.select(col("shard"),
          col("n").cast("long").as("n_frames"),
          expr("aggregate(tbl, CAST(0 AS BIGINT), (a, e) -> a + e.c_size)")
            .as("c_total"),
          expr("aggregate(tbl, CAST(0 AS BIGINT), (a, e) -> a + e.d_size)")
            .as("d_total"),
          length(col("blob")).cast("long").as("blob_bytes"),
          md5(ZstdDecode.seekExtract(col("blob"), col("k"))).as("digest"),
          substring(decode(ZstdDecode.seekExtract(col("blob"), col("k")),
            "UTF-8"), 1, 12).as("head"))
        .orderBy(col("shard"))
    }
  )

  /** p267's oracle, shared VERBATIM by the streaming deployment entry
    * (p270): the driver hashing both entries' results against the same
    * SQL text is the batch≡stream equivalence proof (the p152/p163
    * pattern applied to the whole crawl funnel). */
  private[graft] def crawlIngestOracle: String = {
      val wsClean = raw"string_split_regex(lower(clean), '\s+')"
      val names = graft.ops.TextOps.langProfiles.map(_._1)
      val scoreSql = names.map(l =>
        s"CAST(${TextSql.langScore(wsClean, l)} AS BIGINT) AS s_$l")
        .mkString(", ")
      s"""
      WITH d0 AS (SELECT doc_id,
                         CASE WHEN doc_id % 10 = 9 THEN doc_id - 9
                              ELSE doc_id END AS src_id
                  FROM documents),
      d1 AS (SELECT d0.doc_id, m.text AS body,
                    (d0.doc_id % 13 = 4 OR d0.doc_id % 17 = 6) AS wfail,
                    NOT (d0.doc_id % 13 = 4 OR d0.doc_id % 17 = 6)
                      AND d0.doc_id % 7 = 3 AS ufail
             FROM d0 LEFT JOIN documents m ON m.doc_id = d0.src_id),
      okc AS (SELECT doc_id, 'Hello' || chr(10) || body AS clean
              FROM d1 WHERE NOT wfail AND NOT ufail),
      oks AS (SELECT doc_id, clean, $scoreSql,
                     md5(trim(regexp_replace(lower(clean), '\\s+', ' ', 'g')))
                       AS content_hash
              FROM okc),
      canon AS (SELECT content_hash, min(doc_id) AS keep_id
                FROM oks GROUP BY 1)
      SELECT d1.doc_id,
             CASE WHEN wfail THEN 'salvaged_none'
                  WHEN ufail THEN 'invalid_utf8' ELSE 'ok' END AS stage,
             CAST(CASE WHEN wfail OR ufail THEN -1
                  ELSE length(body) + 6 END AS BIGINT) AS n_clean,
             CASE WHEN wfail OR ufail THEN ''
                  ELSE ${TextSql.langCase(l => s"s_$l")} END AS lang,
             COALESCE(oks.content_hash, '') AS content_hash,
             CAST(COALESCE(canon.keep_id, -1) AS BIGINT) AS keep_id,
             COALESCE(canon.keep_id = d1.doc_id, FALSE) AS is_canonical
      FROM d1 LEFT JOIN oks ON oks.doc_id = d1.doc_id
              LEFT JOIN canon ON canon.content_hash = oks.content_hash
      ORDER BY d1.doc_id"""
  }

  /** Shard CONSTRUCTION (fixture byte algebra, not funnel work): per doc
    * a gzipped WARC shard — request + response members, single-STORED-
    * block gzip framing — whose response body is a structurally-real
    * HTML page around the text, MIRRORED for doc_id%10==9 (serves
    * doc_id-9's content — how real crawls acquire duplicates), with
    * transport damage (truncated member %13==4, bit-rot %17==6) and
    * byte damage (overlong-'/' + stray continuation %7==3) planted.
    * Returns (doc_id, blob): the bytes a crawler would hand the funnel.
    */
  private[graft] def crawlShard(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // mirror join: %10==9 serves doc_id-9's content under its own URI
    val served = docs
      .withColumn("src_id", when(col("doc_id") % 10 === 9,
        col("doc_id") - 9).otherwise(col("doc_id")))
      .join(docs.select(col("doc_id").as("m_id"), col("text").as("m_text")),
        col("src_id") === col("m_id"), "left")
      .select(col("doc_id"), col("m_text").as("body"))
    val id = col("doc_id").cast("string")
    val uri = concat(lit("http://ex.com/"), id)
    val html = concat(
      lit("<html><head><title>T"), id,
      lit("</title><style>p{color:red}</style></head>"),
      lit("<body><h1>Hello</h1>\n<p>"), col("body"),
      lit("</p><script>var x=1;</script><!-- crawler note --></body></html>"))
    // hex-level record builder so the utf8-damage mode can splice raw
    // invalid bytes into the payload (string concat cannot carry them)
    val ufail = col("doc_id") % 13 =!= 4 && col("doc_id") % 17 =!= 6 &&
      col("doc_id") % 7 === 3
    val payloadHex = when(ufail, concat(hex(html), lit("C0AF80")))
      .otherwise(hex(html))
    val payloadLen = when(ufail, length(html) + 3).otherwise(length(html))
      .cast("long")
    def headStr(tpe: String, plen: org.apache.spark.sql.Column) = concat(
      lit(s"WARC/1.0\r\nWARC-Type: $tpe\r\nWARC-Target-URI: "), uri,
      lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: "),
      plen.cast("string"), lit("\r\n\r\n"))
    def memberOfHex(recHex: org.apache.spark.sql.Column,
        recLen: org.apache.spark.sql.Column) =
      concat(lit("1F8B0800"), lit("0000000000FF"),
        lit("01"), storedLen16(recLen), le16h(lit(65535L) - recLen),
        recHex, lit("0000000000000000"))
    val req = concat(headStr("request", length(concat(lit("GET /"), id))),
      lit("GET /"), id, lit("\r\n\r\n"))
    val m1 = memberOfHex(hex(req), length(req).cast("long"))
    val respHead = headStr("response", payloadLen)
    val m2full = memberOfHex(
      concat(hex(respHead), payloadHex, hex(lit("\r\n\r\n"))),
      length(respHead).cast("long") + payloadLen + 4L)
    val m2 = when(col("doc_id") % 13 === 4, substring(m2full, 1, 50))
      .when(col("doc_id") % 17 === 6,
        concat(lit("1E"), substring(m2full, 3, Int.MaxValue)))
      .otherwise(m2full)
    served.select(col("doc_id"), unhex(concat(m1, m2)).as("blob"))
  }

  /** The ROW-LOCAL funnel: member salvage → record salvage + payload
    * extraction → UTF-8 gate → boilerplate strip → lang-ID → content
    * hash. Every stage is a scan-stage expression over (doc_id, blob) —
    * zero shuffle — which is exactly why the STREAMING deployment
    * (p270) can run it per micro-batch with batch semantics and fold
    * only the tiny (hash, min-id) election into state. Returns
    * (doc_id, stage, n_clean, lang, content_hash). */
  private[graft] def crawlFunnel(
      shard: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.{Gzip, Utf8Walk, Warc}
    import graft.ops.TextOps
    val staged = shard
      .withColumn("resp_arr", Warc.responses(Gzip.inflateMembers(col("blob"))))
      .withColumn("resp", expr("try_element_at(resp_arr, 1)"))
      .withColumn("u", Utf8Walk.walk(col("resp")))
      .withColumn("stage",
        when(col("resp").isNull, "salvaged_none")
          .when(col("u.n_invalid") > 0 || col("u.truncated"), "invalid_utf8")
          .otherwise("ok"))
    // boilerplate strip (p85's chain), lang, dedup key — ok rows only
    val pageStr = decode(col("resp"), "UTF-8")
    val title = regexp_extract(pageStr, "<title>(.*?)</title>", 1)
    val noBlocks = regexp_replace(regexp_replace(pageStr,
      "<(script|style)>.*?</\\1>", ""), "<!--.*?-->", "")
    val strippedAll = trim(regexp_replace(noBlocks, "<[^>]*>", ""))
    val cleanCol = strippedAll.substr(length(title) + 1, length(strippedAll))
    staged.withColumn("clean",
        when(col("stage") === "ok", cleanCol))
      .select(col("doc_id"), col("stage"),
        when(col("stage") === "ok", length(col("clean")))
          .otherwise(lit(-1)).cast("long").as("n_clean"),
        when(col("stage") === "ok", TextOps.langId(col("clean")))
          .otherwise(lit("")).as("lang"),
        when(col("stage") === "ok", TextOps.contentHash(col("clean")))
          .otherwise(lit("")).as("content_hash"))
  }

  /** Structurally-real ISO-BMFF MP4 built in-query: ftyp, then moov
    * holding a 108-byte v0 mvhd (timescale = 600 + (doc_id%10)·100,
    * duration = 1000 + (doc_id·37) % 100000) and `1 + doc_id % 3`
    * trak boxes, each a 92-byte v0 tkhd with track dims
    * (64 + 16·((doc_id+i)%5)) × (48 + 16·((doc_id+2i)%4)) as 16.16
    * fixed point. All sizes big-endian per ISO 14496-12. Payloads for
    * doc_id % 11 == 7 are truncated 20 bytes into moov — a real
    * mid-crawl truncation the parser must map to NULL.
    */
  private def mp4Blob: org.apache.spark.sql.Column = {
    def be32h(x: org.apache.spark.sql.Column) =
      lpad(hex(x.cast("long")), 8, "0")
    def be16h(x: org.apache.spark.sql.Column) =
      lpad(hex(x.cast("long")), 4, "0")
    val matrixHex = "00010000" + "00000000" * 3 + "00010000" +
      "00000000" * 3 + "40000000"
    val nTracks = (lit(1L) + col("doc_id") % 3).cast("int")
    val timescale = lit(600L) + (col("doc_id") % 10) * 100L
    val duration = lit(1000L) + (col("doc_id") * 37) % 100000L
    val mvhd = concat(
      be32h(lit(108L)), lit("6D766864"), // size, 'mvhd'
      lit("00000000"), // v0 + flags
      lit("00000000"), lit("00000000"), // ctime, mtime
      be32h(timescale), be32h(duration),
      lit("00010000"), be16h(lit(0x0100L)), be16h(lit(0L)), // rate, vol, rsvd
      lit("00000000" * 2), // reserved 8
      lit(matrixHex), lit("00000000" * 6), // matrix, predefined
      be32h(nTracks + 1)) // next_track_id
    def tkhd(i: Int) = {
      val w = lit(64L) + ((col("doc_id") + i) % 5) * 16L
      val h = lit(48L) + ((col("doc_id") + 2 * i) % 4) * 16L
      concat(
        be32h(lit(100L)), lit("7472616B"), // trak box, size 8 + 92
        be32h(lit(92L)), lit("746B6864"), // tkhd
        lit("00000007"), // v0 + enabled flags
        lit("00000000"), lit("00000000"), // ctime, mtime
        be32h(lit(i + 1L)), lit("00000000"), // track_id, reserved
        be32h(duration), lit("00000000" * 2), // duration, reserved 8
        be16h(lit(0L)), be16h(lit(0L)), // layer, alt group
        be16h(lit(0L)), be16h(lit(0L)), // volume, reserved
        lit(matrixHex),
        be32h(shiftleft(w, 16)), be32h(shiftleft(h, 16))) // 16.16 dims
    }
    val traks = concat((0 until 3).map(i =>
      when(nTracks > i, tkhd(i)).otherwise(lit(""))): _*)
    val moovSize = lit(8L) + 108L + nTracks.cast("long") * 100L
    val full = concat(
      be32h(lit(16L)), lit("66747970"), // ftyp
      lit("69736F6D"), be32h(lit(0L)), // isom, minor version
      be32h(moovSize), lit("6D6F6F76"), // moov
      mvhd, traks)
    // mid-crawl truncation: cut 20 bytes into moov (hex chars = 2/byte)
    when(col("doc_id") % 11 === 7, unhex(substring(full, 1, (16 + 28) * 2)))
      .otherwise(unhex(full))
  }

  /** Structurally-real PCM WAV built in-query: RIFF header, an
    * odd-sized LIST chunk for doc_id%5==0 (the even-padding walk), a
    * 16-byte fmt chunk (format tag 1 = integer PCM), and a data chunk
    * whose payload is REAL interleaved samples — 8-bit unsigned when
    * `doc_id % 3 == 0`, 16-bit signed little-endian otherwise, mono or
    * stereo by `doc_id % 2`. Stored sample for (frame i, channel c) is
    * `(doc_id*13 + i*17 + c*29) % M` (M = 2^bits), which the decoder
    * recovers as `stored - 128` (8-bit) / two's-complement (16-bit) —
    * so the oracle computes every decoded value arithmetically.
    */
  private def wavPcmBlob: org.apache.spark.sql.Column = {
    val nch = (lit(1L) + col("doc_id") % 2).cast("int")
    val bits8 = col("doc_id") % 3 === 0
    val m = when(bits8, 256L).otherwise(65536L)
    val bps = when(bits8, 1L).otherwise(2L)
    val frames = (lit(50L) + col("doc_id") % 200).cast("int")
    def stored(i: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
      (col("doc_id") * 13 + i * 17 + c * 29) % m
    def sampleHex(i: org.apache.spark.sql.Column,
                  c: org.apache.spark.sql.Column) =
      when(bits8, lpad(hex(stored(i, c)), 2, "0"))
        .otherwise(le16h(stored(i, c)))
    val dataHex = array_join(
      transform(sequence(lit(0), frames - 1), i =>
        array_join(transform(sequence(lit(0), nch - 1), c =>
          sampleHex(i, c)), "")), "")
    val dataSize = frames * nch * bps
    val listHex = when(col("doc_id") % 5 === 0,
      concat(lit("4C495354"), le32h(lit(3L)), lit("494E4600"))).otherwise(lit(""))
    val listBytes = when(col("doc_id") % 5 === 0, lit(12L)).otherwise(lit(0L))
    val rate = lit(8000L)
    val blockAlign = nch * bps
    val riffSize = lit(4L) + listBytes + lit(24L) + lit(8L) + dataSize
    unhex(concat(
      lit("52494646"), le32h(riffSize), lit("57415645"),
      listHex,
      lit("666D7420"), le32h(lit(16L)),
      le16h(lit(1L)), le16h(nch), le32h(rate), le32h(rate * blockAlign),
      le16h(blockAlign), le16h(when(bits8, 8L).otherwise(lit(16L))),
      lit("64617461"), le32h(dataSize),
      dataHex))
  }

  /** Structurally-real gzip member built in-query: magic 1F 8B, CM 8,
    * FLG with FNAME set, zero MTIME/XFL, OS FF, the filename
    * "d.txt\0", one STORED deflate block (final bit set, LE16
    * LEN/NLEN) carrying the document's leading 200 chars, and a
    * zeroed CRC32/ISIZE trailer (tolerantly unverified, and a raw
    * inflate never reads it). The fixture text is pure ASCII
    * (verified at p18), so `length` == octets and `hex(body)` is the
    * exact payload byte sequence.
    */
  private def gzipBlob: org.apache.spark.sql.Column = {
    val body = substring(col("text"), 1, 200)
    val len = length(body).cast("long")
    unhex(concat(
      lit("1F8B0808"), // magic, deflate, FLG=FNAME
      lit("0000000000FF"), // MTIME, XFL, OS
      lit("642E74787400"), // "d.txt\0"
      lit("01"), le16h(len), le16h(lit(65535L) - len), // final STORED block
      hex(body),
      lit("0000000000000000"))) // CRC32 + ISIZE (unverified)
  }

  /** Structurally-real 8-bit PNG built in-query: signature, IHDR, one
    * IDAT whose zlib stream is a single STORED deflate block (header
    * 0x7801, block 0x01 + LEN/NLEN, raw scanlines: one 0x00 filter byte
    * per row then top-down pixel bytes), IEND. The color type cycles by
    * `doc_id % 4` — 0→RGB(2), 1→RGBA(6), 2→gray(0), 3→gray+alpha(4) —
    * with gray = the R formula and alpha = off 33 (the decoder drops
    * it, so the oracle never sees it). Chunk CRCs and the adler32
    * trailer are zeros — the tolerant parser does not verify them (and
    * a raw inflate never reads the trailer). Same dims/pixel arithmetic
    * as [[bmpBlob]], so the oracle computes every channel value
    * directly.
    */
  private def pngBlob: org.apache.spark.sql.Column = {
    def be32h(x: org.apache.spark.sql.Column) =
      lpad(hex(x.cast("long")), 8, "0")
    val w = (lit(3L) + col("doc_id") % 6).cast("int") // 3..8
    val h = (lit(2L) + col("doc_id") % 5).cast("int") // 2..6
    val ct = (col("doc_id") % 4).cast("int") // fixture color-type selector
    val bpp = when(ct === 0, 3).when(ct === 1, 4)
      .when(ct === 2, 1).otherwise(2)
    val colorHex = when(ct === 0, "02").when(ct === 1, "06")
      .when(ct === 2, "00").otherwise("04")
    def chan(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
             off: Int) =
      lpad(hex((col("doc_id") * 7 + x * 3 + y * 5 + lit(off)) % 256), 2, "0")
    def pix(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      when(ct === 0, concat(chan(x, y, 0), chan(x, y, 11), chan(x, y, 22)))
        .when(ct === 1, concat(chan(x, y, 0), chan(x, y, 11), chan(x, y, 22),
          chan(x, y, 33)))
        .when(ct === 2, chan(x, y, 0))
        .otherwise(concat(chan(x, y, 0), chan(x, y, 33)))
    val scanlines = array_join(
      transform(sequence(lit(0), h - 1), y =>
        concat(lit("00"), // filter type 0 (None) per row
          array_join(transform(sequence(lit(0), w - 1), x => pix(x, y)), ""))),
      "")
    val dataLen = h * (lit(1) + w * bpp)
    val idatLen = dataLen + 11 // zlib hdr 2 + stored hdr 5 + adler 4
    unhex(concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D49484452"), be32h(w), be32h(h),
      lit("08"), colorHex, lit("000000"), // depth 8, color type, no interlace
      lit("00000000"), // IHDR CRC (unverified)
      be32h(idatLen), lit("49444154"), // IDAT
      lit("780101"), // zlib hdr + final STORED block
      le16h(dataLen), le16h(lit(65535) - dataLen), // LEN, NLEN (LE)
      scanlines, lit("00000000"), // adler32 (unverified)
      lit("00000000"), // IDAT CRC (unverified)
      lit("0000000049454E4400000000"))) // IEND
  }

  /** Structurally-real uncompressed 24-bpp BMP built in-query: 14-byte
    * file header, 40-byte BITMAPINFOHEADER, bottom-up B,G,R rows padded
    * to 4 bytes — dims 3..8 x 2..6 and channel values
    * `(doc_id*7 + x*3 + y*5 + {0,11,22}) % 256` (r,g,b) all derived
    * from doc_id, so the DuckDB oracle can compute any pixel
    * arithmetically while the engine recovers it by parsing bytes.
    */
  private def bmpBlob: org.apache.spark.sql.Column = {
    val w = (lit(3L) + col("doc_id") % 6).cast("int") // 3..8
    val h = (lit(2L) + col("doc_id") % 5).cast("int") // 2..6
    val pad = (lit(4) - (w * 3) % 4) % 4
    val imageSize = (w * 3 + pad) * h
    def chan(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
             off: Int) =
      lpad(hex((col("doc_id") * 7 + x * 3 + y * 5 + lit(off)) % 256), 2, "0")
    // pixel byte order in the file is B, G, R
    def pix(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      concat(chan(x, y, 22), chan(x, y, 11), chan(x, y, 0))
    // rows are stored bottom-up: file row yf holds image row h-1-yf
    val pixelsHex = array_join(
      transform(sequence(lit(0), h - 1), yf =>
        concat(
          array_join(transform(sequence(lit(0), w - 1), x =>
            pix(x, h - 1 - yf)), ""),
          repeat(lit("00"), pad))), "")
    val header = concat(
      lit("424D"), le32h(lit(54) + imageSize), lit("00000000"), le32h(lit(54)),
      le32h(lit(40)), le32h(w), le32h(h), le16h(lit(1)), le16h(lit(24)),
      le32h(lit(0)), le32h(imageSize),
      le32h(lit(0)), le32h(lit(0)), le32h(lit(0)), le32h(lit(0)))
    unhex(concat(header, pixelsHex))
  }
}
