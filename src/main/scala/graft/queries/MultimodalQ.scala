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
    }
  )
}
