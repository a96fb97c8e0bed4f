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
      val dec = MultimodalOps.decodeImageStub(blob)
      Tables.load(spark, dir, "documents")
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
          Tables.load(spark, dir, "documents").withColumn("blob",
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
          Tables.load(spark, dir, "documents").withColumn("blob",
            col("text").cast("binary")),
          "doc_id", "blob", dim = 8)
        .select(col("doc_id"),
          posexplode(col("embedding")).as(Seq("j", "v0")))
        .select(col("doc_id"), col("j").cast("long").as("j"),
          round(col("v0"), 6).as("v"))
        .orderBy(col("doc_id"), col("j"))
    }
  )
}
