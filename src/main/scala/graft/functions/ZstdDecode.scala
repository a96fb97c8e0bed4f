package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, NullType}

/** REAL Zstandard (RFC 8878) decompression, from scratch — the one
  * "real decode" gap the compression lineage had left (gzip/deflate
  * are fully decoded via [[Gzip]]; [[Zstd]] walks zstd framing
  * metadata-only). Modern Common Crawl ships `.warc.zst`, so payload
  * extraction from it needs the actual §4 machinery, all implemented
  * here from the RFC with no codec library:
  *
  *  - FSE (§4.1): normalized-count reader (variable-bit probabilities,
  *    zero-run repeat flags), decode-table spread/build, the
  *    predefined literals-length / match-length / offset tables;
  *  - Huffman (§4.2): weight decoding (direct 4-bit pairs OR
  *    FSE-compressed with two interleaved states), canonical
  *    max-11-bit table build with the derived last weight, and the
  *    backward bitstream — single-stream and four-stream (jump table)
  *    literals;
  *  - sequences (§3.1.1.3.2): the three interleaved FSE state machines
  *    (predefined / RLE / FSE-compressed / repeat modes), offset codes
  *    with the three-slot repeated-offset history and its
  *    literals-length-zero special case, overlapping match copy;
  *  - frames: header/window/FCS parse (shared shape with [[Zstd]]'s
  *    walk), raw/RLE/compressed blocks, entropy-state persistence
  *    across blocks (treeless literals, repeat FSE modes, offset
  *    history), content-checksum VERIFICATION (from-scratch XXH64).
  *
  * Same engine posture as [[Gzip]]: NULL (never throw) on anything
  * malformed, a [[maxBytes]] output cap turning decompression bombs
  * into NULLs instead of executor OOMs, and a salvage variant that
  * decodes CONSECUTIVE frames while they verify (the Common Crawl
  * shard layout) keeping the valid prefix. Decode is a scan-stage
  * expression: a 100 TB `.warc.zst` extract-and-tokenize pass is one
  * whole-stage-codegen'd scan with zero shuffle.
  *
  * DICTIONARIES (§5, r17) are supported end to end: the structured
  * dictionary format (magic 0xEC30A437, Dictionary_ID, entropy tables
  * in the Huffman → OF → ML → LL order, the three 4-byte recent
  * offsets, content) parses through the same from-scratch FSE/Huffman
  * readers the blocks use; raw-content blobs (no magic) act as pure
  * window prefix per the reference implementation's raw-dict mode. A
  * frame decoded against a dictionary starts with the dictionary's
  * entropy tables (so a FIRST block may use treeless literals or
  * repeat FSE modes), its recent-offset history, and its content as
  * the window prefix (match offsets may reach past the frame start
  * into the dictionary tail). A nonzero Dictionary_ID still NULLs the
  * frame when no dictionary is supplied or the IDs disagree — never a
  * wrong decode. [[ccFrames]] is the modern Common Crawl `.warc.zst`
  * layout: a LEADING skippable frame with magic 0x184D2A5D carries the
  * shard dictionary (optionally itself zstd-compressed), binding it
  * for every following data frame. Parsed dictionaries are cached by
  * content hash — per-shard dictionaries are shared by millions of
  * records, so the per-row cost is one XXH64 of the dict blob, not an
  * entropy-table rebuild. Content checksums are VERIFIED with a
  * from-scratch XXH64
  * (unlike the gzip trailer, which mid-crawl truncation routinely
  * cuts: a declared zstd checksum follows a COMPLETE frame, so a
  * mismatch means corrupted-but-decodable content — the exact thing a
  * checksum exists to catch).
  */
object ZstdDecode {

  /** Hard cap on decoded size per payload — the [[Gzip.maxBytes]]
    * posture: 64 MiB, bombs become NULLs. */
  val maxBytes: Int = 64 << 20

  /** Per-BLOCK mode counters (a handful of increments per ≤128 KiB
    * block — free), so the spec can PROVE its real-zstd corpus reaches
    * every decode path instead of assuming it: 0-3 literals type
    * (raw/RLE/compressed/treeless), 4-7 LL mode, 8-11 OF mode,
    * 12-15 ML mode (predefined/RLE/FSE/repeat), 16 one-stream
    * literals, 17 four-stream, 18 direct Huffman weights,
    * 19 FSE-compressed weights; dictionary paths (r17): 20 frame
    * decoded with a dictionary bound, 21 match copy reached into the
    * dictionary content prefix, 22 first-block treeless/repeat mode
    * served by the DICTIONARY's entropy tables, 23 structured
    * (magic 0xEC30A437) dictionary parsed. */
  val modeCounters = new java.util.concurrent.atomic.AtomicLongArray(24)

  /** Largest legal block regenerated size (RFC 8878 §3.1.1.2.4 is
    * min(window, 128 KiB); we enforce the constant bound). */
  private final val BlockMax = 128 << 10

  private final val DataMagic = 0xFD2FB528
  private final val SkippableBase = 0x184D2A50
  private final val MaxFrames = 65536
  private final val MaxBlocksPerFrame = 1 << 20

  /** The Common Crawl `.warc.zst` dictionary-frame magic: the one
    * skippable magic (0x184D2A5D) the public zstd-warc tooling reserves
    * for the shard dictionary, placed before the first data frame. */
  private final val DictFrameMagic = 0x184D2A5D

  /** Structured-dictionary magic (RFC 8878 §5). */
  private final val DictMagic = 0xEC30A437

  /** Cap on a (decompressed) dictionary blob — dictionaries are KiB-
    * sized in practice; a bomb posing as one becomes a damaged frame. */
  private final val MaxDictBytes = 16 << 20

  // seekable format (the public zstd contrib spec): a trailing
  // skippable frame carries the SEEK TABLE — per-frame compressed and
  // decompressed sizes + a 9-byte footer — so one shard file can be
  // SPLIT: any frame decodes independently given its (offset, size).
  // At 100 TB this is the difference between "one task per shard" and
  // "one task per frame": Spark normally cannot split a zstd file, but
  // a seek table turns a shard into thousands of independent decode
  // units with ONE footer read each.
  private final val SeekTableMagic = 0x184D2A5E
  private final val SeekFooterMagic = 0x8F92EAB1

  /** Column API: decoded bytes of a COMPLETE zstd stream (one or more
    * concatenated frames, all of which must verify), or NULL. */
  def decompress(blob: Column): Column =
    GraftSql.column(ZstdDecompressExpr(GraftSql.expression(blob), salvage = false))

  /** Column API: salvage decode of consecutive frames — decodes while
    * frames verify, stops at the first malformed/truncated one keeping
    * the valid prefix; NULL only when not even the first data frame
    * decodes (skippable frames are stepped and don't count). */
  def decompressFrames(blob: Column): Column =
    GraftSql.column(ZstdDecompressExpr(GraftSql.expression(blob), salvage = true))

  /** Column API: strict decode AGAINST A DICTIONARY (RFC 8878 §5) —
    * structured (magic 0xEC30A437: entropy tables + recent offsets +
    * content) or raw-content (pure window prefix). NULL dictionary ≡
    * no dictionary. */
  def decompressDict(blob: Column, dict: Column): Column =
    GraftSql.column(ZstdDecompressDictExpr(
      GraftSql.expression(blob), GraftSql.expression(dict)))

  /** Column API: the Common Crawl `.warc.zst` shard walk — a LEADING
    * skippable frame with magic 0x184D2A5D binds the shard dictionary
    * (optionally itself zstd-compressed) for all following data
    * frames; salvage posture (valid-prefix) like [[decompressFrames]]. */
  def ccFrames(blob: Column): Column =
    GraftSql.column(ZstdCcFramesExpr(GraftSql.expression(blob)))

  /** Strict whole-stream decode; null unless every frame verifies and
    * the stream is fully consumed. Static so generated code calls it. */
  def decompressData(b: Array[Byte]): Array[Byte] =
    run(b, salvage = false, dict0 = null, cc = false)

  /** Salvaged-prefix decode; null when no data frame decodes. */
  def decompressFramesData(b: Array[Byte]): Array[Byte] =
    run(b, salvage = true, dict0 = null, cc = false)

  /** Strict decode against a dictionary blob (null/empty dict ≡ none);
    * a malformed dictionary NULLs the result (never a wrong decode). */
  def decompressDictData(b: Array[Byte], dictB: Array[Byte]): Array[Byte] = {
    if (dictB == null || dictB.length == 0) return decompressData(b)
    val d = try cachedDict(dictB) catch {
      case _: Corrupt => return null
      case _: ArrayIndexOutOfBoundsException => return null
    }
    run(b, salvage = false, dict0 = d, cc = false)
  }

  /** Common Crawl `.warc.zst` walk: leading 0x184D2A5D skippable frame
    * binds the dictionary; salvage posture. */
  def decompressCcData(b: Array[Byte]): Array[Byte] =
    run(b, salvage = true, dict0 = null, cc = true)

  // ---------------------------------------------------------------------
  // seekable format (public zstd contrib spec)
  // ---------------------------------------------------------------------
  import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

  /** Schema of [[seekTable]]: one row per frame (data AND skippable —
    * the compressed sizes must tile the data region exactly). */
  val seekType: ArrayType = ArrayType(StructType(Seq(
    StructField("c_off", LongType), StructField("c_size", LongType),
    StructField("d_off", LongType), StructField("d_size", LongType))),
    containsNull = false)

  /** Column API: the parsed seek table of a seekable-zstd blob, or NULL
    * when the trailing table is absent/malformed/inconsistent. */
  def seekTable(blob: Column): Column =
    GraftSql.column(ZstdSeekTableExpr(GraftSql.expression(blob)))

  /** Column API: decoded bytes of FRAME `idx` alone — the random-access
    * path the seek table exists for; NULL when the table is invalid,
    * the index out of range, the entry a skippable, the frame damaged,
    * or the declared decompressed size / checksum disagrees. A leading
    * 0x184D2A5D dictionary frame (entry 0) binds for the extraction. */
  def seekExtract(blob: Column, idx: Column): Column =
    GraftSql.column(ZstdSeekExtractExpr(
      GraftSql.expression(blob), GraftSql.expression(idx)))

  /** Parsed entries (cOff, cSize, dOff, dSize, checksum|-1), or null.
    * Validations per the contrib spec: footer magic, reserved
    * descriptor bits zero, the table's own skippable header (magic
    * 0x184D2A5E, declared size = entries + footer), and the entries'
    * compressed sizes tiling the data region EXACTLY. */
  private def parseSeek(b: Array[Byte]): Array[Array[Long]] = {
    if (b == null || b.length < 17) return null
    val len = b.length
    if (le32(b, len - 4) != SeekFooterMagic) return null
    val desc = b(len - 5) & 0xFF
    if ((desc & 0x7C) != 0) return null // contrib spec: bits 6-2 reserved
    val hasChecksum = (desc & 0x80) != 0
    val n = le32(b, len - 9).toLong & 0xFFFFFFFFL
    val entrySize = if (hasChecksum) 12 else 8
    // structural cap: a table with n entries needs n*entrySize+17 bytes of
    // blob, so this rejects nothing valid while bounding the allocation by
    // the blob's own size (no fixed frame-count limit — a shard of tiny
    // frames can legitimately carry hundreds of thousands of entries)
    if (n == 0 || n > (len - 17).toLong / entrySize) return null
    val tableLen = n.toInt * entrySize + 9
    val hdrAt = len - 9 - n.toInt * entrySize - 8
    if (hdrAt < 0) return null
    if (le32(b, hdrAt) != SeekTableMagic) return null
    if ((le32(b, hdrAt + 4).toLong & 0xFFFFFFFFL) != tableLen) return null
    val entries = new Array[Array[Long]](n.toInt)
    var cOff = 0L; var dOff = 0L
    var k = 0
    while (k < n.toInt) {
      val p = hdrAt + 8 + k * entrySize
      val cSize = le32(b, p).toLong & 0xFFFFFFFFL
      val dSize = le32(b, p + 4).toLong & 0xFFFFFFFFL
      val chk = if (hasChecksum) le32(b, p + 8).toLong & 0xFFFFFFFFL else -1L
      entries(k) = Array(cOff, cSize, dOff, dSize, chk)
      cOff += cSize; dOff += dSize
      k += 1
    }
    if (cOff != hdrAt) return null // sizes must tile the data region
    entries
  }

  def seekTableData(b: Array[Byte]): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val entries = parseSeek(b)
    if (entries == null) return null
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      entries.map(e => org.apache.spark.sql.catalyst.InternalRow(
        e(0), e(1), e(2), e(3)): Any))
  }

  /** Random-access single-frame decode via the seek table. */
  def seekExtractData(b: Array[Byte], idx: Int): Array[Byte] = {
    val entries = parseSeek(b)
    if (entries == null || idx < 0 || idx >= entries.length) return null
    // the CC convention composes: a leading dictionary skippable frame
    // (entry 0) binds for every extraction
    var dict: Dict = null
    val e0 = entries(0)
    if (e0(1) >= 8 && le32(b, e0(0).toInt) == DictFrameMagic) {
      dict = ccDict(b, e0(0).toInt + 8, e0(1).toInt - 8)
      if (dict == null) return null
    }
    val e = entries(idx)
    if (e(1) <= 0 || e(0) + e(1) > b.length) return null
    val slice = java.util.Arrays.copyOfRange(b, e(0).toInt, (e(0) + e(1)).toInt)
    val out = run(slice, salvage = false, dict0 = dict, cc = false)
    if (out == null) return null
    if (out.length.toLong != e(3)) return null // declared dSize must hold
    if (e(4) >= 0 && (xxh64(out, 0, out.length) & 0xFFFFFFFFL) != e(4))
      return null // per-frame XXH64 low-32, when the table carries them
    out
  }

  private def run(b: Array[Byte], salvage: Boolean, dict0: Dict,
                  cc: Boolean): Array[Byte] = {
    if (b == null || b.length == 0) return null
    val out = new Out(maxBytes)
    var dict = dict0
    var off = 0
    var frames = 0
    var dataFrames = 0
    var damaged = false
    while (!damaged && off < b.length && frames < MaxFrames) {
      if (off + 4 > b.length) damaged = true
      else {
        val magic = le32(b, off)
        if ((magic & 0xFFFFFFF0) == SkippableBase) {
          if (off + 8 > b.length) damaged = true
          else {
            val sz = le32(b, off + 4).toLong & 0xFFFFFFFFL
            if (off + 8 + sz > b.length) damaged = true
            else {
              if (cc && magic == DictFrameMagic && dict == null &&
                  dataFrames == 0 && sz > 0) {
                // the shard dictionary: bind it for the data frames;
                // a dictionary that doesn't decode/parse damages the
                // stream (frames that NEED it can't decode correctly)
                dict = ccDict(b, off + 8, sz.toInt)
                if (dict == null) damaged = true
              }
              if (!damaged) { off += 8 + sz.toInt; frames += 1 }
            }
          }
        } else if (magic == DataMagic) {
          val next = decodeFrame(b, off, out, dict)
          if (next < 0) damaged = true
          else { off = next; frames += 1; dataFrames += 1 }
        } else damaged = true
      }
    }
    if (damaged && !salvage) null
    else if (dataFrames == 0) null
    else out.toArray
  }

  // ---------------------------------------------------------------------
  // growable output with a hard cap; matches copy from it directly
  // ---------------------------------------------------------------------
  private final class Out(cap: Int) {
    var buf = new Array[Byte](8192)
    var len = 0
    /** reserve n more bytes; false when past the cap (bomb). */
    def ensure(n: Int): Boolean = {
      if (n < 0 || len.toLong + n > cap) return false
      if (len + n > buf.length) {
        var want = buf.length
        while (want < len + n) want = math.min(cap, math.max(want * 2, len + n))
        buf = java.util.Arrays.copyOf(buf, want)
      }
      true
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  @inline private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
      ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)

  private def highBit(v: Int): Int = 31 - java.lang.Integer.numberOfLeadingZeros(v)

  /** Local failure signal inside one frame decode — converted to the
    * NULL/salvage contract at [[run]]; never escapes the expression. */
  private final class Corrupt extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  @inline private def fail(): Nothing = throw new Corrupt

  // ---------------------------------------------------------------------
  // frame decode
  // ---------------------------------------------------------------------
  /** Decode one data frame at `off` into `out`; returns the offset past
    * the frame, or -1 when malformed/truncated/over-cap. */
  private def decodeFrame(b: Array[Byte], off: Int, out: Out, dict: Dict): Int = {
    try decodeFrame0(b, off, out, dict)
    catch {
      case _: Corrupt => -1
      case _: ArrayIndexOutOfBoundsException => -1
    }
  }

  private def decodeFrame0(b: Array[Byte], off: Int, out: Out, dict: Dict): Int = {
    var i = off + 4
    if (i >= b.length) fail()
    val fhd = b(i) & 0xFF; i += 1
    if ((fhd & 0x08) != 0) fail() // reserved bit
    val singleSeg = (fhd & 0x20) != 0
    val checksum = (fhd & 0x04) != 0
    val dictFlag = fhd & 0x03
    val fcsFlag = (fhd >> 6) & 0x03
    if (!singleSeg) {
      if (i >= b.length) fail()
      i += 1 // window descriptor: informative for a capped decoder
    }
    val dictBytes = dictFlag match {
      case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
    }
    if (i + dictBytes > b.length) fail()
    var dictId = 0L
    var k = 0
    while (k < dictBytes) { dictId |= (b(i + k) & 0xFFL) << (8 * k); k += 1 }
    i += dictBytes
    if (dictId != 0L) {
      // never a WRONG decode: a frame naming a dictionary needs one,
      // and a structured dictionary's declared ID must agree (a raw-
      // content blob has no ID to check, libzstd's raw-dict posture)
      if (dict == null) fail()
      if (dict.id != 0L && dict.id != dictId) fail()
    }
    val fcsBytes = fcsFlag match {
      case 0 => if (singleSeg) 1 else 0
      case 1 => 2; case 2 => 4; case _ => 8
    }
    if (i + fcsBytes > b.length) fail()
    var fcs = -1L
    if (fcsBytes > 0) {
      fcs = 0L; k = 0
      while (k < fcsBytes) { fcs |= (b(i + k) & 0xFFL) << (8 * k); k += 1 }
      if (fcsBytes == 2) fcs += 256
      i += fcsBytes
    }
    // per-frame entropy state; a bound dictionary seeds it (§5): its
    // entropy tables may serve a FIRST block's treeless/repeat modes,
    // its recent offsets replace {1,4,8}, its content is the window
    // prefix match offsets may reach into
    val st = new FrameState
    if (dict != null) {
      st.dict = dict
      st.huf = dict.huf; st.ll = dict.ll; st.of = dict.of; st.ml = dict.ml
      st.rep1 = dict.rep1; st.rep2 = dict.rep2; st.rep3 = dict.rep3
      modeCounters.incrementAndGet(20)
    }
    val frameStart = out.len
    var last = false
    var blocks = 0
    while (!last && blocks < MaxBlocksPerFrame) {
      if (i + 3 > b.length) fail()
      val hdr = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16)
      i += 3
      last = (hdr & 1) != 0
      val btype = (hdr >> 1) & 0x3
      val bsize = hdr >>> 3
      btype match {
        case 0 => // raw
          if (bsize > BlockMax || i + bsize > b.length || !out.ensure(bsize)) fail()
          System.arraycopy(b, i, out.buf, out.len, bsize)
          out.len += bsize; i += bsize
        case 1 => // RLE: one stored byte regenerated bsize times
          if (bsize > BlockMax || i >= b.length || !out.ensure(bsize)) fail()
          java.util.Arrays.fill(out.buf, out.len, out.len + bsize, b(i))
          out.len += bsize; i += 1
        case 2 => // compressed
          if (i + bsize > b.length) fail()
          decodeCompressedBlock(b, i, bsize, out, st, frameStart)
          i += bsize
        case _ => fail() // reserved
      }
      blocks += 1
    }
    if (!last) fail()
    if (fcs >= 0 && (out.len - frameStart).toLong != fcs) fail()
    if (checksum) {
      if (i + 4 > b.length) fail()
      // VERIFIED (r17), unlike the gzip trailer: a declared checksum
      // sits after the last block of a frame that fully decoded, so a
      // mismatch means corrupted-but-decodable content — exactly what a
      // checksum exists to catch. RFC 8878 §3.1.1: low 32 bits of
      // XXH64(content, seed 0).
      val want = le32(b, i)
      val got = (xxh64(out.buf, frameStart, out.len - frameStart) & 0xFFFFFFFFL).toInt
      if (got != want) fail()
      i += 4
    }
    i
  }

  // ---------------------------------------------------------------------
  // XXH64 (the public xxHash spec, seed 0) — for content checksums
  // ---------------------------------------------------------------------
  private final val XP1 = 0x9E3779B185EBCA87L
  private final val XP2 = 0xC2B2AE3D27D4EB4FL
  private final val XP3 = 0x165667B19E3779F9L
  private final val XP4 = 0x85EBCA77C2B2AE63L
  private final val XP5 = 0x27D4EB2F165667C5L

  @inline private def le64(b: Array[Byte], p: Int): Long = {
    var v = 0L; var k = 0
    while (k < 8) { v |= (b(p + k) & 0xFFL) << (8 * k); k += 1 }
    v
  }
  @inline private def xround(acc: Long, input: Long): Long =
    java.lang.Long.rotateLeft(acc + input * XP2, 31) * XP1

  private[functions] def xxh64(buf: Array[Byte], off: Int, len: Int): Long = {
    val end = off + len
    var i = off
    var h = 0L
    if (len >= 32) {
      var v1 = XP1 + XP2; var v2 = XP2; var v3 = 0L; var v4 = -XP1
      while (i + 32 <= end) {
        v1 = xround(v1, le64(buf, i))
        v2 = xround(v2, le64(buf, i + 8))
        v3 = xround(v3, le64(buf, i + 16))
        v4 = xround(v4, le64(buf, i + 24))
        i += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      h = (h ^ xround(0L, v1)) * XP1 + XP4
      h = (h ^ xround(0L, v2)) * XP1 + XP4
      h = (h ^ xround(0L, v3)) * XP1 + XP4
      h = (h ^ xround(0L, v4)) * XP1 + XP4
    } else h = XP5
    h += len
    while (i + 8 <= end) {
      h = java.lang.Long.rotateLeft(h ^ xround(0L, le64(buf, i)), 27) * XP1 + XP4
      i += 8
    }
    if (i + 4 <= end) {
      h = java.lang.Long.rotateLeft(h ^ (le32(buf, i).toLong & 0xFFFFFFFFL) * XP1,
        23) * XP2 + XP3
      i += 4
    }
    while (i < end) {
      h = java.lang.Long.rotateLeft(h ^ (buf(i) & 0xFFL) * XP5, 11) * XP1
      i += 1
    }
    h ^= h >>> 33; h *= XP2; h ^= h >>> 29; h *= XP3; h ^= h >>> 32
    h
  }

  /** Entropy state that persists across blocks WITHIN one frame. */
  private final class FrameState {
    var huf: HufTable = null
    var ll: FseTable = null
    var of: FseTable = null
    var ml: FseTable = null
    var rep1 = 1; var rep2 = 4; var rep3 = 8
    /** Bound dictionary (content = window prefix) or null. */
    var dict: Dict = null
    /** True once any compressed block ran — a treeless/repeat mode seen
      * while false can only be served by the dictionary's tables. */
    var anyCompressed = false
  }

  // ---------------------------------------------------------------------
  // dictionaries (§5)
  // ---------------------------------------------------------------------
  /** A parsed dictionary: entropy tables may be null (raw-content
    * blob); content is the window prefix; rep1..3 seed the
    * recent-offset history. */
  private final class Dict(
      val id: Long, val content: Array[Byte],
      val huf: HufTable, val ll: FseTable, val of: FseTable,
      val ml: FseTable, val rep1: Int, val rep2: Int, val rep3: Int)

  /** §5: magic 0xEC30A437 → structured (Dictionary_ID, entropy tables
    * in the Huffman → Offsets → Match_Lengths → Literals_Lengths
    * order, then the three 4-byte recent offsets, then content —
    * offsets must be nonzero and ≤ content size); anything else is a
    * raw-content dictionary (pure window prefix, ID 0, default
    * offsets), the reference implementation's raw-dict mode. Throws
    * [[Corrupt]] on a malformed structured dictionary. */
  private def parseDict(b: Array[Byte]): Dict = {
    if (b.length < 8 || le32(b, 0) != DictMagic)
      return new Dict(0L, b, null, null, null, null, 1, 4, 8)
    modeCounters.incrementAndGet(23)
    val id = le32(b, 4).toLong & 0xFFFFFFFFL
    var i = 8
    val (huf, hufBytes) = readHufTable(b, i, b.length); i += hufBytes
    val (of, ofBytes) = readFseTable(b, i, b.length, 8, 31); i += ofBytes
    val (ml, mlBytes) = readFseTable(b, i, b.length, 9, 52); i += mlBytes
    val (ll, llBytes) = readFseTable(b, i, b.length, 9, 35); i += llBytes
    if (i + 12 > b.length) fail()
    val r1 = le32(b, i); val r2 = le32(b, i + 4); val r3 = le32(b, i + 8)
    i += 12
    val content = java.util.Arrays.copyOfRange(b, i, b.length)
    if (r1 <= 0 || r2 <= 0 || r3 <= 0 ||
        r1 > content.length || r2 > content.length || r3 > content.length)
      fail()
    new Dict(id, content, huf, ll, of, ml, r1, r2, r3)
  }

  /** Parsed-dictionary cache keyed by blob content hash — but a hash
    * hit is never TRUSTED: the entry carries its source bytes and a hit
    * must pass Arrays.equals, so an xxh64 collision (non-cryptographic;
    * collisions constructible) degrades to a cache miss, never a wrong
    * dictionary and thus never a wrong decode. A shard dictionary is
    * shared by millions of records, so the per-row cost is one XXH64
    * pass + one memcmp, not an entropy-table rebuild. `dict == null`
    * entries cache FAILED parses so a damaged shard pays one decode
    * attempt, not one per row. Bounded (cleared past 64 entries —
    * dictionaries are per-shard, not per-row). */
  private final class DictEntry(val src: Array[Byte], val dict: Dict)
  private val dictCache =
    new java.util.concurrent.ConcurrentHashMap[Long, DictEntry]()
  // domain separation: the same bytes mean different things to the two
  // lookup paths (cachedDict parses the blob directly; ccDict may first
  // decompress it), so their key spaces must not alias
  private final val RawDictDomain = 0x5D1C7A11E5A17EDL
  private final val CcDictDomain = 0x3C0FFEE0DDF00D5L

  private def dictCachePut(key: Long, e: DictEntry): Unit = {
    if (dictCache.size > 64) dictCache.clear()
    dictCache.put(key, e)
  }

  private def cachedDict(b: Array[Byte]): Dict = {
    val key = RawDictDomain ^ xxh64(b, 0, b.length) ^
      java.lang.Long.rotateLeft(b.length.toLong, 32)
    val hit = dictCache.get(key)
    if (hit != null && java.util.Arrays.equals(hit.src, b)) return hit.dict
    val d = parseDict(b)
    dictCachePut(key, new DictEntry(b.clone(), d))
    d
  }

  /** The CC dictionary-frame payload at b[off, off+len): optionally a
    * zstd frame wrapping the dictionary bytes (decoded with the §4
    * machinery, no dictionary), then parsed; null when it doesn't
    * decode/parse or busts [[MaxDictBytes]]. Cached on the RAW payload
    * (success AND failure) so the wrapped case pays one hash + memcmp
    * per row, not a decode — even when the shard is damaged. */
  private def ccDict(b: Array[Byte], off: Int, len: Int): Dict = {
    if (len > MaxDictBytes) return null
    val key = CcDictDomain ^ xxh64(b, off, len) ^
      java.lang.Long.rotateLeft(len.toLong, 32)
    val hit = dictCache.get(key)
    if (hit != null && java.util.Arrays.equals(
          hit.src, 0, hit.src.length, b, off, off + len)) return hit.dict
    val raw = java.util.Arrays.copyOfRange(b, off, off + len)
    val bytes =
      if (raw.length >= 4 && le32(raw, 0) == DataMagic)
        run(raw, salvage = false, dict0 = null, cc = false)
      else raw
    val d =
      if (bytes == null || bytes.length == 0 || bytes.length > MaxDictBytes)
        null
      else try parseDict(bytes) catch {
        case _: Corrupt => null
        case _: ArrayIndexOutOfBoundsException => null
      }
    dictCachePut(key, new DictEntry(raw, d))
    d
  }

  // ---------------------------------------------------------------------
  // backward bitstream (§3.1.1.3.2.1.1): written forward, read backward;
  // the last byte's highest set bit is the padding sentinel. Bits are
  // numbered LSB-first within the buffer; read(n) returns window
  // [pos-n, pos) with bit pos-1 as the result's MSB. Reads past the
  // start zero-pad the LOW side and drive `pos` negative (the FSE
  // weight loop uses that to detect exhaustion, mirroring the
  // reference decoders' tolerated overrun).
  // ---------------------------------------------------------------------
  private final class BackBits(b: Array[Byte], start: Int, end: Int) {
    var pos: Int = {
      if (end <= start) fail()
      val lastByte = b(end - 1) & 0xFF
      if (lastByte == 0) fail() // missing sentinel
      (end - start - 1) * 8 + highBit(lastByte)
    }
    /** Bits [pos-n, pos) word-at-a-time (n ≤ 31 everywhere: offset codes
      * cap at 31 extra bits, Huffman peeks ≤ 11, FSE states ≤ 9). */
    @inline private def peekL(n: Int): Long = {
      if (n == 0) return 0L
      val lo = pos - n
      val biLo = if (lo >= 0) lo >> 3 else 0
      var bi = (pos - 1) >> 3
      var v = 0L
      while (bi >= biLo) { v = (v << 8) | (b(start + bi) & 0xFFL); bi -= 1 }
      // v's bit k == global bit biLo*8 + k (LSB-first); reads past the
      // start zero-pad the LOW side (lo < 0 → left shift)
      val shift = lo - (biLo << 3)
      val shifted = if (shift >= 0) v >>> shift else v << -shift
      shifted & ((1L << n) - 1)
    }
    // rolling 64-bit container over the tail of the read window: the
    // sequence loop makes up to 6 reads per sequence, so reassembling
    // bytes per read dominates — refill amortizes it to one shift+mask
    private var cache = 0L
    private var cacheLow = Int.MaxValue
    private def refill(): Unit = {
      val hiByte = (pos - 1) >> 3
      val loByte = math.max(0, hiByte - 7)
      var bi = hiByte
      var v = 0L
      while (bi >= loByte) { v = (v << 8) | (b(start + bi) & 0xFFL); bi -= 1 }
      cache = v
      cacheLow = loByte << 3
    }
    def read(n: Int): Long = {
      if (pos - n >= 0) {
        if (pos - n < cacheLow) refill()
        val v = (cache >>> (pos - n - cacheLow)) & ((1L << n) - 1)
        pos -= n
        v
      } else { val v = peekL(n); pos -= n; v }
    }
    def peek(n: Int): Int = peekL(n).toInt
  }

  /** Forward LSB-first reader for FSE table descriptions (§4.1.1). */
  private final class FwdBits(b: Array[Byte], start: Int, val end: Int) {
    var bitPos = 0
    def read(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val idx = bitPos + k
        val byteIdx = start + (idx >> 3)
        if (byteIdx >= end) fail()
        v |= ((b(byteIdx) >> (idx & 7)) & 1) << k
        k += 1
      }
      bitPos += n
      v
    }
    def bytesConsumed: Int = (bitPos + 7) >> 3
  }

  // ---------------------------------------------------------------------
  // FSE (§4.1)
  // ---------------------------------------------------------------------
  private final class FseTable(val accLog: Int, val symbol: Array[Int],
                               val nbBits: Array[Int], val newState: Array[Int])

  /** Normalized counts → decode table (the spread/assign algorithm of
    * §4.1.1: "less than 1" symbols take cells from the table's end,
    * the rest spread by the (size/2 + size/8 + 3) step). */
  private def buildFse(counts: Array[Int], accLog: Int): FseTable = {
    val size = 1 << accLog
    val sym = new Array[Int](size)
    val nb = new Array[Int](size)
    val ns = new Array[Int](size)
    val symbolNext = new Array[Int](counts.length)
    var high = size - 1
    var s = 0
    while (s < counts.length) {
      if (counts(s) == -1) { sym(high) = s; high -= 1; symbolNext(s) = 1 }
      else symbolNext(s) = counts(s)
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var posn = 0
    s = 0
    while (s < counts.length) {
      var c = counts(s)
      while (c > 0) {
        sym(posn) = s
        posn = (posn + step) & mask
        while (posn > high) posn = (posn + step) & mask
        c -= 1
      }
      s += 1
    }
    if (posn != 0) fail()
    var u = 0
    while (u < size) {
      val sy = sym(u)
      val nextSt = symbolNext(sy); symbolNext(sy) += 1
      val bits = accLog - highBit(nextSt)
      nb(u) = bits
      ns(u) = (nextSt << bits) - size
      u += 1
    }
    new FseTable(accLog, sym, nb, ns)
  }

  /** §4.1.1 FSE_readNCount: variable-bit probabilities with the
    * zero-run repeat-flag encoding; returns (table, bytes consumed). */
  private def readFseTable(b: Array[Byte], off: Int, end: Int,
                           maxAccuracy: Int, maxSymbol: Int): (FseTable, Int) = {
    val br = new FwdBits(b, off, end)
    val accLog = br.read(4) + 5
    if (accLog > maxAccuracy) fail()
    var remaining = (1 << accLog) + 1
    var threshold = 1 << accLog
    var nbBits = accLog + 1
    val counts = new Array[Int](maxSymbol + 1)
    var charnum = 0
    var previous0 = false
    while (remaining > 1 && charnum <= maxSymbol) {
      if (previous0) {
        var rep = br.read(2)
        while (rep == 3) {
          charnum += 3
          if (charnum > maxSymbol) fail()
          rep = br.read(2)
        }
        charnum += rep
        if (charnum > maxSymbol) fail()
        previous0 = false
      } else {
        val max = (2 * threshold - 1) - remaining
        val low = br.read(nbBits - 1)
        var count =
          if ((low & (threshold - 1)) < max) low
          else {
            val highBitVal = br.read(1)
            val full = low | (highBitVal << (nbBits - 1))
            if (full >= threshold) full - max else full
          }
        count -= 1 // shift: stored values are count+1, -1 = "less than 1"
        if (count < -1) fail()
        remaining -= math.abs(count)
        if (remaining < 1) fail()
        counts(charnum) = count
        charnum += 1
        previous0 = count == 0
        while (remaining < threshold && remaining > 1) {
          nbBits -= 1; threshold >>= 1
        }
      }
    }
    if (remaining != 1) fail()
    (buildFse(counts, accLog), br.bytesConsumed)
  }

  /** Single-cell table for RLE symbol-compression mode. */
  private def rleFse(symbol: Int): FseTable =
    new FseTable(0, Array(symbol), Array(0), Array(0))

  // predefined distributions (§3.1.1.3.2.2) ------------------------------
  private lazy val PredefLL = buildFse(Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1), 6)
  private lazy val PredefML = buildFse(Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1), 6)
  private lazy val PredefOF = buildFse(Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1), 5)

  // literals-length / match-length code tables (§3.1.1.3.2.1.1) ----------
  private val LLBase = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536)
  private val LLBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11,
    12, 13, 14, 15, 16)
  private val MLBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
    19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539)
  private val MLBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
    11, 12, 13, 14, 15, 16)

  // ---------------------------------------------------------------------
  // Huffman (§4.2): max 11-bit codes, canonical by weight
  // ---------------------------------------------------------------------
  private final class HufTable(val maxBits: Int, val symbol: Array[Int],
                               val length: Array[Int]) {
    /** Packed (symbol << 8 | nbBits) per cell: ONE lookup in the hot
      * literal loop instead of two. */
    val packed: Array[Int] = Array.tabulate(symbol.length)(i =>
      (symbol(i) << 8) | length(i))
  }

  private def buildHuf(weights: Array[Int]): HufTable = {
    var total = 0L
    var i = 0
    while (i < weights.length) {
      if (weights(i) > 0) total += 1L << (weights(i) - 1)
      i += 1
    }
    if (total == 0) fail()
    val maxBits = highBit(total.toInt) + 1
    if (maxBits > 11) fail()
    val leftOver = (1L << maxBits) - total
    // the derived last weight must itself be a power of 2
    if (leftOver <= 0 || (leftOver & (leftOver - 1)) != 0) fail()
    val lastWeight = highBit(leftOver.toInt) + 1
    val w = java.util.Arrays.copyOf(weights, weights.length + 1)
    w(weights.length) = lastWeight
    val size = 1 << maxBits
    val sym = new Array[Int](size)
    val len = new Array[Int](size)
    var cur = 0
    var weight = 1
    while (weight <= maxBits) {
      var s2 = 0
      while (s2 < w.length) {
        if (w(s2) == weight) {
          val slots = 1 << (weight - 1)
          if (cur + slots > size) fail()
          var k = 0
          while (k < slots) { sym(cur + k) = s2; len(cur + k) = maxBits + 1 - weight; k += 1 }
          cur += slots
        }
        s2 += 1
      }
      weight += 1
    }
    if (cur != size) fail()
    new HufTable(maxBits, sym, len)
  }

  /** §4.2.1 weight decoding: headerByte < 128 → FSE-compressed weights
    * (two interleaved states, accuracy ≤ 6); ≥ 128 → direct 4-bit
    * pairs. Returns (table, bytes consumed incl. header byte). */
  private def readHufTable(b: Array[Byte], off: Int, end: Int): (HufTable, Int) = {
    if (off >= end) fail()
    val hv = b(off) & 0xFF
    modeCounters.incrementAndGet(if (hv >= 128) 18 else 19)
    if (hv >= 128) {
      val n = hv - 127
      val packed = (n + 1) / 2
      if (off + 1 + packed > end) fail()
      val weights = new Array[Int](n)
      var i = 0
      while (i < n) {
        val byte = b(off + 1 + i / 2) & 0xFF
        weights(i) = if (i % 2 == 0) byte >> 4 else byte & 0xF
        if (weights(i) > 11) fail()
        i += 1
      }
      (buildHuf(weights), 1 + packed)
    } else {
      // FSE-compressed weight stream of hv bytes
      if (off + 1 + hv > end) fail()
      val (tbl, hdrBytes) = readFseTable(b, off + 1, off + 1 + hv, 6, 255)
      val bs = new BackBits(b, off + 1 + hdrBytes, off + 1 + hv)
      var s1 = bs.read(tbl.accLog).toInt
      var s2 = bs.read(tbl.accLog).toInt
      val weights = new Array[Int](256)
      var n = 0
      var done = false
      while (!done) {
        if (n + 2 > 255) fail()
        weights(n) = tbl.symbol(s1); n += 1
        if (bs.pos < tbl.nbBits(s1)) {
          weights(n) = tbl.symbol(s2); n += 1; done = true
        } else {
          s1 = tbl.newState(s1) + bs.read(tbl.nbBits(s1)).toInt
          weights(n) = tbl.symbol(s2); n += 1
          if (bs.pos < tbl.nbBits(s2)) {
            weights(n) = tbl.symbol(s1); n += 1; done = true
          } else s2 = tbl.newState(s2) + bs.read(tbl.nbBits(s2)).toInt
        }
      }
      var i = 0
      while (i < n) { if (weights(i) > 11) fail(); i += 1 }
      (buildHuf(java.util.Arrays.copyOf(weights, n)), 1 + hv)
    }
  }

  /** Decode `count` literals from one Huffman substream. Hot loop: a
    * rolling 64-bit container over the tail of the window keeps the
    * per-symbol work at one shift+mask+lookup; the generic (zero-
    * padding) path only runs in the last few symbols of a stream. */
  private def hufDecodeStream(b: Array[Byte], start: Int, end: Int,
                              huf: HufTable, dst: Array[Byte], dstOff: Int,
                              count: Int): Unit = {
    val bs = new BackBits(b, start, end)
    val maxBits = huf.maxBits
    val mask = (1 << maxBits) - 1
    val packed = huf.packed
    var pos = bs.pos
    var cache = 0L
    var cacheLow = Int.MaxValue // bit index of cache's LSB; invalid until refill
    var i = 0
    while (i < count) {
      if (pos - maxBits >= 0) {
        if (pos - maxBits < cacheLow) {
          // refill: 8 bytes ending at the byte holding bit pos-1
          val hiByte = (pos - 1) >> 3
          val loByte = math.max(0, hiByte - 7)
          var bi = hiByte
          var v = 0L
          while (bi >= loByte) { v = (v << 8) | (b(start + bi) & 0xFFL); bi -= 1 }
          cache = v
          cacheLow = loByte << 3
        }
        val e = packed(((cache >>> (pos - maxBits - cacheLow)) & mask).toInt)
        dst(dstOff + i) = (e >> 8).toByte
        pos -= e & 0xFF
      } else {
        // stream tail: zero-padded peek via the generic reader
        if (pos <= -maxBits) fail() // ran past with output missing
        bs.pos = pos
        val e = packed(bs.peek(maxBits))
        dst(dstOff + i) = (e >> 8).toByte
        pos -= e & 0xFF
      }
      i += 1
    }
  }

  // ---------------------------------------------------------------------
  // compressed block (§3.1.1.3)
  // ---------------------------------------------------------------------
  private def decodeCompressedBlock(b: Array[Byte], off: Int, size: Int,
                                    out: Out, st: FrameState,
                                    frameStart: Int): Unit = {
    val end = off + size
    var i = off
    if (i >= end) fail()
    // ---- literals section header (§3.1.1.3.1.1) ----
    val h0 = b(i) & 0xFF
    val litType = h0 & 0x3
    modeCounters.incrementAndGet(litType)
    var litRegen = 0
    var litCompressed = -1
    var fourStreams = false
    litType match {
      case 0 | 1 => // raw / RLE literals
        (h0 >> 2) & 0x3 match {
          case 0 | 2 => litRegen = h0 >> 3; i += 1
          case 1 =>
            if (i + 2 > end) fail()
            litRegen = (h0 >> 4) | ((b(i + 1) & 0xFF) << 4); i += 2
          case _ =>
            if (i + 3 > end) fail()
            litRegen = (h0 >> 4) | ((b(i + 1) & 0xFF) << 4) |
              ((b(i + 2) & 0xFF) << 12)
            i += 3
        }
      case _ => // compressed / treeless
        (h0 >> 2) & 0x3 match {
          case 0 | 1 =>
            fourStreams = ((h0 >> 2) & 0x3) == 1
            if (i + 3 > end) fail()
            val v = h0 | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16)
            litRegen = (v >> 4) & 0x3FF
            litCompressed = (v >> 14) & 0x3FF
            i += 3
          case 2 =>
            fourStreams = true
            if (i + 4 > end) fail()
            val v = (h0.toLong | ((b(i + 1) & 0xFFL) << 8) |
              ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24))
            litRegen = ((v >> 4) & 0x3FFF).toInt
            litCompressed = ((v >> 18) & 0x3FFF).toInt
            i += 4
          case _ =>
            fourStreams = true
            if (i + 5 > end) fail()
            val v = (h0.toLong | ((b(i + 1) & 0xFFL) << 8) |
              ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24) |
              ((b(i + 4) & 0xFFL) << 32))
            litRegen = ((v >> 4) & 0x3FFFF).toInt
            litCompressed = ((v >> 22) & 0x3FFFF).toInt
            i += 5
        }
    }
    if (litRegen > BlockMax) fail()
    val literals = new Array[Byte](litRegen)
    litType match {
      case 0 => // raw
        if (i + litRegen > end) fail()
        System.arraycopy(b, i, literals, 0, litRegen)
        i += litRegen
      case 1 => // RLE
        if (i >= end) fail()
        java.util.Arrays.fill(literals, b(i))
        i += 1
      case t => // 2 compressed (new table) / 3 treeless (reuse)
        val litEnd = i + litCompressed
        if (litCompressed < 0 || litEnd > end) fail()
        var p = i
        if (t == 2) {
          val (huf, consumed) = readHufTable(b, p, litEnd)
          st.huf = huf
          p += consumed
        } else if (st.huf == null) fail()
        else if (!st.anyCompressed && st.dict != null)
          modeCounters.incrementAndGet(22) // treeless served by the dict
        val huf = st.huf
        modeCounters.incrementAndGet(if (fourStreams) 17 else 16)
        if (!fourStreams) {
          hufDecodeStream(b, p, litEnd, huf, literals, 0, litRegen)
        } else {
          if (p + 6 > litEnd) fail()
          val s1 = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
          val s2 = (b(p + 2) & 0xFF) | ((b(p + 3) & 0xFF) << 8)
          val s3 = (b(p + 4) & 0xFF) | ((b(p + 5) & 0xFF) << 8)
          p += 6
          val per = (litRegen + 3) / 4
          val lastN = litRegen - 3 * per
          if (lastN < 0) fail()
          val e1 = p + s1; val e2 = e1 + s2; val e3 = e2 + s3
          if (e3 > litEnd) fail()
          hufDecodeStream(b, p, e1, huf, literals, 0, per)
          hufDecodeStream(b, e1, e2, huf, literals, per, per)
          hufDecodeStream(b, e2, e3, huf, literals, 2 * per, per)
          hufDecodeStream(b, e3, litEnd, huf, literals, 3 * per, lastN)
        }
        i = litEnd
    }
    // ---- sequences section (§3.1.1.3.2) ----
    if (i >= end) fail()
    val s0 = b(i) & 0xFF; i += 1
    var nbSeq = 0
    if (s0 == 0) nbSeq = 0
    else if (s0 < 128) nbSeq = s0
    else if (s0 < 255) {
      if (i >= end) fail()
      nbSeq = ((s0 - 128) << 8) + (b(i) & 0xFF); i += 1
    } else {
      if (i + 2 > end) fail()
      nbSeq = (b(i) & 0xFF) + ((b(i + 1) & 0xFF) << 8) + 0x7F00; i += 2
    }
    if (nbSeq == 0) {
      if (i != end) fail()
      if (!out.ensure(litRegen)) fail()
      System.arraycopy(literals, 0, out.buf, out.len, litRegen)
      out.len += litRegen
      st.anyCompressed = true
      return
    }
    if (i >= end) fail()
    val modes = b(i) & 0xFF; i += 1
    if ((modes & 0x3) != 0) fail() // reserved bits must be zero
    def tableFor(mode: Int, predef: FseTable, prev: FseTable,
                 maxAcc: Int, maxSym: Int): FseTable = mode match {
      case 0 => predef
      case 1 =>
        if (i >= end) fail()
        val s = b(i) & 0xFF; i += 1
        if (s > maxSym) fail()
        rleFse(s)
      case 2 =>
        val (t, consumed) = readFseTable(b, i, end, maxAcc, maxSym)
        i += consumed
        t
      case _ =>
        if (prev == null) fail()
        if (!st.anyCompressed && st.dict != null)
          modeCounters.incrementAndGet(22) // repeat mode served by the dict
        prev
    }
    modeCounters.incrementAndGet(4 + ((modes >> 6) & 0x3))
    modeCounters.incrementAndGet(8 + ((modes >> 4) & 0x3))
    modeCounters.incrementAndGet(12 + ((modes >> 2) & 0x3))
    val llT = tableFor((modes >> 6) & 0x3, PredefLL, st.ll, 9, 35)
    val ofT = tableFor((modes >> 4) & 0x3, PredefOF, st.of, 8, 31)
    val mlT = tableFor((modes >> 2) & 0x3, PredefML, st.ml, 9, 52)
    st.ll = llT; st.of = ofT; st.ml = mlT
    // ---- the interleaved bitstream, read backward ----
    val bs = new BackBits(b, i, end)
    var llS = bs.read(llT.accLog).toInt
    var ofS = bs.read(ofT.accLog).toInt
    var mlS = bs.read(mlT.accLog).toInt
    var litPos = 0
    var seq = 0
    while (seq < nbSeq) {
      if (bs.pos < -64) fail()
      val ofCode = ofT.symbol(ofS)
      if (ofCode > 31) fail()
      val offVal = (1L << ofCode) + bs.read(ofCode)
      val mlCode = mlT.symbol(mlS)
      if (mlCode > 52) fail()
      val ml = MLBase(mlCode) + bs.read(MLBits(mlCode)).toInt
      val llCode = llT.symbol(llS)
      if (llCode > 35) fail()
      val ll = LLBase(llCode) + bs.read(LLBits(llCode)).toInt
      // repeated-offset resolution (§3.1.1.5)
      var offset = 0
      if (offVal > 3) {
        offset = (offVal - 3).toInt
        st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
      } else {
        val idx = offVal.toInt - 1 + (if (ll == 0) 1 else 0)
        offset = idx match {
          case 0 => st.rep1
          case 1 => st.rep2
          case 2 => st.rep3
          case _ => st.rep1 - 1
        }
        if (offset <= 0) fail()
        if (idx != 0) {
          if (idx != 1) st.rep3 = st.rep2
          st.rep2 = st.rep1
          st.rep1 = offset
        }
      }
      // execute: literals copy, then (possibly overlapping) match copy
      if (litPos + ll > litRegen) fail()
      if (!out.ensure(ll + ml)) fail()
      System.arraycopy(literals, litPos, out.buf, out.len, ll)
      out.len += ll; litPos += ll
      val avail = out.len - frameStart
      var mlRest = ml
      if (offset > avail) {
        // reaches before the frame: legal only into a dictionary's
        // content prefix (§5) — the copy starts `offset - avail` bytes
        // from the dictionary tail; whatever remains past the prefix
        // continues as a normal window copy (source lands exactly at
        // the frame start once the prefix part is consumed)
        val d = st.dict
        if (d == null) fail()
        val fromDict = offset - avail
        if (fromDict > d.content.length) fail()
        modeCounters.incrementAndGet(21)
        val n = math.min(ml, fromDict)
        System.arraycopy(d.content, d.content.length - fromDict,
          out.buf, out.len, n)
        out.len += n
        mlRest = ml - n
      }
      if (mlRest > 0) {
        if (offset >= mlRest) { // non-overlapping: one block copy
          System.arraycopy(out.buf, out.len - offset, out.buf, out.len, mlRest)
          out.len += mlRest
        } else { // overlapping run: classic LZ doubling copy — after each
          // pass the valid repetition ahead of src grows by the copied
          // amount, so chunks double until ml is covered
          val base = out.len
          var copied = 0
          while (copied < mlRest) {
            val chunk = math.min(offset + copied, mlRest - copied)
            System.arraycopy(out.buf, base - offset, out.buf, base + copied, chunk)
            copied += chunk
          }
          out.len += mlRest
        }
      }
      seq += 1
      if (seq < nbSeq) { // last sequence leaves the states un-updated
        llS = llT.newState(llS) + bs.read(llT.nbBits(llS)).toInt
        mlS = mlT.newState(mlS) + bs.read(mlT.nbBits(mlS)).toInt
        ofS = ofT.newState(ofS) + bs.read(ofT.nbBits(ofS)).toInt
      }
    }
    val rest = litRegen - litPos
    if (rest < 0 || !out.ensure(rest)) fail()
    System.arraycopy(literals, litPos, out.buf, out.len, rest)
    out.len += rest
    st.anyCompressed = true
  }
}

/** Decoded bytes of a zstd stream — strict (every frame must verify)
  * or salvage (valid-prefix of consecutive frames) per `salvage`.
  */
case class ZstdDecompressExpr(child: Expression, salvage: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String =
    if (salvage) "graft_zstd_frames" else "graft_zstd"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    if (salvage) ZstdDecode.decompressFramesData(input.asInstanceOf[Array[Byte]])
    else ZstdDecode.decompressData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val arr = ctx.freshName("arr")
      val fn = if (salvage) "decompressFramesData" else "decompressData"
      s"""
         |byte[] $arr = graft.functions.ZstdDecode.$fn($bytes);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Strict zstd decode against a per-row dictionary blob (RFC 8878 §5):
  * structured (entropy tables + recent offsets + content) or
  * raw-content; NULL/empty dictionary ≡ plain strict decode. */
case class ZstdDecompressDictExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_zstd_dict"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType | NullType, BinaryType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, BINARY), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(blob: Any, dict: Any): Any =
    ZstdDecode.decompressDictData(
      blob.asInstanceOf[Array[Byte]], dict.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, dict) => {
      val arr = ctx.freshName("arr")
      s"""
         |byte[] $arr = graft.functions.ZstdDecode.decompressDictData($blob, $dict);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The parsed seek table (zstd contrib seekable format) — one row per
  * frame with compressed/decompressed offsets and sizes; NULL when the
  * trailing table is absent, malformed, or inconsistent with the data
  * region it claims to describe. */
case class ZstdSeekTableExpr(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ZstdDecode.seekType
  override def prettyName: String = "graft_zstd_seektable"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ZstdDecode.seekTableData(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-access decode of ONE frame via the seek table — the split
  * path: at 100 TB each executor task reads the footer once and decodes
  * only its own frames. A leading 0x184D2A5D dictionary frame binds. */
case class ZstdSeekExtractExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_zstd_seekextract"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType | NullType,
            org.apache.spark.sql.types.LongType |
            org.apache.spark.sql.types.IntegerType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, INT/BIGINT), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(blob: Any, idx: Any): Any =
    ZstdDecode.seekExtractData(blob.asInstanceOf[Array[Byte]],
      idx.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, idx) => {
      val arr = ctx.freshName("arr")
      s"""
         |byte[] $arr = graft.functions.ZstdDecode.seekExtractData($blob, (int)($idx));
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The Common Crawl `.warc.zst` shard walk: a leading skippable frame
  * with magic 0x184D2A5D binds the shard dictionary (optionally itself
  * zstd-compressed) for every following data frame; salvage posture. */
case class ZstdCcFramesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_zstd_cc"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BINARY argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ZstdDecode.decompressCcData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val arr = ctx.freshName("arr")
      s"""
         |byte[] $arr = graft.functions.ZstdDecode.decompressCcData($bytes);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
