package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Seekable-zstd WRITER — the write half of the 100-TB split story
  * whose read half ([[ZstdDecode.seekTable]]/`seekExtract`) landed in
  * r17. Emits fully standard output from the public specs (RFC 8878
  * frame format + the zstd contrib seekable-format spec):
  *
  *  - one zstd frame per input part, STORE mode: single-segment frame
  *    header with an exact Frame_Content_Size, content split into RAW
  *    blocks (≤ 64 KiB) and RLE blocks (byte runs ≥ 32 — the two block
  *    types every conforming decoder must implement; no entropy tables
  *    to build, so the writer is a one-pass scan-stage kernel);
  *  - the trailing 0x184D2A5E skippable seek-table frame: one
  *    (compressed size, decompressed size, XXH64-low32 checksum) entry
  *    per frame, footer with the frame count, descriptor 0x80
  *    (checksums present, reserved bits zero per the contrib spec),
  *    magic 0x8F92EAB1.
  *
  * Any seekable-aware reader (including this repo's, which VERIFIES the
  * per-frame checksums on extraction) can random-access the shards;
  * any plain zstd decoder reads them end to end (skippable frames are
  * skipped). ZstdSeekSpec round-trips the written shards through
  * zstd-jni as the independent-decoder proof.
  */
object ZstdSeekWrite {

  private final val DataMagic = 0xFD2FB528
  private final val SeekTableMagic = 0x184D2A5E
  private final val SeekFooterMagic = 0x8F92EAB1
  /** runs at least this long become RLE blocks (and the construction
    * algebra of the p275 oracle depends on this exact threshold). */
  final val RleMin = 32
  /** raw-block size cap (≤ the format's 128 KiB Block_Maximum_Size). */
  final val RawMax = 65536

  private def le32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def blockHeader(out: java.io.ByteArrayOutputStream,
      last: Boolean, btype: Int, size: Int): Unit = {
    val v = (if (last) 1 else 0) | (btype << 1) | (size << 3)
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF); out.write((v >> 16) & 0xFF)
  }

  /** One STORE-mode zstd frame for `content`. */
  private def emitFrame(out: java.io.ByteArrayOutputStream,
      content: Array[Byte]): Unit = {
    le32(out, DataMagic)
    val n = content.length
    // FHD: Single_Segment (0x20) + FCS field code in bits 7-6; with
    // single-segment, code 0 = 1 byte (0-255), 1 = 2 bytes (val-256),
    // 2 = 4 bytes, 3 = 8 bytes — exact content size, no window byte
    val fcsCode =
      if (n <= 255) 0 else if (n <= 65535 + 256) 1 else 2
    out.write(0x20 | (fcsCode << 6))
    fcsCode match {
      case 0 => out.write(n)
      case 1 => val v = n - 256; out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      case _ => le32(out, n)
    }
    if (n == 0) { blockHeader(out, last = true, 0, 0); return }
    @inline def runAt(i: Int): Int = {
      var j = i + 1
      while (j < n && content(j) == content(i)) j += 1
      j - i
    }
    var i = 0
    while (i < n) {
      val r = runAt(i)
      if (r >= RleMin) {
        // cap each RLE block at RawMax: RFC 8878 bounds Block_Size by
        // min(window, 128 KiB) and the 3-byte block header holds only
        // 21 size bits — a longer run is emitted as multiple RLE blocks
        var left = r
        while (left > 0) {
          val chunk = math.min(left, RawMax)
          blockHeader(out, i + chunk >= n, 1, chunk)
          out.write(content(i))
          i += chunk
          left -= chunk
        }
      } else {
        // raw block: extend past short runs until a long run or the cap
        val start = i
        i += r
        var stop = false
        while (!stop && i < n && i - start < RawMax) {
          val r2 = runAt(i)
          if (r2 >= RleMin) stop = true
          else i += math.min(r2, RawMax - (i - start))
        }
        blockHeader(out, i >= n, 0, i - start)
        out.write(content, start, i - start)
      }
    }
  }

  /** Build one seekable shard from the parts, one frame per part, with
    * the trailing seek table (per-frame XXH64-low32 checksums). */
  def buildData(parts: Array[Array[Byte]]): Array[Byte] = {
    if (parts == null) return null
    val out = new java.io.ByteArrayOutputStream()
    val cSizes = new Array[Int](parts.length)
    var k = 0
    while (k < parts.length) {
      val before = out.size()
      emitFrame(out, if (parts(k) == null) Array.emptyByteArray else parts(k))
      cSizes(k) = out.size() - before
      k += 1
    }
    // seek-table skippable frame
    le32(out, SeekTableMagic)
    le32(out, parts.length * 12 + 9)
    k = 0
    while (k < parts.length) {
      val p = if (parts(k) == null) Array.emptyByteArray else parts(k)
      le32(out, cSizes(k))
      le32(out, p.length)
      le32(out, (ZstdDecode.xxh64(p, 0, p.length) & 0xFFFFFFFFL).toInt)
      k += 1
    }
    le32(out, parts.length)
    out.write(0x80) // checksums present; reserved bits zero
    le32(out, SeekFooterMagic)
    out.toByteArray
  }

  /** Column API: `array<binary>` parts → one seekable-zstd shard blob. */
  def build(parts: Column): Column =
    GraftSql.column(ZstdSeekBuildExpr(GraftSql.expression(parts)))
}

/** `binary` seekable-zstd shard from `array<binary>` parts — one
  * STORE-mode frame per part + the contrib-spec seek table (see
  * [[ZstdSeekWrite]]). */
case class ZstdSeekBuildExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_zstd_seek_build"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(BinaryType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BINARY>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val parts = new Array[Array[Byte]](arr.numElements())
    var i = 0
    while (i < parts.length) {
      parts(i) = if (arr.isNullAt(i)) null else arr.getBinary(i)
      i += 1
    }
    ZstdSeekWrite.buildData(parts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      s"""
      byte[][] $parts = new byte[$arr.numElements()][];
      for (int $i = 0; $i < $parts.length; $i++) {
        $parts[$i] = $arr.isNullAt($i) ? null : $arr.getBinary($i);
      }
      ${ev.value} = graft.functions.ZstdSeekWrite.buildData($parts);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
