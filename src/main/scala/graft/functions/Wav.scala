package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** REAL PCM sample decode over RIFF/WAVE payloads — the step past
  * [[WavMeta]]'s header-only parse, and the audio analog of
  * [[Bmp]]'s pixel kernels: no codec library, because integer PCM IS
  * raw bytes (8-bit unsigned, 16-bit signed little-endian,
  * channel-interleaved frames). That makes per-channel waveform
  * features and nearest-neighbour resampling exact integer byte math,
  * runnable in the scan stage of a 100 TB audio-corpus pass as native
  * codegen'd expressions — one pass over the samples, no explode, no
  * shuffle. (Compressed audio codecs — MP3/AAC — would need a real
  * decoder library and stay out of scope; the reference's multimodal
  * columns are opaque binaries either way.)
  *
  * All kernels return NULL (never throw) on anything that is not a
  * complete integer-PCM WAV — mid-crawl truncation is data, not an
  * error. Mirrors the wasaffi posture of total functions over
  * untrusted payloads (reference: wasmedge_factory/src/udf.rs:82-115
  * maps guest failures to NULL-safe errors rather than crashes).
  */
object Wav {

  /** Column API: per-channel one-pass waveform features —
    * `array<array<long>>`, outer index = channel, inner =
    * [n_frames, sum, sum_abs, peak_abs, zero_crossings] over the
    * DECODED signed samples. NULL when not a parseable integer-PCM
    * WAV with its full data payload present.
    */
  def pcmStats(blob: Column): Column =
    GraftSql.column(WavPcmStatsExpr(GraftSql.expression(blob)))

  /** Column API: channel-0 nearest-neighbour resample to `n` frames —
    * `array<int>` of decoded signed samples, out[j] = in[j*frames/n]
    * (exact integer floor division, the same mapping as
    * [[Bmp.resample]]). NULL when unparseable.
    */
  def pcmResample(blob: Column, n: Int): Column =
    GraftSql.column(WavPcmResampleExpr(GraftSql.expression(blob), n))

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def fourCC(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private final val RIFF = 0x52494646
  private final val WAVE = 0x57415645
  private final val FMT = 0x666d7420
  private final val DATA = 0x64617461

  /** Decode-ready parse: `(dataOffset, channels, bytesPerSample, frames)`
    * or null. Stricter than [[WavMeta.parse]] because the PCM kernels
    * need the actual bytes: format tag must be 1 (integer PCM), bits
    * 8 or 16, 1..8 channels, and the data chunk's DECLARED payload
    * fully present in the buffer (a truncated tail would read past the
    * array). Bounded: frames capped so downstream loops stay Int-safe.
    */
  private def header(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 12 ||
      fourCC(b, 0) != RIFF || fourCC(b, 8) != WAVE) return null
    var pos = 12L
    var channels = -1; var bits = -1; var fmtTag = -1
    var dataOff = -1L; var dataSize = -1L
    while (pos + 8 <= b.length) {
      val p = pos.toInt
      val id = fourCC(b, p)
      val size = le32(b, p + 4)
      if (id == FMT && size >= 16 && pos + 8 + 16 <= b.length) {
        fmtTag = le16(b, p + 8)
        channels = le16(b, p + 10)
        bits = le16(b, p + 22)
      } else if (id == DATA) {
        dataOff = pos + 8
        dataSize = size
      }
      pos += 8 + size + (size & 1)
    }
    if (fmtTag != 1 || (bits != 8 && bits != 16)) return null
    if (channels < 1 || channels > 8) return null
    if (dataOff < 0 || dataOff + dataSize > b.length) return null
    val bytesPerSample = bits / 8
    val frameBytes = channels * bytesPerSample
    val frames = dataSize / frameBytes
    if (frames > (1 << 28)) return null // ~16 min at 192 kHz; Int-safe
    Array(dataOff.toInt, channels, bytesPerSample, frames.toInt)
  }

  /** Decoded signed sample for frame `i`, channel `c`: 8-bit PCM is
    * unsigned with a 128 offset; 16-bit is signed little-endian.
    */
  @inline private def sample(b: Array[Byte], off: Int, channels: Int,
                             bps: Int, i: Int, c: Int): Int = {
    val p = off + (i * channels + c) * bps
    if (bps == 1) (b(p) & 0xff) - 128
    else ((b(p) & 0xff) | (b(p + 1) << 8)).toShort.toInt
  }

  /** One pass over every frame: per-channel
    * [n_frames, sum, sum_abs, peak_abs, zero_crossings] where a zero
    * crossing is a sign-bit change between consecutive frames of the
    * same channel (`(v<0) != (prev<0)`). Returns nested Catalyst array
    * data or null. Static so generated code calls it directly.
    */
  def pcmStatsData(b: Array[Byte]): GenericArrayData = {
    val hd = header(b)
    if (hd == null) return null
    val off = hd(0); val channels = hd(1); val bps = hd(2); val frames = hd(3)
    val sum = new Array[Long](channels)
    val sumAbs = new Array[Long](channels)
    val peak = new Array[Long](channels)
    val zc = new Array[Long](channels)
    val prevNeg = new Array[Boolean](channels)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < channels) {
        val v = sample(b, off, channels, bps, i, c)
        sum(c) += v
        val a = if (v < 0) -v.toLong else v.toLong
        sumAbs(c) += a
        if (a > peak(c)) peak(c) = a
        val neg = v < 0
        if (i > 0 && neg != prevNeg(c)) zc(c) += 1L
        prevNeg(c) = neg
        c += 1
      }
      i += 1
    }
    val rows = new Array[Any](channels)
    var c = 0
    while (c < channels) {
      rows(c) = new GenericArrayData(
        Array(frames.toLong, sum(c), sumAbs(c), peak(c), zc(c)))
      c += 1
    }
    new GenericArrayData(rows)
  }

  /** Channel-0 nearest-neighbour resample to `n` output frames:
    * out[j] = decoded sample at source frame `j*frames/n` (integer
    * floor division — the [[Bmp.resampleData]] mapping in one
    * dimension). Returns Catalyst array data or null; null also when
    * the payload has zero frames (no source sample to read).
    */
  def pcmResampleData(b: Array[Byte], n: Int): GenericArrayData = {
    val hd = header(b)
    if (hd == null || n <= 0 || n > WavPcmResampleExpr.maxFrames) return null
    val off = hd(0); val channels = hd(1); val bps = hd(2); val frames = hd(3)
    if (frames == 0) return null
    val out = new Array[Int](n)
    var j = 0
    while (j < n) {
      val si = (j.toLong * frames / n).toInt
      out(j) = sample(b, off, channels, bps, si, 0)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-channel PCM waveform features of a WAV payload:
  * `array<array<long>>` (outer = channel, inner = [n_frames, sum,
  * sum_abs, peak_abs, zero_crossings]), NULL when not integer PCM
  * with a complete data payload.
  */
case class WavPcmStatsExpr(child: Expression)
    extends UnaryExpression with BmpInputCheck {

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_wav_pcm_stats"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Wav.pcmStatsData(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val arr = ctx.freshName("arr")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
         |  graft.functions.Wav.pcmStatsData($bytes);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Channel-0 nearest-neighbour PCM resample of a WAV payload to a
  * fixed frame count: `array<int>` of decoded signed samples, NULL
  * when unparseable or empty.
  */
case class WavPcmResampleExpr(child: Expression, n: Int)
    extends UnaryExpression with BmpInputCheck {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_wav_pcm_resample"
  override def nullable: Boolean = true

  // The NULL-never-throw contract covers the PAYLOAD; the target frame
  // count is the caller's request and a bad one fails analysis loudly
  // (same posture as BmpResampleExpr's grid cap).
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (n <= 0 || n > WavPcmResampleExpr.maxFrames)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName target frame count must satisfy 1 <= n <= " +
          s"${WavPcmResampleExpr.maxFrames}, got $n")
    else base
  }

  override def nullSafeEval(input: Any): Any =
    Wav.pcmResampleData(input.asInstanceOf[Array[Byte]], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val arr = ctx.freshName("arr")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $arr =
         |  graft.functions.Wav.pcmResampleData($bytes, $n);
         |if ($arr == null) { ${ev.isNull} = true; } else { ${ev.value} = $arr; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavPcmResampleExpr {
  /** Largest allowed output frame count (64 MB of ints per row). */
  val maxFrames: Int = 1 << 24
}
