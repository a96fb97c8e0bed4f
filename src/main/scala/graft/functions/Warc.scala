package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL WARC/1.0 (ISO 28500) shard build + salvage walk — the container
  * format of web-crawl corpora (Common Crawl ships as WARC files of
  * request/response record pairs; a 100 TB crawl ingest's first pass is
  * exactly this record walk). Structure is line-oriented: a
  * `WARC/1.0\r\n` version line, CRLF header lines (`WARC-Type`,
  * `WARC-Target-URI`, `Content-Length`, …), a blank line, exactly
  * `Content-Length` payload bytes, then the spec's two terminating
  * CRLFs. Records concatenate back to back. (Production Common Crawl
  * gzips each record as its own member — that composition is the p80
  * gzip kernel; this kernel owns the record framing.)
  *
  * The walk is a SALVAGE walk, the same posture as the tar/ZIP kernels
  * (mid-crawl truncation is normal, not exceptional): records are
  * consumed while the version line, headers, declared length, and the
  * terminating CRLFCRLF all verify IN BOUNDS; the first malformed
  * record stops the walk and the valid prefix is kept. A record-bomb
  * cap and per-record header caps bound the loop on lying shards.
  */
object Warc {

  private final val MaxRecords = 64
  private final val MaxHeaderLines = 32
  private final val MaxLineBytes = 1024
  private final val CrLf = "\r\n"
  /** Fixed WARC-Date (build determinism; real crawlers stamp wall time). */
  private final val Date = "2024-01-01T00:00:00Z"

  /** Column API: build a deterministic 2-record WARC shard — a
    * `request` record with payload `reqPayload`, then a `response`
    * record with payload `respPayload`, both under `uri`. `mode` 0 =
    * well-formed; 1 = shard cut 40 bytes into the response record
    * (mid-crawl truncation); 2 = the response record's version line
    * bit-rotted (`WARX/1.0`). Payloads are written as UTF-8.
    */
  def build(uri: Column, reqPayload: Column, respPayload: Column,
            mode: Column): Column =
    GraftSql.column(WarcBuildExpr(GraftSql.expression(uri),
      GraftSql.expression(reqPayload), GraftSql.expression(respPayload),
      GraftSql.expression(mode)))

  /** Column API: salvage walk →
    * struct(n_records, n_responses, payload_bytes, shard_bytes).
    */
  def walk(blob: Column): Column =
    GraftSql.column(WarcWalkExpr(GraftSql.expression(blob)))

  /** Column API: ARRAY<BINARY> of response-record payloads from the
    * salvaged prefix (empty array when the walk salvages none). */
  def responses(blob: Column): Column =
    GraftSql.column(WarcResponsesExpr(GraftSql.expression(blob)))

  private def record(tpe: String, uri: String,
                     payload: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.0").append(CrLf)
      .append("WARC-Type: ").append(tpe).append(CrLf)
      .append("WARC-Target-URI: ").append(uri).append(CrLf)
      .append("WARC-Date: ").append(Date).append(CrLf)
      .append("Content-Length: ").append(payload.length).append(CrLf)
      .append(CrLf)
      .toString.getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  def buildBytes(uri: String, req: Array[Byte], resp: Array[Byte],
                 mode: Int): Array[Byte] = {
    val r1 = record("request", uri, req)
    val r2 = record("response", uri, resp)
    val full = new Array[Byte](r1.length + r2.length)
    System.arraycopy(r1, 0, full, 0, r1.length)
    System.arraycopy(r2, 0, full, r1.length, r2.length)
    mode match {
      case 1 => java.util.Arrays.copyOf(full, r1.length + 40)
      case 2 => full(r1.length + 3) = 'X'.toByte; full // WARC → WARX
      case _ => full
    }
  }

  /** (n_records, n_responses, payload_bytes, shard_bytes) — never null,
    * never throws: the first unverifiable record stops the walk with
    * the salvaged prefix counted.
    */
  def walkData(b: Array[Byte]): InternalRow = {
    var n = 0L
    var nResp = 0L
    var payload = 0L
    walkRecords(b) { (isResponse, _, len) =>
      n += 1
      if (isResponse) nResp += 1
      payload += len
    }
    InternalRow(n, nResp, payload, b.length.toLong)
  }

  /** Response-record payload slices from the salvaged prefix — the
    * extraction a crawl ingest actually needs once the walk verifies
    * the framing: documents OUT of the shard, byte-exact. Same salvage
    * posture and caps as [[walkData]] (ONE shared parsing loop). */
  def responsePayloadsData(b: Array[Byte]): Array[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    walkRecords(b) { (isResponse, start, len) =>
      if (isResponse) {
        val p = new Array[Byte](len)
        System.arraycopy(b, start, p, 0, len)
        out += p
      }
    }
    out.toArray
  }

  /** The record walk shared by every consumer: verifies each record's
    * framing in bounds and hands (isResponse, payloadStart, payloadLen)
    * to the collector; the first malformed record stops the walk.
    */
  private def walkRecords(b: Array[Byte])(
      onRecord: (Boolean, Int, Int) => Unit): Unit = {
    var i = 0
    var n = 0L
    var stop = false
    def lineEnd(from: Int): Int = {
      // index just past the next CRLF, or -1 if none within caps/bounds
      var j = from
      val lim = math.min(b.length - 1, from + MaxLineBytes)
      while (j < lim) {
        if (b(j) == '\r' && b(j + 1) == '\n') return j + 2
        j += 1
      }
      -1
    }
    def startsWith(at: Int, s: String): Boolean = {
      if (at + s.length > b.length) return false
      var j = 0
      while (j < s.length) {
        if (b(at + j) != s.charAt(j).toByte) return false
        j += 1
      }
      true
    }
    while (!stop && i < b.length && n < MaxRecords) {
      if (!startsWith(i, "WARC/1.0\r\n")) { stop = true }
      else {
        var p = i + 10
        var contentLength = -1L
        var isResponse = false
        var lines = 0
        var headersEnd = -1
        while (headersEnd < 0 && lines < MaxHeaderLines) {
          val e = lineEnd(p)
          if (e < 0) { lines = MaxHeaderLines } // malformed: no CRLF
          else if (e == p + 2) { headersEnd = e } // blank line
          else {
            if (startsWith(p, "Content-Length: ")) {
              var v = 0L
              var j = p + 16
              var any = false
              while (j < e - 2 && b(j) >= '0' && b(j) <= '9') {
                v = v * 10 + (b(j) - '0'); any = true; j += 1
              }
              // digits must run to the CRLF, else the value is garbage
              if (any && j == e - 2) contentLength = v
            } else if (startsWith(p, "WARC-Type: response\r\n")) {
              isResponse = true
            }
            p = e
            lines += 1
          }
        }
        if (headersEnd < 0 || contentLength < 0 ||
            contentLength > Int.MaxValue.toLong ||
            headersEnd + contentLength + 4 > b.length ||
            b(headersEnd + contentLength.toInt) != '\r' ||
            b(headersEnd + contentLength.toInt + 1) != '\n' ||
            b(headersEnd + contentLength.toInt + 2) != '\r' ||
            b(headersEnd + contentLength.toInt + 3) != '\n') {
          stop = true
        } else {
          n += 1
          onRecord(isResponse, headersEnd, contentLength.toInt)
          i = headersEnd + contentLength.toInt + 4
        }
      }
    }
  }

  val walkType: StructType = StructType(Seq(
    StructField("n_records", LongType, nullable = false),
    StructField("n_responses", LongType, nullable = false),
    StructField("payload_bytes", LongType, nullable = false),
    StructField("shard_bytes", LongType, nullable = false)))
}

/** Build expression: (uri, reqPayload, respPayload, mode) → binary. */
case class WarcBuildExpr(uri: Expression, req: Expression, resp: Expression,
                         mode: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(uri, req, resp, mode)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_build"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    Warc.buildBytes(
      vs(0).asInstanceOf[UTF8String].toString,
      vs(1).asInstanceOf[UTF8String].getBytes,
      vs(2).asInstanceOf[UTF8String].getBytes,
      vs(3).asInstanceOf[Number].intValue())
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(uri = newChildren(0), req = newChildren(1), resp = newChildren(2),
      mode = newChildren(3))
}

/** Salvage walk expression: binary → struct(n_records, n_responses,
  * payload_bytes, shard_bytes).
  */
case class WarcWalkExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = Warc.walkType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_walk"

  override def nullSafeEval(input: Any): Any =
    Warc.walkData(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Response-payload extraction: binary → ARRAY<BINARY> of the salvaged
  * prefix's response-record payloads, byte-exact.
  */
case class WarcResponsesExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_responses"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Warc.responsePayloadsData(input.asInstanceOf[Array[Byte]])
        .asInstanceOf[Array[Any]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
