package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Bloom filter over a string column — the membership summary
  * a distributed engine ships to PRUNE a join's probe side before the
  * shuffle (Spark's own injected runtime bloom filters have exactly
  * this shape; this one is engine-portable and deterministic).
  *
  * One `bits`-wide bitset, `k` hash probes per item: bit
  * `h60(r || ':' || x) mod bits` is set for each hash row `r`.
  * Membership test = all `k` probed bits set. No false negatives;
  * false positives at rate `(1 − e^{−k·n/bits})^k` — every pruned row
  * is provably safe to drop, every passed row is re-checked by the
  * real join, so the filter only ever SAVES shuffle volume.
  *
  * The hash family is the [[graft.ops.Portable]] md5 construction, so
  * the ENTIRE bitset is reproducible by any engine with md5: the
  * DuckDB oracle rebuilds the identical set-bit set in SQL and both
  * the popcount and every per-key membership verdict hash-match
  * (p112).
  *
  * Scale shape: a `TypedImperativeAggregate` → map-side partial
  * aggregation; each partition reduces to ONE `bits/64`-long word
  * array before the shuffle, partials merge by bitwise OR
  * (commutative/associative/idempotent — partitioning and retries
  * cannot change the state). State is O(bits) regardless of key
  * cardinality; the finished filter is a one-row frame the probe side
  * crossJoins (broadcast) and tests with codegen'd bit arithmetic.
  */
case class BloomSketchAgg(
    child: Expression,
    k: Int,
    bits: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_sketch"

  /** The packed bitset, `bits / 64` longs, little-endian bit order. */
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1 || bits < 64 || bits % 64 != 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k >= 1 and bits a positive multiple of 64")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](bits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < k) {
        val slot = (Cms.h60Local(s"$r:$s") % bits).toInt
        buf(slot >>> 6) |= 1L << (slot & 63)
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(bits / 64)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomSketchAgg =
    copy(child = newChildren(0))
}

object PBloom {

  /** Column API: the packed `bits`-wide Bloom bitset of a string column
    * as `array<bigint>` (`bits/64` words). NULLs are skipped.
    */
  def sketch(v: Column, k: Int, bits: Int): Column =
    GraftSql.column(BloomSketchAgg(
      GraftSql.expression(v), k, bits).toAggregateExpression())

  /** All 64 single-bit masks as a literal column, indexed by
    * `element_at(masks, bitInWord + 1)` — variable bit tests without a
    * variable-shift builtin, all codegen'd.
    */
  private def masks: Column =
    array((0 until 64).map(i => lit(1L << i)): _*)

  /** Membership probe of `key` (string column) against a packed bloom
    * column built with the same (k, bits): true iff all k probed bits
    * are set. Row-local, codegen'd — safe in the scan stage.
    */
  def mightContain(bloom: Column, key: Column, k: Int, bits: Int): Column =
    (0 until k).map { r =>
      val slot = graft.ops.Portable.h60(
        concat(lit(s"$r:"), key)) % lit(bits.toLong)
      val word = element_at(bloom, (slot / 64).cast("int") + lit(1))
      val mask = element_at(masks, (slot % 64).cast("int") + lit(1))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)

  /** Total set bits of a packed bloom column (popcount over words). */
  def popCount(bloom: Column): Column =
    aggregate(bloom, lit(0L), (acc, w) => acc + bit_count(w).cast("long"))
}
