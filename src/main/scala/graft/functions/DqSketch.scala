package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable decimal-bucket quantile sketch — the DDSketch idea
  * (relative-error-bounded log buckets, O(buckets) mergeable state) but
  * with EXACT DECIMAL bins, so every engine computes the identical
  * bucket for every value and the estimate is engine-reproducible
  * bit-for-bit (float `log`-based binning would disagree at bucket
  * boundaries across libm implementations; decimal digit-count binning
  * cannot).
  *
  * Bucket of a positive BIGINT `v` with `d` decimal digits: width
  * `g = 10^max(d-2, 0)` (two significant digits kept), lower bound
  * `lb = v - v % g`, estimate = bucket midpoint `lb + g div 2`. The
  * midpoint is within `g/2 <= 5%` of any member of the bucket, so every
  * quantile estimate carries a <=5% relative-error guarantee.
  *
  * Scale shape: a `TypedImperativeAggregate`, so Spark runs it with
  * MAP-SIDE PARTIAL AGGREGATION — each partition reduces to one bounded
  * bucket->count map per group (<= 90 buckets per decade, ~18 decades
  * max) before the shuffle, and partials merge by addition. A 100 TB
  * column's quantiles cost one scan plus a shuffle of O(partitions x
  * buckets) rows — never a sort, never the data.
  */
case class DqSketchQuantiles(
    child: Expression,
    qPpm: Seq[Int],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dq_quantiles"

  /** One estimate per requested quantile, in request order. */
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (qPpm.isEmpty || qPpm.exists(q => q <= 0 || q > 1000000))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName quantiles must be in (0, 1000000] ppm, got $qPpm")
    else if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty

  override def update(buf: mutable.LongMap[Long],
                      input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    // null or non-positive: unbinnable — skipped, like a NULL in any agg
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (x > 0) {
        val lb = DqSketch.bucketLb(x)
        buf.update(lb, buf.getOrElse(lb, 0L) + 1L)
      }
    }
    buf
  }

  override def merge(buf: mutable.LongMap[Long],
                     other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreach { case (lb, c) => buf.update(lb, buf.getOrElse(lb, 0L) + c) }
    buf
  }

  override def eval(buf: mutable.LongMap[Long]): Any =
    new GenericArrayData(DqSketch.quantiles(buf, qPpm).toArray[Any])

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (lb, c) => out.writeLong(lb); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.LongMap.empty[Long]
    (0 until n).foreach(_ => buf.update(in.readLong(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DqSketchQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DqSketchQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DqSketchQuantiles =
    copy(child = newChildren(0))
}

object DqSketch {

  /** Bucket width of a positive value: `10^max(digits-2, 0)` — exact
    * integer arithmetic, no float log.
    */
  def bucketWidth(v: Long): Long = {
    var g = 1L
    var t = v / 100 // g stays 1 while v has <= 2 digits
    while (t > 0) { g *= 10; t /= 10 }
    g
  }

  /** Bucket lower bound: `v - v % g`. Same digit count as `v` (the
    * leading digit survives), so the width is recomputable from it.
    */
  def bucketLb(v: Long): Long = { val g = bucketWidth(v); v - v % g }

  /** Quantile estimates from a bucket->count map: for each q (ppm),
    * rank `ceil(q*n)` in pure integers, then the midpoint of the first
    * bucket whose cumulative count reaches it. Empty sketch -> all 0.
    */
  def quantiles(buf: mutable.LongMap[Long], qPpm: Seq[Int]): Seq[Long] = {
    if (buf.isEmpty) return qPpm.map(_ => 0L)
    val sorted = buf.toSeq.sortBy(_._1)
    val n = sorted.iterator.map(_._2).sum
    qPpm.map { q =>
      // BigInt: q*n overflows Long past ~9.2e12 rows per group — the
      // exact scale this sketch exists for; the quotient always fits
      val rank = ((BigInt(q) * n + 999999) / 1000000).toLong
      var cum = 0L
      var est = 0L
      val it = sorted.iterator
      var done = false
      while (!done && it.hasNext) {
        val (lb, c) = it.next()
        cum += c
        // clamped midpoint: the top decade's lb + g/2 can pass
        // Long.MaxValue (lb up to 9.2e18, g/2 = 5e16)
        val half = bucketWidth(lb) / 2
        est = if (lb > Long.MaxValue - half) Long.MaxValue else lb + half
        if (cum >= rank) done = true
      }
      est
    }
  }

  /** Column API: quantile estimates (one per `qPpm` entry, in order) of
    * a positive BIGINT column, as `array<bigint>`. NULLs and
    * non-positive values are skipped.
    */
  def quantilesCol(v: Column, qPpm: Seq[Int]): Column =
    GraftSql.column(DqSketchQuantiles(
      GraftSql.expression(v.cast("long")), qPpm).toAggregateExpression())
}
