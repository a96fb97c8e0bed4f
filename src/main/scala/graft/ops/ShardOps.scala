package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Output-layout packing: assign ordered records to fixed-byte-budget
  * shards via a DISTRIBUTED prefix sum — what a 100 TB writer does to
  * cut its output into ~equal files without a single-partition sort.
  *
  * The naive plan — `sum(size) OVER (ORDER BY id)` — is a global
  * unpartitioned window: Spark executes it in ONE partition, the
  * textbook scale-killer. The two-phase scan here is how distributed
  * systems actually compute running totals:
  *
  *   1. per-bucket partial sums (`bucket = id div bucketWidth`) — one
  *      partial-agg shuffle to a table of O(#buckets) rows;
  *   2. exclusive bucket offsets by a window over THAT table only
  *      (buckets, not records — broadcast-sized metadata, the
  *      documented small-frame exception);
  *   3. offsets broadcast-joined back; the within-record running sum
  *      is a window PARTITIONED BY bucket — every bucket in parallel.
  *
  * The result is bit-identical to the naive global window (the
  * equivalence is asserted in ShardPackSpec) with no stage wider than
  * one bucket.
  */
object ShardOps {

  /** Exclusive-prefix-sum shard assignment: each record gets
    * `pfx` = sum of sizes of all records strictly before it (ordered
    * by `id`) and `shard_id = pfx div budget`. Shards are contiguous
    * `id` ranges; a shard's total size can exceed `budget` by at most
    * one record (the straddler stays in the shard it started in).
    */
  def packShards(items: DataFrame, id: String, size: String,
                 bucketWidth: Long, budget: Long): DataFrame = {
    val b = items.select(col(id), col(size).cast("long").as(size),
      expr(s"$id div $bucketWidth").as("__bk"))
    val offsets = b.groupBy(col("__bk"))
      .agg(sum(col(size)).as("__bsum"))
      .withColumn("__off", coalesce(
        sum(col("__bsum")).over(Window.orderBy(col("__bk"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bk"), col("__off"))
    val inBucket = Window.partitionBy(col("__bk")).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(offsets), "__bk")
      .withColumn("pfx", sum(col(size)).over(inBucket) - col(size) + col("__off"))
      .withColumn("shard_id", expr(s"pfx div $budget"))
      .select(col(id), col(size), col("pfx"), col("shard_id"))
  }
}
