package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Per-user session state for the flatMapGroupsWithState spec
  * (top-level so the Product encoder derives cleanly).
  */
case class SessState(start: Long, last: Long, n: Int)

/** Structured-Streaming semantics specs: incremental watermark windows
  * over a MemoryStream (append mode — late data dropped once the
  * watermark passes), and custom session state via
  * flatMapGroupsWithState. The bounded AvailableNow entries are
  * oracle-checked by the driver (queries p15-p17); these specs prove
  * the *incremental* behaviors the oracle can't see.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("append-mode tumbling window emits only watermark-closed bins and drops late rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val agg = in.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bin"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wmspec")
      .outputMode(OutputMode.Append()).start()

    // batch 1: two rows in the 00:00 bin, one in 00:15
    in.addData((ts("2024-01-01 00:01:00"), 1.0), (ts("2024-01-01 00:05:00"), 1.0),
      (ts("2024-01-01 00:16:00"), 1.0))
    q.processAllAvailable()
    assert(spark.table("wmspec").count() == 0) // nothing closed yet

    // batch 2: watermark → 00:30, closing both the 00:00 and 00:15 bins
    in.addData((ts("2024-01-01 00:40:00"), 1.0))
    q.processAllAvailable()
    val closed = spark.table("wmspec").collect()
      .map(r => r.getTimestamp(0).toString -> r.getAs[Long]("n")).toMap
    assert(closed == Map("2024-01-01 00:00:00.0" -> 2L, "2024-01-01 00:15:00.0" -> 1L))

    // batch 3: a row for the already-closed 00:00 bin is LATE → dropped
    in.addData((ts("2024-01-01 00:02:00"), 99.0))
    q.processAllAvailable()
    assert(spark.table("wmspec").count() == 2)
    q.stop()
  }

  test("flatMapGroupsWithState sessionizes with custom per-user state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gap = 1800L // seconds
    val in = MemoryStream[(Long, Long)] // (user_id, epoch_s)

    val sessions = in.toDF().toDF("user_id", "ep")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[SessState], (Long, Long, Long, Int)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[List[SessState]]) =>
          // fold sorted event times into gap-separated sessions; list
          // head is the open session, tail are closed ones
          val eps = rows.map(_._2).toList.sorted
          val merged = eps.foldLeft(state.getOption.getOrElse(Nil)) { (acc, ep) =>
            acc match {
              case head :: tail if ep - head.last < gap =>
                SessState(head.start, ep, head.n + 1) :: tail
              case all => SessState(ep, ep, 1) :: all
            }
          }
          merged match {
            case open :: closed =>
              state.update(List(open))
              closed.reverseIterator.map(s => (user, s.start, s.last, s.n))
            case Nil => Iterator.empty
          }
      }
      .toDF("user_id", "start_ep", "end_ep", "n_events")

    val q = sessions.writeStream.format("memory").queryName("fmgs")
      .outputMode(OutputMode.Append()).start()
    in.addData((7L, 1000L), (7L, 1100L), (7L, 1200L))
    q.processAllAvailable()
    assert(spark.table("fmgs").count() == 0) // one open session, none closed
    in.addData((7L, 5000L)) // gap > 1800 → closes the first session
    q.processAllAvailable()
    val rows = spark.table("fmgs").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("start_ep") == 1000L && r.getAs[Long]("end_ep") == 1200L
      && r.getAs[Int]("n_events") == 3)
    q.stop()
  }

  test("highWaterAlerts carries (count, max) state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val alerts = graft.streaming.StreamingOps.highWaterAlerts(
      in.toDF().toDF("user_id", "ts", "event_id", "value"))
    val q = alerts.writeStream.format("memory").queryName("hwm")
      .outputMode(OutputMode.Append()).start()

    // batch 1: rising then falling — alerts on 5.0 and 9.0 only
    in.addData((1L, ts("2024-01-01 00:00:00"), 10L, 5.0),
      (1L, ts("2024-01-01 00:01:00"), 11L, 9.0),
      (1L, ts("2024-01-01 00:02:00"), 12L, 7.0))
    q.processAllAvailable()
    assert(spark.table("hwm").collect().map(_.getLong(1)).sorted.toSeq == Seq(10L, 11L))

    // batch 2: 8.0 is under batch 1's max (state suppresses it — a batch
    // restart would wrongly alert); 9.5 beats it, with running_n
    // continued from batch 1's count, not restarted
    in.addData((1L, ts("2024-01-01 00:03:00"), 13L, 8.0),
      (1L, ts("2024-01-01 00:04:00"), 14L, 9.5))
    q.processAllAvailable()
    val rows = spark.table("hwm").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(rows.toSeq == Seq((10L, 1L, 5.0), (11L, 2L, 9.0), (14L, 5L, 9.5)))
    q.stop()
  }

  test("AvailableNow file stream over the fixture matches the batch aggregation") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingOps.runToMemory(
      graft.streaming.StreamingOps.tumblingAgg(
        graft.streaming.StreamingOps.eventsStream(spark, sf)),
      mode = "complete")
    val batch = queries.Tables.load(spark, sf, "events")
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("bin_start"),
        col("event_type"), col("n"))
    assert(streamed.select("bin_start", "event_type", "n").except(batch).isEmpty
      && batch.except(streamed.select("bin_start", "event_type", "n")).isEmpty)
  }

  test("checkpointed restart is exactly-once: a second run over the same " +
    "source reprocesses nothing") {
    // the recovery contract a 100 TB ingest pipeline depends on: source
    // offsets live in the checkpoint, so a restarted query must not
    // re-emit already-committed batches
    val sf = "/root/testdata/sf0.001"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-ckpt-out").toString
    def runOnce(): Long = {
      // file sink (memory sink cannot recover from a checkpoint)
      val q = graft.streaming.StreamingOps.tumblingAgg(
          graft.streaming.StreamingOps.eventsStream(spark, sf))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    val first = runOnce()
    assert(first > 0, "first run must emit the watermark-closed bins")
    // same checkpoint, unchanged source → no new offsets → no new rows
    assert(runOnce() == first,
      "restart from checkpoint must not reprocess committed data")
  }

  test("dropDuplicatesWithinWatermark suppresses duplicate keys across " +
    "micro-batches while key state lives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val dedup = in.toDF().toDF("ts", "user_id", "event_type")
      .withColumn("minute_bin", date_trunc("minute", col("ts")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "minute_bin")
    val q = dedup.writeStream.format("memory").queryName("ddwm")
      .outputMode(OutputMode.Append()).start()

    // batch 1: two rows with the SAME (user, type, minute) key → one out
    in.addData((ts("2024-01-01 00:00:10"), 1L, "click"),
      (ts("2024-01-01 00:00:40"), 1L, "click"),
      (ts("2024-01-01 00:01:10"), 1L, "click")) // different minute → kept
    q.processAllAvailable()
    assert(spark.table("ddwm").count() == 2)

    // batch 2: the same key again, watermark not yet past its expiry →
    // state suppresses it (this is what plain per-batch dedup can't do)
    in.addData((ts("2024-01-01 00:00:50"), 1L, "click"))
    q.processAllAvailable()
    assert(spark.table("ddwm").count() == 2)
    q.stop()
  }

  test("foreachBatch idempotent sink: batch-id gating makes a replayed " +
    "micro-batch a no-op (the exactly-once sink contract)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the pattern a transactional sink implements: remember the last
    // committed batchId; re-delivery of the same id (post-crash replay)
    // must not double-write
    val committed = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val sink = new scala.collection.mutable.ArrayBuffer[Long]()
    def writeBatch(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      if (committed.putIfAbsent(batchId, 1L) == null) {
        sink.synchronized { sink ++= df.as[Long].collect() }
      }
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("v").select(col("v"))
      .writeStream.foreachBatch(writeBatch _).start()
    in.addData(1L, 2L)
    q.processAllAvailable()
    assert(sink.sorted == Seq(1L, 2L))
    // replay the SAME batch id manually — the gate must reject it
    writeBatch(Seq(1L, 2L).toDF("v"), 0L)
    assert(sink.sorted == Seq(1L, 2L), "replayed batch id must be a no-op")
    in.addData(3L)
    q.processAllAvailable()
    assert(sink.sorted == Seq(1L, 2L, 3L))
    q.stop()
  }

  test("stream-static enrichment join holds no stream state and matches the batch join") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamingOps.runToMemory(
      graft.streaming.StreamingOps.segmentRevenue(
        graft.streaming.StreamingOps.eventsStream(spark, sf),
        queries.Tables.load(spark, sf, "customer")),
      mode = "complete")
    val batch = queries.Tables.load(spark, sf, "events")
      .join(queries.Tables.load(spark, sf, "customer"),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }
}
