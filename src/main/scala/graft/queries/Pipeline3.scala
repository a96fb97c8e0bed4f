package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Portable, TextOps}

/** Training-data pipeline operators, part 3: the corpus-curation steps a
  * 100 TB pretraining build runs between raw scrape and tokenizer —
  * Gopher-style repetition filters, benchmark decontamination, CCNet-style
  * corpus-level segment dedup, stratified domain mixing, and int8
  * embedding quantization.
  *
  * All ratio outputs are SCALED INTEGERS (ppm / permille via floor
  * division) and all sums run over exact integers, so every oracle is
  * bit-exact cross-engine — no float rounding at any compare boundary.
  * The fixture has no newlines, so non-overlapping 8-token segments
  * ([[TextOps.segments]]) stand in for lines/paragraphs.
  */
object Pipeline3 {

  /** DuckDB mirrors — all from the shared [[TextSql]] object (one
    * definition repo-wide, so oracles can't drift from `TextOps`).
    */
  private val wsSql = TextSql.ws
  private def shinglesSql(ws: String, n: Int): String = TextSql.shingles(ws, n)
  private def segmentsSql(ws: String, n: Int): String = TextSql.segments(ws, n)

  val all: Seq[Q] = Seq(

    // ---- Gopher-style repetition filters -----------------------------------
    // Per-doc repetition signals (most-frequent-token share, duplicate
    // word-bigram share, duplicate 8-token-segment share) as ppm via
    // floor division. Everything is a higher-order array expression on
    // the row itself — zero shuffle, embarrassingly parallel, scales
    // with the scan. The O(distinct·n) mode count is per-document CPU
    // (docs are bounded), the deliberate trade against a corpus-wide
    // (doc_id, token) shuffle.
    Q("p31_repetition_stats", Some(s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      b AS (SELECT doc_id, ws, ${shinglesSql("ws", 2)} AS bg,
                   ${segmentsSql("ws", 8)} AS segs
            FROM w)
      SELECT doc_id,
        CAST(len(ws) AS BIGINT) AS n_tokens,
        CAST(list_max(list_transform(list_distinct(ws),
               t -> len(list_filter(ws, x -> x = t)))) * 1000000 // len(ws) AS BIGINT)
          AS top_token_ppm,
        CAST(CASE WHEN len(bg) = 0 THEN 0
                  ELSE (len(bg) - len(list_distinct(bg))) * 1000000 // len(bg) END AS BIGINT)
          AS dup_bigram_ppm,
        CAST(CASE WHEN len(segs) = 0 THEN 0
                  ELSE (len(segs) - len(list_distinct(segs))) * 1000000 // len(segs) END AS BIGINT)
          AS dup_seg_ppm
      FROM b ORDER BY doc_id""")) { (spark, dir) =>
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"),
          TextOps.shingles(col("text"), 2).as("bg"),
          TextOps.segments(col("text"), 8).as("segs"))
        .select(col("doc_id"),
          expr("CAST(size(ws) AS BIGINT)").as("n_tokens"),
          // CASTs before multiply: size() is INT and 5000 tokens * 1e6
          // would wrap a 32-bit int silently
          expr("""CAST(array_max(transform(array_distinct(ws),
                    t -> size(filter(ws, x -> x = t)))) AS BIGINT)
                  * 1000000 div CAST(size(ws) AS BIGINT)""").as("top_token_ppm"),
          expr("""CASE WHEN size(bg) = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(size(bg) - size(array_distinct(bg)) AS BIGINT)
                       * 1000000 div CAST(size(bg) AS BIGINT) END""").as("dup_bigram_ppm"),
          expr("""CASE WHEN size(segs) = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(size(segs) - size(array_distinct(segs)) AS BIGINT)
                       * 1000000 div CAST(size(segs) AS BIGINT) END""").as("dup_seg_ppm"))
        .orderBy(col("doc_id"))
    },

    // ---- benchmark decontamination -----------------------------------------
    // The eval-set leakage check every training corpus needs: the
    // benchmark set (deterministic fixture subset doc_id % 50 = 0)
    // contributes its distinct 3-gram shingles; each train doc reports
    // how many of its distinct shingles appear in any benchmark doc.
    // Plan shape (the scale-critical part): per-doc DISTINCT is
    // `array_distinct` on the shingle array — a row-local expression,
    // so the corpus-wide (doc_id, shingle) distinct SHUFFLE the naive
    // formulation needs never happens. Per-doc shingle counts come from
    // `size(shs)` on the same array — no groupBy. The tokenized corpus
    // is localCheckpoint'ed once (cluster analog: persist DISK_ONLY)
    // because three consumers read it; without that, Spark re-tokenizes
    // the corpus three times. The only remaining shuffles are over the
    // ~2% benchmark branch and the contaminated-hit counts. No forced
    // broadcast on the join: a real eval suite is small and
    // auto-broadcasts under the threshold, but this derived set grows
    // with the corpus — forcing it would OOM the driver at scale.
    Q("p32_decontam", Some(s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      sh AS (SELECT doc_id, unnest(${shinglesSql("ws", 3)}) AS s FROM w),
      ds AS (SELECT DISTINCT doc_id, s FROM sh),
      bench AS (SELECT DISTINCT s FROM ds WHERE doc_id % 50 = 0),
      train AS (SELECT doc_id, s FROM ds WHERE doc_id % 50 <> 0),
      cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM train GROUP BY doc_id),
      hit AS (SELECT doc_id, COUNT(*) AS n_contam
              FROM train JOIN bench USING (s) GROUP BY doc_id)
      SELECT c.doc_id, c.n_sh, coalesce(h.n_contam, 0) AS n_contam,
             CAST(coalesce(h.n_contam, 0) * 1000000 // c.n_sh AS BIGINT) AS contam_ppm,
             CASE WHEN coalesce(h.n_contam, 0) * 1000000 // c.n_sh >= 100000
                  THEN 1 ELSE 0 END AS flagged
      FROM cnt c LEFT JOIN hit h ON h.doc_id = c.doc_id
      ORDER BY c.doc_id""")) { (spark, dir) =>
      val shRaw = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), array_distinct(TextOps.shingles(col("text"), 3)).as("shs"))
      val sh = if (singlePass(spark, "graft.decontam.singlePass")) shRaw.localCheckpoint() else shRaw
      val bench = sh.filter(col("doc_id") % 50 === 0)
        .select(explode(col("shs")).as("s")).distinct()
      // size(shs) > 0 mirrors the oracle, where a doc under 3 tokens has
      // no shingle rows to unnest and so never reaches cnt — without it
      // a short doc would surface here with n_sh=0 and a NULL ppm
      val train = sh.filter(col("doc_id") % 50 =!= 0 && size(col("shs")) > 0)
      val cnt = train.select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"))
      val hit = train.select(col("doc_id"), explode(col("shs")).as("s"))
        .join(bench, "s")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contam"))
      cnt.join(hit, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_sh"),
          coalesce(col("n_contam"), lit(0L)).as("n_contam"))
        .withColumn("contam_ppm", expr("n_contam * 1000000 div n_sh"))
        .withColumn("flagged",
          when(col("contam_ppm") >= 100000, 1).otherwise(0))
        .orderBy(col("doc_id"))
    },

    // ---- corpus-level segment dedup (CCNet-style) --------------------------
    // Every 8-token segment is kept only at its FIRST corpus position
    // (min (doc_id, idx)); later copies anywhere in the corpus are
    // removed. Output: per-doc survivor counts + md5 of the kept text,
    // so the rewritten corpus itself is oracle-checked, not just counts.
    // Plan: ONE shuffle on the segment string to find first positions,
    // join back, per-doc agg. The segment stream feeds both sides;
    // localCheckpoint (flagged, default on — p25 convention) runs
    // tokenization once instead of twice at 100 TB.
    Q("p33_segment_dedup", Some(s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      segd AS (SELECT doc_id, ${segmentsSql("ws", 8)} AS segs FROM w),
      seg AS (SELECT doc_id, unnest(generate_series(1, len(segs))) AS idx,
                     unnest(segs) AS seg FROM segd),
      firsts AS (SELECT seg, min({'d': doc_id, 'i': idx}) AS first_pos
                 FROM seg GROUP BY seg),
      k AS (SELECT s.doc_id, s.idx, s.seg,
                   CASE WHEN {'d': s.doc_id, 'i': s.idx} = f.first_pos
                        THEN 1 ELSE 0 END AS keep
            FROM seg s JOIN firsts f USING (seg)),
      agg AS (SELECT doc_id, COUNT(*) AS n_segs, CAST(SUM(keep) AS BIGINT) AS n_kept,
                     md5(coalesce(string_agg(CASE WHEN keep = 1 THEN seg END,
                                             ' ' ORDER BY idx), '')) AS kept_md5
              FROM k GROUP BY doc_id)
      SELECT d.doc_id, coalesce(a.n_segs, 0) AS n_segs,
             coalesce(a.n_kept, 0) AS n_kept,
             coalesce(a.kept_md5, md5('')) AS kept_md5
      FROM documents d LEFT JOIN agg a USING (doc_id)
      ORDER BY doc_id""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
      val segRaw = docs
        .select(col("doc_id"), posexplode(TextOps.segments(col("text"), 8))
          .as(Seq("i0", "seg")))
        .select(col("doc_id"), (col("i0") + 1).as("idx"), col("seg"))
      val seg = if (singlePass(spark, "graft.segdedup.singlePass")) segRaw.localCheckpoint() else segRaw
      // lexicographic struct min: collision-free first position for ANY
      // doc length (an integer encoding like doc_id*1e6+idx would alias
      // past 1M segments/doc — silent corruption at raw-scrape scale)
      val pos = struct(col("doc_id"), col("idx"))
      val firsts = seg.groupBy(col("seg")).agg(min(pos).as("first_pos"))
      val agg = seg.join(firsts, "seg")
        .withColumn("keep", when(pos === col("first_pos"), 1).otherwise(0))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_segs"), sum(col("keep")).cast("long").as("n_kept"),
          md5(array_join(transform(
            array_sort(collect_list(when(col("keep") === 1,
              struct(col("idx"), col("seg"))))),
            s => s.getField("seg")), " ")).as("kept_md5"))
      docs.select(col("doc_id"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_segs"), lit(0L)).as("n_segs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("kept_md5"), md5(lit(""))).as("kept_md5"))
        .orderBy(col("doc_id"))
    },

    // ---- stratified domain mixing ------------------------------------------
    // Per-source target sampling rates (deterministic permille derived
    // from the source index) applied via the salted portable hash —
    // reproducible on any fleet, no rand(). Output audits target vs
    // realized rate per source. Pure scan filter + one tiny shuffle.
    Q("p34_domain_mix", Some(s"""
      WITH d AS (SELECT doc_id, source,
                        TRY_CAST(substr(source, 4) AS INTEGER) AS si FROM documents),
      t AS (SELECT doc_id, source, 100 + (si * 97) % 800 AS target_permille,
                   CASE WHEN ${Portable.h60Sql("concat('mix:', CAST(doc_id AS VARCHAR))")} % 1000
                        < 100 + (si * 97) % 800 THEN 1 ELSE 0 END AS kept
            FROM d)
      SELECT source, CAST(target_permille AS BIGINT) AS target_permille,
             COUNT(*) AS n_docs, CAST(SUM(kept) AS BIGINT) AS n_kept,
             CAST(CAST(SUM(kept) AS BIGINT) * 1000 // COUNT(*) AS BIGINT) AS realized_permille
      FROM t GROUP BY source, target_permille
      ORDER BY source""")) { (spark, dir) =>
      // full suffix (no length cap) + NULL on malformed, matching the
      // oracle's TRY_CAST — both engines agree on any future source shape
      val si = expr("substr(source, 4)").cast("int")
      val target = (lit(100) + (si * 97) % 800).cast("long")
      val kept = when(Portable.h60(concat(lit("mix:"),
        col("doc_id").cast("string"))) % 1000 < target, 1).otherwise(0)
      Tables.loadSpread(spark, dir, "documents")
        .select(col("source"), target.as("target_permille"), kept.as("kept"))
        .groupBy(col("source"), col("target_permille"))
        .agg(count(lit(1)).as("n_docs"), sum(col("kept")).cast("long").as("n_kept"))
        .withColumn("realized_permille", expr("n_kept * 1000 div n_docs"))
        .orderBy(col("source"))
    },

    // ---- int8 embedding quantization ---------------------------------------
    // Per-dimension min/max scalar quantization to 0..255 — the memory
    // layout ANN serving uses. All arithmetic is integer micro-units
    // (round(x*1e6) as BIGINT), so quantized codes AND reconstruction
    // error are bit-exact cross-engine. Plan: pass 1 = 64-row stats agg
    // (broadcast back), pass 2 = quantize + per-vector agg — the
    // standard two-pass shape; the stats join is a broadcast, never a
    // shuffle of the vectors.
    Q("p35_quantize_int8", Some("""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cx AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, i, CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      st AS (SELECT i, min(ri) AS lo, max(ri) AS hi FROM c GROUP BY i),
      q AS (SELECT vec_id, c.i,
                   CASE WHEN hi = lo THEN 0
                        ELSE (ri - lo) * 255 // (hi - lo) END AS qv,
                   CASE WHEN hi = lo THEN abs(ri - lo)
                        ELSE abs(ri - (lo + ((ri - lo) * 255 // (hi - lo)) * (hi - lo) // 255))
                        END AS err
            FROM c JOIN st ON st.i = c.i)
      SELECT vec_id, md5(string_agg(CAST(qv AS VARCHAR), ',' ORDER BY i)) AS q_md5,
             CAST(SUM(qv) AS BIGINT) AS sum_q, CAST(SUM(err) AS BIGINT) AS sum_err
      FROM q GROUP BY vec_id ORDER BY vec_id""")) { (spark, dir) =>
      val c = Tables.loadSpread(spark, dir, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding").cast("array<double>"))
          .as(Seq("i0", "x")))
        .select(col("vec_id"), (col("i0") + 1).as("i"),
          round(col("x") * 1000000, 0).cast("long").as("ri"))
      val st = c.groupBy(col("i")).agg(min(col("ri")).as("lo"), max(col("ri")).as("hi"))
      c.join(broadcast(st), "i")
        .select(col("vec_id"), col("i"),
          when(col("hi") === col("lo"), lit(0L))
            .otherwise(expr("(ri - lo) * 255 div (hi - lo)")).as("qv"),
          when(col("hi") === col("lo"), abs(col("ri") - col("lo")))
            .otherwise(expr(
              "abs(ri - (lo + ((ri - lo) * 255 div (hi - lo)) * (hi - lo) div 255))"))
            .as("err"))
        .groupBy(col("vec_id"))
        .agg(
          md5(array_join(transform(
            array_sort(collect_list(struct(col("i"), col("qv")))),
            s => s.getField("qv").cast("string")), ",")).as("q_md5"),
          sum(col("qv")).as("sum_q"), sum(col("err")).as("sum_err"))
        .orderBy(col("vec_id"))
    },

    // ---- sequence packing (training-batch construction) --------------------
    // Assigns every document a position in a fixed-length (2048-token)
    // training sequence stream: documents are sharded by a salted
    // portable hash, and within a shard each doc's start offset is the
    // running token total of its predecessors (doc_id order). bin =
    // which sequence the doc STARTS in, off_in_bin = where. This is the
    // offset-binning packing real pipelines use when docs may straddle
    // sequence boundaries (truncate/continue at the boundary).
    //
    // Scale shape: the cumulative sum is a window per SHARD, so the
    // only ordered sort is shard-local — shard count is the parallelism
    // knob (8 here; thousands on a fleet). A single global cumsum would
    // serialize the corpus through one partition; sharding is what
    // makes packing embarrassingly parallel AND deterministically
    // reproducible (hash, not round-robin) on any cluster size.
    Q("p37_seq_packing", Some(s"""
      WITH d AS (SELECT doc_id, CAST(len($wsSql) AS BIGINT) AS n_tokens,
                        ${Portable.h60Sql("concat('pack:', CAST(doc_id AS VARCHAR))")} % 8 AS shard
                 FROM documents),
      o AS (SELECT doc_id, shard, n_tokens,
                   coalesce(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
            FROM d)
      SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens,
             CAST(start_off AS BIGINT) AS start_off,
             CAST(start_off // 2048 AS BIGINT) AS bin,
             CAST(start_off % 2048 AS BIGINT) AS off_in_bin
      FROM o ORDER BY doc_id""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"),
          (Portable.h60(concat(lit("pack:"), col("doc_id").cast("string"))) % 8)
            .as("shard"))
        .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("shard"), col("n_tokens"), col("start_off"),
          expr("start_off div 2048").as("bin"),
          (col("start_off") % 2048).as("off_in_bin"))
        .orderBy(col("doc_id"))
    },

    // ---- bloom-prefiltered decontamination (semi-join reduction) -----------
    // The decontamination join done the way a 100 TB pass has to: the
    // benchmark side's distinct shingles build ONE bloom-filter binary
    // (graft.functions.Bloom — the Catalyst BloomFilterAggregate /
    // BloomFilterMightContain machinery Spark's runtime filtering uses
    // but doesn't expose), shipped to every task as a scalar subquery;
    // the train side is pre-filtered BEFORE the shuffle join, so only
    // probable hits are ever shuffled — a few MB of bloom instead of
    // re-shuffling the whole corpus. Bloom filters have no false
    // negatives and the exact join downstream removes false positives,
    // so the result is IDENTICAL to the unfiltered join — the oracle is
    // the plain exact-join SQL, which is the strongest possible check
    // that the reduction is lossless.
    Q("p39_bloom_decontam", Some(s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      sh AS (SELECT doc_id, unnest(${shinglesSql("ws", 3)}) AS s FROM w),
      ds AS (SELECT DISTINCT doc_id, s FROM sh),
      bench AS (SELECT DISTINCT s FROM ds WHERE doc_id % 50 = 0),
      train AS (SELECT doc_id, s FROM ds WHERE doc_id % 50 <> 0)
      SELECT doc_id, COUNT(*) AS n_contam
      FROM train JOIN bench USING (s)
      GROUP BY doc_id ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.Bloom
      val shRaw = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(TextOps.shingles(col("text"), 3))).as("s"))
      val sh = if (singlePass(spark, "graft.decontam.singlePass")) shRaw.localCheckpoint() else shRaw
      val bench = sh.filter(col("doc_id") % 50 === 0).select(col("s")).distinct()
      val bloom = bench.agg(Bloom.agg(xxhash64(col("s")), 200000L, 1600000L))
      sh.filter(col("doc_id") % 50 =!= 0)
        .filter(Bloom.mightContain(bloom, xxhash64(col("s"))))
        .join(bench, "s")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contam"))
        .orderBy(col("doc_id"))
    },

    // ---- overlapping-window document chunking ------------------------------
    // RAG / context-window prep: each doc becomes overlapping 128-token
    // chunks at stride 64 (chunk i starts at token i*64, clamped at the
    // doc end), identified by (doc_id, chunk_idx) with an md5 of the
    // chunk text so the rewritten chunks themselves are oracle-checked.
    // Row-local higher-order exprs → zero shuffle, scales with the scan;
    // the fan-out is bounded (≈ len/64 chunks per doc).
    Q("p40_chunking", Some(s"""
      WITH w AS (SELECT doc_id, $wsSql AS ws FROM documents),
      c AS (SELECT doc_id, ws,
                   unnest(generate_series(0, CAST((len(ws)+63)//64 AS INT) - 1)) AS idx
            FROM w)
      SELECT doc_id, CAST(idx AS BIGINT) AS chunk_idx,
             CAST(idx * 64 AS BIGINT) AS start_tok,
             CAST(len(ws[(idx*64+1):(idx*64+128)]) AS BIGINT) AS n_tok,
             md5(array_to_string(ws[(idx*64+1):(idx*64+128)], ' ')) AS chunk_md5
      FROM c ORDER BY doc_id, chunk_idx""")) { (spark, dir) =>
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, (size(ws) + 63) div 64 - 1)," +
            " i -> slice(ws, i * 64 + 1, 128))")).as(Seq("idx", "chunk")))
        .select(col("doc_id"), col("idx").cast("long").as("chunk_idx"),
          (col("idx") * 64).cast("long").as("start_tok"),
          size(col("chunk")).cast("long").as("n_tok"),
          md5(array_join(col("chunk"), " ")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // ---- deterministic per-group reservoir sample ---------------------------
    // Eval-set construction: a uniform k=5 sample PER SOURCE, chosen as
    // the k lowest salted portable hashes — reproducible on any fleet
    // (no rand()), stable under corpus growth for the docs that stay.
    // One shuffle (the per-source window rank); each group sorts only
    // its own rows. At extreme per-group cardinality the refinement is
    // a partial per-partition top-k before the window — noted, not
    // needed while groups are orders of magnitude under partition size.
    Q("p43_reservoir_sample", Some(s"""
      WITH h AS (SELECT doc_id, source,
                        ${Portable.h60Sql("concat('rsv:', CAST(doc_id AS VARCHAR))")} AS hk
                 FROM documents),
      r AS (SELECT doc_id, source, hk,
                   row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rk
            FROM h)
      SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, hk
      FROM r WHERE rk <= 5 ORDER BY source, rk""")) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          Portable.h60(concat(lit("rsv:"), col("doc_id").cast("string"))).as("hk"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk"), col("doc_id"), col("hk"))
        .orderBy(col("source"), col("rk"))
    }
  )
}
