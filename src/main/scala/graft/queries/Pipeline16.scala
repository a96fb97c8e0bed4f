package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Portable, TextOps}

/** Round-10 pipeline entries: lossless prefix-filtered similarity join
  * (the capless exact path next to the capped LSH machinery), the ZIP
  * archive walk completing the codec family, the magic-byte ingest
  * router in front of it, closed-form shard-to-worker scheduling, and
  * fill-in-the-middle span planning for code-LM training prep.
  */
object Pipeline16 {

  private val wsSql = TextSql.ws

  // p236 Jaccard threshold is t = 4/5: J ≥ t ⟺ 9·|∩| ≥ 4·(|x|+|y|),
  // exact in integers; prefix length n − ⌈0.8n⌉ + 1 ≈ n/5 keeps the
  // inverted index a fifth of the corpus.

  /** ONE oracle for both faces of the decayed top-k (p245 batch,
    * p248 streaming-state) — the ksOracle discipline: sharing the text
    * makes the batch ≡ stream equivalence inseparable.
    */
  private val decayedTopkOracle: String = """
      WITH e AS (SELECT event_type,
                        CAST(date_trunc('day', ts) AS DATE) AS day
                 FROM events),
      b AS (SELECT max(day) AS hi FROM e),
      w AS (SELECT event_type,
                   CAST(1 AS BIGINT) << (11 - datediff('day', day, hi))
                     AS wt
            FROM e, b WHERE datediff('day', day, hi) < 12),
      s AS (SELECT event_type, CAST(sum(wt) AS BIGINT) AS decayed,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM w GROUP BY 1),
      r AS (SELECT event_type, decayed, n_events,
                   row_number() OVER (ORDER BY decayed DESC, event_type)
                     AS rnk,
                   row_number() OVER (ORDER BY n_events DESC, event_type)
                     AS rank_by_raw
            FROM s)
      SELECT event_type, decayed, n_events, CAST(rnk AS BIGINT) AS rnk,
             CAST(rank_by_raw AS BIGINT) AS rank_by_raw
      FROM r WHERE rnk <= 5 ORDER BY rnk"""

  /** Decayed top-5 from (event_type, day, cnt) counts — the shared
    * final stage of p245 (batch counts) and p248 (streamed state). */
  private def decayedFromDayCounts(cnts: org.apache.spark.sql.DataFrame) = {
    val hi = cnts.agg(max(col("day")).as("hi"))
    val s = cnts.crossJoin(broadcast(hi))
      .where(datediff(col("hi"), col("day")) < 12)
      .select(col("event_type"),
        (col("cnt") *
          expr("shiftleft(cast(1 as bigint), 11 - datediff(hi, day))"))
          .as("wt"),
        col("cnt"))
      .groupBy(col("event_type"))
      .agg(sum(col("wt")).as("decayed"), sum(col("cnt")).as("n_events"))
    s.withColumn("rnk", row_number().over(
        Window.orderBy(col("decayed").desc, col("event_type"))).cast("long"))
      .withColumn("rank_by_raw", row_number().over(
        Window.orderBy(col("n_events").desc, col("event_type"))).cast("long"))
      .where(col("rnk") <= 5)
      .select(col("event_type"), col("decayed"), col("n_events"),
        col("rnk"), col("rank_by_raw"))
      .orderBy(col("rnk"))
  }

  /** Poisson(1) CDF in ppm (k = 0..7; ≥ 8 collapses to the tail) —
    * the ONE literal table both engines derive resample weights from.
    */
  private val poissonCdfPpm =
    Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L, 999917L,
      999990L)

  val all: Seq[Q] = Seq(

    // ---- PPJoin: prefix-filtered EXACT Jaccard join ------------------------
    // The LOSSLESS scale path next to the capped inverted index
    // (p05's maxDf cap trades recall under skew and reports the
    // drop): order every doc's distinct 3-shingles by ascending
    // corpus df (rarest first — one global order for everybody), and
    // index only each doc's first n − ⌈t·n⌉ + 1 shingles. The
    // prefix-filter lemma (Bayardo et al. WWW'07; Xiao et al.
    // PPJoin) guarantees any pair with J ≥ t shares at least one
    // PREFIX shingle, so candidates come from a small rare-shingle
    // inverted index with NO recall loss — hot shingles never enter
    // prefixes, which is what kills the quadratic term without a
    // cap. Candidates then verify exactly: intersection by shingle
    // equi-join, 9·i ≥ 4·(na+nb) in integers. The oracle is the NAIVE
    // all-shingle pair join — the hash match proves the lemma
    // implementation end to end.
    //
    // Scale shape: df agg (one shuffle), per-doc rank window, a
    // rare-shingle self-join, and a candidate-bounded verify join —
    // never the full-shingle self-join the naive form does.
    Q("p236_ppjoin_exact", Some(s"""
      WITH ${Pipeline.distinctShinglesCte},
      sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ds GROUP BY 1),
      pr AS (SELECT x.doc_id AS a, y.doc_id AS b,
                    CAST(count(*) AS BIGINT) AS n_inter
             FROM ds x JOIN ds y ON x.s = y.s AND x.doc_id < y.doc_id
             GROUP BY 1, 2)
      SELECT a, b, n_inter,
             na.n + nb.n - n_inter AS n_union,
             n_inter * 1000000 // (na.n + nb.n - n_inter) AS jacc_ppm
      FROM pr JOIN sz na ON na.doc_id = a JOIN sz nb ON nb.doc_id = b
      WHERE 9 * n_inter >= 4 * (na.n + nb.n)
      ORDER BY a, b""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
      // the distinct-shingle stream feeds four consumers (df, ranking,
      // sizes, verify x2) — materialize the tokenization once
      val tok = docs.select(col("doc_id").as("did"),
        explode(array_distinct(TextOps.shingles(col("text"), 3))).as("w"))
        .localCheckpoint()
      val df = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
      // one global token order (df asc, token asc) ranks every doc's
      // tokens; sizes ride along from the same window pass
      val ranked = tok.join(df, "w")
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("did")).orderBy(col("df"), col("w"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("did"))))
      // prefix length L = n - ceil(t*n) + 1 (t = 0.8: ceil = (4n+4) div 5)
      val prefix = ranked
        .where(col("pos") <= expr("n - (4 * n + 4) div 5 + 1"))
        .select(col("did"), col("w"))
      val cand = prefix.as("x").join(prefix.as("y"),
          col("x.w") === col("y.w") && col("x.did") < col("y.did"))
        .select(col("x.did").as("a"), col("y.did").as("b")).distinct()
      val inter = cand
        .join(tok.select(col("did").as("a"), col("w")), Seq("a"))
        .join(tok.select(col("did").as("b"), col("w")), Seq("b", "w"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_inter"))
      val sz = tok.groupBy(col("did")).agg(count(lit(1)).as("n"))
      inter
        .join(sz.select(col("did").as("a"), col("n").as("na")), Seq("a"))
        .join(sz.select(col("did").as("b"), col("n").as("nb")), Seq("b"))
        .where(lit(9) * col("n_inter") >= lit(4) * (col("na") + col("nb")))
        .select(col("a"), col("b"), col("n_inter"),
          (col("na") + col("nb") - col("n_inter")).as("n_union"),
          expr("n_inter * 1000000 div (na + nb - n_inter)").as("jacc_ppm"))
        .orderBy(col("a"), col("b"))
    },

    // ---- REAL ZIP shard build + central-directory salvage walk -------------
    // The last archive container in the codec family (gzip/tar/
    // TFRecord/MP4 ship already): per doc a 2-entry STORED zip (text
    // + metadata entry) built with real CRC-32s, then salvage-walked
    // — central directory first (the authoritative index), local-
    // header cross-check and data-CRC per entry; when the EOCD is
    // gone (mode 1: interrupted upload), a forward local-header walk
    // recovers what survived. Mode 2 flips one DATA bit in entry 1:
    // sizes agree everywhere, only the CRC catches it. The oracle
    // computes every count from frame ALGEBRA (30+name+data local,
    // 46+name central, 22 EOCD) — it never parses bytes, so the hash
    // match proves the walk's arithmetic and the builder's layout.
    //
    // Scale shape: build + walk are per-row byte work in the scan
    // stage, zero shuffle; the census is one doc-keyed projection.
    Q("p237_zip_shards", Some("""
      WITH d AS (SELECT doc_id, doc_id % 3 AS mode,
                        CAST(length(text) AS BIGINT) AS l1,
                        CAST(length(concat('meta:', CAST(doc_id AS VARCHAR)))
                          AS BIGINT) AS l2
                 FROM documents)
      SELECT doc_id, CAST(mode AS BIGINT) AS mode,
             CAST(2 AS BIGINT) AS n_entries,
             CAST(CASE WHEN mode = 2 THEN 1 ELSE 2 END AS BIGINT) AS n_valid,
             l1 + l2 AS payload_bytes,
             CAST(CASE WHEN mode = 1 THEN 70 + l1 + l2
                  ELSE 194 + l1 + l2 END AS BIGINT) AS blob_bytes,
             mode <> 1 AS has_central,
             mode = 0 AS clean
      FROM d ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.Zip
      val w = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 3).as("mode"),
          Zip.walk(Zip.build(col("text"),
            concat(lit("meta:"), col("doc_id").cast("string")),
            (col("doc_id") % 3).cast("int"))).as("z"))
      w.select(col("doc_id"), col("mode"),
          col("z.n_entries").as("n_entries"),
          col("z.n_valid").as("n_valid"),
          col("z.payload_bytes").as("payload_bytes"),
          col("z.blob_bytes").as("blob_bytes"),
          col("z.has_central").as("has_central"),
          col("z.clean").as("clean"))
        .orderBy(col("doc_id"))
    },

    // ---- magic-byte ingest router ------------------------------------------
    // The front door of a multimodal ingest path: blobs arrive with a
    // DECLARED type (the upload manifest / file extension) and the
    // engine trusts nothing — the first bytes decide which codec
    // kernel (Gzip/Png/Bmp/Wav/Zip/Mp4) the row routes to. Planted
    // reality: every doc is wrapped in its declared container's
    // magic, except doc_id % 11 == 0 which arrives corrupted (a stray
    // leading byte — the classic partial-write). Detection is PURE
    // built-in byte predicates (substring equality on binary —
    // whole-stage codegen, no UDF): the census of declared vs
    // detected is what a production router alerts on. The oracle
    // derives the answer from doc_id algebra alone — the hash match
    // proves the byte-level sniffing.
    //
    // Scale shape: scan-stage byte compares + one metadata-sized
    // group-by; the blobs never shuffle.
    Q("p238_magic_router", Some("""
      WITH d AS (SELECT doc_id,
                        CASE doc_id % 8 WHEN 0 THEN 'gzip' WHEN 1 THEN 'png'
                          WHEN 2 THEN 'bmp' WHEN 3 THEN 'wav'
                          WHEN 4 THEN 'zip' WHEN 5 THEN 'text'
                          WHEN 6 THEN 'mp4'
                          ELSE 'zstd' END AS declared,
                        doc_id % 11 = 0 AS corrupted
                 FROM documents)
      SELECT declared,
             CASE WHEN corrupted THEN 'unknown' ELSE declared END AS detected,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM d GROUP BY 1, 2 ORDER BY declared, detected""")) { (spark, dir) =>
      def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
      val payload = col("text").cast("binary")
      val kind = col("doc_id") % 8
      val magicOf = Map(
        0 -> b(0x1f, 0x8b, 0x08),                        // gzip member
        1 -> b(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), // png
        2 -> "BM".getBytes,                               // bmp
        4 -> b(0x50, 0x4b, 0x03, 0x04),                   // zip local hdr
        7 -> b(0x28, 0xb5, 0x2f, 0xfd))                   // zstd frame (LE)
      val wavHdr = concat(lit("RIFF".getBytes), lit(b(0, 0, 0, 0)),
        lit("WAVE".getBytes))
      val mp4Hdr = concat(lit(b(0, 0, 0, 24)), lit("ftyp".getBytes))
      // kind-5 (text) carries a printable sentinel byte ('~') so the
      // detection algebra is PAYLOAD-INDEPENDENT: no document text can
      // start with a container magic or a non-printable byte and break
      // the declared==detected invariant the oracle derives from
      // doc_id alone. Real pipelines get the same property from the
      // upload framing; here the sentinel IS that framing.
      val body = when(kind === 0, concat(lit(magicOf(0)), payload))
        .when(kind === 1, concat(lit(magicOf(1)), payload))
        .when(kind === 2, concat(lit(magicOf(2)), payload))
        .when(kind === 3, concat(wavHdr, payload))
        .when(kind === 4, concat(lit(magicOf(4)), payload))
        .when(kind === 5, concat(lit("~".getBytes), payload))
        .when(kind === 7, concat(lit(magicOf(7)), payload))
        .otherwise(concat(mp4Hdr, payload))
      val blob = when(col("doc_id") % 11 === 0,
        concat(lit(b(0x00)), body)).otherwise(body)
      def magic(off: Int, m: Array[Byte]) =
        substring(col("blob"), off, m.length) === lit(m)
      val fb = substring(col("blob"), 1, 1)
      val detected = when(magic(1, magicOf(0)), "gzip")
        .when(magic(1, magicOf(1)), "png")
        .when(magic(1, magicOf(2)), "bmp")
        .when(magic(1, "RIFF".getBytes) && magic(9, "WAVE".getBytes), "wav")
        .when(magic(1, magicOf(4)), "zip")
        // mp4 sniff requires the box-size sanity prefix (first three
        // bytes zero, i.e. size < 16M) AND ftyp at offset 5 — 'ftyp'
        // appearing inside a text payload can't route a doc here
        .when(magic(1, b(0, 0, 0)) && magic(5, "ftyp".getBytes), "mp4")
        .when(magic(1, magicOf(7)), "zstd")
        .when(fb >= lit(b(0x20)) && fb <= lit(b(0x7e)), "text")
        .otherwise("unknown")
      val declared = when(kind === 0, "gzip").when(kind === 1, "png")
        .when(kind === 2, "bmp").when(kind === 3, "wav")
        .when(kind === 4, "zip").when(kind === 5, "text")
        .when(kind === 6, "mp4").otherwise("zstd")
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), declared.as("declared"), blob.as("blob"))
        .select(col("declared"), detected.as("detected"))
        .groupBy(col("declared"), col("detected"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("declared"), col("detected"))
    },

    // ---- serpentine shard-to-worker scheduling -----------------------------
    // The training-launch question: 64 variable-size shards onto 8
    // workers so the slowest worker (the makespan) is near the mean.
    // Sorted serpentine (boustrophedon) assignment — rank shards by
    // size descending, sweep workers left-to-right then right-to-left
    // — is the CLOSED-FORM balancer: no driver loop, no iterative
    // bin-packing, just a rank window and an alternating modulus, so
    // the whole schedule is one metadata-sized query even when the
    // shard census comes from a 100 TB scan. Output: per-worker load
    // and its exact ppm deviation from the ideal mean.
    Q("p239_shard_schedule", Some("""
      WITH sh AS (SELECT doc_id % 64 AS shard,
                         CAST(sum(n_chars) AS BIGINT) AS bytes
                  FROM documents GROUP BY 1),
      rk AS (SELECT shard, bytes,
                    row_number() OVER (ORDER BY bytes DESC, shard) - 1 AS r
             FROM sh),
      asg AS (SELECT shard, bytes,
                     CASE WHEN (r // 8) % 2 = 0 THEN r % 8
                          ELSE 7 - (r % 8) END AS worker
              FROM rk),
      w AS (SELECT worker, CAST(count(*) AS BIGINT) AS n_shards,
                   CAST(sum(bytes) AS BIGINT) AS total_bytes
            FROM asg GROUP BY 1)
      SELECT worker, n_shards, total_bytes,
             CAST(total_bytes * 8 * 1000000
               // (SELECT CAST(sum(total_bytes) AS BIGINT) FROM w)
               - 1000000 AS BIGINT) AS skew_ppm
      FROM w ORDER BY worker""")) { (spark, dir) =>
      val sh = Tables.load(spark, dir, "documents")
        .groupBy((col("doc_id") % 64).as("shard"))
        .agg(sum(col("n_chars")).as("bytes"))
      val rk = sh.withColumn("r", row_number().over(
        Window.orderBy(col("bytes").desc, col("shard"))) - 1)
      val asg = rk.withColumn("worker",
        when(expr("r div 8") % 2 === 0, col("r") % 8)
          .otherwise(lit(7) - col("r") % 8).cast("long"))
      val w = asg.groupBy(col("worker"))
        .agg(count(lit(1)).as("n_shards"), sum(col("bytes")).as("total_bytes"))
      val grand = w.agg(sum(col("total_bytes")).as("grand"))
      w.crossJoin(broadcast(grand))
        .select(col("worker"), col("n_shards"), col("total_bytes"),
          expr("total_bytes * 8 * 1000000 div grand - 1000000").as("skew_ppm"))
        .orderBy(col("worker"))
    },

    // ---- curation gate overlap census --------------------------------------
    // The ablation view of the filter funnel (p28 measures the
    // SEQUENTIAL funnel; this measures the JOINT distribution): every
    // doc is scored against four independent gates — length, quality,
    // language, near-dup-free — and the census over the 16-cell
    // pass/fail mask is what tells a pipeline owner whether gates are
    // redundant (cells where two gates always fail together), what a
    // gate's MARGINAL cost is (cells where only it fails), and how
    // much survives end to end (the all-true cell). The dup gate
    // reads pair-graph membership off the SharedStages materialized
    // pairs; the oracle recomputes all four gates from scratch
    // (including the full banded SimHash pass), so the hash match
    // pins every gate definition cross-engine.
    //
    // Scale shape: three gates are scan-stage arithmetic; the dup
    // gate is one semi-join against the shared pair table; the
    // census is a 16-row aggregate.
    Q("p242_gate_census", Some {
      val names = TextOps.langProfiles.map(_._1)
      val scoreSql = names.map(l =>
        s"CAST(${TextSql.langScore("ws", l)} AS BIGINT) AS s_$l")
        .mkString(", ")
      s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      nodes AS (SELECT DISTINCT doc_id FROM
                (SELECT a AS doc_id FROM spairs
                 UNION ALL SELECT b FROM spairs)),
      t AS (SELECT doc_id, $wsSql AS ws, text FROM documents),
      s AS (SELECT doc_id, ws, text, $scoreSql FROM t),
      g AS (SELECT s.doc_id,
                   len(ws) >= 40 AS pass_len,
                   ${TextSql.quality("ws")} >= 0.75 AS pass_quality,
                   ${TextSql.langCase(l => s"s_$l")} = 'en' AS pass_lang,
                   nodes.doc_id IS NULL AS pass_dupfree,
                   CAST(len(ws) AS BIGINT) AS n_tokens
            FROM s LEFT JOIN nodes ON nodes.doc_id = s.doc_id)
      SELECT pass_len, pass_quality, pass_lang, pass_dupfree,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      FROM g GROUP BY 1, 2, 3, 4
      ORDER BY pass_len, pass_quality, pass_lang, pass_dupfree"""
    }) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
      val toks = TextOps.tokens(col("text"))
      val lang = TextOps.langId(col("text"))
      val sp = SharedStages.spairs(spark, dir)
      val nodes = sp.select(col("a").as("doc_id"))
        .unionAll(sp.select(col("b")))
        .distinct()
      docs
        .select(col("doc_id"),
          (size(toks) >= 40).as("pass_len"),
          (TextOps.qualityScore(col("text")) >= 0.75).as("pass_quality"),
          (lang === "en").as("pass_lang"),
          size(toks).cast("long").as("n_tokens"))
        .join(nodes.withColumn("dup", lit(true)), Seq("doc_id"), "left")
        .withColumn("pass_dupfree", coalesce(col("dup"), lit(false)) === false)
        .groupBy(col("pass_len"), col("pass_quality"), col("pass_lang"),
          col("pass_dupfree"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy(col("pass_len"), col("pass_quality"), col("pass_lang"),
          col("pass_dupfree"))
    },

    // ---- UTF-8 validity census over raw bytes ------------------------------
    // The byte-level gate BEFORE any text op trusts a string cast:
    // planted per-doc damage classes — clean ASCII; valid 2- and
    // 3-byte characters appended; an overlong '/' (the classic filter-
    // smuggling vector) plus a stray continuation byte; a sequence CUT
    // by an interrupted write. One scan-stage kernel
    // (graft.functions.Utf8Walk) walks the RFC 3629 rules and counts
    // each class separately — overlong is a security signal, stray
    // bytes are corruption, truncation is an io artifact, and the
    // three route differently. The oracle computes every count from
    // mode algebra on the (ASCII) payload length, never parsing
    // bytes, so the hash match proves the DFA.
    //
    // Scale shape: per-row byte walk in the scan stage, zero shuffle.
    Q("p243_utf8_census", Some("""
      WITH d AS (SELECT doc_id, doc_id % 4 AS mode,
                        CAST(length(text) AS BIGINT) AS l
                 FROM documents)
      SELECT doc_id, CAST(mode AS BIGINT) AS mode,
             l + CASE mode WHEN 1 THEN 5 WHEN 2 THEN 3 WHEN 3 THEN 2
                 ELSE 0 END AS n_bytes,
             l + CASE WHEN mode = 1 THEN 2 ELSE 0 END AS n_chars,
             CAST(CASE WHEN mode = 2 THEN 1 ELSE 0 END AS BIGINT)
               AS n_invalid,
             CAST(CASE WHEN mode = 2 THEN 1 ELSE 0 END AS BIGINT)
               AS n_overlong,
             mode = 3 AS truncated
      FROM d ORDER BY doc_id""")) { (spark, dir) =>
      import graft.functions.Utf8Walk
      def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
      val payload = col("text").cast("binary")
      val mode = col("doc_id") % 4
      val blob = when(mode === 1,
          concat(payload, lit(b(0xc3, 0xa9, 0xe2, 0x82, 0xac)))) // é €
        .when(mode === 2, concat(payload, lit(b(0xc0, 0xaf, 0x80)))) // overlong '/', stray cont
        .when(mode === 3, concat(payload, lit(b(0xe2, 0x82)))) // cut '€'
        .otherwise(payload)
      Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), mode.cast("long").as("mode"),
          Utf8Walk.walk(blob).as("u"))
        .select(col("doc_id"), col("mode"),
          col("u.n_bytes").as("n_bytes"), col("u.n_chars").as("n_chars"),
          col("u.n_invalid").as("n_invalid"),
          col("u.n_overlong").as("n_overlong"),
          col("u.truncated").as("truncated"))
        .orderBy(col("doc_id"))
    },

    // ---- perceptual image hash (DCT pHash) near-dup pairs ------------------
    // IMAGE near-duplicate detection — the visual gap next to the
    // byte-exact and text near-dup families: re-encodes and slight
    // edits of the same picture must pair up even though their bytes
    // differ completely. Per doc a REAL 16×16 grayscale BMP is built
    // (5 base patterns by doc_id % 5, one per-doc perturbed pixel —
    // same-class images are near-identical, cross-class unrelated),
    // then ONE scan-stage kernel decodes it and computes the classic
    // DCT pHash with 1e4-scaled INTEGER cosine basis, ordinal median,
    // 63-bit pack (graft.functions.Phash — pixels never explode into
    // rows). Pairs at hamming ≤ 3 come from the SimHash pigeonhole
    // banding, reused over the precomputed hash column
    // (DedupOps.hammingPairs64). The oracle rebuilds the full DCT in
    // SQL from the SAME embedded integer cosine table and brute-
    // forces all pairs — the hash match proves decode, transform,
    // median, packing, and banding end to end.
    //
    // Scale shape: kernel in the scan stage (megapixel-safe), then
    // the standard two-shuffle banded pair join on 1-long signatures.
    Q("p240_phash_neardup", Some {
      val ct = (for (u <- 0 until 8; x <- 0 until 16)
        yield s"($u,$x,${graft.functions.Phash.Ct(u)(x)})").mkString(", ")
      s"""
      WITH c5 AS (SELECT doc_id, doc_id % 5 AS c, doc_id % 16 AS nx,
                  (doc_id // 16) % 16 AS ny FROM documents),
      px AS (SELECT doc_id, gx.x AS x, gy.y AS y,
             (gx.x*(c+3)*7 + gy.y*(2*c+5)*13 + c*29
               + CASE WHEN gx.x = nx AND gy.y = ny THEN 16 ELSE 0 END)
               % 256 AS v
             FROM c5, generate_series(0, 15) gx(x),
                  generate_series(0, 15) gy(y)),
      ct(u, x, cv) AS (VALUES $ct),
      f AS (SELECT doc_id, cu.u AS fu, cv.u AS fv2,
                   CAST(sum(v * cu.cv * cv.cv) AS BIGINT) AS fval
            FROM px JOIN ct cu ON cu.x = px.x JOIN ct cv ON cv.x = px.y
            GROUP BY 1, 2, 3),
      nz AS (SELECT doc_id, fu*8 + fv2 AS idx, fval FROM f
             WHERE NOT (fu = 0 AND fv2 = 0)),
      md AS (SELECT doc_id, fval AS m FROM
             (SELECT doc_id, fval, row_number() OVER (PARTITION BY doc_id
                ORDER BY fval, idx) AS rn FROM nz)
             WHERE rn = 32),
      ph AS (SELECT nz.doc_id,
             CAST(sum(CASE WHEN fval > m THEN
                  CASE WHEN idx = 63 THEN -9223372036854775808
                       ELSE (CAST(1 AS BIGINT) << idx) END
                  ELSE 0 END) AS BIGINT) AS phash
             FROM nz JOIN md ON md.doc_id = nz.doc_id GROUP BY 1)
      SELECT a.doc_id AS a, b.doc_id AS b,
             CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
      FROM ph a JOIN ph b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 3
      ORDER BY a, b"""
    }) { (spark, dir) =>
      import graft.functions.Phash
      import graft.ops.DedupOps
      val c = col("doc_id") % 5
      val nx = col("doc_id") % 16
      val ny = expr("(doc_id div 16) % 16")
      def vAt(x: org.apache.spark.sql.Column,
              y: org.apache.spark.sql.Column) =
        (x * (c + lit(3)) * 7 + y * (c * 2 + lit(5)) * 13 + c * 29 +
          when(x === nx && y === ny, 16).otherwise(0)) % 256
      // 16×16 24bpp grayscale BMP (rowSize 48, no padding, bottom-up)
      val pixelsHex = array_join(
        transform(sequence(lit(0), lit(15)), yf =>
          array_join(transform(sequence(lit(0), lit(15)), x => {
            val hv = lpad(hex(vAt(x, lit(15) - yf)), 2, "0")
            concat(hv, hv, hv)
          }), "")), "")
      val header = concat(
        lit("424D"), MultimodalQ.le32h(lit(54 + 768)), lit("00000000"),
        MultimodalQ.le32h(lit(54)), MultimodalQ.le32h(lit(40)),
        MultimodalQ.le32h(lit(16)), MultimodalQ.le32h(lit(16)),
        MultimodalQ.le16h(lit(1)), MultimodalQ.le16h(lit(24)),
        MultimodalQ.le32h(lit(0)), MultimodalQ.le32h(lit(768)),
        MultimodalQ.le32h(lit(0)), MultimodalQ.le32h(lit(0)),
        MultimodalQ.le32h(lit(0)), MultimodalQ.le32h(lit(0)))
      val blob = unhex(concat(header, pixelsHex))
      val sig = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), Phash.phash(blob).as("ph"))
      DedupOps.hammingPairs64(sig, "doc_id", "ph", maxHamming = 3)
        .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("a"), col("b"))
    },

    // ---- near-dup pair edit distance (banded Levenshtein) ------------------
    // The reviewer's last question about a candidate pair before 100 TB
    // of "duplicates" get deleted: HOW different are they, exactly?
    // p199 names the shared evidence; this measures the residual — the
    // exact character edit distance, computed ONLY for the pair-graph
    // edges (never all pairs) with Spark's built-in threshold
    // Levenshtein (banded O(len·k) instead of O(len²); above the 200
    // cap both engines report -1, the no-silent-caps posture). The
    // relative form (ppm of the longer side) is the score a dedup
    // policy thresholds on. Functions-not-UDFs: the kernel is Spark's
    // own codegen'd expression; the oracle recomputes pairs from
    // scratch and runs DuckDB's Levenshtein — identical unit-cost
    // DP, so the hash match pins both engines' edit semantics.
    Q("p244_pair_edit_distance", Some(s"""
      WITH RECURSIVE ${Pipeline.simhash64Cte},
      ${Pipeline.simhashPairsCte},
      j AS (SELECT p.a, p.b,
                   CASE WHEN levenshtein(ta.text, tb.text) <= 200
                        THEN CAST(levenshtein(ta.text, tb.text) AS BIGINT)
                        ELSE CAST(-1 AS BIGINT) END AS edit_dist,
                   CAST(greatest(length(ta.text), length(tb.text))
                     AS BIGINT) AS mx
            FROM spairs p
            JOIN documents ta ON ta.doc_id = p.a
            JOIN documents tb ON tb.doc_id = p.b)
      SELECT a, b, edit_dist,
             CASE WHEN edit_dist >= 0 THEN edit_dist * 1000000 // mx
                  ELSE CAST(-1 AS BIGINT) END AS rel_ppm
      FROM j ORDER BY a, b""")) { (spark, dir) =>
      val docs = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val pairs = SharedStages.spairs(spark, dir).select(col("a"), col("b"))
      pairs
        .join(docs.select(col("doc_id").as("a"), col("text").as("t_a")), "a")
        .join(docs.select(col("doc_id").as("b"), col("text").as("t_b")), "b")
        .select(col("a"), col("b"),
          expr("levenshtein(t_a, t_b, 200)").cast("long").as("edit_dist"),
          greatest(length(col("t_a")), length(col("t_b"))).cast("long")
            .as("mx"))
        .select(col("a"), col("b"), col("edit_dist"),
          when(col("edit_dist") >= 0,
            expr("edit_dist * 1000000 div mx")).otherwise(-1L).as("rel_ppm"))
        .orderBy(col("a"), col("b"))
    },

    // ---- time-decayed heavy hitters ----------------------------------------
    // Recency-weighted ranking — what's hot NOW, not what was big
    // last month: per event type over the trailing 12 days, the
    // half-life-one-day decayed count Σ c_d · 2^(d − d_first), kept
    // EXACT by scaling to the window start (weights 2^0..2^11 — pure
    // integers, no float decay drift, trivially mergeable map-side
    // partials). Ranked beside the raw count so the census shows
    // exactly which types recency re-orders — the dashboard view a
    // trending detector thresholds on.
    //
    // Scale shape: one filtered scan, one keyed agg with map-side
    // partials, a broadcast max-day scalar; output is type-bounded.
    Q("p245_decayed_topk", Some(decayedTopkOracle)) { (spark, dir) =>
      val cnts = Tables.load(spark, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
      decayedFromDayCounts(cnts)
    },

    // ---- STREAMING decayed top-k (same oracle as p245) ---------------------
    // The trending detector as it actually runs: the event stream
    // folds into a versioned (event_type, day) count state per
    // micro-batch (full-outer merge — counts are additive, so ANY
    // batching reaches the same state), and the decayed ranking reads
    // the state, not the raw stream. Shares p245's ORACLE STRING
    // verbatim, so stream-fold ≡ batch-recompute is pinned by the
    // same hash — the ksOracle (p187/p193) discipline.
    //
    // Scale shape: per-batch delta agg is batch-bounded; state is
    // type×day-bounded metadata; the rank stage reads state only.
    Q("p248_stream_decayed_topk", Some(decayedTopkOracle)) { (spark, dir) =>
      val root = sinkDir(s"p248_${Integer.toHexString(dir.hashCode)}")
      val state = graft.streaming.StreamingOps
        .decayedCountsIngest(spark, dir, root)
      decayedFromDayCounts(state)
    },

    // ---- deterministic Poisson bootstrap (hash-derived resample weights) ---
    // Error bars for a corpus statistic WITHOUT randomness: the
    // Poisson bootstrap (each row enters resample b with weight
    // ~Poisson(1)) is the resampling scheme built for distributed
    // systems — weights are per-row-independent, so resampling is a
    // scan-stage map, no global multinomial draw. Here the weight is
    // DERIVED from a salted portable hash quantiled through ONE
    // literal Poisson CDF table shared with the oracle: every rerun,
    // every engine, every partitioning produces the SAME 16 resamples
    // — reproducible uncertainty quantification, the property that
    // lets a 100 TB pipeline assert "mean quality moved beyond the
    // bootstrap spread" across runs. Statistic: mean quality in exact
    // micro-integers; spread = min/max across the 16 resample means.
    //
    // Scale shape: one scan × bounded 16-way explode, map-side
    // partial aggs; output is 16 rows.
    Q("p247_poisson_bootstrap", Some {
      val wCase = "CASE " + poissonCdfPpm.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }
        .mkString(" ") + " ELSE 8 END"
      val h = Portable.h32sSql(100, "concat(CAST(b AS VARCHAR), ':', CAST(doc_id AS VARCHAR))")
      s"""
      WITH d AS (SELECT doc_id,
                        CAST(round(${TextSql.quality(wsSql)} * 1000000, 0)
                          AS BIGINT) AS micro
                 FROM documents),
      r AS (SELECT doc_id, micro, gb.b AS b,
                   $h % 1000000 AS u
            FROM d, generate_series(0, 15) gb(b)),
      w AS (SELECT b, micro, $wCase AS w FROM r),
      m AS (SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
                   CAST(sum(w * micro) // sum(w) AS BIGINT) AS mean_micro
            FROM w GROUP BY 1)
      SELECT CAST(b AS BIGINT) AS b, n_eff, mean_micro,
             CAST(min(mean_micro) OVER () AS BIGINT) AS lo_micro,
             CAST(max(mean_micro) OVER () AS BIGINT) AS hi_micro
      FROM m ORDER BY b"""
    }) { (spark, dir) =>
      val wCase = poissonCdfPpm.zipWithIndex.foldRight(lit(8)) {
        case ((c, k), rest) => when(col("u") < c, k).otherwise(rest)
      }
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          round(TextOps.qualityScore(col("text")) * 1000000, 0)
            .cast("long").as("micro"))
      val r = d.select(col("doc_id"), col("micro"),
          explode(sequence(lit(0), lit(15))).as("b"))
        .withColumn("u", Portable.h32s(100,
          concat(col("b").cast("string"), lit(":"),
            col("doc_id").cast("string"))) % 1000000)
      val m = r.select(col("b"), col("micro"), wCase.as("w"))
        .groupBy(col("b"))
        .agg(sum(col("w")).as("n_eff"),
          expr("sum(w * micro) div sum(w)").as("mean_micro"))
      m.select(col("b").cast("long").as("b"), col("n_eff"),
          col("mean_micro"),
          min(col("mean_micro")).over(Window.partitionBy())
            .cast("long").as("lo_micro"),
          max(col("mean_micro")).over(Window.partitionBy())
            .cast("long").as("hi_micro"))
        .orderBy(col("b"))
    },

    // ---- EXACT 7-day rolling distinct users (first-occurrence trick) -------
    // The exact counterpart of p153's rolling HLL, at the same O(events)
    // cost: a user counts toward window ending day g iff they have an
    // active day in [g-6, g] whose PREVIOUS active day is before g-6 —
    // i.e. exactly their FIRST occurrence inside the window. One lag
    // over the per-user day stream plus a bounded ×7 contribution
    // explode replaces the per-window DISTINCT recount (which at scale
    // is 7 full shuffles a day); the technique every exact sliding-
    // distinct dashboard is built on. The oracle IS the naive
    // recount — the hash match proves the trick's equivalence.
    Q("p246_rolling_distinct", Some("""
      WITH ud AS (SELECT DISTINCT user_id,
                         CAST(date_trunc('day', ts) AS DATE) AS day
                  FROM events),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
      days AS (SELECT CAST(unnest(generate_series(b.lo, b.hi,
                        INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      naive AS (SELECT d.day,
                       CAST(count(DISTINCT u.user_id) AS BIGINT)
                         AS n_active_7d
                FROM days d JOIN ud u
                  ON u.day BETWEEN d.day - 6 AND d.day
                GROUP BY 1),
      one AS (SELECT day, CAST(count(*) AS BIGINT) AS n_active_1d
              FROM ud GROUP BY 1)
      SELECT CAST(d.day AS VARCHAR) AS day,
             coalesce(one.n_active_1d, 0) AS n_active_1d,
             coalesce(naive.n_active_7d, 0) AS n_active_7d
      FROM days d
      LEFT JOIN one ON one.day = d.day
      LEFT JOIN naive ON naive.day = d.day
      ORDER BY day""")) { (spark, dir) =>
      val ud = Tables.load(spark, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        .localCheckpoint() // feeds lag pass, 1d counts, and the grid
      val prev = ud.withColumn("prev", lag(col("day"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("day"))))
      val bounds = ud.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      // contribution explode: this activity day is the user's FIRST in
      // windows ending g ∈ [day, day+6] with prev < g-6
      val contrib = prev.crossJoin(broadcast(bounds))
        .select(col("user_id"), col("prev"), col("hi"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("g"))
        .where(col("g") <= col("hi") &&
          (col("prev").isNull || col("prev") < date_sub(col("g"), 6)))
        .groupBy(col("g").as("day"))
        .agg(count(lit(1)).as("n_active_7d"))
      val one = ud.groupBy(col("day")).agg(count(lit(1)).as("n_active_1d"))
      val days = bounds.select(explode(sequence(col("lo"), col("hi")))
        .as("day"))
      days
        .join(one, Seq("day"), "left")
        .join(contrib, Seq("day"), "left")
        .select(col("day").cast("string").as("day"),
          coalesce(col("n_active_1d"), lit(0L)).as("n_active_1d"),
          coalesce(col("n_active_7d"), lit(0L)).as("n_active_7d"))
        .orderBy(col("day"))
    },

    // ---- exact-integer CUSUM change detection ------------------------------
    // Sequential change detection on the daily event volume — the
    // alarm that fires DURING a drift, not after a month of it (the
    // p160/p234 census views look back; CUSUM watches forward). The
    // classic recurrence S_d = max(0, S_{d-1} + x_d − μ − k) looks
    // inherently sequential, but reduces EXACTLY to
    // S_d = P_d − min(0, min_{j≤d} P_j) over the prefix sums P of the
    // centered series — two O(days) windows, no recursion, the same
    // carry-recurrence-to-window discipline as the cohort/SCD2 ops.
    // Exactness: multiply through by 4n (slack k = μ/4, threshold
    // h = 2μ ⇒ alarm at 8S scaled) so no float touches the statistic;
    // missing days count as zero via the p153 day grid.
    Q("p249_cusum_alarm", Some("""
      WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day
                 FROM events),
      b AS (SELECT min(day) AS lo, max(day) AS hi FROM e),
      days AS (SELECT CAST(unnest(generate_series(b.lo, b.hi,
                        INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      x AS (SELECT d.day, CAST(count(e.day) AS BIGINT) AS n_events
            FROM days d LEFT JOIN e ON e.day = d.day GROUP BY 1),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(n_events) AS BIGINT) AS s FROM x),
      y AS (SELECT day, n_events,
                   4 * t.n * n_events - 5 * t.s AS y, t.s
            FROM x, t),
      p AS (SELECT day, n_events, s,
                   CAST(sum(y) OVER (ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pf
            FROM y),
      c AS (SELECT day, n_events, s, pf,
                   CAST(least(CAST(0 AS BIGINT), min(pf) OVER (ORDER BY day
                     ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS mn
            FROM p)
      SELECT CAST(day AS VARCHAR) AS day, n_events,
             pf - mn AS cusum_scaled,
             pf - mn >= 8 * s AS alarm
      FROM c ORDER BY day""")) { (spark, dir) =>
      val e = Tables.load(spark, dir, "events")
        .select(to_date(col("ts")).as("day"))
      val bounds = e.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      val days = bounds.select(explode(sequence(col("lo"), col("hi")))
        .as("day"))
      val x = days.join(e.groupBy(col("day")).agg(count(lit(1)).as("ne")),
          Seq("day"), "left")
        .select(col("day"), coalesce(col("ne"), lit(0L)).as("n_events"))
      val t = x.agg(count(lit(1)).as("n"), sum(col("n_events")).as("s"))
      val w = Window.orderBy(col("day")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
      x.crossJoin(broadcast(t))
        .withColumn("y", lit(4) * col("n") * col("n_events") -
          lit(5) * col("s"))
        .withColumn("pf", sum(col("y")).over(w))
        .withColumn("mn", least(lit(0L), min(col("pf")).over(w)))
        .select(col("day").cast("string").as("day"), col("n_events"),
          (col("pf") - col("mn")).as("cusum_scaled"),
          (col("pf") - col("mn") >= lit(8) * col("s")).as("alarm"))
        .orderBy(col("day"))
    },

    // ---- dataloader batch-order padding waste ------------------------------
    // The dataloader design question p230's bucket table feeds into:
    // given batch size 32, how much padding does the BATCH ORDER
    // cost? Three deterministic policies over the same corpus —
    // `hash` (p200's reproducible epoch shuffle: maximal decorrelation,
    // worst padding), `sorted` (global length sort: minimal padding,
    // zero shuffle-quality), and `windowed` (length-sort WITHIN
    // 256-doc hash-order windows — the standard bucketed-shuffle
    // compromise every production loader ships). Per policy the exact
    // padded-token count and waste ppm: the three-row table that
    // justifies the window size. Ranks are windows over the doc
    // census (production range-partitions the same keys); batches are
    // rank div 32, waste = Σ(batch_size·max − Σlen) in exact integers.
    Q("p250_batch_order_waste", Some {
      val h = Portable.h60Sql("concat('ep0:', CAST(doc_id AS VARCHAR))")
      s"""
      WITH d AS (SELECT doc_id, CAST(len($wsSql) AS BIGINT) AS len,
                        $h AS hk
                 FROM documents),
      ho AS (SELECT doc_id, len,
                    row_number() OVER (ORDER BY hk, doc_id) AS r FROM d),
      pol AS (
        SELECT 'hash' AS policy, len, r FROM ho
        UNION ALL
        SELECT 'sorted', len,
               row_number() OVER (ORDER BY len, doc_id) FROM d
        UNION ALL
        SELECT 'windowed', len,
               ((r - 1) // 256) * 256 +
               row_number() OVER (PARTITION BY (r - 1) // 256
                                  ORDER BY len, doc_id)
        FROM ho),
      bt AS (SELECT policy, (r - 1) // 32 AS batch,
                    CAST(count(*) AS BIGINT) AS bsz,
                    CAST(max(len) AS BIGINT) AS mx,
                    CAST(sum(len) AS BIGINT) AS tok
             FROM pol GROUP BY 1, 2)
      SELECT policy, CAST(count(*) AS BIGINT) AS n_batches,
             CAST(sum(tok) AS BIGINT) AS total_tokens,
             CAST(sum(bsz * mx - tok) AS BIGINT) AS padded_tokens,
             CAST(sum(bsz * mx - tok) * 1000000
               // sum(bsz * mx) AS BIGINT) AS waste_ppm
      FROM bt GROUP BY 1 ORDER BY policy"""
    }) { (spark, dir) =>
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("len"),
          Portable.h60(concat(lit("ep0:"), col("doc_id").cast("string")))
            .as("hk"))
        .localCheckpoint() // three rank policies read the same census
      val ho = d.withColumn("r", row_number().over(
        Window.orderBy(col("hk"), col("doc_id"))))
      val pol = ho.select(lit("hash").as("policy"), col("len"), col("r"))
        .unionAll(d.select(lit("sorted"), col("len"),
          row_number().over(Window.orderBy(col("len"), col("doc_id")))))
        .unionAll(ho
          .withColumn("blk", expr("(r - 1) div 256"))
          .select(lit("windowed"), col("len"),
            (col("blk") * 256 + row_number().over(
              Window.partitionBy(col("blk"))
                .orderBy(col("len"), col("doc_id")))).as("r")))
      val bt = pol.groupBy(col("policy"), expr("(r - 1) div 32").as("batch"))
        .agg(count(lit(1)).as("bsz"), max(col("len")).as("mx"),
          sum(col("len")).as("tok"))
      bt.groupBy(col("policy"))
        .agg(count(lit(1)).as("n_batches"), sum(col("tok")).as("total_tokens"),
          sum(col("bsz") * col("mx") - col("tok")).as("padded_tokens"))
        .withColumn("waste_ppm", expr(
          "padded_tokens * 1000000 div (total_tokens + padded_tokens)"))
        .select(col("policy"), col("n_batches"), col("total_tokens"),
          col("padded_tokens"), col("waste_ppm"))
        .orderBy(col("policy"))
    },

    // ---- exact waterfilling source mix (capped-uniform allocation) ---------
    // The mixing problem p170's proportional apportionment can't
    // solve: allocate a token budget B (40% of the corpus) across
    // sources as UNIFORMLY as possible subject to availability — the
    // "upsample low-resource sources to a common level" goal of every
    // mixture spec. The exact solution is waterfilling: a level t
    // with alloc_s = min(avail_s, t) and Σ alloc = B, found in CLOSED
    // FORM from the availability-sorted prefix sums (no iteration:
    // each sorted position proposes the level assuming everything
    // smaller is capped; exactly the segment containing the true
    // level validates). Integer-exact: floor level + largest-
    // remainder +1s to the first r uncapped sources by name, so the
    // allocation sums to B EXACTLY and every engine derives the same
    // plan. Output: per source avail / alloc / capped.
    //
    // Scale shape: all on the S-row source census (metadata) — the
    // heavy part is the one token-count aggregate feeding it.
    Q("p251_waterfill_mix", Some(s"""
      WITH w AS (SELECT source, CAST(SUM(len($wsSql)) AS BIGINT) AS a
                 FROM documents GROUP BY 1),
      t AS (SELECT CAST(sum(a) AS BIGINT) AS tot,
                   CAST(count(*) AS BIGINT) AS s FROM w),
      rk AS (SELECT source, a, t.tot, t.s,
                    2 * t.tot // 5 AS b,
                    row_number() OVER (ORDER BY a, source) AS i,
                    CAST(sum(a) OVER (ORDER BY a, source
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p,
                    coalesce(lag(a) OVER (ORDER BY a, source), 0) AS pa
             FROM w, t),
      cand AS (SELECT *, (b - (p - a)) // (s - i + 1) AS ti
               FROM rk),
      sel AS (SELECT min(CASE WHEN ti >= pa AND ti <= a THEN i END)
                AS istar FROM cand),
      lvl AS (SELECT c.b, c.ti AS t0, c.i AS istar,
                     c.b - ((c.p - c.a) + (c.s - c.i + 1) * c.ti) AS r
              FROM cand c, sel WHERE c.i = sel.istar),
      alloc AS (SELECT c.source, c.a,
                       c.i < lvl.istar AS capped,
                       CASE WHEN c.i < lvl.istar THEN c.a
                            ELSE lvl.t0 END AS base,
                       CASE WHEN c.i >= lvl.istar THEN
                         row_number() OVER (PARTITION BY c.i >= lvl.istar
                                            ORDER BY c.source)
                       END AS rn2, lvl.r
                FROM cand c, lvl)
      SELECT source, a AS avail_tokens,
             CAST(base + CASE WHEN NOT capped AND rn2 <= r THEN 1
                  ELSE 0 END AS BIGINT) AS alloc_tokens,
             capped
      FROM alloc ORDER BY source""")) { (spark, dir) =>
      val w = Tables.loadSpread(spark, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(size(TextOps.tokens(col("text"))).cast("long")).as("a"))
      val t = w.agg(sum(col("a")).as("tot"), count(lit(1)).as("s"))
      val ord = Window.orderBy(col("a"), col("source"))
      val rk = w.crossJoin(broadcast(t))
        .withColumn("b", expr("2 * tot div 5"))
        .withColumn("i", row_number().over(ord).cast("long"))
        .withColumn("p", sum(col("a")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("pa", coalesce(lag(col("a"), 1).over(ord), lit(0L)))
      // each sorted position proposes the level assuming all smaller
      // sources are capped; the true segment validates
      val cand = rk.withColumn("ti",
        expr("(b - (p - a)) div (s - i + 1)"))
      val sel = cand.agg(min(when(col("ti") >= col("pa") &&
        col("ti") <= col("a"), col("i"))).as("istar"))
      val lvl = cand.crossJoin(broadcast(sel))
        .where(col("i") === col("istar"))
        .select(col("ti").as("t0"), col("istar").as("ist"),
          (col("b") - ((col("p") - col("a")) +
            (col("s") - col("i") + 1) * col("ti"))).as("r"))
      cand.crossJoin(broadcast(lvl))
        .withColumn("capped", col("i") < col("ist"))
        .withColumn("rn2", when(col("i") >= col("ist"),
          row_number().over(Window.partitionBy(col("i") >= col("ist"))
            .orderBy(col("source")))))
        .select(col("source"), col("a").as("avail_tokens"),
          (when(col("capped"), col("a")).otherwise(col("t0")) +
            when(!col("capped") && col("rn2") <= col("r"), 1L)
              .otherwise(0L)).as("alloc_tokens"),
          col("capped"))
        .orderBy(col("source"))
    },

    // ---- IVF nprobe operating curve (recall vs probed cells) ---------------
    // The p196/p211/p213 one-query-picks-the-production-parameter
    // pattern applied to ANN serving: for a 40-query panel, exact
    // top-10 ground truth (the eval harness — query-panel × corpus,
    // bounded by the panel) versus IVF retrieval probing the
    // nprobe ∈ {1,2,4,8} nearest cells, with integer-mean centroids
    // and every distance in 1e6-scaled integer micro² arithmetic
    // (values stay < 2^53, so the codegen DotProduct over integral
    // doubles is EXACT and engine-portable; centroid means use
    // pmod-floor division so both engines floor negatives
    // identically). Output per nprobe: candidate volume and
    // recall@10 ppm — the curve that sets the serving default.
    //
    // Scale shape: centroids are one per-dim partial agg; cell
    // ranking is panel × cells; candidate scoring is panel ×
    // (nprobe/cells) of the corpus — never all-pairs except the
    // deliberate bounded-panel ground truth.
    Q("p252_ivf_nprobe_curve", Some("""
      WITH v AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                        [CAST(round(x * 1000000, 0) AS DOUBLE)
                         for x in CAST(embedding AS DOUBLE[])] AS v
                 FROM embeddings),
      n AS (SELECT vec_id, label, v,
                   CAST(list_dot_product(v, v) AS BIGINT) AS n2 FROM v),
      cx AS (SELECT label, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      cs AS (SELECT label, i, CAST(sum(x) AS BIGINT) AS s,
                    CAST(count(*) AS BIGINT) AS cnt
             FROM cx GROUP BY 1, 2),
      cent AS (SELECT label, list(CAST(s // cnt AS DOUBLE) ORDER BY i) AS c
               FROM cs GROUP BY 1),
      cn AS (SELECT label, c,
                    CAST(list_dot_product(c, c) AS BIGINT) AS nc
             FROM cent),
      q AS (SELECT vec_id AS qid, v AS qv, n2 AS nq FROM n
            WHERE vec_id % 50 = 0 AND vec_id < 2000),
      rc AS (SELECT qid, label,
                    row_number() OVER (PARTITION BY qid ORDER BY
                      nq + nc - 2 * CAST(list_dot_product(qv, c) AS BIGINT),
                      label) AS crk
             FROM q CROSS JOIN cn),
      gt AS (SELECT qid, vec_id FROM
             (SELECT q.qid, n.vec_id,
                     row_number() OVER (PARTITION BY q.qid ORDER BY
                       q.nq + n.n2
                         - 2 * CAST(list_dot_product(q.qv, n.v) AS BIGINT),
                       n.vec_id) AS rk
              FROM q JOIN n ON n.vec_id <> q.qid)
             WHERE rk <= 10),
      np(nprobe) AS (VALUES (1), (2), (4), (8)),
      cand AS (SELECT np.nprobe, rc.qid, n.vec_id,
                      q.nq + n.n2
                        - 2 * CAST(list_dot_product(q.qv, n.v) AS BIGINT)
                        AS d2
               FROM np JOIN rc ON rc.crk <= np.nprobe
               JOIN n ON n.label = rc.label
               JOIN q ON q.qid = rc.qid
               WHERE n.vec_id <> rc.qid),
      ivf AS (SELECT nprobe, qid, vec_id FROM
              (SELECT nprobe, qid, vec_id,
                      row_number() OVER (PARTITION BY nprobe, qid
                        ORDER BY d2, vec_id) AS rk
               FROM cand)
              WHERE rk <= 10),
      vol AS (SELECT nprobe, CAST(count(*) AS BIGINT) AS n_cand
              FROM cand GROUP BY 1),
      hit AS (SELECT i.nprobe, CAST(count(*) AS BIGINT) AS hits
              FROM ivf i JOIN gt ON gt.qid = i.qid
                AND gt.vec_id = i.vec_id
              GROUP BY 1),
      nq2 AS (SELECT CAST(count(*) AS BIGINT) AS nqs FROM q)
      SELECT CAST(v.nprobe AS BIGINT) AS nprobe, nq2.nqs AS n_queries,
             v.n_cand // nq2.nqs AS avg_candidates,
             coalesce(hit.hits, 0) * 1000000 // (10 * nq2.nqs)
               AS recall_ppm
      FROM vol v LEFT JOIN hit ON hit.nprobe = v.nprobe CROSS JOIN nq2
      ORDER BY nprobe""")) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.DotProduct.dot
      val v = Tables.loadSpread(spark, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          transform(col("embedding").cast("array<double>"),
            x => round(x * 1000000, 0)).as("v"))
      val n = v.withColumn("n2", dot(col("v"), col("v")).cast("long"))
        .localCheckpoint() // corpus norms feed centroids, GT, candidates
      val cs = n.select(col("label"),
          posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("label"), col("i"))
        .agg(sum(col("x").cast("long")).as("s"), count(lit(1)).as("cnt"))
      // pmod-floor division: both engines floor negative sums the same
      val cent = cs
        .withColumn("cj", expr("(s - pmod(s, cnt)) div cnt"))
        .groupBy(col("label"))
        .agg(transform(sort_array(collect_list(struct(col("i"), col("cj")))),
          e => e.getField("cj").cast("double")).as("c"))
        .withColumn("nc", dot(col("c"), col("c")).cast("long"))
      // BOUNDED query panel (an eval harness fixes its panel — it must
      // not grow with the corpus, or the panel×corpus ground-truth
      // pass stops being the bounded part of the plan)
      val q = n.where(col("vec_id") % 50 === 0 && col("vec_id") < 2000)
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("n2").as("nq"))
        .localCheckpoint()
      val rc = q.crossJoin(broadcast(cent))
        .select(col("qid"), col("label"),
          (col("nq") + col("nc") -
            lit(2) * dot(col("qv"), col("c")).cast("long")).as("d2c"))
        .withColumn("crk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d2c"), col("label"))))
      val scored = n.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), col("label"),
          (col("nq") + col("n2") -
            lit(2) * dot(col("qv"), col("v")).cast("long")).as("d2"))
        .localCheckpoint() // GT and all four probe depths read this
      val gt = scored.withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("d2"), col("vec_id"))))
        .where(col("rk") <= 10).select(col("qid"), col("vec_id"))
      val np = Seq(1, 2, 4, 8).toDF("nprobe")
      val cand = np.join(broadcast(rc), col("crk") <= col("nprobe"))
        .join(scored, Seq("qid", "label"))
        .select(col("nprobe"), col("qid"), col("vec_id"), col("d2"))
      val ivf = cand.withColumn("rk", row_number().over(
          Window.partitionBy(col("nprobe"), col("qid"))
            .orderBy(col("d2"), col("vec_id"))))
        .where(col("rk") <= 10)
      val vol = cand.groupBy(col("nprobe")).agg(count(lit(1)).as("n_cand"))
      val hit = ivf.join(gt, Seq("qid", "vec_id"))
        .groupBy(col("nprobe")).agg(count(lit(1)).as("hits"))
      val nqs = q.agg(count(lit(1)).as("nqs"))
      vol.join(hit, Seq("nprobe"), "left").crossJoin(broadcast(nqs))
        .select(col("nprobe").cast("long").as("nprobe"),
          col("nqs").as("n_queries"),
          expr("n_cand div nqs").as("avg_candidates"),
          expr("coalesce(hits, 0) * 1000000 div (10 * nqs)")
            .as("recall_ppm"))
        .orderBy(col("nprobe"))
    },

    // ---- drift null calibration (permutation test, hash-deterministic) -----
    // p160 reports source-pair TV distances; this answers the question
    // that decides whether anyone should CARE: is the most-drifting
    // pair's distance larger than what random splits of the same
    // pooled docs produce? The null is a 16-way DETERMINISTIC
    // permutation test — pseudo-sources are hash-rank splits of the
    // pooled pair at the exact original sizes (salted portable hash →
    // every engine and rerun draws the same permutations, the p247
    // reproducibility discipline applied to hypothesis testing). TV
    // stays exact: Σ|c1·n2 − c2·n1| cross-multiplied integers over
    // 2·n1·n2, reported in ppm. Output: the argmax pair, its observed
    // TV, the null max and median, and the verdict bit.
    //
    // Scale shape: per-pair TV is a histogram join (S² pairs of
    // metadata-sized histograms); the null re-ranks only the TWO
    // pooled sources' docs, ×16 bounded explode.
    Q("p253_drift_null_calibration", Some {
      val h = Portable.h32sSql(200,
        "concat(CAST(b AS VARCHAR), ':', CAST(doc_id AS VARCHAR))")
      s"""
      WITH d AS (SELECT doc_id, source,
                        CAST(len($wsSql) // 8 AS BIGINT) AS v
                 FROM documents),
      sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
      h1 AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c
             FROM d GROUP BY 1, 2),
      pr AS (SELECT a.source AS s1, b.source AS s2, a.n AS n1, b.n AS n2
             FROM sz a JOIN sz b ON a.source < b.source),
      tvv AS (SELECT pr.s1, pr.s2, pr.n1, pr.n2,
                     CAST(sum(abs(coalesce(x.c, 0) * pr.n2
                       - coalesce(y.c, 0) * pr.n1)) AS BIGINT) AS num
              FROM pr
              JOIN (SELECT DISTINCT v FROM d) vv ON true
              LEFT JOIN h1 x ON x.source = pr.s1 AND x.v = vv.v
              LEFT JOIN h1 y ON y.source = pr.s2 AND y.v = vv.v
              GROUP BY 1, 2, 3, 4),
      obs AS (SELECT s1, s2, n1, n2,
                     num * 1000000 // (2 * n1 * n2) AS tv_ppm
              FROM tvv),
      top AS (SELECT * FROM obs
              ORDER BY tv_ppm DESC, s1, s2 LIMIT 1),
      pool AS (SELECT d.doc_id, d.v, top.n1, top.n2 FROM d, top
               WHERE d.source = top.s1 OR d.source = top.s2),
      rr AS (SELECT p.doc_id, p.v, p.n1, p.n2, gb.b,
                    row_number() OVER (PARTITION BY gb.b
                      ORDER BY $h % 1000000, doc_id) AS rk
             FROM pool p, generate_series(0, 15) gb(b)),
      nh AS (SELECT b, v,
                    CAST(sum(CASE WHEN rk <= n1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c1,
                    CAST(sum(CASE WHEN rk > n1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c2,
                    min(n1) AS n1, min(n2) AS n2
             FROM rr GROUP BY 1, 2),
      ntv AS (SELECT b,
                     CAST(sum(abs(c1 * n2 - c2 * n1)) AS BIGINT)
                       * 1000000 // (2 * min(n1) * min(n2)) AS tv_ppm
              FROM nh GROUP BY 1),
      nstat AS (SELECT CAST(max(tv_ppm) AS BIGINT) AS null_max_ppm,
                       CAST(min(tv_ppm) AS BIGINT) AS null_min_ppm,
                       CAST(sum(CASE WHEN rkk = 8 THEN tv_ppm ELSE 0 END)
                         AS BIGINT) AS null_median_ppm
                FROM (SELECT tv_ppm, row_number() OVER (ORDER BY tv_ppm, b)
                        AS rkk FROM ntv))
      SELECT top.s1 AS src1, top.s2 AS src2,
             CAST(top.tv_ppm AS BIGINT) AS observed_tv_ppm,
             nstat.null_max_ppm, nstat.null_median_ppm,
             top.tv_ppm > nstat.null_max_ppm AS exceeds_null
      FROM top, nstat"""
    }) { (spark, dir) =>
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          expr("cast(size(split(lower(text), '\\\\s+')) div 8 as bigint)")
            .as("v"))
        .localCheckpoint() // histograms, argmax pool, and 16 splits
      val sz = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val h1 = d.groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
      val pr = sz.as("a").join(sz.as("b"),
          col("a.source") < col("b.source"))
        .select(col("a.source").as("s1"), col("b.source").as("s2"),
          col("a.n").as("n1"), col("b.n").as("n2"))
      val vv = d.select(col("v")).distinct()
      val tvv = pr.crossJoin(broadcast(vv))
        .join(h1.select(col("source").as("s1"), col("v"),
          col("c").as("c1")), Seq("s1", "v"), "left")
        .join(h1.select(col("source").as("s2"), col("v"),
          col("c").as("c2")), Seq("s2", "v"), "left")
        .groupBy(col("s1"), col("s2"), col("n1"), col("n2"))
        .agg(sum(abs(coalesce(col("c1"), lit(0L)) * col("n2") -
          coalesce(col("c2"), lit(0L)) * col("n1"))).as("num"))
      val obs = tvv.select(col("s1"), col("s2"), col("n1"), col("n2"),
        expr("num * 1000000 div (2 * n1 * n2)").as("tv_ppm"))
      val top = obs.orderBy(col("tv_ppm").desc, col("s1"), col("s2"))
        .limit(1).localCheckpoint() // 1-row argmax anchors pool + output
      val pool = d.crossJoin(broadcast(top))
        .where(col("source") === col("s1") || col("source") === col("s2"))
        .select(col("doc_id"), col("v"), col("n1"), col("n2"))
      val rr = pool.select(col("doc_id"), col("v"), col("n1"), col("n2"),
          explode(sequence(lit(0), lit(15))).as("b"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("b")).orderBy(
            Portable.h32s(200, concat(col("b").cast("string"), lit(":"),
              col("doc_id").cast("string"))) % 1000000, col("doc_id"))))
      val nh = rr.groupBy(col("b"), col("v"))
        .agg(sum(when(col("rk") <= col("n1"), 1L).otherwise(0L)).as("c1"),
          sum(when(col("rk") > col("n1"), 1L).otherwise(0L)).as("c2"),
          min(col("n1")).as("n1"), min(col("n2")).as("n2"))
      val ntv = nh.groupBy(col("b"))
        .agg(sum(abs(col("c1") * col("n2") - col("c2") * col("n1")))
          .as("num"), min(col("n1")).as("n1m"), min(col("n2")).as("n2m"))
        .select(col("b"),
          expr("num * 1000000 div (2 * n1m * n2m)").as("tv_ppm"))
      val nstat = ntv
        .withColumn("rkk", row_number().over(
          Window.orderBy(col("tv_ppm"), col("b"))))
        .agg(max(col("tv_ppm")).as("null_max_ppm"),
          sum(when(col("rkk") === 8, col("tv_ppm")).otherwise(0L))
            .as("null_median_ppm"))
      top.crossJoin(broadcast(nstat))
        .select(col("s1").as("src1"), col("s2").as("src2"),
          col("tv_ppm").as("observed_tv_ppm"),
          col("null_max_ppm"), col("null_median_ppm"),
          (col("tv_ppm") > col("null_max_ppm")).as("exceeds_null"))
    },

    // ---- fill-in-the-middle span planning ----------------------------------
    // Code-LM training prep (Bavarian et al. 2022): half the corpus
    // (a deterministic portable-hash gate, so every rerun and every
    // engine picks the SAME docs) is rearranged prefix/middle/suffix.
    // Span endpoints come from two salted portable hashes — start
    // uniform over tokens, length uniform over the remainder — and
    // the PSM layout adds three sentinel tokens. All integer
    // arithmetic; the oracle recomputes the identical hashes in SQL,
    // so the hash match proves split determinism cross-engine —
    // the property that makes a 100 TB FIM pass resumable and
    // shard-order-independent.
    //
    // Scale shape: pure scan-stage arithmetic, zero shuffle.
    Q("p241_fim_spans", Some {
      val h1 = Portable.h32sSql(1, "CAST(doc_id AS VARCHAR)")
      val h2 = Portable.h32sSql(2, "CAST(doc_id AS VARCHAR)")
      val hg = Portable.h32Sql("CAST(doc_id AS VARCHAR)")
      s"""
      WITH d AS (SELECT doc_id, CAST(len($wsSql) AS BIGINT) AS n
                 FROM documents),
      g AS (SELECT doc_id, n,
                   n >= 8 AND $hg % 100 < 50 AS fim,
                   $h1 % n AS s,
                   1 + $h2 % (n - $h1 % n) AS l
            FROM d)
      SELECT doc_id, fim AS fim_applied, n AS n_tokens,
             CAST(CASE WHEN fim THEN s ELSE n END AS BIGINT) AS prefix_len,
             CAST(CASE WHEN fim THEN l ELSE 0 END AS BIGINT) AS middle_len,
             CAST(CASE WHEN fim THEN n - s - l ELSE 0 END AS BIGINT)
               AS suffix_len,
             CAST(CASE WHEN fim THEN n + 3 ELSE n END AS BIGINT)
               AS packed_tokens
      FROM g ORDER BY doc_id"""
    }) { (spark, dir) =>
      val did = col("doc_id").cast("string")
      val d = Tables.loadSpread(spark, dir, "documents")
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n"))
      val g = d.select(col("doc_id"), col("n"),
        (col("n") >= 8 && Portable.h32(did) % 100 < 50).as("fim"),
        (Portable.h32s(1, did) % col("n")).as("s"),
        (lit(1) + Portable.h32s(2, did) %
          (col("n") - Portable.h32s(1, did) % col("n"))).as("l"))
      g.select(col("doc_id"), col("fim").as("fim_applied"),
          col("n").as("n_tokens"),
          when(col("fim"), col("s")).otherwise(col("n")).as("prefix_len"),
          when(col("fim"), col("l")).otherwise(0L).as("middle_len"),
          when(col("fim"), col("n") - col("s") - col("l")).otherwise(0L)
            .as("suffix_len"),
          when(col("fim"), col("n") + 3).otherwise(col("n"))
            .as("packed_tokens"))
        .orderBy(col("doc_id"))
    })
}
