package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Portable, SimilarityOps}

/** Round-8 pipeline entries, fifth batch: the composed ANN serving
  * architecture (IVF-PQ with residual quantization) and its relatives.
  */
object Pipeline10 {

  private def h60VecSql(salt: String) =
    Portable.h60Sql(s"concat('$salt:', CAST(vec_id AS VARCHAR))")


  /** p111's probe terms — compile-time constants shared by the batch
    * entry, the streaming entry (p191), and the oracle text.
    */
  private[queries] val cmsProbes = Seq("scan", "batch", "zzzmissing")

  /** ONE oracle for both faces of the mergeable CMS: the batch
    * aggregate (p111) and the streaming-state aggregate (p191). The
    * SQL rebuilds the identical 4x256 counter matrix; sharing the text
    * makes the batch=stream equivalence claims inseparable.
    */
  private[queries] val cmsOracle: String = {
      val probes = cmsProbes
      val probeVals = probes.map(t => s"('$t')").mkString(", ")
      s"""
      WITH t AS (SELECT source, unnest(${TextSql.ws}) AS term FROM documents),
      cnt AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
              FROM t GROUP BY 1, 2),
      rr(r) AS (VALUES (0), (1), (2), (3)),
      cms AS (SELECT source, r,
                     ${Portable.h60Sql("concat(CAST(r AS VARCHAR), ':', term)")}
                       % 256 AS slot,
                     CAST(sum(c) AS BIGINT) AS ctr
              FROM cnt, rr GROUP BY 1, 2, 3),
      p(term) AS (VALUES $probeVals),
      ps AS (SELECT p.term, rr.r,
                    ${Portable.h60Sql("concat(CAST(rr.r AS VARCHAR), ':', p.term)")}
                      % 256 AS slot
             FROM p, rr),
      src AS (SELECT DISTINCT source FROM documents),
      est AS (SELECT s.source, ps.term, min(coalesce(cms.ctr, 0)) AS cms_est
              FROM src s CROSS JOIN ps
              LEFT JOIN cms ON cms.source = s.source AND cms.r = ps.r
                           AND cms.slot = ps.slot
              GROUP BY 1, 2)
      SELECT e.source, e.term,
             CAST(coalesce(cnt.c, 0) AS BIGINT) AS true_count,
             CAST(e.cms_est AS BIGINT) AS cms_est,
             CAST(e.cms_est - coalesce(cnt.c, 0) AS BIGINT) AS overestimate
      FROM est e LEFT JOIN cnt ON cnt.source = e.source AND cnt.term = e.term
      ORDER BY 1, 2"""
  }

  /** The probe tail over a per-source CMS sketch frame `sk` (columns
    * source, cms) and the raw term stream: estimates for the probe
    * terms next to true counts — p111's output, reused verbatim by the
    * streaming entry so both faces emit the same schema.
    */
  private[queries] def cmsProbeOutput(
      sk: org.apache.spark.sql.DataFrame,
      terms: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.Cms
    val probeStructs = cmsProbes.map { t =>
      val est = (0 until 4).map(r =>
        element_at(col("cms"), r * 256 + Cms.slot(r, t, 256) + 1))
        .reduce(least(_, _))
      struct(lit(t).as("term"), est.as("cms_est"))
    }
    val tc = terms.where(col("term").isin(cmsProbes: _*))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("true_count"))
    sk.select(col("source"), explode(array(probeStructs: _*)).as("p"))
      .select(col("source"), col("p.term").as("term"),
        col("p.cms_est").as("cms_est"))
      .join(tc, Seq("source", "term"), "left")
      .select(col("source"), col("term"),
        coalesce(col("true_count"), lit(0L)).as("true_count"),
        col("cms_est"),
        (col("cms_est") - coalesce(col("true_count"), lit(0L)))
          .as("overestimate"))
      .orderBy(col("source"), col("term"))
  }

  val all: Seq[Q] = Seq(

    // ---- IVF-PQ with residual quantization (the FAISS architecture) --------
    // The production ANN index in full: a coarse quantizer routes each
    // vector to a bucket (IVF, 8 centroids), the RESIDUAL vector −
    // centroid is product-quantized (m=4 subspaces × 16 dims, 4 codes
    // each), and a query probes its nprobe=2 nearest buckets, building
    // one per-bucket ADC table over the QUERY's residual — because
    // residuals are small where the coarse quantizer is good, PQ on
    // residuals loses far less than PQ on raw vectors (p88). Every
    // stage is scaled-integer exact with explicit tie-breaks, so the
    // full train→encode→probe→search trajectory hash-matches the
    // oracle. exact_dist rides along to expose the quantization gap.
    //
    // Scale shape: codebooks are 8- and 4-row broadcast tables; coarse
    // assign and residual encode are the p88/p92 partial-agg +
    // struct-min shapes; the probe prunes the search to 2 buckets
    // (~nprobe/nlist of the corpus) BEFORE the ADC join; top-k is
    // TakeOrdered. The seed row_numbers run post-limit on ≤8-row
    // frames (the documented exception).
    Q("p110_ivfpq_residual", Some(s"""
      WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cx AS (SELECT vec_id, unnest(generate_series(1, len(v))) AS i,
                    unnest(v) AS x FROM v),
      c AS (SELECT vec_id, i - 1 AS j,
                   CAST(round(x * 1000000) AS BIGINT) AS ri FROM cx),
      s0 AS (SELECT vec_id, rn - 1 AS code FROM
               (SELECT vec_id, row_number() OVER
                  (ORDER BY ${h60VecSql("ivfpq")}, vec_id) AS rn
                FROM embeddings) WHERE rn <= 8),
      cb0 AS (SELECT s0.code, c.j, c.ri AS cv
              FROM s0 JOIN c ON c.vec_id = s0.vec_id),
      d0 AS (SELECT c.vec_id, cb0.code,
                    sum((c.ri - cb0.cv) * (c.ri - cb0.cv)) AS d
             FROM c JOIN cb0 ON cb0.j = c.j GROUP BY 1, 2),
      asg AS (SELECT vec_id, code AS bucket FROM
                (SELECT vec_id, code, row_number() OVER
                   (PARTITION BY vec_id ORDER BY d, code) AS rn FROM d0)
              WHERE rn = 1),
      res AS (SELECT c.vec_id, a.bucket, c.j // 16 AS sub, c.j % 16 AS jj,
                     c.ri - cb0.cv AS rri
              FROM c JOIN asg a ON a.vec_id = c.vec_id
                     JOIN cb0 ON cb0.code = a.bucket AND cb0.j = c.j),
      sr AS (SELECT vec_id, rn - 1 AS code FROM
               (SELECT vec_id, row_number() OVER
                  (ORDER BY ${h60VecSql("ivfpqr")}, vec_id) AS rn
                FROM embeddings) WHERE rn <= 4),
      cbr AS (SELECT sr.code, r.sub, r.jj, r.rri AS cv
              FROM sr JOIN res r ON r.vec_id = sr.vec_id),
      dr AS (SELECT r.vec_id, r.sub, cb.code,
                    sum((r.rri - cb.cv) * (r.rri - cb.cv)) AS d
             FROM res r JOIN cbr cb ON cb.sub = r.sub AND cb.jj = r.jj
             GROUP BY 1, 2, 3),
      codes AS (SELECT vec_id, sub, code FROM
                  (SELECT vec_id, sub, code, row_number() OVER
                     (PARTITION BY vec_id, sub ORDER BY d, code) AS rn FROM dr)
                WHERE rn = 1),
      qc AS (SELECT j, ri AS qri FROM c WHERE vec_id = 0),
      pr AS (SELECT code AS bucket FROM
               (SELECT cb0.code, sum((cb0.cv - qc.qri) * (cb0.cv - qc.qri)) AS d
                FROM cb0 JOIN qc ON qc.j = cb0.j GROUP BY 1
                ORDER BY d, code LIMIT 2)),
      qres AS (SELECT p.bucket, cb0.j // 16 AS sub, cb0.j % 16 AS jj,
                      qc.qri - cb0.cv AS qrri
               FROM pr p JOIN cb0 ON cb0.code = p.bucket
                      JOIN qc ON qc.j = cb0.j),
      dt AS (SELECT q.bucket, q.sub, cb.code,
                    sum((q.qrri - cb.cv) * (q.qrri - cb.cv)) AS qd
             FROM qres q JOIN cbr cb ON cb.sub = q.sub AND cb.jj = q.jj
             GROUP BY 1, 2, 3),
      cand AS (SELECT co.vec_id, a.bucket, co.sub, co.code
               FROM codes co JOIN asg a ON a.vec_id = co.vec_id
                      JOIN pr ON pr.bucket = a.bucket),
      adc AS (SELECT cand.vec_id, cand.bucket,
                     CAST(sum(dt.qd) AS BIGINT) AS adc_dist
              FROM cand JOIN dt ON dt.bucket = cand.bucket
                     AND dt.sub = cand.sub AND dt.code = cand.code
              GROUP BY 1, 2),
      ex AS (SELECT c.vec_id,
                    CAST(sum((c.ri - qc.qri) * (c.ri - qc.qri)) AS BIGINT)
                      AS exact_dist
             FROM c JOIN qc ON qc.j = c.j GROUP BY 1),
      top AS (SELECT adc.vec_id, adc.bucket, adc.adc_dist, ex.exact_dist
              FROM adc JOIN ex USING (vec_id)
              ORDER BY adc.adc_dist, adc.vec_id LIMIT 5)
      SELECT CAST(row_number() OVER (ORDER BY adc_dist, vec_id) AS BIGINT)
               AS rk,
             vec_id, CAST(bucket AS BIGINT) AS bucket, adc_dist, exact_dist
      FROM top ORDER BY rk""")) { (spark, dir) =>
      val emb = Tables.loadSpread(spark, dir, "embeddings")
      val c = SimilarityOps.pqComponents(emb, "vec_id", "embedding", 64)
        .select(col("vec_id"), col("j"), col("ri"))
      val cb0 = SimilarityOps.pqSeedCodebook(emb, "vec_id", "embedding",
          subDim = 64, ks = 8, salt = "ivfpq")
        .select(col("code"), col("j"), col("cv"))
      val asg = c.join(broadcast(cb0), "j")
        .groupBy(col("vec_id"), col("code"))
        .agg(sum((col("ri") - col("cv")) * (col("ri") - col("cv"))).as("d"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d").as("d"), col("code").as("code"))).as("m"))
        .select(col("vec_id"), col("m.code").as("bucket"))
      val res = c.join(asg, "vec_id")
        .join(broadcast(cb0.select(col("code").as("bucket"), col("j"),
          col("cv"))), Seq("bucket", "j"))
        .select(col("vec_id"), col("bucket"),
          (col("j") / 16).cast("long").as("sub"), (col("j") % 16).as("jj"),
          (col("ri") - col("cv")).as("rri"))
      val seedR = emb.select(col("vec_id"),
          Portable.h60(concat(lit("ivfpqr:"), col("vec_id").cast("string")))
            .as("h"))
        .orderBy(col("h"), col("vec_id")).limit(4)
        .withColumn("code",
          row_number().over(Window.orderBy(col("h"), col("vec_id"))) - 1)
        .select(col("vec_id"), col("code"))
      val cbr = broadcast(seedR).join(res, "vec_id")
        .select(col("code"), col("sub"), col("jj"), col("rri").as("cv"))
      val codes = res.join(broadcast(cbr), Seq("sub", "jj"))
        .groupBy(col("vec_id"), col("sub"), col("code"))
        .agg(sum((col("rri") - col("cv")) * (col("rri") - col("cv"))).as("d"))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("d").as("d"), col("code").as("code"))).as("m"))
        .select(col("vec_id"), col("sub"), col("m.code").as("code"))
      val qc = c.filter(col("vec_id") === 0)
        .select(col("j"), col("ri").as("qri"))
      val probe = cb0.join(broadcast(qc), "j")
        .groupBy(col("code"))
        .agg(sum((col("cv") - col("qri")) * (col("cv") - col("qri"))).as("d"))
        .orderBy(col("d"), col("code")).limit(2)
        .select(col("code").as("bucket"))
      val qres = broadcast(probe)
        .join(cb0.select(col("code").as("bucket"), col("j"), col("cv")),
          "bucket")
        .join(broadcast(qc), "j")
        .select(col("bucket"), (col("j") / 16).cast("long").as("sub"),
          (col("j") % 16).as("jj"), (col("qri") - col("cv")).as("qrri"))
      val dt = qres.join(broadcast(cbr), Seq("sub", "jj"))
        .groupBy(col("bucket"), col("sub"), col("code"))
        .agg(sum((col("qrri") - col("cv")) * (col("qrri") - col("cv")))
          .as("qd"))
      val cand = codes.join(asg, "vec_id").join(broadcast(probe), "bucket")
      val adc = cand.join(broadcast(dt), Seq("bucket", "sub", "code"))
        .groupBy(col("vec_id"), col("bucket"))
        .agg(sum(col("qd")).as("adc_dist"))
      val ex = c.join(broadcast(qc), "j")
        .groupBy(col("vec_id"))
        .agg(sum((col("ri") - col("qri")) * (col("ri") - col("qri")))
          .as("exact_dist"))
      val top = adc.join(ex, "vec_id")
        .orderBy(col("adc_dist"), col("vec_id")).limit(5)
      top.withColumn("rk",
          row_number().over(Window.orderBy(col("adc_dist"), col("vec_id")))
            .cast("long"))
        .select(col("rk"), col("vec_id"), col("bucket").cast("long")
          .as("bucket"), col("adc_dist"), col("exact_dist"))
        .orderBy(col("rk"))
    },

    // ---- mergeable Count-Min Sketch (grouped heavy-hitter summary) ---------
    // The second custom mergeable aggregate (after p62's quantile
    // sketch): per-source 4×256 Count-Min counter matrices over the
    // token stream, probed for two hot terms and one absent term.
    // Because the hash family is the portable md5 h60 (NOT an
    // engine-private hash), the ORACLE REBUILDS THE ENTIRE COUNTER
    // MATRIX in SQL and the estimates match bit-for-bit — including
    // the collision-driven overestimate on the absent term (CMS
    // guarantees estimate >= truth; the `overestimate` column is the
    // measured slack). Probe slots are compile-time constants (the
    // same md5 computed driver-side), so reading an estimate is just
    // `least(element_at(...))` on the sketch array.
    //
    // Scale shape: TypedImperativeAggregate → map-side partials; each
    // partition contributes ONE 1024-long array per source to the
    // shuffle regardless of vocabulary size; merges are elementwise
    // adds (commutative — partitioning can't change the state). This
    // is the p73/p77 incremental-rollup state for frequencies.
    Q("p111_cms_sketch", Some(cmsOracle)) { (spark, dir) =>
      import graft.functions.Cms
      import graft.ops.TextOps
      val terms = Tables.loadSpread(spark, dir, "documents")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("term"))
      val sk = terms.groupBy(col("source"))
        .agg(Cms.sketch(col("term"), 4, 256).as("cms"))
      cmsProbeOutput(sk, terms)
    }
  )
}
