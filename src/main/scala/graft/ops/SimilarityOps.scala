package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.DotProduct.dot

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design:
  *  - the dot-product kernel is a native codegen'd Catalyst expression
  *    ([[graft.functions.DotProduct]]) — no UDF, no interpreted lambda.
  *  - vector norms are computed ONCE per row before any join (`nrm`),
  *    so each candidate pair costs exactly one dot product.
  *  - [[bruteForceTopK]] broadcasts the (small) query set and streams
  *    the big vector table once — the exact-search baseline; one
  *    shuffle for the per-query top-k (TakeOrdered-style window).
  *  - [[partitionedTopK]] is the IVF-style scale path: vectors are
  *    pre-bucketed by a coarse partition key (centroid/cluster id);
  *    each query probes only its bucket, so the join is an equi-join
  *    (shuffle by bucket) instead of a full scan per query.
  *
  * Similarities are rounded to 6 decimals before ranking so ordering is
  * reproducible across engines (ties broken by vector id). The division
  * order `dot / normA / normB` matches the DuckDB oracle exactly, and
  * the per-row norm equals the per-pair `sqrt(dot(v,v))` bit-for-bit
  * (same fold), so precomputing changes nothing in the output.
  */
object SimilarityOps {

  /** Cosine similarity of two same-length double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))

  /** (id, v, nrm) projection: vectors cast to double with their norm. */
  private def withNorm(df: DataFrame, id: String, vec: String,
                       idAs: String, vAs: String, nAs: String): DataFrame =
    df.select(col(id).as(idAs), col(vec).cast("array<double>").as(vAs))
      .withColumn(nAs, sqrt(dot(col(vAs), col(vAs))))

  /** Exact top-k neighbours for each query vector (brute force).
    * `vectors`/`queries`: (idCol, vecCol) frames; vecCol is
    * `array<float>` or `array<double>`.
    */
  def bruteForceTopK(vectors: DataFrame, queries: DataFrame,
                     id: String, vec: String, k: Int): DataFrame = {
    val v = withNorm(vectors, id, vec, "vec_id", "v", "nv")
    val q = withNorm(queries, id, vec, "query_id", "qv", "nq")
    val scored = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("v")) / col("nq") / col("nv"), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** IVF-style partitioned top-k: both sides carry a coarse bucket
    * column (cluster/centroid id); each query only scans its bucket.
    */
  def partitionedTopK(vectors: DataFrame, queries: DataFrame,
                      id: String, vec: String, bucket: String, k: Int): DataFrame = {
    val v = vectors
      .select(col(id).as("vec_id"), col(bucket).as("vb"),
        col(vec).cast("array<double>").as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    val q = queries
      .select(col(id).as("query_id"), col(bucket).as("qb"),
        col(vec).cast("array<double>").as("qv"))
      .withColumn("nq", sqrt(dot(col("qv"), col("qv"))))
    val scored = v.join(broadcast(q),
        col("vb") === col("qb") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("v")) / col("nq") / col("nv"), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** SRP-bucketed top-k with a hard per-bucket candidate cap — the
    * scale-safe swap-in for [[bruteForceTopK]] when the QUERY side grows
    * with the corpus (the p261/p12 lesson applied to kNN; the extended
    * quadratic-join lint flags the brute-force shape): candidates come
    * only from the query's k-bit SRP bucket, the candidate side keeps at
    * most `maxMembers` vectors per bucket (first by id — deterministic,
    * oracle-reproducible), so comparison volume is ≤ maxMembers·|queries|
    * at any corpus and the capped candidate table (≤ 2^planesK·maxMembers
    * rows BY CONSTRUCTION) broadcasts — zero shuffle on the corpus side.
    */
  def srpCappedTopK(vectors: DataFrame, queries: DataFrame, id: String,
                    vec: String, k: Int, planesK: Int, dim: Int,
                    maxMembers: Int = 200): DataFrame = {
    val planes = srpHyperplanes(planesK, dim)
    val v0 = withNorm(vectors, id, vec, "vec_id", "v", "nv")
      .withColumn("bk", srpBucket(col("v"), planes))
    val capW = Window.partitionBy(col("bk")).orderBy(col("vec_id"))
    val v = v0.withColumn("mrk", row_number().over(capW))
      // no-silent-caps: members beyond the cap are counted, not hidden
      .observe("graft_srp_capped_topk",
        sum(when(col("mrk") > maxMembers, 1).otherwise(0)).as("dropped_members"))
      .filter(col("mrk") <= maxMembers).drop("mrk")
    val q = withNorm(queries, id, vec, "query_id", "qv", "nq")
      .withColumn("qbk", srpBucket(col("qv"), planes))
    val scored = broadcast(v).join(q,
        col("bk") === col("qbk") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot(col("qv"), col("v")) / col("nq") / col("nv"), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Embedding near-duplicate pairs above a cosine threshold, blocked
    * by a coarse bucket (never all-pairs): pairs are only formed inside
    * a bucket, the IVF analog for dedup.
    */
  def nearDupPairs(vectors: DataFrame, id: String, vec: String,
                   bucket: String, minSim: Double): DataFrame = {
    val v = vectors
      .select(col(id).as("did"), col(bucket).as("bk"),
        col(vec).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    v.as("x").join(v.as("y"),
        col("x.bk") === col("y.bk") && col("x.did") < col("y.did"))
      .select(col("x.did").as("a"), col("y.did").as("b"),
        round(dot(col("x.v"), col("y.v")) / col("x.nrm") / col("y.nrm"), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Label+SRP-blocked near-dup pairs with a hard member cap — the
    * r14 reformulation of the label-only [[nearDupPairs]] blocking
    * (the p261 lesson, caught again by the quadratic-join lint: a
    * label is O(1)-cardinality, so label-only blocks are
    * O(corpus²/|labels|)). Blocks are (label, k-bit SRP bucket);
    * pair generation happens inside ONE collect_list shuffle, members
    * sorted by id so pairs emerge a<b; blocks past `maxMembers`
    * abstain and the drop count surfaces as an observed metric
    * (no-silent-caps). Pair volume is ≤ maxMembers·n at any corpus;
    * the plane count is the resolution knob a larger corpus raises.
    */
  def blockedNearDupPairs(vectors: DataFrame, id: String, vec: String,
                          label: String, k: Int, dim: Int, minSim: Double,
                          maxMembers: Int = 200): DataFrame = {
    val planes = srpHyperplanes(k, dim)
    val v = vectors
      .select(col(id).as("did"), col(label).as("lb"),
        col(vec).cast("array<double>").as("v"))
      .withColumn("bk", srpBucket(col("v"), planes))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val buckets = v
      .groupBy(col("lb"), col("bk"))
      .agg(sort_array(collect_list(struct(col("did"), col("v"),
        col("nrm")))).as("ds"))
      .observe("graft_blocked_neardup",
        sum(when(size(col("ds")) > maxMembers, 1).otherwise(0))
          .as("dropped_oversized"))
      .filter(size(col("ds")).between(2, maxMembers))
    buckets
      .select(col("ds"), posexplode(col("ds")).as(Seq("i", "pa")))
      .select(col("pa"), expr("slice(ds, i + 2, size(ds))").as("rest"))
      .select(col("pa"), explode(col("rest")).as("pb"))
      .select(col("pa.did").as("a"), col("pb.did").as("b"),
        round(dot(col("pa.v"), col("pb.v")) / col("pa.nrm") / col("pb.nrm"),
          6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  // --- signed-random-projection LSH (Charikar, STOC'02) ------------------
  //
  // The LSH-family ANN path when no cluster label exists: k deterministic
  // ±1 hyperplanes; a vector's bucket is the k-bit pattern of
  // sign(dot(v, h_j)). Cosine-similar vectors agree on most signs, so
  // near-dup candidates come from a bucket equi-join — 2^k keys, never
  // all-pairs. Hyperplanes derive from md5 parity so both engines (and
  // every executor) build bit-identical planes with no shared state.

  /** Deterministic ±1 hyperplanes: entry (j,i) is +1 iff the low bit of
    * the first byte of md5("srp:j:i") is set.
    */
  def srpHyperplanes(k: Int, dim: Int): Seq[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until k).map { j =>
      Array.tabulate(dim) { i =>
        md.reset()
        val b = md.digest(s"srp:$j:$i".getBytes("UTF-8"))(0)
        if ((b & 1) == 1) 1.0 else -1.0
      }
    }
  }

  /** k-bit SRP bucket of a double-array column. */
  def srpBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (h, j) =>
      when(dot(vec, typedlit(h.toSeq)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Near-dup pairs via SRP-LSH bucketing: like [[nearDupPairs]] but the
    * blocking key is computed from the vectors themselves. Exactly ONE
    * shuffle forms the buckets; candidates never leave their bucket.
    * `dim` must equal the embedding dimension — enforced per row below,
    * because a mismatch would silently bucket on a prefix (dim too
    * small) or fold missing components as zero, degrading recall.
    */
  def srpNearDupPairs(vectors: DataFrame, id: String, vec: String,
                      k: Int, minSim: Double, dim: Int): DataFrame = {
    val planes = srpHyperplanes(k, dim)
    val v = vectors
      .select(col(id).as("did"), col(vec).cast("array<double>").as("v"))
      // assert_true raises on the first mismatched row and returns NULL
      // otherwise, so the filter passes every valid row; as a filter
      // predicate it cannot be pruned away
      .filter(assert_true(size(col("v")) === dim,
        concat(lit(s"srpNearDupPairs: embedding dim != $dim, got "),
          size(col("v")).cast("string"))).isNull)
      .withColumn("bk", srpBucket(col("v"), planes))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    v.as("x").join(v.as("y"),
        col("x.bk") === col("y.bk") && col("x.did") < col("y.did"))
      .select(col("x.did").as("a"), col("y.did").as("b"),
        round(dot(col("x.v"), col("y.v")) / col("x.nrm") / col("y.nrm"), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Per-table deterministic hyperplanes: table 0 IS [[srpHyperplanes]]
    * (seed `srp:j:i`, so L=1 degenerates to the single-table operator);
    * table t>0 salts the seed as `srp:t:j:i` — independent sign
    * patterns per table, still bit-identical on every engine/executor.
    */
  def srpTablePlanes(table: Int, k: Int, dim: Int): Seq[Array[Double]] =
    if (table == 0) srpHyperplanes(k, dim)
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until k).map { j =>
        Array.tabulate(dim) { i =>
          md.reset()
          val b = md.digest(s"srp:$table:$j:$i".getBytes("UTF-8"))(0)
          if ((b & 1) == 1) 1.0 else -1.0
        }
      }
    }

  /** Multi-table SRP-LSH — how production raises LSH recall WITHOUT
    * paying the k=4-style candidate blowup: L independent k-bit tables,
    * a pair is a candidate if it collides in ANY table (union), then
    * deduped. Recall compounds as 1-(1-p^k)^L while per-table candidate
    * volume stays at the k-bit level (the measured lift is pinned by
    * PipelineOpsSpec against the single-table operator on the planted
    * fixture).
    *
    * Scale shape: the explode carries only (id, table, bucket) — L slim
    * rows per vector, never the vector itself — candidates form in one
    * (table, bucket) equi-join, the pair set DEDUPES BEFORE the vectors
    * are fetched (the expensive columns join back onto the already-
    * shrunk candidate list), and nothing is ever all-pairs.
    */
  def srpMultiTablePairs(vectors: DataFrame, id: String, vec: String,
                         k: Int, minSim: Double, dim: Int,
                         tables: Int): DataFrame = {
    require(tables >= 1, s"srpMultiTablePairs: tables must be >= 1, got $tables")
    val v = vectors
      .select(col(id).as("did"), col(vec).cast("array<double>").as("v"))
      .filter(assert_true(size(col("v")) === dim,
        concat(lit(s"srpMultiTablePairs: embedding dim != $dim, got "),
          size(col("v")).cast("string"))).isNull)
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val slim = v.select(col("did"), explode(array((0 until tables).map { t =>
        struct(lit(t).as("t"),
          srpBucket(col("v"), srpTablePlanes(t, k, dim)).as("bk"))
      }: _*)).as("tb"))
      .select(col("did"), col("tb.t").as("t"), col("tb.bk").as("bk"))
    val cand = slim.as("x").join(slim.as("y"),
        col("x.t") === col("y.t") && col("x.bk") === col("y.bk") &&
          col("x.did") < col("y.did"))
      .select(col("x.did").as("a"), col("y.did").as("b"))
      .distinct() // a pair found by several tables scores once
    cand
      .join(v.select(col("did").as("a"), col("v").as("va"), col("nrm").as("na")), "a")
      .join(v.select(col("did").as("b"), col("v").as("vb"), col("nrm").as("nb")), "b")
      .select(col("a"), col("b"),
        round(dot(col("va"), col("vb")) / col("na") / col("nb"), 6).as("sim"))
      .filter(col("sim") >= minSim)
  }

  // ---- product quantization (p88) ------------------------------------------
  // 64 floats → m 4-bit codes is the 16× memory cut that lets a 100 TB
  // embedding corpus serve from RAM. All arithmetic in integer
  // micro-units (round(x*1e6), the p35 convention) so codes and
  // distances are bit-exact cross-engine and order-independent.

  /** Explode an embedding table into integer subspace components:
    * `(vec_id, sub, j, ri)` with `sub = dim div subDim` subspaces of
    * `subDim` components each. Row-local; stays in the scan stage.
    */
  def pqComponents(emb: DataFrame, id: String, vec: String,
                   subDim: Int): DataFrame =
    emb.select(col(id).as("vec_id"),
        posexplode(col(vec).cast("array<double>")).as(Seq("i0", "x")))
      .select(col("vec_id"), (col("i0") / subDim).cast("long").as("sub"),
        (col("i0") % subDim).as("j"),
        round(col("x") * 1000000, 0).cast("long").as("ri"))

  /** A `ks`-entry per-subspace codebook seeded from a hash-ranked
    * sample of the corpus (the k-means++ init; p56's trained centroids
    * plug into the same `(sub, code, j, cv)` shape). The row_number
    * window runs over the post-limit `ks`-row frame only — the
    * documented broadcast-scalar exception, never the corpus.
    */
  def pqSeedCodebook(emb: DataFrame, id: String, vec: String,
                     subDim: Int, ks: Int, salt: String): DataFrame = {
    val seeds = emb
      .select(col(id).as("vec_id"),
        Portable.h60(concat(lit(s"$salt:"), col(id).cast("string"))).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(ks)
      .withColumn("code",
        row_number().over(Window.orderBy(col("h"), col("vec_id"))) - 1)
      .select(col("vec_id"), col("code"))
    broadcast(seeds).join(pqComponents(emb, id, vec, subDim), "vec_id")
      .select(col("code"), col("sub"), col("j"), col("ri").as("cv"))
  }

  /** Encode every vector against the (broadcast) codebook: ONE shuffle
    * of `(vec, sub, code)` partial distances with map-side combine,
    * argmin = struct-min aggregate (NOT a window), ties to the lowest
    * code id. Returns `(vec_id, sub, code)` — the m-nibble PQ code.
    */
  def pqEncode(c: DataFrame, cb: DataFrame): DataFrame =
    c.join(broadcast(cb), Seq("sub", "j"))
      .groupBy(col("vec_id"), col("sub"), col("code"))
      .agg(sum((col("ri") - col("cv")) * (col("ri") - col("cv"))).as("d"))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("d").as("d"), col("code").as("code"))).as("m"))
      .select(col("vec_id"), col("sub"), col("m.code").as("code"))

  /** Asymmetric distance computation: build the per-query `m × ks`
    * distance table once (query-local, broadcast), then approx distance
    * per vector = m table lookups + one sum. `exact_dist` rides along
    * (a broadcast join of the 1-vector query against the components)
    * so callers can measure the quantization gap. Top-k =
    * orderBy+limit → TakeOrderedAndProject, O(partitions×k) movement.
    */
  def pqAdcTopK(codes: DataFrame, cb: DataFrame, c: DataFrame,
                queryId: Long, k: Int): DataFrame = {
    val q = c.filter(col("vec_id") === queryId)
      .select(col("sub"), col("j"), col("ri").as("qri"))
    val dt = cb.join(broadcast(q), Seq("sub", "j"))
      .groupBy(col("sub"), col("code"))
      .agg(sum((col("qri") - col("cv")) * (col("qri") - col("cv"))).as("qd"))
    val adc = codes.join(broadcast(dt), Seq("sub", "code"))
      .groupBy(col("vec_id")).agg(sum(col("qd")).as("adc_dist"))
    val ex = c.join(broadcast(q), Seq("sub", "j"))
      .groupBy(col("vec_id"))
      .agg(sum((col("ri") - col("qri")) * (col("ri") - col("qri"))).as("exact_dist"))
    adc.join(ex, "vec_id")
      .select(col("vec_id"), col("adc_dist"), col("exact_dist"))
      .orderBy(col("adc_dist"), col("vec_id")).limit(k)
  }
}
