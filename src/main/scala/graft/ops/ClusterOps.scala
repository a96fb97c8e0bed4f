package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DotProduct.dot

/** Distributed clustering over an embedding column.
  *
  * [[kmeansLloyd]] is Lloyd's k-means, shaped for Spark:
  *  - assignment is a broadcast of the (tiny) centroid set against the
  *    (huge) vector table — no shuffle of the vectors at all; the
  *    argmin is a `min(struct(d, cid, v))` aggregate, so map-side
  *    partial aggregation reduces each partition to one candidate per
  *    vector before anything moves.
  *  - recompute is one shuffle keyed on (cluster, dim) — the classic
  *    M-step — followed by a k-row rebuild.
  *  - each round's centroid frame is `localCheckpoint`ed so the plan
  *    does not grow with iterations (the p29 connected-components
  *    convention).
  *
  * Every quantity is SCALED-INTEGER math so any engine reproduces every
  * assignment bit-for-bit: vectors are shifted (+1, making them
  * positive so floor division equals truncation in both Spark and
  * DuckDB) and scaled to 1e6, then rounded — distances are exact
  * integers below 2^53 (64 dims x (2e6)^2 ≈ 2.6e14), and centroid
  * recompute is integer floor-division mean. Ties in the argmin break
  * by centroid id.
  */
object ClusterOps {

  /** Runs `iters` full Lloyd iterations (assign + recompute) from the
    * deterministic seed (centroids = the vectors of the `k` smallest
    * ids), then returns the final assignment
    * `(id, cluster, d)` — `d` the exact integer squared distance in the
    * scaled domain. Empty clusters drop out (their id never reappears),
    * identically in any engine.
    */
  def kmeansLloyd(vectors: DataFrame, id: String, vec: String,
                  k: Int, iters: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    val v = vectors
      .select(col(id).cast("long").as("vid"),
        expr(s"transform(cast($vec as array<double>), " +
          "x -> cast(round((x + 1.0D) * 1000000.0D, 0) as double))").as("v"))
      // read 2*iters+1 times; pin it once
      .localCheckpoint()
    // genuinely the k smallest ids (TakeOrderedAndProject — k rows move),
    // not `vid < k`, which would silently under-seed any id space that
    // is 1-based, sparse, or pre-filtered
    var cents = v.orderBy(col("vid")).limit(k)
      .select(col("vid").as("cid"), col("v").as("c"))

    // nearest centroid per vector: exact integer d^2 via the dot-product
    // identity; argmin as a partial-agg-friendly struct-min (NOT a
    // window — a window would shuffle every (vector, centroid) pair)
    def assign(cs: DataFrame): DataFrame = {
      val d = (dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("c"))
        + dot(col("c"), col("c"))).cast("long")
      v.crossJoin(broadcast(cs))
        .select(col("vid"), struct(d.as("d"), col("cid"), col("v")).as("s"))
        .groupBy(col("vid")).agg(min(col("s")).as("s"))
        .select(col("vid"), col("s.cid").as("cluster"), col("s.d").as("d"),
          col("s.v").as("v"))
    }

    (1 to iters).foreach { _ =>
      val members = assign(cents)
      cents = members
        .select(col("cluster"), posexplode(col("v")).as(Seq("j", "x")))
        .groupBy(col("cluster"), col("j"))
        // x is integral-valued double; the sum is exact below 2^53 and
        // positive (shifted domain), so div == floor division == DuckDB //
        .agg(expr("cast(sum(cast(x as bigint)) div count(1) as double)").as("m"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("j"), col("m")))),
          s => s.getField("m")).as("c"))
        .select(col("cluster").as("cid"), col("c"))
        .localCheckpoint() // k rows; keeps the loop plan flat
    }

    assign(cents).select(col("vid").as(id), col("cluster"), col("d"))
  }
}
