package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators over edge lists — the same
  * loop discipline as [[DedupOps.connectedComponents]] and
  * [[ClusterOps.kmeansLloyd]]: every round is a bounded shuffle keyed
  * on the edge endpoints, the loop's plan depth stays bounded by
  * checkpointing every 4th round (r20: a linear chain of 3 unrolled
  * rounds is a 6-join plan — one action instead of three
  * materialization jobs; per-round checkpointing is only load-bearing
  * when a round reads its input more than once), and ALL arithmetic is
  * integer (scaled ranks, floor division), so any engine replays the
  * fixpoint bit-for-bit.
  */
object GraphOps {

  /** `iters` rounds of damped PageRank over a weighted directed edge
    * list `(src, dst, w)`, returning `(node, rank)` for every node in
    * `nodes` — scaled-integer arithmetic throughout:
    * `rank' = (100-dampPct)% of scale + dampPct% of inflow`, where each
    * edge contributes `rank(src) * w div outWeight(src)` (floor
    * division; the damping terms are also floor divisions, applied in
    * a fixed order both engines share).
    *
    * Dangling nodes (no out-edges) keep their rank out of circulation
    * — the simple damped formulation; isolated nodes settle at the
    * teleport base. Scale shape: per round, ONE join of the rank table
    * to the edge list on `src` and ONE aggregation on `dst` — both
    * shuffles sized to the graph, never to whatever corpus produced
    * it. The out-weight table is computed once, joined into the edge
    * list up front, and the combined list is checkpointed, so the loop
    * re-reads a pinned edge relation instead of recomputing its
    * lineage `iters` times.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int,
               scale: Long = 1000000L, dampPct: Long = 85L): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct in [0,100], got $dampPct")
    val ow = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val e = edges.join(ow, "src")
      .select(col("src"), col("dst"), col("w"), col("ow"))
      .localCheckpoint()
    // the node table is referenced every round — pin it too, or each
    // iteration re-runs whatever corpus-sized lineage produced it
    val ns = nodes.select(col("node")).localCheckpoint()
    val base = scale * (100L - dampPct) / 100L
    var r = ns.select(col("node"), lit(scale).as("rank"))
    (1 to iters).foreach { i =>
      val inflow = e.join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("(rank * w) div ow").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      r = ns.join(inflow, Seq("node"), "left")
        .select(col("node"),
          expr(s"$base + ($dampPct * coalesce(inflow, 0L)) div 100")
            .cast("long").as("rank"))
      // checkpoint every 4th round, not every round (r20): the rounds
      // between checkpoints pipeline into ONE action over the pinned
      // e/ns relations — same shuffles, fewer materialization jobs; a
      // 4-deep join/agg chain keeps the plan far below the growth the
      // per-round checkpoint guards against (both repo consumers run
      // iters = 3, i.e. one unrolled action)
      if (i % 4 == 0 && i < iters) r = r.localCheckpoint()
    }
    r
  }
}
