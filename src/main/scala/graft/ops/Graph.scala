package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics kernels over a weighted directed edge list
  * `(src, dst, w, outw)` where `outw` is the total outgoing weight of
  * `src`. Implemented from the public algorithms (PageRank: Page et al.
  * 1999, "The PageRank Citation Ranking") in exact fixed-point integer
  * arithmetic; the `graph_pagerank` gate's DuckDB oracle replays the
  * three unrolled iterations bit-identically, and GraphSpec checks the
  * kernel against an in-memory reference loop.
  *
  * Reference scope: the reference engine (MergeExtractor) has no graph
  * surface — this is extension tier for training-data pipelines, where
  * the same shapes rank documents by citation/link structure.
  */
object Graph {
  /** Total rank mass in fixed-point units (1e12). */
  val Scale = 1000000000000L

  /** Damping factor as an integer percentage (85/100). */
  val DampingPct = 85L

  /** Exact-integer PageRank over a weighted edge view in which EVERY
    * node has out-edges (true for any symmetrized graph — co-purchase,
    * co-citation, mutual-link), so no dangling-mass term is needed.
    *
    * Per iteration, with floor division at exactly two points (mirrored
    * by the oracle's `//`, safe because all quantities are nonnegative):
    *
    *   contrib(v) = sum over edges (u,v): (pr(u) * w) div outw(u)
    *   pr'(v)     = (15 * (Scale div N)) div 100
    *                + (85 * contrib(v)) div 100
    *
    * Scale posture: each iteration is one shuffle-join of the rank table
    * (keyed by node) against the edge list (keyed by src) plus one
    * aggregation by dst — the standard distributed PageRank shape. The
    * rank table is localCheckpoint-ed per round so the logical plan stays
    * constant-size across iterations (the Components.propagate lineage
    * discipline); on a cluster the same cut is a reliable checkpoint.
    * Rank mass decays slightly each round from the floors — deterministic
    * and identical on both engines.
    *
    * @param edges (src, dst, w, outw); every src also appears as a dst.
    * @return (node, pr) for every node that appears as an edge src.
    */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    val eo = edges.select(col("src"), col("dst"), col("w"), col("outw"))
      .localCheckpoint()
    val nodes = eo.select(col("src").as("node")).distinct().localCheckpoint()
    val n = nodes.count() // one scalar — bounded driver collect
    require(n > 0, "pagerank over an empty graph")
    val init = Scale / n
    val base = (15L * init) / 100L
    var pr = nodes.withColumn("pr", lit(init))
    for (_ <- 1 to iters) {
      val contrib = eo.join(pr, eo("src") === pr("node"))
        .select(col("dst"), expr("(pr * w) div outw").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("contrib"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($DampingPct * coalesce(contrib, 0)) div 100")).as("pr"))
        .localCheckpoint()
    }
    pr
  }
}
