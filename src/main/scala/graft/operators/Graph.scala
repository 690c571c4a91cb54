package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the weighted
  * companion to [[graft.dedup.Dedup.nearDupClusters]]'s min-label
  * propagation (connected components): PageRank scores node
  * centrality in, e.g., a co-occurrence graph (parts bought
  * together, documents sharing near-dup shingles, domains linking).
  *
  * Integer-exact formulation (Page et al., "The PageRank Citation
  * Ranking", 1999, with ranks scaled ×10⁶ and the damping split as
  * integer permille): every iteration is long arithmetic —
  * `contrib(u) = pr(u) div deg(u)`,
  * `pr'(v) = 150000 + (850 · Σ contrib) div 1000` — so the whole
  * loop is engine-exact and oracle-checkable, unlike float PageRank
  * whose sum order perturbs ranks.
  *
  * Scale posture: the edge list (with degree attached) is built ONCE
  * and checkpointed; each iteration is one join on the edge key and
  * one map-side-combining sum — the standard scalable PageRank shape
  * (no driver-side adjacency, no per-node loops). `localCheckpoint`
  * truncates the per-iteration lineage so plan analysis stays O(1)
  * in the iteration count.
  */
object Graph {

  /** PageRank over an undirected pair set (a, b), a ≠ b. Returns
    * (node, pr) with pr scaled ×10⁶ (initial rank 1000000, damping
    * 0.85 as permille). Nodes are those appearing in pairs. */
  def pageRank(pairs: DataFrame, iters: Int = 2): DataFrame = {
    val und = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    // (src, dst, deg) — the iteration-invariant edge table, built once
    val edges = und.join(deg, "src").localCheckpoint(true)
    var ranks = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    (1 to iters).foreach { _ =>
      ranks = edges.join(ranks, edges("src") === ranks("node"))
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("sc"))
        .select(col("node"), expr("150000 + (850 * sc) div 1000").as("pr"))
        .localCheckpoint(true)
    }
    ranks
  }
}
