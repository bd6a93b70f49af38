package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics over edge lists. No reference analog (the
  * reference's one dataflow is word count, map_reduce.cpp:452-616), but
  * PageRank is the third canonical MapReduce workload after word count
  * and the inverted index — the same scan → shuffle-on-key → aggregate
  * loop, iterated — and link-based authority scoring is a standard
  * corpus-curation signal (crawl frontier ordering, quality priors).
  *
  * Scale shape per iteration: one join of the rank vector with the
  * (edge, out-degree) relation on `src` (shuffles on src), one
  * aggregation keyed on `dst` (shuffles on dst), one left join back to
  * the node list for in-degree-zero nodes. The edge relation with its
  * degrees is materialized ONCE before the loop (it never changes);
  * each iteration's rank vector is node-sized — 100 TB of edges can
  * drive it, but the iterated state stays |V|, not |E|. Lineage is
  * truncated per round (localCheckpoint, the Dedup.nearDupClusters
  * device) so plan depth stays constant in `iters`.
  */
object Graph {

  /** Deterministic PageRank (Page et al. 1999, the fixed-iteration
    * power method; dangling mass is dropped, not redistributed — a
    * common simplification that keeps every step a pure edge pass).
    *
    * Built for cross-engine hash-exactness, not just convergence: the
    * per-edge contribution rank/degree is rounded to 12 decimals and
    * the per-node sum runs over DECIMAL(38,12) — exact and
    * order-independent, so the one place float accumulation order
    * could diverge between engines is closed. The remaining double
    * ops ((1−d)/n + d·sum) are single IEEE operations on identical
    * inputs. Output: (node, pr) with pr rounded to 8 decimals.
    *
    * `n` (node count) is one driver-side scalar, read once before the
    * loop — the bloomSemiFilter class of driver touch. */
  def pageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
               srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank over an empty edge list")
    // the loop-invariant edge relation, degrees attached, materialized
    // once — every iteration joins against THIS, never the raw edges
    val degE = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint(true)
    val base = (1.0 - damping) / n
    var rank = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = rank.join(degE, col("node") === col("src"))
        .select(col("dst"), round(col("rank") / col("deg"), 12).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(DecimalType(38, 12))).as("s"))
      rank = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("s").cast("double"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    rank.select(col("node"), round(col("rank"), 8).as("pr"))
  }
}
