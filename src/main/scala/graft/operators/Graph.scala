package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.plans.Lineage.TruncateOps

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
  * drive it, but the iterated state stays |V|, not |E|. Loop-invariant
  * relations are pinned once via Lineage.truncate (localCheckpoint on
  * local[32], reliable checkpoint() when spark.graft.checkpointDir is
  * set — the cluster-operability seam). LINEAR iteration chains
  * (PageRank family, LPA: state appears once per round) run unrolled
  * as one O(iters)-operator query — per-round pins were measured pure
  * overhead (optimization r17) — while loops whose round state is
  * consumed twice (HITS half-steps, kCore, star components) keep
  * per-round truncation, or the plan tree doubles each round.
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
    // pinned: `e` feeds BOTH the node set and the degree-edge build —
    // unpinned, an expensive upstream (a join-built or regex-extracted
    // edge list) would run twice (the engine's one-shot-pin rule;
    // hits() already did this)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).truncateLineage
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().truncateLineage
    val n = nodes.count()
    require(n > 0, "pageRank over an empty edge list")
    // the loop-invariant edge relation, degrees attached, materialized
    // once — every iteration joins against THIS, never the raw edges
    val degE = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .truncateLineage
    val base = (1.0 - damping) / n
    // The iteration chain is LINEAR in the plan tree: rank_r appears
    // exactly once inside rank_{r+1}, and the twice-consumed relations
    // (nodes, degE) are checkpointed LEAVES above — so the unrolled
    // 5-step plan is O(iters) operators, and the per-round pin the
    // loop used to carry bought nothing but ~3 extra jobs per round
    // (checkpoint write + broadcast rebuilds). Optimization r17:
    // iterate lazily, run the whole unrolled DAG as one query.
    // (kCore/HITS keep per-round pins — their per-round state is
    // consumed twice, which doubles the tree per round.)
    var rank = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = rank.join(degE, col("node") === col("src"))
        .select(col("dst"), round(col("rank") / col("deg"), 12).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(DecimalType(38, 12))).as("s"))
      rank = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("s").cast("double"), lit(0.0))).as("rank"))
    }
    rank.select(col("node"), round(col("rank"), 8).as("pr"))
  }

  /** Edge-weighted PageRank: a source's rank splits across its
    * out-links in proportion to edge WEIGHT (here link multiplicity —
    * three nav slots vouching for one target beat a single mention)
    * instead of uniformly. Same exactness discipline as [[pageRank]]:
    * contribution = round(rank·w/wsum, 12) with integer w/wsum cast
    * to double (two IEEE ops on identical inputs), DECIMAL(38,12)
    * sums, \|V\| iterated state, unrolled linear chain. */
  def weightedPageRank(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
                       srcCol: String = "src", dstCol: String = "dst",
                       weightCol: String = "w"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("long").as("w")).truncateLineage // two consumers, like pageRank
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().truncateLineage
    val n = nodes.count()
    require(n > 0, "weightedPageRank over an empty edge list")
    val degE = e.join(e.groupBy(col("src")).agg(sum(col("w")).as("wsum")), "src")
      .truncateLineage
    val base = (1.0 - damping) / n
    var rank = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = rank.join(degE, col("node") === col("src"))
        .select(col("dst"),
          round(col("rank") * col("w").cast("double") / col("wsum").cast("double"), 12).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(DecimalType(38, 12))).as("s"))
      rank = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("s").cast("double"), lit(0.0))).as("rank"))
      // linear chain — no per-round pin needed (see pageRank)
    }
    rank.select(col("node"), round(col("rank"), 8).as("wpr"))
  }

  /** Seed-personalized PageRank (the TrustRank construction, Gyöngyi
    * et al., "Combating web spam with TrustRank", VLDB 2004, public):
    * teleport mass goes ONLY to a trusted seed set instead of
    * uniformly — authority must flow out of pages a curator vouched
    * for, so link farms with no seed path score ~0 no matter how
    * densely they cite each other. The spam-resistance a raw crawl's
    * quality prior actually needs; plain [[pageRank]] is the
    * seeds = all-nodes special case.
    *
    * Same exactness discipline and scale shape as [[pageRank]]
    * (rounded(12) contributions, DECIMAL(38,12) sums, |V| iterated
    * state, unrolled linear chain); the seed flag is joined
    * onto the node list ONCE before the loop. Seeds outside the graph
    * are ignored; |S| counts in-graph seeds (one driver scalar, the
    * pageRank-n class of driver touch). Output: (node, ppr) rounded
    * to 8 decimals — NOT L1-normalized to 1: the lost dangling/sink
    * mass is the point (a node's ppr is its trust reachability). */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int = 5,
                           damping: Double = 0.85, srcCol: String = "src",
                           dstCol: String = "dst", seedCol: String = "node"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).truncateLineage
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
    val sd = seeds.select(col(seedCol).as("node")).distinct().withColumn("is_seed", lit(true))
    val flagged = nodes.join(sd, Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .truncateLineage
    val nSeeds = flagged.where(col("is_seed")).count()
    require(nSeeds > 0, "personalizedPageRank needs at least one seed inside the graph")
    val degE = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .truncateLineage
    val base = when(col("is_seed"), lit((1.0 - damping) / nSeeds)).otherwise(lit(0.0))
    var rank = flagged.select(col("node"), col("is_seed"), base.as("rank"))
    for (_ <- 1 to iters) {
      val contrib = rank.join(degE, col("node") === col("src"))
        .select(col("dst"), round(col("rank") / col("deg"), 12).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(DecimalType(38, 12))).as("s"))
      rank = flagged.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"), col("is_seed"),
          (base + lit(damping) * coalesce(col("s").cast("double"), lit(0.0))).as("rank"))
      // linear chain — no per-round pin needed (see pageRank)
    }
    rank.select(col("node"), round(col("rank"), 8).as("ppr"))
  }

  /** Deterministic HITS (Kleinberg, "Authoritative sources in a
    * hyperlinked environment", JACM 1999): the hubs-and-authorities
    * companion to [[pageRank]] — auth(v) = Σ hub(u) over in-links,
    * hub(u) = Σ auth(v) over out-links, fixed `iters` rounds. Where
    * PageRank scores global random-walk importance, HITS separates
    * DIRECTORY pages (high hub — they point at good content) from
    * CONTENT pages (high auth — good content points… is pointed at),
    * the split a crawl frontier wants: schedule by hub, keep by auth.
    *
    * Built for cross-engine hash-exactness like pageRank: per-edge
    * contributions are rounded to 12 decimals and summed over
    * DECIMAL(38,12) (order-independent), each half-step is L1
    * normalized by the EXACT decimal total (power iteration needs
    * normalization or the vector diverges; L1 keeps the divisor
    * exactly representable where L2's sqrt would not be), and the one
    * division per node is a single IEEE double op on identical
    * inputs. The normalizing total rides the plan as a broadcast
    * one-row aggregate — no driver-side scalar read in the loop.
    *
    * Scale shape per iteration: two rank-vector↔edge joins (shuffle
    * on src, then dst) + two |V|-sized aggregates; iterated state is
    * |V| like pageRank, lineage truncated per round. Output:
    * (node, auth, hub) rounded to 8 decimals. */
  def hits(edges: DataFrame, iters: Int = 5,
           srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().truncateLineage
    require(e.limit(1).count() == 1, "hits over an empty edge list")
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().truncateLineage
    val dec = DecimalType(38, 12)
    // one half-step: scores flow across edges from `from` to `to`,
    // exact-decimal summed, then L1-normalized by the exact total
    def halfStep(scores: DataFrame, scoreCol: String,
                 from: String, to: String, outCol: String): DataFrame = {
      val raw = scores.join(e, col("node") === col(from))
        .select(col(to).as("dst_node"), round(col(scoreCol), 12).cast(dec).as("c"))
        .groupBy(col("dst_node")).agg(sum(col("c")).as("s"))
      val tot = raw.agg(sum(col("s")).as("tot"))
      nodes.join(raw, col("node") === col("dst_node"), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          round(coalesce(col("s"), lit(0)).cast("double") / col("tot").cast("double"), 12)
            .as(outCol))
        .truncateLineage
    }
    var hub = nodes.select(col("node"), lit(1.0).as("hub"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      auth = halfStep(hub, "hub", "src", "dst", "auth")
      hub = halfStep(auth, "auth", "dst", "src", "hub")
    }
    auth.join(hub, "node")
      .select(col("node"), round(col("auth"), 8).as("auth"), round(col("hub"), 8).as("hub"))
  }

  /** Short-cycle link rings: nodes mutually reachable within
    * `maxHops` directed hops — the spam-ring tell (paid-link circles
    * and PBNs cite each other in tight cycles; organic links rarely
    * close one). Bounded-hop ON PURPOSE: exact distributed SCC needs
    * pivot-reachability rounds (Fleischer et al. FW-BW; Blelloch et
    * al. 2016 for the O(log n) randomized version — cited, not
    * implemented: its expected-round bound needs random pivots, and
    * this engine's determinism contract forbids rand()), while real
    * rings are short cycles a 2-3-hop probe already closes (a
    * length-L cycle is caught iff L ≤ 2·maxHops: its opposite members
    * sit ≤ maxHops apart in each direction). Every
    * ring member gets the MINIMUM member id as ring_id (the
    * nearDupClusters label contract); nodes in no ring don't appear.
    *
    * Scale shape: maxHops−1 self-expansions of the reachability
    * relation (join on the shared endpoint, distinct per level —
    * never undeduped path explosion), then one symmetric self-join
    * for mutuality and a min-aggregate. At web scale bounded-hop
    * reach is |E|·avgDeg^(maxHops−1) — keep maxHops small (the
    * point) and prune to suspect subgraphs first. */
  def linkRings(edges: DataFrame, maxHops: Int = 3,
                srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(maxHops >= 2, "a ring needs at least 2 hops")
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .where(col("u") =!= col("v")).distinct().truncateLineage
    var reach = e
    for (_ <- 2 to maxHops) {
      val step = reach.as("a")
        .join(e.select(col("u").as("m"), col("v").as("w")), col("v") === col("m"))
        .select(col("u"), col("w").as("v"))
      reach = reach.unionAll(step)
        .where(col("u") =!= col("v")).distinct().truncateLineage
    }
    val mutual = reach.as("a")
      .join(reach.select(col("u").as("bu"), col("v").as("bv")),
        col("u") === col("bv") && col("v") === col("bu"))
      .select(col("u").as("node"), col("v").as("peer"))
      .truncateLineage
    // label by TRANSITIVE min over the mutual-pair graph, not the
    // local window: a cycle of length up to 2·maxHops closes only
    // through its distant pairs, and local minima would label one
    // ring inconsistently — ring components are small, so the
    // star-components closure is cheap here
    val pairs = mutual.where(col("node") < col("peer"))
      .select(col("node").as("doc_a"), col("peer").as("doc_b"))
    val items = mutual.select(col("node").as("doc_id")).distinct()
    starComponents(pairs, items)
      .select(col("doc_id").as("node"), col("cluster_id").as("ring_id"))
  }

  /** Connected components by alternating large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SOCC 2014 — public): each round rewires every node's edges
    * toward its neighborhood minimum, converging to one star per
    * component in O(log n) rounds REGARDLESS of diameter — the
    * promotion [[graft.operators.Dedup.nearDupClusters]]'s min-label
    * device documents for long-chain graphs (min-label needs
    * O(diameter) rounds; a real crawl graph has unbounded chains).
    *
    * Scale shape per round: two groupBy-min aggregates + two joins,
    * all keyed on node ids — the edge set never grows past the input
    * (large-star emits one edge per (u, v>u) slot, small-star one per
    * directed edge + one per larger endpoint, then dedup), and
    * lineage is truncated per round (Lineage.truncate). The driver
    * reads ONE (count, checksum) row per round for the convergence
    * test — never the data.
    *
    * Output contract matches nearDupClusters: every item gets the
    * MINIMUM id of its component as cluster_id (singletons keep their
    * own id) — the two implementations are interchangeable, and the
    * spec asserts equality on shared fixtures. */
  /** Synchronous label propagation (Raghavan, Albert, Kumara, "Near
    * linear time algorithm to detect community structures in
    * large-scale networks", Phys. Rev. E 2007), made DETERMINISTIC:
    * every node starts as its own label; each round it adopts the
    * MODE of its neighbors' labels under a fixed tie policy (highest
    * count, then smallest label) instead of the paper's random tie —
    * randomness would unhash the oracle and make retries disagree.
    * Communities sit between components (too coarse — one bridge
    * merges everything) and k-core (structure, not membership): the
    * link-spam-ring / topic-cluster view of a crawl graph.
    *
    * Scale shape: per round ONE join against the undirected edge
    * relation (materialized once) and one (node, label) count whose
    * mode is a bounded max_by buffer — state is |V| labels, iterated
    * as an unrolled linear chain (the pageRank device). Rounds are FIXED so
    * the twin can unroll them as CTEs; synchronous LPA can oscillate
    * on bipartite structure, and a fixed-round snapshot reports that
    * deterministically instead of looping forever. */
  def lpaCommunities(edges: DataFrame, rounds: Int = 4,
                     srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val und = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().truncateLineage
    val nodes = und.select(col("src").as("node")).distinct().truncateLineage
    var lab = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to rounds) {
      val nb = und.join(lab.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src"), col("label")).agg(count(lit(1)).as("cnt"))
      val next = nb.groupBy(col("src"))
        .agg(max_by(col("label"), struct(col("cnt"), (-col("label")).as("nl"))).as("label"))
      lab = nodes.join(next.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
      // linear chain — lab appears once per round; und/nodes are
      // checkpointed leaves, so the unrolled plan is O(rounds)
    }
    lab.select(col("node"), col("label").as("community"))
  }

  def starComponents(pairs: DataFrame, items: DataFrame,
                     idCol: String = "doc_id"): DataFrame =
    starComponentsWithRounds(pairs, items, idCol)._1

  /** [[starComponents]] plus the number of large+small rounds run —
    * exposed so the spec can assert the O(log n) round count beats
    * min-label's O(diameter) on a long chain. */
  private[graft] def starComponentsWithRounds(pairs: DataFrame, items: DataFrame,
                                              idCol: String = "doc_id"): (DataFrame, Int) = {
    // canonical undirected edge set: (u < v), self-loops out, deduped
    def canon(e: DataFrame): DataFrame =
      e.select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
        .where(col("u") =!= col("v")).distinct()
    var e = canon(pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
      .truncateLineage
    // convergence = identical (count, order-independent checksum);
    // one tiny driver-side row per round
    def sig(d: DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)), sum(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prev = sig(e)
    var rounds = 0
    var done = prev._1 == 0L
    while (!done) {
      // large-star: every neighbor v > x links to m = min(Γ(x) ∪ {x})
      val nbrs = e.select(col("u").as("x"), col("v").as("y"))
        .unionAll(e.select(col("v").as("x"), col("u").as("y")))
      val mins = nbrs.groupBy(col("x")).agg(min(col("y")).as("mn"))
        .select(col("x"), least(col("x"), col("mn")).as("m"))
      val large = canon(nbrs.join(mins, "x").where(col("y") > col("x"))
        .select(col("y").as("u"), col("m").as("v")))
      // small-star: orient to the larger endpoint; it and all its
      // smaller neighbors link to their minimum
      val dir = large.select(col("v").as("x"), col("u").as("y"))
      val mins2 = dir.groupBy(col("x")).agg(min(col("y")).as("m"))
      val small = canon(
        dir.join(mins2, "x").select(col("y").as("u"), col("m").as("v"))
          .unionAll(mins2.select(col("x").as("u"), col("m").as("v"))))
        .truncateLineage
      val cur = sig(small)
      done = cur == prev
      prev = cur
      e = small
      rounds += 1
      require(rounds <= 64, "star components failed to converge in 64 rounds")
    }
    // at the fixed point each component is a star on its minimum:
    // a node's label is min(itself, its min neighbor)
    val mn = e.select(col("u").as("x"), col("v").as("y"))
      .unionAll(e.select(col("v").as("x"), col("u").as("y")))
      .groupBy(col("x")).agg(min(col("y")).as("mn"))
      .withColumnRenamed("x", "doc_id")
    val labels = items.select(col(idCol).as("doc_id"))
      .join(mn, Seq("doc_id"), "left")
      .select(col("doc_id"),
        least(col("doc_id"), coalesce(col("mn"), col("doc_id"))).as("cluster_id"))
    (labels, rounds)
  }

  /** Per-node triangle counts — the local clustering signal: a page
    * whose neighbors interlink (many triangles) sits in a genuine
    * community; link farms built as stars or chains carry none, which
    * is why triangle support complements PageRank in spam screens.
    *
    * Algorithm (Schank-Wagner / the MapReduce classic): orient every
    * undirected edge from the (degree, id)-SMALLER endpoint to the
    * larger, enumerate wedges only from each node's OUT-edges, and
    * close each wedge against the oriented edge set. The orientation
    * is the whole scale story: out-degree is bounded by ~√|E| on any
    * graph, so wedge count is Σ d_out² ≪ Σ d² — the hub that would
    * generate a billion wedges under naive enumeration generates
    * almost none as a wedge CENTER because every edge points INTO it.
    * Each triangle is counted exactly once (its unique two-out-edge
    * node centers it), then exploded back to all three corners.
    *
    * Exact integer counts — any correct engine agrees; the twin runs
    * the canonical u<v<w three-way join instead, which is the same
    * set. */
  def triangleCounts(edges: DataFrame,
                     srcCol: String = "src", dstCol: String = "dst",
                     assumeCanonical: Boolean = false): DataFrame = {
    val raw = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    // callers that already hold the canonical (a < b, distinct,
    // materialized) edge set skip a full re-canonicalization shuffle
    val e =
      if (assumeCanonical) raw
      else raw
        .where(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .distinct().truncateLineage
    val deg = e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): u → v iff (deg(u), u) < (deg(v), v)
    val oriented = e
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .truncateLineage
    // wedges from each center's out-edges, endpoints ID-ordered p < q
    // so the closure probe is one EQUI-join against the canonical
    // (a < b) edge set — no non-equi OR predicate anywhere
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.u").as("u"), col("x.v").as("p"), col("y.v").as("q"))
    // Closure-probe strategy (optimization r17, guide §3.1): the wedge
    // relation is Σ outdeg² rows — 41M at sf0.1 on the co-purchase
    // graph, orders of magnitude larger than |E| — while `e` is two
    // longs per edge. Left to itself the planner reuses e's
    // (a, b) hash partitioning from the distinct and SHUFFLES THE
    // WEDGES to match it (measured: the closure exchange+sort was the
    // query's dominant stage). Broadcasting e fuses wedge generation
    // and the closure probe into one codegen stage with no wedge
    // exchange at all. Size-gated on the (already materialized) edge
    // count so a graph whose edge set cannot broadcast keeps the
    // shuffle plan — one driver-side scalar, the pageRank-n class.
    val eKeys = e.select(col("a").as("p"), col("b").as("q"))
    val eProbe = if (e.count() <= 4000000L) broadcast(eKeys) else eKeys
    val closed = wedges
      .join(eProbe, Seq("p", "q"))
      .select(col("u").as("n1"), col("p").as("n2"), col("q").as("n3"))
    closed
      .select(explode(array(col("n1"), col("n2"), col("n3"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }

  /** Local clustering coefficient per node: 2·triangles / d(d−1) —
    * how close a node's neighborhood is to a clique. The community-
    * vs-hub discriminator on top of [[triangleCounts]]: a genuine
    * topic hub has high degree AND high coefficient, a spam
    * aggregator has high degree and a coefficient near 0. Exact
    * integer numerator/denominator, one rounded division; nodes of
    * degree < 2 report 0 (no wedge exists to close). */
  def clusteringCoefficients(edges: DataFrame,
                             srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    // canonicalize ONCE and share the materialized edge set with the
    // triangle pass (assumeCanonical) — the edge build behind `edges`
    // can itself be a join (the co-purchase graph), so running it
    // twice doubles the query's dominant cost
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct().truncateLineage
    val deg = e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    deg.join(triangleCounts(e, "a", "b", assumeCanonical = true), Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("coeff",
        when(col("deg") >= 2,
          round((col("triangles") * 2).cast("double")
            / (col("deg") * (col("deg") - 1)).cast("double"), 6))
          .otherwise(lit(0.0)))
  }

  /** k-core decomposition by iterative peeling (Seidman 1983): drop
    * every node with UNDIRECTED degree < k, recompute degrees on the
    * surviving subgraph, repeat. What survives is the k-core — the
    * maximal subgraph where everyone keeps >= k neighbors. Crawl use:
    * the 2-core separates interlinked site cores from the pendant
    * tendrils PageRank wastes mass on; dedup use: a dense near-dup
    * family survives peeling, chains of coincidental pairs don't.
    *
    * Runs a FIXED round count (the page_rank device: the twin unrolls
    * the same rounds as CTEs, and once the core stabilizes further
    * rounds are no-ops, so a converged result is exact, not
    * truncated). `rounds` defaults high enough for the registered
    * fixtures; the output carries the final degree so a caller can
    * assert stability (min(deg) >= k ⇒ converged). Each round is one
    * semi-join + one degree aggregate on the shrinking edge set —
    * state is the surviving edge relation, lineage truncated per
    * round. */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 6,
            srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    // undirected simple graph: canonical min/max pairs, self-loops out
    var e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct().truncateLineage
    for (_ <- 1 to rounds) {
      val deg = e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= k).select(col("node"))
      e = e.join(keep.withColumnRenamed("node", "a"), "a")
        .join(keep.withColumnRenamed("node", "b"), "b")
        .select(col("a"), col("b")).truncateLineage
    }
    e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .where(col("deg") >= k)
  }
}
