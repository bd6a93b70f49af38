package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two-node cycle is the fixed point: both ranks stay 1/2") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // r = 0.15/2 + 0.85 * (1/2) = 1/2 exactly at every step
    assert(got === Map(1L -> 0.5, 2L -> 0.5))
  }

  test("star graph: the centre out-ranks the leaves, mass is plausible") {
    // leaves 2..5 each point at 1; 1 points at 2 (no dangling centre)
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the {1,2} pair trades the bulk of the mass (2 holds the centre's
    // whole vote, so it can even exceed the centre); the pure leaves
    // 3..5 hold only the teleport floor
    assert(got(1L) > got(3L), got.toString)
    assert(got(2L) > got(3L), got.toString)
    assert(got(3L) === got(4L))
    assert(got(4L) === got(5L))
    // no dangling nodes here: total mass conserved up to rounding
    assert(math.abs(got.values.sum - 1.0) < 1e-6, got.values.sum.toString)
  }

  test("pageRank matches an independent Scala fold with the identical rounding steps") {
    // deterministic pseudo-random digraph on 30 nodes
    val edges = (for (i <- 0L until 30L; j <- 0L until 30L
                      if i != j && (i * 31 + j * 17) % 7 == 0) yield (i, j)).toSeq
    val got = Graph.pageRank(edges.toDF("src", "dst"), iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // independent fold, same operation order per STEP (sums over exact
    // BigDecimal after the same round-to-12)
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    val in = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      rank = nodes.map { v =>
        val s = in.getOrElse(v, Seq.empty).map(u => r12(rank(u) / out(u))).sum
        v -> ((1.0 - 0.85) / n + 0.85 * s.toDouble)
      }.toMap
    }
    val want = rank.map { case (v, r) =>
      v -> BigDecimal(r).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble }
    assert(got === want)
  }

  test("deterministic across runs") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val run = () => Graph.pageRank(edges).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run() === run())
  }

  test("hits: directory star separates hub from authority exactly") {
    // 1 points at 2,3,4 — a pure directory page over three content pages
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.hits(edges, iters = 5).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L) === ((0.0, 1.0)), got.toString)           // all hub, no auth
    assert(got(2L) === ((0.33333333, 0.0)), got.toString)    // all auth, no hub
    assert(got(3L) === got(2L))
    assert(got(4L) === got(2L))
  }

  test("hits matches an independent Scala fold with the identical rounding steps") {
    val edges = (for (i <- 0L until 25L; j <- 0L until 25L
                      if i != j && (i * 13 + j * 29) % 6 == 0) yield (i, j)).toSeq
    val got = Graph.hits(edges.toDF("src", "dst"), iters = 5).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val in = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def half(scores: Map[Long, Double], nbrs: Map[Long, Seq[Long]]): Map[Long, Double] = {
      val raw = nodes.map(v => v -> nbrs.getOrElse(v, Seq.empty).map(u => r12(scores(u))).sum).toMap
      val tot = raw.values.sum
      nodes.map(v => v -> r12(raw(v).toDouble / tot.toDouble).toDouble).toMap
    }
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to 5) {
      auth = half(hub, in)   // auth(v) sums hub over in-links
      hub = half(auth, out)  // hub(u) sums auth over out-links
    }
    def r8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = nodes.map(v => v -> ((r8(auth(v)), r8(hub(v))))).toMap
    assert(got === want)
  }

  test("personalizedPageRank: trust flows only from seeds, farms score zero") {
    // seed 1 -> 2 -> 3; disconnected "farm" 10 <-> 11 citing each other
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = Graph.personalizedPageRank(edges, seeds, iters = 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the farm has no seed path: exactly zero trust regardless of its
    // internal link density
    assert(got(10L) === 0.0 && got(11L) === 0.0, got.toString)
    // trust decays along the chain from the seed
    assert(got(1L) > got(2L) && got(2L) > got(3L), got.toString)
    assert(got.values.forall(_ >= 0.0))
  }

  test("personalizedPageRank matches an independent fold; seeds outside the graph are ignored") {
    val edges = (for (i <- 0L until 20L; j <- 0L until 20L
                      if i != j && (i * 7 + j * 11) % 5 == 0) yield (i, j)).toSeq
    val seeds = Seq(0L, 5L, 10L, 999L).map(Tuple1(_)).toDF("node") // 999 not in graph
    val got = Graph.personalizedPageRank(edges.toDF("src", "dst"), seeds, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val inSeeds = Set(0L, 5L, 10L)
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    val in = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
    def r12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val base = (1.0 - 0.85) / inSeeds.size
    def tele(v: Long) = if (inSeeds(v)) base else 0.0
    var rank = nodes.map(v => v -> tele(v)).toMap
    for (_ <- 1 to 5) {
      rank = nodes.map { v =>
        val s = in.getOrElse(v, Seq.empty).map(u => r12(rank(u) / out(u))).sum
        v -> (tele(v) + 0.85 * s.toDouble)
      }.toMap
    }
    val want = rank.map { case (v, r) =>
      v -> BigDecimal(r).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble }
    assert(got === want)
  }

  test("weightedPageRank: uniform weights reproduce pageRank exactly, heavy edges pull mass") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val uniform = edges.withColumn("w", lit(1L))
    val wpr = Graph.weightedPageRank(uniform).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pr = Graph.pageRank(edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wpr === pr) // w=1 everywhere degenerates to the uniform split
    // 1 splits 2:1 toward node 2 instead of evenly: 2 must gain, 3 lose
    val skewed = Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "w")
    val even = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "w")
    val g1 = Graph.weightedPageRank(skewed).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val g0 = Graph.weightedPageRank(even).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(g1(2L) > g0(2L), s"$g1 vs $g0")
    assert(g1(3L) < g0(3L), s"$g1 vs $g0")
  }

  test("linkRings: cycles within the hop bound labeled by min member, chains and long cycles invisible") {
    val edges = Seq(
      (1L, 2L), (2L, 1L),                     // 2-cycle
      (5L, 6L), (6L, 7L), (7L, 5L),           // 3-cycle
      (10L, 11L), (11L, 12L),                 // chain, no ring
      // 5-cycle: caught at maxHops=3 only through its DISTANT pairs
      // (opposite members sit 2 and 3 hops apart) — the transitive
      // closure must still label all five consistently
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 20L),
      // 7-cycle: invisible at maxHops=3 (a length-L cycle closes iff
      // L <= 2*maxHops; 7 > 6)
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L), (34L, 35L), (35L, 36L), (36L, 30L)
    ).toDF("src", "dst")
    val got = Graph.linkRings(edges, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 5L) ++
      (20L to 24L).map(_ -> 20L).toMap, got.toString)
    // the 7-cycle IS a ring once the bound covers it (7 <= 2*4)
    val got4 = Graph.linkRings(edges, maxHops = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((30L to 36L).forall(n => got4(n) === 30L), got4.toString)
    // deterministic under repartitioning
    val again = Graph.linkRings(edges.repartition(5), maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
  }

  test("hits deterministic across runs") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val run = () => Graph.hits(edges).collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(run() === run())
  }

  test("triangleCounts: K4 corners carry 3 each, squares carry none, direction ignored") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + square {5,6,7,8}
    // (cycle, no triangle) + a pendant 4-9
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val edges = (k4 ++ Seq((5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L), (4L, 9L)))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // reversed/duplicated edges change nothing (canonicalization)
    val messy = edges.unionAll(Seq((2L, 1L), (3L, 1L), (6L, 5L)).toDF("src", "dst"))
    assert(Graph.triangleCounts(messy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === got)
  }

  test("clusteringCoefficients: clique corners 1.0, wedge center closes nothing, pendant 0") {
    // triangle {1,2,3} with a pendant 3-4: coeff(1)=coeff(2)=1,
    // coeff(3)=2·1/(3·2)=1/3, coeff(4)=0 (degree 1)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.clusteringCoefficients(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((2L, 1L, 1.0)))
    assert(got(2L) === ((2L, 1L, 1.0)))
    assert(got(3L) === ((3L, 1L, 0.333333)))
    assert(got(4L) === ((1L, 0L, 0.0)))
  }

  test("kCore: pendant chain peels away, triangle core survives, peeling cascades") {
    // triangle {1,2,3} + chain 3-4-5-6 hanging off it. 2-core = the
    // triangle alone — but only AFTER the peel cascades down the
    // chain (6 goes first, then 5, then 4): one round is not enough,
    // which is exactly what the fixed-round loop must handle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val got = Graph.kCore(edges, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=3: the triangle is only a 2-core — nothing survives
    assert(Graph.kCore(edges, k = 3).count() === 0)
    // direction/duplication/self-loops must not matter (undirected
    // simple-graph canonicalization)
    val messy = edges.unionAll(Seq((2L, 1L), (1L, 1L), (3L, 2L)).toDF("src", "dst"))
    val got2 = Graph.kCore(messy, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === got)
  }

  test("lpaCommunities: two bridged cliques resolve to two communities; deterministic") {
    // cliques {1..5} and {11..15}, one bridge 5-11: components would
    // merge everything through the bridge; LPA keeps in-clique label
    // mass dominant on each side
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(1L to 5L) ++ clique(11L to 15L) :+ ((5L, 11L)))
      .toDF("src", "dst")
    val got = Graph.lpaCommunities(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cA = (1L to 5L).map(got).toSet
    val cB = (11L to 15L).map(got).toSet
    assert(cA.size === 1 && cB.size === 1 && cA != cB, got.toString)
    // pure function of the graph: shuffled input, same communities
    val again = Graph.lpaCommunities(edges.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
  }
}
