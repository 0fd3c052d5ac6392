package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions.{col, lit, sum}

/** Fixed-point and contract properties of the integer PageRank that no
  * single oracle row can assert.
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a regular graph is a fixed point at the uniform rank") {
    // undirected triangle: every node has degree 2, in-flow = 2 * (10^6
    // DIV 2) = 10^6, so r = 150000 + 850000 = 10^6 every round
    val tri = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val e = tri ++ tri.map(_.swap)
    assert(ranks(e, 5).values.toSet === Set(1000000L))
  }

  test("a source node keeps base rank and still feeds its target") {
    // 1 -> 2 plus undirected 2<->3: node 1 has no in-edges
    val e = Seq(1L -> 2L, 2L -> 3L, 3L -> 2L)
    val r = ranks(e, 3)
    assert(r(1L) === 150000L)
    // node 2's in-flow includes node 1's contribution, so it outranks 3
    assert(r(2L) > r(3L))
  }

  test("dangling redistribution matches the hand-computed rounds") {
    // 1 -> 2, node 2 dangling; n = 2. Hand-unrolled integer rounds:
    //   r1 = (150000 + 850000*500000 DIV 1e6,
    //         150000 + 850000*(1000000+500000) DIV 1e6) = (575000, 1425000)
    //   r2 = (150000 + 850000*712500 DIV 1e6,
    //         150000 + 850000*(575000+712500) DIV 1e6) = (755625, 1244375)
    val r = Graph.pageRankDangling(Seq(1L -> 2L).toDF("src", "dst"), iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(1L -> 755625L, 2L -> 1244375L))
  }

  test("dangling redistribution conserves more mass than the plain rule") {
    // directed chain with a sink: plain pageRank drops the sink node
    // entirely (no out-edges) and leaks its mass; the dangling variant
    // ranks the full universe
    val e = Seq(1L -> 2L, 2L -> 3L)
    val plain = ranks(e, 3)
    val dang = Graph.pageRankDangling(e.toDF("src", "dst"), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(!plain.contains(3L) && dang.contains(3L))
    assert(dang.values.sum > plain.values.sum)
  }

  test("hits: hand-computed round, L∞ saturation, dual roles") {
    // 1→3, 2→3, 3→4. Round 1 by hand:
    //   araw = {3: 2e6, 4: 1e6}, max 2e6
    //     → auth = {3: 1000000, 4: 500000, 1: 0, 2: 0}
    //   hraw = {1: 1e6, 2: 1e6, 3: 500000}, max 1e6
    //     → hub = {1: 1000000, 2: 1000000, 3: 500000, 4: 0}
    // node 3 carries BOTH roles (pointed to by the sources, points to
    // the sink); pure sources are top hubs, the sink is authority-only.
    val r = Graph.hits(Seq(1L -> 3L, 2L -> 3L, 3L -> 4L).toDF("src", "dst"),
      iters = 1)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r === Map(
      1L -> ((1000000L, 0L)), 2L -> ((1000000L, 0L)),
      3L -> ((500000L, 1000000L)), 4L -> ((0L, 500000L))))
    // the L∞ renormalizer saturates both score families at exactly 10^6
    // every round, by construction — check it survives more rounds too
    val r3 = Graph.hits(Seq(1L -> 3L, 2L -> 3L, 3L -> 4L).toDF("src", "dst"),
      iters = 3)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r3.values.map(_._1).max === 1000000L)
    assert(r3.values.map(_._2).max === 1000000L)
  }

  test("label propagation pools labels inside communities (hand-computed)") {
    // two triangles {1,2,3} and {4,5,6} bridged by 3-4; after 3
    // synchronous rounds (most-frequent neighbor label, tie -> min) the
    // hand-unrolled labeling is 1,1,1 / 3,3,3
    val und = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L,
      4L -> 5L, 4L -> 6L, 5L -> 6L, 3L -> 4L)
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val lab = Graph.labelPropagation(e, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("triangle census matches hand-counted graphs") {
    // K4: 4 nodes, 6 edges, every triple a triangle -> 4 triangles,
    // wedges = 4 * C(3,2) = 12, closure = 3*4/12 = 1.0
    val k4 = (for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)).toDF("a", "b")
    val r1 = Graph.triangleStats(k4).collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3),
      r1.getLong(4)) === ((4L, 6L, 12L, 4L, 1000000L)))
    // a 4-path has wedges but zero triangles; closure 0 without div-by-0
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r2 = Graph.triangleStats(path).collect().head
    assert(r2.getLong(3) === 0L && r2.getLong(4) === 0L)
    // one triangle with a pendant edge: the hub's wedges include the
    // pendant, so closure < 1 but the count stays exactly 1
    val tadpole = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val r3 = Graph.triangleStats(tadpole).collect().head
    assert(r3.getLong(3) === 1L)
    assert(r3.getLong(2) === 5L) // degs 2,2,3,1 -> 1+1+3+0
  }

  test("the hub of a star outranks the leaves") {
    val leaves = (2L to 6L)
    val e = leaves.flatMap(l => Seq(0L -> l, l -> 0L))
    val r = ranks(e, 4)
    assert(leaves.forall(l => r(0L) > r(l)))
    assert(leaves.map(r).toSet.size === 1) // symmetric leaves tie exactly
  }

  private def core(pairs: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    Graph.kCore(pairs.toDF("a", "b"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore: peels a pendant chain off a triangle, cascading") {
    // triangle 1-2-3 plus chain 3-4-5: at k=2, node 5 (deg 1) drops in
    // round 1, which drops 4 in round 2 — only the triangle survives
    val g = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L)
    assert(core(g, k = 2, rounds = 1).keySet === Set(1L, 2L, 3L, 4L))
    assert(core(g, k = 2, rounds = 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // converged: a third round changes nothing
    assert(core(g, k = 2, rounds = 3) === core(g, k = 2, rounds = 2))
  }

  test("kCore: degrees are within the surviving subgraph, not the input") {
    // K4 with one pendant on node 1: pendant drops at k=3 and node 1's
    // reported degree must be its in-core 3, not its original 4
    val k4 = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val r = core(k4 :+ (1L -> 5L), k = 3, rounds = 2)
    assert(r === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: k above the max degree empties the graph") {
    val g = Seq(1L -> 2L, 2L -> 3L)
    assert(core(g, k = 5, rounds = 2) === Map.empty)
  }

  test("pageRankWeighted: heavier edges pull more rank; w=1 = unweighted") {
    // star 0-{1,2}: edge to 1 carries 10x the weight of edge to 2
    val wEdges = Seq((0L, 1L, 10L), (1L, 0L, 10L), (0L, 2L, 1L), (2L, 0L, 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pageRankWeighted(wEdges, iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L), s"the heavy edge must pull more rank: $r")
    // uniform weights reduce EXACTLY to the unweighted formulation
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L)
    val e = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    val uni = Graph.pageRank(e, iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val w1 = Graph.pageRankWeighted(e.withColumn("w", lit(1L)), iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(w1 === uni)
  }

  private def truss(pairs: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[(Long, Long), Long] =
    Graph.kTruss(pairs.toDF("a", "b"), k, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("kTruss: peels low-support edges, cascades through shared edges") {
    // two triangles sharing edge 1-2: the shared edge has support 2,
    // the four outer edges support 1
    val bowtie = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 1L -> 4L, 2L -> 4L)
    // k=3 keeps every edge (all are in a triangle) and converges
    val t3 = truss(bowtie, k = 3, rounds = 2)
    assert(t3.keySet === bowtie.toSet)
    assert(t3((1L, 2L)) === 2L && t3((1L, 3L)) === 1L)
    // k=4: round 1 drops the support-1 outer edges, which starves the
    // shared edge (support -> 0) — round 2 empties the graph
    assert(truss(bowtie, k = 4, rounds = 2) === Map.empty)
    // K4 is a true 4-truss: every edge has support 2, nothing peels
    val k4 = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    val t4 = truss(k4, k = 4, rounds = 3)
    assert(t4.keySet === k4.toSet && t4.values.forall(_ === 2L))
  }

  test("personalizedPageRank: mass decays from the seed, unreachable = 0") {
    // path 1-2-3-4 plus a disconnected pair 10-11, seed {1}
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 11L)
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val r = Graph.personalizedPageRank(e, seeds, iters = 6)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // the seed is the only teleport target, so it holds the max (plain
    // per-hop monotonicity is NOT a theorem — low-degree far nodes
    // return all their mass to their one neighbor)
    assert(Seq(2L, 3L, 4L).forall(n => r(1L) > r(n)),
      s"seed must outrank every non-seed: $r")
    assert(r(10L) === 0L && r(11L) === 0L, "unreachable nodes must hold 0")
    assert(Seq(2L, 3L, 4L).forall(n => r(n) > 0L),
      "reachable nodes must receive flowed mass")
  }

  test("distanceDistribution: per-round sums of reach, eff rule holds") {
    // path 1-2-3-4-5, radius 3: distribution row r must equal the sum of
    // per-node reach estimates at radius r, and eff_round must follow the
    // integer 90%-of-last-round rule
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val dist = Graph.distanceDistribution(e, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(dist.map(_._1).toSeq === Seq(1, 2, 3))
    for (r <- 1 to 3) {
      val expected = Graph.neighborhoodReach(e, rounds = r)
        .agg(sum(col("est_ndv"))).collect()(0).getLong(0)
      assert(dist(r - 1)._2 === expected, s"round $r")
    }
    val last = dist.last._2
    val eff = dist.filter(d => d._2 * 10L >= last * 9L).map(_._1).min
    assert(dist.map(_._3).distinct.toSeq === Seq(eff))
    // monotone: balls only grow
    assert(dist.map(_._2).toSeq === dist.map(_._2).sorted.toSeq)
  }

  test("neighborhoodReach: propagated registers = sketch of the real ball") {
    // undirected path 1-2-3-4, radius 2
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val exact = Graph.neighborhoodExact(e, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact === Map(1L -> 3L, 2L -> 4L, 3L -> 4L, 4L -> 3L))
    // HLL union is a max-fold, so R rounds of propagation must equal
    // the sketch computed directly on the materialized ball membership
    val balls = Map(
      1L -> Seq(1L, 2L, 3L), 2L -> Seq(1L, 2L, 3L, 4L),
      3L -> Seq(1L, 2L, 3L, 4L), 4L -> Seq(2L, 3L, 4L))
    val memb = balls.toSeq
      .flatMap { case (n, items) => items.map(n -> _) }.toDF("node", "item")
    val direct = Sketches.hllEstimate(
      Sketches.hllSketch(memb, "node", "item"), "node")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Graph.neighborhoodReach(e, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est === direct)
  }

  test("localClustering: triangle nodes saturate, bridge dilutes, leaf 0") {
    // triangle 1-2-3 with pendant 4 on 3: cc(1)=cc(2)=10^6 (their
    // whole neighborhood is one edge), cc(3)=1/C(3,2)=333333 ppm,
    // cc(4)=0 by the deg<2 convention
    val pairs = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L).toDF("a", "b")
    val r = Graph.localClustering(pairs)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r === Map(
      1L -> ((2L, 1L, 1000000L)), 2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 1L, 333333L)), 4L -> ((1L, 0L, 0L))))
  }

  test("modularity: barbell communities score positive, one-blob is 0") {
    // two triangles bridged by 3-4: m = 7, each triangle community has
    // e_c = 3, d_c = 7 => e_ppm 428571, d_ppm 500000, contrib 178571
    val pairs = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
      4L -> 5L, 5L -> 6L, 4L -> 6L, 3L -> 4L).toDF("a", "b")
    val labels = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L,
      4L -> 20L, 5L -> 20L, 6L -> 20L).toDF("node", "label")
    val r = Graph.modularity(pairs, labels)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r === Map(10L -> ((3L, 3L, 7L, 178571L)),
      20L -> ((3L, 3L, 7L, 178571L))))
    // everything in one community: e = m, d = 2m, contrib exactly 0 —
    // a single blob is never "denser than chance"
    val one = labels.select(col("node"), lit(1L).as("label"))
    val r1 = Graph.modularity(pairs, one).collect()
    assert(r1.length === 1 && r1(0).getLong(4) === 0L)
  }

  test("bfsLevels: hop distances on a path, min over multiple seeds") {
    // undirected path 1-2-3-4-5-6; seeds {1, 5}
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("node")
    val d = Graph.bfsLevels(e, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 3 is 2 hops from seed 1 but also 2 from seed 5 via 4; node 4
    // takes the shorter route from seed 5, not 3 hops from seed 1
    assert(d === Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 6L -> 1L,
      3L -> 2L))
  }

  test("bfsLevels: rounds bound the radius; disconnected stays absent") {
    val und = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 11L)
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val d = Graph.bfsLevels(e, Seq(1L).toDF("node"), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L)) // 4 beyond radius,
    // 10/11 unreachable — never emitted rather than inf-distance rows
  }

  test("linkPrediction: square proposes both diagonals, exact scores") {
    // 4-cycle 1-2-3-4-1: non-edges (1,3) and (2,4), each closed by two
    // wedges; jaccard = 2*10^6 / (2+2-2) = 10^6 (neighborhoods equal)
    val pairs = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 1L -> 4L).toDF("a", "b")
    val top = Graph.linkPrediction(pairs, maxCenterDegree = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    assert(top.toSeq === Seq((1L, 3L, 1, 2L, 1000000L),
      (2L, 4L, 2, 2L, 1000000L)))
  }

  test("linkPrediction: existing edges are never proposed; hub-only " +
    "common neighbors are skipped when the center cap excludes the hub") {
    // star center 9 with leaves 1..4, plus edge 1-2. Candidates through
    // the hub would be all leaf pairs; cap 3 < deg(9)=4 excludes it, and
    // leaves have degree <= 2, so the only proposable wedge centers are
    // the leaves themselves: 1 and 2 each propose (their two neighbors)
    // — (9, x) pairs are real edges, leaving nothing. With the cap
    // raised, leaf pairs appear and the real edge (1,2) is still absent.
    val pairs = Seq(9L -> 1L, 9L -> 2L, 9L -> 3L, 9L -> 4L, 1L -> 2L)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("a", "b")
    val capped = Graph.linkPrediction(pairs, maxCenterDegree = 3, k = 10)
      .collect()
    assert(capped.isEmpty)
    val open = Graph.linkPrediction(pairs, maxCenterDegree = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(open === Set((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }
}
