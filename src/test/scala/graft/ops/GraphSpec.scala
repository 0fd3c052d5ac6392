package graft.ops

import graft.SparkTestBase

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

  test("the hub of a star outranks the leaves") {
    val leaves = (2L to 6L)
    val e = leaves.flatMap(l => Seq(0L -> l, l -> 0L))
    val r = ranks(e, 4)
    assert(leaves.forall(l => r(0L) > r(l)))
    assert(leaves.map(r).toSet.size === 1) // symmetric leaves tie exactly
  }
}
