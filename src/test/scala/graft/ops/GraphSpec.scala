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

  test("the hub of a star outranks the leaves") {
    val leaves = (2L to 6L)
    val e = leaves.flatMap(l => Seq(0L -> l, l -> 0L))
    val r = ranks(e, 4)
    assert(leaves.forall(l => r(0L) > r(l)))
    assert(leaves.map(r).toSet.size === 1) // symmetric leaves tie exactly
  }
}
