package graft

/** Plan lint: scale-shape regression gate over EVERY registered query.
  *
  * A cartesian product anywhere is a bug at any scale. A broadcast
  * nested-loop join is acceptable ONLY where the crossing is the
  * algorithm — the ANN scans cross the corpus with a BROADCAST query/
  * centroid set and immediately bound the result with the k-capped heap
  * aggregate, so the crossed side never materializes. Anything else
  * sneaking a BNLJ in (a lost equi-join condition, a dropped hint) fails
  * here instead of at 100 TB.
  */
class PlanLintSpec extends SparkTestBase {

  // queries whose construction has side effects (JDBC DDL, streaming
  // drains) — their plan shape is covered by their own oracle queries
  private val skip = Set("dsl_jdbc_roundtrip", "dsl_chunked_upsert",
    "dsl_generated_ids")

  // intentional bounded broadcast crossings (see scaladoc above)
  private val bnljByDesign = Set("ann_bruteforce_topk", "ann_quantized_topk",
    "ann_ivf_topk", "ann_ivf_kmeans")

  test("no cartesian products; nested-loop joins only where designed") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.all
      .filterNot(q => skip(q.name) || q.name.startsWith("stream_"))
      .foreach { q =>
        val plan = q.run(spark, dir).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"${q.name} plans a cartesian product")
        if (!bnljByDesign(q.name))
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"${q.name} plans an unexpected broadcast nested-loop join")
      }
  }
}
