package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val points =
    Seq((1L, 0L), (2L, 5L), (3L, 7L), (4L, 10L), (5L, 23L), (6L, -3L))
      .toDF("pid", "p")
  private lazy val intervals = Seq(
    (10L, 0L, 7L), // [0,7): hits 0, 5; 7 excluded (half-open)
    (11L, 5L, 25L), // spans 3 buckets of width 7: hits 5, 7, 10, 23
    (12L, 9L, 9L), // zero-length: hits nothing
    (13L, -7L, 1L), // negative domain: hits -3, 0
    (14L, 30L, 40L) // disjoint: hits nothing
  ).toDF("iid", "s", "e")

  private def matches(width: Long): Set[(Long, Long)] =
    IntervalJoin.pointInInterval(points, "p", intervals, "s", "e", width)
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed join equals the naive range join, at any bucket width") {
    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("s") && col("p") < col("e"))
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive === Set(
      (1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L), (5L, 11L),
      (6L, 13L), (1L, 13L)))
    Seq(1L, 3L, 7L, 100L).foreach { w =>
      assert(matches(w) === naive, s"bucket width $w")
    }
  }

  test("boundary semantics: start inclusive, end exclusive, no duplicates") {
    val out = IntervalJoin.pointInInterval(points, "p", intervals, "s", "e", 7L)
      .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1)))
    // an interval replicated to 3 buckets must still match a point once
    assert(out.length === out.toSet.size)
    assert(out.toSet.contains((2L, 11L))) // p == s included
    assert(!out.toSet.exists(_ == (3L -> 10L))) // p == e excluded
  }

  test("non-positive bucket width is refused") {
    intercept[IllegalArgumentException](
      IntervalJoin.pointInInterval(points, "p", intervals, "s", "e", 0L))
  }

  test("giant-interval hybrid routes wide spans to broadcast, same result") {
    // one interval spanning the whole domain (10k buckets at width 1)
    // plus the regular fixture set; the hybrid must produce exactly the
    // grid-only answer at every threshold, including thresholds that
    // push several intervals onto the broadcast side
    val wide = intervals.unionByName(
      Seq((15L, -5000L, 5000L)).toDF("iid", "s", "e"))
    val gridOnly = IntervalJoin
      .pointInInterval(points, "p", wide, "s", "e", 1L)
      .select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gridOnly.count(_._2 == 15L) === points.count()) // hits every point
    Seq(1L, 3L, 9999L).foreach { g =>
      val hybrid = IntervalJoin
        .pointInInterval(points, "p", wide, "s", "e", 1L, Some(g))
        .select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(hybrid === gridOnly, s"giantBuckets $g")
    }
    // the giant interval must actually take the broadcast path: with the
    // threshold at 9999 buckets only iid=15 (span 10000) qualifies, and
    // the plan carries the bounded nested-loop stage for it
    val plan = IntervalJoin
      .pointInInterval(points, "p", wide, "s", "e", 1L, Some(9999L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }
}
