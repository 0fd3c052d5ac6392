package graft.ops

import graft.SparkTestBase

/** As-of join semantics: inclusive at equal ts, latest-preceding match,
  * null when nothing precedes, keys independent.
  */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("asOf picks the latest right row with ts <= left ts per key") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 99L, "z"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("v"))
      .orderBy("lid").collect()
      .map(r => (r.getString(2), r.getString(3)))
    assert(out.toSeq === Seq(
      ("l1", "a"),  // equal ts is inclusive
      ("l2", "b"),  // latest preceding, not first
      ("l3", null)  // nothing precedes → left-outer null
    ))
  }

  test("asOfTolerance nulls stale matches, keeps fresh ones") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_micros(col("ts")))
    val left = withTs(Seq((1L, 100L, "l1"), (1L, 250L, "l2"), (2L, 50L, "l3"))
      .toDF("k", "ts", "lid"))
    val right = withTs(Seq((1L, 90L, "a"), (2L, 10L, "z"))
      .toDF("k", "ts", "v"))
    val out = AsOfJoin.asOfTolerance(left, right, "k", "ts", Seq("v"),
      toleranceMicros = 20L)
      .orderBy("lid").collect()
      .map(r => (r.getString(2), r.getString(3)))
    assert(out.toSeq === Seq(
      ("l1", "a"),  // 10 µs stale — within tolerance
      ("l2", null), // matched 160 µs back — stale, degrades to null
      ("l3", null)  // matched 40 µs back — stale too
    ))
  }

  test("asOfForward picks the earliest right row with ts >= left ts per key") {
    val left = Seq((1L, 10L, "l1"), (1L, 12L, "l2"), (2L, 100L, "l3"))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 99L, "z"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asOfForward(left, right, "k", "ts", Seq("v"))
      .orderBy("lid").collect()
      .map(r => (r.getString(2), r.getString(3)))
    assert(out.toSeq === Seq(
      ("l1", "a"),  // equal ts is inclusive
      ("l2", "b"),  // earliest following, not latest
      ("l3", null)  // nothing follows → left-outer null
    ))
  }
}
