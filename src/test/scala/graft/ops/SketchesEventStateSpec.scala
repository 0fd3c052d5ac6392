package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Structural guarantees of the sketch estimators and the event-state
  * operators that the oracle gate (which pins exact values at one SF)
  * cannot express: the CMS one-sided error bound, HLL merge identity,
  * snapshot/SCD2 tie determinism, and the zero-variance anomaly case.
  */
class SketchesEventStateSpec extends SparkTestBase {
  import spark.implicits._

  test("CMS estimate is never below the true count (one-sided error)") {
    val items = (1 to 2000).flatMap(i => Seq.fill(i % 7 + 1)(s"tok$i"))
      .toDF("item")
    val r = Sketches.cmsHeavyHitters(items, "item", k = 25).collect()
    assert(r.length === 25)
    r.foreach(row =>
      assert(row.getAs[Long]("est_count") >= row.getAs[Long]("true_count"),
        s"CMS underestimated ${row.getAs[String]("item")}"))
  }

  test("HLL estimate tracks true cardinality within the design error") {
    val items = (1 to 5000).map(i => ("g", s"item$i")).toDF("g", "item")
    val r = Sketches.hllDistinct(items, "g", "item").collect()(0)
    val est = r.getAs[Long]("est_ndv")
    assert(r.getAs[Long]("exact_ndv") === 5000L)
    // 1.04/sqrt(1024) ~ 3.3% standard error; 5 sigma of slack
    assert(est > 4200 && est < 5800, s"HLL estimate $est way off 5000")
  }

  test("HLL is insensitive to duplication (multiset in, distinct out)") {
    val once = (1 to 3000).map(i => ("g", s"v$i")).toDF("g", "item")
    val thrice = (1 to 3000).flatMap(i => Seq.fill(3)(("g", s"v$i")))
      .toDF("g", "item")
    val a = Sketches.hllDistinct(once, "g", "item").collect()(0).getAs[Long]("est_ndv")
    val b = Sketches.hllDistinct(thrice, "g", "item").collect()(0).getAs[Long]("est_ndv")
    assert(a === b)
  }

  test("HLL merge of shard sketches equals the union sketch bit-for-bit") {
    val a = (1 to 2000).map(i => ("g", s"v$i")).toDF("g", "item")
    val b = (1500 to 3500).map(i => ("g", s"v$i")).toDF("g", "item")
    val merged = Sketches.hllMerge(
      Seq(Sketches.hllSketch(a, "g", "item"),
        Sketches.hllSketch(b, "g", "item")), "g")
    val direct = Sketches.hllSketch(a.unionByName(b), "g", "item")
    assert(rows(merged.orderBy("bucket")).toSet ===
      rows(direct.orderBy("bucket")).toSet)
    assert(rows(Sketches.hllEstimate(merged, "g")) ===
      rows(Sketches.hllEstimate(direct, "g")))
  }

  test("CMS merge of shard sketches equals the union sketch bit-for-bit") {
    val a = (1 to 800).map(i => s"t${i % 90}").toDF("item")
    val b = (1 to 600).map(i => s"t${i % 70}").toDF("item")
    val merged = Sketches.cmsMerge(
      Seq(Sketches.cmsSketch(a, "item"), Sketches.cmsSketch(b, "item")))
    val direct = Sketches.cmsSketch(a.unionByName(b), "item")
    assert(rows(merged).toSet === rows(direct).toSet)
  }

  test("cmsJoinSize: one-sided overestimate, exact on a collision-free key") {
    // skewed key frequencies: exact join size = sum of squared counts
    val a = (1 to 300).flatMap(i => Seq.fill(i % 5 + 1)(s"k${i % 40}"))
      .toDF("k")
    val r = Sketches.cmsJoinSize(a, "k", a, "k").collect()(0)
    val (est, exact) = (r.getLong(0), r.getLong(1))
    val f = a.groupBy("k").count().collect().map(_.getLong(1))
    assert(exact === f.map(c => c * c).sum)
    assert(est >= exact, s"inner product must not underestimate: $est < $exact")
    // 40 keys in 1024 buckets: collisions are possible but the estimate
    // must stay within the CMS design envelope (eps*N^2-ish, loose here)
    assert(est <= exact * 3)
    // disjoint key spaces: exact 0, and the est side still >= 0
    val b = (1 to 100).map(i => s"z$i").toDF("k")
    val r2 = Sketches.cmsJoinSize(a, "k", b, "k").collect()(0)
    assert(r2.getLong(1) === 0L)
    assert(r2.getLong(0) >= 0L)
  }

  test("latestSnapshot breaks timestamp collisions by the tie column") {
    val df = Seq(
      (1L, 100L, 1L, "a", 1.0),
      (1L, 100L, 3L, "b", 2.0), // same ts, larger event_id wins
      (1L, 100L, 2L, "c", 3.0),
      (2L, 50L, 9L, "d", 4.0),
      (2L, 60L, 1L, "e", 5.0)) // later ts wins despite smaller id
      .toDF("user_id", "tsl", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("tsl")))
    val r = EventState.latestSnapshot(df, "user_id", "ts", "event_id",
      Seq("event_type", "value"))
      .orderBy("user_id").collect()
    assert(r(0).getAs[String]("event_type") === "b")
    assert(r(0).getAs[Long]("last_ts_us") === 100L)
    assert(r(1).getAs[String]("event_type") === "e")
  }

  test("scd2Intervals compresses same-state runs and closes at changes") {
    val df = Seq(
      (1L, 10L, 1L, "x"),
      (1L, 20L, 2L, "x"), // run extends, no new interval
      (1L, 30L, 3L, "y"), // change: closes x at 30
      (1L, 40L, 4L, "x")) // change back: closes y at 40, open x
      .toDF("user_id", "tsl", "event_id", "state_in")
      .withColumn("ts", timestamp_micros(col("tsl")))
    val r = EventState.scd2Intervals(df, "user_id", "ts", "event_id", "state_in")
      .orderBy("valid_from_us").collect()
    assert(r.map(_.getAs[String]("state")).toSeq === Seq("x", "y", "x"))
    assert(r.map(_.getAs[Long]("valid_from_us")).toSeq === Seq(10L, 30L, 40L))
    assert(r(0).getAs[Long]("valid_to_us") === 30L)
    assert(r(1).getAs[Long]("valid_to_us") === 40L)
    assert(r(2).isNullAt(r(2).fieldIndex("valid_to_us")))
  }

  test("anomalies flags nothing in a zero-variance group") {
    val df = (1 to 100).map(i => (i.toLong, "t", 5.0))
      .toDF("event_id", "event_type", "value")
    val r = EventState.anomalies(df, "event_type", "value", Seq("event_id"))
    assert(r.count() === 0)
  }

  test("anomalies flags a clear outlier and only the outlier") {
    val df = ((1 to 99).map(i => (i.toLong, "t", 10.0 + (i % 3) * 0.1)) :+
      (100L, "t", 1000.0))
      .toDF("event_id", "event_type", "value")
    val r = EventState.anomalies(df, "event_type", "value", Seq("event_id"))
      .collect()
    assert(r.map(_.getAs[Long]("event_id")).toSeq === Seq(100L))
  }
}
