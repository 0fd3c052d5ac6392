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

  test("changePoint finds a step jump exactly; flat series ties earliest") {
    // g1: 10,10,10,40,40 — the true split is after index 3; mean gap
    // 30 => score 30_000_000 ppm, means 10e6 / 40e6
    // g2: 7,7,7,7 — every split has gap 0; tie-break picks the FIRST
    // g3: single point — no split, no row
    val df = (Seq(("g1", 1L, 10L), ("g1", 2L, 10L), ("g1", 3L, 10L),
      ("g1", 4L, 40L), ("g1", 5L, 40L)) ++
      (1 to 4).map(i => ("g2", i.toLong, 7L)) :+ ("g3", 1L, 9L))
      .toDF("g", "pos", "n")
    val r = EventState.changePoint(df, "g", "pos", "n")
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toMap
    assert(r === Map(
      "g1" -> ((3L, 30000000L, 10000000L, 40000000L)),
      "g2" -> ((1L, 0L, 7000000L, 7000000L))))
  }

  test("timeWeightedAvg weights by duration; negatives truncate like //") {
    // u1: value 10 deci held 3 us, then 40 held 1 us, last drops =>
    // twa = (10*3 + 40*1) / 4 = 17 (truncation of 17.5)
    // u2: all events at one instant => zero total duration, dropped
    // u3: negative series: (-7*1 + -8*1) / 2 = -7.5 -> -7 (both Spark
    // DIV and DuckDB integer // truncate toward zero)
    val df = Seq(
      (1L, 10L, 0L, 1.0), (1L, 11L, 3L, 4.0), (1L, 12L, 4L, 9.9),
      (2L, 20L, 5L, 1.0), (2L, 21L, 5L, 2.0),
      (3L, 30L, 0L, -0.7), (3L, 31L, 1L, -0.8), (3L, 32L, 2L, 0.0))
      .toDF("user_id", "event_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = EventState.timeWeightedAvg(df, "user_id", "ts", "event_id",
        expr("CAST(FLOOR(value * 10.0) AS BIGINT)"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    assert(r === Map(1L -> ((2L, 17L)), 3L -> ((2L, -7L))))
  }

  test("holtLinear matches the hand-unrolled ppm recurrence") {
    // g=a, y = 5, 6, 7 (α=0.3, β=0.2 ppm):
    //   l0=5000000 b0=0
    //   l1=(3e5·6e6+7e5·5e6)//1e6=5300000, b1=2e5·300000//1e6=60000
    //   l2=(3e5·7e6+7e5·5360000)//1e6=5852000
    //   b2=(2e5·552000+8e5·60000)//1e6=158400
    // g=b, y = 10, 4, 7 — a DECREASING start, so the trend goes
    // negative and the toward-zero truncation is exercised:
    //   l1=8200000 b1=-360000; l2=7588000 b2=-410400
    val df = Seq(("a", 1, 5L), ("a", 2, 6L), ("a", 3, 7L),
      ("b", 1, 10L), ("b", 2, 4L), ("b", 3, 7L))
      .toDF("g", "d", "n")
    val r = EventState.holtLinear(df, "g", "d", "n")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5), x.getLong(6)))).toMap
    // backtest: charged BEFORE consuming each y_t against (l+b):
    //   a: |6e6-5e6| + |7e6-5360000| = 1000000 + 1640000 -> mae 1320000
    //   b: |4e6-10e6| + |7e6-7840000| = 6000000 + 840000 -> mae 3420000
    assert(r("a") === ((3L, 5852000L, 158400L,
      5852000L + 158400L, 5852000L + 7L * 158400L, 1320000L)))
    assert(r("b") === ((3L, 7588000L, -410400L,
      7588000L - 410400L, 7588000L - 7L * 410400L, 3420000L)))
    // a one-period group is the init state: level = y0 ppm, no trend,
    // and no backtest to report (NULL, not a zero that fakes accuracy)
    val one = EventState.holtLinear(Seq(("c", 1, 9L)).toDF("g", "d", "n"),
      "g", "d", "n").collect()
    assert(one.map(x => (x.getLong(1), x.getLong(2), x.getLong(3),
      x.isNullAt(6))).toSeq === Seq((1L, 9000000L, 0L, true)))
  }
}
