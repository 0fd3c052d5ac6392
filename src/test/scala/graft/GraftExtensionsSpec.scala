package graft

import org.apache.spark.sql.functions._

/** SQL-surface registration of the native expressions (the extensions
  * entry point and registerAll share one builder table, so exercising
  * registerAll covers the injectFunction wiring too).
  */
class GraftExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("registerAll exposes every native function to SQL") {
    GraftExtensions.registerAll(spark)

    val h = spark.sql("SELECT rolling_hash('abc') AS h").collect()(0).getLong(0)
    assert(h === Seq("abc").toDF("t")
      .select(functions.RollingHash.rolling_hash($"t")).collect()(0).getLong(0))

    val d = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(d === 11.0)

    val b = spark.sql(
      "SELECT hyperplane_bucket(array(1.0D, 1.0D, 1.0D, 1.0D), 4) AS b")
      .collect()(0).getLong(0)
    val expected = Seq(Tuple1(Array(1.0, 1.0, 1.0, 1.0))).toDF("v")
      .select(functions.HyperplaneBucket.hyperplane_bucket($"v", 4))
      .collect()(0).getLong(0)
    assert(b === expected)

    val q = spark.sql(
      "SELECT quantize_int8(array(1.0D, -0.5D, 0.0D)) AS q")
      .collect()(0).getSeq[Long](0)
    assert(q === Seq(127L, -64L, 0L)) // floor(-63.5) = -64

    val rows = Seq((1L, 0.9), (2L, 0.5), (3L, 0.7)).toDF("id", "s")
    rows.createOrReplaceTempView("scores")
    val top = spark.sql(
      "SELECT top_k_by_score(s, id, 2) AS t FROM scores")
      .selectExpr("inline(t)").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.toSeq === Seq((1L, 0.9), (3L, 0.7)))

    val sis = spark.sql(
      "SELECT sorted_intersect_sum(array(1L, 3L, 5L, 9L), " +
        "array(10L, 20L, 30L, 40L), array(2L, 3L, 9L, 11L)) AS s")
      .collect()(0).getLong(0)
    assert(sis === 60L) // keys 3 and 9 shared -> 20 + 40

    val sic = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L, 9L), " +
        "array(2L, 3L, 9L, 11L)) AS c").collect()(0).getLong(0)
    assert(sic === 2L)
  }

  test("sorted_intersect_sum matches the aggregate+array_contains fold") {
    GraftExtensions.registerAll(spark)
    // randomized cross-check: the merge must equal the quadratic fold on
    // sorted duplicate-free keys, including empty and disjoint inputs
    val rnd = new scala.util.Random(7)
    val cases = (Seq(Seq.empty[Long], Seq(5L)) ++ (1 to 20).map(_ =>
      rnd.shuffle((0L to 40L).toVector).take(rnd.nextInt(12)).sorted.toSeq))
    for (a <- cases; b <- cases.take(8)) {
      val aw = a.map(k => k * 7 + 1)
      val df = Seq((a.toArray, aw.toArray, b.toArray)).toDF("ak", "aw", "bk")
      val merged = df.select(functions.SortedIntersectSum
        .sorted_intersect_sum($"ak", $"aw", $"bk")).collect()(0).getLong(0)
      val folded = df.select(aggregate(zip_with($"ak", $"aw",
        (k, w) => struct(k.as("k"), w.as("w"))), lit(0L),
        (acc, e) => acc + when(array_contains($"bk", e.getField("k")),
          e.getField("w")).otherwise(0L))).collect()(0).getLong(0)
      assert(merged === folded, s"a=$a b=$b")
    }
  }

  test("non-literal k is rejected with a clear message") {
    GraftExtensions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT hyperplane_bucket(array(1.0D), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
