package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Documents WHEN manual salting is actually needed: Spark's AQE
  * splits skewed partitions of a sort-merge JOIN at runtime
  * (`spark.sql.adaptive.skewJoin`), so the `q_salted_join` manual-salt
  * spelling is not required for plain equi-joins — AQE handles those.
  * Manual salting remains the tool for the shapes AQE does NOT cover:
  * skewed AGGREGATIONS (a hot groupBy key still funnels one task) and
  * stream-stream joins (AQE is disabled in stateful streaming).
  *
  * Thresholds are lowered to make the sf0.1 hot key (90 % of events on
  * one join key ≈ several MB in one shuffle partition) cross the
  * skew bar a production default (256 MB) sets for real data.
  */
class AqeSkewJoinSpec extends SparkTestBase {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The unsalted hot-key join: 90 % of sf0.1 events land on join key
    * 0, the dim side is forced off the broadcast path so the join is
    * the sort-merge shape AQE's skew rule applies to. */
  private def runHotJoin(): String = {
    // repartition first: AQE splits a skewed REDUCE partition at
    // MAP-output boundaries, so the fact side must come from multiple
    // mappers (one small parquet file = one mapper = unsplittable; a
    // real 100 TB fact scan has thousands of mappers)
    val ev = Relational.events(spark, "/root/testdata/sf0.1")
      .repartition(16, col("event_id"))
      .select(col("event_id"), col("value"),
        when(pmod(col("event_id"), lit(10)) < 9, lit(0L))
          .otherwise(pmod(col("event_id"), lit(5))).as("hot_key"))
    val dim = spark.read.parquet("/root/testdata/sf0.1/nation.parquet")
      .select(col("n_nationkey").cast("long").as("hot_key"), col("n_name"))
    // keep event_id and value in the aggregate so column pruning cannot
    // strip the shuffle down to the constant-heavy (run-length-
    // compressed) hot_key alone — skew detection reads COMPRESSED
    // map-output sizes, and a constant column compresses to nothing
    val joined = ev.join(dim, "hot_key")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"),
        max(col("event_id")).as("me"))
    joined.collect() // finalize the adaptive plan
    joined.queryExecution.executedPlan.toString
  }

  test("AQE splits the skewed partitions of the unsalted hot-key join") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32768",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192") {
      val plan = runHotJoin()
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot-key sort-merge join as skewed:\n$plan")
    }
  }

  test("with the skew rule off, the same join keeps its hot partition") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32768",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192") {
      val plan = runHotJoin()
      assert(!plan.contains("skew=true"),
        "the control run unexpectedly triggered skew handling")
    }
  }
}
