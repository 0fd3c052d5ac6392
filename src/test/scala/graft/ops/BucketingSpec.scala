package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: when both sides are bucketed on the
  * join key with the same bucket count, the sort-merge join consumes the
  * bucket layout and plans WITHOUT a shuffle exchange — the storage-level
  * answer to a repeated big-fact join at 100 TB (pay the shuffle once at
  * write time, never again per query).
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed tables join with no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 1000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "f")
      val dims = (0 to 99).map(i => (i.toLong, s"d$i")).toDF("k", "d")
      facts.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
        .saveAsTable("graft_bkt_facts")
      dims.write.bucketBy(8, "k").sortBy("k").mode("overwrite")
        .saveAsTable("graft_bkt_dims")

      val joined = spark.table("graft_bkt_facts")
        .join(spark.table("graft_bkt_dims"), "k")
      assert(joined.count() === 1000)

      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join should not shuffle, got:\n$physical")

      // the same join over unbucketed data DOES shuffle — the baseline
      val unbucketed = facts.join(dims, "k")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dims")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("the registry's bucketed order-lines pipeline joins and aggregates shuffle-free") {
    // the q_bucketed_join plan: both sides bucketed on the join key, so
    // the join AND the key-grouped aggregate ride the bucket layout —
    // zero Exchange operators anywhere (the oracle gate checks the
    // answer; this asserts the plan shape that makes it 100 TB-cheap)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = Relational.bucketedOrderLines(spark, "/root/testdata/sf0.001")
      assert(out.count() > 0)
      val physical = out.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join+agg should plan no shuffle, got:\n$physical")
    } finally {
      Relational.dropBucketedTables(spark)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("bucketed pipeline reruns cleanly in one session: per-run tables") {
    // per-run table names + previous-run drop: two back-to-back builds
    // in one JVM must both compute (the old fixed names collided with
    // leftover warehouse dirs and with concurrent sessions)
    try {
      val a = Relational.bucketedOrderLines(spark, "/root/testdata/sf0.001")
        .orderBy("o_orderkey").collect()
      val b = Relational.bucketedOrderLines(spark, "/root/testdata/sf0.001")
        .orderBy("o_orderkey").collect()
      assert(a.nonEmpty)
      assert(a.map(_.toSeq.toList).toList === b.map(_.toSeq.toList).toList)
    } finally Relational.dropBucketedTables(spark)
  }
}
