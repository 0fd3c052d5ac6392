package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Partition pruning: a filter on the partition column must reach the
  * scan as a partition filter (directories never listed/read), not a
  * post-scan predicate — the difference between reading 1/N and N/N of a
  * 100 TB date-partitioned corpus.
  */
class PartitionPruningSpec extends SparkTestBase {
  import spark.implicits._

  test("partition-column filter prunes at the scan") {
    val dir = s"/tmp/graft-prune-${System.nanoTime()}"
    (1 to 300).map(i => (i, s"2024-01-${i % 3 + 1}")).toDF("v", "day")
      .write.partitionBy("day").parquet(dir)

    val q = spark.read.parquet(dir).filter($"day" === "2024-01-2")
    assert(q.count() === 100)

    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-2"),
      s"expected pruned scan, got:\n$scan")
    // the data predicate list stays empty — nothing is filtered row-wise
    assert(!scan.replaceAll("PartitionFilters[^]]*\\]", "")
      .contains("2024-01-2"))
  }
}
