package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a cross product.
  *
  * The naive spelling `points JOIN intervals ON p >= s AND p < e` has no
  * equi-key, so Spark plans a broadcast-nested-loop join — O(|P|·|I|)
  * comparisons and a hard fail once neither side fits in memory. The
  * scale shape is the standard bucketed range join (DuckDB/Trino plan
  * the same way natively): quantize the domain into fixed-width buckets,
  * replicate each interval to every bucket it overlaps, hash-join points
  * to intervals on the bucket id, then refine with the exact predicate.
  * Work drops to O(|P| + |I|·w/B + matches) with an ordinary shuffled
  * hash join the optimizer can reason about.
  *
  * Bucket width trades replication against probe fan-in: pick B near the
  * median interval length so most intervals land in 1-2 buckets. A few
  * giant intervals replicate to many buckets — at 100 TB, split those
  * into their own broadcast side (they are few by definition) rather
  * than lowering B for everyone.
  */
object IntervalJoin {

  /** Join each point row to every interval row whose `[startCol, endCol)`
    * half-open range contains `pointCol`. All three columns must be
    * numeric on one shared axis (day numbers, epoch seconds, ...).
    * Zero-length and negative intervals match nothing, as a half-open
    * range should.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val b = lit(bucketWidth)
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / b).cast("long"))
    val iv = intervals
      .filter(col(endCol) > col(startCol)) // empty range: no buckets at all
      .withColumn("__bucket", explode(sequence(
        floor(col(startCol) / b).cast("long"),
        floor((col(endCol) - 1) / b).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
