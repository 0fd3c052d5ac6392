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
    *
    * `giantBuckets = Some(g)` enables the hybrid from the scaladoc above:
    * intervals spanning more than `g` buckets skip grid replication and
    * instead join from a small BROADCAST side with the exact range
    * predicate (a deliberate bounded nested-loop: such intervals are few
    * by the caller's contract — a handful of "all of history" windows —
    * and replicating each across 10⁴+ buckets would dominate the grid).
    * The split is exact, so results are identical either way.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, giantBuckets: Option[Long] = None): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    giantBuckets.foreach(g =>
      require(g >= 1, s"giantBuckets must be >= 1, got $g"))
    val b = lit(bucketWidth)
    val nonEmpty =
      intervals.filter(col(endCol) > col(startCol)) // empty range: no buckets
    val span = floor((col(endCol) - 1) / b) - floor(col(startCol) / b) + 1
    val gridIv = giantBuckets.fold(nonEmpty)(g => nonEmpty.filter(span <= g))
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / b).cast("long"))
    val iv = gridIv
      .withColumn("__bucket", explode(sequence(
        floor(col(startCol) / b).cast("long"),
        floor((col(endCol) - 1) / b).cast("long"))))
    val grid = p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
    giantBuckets match {
      case None => grid
      case Some(g) =>
        val giants = points.join(broadcast(nonEmpty.filter(span > g)),
          col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
        grid.unionByName(giants)
    }
  }
}
