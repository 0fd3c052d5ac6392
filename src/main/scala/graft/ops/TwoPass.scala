package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed two-pass substitutes for whole-group window functions
  * over low-cardinality keys.
  *
  * `Window.partitionBy(group)` colocates EVERY row of a group in one
  * task before any frame logic runs. For a fixed-cardinality key (a
  * market segment, a language, a crawl source) group size grows
  * linearly with the corpus, so the window degenerates into a handful
  * of single-task sorts — the classic 100 TB cliff. The two-pass
  * spelling keeps every task bounded by a range partition instead:
  *
  *  1. range-partition on (group, order) — contiguous bounded slices
  *     (~n/P rows), partition ids ordered by the key;
  *  2. run the window per (partition-id, group) — no window group can
  *     exceed a partition;
  *  3. add back per-(partition, group) offsets (cumulative counts or
  *     value sums over all earlier partitions), folded on a
  *     P×|groups|-row table — cluster-sized, never data-sized — and
  *     broadcast-joined to the data.
  *
  * The eager `localCheckpoint` after range partitioning is
  * CORRECTNESS, not caching: partition bounds come from sampling, and
  * the partitioned frame feeds both the offsets subtree and the
  * join-back — an uncheckpointed recompute could re-draw bounds and
  * mismatch the recorded partition ids.
  */
object TwoPass {

  private val Pid = "__tp_pid"
  private val Loc = "__tp_loc"
  private val Off = "__tp_off"

  private def parted(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column]): DataFrame =
    df.repartitionByRange((groupCols.map(col) ++ orderCols): _*)
      .withColumn(Pid, spark_partition_id())
      .localCheckpoint(true)

  private def withOffsets(p: DataFrame, groupCols: Seq[String],
      perPart: Column, localCol: Column, out: String,
      countOut: Option[String]): DataFrame = {
    val sums = p.groupBy((col(Pid) +: groupCols.map(col)): _*)
      .agg(perPart.as("__tp_s"))
    val wg = Window.partitionBy(groupCols.map(col): _*)
    val offs0 = sums.withColumn(Off, coalesce(
      sum(col("__tp_s")).over(wg.orderBy(col(Pid))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offs = countOut.fold(offs0)(n =>
      offs0.withColumn(n, sum(col("__tp_s")).over(wg))).drop("__tp_s")
    p.withColumn(Loc, localCol)
      .join(broadcast(offs), Pid +: groupCols)
      .withColumn(out, col(Loc) + col(Off))
      .drop(Pid, Loc, Off)
  }

  /** 1-based rank of each row within its `groupCols` group under
    * `orderCols`, appended as `out` (LongType). Row_number semantics:
    * `orderCols` must order rows uniquely within a group for a
    * deterministic result. `countOut`, when set, also appends the
    * group's total row count — rank families (percent_rank, cume_dist,
    * ntile) are closed-form in (rank, n) when the ordering is
    * tie-free. */
  def rank(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      out: String, countOut: Option[String] = None): DataFrame = {
    val p = parted(df, groupCols, orderCols)
    val wLoc = Window.partitionBy((col(Pid) +: groupCols.map(col)): _*)
      .orderBy(orderCols: _*)
    // the Seq-keyed broadcast join moves (pid, group) to the front;
    // restore the caller's column order — positional consumers must see
    // the input schema plus the appended columns
    withOffsets(p, groupCols, count(lit(1)),
      row_number().over(wLoc).cast("long"), out, countOut)
      .select((df.columns.toSeq ++ Seq(out) ++ countOut).map(col): _*)
  }

  /** EXCLUSIVE running sum of `value` within each group in `orderCols`
    * order (the sum of all strictly-earlier rows; 0 for the first row),
    * appended as `out` (LongType). `value` must be non-negative-safe
    * long arithmetic on the caller's side; `orderCols` must be unique
    * per group. */
  def prefixSum(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], value: Column, out: String): DataFrame = {
    val p = parted(df.withColumn("__tp_v", value.cast("long")),
      groupCols, orderCols)
    val wLoc = Window.partitionBy((col(Pid) +: groupCols.map(col)): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    withOffsets(p, groupCols, sum(col("__tp_v")),
      coalesce(sum(col("__tp_v")).over(wLoc), lit(0L)), out, None)
      .select((df.columns.toSeq :+ out).map(col): _*)
  }

  /** EXCLUSIVE running MAX of `value` within each group in `orderCols`
    * order (the max of all strictly-earlier rows; NULL for the first
    * row — max has no identity), appended as `out` (LongType). The
    * dominance/skyline primitive: a row knows the best value among
    * everything that precedes it without a single-partition window.
    * Same two-pass shape as [[prefixSum]]: range-partition on the
    * order, per-partition local window, per-partition maxima broadcast
    * back as exclusive cross-partition offsets; `greatest` skips NULLs
    * so the combine needs no special-casing. */
  def prefixMax(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], value: Column, out: String): DataFrame = {
    val p = parted(df.withColumn("__tp_v", value.cast("long")),
      groupCols, orderCols)
    val wLoc = Window.partitionBy((col(Pid) +: groupCols.map(col)): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val maxes = p.groupBy((col(Pid) +: groupCols.map(col)): _*)
      .agg(max(col("__tp_v")).as("__tp_s"))
    val wg = Window.partitionBy(groupCols.map(col): _*)
    val offs = maxes.withColumn(Off,
        max(col("__tp_s")).over(wg.orderBy(col(Pid))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .drop("__tp_s")
    p.withColumn(Loc, max(col("__tp_v")).over(wLoc))
      .join(broadcast(offs), Pid +: groupCols)
      .withColumn(out, greatest(col(Loc), col(Off)))
      .select((df.columns.toSeq :+ out).map(col): _*)
  }
}
