package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` in the same key group — the feature-lookup /
  * point-in-time join every event and training-data pipeline needs and
  * Spark lacks as a built-in.
  *
  * Implemented the scale-correct way: NOT a range cross-join (whose
  * candidate count is unbounded) but union + last-observation-carried-
  * forward — tag both sides, union, one shuffle on the key, and a running
  * `last(payload, ignoreNulls)` over (ts, side) per key. Wall cost is one
  * shuffle + one partition-local sort regardless of how dense the right
  * side is; at equal timestamps the right row sorts first, so matches are
  * inclusive (`>=`), exactly DuckDB's ASOF JOIN semantics.
  *
  * The right side should be unique per (key, ts) — pre-aggregate
  * duplicates (`groupBy(key, ts).agg(...)`) or the tie is arbitrary.
  * A skewed key concentrates its rows on one reducer like any keyed
  * window; salt the key and as-of join within salt shards if a single
  * key's history outgrows a partition.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry onto matched left rows
    * @param prefix  output prefix for the carried columns (null when no
    *                right row precedes the left row — left-outer shape)
    */
  def asOf(left: DataFrame, right: DataFrame,
      key: String, ts: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame =
    asOfImpl(left, right, key, ts, payload, prefix, backward = true)

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` in the key group — "next observation" (the
    * next quote / next maintenance window / next price revision). Same
    * union-LOCF machinery run time-reversed; matches DuckDB's
    * `ASOF JOIN ... ON l.ts <= r.ts`. */
  def asOfForward(left: DataFrame, right: DataFrame,
      key: String, ts: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame =
    asOfImpl(left, right, key, ts, payload, prefix, backward = false)

  /** [[asOf]] with a STALENESS BOUND: the match is kept only while the
    * right row is at most `toleranceMicros` older than the left row —
    * the sensor-fusion / feature-freshness contract ("use the last
    * quote, but never one more than 5 minutes stale"). A match outside
    * tolerance degrades to null, exactly the left-outer no-match shape,
    * so downstream code has ONE null-handling path for "never matched"
    * and "matched but stale".
    *
    * Same union-LOCF machinery (one shuffle, one partition-local sort);
    * the matched right timestamp rides the payload struct and the
    * tolerance test is one map-side comparison. `ts` must be a
    * timestamp column on both sides.
    */
  def asOfTolerance(left: DataFrame, right: DataFrame,
      key: String, ts: String, payload: Seq[String],
      toleranceMicros: Long, prefix: String = "asof_"): DataFrame = {
    require(toleranceMicros >= 0,
      s"toleranceMicros must be >= 0, got $toleranceMicros")
    val matched = asOfImpl(left, right.withColumn("__g_asof_rts", col(ts)),
      key, ts, payload :+ "__g_asof_rts", prefix, backward = true)
    val fresh = unix_micros(col(ts)) -
      unix_micros(col(s"${prefix}__g_asof_rts")) <= toleranceMicros
    matched.select(left.columns.map(col) ++
      payload.map(p =>
        when(fresh, col(prefix + p))
          .otherwise(lit(null).cast(matched.schema(prefix + p).dataType))
          .as(prefix + p)): _*)
  }

  private def asOfImpl(left: DataFrame, right: DataFrame,
      key: String, ts: String, payload: Seq[String],
      prefix: String, backward: Boolean): DataFrame = {
    val pay = struct(payload.map(col): _*)
    val rt0 = right.select(col(key), col(ts), pay.as("__g_asof_pay"))
      .withColumn("__g_asof_side", lit(0))
    val extraLeft = left.columns.filterNot(c => c == key || c == ts)
    val lt = left
      .withColumn("__g_asof_side", lit(1))
      .withColumn("__g_asof_pay",
        lit(null).cast(rt0.schema("__g_asof_pay").dataType))
    val rt = extraLeft.foldLeft(rt0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    // backward: ascending ts, running last ⇒ latest right at or before.
    // forward: DESCENDING ts, same running last ⇒ earliest right at or
    // after. Either way the right row sorts first at equal ts (side 0),
    // so matches are inclusive — DuckDB ASOF semantics in both directions.
    val ord = if (backward) col(ts).asc else col(ts).desc
    val w = Window.partitionBy(col(key))
      .orderBy(ord, col("__g_asof_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lt.unionByName(rt)
      .withColumn("__g_asof_m",
        last(col("__g_asof_pay"), ignoreNulls = true).over(w))
      .filter(col("__g_asof_side") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__g_asof_m.$p").as(prefix + p)): _*)
  }
}
