package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log state operators: the lakehouse "current state" and
  * "history table" derivations every CDC/analytics pipeline needs on
  * top of an append-only event stream, plus a two-pass anomaly gate.
  *
  * Scale notes (the 100 TB contract):
  *   - [[latestSnapshot]] is ONE partial-aggregated `groupBy(key)` —
  *     `max_by` combines map-side, so the shuffle carries one row per
  *     key per map task, never the raw event volume. No window.
  *   - [[scd2Intervals]] uses windows partitioned by the ENTITY key,
  *     whose cardinality grows with the data (users, devices, rows of
  *     a CDC'd table) — per-key row counts stay bounded by per-entity
  *     activity, so no fixed-cardinality single-task funnel (the
  *     q_window_ranks anti-pattern) can form.
  *   - [[anomalies]] never sorts or windows: per-group moments come
  *     from one partial-aggregated scan and join back as a broadcast
  *     (#groups rows). The outlier test is integer cross-multiplied —
  *     engine-exact, no sqrt, no epsilon.
  */
object EventState {

  /** Latest row per key — the "current state" view of an append-only
    * log (CDC compaction, device shadow, last-touch attribution).
    *
    * Deterministic: rows are ordered by (`tsCol`, `tieCol`); the tie
    * column (an event id / LSN) makes the ordering total even when
    * timestamps collide. Emits the key, the winning row's timestamp as
    * `last_ts_us` (µs since epoch), and the payload columns.
    */
  def latestSnapshot(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must be non-empty")
    val pick = struct((tsCol +: payloadCols).map(col): _*)
    val ord = struct(col(tsCol), col(tieCol))
    df.groupBy(col(keyCol))
      .agg(max_by(pick, ord).as("__last"))
      .select(col(keyCol) +:
        unix_micros(col(s"__last.$tsCol")).as("last_ts_us") +:
        payloadCols.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** Slowly-changing-dimension type-2 history: compress the event log
    * to one row per (key, state run), stamped with the half-open
    * validity interval [`valid_from_us`, `valid_to_us`) — `valid_to_us`
    * is NULL for each key's current state.
    *
    * Two windows, both partitioned by the data-scaled entity key: a
    * `lag` to detect state changes, then a `lead` over the surviving
    * change rows to close each interval at the NEXT change (not at the
    * next raw event — consecutive same-state events extend the run).
    */
  def scd2Intervals(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.select(col(keyCol), col(tsCol), col(tieCol), col(stateCol))
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(stateCol))
      .withColumn("valid_to_us", unix_micros(lead(col(tsCol), 1).over(w)))
      .select(col(keyCol), col(stateCol).as("state"),
        unix_micros(col(tsCol)).as("valid_from_us"), col("valid_to_us"))
  }

  /** Per-group 3-sigma outliers by exact integer arithmetic: quantize
    * the measure to deci-units (`floor(value * 10)` — the same double
    * product and floor in any IEEE engine), aggregate count / sum /
    * sum-of-squares per group, and flag rows where
    * `(n*v - S)^2 > 9 * (n*SS - S^2)` — the cross-multiplied form of
    * `|v - mean| > 3 * stddev`, with no division, sqrt, or float
    * accumulation anywhere. A zero-variance group flags nothing
    * (0 > 0 is false).
    *
    * Bounds: with |v| <= 5e5 deci-units and n <= 1e7 rows per group,
    * every intermediate stays under 2^63. Beyond that (true 100 TB
    * groups) the moments upgrade to DECIMAL(38,0) sums — the integer
    * comparison is unchanged.
    */
  def anomalies(df: DataFrame, groupCol: String, valueCol: String,
      keepCols: Seq[String], sigmas: Int = 3): DataFrame = {
    require(sigmas >= 1, s"sigmas must be >= 1, got $sigmas")
    val q = df.withColumn("__v",
      floor(col(valueCol) * lit(10.0)).cast("long"))
    val stats = q.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__n"),
      sum(col("__v")).as("__s"),
      sum(col("__v") * col("__v")).as("__ss"))
    val dev: Column = col("__n") * col("__v") - col("__s")
    q.join(broadcast(stats), groupCol)
      .filter(dev * dev > lit(sigmas.toLong * sigmas) *
        (col("__n") * col("__ss") - col("__s") * col("__s")))
      .select((groupCol +: keepCols).map(col): _*)
  }

  /** Per-key aggregate STATE (count / sum / min / max over integer
    * cents) — the materialized-view row an incremental pipeline stores.
    * Every field is a partial-aggregatable algebra, which is the whole
    * point: see [[mergeAggStates]].
    */
  /** Exponentially time-decayed counts per key — the "trending now"
    * statistic (recent activity counts in full, yesterday's at ½, two
    * days ago at ¼ …) with a power-of-two decay so EVERY contribution
    * is an exact integer: an event `delta` whole days old contributes
    * `2^(scaleBits − delta)` micro-units (0 beyond `scaleBits` days —
    * below one micro-unit, dropped identically by any engine). No
    * float pow, no epsilon: the decayed total is one BIGINT sum,
    * engine-identical at any scale and partitioning (contrast the
    * float spelling Σ 2^−delta, whose exactness ceiling is
    * log₂(count) + maxDelta ≤ 53 mantissa bits — already broken at
    * ~10¹² events).
    *
    * `asOfMicros` pins "now"; pass the stream's max event time (the
    * registry query pins it with one bounded aggregate — the kmeans
    * driver-scalar pattern). Half-life = one day by construction (the
    * unit of `delta`).
    *
    * Shape at scale: one map-side delta + shift per row, one
    * partial-aggregated groupBy(key). Nothing else.
    *
    * @return (keyCol, n_events, decayed_micro) — decayed_micro =
    *         Σ 2^(scaleBits−delta), i.e. count·2^scaleBits if
    *         everything happened today
    */
  def decayedCounts(df: DataFrame, keyCol: String, tsCol: String,
      asOfMicros: Long, scaleBits: Int = 20): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 40,
      s"scaleBits must be in [1, 40], got $scaleBits")
    df
      .withColumn("__delta",
        expr(s"(${asOfMicros}L - unix_micros($tsCol)) DIV 86400000000"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(expr(s"CASE WHEN __delta BETWEEN 0 AND $scaleBits " +
          s"THEN shiftleft(1L, CAST($scaleBits - __delta AS INT)) " +
          "ELSE 0L END")).as("decayed_micro"))
  }

  /** Exact single change-point per group: the split index maximizing
    * the between-segment mean shift |mean(1..i) − mean(i+1..T)| over an
    * ordered integer series — "when did this source's volume/behavior
    * jump", the monitoring primitive behind drift alerts on ingest
    * rates and quality scores.
    *
    * All integer: with prefix sum P_i and total S over T points,
    * {{{
    *   D_i        = |P_i·(T−i) − (S−P_i)·i|          (cross-multiplied)
    *   score_ppm  = D_i·10⁶ DIV (i·(T−i))            (the mean gap, ppm)
    * }}}
    * argmax by (score_ppm, earliest index) — deterministic, no floats,
    * so the oracle's identical spelling matches bit-for-bit. Headroom:
    * D_i ≤ S·T, so the ppm scaling needs S·T < 2⁶³/10⁶ ≈ 9.2·10¹²
    * (e.g. 10⁹ events/day per group × 25 years of days) — beyond that,
    * pre-scale the values.
    *
    * Shape at scale: the window runs over the caller's AGGREGATED
    * series (per-group rows = series length — calendar-bounded for a
    * daily series, never corpus-scaled), then one partial-aggregated
    * total join-back and one struct-max argmax per group. Raw events
    * never enter a window.
    *
    * @param df one row per (group, order point), `valueCol`
    *           integral-valued (caller quantizes)
    * @return (groupCol, orderCol, score_ppm, mean_before_ppm,
    *         mean_after_ppm) — the winning split per group; groups with
    *         a single point emit nothing (no split exists)
    */
  def changePoint(df: DataFrame, groupCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    val t = df.select(col(groupCol), col(orderCol),
        col(valueCol).cast("long").as("__v"))
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__p",
        sum(col("__v")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val tot = t.groupBy(col(groupCol))
      .agg(max(col("__i")).as("__t"), sum(col("__v")).as("__s"))
    t.join(tot, groupCol)
      .filter(col("__i") < col("__t"))
      .withColumn("__d", abs(expr("__p * (__t - __i) - (__s - __p) * __i")))
      .groupBy(col(groupCol))
      .agg(max(struct(
        expr("__d * 1000000 DIV (__i * (__t - __i))").as("score_ppm"),
        (-col("__i")).as("__ni"), // tie → earliest split
        col(orderCol).as("__o"),
        expr("__p * 1000000 DIV __i").as("__mb"),
        expr("(__s - __p) * 1000000 DIV (__t - __i)").as("__ma")))
        .as("__best"))
      .select(col(groupCol), col("__best.__o").as(orderCol),
        col("__best.score_ppm").as("score_ppm"),
        col("__best.__mb").as("mean_before_ppm"),
        col("__best.__ma").as("mean_after_ppm"))
  }

  /** Holt's linear-trend exponential smoothing per group (Holt 1957 /
    * Winters 1960, the no-seasonality member) — the one-card forecast
    * every operational dashboard wants on top of a daily aggregate:
    * {{{
    *   l_t = (α·y_t·10^6 + (10^6−α)·(l_{t−1} + b_{t−1})) DIV 10^6
    *   b_t = (β·(l_t − l_{t−1}) + (10^6−β)·b_{t−1}) DIV 10^6
    *   forecast(h) = l_T + h·b_T
    * }}}
    * with l₀ = y₀·10^6, b₀ = 0 — all BIGINT in ppm of a count unit,
    * truncations in exactly this order (Spark `DIV` ≡ DuckDB `//`
    * toward zero, negative trends included), so the recursive oracle
    * reproduces every intermediate bit-for-bit. No float ever enters:
    * the smoothing weights are ppm integers.
    *
    * The fold also carries the one-step BACKTEST: before consuming
    * y_t it charges `|y_t·10^6 − (l_{t−1} + b_{t−1})|` — the error of
    * the forecast the model would have issued — and reports the mean
    * as `backtest_mae_ppm` (NULL for single-period groups), so every
    * forecast ships with its own honesty metric.
    *
    * The recurrence is inherently sequential per group, so it runs as
    * ONE `aggregate()` fold over the group's ordered series — the
    * input contract is an ALREADY-AGGREGATED calendar-bounded series
    * (daily/hourly counts: ≤ a few thousand rows per group for a
    * decade of days), the q_changepoint convention; never raw events.
    * One partial-aggregated collect per group, one codegen'd fold, no
    * window, no driver round-trips.
    *
    * Overflow: (10^6−α)·(l+b) needs |l| ≤ ~9·10^6·10^6 ppm — counts to
    * ~9·10^6 per period at ppm scale; rescale the unit past that.
    *
    * @param horizons forecast steps emitted as `f<h>_ppm` columns
    * @return (groupCol, n_periods, level_ppm, trend_ppm, f<h>_ppm…)
    */
  def holtLinear(daily: DataFrame, groupCol: String, orderCol: String,
      valueCol: String, alphaPpm: Long = 300000L, betaPpm: Long = 200000L,
      horizons: Seq[Int] = Seq(1, 7)): DataFrame = {
    require(alphaPpm >= 0 && alphaPpm <= 1000000L,
      s"alphaPpm must be in [0, 1000000], got $alphaPpm")
    require(betaPpm >= 0 && betaPpm <= 1000000L,
      s"betaPpm must be in [0, 1000000], got $betaPpm")
    require(horizons.nonEmpty, "horizons must be non-empty")
    val ia = 1000000L - alphaPpm
    val ib = 1000000L - betaPpm
    // l_t spelled once and substituted into the b_t line (a lambda
    // cannot bind intermediates; the recompute is pure and codegen'd)
    val lt = s"($alphaPpm * x.v * 1000000 + $ia * (acc.l + acc.b)) DIV 1000000"
    val fold = s"""aggregate(
      slice(__s, 2, size(__s) - 1),
      named_struct('l', CAST(element_at(__s, 1).v * 1000000 AS BIGINT),
                   'b', CAST(0 AS BIGINT), 'e', CAST(0 AS BIGINT)),
      (acc, x) -> named_struct(
        'l', CAST($lt AS BIGINT),
        'b', CAST(($betaPpm * (($lt) - acc.l) + $ib * acc.b) DIV 1000000
          AS BIGINT),
        'e', CAST(acc.e + abs(x.v * 1000000 - (acc.l + acc.b)) AS BIGINT)))"""
    val base = daily
      .select(col(groupCol), struct(col(orderCol).as("o"),
        col(valueCol).cast("long").as("v")).as("__e"))
      .groupBy(col(groupCol))
      // calendar-bounded collect (see scaladoc): sorts by the order
      // key — one row per (group, period) by input contract
      .agg(array_sort(collect_list(col("__e"))).as("__s"))
      .select(col(groupCol), size(col("__s")).cast("long").as("n_periods"),
        expr(fold).as("__hw"))
    val fcols = horizons.map(h =>
      (col("__hw.l") + lit(h.toLong) * col("__hw.b")).as(s"f${h}_ppm"))
    base.select(Seq(col(groupCol), col("n_periods"),
      col("__hw.l").as("level_ppm"), col("__hw.b").as("trend_ppm")) ++
      fcols :+
      when(col("n_periods") === 1L, lit(null).cast("long"))
        .otherwise(expr("__hw.e DIV (n_periods - 1)"))
        .as("backtest_mae_ppm"): _*)
  }

  /** Time-weighted average per key over a LOCF timeline: each value
    * holds from its event until the next event, weighted by that
    * duration — the honest "average balance / average sensor reading"
    * when observations are irregular (a plain AVG over-weights bursty
    * periods). The last observation per key has no successor and
    * contributes no segment (open-ended intervals carry no weight).
    *
    * Exact integers end to end: `quant` is the caller's integral
    * quantization of the value (deci-units, cents, …), durations are
    * µs, and the final division truncates toward zero on BOTH engines
    * (Spark's `DIV` and DuckDB's integer `//` share that convention,
    * verified on negative numerators), so a negative value series
    * stays engine-exact.
    *
    * Shape at scale: one per-key window (lead) over the raw events —
    * key cardinality is data-scaled, the partition is one entity's
    * history — then one partial-aggregated groupBy(key).
    *
    * @param tieCol makes the per-key ordering total when timestamps
    *               collide (an event id / LSN)
    * @return (keyCol, n_segments, twa_q): the floor'd time-weighted
    *         average in `quant` units; keys whose observations all
    *         share one timestamp (zero total duration) are dropped
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, quant: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us"), col(tieCol))
    df.select(col(keyCol), unix_micros(col(tsCol)).as("__us"),
        col(tieCol), quant.cast("long").as("__q"))
      .withColumn("__dur", lead(col("__us"), 1).over(w) - col("__us"))
      .filter(col("__dur").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_segments"),
        sum(expr("__q * __dur")).as("__num"),
        sum(col("__dur")).as("__den"))
      .filter(col("__den") > 0)
      .select(col(keyCol), col("n_segments"),
        expr("__num DIV __den").as("twa_q"))
  }

  def aggState(df: DataFrame, keyCol: String, cents: Column): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(cents).as("total_cents"),
        min(cents).as("min_cents"), max(cents).as("max_cents"))

  /** Incremental aggregate-view maintenance: merge stored [[aggState]]
    * tables (yesterday's view + today's delta, or one per shard/region)
    * WITHOUT rescanning any base data — counts and sums add, mins and
    * maxes fold. The merge is itself one partial-aggregated `groupBy`
    * over #states × #keys rows, and because every field is algebraic
    * the result is bit-identical to a full recompute over the unioned
    * inputs — which is exactly what the oracle checks. (avg and
    * variance derive from (n, sum) / (n, sum, sum-of-squares) at read
    * time; never store a ratio, it doesn't merge.)
    */
  def mergeAggStates(keyCol: String, states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_ unionByName _)
      .groupBy(col(keyCol))
      .agg(sum(col("n")).as("n"), sum(col("total_cents")).as("total_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"))
  }
}
