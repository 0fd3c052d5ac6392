package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream: for a step sequence
  * (signup → click → purchase), find each user's first time reaching each
  * step, where step i counts only at a strictly later timestamp than the
  * user's step i-1 time. The standard product-analytics conversion query.
  *
  * Single-shuffle design: filter to the step types map-side, group by
  * user, sort each user's (ts, type) events in memory, and FOLD through
  * them once with the `aggregate` higher-order function carrying one
  * nullable timestamp per step as the state. First-qualifying-in-time-
  * order equals min-qualifying, so the fold reproduces the chained
  * "MIN(ts) WHERE ts > previous step" SQL exactly — without the k
  * self-joins (and k shuffles) the SQL formulation pays. Per-user state
  * is k timestamps; the sorted event array is bounded by that user's
  * event count (cap power users upstream with [[Corpus.capPerGroup]] if
  * a key can exceed memory).
  */
object Funnel {

  /** Per-user step-completion times: one row per user who reached step 0,
    * columns `t_<step>` (null = never reached). */
  def stepTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGapSeconds: Option[Long] = None): DataFrame = {
    val relevant = events
      .filter(col(typeCol).isin(steps.map(lit): _*))
      .select(col(userCol), col(tsCol).as("__ts"), col(typeCol).as("__tp"))
    relevant.groupBy(col(userCol)).agg(stepFold(steps, maxGapSeconds).as("__fold"))
      .select(col(userCol) +:
        steps.zipWithIndex.map { case (st, i) =>
          col(s"__fold.t$i").as(s"t_$st")
        }: _*)
      .filter(col(s"t_${steps.head}").isNotNull)
  }

  /** The per-key funnel FOLD as a reusable aggregate Column over input
    * columns `__ts` (timestamp) / `__tp` (step name): sorted collect +
    * one `aggregate` HOF pass carrying a nullable first-reach time per
    * step. Split out of [[stepTimes]] so the state-evicting streaming
    * form can key the SAME fold by (event-time window, user) — the
    * grouping is the caller's, the semantics are shared. Struct fields
    * are `t0..t(k-1)` in step order; `t_i` non-null implies `t_(i-1)`
    * non-null. */
  private[graft] def stepFold(steps: Seq[String],
      maxGapSeconds: Option[Long] = None): Column = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"steps must be distinct, got $steps")
    require(maxGapSeconds.forall(_ >= 1),
      s"maxGapSeconds must be >= 1, got $maxGapSeconds")
    val sortedEvents = array_sort(
      collect_list(struct(col("__ts"), col("__tp"))))
    val init = struct(
      steps.indices.map(i => lit(null).cast("timestamp").as(s"t$i")): _*)
    aggregate(sortedEvents, init, (acc, e) => {
      val fields = steps.zipWithIndex.map { case (st, i) =>
        val qualifies =
          if (i == 0) e.getField("__tp") === st
          else {
            val after = acc.getField(s"t${i - 1}").isNotNull &&
              e.getField("__tp") === st &&
              e.getField("__ts") > acc.getField(s"t${i - 1}")
            // windowed funnel: step i must land within the gap of the
            // user's FIRST step i-1 time (the chained-greedy contract —
            // same semantics as the oracle's MIN-chain with the bound).
            // Compared at MICROSECOND precision: cast-to-long would
            // floor to seconds and disagree with an interval compare.
            maxGapSeconds.fold(after)(g => after &&
              unix_micros(e.getField("__ts")) <=
                unix_micros(acc.getField(s"t${i - 1}")) + g * 1000000L)
          }
        coalesce(acc.getField(s"t$i"),
          when(qualifies, e.getField("__ts"))).as(s"t$i")
      }
      struct(fields: _*)
    })
  }

  /** Next-event-prediction training examples from per-user event
    * sequences — the behavioral analog of sliding-window RAG chunking:
    * each user's events are ordered once (ts, then an id column for
    * total determinism), and every length-`context` window emits one
    * (context, target) example where the target is the event that
    * followed. Users with ≤ `context` events emit nothing; the example
    * count per user is n − context.
    *
    * Scale shape: ONE shuffle on the user key into an in-memory sort of
    * that user's events, windows carved from the one materialized array
    * (map-only explode). Per-user state is that user's event count —
    * cap power users upstream (e.g. [[Corpus.capPerGroup]]) if a key
    * can exceed memory, same contract as [[stepTimes]].
    *
    * @return (userCol, example_id, context: array<string>, target)
    */
  def nextEventExamples(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, context: Int): DataFrame = {
    require(context >= 1, s"context must be >= 1, got $context")
    val seq0 = events
      .groupBy(col(userCol))
      .agg(transform(
        array_sort(collect_list(
          struct(col(tsCol).as("t"), col(idCol).as("i"),
            col(typeCol).as("e")))),
        s => s.getField("e")).as("__seq"))
    val m = greatest(size(col("__seq")).cast("long") - context, lit(0L))
    seq0
      .select(col(userCol),
        explode(when(m > 0, sequence(lit(0L), m - 1))
          .otherwise(array().cast("array<bigint>"))).as("example_id"),
        col("__seq"))
      .select(col(userCol), col("example_id"),
        slice(col("__seq"), (col("example_id") + 1).cast("int"),
          lit(context)).as("context"),
        element_at(col("__seq"),
          (col("example_id") + context + 1).cast("int")).as("target"))
  }

  /** Funnel conversion counts: (step ordinal, step name, users reaching
    * it). One extra single-row aggregate over [[stepTimes]]. */
  def conversionCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      maxGapSeconds: Option[Long] = None): DataFrame =
    conversionCountsFromStepTimes(
      stepTimes(events, userCol, tsCol, typeCol, steps, maxGapSeconds), steps)

  /** The counting tail over an ALREADY-MATERIALIZED step-times table —
    * split out so the streaming form can drain [[stepTimes]] (its one
    * allowed streaming aggregation) and count batch-side. */
  def conversionCountsFromStepTimes(st: DataFrame,
      steps: Seq[String]): DataFrame = {
    val counts = st.agg(
      count(col(s"t_${steps.head}")).as("c0"),
      steps.tail.zipWithIndex.map { case (s, i) =>
        count(col(s"t_$s")).as(s"c${i + 1}")
      }: _*)
    counts.select(explode(array(
      steps.zipWithIndex.map { case (s, i) =>
        struct(lit(i + 1).as("step"), lit(s).as("event_type"),
          col(s"c$i").as("users"))
      }: _*)).as("r"))
      .select(col("r.step"), col("r.event_type"), col("r.users"))
  }
}
