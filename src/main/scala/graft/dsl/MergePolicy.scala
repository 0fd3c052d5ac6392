package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-field aggregation applied when multiple emitted rows share one
  * (table, join-key) — the reference's only aggregation mechanism
  * (instances.py:31-85, applied at executor.py:334-348).
  *
  * Compiled to built-in Catalyst aggregate functions over the traversal
  * ordinal, so the merge is a single hash aggregate with map-side partial
  * aggregation — arrival-order semantics ("last write", "append order")
  * are reproduced with `max_by`/`min_by`/ordered `collect_list` over the
  * `__g_ord` column rather than any row-at-a-time loop.
  */
sealed trait MergePolicy {

  /** Aggregate expression for this field.
    * @param value   the field value column
    * @param present true where the emitting traversal defines this field
    *                at all (absent fields must not overwrite — dict.update
    *                semantics, executor.py:272-281)
    * @param ord     packed `array<long>` ordinal; lexicographic order ==
    *                arrival order
    */
  def agg(value: Column, present: Column, ord: Column): Column
}

object MergePolicy {
  private def presentOrd(present: Column, ord: Column): Column =
    when(present, ord)

  /** Default: field-wise last-write-wins; an explicit null written later
    * DOES overwrite (dict.update), an absent field does not. */
  case object LastWrite extends MergePolicy {
    def agg(value: Column, present: Column, ord: Column): Column =
      max_by(value, presentOrd(present, ord))
  }

  /** (old or 0) + (new or 0); a lone value passes through unchanged, and
    * once a merge happens null counts as 0 (instances.py:36-38). */
  case object Add extends MergePolicy {
    def agg(value: Column, present: Column, ord: Column): Column = {
      val cnt = count(when(present, lit(1)))
      when(cnt === 0, lit(null))
        .when(cnt === 1, max_by(value, presentOrd(present, ord)))
        .otherwise(sum(when(present, coalesce(value, lit(0)))))
    }
  }

  /** Accumulate values into a list in arrival order; null appends nothing
    * (instances.py:41-44). Always yields an array (the reference keeps a
    * lone value scalar; a stable column type requires the array form). */
  case object Append extends MergePolicy {
    def agg(value: Column, present: Column, ord: Column): Column = {
      val pairs = collect_list(
        when(present && value.isNotNull, struct(ord.as("o"), value.as("v"))))
      transform(array_sort(pairs), p => p.getField("v"))
    }
  }

  /** Concatenate list values in arrival order; a scalar contributes a
    * single element (instances.py:47-55 — scalar emissions are wrapped to
    * 1-lists at union-alignment time in PipelineExecutor.mergeTable). */
  case object Extend extends MergePolicy {
    def agg(value: Column, present: Column, ord: Column): Column = {
      val asArray = value
      val pairs = collect_list(
        when(present && asArray.isNotNull, struct(ord.as("o"), asArray.as("v"))))
      flatten(transform(array_sort(pairs), p => p.getField("v")))
    }
  }

  /** Null-skipping minimum (instances.py:58-68). */
  case object Min extends MergePolicy {
    def agg(value: Column, present: Column, ord: Column): Column =
      min(when(present, value))
  }

  /** Null-skipping maximum (instances.py:70-80). */
  case object Max extends MergePolicy {
    def agg(value: Column, present: Column, ord: Column): Column =
      max(when(present, value))
  }

  /** Keep the first non-null seen, in arrival order (instances.py:83-85). */
  case object FirstNonNull extends MergePolicy {
    def agg(value: Column, present: Column, ord: Column): Column =
      min_by(value, when(present && value.isNotNull, ord))
  }

  /** User-defined ordered fold over all present values — the MergePolicy
    * plugin seam (instances.py:31-33). The values arrive as an
    * arrival-ordered array; fold them with Catalyst lambda functions
    * (`aggregate`), staying codegen'd.
    */
  final case class Fold(zero: Column, f: (Column, Column) => Column)
      extends MergePolicy {
    def agg(value: Column, present: Column, ord: Column): Column = {
      val pairs = collect_list(when(present, struct(ord.as("o"), value.as("v"))))
      val ordered = transform(array_sort(pairs), p => p.getField("v"))
      aggregate(ordered, zero, f)
    }
  }

  /** Arbitrary Scala merge as a REAL partially-aggregating UDAF — the
    * second half of the plugin seam. [[Fold]] collects every present
    * value into one array before folding (fine for small groups); a
    * `udaf(Aggregator[...])` keeps its own buffer and partially
    * aggregates map-side, so a custom merge scales like a built-in.
    *
    * The aggregator's input is a two-field case class `(o: Seq[Long],
    * v: T)` — the traversal ordinal plus the field value, passed as the
    * two UDAF arguments — and absent emissions arrive with a null `o`
    * (skip them in `reduce`). Order-sensitive merges compare `o`
    * lexicographically instead of assuming arrival order, because a
    * distributed aggregate sees values in any order.
    */
  final case class FromUdaf(
      f: org.apache.spark.sql.expressions.UserDefinedFunction)
      extends MergePolicy {
    def agg(value: Column, present: Column, ord: Column): Column =
      f(when(present, ord), value)
  }
}
