package graft.dsl

import graft.SparkTestBase
import org.apache.spark.sql.functions.{concat => fconcat, _}

/** Merge-policy semantics matrix (reference: tests/test_instances.py). */
class MergePolicySpec extends SparkTestBase {
  import transforms._

  // Three emissions of the same key with values 5, null, 3 (arrival order),
  // plus a key seen only once with value 7, plus a key whose values are all
  // null.
  private val j =
    """{"batches": [
      |  {"rows": [{"id": "a", "v": 5},   {"id": "b", "v": 7}, {"id": "c", "v": null}]},
      |  {"rows": [{"id": "a", "v": null}, {"id": "c", "v": null}]},
      |  {"rows": [{"id": "a", "v": 3}]}
      |]}""".stripMargin

  private def run(policy: MergePolicy) =
    rows(Etl.json(spark, j)
      .goto("batches").each().goto("rows").each()
      .mapTo("t", joinOn = Seq("id"))(
        "id" -> get("id"),
        Field("v", get("v"), policy = policy))
      .run().tableOrdered("t"))

  test("default last-write-wins: explicit null overwrites") {
    assert(run(MergePolicy.LastWrite) ===
      Seq(Seq("a", 3L), Seq("b", 7L), Seq("c", null)))
  }

  test("AddPolicy: null counts as 0 once merging, lone value passes through") {
    assert(run(MergePolicy.Add) ===
      Seq(Seq("a", 8L), Seq("b", 7L), Seq("c", 0L)))
  }

  test("AppendPolicy: arrival order, nulls append nothing") {
    assert(run(MergePolicy.Append) ===
      Seq(Seq("a", Seq(5L, 3L)), Seq("b", Seq(7L)), Seq("c", Seq())))
  }

  test("Min / Max skip nulls") {
    assert(run(MergePolicy.Min) ===
      Seq(Seq("a", 3L), Seq("b", 7L), Seq("c", null)))
    assert(run(MergePolicy.Max) ===
      Seq(Seq("a", 5L), Seq("b", 7L), Seq("c", null)))
  }

  test("FirstNonNull keeps first non-null in arrival order") {
    assert(run(MergePolicy.FirstNonNull) ===
      Seq(Seq("a", 5L), Seq("b", 7L), Seq("c", null)))
  }

  test("ExtendPolicy concatenates lists in arrival order") {
    val jj =
      """{"batches": [
        |  {"rows": [{"id": "a", "vs": [1, 2]}]},
        |  {"rows": [{"id": "a", "vs": [3]}, {"id": "b", "vs": []}]}
        |]}""".stripMargin
    val out = rows(Etl.json(spark, jj)
      .goto("batches").each().goto("rows").each()
      .mapTo("t", joinOn = Seq("id"))(
        "id" -> get("id"),
        Field("vs", get("vs"), policy = MergePolicy.Extend))
      .run().tableOrdered("t"))
    assert(out === Seq(Seq("a", Seq(1L, 2L, 3L)), Seq("b", Seq())))
  }

  test("custom Fold policy: ordered user-defined merge stays declarative") {
    // string-concat fold proves arrival order reaches the lambda
    val jj =
      """{"rows": [{"id": "a", "s": "x"}, {"id": "a", "s": "y"}, {"id": "a", "s": "z"}]}"""
    val out = rows(Etl.json(spark, jj)
      .goto("rows").each()
      .mapTo("t", joinOn = Seq("id"))(
        "id" -> get("id"),
        Field("s", get("s"), policy = MergePolicy.Fold(
          lit(""), (acc, v) => fconcat(acc, coalesce(v, lit(""))))))
      .run().tableOrdered("t"))
    assert(out === Seq(Seq("a", "xyz")))
  }

  test("within-one-traversal merging also applies policies") {
    val jj = """{"rows": [{"id": "a", "v": 1}, {"id": "a", "v": 2}]}"""
    val out = rows(Etl.json(spark, jj)
      .goto("rows").each()
      .mapTo("t", joinOn = Seq("id"))(
        "id" -> get("id"),
        Field("v", get("v"), policy = MergePolicy.Add))
      .run().tableOrdered("t"))
    assert(out === Seq(Seq("a", 3L)))
  }
}
