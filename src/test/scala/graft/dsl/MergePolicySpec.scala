package graft.dsl

import graft.SparkTestBase
import org.apache.spark.sql.functions.{concat => fconcat, _}

/** Input row shape for the FromUdaf seam: traversal ordinal + value
  * (top-level so Spark can derive an Encoder). */
case class UdafIn(o: Seq[Long], v: String)

/** Pure-Scala last-write merge as an Aggregator: keeps the (ordinal,
  * value) pair with the lexicographically largest ordinal — order-safe
  * under partial aggregation because it compares ordinals, never assumes
  * arrival order. Absent emissions arrive with a null ordinal and are
  * skipped. */
object LastWriteAgg
    extends org.apache.spark.sql.expressions.Aggregator[UdafIn, UdafIn, String] {
  import scala.math.Ordering.Implicits.seqOrdering
  override def zero: UdafIn = UdafIn(null, null)
  override def reduce(b: UdafIn, a: UdafIn): UdafIn =
    if (a == null || a.o == null) b else if (b.o == null) a
    else if (seqOrdering[Seq, Long].gteq(a.o, b.o)) a else b
  override def merge(b1: UdafIn, b2: UdafIn): UdafIn = reduce(b1, b2)
  override def finish(r: UdafIn): String = if (r.o == null) null else r.v
  override def bufferEncoder: org.apache.spark.sql.Encoder[UdafIn] =
    org.apache.spark.sql.Encoders.product[UdafIn]
  override def outputEncoder: org.apache.spark.sql.Encoder[String] =
    org.apache.spark.sql.Encoders.STRING
}

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

  test("FromUdaf: arbitrary Scala Aggregator merges with partial aggregation") {
    val jj =
      """{"rows": [{"id": "a", "s": "x"}, {"id": "a", "s": "y"}, {"id": "a", "s": "z"},
        |          {"id": "b", "s": "q"}]}""".stripMargin
    val policy = MergePolicy.FromUdaf(udaf(LastWriteAgg))
    val out = rows(Etl.json(spark, jj)
      .goto("rows").each()
      .mapTo("t", joinOn = Seq("id"))(
        "id" -> get("id"),
        Field("s", get("s"), policy = policy))
      .run().tableOrdered("t"))
    // pure-Scala last-write equals the built-in LastWrite semantics
    assert(out === Seq(Seq("a", "z"), Seq("b", "q")))
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
