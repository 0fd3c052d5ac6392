package graft.dsl

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: for random write sequences, every merge policy matches
  * a row-at-a-time Scala reference model (the reference engine's
  * semantics re-implemented literally). One pipeline per case evaluates
  * all policies as parallel fields, so each generated dataset exercises
  * grouping, ordinal ordering, and all aggregates at once.
  */
class MergePropertySpec extends SparkTestBase {
  import transforms._

  private val rowGen: Gen[(String, Option[Int])] = for {
    k <- Gen.oneOf("a", "b", "c")
    v <- Gen.option(Gen.choose(-5, 20))
  } yield (k, v)

  private val seqGen: Gen[List[(String, Option[Int])]] =
    Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, rowGen))

  /** The reference-model merge per key, arrival order. */
  private def model(rows: List[Option[Int]]): Map[String, Any] = {
    val nonNull = rows.flatten
    Map(
      "last" -> rows.last.orNull,
      "add" -> (if (rows.size == 1) rows.head.orNull
                else rows.map(_.getOrElse(0)).sum),
      "lo" -> (if (nonNull.isEmpty) null else nonNull.min),
      "hi" -> (if (nonNull.isEmpty) null else nonNull.max),
      "first_nn" -> nonNull.headOption.orNull,
      "appended" -> nonNull)
  }

  test("all merge policies match the row-at-a-time model on random writes") {
    val prop = Prop.forAll(seqGen) { rows =>
      val json = rows.map { case (k, v) =>
        s"""{"id": "$k", "v": ${v.map(_.toString).getOrElse("null")}}"""
      }.mkString("""{"rows": [""", ", ", "]}")

      val out = Etl.json(spark, json)
        .goto("rows").each()
        .mapTo("t", joinOn = Seq("id"))(
          "id" -> get("id"),
          Field("last", get("v")),
          Field("add", get("v"), policy = MergePolicy.Add),
          Field("lo", get("v"), policy = MergePolicy.Min),
          Field("hi", get("v"), policy = MergePolicy.Max),
          Field("first_nn", get("v"), policy = MergePolicy.FirstNonNull),
          Field("appended", get("v"), policy = MergePolicy.Append))
        .run().tableOrdered("t").collect()
        .map(r => r.getString(0) -> r).toMap

      val expected = rows.groupBy(_._1).map { case (k, ws) =>
        k -> model(ws.map(_._2))
      }

      expected.forall { case (k, m) =>
        val r = out(k)
        def l(i: Int): Any = if (r.isNullAt(i)) null else r.getLong(i)
        l(1) == toL(m("last")) &&
          l(2) == toL(m("add")) &&
          l(3) == toL(m("lo")) &&
          l(4) == toL(m("hi")) &&
          l(5) == toL(m("first_nn")) &&
          r.getSeq[Long](6).toList == m("appended").asInstanceOf[List[Int]].map(_.toLong)
      } && out.keySet == expected.keySet
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  private def toL(a: Any): Any = a match {
    case i: Int => i.toLong
    case other => other
  }
}
