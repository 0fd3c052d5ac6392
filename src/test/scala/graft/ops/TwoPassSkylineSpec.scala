package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** [[TwoPass.prefixMax]] against the single-partition window it
  * replaces, and [[Relational.skyline2d]] against the quadratic
  * dominance definition — the distributed spellings must be
  * value-identical to the textbook ones.
  */
class TwoPassSkylineSpec extends SparkTestBase {
  import spark.implicits._

  test("prefixMax == single-partition window max under random input") {
    val rnd = new Random(42)
    val rows = (1 to 500).map(i => (i.toLong, rnd.nextInt(1000).toLong))
    // many input partitions so cross-partition offsets actually matter
    val df = rows.toDF("k", "v").repartition(13)
    val got = TwoPass.prefixMax(df, Seq.empty, Seq(col("k")), col("v"), "m")
      .collect().map(r => r.getLong(0) -> Option(r.get(2)).map(_
        .asInstanceOf[Long])).toMap
    val w = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = rows.toDF("k", "v")
      .withColumn("m", max(col("v")).over(w))
      .collect().map(r => r.getLong(0) -> Option(r.get(2)).map(_
        .asInstanceOf[Long])).toMap
    assert(got === want)
    assert(got(1L).isEmpty) // first row: no predecessor, NULL not 0
  }

  test("prefixMax groups independently") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 3L), ("b", 1L, 9L), ("b", 2L, 1L))
      .toDF("g", "k", "v").repartition(4)
    val got = TwoPass.prefixMax(df, Seq("g"), Seq(col("k")), col("v"), "m")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(got === Map(("a", 1L) -> None, ("a", 2L) -> Some(5L),
      ("b", 1L) -> None, ("b", 2L) -> Some(9L)))
  }

  test("skyline2d == quadratic dominance filter under random input") {
    val rnd = new Random(7)
    val rows = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(50).toDouble, rnd.nextInt(50)))
    val df = rows.toDF("id", "x", "y").repartition(7)
    val got = Relational.skyline2d(df, "x", "y")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    // q dominates p: q.x <= p.x, q.y >= p.y, one strict
    val want = rows.filter { case (_, px, py) =>
      !rows.exists { case (_, qx, qy) =>
        qx <= px && qy >= py && (qx < px || qy > py)
      }
    }.map(_._1).toSet
    assert(got === want)
  }

  test("skyline2d: exact ties on both axes coexist on the frontier") {
    val df = Seq((1L, 1.0, 10), (2L, 1.0, 10), (3L, 2.0, 10), (4L, 0.5, 3))
      .toDF("id", "x", "y")
    val got = Relational.skyline2d(df, "x", "y")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    // 3 is dominated (same y, higher x); 4 survives (strictly cheaper,
    // lower y); the duplicate pair 1,2 both stay
    assert(got === Set(1L, 2L, 4L))
  }
}
