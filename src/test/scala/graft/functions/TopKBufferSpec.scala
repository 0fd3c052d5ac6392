package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the k-capped buffer (arbitrary add order, arbitrary
  * partial splits merged) always yields exactly the brute-force top-k by
  * (score desc, id asc) — the invariant the map-side partial aggregation
  * depends on.
  */
class TopKBufferSpec extends AnyFunSuite {

  private val entryGen: Gen[(Double, Long)] = for {
    s <- Gen.choose(0, 30).map(_ / 10.0) // coarse scores force ties
    i <- Gen.choose(0L, 50L)
  } yield (s, i)

  private val caseGen: Gen[(Int, List[(Double, Long)], Int)] = for {
    k <- Gen.choose(1, 8)
    n <- Gen.choose(0, 40)
    xs <- Gen.listOfN(n, entryGen)
    split <- Gen.choose(0, n)
  } yield (k, xs.distinct, split)

  private def bruteTopK(xs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    xs.sortBy { case (s, i) => (-s, i) }.take(k)

  test("buffer + partial merge == brute-force top-k under random inputs") {
    val prop = Prop.forAll(caseGen) { case (k, xs, split) =>
      val (left, right) = xs.splitAt(split)
      val b1 = new TopKBuffer(k)
      left.foreach { case (s, i) => b1.add(s, i) }
      val b2 = new TopKBuffer(k)
      right.foreach { case (s, i) => b2.add(s, i) }
      // merge partials exactly as TopKByScore.merge does
      (0 until b2.size).foreach(i => b1.add(b2.scores(i), b2.ids(i)))
      b1.sortedEntries.toList == bruteTopK(xs, k)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("NaN scores never enter and never block real candidates") {
    val b = new TopKBuffer(2)
    b.add(Double.NaN, 1L) // would freeze the buffer if admitted:
    b.add(Double.NaN, 2L) // losesTo() is false for every NaN comparison
    b.add(0.5, 3L)
    b.add(0.9, 4L)
    b.add(0.7, 5L)
    assert(b.sortedEntries.toList === List((0.9, 4L), (0.7, 5L)))
  }
}
