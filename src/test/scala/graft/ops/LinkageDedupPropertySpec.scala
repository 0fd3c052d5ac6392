package graft.ops

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Equivalence properties for the scale-path dedup variants: each fast
  * construction must agree with its straightforward reference on random
  * inputs — small alphabets on purpose, so near-misses, ties and exact
  * collisions all occur.
  */
class LinkageDedupPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), p)
    assert(r.passed, r.status.toString)
  }

  test("recordLinkageFast == quadratic recordLinkage at maxDist=1") {
    val nameGen = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))).map(_.mkString)
    val recGen = for {
      blk <- Gen.oneOf("e", "w")
      nm <- nameGen
    } yield (blk, nm)
    val corpusGen = Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, recGen))
    check(Prop.forAll(corpusGen) { recs =>
      val df = recs.zipWithIndex.map { case ((b, nm), i) => (i.toLong, b, nm) }
        .toDF("rid0", "blk", "nm")
      def pairs(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      pairs(Dedup.recordLinkageFast(df, "rid0", $"blk", "nm")) ==
        pairs(Dedup.recordLinkage(df, "rid0", $"blk", "nm", 1))
    })
  }

  test("semanticDedup survivor rule matches a brute-force in-cluster model") {
    // fixed tiny corpora (k-means is driver-iterated — keep rounds small);
    // randomness is in the vectors, clusters emerge from the data
    val vecGen = Gen.listOfN(4, Gen.choose(1, 9)).map(_.map(_.toDouble))
    val corpusGen = Gen.choose(3, 8).flatMap(n => Gen.listOfN(n, vecGen))
    check(Prop.forAll(corpusGen) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val out = Dedup.semanticDedup(df, "vec_id", "embedding", dim = 4,
        k = 2, iters = 1, threshold = 0.995)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      val byId = out.map(r => r._1 -> r).toMap
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      // model: dup iff a lower-id vector in the SAME reported cluster is
      // within the threshold (uses the operator's own cluster assignment —
      // the property pins the survivor rule given any clustering)
      out.forall { case (id, cid, isDup) =>
        val expected = out.exists { case (o, ocid, _) =>
          o < id && ocid == cid && cos(vecs(o.toInt), vecs(id.toInt)) >= 0.995
        }
        expected == isDup && byId(id)._2 == cid
      }
    })
  }
}
