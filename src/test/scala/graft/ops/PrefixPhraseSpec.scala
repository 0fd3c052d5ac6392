package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Properties the oracle rows can't state: prefix filtering loses no
  * pair (exactness vs an in-test brute force), and phrase occurrence
  * counting is correct under self-overlap (repeated phrase words).
  */
class PrefixPhraseSpec extends SparkTestBase {
  import spark.implicits._

  private def shingleSet(text: String): Set[String] =
    text.split("\\s+").filter(_.nonEmpty).toSeq.sliding(3)
      .filter(_.size == 3).map(_.mkString(" ")).toSet

  private def bruteforce(docs: Seq[(Long, String)], t: Double): Set[(Long, Long)] =
    (for {
      (i, ti) <- docs; (j, tj) <- docs if i < j
      a = shingleSet(ti); b = shingleSet(tj)
      if a.nonEmpty && b.nonEmpty
      jac = (a & b).size.toDouble / (a | b).size.toDouble
      if jac >= t
    } yield (i, j)).toSet

  test("prefix filtering returns exactly the brute-force pair set") {
    // near-dups, partial overlaps, disjoint docs, and a universal
    // boilerplate run shared by everyone (the no-df-cap case)
    val boiler = "all rights reserved by the site"
    val docs = Seq(
      1L -> s"the quick brown fox jumps over the lazy dog $boiler",
      2L -> s"the quick brown fox jumps over the lazy cat $boiler",
      3L -> s"a completely different set of words entirely here $boiler",
      4L -> s"the quick brown fox jumps over the lazy dog $boiler",
      5L -> s"another unrelated document with its own phrasing $boiler")
    val got = Dedup.prefixFilterPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, thresholdPpm = 400000L)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got === bruteforce(docs, 0.4))
  }

  test("reported jaccard is the exact set similarity") {
    val docs = Seq(
      1L -> "w1 w2 w3 w4 w5 w6",
      2L -> "w1 w2 w3 w4 x5 x6").toDF("doc_id", "text")
    // shingle sets: 4 each, 2 shared -> J = 2/6
    val r = Dedup.prefixFilterPairs(docs, "doc_id", "text",
      n = 3, thresholdPpm = 300000L).collect()
    assert(r.length === 1)
    assert(math.abs(r(0).getAs[Double]("jaccard") - 2.0 / 6.0) < 1e-12)
  }

  test("weighted-cosine prefix join equals the brute-force pair set") {
    val boiler = "all rights reserved by the site"
    val docs = Seq(
      1L -> s"the quick brown fox jumps over the lazy dog $boiler",
      2L -> s"the quick brown fox jumps over the lazy cat $boiler",
      3L -> s"a completely different set of words entirely here $boiler",
      4L -> s"the quick brown fox jumps over the lazy dog $boiler",
      5L -> s"another unrelated document with its own phrasing $boiler")
    // in-test brute force with the operator's exact integer weights
    val sets = docs.map { case (i, t) => i -> shingleSet(t) }.toMap
    val nd = docs.size.toLong
    val dfc = sets.values.flatten.toSeq.groupBy(identity).map {
      case (s, xs) => s -> xs.size.toLong
    }
    def w2(s: String): Long = { val w = math.min(nd / dfc(s), 1000L); w * w }
    val norms = sets.map { case (i, ss) => i -> ss.toSeq.map(w2).sum }
    val expect = (for {
      (i, _) <- docs; (j, _) <- docs if i < j
      dot = (sets(i) & sets(j)).toSeq.map(w2).sum
      if BigInt(dot) * dot * 100 >= BigInt(norms(i)) * norms(j) * 49
    } yield (i, j)).toSet
    assert(expect.nonEmpty)
    val got = Dedup.cosinePrefixPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, p = 7, q = 10)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(got === expect)
    // rarity weighting: the all-boilerplate-overlap pair (1,3) scores
    // far below identical docs (1,4)
    val cos = Dedup.cosinePrefixPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, p = 1, q = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(cos((1L, 4L)) - 1.0) < 1e-12)
    assert(cos((1L, 3L)) < 0.2)
  }

  test("phrase occurrences count self-overlapping repeats") {
    // "a a" occurs at positions 1 and 2 of "a a a" (overlapping)
    val docs = Seq(1L -> "a a a b", 2L -> "a b a b").toDF("doc_id", "text")
    val r = Corpus.phraseSearchTopK(docs, "doc_id", "text", "a a", k = 10)
      .orderBy("rank").collect()
    assert(r.map(x => (x.getAs[Long]("doc"), x.getAs[Long]("occurrences"))).toSeq
      === Seq((1L, 2L)))
  }

  test("three-word phrase requires full adjacency in order") {
    val docs = Seq(
      1L -> "x hash join probe y hash join probe",
      2L -> "hash probe join",
      3L -> "hash join z probe").toDF("doc_id", "text")
    val r = Corpus.phraseSearchTopK(docs, "doc_id", "text", "hash join probe", k = 5)
      .collect()
    assert(r.map(x => (x.getAs[Long]("doc"), x.getAs[Long]("occurrences"))).toSeq
      === Seq((1L, 2L)))
  }
}
