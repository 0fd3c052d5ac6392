package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics the oracle row (which pins one SF's exact output) cannot
  * state: the epoch expansion CONVERGES to the plan's per-source token
  * targets, and repeat factors below one thin deterministically.
  */
class EpochExpandSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(nPerSource: Int) =
    (0 until 3).flatMap { s =>
      (0 until nPerSource).map { i =>
        (s.toLong * 10000 + i, s"src$s", "tok " * 20 + s"w$i")
      }
    }.toDF("doc_id", "source", "text")

  test("expanded token mass approaches each source's planned target") {
    val docs = corpus(400) // 400 docs x 21 tokens = 8400 tokens/source
    val weights = Seq("src0" -> 100000, "src1" -> 300000, "src2" -> 600000)
    val budget = 50000L
    val expanded = Corpus.epochExpand(docs, "source", "doc_id", "text",
      weights, budget)
    // every emitted copy carries the doc's 21 tokens
    val got = expanded.groupBy("source").agg(count(lit(1)).as("n_copies"))
      .collect().map(r => r.getString(0) -> r.getLong(1) * 21).toMap
    weights.foreach { case (src, ppm) =>
      val target = budget * ppm / 1000000L
      val tokens = got.getOrElse(src, 0L)
      // hash thinning is per-doc Bernoulli on the fractional epoch: with
      // ~400 candidate docs a 5% tolerance is ~3 sigma of slack
      assert(math.abs(tokens - target) <= target / 20,
        s"$src: expanded $tokens tokens vs target $target")
    }
  }

  test("a sub-1000-milli repeat factor thins rather than drops a source") {
    val docs = corpus(200)
    // tiny budget: every repeat factor lands below one epoch
    val weights = Seq("src0" -> 333333, "src1" -> 333333, "src2" -> 333334)
    val expanded = Corpus.epochExpand(docs, "source", "doc_id", "text",
      weights, budgetTokens = 3000L)
    val per = expanded.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per.keySet === Set("src0", "src1", "src2"))
    per.foreach { case (src, n) =>
      assert(n > 0 && n < 200, s"$src kept $n of 200 — expected a thinning")
    }
  }

  test("expansion is deterministic under repartitioning") {
    val docs = corpus(100)
    val weights = Seq("src0" -> 500000, "src1" -> 300000, "src2" -> 200000)
    val a = rows(Corpus.epochExpand(docs, "source", "doc_id", "text",
      weights, 20000L).orderBy("doc_id", "epoch"))
    val b = rows(Corpus.epochExpand(docs.repartition(13), "source", "doc_id",
      "text", weights, 20000L).orderBy("doc_id", "epoch"))
    assert(a === b)
  }
}
