package graft.ops

import graft.SparkTestBase

/** Tokenizer-scale BPE: 2,048 merges — past the corpus's window-2
  * merge-capacity ceiling (1,045) and past what the chained-CTE DuckDB
  * oracle can carry (superlinear in rounds × slots; see the ceiling
  * scaladoc in CorpusQueries). Trains at window 3 (~7.5k
  * distinct pretokens, capacity > 4k) with a 64-candidate batch and
  * proves the run three ways: the budget is actually reachable (no
  * silent truncation), the merge table is well-formed, and the
  * DISTRIBUTED venue replays the identical acceptance chain at the
  * same (window, batch) configuration — the venue-equality axis the
  * oracle usually provides. */
class BpeScaleSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("driver venue trains 2,048 merges at window 3 / batch 64") {
    val m = Corpus.bpeMerges(docs, "doc_id", "text",
      merges = 2048, window = 3, batchCandidates = 64)
      .orderBy("rank").collect()
    assert(m.length === 2048, "merge budget not reached — exhausted early")
    // dense 1..n ranks, no duplicate merge pair (a duplicate would mean
    // a pair survived its own replace)
    assert(m.map(_.getInt(0)).toSeq === (1 to 2048))
    val pairs = m.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length === pairs.length)
    // every snapshot count is a positive corpus count
    assert(m.forall(_.getLong(3) >= 1L))
  }

  test("distributed venue replays the same chain at window 3 / batch 64") {
    // driverVocabMax=0 forces the per-round Spark loop; a small budget
    // keeps its one-roundtrip-per-round cost test-sized. Equality of
    // the PREFIX proves the two venues run one algorithm at the new
    // (window, batchCandidates) configuration — budget truncation cuts
    // at the same rank in both because the round structure is shared.
    val budget = 48
    val dist = Corpus.bpeMerges(docs, "doc_id", "text",
      merges = budget, window = 3, driverVocabMax = 0,
      batchCandidates = 64).orderBy("rank").collect()
    val local = Corpus.bpeMerges(docs, "doc_id", "text",
      merges = 2048, window = 3, batchCandidates = 64)
      .orderBy("rank").limit(budget).collect()
    assert(dist.length === budget)
    assert(dist.map(_.toSeq).toSeq === local.map(_.toSeq).toSeq)
  }
}
