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

  // ---- tokenizer-scale gate: ≥ 8k merges. The documents fixture
  // merge-exhausts around 1k (window 2) / ~4k (window 3), so the 8k
  // budget trains on a SYNTHETIC wide-vocabulary corpus: 15,000
  // distinct md5-derived 12-hex-char words (deterministic, no RNG),
  // merge capacity ≈ Σ(len−1) ≫ 8k. Real tokenizers run 32k–100k; 8k
  // on a 15k vocab exercises the same regime (multi-character units,
  // near-full 64-candidate batches, thousands of rounds of the
  // identical acceptance rule) one order below, still driver-venue
  // test-sized.
  private def syntheticDocs = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val rows = (0 until 3000).map { i =>
      (i.toLong, (0 until 5).map(j => hex(s"$i-$j")).mkString(" "))
    }
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("doc_id", "text")
  }

  test("driver venue trains 8,192 merges on a synthetic 15k-word vocabulary") {
    val m = Corpus.bpeMerges(syntheticDocs, "doc_id", "text",
      merges = 8192, window = 1, batchCandidates = 64)
      .orderBy("rank").collect()
    assert(m.length === 8192, "merge budget not reached — exhausted early")
    assert(m.map(_.getInt(0)).toSeq === (1 to 8192))
    val pairs = m.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length === pairs.length)
    assert(m.forall(_.getLong(3) >= 1L))
  }

  test("driver venue trains 32,768 merges (production tokenizer scale; env-gated)") {
    // the real-tokenizer budget (GPT-2 ran 50k, many run 32k): ~512
    // batched rounds of the identical acceptance rule on the same
    // synthetic corpus (capacity Σ(len−1) = 165k ≫ 32k). Driver venue:
    // zero per-round Spark jobs — the ~4 min wall is pure merge
    // arithmetic, linear in the budget (the per-merge affected-slice
    // rewrite dominates; a larger candidate batch does not help).
    // Env-gated because those 4 minutes contend with the parallel
    // suites and push the whole `sbt test` wall past its 10-minute
    // budget; the 8,192 default gate above runs the identical chain at
    // a quarter of the depth, and this budget was run green three
    // times on 2026-08-16 (rank sequence dense 1..32768, all pairs
    // distinct, every snapshot count positive). Run with
    // GRAFT_BPE_SCALE_FULL=1 sbt test (or testOnly this suite).
    assume(sys.env.contains("GRAFT_BPE_SCALE_FULL"),
      "set GRAFT_BPE_SCALE_FULL=1 to run the 32k-merge gate (~4 min)")
    val m = Corpus.bpeMerges(syntheticDocs, "doc_id", "text",
      merges = 32768, window = 1, batchCandidates = 64)
      .orderBy("rank").collect()
    assert(m.length === 32768, "merge budget not reached — exhausted early")
    assert(m.map(_.getInt(0)).toSeq === (1 to 32768))
    val pairs = m.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length === pairs.length)
    assert(m.forall(_.getLong(3) >= 1L))
  }

  test("distributed venue replays the synthetic-corpus chain prefix") {
    val budget = 48
    val dist = Corpus.bpeMerges(syntheticDocs, "doc_id", "text",
      merges = budget, window = 1, driverVocabMax = 0,
      batchCandidates = 64).orderBy("rank").collect()
    val local = Corpus.bpeMerges(syntheticDocs, "doc_id", "text",
      merges = budget, window = 1, batchCandidates = 64)
      .orderBy("rank").collect()
    assert(dist.length === budget)
    assert(dist.map(_.toSeq).toSeq === local.map(_.toSeq).toSeq)
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
