package graft.ops

import graft.SparkTestBase
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Unit-level semantics for the corpus operators on tiny inline data
  * (the sf-scale behavior is covered by the DuckDB-oracle queries).
  */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "the quick brown fox jumps over the lazy dog"), // dup of 1
    (4L, "completely different words entirely here now")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out === Array((1L, 1L, false), (2L, 2L, false), (3L, 1L, true), (4L, 4L, false)))
    assert(Dedup.dropExactDuplicates(docs, "doc_id", "text").count() === 3)
  }

  test("ngram jaccard finds near pairs, not unrelated docs") {
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    // 1-2 share 6/8 shingles (jaccard .6); 1-3 identical; 4 pairs with nobody
    assert(pairs === Array((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("minhash LSH candidates include identical docs, exclude disjoint") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
      .orderBy("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 3L))) // identical → all bands agree
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: identical docs hamming 0, near docs small, far docs large") {
    val sh = docs.select($"doc_id", Dedup.simhash16($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(4L)))
  }

  test("cosineTopK ranks an identical vector first") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.9f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(
      vecs.filter($"vec_id" === 1), vecs, "vec_id", "embedding", 3, k = 2)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(top === Array((2L, 1), (4L, 2)))
  }

  test("lsh buckets: identical vectors share a bucket") {
    val vecs = Seq(
      (1L, Array.fill(8)(1.0f)),
      (2L, Array.fill(8)(1.0f)),
      (3L, Array.fill(8)(-1.0f))
    ).toDF("vec_id", "embedding")
    val b = Similarity.lshBuckets(vecs, "vec_id", "embedding", 8, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(b(1L) === b(2L))
    assert(b(1L) !== b(3L))
  }

  test("text functions: tokens, fingerprint stability, langid fallback") {
    val out = Seq((1L, "the table scan  "), (2L, "zzz qqq"), (3L, ""))
      .toDF("doc_id", "text")
      .select(
        $"doc_id",
        TextFunctions.tokenCount($"text").as("n"),
        TextFunctions.fingerprint($"text").as("fp"),
        TextFunctions.argmaxLang($"text", CorpusQueries.LangProfiles).as("lang"))
      .orderBy($"doc_id").collect()
    assert(out(0).getInt(1) === 3)
    assert(out(0).getString(3) === "db") // 'table','scan' beat 'the'
    assert(out(1).getString(3) === "und")
    assert(out(1).getLong(2) !== out(0).getLong(2)) // fp differs
    assert(out(2).getInt(1) === 0)
  }
}
