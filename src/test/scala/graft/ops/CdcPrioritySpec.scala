package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The CDC re-synchronization property (the reason content-defined
  * boundaries exist) and the priority sample's incremental-stability
  * contract — neither is expressible as one oracle row.
  */
class CdcPrioritySpec extends SparkTestBase {
  import spark.implicits._

  /** All (chunk_hash) values of a single doc, via the duplicate report
    * on (doc, doc-copy) — a doc paired with an identical twin reports
    * every one of its chunks. */
  private def chunkSet(text: String): Set[String] =
    Dedup.cdcChunkDuplicates(
      Seq((1L, text), (2L, text)).toDF("doc_id", "text"),
      "doc_id", "text", divisor = 4)
      .select("chunk_hash").as[String].collect().toSet

  test("an early insertion re-synchronizes: later chunks survive") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val edited = "INSERTED " + base
    val a = chunkSet(base)
    val b = chunkSet(edited)
    // all chunks after the first content-defined boundary are identical,
    // so the overlap is nearly everything — require a strong majority
    val shared = a.intersect(b).size
    assert(shared >= a.size - 2,
      s"only $shared of ${a.size} chunks survived a 1-token prefix edit")
    assert(a !== b) // the edited head chunk does differ
  }

  /** Same boundary rule as the operator: first 14 hex chars of md5 mod
    * divisor == 0. */
  private def isBoundary(tok: String, divisor: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString.take(14)
    java.lang.Long.parseLong(hex, 16) % divisor == 0
  }

  test("duplicate report counts distinct docs AND occurrences") {
    val div = 4
    // one known boundary token ends each chunk; run tokens are
    // non-boundaries, so "run b" is one exact chunk wherever it appears
    val b = (1 to 1000).map(i => s"b$i").find(isBoundary(_, div)).get
    val run = (1 to 40).map(i => s"w$i").filterNot(isBoundary(_, div))
      .take(5).mkString(" ")
    val docs = Seq(
      (1L, s"$run $b $run $b"), // chunk "run b" twice
      (2L, s"$run $b")).toDF("doc_id", "text")
    val r = Dedup.cdcChunkDuplicates(docs, "doc_id", "text", divisor = div)
      .collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_docs") === 2L)
    assert(r(0).getAs[Long]("n_occ") === 3L)
    assert(r(0).getAs[Long]("n_tokens") === 6L)
  }

  test("priority sample is stable under growth (only displacement)") {
    def docs(n: Int) = (1 to n).map(i =>
      (i.toLong, (1 to (i % 7) + 3).map(j => s"t${i}_$j").mkString(" ")))
    val small = Corpus.prioritySample(docs(40).toDF("doc_id", "text"),
      "doc_id", "text", k = 10).select("doc").as[Long].collect().toSet
    val big = Corpus.prioritySample(docs(80).toDF("doc_id", "text"),
      "doc_id", "text", k = 10).select("doc").as[Long].collect().toSet
    // growing the corpus can only displace members, never reorder the
    // survivors: the big sample's members drawn from the first 40 docs
    // must be a subset of the small sample
    assert(big.filter(_ <= 40).subsetOf(small))
  }

  test("priority sample is deterministic under repartitioning") {
    val d = (1 to 50).map(i => (i.toLong, s"a b c d e f")).toDF("doc_id", "text")
    val r1 = Corpus.prioritySample(d.repartition(7), "doc_id", "text", 5)
      .collect().map(_.toSeq)
    val r2 = Corpus.prioritySample(d.coalesce(1), "doc_id", "text", 5)
      .collect().map(_.toSeq)
    assert(r1.toSeq === r2.toSeq)
  }
}
