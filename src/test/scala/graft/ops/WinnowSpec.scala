package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The winnowing guarantee the oracle row can't state: any two docs
  * sharing a token run of length >= w + k - 1 share at least one
  * selected fingerprint (Schleimer et al. 2003, Thm 1).
  */
class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  /** The selected fingerprint set of one doc, re-derived with the same
    * arithmetic the operator uses (winnowing is per-doc, so a
    * single-doc run selects the identical set). */
  private def selectedSet(docs: org.apache.spark.sql.DataFrame,
      id: Long): Set[Long] = {
    val toks = docs.filter(col("doc_id") === id)
      .select(col("doc_id").as("doc"),
        graft.functions.TextFunctions.tokens(col("text")).as("__ws"))
    val grams = toks.filter(size(col("__ws")) >= 3)
      .select(col("doc"), posexplode(expr(
        """transform(sequence(1, size(__ws) - 2),
          |  i -> concat_ws(' ', element_at(__ws, i), element_at(__ws, i + 1), element_at(__ws, i + 2)))""".stripMargin))
        .as(Seq("p0", "gram")))
      .select(col("doc"), (col("p0") + 1).as("pos"),
        conv(substring(md5(col("gram").cast("binary")), 1, 9), 16, 10)
          .cast("long").as("h"))
      .withColumn("v", col("h") * lit(1048576L) + (lit(1048575L) - col("pos")))
    val byDoc = Window.partitionBy(col("doc"))
    grams
      .withColumn("__n", count(lit(1)).over(byDoc))
      .withColumn("__minv", min(col("v")).over(
        byDoc.orderBy(col("pos")).rowsBetween(0, 3)))
      .filter(col("pos") <= greatest(col("__n") - 3, lit(1L)))
      .select(shiftright(col("__minv"), 20).as("fp")).distinct()
      .collect().map(_.getLong(0)).toSet
  }

  test("docs sharing a >= w+k-1 token run share a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 = w + k - 1
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight $shared nine ten eleven twelve"))
      .toDF("doc_id", "text")
    assert(Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .count() === 2)
    val a = selectedSet(docs, 1L)
    val b = selectedSet(docs, 2L)
    assert(a.intersect(b).nonEmpty,
      s"no shared fingerprint between $a and $b")
  }

  test("unrelated docs share no fingerprint") {
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj"),
      (2L, "kk ll mm nn oo pp qq rr ss tt"))
      .toDF("doc_id", "text")
    assert(selectedSet(docs, 1L).intersect(selectedSet(docs, 2L)).isEmpty)
  }

  test("a doc shorter than the window still fingerprints (global min)") {
    val docs = Seq((1L, "just four tokens here")).toDF("doc_id", "text")
    val sel = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect()
    assert(sel.length === 1)
    assert(sel(0).getAs[Long]("n_fingerprints") === 1L)
  }
}
