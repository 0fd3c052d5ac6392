package graft.ops

import graft.SparkTestBase

/** Gopher repetition rules: hand-computed fractions for each rule
  * family, including the overlap-aware n-gram coverage union. */
class RepetitionRulesSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    Corpus.repetitionRules(docs.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("clean unique text keeps, with zero repetition mass") {
    val r = run(Seq((1L,
      "alpha bravo charlie delta echo foxtrot golf hotel india juliett")))
    val row = r(1L)
    assert(row.getAs[Long]("dup_line_pm") === 0)
    assert(row.getAs[Long]("dup5_pm") === 0)
    assert(row.getAs[Boolean]("keep"))
  }

  test("duplicate lines: occurrences and chars charged, keep fails at >30%") {
    // lines: "aa bb" x2, "cc dd" -> dl = 2 of nl = 3 (66% > 30%)
    val r = run(Seq((1L, "aa bb\naa bb\ncc dd")))
    val row = r(1L)
    assert(row.getAs[Long]("dup_line_pm") === 2000L / 3) // 666
    // dup chars = 2 lines x 4 non-ws chars = 8 of totch 12 -> 666 pm
    assert(row.getAs[Long]("dup_line_char_pm") === 8000L / 12)
    assert(!row.getAs[Boolean]("keep"))
  }

  test("top 2-gram char mass is count times chars of the dominant gram") {
    // "x y" occurs 3 times (2 chars each) over totch 6 -> 1000 pm
    val r = run(Seq((1L, "x y x y x y")))
    assert(r(1L).getAs[Long]("top2_pm") === 1000)
    assert(!r(1L).getAs[Boolean]("keep"))
  }

  test("dup 5-gram coverage is the POSITION UNION, never double-counted") {
    // tokens: a b c d e a b c d e a -- "a b c d e" and "b c d e a" each
    // occur twice; their windows cover ALL 11 positions exactly once
    // (a naive occurrence sum would charge 20 of 11 positions)
    val r = run(Seq((1L, "a b c d e a b c d e a")))
    assert(r(1L).getAs[Long]("dup5_pm") === 1000)
  }

  test("a doc below every threshold keeps even with mild repetition") {
    // one repeated 2-gram "aa bb" (x2, 4 chars) in a long unique doc
    val uniq = (1 to 40).map(i => s"w$i").mkString(" ")
    val r = run(Seq((1L, s"aa bb $uniq aa bb")))
    assert(r(1L).getAs[Boolean]("keep"))
    assert(r(1L).getAs[Long]("top2_pm") > 0)
  }

  test("line separator parameter: paragraph-level run splits on blank lines") {
    val out = Corpus.repetitionRules(
      Seq((1L, "p one\n\np one\n\np two")).toDF("id", "text"),
      "id", "text", lineSep = "\n\n")
      .collect().head
    // paragraphs: "p one" x2, "p two" -> 2 of 3 duplicated
    assert(out.getAs[Long]("dup_line_pm") === 2000L / 3)
  }
}
