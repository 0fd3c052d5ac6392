package graft.ops

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the text-pipeline operators: each invariant is the
  * operator's CONTRACT stated as an executable law over random corpora
  * (small vocab on purpose — collisions, duplicates and empty docs are
  * the interesting cases, and a 3-word vocabulary forces them).
  */
class TextPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val wordGen = Gen.oneOf("aa", "bb", "cc")
  private val docGen: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, docGen))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
  }

  test("chunkByTokens: chunks reconstruct the token stream exactly") {
    check(Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val step = 3 // size 5, overlap 2
      val chunks = Corpus.chunkByTokens(docs, "doc_id", "text", 5, 2)
        .select("doc_id", "chunk_id", "chunk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val ws = t.split(" ").filter(_.nonEmpty)
        val got = chunks.getOrElse(i.toLong, Array.empty[String])
        if (ws.isEmpty) got.isEmpty
        else {
          // chunk j starts at j*step and reconstruction concatenates
          // each chunk's first `step` tokens plus the last chunk's tail
          val rebuilt = got.zipWithIndex.flatMap { case (c, j) =>
            val toks = c.split(" ").filter(_.nonEmpty)
            if (j == got.length - 1) toks else toks.take(step)
          }
          rebuilt.sameElements(ws)
        }
      }
    })
  }

  test("dedupLines: maxDf >= corpus size is the identity") {
    check(Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t.replace(' ', '\n'))
      }.toDF("doc_id", "text")
      val out = Dedup.dedupLines(docs, "doc_id", "text", "\n",
        maxDf = texts.size + 1)
        .orderBy("doc_id").collect().map(_.getString(1))
      out.toSeq == texts.zipWithIndex.map { case (t, i) => t.replace(' ', '\n') }
    })
  }

  test("duplicateSpans: n_dup_windows <= n_windows and dup iff flagged") {
    check(Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.duplicateSpans(docs, "doc_id", "text", window = 2)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      out.forall { case (nw, nd, flag) => nd <= nw && flag == (nd > 0) }
    })
  }

  test("percentilesByCounting: p100 is the max; percentiles are monotone") {
    val valGen = Gen.choose(1, 50)
    val rowsGen = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, valGen))
    check(Prop.forAll(rowsGen) { vs =>
      val df = vs.map(("g", _)).toDF("g", "v")
      val r = Corpus.percentilesByCounting(df, "g", "v", Seq(25, 50, 75, 100))
        .collect().head
      val (p25, p50, p75, p100) =
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      p100 == vs.max && p25 <= p50 && p50 <= p75 && p75 <= p100
    })
  }

  test("funnel: step counts never increase along the funnel") {
    val evGen: Gen[List[(Long, Int, String)]] =
      Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, for {
        u <- Gen.choose(1L, 4L)
        t <- Gen.choose(0, 100)
        e <- Gen.oneOf("s1", "s2", "s3", "other")
      } yield (u, t, e)))
    check(Prop.forAll(evGen) { evs =>
      val df = evs.map { case (u, t, e) =>
        (u, java.sql.Timestamp.valueOf(s"2026-01-01 00:00:${"%02d".format(t % 60)}.${t / 60}"), e)
      }.toDF("user_id", "ts", "event_type")
      val counts = Funnel.conversionCounts(df, "user_id", "ts", "event_type",
        Seq("s1", "s2", "s3"))
        .orderBy("step").collect().map(_.getLong(2))
      counts.length == 3 && counts(0) >= counts(1) && counts(1) >= counts(2)
    })
  }
}
