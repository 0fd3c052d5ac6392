package graft.ops

import graft.SparkTestBase
import graft.functions.StripAccents
import org.apache.spark.sql.functions._

/** Unit-level semantics for line dedup, RAG chunking, normalization,
  * counting percentiles, and the funnel fold (sf-scale behavior is
  * covered by the DuckDB-oracle queries).
  */
class TextPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("dedupLines drops boilerplate lines, keeps prose, preserves order") {
    val docs = Seq(
      (1L, "cookie banner\nreal prose one\ncookie banner"),
      (2L, "cookie banner\nreal prose two"),
      (3L, "cookie banner\nmore text"),
      (4L, "cookie banner"),
      (5L, "untouched doc")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, "doc_id", "text", "\n", maxDf = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // "cookie banner" appears in 4 docs > maxDf=3 → dropped everywhere,
    // including BOTH its occurrences in doc 1; doc 4 survives empty
    assert(out === Array(
      (1L, "real prose one", 1L),
      (2L, "real prose two", 1L),
      (3L, "more text", 1L),
      (4L, "", 0L),
      (5L, "untouched doc", 1L)))
  }

  test("dedupLines at df <= maxDf keeps everything byte-identical") {
    val docs = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, "doc_id", "text", "\n", maxDf = 2)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out === Array("a\nb", "a\nc"))
  }

  test("chunkByTokens covers every token, short and empty docs handled") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7"), // 7 tokens, size 4 step 2 → 3 chunks
      (2L, "only three tokens"),    // shorter than one window → 1 chunk
      (3L, "")                      // zero tokens → zero chunks
    ).toDF("doc_id", "text")
    val out = Corpus.chunkByTokens(docs, "doc_id", "text", size = 4, overlap = 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "chunk", "chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(out === Array(
      (1L, 0L, "t1 t2 t3 t4", 4L),
      (1L, 1L, "t3 t4 t5 t6", 4L),
      (1L, 2L, "t5 t6 t7", 3L),
      (2L, 0L, "only three tokens", 3L)))
  }

  test("chunkByTokens rejects bad window parameters") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Corpus.chunkByTokens(docs, "doc_id", "text", size = 4, overlap = 4)
    }
    intercept[IllegalArgumentException] {
      Corpus.chunkByTokens(docs, "doc_id", "text", size = 0, overlap = 0)
    }
  }

  test("strip_accents folds diacritics, leaves ASCII untouched (fast path)") {
    val out = Seq("Café naïve ÉMILE", "plain ascii stays", "œ is not a mark")
      .toDF("s").select(StripAccents.strip_accents($"s")).as[String].collect()
    assert(out === Array("Cafe naive EMILE", "plain ascii stays",
      "œ is not a mark")) // œ is a letter, not a combining mark — kept
  }

  test("normalizeText lowercases, folds accents, collapses whitespace") {
    val out = Seq("  Café\t\tdu   MONDE \n")
      .toDF("s").select(Corpus.normalizeText($"s")).as[String].collect()
    assert(out === Array("cafe du monde"))
  }

  test("percentilesByCounting matches the ceil-rank definition per group") {
    // group a: values 1..10 once each → p50 = rank 5 = 5, p90 = 9, p99 = 10
    // group b: 1 ×9, 100 ×1 → p50 = 1, p90 = 1, p99 = 100
    val df = ((1 to 10).map(v => ("a", v)) ++
      Seq.fill(9)(("b", 1)) :+ ("b", 100)).toDF("g", "v")
    val out = Corpus.percentilesByCounting(df, "g", "v", Seq(50, 90, 99))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out === Array(("a", 5, 9, 10), ("b", 1, 1, 100)))
  }

  test("percentilesByCounting rejects a domain wider than its contract") {
    val wide = (1 to 50).map(v => ("a", v)).toDF("g", "v")
    // bound honored: fine
    Corpus.percentilesByCounting(wide, "g", "v", Seq(50), maxDomain = 50)
      .collect()
    // 50 distinct values against a 10-value promise: the in-plan guard
    // must fail the job instead of silently sorting the whole domain
    val ex = intercept[Exception] {
      Corpus.percentilesByCounting(wide, "g", "v", Seq(50), maxDomain = 10)
        .collect()
    }
    assert(ex.getMessage.contains("not a bounded domain") ||
      Option(ex.getCause).exists(_.getMessage.contains("not a bounded domain")))
  }

  test("funnel stepTimes enforces strict ordering and first-qualifying wins") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // u1 converts fully in order
      (1L, ts("2026-01-01 10:00:00"), "signup"),
      (1L, ts("2026-01-01 10:05:00"), "click"),
      (1L, ts("2026-01-01 10:10:00"), "purchase"),
      // u2 clicks BEFORE signup → click must not count; no purchase
      (2L, ts("2026-01-01 09:00:00"), "click"),
      (2L, ts("2026-01-01 09:30:00"), "signup"),
      // u3 purchase before click → only signup+click count
      (3L, ts("2026-01-01 08:00:00"), "signup"),
      (3L, ts("2026-01-01 08:10:00"), "purchase"),
      (3L, ts("2026-01-01 08:20:00"), "click"),
      // u4 never signs up → excluded entirely
      (4L, ts("2026-01-01 07:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val st = Funnel.stepTimes(events, "user_id", "ts", "event_type",
      Seq("signup", "click", "purchase"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.isNullAt(2), r.isNullAt(3)))
    assert(st === Array((1L, false, false), (2L, true, true),
      (3L, false, true)))
    val counts = Funnel.conversionCounts(events, "user_id", "ts",
      "event_type", Seq("signup", "click", "purchase"))
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(counts === Array((1, 3L), (2, 2L), (3, 1L)))
  }

  test("semanticDedup marks higher-id cosine-near in-cluster vectors") {
    val emb = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),   // cluster seed A
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),   // cluster seed B
      (3L, Seq(1.0, 0.01, 0.0, 0.0)),  // near-dup of 1 → dup
      (4L, Seq(0.0, 1.0, 0.01, 0.0)),  // near-dup of 2 → dup
      (5L, Seq(0.9, 0.4, 0.0, 0.0))    // cluster A but cos(1,5) ≈ 0.91 → kept
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", dim = 4,
      k = 2, iters = 1, threshold = 0.99)
      .orderBy("vid").collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out === Array((1L, false), (2L, false), (3L, true), (4L, true),
      (5L, false)))
  }

  test("lmScore: fixed-point smoothed bigram probabilities vs hand-count") {
    val docs = Seq(
      (1L, "a b a b", true),  // reference: c12(a,b)=2, c12(b,a)=1; c1 a=2 b=1; V=2
      (2L, "a b", false),     // (a,b): (2+1)*1e6/(2+2) = 750000
      (3L, "z z", false),     // unseen: (0+1)*1e6/(0+2) = 500000
      (4L, "a", false)        // no bigrams → null score
    ).toDF("doc_id", "text", "ref")
    val out = Corpus.lmScore(docs, "doc_id", "text", $"ref")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    // doc 1: (750000 + 666666 + 750000) DIV 3 = 722222
    assert(out === Array((1L, 3L, 722222L), (2L, 1L, 750000L),
      (3L, 1L, 500000L), (4L, 0L, -1L)))
  }

  test("gopherRules: each rule fires on its own violation") {
    val docs = Seq(
      (1L, "the cats sat onto of mats"),  // all rules pass
      (2L, "a # b"),                      // short, symbol, no stops
      (3L, "xx yy"),                      // under minWords
      (4L, "123 456 789 000")             // no alpha words, no stops
    ).toDF("doc_id", "text")
    val out = Corpus.gopherRules(docs, "doc_id", "text",
      minWords = 3, maxWords = 100)
      .select("doc_id", "n_words", "ok_words", "ok_mean_len", "ok_symbols",
        "ok_alpha", "ok_stops", "keep")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))
    assert(out === Array(
      (1L, true, true, true, true, true, true),
      (2L, true, false, false, false, false, false), // 2/3 alpha < 0.8
      (3L, false, false, true, true, false, false),
      (4L, true, true, true, false, false, false)))
  }

  test("nearDupKeep keeps the min id per near-dup cluster with sizes") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (3L, "one two three four five"),
      (4L, "one two three four five")         // exact dup of 3
    ).toDF("doc_id", "text")
    val out = Dedup.nearDupKeep(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Array((1L, 1L), (3L, 1L)))
  }

  test("duplicateSpans finds cross-doc windows, ignores within-doc repeats") {
    val docs = Seq(
      (1L, "shared span here plus tail one"),
      (2L, "prefix two shared span here end"),  // shares "shared span here"
      (3L, "solo words repeat solo words repeat"), // repeats only within itself
      (4L, "ab cd")                               // shorter than one window
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text", window = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out === Array(
      (1L, 4L, 1L, true),   // windows: [shared span here] is the shared one
      (2L, 4L, 1L, true),
      (3L, 4L, 0L, false),  // "solo words repeat" twice in ONE doc ≠ cross-doc
      (4L, 0L, 0L, false)))
  }

  test("duplicateSpanRanges merges stride-1 hits into maximal exact spans") {
    val docs = Seq(
      (1L, "a b c d e x y z p q r"), // shares [a b c d e] and [p q r] w/ 2
      (2L, "a b c d e k l m p q r"),
      (3L, "u v w u v w u v w")      // repeats only within itself
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanRanges(docs, "doc_id", "text", window = 3)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // dup windows p∈{0,1,2} merge into ONE 5-token span (exactly the
    // shared run, not a window-rounded superset); p=8 stands alone
    assert(out === Array(
      (1L, 0L, 4L, 5L), (1L, 8L, 10L, 3L),
      (2L, 0L, 4L, 5L), (2L, 8L, 10L, 3L)))
  }

  test("removeDuplicateSpans excises ranges, untouched docs keep raw text") {
    val docs = Seq(
      (1L, "a b c d e x y z p q r"), // loses [a b c d e] and [p q r]
      (2L, "a b c d e k l m p q r"),
      (3L, "u  v   w unique spacing") // untouched → original whitespace
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", window = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out === Array(
      (1L, "x y z", 8L),
      (2L, "k l m", 8L),
      (3L, "u  v   w unique spacing", 0L)))
  }

  test("duplicateSpansIncremental checks history and in-batch, not old-old") {
    val history = Dedup.spanHashTable(
      Seq((1L, "stored span here plus tail")).toDF("doc_id", "text"),
      "doc_id", "text", window = 3)
    val batch = Seq(
      (10L, "stored span here again now"),   // matches history window
      (11L, "fresh pair words in batch"),
      (12L, "fresh pair words in batch"),    // in-batch dup of 11
      (13L, "nothing matches this one")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpansIncremental(batch, "doc_id", "text", 3, history)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2) > 0))
    assert(out === Array((10L, true), (11L, true), (12L, true), (13L, false)))
  }

  test("recordLinkage pairs only within blocks, scores by edit distance") {
    val recs = Seq(
      (1L, "east", "Jon Smith"),
      (2L, "east", "Jon Smyth"),   // dist 1 from 1 → pair
      (3L, "west", "Jon Smith"),   // identical name, other block → no pair
      (4L, "east", "Mary Jones")   // too far from everyone
    ).toDF("rid0", "region", "name")
    val out = Dedup.recordLinkage(recs, "rid0", $"region", "name", maxDist = 2)
      .orderBy("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Array((1L, 2L, 1L)))
  }

  test("recordLinkageFast equals the quadratic scan at maxDist=1") {
    val recs = Seq(
      (1L, "east", "Jon Smith"),
      (2L, "east", "Jon Smyth"),   // substitution → dist 1
      (3L, "east", "Jon Smithh"),  // insertion → dist 1
      (4L, "east", "Jon Smit"),    // deletion → dist 1
      (5L, "east", "ab"),
      (6L, "east", "ba"),          // transposition: shares variants, dist 2 → excluded
      (7L, "west", "Jon Smith")    // other block
    ).toDF("rid0", "region", "name")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val slow = pairs(Dedup.recordLinkage(recs, "rid0", $"region", "name", 1))
    val fast = pairs(Dedup.recordLinkageFast(recs, "rid0", $"region", "name"))
    assert(fast === slow)
    assert(fast.contains((1L, 2L, 1L)) && fast.contains((1L, 3L, 1L)) &&
      fast.contains((1L, 4L, 1L)))
    assert(!fast.exists { case (a, b, _) => (a, b) == (5L, 6L) })
  }

  test("contrastivePairs: positives verified, hards failed, randoms disjoint") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),  // near-dup of 1 (j ≥ 0.5)
      (3L, "one two three four five six"),
      (4L, "totally different content everywhere here now")
    ).toDF("doc_id", "text")
    val out = Dedup.contrastivePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
    val pos = out.filter(_._4 == "near_dup")
    assert(pos.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)) && pos.head._3 == 1)
    assert(out.filter(_._4 == "hard").forall(_._3 == 0))
    val rand = out.filter(_._4 == "random").map(p => (p._1, p._2)).toSet
    assert(!rand.contains((1L, 2L))) // surfaced pairs excluded from random
    assert(out.forall { case (a, b, _, _) => a < b })
  }

  test("contrastive bucket width self-sizes: k grows with corpus size") {
    val t = 4000000L
    assert(Dedup.autoBucketHexChars(1000L, t) === 1)
    assert(Dedup.autoBucketHexChars(64000000L, t) === 1)   // 16 buckets hold it
    assert(Dedup.autoBucketHexChars(100000000L, t) === 2)  // 10^8 docs -> 256
    assert(Dedup.autoBucketHexChars(10000000000L, t) === 3) // 10^10 -> 4096
    assert(Dedup.autoBucketHexChars(100000000000L, t) === 4) // 10^11 -> 65 536
    assert(Dedup.autoBucketHexChars(Long.MaxValue, t) === 8) // capped at md5 prefix
    // monotone in n
    val ks = Seq(1L, 1L << 20, 1L << 30, 1L << 40, 1L << 50, 1L << 62)
      .map(Dedup.autoBucketHexChars(_, t))
    assert(ks === ks.sorted)
  }

  test("encodeWithVocab maps ranked ids, counts OOV, keeps token order") {
    val docs = Seq(
      (1L, "b a b c"),  // corpus counts: a=2, b=2, c=2 — full tie, so the
      (2L, "c a"),      // (count desc, word) tie-break ranks a→1, b→2
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Corpus.encodeWithVocab(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).mkString(",")))
    assert(out === Array(
      (1L, 4L, 1L, "2,1,2,0"),  // c is OOV → 0
      (2L, 2L, 1L, "0,1"),
      (3L, 0L, 0L, "")))
  }

  test("nextEventExamples carves ordered windows with the following target") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2026-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2026-01-01 10:02:00"), 3L, "c"),
      (1L, ts("2026-01-01 10:03:00"), 4L, "d"),
      (2L, ts("2026-01-01 09:00:00"), 5L, "x"),
      (2L, ts("2026-01-01 09:01:00"), 6L, "y") // only 2 events, ctx=2 → none
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Funnel.nextEventExamples(events, "user_id", "ts", "event_id",
      "event_type", context = 2)
      .orderBy("user_id", "example_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[String](2).mkString(""), r.getString(3)))
    assert(out === Array((1L, 0L, "ab", "c"), (1L, 1L, "bc", "d")))
  }

  test("funnel rejects duplicate step names") {
    val events = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 10:00:00"),
      "a")).toDF("user_id", "ts", "event_type")
    intercept[IllegalArgumentException] {
      Funnel.stepTimes(events, "user_id", "ts", "event_type", Seq("a", "a"))
    }
  }

  test("textRankKeywords: the hub word of a star graph ranks first") {
    // 'hub' is adjacent to every spoke; spokes only touch the hub.
    // Graph centrality must put the hub on top even though each
    // individual edge weight is identical — and a word frequent only
    // via self-adjacency ('noise noise ...') forms no edge at all.
    val docs = Seq(
      (1L, "hub aa hub bb hub cc hub dd"),
      (2L, "hub aa hub bb hub cc hub dd"),
      (3L, "noise noise noise noise noise noise noise noise"))
      .toDF("doc_id", "text")
    val out = Corpus.textRankKeywords(docs, "text", minCount = 2L,
        iters = 3, k = 10)
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.head._2 === "hub")
    assert(out.map(_._2).toSet === Set("hub", "aa", "bb", "cc", "dd"))
    assert(out.map(_._1).toSeq === (1 to out.length).toSeq)
  }
}
