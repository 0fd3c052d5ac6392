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

  test("priority dedup keeps the preferred source's copy of a duplicate") {
    val src = Seq(
      (1L, "crawl", "same text here"),
      (2L, "wiki", "same text here"),
      (3L, "crawl", "unique text")
    ).toDF("doc_id", "source", "text")
    val kept = Dedup.dropDuplicatesByPriority(src, "text",
      Seq(when($"source" === "wiki", 0).otherwise(1), $"doc_id"))
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    assert(kept === Array(2L, 3L)) // wiki copy wins over the lower id
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

  test("minhash candidates verified by exact jaccard: propose then dispose") {
    val out = Dedup.minhashLshVerified(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // identical docs 1 and 3 must survive with jaccard exactly 1.0
    assert(out((1L, 3L)) === 1.0)
    // the unrelated doc never appears regardless of banding luck
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L })
    // every reported score is a genuine jaccard in (0, 1]
    assert(out.values.forall(j => j > 0.5 - 1e-9 && j <= 1.0))
  }

  test("simhash: identical docs hamming 0, near docs small, far docs large") {
    val sh = docs.select($"doc_id", Dedup.simhash64($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(4L)))
    // grouped-aggregate form computes the identical 64-bit signature
    val tbl = Dedup.simhashTable(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tbl === sh)
    // the signature uses the full width — some doc sets a high bit
    assert(sh.values.exists(v => (v >>> 48) != 0L))
  }

  test("simhashPairs: pigeonhole blocking finds near pairs exactly") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L))) // identical → hamming 0
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("stratified every-nth sampling is deterministic per stratum") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"))
      .toDF("id", "g")
    val out = Corpus.stratifiedEveryNth(df, "g", "id", 2)
      .collect().map(_.getLong(0)).sorted
    assert(out === Array(1L, 3L, 4L))
  }

  test("hash sample keeps exactly k per stratum, stable under repartitioning") {
    val df = (1L to 50L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "g")
    val s1 = Corpus.hashSamplePerStratum(df, "g", "id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.count(_._2 == "a") === 5 && s1.count(_._2 == "b") === 5)
    val s2 = Corpus.hashSamplePerStratum(df.repartition(7), "g", "id", 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(s1.toSet === s2.toSet)
  }

  test("token packing fills shards to the budget in order, per group") {
    val df = Seq(
      (1L, "s", "a b c"), (2L, "s", "d e"), (3L, "s", "f g h i"),
      (4L, "t", "x")).toDF("id", "src", "text")
    val out = Corpus.packByTokenBudget(df, "src", "id", "text", budget = 5)
      .select("id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // group s token counts 3,2,4: tokens-before = 0,3,5 → shards 0,0,1
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("lexical top-k ranks tf x inverse-df with exact integer scores") {
    val df = Seq(
      (1L, "rare common common"),
      (2L, "common"),
      (3L, "rare rare common"),
      (4L, "nothing relevant")).toDF("doc_id", "text")
    val out = Corpus.lexicalTopK(df, "doc_id", "text", "rare common", 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // df(rare)=2 → weight 500000; df(common)=3 → weight 333333
    assert(out === Array(
      (3L, 1, 2 * 500000L + 333333L),
      (1L, 2, 500000L + 2 * 333333L),
      (2L, 3, 333333L)))
  }

  test("contamination measures per-train-doc eval shingle overlap") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "totally clean document here now")).toDF("doc_id", "text")
    val benchmark = Seq((10L, "the quick brown fox runs")).toDF("doc_id", "text")
    val out = Dedup.contamination(train, benchmark, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 shares "the quick brown" and "quick brown fox" with the eval set
    assert(out(1L) === ((3L, 2L)))
    assert(out(2L) === ((3L, 0L)))
  }

  test("connected components: transitive clusters, isolated nodes self-label") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    // chain 1-2-3 needs transitive propagation; 4-5 a separate component
    val pairs = Seq((2L, 3L), (1L, 2L), (4L, 5L)).toDF("d1", "d2")
    val cc = Dedup.connectedComponents(ids, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("connected components with a reliable checkpoint dir matches local mode") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val pairs = Seq((2L, 3L), (1L, 2L), (4L, 5L)).toDF("d1", "d2")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L)
    val cc = Dedup.connectedComponents(ids, "id", pairs,
      checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === expected)
    val star = Dedup.connectedComponentsStar(ids, "id", pairs,
      checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === expected)
  }

  test("connected components fails loud instead of returning split clusters") {
    val ids = (0L until 10L).toDF("id")
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(ids, "id", chain, maxIters = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("minhashSignature fold equals the per-component naive construction") {
    import org.apache.spark.sql.functions._
    // naive form: k independent array_min passes over h1 + i*h2 — the
    // spec the fused running-min fold must reproduce exactly
    def naive(text: org.apache.spark.sql.Column, n: Int, k: Int) = {
      def h(s: org.apache.spark.sql.Column, off: Int) =
        conv(substring(md5(s.cast("binary")), off, 14), 16, 10).cast("long")
      val sh = TextFunctions.shingles(text, n)
      array((0 until k).map { i =>
        array_min(transform(sh, s => h(s, 1) + lit(i.toLong) * h(s, 15)))
      }: _*)
    }
    val out = docs.select(
      Dedup.minhashSignature($"text", 3, 6).as("fast"),
      naive($"text", 3, 6).as("slow"))
      .collect()
    out.foreach(r => assert(r.getSeq[Any](0) === r.getSeq[Any](1)))
    // empty shingle set ⇒ all-null components in both forms
    val empty = Seq((9L, "a b")).toDF("doc_id", "text") // < 3 tokens
      .select(Dedup.minhashSignature($"text", 3, 4)).collect()(0).getSeq[Any](0)
    assert(empty === Seq(null, null, null, null))
  }

  test("minhash k above 128 is rejected: h1 + i*h2 would overflow a long") {
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLsh(docs, "doc_id", "text", bands = 43, rowsPerBand = 3)
    }
    assert(e.getMessage.contains("overflow"))
  }

  test("star contraction matches label propagation; deep chain in O(log n) rounds") {
    // a 200-link chain: label propagation would need ~200 rounds (its
    // maxIters default would give up); star contraction halves tree
    // heights per round and must finish well inside 30
    val n = 200
    val ids = (0L until n.toLong).toDF("id")
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("d1", "d2")
    val star = Dedup.connectedComponentsStar(ids, "id", chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.size === n && star.values.forall(_ == 0L))

    // random-ish sparse graph: both solvers must agree exactly
    val ids2 = (0L until 40L).toDF("id")
    val pairs2 = (0L until 40L).flatMap { i =>
      Seq((i, (i * 7 + 3) % 40), (i, (i * 13 + 11) % 40)).filter(p => p._1 != p._2)
    }.toDF("d1", "d2")
    val a = Dedup.connectedComponents(ids2, "id", pairs2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.connectedComponentsStar(ids2, "id", pairs2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("incrementalComponents merges bridged old clusters and matches recompute") {
    // old world: {0,1} and {10,11} are separate clusters; 20 is a singleton
    val oldIds = Seq(0L, 1L, 10L, 11L, 20L).toDF("id")
    val oldPairs = Seq((0L, 1L), (10L, 11L)).toDF("d1", "d2")
    val stored = Dedup.connectedComponentsStar(oldIds, "id", oldPairs)
    // new batch: 30 BRIDGES the two old clusters (30-1, 30-11); 31 links
    // to the old singleton; 32 is a new singleton
    val newIds = Seq(30L, 31L, 32L).toDF("id")
    val newPairs = Seq((30L, 1L), (30L, 11L), (31L, 20L)).toDF("d1", "d2")
    val inc = Dedup.incrementalComponents(stored, "id", newIds, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // full recompute over the union pair set must agree exactly
    val full = Dedup.connectedComponentsStar(
      oldIds.unionByName(newIds), "id",
      oldPairs.unionByName(newPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === full)
    // and the merge really happened: 0,1,10,11,30 all label 0 — including
    // old members 10/11 whose STORED label (10) had to change
    assert(Seq(0L, 1L, 10L, 11L, 30L).forall(inc(_) == 0L))
    assert(inc(20L) === 20L && inc(31L) === 20L && inc(32L) === 32L)
  }

  test("takedownComponents splits bridged clusters and never touches " +
    "unaffected stored rows") {
    // stored world: chain {0-1-2} (1 is the bridge), pair {10,11},
    // singleton 20
    val ids = Seq(0L, 1L, 2L, 10L, 11L, 20L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("d1", "d2")
    val stored = Dedup.connectedComponentsStar(ids, "id", pairs)
    // removing the bridge must SPLIT {0,1,2} into {0} and {2}
    val out = Dedup.takedownComponents(stored, "id",
        Seq(1L).toDF("id"), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 0L, 2L -> 2L, 10L -> 10L, 11L -> 10L,
      20L -> 20L))
    // full recompute over the remaining corpus agrees exactly
    val full = Dedup.connectedComponentsStar(
      ids.filter(col("id") =!= 1L), "id",
      pairs.filter(col("d1") =!= 1L && col("d2") =!= 1L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === full)
    // carry proof: poison an UNAFFECTED cluster's stored label — the
    // takedown of 1 must carry the poisoned rows forward verbatim
    // (it re-solves only clusters that lost a member)
    val poisoned = stored
      .withColumn("cluster",
        when(col("id").isin(10L, 11L), lit(999L)).otherwise(col("cluster")))
    val carried = Dedup.takedownComponents(poisoned, "id",
        Seq(1L).toDF("id"), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(carried(10L) === 999L && carried(11L) === 999L)
    // removing a whole cluster leaves nothing of it behind
    val gone = Dedup.takedownComponents(stored, "id",
        Seq(10L, 11L).toDF("id"), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!gone.contains(10L) && !gone.contains(11L))
    assert(gone(0L) === 0L && gone(1L) === 0L && gone(2L) === 0L)
  }

  test("nearDupClusters keeps one canonical doc per near-dup group") {
    val out = Dedup.nearDupClusters(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // docs 1,2,3 pair up (see the jaccard test) → one cluster rooted at 1;
    // doc 4 is its own cluster
    assert(out === Array((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true)))
  }

  test("jaccard df cap bounds candidates under a hot shingle") {
    // 40 docs all sharing one boilerplate sentence (a hot shingle set),
    // each with otherwise-unique text; two genuine near-dups
    val hotDocs = ((1 to 40).map { i =>
      (i.toLong, s"all rights reserved worldwide unique$i token$i word$i")
    } ++ Seq((100L, "alpha beta gamma delta epsilon zeta"),
             (101L, "alpha beta gamma delta epsilon eta"))).toDF("doc_id", "text")
    // uncapped: boilerplate shingles pair all 40 docs in the index join
    val uncapped = Dedup.ngramJaccard(hotDocs, "doc_id", "text",
      n = 3, threshold = 0.0, maxDf = Int.MaxValue).count()
    // capped at df<=10: the 40-doc shingles drop out; only genuinely
    // similar pairs remain
    val capped = Dedup.ngramJaccard(hotDocs, "doc_id", "text",
      n = 3, threshold = 0.0, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped > 700) // ~40*39/2 boilerplate pairs
    assert(capped === Set((100L, 101L)))
  }

  test("native hyperplane bucket matches the composed element_at form") {
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 30L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val composed = (0 until 4).map { p =>
      val proj = (0 until 16).map(d =>
        element_at($"embedding", d + 1).cast("double") *
          lit(Similarity.planeWeight(d, p))).reduce(_ + _)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val out = vecs.select(
      Similarity.lshBucket($"embedding", 16, 4).as("native"),
      composed.as("composed")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("bounded top-k aggregate matches window row_number top-k") {
    val rnd = new scala.util.Random(11)
    val scored = (1 to 500).map { _ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(50) / 10.0)
    }.toDF("q_id", "n_id", "cos").distinct()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id")
    val expected = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 7)
      .select($"q_id", $"n_id", $"rank", $"cos")
      .collect().map(_.toSeq).toSet
    val got = scored.groupBy($"q_id")
      .agg(graft.functions.TopKByScore.top_k_by_score($"cos", $"n_id", 7).as("top"))
      .select($"q_id", posexplode($"top").as(Seq("r0", "t")))
      .select($"q_id", $"t.id".as("n_id"),
        ($"r0" + 1).cast("int").as("rank"), $"t.score".as("cos"))
      .collect().map(_.toSeq).toSet
    assert(got === expected)
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

  test("scrubPii counts and redacts email + phone spans") {
    val out = Corpus.scrubPii(
      Seq((1L, "mail a.b-c@ex-1.co.uk or 555 1234 now"), (2L, "clean text"))
        .toDF("doc_id", "text"), "text")
      .orderBy($"doc_id").collect()
    assert((out(0).getAs[Long]("n_emails"), out(0).getAs[Long]("n_phones")) === ((1L, 1L)))
    assert(out(0).getAs[String]("clean_text") === "mail <EMAIL> or <PHONE> now")
    assert((out(1).getAs[Long]("n_emails"), out(1).getAs[Long]("n_phones")) === ((0L, 0L)))
    assert(out(1).getAs[String]("clean_text") === "clean text")
  }

  test("repetitionStats: mode count via sorted-run fold, exact ratios") {
    val out = Corpus.repetitionStats(
      Seq((1L, "a a b c a"), (2L, "x y z"), (3L, "")).toDF("doc_id", "text"), "text")
      .orderBy($"doc_id")
      .select($"n_words", $"n_distinct", $"top_word_count", $"dup_ratio")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) === ((5L, 3L, 3L, 0.4)))
    assert(out(1) === ((3L, 3L, 1L, 0.0)))
    assert(out(2) === ((0L, 0L, 0L, 0.0)))
  }

  test("splitByHash: deterministic, exhaustive, boundary-exact") {
    val df = spark.range(0, 200).toDF("doc_id")
    val s1 = Corpus.splitByHash(df, "doc_id", Seq("val" -> "0d", "test" -> "1a"), "train")
      .groupBy($"split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1.values.sum === 200L)
    // same assignment on recompute (content-hash, not random)
    val s2 = Corpus.splitByHash(df, "doc_id", Seq("val" -> "0d", "test" -> "1a"), "train")
      .groupBy($"split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 === s2)
    // a doc keeps its split when the corpus grows
    val bigger = Corpus.splitByHash(spark.range(0, 400).toDF("doc_id"), "doc_id",
      Seq("val" -> "0d", "test" -> "1a"), "train")
      .filter($"doc_id" < 200).groupBy($"split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bigger === s1)
  }

  test("vocabularyTopK: counts with deterministic tie-break, bounded k") {
    val df = Seq((1L, "b a b c"), (2L, "a b a")).toDF("doc_id", "text")
    val out = Corpus.vocabularyTopK(df, "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out === Array(("a", 3L), ("b", 3L))) // tie a/b → lexicographic
  }

  test("quantizeInt8: floor semantics, zero-vector safe, rank preserved") {
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val qz = vecs.select($"vec_id",
      Similarity.quantizeInt8($"embedding").as("q")).orderBy($"vec_id")
      .collect().map(_.getSeq[Long](1).toArray)
    assert(qz(0) === Array(127L, -64L, 0L)) // floor(-63.5) = -64
    assert(qz(1) === Array(0L, 0L, 0L))
    // quantized ranking matches exact cosine ranking on well-separated vectors
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.quantizedTopK(
      corpus.filter($"vec_id" === 1), corpus, "vec_id", "embedding", k = 2)
      .orderBy($"rank").collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(top === Array((2L, 1), (3L, 2)))
  }

  test("clipByLengthRank drops exactly the rank tails per stratum") {
    val df = (1 to 20).map(i => (i.toLong, "en", i.toLong))
      .toDF("doc_id", "lang", "n_chars")
    val kept = Corpus.clipByLengthRank(df, "lang", "n_chars", "doc_id", 5, 95)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    // rn*100 > 20*5 → rn >= 2; rn*100 <= 20*95 → rn <= 19
    assert(kept === (2L to 19L).toArray)
  }

  test("clipByLengthApprox tracks the rank clip on a dominant skewed stratum") {
    // one stratum holds 90% of the rows (the 100 TB English case) with
    // unique lengths; a tiny stratum rides along
    val big = (1 to 900).map(i => (i.toLong, "en", i.toLong))
    val small = (1 to 40).map(i => (1000L + i, "fr", i.toLong))
    val df = (big ++ small).toDF("doc_id", "lang", "n_chars")
    val exact = Corpus.clipByLengthRank(df, "lang", "n_chars", "doc_id", 10, 90)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val approx = Corpus.clipByLengthApprox(df, "lang", "n_chars", 10, 90)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    // at this size the sketch is exact up to the by-value vs by-rank
    // boundary convention; allow a sliver of boundary drift per stratum
    val drift = (exact diff approx) ++ (approx diff exact)
    assert(drift.size <= 4, s"drift too large: $drift")
    // the dominant stratum kept ~80% either way
    val enKept = approx.count(_ <= 900L)
    assert(enKept >= 700 && enKept <= 740, s"enKept=$enKept")
  }

  test("clipByLengthApprox keeps extremes when a bound is disabled") {
    val df = (1 to 50).map(i => (i.toLong, "en", i.toLong))
      .toDF("doc_id", "lang", "n_chars")
    val kept = Corpus.clipByLengthApprox(df, "lang", "n_chars", 0, 90)
      .select($"doc_id").collect().map(_.getLong(0))
    assert(kept.contains(1L), "loPct=0 must keep the shortest row")
    assert(!kept.contains(50L), "hiPct=90 must drop the longest row")
  }

  test("packSequences concatenates each shard's docs in order") {
    val df = Seq(
      (1L, "g", "a b c"), // 3 tokens, shard 0 (cum 0)
      (2L, "g", "d e"), // cum 3, shard 0
      (3L, "g", "f g h i"), // cum 5, shard 1
      (10L, "h", "x") // own group
    ).toDF("doc_id", "grp", "text")
    val out = Corpus.packSequences(df, "grp", "doc_id", "text", budget = 5L,
        sep = " | ")
      .orderBy($"grp", $"shard").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out === Array(
      ("g", 0L, 2L, 5L, "a b c | d e"),
      ("g", 1L, 1L, 4L, "f g h i"),
      ("h", 0L, 1L, 1L, "x")))
  }

  test("sampleToMixture keeps the feasible-total mixture, deterministically") {
    val rows = (1L to 300L).map(i => (i, if (i <= 200) "big" else "small"))
    val df = rows.toDF("doc_id", "source")
    val weights = Map("big" -> 1, "small" -> 1) // target 50:50, small binds
    val kept = Corpus.sampleToMixture(df, "source", "doc_id", weights)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // independent replay of the documented rule
    val wSum = 2L
    val t = math.min(200L * wSum / 1, 100L * wSum / 1) // = 200
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(3)
      ((h(0) & 0xffL) << 16) | ((h(1) & 0xffL) << 8) | (h(2) & 0xffL)
    }
    val expected = rows.filter { case (id, s) =>
      val n = if (s == "big") 200L else 100L
      bucket(id) * wSum * n < (1L << 24) * t * 1L
    }
    assert(kept.toSet === expected.toSet)
    // the binding source keeps everything; the oversupplied one thins out
    assert(kept.count(_._2 == "small") === 100)
    assert(kept.count(_._2 == "big") < 200 && kept.count(_._2 == "big") > 50)
    intercept[IllegalArgumentException](
      Corpus.sampleToMixture(df, "source", "doc_id", Map("big" -> 1)))
  }

  test("capPerGroup keeps the k best per group, smaller-id tiebreak") {
    val pages = Seq(
      (1L, "a.com", 10.0), (2L, "a.com", 30.0), (3L, "a.com", 20.0),
      (4L, "a.com", 30.0), // ties 2 on score: id 2 wins the last slot
      (5L, "b.com", 1.0) // under-full group survives whole
    ).toDF("doc_id", "domain", "quality")
    val kept = Corpus.capPerGroup(pages, "domain", "doc_id", $"quality", k = 2)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 4L, 5L))
    // window-form equivalence on the same data
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"domain").orderBy($"quality".desc, $"doc_id")
    val viaWindow = pages.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2).select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === viaWindow)
  }

  test("scoreLinearHashed: mean of bucket weights, bias on empty") {
    val weights = Seq.tabulate(8)(j => j.toDouble)
    val df = Seq((1L, "alpha beta alpha"), (2L, "   "), (3L, "alpha"))
      .toDF("doc_id", "text")
    val out = Corpus.scoreLinearHashed(df, "doc_id", "text", weights, bias = 0.5)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def bucket(t: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(3)
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(h, 16) % 8).toInt
    }
    val wa = weights(bucket("alpha")); val wb = weights(bucket("beta"))
    assert(out(0) === ((1L, 3, 0.5 + (2 * wa + wb) / 3.0)))
    assert(out(1) === ((2L, 0, 0.5))) // no tokens: exactly bias
    assert(out(2) === ((3L, 1, 0.5 + wa)))
  }

  test("incremental minhash = full-LSH pairs touching the new batch") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (3L, "zeta eta theta iota kappa lambda mu nu"),
      (10L, "the quick brown fox jumps over the lazy dog"), // new: dup of 1
      (11L, "zeta eta theta iota kappa lambda mu nu"), // new: dup of 3
      (12L, "entirely fresh unrelated words appear here today")
    ).toDF("doc_id", "text")
    val history = corpus.filter($"doc_id" < 10)
    val fresh = corpus.filter($"doc_id" >= 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairs(Dedup.minhashLsh(corpus, "doc_id", "text", 3, 4, 3))
    val expected = full.filter(p => p._1 >= 10 || p._2 >= 10)
    val inc = pairs(Dedup.minhashLshIncremental(fresh, "doc_id", "text",
      Dedup.minhashSignatureTable(history, "doc_id", "text", 3, 12), 3, 4, 3))
    assert(inc === expected)
    assert(expected.contains((1L, 10L)) && expected.contains((3L, 11L)))
    assert(!inc.exists(p => p._1 < 10 && p._2 < 10), "old-old pair leaked")
  }

  test("contaminationBloom is byte-identical to the exact contamination") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"), // one leaked shingle
      (2L, "zeta eta theta iota kappa"), // clean
      (3L, "alpha beta gamma alpha beta gamma"), // repeated leaked shingle
      (4L, "x y") // too short for 3-grams: absent from output
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma nu xi")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val exact = rows(Dedup.contamination(train, eval, "doc_id", "text", 3))
    // a tiny filter has a high effective fpp — the exact join must still
    // erase every false positive
    val bloom = rows(Dedup.contaminationBloom(train, eval, "doc_id", "text", 3,
      fpp = 0.5))
    assert(bloom === exact)
    assert(exact.map(_._1) === Seq(1L, 2L, 3L))
    assert(exact.find(_._1 == 2L).get._3 === 0L) // clean doc: zero hits
  }

  test("ccnetBuckets: per-language cuts, fluent=head, unscoreable=tail") {
    val corpus = Seq(
      // en: d1/d2 use the reference bigrams heavily, d3 barely, d4 has
      // no bigrams at all (single token ⇒ lm_score null)
      (1L, "en", "the cat sat on the mat the cat sat"),
      (2L, "en", "the cat sat on the mat"),
      (3L, "en", "zebra quark flux nebula prism vortex"),
      (4L, "en", "word"),
      // fr: scored by the en-trained model, but CUT within fr only
      (5L, "fr", "le chat dort le chat dort"),
      (6L, "fr", "bleu rouge vert jaune violet")
    ).toDF("doc_id", "lang", "text")
    val out = Corpus.ccnetBuckets(corpus, "doc_id", "text", "lang",
      $"lang" === "en").collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)).map(_.toString.toLong),
        r.getString(3))).toMap
    assert(out.size === 6)
    assert(out(4L) === ((None, "tail")), "no-bigram doc must be tail")
    assert(out.values.forall(v => Set("head", "middle", "tail")(v._2)))
    // within each lang, bucket order must agree with score order
    for (lang <- Seq(Seq(1L, 2L, 3L), Seq(5L, 6L))) {
      val ranked = lang.flatMap(id => out(id)._1.map(s => (s, out(id)._2)))
      val byBucket = ranked.groupBy(_._2).view.mapValues(_.map(_._1))
      for (h <- byBucket.getOrElse("head", Nil);
           m <- byBucket.getOrElse("middle", Nil)) assert(h >= m)
      for (m <- byBucket.getOrElse("middle", Nil);
           t <- byBucket.getOrElse("tail", Nil)) assert(m >= t)
      for (h <- byBucket.getOrElse("head", Nil);
           t <- byBucket.getOrElse("tail", Nil)) assert(h >= t)
    }
    // the top-scoring en doc lands in head (cuts are per-lang, and en has
    // 3 scored docs so all three buckets are distinguishable)
    val enBest = Seq(1L, 2L, 3L).maxBy(id => out(id)._1.get)
    assert(out(enBest)._2 === "head")
  }

  test("dsirSelect ranks target-like docs first; k and ties deterministic") {
    val corpus = Seq(
      (1L, "tgt", "apple banana apple banana cherry"),
      (2L, "tgt", "apple cherry banana apple"),
      (3L, "pool", "apple banana cherry"), // pool doc, target-like
      (4L, "pool", "zebra yak walrus quokka"), // pool doc, nothing shared
      (5L, "pool", "apple banana cherry") // identical text to 3: tie
    ).toDF("doc_id", "kind", "text")
    val out = Corpus.dsirSelect(corpus, "doc_id", "text",
      $"kind" === "tgt", buckets = 64, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 5) // k caps, never pads
    val score = out.map(r => r._1 -> r._3).toMap
    assert(score(3L) > score(4L), "target-like pool doc must outrank alien")
    assert(score(3L) === score(5L), "identical docs score identically")
    // tie broken by ascending id in the output ordering
    assert(out.indexWhere(_._1 == 3L) < out.indexWhere(_._1 == 5L))
    assert(out.find(_._1 == 4L).get._2 === 4L) // n_tokens passthrough
    // k genuinely bounds the output
    assert(Corpus.dsirSelect(corpus, "doc_id", "text",
      $"kind" === "tgt", buckets = 64, k = 2).count() === 2L)
  }

  test("bpeMerges learns the textbook merge chain, ties break lexicographic") {
    val docs = Seq(
      (1L, "low lower low"),
      (2L, "lowest low")
    ).toDF("doc_id", "text")
    val merges = Corpus.bpeMerges(docs, "doc_id", "text", merges = 4)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (l,o) and (o,w) both count 5 → lexicographic tie-break;
    // round 4: all pairs count 1 → (lowe,r) wins on (u1, u2)
    assert(merges === Array(
      (1, "l", "o", 5L), (2, "lo", "w", 5L),
      (3, "low", "e", 2L), (4, "lowe", "r", 1L)))
  }

  test("pretokens chunks the token stream, trailing remainder kept") {
    val df = Seq((1L, "a b c d e"), (2L, " x  "), (3L, "")).toDF("id", "t")
    val out = df.orderBy("id")
      .select(TextFunctions.pretokens(col("t"), 2).as("p"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("a b", "c d", "e"))
    assert(out(1) === Seq("x"))
    assert(out(2) === Seq.empty)
    // window = 1 is exactly tokens()
    val w1 = df.orderBy("id")
      .select(TextFunctions.pretokens(col("t"), 1).as("p"))
      .collect().map(_.getSeq[String](0))
    assert(w1(0) === Seq("a", "b", "c", "d", "e"))
  }

  test("bpe training venues agree: driver-local == forced distributed") {
    val d = Seq(
      (1L, "low lower low newest"),
      (2L, "lowest low wider new"),
      (3L, "new news widest low")
    ).toDF("doc_id", "text")
    def run(vocabMax: Int) = Corpus.bpeMerges(d, "doc_id", "text",
      merges = 12, window = 2, driverVocabMax = vocabMax)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val local = run(Corpus.BpeDriverVocabMax)
    val dist = run(0)
    assert(local.length === 12)
    assert(local === dist)
    def enc(vocabMax: Int) = Corpus.bpeEncode(d, "doc_id", "text",
      merges = 12, window = 2, driverVocabMax = vocabMax)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(enc(Corpus.BpeDriverVocabMax) === enc(0))
  }

  test("bpe stored-merge replay equals training encode, in both venues") {
    val d = Seq(
      (1L, "low lower low newest"),
      (2L, "lowest low wider new"),
      (3L, "new news widest low")
    ).toDF("doc_id", "text")
    val stored = Corpus.bpeMerges(d, "doc_id", "text",
      merges = 12, window = 2)
    def enc(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val direct = enc(Corpus.bpeEncode(d, "doc_id", "text",
      merges = 12, window = 2))
    // replaying the artifact over the SAME corpus must reproduce the
    // training-run encode exactly — in the driver venue and in the
    // forced-distributed affected-slice replay
    assert(enc(Corpus.bpeEncodeWithMerges(d, "doc_id", "text", stored,
      window = 2)) === direct)
    assert(enc(Corpus.bpeEncodeWithMerges(d, "doc_id", "text", stored,
      window = 2, driverVocabMax = 0)) === direct)
    // and applying history-trained merges to an UNSEEN doc still
    // encodes it (unseen pretokens just stay at their unmerged units)
    val d2 = d.union(Seq((4L, "unseen words here")).toDF("doc_id", "text"))
    val applied = enc(Corpus.bpeEncodeWithMerges(d2, "doc_id", "text",
      stored, window = 2))
    assert(applied.length === 4 && applied.forall(_._2 > 0))
  }

  test("bpe maxRounds caps synchronization rounds in both venues") {
    val d = Seq((1L, "aaab aaab aab bbba")).toDF("doc_id", "text")
    def run(vocabMax: Int) = Corpus.bpeMerges(d, "doc_id", "text",
      merges = 100, maxRounds = 1, driverVocabMax = vocabMax)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val local = run(Corpus.BpeDriverVocabMax)
    // one round accepts at most the unit-disjoint prefix of the top-m
    // window — far fewer than the 100-merge budget
    assert(local.length >= 1 && local.length <= Corpus.BpeBatchCandidates)
    assert(local.length < 100)
    assert(local === run(0))
  }

  test("bpeEncode compresses docs by the learned merges") {
    val docs = Seq(
      (1L, "low lower low"), // → [low] [lower] [low] = 3 units
      (2L, "lowest low"),    // → [lowe s t] [low]   = 4 units
      (3L, "")               // no tokens → 0 units
    ).toDF("doc_id", "text")
    val out = Corpus.bpeEncode(docs, "doc_id", "text", merges = 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Array((1L, 3L), (2L, 4L), (3L, 0L)))
  }

  test("shardManifest partitions every doc exactly once with exact counts") {
    val docs = (0L until 40L).map(i => (i, ("tok " * ((i % 5).toInt + 1)).trim))
      .toDF("doc_id", "text")
    val m = Corpus.shardManifest(docs, "doc_id", "text", nShards = 4)
      .collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum === 40L)
    // Σ tokens = Σ (i%5 + 1) over 0..39 = 8 * (1+2+3+4+5) = 120
    assert(m.map(_.getAs[Long]("n_tokens")).sum === 120L)
    assert(m.map(_.getAs[Int]("shard")).toSet.subsetOf((0 until 4).toSet))
    // assignment is content-hash deterministic: repartitioning the input
    // cannot move a doc to another shard
    val m2 = Corpus.shardManifest(docs.repartition(7), "doc_id", "text", 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m.map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap === m2)
  }

  test("mixturePlan derives integer targets and repeat factors") {
    val docs = Seq(
      (1L, "a b c d", "web"), (2L, "a b", "web"),
      (3L, "x y z", "code"), (4L, "", "code")
    ).toDF("doc_id", "text", "source")
    val plan = Corpus.mixturePlan(docs, "source", "text",
      Seq("web" -> 750000, "code" -> 250000), budgetTokens = 1200L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // code: 3 tokens supply, target 1200*250000/1e6 = 300 → 100000 milli
    // web: 6 tokens supply, target 1200*750000/1e6 = 900 → 150000 milli
    assert(plan === Array(
      ("code", 2L, 3L, 250000L, 300L, 100000L),
      ("web", 2L, 6L, 750000L, 900L, 150000L)))
  }

  test("mixturePlan: unweighted source plans zero, empty source divides safely") {
    val docs = Seq((1L, "a", "web"), (2L, "", "empty"))
      .toDF("doc_id", "text", "source")
    val plan = Corpus.mixturePlan(docs, "source", "text",
      Seq("web" -> 1000000), budgetTokens = 100L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(plan === Array(
      ("empty", 0L, 0L, 0L, 0L),
      ("web", 1L, 1000000L, 100L, 100000L)))
  }

  test("mixtureTemperaturePlan: sqrt weights flatten the head source") {
    // web: 16 tokens, code: 4 tokens → raw 80/20 but sqrt 4/2 → 666666/333333
    val docs = Seq(
      (1L, ("t " * 16).trim, "web"),
      (2L, ("t " * 4).trim, "code")
    ).toDF("doc_id", "text", "source")
    val plan = Corpus.mixtureTemperaturePlan(docs, "source", "text",
      budgetTokens = 600L).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(plan === Array(
      ("code", 4L, 333333L, 199L),
      ("web", 16L, 666666L, 399L)))
  }

  test("duplicateRateByGroup: cross-source copy counts against the copier") {
    val docs = Seq(
      (1L, "original text", "wiki"),
      (2L, "original text", "crawl"), // copied from wiki (higher id)
      (3L, "fresh text", "crawl")
    ).toDF("doc_id", "text", "source")
    val rates = Dedup.duplicateRateByGroup(docs, "doc_id", "text", "source")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rates === Array(
      ("crawl", 2L, 1L, 500000L),
      ("wiki", 1L, 0L, 0L)))
  }

  test("minhashRecall: identical docs are always caught, counts stay exact") {
    // docs 1 and 3 are identical → jaccard 1 AND identical signatures,
    // so the pair is both a truth pair and an LSH candidate
    val r = Dedup.minhashRecall(docs, "doc_id", "text").collect()
    assert(r.length === 1)
    val (nTrue, nCand, nHit, ppm) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    assert(nTrue >= 1 && nHit >= 1 && nHit <= nTrue && nHit <= nCand)
    assert(ppm === nHit * 1000000L / nTrue)
  }

  test("exportSorted: equal-depth buckets, disjoint ranges, sorted files") {
    val docs = (0L until 97L)
      .map(i => (i, s"tok${i % 7} body", (i * 37 % 50) + 5))
      .toDF("doc_id", "text", "n_chars")
    val out = "/tmp/graft_test_sorted_pid" +
      java.lang.ProcessHandle.current().pid()
    val m = Corpus.exportSorted(docs, "n_chars", "doc_id", "text", 4, out)
      .collect().sortBy(_.getInt(0))
    assert(m.map(_.getAs[Long]("n_docs")).sum === 97L)
    // equal depth by rank: 97 over 4 buckets -> every size in {24, 25}
    assert(m.forall(r => Set(24L, 25L)(r.getAs[Long]("n_docs"))))
    // buckets cover the key line in order (ties may straddle: <=)
    m.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_key") <= b.getAs[Long]("min_key"))
    }
    // every written file is internally sorted by (key, id) — the
    // property that makes bucket-sequential reads a global curriculum
    import org.apache.spark.sql.Row
    val lists = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("n_chars"), col("doc_id"))
      .groupBy(col("f"))
      .agg(collect_list(struct(col("n_chars"), col("doc_id"))).as("xs"))
      .collect()
    assert(lists.nonEmpty)
    lists.foreach { r =>
      val xs = r.getSeq[Row](1).map(x => (x.getLong(0), x.getLong(1)))
      assert(xs == xs.sorted, s"file ${r.getString(0)} not key-sorted")
    }
  }

  test("incrementalShardManifest carries untouched shards, rebuilds touched") {
    val v1 = (0L until 60L).map(i => (i, s"w$i x y")).toDF("doc_id", "text")
    // v2: doc 5 edited, doc 200 added, doc 7 removed
    val v2 = ((0L until 60L).filter(_ != 7L).map(i =>
      (i, if (i == 5L) s"w$i x y EDIT" else s"w$i x y")) :+ (200L, "new doc"))
      .toDF("doc_id", "text")
    val m1 = Corpus.shardManifest(v1, "doc_id", "text", 16)
    val full = Corpus.shardManifest(v2, "doc_id", "text", 16)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val inc = Corpus.incrementalShardManifest(v1, m1, v2, "doc_id", "text", 16)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(inc === full)
    // PROOF the untouched rows are carried, not recomputed: poison an
    // untouched shard's stored row and watch the poison flow through
    val touched = Corpus.snapshotDiff(v1, v2, "doc_id", "text")
      .filter(col("status") =!= "unchanged")
      .select(conv(substring(md5(col("doc_id").cast("string")
        .cast("binary")), 1, 14), 16, 10).cast("long").mod(16).cast("int"))
      .collect().map(_.getInt(0)).toSet
    val untouched = full.keySet.diff(touched)
    assert(untouched.nonEmpty, "fixture leaves no shard untouched")
    val poisoned = m1.withColumn("n_docs",
      when(col("shard") === untouched.head, lit(999L))
        .otherwise(col("n_docs")))
    val inc2 = Corpus.incrementalShardManifest(
      v1, poisoned, v2, "doc_id", "text", 16)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(inc2(untouched.head) === 999L)
  }

  test("snapshotDiff classifies all four statuses, dims optional") {
    val v1 = Seq((1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s2"))
      .toDF("doc_id", "text", "source")
    val v2 = Seq((2L, "b", "s1"), (3L, "c2", "s2"), (4L, "d", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Corpus.snapshotDiff(v1, v2, "doc_id", "text", Seq("source"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(got === Map(
      1L -> ("s1", "removed"), 2L -> ("s1", "unchanged"),
      3L -> ("s2", "changed"), 4L -> ("s2", "added")))
    // no dims: still one status row per id
    val bare = Corpus.snapshotDiff(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bare(1L) === "removed" && bare(4L) === "added")
  }

  test("coverageMaxSelect: distinct picks, non-increasing greedy gains") {
    // doc 3 duplicates doc 1, so after picking 1 its residual gain is 0
    // and it must never be picked before the genuinely novel docs
    val out = Corpus.coverageMaxSelect(docs, "doc_id", "text", n = 3, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Seq(1, 2, 3))
    assert(out.map(_._2).distinct.length === 3)
    assert(!out.take(2).map(_._2).contains(3L) || !out.take(2).map(_._2).contains(1L),
      "a pure duplicate must not occupy two of the first picks")
    // greedy marginal gains are non-increasing (submodularity)
    assert(out.map(_._3).sliding(2).forall(w => w.head >= w.last))
    assert(out.head._3 > 0L)
  }

  test("coverageStochasticSelect: full sample reduces to exact greedy; " +
    "small sample still picks distinct docs with positive gains") {
    // sampleSize >= corpus: every round's candidate pool is everything,
    // so the stochastic pick IS the exact greedy pick
    val exact = Corpus.coverageMaxSelect(docs, "doc_id", "text",
      n = 3, k = 3).collect().map(r => (r.getInt(0), r.getLong(1)))
    val full = Corpus.coverageStochasticSelect(docs, "doc_id", "text",
      n = 3, k = 3, sampleSize = 10000)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(full.toSeq === exact.toSeq)
    // a genuinely restricted pool: distinct picks, positive gains, and
    // the hash permutation is deterministic across runs
    val s1 = Corpus.coverageStochasticSelect(docs, "doc_id", "text",
      n = 3, k = 3, sampleSize = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val s2 = Corpus.coverageStochasticSelect(docs, "doc_id", "text",
      n = 3, k = 3, sampleSize = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(s1.toSeq === s2.toSeq)
    assert(s1.map(_._2).distinct.length === 3)
    assert(s1.forall(_._3 > 0L))
  }

  test("rendezvousShard: minimal disruption on grow, pure function of (id, N)") {
    val ids = (1L to 400L).toDF("doc_id")
    val n12 = Corpus.rendezvousShard(ids, "doc_id", 12)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val n13 = Corpus.rendezvousShard(ids, "doc_id", 13)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every assignment in range for its N
    assert(n12.values.forall(s => s >= 0 && s < 12))
    assert(n13.values.forall(s => s >= 0 && s < 13))
    // HRW's contract: a document either keeps its shard or moves to
    // THE ADDED one — the old shards' weights are unchanged
    assert(ids.collect().map(_.getLong(0)).forall(id =>
      n13(id) == n12(id) || n13(id) == 12))
    // the moved slice is ~1/13 of the corpus (loose 2x bounds on 400
    // deterministic ids), nothing like mod-N's ~12/13 reshuffle
    val moved = n12.keys.count(id => n13(id) != n12(id))
    assert(moved > 400 / 26 && moved < 2 * 400 / 13,
      s"moved $moved of 400 — expected ~${400 / 13}")
    // deterministic: same ids, same N, same assignment (no RNG)
    val again = Corpus.rendezvousShard(ids, "doc_id", 12)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again === n12)
    // single shard degenerates to the constant assignment
    assert(Corpus.rendezvousShard(ids, "doc_id", 1)
      .select("shard").distinct().collect().map(_.getInt(0)).toSeq === Seq(0))
    // packed-argmax ceiling is fail-loud
    intercept[IllegalArgumentException] {
      Corpus.rendezvousShard(ids, "doc_id", 65)
    }
  }
}
