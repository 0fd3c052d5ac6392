package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** k-means IVF path: centroid construction and recall against the exact
  * brute-force scan (oracle-level equality is covered by ann_ivf_kmeans).
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._
  private val dim = CorpusQueries.Dim
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("kmeansCentroids: <= k integer-sum centers of full dimension") {
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", dim,
      k = 8, iters = 2).collect()
    assert(cents.nonEmpty && cents.length <= 8)
    assert(cents.forall(_.getSeq[Double](1).length == dim))
    // sums of quantized integers → every component is a whole number
    assert(cents.forall(_.getSeq[Double](1).forall(v => v == math.rint(v))))
    // deterministic under re-partitioning (integer sums are order-free)
    val again = Similarity.kmeansCentroids(emb.repartition(7), "vec_id",
      "embedding", dim, k = 8, iters = 2).collect()
    assert(cents.map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap ===
      again.map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap)
  }

  test("pqTopK: k ranked rows per query, ADC dist consistent and exact") {
    val q = emb.filter(col("vec_id") < 10)
    val out = Similarity.pqTopK(q, emb, "vec_id", "embedding", dim,
      m = 4, ksub = 8, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(out.groupBy(_._1).size === 10)
    assert(out.groupBy(_._1).forall(_._2.length == 5))
    assert(out.forall(r => r._1 != r._2), "self-match must be excluded")
    for ((_, rows) <- out.groupBy(_._1)) {
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3) === (1 to 5))
      // dist ascending with rank; ties must break by ascending n_id
      for (w <- byRank.sliding(2); Array(a, b) = w.toArray)
        assert(a._4 < b._4 || (a._4 == b._4 && a._2 < b._2))
    }
    // a codebook vector queried against the corpus has ADC dist 0 to
    // itself in every subspace ⇒ its own codeword cell; queries < ksub
    // ARE codewords here, so some zero-distance neighbor pair may exist —
    // just assert distances are non-negative (exact integer arithmetic)
    assert(out.forall(_._4 >= 0L))
    // deterministic under re-partitioning
    val again = Similarity.pqTopK(q, emb.repartition(7), "vec_id",
      "embedding", dim, m = 4, ksub = 8, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(out.toSet === again.toSet)
  }

  test("pqTopK recalls a usable share of exact top-k") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(q, emb, "vec_id", "embedding", dim, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.pqTopK(q, emb, "vec_id", "embedding", dim,
      m = 4, ksub = 8, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 codewords over 64 dims is a coarse quantizer (and cosine vs L2
    // disagree on norm outliers) — deterministic data makes this a stable
    // floor, not a statistical bound
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall was $recall")
  }

  test("ivfpqTopK: ranked rows per query, one cell per corpus vector") {
    val q = emb.filter(col("vec_id") < 10)
    val out = Similarity.ivfpqTopK(q, emb, "vec_id", "embedding", dim,
      centroids = 8, nProbe = 2, m = 4, ksub = 8, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(out.groupBy(_._1).size === 10)
    assert(out.forall(r => r._1 != r._2), "self-match must be excluded")
    for ((_, rows) <- out.groupBy(_._1)) {
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3) === (1 to byRank.length))
      // no candidate may surface twice (one cell per corpus vector)
      assert(rows.map(_._2).distinct.length == rows.length)
      for (w <- byRank.sliding(2) if w.length == 2; Array(a, b) = w.toArray)
        assert(a._4 < b._4 || (a._4 == b._4 && a._2 < b._2))
    }
    assert(out.forall(_._4 >= 0L))
    // deterministic under re-partitioning
    val again = Similarity.ivfpqTopK(q, emb.repartition(7), "vec_id",
      "embedding", dim, centroids = 8, nProbe = 2, m = 4, ksub = 8, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(out.toSet === again.toSet)
  }

  test("ivfpqTopK recalls a usable share of exact top-k") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(q, emb, "vec_id", "embedding", dim, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfpqTopK(q, emb, "vec_id", "embedding", dim,
      centroids = 8, nProbe = 4, m = 4, ksub = 16, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // residual PQ inside 4-of-8 probed cells, untrained smallest-id
    // quantizers (the oracle-reproducible seam; a deployment feeds
    // k-means centers), cosine-exact vs L2-ADC — a stable floor on
    // deterministic data, not a statistical bound
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.15, s"recall was $recall")
  }

  test("IVF with k-means centroids recalls a usable share of exact top-k") {
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(q, emb, "vec_id", "embedding", dim, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding", dim,
      k = 8, iters = 2)
      .select(col("cid").as("vec_id"), col("c_v").as("embedding"))
    val approx = Similarity.ivfTopK(q, emb, "vec_id", "embedding", dim,
      centroids = 8, nProbe = 2, k = 5, centroidsDf = cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // nProbe/centroids = 1/4 of the corpus scanned; data is deterministic,
    // so this is a stable floor, not a flaky statistical bound
    assert(recall >= 0.2, s"recall was $recall")
    // every reported neighbor must be a genuine corpus id with a sane score
    assert(approx.forall { case (qid, nid) => qid != nid })
  }

  test("ivfTopKAssigned over an ivfAssign-built store equals ivfTopK") {
    // the stored-cells read path must be faithful to the re-assigning
    // search under the same centroids — the contract the takedown
    // rewrite relies on
    val q = emb.filter(col("vec_id") < 10)
    val centsRaw = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      dim, k = 8, iters = 2)
    val cents = centsRaw
      .select(col("cid").as("vec_id"), col("c_v").as("embedding"))
    val store = Similarity.ivfAssign(emb, "vec_id", "embedding", dim,
      centsRaw).join(emb, Seq("vec_id"))
    val viaStore = Similarity.ivfTopKAssigned(q, store, "vec_id",
        "embedding", dim, nProbe = 2, k = 5, centroidsDf = centsRaw)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = Similarity.ivfTopK(q, emb, "vec_id", "embedding", dim,
        centroids = 8, nProbe = 2, k = 5, centroidsDf = cents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaStore === direct)
    assert(viaStore.nonEmpty)
  }

  test("recallAtK: self-recall is perfect, disjoint result is zero") {
    val q = emb.filter(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(q, emb, "vec_id", "embedding", dim, k = 4)
    val self = Similarity.recallAtK(exact, exact).collect()
    assert(self.length === 5)
    assert(self.forall(r => r.getLong(1) === 4L && r.getLong(2) === 4L))
    // shifting every neighbor id out of range → zero hits, n_exact kept
    val none = Similarity.recallAtK(exact,
      exact.withColumn("n_id", col("n_id") + 1000000L)).collect()
    assert(none.forall(r => r.getLong(1) === 4L && r.getLong(2) === 0L))
  }

  test("recallAtK agrees with a hand-computed set intersection") {
    val q = emb.filter(col("vec_id") < 8)
    val exact = Similarity.cosineTopK(q, emb, "vec_id", "embedding", dim, k = 5)
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding", dim,
      centroids = 8, nProbe = 2, k = 5)
    val report = Similarity.recallAtK(exact, ivf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ex = exact.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val iv = ivf.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((qid, exSet) <- ex)
      assert(report(qid) ===
        (exSet intersect iv.getOrElse(qid, Set.empty)).size.toLong)
  }

  test("topComponent: finds the dominant axis, duplication-invariant") {
    // cloud stretched along e1: x-axis variance dwarfs the rest
    val rnd = new scala.util.Random(11)
    val rows: Seq[Tuple1[Seq[Float]]] = (1 to 200).map { _ =>
      Tuple1(Seq(
        (rnd.nextDouble() * 2 - 1).toFloat * 10f,
        (rnd.nextDouble() * 2 - 1).toFloat,
        (rnd.nextDouble() * 2 - 1).toFloat))
    }.toSeq
    val df = rows.toDF("embedding")
    val w = Similarity.topComponent(df, "embedding", dim = 3, rounds = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(math.abs(w(0)) === (1L << 20), "dominant axis must carry max scale")
    assert(math.abs(w(1)) < (1L << 20) / 2 && math.abs(w(2)) < (1L << 20) / 2)
    // duplicating the corpus doubles the Gram but not the renormalized
    // direction: (2a) DIV (2b) = a DIV b exactly — bit-identical output
    val doubled = (rows ++ rows).toDF("embedding")
    val w2 = Similarity.topComponent(doubled, "embedding", dim = 3, rounds = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(w2 === w)
  }

  test("lshMultiProbeTopK: more probes never lose recall, probes=1 = base") {
    val q = emb.filter(col("vec_id") < 12)
    val exact = Similarity.cosineTopK(q, emb, "vec_id", "embedding", dim, k = 5)
    def recall(df: org.apache.spark.sql.DataFrame): Long =
      Similarity.recallAtK(exact, df).agg(sum(col("hits")))
        .collect()(0).getLong(0)
    val one = Similarity.lshMultiProbeTopK(q, emb, "vec_id", "embedding",
      dim, planes = 4, probes = 1, k = 5)
    val three = Similarity.lshMultiProbeTopK(q, emb, "vec_id", "embedding",
      dim, planes = 4, probes = 3, k = 5)
    // top-k from a candidate SUPERSET can only displace a true top-k
    // member with another true top-k member — recall is monotone
    assert(recall(three) >= recall(one))
    // and probing helps on this data (near neighbors straddle planes)
    assert(recall(three) > recall(one),
      "multi-probe found nothing beyond the base bucket — fixture too easy")
    // self-matches excluded, ranks well-formed
    val rows3 = three.collect()
    assert(rows3.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("removeTopComponent: residuals exactly orthogonal to the direction") {
    val dimS = 3
    val rnd = new scala.util.Random(13)
    val rows: Seq[(Long, Seq[Float])] = (1L to 150L).map { i =>
      i -> Seq(
        (rnd.nextDouble() * 2 - 1).toFloat * 8f,
        (rnd.nextDouble() * 2 - 1).toFloat,
        (rnd.nextDouble() * 2 - 1).toFloat)
    }.toSeq
    val df = rows.toDF("vec_id", "embedding")
    val w = Similarity.topComponent(df, "embedding", dimS, rounds = 8)
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    val resid = Similarity.removeTopComponent(df, "vec_id", "embedding",
      dimS, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(resid.size === 150)
    // resid . w = 0 is an algebraic identity — exact, checked in BigInt
    for ((_, v) <- resid) {
      val dotW = v.zip(w).map { case (a, b) => BigInt(a) * b }.sum
      assert(dotW === BigInt(0))
    }
    // and the dominant axis really lost its mass: total squared resid on
    // axis 0 collapses relative to the raw quantized inputs
    val rawSq = rows.map(r => { val q = math.round(r._2.head * 1000f).toLong
      BigInt(q) * q }).sum
    val ww = w.map(v => BigInt(v) * v).sum
    val residSq = resid.values.map(v => { val x = BigInt(v.head); x * x }).sum
    assert(residSq < rawSq * ww * ww / 10)
  }

  test("radiusSearch: exactly the pairs at/above the micro threshold") {
    val q = emb.filter(col("vec_id") < 10)
    val got = Similarity.radiusSearch(q, emb, "vec_id", "embedding", dim,
      thresholdMicro = 250000L).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.nonEmpty, "threshold too high for the fixture corpus")
    assert(got.values.forall(_ >= 250000L))
    assert(got.keys.forall { case (a, b) => a != b })
    // cross-check against the exhaustive scored scan
    val all = Similarity.cosineTopK(q, emb, "vec_id", "embedding", dim,
      k = emb.count().toInt).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        math.floor(r.getDouble(3) * 1000000).toLong)).toMap
    assert(got.keySet === all.filter(_._2 >= 250000L).keySet)
    got.foreach { case (k2, v) => assert(all(k2) === v) }
  }

  test("mmrRerank: first pick is the relevance argmax, later picks trade") {
    val q = emb.filter(col("vec_id") < 6)
    val out = Similarity.mmrRerank(q, emb, "vec_id", "embedding", dim,
      nCand = 8, k = 3, lambdaPpm = 700000L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.size === 6)
    for ((qid, rows) <- byQ) {
      assert(rows.map(_._2).sorted === Array(1, 2, 3))
      assert(rows.map(_._3).distinct.length === 3, "picks must be distinct")
      assert(rows.forall(_._3 != qid), "self-match must be excluded")
      // rank-1 = top-1 of the plain relevance ranking
      val top1 = Similarity.cosineTopK(
        emb.filter(col("vec_id") === qid), emb, "vec_id", "embedding", dim, 1)
        .collect().head.getLong(1)
      assert(rows.find(_._2 == 1).get._3 === top1)
    }
  }

  test("mmrRerank: lambda=1 degenerates to plain relevance top-k") {
    val q = emb.filter(col("vec_id") < 6)
    val mmr = Similarity.mmrRerank(q, emb, "vec_id", "embedding", dim,
      nCand = 8, k = 3, lambdaPpm = 1000000L).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val rel = Similarity.cosineTopK(q, emb, "vec_id", "embedding", dim, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(mmr === rel)
  }
}
