package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *   - [[cosineTopK]] is the exact baseline: query-set × corpus cross join
  *     (queries side is small/broadcast), bounded top-k aggregation. At
  *     cluster scale the corpus stays partitioned, queries broadcast —
  *     linear scan, no shuffle of the corpus, and only ≤ k candidates per
  *     (query × partition) cross the final shuffle
  *     ([[graft.functions.TopKByScore]]).
  *   - [[lshBuckets]]/[[lshTopK]] is the scale path: deterministic integer
  *     random-hyperplane LSH; the corpus is bucketed once (narrow map,
  *     native codegen'd [[graft.functions.HyperplaneBucket]]), lookups
  *     join on the bucket id only.
  *
  * Dot products are explicit left-assoc sums with per-element DOUBLE casts
  * so results are bit-identical to the DuckDB oracle.
  */
object Similarity {

  /** Left-assoc Σ a[i]·b[i] in double — the native codegen'd loop
    * ([[graft.functions.DotProduct]]); `dim` is advisory (runtime array
    * length governs). The unrolled element_at chain it replaces produced
    * megabyte expression trees that fell out of codegen. */
  def dot(a: Column, b: Column, dim: Int): Column =
    graft.functions.DotProduct.dot_product(a, b)

  def cosine(a: Column, b: Column, dim: Int): Column =
    dot(a, b, dim) / (sqrt(dot(a, a, dim)) * sqrt(dot(b, b, dim)))

  // Norms are precomputed per row BEFORE any join (below the join
  // barrier, so CollapseProject cannot inline them into per-pair work):
  // the n² stage pays one dot product per pair, not three.

  /** Bounded top-k per query: k-capped heap aggregate (map-side partials
    * ship ≤ k rows per query per partition) instead of a window sort over
    * every scored row — at a 100 TB corpus the window form shuffles
    * |Q|×|C| rows just to keep k. */
  private def topK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("cos"), col("n_id").cast("long"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("q_id"), col("t.id").as("n_id"),
        (col("r0") + 1).cast("int").as("rank"), col("t.score").as("cos"))

  /** Exact brute-force top-k neighbors for each query vector. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      sqrt(dot(col(vecCol), col(vecCol), dim)).as("q_nrm"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"),
      sqrt(dot(col(vecCol), col(vecCol), dim)).as("n_nrm"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos",
        dot(col("q_v"), col("n_v"), dim) / (col("q_nrm") * col("n_nrm")))
    topK(scored, k)
  }

  /** Deterministic pseudo-random hyperplane weight (integer in [-6, 6]):
    * w(dim d, plane p) = ((d*31 + p*17) mod 13) - 6. Integer weights make
    * the construction exactly reproducible in plain SQL.
    */
  def planeWeight(d: Int, p: Int): Int = ((d * 31 + p * 17) % 13) - 6

  /** Random-hyperplane LSH bucket id: bit p set iff Σ v[d]·w(d,p) > 0.
    * Native codegen'd loop ([[graft.functions.HyperplaneBucket]]); the
    * dim×planes unrolled element_at chain it replaces fell out of
    * whole-stage codegen at 256 terms. `dim` is advisory (runtime array
    * length governs). A null vector buckets to 0 (all signs negative) so
    * such rows still participate in blocking, matching the composed
    * SQL form this expression replaced. */
  def lshBucket(vec: Column, dim: Int, planes: Int): Column =
    coalesce(graft.functions.HyperplaneBucket.hyperplane_bucket(vec, planes),
      lit(0L))

  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int): DataFrame =
    df.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), dim, planes).as("bucket"))

  /** ANN top-k restricted to the query's LSH bucket — the linear scan
    * becomes a bucket-partitioned join (expected corpus/2^planes
    * candidates per query).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, planes: Int, k: Int): DataFrame = {
    val q = lshBuckets(queries, idCol, vecCol, dim, planes)
      .select(col(idCol).as("q_id"), col(vecCol).as("q_v"), col("bucket"),
        sqrt(dot(col(vecCol), col(vecCol), dim)).as("q_nrm"))
    val c = lshBuckets(corpus, idCol, vecCol, dim, planes)
      .select(col(idCol).as("n_id"), col(vecCol).as("n_v"), col("bucket"),
        sqrt(dot(col(vecCol), col(vecCol), dim)).as("n_nrm"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos",
        dot(col("q_v"), col("n_v"), dim) / (col("q_nrm") * col("n_nrm")))
    topK(scored, k)
  }

  /** Multi-probe LSH top-k (Lv et al. 2007): each query scans its own
    * bucket AND the `probes−1` buckets reached by flipping the
    * hyperplane bits with the SMALLEST projection margins — the planes
    * the vector most nearly straddles, exactly where a true neighbor
    * most likely landed on the other side. Recall rises toward
    * brute-force without growing the index or the table count (the
    * classic trade vs banding: more probes, same storage).
    *
    * Engine-exact ordering: projections are computed on MILLI-QUANTIZED
    * vectors against the integer [[planeWeight]] lattice, so every
    * margin is an exact integer (in double, < 2^53) and the flip order
    * (|proj| asc, plane asc) is identical in any engine — no float-tie
    * ambiguity. Buckets derive from the same integer projections on
    * both sides. Reported cosines stay on the raw float vectors
    * ([[lshTopK]]'s convention).
    *
    * Scale shape: identical to [[lshTopK]] with the query batch
    * replicated ≤ `probes`× before the broadcast — the corpus side is
    * untouched (one bucket per corpus row, hash-partitioned equi join);
    * a corpus row meets a query at most once because the probe buckets
    * of one query are pairwise distinct.
    */
  def lshMultiProbeTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, planes: Int, probes: Int,
      k: Int): DataFrame = {
    require(planes >= 1 && planes <= 62, s"planes must be in [1,62], got $planes")
    require(probes >= 1 && probes <= planes + 1,
      s"probes must be in [1, planes+1], got $probes")
    def wArr(p: Int): Column =
      array((0 until dim).map(d => lit(planeWeight(d, p).toDouble)): _*)
    def withProj(df: DataFrame): DataFrame = df
      .withColumn("__pj", array((0 until planes).map(p =>
        dot(col("__qv"), wArr(p), dim)): _*))
      .withColumn("bucket", (0 until planes).map(p =>
        when(element_at(col("__pj"), p + 1) > 0d, lit(1L << p))
          .otherwise(lit(0L))).reduce(_ + _))
    val c = withProj(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"),
      quantize(col(vecCol)).as("__qv"),
      sqrt(dot(col(vecCol), col(vecCol), dim)).as("n_nrm")))
      .select(col("n_id"), col("n_v"), col("n_nrm"), col("bucket"))
    val q0 = withProj(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      quantize(col(vecCol)).as("__qv"),
      sqrt(dot(col(vecCol), col(vecCol), dim)).as("q_nrm")))
    // flip order: margin asc, plane asc — mask rides in the struct so the
    // probe bucket is one XOR against a literal power of two
    val margins = array((0 until planes).map(p =>
      struct(abs(element_at(col("__pj"), p + 1)).as("m"),
        lit(p).as("p"), lit(1L << p).as("mask"))): _*)
    val q = q0
      .withColumn("__probes", concat(array(col("bucket")),
        transform(slice(sort_array(margins), 1, probes - 1),
          e => col("bucket").bitwiseXOR(e.getField("mask")))))
      .select(col("q_id"), col("q_v"), col("q_nrm"),
        explode(col("__probes")).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos",
        dot(col("q_v"), col("n_v"), dim) / (col("q_nrm") * col("n_nrm")))
    topK(scored, k)
  }

  /** Full-corpus k-NN GRAPH by LSH blocking — every vector gets its
    * top-k bucket-mates, the input SemDeDup-style embedding dedup and
    * graph clustering consume. Unlike the `ann_*` probes there is NO
    * broadcast side: both join inputs are the corpus, hash-shuffled on
    * the bucket id, so the plan holds when "the queries" are a billion
    * rows. Work per bucket is |bucket|², which makes `planes` the
    * scale knob: size 2^planes ≈ rows/10³ so buckets stay in the
    * thousands (collision probability per plane is cos-angle-
    * monotone, so near neighbors keep colliding as planes grow).
    * Single-probe recall — size it with [[recallAtK]] against a
    * sampled exact truth.
    */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int, k: Int): DataFrame = {
    val b = lshBuckets(corpus, idCol, vecCol, dim, planes)
    val q = b.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      col("bucket"), sqrt(dot(col(vecCol), col(vecCol), dim)).as("q_nrm"))
    val c = b.select(col(idCol).as("n_id"), col(vecCol).as("n_v"),
      col("bucket"), sqrt(dot(col(vecCol), col(vecCol), dim)).as("n_nrm"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos",
        dot(col("q_v"), col("n_v"), dim) / (col("q_nrm") * col("n_nrm")))
    topK(scored, k)
  }

  /** Cosine RADIUS (range) search: every corpus row whose cosine to a
    * query meets `thresholdMicro` (micro-units, i.e. 450000 = 0.45) —
    * the retrieval dual of [[cosineTopK]] when the caller wants "all
    * matches above a similarity bar", not a fixed k (candidate
    * harvesting for RAG, near-duplicate screens against a probe set).
    *
    * The cosine is floored to exact micro integers (one fixed shape of
    * correctly-rounded double ops, the [[labelOutliers]] discipline), so
    * the threshold cut and the emitted score are engine-identical.
    *
    * Scale shape — strictly simpler than top-k: corpus partitioned,
    * query batch broadcast, and the threshold filter applies MAP-SIDE,
    * so the operator is shuffle-free end to end (no heap, no groupBy);
    * output volume is data-scaled by construction (it IS the match
    * set). A 100 TB corpus streams through at scan speed.
    */
  def radiusSearch(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      thresholdMicro: Long): DataFrame = {
    require(thresholdMicro >= -1000000L && thresholdMicro <= 1000000L,
      s"thresholdMicro must be a cosine in micro-units, got $thresholdMicro")
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      sqrt(dot(col(vecCol), col(vecCol), dim)).as("q_nrm"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"),
      sqrt(dot(col(vecCol), col(vecCol), dim)).as("n_nrm"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos_micro",
        floor(dot(col("q_v"), col("n_v"), dim) /
          (col("q_nrm") * col("n_nrm")) * lit(1000000.0)).cast("long"))
      .filter(col("cos_micro") >= lit(thresholdMicro))
      .select(col("q_id"), col("n_id"), col("cos_micro"))
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998):
    * from each query's `nCand` most-similar candidates, greedily keep
    * `k` that balance relevance against redundancy —
    * {{{
    *   pick_t = argmax_c  λ·rel(q,c) − (1−λ)·max_{p∈picked} sim(c,p)
    * }}}
    * the standard diversity pass between retrieval and prompt assembly
    * (dense near-duplicate candidates collapse to one representative).
    *
    * Engine-exact: relevance and candidate↔picked similarities are
    * cosines floored to micro integers, λ is ppm, so every MMR score is
    * one BIGINT expression — both engines rank identically, ties to the
    * lowest candidate id. Candidate selection reuses the [[cosineTopK]]
    * ordering (raw double cosine desc, then id).
    *
    * Scale shape: candidate generation is the broadcast-queries linear
    * scan with the k-capped heap; everything after runs on the
    * #queries × nCand frame — each greedy round is one equi join on
    * q_id with fan-out ≤ t picked rows, one partial-aggregated max per
    * candidate, one per-query argmax. k driver-UNROLLED rounds (fixed
    * plan depth, no data-dependent iteration), nothing collected.
    */
  def mmrRerank(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      nCand: Int, k: Int, lambdaPpm: Long): DataFrame = {
    require(k >= 1 && nCand >= k, s"need nCand >= k >= 1, got nCand=$nCand k=$k")
    require(lambdaPpm >= 0 && lambdaPpm <= 1000000L,
      s"lambdaPpm must be in [0, 1000000], got $lambdaPpm")
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      sqrt(dot(col(vecCol), col(vecCol), dim)).as("q_nrm"))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"),
      sqrt(dot(col(vecCol), col(vecCol), dim)).as("n_nrm"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos",
        dot(col("q_v"), col("n_v"), dim) / (col("q_nrm") * col("n_nrm")))
    // top-nCand ids per query via the bounded heap, vectors re-attached
    // by one equi join (the heap carries only (score, id))
    val candIds = scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("cos"), col("n_id").cast("long"), nCand).as("top"))
      .select(col("q_id"), explode(col("top.id")).as("n_id"))
    val cand = candIds
      .join(c.select(col("n_id").cast("long").as("n_id"), col("n_v"),
        col("n_nrm")), "n_id")
      .join(broadcast(q), "q_id")
      .withColumn("rel_micro",
        floor(dot(col("q_v"), col("n_v"), dim) /
          (col("q_nrm") * col("n_nrm")) * lit(1000000.0)).cast("long"))
      .select(col("q_id"), col("n_id"), col("n_v"), col("n_nrm"),
        col("rel_micro"))
    val lam = lambdaPpm
    val oneMinus = 1000000L - lambdaPpm
    var picked: DataFrame = null // (q_id, rank, n_id, n_v, n_nrm, rel_micro)
    var remaining = cand
    for (t <- 1 to k) {
      val sel =
        if (t == 1)
          // empty picked set: the redundancy term is 0, argmax rel
          remaining.groupBy(col("q_id"))
            .agg(max_by(
              struct(col("n_id"), col("n_v"), col("n_nrm"), col("rel_micro")),
              struct(col("rel_micro"), -col("n_id"))).as("w"))
            .select(col("q_id"), lit(t).cast("int").as("rank"),
              col("w.n_id").as("n_id"), col("w.n_v").as("n_v"),
              col("w.n_nrm").as("n_nrm"), col("w.rel_micro").as("rel_micro"))
        else {
          val p = picked.select(col("q_id"), col("n_v").as("p_v"),
            col("n_nrm").as("p_nrm"))
          remaining.join(p, "q_id")
            .withColumn("sim_micro",
              floor(dot(col("n_v"), col("p_v"), dim) /
                (col("n_nrm") * col("p_nrm")) * lit(1000000.0)).cast("long"))
            .groupBy(col("q_id"), col("n_id"))
            // n_v/n_nrm/rel_micro are constant within the group
            .agg(first(col("n_v")).as("n_v"), first(col("n_nrm")).as("n_nrm"),
              first(col("rel_micro")).as("rel_micro"),
              max(col("sim_micro")).as("ms"))
            .withColumn("mmr",
              lit(lam) * col("rel_micro") - lit(oneMinus) * col("ms"))
            .groupBy(col("q_id"))
            .agg(max_by(
              struct(col("n_id"), col("n_v"), col("n_nrm"), col("rel_micro")),
              struct(col("mmr"), -col("n_id"))).as("w"))
            .select(col("q_id"), lit(t).cast("int").as("rank"),
              col("w.n_id").as("n_id"), col("w.n_v").as("n_v"),
              col("w.n_nrm").as("n_nrm"), col("w.rel_micro").as("rel_micro"))
        }
      picked = if (t == 1) sel else picked.unionByName(sel)
      remaining = remaining
        .join(sel.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"),
          "left_anti")
    }
    picked.select(col("q_id"), col("rank"), col("n_id"), col("rel_micro"))
  }

  /** Quantize a float vector to integers: round(v*1000). Every later
    * k-means aggregate then runs on exact integers — element sums are
    * order-independent and exact in double below 2^53, so Spark and the
    * SQL oracle agree bit-for-bit no matter how partitions combine. */
  def quantize(vec: Column): Column =
    transform(vec, v => round(v.cast("double") * lit(1000d)).cast("long"))

  /** Symmetric int8 quantization: q_i = floor(v_i · 127 / max|v|), the
    * standard 4× memory/bandwidth shrink for ANN at scale (a 100 TB float
    * corpus becomes 25 TB of int8 with ~1% recall loss). Native codegen'd
    * two-pass loop ([[graft.functions.QuantizeInt8]], O(dim) per row —
    * the composed `transform`+`array_max` form re-evaluated the max per
    * ELEMENT, O(dim²)). A zero vector quantizes to zeros. */
  def quantizeInt8(vec: Column): Column =
    graft.functions.QuantizeInt8.quantize_int8(vec)

  /** Brute-force top-k by EXACT integer dot product over int8-quantized
    * vectors: products ≤ 128², 64-dim sums ≪ 2^53, so the codegen'd
    * double accumulator is exact and ranking is engine-independent.
    * Same shape as [[cosineTopK]]: corpus partitioned, queries
    * broadcast, ≤ k rows per (query × partition) cross the shuffle. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
      quantizeInt8(col(vecCol)).as("q_v"))
    val c = corpus.select(col(idCol).as("n_id"),
      quantizeInt8(col(vecCol)).as("n_v"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("score", dot(col("q_v"), col("n_v"), 0))
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("score"), col("n_id").cast("long"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("q_id"), col("t.id").as("n_id"),
        (col("r0") + 1).cast("int").as("rank"),
        col("t.score").cast("long").as("score"))
  }

  /** Product-quantization ANN (Jégou, Douze, Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search", IEEE TPAMI 33(1)):
    * split each `dim`-d vector into `m` subvectors, quantize every
    * subvector to its nearest of `ksub` codewords, and score queries
    * against the CODES with an asymmetric-distance lookup table — the
    * query stays full precision, the corpus collapses to `m` small ints
    * per row.
    *
    * This is the memory/bandwidth endgame for ANN at 100 TB: a 64-d
    * float corpus (256 B/row) becomes m=4 bytes of codes (64× smaller),
    * and the scan's per-pair cost drops from `dim` multiplies to `m`
    * array lookups. The corpus is encoded in ONE narrow map-only pass
    * (the codebook is a literal — no join, no shuffle), scoring is the
    * same broadcast-queries linear scan as [[cosineTopK]] with the
    * k-capped heap bounding what crosses the final shuffle. Nothing
    * anywhere shuffles the corpus.
    *
    * Determinism contract (mirrors [[kmeansCentroids]]'s playbook):
    * vectors are integer-quantized (×1000 round) so every subspace
    * squared-L2 distance is an exact integer (≤ ~2.6e8 ≪ 2^53 in
    * double); codewords are the `ksub` smallest-id corpus vectors
    * (id-space agnostic, oracle-reproducible — a real deployment feeds
    * k-means centers per subspace through the same literal seam);
    * encode ties go to the lowest code, ranking ties to the lowest
    * neighbor id.
    *
    * @return (q_id, n_id, rank, dist): k rows per query ranked by
    *         ascending approximate squared-L2 distance
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      m: Int, ksub: Int, k: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(ksub > 0, s"ksub must be positive, got $ksub")
    val sub = dim / m
    // codebook: ksub·dim ints — bounded at any corpus size, so collecting
    // it (one TakeOrdered) and re-emitting it as literals keeps both the
    // encode pass and the query LUT map-only
    val cbRows = corpus.orderBy(col(idCol)).limit(ksub)
      .select(quantize(col(vecCol)).as("qv"))
      .collect().map(_.getSeq[Long](0))
    require(cbRows.nonEmpty, "pqTopK: corpus is empty")
    // the ksub codewords of subspace j, as a literal array<array<long>>
    def cbLit(j: Int): Column = array(cbRows.map(cw =>
      array(cw.slice(j * sub, (j + 1) * sub).map(lit(_)): _*)): _*)
    def subdist(a: Column, b: Column): Column =
      graft.functions.SqDistLong.sq_dist_long(a, b)
    // distances from row's j-th subvector to every codeword of subspace j
    def dists(j: Int): Column =
      transform(cbLit(j), c => subdist(slice(col("__qv"), j * sub + 1, sub), c))

    val c = corpus
      .select(col(idCol).as("n_id"), quantize(col(vecCol)).as("__qv"))
      .select(col("n_id"), array((0 until m).map { j =>
        val d = dists(j)
        // array_position finds the FIRST minimum — lowest-code tie-break
        (array_position(d, array_min(d)) - 1).cast("int")
      }: _*).as("codes"))
    val q = queries
      .select(col(idCol).as("q_id"), quantize(col(vecCol)).as("__qv"))
      .select(col("q_id"), array((0 until m).map(dists): _*).as("lut"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      // ADC: Σ_j lut[j][code_j] — m lookups, the whole point of PQ
      .withColumn("dist", aggregate(
        zip_with(col("codes"), col("lut"),
          (cd, row) => element_at(row, cd + 1)),
        lit(0L), _ + _))
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.top_k_by_score(
        -col("dist").cast("double"), col("n_id").cast("long"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("q_id"), col("t.id").as("n_id"),
        (col("r0") + 1).cast("int").as("rank"),
        (-col("t.score")).cast("long").as("dist"))
  }

  /** The PQ codebook as a PERSISTABLE ARTIFACT: the `ksub` smallest-id
    * corpus vectors in [[quantize]] space, coded 0..ksub−1 in id order
    * — the same deterministic seam [[pqTopK]] trains from (a real
    * deployment stores per-subspace k-means codewords through the same
    * (code, cqv) shape). Bounded by construction: ksub rows collected,
    * re-emitted as a local relation fit for `write.parquet`.
    */
  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      ksub: Int): DataFrame = {
    require(ksub > 0, s"ksub must be positive, got $ksub")
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = corpus.orderBy(col(idCol)).limit(ksub)
      .select(quantize(col(vecCol)).as("qv")).collect()
      .map(_.getSeq[Long](0)).zipWithIndex
      .map { case (cw, i) => (i, cw) }.toSeq
    require(rows.nonEmpty, "pqCodebook: corpus is empty")
    rows.toDF("code", "cqv")
  }

  /** Encode vectors against a STORED codebook without retraining — the
    * PQ sibling of [[ivfAssign]], the second half of incremental
    * vector-index maintenance: a compressed corpus at rest is
    * (id, m codes) per row, and a daily ingest batch must join it
    * WITHOUT re-deriving the codewords (re-training re-codes history —
    * a full rewrite of the index). The bounded codebook is collected
    * once and re-emitted as literals (the [[pqTopK]] shape), so the
    * encode is ONE map-only pass over the batch: no join, no shuffle,
    * history untouched.
    *
    * @param codebookDf (code: int, cqv: array&lt;long&gt;) —
    *                   [[pqCodebook]]'s output, live or read back from
    *                   its parquet artifact
    * @return (vec_id, codes: array&lt;long&gt;), code j = argmin
    *         subspace-j squared-L2 to the codewords, ties to the
    *         lowest code
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, codebookDf: DataFrame): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val cbRows = codebookDf.orderBy(col("code"))
      .select(col("cqv")).collect().map(_.getSeq[Long](0))
    require(cbRows.nonEmpty, "pqEncode: empty codebook")
    def cbLit(j: Int): Column = array(cbRows.map(cw =>
      array(cw.slice(j * sub, (j + 1) * sub).map(lit(_)): _*)): _*)
    def subdist(a: Column, b: Column): Column =
      graft.functions.SqDistLong.sq_dist_long(a, b)
    def dists(j: Int): Column =
      transform(cbLit(j), c => subdist(slice(col("__qv"), j * sub + 1, sub), c))
    df.select(col(idCol).cast("long").as("vec_id"),
        quantize(col(vecCol)).as("__qv"))
      .select(col("vec_id"), array((0 until m).map { j =>
        val d = dists(j)
        array_position(d, array_min(d)) - 1
      }: _*).as("codes"))
  }

  /** The IVF-PQ COARSE-CENTER artifact: the `centroids` smallest-id
    * corpus vectors in [[quantize]] space keyed by their vector id —
    * [[ivfpqTopK]]'s deterministic default-center seam as a persistable
    * (cid, c_qv) table. Bounded: `centroids` rows collected and
    * re-emitted. */
  def ivfpqCoarse(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Int): DataFrame = {
    require(centroids > 0, s"centroids must be positive, got $centroids")
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = corpus.orderBy(col(idCol)).limit(centroids)
      .select(col(idCol).cast("long"), quantize(col(vecCol)))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    require(rows.nonEmpty, "ivfpqCoarse: corpus is empty")
    rows.toDF("cid", "c_qv")
  }

  /** The IVF-PQ RESIDUAL-CODEBOOK artifact: residuals of the `ksub`
    * smallest-id corpus vectors under their assignment to the stored
    * coarse centers, coded 0..ksub−1 in id order — the second bounded
    * table a persisted IVFADC index consists of. All arithmetic is
    * exact integers on ≤ ksub·dim driver values. */
  def ivfpqResidualCodebook(corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, ksub: Int, coarseDf: DataFrame): DataFrame = {
    require(ksub > 0, s"ksub must be positive, got $ksub")
    val spark = corpus.sparkSession
    import spark.implicits._
    val coarse = coarseDf.orderBy(col("cid"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    require(coarse.nonEmpty, "ivfpqResidualCodebook: empty coarse centers")
    val seeds = corpus.orderBy(col(idCol)).limit(ksub)
      .select(col(idCol).cast("long"), quantize(col(vecCol)))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    require(seeds.nonEmpty, "ivfpqResidualCodebook: corpus is empty")
    val rows = seeds.zipWithIndex.map { case ((_, qv), i) =>
      // nearest coarse center by exact integer L2, ties to lowest cid
      // (coarse is cid-sorted, minBy keeps the first minimum)
      val (_, cqv) = coarse.minBy { case (_, cq) =>
        qv.zip(cq).map { case (x, y) => val d = x - y; d * d }.sum }
      (i, qv.zip(cqv).map { case (x, y) => x - y })
    }.toSeq
    rows.toDF("code", "rv")
  }

  /** Encode vectors against a STORED IVF-PQ index (coarse centers +
    * residual codebook) without retraining — the IVFADC completion of
    * the incremental family ([[ivfAssign]] assigns, [[pqEncode]]
    * flat-codes; this does both through the residual, producing the
    * (cid, codes) row the compressed index stores per vector). Both
    * artifacts are bounded, collected once, and re-emitted as literals,
    * so the encode is ONE map-only pass over the batch: no join, no
    * shuffle, history untouched.
    *
    * @return (vec_id, cid, codes: array&lt;long&gt;)
    */
  def ivfpqEncode(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, coarseDf: DataFrame, codebookDf: DataFrame): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    val coarse = coarseDf.orderBy(col("cid"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    require(coarse.nonEmpty, "ivfpqEncode: empty coarse centers")
    val cb = codebookDf.orderBy(col("code"))
      .select(col("rv")).collect().map(_.getSeq[Long](0))
    require(cb.nonEmpty, "ivfpqEncode: empty codebook")
    def l2(a: Column, b: Column): Column =
      graft.functions.SqDistLong.sq_dist_long(a, b)
    val centArr = array(coarse.map { case (_, cq) =>
      array(cq.map(lit(_)): _*) }: _*)
    val cidArr = array(coarse.map(c => lit(c._1)): _*)
    def cbLit(j: Int): Column = array(cb.map(cw =>
      array(cw.slice(j * sub, (j + 1) * sub).map(lit(_)): _*)): _*)
    df.select(col(idCol).cast("long").as("vec_id"),
        quantize(col(vecCol)).as("__qv"))
      // array_position finds the FIRST minimum — lowest-cid tie-break
      // (centers are cid-sorted in the literal)
      .withColumn("__d", transform(centArr, c => l2(col("__qv"), c)))
      .withColumn("__i",
        array_position(col("__d"), array_min(col("__d"))).cast("int"))
      .withColumn("__rv", zip_with(col("__qv"),
        element_at(centArr, col("__i")), (x, y) => x - y))
      .select(col("vec_id"), element_at(cidArr, col("__i")).as("cid"),
        array((0 until m).map { j =>
          val d = transform(cbLit(j),
            c => l2(slice(col("__rv"), j * sub + 1, sub), c))
          array_position(d, array_min(d)) - 1
        }: _*).as("codes"))
  }

  /** IVF-PQ ANN (IVFADC, Jégou et al. 2011 §IV): the FAISS-standard
    * composite — a coarse inverted-file quantizer restricts each query to
    * its `nProbe` nearest cells, and within a cell candidates are scored
    * by product-quantized RESIDUALS (vector − its cell center) via the
    * same asymmetric-distance LUT as [[pqTopK]]. Residual encoding is
    * what makes the composite beat flat PQ: residuals concentrate near
    * zero, so `ksub` codewords cover them far more densely than they
    * cover raw vectors.
    *
    * Scale shape — strictly better than either parent:
    *   - both the coarse centers (`centroids` rows) and the PQ codebook
    *     (`ksub` rows) are bounded, collected once, and re-emitted as
    *     literals, so corpus assignment + residual + encode is ONE narrow
    *     map-only pass (no join, no shuffle); the corpus at rest is
    *     (cid, m codes) per row
    *   - scoring joins on cid against the broadcast probe set, so each
    *     query pays nProbe/centroids of the corpus instead of a full
    *     scan, at m LUT lookups per candidate
    *   - the k-capped heap ([[graft.functions.TopKByScore]]) bounds what
    *     crosses the only shuffle
    *
    * Determinism contract (the [[pqTopK]] playbook): ×1000
    * integer-quantized vectors make every squared-L2 exact; coarse
    * centers default to the `centroids` smallest-id corpus vectors, the
    * PQ codebook to the residuals of the `ksub` smallest-id corpus
    * vectors (both id-space agnostic); every argmin ties to the lowest
    * cid/code, ranking ties to the lowest neighbor id. A corpus vector
    * lives in exactly one cell, so no cross-probe candidate dedup is
    * needed (unlike [[ivfTopK]]'s multi-probe distinct).
    *
    * `centroidsDf` is the trained-center seam: a (cid: long,
    * c_qv: array&lt;long&gt;) frame ALREADY in [[quantize]] space —
    * [[kmeansQuantizedMeans]] produces exactly this shape. When given,
    * it replaces the smallest-id coarse centers (the deployment
    * configuration); the codebook residuals then concentrate around the
    * trained cells.
    *
    * @return (q_id, n_id, rank, dist): ≤ k rows per query ranked by
    *         ascending approximate squared-L2 residual distance
    */
  def ivfpqTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      centroids: Int, nProbe: Int, m: Int, ksub: Int, k: Int,
      centroidsDf: DataFrame = null): DataFrame = {
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(centroids > 0 && nProbe > 0 && ksub > 0,
      s"centroids/nProbe/ksub must be positive")
    val sub = dim / m
    val centRows: Array[(Long, Seq[Long])] =
      (if (centroidsDf != null)
        centroidsDf.select(col("cid").cast("long"), col("c_qv"))
      else
        corpus.orderBy(col(idCol)).limit(centroids)
          .select(col(idCol).cast("long"), quantize(col(vecCol))))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    require(centRows.nonEmpty, "ivfpqTopK: corpus is empty")
    def l2(a: Seq[Long], b: Seq[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) =>
        val d = x - y; d * d }.sum
    // codebook = residuals of the ksub smallest-id rows vs their own
    // nearest center (computed driver-side: ksub·dim ints, bounded)
    val cbRows: Array[Seq[Long]] =
      corpus.orderBy(col(idCol)).limit(ksub)
        .select(quantize(col(vecCol)))
        .collect().map { r =>
          val v = r.getSeq[Long](0)
          val cv = centRows.minBy { case (cid, c) => (l2(v, c), cid) }._2
          v.zip(cv).map { case (x, y) => x - y }
        }
    val cidLit = array(centRows.map(c => lit(c._1)): _*)
    val centVecLit = array(centRows.map(c =>
      array(c._2.map(lit(_)): _*)): _*)
    def cbLit(j: Int): Column = array(cbRows.map(cw =>
      array(cw.slice(j * sub, (j + 1) * sub).map(lit(_)): _*)): _*)
    def sqdist(a: Column, b: Column): Column =
      graft.functions.SqDistLong.sq_dist_long(a, b)
    // nP nearest cells of __qv as array<struct<d,cid,cv>> — array_sort's
    // natural struct order (d, then cid) IS the tie-break contract
    def probes(nP: Int): Column = slice(array_sort(
      transform(sequence(lit(0), lit(centRows.length - 1)), i => struct(
        sqdist(col("__qv"), element_at(centVecLit, i + 1)).as("d"),
        element_at(cidLit, i + 1).as("cid"),
        element_at(centVecLit, i + 1).as("cv")))), 1, nP)
    def residual(cv: Column): Column = zip_with(col("__qv"), cv, _ - _)
    def encode(res: Column): Column = array((0 until m).map { j =>
      val d = transform(cbLit(j), cw => sqdist(slice(res, j * sub + 1, sub), cw))
      // array_position finds the FIRST minimum — lowest-code tie-break
      (array_position(d, array_min(d)) - 1).cast("int")
    }: _*)

    val c = corpus
      .select(col(idCol).as("n_id"), quantize(col(vecCol)).as("__qv"))
      .withColumn("__cell", element_at(probes(1), 1))
      .select(col("n_id"), col("__cell.cid").as("cid"),
        encode(residual(col("__cell.cv"))).as("codes"))
    val q = queries
      .select(col(idCol).as("q_id"), quantize(col(vecCol)).as("__qv"))
      .select(col("q_id"), col("__qv"), explode(probes(nProbe)).as("__cell"))
      .withColumn("__res", residual(col("__cell.cv")))
      .select(col("q_id"), col("__cell.cid").as("cid"),
        array((0 until m).map(j => transform(cbLit(j),
          cw => sqdist(slice(col("__res"), j * sub + 1, sub), cw))): _*)
          .as("lut"))
    val scored = c.join(broadcast(q), Seq("cid"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("dist", aggregate(
        zip_with(col("codes"), col("lut"),
          (cd, row) => element_at(row, cd + 1)),
        lit(0L), _ + _))
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.top_k_by_score(
        -col("dist").cast("double"), col("n_id").cast("long"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("q_id"), col("t.id").as("n_id"),
        (col("r0") + 1).cast("int").as("rank"),
        (-col("t.score")).cast("long").as("dist"))
  }

  /** Two-stage IVF-PQ read path: [[ivfpqTopK]] proposes `nCand`
    * candidates per query from the compressed index, then the
    * SURVIVORS ONLY are re-ranked by the exact (integer-quantized)
    * full-vector squared L2 and the top `k` kept — the standard
    * candidate→refine deployment read of every production vector store
    * (Jégou et al. 2011 §IV.E's re-ranking stage).
    *
    * Scale shape: stage 1 never touches full vectors beyond the scan
    * that encoded them; stage 2 touches exactly |Q|·nCand corpus rows —
    * the bounded candidate set BROADCASTS into the corpus scan (one
    * map-side semi-join-like hash join, no corpus shuffle), and the
    * k-capped heap again bounds the final shuffle. The recall knob is
    * nCand (pay more exact distances, recover more of the PQ
    * quantization loss) — `ann_recall_*` measures exactly that gap.
    *
    * @return (q_id, n_id, rank, dist): ≤ k rows per query ranked by
    *         ascending EXACT quantized squared-L2 distance
    */
  def ivfpqRefinedTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      centroids: Int, nProbe: Int, m: Int, ksub: Int,
      nCand: Int, k: Int): DataFrame = {
    require(nCand >= k, s"nCand=$nCand must be >= k=$k")
    val cand = ivfpqTopK(queries, corpus, idCol, vecCol, dim,
      centroids, nProbe, m, ksub, k = nCand)
      .select(col("q_id"), col("n_id"))
    val qv = queries.select(col(idCol).as("q_id"),
      quantize(col(vecCol)).as("__qv"))
    val nv = corpus.select(col(idCol).as("n_id"),
      quantize(col(vecCol)).as("__nv"))
    def sqdist(a: Column, b: Column): Column =
      graft.functions.SqDistLong.sq_dist_long(a, b)
    // candidate set is |Q|·nCand by construction — broadcast it into
    // the corpus scan so the exact re-read is one map-side hash join
    nv.join(broadcast(cand), Seq("n_id"))
      .join(broadcast(qv), Seq("q_id"))
      .withColumn("dist", sqdist(col("__qv"), col("__nv")))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.top_k_by_score(
        -col("dist").cast("double"), col("n_id").cast("long"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("q_id"), col("t.id").as("n_id"),
        (col("r0") + 1).cast("int").as("rank"),
        (-col("t.score")).cast("long").as("dist"))
  }

  /** Distributed spherical k-means over integer-quantized vectors (Lloyd
    * iterations: assign to the max-cosine centroid, recompute centers).
    *
    * Centroids are element-wise integer SUMS, not means — cosine is
    * scale-invariant, so dividing by the member count buys nothing and
    * would reintroduce float averaging (whose summation order varies per
    * partitioning). Each iteration is one broadcast of the k centers plus
    * one (cid, dim) shuffle of exploded elements — the textbook
    * scale-out shape; nothing grows with corpus size except the narrow
    * explode.
    *
    * @return (cid, c_v: array<double>) — feed straight into
    *         [[ivfTopK]]'s `centroidsDf` seam
    */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    // Iterative algorithm hygiene (what MLlib's KMeans does): the
    // quantized corpus is cached once and each iteration's k centers are
    // COLLECTED to the driver and re-broadcast as literals — without
    // this, iteration i's plan re-derives every previous iteration's
    // shuffle (lineage doubles per pass) and re-reads the source.
    val qv = corpus.select(col(idCol).cast("long").as("vid"),
      quantize(col(vecCol)).as("qv")).cache()
    def centsDf(rows: Seq[(Long, Seq[Double])]): DataFrame = {
      import spark.implicits._
      rows.toDF("cid", "c_v")
    }
    // seed = the k SMALLEST-ID vectors (TakeOrdered, id-space agnostic —
    // `vid < k` would silently yield fewer/zero seeds for ids not dense
    // from 0, e.g. hashed or offset doc ids)
    var cents: Seq[(Long, Seq[Double])] = qv.orderBy(col("vid")).limit(k)
      .select(col("vid"), transform(col("qv"), x => x.cast("double")))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    require(cents.nonEmpty, "kmeansCentroids: corpus is empty")
    for (_ <- 1 to iters) {
      // nearest center per vector; ties break to the lowest cid (the
      // oracle's ROW_NUMBER ... ORDER BY cos DESC, cid)
      val c = centsDf(cents)
      val assigned = qv.join(broadcast(c), lit(true))
        .withColumn("cos",
          dot(col("qv"), col("c_v"), dim) /
            (sqrt(dot(col("qv"), col("qv"), dim)) *
              sqrt(dot(col("c_v"), col("c_v"), dim))))
        .groupBy(col("vid"))
        .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"),
          first(col("qv")).as("qv")) // qv is constant within the group
      cents = assigned
        .select(col("cid"), posexplode(col("qv")).as(Seq("d", "x")))
        .groupBy(col("cid"), col("d")).agg(sum(col("x")).as("sx"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("sx")))),
          e => e.getField("sx").cast("double")).as("c_v"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    }
    qv.unpersist()
    centsDf(cents)
  }

  /** Trained cell centers as integer MEANS in [[quantize]] space — the
    * bridge from [[kmeansCentroids]] (whose centers are element-wise
    * SUMS, fine for cosine but the wrong magnitude for the squared-L2
    * residuals [[ivfpqTopK]] encodes) to the PQ family's `centroidsDf`
    * seam.
    *
    * One more broadcast assignment pass (same max-cosine/lowest-cid
    * tie-break as training) then per-cell element-wise `floor(Σqv_i/n)`.
    * The mean stays engine-exact: the sum and count are exact integers,
    * IEEE division is correctly rounded — the same double in any engine
    * — and floor of it is deterministic, unlike an integer DIV whose
    * negative-operand truncation direction differs across engines.
    *
    * @return (cid: long, c_qv: array&lt;long&gt;) — feed straight into
    *         [[ivfpqTopK]]'s `centroidsDf`
    */
  def kmeansQuantizedMeans(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iters: Int): DataFrame = {
    val cents = kmeansCentroids(corpus, idCol, vecCol, dim, k, iters)
    val qv = corpus.select(col(idCol).cast("long").as("vid"),
      quantize(col(vecCol)).as("qv"))
    qv.join(broadcast(cents), lit(true))
      .withColumn("cos",
        dot(col("qv"), col("c_v"), dim) /
          (sqrt(dot(col("qv"), col("qv"), dim)) *
            sqrt(dot(col("c_v"), col("c_v"), dim))))
      .groupBy(col("vid"))
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"),
        first(col("qv")).as("qv"))
      .select(col("cid"), posexplode(col("qv")).as(Seq("d", "x")))
      .groupBy(col("cid"), col("d"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("d"),
          floor(col("sx").cast("double") / col("n").cast("double"))
            .cast("long").as("mx")))),
        e => e.getField("mx")).as("c_qv"))
  }

  /** Assign vectors to their nearest STORED centroid (max cosine, ties
    * to the lowest cid) without retraining — the daily-ingest half of
    * IVF index maintenance. A vector index at corpus scale is not
    * retrained per batch: centers are a persisted artifact (bounded —
    * k·dim values, the same seam [[ivfTopK]]'s `centroidsDf` reads),
    * and each new batch pays ONE broadcast map-side pass to join the
    * index. History is never rescanned; recall drift against a fresh
    * rebuild is a separate report ([[recallAtK]] over both indexes —
    * the `ann_recall_stale` gate), which is what tells the pipeline
    * when a retrain is actually due.
    *
    * @param centroidsDf (cid: long, c_v: array&lt;double&gt;) — exactly
    *                    [[kmeansCentroids]]'s output, live or read back
    *                    from its parquet artifact
    * @return (vec_id, cid) one row per input vector
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      centroidsDf: DataFrame): DataFrame = {
    val cents = centroidsDf.select(col("cid"), col("c_v"))
    // zero-norm guard: cosine's norm product would be 0 -> NaN, and NaN
    // sorts ABOVE every double, so max_by would silently assign an
    // arbitrary cid; fail loud instead (repo convention, same as
    // linkPrediction's packing guards)
    val nrmProd = sqrt(dot(col("__v"), col("__v"), dim)) *
      sqrt(dot(col("c_v"), col("c_v"), dim))
    df.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("__v"))
      .join(broadcast(cents), lit(true))
      .withColumn("__cos",
        when(nrmProd === 0d, raise_error(lit(
          "ivfAssign: zero-norm vector or centroid (cosine undefined)")))
          .otherwise(dot(col("__v"), col("c_v"), dim) / nrmProd))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("__cos"), -col("cid"))).as("cid"))
  }

  /** IVF (inverted-file) ANN: the corpus is partitioned once into
    * `centroids` cells (nearest-centroid assignment — one broadcast pass,
    * no shuffle of the corpus beyond the cell grouping), and each query
    * probes only its `nProbe` nearest cells. Expected candidates per
    * query: nProbe/centroids of the corpus — the classic recall/cost dial.
    *
    * Centroid choice is a seam: here the `centroids` smallest-id corpus
    * vectors serve as cell centers (deterministic, oracle-reproducible,
    * id-space agnostic); a real deployment would feed k-means centers in
    * via `centroidsDf` — the plumbing (assign → probe → score → bounded
    * top-k) is identical.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      centroids: Int, nProbe: Int, k: Int,
      centroidsDf: DataFrame = null): DataFrame = {
    val cents0 =
      if (centroidsDf != null) centroidsDf
      else corpus.orderBy(col(idCol)).limit(centroids)
    val cents = cents0.select(col(idCol).cast("long").as("cid"),
      col(vecCol).as("c_v"),
      sqrt(dot(col(vecCol), col(vecCol), dim)).as("c_nrm"))

    // nearest cell per corpus vector: broadcast the (small) centroid set,
    // keep the best cell via the same k-capped aggregate (k=1)
    def assign(df: DataFrame, id: String, keep: Int): DataFrame = {
      val v = df.select(col(id).as("a_id"), col(vecCol).as("a_v"),
        sqrt(dot(col(vecCol), col(vecCol), dim)).as("a_nrm"))
      val scored = v.join(broadcast(cents), lit(true))
        .select(col("a_id"), col("cid"),
          (dot(col("a_v"), col("c_v"), dim) / (col("a_nrm") * col("c_nrm")))
            .as("c_cos"))
      scored.groupBy(col("a_id"))
        .agg(graft.functions.TopKByScore.top_k_by_score(
          col("c_cos"), col("cid"), keep).as("cells"))
        .select(col("a_id"), explode(col("cells.id")).as("cid"))
    }

    val corpusCells = corpus
      .select(col(idCol).as("n_id"), col(vecCol).as("n_v"),
        sqrt(dot(col(vecCol), col(vecCol), dim)).as("n_nrm"))
      .join(assign(corpus, idCol, 1).withColumnRenamed("a_id", "n_id"), "n_id")
    val queryCells = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
        sqrt(dot(col(vecCol), col(vecCol), dim)).as("q_nrm"))
      .join(assign(queries, idCol, nProbe).withColumnRenamed("a_id", "q_id"), "q_id")

    val scored = corpusCells.join(broadcast(queryCells), Seq("cid"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos",
        dot(col("q_v"), col("n_v"), dim) / (col("q_nrm") * col("n_nrm")))
      // a candidate can appear via several probed cells — dedup before rank
      .select(col("q_id"), col("n_id"), col("cos")).distinct()
    topK(scored, k)
  }

  /** [[ivfTopK]] over a PRE-ASSIGNED cell store: the corpus side comes
    * in as the persisted (idCol, cid, vecCol) cells table — the layout
    * an IVF index actually stores — so the search reads memberships
    * from the artifact instead of re-assigning the corpus. This is the
    * read path after store maintenance (incremental adds, takedown
    * rewrites): queries probe nProbe cells against the stored
    * centroids and score only the stored members of those cells.
    */
  def ivfTopKAssigned(queries: DataFrame, cells: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      nProbe: Int, k: Int, centroidsDf: DataFrame): DataFrame = {
    val cents = centroidsDf.select(col("cid"), col("c_v"),
      sqrt(dot(col("c_v"), col("c_v"), dim)).as("c_nrm"))
    val corpusCells = cells
      .select(col(idCol).as("n_id"), col("cid"), col(vecCol).as("n_v"),
        sqrt(dot(col(vecCol), col(vecCol), dim)).as("n_nrm"))
    val queryCells = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
        sqrt(dot(col(vecCol), col(vecCol), dim)).as("q_nrm"))
      .join(broadcast(cents), lit(true))
      .select(col("q_id"), col("q_v"), col("q_nrm"), col("cid"),
        (dot(col("q_v"), col("c_v"), dim) / (col("q_nrm") * col("c_nrm")))
          .as("c_cos"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.top_k_by_score(
          col("c_cos"), col("cid"), nProbe).as("cells"),
        first(col("q_v")).as("q_v"), first(col("q_nrm")).as("q_nrm"))
      .select(col("q_id"), col("q_v"), col("q_nrm"),
        explode(col("cells.id")).as("cid"))
    val scored = corpusCells.join(broadcast(queryCells), Seq("cid"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos",
        dot(col("q_v"), col("n_v"), dim) / (col("q_nrm") * col("n_nrm")))
      .select(col("q_id"), col("n_id"), col("cos")).distinct()
    topK(scored, k)
  }

  /** Top principal direction of the embedding cloud (uncentered — the
    * dominant eigenvector of the second-moment/Gram matrix), computed
    * the way PCA actually scales: ONE distributed pass builds the exact
    * integer dim×dim Gram, then power iteration runs on the DRIVER
    * where the matrix is dim² longs — bounded state, like
    * [[kmeansCentroids]]'s k·dim collect. The corpus is never
    * collected, never broadcast, and the Gram pass is map-side partial
    * aggregation onto dim² keys (each input row contributes dim²
    * products that combine before any shuffle).
    *
    * Engine-exact: vectors are milli-quantized ([[quantize]]), Gram
    * cells are exact integer sums, and each power round is an integer
    * matvec followed by an integer renormalization
    * `w'_j = sign(v_j) · (|v_j| · 2^20) DIV max|v|` (the 128-bit product
    * in BigInt / HUGEINT), so the oracle unrolls identical rounds and
    * matches bit-for-bit. Fixed `rounds`, the iterative contract.
    *
    * Uses: dominant-direction removal (the "all embeddings share a
    * common component" artifact — Mu & Viswanath 2018's postprocessing),
    * whitening preconditioners, drift monitoring between corpus
    * versions.
    *
    * Overflow contract: |q| ≤ 1000·max|v|, Gram cells ≤ N·10⁶·max|v|²,
    * matvec ≤ dim·2^20·that — safe in BIGINT for N·max|v|² up to ~10¹⁴
    * at dim 64 (the renormalized w never exceeds 2^20).
    *
    * @return (dim_pos 0..dim-1, component): the quantized direction,
    *         max-|component| = 2^20 by construction
    */
  def topComponent(corpus: DataFrame, vecCol: String, dim: Int,
      rounds: Int): DataFrame = {
    val spark = corpus.sparkSession
    val w = topComponentVector(corpus, vecCol, dim, rounds)
    import spark.implicits._
    w.toSeq.zipWithIndex.map { case (c, j) => (j, c) }
      .toDF("dim_pos", "component")
  }

  /** [[topComponent]]'s driver-side core: the quantized direction as an
    * array (the bounded dim-long driver value downstream operators — the
    * residualizer — fold back in as literals). */
  private[ops] def topComponentVector(corpus: DataFrame, vecCol: String,
      dim: Int, rounds: Int): Array[Long] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val q = corpus.select(quantize(col(vecCol)).as("qv"))
    // exact Gram, distributed: double index expansion fans each row out
    // to dim² (j, k, x·y) terms map-side; hash aggregation combines onto
    // the dim² key space BEFORE the shuffle, so shuffle volume is
    // #partitions × dim² regardless of corpus size
    val gRows = q
      .select(col("qv"), posexplode(col("qv")).as(Seq("j", "x")))
      .select(col("j"), col("x"), posexplode(col("qv")).as(Seq("k", "y")))
      .groupBy(col("j"), col("k"))
      .agg(sum(col("x") * col("y")).as("g"))
      .collect() // bounded: dim² rows (the kmeans collect contract)
    require(gRows.nonEmpty, "topComponent: corpus is empty")
    val g = Array.ofDim[Long](dim, dim)
    gRows.foreach(r => g(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    val scale = 1L << 20
    var w = Array.fill(dim)(scale)
    for (_ <- 1 to rounds) {
      val wp = Array.tabulate(dim) { j =>
        var acc = 0L; var k = 0
        while (k < dim) { acc += g(j)(k) * w(k); k += 1 }
        acc
      }
      val m = wp.map(math.abs).max
      require(m > 0L, "topComponent: matvec collapsed to zero " +
        "(rank-deficient Gram with an orthogonal start vector)")
      w = wp.map(v =>
        (if (v < 0) -1L else 1L) *
          ((BigInt(math.abs(v)) * scale) / m).toLong)
    }
    w
  }

  /** Dominant-direction removal (Mu & Viswanath 2018's "all-but-the-top"
    * postprocess, first direction): subtract each embedding's projection
    * onto [[topComponent]]'s direction, emitted EXACTLY in integers by
    * scaling with ‖w‖²:
    * {{{
    *   resid_j = q_j·(w·w) − (q·w)·w_j      // = ‖w‖²·(q − proj_w q)_j
    * }}}
    * so `resid · w = (q·w)(w·w) − (q·w)(w·w) = 0` identically — the
    * orthogonality gate is an algebraic identity, spec-asserted in
    * BigInt, and the oracle reproduces every integer bit-for-bit.
    * Dominant-direction removal is the standard fix for the "embedding
    * clouds share a large common component" artifact that washes out
    * cosine contrast (isotropy restoration before ANN/dedup).
    *
    * Scale shape: the Gram pass + dim² driver eigensolve (bounded), then
    * ONE map-only pass over the corpus — w and ‖w‖² ride along as
    * literals, nothing shuffles.
    *
    * Overflow contract: |q|·‖w‖² and |q·w|·2^20 both ≤ ~2^56 at dim 64
    * with milli-quantized unit-scale vectors — safe in BIGINT.
    *
    * @return (idCol, dim_pos 0..dim-1, resid) — the residual vector
    *         scaled by ‖w‖² (cosines downstream are scale-invariant)
    */
  def removeTopComponent(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, rounds: Int): DataFrame = {
    val w = topComponentVector(corpus, vecCol, dim, rounds)
    val ww = w.map(v => v * v).sum
    val wLit = array(w.toSeq.map(lit(_)): _*)
    corpus
      .select(col(idCol), quantize(col(vecCol)).as("qv"))
      // q·w exact in the codegen'd double loop: |terms| ≤ 2^30, 64-term
      // sums ≪ 2^53 — integer-valued, cast back loss-free
      .withColumn("__d", dot(col("qv"),
        array(w.toSeq.map(x => lit(x.toDouble)): _*), dim).cast("long"))
      .select(col(idCol), col("__d"),
        posexplode(col("qv")).as(Seq("dim_pos", "__q")))
      .select(col(idCol), col("dim_pos").cast("int").as("dim_pos"),
        (col("__q") * lit(ww) -
          col("__d") * element_at(wLit, col("dim_pos") + 1)).as("resid"))
  }

  /** Deterministic random-projection dimensionality reduction — the
    * Johnson–Lindenstrauss sketch of the embedding column: out[j] =
    * Σ_d floor(e[d]·1000) · w(d, j), with the same integer weight
    * lattice as the hyperplane LSH ([[planeWeight]]: zero-mean values
    * in [−6, 6] derived from (d, j) alone, so any engine regenerates
    * the matrix from two loop indices — nothing is stored or shipped).
    * Milli-quantizing the inputs first makes every output an exact
    * integer: the projection is engine-reproducible and mergeable
    * downstream (a dot product in projected space is still an integer).
    *
    * Use it to cut ANN/clustering cost ~dim/outDim while approximately
    * preserving pairwise distances (J-L): project once, index the
    * short vectors, re-rank survivors against the full vectors.
    *
    * Map-only — no shuffle, no state. The unrolled element_at chain is
    * fine for a one-off projection pass; if this enters a per-query hot
    * path, generalize [[graft.functions.HyperplaneBucket]]'s native
    * loop (same fold, accumulating sums instead of sign bits).
    */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int): DataFrame = {
    require(dim >= 1 && outDim >= 1, s"dims must be >= 1, got $dim/$outDim")
    val comps = (0 until outDim).map { j =>
      (0 until dim).map { d =>
        expr(s"CAST(floor(CAST(element_at($vecCol, ${d + 1}) AS DOUBLE)" +
          s" * 1000) AS BIGINT) * ${planeWeight(d, j)}L")
      }.reduce(_ + _).as(s"p$j")
    }
    df.select(col(idCol) +: comps: _*)
  }

  /** ANN quality report: per-query recall of an approximate result
    * against the exact one. Both inputs are (q_id, n_id) top-k frames
    * (any extra columns ignored); output is one row per query with the
    * exact-neighbor count and how many the approximate index recovered
    * — recall@k = hits / n_exact, left as integers so the report is
    * engine-exact. The join is equi on (q_id, n_id) over two k-bounded
    * frames: #queries × k rows a side no matter the corpus size. The
    * approx side is deduped first so a caller passing a frame with
    * repeated (q_id, n_id) rows cannot fan out the join and silently
    * inflate both counts.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select(col("q_id"), col("n_id"))
      .join(approx.select(col("q_id"), col("n_id")).distinct()
          .withColumn("__hit", lit(1L)),
        Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("hits"))

  /** Pairwise cosine similarity between per-label embedding centroids —
    * the "how close are my sources/classes in embedding space" report
    * that sizes cross-domain dedup thresholds and flags label leakage
    * (two labels with cos ≈ 1 are the same distribution twice).
    *
    * Engine-exact by the repo's integer discipline: components quantize
    * to milli-units (`floor(e * 1000)` — exact double product + floor in
    * any IEEE engine), per-(label, dim) sums are exact integers, and the
    * UN-normalized integer sum serves as the centroid — cosine is
    * scale-invariant, so skipping the count division avoids any floor-
    * vs-truncate ambiguity across engines. The final cosine is one
    * fixed shape of correctly-rounded double ops quantized to
    * `cos_micro`.
    *
    * Shape at scale: `posexplode` is a narrow map (rows × dim), the only
    * shuffle is the partial-aggregated (label, dim) sum, and everything
    * after folds a #labels × dim table — bounded, broadcast-sized.
    * Bounds: |e| ≤ 1 ⇒ component sums stay < 2^53/dim up to ~10^11 rows
    * per label; beyond that the sums upgrade to DECIMAL(38,0).
    */
  /** Embedding outliers per label: rows whose cosine to their OWN
    * label's centroid sits more than `sigmas` standard deviations
    * below the label mean — the mislabeled-or-noise screen run before
    * treating labels as supervision (SemDeDup's pruning cousin).
    *
    * Engine-exact end to end: milli-unit integer vectors, un-normalized
    * integer-sum centroids (cosine scale-invariance again), one fixed
    * double shape quantized to `cos_micro`, then LOW-TAIL-only
    * cross-multiplied moments on those integers —
    * `(S - n·v) > 0 AND (n·v - S)^2 > sigmas^2 · (n·SS - S^2)` — no
    * sqrt, no division, no float accumulation.
    *
    * Shape at scale: centroids are the bounded #labels × dim table
    * (broadcast); scoring is map-only against it; the moment pass is
    * one partial-aggregated fold keyed by label. Bounds: |cos_micro| ≤
    * 10^6 keeps every moment under 2^63 to ~10^6 rows per label;
    * beyond, DECIMAL(38,0) sums.
    */
  def labelOutliers(emb: DataFrame, idCol: String, labelCol: String,
      vecCol: String, sigmas: Int): DataFrame = {
    require(sigmas >= 1, s"sigmas must be >= 1, got $sigmas")
    val qvt = emb.select(col(idCol), col(labelCol).as("label"),
      expr(s"transform($vecCol, e -> CAST(FLOOR(CAST(e AS DOUBLE) * 1000.0D) AS BIGINT))")
        .as("qv"))
    val cen = qvt
      .select(col("label"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("v")).as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)")
        .as("cv"))
    val scored = qvt.join(broadcast(cen), "label")
      .withColumn("__a", col("qv").cast("array<double>"))
      .withColumn("__b", col("cv").cast("array<double>"))
      .withColumn("cos_micro",
        floor(dot(col("__a"), col("__b"), 0) /
            (sqrt(dot(col("__a"), col("__a"), 0)) * sqrt(dot(col("__b"), col("__b"), 0))) *
            lit(1000000.0)).cast("long"))
      .select(col(idCol), col("label"), col("cos_micro"))
    val stats = scored.groupBy(col("label")).agg(
      count(lit(1)).as("__n"),
      sum(col("cos_micro")).as("__s"),
      sum(col("cos_micro") * col("cos_micro")).as("__ss"))
    val dev = col("__n") * col("cos_micro") - col("__s")
    scored.join(broadcast(stats), "label")
      .filter((col("__s") - col("__n") * col("cos_micro")) > 0 &&
        dev * dev > lit(sigmas.toLong * sigmas) *
          (col("__n") * col("__ss") - col("__s") * col("__s")))
      .select(col(idCol), col("label"), col("cos_micro"))
  }

  def labelCentroidSimilarity(emb: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val cen = emb
      .select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "e")))
      .withColumn("qv", floor(col("e").cast("double") * lit(1000.0)).cast("long"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("qv")).as("c"))
    val norms = cen.groupBy(col("label"))
      .agg(sum(col("c") * col("c")).as("nrm"))
    val a = cen.select(col("label").as("la"), col("pos"), col("c").as("ca"))
    val b = cen.select(col("label").as("lb"), col("pos"), col("c").as("cb"))
    a.join(b, Seq("pos")).filter(col("la") < col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(sum(col("ca") * col("cb")).as("dot"))
      .join(broadcast(norms.select(col("label").as("la"), col("nrm").as("na"))), "la")
      .join(broadcast(norms.select(col("label").as("lb"), col("nrm").as("nb"))), "lb")
      .select(col("la"), col("lb"),
        floor(col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))) *
            lit(1000000.0)).cast("long").as("cos_micro"))
  }
}
