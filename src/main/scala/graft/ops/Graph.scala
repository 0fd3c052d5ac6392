package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge tables — the link-analysis
  * sibling of [[Dedup]]'s connected components. Reference pipelines use
  * PageRank-style scores as document-quality priors (a crawl host graph:
  * pages endorsed by well-linked hosts outrank link farms), so the
  * engine ships it as a first-class, oracle-verifiable operator.
  */
object Graph {

  /** Scale-adaptive parallelism bound for CHECKPOINTED iteration state
    * (guide §2.2 "fewer, larger partitions"): coalesce the materialized
    * frame so each downstream map task sees at least `rowsPerPart` rows
    * instead of inheriting the global shuffle-partition count. The
    * fixed-point loops iterate over kilobyte-to-megabyte state; at
    * `local[32]` every per-round scan/partial-aggregate otherwise runs
    * 20-40 near-empty tasks whose per-task setup + allocator contention
    * dominate (measured on graph_reach_hll: 54.9 s summed task time at
    * 32 cores vs 4.9 s for the identical plan at 8 — an 11x inflation;
    * plans/r14). The bound derives from the state's OWN row count —
    * a count() over already-checkpointed blocks, one cheap job — so a
    * 100 TB frontier keeps full parallelism while a kilobyte one stops
    * paying for it; nothing here reads the core count.
    * `coalesce` on a materialized RDD is a narrow dependency: no
    * exchange is added and row order inside surviving partitions is
    * preserved (it only concatenates), so results are bit-identical. */
  private def boundStateParallelism(df: DataFrame,
      rowsPerPart: Long = 250000L): DataFrame = {
    val parts = df.rdd.getNumPartitions
    // AQE usually already coalesced the materializing exchange down to a
    // handful of partitions; skip the sizing job when there is nothing
    // left to win (4 partitions of tiny state cost ~nothing per round)
    if (parts <= 4) return df
    val rows = df.count()
    val target = math.max(1L, math.min(parts.toLong,
      (rows + rowsPerPart - 1) / rowsPerPart)).toInt
    if (target < parts) df.coalesce(target) else df
  }

  /** PageRank in exact integer ppm arithmetic — engine-reproducible
    * (no floats, so iteration order and summation order cannot change a
    * bit) and therefore verifiable against a SQL oracle that unrolls the
    * same rounds.
    *
    * Update rule per round, all BIGINT:
    * {{{
    *   contrib(u)  = pr(u) DIV outdeg(u)
    *   pr'(v)      = (10^6 − damping) + (damping · Σ_{u→v} contrib(u)) DIV 10^6
    * }}}
    * i.e. the classic damped rank with mass in parts-per-million of the
    * per-node uniform start (pr₀ = 10^6). The caller's edge table must
    * give every node at least one out-edge (feed an undirected graph as
    * both directions, as [[graph_pagerank]]'s registry query does) —
    * dangling-mass redistribution is deliberately out of the contract so
    * the oracle stays a pure equi-join per round.
    *
    * Shape at scale: one `groupBy(dst)` partial-aggregated shuffle per
    * round on a compact long key; the static (src, dst, outdeg) relation
    * is checkpointed once and re-joined each round (at cluster scale:
    * pre-partition both sides on the join key — the shuffle is then
    * reused across all rounds); rank lineage is cut every
    * `checkpointEvery` rounds exactly like the connected-components
    * loop, so plan depth stays bounded at any iteration count. Nothing
    * ever reaches the driver. Overflow bound: rank is conserved-ish mass,
    * so a single hub can accumulate up to the TOTAL graph mass ≈ n·10^6
    * ppm (not 10^6 per contributor) — the safe condition is
    * dampingPpm · n · 10^6 < 2^63, i.e. n up to ~10^10 nodes at
    * damping 0.85. Star-like graphs approach the bound fastest; shard the
    * rank scale (smaller ppm base) past that size.
    *
    * @param edges (src: long, dst: long) directed edge list; duplicate
    *              edges count twice (pre-distinct if that's not wanted)
    * @return (node, pr_ppm) for every node with at least one out-edge
    */
  def pageRank(edges: DataFrame, iters: Int = 4, dampingPpm: Long = 850000L,
      checkpointEvery: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPpm >= 0 && dampingPpm <= 1000000,
      s"dampingPpm must be in [0, 1000000], got $dampingPpm")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__d"))
    // static per-round join input, materialized once
    val eDeg = boundStateParallelism(
      e.join(deg, "src").localCheckpoint(true), 100000L)
    val nodes = deg.select(col("src").as("node"))
    val base = 1000000L - dampingPpm
    var r = nodes.withColumn("pr_ppm", lit(1000000L))
    for (i <- 1 to iters) {
      val inflow = eDeg.join(r, eDeg("src") === r("node"))
        .select(col("dst"), expr("pr_ppm DIV __d").as("__c"))
        .groupBy(col("dst"))
        .agg(sum(col("__c")).as("__in"))
      // left join back to the node universe: a node with out-edges but
      // no in-edges must keep contributing its base rank every round,
      // not silently leave the iteration after round 1
      r = nodes.join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"${dampingPpm}L * coalesce(__in, 0L) DIV 1000000")).as("pr_ppm"))
      if (i % checkpointEvery == 0 && i < iters)
        r = boundStateParallelism(r.localCheckpoint(true))
    }
    r
  }

  /** Edge-WEIGHTED PageRank: rank flows in proportion to integer edge
    * weights instead of splitting evenly —
    * {{{
    *   contrib(u→v) = pr(u) · w(u,v) DIV outW(u),  outW(u) = Σ_out w
    * }}}
    * the natural spelling when edges carry multiplicities
    * (co-occurrence counts, click volumes, citation counts): a pair of
    * parts ordered together 20 times SHOULD pull 10× the rank of a
    * one-off. Same integer-ppm discipline and truncation order as
    * [[pageRank]], so the unrolled oracle matches bit-for-bit.
    *
    * Scale shape: identical to [[pageRank]] — the static
    * (src, dst, w, outW) relation checkpoints once, one groupBy(dst)
    * partial-aggregated shuffle per round. Overflow bound now carries
    * the weight: dampingPpm · n · 10^6 · wMax < 2^63 — cap or rescale
    * weights past ~10^8-node graphs with heavy multiplicities.
    *
    * @param edges (src, dst, w) directed weighted edges, w ≥ 1 integer
    * @return (node, pr_ppm) for every node with at least one out-edge
    */
  def pageRankWeighted(edges: DataFrame, iters: Int = 4,
      dampingPpm: Long = 850000L, checkpointEvery: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPpm >= 0 && dampingPpm <= 1000000,
      s"dampingPpm must be in [0, 1000000], got $dampingPpm")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("__ow"))
    val eW = boundStateParallelism(
      e.join(outW, "src").localCheckpoint(true), 100000L)
    val nodes = outW.select(col("src").as("node"))
    val base = 1000000L - dampingPpm
    var r = nodes.withColumn("pr_ppm", lit(1000000L))
    for (i <- 1 to iters) {
      val inflow = eW.join(r, eW("src") === r("node"))
        .select(col("dst"), expr("pr_ppm * w DIV __ow").as("__c"))
        .groupBy(col("dst"))
        .agg(sum(col("__c")).as("__in"))
      r = nodes.join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"${dampingPpm}L * coalesce(__in, 0L) DIV 1000000")).as("pr_ppm"))
      if (i % checkpointEvery == 0 && i < iters)
        r = boundStateParallelism(r.localCheckpoint(true))
    }
    r
  }

  /** Personalized PageRank (Jeh & Widom 2003's topic-sensitive rank):
    * [[pageRank]]'s integer-ppm rounds, but the teleport term lands ON
    * THE SEED SET ONLY — rank flows outward from the seeds and decays
    * with graph distance, so the score IS "relevance to the seeds".
    * The curation use: seed the documents you trust (a hand-audited
    * slice, a reference corpus's neighbors) and harvest the highest-PPR
    * nodes of the similarity/co-occurrence graph as the expansion set.
    *
    * Update rule, all BIGINT (same truncation order as [[pageRank]] so
    * the unrolled oracle matches bit-for-bit):
    * {{{
    *   pr'(v) = seed(v)·(10^6 − damping)
    *          + (damping · Σ_{u→v} pr(u) DIV outdeg(u)) DIV 10^6
    * }}}
    * with pr₀ = 10^6 on seeds, 0 elsewhere. Non-seed nodes hold only
    * flowed-in mass; unreachable nodes stay at exactly 0.
    *
    * Scale shape: identical to [[pageRank]] — one groupBy(dst) shuffle
    * per round over the checkpointed static edge relation — plus ONE
    * static seed-flag join folded into the checkpointed node universe.
    * Same overflow bound (total mass ≤ |S|·10^6 ≤ n·10^6).
    *
    * @param seeds one column `node` of seed ids (dupes ignored)
    * @return (node, ppr_ppm) for every node with at least one out-edge
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iters: Int = 4, dampingPpm: Long = 850000L,
      checkpointEvery: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPpm >= 0 && dampingPpm <= 1000000,
      s"dampingPpm must be in [0, 1000000], got $dampingPpm")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__d"))
    val eDeg = boundStateParallelism(
      e.join(deg, "src").localCheckpoint(true), 100000L)
    val seedSet = seeds.select(col("node").cast("long").as("node")).distinct()
    // static node universe with the seed flag riding along — one join,
    // checkpointed, reused every round
    val nodes = deg.select(col("src").as("node"))
      .join(seedSet.withColumn("__s", lit(1L)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0L)).as("__s"))
      .localCheckpoint(true)
      .transform(boundStateParallelism(_))
    val base = 1000000L - dampingPpm
    var r = nodes.select(col("node"), (col("__s") * 1000000L).as("pr_ppm"))
    for (i <- 1 to iters) {
      val inflow = eDeg.join(r, eDeg("src") === r("node"))
        .select(col("dst"), expr("pr_ppm DIV __d").as("__c"))
        .groupBy(col("dst"))
        .agg(sum(col("__c")).as("__in"))
      r = nodes.join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (col("__s") * lit(base) +
            expr(s"${dampingPpm}L * coalesce(__in, 0L) DIV 1000000"))
            .as("pr_ppm"))
      if (i % checkpointEvery == 0 && i < iters)
        r = boundStateParallelism(r.localCheckpoint(true))
    }
    r.select(col("node"), col("pr_ppm").as("ppr_ppm"))
  }

  /** Damped PageRank WITH dangling-mass redistribution — the standard
    * formulation for a DIRECTED graph where some nodes have no
    * out-edges (crawl frontiers, citation sinks): each round the summed
    * rank of dangling nodes spreads evenly over all n nodes before
    * damping,
    * {{{
    *   pr'(v) = (10^6 − damping)
    *          + damping · (Σ_{u→v} contrib(u) + dangMass DIV n) DIV 10^6
    * }}}
    * all BIGINT, truncations in exactly this order so the unrolled SQL
    * oracle matches bit for bit. Unlike [[pageRank]], the node universe
    * is src ∪ dst — sink nodes hold rank and shed it through the
    * redistribution term instead of leaking it.
    *
    * Scale shape: [[pageRank]]'s per-round groupBy(dst) shuffle plus
    * TWO bounded extras — a 1-row dangling-mass aggregate broadcast
    * back as a 1-row nested-loop join (bounded by construction: the
    * side is a global aggregate), and a semi-join of the rank table
    * against the static dangling-id set. n is one bounded count at
    * build time (the kmeans driver-scalar pattern).
    *
    * @return (node, pr_ppm) for EVERY node of the graph
    */
  def pageRankDangling(edges: DataFrame, iters: Int = 4,
      dampingPpm: Long = 850000L, checkpointEvery: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingPpm >= 0 && dampingPpm <= 1000000,
      s"dampingPpm must be in [0, 1000000], got $dampingPpm")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__d"))
    val eDeg = boundStateParallelism(
      e.join(deg, "src").localCheckpoint(true), 100000L)
    val nodes = boundStateParallelism(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true))
    val dangIds = nodes
      .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
      .localCheckpoint(true)
    val n = nodes.count()
    val base = 1000000L - dampingPpm
    var r = nodes.withColumn("pr_ppm", lit(1000000L))
    for (i <- 1 to iters) {
      val dang = r.join(dangIds, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("pr_ppm")), lit(0L)).as("__dm"))
      val inflow = eDeg.join(r, eDeg("src") === r("node"))
        .select(col("dst"), expr("pr_ppm DIV __d").as("__c"))
        .groupBy(col("dst"))
        .agg(sum(col("__c")).as("__in"))
      r = nodes.join(inflow.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit(base) + expr(s"${dampingPpm}L * (coalesce(__in, 0L) " +
            s"+ __dm DIV ${n}L) DIV 1000000")).as("pr_ppm"))
      if (i % checkpointEvery == 0 && i < iters)
        r = boundStateParallelism(r.localCheckpoint(true))
    }
    r
  }

  /** Kleinberg's HITS (Hyperlink-Induced Topic Search, JACM 46(5),
    * 1999) — the hub/authority dual of [[pageRank]] for DIRECTED
    * graphs: a good AUTHORITY is pointed to by good hubs, a good HUB
    * points to good authorities. The curation reading mirrors the
    * original: in a citation/link graph, authorities are the
    * canonical documents and hubs are the survey/index pages that
    * concentrate them — two quality priors PageRank's single score
    * conflates.
    *
    * Update per round, all BIGINT:
    * {{{
    *   araw(v) = Σ_{u→v} hub(u)   ;  auth(v) = araw(v)·10^6 DIV max araw
    *   hraw(u) = Σ_{u→v} auth(v)  ;  hub(u)  = hraw(u)·10^6 DIV max hraw
    * }}}
    * i.e. the classic mutual-reinforcement iteration with L∞ (max)
    * renormalization instead of the textbook L2: the rank ORDER is the
    * same (normalizations differ by one positive scalar) but every
    * value stays an exact integer in [0, 10^6], so no float ever enters
    * the operator, aggregation order cannot change a bit, and a SQL
    * oracle can unroll the identical rounds. Nodes with no in-edges
    * hold authority exactly 0; nodes with no out-edges hold hub
    * exactly 0 (the node universe is src ∪ dst, unlike [[pageRank]]).
    *
    * Shape at scale: per round TWO partial-aggregated shuffles on
    * compact longs (groupBy(dst) for authorities, groupBy(src) for
    * hubs) over the once-checkpointed edge list, plus two 1-ROW max
    * aggregates broadcast back as bounded-by-construction nested-loop
    * joins (the [[pageRankDangling]] dangling-mass pattern). Each raw
    * score table is materialized per round — it feeds two consumers
    * (the max and the score join), so the [[distanceDistribution]]
    * every-round checkpoint convention applies, and plan depth stays
    * constant at any iteration count. Nothing reaches
    * the driver. Overflow bound: values are ≤ 10^6 and raw sums are
    * ≤ maxDegree·10^6, so the renormalization product needs
    * maxDegree·10^12 < 2^63 — safe to per-node degrees of ~9·10^6;
    * shrink the ppm base past that.
    *
    * Requires at least one edge (the per-round max is then always ≥ 1
    * on both sides, since every authority round gives the argmax node
    * exactly 10^6 and that node has an in-edge by construction).
    *
    * @param edges (src: long, dst: long) directed edge list; duplicate
    *              edges count twice (pre-distinct if that's not wanted)
    * @return (node, hub_ppm, auth_ppm) for EVERY node of the graph
    */
  def hits(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = boundStateParallelism(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).localCheckpoint(true), 100000L)
    val nodes = boundStateParallelism(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true))
    var h = nodes.withColumn("hub_ppm", lit(1000000L))
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      // each raw-score table has TWO consumers (the 1-row max and the
      // score join), so it is materialized every round — the
      // distanceDistribution convention; #nodes-bounded rows, and the
      // materialization also keeps plan depth constant per round
      val araw = boundStateParallelism(e.join(h, e("src") === h("node"))
        .groupBy(col("dst")).agg(sum(col("hub_ppm")).as("__s"))
        .localCheckpoint(true))
      val amax = araw.agg(max(col("__s")).as("__m"))
      a = nodes.join(araw.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(amax))
        .select(col("node"),
          expr("coalesce(__s, 0L) * 1000000L DIV __m").as("auth_ppm"))
      val hraw = boundStateParallelism(e.join(a, e("dst") === a("node"))
        .groupBy(col("src")).agg(sum(col("auth_ppm")).as("__s"))
        .localCheckpoint(true))
      val hmax = hraw.agg(max(col("__s")).as("__m"))
      h = nodes.join(hraw.withColumnRenamed("src", "node"), Seq("node"), "left")
        .crossJoin(broadcast(hmax))
        .select(col("node"),
          expr("coalesce(__s, 0L) * 1000000L DIV __m").as("hub_ppm"))
    }
    h.join(a, "node")
  }

  /** Synchronous label propagation (Raghavan et al. 2007) — community
    * detection as an iterated aggregate: every node starts labeled with
    * its own id, and each round adopts the most frequent label among
    * its neighbors (ties → smallest label, so every round is a pure
    * deterministic function of the previous labeling and the oracle can
    * unroll the identical rounds). After a few rounds, labels pool
    * inside densely-connected regions — the cheap community pass that
    * runs where modularity solvers can't.
    *
    * Contract matches [[pageRank]]: feed an undirected graph as BOTH
    * directions so every node appears as a `dst` and re-labels each
    * round. Fixed `iters`, not convergence-tested — synchronous LPA can
    * oscillate on bipartite structure, and a deterministic round count
    * is what keeps the result engine-reproducible (labels are ids, no
    * RNG, no floats anywhere).
    *
    * Shape at scale: per round one groupBy(dst, label) partial
    * aggregate + one groupBy(dst) argmin — both shuffle on compact
    * longs; the static edge list is checkpointed once and label lineage
    * is cut every `checkpointEvery` rounds like the other iterative
    * solvers. Nothing reaches the driver.
    *
    * @return (node, label) after `iters` rounds
    */
  def labelPropagation(edges: DataFrame, iters: Int = 3,
      checkpointEvery: Int = 2): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = boundStateParallelism(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).localCheckpoint(true), 100000L)
    val nodes = e.select(col("src").as("node")).distinct()
    var lab = nodes.withColumn("label", col("node"))
    for (i <- 1 to iters) {
      lab = e.join(lab, e("src") === lab("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("__c"))
        .groupBy(col("dst"))
        .agg(min_by(col("label"),
          struct((-col("__c")).as("__nc"), col("label"))).as("label"))
        .withColumnRenamed("dst", "node")
      if (i % checkpointEvery == 0 && i < iters)
        lab = boundStateParallelism(lab.localCheckpoint(true))
    }
    lab
  }

  /** HyperBall / approximate neighborhood function (Boldi, Rosa &
    * Vigna 2011, building on Palmer et al.'s ANF): per-node estimates
    * of |ball_R(v)| — how many nodes reach v within R hops — computed
    * by propagating [[Sketches]] HLL registers along edges instead of
    * materializing the balls. This is THE scalable spelling of
    * "neighborhood size / effective-diameter" analytics: exact balls
    * explode combinatorially (the BFS closure is O(n·ball) rows),
    * while the sketch caps every node's state at 1024 registers no
    * matter how large its ball grows.
    *
    * Round update: regs_t(v) = register-wise max of regs_{t-1}(v) and
    * regs_{t-1}(u) for every in-neighbor u→v — HLL union IS max, and
    * max-folds commute, so the result is engine-exact (the repo's
    * deterministic md5 HLL, [[Sketches.hllMerge]]'s argument) and the
    * oracle replays identical rounds. Estimates come out of the same
    * fixed-shape harmonic estimator as `sketch_hll_ndv`.
    *
    * Shape at scale: per round one edge⋈registers equi join (fan-out =
    * in-ball registers, ≤ 1024/node) plus one partial-aggregated
    * (node, bucket) max on compact longs; register lineage is cut
    * every `checkpointEvery` rounds. Nothing reaches the driver; no
    * node's state exceeds 1024 rows even when its ball is the whole
    * graph.
    *
    * @param edges (src, dst) directed edges; feed both directions for
    *              an undirected graph
    * @param rounds ball radius R (fixed rounds, the iterative contract)
    * @return (node, est_ndv): estimated |{u : dist(u→v) ≤ R}| including
    *         v itself, for every node of the graph
    */
  def neighborhoodReach(edges: DataFrame, rounds: Int,
      checkpointEvery: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = boundStateParallelism(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).localCheckpoint(true), 100000L)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    // singleton sketch {v}: one register per node, from the same
    // md5-derived bits as every other HLL in the engine
    var regs = boundStateParallelism(Sketches.hllSketch(
      nodes.withColumn("item", col("node")), "node", "item")
      .localCheckpoint(true))
    for (r <- 1 to rounds) {
      val in = e.join(regs, e("src") === regs("node"))
        .select(col("dst").as("node"), col("bucket"), col("m"))
      regs = regs.unionByName(in)
        .groupBy(col("node"), col("bucket")).agg(max(col("m")).as("m"))
      if (r % checkpointEvery == 0 && r < rounds)
        regs = boundStateParallelism(regs.localCheckpoint(true))
    }
    Sketches.hllEstimate(regs, "node")
  }

  /** Distance distribution + effective diameter (the HyperBall
    * deliverable, Boldi–Rosa–Vigna 2011 §5): `pairs_est(r)` = estimated
    * number of ordered node pairs within distance ≤ r, one row per
    * round, plus the smallest radius covering ≥ 90% of the reachable
    * pairs — the "effective diameter" that tells a pipeline whether a
    * link graph is small-world (spam farms cluster tight; organic webs
    * don't).
    *
    * Built on [[neighborhoodReach]]'s register propagation with a
    * per-round snapshot: after round r, one (node → est) estimate and
    * one global sum. Register state is checkpointed EVERY round here
    * (each snapshot is a consumer, so lineage would otherwise re-run
    * earlier rounds per snapshot). The per-node inverse-register sum is
    * exact in double (≤1024 terms, each a power-of-two reciprocal with
    * m ≤ 39 — representable and rounding-free at 53 mantissa bits), so
    * both engines produce identical estimates in any aggregation order.
    *
    * `eff_round` decides by integer cross-multiplication
    * (`pairs_est(r)·10 ≥ pairs_est(R)·9`) against the LAST round — at a
    * radius below the true diameter that is "90% of pairs within R", the
    * documented fixed-rounds contract.
    *
    * @return (round 1..R, pairs_est, eff_round) — eff_round constant
    *         across rows
    */
  def distanceDistribution(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = boundStateParallelism(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).localCheckpoint(true), 100000L)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var regs = boundStateParallelism(Sketches.hllSketch(
      nodes.withColumn("item", col("node")), "node", "item")
      .localCheckpoint(true))
    val snaps = (1 to rounds).map { r =>
      val in = e.join(regs, e("src") === regs("node"))
        .select(col("dst").as("node"), col("bucket"), col("m"))
      regs = boundStateParallelism(regs.unionByName(in)
        .groupBy(col("node"), col("bucket")).agg(max(col("m")).as("m"))
        .localCheckpoint(true))
      Sketches.hllEstimate(regs, "node")
        .agg(sum(col("est_ndv")).as("pairs_est"))
        .select(lit(r).cast("int").as("round"), col("pairs_est"))
    }
    val dist = snaps.reduce(_ unionByName _).localCheckpoint(true)
    // the 90% rule as two single-row aggregates cross-joined broadcast
    // (the triangleStats pattern — both sides bounded by construction;
    // a single-partition window over the R rows would warn in every log)
    val last = dist.agg(max(struct(col("round"), col("pairs_est"))).as("l"))
      .select(col("l.pairs_est").as("__lastp"))
    val eff = dist.crossJoin(broadcast(last))
      .agg(min(when(col("pairs_est") * 10L >= col("__lastp") * 9L,
        col("round"))).as("eff_round"))
    dist.crossJoin(broadcast(eff))
      .select(col("round"), col("pairs_est"), col("eff_round"))
  }

  /** The EXACT R-hop in-ball sizes — [[neighborhoodReach]]'s
    * calibration twin (the `hllDistinct` est/exact convention): the
    * unrolled distinct closure is affordable at test scale and on
    * small-diameter subgraphs, and is what the sketch replaces at
    * 100 TB. Same fixed-round contract.
    *
    * @return (node, exact_ball) including the node itself
    */
  def neighborhoodExact(edges: DataFrame, rounds: Int,
      checkpointEvery: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = boundStateParallelism(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).localCheckpoint(true), 100000L)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var ball = nodes.select(col("node"), col("node").as("item"))
    for (r <- 1 to rounds) {
      ball = ball.unionByName(
        e.join(ball, e("src") === ball("node"))
          .select(col("dst").as("node"), col("item")))
        .distinct()
      if (r % checkpointEvery == 0 && r < rounds)
        ball = boundStateParallelism(ball.localCheckpoint(true))
    }
    ball.groupBy(col("node")).agg(count(lit(1)).as("exact_ball"))
  }

  /** k-core peeling (Seidman 1983 cores; the Matula–Beck peel as a
    * fixed number of SYNCHRONOUS rounds): repeatedly delete every node
    * whose degree in the surviving subgraph is below `k`, together with
    * its edges. The k-core — the maximal subgraph of minimum degree ≥ k
    * — is where community structure lives; data pipelines use it to
    * strip low-engagement fringe (crawl leaf pages, one-off
    * co-occurrences) before running heavier graph passes.
    *
    * Fixed `rounds`, not convergence-tested — the repo's iterative
    * contract ([[labelPropagation]]): each round is a pure function of
    * the previous edge set, so the oracle unrolls the identical rounds
    * and the result is engine-reproducible. Surviving nodes may still
    * sit below `k` if `rounds` stopped short of the fixed point; the
    * returned in-subgraph degree makes that visible (all ≥ k ⟺
    * converged ⟺ the true k-core).
    *
    * Shape at scale: per round one partial-aggregated degree count on a
    * compact long key plus two semi-joins of the edge list against the
    * surviving-node set — all equi, all AQE-splittable; the edge list
    * is checkpointed on entry (pair generation is often the expensive
    * upstream) and every `checkpointEvery` rounds so lineage stays
    * bounded at any round count. Nothing reaches the driver.
    *
    * @param pairs0 undirected distinct edge list with `a < b` per row
    * @param k      minimum surviving degree
    * @param rounds number of synchronous peel rounds
    * @return (node, deg): every surviving node with its degree in the
    *         peeled subgraph
    */
  def kCore(pairs0: DataFrame, k: Int, rounds: Int,
      checkpointEvery: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    def degrees(p: DataFrame): DataFrame =
      p.select(col("a").as("n")).unionByName(p.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
    var p = boundStateParallelism(
      pairs0.select(col("a").cast("long").as("a"),
        col("b").cast("long").as("b")).localCheckpoint(true), 100000L)
    for (r <- 1 to rounds) {
      val keep = degrees(p).filter(col("d") >= k).select(col("n"))
      p = p.join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
      if (r % checkpointEvery == 0 && r < rounds)
        p = boundStateParallelism(p.localCheckpoint(true))
    }
    degrees(p).select(col("n").as("node"), col("d").as("deg"))
  }

  /** k-truss peeling (Cohen 2008): repeatedly delete every edge whose
    * SUPPORT — the number of triangles containing it — falls below
    * k−2. Where [[kCore]] trims low-degree fringe, the truss trims
    * low-cohesion EDGES: a hub that touches many communities without
    * belonging to any loses its spokes, which a degree test never
    * catches. The standard community-core extraction step between
    * pair generation and clustering.
    *
    * Fixed synchronous `rounds` (the [[kCore]] contract): each round is
    * a pure function of the previous edge set, so the oracle unrolls
    * identical rounds. The returned in-subgraph support makes
    * convergence visible (all ≥ k−2 ⟺ converged ⟺ the true k-truss).
    *
    * Shape at scale: per round one adjacency build (collect_list per
    * node — row width bounded by the max degree of the CURRENT
    * subgraph, which peeling only shrinks) and one per-edge
    * [[graft.functions.SortedIntersectCount]] merge — O(deg(a)+deg(b))
    * map-side steps per edge, no wedge materialization (the
    * [[triangleStats]] kernel). Edge set checkpointed per round.
    *
    * @param pairs0 undirected distinct edge list with `a < b` per row
    * @param k      truss order (k ≥ 3; support threshold is k−2)
    * @return (a, b, support): surviving edges with their support in the
    *         peeled subgraph
    */
  def kTruss(pairs0: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"k must be >= 3, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    def support(p: DataFrame): DataFrame = {
      val ee = p.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
      val adj = ee.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      p.join(adj.select(col("src").as("a"), col("nbrs").as("__na")), "a")
        .join(adj.select(col("src").as("b"), col("nbrs").as("__nb")), "b")
        .withColumn("support", graft.functions.SortedIntersectCount
          .sorted_intersect_count(col("__na"), col("__nb")))
        .select(col("a"), col("b"), col("support"))
    }
    var p = boundStateParallelism(
      pairs0.select(col("a").cast("long").as("a"),
        col("b").cast("long").as("b")).localCheckpoint(true), 100000L)
    for (_ <- 1 to rounds) {
      p = boundStateParallelism(
        support(p).filter(col("support") >= (k - 2).toLong)
          .select(col("a"), col("b")).localCheckpoint(true))
    }
    support(p)
  }

  /** Exact triangle census over an undirected graph — the one-row
    * connectivity card (nodes, edges, wedges, triangles, global
    * clustering coefficient) that tells a pipeline whether a
    * co-occurrence graph is community-structured or noise.
    *
    * Algorithm: degree-ordered node-iterator (Suri & Vassilvitskii
    * 2011, "Counting Triangles and the Curse of the Last Reducer").
    * Every edge is ORIENTED from the endpoint lower in the total order
    * (degree, id) to the higher; each triangle then has exactly one
    * vertex with out-edges to the other two, so counting closed wedges
    * over oriented edges counts each triangle ONCE. The orientation is
    * the scale lever: out-degree after orienting is O(√m) on any graph
    * (a vertex's out-neighbors all have ≥ its degree), so the wedge
    * self-join fans out per-vertex by √m instead of the raw degree —
    * hub vertices, the classic last-reducer killer, generate NO wedges
    * at all because all their edges point inward.
    *
    * Shape at scale: two hash joins to attach degrees, then the
    * edge-iterator spelling of the closed-wedge count — each oriented
    * edge (u,v) contributes `|N⁺(u) ∩ N⁺(v)|`, a codegen'd two-pointer
    * merge ([[graft.functions.SortedIntersectCount]]) over the two
    * sorted out-neighbor arrays (each ≤ O(√m) long by the orientation
    * bound, so no adjacency row is ever skew-heavy). The wedge set —
    * Σ outdeg² rows, the dominant volume of the naive plan — is never
    * materialized or shuffled; total merge work is
    * Σ_(u,v) outdeg(u)+outdeg(v) = O(m·√m) flat map-side steps. Then
    * three single-row aggregates cross-joined broadcast (bounded by
    * construction — the [[pageRankDangling]] pattern). Integer ppm
    * clustering: 3·triangles·10^6 DIV wedges, exact in BIGINT.
    *
    * @param pairs0 undirected distinct edge list with `a < b` per row
    * @return one row: (n_nodes, n_edges, n_wedges, n_triangles,
    *         closure_ppm)
    */
  def triangleStats(pairs0: DataFrame): DataFrame = {
    // checkpoint on entry (the kCore discipline): the edge list feeds
    // FOUR consumers (degrees, orientation, the closing-edge join, the
    // edge count) and pair generation is usually the expensive upstream
    // — without the cut, it re-executes per consumer
    val pairs = pairs0.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b")).localCheckpoint(true)
    val deg = pairs.select(col("a").as("n"))
      .unionByName(pairs.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val withDeg = pairs
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    val aFirst = (col("da") < col("db")) ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"))
    // adjacency-intersection count (the edge-iterator with sorted
    // neighbor lists): per oriented edge (u,v), triangles closing it =
    // |N⁺(u) ∩ N⁺(v)|, computed by the codegen'd two-pointer merge.
    // Equivalent to the wedge join + closing-edge check, but the wedge
    // set — Σ outdeg² rows, the dominant volume — is never materialized
    // or shuffled; work per edge is outdeg(u)+outdeg(v) ≤ O(√m) map-side
    // steps after two equi joins against the node-cardinality adjacency
    // table. Edges whose head has no out-edges contribute 0 and drop in
    // the inner join.
    val adj = oriented.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))
    val tri = oriented
      .join(adj, "u")
      .join(adj.select(col("u").as("v"), col("nbrs").as("nbrs_v")), "v")
      .agg(sum(graft.functions.SortedIntersectCount
        .sorted_intersect_count(col("nbrs"), col("nbrs_v")))
        .as("n_triangles"))
      .select(coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
    val degStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("d * (d - 1) DIV 2")).as("n_wedges"))
    val edgeStats = pairs.agg(count(lit(1)).as("n_edges"))
    degStats.crossJoin(broadcast(edgeStats)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        expr("CASE WHEN n_wedges = 0 THEN 0L " +
          "ELSE 3L * n_triangles * 1000000 DIV n_wedges END")
          .as("closure_ppm"))
  }

  /** Per-node local clustering coefficients — "how clique-like is each
    * node's neighborhood": tri(v) / C(deg v, 2) in exact integer ppm.
    * The node-level diagnostic the one-row [[triangleStats]] census
    * cannot give (which nodes sit in dense cores vs. bridge sparse
    * regions — a spam-hub screen over co-occurrence graphs).
    *
    * Per-edge triangle counts come from the same unoriented
    * sorted-adjacency merge as [[kTruss]] support; each edge's count is
    * credited to BOTH endpoints, and a triangle has exactly two edges
    * at each of its vertices, so `tri(v) = Σ_{e∋v} t_e DIV 2` — exact,
    * division always even.
    *
    * Shape at scale: one adjacency build + one per-edge merge + one
    * partial-aggregated per-node sum. Like [[kTruss]], the merge is
    * UNORIENTED (per-edge cost deg a + deg b, no √m hub bound), so
    * feed a pre-sparsified graph (the ≥2-co-orders registry spelling);
    * for global counts on raw graphs use the oriented
    * [[triangleStats]].
    *
    * @param pairs0 undirected distinct edge list with `a < b` per row
    * @return (node, deg, n_triangles, cc_ppm); deg-1 nodes score 0
    */
  def localClustering(pairs0: DataFrame): DataFrame = {
    val pairs = pairs0.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b")).localCheckpoint(true)
    val ee = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    val adj = ee.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"),
        count(lit(1)).as("d"))
      .localCheckpoint(true) // feeds two merge joins + the degree base
    val t = pairs
      .join(adj.select(col("src").as("a"), col("nbrs").as("__na")), "a")
      .join(adj.select(col("src").as("b"), col("nbrs").as("__nb")), "b")
      .withColumn("t", graft.functions.SortedIntersectCount
        .sorted_intersect_count(col("__na"), col("__nb")))
    val tri = t.select(col("a").as("node"), col("t"))
      .unionByName(t.select(col("b").as("node"), col("t")))
      .groupBy(col("node"))
      .agg(expr("sum(t) DIV 2").as("n_triangles"))
    adj.select(col("src").as("node"), col("d").as("deg"))
      .join(tri, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("cc_ppm",
        expr("CASE WHEN deg >= 2 " +
          "THEN n_triangles * 2000000 DIV (deg * (deg - 1)) " +
          "ELSE 0L END"))
  }

  /** Newman modularity card per community — "are these communities
    * real?": for each label c over an undirected graph with m edges,
    * {{{
    *   contrib(c) = e_c/m − (d_c / 2m)²
    * }}}
    * (e_c = intra-community edges, d_c = total degree in c). Positive
    * contributions mean denser-than-chance communities; Σ contrib is
    * the global modularity Q. The quality gauge that closes the
    * community loop: [[labelPropagation]] / [[kTruss]] PROPOSE
    * communities, this SCORES them.
    *
    * Fixed-point spelling (engine-exact): `e_ppm = e_c·10⁶ DIV m`,
    * `d_ppm = d_c·10⁶ DIV 2m`, `contrib_ppm = e_ppm − d_ppm² DIV 10⁶`
    * — the square of the truncated ratio, a composed truncation both
    * engines share (within 2 ppm of the real square), overflow-free to
    * ~10¹² edges (widest product d_ppm² ≤ 10¹²).
    *
    * Shape at scale: one degree aggregate, two label equi-joins onto
    * the edge list, two partial-aggregated groupBys on the label key;
    * the edge total is the one driver scalar (the [[Corpus
    * .pmiCollocations]] precedent).
    *
    * @param pairs0 undirected distinct edge list, one row per edge
    * @param labels (node, label) community assignment — every edge
    *               endpoint must be labeled (inner joins drop strays)
    * @return (community, n_nodes, e_intra, d_total, contrib_ppm)
    */
  def modularity(pairs0: DataFrame, labels: DataFrame): DataFrame = {
    val pairs = pairs0.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b")).localCheckpoint(true)
    val lab = labels.select(col("node").cast("long").as("node"),
      col("label").cast("long").as("label")).localCheckpoint(true)
    val m = pairs.count()
    require(m >= 1, "modularity: empty edge list")
    val deg = pairs.select(col("a").as("node"))
      .unionByName(pairs.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val dc = deg.join(lab, "node")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("d_total"))
    val ec = pairs
      .join(lab.select(col("node").as("a"), col("label").as("__la")), "a")
      .join(lab.select(col("node").as("b"), col("label").as("__lb")), "b")
      .filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("label")).agg(count(lit(1)).as("e_intra"))
    dc.join(ec, Seq("label"), "left")
      .select(col("label").as("community"), col("n_nodes"),
        coalesce(col("e_intra"), lit(0L)).as("e_intra"), col("d_total"))
      .withColumn("__e_ppm", expr(s"e_intra * 1000000 DIV ${m}L"))
      .withColumn("__d_ppm", expr(s"d_total * 1000000 DIV ${2 * m}L"))
      .withColumn("contrib_ppm",
        expr("__e_ppm - __d_ppm * __d_ppm DIV 1000000"))
      .drop("__e_ppm", "__d_ppm")
  }

  /** Multi-source BFS hop distances: the exact shortest hop count from
    * any seed to every node reachable within `rounds` hops — the
    * "blast radius" primitive behind contamination spread analysis
    * (how far does a flagged document's influence reach through a
    * citation/duplication graph) and seed-set expansion.
    *
    * Frontier propagation: round r joins ONLY the nodes first reached
    * at round r−1 against the edge list, anti-joins the already-settled
    * set, and tags survivors dist = r. Equivalent to the textbook
    * min-distance relaxation (a node's first discovery IS its minimum
    * hop count — BFS invariant), but each edge is expanded exactly once
    * per endpoint discovery instead of once per round, so total work is
    * O(m + n) across all rounds, not O(rounds · reached-set).
    *
    * Shape at scale: per round one equi-join frontier⋈edges on a
    * compact long key plus one anti-join against the settled set —
    * both partial-aggregated hash shuffles; the settled set and
    * frontier are checkpointed every `checkpointEvery` rounds so plan
    * depth stays bounded (the [[pageRank]] discipline). Nothing reaches
    * the driver.
    *
    * @param edges (src, dst) directed edges; feed both directions for
    *              an undirected graph
    * @param seeds (node) distinct-able seed set, distance 0
    * @return (node, dist): every node within `rounds` hops of a seed
    */
  def bfsLevels(edges: DataFrame, seeds: DataFrame, rounds: Int,
      checkpointEvery: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // NOT parallelism-bounded: the bipartite edge relation is
    // lineitem-scale and its per-round frontier joins are real work —
    // coalescing it measured +0.6-1.3 s wall (plans/r14)
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    var settled = seeds.select(col("node").cast("long").as("node"))
      .distinct().withColumn("dist", lit(0L))
    var frontier = settled.select(col("node"))
    for (r <- 1 to rounds) {
      val next = e.join(frontier.withColumnRenamed("node", "src"),
          Seq("src"), "left_semi")
        .select(col("dst").as("node")).distinct()
        .join(settled.select(col("node")), Seq("node"), "left_anti")
      frontier = next
      settled = settled
        .unionByName(next.withColumn("dist", lit(r.toLong)))
      if (r % checkpointEvery == 0 && r < rounds) {
        settled = boundStateParallelism(settled.localCheckpoint(true))
        frontier = boundStateParallelism(frontier.localCheckpoint(true))
      }
    }
    settled
  }

  /** Bounded-round weighted shortest paths — Bellman-Ford
    * min-relaxation, the weighted sibling of [[bfsLevels]]: the exact
    * minimum path WEIGHT from any seed to every node reachable within
    * `rounds` edges. `rounds` is part of the result contract (the
    * oracle unrolls identical rounds): dist(v) = min weight over paths
    * of ≤ `rounds` edges, the classic DP truncation.
    *
    * Frontier-delta relaxation (SPFA's set form): round r relaxes only
    * edges out of nodes IMPROVED in round r−1 — a node whose distance
    * did not change cannot improve a neighbor it already relaxed — so
    * per-round join work tracks the shrinking frontier, not the
    * settled set, while the result stays equal to full per-round
    * relaxation (a standard induction: any ≤ r-edge path's prefix
    * value was either improved last round, and relaxes now, or was
    * already propagated the round after it last improved).
    *
    * Shape at scale: per round ONE frontier⋈edges equi-join on a
    * compact long key plus two partial-aggregated min-folds, inputs
    * checkpointed every `checkpointEvery` rounds (the [[pageRank]]
    * discipline). Nothing reaches the driver. Overflow contract:
    * dist ≤ rounds · max(w) must stay below 2^63 — any real weight
    * domain at bounded rounds.
    *
    * @param edges (src, dst, w) directed weighted edges; feed both
    *              directions for an undirected graph; w ≥ 0 integral
    *              (negative weights relax correctly but the ≤ rounds
    *              truncation is then not a lower bound of the true
    *              distance)
    * @param seeds (node) distinct-able seed set, distance 0
    * @return (node, dist): every node within `rounds` edges of a seed
    */
  def ssspWeighted(edges: DataFrame, seeds: DataFrame, rounds: Int,
      checkpointEvery: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // NOT parallelism-bounded: see bfsLevels — coalescing the
    // lineitem-scale edge relation serializes the per-round relaxation
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(true)
    var dist = seeds.select(col("node").cast("long").as("node"))
      .distinct().withColumn("dist", lit(0L))
    var frontier = dist
    for (r <- 1 to rounds) {
      val cand = e.join(
          frontier.select(col("node").as("src"), col("dist").as("__d")),
          Seq("src"))
        .select(col("dst").as("node"), (col("__d") + col("w")).as("__nd"))
        .groupBy(col("node")).agg(min(col("__nd")).as("__nd"))
      val improved = cand.join(dist, Seq("node"), "left")
        .filter(col("dist").isNull || col("__nd") < col("dist"))
        .select(col("node"), col("__nd").as("dist"))
      dist = dist.unionByName(improved)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      frontier = improved
      if (r % checkpointEvery == 0 && r < rounds) {
        dist = boundStateParallelism(dist.localCheckpoint(true))
        frontier = boundStateParallelism(frontier.localCheckpoint(true))
      }
    }
    dist
  }

  /** Link prediction over an undirected graph: the top-k NON-adjacent
    * node pairs ranked by common-neighbor count, Jaccard-of-
    * neighborhoods tie-break — "parts that should co-occur but don't
    * yet", the recommendation / missing-edge primitive over any
    * co-occurrence graph.
    *
    * Scores are exact integers: `common = |N(a) ∩ N(b)|` via the
    * codegen'd sorted-adjacency merge
    * ([[graft.functions.SortedIntersectCount]] — O(deg a + deg b) per
    * pair, no wedge materialization), and
    * `jaccard_ppm = common · 10⁶ DIV (deg a + deg b − common)`.
    *
    * Candidate generation is the scale lever: pairs are enumerated only
    * through CENTER nodes of degree ≤ `maxCenterDegree`, so the wedge
    * fan-out is Σ_{deg(c) ≤ cap} deg(c)² ≤ cap · m — linear in edges at
    * a fixed cap, hub-proof by construction. A pair whose EVERY common
    * neighbor exceeds the cap is not proposed (its neighbors are
    * hub-mediated, the classically meaningless recommendation); any
    * pair that IS proposed gets its exact full-neighborhood score —
    * the cap bounds candidate generation, never the arithmetic.
    *
    * Ranking is a bounded [[graft.functions.TopKByScore]] aggregate:
    * score packs (common, jaccard_ppm) lexicographically as
    * `common · 2²¹ + jaccard_ppm` (exact in double while
    * common < 2³¹), id packs (a, b) as `a · 2³² + b` so the
    * smaller-id-wins tie-break is ascending (a, b) — both packings
    * guarded in-plan with `raise_error` on overflow (fail loud, the
    * repo convention).
    *
    * @param pairs0 undirected distinct edge list with `a < b` per row;
    *               node ids must fit in 31 bits (guarded)
    * @return (a, b, rank, common, jaccard_ppm), rank 1..k by
    *         (common DESC, jaccard_ppm DESC, a, b)
    */
  def linkPrediction(pairs0: DataFrame, maxCenterDegree: Int,
      k: Int): DataFrame = {
    require(maxCenterDegree >= 1,
      s"maxCenterDegree must be >= 1, got $maxCenterDegree")
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = pairs0.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b")).localCheckpoint(true)
    val ee = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    val adj = ee.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"),
        count(lit(1)).as("d"))
      .localCheckpoint(true) // feeds center filter + two score joins
    val centerEdges = ee.join(
      adj.filter(col("d") <= maxCenterDegree.toLong).select(col("src")),
      Seq("src"), "left_semi")
    val cand = centerEdges.as("x")
      .join(centerEdges.as("y"), col("x.src") === col("y.src"))
      .filter(col("x.dst") < col("y.dst"))
      .select(col("x.dst").as("a"), col("y.dst").as("b"))
      .distinct()
      .join(pairs, Seq("a", "b"), "left_anti")
    val scored = cand
      .join(adj.select(col("src").as("a"), col("nbrs").as("__na"),
        col("d").as("__da")), "a")
      .join(adj.select(col("src").as("b"), col("nbrs").as("__nb"),
        col("d").as("__db")), "b")
      .withColumn("common", graft.functions.SortedIntersectCount
        .sorted_intersect_count(col("__na"), col("__nb")))
      .withColumn("jaccard_ppm",
        expr("common * 1000000 DIV (__da + __db - common)"))
    val guarded = scored.withColumn("__id",
      when(col("a") < 0 || col("b") < 0 ||
          col("a") >= lit(2147483648L) || col("b") >= lit(2147483648L),
        raise_error(lit("linkPrediction: node ids must fit in 31 bits")))
        .otherwise(col("a") * lit(4294967296L) + col("b")))
      // score packing is exact only while common*2^21 + ppm < 2^53;
      // fail loud (repo convention, same as the id packing above)
      // instead of silently corrupting the ranking on an
      // extreme-degree graph
      .withColumn("__score",
        when(col("common") >= lit(2147483648L),
          raise_error(lit(
            "linkPrediction: common-neighbor count >= 2^31 overflows the packed score")))
          .otherwise((col("common") * lit(2097152L) + col("jaccard_ppm"))
            .cast("double")))
    guarded
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("__score"), col("__id"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("r0", "t")))
      .select(expr("t.id DIV 4294967296").as("a"),
        expr("t.id % 4294967296").as("b"),
        (col("r0") + 1).cast("int").as("rank"),
        expr("CAST(t.score AS BIGINT) DIV 2097152").as("common"),
        expr("CAST(t.score AS BIGINT) % 2097152").as("jaccard_ppm"))
  }
}
