package graft

/** Plan lint: scale-shape regression gate over EVERY registered query.
  *
  * A cartesian product anywhere is a bug at any scale. A broadcast
  * nested-loop join is acceptable ONLY where the crossing is the
  * algorithm — the ANN scans cross the corpus with a BROADCAST query/
  * centroid set and immediately bound the result with the k-capped heap
  * aggregate, so the crossed side never materializes. Anything else
  * sneaking a BNLJ in (a lost equi-join condition, a dropped hint) fails
  * here instead of at 100 TB.
  */
class PlanLintSpec extends SparkTestBase {

  import java.util.concurrent.{Callable, ConcurrentHashMap, Executors}

  // queries whose construction has side effects (JDBC DDL, streaming
  // drains, a partitioned file export, bucketed saveAsTable) — their
  // plan shape is covered by their own oracle queries (and for the
  // bucketed join, by BucketingSpec's no-Exchange assertion)
  private val skip = Set("dsl_jdbc_roundtrip", "dsl_chunked_upsert",
    "dsl_generated_ids", "corpus_shard_export", "corpus_sorted_export",
    "corpus_compaction_apply", "corpus_orc_roundtrip",
    "corpus_csv_ingest_quarantine", "corpus_json_ingest_quarantine",
    "sketch_hll_store_merge",
    "corpus_schema_evolution",
    "ann_ivf_incremental", "ann_pq_incremental",
    "ann_ivfpq_incremental", "ann_takedown_search", "q_bucketed_join")

  // intentional bounded broadcast crossings (see scaladoc above);
  // dedup_semantic crosses the corpus with the k COLLECTED k-means
  // centers (a LocalRelation) and immediately bounds it with the
  // per-vector max_by — the same centroid-assignment shape as the ANN
  // rows.
  private val bnljByDesign = Set("ann_bruteforce_topk", "ann_quantized_topk",
    "ann_ivf_topk", "ann_ivf_kmeans", "ann_pq_topk", "dedup_semantic",
    "multimodal_ann", "ann_filtered_topk", "ann_recall_ivf",
    "ann_recall_ivfpq", "ann_recall_lsh", "ann_recall_pq",
    "ann_recall_int8", "text_ann_topk", "ann_radius", "ann_mmr_rerank",
    // exact cosine truth arm (the ann_recall_* shape); the refined arm
    // itself is equi-join only
    "ann_recall_refined",
    // per-round 1-ROW dangling-mass aggregate broadcast back onto the
    // rank table — the bounded-by-construction cross join (the side is
    // a global aggregate; see Graph.pageRankDangling scaladoc)
    "graph_pagerank_dangling",
    // per-round 1-ROW L∞ max aggregates (authority and hub
    // renormalizers) broadcast back onto the score tables — the same
    // bounded-by-construction cross join (Graph.hits scaladoc)
    "graph_hits",
    // three SINGLE-ROW aggregates (deg stats x edge count x triangle
    // count) cross-joined broadcast into the one-row census card —
    // every side is a global aggregate (Graph.triangleStats scaladoc)
    "graph_triangles",
    // two SINGLE-ROW aggregates (CMS inner-product min x exact inner
    // product) cross-joined into the one-row forecast card
    // (Sketches.cmsJoinSize scaladoc)
    "sketch_join_size",
    // R-row distribution x two single-row aggregates (last round, 90%
    // radius) — every cross side bounded by the fixed round count
    // (Graph.distanceDistribution scaladoc)
    "graph_eff_diameter",
    // SINGLE-ROW basket-count aggregate broadcast onto the rule table
    // for the lift denominator — bounded by construction (global
    // count_distinct; see the q_assoc_rules registry comment)
    "q_assoc_rules",
    // k-means centroid assignment (k COLLECTED centers × corpus, each
    // immediately bounded by the per-vector max_by/top-k) for both the
    // stale and fresh index arms — the ann_ivf_kmeans shape twice
    "ann_recall_stale",
    // SINGLE-ROW (sum, count) balance aggregate broadcast onto the
    // customer slice for the cross-multiplied above-average filter —
    // bounded by construction (global aggregate; Q22 registry comment)
    "q22_sales_opportunity",
    // SINGLE-ROW max-revenue aggregate broadcast onto the per-supplier
    // totals for the scalar-max equality — bounded by construction
    // (global aggregate; Q15 registry comment)
    "q15_top_supplier",
    // SINGLE-ROW grand-total aggregate broadcast onto the per-part
    // values for the cross-multiplied 0.1%-share filter — bounded by
    // construction (global aggregate; Q11 registry comment)
    "q11_important_parts",
    // SINGLE-ROW order-count aggregate broadcast onto the ≤9-row
    // digit census for the observed-share division — bounded by
    // construction (global aggregate; q_benford registry comment)
    "q_benford")

  // ANN contract: the corpus stays partitioned and the QUERY BATCH is
  // broadcast — bounded by the caller, not by the plan shape.
  // ann_ivfpq_topk's broadcast side is the query batch's probe rows
  // (≤ nProbe per query) and its scoring join is equi on the cell id,
  // so it needs only this exemption, not the BNLJ one.
  private val queryBatchBroadcast = Set("ann_bruteforce_topk",
    "ann_quantized_topk", "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_kmeans",
    "ann_pq_topk", "ann_ivfpq_topk", "multimodal_ann", "ann_filtered_topk",
    "ann_recall_ivf", "ann_recall_ivfpq", "ann_recall_lsh", "ann_recall_pq",
    "ann_recall_int8", "text_ann_topk", "ann_radius", "ann_mmr_rerank",
    "ann_lsh_multiprobe", "ann_recall_stale",
    // the refine stage broadcasts the query batch (exact-distance side)
    // on top of ivfpqTopK's probe-row broadcast; the candidate-set
    // broadcast is Aggregate-bounded (k-capped heap) on its own
    "ann_ivfpq_refined", "ann_recall_refined")

  // Tables that stay broadcastable at ANY scale factor (TPC-H fixes them
  // at 25 / 5 rows). customer/part/supplier/orders/lineitem GROW with SF
  // and must never carry a forced broadcast hint.
  private val boundedDims = Set("nation", "region")

  // ---- shared plan plumbing: each registry query's QueryExecution is
  // built ONCE per (name, dir) and reused by every lint test, and each
  // test's per-query loop runs on a bounded pool (the lint is read-only:
  // plans for distinct queries analyze independently, no lintable query
  // touches the shared catalog — the catalog writers are all in `skip`).
  // This keeps the suite's wall proportional to ONE analysis pass over
  // the registry instead of five serial ones.
  private lazy val lintable: Seq[Q] =
    SparkEntry.all.filterNot(q => skip(q.name) || q.name.startsWith("stream_"))

  private val qeCache =
    new ConcurrentHashMap[(String, String),
      org.apache.spark.sql.execution.QueryExecution]()

  private def qe(q: Q, dir: String): org.apache.spark.sql.execution.QueryExecution = {
    val k = (q.name, dir)
    val hit = qeCache.get(k)
    if (hit != null) hit
    else {
      // build outside any map lock (query construction may itself stage
      // shared fixtures); a rare duplicate analysis under a race is free
      val built = q.run(spark, dir).queryExecution
      qeCache.putIfAbsent(k, built)
      qeCache.get(k)
    }
  }

  /** Run `body` for every lintable query on a bounded pool, collecting
    * EVERY failure (not just the first) into one assertion. */
  private def forAllLintable(body: Q => Unit): Unit = {
    spark // force session init on the test thread, not a pool thread
    val pool = Executors.newFixedThreadPool(8)
    try {
      val futures = lintable.map(q => pool.submit(new Callable[Option[String]] {
        def call(): Option[String] =
          try { body(q); None }
          catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage}") }
      }))
      val errs = futures.flatMap(f => Option(f.get()).flatten)
      assert(errs.isEmpty, "\n" + errs.mkString("\n"))
    } finally pool.shutdown()
  }

  /** A forced-broadcast subtree is scale-safe iff it is bounded by
    * construction: every leaf is an allowlisted fixed-size dim or a
    * driver-built LocalRelation, or the subtree aggregates/limits to a
    * bounded set before the hint.
    */
  private def boundedSubtree(
      sub: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, GlobalLimit, LocalRelation}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // Deduplicate is distinct() before the optimizer rewrites it to an
    // Aggregate — same key-bounding semantics, analyzed-plan spelling
    val boundingOp = sub.collectFirst {
      case _: Aggregate => (); case _: GlobalLimit => ()
      case _: Deduplicate => ()
    }.isDefined
    boundingOp || sub.collectLeaves().forall {
      case _: LocalRelation => true
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.exists(p =>
          boundedDims.exists(t => p.toString.endsWith(s"$t.parquet")))
        case _ => false
      }
      case _ => false
    }
  }

  test("forced broadcast() hints only on sides bounded at any scale") {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
    val dir = "/root/testdata/sf0.001"
    forAllLintable { q =>
      if (!queryBatchBroadcast(q.name)) {
        val bad = qe(q, dir).analyzed.collect {
          case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) &&
            !boundedSubtree(h.child) => h
        }
        assert(bad.isEmpty,
          s"${q.name} forces broadcast of an unbounded side:\n${bad.mkString("\n")}")
      }
    }
  }

  // Windows whose partition key is content-derived (a hash of a text
  // column, an exploded feature like a shingle) have corpus-scale
  // cardinality AND corpus-scale hot groups: window evaluation colocates
  // every row of a key in one task BEFORE any filter can drop it, so a
  // boilerplate shingle or a 10⁷-copy duplicate group funnels one task.
  // The scale-safe spellings are partial-aggregated groupBy (+ join-back
  // or anti-join) — see Dedup.exact / Dedup.ngramJaccard. This test bans
  // the anti-pattern structurally: no registered query may partition a
  // window by an expression that (after inlining aliases) contains a
  // content hash or references a generator (explode) output.
  private val windowAllow = Map(
    // bounded-by-construction hash-BUCKET window: the partition key is a
    // substring of the hash (16^k buckets), so cardinality is fixed and
    // per-bucket rows are N/16^k — the window is the pairing semantics,
    // not a per-content-group sort. k is SELF-SIZING by default (a
    // corpus count picks the smallest k with N/16^k <= a row target, so
    // the default is scale-safe without the caller knowing the knob —
    // Dedup.autoBucketHexChars); the registry pins k = 4 so the
    // generated oracle's substr width matches
    "dedup_contrastive_pairs" -> "parameterized hash-bucket window")

  test("no window partitioned by a corpus-cardinality expression") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Window => WindowOp}
    val dir = "/root/testdata/sf0.001"
    forAllLintable { q =>
        val plan = qe(q, dir).analyzed
        val aliases = plan.collect { case p =>
          p.expressions.flatMap(_.collect { case a: Alias => a.exprId -> a.child })
        }.flatten.toMap
        val generated = plan.collect { case g: Generate =>
          g.generatorOutput.map(_.exprId)
        }.flatten.toSet
        def inline(e: Expression, depth: Int): Expression =
          if (depth <= 0) e
          else e.transformUp {
            case a: AttributeReference if aliases.contains(a.exprId) =>
              inline(aliases(a.exprId), depth - 1)
          }
        val bad = plan.collect { case w: WindowOp =>
          w.partitionSpec.map(inline(_, 8)).filter { p =>
            p.exists {
              case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 | _: Murmur3Hash |
                   _: XxHash64 => true
              case a: AttributeReference => generated(a.exprId)
              case _ => false
            }
          }
        }.flatten
        if (windowAllow.contains(q.name))
          // keep the allowlist honest: an entry whose query no longer
          // trips the detector is stale (and would mask a detector bug)
          assert(bad.nonEmpty,
            s"${q.name} is window-allowlisted but the detector no longer " +
              "flags it — remove the stale entry")
        else
          assert(bad.isEmpty,
            s"${q.name} partitions a window by a corpus-cardinality " +
              s"(content-hash or exploded-feature) expression:\n${bad.mkString("\n")}")
    }
  }

  // The q_window_ranks class: a window partitioned by a PLAIN column
  // whose cardinality is fixed (a segment, a language, a source) over an
  // input that grows with the data — each whole group funnels one task.
  // "Provably fixed" is measured, not guessed: the same window's
  // partition-key NDV at sf0.001 vs sf0.01 — a key that stays tiny
  // (≤ NdvCap, no growth) while the input rows grow ≥ 4× is an enum-like
  // key over a data-scaled input. The scale-safe spelling is
  // TwoPass.rank/prefixSum (range-partition + per-partition windows +
  // broadcast offsets). Exemptions: spec contains a content hash or a
  // generator output (the other window rule owns those); spec contains
  // the TwoPass partition-id column (bounded by a range partition by
  // construction); input limited (bounded).
  //
  // An AGGREGATED input is NOT a blanket exemption (the corpus_keywords
  // class): an aggregate bounds rows PER KEY but not the key count —
  // a per-(source, term) tf table is still a source's whole distinct
  // vocabulary, and a window partitioned by the source sorts it in one
  // task. Aggregated-input windows are instead held to a measured ratio
  // rule: partition-key NDV < 1% of the window's input rows at sf0.001.
  // No growth precondition — the documents table is deliberately
  // SF-static in this testdata, so a growth gate would blind the rule
  // to exactly the vocabulary windows it exists to police. Per-group
  // windows over genuinely bounded aggregates (≤ 64-bucket sketches,
  // crosstab cells, per-source normalizers over #sources rows) land at
  // or above 1/64 ≈ 1.6% and pass untouched.
  private val NdvCap = 24
  private val windowNdvAllow = Map.empty[String, String]
  // Bounded-DOMAIN aggregates (not merely bounded-per-key): the window
  // input's row count per partition key is capped by a fixed value
  // domain at ANY corpus size, so the per-key sort can never grow with
  // the data — the percentilesByCounting contract class.
  private val aggWindowAllow = Map(
    "q_mad" -> ("the window input is the (flag, deci-price) count table; " +
      "rows per flag are bounded by the TPC-H price domain (~1.05M " +
      "deci-cells) no matter the corpus size — r13 respelled the medians " +
      "as counting aggregates (guide §2.3) and the cumulative-count " +
      "window runs over distinct values, never raw rows"))

  import org.apache.spark.sql.catalyst.expressions.{Expression => CatalystExpr}
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan => CatalystPlan}

  /** Windows measurable by the NDV rules: (child, partitionSpec,
    * aggregatedInput). Excludes windows owned by the content-hash /
    * generator rule, TwoPass pid windows, and limit-bounded inputs. */
  private def ndvCandidates(
      plan: CatalystPlan): Seq[(CatalystPlan, Seq[CatalystExpr], Boolean)] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, GlobalLimit, Window => WindowOp}
    val aliases = plan.collect { case p =>
      p.expressions.flatMap(_.collect { case a: Alias => a.exprId -> a.child })
    }.flatten.toMap
    val generated = plan.collect { case g: Generate =>
      g.generatorOutput.map(_.exprId)
    }.flatten.toSet
    def inline(e: Expression, depth: Int): Expression =
      if (depth <= 0) e
      else e.transformUp {
        case a: AttributeReference if aliases.contains(a.exprId) =>
          inline(aliases(a.exprId), depth - 1)
      }
    plan.collect {
      case w: WindowOp if w.partitionSpec.nonEmpty =>
        val otherRulesOwn = w.partitionSpec.map(inline(_, 8)).exists(_.exists {
          case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 | _: Murmur3Hash |
               _: XxHash64 | _: SparkPartitionID => true
          case a: AttributeReference =>
            generated(a.exprId) || a.name == "__tp_pid"
          case _ => false
        })
        val limited = w.child.collectFirst { case _: GlobalLimit => () }.isDefined
        val aggregated = w.child.collectFirst { case _: Aggregate => () }.isDefined
        if (otherRulesOwn || limited) None
        else Some((w.child, w.partitionSpec, aggregated))
    }.flatten
  }

  private def measureNdv(child: CatalystPlan,
      spec: Seq[CatalystExpr]): (Long, Long) = {
    import org.apache.spark.sql.GraftSqlShims
    import org.apache.spark.sql.functions.{count, count_distinct, lit, struct}
    val df = GraftSqlShims.ofRows(spark, child)
    val key = struct(spec.map(GraftSqlShims.toColumn): _*)
    val r = df.agg(count_distinct(key).cast("long"),
      count(lit(1)).cast("long")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** The aggregated-input ratio rule, factored out so the synthetic
    * regression test below can drive it directly. */
  private def aggRatioTrips(ndvS: Long, nS: Long): Boolean =
    ndvS * 100 < nS

  test("no window partitioned by a fixed-cardinality column over data-scaled input") {
    val dirS = "/root/testdata/sf0.001"
    val dirL = "/root/testdata/sf0.01"

    forAllLintable { q =>
        val candsS = ndvCandidates(qe(q, dirS).analyzed)
        if (candsS.nonEmpty) {
          val candsL = ndvCandidates(qe(q, dirL).analyzed)
          var tripped = false
          var aggTripped = false
          candsS.zip(candsL).foreach {
            case ((cS, sS, false), (cL, sL, _)) =>
              val (ndvS, nS) = measureNdv(cS, sS)
              val (ndvL, nL) = measureNdv(cL, sL)
              val fixedCard = ndvL <= NdvCap && ndvL <= ndvS * 2
              val dataScaled = nL >= nS * 4
              if (fixedCard && dataScaled) {
                tripped = true
                assert(windowNdvAllow.contains(q.name),
                  s"${q.name} partitions a window by a fixed-cardinality key " +
                    s"(ndv $ndvS@sf0.001 -> $ndvL@sf0.01) over a data-scaled " +
                    s"input ($nS -> $nL rows): each whole group funnels one " +
                    "task at scale. Respell with TwoPass.rank/prefixSum.")
              }
            case ((cS, sS, true), _) =>
              val (ndvS, nS) = measureNdv(cS, sS)
              if (aggRatioTrips(ndvS, nS)) {
                aggTripped = true
                assert(aggWindowAllow.contains(q.name),
                  s"${q.name} partitions a window by a key with NDV $ndvS " +
                    s"over an AGGREGATED input of $nS rows at sf0.001 " +
                    "(< 1%): the aggregate bounds rows per key, not the " +
                    "key count — a whole vocabulary-sized group funnels " +
                    "one task at scale. Respell with the TopKByScore heap " +
                    "or TwoPass.rank.")
              }
          }
          if (windowNdvAllow.contains(q.name))
            assert(tripped,
              s"${q.name} is ndv-window-allowlisted but no window trips " +
                "the detector — remove the stale entry")
          if (aggWindowAllow.contains(q.name))
            assert(aggTripped,
              s"${q.name} is agg-window-allowlisted but no window trips " +
                "the detector — remove the stale entry")
        }
    }
  }

  // A window with NO partition key moves ALL its input rows to one task
  // — the hardest scale cliff of all. Acceptable ONLY over an input a
  // bounding operator has already shrunk (an aggregate: manifests, ≤k
  // vocabularies, per-source normalizers, TwoPass's P-row offset folds;
  // or an explicit limit). compactionPlan's manifest fold was the last
  // raw-input global window — respelled over TwoPass.prefixSum in r10,
  // and this rule keeps the anti-pattern out structurally.
  private val globalWindowAllow = Map.empty[String, String]

  test("no unpartitioned window over an input with no bounding operator") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, GlobalLimit, Window => WindowOp}
    val dir = "/root/testdata/sf0.001"
    forAllLintable { q =>
        val bad = qe(q, dir).analyzed.collect {
          case w: WindowOp if w.partitionSpec.isEmpty &&
            w.child.collectFirst {
              case _: Aggregate => (); case _: GlobalLimit => ()
              case _: Deduplicate => ()
            }.isEmpty => w
        }
        if (globalWindowAllow.contains(q.name))
          assert(bad.nonEmpty,
            s"${q.name} is global-window-allowlisted but no window trips " +
              "the detector — remove the stale entry")
        else
          assert(bad.isEmpty,
            s"${q.name} runs an unpartitioned window over an input with " +
              "no bounding aggregate/limit beneath it: every input row " +
              "funnels one task at scale. Respell with TwoPass.\n" +
              bad.map(_.simpleString(3)).mkString("\n"))
    }
  }

  test("agg-window detector flags the retired corpus_keywords spelling") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the pre-r7 distinctiveTerms shape: a per-(enum key, item) count
    // aggregate, then a rank window partitioned by the enum key — the
    // window input is the key's whole distinct item universe. The
    // synthetic vocabulary here is lineitem's (returnflag, partkey)
    // pairs, which (unlike the deliberately SF-static documents text)
    // scales with the data: 3 flags over hundreds of parts at sf0.001,
    // thousands at sf0.01. The detector must classify the window as
    // aggregated-input and the ratio rule must trip on it.
    def badPlan(dir: String) = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val tf = li.groupBy(col("l_returnflag"), col("l_partkey"))
        .agg(count(lit(1)).as("n"))
      tf.withColumn("rank",
        row_number().over(
          Window.partitionBy(col("l_returnflag"))
            .orderBy(col("n").desc, col("l_partkey"))))
        .filter(col("rank") <= 3)
    }
    val candsS = ndvCandidates(badPlan("/root/testdata/sf0.001")
      .queryExecution.analyzed)
    assert(candsS.nonEmpty && candsS.forall(_._3),
      "the regressed spelling must surface as an aggregated-input window")
    val (ndvS, nS) = measureNdv(candsS.head._1, candsS.head._2)
    assert(aggRatioTrips(ndvS, nS),
      s"ratio rule failed to flag ndv=$ndvS rows=$nS")
    // and the SHIPPED corpus_keywords must not reintroduce any window the
    // ratio rule would flag
    assert(ndvCandidates(qe(lintable.find(_.name == "corpus_keywords").get,
      "/root/testdata/sf0.001").analyzed)
      .forall { case (c, s, agg) =>
        !agg || { val (ndv, n) = measureNdv(c, s); !aggRatioTrips(ndv, n) }
      })
  }

  test("no cartesian products; nested-loop joins only where designed") {
    val dir = "/root/testdata/sf0.001"
    forAllLintable { q =>
        val plan = qe(q, dir).executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"${q.name} plans a cartesian product")
        if (!bnljByDesign(q.name))
          assert(!plan.contains("BroadcastNestedLoopJoin"),
            s"${q.name} plans an unexpected broadcast nested-loop join")
    }
  }
}
