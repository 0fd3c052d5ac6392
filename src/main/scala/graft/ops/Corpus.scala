package graft.ops

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation operators beyond dedup: deterministic sampling, token-
  * budget shard packing, and lexical retrieval — the remaining everyday
  * moves of a training-data pipeline, all built on exact integer
  * arithmetic so they verify bit-for-bit against the SQL oracle.
  */
object Corpus {

  /** Deterministic stratified (systematic) sampling: keep every `nth` row
    * per stratum in `orderCol` order. Unlike `sample()`, reproducible
    * across engines and runs — the property a training-mix spec needs.
    * Ranks are [[TwoPass.rank]] distributed: strata are usually
    * fixed-cardinality (languages, sources), so a whole-stratum window
    * would sort corpus-scale groups in single tasks.
    *
    * `orderCol` MUST order rows uniquely within each stratum (a row id):
    * with ties, row_number's tie order depends on partition layout and
    * the kept set stops being run-reproducible. For a tie-prone ordering
    * key, use [[hashSamplePerStratum]] (which tie-breaks on the id) or
    * pre-compose a unique ordering column.
    */
  def stratifiedEveryNth(df: DataFrame, stratumCol: String, orderCol: String,
      nth: Int): DataFrame = {
    require(nth >= 1, s"nth must be >= 1, got $nth")
    TwoPass.rank(df, Seq(stratumCol), Seq(col(orderCol)), "__rn")
      .filter((col("__rn") - 1) % nth === 0)
      .drop("__rn")
  }

  /** Deterministic fixed-k per-stratum sample: rank each stratum's rows
    * by md5 of their id — a uniform, engine-reproducible hash — and keep
    * the first k. Reservoir-sample semantics (uniform k of N) with zero
    * randomness: the same corpus always yields the same sample, and the
    * oracle can recompute it exactly. Complements [[stratifiedEveryNth]]
    * (fixed RATE) with a fixed SIZE per stratum.
    */
  def hashSamplePerStratum(df: DataFrame, stratumCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    TwoPass.rank(df, Seq(stratumCol),
      Seq(md5(col(idCol).cast("string").cast("binary")), col(idCol)), "__rn")
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Token-budget shard packing: within each `groupCol` partition, assign
    * docs (in `orderCol` order) to consecutive shards so each shard holds
    * ~`budget` tokens — the pretraining "pack documents into context
    * windows" step. `shard = floor(tokens-before-this-doc / budget)`:
    * pure integer math over a running sum, so shard ids are exact and a
    * doc larger than the budget still lands in exactly one shard.
    *
    * Scale: the running sum is [[TwoPass.prefixSum]] distributed — pack
    * groups (source, shard-prefix, …) are usually fixed-cardinality, so
    * a whole-group window would serialize each group through one task.
    * Packing across the whole corpus in ONE group still serializes
    * semantically (every shard id depends on all earlier rows), which is
    * why the group key is the caller's contract.
    */
  def packByTokenBudget(df: DataFrame, groupCol: String, orderCol: String,
      textCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    TwoPass.prefixSum(
      df.withColumn("n_tokens",
        TextFunctions.tokenCount(col(textCol)).cast("long")),
      Seq(groupCol), Seq(col(orderCol)), col("n_tokens"), "__cum")
      // DIV keeps the whole computation integral — no float rounding near
      // shard boundaries
      .withColumn("shard", expr(s"__cum DIV $budget"))
      .drop("__cum")
  }

  /** Pack documents into training SEQUENCES: assign each group's docs
    * (in `orderCol` order) to token-budget shards ([[packByTokenBudget]])
    * and concatenate every shard's texts with `sep` into one packed row —
    * the "fill the context window" step after shard assignment. Within a
    * shard the concatenation follows `orderCol` (which must be unique per
    * group), so the output is deterministic and an SQL oracle reproduces
    * it with `STRING_AGG(... ORDER BY ...)`.
    *
    * Scale: the same per-group running-sum window (never a global sort),
    * then one aggregate keyed by (group, shard) — a shard's text payload
    * is budget-bounded by construction, so no reducer inflates.
    */
  def packSequences(df: DataFrame, groupCol: String, orderCol: String,
      textCol: String, budget: Long, sep: String = "\n\n"): DataFrame =
    packByTokenBudget(df, groupCol, orderCol, textCol, budget)
      .groupBy(col(groupCol), col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              col(orderCol).as("o"), col(textCol).as("t")))),
            e => e.getField("t")),
          sep).as("packed"))

  /** Deterministic mixture resampling — the pretraining "data mixing"
    * step: downsample each source so the kept corpus matches target
    * mixture WEIGHTS (integers, e.g. web=7 : books=2 : code=1) as closely
    * as the supply allows. The feasible total is
    * `T = min over sources of (n_s * W / w_s)` (integer division,
    * W = Σ weights) — the largest corpus where no source is asked for
    * more rows than it has — and each source keeps rows whose md5 bucket
    * falls under its rational keep-rate `T*w_s / (W*n_s)`:
    * integer cross-multiplied, so any engine reproduces the exact keep
    * set, stable under partitioning, growing the corpus only ever adds
    * rows to a source's keep set for the same T.
    *
    * One count aggregate (map-side partials, #sources rows to the
    * driver), then a broadcast join + map-only filter — the corpus is
    * never shuffled. Overflow bound: bucket(2^24) * W * n_s must fit a
    * long, so n_s below ~2^37/W rows per source; beyond that, divide the
    * weights by their gcd or widen the comparison to decimals.
    */
  def sampleToMixture(df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Int]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val wSum = weights.values.sum.toLong
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = counts.keySet.diff(weights.keySet)
    require(missing.isEmpty, s"no mixture weight for sources: $missing")
    val feasibleTotal = counts.map { case (s, n) => n * wSum / weights(s) }.min
    val meta = df.sparkSession.createDataFrame(
      counts.toSeq.map { case (s, n) => (s, n, weights(s).toLong) })
      .toDF(sourceCol, "__n", "__w")
    val bucket = graft.functions.Md5PrefixLong
      .md5_prefix_long(col(idCol).cast("string"), 6)
    df.join(broadcast(meta), sourceCol)
      .filter(bucket * lit(wSum) * col("__n") <
        lit(1L << 24) * lit(feasibleTotal) * col("__w"))
      .select(df.columns.map(col).toSeq: _*) // using-join moved the key first
  }

  /** Per-source Simpson diversity of the token distribution:
    * `1 - Σ (c_i/N)^2` in exact ppm integers — the log-free cousin of
    * entropy (Simpson/Gini concentration), high when vocabulary use is
    * spread, collapsing toward 0 for template/boilerplate sources. The
    * corpus-health number that catches a source of near-identical
    * documents before any dedup pass runs.
    *
    * Shape at scale: one partial-aggregated (source, token) count, one
    * #sources-row fold. Bounds: Σc² ≤ N², so the ppm product stays
    * under 2^63 for per-source token counts to ~3·10^6; beyond,
    * DECIMAL(38,0) sums (ranking unchanged).
    */
  def simpsonDiversity(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val counts = docs
      .select(col(sourceCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * col("c")).as("__s2"))
      .select(col("source"), col("n_tokens"), col("n_distinct"),
        (lit(1000000L) - expr("__s2 * 1000000L DIV (n_tokens * n_tokens)"))
          .as("diversity_ppm"))
  }

  /** Train/validation distribution-drift monitor: hash-split the corpus
    * (same md5-threshold rule as [[splitByHash]]), hash every token
    * into `buckets` feature cells (the [[dsirSelect]] trick), and
    * report per source the scaled L1 distance between the two halves'
    * bucket distributions — `drift_ppm = Σ_cells |a·Nb − b·Na| · 10^6
    * DIV (Na·Nb)`, all integer, 0 for identical distributions, up to
    * 2·10^6 for disjoint ones. A healthy random split reads near 0; a
    * time- or source-correlated leak reads high — the pre-training
    * check that the held-out set actually matches the train
    * distribution.
    *
    * Shape at scale: ONE token-level aggregate keyed by (source,
    * bucket) with both halves counted conditionally in the same pass
    * (no per-half scans, no join of halves); everything after folds
    * the bounded #sources × buckets table. Bounds: Σ|a·Nb − b·Na| ≤
    * 2·Na·Nb, so the ppm product stays under 2^63 for per-source
    * token counts to ~10^8; beyond that the sums upgrade to
    * DECIMAL(38,0).
    */
  def splitDrift(docs: DataFrame, sourceCol: String, idCol: String,
      textCol: String, valBound: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val h = md5(col(idCol).cast("string").cast("binary"))
    val cells = docs
      .withColumn("__val", h < lit(valBound))
      .select(col(sourceCol), col("__val"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("__b",
        graft.functions.Md5PrefixLong.md5_prefix_long(col("tok"), 6) % buckets)
      .groupBy(col(sourceCol), col("__b"))
      .agg(count(when(!col("__val"), 1)).as("a"),
        count(when(col("__val"), 1)).as("b"))
    val totals = cells.groupBy(col(sourceCol))
      .agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    cells.join(broadcast(totals), sourceCol)
      .groupBy(col(sourceCol), col("na"), col("nb"))
      .agg(sum(abs(col("a") * col("nb") - col("b") * col("na"))).as("__l1"))
      .select(col(sourceCol), col("na").as("n_train"), col("nb").as("n_val"),
        when(col("na") * col("nb") === 0, lit(null).cast("long"))
          .otherwise(expr("__l1 * 1000000L DIV (na * nb)")).as("drift_ppm"))
  }

  /** Small-file compaction plan: assign existing shards to merged
    * output files of ~`targetTokens` each by a greedy running sum in
    * shard order — the maintenance pass every long-lived 100 TB table
    * needs when ingestion has left thousands of undersized files.
    * Returns one row per planned output: shard range, file count,
    * token total (the instruction sheet for a rewrite job).
    *
    * The running sum is the [[TwoPass.prefixSum]] exclusive prefix sum
    * (range-partition on shard id, per-partition local window,
    * P-row offset fold) — a long-lived table's manifest can reach 10⁶+
    * shards, so no single task ever folds the whole manifest the way
    * the naive `Window.orderBy(shard)` would. Greedy next-fit in id
    * order (not first-fit-decreasing) is deliberate: it preserves
    * shard locality in the merged files and is deterministic under any
    * partitioning.
    */
  def compactionPlan(manifest: DataFrame, shardCol: String,
      tokensCol: String, targetTokens: Long): DataFrame =
    compactionAssign(manifest, shardCol, tokensCol, targetTokens)
      .groupBy(col("out_id"))
      .agg(count(lit(1)).as("n_shards"),
        sum(col(tokensCol)).as("n_tokens"),
        min(col(shardCol)).as("first_shard"),
        max(col(shardCol)).as("last_shard"))

  /** [[compactionPlan]]'s per-shard routing intermediate — (manifest
    * row, `out_id`) before the per-bin rollup — exposed for the writer
    * that EXECUTES the plan ([[applyCompaction]] joins the corpus
    * through it). Same exclusive-prefix-sum discipline. */
  def compactionAssign(manifest: DataFrame, shardCol: String,
      tokensCol: String, targetTokens: Long): DataFrame = {
    require(targetTokens >= 1, s"targetTokens must be >= 1, got $targetTokens")
    TwoPass.prefixSum(manifest, Seq.empty, Seq(col(shardCol)),
        col(tokensCol), "__before")
      .withColumn("out_id", expr(s"__before DIV ${targetTokens}L"))
  }

  /** EXECUTE the compaction plan — the rewrite job
    * [[compactionPlan]]'s instruction sheet describes, plus its own
    * audit (the [[exportShards]] convention): route every document
    * through its shard's planned output bin (the routing table is the
    * manifest-sized [[compactionAssign]] result — bounded, broadcast),
    * write `partitionBy(out_id)` so each merged output is one
    * directory, read the files back, and RE-DERIVE the plan from the
    * round-tripped rows (distinct shards, recomputed token totals,
    * shard range per bin). Hash-matching [[compactionPlan]] proves the
    * rewrite end to end: no document lost or misrouted, every
    * undersized shard landed in exactly its planned bin, text intact.
    *
    * Shape at scale: one map-only routing join (broadcast of an
    * nShards-row Aggregate-bounded table) + the fanned-out partition
    * write; the audit is one bin-keyed aggregate.
    */
  def applyCompaction(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, targetTokens: Long, outDir: String): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val route = compactionAssign(
        shardManifest(df, idCol, textCol, nShards),
        "shard", "n_tokens", targetTokens)
      .select(col("shard"), col("out_id"))
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .join(broadcast(route), Seq("shard"))
      .write.mode("overwrite").partitionBy("out_id").parquet(outDir)
    val back = df.sparkSession.read.parquet(outDir)
    back.groupBy(col("out_id").cast("long").as("out_id"))
      .agg(count_distinct(col("shard")).as("n_shards"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long"))
          .as("n_tokens"),
        min(col("shard")).as("first_shard"),
        max(col("shard")).as("last_shard"))
  }

  /** Deterministic training-shard manifest — the WebDataset/Megatron
    * "export the corpus as N shards" bookkeeping step. Shard assignment
    * is `md5(id) mod nShards` (content-hash deterministic: stable under
    * repartitioning, engine-reproducible, no RNG), and the manifest is
    * the per-shard release record a loader consumes: document count,
    * token count, id range.
    *
    * Shape at scale: one map-side-partial aggregate keyed by shard —
    * nShards result rows regardless of corpus size, corpus never
    * shuffled beyond the nShards-key aggregate. The writer-side
    * counterpart is `df.withColumn("shard", …).write.partitionBy
    * ("shard")`; this query IS its manifest.
    */
  /** The one shard-routing hash: `md5(id) mod nShards` as an int column.
    * [[shardManifest]] builds the plan from it and [[applyCompaction]]
    * routes documents by it — a single definition so the two can never
    * diverge (a drift would route by one hash while planning by the
    * other, caught only at gate time).
    * 14 hex chars < 2^56: non-negative in a long, so `%` == pmod. */
  private[graft] def shardOf(idCol: Column, nShards: Int): Column =
    (graft.functions.Md5PrefixLong.md5_prefix_long(idCol.cast("string"), 14)
      % nShards).cast("int")

  def shardManifest(df: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    df.select(shardOf(col(idCol), nShards).as("shard"), col(idCol).as("__id"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__toks"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__toks")).as("n_tokens"),
        min(col("__id")).as("min_id"), max(col("__id")).as("max_id"))
  }

  /** Incremental [[shardManifest]] maintenance — the Delta-style
    * refresh: given the previous snapshot and its already-materialized
    * manifest, recompute ONLY the shards touched by added/removed/
    * changed documents and carry every untouched shard's row forward
    * verbatim. At a daily-ingest 100 TB corpus the diff ships 16-byte
    * digests ([[snapshotDiff]]), the affected-shard set is ≤ nShards
    * rows, and the re-aggregation scans just those shards' documents —
    * history in untouched shards is never read again. The result
    * equalling the full recompute over the new snapshot is the oracle
    * contract (batch-seam drift breaks the hash).
    */
  def incrementalShardManifest(oldDf: DataFrame, oldManifest: DataFrame,
      newDf: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val affected = snapshotDiff(oldDf, newDf, idCol, textCol)
      .filter(col("status") =!= "unchanged")
      .select(shardOf(col(idCol), nShards).as("shard"))
      .distinct()
    val carried = oldManifest.join(affected, Seq("shard"), "left_anti")
    val rebuilt = shardManifest(
      newDf.withColumn("__shard", shardOf(col(idCol), nShards))
        .join(affected.withColumnRenamed("shard", "__shard"),
          Seq("__shard"), "left_semi")
        .drop("__shard"),
      idCol, textCol, nShards)
    carried.unionByName(rebuilt)
  }

  /** The ACTUAL partitioned training export [[shardManifest]] describes,
    * plus its own audit: assign `shard = md5(id) mod nShards`, write the
    * corpus `partitionBy("shard")` to `outDir` (one directory per shard —
    * the WebDataset/Megatron layout a loader globs), read the files back,
    * and RE-DERIVE the manifest from the round-tripped rows. The result
    * hash-matching [[shardManifest]]'s proves the writer path end to end:
    * no row lost or misrouted, text intact (token counts recompute from
    * the read-back text), partition values recovered from the directory
    * names.
    *
    * Shape at scale: the write is one map-only pass fanned out by the
    * partition writer (executors write their own files, nothing funnels);
    * the audit aggregate is the same nShards-key fold as the manifest.
    */
  def exportShards(df: DataFrame, idCol: String, textCol: String,
      nShards: Int, outDir: String): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val back = df.sparkSession.read.parquet(outDir)
    back.select(col("shard").cast("int").as("shard"), col(idCol).as("__id"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__toks"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__toks")).as("n_tokens"),
        min(col("__id")).as("min_id"), max(col("__id")).as("max_id"))
  }

  /** Rendezvous (highest-random-weight) shard assignment — Thaler &
    * Ravishankar 1998, the consistent-hashing answer to RESIZING a
    * shard layout. [[shardManifest]]'s `md5(id) mod nShards` is perfect
    * while nShards is fixed, but adding ONE shard reassigns ~(N−1)/N of
    * the corpus (every residue shifts) — at 100 TB that is a full
    * rewrite. HRW assigns each document to
    * {{{
    *   shard(id) = argmax_{s < nShards} md5(id || ':' || s)
    * }}}
    * so growing N→N+1 only re-homes the documents whose NEW shard's
    * weight beats their previous max — an expected 1/(N+1) of the
    * corpus — and every moved document lands ON THE ADDED SHARD (the
    * old weights are unchanged, so a reassignment can only be won by
    * the newcomer). Shrinking is symmetric: only the removed shard's
    * documents move. No ring, no virtual-node table, no coordination
    * state — the assignment is a pure function of (id, N).
    *
    * Deterministic and engine-reproducible: weights are the first 14
    * md5 hex chars (< 2^56), packed `w·64 + s` into one BIGINT so the
    * argmax is a plain `max` with ties broken toward the larger shard
    * id (56-bit weights make a tie a ~2^-56 event, but the break is
    * still deterministic on both engines).
    *
    * Shape at scale: map-only — one projection computing nShards
    * hashes per row inside whole-stage codegen; no shuffle, no state,
    * composes with any downstream partitionBy writer. Cost is
    * O(nShards) per row, so for thousand-shard layouts prefer
    * hierarchical HRW (HRW over shard GROUPS, then within the group);
    * the ≤64 cap keeps the packed argmax inside one BIGINT (56+6
    * bits) and is documented as this spelling's ceiling.
    *
    * @return `df` with an int `shard` column appended
    */
  def rendezvousShard(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 64,
      s"nShards must be in [1, 64] (packed-argmax ceiling), got $nShards")
    val idStr = col(idCol).cast("string")
    val packed = array_max(transform(
      sequence(lit(0), lit(nShards - 1)),
      s => graft.functions.Md5PrefixLong.md5_prefix_long(
        concat(idStr, lit(":"), s.cast("string")), 14) * 64L +
        s.cast("long")))
    df.withColumn("shard", (packed % 64L).cast("int"))
  }

  /** GLOBALLY-SORTED equi-depth export — the pay-sort-once layout for
    * curriculum-ordered training data: every document gets its EXACT
    * global rank under (sortKey, id) via the distributed two-pass rank
    * (no single-task sort anywhere), rank is folded into one of
    * `nBuckets` equal-depth buckets (`(rank−1)·k DIV n` — boundaries
    * are ranks, not sampled values, so the layout is deterministic and
    * oracle-checkable, unlike `repartitionByRange`'s reservoir-sampled
    * bounds), and the corpus is written `partitionBy(bucket)` with rows
    * sorted inside each bucket. A loader that streams bucket 0, 1, …
    * replays the exact global curriculum; a range filter on the sort
    * key prunes whole bucket directories plus file-level min/max stats
    * inside them.
    *
    * The returned manifest is RE-DERIVED from the files read back
    * (same audit contract as [[exportShards]]): per bucket the doc
    * count, token count, and key/id ranges — hash-matching the oracle
    * proves no row was lost or misrouted and the text survived the
    * round trip. Write fan-out is executor-parallel; the audit is an
    * nBuckets-key partial aggregate.
    */
  def exportSorted(df: DataFrame, sortCol: String, idCol: String,
      textCol: String, nBuckets: Int, outDir: String): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val ranked = TwoPass.rank(df, Seq(), Seq(col(sortCol), col(idCol)),
      "__rk", countOut = Some("__n"))
    ranked
      .withColumn("bucket",
        expr(s"CAST((__rk - 1) * $nBuckets DIV __n AS INT)"))
      .drop("__rk", "__n")
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col(sortCol), col(idCol))
      .write.mode("overwrite").partitionBy("bucket").parquet(outDir)
    val back = df.sparkSession.read.parquet(outDir)
    back.select(col("bucket").cast("int").as("bucket"),
        col(sortCol).as("__k"), col(idCol).as("__id"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__toks"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__toks")).as("n_tokens"),
        min(col("__k")).as("min_key"), max(col("__k")).as("max_key"),
        min(col("__id")).as("min_id"), max(col("__id")).as("max_id"))
  }

  /** Token-budget mixture PLAN — the "how many epochs of each source do
    * we train on" table (the LLaMA/Dolma mixing sheet): given target
    * mixture weights in ppm and a total token budget, report per source
    * the supply (docs, tokens), the target token count
    * `budget * w_ppm / 10^6`, and the implied repeat factor in
    * milli-epochs `target * 1000 / supply` (integer math throughout, so
    * any engine derives the identical plan; >1000 milli-epochs means
    * the source repeats, the up-sampling regime the sheet exists to
    * expose). Complements [[sampleToMixture]], which EXECUTES a
    * row-level downsample; this op reports the token-level plan.
    *
    * One aggregate keyed by source (#sources result rows), weight table
    * applied as a literal map — the corpus is scanned once and never
    * shuffled beyond the #sources-key aggregate.
    */
  def mixturePlan(df: DataFrame, sourceCol: String, textCol: String,
      weightsPpm: Seq[(String, Int)], budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    require(weightsPpm.forall(_._2 >= 0), "weights must be non-negative ppm")
    // ppm by definition caps at 1_000_000; checking it here turns the
    // documented budget*ppm < 2^63 overflow bound (budgets to ~9e12
    // tokens) into an enforced one instead of a silent wrong plan
    require(weightsPpm.forall(_._2 <= 1000000),
      "weights are parts-per-million and must be <= 1000000")
    val wMap = map(weightsPpm.flatMap {
      case (s, w) => Seq(lit(s), lit(w.toLong)) }: _*)
    df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long"))
          .as("n_tokens"))
      .withColumn("weight_ppm", coalesce(element_at(wMap, col("source")), lit(0L)))
      // integer DIV end to end: budget*ppm stays under 2^63 for budgets
      // to ~9e12 tokens, and exact integers are what make the plan
      // engine-reproducible
      .withColumn("target_tokens",
        expr(s"${budgetTokens}L * weight_ppm DIV 1000000"))
      .withColumn("repeat_milli",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr("target_tokens * 1000 DIV n_tokens")))
  }

  /** Padding-efficiency PLAN for length-bucketed batching — the
    * "how much compute do we burn on pad tokens" sheet every inference
    * or fixed-shape training job consults before picking bucket
    * boundaries. Docs are bucketed by token count rounded UP to the
    * next `bucketTokens` multiple (the shapes the serving stack
    * compiles); per bucket the report gives doc count, batch count at
    * `batchSize`, real vs padded token totals, and the pad-waste share
    * in ppm. Sweep `bucketTokens` and compare `waste_ppm` to choose the
    * bucket grid.
    *
    * Shape at scale: one map-only projection (token count → bucket) and
    * one partial-aggregated groupBy on the bucket id — #buckets result
    * rows regardless of corpus size, integer arithmetic end to end.
    */
  def paddingPlan(df: DataFrame, textCol: String, bucketTokens: Int,
      batchSize: Int): DataFrame = {
    require(bucketTokens >= 1, s"bucketTokens must be >= 1, got $bucketTokens")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    df.select(TextFunctions.tokenCount(col(textCol)).cast("long").as("__toks"))
      .withColumn("bucket_len",
        expr(s"((__toks + ${bucketTokens - 1}) DIV $bucketTokens) * $bucketTokens"))
      .groupBy(col("bucket_len"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__toks")).as("real_tokens"))
      .withColumn("n_batches", expr(s"(n_docs + ${batchSize - 1}) DIV $batchSize"))
      .withColumn("padded_tokens", col("n_docs") * col("bucket_len"))
      .withColumn("waste_ppm",
        when(col("padded_tokens") === 0, lit(0L))
          .otherwise(expr(
            "(padded_tokens - real_tokens) * 1000000 DIV padded_tokens")))
  }

  /** Temperature-scaled mixture plan (α = 1/2 — the mT5/UniMax "T = 2"
    * rebalance): instead of an externally supplied mixing sheet, the
    * weights derive from the source supplies themselves,
    * w_i ∝ floor(sqrt(n_tokens_i)), flattening the head sources and
    * up-weighting the tail. Reports the same plan columns as
    * [[mixturePlan]] with `weight_ppm` computed, not given.
    *
    * Engine-reproducible despite the sqrt: IEEE-754 requires sqrt to be
    * correctly rounded, so Spark (java.lang.Math.sqrt) and the oracle's
    * C sqrt produce the identical double for any n_tokens < 2^53, and
    * the floor / integer-DIV pipeline after it is exact. The ppm
    * normalizer folds in an unpartitioned window over the #sources-row
    * aggregate — bounded by construction, like the [[dsirSelect]]
    * totals.
    */
  def mixtureTemperaturePlan(df: DataFrame, sourceCol: String,
      textCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    require(budgetTokens <= Long.MaxValue / 1000000L,
      "budgetTokens * ppm must stay under 2^63")
    val per = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long"))
          .as("n_tokens"))
      .withColumn("__s",
        floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
    per.withColumn("__tot", sum(col("__s")).over(Window.partitionBy()))
      .withColumn("weight_ppm",
        when(col("__tot") === 0, lit(0L))
          .otherwise(expr("__s * 1000000 DIV __tot")))
      .withColumn("target_tokens",
        expr(s"${budgetTokens}L * weight_ppm DIV 1000000"))
      .withColumn("repeat_milli",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr("target_tokens * 1000 DIV n_tokens")))
      .drop("__s", "__tot")
  }

  /** Materialize a [[mixturePlan]] into the epoch-expanded corpus the
    * trainer actually reads: each document appears `repeat_milli DIV
    * 1000` whole times, plus one more with probability
    * `(repeat_milli % 1000) / 1000` decided by a deterministic content
    * hash — so the expanded token count converges to the plan's
    * per-source targets with zero RNG and bit-identical output on any
    * engine, any partitioning, any run.
    *
    * Shape at scale: the plan is a #sources-row aggregate broadcast
    * back onto the corpus; the expansion itself is a map-only
    * `explode(sequence(...))` whose fan-out IS the requested epoch
    * count — no shuffle is added over reading the corpus once. Output
    * rows carry (id, source, epoch); downstream writers append epoch to
    * the shard key so repeated copies spread across shards.
    *
    * Each row materializes a `sequence(0, n-1)` array before exploding,
    * so a pathological plan (a near-empty source given a huge budget →
    * thousands of epochs per doc) would build giant per-row arrays; the
    * `maxRepeat` guard fails fast with the offending sources instead.
    * Training mixtures repeat sources a handful of times (4 epochs is
    * already heavy re-use), so the default cap of 1000 is generous.
    */
  def epochExpand(df: DataFrame, sourceCol: String, idCol: String,
      textCol: String, weightsPpm: Seq[(String, Int)],
      budgetTokens: Long, maxRepeat: Long = 1000L): DataFrame = {
    require(maxRepeat >= 1, s"maxRepeat must be >= 1, got $maxRepeat")
    val planAll = mixturePlan(df, sourceCol, textCol, weightsPpm, budgetTokens)
    // #sources rows — validating on the driver costs nothing and turns
    // an executor OOM (a giant per-row sequence array) into a plan error
    val over = planAll
      .filter(col("repeat_milli") > maxRepeat * 1000L)
      .select(col("source"), col("repeat_milli")).collect()
    require(over.isEmpty,
      s"plan repeats exceed maxRepeat=$maxRepeat epochs for: " +
        over.map(r => s"${r.getString(0)} (${r.getLong(1)} milli)").mkString(", "))
    val plan = planAll
      .select(col("source").as("__src"), col("repeat_milli"))
    // same 24-bit md5-prefix hash as sampleToMixture: keep iff
    // h * 1000 < 2^24 * (repeat_milli % 1000)
    val h = graft.functions.Md5PrefixLong
      .md5_prefix_long(col(idCol).cast("string"), 6)
    df.join(broadcast(plan), col(sourceCol) === col("__src"))
      .withColumn("__n", expr("repeat_milli DIV 1000") +
        when(h * lit(1000L) < lit(1L << 24) * (col("repeat_milli") % 1000),
          lit(1L)).otherwise(lit(0L)))
      .filter(col("__n") > 0)
      .select(col(idCol), col(sourceCol),
        explode(sequence(lit(0L), col("__n") - 1)).as("epoch"))
  }

  /** Top-k adjacent-token collocations by pointwise mutual information —
    * the "multi-word expression" miner that feeds tokenizer vocab
    * decisions and phrase-aware dedup. PMI's log is rank-irrelevant
    * (log is monotone), so the score is the scaled integer rational
    * core: `pmi_ppm = c_ab * N * 10^6 DIV (c_a * c_b)` — exact in any
    * aggregation order, engine-identical, no libm anywhere.
    *
    * Shape at scale: bigram construction is a map-only per-doc
    * transform (no self-join on position); pair and unigram counts are
    * partial-aggregated; the marginal join is equi on the word key; the
    * final top-k is a bounded TakeOrderedAndProject. `minCount` prunes
    * the hapax tail BEFORE the marginal join — the pair table that
    * survives is the interesting head, not the corpus.
    *
    * Bounds: c_ab·N·10^6 < 2^63 holds for corpora to ~10^8 tokens with
    * head pairs at ~10^3; beyond that drop the ppm scale or go
    * DECIMAL(38,0) — the ranking is unchanged.
    */
  def pmiCollocations(docs: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(TextFunctions.tokens(lower(col(textCol))).as("ws"))
    // one corpus scalar (token total) — the bm25TopK precedent
    val n = toks.agg(sum(size(col("ws")).cast("long"))).head().getLong(0)
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pairs = toks
      // Spark's sequence() runs DESCENDING when end < start, so the
      // short-doc guard is load-bearing (unlike the oracle's range())
      .select(explode(when(size(col("ws")) >= 2,
        expr("transform(sequence(1, size(ws) - 1), " +
          "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"))
        .otherwise(expr("array()").cast("array<struct<w1:string,w2:string>>")))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .withColumn("pmi_ppm",
        expr(s"c_ab * ${n}L * 1000000L DIV (c_a * c_b)"))
      .select(col("w1"), col("w2"), col("c_ab"), col("pmi_ppm"))
      .orderBy(col("pmi_ppm").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** TextRank keywords (Mihalcea & Tarau 2004): edge-weighted PageRank
    * over the adjacent-token co-occurrence graph — the unsupervised
    * "most central vocabulary" extractor. Where tf-idf keywords score
    * terms per document, TextRank scores them by graph centrality: a
    * word endorsed by well-connected words outranks a merely frequent
    * one. Composition of two shipped kernels: the [[pmiCollocations]]
    * bigram builder and [[Graph.pageRankWeighted]]'s exact integer-ppm
    * rounds.
    *
    * Graph: undirected edges between adjacent tokens (canonicalized
    * least/greatest, self-pairs dropped), weight = adjacency count,
    * pruned at `minCount`. Nodes are the 56-bit md5 word ids (the
    * corpus_keywords spelling — birthday headroom to ~10⁷ vocabulary;
    * a collision would surface loud in the decode guard below). Rank =
    * (pr_ppm DESC, id ASC) via the bounded top-k aggregate.
    *
    * Shape at scale: one map-only bigram pass + partial-aggregated
    * edge counts, then the pageRankWeighted loop (one groupBy(dst)
    * shuffle per round, static side checkpointed); the decode joins
    * the BROADCAST k winners against the vocabulary — the
    * vocabulary-sized side is never broadcast, and an id collision
    * (two words on one winning node) raises rather than emitting a
    * silently duplicated rank.
    *
    * @return (rank 1..k, word, pr_ppm)
    */
  def textRankKeywords(docs: DataFrame, textCol: String, minCount: Long,
      iters: Int, k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(TextFunctions.tokens(lower(col(textCol))).as("ws"))
    val adj = toks
      .select(explode(when(size(col("ws")) >= 2,
        expr("transform(sequence(1, size(ws) - 1), " +
          "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"))
        .otherwise(expr("array()").cast("array<struct<w1:string,w2:string>>")))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
      .filter(col("w1") =!= col("w2"))
    val canon = adj
      .select(least(col("w1"), col("w2")).as("a"),
        greatest(col("w1"), col("w2")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("w"))
      .filter(col("w") >= minCount)
      .localCheckpoint(true) // feeds both edge directions + the vocab
    def wid(c: Column): Column =
      graft.functions.Md5PrefixLong.md5_prefix_long(c, 14)
    val e = canon.select(wid(col("a")).as("src"), wid(col("b")).as("dst"),
        col("w"))
      .unionByName(canon.select(wid(col("b")).as("src"),
        wid(col("a")).as("dst"), col("w")))
    val top = Graph.pageRankWeighted(e, iters = iters, checkpointEvery = 4)
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("pr_ppm").cast("double"), col("node"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("t.id").as("node"),
        (col("r0") + 1).cast("int").as("rank"),
        col("t.score").cast("long").as("pr_ppm"))
    val vocab = canon.select(col("a").as("word"))
      .unionByName(canon.select(col("b").as("word"))).distinct()
      .select(col("word"), wid(col("word")).as("node"))
    vocab.join(broadcast(top), "node")
      .groupBy(col("node"), col("rank"), col("pr_ppm"))
      .agg(sort_array(collect_list(col("word"))).as("__cand"))
      .select(col("rank"),
        when(size(col("__cand")) > 1, raise_error(concat(
          lit("textRankKeywords: 56-bit word-id collision on node rank "),
          col("rank").cast("string"))))
          .otherwise(element_at(col("__cand"), 1)).as("word"),
        col("pr_ppm"))
  }

  /** Lexical top-k retrieval with integer inverse-df weighting: score(doc)
    * = Σ over matched query terms of tf(term, doc) * (C / df(term)), with
    * C/df an INTEGER division (C = 1_000_000). Integer weights make the
    * score exact in any aggregation order — the ranking behaves like
    * tf-idf without floating-point logs that differ in the last ulp
    * across engines. Ties break to the lower doc id.
    *
    * Shape at scale: one narrow explode of the corpus filtered to the
    * query's terms (the inverted-index probe), a df aggregate over that
    * small slice, one tf aggregate, and a bounded global top-k — the
    * corpus itself is never shuffled.
    */
  val LexicalWeightScale = 1000000L

  def lexicalTopK(docs: DataFrame, idCol: String, textCol: String,
      query: String, k: Int): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "query has no terms")
    // lowercase BOTH sides: the query terms are lowercased above, so a
    // raw doc token like "Table" would otherwise never match "table"
    // (the text is lowercased before tokenizing — a generator cannot be
    // nested under lower())
    val hits = docs
      .select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
      .filter(col("tok").isin(terms: _*))
    // tf slice is small by construction (≤ matching docs × k terms) but a
    // stopword-ish term can still match most of the corpus: a window
    // partitioned by the term would funnel all of that term's rows
    // through ONE task. Checkpoint the slice once (one corpus scan for
    // both consumers), partial-aggregate df per term (≤ k rows), and
    // broadcast it back — every stage stays fully parallel.
    val tf = hits.groupBy(col("doc"), col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfTab = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val weighted = tf.join(broadcast(dfTab), "tok")
      .withColumn("weight",
        (lit(LexicalWeightScale) / col("df")).cast("long"))
    val scored = weighted
      .groupBy(col("doc")).agg(sum(col("tf") * col("weight")).as("score"))
    // bounded top-k heap aggregate, not a global sort: ≤ k candidates per
    // partition cross the final shuffle; scores are exact integers in
    // double (< 2^53), and TopKByScore breaks score ties by smaller id
    scored
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("score").cast("double"), col("doc").cast("long"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("t.id").as("doc"),
        (col("r0") + 1).cast("int").as("rank"),
        col("t.score").cast("long").as("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    * standard hybrid-retrieval merge: each input ranking contributes
    * `1/(K + rank)` per document and documents are re-ranked by the
    * sum, so systems with incomparable score scales (lexical tf-idf,
    * BM25, dense ANN) combine WITHOUT calibration. Contributions are
    * exact integers `10^6 DIV (K + rank)`, so the fused ordering is
    * engine-identical; ties break to the smaller id (the [[lexicalTopK]]
    * heap convention).
    *
    * Scale shape: inputs are already bounded top-k tables (≤ Σ k_i
    * rows); the fuse is one union + one partial-aggregated sum + the
    * bounded [[graft.functions.TopKByScore]] heap. Nothing here touches
    * the corpus.
    *
    * @param rankings top-k tables each carrying (doc, rank) — extra
    *                 columns ignored
    * @param rrfK     the RRF damping constant (60 in the paper)
    * @return (doc, rank 1..k, rrf_score)
    */
  def rrfFuse(rankings: Seq[DataFrame], rrfK: Long, k: Int): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")
    require(k >= 1, s"k must be >= 1, got $k")
    val contribs = rankings
      .map(_.select(col("doc"),
        expr(s"CAST(1000000 DIV (${rrfK}L + rank) AS BIGINT)").as("c")))
      .reduce(_ unionByName _)
    contribs
      .groupBy(col("doc")).agg(sum(col("c")).as("rrf_score"))
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("rrf_score").cast("double"), col("doc").cast("long"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("t.id").as("doc"),
        (col("r0") + 1).cast("int").as("rank"),
        col("t.score").cast("long").as("rrf_score"))
  }

  /** The sparse half of [[hashedEmbedding]] — per-(doc, component)
    * SIGNED hashed token counts `(doc, j, v)`, one partial-aggregated
    * sum keyed by the doc id. Exposed for consumers that want the
    * sparse form directly (the perceptron trainer joins components
    * against a weight table; densifying first would rebuild the
    * sparsity it needs).
    *
    * The ±1 sign must be independent of the component index or the
    * Weinberger unbiasedness property dies: with sign = h % 2 and
    * component = h % dim, any even dim makes the sign a function of the
    * component (same parity class), so colliding tokens ALWAYS add
    * constructively and dot products are biased upward. Use a hash bit
    * the bucket never sees: the 13th hex char of the same md5.
    */
  private[graft] def hashedFeatures(df: DataFrame, idCol: String,
      textCol: String, dim: Int): DataFrame = {
    val h = graft.functions.Md5PrefixLong.md5_prefix_long(col("tok"), 12)
    val sb = graft.functions.Md5PrefixLong.md5_slice_long(col("tok"), 13, 1)
    df.select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("doc"), (h % dim).cast("int").as("j"),
        when(sb % 2 === 0, 1L).otherwise(-1L).as("s"))
      .groupBy(col("doc"), col("j")).agg(sum(col("s")).as("v"))
  }

  /** Deterministic feature-hashed document embedding — the "bag of
    * hashed tokens" vector (Weinberger et al. 2009 feature hashing):
    * token t adds sign(t) (±1 from an md5 bit disjoint from the bucket
    * bits) to component `md5(t) mod dim`. No model, no vocabulary, no training — yet dot
    * products approximate token-overlap similarity, which is exactly
    * what a retrieval/dedup pipeline needs BEFORE a learned encoder
    * exists (and the schema/plumbing is identical when one replaces
    * this column with real model output). All-integer components ⇒
    * engine-exact.
    *
    * Shape at scale: explode → one partial-aggregated (doc, component)
    * sum → one per-doc fold into the fixed-width array. Both shuffles
    * key on the doc id; the array build sorts ≤ dim entries per doc.
    */
  def hashedEmbedding(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    hashedFeatures(df, idCol, textCol, dim)
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(struct(col("j"), col("v")))).as("__jv"))
      // dense array: absent components are exact zeros
      .select(col("doc").as(idCol),
        expr(s"transform(sequence(0, ${dim - 1}), i -> " +
          "coalesce(element_at(map_from_entries(__jv), i), 0L))").as("hvec"))
  }

  /** The feature projection the LINEAR QUALITY MODEL family shares
    * with [[scoreLinearHashed]]: token t lands in bucket
    * `md5(t)[1..6] mod dim` (the scorer's own map), `v` = the UNSIGNED
    * token count per (doc, bucket), plus a constant bias component 1
    * at index `dim` for every doc. One explode + one partial-aggregated
    * (doc, j) count; ≤ docs × (dim+1) rows out. */
  private def scorerFeatures(df: DataFrame, idCol: String,
      textCol: String, dim: Int): DataFrame = {
    val j = pmod(graft.functions.Md5PrefixLong.md5_prefix_long(col("tok"), 6),
      lit(dim.toLong)).cast("int")
    df.select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("doc"), j.as("j"))
      .groupBy(col("doc"), col("j")).agg(count(lit(1)).as("v"))
      .unionByName(df.select(col(idCol).as("doc"),
        lit(dim).cast("int").as("j"), lit(1L).as("v")))
  }

  /** In-engine LINEAR QUALITY-MODEL TRAINING — least-squares
    * distillation of an integer teacher score onto hashed token-count
    * features (Widrow–Hoff 1960 LMS, run as damped Jacobi iterations
    * on the normal equations; [[scoreLinearHashed]] consumes a trained
    * weight vector, this is where one comes from without leaving the
    * engine). No sigmoid: logistic loss needs exp(), which no two
    * engines reproduce bit-equal — every quantity here is BIGINT, so
    * the unrolled-rounds oracle matches bit-for-bit (the
    * PageRank/Holt integer-recurrence contract).
    *
    * The round recurrence is a pure function of two bounded moments —
    * the Gram matrix H = XᵀX ((dim+1)² cells) and the moment vector
    * b = Xᵀt — so training runs the DRIVER VENUE the hybrid BPE
    * trainer established: ONE distributed pass builds H and b (a
    * dim²-key partial-aggregated self-join on the doc id, the PCA
    * Gram-pass shape), the collect is dim²-bounded (the
    * kmeans-centroid contract), and the R synchronous rounds
    *   w ← w + (b − H·w) quot (damp · max(H_jj, 1))
    * cost zero Spark jobs (quot = BIGINT division truncating toward
    * zero — Spark `Long./` ≡ DuckDB `//`, both engines verified on
    * negatives). The per-feature H_jj scaling is Jacobi
    * preconditioning: an unscaled step either diverges or crawls on
    * token-count Grams, whose condition number is dominated by the
    * shared doc-length direction.
    *
    * Scale: H and b are the ONLY data-scaled aggregates, one corpus
    * pass each. Overflow: |H·w| ≤ (dim+1)·H_max·|w|_max with |w|
    * bounded by the teacher's own scale (≈ teacher weight × SCALE,
    * empirically ≤ 4·10³ here), so BIGINT holds past 10¹²
    * training tokens; beyond that train on a hash-sampled slice — the
    * standard quality-classifier regime (train on a sample, score
    * everything) — or drop SCALE.
    *
    * @param target integer teacher score per doc (e.g. the stand-in
    *               scorer's token-weight SUM × 1000 — distilling
    *               [[scoreLinearHashed]]'s decision function; any
    *               external model's integer score column slots in)
    * @return trained weights, index dim = bias
    */
  private[graft] def linearDistillCore(df: DataFrame, idCol: String,
      textCol: String, target: Column, dim: Int, damp: Long,
      rounds: Int, ridge: Long = 0L): Array[Long] = {
    val (hm, bv) = distillMoments(df, idCol, textCol, target, dim, damp,
      rounds, ridge)
    val w = Array.fill(dim + 1)(0L)
    (1 to rounds).foreach { _ =>
      val g = Array.tabulate(dim + 1)(j =>
        bv(j) - (0 to dim).map(k => hm(j)(k) * w(k)).sum)
      (0 to dim).foreach(j =>
        w(j) += g(j) / (damp * math.max(hm(j)(j), 1L)))
    }
    w
  }

  /** ONE distributed pass building the normal-equation moments the
    * distillation rounds run on: the (dim+1)² Gram H = XᵀX and the
    * moment vector b = Xᵀt, both bounded collects.
    *
    * `ridge` is the integer Tikhonov term: the rounds run on H + λI
    * instead of H (Hoerl & Kennard 1970). With hashed token counts two
    * buckets can be near-collinear (rare tokens that always co-occur),
    * leaving H near-singular — λ bounds the solution and keeps the
    * damped-Jacobi steps stable where the unridged recurrence
    * oscillates. λ = 0 reproduces the plain normal equations bit-for-
    * bit; driver-side +λ on the (dim+1) diagonal cells, zero extra
    * Spark work. */
  private def distillMoments(df: DataFrame, idCol: String,
      textCol: String, target: Column, dim: Int, damp: Long,
      rounds: Int, ridge: Long = 0L): (Array[Array[Long]], Array[Long]) = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    require(damp >= 1, s"damp must be >= 1, got $damp")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(ridge >= 0, s"ridge must be >= 0, got $ridge")
    val tv = df.select(col(idCol).as("doc"), target.cast("long").as("t"))
    val fx = scorerFeatures(df, idCol, textCol, dim).localCheckpoint(true)
    // bounded collects: (dim+1)² Gram cells, dim+1 moment rows
    val hm = Array.ofDim[Long](dim + 1, dim + 1)
    fx.as("a").join(fx.as("b"), "doc")
      .groupBy(col("a.j").as("j"), col("b.j").as("k"))
      .agg(sum(col("a.v") * col("b.v")).as("h"))
      .collect()
      .foreach(r => hm(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    val bv = Array.fill(dim + 1)(0L)
    fx.join(tv, "doc")
      .groupBy(col("j")).agg(sum(col("v") * col("t")).as("b"))
      .collect()
      .foreach(r => bv(r.getInt(0)) = r.getLong(1))
    (0 to dim).foreach(j => hm(j)(j) += ridge)
    (hm, bv)
  }

  /** The CONVERGENCE RECEIPT of [[linearDistillCore]]: the L1 norm of
    * the normal-equation residual g = b − H·w sampled every
    * `checkpointEvery` rounds (post-update) — a monotone-decaying
    * curve is the "training works" evidence next to the held-out
    * census; a flat or rising tail says the damping is outside the
    * stable band for this corpus. Same one distributed Gram/moment
    * pass; the checkpoints are free driver arithmetic on the collected
    * (dim+1)² state. */
  def linearDistillCurve(df: DataFrame, idCol: String, textCol: String,
      target: Column, dim: Int, damp: Long, rounds: Int,
      checkpointEvery: Int, ridge: Long = 0L): DataFrame = {
    require(checkpointEvery >= 1 && rounds % checkpointEvery == 0,
      s"rounds=$rounds must tile checkpointEvery=$checkpointEvery")
    val spark = df.sparkSession
    import spark.implicits._
    val (hm, bv) = distillMoments(df, idCol, textCol, target, dim, damp,
      rounds, ridge)
    val w = Array.fill(dim + 1)(0L)
    def residualL1: Long = (0 to dim).map(j =>
      math.abs(bv(j) - (0 to dim).map(k => hm(j)(k) * w(k)).sum)).sum
    val curve = (1 to rounds).flatMap { r =>
      val g = Array.tabulate(dim + 1)(j =>
        bv(j) - (0 to dim).map(k => hm(j)(k) * w(k)).sum)
      (0 to dim).foreach(j =>
        w(j) += g(j) / (damp * math.max(hm(j)(j), 1L)))
      if (r % checkpointEvery == 0) Some((r, residualL1)) else None
    }
    curve.toDF("round", "g_l1")
      .select(col("round").cast("int").as("round"), col("g_l1"))
  }

  /** The trained-model artifact of [[linearDistillCore]]: (j, w) for
    * every feature bucket plus the bias at j = dim. `w quot SCALE`
    * slots straight into [[scoreLinearHashed]]'s weight seam (same
    * bucket map), closing the train→deploy loop in-engine. */
  def linearDistillTrain(df: DataFrame, idCol: String, textCol: String,
      target: Column, dim: Int, damp: Long, rounds: Int,
      ridge: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    linearDistillCore(df, idCol, textCol, target, dim, damp, rounds, ridge)
      .toSeq.zipWithIndex.map { case (wj, j) => (j, wj) }
      .toDF("j", "w")
      .select(col("j").cast("int").as("j"), col("w"))
  }

  /** Train→score composed end-to-end: [[linearDistillCore]] on the
    * `trainPred` slice, then the trained weights score the HELD-OUT
    * slice — prediction sign(margin) with 0 → −1 against the teacher's
    * sign on docs the trainer never saw, rolled up as the confusion
    * census (y, pred, n). Scoring is one margin aggregate over the
    * held-out feature table with the weights crossing as a dim+1
    * literal (map-side), plus the (y, pred) fold. */
  def linearDistillScore(df: DataFrame, idCol: String, textCol: String,
      target: Column, trainPred: Column, dim: Int, damp: Long,
      rounds: Int, ridge: Long = 0L): DataFrame = {
    val w = linearDistillCore(df.filter(trainPred), idCol, textCol,
      target, dim, damp, rounds, ridge)
    val wArr = array(w.toSeq.map(lit): _*)
    val ho = df.filter(!trainPred)
    val tv = ho.select(col(idCol).as("doc"), target.cast("long").as("t"))
    scorerFeatures(ho, idCol, textCol, dim)
      .groupBy(col("doc"))
      .agg(sum(col("v") * element_at(wArr, col("j") + 1)).as("marg"))
      .join(tv, "doc")
      .select(when(col("t") > 0, 1L).otherwise(-1L).as("y"),
        when(col("marg") > 0, 1L).otherwise(-1L).as("pred"))
      .groupBy(col("y"), col("pred")).agg(count(lit(1)).as("n"))
  }

  /** Independence deviation of a categorical crosstab — the "is my
    * language mix independent of my source mix" release check (a
    * chi-square-style screen with the monotone square kept un-taken):
    * per (a, b) cell, the observed share and the
    * independence-expected share in ppm, and their absolute deviation.
    * Cells with large `dev_ppm` are the source×language (or
    * format×split, domain×bucket) imbalances a mixture plan has to
    * address before training.
    *
    * All-integer and overflow-safe to budgets of ~9·10^12 rows: shares
    * are floored ppm (`x·10^6 DIV total`), the expected share is the
    * product of two ppms floored back to ppm — each term is the same
    * fixed shape in both engines, so the report is engine-exact.
    * One cell aggregate scans the corpus once; the marginals and the
    * total fold as windows OVER THE AGGREGATE (#a × #b rows, the
    * bounded-input window exemption the mixture normalizers use) — no
    * join, no cross product.
    */
  def independenceDeviation(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val cell = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("n"))
    cell
      .withColumn("r", sum(col("n")).over(Window.partitionBy(col(aCol))))
      .withColumn("c", sum(col("n")).over(Window.partitionBy(col(bCol))))
      .withColumn("t", sum(col("n")).over(Window.partitionBy()))
      .withColumn("obs_ppm", expr("n * 1000000 DIV t"))
      .withColumn("exp_ppm",
        expr("(r * 1000000 DIV t) * (c * 1000000 DIV t) DIV 1000000"))
      .select(col(aCol), col(bCol), col("n"), col("obs_ppm"), col("exp_ppm"),
        abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
  }

  /** Deterministic weight-proportional sample of k documents — priority
    * sampling (Duffield, Lund & Thorup 2007) with the random tag
    * replaced by a content hash: each doc draws priority
    * `q = hash(id) DIV weight` (weight = token count + 1) and the k
    * SMALLEST priorities win, so long documents are proportionally more
    * likely to be kept, the sample is reproducible across engines,
    * runs, and partitionings, and adding documents never changes the
    * relative order of existing ones (the property that makes the
    * sample maintainable incrementally: a newcomer either displaces the
    * current maximum or leaves the sample untouched).
    *
    * Shape at scale: one map-only projection (hash, weight, divide) and
    * one bounded top-k heap aggregate — ≤ k candidates per partition
    * cross the final shuffle, no global sort, nothing driver-side.
    * Priorities are < 2^48 (12 hex chars), exact in double.
    */
  def prioritySample(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pri = df.select(col(idCol).cast("long").as("doc"),
        (TextFunctions.tokenCount(col(textCol)).cast("long") + 1).as("w"))
      .withColumn("q",
        graft.functions.Md5PrefixLong.md5_prefix_long(col("doc").cast("string"), 12))
      .withColumn("q", expr("q DIV w"))
    pri
      .agg(graft.functions.TopKByScore.top_k_by_score(
        -col("q").cast("double"), col("doc"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("t.id").as("doc"),
        (col("r0") + 1).cast("int").as("rank"),
        (-col("t.score")).cast("long").as("priority"))
  }

  /** Exact PHRASE search over a positional inverted index: top-k
    * documents by number of occurrences of the exact token sequence
    * `phrase` (adjacent, in order). The operator a quoted query hits in
    * any search engine — and the decontamination probe for verbatim
    * benchmark prompts where shingle overlap is too coarse.
    *
    * Why an index probe and not a per-doc text rescan: at corpus scale
    * the (token, doc, position) index is built ONCE and probed per
    * phrase; the probe filters the index to the phrase's words — an
    * equality filter Catalyst pushes below the generate via the isin —
    * so each phrase costs tf(w₁)+…+tf(wₘ) rows, not a corpus scan. An
    * occurrence at start position p is the m-way equi-join of word i's
    * positions shifted by −i on (doc, start): each join input is one
    * word's posting list, partial-shuffled on a compact key; repeated
    * phrase words work because the shift, not the word, disambiguates.
    * Final top-k is the bounded heap aggregate (no global sort).
    */
  def phraseSearchTopK(docs: DataFrame, idCol: String, textCol: String,
      phrase: String, k: Int): DataFrame = {
    val words = phrase.split("\\s+").filter(_.nonEmpty).toSeq
    require(words.size >= 2, "phrase needs at least 2 tokens")
    val pos = docs
      .select(col(idCol).as("doc"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("p", "tok")))
      .filter(col("tok").isin(words.distinct: _*))
      .localCheckpoint(true)
    val starts = words.zipWithIndex.map { case (w, i) =>
      pos.filter(col("tok") === w).select(col("doc"), (col("p") - i).as("start"))
    }
    val occ = starts.reduce((a, b) => a.join(b, Seq("doc", "start")))
    occ.groupBy(col("doc")).agg(count(lit(1)).as("occurrences"))
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("occurrences").cast("double"), col("doc").cast("long"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("t.id").as("doc"),
        (col("r0") + 1).cast("int").as("rank"),
        col("t.score").cast("long").as("occurrences"))
  }

  /** "More like this": top-k documents sharing rare features with a
    * probe document — the sparse-lexical sibling of the dense ANN
    * family (related-documents panels, near-dup triage, citation
    * suggestion). `features` is any per-doc array<string> — distinct
    * tokens for topical match, word shingles for near-dup retrieval.
    * Score = Σ over shared DISTINCT features of `10^6 DIV df(feature)`:
    * exact integers, rare shared features dominate, ties break to the
    * lower doc id.
    *
    * Shape at scale: the probe's feature set is a one-doc filter
    * (predicate pushdown on the id column) and broadcasts; the corpus
    * side is the (feature, doc) inverted index semi-joined to those ≤
    * |probe| features BEFORE any counting, so df aggregation and
    * scoring touch only matching postings. `maxDf` drops stop-features
    * (df > maxDf) — the same frequent-set discipline as the line/ngram
    * dedup family: without it one universal feature drags the whole
    * corpus into the candidate set. Final top-k is the bounded heap
    * aggregate.
    */
  def moreLikeThis(docs: DataFrame, idCol: String, features: Column,
      probeId: Long, k: Int, maxDf: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    // CALLER CONTRACT (the Dedup.shingleRows lesson): build `features`
    // on a MATERIALIZED column of `docs` (e.g. pre-tokenize into its
    // own projection), not directly on raw text — higher-order feature
    // expressions are interpreted, and CollapseProject would otherwise
    // inline the tokenizer into every element reference, re-splitting
    // the text O(len) times per row. The explode below is the Generate
    // barrier that keeps the caller's projection separate.
    val index = docs.select(col(idCol).as("doc"),
      explode(array_distinct(features)).as("tok"))
    // probe side: filter BEFORE exploding — one document read under the
    // id pushdown, not a corpus-wide feature explode; distinct() is a
    // semantic no-op (features are distinct per doc) but makes the
    // broadcast bounded BY CONSTRUCTION for the lint and the reviewer
    val probe = docs.filter(col(idCol) === probeId)
      .select(explode(array_distinct(features)).as("tok")).distinct()
    // both consumers (df counting, scoring) share the checkpointed
    // postings slice — small by construction (docs sharing a probe
    // feature), same discipline as lexicalTopK's tf slice
    val postings = index.join(broadcast(probe), "tok").localCheckpoint(true)
    val dfTab = postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val scored = postings.filter(col("doc") =!= probeId)
      .join(broadcast(dfTab), "tok")
      .groupBy(col("doc"))
      .agg(sum(expr("1000000L DIV df")).as("score"))
    scored
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("score").cast("double"), col("doc").cast("long"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("t.id").as("doc"),
        (col("r0") + 1).cast("int").as("rank"),
        col("t.score").cast("long").as("score"))
  }

  /** BM25 per-(doc, term) contribution as ONE SQL expression string,
    * shared verbatim by the Spark side (`expr`) and the DuckDB oracle:
    * IEEE +,-,*,/ are correctly rounded, so the same expression tree on
    * the same integer inputs produces the BIT-IDENTICAL double in both
    * engines — then `floor(x * 1e9)` quantizes to an exact BIGINT that
    * sums order-independently. The classic log-idf is deliberately
    * replaced by its rational core `(N - df + 0.5)/(df + 0.5)` because
    * `ln` is not correctly rounded and differs across libm builds —
    * same ranking monotonicity, engine-exact arithmetic.
    *
    * k1 = 1.2, b = 0.75 (the standard defaults) are inlined as literals
    * so both engines parse the identical decimal constants.
    *
    * @param nn    total corpus doc count (SQL integer literal or column)
    * @param sumdl total corpus token count (ditto)
    */
  def bm25ContribSql(nn: String, df: String, tf: String, dl: String,
      sumdl: String): String =
    s"CAST(FLOOR(((CAST($nn - $df AS DOUBLE) + 0.5) / (CAST($df AS DOUBLE) + 0.5)) * " +
      s"((CAST($tf AS DOUBLE) * 2.2) / (CAST($tf AS DOUBLE) + 1.2 * " +
      s"(0.25 + 0.75 * (CAST($dl * $nn AS DOUBLE) / CAST($sumdl AS DOUBLE))))) * " +
      s"1000000000.0) AS BIGINT)"

  /** BM25 top-k retrieval over an inverted-index probe — the ranking
    * big sibling of [[lexicalTopK]]: document-length normalization and
    * saturating term frequency, in engine-exact fixed-point arithmetic
    * (see [[bm25ContribSql]]).
    *
    * Shape at scale: ONE corpus scan produces both the per-doc token
    * length and the query-term hits (the length rides the explode), the
    * corpus-wide totals (N, Σdl) are two scalars collected once, df is a
    * partial-aggregated ≤k-row table broadcast back onto the tf slice,
    * and the final top-k is the bounded heap aggregate — the corpus is
    * never shuffled.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      query: String, k: Int): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "query has no terms")
    val toks = docs.select(col(idCol).as("doc"),
      TextFunctions.tokens(lower(col(textCol))).as("ws"))
    // two corpus scalars; the only driver materialization
    val totals = toks.agg(
      count(lit(1)).as("n"), sum(size(col("ws")).cast("long")).as("sumdl")).head()
    val (nn, sumdl) = (totals.getLong(0), totals.getLong(1))
    val hits = toks
      .select(col("doc"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("tok"))
      .filter(col("tok").isin(terms: _*))
    // same hot-term discipline as [[lexicalTopK]]: checkpoint the tf
    // slice, partial-aggregate df (≤ k rows), broadcast join-back — no
    // single task ever holds a whole term's postings
    val tf = hits.groupBy(col("doc"), col("tok"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .localCheckpoint(true)
    val dfTab = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val withDf = tf.join(broadcast(dfTab), "tok")
    val scored = withDf
      .withColumn("contrib",
        expr(bm25ContribSql(nn.toString, "df", "tf", "dl", sumdl.toString)))
      .groupBy(col("doc")).agg(sum(col("contrib")).as("score"))
    scored
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("score").cast("double"), col("doc").cast("long"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("r0", "t")))
      .select(col("t.id").as("doc"),
        (col("r0") + 1).cast("int").as("rank"),
        col("t.score").cast("long").as("score"))
  }

  /** PII patterns, RE2-compatible (no lookarounds) so Java regex (Spark)
    * and RE2 (DuckDB oracle) match the identical spans. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}[- ][0-9]{4}\\b"

  /** PII scrubbing: count and redact email/phone spans. Pure per-row
    * regex expressions inside whole-stage codegen — zero shuffles, scales
    * embarrassingly; the redaction pass every compliance pipeline runs
    * before training. Counts are kept alongside the redacted text so the
    * scrub rate per source/language is one aggregate away.
    */
  def scrubPii(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0))).cast("long"))
      .withColumn("clean_text",
        regexp_replace(regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>"))

  /** URL canonicalization — the comparison form every crawl pipeline
    * computes before URL-level dedup (RefinedWeb §3.1 / CCNet both
    * dedup by URL before touching content): lowercase scheme and host,
    * strip the scheme's DEFAULT port only (:443 for https, :80 for
    * http — an explicit :8080 is a different origin and survives),
    * strip one leading `www.`, drop query and fragment, collapse
    * trailing slashes (empty path → `/`), keep path case (paths are
    * case-sensitive; hosts are not). `domain` is the last two host
    * labels — the registered domain under generic TLDs (a public-
    * suffix list would refine co.uk-style hosts; documented
    * approximation). Pure per-row regex expressions — map-only.
    *
    * Appends: `scheme`, `host`, `domain`, `canon_url`.
    */
  def urlCanonicalize(df: DataFrame, urlCol: String): DataFrame = {
    val scheme = lower(regexp_extract(col(urlCol),
      "^([A-Za-z][A-Za-z0-9+.\\-]*)://", 1))
    val hostport = lower(regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)", 1))
    val rawPath = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)", 1)
    val noDefPort = when(scheme === "https",
        regexp_replace(hostport, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .otherwise(hostport)
    val host = regexp_replace(noDefPort, "^www\\.", "")
    // not rtrim(col, "/"): the two-arg TRIM signature is deprecated in
    // Spark 4 and warns on every plan
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val cleanPath = when(trimmed === "", lit("/")).otherwise(trimmed)
    df.withColumn("scheme", scheme)
      .withColumn("host", host)
      .withColumn("domain", regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
      .withColumn("canon_url",
        concat(col("scheme"), lit("://"), col("host"), cleanPath))
  }

  /** The crawl front door: canonicalize URLs, refuse blocklisted
    * registered domains, and keep ONE page per canonical URL (lowest id
    * wins) — RefinedWeb's stage-0 gates before any byte of content is
    * parsed, which is what makes them the cheapest filters in the whole
    * pipeline. One broadcast-sized blocklist membership test and one
    * partial-aggregated min per canonical URL; no content is shuffled.
    *
    * @return one row per page: idCol, `domain`, `canon_url`, `reason`
    *         (`blocked_domain` > `duplicate_url` > `ok`), `keep`
    */
  def urlGate(df: DataFrame, idCol: String, urlCol: String,
      blockedDomains: Seq[String]): DataFrame = {
    val canon = urlCanonicalize(df, urlCol)
    val keeper = canon.groupBy(col("canon_url"))
      .agg(min(col(idCol)).as("__keeper"))
    val reason = when(col("domain").isin(blockedDomains: _*),
        lit("blocked_domain"))
      .when(col(idCol) > col("__keeper"), lit("duplicate_url"))
      .otherwise(lit("ok"))
    canon.join(keeper, Seq("canon_url"))
      .withColumn("reason", reason)
      .withColumn("keep", col("reason") === "ok")
      .drop("__keeper")
  }

  /** Per-document repetition stats (Gopher-style quality signal): total
    * words, distinct words, the count of the most repeated word, and the
    * duplicate-word fraction. Computed entirely INSIDE the row with
    * higher-order array functions — sort the token array once, then a
    * single linear `aggregate` pass finds the longest equal-run (= the
    * mode's count). No explode, no shuffle: per-doc quality scoring at
    * 100 TB is a map-only job.
    */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    // materialize the token array ONCE: HOFs are interpreted (no codegen
    // CSE) and three consumers referencing tokens(text) directly would
    // re-split the text three times per row; CollapseProject will not
    // inline a non-cheap expression that is referenced multiple times
    val withWs = df.withColumn("__ws", TextFunctions.tokens(col(textCol)))
    val toks = col("__ws")
    val sorted = array_sort(toks)
    // longest run of equal adjacent tokens in the sorted array == max
    // per-word count; one O(n) fold, no quadratic distinct×scan
    val topRun = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    withWs
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("top_word_count", topRun)
      .withColumn("dup_ratio",
        when(col("n_words") === 0, lit(0.0d)).otherwise(
          (col("n_words") - col("n_distinct")).cast("double") /
            col("n_words").cast("double")))
      .drop("__ws")
  }

  /** Deterministic train/val/test assignment by content-independent hash:
    * the first hex chars of md5(id) are uniform, so a lexicographic
    * threshold on the hash string IS a reproducible percentage split —
    * the same doc lands in the same split on every engine, every run,
    * and adding documents never reassigns existing ones (the property
    * random splits lack). `bounds` are (label, exclusiveUpperHexPrefix)
    * in ascending order; everything above the last bound gets
    * `restLabel`. Map-only, no shuffle.
    */
  def splitByHash(df: DataFrame, idCol: String,
      bounds: Seq[(String, String)], restLabel: String): DataFrame = {
    // mis-ordered bounds would silently swallow later buckets (the first
    // matching `when` wins) — a skewed split with no error
    require(bounds.map(_._2) == bounds.map(_._2).sorted,
      s"split bounds must be ascending, got ${bounds.map(_._2).mkString(", ")}")
    val h = md5(col(idCol).cast("string").cast("binary"))
    val expr0 = bounds.foldRight(lit(restLabel): Column) { case ((label, hi), rest) =>
      when(h < lit(hi), lit(label)).otherwise(rest)
    }
    df.withColumn("split", expr0)
  }

  /** Dataset-version diff — the release-to-release audit every managed
    * corpus needs: which documents were ADDED, REMOVED, CHANGED, or
    * left UNCHANGED between two snapshots, keyed by the stable document
    * id with change detected on a content digest.
    *
    * Scale shape: each side is projected to
    * (id, dims, 16-byte md5(content)) BEFORE the join, so the one
    * full-outer hash shuffle carries digests, never document bodies —
    * diffing two 100 TB snapshots moves O(ids) small rows. Status is a
    * map-side case over null-ness + digest equality; roll-ups
    * downstream are ordinary partial aggregates. Deterministic by
    * construction (no sampling, no floats).
    *
    * @param dims passthrough attribute columns (taken from the NEW side
    *             for surviving docs, the OLD side for removed ones)
    * @return one row per id in either snapshot:
    *         (id, dims..., status ∈ added|removed|changed|unchanged)
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCol: String, dims: Seq[String] = Nil): DataFrame = {
    def proj(df: DataFrame, side: String) = df.select(
      col(idCol),
      struct((lit(1).as("__one") +: dims.map(col)): _*).as(s"__dim_$side"),
      md5(col(contentCol).cast("binary")).as(s"__h_$side"))
    proj(oldDf, "old").join(proj(newDf, "new"), Seq(idCol), "full_outer")
      .select(col(idCol) +:
        dims.map(d => coalesce(col(s"__dim_new.$d"), col(s"__dim_old.$d"))
          .as(d)) :+
        when(col("__h_old").isNull, "added")
          .when(col("__h_new").isNull, "removed")
          .when(col("__h_old") === col("__h_new"), "unchanged")
          .otherwise("changed").as("status"): _*)
  }

  /** Greedy coverage-maximizing selection — the submodular
    * "most diverse k documents" pick (facility location over shingle
    * features, the lazy-greedy family behind coreset/diverse-subset
    * curation): round t keeps the document adding the MOST
    * not-yet-covered distinct word n-gram shingles, ties to the
    * smallest id. The greedy prefix carries the classic (1−1/e)
    * coverage guarantee, and the gain sequence is the marginal-utility
    * curve a curator reads to size the subset.
    *
    * Engine-exact: features are the 56-bit md5 shingle hashes (the
    * dedup spelling), gains are plain counts, the argmax is
    * (gain desc, doc asc).
    *
    * Shape at scale: the feature index is one distinct explode,
    * checkpointed once; the residual is NEVER materialized — each
    * round is one scan of the staged feature table with the ≤k picked
    * ids filtered map-side and the accumulated COVERED-token set
    * (≤ k picked docs' tokens — bounded, broadcast) anti-joined
    * map-side, then a partial-aggregated count + a 1-row argmax
    * collect (the kmeans driver-scalar pattern — k rows total reach
    * the driver). At 100 TB that is the difference between rewriting
    * a TB-sized residual k times and never rewriting it at all.
    *
    * Precondition: every round must find a positive-gain candidate
    * (fails loud otherwise) — k ≪ corpus size in any real call.
    *
    * @return (rank 1..k, doc, gain)
    */
  def coverageMaxSelect(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    coverageMaxSelectFromFeatures(
      coverageFeatures(docs, idCol, textCol, n).localCheckpoint(true), k)
  }

  /** The (doc, tok) shingle feature table the coverage selectors run
    * over: one distinct explode, 56-bit md5 shingle hashes (the dedup
    * spelling). Exposed so the exact and stochastic selectors — and
    * any other facility-location consumer — can share ONE staged copy
    * instead of re-shingling the corpus per query (see [[Staged]]);
    * callers materialize it (localCheckpoint) before looping over it. */
  def coverageFeatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    docs
      .select(col(idCol).as("doc"),
        explode(TextFunctions.shingles(col(textCol), n)).as("sh"))
      .select(col("doc"),
        graft.functions.Md5PrefixLong.md5_prefix_long(col("sh"), 14).as("tok"))
      .distinct()
  }

  /** [[coverageMaxSelect]] over an already-staged feature table. */
  def coverageMaxSelectFromFeatures(feats: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = feats.sparkSession
    // covered tokens of the picked set so far: k·|doc| bounded,
    // broadcast — the residual itself is never rewritten (the
    // stochastic selector's shape, which is also the faster one: a
    // materialization-free scan per round beats re-checkpointing a
    // shrinking residual at every test and production scale we've
    // measured)
    var covered: Option[DataFrame] = None
    var picked = Vector.empty[(Long, Long)] // (doc, gain)
    for (t <- 1 to k) {
      val unpicked = if (picked.isEmpty) feats
        else feats.filter(!col("doc").isin(picked.map(p => Long.box(p._1)): _*))
      val uncov = covered.fold(unpicked)(cov =>
        unpicked.join(broadcast(cov), Seq("tok"), "left_anti"))
      val top = uncov.groupBy(col("doc")).agg(count(lit(1)).as("g"))
        .agg(max_by(struct(col("doc"), col("g")),
          struct(col("g"), -col("doc"))).as("w"))
        .select(col("w.doc"), col("w.g")).collect()
      require(top.nonEmpty && !top(0).isNullAt(0),
        s"coverageMaxSelect: no positive-gain candidate at round $t — " +
          "k exceeds the corpus's coverable diversity")
      val (d, g) = (top(0).getLong(0), top(0).getLong(1))
      picked = picked :+ (d, g)
      if (t < k) {
        val dToks = feats.filter(col("doc") === d).select(col("tok"))
        covered = Some(covered.fold(dToks)(_ unionByName dToks)
          .distinct().localCheckpoint(true))
      }
    }
    import spark.implicits._
    picked.zipWithIndex
      .map { case ((d, g), i) => (i + 1, d, g) }
      .toDF("rank", "doc", "gain")
  }

  /** Stochastic-greedy coverage selection (Mirzasoleiman et al.,
    * "Lazier Than Lazy Greedy", AAAI 2015): each round scores only a
    * SAMPLE of the remaining documents instead of all of them, trading
    * the exact-greedy (1−1/e) bound for (1−1/e−ε) at sample size
    * (N/k)·ln(1/ε) — the scale path when [[coverageMaxSelect]]'s
    * k-full-scans wall matters (its per-round cost is the whole
    * residual; this one's is the residual RESTRICTED to sampleSize
    * docs).
    *
    * Engine-exact determinism: "uniformly at random" is replaced by
    * the sampleSize smallest 56-bit md5(doc ':' round) draws over the
    * NOT-YET-PICKED docs (the paper's N∖S pool — a fully covered doc
    * can still be drawn and simply contributes no gain row) — a fixed
    * permutation per round that any engine reproduces bit-for-bit
    * (the distributed analogue of a seeded shuffle), so the oracle
    * unrolls the identical rounds.
    *
    * Shape at scale: the doc-id pool is built ONCE (one distinct over
    * the feature table); each round's sample is a TakeOrdered over
    * that id list (map-only filter of the ≤k picked ids, top
    * sampleSize by hash — never a global sort materialization, never
    * a per-round re-distinct of the residual), its ids broadcast as a
    * LIMIT-bounded set into the feature semi-join. The residual is
    * NEVER rewritten (the shape [[coverageMaxSelect]] now shares):
    * the accumulated COVERED-token set (≤ k picked docs' tokens —
    * bounded, broadcast, materialized per round at its tiny size)
    * restricts the gain count as one map-side anti-join over the
    * once-checkpointed feature table. Per round: one broadcast-pruned
    * scan, a 1-row argmax collect, zero residual materializations —
    * and this variant's scan is further restricted to the sampleSize
    * sampled docs, which is what makes it the scale path when even
    * one full-residual gain scan per round is the wall.
    *
    * @return (rank 1..k, doc, gain)
    */
  def coverageStochasticSelect(docs: DataFrame, idCol: String,
      textCol: String, n: Int, k: Int, sampleSize: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    coverageStochasticSelectFromFeatures(
      coverageFeatures(docs, idCol, textCol, n).localCheckpoint(true),
      k, sampleSize)
  }

  /** [[coverageStochasticSelect]] over an already-staged feature table
    * (shares [[coverageFeatures]]' staged copy with the exact
    * selector). */
  def coverageStochasticSelectFromFeatures(feats: DataFrame, k: Int,
      sampleSize: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(sampleSize >= 1, s"sampleSize must be >= 1, got $sampleSize")
    val spark = feats.sparkSession
    // the sampling pool's id list, built once — per-round restriction
    // is a map-only filter of the ≤k picked ids, not a re-distinct of
    // the shrinking residual
    val docIds = feats.select(col("doc")).distinct().localCheckpoint(true)
    // covered tokens of the picked set so far: k·|doc| bounded
    var covered: Option[DataFrame] = None
    var picked = Vector.empty[(Long, Long)]
    for (t <- 1 to k) {
      // the round's candidate pool: sampleSize not-yet-picked docs,
      // drawn by the (doc, round)-keyed hash permutation;
      // limit-bounded so the semi-join side broadcasts safely at any
      // corpus size
      val cand = (if (picked.isEmpty) docIds
        else docIds.filter(!col("doc").isin(picked.map(_._1): _*)))
        .orderBy(graft.functions.Md5PrefixLong.md5_prefix_long(
            concat(col("doc").cast("string"), lit(s":$t")), 14),
          col("doc"))
        .limit(sampleSize)
      val pool = feats.join(broadcast(cand), Seq("doc"), "left_semi")
      val uncov = covered.fold(pool)(cov =>
        pool.join(broadcast(cov), Seq("tok"), "left_anti"))
      val top = uncov
        .groupBy(col("doc")).agg(count(lit(1)).as("g"))
        .agg(max_by(struct(col("doc"), col("g")),
          struct(col("g"), -col("doc"))).as("w"))
        .select(col("w.doc"), col("w.g")).collect()
      require(top.nonEmpty && !top(0).isNullAt(0),
        s"coverageStochasticSelect: no positive-gain candidate at round " +
          s"$t — k·sampleSize exceeds the corpus's coverable diversity")
      val (d, g) = (top(0).getLong(0), top(0).getLong(1))
      picked = picked :+ (d, g)
      if (t < k) {
        val dToks = feats.filter(col("doc") === d).select(col("tok"))
        covered = Some(covered.fold(dToks)(_ unionByName dToks)
          .distinct().localCheckpoint(true))
      }
    }
    import spark.implicits._
    picked.zipWithIndex
      .map { case ((d, g), i) => (i + 1, d, g) }
      .toDF("rank", "doc", "gain")
  }

  /** Three-way snapshot merge — the versioned-corpus reconciliation
    * when two curation branches edited the same release (team A's PII
    * re-scrub, team B's quality re-filter): per id, classic VCS
    * semantics on content digests against the common base.
    *
    *   - neither side changed → `unchanged`
    *   - exactly one side changed (edit, add, or delete) → `ours` /
    *     `theirs` — that side wins automatically
    *   - both changed identically (same edit, same delete) → `both_same`
    *   - both changed differently → `conflict` (pick = null; a human or
    *     a policy resolves)
    *
    * "Changed" is null-safe digest inequality, so adds and deletes fall
    * out of the same rule. Scale shape: three content digests + two
    * full-outer equi joins on the id — every comparison map-side after
    * the joins; output one row per id in any snapshot.
    *
    * @return (idCol, status, pick ∈ base|ours|theirs|null)
    */
  def threeWayMerge(base: DataFrame, ours: DataFrame, theirs: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    def proj(df: DataFrame, side: String) = df.select(
      col(idCol), md5(col(contentCol).cast("binary")).as(s"__h_$side"))
    val j = proj(base, "b")
      .join(proj(ours, "o"), Seq(idCol), "full_outer")
      .join(proj(theirs, "t"), Seq(idCol), "full_outer")
    val oursCh = !(col("__h_o") <=> col("__h_b"))
    val theirsCh = !(col("__h_t") <=> col("__h_b"))
    j.select(col(idCol),
      when(!oursCh && !theirsCh, "unchanged")
        .when(oursCh && !theirsCh, "ours")
        .when(!oursCh && theirsCh, "theirs")
        .when(col("__h_o") <=> col("__h_t"), "both_same")
        .otherwise("conflict").as("status"),
      when(!oursCh && !theirsCh, "base")
        .when(oursCh && !theirsCh, "ours")
        .when(!oursCh && theirsCh, "theirs")
        .when(col("__h_o") <=> col("__h_t"), "ours")
        .otherwise(lit(null).cast("string")).as("pick"))
  }

  /** Corpus vocabulary: global word counts with a bounded top-k. The
    * count is the canonical two-phase aggregate (map-side partials →
    * one shuffle on the word); the top-k is `orderBy(...).limit(k)`,
    * which Spark plans as TakeOrderedAndProject — each partition keeps
    * only k candidates, nothing resembling a global sort runs. Ties
    * break lexicographically so the cut is deterministic.
    */
  def vocabularyTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(k)

  /** Distinctive terms per group — the "what is this source/language
    * slice about" report: tf-idf with the same integer inverse-df
    * weights as [[lexicalTopK]] (`LexicalWeightScale DIV df`, df = the
    * number of GROUPS containing the term — truncating division both
    * engines share), top-k per group by (score desc, term).
    *
    * Scale shape: one token explode into a (group, term) count — the
    * only corpus-width work; df is a second aggregate over that count
    * table. The per-group top-k is a BOUNDED HEAP aggregate (k entries
    * per partition cross the shuffle), keyed by a 56-bit (group, term)
    * hash id with a broadcast decode join-back — NOT a window: a
    * window partitioned by the group would sort that group's entire
    * distinct vocabulary in one task, and a web-scale source's vocab
    * (typos, URLs, code identifiers) is 10⁸–10⁹ terms. Same pattern as
    * [[capPerGroup]] / the per-language vocab query. Ties break by the
    * hash id (score desc, id asc) — deterministic and engine-shared.
    *
    * The 56-bit id sits at the birthday bound for a 10⁸–10⁹-term group
    * (~2.7e8), so a same-group collision is possible at the top end; a
    * colliding id would decode to TWO terms and silently emit duplicate
    * rank rows. Fail-loud guard: the decode join-back counts rows per
    * (group, id) — the winner set is ≤ #groups × k rows, so the count
    * is a bounded aggregate — and raises if any id decoded to more than
    * one term.
    *
    * @return (groupCol, rank 1..k, term, score)
    */
  def distinctiveTerms(docs: DataFrame, groupCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = docs.select(col(groupCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col(groupCol), col("term")).agg(count(lit(1)).as("__tf"))
    val df0 = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("__df")) // groups containing the term
    // checkpoint once: both the heap and the decode join-back read it
    val scored = tf.join(df0, Seq("term"))
      .withColumn("score",
        col("__tf") * expr(s"${LexicalWeightScale} DIV __df"))
      .withColumn("__id",
        graft.functions.Md5PrefixLong.md5_prefix_long(
          concat_ws("|", col(groupCol), col("term")), 14))
      .localCheckpoint(true)
    // scores are exact integers < 2^53, so the double heap is exact
    val top = scored.groupBy(col(groupCol))
      .agg(graft.functions.TopKByScore.top_k_by_score(
        col("score").cast("double"), col("__id"), k).as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__r0", "__t")))
      .select(col(groupCol), (col("__r0") + 1).cast("int").as("rank"),
        col("__t").getField("id").as("__id"))
    // winners are ≤ #groups × k rows — broadcast them back for decode.
    // The collision guard (see scaladoc) RIDES the decode aggregate: a
    // (group, id) decoding to >1 term means a 56-bit hash collision
    // inside one group, so the per-key row count is folded in the same
    // bounded groupBy that finalizes the decode — one aggregate, no
    // second shuffle+broadcast. On the non-collision path the group has
    // exactly one row, so min(term)/max(score) are that row's values.
    scored.join(broadcast(top), Seq(groupCol, "__id"))
      .groupBy(col(groupCol), col("__id"))
      .agg(first(col("rank")).as("rank"), min(col("term")).as("term"),
        max(col("score")).as("__score"), count(lit(1)).as("__n"))
      .select(col(groupCol), col("rank"), col("term"),
        when(col("__n") > 1, raise_error(concat(
          lit("distinctiveTerms: 56-bit id collision in group '"),
          col(groupCol).cast("string"), lit("' — two terms share id "),
          col("__id").cast("string")))).otherwise(col("__score")).as("score"))
  }

  /** Encode every document as a sequence of vocabulary ids — the
    * "tokenize for training" step over a bounded id space. The id table
    * is [[vocabularyTopK]]'s result ranked 1..k (count desc, word — the
    * deterministic tie-break both engines share); out-of-vocabulary
    * tokens encode as 0 and are counted per doc, the coverage signal
    * that drives vocabulary sizing.
    *
    * Scale shape: the vocab is k rows by construction → broadcast into
    * the one token explode; re-assembly is one groupBy(doc) carrying
    * (pos, id) ints. Nothing else shuffles.
    *
    * @return (idCol, n_tokens, n_oov, ids: array<long> in token order)
    */
  def encodeWithVocab(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vocab = vocabularyTopK(df, textCol, k)
      .withColumn("__vid",
        row_number().over(Window.orderBy(col("n").desc, col("word")))
          .cast("long"))
      .select(col("word"), col("__vid"))
    val tokpos = df.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__pos", "word")))
    val enc = tokpos.join(broadcast(vocab), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__vid").isNull, 1)).as("n_oov"),
        transform(
          array_sort(collect_list(struct(col("__pos"),
            coalesce(col("__vid"), lit(0L)).as("__v")))),
          e => e.getField("__v")).as("ids"))
    df.select(col(idCol)).join(enc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("ids"), array().cast("array<bigint>")).as("ids"))
  }

  /** Keep documents whose length rank sits inside (loPct, hiPct] of their
    * stratum — the distribution-clipping filter (drop the shortest 5% and
    * longest 5% per language) spelled in EXACT integer arithmetic:
    * rank·100 vs n·pct avoids every float-threshold edge case, so the
    * kept set is bit-reproducible. Ranks and stratum counts come from
    * [[TwoPass.rank]] — strata are fixed-cardinality (languages), so a
    * whole-stratum window would sort corpus-scale groups in single
    * tasks. [[clipByLengthApprox]] remains the cheaper histogram-cut
    * variant; this is the exact one.
    */
  def clipByLengthRank(df: DataFrame, stratumCol: String, lenCol: String,
      idCol: String, loPct: Int, hiPct: Int): DataFrame = {
    require(0 <= loPct && loPct < hiPct && hiPct <= 100,
      s"need 0 <= lo < hi <= 100, got $loPct/$hiPct")
    TwoPass.rank(df, Seq(stratumCol), Seq(col(lenCol), col(idCol)),
      "__rn", countOut = Some("__n"))
      .filter(col("__rn") * 100 > col("__n") * loPct &&
        col("__rn") * 100 <= col("__n") * hiPct)
      .drop("__rn", "__n")
  }

  /** Cap rows per group — the crawl-curation "at most k documents per
    * domain" step — keeping the k highest-`score` rows (ties → smaller
    * id). The window spelling (`row_number over partitionBy(domain)`)
    * shuffles and sorts EVERY row of a hot domain through one task; here
    * the k-capped heap aggregate ([[graft.functions.TopKByScore]]) bounds
    * each map-side partial buffer to k entries, so a domain with a
    * billion pages puts the same k ids on the shuffle as one with k+1.
    * Winners rejoin their full rows via an id semi-join (one ordinary
    * hash join — no wide payload ever rides the heap).
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      score: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val winners = df
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKByScore.top_k_by_score(
        score.cast("double"), col(idCol).cast("long"), k).as("__top"))
      .select(explode(col("__top")).as("__e"))
      .select(col("__e").getField("id").as("__keep_id"))
    df.join(winners, col(idCol).cast("long") === col("__keep_id"), "left_semi")
  }

  /** Linear quality classifier over hashed token features — the
    * "score every document with a trained model" filter, map-only. Each
    * token hashes into one of `weights.size` buckets (md5-derived, so
    * any engine reproduces it), and the score is
    * `bias + mean(bucket weights)` — mean, not sum, so the score is
    * length-invariant. The weights travel as a plan literal (broadcast
    * with the closure): training happens elsewhere, swapping in real
    * learned weights changes no plan shape. A doc with no tokens scores
    * exactly `bias`.
    *
    * The token array is materialized in its own projection before the
    * fold (HOFs are interpreted; inlining `tokens(text)` into the
    * transform would re-split the text per element).
    */
  def scoreLinearHashed(df: DataFrame, idCol: String, textCol: String,
      weights: Seq[Double], bias: Double = 0.0): DataFrame = {
    require(weights.nonEmpty, "need at least one weight bucket")
    val dim = weights.size
    val w = array(weights.map(lit): _*)
    val toks = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__ws"))
    toks.select(
      col(idCol),
      size(col("__ws")).as("n_tokens"),
      when(size(col("__ws")) > 0,
        lit(bias) + aggregate(
          transform(col("__ws"), t => element_at(w,
            (pmod(graft.functions.Md5PrefixLong.md5_prefix_long(t, 6),
              lit(dim.toLong)) + 1).cast("int"))),
          lit(0.0), (acc, x) => acc + x) / size(col("__ws")).cast("double"))
        .otherwise(lit(bias)).as("score"))
  }

  /** Dominant-stratum-safe variant of [[clipByLengthRank]]: per-stratum
    * `approx_percentile` thresholds (one map-side-partial aggregate, a
    * handful of rows) broadcast-joined back, then a map-only value
    * filter. Nothing ever sorts a whole stratum, so a stratum holding
    * half the corpus (English at 100 TB) costs the same as a tiny one.
    *
    * The trade vs the rank version: clipping is BY VALUE, not by exact
    * row count — with heavy length ties the kept fraction can deviate
    * from (hiPct-loPct)% no matter the accuracy, and the percentile
    * sketch itself is approximate (error ≤ 1/accuracy of the rank
    * space). Rows strictly above the loPct threshold and at or below
    * the hiPct threshold are kept; loPct=0 / hiPct=100 disable that
    * bound entirely so extreme rows are never lost to sketch error.
    */
  def clipByLengthApprox(df: DataFrame, stratumCol: String, lenCol: String,
      loPct: Int, hiPct: Int, accuracy: Int = 10000): DataFrame = {
    require(0 <= loPct && loPct < hiPct && hiPct <= 100,
      s"need 0 <= lo < hi <= 100, got $loPct/$hiPct")
    require(accuracy >= 100, s"accuracy must be >= 100, got $accuracy")
    val th = df.groupBy(col(stratumCol)).agg(
      percentile_approx(col(lenCol),
        array(lit(loPct / 100.0), lit(hiPct / 100.0)),
        lit(accuracy)).as("__th"))
      .select(col(stratumCol), col("__th").getItem(0).as("__lo"),
        col("__th").getItem(1).as("__hi"))
    val lo = if (loPct == 0) lit(true) else col(lenCol) > col("__lo")
    val hi = if (hiPct == 100) lit(true) else col(lenCol) <= col("__hi")
    df.join(broadcast(th), stratumCol)
      .filter(lo && hi)
      .drop("__lo", "__hi")
  }

  /** Sliding token-window chunking — the RAG/embedding "split documents
    * into overlapping context windows" step. Chunk i covers tokens
    * `[i*(size-overlap), i*(size-overlap)+size)`; the chunk count is
    * `max(1, ceil((n-overlap)/(size-overlap)))` so every token is covered,
    * the last chunk is allowed to be short, and a doc shorter than one
    * window still yields exactly one chunk. Zero-token docs yield zero
    * chunks (there is nothing to embed).
    *
    * Scale: pure map-side — tokenize, `sequence` the chunk ids, explode,
    * `slice` each window out of the one materialized token array. No
    * shuffle, no UDF; the output is ~n/(size-overlap) rows per doc and
    * each carries only its own window's text.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size >= 1, s"size must be >= 1, got $size")
    require(0 <= overlap && overlap < size,
      s"need 0 <= overlap < size, got overlap=$overlap size=$size")
    val step = size - overlap
    val n = col("__n")
    // ceil((n-overlap)/step) as (a + step - 1) DIV step with a clamped
    // positive — Spark's DIV truncates toward zero and DuckDB's // floors,
    // so keeping every operand non-negative is what makes the two agree
    val nChunks = when(n <= 0, lit(0L))
      .otherwise(expr(s"(greatest(__n - $overlap, 1) + ${step - 1}) DIV $step"))
    df.withColumn("__ws", TextFunctions.tokens(col(textCol)))
      .withColumn("__n",
        org.apache.spark.sql.functions.size(col("__ws")).cast("long"))
      .withColumn("chunk_id", explode(
        when(nChunks > 0, sequence(lit(0L), nChunks - 1))
          .otherwise(array().cast("array<bigint>"))))
      .withColumn("chunk",
        array_join(slice(col("__ws"), (col("chunk_id") * step + 1).cast("int"),
          lit(size)), " "))
      .withColumn("chunk_tokens",
        least(lit(size.toLong), n - col("chunk_id") * step))
      .drop("__ws", "__n")
  }

  /** Canonical text normalization: lowercase, fold accents (NFD, drop
    * combining marks — [[graft.functions.StripAccents]], a native codegen
    * expression with an ASCII zero-copy fast path), collapse whitespace
    * runs to one space, trim. The first map of virtually every text
    * pipeline (dedup keys, language ID, quality scoring all sharpen on
    * normalized text). Map-only: stays inside whole-stage codegen.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      graft.functions.StripAccents.strip_accents(lower(text)),
      "\\s+", " "))

  /** EXACT per-group percentiles without sorting any raw rows — the
    * scale path for "p50/p90/p99 document length per language" on a
    * bounded value domain. Counting construction: one aggregate to
    * (group, value, count), one window over the DISTINCT values of each
    * group (|domain| rows, not |corpus| rows) for cumulative counts, then
    * the p-th percentile is the smallest value whose cumulative count
    * reaches rank `ceil(n * p / 100)` — all integer arithmetic, so the
    * SQL oracle reproduces the selection bit-for-bit (no float-rank or
    * sketch ambiguity, unlike `percentile_approx`).
    *
    * 100 TB: the shuffled payload after the first aggregate is
    * |group| × |distinct values| rows — for lengths, scores, star
    * ratings &c. this is thousands of rows regardless of corpus size.
    * The bound is CHECKED, not assumed: a group whose distinct-value
    * count exceeds `maxDomain` fails the job loudly (an unbounded
    * `valueCol` would otherwise silently degenerate the per-group window
    * into a full sort). For unbounded/continuous domains use
    * [[clipByLengthApprox]]'s sketch instead; this operator is the exact
    * complement.
    */
  def percentilesByCounting(df: DataFrame, groupCol: String, valueCol: String,
      pcts: Seq[Int], maxDomain: Int = 65536): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $pcts")
    require(maxDomain >= 1, s"maxDomain must be >= 1, got $maxDomain")
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    // the contract check rides the same unbounded-frame window that
    // computes __n: zero when honored, a loud failure when not (folded
    // into __cum so column pruning cannot drop it)
    val domainGuard = when(count(lit(1)).over(wAll) > maxDomain,
      raise_error(concat(lit("percentilesByCounting: group "),
        col(groupCol).cast("string"),
        lit(s" has more than $maxDomain distinct values of $valueCol — " +
          "not a bounded domain; use the quantile sketch instead")))
        .cast("long")).otherwise(lit(0L))
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(w) + domainGuard)
      .withColumn("__n", sum(col("__c")).over(wAll))
    val picks = pcts.map { p =>
      // rank = ceil(n*p/100) = (n*p + 99) DIV 100 — all operands positive,
      // so truncating (Spark DIV) and flooring (DuckDB //) division agree
      min(when(col("__cum") >= expr(s"(__n * $p + 99) DIV 100"),
        col(valueCol))).as(s"p$p")
    }
    cum.groupBy(col(groupCol)).agg(picks.head, picks.tail: _*)
  }

  /** Fixed-point scale for [[lmScore]] probability contributions. 1e6
    * (not 1e9) leaves integer headroom: the per-bigram product
    * `(c12+1)·scale` stays inside int64 until a single bigram repeats
    * ~9.2e12 times — beyond any real corpus ("of the" at web scale is
    * ~1e10). */
  val LmProbScale = 1000000L

  /** CCNet-style language-model quality score: train bigram statistics
    * on a trusted reference slice (`refFilter`, e.g. the wiki/en subset),
    * then score every document by its MEAN add-one-smoothed bigram
    * probability `p(w2|w1) = (c12+1)/(c1+V)` in fixed-point integer
    * arithmetic. Fluent text scores high (its bigrams are common in the
    * reference), gibberish/boilerplate scores near the 1/(c1+V) floor —
    * the same ordering signal CCNet's log-perplexity filter uses, with
    * one deliberate substitution: the mean PROBABILITY replaces the mean
    * LOG-probability because `ln` is not correctly rounded and differs
    * across libm builds (see [[bm25ContribSql]] for the same reasoning),
    * while add/multiply/truncating-divide on integers are exact in any
    * engine.
    *
    * Scale shape: two corpus scans (one to train the counts — aggregates
    * only, map-side partials — and one to score), two equi-joins of the
    * bigram rows against the count tables (AQE handles the hot-bigram
    * skew), and one per-doc aggregate. The only driver value is the
    * vocabulary size V (a single long).
    *
    * @return one row per input document: (idCol, n_bigrams, lm_score);
    *         lm_score is null when the document has no bigrams
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      refFilter: Column): DataFrame = {
    val toks = docs.select(col(idCol).as("__doc"), refFilter.as("__ref"),
      TextFunctions.tokens(lower(col(textCol))).as("__ws"))
    // (w1, w2) bigram rows via equal-length slices zipped — empty for
    // docs with fewer than two tokens (greatest clamps the length at 0)
    val n1 = greatest(size(col("__ws")) - 1, lit(0))
    val bg = toks.select(col("__doc"), col("__ref"),
      explode(zip_with(
        slice(col("__ws"), lit(1), n1), slice(col("__ws"), lit(2), n1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__b"))
      .select(col("__doc"), col("__ref"),
        col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    // ONE training aggregate; the unigram context counts and the
    // vocabulary both derive from the (small) bigram-count table rather
    // than re-scanning the corpus: c1 = Σ_w2 c12 exactly, and V counts
    // the distinct tokens seen in reference bigrams (a token occurring
    // ONLY as a one-token document never enters any bigram and is
    // deliberately outside V — mirrored in the oracle). Total corpus
    // scans: two (train counts, score), the structural minimum.
    val big = bg.filter(col("__ref"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val uni = big.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = big.select(col("w1").as("tok"))
      .union(big.select(col("w2").as("tok"))).distinct().count()
    val scored = bg
      .join(big, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      // truncating DIV == DuckDB's flooring // here: every operand is
      // non-negative (c12 <= c1 by construction, all counts >= 0)
      .withColumn("__c", expr(
        s"((coalesce(c12, 0) + 1) * $LmProbScale) DIV (coalesce(c1, 0) + $vocab)"))
      .groupBy(col("__doc"))
      .agg(sum(col("__c")).as("__s"), count(lit(1)).as("__n"))
    docs.select(col(idCol))
      .join(scored.withColumnRenamed("__doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_bigrams"),
        expr("__s DIV __n").as("lm_score"))
  }

  /** Stop words for [[gopherRules]]' "natural language" check — the
    * published Gopher list (Rae et al. 2021, Appendix A). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document-quality rule filter (the published rule set
    * from Rae et al. 2021, Appendix A), with a per-rule flag column so a
    * pipeline can audit WHY a document was dropped, not just that it
    * was. Every ratio rule is rearranged into integer cross-
    * multiplication (mean word length in [3,10] ⇔ 3n ≤ Σlen ≤ 10n, ≤10%
    * symbol words ⇔ 10·sym ≤ n, ≥80% alpha words ⇔ 5·alpha ≥ 4n) so
    * there is not one float in the operator and any engine agrees
    * bit-for-bit. Map-only: one projection over the token array, no
    * shuffle, stays inside whole-stage codegen.
    *
    * The stop list is the "looks like natural language in the target
    * language" probe — swap it per corpus language/domain (the registry
    * query passes domain words because the synthetic corpus has no
    * English function words).
    *
    * @return one row per doc: (idCol, n_words, ok_words, ok_mean_len,
    *         ok_symbols, ok_alpha, ok_stops, keep)
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      stops: Seq[String] = GopherStops): DataFrame = {
    require(stops.nonEmpty, "stops must be non-empty")
    val ws = TextFunctions.tokens(col(textCol))
    docs
      .withColumn("__n", size(ws).cast("long"))
      .withColumn("__sl",
        aggregate(ws, lit(0L), (acc, w) => acc + length(w)))
      .withColumn("__sym", size(filter(ws,
        w => w.contains("#") || w.contains("..."))).cast("long"))
      .withColumn("__al",
        size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("__st", size(filter(
        array(stops.map(lit): _*),
        s0 => array_contains(transform(ws, w => lower(w)), s0))).cast("long"))
      // flags are APPENDED (input columns pass through) so the filter
      // composes — e.g. with readStream for a streaming quality gate
      .withColumn("n_words", col("__n"))
      .withColumn("ok_words",
        col("__n") >= minWords && col("__n") <= maxWords)
      .withColumn("ok_mean_len",
        col("__sl") >= col("__n") * 3 && col("__sl") <= col("__n") * 10)
      .withColumn("ok_symbols", col("__sym") * 10 <= col("__n"))
      .withColumn("ok_alpha", col("__al") * 5 >= col("__n") * 4)
      .withColumn("ok_stops", col("__st") >= 2)
      .withColumn("keep",
        col("ok_words") && col("ok_mean_len") && col("ok_symbols") &&
          col("ok_alpha") && col("ok_stops"))
      .drop("__n", "__sl", "__sym", "__al", "__st")
  }

  /** Gopher's REPETITION-removal rules (Rae et al. 2021, Table A1) —
    * the other half of the quality suite next to [[gopherRules]]:
    * machine-generated and boilerplate-heavy pages repeat themselves,
    * so documents are dropped when too much of their text is (a)
    * duplicate LINES, (b) the single dominant n-gram (n=2..4), or (c)
    * n-grams that occur more than once (n=5..10). All fractions are
    * integer cross-multiplications against the paper's thresholds —
    * zero floats on any engine; the audit columns report floored
    * per-mille values.
    *
    * Precise quantities (each over non-whitespace characters, the
    * token-length sum, so separator policy cannot skew ratios):
    *   - dup_line_pm / dup_line_char_pm: occurrences (and their chars)
    *     of lines appearing ≥2 times, over total lines (chars). Lines
    *     split on `lineSep`; run the operator again with the paragraph
    *     separator for the paragraph variants.
    *   - top{2,3,4}_pm: the maximum over n-grams OCCURRING ≥2 TIMES of
    *     count·chars — the char mass of the dominant repeated n-gram.
    *     (The paper says "fraction of characters contained in the most
    *     frequent n-gram"; taking the max of the product resolves
    *     count-ties deterministically and equals the paper's number
    *     whenever the most frequent n-gram is unique, and the ≥2 floor
    *     keeps a short document whose n-grams are all distinct from
    *     being charged for "repetition" that never happened.)
    *   - dup{5..10}_pm: chars of token POSITIONS covered by at least
    *     one n-gram occurring ≥2 times — the overlap-aware union, so
    *     repeated overlapping windows never double-count a character.
    *
    * Scale shape: one windows explode covering ALL n in 2..10 (rows ≈
    * 9·tokens, fixed-width — grams travel as xxhash64 of the token
    * hashes, never as strings), riding the single doc-keyed window
    * exchange so every (doc, n, gram-hash) count and per-doc pivot
    * downstream is EXCHANGE-FREE; the rare convicted (≥2-count) keys
    * join back to the narrow window rows to recover start positions,
    * then a distinct over (doc, n, position) — every shuffle is keyed
    * by doc-local keys, nothing driver-side, no per-doc quadratic
    * loop (a 100k-token doc costs 900k window rows, not 10^10
    * comparisons).
    *
    * `capScaleMilli` scales every threshold (1000 = the paper's
    * web-crawl operating point): real pipelines expose these caps as
    * corpus-dependent knobs, and a corpus that already passed line
    * dedup sits well below the paper's caps — the in-chain release
    * stage runs tightened so the gate has a binding operating point.
    *
    * @return one row per doc: idCol, the per-mille audit columns, and
    *         `keep` (true = passes every repetition gate)
    */
  def repetitionRules(docs: DataFrame, idCol: String, textCol: String,
      lineSep: String = "\n", capScaleMilli: Int = 1000): DataFrame = {
    require(capScaleMilli > 0, s"capScaleMilli must be > 0, got $capScaleMilli")
    val topNs = Seq(2, 3, 4)
    val topCaps = Map(2 -> 20, 3 -> 18, 4 -> 16) // pct of chars
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val dupCaps = Map(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)
    // whitespace-regex split (not TextFunctions.tokens' single-space
    // split): the n-gram stream must cross the very line breaks the
    // line rules split on
    val ws = filter(split(col(textCol), "\\s+"), t => t =!= "")
    val base = docs.select(col(idCol), ws.as("__ws"),
      filter(transform(split(col(textCol),
          java.util.regex.Pattern.quote(lineSep)),
        l => trim(l)), l => l =!= "").as("__ls"))
      .withColumn("__totch",
        aggregate(col("__ws"), lit(0L), (acc, w) => acc + length(w)))
    // line rules: one count per (doc, line), folded per doc
    val lineAgg = base.select(col(idCol), explode(col("__ls")).as("__l"))
      .groupBy(col(idCol), col("__l")).agg(count(lit(1)).as("__c"))
      // lines are charged by their NON-whitespace chars so the ratio
      // against __totch (a token-length sum) can never exceed 1
      .withColumn("__llen",
        length(regexp_replace(col("__l"), "\\s+", "")).cast("long"))
      .groupBy(col(idCol)).agg(
        sum(col("__c")).as("__nl"),
        sum(when(col("__c") >= 2, col("__c")).otherwise(0L)).as("__dl"),
        sum(when(col("__c") >= 2, col("__c") * col("__llen"))
          .otherwise(0L)).as("__dch"))
    // ONE windows table for every n: (doc, n, start, gram-HASH, chars).
    // Built codegen-only: tokens posexplode once, each TOKEN is hashed
    // (xxhash64) and measured (length) BEFORE the per-doc window, so
    // the doc-keyed shuffle + the 9 lead() frames carry two longs per
    // position instead of token strings, and each gram hash is
    // xxhash64 over n LONG columns instead of re-concatenating (and
    // re-hashing) up to 10 strings per position — r13: this halves the
    // windows stage's task time and its shuffle bytes. No higher-order
    // functions anywhere (transform/slice/aggregate are INTERPRETED
    // per element; measured 3.3 s of the sf0.1 wall before the lead()
    // spelling, sub-second after). Gram identity = the hash tuple of
    // its tokens — the same equality (mod 64-bit collisions) as
    // hashing the space-joined string, with the same in-doc collision
    // odds (~500²/2⁶⁵ per doc — negligible, and the oracle would catch
    // it). The char mass (= token-length sum, consumed only by the
    // top-2/3/4 rules) is the sum of the lead lengths. A lead() past
    // the document's end is null, marking the window invalid.
    val allNs = topNs ++ dupNs
    val maxN = allNs.max
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    val leadH = (1 until maxN).map(k =>
      lead(col("__th"), k).over(wDoc).as(s"__h$k"))
    val leadL = (1 until topNs.max).map(k =>
      lead(col("__tl"), k).over(wDoc).as(s"__l$k"))
    val ctx = base.select(col(idCol), posexplode(col("__ws")))
      .select(col(idCol), col("pos").as("__p"),
        xxhash64(col("col")).as("__th"),
        length(col("col")).cast("long").as("__tl"))
      .select(col(idCol) +: col("__p") +: col("__th") +: col("__tl") +:
        (leadH ++ leadL): _*)
    val gramStructs = allNs.map { n =>
      val hs = col("__th") +: (1 until n).map(k => col(s"__h$k"))
      struct(lit(n).as("n"),
        when(col(s"__h${n - 1}").isNotNull, xxhash64(hs: _*)).as("h"),
        (if (n <= topNs.max)
          (col("__tl") +: (1 until n).map(k => col(s"__l$k"))).reduce(_ + _)
         else lit(0L)).as("clen"))
    }
    // Deliberately NOT materialized or re-exchanged: windows rides the
    // ctx window exchange, so it is HashPartitioning(doc) and every
    // downstream groupBy/join whose keys start with the doc id (the
    // gram counts, the conviction join, the per-doc pivots) is
    // EXCHANGE-FREE on top of it. Its three consumers therefore
    // re-run the (cheap, long-only) window + explode + hash subtree —
    // measured at sf0.1 as the right trade against both alternatives:
    // a localCheckpoint erases the partitioning and forced a
    // full-width shuffle of the mostly-count-1 gram universe (14x the
    // shuffle bytes, 1.6x the task time), and an explicit repartition
    // is either optimized out (same-key) or split into three
    // DIFFERENT exchanges by filter pushdown (57 MB shuffled, 2.2x
    // the task time). Zero windows-sized shuffles is what holds at
    // 100 TB.
    val windows = ctx
      .select(col(idCol), col("__p").as("__i"),
        explode(array(gramStructs: _*)).as("__w"))
      .filter(col("__w.h").isNotNull)
      .select(col(idCol), col("__w.n").as("__n"), col("__i"),
        col("__w.h").as("__h"), col("__w.clen").as("__clen"))
    // dominant REPEATED n-gram char mass for n=2..4: ONE codegen'd
    // hash aggregate straight to per-doc maxima (count-1 grams charge
    // nothing — see scaladoc); no position tracking needed here
    val topAgg = windows
      .filter(col("__n") <= topNs.max)
      .groupBy(col(idCol), col("__n"), col("__h"))
      .agg(count(lit(1)).as("__c"), first(col("__clen")).as("__clen"))
      .filter(col("__c") >= 2)
      .groupBy(col(idCol)).pivot("__n", topNs)
      .agg(max(col("__c") * col("__clen")))
      .select(col(idCol) +: topNs.map(n => col(n.toString).as(s"__top$n")): _*)
    // positions covered by any ≥2-count n-gram (n=5..10), unioned
    // before charging: count-only hash aggregate (codegen, no object
    // buffers), then the RARE convicted keys join back to the narrow
    // window rows to recover start positions
    val dupWindows = windows.filter(col("__n") > topNs.max)
    val convicted = dupWindows
      .groupBy(col(idCol), col("__n"), col("__h"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2)
      .select(col(idCol), col("__n"), col("__h"))
    val tokLens = base.select(col(idCol), posexplode(col("__ws")))
      .select(col(idCol), col("pos").as("__p"),
        length(col("col")).cast("long").as("__len"))
    val dupAgg = dupWindows
      .join(convicted, Seq(idCol, "__n", "__h"))
      .select(col(idCol), col("__n"),
        explode(sequence(col("__i"), col("__i") + col("__n") - 1)).as("__p"))
      .distinct()
      .join(tokLens, Seq(idCol, "__p"))
      .groupBy(col(idCol)).pivot("__n", dupNs).agg(sum(col("__len")))
      .select(col(idCol) +: dupNs.map(n => col(n.toString).as(s"__dup$n")): _*)
    val flat = base.select(col(idCol), col("__totch"))
      .join(lineAgg, Seq(idCol), "left")
      .join(topAgg, Seq(idCol), "left")
      .join(dupAgg, Seq(idCol), "left")
    val den = greatest(col("__totch"), lit(1L))
    val nl = greatest(coalesce(col("__nl"), lit(0L)), lit(1L))
    def z(c: String) = coalesce(col(c), lit(0L))
    // frac <= cap% * scale/1000, cross-multiplied (all operands >= 0)
    val k = capScaleMilli.toLong
    val okLine = z("__dl") * 100000L <= nl * 30 * k &&
      z("__dch") * 100000L <= den * 20 * k
    val okTop = topNs.map(n => z(s"__top$n") * 100000L <= den * topCaps(n) * k)
      .reduce(_ && _)
    val okDup = dupNs.map(n => z(s"__dup$n") * 100000L <= den * dupCaps(n) * k)
      .reduce(_ && _)
    val outCols: Seq[Column] =
      Seq(col(idCol),
        expr("coalesce(__dl, 0) * 1000 DIV greatest(coalesce(__nl, 0), 1)")
          .as("dup_line_pm"),
        expr("coalesce(__dch, 0) * 1000 DIV greatest(__totch, 1)")
          .as("dup_line_char_pm")) ++
        topNs.map(n =>
          expr(s"coalesce(__top$n, 0) * 1000 DIV greatest(__totch, 1)")
            .as(s"top${n}_pm")) ++
        dupNs.map(n =>
          expr(s"coalesce(__dup$n, 0) * 1000 DIV greatest(__totch, 1)")
            .as(s"dup${n}_pm")) ++
        Seq((okLine && okTop && okDup).as("keep"))
    flat.select(outCols: _*)
  }

  /** CCNet-style head/middle/tail quality bucketing (Wenzek et al. 2019,
    * arXiv:1911.00359 §4.4): score every document with [[lmScore]]
    * (bigram stats trained on the trusted `refFilter` slice), then split
    * EACH LANGUAGE at its own score percentiles — CCNet's insight is
    * that perplexity is only comparable within a language, so the
    * head/middle/tail cut points are per-language, never global. Here
    * higher lm_score = more fluent (it is a probability, not a
    * perplexity), so `head` is the slice at or above the `headPct`
    * percentile and `tail` is below `midPct`. Documents with no bigrams
    * (lm_score null) go to `tail` — CCNet likewise discards what its LM
    * cannot score.
    *
    * Scale shape: [[lmScore]]'s two corpus scans, plus one
    * [[percentilesByCounting]] aggregate whose input is the per-language
    * DISTINCT-score count table (bounded: lm_score is fixed-point in
    * [0, [[LmProbScale]]], so the value domain — and thus the per-lang
    * window — is capped at ~1e6 rows regardless of corpus size), and one
    * broadcast join of the #languages-row cut table back onto the scored
    * docs. Nothing reaches the driver.
    *
    * @return one row per doc: (idCol, langCol, lm_score, bucket)
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, refFilter: Column,
      midPct: Int = 33, headPct: Int = 67): DataFrame = {
    require(0 < midPct && midPct < headPct && headPct < 100,
      s"need 0 < midPct < headPct < 100, got ($midPct, $headPct)")
    val scored = lmScore(docs, idCol, textCol, refFilter)
      .join(docs.select(col(idCol), col(langCol)), Seq(idCol))
    val cuts = percentilesByCounting(
      scored.filter(col("lm_score").isNotNull), langCol, "lm_score",
      Seq(midPct, headPct))
    scored.join(broadcast(cuts), Seq(langCol), "left")
      .select(col(idCol), col(langCol), col("lm_score"),
        when(col("lm_score").isNull, lit("tail"))
          .when(col("lm_score") >= col(s"p$headPct"), lit("head"))
          .when(col("lm_score") >= col(s"p$midPct"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Fixed-point scale for [[dsirSelect]] frequency contributions. 1e5
    * (not [[LmProbScale]]'s 1e6) buys int64 headroom on the per-bucket
    * product `c·scale`: a bucket count can approach the corpus token
    * count itself ("the" at web scale), and 9.2e18/1e5 ≈ 9e13 tokens
    * (~360 TB of text) fits where 1e6 would overflow past ~37 TB. */
  val DsirScale = 100000L

  /** DSIR-style hashed-unigram importance selection (Xie et al. 2023,
    * arXiv:2302.03169): estimate a target distribution p̂_t and a raw
    * distribution p̂_r over HASHED unigram buckets (feature hashing caps
    * the model at `buckets` cells no matter how large the vocabulary),
    * weight every token by its bucket's scaled relative-frequency
    * difference, and keep the k documents whose mean token weight is
    * highest — the documents that look most like the target slice. Two
    * deliberate substitutions from the paper, both for engine-exact
    * arithmetic (see [[lmScore]]): the UNSMOOTHED frequency DIFFERENCE
    * replaces the smoothed log-ratio (same "more target-like than raw"
    * ordering signal; `ln` is not correctly rounded across libm builds,
    * and smoothing exists only to keep the log finite — add-one with
    * `buckets` ≫ n_tokens would actually drown the signal), and
    * sampling is replaced by deterministic top-k with an id tie-break.
    * Scores are shifted by +[[DsirScale]] (the difference's lower bound
    * is −scale) so every operand stays non-negative and truncating DIV
    * agrees with flooring `//` on any engine.
    *
    * Scale shape: ONE aggregate over the exploded tokens builds the
    * per-bucket count table (map-side partials; ≤ `buckets` rows), the
    * corpus totals fold from that table (never a driver scalar — a
    * 1-row aggregate cross-joined back is a broadcast), and scoring is a
    * second token scan joined against the broadcast ≤`buckets`-row
    * weight table. Top-k is TakeOrdered (per-partition k-heaps), never a
    * global sort. Tokens are exploded twice rather than materialized
    * once: the exploded form is ~n_tokens rows and re-deriving it is a
    * map-only re-scan, cheaper at scale than persisting it.
    *
    * @return k rows: (idCol, n_tokens, dsir_score), most target-like
    *         first (ties broken by ascending id)
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      targetFilter: Column, buckets: Int = 4096, k: Int = 100): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(k > 0, s"k must be positive, got $k")
    def toks = docs.select(col(idCol).as("__doc"), targetFilter.as("__tgt"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("__w"))
      // md5-derived bucket (8 hex chars < 2^32: no sign issues), the
      // same engine-portable hash family as Dedup.minhashH1
      .withColumn("__b",
        graft.functions.Md5PrefixLong.md5_prefix_long(col("__w"), 8) % buckets)
    val bucketCounts = toks.groupBy(col("__b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
    // the two corpus token totals fold in an unpartitioned window over
    // the ≤`buckets`-row count table — a bounded single-task pass by
    // construction, no join, never a driver scalar (a constant-key
    // broadcast join would constant-fold into a nested loop). +1
    // denominators only guard an empty target slice; within a side the
    // denominator is shared, so the ordering is the exact
    // relative-frequency ordering.
    val wAll = Window.partitionBy()
    val weights = bucketCounts
      .withColumn("nr", sum(col("cr")).over(wAll))
      .withColumn("nt", sum(col("ct")).over(wAll))
      .select(col("__b"), (
        expr(s"(ct * $DsirScale) DIV (nt + 1)")
          - expr(s"(cr * $DsirScale) DIV (nr + 1)")
          + lit(DsirScale)).as("__wt"))
    toks.join(broadcast(weights), Seq("__b"))
      .groupBy(col("__doc"))
      .agg(sum(col("__wt")).as("__s"), count(lit(1)).as("__n"))
      .select(col("__doc").as(idCol), col("__n").as("n_tokens"),
        expr("__s DIV __n").as("dsir_score"))
      .orderBy(col("dsir_score").desc, col(idCol))
      .limit(k)
  }

  /** Distributed BPE training (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units"): `merges` rounds of
    * count-every-adjacent-unit-pair → merge the most frequent pair
    * corpus-wide — the loop a tokenizer trainer actually runs, where
    * [[encodeWithVocab]] merely applies a finished vocabulary.
    *
    * Trains on the distinct-PRETOKEN HISTOGRAM, not the corpus:
    * adjacent pairs never cross pretoken boundaries, so the corpus-wide
    * count of a pair equals its count over distinct pretokens weighted
    * by pretoken frequency — identical integers, identical argmax,
    * identical tie-breaks. One corpus scan builds the (pretoken, count)
    * table; every training round then touches |vocab| rows instead of
    * n_tokens (the layout every production tokenizer trainer uses, and
    * the only one that survives 100 TB: the histogram shrinks ~1000×
    * and nothing unbounded ever reaches the driver). Pretokenization is
    * [[graft.functions.TextFunctions.pretokens]]: non-overlapping runs
    * of `window` whitespace tokens re-joined by a single space
    * (window = 1 ≡ plain words; window > 1 makes the space a learnable
    * symbol, the SentencePiece-style space-aware vocabulary).
    *
    * TRAINING VENUE is a documented hybrid (the [[pointInInterval]]
    * giant-span pattern): the histogram is vocab-bounded, so when the
    * distinct-pretoken count is ≤ `driverVocabMax` the whole histogram
    * collects to the driver and the IDENTICAL algorithm — same
    * candidate ranking, same acceptance rule, same leftmost-
    * non-overlapping `String.replace` the SQL oracle uses — runs as a
    * local loop: zero per-round Spark jobs, which is how every
    * production trainer (HF tokenizers, SentencePiece) trains once the
    * histogram fits memory. Above the threshold the distributed loop
    * below runs instead; the dispatch probe is one `limit(max + 1)`
    * collect, bounded by construction. Both venues are oracle-gated
    * against the same generated SQL and spec-asserted equal.
    *
    * Scale shape per distributed round is the
    * [[Similarity.kmeansCentroids]] iteration pattern: one narrow
    * explode of adjacent pairs over the histogram, a partial-aggregated
    * weighted count, and a bounded collect of the
    * top-[[BpeBatchCandidates]] candidate pairs. The histogram rewrite
    * is AFFECTED-SLICE: only rows whose unit string contains one of the
    * round's accepted pairs pass through the replace chain; the
    * untouched slice (at a real vocab, almost everything — a merge
    * deep in training touches a vanishing fraction of pretokens)
    * unions back unrewritten, so per-merge rewrite work is
    * O(pretokens containing the pair), not O(vocab).
    *
    * Merge selection is BATCHED (the standard frequency-batched BPE
    * variant every production trainer uses to cut synchronization
    * rounds): of the top-m candidates, a pair is accepted iff its units
    * are disjoint from EVERY higher-ranked candidate's units — a
    * non-iterative rule both engines express identically. Why the
    * accepted batch equals `|accepted|` sequential synchronization
    * rounds: disjoint-unit pairs cannot overlap in the marker encoding
    * (an overlap would have to align on a shared unit occurrence) and a
    * merge neither creates nor destroys an adjacency between two OTHER
    * still-unmerged units, so every accepted merge's SNAPSHOT COUNT is
    * still its exact corpus count at its turn. Both engines then apply
    * the accepted replaces in the SAME RANK ORDER — the equality is of
    * sequential rank-order chains, not of arbitrary orderings: when one
    * merge's concatenation u1u2 equals a unit used by a LATER-ranked
    * accepted pair, newly created u1u2 occurrences are merged by that
    * later replace in both engines identically, which is exactly the
    * sequential semantics. Driver round-trips shrink from `merges` to
    * `merges / |accepted per round|` (the rank-1 candidate is always
    * accepted, so progress is guaranteed). Rounds are additionally
    * capped by `maxRounds` — PART OF THE RESULT CONTRACT, shared with
    * the generated oracle: both engines run at most `maxRounds`
    * synchronization rounds, so a budget unreachable within the cap
    * truncates identically on both sides.
    *
    * Unit-boundary encoding makes the merge a plain `replace`: every
    * unit is wrapped in '·' markers ('abc' → '·a··b··c·'), so merging
    * (u1,u2) is the literal replace '·u1··u2·' → '·u1u2·'. Adjacent
    * occurrences never share characters, and leftmost-non-overlapping
    * replace scans identically in Spark and the SQL oracle, so training
    * is bit-reproducible in both engines. Pair counts are adjacent
    * INDEX pairs ('aaa' holds two (a,a) pairs); argmax ties break
    * lexicographically on (u1, u2).
    *
    * PRECONDITION: document text must not contain the marker character
    * '·' — a '·' inside a token is indistinguishable from a unit
    * boundary and would miscount/mismerge. Strip or remap them upstream
    * ([[normalizeText]] territory) before training.
    *
    * Lineage is linearized every [[BpeCheckpointEvery]] merges: each
    * round stacks one more `replace` on `cur`, so without a barrier
    * round r re-executes all r−1 prior replaces from the cached base —
    * O(merges²) histogram passes and an O(merges)-deep plan, fatal at a
    * tokenizer-real 30k merges. The eager `localCheckpoint` (the
    * [[graft.ops.Dedup]] iteration pattern) caps re-execution and plan
    * depth at the checkpoint interval while keeping every round's
    * rewrite map-only.
    */
  val BpeCheckpointEvery = 8

  /** Candidate window per batched-BPE round: the top-m pairs by
    * (count desc, u1, u2) collected per round (m rows to the driver —
    * bounded). Shared with the generated SQL oracle. */
  val BpeBatchCandidates = 16

  /** Driver-local training threshold: when the distinct-pretoken count
    * is ≤ this, [[bpeCore]] trains on a driver-collected copy of the
    * histogram (see the venue paragraph above). Bounds the only
    * unbatched collect in the trainer; a web-scale vocab (10⁸⁺ rows)
    * exceeds it and trains distributed. */
  val BpeDriverVocabMax = 1 << 17

  /** (learned merges, final histogram (__w original pretoken, __cnt
    * corpus frequency, __s '·'-wrapped unit string after all merges)).
    * `maxRounds` caps synchronization rounds (result-contract, see
    * scaladoc above); `driverVocabMax` selects the training venue. */
  private[ops] def bpeCore(docs: DataFrame, idCol: String, textCol: String,
      merges: Int, window: Int = 1, maxRounds: Int = Int.MaxValue,
      driverVocabMax: Int = BpeDriverVocabMax,
      batchCandidates: Int = BpeBatchCandidates)
      : (Seq[(String, String, Long)], DataFrame) = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    require(driverVocabMax >= 0,
      s"driverVocabMax must be >= 0, got $driverVocabMax")
    require(batchCandidates >= 1,
      s"batchCandidates must be >= 1, got $batchCandidates")
    val spark = docs.sparkSession
    val hist = pretokenHistogram(docs, textCol, window)
    // venue dispatch: limit(max + 1) either returns the WHOLE histogram
    // (≤ max rows → train driver-local) or proves it is bigger (probe
    // discarded, distributed loop below). Bounded by construction.
    val probe = hist.limit(driverVocabMax + 1).collect()
    if (probe.length <= driverVocabMax)
      bpeTrainLocal(spark, probe, merges, maxRounds, hist, batchCandidates)
    else
      bpeTrainDistributed(hist, merges, maxRounds, batchCandidates)
  }

  /** The distinct-pretoken training/replay histogram:
    * (__w pretoken, __cnt corpus frequency, __s marker encoding). */
  private def pretokenHistogram(docs: DataFrame, textCol: String,
      window: Int): DataFrame =
    docs
      .select(explode(
        TextFunctions.pretokens(col(textCol), window)).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__s", regexp_replace(col("__w"), "(.)", "·$1·"))
      .localCheckpoint(true)

  /** Driver-local venue: the identical batched algorithm over the
    * collected histogram — Java `String.replace` is the same
    * leftmost-non-overlapping scan as Spark/DuckDB `replace`, and
    * String ordering is code-unit order ≡ the engines' binary string
    * order for the BMP text the marker precondition already assumes. */
  private def bpeTrainLocal(spark: SparkSession,
      probe: Array[org.apache.spark.sql.Row], merges: Int, maxRounds: Int,
      emptyHist: DataFrame, batchCandidates: Int = BpeBatchCandidates)
      : (Seq[(String, String, Long)], DataFrame) = {
    var rows = probe.map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val found = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var rounds = 0
    var exhausted = false
    while (found.size < merges && rounds < maxRounds && !exhausted) {
      rounds += 1
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      rows.foreach { case (_, cnt, s) =>
        val us = s.substring(1, s.length - 1).split("··", -1)
        var i = 0
        while (i < us.length - 1) {
          val k = (us(i), us(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val cands = pc.iterator
          .map { case ((u1, u2), c) => (u1, u2, c) }.toArray
          .sortWith { case ((a1, a2, ac), (b1, b2, bc)) =>
            if (ac != bc) ac > bc
            else if (a1 != b1) a1 < b1
            else a2 < b2
          }
          .take(batchCandidates)
        // same acceptance rule as the distributed venue and the oracle
        val accepted = cands.zipWithIndex.filter { case ((u1, u2, _), i) =>
          cands.take(i).forall { case (v1, v2, _) =>
            v1 != u1 && v1 != u2 && v2 != u1 && v2 != u2 }
        }.map(_._1).take(merges - found.size)
        accepted.foreach { case (u1, u2, c) =>
          found += ((u1, u2, c))
          val pat = s"·${u1}··${u2}·"
          val rep = s"·${u1}${u2}·"
          rows = rows.map { case t @ (w, cnt, s) =>
            if (s.contains(pat)) (w, cnt, s.replace(pat, rep)) else t }
        }
      }
    }
    import spark.implicits._
    val histDf =
      if (rows.isEmpty) emptyHist // keep the empty DF's schema
      else spark.createDataset(rows.toIndexedSeq).toDF("__w", "__cnt", "__s")
    (found.toSeq, histDf)
  }

  /** Distributed venue: per-round pair count + bounded candidate
    * collect + AFFECTED-SLICE rewrite (see scaladoc above). */
  private def bpeTrainDistributed(hist: DataFrame, merges: Int,
      maxRounds: Int, batchCandidates: Int = BpeBatchCandidates)
      : (Seq[(String, String, Long)], DataFrame) = {
    var cur = hist
    var sinceBarrier = 0
    val found = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var rounds = 0
    var exhausted = false
    while (found.size < merges && rounds < maxRounds && !exhausted) {
      rounds += 1
      val cands = cur
        .select(split(trim(col("__s"), "·"), "··").as("__us"), col("__cnt"))
        .select(col("__us"), col("__cnt"),
          explode(when(size(col("__us")) > 1,
            sequence(lit(1), size(col("__us")) - 1))
          .otherwise(array().cast("array<int>"))).as("__i"))
        .select(element_at(col("__us"), col("__i")).as("u1"),
          element_at(col("__us"), col("__i") + 1).as("u2"), col("__cnt"))
        .groupBy(col("u1"), col("u2")).agg(sum(col("__cnt")).as("cnt"))
        .orderBy(col("cnt").desc, col("u1"), col("u2"))
        .limit(batchCandidates)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (cands.isEmpty) exhausted = true
      else {
        // accept a candidate iff unit-disjoint from EVERY higher-ranked
        // candidate (accepted or not) — see the batching proof above
        val accepted = cands.zipWithIndex.filter { case ((u1, u2, _), i) =>
          cands.take(i).forall { case (v1, v2, _) =>
            v1 != u1 && v1 != u2 && v2 != u1 && v2 != u2 }
        }.map(_._1).take(merges - found.size)
        accepted.foreach { case (u1, u2, c) => found += ((u1, u2, c)) }
        // affected-slice rewrite: only pretokens containing one of the
        // round's accepted pairs pass through the (rank-ordered)
        // replace chain; everything else unions back untouched
        val hitPred = accepted.map { case (u1, u2, _) =>
          col("__s").contains(s"·${u1}··${u2}·") }.reduce(_ || _)
        val touched = accepted.foldLeft(cur.filter(hitPred)) {
          case (df, (u1, u2, _)) => df.withColumn("__s",
            replace(col("__s"), lit(s"·${u1}··${u2}·"),
              lit(s"·${u1}${u2}·")))
        }
        cur = cur.filter(!hitPred).unionByName(touched)
        sinceBarrier += accepted.length
        if (sinceBarrier >= BpeCheckpointEvery) {
          cur = cur.localCheckpoint(true)
          sinceBarrier = 0
        }
      }
    }
    (found.toSeq, cur)
  }

  /** The learned merge table: (rank, u1, u2, cnt) for `merges` rounds. */
  def bpeMerges(docs: DataFrame, idCol: String, textCol: String,
      merges: Int, window: Int = 1, maxRounds: Int = Int.MaxValue,
      driverVocabMax: Int = BpeDriverVocabMax,
      batchCandidates: Int = BpeBatchCandidates): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeCore(docs, idCol, textCol, merges, window, maxRounds,
      driverVocabMax, batchCandidates)._1.zipWithIndex
      .map { case ((u1, u2, c), i) => (i + 1, u1, u2, c) }
      .toDF("rank", "u1", "u2", "cnt")
  }

  /** Per-doc unit count after applying the `merges` learned merges —
    * the compression curve a tokenizer trainer watches. Tokenless docs
    * stay at 0 units. One corpus token scan equi-joined against the
    * per-word unit-count table from the trained histogram (map-side
    * broadcast when the vocab is small; a plain shuffle join otherwise
    * — never a per-round corpus rewrite). */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Int, window: Int = 1, maxRounds: Int = Int.MaxValue,
      driverVocabMax: Int = BpeDriverVocabMax): DataFrame =
    bpeEncodeFromHist(docs, idCol, textCol,
      bpeCore(docs, idCol, textCol, merges, window, maxRounds,
        driverVocabMax)._2, window)

  /** [[bpeEncode]] over an already-trained histogram (the `_2` of
    * [[bpeCore]]) — the train-once / derive-many form the BPE
    * deliverable family shares one staged training run through
    * (see [[Staged]]). */
  private[ops] def bpeEncodeFromHist(docs: DataFrame, idCol: String,
      textCol: String, hist: DataFrame, window: Int): DataFrame = {
    val wordUnits = hist
      .select(col("__w"),
        size(split(trim(col("__s"), "·"), "··")).cast("long").as("__u"))
    val perDoc = docs
      .select(col(idCol), explode(
        TextFunctions.pretokens(col(textCol), window)).as("__w"))
      .join(wordUnits, Seq("__w"))
      .groupBy(col(idCol)).agg(sum(col("__u")).as("__n"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__n"), lit(0L)).as("n_units"))
  }

  /** Replay an already-learned merge list over a histogram — the apply
    * half of the TRAIN-ONCE / APPLY-MANY split every deployed tokenizer
    * uses. Venue mirrors [[bpeCore]]: driver-local below the vocab
    * threshold; above it, a distributed replay applying the merges in
    * rank order in AFFECTED-SLICE batches of [[BpeCheckpointEvery]].
    * The per-batch contains-any filter is exact: a row can only need a
    * LATER replace of a batch if an earlier replace of the batch
    * changed it first (a mid-batch-created pattern starts from some
    * initial textual match), and any changed row textually contained
    * the pattern that changed it — so every row a batch can touch is in
    * the touched slice.
    *
    * @return the histogram (__w, __cnt, __s) after all merges
    */
  private[ops] def bpeApplyMerges(hist: DataFrame,
      merges: Seq[(String, String)], driverVocabMax: Int): DataFrame = {
    require(driverVocabMax >= 0,
      s"driverVocabMax must be >= 0, got $driverVocabMax")
    val spark = hist.sparkSession
    val probe = hist.limit(driverVocabMax + 1).collect()
    if (probe.length <= driverVocabMax) {
      var rows = probe.map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      merges.foreach { case (u1, u2) =>
        val pat = s"·${u1}··${u2}·"
        val rep = s"·${u1}${u2}·"
        rows = rows.map { case t @ (w, c, s0) =>
          if (s0.contains(pat)) (w, c, s0.replace(pat, rep)) else t }
      }
      import spark.implicits._
      if (rows.isEmpty) hist
      else spark.createDataset(rows.toIndexedSeq).toDF("__w", "__cnt", "__s")
    } else {
      var cur = hist
      merges.grouped(BpeCheckpointEvery).foreach { batch =>
        val hit = batch.map { case (u1, u2) =>
          col("__s").contains(s"·${u1}··${u2}·") }.reduce(_ || _)
        val touched = batch.foldLeft(cur.filter(hit)) {
          case (df, (u1, u2)) => df.withColumn("__s",
            replace(col("__s"), lit(s"·${u1}··${u2}·"),
              lit(s"·${u1}${u2}·")))
        }
        cur = cur.filter(!hit).unionByName(touched).localCheckpoint(true)
      }
      cur
    }
  }

  /** [[bpeEncode]]'s compression curve under STORED merges: training is
    * replaced by replaying a persisted merge artifact over the target
    * corpus — apply a yesterday-trained tokenizer to today's batch
    * without re-learning anything. `merges` must be the (rank, u1, u2)
    * table [[bpeMerges]] emits; rank order IS the application order.
    * The artifact collect is bounded by the training budget (a merge
    * table is vocabulary-sized at most — the codebook pattern). */
  def bpeEncodeWithMerges(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame, window: Int = 1,
      driverVocabMax: Int = BpeDriverVocabMax): DataFrame = {
    val ms = merges.select(col("rank"), col("u1"), col("u2")).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val hist = pretokenHistogram(docs, textCol, window)
    val wordUnits = bpeApplyMerges(hist, ms, driverVocabMax)
      .select(col("__w"),
        size(split(trim(col("__s"), "·"), "··")).cast("long").as("__u"))
    val perDoc = docs
      .select(col(idCol), explode(
        TextFunctions.pretokens(col(textCol), window)).as("__w"))
      .join(wordUnits, Seq("__w"))
      .groupBy(col(idCol)).agg(sum(col("__u")).as("__n"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__n"), lit(0L)).as("n_units"))
  }

  /** The learned subword vocabulary: corpus-wide frequency of every
    * unit after `merges` training rounds, top-`k` by (count desc,
    * unit). Folds over the trained histogram — |vocab| rows, never the
    * corpus. */
  def bpeVocab(docs: DataFrame, idCol: String, textCol: String,
      merges: Int, k: Int, window: Int = 1, maxRounds: Int = Int.MaxValue,
      driverVocabMax: Int = BpeDriverVocabMax): DataFrame =
    bpeVocabFromHist(bpeCore(docs, idCol, textCol, merges, window,
      maxRounds, driverVocabMax)._2, k)

  /** [[bpeVocab]] over an already-trained histogram. */
  private[ops] def bpeVocabFromHist(hist: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    hist
      .select(explode(split(trim(col("__s"), "·"), "··")).as("unit"),
        col("__cnt"))
      .groupBy(col("unit")).agg(sum(col("__cnt")).as("cnt"))
      .orderBy(col("cnt").desc, col("unit")).limit(k)
  }

  /** Tokenize-for-training, completed: every document as its BPE-unit
    * ID SEQUENCE under the trained merges — the tensor a data loader
    * actually consumes ([[bpeEncode]] reports only the compression
    * curve; [[encodeWithVocab]] encodes whole words). Unit ids are
    * 1..k by (corpus frequency desc, unit) over the trained histogram
    * — the [[bpeVocab]] ranking — with out-of-vocabulary units
    * encoding as 0 and counted per doc (the vocab-size sizing signal).
    *
    * Shape at scale: the word → unit-array table is VOCAB-scale and
    * therefore shuffle-joined (never broadcast — a web corpus's vocab
    * is 10⁸ rows) onto the one corpus token explode; the k-row unit-id
    * table broadcasts; reassembly is one groupBy(doc) carrying
    * (tokenPos, unitPos, id) triples sorted per doc. No window
    * anywhere; the id table's rank runs over k rows by construction.
    *
    * @return (idCol, n_units, n_oov, ids_md5 — md5 of the
    *         comma-joined id sequence in token-then-unit order)
    */
  def bpeEncodeIds(docs: DataFrame, idCol: String, textCol: String,
      merges: Int, k: Int, window: Int = 1, maxRounds: Int = Int.MaxValue,
      driverVocabMax: Int = BpeDriverVocabMax): DataFrame =
    bpeEncodeIdsFromHist(docs, idCol, textCol,
      bpeCore(docs, idCol, textCol, merges, window, maxRounds,
        driverVocabMax)._2, k, window)

  /** [[bpeEncodeIds]] over an already-trained histogram. */
  private[ops] def bpeEncodeIdsFromHist(docs: DataFrame, idCol: String,
      textCol: String, hist: DataFrame, k: Int, window: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val wordUnits = hist.select(col("__w"),
      split(trim(col("__s"), "·"), "··").as("__us"))
    val unitVocab = hist
      .select(explode(split(trim(col("__s"), "·"), "··")).as("unit"),
        col("__cnt"))
      .groupBy(col("unit")).agg(sum(col("__cnt")).as("__c"))
      .orderBy(col("__c").desc, col("unit")).limit(k)
      // k rows by construction — the bounded-input rank
      .withColumn("__uid", row_number()
        .over(Window.orderBy(col("__c").desc, col("unit"))).cast("long"))
      .select(col("unit"), col("__uid"))
    val tokpos = docs.select(col(idCol),
      posexplode(TextFunctions.pretokens(col(textCol), window))
        .as(Seq("__pos", "__w")))
    val units = tokpos.join(wordUnits, Seq("__w"))
      .select(col(idCol), col("__pos"),
        posexplode(col("__us")).as(Seq("__j", "unit")))
    val enc = units.join(broadcast(unitVocab), Seq("unit"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"),
        count(when(col("__uid").isNull, 1)).as("__oov"),
        sort_array(collect_list(struct(col("__pos"), col("__j"),
          coalesce(col("__uid"), lit(0L)).as("__id")))).as("__seq"))
    docs.select(col(idCol))
      .join(enc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_units"),
        coalesce(col("__oov"), lit(0L)).as("n_oov"),
        md5(coalesce(
          array_join(expr("transform(__seq, e -> CAST(e.__id AS STRING))"),
            ","), lit("")).cast("binary")).as("ids_md5"))
  }
}
