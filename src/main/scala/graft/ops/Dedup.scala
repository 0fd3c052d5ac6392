package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication operators — the LLM-training-pipeline workhorses,
  * each designed around one shuffle on a compact key so the pattern holds
  * at 100 TB:
  *
  *   - exact:        hash-groupBy on md5(text) — one shuffle of 16-byte keys
  *   - ngramJaccard: inverted-index join on shingles (never all-pairs);
  *                   candidate pairs are bounded by shared-shingle counts
  *   - minhashLsh:   shingle → fixed-k minhash signature → banded buckets →
  *                   pair join inside buckets only (classic MinHash+LSH)
  *   - simhash:      64→16-bit projection per doc, near-dup = small
  *                   hamming distance; signature computation is a narrow map
  *   - embeddingCosine: blocked all-pairs within a blocking key (label,
  *                   LSH bucket, …) — never unblocked n²
  *
  * Hashing uses md5 (bit-identical across engines) so every operator is
  * verifiable against the DuckDB oracle.
  */
object Dedup {

  /** Canonical-id assignment by exact text hash: every row keeps the min
    * id of its duplicate group.
    *
    * Spelled as a partial-aggregated `groupBy(md5).min(id)` + equi-join
    * back, NOT a window over the content hash: a window colocates every
    * row of a duplicate group in one task before anything can reduce it,
    * and real crawls have pathological groups (empty docs, "404" pages)
    * with 10⁷+ copies. The aggregate runs map-side partials — each task
    * ships one (hash, min) per group — and the join-back is an equi-join
    * AQE can skew-split, so no key ever funnels a single task.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = df.select(col(idCol), md5(col(textCol).cast("binary")).as("__h"))
    val keep = keyed.groupBy(col("__h")).agg(min(col(idCol)).as("keep_id"))
    keyed.join(keep, "__h")
      .select(col(idCol), col("keep_id"),
        (col(idCol) =!= col("keep_id")).as("is_dup"))
  }

  /** Exact-duplicate removal (the companion action to [[exact]]):
    * [[dropDuplicatesByPriority]] with the id as the whole priority. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    dropDuplicatesByPriority(df, textCol, Seq(col(idCol)))

  /** Per-`groupCol` duplication health report: docs, corpus-wide exact
    * duplicates (non-first occurrence of their content hash, [[exact]]'s
    * survivor rule), and the duplicate rate in ppm — the per-crawl /
    * per-source table a curation run reads to decide which inputs are
    * rotting. Duplication is CORPUS-wide (a doc whose text first
    * appeared in another source counts as that source's duplicate), so
    * the rates expose cross-source copying, not just self-duplication.
    *
    * Same scale shape as [[exact]] (partial-aggregated hash groupBy +
    * AQE-splittable join-back) followed by a #groups-row aggregate.
    */
  def duplicateRateByGroup(df: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame =
    df.select(col(idCol), col(groupCol))
      .join(exact(df, idCol, textCol), idCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"))
      .withColumn("dup_ppm", expr("n_dups * 1000000 DIV n_docs"))

  /** Priority-aware exact dedup: among rows with identical text, keep the
    * one ranked first by `priorityCols` (e.g. source quality tier, then
    * id for determinism) — the curation rule "when Wikipedia and a crawl
    * dump collide, keep Wikipedia". Callers should end `priorityCols`
    * with a unique tiebreaker (the id) for a deterministic survivor.
    *
    * One `min_by(struct(row), struct(priority))` aggregate — fully
    * partial-aggregated (each map task emits one candidate survivor per
    * hash it sees, merge keeps the struct-min), so a 10⁷-copy duplicate
    * group costs one row per upstream partition, never a single-task
    * window sort over the whole group.
    */
  def dropDuplicatesByPriority(df: DataFrame, textCol: String,
      priorityCols: Seq[Column]): DataFrame = {
    require(priorityCols.nonEmpty, "need at least one priority column")
    val rowStruct = struct(df.columns.map(col): _*)
    df.groupBy(md5(col(textCol).cast("binary")).as("__h"))
      .agg(min_by(rowStruct, struct(priorityCols: _*)).as("__row"))
      .select(df.columns.map(c => col(s"__row.$c")): _*)
  }

  /** doc → distinct word-n-gram shingle rows (the inverted index).
    *
    * Structured to defeat projection-collapse blowup: higher-order
    * functions are interpreted (no codegen CSE), and CollapseProject
    * inlines a `tokens(text)` expression into every `element_at`
    * reference — re-splitting the text dozens of times per row. The
    * token array is materialized in its own projection below a Generate
    * barrier (Project is never merged into a generator), so the split
    * happens exactly once per row.
    */
  private def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = df.select(col(idCol).as("doc"), tokens(col(textCol)).as("__ws"))
    toks.select(col("doc"),
      explode(shinglesFromTokens(col("__ws"), n)).as("shingle"))
  }

  /** Candidate pairs by n-gram Jaccard ≥ threshold, computed via an
    * inverted-index self-join (docs sharing no shingle never pair up).
    *
    * `maxDf` is the stop-shingle cap: a shingle present in d documents
    * contributes O(d²) candidate pairs, so one piece of corpus
    * boilerplate ("all rights reserved …") turns the index join into a
    * skewed near-cross-product. Shingles with document frequency > maxDf
    * are dropped from BOTH the index and the per-doc size counts, so the
    * Jaccard is computed consistently over the surviving (discriminative)
    * shingle universe — the standard trade: bounded work, similarity
    * measured on informative features.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Int = 10000): DataFrame = {
    // Stop-shingle removal must NOT be a count(*) window over the
    // shingle: window evaluation colocates every row of a key in one
    // task BEFORE the df filter can drop it — at scale, precisely the
    // boilerplate shingle the cap exists for funnels 10⁸ rows through
    // one task. Instead: map-side-partial groupBy computes df, the
    // (tiny, by definition of boilerplate) `> maxDf` survivor set
    // anti-joins the index map-side — the same spelling as
    // [[dedupLines]]. The one explode feeds both the count and the
    // anti-join, so it is materialized once (lifetime: this call).
    val sh0 = shingleRows(df, idCol, textCol, n).localCheckpoint(true)
    val stop = sh0.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("shingle"))
    val sh = sh0.join(stop, Seq("shingle"), "left_anti")
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n_shingles"))
    val common = sh.as("a").join(sh.hint("shuffle_hash").as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc", "d1").withColumnRenamed("n_shingles", "na"), "d1")
      .join(sizes.withColumnRenamed("doc", "d2").withColumnRenamed("n_shingles", "nb"), "d2")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Directed CONTAINMENT pairs: C(A→B) = |A∩B| / |A| ≥ threshold over
    * distinct word-n-gram shingle sets — the asymmetric complement to
    * [[ngramJaccard]]. A short document quoted whole inside a long
    * aggregator page has high containment but low Jaccard (the union is
    * dominated by the big doc), so symmetric dedup never pairs them;
    * containment is how quote farms, scraped-with-chrome copies, and
    * doc-in-doc embeddings are actually caught.
    *
    * Same scale spelling as [[ngramJaccard]]: df-capped inverted index
    * (partial-aggregated df, broadcast anti-join of the tiny stop set),
    * candidate pairs only where a shingle is shared, and the denominator
    * |A| counted over the surviving shingle universe so the ratio is
    * consistent. Output is DIRECTED: (d_in, d_out) appears when d_in's
    * shingles are ≥ threshold contained in d_out — both directions can
    * hold (near-identical docs).
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, thresholdPpm: Long = 700000L, maxDf: Int = 10000): DataFrame = {
    require(thresholdPpm >= 1 && thresholdPpm <= 1000000,
      s"thresholdPpm must be in [1, 1000000], got $thresholdPpm")
    val sh0 = shingleRows(df, idCol, textCol, n).localCheckpoint(true)
    val stop = sh0.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("shingle"))
    val sh = sh0.join(stop, Seq("shingle"), "left_anti")
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    sh.as("a").join(sh.hint("shuffle_hash").as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") =!= col("b.doc"))
      .groupBy(col("a.doc").as("d_in"), col("b.doc").as("d_out"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.withColumnRenamed("doc", "d_in"), "d_in")
      .filter(col("common") * lit(1000000L) >= lit(thresholdPpm) * col("n"))
      .select(col("d_in"), col("d_out"),
        (col("common").cast("double") / col("n").cast("double"))
          .as("containment"))
  }

  /** EXACT all-pairs token-set similarity self-join by PREFIX FILTERING
    * (the PPJoin/AllPairs family, Chaudhuri et al. 2006 / Xiao et al.
    * 2008) — the no-false-negative counterpart to [[minhashLsh]]: every
    * pair with Jaccard ≥ threshold over the docs' DISTINCT word-n-gram
    * shingle sets is returned, with the exact similarity. Unlike
    * [[ngramJaccard]] there is NO df cap — boilerplate shingles stay in
    * the similarity universe; prefix order keeps them out of the join.
    *
    * Why a prefix prunes exactly: order every doc's token set by one
    * GLOBAL total order (document frequency ascending, then token — the
    * rarest-first convention, shared with the oracle). If
    * J(A,B) ≥ t then |A∩B| ≥ ceil(t·|A|), so A cannot skip its
    * |A| − ceil(t·|A|) + 1 first tokens and still intersect B enough —
    * two qualifying docs MUST share at least one PREFIX token. Joining
    * only prefix rows (≈ (1−t)·|A| rarest tokens per doc) instead of the
    * whole inverted index is what makes the exact join feasible: the
    * high-df tokens that would drive the O(df²) candidate blowup are
    * exactly the ones prefix order pushes out of the join.
    *
    * Shape at scale: one df aggregate (map-side partials) + equi-join
    * back; the per-doc rarest-first rank is a window partitioned by the
    * DOC id — partition size is bounded by document length, never by
    * corpus size (the safe window class). Candidates join on prefix
    * tokens only, pruned by TWO exact filters before any verification:
    * the size filter (J ≥ t forces t·max(|A|,|B|) ≤ min(|A|,|B|)) and
    * PPJoin's positional filter (all shared elements rank at or after
    * the first shared token, so min(|A|−rₐ, |B|−r_b)+1 bounds |A∩B| —
    * rows violating ⌈t/(1+t)·(|A|+|B|)⌉ can't be a qualifying pair's
    * first shared token). Verification then joins each surviving PAIR
    * to its two pre-materialized shingle ARRAYS (equi-joins on the doc
    * id) and intersects them map-side — candidates × O(doc length)
    * comparisons with no index fan-out shuffle. No all-pairs product
    * anywhere.
    *
    * Trade vs [[minhashLsh]]: exact recall, but candidate count tracks
    * true near-dup density — on a corpus where everything resembles
    * everything (low threshold, templated text) LSH's banded buckets
    * bound work harder. Run this where missing a duplicate is the
    * expensive outcome (eval decontamination, license dedup).
    *
    * Shingle identity is its 56-bit md5 prefix — 8-byte keys through
    * every shuffle and 8-byte array elements through the verify joins
    * instead of ~25-byte strings (the same discipline as the span-dedup
    * family). The oracle hashes identically, so the two engines agree
    * by construction; a hash collision needs ~10^8 distinct shingles
    * (birthday at 2^56) — widen to two hash words past that.
    */
  def prefixFilterPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, thresholdPpm: Long = 500000L): DataFrame = {
    require(thresholdPpm >= 1 && thresholdPpm <= 1000000,
      s"thresholdPpm must be in [1, 1000000], got $thresholdPpm")
    // per-doc DISTINCT shingle array, materialized once (the df count,
    // the prefix ranks, and the verify arrays all derive from it); the
    // single-element explode is the Generate barrier that stops
    // CollapseProject from re-splitting the text per shingle position
    val base = df
      .select(col(idCol).as("doc"),
        explode(array(tokens(col(textCol)))).as("__ws"))
      .select(col("doc"),
        sort_array(transform(shinglesFromTokens(col("__ws"), n),
          s => graft.functions.Md5PrefixLong.md5_prefix_long(s, 14)))
          .as("arr"))
      .localCheckpoint(true)
    // n travels on every index row — no sizes join anywhere downstream
    val idx = base.select(col("doc"), size(col("arr")).cast("long").as("n"),
      explode(col("arr")).as("tok"))
    val dfTab = idx.groupBy(col("tok")).agg(count(lit(1)).as("__df"))
    // rarest-first rank inside each doc; prefix keeps the tokens a
    // qualifying partner cannot avoid sharing
    val w = Window.partitionBy(col("doc")).orderBy(col("__df"), col("tok"))
    val prefix = idx.join(dfTab, "tok")
      .withColumn("__r", row_number().over(w).cast("long"))
      // prefixLen = n - ceil(t*n) + 1, all-integer ceil
      .filter(col("__r") <=
        col("n") - expr(s"CAST((n * ${thresholdPpm}L + 999999) DIV 1000000 AS BIGINT)") + 1)
      .select(col("doc"), col("tok"), col("n"), col("__r"))
    val cand = prefix.as("a").join(prefix.hint("shuffle_hash").as("b"),
        col("a.tok") === col("b.tok") && col("a.doc") < col("b.doc") &&
          // size filter: J >= t forces t*max(|A|,|B|) <= min(|A|,|B|)
          col("a.n") * lit(1000000L) >= lit(thresholdPpm) * col("b.n") &&
          col("b.n") * lit(1000000L) >= lit(thresholdPpm) * col("a.n") &&
          // positional filter: every shared element ranks at or after the
          // FIRST shared token, so min remaining suffix bounds |A∩B|;
          // (m >= ceil(t(na+nb)/(1e6+t))) cross-multiplied, m integer
          (least(col("a.n") - col("a.__r"), col("b.n") - col("b.__r")) + 1) *
            lit(1000000L + thresholdPpm) >=
            lit(thresholdPpm) * (col("a.n") + col("b.n")))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
    // verify: fetch both pre-materialized arrays by doc id and intersect
    // map-side — no index fan-out, candidates x O(doc length) work
    cand
      .join(base.select(col("doc").as("d1"), col("arr").as("__aa")), "d1")
      .join(base.select(col("doc").as("d2"), col("arr").as("__ab")), "d2")
      .withColumn("common",
        size(array_intersect(col("__aa"), col("__ab"))).cast("long"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double"))
      // ppm cross-multiplication decides; the double is only reported
      .filter(col("common") * lit(1000000L) >=
        lit(thresholdPpm) * (col("na") + col("nb") - col("common")))
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** EXACT all-pairs WEIGHTED-COSINE similarity self-join (Bayardo,
    * Ma & Srikant 2007, "Scaling Up All Pairs Similarity Search") —
    * the rarity-aware sibling of [[prefixFilterPairs]]: features are
    * the same distinct word-n-gram shingles, but each carries an
    * integer idf-style weight `min(N DIV df, weightCap)`, so two docs
    * sharing rare content score high while shared boilerplate
    * (high-df shingles, weight → 1) barely moves the needle — the
    * failure mode symmetric Jaccard has on templated corpora.
    *
    * Cosine over set-semantics idf vectors:
    * `cos(A,B) = Σ_{t∈A∩B} w(t)² / (‖A‖·‖B‖)`, `‖A‖² = Σ_{t∈A} w(t)²`.
    * The threshold is the RATIONAL p/q, and every pruning decision is
    * integer arithmetic; the final guard `dot²·q² ≥ p²·‖A‖²·‖B‖²`
    * runs in DECIMAL(38,0) (128-bit exact, never emitted as a result
    * column), so there is no float anywhere a decision is made.
    *
    * Why the prefix prunes EXACTLY (the suffix-norm bound): sort each
    * doc's features by one global order (df ascending, then feature —
    * heaviest first); let tail²(r) be the weight-squared sum from rank
    * r on. If every shared feature of a pair sits at ranks with
    * `tail²(r)·q² < p²·‖A‖²`, Cauchy-Schwarz gives
    * `dot ≤ √tail²·‖B‖ < (p/q)·‖A‖·‖B‖` — the pair cannot qualify. So
    * a qualifying pair must share a feature ranked while
    * `tail²·q² ≥ p²·‖A‖²` — the PREFIX — and probing prefix rows
    * against the FULL index (not prefix×prefix: the second shared
    * feature may sit in the partner's suffix) finds every qualifying
    * pair. The norm-ratio filter rides the join:
    * `dot ≤ min(‖A‖², ‖B‖²)` for idf-set vectors forces
    * `q²·‖A‖² ≥ p²·‖B‖²` both ways.
    *
    * Shape at scale: df table is one partial aggregate; the rank order
    * lives in each doc's SORTED feature array (window only over the
    * doc partition — the safe class); prefix rows carry the rarest
    * features, whose df is exactly what bounds the index fan-out; the
    * verify joins each candidate pair to two pre-materialized
    * tok-sorted arrays and computes the dot product map-side with the
    * codegen'd [[graft.functions.SortedIntersectSum]] two-pointer merge
    * — O(|A|+|B|) per pair, no shuffle fan-out. No all-pairs product, no df
    * cap, no false negatives — the oracle computes the UNFILTERED
    * pairwise truth, so a pair lost to the prefix join breaks the gate.
    *
    * Overflow contract: single products stay under 2^63 for
    * `‖A‖² ≤ 4·10^14/q²`; the dot² guard is 128-bit. Default cap 1000
    * keeps w² ≤ 10^6, so docs up to ~10^8 distinct shingles are safe.
    */
  def cosinePrefixPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, p: Int = 7, q: Int = 10,
      weightCap: Long = 1000L): DataFrame = {
    require(p >= 1 && q >= 2 && p < q,
      s"cosine threshold p/q must be a rational in (0,1), got $p/$q")
    require(weightCap >= 1, s"weightCap must be >= 1, got $weightCap")
    import org.apache.spark.sql.types.DecimalType
    val sh = shingleRows(df, idCol, textCol, n)
      .select(col("doc"),
        graft.functions.Md5PrefixLong
          .md5_prefix_long(col("shingle"), 14).as("tok"))
    // bounded driver scalar (the kmeans pattern): one count to pin N
    // for the idf weights. N counts docs that PRODUCED a shingle — the
    // same population the oracle's COUNT(DISTINCT doc) sees — so a doc
    // shorter than n tokens cannot shift every idf weight and break
    // cross-engine equality. A doc shingles iff it has ≥ n tokens
    // (shinglesFromTokens' emptiness condition), so the count is one
    // MAP-ONLY pass over docs instead of re-executing the shingle
    // explode pipeline.
    val nDocs = df
      .filter(size(tokens(col(textCol))) >= n)
      .select(col(idCol)).distinct().count()
    val dfTab = sh.groupBy(col("tok")).agg(count(lit(1)).as("__df"))
    val idx0 = sh.join(dfTab, "tok")
      .withColumn("__w2",
        expr(s"least(${nDocs}L DIV __df, ${weightCap}L) * " +
          s"least(${nDocs}L DIV __df, ${weightCap}L)"))
    // per-doc feature array PRE-SORTED in the global (df, tok) order —
    // the prefix rank is the array position, the verify reads the same
    // array; one materialization feeds both
    val base = idx0.groupBy(col("doc"))
      .agg(sort_array(collect_list(
        struct(col("__df"), col("tok"), col("__w2")))).as("__arr"),
        // tok-sorted twin of __arr for the verify merge: the same
        // features re-sorted by the feature id so the dot product is
        // one two-pointer pass (struct sort_array orders by the first
        // field; toks are distinct per doc, so the order is total)
        sort_array(collect_list(struct(col("tok"), col("__w2")))).as("__tk"),
        sum(col("__w2")).as("na2"))
      .localCheckpoint(true)
    val idx = base
      .select(col("doc"), col("na2"), posexplode(col("__arr")).as(Seq("r0", "e")))
      .select(col("doc"), col("na2"), col("r0"),
        col("e.tok").as("tok"), col("e.__w2").as("w2"))
    val wTail = Window.partitionBy(col("doc")).orderBy(col("r0"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prefix = idx
      .withColumn("__tail2", sum(col("w2")).over(wTail))
      .filter(col("__tail2") * lit((q * q).toLong) >=
        lit((p * p).toLong) * col("na2"))
      .select(col("doc"), col("na2"), col("tok"))
    val cand = prefix.as("a").join(idx.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc") =!= col("b.doc") &&
          // norm-ratio filter, both directions (dot <= min of the norms)
          col("a.na2") * lit((q * q).toLong) >= lit((p * p).toLong) * col("b.na2") &&
          col("b.na2") * lit((q * q).toLong) >= lit((p * p).toLong) * col("a.na2"))
      .select(least(col("a.doc"), col("b.doc")).as("d1"),
        greatest(col("a.doc"), col("b.doc")).as("d2"))
      .distinct()
    val aSide = base.select(col("doc").as("d1"),
      transform(col("__tk"), e => e.getField("tok")).as("__at"),
      transform(col("__tk"), e => e.getField("__w2")).as("__aw"),
      col("na2"))
    val bSide = base.select(col("doc").as("d2"),
      transform(col("__tk"), e => e.getField("tok")).as("__bt"),
      col("na2").as("nb2"))
    cand.join(aSide, "d1").join(bSide, "d2")
      .withColumn("dot", graft.functions.SortedIntersectSum
        .sorted_intersect_sum(col("__at"), col("__aw"), col("__bt")))
      // the exact 128-bit decision: dot^2 q^2 >= p^2 |A|^2 |B|^2
      .filter(col("dot").cast(DecimalType(38, 0)) * col("dot") *
        lit((q * q).toLong) >=
        col("na2").cast(DecimalType(38, 0)) * col("nb2") *
          lit((p * p).toLong))
      .select(col("d1"), col("d2"),
        (col("dot").cast("double") /
          sqrt(col("na2").cast("double") * col("nb2").cast("double")))
          .as("cosine"))
  }

  /** Content-defined chunking (CDC) duplicate report — the rsync/LBFS
    * trick at token granularity: a token whose hash ≡ 0 (mod `divisor`)
    * ENDS a chunk, so chunk boundaries are decided by content, not
    * position, and an insertion near the top of a document shifts no
    * boundary after the next hash-selected token. Fixed-stride spans
    * ([[duplicateSpans]]) lose alignment after any edit; CDC chunks
    * re-synchronize — the granularity storage dedup and diff transfer
    * actually use. Expected chunk length = `divisor` tokens.
    *
    * Returns the chunks appearing in ≥ 2 distinct documents: chunk
    * hash, distinct-doc count, occurrence count, token length — the
    * shared-content inventory a chunk-level dedup store would key on.
    *
    * Shape at scale: chunk assignment is a running boundary count in a
    * window partitioned by the DOC id (size bounded by document length,
    * the safe window class); chunk text reassembly is a (doc, chunk)
    * aggregate; the cross-doc report is one partial-aggregated groupBy
    * on the 16-byte chunk hash. The distinct-doc count rewrites to a
    * two-level aggregate (hash, doc) → hash, so no duplicate group
    * funnels one task.
    */
  /** (doc, cid, chunk_hash, n_toks) rows of a corpus under the CDC
    * boundary rule — the shared chunker behind [[cdcChunkDuplicates]]
    * and [[cdcIncremental]]. */
  private def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      divisor: Int): DataFrame = {
    require(divisor >= 1, s"divisor must be >= 1, got $divisor")
    val pos = df
      .select(col(idCol).as("doc"),
        posexplode(tokens(col(textCol))).as(Seq("p0", "tok")))
      .select(col("doc"), (col("p0") + 1).as("i"), col("tok"))
    val b = pos.withColumn("bd",
      when(graft.functions.Md5PrefixLong.md5_prefix_long(col("tok"), 14)
        % divisor === 0, 1L).otherwise(0L))
    // boundary token ends its chunk: chunk id = boundaries strictly before
    val w = Window.partitionBy(col("doc")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    b.withColumn("cid", coalesce(sum(col("bd")).over(w), lit(0L)))
      .groupBy(col("doc"), col("cid"))
      .agg(
        md5(array_join(
          transform(sort_array(collect_list(struct(col("i"), col("tok")))),
            x => x.getField("tok")), " ").cast("binary")).as("chunk_hash"),
        count(lit(1)).as("n_toks"))
  }

  def cdcChunkDuplicates(df: DataFrame, idCol: String, textCol: String,
      divisor: Int = 16): DataFrame = {
    cdcChunks(df, idCol, textCol, divisor).groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(col("n_toks")).as("n_tokens"))
      .filter(col("n_docs") >= 2)
  }

  /** Incremental CDC chunk dedup against a STORED chunk-hash table:
    * only the NEW batch is tokenized and chunked; the history
    * contributes its (already materialized) chunk hashes as one
    * distinct set and is never re-read as text. Per new document:
    * chunk count, chunks already known to the store, and the known
    * share in ppm — the "how much of this crawl increment is content
    * we already have" triage report, at the insertion-robust CDC
    * granularity (same store-reuse contract as the span and minhash
    * incremental paths).
    */
  def cdcIncremental(newDocs: DataFrame, storeHashes: DataFrame,
      idCol: String, textCol: String, divisor: Int = 16): DataFrame = {
    val known = storeHashes.select(col("chunk_hash")).distinct()
      .withColumn("__k", lit(1))
    cdcChunks(newDocs, idCol, textCol, divisor)
      .join(known, Seq("chunk_hash"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_chunks"), count(col("__k")).as("n_known"))
      .select(col("doc").as(idCol), col("n_chunks"), col("n_known"),
        expr("n_known * 1000000 DIV n_chunks").as("known_ppm"))
  }

  /** Chunk-hash store rows for [[cdcIncremental]] — what a production
    * pipeline persists after each ingest (one row per chunk occurrence;
    * the incremental path distincts the hashes). */
  def cdcStore(df: DataFrame, idCol: String, textCol: String,
      divisor: Int = 16): DataFrame =
    cdcChunks(df, idCol, textCol, divisor)
      .select(col("doc").as(idCol), col("cid"), col("chunk_hash"))

  /** Benchmark decontamination: for every training document, the share
    * of its distinct word n-gram shingles that also appear anywhere in
    * the evaluation corpus — the standard "is my test set leaking into
    * training data" check run before every pretraining job.
    *
    * Shape at scale: the eval side collapses to its DISTINCT shingle set
    * (benchmarks are tiny next to a training corpus, so Catalyst
    * broadcasts it); the train side is scanned, shingled, and shuffled
    * ONCE — a left join against the unique eval shingles cannot fan rows
    * out, so one aggregate yields both the total and the hit count.
    *
    * Training docs with fewer than `n` tokens have no shingles and are
    * ABSENT from the output (n-gram evidence cannot convict them);
    * treat absence as contamination 0 when joining back.
    *
    * @return (idCol, n_shingles, n_contaminated, contamination ratio)
    */
  def contamination(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val trainSh = shingleRows(train, idCol, textCol, n)
    val evalSh = shingleRows(eval, idCol, textCol, n)
      .select(col("shingle")).distinct()
      .withColumn("__hit", lit(1))
    trainSh.join(evalSh, Seq("shingle"), "left")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_contaminated"))
      .select(col("doc").as(idCol),
        col("n_shingles"), col("n_contaminated"),
        (col("n_contaminated").cast("double") /
          col("n_shingles").cast("double")).as("contamination"))
  }

  /** [[contamination]] with a Bloom-filter semi-join prefilter — the
    * 100 TB shape. The exact form shuffles EVERY train shingle into the
    * eval join; at corpus scale that shuffle is the whole cost, even
    * though almost no train shingle matches. Here the (small) benchmark
    * side collapses to a driver-built Bloom sketch, broadcast to every
    * task, and train shingles the sketch rejects never reach the join —
    * a might-contain MISS is definitive, so only true hits plus the fpp
    * share of false positives get shuffled, and the exact inner join
    * then removes the false positives. Per-doc shingle totals come from
    * a separate map-side-partial aggregate that never joins anything.
    * Output is byte-identical to [[contamination]] — the sketch only
    * prunes, it never decides.
    *
    * When to pick which: while the eval shingle set fits a broadcast
    * hash relation, [[contamination]]'s plain join already never
    * shuffles the train side — use it. This variant's niche is the gap
    * where eval is too big to broadcast as a hash table (GBs of
    * shingles) but its Bloom sketch (10-100x smaller) still ships to
    * every task: the train side then enters the unavoidable shuffle
    * join at ~fpp of its size instead of whole.
    */
  def contaminationBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 3, fpp: Double = 0.01,
      expectedEvalShingles: Long = 1L << 20): DataFrame = {
    val trainSh = shingleRows(train, idCol, textCol, n)
    val evalShRaw = shingleRows(eval, idCol, textCol, n)
    val evalSh = evalShRaw.select(col("shingle")).distinct()
    // Sketch from the RAW shingle rows: duplicates set the same bits, so
    // distinct-ing first would only add a shuffle to the sketch path —
    // this pass is map-side partials merged on the driver. Capacity is a
    // caller-supplied budget (counting the eval shingles first would cost
    // a whole extra eval scan): over-sizing only lowers the fpp (more
    // pruning, ~1.2 MB per million at 1%), under-sizing only raises it —
    // correctness never depends on it.
    val bf = evalShRaw.stat.bloomFilter("shingle",
      math.max(1024L, expectedEvalShingles), fpp)
    val bfB = train.sparkSession.sparkContext.broadcast(bf)
    // no built-in expression exposes BloomFilter.mightContain, so this is
    // the one justified UDF: a branch-free bit probe per row, map-side
    val mightContain = udf((s: String) => s != null && bfB.value.mightContainString(s))
    // per-doc totals never need the exploded rows: the shingle-array SIZE
    // is the distinct count, a map-only projection over the docs scan —
    // no shuffle, and the exploded train side is scanned exactly once
    // (for the prefiltered hit join) instead of twice. The token array is
    // materialized below a Generate barrier (single-element explode) so
    // CollapseProject cannot inline tokens(text) into every element_at —
    // that inlining re-splits the text per shingle position, O(tokens^2)
    val totals = train
      .select(col(idCol).as("doc"),
        explode(array(graft.functions.TextFunctions.tokens(col(textCol))))
          .as("__ws"))
      .select(col("doc"),
        size(graft.functions.TextFunctions.shinglesFromTokens(col("__ws"), n))
          .cast("long").as("n_shingles"))
      .filter(col("n_shingles") > 0) // < n tokens: absent, like the exact path
    val hits = trainSh.filter(mightContain(col("shingle")))
      .join(evalSh, Seq("shingle")) // exact: false positives die here
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_contaminated"))
    totals.join(hits, Seq("doc"), "left")
      .select(col("doc").as(idCol), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)).cast("double") /
          col("n_shingles").cast("double")).as("contamination"))
  }

  /** Per-round plan-cutting strategy for the iterative CC solvers:
    * eager `localCheckpoint` by default (executor-local blocks, no
    * storage dependency), eager reliable `checkpoint` when a directory
    * is supplied — survives executor loss on long-lived clusters. */
  private def materializer(checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case Some(dir) => df => {
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(true)
      }
      case None => _.localCheckpoint(true)
    }

  /** Connected components over an undirected pair graph (the near-dup
    * cluster extractor): iterative min-label propagation — every node
    * starts labeled with its own id, each round every node takes the min
    * of its label and its neighbors' labels, fixpoint = components labeled
    * by their min member.
    *
    * Scale shape: each round is ONE shuffle of the (cached) edge list
    * joined to the current labels; the driver sees only a changed-row
    * count per round (the convergence check), never data. Rounds needed =
    * graph diameter — near-dup clusters are shallow (pairs come from a
    * similarity threshold), so this converges in a handful of rounds; a
    * deep-chain graph would want the large-star/small-star variant.
    *
    * @param checkpointDir when set, per-round results go to RELIABLE
    *        checkpoint storage (HDFS/S3) instead of executor-local
    *        `localCheckpoint` blocks — on a long-lived cluster with
    *        executor churn a lost local block would otherwise force a
    *        full recomputation of every round up to the failure
    * @return (id, cluster) — cluster is the min id in the component
    */
  def connectedComponents(ids: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "d1", bCol: String = "d2", maxIters: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    // explicit MEMORY_AND_DISK (the Dataset cache() default, pinned here
    // so a future StorageLevel change can't silently turn the per-round
    // edge scan into recomputation-on-eviction)
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val materialize = materializer(checkpointDir)
    // Iterate ONLY over nodes that appear in the pair graph: a near-dup
    // graph over a real corpus is sparse (the overwhelming majority of
    // documents pair with nothing), so each round shuffles O(|connected|)
    // labels instead of O(|corpus|); the untouched singletons join back
    // in one final pass. At 100 TB this is the difference between
    // per-round full-corpus shuffles and per-round kilobyte shuffles.
    //
    // per-round localCheckpoint rather than cache: labels feeds the next
    // round's plan TWICE (neighbor join + change check), so a cached loop
    // doubles the logical plan every round and the analyzer, not the
    // data, becomes the bottleneck after ~10 rounds. The checkpoint
    // resets the plan to a leaf; dropped rounds' blocks are released by
    // the ContextCleaner.
    var labels = materialize(edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("cluster")))
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("cluster")).as("nbr"))
      val next = materialize(labels.join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr"), col("cluster"))).as("cluster")))
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.cluster") =!= col("o.cluster")).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    if (!converged) {
      // fail LOUD: un-converged labels silently split components — in a
      // dedup pipeline that means retained near-duplicates with multiple
      // is_canonical=true rows per real cluster and no way to tell from
      // the returned DataFrame
      edges.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIters rounds — " +
          "the graph's diameter exceeds maxIters and some components would " +
          "carry multiple labels; raise maxIters or use " +
          "connectedComponentsStar (O(log n) rounds on any diameter)")
    }
    // with checkpointDir unset, labels is a localCheckpoint — blocks are
    // executor-local, so on a long-lived cluster with executor churn pass
    // checkpointDir (reliable storage) instead of relying on lazy
    // recomputation across executor failures.
    edges.unpersist()
    // singletons (no pair) are their own cluster; one left join, no rounds
    ids.select(col(idCol).as("id"))
      .join(labels.withColumnRenamed("id", "__cid"),
        col("id") === col("__cid"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", 2014) — the deep-graph companion to
    * [[connectedComponents]]: label propagation needs one round per unit
    * of graph DIAMETER, star contraction halves tree heights every
    * round and converges in O(log n) rounds on any graph, so a
    * 10-million-link chain finishes in ~25 rounds instead of 10 million.
    *
    * Both phases are pure edge-set rewrites (groupBy + join on the edge
    * list, no per-node state), so each round is two shuffles of the
    * current edge set and the driver only ever sees a count. Edges only
    * ever point DOWNWARD (src > dst) and shrink toward stars; at the
    * fixpoint every non-root node holds exactly one edge to its
    * component's minimum id.
    *
    * - large-star: each node u connects its LARGER neighbors to
    *   m = min(N(u) ∪ u) — detaches high ids from chains.
    * - small-star: each node u reconnects its smaller neighbors (and
    *   itself) to m = min(N⁻(u)) — flattens the remaining slopes.
    *
    * @param checkpointDir as in [[connectedComponents]]: reliable
    *        per-round checkpoints instead of executor-local blocks
    * @return (id, cluster) — cluster is the min id in the component,
    *         identical to [[connectedComponents]] output
    */
  def connectedComponentsStar(ids: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "d1", bCol: String = "d2", maxIters: Int = 30,
      checkpointDir: Option[String] = None): DataFrame = {
    // canonical directed edge: src strictly above dst.
    // Each round's result is checkpointed, NOT merely cached: the
    // next round's plan is built on top of the previous result, and a
    // cache leaves the logical plan in place — after k rounds the ANALYZER
    // walks a plan tree that doubled k times (edges appears twice in
    // large-star and again in the convergence except), which stalls the
    // driver long before the data does. The checkpoint resets the plan to
    // a leaf each round; blocks of dropped rounds are released by the
    // ContextCleaner.
    val materialize = materializer(checkpointDir)
    var edges = materialize(pairs.select(
        greatest(col(aCol), col(bCol)).as("src"),
        least(col(aCol), col(bCol)).as("dst"))
      .filter(col("src") =!= col("dst")).distinct())

    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.select(col("src").as("u"), col("dst").as("v"))
        .unionAll(e.select(col("dst").as("u"), col("src").as("v")))
      val mins = nbrs.groupBy(col("u")).agg(least(min(col("v")), col("u")).as("m"))
      nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val fromNbrs = e.join(mins, "src")
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
      val fromSelf = mins.select(col("src"), col("m").as("dst"))
      fromNbrs.unionAll(fromSelf).distinct()
    }

    var converged = false
    var i = 0
    var nEdges = edges.count()
    while (!converged && i < maxIters) {
      val next = materialize(smallStar(largeStar(edges)))
      val nNext = next.count()
      // sets are equal iff same size and next ⊆ edges (both are distinct)
      converged = nNext == nEdges && next.except(edges).limit(1).count() == 0
      edges = next
      nEdges = nNext
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge after $maxIters rounds; " +
          "labels would be transitively unresolved (silently wrong " +
          "clusters) — raise maxIters (30 rounds covers any graph below " +
          "~2^30 nodes)")
    // at the fixpoint each non-root has exactly one downward edge, to its
    // component min; min() is a no-op then and only matters un-converged
    val roots = edges.groupBy(col("src")).agg(min(col("dst")).as("root"))
    ids.select(col(idCol).as("id"))
      .join(roots, col("id") === col("src"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster"))
  }

  /** Incrementally MAINTAIN near-dup cluster labels across batches: fold
    * a NEW batch's pairs into a STORED (id, cluster) label table without
    * re-running any solver over history. Each new edge endpoint is
    * contracted through its stored root (two hash joins), the iterative
    * solver runs on the CONTRACTED graph — whose node set is the new ids
    * plus the few old roots the new pairs touch, never history scale —
    * and the answer joins back over the stored labels in one pass.
    * Bridging pairs merge old clusters exactly as a full recompute
    * would: contraction preserves connectivity, and because every stored
    * root is already the min id of its old component, the contracted
    * min is the true union-component min — so the output is identical
    * to [[connectedComponentsStar]] over the union pair set (the
    * registry gate proves this against the full-recompute closure
    * oracle).
    *
    * Pair-discovery drift (df caps, thresholds recomputed as the corpus
    * grows) is the incremental-SIGNING operators' concern
    * ([[minhashIncremental]] &c.); this operator owns the label algebra.
    *
    * @param storedLabels (idCol, cluster) for every historical id,
    *        cluster = min id of its component
    * @param newIds the new batch's id column (disjoint from stored)
    * @param newPairs pairs with at least one NEW endpoint (new-new and
    *        new-old); old-old pairs are already folded into
    *        storedLabels and must not be resupplied
    * @return (id, cluster) over old ∪ new, cluster = component min id
    */
  def incrementalComponents(storedLabels: DataFrame, idCol: String,
      newIds: DataFrame, newPairs: DataFrame,
      aCol: String = "d1", bCol: String = "d2",
      checkpointDir: Option[String] = None): DataFrame = {
    val stored = storedLabels.select(col(idCol).as("__sid"),
      col("cluster").as("__sroot"))
    val ea = newPairs.select(col(aCol).as("__a"), col(bCol).as("__b"))
      .join(stored, col("__a") === col("__sid"), "left")
      .select(coalesce(col("__sroot"), col("__a")).as("a"), col("__b"))
    val ec = ea.join(stored, col("__b") === col("__sid"), "left")
      .select(col("a"), coalesce(col("__sroot"), col("__b")).as("b"))
    // contracted node set: touched roots arrive as edge endpoints; the
    // union with newIds covers singleton new docs
    val nodes = ec.select(col("a").as("n"))
      .unionByName(ec.select(col("b").as("n")))
      .unionByName(newIds.select(col(idCol).as("n"))).distinct()
    val solved = connectedComponentsStar(nodes, "n", ec, "a", "b",
      checkpointDir = checkpointDir)
    val rootMap = solved.select(col("id").as("__r"), col("cluster").as("__rc"))
    val oldOut = storedLabels
      .select(col(idCol).as("id"), col("cluster").as("__old"))
      .join(rootMap, col("__old") === col("__r"), "left")
      .select(col("id"), coalesce(col("__rc"), col("__old")).as("cluster"))
    val newOut = newIds.select(col(idCol).as("id"))
      .join(rootMap, col("id") === col("__r"), "left")
      .select(col("id"), coalesce(col("__rc"), col("id")).as("cluster"))
    oldOut.unionByName(newOut)
  }

  /** Scoped takedown relabel — the DELETE verb of the stored-cluster
    * lifecycle ([[connectedComponentsStar]] creates,
    * [[incrementalComponents]] adds, this removes): drop a takedown set
    * (GDPR erasure, DMCA, opt-out) from the stored labels and re-solve
    * ONLY the clusters that lost a member. Removing nodes can only
    * split components (never merge them), so untouched clusters carry
    * their stored rows forward verbatim — at 100 TB the work is
    * proportional to the affected clusters' members and pairs, not the
    * corpus.
    *
    * Per affected cluster the survivors re-solve over the STORED pair
    * rows restricted to surviving endpoints (pairs were verified when
    * the docs arrived; nothing is re-shingled), re-rooting each piece
    * at its new minimum id — exactly what a full recompute over the
    * remaining corpus produces, which is the oracle.
    *
    * Precondition (by construction of any component labeling): every
    * stored pair's endpoints share a cluster.
    *
    * @param storedLabels (idCol, cluster) as persisted by a previous
    *        solve
    * @param storedPairs the verified pair table the labels were built
    *        from (aCol, bCol)
    * @return (id, cluster) for every remaining doc
    */
  def takedownComponents(storedLabels: DataFrame, idCol: String,
      takedownIds: DataFrame, storedPairs: DataFrame,
      aCol: String = "d1", bCol: String = "d2",
      checkpointDir: Option[String] = None): DataFrame = {
    val gone = takedownIds.select(col(idCol).as("__gone"))
    val affected = storedLabels
      .join(gone, col(idCol) === col("__gone"), "left_semi")
      .select(col("cluster")).distinct()
    val survivors = storedLabels
      .join(affected, Seq("cluster"), "left_semi")
      .join(gone, col(idCol) === col("__gone"), "left_anti")
      .select(col(idCol))
    val scopedPairs = storedPairs
      .join(survivors.select(col(idCol).as("__s1")),
        col(aCol) === col("__s1"), "left_semi")
      .join(survivors.select(col(idCol).as("__s2")),
        col(bCol) === col("__s2"), "left_semi")
    val resolved = connectedComponentsStar(survivors, idCol, scopedPairs,
      aCol, bCol, checkpointDir = checkpointDir)
    storedLabels
      .join(affected, Seq("cluster"), "left_anti")
      .select(col(idCol).as("id"), col("cluster"))
      .unionByName(resolved)
  }

  /** Near-duplicate clusters: df-capped n-gram Jaccard pairs →
    * connected components → (id, cluster_id, is_canonical). Keeping only
    * `is_canonical` rows is the standard "one document per near-dup
    * cluster" training-data filter. */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Int = 10000,
      checkpointDir: Option[String] = None): DataFrame = {
    val pairs = ngramJaccard(df, idCol, textCol, n, threshold, maxDf)
    connectedComponents(df.select(col(idCol)), idCol, pairs,
      checkpointDir = checkpointDir)
      .select(col("id").as(idCol), col("cluster").as("cluster_id"),
        (col("id") === col("cluster")).as("is_canonical"))
  }

  /** Leakage-safe train/val/test split: assign the split by a hash of
    * the near-dup CLUSTER id, not the document id, so no two near
    * duplicates ever straddle a split boundary. Splitting by doc id
    * leaks evaluation data — a test document's near-verbatim twin lands
    * in train with probability ≈ train share, and the model is then
    * scored on memorized content (the contamination mechanism behind
    * "deduplicate before you split"). Cluster-atomic assignment closes
    * it by construction: members share the cluster id, the id decides
    * the split.
    *
    * Hash-range semantics are [[Corpus.splitByHash]]'s (ascending md5
    * prefix bounds, first match wins, rest label), applied to the
    * cluster id — so split shares are governed by CLUSTER mass, the
    * honest denominator once duplicates collapse.
    *
    * Scale shape: [[nearDupClusters]]'s bucketed pair discovery +
    * O(log n) component solve, then one map-side md5 per row. Nothing
    * new shuffles.
    *
    * @return (idCol, cluster_id, split) — every member of a cluster
    *         carries the same split
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
      bounds: Seq[(String, String)], restLabel: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Int = 10000,
      checkpointDir: Option[String] = None): DataFrame =
    Corpus.splitByHash(
      nearDupClusters(df, idCol, textCol, n, threshold, maxDf, checkpointDir),
      "cluster_id", bounds, restLabel)
      .select(col(idCol), col("cluster_id"), col("split"))

  /** [[nearDupClusters]] with the O(log n)-round star-contraction solver —
    * same output contract, chosen when clusters may chain deeply (e.g.
    * templated boilerplate where A~B~C~… links spans of documents).
    *
    * `checkpointDir` reaches the per-round solver checkpoints (see
    * [[connectedComponents]]): set it on a long-lived cluster so a lost
    * executor can't force recomputation of every contraction round. */
  def nearDupClustersStar(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Int = 10000,
      checkpointDir: Option[String] = None): DataFrame = {
    val pairs = ngramJaccard(df, idCol, textCol, n, threshold, maxDf)
    connectedComponentsStar(df.select(col(idCol)), idCol, pairs,
      checkpointDir = checkpointDir)
      .select(col("id").as(idCol), col("cluster").as("cluster_id"),
        (col("id") === col("cluster")).as("is_canonical"))
  }

  /** Integer minhash hash family, Kirsch-Mitzenmacher construction:
    * h_i(s) = h1(s) + i·h2(s), with h1/h2 the two 14-hex-char halves of
    * ONE md5 (each < 2^56, so h1 + 11·h2 < 2^60 — no 64-bit overflow,
    * which matters because the SQL oracle's BIGINT errors on overflow
    * where Spark's long would silently wrap). One digest per shingle
    * instead of k: the dominant cost of minhash at corpus scale is the
    * hashing pass, and two-hash derivation is provably as good a minwise
    * family as k independent hashes (Kirsch & Mitzenmacher 2006).
    */
  private[ops] def minhashH1(shingle: Column): Column =
    graft.functions.Md5PrefixLong.md5_prefix_long(shingle, 14)
  private[ops] def minhashH2(shingle: Column): Column =
    graft.functions.Md5PrefixLong.md5_slice_long(shingle, 15, 14)

  /** Largest k for which h1 + (k-1)·h2 cannot overflow a signed 64-bit
    * long (h1, h2 < 2^56 ⇒ sum < 2^56·(k+1); 2^63/2^56 = 128). */
  val MinhashMaxK = 128

  /** minhash signature: component i = min over shingles of h1 + i·h2.
    *
    * Shaped so the md5 really is paid once per shingle: a naive
    * `array_min(transform(sh, s => h1 + i*h2))` per component re-digests
    * every shingle for every i (HOFs are interpreted, no CSE). Here one
    * transform materializes the (h1, h2) pairs, then a single fold keeps
    * a k-wide running-min array — 2 substring parses of 1 digest per
    * shingle, k cheap integer ops each. */
  def minhashSignature(text: Column, n: Int, k: Int): Column = {
    require(k <= MinhashMaxK,
      s"k=$k would overflow the h1 + i*h2 derivation (max $MinhashMaxK); " +
        "Spark's long wraps silently while the oracle's BIGINT errors")
    val pairs = transform(shingles(text, n),
      s => struct(minhashH1(s).as("h1"), minhashH2(s).as("h2")))
    val idx = sequence(lit(0L), lit((k - 1).toLong))
    val mins = aggregate(
      pairs,
      array((0 until k).map(_ => lit(Long.MaxValue)): _*),
      (acc, p) => zip_with(acc, idx,
        (m, i) => least(m, p("h1") + i * p("h2"))))
    // empty shingle set ⇒ null components (the pre-fold form's
    // array_min-of-empty semantics)
    transform(mins, m => when(m === Long.MaxValue, lit(null)).otherwise(m))
  }

  /** LSH candidate pairs: signatures banded `bands` × `rowsPerBand`; docs
    * sharing any full band become a candidate pair.
    *
    * Computed over shingle ROWS: explode once, ONE md5 per shingle (the
    * k hash components derive from its two halves — [[minhashH1]]),
    * take the k mins as grouped aggregates (map-side partials, one
    * shuffle on doc id), band, join inside buckets. Never all-pairs, and
    * no per-row HOF re-evaluation — the shape that holds at 100 TB.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 3): DataFrame =
    minhashLshFromShingles(shingleRows(df, idCol, textCol, n),
      bands, rowsPerBand)

  /** [[minhashLsh]] over pre-computed (doc, shingle) rows — the seam that
    * lets a caller (e.g. [[minhashLshVerified]]) pay the corpus
    * tokenize+shingle scan once and feed several stages from it. */
  private[ops] def minhashLshFromShingles(shRows: DataFrame,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand
    require(k <= MinhashMaxK,
      s"bands*rowsPerBand=$k would overflow the h1 + i*h2 derivation " +
        s"(max $MinhashMaxK)")
    val hashed = shRows.select(
      col("doc"),
      minhashH1(col("shingle")).as("__h1"),
      minhashH2(col("shingle")).as("__h2"))
    val mins = (0 until k).map(i =>
      min(col("__h1") + lit(i.toLong) * col("__h2")).as(s"__s$i"))
    val sig = hashed.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
    val banded = sig.select(col("doc"),
      posexplode(array((0 until bands).map { b =>
        concat_ws("|", (0 until rowsPerBand).map(r =>
          col(s"__s${b * rowsPerBand + r}").cast("string")): _*)
      }: _*)).as(Seq("band", "bsig")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .distinct()
  }

  /** Per-doc minhash signatures in the STORED layout (idCol, sig
    * array<long>[k]) — the incremental-dedup contract: sign each batch
    * once on arrival, persist the signature table next to the corpus,
    * and later batches dedupe against it via
    * [[minhashLshIncremental]] without ever re-reading (let alone
    * re-shingling) 100 TB of history. Same construction as
    * [[minhashLsh]]: one md5 per shingle, grouped running-mins with
    * map-side partials. Docs with no shingles are ABSENT (there is
    * nothing to match them on).
    */
  def minhashSignatureTable(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 12): DataFrame = {
    require(k <= MinhashMaxK,
      s"k=$k would overflow the h1 + i*h2 derivation (max $MinhashMaxK)")
    val hashed = shingleRows(df, idCol, textCol, n).select(
      col("doc"),
      minhashH1(col("shingle")).as("__h1"),
      minhashH2(col("shingle")).as("__h2"))
    val mins = (0 until k).map(i =>
      min(col("__h1") + lit(i.toLong) * col("__h2")).as(s"__s$i"))
    hashed.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
      .select(col("doc").as(idCol),
        array((0 until k).map(i => col(s"__s$i")): _*).as("sig"))
  }

  /** LSH candidate pairs straight from a STORED signature table — the
    * spelling a pipeline uses when the corpus is already signed
    * ([[minhashSignatureTable]]), so proposing pairs never re-shingles:
    * band the signatures and self-join the buckets. Identical pair set
    * to [[minhashLsh]] over the same docs. */
  def minhashLshFromSigs(sigs: DataFrame, idCol: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = bandedFromSigs(sigs, idCol, bands, rowsPerBand)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .distinct()
  }

  /** Band explode over stored-layout signatures: same band string as
    * [[minhashLshFromShingles]] builds inline, so stored and fresh
    * signatures join in one bucket space. */
  private def bandedFromSigs(sigs: DataFrame, idCol: String,
      bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(col(idCol).as("doc"),
      posexplode(array((0 until bands).map { b =>
        concat_ws("|", (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1).cast("string")): _*)
      }: _*)).as(Seq("band", "bsig")))

  /** Incremental near-dup candidates: a NEW batch against an already-
    * signed history — the continuous-crawl shape. Only the new batch is
    * shingled and hashed; the history side joins as its (small, k longs
    * per doc) stored signature table. Candidates are banded bucket pairs
    * with at least one new side: new-new within the batch plus new-old
    * against history. Old-old pairs are never generated — they were
    * found when those docs arrived, and regenerating them would make
    * every daily batch pay for the whole corpus again.
    *
    * At scale the new side is tiny next to history, so Catalyst
    * broadcasts its banded buckets into the history scan — the join
    * never shuffles the signature table.
    *
    * @param historySigs (idCol, sig array<long>[bands*rowsPerBand]) as
    *        produced by [[minhashSignatureTable]]
    */
  def minhashLshIncremental(newDocs: DataFrame, idCol: String, textCol: String,
      historySigs: DataFrame, n: Int = 3, bands: Int = 4,
      rowsPerBand: Int = 3): DataFrame = {
    val k = bands * rowsPerBand
    val newSigs = minhashSignatureTable(newDocs, idCol, textCol, n, k)
    val fresh = bandedFromSigs(newSigs, idCol, bands, rowsPerBand)
    val all = bandedFromSigs(
      newSigs.unionByName(historySigs.select(col(idCol), col("sig"))),
      idCol, bands, rowsPerBand)
    fresh.as("a").join(all.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc") =!= col("b.doc"))
      .select(least(col("a.doc"), col("b.doc")).as("d1"),
        greatest(col("a.doc"), col("b.doc")).as("d2"))
      .distinct()
  }

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS selection
    * rule): hash every positional token k-gram, slide a w-hash window,
    * and keep the window minimum with ties to the RIGHTMOST position —
    * the guarantee is every shared substring of length ≥ w+k-1 tokens
    * shares at least one selected fingerprint, at ~2/(w+1) storage of
    * the full hash set. The robust local-similarity fingerprint that
    * [[duplicateSpans]]' every-window scan trades storage for.
    *
    * Engine-exactness: the tie rule is folded INTO the integer —
    * `v = h·2^20 + (2^20-1-pos)` (h = 36 md5 bits), so a plain window
    * MIN picks (min hash, max position) and the fingerprint recovers as
    * `v >> 20`. Positions therefore must stay under 2^20 grams per doc
    * (a million tokens — far past any sane document; chunk longer ones
    * upstream).
    *
    * Shape at scale: map-only positional gram build, ONE window
    * partitioned by the data-scaled doc id, distinct + one aggregate.
    * Docs shorter than w grams keep their global-min hash (pos 1's
    * truncated window), so every non-empty doc fingerprints.
    *
    * @return (idCol, n_fingerprints, fp_md5) — count and an
    *         order-independent digest of the selected hash set
    */
  /** The selected (doc, fp) fingerprint rows — the building block
    * [[winnowFingerprints]] digests and [[winnowPairs]] joins. */
  def winnowRows(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val toks = docs.select(col(idCol).as("doc"), tokens(col(textCol)).as("__ws"))
    val gramExpr = expr(
      s"""transform(sequence(1, size(__ws) - ${k - 1}),
         |  i -> concat_ws(' ', ${(0 until k).map(j => s"element_at(__ws, i + $j)").mkString(", ")}))""".stripMargin)
    val grams = toks
      .filter(size(col("__ws")) >= k)
      .select(col("doc"), posexplode(gramExpr).as(Seq("p0", "gram")))
      .select(col("doc"), (col("p0") + 1).as("pos"),
        graft.functions.Md5PrefixLong
          .md5_prefix_long(col("gram"), 9).as("h"))
      .withColumn("v",
        col("h") * lit(1048576L) + (lit(1048575L) - col("pos")))
    val byDoc = Window.partitionBy(col("doc"))
    grams
      .withColumn("__n", count(lit(1)).over(byDoc))
      .withColumn("__minv", min(col("v")).over(
        byDoc.orderBy(col("pos")).rowsBetween(0, w - 1)))
      .filter(col("pos") <= greatest(col("__n") - (w - 1), lit(1L)))
      .select(col("doc"), shiftright(col("__minv"), 20).as("fp"))
      .distinct()
  }

  /** Near-dup candidate pairs through the fingerprint INVERTED INDEX:
    * docs sharing ≥ `minShared` selected fingerprints. The same
    * df-capped discipline as [[ngramJaccard]] — a fingerprint present
    * in more than `maxDf` docs (boilerplate) is dropped via a
    * partial-aggregated count + broadcast anti-join BEFORE the
    * self-join, so no bucket goes quadratic on a stop-fingerprint.
    * Winnowing's coverage theorem makes the recall floor explicit:
    * any pair sharing a run of ≥ w+k-1 tokens (with a surviving
    * fingerprint) appears.
    */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, minShared: Long = 2, maxDf: Long = 50): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    val fp = winnowRows(docs, idCol, textCol, k, w).localCheckpoint(true)
    val frequent = fp.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf).select(col("fp"))
    val pruned = fp.join(broadcast(frequent), Seq("fp"), "left_anti")
    pruned.as("a").join(pruned.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame =
    winnowRows(docs, idCol, textCol, k, w).groupBy(col("doc"))
      .agg(count(lit(1)).as("n_fingerprints"),
        md5(array_join(
          expr("transform(array_sort(collect_list(fp)), x -> CAST(x AS STRING))"),
          ",").cast("binary")).as("fp_md5"))
      .withColumnRenamed("doc", idCol)

  /** Ordered-ingest near-dup dedup — the continuously-ingesting
    * pipeline's contract, driven here over id-ranged batches arriving
    * in order: a document is DROPPED iff a verified near-dup (banded
    * LSH candidate AND exact Jaccard ≥ threshold over full shingle
    * sets) exists among ANY earlier-ingested document — survivor or
    * not — including earlier ids in its own batch. This greedy
    * arrival-order rule is deliberately NOT batch keep-min-per-cluster:
    * a cluster connected only through later arrivals never retro-drops
    * an already-accepted doc, so accepted ids are immutable — the
    * property an incremental ingest needs. Because candidates and
    * verification depend only on content, the result is INDEPENDENT of
    * the batch partitioning: any split of the id order yields the same
    * survivor set as one pass (the oracle checks the one-pass form).
    *
    * Per batch: only the new docs are shingled and signed; history
    * joins as its stored (signature, shingle-set) table; the store
    * grows append-only and is localCheckpoint'd each round so lineage
    * stays flat over an unbounded ingest history.
    *
    * @return surviving ids (one column, `idCol`)
    */
  def ingestDedup(docs: DataFrame, idCol: String, textCol: String,
      batchBounds: Seq[Long], n: Int = 3, bands: Int = 4,
      rowsPerBand: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(batchBounds == batchBounds.sorted,
      s"batchBounds must be ascending, got $batchBounds")
    val k = bands * rowsPerBand
    val los = Long.MinValue +: batchBounds
    val his = batchBounds :+ Long.MaxValue
    var store: DataFrame = null // (idCol, sig, shingles) of ALL ingested
    var survivors: DataFrame = null
    require(k <= MinhashMaxK,
      s"k=$k would overflow the h1 + i*h2 derivation (max $MinhashMaxK)")
    for ((lo, hi) <- los.zip(his)) {
      val batch = docs.filter(col(idCol) >= lo && col(idCol) < hi)
      // ONE tokenize+shingle pass per batch: the checkpointed shingle
      // sets feed both the signature derivation (map-only explode of
      // the stored arrays) and the verify join — signing via
      // minhashSignatureTable would re-shingle the batch text
      val shSets = shingleRows(batch, idCol, textCol, n)
        .groupBy(col("doc"))
        .agg(collect_set(col("shingle")).as("shingles"))
        .localCheckpoint(true)
      val hashed = shSets
        .select(col("doc"), explode(col("shingles")).as("shingle"))
        .select(col("doc"),
          minhashH1(col("shingle")).as("__h1"),
          minhashH2(col("shingle")).as("__h2"))
      val mins = (0 until k).map(i =>
        min(col("__h1") + lit(i.toLong) * col("__h2")).as(s"__s$i"))
      val newSigs = hashed.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
        .select(col("doc").as(idCol),
          array((0 until k).map(i => col(s"__s$i")): _*).as("sig"))
      val allSigs =
        if (store == null) newSigs
        else newSigs.unionByName(store.select(col(idCol), col("sig")))
      val cands = bandedFromSigs(newSigs, idCol, bands, rowsPerBand).as("a")
        .join(bandedFromSigs(allSigs, idCol, bands, rowsPerBand).as("b"),
          col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
            col("b.doc") < col("a.doc"))
        .select(col("b.doc").as("e"), col("a.doc").as("d")).distinct()
      val eSets =
        (if (store == null) shSets.select(col("doc").as(idCol), col("shingles"))
         else store.select(col(idCol), col("shingles"))
           .unionByName(shSets.select(col("doc").as(idCol), col("shingles"))))
        .select(col(idCol).as("e"), col("shingles").as("esh"))
      val dropped = cands
        .join(shSets.select(col("doc").as("d"), col("shingles").as("dsh")), "d")
        .join(eSets, "e")
        .withColumn("__common",
          size(array_intersect(col("dsh"), col("esh"))).cast("long"))
        .filter(col("__common").cast("double") /
          (size(col("dsh")) + size(col("esh")) - col("__common")).cast("double")
          >= threshold)
        .select(col("d")).distinct()
      val kept = batch.select(col(idCol))
        .join(dropped.withColumnRenamed("d", idCol), Seq(idCol), "left_anti")
      survivors =
        (if (survivors == null) kept else survivors.unionByName(kept))
          .localCheckpoint(true)
      val newStore = newSigs
        .join(shSets.withColumnRenamed("doc", idCol), idCol)
      store =
        (if (store == null) newStore else store.unionByName(newStore))
          .localCheckpoint(true)
    }
    survivors
  }

  /** The production two-stage near-dup pipeline: banded minhash PROPOSES
    * candidate pairs (cheap, recall tuned by bands × rowsPerBand), exact
    * Jaccard over ONLY those pairs DISPOSES (precision 1.0 at the
    * threshold). Verification work is bounded by Σ over candidate pairs
    * of |shingles(d1)| — never the corpus cross product, and unlike the
    * df-capped [[ngramJaccard]] the verified similarity here is over the
    * FULL shingle sets (no cap needed: LSH already bounded the pairs).
    */
  /** ALL LSH candidate pairs with their exact Jaccard (no threshold):
    * the propose half of [[minhashLshVerified]] plus the verify score,
    * for consumers that need BOTH sides of the cut — e.g.
    * [[contrastivePairs]]' hard negatives are exactly the candidates
    * that FAIL verification. Candidates sharing no shingle at all
    * (pure minhash collisions) drop out with the inner verify join.
    *
    * ONE tokenize+shingle pass feeds all four consumers (LSH propose,
    * both sides of the verify self-join, and the size aggregate) —
    * uncached, each reference would re-scan and re-shingle the whole
    * corpus. The cache's lifetime is bounded to THIS call: the (small)
    * scored-pair result is materialized executor-local and the
    * corpus-wide shingle cache released, so repeated calls don't
    * accumulate pinned scans waiting on LRU eviction.
    *
    * `materialize` is the multi-consumer dial: true (the default — this
    * method exists for callers that consume both sides of the cut) pays
    * the persist + eager-checkpoint barrier once so N downstream
    * consumers never re-shingle; false returns the lazy composition for
    * a caller that evaluates the result exactly once (e.g.
    * [[minhashLshVerified]] → filter → one action) — there the barrier
    * is pure overhead: the single evaluation re-reads the shingle
    * projection per plan reference, which is a narrow map-only re-scan,
    * cheaper than writing the corpus-wide shingle set to block storage
    * first (measured: the r4 always-materialize spelling nearly doubled
    * the single-consumer verified path's wall-clock).
    */
  def minhashCandidatesScored(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
      materialize: Boolean = true): DataFrame = {
    val sh0 = shingleRows(df, idCol, textCol, n)
    val sh = if (materialize)
      sh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else sh0
    val cands = minhashLshFromShingles(sh, bands, rowsPerBand)
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("nsh"))
    val common = cands
      .join(sh.select(col("doc").as("d1"), col("shingle")), "d1")
      .join(sh.select(col("doc").as("d2"), col("shingle")), Seq("d2", "shingle"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("common"))
    val scored = common
      .join(sizes.select(col("doc").as("d1"), col("nsh").as("na")), "d1")
      .join(sizes.select(col("doc").as("d2"), col("nsh").as("nb")), "d2")
      .withColumn("jaccard", col("common").cast("double") /
        (col("na") + col("nb") - col("common")).cast("double"))
      .select(col("d1"), col("d2"), col("jaccard"))
    if (materialize) {
      val out = scored.localCheckpoint(true)
      sh.unpersist()
      out
    } else scored
  }

  /** Exact Jaccard for a GIVEN candidate pair set — the verify stage of
    * a COMPOSED pipeline whose pairs were proposed elsewhere (e.g.
    * [[minhashLshIncremental]]'s touching-the-new-batch candidates).
    * Same arithmetic as [[minhashCandidatesScored]]'s verify; the
    * shingle scan is restricted by a semi-join to docs that actually
    * appear in a pair, so verify cost is O(pairs + touched docs), not
    * O(corpus) — the property a daily increment needs when pairs touch
    * a sliver of history.
    *
    * @param pairs (d1, d2) candidate rows
    * @return (d1, d2, jaccard); pairs sharing no shingle drop out
    */
  def scorePairs(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, n: Int = 3): DataFrame = {
    val ids = pairs.select(col("d1").as(idCol))
      .unionByName(pairs.select(col("d2").as(idCol))).distinct()
    val sh = shingleRows(docs.join(ids, Seq(idCol), "left_semi"),
      idCol, textCol, n)
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("nsh"))
    val common = pairs.select(col("d1"), col("d2"))
      .join(sh.select(col("doc").as("d1"), col("shingle")), "d1")
      .join(sh.select(col("doc").as("d2"), col("shingle")), Seq("d2", "shingle"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc").as("d1"), col("nsh").as("na")), "d1")
      .join(sizes.select(col("doc").as("d2"), col("nsh").as("nb")), "d2")
      .withColumn("jaccard", col("common").cast("double") /
        (col("na") + col("nb") - col("common")).cast("double"))
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  def minhashLshVerified(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.5): DataFrame =
    minhashCandidatesScored(df, idCol, textCol, n, bands, rowsPerBand,
      materialize = false)
      .filter(col("jaccard") >= threshold)

  /** Candidate-generation RECALL report for MinHash-LSH against exact
    * n-gram-Jaccard ground truth at the same shingle settings: ONE row
    * (n_true, n_candidates, n_hit, recall_ppm) with recall_ppm =
    * n_hit·10⁶ DIV n_true — integer, engine-exact. The dedup-side
    * analogue of [[Similarity.recallAtK]]: the number that sizes
    * (bands, rowsPerBand) against the LSH S-curve before committing a
    * corpus-wide near-dup run.
    *
    * Scale shape: both sides are the existing scale-safe pair
    * pipelines; the comparison is a full-outer equi-join on the pair
    * key plus one aggregate — pair-set-sized, never corpus-sized, and
    * all three counts fold in the same pass (no 1-row cross join).
    */
  def minhashRecall(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Int = 10000,
      bands: Int = 4, rowsPerBand: Int = 3): DataFrame = {
    val truth = ngramJaccard(df, idCol, textCol, n, threshold, maxDf)
      .select(col("d1"), col("d2")).withColumn("__t", lit(1L))
    val cand = minhashLsh(df, idCol, textCol, n, bands, rowsPerBand)
      .select(col("d1"), col("d2")).withColumn("__c", lit(1L))
    truth.join(cand, Seq("d1", "d2"), "full_outer")
      .agg(sum(coalesce(col("__t"), lit(0L))).as("n_true"),
        sum(coalesce(col("__c"), lit(0L))).as("n_candidates"),
        sum(when(col("__t").isNotNull && col("__c").isNotNull, 1L)
          .otherwise(0L)).as("n_hit"))
      .withColumn("recall_ppm",
        when(col("n_true") === 0, lit(0L))
          .otherwise(expr("n_hit * 1000000 DIV n_true")))
  }

  /** Contrastive training-pair mining for embedding models, from the
    * dedup machinery the corpus already runs: POSITIVES are the verified
    * near-dup pairs, HARD NEGATIVES are the LSH candidates that failed
    * exact-Jaccard verification (textually similar, not duplicates —
    * the pairs a trained encoder must learn to separate), and RANDOM
    * NEGATIVES pair md5-adjacent docs inside 16^bucketHexChars hash
    * buckets (deterministic, engine-reproducible, bounded-cardinality
    * windows — never a global sort), minus any pair the LSH already
    * surfaced.
    *
    * `bucketHexChars` sizes the random-negative buckets: each bucket is
    * one window sort of ~N/16^k docs. The DEFAULT (0) is SELF-SIZING:
    * one cheap corpus count picks the smallest k whose 16^k buckets
    * average ≤ `bucketTargetRows` docs — ~10⁸ docs derive k = 2,
    * ~10¹¹ derive k = 4 — so the default stays scale-safe without the
    * caller knowing the knob; pass k explicitly to pin it (the
    * registry pins 4 so the generated oracle's substr width matches).
    * Note k is part of the RESULT contract, not just task granularity:
    * adjacent pairs that straddle a bucket boundary are dropped
    * (≤ 16^k of ~N pairs — vanishing, but a different k is a
    * different pair set, which is why the oracle must mirror it).
    *
    * @return (d1, d2, label 1|0, kind near_dup|hard|random)
    */
  def contrastivePairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.5, bucketHexChars: Int = 0,
      bucketTargetRows: Long = 4000000L): DataFrame = {
    require(bucketHexChars >= 0 && bucketHexChars <= 8,
      s"bucketHexChars must be 0 (self-size) or in [1, 8], got $bucketHexChars")
    require(bucketTargetRows >= 1,
      s"bucketTargetRows must be >= 1, got $bucketTargetRows")
    val kBucket =
      if (bucketHexChars > 0) bucketHexChars
      else autoBucketHexChars(docs.count(), bucketTargetRows)
    val scored = minhashCandidatesScored(docs, idCol, textCol, n, bands,
      rowsPerBand)
    val pos = scored.filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), lit(1).as("label"),
        lit("near_dup").as("kind"))
    val hard = scored.filter(col("jaccard") < threshold)
      .select(col("d1"), col("d2"), lit(0).as("label"), lit("hard").as("kind"))
    val h = md5(col(idCol).cast("string").cast("binary"))
    val w = Window.partitionBy(col("__b")).orderBy(col("__h"), col("__id"))
    val rand = docs.select(col(idCol).as("__id"), h.as("__h"))
      .withColumn("__b", substring(col("__h"), 1, kBucket))
      .withColumn("__next", lead(col("__id"), 1).over(w))
      .filter(col("__next").isNotNull)
      .select(least(col("__id"), col("__next")).as("d1"),
        greatest(col("__id"), col("__next")).as("d2"))
      .join(scored.select(col("d1"), col("d2")), Seq("d1", "d2"), "left_anti")
      .select(col("d1"), col("d2"), lit(0).as("label"),
        lit("random").as("kind"))
    pos.unionByName(hard).unionByName(rand)
  }

  /** Smallest md5-prefix length k (1..8) whose 16^k buckets hold at
    * most `targetRows` docs each on average — the self-sizing default
    * for [[contrastivePairs]]' random-negative windows. Exact power
    * arithmetic (1 << 4k); a corpus too big even for 16^8 buckets caps
    * at 8, the md5-prefix limit. */
  private[ops] def autoBucketHexChars(n: Long, targetRows: Long): Int =
    (1 to 8).find { k =>
      // floor-average per bucket ≤ target; division form cannot
      // overflow for any (n, targetRows) pair
      n / (1L << (4 * k)) <= targetRows
    }.getOrElse(8)

  /** Per-doc 64-bit simhash as a table (explode + grouped bit votes — the
    * scalable form of [[simhash64]]; identical values).
    *
    * 64-bit, not a demo width: the signature space must be large enough
    * that unrelated documents don't collide (2^16 signatures collapse on
    * any real corpus, and the 4-bit pigeonhole blocks of a 16-bit
    * signature have 16 distinct join values — catastrophic skew). The
    * token value is md5's first 16 hex chars assembled from two 32-bit
    * halves with bitwise ops, so the result is a full signed 64-bit
    * pattern without ANSI overflow.
    */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc"), array_distinct(tokens(col(textCol))).as("__ts"))
    val tv = toks.filter(size(col("__ts")) > 0)
      .select(col("doc"), explode(col("__ts")).as("tok"))
    val vals = tv.select(col("doc"), tokenVal64(col("tok")).as("v"))
    val bitSums = (0 until 64).map { j =>
      sum(when(bitTest(col("v"), j), 1L).otherwise(-1L)).as(s"__b$j")
    }
    val bits = vals.groupBy(col("doc")).agg(bitSums.head, bitSums.tail: _*)
    val sig = bits.select(col("doc"),
      (0 until 64).map(j =>
        when(col(s"__b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ bitwiseOR _).as("sh"))
    // token-less docs hash to 0 — exactly what simhash64 yields for them;
    // dropping them instead would break the "identical values" contract
    // and silently lose rows from the signature table
    toks.select(col("doc")).join(sig, Seq("doc"), "left")
      .select(col("doc"), coalesce(col("sh"), lit(0L)).as("sh"))
  }

  /** 64-bit token hash: md5 hex chars 1-8 are the high word, 9-16 the low
    * word; `hi << 32 | lo` stays pure bit assembly (no additive overflow
    * under ANSI). */
  private def tokenVal64(t: Column): Column =
    graft.functions.Md5PrefixLong.md5_slice_long(t, 1, 16)

  /** Bit j of a signed 64-bit value (sign-safe — no arithmetic shift). */
  private def bitTest(v: Column, j: Int): Column =
    v.bitwiseAND(lit(1L << j)) =!= 0L

  /** 64-bit simhash over distinct tokens (HOF form — compact reference
    * implementation; [[simhashTable]] is the grouped-aggregate form that
    * scales). Bit j of the signature is the sign of the per-bit vote sum.
    * Near-duplicate = hamming(simhash) small.
    */
  def simhash64(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val bitSums = (0 until 64).map { j =>
      aggregate(toks, lit(0L), (acc, t) =>
        acc + when(bitTest(tokenVal64(t), j), 1L).otherwise(-1L))
    }
    bitSums.zipWithIndex.map { case (s, j) =>
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Simhash near-dup pairs with hamming distance ≤ maxHamming, via
    * pigeonhole blocking: the 64 bits split into maxHamming+1 blocks —
    * two signatures within the hamming budget MUST agree on at least one
    * whole block, so candidates come from an equi-join on
    * (blockIndex, blockValue) and are then verified exactly. Zero recall
    * loss, never all-pairs, and with 16-bit blocks the join key has 2^16
    * distinct values per block index — no skew collapse — the same shape
    * at any corpus size.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val s = simhashTable(df, idCol, textCol)
    val nBlocks = maxHamming + 1
    val bits = 64
    val blockSize = math.ceil(bits.toDouble / nBlocks).toInt
    // maxHamming=0 makes blockSize=64 and (1L << 64) wraps to 1L,
    // zeroing the mask and degenerating the block join to all-pairs
    val blockMask = if (blockSize >= 64) -1L else (1L << blockSize) - 1
    val blocked = s.select(col("doc"), col("sh"),
      posexplode(array((0 until nBlocks).map { b =>
        // arithmetic shiftright sign-extends; the mask strips it
        shiftright(col("sh"), b * blockSize).bitwiseAND(lit(blockMask))
      }: _*)).as(Seq("blk_i", "blk_v")))
    blocked.as("a").join(blocked.as("b"),
        col("a.blk_i") === col("b.blk_i") && col("a.blk_v") === col("b.blk_v") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Near-dup pairs among arbitrary ≤64-bit FINGERPRINTS at hamming
    * distance ≤ `maxHamming` — [[simhashPairs]]'s pigeonhole block
    * index generalized to any fingerprint column (image dHash, audio
    * energy hash, video frame hashes): with maxHamming+1 blocks, any
    * pair within the budget matches exactly in at least one block, so
    * the index join is exact-recall and the all-pairs product never
    * exists. One narrow explode (maxHamming+1 rows per doc), one
    * equi-join on (block index, block value), a codegen'd XOR popcount
    * verify.
    */
  def fingerprintPairs(fps: DataFrame, idCol: String, fpCol: String,
      bits: Int, maxHamming: Int = 3): DataFrame = {
    require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")
    require(maxHamming >= 0 && maxHamming < bits,
      s"maxHamming must be in [0, bits), got $maxHamming")
    val nBlocks = maxHamming + 1
    val blockSize = math.ceil(bits.toDouble / nBlocks).toInt
    // bits=64 with maxHamming=0 gives blockSize=64; (1L << 64) wraps to
    // 1L so the mask would be 0 and every row would share block value 0
    // — a silent n² join. A full-width mask keeps the index exact.
    val blockMask = if (blockSize >= 64) -1L else (1L << blockSize) - 1
    val blocked = fps.select(col(idCol).as("doc"), col(fpCol).as("fp"),
      posexplode(array((0 until nBlocks).map { b =>
        shiftright(col(fpCol), b * blockSize).bitwiseAND(lit(blockMask))
      }: _*)).as(Seq("blk_i", "blk_v")))
    blocked.as("a").join(blocked.as("b"),
        col("a.blk_i") === col("b.blk_i") && col("a.blk_v") === col("b.blk_v") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding near-dup pairs by cosine ≥ threshold within a blocking key
    * (label, cluster id, LSH bucket, …). The block join keeps the pair
    * count at Σ_b n_b² instead of n².
    *
    * The dot product is an explicit left-assoc sum over `dim` terms so the
    * float result is bit-identical to the SQL oracle.
    */
  def embeddingCosine(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, dim: Int, threshold: Double): DataFrame = {
    // norms precomputed per row below the join barrier: the blocked n²
    // stage pays one dot product per pair, not three
    val e = df.select(col(idCol).as("vid"), col(vecCol).as("v"),
      col(blockCol).as("blk"),
      sqrt(Similarity.dot(col(vecCol), col(vecCol), dim)).as("nrm"))
    val joined = e.as("a").join(e.as("b"),
      col("a.blk") === col("b.blk") && col("a.vid") < col("b.vid"))
    joined
      .withColumn("cos",
        Similarity.dot(col("a.v"), col("b.v"), dim) /
          (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.vid").as("d1"), col("b.vid").as("d2"), col("cos"))
  }

  /** Line-level corpus dedup (the C4/web-scale cleaner): drop every
    * occurrence of any line whose DOCUMENT frequency exceeds `maxDf` —
    * boilerplate (nav bars, cookie banners, license headers) repeats
    * across thousands of pages while real prose does not. Lines are
    * `delim`-separated spans; each surviving doc is reassembled in
    * original line order (docs whose lines are all boilerplate survive
    * with empty text, keeping the row count stable for downstream joins).
    *
    * Scale shape: explode to (doc, pos, line) — the ONLY full-width
    * pass — then the document-frequency count shuffles just distinct
    * (doc, line) pairs on the line hash. Lines with df > maxDf are a
    * tiny fraction of any real corpus (that is what "boilerplate" means),
    * so the filter join's build side stays broadcastable and the
    * reassembly groupBy(doc) is the one unavoidable second shuffle.
    * md5 stands in for the line text in the join key: 16 fixed bytes
    * through both shuffles instead of arbitrary-length line bodies.
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      delim: String, maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val lines = df
      .select(col(idCol), posexplode(
        split(col(textCol), java.util.regex.Pattern.quote(delim)))
        .as(Seq("__pos", "__line")))
      .withColumn("__h", md5(col("__line").cast("binary")))
      // feeds the df count AND the reassembly join — materialize the one
      // split+explode (same lifetime pattern as duplicateSpans)
      .localCheckpoint(true)
    val frequent = lines.select(col(idCol), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("__h"))
    lines.join(frequent, Seq("__h"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          e => e.getField("__line")),
        delim).as("clean_text"),
        count(lit(1)).as("kept_lines"))
      .join(df.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_lines"), lit(0L)).as("kept_lines"))
  }

  /** Blocked fuzzy record linkage (entity resolution over STRUCTURED
    * records — the fuzzy complement of the DSL's exact keyed merge):
    * candidate pairs come ONLY from an equality blocking key (never
    * all-pairs), scored by Levenshtein edit distance — Spark's native
    * codegen'd `levenshtein`, an exact integer, so any engine agrees
    * without float ceremony. The blocking contract is the scale story:
    * Σ_b n_b² pairs, with the block key (region + name prefix, phonetic
    * code, …) chosen by the caller to bound block sizes.
    *
    * @return matching pairs (d1, d2, dist) with d1 < d2, dist ≤ maxDist
    */
  def recordLinkage(df: DataFrame, idCol: String, blockCol: Column,
      nameCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val e = df.select(col(idCol).as("rid"), blockCol.as("__blk"),
      col(nameCol).as("__nm"))
    e.as("a").join(e.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.rid") < col("b.rid"))
      .withColumn("dist", levenshtein(col("a.__nm"), col("b.__nm")))
      .filter(col("dist") <= maxDist)
      .select(col("a.rid").as("d1"), col("b.rid").as("d2"),
        col("dist").cast("long").as("dist"))
  }

  /** [[recordLinkage]]'s scale path for `maxDist = 1` — deletion-
    * neighborhood blocking (the FastSS construction, Bocek et al. 2007):
    * every string within edit distance 1 of `s` shares at least one
    * member of {s} ∪ {s with one char deleted}, so generating the
    * |s|+1 deletion variants per record and equi-joining on
    * (block, variant) yields a candidate set that contains every true
    * pair and almost nothing else; one exact `levenshtein` per
    * candidate erases the false positives (e.g. transposed chars at
    * distance 2 that share two variants).
    *
    * The quadratic Σ_b n_b² scan becomes |s|+1 narrow rows per record
    * through one equi-join — on 600-record blocks of 18-char names this
    * is ~4.5M levenshtein calls reduced to the handful of near-matches.
    * Output contract identical to [[recordLinkage]] at maxDist = 1.
    */
  def recordLinkageFast(df: DataFrame, idCol: String, blockCol: Column,
      nameCol: String): DataFrame = {
    val e = df.select(col(idCol).as("rid"), blockCol.as("__blk"),
      col(nameCol).as("__nm"))
    val vars = e.select(col("rid"), col("__blk"), col("__nm"),
      explode(array_union(
        array(col("__nm")),
        expr("transform(sequence(1, length(__nm)), " +
          "i -> concat(left(__nm, i - 1), substr(__nm, i + 1)))"))).as("__v"))
    vars.as("a").join(vars.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.__v") === col("b.__v") &&
          col("a.rid") < col("b.rid"))
      .select(col("a.rid").as("d1"), col("b.rid").as("d2"),
        col("a.__nm").as("__n1"), col("b.__nm").as("__n2"))
      .distinct() // a pair can share several variants
      .withColumn("dist", levenshtein(col("__n1"), col("__n2")))
      .filter(col("dist") <= 1)
      .select(col("d1"), col("d2"), col("dist").cast("long").as("dist"))
  }

  /** Exact duplicated-span detection at fixed token-window granularity —
    * the scan-based core of Lee et al. 2021 ("Deduplicating Training
    * Data Makes Language Models Better"): any exactly-duplicated span of
    * ≥ `window` tokens necessarily contains a duplicated `window`-token
    * window, so scanning fixed windows finds every long duplicate (plus
    * boundary windows — granularity is `window` tokens, the documented
    * trade vs the paper's suffix array, which no shuffle engine runs).
    * A window counts as duplicated when it appears in MORE THAN ONE
    * document (cross-doc duplication, the training-leakage case).
    *
    * Scale shape: one explode to (doc, pos, window-md5) — linear in
    * token count, the only full-width pass; the duplicated-hash set is
    * one distinct + count shuffle on the 16-byte hash (never the window
    * text); the mark-back is an equi-join on the same hash and one
    * per-doc aggregate. Identical skeleton to [[dedupLines]], one level
    * down (token windows instead of lines).
    *
    * @return one row per doc: (idCol, n_windows, n_dup_windows,
    *         has_cross_dup)
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    // the window rows feed BOTH the frequency count and the mark-back
    // join — materialize the one explode instead of re-tokenizing and
    // re-hashing the corpus per consumer (the minhashCandidatesScored
    // lifetime pattern: executor-local blocks, narrow 16-byte rows)
    val wins = spanWindows(docs, idCol, textCol, window).localCheckpoint(true)
    val dupH = wins.select(col(idCol), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > 1)
      .select(col("__h"), lit(true).as("__dup"))
    val perDoc = wins.join(dupH, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        count(col("__dup")).as("n_dup_windows"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("has_cross_dup", col("n_dup_windows") > 0)
  }

  /** Exact removal spans for cross-document duplicated text — the full
    * Lee et al. 2021 ExactSubstr deliverable at token granularity: the
    * merged [start, end] token intervals covering every duplicated span
    * of ≥ `window` tokens. Stride-1 windows make this EXACT, not an
    * approximation: a duplicated span of m ≥ window tokens contains
    * m − window + 1 duplicated windows whose union covers precisely its
    * tokens, and a duplicated window IS a duplicated span of length
    * `window` — so "tokens under some duplicated window" equals "tokens
    * inside some duplicated span ≥ window". The paper computes this set
    * with a single-machine suffix array (reference-scale only); the
    * shuffle spelling is [[duplicateSpans]]'s one linear explode plus an
    * island merge.
    *
    * Scale shape: [[spanWindows]]'s explode (linear in token count,
    * 16-byte hashes), duplicated-hash set via partial-aggregated count,
    * equi-join mark-back, then a per-DOCUMENT window for the island
    * merge — the partition key is the doc id, so a task holds at most
    * one document's duplicated positions (bounded by document length,
    * never by corpus size: the lint-approved window class).
    *
    * @return one row per maximal duplicated span: (idCol, span_start,
    *         span_end, span_tokens), token positions 0-based inclusive
    */
  def duplicateSpanRanges(docs: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    val wins = spanWindows(docs, idCol, textCol, window)
    val dupH = wins.select(col(idCol), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > 1).select(col("__h"))
    val hits = wins.join(dupH, Seq("__h")).select(col(idCol), col("__p"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    hits
      // two intervals [p1, p1+w-1], [p2, p2+w-1] with p1 < p2 merge
      // (overlap or touch) iff p2 − p1 ≤ w; first row's null lag falls
      // through to 1 = new island
      .withColumn("__new",
        when(col("__p") - lag(col("__p"), 1).over(byDoc) <= window, lit(0L))
          .otherwise(lit(1L)))
      .withColumn("__isl", sum(col("__new")).over(byDoc))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("__p")).as("span_start"),
        (max(col("__p")) + window - 1).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** The ACTION step of span dedup (Lee et al. 2021's "deduplicating
    * training data" removal): rewrite each document with its maximal
    * duplicate spans ([[duplicateSpanRanges]]) excised at token
    * granularity. Docs with no duplicate span keep their ORIGINAL text
    * byte-for-byte (whitespace preserved); rewritten docs re-join the
    * surviving tokens with single spaces (the canonical form every
    * downstream token-level op in this engine already assumes).
    *
    * @return (idCol, clean_text, n_removed tokens)
    *
    * Scale shape: ranges fold to one per-doc array via a
    * partial-aggregated `collect_list` (bounded by doc length, never
    * corpus-keyed), the rewrite is a map-only higher-order filter over
    * the token array, and docs without ranges skip the rewrite via the
    * left join's null arm.
    */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    val ranges = duplicateSpanRanges(docs, idCol, textCol, window)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__rs"))
    docs.join(ranges, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__rs").isNull, col(textCol))
          .otherwise(array_join(
            filter(tokens(col(textCol)), (_, i) =>
              !exists(col("__rs"), r =>
                i.cast("long") >= r("span_start") &&
                  i.cast("long") <= r("span_end"))),
            " ")).as("clean_text"),
        coalesce(aggregate(col("__rs"), lit(0L),
            (acc, r) => acc + r("span_end") - r("span_start") + 1),
          lit(0L)).as("n_removed"))
  }

  /** `window`-token rolling windows of every doc as (idCol, __p, __h)
    * rows — md5 over the joined window text, the shared currency of
    * [[duplicateSpans]], [[spanHashTable]] and
    * [[duplicateSpansIncremental]]. */
  private def spanWindows(docs: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("__ws"))
    val m = greatest(size(col("__ws")).cast("long") - (window - 1), lit(0L))
    toks.select(col(idCol),
      explode(when(m > 0, sequence(lit(0L), m - 1))
        .otherwise(array().cast("array<bigint>"))).as("__p"),
      col("__ws"))
      .select(col(idCol), col("__p"),
        md5(array_join(slice(col("__ws"), (col("__p") + 1).cast("int"),
          lit(window)), " ").cast("binary")).as("__h"))
  }

  /** The stored memory of a continuous crawl for span-level dedup: the
    * DISTINCT window hashes of a corpus batch, one 16-byte value per
    * unique window. Append each arriving batch's table to storage and
    * feed the union to [[duplicateSpansIncremental]] — history text is
    * never re-tokenized. Distinct-by-construction is the contract the
    * incremental join relies on (no row multiplication through its
    * mark-back left join). */
  def spanHashTable(docs: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame =
    spanWindows(docs, idCol, textCol, window).select(col("__h")).distinct()

  /** [[duplicateSpans]] for the continuous-crawl shape (the span-level
    * sibling of [[minhashLshIncremental]]): a NEW batch is scanned once
    * and its windows are checked against (a) the stored history hash
    * table and (b) the other docs of the same batch. Only the new batch
    * is ever tokenized; at scale the new side is tiny next to history,
    * so its hash set broadcasts into the history scan side of the join
    * rather than shuffling the stored table.
    *
    * @param history distinct window hashes as produced by
    *        [[spanHashTable]] (single column `__h`)
    * @return one row per NEW doc: (idCol, n_windows, n_dup_windows,
    *         has_cross_dup) — dup = matches history OR another new doc
    */
  def duplicateSpansIncremental(newDocs: DataFrame, idCol: String,
      textCol: String, window: Int, history: DataFrame): DataFrame = {
    val wins = spanWindows(newDocs, idCol, textCol, window)
      .localCheckpoint(true) // two consumers, same reasoning as duplicateSpans
    val newDup = wins.select(col(idCol), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") > 1)
      .select(col("__h"), lit(true).as("__dn"))
    val hist = history.select(col("__h"), lit(true).as("__dh"))
    val perDoc = wins
      .join(newDup, Seq("__h"), "left")
      .join(hist, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        count(when(col("__dn") || col("__dh"), 1)).as("n_dup_windows"))
    newDocs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("has_cross_dup", col("n_dup_windows") > 0)
  }

  /** The end-to-end fuzzy-dedup DELIVERABLE, composing the verified
    * pipeline: minhash-LSH propose → exact-Jaccard verify → connected
    * components → keep exactly the minimum-id document of every
    * near-dup cluster. Returns the KEPT rows only — what a curation
    * pipeline actually writes out — as (idCol, n_absorbed), where
    * n_absorbed counts the discarded members of the kept doc's cluster
    * (0 for the overwhelming majority that paired with nothing).
    *
    * Each stage is its scale-correct shape: verified pairs come from
    * ONE shared shingle scan ([[minhashLshVerified]]), clustering is the
    * O(log n)-round star solver ([[connectedComponentsStar]]) so
    * templated boilerplate chains can't force diameter-many rounds, and
    * the keep filter + cluster-size count is one aggregate over the
    * (id, cluster) labels — the corpus text never enters the last stage.
    *
    * `checkpointDir` reaches the star solver's per-round checkpoints
    * (see [[connectedComponents]]) — the knob a long-lived cluster
    * needs, surfaced here so the deliverable entry point has it too.
    */
  def nearDupKeep(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.5,
      checkpointDir: Option[String] = None): DataFrame = {
    val pairs =
      minhashLshVerified(docs, idCol, textCol, n, bands, rowsPerBand, threshold)
    val cc = connectedComponentsStar(docs.select(col(idCol)), idCol, pairs,
      checkpointDir = checkpointDir)
    val sizes = cc.groupBy(col("cluster")).agg(count(lit(1)).as("__sz"))
    cc.filter(col("id") === col("cluster"))
      .join(sizes, Seq("cluster"))
      .select(col("id").as(idCol), (col("__sz") - 1).as("n_absorbed"))
  }

  /** The keep-one dedup deliverable with EXACT recall: prefix-filter
    * pairs ([[prefixFilterPairs]] — no false negatives at the
    * threshold) → large/small-star connected components → min-id
    * survivor with the absorbed count. The must-not-miss counterpart of
    * [[nearDupKeep]] (whose MinHash propose step can drop true pairs):
    * run THIS over the slice where a missed duplicate is the expensive
    * outcome, the MinHash form over the open web crawl.
    */
  def prefixDupKeep(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, thresholdPpm: Long = 500000L,
      checkpointDir: Option[String] = None): DataFrame =
    prefixDupKeepFromPairs(docs,
      prefixFilterPairs(docs, idCol, textCol, n, thresholdPpm), idCol,
      checkpointDir)

  /** [[prefixDupKeep]] over an already-discovered pair table (d1, d2) —
    * the form that reads a staged/persisted pair artifact instead of
    * re-running the prefix-filter join (see [[graft.ops.Staged]]). */
  def prefixDupKeepFromPairs(docs: DataFrame, pairs: DataFrame,
      idCol: String, checkpointDir: Option[String] = None): DataFrame = {
    val cc = connectedComponentsStar(docs.select(col(idCol)), idCol, pairs,
      checkpointDir = checkpointDir)
    val sizes = cc.groupBy(col("cluster")).agg(count(lit(1)).as("__sz"))
    cc.filter(col("id") === col("cluster"))
      .join(sizes, Seq("cluster"))
      .select(col("id").as(idCol), (col("__sz") - 1).as("n_absorbed"))
  }

  /** SemDeDup-style semantic dedup (the public construction from Abbas
    * et al. 2023, arXiv:2303.09540): cluster the embedding space with
    * spherical k-means, then look for cosine-near pairs WITHIN each
    * cluster only — the cluster count k is the dial that keeps the pair
    * stage at Σ_c n_c² instead of corpus². A vector is a semantic
    * duplicate iff a LOWER-id vector in its cluster is within the cosine
    * threshold (the paper keeps one arbitrary point per near-dup ball;
    * min-id makes that choice reproducible on any engine).
    *
    * Scale shape: k-means is `iters` broadcast + narrow-shuffle passes
    * ([[Similarity.kmeansCentroids]] — only k centers ever reach the
    * driver); the final assignment is one broadcast of the k centers
    * over the corpus; the pair stage is [[embeddingCosine]] blocked by
    * cluster id. Nothing driver-side grows with the corpus.
    *
    * @return one row per input vector: (vid, cid, is_dup)
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, iters: Int, threshold: Double): DataFrame = {
    val cents = Similarity.kmeansCentroids(emb, idCol, vecCol, dim, k, iters)
      .select(col("cid"), col("c_v"),
        sqrt(Similarity.dot(col("c_v"), col("c_v"), dim)).as("c_nrm"))
    // one broadcast pass: nearest center by cosine, ties → lowest cid
    // (norms precomputed below the join barrier on both sides)
    val v = emb.select(col(idCol).cast("long").as("vid"), col(vecCol).as("v"),
      sqrt(Similarity.dot(col(vecCol), col(vecCol), dim)).as("nrm"))
    val assigned = v.join(broadcast(cents), lit(true))
      .withColumn("cos",
        Similarity.dot(col("v"), col("c_v"), dim) /
          (col("nrm") * col("c_nrm")))
      .groupBy(col("vid"))
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"),
        first(col("v")).as("v")) // v is constant within the group
    val dups = embeddingCosine(assigned, "vid", "v", "cid", dim, threshold)
      .select(col("d2").as("vid")).distinct()
    assigned.select(col("vid"), col("cid"))
      .join(dups.withColumn("__dup", lit(true)), Seq("vid"), "left")
      .select(col("vid"), col("cid"),
        coalesce(col("__dup"), lit(false)).as("is_dup"))
  }
}
