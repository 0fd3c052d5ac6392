package graft.ops

import graft.Q
import graft.Q.table
import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-verifiable queries over the documents/embeddings corpus tables:
  * text analysis, the five dedup strategies, and ANN similarity search.
  * The DuckDB oracle SQL is GENERATED from the same constants
  * (hyperplane weights, markers, band layout) as the Spark side, so both
  * engines compute the same construction, not merely similar answers.
  */
object CorpusQueries {

  val Dim = 64

  /** The gopher-rules stop-word probe, adapted to the synthetic corpus's
    * vocabulary (it has no English function words; these are its highest-
    * document-frequency content words, so the rule discriminates instead
    * of rejecting everything). Shared by the Spark call and the oracle. */
  val GopherQueryStops: Seq[String] =
    Seq("data", "join", "scan", "filter", "table", "hash", "merge", "row")

  /** Shared oracle for the compaction PLAN and its APPLY gate: the
    * 64-shard manifest, the exclusive prefix sum in shard order, the
    * 4000-token next-fit bins. The apply query re-derives exactly this
    * from round-tripped files, so both sides pin one answer. */
  private val compactionOracleSql: String =
    """WITH t AS (
      |  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 64 AS INT) AS shard,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS toks
      |  FROM documents),
      |m AS (
      |  SELECT shard, CAST(SUM(toks) AS BIGINT) AS n_tokens
      |  FROM t GROUP BY shard),
      |r AS (
      |  SELECT shard, n_tokens,
      |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY shard
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS bef
      |  FROM m)
      |SELECT bef // 4000 AS out_id, COUNT(*) AS n_shards,
      |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
      |  MIN(shard) AS first_shard, MAX(shard) AS last_shard
      |FROM r GROUP BY 1 ORDER BY out_id""".stripMargin

  /** The funnel census's stop probe: deliberately NARROW (two words vs
    * [[GopherQueryStops]]' eight) so the natural-language rule actually
    * fires on this corpus and the funnel shows a multi-stage split —
    * with the full list every ≥40-word document passes it. Shared by
    * the Spark call and the oracle. */
  val FunnelStops: Seq[String] = Seq("data", "join")

  /** Stop-shingle document-frequency cap for the registered Jaccard query:
    * low enough that the cap is actually exercised on the 500-doc sf0.01
    * corpus (a tenth of the corpus), shared with the oracle SQL. */
  val JaccardMaxDf = 50

  /** BPE merge budget for the registered headline queries. The
    * documents word vocabulary is only 31 words (merge-exhausted at
    * 89), so the 512-merge gate trains on WINDOW-2 pretokens
    * ([[graft.functions.TextFunctions.pretokens]]): ~950 distinct
    * two-token chunks support >1000 merges, and the space becomes a
    * learnable symbol — the SentencePiece-style space-aware
    * vocabulary. Training runs the driver-local venue (the vocab is
    * far under [[Corpus.BpeDriverVocabMax]]); the oracle runs the
    * identical batched loop as a [[BpeMaxRounds]]-round chained-CTE
    * program. Shared by the Spark calls and the generated oracle.
    *
    * 192 (r11, down from r10's 512): the oracle gate only has to prove
    * ALGORITHM IDENTITY — merge-scale coverage lives in `BpeScaleSpec`
    * (8,192 merges driver venue + the distributed venue replaying the
    * identical chain). The 512 config cost each of the four
    * training-chain oracles 6.4 GB / ~32 s under the harness limits
    * (measured, 20× the suite median); 192 lands them at ~1.5 GB / 7 s
    * with the identity proof intact. */
  val BpeMerges = 192

  /** Pretokenization window for the registered BPE queries. */
  val BpeWindow = 2

  /** Synchronization-round cap shared by both engines (part of the
    * result contract — see Corpus.bpeCore). Sized from the measured
    * acceptance rate at this corpus: 192 merges land in ~45-48 rounds
    * at sf0.01; 56 leaves headroom, and a cap hit truncates
    * identically on both sides (the oracle memory cost is superlinear
    * in the round count, so the cap is also the RSS knob). */
  val BpeMaxRounds = 56

  /** Where the BPE gates stop and why — measured in round 10 (the
    * headline has since been re-sized to 192 for oracle RSS, see
    * [[BpeMerges]]; the ceiling analysis below still bounds the
    * architecture):
    *
    * The 512-merge configuration sits at the PRACTICAL CEILING of the
    * chained-CTE oracle architecture. DuckDB's cost for the training
    * chain is superlinear in (rounds × replace slots): the headline's
    * 112-round × 16-slot chain runs in ~1.6 min at sf0.01, a
    * 180 × 16 chain (1,024 merges at the same constants) in 7.3 min
    * at 29 GB RSS, a 130 × 32 chain in >7 min, and a 260 × 64 chain
    * (2,048 merges at window 3) never finished (>16 min CPU, 74 GB
    * RSS, killed). Wider candidate batches don't help: acceptance
    * saturates ~8 merges/round on this corpus (m = 32/64/128 measured
    * within one round of each other), so the round count — the thing
    * the oracle pays for superlinearly — cannot be bought down.
    *
    * The corpus itself also ceilings: window-2 pretokens
    * merge-EXHAUST at 1,045 (measured — every pretoken collapses to a
    * single unit), so ≥2,048 merges requires window-3 pretokens
    * (~7.5k distinct, capacity >4k) and lands at 252/230 rounds.
    *
    * Tokenizer-scale training is therefore gated in `BpeScaleSpec`:
    * 2,048 merges at window 3 / batch 64 on the driver venue (dense
    * ranks, distinct pairs, budget actually reached), with the
    * DISTRIBUTED venue replaying the identical acceptance chain at
    * the same configuration — the venue-equality axis the SQL oracle
    * provides for the headline sizes. */

  /** Budget/cap for the forced-DISTRIBUTED gate query
    * (`corpus_bpe_merges_dist`): the distributed venue pays one Spark
    * round-trip per synchronization round (~0.7 s of fixed scheduling
    * latency each on a tiny histogram — exactly why the driver venue
    * exists below [[Corpus.BpeDriverVocabMax]]), so its oracle-gated
    * run uses a budget sized for algorithm-EQUALITY proof, not
    * throughput: 32 merges ≈ 7–9 multi-accept rounds measured across
    * SFs, crossing ≥3 checkpoint barriers and exercising the
    * affected-slice rewrite. */
  val BpeDistMerges = 32

  /** Round cap for the forced-distributed gate query. */
  val BpeDistMaxRounds = 12

  /** Budget/cap for the stored-artifact APPLY gate
    * (`corpus_bpe_apply_stored`): merges learned on the history slice
    * (doc_id < 400) and replayed over the full corpus. 64 merges land
    * in ~14 rounds measured; 24 leaves headroom, and the oracle pays
    * 2 × 24 round chains (train + replay), so the budget is sized for
    * the train/apply-split proof, not merge count. */
  val BpeStoredMerges = 64

  /** Round cap for the stored-artifact apply gate. */
  val BpeStoredMaxRounds = 24

  /** Feature dim for the quality-model distillation gates — the
    * stand-in scorer's own 64 hashed buckets, + the bias component at
    * index 64 (scoreLinearHashed's map, so trained weights slot
    * straight back into its seam). */
  val QtDim = 64

  /** Jacobi damping for the distillation gates: step
    * 1/(damp·H_jj) per feature. 12 is just inside the stable band at
    * every SF (8 diverges, 16+ converges slower); the ratio is
    * SF-invariant because H and its diagonal both scale with the doc
    * count. */
  val QtDamp = 12

  /** Synchronous distillation rounds. 256 lands held-out agreement at
    * 96–99% across sf0.001/0.01/0.1 (prior ≈ 56%); rounds are
    * driver-side free on the Spark venue and (dim+1)-row joins in the
    * oracle, so the budget is sized by the oracle's plan depth, not
    * compute. */
  val QtRounds = 256

  /** md5(doc_id) hash-split bound: < bound trains (≈50%), the rest is
    * the held-out slice the score gate reports on. */
  val QtTrainBound = "80"

  /** Integer ridge λ for the EXTERNAL-teacher gate: H + λI. 16 sits in
    * the measured sweet spot for this corpus (0 → 98.8% held-out sign
    * agreement but no collinear protection, 16 → 94.8%, 64 → 85%,
    * 256 → diverging shrinkage); the gate runs WITH the ridge so the
    * stability term itself is oracle-proven, not just spec-covered. */
  val QtRidge = 16L

  /** The NDJSON quarantine gate's staged malformed lines — shared
    * verbatim by the Spark drop-file and the oracle's expected-digest
    * list (no single quotes: they embed in SQL literals). Three
    * failure classes: type mismatch on the BIGINT column, truncated/
    * malformed JSON, and non-JSON text. */
  private val JsonBadLines: Seq[String] = Seq(
    """{"doc_id":"notanumber1","text":"text 1","lang":"xx","source":"drop","n_chars":1}""",
    """{"doc_id":"notanumber2","text":"text 2","lang":"xx","source":"drop","n_chars":2}""",
    """{"doc_id":3,"text":"unterminated 3""",
    "not json at all 4",
    """{"doc_id":5,"n_chars":"bad5"}""",
    """{{"doc_id":6}""",
    """{"doc_id":7""")

  // ---- shared SQL fragments -------------------------------------------

  /** ws := non-empty whitespace tokens of text (matches TextFunctions.tokens). */
  private val toksCte =
    "toks AS (SELECT doc_id, text, list_filter(string_split(text, ' '), x -> x != '') AS ws FROM documents)"

  /** The stages the release-pipeline gates share: normalize → C4-style
    * line dedup → exact keep → minhash-verified fuzzy-CC keep → gopher
    * gate (r12's audited chain, moved verbatim so v1 and v2 cannot
    * drift). Returns (goph, evalNorm): the quality-kept training docs
    * (doc_id, lang, source, clean) and the normalized held-out
    * benchmark slice decontamination convicts against. `docs` supplies
    * the training text (doc_id, lang, source, text — the raw corpus
    * for v1/v2, WARC-extracted pages for the crawl gate); `evalDocs`
    * supplies the held-out benchmark text, always the raw corpus. */
  private def releaseGophStage(docs: DataFrame,
      evalDocs: DataFrame): (DataFrame, DataFrame) = {
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val evalD = evalDocs.filter(col("doc_id") % 10 === 0)
    val norm = train.select(col("doc_id"), col("lang"), col("source"),
      Corpus.normalizeText(col("text")).as("norm"))
    val ws = TextFunctions.tokens(col("norm"))
    val nw = org.apache.spark.sql.functions.size(ws).cast("long")
    val lined = norm.select(col("doc_id"),
      array_join(
        transform(
          sequence(lit(0L),
            ((greatest(nw, lit(1L)) + lit(2L)) / lit(3L)).cast("long") - 1),
          i => array_join(slice(ws, (i * 3 + 1).cast("int"), lit(3)), " ")),
        "\n").as("lined"))
    val cleaned = Dedup.dedupLines(lined, "doc_id", "lined", "\n", maxDf = 3)
      .select(col("doc_id"),
        regexp_replace(col("clean_text"), "\n", " ").as("clean"))
      .join(norm.select(col("doc_id"), col("lang"), col("source")),
        Seq("doc_id"))
    // feeds fuzzy pair discovery AND the survivor joins below
    val exact = Dedup.dropDuplicatesByPriority(cleaned, "clean",
      Seq(col("doc_id"))).localCheckpoint(true)
    // materialized: the minhash-verified fuzzy-CC pass feeds BOTH the
    // gopher gate and the survivor join below — exchange reuse does not
    // span the consumers' separate jobs, so without the cut the whole
    // nearDupKeep chain (shingle minhash + banding + verification)
    // re-executes per consumer (r14 profile: two identical ~0.9 s
    // single-task stage pairs in every release pipeline)
    val fuzzy = Dedup.nearDupKeep(exact, "doc_id", "clean",
        n = 3, bands = 4, rowsPerBand = 3, threshold = 0.5)
      .select(col("doc_id"))
      .join(exact, Seq("doc_id"))
      .localCheckpoint(true)
    val goph = Corpus.gopherRules(fuzzy, "doc_id", "clean",
        minWords = 30, maxWords = 100000, stops = GopherQueryStops)
      .filter(col("keep")).select(col("doc_id"))
      .join(fuzzy, Seq("doc_id"))
    val evalNorm = evalD.select(col("doc_id"),
      Corpus.normalizeText(col("text")).as("clean"))
    (goph, evalNorm)
  }

  /** The release-card tail both pipeline gates share: mixture plan +
    * sequence packing, with the card's doc/token counts RE-DERIVED from
    * the packed payload and shard digests folded in shard order. */
  private def releaseCard(released: DataFrame): DataFrame = {
    val weights = released.select(col("source")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
      .map(src => src -> ((src.drop(3).toInt + 1) * 4761))
    val plan = Corpus.mixturePlan(released, "source", "clean", weights,
      budgetTokens = 10000000L)
    val shardRows = Corpus.packSequences(released, "source", "doc_id",
        "clean", budget = 500L, sep = "\n\n")
      .select(col("source"), col("shard"), col("n_docs"),
        md5(col("packed").cast("binary")).as("pmd5"),
        // the card's token count comes off the PACKED bytes, not
        // the upstream rows — the "nothing lost in packing" proof
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.filter(
            split(col("packed"), "\\s+"), t => t =!= lit("")))
          .cast("long").as("rt"))
    shardRows.groupBy(col("source")).agg(
        count(lit(1)).as("n_shards"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("rt")).as("n_tokens"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("shard"), col("pmd5")))),
            x => x.getField("pmd5")),
          "|").cast("binary")).as("packed_md5"))
      .join(plan.select(col("source"), col("weight_ppm"),
        col("target_tokens"), col("repeat_milli")), Seq("source"))
  }

  /** The v1 release-pipeline oracle through the `goph` CTE — shared
    * verbatim by the v2 gate so the audited stage spellings cannot
    * drift between the two compositions. The expensive shared CTEs are
    * marked MATERIALIZED: DuckDB 1.0 inlines CTEs at every reference,
    * and v2 references `goph` (the whole minhash + recursive-CC chain)
    * from four LM CTEs — inlined, the oracle re-evaluates that chain
    * per reference (measured: >17 min vs 1.9 s materialized at
    * sf0.01). `baseFrom` names the relation supplying the training
    * text (the raw corpus for v1/v2, the WARC-extracted pages for the
    * crawl gate); `prefixCtes` lets that relation's own CTE chain ride
    * in front of the shared stages. */
  private def releaseOracleHead(baseFrom: String = "documents",
      prefixCtes: String = ""): String = {
    val stops = GopherQueryStops.map(s0 => s"'$s0'").mkString("[", ", ", "]")
    s"""WITH RECURSIVE ${prefixCtes}rl_base AS (
           |  SELECT doc_id, lang, source,
           |    trim(regexp_replace(strip_accents(lower(text)), '\\s+', ' ', 'g')) AS norm
           |  FROM $baseFrom WHERE doc_id % 10 <> 0),
           |bt AS (
           |  SELECT doc_id, lang, source,
           |    list_filter(string_split(norm, ' '), x -> x != '') AS ws0
           |  FROM rl_base),
           |rl_lined AS (
           |  SELECT doc_id, lang, source, list_transform(
           |    range(0, CAST((greatest(len(ws0), 1) + 2) // 3 AS BIGINT)),
           |    i -> array_to_string(ws0[i*3+1:i*3+3], ' ')) AS lines
           |  FROM bt),
           |rl_freq AS (
           |  SELECT line FROM (
           |    SELECT DISTINCT doc_id, unnest(lines) AS line FROM rl_lined)
           |  GROUP BY line HAVING COUNT(*) > 3),
           |rl_fl AS (SELECT COALESCE(list(line), []) AS f FROM rl_freq),
           |cleaned AS MATERIALIZED (
           |  SELECT doc_id, lang, source,
           |    COALESCE(array_to_string(
           |      list_filter(lines, l -> NOT list_contains(f, l)), ' '), '') AS clean
           |  FROM rl_lined, rl_fl),
           |exact AS MATERIALIZED (
           |  SELECT doc_id, lang, source, clean FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(clean)
           |      ORDER BY doc_id) AS rn
           |    FROM cleaned) t WHERE rn = 1),
           |toks AS (
           |  SELECT doc_id, clean AS text,
           |    list_filter(string_split(clean, ' '), x -> x != '') AS ws
           |  FROM exact),
           |$shingleCte,
           |$minhashCtes,
           |rl_cands AS (
           |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           |  FROM banded a JOIN banded b
           |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
           |rl_shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
           |rl_sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM rl_shx GROUP BY doc_id),
           |rl_common AS (
           |  SELECT c.d1, c.d2, COUNT(*) AS common
           |  FROM rl_cands c
           |  JOIN rl_shx s1 ON s1.doc_id = c.d1
           |  JOIN rl_shx s2 ON s2.doc_id = c.d2 AND s2.shingle = s1.shingle
           |  GROUP BY c.d1, c.d2),
           |rl_pairs AS (
           |  SELECT d1, d2 FROM rl_common
           |  JOIN rl_sizes sa ON sa.doc_id = d1
           |  JOIN rl_sizes sb ON sb.doc_id = d2
           |  WHERE CAST(common AS DOUBLE) / CAST(sa.nsh + sb.nsh - common AS DOUBLE) >= 0.5),
           |rl_e AS (SELECT d1 AS a, d2 AS b FROM rl_pairs
           |         UNION SELECT d2 AS a, d1 AS b FROM rl_pairs),
           |rl_walk(src, dst) AS (
           |  SELECT doc_id, doc_id FROM exact
           |  UNION
           |  SELECT w.src, e.b FROM rl_walk w JOIN rl_e e ON w.dst = e.a),
           |rl_comp AS (SELECT src AS doc_id, MIN(dst) AS cluster
           |            FROM rl_walk GROUP BY src),
           |fuzzy AS (
           |  SELECT t.doc_id, t.lang, t.source, t.clean
           |  FROM exact t JOIN rl_comp c
           |    ON c.doc_id = t.doc_id AND c.cluster = t.doc_id),
           |gm AS (
           |  SELECT doc_id, CAST(len(gws) AS BIGINT) AS n,
           |    CAST(COALESCE(list_sum(list_transform(gws, w -> len(w))), 0) AS BIGINT) AS sl,
           |    CAST(len(list_filter(gws, w -> contains(w, '#') OR contains(w, '...'))) AS BIGINT) AS sym,
           |    CAST(len(list_filter(gws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS al,
           |    CAST(len(list_filter($stops,
           |      s -> list_contains(list_transform(gws, w -> lower(w)), s))) AS BIGINT) AS st
           |  FROM (SELECT doc_id,
           |    list_filter(string_split(clean, ' '), x -> x != '') AS gws
           |    FROM fuzzy)),
           |goph AS MATERIALIZED (
           |  SELECT f.* FROM fuzzy f JOIN gm USING (doc_id)
           |  WHERE n >= 30 AND n <= 100000 AND sl >= n * 3 AND sl <= n * 10
           |    AND sym * 10 <= n AND al * 5 >= n * 4 AND st >= 2)""".stripMargin
  }

  /** The decontamination → pack → release-card oracle tail; `rel`
    * names the CTE that feeds it (goph for v1, goph2 for v2), and the
    * extra hooks let v2 join its LM-drop census into the card. */
  private def releaseOracleTail(rel: String, extraSelect: String = "",
      extraJoin: String = ""): String =
    s"""ev AS (
           |  SELECT trim(regexp_replace(strip_accents(lower(text)), '\\s+', ' ', 'g')) AS clean
           |  FROM documents WHERE doc_id % 10 = 0),
           |evsh AS (
           |  SELECT DISTINCT unnest(list_distinct(list_transform(
           |    range(1, len(ews) - 6),
           |    i -> array_to_string(ews[i:i+7], ' ')))) AS shingle
           |  FROM (SELECT list_filter(string_split(clean, ' '), x -> x != '') AS ews
           |        FROM ev) WHERE len(ews) >= 8),
           |tsh AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(
           |    range(1, len(tws) - 6),
           |    i -> array_to_string(tws[i:i+7], ' ')))) AS shingle
           |  FROM (SELECT doc_id,
           |    list_filter(string_split(clean, ' '), x -> x != '') AS tws
           |    FROM $rel) WHERE len(tws) >= 8),
           |contam AS (
           |  SELECT DISTINCT t.doc_id FROM tsh t JOIN evsh e ON e.shingle = t.shingle),
           |released AS MATERIALIZED (
           |  SELECT * FROM $rel
           |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
           |ptoks AS (
           |  SELECT doc_id, source, clean,
           |    CAST(len(list_filter(string_split(clean, ' '), x -> x != '')) AS BIGINT) AS nt
           |  FROM released),
           |rl_shard AS (
           |  SELECT doc_id, source, clean, nt,
           |    CAST(COALESCE(SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 500 AS BIGINT) AS shard
           |  FROM ptoks),
           |packs AS (
           |  SELECT source, shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    md5(STRING_AGG(clean, chr(10) || chr(10) ORDER BY doc_id)) AS pmd5,
           |    STRING_AGG(clean, chr(10) || chr(10) ORDER BY doc_id) AS packed
           |  FROM rl_shard GROUP BY 1, 2),
           |rp AS (
           |  SELECT source, shard, n_docs, pmd5,
           |    CAST(len(list_filter(regexp_split_to_array(packed, '\\s+'),
           |      x -> x != '')) AS BIGINT) AS rt
           |  FROM packs),
           |agg AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_shards,
           |    CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           |    CAST(SUM(rt) AS BIGINT) AS n_tokens,
           |    md5(STRING_AGG(pmd5, '|' ORDER BY shard)) AS packed_md5
           |  FROM rp GROUP BY 1),
           |mp AS (
           |  SELECT source,
           |    CAST((CAST(substr(source, 4) AS BIGINT) + 1) * 4761 AS BIGINT) AS weight_ppm
           |  FROM (SELECT DISTINCT source FROM released))
           |SELECT a.source, a.n_shards, a.n_docs, a.n_tokens, a.packed_md5,
           |  m.weight_ppm,
           |  CAST(10000000 * m.weight_ppm // 1000000 AS BIGINT) AS target_tokens,
           |  CAST(CASE WHEN a.n_tokens = 0 THEN 0
           |       ELSE (10000000 * m.weight_ppm // 1000000) * 1000 // a.n_tokens
           |       END AS BIGINT) AS repeat_milli$extraSelect
           |FROM agg a JOIN mp m USING (source)$extraJoin
           |ORDER BY a.source""".stripMargin

  /** The SQL spelling of [[StreamingQueries.crawlUrl]] — shared by the
    * stream-ingest and crawl-release-v2 oracles so the two gates pin
    * the identical URL fixture. */
  private val crawlUrlSql: String =
    // every continuation line ends with || — a leading || would be
    // half-eaten by the EMBEDDING string's stripMargin (whitespace
    // then '|' reads as a margin)
    """'https://WWW.Media' || (doc_id % 3) || '.Example' || (doc_id % 5) || '.COM' ||
      |CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
      |'/Doc/' || (doc_id % 20) ||
      |CASE WHEN doc_id % 6 = 0 THEN '///' ELSE '' END ||
      |CASE WHEN doc_id % 2 = 0 THEN '?utm=x' ELSE '' END ||
      |CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END""".stripMargin

  /** URL canonicalization CTEs over `u(doc_id, url)` ending in
    * `cx(doc_id, domain, canon_url)` and `ck(canon_url, keeper)` —
    * the oracle spelling of [[Corpus.urlCanonicalize]] + the keeper
    * rule, shared by the stream-ingest and crawl-release-v2 gates. */
  private val crawlUrlCanonCtes: String =
    s"""cu AS (SELECT doc_id,
       |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
       |  lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)) AS hostport,
       |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1) AS path
       |  FROM u),
       |ch AS (SELECT doc_id, scheme,
       |  regexp_replace(
       |    CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
       |         WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
       |         ELSE hostport END, '^www\\.', '') AS host,
       |  CASE WHEN rtrim(path, '/') = '' THEN '/'
       |       ELSE rtrim(path, '/') END AS cpath
       |  FROM cu),
       |cx AS (SELECT doc_id,
       |  regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain,
       |  scheme || '://' || host || cpath AS canon_url
       |  FROM ch),
       |ck AS (SELECT canon_url, MIN(doc_id) AS keeper FROM cx GROUP BY 1)""".stripMargin

  /** The CCNet LM-quality CTE chain the v2/v3 release gates share,
    * ending in `goph2` (the LM-kept slice of `src`) and `lmdrop` (the
    * per-source drop census). `src` names the CTE carrying the docs to
    * train on and gate (doc_id, lang, source, clean). */
  private def releaseLmCtes(src: String): String =
    s"""lmt AS (SELECT doc_id, lang,
       |  list_filter(string_split(lower(clean), ' '), x -> x != '') AS lws
       |  FROM $src),
       |lmpos AS (SELECT doc_id, lang, lws, unnest(range(1, len(lws))) AS i FROM lmt),
       |lmbg AS (SELECT doc_id, lang, lws[i] AS w1, lws[i+1] AS w2 FROM lmpos),
       |lmbig AS MATERIALIZED (SELECT w1, w2, COUNT(*) AS c12 FROM lmbg WHERE lang = 'en' GROUP BY 1, 2),
       |lmuni AS (SELECT w1, SUM(c12) AS c1 FROM lmbig GROUP BY 1),
       |lmvoc AS (SELECT COUNT(DISTINCT tok) AS v FROM
       |  (SELECT w1 AS tok FROM lmbig UNION SELECT w2 AS tok FROM lmbig)),
       |lmcon AS (
       |  SELECT lmbg.doc_id,
       |    ((COALESCE(c12, 0) + 1) * ${Corpus.LmProbScale}) //
       |      (COALESCE(c1, 0) + (SELECT v FROM lmvoc)) AS c
       |  FROM lmbg LEFT JOIN lmbig USING (w1, w2) LEFT JOIN lmuni USING (w1)),
       |lmagg AS (SELECT doc_id, SUM(c) AS s2, COUNT(*) AS n2 FROM lmcon GROUP BY 1),
       |lmscored AS MATERIALIZED (
       |  SELECT g.doc_id, g.lang, CAST(a.s2 // a.n2 AS BIGINT) AS lm_score
       |  FROM $src g LEFT JOIN lmagg a USING (doc_id)),
       |lmc AS (SELECT lang, lm_score, COUNT(*) AS cnt FROM lmscored
       |  WHERE lm_score IS NOT NULL GROUP BY 1, 2),
       |lmw AS (SELECT lang, lm_score,
       |  SUM(cnt) OVER (PARTITION BY lang ORDER BY lm_score
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |  SUM(cnt) OVER (PARTITION BY lang) AS n FROM lmc),
       |lmcuts AS (SELECT lang,
       |  MIN(CASE WHEN cum >= (n*33 + 99) // 100 THEN lm_score END) AS p33
       |  FROM lmw GROUP BY lang),
       |lmkeep AS MATERIALIZED (
       |  SELECT s.doc_id FROM lmscored s LEFT JOIN lmcuts c USING (lang)
       |  WHERE s.lm_score IS NOT NULL AND s.lm_score >= c.p33),
       |goph2 AS MATERIALIZED (SELECT g.* FROM $src g JOIN lmkeep USING (doc_id)),
       |lmdrop AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_lm_dropped
       |  FROM $src WHERE doc_id NOT IN (SELECT doc_id FROM lmkeep)
       |  GROUP BY 1)""".stripMargin

  /** The Gopher n-gram REPETITION CTE chain for the v3 release gate:
    * [[Corpus.repetitionRules]] re-derived over `goph`'s clean text,
    * ending in `goph_r` (the repetition-kept slice) and `repdrop` (the
    * per-source drop census). The line-duplication rules are constant-
    * true here — `clean` is single-line by construction (the C4 stage
    * re-joined it with spaces), a lone line cannot repeat — so only
    * the nine n-gram rules are spelled; the operator computes the line
    * stats too and reaches the identical verdict. */
  private def releaseRepCtes(capScaleMilli: Int): String =
    s"""rp_t AS MATERIALIZED (SELECT doc_id, source,
       |  list_filter(string_split(clean, ' '), x -> x != '') AS ws
       |  FROM goph),
       |rp_tc AS (SELECT doc_id,
       |  CAST(COALESCE(list_sum(list_transform(ws, w -> len(w))), 0) AS BIGINT) AS totch
       |  FROM rp_t),
       |rp_wk AS MATERIALIZED (
       |  SELECT doc_id, n, i, array_to_string(ws[i+1:i+n], ' ') AS g
       |  FROM (SELECT doc_id, n, ws,
       |          unnest(range(0, greatest(len(ws) - n + 1, 0))) AS i
       |        FROM rp_t, (SELECT unnest([2,3,4,5,6,7,8,9,10]) AS n) rpns)),
       |rp_wc AS MATERIALIZED (
       |  SELECT doc_id, n, g, COUNT(*) AS c FROM rp_wk GROUP BY 1, 2, 3),
       |rp_topa AS (SELECT doc_id,
       |  MAX(CASE WHEN n = 2 AND c >= 2 THEN c * (len(g) - 1) END) AS top2,
       |  MAX(CASE WHEN n = 3 AND c >= 2 THEN c * (len(g) - 2) END) AS top3,
       |  MAX(CASE WHEN n = 4 AND c >= 2 THEN c * (len(g) - 3) END) AS top4
       |  FROM rp_wc GROUP BY 1),
       |rp_dk AS (SELECT doc_id, n, g FROM rp_wc WHERE c >= 2 AND n >= 5),
       |rp_cov AS (SELECT DISTINCT doc_id, n, p FROM (
       |  SELECT w.doc_id, w.n, unnest(range(w.i, w.i + w.n)) AS p
       |  FROM rp_wk w JOIN rp_dk USING (doc_id, n, g))),
       |rp_tll AS MATERIALIZED (
       |  SELECT doc_id, p, CAST(len(ws[p+1]) AS BIGINT) AS wlen
       |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS p FROM rp_t)),
       |rp_da AS (SELECT c2.doc_id,
       |  SUM(CASE WHEN c2.n = 5 THEN t.wlen END) AS dup5,
       |  SUM(CASE WHEN c2.n = 6 THEN t.wlen END) AS dup6,
       |  SUM(CASE WHEN c2.n = 7 THEN t.wlen END) AS dup7,
       |  SUM(CASE WHEN c2.n = 8 THEN t.wlen END) AS dup8,
       |  SUM(CASE WHEN c2.n = 9 THEN t.wlen END) AS dup9,
       |  SUM(CASE WHEN c2.n = 10 THEN t.wlen END) AS dup10
       |  FROM rp_cov c2 JOIN rp_tll t USING (doc_id, p) GROUP BY 1),
       |rp_keep AS MATERIALIZED (
       |  SELECT t.doc_id FROM rp_tc t
       |  LEFT JOIN rp_topa USING (doc_id)
       |  LEFT JOIN rp_da USING (doc_id)
       |  WHERE COALESCE(top2, 0) * 100000 <= greatest(totch, 1) * 20 * $capScaleMilli
       |    AND COALESCE(top3, 0) * 100000 <= greatest(totch, 1) * 18 * $capScaleMilli
       |    AND COALESCE(top4, 0) * 100000 <= greatest(totch, 1) * 16 * $capScaleMilli
       |    AND COALESCE(dup5, 0) * 100000 <= greatest(totch, 1) * 15 * $capScaleMilli
       |    AND COALESCE(dup6, 0) * 100000 <= greatest(totch, 1) * 14 * $capScaleMilli
       |    AND COALESCE(dup7, 0) * 100000 <= greatest(totch, 1) * 13 * $capScaleMilli
       |    AND COALESCE(dup8, 0) * 100000 <= greatest(totch, 1) * 12 * $capScaleMilli
       |    AND COALESCE(dup9, 0) * 100000 <= greatest(totch, 1) * 11 * $capScaleMilli
       |    AND COALESCE(dup10, 0) * 100000 <= greatest(totch, 1) * 10 * $capScaleMilli),
       |goph_r AS MATERIALIZED (
       |  SELECT g.* FROM goph g JOIN rp_keep USING (doc_id)),
       |repdrop AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rep_dropped
       |  FROM goph WHERE doc_id NOT IN (SELECT doc_id FROM rp_keep)
       |  GROUP BY 1)""".stripMargin

  /** Deterministic crawl-page fixture wrapped around a document: real
    * boilerplate shapes (title, script with a '<' in its code, style,
    * comment, a link-dense nav bar, a heading with entities, the
    * escaped payload, a footer mixing entities and an anchor). The
    * Scala side and [[htmlExtractCtes]] build the IDENTICAL string. */
  private[ops] def htmlFixture(id: Long, text: String, lang: String,
      source: String): String =
    s"""<html><head><title>$source</title>""" + "\n" +
      s"""<script type="text/javascript">var doc = $id; if (doc < 9) { track("&amp;"); }</script>""" + "\n" +
      "<style>.nav a { color: red; }</style>" + "\n" +
      "</head><body>" + "\n" +
      s"<!-- rendered by fixture $id -->" + "\n" +
      s"""<div class="nav"><a href="/">Home</a> <a href="/s/$source">$source</a> | <a href="/d/$id">prev</a></div>""" + "\n" +
      s"<h1>Document $id &#39;$lang&#39;</h1>" + "\n" +
      s"<p>${TextExtract.escapeHtml(text)}</p>" + "\n" +
      """<p>Footer &amp; legal &lt;terms&gt; apply. <a href="/t">Terms</a></p>""" + "\n" +
      "</body></html>"

  /** The DuckDB re-derivation of [[TextExtract.htmlToText]] over the
    * [[htmlFixture]] pages: builds the same HTML, strips comments /
    * script / style, then per line applies the identical link-density
    * keep rule, tag strip, entity decode (amp last), and whitespace
    * collapse. Ends with `kept(doc_id, ls)` — the list of clean lines. */
  private val htmlExtractCtes: String = {
    val esc = "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    val strip = "trim(regexp_replace(l, '<[^>]*>', '', 'g'), ' ')"
    s"""base AS (
       |  SELECT doc_id,
       |    '<html><head><title>' || source || '</title>' || chr(10) ||
       |    '<script type="text/javascript">var doc = ' || doc_id ||
       |      '; if (doc < 9) { track("&amp;"); }</script>' || chr(10) ||
       |    '<style>.nav a { color: red; }</style>' || chr(10) ||
       |    '</head><body>' || chr(10) ||
       |    '<!-- rendered by fixture ' || doc_id || ' -->' || chr(10) ||
       |    '<div class="nav"><a href="/">Home</a> <a href="/s/' || source ||
       |      '">' || source || '</a> | <a href="/d/' || doc_id ||
       |      '">prev</a></div>' || chr(10) ||
       |    '<h1>Document ' || doc_id || ' &#39;' || lang || '&#39;</h1>' || chr(10) ||
       |    '<p>' || $esc || '</p>' || chr(10) ||
       |    '<p>Footer &amp; legal &lt;terms&gt; apply. <a href="/t">Terms</a></p>' || chr(10) ||
       |    '</body></html>' AS html
       |  FROM documents),
       |nosc AS (
       |  SELECT doc_id,
       |    regexp_replace(regexp_replace(regexp_replace(html,
       |      '(?s)<!--.*?-->', '', 'g'),
       |      '(?is)<script[^>]*>.*?</script>', '', 'g'),
       |      '(?is)<style[^>]*>.*?</style>', '', 'g') AS h
       |  FROM base),
       |kept AS (
       |  SELECT doc_id,
       |    list_filter(list_transform(
       |      list_filter(string_split(h, chr(10)), l ->
       |        length($strip) > 0
       |        AND 2 * coalesce(list_sum(list_transform(
       |              regexp_extract_all(l, '(?is)<a[^>]*>([^<]*)</a>', 1),
       |              a -> length(a))), 0) <= length($strip)),
       |      l -> trim(regexp_replace(
       |        replace(replace(replace(replace(replace(replace(
       |          $strip,
       |          '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
       |          '&#39;', chr(39)), '&amp;', '&'),
       |        '[ \t]+', ' ', 'g'), ' ')),
       |      x -> x != '') AS ls
       |  FROM nosc)""".stripMargin
  }

  /** Kirsch-Mitzenmacher minhash signature + band CTEs (matches
    * Dedup.minhashLsh: k=12 components h_i = h1 + i·h2 from the two
    * 14-hex-char halves of one md5; bands of 3 joined with '|'). */
  private lazy val minhashCtes = {
    val h1 = "('0x' || substr(md5(s), 1, 14))::BIGINT"
    val h2 = "('0x' || substr(md5(s), 15, 14))::BIGINT"
    val sigs = (0 until 12).map(i =>
      s"list_min(list_transform(shingles, s -> $h1 + $i * $h2))")
      .mkString("[", ", ", "]")
    val bandRows = (0 until 4).map { b =>
      val parts = (0 until 3).map(r => s"CAST(sig[${b * 3 + r + 1}] AS VARCHAR)")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $parts AS bsig FROM sigs"
    }.mkString(" UNION ALL ")
    s"sigs AS (SELECT doc_id, $sigs AS sig FROM sh),\nbanded AS ($bandRows)"
  }

  /** distinct 3-gram shingles (matches TextFunctions.shingles(_, 3)). */
  private val shingleCte =
    """sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(ws) - 1),
      |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingles
      |  FROM toks WHERE len(ws) >= 3)""".stripMargin

  private def dotSql(a: String, b: String): String =
    (1 to Dim).map(i => s"$a[$i]::DOUBLE * $b[$i]::DOUBLE").mkString(" + ")

  /** Hyperplane LSH bucket id in SQL — same integer weights and
    * left-assoc projection order as Similarity.lshBucket. */
  private def bucketSql(v: String, planes: Int): String =
    (0 until planes).map { p =>
      val proj = (0 until Dim).map(d =>
        s"$v[${d + 1}]::DOUBLE * (${Similarity.planeWeight(d, p)})")
        .mkString(" + ")
      s"CASE WHEN ($proj) > 0 THEN ${1L << p} ELSE 0 END"
    }.mkString(" + ")

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Dot product over INTEGER-valued lists: every term and partial sum is
    * an exact integer in double (< 2^53), so list_sum's aggregation order
    * is irrelevant — no unrolled left-assoc chain needed. */
  private def idotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, ${Dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def icosSql(a: String, b: String): String =
    s"(${idotSql(a, b)}) / (sqrt(${idotSql(a, a)}) * sqrt(${idotSql(b, b)}))"

  /** k-means CTE chain `qvt, c0, …, c<iters>` matching
    * [[Similarity.kmeansCentroids]]: integer-quantized vectors (×1000
    * round), seed = the k smallest-id vectors, per-pass max-cosine
    * assignment with ties to the lowest cid, centers = element-wise
    * integer SUMS (cosine is scale-invariant — see the Spark side).
    * The final centers CTE is named `c<iters>`. Shared by
    * `ann_ivf_kmeans` and `dedup_semantic` so the two queries cannot
    * drift apart. */
  private def kmeansCtes(k: Int, iters: Int, where: String = "TRUE",
      pfx: String = ""): String = {
    def lloyd(prev: String, a: String, sTbl: String, next: String) =
      s"""$a AS (SELECT vec_id, cid, qv FROM (
         |    SELECT q.vec_id, c.cid, q.qv,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${icosSql("q.qv", "c.cv")} DESC, c.cid) AS rn
         |    FROM ${pfx}qvt q CROSS JOIN $prev c) t WHERE rn = 1),
         |$sTbl AS (SELECT cid, i AS d, SUM(qv[i]) AS sx
         |  FROM $a CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS i) dims
         |  GROUP BY cid, i),
         |$next AS (SELECT cid, list(CAST(sx AS DOUBLE) ORDER BY d) AS cv
         |  FROM $sTbl GROUP BY cid)""".stripMargin
    val chain = (1 to iters)
      .map(i => lloyd(s"${pfx}c${i - 1}", s"${pfx}a$i", s"${pfx}s$i",
        s"${pfx}c$i")).mkString(",\n")
    s"""${pfx}qvt AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
       |  FROM embeddings WHERE $where),
       |${pfx}c0 AS (SELECT vec_id AS cid, list_transform(qv, x -> CAST(x AS DOUBLE)) AS cv
       |  FROM ${pfx}qvt WHERE vec_id < $k),
       |$chain""".stripMargin
  }

  /** Batched-BPE training-loop CTE chain matching [[Corpus.bpeCore]]
    * round for round over the distinct-word HISTOGRAM. `s0` is the
    * (word, count, unit-boundary encoding) table; per round k:
    *  - `m\$k` (ONE materialized single-row CTE) does the whole
    *    candidate step in list space: explode adjacent unit pairs of
    *    `s\${k-1}`, rank the weighted pair counts, keep the top
    *    [[Corpus.BpeBatchCandidates]] by (count desc, u1, u2) as a
    *    struct list, accept candidates unit-disjoint from EVERY
    *    higher-ranked candidate (the same non-iterative rule bpeCore's
    *    driver filter applies — a list_filter whose 1-based index `i`
    *    scans the candidates BEFORE position i, accepted or not),
    *    truncate to the remaining merge budget `budget − tot` by list
    *    slice, and fold the round's accepts into the running state:
    *    `tot` (accepted total), `allacc` (every accepted merge with its
    *    GLOBAL rank — the flat artifact order), and the `pats`/`reps`
    *    replace lists for the rewrite;
    *  - `s\$k` rewrites the histogram by the accepted merges as a chain
    *    of [[Corpus.BpeBatchCandidates]] literal replaces — slot j past
    *    `len(pats)` indexes to NULL and COALESCEs to a chr(1)
    *    never-matching pattern, so the accumulator string appears ONCE
    *    per level (no 2^m expression blowup) and absent slots are
    *    no-ops; a `len(pats) = 0` guard skips the replace chain
    *    entirely on budget/pair-exhausted tail rounds (the copy
    *    rounds that mirror bpeCore's loop exit). Accepted pairs are
    *    unit-disjoint, so the replace chain cannot interact and equals
    *    Spark's sequential application exactly.
    * `nRounds` is the shared synchronization-round cap (the
    * result-contract `maxRounds` — see Corpus.bpeCore), `budget` the
    * merge budget, `window` the pretokenization width feeding `s0`.
    * Only m/s are MATERIALIZED (each is referenced twice; default
    * inlining would double the scan tree per round — 2^n scans).
    * This shape replaced the r13 five-CTE round (p/c/f/t/r/s): DuckDB
    * 1.0 retains several MB of allocator high-water per materialized
    * CTE with joins, so 56 rounds × 5 CTEs peaked at 1.84 GB isolated
    * RSS — enough to OOM the round driver's starved oracle host. Two
    * CTEs per round measure 0.9 GB with byte-identical output and
    * roughly half the wall (tools/oracle_rss_r14.txt).
    * The caller appends its own final SELECT over `m\$n.allacc`
    * (struct(rank, u1, u2, c), rank already global) or `s\$n`. */
  private def bpeRoundsSql(nRounds: Int, budget: Int, window: Int,
      src: String = "documents",
      m: Int = Corpus.BpeBatchCandidates): String = {
    val rounds = (1 to nRounds).map { k =>
      val applied = (1 to m).foldLeft("s") { (acc, j) =>
        s"""replace($acc,
           |      COALESCE(pats[$j], chr(1)),
           |      COALESCE(reps[$j], ''))""".stripMargin
      }
      s"""m$k AS MATERIALIZED (
         |  SELECT y.tot + len(y.acc2) AS tot,
         |    y.allacc || list_transform(range(1, len(y.acc2) + 1), i ->
         |      struct_pack(rank := y.tot + i, u1 := y.acc2[i].u1,
         |        u2 := y.acc2[i].u2, c := y.acc2[i].c)) AS allacc,
         |    list_transform(y.acc2,
         |      a -> '·' || a.u1 || '··' || a.u2 || '·') AS pats,
         |    list_transform(y.acc2, a -> '·' || a.u1 || a.u2 || '·') AS reps
         |  FROM (
         |    SELECT list_filter(z.cands, (x, i) ->
         |        len(list_filter(z.cands[1:i-1], b -> b.u1 IN (x.u1, x.u2)
         |          OR b.u2 IN (x.u1, x.u2))) = 0
         |      )[1 : GREATEST(CAST($budget AS BIGINT) - mp.tot, 0)] AS acc2,
         |      mp.tot, mp.allacc
         |    FROM (
         |      SELECT COALESCE(list(struct_pack(u1 := u1, u2 := u2, c := c)
         |          ORDER BY c DESC, u1, u2), []) AS cands
         |      FROM (
         |        SELECT u1, u2, CAST(SUM(cnt) AS BIGINT) AS c FROM (
         |          SELECT pr[1] AS u1, pr[2] AS u2, cnt FROM (
         |            SELECT cnt, unnest(list_transform(range(1, len(us)),
         |                i -> [us[i], us[i + 1]])) AS pr
         |            FROM (SELECT cnt, string_split(trim(s, '·'), '··') AS us
         |                  FROM s${k - 1})))
         |        GROUP BY u1, u2 ORDER BY c DESC, u1, u2 LIMIT $m)) z
         |    CROSS JOIN m${k - 1} mp) y),
         |s$k AS MATERIALIZED (
         |  SELECT w, cnt, CASE WHEN len(pats) = 0 THEN s ELSE
         |    $applied END AS s
         |  FROM s${k - 1} CROSS JOIN m$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH s0 AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    regexp_replace(w, '(.)', '·\\1·', 'g') AS s
       |  FROM (${bpePretokSql(window, withId = false, src)})
       |  GROUP BY w),
       |m0 AS (SELECT CAST(0 AS BIGINT) AS tot,
       |  CAST([] AS STRUCT(rank BIGINT, u1 VARCHAR, u2 VARCHAR,
       |    c BIGINT)[]) AS allacc),
       |$rounds""".stripMargin
  }

  /** Replay chain for the stored-merge APPLY gate: `a0` is the TARGET
    * corpus's pretoken histogram; per round k, `a\$k` replays round k's
    * accepted training merges (the same `m\$k` pats/reps lists, same
    * rank order) — the concatenation of per-round rank orders IS the
    * flat artifact order the Spark side replays. Appended after a
    * [[bpeRoundsSql]] whose training chain defined the `m\$k` tables. */
  private def bpeApplySql(nRounds: Int, window: Int): String = {
    val m = Corpus.BpeBatchCandidates
    // replays the m$k (pats, reps) lists the training chain already
    // materialized — same 1-row cross join, zero extra subplans
    val rounds = (1 to nRounds).map { k =>
      val applied = (1 to m).foldLeft("s") { (acc, j) =>
        s"""replace($acc,
           |      COALESCE(pats[$j], chr(1)),
           |      COALESCE(reps[$j], ''))""".stripMargin
      }
      s"""a$k AS MATERIALIZED (
         |  SELECT w, cnt, CASE WHEN len(pats) = 0 THEN s ELSE
         |    $applied END AS s
         |  FROM a${k - 1} CROSS JOIN m$k)""".stripMargin
    }.mkString(",\n")
    s""", a0 AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
       |    regexp_replace(w, '(.)', '·\\1·', 'g') AS s
       |  FROM (${bpePretokSql(window, withId = false)})
       |  GROUP BY w),
       |$rounds""".stripMargin
  }

  /** Pretoken stream SQL matching TextFunctions.pretokens: the token
    * list chunked into non-overlapping `window`-token runs re-joined by
    * a single space; chunk starts come from range(1, len+1, window) and
    * DuckDB list slicing clamps the trailing chunk. `withId` keeps
    * doc_id (+ the 1-based chunk start as pos) for per-doc encoders. */
  private def bpePretokSql(window: Int, withId: Boolean,
      src: String = "documents"): String = {
    val cols =
      if (withId) "doc_id, i AS pos, "
      else ""
    s"""SELECT ${cols}array_to_string(ws[i:i + ${window - 1}], ' ') AS w
       |  FROM (SELECT doc_id, list_filter(string_split(text, ' '),
       |      x -> x != '') AS ws FROM $src),
       |  LATERAL unnest(range(1, len(ws) + 1, $window)) AS t(i)""".stripMargin
  }

  /** Near-dup cluster oracle: jaccard pair CTEs + a recursive
    * transitive-closure walk. Shared verbatim by `dedup_clusters` (label
    * propagation) and `dedup_clusters_star` (star contraction) — the two
    * solvers must agree exactly. */
  /** Shared CTE chain of the integer power iteration (8 rounds over the
    * exact Gram of milli-quantized embeddings), ending at `w8(j, w)` —
    * reused by the `emb_top_component` and `emb_top_removal` oracles. */
  private lazy val topComponentCtes: String = {
    val rounds = (1 to 8).map { i =>
      s"""wp$i AS MATERIALIZED (
         |  SELECT g.j, CAST(SUM(g.g * w.w) AS BIGINT) AS wp
         |  FROM g JOIN w${i - 1} w ON w.j = g.k GROUP BY 1),
         |m$i AS MATERIALIZED (SELECT MAX(ABS(wp)) AS m FROM wp$i),
         |w$i AS MATERIALIZED (
         |  SELECT j, CAST(CASE WHEN wp < 0
         |    THEN -((CAST(-wp AS HUGEINT) * 1048576) // m)
         |    ELSE ((CAST(wp AS HUGEINT) * 1048576) // m) END AS BIGINT)
         |    AS w
         |  FROM wp$i, m$i)""".stripMargin
    }.mkString(",\n")
    s"""q AS MATERIALIZED (
       |  SELECT list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |dims AS MATERIALIZED (SELECT unnest(range(1, ${Dim + 1})) AS j),
       |g AS MATERIALIZED (
       |  SELECT dj.j AS j, dk.j AS k,
       |    CAST(SUM(qv[dj.j] * qv[dk.j]) AS BIGINT) AS g
       |  FROM q, dims dj, dims dk GROUP BY 1, 2),
       |w0 AS (SELECT j, CAST(1048576 AS BIGINT) AS w FROM dims),
       |$rounds""".stripMargin
  }

  /** `text_search_topk`'s oracle — also a subquery of the RRF fusion. */
  private lazy val lexOracleSql: String = {
    val terms = SearchQuery.split("\\s+").distinct.toSeq
    s"""WITH $toksCte,
       |tf AS (
       |  SELECT doc_id AS doc, tok, COUNT(*) AS tf
       |  FROM (SELECT doc_id, lower(unnest(ws)) AS tok FROM toks)
       |  WHERE tok IN ${terms.map(t => s"'$t'").mkString("(", ", ", ")")}
       |  GROUP BY doc, tok),
       |dfreq AS (
       |  SELECT tok, ${Corpus.LexicalWeightScale} // COUNT(*) AS weight
       |  FROM tf GROUP BY tok),
       |scored AS (
       |  SELECT doc, CAST(SUM(tf * weight) AS BIGINT) AS score
       |  FROM tf JOIN dfreq USING (tok) GROUP BY doc)
       |SELECT doc, rank, score FROM (
       |  SELECT doc, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc) AS INT) AS rank, score
       |  FROM scored) t
       |WHERE rank <= 10 ORDER BY rank""".stripMargin
  }

  /** `text_bm25_topk`'s oracle — also a subquery of the RRF fusion. */
  private lazy val bm25OracleSql: String = {
    val terms = SearchQuery.split("\\s+").distinct.toSeq
    val contrib = Corpus.bm25ContribSql(
      "(SELECT nn FROM tot)", "df", "tf", "dl", "(SELECT sumdl FROM tot)")
    s"""WITH $toksCte,
       |tot AS (SELECT COUNT(*) AS nn, CAST(SUM(len(ws)) AS BIGINT) AS sumdl FROM toks),
       |tf AS (
       |  SELECT doc_id AS doc, tok, COUNT(*) AS tf, MIN(dl) AS dl
       |  FROM (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, lower(unnest(ws)) AS tok FROM toks)
       |  WHERE tok IN ${terms.map(t => s"'$t'").mkString("(", ", ", ")")}
       |  GROUP BY doc, tok),
       |wdf AS (SELECT doc, tok, tf, dl, COUNT(*) OVER (PARTITION BY tok) AS df FROM tf),
       |scored AS (
       |  SELECT doc, CAST(SUM($contrib) AS BIGINT) AS score
       |  FROM wdf GROUP BY doc)
       |SELECT doc, rank, score FROM (
       |  SELECT doc, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc) AS INT) AS rank, score
       |  FROM scored) t
       |WHERE rank <= 10 ORDER BY rank""".stripMargin
  }

  private lazy val clustersOracleSql: String =
    s"""WITH RECURSIVE $toksCte, $shingleCte,
       |shx0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |dfx AS (SELECT shingle, COUNT(*) AS df FROM shx0 GROUP BY shingle),
       |shx AS (SELECT s.doc_id, s.shingle FROM shx0 s
       |        JOIN dfx USING (shingle) WHERE df <= $JaccardMaxDf),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shx GROUP BY doc_id),
       |common AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
       |  FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT d1, d2 FROM common
       |  JOIN sizes sa ON sa.doc_id = d1
       |  JOIN sizes sb ON sb.doc_id = d2
       |  WHERE CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.5),
       |e AS (SELECT d1 AS a, d2 AS b FROM pairs
       |      UNION SELECT d2 AS a, d1 AS b FROM pairs),
       |walk(src, dst) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT w.src, e.b FROM walk w JOIN e ON w.dst = e.a),
       |comp AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
       |         FROM walk GROUP BY src)
       |SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical
       |FROM comp ORDER BY doc_id""".stripMargin

  /** 64-bit simhash CTE chain (requires `toks` in scope): yields
    * `sims(doc_id, sh)`. Token hash from md5 hex chars 1-8 (high word)
    * and 9-16 (low word), mirroring Dedup.tokenVal64; everything stays
    * in BIGINT by testing bits against the right half and assembling the
    * signature in two's complement (bit 63 contributes -2^31 to the
    * signed high word). */
  private val simhashCtes: String = {
    def hexVal(start: Int) = (1 to 8).map { i =>
      val pow = math.pow(16, 8 - i).toLong
      s"(strpos('0123456789abcdef', substring(md5(tok), ${start + i - 1}, 1)) - 1) * ${pow}::BIGINT"
    }.mkString(" + ")
    val bitSums = (0 until 64).map { j =>
      val (word, shift) = if (j < 32) ("lo", 1L << j) else ("hi", 1L << (j - 32))
      s"SUM(CASE WHEN ($word // $shift) % 2 = 1 THEN 1 ELSE -1 END) AS b$j"
    }.mkString(", ")
    val shLo = (0 until 32).map { j =>
      s"CASE WHEN b$j > 0 THEN ${1L << j}::BIGINT ELSE 0 END"
    }.mkString(" + ")
    val shHiSigned = (32 until 63).map { j =>
      s"CASE WHEN b$j > 0 THEN ${1L << (j - 32)}::BIGINT ELSE 0 END"
    }.mkString(" + ") + " - CASE WHEN b63 > 0 THEN 2147483648 ELSE 0 END"
    s"""tv AS (SELECT doc_id, unnest(list_distinct(ws)) AS tok FROM toks WHERE len(ws) > 0),
       |vals AS (SELECT doc_id, (${hexVal(1)}) AS hi, (${hexVal(9)}) AS lo FROM tv),
       |bits AS (SELECT doc_id, $bitSums FROM vals GROUP BY doc_id),
       |sims AS MATERIALIZED (SELECT doc_id, ($shHiSigned) * 4294967296 + ($shLo) AS sh FROM bits)""".stripMargin
  }

  /** Shared oracle of `dedup_minhash_incremental` AND
    * `stream_dedup_ingest` (the live-ingest spelling of the same
    * gate): full-corpus banded LSH pairs restricted to those touching
    * the new batch (doc_id >= 400) — old-old pairs are never
    * regenerated. */
  private lazy val minhashIncrementalOracleSql: String =
    s"""WITH $toksCte, $shingleCte,
       |$minhashCtes
       |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
       |WHERE a.doc_id >= 400 OR b.doc_id >= 400
       |ORDER BY d1, d2""".stripMargin

  /** Shared oracle of `ann_pq_incremental` AND `stream_ann_encode`
    * (the live-ingest spelling of the same encode): history-slice
    * codebook (ksub smallest ids ≥ 100), batch rows (< 100) coded per
    * subspace by argmin exact integer squared-L2, ties to the lowest
    * code; codes emitted as the canonical comma-joined string. */
  private lazy val pqIncrementalOracleSql: String = {
    val m = 4; val ksub = 8; val sub = Dim / m
    def subdist(a: String, b: String) =
      s"""list_sum(list_transform(range(j*$sub + 1, j*$sub + ${sub + 1}),
         |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
    s"""WITH qvt AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |cb AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, qv
       |  FROM (SELECT vec_id, qv FROM qvt WHERE vec_id >= 100
       |        ORDER BY vec_id LIMIT $ksub)),
       |js AS (SELECT unnest(range(0, $m)) AS j),
       |enc AS (
       |  SELECT vec_id, j, code FROM (
       |    SELECT v.vec_id, js.j, c.code,
       |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, js.j
       |        ORDER BY ${subdist("v.qv", "c.qv")}, c.code) AS rn
       |    FROM qvt v CROSS JOIN cb c CROSS JOIN js
       |    WHERE v.vec_id < 100) t WHERE rn = 1)
       |SELECT vec_id, string_agg(CAST(code AS VARCHAR), ',' ORDER BY j) AS codes
       |FROM enc GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  /** Language profiles shared by the Spark and oracle sides. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow", "small"),
    "db" -> Seq("table", "scan", "join", "merge", "sort", "hash", "query"),
    "st" -> Seq("stream", "window", "batch", "row", "value"))

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Fixed retrieval query shared by `text_search_topk` and its oracle:
    * mixes rare (discriminative) and common (low-weight) corpus terms. */
  val SearchQuery = "table stream merge the"

  /** Shared oracle for the exact and Bloom-prefiltered decontamination
    * queries — both must produce byte-identical output (the sketch only
    * prunes join input, it never decides membership). */
  private def decontaminateOracle(
      trainPred: String = "doc_id < 450",
      evalPred: String = "doc_id >= 450"): String = {
    def shingleSub(toks: String, pred: String) =
      s"""$toks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
         |  FROM documents WHERE $pred)""".stripMargin
    s"""WITH ${shingleSub("ttoks", trainPred)},
       |tsh AS (
       |  SELECT doc_id,
       |    unnest(list_distinct(list_transform(range(1, len(ws) - 1),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       |  FROM ttoks WHERE len(ws) >= 3),
       |${shingleSub("etoks", evalPred)},
       |esh AS (
       |  SELECT DISTINCT shingle FROM (
       |    SELECT unnest(list_distinct(list_transform(range(1, len(ws) - 1),
       |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
       |    FROM etoks WHERE len(ws) >= 3)),
       |tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tsh GROUP BY doc_id),
       |cont AS (
       |  SELECT doc_id, COUNT(*) AS n_contaminated FROM tsh
       |  WHERE shingle IN (SELECT shingle FROM esh) GROUP BY doc_id)
       |SELECT t.doc_id, t.n_shingles,
       |  COALESCE(c.n_contaminated, 0) AS n_contaminated,
       |  CAST(COALESCE(c.n_contaminated, 0) AS DOUBLE) / CAST(t.n_shingles AS DOUBLE) AS contamination
       |FROM tot t LEFT JOIN cont c ON t.doc_id = c.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  // ---- queries --------------------------------------------------------

  val queries: Seq[Q] = Seq(

    // ======== text analysis ========
    Q(
      "text_token_stats",
      (s, dir) => {
        import TextFunctions._
        table(s, dir, "documents").select(
          col("doc_id"),
          tokenCount(col("text")).as("n_tokens"),
          uniqueTokenCount(col("text")).as("n_uniq"),
          meanTokenLength(col("text")).as("mean_tok_len"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws FROM documents)
             |SELECT doc_id,
             |  CAST(len(ws) AS INT) AS n_tokens,
             |  CAST(len(list_distinct(ws)) AS INT) AS n_uniq,
             |  CASE WHEN len(ws) > 0 THEN
             |    CAST(list_sum(list_transform(ws, t -> length(t))) AS DOUBLE) / CAST(len(ws) AS DOUBLE)
             |  ELSE 0.0 END AS mean_tok_len
             |FROM toks ORDER BY doc_id""".stripMargin)),

    Q(
      "text_quality",
      (s, dir) => {
        import TextFunctions._
        table(s, dir, "documents").select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          punctRatio(col("text")).as("punct_ratio"),
          stopwordRatio(col("text"), Stopwords).as("stop_ratio"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $toksCte
             |SELECT doc_id,
             |  CAST(length(text) AS INT) AS n_chars,
             |  CASE WHEN length(text) > 0 THEN
             |    CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
             |  ELSE 0.0 END AS punct_ratio,
             |  CASE WHEN len(ws) > 0 THEN
             |    CAST(len(list_filter(ws, t -> list_contains(${sqlList(Stopwords)}, t))) AS DOUBLE) / CAST(len(ws) AS DOUBLE)
             |  ELSE 0.0 END AS stop_ratio
             |FROM toks ORDER BY doc_id""".stripMargin)),

    Q(
      "text_langid",
      (s, dir) => {
        import TextFunctions._
        table(s, dir, "documents").select(
          col("doc_id"),
          argmaxLang(col("text"), LangProfiles).as("pred_lang"))
          .orderBy(col("doc_id"))
      },
      Some {
        val sorted = LangProfiles.sortBy(_._1)
        val scores = sorted.map { case (lang, markers) =>
          s"len(list_filter(ws, t -> list_contains(${sqlList(markers)}, t))) AS s_$lang"
        }.mkString(", ")
        // argmax with alphabetic tie-break == Spark's array_max over
        // (score, prio): first alphabetical lang whose score >= all others
        val allZero = sorted.map(l => s"s_${l._1} = 0").mkString(" AND ")
        val chain = sorted.zipWithIndex.init.map { case ((lang, _), i) =>
          val geAll = sorted.drop(i + 1)
            .map(o => s"s_$lang >= s_${o._1}").mkString(" AND ")
          s"WHEN $geAll THEN '$lang'"
        }.mkString(" ")
        s"""WITH $toksCte,
           |scored AS (SELECT doc_id, $scores FROM toks)
           |SELECT doc_id,
           |  CASE WHEN $allZero THEN 'und' $chain ELSE '${sorted.last._1}' END AS pred_lang
           |FROM scored ORDER BY doc_id""".stripMargin
      }),

    Q(
      "text_fingerprint",
      (s, dir) => {
        import TextFunctions._
        table(s, dir, "documents").select(
          col("doc_id"), fingerprint(col("text")).as("fp"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(0::BIGINT,
             |      list_transform(string_split(text, ''), c -> unicode(c)::BIGINT)),
             |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q(
      "text_subtokens",
      (s, dir) => {
        import TextFunctions._
        table(s, dir, "documents").select(
          col("doc_id"),
          subtokenCount(col("text")).as("n_sub"),
          size(array_distinct(subtokens(col("text")))).as("n_sub_uniq"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '${TextFunctions.SubtokenPattern}')) AS INT) AS n_sub,
             |  CAST(len(list_distinct(regexp_extract_all(text, '${TextFunctions.SubtokenPattern}'))) AS INT) AS n_sub_uniq
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ======== corpus curation: sampling / packing / retrieval ========
    Q(
      "corpus_stratified_sample",
      (s, dir) =>
        Corpus.stratifiedEveryNth(table(s, dir, "documents"), "lang", "doc_id", 5)
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang,
             |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
             |  FROM documents) t
             |WHERE (rn - 1) % 5 = 0 ORDER BY doc_id""".stripMargin)),

    Q(
      "corpus_hash_sample",
      (s, dir) =>
        Corpus.hashSamplePerStratum(table(s, dir, "documents"), "lang", "doc_id", 20)
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang,
             |    ROW_NUMBER() OVER (PARTITION BY lang
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents) t
             |WHERE rn <= 20 ORDER BY doc_id""".stripMargin)),

    Q(
      "corpus_token_packing",
      (s, dir) =>
        Corpus.packByTokenBudget(table(s, dir, "documents"),
          "source", "doc_id", "text", budget = 500L)
          .select(col("doc_id"), col("source"), col("n_tokens"), col("shard"))
          .orderBy(col("doc_id")),
      Some("""WITH toks AS (
             |  SELECT doc_id, source,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tokens
             |  FROM documents)
             |SELECT doc_id, source, n_tokens,
             |  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 500 AS BIGINT) AS shard
             |FROM toks ORDER BY doc_id""".stripMargin)),

    // packed training sequences: each (source, shard)'s docs concatenated
    // in doc order — md5 of the payload keeps the compared cells small
    // while still pinning every byte of the packed text
    Q(
      "corpus_pack_sequences",
      (s, dir) =>
        Corpus.packSequences(table(s, dir, "documents"),
          "source", "doc_id", "text", budget = 500L, sep = "\n\n")
          .select(col("source"), col("shard"), col("n_docs"), col("n_tokens"),
            md5(col("packed").cast("binary")).as("packed_md5"))
          .orderBy(col("source"), col("shard")),
      Some("""WITH toks AS (
             |  SELECT doc_id, source, text,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |sh AS (
             |  SELECT doc_id, source, text, n_tokens,
             |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 500 AS BIGINT) AS shard
             |  FROM toks)
             |SELECT source, shard, COUNT(*) AS n_docs,
             |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             |  md5(STRING_AGG(text, chr(10) || chr(10) ORDER BY doc_id)) AS packed_md5
             |FROM sh GROUP BY source, shard
             |ORDER BY source, shard""".stripMargin)),

    // deterministic mixture resampling: per-source keep-rates bring the
    // kept corpus to the target weights (weight derived from the source
    // name's last character so the formula covers any source set); the
    // exact keep set is integer cross-multiplied hash arithmetic both
    // engines reproduce bit-for-bit
    Q(
      "corpus_mixture_sample",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val sources = docs.select(col("source")).distinct()
          .collect().map(_.getString(0))
        val weights = sources.map(src =>
          src -> ((src.last.toInt % 3) + 1)).toMap
        Corpus.sampleToMixture(docs, "source", "doc_id", weights)
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH cnt AS (
             |  SELECT source, COUNT(*) AS n,
             |    (unicode(substr(source, -1, 1)) % 3) + 1 AS wt
             |  FROM documents GROUP BY source),
             |tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS w_sum FROM cnt),
             |t AS (SELECT MIN(n * (SELECT w_sum FROM tot) // wt) AS feasible FROM cnt)
             |SELECT d.doc_id, d.source
             |FROM documents d JOIN cnt c ON d.source = c.source
             |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
             |    * (SELECT w_sum FROM tot) * c.n
             |  < 16777216 * (SELECT feasible FROM t) * c.wt
             |ORDER BY d.doc_id""".stripMargin)),

    // token-budget mixture plan: the per-source "how many epochs" sheet.
    // Weights derive from the source name's trailing digits (covers any
    // source set); integer DIV throughout so both engines derive the
    // identical plan
    Q(
      "corpus_mixture_plan",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val sources = docs.select(col("source")).distinct()
          .collect().map(_.getString(0)).sorted
        val weights = sources.toSeq.map(src =>
          src -> (src.drop(3).toInt + 1) * 4761)
        Corpus.mixturePlan(docs, "source", "text", weights,
          budgetTokens = 10000000L).orderBy(col("source"))
      },
      Some("""WITH a AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS n_tokens,
             |    CAST((CAST(substr(source, 4) AS BIGINT) + 1) * 4761 AS BIGINT) AS weight_ppm
             |  FROM documents GROUP BY source),
             |b AS (SELECT *, 10000000 * weight_ppm // 1000000 AS target_tokens FROM a)
             |SELECT source, n_docs, n_tokens, weight_ppm,
             |  CAST(target_tokens AS BIGINT) AS target_tokens,
             |  CAST(CASE WHEN n_tokens = 0 THEN 0
             |       ELSE target_tokens * 1000 // n_tokens END AS BIGINT) AS repeat_milli
             |FROM b ORDER BY source""".stripMargin)),

    // padding-efficiency plan: docs bucketed to 16-token shape multiples,
    // per-bucket batch counts at batchSize 32 and pad-waste ppm — one
    // map-only projection + one bucket-keyed aggregate
    Q(
      "corpus_padding_plan",
      (s, dir) =>
        Corpus.paddingPlan(table(s, dir, "documents"), "text",
          bucketTokens = 16, batchSize = 32)
          .orderBy(col("bucket_len")),
      Some("""WITH b AS (
             |  SELECT CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS t
             |  FROM documents),
             |g AS (SELECT ((t + 15) // 16) * 16 AS bucket_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |        CAST(SUM(t) AS BIGINT) AS real_tokens
             |      FROM b GROUP BY 1)
             |SELECT bucket_len, n_docs, real_tokens,
             |  CAST((n_docs + 31) // 32 AS BIGINT) AS n_batches,
             |  CAST(n_docs * bucket_len AS BIGINT) AS padded_tokens,
             |  CAST(CASE WHEN n_docs * bucket_len = 0 THEN 0
             |       ELSE (n_docs * bucket_len - real_tokens) * 1000000 // (n_docs * bucket_len)
             |       END AS BIGINT) AS waste_ppm
             |FROM g ORDER BY bucket_len""".stripMargin)),

    // lang x source independence screen: floored-ppm observed vs
    // expected shares, all BIGINT — the mixture-imbalance report
    Q(
      "corpus_independence_dev",
      (s, dir) =>
        Corpus.independenceDeviation(table(s, dir, "documents"),
          "lang", "source")
          .orderBy(col("lang"), col("source")),
      Some("""WITH cell AS (
             |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM documents GROUP BY 1, 2),
             |rt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS r FROM cell GROUP BY 1),
             |ct AS (SELECT source, CAST(SUM(n) AS BIGINT) AS c FROM cell GROUP BY 1),
             |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cell)
             |SELECT lang, source, n,
             |  n * 1000000 // t AS obs_ppm,
             |  ((r * 1000000 // t) * (c * 1000000 // t)) // 1000000 AS exp_ppm,
             |  abs(n * 1000000 // t
             |    - ((r * 1000000 // t) * (c * 1000000 // t)) // 1000000) AS dev_ppm
             |FROM cell JOIN rt USING (lang) JOIN ct USING (source), tot
             |ORDER BY lang, source""".stripMargin)),

    // deterministic priority sample: 100 docs by hash-DIV-weight
    // priority (weight = tokens + 1) — weight-proportional inclusion,
    // reproducible across engines and incrementally maintainable
    Q(
      "corpus_priority_sample",
      (s, dir) =>
        Corpus.prioritySample(table(s, dir, "documents"), "doc_id", "text",
          k = 100)
          .orderBy(col("rank")),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) + 1 AS w
             |  FROM documents),
             |p AS (SELECT doc_id,
             |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT // w AS q
             |  FROM t)
             |SELECT doc, rank, priority FROM (
             |  SELECT doc_id AS doc,
             |    CAST(ROW_NUMBER() OVER (ORDER BY q, doc_id) AS INT) AS rank,
             |    q AS priority
             |  FROM p) t
             |WHERE rank <= 100 ORDER BY rank""".stripMargin)),

    // temperature-scaled mixture (α = 1/2): weights ∝ floor(sqrt(supply)),
    // the UniMax-style head-flattening rebalance, derived from the corpus
    // itself — exact cross-engine because IEEE sqrt is correctly rounded
    Q(
      "corpus_mixture_temperature",
      (s, dir) =>
        Corpus.mixtureTemperaturePlan(table(s, dir, "documents"),
          "source", "text", budgetTokens = 10000000L)
          .orderBy(col("source")),
      Some("""WITH a AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY source),
             |w AS (SELECT *, CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s FROM a),
             |t AS (SELECT *, SUM(s) OVER () AS tot FROM w),
             |b AS (SELECT *, CAST(CASE WHEN tot = 0 THEN 0
             |         ELSE s * 1000000 // tot END AS BIGINT) AS weight_ppm FROM t),
             |c AS (SELECT *, 10000000 * weight_ppm // 1000000 AS target_tokens FROM b)
             |SELECT source, n_docs, n_tokens, weight_ppm,
             |  CAST(target_tokens AS BIGINT) AS target_tokens,
             |  CAST(CASE WHEN n_tokens = 0 THEN 0
             |       ELSE target_tokens * 1000 // n_tokens END AS BIGINT) AS repeat_milli
             |FROM c ORDER BY source""".stripMargin)),

    // epoch expansion: MATERIALIZE the mixture plan — every doc emitted
    // floor(repeat_milli/1000) times plus a deterministic-hash
    // fractional epoch, so the expanded corpus hits the plan's
    // per-source token targets with zero RNG. Budget 30000 exercises
    // both the <1-epoch (hash-thinned) and >1-epoch (exploded) paths.
    Q(
      "corpus_epoch_expand",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val sources = docs.select(col("source")).distinct()
          .collect().map(_.getString(0)).sorted
        val weights = sources.toSeq.map(src =>
          src -> (src.drop(3).toInt + 1) * 4761)
        Corpus.epochExpand(docs, "source", "doc_id", "text", weights,
          budgetTokens = 30000L)
          .orderBy(col("doc_id"), col("epoch"))
      },
      Some("""WITH a AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS n_tokens,
             |    CAST((CAST(substr(source, 4) AS BIGINT) + 1) * 4761 AS BIGINT) AS weight_ppm
             |  FROM documents GROUP BY source),
             |p AS (
             |  SELECT source,
             |    CASE WHEN n_tokens = 0 THEN 0
             |      ELSE (30000 * weight_ppm // 1000000) * 1000 // n_tokens
             |    END AS repeat_milli
             |  FROM a),
             |d AS (
             |  SELECT doc_id, d.source, p.repeat_milli,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT AS h
             |  FROM documents d JOIN p USING (source)),
             |n AS (
             |  SELECT doc_id, source,
             |    repeat_milli // 1000 +
             |      CASE WHEN h * 1000 < 16777216 * (repeat_milli % 1000)
             |        THEN 1 ELSE 0 END AS n_rep
             |  FROM d)
             |SELECT doc_id, source, CAST(unnest(range(0, n_rep)) AS BIGINT) AS epoch
             |FROM n WHERE n_rep > 0 ORDER BY doc_id, epoch""".stripMargin)),

    // deterministic HyperLogLog: per-language distinct-SHINGLE estimate
    // pinned bit-for-bit by the oracle (md5-derived registers, exact
    // power-of-two harmonic sum) next to the exact NDV — the one-pass
    // kilobyte-state cardinality profile a 100 TB scan runs where
    // count_distinct would shuffle every shingle. 5-gram shingles put
    // every language (3.2k-10.9k NDV at sf0.01) in the raw-estimator
    // regime (NDV > 2.5m), where the log-free estimator is the
    // operative branch — expected error 1.04/sqrt(1024) ≈ 3%.
    Q(
      "sketch_hll_ndv",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val t = docs
          .select(col("lang"), TextFunctions.tokens(col("text")).as("__ws"))
          .select(col("lang"),
            explode(TextFunctions.shinglesFromTokens(col("__ws"), 5)).as("shingle"))
        Sketches.hllDistinct(t, "lang", "shingle").orderBy(col("lang"))
      },
      Some(s"""WITH stoks AS (
             |  SELECT lang, list_filter(string_split(text, ' '), x -> x != '') AS ws
             |  FROM documents),
             |shd AS (
             |  SELECT lang,
             |    list_distinct(list_transform(range(1, len(ws) - 3),
             |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingles
             |  FROM stoks WHERE len(ws) >= 5),
             |t AS (SELECT lang, unnest(shingles) AS shingle FROM shd),
             |hx AS (
             |  SELECT lang, shingle,
             |    ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h
             |  FROM t),
             |rb AS (
             |  SELECT lang, h >> 38 AS bucket,
             |    CASE WHEN h % (1::BIGINT << 38) = 0 THEN 39
             |      ELSE 39 - length(bin(h % (1::BIGINT << 38))) END AS rho
             |  FROM hx),
             |regs AS (
             |  SELECT lang, bucket, MAX(rho) AS m FROM rb GROUP BY 1, 2),
             |e AS (
             |  SELECT lang, COUNT(*) AS n_occ,
             |    SUM(CAST(1.0 AS DOUBLE) / CAST((1::BIGINT << m) AS DOUBLE)) AS s_occ
             |  FROM regs GROUP BY 1),
             |x AS (
             |  SELECT lang,
             |    CAST(1024 - n_occ AS DOUBLE) + s_occ AS sum_inv
             |  FROM e)
             |SELECT x.lang,
             |  CAST(FLOOR(CAST(0.7213 AS DOUBLE) /
             |    (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(1024.0 AS DOUBLE)) *
             |    CAST(1048576.0 AS DOUBLE) / sum_inv) AS BIGINT) AS est_ndv,
             |  nd.exact_ndv
             |FROM x JOIN (
             |  SELECT lang, COUNT(DISTINCT shingle) AS exact_ndv FROM t GROUP BY 1
             |) nd USING (lang)
             |ORDER BY lang""".stripMargin)),

    // the sketch STORE lifecycle gated end to end (the incremental-ANN
    // artifact convention): per-language register tables persisted as
    // parquet artifacts, read back, and register-max-merged into ONE
    // global distinct-shingle estimate — hllMerge's exactness means
    // the stored-artifact rollup must BIT-EQUAL the one-shot global
    // sketch the oracle computes, so any artifact write/read/merge
    // drift (a lost register, a type coercion) breaks the hash. This
    // is the 100 TB deployment shape: per-shard/day sketches
    // persisted at kilobytes, profiles rolled up without rescanning
    Q(
      "sketch_hll_store_merge",
      (s, dir) => {
        val base = "/tmp/graft_hllstore_" + new java.io.File(dir).getName +
          "_pid" + java.lang.ProcessHandle.current().pid()
        val t = table(s, dir, "documents")
          .select(col("lang"), TextFunctions.tokens(col("text")).as("__ws"))
          .select(col("lang"),
            explode(TextFunctions.shinglesFromTokens(col("__ws"), 5))
              .as("shingle"))
        Sketches.hllSketch(t, "lang", "shingle")
          .write.mode("overwrite").partitionBy("lang").parquet(base)
        val stored = s.read.parquet(base)
          .withColumn("corpus", lit("all"))
        Sketches.hllEstimate(
          Sketches.hllMerge(Seq(stored), "corpus"), "corpus")
      },
      Some("""WITH stoks AS (
             |  SELECT list_filter(string_split(text, ' '), x -> x != '') AS ws
             |  FROM documents),
             |shd AS (
             |  SELECT list_distinct(list_transform(range(1, len(ws) - 3),
             |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingles
             |  FROM stoks WHERE len(ws) >= 5),
             |t AS (SELECT unnest(shingles) AS shingle FROM shd),
             |hx AS (
             |  SELECT shingle, ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h
             |  FROM t),
             |rb AS (
             |  SELECT h >> 38 AS bucket,
             |    CASE WHEN h % (1::BIGINT << 38) = 0 THEN 39
             |      ELSE 39 - length(bin(h % (1::BIGINT << 38))) END AS rho
             |  FROM hx),
             |regs AS (SELECT bucket, MAX(rho) AS m FROM rb GROUP BY 1),
             |e AS (
             |  SELECT COUNT(*) AS n_occ,
             |    SUM(CAST(1.0 AS DOUBLE) / CAST((1::BIGINT << m) AS DOUBLE)) AS s_occ
             |  FROM regs)
             |SELECT 'all' AS corpus,
             |  CAST(FLOOR(CAST(0.7213 AS DOUBLE) /
             |    (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(1024.0 AS DOUBLE)) *
             |    CAST(1048576.0 AS DOUBLE) /
             |    (CAST(1024 - n_occ AS DOUBLE) + s_occ)) AS BIGINT) AS est_ndv
             |FROM e""".stripMargin)),

    // cross-group overlap by sketch inclusion-exclusion: per language
    // pair, |A∩B| ≈ est(A) + est(B) − est(A∪B) where the union sketch
    // is the register-wise max — the contamination/overlap profile a
    // 100 TB pipeline reads from STORED kilobyte register artifacts
    // without rescanning or joining the item sets; exact intersection
    // rides as the test-scale calibration column (the hllDistinct
    // convention), and the raw inclusion-exclusion value is returned
    // unclamped so the calibration tells the truth
    Q(
      "sketch_overlap",
      (s, dir) => {
        val t = table(s, dir, "documents")
          .select(col("lang"), TextFunctions.tokens(col("text")).as("__ws"))
          .select(col("lang"),
            explode(TextFunctions.shinglesFromTokens(col("__ws"), 5))
              .as("shingle"))
        Sketches.hllOverlap(t, "lang", "shingle")
          .orderBy(col("ga"), col("gb"))
      },
      Some(s"""WITH stoks AS (
             |  SELECT lang, list_filter(string_split(text, ' '), x -> x != '') AS ws
             |  FROM documents),
             |shd AS (
             |  SELECT lang,
             |    list_distinct(list_transform(range(1, len(ws) - 3),
             |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS shingles
             |  FROM stoks WHERE len(ws) >= 5),
             |t AS MATERIALIZED (SELECT lang, unnest(shingles) AS shingle FROM shd),
             |hx AS (
             |  SELECT lang, shingle,
             |    ('0x' || substr(md5(shingle), 1, 12))::BIGINT AS h
             |  FROM t),
             |rb AS (
             |  SELECT lang, h >> 38 AS bucket,
             |    CASE WHEN h % (1::BIGINT << 38) = 0 THEN 39
             |      ELSE 39 - length(bin(h % (1::BIGINT << 38))) END AS rho
             |  FROM hx),
             |regs AS MATERIALIZED (
             |  SELECT lang, bucket, MAX(rho) AS m FROM rb GROUP BY 1, 2),
             |langs AS MATERIALIZED (SELECT DISTINCT lang FROM regs),
             |pairs AS MATERIALIZED (
             |  SELECT a.lang AS ga, b.lang AS gb
             |  FROM langs a JOIN langs b ON a.lang < b.lang),
             |eg AS MATERIALIZED (
             |  SELECT lang,
             |    CAST(FLOOR(CAST(0.7213 AS DOUBLE) /
             |      (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(1024.0 AS DOUBLE)) *
             |      CAST(1048576.0 AS DOUBLE) / sum_inv) AS BIGINT) AS e
             |  FROM (
             |    SELECT lang, CAST(1024 - COUNT(*) AS DOUBLE) +
             |      SUM(CAST(1.0 AS DOUBLE) / CAST((1::BIGINT << m) AS DOUBLE)) AS sum_inv
             |    FROM regs GROUP BY 1) s0),
             |ur AS (
             |  SELECT ga, gb, bucket, MAX(m) AS m FROM (
             |    SELECT p.ga, p.gb, r.bucket, r.m
             |    FROM pairs p JOIN regs r ON r.lang = p.ga
             |    UNION ALL
             |    SELECT p.ga, p.gb, r.bucket, r.m
             |    FROM pairs p JOIN regs r ON r.lang = p.gb) u
             |  GROUP BY 1, 2, 3),
             |eu AS MATERIALIZED (
             |  SELECT ga, gb,
             |    CAST(FLOOR(CAST(0.7213 AS DOUBLE) /
             |      (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(1024.0 AS DOUBLE)) *
             |      CAST(1048576.0 AS DOUBLE) / sum_inv) AS BIGINT) AS e
             |  FROM (
             |    SELECT ga, gb, CAST(1024 - COUNT(*) AS DOUBLE) +
             |      SUM(CAST(1.0 AS DOUBLE) / CAST((1::BIGINT << m) AS DOUBLE)) AS sum_inv
             |    FROM ur GROUP BY 1, 2) s1),
             |it AS MATERIALIZED (
             |  SELECT DISTINCT lang, shingle AS i FROM t),
             |ex AS MATERIALIZED (
             |  SELECT x.lang AS ga, y.lang AS gb,
             |    CAST(COUNT(*) AS BIGINT) AS exact_overlap
             |  FROM it x JOIN it y ON x.i = y.i AND x.lang < y.lang
             |  GROUP BY 1, 2)
             |SELECT p.ga, p.gb, ea.e AS est_a, eb.e AS est_b,
             |  eu.e AS est_union,
             |  CAST(ea.e + eb.e - eu.e AS BIGINT) AS est_overlap,
             |  COALESCE(ex.exact_overlap, 0) AS exact_overlap
             |FROM pairs p
             |JOIN eg ea ON ea.lang = p.ga
             |JOIN eg eb ON eb.lang = p.gb
             |JOIN eu ON eu.ga = p.ga AND eu.gb = p.gb
             |LEFT JOIN ex ON ex.ga = p.ga AND ex.gb = p.gb
             |ORDER BY p.ga, p.gb""".stripMargin)),

    // deterministic count-min sketch: estimated counts of the true
    // top-10 tokens from a 4×1024-cell counter table — est >= true by
    // construction, and the oracle pins the exact cell values, so the
    // ESTIMATOR is under test, not just its error bound
    Q(
      "sketch_cms_topk",
      (s, dir) => {
        val t = table(s, dir, "documents")
          .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
        Sketches.cmsHeavyHitters(t, "tok", k = 10)
          .orderBy(col("true_count").desc, col("item"))
      },
      Some(s"""WITH $toksCte,
             |t AS (SELECT unnest(ws) AS tok FROM toks),
             |pairs AS (
             |  SELECT i, ('0x' || substr(md5(tok), 1 + 3*i, 3))::BIGINT % 1024 AS bucket
             |  FROM t CROSS JOIN (SELECT unnest(range(0, 4)) AS i) ii),
             |counters AS (
             |  SELECT i, bucket, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2),
             |top AS (
             |  SELECT tok AS item, COUNT(*) AS true_count FROM t GROUP BY 1
             |  ORDER BY true_count DESC, item LIMIT 10),
             |probe AS (
             |  SELECT item, true_count, i,
             |    ('0x' || substr(md5(item), 1 + 3*i, 3))::BIGINT % 1024 AS bucket
             |  FROM top CROSS JOIN (SELECT unnest(range(0, 4)) AS i) ii)
             |SELECT p.item, p.true_count, CAST(MIN(c.cnt) AS BIGINT) AS est_count
             |FROM probe p JOIN counters c ON c.i = p.i AND c.bucket = p.bucket
             |GROUP BY 1, 2 ORDER BY true_count DESC, item""".stripMargin)),

    // sketch-based join-size forecast: CMS inner product (one-sided
    // overestimate) next to the exact frequency inner product — the
    // pre-flight number that decides broadcast vs shuffle vs salting,
    // here forecasting the l_partkey self-join pair volume the
    // co-occurrence graph/dedup generators would produce
    Q(
      "sketch_join_size",
      (s, dir) => {
        val li = table(s, dir, "lineitem")
        Sketches.cmsJoinSize(li, "l_partkey", li, "l_partkey")
      },
      Some("""WITH keys AS (SELECT l_partkey AS k FROM lineitem),
             |pairs AS (
             |  SELECT i,
             |    ('0x' || substr(md5(CAST(k AS VARCHAR)), 1 + 3*i, 3))::BIGINT % 1024 AS bucket
             |  FROM keys CROSS JOIN (SELECT unnest(range(0, 4)) AS i) ii),
             |c AS (SELECT i, bucket, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2),
             |est AS (
             |  SELECT CAST(MIN(ip) AS BIGINT) AS est_pairs FROM (
             |    SELECT i, SUM(cnt * cnt) AS ip FROM c GROUP BY 1) t),
             |f AS (SELECT k, COUNT(*) AS fk FROM keys GROUP BY 1),
             |ex AS (SELECT CAST(SUM(fk * fk) AS BIGINT) AS exact_pairs FROM f)
             |SELECT est_pairs, exact_pairs FROM est, ex""".stripMargin)),

    // deterministic shard-export manifest: md5(id) mod N shard
    // assignment, per-shard doc/token counts and id ranges — the release
    // record of a `write.partitionBy("shard")` training export
    Q(
      "corpus_shard_manifest",
      (s, dir) =>
        Corpus.shardManifest(table(s, dir, "documents"), "doc_id", "text",
          nShards = 8).orderBy(col("shard")),
      Some("""WITH t AS (
             |  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 8 AS INT) AS shard,
             |    doc_id,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS toks
             |  FROM documents)
             |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
             |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
             |FROM t GROUP BY shard ORDER BY shard""".stripMargin)),

    // the writer path the manifest describes, gated end to end: write
    // partitionBy(shard) to disk, read the files back, re-derive the
    // manifest from the round-tripped rows — same oracle as
    // corpus_shard_manifest, so a lost/misrouted row or corrupted text
    // breaks the hash match
    Q(
      "corpus_shard_export",
      (s, dir) =>
        Corpus.exportShards(table(s, dir, "documents"), "doc_id", "text",
          nShards = 8,
          // pid suffix: the export happens eagerly at plan-construction
          // time with mode(overwrite), so two concurrent sessions
          // sharing a fixed path would race (one overwrites while the
          // other reads back). A per-JVM directory makes each session
          // the single writer/reader of its own export.
          outDir = "/tmp/graft_shard_export_" +
            new java.io.File(dir).getName + "_pid" +
            java.lang.ProcessHandle.current().pid()).orderBy(col("shard")),
      Some("""WITH t AS (
             |  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 8 AS INT) AS shard,
             |    doc_id,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS toks
             |  FROM documents)
             |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
             |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
             |FROM t GROUP BY shard ORDER BY shard""".stripMargin)),

    // rendezvous (HRW) re-shard census: assignment at N=12 vs N=13
    // over the same corpus, rolled up per old shard. The minimal-
    // disruption property rides IN the gated output — `moved` is the
    // ~1/13 slice the resize re-homes (vs ~12/13 under mod-N), and
    // `moved_wrong` counts movers that did NOT land on the added
    // shard, which HRW guarantees is zero (old weights are unchanged,
    // so only the newcomer can win a reassignment). Map-only on both
    // engines: N hashes per row, no shuffle beyond the 12-key census
    Q(
      "corpus_rendezvous_shards",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val before = Corpus.rendezvousShard(docs, "doc_id", 12)
          .withColumnRenamed("shard", "shard12")
        val both = Corpus.rendezvousShard(before, "doc_id", 13)
          .withColumnRenamed("shard", "shard13")
        both.groupBy(col("shard12").as("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("shard13") =!= col("shard12"), 1L).otherwise(0L))
              .as("moved"),
            sum(when(col("shard13") =!= col("shard12") &&
              col("shard13") =!= 12, 1L).otherwise(0L)).as("moved_wrong"))
          .orderBy(col("shard"))
      },
      Some {
        def hrw(n: Int) =
          s"""CAST(list_max(list_transform(range(0, $n), s ->
             |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR)), 1, 14))::BIGINT * 64 + s)) % 64 AS INT)""".stripMargin
        s"""WITH w AS (
           |  SELECT doc_id,
           |    ${hrw(12)} AS shard12,
           |    ${hrw(13)} AS shard13
           |  FROM documents)
           |SELECT shard12 AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(CASE WHEN shard13 <> shard12 THEN 1 ELSE 0 END) AS BIGINT) AS moved,
           |  CAST(SUM(CASE WHEN shard13 <> shard12 AND shard13 <> 12 THEN 1 ELSE 0 END) AS BIGINT) AS moved_wrong
           |FROM w GROUP BY 1 ORDER BY shard""".stripMargin
      }),

    // ORC roundtrip gate: the corpus written as ORC (Spark's second
    // native columnar format) and read back — the per-lang census
    // re-derives doc/char counts AND an order-pinned md5 of every
    // text byte from the round-tripped rows, so a type coercion, a
    // dropped row, or any mangled character in the ORC writer/reader
    // path breaks the hash. Proves the engine's source layer is not
    // parquet-bound; the oracle computes the same census from the
    // parquet truth
    Q(
      "corpus_orc_roundtrip",
      (s, dir) => {
        val out = "/tmp/graft_orc_" + new java.io.File(dir).getName +
          "_pid" + java.lang.ProcessHandle.current().pid()
        table(s, dir, "documents").write.mode("overwrite").orc(out)
        s.read.orc(out)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars"),
            md5(array_join(
              transform(
                array_sort(collect_list(struct(col("doc_id"), col("text")))),
                x => x.getField("text")),
              "\n\n").cast("binary")).as("packed_md5"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             |  md5(STRING_AGG(text, chr(10) || chr(10) ORDER BY doc_id)) AS packed_md5
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // CSV ingest with a corrupt-record quarantine (the malformed-data
    // reality of 100 TB file drops): the corpus round-trips through
    // Spark's quoting CSV writer, a staged drop-file adds
    // deterministically malformed lines (non-numeric id), and the
    // PERMISSIVE read routes them into _corrupt_record — admitted
    // rows re-derive the same byte-pinned census as the ORC gate,
    // quarantined raw lines land in their own order-pinned digest
    // row, so both the parser's accept AND reject paths are gated
    Q(
      "corpus_csv_ingest_quarantine",
      (s, dir) => {
        import org.apache.spark.sql.types.StringType
        val base = "/tmp/graft_csv_" + new java.io.File(dir).getName +
          "_pid" + java.lang.ProcessHandle.current().pid()
        val docs = table(s, dir, "documents")
        docs.write.option("header", "true").mode("overwrite")
          .csv(s"$base/good")
        val badLines = (1 to 7).map(i => s"notanumber$i,text $i,xx,drop,$i")
        // first line poses as the header (header=true skips one line
        // PER FILE); the rest must quarantine
        s.createDataset("doc_id,text,lang,source,n_chars" +: badLines)(
            org.apache.spark.sql.Encoders.STRING)
          .coalesce(1).write.mode("overwrite").text(s"$base/bad")
        val back = s.read
          .schema(docs.schema.add("_corrupt_record", StringType))
          .option("header", "true")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .csv(s"$base/good", s"$base/bad")
          .localCheckpoint(true)
        val admitted = back.filter(col("_corrupt_record").isNull)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars"),
            md5(array_join(
              transform(
                array_sort(collect_list(struct(col("doc_id"), col("text")))),
                x => x.getField("text")),
              "\n\n").cast("binary")).as("packed_md5"))
        val quarantined = back.filter(col("_corrupt_record").isNotNull)
          .agg(count(lit(1)).as("n_docs"), lit(0L).as("n_chars"),
            md5(array_join(array_sort(collect_list(col("_corrupt_record"))),
              "\n").cast("binary")).as("packed_md5"))
          .select(lit("zz_quarantine").as("lang"), col("n_docs"),
            col("n_chars"), col("packed_md5"))
        admitted.unionByName(quarantined).orderBy(col("lang"))
      },
      Some {
        val badLines = (1 to 7).map(i => s"notanumber$i,text $i,xx,drop,$i")
        val badList = badLines.map(l => s"'$l'").mkString("[", ", ", "]")
        s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           |  md5(STRING_AGG(text, chr(10) || chr(10) ORDER BY doc_id)) AS packed_md5
           |FROM documents GROUP BY lang
           |UNION ALL
           |SELECT 'zz_quarantine', ${badLines.size},
           |  0, md5(list_aggregate(list_sort($badList), 'string_agg', chr(10)))
           |ORDER BY lang""".stripMargin
      }),

    // NDJSON ingest with the same corrupt-record quarantine (r12 —
    // closes the last ingest-format asymmetry: the reference is
    // JSON-native, fluent.py:2125-2152 roots pipelines at parsed JSON
    // objects). The corpus round-trips through Spark's JSON writer, a
    // staged drop-file adds deterministically malformed lines (type
    // mismatches on the long column, truncated objects, non-JSON), and
    // the PERMISSIVE line-delimited read routes every one of them into
    // _corrupt_record with the raw line preserved — admitted rows
    // re-derive the byte-pinned per-lang census, quarantined raw lines
    // land in their own order-pinned digest row, so accept AND reject
    // paths are both gated. Same scale shape as the CSV gate: a
    // map-only parse, one census aggregate.
    Q(
      "corpus_json_ingest_quarantine",
      (s, dir) => {
        import org.apache.spark.sql.types.StringType
        val base = "/tmp/graft_json_" + new java.io.File(dir).getName +
          "_pid" + java.lang.ProcessHandle.current().pid()
        val docs = table(s, dir, "documents")
        docs.write.mode("overwrite").json(s"$base/good")
        s.createDataset(JsonBadLines)(
            org.apache.spark.sql.Encoders.STRING)
          .coalesce(1).write.mode("overwrite").text(s"$base/bad")
        val back = s.read
          .schema(docs.schema.add("_corrupt_record", StringType))
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(s"$base/good", s"$base/bad")
          .localCheckpoint(true)
        val admitted = back.filter(col("_corrupt_record").isNull)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("n_chars"),
            md5(array_join(
              transform(
                array_sort(collect_list(struct(col("doc_id"), col("text")))),
                x => x.getField("text")),
              "\n\n").cast("binary")).as("packed_md5"))
        val quarantined = back.filter(col("_corrupt_record").isNotNull)
          .agg(count(lit(1)).as("n_docs"), lit(0L).as("n_chars"),
            md5(array_join(array_sort(collect_list(col("_corrupt_record"))),
              "\n").cast("binary")).as("packed_md5"))
          .select(lit("zz_quarantine").as("lang"), col("n_docs"),
            col("n_chars"), col("packed_md5"))
        admitted.unionByName(quarantined).orderBy(col("lang"))
      },
      Some {
        val badList = JsonBadLines.map(l => s"'$l'").mkString("[", ", ", "]")
        s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           |  md5(STRING_AGG(text, chr(10) || chr(10) ORDER BY doc_id)) AS packed_md5
           |FROM documents GROUP BY lang
           |UNION ALL
           |SELECT 'zz_quarantine', ${JsonBadLines.size},
           |  0, md5(list_aggregate(list_sort($badList), 'string_agg', chr(10)))
           |ORDER BY lang""".stripMargin
      }),

    // HTML → text extraction (r13 — the missing FIRST stage of the
    // crawl chain: every other corpus query starts from a clean `text`
    // column; a real pretraining pipeline starts from page markup).
    // Deterministic crawl-page fixtures wrap each document in real
    // boilerplate (script code containing a literal '<', style,
    // comments, a link-dense nav bar, entity-bearing heading/footer);
    // TextExtract.htmlToText strips comments/script/style, applies the
    // jusText-style per-line link-density boilerplate rule, strips
    // tags, decodes entities (amp last), collapses whitespace — and
    // the oracle re-derives the ENTIRE chain in DuckDB regexp/list
    // functions, comparing full content hashes per document. Map-only:
    // one projection, no shuffle, scales like the codec seams.
    Q(
      "corpus_html_extract",
      (s, dir) => {
        import s.implicits._
        val pages = table(s, dir, "documents")
          .select("doc_id", "text", "lang", "source")
          .as[(Long, String, String, String)]
          .map { case (id, text, lang, source) =>
            (id, htmlFixture(id, text, lang, source))
          }
        TextExtract.extractHtml(pages)(s)
          .select(col("doc_id"), col("n_lines"), col("n_chars"),
            md5(col("text").cast("binary")).as("text_md5"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $htmlExtractCtes
             |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,
             |  CAST(length(array_to_string(ls, chr(10))) AS BIGINT) AS n_chars,
             |  md5(array_to_string(ls, chr(10))) AS text_md5
             |FROM kept ORDER BY doc_id""".stripMargin)),

    // the COMPOSED seam: extraction output feeding the gopher quality
    // gate — the first two stages of a real crawl pipeline in one
    // query, so the hand-off (extracted lines → token stream) is
    // hash-gated, not assumed. The extracted text gains the fixture's
    // heading/footer words, so the keep verdicts differ from
    // corpus_gopher_rules on raw text — the oracle recomputes the
    // whole composition from page bytes to verdict.
    Q(
      "corpus_html_extract_gate",
      (s, dir) => {
        import s.implicits._
        val pages = table(s, dir, "documents")
          .select("doc_id", "text", "lang", "source")
          .as[(Long, String, String, String)]
          .map { case (id, text, lang, source) =>
            (id, htmlFixture(id, text, lang, source))
          }
        val extracted = TextExtract.extractHtml(pages)(s)
          .select(col("doc_id"),
            regexp_replace(col("text"), "\n", " ").as("text"))
        Corpus.gopherRules(extracted, "doc_id", "text",
          minWords = 30, maxWords = 100000, stops = GopherQueryStops)
          .select("doc_id", "n_words", "keep")
          .orderBy(col("doc_id"))
      },
      Some {
        val stops = GopherQueryStops.map(s0 => s"'$s0'")
          .mkString("[", ", ", "]")
        s"""WITH $htmlExtractCtes,
           |ex AS (SELECT doc_id,
           |  replace(array_to_string(ls, chr(10)), chr(10), ' ') AS text
           |  FROM kept),
           |toks2 AS (SELECT doc_id,
           |  list_filter(string_split(text, ' '), x -> x != '') AS ws FROM ex),
           |m AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
           |  CAST(COALESCE(list_sum(list_transform(ws, w -> len(w))), 0) AS BIGINT) AS sl,
           |  CAST(len(list_filter(ws, w -> contains(w, '#') OR contains(w, '...'))) AS BIGINT) AS sym,
           |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS al,
           |  CAST(len(list_filter($stops,
           |    s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS BIGINT) AS st
           |  FROM toks2)
           |SELECT doc_id, n AS n_words,
           |  (n >= 30 AND n <= 100000 AND sl >= n * 3 AND sl <= n * 10
           |    AND sym * 10 <= n AND al * 5 >= n * 4 AND st >= 2) AS keep
           |FROM m ORDER BY doc_id""".stripMargin
      }),

    // WARC container ingest (r13 — the archive format crawls actually
    // ship in, ISO 28500): one synthesized WARC per source group —
    // warcinfo head, one HTTP response record per document wrapping
    // the SAME crawl-page fixture the extraction gate uses, plus four
    // deterministically torn records (no HTTP block / wrong magic /
    // missing Content-Length / length past EOF). The record walk
    // frames by Content-Length, resyncs at the next WARC/1. magic
    // after a torn record (the public-tooling recovery rule), and the
    // census gates BOTH paths: pages flow on through HTML extraction
    // to an order-pinned content hash, torn records land as pinned
    // quarantine reasons. Scale shape: one archive = one task — the
    // standard file-parallel crawl ingest; nothing driver-side.
    Q(
      "corpus_warc_ingest",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
          .select("doc_id", "text", "lang", "source")
          .as[(Long, String, String, String)]
        docs.groupByKey(_._4)
          .mapGroups { (src, it) =>
            val rows = it.toVector.sortBy(_._1)
            val records =
              (Warc.warcinfoRecord("graft-fixture") +:
                rows.map { case (id, text, lang, source) =>
                  Warc.responseRecord(s"http://corpus.test/$source/$id",
                    id.toString, htmlFixture(id, text, lang, source))
                }) ++ Warc.corruptRecords
            val parsed = Warc.parse(Warc.archive(records))
            val texts = parsed.pages.map { pg =>
              (pg.uri.substring(pg.uri.lastIndexOf('/') + 1).toLong,
                TextExtract.htmlToText(pg.body))
            }.sortBy(_._1)
            val joined = texts.map(_._2).mkString("\n\n")
            val md5hex = java.security.MessageDigest.getInstance("MD5")
              .digest(joined.getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            (src, texts.size.toLong, parsed.others.toLong,
              parsed.quarantined.size.toLong,
              parsed.quarantined.sorted.mkString("|"),
              texts.map(_._2.length.toLong).sum, md5hex)
          }
          .toDF("source", "n_pages", "n_other", "n_quarantined",
            "reasons", "n_chars", "text_md5")
          .orderBy(col("source"))
      },
      Some(s"""WITH $htmlExtractCtes,
             |ex AS (SELECT k.doc_id, d.source,
             |  array_to_string(k.ls, chr(10)) AS text
             |  FROM kept k JOIN documents d USING (doc_id))
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pages,
             |  CAST(1 AS BIGINT) AS n_other,
             |  CAST(4 AS BIGINT) AS n_quarantined,
             |  'bad_http|bad_magic|no_length|truncated' AS reasons,
             |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
             |  md5(STRING_AGG(text, chr(10) || chr(10) ORDER BY doc_id)) AS text_md5
             |FROM ex GROUP BY source ORDER BY source""".stripMargin)),

    // the crawl FRONT DOOR (RefinedWeb stage 0): canonicalize URLs
    // (scheme/host case, default ports, www., query+fragment, trailing
    // slashes), refuse blocklisted registered domains, keep one page
    // per canonical URL — the filters that run before any content byte
    // is parsed. The fixture plants every canonicalization hazard
    // (mixed case, :443, ///, ?utm, #frag) and collides distinct raw
    // URLs onto shared canonical forms; the oracle re-derives the
    // whole chain with the same RE2-safe regexes.
    Q(
      "corpus_url_gate",
      (s, dir) => {
        val url = concat(
          lit("https://WWW.Media"), (col("doc_id") % 3).cast("string"),
          lit(".Example"), (col("doc_id") % 5).cast("string"), lit(".COM"),
          when(col("doc_id") % 4 === 0, lit(":443")).otherwise(lit("")),
          lit("/Doc/"), expr("doc_id DIV 50").cast("string"),
          when(col("doc_id") % 6 === 0, lit("///")).otherwise(lit("")),
          when(col("doc_id") % 2 === 0, lit("?utm=x")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit("#sec")).otherwise(lit("")))
        Corpus.urlGate(
          table(s, dir, "documents").select(col("doc_id"), url.as("url")),
          "doc_id", "url", blockedDomains = Seq("example2.com"))
          .select("doc_id", "domain", "canon_url", "reason", "keep")
          .orderBy(col("doc_id"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |    'https://WWW.Media' || (doc_id % 3) || '.Example' || (doc_id % 5) || '.COM'
             |    || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
             |    || '/Doc/' || (doc_id // 50)
             |    || CASE WHEN doc_id % 6 = 0 THEN '///' ELSE '' END
             |    || CASE WHEN doc_id % 2 = 0 THEN '?utm=x' ELSE '' END
             |    || CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END AS url
             |  FROM documents),
             |c AS (
             |  SELECT doc_id,
             |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
             |    lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)) AS hostport,
             |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path
             |  FROM u),
             |h AS (
             |  SELECT doc_id, scheme,
             |    regexp_replace(
             |      CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
             |           WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
             |           ELSE hostport END, '^www\.', '') AS host,
             |    CASE WHEN rtrim(path, '/') = '' THEN '/'
             |         ELSE rtrim(path, '/') END AS cpath
             |  FROM c),
             |x AS (
             |  SELECT doc_id, host,
             |    regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
             |    scheme || '://' || host || cpath AS canon_url
             |  FROM h),
             |k AS (SELECT canon_url, MIN(doc_id) AS keeper FROM x GROUP BY 1),
             |v AS (
             |  SELECT x.doc_id, x.domain, x.canon_url,
             |    CASE WHEN x.domain = 'example2.com' THEN 'blocked_domain'
             |         WHEN x.doc_id > k.keeper THEN 'duplicate_url'
             |         ELSE 'ok' END AS reason
             |  FROM x JOIN k USING (canon_url))
             |SELECT doc_id, domain, canon_url, reason,
             |  (reason = 'ok') AS keep
             |FROM v ORDER BY doc_id""".stripMargin)),

    // incremental manifest refresh: the digest diff marks affected
    // shards, ONLY those re-aggregate over the new snapshot, untouched
    // shards carry their stored manifest rows forward — and the result
    // must hash-equal the FULL recompute over v2 (the oracle), so any
    // carry/rebuild seam drift fails the gate. 64 shards so the
    // carried set is actually non-empty at corpus scale
    Q(
      "corpus_export_incremental",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val v1 = docs.filter(col("doc_id") % 13 =!= 0)
        val v2 = docs.filter(col("doc_id") % 11 =!= 0)
          .withColumn("text", when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text")))
        val m1 = Corpus.shardManifest(v1, "doc_id", "text", 64)
        Corpus.incrementalShardManifest(v1, m1, v2, "doc_id", "text", 64)
          .orderBy(col("shard"))
      },
      Some("""WITH v2 AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
             |         ELSE text END AS text
             |  FROM documents WHERE doc_id % 11 <> 0),
             |t AS (
             |  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 64 AS INT) AS shard,
             |    doc_id,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS toks
             |  FROM v2)
             |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
             |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
             |FROM t GROUP BY shard ORDER BY shard""".stripMargin)),

    // the globally-SORTED export: exact two-pass ranks -> equal-depth
    // rank buckets -> partitionBy(bucket) write with in-bucket sort ->
    // read back -> manifest re-derivation. Rank-based boundaries (not
    // sampled ones) make the layout deterministic enough to hash
    // against the oracle; the curriculum-order write path, proven
    Q(
      "corpus_sorted_export",
      (s, dir) =>
        Corpus.exportSorted(table(s, dir, "documents"), "n_chars",
          "doc_id", "text", nBuckets = 8,
          // per-JVM dir: eager overwrite at construction time, same
          // single-writer contract as corpus_shard_export
          outDir = "/tmp/graft_sorted_export_" +
            new java.io.File(dir).getName + "_pid" +
            java.lang.ProcessHandle.current().pid()).orderBy(col("bucket")),
      Some("""WITH r AS (
             |  SELECT doc_id, n_chars, text,
             |    ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rk,
             |    COUNT(*) OVER () AS n
             |  FROM documents),
             |b AS (
             |  SELECT CAST((rk - 1) * 8 // n AS INT) AS bucket, doc_id,
             |    n_chars,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
             |      AS BIGINT) AS toks
             |  FROM r)
             |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
             |  MIN(n_chars) AS min_key, MAX(n_chars) AS max_key,
             |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
             |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // schema-evolution read over three corpus releases with divergent
    // PHYSICAL parquet schemas (renamed id/body, int-narrowed columns,
    // a release missing `source` entirely), projected through the
    // declared mapping onto the newest schema as one DataFrame. The
    // fixture is staged eagerly at plan-construction (pid-scoped,
    // single-writer contract), so the gate exercises real parquet
    // footers, not views: a silently dropped column, a wrong null-fill,
    // or a lossy cast breaks the hash against the UNION-ALL-BY-NAME
    // oracle recomputed from the base table
    Q(
      "corpus_schema_evolution",
      (s, dir) => {
        val base = "/tmp/graft_schema_evo_" + new java.io.File(dir).getName +
          "_pid" + java.lang.ProcessHandle.current().pid()
        val versions =
          SchemaEvolution.stageVersionFixture(table(s, dir, "documents"), base)
        SchemaEvolution.evolvedRead(s, versions,
          SchemaEvolution.FixtureRenames, SchemaEvolution.FixtureTarget)
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, text, lang, CAST(NULL AS VARCHAR) AS source,
             |  n_chars, 'v1' AS version
             |FROM documents WHERE doc_id % 3 = 0
             |UNION ALL BY NAME
             |SELECT doc_id, text, lang, source, n_chars, 'v2' AS version
             |FROM documents WHERE doc_id % 3 = 1
             |UNION ALL BY NAME
             |SELECT doc_id, text, lang, source, n_chars, 'v3' AS version
             |FROM documents WHERE doc_id % 3 = 2
             |ORDER BY doc_id""".stripMargin)),

    // small-file compaction plan over a 64-shard manifest: greedy
    // next-fit running sum in shard order packs undersized shards into
    // ~4000-token outputs — the window folds the 64-row manifest, never
    // the corpus
    Q(
      "corpus_compaction_plan",
      (s, dir) =>
        Corpus.compactionPlan(
          Corpus.shardManifest(table(s, dir, "documents"), "doc_id", "text",
            nShards = 64),
          "shard", "n_tokens", targetTokens = 4000L)
          .orderBy(col("out_id")),
      Some(compactionOracleSql)),

    // the rewrite job the plan describes, gated end to end (the
    // corpus_shard_export convention): documents routed through the
    // broadcast shard→bin table, written partitionBy(out_id), read
    // back, and the PLAN re-derived from the round-tripped rows —
    // same oracle as corpus_compaction_plan, so a lost/misrouted doc,
    // a bin seam off by one shard, or corrupted text breaks the hash
    Q(
      "corpus_compaction_apply",
      (s, dir) =>
        Corpus.applyCompaction(table(s, dir, "documents"), "doc_id",
          "text", nShards = 64, targetTokens = 4000L,
          // pid suffix: eager overwrite at plan-construction time —
          // single writer/reader per session (see corpus_shard_export)
          outDir = "/tmp/graft_compaction_" +
            new java.io.File(dir).getName + "_pid" +
            java.lang.ProcessHandle.current().pid()).orderBy(col("out_id")),
      Some(compactionOracleSql)),

    // C4-style line-level dedup: documents re-lined into 3-token lines
    // (the synthetic corpus has no newlines — the fixed re-lining is
    // reproduced verbatim in the oracle), then every line appearing in
    // more than maxDf documents is dropped from every document
    Q(
      "corpus_line_dedup",
      (s, dir) => {
        val ws = TextFunctions.tokens(col("text"))
        val n = org.apache.spark.sql.functions.size(ws).cast("long")
        val lined = table(s, dir, "documents").select(
          col("doc_id"),
          array_join(
            transform(
              // integer line count ceil(n/3): (n+2)/3 over small positive
              // longs — the double division is exact for every integral
              // quotient, and the cast floors the rest
              sequence(lit(0L),
                ((greatest(n, lit(1L)) + lit(2L)) / lit(3L)).cast("long") - 1),
              i => array_join(slice(ws, (i * 3 + 1).cast("int"), lit(3)), " ")),
            "\n").as("lined"))
        Dedup.dedupLines(lined, "doc_id", "lined", "\n", maxDf = 3)
          .select(col("doc_id"),
            md5(col("clean_text").cast("binary")).as("clean_md5"),
            col("kept_lines"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $toksCte,
             |lined AS (
             |  SELECT doc_id, list_transform(
             |    range(0, CAST((greatest(len(ws), 1) + 2) // 3 AS BIGINT)),
             |    i -> array_to_string(ws[i*3+1:i*3+3], ' ')) AS lines
             |  FROM toks),
             |freq AS (
             |  SELECT line FROM (
             |    SELECT DISTINCT doc_id, unnest(lines) AS line FROM lined)
             |  GROUP BY line HAVING COUNT(*) > 3),
             |fl AS (SELECT COALESCE(list(line), []) AS f FROM freq),
             |kept AS (
             |  SELECT doc_id,
             |    list_filter(lines, l -> NOT list_contains(f, l)) AS k
             |  FROM lined, fl)
             |-- COALESCE: array_to_string([]) is NULL in DuckDB, but a
             |-- fully-dropped document's cleaned text IS the empty
             |-- string (surfaced by the sf0.001 corpus, where short
             |-- docs can lose every line)
             |SELECT doc_id,
             |  md5(COALESCE(array_to_string(k, chr(10)), '')) AS clean_md5,
             |  CAST(len(k) AS BIGINT) AS kept_lines
             |FROM kept ORDER BY doc_id""".stripMargin)),

    // sliding token-window chunking (RAG/embedding prep): 40-token
    // windows advancing 30 tokens, short docs one chunk, empty docs none
    Q(
      "corpus_rag_chunks",
      (s, dir) =>
        Corpus.chunkByTokens(table(s, dir, "documents"), "doc_id", "text",
          size = 40, overlap = 10)
          .select(col("doc_id"), col("chunk_id"), col("chunk_tokens"),
            md5(col("chunk").cast("binary")).as("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_id")),
      Some(s"""WITH $toksCte,
             |n AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n FROM toks),
             |c AS (
             |  SELECT doc_id, ws, n, unnest(range(0,
             |    CASE WHEN n <= 0 THEN 0
             |         ELSE CAST((greatest(n - 10, 1) + 29) // 30 AS BIGINT)
             |    END)) AS chunk_id
             |  FROM n)
             |SELECT doc_id, chunk_id,
             |  CAST(least(40, n - chunk_id*30) AS BIGINT) AS chunk_tokens,
             |  md5(array_to_string(ws[chunk_id*30+1:chunk_id*30+40], ' ')) AS chunk_md5
             |FROM c ORDER BY doc_id, chunk_id""".stripMargin)),

    // canonical normalization: case-fold, accent-fold (native codegen'd
    // strip_accents), whitespace-collapse, trim — the decorated input
    // exercises every step on the all-ASCII corpus
    Q(
      "corpus_normalize",
      (s, dir) =>
        table(s, dir, "documents")
          .select(col("doc_id"),
            Corpus.normalizeText(
              concat(lit("  ÉMILE\t"), col("text"), lit("  naïve  ")))
              .as("norm"))
          .select(col("doc_id"), md5(col("norm").cast("binary")).as("norm_md5"),
            length(col("norm")).cast("bigint").as("norm_len"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  md5(trim(regexp_replace(strip_accents(lower(
             |    '  ÉMILE' || chr(9) || text || '  naïve  ')), '\s+', ' ', 'g'))) AS norm_md5,
             |  CAST(len(trim(regexp_replace(strip_accents(lower(
             |    '  ÉMILE' || chr(9) || text || '  naïve  ')), '\s+', ' ', 'g'))) AS BIGINT) AS norm_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // exact per-language length percentiles via the counting construction
    // — integer rank ceil(n*p/100), no raw-row sort on either engine
    Q(
      "corpus_percentiles",
      (s, dir) =>
        Corpus.percentilesByCounting(table(s, dir, "documents"),
          "lang", "n_chars", Seq(50, 90, 99))
          .orderBy(col("lang")),
      Some("""WITH c AS (
             |  SELECT lang, n_chars, COUNT(*) AS cnt
             |  FROM documents GROUP BY 1, 2),
             |w AS (
             |  SELECT lang, n_chars,
             |    SUM(cnt) OVER (PARTITION BY lang ORDER BY n_chars
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    SUM(cnt) OVER (PARTITION BY lang) AS n
             |  FROM c)
             |SELECT lang,
             |  MIN(CASE WHEN cum >= (n*50 + 99) // 100 THEN n_chars END) AS p50,
             |  MIN(CASE WHEN cum >= (n*90 + 99) // 100 THEN n_chars END) AS p90,
             |  MIN(CASE WHEN cum >= (n*99 + 99) // 100 THEN n_chars END) AS p99
             |FROM w GROUP BY lang ORDER BY lang""".stripMargin)),

    // CCNet-style LM quality score: bigram stats trained on the lang='en'
    // slice, every doc scored by mean add-one-smoothed bigram probability
    // in pure-integer fixed point (Corpus.lmScore — deliberately log-free;
    // ln is not correctly rounded across libm builds)
    Q(
      "corpus_lm_score",
      (s, dir) =>
        Corpus.lmScore(table(s, dir, "documents"), "doc_id", "text",
          col("lang") === "en")
          .orderBy(col("doc_id")),
      Some(s"""WITH ltoks AS (
             |  SELECT doc_id, lang,
             |    list_filter(string_split(lower(text), ' '), x -> x != '') AS ws
             |  FROM documents),
             |pos AS (SELECT doc_id, lang, ws, unnest(range(1, len(ws))) AS i FROM ltoks),
             |bg AS (SELECT doc_id, lang, ws[i] AS w1, ws[i+1] AS w2 FROM pos),
             |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg WHERE lang = 'en' GROUP BY 1, 2),
             |uni AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY 1),
             |voc AS (SELECT COUNT(DISTINCT tok) AS v FROM
             |  (SELECT w1 AS tok FROM big UNION SELECT w2 AS tok FROM big)),
             |contrib AS (
             |  SELECT bg.doc_id,
             |    ((COALESCE(c12, 0) + 1) * ${Corpus.LmProbScale}) //
             |      (COALESCE(c1, 0) + (SELECT v FROM voc)) AS c
             |  FROM bg LEFT JOIN big USING (w1, w2) LEFT JOIN uni USING (w1)),
             |agg AS (SELECT doc_id, SUM(c) AS s, COUNT(*) AS n FROM contrib GROUP BY 1)
             |SELECT d.doc_id, CAST(COALESCE(a.n, 0) AS BIGINT) AS n_bigrams,
             |  CAST(a.s // a.n AS BIGINT) AS lm_score
             |FROM documents d LEFT JOIN agg a USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // CCNet head/middle/tail bucketing (Wenzek et al. 2019): per-LANGUAGE
    // percentile cuts over the lm_score — CCNet's core trick is that
    // perplexity only compares within a language. Counting percentiles
    // over the fixed-point score domain; cut table broadcast back.
    Q(
      "corpus_ccnet_buckets",
      (s, dir) =>
        Corpus.ccnetBuckets(table(s, dir, "documents"), "doc_id", "text",
          "lang", col("lang") === "en")
          .orderBy(col("doc_id")),
      Some(s"""WITH ltoks AS (
             |  SELECT doc_id, lang,
             |    list_filter(string_split(lower(text), ' '), x -> x != '') AS ws
             |  FROM documents),
             |pos AS (SELECT doc_id, lang, ws, unnest(range(1, len(ws))) AS i FROM ltoks),
             |bg AS (SELECT doc_id, lang, ws[i] AS w1, ws[i+1] AS w2 FROM pos),
             |big AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg WHERE lang = 'en' GROUP BY 1, 2),
             |uni AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY 1),
             |voc AS (SELECT COUNT(DISTINCT tok) AS v FROM
             |  (SELECT w1 AS tok FROM big UNION SELECT w2 AS tok FROM big)),
             |contrib AS (
             |  SELECT bg.doc_id,
             |    ((COALESCE(c12, 0) + 1) * ${Corpus.LmProbScale}) //
             |      (COALESCE(c1, 0) + (SELECT v FROM voc)) AS c
             |  FROM bg LEFT JOIN big USING (w1, w2) LEFT JOIN uni USING (w1)),
             |agg AS (SELECT doc_id, SUM(c) AS s, COUNT(*) AS n FROM contrib GROUP BY 1),
             |scored AS (
             |  SELECT d.doc_id, d.lang, CAST(a.s // a.n AS BIGINT) AS lm_score
             |  FROM documents d LEFT JOIN agg a USING (doc_id)),
             |c AS (SELECT lang, lm_score, COUNT(*) AS cnt FROM scored
             |  WHERE lm_score IS NOT NULL GROUP BY 1, 2),
             |w AS (SELECT lang, lm_score,
             |  SUM(cnt) OVER (PARTITION BY lang ORDER BY lm_score
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |  SUM(cnt) OVER (PARTITION BY lang) AS n FROM c),
             |cuts AS (SELECT lang,
             |  MIN(CASE WHEN cum >= (n*33 + 99) // 100 THEN lm_score END) AS p33,
             |  MIN(CASE WHEN cum >= (n*67 + 99) // 100 THEN lm_score END) AS p67
             |  FROM w GROUP BY lang)
             |SELECT s.doc_id, s.lang, s.lm_score,
             |  CASE WHEN s.lm_score IS NULL THEN 'tail'
             |       WHEN s.lm_score >= c.p67 THEN 'head'
             |       WHEN s.lm_score >= c.p33 THEN 'middle'
             |       ELSE 'tail' END AS bucket
             |FROM scored s LEFT JOIN cuts c USING (lang)
             |ORDER BY s.doc_id""".stripMargin)),

    // DSIR hashed-unigram importance selection (Xie et al. 2023): which
    // documents look most like the src0 slice. Bucket counts in one
    // aggregate, totals folded from the bucket table, weight table
    // broadcast for scoring, bounded top-k. Unsmoothed scaled frequency
    // difference (+scale shift) instead of the smoothed log-ratio —
    // integer-exact on any engine.
    Q(
      "corpus_dsir_select",
      (s, dir) =>
        Corpus.dsirSelect(table(s, dir, "documents"), "doc_id", "text",
          col("source") === "src0", buckets = 4096, k = 100),
      Some(s"""WITH toks AS (
             |  SELECT doc_id, (source = 'src0') AS tgt,
             |    unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS w
             |  FROM documents),
             |tb AS (SELECT doc_id, tgt,
             |  ('0x' || substr(md5(w), 1, 8))::BIGINT % 4096 AS b FROM toks),
             |bc AS (SELECT b, COUNT(*) AS cr,
             |  SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct FROM tb GROUP BY 1),
             |tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM bc),
             |wt AS (SELECT b,
             |  (ct * ${Corpus.DsirScale}) // (nt + 1)
             |    - (cr * ${Corpus.DsirScale}) // (nr + 1)
             |    + ${Corpus.DsirScale} AS wtv
             |  FROM bc, tot),
             |sc AS (SELECT tb.doc_id, SUM(wtv) AS s, COUNT(*) AS n
             |  FROM tb JOIN wt USING (b) GROUP BY 1)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             |  CAST(s // n AS BIGINT) AS dsir_score
             |FROM sc ORDER BY dsir_score DESC, doc_id LIMIT 100""".stripMargin)),

    // Gopher rule filter (Rae et al. 2021 Appendix A shape): per-rule
    // audit flags, every ratio rearranged into integer cross-
    // multiplication — zero floats on either engine. minWords=30 so the
    // word-count rule actually splits the synthetic corpus.
    Q(
      "corpus_gopher_rules",
      (s, dir) =>
        Corpus.gopherRules(table(s, dir, "documents"), "doc_id", "text",
          minWords = 30, maxWords = 100000, stops = GopherQueryStops)
          .select("doc_id", "n_words", "ok_words", "ok_mean_len",
            "ok_symbols", "ok_alpha", "ok_stops", "keep")
          .orderBy(col("doc_id")),
      Some {
        val stops = GopherQueryStops.map(s0 => s"'$s0'")
          .mkString("[", ", ", "]")
        s"""WITH $toksCte,
           |m AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
           |  CAST(COALESCE(list_sum(list_transform(ws, w -> len(w))), 0) AS BIGINT) AS sl,
           |  CAST(len(list_filter(ws, w -> contains(w, '#') OR contains(w, '...'))) AS BIGINT) AS sym,
           |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS al,
           |  CAST(len(list_filter($stops,
           |    s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS BIGINT) AS st
           |  FROM toks)
           |SELECT doc_id, n AS n_words,
           |  (n >= 30 AND n <= 100000) AS ok_words,
           |  (sl >= n * 3 AND sl <= n * 10) AS ok_mean_len,
           |  (sym * 10 <= n) AS ok_symbols,
           |  (al * 5 >= n * 4) AS ok_alpha,
           |  (st >= 2) AS ok_stops,
           |  (n >= 30 AND n <= 100000 AND sl >= n * 3 AND sl <= n * 10
           |    AND sym * 10 <= n AND al * 5 >= n * 4 AND st >= 2) AS keep
           |FROM m ORDER BY doc_id""".stripMargin
      }),


    // Gopher's REPETITION rules (Rae et al. 2021, Table A1) — the
    // other half of the quality suite: duplicate-line fractions, the
    // dominant 2/3/4-gram's char mass, and the overlap-aware union of
    // characters inside 5..10-grams occurring twice — all integer
    // cross-multiplied. The fixture re-lines each doc (4-token lines)
    // and PLANTS repetition: every 3rd doc repeats its first line,
    // every 4th appends its first six tokens twice back to back — so
    // both the line gate and the n-gram gates genuinely split the
    // corpus, and the oracle recomputes every count, max, and coverage
    // union from the same fixture bytes.
    Q(
      "corpus_repetition_rules",
      (s, dir) => {
        val ws = TextFunctions.tokens(col("text"))
        val nw = org.apache.spark.sql.functions.size(ws).cast("long")
        val lined = array_join(
          transform(
            sequence(lit(0L),
              ((greatest(nw, lit(1L)) + lit(3L)) / lit(4L)).cast("long") - 1),
            i => array_join(slice(ws, (i * 4 + 1).cast("int"), lit(4)), " ")),
          "\n")
        val firstLine = array_join(slice(ws, 1, 4), " ")
        val six = array_join(slice(ws, 1, 6), " ")
        val fixture = concat(lined,
          when(col("doc_id") % 3 === 0, concat(lit("\n"), firstLine))
            .otherwise(lit("")),
          when(col("doc_id") % 4 === 0,
            concat(lit("\n"), six, lit(" "), six)).otherwise(lit("")))
        Corpus.repetitionRules(
          table(s, dir, "documents")
            .select(col("doc_id"), fixture.as("text"))
            // the planted-repetition fixture is interpreted HOF work;
            // materialize it once instead of once per rule family
            .localCheckpoint(true),
          "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks0 AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
             |  FROM documents),
             |fx AS MATERIALIZED (
             |  SELECT doc_id,
             |    array_to_string(list_transform(
             |      range(0, CAST((greatest(len(ws), 1) + 3) // 4 AS BIGINT)),
             |      i -> array_to_string(ws[i*4+1:i*4+4], ' ')), chr(10))
             |    || CASE WHEN doc_id % 3 = 0
             |            THEN chr(10) || array_to_string(ws[1:4], ' ') ELSE '' END
             |    || CASE WHEN doc_id % 4 = 0
             |            THEN chr(10) || array_to_string(ws[1:6], ' ') || ' '
             |              || array_to_string(ws[1:6], ' ') ELSE '' END AS text
             |  FROM toks0),
             |t2 AS MATERIALIZED (
             |  SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS ws,
             |    list_filter(list_transform(string_split(text, chr(10)),
             |      l -> trim(l, ' ')), l -> l != '') AS ls
             |  FROM fx),
             |tc AS (SELECT doc_id,
             |  CAST(COALESCE(list_sum(list_transform(ws, w -> len(w))), 0) AS BIGINT) AS totch
             |  FROM t2),
             |lc AS (SELECT doc_id, l, COUNT(*) AS c
             |  FROM (SELECT doc_id, unnest(ls) AS l FROM t2) GROUP BY 1, 2),
             |la AS (SELECT doc_id, SUM(c) AS nl,
             |  SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dl,
             |  SUM(CASE WHEN c >= 2
             |      THEN c * len(regexp_replace(l, '\s+', '', 'g')) ELSE 0 END) AS dch
             |  FROM lc GROUP BY 1),
             |wk AS MATERIALIZED (
             |  SELECT doc_id, n, i, array_to_string(ws[i+1:i+n], ' ') AS g
             |  FROM (SELECT doc_id, n, ws,
             |          unnest(range(0, greatest(len(ws) - n + 1, 0))) AS i
             |        FROM t2, (SELECT unnest([2,3,4,5,6,7,8,9,10]) AS n) ns)),
             |wc AS MATERIALIZED (
             |  SELECT doc_id, n, g, COUNT(*) AS c FROM wk GROUP BY 1, 2, 3),
             |topa AS (SELECT doc_id,
             |  MAX(CASE WHEN n = 2 AND c >= 2 THEN c * (len(g) - 1) END) AS top2,
             |  MAX(CASE WHEN n = 3 AND c >= 2 THEN c * (len(g) - 2) END) AS top3,
             |  MAX(CASE WHEN n = 4 AND c >= 2 THEN c * (len(g) - 3) END) AS top4
             |  FROM wc GROUP BY 1),
             |dk AS (SELECT doc_id, n, g FROM wc WHERE c >= 2 AND n >= 5),
             |cov AS (SELECT DISTINCT doc_id, n, p FROM (
             |  SELECT w.doc_id, w.n, unnest(range(w.i, w.i + w.n)) AS p
             |  FROM wk w JOIN dk USING (doc_id, n, g))),
             |tll AS MATERIALIZED (
             |  SELECT doc_id, p, CAST(len(ws[p+1]) AS BIGINT) AS wlen
             |  FROM (SELECT doc_id, ws, unnest(range(0, len(ws))) AS p FROM t2)),
             |da AS (SELECT c2.doc_id,
             |  SUM(CASE WHEN c2.n = 5 THEN t.wlen END) AS dup5,
             |  SUM(CASE WHEN c2.n = 6 THEN t.wlen END) AS dup6,
             |  SUM(CASE WHEN c2.n = 7 THEN t.wlen END) AS dup7,
             |  SUM(CASE WHEN c2.n = 8 THEN t.wlen END) AS dup8,
             |  SUM(CASE WHEN c2.n = 9 THEN t.wlen END) AS dup9,
             |  SUM(CASE WHEN c2.n = 10 THEN t.wlen END) AS dup10
             |  FROM cov c2 JOIN tll t USING (doc_id, p) GROUP BY 1)
             |SELECT tc.doc_id,
             |  CAST(COALESCE(dl, 0) * 1000 // greatest(COALESCE(nl, 0), 1) AS BIGINT) AS dup_line_pm,
             |  CAST(COALESCE(dch, 0) * 1000 // greatest(totch, 1) AS BIGINT) AS dup_line_char_pm,
             |  CAST(COALESCE(top2, 0) * 1000 // greatest(totch, 1) AS BIGINT) AS top2_pm,
             |  CAST(COALESCE(top3, 0) * 1000 // greatest(totch, 1) AS BIGINT) AS top3_pm,
             |  CAST(COALESCE(top4, 0) * 1000 // greatest(totch, 1) AS BIGINT) AS top4_pm,
             |  CAST(COALESCE(dup5, 0) * 1000 // greatest(totch, 1) AS BIGINT) AS dup5_pm,
             |  CAST(COALESCE(dup6, 0) * 1000 // greatest(totch, 1) AS BIGINT) AS dup6_pm,
             |  CAST(COALESCE(dup7, 0) * 1000 // greatest(totch, 1) AS BIGINT) AS dup7_pm,
             |  CAST(COALESCE(dup8, 0) * 1000 // greatest(totch, 1) AS BIGINT) AS dup8_pm,
             |  CAST(COALESCE(dup9, 0) * 1000 // greatest(totch, 1) AS BIGINT) AS dup9_pm,
             |  CAST(COALESCE(dup10, 0) * 1000 // greatest(totch, 1) AS BIGINT) AS dup10_pm,
             |  (COALESCE(dl, 0) * 100 <= greatest(COALESCE(nl, 0), 1) * 30
             |   AND COALESCE(dch, 0) * 100 <= greatest(totch, 1) * 20
             |   AND COALESCE(top2, 0) * 100 <= greatest(totch, 1) * 20
             |   AND COALESCE(top3, 0) * 100 <= greatest(totch, 1) * 18
             |   AND COALESCE(top4, 0) * 100 <= greatest(totch, 1) * 16
             |   AND COALESCE(dup5, 0) * 100 <= greatest(totch, 1) * 15
             |   AND COALESCE(dup6, 0) * 100 <= greatest(totch, 1) * 14
             |   AND COALESCE(dup7, 0) * 100 <= greatest(totch, 1) * 13
             |   AND COALESCE(dup8, 0) * 100 <= greatest(totch, 1) * 12
             |   AND COALESCE(dup9, 0) * 100 <= greatest(totch, 1) * 11
             |   AND COALESCE(dup10, 0) * 100 <= greatest(totch, 1) * 10) AS keep
             |FROM tc
             |LEFT JOIN la USING (doc_id)
             |LEFT JOIN topa USING (doc_id)
             |LEFT JOIN da USING (doc_id)
             |ORDER BY tc.doc_id""".stripMargin)),

    // the curation FUNNEL report over the same rule set: every document
    // attributed to the FIRST rule it fails in declared order (a doc
    // failing three rules is charged once, where the pipeline actually
    // drops it — the number the flags alone don't give), plus the docs
    // and word volume each rule costs. Map-side case over the flag
    // projection, one 6-key census aggregate — the report every
    // curation run prints before anyone tunes a threshold.
    // minWords=40 and a 2-word stop probe make BOTH tunable rules
    // actually split this corpus (symbols/alpha/mean-len are
    // structurally green on the synthetic text and report zero cost —
    // absent stages, which is the census semantics)
    Q(
      "corpus_filter_funnel",
      (s, dir) => {
        val flags = Corpus.gopherRules(table(s, dir, "documents"),
          "doc_id", "text", minWords = 40, maxWords = 100000,
          stops = FunnelStops)
        val stage = when(!col("ok_words"), "1_words")
          .when(!col("ok_mean_len"), "2_mean_len")
          .when(!col("ok_symbols"), "3_symbols")
          .when(!col("ok_alpha"), "4_alpha")
          .when(!col("ok_stops"), "5_stops")
          .otherwise("6_kept")
        flags.select(stage.as("stage"), col("n_words"))
          .groupBy(col("stage"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"))
          .orderBy(col("stage"))
      },
      Some {
        val stops = FunnelStops.map(s0 => s"'$s0'")
          .mkString("[", ", ", "]")
        s"""WITH $toksCte,
           |m AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
           |  CAST(COALESCE(list_sum(list_transform(ws, w -> len(w))), 0) AS BIGINT) AS sl,
           |  CAST(len(list_filter(ws, w -> contains(w, '#') OR contains(w, '...'))) AS BIGINT) AS sym,
           |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS al,
           |  CAST(len(list_filter($stops,
           |    s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS BIGINT) AS st
           |  FROM toks),
           |f AS (SELECT doc_id, n,
           |  CASE WHEN NOT (n >= 40 AND n <= 100000) THEN '1_words'
           |       WHEN NOT (sl >= n * 3 AND sl <= n * 10) THEN '2_mean_len'
           |       WHEN NOT (sym * 10 <= n) THEN '3_symbols'
           |       WHEN NOT (al * 5 >= n * 4) THEN '4_alpha'
           |       WHEN NOT (st >= 2) THEN '5_stops'
           |       ELSE '6_kept' END AS stage
           |  FROM m)
           |SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n) AS BIGINT) AS n_words
           |FROM f GROUP BY 1 ORDER BY stage""".stripMargin
      }),

    // composed curation v2 chaining the round-4 operators: canonical
    // normalization → duplicated-span gate (drop majority-duplicated
    // docs) → gopher rule gate → deterministic hash split. Every stage
    // is the SAME operator the standalone queries verify; the compose
    // proves they agree end-to-end on one engine-exact answer.
    Q(
      "corpus_curation_v2",
      (s, dir) => {
        // the normalized projection feeds THREE consumers (span scan,
        // gopher scan, final checksum) — materialize it once instead of
        // re-reading and re-normalizing the corpus per consumer
        val norm = table(s, dir, "documents")
          .select(col("doc_id"), Corpus.normalizeText(col("text")).as("text"))
          .localCheckpoint(true)
        val spans = Dedup.duplicateSpans(norm, "doc_id", "text", window = 8)
          .select(col("doc_id"), col("n_windows"), col("n_dup_windows"))
        val gated = Corpus.gopherRules(norm, "doc_id", "text",
            minWords = 30, maxWords = 100000, stops = GopherQueryStops)
          .filter(col("keep"))
          .join(spans, Seq("doc_id"))
          .filter(col("n_dup_windows") * 2 <= col("n_windows"))
        Corpus.splitByHash(gated, "doc_id",
            Seq("val" -> "0d", "test" -> "1a"), "train")
          .select(col("doc_id"), col("split"),
            md5(col("text").cast("binary")).as("norm_md5"))
          .orderBy(col("doc_id"))
      },
      Some {
        val stops = GopherQueryStops.map(s0 => s"'$s0'")
          .mkString("[", ", ", "]")
        s"""WITH nt AS (SELECT doc_id,
           |  trim(regexp_replace(strip_accents(lower(text)), '\\s+', ' ', 'g')) AS text
           |  FROM documents),
           |tn AS (SELECT doc_id, text,
           |  list_filter(string_split(text, ' '), x -> x != '') AS ws FROM nt),
           |pos AS (SELECT doc_id, ws,
           |  unnest(range(0, greatest(CAST(len(ws) AS BIGINT) - 7, 0))) AS p
           |  FROM tn),
           |win AS (SELECT doc_id, p,
           |  md5(array_to_string(ws[p+1:p+8], ' ')) AS h FROM pos),
           |dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM win)
           |  GROUP BY h HAVING COUNT(*) > 1),
           |sagg AS (
           |  SELECT w.doc_id, COUNT(*) AS nw,
           |    COUNT(CASE WHEN w.h IN (SELECT h FROM dup) THEN 1 END) AS nd
           |  FROM win w GROUP BY 1),
           |gm AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
           |  CAST(COALESCE(list_sum(list_transform(ws, w -> len(w))), 0) AS BIGINT) AS sl,
           |  CAST(len(list_filter(ws, w -> contains(w, '#') OR contains(w, '...'))) AS BIGINT) AS sym,
           |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS al,
           |  CAST(len(list_filter($stops,
           |    s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS BIGINT) AS st
           |  FROM tn),
           |kept AS (
           |  SELECT t.doc_id, t.text FROM tn t
           |  JOIN gm g ON g.doc_id = t.doc_id
           |  JOIN sagg sp ON sp.doc_id = t.doc_id
           |  WHERE g.n >= 30 AND g.n <= 100000 AND g.sl >= g.n * 3
           |    AND g.sl <= g.n * 10 AND g.sym * 10 <= g.n
           |    AND g.al * 5 >= g.n * 4 AND g.st >= 2
           |    AND sp.nd * 2 <= sp.nw)
           |SELECT doc_id,
           |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '0d' THEN 'val'
           |       WHEN md5(CAST(doc_id AS VARCHAR)) < '1a' THEN 'test'
           |       ELSE 'train' END AS split,
           |  md5(text) AS norm_md5
           |FROM kept ORDER BY doc_id""".stripMargin
      }),

    Q(
      "text_search_topk",
      (s, dir) =>
        Corpus.lexicalTopK(table(s, dir, "documents"), "doc_id", "text",
          SearchQuery, k = 10)
          .orderBy(col("rank")),
      Some(lexOracleSql)),

    // hybrid retrieval: reciprocal-rank fusion of the tf-idf lexical
    // top-10 and the BM25 top-10 — integer 10^6 DIV (60 + rank)
    // contributions, so incomparable score scales combine with no
    // calibration and both engines fuse identically
    Q(
      "text_hybrid_rrf",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Corpus.rrfFuse(Seq(
          Corpus.lexicalTopK(docs, "doc_id", "text", SearchQuery, k = 10),
          Corpus.bm25TopK(docs, "doc_id", "text", SearchQuery, k = 10)),
          rrfK = 60, k = 10)
          .orderBy(col("rank"))
      },
      Some(s"""WITH u AS (
             |  SELECT doc, 1000000 // (60 + rank) AS c FROM ($lexOracleSql) l
             |  UNION ALL
             |  SELECT doc, 1000000 // (60 + rank) AS c FROM ($bm25OracleSql) b),
             |fs AS (SELECT doc, CAST(SUM(c) AS BIGINT) AS rrf_score
             |       FROM u GROUP BY 1)
             |SELECT doc, rank, rrf_score FROM (
             |  SELECT doc,
             |    CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc) AS INT) AS rank,
             |    rrf_score
             |  FROM fs) t
             |WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // THREE-arm hybrid retrieval: lexical tf-idf + BM25 + a DENSE arm
    // (the query string's feature-hashed embedding dotted against every
    // doc's hashed embedding — the model-free stand-in with the same
    // schema a learned encoder drops into), fused by integer RRF. The
    // full retrieval stack in one gated query
    Q(
      "text_hybrid_dense",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
        // the query string's 16-dim hashed embedding: one bounded 1-row
        // collect (the kmeans driver-scalar pattern)
        val qv = Corpus.hashedEmbedding(
          Seq((0L, SearchQuery)).toDF("doc_id", "text"), "doc_id", "text",
          dim = 16).select(col("hvec")).head().getSeq[Long](0)
        val qvLit = array(qv.map(lit(_)): _*)
        val denseTop = Corpus.hashedEmbedding(docs, "doc_id", "text", dim = 16)
          .withColumn("__qv", qvLit)
          .withColumn("score",
            expr("aggregate(zip_with(hvec, __qv, (a, b) -> a * b), 0L, " +
              "(acc, x) -> acc + x)"))
          .agg(graft.functions.TopKByScore.top_k_by_score(
            col("score").cast("double"), col("doc_id"), 10).as("top"))
          .select(posexplode(col("top")).as(Seq("r0", "t")))
          .select(col("t.id").as("doc"), (col("r0") + 1).cast("int").as("rank"))
        Corpus.rrfFuse(Seq(
          Corpus.lexicalTopK(docs, "doc_id", "text", SearchQuery, k = 10),
          Corpus.bm25TopK(docs, "doc_id", "text", SearchQuery, k = 10),
          denseTop),
          rrfK = 60, k = 10)
          .orderBy(col("rank"))
      },
      Some {
        val terms = SearchQuery.split("\\s+").distinct.toSeq
          .map(t => s"'$t'").mkString(", ")
        val denseSql =
          s"""(WITH $toksCte,
             |idx AS (SELECT doc_id, unnest(ws) AS tok FROM toks),
             |hv0 AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h,
             |    ('0x' || substr(md5(tok), 13, 1))::BIGINT AS sb FROM idx),
             |comp AS (SELECT doc_id, CAST(h % 16 AS INT) AS j,
             |    CAST(SUM(CASE WHEN sb % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
             |  FROM hv0 GROUP BY 1, 2),
             |qv AS (SELECT CAST(h % 16 AS INT) AS j,
             |    CAST(SUM(CASE WHEN sb % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
             |  FROM (SELECT ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h,
             |      ('0x' || substr(md5(tok), 13, 1))::BIGINT AS sb
             |    FROM (SELECT unnest([$terms]) AS tok) qt) qh
             |  GROUP BY 1),
             |ds AS (SELECT c.doc_id AS doc, CAST(SUM(c.v * q.v) AS BIGINT) AS score
             |  FROM comp c JOIN qv q USING (j) GROUP BY 1)
             |SELECT doc, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc) AS INT) AS rank
             |FROM ds ORDER BY rank LIMIT 10)""".stripMargin
        s"""WITH u AS (
           |  SELECT doc, 1000000 // (60 + rank) AS c FROM ($lexOracleSql) l
           |  UNION ALL
           |  SELECT doc, 1000000 // (60 + rank) AS c FROM ($bm25OracleSql) b
           |  UNION ALL
           |  SELECT doc, 1000000 // (60 + rank) AS c FROM $denseSql d),
           |fs AS (SELECT doc, CAST(SUM(c) AS BIGINT) AS rrf_score
           |       FROM u GROUP BY 1)
           |SELECT doc, rank, rrf_score FROM (
           |  SELECT doc,
           |    CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc) AS INT) AS rank,
           |    rrf_score
           |  FROM fs) t
           |WHERE rank <= 10 ORDER BY rank""".stripMargin
      }),

    // "more like this" for doc 42 over 3-gram SHINGLE features: rare
    // shared shingles rank near-dups first, topical overlaps after —
    // probe features broadcast, postings semi-joined before any
    // counting, stop-shingles dropped at the scale-proportional cut
    // df > nDocs/2, bounded top-k
    Q(
      "text_more_like_this",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        // pre-tokenize into a materialized projection (the caller
        // contract on moreLikeThis: never hand it features over raw
        // text — see the CollapseProject note there)
        val toked = docs.select(col("doc_id"),
          TextFunctions.tokens(col("text")).as("__ws"))
        Corpus.moreLikeThis(toked, "doc_id",
          TextFunctions.shinglesFromTokens(col("__ws"), 3),
          probeId = 42L, k = 10, maxDf = docs.count() / 2)
          .orderBy(col("rank"))
      },
      Some(s"""WITH $toksCte, $shingleCte,
             |idx AS (SELECT doc_id AS doc, unnest(shingles) AS tok FROM sh),
             |probe AS (SELECT tok FROM idx WHERE doc = 42),
             |post AS (SELECT i.doc, i.tok FROM idx i JOIN probe USING (tok)),
             |dfreq AS (
             |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM post
             |  GROUP BY 1
             |  HAVING COUNT(*) <= (SELECT COUNT(*) FROM documents) // 2),
             |sc AS (
             |  SELECT doc, CAST(SUM(1000000 // df) AS BIGINT) AS score
             |  FROM post JOIN dfreq USING (tok) WHERE doc != 42 GROUP BY doc)
             |SELECT doc, rank, score FROM (
             |  SELECT doc, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc) AS INT) AS rank, score
             |  FROM sc) t
             |WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // top-30 PMI collocations: adjacent-pair counts vs unigram
    // marginals, ranked by the scaled integer rational core of PMI
    // (the log is monotone, so it never needs computing) — map-only
    // bigram build, partial-aggregated counts, bounded top-k
    Q(
      "text_pmi_pairs",
      (s, dir) =>
        Corpus.pmiCollocations(table(s, dir, "documents"), "text",
          minCount = 5L, k = 30),
      Some("""WITH lt AS (
             |  SELECT list_filter(string_split(lower(text), ' '), x -> x != '') AS ws
             |  FROM documents),
             |n AS (SELECT CAST(SUM(len(ws)) AS BIGINT) AS n FROM lt),
             |uni AS (
             |  SELECT tok AS w, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM (SELECT unnest(ws) AS tok FROM lt) GROUP BY 1),
             |bl AS (
             |  SELECT list_transform(range(1, len(ws)),
             |    i -> ws[i] || ' ' || ws[i+1]) AS bs
             |  FROM lt),
             |bp AS (SELECT unnest(bs) AS b FROM bl),
             |pc AS (
             |  SELECT string_split(b, ' ')[1] AS w1, string_split(b, ' ')[2] AS w2,
             |    CAST(COUNT(*) AS BIGINT) AS c_ab
             |  FROM bp GROUP BY 1, 2 HAVING COUNT(*) >= 5)
             |SELECT w1, w2, c_ab,
             |  CAST(c_ab * (SELECT n FROM n) * 1000000 // (ua.c * ub.c) AS BIGINT) AS pmi_ppm
             |FROM pc JOIN uni ua ON ua.w = pc.w1 JOIN uni ub ON ub.w = pc.w2
             |ORDER BY pmi_ppm DESC, w1, w2 LIMIT 30""".stripMargin)),

    // TextRank keywords: edge-weighted integer PageRank over the
    // adjacent-token graph (canonical undirected edges, minCount
    // prune) — graph centrality instead of raw frequency; oracle
    // unrolls the identical weighted rounds over the same 56-bit
    // md5 word ids and decodes through the same vocab join
    Q(
      "text_textrank",
      (s, dir) =>
        Corpus.textRankKeywords(table(s, dir, "documents"), "text",
          minCount = 5L, iters = 4, k = 30)
          .orderBy(col("rank")),
      Some {
        val rounds = (1 to 4).map { i =>
          s"""r$i AS (
             |  SELECT n.node,
             |    CAST(150000 + 850000 * COALESCE(inf.s, 0) // 1000000 AS BIGINT) AS r
             |  FROM nodes n LEFT JOIN (
             |    SELECT e.dst, SUM(rp.r * e.w // ow.ow) AS s
             |    FROM e JOIN r${i - 1} rp ON rp.node = e.src
             |    JOIN ow ON ow.node = e.src
             |    GROUP BY e.dst) inf ON inf.dst = n.node)""".stripMargin
        }.mkString(",\n")
        s"""WITH lt AS (
           |  SELECT list_filter(string_split(lower(text), ' '), x -> x != '') AS ws
           |  FROM documents),
           |bl AS (
           |  SELECT list_transform(range(1, len(ws)),
           |    i -> ws[i] || ' ' || ws[i+1]) AS bs FROM lt),
           |bp AS (
           |  SELECT string_split(b0, ' ')[1] AS w1, string_split(b0, ' ')[2] AS w2
           |  FROM (SELECT unnest(bs) AS b0 FROM bl) u),
           |p AS MATERIALIZED (
           |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS w FROM (
           |    SELECT CASE WHEN w1 < w2 THEN w1 ELSE w2 END AS a,
           |           CASE WHEN w1 < w2 THEN w2 ELSE w1 END AS b
           |    FROM bp WHERE w1 != w2) c
           |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
           |e AS MATERIALIZED (
           |  SELECT ('0x' || substr(md5(a), 1, 14))::BIGINT AS src,
           |         ('0x' || substr(md5(b), 1, 14))::BIGINT AS dst, w FROM p
           |  UNION ALL
           |  SELECT ('0x' || substr(md5(b), 1, 14))::BIGINT,
           |         ('0x' || substr(md5(a), 1, 14))::BIGINT, w FROM p),
           |ow AS MATERIALIZED (
           |  SELECT src AS node, CAST(SUM(w) AS BIGINT) AS ow
           |  FROM e GROUP BY 1),
           |nodes AS (SELECT node FROM ow),
           |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
           |$rounds,
           |top AS (
           |  SELECT node, rank, pr_ppm FROM (
           |    SELECT node,
           |      CAST(ROW_NUMBER() OVER (ORDER BY r DESC, node) AS INT) AS rank,
           |      r AS pr_ppm
           |    FROM r4) t WHERE rank <= 30),
           |vocab AS (
           |  SELECT DISTINCT word,
           |    ('0x' || substr(md5(word), 1, 14))::BIGINT AS node FROM (
           |    SELECT a AS word FROM p UNION ALL SELECT b FROM p) v)
           |SELECT rank, word, pr_ppm FROM top JOIN vocab USING (node)
           |ORDER BY rank""".stripMargin
      }),

    // BM25 ranking: doc-length normalization + saturating tf, engine-
    // exact via the SHARED fixed-point contribution expression
    // (Corpus.bm25ContribSql — same SQL string on both sides, floor-
    // quantized so double summation order can't matter)
    Q(
      "text_bm25_topk",
      (s, dir) =>
        Corpus.bm25TopK(table(s, dir, "documents"), "doc_id", "text",
          SearchQuery, k = 10)
          .orderBy(col("rank")),
      Some(bm25OracleSql)),

    // exact phrase search over the positional inverted index: top-10
    // docs by occurrences of the adjacent token sequence "table scan";
    // the oracle recounts every doc's token array directly — the index
    // probe must reproduce the rescan truth exactly
    Q(
      "text_phrase_topk",
      (s, dir) =>
        Corpus.phraseSearchTopK(table(s, dir, "documents"), "doc_id", "text",
          phrase = "table scan", k = 10)
          .orderBy(col("rank")),
      Some(s"""WITH $toksCte,
             |occ AS (
             |  SELECT doc_id AS doc,
             |    CAST(len(list_filter(range(1, len(ws)),
             |      i -> ws[i] = 'table' AND ws[i+1] = 'scan')) AS BIGINT) AS occurrences
             |  FROM toks)
             |SELECT doc, rank, occurrences FROM (
             |  SELECT doc,
             |    CAST(ROW_NUMBER() OVER (ORDER BY occurrences DESC, doc) AS INT) AS rank,
             |    occurrences
             |  FROM occ WHERE occurrences > 0) t
             |WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // ======== dedup ========
    Q(
      "dedup_exact",
      (s, dir) =>
        Dedup.exact(table(s, dir, "documents"), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
             |  doc_id != MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q(
      "dedup_exact_drop",
      (s, dir) =>
        Dedup.dropExactDuplicates(table(s, dir, "documents"), "doc_id", "text")
          .select(col("doc_id"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id FROM (
             |  SELECT doc_id,
             |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |  FROM documents) t
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    Q(
      "dedup_ngram_jaccard",
      (s, dir) =>
        Dedup.ngramJaccard(table(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.5, maxDf = JaccardMaxDf)
          .orderBy(col("d1"), col("d2")),
      // df-capped index mirrored exactly: shingles with document
      // frequency > maxDf leave both the join and the size counts
      Some(s"""WITH $toksCte, $shingleCte,
             |shx0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
             |dfx AS (SELECT shingle, COUNT(*) AS df FROM shx0 GROUP BY shingle),
             |shx AS (SELECT s.doc_id, s.shingle FROM shx0 s
             |        JOIN dfx USING (shingle) WHERE df <= $JaccardMaxDf),
             |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shx GROUP BY doc_id),
             |common AS (
             |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
             |  FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT d1, d2,
             |  CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) AS jaccard
             |FROM common
             |JOIN sizes sa ON sa.doc_id = d1
             |JOIN sizes sb ON sb.doc_id = d2
             |WHERE CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.5
             |ORDER BY d1, d2""".stripMargin)),

    // EXACT all-pairs shingle-set Jaccard via prefix filtering: no df
    // cap, no false negatives — the oracle computes the unfiltered
    // pairwise truth (same 56-bit shingle hashing, so agreement is by
    // construction), proving the prefix join prunes without losing a
    // pair (threshold 0.40 decided by integer ppm cross-multiplication
    // on both sides; the double jaccard is identical arithmetic)
    Q(
      "dedup_prefix_pairs",
      (s, dir) =>
        Dedup.prefixFilterPairs(table(s, dir, "documents"), "doc_id", "text",
          n = 3, thresholdPpm = 400000L)
          .orderBy(col("d1"), col("d2")),
      Some(s"""WITH $toksCte, $shingleCte,
             |idx AS (SELECT doc_id AS doc,
             |  ('0x' || substr(md5(tok0), 1, 14))::BIGINT AS tok
             |  FROM (SELECT doc_id, unnest(shingles) AS tok0 FROM sh)),
             |sizes AS (SELECT doc, COUNT(*) AS n FROM idx GROUP BY doc),
             |common AS (
             |  SELECT a.doc AS d1, b.doc AS d2, COUNT(*) AS common
             |  FROM idx a JOIN idx b ON a.tok = b.tok AND a.doc < b.doc
             |  GROUP BY 1, 2)
             |SELECT d1, d2,
             |  CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) AS jaccard
             |FROM common
             |JOIN sizes sa ON sa.doc = d1
             |JOIN sizes sb ON sb.doc = d2
             |WHERE common * 1000000 >= 400000 * (sa.n + sb.n - common)
             |ORDER BY d1, d2""".stripMargin)),

    // EXACT all-pairs WEIGHTED-cosine join: idf-weighted shingles via
    // the suffix-norm prefix filter (Bayardo et al. AllPairs). The
    // oracle is the brute-force pairwise definition — same 56-bit
    // hashing, same integer weights, 128-bit exact threshold guard —
    // so a pair the prefix join loses breaks the hash
    Q(
      "dedup_cosine_pairs",
      (s, dir) =>
        Dedup.cosinePrefixPairs(table(s, dir, "documents"), "doc_id",
          "text", n = 3, p = 7, q = 10)
          .orderBy(col("d1"), col("d2")),
      Some(s"""WITH $toksCte, $shingleCte,
             |idx0 AS (SELECT doc_id AS doc,
             |  ('0x' || substr(md5(tok0), 1, 14))::BIGINT AS tok
             |  FROM (SELECT doc_id, unnest(shingles) AS tok0 FROM sh)),
             |nn AS (SELECT CAST(COUNT(DISTINCT doc) AS BIGINT) AS nd FROM idx0),
             |dfr AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS dfc
             |        FROM idx0 GROUP BY 1),
             |w AS (SELECT tok,
             |    LEAST(nd // dfc, 1000) * LEAST(nd // dfc, 1000) AS w2
             |  FROM dfr, nn),
             |idx AS (SELECT doc, idx0.tok, w2 FROM idx0 JOIN w USING (tok)),
             |norms AS (SELECT doc, CAST(SUM(w2) AS BIGINT) AS na2
             |          FROM idx GROUP BY 1),
             |dots AS (SELECT a.doc AS d1, b.doc AS d2,
             |    CAST(SUM(a.w2) AS BIGINT) AS dot
             |  FROM idx a JOIN idx b ON a.tok = b.tok AND a.doc < b.doc
             |  GROUP BY 1, 2)
             |SELECT d1, d2,
             |  CAST(dot AS DOUBLE)
             |    / sqrt(CAST(sa.na2 AS DOUBLE) * CAST(sb.na2 AS DOUBLE))
             |    AS cosine
             |FROM dots
             |JOIN norms sa ON sa.doc = d1
             |JOIN norms sb ON sb.doc = d2
             |WHERE dot::HUGEINT * dot * 100 >= sa.na2::HUGEINT * sb.na2 * 49
             |ORDER BY d1, d2""".stripMargin)),

    // content-defined chunking: hash-selected token boundaries (divisor
    // 16), cross-doc duplicated-chunk inventory — the insertion-robust
    // dedup granularity; oracle replays the same boundary rule with a
    // SQL running sum
    Q(
      "dedup_cdc_chunks",
      (s, dir) =>
        Dedup.cdcChunkDuplicates(table(s, dir, "documents"), "doc_id", "text",
          divisor = 16)
          .orderBy(col("chunk_hash")),
      Some(s"""WITH $toksCte,
             |pos AS (SELECT doc_id, unnest(range(1, len(ws)+1)) AS i,
             |          unnest(ws) AS tok FROM toks),
             |b AS (SELECT doc_id, i, tok,
             |  CASE WHEN ('0x'||substr(md5(tok),1,14))::BIGINT % 16 = 0
             |       THEN 1 ELSE 0 END AS bd FROM pos),
             |ch AS (SELECT doc_id, i, tok,
             |  COALESCE(SUM(bd) OVER (PARTITION BY doc_id ORDER BY i
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
             |  FROM b),
             |chunks AS (
             |  SELECT doc_id, cid, md5(string_agg(tok, ' ' ORDER BY i)) AS h,
             |    CAST(COUNT(*) AS BIGINT) AS n_toks
             |  FROM ch GROUP BY 1, 2)
             |SELECT h AS chunk_hash,
             |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  CAST(COUNT(*) AS BIGINT) AS n_occ,
             |  MIN(n_toks) AS n_tokens
             |FROM chunks GROUP BY 1
             |HAVING COUNT(DISTINCT doc_id) >= 2
             |ORDER BY chunk_hash""".stripMargin)),

    // the EXACT-recall keep deliverable: prefix-filter pairs (no false
    // negatives) -> star CC -> min-id survivor; the oracle closes the
    // unfiltered pairwise truth with a recursive walk
    Q(
      "dedup_prefix_keep",
      // pair discovery is dedup_prefix_pairs' own live gate; the keep
      // deliverable reads the staged pair artifact and gates the
      // CC + min-id-survivor composition
      (s, dir) =>
        Dedup.prefixDupKeepFromPairs(table(s, dir, "documents"),
          prefixPairsFixture(s, dir), "doc_id")
          .orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE $toksCte, $shingleCte,
             |idx AS (SELECT doc_id AS doc,
             |  ('0x' || substr(md5(tok0), 1, 14))::BIGINT AS tok
             |  FROM (SELECT doc_id, unnest(shingles) AS tok0 FROM sh)),
             |sizes AS (SELECT doc, COUNT(*) AS n FROM idx GROUP BY doc),
             |common AS (
             |  SELECT a.doc AS d1, b.doc AS d2, COUNT(*) AS common
             |  FROM idx a JOIN idx b ON a.tok = b.tok AND a.doc < b.doc
             |  GROUP BY 1, 2),
             |pairs AS (
             |  SELECT d1, d2 FROM common
             |  JOIN sizes sa ON sa.doc = d1
             |  JOIN sizes sb ON sb.doc = d2
             |  WHERE common * 1000000 >= 400000 * (sa.n + sb.n - common)),
             |e AS (SELECT d1 AS a, d2 AS b FROM pairs
             |      UNION SELECT d2 AS a, d1 AS b FROM pairs),
             |walk(src, dst) AS (
             |  SELECT doc_id, doc_id FROM documents
             |  UNION
             |  SELECT w.src, e.b FROM walk w JOIN e ON w.dst = e.a),
             |comp AS (SELECT src AS doc_id, MIN(dst) AS cluster
             |         FROM walk GROUP BY src),
             |szs AS (SELECT cluster, COUNT(*) AS sz FROM comp GROUP BY cluster)
             |SELECT c.doc_id, CAST(s.sz - 1 AS BIGINT) AS n_absorbed
             |FROM comp c JOIN szs s USING (cluster)
             |WHERE c.doc_id = c.cluster ORDER BY c.doc_id""".stripMargin)),

    // incremental CDC chunk dedup: only the NEW batch (doc_id >= 400)
    // is tokenized and chunked; the stored history contributes chunk
    // hashes only — per-new-doc known-content share at CDC granularity
    Q(
      "dedup_cdc_incremental",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val store = Dedup.cdcStore(docs.filter(col("doc_id") < 400),
          "doc_id", "text", divisor = 16)
        Dedup.cdcIncremental(docs.filter(col("doc_id") >= 400), store,
          "doc_id", "text", divisor = 16)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $toksCte,
             |pos AS (SELECT doc_id, unnest(range(1, len(ws)+1)) AS i,
             |          unnest(ws) AS tok FROM toks),
             |b AS (SELECT doc_id, i, tok,
             |  CASE WHEN ('0x'||substr(md5(tok),1,14))::BIGINT % 16 = 0
             |       THEN 1 ELSE 0 END AS bd FROM pos),
             |ch AS (SELECT doc_id, i, tok,
             |  COALESCE(SUM(bd) OVER (PARTITION BY doc_id ORDER BY i
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
             |  FROM b),
             |chunks AS (
             |  SELECT doc_id, cid, md5(string_agg(tok, ' ' ORDER BY i)) AS h
             |  FROM ch GROUP BY 1, 2),
             |known AS (SELECT DISTINCT h FROM chunks WHERE doc_id < 400),
             |nw AS (
             |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
             |    CAST(SUM(CASE WHEN h IN (SELECT h FROM known)
             |             THEN 1 ELSE 0 END) AS BIGINT) AS n_known
             |  FROM chunks WHERE doc_id >= 400 GROUP BY 1)
             |SELECT doc_id, n_chunks, n_known,
             |  CAST(n_known * 1000000 // n_chunks AS BIGINT) AS known_ppm
             |FROM nw ORDER BY doc_id""".stripMargin)),

    // directed containment pairs at 0.7 over the df-capped shingle
    // universe: doc-in-doc detection the symmetric Jaccard family
    // structurally misses
    Q(
      "dedup_containment_pairs",
      (s, dir) =>
        Dedup.containmentPairs(table(s, dir, "documents"), "doc_id", "text",
          n = 3, thresholdPpm = 700000L, maxDf = JaccardMaxDf)
          .orderBy(col("d_in"), col("d_out")),
      Some(s"""WITH $toksCte, $shingleCte,
             |shx0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
             |dfx AS (SELECT shingle, COUNT(*) AS df FROM shx0 GROUP BY 1),
             |shx AS (SELECT s.doc_id, s.shingle FROM shx0 s
             |        JOIN dfx USING (shingle) WHERE df <= $JaccardMaxDf),
             |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shx GROUP BY 1),
             |common AS (
             |  SELECT a.doc_id AS d_in, b.doc_id AS d_out, COUNT(*) AS c
             |  FROM shx a JOIN shx b
             |    ON a.shingle = b.shingle AND a.doc_id != b.doc_id
             |  GROUP BY 1, 2)
             |SELECT d_in, d_out,
             |  CAST(c AS DOUBLE) / CAST(s.n AS DOUBLE) AS containment
             |FROM common JOIN sizes s ON s.doc_id = d_in
             |WHERE c * 1000000 >= 700000 * s.n
             |ORDER BY d_in, d_out""".stripMargin)),

    // composed curation v3 over the round-6 operators: drop docs
    // >= 0.7-contained in a LOWER-id doc (one deterministic pass of the
    // directed containment screen), then priority-sample 100 survivors
    // — engine-exact end to end through the composition
    Q(
      "corpus_curation_v3",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val dropped = Dedup.containmentPairs(docs, "doc_id", "text",
            n = 3, thresholdPpm = 700000L, maxDf = JaccardMaxDf)
          .filter(col("d_out") < col("d_in"))
          .select(col("d_in").as("doc_id")).distinct()
        val kept = docs.join(dropped, Seq("doc_id"), "left_anti")
        Corpus.prioritySample(kept, "doc_id", "text", k = 100)
          .orderBy(col("rank"))
      },
      Some(s"""WITH $toksCte, $shingleCte,
             |shx0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
             |dfx AS (SELECT shingle, COUNT(*) AS df FROM shx0 GROUP BY 1),
             |shx AS (SELECT s.doc_id, s.shingle FROM shx0 s
             |        JOIN dfx USING (shingle) WHERE df <= $JaccardMaxDf),
             |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shx GROUP BY 1),
             |dropped AS (
             |  SELECT DISTINCT d_in AS doc_id FROM (
             |    SELECT a.doc_id AS d_in, COUNT(*) AS c, MIN(s.n) AS n
             |    FROM shx a JOIN shx b
             |      ON a.shingle = b.shingle AND b.doc_id < a.doc_id
             |    JOIN sizes s ON s.doc_id = a.doc_id
             |    GROUP BY a.doc_id, b.doc_id, s.n
             |    HAVING COUNT(*) * 1000000 >= 700000 * MIN(s.n)) x),
             |kept AS (
             |  SELECT d.doc_id, d.text FROM documents d
             |  WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)),
             |t AS (
             |  SELECT doc_id,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) + 1 AS w
             |  FROM kept),
             |p AS (SELECT doc_id,
             |    ('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT // w AS q
             |  FROM t)
             |SELECT doc, rank, priority FROM (
             |  SELECT doc_id AS doc,
             |    CAST(ROW_NUMBER() OVER (ORDER BY q, doc_id) AS INT) AS rank,
             |    q AS priority
             |  FROM p) t2
             |WHERE rank <= 100 ORDER BY rank""".stripMargin)),

    // benchmark decontamination: per-training-doc share of distinct
    // shingles that leak from the "eval" slice (doc_id >= 450 stands in
    // for a held-out benchmark)
    Q(
      "corpus_decontaminate",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Dedup.contamination(
          docs.filter(col("doc_id") < 450),
          docs.filter(col("doc_id") >= 450),
          "doc_id", "text", n = 3)
          .orderBy(col("doc_id"))
      },
      Some(decontaminateOracle())),

    // same answer through the Bloom-prefiltered path: the sketch only
    // prunes the join input (a might-contain miss is definitive), the
    // exact join removes false positives — so the oracle is the exact
    // query's SQL, which is the point. Split is SF-RELATIVE (every 10th
    // doc is "eval") so the benchmark side stays the SMALL side at any
    // scale — the regime the bloom prefilter exists for; the absolute
    // threshold the exact query uses would flip to eval≈90% at sf0.1.
    Q(
      "corpus_decontaminate_bloom",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Dedup.contaminationBloom(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", n = 3, fpp = 0.01)
          .orderBy(col("doc_id"))
      },
      Some(decontaminateOracle(
        trainPred = "doc_id % 10 <> 0", evalPred = "doc_id % 10 = 0"))),

    // near-dup CLUSTERS: the jaccard pair graph's connected components,
    // min-id canonical per cluster — "keep one doc per near-dup group".
    // Oracle: same pair CTEs + a recursive transitive-closure walk.
    Q(
      "dedup_clusters",
      // pairs from the staged fixture; the LABEL-PROP SOLVER is what
      // this gate runs live (pair discovery has its own gate,
      // dedup_ngram_jaccard)
      (s, dir) =>
        Dedup.connectedComponents(
          table(s, dir, "documents").select(col("doc_id")), "doc_id",
          storedPairsFixture(s, dir))
          .select(col("id").as("doc_id"), col("cluster").as("cluster_id"),
            (col("id") === col("cluster")).as("is_canonical"))
          .orderBy(col("doc_id")),
      Some(clustersOracleSql)),

    // leakage-safe split: the SAME near-dup clusters, split assigned by
    // a hash of the CLUSTER id so near-duplicates can never straddle
    // train/test — the contamination-proof split (split-by-doc leaks a
    // test doc's twin into train at ~train-share probability)
    Q(
      "corpus_split_leakage_safe",
      // the cluster labels are the staged stored artifact; the gated
      // op is the cluster-atomic hash split itself
      (s, dir) =>
        Corpus.splitByHash(
          storedStarFixture(s, dir)
            .select(col("doc_id"), col("cluster").as("cluster_id")),
          "cluster_id", bounds = Seq("val" -> "0d", "test" -> "1a"),
          restLabel = "train")
          .select(col("doc_id"), col("cluster_id"), col("split"))
          .orderBy(col("doc_id")),
      Some {
        // clustersOracleSql's recursive closure with the split CASE on
        // the cluster id replacing the is_canonical flag
        val head = clustersOracleSql.substring(0,
          clustersOracleSql.indexOf("SELECT doc_id, cluster_id"))
        s"""$head
           |SELECT doc_id, cluster_id,
           |  CASE WHEN md5(CAST(cluster_id AS VARCHAR)) < '0d' THEN 'val'
           |       WHEN md5(CAST(cluster_id AS VARCHAR)) < '1a' THEN 'test'
           |       ELSE 'train' END AS split
           |FROM comp ORDER BY doc_id""".stripMargin
      }),

    // the leakage-safe curation EXPORT, end to end: near-dup clusters →
    // cluster-keyed split → keep the canonical doc of each TRAIN
    // cluster → shard manifest of the surviving training set. The
    // composition is where seam drift hides; the oracle recomputes the
    // whole chain from the recursive closure
    Q(
      "corpus_curation_leakage_safe",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        // staged stored labels → cluster-atomic split → canonical-only
        // keep → manifest: the gated surface is the COMPOSITION
        val labeled = Corpus.splitByHash(
          storedStarFixture(s, dir)
            .select(col("doc_id"), col("cluster").as("cluster_id")),
          "cluster_id", bounds = Seq("val" -> "0d", "test" -> "1a"),
          restLabel = "train")
        val kept = labeled
          .filter(col("split") === "train" &&
            col("doc_id") === col("cluster_id"))
          .select(col("doc_id"))
        Corpus.shardManifest(docs.join(kept, "doc_id"), "doc_id", "text",
          nShards = 8).orderBy(col("shard"))
      },
      Some {
        val head = clustersOracleSql.substring(0,
          clustersOracleSql.indexOf("SELECT doc_id, cluster_id")).trim
        s"""$head,
           |keep AS (
           |  SELECT doc_id FROM comp
           |  WHERE doc_id = cluster_id
           |    AND md5(CAST(cluster_id AS VARCHAR)) >= '1a'),
           |t AS (
           |  SELECT CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14))::BIGINT % 8 AS INT) AS shard,
           |    d.doc_id,
           |    CAST(len(list_filter(string_split(d.text, ' '), x -> x != '')) AS BIGINT) AS toks
           |  FROM documents d JOIN keep USING (doc_id))
           |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
           |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
           |FROM t GROUP BY shard ORDER BY shard""".stripMargin
      }),

    // same clusters, computed with the O(log n)-round star-contraction
    // solver (large-star/small-star) instead of label propagation — the
    // deep-chain-safe variant; identical output, identical oracle.
    Q(
      "dedup_clusters_star",
      // same staged pairs, the STAR-CONTRACTION SOLVER runs live
      (s, dir) =>
        Dedup.connectedComponentsStar(
          table(s, dir, "documents").select(col("doc_id")), "doc_id",
          storedPairsFixture(s, dir))
          .select(col("id").as("doc_id"), col("cluster").as("cluster_id"),
            (col("id") === col("cluster")).as("is_canonical"))
          .orderBy(col("doc_id")),
      Some(clustersOracleSql)),

    // same clusters a THIRD way: incrementally — stored labels from the
    // old batch (doc_id < 400), the new batch's pairs folded in by
    // contracting old clusters to their roots, so the solver touches
    // new ids + affected roots only, never history. Identical oracle:
    // the incremental algebra must equal the full-recompute closure,
    // including old clusters MERGED by bridging new docs.
    Q(
      "dedup_clusters_incremental",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        // one pair discovery (the pair-seam; incremental SIGNING is
        // dedup_minhash_incremental's gate), split by batch membership
        val pairs = storedPairsFixture(s, dir)
        val cut = lit(400L)
        val oldIds = docs.filter(col("doc_id") < cut).select(col("doc_id"))
        // the persisted state a previous run would have left behind
        val stored = Dedup.connectedComponentsStar(oldIds, "doc_id",
          pairs.filter(col("d1") < cut && col("d2") < cut))
          .withColumnRenamed("id", "doc_id")
          .localCheckpoint(true)
        val updated = Dedup.incrementalComponents(stored, "doc_id",
          docs.filter(col("doc_id") >= cut).select(col("doc_id")),
          pairs.filter(col("d1") >= cut || col("d2") >= cut))
        updated
          .select(col("id").as("doc_id"), col("cluster").as("cluster_id"),
            (col("id") === col("cluster")).as("is_canonical"))
          .orderBy(col("doc_id"))
      },
      Some(clustersOracleSql)),

    // the right-to-be-forgotten pipeline composed END TO END, the way
    // an erasure request actually runs: stored full-corpus state (pair
    // graph, labels, kept export + manifest) → scoped takedown relabel
    // (only clusters that lost a member re-solve) → keep-min-id rule
    // over the new labels → incremental manifest refresh (only shards
    // whose kept docs changed re-aggregate, untouched shards carry
    // stored rows). The pieces are individually gated; THIS gate
    // proves seam independence for DELETES at the pipeline level — the
    // oracle is the one-shot pipeline over the remaining corpus, so a
    // missed cluster split, a stale canonical, or a mis-carried shard
    // row all break the hash
    Q(
      "corpus_takedown_pipeline",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val pairs = storedPairsFixture(s, dir)
        val stored = storedStarFixture(s, dir)
        // day-0 deliverables a previous run persisted
        val keptV1 = docs.join(
          stored.filter(col("doc_id") === col("cluster"))
            .select(col("doc_id")), Seq("doc_id"), "left_semi")
        val m1 = Corpus.shardManifest(keptV1, "doc_id", "text", 64)
        // the erasure request, folded in scoped
        val takedown = docs.filter(col("doc_id") % 17 === 0)
          .select(col("doc_id"))
        val updated = Dedup.takedownComponents(stored, "doc_id",
          takedown, pairs)
        val keptV2 = docs.join(
          updated.filter(col("id") === col("cluster"))
            .select(col("id").as("doc_id")), Seq("doc_id"), "left_semi")
        Corpus.incrementalShardManifest(keptV1, m1, keptV2,
          "doc_id", "text", 64).orderBy(col("shard"))
      },
      Some {
        val filtered = clustersOracleSql
          .replace("FROM documents",
            "FROM documents WHERE doc_id % 17 <> 0")
        filtered.replace(
          """SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical
FROM comp ORDER BY doc_id""",
          """,
kept AS (
  SELECT d.doc_id, d.text FROM documents d
  JOIN comp c USING (doc_id) WHERE c.doc_id = c.cluster_id),
t AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 64 AS INT) AS shard,
    doc_id,
    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS toks_n
  FROM kept)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(toks_n) AS BIGINT) AS n_tokens,
  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM t GROUP BY shard ORDER BY shard""")
      }),

    // the DELETE verb of the stored-cluster lifecycle: a takedown set
    // (every 17th doc) leaves, ONLY the clusters that lost a member
    // re-solve over the stored pair rows (removal can only split
    // components), untouched clusters carry stored labels forward.
    // Oracle = the full recompute over the remaining corpus, so a
    // missed split, a stale root, or a touched carry all break the hash
    Q(
      "dedup_takedown_scoped",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val pairs = storedPairsFixture(s, dir)
        // the persisted full-corpus state a previous run left behind
        val stored = storedStarFixture(s, dir)
        val takedown = docs.filter(col("doc_id") % 17 === 0)
          .select(col("doc_id"))
        Dedup.takedownComponents(stored, "doc_id", takedown, pairs)
          .select(col("id").as("doc_id"), col("cluster").as("cluster_id"),
            (col("id") === col("cluster")).as("is_canonical"))
          .orderBy(col("doc_id"))
      },
      Some(clustersOracleSql
        .replace("FROM documents", "FROM documents WHERE doc_id % 17 <> 0"))),

    Q(
      "dedup_minhash_lsh",
      (s, dir) =>
        Dedup.minhashLsh(table(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 4, rowsPerBand = 3)
          .orderBy(col("d1"), col("d2")),
      Some {
        s"""WITH $toksCte, $shingleCte,
           |$minhashCtes
           |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           |FROM banded a JOIN banded b
           |  ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
           |ORDER BY d1, d2""".stripMargin
      }),

    // LSH candidate-generation recall vs exact-Jaccard ground truth at
    // the same shingle settings — the S-curve check that sizes
    // (bands, rowsPerBand) before a corpus-wide near-dup run
    Q(
      "dedup_minhash_recall",
      (s, dir) =>
        Dedup.minhashRecall(table(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.5, maxDf = JaccardMaxDf,
          bands = 4, rowsPerBand = 3),
      Some(s"""WITH $toksCte, $shingleCte,
             |shx0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
             |dfx AS (SELECT shingle, COUNT(*) AS df FROM shx0 GROUP BY shingle),
             |shx AS (SELECT s.doc_id, s.shingle FROM shx0 s
             |        JOIN dfx USING (shingle) WHERE df <= $JaccardMaxDf),
             |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shx GROUP BY doc_id),
             |common AS (
             |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
             |  FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2),
             |truth AS (
             |  SELECT d1, d2 FROM common
             |  JOIN sizes sa ON sa.doc_id = d1
             |  JOIN sizes sb ON sb.doc_id = d2
             |  WHERE CAST(common AS DOUBLE) / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.5),
             |$minhashCtes,
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
             |  FROM banded a JOIN banded b
             |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
             |j AS (
             |  SELECT t.d1 AS td1, c.d1 AS cd1
             |  FROM truth t FULL OUTER JOIN cand c
             |    ON t.d1 = c.d1 AND t.d2 = c.d2),
             |agg AS (
             |  SELECT CAST(COUNT(td1) AS BIGINT) AS n_true,
             |    CAST(COUNT(cd1) AS BIGINT) AS n_candidates,
             |    CAST(SUM(CASE WHEN td1 IS NOT NULL AND cd1 IS NOT NULL
             |         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
             |  FROM j)
             |SELECT n_true, n_candidates, n_hit,
             |  CAST(CASE WHEN n_true = 0 THEN 0
             |       ELSE n_hit * 1000000 // n_true END AS BIGINT) AS recall_ppm
             |FROM agg""".stripMargin)),

    // per-source duplication health: corpus-wide exact-dup rate by
    // source (a doc first seen in another source counts as this
    // source's duplicate — exposes cross-source copying)
    Q(
      "dedup_rate_by_source",
      (s, dir) =>
        Dedup.duplicateRateByGroup(table(s, dir, "documents"),
          "doc_id", "text", "source")
          .orderBy(col("source")),
      Some("""WITH keyed AS (
             |  SELECT doc_id, source, md5(text) AS h FROM documents),
             |keep AS (SELECT h, MIN(doc_id) AS keep_id FROM keyed GROUP BY h)
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(CASE WHEN k.doc_id != p.keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
             |  CAST(SUM(CASE WHEN k.doc_id != p.keep_id THEN 1 ELSE 0 END) * 1000000
             |    // COUNT(*) AS BIGINT) AS dup_ppm
             |FROM keyed k JOIN keep p USING (h)
             |GROUP BY source ORDER BY source""".stripMargin)),

    // incremental dedup: docs >= 400 arrive as the NEW batch, history
    // (< 400) joins as its STORED signature table (signed once when it
    // arrived) — candidates are exactly the full-corpus LSH pairs that
    // touch the new batch, and old-old pairs are never regenerated
    Q(
      "dedup_minhash_incremental",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Dedup.minhashLshIncremental(
          docs.filter(col("doc_id") >= 400), "doc_id", "text",
          historySigsFixture(s, dir), n = 3, bands = 4, rowsPerBand = 3)
          .orderBy(col("d1"), col("d2"))
      },
      Some(minhashIncrementalOracleSql)),

    // the LIVE-INGEST spelling of dedup_minhash_incremental: the same
    // stored signature artifact, but the new docs arrive as an
    // unbounded stream and every micro-batch runs the gate's
    // probe-then-register loop (candidates against the store as of
    // arrival, then the batch's signatures join the store). Same
    // oracle — the drained pair log must equal the one-shot answer
    // regardless of how the stream slices the arrivals
    Q(
      "stream_dedup_ingest",
      (s, dir) => StreamingQueries.streamDedupIngest(s, dir),
      Some(minhashIncrementalOracleSql)),

    // the takedown verbs' LIVE half: a stored content-digest erasure
    // artifact gates the ingest stream — arrivals re-posting taken-down
    // text are verdicted 'suppressed' (and retained as the quarantine
    // audit trail), everything else 'admitted'; one map-only digest +
    // one equi-join per micro-batch, replay-idempotent sinks. The
    // verdict is a pure per-row function of (arrival, store), so the
    // drained log's census equals the one-shot batch split for any
    // stream slicing — the oracle recomputes exactly that
    Q(
      "stream_suppression_ingest",
      (s, dir) => StreamingQueries.streamSuppressionIngest(s, dir),
      Some("""WITH arr AS (
             |  SELECT doc_id, source, md5(text) AS digest
             |  FROM documents WHERE doc_id >= 400),
             |sup AS (
             |  SELECT DISTINCT md5(text) AS digest
             |  FROM documents WHERE doc_id % 17 = 0)
             |SELECT
             |  CASE WHEN s.digest IS NOT NULL THEN 'suppressed'
             |       ELSE 'admitted' END AS verdict,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
             |FROM arr a LEFT JOIN sup s ON a.digest = s.digest
             |GROUP BY 1 ORDER BY verdict""".stripMargin)),

    // the three live gates COMPOSED into one ingest pipeline (r12):
    // quality → suppression → dedup probe/register per micro-batch,
    // duplicate verdict derived from the drained pair log so the
    // census is slicing-independent — the oracle recomputes the
    // one-shot composition (gopher flags → digest split → banded
    // candidates among history ∪ admitted arrivals, larger id drops)
    Q(
      "stream_ingest_pipeline",
      (s, dir) => StreamingQueries.streamIngestPipeline(s, dir),
      Some {
        val stops = GopherQueryStops.map(s0 => s"'$s0'")
          .mkString("[", ", ", "]")
        s"""WITH $toksCte, $shingleCte,
           |$minhashCtes,
           |gm AS (
           |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
           |    CAST(COALESCE(list_sum(list_transform(ws, w -> len(w))), 0) AS BIGINT) AS sl,
           |    CAST(len(list_filter(ws, w -> contains(w, '#') OR contains(w, '...'))) AS BIGINT) AS sym,
           |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS al,
           |    CAST(len(list_filter($stops,
           |      s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS BIGINT) AS st
           |  FROM toks WHERE doc_id >= 400),
           |sup AS (
           |  SELECT DISTINCT md5(text) AS digest
           |  FROM documents WHERE doc_id % 17 = 0),
           |v1 AS (
           |  SELECT d.doc_id, d.source,
           |    CASE WHEN NOT (g.n >= 30 AND g.n <= 100000 AND g.sl >= g.n * 3
           |           AND g.sl <= g.n * 10 AND g.sym * 10 <= g.n
           |           AND g.al * 5 >= g.n * 4 AND g.st >= 2)
           |         THEN 'quality_rejected'
           |         WHEN md5(d.text) IN (SELECT digest FROM sup)
           |         THEN 'suppressed'
           |         ELSE 'admitted_pre' END AS verdict
           |  FROM documents d JOIN gm g USING (doc_id)
           |  WHERE d.doc_id >= 400),
           |adm AS (SELECT doc_id FROM v1 WHERE verdict = 'admitted_pre'),
           |dup AS (
           |  SELECT DISTINCT b.doc_id
           |  FROM banded a JOIN banded b
           |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
           |  WHERE b.doc_id IN (SELECT doc_id FROM adm)
           |    AND (a.doc_id < 400 OR a.doc_id IN (SELECT doc_id FROM adm)))
           |SELECT
           |  CASE WHEN verdict = 'admitted_pre' THEN
           |    CASE WHEN doc_id IN (SELECT doc_id FROM dup)
           |         THEN 'dup_dropped' ELSE 'admitted' END
           |  ELSE verdict END AS verdict,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
           |FROM v1 GROUP BY 1 ORDER BY verdict""".stripMargin
      }),

    // the crawl FRONT-END as a live ingest (r13): WARC archives stream
    // in (one per micro-batch file), each batch runs record walk →
    // HTML→text extraction → URL canonicalization in one pass, and the
    // drained page log yields the funnel census — blocklist >
    // canonical-URL dup > gopher quality > admitted, plus the torn-
    // record row. Verdicts derive from the drained log (the keeper of
    // a canonical URL is the min doc_id over ALL batches), so the
    // census is slicing-independent and the oracle recomputes the
    // one-shot composition from page markup and raw URL strings.
    Q(
      "stream_crawl_ingest",
      (s, dir) => StreamingQueries.streamCrawlIngest(s, dir),
      Some {
        val stops = GopherQueryStops.map(s0 => s"'$s0'")
          .mkString("[", ", ", "]")
        s"""WITH $htmlExtractCtes,
           |ex AS (SELECT doc_id,
           |  replace(array_to_string(ls, chr(10)), chr(10), ' ') AS text
           |  FROM kept),
           |toks2 AS (SELECT doc_id,
           |  list_filter(string_split(text, ' '), x -> x != '') AS ws FROM ex),
           |gm AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
           |  CAST(COALESCE(list_sum(list_transform(ws, w -> len(w))), 0) AS BIGINT) AS sl,
           |  CAST(len(list_filter(ws, w -> contains(w, '#') OR contains(w, '...'))) AS BIGINT) AS sym,
           |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS al,
           |  CAST(len(list_filter($stops,
           |    s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS BIGINT) AS st
           |  FROM toks2),
           |u AS (SELECT doc_id, $crawlUrlSql AS url
           |  FROM documents),
           |$crawlUrlCanonCtes,
           |cv AS (SELECT cx.doc_id, d.source,
           |  CASE WHEN cx.domain = 'example2.com' THEN 'url_blocked'
           |       WHEN cx.doc_id > ck.keeper THEN 'url_duplicate'
           |       WHEN NOT (g.n >= 30 AND g.n <= 100000 AND g.sl >= g.n * 3
           |             AND g.sl <= g.n * 10 AND g.sym * 10 <= g.n
           |             AND g.al * 5 >= g.n * 4 AND g.st >= 2)
           |       THEN 'quality_rejected'
           |       ELSE 'admitted' END AS verdict
           |  FROM cx JOIN ck USING (canon_url)
           |  JOIN documents d USING (doc_id) JOIN gm g USING (doc_id))
           |SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_pages,
           |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
           |FROM cv GROUP BY 1
           |UNION ALL
           |SELECT 'torn_record',
           |  CAST(4 * COUNT(DISTINCT source) AS BIGINT),
           |  CAST(COUNT(DISTINCT source) AS BIGINT)
           |FROM documents
           |ORDER BY verdict""".stripMargin
      }),

    // the incremental family composed END TO END, the way a daily
    // ingest runs it: history signed once (stored signature table) and
    // labeled once (stored cluster labels from history-only LSH+verify),
    // then the new batch (doc_id >= 400) proposes only pairs touching
    // itself via the stored signatures, verifies them exactly, folds
    // them into the stored labels with the incremental contraction
    // solver, applies the keep-min-id rule, and derives the export
    // manifest of the kept corpus. The pieces are individually gated;
    // THIS gate proves batch-split independence at the pipeline level —
    // the oracle is the one-shot pipeline over the union (full-corpus
    // LSH → verify → transitive closure → keep → manifest), so any
    // drift in the composition (a pair lost at the batch seam, a
    // bridging merge mis-folded, a kept doc misrouted) breaks the hash.
    Q(
      "corpus_curation_incremental",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val cut = 400L
        val history = docs.filter(col("doc_id") < cut)
        val fresh = docs.filter(col("doc_id") >= cut)
        // persisted day-0 state a previous run left behind — staged
        // once per process (the signatures, day-0 verified pairs, and
        // day-0 labels literally ARE stored artifacts in a deployment;
        // the timed path is the day-1 increment below)
        val historySigs = historySigsFixture(s, dir)
        val stored = Staged.df(s, s"curation-day0-labels|$dir") {
          // day-0 pairs band the STORED signatures — history is
          // shingled and hashed exactly once in this whole pipeline;
          // the pair table is checkpointed inside the staged build so
          // the CC solver never re-proposes/re-verifies per round
          val oldCands = Dedup.minhashLshFromSigs(historySigs, "doc_id",
            bands = 4, rowsPerBand = 3)
          val oldPairs = Dedup.scorePairs(history, "doc_id", "text",
            oldCands, n = 3).filter(col("jaccard") >= 0.5)
            .localCheckpoint(true)
          Dedup.connectedComponentsStar(
            history.select(col("doc_id")), "doc_id", oldPairs)
            .withColumnRenamed("id", "doc_id")
        }
        // the day-1 increment: sign the new batch only, propose pairs
        // touching it, verify exactly, fold into the stored labels
        val newCands = Dedup.minhashLshIncremental(fresh, "doc_id",
          "text", historySigs, n = 3, bands = 4, rowsPerBand = 3)
        val newPairs = Dedup.scorePairs(docs, "doc_id", "text",
          newCands, n = 3).filter(col("jaccard") >= 0.5)
          .localCheckpoint(true)
        val updated = Dedup.incrementalComponents(stored, "doc_id",
          fresh.select(col("doc_id")), newPairs)
        // keep-rule (one doc per near-dup cluster) + export manifest
        val kept = docs.join(
          updated.filter(col("id") === col("cluster"))
            .select(col("id").as("doc_id")), Seq("doc_id"), "left_semi")
        Corpus.shardManifest(kept, "doc_id", "text", nShards = 8)
          .orderBy(col("shard"))
      },
      Some {
        s"""WITH RECURSIVE $toksCte, $shingleCte,
           |$minhashCtes,
           |cands AS (
           |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           |  FROM banded a JOIN banded b
           |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
           |shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
           |sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM shx GROUP BY doc_id),
           |common AS (
           |  SELECT c.d1, c.d2, COUNT(*) AS common
           |  FROM cands c
           |  JOIN shx s1 ON s1.doc_id = c.d1
           |  JOIN shx s2 ON s2.doc_id = c.d2 AND s2.shingle = s1.shingle
           |  GROUP BY c.d1, c.d2),
           |pairs AS (
           |  SELECT d1, d2 FROM common
           |  JOIN sizes sa ON sa.doc_id = d1
           |  JOIN sizes sb ON sb.doc_id = d2
           |  WHERE CAST(common AS DOUBLE) / CAST(sa.nsh + sb.nsh - common AS DOUBLE) >= 0.5),
           |e AS (SELECT d1 AS a, d2 AS b FROM pairs
           |      UNION SELECT d2 AS a, d1 AS b FROM pairs),
           |walk(src, dst) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT w.src, e.b FROM walk w JOIN e ON w.dst = e.a),
           |comp AS (SELECT src AS doc_id, MIN(dst) AS cluster
           |         FROM walk GROUP BY src),
           |kept AS (SELECT d.doc_id, d.text FROM documents d
           |         JOIN comp c USING (doc_id) WHERE c.doc_id = c.cluster),
           |t AS (
           |  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 8 AS INT) AS shard,
           |    doc_id,
           |    CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS toks_n
           |  FROM kept)
           |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(toks_n) AS BIGINT) AS n_tokens,
           |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
           |FROM t GROUP BY shard ORDER BY shard""".stripMargin
      }),

    // winnowing fingerprints (the MOSS selection rule): min hash per
    // sliding 4-hash window with rightmost-position ties folded into
    // the integer — every shared >=6-token substring shares a selected
    // fingerprint at ~2/5 the storage of the full hash set
    Q(
      "dedup_winnow_fingerprints",
      (s, dir) =>
        Dedup.winnowFingerprints(table(s, dir, "documents"), "doc_id",
          "text", k = 3, w = 4)
          .orderBy(col("doc_id")),
      Some(s"""WITH $toksCte,
             |g0 AS (
             |  SELECT doc_id,
             |    list_transform(range(1, len(ws) - 1),
             |      i -> array_to_string(ws[i:i+2], ' ')) AS gs
             |  FROM toks WHERE len(ws) >= 3),
             |g AS (
             |  SELECT doc_id, unnest(range(1, len(gs) + 1)) AS pos,
             |    unnest(gs) AS gram
             |  FROM g0),
             |v AS (
             |  SELECT doc_id, pos,
             |    ('0x' || substr(md5(gram), 1, 9))::BIGINT * 1048576
             |      + (1048575 - pos) AS v
             |  FROM g),
             |sel AS (
             |  SELECT doc_id, pos,
             |    COUNT(*) OVER (PARTITION BY doc_id) AS n,
             |    MIN(v) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS minv
             |  FROM v),
             |fp AS (
             |  SELECT DISTINCT doc_id, minv >> 20 AS fp
             |  FROM sel WHERE pos <= greatest(n - 3, 1))
             |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
             |  md5(array_to_string(
             |    list_transform(list_sort(list(fp)), x -> CAST(x AS VARCHAR)),
             |    ',')) AS fp_md5
             |FROM fp GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // winnow-fingerprint near-dup candidates through the inverted
    // index: docs sharing >=2 surviving fingerprints, boilerplate
    // fingerprints dropped at the scale-proportional df > nDocs/10 cut
    // (partial-aggregated count + broadcast anti-join, never a
    // quadratic bucket)
    Q(
      "dedup_winnow_pairs",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        Dedup.winnowPairs(docs, "doc_id", "text", k = 3, w = 4,
          minShared = 2, maxDf = docs.count() / 10)
          .orderBy(col("d1"), col("d2"))
      },
      Some(s"""WITH $toksCte,
             |g0 AS (
             |  SELECT doc_id,
             |    list_transform(range(1, len(ws) - 1),
             |      i -> array_to_string(ws[i:i+2], ' ')) AS gs
             |  FROM toks WHERE len(ws) >= 3),
             |g AS (
             |  SELECT doc_id, unnest(range(1, len(gs) + 1)) AS pos,
             |    unnest(gs) AS gram
             |  FROM g0),
             |v AS (
             |  SELECT doc_id, pos,
             |    ('0x' || substr(md5(gram), 1, 9))::BIGINT * 1048576
             |      + (1048575 - pos) AS v
             |  FROM g),
             |sel AS (
             |  SELECT doc_id, pos,
             |    COUNT(*) OVER (PARTITION BY doc_id) AS n,
             |    MIN(v) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS minv
             |  FROM v),
             |fp AS (
             |  SELECT DISTINCT doc_id, minv >> 20 AS fp
             |  FROM sel WHERE pos <= greatest(n - 3, 1)),
             |keepfp AS (
             |  SELECT fp FROM fp GROUP BY fp
             |  HAVING COUNT(*) <= (SELECT COUNT(*) FROM documents) // 10),
             |fpp AS (SELECT f.doc_id, f.fp FROM fp f JOIN keepfp USING (fp))
             |SELECT a.doc_id AS d1, b.doc_id AS d2,
             |  CAST(COUNT(*) AS BIGINT) AS n_shared
             |FROM fpp a JOIN fpp b ON a.fp = b.fp AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING COUNT(*) >= 2 ORDER BY d1, d2""".stripMargin)),

    // ordered-ingest near-dup dedup driven as 4 successive id-range
    // batches against a growing stored (signature, shingle-set) table —
    // the continuous-ingest contract (greedy arrival-order drops,
    // accepted ids immutable). The oracle is the ONE-PASS form — ∃ an
    // earlier verified near-dup — which the batch driving must equal
    // for any split of the id order.
    Q(
      "dedup_ingest_ordered",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
        val bounds = Seq(maxId / 4, maxId / 2, 3 * maxId / 4)
        Dedup.ingestDedup(docs, "doc_id", "text", bounds,
          n = 3, bands = 4, rowsPerBand = 3, threshold = 0.5)
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
          .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH $toksCte, $shingleCte,
           |$minhashCtes,
           |cands AS (
           |  SELECT DISTINCT b.doc_id AS e, a.doc_id AS d
           |  FROM banded a JOIN banded b
           |    ON a.band = b.band AND a.bsig = b.bsig AND b.doc_id < a.doc_id),
           |shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
           |sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM shx GROUP BY doc_id),
           |common AS (
           |  SELECT c.e, c.d, COUNT(*) AS common
           |  FROM cands c
           |  JOIN shx s1 ON s1.doc_id = c.e
           |  JOIN shx s2 ON s2.doc_id = c.d AND s2.shingle = s1.shingle
           |  GROUP BY c.e, c.d),
           |dropped AS (
           |  SELECT DISTINCT d FROM common
           |  JOIN sizes se ON se.doc_id = e
           |  JOIN sizes sd ON sd.doc_id = d
           |  WHERE CAST(common AS DOUBLE) / CAST(se.nsh + sd.nsh - common AS DOUBLE) >= 0.5)
           |SELECT source, COUNT(*) AS n_kept FROM documents
           |WHERE doc_id NOT IN (SELECT d FROM dropped)
           |GROUP BY source ORDER BY source""".stripMargin
      }),

    // two-stage dedup: banded minhash candidates verified by EXACT
    // jaccard over the full shingle sets — the production propose/verify
    // composition (precision 1.0 above the threshold)
    Q(
      "dedup_minhash_verified",
      (s, dir) =>
        Dedup.minhashLshVerified(table(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 4, rowsPerBand = 3, threshold = 0.5)
          .orderBy(col("d1"), col("d2")),
      Some {
        s"""WITH $toksCte, $shingleCte,
           |$minhashCtes,
           |cands AS (
           |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           |  FROM banded a JOIN banded b
           |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
           |shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
           |sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM shx GROUP BY doc_id),
           |common AS (
           |  SELECT c.d1, c.d2, COUNT(*) AS common
           |  FROM cands c
           |  JOIN shx s1 ON s1.doc_id = c.d1
           |  JOIN shx s2 ON s2.doc_id = c.d2 AND s2.shingle = s1.shingle
           |  GROUP BY c.d1, c.d2)
           |SELECT d1, d2,
           |  CAST(common AS DOUBLE) / CAST(sa.nsh + sb.nsh - common AS DOUBLE) AS jaccard
           |FROM common
           |JOIN sizes sa ON sa.doc_id = d1
           |JOIN sizes sb ON sb.doc_id = d2
           |WHERE CAST(common AS DOUBLE) / CAST(sa.nsh + sb.nsh - common AS DOUBLE) >= 0.5
           |ORDER BY d1, d2""".stripMargin
      }),

    // exact duplicated-span scan (Lee et al. 2021 core at 8-token window
    // granularity): windows hashed once, duplicated-hash set by count>1
    // over distinct (doc, hash), mark-back join + per-doc aggregate
    Q(
      "dedup_span_scan",
      (s, dir) =>
        Dedup.duplicateSpans(table(s, dir, "documents"), "doc_id", "text",
          window = 8)
          .orderBy(col("doc_id")),
      Some(s"""WITH $toksCte,
             |pos AS (SELECT doc_id, ws,
             |  unnest(range(0, greatest(CAST(len(ws) AS BIGINT) - 7, 0))) AS p
             |  FROM toks),
             |win AS (SELECT doc_id, p,
             |  md5(array_to_string(ws[p+1:p+8], ' ')) AS h FROM pos),
             |dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM win)
             |  GROUP BY h HAVING COUNT(*) > 1),
             |agg AS (
             |  SELECT w.doc_id, COUNT(*) AS nw,
             |    COUNT(CASE WHEN w.h IN (SELECT h FROM dup) THEN 1 END) AS nd
             |  FROM win w GROUP BY 1)
             |SELECT d.doc_id,
             |  CAST(COALESCE(a.nw, 0) AS BIGINT) AS n_windows,
             |  CAST(COALESCE(a.nd, 0) AS BIGINT) AS n_dup_windows,
             |  COALESCE(a.nd, 0) > 0 AS has_cross_dup
             |FROM documents d LEFT JOIN agg a USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // exact removal spans (Lee et al. ExactSubstr at token granularity):
    // duplicated stride-1 windows merged into maximal [start,end] token
    // intervals per doc — the byte ranges a curation run would cut
    Q(
      "dedup_span_exact",
      (s, dir) =>
        Dedup.duplicateSpanRanges(table(s, dir, "documents"), "doc_id",
          "text", window = 8)
          .orderBy(col("doc_id"), col("span_start")),
      Some(s"""WITH $toksCte,
             |pos AS (SELECT doc_id, ws,
             |  unnest(range(0, greatest(CAST(len(ws) AS BIGINT) - 7, 0))) AS p
             |  FROM toks),
             |win AS (SELECT doc_id, p,
             |  md5(array_to_string(ws[p+1:p+8], ' ')) AS h FROM pos),
             |dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM win)
             |  GROUP BY h HAVING COUNT(*) > 1),
             |hits AS (SELECT doc_id, p FROM win
             |  WHERE h IN (SELECT h FROM dup)),
             |flags AS (SELECT doc_id, p,
             |  CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8
             |    THEN 0 ELSE 1 END AS f
             |  FROM hits),
             |isl AS (SELECT doc_id, p,
             |  SUM(f) OVER (PARTITION BY doc_id ORDER BY p) AS g FROM flags)
             |SELECT doc_id,
             |  CAST(MIN(p) AS BIGINT) AS span_start,
             |  CAST(MAX(p) + 7 AS BIGINT) AS span_end,
             |  CAST(MAX(p) + 7 - MIN(p) + 1 AS BIGINT) AS span_tokens
             |FROM isl GROUP BY doc_id, g
             |ORDER BY doc_id, span_start""".stripMargin)),

    // the ACTION step of span dedup: excise the maximal duplicate spans
    // at token granularity. Untouched docs keep their original text
    // byte-for-byte; rewritten docs re-join survivors with single spaces
    Q(
      "corpus_span_removal",
      (s, dir) =>
        Dedup.removeDuplicateSpans(table(s, dir, "documents"), "doc_id",
          "text", window = 8)
          .orderBy(col("doc_id")),
      Some(s"""WITH $toksCte,
             |pos AS (SELECT doc_id, ws,
             |  unnest(range(0, greatest(CAST(len(ws) AS BIGINT) - 7, 0))) AS p
             |  FROM toks),
             |win AS (SELECT doc_id, p,
             |  md5(array_to_string(ws[p+1:p+8], ' ')) AS h FROM pos),
             |dup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM win)
             |  GROUP BY h HAVING COUNT(*) > 1),
             |hits AS (SELECT doc_id, p FROM win
             |  WHERE h IN (SELECT h FROM dup)),
             |flags AS (SELECT doc_id, p,
             |  CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id ORDER BY p) <= 8
             |    THEN 0 ELSE 1 END AS f
             |  FROM hits),
             |isl AS (SELECT doc_id, p,
             |  SUM(f) OVER (PARTITION BY doc_id ORDER BY p) AS g FROM flags),
             |spans AS (SELECT doc_id, MIN(p) AS s, MAX(p) + 7 AS e
             |  FROM isl GROUP BY doc_id, g),
             |nr AS (SELECT doc_id, CAST(SUM(e - s + 1) AS BIGINT) AS n_removed
             |  FROM spans GROUP BY doc_id),
             |tokidx AS (SELECT doc_id, ws,
             |  unnest(range(0, CAST(len(ws) AS BIGINT))) AS i FROM toks),
             |keep AS (SELECT t.doc_id, t.ws[t.i+1] AS w, t.i FROM tokidx t
             |  WHERE NOT EXISTS (SELECT 1 FROM spans s
             |    WHERE s.doc_id = t.doc_id AND t.i BETWEEN s.s AND s.e)),
             |agg AS (SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS ct
             |  FROM keep GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CASE WHEN nr.doc_id IS NOT NULL THEN COALESCE(a.ct, '')
             |       ELSE d.text END AS clean_text,
             |  CAST(COALESCE(nr.n_removed, 0) AS BIGINT) AS n_removed
             |FROM documents d
             |LEFT JOIN nr ON d.doc_id = nr.doc_id
             |LEFT JOIN agg a ON d.doc_id = a.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // continuous-crawl span dedup: history (doc_id % 5 != 0) is stored
    // as distinct window hashes, only the new batch (doc_id % 5 == 0)
    // is tokenized, dups = match history OR another new doc
    Q(
      "dedup_span_incremental",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val history = Dedup.spanHashTable(
          docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", window = 8)
        Dedup.duplicateSpansIncremental(
          docs.filter(col("doc_id") % 5 === 0), "doc_id", "text",
          window = 8, history)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $toksCte,
             |pos AS (SELECT doc_id, ws,
             |  unnest(range(0, greatest(CAST(len(ws) AS BIGINT) - 7, 0))) AS p
             |  FROM toks),
             |win AS (SELECT doc_id, p,
             |  md5(array_to_string(ws[p+1:p+8], ' ')) AS h FROM pos),
             |hist AS (SELECT DISTINCT h FROM win WHERE doc_id % 5 != 0),
             |neww AS (SELECT * FROM win WHERE doc_id % 5 = 0),
             |ndup AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM neww)
             |  GROUP BY h HAVING COUNT(*) > 1),
             |agg AS (
             |  SELECT w.doc_id, COUNT(*) AS nw,
             |    COUNT(CASE WHEN w.h IN (SELECT h FROM hist)
             |      OR w.h IN (SELECT h FROM ndup) THEN 1 END) AS nd
             |  FROM neww w GROUP BY 1)
             |SELECT d.doc_id,
             |  CAST(COALESCE(a.nw, 0) AS BIGINT) AS n_windows,
             |  CAST(COALESCE(a.nd, 0) AS BIGINT) AS n_dup_windows,
             |  COALESCE(a.nd, 0) > 0 AS has_cross_dup
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
             |LEFT JOIN agg a USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // the end-to-end fuzzy-dedup deliverable: verified minhash pairs →
    // star-contraction components → keep the min-id doc per cluster
    Q(
      "dedup_near_keep",
      (s, dir) =>
        Dedup.nearDupKeep(table(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 4, rowsPerBand = 3, threshold = 0.5)
          .orderBy(col("doc_id")),
      Some {
        s"""WITH RECURSIVE $toksCte, $shingleCte,
           |$minhashCtes,
           |cands AS (
           |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           |  FROM banded a JOIN banded b
           |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
           |shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
           |sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM shx GROUP BY doc_id),
           |common AS (
           |  SELECT c.d1, c.d2, COUNT(*) AS common
           |  FROM cands c
           |  JOIN shx s1 ON s1.doc_id = c.d1
           |  JOIN shx s2 ON s2.doc_id = c.d2 AND s2.shingle = s1.shingle
           |  GROUP BY c.d1, c.d2),
           |pairs AS (
           |  SELECT d1, d2 FROM common
           |  JOIN sizes sa ON sa.doc_id = d1
           |  JOIN sizes sb ON sb.doc_id = d2
           |  WHERE CAST(common AS DOUBLE) / CAST(sa.nsh + sb.nsh - common AS DOUBLE) >= 0.5),
           |e AS (SELECT d1 AS a, d2 AS b FROM pairs
           |      UNION SELECT d2 AS a, d1 AS b FROM pairs),
           |walk(src, dst) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT w.src, e.b FROM walk w JOIN e ON w.dst = e.a),
           |comp AS (SELECT src AS doc_id, MIN(dst) AS cluster
           |         FROM walk GROUP BY src),
           |szs AS (SELECT cluster, COUNT(*) AS sz FROM comp GROUP BY cluster)
           |SELECT c.doc_id, CAST(s.sz - 1 AS BIGINT) AS n_absorbed
           |FROM comp c JOIN szs s USING (cluster)
           |WHERE c.doc_id = c.cluster ORDER BY c.doc_id""".stripMargin
      }),

    // contrastive training pairs mined from the dedup machinery:
    // verified dups → positives, failed candidates → hard negatives,
    // md5-bucket-adjacent docs → random negatives (engine-reproducible).
    // bucketHexChars is PINNED to 4 (65 536 random-pair buckets) because
    // the oracle's substr width must match; the library default (0)
    // self-sizes k from a corpus count — Dedup.autoBucketHexChars.
    Q(
      "dedup_contrastive_pairs",
      (s, dir) =>
        Dedup.contrastivePairs(table(s, dir, "documents"), "doc_id", "text",
          n = 3, bands = 4, rowsPerBand = 3, threshold = 0.5,
          bucketHexChars = 4)
          .orderBy(col("kind"), col("d1"), col("d2")),
      Some {
        s"""WITH $toksCte, $shingleCte,
           |$minhashCtes,
           |cands AS (
           |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           |  FROM banded a JOIN banded b
           |    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
           |shx AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
           |sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM shx GROUP BY doc_id),
           |common AS (
           |  SELECT c.d1, c.d2, COUNT(*) AS common
           |  FROM cands c
           |  JOIN shx s1 ON s1.doc_id = c.d1
           |  JOIN shx s2 ON s2.doc_id = c.d2 AND s2.shingle = s1.shingle
           |  GROUP BY c.d1, c.d2),
           |scored AS (
           |  SELECT d1, d2,
           |    CAST(common AS DOUBLE) / CAST(sa.nsh + sb.nsh - common AS DOUBLE) AS j
           |  FROM common
           |  JOIN sizes sa ON sa.doc_id = d1
           |  JOIN sizes sb ON sb.doc_id = d2),
           |rb AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
           |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS b FROM documents),
           |rn AS (SELECT doc_id,
           |  lead(doc_id) OVER (PARTITION BY b ORDER BY h, doc_id) AS nxt
           |  FROM rb),
           |rpair AS (SELECT least(doc_id, nxt) AS d1, greatest(doc_id, nxt) AS d2
           |  FROM rn WHERE nxt IS NOT NULL)
           |SELECT d1, d2, 1 AS label, 'near_dup' AS kind FROM scored WHERE j >= 0.5
           |UNION ALL
           |SELECT d1, d2, 0 AS label, 'hard' AS kind FROM scored WHERE j < 0.5
           |UNION ALL
           |SELECT p.d1, p.d2, 0 AS label, 'random' AS kind FROM rpair p
           |WHERE NOT EXISTS (SELECT 1 FROM scored s
           |  WHERE s.d1 = p.d1 AND s.d2 = p.d2)
           |ORDER BY kind, d1, d2""".stripMargin
      }),

    Q(
      "dedup_simhash",
      (s, dir) =>
        Dedup.simhashTable(table(s, dir, "documents"), "doc_id", "text")
          .withColumnRenamed("doc", "doc_id")
          .orderBy(col("doc_id")),
      Some(
        s"""WITH $toksCte,
           |$simhashCtes
           |SELECT doc_id, sh FROM sims ORDER BY doc_id""".stripMargin)),

    // simhash near-dup pairs: pigeonhole block join + exact hamming verify
    // over the same 64-bit signatures
    Q(
      "dedup_simhash_pairs",
      (s, dir) =>
        Dedup.simhashPairs(table(s, dir, "documents"), "doc_id", "text",
          maxHamming = 3)
          .orderBy(col("d1"), col("d2")),
      Some {
        // 4 blocks of 16 bits; >> then & 65535 is shift-mode agnostic
        val blockRows = (0 until 4).map { b =>
          s"SELECT doc_id, sh, $b AS blk_i, (sh >> ${b * 16}) & 65535 AS blk_v FROM sims"
        }.mkString(" UNION ALL ")
        s"""WITH $toksCte,
           |$simhashCtes,
           |blocked AS MATERIALIZED ($blockRows)
           |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
           |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
           |FROM blocked a JOIN blocked b
           |  ON a.blk_i = b.blk_i AND a.blk_v = b.blk_v AND a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.sh, b.sh)) <= 3
           |ORDER BY d1, d2""".stripMargin
      }),

    Q(
      "dedup_embedding_cosine",
      (s, dir) =>
        Dedup.embeddingCosine(table(s, dir, "embeddings"), "vec_id",
          "embedding", "label", Dim, threshold = 0.45)
          .orderBy(col("d1"), col("d2")),
      Some(s"""SELECT a.vec_id AS d1, b.vec_id AS d2,
             |  ${cosSql("a.embedding", "b.embedding")} AS cos
             |FROM embeddings a JOIN embeddings b
             |  ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45
             |ORDER BY d1, d2""".stripMargin)),

    // embedding near-dup with SELF-DERIVED blocking: when no natural block
    // key (label/cluster) exists, the LSH bucket IS the block — the pair
    // join stays Σ_b n_b² with b = 2^planes buckets
    Q(
      "dedup_embedding_lsh",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
          .withColumn("blk", Similarity.lshBucket(col("embedding"), Dim, 4))
        Dedup.embeddingCosine(e, "vec_id", "embedding", "blk", Dim,
          threshold = 0.45)
          .orderBy(col("d1"), col("d2"))
      },
      Some(s"""WITH bk AS (SELECT vec_id, embedding, ${bucketSql("embedding", 4)} AS blk FROM embeddings)
             |SELECT a.vec_id AS d1, b.vec_id AS d2,
             |  ${cosSql("a.embedding", "b.embedding")} AS cos
             |FROM bk a JOIN bk b
             |  ON a.blk = b.blk AND a.vec_id < b.vec_id
             |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45
             |ORDER BY d1, d2""".stripMargin)),

    // SemDeDup-style semantic dedup: REAL k-means clusters block the
    // pair search (Σ_c n_c², never corpus²); a vector is a semantic dup
    // iff a lower-id in-cluster neighbor is within the cosine threshold
    Q(
      "dedup_semantic",
      (s, dir) =>
        Dedup.semanticDedup(table(s, dir, "embeddings"), "vec_id",
          "embedding", Dim, k = 8, iters = 2, threshold = 0.45)
          .orderBy(col("vid")),
      Some(s"""WITH ${kmeansCtes(8, 2)},
             |ce AS (SELECT e.vec_id, t.cid, e.embedding FROM (
             |    SELECT e.vec_id, c.cid,
             |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |        ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid) AS rn
             |    FROM embeddings e CROSS JOIN c2 c) t
             |  JOIN embeddings e ON e.vec_id = t.vec_id WHERE t.rn = 1),
             |dups AS (
             |  SELECT DISTINCT b.vec_id FROM ce a JOIN ce b
             |  ON a.cid = b.cid AND a.vec_id < b.vec_id
             |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.45)
             |SELECT ce.vec_id AS vid, ce.cid,
             |  (ce.vec_id IN (SELECT vec_id FROM dups)) AS is_dup
             |FROM ce ORDER BY vid""".stripMargin)),

    // ======== similarity search ========
    Q(
      "ann_bruteforce_topk",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.cosineTopK(
          e.filter(col("vec_id") < 20), e, "vec_id", "embedding", Dim, k = 5)
          .orderBy(col("q_id"), col("rank"))
      },
      Some(s"""SELECT q_id, n_id, rank, cos FROM (
             |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id
             |      ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS INT) AS rank,
             |    ${cosSql("a.embedding", "b.embedding")} AS cos
             |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
             |  WHERE a.vec_id < 20) t
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // cosine RADIUS search: every corpus row above a similarity bar —
    // threshold cut and emitted score in exact micro integers, so the
    // match SET (not just the ordering) is engine-identical. The plan
    // is map-only: corpus partitioned, query batch broadcast, filter
    // applied before anything shuffles (nothing does)
    Q(
      "ann_radius",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.radiusSearch(
          e.filter(col("vec_id") < 20), e, "vec_id", "embedding", Dim,
          thresholdMicro = 300000L)
          .orderBy(col("q_id"), col("n_id"))
      },
      Some(s"""SELECT q_id, n_id, cos_micro FROM (
             |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             |    CAST(floor(${cosSql("a.embedding", "b.embedding")} * 1000000) AS BIGINT) AS cos_micro
             |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
             |  WHERE a.vec_id < 20) t
             |WHERE cos_micro >= 300000 ORDER BY q_id, n_id""".stripMargin)),

    // MMR diversified re-rank (Carbonell & Goldstein 1998): top-8
    // candidates per query, 3 greedy picks balancing relevance against
    // redundancy at lambda=0.7 — candidate/picked cosines floored to
    // micro ints and lambda in ppm, so every MMR score is one BIGINT
    // and the oracle unrolls the identical greedy rounds as CTEs
    Q(
      "ann_mmr_rerank",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.mmrRerank(
          e.filter(col("vec_id") < 12), e, "vec_id", "embedding", Dim,
          nCand = 8, k = 3, lambdaPpm = 700000L)
          .orderBy(col("q_id"), col("rank"))
      },
      Some {
        val qcos = cosSql("a.embedding", "b.embedding")
        val pcos = cosSql("cn.embedding", "pn.embedding")
        def pick(from: String, order: String, out: String) =
          s"""$out AS MATERIALIZED (
             |  SELECT q_id, n_id, rel FROM (
             |    SELECT q_id, n_id, rel,
             |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY $order, n_id) AS rn
             |    FROM $from) t WHERE rn = 1)""".stripMargin
        def simRound(picked: String, out: String) =
          s"""$out AS MATERIALIZED (
             |  SELECT c.q_id, c.n_id, c.rel,
             |    MAX(CAST(floor($pcos * 1000000) AS BIGINT)) AS ms
             |  FROM cand c
             |  JOIN $picked p ON p.q_id = c.q_id
             |  JOIN embeddings cn ON cn.vec_id = c.n_id
             |  JOIN embeddings pn ON pn.vec_id = p.n_id
             |  WHERE NOT EXISTS (SELECT 1 FROM $picked x
             |    WHERE x.q_id = c.q_id AND x.n_id = c.n_id)
             |  GROUP BY c.q_id, c.n_id, c.rel)""".stripMargin
        s"""WITH cand0 AS MATERIALIZED (
           |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           |    CAST(floor($qcos * 1000000) AS BIGINT) AS rel,
           |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
           |      ORDER BY $qcos DESC, b.vec_id) AS rn
           |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
           |  WHERE a.vec_id < 12),
           |cand AS MATERIALIZED (SELECT q_id, n_id, rel FROM cand0 WHERE rn <= 8),
           |${pick("cand", "rel DESC", "p1")},
           |${simRound("p1", "s2")},
           |${pick("s2", "(700000 * rel - 300000 * ms) DESC", "p2")},
           |pk2 AS MATERIALIZED (SELECT * FROM p1 UNION ALL SELECT * FROM p2),
           |${simRound("pk2", "s3")},
           |${pick("s3", "(700000 * rel - 300000 * ms) DESC", "p3")}
           |SELECT q_id, rank, n_id, rel AS rel_micro FROM (
           |  SELECT q_id, CAST(1 AS INT) AS rank, n_id, rel FROM p1
           |  UNION ALL SELECT q_id, CAST(2 AS INT) AS rank, n_id, rel FROM p2
           |  UNION ALL SELECT q_id, CAST(3 AS INT) AS rank, n_id, rel FROM p3) u
           |ORDER BY q_id, rank""".stripMargin
      }),

    // int8-quantized brute force: 4x less memory/bandwidth than float,
    // ranking by EXACT integer dot product (floor quantization over an
    // explicit double intermediate — engine-identical)
    Q(
      "ann_quantized_topk",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.quantizedTopK(
          e.filter(col("vec_id") < 20), e, "vec_id", "embedding", k = 5)
          .orderBy(col("q_id"), col("rank"))
      },
      Some(s"""WITH z AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x ->
             |      CASE WHEN mx = 0 THEN CAST(0 AS BIGINT)
             |           ELSE CAST(floor(CAST(x AS DOUBLE) * 127 / mx) AS BIGINT) END) AS qv
             |  FROM (SELECT vec_id, embedding,
             |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
             |        FROM embeddings)),
             |d AS (
             |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             |    CAST(${idotSql("a.qv", "b.qv")} AS BIGINT) AS score
             |  FROM z a JOIN z b ON a.vec_id != b.vec_id
             |  WHERE a.vec_id < 20)
             |SELECT q_id, n_id, rank, score FROM (
             |  SELECT q_id, n_id,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
             |      ORDER BY score DESC, n_id) AS INT) AS rank, score
             |  FROM d) t
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    Q(
      "ann_lsh_topk",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.lshTopK(
          e.filter(col("vec_id") < 20), e, "vec_id", "embedding", Dim,
          planes = 4, k = 3)
          .orderBy(col("q_id"), col("rank"))
      },
      Some {
        s"""WITH bk AS (SELECT vec_id, embedding, ${bucketSql("embedding", 4)} AS bucket FROM embeddings)
           |SELECT q_id, n_id, rank, cos FROM (
           |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id
           |      ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS INT) AS rank,
           |    ${cosSql("a.embedding", "b.embedding")} AS cos
           |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
           |  WHERE a.vec_id < 20) t
           |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
      }),

    // multi-probe LSH: each query also scans the buckets across its
    // lowest-margin hyperplanes (flip order = |integer proj| asc, plane
    // asc — margins exact on milli-quantized vectors, so the probe
    // sequence is engine-identical); recall climbs toward brute force
    // at the same index size
    Q(
      "ann_lsh_multiprobe",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.lshMultiProbeTopK(
          e.filter(col("vec_id") < 20), e, "vec_id", "embedding", Dim,
          planes = 4, probes = 3, k = 3)
          .orderBy(col("q_id"), col("rank"))
      },
      Some {
        s"""WITH qq AS MATERIALIZED (
           |  SELECT vec_id, embedding, list_transform(embedding,
           |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           |  FROM embeddings),
           |pj AS MATERIALIZED (
           |  SELECT vec_id, p,
           |    SUM(CAST(qv[d + 1] AS DOUBLE) * (((d*31 + p*17) % 13) - 6)) AS proj
           |  FROM qq,
           |    (SELECT unnest(range(0, $Dim)) AS d) dd,
           |    (SELECT unnest(range(0, 4)) AS p) pp
           |  GROUP BY 1, 2),
           |bkt AS MATERIALIZED (
           |  SELECT vec_id, CAST(SUM(CASE WHEN proj > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
           |  FROM pj GROUP BY 1),
           |flips AS (
           |  SELECT vec_id, p,
           |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ABS(proj), p) AS rk
           |  FROM pj WHERE vec_id < 20),
           |pb AS MATERIALIZED (
           |  SELECT vec_id, bucket AS probe FROM bkt WHERE vec_id < 20
           |  UNION ALL
           |  SELECT f.vec_id, xor(b.bucket, CAST(1 << f.p AS BIGINT))
           |  FROM flips f JOIN bkt b USING (vec_id) WHERE f.rk <= 2)
           |SELECT q_id, n_id, rank, cos FROM (
           |  SELECT pb.vec_id AS q_id, c.vec_id AS n_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY pb.vec_id
           |      ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, c.vec_id) AS INT) AS rank,
           |    ${cosSql("a.embedding", "b.embedding")} AS cos
           |  FROM pb
           |  JOIN bkt c ON c.bucket = pb.probe AND c.vec_id != pb.vec_id
           |  JOIN embeddings a ON a.vec_id = pb.vec_id
           |  JOIN embeddings b ON b.vec_id = c.vec_id) t
           |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
      }),

    Q(
      "ann_ivf_topk",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.ivfTopK(
          e.filter(col("vec_id") < 20), e, "vec_id", "embedding", Dim,
          centroids = 8, nProbe = 2, k = 3)
          .orderBy(col("q_id"), col("rank"))
      },
      Some {
        val assignRank =
          s"ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid)"
        s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
           |ca AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT e.vec_id, c.cid, $assignRank AS rn
           |    FROM embeddings e CROSS JOIN cents c) t WHERE rn = 1),
           |qa AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT e.vec_id, c.cid, $assignRank AS rn
           |    FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 20) t WHERE rn <= 2),
           |cand AS (
           |  SELECT DISTINCT qa.vec_id AS q_id, ca.vec_id AS n_id
           |  FROM qa JOIN ca ON qa.cid = ca.cid
           |  WHERE qa.vec_id != ca.vec_id)
           |SELECT q_id, n_id, rank, cos FROM (
           |  SELECT c.q_id, c.n_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY c.q_id
           |      ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, c.n_id) AS INT) AS rank,
           |    ${cosSql("q.embedding", "n.embedding")} AS cos
           |  FROM cand c
           |  JOIN embeddings q ON q.vec_id = c.q_id
           |  JOIN embeddings n ON n.vec_id = c.n_id) t
           |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
      }),

    // Product quantization (Jégou et al. 2011): corpus collapsed to m=4
    // codes per row, queries scored via an asymmetric-distance LUT. All
    // subspace distances are exact integers over the ×1000-quantized
    // vectors, so the two engines rank identically.
    Q(
      "ann_pq_topk",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.pqTopK(
          e.filter(col("vec_id") < 20), e, "vec_id", "embedding", Dim,
          m = 4, ksub = 8, k = 5)
          .orderBy(col("q_id"), col("rank"))
      },
      Some {
        val m = 4; val ksub = 8; val sub = Dim / m
        def subdist(a: String, b: String) =
          s"""list_sum(list_transform(range(j*$sub + 1, j*$sub + ${sub + 1}),
             |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
        s"""WITH qvt AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           |  FROM embeddings),
           |cb AS (
           |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, qv
           |  FROM (SELECT vec_id, qv FROM qvt ORDER BY vec_id LIMIT $ksub)),
           |js AS (SELECT unnest(range(0, $m)) AS j),
           |enc AS (
           |  SELECT vec_id, j, code FROM (
           |    SELECT v.vec_id, js.j, c.code,
           |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, js.j
           |        ORDER BY ${subdist("v.qv", "c.qv")}, c.code) AS rn
           |    FROM qvt v CROSS JOIN cb c CROSS JOIN js) t WHERE rn = 1),
           |lut AS (
           |  SELECT q.vec_id AS q_id, js.j, c.code,
           |    ${subdist("q.qv", "c.qv")} AS d
           |  FROM qvt q CROSS JOIN cb c CROSS JOIN js WHERE q.vec_id < 20),
           |sc AS (
           |  SELECT l.q_id, e.vec_id AS n_id, SUM(l.d) AS dist
           |  FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code
           |  WHERE l.q_id != e.vec_id GROUP BY 1, 2)
           |SELECT q_id, n_id, rank, dist FROM (
           |  SELECT q_id, n_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY dist, n_id) AS INT) AS rank,
           |    CAST(dist AS BIGINT) AS dist
           |  FROM sc) t
           |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
      }),

    // IVF-PQ (IVFADC): coarse cells + PQ over residuals. All distances
    // are exact integers over ×1000-quantized vectors; coarse centers =
    // 8 smallest-id vectors, codebook = residuals of the 8 smallest-id
    // vectors; every argmin ties low — both engines rank identically.
    Q(
      "ann_ivfpq_topk",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.ivfpqTopK(
          e.filter(col("vec_id") < 20), e, "vec_id", "embedding", Dim,
          centroids = 8, nProbe = 2, m = 4, ksub = 8, k = 5)
          .orderBy(col("q_id"), col("rank"))
      },
      Some {
        val m = 4; val ksub = 8; val nc = 8; val nProbe = 2
        val sub = Dim / m
        def l2full(a: String, b: String) =
          s"""list_sum(list_transform(range(1, ${Dim + 1}),
             |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
        def subdist(a: String, b: String) =
          s"""list_sum(list_transform(range(j*$sub + 1, j*$sub + ${sub + 1}),
             |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
        s"""WITH qvt AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           |  FROM embeddings),
           |cents AS (
           |  SELECT vec_id AS cid, qv AS cqv FROM qvt ORDER BY vec_id LIMIT $nc),
           |asgn AS (
           |  SELECT vec_id, cid, cqv FROM (
           |    SELECT v.vec_id, c.cid, c.cqv,
           |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
           |        ORDER BY ${l2full("v.qv", "c.cqv")}, c.cid) AS rn
           |    FROM qvt v CROSS JOIN cents c) t WHERE rn = 1),
           |res AS (
           |  SELECT v.vec_id, a.cid,
           |    list_transform(range(1, ${Dim + 1}), i -> v.qv[i] - a.cqv[i]) AS rv
           |  FROM qvt v JOIN asgn a USING (vec_id)),
           |cb AS (
           |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, rv
           |  FROM (SELECT vec_id, rv FROM res ORDER BY vec_id LIMIT $ksub)),
           |js AS (SELECT unnest(range(0, $m)) AS j),
           |enc AS (
           |  SELECT vec_id, cid, j, code FROM (
           |    SELECT r.vec_id, r.cid, js.j, c.code,
           |      ROW_NUMBER() OVER (PARTITION BY r.vec_id, js.j
           |        ORDER BY ${subdist("r.rv", "c.rv")}, c.code) AS rn
           |    FROM res r CROSS JOIN cb c CROSS JOIN js) t WHERE rn = 1),
           |probes AS (
           |  SELECT vec_id AS q_id, cid, cqv FROM (
           |    SELECT v.vec_id, c.cid, c.cqv,
           |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
           |        ORDER BY ${l2full("v.qv", "c.cqv")}, c.cid) AS rn
           |    FROM qvt v CROSS JOIN cents c WHERE v.vec_id < 20) t
           |  WHERE rn <= $nProbe),
           |qres AS (
           |  SELECT p.q_id, p.cid,
           |    list_transform(range(1, ${Dim + 1}), i -> v.qv[i] - p.cqv[i]) AS rv
           |  FROM probes p JOIN qvt v ON v.vec_id = p.q_id),
           |lut AS (
           |  SELECT q.q_id, q.cid, js.j, c.code,
           |    ${subdist("q.rv", "c.rv")} AS d
           |  FROM qres q CROSS JOIN cb c CROSS JOIN js),
           |sc AS (
           |  SELECT l.q_id, e.vec_id AS n_id, SUM(l.d) AS dist
           |  FROM enc e JOIN lut l ON l.cid = e.cid AND l.j = e.j AND l.code = e.code
           |  WHERE l.q_id != e.vec_id GROUP BY 1, 2)
           |SELECT q_id, n_id, rank, dist FROM (
           |  SELECT q_id, n_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY dist, n_id) AS INT) AS rank,
           |    CAST(dist AS BIGINT) AS dist
           |  FROM sc) t
           |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
      }),

    // two-stage IVF-PQ read: the compressed index proposes nCand=20
    // candidates, the exact quantized-L2 re-ranks the SURVIVORS ONLY
    // and keeps 5 — the candidate→refine deployment read path every
    // vector store runs. The oracle replays the identical PQ chain,
    // takes the same top-20 (dist, n_id) candidates, and re-ranks them
    // by the exact full-vector distance
    Q(
      "ann_ivfpq_refined",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.ivfpqRefinedTopK(
          e.filter(col("vec_id") < 20), e, "vec_id", "embedding", Dim,
          centroids = 8, nProbe = 2, m = 4, ksub = 8, nCand = 20, k = 5)
          .orderBy(col("q_id"), col("rank"))
      },
      Some {
        val m = 4; val ksub = 8; val nc = 8; val nProbe = 2
        val nCand = 20
        val sub = Dim / m
        def l2full(a: String, b: String) =
          s"""list_sum(list_transform(range(1, ${Dim + 1}),
             |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
        def subdist(a: String, b: String) =
          s"""list_sum(list_transform(range(j*$sub + 1, j*$sub + ${sub + 1}),
             |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
        s"""WITH qvt AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           |  FROM embeddings),
           |cents AS (
           |  SELECT vec_id AS cid, qv AS cqv FROM qvt ORDER BY vec_id LIMIT $nc),
           |asgn AS (
           |  SELECT vec_id, cid, cqv FROM (
           |    SELECT v.vec_id, c.cid, c.cqv,
           |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
           |        ORDER BY ${l2full("v.qv", "c.cqv")}, c.cid) AS rn
           |    FROM qvt v CROSS JOIN cents c) t WHERE rn = 1),
           |res AS (
           |  SELECT v.vec_id, a.cid,
           |    list_transform(range(1, ${Dim + 1}), i -> v.qv[i] - a.cqv[i]) AS rv
           |  FROM qvt v JOIN asgn a USING (vec_id)),
           |cb AS (
           |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, rv
           |  FROM (SELECT vec_id, rv FROM res ORDER BY vec_id LIMIT $ksub)),
           |js AS (SELECT unnest(range(0, $m)) AS j),
           |enc AS (
           |  SELECT vec_id, cid, j, code FROM (
           |    SELECT r.vec_id, r.cid, js.j, c.code,
           |      ROW_NUMBER() OVER (PARTITION BY r.vec_id, js.j
           |        ORDER BY ${subdist("r.rv", "c.rv")}, c.code) AS rn
           |    FROM res r CROSS JOIN cb c CROSS JOIN js) t WHERE rn = 1),
           |probes AS (
           |  SELECT vec_id AS q_id, cid, cqv FROM (
           |    SELECT v.vec_id, c.cid, c.cqv,
           |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
           |        ORDER BY ${l2full("v.qv", "c.cqv")}, c.cid) AS rn
           |    FROM qvt v CROSS JOIN cents c WHERE v.vec_id < 20) t
           |  WHERE rn <= $nProbe),
           |qres AS (
           |  SELECT p.q_id, p.cid,
           |    list_transform(range(1, ${Dim + 1}), i -> v.qv[i] - p.cqv[i]) AS rv
           |  FROM probes p JOIN qvt v ON v.vec_id = p.q_id),
           |lut AS (
           |  SELECT q.q_id, q.cid, js.j, c.code,
           |    ${subdist("q.rv", "c.rv")} AS d
           |  FROM qres q CROSS JOIN cb c CROSS JOIN js),
           |sc AS (
           |  SELECT l.q_id, e.vec_id AS n_id, SUM(l.d) AS dist
           |  FROM enc e JOIN lut l ON l.cid = e.cid AND l.j = e.j AND l.code = e.code
           |  WHERE l.q_id != e.vec_id GROUP BY 1, 2),
           |cand AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY dist, n_id) AS rk
           |    FROM sc) t WHERE rk <= $nCand),
           |rf AS (
           |  SELECT c.q_id, c.n_id, ${l2full("q.qv", "n.qv")} AS dist
           |  FROM cand c
           |  JOIN qvt q ON q.vec_id = c.q_id
           |  JOIN qvt n ON n.vec_id = c.n_id)
           |SELECT q_id, n_id, rank, dist FROM (
           |  SELECT q_id, n_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY dist, n_id) AS INT) AS rank,
           |    CAST(dist AS BIGINT) AS dist
           |  FROM rf) t
           |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
      }),

    // the refine stage's RECALL RECOVERY, measured: hits@5 vs the
    // exact scan for the plain compressed read (PQ-distance top-5) and
    // for the refined read (same index, top-20 candidates exactly
    // re-ranked) side by side per query — the report that justifies
    // paying nCand exact distances at read time
    Q(
      "ann_recall_refined",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 20)
        val exact = Similarity.cosineTopK(q, e, "vec_id", "embedding",
          Dim, k = 5)
        val hp = Similarity.recallAtK(exact,
          Similarity.ivfpqTopK(q, e, "vec_id", "embedding", Dim,
            centroids = 8, nProbe = 2, m = 4, ksub = 8, k = 5))
          .select(col("q_id"), col("n_exact"), col("hits").as("hits_pq"))
        val hr = Similarity.recallAtK(exact,
          Similarity.ivfpqRefinedTopK(q, e, "vec_id", "embedding", Dim,
            centroids = 8, nProbe = 2, m = 4, ksub = 8,
            nCand = 20, k = 5))
          .select(col("q_id"), col("hits").as("hits_refined"))
        hp.join(hr, "q_id")
          .select(col("q_id"), col("n_exact"), col("hits_pq"),
            col("hits_refined"))
          .orderBy(col("q_id"))
      },
      Some {
        val m = 4; val ksub = 8; val nc = 8; val nProbe = 2
        val nCand = 20
        val sub = Dim / m
        def l2full(a: String, b: String) =
          s"""list_sum(list_transform(range(1, ${Dim + 1}),
             |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
        def subdist(a: String, b: String) =
          s"""list_sum(list_transform(range(j*$sub + 1, j*$sub + ${sub + 1}),
             |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
        s"""WITH ex AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
           |    FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
           |    WHERE a.vec_id < 20) t WHERE rank <= 5),
           |qvt AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           |  FROM embeddings),
           |cents AS (
           |  SELECT vec_id AS cid, qv AS cqv FROM qvt ORDER BY vec_id LIMIT $nc),
           |asgn AS (
           |  SELECT vec_id, cid, cqv FROM (
           |    SELECT v.vec_id, c.cid, c.cqv,
           |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
           |        ORDER BY ${l2full("v.qv", "c.cqv")}, c.cid) AS rn
           |    FROM qvt v CROSS JOIN cents c) t WHERE rn = 1),
           |res AS (
           |  SELECT v.vec_id, a.cid,
           |    list_transform(range(1, ${Dim + 1}), i -> v.qv[i] - a.cqv[i]) AS rv
           |  FROM qvt v JOIN asgn a USING (vec_id)),
           |cb AS (
           |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, rv
           |  FROM (SELECT vec_id, rv FROM res ORDER BY vec_id LIMIT $ksub)),
           |js AS (SELECT unnest(range(0, $m)) AS j),
           |enc AS (
           |  SELECT vec_id, cid, j, code FROM (
           |    SELECT r.vec_id, r.cid, js.j, c.code,
           |      ROW_NUMBER() OVER (PARTITION BY r.vec_id, js.j
           |        ORDER BY ${subdist("r.rv", "c.rv")}, c.code) AS rn
           |    FROM res r CROSS JOIN cb c CROSS JOIN js) t WHERE rn = 1),
           |probes AS (
           |  SELECT vec_id AS q_id, cid, cqv FROM (
           |    SELECT v.vec_id, c.cid, c.cqv,
           |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
           |        ORDER BY ${l2full("v.qv", "c.cqv")}, c.cid) AS rn
           |    FROM qvt v CROSS JOIN cents c WHERE v.vec_id < 20) t
           |  WHERE rn <= $nProbe),
           |qres AS (
           |  SELECT p.q_id, p.cid,
           |    list_transform(range(1, ${Dim + 1}), i -> v.qv[i] - p.cqv[i]) AS rv
           |  FROM probes p JOIN qvt v ON v.vec_id = p.q_id),
           |lut AS (
           |  SELECT q.q_id, q.cid, js.j, c.code,
           |    ${subdist("q.rv", "c.rv")} AS d
           |  FROM qres q CROSS JOIN cb c CROSS JOIN js),
           |sc AS MATERIALIZED (
           |  SELECT l.q_id, e.vec_id AS n_id, SUM(l.d) AS dist
           |  FROM enc e JOIN lut l ON l.cid = e.cid AND l.j = e.j AND l.code = e.code
           |  WHERE l.q_id != e.vec_id GROUP BY 1, 2),
           |pq5 AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY dist, n_id) AS rk FROM sc) t WHERE rk <= 5),
           |cand AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY dist, n_id) AS rk FROM sc) t WHERE rk <= $nCand),
           |rf5 AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT c.q_id, c.n_id,
           |      ROW_NUMBER() OVER (PARTITION BY c.q_id
           |        ORDER BY ${l2full("q.qv", "n.qv")}, c.n_id) AS rk
           |    FROM cand c
           |    JOIN qvt q ON q.vec_id = c.q_id
           |    JOIN qvt n ON n.vec_id = c.n_id) t WHERE rk <= 5)
           |SELECT ex.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
           |  CAST(SUM(CASE WHEN p.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_pq,
           |  CAST(SUM(CASE WHEN r.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_refined
           |FROM ex
           |LEFT JOIN pq5 p ON ex.q_id = p.q_id AND ex.n_id = p.n_id
           |LEFT JOIN rf5 r ON ex.q_id = r.q_id AND ex.n_id = r.n_id
           |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin
      }),

    // IVF over REAL k-means centers: 2 Lloyd iterations on integer-
    // quantized vectors (exact in both engines regardless of aggregation
    // order), centers fed through ivfTopK's centroidsDf seam
    Q(
      "ann_ivf_kmeans",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val cents = Similarity.kmeansCentroids(
          e, "vec_id", "embedding", Dim, k = 8, iters = 2)
          .select(col("cid").as("vec_id"), col("c_v").as("embedding"))
        Similarity.ivfTopK(
          e.filter(col("vec_id") < 20), e, "vec_id", "embedding", Dim,
          centroids = 8, nProbe = 2, k = 3, centroidsDf = cents)
          .orderBy(col("q_id"), col("rank"))
      },
      Some {
        s"""WITH ${kmeansCtes(8, 2)},
           |ca AS (SELECT vec_id, cid FROM (
           |    SELECT e.vec_id, c.cid,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid) AS rn
           |    FROM embeddings e CROSS JOIN c2 c) t WHERE rn = 1),
           |qa AS (SELECT vec_id, cid FROM (
           |    SELECT e.vec_id, c.cid,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid) AS rn
           |    FROM embeddings e CROSS JOIN c2 c WHERE e.vec_id < 20) t WHERE rn <= 2),
           |cand AS (
           |  SELECT DISTINCT qa.vec_id AS q_id, ca.vec_id AS n_id
           |  FROM qa JOIN ca ON qa.cid = ca.cid
           |  WHERE qa.vec_id != ca.vec_id)
           |SELECT q_id, n_id, rank, cos FROM (
           |  SELECT c.q_id, c.n_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY c.q_id
           |      ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, c.n_id) AS INT) AS rank,
           |    ${cosSql("q.embedding", "n.embedding")} AS cos
           |  FROM cand c
           |  JOIN embeddings q ON q.vec_id = c.q_id
           |  JOIN embeddings n ON n.vec_id = c.n_id) t
           |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
      }),

    // incremental IVF index maintenance: centers trained on the history
    // slice are PERSISTED (parquet artifact), and the new batch joins
    // the index through one broadcast assignment pass — no retraining,
    // history never rescanned. The oracle recomputes the stored
    // training (k-means over history only) and assigns the batch under
    // those centers, so a Spark side that retrained on the union — or
    // read the artifact wrong — hash-mismatches
    Q(
      "ann_ivf_incremental",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val history = e.filter(col("vec_id") < 400)
        val batch = e.filter(col("vec_id") >= 400)
        // pid-scoped artifact dir: eager write at plan construction,
        // single-writer contract as corpus_shard_export
        val path = "/tmp/graft_ivf_cents_" + new java.io.File(dir).getName +
          "_pid" + java.lang.ProcessHandle.current().pid()
        Similarity.kmeansCentroids(history, "vec_id", "embedding", Dim,
          k = 8, iters = 2).write.mode("overwrite").parquet(path)
        Similarity.ivfAssign(batch, "vec_id", "embedding", Dim,
          s.read.parquet(path)).orderBy(col("vec_id"))
      },
      Some {
        s"""WITH ${kmeansCtes(8, 2, "vec_id < 400")}
           |SELECT vec_id, cid FROM (
           |  SELECT e.vec_id, c.cid,
           |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |      ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid) AS rn
           |  FROM embeddings e CROSS JOIN c2 c WHERE e.vec_id >= 400) t
           |WHERE rn = 1 ORDER BY vec_id""".stripMargin
      }),

    // the DELETE verb of the vector-store lifecycle: a takedown set
    // (every 23rd vector) leaves the persisted IVF cells artifact via
    // ONE map-only anti-join rewrite — centroids untouched, nothing
    // retrained, history never re-encoded — and the search runs
    // through the MAINTAINED store's stored cell memberships. Oracle =
    // the same probe over the remaining corpus under the same stored
    // centers, so a leaked removed id, a dropped survivor, or a
    // perturbed assignment all break the hash
    Q(
      "ann_takedown_search",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        // pid-scoped artifact dir: eager write at plan construction,
        // single-writer contract as corpus_shard_export
        val path = "/tmp/graft_ivf_store_" + new java.io.File(dir).getName +
          "_pid" + java.lang.ProcessHandle.current().pid()
        Similarity.kmeansCentroids(e.filter(col("vec_id") < 400),
            "vec_id", "embedding", Dim, k = 8, iters = 2)
          .write.mode("overwrite").parquet(s"$path/cents")
        val cents = s.read.parquet(s"$path/cents")
        // the stored index: every vector assigned once, kept with its
        // embedding — the cells layout an IVF store persists
        Similarity.ivfAssign(e, "vec_id", "embedding", Dim, cents)
          .join(e, Seq("vec_id"))
          .write.mode("overwrite").parquet(s"$path/cells")
        // DELETE: one anti-join rewrite of the cells artifact
        val gone = e.filter(col("vec_id") % 23 === 0).select(col("vec_id"))
        s.read.parquet(s"$path/cells")
          .join(gone, Seq("vec_id"), "left_anti")
          .write.mode("overwrite").parquet(s"$path/cells_v2")
        Similarity.ivfTopKAssigned(
            e.filter(col("vec_id") < 20),
            s.read.parquet(s"$path/cells_v2"),
            "vec_id", "embedding", Dim, nProbe = 2, k = 3,
            centroidsDf = cents)
          .orderBy(col("q_id"), col("rank"))
      },
      Some {
        s"""WITH ${kmeansCtes(8, 2, "vec_id < 400")},
           |ca AS (SELECT vec_id, cid FROM (
           |    SELECT e.vec_id, c.cid,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid) AS rn
           |    FROM embeddings e CROSS JOIN c2 c
           |    WHERE e.vec_id % 23 <> 0) t WHERE rn = 1),
           |qa AS (SELECT vec_id, cid FROM (
           |    SELECT e.vec_id, c.cid,
           |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid) AS rn
           |    FROM embeddings e CROSS JOIN c2 c WHERE e.vec_id < 20) t
           |  WHERE rn <= 2),
           |cand AS (
           |  SELECT DISTINCT qa.vec_id AS q_id, ca.vec_id AS n_id
           |  FROM qa JOIN ca ON qa.cid = ca.cid
           |  WHERE qa.vec_id != ca.vec_id)
           |SELECT q_id, n_id, rank, cos FROM (
           |  SELECT c.q_id, c.n_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY c.q_id
           |      ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, c.n_id) AS INT) AS rank,
           |    ${cosSql("q.embedding", "n.embedding")} AS cos
           |  FROM cand c
           |  JOIN embeddings q ON q.vec_id = c.q_id
           |  JOIN embeddings n ON n.vec_id = c.n_id) t
           |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
      }),

    // recall drift of the STALE index (centers trained on history only,
    // corpus fully re-assigned under them) against a FRESH rebuild over
    // the whole corpus, both measured against brute-force truth — the
    // report that tells a daily-ingest vector index when incremental
    // assignment has drifted enough to pay for a retrain
    Q(
      "ann_recall_stale",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 20)
        def cents(src: org.apache.spark.sql.DataFrame) =
          Similarity.kmeansCentroids(src, "vec_id", "embedding", Dim,
            k = 8, iters = 2)
            .select(col("cid").as("vec_id"), col("c_v").as("embedding"))
        val stale = cents(e.filter(col("vec_id") < 400))
        val fresh = cents(e)
        val exact =
          Similarity.cosineTopK(q, e, "vec_id", "embedding", Dim, k = 5)
        val hs = Similarity.recallAtK(exact,
          Similarity.ivfTopK(q, e, "vec_id", "embedding", Dim,
            centroids = 8, nProbe = 2, k = 5, centroidsDf = stale))
          .select(col("q_id"), col("n_exact"), col("hits").as("hits_stale"))
        val hf = Similarity.recallAtK(exact,
          Similarity.ivfTopK(q, e, "vec_id", "embedding", Dim,
            centroids = 8, nProbe = 2, k = 5, centroidsDf = fresh))
          .select(col("q_id"), col("hits").as("hits_fresh"))
        hs.join(hf, "q_id").orderBy(col("q_id"))
      },
      Some {
        def ivCtes(pfx: String): String =
          s"""${pfx}ca AS (SELECT vec_id, cid FROM (
             |    SELECT e.vec_id, c.cid,
             |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |        ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid) AS rn
             |    FROM embeddings e CROSS JOIN ${pfx}c2 c) t WHERE rn = 1),
             |${pfx}qa AS (SELECT vec_id, cid FROM (
             |    SELECT e.vec_id, c.cid,
             |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
             |        ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid) AS rn
             |    FROM embeddings e CROSS JOIN ${pfx}c2 c
             |    WHERE e.vec_id < 20) t WHERE rn <= 2),
             |${pfx}cand AS (
             |  SELECT DISTINCT qa.vec_id AS q_id, ca.vec_id AS n_id
             |  FROM ${pfx}qa qa JOIN ${pfx}ca ca ON qa.cid = ca.cid
             |  WHERE qa.vec_id != ca.vec_id),
             |${pfx}iv AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT c.q_id, c.n_id,
             |      ROW_NUMBER() OVER (PARTITION BY c.q_id
             |        ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, c.n_id) AS rank
             |    FROM ${pfx}cand c
             |    JOIN embeddings q ON q.vec_id = c.q_id
             |    JOIN embeddings n ON n.vec_id = c.n_id) t
             |  WHERE rank <= 5)""".stripMargin
        s"""WITH ex AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
           |    FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
           |    WHERE a.vec_id < 20) t WHERE rank <= 5),
           |${kmeansCtes(8, 2, "vec_id < 400", "st")},
           |${ivCtes("st")},
           |${kmeansCtes(8, 2, "TRUE", "fr")},
           |${ivCtes("fr")}
           |SELECT ex.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
           |  CAST(SUM(CASE WHEN stiv.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_stale,
           |  CAST(SUM(CASE WHEN friv.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_fresh
           |FROM ex
           |LEFT JOIN stiv ON ex.q_id = stiv.q_id AND ex.n_id = stiv.n_id
           |LEFT JOIN friv ON ex.q_id = friv.q_id AND ex.n_id = friv.n_id
           |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin
      }),

    // incremental PQ index maintenance — the compressed-index sibling
    // of ann_ivf_incremental: the codebook trained on the HISTORY
    // slice is persisted (parquet artifact) and the new batch is
    // ENCODED against it in one map-only pass, no retraining, history
    // codes untouched. History starts at vec_id 100, so its codebook
    // differs from what a fresh full-corpus train would produce — a
    // Spark side that retrained on the union, or misread the
    // artifact, hash-mismatches the oracle's history-only codebook
    Q(
      "ann_pq_incremental",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val history = e.filter(col("vec_id") >= 100)
        val batch = e.filter(col("vec_id") < 100)
        // pid-scoped artifact dir: eager write at plan construction,
        // single-writer contract as corpus_shard_export
        val path = "/tmp/graft_pq_cb_" + new java.io.File(dir).getName +
          "_pid" + java.lang.ProcessHandle.current().pid()
        Similarity.pqCodebook(history, "vec_id", "embedding", ksub = 8)
          .write.mode("overwrite").parquet(path)
        // codes emitted as a canonical comma-joined STRING: the
        // driver's pandas comparison cannot sort/factorize array
        // columns (unhashable ndarray), so the gated schema is scalar
        Similarity.pqEncode(batch, "vec_id", "embedding", Dim, m = 4,
          s.read.parquet(path))
          .withColumn("codes", array_join(col("codes"), ","))
          .orderBy(col("vec_id"))
      },
      Some(pqIncrementalOracleSql)),

    // the LIVE-INGEST spelling of ann_pq_incremental: the same stored
    // codebook artifact, but the new batch arrives as an unbounded
    // parquet stream and each micro-batch is ONE codegen'd map-only
    // projection (codebook = literals; zero state, zero shuffle).
    // Same oracle — the drained stream must equal the batch encode
    Q(
      "stream_ann_encode",
      (s, dir) => StreamingQueries.streamAnnEncode(s, dir, Dim),
      Some(pqIncrementalOracleSql)),

    // incremental IVF-PQ (IVFADC) index maintenance — the composition
    // of the two incremental halves: BOTH stored artifacts (coarse
    // centers + residual codebook, trained on the history slice,
    // persisted as parquet) drive a one-pass map-only encode of the
    // new batch into the (cid, codes) rows the compressed index
    // stores. History starts past the smallest ids, so a retrain on
    // the union — or a broken artifact read — produces different
    // centers/codewords and fails the oracle's history-only recompute
    Q(
      "ann_ivfpq_incremental",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val history = e.filter(col("vec_id") >= 100)
        val batch = e.filter(col("vec_id") < 100)
        // pid-scoped artifact dir: eager write at plan construction,
        // single-writer contract as corpus_shard_export
        val path = "/tmp/graft_ivfpq_" + new java.io.File(dir).getName +
          "_pid" + java.lang.ProcessHandle.current().pid()
        Similarity.ivfpqCoarse(history, "vec_id", "embedding",
          centroids = 8).write.mode("overwrite").parquet(s"$path/coarse")
        Similarity.ivfpqResidualCodebook(history, "vec_id", "embedding",
          Dim, ksub = 8, s.read.parquet(s"$path/coarse"))
          .write.mode("overwrite").parquet(s"$path/cb")
        // codes as a canonical comma-joined STRING (see ann_pq_incremental)
        Similarity.ivfpqEncode(batch, "vec_id", "embedding", Dim, m = 4,
          s.read.parquet(s"$path/coarse"), s.read.parquet(s"$path/cb"))
          .withColumn("codes", array_join(col("codes"), ","))
          .orderBy(col("vec_id"))
      },
      Some {
        val m = 4; val ksub = 8; val nc = 8; val sub = Dim / m
        def l2full(a: String, b: String) =
          s"""list_sum(list_transform(range(1, ${Dim + 1}),
             |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
        def subdist(a: String, b: String) =
          s"""list_sum(list_transform(range(j*$sub + 1, j*$sub + ${sub + 1}),
             |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
        s"""WITH qvt AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           |  FROM embeddings),
           |cents AS (
           |  SELECT vec_id AS cid, qv AS cqv FROM qvt
           |  WHERE vec_id >= 100 ORDER BY vec_id LIMIT $nc),
           |seeds AS (SELECT vec_id, qv FROM qvt WHERE vec_id >= 100
           |          ORDER BY vec_id LIMIT $ksub),
           |hasgn AS (
           |  SELECT vec_id, qv, cqv FROM (
           |    SELECT v.vec_id, v.qv, c.cqv,
           |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
           |        ORDER BY ${l2full("v.qv", "c.cqv")}, c.cid) AS rn
           |    FROM seeds v CROSS JOIN cents c) t WHERE rn = 1),
           |cb AS (
           |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code,
           |    list_transform(range(1, ${Dim + 1}), i -> qv[i] - cqv[i]) AS rv
           |  FROM hasgn),
           |basgn AS (
           |  SELECT vec_id, cid, cqv FROM (
           |    SELECT v.vec_id, c.cid, c.cqv,
           |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
           |        ORDER BY ${l2full("v.qv", "c.cqv")}, c.cid) AS rn
           |    FROM qvt v CROSS JOIN cents c WHERE v.vec_id < 100) t
           |  WHERE rn = 1),
           |bres AS (
           |  SELECT b.vec_id, b.cid,
           |    list_transform(range(1, ${Dim + 1}), i -> v.qv[i] - b.cqv[i]) AS rv
           |  FROM basgn b JOIN qvt v USING (vec_id)),
           |js AS (SELECT unnest(range(0, $m)) AS j),
           |enc AS (
           |  SELECT vec_id, cid, j, code FROM (
           |    SELECT r.vec_id, r.cid, js.j, c.code,
           |      ROW_NUMBER() OVER (PARTITION BY r.vec_id, js.j
           |        ORDER BY ${subdist("r.rv", "c.rv")}, c.code) AS rn
           |    FROM bres r CROSS JOIN cb c CROSS JOIN js) t WHERE rn = 1)
           |SELECT vec_id, MIN(cid) AS cid,
           |  string_agg(CAST(code AS VARCHAR), ',' ORDER BY j) AS codes
           |FROM enc GROUP BY vec_id ORDER BY vec_id""".stripMargin
      }),

    // metadata-filtered ANN: top-k restricted to a corpus predicate
    // (label = 2), the "search only the docs matching this filter" shape.
    // The filter reaches the parquet scan (PushedFilters) BEFORE any
    // scoring — the pruned corpus is what gets crossed with the
    // broadcast query batch
    Q(
      "ann_filtered_topk",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        Similarity.cosineTopK(
          e.filter(col("vec_id") < 20), e.filter(col("label") === 2),
          "vec_id", "embedding", Dim, k = 5)
          .orderBy(col("q_id"), col("rank"))
      },
      Some(s"""SELECT q_id, n_id, rank, cos FROM (
             |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id
             |      ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS INT) AS rank,
             |    ${cosSql("a.embedding", "b.embedding")} AS cos
             |  FROM embeddings a JOIN embeddings b
             |    ON a.vec_id != b.vec_id AND b.label = 2
             |  WHERE a.vec_id < 20) t
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // ANN recall report: per-query overlap of the IVF index against the
    // exact brute-force top-k — the evaluation loop that sizes
    // nProbe/centroids before a deployment commits to them
    Q(
      "ann_recall_ivf",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 20)
        Similarity.recallAtK(
          Similarity.cosineTopK(q, e, "vec_id", "embedding", Dim, k = 5),
          Similarity.ivfTopK(q, e, "vec_id", "embedding", Dim,
            centroids = 8, nProbe = 2, k = 5))
          .orderBy(col("q_id"))
      },
      Some {
        val assignRank =
          s"ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY ${cosSql("e.embedding", "c.cv")} DESC, c.cid)"
        s"""WITH ex AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
           |    FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
           |    WHERE a.vec_id < 20) t WHERE rank <= 5),
           |cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < 8),
           |ca AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT e.vec_id, c.cid, $assignRank AS rn
           |    FROM embeddings e CROSS JOIN cents c) t WHERE rn = 1),
           |qa AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT e.vec_id, c.cid, $assignRank AS rn
           |    FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 20) t WHERE rn <= 2),
           |cand AS (
           |  SELECT DISTINCT qa.vec_id AS q_id, ca.vec_id AS n_id
           |  FROM qa JOIN ca ON qa.cid = ca.cid
           |  WHERE qa.vec_id != ca.vec_id),
           |iv AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT c.q_id, c.n_id,
           |      ROW_NUMBER() OVER (PARTITION BY c.q_id
           |        ORDER BY ${cosSql("q.embedding", "n.embedding")} DESC, c.n_id) AS rank
           |    FROM cand c
           |    JOIN embeddings q ON q.vec_id = c.q_id
           |    JOIN embeddings n ON n.vec_id = c.n_id) t
           |  WHERE rank <= 5)
           |SELECT ex.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
           |  CAST(SUM(CASE WHEN iv.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
           |FROM ex LEFT JOIN iv ON ex.q_id = iv.q_id AND ex.n_id = iv.n_id
           |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin
      }),

    // ANN recall for the hyperplane-LSH index: per-query hit count of
    // the bucketed scan against brute-force truth — the number that
    // sizes `planes` (bucket count vs recall) before deploying the
    // random-projection layout
    Q(
      "ann_recall_lsh",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 20)
        Similarity.recallAtK(
          Similarity.cosineTopK(q, e, "vec_id", "embedding", Dim, k = 5),
          Similarity.lshTopK(q, e, "vec_id", "embedding", Dim,
            planes = 4, k = 5))
          .orderBy(col("q_id"))
      },
      Some {
        s"""WITH ex AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
           |    FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
           |    WHERE a.vec_id < 20) t WHERE rank <= 5),
           |bk AS (SELECT vec_id, embedding, ${bucketSql("embedding", 4)} AS bucket FROM embeddings),
           |ap AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
           |    FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id != b.vec_id
           |    WHERE a.vec_id < 20) t WHERE rank <= 5)
           |SELECT ex.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
           |  CAST(SUM(CASE WHEN ap.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
           |FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.n_id = ap.n_id
           |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin
      }),

    // ANN recall for the plain-PQ scan vs brute-force cosine truth —
    // quantifies the asymmetric-distance approximation alone (no coarse
    // cells), isolating the (m, ksub) loss from the IVF probe loss
    Q(
      "ann_recall_pq",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 20)
        Similarity.recallAtK(
          Similarity.cosineTopK(q, e, "vec_id", "embedding", Dim, k = 5),
          Similarity.pqTopK(q, e, "vec_id", "embedding", Dim,
            m = 4, ksub = 8, k = 5))
          .orderBy(col("q_id"))
      },
      Some {
        val m = 4; val ksub = 8; val sub = Dim / m
        def subdist(a: String, b: String) =
          s"""list_sum(list_transform(range(j*$sub + 1, j*$sub + ${sub + 1}),
             |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
        s"""WITH ex AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
           |    FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
           |    WHERE a.vec_id < 20) t WHERE rank <= 5),
           |qvt AS (
           |  SELECT vec_id,
           |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           |  FROM embeddings),
           |cb AS (
           |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, qv
           |  FROM (SELECT vec_id, qv FROM qvt ORDER BY vec_id LIMIT $ksub)),
           |js AS (SELECT unnest(range(0, $m)) AS j),
           |enc AS (
           |  SELECT vec_id, j, code FROM (
           |    SELECT v.vec_id, js.j, c.code,
           |      ROW_NUMBER() OVER (PARTITION BY v.vec_id, js.j
           |        ORDER BY ${subdist("v.qv", "c.qv")}, c.code) AS rn
           |    FROM qvt v CROSS JOIN cb c CROSS JOIN js) t WHERE rn = 1),
           |lut AS (
           |  SELECT q.vec_id AS q_id, js.j, c.code,
           |    ${subdist("q.qv", "c.qv")} AS d
           |  FROM qvt q CROSS JOIN cb c CROSS JOIN js WHERE q.vec_id < 20),
           |sc AS (
           |  SELECT l.q_id, e.vec_id AS n_id, SUM(l.d) AS dist
           |  FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code
           |  WHERE l.q_id != e.vec_id GROUP BY 1, 2),
           |ap AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY dist, n_id) AS rank FROM sc) t
           |  WHERE rank <= 5)
           |SELECT ex.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
           |  CAST(SUM(CASE WHEN ap.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
           |FROM ex LEFT JOIN ap ON ex.q_id = ap.q_id AND ex.n_id = ap.n_id
           |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin
      }),

    // ANN recall for the index layout a deployment actually ships:
    // IVF-PQ whose coarse cells are TRAINED k-means centers (2 Lloyd
    // iterations → integer-mean centers in quantized space, fed through
    // ivfpqTopK's centroidsDf seam) — the recall number that sizes
    // centroids/nProbe/m/ksub before committing a billion-vector index
    Q(
      "ann_recall_ivfpq",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 20)
        val cents = Similarity.kmeansQuantizedMeans(
          e, "vec_id", "embedding", Dim, k = 8, iters = 2)
        Similarity.recallAtK(
          Similarity.cosineTopK(q, e, "vec_id", "embedding", Dim, k = 5),
          Similarity.ivfpqTopK(q, e, "vec_id", "embedding", Dim,
            centroids = 8, nProbe = 2, m = 4, ksub = 8, k = 5,
            centroidsDf = cents))
          .orderBy(col("q_id"))
      },
      Some {
        val m = 4; val ksub = 8; val nProbe = 2
        val sub = Dim / m
        def l2full(a: String, b: String) =
          s"""list_sum(list_transform(range(1, ${Dim + 1}),
             |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
        def subdist(a: String, b: String) =
          s"""list_sum(list_transform(range(j*$sub + 1, j*$sub + ${sub + 1}),
             |      i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))""".stripMargin
        // kmeansCtes yields qvt + the trained centers c2 (sums); am/ms/
        // cents re-assign the corpus and take per-cell integer means —
        // floor of an IEEE-exact division, the same BIGINT both engines
        // compute (see Similarity.kmeansQuantizedMeans)
        s"""WITH ${kmeansCtes(8, 2)},
           |am AS (SELECT vec_id, cid, qv FROM (
           |    SELECT q.vec_id, c.cid, q.qv,
           |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
           |        ORDER BY ${icosSql("q.qv", "c.cv")} DESC, c.cid) AS rn
           |    FROM qvt q CROSS JOIN c2 c) t WHERE rn = 1),
           |ms AS (SELECT cid, i AS d, SUM(qv[i]) AS sx, COUNT(*) AS n
           |  FROM am CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS i) dims
           |  GROUP BY cid, i),
           |cents AS (SELECT cid,
           |    list(CAST(floor(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
           |      ORDER BY d) AS cqv
           |  FROM ms GROUP BY cid),
           |asgn AS (
           |  SELECT vec_id, cid, cqv FROM (
           |    SELECT v.vec_id, c.cid, c.cqv,
           |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
           |        ORDER BY ${l2full("v.qv", "c.cqv")}, c.cid) AS rn
           |    FROM qvt v CROSS JOIN cents c) t WHERE rn = 1),
           |res AS (
           |  SELECT v.vec_id, a.cid,
           |    list_transform(range(1, ${Dim + 1}), i -> v.qv[i] - a.cqv[i]) AS rv
           |  FROM qvt v JOIN asgn a USING (vec_id)),
           |cb AS (
           |  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, rv
           |  FROM (SELECT vec_id, rv FROM res ORDER BY vec_id LIMIT $ksub)),
           |js AS (SELECT unnest(range(0, $m)) AS j),
           |enc AS (
           |  SELECT vec_id, cid, j, code FROM (
           |    SELECT r.vec_id, r.cid, js.j, c.code,
           |      ROW_NUMBER() OVER (PARTITION BY r.vec_id, js.j
           |        ORDER BY ${subdist("r.rv", "c.rv")}, c.code) AS rn
           |    FROM res r CROSS JOIN cb c CROSS JOIN js) t WHERE rn = 1),
           |probes AS (
           |  SELECT vec_id AS q_id, cid, cqv FROM (
           |    SELECT v.vec_id, c.cid, c.cqv,
           |      ROW_NUMBER() OVER (PARTITION BY v.vec_id
           |        ORDER BY ${l2full("v.qv", "c.cqv")}, c.cid) AS rn
           |    FROM qvt v CROSS JOIN cents c WHERE v.vec_id < 20) t
           |  WHERE rn <= $nProbe),
           |qres AS (
           |  SELECT p.q_id, p.cid,
           |    list_transform(range(1, ${Dim + 1}), i -> v.qv[i] - p.cqv[i]) AS rv
           |  FROM probes p JOIN qvt v ON v.vec_id = p.q_id),
           |lut AS (
           |  SELECT q.q_id, q.cid, js.j, c.code,
           |    ${subdist("q.rv", "c.rv")} AS d
           |  FROM qres q CROSS JOIN cb c CROSS JOIN js),
           |sc AS (
           |  SELECT l.q_id, e.vec_id AS n_id, SUM(l.d) AS dist
           |  FROM enc e JOIN lut l ON l.cid = e.cid AND l.j = e.j AND l.code = e.code
           |  WHERE l.q_id != e.vec_id GROUP BY 1, 2),
           |iv AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT q_id, n_id,
           |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, n_id) AS rank
           |    FROM sc) t WHERE rank <= 5),
           |ex AS (
           |  SELECT q_id, n_id FROM (
           |    SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
           |        ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
           |    FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
           |    WHERE a.vec_id < 20) t WHERE rank <= 5)
           |SELECT ex.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
           |  CAST(SUM(CASE WHEN iv.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
           |FROM ex LEFT JOIN iv ON ex.q_id = iv.q_id AND ex.n_id = iv.n_id
           |GROUP BY ex.q_id ORDER BY ex.q_id""".stripMargin
      }),

    // text -> hashed embedding -> retrieval, end to end with no model:
    // feature-hashed ±1 bag-of-tokens vectors (engine-exact integers),
    // integer dot-product top-5 for 10 probe docs; swapping in a real
    // encoder changes only the vector column
    Q(
      "text_ann_topk",
      (s, dir) => {
        val emb = Corpus.hashedEmbedding(table(s, dir, "documents"),
          "doc_id", "text", dim = 16).localCheckpoint(true)
        val q = emb.filter(col("doc_id") < 10)
          .select(col("doc_id").as("q_id"), col("hvec").as("q_v"))
        val c = emb.select(col("doc_id").as("n_id"), col("hvec").as("n_v"))
        c.join(broadcast(q), col("q_id") =!= col("n_id"))
          .withColumn("score",
            expr("aggregate(zip_with(q_v, n_v, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
          .groupBy(col("q_id"))
          .agg(graft.functions.TopKByScore.top_k_by_score(
            col("score").cast("double"), col("n_id"), 5).as("top"))
          .select(col("q_id"), posexplode(col("top")).as(Seq("r0", "t")))
          .select(col("q_id"), col("t.id").as("n_id"),
            (col("r0") + 1).cast("int").as("rank"),
            col("t.score").cast("long").as("score"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some {
        val dense = (0 until 16).map(i =>
          s"CAST(SUM(CASE WHEN j = $i THEN v ELSE 0 END) AS BIGINT)")
          .mkString("[", ", ", "]")
        val idot = "list_sum(list_transform(range(1, 17), i -> a.hv[i] * b.hv[i]))"
        s"""WITH $toksCte,
           |idx AS (SELECT doc_id, unnest(ws) AS tok FROM toks),
           |hv0 AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 12))::BIGINT AS h,
           |    ('0x' || substr(md5(tok), 13, 1))::BIGINT AS sb FROM idx),
           |comp AS (SELECT doc_id, CAST(h % 16 AS INT) AS j,
           |    CAST(SUM(CASE WHEN sb % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS v
           |  FROM hv0 GROUP BY 1, 2),
           |dense AS (SELECT doc_id, $dense AS hv FROM comp GROUP BY doc_id),
           |d AS (
           |  SELECT a.doc_id AS q_id, b.doc_id AS n_id,
           |    CAST($idot AS BIGINT) AS score
           |  FROM dense a JOIN dense b ON a.doc_id != b.doc_id
           |  WHERE a.doc_id < 10)
           |SELECT q_id, n_id, rank, score FROM (
           |  SELECT q_id, n_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY score DESC, n_id) AS INT) AS rank, score
           |  FROM d) t
           |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
      }),

    // full-corpus kNN graph by LSH blocking: corpus-as-queries, both
    // join sides shuffled on the bucket id (no broadcast anywhere) —
    // the plan that survives when "queries" means a billion vectors
    Q(
      "ann_knn_graph",
      (s, dir) =>
        Similarity.knnGraph(table(s, dir, "embeddings"),
          "vec_id", "embedding", Dim, planes = 4, k = 3)
          .orderBy(col("q_id"), col("rank")),
      Some(s"""WITH bk AS (
             |  SELECT vec_id, embedding, ${bucketSql("embedding", 4)} AS bucket
             |  FROM embeddings),
             |d AS (
             |  SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             |    ${cosSql("a.embedding", "b.embedding")} AS cos
             |  FROM bk a JOIN bk b
             |    ON a.bucket = b.bucket AND a.vec_id != b.vec_id)
             |SELECT q_id, n_id, rank, cos FROM (
             |  SELECT q_id, n_id,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
             |      ORDER BY cos DESC, n_id) AS INT) AS rank, cos
             |  FROM d) t
             |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin)),

    // deterministic J-L random projection 64 -> 8: milli-quantized
    // inputs x the (d, j)-derived integer weight lattice, every output
    // an exact integer — the cheap-index/full-rerank reduction pass
    Q(
      "emb_random_projection",
      (s, dir) =>
        Similarity.randomProjection(table(s, dir, "embeddings"),
          "vec_id", "embedding", Dim, outDim = 8)
          .orderBy(col("vec_id")),
      Some {
        val cols = (0 until 8).map { j =>
          (0 until Dim).map { d =>
            s"CAST(floor(CAST(embedding[${d + 1}] AS DOUBLE) * 1000) AS BIGINT)" +
              s" * (${Similarity.planeWeight(d, j)})"
          }.mkString(" + ") + s" AS p$j"
        }
        s"""SELECT vec_id,
           |${cols.mkString(",\n")}
           |FROM embeddings ORDER BY vec_id""".stripMargin
      }),

    // top principal direction of the embedding cloud: ONE distributed
    // exact-integer Gram pass (map-side partial agg onto dim^2 keys),
    // then 8 integer power-iteration rounds on the dim^2 driver state —
    // the dominant-direction removal / whitening / drift primitive,
    // engine-exact via the HUGEINT renormalization
    Q(
      "emb_top_component",
      (s, dir) =>
        Similarity.topComponent(table(s, dir, "embeddings"), "embedding",
          Dim, rounds = 8)
          .orderBy(col("dim_pos")),
      Some(s"""WITH $topComponentCtes
             |SELECT CAST(j - 1 AS INT) AS dim_pos, w AS component
             |FROM w8 ORDER BY dim_pos""".stripMargin)),

    // dominant-direction removal (all-but-the-top, first direction):
    // residuals scaled by ||w||^2 so every output is one exact integer
    // and resid . w = 0 is an algebraic identity — one map-only pass
    // with w riding as literals after the bounded driver eigensolve
    Q(
      "emb_top_removal",
      (s, dir) =>
        Similarity.removeTopComponent(table(s, dir, "embeddings"),
          "vec_id", "embedding", Dim, rounds = 8)
          .orderBy(col("vec_id"), col("dim_pos")),
      Some(s"""WITH $topComponentCtes,
             |wsq AS MATERIALIZED (
             |  SELECT CAST(SUM(w * w) AS BIGINT) AS ww FROM w8),
             |qd AS MATERIALIZED (
             |  SELECT vec_id, list_transform(embedding,
             |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
             |  FROM embeddings),
             |d AS MATERIALIZED (
             |  SELECT vec_id, CAST(SUM(qd.qv[w.j] * w.w) AS BIGINT) AS d
             |  FROM qd, w8 w GROUP BY 1)
             |SELECT qd.vec_id, CAST(w.j - 1 AS INT) AS dim_pos,
             |  CAST(qd.qv[w.j] * ww - d.d * w.w AS BIGINT) AS resid
             |FROM qd, w8 w, wsq, d
             |WHERE d.vec_id = qd.vec_id
             |ORDER BY qd.vec_id, dim_pos""".stripMargin)),

    // pairwise cosine between per-label embedding CENTROIDS: the
    // label-affinity report that sizes cross-domain dedup thresholds.
    // Milli-unit integer quantization, un-normalized integer sums as
    // centroids (cosine is scale-invariant), one fixed double shape for
    // the final cos_micro — engine-exact end to end.
    Q(
      "emb_label_centroid_sim",
      (s, dir) =>
        Similarity.labelCentroidSimilarity(
          table(s, dir, "embeddings"), "label", "embedding")
          .orderBy(col("la"), col("lb")),
      Some(s"""WITH x AS (
             |  SELECT label,
             |    unnest(range(1, ${Dim + 1})) AS pos,
             |    unnest(list_transform(embedding, e ->
             |      CAST(FLOOR(CAST(e AS DOUBLE) * 1000.0) AS BIGINT))) AS qv
             |  FROM embeddings),
             |cen AS (
             |  SELECT label, pos, CAST(SUM(qv) AS BIGINT) AS c
             |  FROM x GROUP BY label, pos),
             |nrm AS (
             |  SELECT label, CAST(SUM(c*c) AS BIGINT) AS nrm
             |  FROM cen GROUP BY label),
             |dots AS (
             |  SELECT a.label AS la, b.label AS lb,
             |    CAST(SUM(a.c * b.c) AS BIGINT) AS dot
             |  FROM cen a JOIN cen b ON a.pos = b.pos AND a.label < b.label
             |  GROUP BY 1, 2)
             |SELECT la, lb,
             |  CAST(FLOOR(CAST(dot AS DOUBLE) /
             |    (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE)))
             |    * 1000000.0) AS BIGINT) AS cos_micro
             |FROM dots JOIN nrm na ON na.label = la JOIN nrm nb ON nb.label = lb
             |ORDER BY la, lb""".stripMargin)),

    // embedding outliers: rows whose cosine to their OWN label centroid
    // sits > 2 sigma below the label mean — the mislabeled/noise screen;
    // low-tail-only cross-multiplied integer moments, centroid broadcast
    Q(
      "emb_label_outliers",
      (s, dir) =>
        Similarity.labelOutliers(table(s, dir, "embeddings"),
          "vec_id", "label", "embedding", sigmas = 2)
          .orderBy(col("vec_id")),
      Some(s"""WITH qvt AS (
             |  SELECT vec_id, label,
             |    list_transform(embedding, e ->
             |      CAST(FLOOR(CAST(e AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
             |  FROM embeddings),
             |x AS (
             |  SELECT label, unnest(range(1, ${Dim + 1})) AS pos, unnest(qv) AS v
             |  FROM qvt),
             |cen AS (SELECT label, pos, CAST(SUM(v) AS BIGINT) AS c
             |  FROM x GROUP BY 1, 2),
             |cl AS (SELECT label, list(c ORDER BY pos) AS cv FROM cen GROUP BY 1),
             |sc AS (
             |  SELECT q.vec_id, q.label,
             |    CAST(FLOOR(
             |      list_sum(list_transform(range(1, ${Dim + 1}),
             |        i -> CAST(q.qv[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE)))
             |      / (sqrt(list_sum(list_transform(range(1, ${Dim + 1}),
             |           i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))
             |       * sqrt(list_sum(list_transform(range(1, ${Dim + 1}),
             |           i -> CAST(c.cv[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE)))))
             |      * 1000000.0) AS BIGINT) AS cos_micro
             |  FROM qvt q JOIN cl c USING (label)),
             |st AS (
             |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(SUM(cos_micro) AS BIGINT) AS s,
             |    CAST(SUM(cos_micro * cos_micro) AS BIGINT) AS ss
             |  FROM sc GROUP BY 1)
             |SELECT vec_id, label, cos_micro
             |FROM sc JOIN st USING (label)
             |WHERE (s - n * cos_micro) > 0
             |  AND (n * cos_micro - s) * (n * cos_micro - s) > 4 * (n * ss - s * s)
             |ORDER BY vec_id""".stripMargin)),

    // ======== multimodal plumbing (byte-level; decode is stubbed) ========
    Q(
      "multimodal_bytes",
      (s, dir) =>
        table(s, dir, "documents")
          .select(
            col("doc_id"),
            length(col("text").cast("binary")).as("n_bytes"),
            md5(col("text").cast("binary")).as("content_hash"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |  CAST(octet_length(text::BLOB) AS INT) AS n_bytes,
             |  md5(text) AS content_hash
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // REAL decode through the MediaDecoder seam: each doc's first 192
    // bytes become an 8x8 RGB24 PPM (encodePpm), ImageDecoder parses the
    // header + raster back out, and the per-image pixel sum must equal
    // the byte sum DuckDB computes straight off the text — an
    // encode→decode→featurize roundtrip, not a stub
    Q(
      "multimodal_decode",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.MediaPipeline
        import MediaPipeline.{ImageDecoder, MediaRow}
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >= 192)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 192).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          MediaRow(id, "image", MediaPipeline.encodePpm(8, 8, px), "ppm", 8, 8, 0L)
        }
        MediaPipeline.sampleFrames(media, new ImageDecoder, 1)(s)
          .map(f => (f.id, f.width, f.height,
            f.pixels.foldLeft(0L)((a, b) => a + (b & 0xff))))
          .toDF("doc_id", "width", "height", "px_sum")
          .orderBy(col("doc_id"))
      },
      // byte-exact oracle: hex the UTF-8 blob and sum byte pairs — a
      // character-based substring+unicode() spelling would diverge from
      // the Spark side's BYTE window on any non-ASCII document
      Some("""WITH h AS (
             |  SELECT doc_id, substr(hex(encode(text)), 1, 384) AS hx
             |  FROM documents WHERE octet_length(encode(text)) >= 192)
             |SELECT doc_id, 8 AS width, 8 AS height,
             |  CAST(list_sum(list_transform(range(0, 192),
             |    i -> ('0x' || substr(hx, 2*i + 1, 2))::BIGINT)) AS BIGINT) AS px_sum
             |FROM h ORDER BY doc_id""".stripMargin)),

    // REAL baseline-PNG decode through the same seam (r11: the first
    // COMPRESSED real-world image codec — the public PNG spec, zlib
    // DEFLATE via the JDK): the raster goes through encodePng with the
    // PAETH row filter and real deflate, ImageDecoder walks the chunk
    // stream, inflates, defilters, and the reconstructed pixel sum must
    // equal the byte sum DuckDB computes straight off the text — so the
    // inflate + defilter path is byte-gated, not trusted. (The other
    // four filter types and gray/RGBA roundtrips are spec-gated in
    // ImageDecoderSpec; crawl-real PNGs ride the identical code path.)
    Q(
      "multimodal_png",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.MediaPipeline
        import MediaPipeline.{ImageDecoder, MediaRow}
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >= 192)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 192).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          MediaRow(id, "image", MediaPipeline.encodePng(8, 8, px, rowFilter = 4),
            "png", 8, 8, 0L)
        }
        MediaPipeline.sampleFrames(media, new ImageDecoder, 1)(s)
          .map(f => (f.id, f.width, f.height,
            f.pixels.foldLeft(0L)((a, b) => a + (b & 0xff))))
          .toDF("doc_id", "width", "height", "px_sum")
          .orderBy(col("doc_id"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id, substr(hex(encode(text)), 1, 384) AS hx
             |  FROM documents WHERE octet_length(encode(text)) >= 192)
             |SELECT doc_id, 8 AS width, 8 AS height,
             |  CAST(list_sum(list_transform(range(0, 192),
             |    i -> ('0x' || substr(hx, 2*i + 1, 2))::BIGINT)) AS BIGINT) AS px_sum
             |FROM h ORDER BY doc_id""".stripMargin)),

    // REAL baseline-JPEG decode through the same seam (r12: the format
    // crawl images actually arrive in — ITU-T T.81 sequential DCT +
    // Huffman). Each doc's first 16 bytes become a 32×32 grayscale of
    // 16 constant 8×8 blocks; the encoder runs the REAL pipeline
    // (integer fDCT, flat quant, Annex-K Huffman, DRI/RST4 restart
    // markers), so the decoder's marker walk, DQT/DHT build, bitstream
    // Huffman decode with byte unstuffing AND restart resync, DC DPCM
    // across 16 blocks, dequant, and integer IDCT are all on the gated
    // path. Constant blocks make the DCT roundtrip integer-EXACT
    // (DC-only: (64d+4)//8 quantize then ((8d<<2)·descales) recover d
    // bit-for-bit), so the oracle pins the reconstructed pixel sum
    // straight off the raw bytes — no tolerance. AC coefficients,
    // color/4:2:0, and corrupt-stream misses are spec-gated in
    // ImageDecoderSpec (cross-checked against the JDK's independent
    // libjpeg-based ImageIO decoder).
    Q(
      "multimodal_jpeg",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.{Jpeg, MediaPipeline}
        import MediaPipeline.{ImageDecoder, MediaRow}
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >= 16)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 16).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          val gray = new Array[Byte](32 * 32)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              gray(y * 32 + x) = px((y / 8) * 4 + (x / 8)); x += 1
            }
            y += 1
          }
          MediaRow(id, "image",
            Jpeg.encodeGray(32, 32, gray, restartInterval = 4),
            "jpg", 32, 32, 0L)
        }
        MediaPipeline.sampleFrames(media, new ImageDecoder, 1)(s)
          .map(f => (f.id, f.width, f.height,
            f.pixels.foldLeft(0L)((a, b) => a + (b & 0xff))))
          .toDF("doc_id", "width", "height", "px_sum")
          .orderBy(col("doc_id"))
      },
      // 192 = 3 (gray→RGB) × 64 (pixels per constant block); byte-exact
      // off the UTF-8 blob like the PNG/PPM gates
      Some("""WITH h AS (
             |  SELECT doc_id, substr(hex(encode(text)), 1, 32) AS hx
             |  FROM documents WHERE octet_length(encode(text)) >= 16)
             |SELECT doc_id, 32 AS width, 32 AS height,
             |  CAST(192 * list_sum(list_transform(range(0, 16),
             |    i -> ('0x' || substr(hx, 2*i + 1, 2))::BIGINT)) AS BIGINT) AS px_sum
             |FROM h ORDER BY doc_id""".stripMargin)),

    // PROGRESSIVE (SOF2) JPEG decode through the same seam (r13: the
    // other half of real crawl images — most large web JPEGs are
    // progressive). The encoder emits a genuine Annex-G multi-scan
    // script: DC first with successive approximation (Al=1), a DC
    // refinement scan (raw correction bits), then the whole AC band by
    // spectral selection with EOB-run coding — plus DRI/RST3 restarts,
    // so the decoder's multi-scan marker walk, coefficient-buffer
    // accumulation across scans, two's-complement bit reassembly of
    // the split DC, EOB-run bookkeeping, and per-scan restart resync
    // are all on the gated path. Constant blocks keep the roundtrip
    // integer-exact (same argument as multimodal_jpeg), so the oracle
    // pins reconstructed pixel sums straight off the raw bytes with no
    // tolerance. Nonzero-AC progressive streams and the JDK's own
    // successive-approximation AC script are spec-gated in
    // ImageDecoderSpec (cross-checked against ImageIO both ways).
    Q(
      "multimodal_jpeg_progressive",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.{Jpeg, MediaPipeline}
        import MediaPipeline.{ImageDecoder, MediaRow}
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >= 16)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 16).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          val gray = new Array[Byte](32 * 32)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              gray(y * 32 + x) = px((y / 8) * 4 + (x / 8)); x += 1
            }
            y += 1
          }
          MediaRow(id, "image",
            Jpeg.encodeGrayProgressive(32, 32, gray, restartInterval = 3),
            "jpg", 32, 32, 0L)
        }
        MediaPipeline.sampleFrames(media, new ImageDecoder, 1)(s)
          .map(f => (f.id, f.width, f.height,
            f.pixels.foldLeft(0L)((a, b) => a + (b & 0xff))))
          .toDF("doc_id", "width", "height", "px_sum")
          .orderBy(col("doc_id"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id, substr(hex(encode(text)), 1, 32) AS hx
             |  FROM documents WHERE octet_length(encode(text)) >= 16)
             |SELECT doc_id, 32 AS width, 32 AS height,
             |  CAST(192 * list_sum(list_transform(range(0, 16),
             |    i -> ('0x' || substr(hx, 2*i + 1, 2))::BIGINT)) AS BIGINT) AS px_sum
             |FROM h ORDER BY doc_id""".stripMargin)),

    // perceptual near-dup END-TO-END on JPEG bytes — the exact
    // composition a crawl image pipeline runs: JPEG decode (real
    // bitstream) → nearest-neighbor resize to the hash grid → integer
    // dHash → exact fingerprint grouping. Constant 8×8 blocks keep the
    // decode integer-exact, and the 32→8 nearest resample picks pixel
    // (4x, 4y) — i.e. block (x/2, y/2) — so the oracle re-derives every
    // gradient bit straight off the raw bytes: decode, resize, and
    // hash are all on the gated path at once (each is also gated
    // alone: multimodal_jpeg, the resize spec, multimodal_phash_dups).
    Q(
      "multimodal_jpeg_phash",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.{Jpeg, MediaPipeline}
        import MediaPipeline.{ImageDecoder, MediaRow}
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >= 16)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 16).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          val gray = new Array[Byte](32 * 32)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              gray(y * 32 + x) = px((y / 8) * 4 + (x / 8)); x += 1
            }
            y += 1
          }
          MediaRow(id, "image", Jpeg.encodeGray(32, 32, gray), "jpg",
            32, 32, 0L)
        }
        val dec = new ImageDecoder
        MediaPipeline.dHash(
          MediaPipeline.sampleFrames(media, dec, 1)(s)
            .map(f => dec.resize(f, 8, 8)))(s)
          .toDF("doc_id", "fp")
          .groupBy(col("fp"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
          .filter(col("n_docs") >= 2)
          .select(col("fp").as("phash"), col("n_docs"), col("min_doc"))
          .orderBy(col("phash"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id, substr(hex(encode(text)), 1, 32) AS hx
             |  FROM documents WHERE octet_length(encode(text)) >= 16),
             |b AS (SELECT doc_id, list_transform(range(0, 16),
             |  i -> ('0x' || substr(hx, 2*i + 1, 2))::BIGINT) AS px FROM h),
             |g AS (SELECT doc_id, list_transform(range(0, 64),
             |  p -> px[(p // 8 // 2) * 4 + ((p % 8) // 2) + 1]) AS gray FROM b),
             |f AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 56), bb ->
             |  CASE WHEN gray[(bb // 7) * 8 + (bb % 7) + 1] > gray[(bb // 7) * 8 + (bb % 7) + 2]
             |       THEN (1::BIGINT << bb) ELSE 0 END)) AS BIGINT) AS fp FROM g)
             |SELECT fp AS phash, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  MIN(doc_id) AS min_doc
             |FROM f GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY phash""".stripMargin)),

    // the AREA-average resize leg of the perceptual-hash grid (r13):
    // production dHash pipelines downscale with pixel-area pooling
    // (OpenCV INTER_AREA), not nearest-neighbor point sampling. The
    // fixture adds a deterministic per-pixel dither ((x%4)·7+(y%4)·13
    // on top of each 8×8 base block) so every 4×4 resize box holds 16
    // DISTINCT values — nearest-neighbor would hash the dither, the
    // area mean pools it; the oracle recomputes every 16-term box sum
    // and the 56-bit hash from the raw bytes, bit-gating the averaging
    // arithmetic itself. PPM (lossless) so encode→decode is exact.
    Q(
      "multimodal_phash_area",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.MediaPipeline
        import MediaPipeline.{ImageDecoder, MediaRow}
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >= 16)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 16).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          val rgb = new Array[Byte](32 * 32 * 3)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              val v = ((px((y / 8) * 4 + x / 8) & 0xff) +
                (x % 4) * 7 + (y % 4) * 13) % 256
              val o = (y * 32 + x) * 3
              rgb(o) = v.toByte; rgb(o + 1) = v.toByte; rgb(o + 2) = v.toByte
              x += 1
            }
            y += 1
          }
          MediaRow(id, "image", MediaPipeline.encodePpm(32, 32, rgb), "ppm",
            32, 32, 0L)
        }
        MediaPipeline.dHash(
          MediaPipeline.sampleFrames(media, new ImageDecoder, 1)(s)
            .map(f => MediaPipeline.resizeArea(f, 8, 8)))(s)
          .toDF("doc_id", "fp")
          .groupBy(col("fp"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
          .filter(col("n_docs") >= 2)
          .select(col("fp").as("phash"), col("n_docs"), col("min_doc"))
          .orderBy(col("phash"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id, substr(hex(encode(text)), 1, 32) AS hx
             |  FROM documents WHERE octet_length(encode(text)) >= 16),
             |b AS (SELECT doc_id, list_transform(range(0, 16),
             |  i -> ('0x' || substr(hx, 2*i + 1, 2))::BIGINT) AS px FROM h),
             |g AS (SELECT doc_id, list_transform(range(0, 64), p ->
             |  list_sum(list_transform(range(0, 16), q ->
             |    (px[((p // 8) // 2) * 4 + ((p % 8) // 2) + 1]
             |      + (q % 4) * 7 + (q // 4) * 13) % 256)) // 16) AS gray FROM b),
             |f AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 56), bb ->
             |  CASE WHEN gray[(bb // 7) * 8 + (bb % 7) + 1] > gray[(bb // 7) * 8 + (bb % 7) + 2]
             |       THEN (1::BIGINT << bb) ELSE 0 END)) AS BIGINT) AS fp FROM g)
             |SELECT fp AS phash, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  MIN(doc_id) AS min_doc
             |FROM f GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY phash""".stripMargin)),

    // int8-quantization recall report: completes the recall family —
    // the fp32-vs-int8 quality number a user consults before flipping
    // the quantized index on
    Q(
      "ann_recall_int8",
      (s, dir) => {
        val e = table(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 20)
        Similarity.recallAtK(
          Similarity.cosineTopK(q, e, "vec_id", "embedding", Dim, k = 5),
          Similarity.quantizedTopK(q, e, "vec_id", "embedding", k = 5))
          .orderBy(col("q_id"))
      },
      Some(s"""WITH ex AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
             |        ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rank
             |    FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
             |    WHERE a.vec_id < 20) t WHERE rank <= 5),
             |z AS (
             |  SELECT vec_id,
             |    list_transform(embedding, x ->
             |      CASE WHEN mx = 0 THEN CAST(0 AS BIGINT)
             |           ELSE CAST(floor(CAST(x AS DOUBLE) * 127 / mx) AS BIGINT) END) AS qv
             |  FROM (SELECT vec_id, embedding,
             |          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
             |        FROM embeddings)),
             |qz AS (
             |  SELECT q_id, n_id FROM (
             |    SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
             |        ORDER BY ${idotSql("a.qv", "b.qv")} DESC, b.vec_id) AS rank
             |    FROM z a JOIN z b ON a.vec_id != b.vec_id
             |    WHERE a.vec_id < 20) t WHERE rank <= 5)
             |SELECT ex.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
             |  CAST(SUM(CASE WHEN qz.n_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits
             |FROM ex LEFT JOIN qz USING (q_id, n_id)
             |GROUP BY ex.q_id ORDER BY q_id""".stripMargin)),

    // perceptual image near-dup: REAL PPM decode → integer-grayscale
    // dHash (one gradient-sign bit per adjacent pixel pair) → exact
    // fingerprint grouping; the oracle recomputes the 56-bit hash from
    // the raw bytes, so the whole decode+hash pipeline is bit-gated
    Q(
      "multimodal_phash_dups",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.MediaPipeline
        import MediaPipeline.{ImageDecoder, MediaRow}
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >= 192)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 192).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          MediaRow(id, "image", MediaPipeline.encodePpm(8, 8, px), "ppm", 8, 8, 0L)
        }
        MediaPipeline.dHash(
          MediaPipeline.sampleFrames(media, new ImageDecoder, 1)(s))(s)
          .toDF("doc_id", "fp")
          .groupBy(col("fp"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
          .filter(col("n_docs") >= 2)
          .select(col("fp").as("phash"), col("n_docs"), col("min_doc"))
          .orderBy(col("phash"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id, substr(hex(encode(text)), 1, 384) AS hx
             |  FROM documents WHERE octet_length(encode(text)) >= 192),
             |g AS (SELECT doc_id, list_transform(range(0, 64), p ->
             |  ((('0x' || substr(hx, 6*p + 1, 2))::BIGINT
             |    + ('0x' || substr(hx, 6*p + 3, 2))::BIGINT
             |    + ('0x' || substr(hx, 6*p + 5, 2))::BIGINT) // 3)) AS gray FROM h),
             |f AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 56), b ->
             |  CASE WHEN gray[(b // 7) * 8 + (b % 7) + 1] > gray[(b // 7) * 8 + (b % 7) + 2]
             |       THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS fp FROM g)
             |SELECT fp AS phash, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  MIN(doc_id) AS min_doc
             |FROM f GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY phash""".stripMargin)),

    // image near-dup beyond exact collisions: the 56-bit dHash through
    // the pigeonhole block index at hamming <= 3 (exact recall by the
    // pigeonhole argument; the oracle runs the all-pairs truth)
    Q(
      "multimodal_phash_pairs",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.MediaPipeline
        import MediaPipeline.{ImageDecoder, MediaRow}
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >= 192)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 192).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          MediaRow(id, "image", MediaPipeline.encodePpm(8, 8, px), "ppm", 8, 8, 0L)
        }
        val fps = MediaPipeline.dHash(
            MediaPipeline.sampleFrames(media, new ImageDecoder, 1)(s))(s)
          .toDF("doc_id", "fp")
        Dedup.fingerprintPairs(fps, "doc_id", "fp", bits = 56, maxHamming = 3)
          .orderBy(col("d1"), col("d2"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id, substr(hex(encode(text)), 1, 384) AS hx
             |  FROM documents WHERE octet_length(encode(text)) >= 192),
             |g AS (SELECT doc_id, list_transform(range(0, 64), p ->
             |  ((('0x' || substr(hx, 6*p + 1, 2))::BIGINT
             |    + ('0x' || substr(hx, 6*p + 3, 2))::BIGINT
             |    + ('0x' || substr(hx, 6*p + 5, 2))::BIGINT) // 3)) AS gray FROM h),
             |f AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 56), b ->
             |  CASE WHEN gray[(b // 7) * 8 + (b % 7) + 1] > gray[(b // 7) * 8 + (b % 7) + 2]
             |       THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS fp FROM g)
             |SELECT a.doc_id AS d1, b.doc_id AS d2,
             |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
             |FROM f a JOIN f b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.fp, b.fp)) <= 3
             |ORDER BY d1, d2""".stripMargin)),

    // decode → featurize → ANN across the media and similarity surfaces:
    // PPM images decoded by the real byte-level decoder, pooled into a
    // 12-dim integer feature (2×2 grid of 4×4 blocks × RGB — sums ≤ 4080,
    // exact in double), then brute-force cosine top-3 through the
    // k-capped heap aggregate. The oracle recomputes the features
    // straight off the hex bytes and the same left-assoc cosine.
    Q(
      "multimodal_ann",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.MediaPipeline
        import MediaPipeline.{ImageDecoder, MediaRow}
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >= 192)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 192).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          MediaRow(id, "image", MediaPipeline.encodePpm(8, 8, px), "ppm", 8, 8, 0L)
        }
        val feats = MediaPipeline.sampleFrames(media, new ImageDecoder, 1)(s)
          .map { f =>
            val v = new Array[Double](12)
            var r = 0
            while (r < 8) {
              var c = 0
              while (c < 8) {
                var ch = 0
                while (ch < 3) {
                  v(((r / 4) * 2 + (c / 4)) * 3 + ch) +=
                    (f.pixels((r * 8 + c) * 3 + ch) & 0xff)
                  ch += 1
                }
                c += 1
              }
              r += 1
            }
            (f.id, v.toSeq)
          }
          .toDF("vec_id", "embedding")
        Similarity.cosineTopK(feats.filter(col("vec_id") < 30), feats,
          "vec_id", "embedding", dim = 12, k = 3)
          .orderBy(col("q_id"), col("rank"))
      },
      Some {
        def featSql(d: Int): String = {
          val b = d / 3; val ch = d % 3; val qr = b / 2; val qc = b % 2
          val terms = for {
            r <- qr * 4 until qr * 4 + 4; c <- qc * 4 until qc * 4 + 4
          } yield {
            val off = (r * 8 + c) * 3 + ch
            s"('0x' || substr(hx, ${2 * off + 1}, 2))::BIGINT"
          }
          s"CAST(${terms.mkString("(", " + ", ")")} AS DOUBLE)"
        }
        def dot12(a: String, b: String) =
          (1 to 12).map(i => s"$a[$i]::DOUBLE * $b[$i]::DOUBLE").mkString(" + ")
        def cos12(a: String, b: String) =
          s"((${dot12(a, b)}) / (sqrt(${dot12(a, a)}) * sqrt(${dot12(b, b)})))"
        s"""WITH h AS (
           |  SELECT doc_id, substr(hex(encode(text)), 1, 384) AS hx
           |  FROM documents WHERE octet_length(encode(text)) >= 192),
           |fv AS (SELECT doc_id,
           |  [${(0 until 12).map(featSql).mkString(",\n   ")}] AS v
           |  FROM h)
           |SELECT q_id, n_id, rank, cos FROM (
           |  SELECT q.doc_id AS q_id, n.doc_id AS n_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY q.doc_id
           |      ORDER BY ${cos12("q.v", "n.v")} DESC, n.doc_id) AS INT) AS rank,
           |    ${cos12("q.v", "n.v")} AS cos
           |  FROM fv q JOIN fv n ON q.doc_id < 30 AND q.doc_id != n.doc_id) t
           |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
      }),

    // REAL audio decode: each doc's first 2n bytes (n varies per doc)
    // become little-endian int16 PCM mono at 8 kHz, encodeWav wraps them
    // in a RIFF/WAVE container, decodeWav parses the chunk walk back out,
    // and the integer-exact clip features must equal what DuckDB
    // recomputes straight off the hex — an encode→decode→featurize
    // roundtrip through the audio half of the media seam (PCM WAV is the
    // codec-free audio format; mp3/aac stay behind the stub)
    Q(
      "multimodal_audio",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.MediaPipeline
        import MediaPipeline.MediaRow
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >=
            lit(128) + (col("doc_id") % 33) * 2)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 192).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          val n = (64 + id % 33).toInt
          val samples = Array.tabulate(n) { i =>
            val v = (px(2 * i) & 0xff) | ((px(2 * i + 1) & 0xff) << 8)
            if (v >= 32768) v - 65536 else v
          }
          MediaRow(id, "audio", MediaPipeline.encodeWav(8000, 1, samples),
            "wav", 0, 0, 0L)
        }
        implicit val sp = s
        MediaPipeline.audioFeatures(media)
          .toDF()
          .select(col("id").as("doc_id"), col("nSamples").as("n_samples"),
            col("durationMs").as("duration_ms"), col("peakAbs").as("peak_abs"),
            col("sumSamples").as("sum_samples"))
          .orderBy(col("doc_id"))
      },
      // int16 LE from hex byte pairs: lo = chars 4i+1..4i+2, hi = next
      // pair; >= 32768 wraps negative — byte-exact vs the Spark synth
      Some("""WITH h AS (
             |  SELECT doc_id, CAST(64 + doc_id % 33 AS BIGINT) AS n,
             |    substr(hex(encode(text)), 1, CAST(4 * (64 + doc_id % 33) AS INT)) AS hx
             |  FROM documents
             |  WHERE octet_length(encode(text)) >= 128 + (doc_id % 33) * 2),
             |sm AS (
             |  SELECT doc_id, n, list_transform(range(0, n),
             |    i -> CASE WHEN ('0x' || substr(hx, 4*i + 3, 2))::BIGINT * 256
             |                   + ('0x' || substr(hx, 4*i + 1, 2))::BIGINT >= 32768
             |      THEN ('0x' || substr(hx, 4*i + 3, 2))::BIGINT * 256
             |           + ('0x' || substr(hx, 4*i + 1, 2))::BIGINT - 65536
             |      ELSE ('0x' || substr(hx, 4*i + 3, 2))::BIGINT * 256
             |           + ('0x' || substr(hx, 4*i + 1, 2))::BIGINT END) AS smp
             |  FROM h)
             |SELECT doc_id,
             |  CAST(n AS INT) AS n_samples,
             |  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
             |  CAST(list_max(list_transform(smp, x -> abs(x))) AS INT) AS peak_abs,
             |  CAST(list_sum(smp) AS BIGINT) AS sum_samples
             |FROM sm ORDER BY doc_id""".stripMargin)),

    // audio near-dup via the energy-gradient fingerprint: REAL WAV
    // decode → 16 integer-bounded energy windows → 15 gradient-sign
    // bits; the oracle recomputes the fingerprint from the hex bytes,
    // bit-gating the whole decode+fingerprint path
    Q(
      "multimodal_audio_dups",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.MediaPipeline
        import MediaPipeline.MediaRow
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >=
            lit(128) + (col("doc_id") % 33) * 2)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 192).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          val n = (64 + id % 33).toInt
          val samples = Array.tabulate(n) { i =>
            val v = (px(2 * i) & 0xff) | ((px(2 * i + 1) & 0xff) << 8)
            if (v >= 32768) v - 65536 else v
          }
          MediaRow(id, "audio", MediaPipeline.encodeWav(8000, 1, samples),
            "wav", 0, 0, 0L)
        }
        implicit val sp = s
        MediaPipeline.audioFingerprint(media, bands = 16)
          .toDF("doc_id", "afp")
          .groupBy(col("afp"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
          .filter(col("n_docs") >= 2)
          .orderBy(col("afp"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id, CAST(64 + doc_id % 33 AS BIGINT) AS n,
             |    substr(hex(encode(text)), 1, CAST(4 * (64 + doc_id % 33) AS INT)) AS hx
             |  FROM documents
             |  WHERE octet_length(encode(text)) >= 128 + (doc_id % 33) * 2),
             |sm AS (
             |  SELECT doc_id, n, list_transform(range(0, n),
             |    i -> CASE WHEN ('0x' || substr(hx, 4*i + 3, 2))::BIGINT * 256
             |                   + ('0x' || substr(hx, 4*i + 1, 2))::BIGINT >= 32768
             |      THEN ('0x' || substr(hx, 4*i + 3, 2))::BIGINT * 256
             |           + ('0x' || substr(hx, 4*i + 1, 2))::BIGINT - 65536
             |      ELSE ('0x' || substr(hx, 4*i + 3, 2))::BIGINT * 256
             |           + ('0x' || substr(hx, 4*i + 1, 2))::BIGINT END) AS smp
             |  FROM h),
             |en AS (
             |  SELECT doc_id, list_transform(range(0, 16), w ->
             |    COALESCE(list_sum(list_transform(
             |      range(w * n // 16, (w + 1) * n // 16),
             |      i -> abs(smp[i + 1]))), 0)) AS e
             |  FROM sm),
             |f AS (
             |  SELECT doc_id, CAST(list_sum(list_transform(range(0, 15), w ->
             |    CASE WHEN e[w + 1] > e[w + 2] THEN (1::BIGINT << w)
             |         ELSE 0 END)) AS BIGINT) AS afp
             |  FROM en)
             |SELECT afp, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  MIN(doc_id) AS min_doc
             |FROM f GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY afp""".stripMargin)),

    // REAL video decode + strided frame sampling: each doc's first bytes
    // become 2-5 raw RGB24 4x4 frames in a GVID container (the codec-free
    // video format, like PPM/WAV for the other modalities), VideoDecoder
    // walks the header + rasters back out, sampleFrames keeps every 2nd
    // frame, and the per-doc sampled-frame count + pixel sum must equal
    // what DuckDB recomputes straight off the hex — the moving-picture
    // half of the media seam, byte-exact (codec formats stay stubbed)
    Q(
      "multimodal_video",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.MediaPipeline
        import MediaPipeline.{MediaRow, VideoDecoder}
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >= 240)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 240).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          val n = (2 + id % 4).toInt
          val frames = (0 until n).map(i => px.slice(i * 48, (i + 1) * 48))
          MediaRow(id, "video", MediaPipeline.encodeGvid(4, 4, frames),
            "gvid", 4, 4, n * 1000L)
        }
        implicit val sp = s
        MediaPipeline.sampleFrames(media, new VideoDecoder, everyNth = 2)
          .map(f => (f.id, f.pixels.foldLeft(0L)((a, b) => a + (b & 0xff))))
          .toDF("doc_id", "f_sum")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).cast("int").as("n_frames"),
            sum(col("f_sum")).as("px_sum"))
          .orderBy(col("doc_id"))
      },
      // sampled frames are indices 0,2,4 of n = 2 + doc_id % 4; frame i
      // holds text BYTES [48i, 48i+48) — sum their hex pairs
      Some("""WITH h AS (
             |  SELECT doc_id, CAST(2 + doc_id % 4 AS BIGINT) AS n,
             |    substr(hex(encode(text)), 1, 480) AS hx
             |  FROM documents WHERE octet_length(encode(text)) >= 240)
             |SELECT doc_id,
             |  CAST((n + 1) // 2 AS INT) AS n_frames,
             |  CAST(list_sum(list_transform(
             |    list_filter(range(0, CAST(n * 48 AS INT)), j -> (j // 48) % 2 = 0),
             |    j -> ('0x' || substr(hx, 2*j + 1, 2))::BIGINT)) AS BIGINT) AS px_sum
             |FROM h ORDER BY doc_id""".stripMargin)),

    // video near-dup: REAL GVID decode → 24-bit per-frame gradient
    // fingerprints → videos sharing >= 2 distinct frame hashes pair up
    // through the fingerprint inverted index; completes perceptual
    // dedup across all three modalities, bit-gated from raw bytes
    Q(
      "multimodal_video_dups",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.MediaPipeline
        import MediaPipeline.{MediaRow, VideoDecoder}
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >= 240)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 240).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          val n = (2 + id % 4).toInt
          val frames = (0 until n).map(i => px.slice(i * 48, (i + 1) * 48))
          MediaRow(id, "video", MediaPipeline.encodeGvid(4, 4, frames),
            "gvid", 4, 4, n * 1000L)
        }
        implicit val sp = s
        val fps = MediaPipeline.frameFingerprints(
            MediaPipeline.sampleFrames(media, new VideoDecoder, 1)(s))(s)
          .toDF("doc_id", "fi", "fp")
          .select(col("doc_id"), col("fp")).distinct()
          .localCheckpoint(true)
        fps.as("a").join(fps.as("b"),
            col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
          .orderBy(col("d1"), col("d2"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id, CAST(2 + doc_id % 4 AS BIGINT) AS n,
             |    substr(hex(encode(text)), 1, 480) AS hx
             |  FROM documents WHERE octet_length(encode(text)) >= 240),
             |fr AS (SELECT doc_id, unnest(range(0, n)) AS fi, hx FROM h),
             |g AS (SELECT doc_id, fi, list_transform(range(0, 16), p ->
             |   ((('0x' || substr(hx, 96*fi + 6*p + 1, 2))::BIGINT
             |   + ('0x' || substr(hx, 96*fi + 6*p + 3, 2))::BIGINT
             |   + ('0x' || substr(hx, 96*fi + 6*p + 5, 2))::BIGINT) // 3)) AS gray
             |  FROM fr),
             |f AS (SELECT doc_id, fi,
             |  CAST(list_sum(list_transform(range(0, 12), b ->
             |    CASE WHEN gray[(b // 3) * 4 + (b % 3) + 1] > gray[(b // 3) * 4 + (b % 3) + 2]
             |         THEN (1::BIGINT << b) ELSE 0 END)) +
             |  list_sum(list_transform(range(0, 12), b ->
             |    CASE WHEN gray[(b % 3) * 4 + (b // 3) + 1] > gray[(b % 3 + 1) * 4 + (b // 3) + 1]
             |         THEN (1::BIGINT << (12 + b)) ELSE 0 END)) AS BIGINT) AS fp
             |  FROM g),
             |df AS (SELECT DISTINCT doc_id, fp FROM f),
             |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
             |        CAST(COUNT(*) AS BIGINT) AS n_shared
             |      FROM df a JOIN df b ON a.fp = b.fp AND a.doc_id < b.doc_id
             |      GROUP BY 1, 2)
             |SELECT d1, d2, n_shared FROM p WHERE n_shared >= 2
             |ORDER BY d1, d2""".stripMargin)),

    // scene-cut detection: REAL GVID decode → per-frame 24-bit gradient
    // fingerprints → a cut wherever consecutive frames' hamming
    // distance >= 8 of 24 bits (shot-boundary segmentation, the
    // pre-chunking step before per-scene sampling); per-doc lag window
    // over the handful of frames each video holds, exact off raw bytes
    Q(
      "multimodal_scene_cuts",
      (s, dir) => {
        import s.implicits._
        import graft.multimodal.MediaPipeline
        import MediaPipeline.{MediaRow, VideoDecoder}
        val docs = table(s, dir, "documents")
          .filter(length(col("text").cast("binary")) >= 240)
          .select(col("doc_id"),
            substring(col("text").cast("binary"), 1, 240).as("px"))
        val media = docs.as[(Long, Array[Byte])].map { case (id, px) =>
          val n = (2 + id % 4).toInt
          val frames = (0 until n).map(i => px.slice(i * 48, (i + 1) * 48))
          MediaRow(id, "video", MediaPipeline.encodeGvid(4, 4, frames),
            "gvid", 4, 4, n * 1000L)
        }
        implicit val sp = s
        val fps = MediaPipeline.frameFingerprints(
            MediaPipeline.sampleFrames(media, new VideoDecoder, 1)(s))(s)
          .toDF("doc_id", "fi", "fp")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("fi"))
        fps.withColumn("__prev", lag(col("fp"), 1).over(w))
          .filter(col("__prev").isNotNull)
          .withColumn("hamming",
            expr("CAST(bit_count(fp ^ __prev) AS BIGINT)"))
          .filter(col("hamming") >= 8L)
          .select(col("doc_id"), col("fi").as("cut_frame"), col("hamming"))
          .orderBy(col("doc_id"), col("cut_frame"))
      },
      Some("""WITH h AS (
             |  SELECT doc_id, CAST(2 + doc_id % 4 AS BIGINT) AS n,
             |    substr(hex(encode(text)), 1, 480) AS hx
             |  FROM documents WHERE octet_length(encode(text)) >= 240),
             |fr AS (SELECT doc_id, unnest(range(0, n)) AS fi, hx FROM h),
             |g AS (SELECT doc_id, fi, list_transform(range(0, 16), p ->
             |   ((('0x' || substr(hx, 96*fi + 6*p + 1, 2))::BIGINT
             |   + ('0x' || substr(hx, 96*fi + 6*p + 3, 2))::BIGINT
             |   + ('0x' || substr(hx, 96*fi + 6*p + 5, 2))::BIGINT) // 3)) AS gray
             |  FROM fr),
             |f AS (SELECT doc_id, fi,
             |  CAST(list_sum(list_transform(range(0, 12), b ->
             |    CASE WHEN gray[(b // 3) * 4 + (b % 3) + 1] > gray[(b // 3) * 4 + (b % 3) + 2]
             |         THEN (1::BIGINT << b) ELSE 0 END)) +
             |  list_sum(list_transform(range(0, 12), b ->
             |    CASE WHEN gray[(b % 3) * 4 + (b // 3) + 1] > gray[(b % 3 + 1) * 4 + (b // 3) + 1]
             |         THEN (1::BIGINT << (12 + b)) ELSE 0 END)) AS BIGINT) AS fp
             |  FROM g),
             |c AS (SELECT doc_id, fi, fp,
             |  lag(fp) OVER (PARTITION BY doc_id ORDER BY fi) AS prev FROM f)
             |SELECT doc_id, CAST(fi AS INT) AS cut_frame,
             |  CAST(bit_count(xor(fp, prev)) AS BIGINT) AS hamming
             |FROM c WHERE prev IS NOT NULL
             |  AND bit_count(xor(fp, prev)) >= 8
             |ORDER BY doc_id, cut_frame""".stripMargin)),

    // priority-aware dedup: among identical texts keep the preferred
    // source's copy (tie-break doc_id) — the "trusted source wins" rule
    Q(
      "dedup_priority_keep",
      (s, dir) =>
        Dedup.dropDuplicatesByPriority(table(s, dir, "documents"), "text",
          Seq(when(col("source") === "src0", 0).otherwise(1), col("doc_id")))
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, source FROM (
             |  SELECT doc_id, source,
             |    ROW_NUMBER() OVER (PARTITION BY md5(text)
             |      ORDER BY CASE WHEN source = 'src0' THEN 0 ELSE 1 END, doc_id) AS rn
             |  FROM documents) t
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin)),

    // PII scrub: detect + redact emails/phones. The synthetic corpus has
    // no PII, so every 5th doc gets a deterministic email+phone suffix
    // appended on BOTH sides before the scrub — the redaction itself is
    // what's under test (counts + hash of the cleaned text).
    Q(
      "corpus_pii_scrub",
      (s, dir) => {
        val aug = table(s, dir, "documents").withColumn("text",
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"), lit("@example.com or 555 "),
              lpad(col("doc_id").cast("string"), 4, "0")))
            .otherwise(col("text")))
        Corpus.scrubPii(aug, "text")
          .select(col("doc_id"), col("n_emails"), col("n_phones"),
            md5(col("clean_text").cast("binary")).as("clean_hash"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH aug AS (
              |  SELECT doc_id,
              |    CASE WHEN doc_id % 5 = 0
              |      THEN text || ' contact user' || CAST(doc_id AS VARCHAR) ||
              |           '@example.com or 555 ' || lpad(CAST(doc_id AS VARCHAR), 4, '0')
              |      ELSE text END AS t
              |  FROM documents)
              |SELECT doc_id,
              |  CAST(len(regexp_extract_all(t, '${Corpus.EmailPattern}')) AS BIGINT) AS n_emails,
              |  CAST(len(regexp_extract_all(t, '${Corpus.PhonePattern}')) AS BIGINT) AS n_phones,
              |  md5(regexp_replace(regexp_replace(t, '${Corpus.EmailPattern}', '<EMAIL>', 'g'),
              |    '${Corpus.PhonePattern}', '<PHONE>', 'g')) AS clean_hash
              |FROM aug ORDER BY doc_id""".stripMargin)),

    // per-doc repetition stats — computed shuffle-free inside the row
    // (sorted-array linear fold); the oracle recomputes the mode count
    // with a plain unnest+groupby
    Q(
      "corpus_repetition",
      (s, dir) =>
        Corpus.repetitionStats(table(s, dir, "documents"), "text")
          .select(col("doc_id"), col("n_words"), col("n_distinct"),
            col("top_word_count"), col("dup_ratio"))
          .orderBy(col("doc_id")),
      Some("""WITH toks AS (
             |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ws
             |  FROM documents),
             |cnt AS (
             |  SELECT doc_id, w, COUNT(*) AS c
             |  FROM (SELECT doc_id, unnest(ws) AS w FROM toks) GROUP BY doc_id, w),
             |md AS (SELECT doc_id, MAX(c) AS top_word_count FROM cnt GROUP BY doc_id),
             |base AS (
             |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
             |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
             |  FROM toks)
             |SELECT b.doc_id, b.n_words, b.n_distinct,
             |  CAST(COALESCE(m.top_word_count, 0) AS BIGINT) AS top_word_count,
             |  CASE WHEN b.n_words = 0 THEN CAST(0 AS DOUBLE)
             |       ELSE CAST(b.n_words - b.n_distinct AS DOUBLE) / CAST(b.n_words AS DOUBLE)
             |  END AS dup_ratio
             |FROM base b LEFT JOIN md m USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // deterministic train/val/test split by md5 threshold — stable under
    // corpus growth, identical on every engine; checked via per-split
    // aggregate fingerprints
    Q(
      "corpus_split_hash",
      (s, dir) =>
        Corpus.splitByHash(table(s, dir, "documents"), "doc_id",
          Seq("val" -> "0d", "test" -> "1a"), "train")
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("split")),
      Some("""SELECT
             |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '0d' THEN 'val'
             |       WHEN md5(CAST(doc_id AS VARCHAR)) < '1a' THEN 'test'
             |       ELSE 'train' END AS split,
             |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Simpson token diversity per source: the log-free entropy cousin
    // (1 - sum of squared token shares, exact ppm) — near 1e6 for
    // spread vocabulary, collapsing for template/boilerplate sources
    Q(
      "corpus_simpson_diversity",
      (s, dir) =>
        Corpus.simpsonDiversity(table(s, dir, "documents"), "source", "text")
          .orderBy(col("source")),
      Some("""WITH t AS (
             |  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
             |  FROM documents),
             |c AS (
             |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM t GROUP BY 1, 2)
             |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
             |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
             |  1000000 - CAST(SUM(c*c) AS BIGINT) * 1000000
             |    // (CAST(SUM(c) AS BIGINT) * CAST(SUM(c) AS BIGINT)) AS diversity_ppm
             |FROM c GROUP BY source ORDER BY source""".stripMargin)),

    // split-drift monitor: per-source scaled L1 distance between the
    // train and val halves' hashed-token distributions — one
    // conditional-count aggregate over (source, bucket), bounded
    // folding after; near-0 means the held-out set matches
    Q(
      "corpus_split_drift",
      (s, dir) =>
        Corpus.splitDrift(table(s, dir, "documents"), "source", "doc_id",
          "text", valBound = "40", buckets = 64)
          .orderBy(col("source")),
      Some("""WITH d AS (
             |  SELECT source,
             |    md5(CAST(doc_id AS VARCHAR)) < '40' AS isval,
             |    list_filter(string_split(text, ' '), x -> x != '') AS ws
             |  FROM documents),
             |t AS (
             |  SELECT source, isval,
             |    ('0x' || substr(md5(tok), 1, 6))::BIGINT % 64 AS b
             |  FROM (SELECT source, isval, unnest(ws) AS tok FROM d)),
             |c AS (
             |  SELECT source, b,
             |    CAST(COUNT(CASE WHEN NOT isval THEN 1 END) AS BIGINT) AS a,
             |    CAST(COUNT(CASE WHEN isval THEN 1 END) AS BIGINT) AS bb
             |  FROM t GROUP BY 1, 2),
             |tot AS (
             |  SELECT source, CAST(SUM(a) AS BIGINT) AS na,
             |    CAST(SUM(bb) AS BIGINT) AS nb
             |  FROM c GROUP BY 1)
             |SELECT c.source, t2.na AS n_train, t2.nb AS n_val,
             |  CASE WHEN t2.na * t2.nb = 0 THEN NULL
             |    ELSE CAST(SUM(abs(a * t2.nb - bb * t2.na)) * 1000000
             |      // (t2.na * t2.nb) AS BIGINT) END AS drift_ppm
             |FROM c JOIN tot t2 USING (source)
             |GROUP BY c.source, t2.na, t2.nb ORDER BY source""".stripMargin)),

    // global vocabulary top-k: canonical word count (partial aggs → one
    // shuffle) + TakeOrderedAndProject bounded top-k, never a full sort
    Q(
      "corpus_vocabulary",
      (s, dir) =>
        Corpus.vocabularyTopK(table(s, dir, "documents"), "text", 20)
          .orderBy(col("n").desc, col("word")),
      Some("""SELECT word, COUNT(*) AS n
             |FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS word
             |      FROM documents)
             |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin)),

    // vocabulary encoding: docs as bounded-vocab id sequences (top-20
    // vocab ranked count-desc/word, OOV → 0 and counted) — the
    // tokenize-for-training step; ids checksummed in token order
    Q(
      "corpus_vocab_encode",
      (s, dir) =>
        Corpus.encodeWithVocab(table(s, dir, "documents"), "doc_id", "text",
          k = 20)
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            md5(array_join(transform(col("ids"), _.cast("string")), ",")
              .cast("binary")).as("ids_md5"))
          .orderBy(col("doc_id")),
      Some(s"""WITH $toksCte,
             |vc AS (SELECT word, ROW_NUMBER() OVER (ORDER BY n DESC, word) AS vid
             |  FROM (SELECT word, COUNT(*) AS n
             |        FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x != '')) AS word
             |              FROM documents)
             |        GROUP BY word ORDER BY n DESC, word LIMIT 20)),
             |tp AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos, ws FROM toks),
             |tok AS (SELECT doc_id, pos, ws[pos] AS word FROM tp),
             |enc AS (
             |  SELECT t.doc_id, COUNT(*) AS nt,
             |    COUNT(CASE WHEN v.vid IS NULL THEN 1 END) AS noov,
             |    list(COALESCE(v.vid, 0) ORDER BY t.pos) AS ids
             |  FROM tok t LEFT JOIN vc v USING (word) GROUP BY t.doc_id)
             |SELECT d.doc_id,
             |  CAST(COALESCE(e.nt, 0) AS BIGINT) AS n_tokens,
             |  CAST(COALESCE(e.noov, 0) AS BIGINT) AS n_oov,
             |  md5(COALESCE(array_to_string(e.ids, ','), '')) AS ids_md5
             |FROM documents d LEFT JOIN enc e USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // distributed BPE training: BpeMerges merges learned by BATCHED
    // rounds of corpus-wide pair-count → top-m unit-disjoint accept →
    // literal merges (Sennrich et al. 2016, frequency-batched). The
    // oracle is GENERATED as one chained CTE group per round from the
    // same round count, so both engines run the identical training
    // loop — counts, lexicographic tie-breaks, the disjointness rule,
    // budget truncation, and leftmost-nonoverlapping replace are all
    // engine-reproducible (see Corpus.bpeCore scaladoc). Ranks are
    // global: round offset tot$(k-1) + within-round accepted rank.
    Q(
      "corpus_bpe_merges",
      (s, dir) => {
        import s.implicits._
        bpeFixture(s, dir)._1.zipWithIndex
          .map { case ((u1, u2, c), i) => (i + 1, u1, u2, c) }
          .toDF("rank", "u1", "u2", "cnt")
          .orderBy(col("rank"))
      },
      Some(bpeRoundsSql(BpeMaxRounds, BpeMerges, BpeWindow) +
        s"""
           |SELECT CAST(x.rank AS INT) AS rank, x.u1, x.u2,
           |  CAST(x.c AS BIGINT) AS cnt
           |FROM (SELECT unnest(allacc) AS x FROM m$BpeMaxRounds)
           |ORDER BY rank""".stripMargin)),

    // the distributed venue, oracle-gated on its own: driverVocabMax=0
    // forces the per-round Spark loop (pair count → bounded candidate
    // collect → AFFECTED-SLICE rewrite → checkpoint cadence) at a
    // budget sized for one-roundtrip-per-round cost; proves the two
    // training venues and the oracle agree on the same algorithm
    Q(
      "corpus_bpe_merges_dist",
      (s, dir) =>
        Corpus.bpeMerges(table(s, dir, "documents"), "doc_id", "text",
          merges = BpeDistMerges, window = BpeWindow,
          maxRounds = BpeDistMaxRounds,
          driverVocabMax = 0).orderBy(col("rank")),
      Some(bpeRoundsSql(BpeDistMaxRounds, BpeDistMerges, BpeWindow) +
        s"""
           |SELECT CAST(x.rank AS INT) AS rank, x.u1, x.u2,
           |  CAST(x.c AS BIGINT) AS cnt
           |FROM (SELECT unnest(allacc) AS x FROM m$BpeDistMaxRounds)
           |ORDER BY rank""".stripMargin)),

    // the compression curve of the learned merges: per-doc unit count
    // after BpeMerges rounds (tokenless docs stay at 0 units) — one
    // corpus token scan joined against the trained per-word unit counts
    Q(
      "corpus_bpe_encode",
      (s, dir) =>
        Corpus.bpeEncodeFromHist(table(s, dir, "documents"), "doc_id",
          "text", bpeFixture(s, dir)._2, window = BpeWindow)
          .orderBy(col("doc_id")),
      Some(bpeRoundsSql(BpeMaxRounds, BpeMerges, BpeWindow) +
        s"""
           |, enc AS (SELECT w,
           |    CAST(len(string_split(trim(s, '·'), '··')) AS BIGINT) AS u
           |  FROM s$BpeMaxRounds),
           |docw AS (${bpePretokSql(BpeWindow, withId = true)}),
           |du AS (SELECT dw.doc_id, e.u FROM docw dw JOIN enc e USING (w))
           |SELECT d.doc_id, CAST(COALESCE(SUM(du.u), 0) AS BIGINT) AS n_units
           |FROM documents d LEFT JOIN du ON d.doc_id = du.doc_id
           |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)),

    // the learned subword vocabulary: unit frequencies after training,
    // folded over the |vocab|-row histogram (top-50, ties broken on unit)
    Q(
      "corpus_bpe_vocab",
      (s, dir) =>
        Corpus.bpeVocabFromHist(bpeFixture(s, dir)._2, k = 50),
      Some(bpeRoundsSql(BpeMaxRounds, BpeMerges, BpeWindow) +
        s"""
           |SELECT unit, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
           |  SELECT unnest(string_split(trim(s, '·'), '··')) AS unit, cnt
           |  FROM s$BpeMaxRounds)
           |GROUP BY unit ORDER BY cnt DESC, unit LIMIT 50""".stripMargin)),

    // tokenize-for-training completed: per-doc BPE-unit ID SEQUENCES
    // under the trained merges (unit ids 1..200 by frequency, OOV -> 0
    // and counted), checksummed in token-then-unit order — the loader
    // tensor, not just the compression curve
    Q(
      "corpus_bpe_ids",
      (s, dir) =>
        Corpus.bpeEncodeIdsFromHist(table(s, dir, "documents"), "doc_id",
          "text", bpeFixture(s, dir)._2, k = 200, window = BpeWindow)
          .orderBy(col("doc_id")),
      Some(bpeRoundsSql(BpeMaxRounds, BpeMerges, BpeWindow) +
        s"""
           |, wu AS (SELECT w, string_split(trim(s, '·'), '··') AS us FROM s$BpeMaxRounds),
           |uv0 AS (SELECT unit, CAST(SUM(cnt) AS BIGINT) AS c FROM (
           |    SELECT unnest(string_split(trim(s, '·'), '··')) AS unit, cnt
           |    FROM s$BpeMaxRounds)
           |  GROUP BY unit ORDER BY c DESC, unit LIMIT 200),
           |uv AS (SELECT unit, ROW_NUMBER() OVER (ORDER BY c DESC, unit) AS uid
           |  FROM uv0),
           |tp AS (${bpePretokSql(BpeWindow, withId = true)}),
           |tu0 AS (SELECT doc_id, pos, unnest(range(1, len(us) + 1)) AS j, us
           |  FROM tp JOIN wu USING (w)),
           |tu AS (SELECT doc_id, pos, j, us[j] AS unit FROM tu0),
           |enc AS (
           |  SELECT t.doc_id, COUNT(*) AS n,
           |    COUNT(CASE WHEN v.uid IS NULL THEN 1 END) AS oov,
           |    list(COALESCE(v.uid, 0) ORDER BY t.pos, t.j) AS ids
           |  FROM tu t LEFT JOIN uv v USING (unit) GROUP BY t.doc_id)
           |SELECT d.doc_id,
           |  CAST(COALESCE(e.n, 0) AS BIGINT) AS n_units,
           |  CAST(COALESCE(e.oov, 0) AS BIGINT) AS n_oov,
           |  md5(COALESCE(array_to_string(e.ids, ','), '')) AS ids_md5
           |FROM documents d LEFT JOIN enc e USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin)),

    // TRAIN-ONCE / APPLY-MANY: merges learned on the HISTORY slice
    // (doc_id < 400) become a stored artifact replayed in rank order
    // over the FULL corpus with no retraining — the deployed-tokenizer
    // split (yesterday's tokenizer, today's batch). The oracle
    // re-derives the same merges from the history chain, then replays
    // each round's accepted batch over the full-corpus histogram; any
    // train/apply drift (order, slot, slice) breaks the per-doc counts.
    Q(
      "corpus_bpe_apply_stored",
      // the stored merge artifact is staged (train-once); the gate
      // times the APPLY-many replay over the full corpus
      (s, dir) =>
        Corpus.bpeEncodeWithMerges(table(s, dir, "documents"), "doc_id",
          "text", storedMergesFixture(s, dir), window = BpeWindow)
          .orderBy(col("doc_id")),
      Some(bpeRoundsSql(BpeStoredMaxRounds, BpeStoredMerges, BpeWindow,
          src = "(SELECT * FROM documents WHERE doc_id < 400)") +
        bpeApplySql(BpeStoredMaxRounds, BpeWindow) +
        s"""
           |, enc AS (SELECT w,
           |    CAST(len(string_split(trim(s, '·'), '··')) AS BIGINT) AS u
           |  FROM a$BpeStoredMaxRounds),
           |docw AS (${bpePretokSql(BpeWindow, withId = true)}),
           |du AS (SELECT dw.doc_id, e.u FROM docw dw JOIN enc e USING (w))
           |SELECT d.doc_id, CAST(COALESCE(SUM(du.u), 0) AS BIGINT) AS n_units
           |FROM documents d LEFT JOIN du ON d.doc_id = du.doc_id
           |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)),

    // distinctive terms per source (tf-idf keywords, integer inverse-df
    // weights, deterministic (score desc, term) rank)
    Q(
      "corpus_keywords",
      (s, dir) =>
        Corpus.distinctiveTerms(table(s, dir, "documents"), "source",
          "text", k = 3)
          .orderBy(col("source"), col("rank")),
      Some(s"""WITH tf AS (
             |  SELECT source, term, COUNT(*) AS tf FROM (
             |    SELECT source, lower(unnest(list_filter(
             |      string_split(text, ' '), x -> x != ''))) AS term
             |    FROM documents)
             |  GROUP BY 1, 2),
             |dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
             |scored AS (
             |  SELECT source, term,
             |    tf * (${Corpus.LexicalWeightScale} // df) AS score
             |  FROM tf JOIN dfx USING (term))
             |SELECT source, rank, term, CAST(score AS BIGINT) AS score FROM (
             |  SELECT source, term, score,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY score DESC,
             |        ('0x' || substr(md5(source || '|' || term), 1, 14))::BIGINT
             |      ) AS INT) AS rank
             |  FROM scored) t
             |WHERE rank <= 3 ORDER BY source, rank""".stripMargin)),

    // the dataset card: corpus release numbers in one result — doc/token/
    // lang/source totals from ONE aggregate over the corpus scan, the
    // exact-dup count as N − distinct(md5), the gopher keep count — all
    // integers, melted to (metric, value) rows with no join anywhere
    Q(
      "corpus_dataset_card",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val base = docs.agg(
          count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long"))
            .as("n_tokens"),
          count_distinct(col("lang")).as("n_langs"),
          count_distinct(col("source")).as("n_sources"),
          (count(lit(1)) - count_distinct(md5(col("text").cast("binary"))))
            .as("n_exact_dups"))
          .select(expr("stack(5, 'n_docs', n_docs, 'n_tokens', n_tokens, " +
            "'n_langs', n_langs, 'n_sources', n_sources, " +
            "'n_exact_dups', n_exact_dups) AS (metric, value)"))
        val keep = Corpus.gopherRules(docs, "doc_id", "text",
            minWords = 30, maxWords = 100000, stops = GopherQueryStops)
          .agg(count(when(col("keep"), 1)).as("value"))
          .select(lit("n_gopher_keep").as("metric"), col("value"))
        base.unionByName(keep)
          .select(col("metric"), col("value").cast("long").as("value"))
          .orderBy(col("metric"))
      },
      Some {
        val stops = GopherQueryStops.map(s0 => s"'$s0'")
          .mkString("[", ", ", "]")
        s"""WITH $toksCte,
           |gm AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
           |  CAST(COALESCE(list_sum(list_transform(ws, w -> len(w))), 0) AS BIGINT) AS sl,
           |  CAST(len(list_filter(ws, w -> contains(w, '#') OR contains(w, '...'))) AS BIGINT) AS sym,
           |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS al,
           |  CAST(len(list_filter($stops,
           |    s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS BIGINT) AS st
           |  FROM toks)
           |SELECT metric, CAST(value AS BIGINT) AS value FROM (
           |  SELECT 'n_docs' AS metric, COUNT(*) AS value FROM documents
           |  UNION ALL SELECT 'n_tokens', SUM(len(ws)) FROM toks
           |  UNION ALL SELECT 'n_langs', COUNT(DISTINCT lang) FROM documents
           |  UNION ALL SELECT 'n_sources', COUNT(DISTINCT source) FROM documents
           |  UNION ALL SELECT 'n_exact_dups',
           |    COUNT(*) - COUNT(DISTINCT md5(text)) FROM documents
           |  UNION ALL SELECT 'n_gopher_keep',
           |    COUNT(CASE WHEN n >= 30 AND n <= 100000 AND sl >= n * 3
           |      AND sl <= n * 10 AND sym * 10 <= n AND al * 5 >= n * 4
           |      AND st >= 2 THEN 1 END) FROM gm) t
           |ORDER BY metric""".stripMargin
      }),

    // dataset-version diff: two snapshots derived deterministically from
    // the corpus (ids = 0 mod 13 arrive only in v2, ids = 0 mod 11 were
    // deleted, ids = 0 mod 7 edited) diffed by content digest through
    // ONE full-outer join that ships 16-byte hashes, never bodies —
    // the release-to-release audit, rolled up per (source, status)
    Q(
      "corpus_snapshot_diff",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val v1 = docs.filter(col("doc_id") % 13 =!= 0)
        val v2 = docs.filter(col("doc_id") % 11 =!= 0)
          .withColumn("text", when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text")))
        Corpus.snapshotDiff(v1, v2, "doc_id", "text", Seq("source"))
          .groupBy(col("source"), col("status"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("source"), col("status"))
      },
      Some("""WITH v1 AS (
             |  SELECT doc_id, source, md5(text) AS h FROM documents
             |  WHERE doc_id % 13 <> 0),
             |v2 AS (
             |  SELECT doc_id, source,
             |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2'
             |             ELSE text END) AS h
             |  FROM documents WHERE doc_id % 11 <> 0)
             |SELECT COALESCE(v2.source, v1.source) AS source,
             |  CASE WHEN v1.h IS NULL THEN 'added'
             |       WHEN v2.h IS NULL THEN 'removed'
             |       WHEN v1.h = v2.h THEN 'unchanged'
             |       ELSE 'changed' END AS status,
             |  CAST(COUNT(*) AS BIGINT) AS n
             |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // greedy coverage-maximizing selection: 4 rounds of "the document
    // adding the most uncovered shingles" — the submodular diverse-
    // subset pick with its marginal-gain curve; oracle unrolls the
    // identical greedy rounds
    Q(
      "corpus_coverage_select",
      (s, dir) =>
        Corpus.coverageMaxSelectFromFeatures(coverageFixture(s, dir), k = 4)
          .orderBy(col("rank")),
      Some {
        val rounds = (2 to 4).map { t =>
          s"""g$t AS (
             |  SELECT doc, CAST(COUNT(*) AS BIGINT) AS g FROM f
             |  WHERE doc NOT IN (SELECT doc FROM pku${t - 1})
             |    AND tok NOT IN (SELECT tok FROM cov${t - 1})
             |  GROUP BY 1),
             |p$t AS MATERIALIZED (
             |  SELECT doc, g FROM g$t ORDER BY g DESC, doc LIMIT 1),
             |cov$t AS MATERIALIZED (
             |  SELECT tok FROM cov${t - 1}
             |  UNION SELECT f.tok FROM f JOIN p$t USING (doc)),
             |pku$t AS MATERIALIZED (
             |  SELECT doc FROM pku${t - 1} UNION SELECT doc FROM p$t)""".stripMargin
        }.mkString(",\n")
        s"""WITH $toksCte, $shingleCte,
           |f AS MATERIALIZED (
           |  SELECT DISTINCT doc_id AS doc,
           |    ('0x' || substr(md5(tok0), 1, 14))::BIGINT AS tok
           |  FROM (SELECT doc_id, unnest(shingles) AS tok0 FROM sh)),
           |g1 AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS g FROM f GROUP BY 1),
           |p1 AS MATERIALIZED (SELECT doc, g FROM g1 ORDER BY g DESC, doc LIMIT 1),
           |cov1 AS MATERIALIZED (SELECT DISTINCT f.tok FROM f JOIN p1 USING (doc)),
           |pku1 AS MATERIALIZED (SELECT doc FROM p1),
           |$rounds
           |SELECT rank, doc, g AS gain FROM (
           |  SELECT CAST(1 AS INT) AS rank, doc, g FROM p1
           |  UNION ALL SELECT CAST(2 AS INT), doc, g FROM p2
           |  UNION ALL SELECT CAST(3 AS INT), doc, g FROM p3
           |  UNION ALL SELECT CAST(4 AS INT), doc, g FROM p4) u
           |ORDER BY rank""".stripMargin
      }),

    // stochastic-greedy coverage selection: each round scores only the
    // 128 remaining docs with the smallest (doc, round)-keyed hash —
    // the lazier-than-lazy-greedy scale path next to the exact pick;
    // oracle unrolls the identical sampled rounds
    Q(
      "corpus_coverage_stochastic",
      (s, dir) =>
        Corpus.coverageStochasticSelectFromFeatures(coverageFixture(s, dir),
          k = 4, sampleSize = 128)
          .orderBy(col("rank")),
      Some {
        def candSql(t: Int, extra: String) =
          s"""cand$t AS MATERIALIZED (
             |  SELECT doc FROM alldocs$extra
             |  ORDER BY ('0x' || substr(md5(doc::VARCHAR || ':$t'), 1, 14))::BIGINT, doc
             |  LIMIT 128)""".stripMargin
        val rounds = (2 to 4).map { t =>
          val notPicked =
            s"""
               |  WHERE doc NOT IN (SELECT doc FROM pku${t - 1})""".stripMargin
          s"""${candSql(t, notPicked)},
             |g$t AS (
             |  SELECT doc, CAST(COUNT(*) AS BIGINT) AS g FROM f
             |  WHERE doc IN (SELECT doc FROM cand$t)
             |    AND tok NOT IN (SELECT tok FROM cov${t - 1})
             |  GROUP BY 1),
             |p$t AS MATERIALIZED (
             |  SELECT doc, g FROM g$t ORDER BY g DESC, doc LIMIT 1),
             |cov$t AS MATERIALIZED (
             |  SELECT tok FROM cov${t - 1}
             |  UNION SELECT f.tok FROM f JOIN p$t USING (doc)),
             |pku$t AS MATERIALIZED (
             |  SELECT doc FROM pku${t - 1} UNION SELECT doc FROM p$t)""".stripMargin
        }.mkString(",\n")
        s"""WITH $toksCte, $shingleCte,
           |f AS MATERIALIZED (
           |  SELECT DISTINCT doc_id AS doc,
           |    ('0x' || substr(md5(tok0), 1, 14))::BIGINT AS tok
           |  FROM (SELECT doc_id, unnest(shingles) AS tok0 FROM sh)),
           |alldocs AS MATERIALIZED (SELECT DISTINCT doc FROM f),
           |${candSql(1, "")},
           |g1 AS (
           |  SELECT doc, CAST(COUNT(*) AS BIGINT) AS g FROM f
           |  WHERE doc IN (SELECT doc FROM cand1) GROUP BY 1),
           |p1 AS MATERIALIZED (SELECT doc, g FROM g1 ORDER BY g DESC, doc LIMIT 1),
           |cov1 AS MATERIALIZED (SELECT DISTINCT f.tok FROM f JOIN p1 USING (doc)),
           |pku1 AS MATERIALIZED (SELECT doc FROM p1),
           |$rounds
           |SELECT rank, doc, g AS gain FROM (
           |  SELECT CAST(1 AS INT) AS rank, doc, g FROM p1
           |  UNION ALL SELECT CAST(2 AS INT), doc, g FROM p2
           |  UNION ALL SELECT CAST(3 AS INT), doc, g FROM p3
           |  UNION ALL SELECT CAST(4 AS INT), doc, g FROM p4) u
           |ORDER BY rank""".stripMargin
      }),

    // three-way snapshot merge: two curation branches against a common
    // base — one-sided edits win automatically, identical edits
    // collapse, divergent edits surface as conflicts with pick = NULL;
    // deletes and adds fall out of the same null-safe digest rule
    Q(
      "corpus_three_way_merge",
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val ours = docs.filter(col("doc_id") % 13 =!= 0)
          .withColumn("text", when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" oursEdit"))).otherwise(col("text")))
        val theirs = docs.filter(col("doc_id") % 11 =!= 0)
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" theirsEdit"))).otherwise(col("text")))
        Corpus.threeWayMerge(docs, ours, theirs, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (SELECT doc_id, md5(text) AS h FROM documents),
             |o AS (
             |  SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0
             |    THEN text || ' oursEdit' ELSE text END) AS h
             |  FROM documents WHERE doc_id % 13 <> 0),
             |t AS (
             |  SELECT doc_id, md5(CASE WHEN doc_id % 5 = 0
             |    THEN text || ' theirsEdit' ELSE text END) AS h
             |  FROM documents WHERE doc_id % 11 <> 0),
             |j AS (
             |  SELECT COALESCE(b.doc_id, o.doc_id, t.doc_id) AS doc_id,
             |    b.h AS hb, o.h AS ho, t.h AS ht
             |  FROM b
             |  FULL OUTER JOIN o ON o.doc_id = b.doc_id
             |  FULL OUTER JOIN t ON t.doc_id = COALESCE(b.doc_id, o.doc_id))
             |SELECT doc_id,
             |  CASE WHEN ho IS NOT DISTINCT FROM hb AND ht IS NOT DISTINCT FROM hb THEN 'unchanged'
             |       WHEN ho IS DISTINCT FROM hb AND ht IS NOT DISTINCT FROM hb THEN 'ours'
             |       WHEN ho IS NOT DISTINCT FROM hb AND ht IS DISTINCT FROM hb THEN 'theirs'
             |       WHEN ho IS NOT DISTINCT FROM ht THEN 'both_same'
             |       ELSE 'conflict' END AS status,
             |  CASE WHEN ho IS NOT DISTINCT FROM hb AND ht IS NOT DISTINCT FROM hb THEN 'base'
             |       WHEN ho IS DISTINCT FROM hb AND ht IS NOT DISTINCT FROM hb THEN 'ours'
             |       WHEN ho IS NOT DISTINCT FROM hb AND ht IS DISTINCT FROM hb THEN 'theirs'
             |       WHEN ho IS NOT DISTINCT FROM ht THEN 'ours'
             |       ELSE NULL END AS pick
             |FROM j ORDER BY doc_id""".stripMargin)),

    // the composed curation pipeline, end to end: length-clip per
    // language → PII scrub → priority-aware exact dedup on the CLEANED
    // text → deterministic split → per-(split, lang) stats. Each stage
    // is individually oracle-verified; this row verifies the
    // COMPOSITION (stage ordering and column flow), the shape a real
    // corpus job ships.
    Q(
      "corpus_curation_pipeline",
      (s, dir) => {
        val clipped = Corpus.clipByLengthRank(table(s, dir, "documents"),
          "lang", "n_chars", "doc_id", loPct = 5, hiPct = 95)
        val scrubbed = Corpus.scrubPii(clipped, "text")
        val deduped = Dedup.dropDuplicatesByPriority(scrubbed, "clean_text",
          Seq(when(col("source") === "src0", 0).otherwise(1), col("doc_id")))
        Corpus.splitByHash(deduped, "doc_id",
          Seq("val" -> "0d", "test" -> "1a"), "train")
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("split"), col("lang"))
      },
      Some(s"""WITH clipped AS (
              |  SELECT doc_id, text, lang, source, n_chars FROM (
              |    SELECT doc_id, text, lang, source, n_chars,
              |      CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
              |      COUNT(*) OVER (PARTITION BY lang) AS n
              |    FROM documents) t
              |  WHERE rn * 100 > n * 5 AND rn * 100 <= n * 95),
              |scrubbed AS (
              |  SELECT doc_id, lang, source, n_chars,
              |    regexp_replace(regexp_replace(text, '${Corpus.EmailPattern}', '<EMAIL>', 'g'),
              |      '${Corpus.PhonePattern}', '<PHONE>', 'g') AS clean
              |  FROM clipped),
              |deduped AS (
              |  SELECT doc_id, lang, n_chars FROM (
              |    SELECT doc_id, lang, n_chars,
              |      ROW_NUMBER() OVER (PARTITION BY md5(clean)
              |        ORDER BY CASE WHEN source = 'src0' THEN 0 ELSE 1 END, doc_id) AS rn2
              |    FROM scrubbed) t
              |  WHERE rn2 = 1)
              |SELECT
              |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '0d' THEN 'val'
              |       WHEN md5(CAST(doc_id AS VARCHAR)) < '1a' THEN 'test'
              |       ELSE 'train' END AS split,
              |  lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
              |FROM deduped GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // the END-TO-END RELEASE pipeline (r12): the full pretraining
    // chain as ONE hash-gated query — normalize → C4-style line dedup
    // → exact keep → fuzzy (minhash-verified CC) keep → gopher gate →
    // decontaminate against the held-out benchmark slice → mixture
    // plan → pack sequences → per-source release sheet whose doc/token
    // counts are RE-DERIVED FROM THE PACKED PAYLOAD (re-tokenized off
    // the packed bytes, shard digests folded in shard order), so a
    // composition seam that loses, duplicates, or mangles a document
    // anywhere in the chain breaks the hash. Every stage is
    // individually green (corpus_normalize, corpus_line_dedup,
    // dedup_exact, dedup_near_keep, corpus_gopher_rules,
    // corpus_decontaminate, corpus_mixture_plan,
    // corpus_pack_sequences); this row gates the SEAMS — the lesson of
    // corpus_curation_incremental, where drift hides between stages.
    // (The LM-score gate drops into the same seam as the gopher gate —
    // corpus_lm_score — kept out of this composition only to bound the
    // oracle's plan depth.) Scale shape: each stage keeps its own
    // gated shape; the only driver work is the bounded #sources
    // weight collect the mixture-plan gate already does.
    Q(
      "corpus_release_pipeline",
      (s, dir) => {
        val (goph0, evalNorm) = releaseGophStage(
          table(s, dir, "documents"), table(s, dir, "documents"))
        // consumed by the contamination pass AND the keep anti-join —
        // without the cut the whole gopher chain re-executes per
        // consumer inside the released checkpoint's job (r14 profile)
        val goph = goph0.localCheckpoint(true)
        // LONG-n-gram decontamination (the GPT-3-style 13-gram rule,
        // scaled to this corpus's doc lengths): 3-grams over a small
        // shared vocabulary convict 95% of the corpus by chance
        // (measured); 8-gram hits are real benchmark copies
        val released = goph.join(
            Dedup.contamination(goph, evalNorm, "doc_id", "clean", n = 8)
              .filter(col("n_contaminated") > 0).select(col("doc_id")),
            Seq("doc_id"), "left_anti")
          .localCheckpoint(true) // feeds the plan AND the pack
        releaseCard(released).orderBy(col("source"))
      },
      Some(s"${releaseOracleHead()},\n${releaseOracleTail("goph")}")),

    // release pipeline V2 (r13): the SAME audited chain with the
    // CCNet LM-quality stage folded in between the gopher gate and
    // decontamination — the one stage r12 deliberately left out
    // (bounding oracle depth; the split-stage fallback proved
    // unnecessary). Bigram stats train on the post-gopher 'en' slice,
    // every surviving doc gets the fixed-point mean-probability score,
    // and each LANGUAGE drops its own tail (score below the per-lang
    // p33 counting-percentile cut — CCNet's core rule that perplexity
    // only compares within a language). The card re-derives counts
    // from packed bytes exactly like v1 and adds the per-source
    // n_lm_dropped census so the new seam's effect is itself pinned.
    // Scale shape: lmScore's two scans + one bounded-domain percentile
    // aggregate + a #langs-row broadcast join, on top of v1's stages.
    Q(
      "corpus_release_pipeline_v2",
      (s, dir) => {
        val (goph0, evalNorm) = releaseGophStage(
          table(s, dir, "documents"), table(s, dir, "documents"))
        // consumed by LM train+score, the keep join, and the census
        val goph = goph0.localCheckpoint(true)
        // id-list materialized: kept feeds the keep join AND the census
        // anti-join, and the census runs in the FINAL job — without the
        // cut the whole ccnetBuckets LM train+score chain re-executes
        // there (r14 profile: the v2/v3 seam redundancy)
        val kept = Corpus.ccnetBuckets(goph, "doc_id", "clean", "lang",
            col("lang") === "en")
          .filter(col("bucket") =!= "tail").select("doc_id")
          .localCheckpoint(true)
        val goph2 = kept.join(goph, Seq("doc_id"))
        val released = goph2.join(
            Dedup.contamination(goph2, evalNorm, "doc_id", "clean", n = 8)
              .filter(col("n_contaminated") > 0).select(col("doc_id")),
            Seq("doc_id"), "left_anti")
          .localCheckpoint(true) // feeds the plan AND the pack
        val lmDrop = goph.join(kept, Seq("doc_id"), "left_anti")
          .groupBy(col("source")).agg(count(lit(1)).as("n_lm_dropped"))
        releaseCard(released)
          .join(lmDrop, Seq("source"), "left")
          .withColumn("n_lm_dropped",
            coalesce(col("n_lm_dropped"), lit(0L)))
          .orderBy(col("source"))
      },
      Some(s"${releaseOracleHead()},\n${releaseLmCtes("goph")},\n${
        releaseOracleTail("goph2",
          extraSelect = ",\n  CAST(COALESCE(ld.n_lm_dropped, 0) AS BIGINT) AS n_lm_dropped",
          extraJoin = "\nLEFT JOIN lmdrop ld USING (source)")
      }")),

    // release pipeline V3 (r13): v2 with the Gopher REPETITION stage
    // between the gopher quality gate and the LM gate — the modern
    // (FineWeb-shaped) ordering where cheap structural repetition
    // filters run before the model-based one, and the LM trains only
    // on text that survived them. Both drop censuses ride the card
    // (n_rep_dropped, n_lm_dropped) so each seam's effect is pinned
    // per source; counts still re-derive from the packed bytes.
    // Scale shape: v2's stages + repetitionRules' one windows explode
    // (~9x tokens) with partial-aggregated counts.
    Q(
      "corpus_release_pipeline_v3",
      (s, dir) => {
        val (goph0, evalNorm) = releaseGophStage(
          table(s, dir, "documents"), table(s, dir, "documents"))
        // consumed by the repetition gate, both censuses, and the keep
        val goph = goph0.localCheckpoint(true)
        // id-lists materialized: repKeep feeds gophR AND the repetition
        // census, kept feeds the keep join AND the LM census, and both
        // censuses run in the FINAL job — without the cuts the whole
        // repetitionRules / ccnetBuckets chains re-execute there
        // (r14 profile: 4 identical ~0.9 s window stages per run)
        val repKeep = Corpus.repetitionRules(goph, "doc_id", "clean",
            capScaleMilli = 600)
          .filter(col("keep")).select("doc_id")
          .localCheckpoint(true)
        val gophR = repKeep.join(goph, Seq("doc_id")).localCheckpoint(true)
        val kept = Corpus.ccnetBuckets(gophR, "doc_id", "clean", "lang",
            col("lang") === "en")
          .filter(col("bucket") =!= "tail").select("doc_id")
          .localCheckpoint(true)
        val goph2 = kept.join(gophR, Seq("doc_id"))
        val released = goph2.join(
            Dedup.contamination(goph2, evalNorm, "doc_id", "clean", n = 8)
              .filter(col("n_contaminated") > 0).select(col("doc_id")),
            Seq("doc_id"), "left_anti")
          .localCheckpoint(true) // feeds the plan AND the pack
        val repDrop = goph.join(repKeep, Seq("doc_id"), "left_anti")
          .groupBy(col("source")).agg(count(lit(1)).as("n_rep_dropped"))
        val lmDrop = gophR.join(kept, Seq("doc_id"), "left_anti")
          .groupBy(col("source")).agg(count(lit(1)).as("n_lm_dropped"))
        releaseCard(released)
          .join(repDrop, Seq("source"), "left")
          .join(lmDrop, Seq("source"), "left")
          .withColumn("n_rep_dropped",
            coalesce(col("n_rep_dropped"), lit(0L)))
          .withColumn("n_lm_dropped",
            coalesce(col("n_lm_dropped"), lit(0L)))
          .orderBy(col("source"))
      },
      Some(s"${releaseOracleHead()},\n${releaseRepCtes(600)},\n${
        releaseLmCtes("goph_r")},\n${
        releaseOracleTail("goph2",
          extraSelect = ",\n  CAST(COALESCE(rd.n_rep_dropped, 0) AS BIGINT) AS n_rep_dropped" +
            ",\n  CAST(COALESCE(ld.n_lm_dropped, 0) AS BIGINT) AS n_lm_dropped",
          extraJoin = "\nLEFT JOIN repdrop rd USING (source)" +
            "\nLEFT JOIN lmdrop ld USING (source)")
      }")),

    // crawl→release (r13): the full "crawl file → release sheet" story
    // in ONE gated composition. The WARC archives corpus_warc_ingest
    // quarantine-gates are parsed back, every accepted page runs the
    // HTML→text extractor, and the EXTRACTED text (not the clean
    // corpus column) feeds the audited release chain: normalize → C4
    // line dedup → exact keep → fuzzy-CC keep → gopher gate → 8-gram
    // decontamination against the RAW held-out slice → mixture plan →
    // pack → card. The card adds a per-source n_pages census so the
    // ingest→extract hand-off is pinned inside the composition, and
    // its doc/token counts are re-derived from the packed bytes
    // exactly like v1/v2. Extraction keeps the fixture's
    // heading/footer boilerplate, so every downstream verdict
    // genuinely differs from the raw-text pipelines — the oracle
    // recomputes the whole chain from page markup. Scale shape: one
    // archive = one task (file-parallel crawl ingest), extraction is
    // map-only, and the chain reuses v1's audited stage shapes.
    Q(
      "corpus_crawl_release",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
          .select("doc_id", "text", "lang", "source")
          .as[(Long, String, String, String)]
        val pages = docs.groupByKey(_._4)
          .flatMapGroups { (_, it) =>
            val rows = it.toVector.sortBy(_._1)
            val records =
              (Warc.warcinfoRecord("graft-fixture") +:
                rows.map { case (id, text, lang, source) =>
                  Warc.responseRecord(s"http://corpus.test/$source/$id",
                    id.toString, htmlFixture(id, text, lang, source))
                }) ++ Warc.corruptRecords
            Warc.parse(Warc.archive(records)).pages.iterator.map { pg =>
              (pg.uri.substring(pg.uri.lastIndexOf('/') + 1).toLong,
                TextExtract.htmlToText(pg.body))
            }
          }
          .toDF("doc_id", "text")
        val crawl = pages.join(
            table(s, dir, "documents").select("doc_id", "lang", "source"),
            Seq("doc_id"))
          .select("doc_id", "lang", "source", "text")
          .localCheckpoint(true) // feeds the census AND the chain
        val census = crawl.groupBy(col("source"))
          .agg(count(lit(1)).as("n_pages"))
        val (goph0, evalNorm) =
          releaseGophStage(crawl, table(s, dir, "documents"))
        // consumed by the contamination pass AND the keep anti-join
        val goph = goph0.localCheckpoint(true)
        val released = goph.join(
            Dedup.contamination(goph, evalNorm, "doc_id", "clean", n = 8)
              .filter(col("n_contaminated") > 0).select(col("doc_id")),
            Seq("doc_id"), "left_anti")
          .localCheckpoint(true) // feeds the plan AND the pack
        releaseCard(released)
          .join(census, Seq("source"))
          .orderBy(col("source"))
      },
      Some {
        val prefix = s"""$htmlExtractCtes,
           |crawl_src AS MATERIALIZED (
           |  SELECT k.doc_id, d.lang, d.source,
           |    array_to_string(k.ls, chr(10)) AS text
           |  FROM kept k JOIN documents d USING (doc_id)),
           |pc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pages
           |  FROM crawl_src GROUP BY 1),
           |""".stripMargin
        s"${releaseOracleHead("crawl_src", prefix)},\n${
          releaseOracleTail("goph",
            extraSelect = ",\n  pc.n_pages",
            extraJoin = "\nJOIN pc USING (source)")
        }"
      }),

    // the CAPSTONE composition (r13): every stage of the modern
    // pretraining pipeline in ONE gated chain — WARC record walk →
    // HTML→text extraction → URL front door (canonicalize, blocklist,
    // URL dedup) → normalize → C4 line dedup → exact keep → fuzzy-CC
    // keep → gopher gate → repetition gate → LM gate → 8-gram
    // decontamination → mixture plan → pack → card. Three per-source
    // drop censuses (URL, repetition, LM) ride the card next to the
    // packed-bytes-re-derived counts, so every seam added this round
    // is pinned inside the full composition, and the URL fixture is
    // the SAME spelling the streaming front-end gates
    // (`stream_crawl_ingest`) — the batch and live front doors cannot
    // drift. Scale shape: file-parallel archive walk + map-only
    // extraction/canonicalization + the audited release stages; the
    // only driver work remains the bounded #sources weight collect.
    Q(
      "corpus_crawl_release_v2",
      (s, dir) => {
        import s.implicits._
        val docs = table(s, dir, "documents")
          .select("doc_id", "text", "lang", "source")
          .as[(Long, String, String, String)]
        val pages = docs.groupByKey(_._4)
          .flatMapGroups { (_, it) =>
            val rows = it.toVector.sortBy(_._1)
            val records =
              (Warc.warcinfoRecord("graft-fixture") +:
                rows.map { case (id, text, lang, source) =>
                  Warc.responseRecord(StreamingQueries.crawlUrl(id),
                    id.toString, htmlFixture(id, text, lang, source))
                }) ++ Warc.corruptRecords
            Warc.parse(Warc.archive(records)).pages.iterator.map { pg =>
              (pg.recordId.stripPrefix("<urn:graft:")
                .stripSuffix(">").toLong,
                pg.uri, TextExtract.htmlToText(pg.body))
            }
          }
          .toDF("doc_id", "url", "text")
        val gated = Corpus.urlGate(pages, "doc_id", "url",
            blockedDomains = Seq("example2.com"))
          .localCheckpoint(true) // feeds the census AND the keep
        val meta = table(s, dir, "documents")
          .select("doc_id", "lang", "source")
        val urlDrop = gated.filter(!col("keep")).join(meta, Seq("doc_id"))
          .groupBy(col("source")).agg(count(lit(1)).as("n_url_dropped"))
        val crawl = gated.filter(col("keep"))
          .select("doc_id", "text").join(meta, Seq("doc_id"))
          .select("doc_id", "lang", "source", "text")
        val (goph0, evalNorm) =
          releaseGophStage(crawl, table(s, dir, "documents"))
        val goph = goph0.localCheckpoint(true)
        // id-lists materialized — the v3 seam-redundancy fix (see
        // corpus_release_pipeline_v3): both censuses run in the final
        // job and would otherwise re-execute the whole chains
        val repKeep = Corpus.repetitionRules(goph, "doc_id", "clean",
            capScaleMilli = 600)
          .filter(col("keep")).select("doc_id")
          .localCheckpoint(true)
        val gophR = repKeep.join(goph, Seq("doc_id")).localCheckpoint(true)
        val kept = Corpus.ccnetBuckets(gophR, "doc_id", "clean", "lang",
            col("lang") === "en")
          .filter(col("bucket") =!= "tail").select("doc_id")
          .localCheckpoint(true)
        val goph2 = kept.join(gophR, Seq("doc_id"))
        val released = goph2.join(
            Dedup.contamination(goph2, evalNorm, "doc_id", "clean", n = 8)
              .filter(col("n_contaminated") > 0).select(col("doc_id")),
            Seq("doc_id"), "left_anti")
          .localCheckpoint(true) // feeds the plan AND the pack
        val repDrop = goph.join(repKeep, Seq("doc_id"), "left_anti")
          .groupBy(col("source")).agg(count(lit(1)).as("n_rep_dropped"))
        val lmDrop = gophR.join(kept, Seq("doc_id"), "left_anti")
          .groupBy(col("source")).agg(count(lit(1)).as("n_lm_dropped"))
        releaseCard(released)
          .join(urlDrop, Seq("source"), "left")
          .join(repDrop, Seq("source"), "left")
          .join(lmDrop, Seq("source"), "left")
          .withColumn("n_url_dropped",
            coalesce(col("n_url_dropped"), lit(0L)))
          .withColumn("n_rep_dropped",
            coalesce(col("n_rep_dropped"), lit(0L)))
          .withColumn("n_lm_dropped",
            coalesce(col("n_lm_dropped"), lit(0L)))
          .orderBy(col("source"))
      },
      Some {
        val prefix = s"""$htmlExtractCtes,
           |crawl_src AS MATERIALIZED (
           |  SELECT k.doc_id, d.lang, d.source,
           |    array_to_string(k.ls, chr(10)) AS text
           |  FROM kept k JOIN documents d USING (doc_id)),
           |u AS (SELECT doc_id, $crawlUrlSql AS url
           |  FROM crawl_src),
           |$crawlUrlCanonCtes,
           |ukeep AS MATERIALIZED (
           |  SELECT cx.doc_id FROM cx JOIN ck USING (canon_url)
           |  WHERE cx.domain <> 'example2.com' AND cx.doc_id = ck.keeper),
           |crawl_kept AS MATERIALIZED (
           |  SELECT c.* FROM crawl_src c JOIN ukeep USING (doc_id)),
           |udrop AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_url_dropped
           |  FROM crawl_src WHERE doc_id NOT IN (SELECT doc_id FROM ukeep)
           |  GROUP BY 1),
           |""".stripMargin
        s"${releaseOracleHead("crawl_kept", prefix)},\n${
          releaseRepCtes(600)},\n${releaseLmCtes("goph_r")},\n${
          releaseOracleTail("goph2",
            extraSelect =
              ",\n  CAST(COALESCE(ud.n_url_dropped, 0) AS BIGINT) AS n_url_dropped" +
              ",\n  CAST(COALESCE(rd.n_rep_dropped, 0) AS BIGINT) AS n_rep_dropped" +
              ",\n  CAST(COALESCE(ld.n_lm_dropped, 0) AS BIGINT) AS n_lm_dropped",
            extraJoin = "\nLEFT JOIN udrop ud USING (source)" +
              "\nLEFT JOIN repdrop rd USING (source)" +
              "\nLEFT JOIN lmdrop ld USING (source)")
        }"
      }),

    // length-distribution clipping per language: drop the shortest 5% and
    // longest 5% by exact integer rank arithmetic
    Q(
      "corpus_length_clip",
      (s, dir) =>
        Corpus.clipByLengthRank(table(s, dir, "documents"),
          "lang", "n_chars", "doc_id", loPct = 5, hiPct = 95)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id")),
      Some("""WITH r AS (
             |  SELECT doc_id, lang, n_chars,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
             |    COUNT(*) OVER (PARTITION BY lang) AS n
             |  FROM documents)
             |SELECT doc_id, lang, n_chars FROM r
             |WHERE rn * 100 > n * 5 AND rn * 100 <= n * 95
             |ORDER BY doc_id""".stripMargin)),

    // the SCALE path of the clip operator (see clipByLengthApprox
    // scaladoc): per-stratum approx_percentile thresholds instead of a
    // per-stratum rank sort. Deterministic oracle because the sketch is
    // EXACT whenever a stratum holds fewer rows than `accuracy`
    // (every sample keeps g=1, Δ=0, and no compression merge fires at
    // 2·count/accuracy < 1), returning the element at ascending rank
    // ceil(p·n) — which is what the SQL computes directly.
    Q(
      "corpus_length_clip_approx",
      (s, dir) =>
        Corpus.clipByLengthApprox(table(s, dir, "documents"),
          "lang", "n_chars", loPct = 5, hiPct = 95)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy(col("doc_id")),
      Some("""WITH r AS (
             |  SELECT lang, n_chars,
             |    CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS BIGINT) AS rn,
             |    COUNT(*) OVER (PARTITION BY lang) AS n
             |  FROM documents),
             |th AS (
             |  SELECT lang,
             |    MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.05 * n) AS BIGINT), 1)
             |        THEN n_chars END) AS lo,
             |    MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.95 * n) AS BIGINT), 1)
             |        THEN n_chars END) AS hi
             |  FROM r GROUP BY lang)
             |SELECT d.doc_id, d.lang, d.n_chars
             |FROM documents d JOIN th USING (lang)
             |WHERE d.n_chars > th.lo AND d.n_chars <= th.hi
             |ORDER BY d.doc_id""".stripMargin)),

    // per-source document cap ("at most k pages per domain"): the k
    // longest docs per source survive, chosen by the k-capped heap
    // aggregate — never a full per-domain sort — then rejoined whole
    Q(
      "corpus_domain_cap",
      (s, dir) =>
        Corpus.capPerGroup(table(s, dir, "documents"),
          "source", "doc_id", col("n_chars"), k = 30)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, source, n_chars FROM (
             |  SELECT doc_id, source, n_chars,
             |    ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id) AS rn
             |  FROM documents) t
             |WHERE rn <= 30 ORDER BY doc_id""".stripMargin)),

    // per-language length quantiles through the GROUPED log2-bucket
    // sketch: p50/p99 document-length bounds per language from <= 64
    // counters per group — the clip-threshold sizing sheet without any
    // per-language sort
    Q(
      "corpus_length_quantiles",
      (s, dir) =>
        Sketches.quantileEstimate(
          Sketches.quantileBuckets(
            table(s, dir, "documents").select(col("lang"), col("n_chars")),
            "lang", col("n_chars")),
          "lang", Seq(500000L, 990000L))
          .orderBy(col("lang"), col("p_ppm")),
      Some("""WITH b AS (
             |  SELECT lang, CAST(length(bin(n_chars)) AS INT) AS bucket,
             |    CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM documents GROUP BY 1, 2),
             |c AS (SELECT lang, bucket, cnt,
             |    CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bucket) AS BIGINT) AS cum,
             |    CAST(SUM(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
             |  FROM b),
             |p AS (SELECT CAST(unnest([500000, 990000]) AS BIGINT) AS p_ppm),
             |sel AS (
             |  SELECT lang, p_ppm, MIN(bucket) AS bucket, MAX(n) AS n
             |  FROM c, p WHERE cum * 1000000 >= p_ppm * n GROUP BY 1, 2)
             |SELECT lang, p_ppm, CAST(bucket AS INT) AS bucket, n,
             |  CAST((1::BIGINT << bucket) - 1 AS BIGINT) AS upper_bound
             |FROM sel ORDER BY lang, p_ppm""".stripMargin)),

    // mixture-concentration report: per-source token share (ppm) and
    // the Herfindahl-Hirschman index of the whole mixture — the "is
    // one source dominating training" health check. One
    // partial-aggregated #sources-row groupBy; the unpartitioned
    // windows fold that bounded table (house precedent: dsirSelect,
    // crosstab). Integer-exact ppm via floor division on both
    // engines; n_tokens * 1e6 bounds the corpus at ~9e12 tokens, the
    // same documented ceiling as mixturePlan
    Q(
      "corpus_source_hhi",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val per = table(s, dir, "documents")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(TextFunctions.tokenCount(col("text")).cast("long"))
              .as("n_tokens"))
        val wAll = Window.partitionBy()
        per
          .withColumn("__tot", sum(col("n_tokens")).over(wAll))
          .withColumn("share_ppm",
            expr("n_tokens * 1000000L DIV __tot"))
          .withColumn("__sq",
            sum(col("share_ppm") * col("share_ppm")).over(wAll))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            col("share_ppm"),
            expr("__sq DIV 1000000L").as("hhi_ppm"))
          .orderBy(col("source"))
      },
      Some("""WITH per AS (
             |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |    CAST(SUM(len(list_filter(string_split(text, ' '), x -> x != ''))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY 1),
             |s AS (
             |  SELECT source, n_docs, n_tokens,
             |    CAST(n_tokens * 1000000 // CAST(SUM(n_tokens) OVER () AS BIGINT) AS BIGINT) AS share_ppm
             |  FROM per)
             |SELECT source, n_docs, n_tokens, share_ppm,
             |  CAST(SUM(share_ppm * share_ppm) OVER () // 1000000 AS BIGINT) AS hhi_ppm
             |FROM s ORDER BY source""".stripMargin)),

    // Zipf coverage curve: share of all token OCCURRENCES covered by
    // the top-k vocabulary for k in {5, 10, 20} — the
    // tokenizer/vocab sizing sheet. Heap AND grand total from one
    // global aggregate over the (token, count) table; ties pinned by
    // the token hash on both engines
    Q(
      "corpus_vocab_coverage",
      (s, dir) => {
        val counts = table(s, dir, "documents")
          .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .withColumn("__id",
            graft.functions.Md5PrefixLong.md5_prefix_long(col("tok"), 14))
        counts
          .agg(graft.functions.TopKByScore.top_k_by_score(
              col("cnt").cast("double"), col("__id"), 20).as("top"),
            sum(col("cnt")).as("t"))
          .select(col("t"), posexplode(col("top")).as(Seq("r0", "e")))
          .withColumn("k", explode(array(lit(5), lit(10), lit(20))))
          .filter(col("r0") < col("k"))
          .groupBy(col("k"), col("t"))
          .agg(sum(col("e.score")).cast("long").as("covered"))
          .select(col("k"), col("covered"),
            expr("covered * 1000000 DIV t").as("coverage_ppm"))
          .orderBy(col("k"))
      },
      Some(s"""WITH $toksCte,
             |c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
             |      FROM (SELECT unnest(ws) AS tok FROM toks) GROUP BY 1),
             |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tt FROM c),
             |r AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC,
             |    ('0x' || substr(md5(tok), 1, 14))::BIGINT) AS rn
             |  FROM c),
             |k AS (SELECT unnest([5, 10, 20]) AS k)
             |SELECT k, CAST(SUM(cnt) AS BIGINT) AS covered,
             |  CAST(CAST(SUM(cnt) AS BIGINT) * 1000000 // tt AS BIGINT) AS coverage_ppm
             |FROM r, k, t WHERE rn <= k GROUP BY k, tt ORDER BY k""".stripMargin)),

    // GLOBAL curriculum rank: every document's position in the corpus-
    // wide (n_chars DESC, doc_id) order via the distributed two-pass
    // rank — range partitions + P-row offset fold, so no single task
    // ever sorts the whole corpus (the global-sort-at-scale spelling;
    // a window would funnel everything through one task)
    Q(
      "corpus_global_rank",
      (s, dir) =>
        TwoPass.rank(
          table(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          Seq(), Seq(col("n_chars").desc, col("doc_id")), "rank")
          .orderBy(col("rank")),
      Some("""SELECT doc_id, n_chars,
             |  CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
             |FROM documents ORDER BY rank""".stripMargin)),

    // per-language top-10 vocabulary via the SAME k-capped heap as the
    // domain cap, keyed by a 56-bit (lang, token) hash id — the
    // per-group top-k spelling for non-numeric keys (never a per-group
    // sort); the oracle replicates the hash to pin heap tie-breaks
    Q(
      "corpus_vocab_by_lang",
      (s, dir) => {
        val counts = table(s, dir, "documents")
          .select(col("lang"),
            explode(TextFunctions.tokens(col("text"))).as("tok"))
          .groupBy(col("lang"), col("tok"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("__id",
            graft.functions.Md5PrefixLong.md5_prefix_long(
              concat_ws("|", col("lang"), col("tok")), 14))
          .localCheckpoint(true)
        Corpus.capPerGroup(counts, "lang", "__id", col("cnt"), k = 10)
          .select(col("lang"), col("tok"), col("cnt"))
          .orderBy(col("lang"), col("cnt").desc, col("tok"))
      },
      Some("""WITH c AS (
             |  SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
             |    SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
             |    FROM documents) GROUP BY 1, 2),
             |p AS (SELECT lang, tok, cnt,
             |    ('0x' || substr(md5(lang || '|' || tok), 1, 14))::BIGINT AS id
             |  FROM c),
             |r AS (SELECT lang, tok, cnt,
             |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, id) AS rn
             |  FROM p)
             |SELECT lang, tok, cnt FROM r WHERE rn <= 10
             |ORDER BY lang, cnt DESC, tok""".stripMargin)),

    // hashed-feature linear quality model: every token md5-hashes into
    // one of 64 buckets, score = mean bucket weight; weights here are a
    // deterministic stand-in ((bucket % 7) - 3) with the real-model seam
    // being just the weights array. Integer-valued weights keep the fold
    // exact, so the single final division matches bit-for-bit.
    Q(
      "corpus_score_calibration",
      // per-source quantile calibration: map each doc's raw score
      // (length here) to its WITHIN-SOURCE percentile ppm via
      // TwoPass.rank — heterogeneous sources become comparable before
      // a global keep-threshold (a raw cutoff keeps whole verbose
      // sources and drops whole terse ones); distributed two-pass, no
      // per-source single-partition window
      (s, dir) =>
        TwoPass.rank(
          table(s, dir, "documents")
            .select(col("doc_id"), col("source"), col("n_chars")),
          Seq("source"), Seq(col("n_chars"), col("doc_id")), "rk",
          Some("n"))
          .select(col("doc_id"), col("source"),
            expr("rk * 1000000 DIV n").as("pct_ppm"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, source,
             |  CAST(CAST(ROW_NUMBER() OVER (PARTITION BY source
             |      ORDER BY n_chars, doc_id) AS BIGINT) * 1000000
             |    // COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS pct_ppm
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q(
      "corpus_quality_score",
      (s, dir) =>
        Corpus.scoreLinearHashed(table(s, dir, "documents"),
          "doc_id", "text",
          weights = Seq.tabulate(64)(j => ((j % 7) - 3).toDouble))
          .orderBy(col("doc_id")),
      Some(s"""WITH $toksCte
             |SELECT doc_id, CAST(len(ws) AS INT) AS n_tokens,
             |  CASE WHEN len(ws) > 0 THEN
             |    CAST(list_sum(list_transform(ws, t ->
             |      ('0x' || substr(md5(t), 1, 6))::BIGINT % 64 % 7 - 3)) AS DOUBLE)
             |      / CAST(len(ws) AS DOUBLE)
             |  ELSE 0.0 END AS score
             |FROM toks ORDER BY doc_id""".stripMargin)),

    // IN-ENGINE quality-model TRAINING (closes the one curation stage
    // that consumed external weights): least-squares distillation of
    // the stand-in scorer's integer decision function onto hashed
    // token-count features — damped-Jacobi rounds on the normal
    // equations, every quantity BIGINT, so the oracle unrolls the
    // identical rounds as chained CTEs over the (dim+1)²-cell Gram
    // (the PageRank/Holt integer-recurrence contract at the BPE
    // driver-venue price: ONE distributed pass, rounds free). Output
    // is the model artifact itself: (j, w), bias at j = dim.
    Q(
      "corpus_quality_train",
      (s, dir) =>
        Corpus.linearDistillTrain(
          table(s, dir, "documents")
            .filter(md5(col("doc_id").cast("string").cast("binary"))
              < lit(QtTrainBound)),
          "doc_id", "text", target = qtTeacher,
          dim = QtDim, damp = QtDamp, rounds = QtRounds)
          .orderBy(col("j")),
      Some(linearDistillSql(QtDim, QtDamp, QtRounds, QtTrainBound) +
        s"\nSELECT j, w FROM w$QtRounds ORDER BY j")),

    // train→score composed end to end: the weights learned on the
    // hash-split train slice score the HELD-OUT docs the trainer never
    // saw — prediction sign(margin) vs the teacher's sign, confusion
    // census (y, pred, n). The census proves the training LEARNS
    // (~96% held-out agreement vs a 56% class prior at sf0.01; a
    // degenerate trainer would sit at the prior), and the whole read
    // path is the deployed shape: weights cross as a dim+1 literal,
    // scoring is map-side + one (y, pred) fold.
    Q(
      "corpus_quality_train_score",
      (s, dir) =>
        Corpus.linearDistillScore(table(s, dir, "documents"),
          "doc_id", "text", target = qtTeacher,
          trainPred = md5(col("doc_id").cast("string").cast("binary"))
            < lit(QtTrainBound),
          dim = QtDim, damp = QtDamp, rounds = QtRounds)
          .orderBy(col("y"), col("pred")),
      Some(linearDistillSql(QtDim, QtDamp, QtRounds, QtTrainBound) +
        s""",
           |${qtFeaturesSql("fxh",
              s"NOT md5(CAST(doc_id AS VARCHAR)) < '$QtTrainBound'", QtDim)},
           |mh AS (
           |  SELECT f.doc, CAST(SUM(f.v * w.w) AS BIGINT) AS marg
           |  FROM fxh f JOIN w$QtRounds w USING (j) GROUP BY 1)
           |SELECT CASE WHEN h.s > 0 THEN CAST(1 AS BIGINT)
           |            ELSE CAST(-1 AS BIGINT) END AS y,
           |  CASE WHEN m.marg > 0 THEN CAST(1 AS BIGINT)
           |       ELSE CAST(-1 AS BIGINT) END AS pred,
           |  CAST(COUNT(*) AS BIGINT) AS n
           |FROM mh m JOIN fxh0 h ON m.doc = h.doc_id
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // the trainer's CONVERGENCE RECEIPT: the normal-equation residual
    // |b − H·w|₁ sampled every 32 of the 256 Jacobi rounds — the
    // monotone-decaying curve that shows the training WORKS (next to
    // the held-out census that shows it generalizes); the oracle
    // recomputes each checkpoint's residual from the same unrolled
    // w$k tables, so the whole trajectory is engine-exact, not just
    // the endpoint
    Q(
      "corpus_quality_train_curve",
      (s, dir) =>
        Corpus.linearDistillCurve(
          table(s, dir, "documents")
            .filter(md5(col("doc_id").cast("string").cast("binary"))
              < lit(QtTrainBound)),
          "doc_id", "text", target = qtTeacher,
          dim = QtDim, damp = QtDamp, rounds = QtRounds,
          checkpointEvery = QtRounds / 8)
          .orderBy(col("round")),
      Some(linearDistillSql(QtDim, QtDamp, QtRounds, QtTrainBound) +
        (1 to 8).map { c =>
          val k = c * (QtRounds / 8)
          s"""SELECT CAST($k AS INT) AS round,
             |  (SELECT CAST(SUM(ABS(COALESCE(b.b, 0) - COALESCE(hw.hw, 0))) AS BIGINT)
             |   FROM w0 wz
             |   LEFT JOIN bvec b ON b.j = wz.j
             |   LEFT JOIN (SELECT h.j, CAST(SUM(h.v * w2.w) AS BIGINT) AS hw
             |              FROM hmat h JOIN w$k w2 ON w2.j = h.k
             |              GROUP BY 1) hw ON hw.j = wz.j) AS g_l1""".stripMargin
        }.mkString("\n", "\nUNION ALL ", "\nORDER BY round"))),

    // EXTERNAL-teacher training gate (r12): the same distillation
    // chain learning a target that is NOT a function of its own
    // feature hash — a fixture-column label (length band + source
    // tier, see qtExtTeacher) the bucket counts never encode directly.
    // Runs WITH the integer ridge (H + 16·I) so the collinear-
    // stability term is itself oracle-proven. Held-out confusion
    // census: ~95% sign agreement vs the 56% majority prior — the
    // trainer proven on the task it exists for (distilling a model
    // whose signal lives OUTSIDE the feature span), not on an
    // in-span identity.
    Q(
      "corpus_quality_train_ext",
      (s, dir) =>
        Corpus.linearDistillScore(table(s, dir, "documents"),
          "doc_id", "text", target = qtExtTeacher,
          trainPred = md5(col("doc_id").cast("string").cast("binary"))
            < lit(QtTrainBound),
          dim = QtDim, damp = QtDamp, rounds = QtRounds, ridge = QtRidge)
          .orderBy(col("y"), col("pred")),
      Some(linearDistillSql(QtDim, QtDamp, QtRounds, QtTrainBound,
          teacherSql = qtExtTeacherSql, tScaleSql = "s", ridge = QtRidge) +
        s""",
           |${qtFeaturesSql("fxh",
              s"NOT md5(CAST(doc_id AS VARCHAR)) < '$QtTrainBound'", QtDim,
              qtExtTeacherSql)},
           |mh AS (
           |  SELECT f.doc, CAST(SUM(f.v * w.w) AS BIGINT) AS marg
           |  FROM fxh f JOIN w$QtRounds w USING (j) GROUP BY 1)
           |SELECT CASE WHEN h.s > 0 THEN CAST(1 AS BIGINT)
           |            ELSE CAST(-1 AS BIGINT) END AS y,
           |  CASE WHEN m.marg > 0 THEN CAST(1 AS BIGINT)
           |       ELSE CAST(-1 AS BIGINT) END AS pred,
           |  CAST(COUNT(*) AS BIGINT) AS n
           |FROM mh m JOIN fxh0 h ON m.doc = h.doc_id
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )

  /** One staged BPE training run (chain + trained histogram) shared by
    * the deliverable family (`corpus_bpe_merges` / `_encode` / `_vocab`
    * / `_ids`) — the train-once / derive-many split a deployed
    * tokenizer pipeline runs, made literal via [[Staged]]. */
  private def bpeFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[(String, String, Long)],
      org.apache.spark.sql.DataFrame) =
    Staged.any(s, s"bpe-trained|$dir|$BpeMerges|$BpeWindow|$BpeMaxRounds") {
      val (chain, hist) = Corpus.bpeCore(table(s, dir, "documents"),
        "doc_id", "text", BpeMerges, BpeWindow, BpeMaxRounds)
      (chain, hist.localCheckpoint(true))
    }

  /** The staged shingle feature table the coverage pair shares. */
  private def coverageFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Staged.df(s, s"coverage-feats|$dir|3")(
      Corpus.coverageFeatures(table(s, dir, "documents"), "doc_id",
        "text", n = 3))

  /** The staged full-corpus near-dup pair graph + star-CC labels the
    * stored-state family reads (takedown scoped/pipeline, the
    * incremental-clusters gate's day-0 state): in a deployment these
    * ARE persisted artifacts of a previous run, which is exactly what
    * each query's scaladoc models. */
  private def storedPairsFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Staged.df(s, s"ngram-pairs|$dir|3|0.5")(
      Dedup.ngramJaccard(table(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5, maxDf = JaccardMaxDf))

  private def storedStarFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Staged.df(s, s"stored-star|$dir|3|0.5")(
      Dedup.connectedComponentsStar(
          table(s, dir, "documents").select(col("doc_id")), "doc_id",
          storedPairsFixture(s, dir))
        .withColumnRenamed("id", "doc_id"))

  /** The staged exact-recall prefix-filter pair table (the must-not-
    * miss pair artifact `dedup_prefix_pairs` gates live; the KEEP
    * deliverable reads the stored copy). */
  private def prefixPairsFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Staged.df(s, s"prefix-pairs|$dir|3|400000")(
      Dedup.prefixFilterPairs(table(s, dir, "documents"), "doc_id",
        "text", n = 3, thresholdPpm = 400000L))

  /** The staged STORED MERGE ARTIFACT of the train-once / apply-many
    * BPE gate: merges learned on the history slice (doc_id < 400) —
    * "yesterday's tokenizer", persisted; the apply gate replays it. */
  private def storedMergesFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Staged.df(s,
      s"bpe-stored|$dir|$BpeStoredMerges|$BpeWindow|$BpeStoredMaxRounds")(
      Corpus.bpeMerges(
        table(s, dir, "documents").filter(col("doc_id") < 400),
        "doc_id", "text", merges = BpeStoredMerges, window = BpeWindow,
        maxRounds = BpeStoredMaxRounds))

  /** The staged day-0 STORED SIGNATURE TABLE of the incremental-dedup
    * family (history = doc_id < 400, signed once when it arrived —
    * which is literally what the consuming queries' docs say): shared
    * by the batch incremental gate, the live-ingest gate's store
    * bootstrap, and the composed incremental curation pipeline. */
  private[ops] def historySigsFixture(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Staged.df(s, s"history-sigs|$dir|3|12")(
      Dedup.minhashSignatureTable(
        table(s, dir, "documents").filter(col("doc_id") < 400),
        "doc_id", "text", n = 3, k = 12))

  /** The stand-in teacher the distillation gates train against: the
    * [[Corpus.scoreLinearHashed]] stand-in weights' token-weight SUM
    * × 1000 per doc — an all-BIGINT column, sign = the scorer's
    * accept/reject decision. Any external model's integer score slots
    * into the same seam. */
  private def qtTeacher: Column =
    coalesce(
      aggregate(
        transform(TextFunctions.tokens(col("text")), t =>
          pmod(graft.functions.Md5PrefixLong.md5_prefix_long(t, 6), lit(64L)) % 7 - 3),
        lit(0L), (acc, x) => acc + x),
      lit(0L)) * 1000

  /** The EXTERNAL teacher (r12): an integer label built ONLY from
    * fixture columns the hashed token features never see — the length
    * band (n_chars − corpus-median 306) plus a source-tier bump
    * (source number mod 5, centered). Unlike [[qtTeacher]] (a linear
    * function of the scorer's own feature hash, trivially in the
    * model's span) this is a genuine regression target: the trainer
    * must recover document length and source vocabulary signals from
    * bucket counts whose per-bucket token-length mix it never
    * observes. Held-out sign agreement ≈ 95% vs a 56% prior. */
  private def qtExtTeacher: Column =
    (col("n_chars").cast("long") - 306L) * 100L +
      (pmod(expr("CAST(substring(source, 4) AS BIGINT)"), lit(5L)) - 2L) * 400L

  /** DuckDB spelling of [[qtExtTeacher]] (evaluated over the raw
    * documents row inside the feature CTE). `def`: referenced from the
    * registry val above its declaration — a plain val would still be
    * null there (object init order). */
  private def qtExtTeacherSql: String =
    "(n_chars - 306) * 100 + ((CAST(substr(source, 4) AS BIGINT) % 5) - 2) * 400"

  /** DuckDB spelling of [[qtTeacher]]'s pre-scale sum (the default the
    * in-span distillation gates share; `tScaleSql = "s * 1000"`
    * applies the ×1000). */
  private def qtScorerTeacherSql: String =
    """COALESCE(list_sum(list_transform(ws, t ->
      |      ('0x' || substr(md5(t), 1, 6))::BIGINT % 64 % 7 - 3)), 0)""".stripMargin

  /** SQL for the (doc, j, v) hashed-count feature table + bias the
    * distillation oracles share: `name0` keeps (doc_id, s = teacher
    * value, ws), `name` is the feature rows. Mirrors
    * Corpus.scorerFeatures + the chosen teacher exactly. `teacherSql`
    * may reference `ws` (the tokenized text) or any raw documents
    * column (n_chars, source, lang) — the external-teacher path. */
  private def qtFeaturesSql(name: String, pred: String, dim: Int,
      teacherSql: String = qtScorerTeacherSql): String =
    s"""${name}0 AS (
       |  SELECT doc_id,
       |    CAST($teacherSql
       |      AS BIGINT) AS s,
       |    ws
       |  FROM (SELECT doc_id, n_chars, source, lang,
       |      list_filter(string_split(text, ' '),
       |      x -> x != '') AS ws
       |    FROM documents WHERE $pred)),
       |$name AS MATERIALIZED (
       |  SELECT doc, j, v FROM (
       |    SELECT doc_id AS doc,
       |      CAST(('0x' || substr(md5(tok), 1, 6))::BIGINT % $dim AS INT) AS j,
       |      CAST(COUNT(*) AS BIGINT) AS v
       |    FROM (SELECT doc_id, unnest(ws) AS tok FROM ${name}0)
       |    GROUP BY 1, 2
       |    UNION ALL
       |    SELECT doc_id AS doc, $dim AS j, CAST(1 AS BIGINT) AS v
       |    FROM ${name}0))""".stripMargin

  /** The damped-Jacobi distillation chain as CTEs: train-slice
    * features, the (dim+1)²-cell Gram `hmat`, its diagonal, the
    * moment vector `bvec`, zero weights `w0`, then per round k
    *   w\$k = w\$(k−1) + (b − H·w) // (damp · max(H_jj, 1))
    * — DuckDB `//` truncates toward zero exactly like Scala Long
    * division, verified on negatives. Mirrors
    * Corpus.linearDistillCore round for round; consumers append their
    * own final SELECT.
    *
    * The rounds run in LIST space: the Gram is folded once into a
    * single (dim+1)×(dim+1) list-of-lists row (`hml`, zero-filled so
    * the list dot product equals the old zero-COALESCEd join
    * aggregate), `bdl` pre-folds the b and damp·max(diag, 1) vectors
    * the same way, and each `v\$k` is ONE ROW holding the weight
    * vector — the r13 shape (256 materialized 65-row CTEs, each with
    * 3 joins + an aggregate) left several MB of DuckDB 1.0 allocator
    * high-water per round and peaked at 1.35 GB isolated RSS, enough
    * to OOM the round driver's starved oracle host; the list chain
    * measures 0.16 GB with byte-identical output and ~6× less wall
    * (tools/oracle_rss_r14.txt). `w\$k` (j, w) taps are emitted at
    * every `rounds/8` checkpoint for the curve consumer (those `v\$k`
    * are MATERIALIZED — referenced twice); unreferenced taps cost
    * nothing. */
  private def linearDistillSql(dim: Int, damp: Int, rounds: Int,
      bound: String, teacherSql: String = qtScorerTeacherSql,
      tScaleSql: String = "s * 1000", ridge: Long = 0L): String = {
    val dim1 = dim + 1
    val every = math.max(1, rounds / 8)
    val roundCtes = (1 to rounds).map { k =>
      val mat = if (k % every == 0) " MATERIALIZED" else ""
      s"""v$k AS$mat (
         |  SELECT list_transform(range(1, ${dim1 + 1}), j -> CAST(wv[j] +
         |    (bl[j] - CAST(list_sum(list_transform(range(1, ${dim1 + 1}),
         |        k -> hm[j][k] * wv[k])) AS BIGINT))
         |      // dl[j] AS BIGINT)) AS wv
         |  FROM v${k - 1}, hml, bdl)""".stripMargin
    }.mkString(",\n")
    val taps = (1 to rounds).filter(_ % every == 0).map { k =>
      s"""w$k AS (SELECT CAST(j AS INT) AS j, wv[j + 1] AS w
         |  FROM v$k, range(0, $dim1) t(j))""".stripMargin
    }.mkString(",\n")
    // H + λI: the ridge rides INSIDE hmat so the rounds and the curve's
    // residual both see the ridged operator (mirrors distillMoments'
    // driver-side diagonal add; λ = 0 adds exact zeros)
    s"""WITH ${qtFeaturesSql("fx", s"md5(CAST(doc_id AS VARCHAR)) < '$bound'", dim, teacherSql)},
       |tvec AS MATERIALIZED (
       |  SELECT doc_id AS doc, CAST($tScaleSql AS BIGINT) AS t FROM fx0),
       |hmat AS MATERIALIZED (
       |  SELECT j, k,
       |    CAST(v + CASE WHEN j = k THEN $ridge ELSE 0 END AS BIGINT) AS v
       |  FROM (SELECT a.j, b.j AS k, CAST(SUM(a.v * b.v) AS BIGINT) AS v
       |        FROM fx a JOIN fx b USING (doc) GROUP BY 1, 2)),
       |hdiag AS MATERIALIZED (SELECT j, v AS d FROM hmat WHERE j = k),
       |bvec AS MATERIALIZED (
       |  SELECT f.j, CAST(SUM(f.v * t.t) AS BIGINT) AS b
       |  FROM fx f JOIN tvec t USING (doc) GROUP BY 1),
       |w0 AS (SELECT CAST(j AS INT) AS j, CAST(0 AS BIGINT) AS w
       |  FROM range(0, $dim1) t(j)),
       |hml AS MATERIALIZED (
       |  SELECT list(hrow ORDER BY j) AS hm FROM (
       |    SELECT a.j, list(COALESCE(h.v, 0) ORDER BY b.k) AS hrow
       |    FROM range(0, $dim1) a(j) CROSS JOIN range(0, $dim1) b(k)
       |    LEFT JOIN hmat h ON h.j = a.j AND h.k = b.k
       |    GROUP BY a.j)),
       |bdl AS MATERIALIZED (
       |  SELECT list(COALESCE(b.b, 0) ORDER BY r.j) AS bl,
       |         list($damp * GREATEST(COALESCE(d.d, 1), 1) ORDER BY r.j) AS dl
       |  FROM range(0, $dim1) r(j)
       |  LEFT JOIN bvec b ON b.j = r.j
       |  LEFT JOIN hdiag d ON d.j = r.j),
       |v0 AS (SELECT list_transform(range(0, $dim1),
       |  x -> CAST(0 AS BIGINT)) AS wv),
       |$roundCtes,
       |$taps""".stripMargin
  }

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")
}
