package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus processing.
  * Everything is built from codegen'd Catalyst expressions (split,
  * higher-order functions, md5) — no UDFs — so the operators stay inside
  * whole-stage codegen and scale linearly with the scan.
  *
  * Where a function is used in a DuckDB-verified query, the construction
  * is chosen so both engines produce bit-identical results (left-assoc
  * fold order, explicit casts, pure integer arithmetic).
  */
object TextFunctions {

  /** Non-empty whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** SentencePiece-style pretokenization: the whitespace token stream
    * chunked into NON-overlapping runs of `window` tokens re-joined by
    * a single space (window = 1 ≡ [[tokens]]; the trailing chunk keeps
    * whatever tokens remain). A window > 1 makes the space a learnable
    * symbol — BPE merges can then cross word boundaries within a chunk,
    * the space-aware subword-vocabulary shape. Pure codegen'd
    * higher-order functions; the SQL-oracle spelling is
    * `range(1, len(ws)+1, window)` + list slicing. */
  def pretokens(text: Column, window: Int): Column = {
    require(window >= 1, s"window must be >= 1, got $window")
    if (window == 1) tokens(text)
    else {
      val ws = tokens(text)
      when(size(ws) >= 1,
        transform(sequence(lit(1), size(ws), lit(window)),
          i => array_join(slice(ws, i, lit(window)), " ")))
        .otherwise(array().cast("array<string>"))
    }
  }

  def uniqueTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** BPE-style pre-tokenization: letter runs, digit runs, and individual
    * punctuation marks each become a subtoken (the shape GPT-2's
    * pre-tokenizer produces before byte-pair merges). RE2-compatible
    * pattern so the SQL oracle computes the identical split. */
  val SubtokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def subtokens(text: Column): Column =
    regexp_extract_all(text, lit(SubtokenPattern), lit(0))

  def subtokenCount(text: Column): Column = size(subtokens(text))

  /** Distinct word n-gram shingles ("a b c"), 1 row per doc; empty array
    * when the doc has fewer than n tokens. */
  /** Shingles from a PRE-MATERIALIZED token column. The single source of
    * the n-gram construction — callers that must keep the token array in
    * its own projection (below a Generate barrier, see Dedup.shingleRows)
    * build on this so the shingle semantics cannot drift between the
    * inverted-index path and the per-row path. */
  def shinglesFromTokens(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      array_distinct(transform(
        sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*))))
      .otherwise(array().cast("array<string>"))

  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Ratio of tokens found in the stopword list (double division of two
    * exact ints — deterministic). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val ws = tokens(text)
    val stops = filter(ws, t => t.isInCollection(stopwords))
    when(size(ws) > 0, size(stops).cast("double") / size(ws).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Ratio of non [a-z0-9 space] characters. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[^a-z0-9 ]", "")))
        .cast("double") / length(text).cast("double"))
      .otherwise(lit(0.0))

  /** Mean token length (chars per token). */
  def meanTokenLength(text: Column): Column = {
    val ws = tokens(text)
    when(size(ws) > 0,
      aggregate(ws, lit(0), (acc, t) => acc + length(t)).cast("double") /
        size(ws).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Rolling polynomial fingerprint over the characters:
    * h = fold(h * 31 + code(c)) mod 1e9+7 — a stable document id usable
    * for cheap near-identity bucketing at any scale. Implemented as a
    * native codegen'd [[RollingHash]] expression (single byte loop, zero
    * allocation); [[fingerprintHof]] is the composable-functions
    * equivalent kept for cross-checking (identical for ASCII text).
    */
  val FingerprintMod = 1000000007L
  def fingerprint(text: Column): Column =
    RollingHash.rolling_hash(text, FingerprintMod)

  def fingerprintHof(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, c) => (acc * 31 + ascii(c)) % FingerprintMod)

  /** Marker-word language scores: count of tokens in each language's
    * marker list. `argmaxLang` picks the highest-scoring language,
    * alphabetic tie-break, "und" (undetermined) when all scores are 0 —
    * the classic cheap n-gram/stopword language-ID heuristic.
    */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(markers)))

  def argmaxLang(text: Column, profiles: Seq[(String, Seq[String])]): Column = {
    // struct max compares (score, prio): alphabetically-earliest language
    // gets the highest prio so it wins score ties
    val sorted = profiles.sortBy(_._1)
    val scored = sorted.zipWithIndex.map { case ((lang, markers), i) =>
      struct(
        langScore(text, markers).as("score"),
        lit(sorted.size - i).as("prio"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
