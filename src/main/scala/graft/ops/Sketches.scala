package graft.ops

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass bounded-memory sketches — the cardinality and frequency
  * estimators a 100 TB profiling pass runs where exact answers would
  * shuffle the corpus (HyperLogLog: Flajolet et al. 2007; count-min:
  * Cormode & Muthukrishnan 2005).
  *
  * Both sketches here are DETERMINISTIC (md5-derived hash bits, no RNG)
  * and engine-exact: every register/counter is an integer, and the only
  * floating-point step — HLL's harmonic mean — sums exact powers of two
  * whose 53-bit mantissa span makes the double sum order-independent,
  * then applies one fixed shape of correctly-rounded ops. An oracle can
  * therefore reproduce the ESTIMATES bit-for-bit, not just bound them —
  * the estimator itself is under test, not only its error.
  *
  * Shape at scale: the corpus is scanned once; the shuffle carries
  * partial-aggregated (group, register) rows bounded by #groups × m
  * (HLL) or depth × width (CMS) — kilobytes of state per group no
  * matter the input size. That bounded state is also why both sketches
  * MERGE: register-wise max / counter-wise sum across shards, days, or
  * clusters.
  */
object Sketches {

  /** HLL registers per group: m = 1024 buckets (top 10 bits of a 48-bit
    * md5 prefix), register = max over items of (leading zeros of the
    * remaining 38 bits + 1). One partial-aggregated max per
    * (group, bucket).
    */
  private def hllRegisters(items: DataFrame, groupCol: String,
      itemCol: String): DataFrame =
    hllProject(items, itemCol)
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("m"))

  /** The per-item HLL update projection — `bucket` and `rho` columns
    * appended map-only, NO aggregation: exposed for streaming register
    * folds where the groupBy must carry a watermark window key
    * (`stream_ndv_watermark` groups by (event-time window, bucket) so
    * the state store can evict expired windows; the batch form's
    * groupBy lives in [[hllDistinct]]/[[hllSketch]]). */
  def hllProject(items: DataFrame, itemCol: String): DataFrame = {
    // the two appended columns would silently REPLACE same-named input
    // columns (withColumn semantics) — fail loud instead
    Seq("bucket", "rho").foreach(c => require(!items.columns.contains(c),
      s"hllProject: input already has a '$c' column; rename it — " +
        "hllProject appends its own 'bucket' and 'rho'"))
    val h = graft.functions.Md5PrefixLong
      .md5_prefix_long(col(itemCol).cast("string"), 12)
    val r = h % lit(1L << 38)
    // rho = leading zeros of the 38-bit remainder + 1; bin() has no
    // leading zeros in either engine, so length(bin(r)) = floor(log2)+1
    val rho = when(r === 0, lit(39))
      .otherwise(lit(39) - length(bin(r)))
    items.withColumn("bucket", shiftright(h, 38)).withColumn("rho", rho)
  }

  /** HLL distinct-count estimate per group, next to the exact NDV for
    * the report. Empty buckets contribute 2^0 = 1 to the harmonic sum
    * without materializing a bucket spine: sum_inv = (1024 - occupied)
    * + Σ 2^-register, every term an exact power of two (computed as
    * 1.0 / (1 << m) — shift, cast, divide are all exact), the total
    * spanning ≤ 50 mantissa bits so the double sum is exact in any
    * order. The raw HLL estimator only (no small-range linear-counting
    * correction: that needs ln, which is not correctly rounded across
    * libms — at the sketch's design scale the raw estimator is the
    * operative branch anyway).
    *
    * The exact-NDV column is the report's calibration at test scale; at
    * 100 TB a caller drops it and keeps the one-pass sketch.
    */
  def hllDistinct(items: DataFrame, groupCol: String,
      itemCol: String): DataFrame = {
    val est = hllEstimate(hllRegisters(items, groupCol, itemCol), groupCol)
    val exact = items.groupBy(col(groupCol))
      .agg(count_distinct(col(itemCol)).as("exact_ndv"))
    est.join(exact, groupCol)
  }

  /** The (group, bucket, register) table of [[hllDistinct]] exposed for
    * incremental pipelines: persist it per shard/day, then [[hllMerge]]
    * rolls shards up without rescanning items. */
  def hllSketch(items: DataFrame, groupCol: String,
      itemCol: String): DataFrame = hllRegisters(items, groupCol, itemCol)

  /** Merge HLL sketch tables register-wise (max) — the union sketch.
    * EXACT, not approximate-on-approximate: registers are max-folds of
    * item hashes, so max over shards equals the registers of the
    * concatenated input bit-for-bit (asserted by SketchesEventStateSpec).
    * One partial-aggregated max over #groups × 1024 rows per input —
    * the daily rollup touches sketches, never items.
    */
  def hllMerge(sketches: Seq[DataFrame], groupCol: String): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("m")).as("m"))
  }

  /** Estimate from a stored/merged register table — the second half of
    * [[hllDistinct]] without the exact-NDV calibration column. */
  def hllEstimate(regs: DataFrame, groupCol: String): DataFrame =
    regs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_occ"),
        sum(lit(1.0) /
            expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(m AS INT)) AS DOUBLE)"))
          .as("s_occ"))
      .withColumn("sum_inv",
        (lit(1024L) - col("n_occ")).cast("double") + col("s_occ"))
      .select(col(groupCol),
        floor(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(1024.0)) *
            lit(1048576.0) / col("sum_inv")).cast("long").as("est_ndv"))

  /** Pairwise cross-group OVERLAP estimates by sketch
    * inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), with the
    * union sketch the register-wise max ([[hllMerge]]'s exactness: the
    * union registers equal the concatenated input's bit-for-bit). The
    * 100 TB read: per-source/per-snapshot sketches are kilobyte
    * artifacts, so cross-corpus contamination/overlap profiles come
    * from stored registers without ever rescanning or joining the
    * item sets. The raw estimator's regime caveat applies doubly (a
    * difference of estimates); the exact-overlap column is the
    * test-scale calibration, dropped at deployment like
    * [[hllDistinct]]'s.
    *
    * Shape: one sketch pass (the [[hllDistinct]] shuffle), a BOUNDED
    * driver collect of the group names (#groups — the kmeans-centroid
    * collect contract; pairs become a LocalRelation, so no cartesian
    * ever enters the plan), two equi-joins fanning registers to
    * #pairs × 1024 rows, and one distinct-pair equi-join on the item
    * value for the calibration column (true intersection, not
    * hash-identity — test-scale only, dropped at deployment).
    *
    * `est_overlap` is the raw inclusion–exclusion value and may be
    * negative at small true overlaps — returned unclamped so the
    * calibration column tells the truth about the estimator.
    *
    * @return (ga, gb, est_a, est_b, est_union, est_overlap,
    *         exact_overlap) for every unordered group pair, ga < gb
    */
  def hllOverlap(items: DataFrame, groupCol: String,
      itemCol: String): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val regs = hllSketch(items, groupCol, itemCol).localCheckpoint(true)
    val est = hllEstimate(regs, groupCol)
    // bounded collect: #groups rows (sources/langs/snapshots)
    val gs = regs.select(col(groupCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    // '|' is the pair-key separator; a group name containing it would
    // silently mis-split after the union estimate
    gs.foreach(g => require(!g.contains("|"),
      s"hllOverlap: group name '$g' contains the reserved separator '|'"))
    val pairsDf = (for { a <- gs; b <- gs if a < b } yield (a, b))
      .toSeq.toDF("ga", "gb")
    val ra = pairsDf.join(regs.withColumnRenamed(groupCol, "ga"), "ga")
    val rb = pairsDf.join(regs.withColumnRenamed(groupCol, "gb"), "gb")
    val estU = hllEstimate(
      ra.unionByName(rb)
        .groupBy(col("ga"), col("gb"), col("bucket"))
        .agg(max(col("m")).as("m"))
        .withColumn("__k", concat_ws("|", col("ga"), col("gb"))),
      "__k")
      .select(split(col("__k"), "\\|").getItem(0).as("ga"),
        split(col("__k"), "\\|").getItem(1).as("gb"),
        col("est_ndv").as("est_union"))
    // calibration joins on the item VALUE (not a hash prefix) so
    // exact_overlap is the true intersection — it's test-scale only,
    // so the wider string join key costs nothing that matters
    val itemsKeyed = items
      .select(col(groupCol).cast("string").as("g"),
        col(itemCol).cast("string").as("it"))
      .distinct()
    val exact = itemsKeyed.as("x")
      .join(itemsKeyed.as("y"), col("x.it") === col("y.it"))
      .filter(col("x.g") < col("y.g"))
      .groupBy(col("x.g").as("ga"), col("y.g").as("gb"))
      .agg(count(lit(1)).as("exact_overlap"))
    pairsDf
      .join(est.select(col(groupCol).cast("string").as("ga"),
        col("est_ndv").as("est_a")), "ga")
      .join(est.select(col(groupCol).cast("string").as("gb"),
        col("est_ndv").as("est_b")), "gb")
      .join(estU, Seq("ga", "gb"))
      .join(exact, Seq("ga", "gb"), "left")
      .select(col("ga"), col("gb"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_overlap"),
        coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"))
  }

  private val CmsDepth = 4
  private val CmsWidth = 1024

  /** The CMS bucket row for hash row `i`: 12 md5 hex chars per row,
    * folded mod width. */
  private def cmsBucket(itemHex: Column, i: Int): Column =
    conv(substring(itemHex, 1 + 3 * i, 3), 16, 10).cast("long") % CmsWidth

  /** Count-min heavy-hitter report: estimated counts for the true
    * top-k items, next to the true counts. The counter table is one
    * partial-aggregated count over (row, bucket) — depth × width = 4096
    * cells regardless of input size — and the probe side is the
    * bounded top-k, so the join is broadcast × k rows. The one-sided
    * error guarantee (est ≥ true, est ≤ true + εN with prob. 1 - δ) is
    * asserted by SketchesSpec; the oracle pins the exact cell values.
    */
  /** The (row, bucket, count) counter table — persist per shard/day and
    * roll up with [[cmsMerge]] without rescanning items. */
  def cmsSketch(items: DataFrame, itemCol: String): DataFrame =
    items
      .select(md5(col(itemCol).cast("string").cast("binary")).as("__h"))
      .select(posexplode(array((0 until CmsDepth).map(i =>
        cmsBucket(col("__h"), i)): _*)).as(Seq("i", "bucket")))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge CMS counter tables cell-wise (sum) — exact: counters are
    * count-folds, so summing shard sketches equals the union sketch
    * bit-for-bit (asserted by SketchesEventStateSpec). */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("i"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Sketch-based equi-join SIZE estimate — the pre-flight number that
    * decides broadcast vs shuffle vs salting BEFORE paying for the
    * join: `|A ⋈_k B| = Σ_k f_A(k)·f_B(k)`, estimated as the CMS inner
    * product `min_i Σ_b cmsA[i,b]·cmsB[i,b]` (the AGMS/CM sketch
    * identity: hashing keys into shared buckets preserves the
    * frequency inner product, collisions only ADD, so every depth row
    * — and hence the min — is a one-sided OVERestimate; the spec
    * asserts `est ≥ exact`). Against a self-join frequency vector this
    * is the co-occurrence pair-volume forecast for the dedup/graph
    * pair generators.
    *
    * Emits the exact size next to the estimate (the `hllDistinct`
    * est/exact gate convention): exact is affordable here and at any
    * SF (two partial-aggregated key counts + one equi join on distinct
    * keys), while the SKETCH is what a 100 TB planner keeps per
    * source/day — counter tables merge cell-wise ([[cmsMerge]]) so the
    * estimate never rescans history.
    *
    * Shape at scale: each sketch is one partial-aggregated count onto
    * 4×1024 cells; the inner product joins two ≤4096-row tables. The
    * exact side shuffles only the distinct-key count tables.
    *
    * @return one row: (est_pairs, exact_pairs)
    */
  def cmsJoinSize(a: DataFrame, aKey: String,
      b: DataFrame, bKey: String): DataFrame = {
    val sa = cmsSketch(a.select(col(aKey)), aKey)
    val sb = cmsSketch(b.select(col(bKey)), bKey)
      .select(col("i"), col("bucket"), col("cnt").as("cnt_b"))
    // densify over the depth spine: a depth row with ZERO overlapping
    // cells certifies the true join size is 0 and must reach the min as
    // ip = 0, not be dropped by the inner join (which would leave the
    // min over overlapping rows only — still one-sided, but looser than
    // CMS allows)
    val depths = a.sparkSession.range(CmsDepth.toLong)
      .select(col("id").cast("int").as("i"))
    val perDepth = sa.join(sb, Seq("i", "bucket"))
      .groupBy(col("i")).agg(sum(col("cnt") * col("cnt_b")).as("ip"))
    val est = depths.join(perDepth, Seq("i"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("est_pairs"))
    val fa = a.groupBy(col(aKey).as("k")).agg(count(lit(1)).as("fa"))
    val fb = b.groupBy(col(bKey).as("k")).agg(count(lit(1)).as("fb"))
    val exact = fa.join(fb, "k")
      .agg(coalesce(sum(col("fa") * col("fb")), lit(0L)).as("exact_pairs"))
    // two single-row sides — bounded-by-construction cross join
    est.crossJoin(broadcast(exact))
  }

  /** Log₂-bucket quantile sketch registers: one count per
    * (group, bucket) where bucket = `length(bin(v))` — floor(log₂ v)+1
    * computed exactly via the binary-string length (no float log, both
    * engines agree on every boundary). ≤ 64 buckets per group no matter
    * the input size; values must be non-negative integers (quantize
    * money to cents, durations to µs). Relative error of a reported
    * bound is at most 2× (one octave) — the SRE-histogram trade.
    */
  def quantileBuckets(df: DataFrame, groupCol: String,
      value: Column): DataFrame =
    // a negative value would bin() to 64 two's-complement chars and the
    // upper-bound shiftleft would wrap to 0 — fail loud, not quietly
    df.select(col(groupCol),
        when(value >= 0, length(bin(value)).cast("int"))
          .otherwise(raise_error(concat(
            lit("quantileBuckets: negative value "), value.cast("string"),
            lit(" — quantize to a non-negative integer first")))
            .cast("int")).as("bucket"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge stored [[quantileBuckets]] sketches — counts add, like the
    * CMS cells; per-day or per-shard sketches fold into the global one
    * with one #groups × 64-key aggregate. */
  def quantileMerge(groupCol: String, sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col(groupCol), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile estimates from a bucket sketch: for each requested
    * p (ppm), the smallest bucket whose cumulative count reaches
    * ceil(p·n) (decided by integer cross-multiplication: cum·10⁶ ≥ p·n)
    * and its inclusive upper bound 2^bucket − 1. The cumulative fold is
    * windows OVER THE SKETCH (≤ 64 rows per group — the bounded-input
    * exemption), and the p list expands map-only via explode.
    */
  def quantileEstimate(buckets: DataFrame, groupCol: String,
      pPpm: Seq[Long]): DataFrame = {
    require(pPpm.nonEmpty && pPpm.forall(p => p >= 1 && p <= 1000000),
      s"pPpm must be in [1, 1000000], got $pPpm")
    import org.apache.spark.sql.expressions.Window
    val wc = Window.partitionBy(col(groupCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wn = Window.partitionBy(col(groupCol))
    buckets
      .withColumn("cum", sum(col("cnt")).over(wc))
      .withColumn("n", sum(col("cnt")).over(wn))
      .withColumn("p_ppm", explode(array(pPpm.map(lit): _*)))
      .filter(col("cum") * lit(1000000L) >= col("p_ppm") * col("n"))
      .groupBy(col(groupCol), col("p_ppm"))
      .agg(min(col("bucket")).as("bucket"), max(col("n")).as("n"))
      .withColumn("upper_bound", expr("shiftleft(CAST(1 AS BIGINT), bucket) - 1"))
  }

  def cmsHeavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counters = cmsSketch(items, itemCol)
    val top = items.groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("item"))
      .limit(k)
    top
      .withColumn("__h", md5(col("item").cast("string").cast("binary")))
      .select(col("item"), col("true_count"),
        posexplode(array((0 until CmsDepth).map(i =>
          cmsBucket(col("__h"), i)): _*)).as(Seq("i", "bucket")))
      .join(broadcast(counters), Seq("i", "bucket"))
      .groupBy(col("item"), col("true_count"))
      .agg(min(col("cnt")).as("est_count"))
  }
}
