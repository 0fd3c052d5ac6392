package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-evolution reads for versioned corpora.
  *
  * A long-lived training corpus is re-exported every release, and the
  * schema drifts with it: columns get ADDED (v1 has no `source`),
  * types get WIDENED (`n_chars` int → bigint), and fields get RENAMED
  * (`body` → `text`). Re-reading v1+v2+v3 as one DataFrame is the
  * everyday operation this module makes declarative and SAFE:
  *
  *   - a DECLARED old→new rename map (never name-guessing),
  *   - missing target columns null-filled,
  *   - widening casts applied from an explicit allowlist
  *     (byte→short→int→long, float→double, int→double) — anything
  *     lossy (long→int, long→double past 2^53, string→int) is
  *     rejected at PLAN TIME,
  *   - any source column that maps to nothing in the target schema
  *     fails loud with the version tag and column name (silently
  *     dropping a column is how labels vanish between corpus
  *     releases).
  *
  * All validation happens driver-side at plan construction — parquet
  * footers carry the schema, so no data is scanned to reject a bad
  * mapping, and the per-version projections stay one codegen'd
  * `Project` over the parquet scan (column pruning and filter
  * pushdown reach the files untouched). Contrast with Spark's
  * built-in `mergeSchema=true`, which unions schemas positionally by
  * NAME only: it cannot rename, widens nothing (conflicting types
  * throw), and silently keeps extras — exactly the failure modes the
  * declared mapping exists to close.
  *
  * Scale shape: one parquet scan per version directory, zero
  * shuffles; the union is a plan-level concatenation, so partition
  * counts add and every downstream op sees one relation.
  */
object SchemaEvolution {

  /** Widening primitive casts that are exact for every representable
    * input value. Long→double is absent on purpose (lossy above 2^53),
    * as is everything narrowing — an evolved read must never change a
    * stored value. */
  private val widenings: Set[(DataType, DataType)] = Set(
    (ByteType, ShortType), (ByteType, IntegerType), (ByteType, LongType),
    (ByteType, DoubleType),
    (ShortType, IntegerType), (ShortType, LongType), (ShortType, DoubleType),
    (IntegerType, LongType), (IntegerType, DoubleType),
    (FloatType, DoubleType))

  /** Read versioned parquet directories as ONE DataFrame with the
    * target schema plus a `version` tag column.
    *
    * @param versions (versionTag, parquetPath) in the order the union
    *                 should stack them
    * @param renames  declared old→new column-name map, applied before
    *                 target matching; entries for columns a version
    *                 does not carry are simply inert there
    * @param target   the schema every version is projected onto
    * @param versionCol name of the appended provenance column
    */
  def evolvedRead(s: SparkSession, versions: Seq[(String, String)],
      renames: Map[String, String], target: StructType,
      versionCol: String = "version"): DataFrame = {
    require(versions.nonEmpty, "evolvedRead: need at least one version")
    // validate the declared mapping BEFORE touching any path: a typo'd
    // rename target should fail on the mapping, not on whichever
    // version directory happens to be read first
    val badRename = renames.valuesIterator
      .filterNot(target.fieldNames.contains).toSeq.sorted
    require(badRename.isEmpty,
      s"evolvedRead: rename targets not in the target schema: " +
        badRename.mkString(", "))
    versions.map { case (tag, path) =>
      conformTo(s.read.parquet(path), tag, renames, target, versionCol)
    }.reduce(_ unionByName _)
  }

  /** Project ONE version's frame onto the target schema through the
    * declared mapping — the per-version half of [[evolvedRead]],
    * public because it composes with STREAMING frames too (a
    * `readStream` per version directory, conformed then unioned, is
    * the live-ingest spelling of the versioned read; all validation
    * here is schema-level, so it runs identically at plan time for
    * batch and streaming plans). */
  def conformTo(raw: DataFrame, tag: String,
      renames: Map[String, String], target: StructType,
      versionCol: String = "version"): DataFrame = {
    require(!target.fieldNames.contains(versionCol),
      s"conformTo: target schema already has a '$versionCol' column")
    val badRename = renames.valuesIterator
      .filterNot(target.fieldNames.contains).toSeq.sorted
    require(badRename.isEmpty,
      s"conformTo: rename targets not in the target schema: " +
        badRename.mkString(", "))
    val renamed = renames.foldLeft(raw) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val have = renamed.schema.fields.map(f => f.name -> f.dataType).toMap
    // fail loud on unmapped extras: a column the target does not know
    // is either a rename the caller forgot to declare or data that
    // would silently vanish
    val unmapped = have.keys.filterNot(target.fieldNames.contains).toSeq.sorted
    if (unmapped.nonEmpty) sys.error(
      s"conformTo: version '$tag' carries columns not in the target " +
        s"schema and not renamed: ${unmapped.mkString(", ")} — declare " +
        "them in the rename map or extend the target schema")
    val cols = target.fields.map { f =>
      have.get(f.name) match {
        case Some(dt) if dt == f.dataType => col(f.name)
        case Some(dt) if widenings((dt, f.dataType)) =>
          col(f.name).cast(f.dataType).as(f.name)
        case Some(dt) => sys.error(
          s"conformTo: version '$tag' column '${f.name}' has type " +
            s"${dt.simpleString} which does not widen to target " +
            s"${f.dataType.simpleString} — refusing a lossy cast")
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    renamed.select(cols :+ lit(tag).as(versionCol): _*)
  }

  /** Stage the three-version fixture the `corpus_schema_evolution` gate
    * reads: three disjoint slices of `documents`, each written with the
    * PHYSICAL schema of a different corpus release. Eager overwrite at
    * plan-construction time, so the directory is pid-scoped by the
    * caller (single-writer contract, same as `Corpus.exportShards`).
    *
    *   - v1: `id` int (renamed + physically narrowed key), `body` (old
    *     name for text), `lang`, `n_chars` int — no `source` column
    *     (null-filled on read; a STRING so the oracle's NULL stringifies
    *     identically in both engines — numeric null-fill is covered by
    *     SchemaEvolutionSpec, where no pandas dtype coercion can differ)
    *   - v2: `doc_id` bigint, `text`, `lang`, `source`, `n_chars` int
    *     (widened on read)
    *   - v3: the current schema (doc_id, text, lang, source, n_chars)
    *
    * @return (tag, path) triples for [[evolvedRead]]
    */
  def stageVersionFixture(docs: DataFrame, baseDir: String): Seq[(String, String)] = {
    val v1 = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").cast("int").as("id"), col("text").as("body"),
        col("lang"), col("n_chars").cast("int").as("n_chars"))
    val v2 = docs.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars").cast("int").as("n_chars"))
    val v3 = docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
    Seq("v1" -> v1, "v2" -> v2, "v3" -> v3).map { case (tag, df) =>
      val path = s"$baseDir/$tag"
      df.write.mode("overwrite").parquet(path)
      tag -> path
    }
  }

  /** The target (newest-release) schema of the versioned fixture. */
  val FixtureTarget: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The declared rename map of the versioned fixture (v1's old names). */
  val FixtureRenames: Map[String, String] =
    Map("id" -> "doc_id", "body" -> "text")
}
