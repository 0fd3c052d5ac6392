package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Validation layer (reference §2.7: error modes, strict field check,
  * incremental vs finalize validation, PipelineResult stats).
  *
  * The reference validates row-at-a-time through Pydantic; here validation
  * is columnar: every declared field gets a `try_cast` — a value that
  * fails to cast yields an error row in a side-channel DataFrame while
  * processing continues ("collect" mode), or fails the run ("fail_fast").
  * The strict unknown-field check runs at compile time against the
  * declared schema, with a did-you-mean suggestion like the reference's
  * difflib hint (executor.py:310-333).
  */
object Validation {

  final case class UnknownFieldException(table: String, field: String,
      suggestion: Option[String], known: Seq[String])
    extends IllegalArgumentException(
      s"unknown field '$field' for table '$table'" +
        suggestion.map(s => s"; did you mean '$s'?").getOrElse("") +
        s" (known fields: ${known.mkString(", ")})")

  final case class ValidationFailedException(table: String, sampleErrors: Seq[String])
    extends RuntimeException(
      s"validation failed for table '$table' (fail-fast): ${sampleErrors.mkString("; ")}")

  /** Closest known field by edit distance ≤ 3 (the did-you-mean hint). */
  def closest(field: String, known: Seq[String]): Option[String] =
    known.map(k => k -> editDistance(field.toLowerCase, k.toLowerCase))
      .filter(_._2 <= 3).sortBy(_._2).headOption.map(_._1)

  private def editDistance(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Eager-boundary rules (reference `_validate_eager_tables`,
    * fluent.py:1292-1326): eager tables must be mapped; a backlink may
    * not cross the eager boundary; an eager table cannot depend on a
    * non-eager parent (its parents would be gone between chunks).
    * Analysis-time, before any job launches.
    *
    * @param linkDeps     (child, parent) per linkTo
    * @param backlinkRels (parentTable, childTable) per backlink
    */
  def validateEager(eager: Set[String], emissionTables: Set[String],
      linkDeps: Seq[(String, String)],
      backlinkRels: Seq[(String, String)]): Unit = {
    if (eager.isEmpty) return
    eager.foreach { t =>
      if (!emissionTables.contains(t))
        throw new IllegalArgumentException(
          s"loadEager('$t') requires a preceding mapTo() for that table")
    }
    backlinkRels.foreach { case (parent, child) =>
      if (eager.contains(parent) != eager.contains(child))
        throw new IllegalArgumentException(
          "backlink() cannot cross eager/non-eager boundaries; " +
            s"mark both '$parent' and '$child' as loadEager or neither")
    }
    // dependency edges: a linked child depends on its parent existing; a
    // backlink makes the parent depend on the child flushing first
    val deps = (linkDeps ++ backlinkRels.map { case (p, c) => (p, c) })
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    deps.foreach { case (child, parents) =>
      if (eager.contains(child)) {
        val nonEager = parents -- eager
        if (nonEager.nonEmpty)
          throw new IllegalArgumentException(
            s"loadEager table '$child' cannot depend on non-eager parent(s): " +
              nonEager.toSeq.sorted.mkString(", "))
      }
    }
  }

  /** Strict-field check: every emitted field must appear in the declared
    * schema. Runs before any job is launched (analysis-time, like a
    * schema mismatch in `.as[T]`). */
  def checkFields(table: String, emitted: Seq[String], schema: StructType): Unit = {
    val known = schema.fieldNames.toSeq
    emitted.foreach { f =>
      if (!known.contains(f))
        throw UnknownFieldException(table, f, closest(f, known), known)
    }
  }

  /** Per-field error expression: cast failure (non-null in, null out) or
    * non-nullable null. Null when the field passes. */
  private def fieldError(f: StructField): Column = {
    val c = col(f.name)
    val cast = c.try_cast(f.dataType)
    val castErr = when(c.isNotNull && cast.isNull,
      concat(lit(s"cannot cast to ${f.dataType.simpleString}: "), c.cast(StringType)))
    if (f.nullable) castErr
    else coalesce(castErr,
      when(c.isNull, lit("null value for non-nullable field")))
  }

  /** Collapse per-field error structs into error rows
    * (table, key, field, error, phase). */
  private def errorRows(table: String, df: DataFrame, keyCols: Seq[String],
      errCols: Seq[Column], phase: String): DataFrame =
    df.withColumn("__g_errs", filter(array(errCols: _*), e => e.isNotNull))
      .filter(size(col("__g_errs")) > 0)
      .select(
        lit(table).as("table"),
        concat_ws("|", keyCols.map(k => col(k).cast(StringType)): _*).as("key"),
        explode(col("__g_errs")).as("e"))
      .select(col("table"), col("key"),
        col("e.field").as("field"), col("e.error").as("error"),
        lit(phase).as("phase"))

  /** Per-row `applyValue` failures of one emission → error rows with
    * phase "apply" (reference: `apply(func, t)` exceptions,
    * transforms.py:206-212). `errCols` maps field name → the emission's
    * error-carrier column.
    */
  def applyErrorRows(table: String, df: DataFrame, keyCols: Seq[String],
      errCols: Seq[(String, String)]): DataFrame =
    errorRows(table, df, keyCols,
      errCols.map { case (field, c) =>
        when(col(c).isNotNull,
          struct(lit(field).as("field"), col(c).as("error"))).as(s"__e_$field")
      }, "apply")

  /** Update-phase validation over the PRE-merge emission rows: every
    * emission occurrence validates the fields it actually provided
    * (presence-gated), so a bad value later overwritten by a good one
    * still records its error — the reference validates each field on
    * every update (instances.py:204-214). One narrow pass, no shuffle.
    *
    * @param pres field name → presence-flag column name
    */
  /** @param elemOverride per-field pre-merge validation type override:
    *         an Append field's emission rows hold single ELEMENTS, so they
    *         validate against the declared array's element type here. */
  def validateUpdate(table: String, df: DataFrame, keyCols: Seq[String],
      schema: StructType, pres: String => String,
      elemOverride: Map[String, DataType] = Map.empty): DataFrame = {
    val declared = schema.fields.filter(f => df.columns.contains(f.name))
    val errCols: Seq[Column] = declared.toSeq.map { f0 =>
      val f = elemOverride.get(f0.name)
        .map(et => f0.copy(dataType = et)).getOrElse(f0)
      val provided =
        if (df.columns.contains(pres(f.name))) col(pres(f.name)) else lit(true)
      val err = fieldError(f)
      when(provided && err.isNotNull,
        struct(lit(f.name).as("field"), err.as("error"))).as(s"__e_${f.name}")
    }
    errorRows(table, df, keyCols, errCols, "update")
  }

  /** Split a MERGED table into (validated rows, error rows).
    *
    * The valid side keeps rows whose merged values all conform, with the
    * declared casts applied. The error side emits (a) fields that were
    * never provided by any emission and are non-nullable null, and (b)
    * for `synthFields` — fields whose merge policy SYNTHESIZES values
    * (Add/Append/Extend/Fold/FromUdaf) — merged values that fail the
    * declared cast, labeled phase "merge". Pass-through policies
    * (LastWrite/Min/Max/FirstNonNull) always keep one of the provided
    * values, which [[validateUpdate]] already checked; synthesized values
    * (e.g. a sum overflowing the declared int) exist in no emission, so
    * without (b) such a row would vanish from BOTH the table and the
    * error stream.
    */
  def validateMerged(table: String, df: DataFrame, keyCols: Seq[String],
      schema: StructType, pres: String => String,
      synthFields: Set[String] = Set.empty): (DataFrame, DataFrame) = {
    val declared = schema.fields.filter(f => df.columns.contains(f.name))

    val allErrCols: Seq[Column] = declared.toSeq.map { f =>
      val err = fieldError(f)
      when(err.isNotNull,
        struct(lit(f.name).as("field"), err.as("error"))).as(s"__e_${f.name}")
    }
    val absentErrCols: Seq[Column] = declared.toSeq.map { f =>
      val absent =
        if (df.columns.contains(pres(f.name))) !coalesce(col(pres(f.name)), lit(false))
        else lit(false) // no presence flag ⇒ field was provided (e.g. join key)
      val err = fieldError(f)
      when(absent && err.isNotNull,
        struct(lit(f.name).as("field"), err.as("error"))).as(s"__e_${f.name}")
    }

    // (b): merged-value failures for synthesizing policies only — the
    // provided inputs were individually valid, so update-phase saw
    // nothing; presence-gated so a never-provided field stays in (a)
    val synthErrCols: Seq[Column] = declared.toSeq
      .filter(f => synthFields.contains(f.name)).map { f =>
        val provided =
          if (df.columns.contains(pres(f.name))) coalesce(col(pres(f.name)), lit(false))
          else lit(true)
        val err = fieldError(f)
        when(provided && err.isNotNull,
          struct(lit(f.name).as("field"), err.as("error"))).as(s"__e_${f.name}")
      }

    val base = errorRows(table, df, keyCols, absentErrCols, "update")
    val errors =
      if (synthErrCols.isEmpty) base
      else base.unionByName(errorRows(table, df, keyCols, synthErrCols, "merge"))

    val valid = df
      .withColumn("__g_errs", filter(array(allErrCols: _*), e => e.isNotNull))
      .filter(size(col("__g_errs")) === 0)
      .drop("__g_errs")
      .select(df.columns.map { c =>
        declared.find(_.name == c) match {
          case Some(f) => col(c).try_cast(f.dataType).as(c)
          case None => col(c)
        }
      }: _*)

    (valid, errors)
  }

  /** Finalize validation (reference: whole-model `model_validate` at
    * finalize, instances.py:204-224, executor.py:389-435): named row-level
    * predicates over the MERGED row — the second, separate error stream.
    * A null predicate result counts as a failure (three-valued logic must
    * not smuggle bad rows through).
    *
    * @return (rows passing every check, error rows with phase "finalize")
    */
  def finalizeValidate(table: String, df: DataFrame, keyCols: Seq[String],
      checks: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    if (checks.isEmpty) return (df, df.sparkSession.emptyDataFrame)
    val passes = checks.map { case (_, c) => coalesce(c, lit(false)) }
    val errCols = checks.map { case (name, c) =>
      when(!coalesce(c, lit(false)),
        struct(lit(name).as("field"),
          lit("finalize check failed").as("error")))
        .as(s"__f_$name")
    }
    val errors = errorRows(table, df, keyCols, errCols, "finalize")
    val valid = df.filter(passes.reduce(_ && _))
    (valid, errors)
  }
}
