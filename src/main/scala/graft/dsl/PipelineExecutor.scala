package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.immutable.ListMap

/** Internal per-table compile state. `df` retains temp fields and the
  * hidden row-ordinal column until relationships are bound; the public
  * accessors project them away. `keys` is the merge key (joinOn), used to
  * skip redundant dedup shuffles when a link targets the merge key.
  */
private[dsl] final case class TableState(
    df: DataFrame,
    visible: Seq[String],
    temps: Seq[String],
    keys: Seq[String] = Nil) {
  /** Rows in traversal arrival order — a global sort; opt-in via
    * `PipelineResult.tableOrdered` (reference-parity compares only). */
  def ordered: DataFrame =
    df.orderBy(col(PipelineExecutor.RowOrd)).select(visible.map(col): _*)
  /** Rows with no ordering promise — the default for `table()`/`write()`:
    * at cluster scale a per-table global sort is a range-partition
    * exchange + full sort that sinks and set-oriented consumers never
    * need. */
  def unordered: DataFrame = df.select(visible.map(col): _*)
}

private[dsl] object PipelineExecutor {
  val RowOrd = "__g_row_ord"
  private[dsl] def presCol(f: String) = s"__g_p_$f"
  private[dsl] def applyErrCol(f: String) = s"__g_ae_$f"
}

/** Compiles the recorded pipeline into DataFrame plans and materializes
  * per-table results (reference lifecycle: SURVEY §3.1 steps 3-5).
  *
  * Scale notes: each emission is a narrow explode chain over its root; the
  * keyed merge is the single shuffle per table (hash aggregate with
  * map-side partials); `link_to` compiles to an equi-join Catalyst can
  * broadcast; `build_index` is collected on the driver exactly like the
  * reference's dict index, but consumed as a broadcast map literal.
  */
private[dsl] final class PipelineExecutor(
    roots: Seq[DataFrame],
    emissions: Seq[EmissionSpec],
    links: Seq[LinkSpec],
    backlinks: Seq[BacklinkSpec],
    indexes: Seq[IndexSpec],
    deterministicIds: Boolean,
    failFast: Boolean = false,
    telemetry: Telemetry = Telemetry.Noop) {
  import PipelineExecutor._

  // backlink parent caches — handed to PipelineResult so a full write can
  // release them once the plans have materialized (ADVICE r3: stacked
  // backlinks onto one parent otherwise pin successive copies all session)
  private val cachedHandles = scala.collection.mutable.Buffer.empty[DataFrame]

  def execute(): PipelineResult = {
    val lookupMaps = buildIndexes()

    // ---- compile emissions, grouped per table in declaration order ----
    val byTable = ListMap(emissions.zipWithIndex.groupBy(_._1.table).toSeq
      .sortBy(_._2.head._2): _*)

    var errorDfs = ListMap.empty[String, DataFrame]
    val tableStates = byTable.map { case (table, specs) =>
      telemetry.safeEvent("MapStarted", table)
      var (state, unioned, applyErrors) = mergeTable(table, specs, lookupMaps)
      // validation (reference §2.7): declared schema → try_cast split;
      // error mode is per-table when declared (fluent.py:531-576), else
      // the pipeline default
      // a silently-ignored second schema would skip its validations
      val declaredSchemas = specs.flatMap(_._1.schema).distinct
      require(declaredSchemas.size <= 1,
        s"emissions into '$table' declare conflicting schemas: " +
          declaredSchemas.map(_.simpleString).mkString(" vs "))
      val declaredModes = specs.flatMap(_._1.errors).distinct
      require(declaredModes.size <= 1,
        s"emissions into '$table' declare conflicting error modes: " +
          declaredModes.mkString(", "))
      val mode = declaredModes.headOption.getOrElse(
        if (failFast) ErrorMode.FailFast else ErrorMode.Collect)
      declaredSchemas.headOption.foreach { schema =>
        val keyCols =
          if (specs.head._1.joinOn.nonEmpty) specs.head._1.joinOn
          else Seq(RowOrd)
        // update-phase errors run per EMISSION row, before the merge, so a
        // bad value later overwritten by a good one still records its error
        // (instances.py:204-214 validates every update); the merged pass
        // only adds never-provided non-nullable nulls and the valid split
        // fields whose policy SYNTHESIZES merged values (a sum/fold can
        // fail the declared cast even when every input passed it)
        val synthFields = specs.flatMap(_._1.fields).filter(_.policy match {
          case MergePolicy.Add | MergePolicy.Append | MergePolicy.Extend => true
          case _: MergePolicy.Fold | _: MergePolicy.FromUdaf => true
          case _ => false
        }).map(_.name).toSet
        // Array-producing policies must declare an array type, and an
        // Append field holds a single ELEMENT pre-merge (Extend is already
        // array-wrapped at union alignment), so update-phase validates
        // Append against the element type — a scalar→array try_cast does
        // not even resolve, which crashed typed+Append pipelines outright.
        val elemOverride: Map[String, DataType] =
          specs.flatMap(_._1.fields)
            .filter(f => f.policy == MergePolicy.Append || f.policy == MergePolicy.Extend)
            .flatMap(f => schema.fields.find(_.name == f.name).map(f -> _))
            .flatMap { case (f, sf) =>
              sf.dataType match {
                case ArrayType(et, _) =>
                  if (f.policy == MergePolicy.Append) Some(f.name -> et) else None
                case other => throw new IllegalArgumentException(
                  s"field '${f.name}' in '$table' uses ${f.policy} (merges " +
                    s"to an array) but declares ${other.simpleString}; " +
                    "declare array<...>")
              }
            }.toMap
        val (castValid, mergedErrors) =
          Validation.validateMerged(table, state.df, keyCols, schema, presCol,
            synthFields)
        val updateErrors0 = Validation
          .validateUpdate(table, unioned, keyCols, schema, presCol, elemOverride)
          .unionByName(mergedErrors)
        val updateErrors = applyErrors.fold(updateErrors0)(updateErrors0.unionByName)
        val checks = specs.flatMap(_._1.finalizeChecks).distinct
        val (valid, allErrors) =
          if (checks.isEmpty) (castValid, updateErrors)
          else {
            val (finValid, finErrors) =
              Validation.finalizeValidate(table, castValid, keyCols, checks)
            (finValid, updateErrors.unionByName(finErrors))
          }
        if (mode == ErrorMode.FailFast) {
          val sample = allErrors.limit(5).collect()
            .map(r => s"${r.getString(1)}/${r.getString(2)}: ${r.getString(3)}")
          if (sample.nonEmpty)
            throw Validation.ValidationFailedException(table, sample.toSeq)
        }
        errorDfs += table -> allErrors
        state = state.copy(df = valid)
      }
      // applyValue failures surface even without a declared schema — the
      // reference propagates apply() exceptions regardless of validation
      if (declaredSchemas.isEmpty) applyErrors.foreach { errs =>
        if (mode == ErrorMode.FailFast) {
          val sample = errs.limit(5).collect()
            .map(r => s"${r.getString(1)}/${r.getString(2)}: ${r.getString(3)}")
          if (sample.nonEmpty)
            throw Validation.ValidationFailedException(table, sample.toSeq)
        }
        errorDfs += table -> errs
      }
      telemetry.safeEvent("MapCompleted", table)
      table -> state
    }

    // ---- relationships ----
    var states = tableStates
    links.foreach { l => states = bindLink(states, l) }
    backlinks.foreach { b => states = bindBacklink(states, b) }

    // child -> parents dependency graph (links + backlinks both make the
    // child depend on the parent existing first; for backlink the parent
    // table holds the references, so the CHILD must flush first)
    val deps: Map[String, Set[String]] =
      (links.map(l => l.childTable -> l.parentTable) ++
        backlinks.map(b => b.parentTable -> b.childTable))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

    new PipelineResult(states, deps, errorDfs, telemetry, deterministicIds,
      cachedHandles.toSeq)
  }

  // ---------------------------------------------------------------- emit

  /** Compile one emission into its row DataFrame: one row per surviving
    * traversal position, columns = every field + presence flag + full
    * ordinal (emission index, root index, traversal ord — so cross-
    * traversal and cross-root arrival order is total, fluent.py:1339-1371).
    */
  private def compileEmission(
      spec: EmissionSpec, emissionIdx: Int,
      lookupMaps: Map[String, Column]): DataFrame = {
    val (tdf, env0) = TraversalCompiler.compile(roots(spec.rootIndex), spec.levels)
    val env = env0.copy(lookupIndexes = lookupMaps)

    val fieldCols = spec.fields.flatMap { f =>
      f.transform match {
        case Transform.ApplyValue(u, inner) =>
          // one struct per row: value feeds the field, error feeds the
          // "apply"-phase error stream (deterministic udf → codegen CSE
          // runs f once even though both fields reference it)
          val s = u(TransformCompiler.compile(inner, env))
          Seq(
            s.getField("value").as(f.name),
            lit(true).as(presCol(f.name)),
            s.getField("error").as(applyErrCol(f.name)))
        case _ =>
          Seq(
            TransformCompiler.compile(f.transform, env).as(f.name),
            lit(true).as(presCol(f.name)))
      }
    }
    // head element packs (emission, root) so cross-traversal and cross-root
    // arrival order stays total; the rest is the per-level position array
    val ord = concat(
      array(lit((emissionIdx.toLong << 16) | spec.rootIndex.toLong)),
      col(TraversalCompiler.OrdCol)).as(RowOrd)

    var out = tdf.select(fieldCols :+ ord: _*)

    // null/"" in any join-key part drops the row (executor.py:189-190)
    spec.joinOn.foreach { k =>
      require(spec.fields.exists(_.name == k),
        s"joinOn('$k') is not a field of emission into '${spec.table}'")
      val c = col(k)
      out = out.filter(c.isNotNull && c.cast(StringType) =!= "")
    }
    out
  }

  /** Union all emissions for a table and apply the keyed merge.
    * @return (merged table state, pre-merge union of emission rows — one
    *         row per emission occurrence, with presence flags; the
    *         update-phase validation input)
    */
  private def mergeTable(
      table: String,
      specs: Seq[(EmissionSpec, Int)],
      lookupMaps: Map[String, Column]):
      (TableState, DataFrame, Option[DataFrame]) = {
    val compiled = specs.map { case (s, i) => (s, compileEmission(s, i, lookupMaps)) }

    // applyValue failure rows, collected per emission BEFORE alignment
    // drops the error-carrier columns (phase "apply"; see
    // Validation.applyErrorRows)
    val applyErrors = compiled.flatMap { case (s, df) =>
      val errCols = s.fields
        .filter(_.transform.isInstanceOf[Transform.ApplyValue])
        .map(f => f.name -> applyErrCol(f.name))
      if (errCols.isEmpty) None
      else {
        val keyCols = if (s.joinOn.nonEmpty) s.joinOn else Seq(RowOrd)
        Some(Validation.applyErrorRows(table, df, keyCols, errCols))
      }
    }.reduceOption(_.unionByName(_))

    // field universe in first-declaration order
    val fieldOrder = specs.flatMap(_._1.fields.map(_.name)).distinct
    // a field's merge policy must be declared consistently: the reference
    // attaches policies per (table, field) via the builder, so two
    // emissions disagreeing is a bug — first-wins would silently drop an
    // Add/Fold (joinOn and error-mode conflicts already throw; same rule)
    fieldOrder.foreach { f =>
      val ps = specs.flatMap(_._1.fields).filter(_.name == f).map(_.policy).distinct
      require(ps.size <= 1,
        s"emissions into '$table' declare conflicting merge policies for " +
          s"'$f': ${ps.mkString(", ")}")
    }
    val policies: Map[String, MergePolicy] = fieldOrder.map { f =>
      f -> specs.flatMap(_._1.fields).find(_.name == f).map(_.policy)
        .getOrElse(MergePolicy.LastWrite)
    }.toMap
    val fieldType: Map[String, DataType] = fieldOrder.map { f =>
      // emissions agreeing on the field's Spark type keep it; a MIXED-type
      // field aligns to Spark's tightest common type (int+long → long, the
      // widening any engine would do) and only an incompatible mix (e.g.
      // long+string) falls back to StringType — the schema-on-read common
      // denominator (the reference keeps dynamic values as-is; a declared
      // schema then try_casts per update, recording real error rows).
      // A plain cast to the first definer's type would THROW mid-job under
      // ANSI mode (Spark 4 default) or silently null the value with ANSI
      // off — either way bypassing the error channel.
      val ts = compiled.collect {
        case (s, df) if s.fields.exists(_.name == f) => df.schema(f).dataType
      }.distinct
      // findWiderTypeForTwo also covers what findTightestCommonType
      // returns None for — decimal precision mixes, int+decimal — so a
      // numerically-compatible mix widens instead of degrading to string
      val t = ts.reduce((a, b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCoercion
          .findWiderTypeForTwo(a, b).getOrElse(StringType))
      // Extend concatenates lists; a scalar-typed field contributes
      // single elements (instances.py:47-55), so its merged type is array
      f -> (policies(f) match {
        case MergePolicy.Extend if !t.isInstanceOf[ArrayType] => ArrayType(t)
        case _ => t
      })
    }.toMap
    // temp only if every emission defining the field marks it temp — a
    // real Field in one traversal keeps the column visible even when
    // another traversal uses it purely as a join key (fluent.py:1190-1198)
    val tempNames = fieldOrder.filter { f =>
      specs.flatMap(_._1.fields).filter(_.name == f).forall(_.temp)
    }

    val aligned = compiled.map { case (s, df) =>
      val defined = s.fields.map(_.name).toSet
      val cols = fieldOrder.flatMap { f =>
        if (defined(f)) {
          val raw = df.schema(f).dataType
          val base =
            if (policies(f) == MergePolicy.Extend && !raw.isInstanceOf[ArrayType])
              when(col(f).isNotNull, array(col(f))) // scalar → 1-list, null → skip
            else col(f)
          Seq(base.cast(fieldType(f)).as(f), col(presCol(f)))
        } else
          Seq(lit(null).cast(fieldType(f)).as(f), lit(false).as(presCol(f)))
      } :+ col(RowOrd)
      df.select(cols: _*)
    }
    val unioned = aligned.reduce(_.unionByName(_))

    val joinOn = specs.head._1.joinOn
    require(specs.forall(_._1.joinOn == joinOn),
      s"emissions into '$table' disagree on joinOn")

    val merged =
      if (joinOn.isEmpty) unioned
      else {
        // presence survives the merge (bool_or) so the merged-phase null
        // check can tell "never provided" from "provided as null" — the
        // latter is already an update-phase error
        val aggs = fieldOrder.filterNot(joinOn.contains).flatMap { f =>
          Seq(policies(f).agg(col(f), col(presCol(f)), col(RowOrd)).as(f),
            bool_or(col(presCol(f))).as(presCol(f)))
        } :+ min(col(RowOrd)).as(RowOrd)
        unioned.groupBy(joinOn.map(col): _*).agg(aggs.head, aggs.tail: _*)
      }

    // single-key tables get `id` injected from the key (executor.py:363-370)
    val (withId, visibleExtra) =
      if (joinOn.size == 1 && joinOn.head != "id" && !fieldOrder.contains("id"))
        (merged.withColumn("id", col(joinOn.head)), Seq("id"))
      else (merged, Nil)

    val visible = (fieldOrder ++ visibleExtra).filterNot(tempNames.contains)
    (TableState(withId, visible, tempNames, joinOn), unioned, applyErrors)
  }

  // --------------------------------------------------------------- links

  /** Many-to-one binding: left join child→parent, embed the parent row as
    * a struct column. The parent side is the reference's secondary dict
    * index (executor.py:408-422) — a broadcast hash join IS that index.
    */
  private def bindLink(
      states: ListMap[String, TableState], l: LinkSpec): ListMap[String, TableState] = {
    val child = states.getOrElse(l.childTable,
      throw new IllegalArgumentException(s"linkTo: unknown child table '${l.childTable}'"))
    val parent = states.getOrElse(l.parentTable,
      throw new IllegalArgumentException(s"linkTo: unknown parent table '${l.parentTable}'"))

    val linkKeys = l.by.values.toSeq.distinct
    val pKeyAliases = linkKeys.map(p => p -> s"__g_pk_$p").toMap
    // The reference's secondary index is a dict: one parent per key, last
    // write wins (relationships.py bind_relationships_via_index). When the
    // link key IS the parent's merge key it is already unique — skip the
    // dedup shuffle; otherwise reproduce the dict with max_by per key so a
    // non-unique link field never fans out child rows.
    val linkKeyIsMergeKey =
      parent.keys.nonEmpty && linkKeys.toSet == parent.keys.toSet
    val pSel =
      if (linkKeyIsMergeKey)
        parent.df.select(
          pKeyAliases.map { case (p, a) => col(p).as(a) }.toSeq :+
            struct(parent.visible.map(col): _*).as(l.as): _*)
      else
        parent.df
          .groupBy(linkKeys.map(p => col(p).as(pKeyAliases(p))): _*)
          .agg(max_by(struct(parent.visible.map(col): _*), col(RowOrd)).as(l.as))

    // fail HERE, naming the call — a duplicate column would otherwise
    // surface as AMBIGUOUS_REFERENCE at materialization, far from the
    // offending linkTo
    require(!child.df.columns.contains(l.as),
      s"linkTo('${l.parentTable}') would attach attr '${l.as}' but table " +
        s"'${l.childTable}' already has that column; pass as = \"...\"")

    val cond = l.by.map { case (cf, pf) =>
      child.df(cf) === pSel(pKeyAliases(pf))
    }.reduce(_ && _)

    val joined = child.df.join(pSel, cond, "left")
      .drop(pKeyAliases.values.toSeq: _*)
    states.updated(l.childTable,
      child.copy(df = joined, visible = child.visible :+ l.as))
  }

  /** Many-to-many backlink: explode the parent's key list (scalar coerced
    * to 1-list), join children, regroup preserving the LIST order (not
    * child order), attach as array-of-struct; unmatched ids are skipped
    * (relationships.py:368-458).
    */
  private def bindBacklink(
      states: ListMap[String, TableState], b: BacklinkSpec): ListMap[String, TableState] = {
    val parent = states.getOrElse(b.parentTable,
      throw new IllegalArgumentException(s"backlink: unknown parent '${b.parentTable}'"))
    val child = states.getOrElse(b.childTable,
      throw new IllegalArgumentException(s"backlink: unknown child '${b.childTable}'"))

    // The parent's merged table feeds the SAME plan twice (the exploded
    // key side and the final left join back), the two subtrees differ, so
    // ReuseExchange cannot dedupe them — uncached, the parent's keyed
    // merge shuffle would run twice per backlink action. Lazy cache
    // (memory-and-disk, LRU) shares one materialization; cost is one
    // parent-table copy for the session.
    val pdf = parent.df.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cachedHandles += pdf

    val listCol0 = pdf(b.parentListField)
    val listCol = pdf.schema(b.parentListField).dataType match {
      case _: ArrayType => listCol0
      case _ => when(listCol0.isNotNull, array(listCol0)) // scalar → 1-list
    }

    val exploded = pdf.select(
      col(RowOrd).as("__g_bk_pid"),
      posexplode(listCol).as(Seq("__g_bk_pos", "__g_bk_key")))

    val cSel = child.df.select(
      col(b.childField).as("__g_bk_ckey"),
      struct(child.visible.map(col): _*).as("__g_bk_row"))

    val matched = exploded.join(cSel,
      col("__g_bk_key") === col("__g_bk_ckey"), "inner")

    val agg = matched.groupBy(col("__g_bk_pid")).agg(
      transform(
        array_sort(collect_list(struct(
          col("__g_bk_pos").as("p"), col("__g_bk_row").as("r")))),
        x => x.getField("r")).as(b.attr))

    require(!pdf.columns.contains(b.attr),
      s"backlink would attach attr '${b.attr}' but table " +
        s"'${b.parentTable}' already has that column; pick another attr")
    val joined = pdf
      .join(agg, pdf(RowOrd) === agg("__g_bk_pid"), "left")
      .drop("__g_bk_pid") // attr stays null when no children matched
    states.updated(b.parentTable,
      parent.copy(df = joined, visible = parent.visible :+ b.attr))
  }

  // ------------------------------------------------------------- indexes

  /** Build lookup indexes: seeded maps stay literal; traversal-built ones
    * run a tiny collect (exactly the reference's driver-side dict,
    * fluent.py:1710-1747) and ship as a broadcast map literal — at scale
    * this is the "small dimension" pattern, not a data-sized collect.
    */
  private def buildIndexes(): Map[String, Column] = {
    indexes.map {
      case SeededIndex(name, entries) =>
        name -> mapLiteral(entries.toSeq)
      case TraversalIndex(name, rootIdx, levels, keyT, valueT) =>
        val (tdf, env) = TraversalCompiler.compile(roots(rootIdx), levels)
        val rows = tdf.select(
          TransformCompiler.compile(keyT, env).cast(StringType).as("k"),
          TransformCompiler.compile(valueT, env).as("v"),
          col(TraversalCompiler.OrdCol).as("o"))
          .filter(col("k").isNotNull)
          .collect()
        // last write per key wins (ordinal is array<long>, lexicographic)
        import scala.math.Ordering.Implicits.seqOrdering
        val entries = rows.sortBy(_.getSeq[Long](2).toSeq)
          .map(r => r.getString(0) -> r.get(1))
        name -> mapLiteral(ListMap(entries: _*).toSeq)
    }.toMap
  }

  private def mapLiteral(entries: Seq[(String, Any)]): Column = {
    // Spark 4 Columns are lazy: lit(Row) only blows up at ANALYSIS time,
    // far from the offending buildIndex — so validate the collected
    // values eagerly and name the bad entry here
    entries.find { case (_, v) => !isScalarLiteral(v) }.foreach { case (k, v) =>
      throw new IllegalArgumentException(
        s"buildIndex values must be scalar literals; entry '$k' is a " +
          s"${v.getClass.getSimpleName} — project a scalar in the value " +
          "transform (e.g. to_json for nested nodes)")
    }
    if (entries.isEmpty) lit(null).cast(MapType(StringType, StringType))
    else map(entries.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
  }

  private def isScalarLiteral(v: Any): Boolean = v == null || (v match {
    case _: String | _: java.lang.Boolean | _: java.lang.Byte |
         _: java.lang.Short | _: java.lang.Integer | _: java.lang.Long |
         _: java.lang.Float | _: java.lang.Double |
         _: java.math.BigDecimal | _: BigDecimal |
         _: java.sql.Date | _: java.sql.Timestamp |
         _: java.time.Instant | _: java.time.LocalDate => true
    case _ => false
  })
}

/** Per-table pipeline statistics (reference TableStats,
  * fluent.py:164-281): mapped/errors from the mapping+validation phase,
  * inserted/failed from the flush. [[PipelineResult.tableStats]] fills
  * the first two (no sink involved); [[PipelineResult.writeStats]]
  * fills all four in one flush pass. */
final case class TableStats(mapped: Long, errors: Long,
    inserted: Long = 0L, failed: Long = 0L)

object PipelineResult {
  private[dsl] val log = org.slf4j.LoggerFactory.getLogger(classOf[PipelineResult])

  /** Deterministic sequential auto-keys cost a single-partition global
    * window; that is acceptable exactly where everything already shares
    * one JVM — `local` / `local[...]` masters. Anywhere else (including
    * `local-cluster`, which spawns separate executor JVMs) the scalable
    * unique-id path is the sane default. */
  def deterministicKeysSafe(master: String): Boolean =
    master == "local" || master.startsWith("local[")
}

/** Materialized pipeline output (reference: PipelineResult,
  * fluent.py:164-281): per-table DataFrames in traversal arrival order,
  * plus the dependency graph for topologically-ordered loading.
  */
final class PipelineResult private[dsl] (
    states: ListMap[String, TableState],
    val deps: Map[String, Set[String]],
    errorDfs: ListMap[String, DataFrame] = ListMap.empty,
    telemetry: Telemetry = Telemetry.Noop,
    deterministicIds: Boolean = true,
    cachedHandles: Seq[DataFrame] = Nil) {

  def tableNames: Seq[String] = states.keys.toSeq

  /** Validation errors for one typed table: (table, key, field, error). */
  def errors(table: String): DataFrame = errorDfs.getOrElse(table,
    throw new IllegalArgumentException(s"no typed schema declared for '$table'"))

  /** All validation errors across typed tables. */
  def allErrors: Option[DataFrame] = errorDfs.values.reduceOption(_.unionByName(_))

  /** One Spark action for ALL tables and error streams: each side is
    * projected to a (table, kind) tag, unioned, and counted in a single
    * aggregate — a 20-table pipeline launches one job, not 40
    * (the per-table `count()` form re-ran every plan). */
  def tableStats: Map[String, TableStats] = {
    val tagged =
      states.toSeq.map { case (n, s) =>
        s.df.select(lit(n).as("__g_t"), lit("rows").as("__g_k")) } ++
      errorDfs.toSeq.map { case (n, e) =>
        e.select(lit(n).as("__g_t"), lit("errors").as("__g_k")) }
    val counts = tagged.reduceOption(_.unionByName(_))
      .map(_.groupBy(col("__g_t"), col("__g_k")).count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap)
      .getOrElse(Map.empty)
    states.map { case (n, _) =>
      n -> TableStats(
        counts.getOrElse((n, "rows"), 0L),
        counts.getOrElse((n, "errors"), 0L))
    }.toMap
  }

  private def state(name: String): TableState = states.getOrElse(name,
    throw new IllegalArgumentException(
      s"unknown table '$name'; have: ${tableNames.mkString(", ")}"))

  /** Final table: visible fields only, no row-order promise — like any
    * DataFrame. Sinks and set-oriented consumers don't pay a global sort
    * they never needed; use [[tableOrdered]] for reference-parity order. */
  def table(name: String): DataFrame = state(name).unordered

  /** Final table in traversal arrival order (the reference's dict
    * insertion order) — a global sort; use only where order is observed,
    * e.g. parity comparisons against the reference. */
  def tableOrdered(name: String): DataFrame = state(name).ordered

  /** Unkeyed table with its auto-generated row key exposed as `auto_key`
    * (reference: "__auto_N__" sequential per-table instance keys,
    * executor.py:181-196). Keyed tables carry their key in their own
    * columns — asking for an auto key there is an error.
    *
    * The key is computed HERE, not during the pipeline run: deterministic
    * mode is a row_number over the traversal ordinal — a single-partition
    * window, the price of exact sequential parity — and tables that never
    * observe their keys must not pay it. `scalableIds()` switches to
    * monotonically_increasing_id, which stays fully parallel and unique
    * (the right default on a cluster, where nothing should observe the
    * id's sequential shape).
    *
    * CONTRACT: sequential ids are only honored on a `local[...]` master
    * ([[PipelineResult.deterministicKeysSafe]]). On a cluster master the
    * keys silently become sparse unique ids (with a logged warning) —
    * code that relies on the dense 0..n-1 shape must not ship to a
    * cluster without calling `scalableIds()` and dropping that reliance. */
  def tableKeyed(name: String): DataFrame = {
    val s = state(name)
    require(s.keys.isEmpty,
      s"table '$name' is keyed on (${s.keys.mkString(", ")}); auto keys exist only for unkeyed tables")
    val master = s.df.sparkSession.sparkContext.master
    val deterministic =
      deterministicIds && PipelineResult.deterministicKeysSafe(master)
    if (deterministicIds && !deterministic)
      PipelineResult.log.warn(
        s"tableKeyed('$name'): deterministic auto-keys need a global " +
          s"single-partition window — on cluster master '$master' this is " +
          "a scale hazard, so scalable (unique, non-sequential) ids are " +
          "used instead; call scalableIds() to silence this warning")
    val keyExpr =
      if (deterministic)
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col(PipelineExecutor.RowOrd))) - 1
      else monotonically_increasing_id()
    s.df.select(s.visible.map(col) :+
      concat(lit("__auto_"), keyExpr.cast(StringType), lit("__"))
        .as("auto_key"): _*)
  }

  /** Typed view of a table — the reference's InstanceBuilder finalize
    * step (`Dataset[T]` with a case-class Encoder enforces the model
    * schema at compile time; combine with `mapToTyped` for value-level
    * validation). */
  def typed[T: org.apache.spark.sql.Encoder](name: String): org.apache.spark.sql.Dataset[T] =
    table(name).as[T]

  /** Table including temp fields and the hidden ordinal (for tests/links). */
  private[dsl] def raw(name: String): TableState = states(name)

  /** Per-table mapped-row counts — one Spark action total (delegates to
    * [[tableStats]] so the counting strategy lives in one place). */
  def stats: Map[String, Long] =
    tableStats.map { case (n, s) => n -> s.mapped }

  /** Parent-first flush order (reference: topological flush,
    * fluent.py:1584-1708 + utils.py:6-54). */
  def topoOrder: Seq[String] =
    GraphUtils.topologicalSort(states.keySet.toSet, deps)

  def components: Seq[Set[String]] =
    GraphUtils.weaklyConnectedComponents(states.keySet.toSet, deps)

  /** Write every table parent-first through `writer` — the JDBC/Delta sink
    * seam (`(table, df) => df.write.jdbc(...)`). */
  def write(writer: (String, DataFrame) => Unit): Unit = {
    topoOrder.foreach(flushOne(writer, _))
    unpersistCaches()
  }

  /** Write component by component: each weakly-connected component's
    * tables flush together (topo order inside the component) before the
    * next component starts — the reference's per-component flush/evict
    * cycle (fluent.py:1894-2027). Components run in the reference's
    * deterministic smallest-member order; cross-component ordering is
    * free because disconnected tables share no relationships by
    * definition. */
  def writeByComponent(writer: (String, DataFrame) => Unit): Unit = {
    components.foreach { comp =>
      GraphUtils.topologicalSort(comp, deps).foreach(flushOne(writer, _))
    }
    unpersistCaches()
  }

  /** Release the executor's backlink parent caches. Called automatically
    * after a full [[write]]/[[writeByComponent]] (the flushed plans have
    * materialized; the cached copies are dead weight from then on); call
    * directly if a pipeline is read via [[table]] only and discarded. A
    * later [[table]] call stays correct — it just recomputes. */
  def unpersistCaches(): Unit = cachedHandles.foreach(_.unpersist(false))

  private def flushOne(writer: (String, DataFrame) => Unit, t: String): Unit = {
    telemetry.safeEvent("FlushStarted", t)
    try { writer(t, table(t)); telemetry.safeEvent("FlushCompleted", t) }
    catch { case e: Throwable =>
      telemetry.safeEvent("FlushFailed", t, e.getMessage); throw e
    }
  }

  /** [[write]] with per-table written-row counts piggybacked on the flush
    * itself via `observe()` — the counts ride the write job, so a
    * 20-table pipeline reports inserted-row stats (reference
    * TableStats.inserted) with ZERO additional Spark jobs; `tableStats`
    * by contrast runs one (unioned) counting job of its own.
    *
    * The writer must run a SINK action on the DataFrame it is given
    * (`df.write...` — the JDBC/Delta/noop path): observe metrics ride
    * SQL command execution; an RDD-style `foreachPartition` bypasses the
    * collection point and would report 0. */
  def writeObserved(writer: (String, DataFrame) => Unit): Map[String, Long] = {
    val obs = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.Observation]
    write { (t, df) =>
      val o = new org.apache.spark.sql.Observation(s"graft_write_$t")
      obs(t) = o
      writer(t, df.observe(o, count(lit(1)).as("rows")))
    }
    obs.map { case (t, o) => t -> observedRows(t, o) }.toMap
  }

  // the write action already completed when this is read — metric delivery
  // is only an async listener hop away. A writer that never ran a SQL
  // action would block a bare .get forever; fail loud instead.
  private def observedRows(t: String, o: org.apache.spark.sql.Observation): Long = {
    val row =
      try scala.concurrent.Await.result(o.future,
        scala.concurrent.duration.Duration(30, "s"))
      catch { case _: java.util.concurrent.TimeoutException =>
        throw new IllegalStateException(
          s"writeObserved: writer for '$t' never ran a SQL action on the " +
            "observed DataFrame (observe metrics ride SQL command " +
            "execution; an RDD foreachPartition sink bypasses them)")
      }
    row.getAs[Long]("rows")
  }

  /** Full flush returning the reference's fused per-table statistics —
    * all four TableStats fields (fluent.py:164-281) for the cost of the
    * writes plus ONE counting job:
    *
    *   - `inserted` rides an `observe()` on each table's own write job
    *     (zero extra jobs; same sink contract as [[writeObserved]]);
    *     `mapped` for a flushed table IS that count — what reached the
    *     sink is what the mapping phase produced.
    *   - a table whose writer throws records inserted=0, failed=mapped
    *     and the flush CONTINUES with the remaining tables (the
    *     reference's error-collecting flush; inspect telemetry
    *     FlushFailed events for messages).
    *   - the one extra action counts every error stream and the mapped
    *     rows of failed tables together, exactly like [[tableStats]].
    */
  def writeStats(writer: (String, DataFrame) => Unit): Map[String, TableStats] = {
    val obs = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.Observation]
    val failedTables = scala.collection.mutable.Set.empty[String]
    topoOrder.foreach { t =>
      telemetry.safeEvent("FlushStarted", t)
      val o = new org.apache.spark.sql.Observation(s"graft_stats_$t")
      try {
        writer(t, table(t).observe(o, count(lit(1)).as("rows")))
        obs(t) = o
        telemetry.safeEvent("FlushCompleted", t)
      } catch { case scala.util.control.NonFatal(e) =>
        failedTables += t
        telemetry.safeEvent("FlushFailed", t, e.getMessage)
      }
    }
    unpersistCaches()
    val tagged =
      errorDfs.toSeq.map { case (n, e) =>
        e.select(lit(n).as("__g_t"), lit("errors").as("__g_k")) } ++
      failedTables.toSeq.map { n =>
        states(n).df.select(lit(n).as("__g_t"), lit("rows").as("__g_k")) }
    val counts = tagged.reduceOption(_.unionByName(_))
      .map(_.groupBy(col("__g_t"), col("__g_k")).count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap)
      .getOrElse(Map.empty[(String, String), Long])
    states.map { case (n, _) =>
      val errs = counts.getOrElse((n, "errors"), 0L)
      if (failedTables(n)) {
        val mapped = counts.getOrElse((n, "rows"), 0L)
        n -> TableStats(mapped, errs, 0L, mapped)
      } else {
        val ins = observedRows(n, obs(n))
        n -> TableStats(ins, errs, ins, 0L)
      }
    }.toMap
  }
}
