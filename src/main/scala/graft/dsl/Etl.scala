package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** An output field of an emission. Temp fields participate in join keys and
  * relationship captures but are dropped from the final table
  * (reference: Field/TempField, fluent.py:44-76).
  */
final case class Field(
    name: String,
    transform: Transform,
    temp: Boolean = false,
    policy: MergePolicy = MergePolicy.LastWrite)

/** Transform constructors — import graft.dsl.transforms._ for the fluent
  * vocabulary (mirrors the reference's transforms.py public surface).
  */
object transforms {
  import Transform._
  import scala.language.implicitConversions
  import scala.reflect.runtime.universe
  def get(path: String): Transform = Get(path)
  def getFromRoot(path: String): Transform = GetFromRoot(path)
  def getFromParent(path: String, depth: Int = 1): Transform = GetFromParent(path, depth)
  def key(): Transform = Key
  def index(): Transform = Index
  def node(): Transform = Node
  def parentKey(depth: Int = 1): Transform = ParentKey(depth)
  def parentIndex(depth: Int = 1): Transform = ParentIndex(depth)
  def literal(v: Any): Transform = Literal(v)
  def concatT(parts: Transform*): Transform = ConcatParts(parts)
  def formatId(parts: Transform*): Transform = FormatId(parts)
  def formatIdSep(sep: String, parts: Transform*): Transform = FormatId(parts, sep)
  def coalesceT(parts: Transform*): Transform = CoalesceT(parts)
  def lenOf(t: Transform): Transform = LenOf(t)
  def applyFn(f: Column => Column, t: Transform): Transform = ApplyFn(f, t)

  /** A row where `f` throws yields a null value plus an error routed
    * through the table's error mode (collect → error row, phase "apply";
    * fail_fast → the run fails) — the reference's `apply(func, t)` with
    * exception propagation (transforms.py:206-212). A null extracted
    * value reaches `f` as-is for reference types (match the Python func
    * seeing None — handle or throw); for primitive `A` Spark's typed-udf
    * null contract yields a null value without calling `f`. */
  def applyValue[A: universe.TypeTag, B: universe.TypeTag](
      f: A => B, t: Transform): Transform = {
    val u = udf((a: A) =>
      try ApplyOut[B](Some(f(a)), None)
      catch {
        case scala.util.control.NonFatal(e) =>
          ApplyOut[B](None, Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      })
    ApplyValue(c => u(c), t)
  }
  /** The {value, error} carrier [[applyValue]]'s udf emits. */
  final case class ApplyOut[B](value: Option[B], error: Option[String])
  def lookup(index: String, k: Transform, default: Any = null): Transform =
    Lookup(index, k, default)

  implicit def pairToField(p: (String, Transform)): Field = Field(p._1, p._2)
  def temp(p: (String, Transform)): Field = Field(p._1, p._2, temp = true)
  def withPolicy(p: (String, Transform), policy: MergePolicy): Field =
    Field(p._1, p._2, policy = policy)
}

/** Validation error handling for one table (reference: ErrorMode,
  * fluent.py:531-576 — per-`map_to` override of the pipeline default).
  */
sealed trait ErrorMode
object ErrorMode {
  /** Throw on the first validation error. */
  case object FailFast extends ErrorMode
  /** Route bad rows to the error side-channel, keep processing. */
  case object Collect extends ErrorMode
}

private[dsl] final case class EmissionSpec(
    table: String,
    rootIndex: Int,
    levels: Seq[IterationLevel],
    fields: Seq[Field],
    joinOn: Seq[String],
    schema: Option[StructType] = None,
    errors: Option[ErrorMode] = None,
    finalizeChecks: Seq[(String, Column)] = Nil)

private[dsl] final case class LinkSpec(
    childTable: String,
    parentTable: String,
    by: Map[String, String], // child field -> parent field
    as: String)

private[dsl] final case class BacklinkSpec(
    parentTable: String,
    childTable: String,
    attr: String,
    parentListField: String,
    childField: String)

private[dsl] sealed trait IndexSpec { def name: String }
private[dsl] final case class SeededIndex(name: String, entries: Map[String, Any]) extends IndexSpec
private[dsl] final case class TraversalIndex(
    name: String, rootIndex: Int, levels: Seq[IterationLevel],
    keyT: Transform, valueT: Transform) extends IndexSpec

/** Fluent JSON-to-relational pipeline builder — the engine's core operator
  * (reference: fluent.py `etl(...).goto().each().map_to().link_to()
  * .run()`), re-expressed as a compiler onto DataFrame plans:
  *
  *   - navigation/iteration  → select/posexplode chains  (Traversal.scala)
  *   - field extraction      → Catalyst Column expressions (Transform.scala)
  *   - keyed row merge       → union + hash aggregate with ordinal-ordered
  *                             merge functions (MergePolicy.scala)
  *   - link_to               → broadcast-able left equi-join
  *   - backlink              → posexplode + join + ordered collect_list
  *   - build_index/lookup    → driver-collected broadcast map literal
  *
  * Everything compiles to declarative plans; Catalyst supplies pushdown,
  * pruning and join strategy. At cluster scale the only shuffles are the
  * keyed merges and non-broadcast joins — exactly the operations that
  * genuinely need data movement.
  */
final class Etl private (
    roots: Seq[DataFrame],
    currentRoot: Int,
    levels: Vector[IterationLevel],
    pendingPath: Vector[String],
    emissions: Vector[EmissionSpec],
    links: Vector[LinkSpec],
    backlinks: Vector[BacklinkSpec],
    indexes: Vector[IndexSpec],
    deterministicIds: Boolean,
    eagerTables: Set[String] = Set.empty) {

  private def copyWith(
      currentRoot: Int = currentRoot,
      levels: Vector[IterationLevel] = levels,
      pendingPath: Vector[String] = pendingPath,
      emissions: Vector[EmissionSpec] = emissions,
      links: Vector[LinkSpec] = links,
      backlinks: Vector[BacklinkSpec] = backlinks,
      indexes: Vector[IndexSpec] = indexes,
      deterministicIds: Boolean = deterministicIds,
      eagerTables: Set[String] = eagerTables): Etl =
    new Etl(roots, currentRoot, levels, pendingPath, emissions, links,
      backlinks, indexes, deterministicIds, eagerTables)

  // ---- navigation (reference fluent.py:403-479) ----

  /** Append dot-path segments to the current navigation path. */
  def goto(path: String): Etl =
    copyWith(pendingPath = pendingPath ++ path.split("\\.").filter(_.nonEmpty))

  /** Jump to root `i` and reset navigation state (fluent.py:403-430). */
  def root(i: Int = 0): Etl = {
    require(i >= 0 && i < roots.size, s"no root $i (have ${roots.size})")
    copyWith(currentRoot = i, levels = Vector.empty, pendingPath = Vector.empty)
  }

  /** Iterate the container at the current path: lists → elements with
    * `index()`, maps → values with `key()`, null → nothing. */
  def each(): Etl =
    copyWith(
      levels = levels :+ IterationLevel(pendingPath.mkString("."), IterMode.Auto),
      pendingPath = Vector.empty)

  /** Map-only iteration (`items` mode). */
  def items(): Etl =
    copyWith(
      levels = levels :+ IterationLevel(pendingPath.mkString("."), IterMode.Items),
      pendingPath = Vector.empty)

  // ---- emission (reference fluent.py:531-576) ----

  /** Emit one row per traversal position into `table`. Rows sharing the
    * composite `joinOn` key merge field-wise (policies decide how); a
    * null/"" key part drops the row (executor.py:189-190).
    */
  /** Levels for an emission recorded at the current navigation state: a
    * trailing non-iterating level for any path after the last `each()`,
    * and the root document itself as one row when there was no iteration
    * at all (reference: singleton mapping, test_fluent_sqlalchemy.py).
    */
  private def effectiveLevels: Seq[IterationLevel] =
    if (pendingPath.nonEmpty)
      levels :+ IterationLevel(pendingPath.mkString("."), IterMode.Single)
    else if (levels.isEmpty) Vector(IterationLevel("", IterMode.Single))
    else levels

  def mapTo(table: String, joinOn: Seq[String] = Nil)(fields: Field*): Etl =
    copyWith(emissions = emissions :+
      EmissionSpec(table, currentRoot, effectiveLevels, fields, joinOn))

  /** Typed emission: declares the table's schema (the reference's model
    * class). Unknown fields fail at compile time with a did-you-mean
    * suggestion; values that don't conform are routed to the error
    * side-channel (collect mode) or fail the run (fail-fast).
    * @param errors per-table override of the pipeline error mode
    *               (fluent.py:531-576); null = inherit from `run(failFast=)`
    * @param finalizeChecks named row-level predicates evaluated on the
    *               MERGED row (the reference's whole-model finalize
    *               validation, instances.py:204-224 — distinct from the
    *               per-field update-time casts); failing rows land in
    *               the error side-channel with phase "finalize"
    */
  def mapToTyped(table: String, schema: StructType,
      joinOn: Seq[String] = Nil, errors: ErrorMode = null,
      finalizeChecks: Map[String, Column] = Map.empty)(fields: Field*): Etl = {
    Validation.checkFields(table,
      fields.filterNot(_.temp).map(_.name), schema)
    copyWith(emissions = emissions :+
      EmissionSpec(table, currentRoot, effectiveLevels, fields, joinOn,
        Some(schema), Option(errors), finalizeChecks.toSeq))
  }

  // ---- relationships (reference fluent.py:578-714) ----

  /** Many-to-one: embed the parent row as struct column `as` on the most
    * recently mapped table, matching child(by._1) == parent(by._2).
    * Missing parents are silently null (relationships.py:461-538).
    */
  def linkTo(parent: String, by: Map[String, String], as: String = null): Etl = {
    val child = emissions.lastOption.map(_.table).getOrElse(
      throw new IllegalStateException("linkTo before any mapTo"))
    val attr = Option(as).getOrElse(parent.stripSuffix("s"))
    copyWith(links = links :+ LinkSpec(child, parent, by, attr))
  }

  /** Many-to-many backlink: `parent.attr` becomes the array of child rows
    * matched by the parent's list field, in list order (fluent.py:642-714).
    */
  def backlink(parent: String, child: String, attr: String,
      by: (String, String)): Etl =
    copyWith(backlinks = backlinks :+
      BacklinkSpec(parent, child, attr, by._1, by._2))

  // ---- lookup indexes (reference fluent.py:481-529) ----

  /** Seed a named lookup index from a literal map. */
  def buildIndex(name: String, from: Map[String, Any]): Etl =
    copyWith(indexes = indexes :+ SeededIndex(name, from))

  /** Build a named lookup index from the current traversal (last write per
    * key wins, null keys skipped — fluent.py:1710-1747). */
  def buildIndex(name: String, key: Transform, value: Transform): Etl =
    copyWith(indexes = indexes :+
      TraversalIndex(name, currentRoot, effectiveLevels, key, value))

  /** Use monotonically-increasing ids instead of sequential row_number for
    * auto-keyed tables: keeps id assignment fully parallel at cluster
    * scale (uniqueness only — reference parity needs deterministic ids).
    */
  def scalableIds(): Etl = copyWith(deterministicIds = false)

  /** Mark tables as eagerly resident across streaming chunks (reference
    * `load_eager`, fluent.py:1292-1326). In graft the residency itself is
    * the broadcast-dimension pattern (close over a static DataFrame); the
    * declaration buys the reference's eager-boundary validation at
    * analysis time: eager tables must be mapped, an eager table cannot
    * depend on a non-eager parent, and backlinks cannot cross the eager
    * boundary.
    */
  def loadEager(tables: String*): Etl =
    copyWith(eagerTables = eagerTables ++ tables)

  /** Analysis-time checks for chunked streaming execution (reference
    * `_validate_streaming_pipeline`, fluent.py:1797-1829). */
  private[graft] def validateForStreaming(sequentialOnly: Boolean): Unit = {
    indexes.foreach {
      case _: TraversalIndex => throw new IllegalArgumentException(
        "traversal-based buildIndex() is not supported in streaming mode" +
          " — seed the index from a literal map or an eager dimension")
      case _ => ()
    }
    links.foreach { l =>
      if (l.by.size != 1) throw new IllegalArgumentException(
        s"streaming execution requires single-field by mappings on linkTo();" +
          s" got ${l.by.keys.mkString("(", ", ", ")")} for '${l.childTable}'")
    }
    if (sequentialOnly) {
      val multiRoot = emissions.map(_.rootIndex).filter(_ > 0).distinct.sorted
      if (multiRoot.nonEmpty) throw new IllegalArgumentException(
        s"pipeline references root index(es) ${multiRoot.mkString(", ")}, which" +
          " requires multi-root chunks, but this streaming source yields" +
          " sequential-only chunks — use foreachMultiRootChunk or drop the" +
          " root() calls")
    }
  }

  /** Cache the parsed root documents before compiling emissions. The
    * reference re-walks the whole JSON once per component
    * (executor.py:261-262 table_filter); with several emissions over one
    * root this trades memory for a single parse — SURVEY §4's explicit
    * improvement. Opt-in because a single-emission pipeline gains
    * nothing.
    */
  def cacheRoots(): Etl = {
    roots.foreach(_.cache())
    this
  }

  // ---- execution ----

  /** Compile and materialize the pipeline.
    * @param failFast throw on the first validation error instead of
    *                 collecting an error side-channel (reference error
    *                 modes, fluent.py:531-576)
    * @param telemetry phase-event callback (reference telemetry.py)
    */
  def run(failFast: Boolean = false,
      telemetry: Telemetry = Telemetry.Noop): PipelineResult = {
    Validation.validateEager(eagerTables,
      emissions.map(_.table).toSet,
      links.map(l => l.childTable -> l.parentTable),
      backlinks.map(b => b.parentTable -> b.childTable))
    new PipelineExecutor(roots, emissions, links, backlinks, indexes,
      deterministicIds, failFast, telemetry).execute()
  }
}

object Etl {
  def apply(roots: DataFrame*): Etl = {
    require(roots.nonEmpty, "at least one root required")
    new Etl(roots, 0, Vector.empty, Vector.empty, Vector.empty,
      Vector.empty, Vector.empty, Vector.empty, true)
  }

  /** Parse one JSON document string as a single root (multiLine JSON ≡ the
    * reference's in-memory dict root). Dynamic-key objects should use an
    * explicit schema with MapType (FIXTURES J3).
    */
  def json(spark: org.apache.spark.sql.SparkSession, doc: String,
      schema: StructType = null): Etl = {
    val ds = spark.createDataset(Seq(doc))(org.apache.spark.sql.Encoders.STRING)
    val df = if (schema == null) spark.read.option("multiLine", true).json(ds)
             else spark.read.schema(schema).json(ds)
    apply(df)
  }
}
