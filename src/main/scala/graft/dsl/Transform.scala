package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Value extractors evaluated against a traversal position — the engine's
  * expression layer (reference: transforms.py — `get`, `get_from_parent`,
  * `key`, `index`, `concat`, `format_id`, `coalesce`, `len_of`, `lookup`,
  * `apply`; fluent.py:82-161 — `node`, `parent_key`, `parent_index`).
  *
  * A Transform is a small AST compiled to a Catalyst [[Column]] against the
  * traversal's column environment ([[TraversalEnv]]), so every extractor
  * stays inside whole-stage codegen — nothing is interpreted per row.
  *
  * Null semantics follow the reference exactly: a missing key, out-of-bounds
  * index, or type mismatch anywhere along a path yields null, never an
  * error (transforms.py:10-25).
  */
sealed trait Transform

object Transform {
  /** Dot-path relative to the current node; digit segments index lists
    * (0-based). */
  final case class Get(path: String) extends Transform
  /** Dot-path from the root document. */
  final case class GetFromRoot(path: String) extends Transform
  /** Walk `depth` ancestors up (1 = immediate parent), then follow path
    * (empty path = the ancestor node itself). */
  final case class GetFromParent(path: String, depth: Int = 1) extends Transform
  /** Current dict iteration key (null when not iterating a map). */
  case object Key extends Transform
  /** Current list iteration index (null when not iterating a list). */
  case object Index extends Transform
  /** The whole current node. */
  case object Node extends Transform
  final case class ParentKey(depth: Int = 1) extends Transform
  final case class ParentIndex(depth: Int = 1) extends Transform
  final case class Literal(value: Any) extends Transform
  /** Stringify each part (null → ""), join with no separator. */
  final case class ConcatParts(parts: Seq[Transform]) extends Transform
  /** Stringify, skip null AND empty string, join with `sep`. */
  final case class FormatId(parts: Seq[Transform], sep: String = "_") extends Transform
  /** First non-null. */
  final case class CoalesceT(parts: Seq[Transform]) extends Transform
  /** Length of list/map/string, else null. */
  final case class LenOf(t: Transform) extends Transform
  /** Escape hatch: arbitrary Column function over the compiled inner
    * column (reference `apply(func, t)` / `@transform`). Prefer built-in
    * `functions._` combinators here — they stay codegen'd; a `udf` works
    * but drops out of codegen. */
  final case class ApplyFn(f: Column => Column, t: Transform) extends Transform
  /** Value-level `apply(func, t)` parity (transforms.py:206-212): an
    * arbitrary typed Scala function over the EXTRACTED VALUE, built via
    * [[transforms.applyValue]]. `u` is the compiled udf producing a
    * `{value, error}` struct: a row where `f` throws carries the message
    * instead of killing the task, and the executor routes it through the
    * table's error mode (collect → error row with phase "apply",
    * fail_fast → run fails) — the reference's exception-propagation
    * semantics (tests/test_transforms.py:131-141) made columnar. */
  final case class ApplyValue(u: Column => Column, t: Transform) extends Transform
  /** Query a named broadcast index built with `buildIndex`. */
  final case class Lookup(indexName: String, key: Transform,
      default: Any = null) extends Transform
}

/** Column environment of one traversal position.
  *
  * `levels(i)` are the iteration levels outermost-first; each exposes the
  * node/key/index columns that `each()` produced at that level. `root` is
  * the un-exploded root document column, retained through all explodes (so
  * `get_from_root`/`get_from_parent` are column references, not joins).
  */
final case class TraversalEnv(
    root: (Column, DataType),
    levels: List[LevelCols],
    lookupIndexes: Map[String, Column] = Map.empty) {

  def current: LevelCols = levels.last

  /** Ancestor `depth` levels above the current node (depth >= 1). */
  def parent(depth: Int): Option[LevelCols] = {
    val idx = levels.size - 1 - depth
    if (idx >= 0) Some(levels(idx)) else None
  }
}

/** One iteration level's compiled columns. `key`/`index` are None when the
  * level did not iterate a map / list respectively. */
final case class LevelCols(
    node: Column,
    nodeType: DataType,
    key: Option[Column],
    index: Option[Column])

object TransformCompiler {
  import Transform._

  /** Null-safe nested path resolution, decided at analysis time against the
    * schema: a segment that cannot exist in the type yields lit(null)
    * (matching the reference's never-raise rule) instead of an
    * AnalysisException. Returns the column and its result type.
    */
  def resolvePath(start: Column, startType: DataType, path: String): (Column, DataType) = {
    if (path == null || path.isEmpty) return (start, startType)
    path.split("\\.").foldLeft((start, startType)) { case ((c, t), seg) =>
      step(c, t, seg)
    }
  }

  private def step(c: Column, t: DataType, seg: String): (Column, DataType) = t match {
    case s: StructType =>
      s.fields.find(_.name == seg) match {
        case Some(f) => (c.getField(seg), f.dataType)
        case None => (lit(null), NullType)
      }
    case a: ArrayType if seg.forall(_.isDigit) =>
      // element_at is 1-based; try_element_at nulls on out-of-bounds
      (try_element_at(c, lit(seg.toInt + 1)), a.elementType)
    case m: MapType =>
      (try_element_at(c, lit(seg).cast(m.keyType)), m.valueType)
    case _ => (lit(null), NullType)
  }

  /** Stringify with reference semantics: null stays null (callers decide),
    * booleans/"numbers" use Spark's cast-to-string. */
  private def asString(c: Column): Column = c.cast(StringType)

  def compile(t: Transform, env: TraversalEnv): Column = t match {
    case Get(path) =>
      resolvePath(env.current.node, env.current.nodeType, path)._1
    case GetFromRoot(path) =>
      resolvePath(env.root._1, env.root._2, path)._1
    case GetFromParent(path, depth) =>
      env.parent(depth) match {
        case Some(p) => resolvePath(p.node, p.nodeType, path)._1
        case None => lit(null)
      }
    case Key => env.current.key.getOrElse(lit(null).cast(StringType))
    case Index => env.current.index.getOrElse(lit(null).cast(IntegerType))
    case Node => env.current.node
    case ParentKey(depth) =>
      env.parent(depth).flatMap(_.key).getOrElse(lit(null).cast(StringType))
    case ParentIndex(depth) =>
      env.parent(depth).flatMap(_.index).getOrElse(lit(null).cast(IntegerType))
    case Literal(v) => lit(v)
    case ConcatParts(parts) =>
      concat(parts.map(p => coalesce(asString(compile(p, env)), lit(""))): _*)
    case FormatId(parts, sep) =>
      // concat_ws skips nulls natively; empty strings are nulled first
      concat_ws(sep, parts.map { p =>
        val s = asString(compile(p, env))
        when(s === "", lit(null)).otherwise(s)
      }: _*)
    case CoalesceT(parts) =>
      coalesce(parts.map(compile(_, env)): _*)
    case LenOf(inner) =>
      val c = compile(inner, env)
      typeOf(inner, env) match {
        case _: ArrayType | _: MapType =>
          // size() returns -1 for null input under legacy conf; guard it
          when(c.isNull, lit(null)).otherwise(size(c))
        case StringType => length(c)
        case s: StructType =>
          // a schema-inferred JSON object: len(dict) = its key count —
          // static under a struct, null for a null node (same convention
          // as struct auto-iteration, which emits the static keys)
          when(c.isNull, lit(null).cast(IntegerType))
            .otherwise(lit(s.fields.length))
        case _ => lit(null).cast(IntegerType)
      }
    case ApplyFn(f, inner) => f(compile(inner, env))
    case ApplyValue(u, inner) =>
      // value side only; compileEmission taps the same struct's error
      // field for the error stream (deterministic udf, so codegen CSE
      // evaluates f once per row)
      u(compile(inner, env)).getField("value")
    case Lookup(name, key, default) =>
      val index = env.lookupIndexes.getOrElse(name,
        throw new IllegalArgumentException(
          s"lookup('$name'): no such index; built indexes: ${env.lookupIndexes.keys.mkString(", ")}"))
      // index maps are built with string keys; normalize the probe side
      val looked = try_element_at(index, compile(key, env).cast(StringType))
      if (default == null) looked else coalesce(looked, lit(default))
  }

  /** Best-effort static type of a transform (used for LenOf dispatch). */
  def typeOf(t: Transform, env: TraversalEnv): DataType = t match {
    case Get(path) => resolvePath(env.current.node, env.current.nodeType, path)._2
    case GetFromRoot(path) => resolvePath(env.root._1, env.root._2, path)._2
    case GetFromParent(path, depth) =>
      env.parent(depth).map(p => resolvePath(p.node, p.nodeType, path)._2)
        .getOrElse(NullType)
    case Node => env.current.nodeType
    case Key | ParentKey(_) => StringType
    case Index | ParentIndex(_) => IntegerType
    case Literal(v) =>
      org.apache.spark.sql.catalyst.expressions.Literal(v).dataType
    case ConcatParts(_) | FormatId(_, _) => StringType
    case CoalesceT(parts) =>
      parts.map(typeOf(_, env)).find(_ != NullType).getOrElse(NullType)
    case LenOf(_) => IntegerType
    case ApplyFn(_, _) | ApplyValue(_, _) => NullType // unknown statically
    case Lookup(_, _, _) => NullType
  }
}
