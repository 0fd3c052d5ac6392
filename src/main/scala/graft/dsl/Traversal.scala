package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** How one `each()` level iterates its container (reference:
  * core.py:176-231 modes auto/items/single; executor.py:24-103 for the
  * container dispatch).
  */
sealed trait IterMode
object IterMode {
  /** list → enumerate, map → entries, scalar/struct → single row,
    * null → no rows. */
  case object Auto extends IterMode
  /** map-only iteration (keys become `key()`). */
  case object Items extends IterMode
  /** treat the node as one row, no iteration (trailing `goto` after the
    * last `each()`). */
  case object Single extends IterMode
}

/** One navigation+iteration level: a dot-path relative to the previous
  * level's node, then an iteration mode. (reference: IterationLevel,
  * core.py:176-187; level-path diffing fluent.py:1107-1143)
  */
final case class IterationLevel(path: String, mode: IterMode)

/** Compiles a level chain into a DataFrame of traversal positions.
  *
  * The reference walks JSON with nested Python generators
  * (executor.py:24-177, one row at a time). Here each level becomes a
  * `posexplode` (arrays and maps) or a projection (single), so the whole
  * traversal is a narrow, codegen'd, fully parallel plan — no shuffle is
  * introduced until a keyed merge needs one.
  *
  * Output columns (all prefixed `__g_` to stay clear of user fields):
  *   - `__g_root`        the root document (struct of the source row)
  *   - `__g_l{i}_node` / `__g_l{i}_key` / `__g_l{i}_pos`  per level
  *   - `__g_ord`         traversal ordinal: `array<long>` of per-level
  *                       positions, so lexicographic array order ==
  *                       depth-first traversal arrival order (SURVEY §1.3 —
  *                       Spark operators are unordered, the ordinal makes
  *                       merge/order semantics deterministic). Packed longs,
  *                       not a padded digit string: the ordinal rides
  *                       through every merge shuffle and ordered aggregate,
  *                       so comparisons are long-compares instead of 30-60
  *                       byte string compares.
  */
object TraversalCompiler {
  val RootCol = "__g_root"
  val OrdCol = "__g_ord"

  /** @param root DataFrame whose rows are root documents.
    * @return traversal DataFrame + the environment for compiling transforms.
    */
  def compile(root: DataFrame, levels: Seq[IterationLevel]): (DataFrame, TraversalEnv) = {
    val rootType = StructType(root.schema.fields)
    // Seed the ordinal with a unique per-root-row id: a single-row root (the
    // reference's JSON-document model) gets [0]; multi-row roots (our
    // row-per-document extension) get (partition, row-in-partition) order,
    // which keeps row identity unique and arrival order source-shaped
    // without any shuffle or driver-side counter.
    var df = root.select(struct(root.columns.map(col): _*).as(RootCol))
      .withColumn(OrdCol, array(monotonically_increasing_id()))

    var env = TraversalEnv((col(RootCol), rootType), Nil)
    var curNode: (Column, DataType) = (col(RootCol), rootType)

    levels.zipWithIndex.foreach { case (level, i) =>
      val (target, targetType) =
        TransformCompiler.resolvePath(curNode._1, curNode._2, level.path)
      val nodeName = s"__g_l${i}_node"
      val keyName = s"__g_l${i}_key"
      val posName = s"__g_l${i}_pos"

      val (df2, lc) = (level.mode, targetType) match {
        case (_, NullType) =>
          // statically-missing path: the reference emits nothing
          // (executor.py:92-103); keep the schema shape but zero rows
          val d = df.withColumn(nodeName, lit(null)).filter(lit(false))
          (d, LevelCols(col(nodeName), NullType, None, None))

        case (IterMode.Single, t) =>
          val d = df.withColumn(nodeName, target)
          (d, LevelCols(col(nodeName), t, None, None))

        case (IterMode.Auto, a: ArrayType) =>
          val d = df
            .select(col("*"), posexplode(target).as(Seq(posName, nodeName)))
            .withColumn(OrdCol, concat(col(OrdCol), array(col(posName).cast(LongType))))
          (d, LevelCols(col(nodeName), a.elementType, None, Some(col(posName))))

        case (m, mt: MapType) if m == IterMode.Auto || m == IterMode.Items =>
          val d = df
            .select(col("*"),
              posexplode(target).as(Seq(posName, keyName, nodeName)))
            .withColumn(OrdCol, concat(col(OrdCol), array(col(posName).cast(LongType))))
          // index() is a LIST-iteration concept: dict iteration exposes
          // key() only (transforms.py:69-80 returns None for index here);
          // the pos column still feeds the ordinal above
          (d, LevelCols(col(nodeName), mt.valueType,
            Some(col(keyName).cast(StringType)), None))

        case (m, s: StructType) if m == IterMode.Items || m == IterMode.Auto =>
          // dict-iteration over a struct: the reference's auto mode
          // iterates any dict's items (executor.py:66-76), and JSON
          // objects land as structs under Spark's schema inference, so
          // Auto routes here too — a single-row fallback would silently
          // diverge from the reference on its own quickstart shapes.
          // Keys are statically known. A common value type iterates
          // as-is; heterogeneous field types (the reference iterates ANY
          // dict) coerce each value to its JSON text — atomic values via
          // cast, nested ones via to_json — so mixed-type objects work
          // straight off schema inference, no hand-written MapType needed.
          val common = s.fields.map(_.dataType).distinct
          val (valueOf, valueType): (StructField => Column, DataType) =
            if (common.length == 1)
              ((f: StructField) => target.getField(f.name), common.head)
            else
              ((f: StructField) => f.dataType match {
                case _: StructType | _: ArrayType | _: MapType =>
                  to_json(target.getField(f.name))
                case _ => target.getField(f.name).cast(StringType)
              }, StringType)
          // null node emits nothing (executor.py:92-103) — without the
          // guard a null struct would still yield its static keys
          val entries = when(target.isNotNull, map_from_arrays(
            array(s.fields.map(f => lit(f.name)): _*),
            array(s.fields.map(valueOf): _*)))
          val d = df
            .select(col("*"),
              posexplode(entries).as(Seq(posName, keyName, nodeName)))
            .withColumn(OrdCol, concat(col(OrdCol), array(col(posName).cast(LongType))))
          // as with MapType: dict iteration has a key(), never an index()
          (d, LevelCols(col(nodeName), valueType,
            Some(col(keyName)), None))

        case (IterMode.Auto, t) =>
          // scalar / struct under auto: single row, but null emits nothing
          // (executor.py:92-103)
          val d = df.withColumn(nodeName, target)
            .filter(col(nodeName).isNotNull)
          (d, LevelCols(col(nodeName), t, None, None))

        case (IterMode.Items, t) =>
          throw new IllegalArgumentException(
            s"items() over non-map type $t")
      }
      df = df2
      env = env.copy(levels = env.levels :+ lc)
      curNode = (env.levels.last.node, env.levels.last.nodeType)
    }
    (df, env)
  }
}
