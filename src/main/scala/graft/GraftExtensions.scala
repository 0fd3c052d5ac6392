package graft

import graft.functions.{DotProduct, HyperplaneBucket, QuantizeInt8, RollingHash, SortedIntersectCount, SortedIntersectSum, StripAccents, TextFunctions, TopKByScore}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions for every session built with
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * (Per-session registration on an existing session:
  * `GraftExtensions.registerAll(spark)`.)
  *
  *   - rolling_hash(text)                 → bigint fingerprint
  *   - dot_product(arr, arr)              → double (codegen'd loop)
  *   - quantize_int8(arr)                 → array<bigint> (floor·127/max|v|)
  *   - hyperplane_bucket(arr, planes)     → bigint LSH bucket id
  *   - top_k_by_score(score, id, k)       → array<struct<id,score>> agg
  *   - strip_accents(text)                → string (NFD, drop Mn marks)
  *   - sorted_intersect_sum(ak, aw, bk)   → bigint Σ aw over ak∩bk (sorted merge)
  *   - sorted_intersect_count(ak, bk)     → bigint |ak∩bk| (sorted merge)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $e")
  }

  /** Arity check with a real message — a bare cs(1) on a one-argument
    * call would die with IndexOutOfBounds deep inside analysis. */
  private def args(cs: Seq[Expression], n: Int, fn: String): Seq[Expression] = {
    require(cs.length == n, s"$fn expects $n argument(s), got ${cs.length}")
    cs
  }

  private[graft] val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> ((cs: Seq[Expression]) =>
      RollingHash(args(cs, 1, "rolling_hash").head, TextFunctions.FingerprintMod)),
    "dot_product" -> ((cs: Seq[Expression]) =>
      { val a = args(cs, 2, "dot_product"); DotProduct(a(0), a(1)) }),
    "quantize_int8" -> ((cs: Seq[Expression]) =>
      QuantizeInt8(args(cs, 1, "quantize_int8").head)),
    "hyperplane_bucket" -> ((cs: Seq[Expression]) =>
      { val a = args(cs, 2, "hyperplane_bucket")
        HyperplaneBucket(a(0), intLit(a(1), "hyperplane_bucket", "planes")) }),
    "top_k_by_score" -> ((cs: Seq[Expression]) =>
      { val a = args(cs, 3, "top_k_by_score")
        TopKByScore(a(0), a(1), intLit(a(2), "top_k_by_score", "k"))
          .toAggregateExpression() }),
    "strip_accents" -> ((cs: Seq[Expression]) =>
      StripAccents(args(cs, 1, "strip_accents").head)),
    "sorted_intersect_sum" -> ((cs: Seq[Expression]) =>
      { val a = args(cs, 3, "sorted_intersect_sum")
        SortedIntersectSum(a(0), a(1), a(2)) }),
    "sorted_intersect_count" -> ((cs: Seq[Expression]) =>
      { val a = args(cs, 2, "sorted_intersect_count")
        SortedIntersectCount(a(0), a(1)) }))

  /** Register every graft function on an already-built session. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
