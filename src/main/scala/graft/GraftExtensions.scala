package graft

import graft.functions.{DotProduct, HyperplaneBucket, QuantizeInt8, RollingHash, TextFunctions, TopKByScore}
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

  private[graft] val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> ((cs: Seq[Expression]) =>
      RollingHash(cs.head, TextFunctions.FingerprintMod)),
    "dot_product" -> ((cs: Seq[Expression]) => DotProduct(cs(0), cs(1))),
    "quantize_int8" -> ((cs: Seq[Expression]) => QuantizeInt8(cs.head)),
    "hyperplane_bucket" -> ((cs: Seq[Expression]) =>
      HyperplaneBucket(cs(0), intLit(cs(1), "hyperplane_bucket", "planes"))),
    "top_k_by_score" -> ((cs: Seq[Expression]) =>
      TopKByScore(cs(0), cs(1), intLit(cs(2), "top_k_by_score", "k"))
        .toAggregateExpression()))

  /** Register every graft function on an already-built session. */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
