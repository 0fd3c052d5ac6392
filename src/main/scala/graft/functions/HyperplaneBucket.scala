package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH bucket id: bit p (p < planes) is set iff
  * the projection Σ_d v[d]·w(d,p) is positive, with the deterministic
  * integer weight w(d,p) = ((d·31 + p·17) mod 13) − 6 (kept integral so
  * the construction is exactly reproducible in plain SQL — see
  * [[graft.ops.Similarity.planeWeight]]).
  *
  * Replaces the dim×planes unrolled `element_at(vec, d+1) * lit(w)` chain:
  * at 64 dims × 4 planes that is a 256-term expression tree — the exact
  * shape [[DotProduct]] documents as falling out of whole-stage codegen
  * into ~25 µs/row interpreted evaluation. This is two short codegen'd
  * loops with the same left-assoc double accumulation, so bucket ids are
  * bit-identical to the unrolled form and the SQL oracle.
  *
  * Null elements count as 0 (embedding vectors have none).
  */
case class HyperplaneBucket(child: Expression, planes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    elemType match {
      case Some(_) if planes >= 1 && planes <= 63 => TypeCheckResult.TypeCheckSuccess
      case Some(_) => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket needs 1 <= planes <= 63, got $planes")
      case None => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket needs a numeric array, got ${child.dataType.simpleString}")
    }

  private def getAsDouble(a: ArrayData, t: DataType, i: Int): Double =
    NumericArrays.getAsDouble(a, t, i)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val t = elemType.get
    val n = a.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var d = 0
      while (d < n) {
        val x = if (a.isNullAt(d)) 0.0 else getAsDouble(a, t, d)
        proj += x * (((d * 31 + p * 17) % 13) - 6)
        d += 1
      }
      if (proj > 0) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  private def getter(t: DataType, arr: String, i: String): String =
    NumericArrays.getter(t, arr, i)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val t = elemType.get
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $a.numElements();
         |long $bucket = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $proj = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double x = $a.isNullAt($d) ? 0.0 : ${getter(t, a, d)};
         |    $proj += x * ((($d * 31 + $p * 17) % 13) - 6);
         |  }
         |  if ($proj > 0) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  def hyperplane_bucket(vec: Column, planes: Int): Column =
    GraftSqlShims.toColumn(HyperplaneBucket(GraftSqlShims.toExpression(vec), planes))
}
