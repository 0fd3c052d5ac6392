package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native squared-L2 distance over two BIGINT arrays: one codegen'd
  * loop accumulating Σ (a[i]−b[i])² in Long (wrapping, like the SQL
  * spelling it replaces).
  *
  * Replaces `aggregate(zip_with(a, b, (x,y) -> (x−y)*(x−y)), 0L, _+_)`
  * — higher-order functions are CodegenFallback expressions evaluated
  * per element through the interpreter, and the ANN PQ paths evaluate
  * this kernel m·ksub times per row inside ANOTHER interpreted
  * `transform` (measured: the corpus encode stage of ann_recall_ivfpq
  * spends 1.2 s single-task on 1 500 vectors at sf0.1). The loop is
  * identical integer arithmetic, so every distance — and therefore
  * every argmin/rank tie-break the oracles pin — is bit-identical.
  *
  * Null semantics mirror the zip_with spelling exactly: NULL result if
  * either array is NULL, if the lengths differ (zip_with pads the
  * shorter side with NULL), or if any element is NULL.
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_dist_long needs two array<bigint>, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
}

object SqDistLong {
  def sq_dist_long(a: Column, b: Column): Column =
    GraftSqlShims.toColumn(SqDistLong(
      GraftSqlShims.toExpression(a), GraftSqlShims.toExpression(b)))
}
