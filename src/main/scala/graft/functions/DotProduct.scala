package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays: a single codegen'd loop
  * accumulating left-to-right in double.
  *
  * The composable alternative — 64 unrolled `element_at * element_at`
  * terms — generates megabyte-scale expression trees (1.7 MB task
  * binaries) that blow past codegen method limits and fall back to
  * interpreted evaluation at ~25 µs/pair. This loop is ~100 ns/pair and
  * keeps the exact same left-assoc float→double arithmetic, so results
  * stay bit-identical to the SQL-unrolled oracle.
  *
  * Element nulls are treated as 0 (embedding vectors have none); length
  * mismatch uses the common prefix.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product needs two numeric arrays, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  private def getAsDouble(a: ArrayData, t: DataType, i: Int): Double =
    NumericArrays.getAsDouble(a, t, i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lt = elemType(left).get
    val rt = elemType(right).get
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else getAsDouble(a, lt, i)
      val y = if (b.isNullAt(i)) 0.0 else getAsDouble(b, rt, i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  private def getter(t: DataType, arr: String, i: String): String =
    NumericArrays.getter(t, arr, i)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lt = elemType(left).get
      val rt = elemType(right).get
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.isNullAt($i) ? 0.0 : ${getter(lt, a, i)};
         |  double y = $b.isNullAt($i) ? 0.0 : ${getter(rt, b, i)};
         |  $acc += x * y;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot_product(a: Column, b: Column): Column =
    GraftSqlShims.toColumn(DotProduct(
      GraftSqlShims.toExpression(a), GraftSqlShims.toExpression(b)))
}
