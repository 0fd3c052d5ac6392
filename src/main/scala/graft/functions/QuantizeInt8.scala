package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native symmetric int8 quantization: q_i = floor(v_i · 127 / max|v|),
  * one codegen'd two-pass loop per row (max pass + quantize pass, O(dim)).
  *
  * The composable form (`transform` with `array_max` inside the lambda)
  * re-evaluates the max for EVERY element — O(dim²) per row, a 500×
  * waste at dim=1024 on the quantization map stage. floor over an
  * explicit double intermediate keeps results engine-identical (no
  * round-half-mode ambiguity); a zero vector quantizes to zeros.
  * Element nulls are treated as 0 (embedding vectors have none).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    elemType match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"quantize_int8 needs a numeric array, got ${child.dataType.simpleString}")
    }

  private def getAsDouble(a: ArrayData, t: DataType, i: Int): Double =
    NumericArrays.getAsDouble(a, t, i)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val t = elemType.get
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val v = if (a.isNullAt(i)) 0.0 else math.abs(getAsDouble(a, t, i))
      if (v > mx) mx = v
      i += 1
    }
    val out = new Array[Long](n)
    if (mx != 0.0) {
      i = 0
      while (i < n) {
        val v = if (a.isNullAt(i)) 0.0 else getAsDouble(a, t, i)
        out(i) = math.floor(v * 127.0 / mx).toLong
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  private def getter(t: DataType, arr: String, i: String): String =
    NumericArrays.getter(t, arr, i)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val t = elemType.get
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val mx = ctx.freshName("mx")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.isNullAt($i) ? 0.0 : java.lang.Math.abs(${getter(t, a, i)});
         |  if ($v > $mx) $mx = $v;
         |}
         |long[] $out = new long[$n];
         |if ($mx != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = $a.isNullAt($i) ? 0.0 : ${getter(t, a, i)};
         |    $out[$i] = (long) java.lang.Math.floor($v * 127.0 / $mx);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
    copy(child = newChild)
}

object QuantizeInt8 {
  def quantize_int8(v: Column): Column =
    GraftSqlShims.toColumn(QuantizeInt8(GraftSqlShims.toExpression(v)))
}
