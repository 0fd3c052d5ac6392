package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared numeric-array element access for the native expressions
  * (DotProduct, QuantizeInt8, HyperplaneBucket): one place to dispatch on
  * the supported element types, for both interpreted eval and the codegen
  * string — adding a type (or fixing a cast) in one copy of three would
  * silently leave the others on the `0.0` fallback.
  */
private[functions] object NumericArrays {

  /** Element types the native array expressions accept. */
  def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(e @ (FloatType | DoubleType | IntegerType | LongType), _) => Some(e)
    case _ => None
  }

  def getAsDouble(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case _ => 0.0
  }

  /** Java source fragment reading element `i` of `arr` as double. */
  def getter(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case _ => "0.0"
  }
}
