package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent folding for [[graft.ops.Corpus.normalizeText]]: NFD-decompose,
  * drop combining marks (Unicode category Mn), recompose nothing —
  * "Café" → "Cafe", "naïve" → "naive". The same construction DuckDB's
  * `strip_accents` applies to Latin diacritics, so oracle SQL can mirror
  * the normalization pipeline function-for-function.
  *
  * Standalone helper object (not the case-class companion) so the Scala
  * compiler emits a plain static forwarder the generated Java can call.
  */
object AccentFolding {
  /** ASCII fast path first: corpus text is overwhelmingly ASCII, and an
    * all-ASCII string cannot carry combining marks — return the input
    * UTF8String untouched (zero allocation on the hot path). */
  def strip(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) s
    else {
      val decomposed = java.text.Normalizer.normalize(
        s.toString, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(decomposed.length)
      var j = 0
      while (j < decomposed.length) {
        val c = decomposed.charAt(j)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        j += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

/** Native codegen'd `strip_accents(text)`. A Scala UDF here would break
  * whole-stage codegen for the whole normalization projection; this stays
  * inside it and costs one static call per row (zero work for ASCII). */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"strip_accents needs a string input, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    AccentFolding.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AccentFolding.strip($c);")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object StripAccents {
  /** Column form. */
  def strip_accents(c: Column): Column =
    GraftSqlShims.toColumn(StripAccents(GraftSqlShims.toExpression(c)))
}
