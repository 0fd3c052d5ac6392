package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the rolling polynomial fingerprint:
  * h = fold over chars of (h * 31 + char) mod `modulus`.
  *
  * The composable-functions form (`aggregate(split(text, ''), ...)`)
  * materializes a one-character-string array per row — an allocation per
  * character. This expression is a single whole-stage-codegen'd loop over
  * the UTF8 bytes: zero allocation, ~10x less work per row, same result
  * for ASCII text (and a well-defined per-byte fold for any input).
  *
  * Exemplifies the preferred extension order for this engine: built-in
  * functions first, a native `Expression` with `doGenCode` where the
  * built-ins force a wasteful shape, UDFs never.
  */
case class RollingHash(child: Expression, modulus: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs a string input, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xffL)) % modulus
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31 + ($bytes[$i] & 0xffL)) % ${modulus}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column form. */
  def rolling_hash(c: Column, modulus: Long = TextFunctions.FingerprintMod): Column =
    GraftSqlShims.toColumn(RollingHash(GraftSqlShims.toExpression(c), modulus))

  /** Register the graft SQL functions on a session. Delegates to
    * [[graft.GraftExtensions.registerAll]] — one source of truth for the
    * SQL surface (a second local builder here once drifted on arity). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftExtensions.registerAll(spark)
}
