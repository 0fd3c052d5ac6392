package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Shared digest helper: one MessageDigest instance per thread, reset by
  * `digest()` itself — commons-codec's `DigestUtils.md5Hex` (what Spark's
  * `md5` expression calls) constructs a fresh MessageDigest PER ROW via
  * `MessageDigest.getInstance`, which is a measurable constant on
  * shingle-explode paths that hash tens of millions of values per task.
  *
  * Standalone object (not the case-class companion) so the Scala compiler
  * emits a plain static forwarder the generated Java can call.
  */
object Md5PrefixHashing {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Unsigned value of hex characters [startHex, startHex+hexDigits)
    * (1-based) of md5(bytes) — bit-identical to
    * `conv(substring(md5(x), startHex, hexDigits), 16, 10)` cast to
    * long, the cross-engine hash idiom this expression replaces: the
    * hex string, the substring, and conv's radix parse never
    * materialize. Folds the digest nibble by nibble (hex chars are
    * big-endian nibbles). */
  def slice(bytes: Array[Byte], startHex: Int, hexDigits: Int): Long = {
    val d = md.get().digest(bytes)
    var v = 0L
    var i = startHex - 1
    val end = i + hexDigits
    while (i < end) {
      val nib = if ((i & 1) == 0) (d(i >> 1) >> 4) & 0xf else d(i >> 1) & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/** Native codegen'd `md5_slice_long(bytes, startHex, hexDigits)`: hex
  * characters [startHex, startHex+hexDigits) of the md5 digest as an
  * unsigned long — the engine's standard cross-engine shingle/feature
  * hash (`('0x' || substr(md5(x), k0, k))::BIGINT` on the DuckDB side).
  * Replaces the composed `conv(substring(md5(x), k0, k), 16, 10)`
  * chain, which allocates a 32-char hex string, a substring copy, and
  * a radix parse per value; this is one digest into a thread-cached
  * MessageDigest plus a nibble fold, inside whole-stage codegen.
  *
  * `hexDigits` ≤ 15 keeps the value inside a positive long (60 bits) and
  * matches `conv` exactly; `hexDigits` = 16 yields the full 64-bit slice
  * as a SIGNED long bit pattern — identical to the engine's
  * `shiftleft(conv(hi8), 32) | conv(lo8)` two-word assembly, which is the
  * form `conv` alone cannot produce (a 16-digit conv overflows the cast).
  */
case class Md5PrefixLong(child: Expression, startHex: Int, hexDigits: Int)
    extends UnaryExpression {

  require(hexDigits >= 1 && hexDigits <= 16,
    s"hexDigits must be in [1, 16], got $hexDigits")
  require(startHex >= 1 && startHex + hexDigits <= 33,
    s"hex slice [$startHex, ${startHex + hexDigits}) outside the 32-char digest")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_slice_long needs a binary input, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Md5PrefixHashing.slice(
      input.asInstanceOf[Array[Byte]], startHex, hexDigits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5PrefixHashing.slice($c, $startHex, $hexDigits);")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

object Md5PrefixLong {
  /** First-`hexDigits` column form; casts the input to binary (UTF8
    * bytes for strings — the same bytes Spark's and DuckDB's `md5`
    * hash). */
  def md5_prefix_long(c: Column, hexDigits: Int): Column =
    md5_slice_long(c, 1, hexDigits)

  /** Arbitrary-slice column form (1-based hex char offset). */
  def md5_slice_long(c: Column, startHex: Int, hexDigits: Int): Column =
    GraftSqlShims.toColumn(Md5PrefixLong(
      GraftSqlShims.toExpression(c.cast("binary")), startHex, hexDigits))
}
