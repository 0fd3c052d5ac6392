package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Weighted intersection sum over two SORTED long arrays: a single
  * codegen'd two-pointer merge returning `Σ aWeights[i]` over the
  * positions `i` where `aKeys[i]` also occurs in `bKeys` —
  * O(|A| + |B|) per row, map-side, allocation-free.
  *
  * This is the verify kernel of the AllPairs cosine join
  * (`Dedup.cosinePrefixPairs`): the composable spelling —
  * `aggregate(A, acc + when(array_contains(B, tok), w))` — re-scans B
  * for every element of A (O(|A|·|B|) interpreted steps, ~25 µs per
  * candidate pair on 50-feature docs), which made the verify stage 5x
  * the cost of everything else combined. The merge loop is the
  * textbook sorted-set intersection and keeps the exact same integer
  * sum, so results are bit-identical.
  *
  * CONTRACT (caller-enforced, same discipline as [[RollingHash]]):
  * both key arrays are sorted ascending with no duplicates — e.g. built
  * by `sort_array(collect_list(...))` over per-doc DISTINCT features.
  * `aWeights` aligns index-wise with `aKeys`. Element nulls are not
  * expected (features are non-null by construction); a null element
  * would make the merge skip it via the Long unboxing default (0).
  */
case class SortedIntersectSum(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = LongType

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(first) && isLongArray(second) && isLongArray(third))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_sum needs three array<bigint> args (aKeys, " +
        s"aWeights, bKeys), got ${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString}")

  override def nullSafeEval(a: Any, w: Any, b: Any): Any = {
    val ak = a.asInstanceOf[ArrayData]
    val aw = w.asInstanceOf[ArrayData]
    val bk = b.asInstanceOf[ArrayData]
    val na = math.min(ak.numElements(), aw.numElements())
    val nb = bk.numElements()
    var i = 0; var j = 0; var acc = 0L
    while (i < na && j < nb) {
      val x = ak.getLong(i); val y = bk.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { acc += aw.getLong(i); i += 1; j += 1 }
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, w, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $na = java.lang.Math.min($a.numElements(), $w.numElements());
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $acc = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; }
         |  else if ($x > $y) { $j++; }
         |  else { $acc += $w.getLong($i); $i++; $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SortedIntersectSum =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SortedIntersectSum {
  def sorted_intersect_sum(aKeys: Column, aWeights: Column,
      bKeys: Column): Column =
    GraftSqlShims.toColumn(SortedIntersectSum(
      GraftSqlShims.toExpression(aKeys),
      GraftSqlShims.toExpression(aWeights),
      GraftSqlShims.toExpression(bKeys)))
}

/** Unweighted sibling of [[SortedIntersectSum]]: `|A ∩ B|` over two
  * SORTED duplicate-free long arrays as one codegen'd two-pointer
  * merge. This is the per-edge kernel of the adjacency-intersection
  * triangle count (`Graph.triangleStats`): `|N⁺(u) ∩ N⁺(v)|` per
  * oriented edge, map-side, instead of materializing and shuffling
  * every wedge. Same sortedness contract as the weighted form.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left) && isLongArray(right))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_count needs two array<bigint> args, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ak = a.asInstanceOf[ArrayData]
    val bk = b.asInstanceOf[ArrayData]
    val na = ak.numElements(); val nb = bk.numElements()
    var i = 0; var j = 0; var acc = 0L
    while (i < na && j < nb) {
      val x = ak.getLong(i); val y = bk.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { acc += 1L; i += 1; j += 1 }
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $acc = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; }
         |  else if ($x > $y) { $j++; }
         |  else { $acc += 1L; $i++; $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def sorted_intersect_count(aKeys: Column, bKeys: Column): Column =
    GraftSqlShims.toColumn(SortedIntersectCount(
      GraftSqlShims.toExpression(aKeys), GraftSqlShims.toExpression(bKeys)))
}
