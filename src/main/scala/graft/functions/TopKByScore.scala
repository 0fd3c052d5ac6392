package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: keeps the k (score, id) pairs with the
  * highest score (ties broken by smaller id) per group.
  *
  * This is the scale-correct replacement for
  * `row_number().over(Window.partitionBy(q))` top-k: the window form
  * shuffles and sorts EVERY scored row (|Q|×|C| rows for an ANN scan) to
  * keep k per query, while this aggregate's partial buffers are k-capped
  * on the map side — only ≤ k rows per (group × partition) ever cross the
  * shuffle, and being a TypedImperativeAggregate it runs in
  * ObjectHashAggregate (no sort on either side).
  *
  * Result: array<struct<id, score>> sorted by (score desc, id asc) —
  * posexplode it for dense 1-based ranks.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKByScore.entryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1) TypeCheckResult.TypeCheckFailure(s"top_k_by_score needs k >= 1, got $k")
    else if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score needs a double score, got ${score.dataType.simpleString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by_score needs a bigint id, got ${id.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buffer.add(other.scores(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val rows = buffer.sortedEntries.map { case (s, i) =>
      InternalRow(i, s)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      out.writeDouble(buffer.scores(i)); out.writeLong(buffer.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new TopKBuffer(k)
    var i = 0
    while (i < n) { b.add(in.readDouble(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

/** k-capped buffer as two parallel arrays kept UNSORTED; only the index of
  * the current worst entry is tracked. add() is O(1) amortized (O(k) when
  * the worst must be rescanned after an eviction), which beats a heap for
  * the small k of ANN queries.
  */
final class TopKBuffer(k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0
  private var worst = -1 // index of the entry evicted next; -1 = unknown

  /** a loses to b ⇒ a is evicted first: lower score, tie → larger id. */
  private def losesTo(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def findWorst(): Int = {
    var w = 0
    var i = 1
    while (i < size) {
      if (losesTo(scores(i), ids(i), scores(w), ids(w))) w = i
      i += 1
    }
    w
  }

  def add(s: Double, i: Long): Unit = {
    // NaN never enters: losesTo is false for every NaN comparison, so an
    // admitted NaN could neither be evicted nor (as findWorst's pick)
    // lose to any real candidate — one NaN-scored row (e.g. cosine of a
    // zero-norm vector) would freeze the whole partition's buffer
    if (java.lang.Double.isNaN(s)) return
    if (size < k) {
      scores(size) = s; ids(size) = i; size += 1
      worst = -1
    } else {
      if (worst < 0) worst = findWorst()
      if (losesTo(scores(worst), ids(worst), s, i)) {
        scores(worst) = s; ids(worst) = i
        worst = -1
      }
    }
  }

  /** Entries by (score desc, id asc). */
  def sortedEntries: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => losesTo(b._1, b._2, a._1, a._2))
}

object TopKByScore {
  private[functions] val entryType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  /** Aggregate Column: top-k (id, score) pairs by (score desc, id asc). */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    GraftSqlShims.toColumn(
      TopKByScore(
        GraftSqlShims.toExpression(score),
        GraftSqlShims.toExpression(id), k)
        .toAggregateExpression())
}
